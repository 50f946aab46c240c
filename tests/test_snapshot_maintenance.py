"""Snapshot maintenance: time travel + vacuum (the Iceberg
expire_snapshots / remove_orphan_files pair) with exactly-once preserved
across expiry."""

import os

import pytest

from georef_ar_etl_spark import datagen
from georef_ar_etl_spark.engine import CdcEngine
from georef_ar_etl_spark.oracle import apply_events, state_as_sorted_rows
from georef_ar_etl_spark.sinks.snapshot_table import ConflictError


def _state_rows(df):
    return [
        (r["doc_id"], list(r["tokens"]), r["n_tok"], r["source"])
        for r in df.orderBy("doc_id").collect()
    ]


def _oracle_rows(initial, events, upto_batch):
    sub = [e for e in events if e["batch_id"] <= upto_batch]
    state, _ = apply_events({r["doc_id"]: dict(r) for r in initial}, sub)
    return [
        (r["doc_id"], list(r["tokens"]), r["n_tok"], r["source"])
        for r in state_as_sorted_rows(state)
    ]


@pytest.fixture()
def table(spark, tmp_path):
    # function-scoped on purpose: the vacuum test MUTATES the table
    # (expires epochs, applies a new batch) — sharing one instance would
    # order-couple the tests
    initial = datagen.gen_initial_state(120, seed=71, max_len=12)
    events = datagen.gen_events(
        [r["doc_id"] for r in initial], n_events=600, n_batches=4, seed=72, max_len=12
    )
    root = str(tmp_path / "t")
    eng = CdcEngine(spark, root, n_buckets=8)
    eng.bootstrap(datagen.state_to_df(spark, initial))
    eng.replay(datagen.events_to_df(spark, events))
    return eng, initial, events


def test_time_travel_reads_match_oracle(spark, table):
    eng, initial, events = table
    # epoch k = state after batch k-1 (bootstrap = epoch 0)
    for epoch, upto in ((2, 1), (4, 3)):
        got = _state_rows(eng.state(epoch=epoch))
        assert got == _oracle_rows(initial, events, upto), f"epoch {epoch}"
    # epoch 0 is the bootstrap snapshot
    boot = _state_rows(eng.state(epoch=0))
    assert boot == sorted(
        (r["doc_id"], list(r["tokens"]), r["n_tok"], r["source"]) for r in initial
    )


def test_vacuum_expires_and_preserves_exactly_once(spark, table):
    eng, initial, events = table
    before = _state_rows(eng.state())
    n_files_before = sum(len(fs) for _, ds, fs in os.walk(eng.table.root))

    report = eng.vacuum(keep_last=2)
    assert report["removed_manifests"] == [0, 1, 2]
    assert report["retained_epochs"] == [3, 4]
    assert report["removed_dirs"] and report["freed_bytes"] > 0

    # current state identical after vacuum
    assert _state_rows(eng.state()) == before
    # retained epoch still time-travels; expired epoch does not
    assert _state_rows(eng.state(epoch=3)) == _oracle_rows(initial, events, 2)
    with pytest.raises(KeyError):
        eng.state(epoch=1)
    # files actually removed
    n_files_after = sum(len(fs) for _, ds, fs in os.walk(eng.table.root))
    assert n_files_after < n_files_before

    # exactly-once SURVIVES expiry: re-delivering an expired batch is a
    # verified no-op; tampered content still conflicts
    b0 = [e for e in events if e["batch_id"] == 0]
    m = eng.apply_batch(datagen.events_to_df(spark, b0), 0)
    assert m.get("expired") is True and m["batch_id"] == 0
    assert _state_rows(eng.state()) == before
    tampered = [dict(e) for e in b0]
    tampered[0]["source"] = "tampered"
    with pytest.raises(ConflictError):
        eng.apply_batch(datagen.events_to_df(spark, tampered), 0)

    # vacuum is idempotent
    report2 = eng.vacuum(keep_last=2)
    assert report2["removed_manifests"] == []

    # and the engine keeps working after maintenance
    nxt = [{"batch_id": 9, "seq": 1, "op": "update",
            "doc_id": initial[0]["doc_id"], "tokens": [5], "n_tok": 1,
            "source": "wal"}]
    eng.apply_batch(datagen.events_to_df(spark, nxt), 9)
    st = eng.state()
    got = st.filter(st.doc_id == initial[0]["doc_id"]).collect()[0]
    assert list(got["tokens"]) == [5]

    with pytest.raises(ValueError):
        eng.vacuum(keep_last=0)


def test_cross_process_reader_observes_new_commits(spark, table):
    """A long-lived READ-ONLY SnapshotTable instance (the changelog
    consumer / monitor case, ADVICE r03) must observe commits made by a
    different instance: the head cache is validated per call against the
    manifests-dir mtime, not trusted forever."""
    from georef_ar_etl_spark.sinks.snapshot_table import SnapshotTable

    eng, initial, events = table
    reader = SnapshotTable(spark, eng.table.root)
    head0 = reader.latest_manifest()["epoch"]
    assert head0 == eng.table.latest_manifest()["epoch"]

    # writer (a distinct instance in this process; same syscall surface as
    # another OS process — no shared Python state) commits two more epochs
    more = datagen.gen_events(
        [r["doc_id"] for r in initial], n_events=80, n_batches=2, seed=73,
        max_len=12,
    )
    for b in (0, 1):
        batch = [
            {**e, "batch_id": e["batch_id"] + 4, "seq": e["seq"] + 10_000}
            for e in more
            if e["batch_id"] == b
        ]
        eng.apply_batch(datagen.events_to_df(spark, batch), b + 4)

    head1 = reader.latest_manifest()["epoch"]
    assert head1 == head0 + 2, "stale reader cache: new commits not observed"
    # and the default-to_epoch changelog read sees the new epochs too
    assert reader.read_changes(head0).count() > 0
    # n_buckets (manifest-authoritative) served from the fresh head
    assert reader.n_buckets == eng.table.n_buckets

    # vacuum through the WRITER: the reader's expired-batch ledger cache
    # must revalidate as well (redelivery protection across processes)
    assert reader.committed_batches().keys() == eng.table.committed_batches().keys()
    eng.vacuum(keep_last=2)
    assert set(reader.committed_batches()) == set(eng.table.committed_batches())


def test_reader_tolerates_manifest_expired_mid_listing(spark, table):
    """Cross-process vacuum race: a manifest deleted between the reader's
    listdir and open must be skipped (it is gone, not broken), never raise.
    Simulated at the cache layer: the filename is listed but the file is
    already unlinked and not in the reader's parse cache."""
    from georef_ar_etl_spark.sinks.snapshot_table import SnapshotTable

    from unittest import mock

    eng, initial, events = table
    reader = SnapshotTable(spark, eng.table.root)
    ms = reader.manifests()
    assert len(ms) >= 3
    victim = ms[0]["epoch"]
    mdir = os.path.join(eng.table.root, "manifests")
    stale_listing = os.listdir(mdir)  # still names the victim
    os.remove(os.path.join(mdir, f"epoch-{victim:010d}.json"))
    # fresh reader instance with an EMPTY parse cache, so the open() must
    # hit the filesystem; the stale listing reproduces the exact race
    # window (listed, then unlinked before open)
    reader2 = SnapshotTable(spark, eng.table.root)
    with mock.patch(
        "georef_ar_etl_spark.sinks.snapshot_table.os.listdir",
        return_value=stale_listing,
    ):
        got = reader2.manifests()  # must not raise
    assert [m["epoch"] for m in got] == [m["epoch"] for m in ms if m["epoch"] != victim]


def test_concurrent_same_epoch_commit_is_first_wins(spark, table):
    """The commit point is an atomic link, not a replace: two writers
    racing the same next epoch resolve to first-commit-wins — the loser
    gets ConflictError (different batch) or the winner's manifest back
    (duplicate delivery of the same batch), never a silent clobber. The
    advisory exists-check is bypassed here to simulate the TOCTOU window
    (both writers read the same head before either commits)."""
    from pyspark.sql import types as T

    from georef_ar_etl_spark.sinks.snapshot_table import ConflictError, SnapshotTable

    eng, initial, events = table
    schema = T.StructType.fromJson(eng.table.latest_manifest()["schema"])
    epoch = eng.table.latest_manifest()["epoch"] + 1
    writer_b = SnapshotTable(spark, eng.table.root)

    # writer A commits epoch K (metadata-only epoch is enough for the race)
    a = eng.table.write_manifest(
        epoch, schema, {}, [], batch_id=901, batch_digest="a-digest", metrics={"kind": "t"}
    )
    assert a["batch_id"] == 901
    # writer B raced to the same epoch with a DIFFERENT batch -> conflict,
    # and A's manifest survives intact
    with pytest.raises(ConflictError, match="concurrently"):
        # bypass B's advisory exists-check by calling the inner publish on
        # a stale view: B's cache was primed before A's commit
        writer_b._latest_token = None
        # craft the race: remove B's knowledge of the file existing
        import os as _os

        path = writer_b._manifest_path(epoch)
        orig_exists = _os.path.exists
        try:
            _os.path.exists = lambda p, _o=orig_exists: False if p == path else _o(p)
            writer_b.write_manifest(
                epoch, schema, {}, [], batch_id=902, batch_digest="b-digest",
                metrics={"kind": "t"},
            )
        finally:
            _os.path.exists = orig_exists
    assert eng.table.manifest_for_epoch(epoch)["batch_id"] == 901
    # duplicate delivery of the SAME digest through the race window is a
    # no-op returning the committed manifest
    try:
        _os.path.exists = lambda p, _o=orig_exists: False if p == path else _o(p)
        got = writer_b.write_manifest(
            epoch, schema, {}, [], batch_id=901, batch_digest="a-digest",
            metrics={"kind": "t"},
        )
    finally:
        _os.path.exists = orig_exists
    assert got["batch_id"] == 901

"""Partition-spec evolution (SnapshotTable.rescale) and the
manifest-authoritative bucket count: state is preserved exactly across a
rescale, subsequent batches merge under the new layout, and a resumed
engine constructed with the WRONG n_buckets can no longer mis-bucket."""

import os

import pytest

from georef_ar_etl_spark import datagen
from georef_ar_etl_spark.engine import CdcEngine
from georef_ar_etl_spark.oracle import apply_events, state_as_sorted_rows


def _rows(df):
    return [
        (r["doc_id"], list(r["tokens"]), r["n_tok"], r["source"])
        for r in df.orderBy("doc_id").collect()
    ]


def _oracle(initial, events):
    state, _ = apply_events({r["doc_id"]: dict(r) for r in initial}, events)
    return [
        (r["doc_id"], list(r["tokens"]), r["n_tok"], r["source"])
        for r in state_as_sorted_rows(state)
    ]


def test_rescale_preserves_state_and_later_batches_merge(spark, tmp_path):
    initial = datagen.gen_initial_state(300, seed=91, max_len=12)
    events = datagen.gen_events(
        [r["doc_id"] for r in initial], n_events=160, n_batches=4, seed=92, max_len=12
    )
    eng = CdcEngine(spark, str(tmp_path / "t"), n_buckets=4)
    eng.bootstrap(datagen.state_to_df(spark, initial))
    # first half under 4 buckets, leaving pending MOR chains
    for b in (0, 1):
        eng.apply_batch(
            datagen.events_to_df(spark, [e for e in events if e["batch_id"] == b]), b
        )
    assert eng.table.latest_manifest().get("bucket_deltas"), "want pending chains"
    before = _rows(eng.state())

    m = eng.rescale(16)
    assert m["metrics"]["kind"] == "rescale"
    assert m["n_buckets"] == 16 and eng.table.n_buckets == 16
    assert m["bucket_deltas"] == {}  # chains resolved into the new bases
    assert len(m["buckets"]) == 16
    assert _rows(eng.state()) == before  # visible state unchanged
    assert m["total_rows"] == len(before)
    # physical layout actually uses the new numbering
    edir = os.path.join(str(tmp_path / "t"), "data", f"epoch={m['epoch']}")
    nums = sorted(int(n.split("=")[1]) for n in os.listdir(edir) if "=" in n)
    assert nums and nums[-1] >= 4, "no bucket beyond the old count was written"

    # second half merges under the NEW layout (engine picks it up live)
    for b in (2, 3):
        eng.apply_batch(
            datagen.events_to_df(spark, [e for e in events if e["batch_id"] == b]), b
        )
    assert _rows(eng.state()) == _oracle(initial, events)
    # changelog across the rescale: the rescale epoch itself emits nothing
    assert eng.changes(m["epoch"] - 1, m["epoch"]).count() == 0


def test_resumed_engine_with_wrong_n_buckets_is_safe(spark, tmp_path):
    """The constructor count only seeds a brand-new table; a resumed engine
    always reads the manifest's count — no silent mis-bucketing."""
    initial = datagen.gen_initial_state(200, seed=93, max_len=10)
    events = datagen.gen_events(
        [r["doc_id"] for r in initial], n_events=100, n_batches=4, seed=94, max_len=10
    )
    root = str(tmp_path / "t")
    eng = CdcEngine(spark, root, n_buckets=4)
    eng.bootstrap(datagen.state_to_df(spark, initial))
    for b in (0, 1):
        eng.apply_batch(
            datagen.events_to_df(spark, [e for e in events if e["batch_id"] == b]), b
        )

    wrong = CdcEngine(spark, root, n_buckets=32)  # mismatched constructor
    assert wrong.table.n_buckets == 4  # manifest wins
    for b in (2, 3):
        wrong.apply_batch(
            datagen.events_to_df(spark, [e for e in events if e["batch_id"] == b]), b
        )
    assert _rows(wrong.state()) == _oracle(initial, events)


def test_rescale_guards(spark, tmp_path):
    eng = CdcEngine(spark, str(tmp_path / "t"), n_buckets=4)
    with pytest.raises(ValueError, match="bootstrap first"):
        eng.rescale(8)
    initial = datagen.gen_initial_state(50, seed=95, max_len=8)
    eng.bootstrap(datagen.state_to_df(spark, initial))
    with pytest.raises(ValueError, match="differ"):
        eng.rescale(4)
    with pytest.raises(ValueError):
        eng.rescale(0)


def test_changelog_spans_rescale_and_vacuum_contract(spark, tmp_path):
    """A changelog range crossing a rescale must replay correctly (the
    rescale epoch emits nothing; later epochs diff against the new
    numbering), and a range whose manifests were vacuumed raises KeyError —
    the documented retention contract."""
    initial = datagen.gen_initial_state(200, seed=96, max_len=10)
    events = datagen.gen_events(
        [r["doc_id"] for r in initial], n_events=120, n_batches=4, seed=97, max_len=10
    )
    eng = CdcEngine(spark, str(tmp_path / "t"), n_buckets=4)
    eng.bootstrap(datagen.state_to_df(spark, initial))
    for b in (0, 1):
        eng.apply_batch(
            datagen.events_to_df(spark, [e for e in events if e["batch_id"] == b]), b
        )
    rm = eng.rescale(8)
    for b in (2, 3):
        eng.apply_batch(
            datagen.events_to_df(spark, [e for e in events if e["batch_id"] == b]), b
        )
    head = eng.table.latest_manifest()["epoch"]

    # reuse the changelog suite's replay helpers — one definition of the
    # changelog row contract across suites
    from test_changelog import _apply_changelog, _rows

    chg = eng.changes(0, head).collect()
    assert not any(r["change_epoch"] == rm["epoch"] for r in chg)
    replayed = _apply_changelog(dict(_rows(eng.state(epoch=0))), chg)
    assert replayed == _rows(eng.state())

    eng.vacuum(keep_last=1)
    with pytest.raises(KeyError, match="retained"):
        eng.changes(0, head).count()


def test_bucket_size_contract_enforced_and_cleared_by_rescale(spark, tmp_path):
    """The one-bucket-per-task merge contract (copart_merge.py:18-23) is now
    ENFORCED, not just documented: an over-threshold bucket is recorded in
    the manifest metrics with a rescale(M) recommendation (warn mode) or
    fails the apply before the commit point (error mode); rescale to the
    recommended M clears it. Zero extra Spark jobs — file metadata only."""
    import pytest

    from georef_ar_etl_spark import datagen
    from georef_ar_etl_spark.engine import BucketSizeError, CdcEngine

    # payload-dominated sizes on purpose: the recommendation model assumes
    # bytes halve per bucket doubling, which tiny files (fixed parquet
    # footer overhead) would break
    initial = datagen.gen_initial_state(3000, seed=95, max_len=128)
    events = datagen.gen_events(
        [r["doc_id"] for r in initial], n_events=600, n_batches=3, seed=96, max_len=128
    )
    root = str(tmp_path / "t")
    eng = CdcEngine(spark, root, n_buckets=4)
    eng.bootstrap(datagen.state_to_df(spark, initial))
    evdf = datagen.events_to_df(spark, events)
    m0 = eng.apply_batch(evdf.filter("batch_id = 0"), 0)
    assert "oversize_buckets" not in m0["metrics"], "default limit must not fire"

    # set the limit below the current worst bucket -> warn mode records it
    worst = max(eng.table.bucket_sizes().values())
    limit = int(worst * 0.75)
    eng_w = CdcEngine(spark, root, n_buckets=4, max_bucket_bytes=limit)
    with pytest.warns(UserWarning, match="rescale"):
        m1 = eng_w.apply_batch(evdf.filter("batch_id = 1"), 1)
    assert m1["metrics"]["oversize_buckets"]
    recommended = m1["metrics"]["recommended_n_buckets"]
    assert recommended > eng_w.table.n_buckets

    # error mode fails BEFORE the commit point: head unchanged
    eng_e = CdcEngine(
        spark, root, n_buckets=4, max_bucket_bytes=limit, on_oversize_bucket="error"
    )
    head_before = eng_e.table.latest_manifest()["epoch"]
    with pytest.raises(BucketSizeError, match=r"rescale\(\d+\)"):
        eng_e.apply_batch(evdf.filter("batch_id = 2"), 2)
    assert eng_e.table.latest_manifest()["epoch"] == head_before

    # whole-table audit agrees (recommendation may exceed batch 1's — the
    # table grew since), and rescale(M) clears the contract violation
    audit = eng_e.check_bucket_sizes()
    assert audit["oversize_buckets"] and audit["recommended_n_buckets"] >= recommended
    eng_e.rescale(audit["recommended_n_buckets"])
    assert eng_e.check_bucket_sizes()["oversize_buckets"] == {}
    # the failed batch now applies cleanly under the same limit
    m2 = eng_e.apply_batch(evdf.filter("batch_id = 2"), 2)
    assert "oversize_buckets" not in m2["metrics"]

"""Snapshot rollback (engine.rollback / SnapshotTable.rollback): restore a
retained epoch metadata-only, invalidate the undone batches so corrected
re-deliveries APPLY, keep everything at-or-before the target idempotent,
and fail changelog ranges that cross the rollback."""

import pytest

from georef_ar_etl_spark import datagen
from georef_ar_etl_spark.engine import CdcEngine
from georef_ar_etl_spark.oracle import apply_events, state_as_sorted_rows


def _mk(spark, tmp_path, n_docs=120, n_events=400, n_batches=4, seed=71):
    initial = datagen.gen_initial_state(n_docs, seed=seed, max_len=12)
    events = datagen.gen_events(
        [r["doc_id"] for r in initial], n_events, n_batches, seed=seed + 1,
        max_len=12,
    )
    eng = CdcEngine(spark, str(tmp_path / "t"), n_buckets=8)
    eng.bootstrap(datagen.state_to_df(spark, initial))
    return eng, initial, events


def _state_rows(eng):
    return [
        r.asDict(recursive=True) for r in eng.state().orderBy("doc_id").collect()
    ]


def test_rollback_restores_target_state(spark, tmp_path):
    eng, initial, events = _mk(spark, tmp_path)
    epochs = {}
    for b in range(4):
        m = eng.apply_batch(
            datagen.events_to_df(spark, [e for e in events if e["batch_id"] == b]), b
        )
        epochs[b] = m["epoch"]
    want = _state_rows(eng)  # head state for later comparison

    m = eng.rollback(epochs[1])
    assert m["metrics"]["kind"] == "rollback"
    assert m["metrics"]["rolled_back_batch_ids"] == [2, 3]
    # state == the oracle of batches 0..1 only
    oracle_state, _ = apply_events(
        {r["doc_id"]: dict(r) for r in initial},
        [e for e in events if e["batch_id"] <= 1],
    )
    got = _state_rows(eng)
    expected = state_as_sorted_rows(oracle_state)
    assert [g["doc_id"] for g in got] == [w["doc_id"] for w in expected]
    assert all(g["tokens"] == w["tokens"] for g, w in zip(got, expected))

    # re-applying the undone batches re-applies (no short-circuit, no
    # conflict) and reconverges to the original head state
    for b in (2, 3):
        eng.apply_batch(
            datagen.events_to_df(spark, [e for e in events if e["batch_id"] == b]), b
        )
    assert _state_rows(eng) == want


def test_rollback_allows_corrected_redelivery(spark, tmp_path):
    eng, initial, events = _mk(spark, tmp_path)
    for b in range(3):
        eng.apply_batch(
            datagen.events_to_df(spark, [e for e in events if e["batch_id"] == b]), b
        )
    m1 = eng.table.manifest_for_epoch(2)  # epoch after batch 1
    eng.rollback(2)
    # corrected batch 2: DIFFERENT content under the SAME id must apply
    corrected = [
        {**e, "tokens": [9, 9, 9], "n_tok": 3}
        if e["op"] in ("insert", "update") and e.get("tokens")
        else e
        for e in events
        if e["batch_id"] == 2
    ]
    m = eng.apply_batch(datagen.events_to_df(spark, corrected), 2)
    assert m["metrics"]["kind"] != "expired_redelivery"
    # batch 1 (not rolled back) still short-circuits idempotently
    m_again = eng.apply_batch(
        datagen.events_to_df(spark, [e for e in events if e["batch_id"] == 1]), 1
    )
    assert m_again["epoch"] == m1["epoch"]


def test_changelog_cannot_cross_rollback(spark, tmp_path):
    eng, initial, events = _mk(spark, tmp_path, n_batches=3)
    for b in range(3):
        eng.apply_batch(
            datagen.events_to_df(spark, [e for e in events if e["batch_id"] == b]), b
        )
    eng.rollback(1)
    head = eng.table.latest_manifest()["epoch"]
    with pytest.raises(ValueError, match="crosses a rollback"):
        eng.changes(0, head).count()
    # ranges strictly before the rollback stay valid
    assert eng.changes(0, 1).count() >= 0


def test_rollback_invalidation_survives_vacuum(spark, tmp_path):
    eng, initial, events = _mk(spark, tmp_path, n_batches=3)
    for b in range(3):
        eng.apply_batch(
            datagen.events_to_df(spark, [e for e in events if e["batch_id"] == b]), b
        )
    eng.rollback(2)  # invalidates batch 2
    # re-apply batch 2, then vacuum hard enough to expire the rollback
    eng.apply_batch(
        datagen.events_to_df(spark, [e for e in events if e["batch_id"] == 2]), 2
    )
    before = _state_rows(eng)
    eng.vacuum(keep_last=1)
    # the re-committed batch 2 must STILL short-circuit (it is committed,
    # post-rollback), and state is untouched
    m = eng.apply_batch(
        datagen.events_to_df(spark, [e for e in events if e["batch_id"] == 2]), 2
    )
    assert m["batch_id"] == 2
    assert _state_rows(eng) == before


def test_rollback_guards(spark, tmp_path):
    eng, initial, events = _mk(spark, tmp_path, n_batches=2)
    for b in range(2):
        eng.apply_batch(
            datagen.events_to_df(spark, [e for e in events if e["batch_id"] == b]), b
        )
    head = eng.table.latest_manifest()
    assert eng.rollback(head["epoch"]) == head  # no-op
    with pytest.raises(KeyError):
        eng.rollback(head["epoch"] + 5)  # future epoch: nothing committed
    eng.vacuum(keep_last=1)
    with pytest.raises(KeyError):
        eng.rollback(0)  # expired epoch


def test_rollback_across_rescale_restores_bucket_count(spark, tmp_path):
    eng, initial, events = _mk(spark, tmp_path, n_batches=2)
    eng.apply_batch(
        datagen.events_to_df(spark, [e for e in events if e["batch_id"] == 0]), 0
    )
    pre = eng.table.latest_manifest()
    before = _state_rows(eng)
    eng.rescale(16)
    eng.apply_batch(
        datagen.events_to_df(spark, [e for e in events if e["batch_id"] == 1]), 1
    )
    eng.rollback(pre["epoch"])
    m = eng.table.latest_manifest()
    assert m["n_buckets"] == 8 and eng.table.n_buckets == 8
    assert _state_rows(eng) == before
    # batches keep applying under the restored layout
    m2 = eng.apply_batch(
        datagen.events_to_df(spark, [e for e in events if e["batch_id"] == 1]), 1
    )
    assert m2["batch_id"] == 1


def test_index_consumer_across_rollback_rebootstraps(spark, tmp_path):
    """A changelog consumer (Scd2Index) must FAIL LOUDLY when its refresh
    range crosses a rollback, and recover by re-bootstrapping from the
    restored snapshot — never silently keep versions from undone epochs."""
    from pyspark.sql import types as T

    from georef_ar_etl_spark.operators.index_maintenance import Scd2Index

    eng, initial, events = _mk(spark, tmp_path, n_batches=3)
    cols = [
        ("tokens", T.ArrayType(T.IntegerType(), True)),
        ("n_tok", T.IntegerType()),
        ("source", T.StringType()),
    ]
    idx = Scd2Index(spark, str(tmp_path / "scd2"), cols, n_buckets=4)
    idx.bootstrap(eng.state(epoch=0), source_epoch=0)
    epochs = {}
    for b in range(3):
        m = eng.apply_batch(
            datagen.events_to_df(spark, [e for e in events if e["batch_id"] == b]), b
        )
        epochs[b] = m["epoch"]
        idx.refresh(eng.changes(idx.last_source_epoch, m["epoch"]), m["epoch"])

    eng.rollback(epochs[0])
    head = eng.table.latest_manifest()["epoch"]
    # the consumer's next poll crosses the rollback → loud failure
    with pytest.raises(ValueError, match="crosses a rollback"):
        eng.changes(idx.last_source_epoch, head).count()

    # recovery: re-bootstrap the index from the restored snapshot
    idx2 = Scd2Index(spark, str(tmp_path / "scd2b"), cols, n_buckets=4)
    idx2.bootstrap(eng.state(), source_epoch=head)
    n_open = idx2.history().filter("is_current").count()
    assert n_open == eng.state().count()
    # and it consumes normally from there
    m = eng.apply_batch(
        datagen.events_to_df(spark, [e for e in events if e["batch_id"] == 1]), 1
    )
    idx2.refresh(eng.changes(head, m["epoch"]), m["epoch"])
    assert idx2.history().filter("is_current").count() == eng.state().count()

"""Write-audit-publish (WAP) staged commits: stage_batch applies a change
batch into an INVISIBLE snapshot, audit_staged validates it with declarative
expectations, publish_staged promotes it atomically (or abandon_staged drops
it bytes-and-all). Iceberg analogue: write.wap.enabled + audit branch +
fast-forward; reference analogue: the per-run report a human inspects before
trusting a load (georef_ar_etl/process.py:250-257)."""

import os

import pytest
from pyspark.sql import functions as F

from georef_ar_etl_spark import datagen
from georef_ar_etl_spark.engine import CdcEngine, StagedCommitPending
from georef_ar_etl_spark.oracle import apply_events, state_as_sorted_rows
from georef_ar_etl_spark.sinks.snapshot_table import ConflictError


def _mk(spark, tmp_path, n_docs=80, n_events=240, n_batches=3, seed=911):
    initial = datagen.gen_initial_state(n_docs, seed=seed, max_len=12)
    events = datagen.gen_events(
        [r["doc_id"] for r in initial], n_events, n_batches, seed=seed + 1,
        max_len=12,
    )
    eng = CdcEngine(spark, str(tmp_path / "t"), n_buckets=8)
    eng.bootstrap(datagen.state_to_df(spark, initial))
    return eng, initial, events


def _batch_df(spark, events, b):
    return datagen.events_to_df(spark, [e for e in events if e["batch_id"] == b])


def _state_rows(eng, epoch=None):
    df = eng.state(epoch=epoch) if epoch is not None else eng.state()
    return [r.asDict(recursive=True) for r in df.orderBy("doc_id").collect()]


def test_staged_invisible_then_publish_atomic(spark, tmp_path):
    eng, initial, events = _mk(spark, tmp_path)
    head_before = eng.table.latest_manifest()
    before_rows = _state_rows(eng)

    staged = eng.stage_batch(_batch_df(spark, events, 0), 0)
    assert staged["staged"] is True
    assert staged["metrics"]["kind"] == "stage"

    # invisible to every live reader
    assert eng.table.latest_manifest()["epoch"] == head_before["epoch"]
    assert _state_rows(eng) == before_rows
    assert 0 not in eng.table.committed_batches()
    assert eng.changes(head_before["epoch"]).count() == 0
    # but the audit view sees the merged result
    oracle_state, _ = apply_events(
        {r["doc_id"]: dict(r) for r in initial},
        [e for e in events if e["batch_id"] == 0],
    )
    got = [
        r.asDict(recursive=True)
        for r in eng.staged_state().orderBy("doc_id").collect()
    ]
    want = state_as_sorted_rows(oracle_state)
    assert [g["doc_id"] for g in got] == [w["doc_id"] for w in want]
    assert all(g["tokens"] == w["tokens"] for g, w in zip(got, want))

    # idempotent re-stage: same batch, same digest → same staged manifest
    again = eng.stage_batch(_batch_df(spark, events, 0), 0)
    assert again["epoch"] == staged["epoch"]

    m = eng.publish_staged()
    assert m["epoch"] == staged["epoch"]
    assert "staged" not in m
    assert m["metrics"]["kind"] == "apply" and m["metrics"]["wap_published"]
    assert eng.table.latest_manifest()["epoch"] == m["epoch"]
    assert _state_rows(eng) == got  # published state == audited state
    assert eng.table.staged_manifests() == []
    # the changelog now carries the batch for downstream consumers
    assert eng.changes(head_before["epoch"]).count() > 0
    # exactly-once: re-delivery after publish short-circuits
    again = eng.apply_batch(_batch_df(spark, events, 0), 0)
    assert again["epoch"] == m["epoch"]


def test_abandon_removes_all_bytes_and_frees_epoch(spark, tmp_path):
    eng, initial, events = _mk(spark, tmp_path)
    before_rows = _state_rows(eng)

    # valid events (they pass ingest validation) whose values break the
    # table's POLICY — the gap the audit exists to close
    poisoned = [
        {**e, "tokens": list(range(60)), "n_tok": 60}
        if e["op"] in ("insert", "update")
        else e
        for e in events
        if e["batch_id"] == 0
    ]
    staged = eng.stage_batch(datagen.events_to_df(spark, poisoned), 0)
    e = staged["epoch"]
    epoch_dir = os.path.join(eng.table.root, "data", f"epoch={e}")
    assert os.path.isdir(epoch_dir)

    report = eng.audit_staged([("range", "n_tok", {"min": 0, "max": 50})])
    rows = {r["expectation"]: r for r in report.collect()}
    assert rows["range"]["passed"] is False

    out = eng.abandon_staged()
    assert out["epoch"] == e
    assert not os.path.isdir(epoch_dir)  # zero bytes left behind
    assert eng.table.staged_manifests() == []
    assert _state_rows(eng) == before_rows

    # the epoch number is free: the corrected batch applies normally
    m = eng.apply_batch(_batch_df(spark, events, 0), 0)
    assert m["epoch"] == e
    oracle_state, _ = apply_events(
        {r["doc_id"]: dict(r) for r in initial},
        [ev for ev in events if ev["batch_id"] == 0],
    )
    got = _state_rows(eng)
    want = state_as_sorted_rows(oracle_state)
    assert [g["doc_id"] for g in got] == [w["doc_id"] for w in want]
    assert all(g["tokens"] == w["tokens"] for g, w in zip(got, want))


def test_apply_blocked_while_staged_pending(spark, tmp_path):
    eng, initial, events = _mk(spark, tmp_path)
    eng.stage_batch(_batch_df(spark, events, 0), 0)

    with pytest.raises(StagedCommitPending, match="awaiting audit"):
        eng.apply_batch(_batch_df(spark, events, 1), 1)
    # re-delivering the staged batch WITHOUT stage=True is also pending
    with pytest.raises(StagedCommitPending, match="already staged"):
        eng.apply_batch(_batch_df(spark, events, 0), 0)

    eng.publish_staged()
    m = eng.apply_batch(_batch_df(spark, events, 1), 1)
    assert m["batch_id"] == 1


def test_publish_conflict_when_head_advances(spark, tmp_path):
    eng, initial, events = _mk(spark, tmp_path)
    staged = eng.stage_batch(_batch_df(spark, events, 0), 0)

    # another writer commits the SAME epoch directly (simulated at the
    # manifest layer — the engine-level guard would have stopped it)
    import pyspark.sql.types as T

    schema = T.StructType.fromJson(staged["schema"])
    eng.table.write_manifest(
        epoch=staged["epoch"], schema=schema, written={},
        touched_buckets=[], batch_id=99, batch_digest="other:1",
        metrics={"kind": "apply"},
    )
    with pytest.raises(ConflictError, match="abandon_staged"):
        eng.publish_staged()
    # abandon must NOT delete the winner's epoch data dir
    out = eng.abandon_staged()
    assert out["removed_dirs"] == []


def test_apply_audited_end_to_end(spark, tmp_path):
    eng, initial, events = _mk(spark, tmp_path)
    n0 = eng.state().count()
    exps = [
        ("not_null", "doc_id", {}),
        ("unique", "doc_id", {}),
        ("range", "n_tok", {"min": 0, "max": 50}),
        ("row_count", None, {"min": 1}),
    ]

    # good batch publishes
    out = eng.apply_audited(_batch_df(spark, events, 0), 0, exps)
    assert out["published"] and out["manifest"]["batch_id"] == 0
    assert all(r["passed"] for r in out["report"])

    # poisoned batch is audited on ONLY its touched buckets and abandoned
    poisoned = [
        {**e, "tokens": list(range(60)), "n_tok": 60}
        if e["op"] in ("insert", "update")
        else e
        for e in events
        if e["batch_id"] == 1
    ]
    head = eng.table.latest_manifest()["epoch"]
    out = eng.apply_audited(
        datagen.events_to_df(spark, poisoned), 1, exps, audit_touched_only=True
    )
    assert not out["published"]
    assert any(not r["passed"] for r in out["report"])
    assert eng.table.latest_manifest()["epoch"] == head
    assert eng.table.staged_manifests() == []

    # the corrected batch then publishes, and the final state equals the
    # plain (un-staged) replay of the same batches
    out = eng.apply_audited(_batch_df(spark, events, 1), 1, exps)
    assert out["published"]
    oracle_state, _ = apply_events(
        {r["doc_id"]: dict(r) for r in initial},
        [e for e in events if e["batch_id"] <= 1],
    )
    got = _state_rows(eng)
    want = state_as_sorted_rows(oracle_state)
    assert [g["doc_id"] for g in got] == [w["doc_id"] for w in want]
    assert all(g["tokens"] == w["tokens"] for g, w in zip(got, want))
    assert eng.state().count() == len(want) and n0 > 0


def test_staged_survives_process_restart(spark, tmp_path):
    """The staging dir is durable state: a new engine instance on the same
    root sees the pending snapshot, can audit and publish it — crash between
    stage and audit loses nothing."""
    eng, initial, events = _mk(spark, tmp_path)
    staged = eng.stage_batch(_batch_df(spark, events, 0), 0)

    eng2 = CdcEngine(spark, eng.table.root, n_buckets=8)
    assert [s["epoch"] for s in eng2.table.staged_manifests()] == [staged["epoch"]]
    report = eng2.audit_staged([("not_null", "doc_id", {})])
    assert all(r["passed"] for r in report.collect())
    m = eng2.publish_staged()
    assert m["epoch"] == staged["epoch"]
    assert eng.table.latest_manifest()["epoch"] == m["epoch"]


def test_staged_row_level_ops(spark, tmp_path):
    """UPDATE/MERGE/DELETE ride the same write-audit-publish machinery as
    apply_batch: stage=True keeps the effect invisible to every reader
    until publish; an audit failure abandons it with no trace."""
    from georef_ar_etl_spark import datagen
    from georef_ar_etl_spark.engine import CdcEngine

    initial = datagen.gen_initial_state(150, seed=5, max_len=10)
    eng = CdcEngine(spark, str(tmp_path / "wapops"), n_buckets=4)
    eng.bootstrap(datagen.state_to_df(spark, initial))
    before = {
        (r["doc_id"], tuple(r["tokens"]), r["n_tok"], r["source"])
        for r in eng.state().collect()
    }

    # staged UPDATE: invisible until published
    rep = eng.update_where(
        {"source": "'swept'"}, [("source", "=", "wal")], batch_id=1, stage=True
    )
    assert {
        (r["doc_id"], tuple(r["tokens"]), r["n_tok"], r["source"])
        for r in eng.state().collect()
    } == before
    report = {r["expectation"]: r for r in eng.audit_staged(
        [("not_null", "doc_id", {})]).collect()}
    assert report["not_null"]["passed"] is True
    eng.publish_staged()
    after = {r["doc_id"]: r["source"] for r in eng.state().collect()}
    assert "wal" not in set(after.values())
    assert "swept" in set(after.values())

    # staged MERGE whose audit FAILS: abandoned, no trace, re-usable id
    src = spark.createDataFrame(
        [("NEWDOC0000001", [1, 2], "bad", -5)],
        "doc_id string, tokens array<int>, source string, n_tok int",
    )
    eng.merge_into(
        src,
        batch_id=2,
        when_not_matched=[(None, {"n_tok": "-5"})],
        stage=True,
    )
    report = {r["expectation"]: r for r in eng.audit_staged(
        [("range", "n_tok", {"min": 0, "max": 50})]).collect()}
    assert report["range"]["passed"] is False
    eng.abandon_staged()
    ids = {r["doc_id"] for r in eng.state().collect()}
    assert "NEWDOC0000001" not in ids

    # staged DELETE publishes like any commit
    n_before = eng.state().count()
    eng.delete_where([("source", "=", "swept")], batch_id=3, stage=True)
    assert eng.state().count() == n_before
    eng.publish_staged()
    assert eng.state().filter("source = 'swept'").count() == 0

"""Change-feed export (sinks/change_export.py): the exported snapshot +
change-range parquet files must fold back to the exact table state —
including after the SOURCE table vacuum-expired the exported epochs (the
self-containedness contract), across a rollback (re-base), and through a
torn export (orphan data dir without a ledger entry)."""

import os

import pytest

from georef_ar_etl_spark import datagen
from georef_ar_etl_spark.engine import CdcEngine
from georef_ar_etl_spark.sinks.change_export import (
    ChangeFeedExporter,
    read_export_ledger,
)

N_BATCHES = 4


def _rows(df, cols=("doc_id", "tokens", "n_tok", "source")):
    out = {}
    for r in df.collect():
        d = r.asDict(recursive=True)
        out[d["doc_id"]] = tuple(
            tuple(d[c]) if isinstance(d.get(c), list) else d.get(c)
            for c in cols
            if c in df.columns
        )
    return out


@pytest.fixture()
def workload(spark, tmp_path):
    initial = datagen.gen_initial_state(200, seed=91, max_len=10)
    events = datagen.gen_events(
        [r["doc_id"] for r in initial], n_events=160, n_batches=N_BATCHES,
        seed=92, max_len=10,
    )
    eng = CdcEngine(spark, str(tmp_path / "t"), n_buckets=4, mor_max_deltas=2)
    eng.bootstrap(datagen.state_to_df(spark, initial))
    batches = [
        [e for e in events if e["batch_id"] == b] for b in range(N_BATCHES)
    ]
    return eng, batches, str(tmp_path / "feed")


def test_export_folds_to_state_incrementally(spark, workload):
    eng, batches, out = workload
    ex = ChangeFeedExporter(eng, out)
    r0 = ex.export()
    assert r0["kind"] == "snapshot" and r0["status"] == "exported"
    # nothing new -> noop, ledger untouched
    assert ex.export()["status"] == "noop"
    assert len(read_export_ledger(out)) == 1

    for b in batches:
        eng.apply_batch(datagen.events_to_df(spark, b), b[0]["batch_id"])
        r = ex.export()
        assert r["kind"] == "changes", r
        assert _rows(ex.folded_state()) == _rows(eng.state())

    # ledger: one snapshot + one change range per batch, contiguous ranges
    led = read_export_ledger(out)
    assert [e["kind"] for e in led] == ["snapshot"] + ["changes"] * len(batches)
    for a, b in zip(led[1:], led[2:]):
        assert b["from_epoch"] == a["to_epoch"]


def test_export_archive_survives_source_vacuum(spark, workload):
    eng, batches, out = workload
    ex = ChangeFeedExporter(eng, out)
    ex.export()
    for b in batches:
        eng.apply_batch(datagen.events_to_df(spark, b), b[0]["batch_id"])
        ex.export()
    want = _rows(eng.state())
    # expire everything but the head; the archive must still fold
    eng.compact()
    eng.vacuum(keep_last=1)
    with pytest.raises(KeyError):
        eng.state(epoch=1)
    assert _rows(ex.folded_state()) == want


def test_multi_epoch_range_and_deletes_fold(spark, workload):
    eng, batches, out = workload
    ex = ChangeFeedExporter(eng, out)
    ex.export()
    # apply several batches between exports: one range spans many epochs,
    # net-per-key folding has to pick the LAST change
    for b in batches:
        eng.apply_batch(datagen.events_to_df(spark, b), b[0]["batch_id"])
    r = ex.export()
    assert r["kind"] == "changes"
    assert r["from_epoch"] + len(batches) == r["to_epoch"]
    assert _rows(ex.folded_state()) == _rows(eng.state())


def test_torn_export_heals(spark, workload):
    eng, batches, out = workload
    ex = ChangeFeedExporter(eng, out)
    ex.export()
    eng.apply_batch(datagen.events_to_df(spark, batches[0]), 0)
    # simulate a crash between the data write and the ledger append: the
    # data directory exists, the ledger does not reference it
    head = eng.table.latest_manifest()["epoch"]
    orphan = os.path.join(out, f"changes-{head - 1}-{head}")
    eng.changes(head - 1, head).write.mode("overwrite").parquet(orphan)
    assert len(read_export_ledger(out)) == 1
    r = ex.export()
    assert r["status"] == "exported"
    assert sorted(r["orphans_removed"]) == [f"changes-{head - 1}-{head}"]
    assert _rows(ex.folded_state()) == _rows(eng.state())


def test_rollback_rebases_the_feed(spark, workload):
    eng, batches, out = workload
    ex = ChangeFeedExporter(eng, out)
    ex.export()
    for b in batches[:2]:
        eng.apply_batch(datagen.events_to_df(spark, b), b[0]["batch_id"])
        ex.export()
    rb_to = eng.table.latest_manifest()["epoch"] - 1
    eng.rollback(rb_to)
    # the rollback epoch cannot be consumed incrementally -> snapshot re-base
    r = ex.export()
    assert r["kind"] == "snapshot" and r["reason"] == "rollback_rebootstrap"
    assert _rows(ex.folded_state()) == _rows(eng.state())
    # corrected redelivery after the rollback flows incrementally again
    eng.apply_batch(datagen.events_to_df(spark, batches[2]), 2)
    r2 = ex.export()
    assert r2["kind"] == "changes"
    assert _rows(ex.folded_state()) == _rows(eng.state())


def test_export_folds_across_schema_evolution(spark, tmp_path):
    initial = datagen.gen_initial_state(120, seed=95, max_len=10)
    events = datagen.gen_events(
        [r["doc_id"] for r in initial], n_events=120, n_batches=3, seed=96,
        max_len=10, evolve_from_batch=1,
    )
    eng = CdcEngine(spark, str(tmp_path / "t"), n_buckets=4)
    eng.bootstrap(datagen.state_to_df(spark, initial))
    ex = ChangeFeedExporter(eng, str(tmp_path / "feed"))
    ex.export()
    for b in range(3):
        batch = [e for e in events if e["batch_id"] == b]
        eng.apply_batch(datagen.events_to_df(spark, batch), b)
        ex.export()
    cols = tuple(eng.state().columns)
    assert "src_meta" in cols  # evolution actually fired
    folded = ex.folded_state()
    assert sorted(folded.columns) == sorted(cols)
    assert _rows(folded, cols) == _rows(eng.state(), cols)

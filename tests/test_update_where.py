"""Predicate update (SnapshotTable.update_where / CdcEngine.update_where):
``UPDATE t SET col = expr WHERE …`` landing as one MOR upsert delta link
per touched bucket, matching rows read through the zone-map-pruned
DV/chain-aware scan.

Covers: visible-state equality over mixed clean/chain buckets, SQL UPDATE
old-row semantics, the engine's n_tok re-derivation invariant, exactly-once
redelivery + content conflict, no-op epochs, key/unknown-column refusal,
changelog consumption, DV interplay (dead rows stay dead), rename-chain
binding, and compaction after an update.
"""

import pytest
from pyspark.sql import functions as F

from georef_ar_etl_spark import datagen
from georef_ar_etl_spark.engine import CdcEngine
from georef_ar_etl_spark.sinks.snapshot_table import ConflictError


def _rows(df) -> dict:
    return {
        r["doc_id"]: (tuple(r["tokens"]), r["n_tok"], r["source"])
        for r in df.select("doc_id", "tokens", "n_tok", "source").collect()
    }


@pytest.fixture()
def table(spark, tmp_path):
    initial = datagen.gen_initial_state(200, seed=91, max_len=12)
    eng = CdcEngine(spark, str(tmp_path / "upd"), n_buckets=4, mor_max_deltas=4)
    eng.bootstrap(datagen.state_to_df(spark, initial))
    # one delta batch so SOME buckets carry MOR chains and some stay clean —
    # the update's read side must compose both paths
    evs = datagen.gen_events(
        [d["doc_id"] for d in initial], n_events=60, n_batches=1, seed=7
    )
    eng.apply_batch(datagen.events_to_df(spark, evs), batch_id=0)
    return eng


def test_update_state_equality_and_exactly_once(spark, table):
    before = _rows(table.state())
    n_wal = sum(1 for v in before.values() if v[2] == "wal")
    assert n_wal > 0

    rep = table.update_where(
        {"tokens": "concat(tokens, array(7, 7))", "source": "'swept'"},
        [("source", "=", "wal")],
        batch_id=5,
    )
    assert rep["metrics"]["kind"] == "update_where"
    assert rep["metrics"]["updated"] == n_wal

    after = _rows(table.state())
    assert set(after) == set(before)
    for k, (tok, nt, src) in before.items():
        if src == "wal":
            # engine invariant: n_tok re-derived from the POST-update tokens
            assert after[k] == (tok + (7, 7), nt + 2, "swept")
        else:
            assert after[k] == (tok, nt, src)

    # idempotent redelivery returns the committed manifest, applies nothing
    rep2 = table.update_where(
        {"tokens": "concat(tokens, array(7, 7))", "source": "'swept'"},
        [("source", "=", "wal")],
        batch_id=5,
    )
    assert rep2["epoch"] == rep["epoch"]
    assert _rows(table.state()) == after

    # same batch id, different SET → conflict
    with pytest.raises(ConflictError):
        table.update_where(
            {"source": "'other'"}, [("source", "=", "wal")], batch_id=5
        )


def test_update_old_row_semantics(spark, table):
    """Every SET expression evaluates against the OLD row (standard SQL
    UPDATE): SET source = n_tok, n_tok = length(source) must use the
    original source's length, not the stringified n_tok's."""
    before = _rows(table.state())
    rep = table.update_where(
        {"source": "cast(n_tok as string)", "n_tok": "length(source)"},
        [("source", "=", "wal")],
        batch_id=5,
    )
    assert rep["metrics"]["updated"] > 0
    after = _rows(table.state())
    for k, (tok, nt, src) in before.items():
        if src == "wal":
            assert after[k] == (tok, len("wal"), str(nt))
        else:
            assert after[k] == (tok, nt, src)


def test_update_noop_refusals_and_zonemap(spark, table):
    before = _rows(table.state())
    head = table.table.latest_manifest()["epoch"]

    rep = table.update_where(
        {"source": "'x'"}, [("source", "=", "absent")], batch_id=6
    )
    assert rep["metrics"]["updated"] == 0
    assert rep["epoch"] == head + 1  # no-op epoch still commits
    # clean buckets' dirs are zone-map skipped for the absent literal
    assert rep["metrics"]["zonemap_dirs_skipped"] > 0
    assert _rows(table.state()) == before

    with pytest.raises(ValueError):
        table.update_where(
            {"doc_id": "'k'"}, [("source", "=", "wal")], batch_id=7
        )
    with pytest.raises(KeyError):
        table.update_where(
            {"nope": "1"}, [("source", "=", "wal")], batch_id=7
        )
    with pytest.raises(ValueError):
        table.update_where({}, [("source", "=", "wal")], batch_id=7)


def test_update_changelog_consumer(spark, table):
    """A changelog-maintained rollup refreshed across an update epoch must
    equal a full recompute — updates flow as normal delta-link upserts."""
    from pyspark.sql import types as T

    from georef_ar_etl_spark.operators.index_maintenance import (
        ContinuousAggregate,
    )

    agg_root = table.table.root + "_agg"
    head = table.table.latest_manifest()["epoch"]
    agg = ContinuousAggregate(
        spark, agg_root,
        group_exprs=lambda: [F.col("source")],
        group_fields=[("source", T.StringType())],
        value_expr=lambda: F.col("n_tok"),
        value_type=T.IntegerType(),
        n_buckets=2,
    )
    agg.bootstrap(table.state(epoch=head), source_epoch=head)

    rep = table.update_where(
        {"tokens": "slice(tokens, 1, 1)"}, [("source", "=", "wal")], batch_id=5
    )
    assert rep["metrics"]["updated"] > 0
    agg.refresh(table.changes(head, rep["epoch"]), rep["epoch"])

    want = sorted(
        (r["source"], r["n"], r["sum_v"])
        for r in table.state().groupBy("source").agg(
            F.count(F.lit(1)).alias("n"), F.sum("n_tok").alias("sum_v")
        ).collect()
    )
    got = sorted(
        (r["source"], r["n"], r["sum_v"])
        for r in agg.aggregate().select("source", "n", "sum_v").collect()
    )
    assert got == want


def test_update_skips_dv_dead_rows(spark, table):
    """Rows masked by a deletion vector are dead: a predicate matching them
    must not resurrect them (the read side is DV-aware)."""
    before = _rows(table.state())
    wal = sorted(k for k, v in before.items() if v[2] == "wal")
    killed = wal[: len(wal) // 2]
    rep_del = table.delete_keys_dv(killed, batch_id=5)
    assert rep_del["metrics"]["deleted"] == len(killed)

    rep = table.update_where(
        {"source": "'swept'"}, [("source", "=", "wal")], batch_id=6
    )
    assert rep["metrics"]["updated"] == len(wal) - len(killed)
    after = _rows(table.state())
    assert set(after) == set(before) - set(killed)
    assert all(v[2] != "wal" for k, v in after.items() if k in wal)


def test_update_after_rename_binds_new_logical_name(spark, tmp_path):
    """After a metadata-only rename, update_where addressing the NEW
    logical name (in both SET and WHERE) must bind to the same physical
    column the pre-rename batches wrote."""
    initial = datagen.gen_initial_state(120, seed=31, max_len=12)
    events = datagen.gen_events(
        [d["doc_id"] for d in initial], n_events=80, n_batches=1,
        seed=22, evolve_from_batch=0,  # src_meta present from batch 0
    )
    eng = CdcEngine(spark, str(tmp_path / "ren"), n_buckets=4)
    eng.bootstrap(datagen.state_to_df(spark, initial))
    eng.apply_batch(datagen.events_to_df(spark, events), 0)
    eng.rename_column("src_meta", "origin_meta")

    before = {
        r["doc_id"]: (r["source"], r["origin_meta"])
        for r in eng.state().collect()
    }
    assert sum(
        1 for s, v in before.values() if s == "wal" and v is not None
    ) > 0
    rep = eng.update_where(
        {"origin_meta": "upper(origin_meta)"},
        [("source", "=", "wal")],
        batch_id=5,
    )
    assert rep["metrics"]["updated"] == sum(
        1 for s, _ in before.values() if s == "wal"
    )
    after = {r["doc_id"]: r["origin_meta"] for r in eng.state().collect()}
    for k, (s, v) in before.items():
        if s == "wal" and v is not None:
            assert after[k] == v.upper()
        else:
            assert after[k] == v


def test_update_survives_compaction_and_further_batches(spark, table):
    initial_ids = sorted(_rows(table.state()))
    rep = table.update_where(
        {"tokens": "concat(array(1), tokens)"}, [("source", "=", "wal")],
        batch_id=5,
    )
    assert rep["metrics"]["updated"] > 0
    want = _rows(table.state())
    table.compact(min_deltas=1)
    assert _rows(table.state()) == want
    # a later change batch merges over the compacted updated state
    evs = datagen.gen_events(initial_ids, n_events=40, n_batches=1, seed=21)
    table.apply_batch(
        datagen.events_to_df(spark, evs).withColumn(
            "batch_id", F.lit(6).cast("long")
        ),
        batch_id=6,
    )
    assert len(_rows(table.state())) > 0

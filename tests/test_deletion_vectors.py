"""Positional deletion vectors (sinks/deletion_vectors.py +
SnapshotTable.delete_keys_dv): delete-only maintenance commits masked by
(file, position) so chain-free buckets stay on the native vectorized scan.

Covers: visible-state equality, no-op accounting, exactly-once redelivery,
read-plan shape (no mapInPandas, broadcast anti-join), point lookups,
changelog emission, DV interplay with the MOR chain (tombstone fallback,
delta-mode merges over a DV'd base, re-insert classification), rewrite /
compaction retiring the DV, time travel, rollback, and vacuum retention.
"""

import os

import pytest
from pyspark.sql import functions as F

from georef_ar_etl_spark import datagen
from georef_ar_etl_spark.engine import CdcEngine


def _ids(df) -> set:
    return {r["doc_id"] for r in df.select("doc_id").collect()}


def _rows(df) -> set:
    return {
        (r["doc_id"], tuple(r["tokens"]), r["n_tok"], r["source"])
        for r in df.select("doc_id", "tokens", "n_tok", "source").collect()
    }


@pytest.fixture()
def table(spark, tmp_path):
    initial = datagen.gen_initial_state(200, seed=91, max_len=12)
    eng = CdcEngine(spark, str(tmp_path / "dvt"), n_buckets=4, mor_max_deltas=3)
    eng.bootstrap(datagen.state_to_df(spark, initial))
    return eng


def test_dv_delete_state_noops_and_exactly_once(spark, table):
    before = _rows(table.state())
    live = sorted(k for k, *_ in before)[:8]
    targets = live + ["9999999999999"]  # one absent key

    rep = table.delete_keys_dv(targets, batch_id=1)
    assert rep["metrics"]["kind"] == "dv_delete"
    assert rep["metrics"]["deleted"] == 8
    assert rep["metrics"]["delete_noop"] == 1
    assert rep["metrics"]["tombstone_buckets"] == []

    after = _rows(table.state())
    assert after == {r for r in before if r[0] not in set(live)}

    # idempotent redelivery returns the committed manifest, applies nothing
    rep2 = table.delete_keys_dv(targets, batch_id=1)
    assert rep2["epoch"] == rep["epoch"]
    assert _rows(table.state()) == after

    # same id, different keys → conflict
    from georef_ar_etl_spark.sinks.snapshot_table import ConflictError

    with pytest.raises(ConflictError):
        table.delete_keys_dv(live[:2], batch_id=1)

    # deleting already-DV-deleted keys again is a pure no-op epoch
    rep3 = table.delete_keys_dv(live[:3], batch_id=2)
    assert rep3["metrics"]["deleted"] == 0
    assert rep3["metrics"]["delete_noop"] == 3
    assert _rows(table.state()) == after

    # bucket_counts stay exact across the DV commits
    head = table.table.latest_manifest()
    assert head["total_rows"] == len(after)


def test_dv_read_plan_stays_native(spark, table):
    live = sorted(_ids(table.state()))[:5]
    table.delete_keys_dv(live, batch_id=1)
    plan = table.state()._jdf.queryExecution().executedPlan().toString()
    # chain-free DV buckets must NOT fall onto the per-bucket pandas resolve
    assert "mapinpandas" not in plan.lower().replace(" ", "")
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_dv_lookup_changelog_and_time_travel(spark, table):
    before = _ids(table.state())
    live = sorted(before)[:6]
    table.delete_keys_dv(live, batch_id=1)

    kept = sorted(before - set(live))[0]
    got = _ids(table.table.lookup_keys([live[0], live[3], kept]))
    assert got == {kept}

    ch = table.changes(0, 1).collect()
    assert {(r["doc_id"], r["op"]) for r in ch} == {(k, "delete") for k in live}
    assert all(r["tokens"] is None for r in ch)

    # time travel reads the pre-DV snapshot intact
    assert _ids(table.state(epoch=0)) == before

    # rollback to pre-DV restores the rows
    table.rollback(0)
    assert _ids(table.state()) == before


def test_dv_reinsert_classifies_as_insert_and_merge_over_dv_base(spark, table):
    before = _rows(table.state())
    live = sorted(k for k, *_ in before)[:4]
    table.delete_keys_dv(live, batch_id=1)

    # upsert one DV-deleted key back + delete another (already dead → noop)
    ev = [
        {"batch_id": 2, "seq": 0, "op": "insert", "doc_id": live[0],
         "tokens": [5, 5], "n_tok": None, "source": "wal"},
        {"batch_id": 2, "seq": 1, "op": "delete", "doc_id": live[1],
         "tokens": None, "n_tok": None, "source": "wal"},
    ]
    rep = table.apply_batch(datagen.events_to_df(spark, ev), batch_id=2)
    acts = rep["metrics"]["actions"]
    assert acts.get("insert") == 1, acts  # NOT update: the DV killed it
    assert acts.get("delete_noop") == 1, acts
    st = _rows(table.state())
    assert (live[0], (5, 5), 2, "wal") in st
    assert not {live[1], live[2], live[3]} & {r[0] for r in st}


def test_dv_then_chain_then_tombstone_fallback(spark, table):
    """A bucket with a pending delta chain that MIGHT hold the delete key
    routes to the equality-tombstone fallback; DV-eligible buckets in the
    same call stay positional. Changelog emits each key exactly once."""
    before = _ids(table.state())
    chain_key = sorted(before)[0]
    # grow a delta chain containing chain_key (update → delta link whose
    # bloom knows it)
    ev = [{"batch_id": 1, "seq": 0, "op": "update", "doc_id": chain_key,
           "tokens": [9], "n_tok": None, "source": "wal"}]
    rep = table.apply_batch(datagen.events_to_df(spark, ev), batch_id=1)
    assert rep["metrics"]["merge_modes"]["delta"] == 1

    # pick a second victim from a DIFFERENT bucket than chain_key's
    man = table.table.latest_manifest()
    chain_buckets = set(man.get("bucket_deltas") or {})
    other = next(
        k for k in sorted(before)
        if str(_bucket_of(spark, k, int(man["n_buckets"])))
        not in chain_buckets
    )
    rep2 = table.delete_keys_dv([chain_key, other], batch_id=2)
    assert rep2["metrics"]["deleted"] == 2
    assert rep2["metrics"]["tombstone_buckets"] != []
    assert rep2["metrics"]["dv_buckets"] != []

    st = _ids(table.state())
    assert chain_key not in st and other not in st

    ch = table.changes(1, 2).collect()
    assert {(r["doc_id"], r["op"]) for r in ch} == {
        (chain_key, "delete"), (other, "delete"),
    }


def test_compact_retires_dv_and_diff_changelog_is_dv_aware(spark, table):
    before = _ids(table.state())
    live = sorted(before)[:5]
    table.delete_keys_dv(live, batch_id=1)
    st_before = _rows(table.state())

    man = table.compact(min_deltas=1)  # DV counts as one pending link
    assert man is not None
    assert not man.get("bucket_dvs")
    assert _rows(table.state()) == st_before

    # the rewrite epoch's value-diff must NOT re-emit the DV deletions
    # (old side resolves WITH the DV mask) — compaction is invisible
    ch = table.changes(1).collect()
    assert ch == []


def test_vacuum_retains_referenced_dv_then_sweeps_spent_ones(spark, table):
    live = sorted(_ids(table.state()))[:5]
    rep = table.delete_keys_dv(live, batch_id=1)
    dv_rel = next(iter(rep["bucket_dvs"].values()))
    dv_abs = os.path.join(table.table.root, dv_rel)
    st = _rows(table.state())

    table.table.vacuum(keep_last=1)
    assert os.path.isdir(dv_abs)  # still referenced by the head manifest
    assert _rows(table.state()) == st

    table.compact(min_deltas=1)  # retires the DV
    table.table.vacuum(keep_last=1)
    assert not os.path.isdir(dv_abs)  # spent and unreferenced → swept
    assert _rows(table.state()) == st


def test_dv_survives_delta_merge_on_same_bucket(spark, table):
    """A later delta-mode merge on a DV'd bucket carries the DV (base is
    unchanged) — resolution stays (base − DV) then chain LWW."""
    before = _ids(table.state())
    victim, other = sorted(before)[0], sorted(before)[1]
    table.delete_keys_dv([victim], batch_id=1)
    # small update batch → delta mode on victim's (and other's) buckets
    ev = [{"batch_id": 2, "seq": 0, "op": "update", "doc_id": other,
           "tokens": [3, 3, 3], "n_tok": None, "source": "wal"}]
    rep = table.apply_batch(datagen.events_to_df(spark, ev), batch_id=2)
    assert rep["metrics"]["merge_modes"]["delta"] >= 1
    st = _ids(table.state())
    assert victim not in st and other in st
    head = table.table.latest_manifest()
    assert head.get("bucket_dvs")  # DV carried through the delta commit


def test_rewrite_diff_changelog_masks_old_side_dv(spark, tmp_path):
    """The changelog's rewrite-diff path must resolve the OLD side with its
    deletion vector: without the mask the DV-deleted rows look live in the
    parent state and the rewrite epoch re-emits them as spurious deletes."""
    initial = datagen.gen_initial_state(60, seed=7, max_len=8)
    eng = CdcEngine(
        spark, str(tmp_path / "cow"), n_buckets=2, mor_rewrite_ratio=0,
    )  # pure COW → every batch is a rewrite epoch → diff changelog path
    eng.bootstrap(datagen.state_to_df(spark, initial))
    before = sorted(_ids(eng.state()))
    victim, updated = before[0], before[1]
    eng.delete_keys_dv([victim], batch_id=1)

    ev = [{"batch_id": 2, "seq": 0, "op": "update", "doc_id": updated,
           "tokens": [1, 2], "n_tok": None, "source": "wal"}]
    eng.apply_batch(datagen.events_to_df(spark, ev), batch_id=2)

    # rewrite epoch emits ONLY the update — no resurrection of the DV delete
    ch2 = eng.changes(1, 2).collect()
    assert {(r["doc_id"], r["op"]) for r in ch2} == {(updated, "upsert")}
    # full range: one delete (dvdel artifact) + one upsert, exactly once
    ch = eng.changes(0, 2).collect()
    assert sorted((r["doc_id"], r["op"]) for r in ch) == sorted(
        [(victim, "delete"), (updated, "upsert")]
    )
    # the rewrite spent the DV
    assert not eng.table.latest_manifest().get("bucket_dvs")


def test_changelog_consumer_crosses_dv_epoch(spark, tmp_path):
    """A changelog-maintained rollup refreshed across a deletion-vector
    epoch must equal a full recompute — the dvdel artifact rows are plain
    idempotent deletes to every downstream consumer."""
    from pyspark.sql import types as T

    from georef_ar_etl_spark.operators.index_maintenance import (
        ContinuousAggregate,
    )

    initial = datagen.gen_initial_state(150, seed=55, max_len=12)
    eng = CdcEngine(spark, str(tmp_path / "src"), n_buckets=2)
    eng.bootstrap(datagen.state_to_df(spark, initial))
    agg = ContinuousAggregate(
        spark, str(tmp_path / "agg"),
        group_exprs=lambda: [F.col("source")],
        group_fields=[("source", T.StringType())],
        value_expr=lambda: F.col("n_tok"),
        value_type=T.IntegerType(),
        n_buckets=2,
    )
    agg.bootstrap(eng.state(epoch=0), source_epoch=0)

    def recompute():
        return sorted(
            (r["source"], r["n"], r["sum_v"], r["min_v"], r["max_v"])
            for r in eng.state().groupBy("source").agg(
                F.count(F.lit(1)).alias("n"), F.sum("n_tok").alias("sum_v"),
                F.min("n_tok").alias("min_v"), F.max("n_tok").alias("max_v"),
            ).collect()
        )

    # delete each source's current MIN-n_tok doc — forces the consumer's
    # member-list recompute path, not just partial subtraction
    mins = (
        eng.state()
        .withColumn(
            "rn",
            F.row_number().over(
                __import__("pyspark.sql.window", fromlist=["Window"])
                .Window.partitionBy("source")
                .orderBy("n_tok", "doc_id")
            ),
        )
        .filter(F.col("rn") == 1)
        .select("doc_id")
        .collect()
    )
    rep = eng.delete_keys_dv([r["doc_id"] for r in mins], batch_id=1)
    assert rep["metrics"]["deleted"] == len(mins)
    agg.refresh(eng.changes(0, rep["epoch"]), rep["epoch"])
    got = sorted(
        (r["source"], r["n"], r["sum_v"], r["min_v"], r["max_v"])
        for r in agg.aggregate().collect()
    )
    assert got == recompute()


def test_tag_pins_dv_epoch_through_vacuum(spark, table):
    """A tag on a DV-carrying epoch keeps its DV dirs through vacuum, so
    the pinned read stays masked forever."""
    live = sorted(_ids(table.state()))[:5]
    rep = table.delete_keys_dv(live, batch_id=1)
    pinned = _rows(table.state())
    table.create_tag("dv-pin")
    table.compact(min_deltas=1)  # head moves on, DV spent at head
    table.table.vacuum(keep_last=1)
    for rel in rep["bucket_dvs"].values():
        assert os.path.isdir(os.path.join(table.table.root, rel)), rel
    assert _rows(table.state(tag="dv-pin")) == pinned


def test_delete_where_predicate_sweep(spark, table):
    """DELETE FROM WHERE over mixed clean/chain buckets: DV positions for
    chain-free candidates (zone-map-pruned scan), distributed tombstones
    for chain buckets; changelog emits each key once; exactly-once."""
    before = _rows(table.state())
    # dirty ONE bucket with a small update so both paths participate
    some_key = sorted(k for k, *_ in before)[0]
    ev = [{"batch_id": 1, "seq": 0, "op": "update", "doc_id": some_key,
           "tokens": [2, 2, 2], "n_tok": None, "source": "sweepme"}]
    table.apply_batch(datagen.events_to_df(spark, ev), batch_id=1)
    cur = _rows(table.state())
    expect_gone = {r[0] for r in cur if r[3] == "sweepme"}
    assert some_key in expect_gone

    rep = table.delete_where([("source", "=", "sweepme")], batch_id=2)
    assert rep["metrics"]["kind"] == "dv_delete_where"
    assert rep["metrics"]["deleted"] == len(expect_gone)

    after = _rows(table.state())
    assert after == {r for r in cur if r[3] != "sweepme"}
    assert {r[0] for r in after} == {r[0] for r in cur} - expect_gone

    # changelog: exactly one delete per swept key
    ch = table.changes(rep["epoch"] - 1, rep["epoch"]).collect()
    assert sorted(r["doc_id"] for r in ch) == sorted(expect_gone)
    assert all(r["op"] == "delete" for r in ch)

    # exactly-once redelivery; different predicate under same id conflicts
    rep2 = table.delete_where([("source", "=", "sweepme")], batch_id=2)
    assert rep2["epoch"] == rep["epoch"]
    from georef_ar_etl_spark.sinks.snapshot_table import ConflictError

    with pytest.raises(ConflictError):
        table.delete_where([("source", "=", "other")], batch_id=2)

    # no-op sweep (nothing matches) commits an empty epoch
    rep3 = table.delete_where([("source", "=", "nosuch")], batch_id=3)
    assert rep3["metrics"]["deleted"] == 0
    assert _rows(table.state()) == after

    # counts stay exact
    assert table.table.latest_manifest()["total_rows"] == len(after)


def test_delete_where_range_predicate_and_zone_pruning(spark, table):
    cur = _rows(table.state())
    hi = sorted({r[2] for r in cur})[-1]  # max n_tok value present
    expect_gone = {r[0] for r in cur if r[2] >= hi}
    rep = table.delete_where([("n_tok", ">=", hi)], batch_id=1)
    assert rep["metrics"]["deleted"] == len(expect_gone)
    after = _rows(table.state())
    assert {r[0] for r in after} == {r[0] for r in cur} - expect_gone
    # sweeping a range with no survivors-to-match skips every dir
    rep2 = table.delete_where([("n_tok", ">=", hi)], batch_id=2)
    assert rep2["metrics"]["deleted"] == 0


def _bucket_of(spark, key: str, nb: int) -> int:
    from georef_ar_etl_spark.sinks.snapshot_table import bucket_expr

    return (
        spark.createDataFrame([(key,)], "k string")
        .select(bucket_expr(F.col("k"), nb).alias("b"))
        .collect()[0]["b"]
    )

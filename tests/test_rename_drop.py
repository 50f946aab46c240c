"""Metadata-only column rename / drop (Iceberg field-ID mapping analogue;
ALTER TABLE RENAME/DROP COLUMN without touching a data file).

Physical parquet column names are immutable; the manifest's sparse
``colmap`` binds logical names to them and ``dropped_cols`` retires
physical names so a re-added logical name can never resurrect dropped
values — the trap Iceberg's field IDs exist to prevent (reference
analogue: the additive-only Alembic migrations,
migrations/versions/7cedddd7547a_.py, offer no rename at all; the
engine-level contract guard mirrors the reference's fixed table schemas,
georef_ar_etl/utils.py:62-91)."""

import os

import pyspark.sql.functions as F
import pyspark.sql.types as T
import pytest

from georef_ar_etl_spark import datagen
from georef_ar_etl_spark.engine import CdcEngine
from georef_ar_etl_spark.oracle import apply_events, state_as_sorted_rows
from georef_ar_etl_spark.schemas import SchemaContractError

EVOLVED_SCHEMA = T.StructType(
    list(datagen.EVENT_SCHEMA.fields)
    + [T.StructField("src_meta", T.StringType(), True)]
)
RENAMED_SCHEMA = T.StructType(
    list(datagen.EVENT_SCHEMA.fields)
    + [T.StructField("origin_meta", T.StringType(), True)]
)


def _seeded(spark, tmp_path, n_rows=120, n_events=480, n_batches=4):
    initial = datagen.gen_initial_state(n_rows, seed=21, max_len=24)
    events = datagen.gen_events(
        [r["doc_id"] for r in initial],
        n_events=n_events,
        n_batches=n_batches,
        seed=22,
        max_len=24,
        evolve_from_batch=0,  # src_meta present from batch 0
    )
    eng = CdcEngine(spark, str(tmp_path / "t"), n_buckets=8)
    eng.bootstrap(datagen.state_to_df(spark, initial))
    return eng, initial, events


def _renamed_events(events):
    return [
        {**{k: v for k, v in e.items() if k != "src_meta"},
         "origin_meta": e.get("src_meta")}
        for e in events
    ]


def test_rename_mid_replay_matches_oracle(spark, tmp_path):
    """Batches 0-1 write src_meta; a rename flips it to origin_meta;
    batches 2-3 address origin_meta and must land in the SAME column."""
    eng, initial, events = _seeded(spark, tmp_path)
    for b in range(2):
        eng.apply_batch(
            datagen.events_to_df(spark, [e for e in events if e["batch_id"] == b]), b
        )
    head_before = eng.table.latest_manifest()
    m = eng.rename_column("src_meta", "origin_meta")
    # metadata-only: identical bucket map, no data dir moved, no batch id
    assert m["buckets"] == head_before["buckets"]
    assert m["bucket_counts"] == head_before["bucket_counts"]
    assert m["batch_id"] is None
    assert m["colmap"] == {"origin_meta": "src_meta"}

    for b in range(2, 4):
        evs = _renamed_events([e for e in events if e["batch_id"] == b])
        mm = eng.apply_batch(spark.createDataFrame(evs, RENAMED_SCHEMA), b)
        # origin_meta binds to the existing physical column — NOT an add
        assert mm["metrics"]["schema_added_columns"] == []

    # oracle: one logical column across the whole replay
    oracle_state, _ = apply_events(
        {r["doc_id"]: dict(r) for r in initial}, _renamed_events(events)
    )
    expected = state_as_sorted_rows(oracle_state)
    got = [
        r.asDict(recursive=True)
        for r in eng.state().orderBy("doc_id").collect()
    ]
    assert [g["doc_id"] for g in got] == [w["doc_id"] for w in expected]
    for g, w in zip(got, expected):
        assert list(g["tokens"]) == list(w["tokens"])
        assert g["origin_meta"] == w.get("origin_meta")
    assert "src_meta" not in got[0]


def test_rename_redelivery_and_time_travel(spark, tmp_path):
    """A pre-rename batch re-delivered AFTER the rename (still carrying the
    old column name) short-circuits idempotently; time travel shows each
    epoch under the names it had then."""
    eng, initial, events = _seeded(spark, tmp_path)
    b0 = [e for e in events if e["batch_id"] == 0]
    m0 = eng.apply_batch(datagen.events_to_df(spark, b0), 0)
    eng.rename_column("src_meta", "origin_meta")

    redo = eng.apply_batch(datagen.events_to_df(spark, b0), 0)
    assert redo["epoch"] == m0["epoch"]  # digest matched → no-op re-apply

    assert "src_meta" in eng.state(epoch=m0["epoch"]).columns
    assert "origin_meta" in eng.state().columns
    # logical point lookup + changelog come back under head names
    lk = eng.table.lookup_keys([initial[0]["doc_id"]])
    assert "origin_meta" in lk.columns
    chg = eng.table.read_changes(0)
    assert "origin_meta" in chg.columns and "src_meta" not in chg.columns
    assert chg.count() > 0


def test_drop_then_readd_does_not_resurrect(spark, tmp_path):
    """The classic field-ID trap: drop a column, re-add the same logical
    name — old values must NOT come back."""
    eng, initial, events = _seeded(spark, tmp_path, n_batches=2)
    for b in range(2):
        eng.apply_batch(
            datagen.events_to_df(spark, [e for e in events if e["batch_id"] == b]), b
        )
    pre_drop_epoch = eng.table.latest_manifest()["epoch"]
    n_meta = (
        eng.state().filter(F.col("src_meta").isNotNull()).count()
    )
    assert n_meta > 0

    dm = eng.drop_column("src_meta")
    assert dm["dropped_cols"] == ["src_meta"]
    assert "src_meta" not in eng.state().columns
    # pre-drop epoch still shows it (schema-as-of)
    assert "src_meta" in eng.state(epoch=pre_drop_epoch).columns

    # re-add the SAME logical name: binds a fresh physical column
    key = initial[0]["doc_id"]
    evs = [{
        "batch_id": 2, "seq": 0, "op": "update", "doc_id": key,
        "tokens": [5, 6, 7], "n_tok": 3, "source": "s0", "src_meta": "FRESH",
    }]
    m2 = eng.apply_batch(spark.createDataFrame(evs, EVOLVED_SCHEMA), 2)
    assert m2["colmap"]["src_meta"].startswith("src_meta__e")
    rows = eng.state().select("doc_id", "src_meta").collect()
    non_null = {r["doc_id"]: r["src_meta"] for r in rows if r["src_meta"] is not None}
    assert non_null == {key: "FRESH"}  # nothing resurrected


def test_rename_survives_compaction_rescale_and_zonemap_where(spark, tmp_path):
    eng, initial, events = _seeded(spark, tmp_path)
    for b in range(2):
        eng.apply_batch(
            datagen.events_to_df(spark, [e for e in events if e["batch_id"] == b]), b
        )
    eng.rename_column("src_meta", "origin_meta")
    before = {
        r["doc_id"]: r
        for r in eng.state().collect()
    }

    # logical predicate on the renamed column plans against the physical
    # zone maps and filters exactly
    stats = {}
    some_meta = next(
        v["origin_meta"] for v in before.values() if v["origin_meta"] is not None
    )
    got = eng.state(where=[("origin_meta", "=", some_meta)], stats=stats).collect()
    assert got and all(r["origin_meta"] == some_meta for r in got)
    assert set(stats) >= {"zonemap_dirs_skipped", "zonemap_dirs_kept"}

    # physical rewrites preserve the mapping
    eng.compact(min_deltas=0, cluster_by=["origin_meta"])
    eng.rescale(16)
    after = {r["doc_id"]: r for r in eng.state().collect()}
    assert after.keys() == before.keys()
    for k in before:
        assert after[k]["origin_meta"] == before[k]["origin_meta"]
        assert list(after[k]["tokens"]) == list(before[k]["tokens"])

    # a post-rescale batch under the new name still merges
    key = initial[1]["doc_id"]
    evs = [{
        "batch_id": 2, "seq": 0, "op": "update", "doc_id": key,
        "tokens": [9], "n_tok": 1, "source": "s1", "origin_meta": "late",
    }]
    eng.apply_batch(spark.createDataFrame(evs, RENAMED_SCHEMA), 2)
    assert (
        eng.state().filter(F.col("doc_id") == key).first()["origin_meta"]
        == "late"
    )


def test_contract_columns_protected_and_validation(spark, tmp_path):
    eng, _initial, events = _seeded(spark, tmp_path, n_batches=1)
    eng.apply_batch(datagen.events_to_df(spark, events), 0)
    with pytest.raises(SchemaContractError):
        eng.rename_column("doc_id", "key")
    with pytest.raises(SchemaContractError):
        eng.rename_column("src_meta", "tokens")  # collides with contract
    with pytest.raises(SchemaContractError):
        eng.drop_column("tokens")
    with pytest.raises(KeyError):
        eng.rename_column("nope", "x")
    with pytest.raises(ValueError):
        eng.table.rename_column("src_meta", "not a name")
    eng.rename_column("src_meta", "origin_meta")
    with pytest.raises(ValueError):
        eng.table.rename_column("origin_meta", "source")  # exists


def test_drop_is_physically_shed_on_rewrite(spark, tmp_path):
    """After a drop, a compaction/rescale rewrite materializes files WITHOUT
    the dropped physical column (bytes are actually reclaimed), while
    pre-rewrite files keep them (and reads just never project them)."""
    import pyarrow.parquet as pq

    eng, _initial, events = _seeded(spark, tmp_path, n_batches=1)
    eng.apply_batch(datagen.events_to_df(spark, events), 0)
    eng.drop_column("src_meta")
    eng.rescale(4)  # full rewrite under the live (post-drop) schema
    m = eng.table.latest_manifest()
    rel = next(d for d in m["buckets"].values() if d)
    f = eng.table._dir_files(rel)[0]
    names = pq.read_schema(f).names
    assert "src_meta" not in names
    assert {"doc_id", "tokens", "n_tok", "source"} <= set(names)


def test_add_column_ddl_and_interplay(spark, tmp_path):
    """Explicit ALTER TABLE ADD COLUMN: metadata-only, NULL for existing
    rows, addressable by update_where SETs and merge_into inserts; a
    drop + re-add binds a fresh physical column (no resurrection)."""
    from pyspark.sql import functions as F

    from georef_ar_etl_spark import datagen
    from georef_ar_etl_spark.engine import CdcEngine

    initial = datagen.gen_initial_state(120, seed=3, max_len=10)
    eng = CdcEngine(spark, str(tmp_path / "addcol"), n_buckets=4)
    eng.bootstrap(datagen.state_to_df(spark, initial))

    eng.add_column("priority", "int", comment="curation priority")
    st = eng.state()
    assert "priority" in st.columns
    assert st.filter(F.col("priority").isNotNull()).count() == 0

    rep = eng.update_where(
        {"priority": "n_tok * 10"}, [("source", "=", "wal")], batch_id=1
    )
    assert rep["metrics"]["updated"] > 0
    rows = eng.state().select("doc_id", "n_tok", "source", "priority").collect()
    for r in rows:
        want = r["n_tok"] * 10 if r["source"] == "wal" else None
        assert r["priority"] == want

    src = spark.createDataFrame(
        [("NEWDOC0000001", [1, 2, 3], "new", 7)],
        "doc_id string, tokens array<int>, source string, priority int",
    )
    eng.merge_into(src, batch_id=2, when_not_matched=[(None, None)])
    row = eng.state().filter(F.col("doc_id") == "NEWDOC0000001").collect()[0]
    assert row["priority"] == 7 and row["n_tok"] == 3

    with pytest.raises(ValueError, match="already exists"):
        eng.add_column("priority", "int")

    eng.drop_column("priority")
    eng.add_column("priority", "int")
    assert eng.state().filter(F.col("priority").isNotNull()).count() == 0
    m = eng.table.latest_manifest()
    assert m["colmap"].get("priority", "").startswith("priority__e")
    eng.compact(min_deltas=1)
    assert eng.state().filter(F.col("priority").isNotNull()).count() == 0

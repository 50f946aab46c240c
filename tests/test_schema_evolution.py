"""Additive schema evolution mid-replay (FIXTURES.md F3; reference analogue:
additive Alembic migrations, migrations/versions/7cedddd7547a_.py)."""

from georef_ar_etl_spark import datagen
from georef_ar_etl_spark.engine import CdcEngine
from georef_ar_etl_spark.oracle import apply_events, state_as_sorted_rows


def test_src_meta_column_arrives_mid_replay(spark, tmp_path):
    initial = datagen.gen_initial_state(150, seed=11, max_len=24)
    events = datagen.gen_events(
        [r["doc_id"] for r in initial],
        n_events=600,
        n_batches=4,
        seed=12,
        max_len=24,
        evolve_from_batch=2,  # src_meta appears from batch 2 on
    )
    eng = CdcEngine(spark, str(tmp_path / "t"), n_buckets=8)
    eng.bootstrap(datagen.state_to_df(spark, initial))

    # pre-evolution batches arrive WITHOUT the column; post-evolution WITH it
    for b in range(4):
        batch = [e for e in events if e["batch_id"] == b]
        if b < 2:
            batch = [{k: v for k, v in e.items() if k != "src_meta"} for e in batch]
        m = eng.apply_batch(datagen.events_to_df(spark, batch), b)
        if b == 2:
            assert m["metrics"]["schema_added_columns"] == ["src_meta"]

    state_df = eng.state()
    assert "src_meta" in state_df.columns

    oracle_state, _ = apply_events({r["doc_id"]: dict(r) for r in initial}, events)
    expected = state_as_sorted_rows(oracle_state)
    got = [r.asDict(recursive=True) for r in state_df.orderBy("doc_id").collect()]
    assert len(got) == len(expected)
    n_with_meta = 0
    for g, w in zip(got, expected):
        assert g["doc_id"] == w["doc_id"]
        assert list(g["tokens"]) == list(w["tokens"])
        assert g["src_meta"] == w.get("src_meta")  # old rows read as null
        n_with_meta += g["src_meta"] is not None
    assert 0 < n_with_meta < len(got)  # both populations exist


def _long_events(events):
    """Re-emit a seeded event batch under WIDE types (tokens array<long>,
    n_tok long) — the upstream-source-widened-its-ints scenario."""
    import pyspark.sql.types as T

    wide_schema = T.StructType([
        T.StructField("batch_id", T.LongType()),
        T.StructField("seq", T.LongType()),
        T.StructField("op", T.StringType()),
        T.StructField("doc_id", T.StringType()),
        T.StructField("tokens", T.ArrayType(T.LongType())),
        T.StructField("n_tok", T.LongType()),
        T.StructField("source", T.StringType()),
    ])
    return wide_schema


def test_type_widening_mid_replay(spark, tmp_path):
    """int→bigint widening arrives mid-replay: metadata-only evolution —
    untouched buckets keep their int32 files, state reads under the wide
    manifest schema, values equal the oracle throughout."""
    import pyspark.sql.types as T

    initial = datagen.gen_initial_state(150, seed=21, max_len=16)
    events = datagen.gen_events(
        [r["doc_id"] for r in initial], n_events=600, n_batches=4, seed=22,
        max_len=16,
    )
    eng = CdcEngine(spark, str(tmp_path / "t"), n_buckets=8)
    eng.bootstrap(datagen.state_to_df(spark, initial))

    wide_schema = _long_events(events)
    for b in range(4):
        batch = [e for e in events if e["batch_id"] == b]
        df = datagen.events_to_df(spark, batch)
        if b >= 2:  # the source widened its integers from batch 2 on
            df = spark.createDataFrame(
                [tuple(e.get(f.name) for f in wide_schema.fields) for e in batch],
                wide_schema,
            )
        m = eng.apply_batch(df, b)
        if b == 2:
            assert m["metrics"]["schema_widened_columns"] == ["n_tok", "tokens"]
            assert m["metrics"]["schema_added_columns"] == []

    state_df = eng.state()
    # manifest-authoritative schema is now wide
    assert dict(state_df.dtypes)["n_tok"] == "bigint"
    assert dict(state_df.dtypes)["tokens"] == "array<bigint>"

    oracle_state, _ = apply_events({r["doc_id"]: dict(r) for r in initial}, events)
    expected = state_as_sorted_rows(oracle_state)
    got = [r.asDict(recursive=True) for r in state_df.orderBy("doc_id").collect()]
    assert len(got) == len(expected)
    for g, w in zip(got, expected):
        assert g["doc_id"] == w["doc_id"]
        assert g["tokens"] == w["tokens"], g["doc_id"]
        assert g["n_tok"] == w["n_tok"]


def test_type_widening_idempotent_narrow_redelivery(spark, tmp_path):
    """A narrow-shape batch re-delivered AFTER the widening must digest
    identically (exactly-once across evolution, like the additive case)."""
    initial = datagen.gen_initial_state(80, seed=31, max_len=8)
    events = datagen.gen_events(
        [r["doc_id"] for r in initial], n_events=200, n_batches=2, seed=32,
        max_len=8,
    )
    eng = CdcEngine(spark, str(tmp_path / "t"), n_buckets=4)
    eng.bootstrap(datagen.state_to_df(spark, initial))
    b0 = datagen.events_to_df(spark, [e for e in events if e["batch_id"] == 0])
    m0 = eng.apply_batch(b0, 0)

    wide_schema = _long_events(events)
    b1 = [e for e in events if e["batch_id"] == 1]
    m1 = eng.apply_batch(
        spark.createDataFrame(
            [tuple(e.get(f.name) for f in wide_schema.fields) for e in b1],
            wide_schema,
        ),
        1,
    )
    assert m1["metrics"]["schema_widened_columns"] == ["n_tok", "tokens"]
    # re-deliver batch 0 in its ORIGINAL narrow shape → same manifest back
    m0_again = eng.apply_batch(b0, 0)
    assert m0_again["epoch"] == m0["epoch"]


def test_narrowing_is_rejected(spark, tmp_path):
    """bigint→int would be lossy — the contract must refuse it."""
    import pytest

    from georef_ar_etl_spark.schemas import SchemaContractError, validate_contract
    import pyspark.sql.types as T

    wide_state = T.StructType([
        T.StructField("doc_id", T.StringType()),
        T.StructField("tokens", T.ArrayType(T.LongType())),
        T.StructField("n_tok", T.LongType()),
        T.StructField("source", T.StringType()),
    ])
    # a STRING n_tok is neither equal nor a widening in either direction
    bad = T.StructType([
        T.StructField("batch_id", T.LongType()),
        T.StructField("seq", T.LongType()),
        T.StructField("op", T.StringType()),
        T.StructField("doc_id", T.StringType()),
        T.StructField("tokens", T.ArrayType(T.LongType())),
        T.StructField("n_tok", T.StringType()),
        T.StructField("source", T.StringType()),
    ])
    c = validate_contract(bad, wide_state)
    assert not c.ok and any("type mismatch for n_tok" in e for e in c.errors)
    # narrow batch against wide state is ACCEPTED (upcast-on-ingest)
    narrow = T.StructType(list(bad.fields))
    narrow["n_tok"].dataType = T.IntegerType()
    c2 = validate_contract(narrow, wide_state)
    assert c2.ok and c2.widened_columns == []

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

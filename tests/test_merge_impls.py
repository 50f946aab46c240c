"""Both merge physical strategies (full-outer join vs storage-partitioned)
must produce identical final state and identical action counts."""

from georef_ar_etl_spark import datagen
from georef_ar_etl_spark.engine import CdcEngine


def test_join_and_copartitioned_merge_agree(spark, tmp_path):
    initial = datagen.gen_initial_state(200, seed=31, max_len=24)
    events = datagen.gen_events(
        [r["doc_id"] for r in initial], n_events=900, n_batches=3, seed=32, max_len=24
    )
    states, actions = [], []
    for impl in ("join", "copartitioned"):
        eng = CdcEngine(spark, str(tmp_path / impl), n_buckets=8, merge_impl=impl)
        eng.bootstrap(datagen.state_to_df(spark, initial))
        ms = eng.replay(datagen.events_to_df(spark, events))
        actions.append([m["metrics"]["actions"] for m in ms])
        states.append(
            [r.asDict(recursive=True) for r in eng.state().orderBy("doc_id").collect()]
        )
    assert states[0] == states[1]
    for a_join, a_co in zip(actions[0], actions[1]):
        for k in ("insert", "update", "delete", "delete_noop"):
            assert a_join.get(k, 0) == a_co.get(k, 0), (k, a_join, a_co)

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


def test_copartitioned_merge_retry_writes_identical_bytes(spark, tmp_path):
    """Task-retry safety (copart_merge.py:20-23): file names are
    deterministic per (epoch, bucket) and content is deterministic (sorted
    by doc_id), so a re-run of the same merge overwrites byte-identical
    files — the property that makes speculative execution and task retries
    safe before the manifest commit."""
    import hashlib
    import os

    from pyspark.sql import functions as F

    from georef_ar_etl_spark import datagen
    from georef_ar_etl_spark.engine import CdcEngine

    initial = datagen.gen_initial_state(200, seed=121, max_len=16)
    events = datagen.gen_events(
        [r["doc_id"] for r in initial], n_events=150, n_batches=1, seed=122, max_len=16
    )
    evdf = datagen.events_to_df(spark, events)

    def run(root):
        eng = CdcEngine(spark, root, n_buckets=4)
        eng.bootstrap(datagen.state_to_df(spark, initial))
        eng.apply_batch(evdf, 0)
        out = {}
        # epoch=1 only: the MERGE tasks' files (pyarrow, deterministic
        # name + content). Epoch 0 is Spark's native writer, whose part
        # names carry a task UUID — its retries are governed by Spark's
        # own output-commit protocol, not this property.
        droot = os.path.join(root, "data", "epoch=1")
        for dp, _dd, fns in os.walk(droot):
            for fn in fns:
                if fn.endswith(".parquet"):
                    rel = os.path.relpath(os.path.join(dp, fn), droot)
                    with open(os.path.join(dp, fn), "rb") as f:
                        out[rel] = hashlib.md5(f.read()).hexdigest()
        return out

    a = run(str(tmp_path / "a"))
    b = run(str(tmp_path / "b"))
    assert a == b and len(a) > 0

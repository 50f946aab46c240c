"""Incremental index maintenance from the changelog (the read_changes
consumer): the fingerprint index maintained epoch-by-epoch must equal a
batch recompute from the final state — including across multi-epoch
refresh ranges, a compaction, and a rescale of the SOURCE table."""

from pyspark.sql import functions as F

from georef_ar_etl_spark import datagen
from georef_ar_etl_spark.engine import CdcEngine
from georef_ar_etl_spark.operators.index_maintenance import (
    FingerprintIndex,
    fingerprint_of_tokens,
)


def _group_rows(df):
    return sorted((r["fp"], r["n_dups"], r["keep_id"]) for r in df.collect())


def _batch_recompute(state_df):
    return (
        state_df.select(fingerprint_of_tokens(F.col("tokens")).alias("fp"), "doc_id")
        .groupBy("fp")
        .agg(F.count(F.lit(1)).alias("n_dups"), F.min("doc_id").alias("keep_id"))
    )


def test_incremental_index_equals_batch_across_maintenance(spark, tmp_path):
    initial = datagen.gen_initial_state(300, seed=101, max_len=12)
    events = datagen.gen_events(
        [r["doc_id"] for r in initial], n_events=300, n_batches=6, seed=102, max_len=12
    )
    evdf = datagen.events_to_df(spark, events)
    eng = CdcEngine(spark, str(tmp_path / "src"), n_buckets=4, mor_max_deltas=2)
    eng.bootstrap(datagen.state_to_df(spark, initial))

    idx = FingerprintIndex(spark, str(tmp_path / "idx"), n_buckets=4)
    idx.bootstrap(eng.state(epoch=0), source_epoch=0)
    assert idx.last_source_epoch == 0
    # bootstrap index == batch recompute of epoch 0
    assert _group_rows(idx.groups()) == _group_rows(_batch_recompute(eng.state(epoch=0)))

    def refresh_to(head):
        idx.refresh(eng.changes(idx.last_source_epoch, head), head)
        assert idx.last_source_epoch == head

    # per-epoch refresh over delta AND rewrite epochs (mor_max_deltas=2
    # forces inline compactions into the mix)
    for b in range(3):
        m = eng.apply_batch(evdf.filter(F.col("batch_id") == b), b)
        refresh_to(m["epoch"])
        assert _group_rows(idx.groups()) == _group_rows(_batch_recompute(eng.state())), b

    # force a pending delta chain, then cross a compaction (emits no
    # changes; bookkeeping must still advance)
    mini = [{"batch_id": 3, "seq": 10_001, "op": "update",
             "doc_id": initial[0]["doc_id"], "tokens": [1, 2, 3],
             "n_tok": 3, "source": "wal"}]
    m3 = eng.apply_batch(datagen.events_to_df(spark, mini), 3)
    assert m3["metrics"]["merge_modes"]["delta"] == 1
    refresh_to(m3["epoch"])
    cm = eng.compact()
    assert cm is not None
    refresh_to(cm["epoch"])
    assert _group_rows(idx.groups()) == _group_rows(_batch_recompute(eng.state()))

    # cross a rescale of the source (new bucket numbering; emits no changes)
    rm = eng.rescale(8)
    refresh_to(rm["epoch"])

    # one multi-epoch refresh range: apply two batches, refresh once —
    # latest-change-per-doc collapse across epochs
    eng.apply_batch(evdf.filter(F.col("batch_id") == 3), 4)
    m5 = eng.apply_batch(evdf.filter(F.col("batch_id") == 4), 5)
    assert m5["epoch"] - idx.last_source_epoch == 2
    refresh_to(m5["epoch"])
    assert _group_rows(idx.groups()) == _group_rows(_batch_recompute(eng.state()))

    # final epoch, and the forward table mirrors the state's doc->fp map
    m6 = eng.apply_batch(evdf.filter(F.col("batch_id") == 5), 6)
    refresh_to(m6["epoch"])
    assert _group_rows(idx.groups()) == _group_rows(_batch_recompute(eng.state()))
    fwd = {
        r["doc_id"]: r["fp"]
        for r in idx.forward.read_state().select("doc_id", "fp").collect()
    }
    want = {
        r["doc_id"]: r["fp"]
        for r in eng.state()
        .select("doc_id", fingerprint_of_tokens(F.col("tokens")).alias("fp"))
        .collect()
    }
    assert fwd == want

    # refresh work was incremental: per-refresh commits touched only the
    # changed keys' buckets, not the whole index (spot-check the manifests)
    post_ms = idx.postings.manifests()
    assert any(
        m["metrics"]["kind"] == "refresh"
        and len(m["touched_buckets"]) < idx.postings.n_buckets
        for m in post_ms
    ) or idx.postings.n_buckets == 1


def test_centroid_assign_expr_matches_numpy_argmin(spark):
    """The pure-Catalyst nearest-centroid assignment must agree with numpy
    (same first-min tie-break) — including vectors shorter than the index
    dimension (missing components read as 0)."""
    import numpy as np

    from georef_ar_etl_spark.operators.index_maintenance import centroid_assign_expr

    C = np.array([[0.0, 0.0], [10.0, 10.0], [10.0, 10.0]])  # duplicate: tie
    rows = [([0, 1],), ([9, 11],), ([12],), ([],)]
    df = spark.createDataFrame(rows, "tokens array<int>")
    vec = [
        F.coalesce(F.get(F.col("tokens"), j).cast("double"), F.lit(0.0))
        for j in range(2)
    ]
    got = [r["c"] for r in df.select(centroid_assign_expr(vec, C).alias("c")).collect()]
    V = np.array([[0, 1], [9, 11], [12, 0], [0, 0]], dtype=float)
    want = [int(np.argmin(np.sqrt(((v - C) ** 2).sum(axis=1)))) for v in V]
    assert got == want  # ties -> FIRST minimum, like numpy argmin


def test_torn_refresh_detected_and_healed(spark, tmp_path):
    """A refresh that crashes between the postings commit and the forward
    commit leaves pending_refresh_epoch set; a WIDER follow-up range is
    refused (it would compute posting deletes from stale forward values and
    strand the torn refresh's posting rows as phantoms), while re-running
    exactly the pending range heals idempotently and the index converges to
    the batch recompute."""
    import pytest

    initial = datagen.gen_initial_state(120, seed=111, max_len=8)
    events = datagen.gen_events(
        [r["doc_id"] for r in initial], n_events=120, n_batches=3, seed=112, max_len=8
    )
    evdf = datagen.events_to_df(spark, events)
    eng = CdcEngine(spark, str(tmp_path / "src"), n_buckets=4)
    eng.bootstrap(datagen.state_to_df(spark, initial))
    idx = FingerprintIndex(spark, str(tmp_path / "idx"), n_buckets=4)
    idx.bootstrap(eng.state(epoch=0))

    m0 = eng.apply_batch(evdf.filter(F.col("batch_id") == 0), 0)
    idx.refresh(eng.changes(0, m0["epoch"]), m0["epoch"])
    assert idx.pending_refresh_epoch is None

    # crash the refresh between its two commits
    m1 = eng.apply_batch(evdf.filter(F.col("batch_id") == 1), 1)
    orig = idx._apply

    def torn(table, *a, **k):
        if table is idx.forward:
            raise RuntimeError("simulated crash after postings commit")
        return orig(table, *a, **k)

    idx._apply = torn
    with pytest.raises(RuntimeError, match="simulated crash"):
        idx.refresh(eng.changes(idx.last_source_epoch, m1["epoch"]), m1["epoch"])
    del idx._apply  # restore the class method
    assert idx.pending_refresh_epoch == m1["epoch"]
    assert idx.last_source_epoch == m0["epoch"]  # never claims the torn epoch

    # a wider range is refused with the heal instruction
    m2 = eng.apply_batch(evdf.filter(F.col("batch_id") == 2), 2)
    with pytest.raises(ValueError, match="torn refresh"):
        idx.refresh(eng.changes(idx.last_source_epoch, m2["epoch"]), m2["epoch"])

    # heal exactly the pending range (idempotent), then continue
    idx.refresh(eng.changes(idx.last_source_epoch, m1["epoch"]), m1["epoch"])
    assert idx.pending_refresh_epoch is None
    idx.refresh(eng.changes(idx.last_source_epoch, m2["epoch"]), m2["epoch"])
    assert _group_rows(idx.groups()) == _group_rows(_batch_recompute(eng.state()))


def test_stream_heal_of_torn_refresh(spark, tmp_path):
    """stream_apply's consumer loop performs the torn-refresh heal
    automatically before widening the range."""
    import pytest

    from georef_ar_etl_spark.streaming.apply import _refresh_consumers

    initial = datagen.gen_initial_state(100, seed=113, max_len=8)
    events = datagen.gen_events(
        [r["doc_id"] for r in initial], n_events=80, n_batches=2, seed=114, max_len=8
    )
    evdf = datagen.events_to_df(spark, events)
    eng = CdcEngine(spark, str(tmp_path / "src"), n_buckets=4)
    eng.bootstrap(datagen.state_to_df(spark, initial))
    idx = FingerprintIndex(spark, str(tmp_path / "idx"), n_buckets=4)
    idx.bootstrap(eng.state(epoch=0))

    m0 = eng.apply_batch(evdf.filter(F.col("batch_id") == 0), 0)
    orig = idx._apply

    def torn(table, *a, **k):
        if table is idx.forward:
            raise RuntimeError("boom")
        return orig(table, *a, **k)

    idx._apply = torn
    with pytest.raises(RuntimeError):
        idx.refresh(eng.changes(0, m0["epoch"]), m0["epoch"])
    del idx._apply
    eng.apply_batch(evdf.filter(F.col("batch_id") == 1), 1)

    _refresh_consumers(eng, [idx])  # heals pending, then catches up to head
    assert idx.pending_refresh_epoch is None
    assert idx.last_source_epoch == eng.table.latest_manifest()["epoch"]
    assert _group_rows(idx.groups()) == _group_rows(_batch_recompute(eng.state()))

    # un-bootstrapped consumers fail loudly instead of silently staying empty
    fresh = FingerprintIndex(spark, str(tmp_path / "idx2"), n_buckets=4)
    with pytest.raises(ValueError, match="not bootstrapped"):
        _refresh_consumers(eng, [fresh])


def _ca(spark, root, n_buckets=4):
    from pyspark.sql import types as T

    from georef_ar_etl_spark.operators.index_maintenance import ContinuousAggregate

    return ContinuousAggregate(
        spark, root,
        group_exprs=lambda: [
            F.col("source"),
            (F.floor(F.col("n_tok") / 4) * 4).cast("int"),
        ],
        group_fields=[("source", T.StringType()), ("tok_bucket", T.IntegerType())],
        value_expr=lambda: F.col("n_tok"),
        value_type=T.IntegerType(),
        n_buckets=n_buckets,
    )


def _agg_rows(df):
    return sorted(
        (r["source"], r["tok_bucket"], r["n"], r["sum_v"], r["min_v"], r["max_v"])
        for r in df.collect()
    )


def _agg_recompute(state_df):
    return (
        state_df.groupBy(
            "source", (F.floor(F.col("n_tok") / 4) * 4).cast("int").alias("tok_bucket")
        ).agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("n_tok").alias("sum_v"),
            F.min("n_tok").alias("min_v"),
            F.max("n_tok").alias("max_v"),
        )
    )


def test_continuous_aggregate_equals_batch_across_maintenance(spark, tmp_path):
    """The changelog-maintained rollup must equal a full re-aggregation of
    the live state after every epoch — including updates that MOVE a row
    between groups, deletes that remove a group's min/max member, a source
    compaction, a source rescale, and a multi-epoch refresh range."""
    initial = datagen.gen_initial_state(300, seed=201, max_len=12)
    events = datagen.gen_events(
        [r["doc_id"] for r in initial], n_events=300, n_batches=6, seed=202, max_len=12
    )
    evdf = datagen.events_to_df(spark, events)
    eng = CdcEngine(spark, str(tmp_path / "src"), n_buckets=4, mor_max_deltas=2)
    eng.bootstrap(datagen.state_to_df(spark, initial))

    agg = _ca(spark, str(tmp_path / "agg"))
    agg.bootstrap(eng.state(epoch=0), source_epoch=0)
    assert agg.last_source_epoch == 0
    assert _agg_rows(agg.aggregate()) == _agg_rows(_agg_recompute(eng.state(epoch=0)))

    def refresh_to(head):
        agg.refresh(eng.changes(agg.last_source_epoch, head), head)
        assert agg.last_source_epoch == head

    for b in range(3):
        m = eng.apply_batch(evdf.filter(F.col("batch_id") == b), b)
        refresh_to(m["epoch"])
        assert _agg_rows(agg.aggregate()) == _agg_rows(_agg_recompute(eng.state())), b

    # cross a compaction (emits no changes; bookkeeping must advance)
    cm = eng.compact()
    if cm is not None:
        refresh_to(cm["epoch"])
        assert _agg_rows(agg.aggregate()) == _agg_rows(_agg_recompute(eng.state()))

    # cross a rescale of the source (new bucket numbering; no changes)
    rm = eng.rescale(8)
    refresh_to(rm["epoch"])

    # one multi-epoch range: latest-change-per-doc collapse across epochs
    eng.apply_batch(evdf.filter(F.col("batch_id") == 3), 3)
    m2 = eng.apply_batch(evdf.filter(F.col("batch_id") == 4), 4)
    assert m2["epoch"] - agg.last_source_epoch == 2
    refresh_to(m2["epoch"])
    assert _agg_rows(agg.aggregate()) == _agg_rows(_agg_recompute(eng.state()))

    m3 = eng.apply_batch(evdf.filter(F.col("batch_id") == 5), 5)
    refresh_to(m3["epoch"])
    assert _agg_rows(agg.aggregate()) == _agg_rows(_agg_recompute(eng.state()))


def test_continuous_aggregate_group_removal_and_minmax(spark, tmp_path):
    """Surgical cases partial arithmetic cannot handle: deleting a group's
    ONLY member removes the rollup row; deleting the max member shrinks
    max_v to the runner-up (needs the member list, not subtraction)."""
    rows = [
        {"doc_id": "000000000000a", "tokens": [1], "n_tok": 1, "source": "s1"},
        {"doc_id": "000000000000b", "tokens": [1, 2], "n_tok": 2, "source": "s1"},
        {"doc_id": "000000000000c", "tokens": [1] * 9, "n_tok": 9, "source": "s2"},
    ]
    eng = CdcEngine(spark, str(tmp_path / "src"), n_buckets=2)
    eng.bootstrap(datagen.state_to_df(spark, rows))
    agg = _ca(spark, str(tmp_path / "agg"), n_buckets=8)
    agg.bootstrap(eng.state(epoch=0), source_epoch=0)

    ev = [
        # delete s2's only member -> (s2, 8) rollup row must vanish
        {"batch_id": 0, "seq": 1, "op": "delete", "doc_id": "000000000000c",
         "tokens": None, "n_tok": None, "source": None},
        # delete the max member of (s1, 0) -> max_v must drop 2 -> 1
        {"batch_id": 0, "seq": 2, "op": "delete", "doc_id": "000000000000b",
         "tokens": None, "n_tok": None, "source": None},
    ]
    m = eng.apply_batch(datagen.events_to_df(spark, ev), 0)
    agg.refresh(eng.changes(0, m["epoch"]), m["epoch"])
    got = _agg_rows(agg.aggregate())
    assert got == [("s1", 0, 1, 1, 1, 1)]

    # move a row between groups: update a's n_tok 1 -> 6 (bucket 0 -> 4)
    ev2 = [{"batch_id": 1, "seq": 3, "op": "update", "doc_id": "000000000000a",
            "tokens": [1, 2, 3, 4, 5, 6], "n_tok": 6, "source": "s1"}]
    m2 = eng.apply_batch(datagen.events_to_df(spark, ev2), 1)
    agg.refresh(eng.changes(agg.last_source_epoch, m2["epoch"]), m2["epoch"])
    assert _agg_rows(agg.aggregate()) == [("s1", 4, 1, 6, 6, 6)]

    # the refresh was INCREMENTAL: it touched only the two affected groups'
    # rollup buckets (old (s1,0) + new (s1,4)), never the whole table
    last = agg.rollup.latest_manifest()
    assert last["metrics"]["kind"] == "refresh"
    assert 0 < len(last["touched_buckets"]) <= 2 < agg.rollup.n_buckets


def test_continuous_aggregate_null_group_is_a_real_group(spark, tmp_path):
    """SQL GROUP BY keeps NULL as a real group, and so must the maintained
    aggregate: all key joins in the refresh path are null-safe. Before the
    eqNullSafe fix, a NULL-keyed member row never anti-joined out (stale
    row survived AND the replacement unioned in -> double counting) and
    the NULL group dropped out of the touched-group recompute."""
    from pyspark.sql import types as T

    from georef_ar_etl_spark.operators.index_maintenance import ContinuousAggregate

    rows = [
        {"doc_id": "000000000000a", "tokens": [1], "n_tok": 1, "source": "s1"},
        {"doc_id": "000000000000b", "tokens": [1, 2], "n_tok": 2, "source": "s1"},
        {"doc_id": "000000000000c", "tokens": [1] * 9, "n_tok": 9, "source": "s2"},
        {"doc_id": "000000000000d", "tokens": [1] * 5, "n_tok": 5, "source": "s2"},
    ]
    eng = CdcEngine(spark, str(tmp_path / "src"), n_buckets=2)
    eng.bootstrap(datagen.state_to_df(spark, rows))

    # group expr yields NULL for small docs — the nullable-group case the
    # review flagged (stand-in for an additively-evolved NULL column)
    agg = ContinuousAggregate(
        spark, str(tmp_path / "agg"),
        group_exprs=lambda: [F.when(F.col("n_tok") >= 4, F.col("source"))],
        group_fields=[("src_big", T.StringType())],
        value_expr=lambda: F.col("n_tok"),
        value_type=T.IntegerType(),
        n_buckets=8,
    )
    agg.bootstrap(eng.state(epoch=0), source_epoch=0)

    def rows_of(df):
        return sorted(
            (
                (r["src_big"], r["n"], r["sum_v"], r["min_v"], r["max_v"])
                for r in df.collect()
            ),
            key=lambda t: (t[0] is not None, t[0] or "", t[1:]),
        )

    def got():
        return rows_of(agg.aggregate())

    # bootstrap: NULL group {a:1, b:2}, s2 {c:9, d:5}
    assert got() == [(None, 2, 3, 1, 2), ("s2", 2, 14, 5, 9)]

    # delete a NULL-group member; move c INTO the NULL group (9 -> 2)
    ev0 = [
        {"batch_id": 0, "seq": 1, "op": "delete", "doc_id": "000000000000b",
         "tokens": None, "n_tok": None, "source": None},
        {"batch_id": 0, "seq": 2, "op": "update", "doc_id": "000000000000c",
         "tokens": [1, 2], "n_tok": 2, "source": "s2"},
    ]
    m0 = eng.apply_batch(datagen.events_to_df(spark, ev0), 0)
    agg.refresh(eng.changes(0, m0["epoch"]), m0["epoch"])
    assert got() == [(None, 2, 3, 1, 2), ("s2", 1, 5, 5, 5)]

    # empty the NULL group entirely; move d into it (5 -> 3) in the SAME
    # batch — the NULL rollup row must be REPLACED, not duplicated
    ev1 = [
        {"batch_id": 1, "seq": 3, "op": "delete", "doc_id": "000000000000a",
         "tokens": None, "n_tok": None, "source": None},
        {"batch_id": 1, "seq": 4, "op": "delete", "doc_id": "000000000000c",
         "tokens": None, "n_tok": None, "source": None},
        {"batch_id": 1, "seq": 5, "op": "update", "doc_id": "000000000000d",
         "tokens": [1, 2, 3], "n_tok": 3, "source": "s2"},
    ]
    m1 = eng.apply_batch(datagen.events_to_df(spark, ev1), 1)
    agg.refresh(eng.changes(m0["epoch"], m1["epoch"]), m1["epoch"])
    assert got() == [(None, 1, 3, 3, 3)]

    # and the full-recompute invariant (NULL group included) still holds
    recompute = rows_of(
        eng.state()
        .groupBy(F.when(F.col("n_tok") >= 4, F.col("source")).alias("src_big"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("n_tok").alias("sum_v"),
             F.min("n_tok").alias("min_v"), F.max("n_tok").alias("max_v"))
    )
    assert got() == recompute


def test_continuous_aggregate_torn_refresh(spark, tmp_path, monkeypatch):
    """A refresh crashing after the members/rollup commits but before
    forward leaves pending_refresh_epoch set; a wider range is refused;
    re-running exactly the pending range heals idempotently."""
    import pytest

    from georef_ar_etl_spark.operators import index_maintenance as im

    initial = datagen.gen_initial_state(120, seed=301, max_len=8)
    events = datagen.gen_events(
        [r["doc_id"] for r in initial], n_events=120, n_batches=3, seed=302, max_len=8
    )
    evdf = datagen.events_to_df(spark, events)
    eng = CdcEngine(spark, str(tmp_path / "src"), n_buckets=4)
    eng.bootstrap(datagen.state_to_df(spark, initial))
    agg = _ca(spark, str(tmp_path / "agg"))
    agg.bootstrap(eng.state(epoch=0))

    m0 = eng.apply_batch(evdf.filter(F.col("batch_id") == 0), 0)
    agg.refresh(eng.changes(0, m0["epoch"]), m0["epoch"])
    assert agg.pending_refresh_epoch is None

    m1 = eng.apply_batch(evdf.filter(F.col("batch_id") == 1), 1)
    orig = im._cow_apply

    def torn(table, *a, **k):
        if table is agg.forward:
            raise RuntimeError("simulated crash before forward commit")
        return orig(table, *a, **k)

    monkeypatch.setattr(im, "_cow_apply", torn)
    with pytest.raises(RuntimeError, match="simulated crash"):
        agg.refresh(eng.changes(agg.last_source_epoch, m1["epoch"]), m1["epoch"])
    monkeypatch.setattr(im, "_cow_apply", orig)
    assert agg.pending_refresh_epoch == m1["epoch"]
    assert agg.last_source_epoch == m0["epoch"]

    m2 = eng.apply_batch(evdf.filter(F.col("batch_id") == 2), 2)
    with pytest.raises(ValueError, match="torn refresh"):
        agg.refresh(eng.changes(agg.last_source_epoch, m2["epoch"]), m2["epoch"])

    agg.refresh(eng.changes(agg.last_source_epoch, m1["epoch"]), m1["epoch"])
    assert agg.pending_refresh_epoch is None
    agg.refresh(eng.changes(agg.last_source_epoch, m2["epoch"]), m2["epoch"])
    assert _agg_rows(agg.aggregate()) == _agg_rows(_agg_recompute(eng.state()))


def test_continuous_aggregate_chains_into_coarser_rollup(spark, tmp_path):
    """Composition claim from the class docstring: when the leading group
    column is a time bucket named bucket_s, the maintained aggregate IS
    the finest hypertable level — rollup_coarser over it must equal a
    direct coarse aggregation of the live rows, across refreshes that
    insert, move and delete. (Changelog rows are synthesized directly:
    ContinuousAggregate consumes any (op, change_epoch, doc_id, payload)
    frame, engine or not.)"""
    from pyspark.sql import types as T

    from georef_ar_etl_spark.operators.index_maintenance import ContinuousAggregate
    from georef_ar_etl_spark.operators.temporal import rollup, rollup_coarser, time_bucket_s

    def ts(s):
        return F.lit(s).cast("timestamp_ntz")

    state = spark.createDataFrame(
        [("d1", "2024-01-01 00:00:10", 100),
         ("d2", "2024-01-01 00:00:50", 250),
         ("d3", "2024-01-01 00:02:30", 400),
         ("d4", "2024-01-01 01:10:00", 70)],
        "doc_id string, ev_ts string, cents long",
    ).select("doc_id", F.col("ev_ts").cast("timestamp_ntz").alias("ev_ts"), "cents")

    agg = ContinuousAggregate(
        spark, str(tmp_path / "agg"),
        group_exprs=lambda: [time_bucket_s(F.col("ev_ts"), 60)],
        group_fields=[("bucket_s", T.LongType())],
        value_expr=lambda: F.col("cents"),
        value_type=T.LongType(),
        n_buckets=4,
    )
    agg.bootstrap(state, source_epoch=0)

    changes = spark.createDataFrame(
        [  # epoch 1: new row, a value update, a move to another minute
            (1, "upsert", "d5", "2024-01-01 00:01:05", 30),
            (1, "upsert", "d1", "2024-01-01 00:00:10", 110),
            (1, "upsert", "d3", "2024-01-01 00:59:00", 400),
            # epoch 2: delete one, move one across the HOUR boundary
            (2, "delete", "d2", None, None),
            (2, "upsert", "d4", "2024-01-01 02:00:00", 70),
        ],
        "change_epoch int, op string, doc_id string, ev_ts string, cents long",
    ).select(
        "change_epoch", "op", "doc_id",
        F.col("ev_ts").cast("timestamp_ntz").alias("ev_ts"), "cents",
    )
    agg.refresh(changes, source_epoch=2)

    live = spark.createDataFrame(
        [("d1", "2024-01-01 00:00:10", 110),
         ("d3", "2024-01-01 00:59:00", 400),
         ("d5", "2024-01-01 00:01:05", 30),
         ("d4", "2024-01-01 02:00:00", 70)],
        "doc_id string, ev_ts string, cents long",
    ).select("doc_id", F.col("ev_ts").cast("timestamp_ntz").alias("ev_ts"), "cents")

    # fine level: maintained == direct minute rollup of the live rows
    fine_want = sorted(
        tuple(r) for r in rollup(live, "ev_ts", [], "cents", 60).collect()
    )
    fine_got = sorted(tuple(r) for r in agg.aggregate().collect())
    assert fine_got == fine_want

    # coarse level: re-aggregated PARTIALS == direct hour rollup of raw
    coarse_want = sorted(
        tuple(r) for r in rollup(live, "ev_ts", [], "cents", 3600).collect()
    )
    coarse_got = sorted(
        tuple(r)
        for r in rollup_coarser(
            agg.aggregate(), [], 3600, fine_seconds=60
        ).collect()
    )
    assert coarse_got == coarse_want


def test_consumers_refresh_across_schema_evolution(spark, tmp_path):
    """A refresh range that CROSSES an additive schema evolution (src_meta
    appears mid-replay) must work for both consumer families: the changelog
    rows gain a column, latest-per-key collapse carries it, and derive/
    group expressions that don't reference it are unaffected — while the
    aggregate stays equal to a batch recompute."""
    initial = datagen.gen_initial_state(150, seed=401, max_len=10)
    events = datagen.gen_events(
        [r["doc_id"] for r in initial], n_events=300, n_batches=4, seed=402,
        max_len=10, evolve_from_batch=2,
    )
    eng = CdcEngine(spark, str(tmp_path / "src"), n_buckets=4)
    eng.bootstrap(datagen.state_to_df(spark, initial))
    idx = FingerprintIndex(spark, str(tmp_path / "idx"), n_buckets=4)
    idx.bootstrap(eng.state(epoch=0), source_epoch=0)
    agg = _ca(spark, str(tmp_path / "agg"))
    agg.bootstrap(eng.state(epoch=0), source_epoch=0)

    last_epoch = 0
    for b in range(4):
        batch = [e for e in events if e["batch_id"] == b]
        if b < 2:
            batch = [{k: v for k, v in e.items() if k != "src_meta"} for e in batch]
        m = eng.apply_batch(datagen.events_to_df(spark, batch), b)
        if b == 2:
            assert m["metrics"]["schema_added_columns"] == ["src_meta"]
        last_epoch = m["epoch"]

    # ONE refresh range spanning pre-evolution AND post-evolution epochs
    idx.refresh(eng.changes(0, last_epoch), last_epoch)
    agg.refresh(eng.changes(0, last_epoch), last_epoch)
    assert _group_rows(idx.groups()) == _group_rows(_batch_recompute(eng.state()))
    assert _agg_rows(agg.aggregate()) == _agg_rows(_agg_recompute(eng.state()))


# ------------------------------------------------------------- SCD2 index
def _scd2_payload():
    from pyspark.sql import types as T

    return [
        ("tokens", T.ArrayType(T.IntegerType(), True)),
        ("n_tok", T.IntegerType()),
        ("source", T.StringType()),
    ]


def _hist_rows(df):
    return sorted(
        (
            r["doc_id"],
            tuple(r["tokens"]) if r["tokens"] is not None else None,
            r["n_tok"],
            r["source"],
            r["valid_from"],
            r["valid_to"],
            r["is_current"],
        )
        for r in df.collect()
    )


def _scd2_batch_rebuild(eng):
    """Full-rebuild oracle: scd2_history over bootstrap-state-as-epoch-0
    plus the ENTIRE changelog — what the incremental index must equal."""
    from georef_ar_etl_spark.operators.scd import scd2_history

    payload = [n for n, _ in _scd2_payload()]
    boot = eng.state(epoch=0).select(
        "doc_id",
        F.lit(0).cast("long").alias("seq"),
        F.lit("u").alias("op"),
        *payload,
    )
    head = eng.table.latest_manifest()["epoch"]
    ch = eng.changes(0, head).select(
        "doc_id",
        F.col("change_epoch").cast("long").alias("seq"),
        F.when(F.col("op") == "upsert", F.lit("u")).otherwise(F.lit("d")).alias("op"),
        *payload,
    )
    return scd2_history(
        boot.unionByName(ch), "doc_id", "seq", "op", payload
    ).select("doc_id", *payload, "valid_from", "valid_to", "is_current")


def test_scd2_index_equals_batch_rebuild(spark, tmp_path):
    from georef_ar_etl_spark.operators.index_maintenance import Scd2Index

    initial = datagen.gen_initial_state(120, seed=201, max_len=10)
    events = datagen.gen_events(
        [r["doc_id"] for r in initial], n_events=200, n_batches=5, seed=202,
        max_len=10,
    )
    evdf = datagen.events_to_df(spark, events)
    eng = CdcEngine(spark, str(tmp_path / "src"), n_buckets=4, mor_max_deltas=2)
    eng.bootstrap(datagen.state_to_df(spark, initial))

    idx = Scd2Index(spark, str(tmp_path / "scd2"), _scd2_payload(), n_buckets=4)
    idx.bootstrap(eng.state(epoch=0), source_epoch=0)
    assert idx.last_source_epoch == 0

    # per-epoch refreshes for the first three batches (delta AND rewrite
    # epochs — mor_max_deltas=2 forces inline compactions into the mix)
    for b in range(3):
        m = eng.apply_batch(evdf.filter(F.col("batch_id") == b), b)
        idx.refresh(eng.changes(idx.last_source_epoch, m["epoch"]), m["epoch"])
        assert idx.last_source_epoch == m["epoch"]
        assert _hist_rows(idx.history()) == _hist_rows(_scd2_batch_rebuild(eng)), b

    # one MULTI-epoch range refresh covering the last two batches: per-doc
    # per-epoch versions must still come out one by one, not collapsed
    for b in (3, 4):
        m = eng.apply_batch(evdf.filter(F.col("batch_id") == b), b)
    idx.refresh(eng.changes(idx.last_source_epoch, m["epoch"]), m["epoch"])
    assert _hist_rows(idx.history()) == _hist_rows(_scd2_batch_rebuild(eng))

    # versions never overlap per doc (valid_to <= next valid_from; a gap
    # is legal — it is a deleted span), at most one current
    import collections

    by_doc = collections.defaultdict(list)
    for row in _hist_rows(idx.history()):
        by_doc[row[0]].append(row)
    for doc, rows in by_doc.items():
        rows.sort(key=lambda r: r[4])
        for a, b2 in zip(rows, rows[1:]):
            assert a[5] is not None and a[5] <= b2[4], (doc, a, b2)
        assert sum(1 for r in rows if r[6]) <= 1
        assert all(r[5] is not None for r in rows[:-1])


def test_scd2_index_delete_reinsert_and_collapse(spark, tmp_path):
    """Hand-built changelog: same-value re-emission collapses (no new
    version), delete closes + tombstones, re-insert opens fresh, repeated
    deletes collapse."""
    from pyspark.sql import types as T

    from georef_ar_etl_spark.operators.index_maintenance import Scd2Index

    payload = _scd2_payload()
    idx = Scd2Index(spark, str(tmp_path / "scd2"), payload, n_buckets=2)
    state = spark.createDataFrame(
        [("a", [1, 2], 2, "s"), ("b", [3], 1, "s")],
        "doc_id string, tokens array<int>, n_tok int, source string",
    )
    idx.bootstrap(state, source_epoch=0)

    ch_schema = (
        "change_epoch long, batch_id long, op string, doc_id string, "
        "tokens array<int>, n_tok int, source string"
    )

    def ch(rows):
        return spark.createDataFrame(rows, ch_schema)

    # epoch 1: a re-emitted SAME value (collapse), b updated
    idx.refresh(ch([(1, 1, "upsert", "a", [1, 2], 2, "s"),
                    (1, 1, "upsert", "b", [9], 1, "s")]), 1)
    # epoch 2: a deleted; epoch 3: a deleted AGAIN (collapse) + re-insert c
    idx.refresh(ch([(2, 2, "delete", "a", None, None, None)]), 2)
    idx.refresh(ch([(3, 3, "delete", "a", None, None, None),
                    (3, 3, "upsert", "c", [7], 1, "w")]), 3)
    # epoch 4: a re-inserted
    idx.refresh(ch([(4, 4, "upsert", "a", [5], 1, "s")]), 4)

    got = _hist_rows(idx.history())
    assert got == sorted([
        ("a", (1, 2), 2, "s", 0, 2, False),   # epoch-1 re-emit collapsed
        ("a", (5,), 1, "s", 4, None, True),   # re-insert after delete
        ("b", (3,), 1, "s", 0, 1, False),
        ("b", (9,), 1, "s", 1, None, True),
        ("c", (7,), 1, "w", 3, None, True),
    ])


def test_scd2_index_torn_refresh_idempotent(spark, tmp_path, monkeypatch):
    """Crash between the hist and cur commits: the guard demands the same
    range, and the re-run converges to the batch rebuild."""
    from georef_ar_etl_spark.operators import index_maintenance as im

    initial = datagen.gen_initial_state(40, seed=211, max_len=8)
    events = datagen.gen_events(
        [r["doc_id"] for r in initial], n_events=60, n_batches=2, seed=212,
        max_len=8,
    )
    evdf = datagen.events_to_df(spark, events)
    eng = CdcEngine(spark, str(tmp_path / "src"), n_buckets=2)
    eng.bootstrap(datagen.state_to_df(spark, initial))
    idx = im.Scd2Index(spark, str(tmp_path / "scd2"), _scd2_payload(), n_buckets=2)
    idx.bootstrap(eng.state(epoch=0), source_epoch=0)

    m0 = eng.apply_batch(evdf.filter(F.col("batch_id") == 0), 0)
    idx.refresh(eng.changes(0, m0["epoch"]), m0["epoch"])

    m1 = eng.apply_batch(evdf.filter(F.col("batch_id") == 1), 1)

    real = im._cow_apply
    calls = {"n": 0}

    def crash_on_second(*a, **kw):
        calls["n"] += 1
        if calls["n"] == 2:
            raise RuntimeError("injected crash before cur commit")
        return real(*a, **kw)

    monkeypatch.setattr(im, "_cow_apply", crash_on_second)
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="injected"):
        idx.refresh(eng.changes(idx.last_source_epoch, m1["epoch"]), m1["epoch"])
    monkeypatch.setattr(im, "_cow_apply", real)

    assert idx.pending_refresh_epoch == m1["epoch"]
    # a wider/other range is refused
    with _pytest.raises(ValueError, match="torn refresh"):
        idx.refresh(eng.changes(idx.last_source_epoch, m1["epoch"] ), m1["epoch"] + 7)
    # re-running the SAME range heals
    idx.refresh(eng.changes(idx.last_source_epoch, m1["epoch"]), m1["epoch"])
    assert idx.pending_refresh_epoch is None
    assert _hist_rows(idx.history()) == _hist_rows(_scd2_batch_rebuild(eng))


def test_token_gram_index_across_maintenance(spark, tmp_path):
    """TokenGramIndex (multi-valued postings) == batch recompute at every
    head, across delta epochs, a compaction, a source rescale, and a
    multi-epoch refresh range — the FingerprintIndex crossing test for
    the gram index."""
    from georef_ar_etl_spark.operators.index_maintenance import (
        TokenGramIndex,
        token_gram_hashes,
    )

    initial = datagen.gen_initial_state(200, seed=111, max_len=10)
    events = datagen.gen_events(
        [r["doc_id"] for r in initial], n_events=240, n_batches=4, seed=112,
        max_len=10,
    )
    evdf = datagen.events_to_df(spark, events)
    eng = CdcEngine(spark, str(tmp_path / "src"), n_buckets=4, mor_max_deltas=2)
    eng.bootstrap(datagen.state_to_df(spark, initial))

    idx = TokenGramIndex(spark, str(tmp_path / "idx"), k=2, n_buckets=4)
    idx.bootstrap(eng.state(epoch=0), source_epoch=0)

    def batch_occurrences(state):
        return sorted(
            tuple(r)
            for r in state.select(
                "doc_id", token_gram_hashes("tokens", 2).alias("gs")
            )
            .select("doc_id", F.posexplode("gs").alias("p", "g"))
            .select("g", "doc_id", (F.col("p") + 1).cast("int").alias("s"))
            .collect()
        )

    def check(tag):
        got = sorted(tuple(r) for r in idx.occurrences().collect())
        assert got == batch_occurrences(eng.state()), tag

    check("bootstrap")
    for b in range(2):
        m = eng.apply_batch(evdf.filter(F.col("batch_id") == b), b)
        idx.refresh(eng.changes(idx.last_source_epoch, m["epoch"]), m["epoch"])
        check(f"batch {b}")

    cm = eng.compact()
    if cm is not None:
        idx.refresh(eng.changes(idx.last_source_epoch, cm["epoch"]), cm["epoch"])
    rm = eng.rescale(8)
    idx.refresh(eng.changes(idx.last_source_epoch, rm["epoch"]), rm["epoch"])
    check("after compact+rescale")

    # multi-epoch range refresh (latest-change-per-doc collapse)
    eng.apply_batch(evdf.filter(F.col("batch_id") == 2), 2)
    m4 = eng.apply_batch(evdf.filter(F.col("batch_id") == 3), 3)
    assert m4["epoch"] - idx.last_source_epoch == 2
    idx.refresh(eng.changes(idx.last_source_epoch, m4["epoch"]), m4["epoch"])
    check("multi-epoch range")

    # incremental, not rebuild: a ONE-doc change touches exactly that
    # doc's forward bucket (a ~9-gram doc can legitimately hash into all
    # 4 posting buckets, so the forward table is the locality witness)
    mini = [{"batch_id": 4, "seq": 50_001, "op": "update",
             "doc_id": initial[0]["doc_id"], "tokens": [4, 5, 6],
             "n_tok": 3, "source": "wal"}]
    m5 = eng.apply_batch(datagen.events_to_df(spark, mini), 4)
    idx.refresh(eng.changes(idx.last_source_epoch, m5["epoch"]), m5["epoch"])
    check("single-doc mini batch")
    last_fwd = idx.forward.latest_manifest()
    assert last_fwd["metrics"]["kind"] == "refresh"
    assert len(last_fwd["touched_buckets"]) == 1

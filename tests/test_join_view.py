"""Incrementally-maintained join view (operators/view_maintenance.py):
V = fact LEFT JOIN dim, refreshed from both changelogs. Invariant under
test at EVERY head: the maintained view equals the full recompute
(fact.state ⋈ dim.state), across fact batches, dim updates/inserts/deletes,
interleavings, and re-running a refresh (idempotent rewrite)."""

from pyspark.sql import functions as F
from pyspark.sql import types as T

from georef_ar_etl_spark import datagen
from georef_ar_etl_spark.engine import CdcEngine
from georef_ar_etl_spark.operators.view_maintenance import JoinView
from georef_ar_etl_spark.schemas import STATE_SCHEMA
from georef_ar_etl_spark.sinks.snapshot_table import SnapshotTable, bucket_expr

DIM_SCHEMA = T.StructType(
    [
        T.StructField("source", T.StringType(), False),
        T.StructField("region", T.StringType(), True),
        T.StructField("weight", T.IntegerType(), True),
    ]
)


def _commit_dim(dim: SnapshotTable, rows: list[tuple], epoch: int) -> None:
    """Dim epochs as full COW rewrites — read_changes derives value diffs."""
    spark = dim.spark
    df = spark.createDataFrame(rows, DIM_SCHEMA).withColumn(
        "bucket", bucket_expr(F.col("source"), dim.n_buckets)
    )
    dim.commit(
        epoch=epoch,
        schema=DIM_SCHEMA,
        new_buckets_df=df,
        touched_buckets=list(range(dim.n_buckets)),
        # a real batch id: batch-less epochs are maintenance (compaction/
        # rollback) and the changelog rightly skips them
        batch_id=epoch,
        batch_digest=f"dim:{epoch}",
        metrics={"kind": "apply"},
    )


def _expected(fact_eng, dim):
    f = fact_eng.state()
    d = dim.read_state().drop("bucket")
    j = f.join(d, "source", "left").select(
        "doc_id", "tokens", "n_tok", "source", "region", "weight"
    )
    return sorted(
        (r["doc_id"], tuple(r["tokens"]), r["n_tok"], r["source"],
         r["region"], r["weight"])
        for r in j.collect()
    )


def _got(view):
    return sorted(
        (r["doc_id"], tuple(r["tokens"]), r["n_tok"], r["source"],
         r["region"], r["weight"])
        for r in view.view().collect()
    )


def test_join_view_tracks_both_changelogs(spark, tmp_path):
    initial = datagen.gen_initial_state(200, seed=61, max_len=8)
    events = datagen.gen_events(
        [r["doc_id"] for r in initial], n_events=40, n_batches=4, seed=62, max_len=8
    )
    fact = CdcEngine(spark, str(tmp_path / "fact"), n_buckets=4, mor_max_deltas=3)
    fact.bootstrap(datagen.state_to_df(spark, initial))

    dim = SnapshotTable(spark, str(tmp_path / "dim"), n_buckets=2)
    sources = sorted({r["source"] for r in initial})
    d0 = [(s, s.upper(), len(s)) for s in sources]
    _commit_dim(dim, d0, 0)

    view = JoinView(
        spark, str(tmp_path / "view"), STATE_SCHEMA, DIM_SCHEMA, "source",
        n_buckets=4,
    )
    view.bootstrap(fact.state(), dim.read_state().drop("bucket"), 0, 0)
    assert _got(view) == _expected(fact, dim)

    ev = datagen.events_to_df(spark, events)

    # step 1: fact-only batches
    fact.replay(ev.filter("batch_id < 2"), batch_ids=[0, 1])
    a0, b0 = view.last_source_epochs
    a1 = fact.table.latest_manifest()["epoch"]
    view.refresh(fact.table, dim, fact.changes(a0, a1), a1, None, b0)
    assert _got(view) == _expected(fact, dim)

    # step 2: dim-only changes — update one source's payload, add a new one
    d1 = [(s, s.upper() + "_V2" if s == sources[0] else s.upper(), len(s))
          for s in sources] + [("brand_new", "NEW", 9)]
    _commit_dim(dim, d1, 1)
    a0, b0 = view.last_source_epochs
    view.refresh(fact.table, dim, None, a0, dim.read_changes(b0, 1), 1)
    assert _got(view) == _expected(fact, dim)

    # step 3: both sides move together; dim DELETES a source (its fact rows
    # keep the view row with NULL dim columns — left-join contract)
    fact.replay(ev.filter("batch_id >= 2"), batch_ids=[2, 3])
    d2 = [r for r in d1 if r[0] != sources[1]]
    _commit_dim(dim, d2, 2)
    a0, b0 = view.last_source_epochs
    a1 = fact.table.latest_manifest()["epoch"]
    view.refresh(
        fact.table, dim, fact.changes(a0, a1), a1, dim.read_changes(b0, 2), 2
    )
    want = _expected(fact, dim)
    assert _got(view) == want
    # the deleted dim key really produced NULL rows (not dropped facts)
    assert any(r[3] == sources[1] and r[4] is None for r in want)

    # idempotency: re-running the SAME refresh rewrites the same content
    view.refresh(
        fact.table, dim, fact.changes(a0, a1), a1, dim.read_changes(b0, 2), 2
    )
    assert _got(view) == want

    # maintained epochs recorded
    assert view.last_source_epochs == (a1, 2)


def test_join_view_empty_refresh_advances_epochs(spark, tmp_path):
    initial = datagen.gen_initial_state(40, seed=63, max_len=8)
    fact = CdcEngine(spark, str(tmp_path / "f2"), n_buckets=2)
    fact.bootstrap(datagen.state_to_df(spark, initial))
    dim = SnapshotTable(spark, str(tmp_path / "d2"), n_buckets=2)
    _commit_dim(dim, [("wal", "WAL", 3)], 0)
    view = JoinView(
        spark, str(tmp_path / "v2"), STATE_SCHEMA, DIM_SCHEMA, "source",
        n_buckets=2,
    )
    view.bootstrap(fact.state(), dim.read_state().drop("bucket"), 0, 0)
    before = _got(view)
    view.refresh(fact.table, dim, None, 0, None, 0)
    assert _got(view) == before and view.last_source_epochs == (0, 0)


def test_join_view_rides_stream_apply_as_consumer(spark, tmp_path):
    """The JoinView stream adapter keeps the view fresh per trigger via
    stream_apply's consumer protocol; a dim change applied OUT-OF-BAND
    between triggers composes with the streamed fact side."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from georef_ar_etl_spark.streaming import stream_apply

    initial = datagen.gen_initial_state(120, seed=64, max_len=8)
    events = datagen.gen_events(
        [r["doc_id"] for r in initial], n_events=60, n_batches=4, seed=65, max_len=8
    )

    def write_segment(b):
        rows = [e for e in events if e["batch_id"] == b]
        cols = {k: [e[k] for e in rows]
                for k in ("batch_id", "seq", "op", "doc_id", "tokens", "n_tok", "source")}
        schema = pa.schema([
            ("batch_id", pa.int64()), ("seq", pa.int64()), ("op", pa.string()),
            ("doc_id", pa.string()), ("tokens", pa.list_(pa.int32())),
            ("n_tok", pa.int32()), ("source", pa.string()),
        ])
        pq.write_table(pa.Table.from_pydict(cols, schema=schema),
                       os.path.join(str(landing), f"batch-{b:05d}.parquet"))

    landing = tmp_path / "landing"
    landing.mkdir()
    fact = CdcEngine(spark, str(tmp_path / "f3"), n_buckets=4)
    fact.bootstrap(datagen.state_to_df(spark, initial))
    dim = SnapshotTable(spark, str(tmp_path / "d3"), n_buckets=2)
    sources = sorted({r["source"] for r in initial})
    _commit_dim(dim, [(s, s.upper(), len(s)) for s in sources], 0)
    view = JoinView(
        spark, str(tmp_path / "v3"), STATE_SCHEMA, DIM_SCHEMA, "source",
        n_buckets=4,
    )
    view.bootstrap(fact.state(), dim.read_state().drop("bucket"), 0, 0)
    consumer = view.as_stream_consumer(fact.table, dim)

    write_segment(0)
    write_segment(1)
    stream_apply(spark, fact, str(landing), str(tmp_path / "ck"),
                 consumers=[consumer])
    assert _got(view) == _expected(fact, dim)

    # dim moves between triggers — applied out-of-band through the view
    _commit_dim(dim, [(s, s.upper() + "_X", len(s)) for s in sources], 1)
    a, b0 = view.last_source_epochs
    view.refresh(fact.table, dim, None, a, dim.read_changes(b0, 1), 1)
    assert _got(view) == _expected(fact, dim)

    # more fact segments stream on top of the new dim epoch
    write_segment(2)
    write_segment(3)
    stream_apply(spark, fact, str(landing), str(tmp_path / "ck"),
                 consumers=[consumer])
    assert _got(view) == _expected(fact, dim)
    assert view.last_source_epochs[1] == 1

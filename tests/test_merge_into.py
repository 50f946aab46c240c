"""Conditional MERGE (SnapshotTable.merge_into / CdcEngine.merge_into):
``MERGE INTO target USING source ON key`` with ordered WHEN MATCHED
UPDATE/DELETE, WHEN NOT MATCHED INSERT and WHEN NOT MATCHED BY SOURCE
clauses, landing as one MOR delta link per touched bucket.

Covers: clause-order precedence, keep/ignore when no clause fires,
insert defaults (source columns / NULL), n_tok re-derivation, duplicate
source keys refused, exactly-once redelivery + conflict, NOT MATCHED BY
SOURCE full-scan deletes, changelog consumption, bucket-count accounting,
and compaction survival.
"""

import pytest
from pyspark.sql import functions as F, types as T

from georef_ar_etl_spark import datagen
from georef_ar_etl_spark.engine import CdcEngine
from georef_ar_etl_spark.sinks.snapshot_table import ConflictError

SRC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("tokens", T.ArrayType(T.IntegerType())),
        T.StructField("source", T.StringType()),
    ]
)


def _rows(df) -> dict:
    return {
        r["doc_id"]: (tuple(r["tokens"]), r["n_tok"], r["source"])
        for r in df.select("doc_id", "tokens", "n_tok", "source").collect()
    }


@pytest.fixture()
def table(spark, tmp_path):
    initial = datagen.gen_initial_state(200, seed=91, max_len=12)
    eng = CdcEngine(spark, str(tmp_path / "mrg"), n_buckets=4, mor_max_deltas=4)
    eng.bootstrap(datagen.state_to_df(spark, initial))
    evs = datagen.gen_events(
        [d["doc_id"] for d in initial], n_events=60, n_batches=1, seed=7
    )
    eng.apply_batch(datagen.events_to_df(spark, evs), batch_id=0)
    return eng


def _source(spark, keys, n_new=6):
    rows = []
    for i, k in enumerate(keys):
        toks = [] if i % 5 == 0 else [100 + i, 200 + i, 300 + i][: (i % 3) + 1]
        rows.append((k, toks, "m"))
    for i in range(n_new):
        rows.append((f"NEW{i:010d}", [1, 2, 3, 4][: (i % 4) + 1], "new"))
    return spark.createDataFrame(rows, SRC_SCHEMA), rows


MATCHED = [
    ("size(s_tokens) = 0", "delete", None),
    ("t_source = 'wal'", "update", {"tokens": "s_tokens", "source": "'merged'"}),
    (None, "update", {"tokens": "concat(t_tokens, s_tokens)"}),
]
NOT_MATCHED = [("size(s_tokens) >= 3", {"source": "'inserted'"})]


def _expected(before, rows):
    exp = dict(before)
    for k, toks, _tag in rows:
        toks = tuple(toks)
        if k in before:
            t_tok, _nt, t_src = before[k]
            if len(toks) == 0:
                del exp[k]  # first clause wins
            elif t_src == "wal":
                exp[k] = (toks, len(toks), "merged")
            else:
                exp[k] = (t_tok + toks, len(t_tok + toks), t_src)
        elif len(toks) >= 3:
            exp[k] = (toks, len(toks), "inserted")
    return exp


def test_merge_clause_precedence_and_counts(spark, table):
    before = _rows(table.state())
    src, rows = _source(spark, sorted(before)[:40])
    rep = table.merge_into(
        src, batch_id=2, when_matched=MATCHED, when_not_matched=NOT_MATCHED
    )
    exp = _expected(before, rows)
    got = _rows(table.state())
    assert got == exp
    # row accounting: manifest counts must reflect insert/delete deltas
    mets = rep["metrics"]
    assert mets["inserted"] == len(exp) - len(before) + mets["deleted"]
    assert mets["full_scan"] is False
    assert sum(
        int(v)
        for v in table.table.latest_manifest()["bucket_counts"].values()
    ) == len(exp)


def test_merge_exactly_once_and_conflict(spark, table):
    before = _rows(table.state())
    src, rows = _source(spark, sorted(before)[:40])
    rep = table.merge_into(
        src, batch_id=2, when_matched=MATCHED, when_not_matched=NOT_MATCHED
    )
    after = _rows(table.state())
    rep2 = table.merge_into(
        src, batch_id=2, when_matched=MATCHED, when_not_matched=NOT_MATCHED
    )
    assert rep2["epoch"] == rep["epoch"]
    assert _rows(table.state()) == after
    # same id, different clause program → conflict
    with pytest.raises(ConflictError):
        table.merge_into(
            src, batch_id=2, when_matched=[(None, "delete", None)]
        )
    # same id, different source rows → conflict
    with pytest.raises(ConflictError):
        table.merge_into(
            src.limit(3), batch_id=2,
            when_matched=MATCHED, when_not_matched=NOT_MATCHED,
        )


def test_merge_duplicate_source_keys_refused(spark, table):
    src, _ = _source(spark, sorted(_rows(table.state()))[:5])
    dup = src.unionByName(src.limit(1))
    with pytest.raises(ValueError, match="duplicate source keys"):
        table.merge_into(
            dup, batch_id=2, when_matched=[(None, "update", {"source": "'x'"})]
        )


def test_merge_not_matched_by_source_delete(spark, table):
    """Stale-row sweep: target rows absent from the source and matching the
    clause condition are deleted; everything in the source is kept."""
    before = _rows(table.state())
    wal_absent = sorted(k for k, v in before.items() if v[2] == "wal")
    keep = sorted(set(before) - set(wal_absent))[:10]
    src = spark.createDataFrame(
        [(k, list(before[k][0]), before[k][2]) for k in keep], SRC_SCHEMA
    )
    rep = table.merge_into(
        src,
        batch_id=2,
        when_matched=[(None, "update", {"source": "t_source"})],
        when_not_matched_by_source=[("t_source = 'wal'", "delete", None)],
    )
    assert rep["metrics"]["full_scan"] is True
    assert rep["metrics"]["deleted"] == len(wal_absent)
    got = _rows(table.state())
    assert set(got) == set(before) - set(wal_absent)
    for k in got:
        assert got[k] == before[k]


def test_merge_insert_defaults_and_keep_rows(spark, table):
    """An insert clause with no value map takes the source row's columns;
    matched rows with no firing clause stay byte-identical; writing NULL
    into a non-nullable contract column is refused loudly."""
    before = _rows(table.state())
    src = spark.createDataFrame(
        [("NEWDOC0000001", [5, 6], "new")], SRC_SCHEMA
    )
    rep = table.merge_into(
        src,
        batch_id=2,
        when_matched=[("false", "delete", None)],  # never fires
        when_not_matched=[(None, None)],
    )
    assert rep["metrics"]["deleted"] == 0 and rep["metrics"]["inserted"] == 1
    got = _rows(table.state())
    assert got["NEWDOC0000001"] == ((5, 6), 2, "new")
    for k, v in before.items():
        assert got[k] == v

    # a source missing the non-nullable 'source' column would insert NULL —
    # the write task refuses with the contract error, state unchanged
    bare = spark.createDataFrame(
        [("NEWDOC0000002", [5, 6])],
        T.StructType(
            [
                T.StructField("doc_id", T.StringType()),
                T.StructField("tokens", T.ArrayType(T.IntegerType())),
            ]
        ),
    )
    with pytest.raises(Exception, match="non-nullable"):
        table.merge_into(
            bare, batch_id=3, when_not_matched=[(None, None)]
        )
    assert _rows(table.state()) == got


def test_merge_changelog_consumer(spark, table):
    from georef_ar_etl_spark.operators.index_maintenance import (
        ContinuousAggregate,
    )

    head = table.table.latest_manifest()["epoch"]
    agg = ContinuousAggregate(
        spark, table.table.root + "_agg",
        group_exprs=lambda: [F.col("source")],
        group_fields=[("source", T.StringType())],
        value_expr=lambda: F.col("n_tok"),
        value_type=T.IntegerType(),
        n_buckets=2,
    )
    agg.bootstrap(table.state(epoch=head), source_epoch=head)
    src, _rows_ = _source(spark, sorted(_rows(table.state()))[:40])
    rep = table.merge_into(
        src, batch_id=2, when_matched=MATCHED, when_not_matched=NOT_MATCHED
    )
    agg.refresh(table.changes(head, rep["epoch"]), rep["epoch"])
    want = sorted(
        (r["source"], r["n"], r["sum_v"])
        for r in table.state()
        .fillna({"source": "__null__"})
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("n_tok").alias("sum_v"))
        .collect()
    )
    got = sorted(
        (r["source"] if r["source"] is not None else "__null__", r["n"], r["sum_v"])
        for r in agg.aggregate().select("source", "n", "sum_v").collect()
    )
    assert got == want


def test_merge_survives_compaction(spark, table):
    src, _ = _source(spark, sorted(_rows(table.state()))[:40])
    table.merge_into(
        src, batch_id=2, when_matched=MATCHED, when_not_matched=NOT_MATCHED
    )
    want = _rows(table.state())
    table.compact(min_deltas=1)
    assert _rows(table.state()) == want
    table.vacuum(keep_last=1)
    assert _rows(table.state()) == want

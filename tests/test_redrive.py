"""Dead-letter re-drive (engine.quarantined / redrive_quarantined): fix the
cause, replay the quarantine side-outputs as a new batch, and never let a
stale dead letter overwrite a newer committed write (supersession guard)."""

from pyspark.sql import functions as F

from georef_ar_etl_spark import datagen
from georef_ar_etl_spark.engine import CdcEngine


def _mk_engine(spark, tmp_path, dim_groups):
    dim = spark.createDataFrame(
        [{"group_id": g, "group_name": f"group-{g}"} for g in dim_groups]
    )
    return CdcEngine(spark, str(tmp_path / "t"), n_buckets=4, dim=dim)


def _ev(batch_id, seq, op, doc_id, tokens, source="wal"):
    return {
        "batch_id": batch_id, "seq": seq, "op": op, "doc_id": doc_id,
        "tokens": tokens, "n_tok": len(tokens) if tokens else None,
        "source": source,
    }


INIT = [
    {"doc_id": "0100000000001", "tokens": [1, 2], "n_tok": 2, "source": "wal"},
    {"doc_id": "0200000000001", "tokens": [3], "n_tok": 1, "source": "wal"},
]


def test_redrive_after_dim_fix(spark, tmp_path):
    eng = _mk_engine(spark, tmp_path, ["01", "02"])
    eng.bootstrap(datagen.state_to_df(spark, INIT))

    # batch 0: one valid update + one insert into UNKNOWN group 25
    b0 = [
        _ev(0, 1, "update", "0100000000001", [9, 9]),
        _ev(0, 2, "insert", "2500000000001", [7, 7, 7]),
    ]
    m0 = eng.apply_batch(datagen.events_to_df(spark, b0), 0)
    assert m0["metrics"]["quarantined"] == {"unknown_group": 1}
    q = eng.quarantined()
    assert q.count() == 1 and q.collect()[0]["q_epoch"] == m0["epoch"]

    # late-arriving dimension row fixes group 25 → re-drive
    eng.dim = spark.createDataFrame(
        [{"group_id": g, "group_name": f"group-{g}"} for g in ["01", "02", "25"]]
    )
    m = eng.redrive_quarantined(batch_id=100)
    assert m["metrics"]["redrive"] == {
        "selected": 1, "superseded": 0, "redriven": 1,
    }
    got = {r["doc_id"]: r["tokens"] for r in eng.state().collect()}
    assert got["2500000000001"] == [7, 7, 7]


def test_redrive_supersession_guard(spark, tmp_path):
    eng = _mk_engine(spark, tmp_path, ["01", "02"])
    eng.bootstrap(datagen.state_to_df(spark, INIT))

    # batch 0 quarantines an insert for doc X (unknown group 25)
    x = "2500000000001"
    eng.apply_batch(
        datagen.events_to_df(spark, [_ev(0, 1, "insert", x, [1, 1])]), 0
    )
    # fix the dim, then batch 1 VALIDLY inserts a newer payload for X
    eng.dim = spark.createDataFrame(
        [{"group_id": g, "group_name": f"group-{g}"} for g in ["01", "02", "25"]]
    )
    eng.apply_batch(
        datagen.events_to_df(spark, [_ev(1, 1, "insert", x, [2, 2, 2])]), 1
    )
    # re-drive must DROP the stale dead letter — X changed after q_epoch
    m = eng.redrive_quarantined(batch_id=100)
    assert m["metrics"]["redrive"]["superseded"] == 1
    assert m["metrics"]["redrive"]["redriven"] == 0
    got = {r["doc_id"]: r["tokens"] for r in eng.state().collect()}
    assert got[x] == [2, 2, 2]


def test_redrive_still_invalid_requarantines(spark, tmp_path):
    eng = _mk_engine(spark, tmp_path, ["01", "02"])
    eng.bootstrap(datagen.state_to_df(spark, INIT))
    b0 = [
        _ev(0, 1, "insert", "2500000000001", [5]),     # unknown group
        _ev(0, 2, "update", "0100000000001", []),      # empty tokens
    ]
    eng.apply_batch(datagen.events_to_df(spark, b0), 0)

    # only the dim cause is repaired; restrict the re-drive to that reason
    eng.dim = spark.createDataFrame(
        [{"group_id": g, "group_name": f"group-{g}"} for g in ["01", "02", "25"]]
    )
    m = eng.redrive_quarantined(batch_id=100, reasons=["unknown_group"])
    assert m["metrics"]["redrive"]["redriven"] == 1
    assert m["metrics"]["quarantined"] == {}  # the re-driven event is valid now
    # the empty-tokens dead letter is still there for a later re-drive,
    # and re-driving it re-quarantines (still invalid)
    m2 = eng.redrive_quarantined(batch_id=101, reasons=["empty_tokens"])
    assert m2["metrics"]["redrive"]["redriven"] == 1
    assert m2["metrics"]["quarantined"] == {"empty_tokens": 1}


def test_redrive_idempotent_redelivery(spark, tmp_path):
    eng = _mk_engine(spark, tmp_path, ["01", "02"])
    eng.bootstrap(datagen.state_to_df(spark, INIT))
    eng.apply_batch(
        datagen.events_to_df(
            spark, [_ev(0, 1, "insert", "2500000000001", [5])]
        ),
        0,
    )
    eng.dim = spark.createDataFrame(
        [{"group_id": g, "group_name": f"group-{g}"} for g in ["01", "02", "25"]]
    )
    m1 = eng.redrive_quarantined(batch_id=100)
    head = eng.table.latest_manifest()["epoch"]
    m2 = eng.redrive_quarantined(batch_id=100)  # same batch id re-delivered
    assert m2["epoch"] == m1["epoch"]  # committed-batch short circuit
    assert eng.table.latest_manifest()["epoch"] == head


def test_quarantined_empty_range_schema(spark, tmp_path):
    eng = _mk_engine(spark, tmp_path, ["01", "02"])
    eng.bootstrap(datagen.state_to_df(spark, INIT))
    q = eng.quarantined()
    assert q.count() == 0
    assert {"doc_id", "reason", "q_epoch"} <= set(q.columns)

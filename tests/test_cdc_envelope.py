"""Debezium-envelope decoder: WAL-tail JSON → canonical events feeding the
engine unchanged (reference analogue: every source normalized into one
staging shape before transformation, georef_ar_etl/processes.py)."""

import json

from pyspark.sql import types as T

from georef_ar_etl_spark import datagen
from georef_ar_etl_spark.engine import CdcEngine
from georef_ar_etl_spark.sources.cdc_envelope import parse_debezium

_OP_WIRE = {"insert": "c", "update": "u", "delete": "d"}


def _envelope(ev, extra=None):
    img = {
        k: ev[k]
        for k in ("doc_id", "tokens", "n_tok", "source")
        if ev.get(k) is not None
    }
    if extra:
        img.update(extra)
    # datagen injects invalid ops (e.g. 'upsert') for the quarantine path:
    # encode them as an unknown wire code so the DECODER quarantines them —
    # state-identical to the native engine quarantining the same row
    wire = _OP_WIRE.get(ev["op"], "z")
    return json.dumps(
        {
            "op": wire,
            "before": img if wire == "d" else None,
            "after": None if wire == "d" else img,
            "source": {
                "lsn": ev["seq"],
                "ts_ms": 1700000000000 + ev["seq"],
                "table": "docs",
            },
        }
    )


def _raw_df(spark, strings):
    return spark.createDataFrame(
        [(s,) for s in strings], T.StructType([T.StructField("value", T.StringType())])
    )


def _rows(df):
    return sorted(
        (r["doc_id"], tuple(r["tokens"]), r["n_tok"], r["source"])
        for r in df.select("doc_id", "tokens", "n_tok", "source").collect()
    )


def test_envelope_replay_equals_native_events(spark, tmp_path):
    """Decoding the wire envelopes and applying them batch-by-batch lands
    the byte-identical final state as applying the native event frames —
    the decoder is a pure boundary, invisible to the engine."""
    initial = datagen.gen_initial_state(120, seed=51, max_len=12)
    events = datagen.gen_events(
        [r["doc_id"] for r in initial], n_events=240, n_batches=3, seed=52,
        max_len=12,
    )
    native = CdcEngine(spark, str(tmp_path / "native"), n_buckets=4)
    native.bootstrap(datagen.state_to_df(spark, initial))
    wire = CdcEngine(spark, str(tmp_path / "wire"), n_buckets=4)
    wire.bootstrap(datagen.state_to_df(spark, initial))

    for b in range(3):
        evs = [e for e in events if e["batch_id"] == b]
        native.apply_batch(datagen.events_to_df(spark, evs), batch_id=b)
        parsed, bad = parse_debezium(
            _raw_df(spark, [_envelope(e) for e in evs]), batch_id=b
        )
        # datagen's injected invalid ops quarantine at DECODE on the wire
        # path (unknown wire code) where the native path quarantines them
        # in-engine — either way they never touch state
        n_bad_op = sum(1 for e in evs if e["op"] not in _OP_WIRE)
        assert bad.count() == n_bad_op
        assert {r["reason"] for r in bad.collect()} <= {"unknown_op"}
        # wire envelopes carry no batch_id; the decoder stamps the caller's
        # and seq comes from the lsn — same replay order as the native frame
        wire.apply_batch(parsed, batch_id=b)

    assert _rows(native.state()) == _rows(wire.state())


def test_envelope_quarantines_are_reasoned_not_dropped(spark):
    good = _envelope(
        {"op": "insert", "seq": 7, "doc_id": "0200000000001",
         "tokens": [1, 2], "n_tok": 2, "source": "wal"}
    )
    cases = [
        ("{not json", "bad_json"),
        (None, "tombstone"),
        (json.dumps({"op": "x", "after": {"doc_id": "d"},
                     "source": {"lsn": 1}}), "unknown_op"),
        (json.dumps({"op": "c", "after": {"doc_id": "d"},
                     "source": {"ts_ms": 5}}), "no_lsn"),
        (json.dumps({"op": "c", "after": None,
                     "source": {"lsn": 2}}), "no_image"),
        (json.dumps({"op": "d", "before": None,
                     "source": {"lsn": 3}}), "no_image"),
    ]
    ev, bad = parse_debezium(
        _raw_df(spark, [good] + [c for c, _ in cases]), batch_id=0
    )
    assert ev.count() == 1
    got = {r["raw"]: r["reason"] for r in bad.collect()}
    assert len(got) == len(cases)
    for raw, reason in cases:
        assert got[raw] == reason
    # snapshot reads (op=r) are inserts; n_tok recomputed when absent
    r_ev, _ = parse_debezium(
        _raw_df(
            spark,
            [json.dumps({"op": "r",
                         "after": {"doc_id": "d1", "tokens": [5, 6, 7],
                                   "source": "snap"},
                         "source": {"lsn": 9}})],
        ),
        batch_id=1,
    )
    row = r_ev.first()
    assert (row["op"], row["seq"], row["n_tok"]) == ("insert", 9, 3)


def test_envelope_extra_cols_and_payload_wrapper(spark):
    env = json.dumps(
        {
            "op": "c",
            "after": {"doc_id": "0200000000001", "tokens": [1],
                      "source": "wal", "src_meta": "m1"},
            "source": {"lsn": 4},
        }
    )
    wrapped = json.dumps({"schema": {"type": "struct"}, "payload": json.loads(env)})
    ev, bad = parse_debezium(
        _raw_df(spark, [wrapped]),
        batch_id=0,
        extra_cols={"src_meta": T.StringType()},
        payload_wrapper=True,
    )
    assert bad.count() == 0
    row = ev.first()
    assert row["src_meta"] == "m1" and row["n_tok"] == 1
    assert "src_meta" in ev.columns


def _state_rows(eng):
    return _rows(eng.state())


def test_replication_round_trip_via_wire(spark, tmp_path):
    """to_debezium(changes) -> parse_debezium -> second engine: a replica
    subscribed over the wire format lands the byte-identical state,
    epoch by epoch AND when folding the whole range into one batch (the
    synthesized lsn is per-key monotone across epochs)."""
    from georef_ar_etl_spark.sources.cdc_envelope import to_debezium

    initial = datagen.gen_initial_state(100, seed=61, max_len=10)
    events = datagen.gen_events(
        [r["doc_id"] for r in initial], n_events=200, n_batches=4, seed=62,
        max_len=10,
    )
    src = CdcEngine(spark, str(tmp_path / "src"), n_buckets=4)
    boot = src.bootstrap(datagen.state_to_df(spark, initial))
    boot_epoch = boot["epoch"]
    for b in range(4):
        src.apply_batch(
            datagen.events_to_df(
                spark, [e for e in events if e["batch_id"] == b]
            ),
            batch_id=b,
        )
    head = src.table.latest_manifest()["epoch"]

    # epoch-by-epoch replica
    replica = CdcEngine(spark, str(tmp_path / "replica"), n_buckets=2)
    replica.bootstrap(src.state(epoch=boot_epoch))
    for e in range(boot_epoch + 1, head + 1):
        wire = to_debezium(src.changes(e - 1, e))
        parsed, bad = parse_debezium(wire.select("value"), batch_id=e)
        assert bad.count() == 0
        replica.apply_batch(parsed, batch_id=e)
    assert _state_rows(replica) == _state_rows(src)

    # whole-range fold into ONE replay batch
    folded = CdcEngine(spark, str(tmp_path / "folded"), n_buckets=2)
    folded.bootstrap(src.state(epoch=boot_epoch))
    wire_all = to_debezium(src.changes(boot_epoch, head))
    parsed_all, bad_all = parse_debezium(wire_all.select("value"), batch_id=0)
    assert bad_all.count() == 0
    folded.apply_batch(parsed_all, batch_id=0)
    assert _state_rows(folded) == _state_rows(src)


def test_to_debezium_delete_is_key_only_before_image(spark, tmp_path):
    from georef_ar_etl_spark.sources.cdc_envelope import to_debezium

    initial = datagen.gen_initial_state(20, seed=71, max_len=6)
    src = CdcEngine(spark, str(tmp_path / "s2"), n_buckets=2)
    src.bootstrap(datagen.state_to_df(spark, initial))
    victim = initial[0]["doc_id"]
    ev = [{"batch_id": 0, "seq": 1, "op": "delete", "doc_id": victim,
           "tokens": None, "n_tok": None, "source": "wal"}]
    src.apply_batch(datagen.events_to_df(spark, ev), batch_id=0)
    head = src.table.latest_manifest()["epoch"]
    rows = to_debezium(src.changes(head - 1, head)).collect()
    assert len(rows) == 1
    env = json.loads(rows[0]["value"])
    assert env["op"] == "d"
    assert env["before"] == {"doc_id": victim}
    assert "after" not in env  # ignoreNullFields drops the null image
    assert env["source"]["lsn"] == env["source"]["ts_ms"]
    key = json.loads(rows[0]["key"])
    assert key == {"doc_id": victim}


def test_partial_image_updates_as_patch(spark, tmp_path):
    """Producers without full after-images (REPLICA IDENTITY minimal /
    Mongo update descriptions): op 'u' maps to the engine's 'patch' —
    omitted payload columns keep their current value instead of nulling
    the row out (which full-image validation would quarantine)."""
    eng = CdcEngine(spark, str(tmp_path / "t"), n_buckets=4)
    eng.bootstrap(
        datagen.state_to_df(
            spark,
            [
                {"doc_id": "0000000000001", "tokens": [1, 2, 3], "n_tok": 3, "source": "a"},
                {"doc_id": "0000000000002", "tokens": [9, 9], "n_tok": 2, "source": "a"},
            ],
        )
    )
    env = json.dumps(
        {
            "op": "u",
            "before": None,
            "after": {"doc_id": "0000000000001", "source": "b"},  # tokens OMITTED
            "source": {"lsn": 10, "ts_ms": 1, "table": "docs"},
        }
    )
    events, malformed = parse_debezium(
        _raw_df(spark, [env]), batch_id=0, updates_as_patch=True
    )
    assert malformed.count() == 0
    (row,) = events.collect()
    assert row["op"] == "patch" and row["tokens"] is None
    eng.apply_batch(events, 0)
    got = _rows(eng.state())
    # d1 keeps its tokens, source updated; d2 untouched
    assert got == [
        ("0000000000001", (1, 2, 3), 3, "b"),
        ("0000000000002", (9, 9), 2, "a"),
    ]

    # the SAME envelope without the flag is a full update missing tokens:
    # quarantined by engine validation, never silently nulling the row
    ev2, _ = parse_debezium(_raw_df(spark, [env]), batch_id=1)
    (r2,) = ev2.collect()
    assert r2["op"] == "update"
    m = eng.apply_batch(ev2, 1)
    assert _rows(eng.state()) == got  # state unchanged

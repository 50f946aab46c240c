"""Debezium-style change-envelope decoder: WAL-tail JSON → canonical events.

The de-facto wire format for binlog/WAL tails (Debezium, and the shape
Maxwell/DMS emit modulo field names) is a JSON envelope per change:

    {"op": "c"|"u"|"d"|"r", "before": {...}|null, "after": {...}|null,
     "source": {"lsn": 42, "ts_ms": ..., "table": ...}, "ts_ms": ...}

This module decodes a DataFrame of raw envelope strings (a Kafka value
column, a landed NDJSON file — transport-agnostic) into the engine's
canonical ``EVENT_SCHEMA`` so the rest of the pipeline (quarantine,
merge, changelog, consumers) never knows what wire format fed it.
Reference analogue: the reference normalizes every source into one
staging shape before transformation (georef_ar_etl/processes.py); this
is that boundary for a WAL tail.

Mapping contract:

* op ``c`` (create) and ``r`` (snapshot read) → ``insert``; ``u`` →
  ``update``; ``d`` → ``delete``. Anything else is quarantined, not
  dropped — the reference's fail-loudly rule, per row.
* payload comes from ``after`` (``before`` for deletes — Debezium
  deletes carry no after-image); a delete missing ``before`` or any row
  whose image lacks ``doc_id`` is quarantined.
* ``seq`` = ``source.lsn`` — the log sequence number IS the total order
  the engine replays by, so at-least-once redelivery dedupes to the
  same state; a null/missing lsn is quarantined (an unordered change
  cannot be replayed deterministically).
* ``n_tok`` is recomputed from ``tokens`` when absent (derived-only,
  the schemas.py rule).
* additive evolution: pass ``extra_cols`` (name → Spark type) to carry
  new upstream columns (e.g. ``src_meta``) through the after-image —
  they ride as nullable payload columns and the engine's contract
  validator classifies them additively downstream.

Scale posture: ONE ``from_json`` per row (JVM Jackson inside codegen, no
Python), a pure map with NO shuffle — decoding pipelines straight into
the digest/quarantine stage; malformed detection is the from_json null
result plus per-field null checks, so the split is two filters over the
same decoded projection (Catalyst collapses them into one scan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_OP_MAP = {"c": "insert", "r": "insert", "u": "update", "d": "delete"}

# engine changelog op -> wire op. The changelog is NET effect per key per
# epoch (LWW-merged), so create-vs-update is not recoverable — 'u' is
# exact because the engine applies insert and update identically (upsert;
# oracle.apply_events:104-110 path is shared).
_WIRE_MAP = {"upsert": "u", "delete": "d"}


def envelope_schema(
    extra_cols: dict[str, T.DataType] | None = None,
) -> T.StructType:
    image = [
        T.StructField("doc_id", T.StringType()),
        T.StructField("tokens", T.ArrayType(T.IntegerType())),
        T.StructField("n_tok", T.IntegerType()),
        T.StructField("source", T.StringType()),
    ] + [T.StructField(n, t) for n, t in (extra_cols or {}).items()]
    img = T.StructType(image)
    return T.StructType(
        [
            T.StructField("op", T.StringType()),
            T.StructField("before", img),
            T.StructField("after", img),
            T.StructField(
                "source",
                T.StructType(
                    [
                        T.StructField("lsn", T.LongType()),
                        T.StructField("ts_ms", T.LongType()),
                        T.StructField("table", T.StringType()),
                    ]
                ),
            ),
        ]
    )


def parse_debezium(
    raw: DataFrame,
    batch_id: int,
    value_col: str = "value",
    extra_cols: dict[str, T.DataType] | None = None,
    payload_wrapper: bool = False,
    updates_as_patch: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """Decode raw envelope strings into ``(events, malformed)``.

    ``events`` conforms to ``EVENT_SCHEMA`` (+ ``extra_cols``), ordered
    for replay by the engine's ``(batch_id, seq)`` contract with
    ``seq = source.lsn``. ``malformed`` keeps the ORIGINAL raw string
    plus a ``reason`` — the dead-letter feed, same discipline as
    ``tabular.split_malformed``. Kafka tombstones (null value) are
    counted malformed with reason ``tombstone`` rather than silently
    dropped: the engine's deletes are explicit ``op=d`` envelopes, so a
    tombstone reaching this decoder means a misconfigured producer.

    ``updates_as_patch=True`` maps op ``u`` to the engine's ``patch``
    (partial-column update: null payload column = keep current value) —
    for producers that ship PARTIAL after-images (Mongo/DMS update
    descriptions, Postgres without REPLICA IDENTITY FULL). Without the
    flag, an update whose after-image omits ``tokens`` would reach the
    engine as a full update and be quarantined by validation (tokens
    required) — correct for a full-image feed, wrong for a partial one.
    ``n_tok`` stays derived-only either way (recomputed from tokens when
    tokens ride along; untouched by a patch that omits them).
    """
    js = F.col(value_col)
    if payload_wrapper:
        # Kafka Connect without ExtractNewRecordState: {"schema":..,
        # "payload": {<envelope>}} — unwrap before typed decoding
        js = F.get_json_object(js, "$.payload")
    # PERMISSIVE from_json yields an all-NULL struct (not a null struct)
    # for malformed input, indistinguishable from {"op": null}; the corrupt
    # -record column is the only reliable bad-JSON signal
    schema = envelope_schema(extra_cols).add("_corrupt", T.StringType())
    dec = raw.withColumn(
        "_env",
        F.from_json(
            js,
            schema,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt"},
        ),
    )

    op_raw = F.col("_env.op")
    op_map = dict(_OP_MAP, u="patch") if updates_as_patch else _OP_MAP
    canon_op = F.coalesce(
        *[F.when(op_raw == k, F.lit(v)) for k, v in op_map.items()]
    )
    image = F.when(op_raw == "d", F.col("_env.before")).otherwise(
        F.col("_env.after")
    )
    lsn = F.col("_env.source.lsn")

    reason = (
        F.when(F.col(value_col).isNull(), "tombstone")
        .when(
            F.col("_env").isNull() | F.col("_env._corrupt").isNotNull(),
            "bad_json",
        )
        .when(op_raw.isNull() | canon_op.isNull(), "unknown_op")
        .when(lsn.isNull(), "no_lsn")
        .when(image.isNull() | image["doc_id"].isNull(), "no_image")
    )
    tagged = dec.withColumn("_reason", reason).withColumn("_img", image)
    malformed = tagged.filter(F.col("_reason").isNotNull()).select(
        F.col(value_col).alias("raw"), F.col("_reason").alias("reason")
    )
    payload_extra = list((extra_cols or {}).keys())
    events = tagged.filter(F.col("_reason").isNull()).select(
        F.lit(int(batch_id)).cast("long").alias("batch_id"),
        lsn.cast("long").alias("seq"),
        canon_op.alias("op"),
        F.col("_img.doc_id").alias("doc_id"),
        F.col("_img.tokens").alias("tokens"),
        F.coalesce(
            F.col("_img.n_tok"),
            F.when(
                F.col("_img.tokens").isNotNull(), F.size("_img.tokens")
            ),
        )
        .cast("int")
        .alias("n_tok"),
        F.col("_img.source").alias("source"),
        *[F.col(f"_img.{n}").alias(n) for n in payload_extra],
    )
    return events, malformed


def to_debezium(
    changes: DataFrame,
    key_col: str = "doc_id",
    table: str = "docs",
    epoch_col: str = "change_epoch",
    payload_cols: list[str] | None = None,
) -> DataFrame:
    """Encode the engine's changelog (``CdcEngine.changes`` rows:
    ``change_epoch, batch_id, op in ('upsert','delete'), <payload>,
    bucket``) as Debezium-style envelope strings — the EMIT side of this
    module, closing the replication loop: any engine (including a second
    ``CdcEngine`` via ``parse_debezium``) can subscribe to this table's
    changes over the same wire format a binlog tail would use.

    Mapping back out:

    * ``upsert`` → op ``u`` with the net payload as the after-image
      (exact: the engine applies insert and update identically);
      ``delete`` → op ``d`` with a KEY-ONLY before-image (Debezium
      ``REPLICA IDENTITY`` minimal — the changelog's deletes carry a
      null payload by construction).
    * ``source.lsn`` is synthesized deterministically as
      ``change_epoch·2³² + xxhash64(key) mod 2³²`` — NO wall clock, no
      window. Per key it is strictly increasing across epochs, so a
      consumer may fold ANY contiguous range of exported epochs into one
      replay batch and land the same state (the changelog nets each key
      once per epoch; cross-key lsn collisions are harmless because
      replay order only matters within a key). ``ts_ms`` mirrors the lsn
      rather than faking a timestamp.

    Scale posture: pure map (one ``to_json`` per row, JVM-side), no
    shuffle — pipelines straight onto the changelog scan, which already
    reads only changed bytes for delta epochs.
    """
    meta = {epoch_col, "batch_id", "op", "bucket"}
    payload_cols = payload_cols or [
        c for c in changes.columns if c not in meta
    ]
    if key_col not in payload_cols:
        raise ValueError(f"key_col {key_col!r} missing from payload")
    is_del = F.col("op") == "delete"
    lsn = F.col(epoch_col).cast("long") * F.lit(1 << 32) + F.pmod(
        F.xxhash64(F.col(key_col)), F.lit(1 << 32)
    )
    wire_op = F.coalesce(
        *[F.when(F.col("op") == k, F.lit(v)) for k, v in _WIRE_MAP.items()]
    )
    img = F.struct(*[F.col(c) for c in payload_cols])
    env = F.struct(
        wire_op.alias("op"),
        F.when(is_del, F.struct(F.col(key_col).alias(key_col))).alias(
            "before"
        ),
        F.when(~is_del, img).alias("after"),
        F.struct(
            lsn.alias("lsn"), lsn.alias("ts_ms"), F.lit(table).alias("table")
        ).alias("source"),
    )
    return changes.select(
        F.to_json(F.struct(F.col(key_col).alias(key_col))).alias("key"),
        F.to_json(env, {"ignoreNullFields": "true"}).alias("value"),
    )


# ------------------------------------------------------- schema changes (DDL)
# Debezium publishes upstream DDL as schema-change envelopes (the schema
# history topic): {"source": {...}, "ddl": "ALTER TABLE ...", "tableChanges":
# [{"type": "ALTER", "table": {"columns": [{"name", "typeName",
# "optional"}, ...]}}]}. tableChanges carries the table's FULL column list
# AFTER the change — structured, so no SQL parsing. The streaming tail
# (streaming/apply.py) consumes these to widen its decode schema, and the
# engine's additive-evolution contract does the rest; a consumer that
# ignored them would silently NULL every value of a newly added column.
#
# Contract (fail-loud where it matters, tolerant where it's safe):
# * ADD COLUMN of a supported type → decoded from the next envelope on;
# * type CHANGE of a known column → ValueError (not additive; the engine's
#   parquet-level widening path handles deliberate re-types);
# * DROP COLUMN → tolerated: the engine keeps the column, later envelopes
#   simply carry NULLs (additive semantics — history is not rewritten);
# * unknown typeName / change type → ValueError, never a silent guess.

_DDL_TYPE_MAP: dict[str, T.DataType] = {
    "VARCHAR": T.StringType(), "TEXT": T.StringType(),
    "CHAR": T.StringType(), "BPCHAR": T.StringType(),
    "STRING": T.StringType(), "JSON": T.StringType(), "JSONB": T.StringType(),
    "INT2": T.IntegerType(), "SMALLINT": T.IntegerType(),
    "INT4": T.IntegerType(), "INT": T.IntegerType(),
    "INTEGER": T.IntegerType(), "SERIAL": T.IntegerType(),
    "INT8": T.LongType(), "BIGINT": T.LongType(), "BIGSERIAL": T.LongType(),
    "FLOAT4": T.FloatType(), "REAL": T.FloatType(),
    "FLOAT8": T.DoubleType(), "DOUBLE": T.DoubleType(),
    "DOUBLE PRECISION": T.DoubleType(),
    "BOOL": T.BooleanType(), "BOOLEAN": T.BooleanType(),
    # postgres array types arrive underscore-prefixed
    "_INT4": T.ArrayType(T.IntegerType()),
    "_INT8": T.ArrayType(T.LongType()),
    "_TEXT": T.ArrayType(T.StringType()),
    "_VARCHAR": T.ArrayType(T.StringType()),
}


def schema_change_filter(value_col: str = "value"):
    """Column predicate: is this wire line a schema-change envelope?"""
    return F.get_json_object(F.col(value_col), "$.tableChanges").isNotNull()


def columns_from_schema_changes(lines: list[str]) -> dict[str, T.DataType]:
    """Decode schema-change envelope strings (driver-side: DDL is rare and
    metadata-sized — a handful of lines per migration, never per row) into
    the table's full ``column -> Spark type`` mapping after the LAST change
    in ``source.lsn`` order. Raises on unsupported change kinds or types."""
    import json as _json

    parsed: list[tuple[int, dict[str, T.DataType]]] = []
    for ln in lines:
        obj = _json.loads(ln)
        lsn = int(((obj.get("source") or {}).get("lsn")) or 0)
        for tc in obj.get("tableChanges") or []:
            kind = tc.get("type")
            if kind not in ("ALTER", "CREATE"):
                raise ValueError(
                    f"unsupported schema change type {kind!r} (handle table "
                    f"drops/renames manually — they are not additive)"
                )
            cols: dict[str, T.DataType] = {}
            for c in (tc.get("table") or {}).get("columns") or []:
                name = c.get("name")
                tn = str(c.get("typeName", "")).upper()
                if not name or tn not in _DDL_TYPE_MAP:
                    raise ValueError(
                        f"schema change column {name!r} has unsupported "
                        f"typeName {tn!r} — extend _DDL_TYPE_MAP deliberately"
                    )
                cols[name] = _DDL_TYPE_MAP[tn]
            parsed.append((lsn, cols))
    parsed.sort(key=lambda x: x[0])
    return parsed[-1][1] if parsed else {}


def schema_change_envelope(
    columns: dict[str, T.DataType], lsn: int, table: str = "docs"
) -> str:
    """EMIT side: one schema-change wire line announcing the table's full
    column list (the shape ``columns_from_schema_changes`` decodes) — lets
    the replication loop propagate additive evolution ahead of the data
    envelopes that use the new columns."""
    import json as _json

    rev = {
        T.StringType(): "VARCHAR", T.IntegerType(): "INT4",
        T.LongType(): "INT8", T.FloatType(): "FLOAT4",
        T.DoubleType(): "FLOAT8", T.BooleanType(): "BOOL",
        T.ArrayType(T.IntegerType()): "_INT4",
        T.ArrayType(T.LongType()): "_INT8",
        T.ArrayType(T.StringType()): "_TEXT",
    }
    cols = []
    for name, typ in columns.items():
        if typ not in rev:
            raise ValueError(f"no wire typeName for column {name!r}: {typ}")
        cols.append({"name": name, "typeName": rev[typ], "optional": True})
    return _json.dumps(
        {
            "source": {"lsn": int(lsn), "table": table},
            "ddl": f"ALTER TABLE {table}",
            "tableChanges": [{"type": "ALTER", "table": {"columns": cols}}],
        }
    )

"""Canonical schemas and the schema contract validator.

The reference enforces an exact column-set/type contract on every staging
table before extraction (reference: georef_ar_etl/utils.py:62-91,
``ValidateTableSchemaStep``) and evolves target schemas additively via
Alembic (reference: migrations/versions/7cedddd7547a_.py). Here:

* ``STATE_SCHEMA`` — the north-rule target table
  ``(doc_id string, tokens array<int>, n_tok int, source string)``.
* ``EVENT_SCHEMA`` — the change-event log replayed in ``(batch_id, seq)``.
* ``validate_contract`` — asserts required columns exist with exact types and
  classifies extra columns as additive (nullable → accepted, schema evolves)
  or breaking (rejected), mirroring the reference's fail-on-mismatch step.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import types as T

DOC_ID_LEN = 13  # fixed-length hierarchical IDs, like the reference's street
# IDs (reference: georef_ar_etl/constants.py:123-130 — street=13 chars).
GROUP_PREFIX_LEN = 2  # chars 1-2 = coarse group (province analogue)

STATE_FIELDS = [
    T.StructField("doc_id", T.StringType(), nullable=False),
    T.StructField("tokens", T.ArrayType(T.IntegerType(), containsNull=False), nullable=False),
    T.StructField("n_tok", T.IntegerType(), nullable=False),
    T.StructField("source", T.StringType(), nullable=False),
]
STATE_SCHEMA = T.StructType(STATE_FIELDS)

EVENT_FIELDS = [
    T.StructField("batch_id", T.LongType(), nullable=False),
    T.StructField("seq", T.LongType(), nullable=False),
    T.StructField("op", T.StringType(), nullable=False),
    T.StructField("doc_id", T.StringType(), nullable=True),
    T.StructField("tokens", T.ArrayType(T.IntegerType(), containsNull=True), nullable=True),
    T.StructField("n_tok", T.IntegerType(), nullable=True),
    T.StructField("source", T.StringType(), nullable=True),
]
EVENT_SCHEMA = T.StructType(EVENT_FIELDS)

# columns the merge carries into state (everything except CDC bookkeeping)
EVENT_META_COLS = ("batch_id", "seq", "op")

# ``patch`` is a PARTIAL-column update (Debezium partial-image style): only
# the event's non-null payload columns are set; null means "keep the current
# value" (so a patch cannot null a column out — send a full update for that).
# ``n_tok`` is derived-only and always recomputed from tokens; a patch to an
# absent key is a counted no-op (``patch_noop``), mirroring delete-of-absent.
OPS = ("insert", "update", "delete", "patch")


class SchemaContractError(ValueError):
    """Raised when an incoming batch violates the schema contract."""


@dataclass
class ContractResult:
    ok: bool
    added_columns: list[str] = field(default_factory=list)
    errors: list[str] = field(default_factory=list)
    # existing columns whose batch type is a legal WIDENING of the state
    # type (state schema must evolve int→bigint etc. to absorb the batch)
    widened_columns: list[str] = field(default_factory=list)


def _base_type_ok(actual: T.DataType, expected: T.DataType) -> bool:
    return actual.simpleString() == expected.simpleString()


# legal type widenings (Iceberg schema-evolution rules: lossless numeric
# promotions only). Spark 4's parquet readers promote these at SCAN time
# (SPARK-40876), so widening a snapshot-table column is metadata-only —
# existing narrow files keep reading under the widened schema, no rewrite.
_WIDENS = {
    ("smallint", "int"),
    ("smallint", "bigint"),
    ("int", "bigint"),
    ("float", "double"),
}


def is_widening(frm: T.DataType, to: T.DataType) -> bool:
    """True when ``frm`` → ``to`` is a lossless numeric widening, including
    element-wise over arrays (array<int> → array<bigint>)."""
    if isinstance(frm, T.ArrayType) and isinstance(to, T.ArrayType):
        return is_widening(frm.elementType, to.elementType)
    return (frm.simpleString(), to.simpleString()) in _WIDENS


def validate_contract(
    batch_schema: T.StructType,
    state_schema: T.StructType,
    allow_additive: bool = True,
) -> ContractResult:
    """Check an event batch's payload columns against the current state schema.

    Required: every state column (beyond CDC meta) present with the exact type
    — except that nullability of event payload columns is relaxed (deletes
    carry nulls). Extra payload columns must be additive (new, any type) when
    ``allow_additive``; otherwise they are contract errors.
    """
    errors: list[str] = []
    added: list[str] = []
    batch_fields = {f.name: f for f in batch_schema.fields}

    for meta in EVENT_META_COLS:
        if meta not in batch_fields:
            errors.append(f"missing CDC column: {meta}")

    widened: list[str] = []
    state_fields = {f.name: f for f in state_schema.fields}
    for name, f in state_fields.items():
        if name not in batch_fields:
            errors.append(f"missing payload column: {name}")
            continue
        bt = batch_fields[name].dataType
        if _base_type_ok(bt, f.dataType):
            continue
        if is_widening(f.dataType, bt):
            # batch is WIDER → schema evolution (state widens, metadata-only)
            widened.append(name)
        elif is_widening(bt, f.dataType):
            # batch is NARROWER → safe upcast-on-ingest (align_columns casts)
            pass
        else:
            errors.append(
                f"type mismatch for {name}: "
                f"{bt.simpleString()} != {f.dataType.simpleString()}"
            )

    for name in batch_fields:
        if name in state_fields or name in EVENT_META_COLS:
            continue
        if allow_additive:
            added.append(name)
        else:
            errors.append(f"unexpected column: {name}")

    return ContractResult(
        ok=not errors,
        added_columns=sorted(added),
        errors=errors,
        widened_columns=sorted(widened),
    )


def evolved_state_schema(state_schema: T.StructType, batch_schema: T.StructType) -> T.StructType:
    """State schema after absorbing a batch: new payload columns add
    (nullable — old rows read as null, the additive ``ALTER TABLE ADD
    COLUMN`` analogue) and existing columns WIDEN when the batch carries a
    legal numeric promotion (``is_widening`` — the Iceberg
    ``ALTER COLUMN TYPE`` analogue). Widening is metadata-only: Spark 4's
    parquet readers promote narrow files at scan time, and read_state
    always scans under the manifest-authoritative schema, so existing
    data files are never rewritten."""
    batch_fields = {f.name: f for f in batch_schema.fields}
    existing = {f.name for f in state_schema.fields}
    fields = []
    for f in state_schema.fields:
        b = batch_fields.get(f.name)
        if b is not None and is_widening(f.dataType, b.dataType):
            fields.append(T.StructField(f.name, b.dataType, nullable=f.nullable))
        else:
            fields.append(f)
    for f in batch_schema.fields:
        if f.name in existing or f.name in EVENT_META_COLS:
            continue
        fields.append(T.StructField(f.name, f.dataType, nullable=True))
    return T.StructType(fields)


def canonical_wide(dt: T.DataType) -> T.DataType:
    """The widest type in a column's widening family (int/smallint →
    bigint, float → double, arrays element-wise) — used to make the batch
    content digest WIDTH-STABLE: xxhash64 hashes int32 and int64
    differently, so a narrow-shape batch re-delivered after a type
    widening would otherwise digest as "different content". Hashing
    through the canonical wide cast makes the digest a function of the
    VALUES, as exactly-once re-delivery semantics require."""
    if isinstance(dt, T.ArrayType):
        return T.ArrayType(canonical_wide(dt.elementType), dt.containsNull)
    wide = {"smallint": T.LongType(), "int": T.LongType(), "float": T.DoubleType()}
    return wide.get(dt.simpleString(), dt)

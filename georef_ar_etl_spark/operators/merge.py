"""The MERGE kernel: apply a deduplicated change batch to the current state.

This is the Spark-first rewrite of the reference's central operator — the
snapshot diff-and-upsert (georef_ar_etl/transformers.py:67-151: per-key
lookup → update-or-insert, then an anti-join delete pass). Instead of
row-at-a-time lookups, one hash-partitioned ``full_outer`` join on ``doc_id``
classifies every key as insert / update / delete / carry-over in a single
shuffle-stage, equivalent to::

    MERGE INTO state t USING batch s ON t.doc_id = s.doc_id
    WHEN MATCHED AND s.op = 'delete' THEN DELETE
    WHEN MATCHED THEN UPDATE SET *
    WHEN NOT MATCHED AND s.op != 'delete' THEN INSERT *

Both sides are unique on ``doc_id`` (state by construction, batch after
dedup), so the join has no per-key skew; prefix-skewed key *distributions*
are randomized by the xxhash64 bucket layout chosen by the table
(see table.py) and any residual partition skew is handled by AQE skew-join.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

ACTION_INSERT = "insert"
ACTION_UPDATE = "update"
ACTION_DELETE = "delete"
ACTION_DELETE_NOOP = "delete_noop"
ACTION_PATCHED = "patched"
ACTION_PATCH_NOOP = "patch_noop"
ACTION_KEEP = "keep"

ACTIONS = (
    ACTION_INSERT,
    ACTION_UPDATE,
    ACTION_DELETE,
    ACTION_DELETE_NOOP,
    ACTION_PATCHED,
    ACTION_PATCH_NOOP,
    ACTION_KEEP,
)


@dataclass
class MergeResult:
    """``tagged`` carries (_key, _action, *payload); persist it to derive both
    the new state and the action counts from one join execution."""

    tagged: DataFrame
    key: str = "doc_id"

    @property
    def new_state(self) -> DataFrame:
        return self.tagged.filter(
            ~F.col("_action").isin(ACTION_DELETE, ACTION_DELETE_NOOP, ACTION_PATCH_NOOP)
        ).drop("_key", "_action")

    @property
    def actions(self) -> DataFrame:
        return self.tagged.select(
            F.col("_key").alias(self.key), F.col("_action").alias("action")
        )

    def action_counts(self) -> dict[str, int]:
        rows = self.tagged.groupBy("_action").count().collect()
        return {r["_action"]: r["count"] for r in rows}


def align_columns(df: DataFrame, schema: T.StructType) -> DataFrame:
    """Project ``df`` to exactly ``schema``'s columns, adding missing ones as
    typed nulls — how old snapshots are read after additive schema evolution
    (missing-column-as-null; reference analogue: Alembic additive adds)."""
    cols = []
    have = set(df.columns)
    for f in schema.fields:
        # cast via the DDL string — ignores containsNull/nullable markers,
        # which differ between event payloads (nullable) and state (not)
        ddl = f.dataType.simpleString()
        if f.name in have:
            cols.append(F.col(f.name).cast(ddl).alias(f.name))
        else:
            cols.append(F.lit(None).cast(ddl).alias(f.name))
    return df.select(*cols)


def merge_upsert(
    state: DataFrame,
    batch: DataFrame,
    payload_cols: list[str],
    key: str = "doc_id",
) -> MergeResult:
    """Full-outer MERGE of a per-key-unique batch into per-key-unique state.

    ``batch`` must carry ``op`` plus ``payload_cols``; ``state`` must carry
    ``payload_cols`` (align first for schema evolution). Upsert semantics:
    ``insert`` of an existing key updates it, ``update`` of an absent key
    inserts it, ``delete`` of an absent key is a no-op — matching the
    oracle's sequential replay semantics exactly.

    ``patch`` rows (partial-column updates, schemas.OPS contract) overlay
    only their non-null columns onto the matched state row
    (``coalesce(batch, state)`` per column — exactly the MERGE clause
    ``WHEN MATCHED THEN UPDATE SET c = coalesce(s.c, t.c)``); a patch of an
    absent key is the counted no-op action ``patch_noop``. Fold a batch
    through :func:`fold_patch_events` first — this kernel requires at most
    one row per key.
    """
    s = state.select(*payload_cols).alias("t")
    b = batch.select("op", *payload_cols).alias("s")
    joined = s.join(b, F.col(f"t.{key}") == F.col(f"s.{key}"), "full_outer")

    has_t = F.col(f"t.{key}").isNotNull()
    has_s = F.col(f"s.{key}").isNotNull()
    is_del = has_s & (F.col("s.op") == "delete")
    is_patch = has_s & (F.col("s.op") == "patch")

    action = (
        F.when(is_del & has_t, F.lit(ACTION_DELETE))
        .when(is_del, F.lit(ACTION_DELETE_NOOP))
        .when(is_patch & has_t, F.lit(ACTION_PATCHED))
        .when(is_patch, F.lit(ACTION_PATCH_NOOP))
        .when(has_s & has_t, F.lit(ACTION_UPDATE))
        .when(has_s, F.lit(ACTION_INSERT))
        .otherwise(F.lit(ACTION_KEEP))
    )

    take_batch = has_s & ~is_del & ~is_patch
    out_cols = [
        F.when(is_patch & has_t, F.coalesce(F.col(f"s.{c}"), F.col(f"t.{c}")))
        .when(take_batch, F.col(f"s.{c}"))
        .otherwise(F.col(f"t.{c}"))
        .alias(c)
        for c in payload_cols
    ]
    tagged = joined.select(
        F.coalesce(F.col(f"s.{key}"), F.col(f"t.{key}")).alias("_key"),
        action.alias("_action"),
        *out_cols,
    )
    return MergeResult(tagged=tagged, key=key)


def fold_patch_events(
    events: DataFrame,
    payload_cols: list[str],
    key: str = "doc_id",
    order: str = "seq",
) -> DataFrame:
    """Fold a batch containing ``patch`` events to ONE effective event per
    key, in replay (``order``) semantics — the patch-aware generalization of
    in-batch last-writer-wins (dedup_events.latest_per_key).

    Replay order defines composition: the last FULL event (insert / update /
    delete) per key supersedes everything before it; patches AFTER it
    overlay column-wise (last non-null value per column wins, the
    partial-image rule from schemas.OPS). Patches after an in-batch delete
    target a key that no longer exists — they are superseded exactly like
    any LWW-shadowed event and fold away silently. Keys with only patches
    come out as one combined ``op='patch'`` row for the merge kernel to
    resolve against state (patched / patch_noop).

    Scale shape: two hash aggregates (winner per key among full events —
    the existing max_by two-phase; last-non-null per column among live
    patches — ``max_by(c, when(c.isNotNull, order))``, which ignores rows
    where the ordering expression is null) plus one equi-join of the two
    per-key-unique sides. Map-side partial aggregation collapses hot-key
    bursts before the shuffle, the same skew posture as latest_per_key.
    """
    from georef_ar_etl_spark.operators.dedup_events import latest_per_key

    patchable = [c for c in payload_cols if c not in (key, "n_tok")]
    # n_tok (when present) is derived-only: carried from the full event,
    # null on pure-patch rows — normalization recomputes it from tokens
    carry = [c for c in payload_cols if c != key and c not in patchable]
    carry_t = {c: events.schema[c].dataType.simpleString() for c in carry}
    full = events.filter(F.col("op") != "patch")
    patches = events.filter(F.col("op") == "patch")
    last_full = latest_per_key(full, key=key, order=order)

    # live patches: those AFTER the key's last full event (or keys with no
    # full event at all); earlier ones are superseded by the full image
    bseq = last_full.select(key, F.col(order).alias("_bseq"))
    live = patches.join(bseq, key, "left").filter(
        F.col("_bseq").isNull() | (F.col(order) > F.col("_bseq"))
    )
    folded = live.groupBy(key).agg(
        F.max(order).alias(order),
        *[
            F.max_by(F.col(c), F.when(F.col(c).isNotNull(), F.col(order))).alias(c)
            for c in patchable
        ],
    )

    f, p = last_full.alias("f"), folded.alias("p")
    overlaid = f.join(p, key, "left").select(
        F.col(key),
        F.col("f.op").alias("op"),
        F.coalesce(F.col(f"p.{order}"), F.col(f"f.{order}")).alias(order),
        *[F.col(f"f.{c}").alias(c) for c in carry],
        *[
            F.when(
                F.col("f.op") != "delete",
                F.coalesce(F.col(f"p.{c}"), F.col(f"f.{c}")),
            )
            .otherwise(F.col(f"f.{c}"))
            .alias(c)
            for c in patchable
        ],
    )
    pure = folded.join(last_full.select(key), key, "left_anti").select(
        F.col(key),
        F.lit("patch").alias("op"),
        F.col(order),
        *[F.lit(None).cast(carry_t[c]).alias(c) for c in carry],
        *[F.col(c) for c in patchable],
    )
    return overlaid.unionByName(pure)


def table_diff(
    left: DataFrame, right: DataFrame, keys: list[str] | str
) -> DataFrame:
    """Symmetric snapshot diff: which keys were added / removed / changed
    between two versions of a table — the validation tool behind every
    migration, backfill, and replica-consistency check (reference
    analogue: per-run changed-ID reports,
    georef_ar_etl/transformers.py:145-149, computed there by re-querying
    the loaded table).

    ONE full-outer sort-merge join on the key (each side shuffles once);
    'changed' is an exact column-wise null-safe compare (eqNullSafe chain
    — never a serialized-struct or hash fingerprint, so a changed-to-NULL
    field is a change and hash collisions cannot mask one). Unchanged keys
    are filtered out, so output size is bounded by the true drift, not
    the table. Output: (*keys, change_type).

    Both frames must share the non-key column set (schema drift is a
    different tool — schemas.validate_contract)."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    nonkeys = [c for c in left.columns if c not in keys]
    if set(left.columns) != set(right.columns):
        raise ValueError(
            f"table_diff requires matching columns: {left.columns} vs "
            f"{right.columns}"
        )
    l = left.select(
        *keys,
        F.lit(True).alias("_lp"),
        *[F.col(c).alias(f"_l_{c}") for c in nonkeys],
    )
    r = right.select(
        *keys,
        F.lit(True).alias("_rp"),
        *[F.col(c).alias(f"_r_{c}") for c in nonkeys],
    )
    same = F.lit(True)
    for c in nonkeys:
        same = same & F.col(f"_l_{c}").eqNullSafe(F.col(f"_r_{c}"))
    change = (
        F.when(F.col("_lp").isNull(), "added")
        .when(F.col("_rp").isNull(), "removed")
        .when(~same, "changed")
    )
    return (
        l.join(r, keys, "full_outer")
        .select(*keys, change.alias("change_type"))
        .filter(F.col("change_type").isNotNull())
    )

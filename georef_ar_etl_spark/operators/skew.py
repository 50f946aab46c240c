"""Skew mitigation: salted join for hot keys.

A shuffle join hashes rows to tasks BY KEY — a key holding 30% of a
100 TB fact table lands 30 TB on one task and the stage never finishes.
``salted_join`` splits every key across ``n_salt`` tasks: the big side
gets a deterministic per-row salt, the small side is replicated once per
salt value, and the join key becomes (key, salt). Cost: small side
× n_salt (bounded — the small side must already fit a shuffle), in
exchange for an n_salt-way split of every hot key.

Relationship to AQE (spark.sql.adaptive.skewJoin): AQE splits oversized
sort-merge partitions at runtime and is the FIRST tool to reach for;
explicit salting remains the standard fix when AQE cannot act — bucketed
/ pre-partitioned inputs it must not re-split, hash aggregates downstream
that inherit the skewed partitioning, or a single key larger than any
split threshold. The salted aggregate twin lives in
dedup_events.latest_per_key_salted.

Reference analogue: none — single-node Postgres never shuffles; this is
distributed-only machinery (cited shape: classic MapReduce skew-join
literature, e.g. Beame et al., PODS'14).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str] | str,
    n_salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join ``big`` ⋈ ``small`` on column list ``on`` with the hot keys of
    ``big`` spread across ``n_salt`` shuffle partitions per key.

    Each big row gets ONE salt (a deterministic xxhash64 of the whole
    row), so row multiplicity is preserved; the small side is exploded
    once per salt value so every (key, salt) pair finds its match.
    Supports ``inner`` and ``left`` (each big row still joins exactly
    once); ``right``/``full``/semi flavors would see the replicated small
    side and are rejected.
    """
    keys = [on] if isinstance(on, str) else list(on)
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports how='inner'|'left', got {how!r}: the "
            "replicated small side would duplicate right/full results"
        )
    if "_salt" in big.columns or "_salt" in small.columns:
        raise ValueError("'_salt' is reserved by salted_join")
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(n_salt))
    b = big.withColumn("_salt", salt.cast("int"))
    s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    )
    return b.join(s, keys + ["_salt"], how).drop("_salt")

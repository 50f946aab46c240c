"""Entity resolution: blocked fuzzy matching (block -> verify -> best).

The reference normalizes entity names and joins records by cleaned-name
equality (georef_ar_etl/utils.py::clean_string consumers; street/locality
name joins in the process modules) — exact match after normalization. At
web scale the dirty side never normalizes perfectly, so the standard ER
shape is: a cheap BLOCKING key bounds the candidate space (equi-join, one
shuffle), an edit-distance VERIFY prunes candidates (JVM levenshtein,
codegen), and a map-side-combinable min(struct) picks the best match per
probe. Never all-pairs: the block key is the contract that bounds the
join fan-out, exactly like the LSH bands in doc_dedup.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def digits_block(col: Column) -> Column:
    """Digit-only blocking key — the ER-classic 'block on the phone/zip/id
    digits' rule, robust to any non-numeric corruption of the name."""
    return F.regexp_replace(col, "[^0-9]", "")


def blocked_fuzzy_match(
    probe: DataFrame,
    clean: DataFrame,
    probe_id: str = "probe_id",
    clean_id: str = "clean_id",
    probe_name: str = "name",
    clean_name: str = "name",
    block: Callable[[Column], Column] = digits_block,
    max_dist: int = 2,
) -> DataFrame:
    """Match each probe row to its best clean-side row: equi-join on the
    blocking key, keep candidates with levenshtein <= max_dist, then the
    minimum (dist, clean_id) per probe — deterministic tie-break, partial
    aggregation (no per-probe window sort). Probes with no candidate
    within max_dist are absent from the output (caller decides the
    unmatched policy). Output: (probe_id, clean_id, dist).

    An empty blocking key (nothing survives the block fn) is dropped on
    BOTH sides rather than cross-matching all degenerate rows.
    """
    pb = probe.select(
        F.col(probe_id),
        F.col(probe_name).alias("_pname"),
        block(F.col(probe_name)).alias("_blk"),
    ).filter(F.col("_blk") != "")
    cl = clean.select(
        F.col(clean_id),
        F.col(clean_name).alias("_cname"),
        block(F.col(clean_name)).alias("_blk"),
    ).filter(F.col("_blk") != "")
    cand = pb.join(cl, "_blk").select(
        probe_id,
        clean_id,
        F.levenshtein("_pname", "_cname").alias("dist"),
    )
    return (
        cand.filter(F.col("dist") <= max_dist)
        .groupBy(probe_id)
        .agg(F.min(F.struct("dist", clean_id)).alias("b"))
        .select(
            probe_id,
            F.col(f"b.{clean_id}").alias(clean_id),
            F.col("b.dist").alias("dist"),
        )
    )


def with_global_rank(
    df: DataFrame, order_cols: list[str], rank_col: str = "rn"
) -> DataFrame:
    """Dense 1-based global rank in ``order_cols`` order WITHOUT the
    single-task global window (``row_number() OVER (ORDER BY ...)`` pulls
    the whole input through one task — the classic Spark scale trap).
    Two-phase instead: range-repartition on the key (so partitions are
    key-ordered and disjoint), rank locally per partition, then add each
    partition's broadcast cumulative offset — the DataFrame rendering of
    zipWithIndex. ``order_cols`` must be a TOTAL order (include a
    tie-break id), or ties straddling a partition boundary make the rank
    nondeterministic."""
    cols = [F.col(c) for c in order_cols]
    s = (
        df.repartitionByRange(*cols)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)  # counted below, then ranked — one pass
    )
    lw = Window.partitionBy("_pid").orderBy(*cols)
    # cumulative offsets driver-side: one row per PARTITION (metadata-sized
    # by construction — the established collect policy), which avoids an
    # unpartitioned window exchange in the plan
    counts = s.groupBy("_pid").agg(F.count(F.lit(1)).alias("_c")).collect()
    acc, offs = 0, []
    for r in sorted(counts, key=lambda r: r["_pid"]):
        offs.append((r["_pid"], acc))
        acc += r["_c"]
    off = df.sparkSession.createDataFrame(offs or [(0, 0)], "_pid int, _off long")
    return (
        s.join(F.broadcast(off), "_pid")
        .withColumn(
            rank_col,
            (F.col("_off") + F.row_number().over(lw)).cast("long"),
        )
        .drop("_pid", "_off")
    )


def sorted_neighborhood_pairs(
    df: DataFrame,
    id_col: str,
    name_col: str,
    window: int = 3,
    max_dist: int = 2,
) -> DataFrame:
    """Sorted-neighborhood entity matching (Hernández & Stolfo 1997): sort
    every record by the (dirty) name, slide a fixed window of size
    ``window`` down the global order, verify each in-window pair with
    levenshtein <= ``max_dist``. The OTHER classic blocking strategy next
    to equi-key blocking (blocked_fuzzy_match): a typo'd name lands
    lexicographically NEXT TO its original even when any exact block key
    would separate them, and the window bounds candidates at
    (window-1) x n regardless of key-value skew (a hot block key has no
    analogue here).

    Plan: one scalable global rank (with_global_rank — never a
    single-task window), one explode of the window-1 offsets, one
    equi-join on rank, JVM levenshtein verify. Output: (id_a, id_b,
    dist), each unordered pair once, ids normalized id_a < id_b.
    """
    if window < 2:
        raise ValueError(f"window must be >= 2, got {window}")
    ranked = with_global_rank(
        df.select(F.col(id_col).alias("_id"), F.col(name_col).alias("_nm")),
        ["_nm", "_id"],
    ).localCheckpoint(eager=True)  # ranked twice below — rank once
    probes = ranked.select(
        "_id", "_nm",
        F.explode(
            F.array(*[F.lit(d) for d in range(1, window)])
        ).alias("_d"),
        F.col("rn"),
    ).withColumn("_rn2", F.col("rn") + F.col("_d"))
    right = ranked.select(
        F.col("_id").alias("_idb"), F.col("_nm").alias("_nmb"),
        F.col("rn").alias("_rn2"),
    )
    return (
        probes.join(right, "_rn2")
        .withColumn("dist", F.levenshtein("_nm", "_nmb"))
        .filter(F.col("dist") <= max_dist)
        .select(
            F.least("_id", "_idb").alias("id_a"),
            F.greatest("_id", "_idb").alias("id_b"),
            F.col("dist").cast("int"),
        )
    )


def fs_weights(m: float, u: float) -> tuple[int, int]:
    """Fellegi–Sunter (1969) field weights in integer MILLI-units:
    agreement weight log2(m/u), disagreement log2((1−m)/(1−u)), where m =
    P(fields agree | same entity) and u = P(agree | different entities).
    Quantized to ints driver-side so pair scores are pure integer sums —
    bit-identical across engines and partitionings (the fixed-point rule
    every iterative operator here follows)."""
    import math

    if not (0 < u < m < 1):
        raise ValueError(f"need 0 < u < m < 1, got m={m}, u={u}")
    return (
        round(math.log2(m / u) * 1000),
        round(math.log2((1 - m) / (1 - u)) * 1000),
    )


def fs_classify(
    pairs: DataFrame,
    rules: list[tuple[Column, int, int]],
    upper_milli: int,
    lower_milli: int,
    out_col: str = "fs_milli",
    guard: Column | None = None,
) -> DataFrame:
    """Fellegi–Sunter record-linkage decision over candidate pairs: each
    rule is (agreement predicate over the pair row, agree weight,
    disagree weight) in milli-units from ``fs_weights``; the pair score
    is the sum and the verdict thresholds it into match / possible
    (clerical review) / non_match. This is the probabilistic layer the
    deterministic blockers (``sorted_neighborhood_pairs``,
    ``blocked_fuzzy_match``) feed — blocking bounds the pair space,
    FS decides.

    A NULL field on either side makes the rule abstain (weight 0) — the
    standard missing-data treatment; a predicate that evaluates NULL
    (e.g. comparing a null column) counts as abstention too.

    Scale posture: a pure projection over the candidate-pair stream —
    no shuffle, no Python; whatever partitioning the blocker produced
    flows through.

    ``guard`` (optional) is the expensive-rule short-circuit: order the
    rules cheapest-first and pass the predicate every row the CALLER
    ultimately keeps must satisfy (e.g. the pair-dedup ``id_a < id_b``
    that is already in the join condition). The LAST rule — the expensive
    one, typically an edit distance — is then only evaluated on rows
    passing ``guard`` whose partial score over the cheap rules can still
    reach ``lower_milli``; every other row gets the clamped score
    ``partial + min(aw, dw, 0)``, which is provably below ``lower_milli``
    when the clamp came from the reachability bound. Contract: with
    ``guard`` set, scores and verdicts are exact for every row that
    satisfies ``guard`` — rows failing it may carry a clamped score and
    MUST be dropped by the caller (they already are, by construction of
    the guard). This is what makes a blocked Fellegi–Sunter pass scale:
    the O(pairs) levenshtein only runs on the fraction of the candidate
    stream whose cheap fields leave the verdict undecided.
    """
    if lower_milli > upper_milli:
        raise ValueError(
            f"lower ({lower_milli}) must be <= upper ({upper_milli})"
        )
    if not rules:
        raise ValueError("fs_classify needs at least one rule")
    terms = [
        F.when(cond, F.lit(int(aw)))
        .when(~cond, F.lit(int(dw)))
        .otherwise(F.lit(0))  # NULL predicate → abstain
        for cond, aw, dw in rules
    ]
    if guard is not None and len(rules) >= 2:
        lcond, law, ldw = rules[-1]
        partial = terms[0]
        for t in terms[1:-1]:
            partial = partial + t
        max_last = max(int(law), int(ldw), 0)
        clamp = F.lit(int(min(int(law), int(ldw), 0)))
        # arithmetic form so the (expensive) predicate is referenced ONCE:
        # true → aw, false → dw, NULL → abstain 0 — the WHEN/WHEN shape
        # would re-evaluate the predicate in its second branch
        last = F.coalesce(
            F.lit(int(ldw))
            + F.lit(int(law) - int(ldw)) * lcond.cast("int"),
            F.lit(0),
        )
        total = partial + F.when(
            guard & (partial >= F.lit(int(lower_milli) - max_last)),
            last,
        ).otherwise(clamp)
    else:
        total = terms[0]
        for t in terms[1:]:
            total = total + t
    score = total.cast("bigint").alias(out_col)
    return pairs.select("*", score).withColumn(
        "verdict",
        F.when(F.col(out_col) >= upper_milli, "match")
        .when(F.col(out_col) >= lower_milli, "possible")
        .otherwise("non_match"),
    )

"""Corpus management: deterministic hash-based splits and samples.

The standard way to carve train/validation/test sets (and debug samples)
out of a pretraining corpus is NOT ``df.sample``/``rand()`` — those change
membership under repartitioning, retries and corpus growth. Hash-based
assignment is a pure function of the document key, so:

* the same document lands in the same split on every run, every cluster
  layout, every engine (reproducible experiments, no eval leakage);
* adding new documents never moves existing ones between splits;
* assignment is a codegen'd column expression — no shuffle, no state.

Reference analogue: the reference pipeline partitions its outputs by
deterministic entity attributes, never by randomness
(georef_ar_etl/streets.py:33-41 per-province files); this is the same
principle applied to corpus membership.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# assignment granularity: fractions resolve to whole buckets out of this
# many (0.01 % of precision is plenty for split ratios)
N_BUCKETS = 10_000


def hash_bucket(
    key: Column,
    hash_fn: str = "xxhash64",
    buckets: int = N_BUCKETS,
    salt: str = "",
) -> Column:
    """Deterministic bucket in [0, buckets) from a key column.

    ``xxhash64`` (default) is the fast JVM production path. ``md5`` is
    bit-identical across engines (Spark, DuckDB, Python) — use it when an
    external system must reproduce the exact assignment; it costs one md5
    + base-16 conv per row.

    ``salt`` decorrelates different USES of the hash on the same keys:
    sampling salts with "sample" so a debug sample still contains every
    split — with one shared unsalted hash, any sample of fraction <= the
    first split's fraction would lie entirely inside that split (a 50%
    sample of a 98/1/1 corpus would be 100% train, zero eval)."""
    if hash_fn == "xxhash64":
        h = F.xxhash64(key, F.lit(salt)) if salt else F.xxhash64(key)
        return F.pmod(h, F.lit(buckets)).cast("int")
    if hash_fn == "md5":
        s = F.concat(key.cast("string"), F.lit(salt)) if salt else key.cast("string")
        return (
            F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("long") % buckets
        ).cast("int")
    raise ValueError(f"unknown hash_fn: {hash_fn!r}")


def split_assignment(
    key: Column,
    fractions: list[tuple[str, float]],
    hash_fn: str = "xxhash64",
) -> Column:
    """Split label for a key: cumulative fraction thresholds over the hash
    bucket. ``fractions`` is an ordered list of (label, fraction) summing to
    1.0; the last split absorbs the rounding remainder."""
    total = sum(f for _, f in fractions)
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1.0, got {total}")
    b = hash_bucket(key, hash_fn)
    expr = None
    cum = 0.0
    for label, frac in fractions[:-1]:
        cum += frac
        threshold = int(round(cum * N_BUCKETS))
        cond = b < threshold
        expr = F.when(cond, label) if expr is None else expr.when(cond, label)
    last = fractions[-1][0]
    return F.lit(last) if expr is None else expr.otherwise(F.lit(last))


def hash_split(
    df: DataFrame,
    key_col: str = "doc_id",
    fractions: list[tuple[str, float]] | None = None,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Add a ``split`` column (default 98/1/1 train/val/test)."""
    fractions = fractions or [("train", 0.98), ("val", 0.01), ("test", 0.01)]
    return df.withColumn(
        "split", split_assignment(F.col(key_col), fractions, hash_fn)
    )


def deterministic_sample(
    df: DataFrame,
    fraction: float,
    key_col: str = "doc_id",
    hash_fn: str = "xxhash64",
    salt: str = "sample",
) -> DataFrame:
    """Keep ~``fraction`` of rows by hash bucket — unlike ``df.sample`` the
    kept set is a pure function of the key: stable across repartitioning,
    task retries and corpus growth, and a sample is always a SUBSET of any
    larger sample with the same salt (nested samples for scaling-law runs).

    The hash is salted ("sample" by default) so it is independent of
    ``hash_split``'s assignment: splitting a sample yields all splits in
    their expected proportions. Different salts give independent samples."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    threshold = int(round(fraction * N_BUCKETS))
    return df.filter(hash_bucket(F.col(key_col), hash_fn, salt=salt) < threshold)


def pack_sequences(
    df: DataFrame,
    capacity: int,
    len_col: str = "n_tok",
    group_col: str | list[str] = "source",
    id_col: str = "doc_id",
    out_col: str = "pack_seq",
) -> DataFrame:
    """Deterministic greedy sequence packing for pretraining batches.

    Documents are laid out in (group, id) order and cut into packs of
    ~``capacity`` length units; a document crossing a pack boundary goes
    WHOLE into the pack where it STARTS (overflow-allowed greedy fill —
    pack length is bounded by ``capacity + max_doc_len - 1``, the standard
    don't-split-documents packing discipline). The assignment is a pure
    prefix-sum: ``pack = floor((running_total - len) / capacity)`` — one
    window per group, no sequential state, so unlike first-fit bin packing
    it is deterministic under any partitioning AND expressible identically
    in SQL engines (the q41 oracle).

    Scale posture: the window shuffles one group per partition; at corpus
    scale ``group_col`` (source / shard) is the storage partition column,
    making packing partition-local — the distributed packing discipline
    (a GLOBAL greedy pack would serialize the corpus through one task).
    """
    from pyspark.sql import Window

    if capacity < 1:
        # non-ANSI divide-by-zero would silently yield NULL pack ids
        raise ValueError(f"capacity must be >= 1, got {capacity}")
    groups = [group_col] if isinstance(group_col, str) else list(group_col)
    w = Window.partitionBy(*groups).orderBy(id_col)
    cum = F.sum(len_col).over(w)
    return df.withColumn(
        out_col,
        F.floor((cum - F.col(len_col)) / F.lit(capacity)).cast("int"),
    )


def token_budget_sample(
    df: DataFrame,
    budget: int,
    len_col: str = "n_tok",
    group_col: str = "source",
    key_col: str = "doc_id",
    salt: str = "budget",
) -> DataFrame:
    """Data-mixture curation: keep documents per group until the group's
    cumulative length reaches ``budget`` ("up to N tokens per source"),
    admitting whole documents in salted-hash order — a deterministic
    unbiased shuffle, so the sample is stable under repartitioning and
    retries and reproducible across engines (md5 order). A document is
    admitted iff the budget was not yet exhausted when it STARTS (the last
    admitted doc may overflow — whole-document discipline, same as
    pack_sequences). Pure window prefix-sum, one shuffle per group.

    Unlike hash_split, budget sampling cannot be growth-stable: new
    documents land at arbitrary hash positions and shift the admission
    boundary — re-curate per corpus snapshot."""
    from pyspark.sql import Window

    if budget < 1:
        raise ValueError(f"budget must be >= 1, got {budget}")
    h = F.md5(F.concat(F.col(key_col).cast("string"), F.lit(salt)))
    w = Window.partitionBy(group_col).orderBy(h.asc(), F.col(key_col).asc())
    started = F.sum(len_col).over(w) - F.col(len_col)
    return df.withColumn("_started", started).filter(
        F.col("_started") < budget
    ).drop("_started")


def per_group_sample(
    df: DataFrame,
    k: int,
    group_col: str = "source",
    key_col: str = "doc_id",
    salt: str = "groupsample",
) -> DataFrame:
    """Exactly-k (or all, for smaller groups) documents per group, chosen
    as the k smallest salted md5 hashes — a deterministic uniform sample
    per group (balanced per-source eval sets, few-shot pools) with the
    same reproducibility contract as the other samplers: stable under
    repartitioning and retries, identical across engines. One window
    rank per group; ties impossible (the hash input embeds the unique
    key)."""
    from pyspark.sql import Window

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    h = F.md5(F.concat(F.col(key_col).cast("string"), F.lit(salt)))
    w = Window.partitionBy(group_col).orderBy(h.asc(), F.col(key_col).asc())
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .drop("_rk")
    )


def weighted_sample(
    df: DataFrame,
    k: int,
    weight_col: str,
    key_col: str = "doc_id",
    salt: str = "wsample",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement (Efraimidis–Spirakis A-ES):
    each row gets priority ``ln(u)/w`` for a hash-derived uniform
    u ∈ (0, 1]; the k largest priorities are exactly a weighted sample
    without replacement. The standard corpus-mixing primitive when docs
    carry quality/length weights rather than per-source budgets
    (token_budget_sample is the per-source variant).

    Deterministic like every sampler here: u derives from md5(key, salt),
    so the sample is reproducible across retries, partitionings, and
    engines (the DuckDB oracle reproduces it row-for-row, q86). Rows with
    NULL or non-positive weight are excluded (ln(u)/w needs w > 0).

    Plan shape at 100 TB: priority is a pure per-row expression; the
    global top-k is orderBy+limit, which Spark executes as per-partition
    top-k + a k-row merge (TakeOrderedAndProject) — no full sort, no
    shuffle of the corpus.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    hv = F.conv(
        F.substring(F.md5(F.concat(F.col(key_col).cast("string"), F.lit(salt))), 1, 8),
        16, 10,
    ).cast("long")
    u = (hv + F.lit(1)) / F.lit(4294967296.0)
    pri = F.log(u) / F.col(weight_col)
    return (
        df.filter(F.col(weight_col) > 0)
        .withColumn("_pri", pri)
        .orderBy(F.desc("_pri"), F.col(key_col).asc())
        .limit(k)
        .drop("_pri")
    )


def negative_samples(
    df: DataFrame,
    id_col: str,
    k: int = 4,
    seed: int = 7,
) -> DataFrame:
    """Deterministic NEGATIVE sampling (contrastive-training prep: k
    pseudo-random non-self partners per row — triplet/InfoNCE negatives,
    BM25-hard-negative fallback). Pure function of the data: partner j of
    row r is ``1 + md5(id:j:seed) mod N`` in the corpus's total id order,
    self-collisions remapped to the next rank (never dropped, so every
    row gets EXACTLY k negatives and the output size is k·N by
    construction). Identical across engines/retries/partitionings — the
    same no-RNG-state rule as mask_tokens/hash_split.

    Plan: one scalable global rank over the corpus (never a single-task
    window), one k-way explode of hash ranks, one equi-join back on rank
    — shuffle carries (N·k) id-pair rows, payloads only on the final
    join. Output: (id, neg_rank_j, neg_id)."""
    from georef_ar_etl_spark.operators.entity_match import with_global_rank

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    ranked = with_global_rank(
        df.select(F.col(id_col).alias("_id")), ["_id"]
    ).localCheckpoint(eager=True)  # ranked twice below — rank once
    n = ranked.count()
    if n < 2:
        raise ValueError("negative sampling needs at least 2 rows")
    hv = F.conv(
        F.substring(
            F.md5(F.concat_ws(":", F.col("_id"), F.col("_j"), F.lit(seed))),
            1, 8,
        ), 16, 10,
    ).cast("long") % F.lit((1 << 31) - 1)
    probes = (
        ranked.select(
            "_id", "rn",
            F.explode(F.array(*[F.lit(j) for j in range(1, k + 1)])).alias("_j"),
        )
        .withColumn("_nr", hv % F.lit(n) + 1)
        # self-collision: step to the next rank, wrapping — keeps exactly k
        .withColumn(
            "_nr",
            F.when(F.col("_nr") == F.col("rn"), F.col("_nr") % F.lit(n) + 1)
            .otherwise(F.col("_nr")),
        )
    )
    right = ranked.select(
        F.col("_id").alias("neg_id"), F.col("rn").alias("_nr")
    )
    return probes.join(right, "_nr").select(
        F.col("_id").alias(id_col),
        F.col("_j").alias("neg_rank_j"),
        "neg_id",
    )


def pack_layout(
    df: DataFrame,
    capacity: int,
    len_col: str = "n_tok",
    group_col: str | list[str] = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Physical layout of packed pretraining batches: extend
    ``pack_sequences``'s pack assignment with what the trainer's data
    loader actually consumes — per document its ``seg_idx`` (segment
    index inside the pack, the attention-mask segment id) and
    ``start_pos`` (token offset where the document begins inside the
    pack, the position-id base). Without these, packing is an
    assignment; with them it is an executable batch layout (documents
    concatenate in (group, id) order, positions are exact prefix sums).

    Pure window arithmetic on the SAME (group ordered-by id) shuffle the
    pack assignment already runs — Catalyst plans ONE Exchange for all
    three windows, so the layout costs nothing over the assignment.
    """
    from pyspark.sql import Window

    groups = [group_col] if isinstance(group_col, str) else list(group_col)
    packed = pack_sequences(
        df, capacity, len_col=len_col, group_col=group_col, id_col=id_col,
        out_col="pack_seq",
    )
    w_pack = Window.partitionBy(*groups, "pack_seq").orderBy(id_col)
    start = F.sum(len_col).over(w_pack) - F.col(len_col)
    return packed.withColumn(
        "seg_idx", (F.row_number().over(w_pack) - 1).cast("int")
    ).withColumn("start_pos", start.cast("bigint"))


def stratified_sample(
    df: DataFrame,
    total_k: int,
    group_col: str = "source",
    key_col: str = "doc_id",
    salt: str = "stratified",
) -> DataFrame:
    """Proportional stratified sampling with largest-remainder (Hamilton)
    apportionment: a TOTAL budget of ``total_k`` rows allocated across
    groups proportional to group size — quotas are exact integer
    arithmetic (floor(k·c_g / N), leftovers to the largest remainders,
    ties by group name), so the allocation is deterministic and sums to
    exactly min(total_k, N). Within each group the quota is filled by
    the k-smallest-salted-hash rule shared with ``per_group_sample``.
    per_group_sample balances (k per group); this PRESERVES the corpus
    mixture at a fixed budget — the eval-set / ablation-subset sampler.

    A quota can exceed a tiny group's size only when total_k > N (then
    everything is taken); otherwise remainder apportionment never
    overfills: quota ≤ count per group holds by construction only in
    expectation, so the selector also caps at the group's rows.

    Scale posture: the allocation runs on the GROUPS-sized count frame
    (two tiny windows), broadcast back onto the corpus; the corpus pays
    one per-group window rank — same single shuffle as per_group_sample.
    """
    from pyspark.sql import Window

    if total_k < 1:
        raise ValueError(f"total_k must be >= 1, got {total_k}")
    counts = df.groupBy(F.col(group_col).alias("_g")).agg(
        F.count(F.lit(1)).alias("_c")
    )
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    n_total = F.sum("_c").over(w_all)
    base = F.floor(F.lit(total_k) * F.col("_c") / n_total)
    rem = (F.lit(total_k) * F.col("_c")) % n_total
    leftover = F.lit(total_k) - F.sum(base).over(w_all)
    w_rem = Window.orderBy(F.desc("_rem"), F.col("_g").asc())
    alloc = (
        counts.select(
            "_g", "_c", base.alias("_base"), rem.alias("_rem"),
            leftover.alias("_left"),
        )
        .withColumn("_rk", F.row_number().over(w_rem))
        .select(
            "_g",
            (F.col("_base") + F.when(F.col("_rk") <= F.col("_left"), 1)
             .otherwise(0)).alias("_quota"),
        )
    )
    h = F.md5(F.concat(F.col(key_col).cast("string"), F.lit(salt)))
    w_g = Window.partitionBy(group_col).orderBy(h.asc(), F.col(key_col).asc())
    return (
        df.join(
            F.broadcast(alloc), F.col(group_col) == F.col("_g"), "inner"
        )
        .withColumn("_rk", F.row_number().over(w_g))
        .filter(F.col("_rk") <= F.col("_quota"))
        .drop("_g", "_quota", "_rk")
    )

"""Mergeable sketches for corpus-scale approximate statistics.

``count_min_sketch`` — the Count-Min sketch (Cormode & Muthukrishnan):
a d×w counter matrix over d pairwise-independent hash rows; the estimated
frequency of an item is the MIN of its d counters — always an
overestimate, within εN with probability 1-δ for w = e/ε, d = ln(1/δ).
Why it matters at 100 TB: exact token frequencies need a shuffle keyed by
token (vocabulary-sized state); the sketch is a FIXED-SIZE aggregate that
partials combine by cell-wise addition (a plain groupBy sum), so frequency
estimation over any stream/corpus costs one map-side-combinable pass and
d×w longs of memory — and sketches of corpus shards MERGE by addition.

Determinism: hashing is md5-derived + affine remix over GF(2^31-1) with
seeded constants (the minhash family, operators/doc_dedup.py), so a DuckDB
oracle reproduces every counter exactly (q51) — the sketch is verified
bit-for-bit, not statistically.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from georef_ar_etl_spark.operators.doc_dedup import minhash_affine_params

P31 = (1 << 31) - 1


def _word_hash(col: Column) -> Column:
    """32-bit md5 word hash reduced mod 2^31-1 (cross-engine exact; the
    reduction keeps every affine product below 2^62 — safe in Spark longs
    AND DuckDB BIGINTs)."""
    return (
        F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long") % P31
    )


def cm_bucket(
    col: Column, j: int, depth: int, width: int, seed: int = 11
) -> Column:
    """Row-j bucket of an item: affine remix of the word hash, mod width.
    ``depth`` must be the sketch's full depth — the seeded constants are
    drawn as ONE (A, B) batch of that size, and a per-row draw of a
    different size would shift B's position in the generator stream (the
    oracle draws once with the full depth)."""
    A, B = minhash_affine_params(depth, seed=seed)
    return ((_word_hash(col) * int(A[j]) + int(B[j])) % P31) % width


def _cells(col: str, depth: int, width: int, seed: int):
    """The exploded (j, bucket) cell expression — ONE definition shared by
    build and estimate: the min-of-counters estimate is only valid if both
    sides derive cells with the bit-identical formula."""
    return F.explode(
        F.array(*[
            F.struct(
                F.lit(j).alias("j"),
                cm_bucket(F.col(col), j, depth, width, seed).alias("bucket"),
            )
            for j in range(depth)
        ])
    )


def count_min_sketch(
    df: DataFrame,
    col: str,
    depth: int = 4,
    width: int = 512,
    seed: int = 11,
) -> DataFrame:
    """Build the sketch over every row of ``df[col]`` (pre-explode items
    yourself — occurrences count, not distinct). Returns the counter table
    (j, bucket, cnt): at most depth×width rows regardless of input size.
    Plan: one projection exploding each item into its d (row, bucket)
    cells, one hash aggregate with map-side combine."""
    return (
        df.select(_cells(col, depth, width, seed).alias("c"))
        .groupBy(F.col("c.j").alias("j"), F.col("c.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cm_estimate(
    sketch: DataFrame,
    queries: DataFrame,
    col: str,
    depth: int = 4,
    width: int = 512,
    seed: int = 11,
) -> DataFrame:
    """Estimated count per query item: min over the d row counters. The
    sketch is tiny — broadcast — so estimation never shuffles the queries."""
    q = queries.select(
        F.col(col), _cells(col, depth, width, seed).alias("c")
    ).select(col, F.col("c.j").alias("j"), F.col("c.bucket").alias("bucket"))
    return (
        q.join(F.broadcast(sketch), ["j", "bucket"], "left")
        .groupBy(col)
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("est"))
    )


def merge_sketches(
    *sketches: DataFrame, depth: int | None = None, width: int | None = None
) -> DataFrame:
    """Merge Count-Min sketches built with the SAME (depth, width, seed):
    cell-wise addition — the property that makes the sketch the
    constant-memory path at corpus scale (shard sketches in parallel,
    merge d×w-sized results; never re-scan). Missing cells are implicit
    zeros, so a plain union + sum is exact.

    Sketches of DIFFERENT dimensions merge into garbage that silently
    violates the never-underestimate guarantee (a later estimate misses
    the other sketch's cells) — pass ``depth``/``width`` to assert every
    cell is in range, a d×w-sized check."""
    if not sketches:
        raise ValueError("merge_sketches needs at least one sketch")
    u = sketches[0]
    for s in sketches[1:]:
        u = u.unionByName(s)
    merged = u.groupBy("j", "bucket").agg(F.sum("cnt").alias("cnt"))
    if depth is not None or width is not None:
        # materialize the (≤ d×w rows) merged frame BEFORE the validation
        # count — counting the lazy frame would re-run the input sketches'
        # whole lineage (potentially full corpus scans) once for the check
        # and again for every downstream use
        merged = merged.localCheckpoint(eager=True)
        bad = F.lit(False)
        if depth is not None:
            bad = bad | (F.col("j") >= depth) | (F.col("j") < 0)
        if width is not None:
            bad = bad | (F.col("bucket") >= width) | (F.col("bucket") < 0)
        n_bad = merged.filter(bad).count()
        if n_bad:
            raise ValueError(
                f"merge_sketches: {n_bad} cells outside depth={depth}/"
                f"width={width} — the inputs were built with different "
                f"sketch dimensions and their merge is not a valid sketch"
            )
    return merged


# --------------------------------------------------------------- Bloom filter
# Same deterministic md5+affine cell machinery as the Count-Min sketch, so a
# DuckDB oracle reproduces every BIT exactly (q61/q62). Why it matters at
# 100 TB: a selective dimension subset compressed to n_bits of state becomes
# a broadcastable RUNTIME FILTER — the fact-side scan drops non-joining rows
# before the shuffle (Spark's own runtime-filter/DPP machinery generalized
# to any predicate side), at a false-positive (never false-negative) rate of
# ~(1-e^{-kn/m})^k. The bit-set representation is mergeable: union+distinct.


def bloom_bits(
    df: DataFrame,
    col: str,
    n_bits: int = 8192,
    k: int = 4,
    seed: int = 17,
) -> DataFrame:
    """Distinct set bit positions of the Bloom filter over ``df[col]``
    (cast the column to string first — md5 hashing is string-defined).
    Returns at most ``n_bits`` single-column rows regardless of input
    size; shard filters built with the same (n_bits, k, seed) merge by
    union + distinct. Plan: one explode projection + one distinct —
    map-side partial dedup, exchange carries ≤ n_bits rows per task."""
    return (
        df.select(_cells(col, k, n_bits, seed).alias("c"))
        .select(F.col("c.bucket").alias("bit"))
        .distinct()
    )


def bloom_words(bits: DataFrame, n_bits: int = 8192) -> list[int]:
    """Materialize the bit set as ``n_bits/64`` packed SIGNED int64 words
    (bit i → word i//64, bit i%64) — the broadcastable literal form.
    Packed words instead of a '0'/'1' string: an 8 Kbit filter is 128
    longs vs an 8 KiB string literal inlined k times into the generated
    code, whose Janino compile dominated the probe query (A/B'd ~3x on
    q62). The collect is metadata-sized by construction (≤ n_bits rows,
    like the IVF centroid pull)."""
    words = [0] * ((n_bits + 63) // 64)
    for r in bits.collect():
        b = int(r["bit"])
        words[b >> 6] |= 1 << (b & 63)
    # two's complement into signed int64 (Spark array<long> literals)
    return [w - (1 << 64) if w >= (1 << 63) else w for w in words]


def bloom_might_contain(
    col: Column, words: list[int], n_bits: int, k: int = 4, seed: int = 17
) -> Column:
    """Membership predicate (true = maybe present, false = DEFINITELY
    absent): all k bits set. Pure Catalyst — the packed-word array rides
    the plan as one literal; each probe costs ONE md5 word-hash (bound as
    a lambda variable via the 1-element-array let-binding, so the k
    affine remixes reuse it instead of re-evaluating md5 per bit — guide
    §1.2 per-task work, 4× fewer md5 calls per probed row) plus k
    shift-and-mask tests; no UDF, no join, no shuffle. Null inputs yield
    null (filtered like any null predicate)."""
    arr = F.array(*[F.lit(w).cast("long") for w in words])
    A, B = minhash_affine_params(k, seed=seed)

    def probe(h: Column) -> Column:
        pred = F.lit(True)
        for j in range(k):
            b = (((h * int(A[j]) + int(B[j])) % P31) % n_bits).cast("int")
            word = F.element_at(arr, (b / 64).cast("int") + 1)
            pred = pred & (F.getbit(word, b % 64) == 1)
        return pred

    return F.exists(F.array(_word_hash(col)), probe)


def group_numeric_profile(
    df: DataFrame,
    group_col: str,
    value_col: str,
    qs: list[float] = (0.25, 0.5, 0.75, 0.99),
    exact: bool = True,
    accuracy: int = 10000,
) -> DataFrame:
    """Per-group numeric profile: count / min / max / quantiles — the
    data-quality summary pass over a measure column.

    ``exact=True`` uses SQL ``percentile`` (true sorted-order linear
    interpolation — per-group full materialization, right for verification
    and for group cardinalities that fit a task). ``exact=False`` is the
    100 TB path: ``percentile_approx`` (Greenwald-Khanna style sketch) —
    fixed memory per group, MERGEABLE partials so the aggregate combines
    map-side like any sum; error is bounded by 1/accuracy of rank, not of
    value. Same output shape, so callers A/B the two directly."""
    pq_lit = F.array(*[F.lit(float(q)) for q in qs])
    quant = (
        F.percentile(F.col(value_col), pq_lit)
        if exact
        else F.percentile_approx(F.col(value_col), pq_lit, F.lit(accuracy))
    )
    return df.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n"),
        F.min(value_col).alias("min_v"),
        F.max(value_col).alias("max_v"),
        quant.alias("quantiles"),
    )


def hll_registers(
    df: DataFrame, col: str, p: int = 9, seed: int = 11
) -> DataFrame:
    """HyperLogLog register table over ``df[col]`` (Flajolet et al. 2007):
    m = 2^p registers, register j = max over items hashing to j of
    rho(suffix) — the 1-based position of the leftmost 1-bit in the
    (31-p)-bit hash suffix, (31-p)+1 when the suffix is all zeros.

    Like count_min_sketch this is a FIXED-SIZE mergeable aggregate: one
    map-side-combinable max per register, at most m rows out regardless of
    input, and shard sketches merge by register-wise max (never a rescan).
    It is the register-level twin of approx_count_distinct (whose JVM
    HLL++ state is opaque) — exposed so registers can be STORED per
    partition/epoch and re-estimated after any union of shards.

    Determinism: the md5-derived 31-bit hash (``_word_hash``) splits into
    bucket = low p bits, suffix = hv >> p; rho uses integer bit-length
    (length of the binary string), never float log2 — a DuckDB oracle
    reproduces every register exactly (q81). Output: (bucket, r).
    """
    m = 1 << p
    maxbits = 31 - p
    hv = _word_hash(F.col(col))
    w = F.shiftright(hv, p)
    rho = F.when(w == 0, F.lit(maxbits + 1)).otherwise(
        F.lit(maxbits + 1) - F.length(F.bin(w))
    )
    return (
        df.select((hv % m).alias("bucket"), rho.alias("rho"))
        .groupBy("bucket")
        .agg(F.max("rho").cast("int").alias("r"))
    )


def hll_estimate(registers: DataFrame, p: int = 9) -> DataFrame:
    """Cardinality estimate from a register table: the classic HLL
    harmonic mean with the small-range linear-counting correction
    (E < 2.5m and empty registers present -> m*ln(m/V)). Registers absent
    from the table are empty (rho 0). Returns a 1-row (est double) frame;
    the whole computation is one tiny aggregate over <= m rows."""
    import math

    m = 1 << p
    alpha = 0.7213 / (1 + 1.079 / m)
    # 2^-r via integer shift + division: every term is a power of two, so
    # the double sum is EXACT under any summation order/partitioning — the
    # estimate is bit-identical across engines (a libm pow() carries no
    # such guarantee), which is what lets q112 hash-oracle estimates, not
    # just registers
    agg = registers.agg(
        F.sum(
            F.lit(1.0) / F.expr("shiftleft(1L, r)")
        ).alias("s_present"),
        F.count(F.lit(1)).alias("n_present"),
    )
    s = F.col("s_present") + (F.lit(m) - F.col("n_present"))  # empty -> 2^0
    raw = F.lit(alpha * m * m) / s
    zeros = F.lit(m) - F.col("n_present")
    linear = F.lit(float(m)) * F.log(F.lit(float(m)) / zeros)
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (zeros > 0), linear
    ).otherwise(raw)
    return agg.select(est.alias("est"))


def merge_hll(*register_tables: DataFrame) -> DataFrame:
    """Merge HLL sketches built with the SAME (p, seed): register-wise
    max — union semantics, the property that lets every corpus shard
    sketch independently."""
    it = iter(register_tables)
    out = next(it)
    for t in it:
        out = out.unionByName(t)
    return out.groupBy("bucket").agg(F.max("r").cast("int").alias("r"))


def hll_set_algebra(regs_a: DataFrame, regs_b: DataFrame, p: int = 9) -> DataFrame:
    """HLL set algebra over two register tables built with the SAME
    (p, seed): |A| and |B| directly, |A∪B| from the register-wise-max
    merge (the one HLL operation that is lossless), and |A∩B| by
    inclusion-exclusion ``|A|+|B|-|A∪B|`` — the standard audience-overlap
    / shared-vocabulary estimator (Flajolet et al. 2007 §5). The
    intersection inherits the UNION's absolute error, so it is only
    meaningful when the true overlap is not tiny relative to the set
    sizes (and can come out slightly negative on disjoint sets) — that is
    the documented contract of the sketch, not a defect. Everything here
    is three <= m-row aggregates over persisted registers: sets sketched
    once, any pairwise overlap answered later without rescanning data.
    Output: 1 row (est_a, est_b, est_union, est_intersect), every value
    deterministic (exact power-of-two sums — see hll_estimate).
    """
    a = hll_estimate(regs_a, p).select(F.col("est").alias("est_a"))
    b = hll_estimate(regs_b, p).select(F.col("est").alias("est_b"))
    u = hll_estimate(merge_hll(regs_a, regs_b), p).select(
        F.col("est").alias("est_union")
    )
    return (
        a.crossJoin(b)
        .crossJoin(u)
        .select(
            "est_a",
            "est_b",
            "est_union",
            (F.col("est_a") + F.col("est_b") - F.col("est_union")).alias(
                "est_intersect"
            ),
        )
    )


def hist_sketch(
    df: DataFrame,
    value_col: str,
    lo: float,
    hi: float,
    n_bins: int = 64,
) -> DataFrame:
    """Fixed-width histogram sketch over [lo, hi) — the MERGEABLE quantile/
    distribution summary: (bin, n) with out-of-range values clamped into
    the edge bins and NULLs dropped. Like the Count-Min and HLL sketches it
    is a fixed-size, map-side-combinable hash aggregate (one partial row
    per non-empty bin per map task, <= n_bins rows out regardless of input)
    and shard sketches merge by bin-wise addition — the constant-memory
    path to percentiles over 100 TB, vs an exact quantile's full sort.
    Deterministic bin arithmetic, so a DuckDB oracle reproduces every
    counter exactly (q95)."""
    if n_bins < 1:
        raise ValueError(f"n_bins must be >= 1, got {n_bins}")
    if not hi > lo:
        raise ValueError(f"need hi > lo, got [{lo}, {hi})")
    w = (float(hi) - float(lo)) / int(n_bins)
    b = F.floor((F.col(value_col) - F.lit(float(lo))) / F.lit(w)).cast("long")
    bin_ = F.least(F.greatest(b, F.lit(0)), F.lit(int(n_bins) - 1))
    return (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(bin_.alias("bin"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


def merge_hists(*hists: DataFrame) -> DataFrame:
    """Merge histogram sketches built with the SAME (lo, hi, n_bins):
    bin-wise addition — the property that lets every shard sketch
    independently."""
    it = iter(hists)
    out = next(it)
    for t in it:
        out = out.unionByName(t)
    return out.groupBy("bin").agg(F.sum("n").alias("n"))


def hist_quantile(
    hist: DataFrame,
    qs: list[float],
    lo: float,
    hi: float,
    n_bins: int = 64,
    round_to: int = 6,
) -> DataFrame:
    """Estimate quantiles from a ``hist_sketch`` by linear interpolation
    within the bin containing the target rank: for target t = q*N the
    unique bin with ``cum >= t AND cum - n < t`` yields
    ``est = lo + w * (bin + (t - (cum - n)) / n)``. Error is bounded by
    one bin width — the sketch's contract. Output: (q, est).

    The cumulative window is a GLOBAL ordered window over the histogram —
    <= n_bins rows by construction (the whole point of the sketch), so the
    single sorted partition is the contract, not a bottleneck."""
    from pyspark.sql import Window

    w = (float(hi) - float(lo)) / int(n_bins)
    spark = hist.sparkSession
    qdf = spark.createDataFrame([(float(q),) for q in qs], "q double")
    # NOT 'N': Spark's resolver is case-insensitive, 'N' collides with 'n'
    tot = hist.agg(F.sum("n").alias("total"))
    cum = hist.select(
        "bin",
        "n",
        F.sum("n")
        .over(Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0))
        .alias("cum"),
    )
    t = F.col("q") * F.col("total")
    est = F.lit(float(lo)) + F.lit(w) * (
        F.col("bin") + (t - (F.col("cum") - F.col("n"))) / F.col("n")
    )
    return (
        qdf.crossJoin(F.broadcast(tot))
        .join(
            F.broadcast(cum),
            (F.col("cum") >= t) & ((F.col("cum") - F.col("n")) < t),
        )
        .select("q", F.round(est, round_to).alias("est"))
    )


def hll_group_registers(
    df: DataFrame, group_col: str, col: str, p: int = 9, seed: int = 11
) -> DataFrame:
    """PER-GROUP HyperLogLog register tables: ``hll_registers`` keyed by
    ``group_col`` — the approx-distinct-per-group pass (distinct users per
    source, distinct n-grams per shard) as ONE fixed-size-per-group
    map-side-combinable aggregate. Exact countDistinct per group shuffles
    every (group, item) pair; this shuffles at most m=2^p partial rows per
    group per map task and the state per group never exceeds m ints.
    Registers persist/merge like the global sketch (register-wise max
    within the same group). Output: (group_col, bucket, r)."""
    m = 1 << p
    maxbits = 31 - p
    hv = _word_hash(F.col(col))
    w = F.shiftright(hv, p)
    rho = F.when(w == 0, F.lit(maxbits + 1)).otherwise(
        F.lit(maxbits + 1) - F.length(F.bin(w))
    )
    return (
        df.select(group_col, (hv % m).alias("bucket"), rho.alias("rho"))
        .groupBy(group_col, "bucket")
        .agg(F.max("rho").cast("int").alias("r"))
    )


def hll_group_estimate(registers: DataFrame, group_col: str, p: int = 9) -> DataFrame:
    """Per-group cardinality estimates from ``hll_group_registers`` output:
    the same harmonic-mean + linear-counting rule as ``hll_estimate``,
    grouped — one tiny aggregate over <= m rows per group.
    Output: (group_col, est double)."""
    m = 1 << p
    alpha = 0.7213 / (1 + 1.079 / m)
    agg = registers.groupBy(group_col).agg(
        F.sum(
            F.lit(1.0) / F.expr("shiftleft(1L, r)")
        ).alias("s_present"),  # exact powers of two — see hll_estimate
        F.count(F.lit(1)).alias("n_present"),
    )
    s = F.col("s_present") + (F.lit(m) - F.col("n_present"))
    raw = F.lit(alpha * m * m) / s
    zeros = F.lit(m) - F.col("n_present")
    linear = F.lit(float(m)) * F.log(F.lit(float(m)) / zeros)
    est = F.when((raw <= F.lit(2.5 * m)) & (zeros > 0), linear).otherwise(raw)
    return agg.select(group_col, est.alias("est"))


def heavy_hitters(df: DataFrame, col: str, k: int = 50) -> DataFrame:
    """EXACT phi-heavy hitters (all items with count > n/k) in two passes
    and NO full-cardinality shuffle — the Misra-Gries candidate pass +
    exact recount pattern:

    pass 1: every partition runs a weighted Misra-Gries summary with k-1
    counters over its local rows (``mapInPandas``, pandas value_counts per
    Arrow batch, so the Python loop is over DISTINCT items per batch).
    MG guarantees any item with local count > n_p/k survives locally; by
    pigeonhole an item with GLOBAL count > n/k exceeds n_p/k in at least
    one partition, so the unioned candidate set (<= (k-1) x partitions
    tiny rows) is a SUPERSET of the true heavy hitters — the only fact
    the second pass needs.

    pass 2: exact counts for candidates only (broadcast left-semi join —
    the big side never shuffles on the raw item), filtered to > n/k.

    Result is EXACT and partitioning-independent: MG tie-breaking only
    perturbs the candidate superset, and the recount+filter kills every
    false candidate. vs the plain groupBy-count: state is O(k) per task
    instead of O(distinct items), the win when the long tail is the data
    (token frequencies at corpus scale). Output: (item, cnt).
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    cap = k - 1
    import pandas as pd  # noqa: F401 (type hint for readers)

    def mg(batches):
        counters: dict = {}
        for pdf in batches:
            for item, w in pdf[col].dropna().value_counts().items():
                w = int(w)
                if item in counters:
                    counters[item] += w
                elif len(counters) < cap:
                    counters[item] = w
                else:
                    # weighted decrement (Berinde et al. 2010): absorb as
                    # much of w as the current minimum allows, O(cap)
                    d = min(w, min(counters.values()))
                    counters = {
                        i: c - d for i, c in counters.items() if c > d
                    }
                    if w > d and len(counters) < cap:
                        counters[item] = w - d
        import pandas as _pd

        yield _pd.DataFrame({col: list(counters.keys())})

    cand = df.select(col).mapInPandas(mg, schema=df.select(col).schema).distinct()
    total = df.filter(F.col(col).isNotNull()).agg(
        F.count(F.lit(1)).alias("_n")
    )
    return (
        df.join(F.broadcast(cand), col, "left_semi")
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .join(F.broadcast(total), F.col("cnt") * k > F.col("_n"))
        .select(F.col(col).alias("item"), "cnt")
    )


def mad_outliers(
    df: DataFrame,
    group_col: str,
    value_col: str,
    id_cols: list[str],
    k: float = 3.0,
) -> DataFrame:
    """Robust per-group outlier flagging by median absolute deviation:
    flag rows with ``|x - median| > k * MAD`` — the Hampel filter, the
    standard robust alternative to z-scores (mean/stddev break down under
    the very outliers being hunted; median/MAD have a 50% breakdown
    point). The data-quality pass before training-data statistics are
    trusted.

    Plan: two grouped EXACT percentile aggregates (median, then MAD over
    the residuals) joined back onto the rows — AQE broadcasts the
    per-group stats frames (|groups| rows). Exact group percentiles
    materialize a group's values in one task, the same contract as
    group_numeric_profile(exact=True); the fixed-memory 100 TB twin is
    hist_sketch/hist_quantile. Both stats are rounded to 6 decimals
    BEFORE the comparison, so the flag is bit-stable across engines and
    partitionings (k must be exactly representable; default 3.0). NULL
    values keep a NULL flag. Output: id_cols + (group, value, med, mad,
    is_outlier).
    """
    g, v = F.col(group_col), F.col(value_col)
    med = df.groupBy(group_col).agg(
        F.round(F.percentile(v, F.lit(0.5)), 6).alias("med")
    )
    with_med = df.join(med, group_col)
    mad = with_med.groupBy(group_col).agg(
        F.round(
            F.percentile(F.abs(v - F.col("med")), F.lit(0.5)), 6
        ).alias("mad")
    )
    return with_med.join(mad, group_col).select(
        *id_cols,
        g.alias(group_col),
        v.alias(value_col),
        F.col("med"),
        F.col("mad"),
        (F.abs(v - F.col("med")) > F.lit(float(k)) * F.col("mad")).alias(
            "is_outlier"
        ),
    )


def group_minhash(
    df: DataFrame,
    group_col: str,
    item_col: str,
    k: int = 16,
    seed: int = 11,
) -> DataFrame:
    """Per-GROUP MinHash signature: for each group, the k-vector of
    min((A_i·h(item) + B_i) mod p) over the group's item stream — the
    set sketch at the container level (source / shard / crawl-snapshot)
    rather than q17's document level. Signatures of group shards MERGE
    by elementwise min, so this is a plain map-side-combinable aggregate:
    ONE pass, k longs of state per group, never a shingle-set shuffle.

    min() is duplicate-blind, so feeding the raw item multiset (no
    distinct) yields the SET sketch for free. Returns long form
    (group, i, minv) — the join-ready layout for signature comparison.

    Same affine family + md5 base hash as every oracled sketch here
    (exact in BIGINT, reproducible in any SQL engine).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    A, B = minhash_affine_params(k, seed)
    h = _word_hash(F.col(item_col))
    sig = df.groupBy(F.col(group_col).alias("grp")).agg(
        *[
            F.min((h * int(A[i]) + int(B[i])) % P31).alias(f"m{i}")
            for i in range(k)
        ]
    )
    stack = ", ".join(f"{i}, m{i}" for i in range(k))
    return sig.select(
        "grp", F.expr(f"stack({k}, {stack}) AS (i, minv)")
    )


def signature_similarity(sig: DataFrame, k: int) -> DataFrame:
    """Pairwise Jaccard estimates between group signatures: the fraction
    of matching MinHash components (the collision probability IS the
    Jaccard). Input is ``group_minhash`` long form; output
    (grp_a, grp_b, n_eq, est_jaccard) for every unordered group pair.

    The corpus-curation question this answers at 100 TB: which SOURCES
    substantially duplicate each other (mirror crawls, re-uploads) —
    with cost groups²·k on signatures, never touching the corpus again.
    """
    a, b = sig.alias("a"), sig.alias("b")
    return (
        a.join(
            b,
            (F.col("a.i") == F.col("b.i"))
            & (F.col("a.grp") < F.col("b.grp")),
        )
        .groupBy(
            F.col("a.grp").alias("grp_a"), F.col("b.grp").alias("grp_b")
        )
        .agg(
            F.count(
                F.when(F.col("a.minv") == F.col("b.minv"), 1)
            ).alias("n_eq")
        )
        .withColumn(
            "est_jaccard",
            F.round(F.col("n_eq") / F.lit(float(k)), 6),
        )
    )


def sliding_hll_uniques(
    df: DataFrame,
    time_col: str,
    item_col: str,
    window_days: int = 7,
    p: int = 6,
) -> DataFrame:
    """Trailing-window distinct counts per day from MERGEABLE daily HLL
    sketches — "7-day active uniques" at 100 TB without ever re-scanning
    the window: each day's register table (m=2^p ints) is built ONCE
    (map-side-combinable max), and a day's trailing estimate merges the
    registers of calendar days [D-w+1, D] by register-wise max.

    Sliding merge WITHOUT a window function: a range-frame window over
    (bucket, day) would emit rows only for days where that bucket was
    observed, silently dropping a day-(D-3) register from day D's merge
    when the bucket is absent on D. Instead every register row explodes
    into the ≤w calendar days it influences (a w× multiplication of the
    register table — m rows/day, not data rows), semi-joined to observed
    days, then one (day, bucket) max. Exact same semantics as merging
    persisted daily sketches in a serving layer.

    Output: (day DATE, est DOUBLE) per observed day — estimate over the
    trailing ``window_days`` calendar days (missing days contribute
    nothing, matching the calendar-window reading).
    """
    daily = df.select(
        F.to_date(F.col(time_col)).alias("_day"),
        F.col(item_col).cast("string").alias("_it"),
    )
    regs = hll_group_registers(daily, "_day", "_it", p=p)
    days = daily.select(F.col("_day").alias("day")).distinct()
    influence = regs.select(
        F.explode(
            F.expr(
                f"transform(sequence(0, {int(window_days) - 1}),"
                f" i -> date_add(_day, i))"
            )
        ).alias("day"),
        "bucket",
        "r",
    )
    merged = (
        influence.join(days, "day", "left_semi")
        .groupBy("day", "bucket")
        .agg(F.max("r").alias("r"))
    )
    return hll_group_estimate(merged, "day", p=p)

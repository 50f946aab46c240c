"""Event validation with a quarantine side-output.

The reference validates per row (ID length georef_ar_etl/models.py:69-85,
non-empty payload models.py:87-102, FK existence departments.py:120-123),
collects ``(id, message)`` error tuples and *skips* invalid rows — a bad row
never poisons the batch (transformers.py:96-101,143-149). Same semantics
here, as a single declarative split: one predicate stack tags each event
with its first failing rule; valid rows continue, invalid rows flow to a
quarantine DataFrame carrying the reason.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from georef_ar_etl_spark.schemas import DOC_ID_LEN, GROUP_PREFIX_LEN, OPS

# quarantine reasons (stable identifiers, used by tests and the oracle)
BAD_OP = "bad_op"
BAD_ID = "bad_id"
EMPTY_TOKENS = "empty_tokens"
NULL_TOKEN_ELEM = "null_token_element"
EMPTY_AFTER_NORM = "empty_tokens_after_norm"
UNKNOWN_GROUP = "unknown_group"

QUARANTINE_REASONS = (
    BAD_OP, BAD_ID, EMPTY_TOKENS, NULL_TOKEN_ELEM, EMPTY_AFTER_NORM, UNKNOWN_GROUP
)


@dataclass
class ValidatedBatch:
    valid: DataFrame
    quarantined: DataFrame  # original event columns + ``reason``


def tag_invalid(events: DataFrame, dim: DataFrame | None = None) -> DataFrame:
    """Add a ``reason`` column: null for valid events, else the first failing
    rule. Pure column expressions → codegen'd, pushdown-friendly.

    ``dim``: optional broadcast dimension (group_id, ...) for FK-existence
    validation (reference: CachedQuery lookups, context.py:63-146) — events
    whose doc_id prefix has no dimension row are quarantined, never fatal.
    """
    # full upserts must carry valid tokens; a PATCH's null tokens mean "keep
    # the current value" (schemas.OPS contract), so its token rules apply
    # only when the patch actually sets tokens
    is_upsert = F.col("op").isin("insert", "update")
    is_patch = F.col("op") == "patch"
    tok_checked = is_upsert | (is_patch & F.col("tokens").isNotNull())
    reason = (
        F.when(~F.col("op").isin(*OPS), F.lit(BAD_OP))
        .when(F.col("doc_id").isNull() | (F.length("doc_id") != DOC_ID_LEN), F.lit(BAD_ID))
        .when(
            (is_upsert & (F.col("tokens").isNull() | (F.size("tokens") == 0)))
            | (is_patch & F.col("tokens").isNotNull() & (F.size("tokens") == 0)),
            F.lit(EMPTY_TOKENS),
        )
        # EVENT_SCHEMA allows null *elements* (containsNull=True) but state
        # forbids them; an array with a null element must be quarantined here
        # BEFORE the exists(x>0) rule below — exists() is three-valued, so
        # e.g. [1, NULL] would otherwise slip through as "valid" and a
        # [-1, NULL] would evaluate to NULL (not true) and skip the
        # empty-after-norm rule too.
        .when(
            tok_checked & F.exists("tokens", lambda x: x.isNull()),
            F.lit(NULL_TOKEN_ELEM),
        )
        # normalization (drop negatives, strip trailing zeros) yields an empty
        # array iff no element is > 0 — so the post-normalization emptiness
        # check is a cheap JVM predicate here, and the normalization UDF never
        # has to run on the quarantine path
        .when(
            tok_checked & ~F.exists("tokens", lambda x: x > F.lit(0)),
            F.lit(EMPTY_AFTER_NORM),
        )
    )
    tagged = events.withColumn("reason", reason)
    if dim is not None:
        # broadcast hash join against the small dimension — the Spark form of
        # the reference's memoized per-row parent lookups.
        dim_keys = F.broadcast(dim.select(F.col("group_id")).distinct())
        tagged = (
            tagged.withColumn("_grp", F.substring("doc_id", 1, GROUP_PREFIX_LEN))
            .join(dim_keys, F.col("_grp") == dim_keys.group_id, "left_outer")
            .withColumn(
                "reason",
                F.when(
                    F.col("reason").isNull()
                    & (F.col("op") != "delete")
                    & F.col("group_id").isNull(),
                    F.lit(UNKNOWN_GROUP),
                ).otherwise(F.col("reason")),
            )
            .drop("_grp", "group_id")
        )
    return tagged


def split_quarantine(tagged: DataFrame) -> ValidatedBatch:
    """Split a reason-tagged frame into (valid, quarantined)."""
    return ValidatedBatch(
        valid=tagged.filter(F.col("reason").isNull()).drop("reason"),
        quarantined=tagged.filter(F.col("reason").isNotNull()),
    )


# NOTE: the empty-after-normalization rule lives in tag_invalid as a cheap
# JVM predicate (exists(tokens, x>0) decides it without running the UDF) —
# there is deliberately no separate post-normalization validation pass.


def fk_audit(
    relations: list[tuple[str, DataFrame, list[str], DataFrame, list[str]]],
) -> DataFrame:
    """Referential-integrity audit across tables: for each
    ``(name, fact, fact_keys, dim, dim_keys)`` relation, count total fact
    rows, rows whose key is (partly) NULL, and non-null keys with no
    matching dimension row — the FK existence check the reference runs
    per row while loading (georef_ar_etl/departments.py:120-123), lifted
    to a set-level data-quality REPORT instead of a row loop. The report
    is what a 100 TB lake actually wants nightly: per-relation orphan
    counts, not a per-row abort.

    Scale posture: per relation ONE pass over the fact for the row/null
    counts and one anti-join (dim side deduplicated to its key columns —
    broadcastable when small, AQE picks otherwise) feeding a count +
    count-distinct aggregate; relations are independent unions, so Spark
    schedules them concurrently. Output: (relation, n_rows, n_null_key,
    n_orphan_rows, n_orphan_keys), one row per relation.
    """
    if not relations:
        raise ValueError("fk_audit needs at least one relation")
    outs = []
    for name, fact, fact_keys, dim, dim_keys in relations:
        if len(fact_keys) != len(dim_keys) or not fact_keys:
            raise ValueError(
                f"{name}: fact_keys/dim_keys must be same non-zero length"
            )
        kc = [f"__k{i}" for i in range(len(fact_keys))]
        f = fact.select(
            *[F.col(k).alias(a) for k, a in zip(fact_keys, kc)]
        )
        d = dim.select(
            *[F.col(k).alias(a) for k, a in zip(dim_keys, kc)]
        ).distinct()
        null_pred = F.lit(False)
        for a in kc:
            null_pred = null_pred | F.col(a).isNull()
        base = f.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count(F.when(null_pred, 1)).alias("n_null_key"),
        )
        orph = (
            f.filter(~null_pred)
            .join(d, kc, "left_anti")
            .agg(
                F.count(F.lit(1)).alias("n_orphan_rows"),
                F.count_distinct(*[F.col(a) for a in kc]).alias(
                    "n_orphan_keys"
                ),
            )
        )
        outs.append(
            base.crossJoin(orph).select(
                F.lit(name).alias("relation"),
                "n_rows",
                "n_null_key",
                "n_orphan_rows",
                "n_orphan_keys",
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def expect_report(
    df: DataFrame,
    expectations: list[tuple[str, str | None, dict]],
) -> DataFrame:
    """Declarative column-contract check (the Great-Expectations /
    dbt-tests shape): evaluate every expectation over ``df`` and return
    one report row each — ``(expectation, col_name, observed, lo, hi,
    passed)`` — instead of aborting on the first violation (the reference
    aborts per row; a 100 TB nightly wants the full report).

    Kinds: ``not_null`` (observed = null fraction, hi = max_null_frac),
    ``unique`` (observed = duplicate rows, hi = 0 allowed), ``range``
    (observed = out-of-range rows among non-nulls, [lo, hi] = the value
    bounds, pass iff 0), ``in_set`` (observed = rows outside
    ``values``), ``row_count`` (observed = rows, [lo, hi] bounds).

    Scale posture: ONE aggregate pass over the input computes every
    metric (null/violation counters fold into the same map-side-combined
    aggregation; uniqueness adds count-distinct columns to it); the 1-row
    result is pinned with an eager localCheckpoint so assembling the
    per-expectation report re-reads one row, never the corpus.
    """
    if not expectations:
        raise ValueError("expect_report needs at least one expectation")
    aggs = [F.count(F.lit(1)).alias("_n")]
    for i, (kind, col, params) in enumerate(expectations):
        if kind == "not_null":
            aggs.append(F.count(F.when(F.col(col).isNull(), 1)).alias(f"_m{i}"))
        elif kind == "unique":
            aggs.append(F.count_distinct(F.col(col)).alias(f"_m{i}"))
            aggs.append(F.count(F.col(col)).alias(f"_nn{i}"))
        elif kind == "range":
            lo, hi = params["min"], params["max"]
            aggs.append(
                F.count(
                    F.when(
                        F.col(col).isNotNull()
                        & ((F.col(col) < lo) | (F.col(col) > hi)),
                        1,
                    )
                ).alias(f"_m{i}")
            )
        elif kind == "in_set":
            aggs.append(
                F.count(
                    F.when(
                        F.col(col).isNotNull()
                        & ~F.col(col).isin(list(params["values"])),
                        1,
                    )
                ).alias(f"_m{i}")
            )
        elif kind == "row_count":
            pass  # _n covers it
        else:
            raise ValueError(f"unknown expectation kind {kind!r}")
    one = df.agg(*aggs).localCheckpoint(eager=True)

    outs = []
    for i, (kind, col, params) in enumerate(expectations):
        name = F.lit(kind).alias("expectation")
        column = F.lit(col).alias("col_name")
        if kind == "not_null":
            max_frac = float(params.get("max_null_frac", 0.0))
            observed = F.round(
                F.col(f"_m{i}") / F.greatest(F.col("_n"), F.lit(1)), 6
            )
            lo, hi = F.lit(None).cast("double"), F.lit(max_frac)
            passed = observed <= hi
        elif kind == "unique":
            observed = (F.col(f"_nn{i}") - F.col(f"_m{i}")).cast("double")
            lo, hi = F.lit(None).cast("double"), F.lit(0.0)
            passed = observed <= hi
        elif kind == "range":
            observed = F.col(f"_m{i}").cast("double")
            lo, hi = F.lit(float(params["min"])), F.lit(float(params["max"]))
            passed = observed == 0
        elif kind == "in_set":
            observed = F.col(f"_m{i}").cast("double")
            lo, hi = F.lit(None).cast("double"), F.lit(0.0)
            passed = observed <= hi
        else:  # row_count
            observed = F.col("_n").cast("double")
            lo = F.lit(float(params.get("min", 0)))
            hi = F.lit(float(params.get("max", 2**53)))
            passed = (observed >= lo) & (observed <= hi)
        outs.append(
            one.select(
                name, column, observed.alias("observed"),
                lo.alias("lo"), hi.alias("hi"), passed.alias("passed"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def psi_report(
    ref: DataFrame,
    cur: DataFrame,
    col: str,
    lo: float,
    hi: float,
    n_bins: int = 10,
    alert_threshold: float = 0.2,
) -> DataFrame:
    """Population-stability-index drift report between a reference
    snapshot and the current one — the standard "did the feature /
    training-data distribution move" audit between two table versions
    (the natural consumer of ``SnapshotTable.state(epoch=...)`` pairs).

    ``col`` is binned into ``n_bins`` fixed-width bins over [lo, hi)
    (values below/above are clamped into the edge bins; NULLs excluded —
    null-rate drift is ``expect_report``'s job). Proportions are
    Laplace-smoothed (+1 per bin) so empty bins never produce ln(0), and
    PSI = Σ (p−q)·ln(p/q). Fixed-width, not quantile, bins: the bin
    edges must mean the same thing in both snapshots AND in any engine
    re-checking the report — a quantile spine would drift with the data
    it is meant to audit.

    Output: one row per bin (ref_n, cur_n, p_ref, p_cur, psi_term) plus
    the broadcast psi_total and the ``drifted`` verdict
    (psi_total > alert_threshold; 0.2 is the conventional "significant
    shift" line). Per-bin terms are quantized to decimal before the
    total so psi_total is bit-identical under any summation order.

    Scale posture: ONE union scan reduced by a map-side-combinable
    (side, bin) count — 2·n_bins rows leave the scan; everything after
    (spine join, totals window, PSI arithmetic) is bins-sized.
    """
    if n_bins < 2:
        raise ValueError(f"n_bins must be >= 2, got {n_bins}")
    if not hi > lo:
        raise ValueError(f"need hi > lo, got [{lo}, {hi})")

    def binned(df: DataFrame, side: str) -> DataFrame:
        v = F.col(col).cast("double")
        b = (
            F.when(v < lo, 0)
            .when(v >= hi, n_bins - 1)
            .otherwise(F.floor((v - lo) * n_bins / (hi - lo)))
        )
        return df.filter(v.isNotNull()).select(
            F.lit(side).alias("side"), b.cast("int").alias("bin")
        )

    counts = (
        binned(ref, "ref")
        .unionByName(binned(cur, "cur"))
        .groupBy("bin")
        .agg(
            F.count(F.when(F.col("side") == "ref", 1)).alias("ref_n"),
            F.count(F.when(F.col("side") == "cur", 1)).alias("cur_n"),
        )
    )
    spine = ref.sparkSession.range(n_bins).select(
        F.col("id").cast("int").alias("bin")
    )
    full = spine.join(counts, "bin", "left").select(
        "bin",
        F.coalesce("ref_n", F.lit(0)).alias("ref_n"),
        F.coalesce("cur_n", F.lit(0)).alias("cur_n"),
    )
    w = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    p = (F.col("ref_n") + 1) / (F.sum("ref_n").over(w) + n_bins)
    q = (F.col("cur_n") + 1) / (F.sum("cur_n").over(w) + n_bins)
    term = F.round((p - q) * F.log(p / q), 9).cast("decimal(18,9)")
    return (
        full.select(
            "bin",
            "ref_n",
            "cur_n",
            F.round(p, 6).alias("p_ref"),
            F.round(q, 6).alias("p_cur"),
            term.alias("_term"),
        )
        .select(
            "bin",
            "ref_n",
            "cur_n",
            "p_ref",
            "p_cur",
            F.round(F.col("_term"), 6).cast("double").alias("psi_term"),
            F.round(F.sum("_term").over(w), 6)
            .cast("double")
            .alias("psi_total"),
        )
        .withColumn(
            "drifted", F.col("psi_total") > F.lit(float(alert_threshold))
        )
    )


def corr_matrix(
    df: DataFrame,
    cols: dict[str, str],
    scale: int = 2,
) -> DataFrame:
    """Pairwise Pearson correlations over ``cols`` (output name → input
    column) as ONE single-pass aggregate — the data-profiling companion to
    ``expect_report``/``psi_report`` for feature-drift and leakage audits.

    NOT ``F.corr`` per pair (p·(p-1)/2 separate aggregates → Catalyst
    still fuses them, but each uses streaming double accumulation whose
    result depends on row order — irreproducible across partitionings and
    unverifiable cross-engine). Instead every moment (n, Σx, Σx², Σxy) is
    accumulated in EXACT decimal arithmetic (order-insensitive,
    map-side-combinable, one shuffle carrying one partial row per task),
    and the correlation is derived from the exact moments in IEEE double —
    bit-identical on any cluster size, any AQE re-plan, any engine that
    sums the same decimals. ``scale`` must cover the inputs' true decimal
    scale (money/rate columns here are 2dp) or the cast itself quantizes.

    Output: one row per unordered pair — (col_a, col_b, n, corr) with
    corr rounded to 6dp, derived entirely in-plan (explode over the
    single aggregate row; no driver-side math).
    """
    names = list(cols)
    pairs = [(a, b) for i, a in enumerate(names) for b in names[i + 1:]]

    def dec(c):
        return F.col(cols[c]).cast(f"decimal(18,{scale})")

    aggs = [F.count(F.lit(1)).alias("n")]
    for a in names:
        aggs.append(F.sum(dec(a)).alias(f"s_{a}"))
        aggs.append(F.sum(dec(a) * dec(a)).alias(f"ss_{a}"))
    for a, b in pairs:
        aggs.append(F.sum(dec(a) * dec(b)).alias(f"sp_{a}_{b}"))
    one = df.agg(*aggs)

    def d(name):
        return F.col(name).cast("double")

    rows = []
    for a, b in pairs:
        n = d("n")
        num = n * d(f"sp_{a}_{b}") - d(f"s_{a}") * d(f"s_{b}")
        den = F.sqrt(
            (n * d(f"ss_{a}") - d(f"s_{a}") * d(f"s_{a}"))
            * (n * d(f"ss_{b}") - d(f"s_{b}") * d(f"s_{b}"))
        )
        rows.append(
            F.struct(
                F.lit(a).alias("col_a"),
                F.lit(b).alias("col_b"),
                F.col("n").alias("n"),
                F.round(num / den, 6).alias("corr"),
            )
        )
    return one.select(F.explode(F.array(*rows)).alias("p")).select("p.*")


def table_checksum(
    df: DataFrame,
    bucket_col,
    cols: list[str],
    n_buckets: int = 32,
) -> DataFrame:
    """Per-bucket row-count + order-insensitive content checksum — the
    replica-reconciliation primitive (pt-table-checksum's core idea): after
    a CDC pipeline replicates a table, source and replica run this ONE
    aggregate each and compare n_buckets tiny rows instead of shipping
    either table; a mismatched bucket pinpoints where to re-sync.

    Checksum = Σ over rows of (md5(field-string) → 60-bit int → mod 2^40),
    per bucket. Addition makes it order-insensitive and map-side
    combinable (one shuffle of n_buckets·tasks partial rows); the 2^40
    term bound keeps the int64 sum overflow-free to ~8M rows per bucket —
    size ``n_buckets`` so buckets stay under that, the same contract as
    the engine's bucket sizing. Fields are joined with '|' after casting
    floats to fixed-scale decimals UPSTREAM (float→string formatting is
    engine-specific; decimal strings are not).

    Output: (bucket, n, checksum) — n_buckets rows total.
    """
    row_hash = F.pmod(
        F.conv(
            F.substring(F.md5(F.concat_ws("|", *[F.col(c) for c in cols])), 1, 15),
            16,
            10,
        ).cast("long"),
        F.lit(1 << 40),
    )
    b = bucket_col if isinstance(bucket_col, Column) else F.col(bucket_col)
    return (
        df.select(
            F.pmod(b, F.lit(n_buckets)).cast("int").alias("bucket"),
            row_hash.alias("_h"),
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("_h").alias("checksum"),
        )
    )


def repair_plan(
    source: DataFrame,
    replica: DataFrame,
    key: str,
    cols: list[str],
    bucket_col: Column | str,
    n_buckets: int = 32,
    stats: dict | None = None,
) -> DataFrame:
    """Minimal CDC repair batch that converges ``replica`` to ``source`` —
    the acting half of replica reconciliation (pt-table-sync to
    ``table_checksum``'s pt-table-checksum):

    * phase 1 — both sides run the ``table_checksum`` aggregate; only
      buckets whose ``(n, checksum)`` pairs differ continue (the compare is
      a 2·n_buckets-row collect — metadata-sized). Matching buckets are
      PROVEN convergent and never read again.
    * phase 2 — the mismatched buckets' rows full-outer join on ``key``:
      rows missing or value-different in the replica become ``upsert``
      (carrying the source payload), rows extinct in the source become
      ``delete`` (key only, null payload) — exactly the engine's event
      shape, ready for ``apply_batch`` on the replica.

    100 TB posture: phase 1 is one aggregate scan per side with map-side
    combine (n_buckets·tasks partial rows shuffle, never data rows);
    phase 2 reads and shuffles ONLY the mismatched buckets. A healthy
    replica costs two scans and zero data movement; a diverged one costs
    its divergence. Value comparison is null-safe per column (a NULL ≠
    non-NULL difference must repair, NULL == NULL must not).

    ``stats`` (optional) receives ``buckets_mismatched`` /
    ``buckets_checked``. Reference analogue: the reference re-derives whole
    tables to converge them (georef_ar_etl/transformers.py:67-151); this
    ships only the diff.
    """
    b = bucket_col if isinstance(bucket_col, Column) else F.col(bucket_col)
    cs_s = {
        int(r["bucket"]): (int(r["n"]), int(r["checksum"]))
        for r in table_checksum(source, b, cols, n_buckets).collect()
    }
    cs_r = {
        int(r["bucket"]): (int(r["n"]), int(r["checksum"]))
        for r in table_checksum(replica, b, cols, n_buckets).collect()
    }
    mismatched = sorted(
        bk
        for bk in set(cs_s) | set(cs_r)
        if cs_s.get(bk) != cs_r.get(bk)
    )
    if stats is not None:
        stats.update(
            buckets_checked=n_buckets, buckets_mismatched=len(mismatched)
        )
    key_t = source.schema[key].dataType
    if not mismatched:
        return source.sparkSession.createDataFrame(
            [],
            T.StructType(
                [T.StructField("op", T.StringType(), False)]
                + [T.StructField(key, key_t, False)]
                + [
                    T.StructField(f.name, f.dataType, True)
                    for f in source.schema.fields
                    if f.name in cols and f.name != key
                ]
            ),
        )
    in_mm = F.pmod(b, F.lit(n_buckets)).cast("int").isin(mismatched)
    payload = [c for c in cols if c != key]
    s = source.filter(in_mm).select(
        F.col(key).alias("_sk"), *[F.col(c).alias(f"_s_{c}") for c in payload]
    )
    r = replica.filter(in_mm).select(
        F.col(key).alias("_rk"), *[F.col(c).alias(f"_r_{c}") for c in payload]
    )
    j = s.join(r, s["_sk"] == r["_rk"], "full_outer")
    same = F.lit(True)
    for c in payload:
        same = same & F.col(f"_s_{c}").eqNullSafe(F.col(f"_r_{c}"))
    return (
        j.withColumn(
            "op",
            F.when(F.col("_sk").isNull(), "delete").when(
                F.col("_rk").isNull() | ~same, "upsert"
            ),
        )
        .filter(F.col("op").isNotNull())
        .select(
            "op",
            F.coalesce(F.col("_sk"), F.col("_rk")).alias(key),
            *[
                F.when(F.col("op") == "upsert", F.col(f"_s_{c}")).alias(c)
                for c in payload
            ],
        )
    )


def group_linreg(
    df: DataFrame,
    group_cols: list[str],
    x_col: str,
    y_col: str,
    scale: int = 2,
) -> DataFrame:
    """Per-group ordinary-least-squares trend (slope, intercept, r²) as
    ONE exact-decimal moment aggregate — the profiling companion to
    ``corr_matrix`` for per-key drift/trend monitoring (is this user's
    spend rising? is this source's doc length shrinking?).

    Same determinism contract as corr_matrix: n, Σx, Σy, Σx², Σy², Σxy
    accumulate as exact decimals (order-insensitive, map-side combinable,
    one shuffle), the OLS closed form runs on the exact moments in IEEE
    double. Groups with a degenerate x (all equal) yield NULL slope/
    intercept/r². ``scale`` must cover the inputs' decimal scale.

    Output: group_cols + (n, slope, intercept, r2), floats rounded 6dp.
    """
    def dec(c):
        return F.col(c).cast(f"decimal(18,{scale})")

    x, y = dec(x_col), dec(y_col)
    agg = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * x).alias("sxx"),
        F.sum(y * y).alias("syy"),
        F.sum(x * y).alias("sxy"),
    )

    def d(c):
        return F.col(c).cast("double")

    n = d("n")
    vx = n * d("sxx") - d("sx") * d("sx")
    vy = n * d("syy") - d("sy") * d("sy")
    cov = n * d("sxy") - d("sx") * d("sy")
    slope = cov / vx
    intercept = (d("sy") - slope * d("sx")) / n
    r2 = (cov * cov) / (vx * vy)
    ok = vx > 0
    return agg.select(
        *group_cols,
        F.col("n"),
        F.when(ok, F.round(slope, 6)).alias("slope"),
        F.when(ok, F.round(intercept, 6)).alias("intercept"),
        F.when(ok & (vy > 0), F.round(r2, 6)).alias("r2"),
    )

"""Temporal joins Spark lacks as built-ins, expressed Spark-first.

``asof_join`` — for every left row, the latest right row at or before the
left timestamp per key (pandas ``merge_asof`` semantics, the kdb ``aj``).
The naive formulations both fail at scale: a range-join
(``l.t >= r.t``) explodes to O(left × right-history) before taking the
max, and a per-key collect serializes. This is the sort-merge
formulation instead: UNION both sides, ONE shuffle+sort per key, and a
``last(payload, ignorenulls)`` running window carries the most recent
right payload forward onto each left probe — O((L+R) log(L+R)) work, no
pair explosion, no Python on the data path. Skewed keys are plain window
skew, handled by AQE like any hot key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


_EPOCH_NTZ = "1970-01-01 00:00:00"


def _epoch_s(time_col) -> "F.Column":
    """Wall-clock seconds since the epoch via ``timestamp_diff`` over
    TIMESTAMP_NTZ — genuinely timezone-free, unlike ``unix_timestamp``,
    which interprets NTZ values in the SESSION timezone: under a DST
    timezone the epoch axis gets one-hour discontinuities that break both
    bucketing invariants and cross-engine parity. (TZ-typed inputs pass
    through a session-TZ wall-clock cast first — deterministic under the
    engine's pinned UTC, session.py.)"""
    return F.timestamp_diff(
        "SECOND",
        F.lit(_EPOCH_NTZ).cast("timestamp_ntz"),
        time_col.cast("timestamp_ntz"),
    )


def _epoch_us(time_col) -> "F.Column":
    """Microsecond epoch (Spark timestamp precision) — used where exact
    sub-second distances matter (as-of nearest/tolerance), unlike the
    second-truncated axis bucketing uses."""
    return F.timestamp_diff(
        "MICROSECOND",
        F.lit(_EPOCH_NTZ).cast("timestamp_ntz"),
        time_col.cast("timestamp_ntz"),
    )


def time_bucket_s(time_col, seconds: int):
    """Bucket start as epoch seconds (long): timezone-free (see _epoch_s),
    exact, and identical across engines (string-formatting a timestamp is
    where cross-engine comparisons go to die)."""
    return (F.floor(_epoch_s(time_col) / seconds) * seconds).cast("long")


def rollup(
    df: DataFrame,
    time_col: str,
    key_cols: list[str],
    value_col: str,
    bucket_seconds: int,
) -> DataFrame:
    """The hypertable continuous-aggregate LEAF: per (time bucket, keys)
    partials — count / sum / min / max (avg derives as sum/count, so it
    re-aggregates; never materialize avg itself). One hash aggregate with
    map-side combine; ``bucket_s`` becomes the storage partition column of
    the rollup table at scale."""
    return df.groupBy(
        time_bucket_s(F.col(time_col), bucket_seconds).alias("bucket_s"),
        *key_cols,
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(value_col).alias("sum_v"),
        F.min(value_col).alias("min_v"),
        F.max(value_col).alias("max_v"),
    )


def rollup_coarser(
    fine: DataFrame,
    key_cols: list[str],
    bucket_seconds: int,
    fine_seconds: int | None = None,
) -> DataFrame:
    """Re-aggregate a finer rollup into a coarser one — the rollup CHAIN:
    the hour table reads the minute table's partials (counts sum, sums
    sum, mins min, maxs max), NEVER the raw events — which is the entire
    point of materialized rollups at 100 TB: each coarser granularity
    costs O(finer rollup), not O(raw). ``bucket_seconds`` must be a
    multiple of the finer granularity or buckets do not nest and the
    coarser aggregates are silently WRONG — pass ``fine_seconds`` so the
    precondition is enforced, not assumed."""
    if fine_seconds is not None and bucket_seconds % fine_seconds != 0:
        raise ValueError(
            f"bucket_seconds={bucket_seconds} is not a multiple of the "
            f"finer granularity {fine_seconds} — fine buckets would "
            f"straddle coarse boundaries and the rollup would be wrong"
        )
    return fine.groupBy(
        (F.floor(F.col("bucket_s") / bucket_seconds) * bucket_seconds)
        .cast("long")
        .alias("bucket_s"),
        *key_cols,
    ).agg(
        F.sum("n").alias("n"),
        F.sum("sum_v").alias("sum_v"),
        F.min("min_v").alias("min_v"),
        F.max("max_v").alias("max_v"),
    )


def range_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_time: str,
    right_time: str,
    window_seconds: int,
) -> DataFrame:
    """Interval join — right rows with ``left_time <= right_time <
    left_time + window`` per key — WITHOUT the naive theta-join explosion:
    both sides bucketize time into window-sized epochs, the join runs as
    an EQUI join on (key, bucket) over each left row's two candidate
    buckets (an interval of length W overlaps at most 2 W-sized buckets),
    and the exact range predicate refines the bounded candidate set. Join
    fan-out is <= 2 candidate buckets per left row instead of the full
    per-key history — the standard band-join technique Spark's optimizer
    lacks natively. Returns matched (left ⋈ right) rows; aggregate on top.
    """
    if window_seconds < 1:
        raise ValueError(f"window_seconds must be >= 1, got {window_seconds}")
    # buckets from SECOND-truncated wall-clock epochs (_epoch_s — NOT
    # unix_timestamp, whose session-TZ interpretation of NTZ values breaks
    # the <=2-candidate-bucket invariant across DST discontinuities);
    # sub-second precision is irrelevant for bucketing: an interval of W
    # seconds still spans at most 2 W-sized buckets. The refine predicate
    # below compares the raw timestamps EXACTLY — never epoch seconds,
    # which would silently truncate microseconds.
    w = F.lit(window_seconds)
    lb = F.floor(_epoch_s(F.col(left_time)) / w)
    rb = F.floor(_epoch_s(F.col(right_time)) / w)
    l = left.withColumn("_b", F.explode(F.array(lb, lb + 1)))
    r = right.withColumn("_b", rb)
    upper = F.col(f"l.{left_time}") + F.expr(f"INTERVAL {window_seconds} SECONDS")
    cond = (
        (F.col(f"l.{left_key}") == F.col(f"r.{right_key}"))
        & (F.col("l._b") == F.col("r._b"))
        & (F.col(f"r.{right_time}") >= F.col(f"l.{left_time}"))
        & (F.col(f"r.{right_time}") < upper)
    )
    return (
        l.alias("l")
        .join(r.alias("r"), cond)
        .select(
            *[F.col(f"l.{c}") for c in left.columns],
            *[
                F.col(f"r.{c}").alias(f"r_{c}" if c in left.columns else c)
                for c in right.columns
            ],
        )
    )


def sessionize(
    df: DataFrame,
    key_col: str = "user_id",
    time_col: str = "ts",
    gap_seconds: int = 1800,
    order_col: str | None = None,
) -> DataFrame:
    """Gap-based sessionization: a new session starts when the time since
    the key's previous event exceeds ``gap_seconds``. Adds ``session_idx``
    (0-based per key) — the standard lag + running-sum-of-boundaries
    window pair, one shuffle per key, no state store needed for batch /
    replay analytics (the streaming twin is ``session_window``; this is
    the deterministic batch formulation the oracle can mirror).

    ``order_col`` breaks timestamp ties deterministically (pass the event
    sequence column); required for exact cross-engine parity when (key,
    time) is not unique.

    Gap granularity: the comparison runs on SECOND-truncated epochs
    (cross-engine-exact integers), so sub-second timestamps whose true gap
    is within one second above ``gap_seconds`` still merge — boundaries
    are second-granular by contract, not microsecond-granular."""
    if gap_seconds < 1:
        raise ValueError(f"gap_seconds must be >= 1, got {gap_seconds}")
    order = [F.col(time_col).asc()] + (
        [F.col(order_col).asc()] if order_col else []
    )
    w = Window.partitionBy(key_col).orderBy(*order)
    prev = F.lag(time_col).over(w)
    new_session = F.when(
        prev.isNull()
        | (_epoch_s(F.col(time_col)) - _epoch_s(prev) > gap_seconds),
        1,
    ).otherwise(0)
    # derived from w so boundary detection and numbering can never use
    # divergent orderings
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn(
        "session_idx", (F.sum(new_session).over(cum) - 1).cast("int")
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_time: str,
    right_time: str,
    right_cols: list[str],
    tie_col: str | None = None,
    prefix: str = "asof_",
    direction: str = "backward",
    tolerance: int | float | None = None,
) -> DataFrame:
    """Left as-of join: attach to every left row the right row nearest in
    time for the same key, or nulls when no such row exists (pandas
    ``merge_asof`` semantics, all three directions):

    * ``backward`` (default) — greatest ``right_time`` <= ``left_time``;
    * ``forward`` — smallest ``right_time`` >= ``left_time``;
    * ``nearest`` — whichever of the two is closer in absolute time;
      exact-tie distances pick the BACKWARD row (pandas tie-break).

    ``tolerance`` bounds the match distance: a candidate farther than the
    tolerance yields nulls, like merge_asof's ``tolerance``, applied per
    side BEFORE the nearest choice as pandas does. Units: SECONDS when the
    time columns are timestamps (compared microsecond-exact), the column's
    own units when they are numeric epochs.

    Ordering contract: rows AT the probe timestamp match in every
    direction (inclusive); among right rows sharing (key, time), backward
    picks the GREATEST ``tie_col`` (latest event at that instant), forward
    the SMALLEST (earliest event at that instant) — pass the event
    sequence column for deterministic results, or leave None when
    (key, time) is unique.

    Output: every left column plus ``<prefix><col>`` for ``right_cols``.

    Plan shape: still the sort-merge union+window formulation — ONE
    shuffle on the key for any direction; ``nearest`` adds a second
    within-partition sort (the two directions need opposite side orders
    at equal timestamps), never a second exchange.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be backward|forward|nearest, got {direction!r}"
        )
    if "_rt" in right_cols:
        raise ValueError("right_cols may not contain the reserved name '_rt'")
    # null right timestamps can never be "at or before" anything (SQL
    # three-valued semantics; pandas merge_asof drops them too) — without
    # this filter the nulls-first ascending sort would place them at the
    # START of every window frame and carry their payload onto probes that
    # should get no match
    right = right.filter(F.col(right_time).isNotNull())
    # the matched row's own timestamp rides along in the payload ("_rt") —
    # tolerance and nearest-distance need it after the window carry
    payload = F.struct(
        F.col(right_time).alias("_rt"), *[F.col(c) for c in right_cols]
    )
    r = right.select(
        F.col(right_key).alias("_k"),
        F.col(right_time).alias("_t"),
        F.lit(1).alias("_side"),
        (F.col(tie_col) if tie_col else F.lit(0)).cast("long").alias("_tie"),
        payload.alias("_payload"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns],
    )
    l = left.select(
        F.col(left_key).alias("_k"),
        F.col(left_time).alias("_t"),
        F.lit(0).alias("_side"),
        F.lit(None).cast("long").alias("_tie"),
        F.lit(None).cast(
            r.schema["_payload"].dataType
        ).alias("_payload"),
        *left.columns,
    )
    u = r.unionByName(l)
    if direction in ("backward", "nearest"):
        # sort: time asc, then right rows BEFORE left probes at equal time
        # (inclusive semantics), right ties ascending so last() = max tie
        wb = (
            Window.partitionBy("_k")
            .orderBy(F.col("_t").asc(), F.col("_side").desc(), F.col("_tie").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        u = u.withColumn("_mb", F.last("_payload", ignorenulls=True).over(wb))
    if direction in ("forward", "nearest"):
        # the MIRRORED backward formulation: time DESCENDING with a running
        # [unboundedPreceding, currentRow] frame and last(ignorenulls) —
        # the most recently seen right payload is the SMALLEST time >= the
        # probe. A [currentRow, unboundedFollowing] frame with first()
        # would be O(rows²) per key partition (Spark rebuilds an
        # unbounded-following aggregate buffer from scratch per row);
        # this running frame is O(rows). Sort: right rows BEFORE probes
        # at equal time (inclusive), right ties DESC so last() = min tie.
        wf = (
            Window.partitionBy("_k")
            .orderBy(F.col("_t").desc(), F.col("_side").desc(), F.col("_tie").desc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        u = u.withColumn("_mf", F.last("_payload", ignorenulls=True).over(wf))
    probes = u.filter(F.col("_side") == 0)

    # distance axis: microsecond epochs for timestamp columns; for numeric
    # epoch columns, LONG for integral types (a double axis would round
    # int64 epochs above 2^53 — microsecond epochs today are ~1.7e18 — and
    # flip tolerance/nearest comparisons near the boundary) and double
    # only for genuinely fractional time columns
    t_type = left.schema[left_time].dataType
    is_ts = isinstance(t_type, (T.TimestampType, T.TimestampNTZType))
    integral = isinstance(t_type, (T.ByteType, T.ShortType, T.IntegerType, T.LongType))
    if is_ts:
        axis = _epoch_us
    elif integral:
        axis = lambda c: c.cast("long")  # noqa: E731
    else:
        axis = lambda c: c.cast("double")  # noqa: E731
    tol_ax = None
    if tolerance is not None:
        tol_ax = tolerance * 1_000_000 if is_ts else tolerance
    t_probe = axis(F.col("_t"))

    def within(m, dt):
        if tol_ax is None:
            return m
        return F.when(m.isNotNull() & (dt <= F.lit(tol_ax)), m)

    if direction in ("backward", "nearest"):
        mb = within(
            F.col("_mb"), t_probe - axis(F.col("_mb").getField("_rt"))
        )
    if direction in ("forward", "nearest"):
        mf = within(
            F.col("_mf"), axis(F.col("_mf").getField("_rt")) - t_probe
        )
    if direction == "backward":
        match = mb
    elif direction == "forward":
        match = mf
    else:
        db = t_probe - axis(mb.getField("_rt"))
        df_ = axis(mf.getField("_rt")) - t_probe
        match = F.when(
            mb.isNotNull() & (mf.isNull() | (db <= df_)), mb
        ).otherwise(mf)
    return probes.withColumn("_match", match).select(
        *left.columns,
        *[
            F.col("_match").getField(c).alias(f"{prefix}{c}")
            for c in right_cols
        ],
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_bounds: tuple[str, str] = ("s", "e"),
    right_bounds: tuple[str, str] = ("s", "e"),
    bucket_width: int = 64,
) -> DataFrame:
    """Interval × interval OVERLAP join per key — closed intervals, match
    when ``l.start <= r.end AND r.start <= l.end`` — without the theta-join
    explosion Spark would otherwise plan (per-key cross product): both
    sides explode their intervals over ``bucket_width``-sized buckets, the
    join runs as an EQUI join on (key, bucket), and each overlapping pair
    is emitted EXACTLY ONCE by the count-once guard ``bucket ==
    floor(max(l.start, r.start) / W)`` — overlapping intervals both cover
    the bucket of the later start (max(s) <= min(e)), so that bucket is
    the unique canonical meeting point and NO distinct/dedup shuffle is
    needed afterwards. This generalizes ``range_join_bucketed`` (point in
    band) to interval-vs-interval; fan-out per row is len/W + 1 exploded
    copies, so pick W near the typical interval length.

    Contract: bound columns are numeric (cast timestamps to epoch units
    first), all non-key column names must be disjoint across the two
    frames, and rows with start > end are malformed and emit nothing.
    Output: left columns + right columns (key once).
    """
    if bucket_width < 1:
        raise ValueError(f"bucket_width must be >= 1, got {bucket_width}")
    lo_l, hi_l = left_bounds
    lo_r, hi_r = right_bounds
    overlap = set(left.columns) & set(right.columns) - {key}
    if overlap:
        raise ValueError(
            f"non-key columns must be disjoint, both sides carry {sorted(overlap)}"
        )
    w = F.lit(int(bucket_width))
    l = (
        left.filter(F.col(lo_l) <= F.col(hi_l))
        .withColumn(
            "_b",
            F.explode(
                F.sequence(F.floor(F.col(lo_l) / w), F.floor(F.col(hi_l) / w))
            ),
        )
        .alias("l")
    )
    r = (
        right.filter(F.col(lo_r) <= F.col(hi_r))
        .withColumn(
            "_b",
            F.explode(
                F.sequence(F.floor(F.col(lo_r) / w), F.floor(F.col(hi_r) / w))
            ),
        )
        .alias("r")
    )
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col("l._b") == F.col("r._b"))
        & (F.col(f"l.{lo_l}") <= F.col(f"r.{hi_r}"))
        & (F.col(f"r.{lo_r}") <= F.col(f"l.{hi_l}"))
        & (
            F.col("l._b")
            == F.floor(F.greatest(F.col(f"l.{lo_l}"), F.col(f"r.{lo_r}")) / w)
        )
    )
    return l.join(r, cond).select(
        *[F.col(f"l.{c}") for c in left.columns],
        *[F.col(f"r.{c}") for c in right.columns if c != key],
    )


def transition_counts(
    df: DataFrame,
    key_col: str,
    state_col: str,
    order_cols: list[str],
) -> DataFrame:
    """First-order Markov transition statistics over per-key ordered event
    streams: for each key's events ordered by ``order_cols`` (include a
    unique tiebreaker — ties make lead() nondeterministic), count each
    consecutive (src, dst) state pair and attach the row-transition
    probability p = n / sum(n over src). The sequence-mining summary
    behind session-flow analysis and next-event models.

    Plan at 10^10 events: one shuffle on the key for the lead() window,
    then a hash aggregate on (src, dst) whose output is bounded by
    |states|^2 — the probability normalization runs on THAT tiny frame
    (window over src), never on the event stream. Integer/integer division
    happens once per (src, dst) row, so p is cross-engine exact.
    Output: (src, dst, n, p)."""
    w = Window.partitionBy(key_col).orderBy(*order_cols)
    pairs = (
        df.select(
            F.col(state_col).alias("src"),
            F.lead(state_col).over(w).alias("dst"),
        )
        .filter(F.col("dst").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return pairs.select(
        "src",
        "dst",
        "n",
        (F.col("n") / F.sum("n").over(Window.partitionBy("src"))).alias("p"),
    )


def state_runs(
    df: DataFrame,
    key_cols: str | list[str],
    order_col: str,
    state_col: str,
) -> DataFrame:
    """Gaps-and-islands run-length encoding: collapse each key's ordered
    event sequence into maximal runs of consecutive rows sharing the same
    ``state_col`` value — (keys..., state, run_len, first/last order
    value). The sequence-mining complement of ``sessionize`` (which cuts
    on TIME gaps; this cuts on VALUE changes): "user did 7 'view's then a
    'buy'" — the session-shape feature a behavior model trains on, or the
    alert-flap report over a CDC status column.

    Classic island id: within a key, ``row_number() - row_number()
    partitioned additionally by state`` is constant across one run and
    distinct across runs. ``order_col`` must be unique per key (event id,
    not timestamp) or run boundaries are partitioning-dependent.

    Scale posture: ONE shuffle on the key for both window passes (same
    partitioning, Catalyst plans a single Exchange), then a
    map-side-combinable agg keyed by (key, island); nothing ever leaves
    the key's partition. Hot keys are plain window skew (AQE).
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    w_all = Window.partitionBy(*keys).orderBy(order_col)
    w_state = Window.partitionBy(*keys, state_col).orderBy(order_col)
    island = F.row_number().over(w_all) - F.row_number().over(w_state)
    return (
        df.withColumn("_island", island)
        .groupBy(*keys, F.col(state_col).alias("state"), F.col("_island"))
        .agg(
            F.count(F.lit(1)).alias("run_len"),
            F.min(order_col).alias("run_start"),
            F.max(order_col).alias("run_end"),
        )
        .drop("_island")
    )


def decayed_sum(
    df: DataFrame,
    key_cols: str | list[str],
    time_col: str,
    value_col: str,
    as_of: str,
    half_life_s: int,
) -> DataFrame:
    """Recency-weighted aggregate: per key, Σ value·0.5^(age/half_life)
    with age measured back from the fixed ``as_of`` instant — the
    feature-store "decayed count/sum" (user activity scores, trending
    signals) computed as a BATCH aggregate with an explicit reference
    time, so the same query at the same as_of is reproducible forever
    (an implicit now() would make every run a different feature).

    Rows after ``as_of`` are excluded (they have not happened yet at the
    reference instant — including them would leak future signal into a
    training feature). NULL values are excluded like any SQL sum.

    Determinism: the per-row weight is one pow() on a rational exponent
    (identical IEEE inputs in any engine), quantized to 9 dp decimal
    BEFORE the sum — the group total is then exact integer arithmetic,
    bit-identical under any partitioning (q01 money rule).

    Scale posture: pure map + ONE map-side-combinable aggregate; the
    as_of filter pushes down to the scan.
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    if half_life_s < 1:
        raise ValueError(f"half_life_s must be >= 1, got {half_life_s}")
    ref = F.lit(as_of).cast("timestamp")
    age_s = _epoch_s(ref) - _epoch_s(F.col(time_col))
    w = F.pow(F.lit(0.5), age_s / F.lit(float(half_life_s)))
    term = F.round(F.col(value_col) * w, 9).cast("decimal(28,9)")
    return (
        df.filter(F.col(time_col) <= ref)
        .groupBy(*keys)
        .agg(
            F.count(value_col).alias("n"),
            F.round(F.sum(term), 6).cast("double").alias("decayed_sum"),
        )
    )

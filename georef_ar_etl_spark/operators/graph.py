"""Link-graph analytics for web-corpus curation.

PageRank is the classic page-quality prior for crawl filtering (its
original use) and the standard iterative-propagation workload after
connected components (operators/doc_dedup.py) — value propagation with a
damping teleport instead of min-label convergence.

Determinism contract (the same one every oracled operator here honors):
ranks are INTEGER fixed-point units and every update is integer
arithmetic — ``r' = ((100-d)·scale)//100 + (d·(inflow + dangling//n))//100``
with integer division throughout — so the result is bit-identical across
engines, partitionings, and iteration plans. A float PageRank differs at
the last ulp per summation order; the fixed-point one is exactly
reproducible (the DuckDB oracle chains one CTE per iteration, q89).
Integer division leaks ≤1 unit of mass per node per iteration — fine for
a RANKING prior, which only needs a deterministic total order.

Scale posture: per iteration, ONE shuffle keyed by src (contributions)
and one by dst (inflow aggregation, map-side combinable), the dangling
mass is a 1-row broadcast, and lineage is truncated by localCheckpoint
every few rounds exactly like connected_components — 100 iterations at
10^10 edges is 100 bounded shuffles, never a growing plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    n_iter: int = 5,
    damping_pct: int = 85,
    scale: int = 10**9,
    checkpoint_every: int = 2,
) -> DataFrame:
    """Fixed-point PageRank over an edge list (parallel edges count as
    repeated links; self-loops allowed; dangling mass is redistributed
    uniformly). Returns (node, rank_units) with ranks in units of
    ``1/scale``; initial rank = ``scale`` per node.

    ``damping_pct`` is the integer damping percentage (85 = the classic
    0.85). Raises if ``100 * n_nodes * scale`` could overflow int64 —
    shrink ``scale`` for huge graphs (the ranking only needs enough
    fixed-point resolution to order nodes).
    """
    if not 0 < damping_pct < 100:
        raise ValueError(f"damping_pct must be in (0, 100), got {damping_pct}")
    if n_iter < 1:
        raise ValueError(f"n_iter must be >= 1, got {n_iter}")
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    # contract parallel edges ONCE: Σ over parallel (src,dst) links of
    # (r div deg) is exactly m · (r div deg), so every iteration can run on
    # the contracted (src, dst, multiplicity) frame instead of re-scanning
    # and re-joining the raw edge list (1M event-derived rows → ≤ |V|²
    # rows here; and even for simple graphs the raw scan now happens once,
    # not once per iteration). Integer arithmetic is untouched — the
    # multiplication distributes over the already-divided per-link share.
    em = (
        e.groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("m"))
        .localCheckpoint(eager=True)
    )
    nodes = (
        em.select(F.col("src").alias("node"))
        .union(em.select(F.col("dst").alias("node")))
        .distinct()
    )
    deg = em.groupBy("src").agg(F.sum("m").alias("deg"))
    # static frames reused every iteration — evaluate once
    nodes = nodes.localCheckpoint(eager=True)
    deg = deg.localCheckpoint(eager=True)
    n_nodes = nodes.count()
    if n_nodes == 0:
        return nodes.select("node", F.lit(0).cast("long").alias("rank_units"))
    if 100 * n_nodes * scale >= 2**62:
        raise ValueError(
            f"100 * n_nodes({n_nodes}) * scale({scale}) risks int64 overflow; "
            "reduce scale"
        )
    danglers = nodes.join(
        deg.select(F.col("src").alias("node")), "node", "left_anti"
    ).localCheckpoint(eager=True)

    base = (100 - damping_pct) * scale // 100
    r = nodes.select("node", F.lit(scale).cast("long").alias("r"))
    for it in range(n_iter):
        dang = danglers.join(r, "node").agg(
            F.coalesce(F.sum("r"), F.lit(0)).cast("long").alias("dang")
        )
        inflow = (
            em.join(r.withColumnRenamed("node", "src"), "src")
            .join(deg, "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.expr("m * (r div deg)")).cast("long").alias("inflow"))
        )
        r = (
            nodes.join(inflow, "node", "left")
            .crossJoin(F.broadcast(dang))
            .select(
                "node",
                (
                    F.lit(base)
                    + F.expr(
                        f"({damping_pct} * (coalesce(inflow, 0)"
                        f" + dang div {n_nodes})) div 100"
                    )
                ).cast("long").alias("r"),
            )
        )
        if checkpoint_every and (it + 1) % checkpoint_every == 0 and it + 1 < n_iter:
            r = r.localCheckpoint(eager=True)
    return r.select("node", F.col("r").alias("rank_units"))


class KCoreConvergenceError(RuntimeError):
    """Peeling did not reach a fixpoint within max_rounds."""


def k_core(
    edges: DataFrame,
    k: int,
    src_col: str = "src",
    dst_col: str = "dst",
    max_rounds: int = 30,
    broadcast_drop_limit: int = 1_000_000,
) -> DataFrame:
    """k-core decomposition by iterative peeling (Seidman 1983; the
    Batagelj-Zaversnik bulk variant): repeatedly delete every node whose
    degree in the REMAINING undirected simple graph (parallel edges
    collapsed, self-loops dropped) is below ``k`` until none is, and
    return the surviving nodes with their within-core degree. The k-core
    is the unique maximal subgraph of minimum degree >= k — the fixpoint
    does not depend on removal order, so bulk simultaneous peeling (each
    round removes ALL current low-degree nodes) converges to the same
    result as one-at-a-time peeling, and a fixed-unroll SQL oracle can
    mirror it exactly (q111). The standard graph-curation pass for link
    spam / fringe pruning before PageRank-style scoring.

    Scale posture: each round is ONE map-side-combinable degree aggregate
    plus the edge filter. The filter side is chosen by the measured drop
    count the round already paid for: a small dropped set broadcasts as a
    left-anti join (the common case after round 1 — the big edge frame
    never shuffles), while a mass extinction round (> broadcast_drop_limit
    dropped) flips to shuffle semi-joins on the keep side. Lineage is
    truncated every round (localCheckpoint) exactly like
    connected_components/pagerank, so round R never replans rounds < R.
    Rounds are bounded by the peeling depth (the graph's degeneracy
    ordering depth), typically O(10) on web-ish graphs; exceeding
    ``max_rounds`` raises ``KCoreConvergenceError`` — loud, never a
    silently-partial core. Output: (node, core_deg).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if max_rounds < 1:
        raise ValueError(f"max_rounds must be >= 1, got {max_rounds}")
    e = (
        edges.select(F.col(src_col).alias("s"), F.col(dst_col).alias("d"))
        .filter(F.col("s") != F.col("d"))
        .select(F.least("s", "d").alias("u"), F.greatest("s", "d").alias("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    for _ in range(max_rounds):
        deg = (
            e.select(F.col("u").alias("node"))
            .unionAll(e.select(F.col("v").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("core_deg"))
        ).localCheckpoint(eager=True)
        dropped = deg.filter(F.col("core_deg") < k).select("node")
        n_dropped = dropped.count()
        if n_dropped == 0:
            return deg.select("node", F.col("core_deg").cast("long"))
        if n_dropped <= broadcast_drop_limit:
            small = F.broadcast(dropped)
            e = e.join(
                small.withColumnRenamed("node", "u"), "u", "left_anti"
            ).join(small.withColumnRenamed("node", "v"), "v", "left_anti")
        else:
            keep = deg.filter(F.col("core_deg") >= k).select("node")
            e = e.join(
                keep.withColumnRenamed("node", "u"), "u", "left_semi"
            ).join(keep.withColumnRenamed("node", "v"), "v", "left_semi")
        e = e.localCheckpoint(eager=True)
    raise KCoreConvergenceError(
        f"k_core(k={k}) still peeling after {max_rounds} rounds; the "
        "peeling depth exceeds max_rounds — raise it (cost is linear in "
        "rounds) or verify the input graph"
    )


def triangles(
    edges: DataFrame, src_col: str = "src", dst_col: str = "dst"
) -> DataFrame:
    """Exact triangle enumeration (node-iterator++ / compact-forward,
    Schank & Wagner 2005): every unordered {a,b,c} clique of the
    UNDIRECTED simple graph (parallel edges collapsed, self-loops
    dropped), emitted once as (a, b, c) with a < b < c.

    Scale posture — the whole game is bounding wedge generation. Each
    undirected edge is oriented low→high by (degree, node) rank, so every
    wedge is generated at its LOWEST-degree apex: a degree-D hub that
    would naively fan out D² wedges instead receives closures, and the
    per-node wedge work is bounded by its oriented out-degree (≤ √(2·m)
    on any graph — the classic O(m^{3/2}) bound). Three shuffles total:
    degree count (map-side combinable), the wedge self-join keyed by
    apex, and the closing-edge semi-join keyed by (lo, hi). Output order
    normalization (least/greatest by node id) is partition-independent.
    """
    e0 = (
        edges.select(F.col(src_col).alias("u"), F.col(dst_col).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .select(
            F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v")
        )
        .distinct()
    )
    deg = (
        e0.select(F.col("u").alias("node"))
        .union(e0.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    # orient each edge from lower (deg, node) rank to higher; rank structs
    # ride along so wedge endpoints can be re-normalized without a lookup
    ranked = (
        e0.join(deg.withColumnRenamed("node", "u").withColumnRenamed("deg", "du"), "u")
        .join(deg.withColumnRenamed("node", "v").withColumnRenamed("deg", "dv"), "v")
        .select(
            F.struct(F.col("du").alias("d"), F.col("u").alias("n")).alias("ru"),
            F.struct(F.col("dv").alias("d"), F.col("v").alias("n")).alias("rv"),
        )
    )
    oriented = ranked.select(
        F.when(F.col("ru") < F.col("rv"), F.col("ru")).otherwise(F.col("rv")).alias("lo"),
        F.when(F.col("ru") < F.col("rv"), F.col("rv")).otherwise(F.col("ru")).alias("hi"),
    )
    w1, w2 = oriented.alias("w1"), oriented.alias("w2")
    # wedges at the low-rank apex; endpoint pair normalized by rank so the
    # closing lookup matches the oriented edge exactly once
    wedges = w1.join(
        w2,
        (F.col("w1.lo") == F.col("w2.lo")) & (F.col("w1.hi") < F.col("w2.hi")),
    ).select(
        F.col("w1.lo").alias("apex"),
        F.col("w1.hi").alias("p"),
        F.col("w2.hi").alias("q"),
    )
    closed = wedges.join(
        oriented,
        (F.col("p") == F.col("lo")) & (F.col("q") == F.col("hi")),
        "left_semi",
    )
    n = lambda c: F.col(c)["n"]  # noqa: E731
    return closed.select(
        F.least(n("apex"), n("p"), n("q")).alias("a"),
        F.when(
            (n("apex") > F.least(n("apex"), n("p"), n("q")))
            & (n("apex") < F.greatest(n("apex"), n("p"), n("q"))),
            n("apex"),
        )
        .when(
            (n("p") > F.least(n("apex"), n("p"), n("q")))
            & (n("p") < F.greatest(n("apex"), n("p"), n("q"))),
            n("p"),
        )
        .otherwise(n("q"))
        .alias("b"),
        F.greatest(n("apex"), n("p"), n("q")).alias("c"),
    )


def link_prediction(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    max_degree: int | None = None,
    min_common: int = 1,
) -> DataFrame:
    """Neighborhood-overlap link prediction (Liben-Nowell & Kleinberg
    2003): for every NON-adjacent node pair {a, b} of the undirected
    simple graph that shares at least ``min_common`` neighbors, emit

    * ``common``   — |Γ(a) ∩ Γ(b)| (common-neighbors score),
    * ``aa_score`` — Adamic–Adar Σ_w 1/ln(deg(w)), rounded to 6 dp
      (deg(w) ≥ 2 for any common neighbor, so ln is never 0),
    * ``ra_score`` — resource-allocation Σ_w 1/deg(w), rounded to 6 dp.

    The crawl-frontier / citation-recommendation prior: which links are
    MISSING. Reference analogue: the reference's intersection checks
    (georef_ar_etl/geometry.py) ask "which entities touch"; this asks
    "which should".

    Scale posture — wedge generation through an apex w costs deg(w)², so
    hubs dominate: ``max_degree`` drops hub apexes from enumeration
    (the q40 stop-list discipline — a 10^6-degree hub contributes ~0 per
    pair anyway: 1/ln(10^6) ≈ 0.07 spread over 10^12 candidate pairs).
    Three shuffles: degree agg (map-side combinable), the wedge
    self-join keyed by apex, the existing-edge anti-join keyed by the
    pair; the final pair agg rides the anti-join's partitioning.
    """
    if max_degree is not None and max_degree < 2:
        raise ValueError(f"max_degree must be >= 2, got {max_degree}")
    e0 = (
        edges.select(F.col(src_col).alias("u"), F.col(dst_col).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .select(F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v"))
        .distinct()
    )
    adj = e0.union(e0.select(F.col("v"), F.col("u"))).toDF("w", "n")
    deg = adj.groupBy("w").agg(F.count(F.lit(1)).alias("deg"))
    apex = adj.join(deg, "w")
    if max_degree is not None:
        apex = apex.filter(F.col("deg") <= max_degree)
    a1, a2 = apex.alias("a1"), apex.alias("a2")
    wedges = a1.join(
        a2, (F.col("a1.w") == F.col("a2.w")) & (F.col("a1.n") < F.col("a2.n"))
    ).select(
        F.col("a1.n").alias("a"),
        F.col("a2.n").alias("b"),
        F.col("a1.deg").alias("wdeg"),
    )
    non_adjacent = wedges.join(
        e0, (F.col("a") == F.col("u")) & (F.col("b") == F.col("v")), "left_anti"
    )
    return (
        non_adjacent.groupBy("a", "b")
        .agg(
            F.count(F.lit(1)).alias("common"),
            # per-term double → quantize to decimal BEFORE the sum: the
            # group sum is then exact integer arithmetic, bit-identical
            # under any partitioning / summation order (the q01 money rule)
            F.round(
                F.sum(
                    F.round(
                        1.0 / F.log(F.col("wdeg").cast("double")), 9
                    ).cast("decimal(18,9)")
                ),
                6,
            )
            .cast("double")
            .alias("aa_score"),
            F.round(
                F.sum(
                    F.round(1.0 / F.col("wdeg").cast("double"), 9).cast(
                        "decimal(18,9)"
                    )
                ),
                6,
            )
            .cast("double")
            .alias("ra_score"),
        )
        .filter(F.col("common") >= min_common)
    )

"""Similarity search over embedding columns (array<float>).

* ``cosine_topk`` — brute-force exact top-k against a query vector, pure
  higher-order column expressions (zip_with dot product → JVM-side). The
  correctness baseline; O(N) scan, embarrassingly parallel, no shuffle except
  the final top-k, so it scales linearly — but reads every vector.
* ``lsh_bucket_topk`` — random-hyperplane LSH: deterministic seeded
  hyperplanes, sign-bit bucket key; the query probes only its own bucket.
  The 100 TB path: bucket keys become the table's partition column, so a
  probe is a partition-pruned scan of ~N/2^bits vectors.
* ``knn_join_cosine`` — top-k neighbors for EVERY row of a (small) probe set
  via broadcast + per-partition numpy matmul in ``mapInPandas`` (Arrow batch;
  no per-row Python).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from georef_ar_etl_spark.functions.layout import spread_for_compute
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, v: s + v)


def l2norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda s, v: s + v * v))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2norm(a) * l2norm(b))


def quantize_embeddings(
    df: DataFrame, vec_col: str = "embedding", out_col: str = "q"
) -> DataFrame:
    """Symmetric per-vector int8 quantization: ``scale = max(|v|)/127``,
    ``q_i = round(v_i / scale)`` — 4x smaller embedding storage (the
    difference between 100 TB and 25 TB of vectors) with bounded error
    ``<= scale/2`` per component, recoverable via ``dequantize``.

    Pure Catalyst higher-order functions. The scale is materialized as a
    real column FIRST (its max-abs aggregate would otherwise re-run per
    element inside the quantize lambda — the transform-lambda CSE trap).
    Zero vectors get scale 0 and all-zero codes."""
    clash = {out_col, f"{out_col}_scale"} & set(df.columns)
    if clash:
        raise ValueError(
            f"output column(s) {sorted(clash)} already exist — pass a "
            f"different out_col (select would silently emit duplicates)"
        )
    scale = (
        F.aggregate(
            F.col(vec_col), F.lit(0.0), lambda s, v: F.greatest(s, F.abs(v))
        )
        / 127.0
    )
    staged = df.withColumn(f"_{out_col}_scale", scale)
    sc = F.col(f"_{out_col}_scale")
    q = F.when(
        sc == 0.0,
        F.transform(F.col(vec_col), lambda _: F.lit(0).cast("tinyint")),
    ).otherwise(
        F.transform(F.col(vec_col), lambda x: F.round(x / sc).cast("tinyint"))
    )
    return staged.select(
        *df.columns,
        sc.alias(f"{out_col}_scale"),
        q.alias(out_col),
    )


def dequantize(q_col: Column, scale_col: Column) -> Column:
    """Reconstruct float vectors from int8 codes + per-vector scale."""
    return F.transform(q_col, lambda x: x.cast("double") * scale_col)


def cosine_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_to: int = 4,
) -> DataFrame:
    """Exact top-k by cosine similarity to a literal query vector.

    Scores are rounded before ranking (deterministic cross-engine compare);
    ties broken by id.
    """
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = df.select(
        F.col(id_col), F.round(cosine(F.col(vec_col).cast("array<double>"), q), round_to).alias("score")
    )
    return scored.orderBy(F.desc("score"), F.col(id_col)).limit(k)


def hyperplanes(dim: int, n_bits: int, seed: int = 7) -> np.ndarray:
    """Deterministic random hyperplanes (seeded; no wall-clock anywhere)."""
    rng = np.random.RandomState(seed)
    return rng.randn(n_bits, dim).astype(np.float64)


def lsh_bucket_expr(vec_col: Column, planes: np.ndarray) -> Column:
    """Sign-bit bucket key: for each hyperplane, 1 if dot(v, h) > 0 —
    concatenated into a string key. Pure column expressions."""
    bits = []
    for row in planes:
        h = F.array(*[F.lit(float(x)) for x in row])
        bits.append(F.when(dot(vec_col.cast("array<double>"), h) > 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def lsh_bucket_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_bits: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 7,
    round_to: int = 4,
) -> DataFrame:
    """Approximate top-k: rank only vectors in the query's LSH bucket.

    At scale the bucket key is a partition/cluster column → partition-pruned
    scan instead of full scan (the reference's source-side pruning analogue,
    georef_ar_etl/streets.py:24-31).
    """
    planes = hyperplanes(len(query_vec), n_bits, seed)
    qkey = "".join("1" if planes[i] @ np.asarray(query_vec) > 0 else "0" for i in range(n_bits))
    bucketed = df.withColumn("_bucket", lsh_bucket_expr(F.col(vec_col), planes))
    cand = bucketed.filter(F.col("_bucket") == qkey)
    return cosine_topk(cand, query_vec, k, vec_col, id_col, round_to)


def knn_join_cosine(
    corpus: DataFrame,
    probes_pd: pd.DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Top-k corpus neighbors for each probe vector (probe set fits in
    memory → broadcast once per executor, not serialized into every task
    closure; per-partition numpy matmul via mapInPandas, then a global
    top-k per probe)."""
    probe_ids = probes_pd["probe_id"].to_numpy()
    P = np.stack(probes_pd["vec"].to_numpy()).astype(np.float64)
    probes_bc = corpus.sparkSession.sparkContext.broadcast(
        (probe_ids, P / np.linalg.norm(P, axis=1, keepdims=True))
    )

    out_schema = T.StructType([
        T.StructField("probe_id", T.LongType()),
        T.StructField(id_col, T.LongType()),
        T.StructField("score", T.DoubleType()),
    ])

    def part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        probe_ids, Pn = probes_bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            C = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            Cn = C / np.linalg.norm(C, axis=1, keepdims=True)
            sims = Pn @ Cn.T  # (n_probes, n_corpus_batch)
            n_take = min(k, sims.shape[1])
            idx = np.argpartition(-sims, n_take - 1, axis=1)[:, :n_take]
            rows = {
                "probe_id": np.repeat(probe_ids, n_take),
                id_col: pdf[id_col].to_numpy()[idx].ravel(),
                "score": np.take_along_axis(sims, idx, axis=1).ravel(),
            }
            yield pd.DataFrame(rows)

    partial = spread_for_compute(corpus).select(id_col, vec_col).mapInPandas(part, out_schema)
    w = F.row_number().over(
        Window.partitionBy("probe_id").orderBy(F.desc("score"), F.col(id_col))
    )
    return (
        partial.withColumn("rn", w)
        .filter(F.col("rn") <= k)
        .select("probe_id", id_col, F.round("score", 4).alias("score"), F.col("rn").alias("rank"))
    )


def embedding_neardup_pairs(
    df: DataFrame,
    n_bits: int = 6,
    min_cosine: float = 0.9,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 7,
    round_to: int = 4,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: LSH-bucket the vectors with
    seeded hyperplanes, verify cosine only within buckets, dedup symmetric
    pairs with id_a < id_b (the intersections trick again).

    O(pairs-per-bucket), never O(N²): at 100 TB the bucket key doubles as the
    storage partition so each verify task reads one bucket.
    """
    dim = len(df.select(vec_col).first()[0])
    planes = hyperplanes(dim, n_bits, seed)
    b = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("v"),
        lsh_bucket_expr(F.col(vec_col), planes).alias("bucket"),
    )
    l, r = b.alias("l"), b.alias("r")
    pairs = l.join(
        r, (F.col("l.bucket") == F.col("r.bucket")) & (F.col("l.id") < F.col("r.id"))
    )
    score = F.round(
        dot(F.col("l.v"), F.col("r.v"))
        / (l2norm(F.col("l.v")) * l2norm(F.col("r.v"))),
        round_to,
    )
    return (
        pairs.select(
            F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"), score.alias("cosine")
        )
        .filter(F.col("cosine") >= min_cosine)
    )


def mean_pool(
    df: DataFrame,
    group_col: str,
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-group embedding centroid (mean pooling) — the array-aggregation
    pattern done Spark-first: posexplode to (group, pos, x), ONE hash
    aggregate per (group, position) with map-side combine, then reassemble
    the ordered array per group. The shuffle carries (group × dim) partial
    rows, never vectors; compare with collect_list-of-vectors approaches,
    which move every embedding into one reducer per group. Returns
    (group_col, centroid: array<double>, dim).

    Groups whose vectors are ALL null/empty emit NO output row (posexplode
    produces nothing for them — the same convention as SQL unnest); join
    the result back to your group universe if absent-as-null matters."""
    if group_col in ("__pos", "__x"):
        raise ValueError(f"group_col {group_col!r} collides with internal names")
    ex = df.select(
        F.col(group_col), F.posexplode(F.col(vec_col).cast("array<double>"))
    ).toDF(group_col, "__pos", "__x")
    agg = ex.groupBy(group_col, "__pos").agg(F.avg("__x").alias("m"))
    return (
        agg.groupBy(group_col)
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("__pos"), F.col("m")))
            ).alias("_pm")
        )
        .select(
            group_col,
            F.transform(F.col("_pm"), lambda s: s["m"]).alias("centroid"),
            F.size("_pm").alias("dim"),
        )
    )


def _kmeans_lloyd(
    sample: np.ndarray, n_clusters: int, n_iter: int, seed: int
) -> np.ndarray:
    """Seeded Lloyd's k-means on an in-memory sample. Shared by the Spark
    index trainer and the oracle-SQL generator so both produce BIT-IDENTICAL
    centroids from the same sample matrix (empty clusters keep their old
    centroid, ties argmin to the lowest cluster id)."""
    rng = np.random.RandomState(seed)
    C = sample[rng.choice(len(sample), size=min(n_clusters, len(sample)), replace=False)]
    for _ in range(n_iter):
        d = ((sample[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for k in range(len(C)):
            members = sample[assign == k]
            if len(members):
                C[k] = members.mean(axis=0)
    return C


def ivf_index(
    df,
    n_clusters: int = 16,
    n_iter: int = 10,
    sample_size: int = 4096,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 7,
):
    """Deterministic k-means centroids from a seeded sample (numpy Lloyd's).

    The sample is the first ``sample_size`` vectors BY ID — ``orderBy(id)``
    before ``limit``, because a bare limit takes whatever partitions answer
    first and the "seeded" training would silently depend on file layout.

    IVF at scale: centroids are tiny (k×dim) and train on a driver-side
    sample; ASSIGNMENT is distributed. Returns np.ndarray (k, dim).
    """
    rows = (
        df.select(id_col, vec_col).orderBy(id_col).limit(sample_size).collect()
    )
    sample = np.stack([np.asarray(r[1], dtype=np.float64) for r in rows])
    return _kmeans_lloyd(sample, n_clusters, n_iter, seed)


def ivf_index_from_parquet(
    path: str,
    n_clusters: int = 16,
    n_iter: int = 10,
    sample_size: int = 4096,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 7,
):
    """Train the same IVF index without a SparkSession (pyarrow read) — used
    to inline centroid literals into the DuckDB oracle. Must match
    ``ivf_index`` exactly: same ordered sample, same float32→float64
    widening, same kmeans."""
    import pyarrow.parquet as pq

    t = pq.read_table(path, columns=[id_col, vec_col])
    ids = t.column(id_col).to_numpy()
    order = np.argsort(ids, kind="stable")[:sample_size]
    vecs = t.column(vec_col).to_pylist()
    sample = np.stack([np.asarray(vecs[i], dtype=np.float64) for i in order])
    return _kmeans_lloyd(sample, n_clusters, n_iter, seed)


def ivf_assign(df, centroids, vec_col: str = "embedding", id_col: str = "vec_id"):
    """Distributed nearest-centroid assignment (mapInPandas batch matmul)."""
    C = np.asarray(centroids, dtype=np.float64)
    Csq = (C ** 2).sum(axis=1)

    out_schema = T.StructType([
        T.StructField(id_col, T.LongType()),
        T.StructField("cluster", T.IntegerType()),
    ])

    def part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            d = (X ** 2).sum(axis=1)[:, None] - 2 * (X @ C.T) + Csq[None, :]
            yield pd.DataFrame({id_col: pdf[id_col].to_numpy(), "cluster": d.argmin(axis=1).astype("int32")})

    return spread_for_compute(df).select(id_col, vec_col).mapInPandas(part, out_schema)


def probe_clusters(centroids, query_vec: list[float], nprobe: int) -> list[int]:
    """The query's nprobe nearest clusters by squared L2 (ties → lowest id,
    numpy argsort stable order)."""
    C = np.asarray(centroids, dtype=np.float64)
    q = np.asarray(query_vec, dtype=np.float64)
    return [int(p) for p in np.argsort(((C - q) ** 2).sum(axis=1))[:nprobe]]


def ivf_topk(
    df,
    query_vec: list[float],
    centroids,
    k: int = 10,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_to: int = 4,
):
    """IVF probe: rank only vectors assigned to the query's nprobe nearest
    clusters.

    Plan shape: ONE fused mapInPandas scan computes the nearest-centroid
    assignment, drops non-probed rows, and scores the survivors against the
    query — no corpus-side join, no shuffle except the final top-k limit.
    (An earlier version joined the FULL corpus to the assignment frame
    before filtering, paying a whole-corpus shuffle per probe.) At storage
    scale, ``cluster`` (from ivf_assign) is the table's partition column and
    this scan becomes partition-pruned to ~nprobe/n_clusters of the data.
    """
    C = np.asarray(centroids, dtype=np.float64)
    Csq = (C ** 2).sum(axis=1)
    q = np.asarray(query_vec, dtype=np.float64)
    qn = q / np.linalg.norm(q)
    probe = np.asarray(probe_clusters(C, query_vec, nprobe))

    out_schema = T.StructType([
        T.StructField(id_col, T.LongType()),
        T.StructField("score", T.DoubleType()),
    ])

    def part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            d = (X ** 2).sum(axis=1)[:, None] - 2 * (X @ C.T) + Csq[None, :]
            keep = np.isin(d.argmin(axis=1), probe)
            if not keep.any():
                continue
            Xk = X[keep]
            sims = (Xk / np.linalg.norm(Xk, axis=1, keepdims=True)) @ qn
            yield pd.DataFrame({
                id_col: pdf[id_col].to_numpy()[keep],
                "score": sims,
            })

    scored = spread_for_compute(df).select(id_col, vec_col).mapInPandas(part, out_schema)
    # round JVM-side (HALF_UP, like the DuckDB oracle) — np.round is
    # half-even and would disagree with the oracle exactly on the boundary
    return (
        scored.select(id_col, F.round("score", round_to).alias("score"))
        .orderBy(F.desc("score"), F.col(id_col))
        .limit(k)
    )


def ivf_topk_quantized(
    df,
    query_vec: list[float],
    centroids,
    k: int = 10,
    nprobe: int = 4,
    code_col: str = "q",
    scale_col: str = "q_scale",
    id_col: str = "vec_id",
    round_to: int = 4,
):
    """IVF probe over int8-QUANTIZED vectors (``quantize_embeddings``
    output): the fused scan reads codes + per-vector scale instead of the
    float vectors — ~4x fewer input bytes, which is the probe's measured
    bottleneck (the heavy-workload scans are memory-bandwidth-bound on this
    box, BENCH/BASELINE.md). Dequantization (``codes * scale``) happens
    on the fly inside the kernel; the query vector stays float (quantize
    storage, not queries). Same single-scan plan shape as ``ivf_topk``;
    results differ from the float path only by the documented quantization
    error (<= scale/2 per component).

    Zero-scale (all-zero) vectors — which ``quantize_embeddings``
    deliberately emits — are DROPPED inside the kernel: their cosine is
    undefined (0/0 → NaN, which Spark sorts above every real score and
    would silently fill the top-k with junk)."""
    C = np.asarray(centroids, dtype=np.float64)
    Csq = (C ** 2).sum(axis=1)
    q = np.asarray(query_vec, dtype=np.float64)
    qn = q / np.linalg.norm(q)
    probe = np.asarray(probe_clusters(C, query_vec, nprobe))

    out_schema = T.StructType([
        T.StructField(id_col, T.LongType()),
        T.StructField("score", T.DoubleType()),
    ])

    def part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            codes = np.stack(pdf[code_col].to_numpy()).astype(np.float64)
            scales = pdf[scale_col].to_numpy().astype(np.float64)
            X = codes * scales[:, None]
            d = (X ** 2).sum(axis=1)[:, None] - 2 * (X @ C.T) + Csq[None, :]
            keep = np.isin(d.argmin(axis=1), probe) & (scales > 0)
            if not keep.any():
                continue
            Xk = X[keep]
            sims = (Xk / np.linalg.norm(Xk, axis=1, keepdims=True)) @ qn
            yield pd.DataFrame({
                id_col: pdf[id_col].to_numpy()[keep],
                "score": sims,
            })

    scored = spread_for_compute(df).select(id_col, code_col, scale_col).mapInPandas(part, out_schema)
    return (
        scored.select(id_col, F.round("score", round_to).alias("score"))
        .orderBy(F.desc("score"), F.col(id_col))
        .limit(k)
    )


def jl_signs(dim: int, out_dim: int, seed: int) -> list[list[float]]:
    """Deterministic ±1 Johnson–Lindenstrauss sign matrix (Achlioptas
    2003, the dense ±1 variant): sign(i, j) from the md5 parity of
    ``"i:j:seed"`` — a pure function of the coordinates, so any engine
    (and any re-run) regenerates the identical matrix with no RNG state
    to ship (the q32 / q107 no-RNG-state rule)."""
    import hashlib

    return [
        [
            1.0
            if int(
                hashlib.md5(f"{i}:{j}:{seed}".encode()).hexdigest()[:8], 16
            )
            % 2
            == 0
            else -1.0
            for i in range(dim)
        ]
        for j in range(out_dim)
    ]


def random_project(
    df: DataFrame,
    dim: int,
    out_dim: int = 8,
    seed: int = 7,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    round_dp: int = 4,
) -> DataFrame:
    """±1 random projection of an embedding column to ``out_dim``
    components — the cheap JL sketch that makes downstream similarity
    work 8× narrower: project once, then band/bucket/near-dup in the
    small space and verify survivors in the full space (distances are
    preserved within (1±ε) for out_dim = O(log n / ε²)).

    Output is LONG form, one row per (id, j, comp) with
    comp = (Σ_i emb[i]·sign(i,j)) / sqrt(out_dim) rounded to
    ``round_dp`` — long, not an array, so downstream engines (and the
    correctness harness) compare scalar values exactly.

    Scale posture: the sign matrix is a driver-side constant folded into
    the plan (out_dim·dim literals, ~512 doubles — never a join), the
    per-row fold is a JVM higher-order function inside whole-stage
    codegen, and the projection is a pure map: NO shuffle, pipelined
    into whatever consumes it.
    """
    import math

    if out_dim < 1:
        raise ValueError(f"out_dim must be >= 1, got {out_dim}")
    signs = jl_signs(dim, out_dim, seed)
    inv = 1.0 / math.sqrt(out_dim)
    emb = F.col(emb_col).cast("array<double>")
    comps = [
        F.round(
            dot(emb, F.array(*[F.lit(s) for s in row])) * F.lit(inv),
            round_dp,
        )
        for row in signs
    ]
    return df.select(
        F.col(id_col), F.posexplode(F.array(*comps)).alias("j", "comp")
    )

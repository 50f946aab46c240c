"""Document deduplication at corpus scale: exact, MinHash+LSH, SimHash,
n-gram Jaccard.

Scale posture:
* exact dedup — one hash aggregate on a 32-char digest, shuffle carries only
  (digest, doc_id): trivially 100 TB-safe.
* MinHash+LSH — per-doc signatures are computed with higher-order column
  functions (no Python); candidate generation explodes b band keys per doc
  and self-joins on the band bucket, so the shuffle is O(docs × bands), never
  O(docs²); verification runs only on bucket-colliding pairs.
* SimHash — 64-bit signature via a vectorized Arrow/pandas UDF (numpy
  bit-twiddling); near-dup candidates = equal signature bands.
* Jaccard verify — array_intersect/array_union on shingle sets, JVM-side.

All hashing is md5-derived so the DuckDB oracle can reproduce values exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from georef_ar_etl_spark.operators.text import char_shingles, fingerprint, norm_text


# ------------------------------------------------------------------- exact
def exact_duplicates(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Groups of byte-identical (after normalization) documents:
    (fp, n_dups, keep_id) for groups with >1 member; keep_id = min id."""
    return (
        df.select(fingerprint(F.col(text_col)).alias("fp"), F.col(id_col))
        .groupBy("fp")
        .agg(F.count("*").alias("n_dups"), F.min(id_col).alias("keep_id"))
        .filter(F.col("n_dups") > 1)
    )


def dedup_exact(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep one representative (min id) per normalized-text fingerprint."""
    w_keep = (
        df.select(F.col(id_col), fingerprint(F.col(text_col)).alias("fp"))
        .groupBy("fp")
        .agg(F.min(id_col).alias(id_col))
    )
    return df.join(w_keep.select(id_col), id_col, "left_semi")


# ----------------------------------------------------------------- minhash
def _md5_hash32_batch(col: Column, n_hashes: int) -> list[Column]:
    """n_hashes seeded 32-bit hashes using ceil(n/4) md5 calls: one digest per
    seed GROUP, split into four 8-hex-char chunks. 4× fewer md5 evaluations
    than one digest per seed; identical formula in the DuckDB oracle."""
    out: list[Column] = []
    for g in range((n_hashes + 3) // 4):
        digest = F.md5(F.concat_ws(":", col, F.lit(g)))
        for j in range(4):
            if len(out) < n_hashes:
                out.append(
                    F.conv(F.substring(digest, 1 + 8 * j, 8), 16, 10).cast("long")
                )
    return out


# NOTE: earlier column-level minhash_signature/minhash_bands helpers were
# removed — they hashed md5(shingle:seed) per seed, which is INCOMPATIBLE
# with the grouped _md5_hash32_batch scheme used by minhash_lsh_pairs and
# the DuckDB oracle; keeping two silently-divergent signature APIs invited
# mismatches. minhash_lsh_pairs is the single signature implementation.


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 16,
    n_bands: int = 4,
    min_jaccard: float = 0.6,
    shingle_k: int = 3,
) -> DataFrame:
    """Near-duplicate pairs via MinHash LSH, verified with true Jaccard.

    Returns (id_a, id_b, jaccard) with id_a < id_b (the reference's
    symmetric-pair dedup trick, georef_ar_etl/intersections.py:55).

    Scale shape: shingles are EXPLODED once and all n_hashes seeded hashes are
    computed per shingle row in a single projection, then min-aggregated per
    doc (hash aggregate with map-side combine). This is one pass over
    O(docs × shingles) rows — NOT n_hashes nested array traversals, which
    re-evaluate the shingle expression per seed and collapse at scale.
    """
    rows_per_band = n_hashes // n_bands
    # materialization boundaries: (a) normalized text as a persisted column so
    # the regexp is NOT re-evaluated per shingle position inside transform(),
    # (b) shingle sets persisted (reused by the two verification joins),
    # (c) signatures persisted (reused by both sides of the band self-join).
    normed = df.select(F.col(id_col).alias("id"), norm_text(F.col(text_col)).alias("t")).persist()
    base = normed.select(
        "id", char_shingles(F.col("t"), shingle_k, pre_normalized=True).alias("sh")
    ).persist()
    ex = base.select("id", F.explode("sh").alias("s"))
    hashed = ex.select(
        "id",
        *[h.alias(f"h{i}") for i, h in enumerate(_md5_hash32_batch(F.col("s"), n_hashes))],
    )
    sig = hashed.groupBy("id").agg(
        *[F.min(f"h{i}").alias(f"h{i}") for i in range(n_hashes)]
    ).persist()
    band_keys = [
        F.md5(
            F.concat_ws(
                ",", F.lit(b), *[F.col(f"h{b * rows_per_band + r}") for r in range(rows_per_band)]
            )
        )
        for b in range(n_bands)
    ]
    bands = sig.select("id", F.explode(F.array(*band_keys)).alias("band"))
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(b, (F.col("a.band") == F.col("b.band")) & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    sh_a = base.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
    sh_b = base.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
    jac = F.size(F.array_intersect("sh_a", "sh_b")) / F.size(F.array_union("sh_a", "sh_b"))
    return (
        cand.join(sh_a, "id_a").join(sh_b, "id_b")
        .withColumn("jaccard", F.round(jac, 6))
        .filter(F.col("jaccard") >= min_jaccard)
        .select("id_a", "id_b", "jaccard")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    block_col: str | None = "source",
    min_jaccard: float = 0.5,
    shingle_k: int = 3,
) -> DataFrame:
    """Blocked all-pairs n-gram Jaccard (exact, within blocking key).

    The blocking column bounds the O(N²) the way the reference bounds its
    spatial self-join per province (georef_ar_etl/intersections.py:29-40);
    at scale, combine with LSH instead of a raw blocked self-join.
    """
    normed = df.select(
        F.col(id_col).alias("id"),
        (F.col(block_col) if block_col else F.lit(1)).alias("blk"),
        norm_text(F.col(text_col)).alias("t"),
    ).persist()
    base = normed.select(
        "id", "blk", char_shingles(F.col("t"), shingle_k, pre_normalized=True).alias("sh")
    ).persist()
    a, b = base.alias("a"), base.alias("b")
    pairs = a.join(b, (F.col("a.blk") == F.col("b.blk")) & (F.col("a.id") < F.col("b.id")))
    jac = F.size(F.array_intersect("a.sh", "b.sh")) / F.size(F.array_union("a.sh", "b.sh"))
    return (
        pairs.select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.round(jac, 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= min_jaccard)
    )


# ----------------------------------------------------------------- simhash
def simhash_signatures(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """64-bit SimHash per document — pure Catalyst, no Python on the data path.

    Token hash = first 16 hex chars of md5(token) (two 32-bit halves so the
    conv→long cast never overflows); bit votes weighted by token occurrence
    (explode keeps duplicates); sign of each per-bit vote sum forms the
    signature. The whole thing is one explode → 64-column hash aggregate
    (map-side partial combine), so it scales like a word count — the
    previous implementation called Python ``hashlib.md5`` once per TOKEN
    inside a pandas UDF, a per-row kernel that collapses at corpus scale.
    md5-derived on purpose: the DuckDB oracle reproduces every bit
    (plans/queries.py _simhash_sql). Documents with no tokens (empty or
    null text) get signature 0.

    Returns (id, sig) with sig as a signed 64-bit (two's complement).
    """
    toks = (
        df.select(F.col(id_col).alias("id"), F.explode(F.split(F.lower(text_col), r"\s+")).alias("tok"))
        .filter(F.col("tok") != "")
    )
    digest = F.md5(F.col("tok"))
    halves = toks.select(
        "id",
        F.conv(F.substring(digest, 1, 8), 16, 10).cast("long").alias("hi"),
        F.conv(F.substring(digest, 9, 8), 16, 10).cast("long").alias("lo"),
    )
    votes = halves.groupBy("id").agg(
        *[
            F.sum(
                F.when(
                    F.shiftright(F.col("lo" if i < 32 else "hi"), i % 32)
                    .bitwiseAND(F.lit(1)) == 1,
                    1,
                ).otherwise(-1)
            ).alias(f"v{i}")
            for i in range(64)
        ]
    )
    sig = F.lit(0).cast("long")
    for i in range(64):
        bit = F.when(
            F.col(f"v{i}") > 0, F.shiftleft(F.lit(1).cast("long"), i)
        ).otherwise(F.lit(0).cast("long"))
        sig = sig.bitwiseOR(bit)
    with_sig = votes.select("id", sig.alias("sig"))
    # docs with zero tokens never reach the aggregate → signature 0
    return (
        df.select(F.col(id_col).alias("id"))
        .join(with_sig, "id", "left")
        .select("id", F.coalesce("sig", F.lit(0).cast("long")).alias("sig"))
    )


def simhash_candidates(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", band_bits: int = 16
) -> DataFrame:
    """Near-dup candidate pairs: docs sharing any of the 64/band_bits SimHash
    bands (Hamming-proximity search by banding)."""
    n_bands = 64 // band_bits
    sig = simhash_signatures(df, text_col, id_col)
    bands = sig.select(
        "id",
        "sig",
        F.explode(
            F.array(*[
                F.concat_ws(
                    ":",
                    F.lit(i),
                    F.shiftrightunsigned(F.col("sig"), i * band_bits)
                    .bitwiseAND(F.lit((1 << band_bits) - 1))
                    .cast("string"),
                )
                for i in range(n_bands)
            ])
        ).alias("band"),
    )
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(b, (F.col("a.band") == F.col("b.band")) & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )

"""Document deduplication at corpus scale: exact, MinHash+LSH, SimHash,
n-gram Jaccard.

Scale posture:
* exact dedup — one hash aggregate on a 32-char digest, shuffle carries only
  (digest, doc_id): trivially 100 TB-safe.
* MinHash+LSH — per-doc signatures + band keys in one vectorized Arrow
  kernel (31-bit polynomial gram hashes, affine minhash family); ONE
  shuffle of (id, text, band) rows, O(docs × bands), never O(docs²);
  verification is an all-pairs matmul inside each band group.
* SimHash — 64-bit signature as a pure-Catalyst explode → md5 → 64-column
  bit-vote aggregate; near-dup candidates = equal signature bands.
* Jaccard verify — vectorized membership-matrix matmul per band group.

All hashing is either md5-derived or plain 31/61-bit modular arithmetic, so
the DuckDB oracles reproduce every value exactly.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from georef_ar_etl_spark.functions.layout import spread_for_compute
from georef_ar_etl_spark.operators.text import (
    char_shingles,
    fingerprint,
    norm_text,
    winnow_fingerprints_udf,
)


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
def minhash_affine_params(n_hashes: int, seed: int = 11):
    """Seeded affine constants (A_i, B_i) over GF(2^31-1) for the minhash
    family h_i(x) = (A_i·x + B_i) mod p. Deterministic: the DuckDB oracle
    inlines the identical values (plans/queries._minhash_sql)."""
    import numpy as np

    rng = np.random.RandomState(seed)
    p = (1 << 31) - 1
    A = rng.randint(1, p, size=n_hashes).astype(np.uint64)
    B = rng.randint(0, p, size=n_hashes).astype(np.uint64)
    return A, B


# NOTE: earlier column-level minhash_signature/minhash_bands helpers and the
# md5-grouped hash scheme were removed — one signature implementation
# (minhash_lsh_pairs + minhash_affine_params) avoids silently-divergent
# signature APIs, and the polynomial/affine family is both cheaper than md5
# and reproducible with plain arithmetic in the oracle.


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 16,
    n_bands: int = 4,
    min_jaccard: float = 0.6,
    shingle_k: int = 3,
) -> DataFrame:
    """Near-duplicate pairs via MinHash LSH, verified with true Jaccard over
    the k-gram hash sets.

    Returns (id_a, id_b, jaccard) with id_a < id_b (the reference's
    symmetric-pair dedup trick, georef_ar_etl/intersections.py:55).

    Hashing: 31-bit polynomial rolling k-gram hashes (mod the Mersenne prime
    2^31-1) remixed per minhash seed with affine transforms over the same
    field — the universal-hash construction. Everything stays below 2^63,
    exact in numpy uint64 AND in DuckDB BIGINT, so the oracle reproduces
    every value with plain arithmetic. (A previous md5-based scheme was
    oracle-reproducible too, but the 2 md5 + 8 base-16 conv per shingle
    dominated the operator's runtime — measured ~6 s of the 9 s total at
    sf0.1.)

    Plan shape — two Arrow kernels and ONE shuffle:
    1. ``sig_partition``: per doc, vectorized gram hashes → n_hashes affine
       mins → n_bands band-key strings; emits (id, t, band) rows.
    2. shuffle by band (explicit partition count: the frame is tens of MB,
       AQE would coalesce it onto one Python worker, but the verify is
       CPU-bound).
    3. ``verify_partition``: per band group, all-pairs Jaccard via one
       membership-matrix matmul; emits raw ratios, rounded and thresholded
       JVM-side.
    The shuffle moves each doc's normalized TEXT once per band — a
    candidate-pair join would move two shingle-set arrays per candidate
    pair (~25× more bytes on the synthetic corpus, where banding yields
    ~12 candidate pairs per doc). Scale contract: a band group must fit in
    one task (the copartitioned-merge contract); pathological hot bands are
    the LSH-parameter tuning signal.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    from georef_ar_etl_spark.operators.text import (
        P31,
        poly_kgram_hashes_p31,
        poly_powers_p31,
    )

    rows_per_band = n_hashes // n_bands
    # signature compute is per-row numpy — parallelism must come from
    # cores, not the input file layout (no-op on well-partitioned input)
    normed = spread_for_compute(df).select(
        F.col(id_col).alias("id"), norm_text(F.col(text_col)).alias("t")
    )
    id_type = df.schema[id_col].dataType
    band_schema = T.StructType([
        T.StructField("id", id_type),
        T.StructField("t", T.StringType()),
        T.StructField("band", T.StringType()),
    ])
    out_schema = T.StructType([
        T.StructField("id_a", id_type),
        T.StructField("id_b", id_type),
        T.StructField("jaccard_raw", T.DoubleType()),
    ])
    powers = poly_powers_p31(shingle_k)
    A, B = minhash_affine_params(n_hashes)
    k = shingle_k

    def grams(s: str) -> np.ndarray:
        # short texts are space-padded to one full k-gram so every doc has a
        # non-empty gram multiset (the oracle pads identically)
        if s is None:
            s = ""
        if len(s) < k:
            s = s.ljust(k)
        b = np.frombuffer(s.encode("utf-8", "ignore"), dtype=np.uint8).astype(np.uint64)
        return poly_kgram_hashes_p31(b, k, powers)

    def sig_partition(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            ids, texts, bands_out = [], [], []
            for i, s in zip(pdf["id"].to_numpy(), pdf["t"].to_numpy()):
                H = grams(s)
                # affine remix per seed: H*A+B < 2^62 + 2^31, exact in uint64
                sig = ((H[None, :] * A[:, None] + B[:, None]) % P31).min(axis=1)
                for bi in range(n_bands):
                    band_vals = sig[bi * rows_per_band:(bi + 1) * rows_per_band]
                    ids.append(i)
                    texts.append(s)
                    bands_out.append(f"{bi}:" + ",".join(str(int(v)) for v in band_vals))
            yield pd.DataFrame({"id": ids, "t": texts, "band": bands_out})

    grouped = normed.mapInPandas(sig_partition, band_schema)

    def verify_partition(batches):
        # one Python invocation per PARTITION, not per band group: band
        # groups are mostly tiny (singletons don't verify at all), and a
        # per-group applyInPandas pays ~ms of pandas overhead per group —
        # measured slower than the pair-join it replaced. All groups of a
        # partition are processed with numpy slicing after one sort.
        chunks = [c for c in batches if len(c)]
        if not chunks:
            return
        pdf = pd.concat(chunks, ignore_index=True)
        pdf = pdf.sort_values(["band", "id"], kind="stable")
        bnd = pdf["band"].to_numpy()
        ids_all = pdf["id"].to_numpy()
        texts = pdf["t"].to_numpy()
        # a doc arrives once per band; memoize its gram set by id so the
        # CPU-bound hashing runs once per unique doc, not once per band-row
        set_cache: dict = {}
        sets_all = np.empty(len(pdf), dtype=object)
        for i, s in enumerate(texts):
            doc = ids_all[i]
            got = set_cache.get(doc)
            if got is None:
                got = set_cache[doc] = np.unique(grams(s))
            sets_all[i] = got
        starts = np.flatnonzero(np.concatenate(([True], bnd[1:] != bnd[:-1])))
        ends = np.append(starts[1:], len(pdf))
        out_a, out_b, out_j = [], [], []
        for gs, ge in zip(starts, ends):
            n = ge - gs
            if n < 2:
                continue
            ids = ids_all[gs:ge]
            sets = sets_all[gs:ge]
            lens = np.fromiter((len(s) for s in sets), dtype=np.int64, count=n)
            flat = np.concatenate(sets)
            uniq, inv = np.unique(flat, return_inverse=True)
            M = np.zeros((n, len(uniq)), dtype=np.float32)
            M[np.repeat(np.arange(n), lens), inv] = 1.0
            inter = (M @ M.T).astype(np.float64)
            sizes = lens.astype(np.float64)
            union = sizes[:, None] + sizes[None, :] - inter
            ia, ib = np.triu_indices(n, 1)
            # raw ratio of exact small ints: bit-identical to the JVM's and
            # DuckDB's double division; rounding happens ONCE, JVM-side
            out_a.append(ids[ia])
            out_b.append(ids[ib])
            out_j.append(inter[ia, ib] / union[ia, ib])
        if out_a:
            yield pd.DataFrame({
                "id_a": np.concatenate(out_a),
                "id_b": np.concatenate(out_b),
                "jaccard_raw": np.concatenate(out_j),
            })

    # explicit partition count: the band-rows frame is only tens of MB, so
    # AQE would coalesce a bare repartition("band") into one or two
    # partitions and serialize the whole verify into one Python worker —
    # but the verify is CPU-bound (a matmul per band group), not byte-bound
    sess = df.sparkSession
    n_part = int(sess.conf.get("spark.sql.shuffle.partitions", "200"))
    verified = grouped.repartition(n_part, "band").mapInPandas(
        verify_partition, out_schema
    )
    return (
        verified
        .withColumn("jaccard", F.round("jaccard_raw", 6))
        .filter(F.col("jaccard") >= min_jaccard)
        # a pair colliding in several bands verifies identically in each —
        # keep one
        .dropDuplicates(["id_a", "id_b"])
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
    )
    a, b = base.alias("a"), base.alias("b")
    pairs = a.join(b, (F.col("a.blk") == F.col("b.blk")) & (F.col("a.id") < F.col("b.id")))
    jac = F.size(F.array_intersect("a.sh", "b.sh")) / F.size(F.array_union("a.sh", "b.sh"))
    out = (
        pairs.select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.round(jac, 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= min_jaccard)
        # eager small result → the cached normalized text is released before
        # return (shingle arrays are recomputed per join side, cheaper than
        # columnar-caching them — see minhash_lsh_pairs)
        .localCheckpoint(eager=True)
    )
    normed.unpersist()
    return out


def set_similarity_join(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_jaccard_pct: int = 50,
    shingle_k: int = 8,
    checkpoint: bool = True,
) -> DataFrame:
    """EXACT set-similarity self-join with prefix filtering (the
    AllPairs / PPJoin family — Bayardo et al. WWW'07, Chaudhuri et al.
    ICDE'06): every pair of docs whose shingle-set Jaccard ≥ τ, with NO
    false negatives and NO blocking key — the exact counterpart of the
    MinHash ESTIMATE pipeline (q17) and the unblocked replacement for the
    O(block²) baseline (q36).

    Algorithm. Under any global token order, two sets with ``|a∩b| ≥ α``
    must collide within their first ``L - α + 1`` tokens (if all common
    tokens sat past one side's prefix, that suffix — only ``α-1`` long —
    couldn't hold them). Jaccard ≥ τ implies ``|a∩b| ≥ ⌈τ·L⌉`` for EACH
    side's L (union ≥ max(La,Lb)), so per-set prefixes of length
    ``L - ⌈τ·L⌉ + 1`` suffice. The global order is ascending document
    frequency — prefixes are each doc's RAREST tokens, which is both the
    candidate-count minimizer and the shuffle-skew guard (the hot token
    everyone shares sits at the END of every ordered set, never in a
    prefix).

    Scale posture: one map-side-combinable df count; one corpus shuffle
    keyed by token to attach df; one per-doc array_sort (no global rank —
    the (df, token) pair IS the order, so no single-partition window);
    the candidate join moves only prefix tokens; exact verification joins
    each candidate id back to its full sorted set (arrays are distinct,
    so ``array_intersect`` sizes are exact set overlap). The τ threshold
    is applied in INTEGER arithmetic (``100·I ≥ pct·(La+Lb-I)``) so the
    keep/drop decision is bit-identical across engines; the reported
    jaccard is display-rounded after the decision.

    Reference parity: the reference deduplicates entities by exact
    name-set equality per province (georef_ar_etl/utils.py:52-76); this
    is the graded similarity generalization a corpus pipeline needs.
    """
    if not 0 < min_jaccard_pct <= 100:
        raise ValueError(f"min_jaccard_pct must be in (0,100], got {min_jaccard_pct}")
    pct = int(min_jaccard_pct)
    normed = df.select(
        F.col(id_col).alias("id"), norm_text(F.col(text_col)).alias("t")
    )

    # shingle strings → 60-bit ints up front (md5-derived so an oracle can
    # reproduce them): every downstream explode/join/sort/intersect moves
    # 8-byte longs instead of k-char strings. The shingle+hash pass runs
    # as a pandas kernel (guide §4.2 — only (id, t) crosses the boundary):
    # python char slicing is O(k) where the JVM substring walks UTF8 from
    # offset 0, grams dedup BEFORE hashing, and
    # int.from_bytes(md5(g).digest()[:8]) >> 4 IS int(hexdigest[:15], 16)
    # — the identical 60-bit value the oracle's conv(substr(md5,1,15))
    # computes, for any input (md5 runs over UTF8 bytes in both engines).
    # Measured ~4× over the md5+conv expression chain on the sf1.0 corpus.
    # Hash collisions collapse identically on both engines (np.unique ≡
    # the old post-hash array_distinct; downstream only uses the SET).
    k_ = int(shingle_k)

    def _shingle_hash(it):
        import hashlib

        import numpy as np
        import pandas as pd

        md5, fb = hashlib.md5, int.from_bytes
        for pdf in it:
            out = []
            for t in pdf["t"]:
                if t is None:
                    out.append(None)
                    continue
                n = len(t) - (k_ - 1)
                grams = (
                    {t[i : i + k_] for i in range(n)} if n >= 1 else {t}
                )
                vals = np.fromiter(
                    (fb(md5(g.encode()).digest()[:8], "big") >> 4 for g in grams),
                    np.uint64,
                    count=len(grams),
                )
                out.append(np.unique(vals.astype(np.int64)))
            yield pd.DataFrame({"id": pdf["id"], "sh": out})

    sets_ = (
        spread_for_compute(normed)
        .mapInPandas(_shingle_hash, "id long, sh array<long>")
        .persist()
    )
    toks = sets_.select("id", F.explode("sh").alias("tok"))
    tok_df = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    # ascending-(df, token) global order, realized per doc by array_sort
    # over (df, tok) structs — struct comparison is lexicographic, so no
    # corpus-wide rank assignment (and no all-vocab-in-one-window stage)
    ordered = (
        toks.join(tok_df, "tok")
        .groupBy("id")
        .agg(F.array_sort(F.collect_list(F.struct("df", "tok"))).alias("st"))
        .select(
            "id",
            F.transform("st", lambda s: s["tok"]).alias("toks"),
            F.size("st").alias("len"),
        )
        .persist()
    )
    # prefix length L - ceil(pct·L/100) + 1, all-integer ceil
    plen = (
        F.col("len") - F.floor((F.col("len") * pct + 99) / 100).cast("int") + 1
    )
    pref = ordered.select(
        "id",
        "len",
        F.posexplode(F.slice("toks", F.lit(1), plen)).alias("pos", "tok"),
    )
    a, b = pref.alias("a"), pref.alias("b")
    # positional filter (PPJoin, Xiao et al. WWW'08): common tokens appear
    # in the same relative order on both sides (same global order), so at
    # the FIRST shared token the whole overlap fits in the remaining
    # suffixes: I ≤ 1 + min(La−pa−1, Lb−pb−1). Emissions violating the
    # bound can't be a pair's first shared token — and every true pair's
    # first shared token sits inside both prefixes (the prefix lemma's
    # witness IS the globally-minimal common token), so filtering each
    # emission keeps at least that witness: zero false negatives.
    max_i = 1 + F.least(
        F.col("a.len") - F.col("a.pos") - 1, F.col("b.len") - F.col("b.pos") - 1
    )
    # candidate dedup is a groupBy (same single shuffle the old distinct()
    # paid) that ALSO accumulates the PPJoin suffix bound at the pair's
    # LAST shared prefix token: shared tokens appear in the same relative
    # order on both sides (one global order), so every common token not
    # counted in _c sits strictly after (_pa, _pb) and the exact overlap
    # obeys I ≤ _c + min(La-_pa-1, Lb-_pb-1). Pairs whose bound cannot
    # reach τ never fetch their full token arrays — zero false negatives
    # (the bound is an upper bound), strictly fewer verify rows.
    cand = (
        a.join(b, F.col("a.tok") == F.col("b.tok"))
        .filter(
            (F.col("a.id") < F.col("b.id"))
            # length filter: Jaccard ≥ τ forces τ·La ≤ Lb and τ·Lb ≤ La
            & (F.col("b.len") * 100 >= F.col("a.len") * pct)
            & (F.col("a.len") * 100 >= F.col("b.len") * pct)
            & (max_i * 100 >= (F.col("a.len") + F.col("b.len") - max_i) * pct)
        )
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(
            F.count(F.lit(1)).alias("_c"),
            F.max("a.pos").alias("_pa"),
            F.max("b.pos").alias("_pb"),
            F.max("a.len").alias("_la"),
            F.max("b.len").alias("_lb"),
        )
        .filter(
            (
                (
                    F.col("_c")
                    + F.least(
                        F.col("_la") - F.col("_pa") - 1,
                        F.col("_lb") - F.col("_pb") - 1,
                    )
                )
                * 100
            )
            >= (
                F.col("_la")
                + F.col("_lb")
                - F.col("_c")
                - F.least(
                    F.col("_la") - F.col("_pa") - 1,
                    F.col("_lb") - F.col("_pb") - 1,
                )
            )
            * pct
        )
        .select("id_a", "id_b")
    )
    # verify: candidates fetch full sorted sets and count the exact
    # overlap. The candidate stream is orders of magnitude larger than
    # the corpus frame here, so when the token sets fit in memory the
    # whole verify runs as ONE vectorized kernel over the candidate pairs
    # (guide §8: move the heavy bytes once — the arrays ship to every
    # worker a single time as a broadcast, the 16-byte pair stream never
    # shuffles 8·len-byte payloads) instead of a double join: per
    # id_a group one searchsorted membership pass over the concatenated
    # partner arrays, integer threshold in the kernel, display-rounding
    # left to Catalyst so the reported jaccard is bit-identical to the
    # join formulation. Size-adaptive, not unconditional: at corpus scale
    # the token sets outgrow any executor and the plan falls back to the
    # array_intersect join (cap parameterised for clusters; est is exact —
    # len is the array size and the frame is already persisted, so the
    # stats read is one metadata-sized aggregate).
    st = ordered.agg(
        F.sum("len").alias("s"), F.count(F.lit(1)).alias("n")
    ).collect()[0]
    est_bytes = int(st["s"] or 0) * 8 + int(st["n"]) * 48
    cap = int(
        os.environ.get("SPARK_GRAFT_SIMJOIN_BCAST_BYTES", str(256 << 20))
    )
    if est_bytes <= cap:
        import numpy as np
        import pandas as pd

        # Arrow path (toPandas), not collect(): list<long> columns land as
        # numpy arrays directly — 0.5 s vs 5.6 s of Row/int boxing at sf1.0.
        # The broadcast is ONE flat value-sorted token buffer + offsets +
        # a sorted id index (searchsorted id → slice), not a dict of
        # arrays: the verify kernel then never touches per-pair python
        # objects — every gather is a vectorized fancy-index.
        opdf = ordered.select("id", "toks").toPandas()
        _ids = opdf["id"].to_numpy().astype(np.int64)
        _ord = np.argsort(_ids, kind="stable")
        _ids = _ids[_ord]
        _arrs = [
            np.sort(np.asarray(t, dtype=np.int64))
            for t in opdf["toks"].to_numpy()[_ord]
        ]
        _lens = np.fromiter((len(x) for x in _arrs), np.int64, count=len(_arrs))
        _off = np.zeros(len(_arrs) + 1, dtype=np.int64)
        np.cumsum(_lens, out=_off[1:])
        _flat = (
            np.concatenate(_arrs) if _arrs else np.empty(0, np.int64)
        )
        btm = df.sparkSession.sparkContext.broadcast((_ids, _off, _flat))

        def _counts(flat, A, starts_, lens_):
            """Exact |B_slice ∩ A| per pair, fully vectorized: gather the
            per-pair slices of the flat buffer with one fancy-index, one
            searchsorted against the group's sorted A, one reduceat."""
            total = int(lens_.sum())
            cum = np.zeros(len(lens_), dtype=np.int64)
            np.cumsum(lens_[:-1], out=cum[1:])
            gi = np.arange(total, dtype=np.int64) + np.repeat(
                starts_ - cum, lens_
            )
            conc = flat[gi]
            pos = np.searchsorted(A, conc)
            np.minimum(pos, len(A) - 1, out=pos)
            hit = (A[pos] == conc).astype(np.int64)
            bounds = np.zeros(len(lens_), dtype=np.int64)
            np.cumsum(lens_[:-1], out=bounds[1:])
            return np.add.reduceat(hit, bounds)

        M = 64  # first-pass slice: I <= cnt(B[:M] ∩ A) + (lb - M), exact

        def verify(it):
            ids_s, off, flat = btm.value
            # drain the task's whole iterator first (one pass per TASK, not
            # per 2048-row Arrow batch), then group by id_a with a numpy
            # argsort + boundary scan — a pandas groupby iteration costs
            # ~150 µs/group in pure overhead, which at ~50k groups/task was
            # most of the verify wall. Two passes (guide §1.2): pass 1
            # counts only each partner's first M sorted tokens (4× fewer
            # gathered bytes — the kernel is memory-bandwidth-bound) and
            # prunes pairs whose exact upper bound cnt + (lb − M) cannot
            # reach the integer threshold; only survivors pay the full
            # count. Zero false negatives: the bound over-counts, never
            # under.
            frames = list(it)
            if not frames:
                return
            allp = pd.concat(frames, ignore_index=True)
            ia = allp["id_a"].to_numpy()
            ib = allp["id_b"].to_numpy()
            if len(ia) == 0:
                return
            order = np.argsort(ia, kind="stable")
            ia, ib = ia[order], ib[order]
            ib_idx = np.searchsorted(ids_s, ib)
            lens_b = off[ib_idx + 1] - off[ib_idx]
            starts_b = off[ib_idx]
            bnd = np.flatnonzero(np.diff(ia)) + 1
            gstarts = np.concatenate([np.zeros(1, np.int64), bnd])
            gends = np.concatenate([bnd, np.array([len(ia)], np.int64)])
            oa, ob, oi, ola, olb = [], [], [], [], []
            for s0, e0 in zip(gstarts, gends):
                ida = ia[s0]
                ai = int(np.searchsorted(ids_s, ida))
                A = flat[off[ai] : off[ai + 1]]
                la_ = len(A)
                lb_g = lens_b[s0:e0]
                st_g = starts_b[s0:e0]
                # ceil(pct*(la+lb)/(100+pct)) — the integer Jaccard
                # threshold rewritten as a bound on I alone
                t_pair = -(-(pct * (la_ + lb_g)) // (100 + pct))
                lsl = np.minimum(lb_g, M)
                cnt = _counts(flat, A, st_g, lsl)
                surv = cnt + (lb_g - lsl) >= t_pair
                if not surv.any():
                    continue
                sv = np.flatnonzero(surv)
                inters = _counts(flat, A, st_g[sv], lb_g[sv])
                keep = 100 * inters >= pct * (la_ + lb_g[sv] - inters)
                if keep.any():
                    nk = int(keep.sum())
                    oa.append(np.full(nk, ida, np.int64))
                    ob.append(ib[s0:e0][sv][keep])
                    oi.append(inters[keep])
                    ola.append(np.full(nk, la_, np.int64))
                    olb.append(lb_g[sv][keep])
            yield pd.DataFrame(
                {
                    "id_a": np.concatenate(oa) if oa else np.empty(0, np.int64),
                    "id_b": np.concatenate(ob) if ob else np.empty(0, np.int64),
                    "_i": np.concatenate(oi) if oi else np.empty(0, np.int64),
                    "_la": np.concatenate(ola) if ola else np.empty(0, np.int64),
                    "_lb": np.concatenate(olb) if olb else np.empty(0, np.int64),
                }
            )

        out = cand.mapInPandas(
            verify,
            "id_a long, id_b long, _i long, _la long, _lb long",
        ).select(
            "id_a",
            "id_b",
            F.round(
                F.col("_i").cast("double")
                / (F.col("_la") + F.col("_lb") - F.col("_i")),
                6,
            ).alias("jaccard"),
        )
    else:
        fa, fb = ordered.alias("fa"), ordered.alias("fb")
        inter = F.size(F.array_intersect("fa.toks", "fb.toks"))
        la, lb = F.col("fa.len"), F.col("fb.len")
        out = cand.join(fa, F.col("id_a") == F.col("fa.id")).join(
            fb, F.col("id_b") == F.col("fb.id")
        ).filter(inter * 100 >= (la + lb - inter) * pct).select(
            "id_a",
            "id_b",
            F.round(
                inter.cast("double") / (la + lb - inter), 6
            ).alias("jaccard"),
        )
    if not checkpoint:
        # caller keeps the live plan (tests assert its join strategy) and
        # owns the persisted inputs' lifetime
        return out
    out = out.localCheckpoint(eager=True)
    sets_.unpersist()
    ordered.unpersist()
    return out


def winnow_candidate_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    window: int = 4,
    min_shared: int = 1,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Exact-substring-share candidate pairs via winnowing fingerprints —
    the retrieval step of MOSS (Schleimer et al.) on top of
    text.winnow_fingerprints_udf: two documents sharing a fingerprint are
    guaranteed to share a >= k-char exact substring, so this is the
    scalable candidate generator for substring-level dedup (Lee et al.,
    "Deduplicating Training Data...") — O(docs x fingerprints), never an
    all-pairs text comparison.

    ``max_doc_freq`` drops fingerprints appearing in more than that many
    documents (MOSS's stop-fingerprint practice): ubiquitous substrings
    (boilerplate, whitespace runs) would otherwise each contribute a
    quadratic pair group — which is also the hot-key skew bound for the
    fingerprint shuffle at corpus scale. Returns (id_a, id_b, n_shared)
    with id_a < id_b, n_shared = |shared fingerprint set|.
    """
    winnow = winnow_fingerprints_udf(k=k, window=window)
    ex = (
        # rolling-hash UDF = the dominant cost: spread it across cores
        # even when the corpus arrives as one tidy file (no-op otherwise)
        spread_for_compute(df)
        .select(F.col(id_col).alias("id"), winnow(F.col(text_col)).alias("fps"))
        .select("id", F.explode("fps").alias("fp"))
        # materialize once: the doc-freq aggregation and the self-join are
        # independent consumers, and without this the rolling-hash UDF —
        # the dominant cost — runs twice over the corpus (exchange reuse
        # covers the two join sides but not the count branch)
        .localCheckpoint(eager=True)
    )
    if max_doc_freq is not None:
        # fps are a per-doc SET (winnowing dedups), so count(*) = doc freq.
        # Broadcast the STOP list (freq > cap) and anti-join: the stop set
        # is the small side by construction — the keep side is nearly every
        # distinct fingerprint of the corpus and must never be broadcast
        drop = ex.groupBy("fp").count().filter(F.col("count") > max_doc_freq)
        ex = ex.join(F.broadcast(drop.select("fp")), "fp", "left_anti")
    a, b = ex.alias("a"), ex.alias("b")
    return (
        a.join(b, (F.col("a.fp") == F.col("b.fp")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


# ----------------------------------------------- components / dedup groups
def connected_components(
    edges: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 15,
    stats: dict | None = None,
    local_max_edges: int | None = None,
) -> DataFrame:
    """Connected components of a near-duplicate pair graph — the step that
    turns pairwise findings (MinHash/SimHash/winnowing candidates) into
    DEDUP GROUPS: every member of a component is transitively near-equal
    and the component label (its minimum vertex id) is the canonical
    keep-candidate. Returns (v, component).

    Algorithm: iterative min-label propagation with pointer jumping —
    label(v) ← min(label(v), min over neighbors label(u)), then
    label(v) ← label(label(v)). Labels only decrease, so convergence to
    the component minimum is guaranteed; the neighbor step alone needs
    O(diameter) rounds, the pointer-jump (the large-star trick of
    Kiveris et al., "Connected Components in MapReduce") collapses long
    chains in O(log diameter). Near-dup graphs are overwhelmingly tiny
    cliques (diameter ≤ 2-3), so this converges in 2-3 rounds.

    Each round runs the propagation plan into an eager localCheckpoint —
    iterative DataFrame plans MUST be truncated per round or the lineage
    (and Catalyst analysis time) grows geometrically — plus one small
    changed-labels count job over the checkpointed old/new frames (two
    jobs per round total; the count join reads two materialized 2-column
    frames, not the propagation plan). Raises after ``max_iter`` rounds —
    an unconverged graph means the
    edge set is pathological (e.g. an un-thresholded similarity join),
    which should fail loudly, not loop forever.

    Pass a ``stats`` dict to get ``stats["rounds"]`` back — the O(log
    diameter) claim is measurable
    (tests/test_docops.py::test_connected_components_adversarial_long_chain;
    BENCH/components_chain.py).
    """
    sym = (
        edges.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .unionByName(edges.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # size-adaptive local fast path (the verify-broadcast pattern): near-dup
    # pair graphs are usually output-sized — a handful of cliques — while
    # the distributed loop costs ~2 fixed Spark jobs per round. When the
    # symmetrized edge set (already materialized above; the count is free)
    # fits the cap, solve it with driver-side union-find in milliseconds
    # and return the identical min-label components. Corpus-scale graphs
    # (or ``local_max_edges=0``) take the unchanged iterative path.
    if local_max_edges is None:
        local_max_edges = int(
            os.environ.get("SPARK_GRAFT_CC_LOCAL_EDGES", str(1_000_000))
        )
    n_sym = sym.count()
    if n_sym <= local_max_edges:
        pdf = sym.toPandas()
        parent: dict = {}

        def find(x):
            r = x
            while parent[r] != r:
                r = parent[r]
            while parent[x] != r:  # path compression
                parent[x], x = r, parent[x]
            return r

        for s, d in zip(pdf["src"].tolist(), pdf["dst"].tolist()):
            if s not in parent:
                parent[s] = s
            if d not in parent:
                parent[d] = d
            rs, rd = find(s), find(d)
            if rs != rd:
                parent[rd] = rs
        comp_min: dict = {}
        for v in parent:
            r = find(v)
            m = comp_min.get(r)
            if m is None or v < m:
                comp_min[r] = v
        from pyspark.sql import types as T

        vt = sym.schema["src"].dataType
        out_schema = T.StructType(
            [T.StructField("v", vt), T.StructField("component", vt)]
        )
        rows = [(v, comp_min[find(v)]) for v in parent]
        if stats is not None:
            stats["rounds"] = 0  # local union-find, no Spark rounds
        return edges.sparkSession.createDataFrame(rows, out_schema)
    labels = sym.select(F.col("src").alias("v")).distinct().withColumn(
        "label", F.col("v")
    ).localCheckpoint(eager=True)
    for rounds in range(1, max_iter + 1):
        neigh = (
            sym.join(
                labels.select(F.col("v").alias("dst"), F.col("label").alias("nl")),
                "dst",
            )
            .groupBy("src")
            .agg(F.min("nl").alias("nl"))
        )
        stepped = (
            labels.join(neigh, labels["v"] == neigh["src"], "left")
            .select(
                "v",
                F.least(F.col("label"), F.coalesce("nl", F.col("label"))).alias("label"),
            )
        )
        # pointer jump: label(v) <- label(label(v))
        jumped = (
            stepped.alias("s")
            .join(
                stepped.select(
                    F.col("v").alias("label"), F.col("label").alias("ll")
                ).alias("t"),
                "label",
                "left",
            )
            .select("v", F.least(F.col("label"), F.coalesce("ll", F.col("label"))).alias("label"))
            .localCheckpoint(eager=True)
        )
        changed = (
            jumped.alias("n")
            .join(labels.alias("o"), "v")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = jumped
        if changed == 0:
            if stats is not None:
                stats["rounds"] = rounds
            return labels.select("v", F.col("label").alias("component"))
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds — "
        f"pathological edge set (un-thresholded similarity join?)"
    )


def dedup_groups(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Assign every document its near-dup group label: the connected
    component of the pair graph for documents that have near-dups, the
    document's own id otherwise (singleton groups). Keep-one-per-group
    dedup is then ``filter(doc_id == component)``."""
    comp = connected_components(pairs, id_a, id_b)
    return df.select(F.col(id_col)).join(
        comp, df[id_col] == comp["v"], "left"
    ).select(
        F.col(id_col),
        F.coalesce("component", F.col(id_col)).alias("component"),
    )


def dedup_near(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Execute near-duplicate removal: keep exactly one representative —
    the minimum id AMONG df's members — of every near-dup cluster, plus
    all singletons; the action step over any pair source (MinHash,
    SimHash, winnowing, embedding near-dups). The representative is
    computed over df's own rows, not the raw component label: when
    ``pairs`` was derived from a larger corpus (e.g. a quality filter ran
    in between), a cluster whose global minimum id is absent from df must
    still keep its smallest PRESENT member, never vanish. Left-semi
    against the kept ids so the full payload rows pass through untouched."""
    groups = dedup_groups(df, pairs, id_col, id_a, id_b)
    keep = groups.groupBy("component").agg(F.min(id_col).alias(id_col)).select(id_col)
    return df.join(keep, id_col, "left_semi")


def cross_corpus_overlap(
    corpus: DataFrame,
    held_out: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    window: int = 4,
    min_shared: int = 1,
    max_doc_freq: int | None = None,
    stop_fps: DataFrame | None = None,
    broadcast_held: bool = True,
) -> DataFrame:
    """Contamination detection: training documents sharing a >= k-char
    exact substring with a HELD-OUT set (eval/benchmark data), via shared
    winnowing fingerprints — the standard train/test-overlap audit before
    a pretraining run (decontamination). Returns (train_id, heldout_id,
    n_shared).

    Same machinery as winnow_candidate_pairs but a two-sided join. With
    ``broadcast_held=True`` (default — for SMALL held-out sets, i.e.
    benchmarks) the held side's exploded fingerprints broadcast and the
    corpus side never shuffles: a contamination scan of 100 TB of training
    text costs one fingerprint pass over it. Pass ``False`` when the held
    side is itself corpus-scale (e.g. a 20% split) — a forced broadcast
    would exceed Spark's 8 GB broadcast limit; the optimizer then plans a
    shuffle join.
    ``max_doc_freq`` (doc frequency measured on the CORPUS side) drops
    ubiquitous substrings, same stop-fingerprint rationale as the
    self-join variant.

    ``stop_fps`` (a (fp) DataFrame) FREEZES the stop list instead of
    deriving it from ``corpus``: removing contaminated documents changes
    fingerprint doc-frequencies, so a re-scan with a recomputed list is
    NOT a fixpoint check — audits and iterative cleaning must pass the
    original list (see corpus_stop_fingerprints)."""
    winnow = winnow_fingerprints_udf(k=k, window=window)

    def fps(df_, name):
        # rolling-hash UDF = the dominant cost: parallelism must come from
        # cores, not the input file layout (no-op on well-partitioned input)
        return (
            spread_for_compute(df_)
            .select(F.col(id_col).alias(name), winnow(F.col(text_col)).alias("fps"))
            .select(name, F.explode("fps").alias("fp"))
        )

    corpus_fp = fps(corpus, "train_id")
    if stop_fps is not None:
        corpus_fp = corpus_fp.join(
            F.broadcast(stop_fps.select("fp")), "fp", "left_anti"
        )
    elif max_doc_freq is not None:
        # materialize only when the doc-freq branch creates a SECOND
        # consumer of the exploded frame (otherwise the UDF would run
        # twice); with a single consumer the checkpoint would be a pure
        # wasted materialization of the job's largest intermediate
        corpus_fp = corpus_fp.localCheckpoint(eager=True)
        drop = corpus_fp.groupBy("fp").count().filter(F.col("count") > max_doc_freq)
        corpus_fp = corpus_fp.join(F.broadcast(drop.select("fp")), "fp", "left_anti")
    held_fp = fps(held_out, "heldout_id")
    if broadcast_held:
        held_fp = F.broadcast(held_fp)
    return (
        corpus_fp.join(held_fp, "fp")
        .groupBy("train_id", "heldout_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def corpus_stop_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    window: int = 4,
    max_doc_freq: int = 4,
) -> DataFrame:
    """The frozen stop-fingerprint list of a corpus: winnowing fingerprints
    appearing in more than ``max_doc_freq`` documents. Compute ONCE on the
    original corpus and pass to cross_corpus_overlap as ``stop_fps`` for
    audits and iterative decontamination — doc frequencies shift as
    documents are removed, so a recomputed list changes the question."""
    winnow = winnow_fingerprints_udf(k=k, window=window)
    ex = (
        # rolling-hash UDF = the dominant cost: spread it across cores
        # even when the corpus arrives as one tidy file (no-op otherwise)
        spread_for_compute(df)
        .select(F.col(id_col).alias("id"), winnow(F.col(text_col)).alias("fps"))
        .select("id", F.explode("fps").alias("fp"))
    )
    return ex.groupBy("fp").count().filter(F.col("count") > max_doc_freq).select("fp")


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


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 16,
    shingle_k: int = 3,
) -> DataFrame:
    """Per-document MinHash signature as an ``array<long>`` column —
    the reusable artifact form of the signature step inside
    ``minhash_lsh_pairs`` (same 31-bit polynomial gram hashes + seeded
    affine family, so the two agree bit-for-bit and share the DuckDB
    oracle's arithmetic). Returns (id_col, sig).

    At 100 TB this is the frame you PERSIST: n_hashes longs per doc
    (vs the text), from which band keys, estimates, and incremental
    index maintenance all derive without re-hashing the corpus.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    from georef_ar_etl_spark.operators.text import (
        P31,
        poly_kgram_hashes_p31,
        poly_powers_p31,
    )

    powers = poly_powers_p31(shingle_k)
    A, B = minhash_affine_params(n_hashes)
    k = shingle_k
    id_type = df.schema[id_col].dataType
    out_schema = T.StructType([
        T.StructField("id", id_type),
        T.StructField("sig", T.ArrayType(T.LongType())),
    ])

    def part(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            ids, sigs = [], []
            for i, s in zip(pdf["id"].to_numpy(), pdf["t"].to_numpy()):
                if s is None:
                    s = ""
                if len(s) < k:
                    s = s.ljust(k)
                b = np.frombuffer(
                    s.encode("utf-8", "ignore"), dtype=np.uint8
                ).astype(np.uint64)
                H = poly_kgram_hashes_p31(b, k, powers)
                sig = ((H[None, :] * A[:, None] + B[:, None]) % P31).min(axis=1)
                ids.append(i)
                sigs.append(sig.astype(np.int64).tolist())
            yield pd.DataFrame({"id": ids, "sig": sigs})

    normed = spread_for_compute(df).select(
        F.col(id_col).alias("id"), norm_text(F.col(text_col)).alias("t")
    )
    return normed.mapInPandas(part, out_schema).withColumnRenamed("id", id_col)


def minhash_jaccard_estimate(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 16,
    n_bands: int = 4,
    min_estimate: float = 0.0,
    shingle_k: int = 3,
) -> DataFrame:
    """LSH candidate pairs scored by the MinHash ESTIMATE — the fraction
    of agreeing signature components, E[est] = true Jaccard — instead of
    the exact verify in ``minhash_lsh_pairs``. The estimate path is what
    runs when re-touching the text is too expensive: band keys AND the
    agreement count both derive from the persisted signature, so the
    candidate join moves n_hashes longs per doc, never the document.

    Plan: one signature pass (Arrow kernel), band keys sliced from the
    sig array JVM-side, ONE self-join on the band key, zip_with equality
    + aggregate for the estimate (pure Catalyst), multi-band collisions
    deduped. Returns (id_a, id_b, est_jaccard) with id_a < id_b.
    """
    if n_hashes % n_bands:
        raise ValueError(f"n_bands {n_bands} must divide n_hashes {n_hashes}")
    rows = n_hashes // n_bands
    sigs = minhash_signatures(
        df, text_col=text_col, id_col=id_col,
        n_hashes=n_hashes, shingle_k=shingle_k,
    ).withColumnRenamed(id_col, "id")
    bands = sigs.select(
        "id", "sig",
        F.explode(
            F.array(*[
                F.concat(
                    F.lit(f"{b}:"),
                    F.array_join(
                        F.slice("sig", b * rows + 1, rows).cast("array<string>"), ","
                    ),
                )
                for b in range(n_bands)
            ])
        ).alias("band"),
    )
    a = bands.select(
        F.col("id").alias("id_a"), F.col("sig").alias("sig_a"), "band"
    )
    b = bands.select(
        F.col("id").alias("id_b"), F.col("sig").alias("sig_b"), "band"
    )
    est = (
        F.aggregate(
            F.zip_with(
                "sig_a", "sig_b",
                lambda x, y: F.when(x == y, F.lit(1)).otherwise(F.lit(0)),
            ),
            F.lit(0),
            lambda acc, v: acc + v,
        )
        * F.lit(1.0)
        / F.lit(n_hashes)
    )
    return (
        a.join(b, "band")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.round(est, 6).alias("est_jaccard"))
        .filter(F.col("est_jaccard") >= min_estimate)
        .dropDuplicates(["id_a", "id_b"])
    )


def group_representatives(
    ranked: DataFrame,
    group_col: str = "component",
    id_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Pick ONE representative per dedup group — the member with the MAX
    ``rank_col`` (any orderable column; pass a struct for lexicographic
    multi-key ranks), ties broken by the SMALLEST numeric id — and tag
    every member. Output: the input columns minus ``rank_col``, plus
    ``rep_<id_col>`` and ``is_rep``.

    This is the 'keep the best, not the first' half of near-dedup (the
    SemDeDup/CCNet policy: a duplicate cluster keeps its highest-quality
    member, not its lowest id): ``dedup_groups`` labels the clusters,
    ``quality_gate``/features build the rank, this selects. Plan shape at
    100 TB: the winner is a map-side-combinable ``max(struct(rank, -id))``
    hash aggregate — never a window partitioned by the group, which would
    hot-key on a giant boilerplate cluster — followed by one equi-join of
    members back to the (#groups)-row winner frame on the group label.

    Reference analogue: none (reference keeps first-by-pk on conflict,
    georef_ar_etl/loaders.py); this is the curation-grade keep policy.
    """
    if group_col not in ranked.columns or rank_col not in ranked.columns:
        raise ValueError(
            f"ranked frame must carry '{group_col}' and '{rank_col}' "
            f"(got {ranked.columns})"
        )
    reps = (
        ranked.groupBy(group_col)
        .agg(
            F.max(
                F.struct(
                    F.col(rank_col).alias("r"),
                    (-F.col(id_col)).alias("ni"),
                )
            ).alias("_w")
        )
        .select(F.col(group_col), (-F.col("_w.ni")).alias("_rep"))
    )
    out_cols = [c for c in ranked.columns if c != rank_col]
    return ranked.join(reps, group_col).select(
        *out_cols,
        F.col("_rep").alias(f"rep_{id_col}"),
        (F.col(id_col) == F.col("_rep")).alias("is_rep"),
    )

"""Training-data operators over the driver's documents/embeddings tables."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from georef_ar_etl_spark.operators import doc_dedup, multimodal, similarity, text

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").cache()


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()


def test_token_count_matches_python(spark, docs):
    rows = docs.select("doc_id", "text", text.token_count(F.col("text")).alias("n")).collect()
    for r in rows[:50]:
        assert r["n"] == len(r["text"].lower().split()), r["doc_id"]


def test_language_id_deterministic_and_covering(spark, docs):
    out = docs.select(text.language_id(F.col("text")).alias("pred"))
    preds = {r["pred"] for r in out.collect()}
    assert preds <= {"en", "es", "fr", "de", "und"}


def test_fingerprint_is_md5_of_normalized(spark, docs):
    import hashlib

    r = docs.select("text", text.fingerprint(F.col("text")).alias("fp")).first()
    norm = " ".join(r["text"].lower().split())
    assert r["fp"] == hashlib.md5(norm.encode()).hexdigest()


def test_exact_dedup_keeps_distinct_fingerprints(spark, docs):
    kept = doc_dedup.dedup_exact(docs)
    n_fp = docs.select(text.fingerprint(F.col("text")).alias("f")).distinct().count()
    assert kept.count() == n_fp


def test_minhash_lsh_finds_planted_near_dupes(spark):
    base = "the quick brown fox jumps over the lazy dog again and again " * 5
    rows = [
        (1, base),
        (2, base + "tail"),          # near-dup of 1
        (3, "completely different words about spark shuffle partitions " * 5),
        (4, base.replace("quick", "rapid")),  # near-dup of 1
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = doc_dedup.minhash_lsh_pairs(df, n_hashes=16, n_bands=8, min_jaccard=0.5).collect()
    found = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (1, 2) in found and (1, 4) in found
    assert all(3 not in p for p in found)


def test_ngram_jaccard_symmetric_pairs(spark):
    rows = [(1, "aaab", "s"), (2, "aaab", "s"), (3, "zzzz", "s")]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    pairs = doc_dedup.ngram_jaccard_pairs(df, min_jaccard=0.9).collect()
    assert [(p["id_a"], p["id_b"], p["jaccard"]) for p in pairs] == [(1, 2, 1.0)]


def test_simhash_identical_docs_collide(spark):
    rows = [(1, "same text here"), (2, "same text here"), (3, "other material entirely")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    cands = {(r["id_a"], r["id_b"]) for r in doc_dedup.simhash_candidates(df).collect()}
    assert (1, 2) in cands


def test_cosine_topk_matches_numpy(spark, emb):
    pdf = emb.toPandas()
    q = list(pdf.loc[pdf.vec_id == 0, "embedding"].iloc[0])
    got = similarity.cosine_topk(emb, q, k=5).collect()

    M = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    qv = np.asarray(q, dtype=np.float64)
    sims = (M @ qv) / (np.linalg.norm(M, axis=1) * np.linalg.norm(qv))
    order = sorted(zip(np.round(sims, 4), -pdf["vec_id"].to_numpy()), reverse=True)[:5]
    expect_ids = [int(-x[1]) for x in order]
    assert [r["vec_id"] for r in got] == expect_ids
    assert got[0]["vec_id"] == 0 and got[0]["score"] == 1.0


def test_lsh_bucket_topk_subset_of_bucket(spark, emb):
    pdf = emb.toPandas()
    q = list(pdf.loc[pdf.vec_id == 0, "embedding"].iloc[0])
    approx = similarity.lsh_bucket_topk(emb, q, k=5, n_bits=2)
    rows = approx.collect()
    assert rows[0]["vec_id"] == 0  # query's own vector is in its own bucket
    assert len(rows) <= 5


def test_knn_join_topk_per_probe(spark, emb):
    pdf = emb.limit(3).toPandas()
    probes = pd.DataFrame({
        "probe_id": pdf["vec_id"].astype("int64"),
        "vec": pdf["embedding"].map(lambda v: np.asarray(v, dtype=np.float64)),
    })
    out = similarity.knn_join_cosine(emb, probes, k=3).collect()
    by_probe = {}
    for r in out:
        by_probe.setdefault(r["probe_id"], []).append(r)
    for pid, rows in by_probe.items():
        assert len(rows) == 3
        assert rows[0]["vec_id"] == pid  # self is nearest
        assert [r["rank"] for r in sorted(rows, key=lambda r: r["rank"])] == [1, 2, 3]


def test_multimodal_text_pipeline(spark, docs):
    media = multimodal.attach_media(docs.limit(20))
    feats = multimodal.extract_features(media).collect()
    src = {r["doc_id"]: r["text"] for r in docs.limit(20).collect()}
    assert len(feats) == 20
    for r in feats:
        raw = src[r["doc_id"]].encode()
        assert r["n_bytes"] == len(raw)
        assert r["first_byte"] == raw[0]
        assert r["media_type"] == "text/plain"
        assert r["width"] is None and r["sample_rate"] is None


def test_multimodal_real_bmp_wav_decode(spark):
    """Genuine binary payloads through the full Spark path: encode real BMP
    rasters and PCM16 WAVs (pure struct/numpy), decode them in the Arrow
    kernel, and check the features against the known ground truth."""
    import numpy as np

    rng = np.random.RandomState(5)
    rows = []
    truth = {}
    for i in range(6):
        w, h = 4 + i, 3 + (i % 2)
        px = rng.randint(0, 256, size=(h, w, 3)).astype(np.uint8)
        payload = multimodal.encode_bmp(px)
        rows.append((i, bytearray(payload), ("image/bmp", len(payload), "x")))
        truth[i] = ("bmp", w, h, round(float(px.mean()), 6))
    for i in range(6, 10):
        n = 800 + 100 * i
        rate = 8000 if i % 2 else 16000
        samples = (rng.randn(n) * 3000).astype(np.int16)
        payload = multimodal.encode_wav(samples, rate)
        rows.append((i, bytearray(payload), ("audio/wav", len(payload), "x")))
        truth[i] = (
            "wav", rate, round(n / rate, 6),
            round(float(np.sqrt(np.mean(samples.astype(np.float64) ** 2))), 6),
        )

    df = spark.createDataFrame(
        rows,
        "doc_id long, payload binary, "
        "media_meta struct<media_type: string, n_bytes: int, checksum: string>",
    )
    feats = {r["doc_id"]: r for r in multimodal.extract_features(df).collect()}
    assert len(feats) == 10
    for i, t in truth.items():
        r = feats[i]
        if t[0] == "bmp":
            assert (r["width"], r["height"], r["px_mean"]) == (t[1], t[2], t[3]), i
            assert r["sample_rate"] is None
        else:
            assert (r["sample_rate"], r["duration_s"], r["rms"]) == (t[1], t[2], t[3]), i
            assert r["width"] is None


def test_multimodal_unknown_codec_raises():
    with pytest.raises(NotImplementedError):
        multimodal.decode_media(b"\xff\xd8\xff", "image/jpeg")


def test_multimodal_extract_quarantines_bad_blobs(spark):
    """One corrupt blob or unknown codec must not kill the batch: bad rows
    get decode_error + byte stats, good rows still decode fully
    (VERDICT r02 ask #3; reference skips+reports invalid rows,
    transformers.py:96-101)."""
    px = np.full((2, 3, 3), 100, dtype=np.uint8)
    good_bmp = multimodal.encode_bmp(px)
    rows = [
        (0, bytearray(good_bmp), ("image/bmp", len(good_bmp), "x")),
        # truncated BMP: header promises a raster the payload doesn't have
        (1, bytearray(good_bmp[:20]), ("image/bmp", 20, "x")),
        # declared BMP but not one
        (2, bytearray(b"nope"), ("image/bmp", 4, "x")),
        # codec format with no decoder in this environment
        (3, bytearray(b"\xff\xd8\xff\xe0jpegbytes"), ("image/jpeg", 12, "x")),
        # empty payload
        (4, bytearray(b""), ("audio/wav", 0, "x")),
    ]
    df = spark.createDataFrame(
        rows,
        "doc_id long, payload binary, "
        "media_meta struct<media_type: string, n_bytes: int, checksum: string>",
    )
    feats = {r["doc_id"]: r for r in multimodal.extract_features(df).collect()}
    assert len(feats) == 5
    ok = feats[0]
    assert ok["decode_error"] is None
    assert (ok["width"], ok["height"]) == (3, 2) and ok["px_mean"] == 100.0
    for i in (1, 2, 3, 4):
        r = feats[i]
        assert r["decode_error"], i
        assert r["width"] is None and r["sample_rate"] is None, i
        assert r["n_bytes"] == len(bytes(rows[i][1])), i  # byte stats survive
    assert "NotImplementedError" in feats[3]["decode_error"]


def test_knn_join_large_probe_set_broadcast(spark, emb):
    """Few-hundred-probe set through the broadcast path (VERDICT r02 ask #6):
    every probe gets exactly k ranked neighbors and self is nearest."""
    pdf = emb.limit(200).toPandas()
    probes = pd.DataFrame({
        "probe_id": pdf["vec_id"].astype("int64"),
        "vec": pdf["embedding"].map(lambda v: np.asarray(v, dtype=np.float64)),
    })
    out = similarity.knn_join_cosine(emb, probes, k=2).collect()
    assert len(out) == 2 * len(probes)
    nearest = {r["probe_id"]: r["vec_id"] for r in out if r["rank"] == 1}
    assert len(nearest) == len(probes)
    assert all(pid == vid for pid, vid in nearest.items())


def test_ivf_ann_recall_vs_bruteforce(spark, emb):
    pdf = emb.toPandas()
    q = list(pdf.loc[pdf.vec_id == 0, "embedding"].iloc[0])
    centroids = similarity.ivf_index(emb, n_clusters=8, n_iter=5, seed=7)
    exact = [r["vec_id"] for r in similarity.cosine_topk(emb, q, k=10).collect()]
    approx = [r["vec_id"] for r in similarity.ivf_topk(emb, q, centroids, k=10, nprobe=4).collect()]
    assert approx[0] == 0  # self is found (its cluster is probed)
    recall = len(set(exact) & set(approx)) / 10
    assert recall >= 0.5, (recall, exact, approx)


def test_embedding_neardup_pairs_symmetric(spark, emb):
    pairs = similarity.embedding_neardup_pairs(emb, n_bits=4, min_cosine=0.2).collect()
    assert all(p["id_a"] < p["id_b"] for p in pairs)
    assert all(p["cosine"] >= 0.2 for p in pairs)


def test_winnow_fingerprints_near_dup_overlap(spark):
    from georef_ar_etl_spark.operators.text import winnow_fingerprints_udf

    winnow = winnow_fingerprints_udf(k=8, window=4)
    base = "the quick brown fox jumps over the lazy dog " * 4
    df = spark.createDataFrame(
        [(1, base), (2, base + "extra tail"), (3, "entirely different content here " * 4)],
        "doc_id long, text string",
    )
    fp = {r["doc_id"]: set(r["f"]) for r in df.select("doc_id", winnow(F.col("text")).alias("f")).collect()}
    j12 = len(fp[1] & fp[2]) / len(fp[1] | fp[2])
    j13 = len(fp[1] & fp[3]) / len(fp[1] | fp[3])
    assert j12 > 0.6 > j13


def test_winnow_series_matches_scalar_definition():
    """The flattened cross-document winnow (VERDICT r02 ask #7) must equal
    the per-document scalar definition on every edge: null, empty, < k
    bytes, k-grams < window, exact-window, long docs, unicode, repeats."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from georef_ar_etl_spark.operators import text as t

    k, window = 8, 4
    powers = t.poly_powers(k)

    def scalar_one(s):
        if s is None:
            return None
        b = np.frombuffer(
            s.lower().encode("utf-8", "ignore"), dtype=np.uint8
        ).astype(np.uint64)
        hashes = t.poly_kgram_hashes(b, k, powers)
        if len(hashes) == 0:
            return []
        if len(hashes) < window:
            return [int(np.int64(hashes.min()))]
        mins = np.lib.stride_tricks.sliding_window_view(hashes, window).min(axis=1)
        return [int(x) for x in np.unique(mins).astype(np.int64)]

    fixed = [
        None, "", "a", "short", "exactly8", "exactly8c", "exactly8ch9",
        "the quick brown fox jumps over the lazy dog",
        "aaaaaaaaaaaaaaaaaaaa", "ñandú über café " * 3, "\x00\x01binary\x02ish",
    ]
    got = t.winnow_series(pd.Series(fixed, dtype=object), k, window, powers)
    for s, g in zip(fixed, got):
        want = scalar_one(s)
        assert (g is None and want is None) or list(g) == want, repr(s)

    @settings(max_examples=30, deadline=None)
    @given(st.lists(st.one_of(st.none(), st.text(max_size=60)), max_size=12))
    def prop(texts):
        out = t.winnow_series(pd.Series(texts, dtype=object), k, window, powers)
        for s, g in zip(texts, out):
            want = scalar_one(s)
            assert (g is None and want is None) or list(g) == want, repr(s)

    prop()


def test_multimodal_zero_rate_wav_is_quarantined(spark):
    """A WAV whose fmt chunk declares sample_rate=0 (or channels=0) must be
    quarantined, not ZeroDivisionError the batch (code-review r03)."""
    import struct as _struct

    fmt = _struct.pack("<HHIIHH", 1, 0, 0, 0, 2, 16)  # channels=0, rate=0
    data = (np.zeros(8, dtype="<i2")).tobytes()
    bad = (
        _struct.pack("<4sI4s", b"RIFF", 4 + 8 + len(fmt) + 8 + len(data), b"WAVE")
        + _struct.pack("<4sI", b"fmt ", len(fmt)) + fmt
        + _struct.pack("<4sI", b"data", len(data)) + data
    )
    df = spark.createDataFrame(
        [(0, bytearray(bad), ("audio/wav", len(bad), "x"))],
        "doc_id long, payload binary, "
        "media_meta struct<media_type: string, n_bytes: int, checksum: string>",
    )
    r = multimodal.extract_features(df).collect()[0]
    assert r["decode_error"] and "corrupt WAV" in r["decode_error"]
    assert r["sample_rate"] is None and r["n_bytes"] == len(bad)


def test_repetition_features_known_values(spark):
    """Gopher-style repetition ratios against hand-computed values,
    including the run-length top-word count and edge cases."""
    rows = [
        (1, "a a a b"),        # words 4, distinct 2, top 'a'x3; 2grams: aa,aa,ab -> 3 total 2 distinct
        (2, "x y z"),          # no repetition
        (3, ""),               # empty -> all zero
        (4, "w"),              # single word: top=1/1, no 2grams
        (5, "p q p q p q"),    # alternating: words 6 d2 top3; grams 5, distinct 2
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in text.repetition_features(df).collect()}
    assert (out[1]["dup_word_frac"], out[1]["top_word_frac"], out[1]["dup_2gram_frac"]) == (0.5, 0.75, round(1 / 3, 6))
    assert (out[2]["dup_word_frac"], out[2]["top_word_frac"], out[2]["dup_2gram_frac"]) == (0.0, round(1 / 3, 6), 0.0)
    assert (out[3]["dup_word_frac"], out[3]["top_word_frac"], out[3]["dup_2gram_frac"]) == (0.0, 0.0, 0.0)
    assert (out[4]["dup_word_frac"], out[4]["top_word_frac"], out[4]["dup_2gram_frac"]) == (0.0, 1.0, 0.0)
    assert (out[5]["dup_word_frac"], out[5]["top_word_frac"], out[5]["dup_2gram_frac"]) == (round(4 / 6, 6), 0.5, 0.6)


def test_redact_pii_placeholders(spark):
    rows = [
        (1, "contact me at jane.doe+spam@example.co.uk or +1 (555) 123-4567"),
        (2, "server at 192.168.0.1 responded"),
        (3, "no pii here at all"),
        # long-octet IPs match the phone shape too — IP must win (pattern
        # order; code-review r03 pass 3)
        (4, "edge node 10.120.130.140 timed out"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["red"] for r in df.select(
        "doc_id", text.redact_pii(F.col("text")).alias("red")).collect()}
    assert "<EMAIL>" in got[1] and "example" not in got[1]
    assert "<PHONE>" in got[1] and "555" not in got[1]
    assert got[2] == "server at <IP> responded"
    assert got[3] == "no pii here at all"
    assert got[4] == "edge node <IP> timed out"


def test_quantize_dequantize_error_bound(spark, emb):
    """int8 quantization must be invertible within scale/2 per component,
    and cosine rankings over dequantized vectors must stay close."""
    embd = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
    q = similarity.quantize_embeddings(embd)
    back = q.select(
        "vec_id", "embedding",
        similarity.dequantize(F.col("q"), F.col("q_scale")).alias("deq"),
        "q_scale",
    ).collect()
    assert len(back) > 0
    for r in back:
        bound = r["q_scale"] / 2 + 1e-12
        for orig, rec in zip(r["embedding"], r["deq"]):
            assert abs(orig - rec) <= bound, r["vec_id"]
    # codes are genuinely int8-ranged
    rng = q.select(
        F.min(F.array_min("q")).alias("lo"), F.max(F.array_max("q")).alias("hi")
    ).first()
    assert -127 <= rng["lo"] and rng["hi"] <= 127

    # zero vector edge: scale 0, all-zero codes, exact reconstruction
    z = spark.createDataFrame([(1, [0.0, 0.0, 0.0])], "vec_id long, embedding array<double>")
    r = similarity.quantize_embeddings(z).collect()[0]
    assert r["q_scale"] == 0.0 and list(r["q"]) == [0, 0, 0]


def test_ivf_quantized_probe_drops_zero_vectors(spark):
    """Zero-scale (all-zero) vectors — which quantize_embeddings
    deliberately emits — must be DROPPED by the quantized probe kernel:
    their cosine is 0/0, and a NaN score would sort above every real score
    and fill the top-k with junk."""
    import math

    from georef_ar_etl_spark.operators import similarity

    rows = [(0, [1.0, 2.0]), (1, [0.0, 0.0]), (2, [2.0, 1.0])]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = similarity.quantize_embeddings(emb)
    out = similarity.ivf_topk_quantized(
        q, [1.0, 1.0], [[0.0, 0.0], [2.0, 2.0]], k=5, nprobe=2
    ).collect()
    ids = sorted(r["vec_id"] for r in out)
    assert ids == [0, 2], ids  # the zero vector never appears
    assert all(not math.isnan(r["score"]) for r in out)


def test_connected_components_chain_and_pointer_jump(spark):
    """A long path graph forces multiple propagation rounds (diameter 9 —
    pointer jumping must collapse it well inside max_iter); two separate
    components plus an isolated pair keep their own minima."""
    from georef_ar_etl_spark.operators.doc_dedup import connected_components

    chain = [(i, i + 1) for i in range(10, 19)]        # path 10-…-19
    other = [(100, 101), (101, 102), (100, 102)]        # triangle
    pair = [(7, 5)]
    edges = spark.createDataFrame(chain + other + pair, "id_a long, id_b long")
    got = {r["v"]: r["component"] for r in connected_components(edges).collect()}
    assert all(got[v] == 10 for v in range(10, 20))
    assert all(got[v] == 100 for v in (100, 101, 102))
    assert got[5] == 5 and got[7] == 5


def test_dedup_near_keeps_component_representatives(spark):
    from georef_ar_etl_spark.operators.doc_dedup import dedup_near

    docs = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b"), (4, "c"), (5, "c"), (6, "c2")],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (4, 5), (5, 6)], "id_a long, id_b long"
    )
    kept = sorted(r["doc_id"] for r in dedup_near(docs, pairs).collect())
    # component {1,2} -> 1, {4,5,6} -> 4, singleton 3 stays
    assert kept == [1, 3, 4]

    # a cluster whose GLOBAL minimum is absent from df (pairs computed on a
    # larger corpus, then rows filtered) keeps its smallest PRESENT member
    # — it must never vanish entirely
    filtered = docs.filter("doc_id <> 4")
    kept2 = sorted(r["doc_id"] for r in dedup_near(filtered, pairs).collect())
    assert kept2 == [1, 3, 5]


def test_count_min_estimate_never_underestimates(spark):
    """CM property: the estimate is >= the true count for EVERY item (min
    of d overcounting rows), and at low load factor most heavy hitters are
    exact."""
    from pyspark.sql import functions as F

    from georef_ar_etl_spark.operators import sketches

    rows = [(f"w{i:02d}",) for i in range(1, 21) for _ in range(i * 10)]
    toks = spark.createDataFrame(rows, "w string")
    true = {r["w"]: r["c"] for r in toks.groupBy("w").agg(F.count("*").alias("c")).collect()}
    sk = sketches.count_min_sketch(toks, "w", depth=4, width=512)
    est = {
        r["w"]: r["est"]
        for r in sketches.cm_estimate(
            sk, toks.select("w").distinct(), "w", depth=4, width=512
        ).collect()
    }
    assert set(est) == set(true)
    assert all(est[w] >= true[w] for w in true)
    exact = sum(est[w] == true[w] for w in true)
    assert exact >= len(true) * 0.8  # 20 items in 4x512 cells: mostly exact


def test_quality_gate_rejects_null_text(spark):
    """Null text nulls every feature; three-valued logic would skip every
    numeric rule — the leading no_text rule must catch it (empty text is a
    separate, ordinary too_short failure)."""
    df = spark.createDataFrame([(1, None), (2, ""), (3, "x y")], "doc_id long, text string")
    out = {r["doc_id"]: (r["keep"], r["reason"]) for r in text.quality_gate(df).collect()}
    assert out[1] == (False, "no_text")
    assert out[2] == (False, "too_short")
    assert out[3][1] in (None, "too_short", "low_stopword")  # tiny doc: some rule or pass


def test_connected_components_adversarial_long_chain(spark):
    """The O(log diameter) pointer-jump claim at an adversarial scale: a
    10^4-vertex PATH (diameter 9,999 — the worst case for pure label
    propagation, which would need 10^4 rounds) must converge inside the
    default max_iter, in ~log2(n) rounds. And the loud-failure mode: an
    insufficient round budget raises instead of looping or returning a
    half-merged labeling."""
    import pytest

    from georef_ar_etl_spark.operators.doc_dedup import connected_components

    n = 10_000
    edges = spark.range(n - 1).select(
        F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b")
    )
    stats = {}
    # local_max_edges=0 pins the DISTRIBUTED loop — this test exists to
    # measure its pointer-jump round count, which the small-graph
    # union-find fast path would otherwise bypass
    comp = connected_components(edges, max_iter=15, stats=stats, local_max_edges=0)
    assert comp.filter(F.col("component") != 0).count() == 0  # one component
    assert comp.count() == n
    # measured: 14 rounds for diameter 10^4 (11 for 2^10) — O(log d), far
    # from the O(d) a propagation-only algorithm would need
    assert stats["rounds"] <= 15

    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(edges, max_iter=5, local_max_edges=0)


def test_connected_components_local_matches_distributed(spark):
    """The size-adaptive union-find fast path must emit the identical
    (v, component) labeling as the iterative min-label loop — mixed
    components, string ids, and a cluster minimum ordering check."""
    from georef_ar_etl_spark.operators.doc_dedup import connected_components

    rows = [("d03", "d01"), ("d01", "d07"), ("b2", "b9"), ("z5", "z5")]
    edges = spark.createDataFrame(rows, "id_a string, id_b string")
    local = {
        (r["v"], r["component"])
        for r in connected_components(edges).collect()
    }
    dist = {
        (r["v"], r["component"])
        for r in connected_components(edges, local_max_edges=0).collect()
    }
    assert local == dist and ("d03", "d01") in local and ("z5", "z5") in local


def test_count_min_shard_merge_equals_whole(spark):
    """Mergeability, exactly: sketches of two corpus shards merged
    cell-wise must be bit-identical to the sketch of the union — the
    property that lets 100 TB shard in parallel and merge d*w rows."""
    from georef_ar_etl_spark.operators import sketches

    words = [(f"w{i % 37}",) for i in range(500)]
    df = spark.createDataFrame(words, "w string")
    a = df.filter(~F.md5("w").startswith("a"))
    b = df.filter(F.md5("w").startswith("a"))
    kw = dict(depth=4, width=64, seed=11)
    merged = sketches.merge_sketches(
        sketches.count_min_sketch(a, "w", **kw),
        sketches.count_min_sketch(b, "w", **kw),
        depth=4, width=64,
    )
    whole = sketches.count_min_sketch(df, "w", **kw)
    mrows = sorted(tuple(r) for r in merged.collect())
    wrows = sorted(tuple(r) for r in whole.collect())
    assert mrows == wrows


def test_bloom_no_false_negatives_and_shard_merge(spark):
    """Bloom contract: every TRUE member passes (false negatives are
    impossible — membership would break silently otherwise); non-members
    may pass at the predicted low rate but 'definitely absent' must hold
    for most; shard filters merged by union+distinct are bit-identical to
    the whole-input build."""
    from georef_ar_etl_spark.operators import sketches

    members = spark.createDataFrame([(f"m{i}",) for i in range(200)], "key string")
    others = spark.createDataFrame([(f"x{i}",) for i in range(2000)], "key string")
    kw = dict(n_bits=8192, k=4, seed=17)
    bits = sketches.bloom_bits(members, "key", **kw)
    bs = sketches.bloom_words(bits, n_bits=8192)

    pred = sketches.bloom_might_contain(F.col("key"), bs, n_bits=8192, k=4, seed=17)
    assert members.filter(~pred).count() == 0  # NO false negatives, ever
    fp = others.filter(pred).count()
    # 200 keys * 4 bits in 8192 cells -> fp rate ~ (1-e^{-0.098})^4 ~ 8e-5;
    # 2000 probes should see ~0, bound loosely for determinism headroom
    assert fp <= 5, fp

    a = members.filter(F.md5("key").startswith("a"))
    b = members.filter(~F.md5("key").startswith("a"))
    merged = (
        sketches.bloom_bits(a, "key", **kw)
        .unionByName(sketches.bloom_bits(b, "key", **kw))
        .distinct()
    )
    assert sorted(r["bit"] for r in merged.collect()) == sorted(
        r["bit"] for r in bits.collect()
    )


def test_hll_estimate_accuracy_and_merge(spark):
    from georef_ar_etl_spark.operators.sketches import (
        hll_estimate,
        hll_registers,
        merge_hll,
    )

    # 20k rows, 1077 distinct keys — estimate must land within 5%
    df = spark.range(20000).selectExpr("CAST(id % 1077 AS STRING) AS k")
    regs = hll_registers(df, "k", p=9)
    est = hll_estimate(regs, p=9).collect()[0]["est"]
    assert abs(est - 1077) / 1077 < 0.05, est

    # shard-and-merge == whole-corpus sketch, register for register
    a = hll_registers(df.filter("id % 2 = 0"), "k", p=9)
    b = hll_registers(df.filter("id % 2 = 1"), "k", p=9)
    merged = {
        (r["bucket"], r["r"]) for r in merge_hll(a, b).collect()
    }
    whole = {(r["bucket"], r["r"]) for r in regs.collect()}
    assert merged == whole

    # small-cardinality range: linear counting takes over and is near-exact
    tiny = spark.range(40).selectExpr("CAST(id AS STRING) AS k")
    est_t = hll_estimate(hll_registers(tiny, "k", p=9), p=9).collect()[0]["est"]
    assert abs(est_t - 40) < 3, est_t


def test_bigram_lm_score_matches_python(spark):
    import math
    from collections import Counter

    from georef_ar_etl_spark.operators.text import bigram_lm_score

    rows = [
        (1, "the cat sat on the mat"),
        (2, "the cat sat on the mat again"),
        (3, "mat the on sat cat the"),  # same words, shuffled
        (4, "single"),                   # <2 tokens -> null
        (5, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["bigram_score"] for r in bigram_lm_score(df).collect()}

    docs = {i: t.lower().split() for i, t in rows}
    uni = Counter(w for ws in docs.values() for w in ws)
    big = Counter(
        (ws[i], ws[i + 1]) for ws in docs.values() for i in range(len(ws) - 1)
    )
    N, V = sum(uni.values()), len(uni)
    for i, ws in docs.items():
        if len(ws) < 2:
            assert got[i] is None, i
            continue
        terms = [
            -math.log(
                0.75 * big[(a, b)] / uni[a] + 0.25 * (uni[b] + 1) / (N + V)
            )
            for a, b in zip(ws, ws[1:])
        ]
        assert got[i] == round(sum(terms) / len(terms), 4), i
    # fluent order is more probable than the shuffled salad of doc 3
    assert got[1] < got[3]


def test_hll_set_algebra(spark):
    from georef_ar_etl_spark.operators.sketches import (
        hll_registers,
        hll_set_algebra,
    )

    # A = 0..1499, B = 1000..2499: |A∩B| = 500, |A∪B| = 2500
    a = spark.range(0, 1500).selectExpr("CAST(id AS STRING) AS k")
    b = spark.range(1000, 2500).selectExpr("CAST(id AS STRING) AS k")
    ra, rb = hll_registers(a, "k", p=9), hll_registers(b, "k", p=9)
    row = hll_set_algebra(ra, rb, p=9).collect()[0]
    assert abs(row["est_a"] - 1500) / 1500 < 0.1
    assert abs(row["est_b"] - 1500) / 1500 < 0.1
    assert abs(row["est_union"] - 2500) / 2500 < 0.1
    # intersection inherits the union's ABSOLUTE error: bound vs |A∪B|
    assert abs(row["est_intersect"] - 500) / 2500 < 0.12
    assert row["est_union"] >= max(row["est_a"], row["est_b"]) - 1e-9

    # identical sides: union estimate EQUALS each side exactly (register
    # merge of a sketch with itself is itself), intersect == est_a
    same = hll_set_algebra(ra, ra, p=9).collect()[0]
    assert same["est_union"] == same["est_a"] == same["est_b"]
    assert abs(same["est_intersect"] - same["est_a"]) < 1e-9


def test_dup_span_stats_interval_union(spark):
    from georef_ar_etl_spark.operators.text import dup_span_stats

    shared = "a b c d e f g h"              # one shared 8-gram
    prefix10 = " ".join(f"m{i}" for i in range(10))
    rows = [
        (1, shared + " x y z"),              # 11 tok, covered 8
        (2, shared + " q r s"),              # 11 tok, covered 8
        (3, "totally different words here"), # <8 tok -> no grams
        (4, " ".join(["p"] * 20)),           # fully duplicated with 5
        (5, " ".join(["p"] * 20)),
        (6, prefix10 + " t1 t2 t3 t4 t5"),   # shares only the 10-prefix
        (7, prefix10 + " u1 u2 u3 u4 u5"),   # -> starts 1,2,3: covered 10
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in dup_span_stats(df, k=8).collect()}
    assert (got[1]["n_tok"], got[1]["dup_tokens"]) == (11, 8)
    assert got[1]["dup_frac"] == round(8 / 11, 6)
    assert (got[3]["dup_tokens"], got[3]["dup_frac"]) == (0, 0.0)
    assert (got[4]["n_tok"], got[4]["dup_tokens"]) == (20, 20)
    assert got[4]["dup_frac"] == 1.0
    assert (got[6]["n_tok"], got[6]["dup_tokens"]) == (15, 10)
    # deterministic under repartitioning
    again = {
        r["doc_id"]: r["dup_tokens"]
        for r in dup_span_stats(df.repartition(5), k=8).collect()
    }
    assert again == {i: got[i]["dup_tokens"] for i in got}

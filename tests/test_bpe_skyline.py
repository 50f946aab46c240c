"""BPE merge training / encode (operators/text.py) and the generic
d-dimensional skyline (operators/skyline.py) — each checked against an
independent in-memory reference implementation."""

import itertools

import pytest
from pyspark.sql import functions as F

from georef_ar_etl_spark.operators.skyline import skyline
from georef_ar_etl_spark.operators.text import bpe_encode, bpe_merges


# ----------------------------------------------------------------- BPE ref
def _ref_word_syms(word: str) -> tuple[str, ...]:
    return tuple(word) + ("</w>",)


def _ref_merge(syms: tuple[str, ...], left: str, right: str) -> tuple[str, ...]:
    out: list[str] = []
    for s in syms:
        if out and out[-1] == left and s == right:
            out[-1] = left + right
        else:
            out.append(s)
    return tuple(out)


def _ref_bpe(texts, n_merges, min_pair_count=2):
    """Sennrich-style reference BPE on word frequencies, ties broken
    (count desc, left asc, right asc)."""
    vocab: dict[tuple[str, ...], int] = {}
    for t in texts:
        for w in t.lower().split():
            k = _ref_word_syms(w)
            vocab[k] = vocab.get(k, 0) + 1
    merges = []
    for rank in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for syms, cnt in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + cnt
        if not pairs:
            break
        (left, right), pc = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if pc < min_pair_count:
            break
        merges.append((rank, left, right, pc))
        new_vocab: dict[tuple[str, ...], int] = {}
        for syms, cnt in vocab.items():
            k = _ref_merge(syms, left, right)
            new_vocab[k] = new_vocab.get(k, 0) + cnt
        vocab = new_vocab
    return merges


TEXTS = [
    "low lower lowest low low",
    "new newer newest new new new",
    "wider wide wide widest",
    "low new wide lower newer",
    "aaaa aaa aa a banana bandana",
]


def test_bpe_merges_match_reference(spark):
    df = spark.createDataFrame([(t,) for t in TEXTS], "text: string")
    got = [
        (r["rank"], r["left"], r["right"], r["pair_count"])
        for r in bpe_merges(df, n_merges=10, min_pair_count=2)
        .orderBy("rank")
        .collect()
    ]
    want = _ref_bpe(TEXTS, 10, 2)
    assert got == want
    assert len(got) > 3  # the corpus genuinely trains several merges


def test_bpe_merge_greedy_nonoverlap(spark):
    # 'a a a a' -> 'aa aa'; 'a a a' -> 'aa a' (left-to-right greedy)
    df = spark.createDataFrame([("aaaa aaa",)], "text: string")
    m = bpe_merges(df, n_merges=1, min_pair_count=1).collect()
    assert (m[0]["left"], m[0]["right"]) == ("a", "a")
    enc = df.select(
        bpe_encode(F.col("text"), [("a", "a")]).alias("s")
    ).collect()[0]["s"]
    assert enc == ["aa", "aa", "</w>", "aa", "a", "</w>"]


def test_bpe_encode_applies_training_order(spark):
    df = spark.createDataFrame([(t,) for t in TEXTS], "text: string")
    table = [
        (r["left"], r["right"])
        for r in bpe_merges(df, n_merges=8).orderBy("rank").collect()
    ]
    got = df.select(bpe_encode(F.col("text"), table).alias("s")).collect()
    for row, text in zip(got, TEXTS):
        # reference encode: fold reference merges over each word
        syms: list[str] = []
        for w in text.lower().split():
            ws = _ref_word_syms(w)
            for left, right in table:
                ws = _ref_merge(ws, left, right)
            syms.extend(ws)
        assert row["s"] == syms


def test_bpe_early_stop(spark):
    df = spark.createDataFrame([("x y z",)], "text: string")
    m = bpe_merges(df, n_merges=5, min_pair_count=2).collect()
    assert m == []  # every pair occurs once — below min_pair_count


# ------------------------------------------------------------- skyline ref
def _ref_skyline(points, signs):
    pts = {tuple(s * v for s, v in zip(signs, p)) for p in points}

    def dominated(p):
        return any(
            q != p and all(qi <= pi for qi, pi in zip(q, p))
            for q in pts
        )

    return {
        tuple(s * v for s, v in zip(signs, p)) for p in pts if not dominated(p)
    }


@pytest.mark.parametrize("dims", [2, 3])
def test_skyline_matches_bruteforce(spark, dims):
    import random

    rng = random.Random(7)
    pts = [
        tuple(float(rng.randint(0, 12)) for _ in range(dims)) for _ in range(400)
    ]
    cols = [f"d{i}" for i in range(dims)]
    df = spark.createDataFrame(pts, ", ".join(f"{c}: double" for c in cols))
    directions = dict(zip(cols, itertools.cycle(["min", "max"])))
    signs = [1 if directions[c] == "min" else -1 for c in cols]
    got = {
        tuple(r[c] for c in cols)
        for r in skyline(df.repartition(7), directions).collect()
    }
    assert got == _ref_skyline(pts, signs)


def test_skyline_duplicates_and_single_point(spark):
    df = spark.createDataFrame(
        [(1.0, 1.0), (1.0, 1.0), (2.0, 2.0)], "a: double, b: double"
    )
    got = {(r["a"], r["b"]) for r in skyline(df, {"a": "min", "b": "min"}).collect()}
    assert got == {(1.0, 1.0)}


def test_skyline_rejects_bad_direction(spark):
    df = spark.createDataFrame([(1.0,)], "a: double")
    with pytest.raises(ValueError):
        skyline(df, {"a": "up"})


# --------------------------------------------- set-similarity & triangles
def test_set_similarity_join_known_pairs(spark):
    from georef_ar_etl_spark.operators.doc_dedup import set_similarity_join

    rows = [
        (1, "the quick brown fox jumps over the lazy dog tonight"),
        (2, "the quick brown fox jumps over the lazy dog tonight!"),  # near-dup
        (3, "completely different content about spark shuffles"),
        (4, "zzz"),  # shorter than shingle_k
    ]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    got = {
        (r["id_a"], r["id_b"])
        for r in set_similarity_join(df, min_jaccard_pct=50).collect()
    }
    assert got == {(1, 2)}


def test_set_similarity_join_exactness_vs_bruteforce(spark):
    """Prefix filtering must lose NOTHING vs the all-pairs ground truth."""
    from georef_ar_etl_spark.operators.doc_dedup import (
        ngram_jaccard_pairs,
        set_similarity_join,
    )

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [(i, base[: 10 + (i * 7) % 45] + f" tail{i % 4}") for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    fast = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in set_similarity_join(df, min_jaccard_pct=40, shingle_k=3).collect()
    }
    brute = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in ngram_jaccard_pairs(
            df, block_col=None, min_jaccard=0.4, shingle_k=3
        ).collect()
    }
    assert fast == brute and len(brute) > 0


def test_set_similarity_join_verify_paths_agree(spark, monkeypatch):
    """The vectorized kernel verify (token sets broadcast, searchsorted
    membership) and the array_intersect join fallback (cap=0 forces it)
    must emit the identical pair set WITH identical rounded jaccards —
    the two paths are the same operator at different scales."""
    from georef_ar_etl_spark.operators.doc_dedup import set_similarity_join

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [(i, base[: 12 + (i * 5) % 40] + f" t{i % 3}") for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    kernel = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in set_similarity_join(df, min_jaccard_pct=40, shingle_k=3).collect()
    }
    monkeypatch.setenv("SPARK_GRAFT_SIMJOIN_BCAST_BYTES", "0")
    joinp = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in set_similarity_join(df, min_jaccard_pct=40, shingle_k=3).collect()
    }
    assert kernel == joinp and len(kernel) > 0


def test_char_shingles_multibyte_matches_char_semantics(spark):
    """The ASCII byte-slice fast path must leave multibyte rows on the
    exact char-walk path: grams of a string with multibyte chars are
    CHARACTER k-grams, never byte k-grams."""
    from georef_ar_etl_spark.operators.text import char_shingles

    df = spark.createDataFrame(
        [(1, "añejo café"), (2, "plain ascii")], "id: long, t: string"
    )
    out = {
        r["id"]: r["g"]
        for r in df.select(
            "id", char_shingles(F.col("t"), 3, pre_normalized=True).alias("g")
        ).collect()
    }

    def ref(s, k=3):
        grams = [s[i : i + k] for i in range(max(len(s) - k + 1, 1))]
        seen, outl = set(), []
        for g in grams:
            if g not in seen:
                seen.add(g)
                outl.append(g)
        return outl

    assert out[1] == ref("añejo café")
    assert out[2] == ref("plain ascii")


def test_triangles_known_graph(spark):
    from georef_ar_etl_spark.operators.graph import triangles

    # K4 on {1,2,3,4} (4 triangles) + pendant 5 + isolated self-loop 6 +
    # a parallel/reversed duplicate edge
    edges = [(1, 2), (2, 1), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
             (4, 5), (6, 6)]
    df = spark.createDataFrame(edges, "src: long, dst: long")
    got = {(r["a"], r["b"], r["c"]) for r in triangles(df).collect()}
    assert got == {(1, 2, 3), (1, 2, 4), (1, 3, 4), (2, 3, 4)}


def test_triangles_triangle_free(spark):
    from georef_ar_etl_spark.operators.graph import triangles

    df = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 1)], "src: long, dst: long"  # C4
    )
    assert triangles(df).count() == 0

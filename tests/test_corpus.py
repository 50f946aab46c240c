"""Deterministic corpus splits/samples (operators/corpus.py): assignment is
a pure function of the key — stable under repartitioning, nested samples,
fractions approximately honored, md5 variant engine-reproducible."""

import pytest
from pyspark.sql import functions as F

from georef_ar_etl_spark.operators import corpus

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id")


def test_split_fractions_and_determinism(spark, docs):
    fr = [("train", 0.8), ("val", 0.1), ("test", 0.1)]
    out = corpus.hash_split(docs, fractions=fr)
    counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    total = sum(counts.values())
    assert total == docs.count()
    # hash uniformity: within a loose tolerance at n=500
    assert abs(counts.get("train", 0) / total - 0.8) < 0.08
    assert counts.get("val", 0) > 0 and counts.get("test", 0) > 0

    # repartitioning must not move ANY document between splits
    a = {r["doc_id"]: r["split"] for r in out.collect()}
    b = {
        r["doc_id"]: r["split"]
        for r in corpus.hash_split(docs.repartition(7), fractions=fr).collect()
    }
    assert a == b

    # growing the corpus never reassigns existing documents
    grown = docs.union(spark.range(10_000, 10_050).select(F.col("id").alias("doc_id")))
    c = {r["doc_id"]: r["split"] for r in corpus.hash_split(grown, fractions=fr).collect()}
    assert all(c[k] == v for k, v in a.items())


def test_nested_samples_and_bounds(spark, docs):
    s10 = {r["doc_id"] for r in corpus.deterministic_sample(docs, 0.10).collect()}
    s50 = {r["doc_id"] for r in corpus.deterministic_sample(docs, 0.50).collect()}
    assert s10 <= s50  # smaller sample is a subset of the larger
    n = docs.count()
    assert 0 < len(s10) < len(s50) < n
    assert abs(len(s50) / n - 0.5) < 0.1
    with pytest.raises(ValueError):
        corpus.deterministic_sample(docs, 1.5)
    with pytest.raises(ValueError):
        corpus.hash_split(docs, fractions=[("a", 0.5), ("b", 0.4)])
    with pytest.raises(ValueError):
        corpus.hash_bucket(F.col("doc_id"), hash_fn="nope")


def test_md5_variant_matches_python(spark, docs):
    """The engine-portable md5 bucket must equal a pure-Python recompute."""
    import hashlib

    rows = corpus.hash_split(docs, hash_fn="md5", fractions=[
        ("train", 0.8), ("val", 0.1), ("test", 0.1),
    ]).collect()
    for r in rows[:100]:
        b = int(hashlib.md5(str(r["doc_id"]).encode()).hexdigest()[:8], 16) % 10_000
        want = "train" if b < 8000 else ("val" if b < 9000 else "test")
        assert r["split"] == want, r["doc_id"]


def test_sample_then_split_is_not_degenerate(spark, docs):
    """Sampling and splitting must use DECORRELATED hashes: with one shared
    unsalted hash, any sample of fraction <= the first split's fraction
    would be 100% train and zero eval (code-review r03 pass 4)."""
    fr = [("train", 0.8), ("val", 0.1), ("test", 0.1)]
    sampled = corpus.deterministic_sample(docs, 0.5)
    counts = {
        r["split"]: r["n"]
        for r in corpus.hash_split(sampled, fractions=fr)
        .groupBy("split").agg(F.count("*").alias("n")).collect()
    }
    assert set(counts) == {"train", "val", "test"}, counts
    total = sum(counts.values())
    assert abs(counts["train"] / total - 0.8) < 0.12

    # different salts give independent samples, same salt is deterministic
    a = {r["doc_id"] for r in corpus.deterministic_sample(docs, 0.3, salt="a").collect()}
    b = {r["doc_id"] for r in corpus.deterministic_sample(docs, 0.3, salt="b").collect()}
    a2 = {r["doc_id"] for r in corpus.deterministic_sample(docs, 0.3, salt="a").collect()}
    assert a == a2 and a != b


def test_quantize_rejects_column_clash(spark):
    from georef_ar_etl_spark.operators import similarity

    df = spark.createDataFrame([(1, [1.0], 2.0)], "vec_id long, embedding array<double>, q double")
    with pytest.raises(ValueError, match="already exist"):
        similarity.quantize_embeddings(df)


def test_pack_sequences_bound_and_partitioning_invariance(spark):
    """Greedy overflow-allowed packing: every pack except a group's last is
    >= capacity - max_doc_len + 1 full and <= capacity + max_doc_len - 1;
    assignments are a pure prefix-sum, so they must not change under
    repartitioning."""
    from pyspark.sql import functions as F

    from georef_ar_etl_spark.operators.corpus import pack_sequences

    df = spark.range(500).selectExpr(
        "cast(id AS string) AS doc_id",
        "concat('s', cast(id % 3 AS string)) AS source",
        "cast(1 + (id * 37) % 200 AS int) AS n_len",
    )
    cap = 300
    packed = pack_sequences(df, capacity=cap, len_col="n_len").cache()
    stats = (
        packed.groupBy("source", "pack_seq")
        .agg(F.sum("n_len").alias("tot"), F.max("n_len").alias("mx"))
        .collect()
    )
    last_per_group = {
        r["source"]: r["m"]
        for r in packed.groupBy("source").agg(F.max("pack_seq").alias("m")).collect()
    }
    max_len = packed.agg(F.max("n_len")).first()[0]
    for r in stats:
        assert r["tot"] <= cap + max_len - 1, r
        if r["pack_seq"] != last_per_group[r["source"]]:
            # every non-final pack spilled INTO the next one, so it holds at
            # least capacity - (its max doc - 1)
            assert r["tot"] > cap - max_len, r

    a = {(r["doc_id"]): r["pack_seq"] for r in packed.collect()}
    b = {
        (r["doc_id"]): r["pack_seq"]
        for r in pack_sequences(
            df.repartition(13), capacity=cap, len_col="n_len"
        ).collect()
    }
    packed.unpersist()
    assert a == b


def test_token_budget_sample_boundary_and_determinism(spark):
    """Whole-document admission: a doc is kept iff the budget was not
    exhausted when it starts (the last kept doc may overflow); the kept set
    is identical under repartitioning and each group's pre-overflow total
    stays under budget + max_len."""
    from pyspark.sql import functions as F

    from georef_ar_etl_spark.operators.corpus import token_budget_sample

    df = spark.range(300).selectExpr(
        "cast(id AS string) AS doc_id",
        "concat('s', cast(id % 2 AS string)) AS source",
        "cast(10 + (id * 13) % 90 AS int) AS n_len",
    )
    budget = 500
    s = token_budget_sample(df, budget, len_col="n_len")
    stats = s.groupBy("source").agg(
        F.sum("n_len").alias("tot"), F.max("n_len").alias("mx")
    ).collect()
    for r in stats:
        assert budget <= r["tot"] < budget + r["mx"], r
    a = sorted(r["doc_id"] for r in s.collect())
    b = sorted(
        r["doc_id"]
        for r in token_budget_sample(
            df.repartition(11), budget, len_col="n_len"
        ).collect()
    )
    assert a == b


def test_weighted_sample_bias_and_invariants(spark):
    from georef_ar_etl_spark.operators.corpus import weighted_sample

    # 5k docs: ids < 2500 carry weight 100, the rest weight 1 — a k=200
    # weighted sample must be dominated by the heavy half
    df = spark.range(5000).selectExpr(
        "id AS doc_id", "CASE WHEN id < 2500 THEN 100 ELSE 1 END AS w"
    )
    s = weighted_sample(df, k=200, weight_col="w")
    rows = s.collect()
    assert len(rows) == 200
    heavy = sum(1 for r in rows if r["doc_id"] < 2500)
    assert heavy > 180, heavy  # P(heavy) ≈ 100/101 per draw

    # deterministic + partitioning-independent
    again = weighted_sample(df.repartition(17), k=200, weight_col="w")
    assert sorted(r["doc_id"] for r in again.collect()) == sorted(
        r["doc_id"] for r in rows
    )

    # zero/null weights excluded, k > n returns all positive-weight rows
    small = spark.createDataFrame(
        [(1, 5), (2, 0), (3, None), (4, 2)], "doc_id long, w int"
    )
    got = sorted(r["doc_id"] for r in weighted_sample(small, k=10, weight_col="w").collect())
    assert got == [1, 4]

    import pytest as _pt
    with _pt.raises(ValueError):
        weighted_sample(small, k=0, weight_col="w")


def test_negative_samples_semantics(spark):
    from georef_ar_etl_spark.operators.corpus import negative_samples

    df = spark.createDataFrame([(f"d{i:02d}",) for i in range(20)], "id string")
    out = negative_samples(df, "id", k=3, seed=5).collect()
    assert len(out) == 60  # exactly k per row
    by_id = {}
    for r in out:
        assert r["neg_id"] != r["id"]  # never self
        by_id.setdefault(r["id"], set()).add(r["neg_rank_j"])
    assert all(js == {1, 2, 3} for js in by_id.values())

    # deterministic under repartitioning
    again = sorted(tuple(r) for r in
                   negative_samples(df.repartition(7), "id", k=3, seed=5).collect())
    assert again == sorted(tuple(r) for r in out)
    # a different seed draws different partners
    other = sorted(tuple(r) for r in
                   negative_samples(df, "id", k=3, seed=6).collect())
    assert other != again

    import pytest as _pt
    with _pt.raises(ValueError):
        negative_samples(df, "id", k=0)
    with _pt.raises(ValueError):
        negative_samples(df.limit(1), "id", k=2)

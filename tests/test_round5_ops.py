"""Round-5 session-3 operators: link prediction, PSI drift, state runs,
random projection, pack layout, Fellegi–Sunter, decayed sums."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from georef_ar_etl_spark.operators import similarity
from georef_ar_etl_spark.operators.entity_match import fs_classify, fs_weights
from georef_ar_etl_spark.operators.graph import link_prediction
from georef_ar_etl_spark.operators.temporal import decayed_sum, state_runs
from georef_ar_etl_spark.operators.validate import psi_report


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, ["src", "dst"])


class TestLinkPrediction:
    def test_path_graph_scores(self, spark):
        # 1-2-3 path: {1,3} share neighbor 2 (deg 2); the edge pairs are
        # adjacent and must NOT appear
        out = link_prediction(_edges(spark, [(1, 2), (2, 3)])).collect()
        assert len(out) == 1
        r = out[0]
        assert (r["a"], r["b"], r["common"]) == (1, 3, 1)
        assert r["aa_score"] == pytest.approx(round(1 / math.log(2), 6))
        assert r["ra_score"] == pytest.approx(0.5)

    def test_existing_edges_excluded_and_dedup(self, spark):
        # square 1-2-3-4-1 plus diagonal 1-3: {2,4} share {1,3}; {1,3}
        # adjacent so excluded; parallel/reversed edges collapse
        e = [(1, 2), (2, 1), (2, 3), (3, 4), (4, 1), (1, 3), (1, 3)]
        rows = {(r["a"], r["b"]): r for r in link_prediction(_edges(spark, e)).collect()}
        assert (1, 3) not in rows
        assert rows[(2, 4)]["common"] == 2

    def test_max_degree_drops_hub_apex(self, spark):
        # star center 0 with leaves 1..5: every leaf pair shares only the
        # hub; capping degree below 5 removes all candidates
        e = [(0, i) for i in range(1, 6)]
        assert link_prediction(_edges(spark, e)).count() == 10
        assert link_prediction(_edges(spark, e), max_degree=4).count() == 0
        with pytest.raises(ValueError):
            link_prediction(_edges(spark, e), max_degree=1)


class TestPsiReport:
    def _df(self, spark, vals):
        return spark.createDataFrame([(float(v),) for v in vals], ["value"])

    def test_identical_distribution_not_drifted(self, spark):
        vals = [5, 15, 25, 35, 45] * 20
        out = psi_report(
            self._df(spark, vals), self._df(spark, vals), "value", 0.0, 50.0,
            n_bins=5,
        ).collect()
        assert len(out) == 5
        assert all(not r["drifted"] for r in out)
        assert out[0]["psi_total"] == pytest.approx(0.0)

    def test_shift_detected_and_clamped(self, spark):
        ref = [5.0] * 100
        cur = [45.0] * 90 + [-3.0, 99.0] * 5  # out-of-range clamps to edges
        out = {r["bin"]: r for r in psi_report(
            self._df(spark, ref), self._df(spark, cur), "value", 0.0, 50.0,
            n_bins=5,
        ).collect()}
        assert out[0]["ref_n"] == 100 and out[0]["cur_n"] == 5  # clamped lows
        assert out[4]["cur_n"] == 95  # 90 in-bin + 5 clamped highs
        assert all(r["drifted"] for r in out.values())
        # PSI is computed from smoothed rationals; recompute in python
        p = [(c + 1) / (100 + 5) for c in (100, 0, 0, 0, 0)]
        q = [(c + 1) / (100 + 5) for c in (5, 0, 0, 0, 95)]
        exp = sum(
            round((pi - qi) * math.log(pi / qi), 9) for pi, qi in zip(p, q)
        )
        assert out[0]["psi_total"] == pytest.approx(round(exp, 6), abs=2e-6)

    def test_bad_params(self, spark):
        d = self._df(spark, [1.0])
        with pytest.raises(ValueError):
            psi_report(d, d, "value", 0.0, 1.0, n_bins=1)
        with pytest.raises(ValueError):
            psi_report(d, d, "value", 2.0, 1.0)


class TestStateRuns:
    def test_runs_collapse(self, spark):
        df = spark.createDataFrame(
            [(1, i, s) for i, s in enumerate("aabaaab")]
            + [(2, i, s) for i, s in enumerate("bb")],
            ["k", "o", "s"],
        )
        got = sorted(
            (r["k"], r["run_start"], r["state"], r["run_len"], r["run_end"])
            for r in state_runs(df, "k", "o", "s").collect()
        )
        assert got == [
            (1, 0, "a", 2, 1), (1, 2, "b", 1, 2), (1, 3, "a", 3, 5),
            (1, 6, "b", 1, 6), (2, 0, "b", 2, 1),
        ]

    def test_total_len_preserved(self, spark):
        df = spark.createDataFrame(
            [(i % 3, i, "s" + str((i * 7) % 2)) for i in range(200)],
            ["k", "o", "s"],
        )
        runs = state_runs(df, "k", "o", "s")
        assert runs.agg(F.sum("run_len")).first()[0] == 200


class TestRandomProject:
    def _emb(self, spark, n=20, dim=16, seed=3):
        rng = np.random.RandomState(seed)
        rows = [(i, [float(x) for x in rng.randn(dim)]) for i in range(n)]
        return spark.createDataFrame(rows, ["vec_id", "embedding"])

    def test_matches_numpy_and_is_deterministic(self, spark):
        dim, out_dim, seed = 16, 4, 7
        df = self._emb(spark, dim=dim)
        got = {
            (r["vec_id"], r["j"]): r["comp"]
            for r in similarity.random_project(
                df, dim=dim, out_dim=out_dim, seed=seed
            ).collect()
        }
        assert len(got) == 20 * out_dim
        signs = np.array(similarity.jl_signs(dim, out_dim, seed))
        assert set(np.unique(signs)) == {-1.0, 1.0}
        inv = 1.0 / math.sqrt(out_dim)
        for r in df.collect():
            v = np.array(r["embedding"])
            for j in range(out_dim):
                exp = round(float(signs[j] @ v) * inv, 4)
                assert got[(r["vec_id"], j)] == pytest.approx(exp, abs=1e-4)

    def test_distance_preservation_loose(self, spark):
        # JL sanity: projected pairwise distance correlates with original
        dim = 32
        df = self._emb(spark, n=30, dim=dim, seed=5)
        proj = (
            similarity.random_project(df, dim=dim, out_dim=16, seed=1)
            .groupBy("vec_id")
            .agg(F.collect_list(F.struct("j", "comp")).alias("c"))
            .collect()
        )
        pv = {
            r["vec_id"]: np.array(
                [x["comp"] for x in sorted(r["c"], key=lambda s: s["j"])]
            )
            for r in proj
        }
        ov = {r["vec_id"]: np.array(r["embedding"]) for r in df.collect()}
        o_d, p_d = [], []
        ids = sorted(ov)
        for i in range(0, len(ids), 3):
            for k in range(i + 1, len(ids), 7):
                o_d.append(np.linalg.norm(ov[ids[i]] - ov[ids[k]]))
                p_d.append(np.linalg.norm(pv[ids[i]] - pv[ids[k]]))
        corr = np.corrcoef(o_d, p_d)[0, 1]
        assert corr > 0.5


class TestFellegiSunter:
    def test_weights_sign_and_bounds(self):
        aw, dw = fs_weights(0.9, 0.05)
        assert aw > 0 > dw
        with pytest.raises(ValueError):
            fs_weights(0.1, 0.5)

    def test_classify_with_null_abstain(self, spark):
        df = spark.createDataFrame(
            [(1, 2, True, True), (3, 4, False, False), (5, 6, None, True)],
            T.StructType([
                T.StructField("id_a", T.LongType()),
                T.StructField("id_b", T.LongType()),
                T.StructField("f1", T.BooleanType()),
                T.StructField("f2", T.BooleanType()),
            ]),
        )
        rules = [(F.col("f1"), 2000, -1500), (F.col("f2"), 1000, -800)]
        out = {
            (r["id_a"]): (r["fs_milli"], r["verdict"])
            for r in fs_classify(df, rules, 2500, 500).collect()
        }
        assert out[1] == (3000, "match")
        assert out[3] == (-2300, "non_match")
        assert out[5] == (1000, "possible")  # f1 abstains at 0
        with pytest.raises(ValueError):
            fs_classify(df, rules, 100, 500)
        with pytest.raises(ValueError):
            fs_classify(df, [], 0, 0)


class TestDecayedSum:
    def test_hand_values_and_future_exclusion(self, spark):
        rows = [
            (1, "2024-01-30 00:00:00", 10.0),   # age 1d → w=0.5
            (1, "2024-01-29 00:00:00", 10.0),   # age 2d → w=0.25
            (1, "2024-02-05 00:00:00", 99.0),   # future: excluded
            (2, "2024-01-31 00:00:00", 8.0),    # age 0 → w=1
        ]
        df = spark.createDataFrame(rows, ["k", "ts", "v"]).withColumn(
            "ts", F.col("ts").cast("timestamp")
        )
        out = {
            r["k"]: (r["n"], r["decayed_sum"])
            for r in decayed_sum(
                df, "k", "ts", "v", "2024-01-31 00:00:00", 86400
            ).collect()
        }
        assert out[1] == (2, pytest.approx(7.5))
        assert out[2] == (1, pytest.approx(8.0))
        with pytest.raises(ValueError):
            decayed_sum(df, "k", "ts", "v", "2024-01-31 00:00:00", 0)


class TestGroupMinhash:
    def test_signature_merges_and_estimates(self, spark):
        from georef_ar_etl_spark.operators.sketches import (
            group_minhash,
            signature_similarity,
        )

        items = (
            [("s1", f"tok{i}") for i in range(200)]
            + [("s2", f"tok{i}") for i in range(200)]      # s2 == s1 set
            + [("s3", f"other{i}") for i in range(200)]     # s3 disjoint
            + [("s1", f"tok{i}") for i in range(50)]        # dup items: no-op
        )
        df = spark.createDataFrame(items, ["grp", "tok"])
        sig = group_minhash(df, "grp", "tok", k=16, seed=11)
        assert sig.count() == 3 * 16
        # shard-merge law: sketching two shards and taking elementwise min
        # equals sketching the whole (min is associative+commutative)
        shard_a = df.filter(F.col("tok").rlike("[02468]$"))
        shard_b = df.filter(~F.col("tok").rlike("[02468]$"))
        merged = (
            group_minhash(shard_a, "grp", "tok", k=16, seed=11)
            .unionByName(group_minhash(shard_b, "grp", "tok", k=16, seed=11))
            .groupBy("grp", "i")
            .agg(F.min("minv").alias("minv"))
        )
        key = lambda r: (r["grp"], r["i"], r["minv"])  # noqa: E731
        assert sorted(map(key, merged.collect())) == sorted(
            map(key, sig.collect())
        )
        out = {
            (r["grp_a"], r["grp_b"]): r["est_jaccard"]
            for r in signature_similarity(sig, 16).collect()
        }
        assert out[("s1", "s2")] == 1.0
        assert out[("s1", "s3")] <= 0.25  # disjoint sets: collisions only
        assert len(out) == 3
        with pytest.raises(ValueError):
            group_minhash(df, "grp", "tok", k=0)


class TestStratifiedSample:
    def _docs(self, spark, sizes):
        rows = [
            (f"{g}-{i:04d}", g)
            for g, n in sizes.items()
            for i in range(n)
        ]
        return spark.createDataFrame(rows, ["doc_id", "source"])

    def test_hamilton_quotas_sum_to_budget(self, spark):
        from georef_ar_etl_spark.operators.corpus import stratified_sample

        df = self._docs(spark, {"a": 500, "b": 300, "c": 200})
        out = stratified_sample(df, total_k=97, key_col="doc_id")
        got = {
            r["source"]: r["n"]
            for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()
        }
        # exact proportions: 48.5 / 29.1 / 19.4 → floors 48/29/19 = 96,
        # leftover 1 goes to the largest remainder (a: .5)
        assert got == {"a": 49, "b": 29, "c": 19}
        assert sum(got.values()) == 97

    def test_deterministic_and_budget_gt_corpus(self, spark):
        from georef_ar_etl_spark.operators.corpus import stratified_sample

        df = self._docs(spark, {"a": 5, "b": 3})
        all_rows = stratified_sample(df, total_k=100)
        assert all_rows.count() == 8  # quota caps at the group size
        s1 = sorted(r["doc_id"] for r in stratified_sample(df, 4).collect())
        s2 = sorted(
            r["doc_id"]
            for r in stratified_sample(df.repartition(7), 4).collect()
        )
        assert s1 == s2  # stable under partitioning
        with pytest.raises(ValueError):
            stratified_sample(df, 0)


def test_q126_decomposed_enumeration_matches_naive(spark, tmp_path):
    """q126's three-path candidate enumeration (seg equi-join + acctbal
    band join + NULL-field path) must emit exactly the rows the naive
    all-nation-pairs formulation keeps — including NULL mktsegment /
    acctbal / name abstain cases the sf fixtures never exercise."""
    import random

    from georef_ar_etl_spark.plans.queries import QUERY_FNS

    rng = random.Random(17)
    segs = ["AUTO", "HOME", "SHIP", None]
    names = ["Customer#%03d", "Custmr#%03d", "zz-%03d"]
    rows = []
    for i in range(220):
        rows.append(
            (
                i,
                None if i % 37 == 0 else names[rng.randrange(3)] % (i % 19),
                rng.randrange(3),
                None if i % 23 == 5 else round(rng.uniform(-999.0, 9999.0), 2),
                segs[rng.randrange(4)],
            )
        )
    df = spark.createDataFrame(
        rows,
        "c_custkey long, c_name string, c_nationkey int, "
        "c_acctbal double, c_mktsegment string",
    )
    sf = str(tmp_path)
    df.coalesce(1).write.mode("overwrite").parquet(sf + "/customer.parquet")

    got = {
        (r["id_a"], r["id_b"], r["fs_milli"], r["verdict"])
        for r in QUERY_FNS["q126_fellegi_sunter"](spark, sf).collect()
    }

    a, b = df.alias("a"), df.alias("b")
    naive_pairs = a.join(
        b,
        (F.col("a.c_nationkey") == F.col("b.c_nationkey"))
        & (F.col("a.c_custkey") < F.col("b.c_custkey")),
    ).select(
        F.col("a.c_custkey").alias("id_a"),
        F.col("b.c_custkey").alias("id_b"),
        F.levenshtein("a.c_name", "b.c_name").alias("nd"),
        (F.col("a.c_mktsegment") == F.col("b.c_mktsegment")).alias("seg"),
        (F.abs(F.col("a.c_acctbal") - F.col("b.c_acctbal")) <= 500).alias("bal"),
    )
    t1 = (
        F.when(F.col("nd") <= 3, 4170).when(F.col("nd") > 3, -3248).otherwise(0)
    )
    t2 = F.when(F.col("seg"), 1807).when(~F.col("seg"), -1415).otherwise(0)
    t3 = F.when(F.col("bal"), 3000).when(~F.col("bal"), -2170).otherwise(0)
    naive = (
        naive_pairs.withColumn("fs_milli", (t1 + t2 + t3).cast("bigint"))
        .withColumn(
            "verdict",
            F.when(F.col("fs_milli") >= 6000, "match")
            .when(F.col("fs_milli") >= 2500, "possible")
            .otherwise("non_match"),
        )
        .filter(F.col("fs_milli") >= 2500)
    )
    want = {
        (r["id_a"], r["id_b"], r["fs_milli"], r["verdict"])
        for r in naive.collect()
    }
    assert got == want and len(want) > 0

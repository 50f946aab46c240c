"""Round-5 session-3 operators: SCD2 point-in-time lookup, exact-substring
span removal, one-pass correlation matrix, lexical diversity, and the
Debezium-envelope catalog feed's quarantine classes."""

import pytest
from pyspark.sql import functions as F

from georef_ar_etl_spark.operators.scd import scd2_history, scd2_lookup
from georef_ar_etl_spark.operators.text import lexical_diversity, remove_dup_spans
from georef_ar_etl_spark.operators.validate import corr_matrix


class TestScd2Lookup:
    def _history(self, spark):
        # key 1: gold@[10,20) silver@[20,40) deleted@40 gold@[50,None)
        ch = spark.createDataFrame(
            [
                (1, 10, "u", "gold"),
                (1, 20, "u", "silver"),
                (1, 40, "d", None),
                (1, 50, "u", "gold"),
            ],
            ["k", "seq", "op", "tier"],
        )
        return scd2_history(ch, key_col="k", seq_col="seq", op_col="op")

    def _lookup(self, spark, probes):
        facts = spark.createDataFrame([(1, t) for t in probes], ["k", "at"])
        h = self._history(spark)
        out = scd2_lookup(facts, h, key_col="k", time_col="at",
                          payload_cols=["tier"])
        return {r["at"]: r["dim_tier"] for r in out.collect()}

    def test_versions_gaps_and_boundaries(self, spark):
        got = self._lookup(spark, [5, 10, 15, 20, 39, 40, 45, 50, 99])
        assert got[5] is None          # before first insert
        assert got[10] == "gold"       # valid_from inclusive
        assert got[15] == "gold"
        assert got[20] == "silver"     # half-open: new version at its from
        assert got[39] == "silver"
        assert got[40] is None         # deletion gap starts at the delete
        assert got[45] is None
        assert got[50] == "gold"       # re-insert opens a fresh version
        assert got[99] == "gold"       # open (is_current) version

    def test_unknown_key_gets_nulls(self, spark):
        facts = spark.createDataFrame([(2, 60)], ["k", "at"])
        out = scd2_lookup(facts, self._history(spark), key_col="k",
                          time_col="at", payload_cols=["tier"]).collect()
        assert out[0]["dim_tier"] is None


class TestRemoveDupSpans:
    def _run(self, spark, docs, k=3):
        df = spark.createDataFrame(docs, ["doc_id", "text"])
        return {
            r["doc_id"]: r
            for r in remove_dup_spans(df, k=k).collect()
        }

    def test_second_doc_loses_shared_span(self, spark):
        got = self._run(
            spark,
            [
                (1, "a b c x y"),
                (2, "p q a b c r"),
            ],
        )
        # doc 1 is the first occurrence of gram (a b c): untouched
        assert got[1]["kept_text"] == "a b c x y"
        assert got[1]["n_removed"] == 0
        # doc 2 keeps everything outside the duplicated 3-token span
        assert got[2]["kept_text"] == "p q r"
        assert got[2]["n_removed"] == 3

    def test_within_doc_repeat_keeps_first(self, spark):
        got = self._run(spark, [(1, "a b c z a b c")])
        assert got[1]["kept_text"] == "a b c z"
        assert got[1]["n_removed"] == 3

    def test_short_and_unique_docs_untouched(self, spark):
        got = self._run(spark, [(1, "a b"), (2, "q w e r t")])
        assert got[1]["kept_text"] == "a b"
        assert got[2]["n_removed"] == 0

    def test_overlapping_dup_grams_union(self, spark):
        # 'a b c d' duplicated as two overlapping grams in doc 2 -> the
        # union of their spans (4 tokens) is removed, not 6
        got = self._run(spark, [(1, "a b c d x"), (2, "y a b c d z")])
        assert got[2]["kept_text"] == "y z"
        assert got[2]["n_removed"] == 4


class TestCorrMatrix:
    def test_exact_correlations(self, spark):
        rows = [(float(x), 2.0 * x + 1.0, float(-x)) for x in range(1, 9)]
        df = spark.createDataFrame(rows, ["x", "y", "z"])
        out = {
            (r["col_a"], r["col_b"]): r
            for r in corr_matrix(df, {"x": "x", "y": "y", "z": "z"}).collect()
        }
        assert out[("x", "y")]["corr"] == pytest.approx(1.0)
        assert out[("x", "z")]["corr"] == pytest.approx(-1.0)
        assert out[("y", "z")]["corr"] == pytest.approx(-1.0)
        assert all(r["n"] == 8 for r in out.values())

    def test_independent_columns_near_zero(self, spark):
        rows = [(float(i % 2), float((i // 2) % 2)) for i in range(8)]
        df = spark.createDataFrame(rows, ["a", "b"])
        (r,) = corr_matrix(df, {"a": "a", "b": "b"}).collect()
        assert r["corr"] == pytest.approx(0.0)


class TestLexicalDiversity:
    def test_uniform_doc(self, spark):
        df = spark.createDataFrame([(1, "a b c d")], ["doc_id", "text"])
        (r,) = lexical_diversity(df).collect()
        assert r["n_tok"] == 4 and r["n_types"] == 4
        assert r["entropy"] == pytest.approx(2.0)
        assert r["simpson"] == pytest.approx(1.0)
        assert r["ttr"] == pytest.approx(1.0)

    def test_repeated_word_doc(self, spark):
        df = spark.createDataFrame([(1, "a a a a")], ["doc_id", "text"])
        (r,) = lexical_diversity(df).collect()
        assert r["entropy"] == pytest.approx(0.0)
        assert r["simpson"] == pytest.approx(0.0)
        assert r["ttr"] == pytest.approx(0.25)

    def test_half_half(self, spark):
        df = spark.createDataFrame([(1, "a a b b")], ["doc_id", "text"])
        (r,) = lexical_diversity(df).collect()
        assert r["entropy"] == pytest.approx(1.0)
        # 1 - (2*1 + 2*1) / (4*3)
        assert r["simpson"] == pytest.approx(round(1 - 4 / 12, 6))


class TestTableChecksum:
    def test_detects_missing_and_corrupted_rows(self, spark):
        from georef_ar_etl_spark.operators.validate import table_checksum

        rows = [(i, f"v{i}") for i in range(40)]
        src = spark.createDataFrame(rows, ["k", "v"])
        # drop k=7 (bucket 7), corrupt k=12 (bucket 4): counts catch the
        # first, only the checksum catches the second
        rep = spark.createDataFrame(
            [(k, "CORRUPT" if k == 12 else v) for k, v in rows if k != 7],
            ["k", "v"],
        )
        cs = {r["bucket"]: r for r in
              table_checksum(src, "k", ["k", "v"], n_buckets=8).collect()}
        cr = {r["bucket"]: r for r in
              table_checksum(rep, "k", ["k", "v"], n_buckets=8).collect()}
        for b in range(8):
            same_n = cs[b]["n"] == cr[b]["n"]
            same_c = cs[b]["checksum"] == cr[b]["checksum"]
            if b == 7:
                assert not same_n
            elif b == 4:
                assert same_n and not same_c
            else:
                assert same_n and same_c

    def test_order_insensitive(self, spark):
        from georef_ar_etl_spark.operators.validate import table_checksum

        rows = [(i, f"v{i}") for i in range(20)]
        a = table_checksum(
            spark.createDataFrame(rows, ["k", "v"]), "k", ["k", "v"]
        )
        b = table_checksum(
            spark.createDataFrame(rows[::-1], ["k", "v"]).repartition(7),
            "k",
            ["k", "v"],
        )
        assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


class TestEnvelopeFeedQuarantine:
    def test_reason_classes_partition_the_feed(self, spark, tmp_path):
        # miniature events fixture shaped like the driver's table
        ev = spark.createDataFrame(
            [(i, i % 7, "click") for i in range(26)],
            ["event_id", "user_id", "event_type"],
        ).withColumn("ts", F.current_timestamp()).withColumn(
            "value", F.lit(1.0)
        ).withColumn("props", F.lit("{}"))
        p = str(tmp_path / "events.parquet")
        ev.write.parquet(p)

        from georef_ar_etl_spark.plans.queries import _envelope_feed

        events, malformed = _envelope_feed(spark, str(tmp_path))
        good = events.select("seq").collect()
        bad = {
            (r["reason"], r["raw"] is None)
            for r in malformed.select("reason", "raw").collect()
        }
        # ids 0..25: m = id % 13; classes 3,4,5,6,7 quarantined twice each
        assert len(good) == 16
        assert {s["seq"] % 13 for s in good}.isdisjoint({3, 4, 5, 6, 7})
        assert bad == {
            ("unknown_op", False),
            ("no_lsn", False),
            ("no_image", False),
            ("bad_json", False),
            ("tombstone", True),
        }


class TestNgramNovelty:
    def test_scores(self, spark):
        from georef_ar_etl_spark.operators.text import ngram_novelty

        ref = spark.createDataFrame([(100, "a b c d e")], ["doc_id", "text"])
        aud = spark.createDataFrame(
            [
                (1, "a b c d e"),      # fully seen: 3 grams, all in ref
                (2, "x y z w v"),      # fully novel
                (3, "a b c d q"),      # grams: abc bcd cdq -> 2 seen
                (4, "a b"),            # < k tokens: novelty 1.0
            ],
            ["doc_id", "text"],
        )
        out = {r["doc_id"]: r for r in ngram_novelty(aud, ref, k=3).collect()}
        assert out[1]["novelty"] == pytest.approx(0.0)
        assert out[2]["novelty"] == pytest.approx(1.0)
        assert out[3]["n_grams"] == 3 and out[3]["n_seen"] == 2
        assert out[3]["novelty"] == pytest.approx(round(1 - 2 / 3, 6))
        assert out[4]["n_grams"] == 0 and out[4]["novelty"] == 1.0

    def test_occurrence_level_counting(self, spark):
        from georef_ar_etl_spark.operators.text import ngram_novelty

        ref = spark.createDataFrame([(9, "p q r")], ["doc_id", "text"])
        # 'p q r' appears twice among 5 grams -> both occurrences count
        aud = spark.createDataFrame(
            [(1, "p q r p q r x")], ["doc_id", "text"]
        )
        (r,) = ngram_novelty(aud, ref, k=3).collect()
        assert r["n_grams"] == 5 and r["n_seen"] == 2


class TestSlidingHllUniques:
    def test_trailing_window_merges_prior_days(self, spark):
        from georef_ar_etl_spark.operators.sketches import (
            hll_group_estimate,
            sliding_hll_uniques,
        )

        rows = (
            [("2024-01-01 10:00:00", f"u{i}") for i in range(40)]
            + [("2024-01-05 10:00:00", f"v{i}") for i in range(40)]
            + [("2024-01-20 10:00:00", f"u{i}") for i in range(40)]
        )
        df = spark.createDataFrame(rows, ["ts", "item"]).select(
            F.col("ts").cast("timestamp").alias("ts"), "item"
        )
        out = {
            str(r["day"]): r["est"]
            for r in sliding_hll_uniques(df, "ts", "item", 7, p=9).collect()
        }
        # day 5's window [day-6, day] includes day 1: ~80 uniques, well
        # above either single day; day 20 is beyond day 5's window: ~40
        assert out["2024-01-05"] > out["2024-01-01"] * 1.5
        assert abs(out["2024-01-20"] - out["2024-01-01"]) < 2
        # sanity: estimates in HLL error range of truth
        assert 30 < out["2024-01-01"] < 50
        assert 60 < out["2024-01-05"] < 100


class TestTokenGramIndex:
    def _mk(self, spark, tmp_path):
        from georef_ar_etl_spark.operators.index_maintenance import TokenGramIndex

        return TokenGramIndex(spark, str(tmp_path / "idx"), k=2, n_buckets=4)

    def _state(self, spark, rows):
        return spark.createDataFrame(rows, ["doc_id", "tokens"])

    def _changes(self, spark, epoch, rows):
        # (op, doc_id, tokens) shaped like engine.changes() output
        return spark.createDataFrame(
            [(epoch, 0, op, d, t, 0) for op, d, t in rows],
            ["change_epoch", "batch_id", "op", "doc_id", "tokens", "bucket"],
        )

    def test_incremental_equals_recompute(self, spark, tmp_path):
        idx = self._mk(spark, tmp_path)
        idx.bootstrap(
            self._state(
                spark,
                [("a", [1, 2, 3]), ("b", [2, 3, 4]), ("c", [9, 9])],
            ),
            source_epoch=0,
        )
        # epoch 1: update b (loses the shared 2-3 gram), delete c, insert d
        idx.refresh(
            self._changes(
                spark,
                1,
                [
                    ("upsert", "b", [7, 8]),
                    ("delete", "c", None),
                    ("upsert", "d", [1, 2, 3, 4]),
                ],
            ),
            source_epoch=1,
        )
        got = sorted(
            tuple(r) for r in idx.occurrences().collect()
        )
        fresh = self._mk(spark, tmp_path / "fresh")
        fresh.bootstrap(
            self._state(
                spark,
                [("a", [1, 2, 3]), ("b", [7, 8]), ("d", [1, 2, 3, 4])],
            ),
            source_epoch=0,
        )
        want = sorted(tuple(r) for r in fresh.occurrences().collect())
        assert got == want
        # a and d share grams (1,2) and (2,3); first occurrences are a's
        dups = {r["g"]: r for r in idx.dup_grams().collect()}
        assert len(dups) == 2
        assert all(r["n_docs"] == 2 and r["first_key"].startswith("a@") for r in dups.values())

    def test_short_arrays_and_epoch_tracking(self, spark, tmp_path):
        idx = self._mk(spark, tmp_path)
        idx.bootstrap(self._state(spark, [("a", [5])]), source_epoch=0)
        assert idx.occurrences().count() == 0
        idx.refresh(
            self._changes(spark, 1, [("upsert", "a", [5, 6])]), source_epoch=1
        )
        assert idx.last_source_epoch == 1
        assert idx.occurrences().count() == 1


class TestSuffixArrayRanks:
    def _ranks(self, spark, docs):
        from georef_ar_etl_spark.operators.text import suffix_array_ranks

        df = spark.createDataFrame(docs, ["doc_id", "text"])
        return {
            (r["doc_id"], r["s"]): r["sa_rank"]
            for r in suffix_array_ranks(df).collect()
        }

    def test_hand_computed_with_cross_doc_ties(self, spark):
        got = self._ranks(spark, [(1, "b a"), (2, "a b a")])
        # sorted suffixes: "a" (x2, tied), "a b a", "b a" (x2, tied)
        assert got[(1, 2)] == 1 and got[(2, 3)] == 1
        assert got[(2, 1)] == 2
        assert got[(1, 1)] == 3 and got[(2, 2)] == 3

    def test_repeated_token_doc_needs_multiple_rounds(self, spark):
        # 'a'*9: suffix order is purely by length (prefix sorts first),
        # resolved only at prefix length >= 8 -> 4 doubling rounds
        got = self._ranks(spark, [(7, " ".join(["a"] * 9))])
        assert got == {(7, s): 10 - s for s in range(1, 10)}

    def test_matches_python_brute_force(self, spark):
        docs = [
            (1, "the cat sat on the mat"),
            (2, "the cat sat on the hat"),
            (3, "on the mat the cat sat"),
            (4, "sat sat sat the cat"),
        ]
        got = self._ranks(spark, docs)
        sufs = []
        for d, t in docs:
            ws = t.split()
            for s in range(1, len(ws) + 1):
                sufs.append((ws[s - 1:], d, s))
        order = sorted(set(tuple(x[0]) for x in sufs))
        rank_of = {suf: i + 1 for i, suf in enumerate(order)}
        want = {(d, s): rank_of[tuple(ws)] for ws, d, s in sufs}
        assert got == want


class TestRepeatedSpans:
    def test_finds_shared_span_with_full_length(self, spark):
        from georef_ar_etl_spark.operators.text import repeated_spans

        df = spark.createDataFrame(
            [
                (1, "x x q w e r t y z z"),
                (2, "p p q w e r t y k"),
            ],
            ["doc_id", "text"],
        )
        out = repeated_spans(df, min_len=4).collect()
        # the shared run 'q w e r t y' (6 words) appears as adjacent-pair
        # LCPs 6,5,4 (suffixes starting inside the run)
        lcps = sorted(r["lcp"] for r in out)
        assert lcps == [4, 5, 6]
        top = max(out, key=lambda r: r["lcp"])
        assert {top["doc_a"], top["doc_b"]} == {1, 2}
        assert top["lcp"] == 6

    def test_no_spans_below_min_len(self, spark):
        from georef_ar_etl_spark.operators.text import repeated_spans

        df = spark.createDataFrame(
            [(1, "a b c d"), (2, "c d e f")], ["doc_id", "text"]
        )
        assert repeated_spans(df, min_len=4).count() == 0
        assert repeated_spans(df, min_len=2).count() == 1


class TestGroupLinreg:
    def test_perfect_line_and_degenerate_x(self, spark):
        from georef_ar_etl_spark.operators.validate import group_linreg

        rows = [("a", float(x), 3.0 * x + 2.0) for x in range(10)] + [
            ("b", 5.0, float(v)) for v in (1, 2, 3)
        ]
        df = spark.createDataFrame(rows, ["g", "x", "y"])
        out = {r["g"]: r for r in group_linreg(df, ["g"], "x", "y").collect()}
        assert out["a"]["slope"] == pytest.approx(3.0)
        assert out["a"]["intercept"] == pytest.approx(2.0)
        assert out["a"]["r2"] == pytest.approx(1.0)
        # all-equal x: no defined trend
        assert out["b"]["slope"] is None and out["b"]["r2"] is None


def test_repair_plan_converges_replica_and_prunes_buckets(spark):
    """pt-table-sync: the plan contains exactly the divergence (upserts for
    missing/different, deletes for phantoms), a healthy replica yields an
    EMPTY plan with zero mismatched buckets, NULL==NULL does not repair,
    NULL!=value does, and applying the plan converges the replica."""
    from pyspark.sql import functions as F

    from georef_ar_etl_spark.operators.validate import repair_plan

    rows = [(f"k{i:02d}", f"v{i}" if i % 5 else None, i) for i in range(40)]
    src = spark.createDataFrame(rows, "k string, v string, n int")

    # healthy replica: empty plan, no bucket read in phase 2
    stats = {}
    plan = repair_plan(src, src, "k", ["k", "v", "n"], F.xxhash64("k"), 8, stats)
    assert plan.count() == 0 and stats["buckets_mismatched"] == 0

    # diverged replica: drop k03, corrupt k07's n, null-out k11's v (NULL vs
    # value must repair; src NULLs at multiples of 5 stay equal-null and
    # never enter the plan), phantom kZZ
    rep = (
        src.filter("k <> 'k03'")
        .withColumn("n", F.when(F.col("k") == "k07", 99).otherwise(F.col("n")))
        .withColumn(
            "v", F.when(F.col("k") == "k11", F.lit(None)).otherwise(F.col("v"))
        )
        .unionByName(
            spark.createDataFrame([("kZZ", "ghost", -1)], "k string, v string, n int")
        )
    )
    stats = {}
    plan = repair_plan(src, rep, "k", ["k", "v", "n"], F.xxhash64("k"), 8, stats)
    got = {(r["op"], r["k"], r["v"], r["n"]) for r in plan.collect()}
    assert got == {
        ("upsert", "k03", "v3", 3),
        ("upsert", "k07", "v7", 7),
        ("upsert", "k11", "v11", 11),  # NULL-vs-value difference repairs
        ("delete", "kZZ", None, None),
    }
    assert 0 < stats["buckets_mismatched"] <= stats["buckets_checked"]

    # applying the plan converges the replica exactly
    ups = plan.filter("op = 'upsert'").select("k", "v", "n")
    dels = {r["k"] for r in plan.filter("op = 'delete'").select("k").collect()}
    del_keys = {r["k"] for r in ups.collect()} | dels
    healed = rep.filter(~F.col("k").isin(list(del_keys))).unionByName(ups)
    assert sorted(map(tuple, healed.collect())) == sorted(map(tuple, src.collect()))

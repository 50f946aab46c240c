"""Round-5 session-3 operators: SCD2 point-in-time lookup, exact-substring
span removal, one-pass correlation matrix, lexical diversity, and the
Debezium-envelope catalog feed's quarantine classes."""

import math

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

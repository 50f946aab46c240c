"""A/B: line_dedup's min(struct) winner aggregate vs the naive
row_number()-over-line window, on a corpus with an adversarial
boilerplate line (one line duplicated across ~30% of docs — the hot key
the window formulation sorts in ONE task). Launched standalone:

    spark-submit --py-files /tmp/engine.zip BENCH/line_dedup_ab.py [n_docs]

Prints one JSON line with both wall times; results are asserted equal
first. The point at 100 TB: the winner aggregate's partials combine
map-side, so the boilerplate key ships one row per task instead of
every occurrence into a single window partition."""

from __future__ import annotations

import json
import sys
import time


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 300_000

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from georef_ar_etl_spark.operators.text import line_dedup, to_lines
    from georef_ar_etl_spark.session import get_spark

    spark = get_spark(app_name="line_dedup_ab")

    # synthetic corpus: 6 lines/doc, every 3rd doc starts with THE
    # boilerplate line; remaining lines unique per doc
    docs = spark.range(n_docs).selectExpr(
        "id AS doc_id",
        """concat(
             CASE WHEN id % 3 = 0
                  THEN 'subscribe to our newsletter for updates today now '
                  ELSE concat('unique head ', id, ' words go here padding ')
             END,
             'body line one for doc ', id, ' alpha beta gamma delta ',
             'body line two for doc ', id, ' epsilon zeta eta theta ',
             'body line three for doc ', id, ' iota kappa lambda mu ',
             'body line four for doc ', id, ' nu xi omicron pi rho ',
             'tail line for doc ', id, ' sigma tau upsilon phi chi'
           ) AS text""",
    )
    lines = to_lines(docs, words_per_line=8).cache()
    lines.count()

    def run_agg():
        return line_dedup(lines)

    def run_agg_semi_join():
        # the pre-round-5 formulation: winners + a redundant left-semi
        # join back to the corpus — kept in the A/B as the regression pin
        winners = (
            lines.groupBy("line")
            .agg(F.min(F.struct(F.col("doc_id"), F.col("line_no"))).alias("w"))
            .select("line", F.col("w.doc_id").alias("doc_id"),
                    F.col("w.line_no").alias("line_no"))
        )
        kept = lines.join(winners, ["line", "doc_id", "line_no"], "left_semi")
        ordered = F.array_sort(F.collect_list(F.struct("line_no", "line")))
        return kept.groupBy("doc_id").agg(
            F.array_join(F.transform(ordered, lambda s: s["line"]), "\n")
            .alias("text"),
            F.count(F.lit(1)).alias("n_lines"),
        )

    def run_window():
        w = Window.partitionBy("line").orderBy("doc_id", "line_no")
        kept = (
            lines.select("*", F.row_number().over(w).alias("_rn"))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        ordered = F.array_sort(F.collect_list(F.struct("line_no", "line")))
        return kept.groupBy("doc_id").agg(
            F.array_join(F.transform(ordered, lambda s: s["line"]), "\n")
            .alias("text"),
            F.count(F.lit(1)).alias("n_lines"),
        )

    # equality first (on a 20k-doc slice to keep the check quick)
    small = to_lines(docs.limit(20_000), words_per_line=8)
    a = line_dedup(small).selectExpr("doc_id", "md5(text) f", "n_lines")
    w0 = Window.partitionBy("line").orderBy("doc_id", "line_no")
    b = (
        small.select("*", F.row_number().over(w0).alias("_rn"))
        .filter("_rn = 1")
        .groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("line_no", "line"))),
                    lambda s: s["line"],
                ),
                "\n",
            ).alias("text"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .selectExpr("doc_id", "md5(text) f", "n_lines")
    )
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0

    out = {}
    for name, fn in (
        ("agg_min_struct", run_agg),
        ("agg_semi_join", run_agg_semi_join),
        ("window_row_number", run_window),
    ):
        best = None
        for _ in range(3):
            t0 = time.time()
            fn().write.mode("overwrite").format("noop").save()
            dt = time.time() - t0
            best = dt if best is None or dt < best else best
        out[name] = round(best, 3)
    out["n_docs"] = n_docs
    out["n_lines"] = lines.count()
    print(json.dumps(out))


if __name__ == "__main__":
    main()

"""Per-query isolation bench (guide §1.4): time individual catalog queries
with the noop sink against any sf dir, and optionally dump
``.explain('formatted')`` to a file per query.

This file is NOT the driver's bench (bench.py is frozen); it exists so the
optimization rounds can isolate one query at the driver's scale factor
without paying for the whole headline.

Usage:
  python bench_extra.py q126_fellegi_sunter q104_set_similarity_join \
      [--sf-dir /root/testdata/sf1.0] [--trials 3] [--explain-dir plans/r06] \
      [--suffix _before]
"""

from __future__ import annotations

import argparse
import contextlib
import io
import json
import os
import time

from georef_ar_etl_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0"))
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--explain-dir", default=None)
    ap.add_argument("--suffix", default="")
    args = ap.parse_args()

    cores = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    spark = get_spark(app_name="bench_extra", cores=cores)
    from georef_ar_etl_spark.plans.queries import QUERY_FNS

    # warmup: session, JIT, python workers, parquet footers (bench.py rule)
    QUERY_FNS["q10_group_minmax"](spark, args.sf_dir).write.mode("overwrite").format("noop").save()
    spark.range(1000).mapInPandas(lambda it: it, "id long").count()

    out = {}
    for name in args.queries:
        fn = QUERY_FNS[name]
        if args.explain_dir:
            os.makedirs(args.explain_dir, exist_ok=True)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                fn(spark, args.sf_dir).explain("formatted")
            with open(os.path.join(args.explain_dir, f"{name}{args.suffix}.txt"), "w") as f:
                f.write(buf.getvalue())
        trials = []
        for _ in range(args.trials):
            spark.sparkContext.setJobDescription(f"bench_extra: {name}")
            t0 = time.time()
            fn(spark, args.sf_dir).write.mode("overwrite").format("noop").save()
            trials.append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        out[name] = {"best": min(trials), "trials": trials}
        print(f"{name}: best={min(trials)} trials={trials}", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

"""Unit tests for the CDC building blocks (SURVEY.md §5 strategy: one test
module per operator, plus property-style equivalence checks)."""

import pytest
from pyspark.sql import functions as F

from georef_ar_etl_spark import datagen
from georef_ar_etl_spark.functions.scalar import clean_string, doc_group, zero_pad
from georef_ar_etl_spark.functions.tokens import (
    normalize_tokens_py,
    with_normalized_tokens,
)
from georef_ar_etl_spark.operators.dedup_events import (
    DuplicateKeyError,
    latest_per_key,
    latest_per_key_salted,
)
from georef_ar_etl_spark.operators.merge import align_columns
from georef_ar_etl_spark.operators.validate import split_quarantine, tag_invalid
from georef_ar_etl_spark.schemas import (
    STATE_SCHEMA,
    evolved_state_schema,
    validate_contract,
)


# ---------------------------------------------------------------- normalize
CASES = [
    [1, 2, 3],
    [1, 2, 3, 0, 0],          # trailing padding stripped
    [0, 1, 0, 2, 0, 0],       # interior zeros kept, trailing stripped
    [0, 0, 0],                # all padding → empty
    [-5, 1, -1, 2, 0],        # negatives dropped, then trailing zero stripped
    [7],
    [-1],                     # → empty
]


@pytest.mark.parametrize("impl", ["pandas", "builtin"])
def test_normalize_impls_match_python(spark, impl):
    df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(CASES)], "id int, tokens array<int>"
    ).withColumn("op", F.lit("update")).withColumn("n_tok", F.lit(0))
    out = {
        r["id"]: list(r["tokens"])
        for r in with_normalized_tokens(df, impl=impl).collect()
    }
    for i, case in enumerate(CASES):
        assert out[i] == normalize_tokens_py(case), (impl, case)


def test_normalize_recomputes_n_tok(spark):
    df = spark.createDataFrame(
        [("x", [1, 2, 0, 0], 99, "update")], "doc_id string, tokens array<int>, n_tok int, op string"
    )
    row = with_normalized_tokens(df).collect()[0]
    assert row["n_tok"] == 2  # stale incoming 99 ignored


def test_normalize_null_passthrough(spark):
    df = spark.createDataFrame(
        [("x", None, None, "delete")], "doc_id string, tokens array<int>, n_tok int, op string"
    )
    row = with_normalized_tokens(df).collect()[0]
    assert row["tokens"] is None and row["n_tok"] is None


# -------------------------------------------------------------------- dedup
def _events_df(spark, rows):
    return spark.createDataFrame(
        rows, "batch_id long, seq long, op string, doc_id string, tokens array<int>, n_tok int, source string"
    )


def test_latest_per_key_last_writer_wins(spark):
    df = _events_df(spark, [
        (0, 1, "insert", "a", [1], 1, "s"),
        (0, 3, "update", "a", [3], 1, "s"),
        (0, 2, "update", "a", [2], 1, "s"),
        (0, 4, "insert", "b", [4], 1, "s"),
    ])
    got = {r["doc_id"]: r["tokens"][0] for r in latest_per_key(df).collect()}
    assert got == {"a": 3, "b": 4}


def test_salted_dedup_equals_plain(spark):
    events = datagen.gen_events(
        [r["doc_id"] for r in datagen.gen_initial_state(100, seed=1, max_len=16)],
        n_events=2000, n_batches=1, seed=2, max_len=16,
    )
    df = datagen.events_to_df(spark, events)
    plain = {r["doc_id"]: r["seq"] for r in latest_per_key(df).collect()}
    salted = {r["doc_id"]: r["seq"] for r in latest_per_key_salted(df, n_salt=8).collect()}
    assert plain == salted  # salting must not change results (north rule)


def test_strict_mode_raises_on_duplicate(spark):
    df = _events_df(spark, [
        (0, 1, "insert", "a", [1], 1, "s"),
        (0, 2, "update", "a", [2], 1, "s"),
    ])
    with pytest.raises(DuplicateKeyError):
        latest_per_key(df, strict=True)


# ----------------------------------------------------------------- validate
def test_validation_reasons(spark):
    df = _events_df(spark, [
        (0, 1, "upsert", "0101234567890", [1], 1, "s"),   # bad op
        (0, 2, "insert", "short", [1], 1, "s"),            # bad id length
        (0, 3, "insert", None, [1], 1, "s"),               # null id
        (0, 4, "insert", "0101234567890", [], 0, "s"),     # empty tokens
        (0, 5, "insert", "0101234567890", None, None, "s"),# null tokens
        (0, 6, "delete", "0101234567890", None, None, "s"),# valid delete
        (0, 7, "insert", "0101234567890", [1], 1, "s"),    # valid insert
    ])
    vb = split_quarantine(tag_invalid(df))
    reasons = {r["seq"]: r["reason"] for r in vb.quarantined.collect()}
    assert reasons == {1: "bad_op", 2: "bad_id", 3: "bad_id", 4: "empty_tokens", 5: "empty_tokens"}
    assert sorted(r["seq"] for r in vb.valid.collect()) == [6, 7]


def test_dim_validation_quarantines_unknown_group(spark):
    dim = spark.createDataFrame(datagen.gen_dim())
    df = _events_df(spark, [
        (0, 1, "insert", "0112345678901", [1], 1, "s"),  # group 01 known
        (0, 2, "insert", "9912345678901", [1], 1, "s"),  # group 99 unknown
        (0, 3, "delete", "9912345678901", None, None, "s"),  # deletes skip dim check
    ])
    vb = split_quarantine(tag_invalid(df, dim=dim))
    assert {r["seq"]: r["reason"] for r in vb.quarantined.collect()} == {2: "unknown_group"}
    assert sorted(r["seq"] for r in vb.valid.collect()) == [1, 3]


# ------------------------------------------------------------------- schema
def test_contract_accepts_additive_and_rejects_breaking(spark):
    ok = validate_contract(
        datagen.events_to_df(
            spark, [{"batch_id": 0, "seq": 1, "op": "insert", "doc_id": "x",
                     "tokens": [1], "n_tok": 1, "source": "s", "src_meta": "m"}]
        ).schema,
        STATE_SCHEMA,
    )
    assert ok.ok and ok.added_columns == ["src_meta"]

    bad = validate_contract(
        spark.createDataFrame([], "batch_id long, seq long, op string, doc_id string").schema,
        STATE_SCHEMA,
    )
    assert not bad.ok and any("tokens" in e for e in bad.errors)


def test_evolved_schema_and_align(spark):
    batch_schema = datagen.events_to_df(
        spark, [{"batch_id": 0, "seq": 1, "op": "insert", "doc_id": "x",
                 "tokens": [1], "n_tok": 1, "source": "s", "src_meta": "m"}]
    ).schema
    evolved = evolved_state_schema(STATE_SCHEMA, batch_schema)
    assert [f.name for f in evolved.fields] == ["doc_id", "tokens", "n_tok", "source", "src_meta"]
    old = spark.createDataFrame([("d", [1], 1, "s")], STATE_SCHEMA)
    aligned = align_columns(old, evolved)
    row = aligned.collect()[0]
    assert row["src_meta"] is None  # missing-column-as-null read


# ------------------------------------------------------------------ scalars
def test_clean_string(spark):
    df = spark.createDataFrame([("  a   b \t c\nsecond line",)], "s string")
    assert df.select(clean_string(F.col("s")).alias("c")).collect()[0]["c"] == "a b c"


def test_doc_group_and_zero_pad(spark):
    df = spark.createDataFrame([("0612345678901", 7)], "doc_id string, x int")
    row = df.select(
        doc_group(F.col("doc_id")).alias("g"), zero_pad(F.col("x"), 5).alias("p")
    ).collect()[0]
    assert row["g"] == "06" and row["p"] == "00007"


def test_count_distinct_and_approx(spark):
    """Exact vs approx distinct counting (reference: count(DISTINCT
    nomencla), georef_ar_etl/streets.py:156-160). approx_count_distinct is
    the one-pass bounded-memory HLL path for 100 TB cardinality work —
    assert it lands within 5% of exact."""
    from pyspark.sql import functions as F

    df = spark.range(20000).selectExpr("id % 1077 AS k", "id % 7 AS g")
    exact = df.groupBy("g").agg(F.countDistinct("k").alias("n")).collect()
    approx = {
        r["g"]: r["n"]
        for r in df.groupBy("g").agg(F.approx_count_distinct("k").alias("n")).collect()
    }
    for r in exact:
        assert abs(approx[r["g"]] - r["n"]) <= 0.05 * r["n"], (r["g"], r["n"])


def test_asof_join_semantics(spark):
    """Backward inclusive as-of: equal-timestamp right rows match; ties on
    (key, time) resolve to max tie_col; keys with no earlier right row get
    nulls; left rows pass through untouched."""
    from georef_ar_etl_spark.operators.temporal import asof_join

    left = spark.createDataFrame(
        [(1, 10, "a"), (1, 25, "b"), (2, 5, "c"), (3, 50, "d")],
        "k long, t long, tag string",
    )
    right = spark.createDataFrame(
        [(1, 10, 100, "x"), (1, 10, 101, "x2"), (1, 20, 102, "y"), (2, 7, 103, "z")],
        "k long, t long, seq long, v string",
    )
    out = {
        (r["k"], r["t"]): (r["asof_seq"], r["asof_v"])
        for r in asof_join(
            left, right, "k", "k", "t", "t",
            right_cols=["seq", "v"], tie_col="seq",
        ).collect()
    }
    assert out[(1, 10)] == (101, "x2")   # inclusive + max-tie at equal time
    assert out[(1, 25)] == (102, "y")    # latest earlier row
    assert out[(2, 5)] == (None, None)   # right row exists but only later
    assert out[(3, 50)] == (None, None)  # key absent from right


def test_range_join_bucketed_boundaries(spark):
    """Half-open [t, t+W): an event exactly at t matches, at t+W does not,
    including events in the probe's SECOND candidate bucket (the case the
    bucket trick must not miss)."""
    from georef_ar_etl_spark.operators.temporal import range_join_bucketed

    probes = spark.createDataFrame(
        [(1, 7, "2024-01-01 00:00:30")], "probe_id long, k long, t string"
    ).select("probe_id", "k", F.col("t").cast("timestamp_ntz").alias("t"))
    ev = spark.createDataFrame(
        [
            (10, 7, "2024-01-01 00:00:30.000000"),  # == t -> in
            (11, 7, "2024-01-01 00:00:59.900000"),  # same bucket -> in
            (12, 7, "2024-01-01 00:01:29.900000"),  # NEXT bucket -> in
            (13, 7, "2024-01-01 00:01:30.000000"),  # == t+W -> out
            (14, 7, "2024-01-01 00:00:29.999999"),  # before t -> out
            (15, 8, "2024-01-01 00:00:40"),         # other key -> out
        ],
        "event_id long, user_id long, ts string",
    ).select("event_id", "user_id", F.col("ts").cast("timestamp_ntz").alias("ts"))
    got = sorted(
        r["event_id"]
        for r in range_join_bucketed(
            probes, ev, "k", "user_id", "t", "ts", window_seconds=60
        ).collect()
    )
    assert got == [10, 11, 12]


def test_asof_join_matches_pandas_merge_asof(spark):
    """Property check against the REFERENCE implementation: on seeded
    random frames with unique (key, time) pairs, asof_join must agree with
    pandas.merge_asof (backward, allow_exact_matches=True) row for row."""
    import numpy as np
    import pandas as pd

    from georef_ar_etl_spark.operators.temporal import asof_join

    rng = np.random.RandomState(17)
    n_l, n_r = 400, 300
    lpd = pd.DataFrame({
        "k": rng.randint(0, 12, n_l).astype("int64"),
        "t": rng.choice(np.arange(0, 5000, dtype="int64"), n_l, replace=False),
    })
    rpd = pd.DataFrame({
        "k": rng.randint(0, 12, n_r).astype("int64"),
        "t": rng.choice(np.arange(0, 5000, dtype="int64"), n_r, replace=False),
        "v": rng.randint(0, 10_000, n_r).astype("int64"),
    })
    want = pd.merge_asof(
        lpd.sort_values("t"), rpd.sort_values("t"),
        on="t", by="k", direction="backward", allow_exact_matches=True,
        suffixes=("", "_r"),
    )
    expect = {
        (int(r.k), int(r.t)): (None if pd.isna(r.v) else int(r.v))
        for r in want.itertuples()
    }
    got = {
        (r["k"], r["t"]): r["asof_v"]
        for r in asof_join(
            spark.createDataFrame(lpd), spark.createDataFrame(rpd),
            "k", "k", "t", "t", right_cols=["v"],
        ).collect()
    }
    assert got == expect


def test_rollup_coarser_rejects_non_nesting_granularity(spark):
    import pytest

    from georef_ar_etl_spark.operators.temporal import rollup, rollup_coarser

    ev = spark.createDataFrame(
        [("2024-01-01 00:10:00", "a", 1.0)], "ts string, event_type string, value double"
    ).select(F.col("ts").cast("timestamp_ntz").alias("ts"), "event_type", "value")
    fine = rollup(ev, "ts", ["event_type"], "value", bucket_seconds=90)
    # 240 % 90 != 0, so some 90 s fine bucket straddles a 240 s boundary
    # (e.g. [180, 270) straddles 240) — non-nesting granularities must raise
    with pytest.raises(ValueError, match="not a multiple"):
        rollup_coarser(fine, ["event_type"], bucket_seconds=240, fine_seconds=90)
    # multiples nest fine (90 | 3600) — no error
    rollup_coarser(fine, ["event_type"], bucket_seconds=3600, fine_seconds=90)


def test_sessionize_gap_boundary(spark):
    """Second-granular gap contract: a floored-epoch gap of exactly
    gap_seconds stays in the SAME session (> not >=); one second more
    splits. Also: each key's first event starts session 0."""
    from georef_ar_etl_spark.operators.temporal import sessionize

    rows = [
        (1, 1, "2024-01-01 00:00:00"),
        (1, 2, "2024-01-01 00:30:00"),   # gap exactly 1800 -> same session
        (1, 3, "2024-01-01 01:00:01"),   # gap 1801 -> new session
        (2, 4, "2024-01-01 05:00:00"),   # other key -> its own session 0
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts string"
    ).select("user_id", "event_id", F.col("ts").cast("timestamp_ntz").alias("ts"))
    got = {
        r["event_id"]: r["session_idx"]
        for r in sessionize(df, gap_seconds=1800, order_col="event_id").collect()
    }
    assert got == {1: 0, 2: 0, 3: 1, 4: 0}


def test_asof_join_directions_match_pandas(spark):
    """forward / nearest / tolerance against the reference implementation:
    on seeded random frames with unique (key, time) pairs, every
    (direction, tolerance) combination must agree with pandas.merge_asof
    row for row — including nearest's backward tie-break."""
    import numpy as np
    import pandas as pd

    from georef_ar_etl_spark.operators.temporal import asof_join

    rng = np.random.RandomState(23)
    n_l, n_r = 400, 300
    lpd = pd.DataFrame({
        "k": rng.randint(0, 12, n_l).astype("int64"),
        "t": rng.choice(np.arange(0, 5000, dtype="int64"), n_l, replace=False),
    })
    rpd = pd.DataFrame({
        "k": rng.randint(0, 12, n_r).astype("int64"),
        "t": rng.choice(np.arange(0, 5000, dtype="int64"), n_r, replace=False),
        "v": rng.randint(0, 10_000, n_r).astype("int64"),
    })
    ldf, rdf = spark.createDataFrame(lpd), spark.createDataFrame(rpd)

    for direction in ("backward", "forward", "nearest"):
        for tol in (None, 40):
            want = pd.merge_asof(
                lpd.sort_values("t"), rpd.sort_values("t"),
                on="t", by="k", direction=direction,
                allow_exact_matches=True,
                tolerance=tol, suffixes=("", "_r"),
            )
            expect = {
                (int(r.k), int(r.t)): (None if pd.isna(r.v) else int(r.v))
                for r in want.itertuples()
            }
            got = {
                (r["k"], r["t"]): r["asof_v"]
                for r in asof_join(
                    ldf, rdf, "k", "k", "t", "t", right_cols=["v"],
                    direction=direction, tolerance=tol,
                ).collect()
            }
            assert got == expect, (direction, tol)


def test_asof_join_forward_nearest_semantics(spark):
    """Deterministic contract cases: forward inclusive equal-time match
    with MIN tie; nearest exact-tie distance prefers backward; tolerance
    nulls a too-far match per side."""
    from georef_ar_etl_spark.operators.temporal import asof_join

    left = spark.createDataFrame(
        [(1, 10, "a"), (1, 25, "b"), (2, 5, "c")],
        "k long, t long, tag string",
    )
    right = spark.createDataFrame(
        [(1, 10, 100, "x"), (1, 10, 101, "x2"), (1, 40, 102, "y"),
         (2, 7, 103, "z")],
        "k long, t long, seq long, v string",
    )

    def run(**kw):
        return {
            (r["k"], r["t"]): (r["asof_seq"], r["asof_v"])
            for r in asof_join(
                left, right, "k", "k", "t", "t",
                right_cols=["seq", "v"], tie_col="seq", **kw,
            ).collect()
        }

    fwd = run(direction="forward")
    assert fwd[(1, 10)] == (100, "x")    # inclusive + MIN-tie at equal time
    assert fwd[(1, 25)] == (102, "y")    # earliest later row
    assert fwd[(2, 5)] == (103, "z")

    near = run(direction="nearest")
    # probe t=25: backward at 10 (d=15), forward at 40 (d=15) -> tie ->
    # backward wins (pandas tie-break); backward-at-tie is max tie_col
    assert near[(1, 25)] == (101, "x2")
    assert near[(1, 10)] == (101, "x2")  # d=0 backward

    tol = run(direction="nearest", tolerance=10)
    assert tol[(1, 25)] == (None, None)  # both sides beyond tolerance
    assert tol[(2, 5)] == (103, "z")     # forward d=2 within tolerance


def test_group_numeric_profile_approx_tracks_exact(spark):
    from georef_ar_etl_spark.operators.sketches import group_numeric_profile

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    qs = [0.25, 0.5, 0.75, 0.99]
    # rank-error contract: the approx answer for q must land between the
    # exact quantiles at q±eps (percentile_approx bounds RANK error — in a
    # sparse tail the VALUE gap is legitimately wide)
    eps = 0.02
    bracket = sorted({max(0.0, q - eps) for q in qs} | {min(1.0, q + eps) for q in qs})
    exact = {
        r["event_type"]: r
        for r in group_numeric_profile(ev, "event_type", "value", qs=qs).collect()
    }
    brackets = {
        r["event_type"]: r["quantiles"]
        for r in group_numeric_profile(ev, "event_type", "value", qs=bracket).collect()
    }
    approx = {
        r["event_type"]: r
        for r in group_numeric_profile(
            ev, "event_type", "value", qs=qs, exact=False, accuracy=10000
        ).collect()
    }
    assert exact.keys() == approx.keys()
    for et, e in exact.items():
        a = approx[et]
        # count/min/max are exact in both paths
        assert (e["n"], e["min_v"], e["max_v"]) == (a["n"], a["min_v"], a["max_v"])
        for q, qa in zip(qs, a["quantiles"]):
            lo = brackets[et][bracket.index(max(0.0, q - eps))]
            hi = brackets[et][bracket.index(min(1.0, q + eps))]
            assert lo - 1e-9 <= qa <= hi + 1e-9, (et, q, qa, lo, hi)


def test_tf_idf_min_df_and_scores(spark):
    from georef_ar_etl_spark.operators.text import tf_idf

    df = spark.createDataFrame(
        [(1, "a a b rare"), (2, "a b b"), (3, "a c")],
        "doc_id long, text string",
    )
    rows = {(r["doc_id"], r["term"]): r for r in tf_idf(df).collect()}
    import math

    # tf raw counts; smooth idf = ln((N+1)/(df+1)) + 1
    assert rows[(1, "a")]["tf"] == 2 and rows[(1, "a")]["df"] == 3
    assert abs(
        rows[(1, "rare")]["tfidf"] - (math.log(4 / 2) + 1)
    ) < 1e-12
    assert abs(
        rows[(2, "b")]["tfidf"] - 2 * (math.log(4 / 3) + 1)
    ) < 1e-12
    # min_df prunes hapax terms everywhere
    pruned = {
        r["term"] for r in tf_idf(df, min_df=2).collect()
    }
    assert pruned == {"a", "b"}


def test_line_dedup_semantics(spark):
    from georef_ar_etl_spark.operators.text import line_dedup, to_lines

    df = spark.createDataFrame(
        [
            # doc 1: two identical lines IN the same doc -> keeps line_no 0
            (1, "a b a b"),
            # doc 2: first line duplicates doc 1's -> dropped; second survives
            (2, "a b c d"),
            # doc 3: empty after split -> no lines, doc drops out
            (3, "   "),
            # doc 4: unique content survives whole
            (4, "x y z"),
        ],
        "doc_id long, text string",
    )
    lines = to_lines(df, words_per_line=2)
    got = {
        r["doc_id"]: (r["text"], r["n_lines"])
        for r in line_dedup(lines).collect()
    }
    assert got == {
        1: ("a b", 1),          # within-doc dup collapsed to first
        2: ("c d", 1),          # cross-doc dup lost to doc 1
        4: ("x y\nz", 2),       # trailing short chunk is its own line
    }


def test_to_lines_empty_and_short_docs(spark):
    from georef_ar_etl_spark.operators.text import to_lines

    df = spark.createDataFrame(
        [(1, ""), (2, "one"), (3, None)], "doc_id long, text string"
    )
    rows = to_lines(df, words_per_line=8).collect()
    # empty and NULL text contribute nothing; a 1-word doc is one line
    assert [(r["doc_id"], r["line_no"], r["line"]) for r in rows] == [
        (2, 0, "one")
    ]


def test_blocked_fuzzy_match_reject_tie_and_empty_block(spark):
    from georef_ar_etl_spark.operators.entity_match import blocked_fuzzy_match

    clean = spark.createDataFrame(
        [(1, "alpha 001"), (2, "alphb 001"), (3, "gamma 002"), (4, "!!!")],
        "clean_id long, name string",
    )
    probe = spark.createDataFrame(
        [
            (10, "alpha-001"),   # dist 1 to id 1, dist 2 to id 2 -> best wins
            (11, "zzzzz 002"),   # dist 5 to gamma -> rejected by max_dist
            (12, "???"),         # empty block key -> dropped, never matched
        ],
        "probe_id long, name string",
    )
    got = {
        r["probe_id"]: (r["clean_id"], r["dist"])
        for r in blocked_fuzzy_match(probe, clean, max_dist=2).collect()
    }
    assert got == {10: (1, 1)}


def test_salted_join_preserves_semantics(spark):
    from georef_ar_etl_spark.operators.skew import salted_join

    import pytest

    big = spark.createDataFrame(
        [(1, "a"), (1, "b"), (1, "b"), (2, "c"), (3, "d")],
        "k long, payload string",
    )
    dim = spark.createDataFrame([(1, "one"), (2, "two")], "k long, name string")

    def rows(df):
        return sorted(map(tuple, df.collect()))

    # inner: multiplicity of the big side preserved exactly (incl. dup rows)
    got = rows(salted_join(big, dim, "k", n_salt=4).select("k", "payload", "name"))
    want = rows(big.join(dim, "k").select("k", "payload", "name"))
    assert got == want and len(got) == 4

    # left: unmatched big rows survive with nulls
    got_l = rows(salted_join(big, dim, "k", n_salt=4, how="left")
                 .select("k", "payload", "name"))
    want_l = rows(big.join(dim, "k", "left").select("k", "payload", "name"))
    assert got_l == want_l and (3, "d", None) in got_l

    with pytest.raises(ValueError):
        salted_join(big, dim, "k", how="right")


def test_table_diff_null_safety_and_schema_guard(spark):
    from georef_ar_etl_spark.operators.merge import table_diff

    left = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "c"), (4, "d")], "k long, v string"
    )
    right = spark.createDataFrame(
        [(1, "a"), (2, "now-set"), (3, None), (5, "e")], "k long, v string"
    )
    got = {r["k"]: r["change_type"] for r in table_diff(left, right, "k").collect()}
    # NULL->value and value->NULL are both 'changed' (eqNullSafe, not =)
    assert got == {2: "changed", 3: "changed", 4: "removed", 5: "added"}

    # identical tables -> empty diff
    assert table_diff(left, left, "k").count() == 0

    with pytest.raises(ValueError):
        table_diff(left, right.withColumnRenamed("v", "w"), "k")


def test_spread_for_compute_noop_and_spread(spark):
    from georef_ar_etl_spark.functions.layout import spread_for_compute

    par = spark.sparkContext.defaultParallelism
    # under-partitioned: coalesce(1) models a single-file scan
    one = spark.range(1000).coalesce(1)
    spread = spread_for_compute(one)
    assert spread.rdd.getNumPartitions() == par
    assert sorted(r["id"] for r in spread.collect()) == list(range(1000))

    # already wide enough: the SAME plan comes back, no exchange inserted
    wide = spark.range(1000).repartition(par)
    assert spread_for_compute(wide) is wide

    # explicit target honored
    assert spread_for_compute(one, target=5).rdd.getNumPartitions() == 5


def test_spread_for_compute_preserves_pruning(spark, tmp_path):
    """The repartition must not block scan-side column pruning — the
    spread is for compute stages; reading every column to spread two
    would be a regression at 100 TB."""
    from georef_ar_etl_spark.functions.layout import spread_for_compute

    p = str(tmp_path / "t.parquet")
    spark.range(100).selectExpr(
        "id", "id * 2 AS a", "repeat('x', 100) AS fat"
    ).coalesce(1).write.parquet(p)
    plan = (
        spread_for_compute(spark.read.parquet(p))
        .select("id", "a")
        ._jdf.queryExecution().executedPlan().toString()
    )
    import re
    scan = [ln for ln in plan.splitlines() if "ReadSchema" in ln or "Scan parquet" in ln]
    assert scan and not re.search(r"fat", "".join(scan)), plan


def test_normalize_url_edges_and_idempotence(spark):
    from georef_ar_etl_spark.functions.url import with_normalized_url

    urls = [
        "HTTP://WWW.Example.COM:80//x///y/?utm_source=a&b=2&a=1#frag",
        "https://Sub.Example.co:443/",            # default https port
        "http://example.com",                      # no path, no query
        "https://example.com/p?utm_a=1&gclid=2&ref=3",  # all-tracking query
        "http://example.com:8080/p/",              # non-default port kept
    ]
    df = spark.createDataFrame([(i, u) for i, u in enumerate(urls)], "i int, url string")
    rows = {r["i"]: r for r in with_normalized_url(df).collect()}
    assert rows[0]["url_norm"] == "http://example.com/x/y?a=1&b=2"
    assert rows[0]["port"] is None and rows[0]["host"] == "example.com"
    assert rows[1]["url_norm"] == "https://sub.example.co/"
    assert rows[1]["reg_domain"] == "example.co" and rows[1]["path"] == "/"
    assert rows[2]["url_norm"] == "http://example.com/"
    assert rows[3]["query_norm"] is None
    assert rows[3]["url_norm"] == "https://example.com/p"
    assert rows[4]["port"] == 8080
    assert rows[4]["url_norm"] == "http://example.com:8080/p"

    # idempotence: normalizing a canonical URL is a fixpoint
    once = with_normalized_url(df).select(
        F.col("i"), F.col("url_norm").alias("url")
    )
    twice = {r["i"]: r["url_norm"] for r in with_normalized_url(once).collect()}
    for i, r in rows.items():
        assert twice[i] == r["url_norm"], (i, twice[i], r["url_norm"])


def test_pagerank_semantics(spark):
    from georef_ar_etl_spark.operators.graph import pagerank

    # 3-cycle: perfect symmetry -> identical ranks, total mass ~ conserved
    cyc = spark.createDataFrame([(0, 1), (1, 2), (2, 0)], "src long, dst long")
    r = {x["node"]: x["rank_units"] for x in pagerank(cyc, n_iter=8, scale=10**6).collect()}
    assert len(set(r.values())) == 1
    assert abs(sum(r.values()) - 3 * 10**6) <= 3 * 8  # ≤1 unit/node/iter leak

    # star + dangling hub: hub outranks leaves; leaves equal by symmetry
    star = spark.createDataFrame(
        [(i, 99) for i in range(1, 6)], "src long, dst long"
    )
    rs = {x["node"]: x["rank_units"] for x in pagerank(star, n_iter=6, scale=10**6).collect()}
    assert rs[99] > max(v for k, v in rs.items() if k != 99)
    assert len({v for k, v in rs.items() if k != 99}) == 1

    # deterministic under repartitioning
    again = {
        x["node"]: x["rank_units"]
        for x in pagerank(star.repartition(13), n_iter=6, scale=10**6).collect()
    }
    assert again == rs

    import pytest as _pt
    with _pt.raises(ValueError):
        pagerank(cyc, damping_pct=100)
    with _pt.raises(ValueError):
        pagerank(cyc, n_iter=0)
    with _pt.raises(ValueError):
        pagerank(cyc, scale=2**61)  # overflow guard


def test_mad_outliers_semantics(spark):
    from georef_ar_etl_spark.operators.sketches import mad_outliers

    # group a: tight cluster around 10 with one wild point; group b:
    # constant (mad 0 -> ANY deviation flags); NULL value -> NULL flag
    rows = [
        (1, "a", 9.0), (2, "a", 10.0), (3, "a", 11.0), (4, "a", 10.5),
        (5, "a", 100.0),
        (6, "b", 7.0), (7, "b", 7.0), (8, "b", 7.5),
        (9, "b", None),
    ]
    df = spark.createDataFrame(rows, "event_id long, g string, v double")
    out = {
        r["event_id"]: r
        for r in mad_outliers(df, "g", "v", ["event_id"], k=3.0).collect()
    }
    assert out[5]["is_outlier"] is True
    assert all(out[i]["is_outlier"] is False for i in (1, 2, 3, 4))
    # b: median 7.0, mad 0 -> 7.5 deviates above 0
    assert out[8]["is_outlier"] is True
    assert out[6]["is_outlier"] is False
    assert out[9]["is_outlier"] is None
    # stats are group-constant and rounded
    assert out[1]["med"] == 10.5 and out[6]["med"] == 7.0
    # deterministic under repartitioning
    again = {
        r["event_id"]: r["is_outlier"]
        for r in mad_outliers(
            df.repartition(7), "g", "v", ["event_id"], k=3.0
        ).collect()
    }
    assert again == {i: out[i]["is_outlier"] for i in out}


def test_expect_report_semantics(spark):
    from georef_ar_etl_spark.operators.validate import expect_report

    df = spark.createDataFrame(
        [(1, 5.0, "a"), (2, 50.0, "b"), (2, None, "zz"), (None, -1.0, "a")],
        "k int, v double, s string",
    )
    rows = {
        (r["expectation"], r["col_name"]): r
        for r in expect_report(
            df,
            [
                ("not_null", "k", {"max_null_frac": 0.5}),
                ("not_null", "v", {}),
                ("unique", "k", {}),
                ("range", "v", {"min": 0.0, "max": 10.0}),
                ("in_set", "s", {"values": ["a", "b"]}),
                ("row_count", None, {"min": 1, "max": 3}),
            ],
        ).collect()
    }
    r = rows[("not_null", "k")]
    assert (r["observed"], r["passed"]) == (0.25, True)
    r = rows[("not_null", "v")]
    assert (r["observed"], r["passed"]) == (0.25, False)
    r = rows[("unique", "k")]  # two non-null k=2 rows -> 1 duplicate
    assert (r["observed"], r["passed"]) == (1.0, False)
    r = rows[("range", "v")]  # 50.0 and -1.0 violate; null ignored
    assert (r["observed"], r["passed"]) == (2.0, False)
    r = rows[("in_set", "s")]
    assert (r["observed"], r["passed"]) == (1.0, False)
    r = rows[("row_count", None)]
    assert (r["observed"], r["passed"]) == (4.0, False)

    with pytest.raises(ValueError):
        expect_report(df, [])
    with pytest.raises(ValueError):
        expect_report(df, [("nope", "k", {})])


def test_fk_audit_semantics(spark):
    from georef_ar_etl_spark.operators.validate import fk_audit

    fact = spark.createDataFrame(
        [(1, "a"), (2, "b"), (2, "b"), (9, "x"), (None, "c"), (3, None)],
        "k1 int, k2 string",
    )
    dim = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (2, "b")], "d1 int, d2 string"
    )
    rows = {
        r["relation"]: r
        for r in fk_audit(
            [
                ("composite", fact, ["k1", "k2"], dim, ["d1", "d2"]),
                ("single", fact, ["k1"], dim, ["d1"]),
            ]
        ).collect()
    }
    c = rows["composite"]
    # (9,x) orphan; partial nulls count as null-key rows, never orphans;
    # (3,None) has a non-null k1 but a null k2 -> null-key
    assert (c["n_rows"], c["n_null_key"]) == (6, 2)
    assert (c["n_orphan_rows"], c["n_orphan_keys"]) == (1, 1)
    s = rows["single"]
    assert (s["n_rows"], s["n_null_key"]) == (6, 1)
    assert (s["n_orphan_rows"], s["n_orphan_keys"]) == (1, 1)

    with pytest.raises(ValueError):
        fk_audit([])
    with pytest.raises(ValueError):
        fk_audit([("bad", fact, ["k1"], dim, ["d1", "d2"])])


def test_k_core_semantics(spark):
    from georef_ar_etl_spark.operators.graph import (
        KCoreConvergenceError,
        k_core,
    )

    # K4 clique + pendant chain 3-4-5: peeling k=2 needs TWO rounds (5
    # falls first, exposing 4), leaving exactly the clique with deg 3.
    # Self-loop and parallel/reversed duplicates must collapse first.
    edges = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    edges += [(3, 4), (4, 5), (0, 0), (1, 0), (2, 1)]
    g = spark.createDataFrame(edges, "src long, dst long")
    core = {r["node"]: r["core_deg"] for r in k_core(g, k=2).collect()}
    assert core == {0: 3, 1: 3, 2: 3, 3: 3}
    # k above the clique degree -> empty core
    assert k_core(g, k=4).count() == 0
    # deterministic under repartitioning
    again = {
        r["node"]: r["core_deg"]
        for r in k_core(g.repartition(13), k=2).collect()
    }
    assert again == core
    # the shuffle-semi-join branch (tiny broadcast limit) agrees
    assert {
        r["node"]: r["core_deg"]
        for r in k_core(g, k=2, broadcast_drop_limit=0).collect()
    } == core

    # a long chain peels one node per END per round: depth ~ n/2; a tight
    # max_rounds must fail LOUDLY, never return a partial core
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], "src long, dst long"
    )
    with pytest.raises(KCoreConvergenceError):
        k_core(chain, k=2, max_rounds=3)
    assert k_core(chain, k=2, max_rounds=7).count() == 0

    with pytest.raises(ValueError):
        k_core(g, k=0)
    with pytest.raises(ValueError):
        k_core(g, k=2, max_rounds=0)


def test_chunk_text_overlap_and_edges(spark):
    from georef_ar_etl_spark.operators.text import chunk_text

    df = spark.createDataFrame(
        [
            (1, "w1 w2 w3 w4 w5 w6 w7"),   # 7 tokens
            (2, "a b"),                      # shorter than one chunk
            (3, ""),                         # no tokens -> no chunks
            (4, "   "),                      # blank -> no chunks
        ],
        "doc_id long, text string",
    )
    out = {
        (r["doc_id"], r["chunk_id"]): r
        for r in chunk_text(df, chunk_tokens=4, stride=3).collect()
    }
    # doc 1: starts 1,4,7 -> chunks of 4,4,1 tokens; overlap of 1 token
    assert out[(1, 0)]["chunk"] == "w1 w2 w3 w4"
    assert out[(1, 1)]["chunk"] == "w4 w5 w6 w7"
    assert out[(1, 2)]["chunk"] == "w7" and out[(1, 2)]["n_tokens"] == 1
    assert out[(2, 0)]["chunk"] == "a b" and out[(2, 0)]["n_tokens"] == 2
    assert not any(d in (3, 4) for d, _ in out)

    import pytest as _pt
    with _pt.raises(ValueError):
        chunk_text(df, chunk_tokens=0)
    with _pt.raises(ValueError):
        chunk_text(df, stride=0)


def test_rrf_fuse_semantics(spark):
    from georef_ar_etl_spark.operators.ranking import rrf_fuse

    a = spark.createDataFrame(
        [(1, 9.0), (2, 5.0), (3, 1.0)], "doc_id long, score double"
    )
    b = spark.createDataFrame(
        [(2, 100.0), (4, 50.0)], "doc_id long, score double"
    )
    got = {r["doc_id"]: r["rrf"] for r in rrf_fuse([a, b], k=60).collect()}
    # doc 2: rank 2 in a, rank 1 in b; docs 1/3 only in a; doc 4 only in b
    assert got[2] == round(round(1 / 62, 12) + round(1 / 61, 12), 9)
    assert got[1] == round(1 / 61, 9)
    assert got[3] == round(1 / 63, 9)
    assert got[4] == round(1 / 62, 9)
    # the shared doc wins the fusion
    assert max(got, key=got.get) == 2

    import pytest as _pt
    with _pt.raises(ValueError):
        rrf_fuse([])
    with _pt.raises(ValueError):
        rrf_fuse([a], k=0)


def test_dedup_lines_in_doc_semantics(spark):
    from georef_ar_etl_spark.operators.text import dedup_lines_in_doc

    df = spark.createDataFrame(
        [
            (1, "a b a b c d a b"),  # lines(2): 'a b','a b','c d','a b'
            (2, "x y"),
            (3, ""),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in dedup_lines_in_doc(df, words_per_line=2).collect()}
    assert out[1]["text"] == "a b\nc d"
    assert out[1]["n_lines"] == 2 and out[1]["n_dropped"] == 2
    assert out[2]["text"] == "x y" and out[2]["n_dropped"] == 0
    assert 3 not in out  # zero tokens -> no row

    import pytest as _pt
    with _pt.raises(ValueError):
        dedup_lines_in_doc(df, words_per_line=0)


def test_group_representatives_semantics(spark):
    from georef_ar_etl_spark.operators.doc_dedup import group_representatives

    ranked = spark.createDataFrame(
        [
            # group 10: doc 7 has best rank; tie in group 20 -> min id wins
            (7, 10, 5), (8, 10, 3), (9, 20, 4), (4, 20, 4), (2, 30, 1),
        ],
        "doc_id long, component long, rank int",
    )
    rows = group_representatives(ranked).collect()
    rep = {r["component"]: r["rep_doc_id"] for r in rows}
    assert rep == {10: 7, 20: 4, 30: 2}
    flags = {(r["doc_id"]): r["is_rep"] for r in rows}
    assert flags == {7: True, 8: False, 9: False, 4: True, 2: True}

    import pytest as _pt
    with _pt.raises(ValueError):
        group_representatives(ranked.drop("rank"))


def test_interval_overlap_join_semantics(spark):
    from georef_ar_etl_spark.operators.temporal import interval_overlap_join

    # intervals straddling bucket boundaries (W=10) to exercise the
    # count-once guard: every overlapping pair must appear EXACTLY once
    left = spark.createDataFrame(
        [(1, 100, 5, 25), (1, 101, 30, 31), (2, 102, 0, 9)],
        "k long, l_id long, l_s long, l_e long",
    )
    right = spark.createDataFrame(
        [
            (1, 200, 24, 40),   # overlaps 100 (at 24-25, bucket 2) and 101
            (1, 201, 0, 4),     # touches nothing (100 starts at 5)
            (2, 202, 9, 9),     # point overlap with 102 at 9
            (2, 203, 50, 40),   # malformed (s > e) -> dropped
        ],
        "k long, r_id long, r_s long, r_e long",
    )
    got = sorted(
        (r["l_id"], r["r_id"])
        for r in interval_overlap_join(
            left, right, "k", ("l_s", "l_e"), ("r_s", "r_e"), bucket_width=10
        ).collect()
    )
    assert got == [(100, 200), (101, 200), (102, 202)]

    import pytest as _pt
    with _pt.raises(ValueError):
        interval_overlap_join(left, right, "k", bucket_width=0)
    with _pt.raises(ValueError):  # colliding non-key columns
        interval_overlap_join(
            left, left, "k", ("l_s", "l_e"), ("l_s", "l_e"), bucket_width=10
        )


def test_hist_sketch_and_quantile(spark):
    from georef_ar_etl_spark.operators.sketches import (
        hist_quantile,
        hist_sketch,
        merge_hists,
    )

    df = spark.createDataFrame(
        [(None if v is None else float(v),)
         for v in [-5, 0, 1, 7, 8, 9, 100, 39.9, None]],
        "v double",
    )
    h = {r["bin"]: r["n"] for r in hist_sketch(df, "v", 0.0, 40.0, 4).collect()}
    # w=10: [-5,0,1,7,8,9] -> bin 0 (clamped -5), 39.9 -> 3, 100 clamped -> 3
    assert h == {0: 6, 3: 2}

    # merge of two shards == sketch of the union
    d1, d2 = df.limit(4), df.subtract(df.limit(4))
    m = merge_hists(
        hist_sketch(d1, "v", 0.0, 40.0, 4), hist_sketch(d2, "v", 0.0, 40.0, 4)
    )
    assert {r["bin"]: r["n"] for r in m.collect()} == h

    full = hist_sketch(df, "v", 0.0, 40.0, 4)
    est = {r["q"]: r["est"] for r in hist_quantile(full, [0.5, 1.0], 0.0, 40.0, 4).collect()}
    # N=8, q=.5 -> target 4 inside bin 0: 0 + 10*(0 + 4/6); q=1 -> right edge
    assert est[0.5] == round(10 * 4 / 6, 6)
    assert est[1.0] == 40.0


# ------------------------------------------------------------- SCD Type 2
def test_scd2_collapses_and_tiles(spark):
    from georef_ar_etl_spark.operators.scd import scd2_history

    rows = [
        # key 1: u(A), u(A) dup collapses, u(B), d, u(A) re-insert
        (1, 10, "u", "A"),
        (1, 20, "u", "A"),
        (1, 30, "u", "B"),
        (1, 40, "d", "junk"),   # delete payload ignored
        (1, 50, "u", "A"),
        # key 2: d before any insert, then dup deletes collapse
        (2, 10, "d", None),
        (2, 20, "d", None),
        (2, 30, "u", "X"),
    ]
    df = spark.createDataFrame(rows, "key int, seq int, op string, v string")
    out = {
        (r["key"], r["valid_from"]): (r["v"], r["valid_to"], r["is_current"])
        for r in scd2_history(df, "key", "seq", "op", ["v"]).collect()
    }
    assert out == {
        (1, 10): ("A", 30, False),   # 20 collapsed away
        (1, 30): ("B", 40, False),   # closed by the delete
        (1, 50): ("A", None, True),  # re-insert is a fresh version
        (2, 30): ("X", None, True),  # leading deletes emit nothing
    }


def test_scd2_single_key_versions_tile_sequence(spark):
    """Half-open intervals tile: valid_to of version i == valid_from of the
    next change-point, and exactly one current row per live key."""
    from georef_ar_etl_spark.operators.scd import scd2_history

    rows = [(1, s, "u", f"v{s}") for s in range(0, 100, 10)]
    df = spark.createDataFrame(rows, "key int, seq int, op string, v string")
    got = sorted(
        scd2_history(df, "key", "seq", "op", ["v"]).collect(),
        key=lambda r: r["valid_from"],
    )
    assert len(got) == 10
    for a, b in zip(got, got[1:]):
        assert a["valid_to"] == b["valid_from"]
    assert [r["is_current"] for r in got] == [False] * 9 + [True]


# ------------------------------------------------------------ heavy hitters
def test_heavy_hitters_exact_vs_groupby(spark):
    from georef_ar_etl_spark.operators.sketches import heavy_hitters

    # skewed stream: item i appears 2^i times, plus a long unique tail
    rows = [(f"hot{i}",) for i in range(8) for _ in range(1 << i)]
    rows += [(f"tail{j}",) for j in range(500)]
    df = spark.createDataFrame(rows, "w string").repartition(7)
    n = len(rows)
    k = 10
    expect = {}
    for i in range(8):
        if (1 << i) * k > n:
            expect[f"hot{i}"] = 1 << i
    got = {r["item"]: r["cnt"] for r in heavy_hitters(df, "w", k=k).collect()}
    assert got == expect and expect  # exact, and the test is non-vacuous


def test_heavy_hitters_partitioning_independent(spark):
    from georef_ar_etl_spark.operators.sketches import heavy_hitters

    rows = [(f"w{i % 13}",) for i in range(1000)]
    df = spark.createDataFrame(rows, "w string")
    a = {r["item"]: r["cnt"] for r in heavy_hitters(df.repartition(2), "w", k=5).collect()}
    b = {r["item"]: r["cnt"] for r in heavy_hitters(df.repartition(17), "w", k=5).collect()}
    assert a == b


def test_heavy_hitters_k_guard(spark):
    from georef_ar_etl_spark.operators.sketches import heavy_hitters

    df = spark.createDataFrame([("x",)], "w string")
    with pytest.raises(ValueError):
        heavy_hitters(df, "w", k=1)


# ---------------------------------------------------------- presence bitmap
def test_presence_bitmap_set_algebra(spark):
    from georef_ar_etl_spark.functions.bitmaps import presence_bitmap

    rows = [(1, 0), (1, 3), (1, 3), (1, 30), (2, 5)]
    df = spark.createDataFrame(rows, "u int, d int")
    out = {
        r["u"]: (r["bitmap"], r["n_set"])
        for r in presence_bitmap(df, ["u"], F.col("d"), width=31).collect()
    }
    assert out == {1: ((1 << 0) | (1 << 3) | (1 << 30), 3), 2: (1 << 5, 1)}


def test_presence_bitmap_rejects_out_of_range(spark):
    from georef_ar_etl_spark.functions.bitmaps import presence_bitmap

    df = spark.createDataFrame([(1, 31)], "u int, d int")
    with pytest.raises(Exception, match="out of range"):
        presence_bitmap(df, ["u"], F.col("d"), width=31).collect()


# ------------------------------------------------------- markov transitions
def test_transition_counts_basic(spark):
    from georef_ar_etl_spark.operators.temporal import transition_counts

    # user 1: a->b->a ; user 2: a->b — transitions from 'a': 2x b? no:
    # u1 pairs (a,b),(b,a); u2 pair (a,b) => a->b n=2 p=1.0, b->a n=1 p=1.0
    rows = [(1, 1, "a"), (1, 2, "b"), (1, 3, "a"), (2, 1, "a"), (2, 2, "b")]
    df = spark.createDataFrame(rows, "u int, t int, s string")
    out = {
        (r["src"], r["dst"]): (r["n"], r["p"])
        for r in transition_counts(df, "u", "s", ["t"]).collect()
    }
    assert out == {("a", "b"): (2, 1.0), ("b", "a"): (1, 1.0)}


def test_transition_probabilities_sum_to_one_per_src(spark):
    from georef_ar_etl_spark.operators.temporal import transition_counts

    rows = [(u, t, f"s{(u * 7 + t * 3) % 4}") for u in range(20) for t in range(15)]
    df = spark.createDataFrame(rows, "u int, t int, s string")
    sums = (
        transition_counts(df, "u", "s", ["t"])
        .groupBy("src")
        .agg(F.sum("p").alias("sp"))
        .collect()
    )
    assert sums and all(abs(r["sp"] - 1.0) < 1e-9 for r in sums)


# ------------------------------------------------------------------ z-order
def _morton_py(x, y, bits):
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_zorder_key_matches_python_morton(spark):
    from georef_ar_etl_spark.functions.layout import zorder_key

    rows = [(x, y) for x in [0, 1, 5, 255, 4095] for y in [0, 2, 77, 4095]]
    df = spark.createDataFrame(rows, "x long, y long")
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.select("x", "y", zorder_key([F.col("x"), F.col("y")], 12).alias("z")).collect()
    }
    for (x, y), z in got.items():
        assert z == _morton_py(x, y, 12), (x, y)


def test_cluster_by_zorder_locality_and_rows(spark):
    """Range-clustering on the z-key keeps per-partition bounding boxes
    tight in BOTH dimensions vs the unclustered layout, and loses no rows."""
    from georef_ar_etl_spark.functions.layout import cluster_by_zorder

    rows = [((i * 179) % 256, (i * 83) % 256) for i in range(4096)]
    df = spark.createDataFrame(rows, "x long, y long")

    def span_sum(frame):
        import math

        parts = frame.rdd.glom().collect()
        tot = 0.0
        for p in parts:
            if p:
                xs = [r["x"] for r in p]
                ys = [r["y"] for r in p]
                tot += (max(xs) - min(xs)) * (max(ys) - min(ys))
        return tot / max(1, sum(1 for p in parts if p))

    clustered = cluster_by_zorder(df, ["x", "y"], bits=8, n_partitions=16)
    assert clustered.count() == 4096
    assert span_sum(clustered) < 0.25 * span_sum(df.repartition(16))


def test_zorder_key_guards(spark):
    from georef_ar_etl_spark.functions.layout import zorder_key

    with pytest.raises(ValueError):
        zorder_key([], 8)
    with pytest.raises(ValueError):
        zorder_key([F.col("x"), F.col("y")], 32)  # 64 bits > 63


# ---------------------------------------------------------- grouped HLL
def test_hll_group_estimate_accuracy_and_merge(spark):
    from georef_ar_etl_spark.operators.sketches import (
        hll_group_estimate,
        hll_group_registers,
        merge_hll,
    )

    rows = [(f"g{u % 3}", f"item{(u * 31 + j) % (400 * (u % 3 + 1))}")
            for u in range(6) for j in range(3000)]
    df = spark.createDataFrame(rows, "g string, item string")
    truth = {
        r["g"]: r["d"]
        for r in df.groupBy("g").agg(F.countDistinct("item").alias("d")).collect()
    }
    regs = hll_group_registers(df, "g", "item", p=9)
    est = {r["g"]: r["est"] for r in hll_group_estimate(regs, "g", p=9).collect()}
    assert set(est) == set(truth)
    for g, t in truth.items():
        assert abs(est[g] - t) / t < 0.10, (g, est[g], t)

    # shard-merge == whole-corpus sketch (within each group)
    h1 = hll_group_registers(df.filter("item like '%1'"), "g", "item", p=9)
    h2 = hll_group_registers(df.filter("item not like '%1'"), "g", "item", p=9)
    merged = (
        h1.unionByName(h2)
        .groupBy("g", "bucket")
        .agg(F.max("r").cast("int").alias("r"))
    )
    whole = regs
    assert merged.exceptAll(whole).count() == 0
    assert whole.exceptAll(merged).count() == 0


def test_global_rank_and_sorted_neighborhood(spark):
    from georef_ar_etl_spark.operators.entity_match import (
        sorted_neighborhood_pairs,
        with_global_rank,
    )

    # scalable two-phase rank == the single-task window rank, under an
    # adversarial initial partitioning
    df = spark.createDataFrame(
        [(i, f"k{i % 7:02d}") for i in range(200)], "id long, k string"
    ).repartition(13)
    got = {
        r["id"]: r["rn"]
        for r in with_global_rank(df, ["k", "id"]).collect()
    }
    want = {
        r["id"]: r["rn"]
        for r in df.selectExpr(
            "id", "row_number() OVER (ORDER BY k, id) AS rn"
        ).collect()
    }
    assert got == want

    # a typo twin sorts next to its original and pairs within the window;
    # a digit-blocking strategy would put 'smith'/'smth' in other blocks
    rows = [
        (1, "jones alice"), (2, "smith bob"), (3, "smth bob"),
        (4, "wilson carol"), (5, "zzz unrelated"),
    ]
    names = spark.createDataFrame(rows, "id long, nm string")
    pairs = {
        (r["id_a"], r["id_b"])
        for r in sorted_neighborhood_pairs(
            names, "id", "nm", window=2, max_dist=2
        ).collect()
    }
    assert (2, 3) in pairs
    assert all(a != b for a, b in pairs)
    # window=2 only pairs ADJACENT ranks: jones/smith differ by > 2 edits,
    # so nothing else survives the verify
    assert pairs == {(2, 3)}

    import pytest as _pt
    with _pt.raises(ValueError):
        sorted_neighborhood_pairs(names, "id", "nm", window=1)

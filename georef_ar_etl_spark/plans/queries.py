"""Driver-facing query catalog: every operator family from SURVEY.md §2,
expressed over the driver's testdata tables, each with a DuckDB oracle.

Conventions for cross-engine value equality:
* money aggregates go through exact decimal arithmetic, are rounded in the
  decimal domain, and only then cast to double — bit-identical across
  engines regardless of summation order;
* no raw timestamps in outputs (cast to string);
* every computed column is aliased identically in the Spark plan and the SQL;
* similarity scores are rounded before ranking so ties break identically.
"""

from __future__ import annotations

from collections.abc import Callable

import numpy as np
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from georef_ar_etl_spark.functions.layout import spread_for_compute
from georef_ar_etl_spark.functions.scalar import zero_pad
from georef_ar_etl_spark.functions.tokens import with_normalized_tokens
from georef_ar_etl_spark.operators import doc_dedup, multimodal, similarity, text
from georef_ar_etl_spark.operators.dedup_events import latest_per_key
from georef_ar_etl_spark.operators.merge import merge_upsert

QUERY_FNS: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE_SQL: dict[str, str] = {}
# oracles whose SQL is derived from DATA (e.g. a trained index inlined as
# literals): built on first request, not at import — importing this module
# (bench runs, test collection) must not pay parquet scans, and a build
# failure must surface when the oracle is actually wanted
LAZY_ORACLE_SQL: dict[str, Callable[[], str | None]] = {}


def query(name: str, sql: str | None = None):
    def deco(fn):
        QUERY_FNS[name] = fn
        if sql is not None:
            ORACLE_SQL[name] = sql
        return fn

    return deco


def all_oracle_sql() -> dict[str, str]:
    """ORACLE_SQL plus the lazily-built data-dependent oracles (cached)."""
    for name, build in LAZY_ORACLE_SQL.items():
        if name not in ORACLE_SQL:
            sql = build()
            if sql is not None:
                ORACLE_SQL[name] = sql
    return dict(ORACLE_SQL)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # spread_for_compute: the sf fixtures are single-row-group files — ONE
    # scan partition — which would serialize every compute stage on one
    # core regardless of cluster size. At production scale inputs carry
    # thousands of splits and this is a no-op (no shuffle inserted);
    # filter pushdown and column pruning pass through the repartition.
    return spread_for_compute(spark.read.parquet(f"{sf_dir}/{name}.parquet"))


def _ephemeral_table_root(kind: str, sf_dir: str) -> str:
    """Per-process scratch root for catalog queries that materialize a CDC
    table (q24/q30/q34): the returned DataFrame reads the table LAZILY, so
    the dir must outlive the query function — but two concurrent harness
    processes over the same sf_dir (bench ∥ correctness) must never share
    (and rmtree) each other's live roots, hence the pid in the name
    (ADVICE r03). Wiped on entry (same-process re-runs rebuild) and at
    process exit (no per-run leak)."""
    import atexit
    import hashlib
    import os
    import shutil
    import tempfile

    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:8]
    root = os.path.join(tempfile.gettempdir(), f"{kind}_{tag}_{os.getpid()}")
    shutil.rmtree(root, ignore_errors=True)
    atexit.register(shutil.rmtree, root, ignore_errors=True)
    return root


def _dec(col, p=18, s=2):
    return col.cast(f"decimal({p},{s})")


def _arr_fp(col):
    """Canonical scalar fingerprint of an array column: md5 of the
    comma-joined elements. The driver's result canonicalizer sorts columns
    pandas-side and cannot hash list cells — every catalog query projects
    array outputs through this (DuckDB mirror:
    ``md5(array_to_string(arr, ','))``)."""
    return F.md5(F.array_join(col.cast("array<string>"), ","))


def _money(col):
    """Exact decimal sum → round(2) → double (order-insensitive)."""
    return F.round(F.sum(_dec(col)), 2).cast("double")


# ============================================================ aggregations
# Reference kernel: blocks→streets GROUP BY with min/max/sum aggregates
# (georef_ar_etl/streets.py:162-179).
@query(
    "q01_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           cast(round(sum(cast(l_quantity AS decimal(18,2))), 2) AS double) AS sum_qty,
           cast(round(sum(cast(l_extendedprice AS decimal(18,2))), 2) AS double) AS sum_base_price,
           cast(round(sum(cast(l_extendedprice AS decimal(18,2))
                          * (1 - cast(l_discount AS decimal(9,6)))), 2) AS double) AS sum_disc_price,
           count(*) AS count_order,
           cast(round(sum(cast(l_quantity AS decimal(18,2))), 2) AS double) / count(*) AS avg_qty
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1995-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q01(spark, sf_dir):
    l = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1995-09-02 00:00:00").cast("timestamp_ntz")
    )
    sum_qty = F.round(F.sum(_dec(F.col("l_quantity"))), 2).cast("double")
    return l.groupBy("l_returnflag", "l_linestatus").agg(
        sum_qty.alias("sum_qty"),
        _money(F.col("l_extendedprice")).alias("sum_base_price"),
        F.round(
            F.sum(_dec(F.col("l_extendedprice")) * (F.lit(1) - F.col("l_discount").cast("decimal(9,6)"))),
            2,
        ).cast("double").alias("sum_disc_price"),
        F.count(F.lit(1)).alias("count_order"),
        (sum_qty / F.count(F.lit(1))).alias("avg_qty"),
    )


# Reference kernel: street door-number min/max over blocks
# (georef_ar_etl/streets.py:162-179, tested tests/test_streets_extraction_step.py:90-119).
@query(
    "q10_group_minmax",
    """
    SELECT o_custkey, count(*) AS n_orders,
           min(o_totalprice) AS min_price, max(o_totalprice) AS max_price,
           min(o_orderpriority) AS first_priority
    FROM orders GROUP BY o_custkey
    """,
)
def q10(spark, sf_dir):
    return _t(spark, sf_dir, "orders").groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
        F.min("o_orderpriority").alias("first_priority"),
    )


# Grouped PAYLOAD combine — the reference's ST_Union(geom) per street
# (georef_ar_etl/streets.py:172): an order-insensitive merge of array
# payloads per group, expressed as flatten(collect_list) → distinct → sort
# (collect_list order is nondeterministic; the sort canonicalizes it, the
# same trick that makes ST_Union order-insensitive). Output is projected
# through the md5 fingerprint (driver canonicalizer can't hash arrays).
@query(
    "q29_grouped_payload_union",
    """
    SELECT grp,
           md5(array_to_string(list_sort(list_distinct(flatten(list(arr)))), ','))
             AS payload_fp,
           len(list_distinct(flatten(list(arr)))) AS n_elems,
           count(*) AS n_rows
    FROM (SELECT vec_id % 8 AS grp,
                 list_transform(embedding[1:8], x -> floor(x::DOUBLE * 100)::int) AS arr
          FROM embeddings)
    GROUP BY grp
    """,
)
def q29(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    arr = F.transform(
        F.slice("embedding", 1, 8),
        lambda x: F.floor(x.cast("double") * 100).cast("int"),
    )
    merged = (
        emb.select((F.col("vec_id") % 8).alias("grp"), arr.alias("arr"))
        .groupBy("grp")
        .agg(
            F.array_sort(
                F.array_distinct(F.flatten(F.collect_list("arr")))
            ).alias("u"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )
    return merged.select(
        "grp",
        _arr_fp(F.col("u")).alias("payload_fp"),
        F.size("u").cast("long").alias("n_elems"),
        "n_rows",
    )


# Distinct count per group (reference: count(DISTINCT nomencla) while
# extracting streets from blocks, georef_ar_etl/streets.py:156-160).
# Exact countDistinct = two-phase hash aggregate (partial distinct map-side);
# for 100 TB cardinality work use approx_count_distinct (HLL, one pass,
# bounded memory) — asserted within 5% of exact in tests/test_operators.py.
@query(
    "q28_count_distinct",
    """
    SELECT o_orderpriority,
           count(DISTINCT o_custkey) AS n_custs,
           count(*) AS n_orders
    FROM orders GROUP BY o_orderpriority
    """,
)
def q28(spark, sf_dir):
    return _t(spark, sf_dir, "orders").groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("n_custs"),
        F.count(F.lit(1)).alias("n_orders"),
    )


# ===================================================== CDC kernel queries
# The in-batch dedup window: latest event per key, last-writer-wins
# (engine operator dedup_events.latest_per_key; reference analogue:
# duplicate-PK handling, georef_ar_etl/transformers.py:89-94).
@query(
    "q02_latest_event_per_user",
    """
    SELECT user_id, event_type AS last_type, value AS last_value,
           cast(ts AS varchar) AS last_ts
    FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                                       ORDER BY event_id DESC) AS rn
          FROM events)
    WHERE rn = 1
    """,
)
def q02(spark, sf_dir):
    e = _t(spark, sf_dir, "events").select(
        F.col("user_id"),
        F.col("event_id").alias("seq"),
        F.col("event_type"),
        F.col("value"),
        F.col("ts").cast("string").alias("ts_str"),
    )
    latest = latest_per_key(e, key="user_id", order="seq")
    return latest.select(
        "user_id",
        F.col("event_type").alias("last_type"),
        F.col("value").alias("last_value"),
        F.col("ts_str").alias("last_ts"),
    )


# The MERGE kernel itself (engine operator merge.merge_upsert), driven by a
# CDC stream derived from `events`: error→delete, signup→insert, else update.
# Reference: snapshot diff-and-upsert, georef_ar_etl/transformers.py:67-151.
@query(
    "q03_cdc_merge_state",
    """
    WITH b AS (
      SELECT user_id AS k, event_id,
             CASE WHEN event_type = 'error' THEN 'delete'
                  WHEN event_type = 'signup' THEN 'insert'
                  ELSE 'update' END AS op,
             value AS balance, 'evt' AS segment,
             row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
      FROM events),
    latest AS (SELECT k, op, balance, segment FROM b WHERE rn = 1),
    t AS (SELECT c_custkey AS k, c_acctbal AS balance, c_mktsegment AS segment
          FROM customer)
    SELECT coalesce(l.k, t.k) AS k,
           CASE WHEN l.k IS NOT NULL THEN l.balance ELSE t.balance END AS balance,
           CASE WHEN l.k IS NOT NULL THEN l.segment ELSE t.segment END AS segment
    FROM t FULL OUTER JOIN latest l ON t.k = l.k
    WHERE NOT (l.k IS NOT NULL AND l.op = 'delete')
    """,
)
def q03(spark, sf_dir):
    state = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("k"),
        F.col("c_acctbal").alias("balance"),
        F.col("c_mktsegment").alias("segment"),
    )
    batch = _t(spark, sf_dir, "events").select(
        F.col("user_id").alias("k"),
        F.col("event_id").alias("seq"),
        F.when(F.col("event_type") == "error", "delete")
        .when(F.col("event_type") == "signup", "insert")
        .otherwise("update")
        .alias("op"),
        F.col("value").alias("balance"),
        F.lit("evt").alias("segment"),
    )
    latest = latest_per_key(batch, key="k", order="seq").drop("seq")
    merged = merge_upsert(state, latest, ["k", "balance", "segment"], key="k")
    return merged.new_state


# The quarantine split (engine operator validate.tag_invalid's shape):
# classify every event by its first failing rule; invalid rows are counted,
# never fatal (reference: georef_ar_etl/transformers.py:96-101,145-149).
@query(
    "q09_quarantine_split",
    """
    SELECT reason, count(*) AS n FROM (
      SELECT CASE WHEN event_type NOT IN ('click','view','purchase','signup')
                    THEN 'bad_op'
                  WHEN value IS NULL OR value < 1 THEN 'bad_value'
                  ELSE 'valid' END AS reason
      FROM events)
    GROUP BY reason
    """,
)
def q09(spark, sf_dir):
    reason = (
        F.when(
            ~F.col("event_type").isin("click", "view", "purchase", "signup"),
            F.lit("bad_op"),
        )
        .when(F.col("value").isNull() | (F.col("value") < 1), F.lit("bad_value"))
        .otherwise(F.lit("valid"))
    )
    return (
        _t(spark, sf_dir, "events")
        .withColumn("reason", reason)
        .groupBy("reason")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# Token normalization — THE payload kernel (Arrow pandas UDF) — applied to
# token arrays derived from documents; oracle replicates the semantics in SQL.
# Output projects the array to a canonical md5 scalar (tokens_fp): the
# driver's canonicalizer cannot sort list columns, and an md5-of-joined-array
# is exactly as strong a value check.
@query(
    "q21_normalize_tokens",
    r"""
    WITH t AS (
      SELECT doc_id,
             list_transform(
               string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '),
               w -> (length(w) - 3)::int) AS raw
      FROM documents),
    f AS (SELECT doc_id, list_filter(raw, x -> x >= 0) AS nn FROM t),
    l AS (SELECT doc_id, nn,
                 coalesce(list_max(list_transform(
                     generate_series(1, greatest(len(nn), 1)),
                     i -> CASE WHEN nn[i::int] <> 0 THEN i ELSE 0 END)), 0) AS lastnz
          FROM f)
    SELECT doc_id, md5(array_to_string(nn[1:lastnz::int], ',')) AS tokens_fp,
           lastnz::int AS n_tok
    FROM l
    """,
)
def q21(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    raw = docs.select(
        "doc_id",
        F.transform(
            F.split(text.norm_text(F.col("text")), " "),
            lambda w: (F.length(w) - 3).cast("int"),
        ).alias("tokens"),
        F.lit("update").alias("op"),
        F.lit(0).alias("n_tok"),
    )
    return with_normalized_tokens(raw, impl="pandas").select(
        "doc_id", _arr_fp(F.col("tokens")).alias("tokens_fp"), "n_tok"
    )


# ==================================================================== joins
# Broadcast dimension-lookup join (reference: memoized province/dept lookups,
# georef_ar_etl/context.py:63-146 → broadcast hash join).
@query(
    "q04_broadcast_enrich",
    """
    SELECT r_name, n_name, count(*) AS n_customers,
           cast(round(sum(cast(c_acctbal AS decimal(18,2))), 2) AS double) AS total_bal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name
    """,
)
def q04(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    n = F.broadcast(_t(spark, sf_dir, "nation"))
    r = F.broadcast(_t(spark, sf_dir, "region"))
    return (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            _money(F.col("c_acctbal")).alias("total_bal"),
        )
    )


# Left-anti join — the delete-set computation
# (reference: georef_ar_etl/transformers.py:120-136).
@query(
    "q05_anti_join_deletes",
    """
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def q05(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


# Theta self-join with anti-symmetric dedup (a.id < b.id) — the intersections
# pattern (georef_ar_etl/intersections.py:42-63, dedup trick at :55).
@query(
    "q07_selfjoin_pairs",
    """
    SELECT a.n_regionkey AS region_key, a.n_name AS nation_a, b.n_name AS nation_b
    FROM nation a JOIN nation b
      ON a.n_regionkey = b.n_regionkey AND a.n_nationkey < b.n_nationkey
    """,
)
def q07(spark, sf_dir):
    n = _t(spark, sf_dir, "nation")
    a, b = n.alias("a"), n.alias("b")
    return a.join(
        b,
        (F.col("a.n_regionkey") == F.col("b.n_regionkey"))
        & (F.col("a.n_nationkey") < F.col("b.n_nationkey")),
    ).select(
        F.col("a.n_regionkey").alias("region_key"),
        F.col("a.n_name").alias("nation_a"),
        F.col("b.n_name").alias("nation_b"),
    )


# ============================================================== set ops
# Multi-file append union (reference: 24 per-province CSV appends,
# georef_ar_etl/streets.py:33-41 → unionByName).
@query(
    "q08_union_append",
    """
    SELECT l_returnflag, count(*) AS n_rows,
           cast(round(sum(cast(l_quantity AS decimal(18,2))), 2) AS double) AS sum_qty
    FROM (SELECT * FROM lineitem WHERE l_shipdate <  TIMESTAMP '1995-01-01 00:00:00'
          UNION ALL
          SELECT * FROM lineitem WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00')
    GROUP BY l_returnflag
    """,
)
def q08(spark, sf_dir):
    l = _t(spark, sf_dir, "lineitem")
    cut = F.lit("1995-01-01 00:00:00").cast("timestamp_ntz")
    u = l.filter(F.col("l_shipdate") < cut).unionByName(
        l.filter(F.col("l_shipdate") >= cut)
    )
    return u.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.sum(_dec(F.col("l_quantity"))), 2).cast("double").alias("sum_qty"),
    )


# ===================================================== scalar function kernel
# Prefix predicates, lpad, CASE enum decode, coalesce/nullif
# (reference: SURVEY.md §2.7 — constants.py maps, street_blocks.py:57-58).
@query(
    "q06_scalar_kernel",
    """
    SELECT p_partkey,
           substr(p_name, 1, 4) AS name_prefix,
           lpad(cast(p_size AS varchar), 5, '0') AS size_pad,
           CASE WHEN p_size < 10 THEN 'small'
                WHEN p_size < 30 THEN 'mid'
                ELSE 'large' END AS size_class,
           coalesce(nullif(p_brand, ''), 'unknown') AS brand
    FROM part
    WHERE p_name IS NOT NULL AND p_name LIKE '%widget%' AND p_retailprice > 900.5
    """,
)
def q06(spark, sf_dir):
    p = _t(spark, sf_dir, "part").filter(
        F.col("p_name").isNotNull()
        & F.col("p_name").like("%widget%")
        & (F.col("p_retailprice") > 900.5)
    )
    return p.select(
        "p_partkey",
        F.substring("p_name", 1, 4).alias("name_prefix"),
        zero_pad(F.col("p_size"), 5).alias("size_pad"),
        F.when(F.col("p_size") < 10, "small")
        .when(F.col("p_size") < 30, "mid")
        .otherwise("large")
        .alias("size_class"),
        F.coalesce(F.nullif(F.col("p_brand"), F.lit("")), F.lit("unknown")).alias("brand"),
    )


# ================================================================= windows
# Sequence numbering within a partition (reference: intersection point
# numbering idx+1 zero-padded, georef_ar_etl/intersections.py:81-95).
@query(
    "q11_window_sequence",
    """
    SELECT event_id, user_id,
           row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS seq_in_user,
           lpad(cast(row_number() OVER (PARTITION BY user_id ORDER BY event_id)
                     AS varchar), 4, '0') AS seq_pad
    FROM events
    """,
)
def q11(spark, sf_dir):
    w = Window.partitionBy("user_id").orderBy("event_id")
    rn = F.row_number().over(w)
    return _t(spark, sf_dir, "events").select(
        "event_id", "user_id", rn.alias("seq_in_user"), zero_pad(rn, 4).alias("seq_pad")
    )


# ======================================================== text analysis
_NORM = r"trim(regexp_replace(lower(text), '\s+', ' ', 'g'))"


@query(
    "q12_token_count",
    f"""
    SELECT doc_id,
           CASE WHEN length({_NORM}) = 0 THEN 0
                ELSE len(string_split({_NORM}, ' ')) END AS n_tokens
    FROM documents
    """,
)
def q12(spark, sf_dir):
    return _t(spark, sf_dir, "documents").select(
        "doc_id", text.token_count(F.col("text")).cast("long").alias("n_tokens")
    )


@query(
    "q13_quality_score",
    rf"""
    SELECT doc_id,
           length(text) AS q_n_chars,
           n_tok AS q_n_tokens,
           round(len(regexp_extract_all(text, '[^\w\s]')) / greatest(length(text), 1), 6)
             AS q_punct_ratio,
           round(len(regexp_extract_all({_NORM},
                 '\b(the|a|of|and|to|in|is|it)\b')) / greatest(n_tok, 1), 6)
             AS q_stopword_ratio,
           round(length(replace({_NORM}, ' ', '')) / greatest(n_tok, 1), 6)
             AS q_mean_word_len
    FROM (SELECT *, CASE WHEN length({_NORM}) = 0 THEN 0
                         ELSE len(string_split({_NORM}, ' ')) END AS n_tok
          FROM documents)
    """,
)
def q13(spark, sf_dir):
    out = text.quality_features(_t(spark, sf_dir, "documents"))
    return out.select(
        "doc_id",
        F.col("q_n_chars").cast("long"),
        F.col("q_n_tokens").cast("long"),
        "q_punct_ratio",
        "q_stopword_ratio",
        "q_mean_word_len",
    )


def _lang_sql() -> str:
    score_cols = ", ".join(
        rf"len(regexp_extract_all({_NORM}, '\b({'|'.join(ws)})\b')) AS s_{lang}"
        for lang, ws in text.LANG_MARKERS.items()
    )
    langs = list(text.LANG_MARKERS)
    best = f"greatest({', '.join('s_' + x for x in langs)})"
    case = " ".join(
        f"WHEN {best} > 0 AND s_{x} = {best} THEN '{x}'" for x in langs
    )
    return f"""
    SELECT doc_id, CASE {case} ELSE 'und' END AS lang_pred
    FROM (SELECT doc_id, text, {score_cols} FROM documents)
    """


@query("q14_lang_id", _lang_sql())
def q14(spark, sf_dir):
    return _t(spark, sf_dir, "documents").select(
        "doc_id", text.language_id(F.col("text")).alias("lang_pred")
    )


# Gopher/MassiveText repetition filters (Rae et al. 2021): within-document
# duplicate-word / top-word / duplicate-2gram fractions. The oracle counts
# the most frequent word the O(n^2) way (fine for DuckDB on test scale);
# the Spark side uses the sort + run-length scan that survives book-length
# docs — both must agree to 6 decimals.
@query(
    "q31_repetition_quality",
    f"""
    WITH w AS (
      SELECT doc_id,
             CASE WHEN length({_NORM}) = 0 THEN []::VARCHAR[]
                  ELSE string_split({_NORM}, ' ') END AS words
      FROM documents),
    g AS (
      SELECT doc_id, words, len(words) AS total,
             len(list_distinct(words)) AS d,
             CASE WHEN words IS NULL THEN NULL
                  ELSE coalesce(list_max(list_transform(list_distinct(words),
                       x -> len(list_filter(words, y -> y = x)))), 0) END AS best,
             CASE WHEN words IS NULL THEN NULL
                  WHEN len(words) >= 2
                  THEN list_transform(generate_series(1, len(words) - 1),
                       i -> words[i] || ' ' || words[i + 1])
                  ELSE []::VARCHAR[] END AS grams
      FROM w)
    SELECT doc_id,
           round((total - d) / greatest(total, 1)::DOUBLE, 6) AS dup_word_frac,
           round(best / greatest(total, 1)::DOUBLE, 6) AS top_word_frac,
           round((len(grams) - len(list_distinct(grams)))
                 / greatest(len(grams), 1)::DOUBLE, 6) AS dup_2gram_frac
    FROM g
    """,
)
def q31(spark, sf_dir):
    return text.repetition_features(_t(spark, sf_dir, "documents")).select(
        "doc_id", "dup_word_frac", "top_word_frac", "dup_2gram_frac"
    )


# deterministic hash-based corpus split (train/val/test): assignment is a
# pure function of the key — stable under repartitioning, retries and
# corpus growth, reproducible across engines (md5 variant here so DuckDB
# computes the identical buckets; production uses the xxhash64 fast path,
# operators/corpus.py).
@query(
    "q32_hash_split",
    """
    SELECT doc_id,
           CASE WHEN b < 8000 THEN 'train'
                WHEN b < 9000 THEN 'val'
                ELSE 'test' END AS split
    FROM (SELECT doc_id,
                 (('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::UBIGINT
                  % 10000)::INT AS b
          FROM documents)
    """,
)
def q32(spark, sf_dir):
    from georef_ar_etl_spark.operators import corpus

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    return corpus.hash_split(
        docs,
        fractions=[("train", 0.8), ("val", 0.1), ("test", 0.1)],
        hash_fn="md5",
    )


# symmetric int8 embedding quantization — 4x smaller vector storage with
# bounded per-component error. The embedding is cast to double on BOTH
# sides so scale/code arithmetic is bit-identical; codes hash via the
# usual array -> md5(array_to_string) projection.
@query(
    "q33_quantize_embeddings",
    """
    WITH s AS (
      SELECT vec_id, embedding::DOUBLE[] AS v,
             -- coalesce: list_max of an empty list is NULL in DuckDB while
             -- Spark's aggregate returns its 0.0 initial value
             coalesce(list_max(list_transform(embedding::DOUBLE[], x -> abs(x))), 0.0)
             / 127.0 AS scale
      FROM embeddings)
    SELECT vec_id, round(scale, 6) AS q_scale,
           md5(array_to_string(
               CASE WHEN scale = 0
                    THEN list_transform(v, x -> 0::TINYINT)
                    ELSE list_transform(v, x -> round(x / scale)::TINYINT) END,
               ',')) AS q_fp
    FROM s
    """,
)
def q33(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    out = similarity.quantize_embeddings(emb)
    return out.select(
        "vec_id",
        F.round("q_scale", 6).alias("q_scale"),
        F.md5(
            F.array_join(F.transform("q", lambda x: x.cast("string")), ",")
        ).alias("q_fp"),
    )


@query(
    "q15_fingerprint_groups",
    f"""
    SELECT md5({_NORM}) AS fp, count(*) AS n_docs, min(doc_id) AS keep_id
    FROM documents GROUP BY fp
    """,
)
def q15(spark, sf_dir):
    return (
        _t(spark, sf_dir, "documents")
        .select(text.fingerprint(F.col("text")).alias("fp"), "doc_id")
        .groupBy("fp")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("keep_id"))
    )


# ===================================================== dedup (documents)
@query(
    "q16_exact_dedup",
    f"""
    SELECT d.doc_id, d.source FROM documents d
    JOIN (SELECT min(doc_id) AS doc_id FROM
            (SELECT doc_id, md5({_NORM}) AS fp FROM documents) GROUP BY fp) k
      ON d.doc_id = k.doc_id
    """,
)
def q16(spark, sf_dir):
    return doc_dedup.dedup_exact(_t(spark, sf_dir, "documents")).select("doc_id", "source")


def _poly_hash_terms(var: str, k: int) -> str:
    """k-gram 61-bit polynomial rolling hash at 1-based position i of string
    column ``var`` (HUGEINT; mod 2^61 ≡ the numpy kernel's uint64-wrap+mask,
    since 2^64 is a multiple of 2^61). Shared by the winnow and MinHash
    oracles — same B=257 power ladder as text.poly_powers."""
    MOD = 1 << 61
    powers = [1] * k
    for j in range(k - 2, -1, -1):
        powers[j] = (powers[j + 1] * 257) % MOD
    terms = " + ".join(
        f"ascii(substr({var}, i::int + {j}, 1))::HUGEINT * {powers[j]}::HUGEINT"
        for j in range(k)
    )
    return f"(({terms}) % {MOD}::HUGEINT)::BIGINT"


def _poly31_hash_terms(var: str, k: int) -> str:
    """k-gram rolling hash mod the Mersenne prime 2^31-1 at 1-based position
    i of string column ``var``. All intermediates < 2^62 → plain BIGINT.
    Mirrors text.poly_powers_p31 / poly_kgram_hashes_p31."""
    P = (1 << 31) - 1
    powers = [1] * k
    for j in range(k - 2, -1, -1):
        powers[j] = (powers[j + 1] * 257) % P
    terms = " + ".join(
        f"ascii(substr({var}, i::int + {j}, 1))::BIGINT * {powers[j]}"
        for j in range(k)
    )
    return f"(({terms}) % {P})"


def _minhash_sql(n_hashes=8, n_bands=4, k=8, min_j=0.35) -> str:
    """Mirror of doc_dedup.minhash_lsh_pairs: 31-bit polynomial gram hashes,
    affine minhash family h_i(x) = (A_i·x + B_i) mod p with the same seeded
    constants, band keys as plain value strings, Jaccard over the distinct
    gram-hash sets. Short texts are padded to one full k-gram."""
    from georef_ar_etl_spark.operators.doc_dedup import minhash_affine_params

    P = (1 << 31) - 1
    rows = n_hashes // n_bands
    A, B = minhash_affine_params(n_hashes)
    mins = ", ".join(
        f"list_min(list_transform(H, x -> (x * {int(A[i])} + {int(B[i])}) % {P}))"
        for i in range(n_hashes)
    )
    bands = ", ".join(
        "'%d:' || %s"
        % (b, " || ',' || ".join(f"sig[{b * rows + r + 1}]::varchar" for r in range(rows)))
        for b in range(n_bands)
    )
    return f"""
    WITH norm AS (SELECT doc_id, {_NORM} AS t FROM documents),
    pad AS (SELECT doc_id,
                   CASE WHEN length(t) < {k} THEN rpad(t, {k}, ' ') ELSE t END AS sp
            FROM norm),
    hs AS (SELECT doc_id,
                  list_transform(generate_series(1, length(sp) - {k - 1}),
                                 i -> {_poly31_hash_terms("sp", k)}) AS H
           FROM pad),
    sig AS (SELECT doc_id, [{mins}] AS sig FROM hs),
    bands AS (SELECT doc_id, unnest([{bands}]) AS band FROM sig),
    cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
             FROM bands a JOIN bands b ON a.band = b.band AND a.doc_id < b.doc_id),
    ish AS (SELECT doc_id, list_distinct(H) AS v FROM hs),
    verified AS (
      SELECT c.id_a, c.id_b,
             round(len(list_intersect(sa.v, sb.v)) * 1.0
                   / len(list_distinct(list_concat(sa.v, sb.v))), 6) AS jaccard
      FROM cand c JOIN ish sa ON c.id_a = sa.doc_id JOIN ish sb ON c.id_b = sb.doc_id)
    SELECT id_a, id_b, jaccard FROM verified WHERE jaccard >= {min_j}
    """


@query("q17_minhash_lsh_pairs", _minhash_sql())
def q17(spark, sf_dir):
    return doc_dedup.minhash_lsh_pairs(
        _t(spark, sf_dir, "documents"),
        n_hashes=8, n_bands=4, min_jaccard=0.35, shingle_k=8,
    )


# ================================================== similarity (embeddings)
@query(
    "q18_cosine_topk",
    """
    WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0)
    SELECT vec_id,
           round(list_dot_product(embedding::DOUBLE[], q.qv)
                 / (sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
                    * sqrt(list_dot_product(q.qv, q.qv))), 4) AS score
    FROM embeddings, q
    ORDER BY score DESC, vec_id
    LIMIT 10
    """,
)
def q18(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    return similarity.cosine_topk(emb, qv, k=10)


def _lsh_ann_sql(n_bits=4, seed=7, dim=64, k=10) -> str:
    planes = similarity.hyperplanes(dim, n_bits, seed)
    lits = [("[" + ", ".join(repr(float(x)) for x in row) + "]") for row in planes]
    bits = " || ".join(
        f"(CASE WHEN list_dot_product(embedding::DOUBLE[], {lit}) > 0 THEN '1' ELSE '0' END)"
        for lit in lits
    )
    return f"""
    WITH b AS (SELECT vec_id, embedding, {bits} AS bucket FROM embeddings),
    q AS (SELECT bucket AS qb, embedding::DOUBLE[] AS qv FROM b WHERE vec_id = 0)
    SELECT vec_id,
           round(list_dot_product(embedding::DOUBLE[], q.qv)
                 / (sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
                    * sqrt(list_dot_product(q.qv, q.qv))), 4) AS score
    FROM b, q
    WHERE b.bucket = q.qb
    ORDER BY score DESC, vec_id
    LIMIT {k}
    """


@query("q19_lsh_ann_topk", _lsh_ann_sql())
def q19(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    return similarity.lsh_bucket_topk(emb, qv, k=10, n_bits=4, seed=7)


# =================================================== multimodal plumbing
@query(
    "q20_multimodal_features",
    """
    SELECT doc_id, 'text/plain' AS media_type,
           strlen(text) AS n_bytes, ascii(substr(text, 1, 1)) AS first_byte
    FROM documents
    """,
)
def q20(spark, sf_dir):
    media = multimodal.attach_media(_t(spark, sf_dir, "documents"))
    feats = multimodal.extract_features(media)
    return feats.select(
        "doc_id",
        "media_type",
        F.col("n_bytes").cast("long").alias("n_bytes"),
        F.col("first_byte").cast("int").alias("first_byte"),
    )


# kNN join: top-3 corpus neighbors for each of 3 probe vectors (mapInPandas
# batch matmul + global top-k per probe).
@query(
    "q22_knn_join",
    """
    WITH probes AS (SELECT vec_id AS probe_id, embedding::DOUBLE[] AS pv
                    FROM embeddings WHERE vec_id IN (0, 1, 2)),
    scored AS (
      SELECT p.probe_id, e.vec_id,
             round(list_dot_product(e.embedding::DOUBLE[], p.pv)
                   / (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))
                      * sqrt(list_dot_product(p.pv, p.pv))), 4) AS score
      FROM embeddings e CROSS JOIN probes p),
    ranked AS (SELECT *, row_number() OVER (PARTITION BY probe_id
                                            ORDER BY score DESC, vec_id) AS rank
               FROM scored)
    SELECT probe_id, vec_id, score, rank FROM ranked WHERE rank <= 3
    """,
)
def q22(spark, sf_dir):
    import pandas as pd

    emb = _t(spark, sf_dir, "embeddings")
    probes_rows = emb.filter(F.col("vec_id").isin(0, 1, 2)).collect()
    probes = pd.DataFrame({
        "probe_id": [r["vec_id"] for r in probes_rows],
        "vec": [np.asarray(r["embedding"], dtype=np.float64) for r in probes_rows],
    })
    return similarity.knn_join_cosine(emb, probes, k=3)


def _simhash_sql(band_bits: int = 16, max_doc: int = 500) -> str:
    """DuckDB mirror of doc_dedup.simhash_signatures + banding.

    Same md5 bit votes: token hash = first 16 hex chars of md5(token) split
    into two 32-bit halves; per-bit vote sums over all token OCCURRENCES;
    signature bit i set iff vote > 0. Banding on the unsigned 64-bit value.
    """
    n_bands = 64 // band_bits
    votes = ", ".join(
        f"sum(CASE WHEN ({'lo' if i < 32 else 'hi'} >> {i % 32}) & 1 = 1 "
        f"THEN 1 ELSE -1 END) AS v{i}"
        for i in range(64)
    )
    # literal 2^i values: DuckDB's << raises on 1 << 63 rather than wrapping
    sig_or = " | ".join(
        f"(CASE WHEN v{i} > 0 THEN {1 << i}::UBIGINT ELSE 0::UBIGINT END)"
        for i in range(64)
    )
    bands = ", ".join(
        f"'{i}:' || ((sig >> {i * band_bits}) & {(1 << band_bits) - 1}::UBIGINT)::varchar"
        for i in range(n_bands)
    )
    return rf"""
    WITH d AS (SELECT doc_id, lower(text) AS s FROM documents
               WHERE doc_id < {max_doc}),
    toks AS (SELECT doc_id, unnest(string_split_regex(s, '\s+')) AS tok FROM d),
    h AS (SELECT doc_id,
                 ('0x' || substr(md5(tok), 1, 8))::UBIGINT::BIGINT AS hi,
                 ('0x' || substr(md5(tok), 9, 8))::UBIGINT::BIGINT AS lo
          FROM toks WHERE tok <> ''),
    v AS (SELECT doc_id, {votes} FROM h GROUP BY doc_id),
    sg AS (SELECT doc_id, {sig_or} AS sig FROM v),
    allsig AS (SELECT d.doc_id AS id, coalesce(sg.sig, 0::UBIGINT) AS sig
               FROM d LEFT JOIN sg ON d.doc_id = sg.doc_id),
    bands AS (SELECT id, unnest([{bands}]) AS band FROM allsig)
    SELECT DISTINCT a.id AS id_a, b.id AS id_b
    FROM bands a JOIN bands b ON a.band = b.band AND a.id < b.id
    """


# SimHash near-dup candidates — all-Catalyst md5 bit votes (no per-token
# Python; see doc_dedup.simhash_signatures), bit-for-bit reproduced by the
# DuckDB oracle. Bounded to doc_id < 500 so the candidate set stays
# deterministic and O(small) at every SF.
@query("q23_simhash_candidates", _simhash_sql())
def q23(spark, sf_dir):
    return doc_dedup.simhash_candidates(
        _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 500),
        band_bits=16,
    )


# ------------------------- q24: FULL CDC ENGINE REPLAY (the flagship) -----
# Initial state and a 4-batch change log are derived DETERMINISTICALLY from
# the driver's documents/events tables (no RNG), the real engine replays
# them (bootstrap → validate → quarantine → dedup → normalize → merge →
# manifest commit, reference georef_ar_etl/transformers.py:67-151), and the
# DuckDB oracle replicates the replay algebraically: the engine's
# batch-by-batch fold is equivalent to "latest VALID event per key wins"
# under (batch_id, seq) order, because validation is per-event and
# last-writer-wins is associative across batches.
#
# The derived log exercises every quarantine rule: bad_op (event_id%97),
# bad_id (%89), empty_tokens (%53), null_token_element (%61),
# empty_tokens_after_norm (%59) — plus dirty payloads that normalization
# must clean (negative leading token, trailing zero padding) and op mix
# insert/update/delete from the event_type column.

_Q24_TOKENS_SQL = """
      CASE WHEN event_id % 53 = 0 THEN []::INT[]
           WHEN event_id % 61 = 0 THEN [1, NULL, 2]
           WHEN event_id % 59 = 0 THEN [-5, 0, 0]
           WHEN event_id % 3 = 0 THEN [
                ((event_id % 97) - 3)::INT, (user_id % 50)::INT,
                ((event_id % 41) + 1)::INT, 0, 0]
           ELSE [((event_id % 97) - 3)::INT, (user_id % 50)::INT,
                 ((event_id % 41) + 1)::INT]
      END
"""

# shared CTE prefix: the derived initial state + event log + validation
# rules, reused by the q24 full-replay oracle and the q30 changelog oracle
_Q24_BASE_CTES = f"""
    init AS (
      SELECT lpad(doc_id::varchar, 13, '0') AS doc_id,
             [(doc_id % 89 + 1)::INT, 0, (n_chars % 97 + 1)::INT,
              ((doc_id * 7) % 83 + 1)::INT] AS tokens,
             4 AS n_tok, source
      FROM documents),
    ev AS (
      SELECT (event_id % 4)::bigint AS batch_id, event_id::bigint AS seq,
             CASE WHEN event_id % 97 = 0 THEN 'upsert'
                  WHEN event_type = 'error' THEN 'delete'
                  WHEN event_type = 'signup' THEN 'insert'
                  ELSE 'update' END AS op,
             CASE WHEN event_id % 89 = 0
                    THEN substr(lpad((event_id % 600)::varchar, 13, '0'), 1, 5)
                  ELSE lpad((event_id % 600)::varchar, 13, '0') END AS doc_id,
             {_Q24_TOKENS_SQL} AS tokens,
             (event_id % 7)::INT AS n_tok,
             event_type AS source
      FROM events),
    valid AS (
      SELECT * FROM ev
      WHERE op IN ('insert', 'update', 'delete')
        AND doc_id IS NOT NULL AND length(doc_id) = 13
        AND (op = 'delete' OR (
             tokens IS NOT NULL AND len(tokens) > 0
             AND len(list_filter(tokens, x -> x IS NULL)) = 0
             AND len(list_filter(tokens, x -> x > 0)) > 0)))"""


def _q24_state_ctes(suffix: str, batch_filter: str) -> str:
    """latest/upserts/state CTEs (suffixed) applying the valid events under
    ``batch_filter`` onto init — latest-valid-event-wins + normalization."""
    return f"""
    latest{suffix} AS (
      SELECT * FROM (
        SELECT *, row_number() OVER (PARTITION BY doc_id
                                     ORDER BY batch_id DESC, seq DESC) AS rn
        FROM valid WHERE {batch_filter}) WHERE rn = 1),
    ups{suffix} AS (
      SELECT doc_id, nn[1:lastnz::int] AS tokens, lastnz::int AS n_tok, source
      FROM (
        SELECT doc_id, nn,
               coalesce(list_max(list_transform(
                   generate_series(1, greatest(len(nn), 1)),
                   i -> CASE WHEN nn[i::int] <> 0 THEN i ELSE 0 END)), 0) AS lastnz,
               source
        FROM (SELECT doc_id, list_filter(tokens, x -> x >= 0) AS nn, source
              FROM latest{suffix} WHERE op <> 'delete'))),
    state{suffix} AS (
      SELECT i.doc_id, i.tokens, i.n_tok, i.source FROM init i
      WHERE NOT EXISTS (SELECT 1 FROM latest{suffix} l WHERE l.doc_id = i.doc_id)
      UNION ALL
      SELECT doc_id, tokens, n_tok, source FROM ups{suffix})"""


_Q24_SQL = f"""
    WITH {_Q24_BASE_CTES},{_q24_state_ctes("", "TRUE")}
    SELECT doc_id, md5(array_to_string(tokens, ',')) AS tokens_fp, n_tok, source
    FROM state
"""


def _q24_inputs(spark, sf_dir):
    """Spark twins of the oracle's ``init`` and ``ev`` CTEs (expression-for-
    expression, so both engines replay the identical log)."""
    docs = _t(spark, sf_dir, "documents")
    initial = docs.select(
        F.lpad(F.col("doc_id").cast("string"), 13, "0").alias("doc_id"),
        F.array(
            (F.col("doc_id") % 89 + 1).cast("int"),
            F.lit(0),
            (F.col("n_chars") % 97 + 1).cast("int"),
            ((F.col("doc_id") * 7) % 83 + 1).cast("int"),
        ).alias("tokens"),
        F.lit(4).alias("n_tok"),
        F.col("source"),
    )
    e = _t(spark, sf_dir, "events")
    eid, uid = F.col("event_id"), F.col("user_id")
    base = [
        ((eid % 97) - 3).cast("int"),
        (uid % 50).cast("int"),
        ((eid % 41) + 1).cast("int"),
    ]
    tokens = (
        F.when(eid % 53 == 0, F.array().cast("array<int>"))
        .when(eid % 61 == 0, F.array(F.lit(1), F.lit(None).cast("int"), F.lit(2)))
        .when(eid % 59 == 0, F.array(F.lit(-5), F.lit(0), F.lit(0)))
        .when(eid % 3 == 0, F.array(*base, F.lit(0), F.lit(0)))
        .otherwise(F.array(*base))
    )
    doc_id = F.lpad((eid % 600).cast("string"), 13, "0")
    events = e.select(
        (eid % 4).cast("long").alias("batch_id"),
        eid.cast("long").alias("seq"),
        F.when(eid % 97 == 0, "upsert")
        .when(F.col("event_type") == "error", "delete")
        .when(F.col("event_type") == "signup", "insert")
        .otherwise("update")
        .alias("op"),
        F.when(eid % 89 == 0, F.substring(doc_id, 1, 5)).otherwise(doc_id).alias("doc_id"),
        tokens.alias("tokens"),
        (eid % 7).cast("int").alias("n_tok"),
        F.col("event_type").alias("source"),
    )
    return initial, events


@query("q24_cdc_replay_state", _Q24_SQL)
def q24(spark, sf_dir):
    from georef_ar_etl_spark.engine import CdcEngine

    initial, events = _q24_inputs(spark, sf_dir)
    root = _ephemeral_table_root("cdc_replay_q24", sf_dir)
    eng = CdcEngine(spark, root, n_buckets=16)
    eng.bootstrap(initial)
    eng.replay(events, batch_ids=[0, 1, 2, 3])
    return eng.state().select(
        "doc_id",
        _arr_fp(F.col("tokens")).alias("tokens_fp"),
        "n_tok",
        "source",
    )


def _q30_sql(n_batches: int = 4) -> str:
    """DuckDB mirror of the incremental changelog over the q24 replay.

    The oracle derives per-epoch cumulative states (state0..state{k}) with
    the same latest-valid-event-wins CTEs as q24, then emits each epoch's
    VALUE DIFF vs its parent: new/changed rows as upserts, vanished keys as
    deletes. The Spark side runs the engine in pure copy-on-write
    (mor_rewrite_ratio=0) so every epoch takes the rewrite path, whose
    changelog is value-diff-based — mode-independent rows, exactly what
    this SQL computes (the delta path's event-based superset is covered by
    tests/test_changelog.py's replay oracle)."""
    states = "".join(
        "," + _q24_state_ctes(str(k), f"batch_id <= {k}") for k in range(n_batches)
    )
    diffs = []
    for k in range(n_batches):
        prev = "init" if k == 0 else f"state{k - 1}"
        diffs.append(f"""
      SELECT {k + 1}::INT AS change_epoch, {k}::BIGINT AS batch_id,
             'upsert' AS op, n.doc_id,
             md5(array_to_string(n.tokens, ',')) AS tokens_fp,
             n.n_tok::INT AS n_tok, n.source
      FROM state{k} n LEFT JOIN {prev} o USING (doc_id)
      WHERE o.doc_id IS NULL OR n.tokens IS DISTINCT FROM o.tokens
         OR n.n_tok IS DISTINCT FROM o.n_tok
         OR n.source IS DISTINCT FROM o.source
      UNION ALL
      SELECT {k + 1}::INT, {k}::BIGINT, 'delete', o.doc_id,
             NULL::VARCHAR, NULL::INT, NULL::VARCHAR
      FROM {prev} o
      WHERE NOT EXISTS (SELECT 1 FROM state{k} n WHERE n.doc_id = o.doc_id)""")
    return f"""
    WITH {_Q24_BASE_CTES}{states}
    {" UNION ALL ".join(diffs)}
"""


# the engine's incremental changelog (Iceberg incremental-scan analogue),
# driver-checked end-to-end: replay 4 batches, read changes(0, 4), compare
# every emitted row against the SQL-computed per-epoch state diffs.
@query("q30_cdc_changelog", _q30_sql())
def q30(spark, sf_dir):
    from georef_ar_etl_spark.engine import CdcEngine

    initial, events = _q24_inputs(spark, sf_dir)
    root = _ephemeral_table_root("cdc_changelog_q30", sf_dir)
    eng = CdcEngine(spark, root, n_buckets=16, mor_rewrite_ratio=0)
    eng.bootstrap(initial)
    eng.replay(events, batch_ids=[0, 1, 2, 3])
    return eng.changes(0, 4).select(
        "change_epoch",
        "batch_id",
        "op",
        "doc_id",
        _arr_fp(F.col("tokens")).alias("tokens_fp"),
        "n_tok",
        "source",
    )


_Q34_SQL = f"""
    WITH {_Q24_BASE_CTES},{_q24_state_ctes("", "TRUE")}
    SELECT md5(array_to_string(tokens, ',')) AS fp,
           count(*) AS n_dups,
           min(doc_id) AS keep_id
    FROM state
    GROUP BY 1
"""


# Incremental index maintenance driven by the changelog (the consumer that
# proves read_changes' point): the exact-dedup fingerprint index is
# bootstrapped ONCE from the source table's epoch-0 state, then maintained
# epoch-by-epoch from engine.changes() — fingerprints computed only for
# changed rows, old-fingerprint lookups bucket-pruned, postings updated per
# affected group. The oracle computes the same group table from the FULL
# final state: equality proves incremental == batch recompute.
@query("q34_incremental_fingerprint_index", _Q34_SQL)
def q34(spark, sf_dir):
    from georef_ar_etl_spark.engine import CdcEngine
    from georef_ar_etl_spark.operators.index_maintenance import FingerprintIndex

    initial, events = _q24_inputs(spark, sf_dir)
    root = _ephemeral_table_root("cdc_fpindex_q34", sf_dir)
    eng = CdcEngine(spark, f"{root}/src", n_buckets=16)
    eng.bootstrap(initial)
    idx = FingerprintIndex(spark, f"{root}/idx", n_buckets=8)
    idx.bootstrap(eng.state(epoch=0), source_epoch=0)
    for b in (0, 1, 2, 3):
        m = eng.apply_batch(events.filter(F.col("batch_id") == b), b)
        idx.refresh(eng.changes(idx.last_source_epoch, m["epoch"]), m["epoch"])
    return idx.groups()


# Same oracle as q30 (per-epoch VALUE diffs), but the engine runs
# merge-on-read (mor_rewrite_ratio=1.0 forces DELTA epochs, whose default
# changelog is event-based) and the read passes value_diff=True — proving
# the flag makes the changelog mode-independent end-to-end: physical delta
# layout in, exact value-diff rows out, hash-equal to the SQL state diffs.
@query("q39_cdc_changelog_value_diff", _q30_sql())
def q39(spark, sf_dir):
    from georef_ar_etl_spark.engine import CdcEngine

    initial, events = _q24_inputs(spark, sf_dir)
    root = _ephemeral_table_root("cdc_changelog_q39", sf_dir)
    eng = CdcEngine(
        spark, root, n_buckets=16, mor_rewrite_ratio=1.0, mor_max_deltas=8
    )
    eng.bootstrap(initial)
    manifests = eng.replay(events, batch_ids=[0, 1, 2, 3])
    if not any(m["metrics"]["merge_modes"]["delta"] for m in manifests):
        # every epoch rewrote -> this query would degenerate to q30 and
        # stop testing the value_diff post-filter; fail loudly instead
        raise AssertionError("q39 requires at least one delta epoch")
    return eng.changes(0, 4, value_diff=True).select(
        "change_epoch",
        "batch_id",
        "op",
        "doc_id",
        _arr_fp(F.col("tokens")).alias("tokens_fp"),
        "n_tok",
        "source",
    )


def _q38_centroids(sf_dir: str):
    """Deterministic fixed centroids for the incremental IVF index: numpy
    kmeans (similarity._kmeans_lloyd — the q26/q37 trainer) over the
    epoch-0 init vectors, which are derivable straight from
    documents.parquet (the same expressions as _Q24_BASE_CTES' init CTE),
    so the Spark query and the DuckDB oracle train the IDENTICAL index."""
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"])
    ids = t.column("doc_id").to_numpy()
    nch = t.column("n_chars").to_numpy()
    order = np.argsort(ids, kind="stable")[:4096]
    V = np.stack(
        [ids % 89 + 1, np.zeros(len(ids), dtype=np.int64), nch % 97 + 1, (ids * 7) % 83 + 1],
        axis=1,
    ).astype(np.float64)[order]
    return similarity._kmeans_lloyd(V, n_clusters=4, n_iter=3, seed=7)


def _q38_sql() -> str | None:
    try:
        C = _q38_centroids(_IVF_SF_DIR)
    except FileNotFoundError:
        return None  # testdata absent: rows-only check (see _ivf_sql note)
    dim = 4
    xs = [f"x{j + 1}" for j in range(dim)]
    dists = []
    for c in C:
        terms = " + ".join(
            f"({x} - {float(c[j])!r}) * ({x} - {float(c[j])!r})"
            for j, x in enumerate(xs)
        )
        dists.append(f"sqrt({terms})")
    vcols = ", ".join(
        f"coalesce(tokens[{j + 1}], 0)::DOUBLE AS x{j + 1}" for j in range(dim)
    )
    return f"""
    WITH {_Q24_BASE_CTES},{_q24_state_ctes("", "TRUE")},
    v AS (SELECT doc_id, {vcols} FROM state),
    d AS (SELECT doc_id, [{", ".join(dists)}] AS ds FROM v)
    SELECT doc_id, (list_position(ds, list_min(ds)) - 1)::INT AS cluster FROM d
    """


LAZY_ORACLE_SQL["q38_incremental_ivf_postings"] = _q38_sql


# Incremental IVF posting-list maintenance (the ANN stretch of the q34
# consumer): fixed centroids trained once at epoch 0; each epoch assigns
# ONLY the changed vectors (pure-Catalyst distance argmin, no UDF) and
# updates the cluster postings — never retrain-and-reassign the corpus.
# The oracle assigns the FULL final state to the same inlined centroids:
# equality proves incremental == batch.
@query("q38_incremental_ivf_postings")
def q38(spark, sf_dir):
    from georef_ar_etl_spark.engine import CdcEngine
    from georef_ar_etl_spark.operators.index_maintenance import IvfClusterIndex

    initial, events = _q24_inputs(spark, sf_dir)
    C = _q38_centroids(sf_dir)
    root = _ephemeral_table_root("cdc_ivfidx_q38", sf_dir)
    eng = CdcEngine(spark, f"{root}/src", n_buckets=16)
    eng.bootstrap(initial)

    def vec_of():
        return [
            F.coalesce(F.get(F.col("tokens"), j).cast("double"), F.lit(0.0))
            for j in range(4)
        ]

    idx = IvfClusterIndex(spark, f"{root}/idx", centroids=C, vec_of=vec_of, n_buckets=8)
    idx.bootstrap(eng.state(epoch=0), source_epoch=0)
    for b in (0, 1, 2, 3):
        m = eng.apply_batch(events.filter(F.col("batch_id") == b), b)
        idx.refresh(eng.changes(idx.last_source_epoch, m["epoch"]), m["epoch"])
    return idx.members().select("doc_id", "cluster")


_Q42_SQL = r"""
    WITH w AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '\s+'),
                         x -> x <> '') AS words
      FROM documents)
    SELECT doc_id,
           md5(array_to_string(
             list_transform(words,
               x -> ((('0x' || substr(md5(x), 1, 8))::UBIGINT % 32768)::INT)
             ), ',')) AS ids_fp,
           len(words) AS n_tok
    FROM w
"""


# deterministic hash tokenizer (feature-hashing trick): word -> md5 mod
# vocab ids, no vocabulary artifact, identical across engines — the
# text->tokens featurization step of the pre-tokenized-sequence pipeline.
@query("q42_hash_tokenize", _Q42_SQL)
def q42(spark, sf_dir):
    ids = text.hash_tokenize(F.col("text"), vocab_size=32768)
    return _t(spark, sf_dir, "documents").select(
        "doc_id",
        _arr_fp(ids).alias("ids_fp"),
        F.size(ids).cast("long").alias("n_tok"),
    )


_Q43_SQL = r"""
    SELECT tok, count(*) AS freq
    FROM (SELECT unnest(string_split_regex(lower(text), '\s+')) AS tok
          FROM documents)
    WHERE tok <> ''
    GROUP BY tok
    ORDER BY freq DESC, tok
    LIMIT 50
"""


# corpus vocabulary histogram (the word-count shape: map-side partial
# combine, shuffle carries one row per word per map task)
@query("q43_vocabulary_topk", _Q43_SQL)
def q43(spark, sf_dir):
    return text.vocabulary(_t(spark, sf_dir, "documents"), k=50)


_Q41_SQL = """
    WITH p AS (
      SELECT source, doc_id, n_chars,
             floor((sum(n_chars) OVER (PARTITION BY source ORDER BY doc_id)
                    - n_chars) / 4000)::INT AS pack_seq
      FROM documents)
    SELECT source, pack_seq, count(*) AS n_docs,
           sum(n_chars)::BIGINT AS total_chars,
           md5(array_to_string(list_sort(list(doc_id)), ',')) AS docs_fp
    FROM p GROUP BY 1, 2
"""


# deterministic greedy sequence packing (pretraining batch layout): docs in
# (source, doc_id) order cut into ~4000-unit packs, a doc going whole into
# the pack where it starts — a pure window prefix-sum, so the assignment is
# identical under any partitioning and in any SQL engine.
@query("q41_sequence_packing", _Q41_SQL)
def q41(spark, sf_dir):
    from georef_ar_etl_spark.operators import corpus

    d = _t(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    packed = corpus.pack_sequences(d, capacity=4000, len_col="n_chars")
    return packed.groupBy("source", "pack_seq").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        F.md5(
            F.array_join(F.sort_array(F.collect_list("doc_id")).cast("array<string>"), ",")
        ).alias("docs_fp"),
    )


def _q44_sql() -> str:
    """Components oracle: transitive closure by recursive CTE (reach the
    whole component from every vertex, take the min) over the SAME minhash
    pair set as q17 — docs without near-dups get their own id (singleton
    groups)."""
    return f"""
    WITH RECURSIVE
    pairs AS (SELECT id_a, id_b FROM ({_minhash_sql()}) mh),
    sym AS (SELECT id_a AS a, id_b AS b FROM pairs
            UNION ALL SELECT id_b, id_a FROM pairs),
    reach(v, u) AS (
      SELECT a, a FROM sym
      UNION
      SELECT r.v, s.b FROM reach r JOIN sym s ON r.u = s.a
    ),
    comp AS (SELECT v, min(u) AS component FROM reach GROUP BY v)
    SELECT d.doc_id, coalesce(c.component, d.doc_id) AS component
    FROM documents d LEFT JOIN comp c ON d.doc_id = c.v
    """


# near-dup pair graph -> DEDUP GROUPS: connected components via iterative
# min-label propagation + pointer jumping (Kiveris et al.), the step that
# turns q17's pairwise findings into keep-one-per-group clusters. The
# oracle computes the transitive closure with a recursive CTE over the
# identical pair set: iterative distributed == exact closure.
@query("q44_dedup_components", _q44_sql())
def q44(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    pairs = doc_dedup.minhash_lsh_pairs(
        docs, n_hashes=8, n_bands=4, min_jaccard=0.35, shingle_k=8
    )
    return doc_dedup.dedup_groups(docs, pairs)


def _pii_sql() -> str:
    """DuckDB mirror of text.redact_pii over deterministically PII-injected
    text. The chain is generated from the SAME PII_PATTERNS dict the Spark
    operator uses, in the same order (IP before PHONE — the 3-digit-octet
    IPs injected below would otherwise take the wrong placeholder), so the
    two engines cannot drift. Patterns are RE2-safe by design: identical
    semantics under Java regex and DuckDB's RE2."""
    from georef_ar_etl_spark.operators.text import PII_PATTERNS

    expr = "t"
    for tag, pat in PII_PATTERNS.items():
        expr = f"regexp_replace({expr}, '{pat}', '<{tag}>', 'g')"
    return f"""
    WITH d AS (
      SELECT doc_id,
             text || ' contact user' || doc_id || '@mail.example.com tel +54 555 '
                  || lpad(((doc_id * 7) % 1000)::varchar, 3, '0') || '-'
                  || lpad((doc_id % 10000)::varchar, 4, '0')
                  || ' ip 10.120.130.' || ((doc_id % 250) + 1)::varchar AS t
      FROM documents)
    SELECT doc_id, {expr} AS clean_text FROM d
    """


# PII redaction (the standard scrub pass before pretraining): emails, phone
# numbers and IPv4 addresses → typed placeholders, chained JVM
# regexp_replace (codegen'd, no UDF). The corpus carries no real PII, so
# both engines inject the same deterministic doc_id-derived email/phone/IP
# shapes first — including 3-digit-octet IPs that exercise the
# IP-before-PHONE pattern ordering.
@query("q35_pii_redaction", _pii_sql())
def q35(spark, sf_dir):
    d = F.col("doc_id").cast("string")
    injected = F.concat(
        F.col("text"),
        F.lit(" contact user"), d, F.lit("@mail.example.com tel +54 555 "),
        F.lpad(((F.col("doc_id") * 7) % 1000).cast("string"), 3, "0"),
        F.lit("-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        F.lit(" ip 10.120.130."),
        ((F.col("doc_id") % 250) + 1).cast("string"),
    )
    return _t(spark, sf_dir, "documents").select(
        "doc_id", text.redact_pii(injected).alias("clean_text")
    )


_NGRAM_JACCARD_SQL = r"""
    WITH n AS (SELECT doc_id AS id, source AS blk,
                      trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS t
               FROM documents),
    s AS (SELECT id, blk,
                 list_distinct(list_transform(
                   generate_series(1, greatest(length(t) - 2, 1)),
                   i -> substr(t, i::int, 3))) AS sh
          FROM n)
    SELECT a.id AS id_a, b.id AS id_b,
           round(len(list_intersect(a.sh, b.sh))::DOUBLE
                 / len(list_distinct(a.sh || b.sh)), 6) AS jaccard
    FROM s a JOIN s b ON a.blk = b.blk AND a.id < b.id
    WHERE round(len(list_intersect(a.sh, b.sh))::DOUBLE
                / len(list_distinct(a.sh || b.sh)), 6) >= 0.6
"""


# exact blocked all-pairs n-gram Jaccard (the honest O(block²) baseline the
# LSH family approximates; blocking bounds the quadratic the way the
# reference's per-province loop bounds its spatial self-join,
# georef_ar_etl/intersections.py:29-40)
@query("q36_ngram_jaccard_pairs", _NGRAM_JACCARD_SQL)
def q36(spark, sf_dir):
    return doc_dedup.ngram_jaccard_pairs(
        _t(spark, sf_dir, "documents"),
        block_col="source",
        min_jaccard=0.6,
        shingle_k=3,
    ).select("id_a", "id_b", "jaccard")


def _neardup_sql(n_bits=5, seed=7, dim=64, min_cos=0.25) -> str:
    planes = similarity.hyperplanes(dim, n_bits, seed)
    lits = [("[" + ", ".join(repr(float(x)) for x in row) + "]") for row in planes]
    bits = " || ".join(
        f"(CASE WHEN list_dot_product(embedding::DOUBLE[], {lit}) > 0 THEN '1' ELSE '0' END)"
        for lit in lits
    )
    return f"""
    WITH b AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v, {bits} AS bucket
               FROM embeddings)
    SELECT l.id AS id_a, r.id AS id_b,
           round(list_dot_product(l.v, r.v)
                 / (sqrt(list_dot_product(l.v, l.v)) * sqrt(list_dot_product(r.v, r.v))),
                 4) AS cosine
    FROM b l JOIN b r ON l.bucket = r.bucket AND l.id < r.id
    WHERE round(list_dot_product(l.v, r.v)
                / (sqrt(list_dot_product(l.v, l.v)) * sqrt(list_dot_product(r.v, r.v))),
                4) >= {min_cos}
    """


# embedding-cosine near-dup (dedup family, LSH-bucketed verification)
@query("q25_embedding_neardup", _neardup_sql())
def q25(spark, sf_dir):
    return similarity.embedding_neardup_pairs(
        _t(spark, sf_dir, "embeddings"), n_bits=5, min_cosine=0.25, seed=7
    )


# IVF approximate nearest neighbors: seeded-deterministic kmeans index, ONE
# fused assignment+probe scan (no corpus join). The oracle is generated by
# training the IDENTICAL index (same ordered sample, same numpy kmeans) from
# the sf0.01 parquet via pyarrow and inlining the centroids as literals —
# the _lsh_ann_sql pattern, extended to a data-dependent index. The driver
# always runs oracles at sf0.01, so the literals match what the Spark path
# trains there.
_IVF_SF_DIR = "/root/testdata/sf0.01"


def _ivf_sql(n_clusters=8, n_iter=5, seed=7, nprobe=3, k=10) -> str | None:
    try:
        C = similarity.ivf_index_from_parquet(
            f"{_IVF_SF_DIR}/embeddings.parquet",
            n_clusters=n_clusters, n_iter=n_iter, seed=seed,
        )
        import pyarrow.parquet as pq

        t = pq.read_table(f"{_IVF_SF_DIR}/embeddings.parquet")
        qv = [
            float(x)
            for x in t.filter(np.asarray(t.column("vec_id")) == 0)
            .column("embedding").to_pylist()[0]
        ]
    except FileNotFoundError:
        return None  # testdata absent: q26 degrades to a rows-only check
        # (any OTHER failure propagates — a broken index trainer, an
        # unreadable/corrupt file, anything — must fail the oracle build
        # loudly, not silently weaken the check)
    probe = similarity.probe_clusters(C, qv, nprobe)
    lits = [("[" + ", ".join(repr(float(x)) for x in row) + "]") for row in C]
    dists = ", ".join(f"list_distance(v, {lit})" for lit in lits)
    return f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    a AS (SELECT vec_id, v, [{dists}] AS ds FROM e),
    c AS (SELECT vec_id, v FROM a
          WHERE list_position(ds, list_min(ds)) - 1 IN ({", ".join(map(str, probe))})),
    q AS (SELECT v AS qv FROM e WHERE vec_id = 0)
    SELECT vec_id,
           round(list_dot_product(c.v, q.qv)
                 / (sqrt(list_dot_product(c.v, c.v))
                    * sqrt(list_dot_product(q.qv, q.qv))), 4) AS score
    FROM c, q
    ORDER BY score DESC, vec_id
    LIMIT {k}
    """


LAZY_ORACLE_SQL["q26_ivf_ann_topk"] = _ivf_sql


@query("q26_ivf_ann_topk")
def q26(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    centroids = similarity.ivf_index(emb, n_clusters=8, n_iter=5, seed=7)
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    return similarity.ivf_topk(emb, qv, centroids, k=10, nprobe=3)


def _ivf_quant_sql(n_clusters=8, n_iter=5, seed=7, nprobe=3, k=10) -> str | None:
    """Oracle for the quantized IVF probe: the SAME float-trained centroid
    literals as q26 (identical sample + kmeans), but assignment and scoring
    run over the int8-DEQUANTIZED vectors (q33's quantization formula,
    round::TINYINT then * scale), with the float query vector — exactly
    what the fused Spark kernel computes, so equality is exact, not
    error-bounded."""
    try:
        C = similarity.ivf_index_from_parquet(
            f"{_IVF_SF_DIR}/embeddings.parquet",
            n_clusters=n_clusters, n_iter=n_iter, seed=seed,
        )
        import pyarrow.parquet as pq

        t = pq.read_table(f"{_IVF_SF_DIR}/embeddings.parquet")
        qv = [
            float(x)
            for x in t.filter(np.asarray(t.column("vec_id")) == 0)
            .column("embedding").to_pylist()[0]
        ]
    except FileNotFoundError:
        return None  # testdata absent: rows-only check (see _ivf_sql note)
    probe = similarity.probe_clusters(C, qv, nprobe)
    lits = [("[" + ", ".join(repr(float(x)) for x in row) + "]") for row in C]
    dists = ", ".join(f"list_distance(dv, {lit})" for lit in lits)
    return f"""
    WITH s AS (SELECT vec_id, embedding::DOUBLE[] AS v,
                      coalesce(list_max(list_transform(embedding::DOUBLE[],
                                                       x -> abs(x))), 0.0)
                      / 127.0 AS scale
               FROM embeddings),
    qz AS (SELECT vec_id,
                  list_transform(v, x -> round(x / scale)::TINYINT::DOUBLE * scale) AS dv
           FROM s WHERE scale > 0),
    a AS (SELECT vec_id, dv, [{dists}] AS ds FROM qz),
    c AS (SELECT vec_id, dv FROM a
          WHERE list_position(ds, list_min(ds)) - 1 IN ({", ".join(map(str, probe))})),
    q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0)
    SELECT vec_id,
           round(list_dot_product(c.dv, q.qv)
                 / (sqrt(list_dot_product(c.dv, c.dv))
                    * sqrt(list_dot_product(q.qv, q.qv))), 4) AS score
    FROM c, q
    ORDER BY score DESC, vec_id
    LIMIT {k}
    """


LAZY_ORACLE_SQL["q37_ivf_quantized_topk"] = _ivf_quant_sql


# IVF ANN over the int8-quantized corpus (q33's codes feeding q26's probe):
# the scan reads codes + scale instead of float vectors — 4x fewer bytes on
# the memory-bandwidth-bound probe path — and dequantizes on the fly in the
# fused kernel.
@query("q37_ivf_quantized_topk")
def q37(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    centroids = similarity.ivf_index(emb, n_clusters=8, n_iter=5, seed=7)
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    quant = similarity.quantize_embeddings(emb).filter(F.col("q_scale") > 0)
    return similarity.ivf_topk_quantized(quant, qv, centroids, k=10, nprobe=3)


def _winnow_sql(k: int = 8, window: int = 4) -> str:
    """DuckDB mirror of text.winnow_fingerprints_udf.

    The numpy kernel's uint64 arithmetic is exactly reproducible: powers are
    built with ``(p * B) & MASK`` and the per-position hash is
    ``(Σ byte·power) mod 2^64 & MASK`` — and since 2^64 is a multiple of
    2^61, both collapse to plain ``mod 2^61``, computed here in HUGEINT.
    Text is ASCII in the testdata, so ``ascii(substr(...))`` equals the
    utf-8 byte the kernel hashes.
    """
    return f"""
    WITH {_winnow_fps_ctes(k, window)}
    SELECT doc_id, md5(array_to_string(fps, ',')) AS fp, len(fps)::int AS n_fp
    FROM fp
    """


def _winnow_fps_ctes(k: int = 8, window: int = 4) -> str:
    """Shared CTE prefix computing each document's winnowing fingerprint
    SET (d → h → fp), used by the q27 fingerprint oracle and the q40
    candidate-pair oracle so the two cannot drift."""
    win_mins = ", ".join(f"hs[(w + {r})::int]" for r in range(window))
    return f"""d AS (SELECT doc_id, lower(text) AS s FROM documents),
    h AS (SELECT doc_id,
                 list_transform(generate_series(1, greatest(length(s) - {k - 1}, 0)),
                                i -> {_poly_hash_terms("s", k)}) AS hs
          FROM d),
    fp AS (SELECT doc_id,
                  CASE WHEN len(hs) = 0 THEN []::BIGINT[]
                       WHEN len(hs) < {window} THEN [list_min(hs)]
                       ELSE list_sort(list_distinct(list_transform(
                              generate_series(1, len(hs) - {window - 1}),
                              w -> least({win_mins}))))
                  END AS fps
           FROM h)"""


# winnowing rolling-hash fingerprints (MOSS-style; Schleimer et al.) —
# projected to a canonical md5 scalar; the polynomial rolling hash is
# replicated bit-for-bit in the DuckDB oracle (see _winnow_sql).
@query("q27_winnow_fingerprints", _winnow_sql())
def q27(spark, sf_dir):
    winnow = text.winnow_fingerprints_udf(k=8, window=4)
    docs = _t(spark, sf_dir, "documents")
    # evaluate the UDF ONCE per row; derive n_fp from the materialized column
    fps = docs.select("doc_id", winnow(F.col("text")).alias("fingerprints"))
    return fps.select(
        "doc_id",
        _arr_fp(F.col("fingerprints")).alias("fp"),
        F.size("fingerprints").alias("n_fp"),
    )


_Q40_SQL = f"""
    WITH {_winnow_fps_ctes()},
    e AS (SELECT doc_id AS id, unnest(fps) AS fp FROM fp),
    keep AS (SELECT fp FROM e GROUP BY fp HAVING count(*) <= 4),
    e2 AS (SELECT e.id, e.fp FROM e JOIN keep USING (fp))
    SELECT a.id AS id_a, b.id AS id_b, count(*) AS n_shared
    FROM e2 a JOIN e2 b ON a.fp = b.fp AND a.id < b.id
    GROUP BY 1, 2
    HAVING count(*) >= 2
"""


# substring-share candidate retrieval on top of the winnowing fingerprints
# (the MOSS pipeline completed: fingerprint -> shared-fingerprint pairs);
# docs sharing a fingerprint share a >= k-char exact substring. The
# doc-frequency cap (<= 4 docs per fingerprint) is the stop-fingerprint /
# hot-key bound — ubiquitous substrings would contribute quadratic groups.
@query("q40_winnow_candidate_pairs", _Q40_SQL)
def q40(spark, sf_dir):
    return doc_dedup.winnow_candidate_pairs(
        _t(spark, sf_dir, "documents"),
        k=8, window=4, min_shared=2, max_doc_freq=4,
    )


def _q45_sql() -> str:
    """Contamination oracle: the q32 md5 split carves train (bucket <
    8000) and test (>= 9000) out of documents; shared winnowing
    fingerprints across the two sides (q27's CTEs), with the doc-frequency
    stop list measured on the TRAIN side, yield the train/test overlap
    pairs."""
    return f"""
    WITH {_winnow_fps_ctes()},
    lab AS (SELECT doc_id,
                   (('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::UBIGINT
                    % 10000)::INT AS b
            FROM documents),
    e AS (SELECT f.doc_id AS id, l.b, unnest(f.fps) AS fp
          FROM fp f JOIN lab l USING (doc_id)),
    tr AS (SELECT id AS train_id, fp FROM e WHERE b < 8000),
    stop AS (SELECT fp FROM tr GROUP BY fp HAVING count(*) > 4),
    tr2 AS (SELECT tr.* FROM tr ANTI JOIN stop USING (fp)),
    te AS (SELECT id AS heldout_id, fp FROM e WHERE b >= 9000)
    SELECT train_id, heldout_id, count(*) AS n_shared
    FROM tr2 JOIN te USING (fp)
    GROUP BY 1, 2
    HAVING count(*) >= 2
    """


# train/test contamination audit (decontamination before pretraining):
# training docs sharing a >= 8-char exact substring with the held-out
# split, via shared winnowing fingerprints — the q32 hash split composed
# with the q27 fingerprint machinery; the held-out side broadcasts, so the
# corpus side never shuffles.
@query("q45_contamination_pairs", _q45_sql())
def q45(spark, sf_dir):
    from georef_ar_etl_spark.operators import corpus

    docs = _t(spark, sf_dir, "documents")
    split = corpus.split_assignment(
        F.col("doc_id"),
        [("train", 0.8), ("val", 0.1), ("test", 0.1)],
        hash_fn="md5",
    )
    labeled = docs.withColumn("split", split)
    return doc_dedup.cross_corpus_overlap(
        labeled.filter(F.col("split") == "train"),
        labeled.filter(F.col("split") == "test"),
        k=8, window=4, min_shared=2, max_doc_freq=4,
    )


def _q46_sql() -> str:
    """Quality-gate oracle: the q13 quality features + q31 repetition
    features as CTEs, then the rule CASE generated from the SAME ordered
    DEFAULT_QUALITY_RULES list the Spark operator evaluates (first failing
    rule wins) — one source of truth for thresholds, so the two engines
    cannot drift."""
    from georef_ar_etl_spark.operators.text import DEFAULT_QUALITY_RULES

    case = " ".join(f"WHEN {p} THEN '{n}'" for n, p in DEFAULT_QUALITY_RULES)
    return rf"""
    WITH base AS (SELECT doc_id, text,
            CASE WHEN length({_NORM}) = 0 THEN 0
                 ELSE len(string_split({_NORM}, ' ')) END AS n_tok
          FROM documents),
    f AS (SELECT doc_id,
            length(text) AS q_n_chars, n_tok AS q_n_tokens,
            round(len(regexp_extract_all(text, '[^\w\s]'))
                  / greatest(length(text), 1), 6) AS q_punct_ratio,
            round(len(regexp_extract_all({_NORM},
                  '\b(the|a|of|and|to|in|is|it)\b'))
                  / greatest(n_tok, 1), 6) AS q_stopword_ratio,
            CASE WHEN length({_NORM}) = 0 THEN []::VARCHAR[]
                 ELSE string_split({_NORM}, ' ') END AS words
          FROM base),
    g AS (SELECT *, len(words) AS total, len(list_distinct(words)) AS d,
            coalesce(list_max(list_transform(list_distinct(words),
                x -> len(list_filter(words, y -> y = x)))), 0) AS best,
            CASE WHEN len(words) >= 2
                 THEN list_transform(generate_series(1, len(words) - 1),
                      i -> words[i] || ' ' || words[i + 1])
                 ELSE []::VARCHAR[] END AS grams
          FROM f),
    r AS (SELECT doc_id, q_n_chars, q_n_tokens, q_punct_ratio, q_stopword_ratio,
            round((total - d) / greatest(total, 1)::DOUBLE, 6) AS dup_word_frac,
            round(best / greatest(total, 1)::DOUBLE, 6) AS top_word_frac,
            round((len(grams) - len(list_distinct(grams)))
                  / greatest(len(grams), 1)::DOUBLE, 6) AS dup_2gram_frac
          FROM g)
    SELECT doc_id, CASE {case} ELSE NULL END AS reason,
           (CASE {case} ELSE NULL END) IS NULL AS keep
    FROM r
    """


# the document quality FILTER stage (C4/Gopher-family rules): keep flag +
# first-failing-rule reason per document — the corpus twin of the engine
# validate->quarantine split, thresholds shared between the Spark operator
# and the oracle via DEFAULT_QUALITY_RULES.
@query("q46_quality_gate", _q46_sql())
def q46(spark, sf_dir):
    return text.quality_gate(_t(spark, sf_dir, "documents")).select(
        "doc_id", "reason", "keep"
    )


_Q47_SQL = """
    WITH h AS (SELECT source, doc_id, n_chars,
                      md5(doc_id::VARCHAR || 'budget') AS hk
               FROM documents),
    c AS (SELECT *, sum(n_chars) OVER (PARTITION BY source ORDER BY hk, doc_id)
                    - n_chars AS started
          FROM h),
    s AS (SELECT * FROM c WHERE started < 30000)
    SELECT source, count(*) AS n_docs, sum(n_chars)::BIGINT AS total_chars,
           md5(array_to_string(list_sort(list(doc_id)), ',')) AS docs_fp
    FROM s GROUP BY 1
"""


# per-source token-budget sampling (data-mixture curation: "up to N length
# units per source", whole docs, deterministic salted-hash admission order)
@query("q47_token_budget_sample", _Q47_SQL)
def q47(spark, sf_dir):
    from georef_ar_etl_spark.operators import corpus

    d = _t(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    s = corpus.token_budget_sample(d, budget=30000, len_col="n_chars")
    return s.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        F.md5(
            F.array_join(F.sort_array(F.collect_list("doc_id")).cast("array<string>"), ",")
        ).alias("docs_fp"),
    )



# shared by q48/q49: deterministic probe rows inside the event-time window
_PROBES_CTE = """
    probes AS (
      SELECT o_orderkey AS probe_id, (o_custkey % 150) AS k,
             TIMESTAMP '2024-01-01'
               + (o_orderkey % 43200) * INTERVAL 1 MINUTE AS t
      FROM orders)"""


def _probes(spark, sf_dir):
    return _t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("probe_id"),
        (F.col("o_custkey") % 150).alias("k"),
        F.timestamp_add(
            "MINUTE",
            (F.col("o_orderkey") % 43200).cast("int"),
            F.lit("2024-01-01 00:00:00").cast("timestamp_ntz"),
        ).alias("t"),
    )


_Q48_SQL = """
    WITH {probes},
    e AS (SELECT user_id, ts, event_id, event_type, value FROM events)
    SELECT p.probe_id, p.k, cast(p.t AS VARCHAR) AS t,
           ev.event_id AS asof_event_id,
           ev.event_type AS asof_event_type,
           ev.value AS asof_value,
           cast(ev.ts AS VARCHAR) AS asof_ts
    FROM probes p LEFT JOIN LATERAL (
      SELECT * FROM e
      WHERE e.user_id = p.k AND e.ts <= p.t
      ORDER BY e.ts DESC, e.event_id DESC
      LIMIT 1) ev ON TRUE
""".format(probes=_PROBES_CTE)


# AS-OF JOIN (pandas merge_asof / kdb aj): latest event at or before each
# probe timestamp per key — the sort-merge union+window formulation (one
# shuffle, no range explosion; operators/temporal.py). Probe times are
# derived deterministically inside the event window; ties on (key, ts)
# break by max event_id in BOTH engines.
@query("q48_asof_join", _Q48_SQL)
def q48(spark, sf_dir):
    from georef_ar_etl_spark.operators.temporal import asof_join

    probes = _probes(spark, sf_dir)
    events = _t(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type", "value"
    )
    out = asof_join(
        probes, events,
        left_key="k", right_key="user_id",
        left_time="t", right_time="ts",
        right_cols=["event_id", "event_type", "value", "ts"],
        tie_col="event_id",
    )
    return out.select(
        "probe_id", "k",
        F.col("t").cast("string").alias("t"),
        F.col("asof_event_id"),
        F.col("asof_event_type"),
        F.col("asof_value"),
        F.col("asof_ts").cast("string").alias("asof_ts"),
    )


_Q49_SQL = """
    WITH {probes}
    SELECT p.probe_id, p.k, count(*) AS n_events,
           min(e.event_id) AS first_event_id,
           -- exact integer cents: per-element round then int64 sum is
           -- order-independent; a float sum's rounding could differ across
           -- engines/summation orders exactly on a .005 boundary
           -- (outer ::BIGINT: duckdb sum(BIGINT) returns HUGEINT, which
           -- pandas renders as float64 and the driver's hash rejects)
           sum(round(e.value * 100)::BIGINT)::BIGINT AS sum_value_c
    FROM probes p JOIN events e
      ON e.user_id = p.k AND e.ts >= p.t
     AND e.ts < p.t + INTERVAL 3600 SECONDS
    GROUP BY 1, 2
""".format(probes=_PROBES_CTE)


# RANGE (interval) JOIN: events within [t, t+1h) per probe, via the
# band-join bucketing technique (operators/temporal.py) — equi join on
# (key, window-sized time bucket) over each probe's two candidate buckets
# + exact refine, instead of the theta-join explosion Spark would plan.
@query("q49_range_join_window_agg", _Q49_SQL)
def q49(spark, sf_dir):
    from georef_ar_etl_spark.operators.temporal import range_join_bucketed

    probes = _probes(spark, sf_dir)
    events = _t(spark, sf_dir, "events").select("user_id", "ts", "event_id", "value")
    j = range_join_bucketed(
        probes, events, "k", "user_id", "t", "ts", window_seconds=3600
    )
    return j.groupBy("probe_id", "k").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("event_id").alias("first_event_id"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("sum_value_c"),
    )


_Q50_SQL = """
    SELECT (floor(epoch(ts))::BIGINT // 3600) * 3600 AS bucket_s,
           event_type,
           count(*) AS n,
           -- exact integer cents, order-independent (see q49); outer
           -- ::BIGINT guards the duckdb sum->HUGEINT->float64 artifact
           sum(round(value * 100)::BIGINT)::BIGINT AS sum_c,
           min(round(value * 100)::BIGINT) AS min_c,
           max(round(value * 100)::BIGINT) AS max_c
    FROM events
    GROUP BY 1, 2
"""


# HYPERTABLE ROLLUP CHAIN (timescale continuous-aggregate pattern): the
# minute rollup aggregates raw events ONCE; the hour rollup re-aggregates
# the minute PARTIALS (counts sum, sums sum, mins min, maxs max) and never
# touches raw data. The oracle computes the hour aggregate directly from
# the events — equality proves the chain re-aggregates losslessly.
@query("q50_hypertable_rollup", _Q50_SQL)
def q50(spark, sf_dir):
    from georef_ar_etl_spark.operators.temporal import rollup, rollup_coarser

    events = _t(spark, sf_dir, "events").withColumn(
        "value_c", F.round(F.col("value") * 100).cast("long")
    )
    minute = rollup(events, "ts", ["event_type"], "value_c", bucket_seconds=60)
    hour = rollup_coarser(
        minute, ["event_type"], bucket_seconds=3600, fine_seconds=60
    )
    # everything stays in exact integer cents through the chain
    return hour.select(
        "bucket_s", "event_type", "n",
        F.col("sum_v").alias("sum_c"),
        F.col("min_v").alias("min_c"),
        F.col("max_v").alias("max_c"),
    )


def _q51_sql(depth: int = 4, width: int = 512, seed: int = 11) -> str:
    """Count-Min oracle: identical md5+affine row hashes (constants from
    the same seeded generator), counters compared cell by cell."""
    from georef_ar_etl_spark.operators.doc_dedup import minhash_affine_params

    A, B = minhash_affine_params(depth, seed=seed)
    P = (1 << 31) - 1
    rows = " UNION ALL ".join(
        f"SELECT {j} AS j, ((hv * {int(A[j])} + {int(B[j])}) % {P}) % {width} AS bucket FROM h"
        for j in range(depth)
    )
    return rf"""
    WITH toks AS (SELECT unnest(string_split_regex(lower(text), '\s+')) AS w
                  FROM documents),
    t AS (SELECT w FROM toks WHERE w <> ''),
    h AS (SELECT (('0x' || substr(md5(w), 1, 8))::UBIGINT % {P})::BIGINT AS hv
          FROM t),
    cells AS ({rows})
    SELECT j, bucket, count(*) AS cnt FROM cells GROUP BY 1, 2
    """


# COUNT-MIN SKETCH (Cormode-Muthukrishnan): fixed-size mergeable frequency
# sketch over all word occurrences — the constant-memory alternative to a
# vocabulary-sized exact count at stream/corpus scale. Deterministic seeded
# hashing makes the sketch itself oracle-verifiable cell by cell.
@query("q51_count_min_sketch", _q51_sql())
def q51(spark, sf_dir):
    from georef_ar_etl_spark.operators import sketches

    toks = (
        _t(spark, sf_dir, "documents")
        .select(F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("w"))
        .filter(F.col("w") != "")
    )
    return sketches.count_min_sketch(toks, "w", depth=4, width=512, seed=11)


_Q52_SQL = r"""
    WITH toks AS (SELECT doc_id,
                         unnest(string_split_regex(lower(text), '\s+')) AS tok
                  FROM documents),
    t AS (SELECT doc_id, tok FROM toks WHERE tok <> ''),
    v AS (SELECT tok, count(*) AS c FROM t GROUP BY tok),
    tot AS (SELECT sum(c) AS N, count(*) AS V FROM v),
    sc AS (SELECT t.doc_id, avg(-ln((v.c + 1) / (tot.N + tot.V))) AS s
           FROM t JOIN v USING (tok) CROSS JOIN tot
           GROUP BY t.doc_id)
    SELECT d.doc_id, round(sc.s, 4) AS lm_score
    FROM documents d LEFT JOIN sc USING (doc_id)
"""


# unigram-LM quality proxy (the CCNet perplexity-filter shape, self-
# contained): mean -ln p(word) under an add-one-smoothed unigram model of
# the corpus itself — high scores flag rare-word-heavy/gibberish docs.
@query("q52_unigram_lm_score", _Q52_SQL)
def q52(spark, sf_dir):
    return text.unigram_lm_score(_t(spark, sf_dir, "documents"))


_Q53_SQL = """
    WITH o AS (SELECT user_id, ts, event_id, value,
                      lag(ts) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS prev
               FROM events),
    f AS (SELECT *, CASE WHEN prev IS NULL
                           OR floor(epoch(ts))::BIGINT
                              - floor(epoch(prev))::BIGINT > 1800
                         THEN 1 ELSE 0 END AS ns
          FROM o),
    s AS (SELECT *, (sum(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND CURRENT ROW) - 1)::INT AS session_idx
          FROM f)
    SELECT user_id, session_idx, count(*) AS n_events,
           cast(min(ts) AS VARCHAR) AS start_ts,
           cast(max(ts) AS VARCHAR) AS end_ts,
           sum(round(value * 100)::BIGINT)::BIGINT AS sum_value_c
    FROM s GROUP BY 1, 2
"""


# gap-based SESSIONIZATION (30 min inactivity -> new session): the
# standard lag + running-boundary-sum window pair
# (operators/temporal.py::sessionize), tie-broken by event_id for exact
# cross-engine parity; per-session aggregates in exact integer cents.
@query("q53_sessionize", _Q53_SQL)
def q53(spark, sf_dir):
    from georef_ar_etl_spark.operators.temporal import sessionize

    ev = _t(spark, sf_dir, "events")
    s = sessionize(ev, "user_id", "ts", gap_seconds=1800, order_col="event_id")
    return s.groupBy("user_id", "session_idx").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").cast("string").alias("start_ts"),
        F.max("ts").cast("string").alias("end_ts"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("sum_value_c"),
    )


_Q54_SQL = """
    WITH e AS (SELECT vec_id % 8 AS grp,
                      unnest(embedding::DOUBLE[]) AS x,
                      unnest(generate_series(1, len(embedding))) AS pos
               FROM embeddings),
    a AS (SELECT grp, pos, round(avg(x) * 1000000)::BIGINT AS m
          FROM e GROUP BY 1, 2)
    SELECT grp, md5(array_to_string(list(m ORDER BY pos), ',')) AS centroid_fp,
           count(*) AS dim
    FROM a GROUP BY grp
"""


# per-group embedding centroid (mean pooling) via posexplode + per-position
# hash aggregate — the shuffle carries (group x dim) partials, never the
# vectors. Centroids projected as integer micro-units (double->string
# formatting differs across engines; exact ints do not).
@query("q54_embedding_mean_pool", _Q54_SQL)
def q54(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings").select(
        (F.col("vec_id") % 8).alias("grp"), "embedding"
    )
    pooled = similarity.mean_pool(emb, "grp")
    micro = F.transform(
        F.col("centroid"), lambda x: F.round(x * 1000000).cast("long")
    )
    return pooled.select(
        "grp",
        _arr_fp(micro).alias("centroid_fp"),
        F.col("dim").cast("long").alias("dim"),
    )


_Q55_SQL = """
    WITH r AS (SELECT doc_id, source,
                      row_number() OVER (
                        PARTITION BY source
                        ORDER BY md5(doc_id::VARCHAR || 'groupsample'), doc_id
                      ) AS rk
               FROM documents)
    SELECT source, count(*) AS n_docs,
           md5(array_to_string(list_sort(list(doc_id)), ',')) AS docs_fp
    FROM r WHERE rk <= 10
    GROUP BY 1
"""


# exactly-k-per-group deterministic sampling (balanced per-source subsets):
# k smallest salted hashes per group — completes the sampling family
# (fraction-based q32 splits, budget-based q47, count-based here).
@query("q55_per_group_sample", _Q55_SQL)
def q55(spark, sf_dir):
    from georef_ar_etl_spark.operators import corpus

    d = _t(spark, sf_dir, "documents").select("doc_id", "source")
    s = corpus.per_group_sample(d, k=10)
    return s.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.md5(
            F.array_join(F.sort_array(F.collect_list("doc_id")).cast("array<string>"), ",")
        ).alias("docs_fp"),
    )


_Q56_SQL = f"""
    WITH {_Q24_BASE_CTES},{_q24_state_ctes("", "TRUE")}
    SELECT source, ((n_tok // 2) * 2)::INT AS tok_bucket,
           count(*) AS n, sum(n_tok)::BIGINT AS sum_v,
           min(n_tok) AS min_v, max(n_tok) AS max_v
    FROM state
    GROUP BY 1, 2
"""


# CONTINUOUS AGGREGATE maintenance (timescale continuous-aggregate /
# materialized-view refresh): the per-(source, n_tok-bucket) rollup of the
# CDC table is bootstrapped once from epoch 0, then maintained epoch-by-
# epoch from engine.changes() — only the groups a change batch touches are
# recomputed, from bucket-aligned member lists (min/max make pure
# add/subtract impossible; see ContinuousAggregate). The oracle aggregates
# the FULL final replay state directly: equality proves incremental
# maintenance == batch recompute across inserts, updates, group moves and
# deletes.
@query("q56_continuous_aggregate", _Q56_SQL)
def q56(spark, sf_dir):
    from pyspark.sql import types as T

    from georef_ar_etl_spark.engine import CdcEngine
    from georef_ar_etl_spark.operators.index_maintenance import ContinuousAggregate

    initial, events = _q24_inputs(spark, sf_dir)
    root = _ephemeral_table_root("cdc_contagg_q56", sf_dir)
    eng = CdcEngine(spark, f"{root}/src", n_buckets=16)
    eng.bootstrap(initial)
    agg = ContinuousAggregate(
        spark, f"{root}/agg",
        group_exprs=lambda: [
            F.col("source"),
            (F.floor(F.col("n_tok") / 2) * 2).cast("int"),
        ],
        group_fields=[("source", T.StringType()), ("tok_bucket", T.IntegerType())],
        value_expr=lambda: F.col("n_tok"),
        value_type=T.IntegerType(),
        n_buckets=8,
    )
    agg.bootstrap(eng.state(epoch=0), source_epoch=0)
    for b in (0, 1, 2, 3):
        m = eng.apply_batch(events.filter(F.col("batch_id") == b), b)
        agg.refresh(eng.changes(agg.last_source_epoch, m["epoch"]), m["epoch"])
    return agg.aggregate()


def _q57_sql(depth: int = 4, width: int = 512, seed: int = 11) -> str:
    """Count-Min ESTIMATE oracle: the q51 sketch rebuilt in SQL, then each
    seeded query item hashed through the identical md5+affine cells and
    estimated as min over the d row counters (missing cell = 0). The query
    set is deterministic — every distinct corpus word whose md5 starts
    '00' (~1/256 of the vocabulary) plus one certainly-absent literal."""
    from georef_ar_etl_spark.operators.doc_dedup import minhash_affine_params

    A, B = minhash_affine_params(depth, seed=seed)
    P = (1 << 31) - 1
    sk_rows = " UNION ALL ".join(
        f"SELECT {j} AS j, ((hv * {int(A[j])} + {int(B[j])}) % {P}) % {width} AS bucket FROM h"
        for j in range(depth)
    )
    q_rows = " UNION ALL ".join(
        f"SELECT w, {j} AS j, ((hv * {int(A[j])} + {int(B[j])}) % {P}) % {width} AS bucket FROM qh"
        for j in range(depth)
    )
    return rf"""
    WITH toks AS (SELECT unnest(string_split_regex(lower(text), '\s+')) AS w
                  FROM documents),
    t AS (SELECT w FROM toks WHERE w <> ''),
    h AS (SELECT (('0x' || substr(md5(w), 1, 8))::UBIGINT % {P})::BIGINT AS hv
          FROM t),
    cells AS ({sk_rows}),
    sk AS (SELECT j, bucket, count(*) AS cnt FROM cells GROUP BY 1, 2),
    q AS (SELECT DISTINCT w FROM t WHERE substr(md5(w), 1, 2) = '00'
          UNION ALL SELECT 'notaword-xyz'),
    qh AS (SELECT w, (('0x' || substr(md5(w), 1, 8))::UBIGINT % {P})::BIGINT AS hv
           FROM q),
    qc AS ({q_rows})
    SELECT qc.w, min(coalesce(sk.cnt, 0))::BIGINT AS est
    FROM qc LEFT JOIN sk USING (j, bucket)
    GROUP BY qc.w
    """


# COUNT-MIN ESTIMATE (the lookup half users actually call): min over the
# d row counters per query item, sketch broadcast so the query side never
# shuffles. Oracle-exact because the seeded hash family is deterministic;
# the never-underestimates property is covered in tests/test_operators.py.
@query("q57_count_min_estimate", _q57_sql())
def q57(spark, sf_dir):
    from georef_ar_etl_spark.operators import sketches

    toks = (
        _t(spark, sf_dir, "documents")
        .select(F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("w"))
        .filter(F.col("w") != "")
    )
    sk = sketches.count_min_sketch(toks, "w", depth=4, width=512, seed=11)
    qry = (
        toks.filter(F.substring(F.md5(F.col("w")), 1, 2) == "00")
        .select("w")
        .distinct()
        .unionByName(spark.createDataFrame([("notaword-xyz",)], "w string"))
    )
    return sketches.cm_estimate(sk, qry, "w", depth=4, width=512, seed=11)


_Q58_SQL = """
    WITH {probes},
    e AS (SELECT user_id, ts, event_id, event_type, value FROM events)
    SELECT p.probe_id, p.k, cast(p.t AS VARCHAR) AS t,
           ev.event_id AS asof_event_id,
           ev.event_type AS asof_event_type,
           cast(ev.ts AS VARCHAR) AS asof_ts
    FROM probes p LEFT JOIN LATERAL (
      SELECT * FROM e
      WHERE e.user_id = p.k AND e.ts >= p.t
        AND e.ts <= p.t + INTERVAL 7200 SECONDS
      ORDER BY e.ts ASC, e.event_id ASC
      LIMIT 1) ev ON TRUE
""".format(probes=_PROBES_CTE)


# AS-OF JOIN, FORWARD direction with a tolerance bound (merge_asof
# direction='forward', tolerance=2h): earliest event at or after each
# probe, nulls when the nearest one is farther than the tolerance — the
# same one-shuffle union+window skeleton as q48, window frame reversed.
# Equal-time ties break to MIN event_id in both engines.
@query("q58_asof_join_forward_tolerance", _Q58_SQL)
def q58(spark, sf_dir):
    from georef_ar_etl_spark.operators.temporal import asof_join

    probes = _probes(spark, sf_dir)
    events = _t(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    out = asof_join(
        probes, events,
        left_key="k", right_key="user_id",
        left_time="t", right_time="ts",
        right_cols=["event_id", "event_type", "ts"],
        tie_col="event_id",
        direction="forward",
        tolerance=7200,
    )
    return out.select(
        "probe_id", "k",
        F.col("t").cast("string").alias("t"),
        F.col("asof_event_id"),
        F.col("asof_event_type"),
        F.col("asof_ts").cast("string").alias("asof_ts"),
    )


_Q59_SQL = """
    WITH {probes},
    e AS (SELECT user_id, ts, event_id, event_type FROM events)
    SELECT p.probe_id, p.k, cast(p.t AS VARCHAR) AS t,
           ev.event_id AS asof_event_id,
           cast(ev.ts AS VARCHAR) AS asof_ts
    FROM probes p LEFT JOIN LATERAL (
      SELECT * FROM e
      WHERE e.user_id = p.k
      -- exact integer-microsecond distance (a double epoch() could break
      -- ties differently than Spark's integer axis); equal distance ->
      -- smaller ts = the BACKWARD row (pandas nearest tie-break); within
      -- one instant, backward rows take MAX event_id, forward rows MIN
      ORDER BY abs(date_diff('microsecond', p.t, e.ts)) ASC, e.ts ASC,
               CASE WHEN e.ts <= p.t THEN -e.event_id ELSE e.event_id END ASC
      LIMIT 1) ev ON TRUE
""".format(probes=_PROBES_CTE)


# AS-OF JOIN, NEAREST direction (merge_asof direction='nearest'): the
# closer of the backward/forward candidates per probe, exact-tie
# distances preferring backward — one shuffle, two within-partition
# sorts, never a pair explosion. Cross-checked row-for-row against
# pandas.merge_asof in tests/test_operators.py.
@query("q59_asof_join_nearest", _Q59_SQL)
def q59(spark, sf_dir):
    from georef_ar_etl_spark.operators.temporal import asof_join

    probes = _probes(spark, sf_dir)
    events = _t(spark, sf_dir, "events").select("user_id", "ts", "event_id")
    out = asof_join(
        probes, events,
        left_key="k", right_key="user_id",
        left_time="t", right_time="ts",
        right_cols=["event_id", "ts"],
        tie_col="event_id",
        direction="nearest",
    )
    return out.select(
        "probe_id", "k",
        F.col("t").cast("string").alias("t"),
        F.col("asof_event_id"),
        F.col("asof_ts").cast("string").alias("asof_ts"),
    )


_Q60_TOKENS_NULL = "(event_id % 5 = 0 AND event_id % 2 = 1)"
_Q60_SOURCE_NULL = "(event_id % 5 = 0 AND event_id % 3 = 0)"

_Q60_SQL = f"""
    WITH init AS (
      SELECT lpad(doc_id::varchar, 13, '0') AS doc_id,
             [(doc_id % 89 + 1)::INT, 0, (n_chars % 97 + 1)::INT,
              ((doc_id * 7) % 83 + 1)::INT] AS tokens,
             4 AS n_tok, source
      FROM documents),
    ev AS (
      SELECT (event_id % 4)::bigint AS batch_id, event_id::bigint AS seq,
             CASE WHEN event_id % 97 = 0 THEN 'upsert'
                  WHEN event_id % 5 = 0 THEN 'patch'
                  WHEN event_type = 'error' THEN 'delete'
                  WHEN event_type = 'signup' THEN 'insert'
                  ELSE 'update' END AS op,
             CASE WHEN event_id % 89 = 0
                    THEN substr(lpad((event_id % 600)::varchar, 13, '0'), 1, 5)
                  ELSE lpad((event_id % 600)::varchar, 13, '0') END AS doc_id,
             CASE WHEN {_Q60_TOKENS_NULL} THEN NULL
                  ELSE {_Q24_TOKENS_SQL} END AS tokens,
             (event_id % 7)::INT AS n_tok,
             CASE WHEN {_Q60_SOURCE_NULL} THEN NULL
                  ELSE event_type END AS source
      FROM events),
    valid AS (
      SELECT * FROM ev
      WHERE op IN ('insert', 'update', 'delete', 'patch')
        AND doc_id IS NOT NULL AND length(doc_id) = 13
        AND (op = 'delete'
             OR (op = 'patch' AND tokens IS NULL)
             OR (tokens IS NOT NULL AND len(tokens) > 0
                 AND len(list_filter(tokens, x -> x IS NULL)) = 0
                 AND len(list_filter(tokens, x -> x > 0)) > 0))),
    lastfull AS (
      SELECT * FROM (
        SELECT *, row_number() OVER (PARTITION BY doc_id
                                     ORDER BY batch_id DESC, seq DESC) AS rn
        FROM valid WHERE op <> 'patch') WHERE rn = 1),
    livep AS (
      -- live patches: strictly after the key's last full event in
      -- (batch_id, seq) replay order, or keys with no full event at all
      SELECT p.* FROM valid p LEFT JOIN lastfull f ON p.doc_id = f.doc_id
      WHERE p.op = 'patch'
        AND (f.doc_id IS NULL OR (p.batch_id, p.seq) > (f.batch_id, f.seq))),
    fold AS (
      -- per-column last-non-null overlay (the partial-image rule)
      SELECT doc_id,
             arg_max(tokens, batch_id * 1000000000 + seq)
               FILTER (WHERE tokens IS NOT NULL) AS tok_p,
             arg_max(source, batch_id * 1000000000 + seq)
               FILTER (WHERE source IS NOT NULL) AS src_p
      FROM livep GROUP BY doc_id),
    eff AS (
      SELECT f.doc_id, coalesce(p.tok_p, f.tokens) AS tokens,
             coalesce(p.src_p, f.source) AS source
      FROM lastfull f LEFT JOIN fold p ON f.doc_id = p.doc_id
      WHERE f.op <> 'delete'
      UNION ALL
      SELECT i.doc_id, coalesce(p.tok_p, i.tokens),
             coalesce(p.src_p, i.source)
      FROM init i LEFT JOIN fold p ON i.doc_id = p.doc_id
      WHERE NOT EXISTS (SELECT 1 FROM lastfull l WHERE l.doc_id = i.doc_id)),
    state AS (
      SELECT doc_id, nn[1:lastnz::int] AS tokens, lastnz::int AS n_tok, source
      FROM (
        SELECT doc_id, nn,
               coalesce(list_max(list_transform(
                   generate_series(1, greatest(len(nn), 1)),
                   i -> CASE WHEN nn[i::int] <> 0 THEN i ELSE 0 END)), 0) AS lastnz,
               source
        FROM (SELECT doc_id, list_filter(tokens, x -> x >= 0) AS nn, source
              FROM eff)))
    SELECT doc_id, md5(array_to_string(tokens, ',')) AS tokens_fp, n_tok, source
    FROM state
"""


def _q60_inputs(spark, sf_dir):
    """Spark twins of the q60 oracle's ``init``/``ev`` CTEs — the q24 log
    with every 5th event turned into a partial-column ``op='patch'``
    (tokens withheld on odd ids, source withheld on ids % 3 = 0, so the
    log exercises tokens-only, source-only, both-set and both-null
    patches, plus patches of bad ids and invalid token payloads)."""
    initial, _ = _q24_inputs(spark, sf_dir)
    e = _t(spark, sf_dir, "events")
    eid, uid = F.col("event_id"), F.col("user_id")
    base = [
        ((eid % 97) - 3).cast("int"),
        (uid % 50).cast("int"),
        ((eid % 41) + 1).cast("int"),
    ]
    q24_tokens = (
        F.when(eid % 53 == 0, F.array().cast("array<int>"))
        .when(eid % 61 == 0, F.array(F.lit(1), F.lit(None).cast("int"), F.lit(2)))
        .when(eid % 59 == 0, F.array(F.lit(-5), F.lit(0), F.lit(0)))
        .when(eid % 3 == 0, F.array(*base, F.lit(0), F.lit(0)))
        .otherwise(F.array(*base))
    )
    doc_id = F.lpad((eid % 600).cast("string"), 13, "0")
    events = e.select(
        (eid % 4).cast("long").alias("batch_id"),
        eid.cast("long").alias("seq"),
        F.when(eid % 97 == 0, "upsert")
        .when(eid % 5 == 0, "patch")
        .when(F.col("event_type") == "error", "delete")
        .when(F.col("event_type") == "signup", "insert")
        .otherwise("update")
        .alias("op"),
        F.when(eid % 89 == 0, F.substring(doc_id, 1, 5)).otherwise(doc_id).alias("doc_id"),
        F.when(
            (eid % 5 == 0) & (eid % 2 == 1), F.lit(None).cast("array<int>")
        ).otherwise(q24_tokens).alias("tokens"),
        (eid % 7).cast("int").alias("n_tok"),
        F.when(
            (eid % 5 == 0) & (eid % 3 == 0), F.lit(None).cast("string")
        ).otherwise(F.col("event_type")).alias("source"),
    )
    return initial, events


# CDC REPLAY WITH PARTIAL-COLUMN UPDATES (op='patch', Debezium
# partial-image style: null payload column = keep the current value). The
# engine folds each batch to one effective event per key (full events LWW;
# later patches overlay per column, operators/merge.py fold_patch_events /
# the pandas twin inside the SPJ merge), then resolves patches against the
# bucket's live row — read-modify-write that still WRITES a merge-on-read
# delta. The oracle expresses the same algebra globally: last valid full
# event per key, live patches folded per column by last-non-null in
# (batch_id, seq) order, overlay, then normalize. Reference analogue:
# per-field UPDATE patches, georef_ar_etl/patch.py update_field.
@query("q60_cdc_patch_replay_state", _Q60_SQL)
def q60(spark, sf_dir):
    from georef_ar_etl_spark.engine import CdcEngine

    initial, events = _q60_inputs(spark, sf_dir)
    root = _ephemeral_table_root("cdc_patch_q60", sf_dir)
    eng = CdcEngine(spark, root, n_buckets=16)
    eng.bootstrap(initial)
    eng.replay(events, batch_ids=[0, 1, 2, 3])
    return eng.state().select(
        "doc_id",
        _arr_fp(F.col("tokens")).alias("tokens_fp"),
        "n_tok",
        "source",
    )


def _bloom_cells_sql(src: str, hv: str, n_bits: int, k: int, seed: int) -> str:
    """k UNION ALL rows per input row: the Bloom bit positions, exactly the
    md5+affine formula of operators/sketches.py (the q57 pattern)."""
    from georef_ar_etl_spark.operators.doc_dedup import minhash_affine_params

    A, B = minhash_affine_params(k, seed=seed)
    P = (1 << 31) - 1
    return " UNION ALL ".join(
        f"SELECT *, (({hv} * {int(A[j])} + {int(B[j])}) % {P}) % {n_bits} AS bit"
        f" FROM {src}"
        for j in range(k)
    )


def _q61_sql(n_bits: int = 8192, k: int = 4, seed: int = 17) -> str:
    cells = _bloom_cells_sql("h", "hv", n_bits, k, seed)
    return rf"""
    WITH toks AS (SELECT unnest(string_split_regex(lower(text), '\s+')) AS w
                  FROM documents),
    t AS (SELECT DISTINCT w FROM toks WHERE w <> ''),
    h AS (SELECT (('0x' || substr(md5(w), 1, 8))::UBIGINT % {(1 << 31) - 1})::BIGINT AS hv
          FROM t),
    cells AS ({cells}),
    bits AS (SELECT DISTINCT bit FROM cells)
    SELECT count(*)::BIGINT AS n_set,
           md5(string_agg(bit::varchar, ',' ORDER BY bit)) AS bits_fp
    FROM bits
    """


# BLOOM FILTER BUILD (corpus vocabulary membership in constant memory):
# every distinct corpus word sets k md5+affine bits; the bit set — at most
# n_bits rows from any input size — is the mergeable (union+distinct)
# membership summary. Verified bit-for-bit against the oracle, not
# statistically (the q51/q57 sketch pattern).
@query("q61_bloom_build", _q61_sql())
def q61(spark, sf_dir):
    from georef_ar_etl_spark.operators import sketches

    toks = (
        _t(spark, sf_dir, "documents")
        .select(F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("w"))
        .filter(F.col("w") != "")
        .distinct()
    )
    bits = sketches.bloom_bits(toks, "w", n_bits=8192, k=4, seed=17)
    return bits.agg(
        F.count(F.lit(1)).alias("n_set"),
        F.md5(
            F.array_join(F.sort_array(F.collect_list("bit")).cast("array<string>"), ",")
        ).alias("bits_fp"),
    )


def _q62_sql(n_bits: int = 8192, k: int = 4, seed: int = 17) -> str:
    P = (1 << 31) - 1
    dim_cells = _bloom_cells_sql("h", "hv", n_bits, k, seed)
    probe_cells = _bloom_cells_sql("oh", "hv", n_bits, k, seed)
    return f"""
    WITH dim AS (SELECT c_custkey::varchar AS key FROM customer
                 WHERE c_acctbal > 9000),
    h AS (SELECT key,
                 (('0x' || substr(md5(key), 1, 8))::UBIGINT % {P})::BIGINT AS hv
          FROM dim),
    cells AS ({dim_cells}),
    bits AS (SELECT DISTINCT bit FROM cells),
    oh AS (SELECT o_orderkey, o_custkey, o_orderstatus,
                  (('0x' || substr(md5(o_custkey::varchar), 1, 8))::UBIGINT
                   % {P})::BIGINT AS hv
           FROM orders),
    ocells AS ({probe_cells}),
    pass AS (
      -- an order passes iff ALL k of its bits are set (each ocell row
      -- matches at most one bits row — bits are distinct)
      SELECT o_orderkey, any_value(o_custkey) AS o_custkey,
             any_value(o_orderstatus) AS o_orderstatus
      FROM ocells oc LEFT JOIN bits b USING (bit)
      GROUP BY o_orderkey
      HAVING count(b.bit) = {k})
    SELECT p.o_orderstatus, count(*)::BIGINT AS n_pass,
           count(d.key)::BIGINT AS n_true
    FROM pass p LEFT JOIN dim d ON d.key = p.o_custkey::varchar
    GROUP BY 1
    """


# BLOOM RUNTIME FILTER (broadcast semi-join pushdown): the high-balance
# customer subset compresses to an 8 KiB bit set that rides the fact-side
# scan as a pure-Catalyst literal predicate — orders drop BEFORE any
# shuffle, no join for the filter itself (the generalized form of Spark's
# runtime bloom filter / DPP). n_true vs n_pass exposes the exact
# false-positive count, deterministically reproduced by the oracle.
@query("q62_bloom_runtime_filter", _q62_sql())
def q62(spark, sf_dir):
    from georef_ar_etl_spark.operators import sketches

    cust = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9000)
        .select(F.col("c_custkey").cast("string").alias("key"))
    )
    bits = sketches.bloom_bits(cust, "key", n_bits=8192, k=4, seed=17)
    bs = sketches.bloom_words(bits, n_bits=8192)
    orders = _t(spark, sf_dir, "orders")
    passed = orders.filter(
        sketches.bloom_might_contain(
            F.col("o_custkey").cast("string"), bs, n_bits=8192, k=4, seed=17
        )
    ).select("o_custkey", "o_orderstatus")
    return (
        passed.join(
            F.broadcast(cust),
            passed["o_custkey"].cast("string") == cust["key"],
            "left",
        )
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_pass"),
            F.count("key").alias("n_true"),
        )
    )


# ------------------------- q63: MOR POINT LOOKUP (bloom delta skipping) ---
# The q24 replay re-run on merge-on-read defaults (every batch small enough
# to append a delta, chain cap high enough that no inline compaction clears
# it), followed by SnapshotTable.lookup_keys on a fixed 42-key probe list:
# bucket pruning -> per-delta bloom-sidecar skipping -> key predicate pushed
# into the row-group-pruned reads (sinks/snapshot_table.py::lookup_keys).
# The oracle is the q24 state algebra filtered to the same keys — a lookup
# that skipped a chain link it needed (a bloom false negative) or resolved
# LWW out of order would return a stale/ghost row and hash-red here.
# Reference analogue: the reference reads individual synced rows through
# SQLAlchemy query-by-pk against the loaded tables (georef_ar_etl/models.py
# entity classes; process checks in georef_ar_etl/processes.py) — a point
# lookup on the state table, served there by Postgres' pk index.
_Q63_KEYS = [f"{(k * 37) % 600:013d}" for k in range(40)] + [
    "9999999999999", "nope-absent-1"
]
_Q63_KEYLIST_SQL = ",".join(f"'{k}'" for k in _Q63_KEYS)

_Q63_SQL = f"""
    WITH {_Q24_BASE_CTES},{_q24_state_ctes("", "TRUE")}
    SELECT doc_id, md5(array_to_string(tokens, ',')) AS tokens_fp, n_tok, source
    FROM state WHERE doc_id IN ({_Q63_KEYLIST_SQL})
"""


@query("q63_mor_point_lookup", _Q63_SQL)
def q63(spark, sf_dir):
    from georef_ar_etl_spark.engine import CdcEngine

    initial, events = _q24_inputs(spark, sf_dir)
    root = _ephemeral_table_root("cdc_lookup_q63", sf_dir)
    eng = CdcEngine(
        spark, root, n_buckets=16, mor_rewrite_ratio=1.0, mor_max_deltas=8
    )
    eng.bootstrap(initial)
    eng.replay(events, batch_ids=[0, 1, 2, 3])
    return eng.table.lookup_keys(_Q63_KEYS).select(
        "doc_id",
        _arr_fp(F.col("tokens")).alias("tokens_fp"),
        "n_tok",
        "source",
    )


# --------------------------- q64: TF-IDF (keyword/relevance featurizer) ---
# Two word-count-shaped aggregates + a term join (operators/text.py::tf_idf,
# smooth sklearn idf). The probe subset (doc_id % 17) bounds the verified
# rows; df/N are computed over the FULL corpus on both sides. Reference
# analogue: none (the reference has no text scoring) — this is a training-
# data-pipeline op the north rule's token workload needs.
_Q64_SQL = r"""
    WITH toks AS (
      SELECT doc_id,
             unnest(list_filter(string_split_regex(lower(text), '\s+'),
                                x -> x <> '')) AS term
      FROM documents),
    tf AS (
      SELECT doc_id, term, count(*)::BIGINT AS tf FROM toks GROUP BY 1, 2),
    dfreq AS (
      SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY 1),
    n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents)
    SELECT t.doc_id, t.term, t.tf, d.df,
           t.tf * (ln((n.n_docs + 1) / (d.df + 1)) + 1) AS tfidf
    FROM tf t JOIN dfreq d USING (term) CROSS JOIN n
    WHERE t.doc_id % 17 = 0
"""


@query("q64_tf_idf", _Q64_SQL)
def q64(spark, sf_dir):
    out = text.tf_idf(_t(spark, sf_dir, "documents"))
    return out.filter(F.col("doc_id") % 17 == 0)


# ------------------- q65: ROLLUP / grouping-sets aggregation surface ------
# Multi-level summary in ONE pass — Spark expands the grouping sets before
# the hash aggregate (still map-side combinable), vs the naive N separate
# GROUP BYs that would each rescan the fact table. grouping_id disambiguates
# a real NULL group value from a rollup subtotal row. Reference analogue:
# per-level report counts (georef_ar_etl/utils.py report tallies), computed
# there with one query per level.
_Q65_SQL = """
    SELECT o_orderstatus, o_orderpriority,
           GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS gid,
           count(*) AS n_orders,
           -- exact decimal sum -> round -> double: a raw double sum is
           -- summation-order-dependent and flips last digits per plan
           cast(round(sum(cast(o_totalprice AS decimal(18,2))), 2) AS double)
             AS sum_price
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
"""


@query("q65_rollup_grouping_sets", _Q65_SQL)
def q65(spark, sf_dir):
    return (
        _t(spark, sf_dir, "orders")
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping_id().alias("gid"),
            F.count(F.lit(1)).alias("n_orders"),
            _money(F.col("o_totalprice")).alias("sum_price"),
        )
        .select("o_orderstatus", "o_orderpriority", "gid", "n_orders", "sum_price")
    )


# ----------------------- q66: moving-window aggregate (ROWS frame) --------
# Per-user trailing-10-event running sum/count — the sliding feature-window
# shape (sessionless behavioral features). ONE shuffle on user_id, sort
# within partition; the frame walks each partition linearly. Values go
# through floor()::BIGINT so the windowed sum is exact integer arithmetic
# on both engines (a double running sum is implementation-ordered).
_Q66_SQL = """
    WITH e AS (
      SELECT user_id, event_id,
             CAST(FLOOR(value) AS BIGINT) AS v,
             ts
      FROM events WHERE user_id % 37 = 0)
    SELECT user_id, event_id,
           (sum(v) OVER w)::BIGINT AS mov_sum,
           count(*) OVER w AS mov_n,
           min(v) OVER w AS mov_min
    FROM e
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)
"""


@query("q66_moving_window", _Q66_SQL)
def q66(spark, sf_dir):
    e = (
        _t(spark, sf_dir, "events")
        .filter(F.col("user_id") % 37 == 0)
        .select(
            "user_id", "event_id",
            F.floor("value").cast("long").alias("v"), "ts",
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-9, Window.currentRow)
    )
    return e.select(
        "user_id", "event_id",
        F.sum("v").over(w).alias("mov_sum"),
        F.count(F.lit(1)).over(w).alias("mov_n"),
        F.min("v").over(w).alias("mov_min"),
    )


# -------------------- q67: grouped numeric profile (exact quantiles) ------
# Count/min/max/exact-quantile summary per group (operators/sketches.py::
# group_numeric_profile) — the profiling pass a data-quality gate runs over
# every numeric measure. The oracle pins Spark's sorted-order linear
# interpolation against DuckDB quantile_cont (verified bit-identical); the
# shipping scale path is the exact=False percentile_approx variant (fixed-
# memory mergeable sketch), A/B'd against this exact twin in pytest.
_Q67_SQL = """
    SELECT event_type,
           count(*) AS n,
           min(value) AS min_v,
           max(value) AS max_v,
           quantile_cont(value, [0.25, 0.5, 0.75, 0.99]) AS quantiles
    FROM events GROUP BY event_type
"""


@query("q67_group_quantile_profile", _Q67_SQL)
def q67(spark, sf_dir):
    from georef_ar_etl_spark.operators.sketches import group_numeric_profile

    return group_numeric_profile(
        _t(spark, sf_dir, "events"), "event_type", "value"
    )


# ---------------- q68: shipping-priority multi-join (TPC-H Q3 shape) ------
# customer ⋈ orders ⋈ lineitem with selective filters on both fact sides —
# the canonical Catalyst join-reorder / filter-pushdown exercise: both date
# predicates reach the parquet scans (PushedFilters), the customer side
# shrinks before the join, and the final agg is map-side combinable. At
# 100 TB this is two co-keyed shuffles (orderkey) after a pre-filtered
# custkey join; revenue sums stay in whole-stage codegen.
_Q68_SQL = """
    SELECT l.l_orderkey,
           cast(round(sum(cast(l.l_extendedprice * (1 - l.l_discount)
                               AS decimal(18,6))), 2) AS double) AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
                    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < DATE '1995-03-15'
      AND l.l_shipdate > DATE '1995-03-15'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
"""


@query("q68_shipping_priority", _Q68_SQL)
def q68(spark, sf_dir):
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < F.lit("1995-03-15").cast("date"))
    l = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > F.lit("1995-03-15").cast("date"))
    return (
        c.join(o, c["c_custkey"] == o["o_custkey"])
        .join(l, l["l_orderkey"] == o["o_orderkey"])
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            # exact decimal sum of the per-row double product: the product
            # rounds identically per row on both engines (IEEE), the sum
            # is then order-insensitive under any partitioning
            F.round(
                F.sum(
                    (F.col("l_extendedprice") * (1 - F.col("l_discount")))
                    .cast("decimal(18,6)")
                ),
                2,
            ).cast("double").alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
    )


# -------------- q69: local-supplier volume (TPC-H Q5 shape, dims bcast) ---
# Five-way join where nation/region are BROADCAST dims (the small sides a
# 1000-executor plan must never shuffle) and the customer-nation = supplier-
# nation equality is an extra join predicate, not a post-filter. The fact-
# side shuffles key on orderkey; everything else rides broadcasts.
_Q69_SQL = """
    SELECT n.n_name,
           cast(round(sum(cast(l.l_extendedprice * (1 - l.l_discount)
                               AS decimal(18,6))), 2) AS double) AS revenue
    FROM customer c
      JOIN orders o ON c.c_custkey = o.o_custkey
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
                     AND c.c_nationkey = s.s_nationkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA' AND o.o_orderdate >= DATE '1994-01-01'
      AND o.o_orderdate < DATE '1995-01-01'
    GROUP BY n.n_name
"""


@query("q69_local_supplier_volume", _Q69_SQL)
def q69(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1994-01-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1995-01-01").cast("date"))
    )
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = F.broadcast(_t(spark, sf_dir, "nation"))
    r = F.broadcast(
        _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    )
    return (
        c.join(o, c["c_custkey"] == o["o_custkey"])
        .join(l, l["l_orderkey"] == o["o_orderkey"])
        .join(
            s,
            (l["l_suppkey"] == s["s_suppkey"])
            & (c["c_nationkey"] == s["s_nationkey"]),
        )
        .join(n, s["s_nationkey"] == n["n_nationkey"])
        .join(r, n["n_regionkey"] == r["r_regionkey"])
        .groupBy("n_name")
        .agg(
            # exact decimal sum of the per-row double product: the product
            # rounds identically per row on both engines (IEEE), the sum
            # is then order-insensitive under any partitioning
            F.round(
                F.sum(
                    (F.col("l_extendedprice") * (1 - F.col("l_discount")))
                    .cast("decimal(18,6)")
                ),
                2,
            ).cast("double").alias("revenue")
        )
    )

# -------------------- q70: corpus-wide line-level exact dedup (C4) --------
# Every duplicate line keeps its minimum-(doc_id, line_no) occurrence and
# documents are reassembled from surviving lines (operators/text.py::
# to_lines + line_dedup) — the boilerplate-removal pass of C4 (Raffel et
# al. 2020 §2.2). This corpus has no natural newlines, so lines are derived
# as fixed 8-word chunks IDENTICALLY on both sides. Spark avoids the
# row_number-over-line hot key with a map-side-combinable min(struct)
# winner aggregate; the oracle's window formulation is semantically equal.
_Q70_SQL = r"""
    WITH w AS (
      SELECT doc_id,
             list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS words
      FROM documents),
    lines AS (
      SELECT doc_id, CAST(t.i AS INTEGER) AS line_no,
             array_to_string(words[(t.i*8+1):(t.i*8+8)], ' ') AS line
      FROM w, UNNEST(range(CAST(ceil(len(words)/8.0) AS BIGINT))) AS t(i)
      WHERE len(words) > 0),
    keep AS (
      SELECT doc_id, line_no, line,
             row_number() OVER (PARTITION BY line ORDER BY doc_id, line_no) AS rn
      FROM lines)
    SELECT doc_id,
           md5(string_agg(line, chr(10) ORDER BY line_no)) AS text_fp,
           count(*)::BIGINT AS n_lines
    FROM keep WHERE rn = 1
    GROUP BY doc_id
"""


@query("q70_line_dedup", _Q70_SQL)
def q70(spark, sf_dir):
    lines = text.to_lines(_t(spark, sf_dir, "documents"), words_per_line=8)
    out = text.line_dedup(lines)
    return out.select(
        "doc_id", F.md5(F.col("text")).alias("text_fp"), "n_lines"
    )

# ----------------- q71: JSON schema-on-read (VARIANT, malformed-safe) -----
# events.props is a raw JSON string column — the semi-structured sidecar
# every event stream carries. Parsed with Spark 4's try_parse_json →
# VARIANT (single pass, codegen, no shuffle until the agg), field k
# extracted with try_variant_get; malformed payloads and missing keys are
# COUNTED rather than crashing the job, pinned by three injected edge rows
# on both sides (malformed JSON / wrong key / NULL). DuckDB's
# try_cast(AS JSON) is semantics-identical (probed: malformed→NULL,
# missing key→non-NULL with NULL field). Reference analogue: the JSON API
# envelope ingest (georef_ar_etl/utils.py download + json.load path),
# where a malformed body aborts the run — here it degrades to a metric.
_Q71_SQL = """
    WITH e AS (
      SELECT event_type, props FROM events
      UNION ALL
      SELECT * FROM (VALUES ('error', '{not json'),
                            ('error', '{"other": 1}'),
                            ('error', NULL)) t(event_type, props)),
    p AS (SELECT event_type, props, try_cast(props AS JSON) AS j FROM e),
    x AS (SELECT event_type, props, j, CAST(j->>'k' AS INTEGER) AS k FROM p)
    SELECT event_type, count(*)::BIGINT AS n, sum(k)::BIGINT AS sum_k,
           min(k) AS min_k, max(k) AS max_k,
           (count(*) FILTER (props IS NOT NULL AND j IS NULL))::BIGINT
             AS n_malformed,
           (count(*) FILTER (j IS NOT NULL AND k IS NULL))::BIGINT
             AS n_missing_key
    FROM x GROUP BY event_type
"""


@query("q71_json_schema_on_read", _Q71_SQL)
def q71(spark, sf_dir):
    e = _t(spark, sf_dir, "events").select("event_type", "props")
    edge = spark.createDataFrame(
        [("error", "{not json"), ("error", '{"other": 1}'), ("error", None)],
        "event_type string, props string",
    )
    v = F.try_parse_json("props")
    k = F.try_variant_get(v, "$.k", "int")
    return (
        e.unionByName(edge)
        .select(
            "event_type",
            v.isNull().alias("v_null"),
            k.alias("k"),
            F.col("props").isNotNull().alias("has_props"),
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").cast("long").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.count(
                F.when(F.col("has_props") & F.col("v_null"), 1)
            ).alias("n_malformed"),
            F.count(
                F.when(~F.col("v_null") & F.col("k").isNull(), 1)
            ).alias("n_missing_key"),
        )
    )

# --------------------------- q72: pivot / cross-tab (explicit values) -----
# Per-user event-type cross-tab. The pivot values are EXPLICIT — the
# two-pass .pivot(col) without values runs a distinct scan over the fact
# table first, which at 100 TB is a full extra pass; a curated value list
# makes the pivot a single map-side conditional aggregate. Missing
# combinations are coalesced to 0 to match SQL's FILTER-count semantics
# (Spark's pivot yields NULL there). Reference analogue: the per-entity
# per-category report tallies (georef_ar_etl/utils.py report counts).
_Q72_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]

_Q72_SQL = """
    SELECT user_id,
           (count(*) FILTER (event_type = 'click'))::BIGINT    AS click,
           (count(*) FILTER (event_type = 'error'))::BIGINT    AS error,
           (count(*) FILTER (event_type = 'purchase'))::BIGINT AS purchase,
           (count(*) FILTER (event_type = 'signup'))::BIGINT   AS signup,
           (count(*) FILTER (event_type = 'view'))::BIGINT     AS view,
           count(*)::BIGINT AS total
    FROM events WHERE user_id % 19 = 0
    GROUP BY user_id
"""


@query("q72_pivot_crosstab", _Q72_SQL)
def q72(spark, sf_dir):
    piv = (
        _t(spark, sf_dir, "events")
        .filter(F.col("user_id") % 19 == 0)
        .groupBy("user_id")
        .pivot("event_type", _Q72_EVENT_TYPES)
        .agg(F.count(F.lit(1)))
    )
    counts = [
        F.coalesce(F.col(t), F.lit(0)).alias(t) for t in _Q72_EVENT_TYPES
    ]
    total = sum(
        (F.coalesce(F.col(t), F.lit(0)) for t in _Q72_EVENT_TYPES),
        F.lit(0),
    ).alias("total")
    return piv.select("user_id", *counts, total)


# ------------------ q73: blocked fuzzy entity match (ER verify) -----------
# Entity resolution over a deterministically-dirtied probe set: every 53rd
# customer name gets a 1-edit corruption (matchable) and every 106th a
# 3-edit corruption (must be REJECTED by max_dist=2 — absent from the
# output). Blocking key = digits only (robust to the letter corruption),
# verify = levenshtein, best = min(dist, clean_id) per probe
# (operators/entity_match.py::blocked_fuzzy_match). Reference analogue:
# cleaned-name equality joins (georef_ar_etl/utils.py clean_string
# consumers) — this is the same match loosened to bounded edit distance.
_Q73_SQL = """
    WITH probe AS (
      SELECT c_custkey AS probe_id,
             CASE WHEN c_custkey % 106 = 0
                  THEN regexp_replace(c_name, '^Customer', 'XXXtomer')
                  ELSE regexp_replace(c_name, '^Customer', 'Kustomer')
             END AS pname
      FROM customer WHERE c_custkey % 53 = 0),
    pb AS (SELECT probe_id, pname,
                  regexp_replace(pname, '[^0-9]', '', 'g') AS blk
           FROM probe WHERE regexp_replace(pname, '[^0-9]', '', 'g') <> ''),
    cl AS (SELECT c_custkey AS clean_id, c_name,
                  regexp_replace(c_name, '[^0-9]', '', 'g') AS blk
           FROM customer
           WHERE regexp_replace(c_name, '[^0-9]', '', 'g') <> ''),
    cand AS (
      SELECT probe_id, clean_id,
             levenshtein(pname, c_name)::INTEGER AS dist
      FROM pb JOIN cl USING (blk)),
    ranked AS (
      SELECT probe_id, clean_id, dist,
             row_number() OVER (PARTITION BY probe_id
                                ORDER BY dist, clean_id) AS rn
      FROM cand WHERE dist <= 2)
    SELECT probe_id, clean_id, dist FROM ranked WHERE rn = 1
"""


@query("q73_blocked_fuzzy_match", _Q73_SQL)
def q73(spark, sf_dir):
    from georef_ar_etl_spark.operators.entity_match import blocked_fuzzy_match

    c = _t(spark, sf_dir, "customer")
    probe = c.filter(F.col("c_custkey") % 53 == 0).select(
        F.col("c_custkey").alias("probe_id"),
        F.when(
            F.col("c_custkey") % 106 == 0,
            F.regexp_replace("c_name", "^Customer", "XXXtomer"),
        )
        .otherwise(F.regexp_replace("c_name", "^Customer", "Kustomer"))
        .alias("pname"),
    )
    clean = c.select(F.col("c_custkey").alias("clean_id"), "c_name")
    return blocked_fuzzy_match(
        probe, clean,
        probe_id="probe_id", clean_id="clean_id",
        probe_name="pname", clean_name="c_name", max_dist=2,
    )

# ----------------------- q74: salted join under a manufactured hot key ----
# Half of all events are remapped onto ONE key (user_id -> 0 when even) —
# the adversarial distribution where a plain shuffle join puts 50% of the
# fact table in a single task. salted_join (operators/skew.py) spreads
# key 0 across 8 tasks; the oracle is the PLAIN join+agg, proving salting
# is result-invariant. The dim side is built from distinct keys so the
# query is self-contained and the dim is provably small (n_salt-fold
# replication is bounded).
_Q74_SQL = """
    WITH e AS (
      SELECT CASE WHEN user_id % 2 = 0 THEN 0 ELSE user_id END AS skey,
             CAST(FLOOR(value) AS BIGINT) AS v
      FROM events),
    dim AS (
      SELECT DISTINCT skey,
             CASE WHEN skey = 0 THEN 'hot' ELSE 'cold' END AS tier
      FROM e)
    SELECT tier, count(*)::BIGINT AS n, sum(v)::BIGINT AS sum_v
    FROM e JOIN dim USING (skey)
    GROUP BY tier
"""


@query("q74_salted_skew_join", _Q74_SQL)
def q74(spark, sf_dir):
    from georef_ar_etl_spark.operators.skew import salted_join

    e = _t(spark, sf_dir, "events").select(
        F.when(F.col("user_id") % 2 == 0, F.lit(0))
        .otherwise(F.col("user_id"))
        .alias("skey"),
        F.floor("value").cast("long").alias("v"),
    )
    dim = e.select("skey").distinct().select(
        "skey",
        F.when(F.col("skey") == 0, F.lit("hot"))
        .otherwise(F.lit("cold"))
        .alias("tier"),
    )
    return (
        salted_join(e, dim, on="skey", n_salt=8)
        .groupBy("tier")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("v").alias("sum_v"),
        )
    )


# ------------------- q75: OHLC resample (order-sensitive aggregate) -------
# Open/high/low/close per (event_type, hour) — the canonical time-series
# downsample. Open/close are ORDER-SENSITIVE; the scale-safe formulation
# is min/max over a (ts, event_id, value) struct — map-side combinable,
# deterministic under any partitioning (event_id breaks ts ties) — never
# a sort-within-group. Values go through floor()::BIGINT so high/low/sum
# are exact integer arithmetic on both engines.
_Q75_SQL = """
    WITH e AS (
      SELECT event_type, date_trunc('hour', ts) AS bucket_h, ts, event_id,
             CAST(FLOOR(value) AS BIGINT) AS v
      FROM events),
    ranked AS (
      SELECT event_type, bucket_h, v,
             row_number() OVER (PARTITION BY event_type, bucket_h
                                ORDER BY ts, event_id) AS rn_open,
             row_number() OVER (PARTITION BY event_type, bucket_h
                                ORDER BY ts DESC, event_id DESC) AS rn_close
      FROM e)
    SELECT event_type, bucket_h,
           min(CASE WHEN rn_open = 1 THEN v END) AS open,
           max(v) AS high, min(v) AS low,
           min(CASE WHEN rn_close = 1 THEN v END) AS close,
           count(*)::BIGINT AS n
    FROM ranked
    GROUP BY event_type, bucket_h
"""


@query("q75_ohlc_resample", _Q75_SQL)
def q75(spark, sf_dir):
    e = _t(spark, sf_dir, "events").select(
        "event_type",
        F.date_trunc("hour", F.col("ts")).alias("bucket_h"),
        "ts", "event_id",
        F.floor("value").cast("long").alias("v"),
    )
    first = F.min(F.struct("ts", "event_id", "v"))["v"].alias("open")
    last = F.max(F.struct("ts", "event_id", "v"))["v"].alias("close")
    return e.groupBy("event_type", "bucket_h").agg(
        first,
        F.max("v").alias("high"),
        F.min("v").alias("low"),
        last,
        F.count(F.lit(1)).alias("n"),
    ).select("event_type", "bucket_h", "open", "high", "low", "close", "n")


# --------------------------- q76: unpivot / melt (wide -> long) -----------
# lineitem's four numeric measures melted to (measure, value) rows — the
# inverse of q72's pivot and the standard featurizer feed (one row per
# metric). Spark's unpivot is a narrow transform (no shuffle, no Python);
# the aggregate on top proves value fidelity. Measures are floor'd to
# BIGINT cents upstream of the sum so both engines do exact integer math.
_Q76_SQL = """
    WITH m AS (
      SELECT l_orderkey, measure, CAST(FLOOR(val * 100) AS BIGINT) AS cents
      FROM (
        SELECT l_orderkey, 'l_quantity' AS measure, l_quantity AS val
        FROM lineitem
        UNION ALL
        SELECT l_orderkey, 'l_extendedprice', l_extendedprice FROM lineitem
        UNION ALL
        SELECT l_orderkey, 'l_discount', l_discount FROM lineitem
        UNION ALL
        SELECT l_orderkey, 'l_tax', l_tax FROM lineitem))
    SELECT measure, count(*)::BIGINT AS n, sum(cents)::BIGINT AS sum_cents,
           min(cents) AS min_cents, max(cents) AS max_cents
    FROM m GROUP BY measure
"""


@query("q76_unpivot_melt", _Q76_SQL)
def q76(spark, sf_dir):
    melted = _t(spark, sf_dir, "lineitem").unpivot(
        ids=["l_orderkey"],
        values=["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        variableColumnName="measure",
        valueColumnName="val",
    )
    return (
        melted.select(
            "measure",
            F.floor(F.col("val") * 100).cast("long").alias("cents"),
        )
        .groupBy("measure")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("cents").alias("sum_cents"),
            F.min("cents").alias("min_cents"),
            F.max("cents").alias("max_cents"),
        )
    )


# ----------------------- q77: retention cohort matrix ---------------------
# Users bucketed by first-activity day (cohort), counted distinct-active
# per (cohort_day, active_day) — the product-analytics retention matrix.
# Two aggregates + one join: first-seen is a map-side-combinable min per
# user (NOT a window over the raw stream), the fact side joins the tiny
# per-user cohort frame (AQE broadcasts it), and the final distinct-count
# shuffles once on the (cohort, day) pair.
_Q77_SQL = """
    WITH firstseen AS (
      SELECT user_id, date_trunc('day', min(ts)) AS cohort_d
      FROM events GROUP BY user_id),
    activity AS (
      SELECT DISTINCT e.user_id, f.cohort_d,
             date_trunc('day', e.ts) AS active_d
      FROM events e JOIN firstseen f USING (user_id))
    SELECT cohort_d, active_d, count(*)::BIGINT AS n_users
    FROM activity
    GROUP BY cohort_d, active_d
"""


@query("q77_retention_cohort", _Q77_SQL)
def q77(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    firstseen = e.groupBy("user_id").agg(
        F.date_trunc("day", F.min("ts")).alias("cohort_d")
    )
    return (
        e.select("user_id", F.date_trunc("day", F.col("ts")).alias("active_d"))
        .join(firstseen, "user_id")
        .select("user_id", "cohort_d", "active_d")
        .distinct()
        .groupBy("cohort_d", "active_d")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )

# ----------------------- q78: ordered funnel (signup -> click -> purchase) -
# Behavioral funnel: per user, the earliest time of each step, a step
# counting only if it happens AFTER the previous one. ONE aggregate over
# the stream (conditional min per step via a running dependency), then a
# count per furthest-stage — never a per-user sort or a self-join chain.
# The two-phase formulation (min ts per (user, step), then the step-order
# comparison on the tiny per-user frame) is the scale path: the wide
# stream collapses before any cross-step logic runs.
_Q78_SQL = """
    WITH steps AS (
      SELECT user_id,
             min(ts) FILTER (event_type = 'signup')   AS t_signup,
             min(ts) FILTER (event_type = 'click')    AS t_click,
             min(ts) FILTER (event_type = 'purchase') AS t_purchase
      FROM events GROUP BY user_id),
    ordered AS (
      SELECT user_id,
             t_signup IS NOT NULL AS s1,
             (t_signup IS NOT NULL AND t_click > t_signup) AS s2,
             (t_signup IS NOT NULL AND t_click > t_signup
              AND t_purchase > t_click) AS s3
      FROM steps)
    SELECT (CASE WHEN s3 THEN 3 WHEN s2 THEN 2 WHEN s1 THEN 1 ELSE 0 END)
             AS funnel_stage,
           count(*)::BIGINT AS n_users
    FROM ordered GROUP BY 1
"""


@query("q78_funnel_stages", _Q78_SQL)
def q78(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    steps = e.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias("t_signup"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("t_click"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("t_purchase"),
    )
    s1 = F.col("t_signup").isNotNull()
    s2 = s1 & (F.col("t_click") > F.col("t_signup"))
    s3 = s2 & (F.col("t_purchase") > F.col("t_click"))
    return (
        steps.select(
            F.when(s3, 3).when(s2, 2).when(s1, 1).otherwise(0)
            .alias("funnel_stage")
        )
        .groupBy("funnel_stage")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


# ------------------------ q79: top-k per group (ranked window) -------------
# Top-3 longest documents per source, deterministic tie-break on doc_id —
# the ranked-retrieval shape (best examples per bucket, worst offenders
# per rule). rank-within-group IS a window sort, but the partition is the
# GROUP (bounded by the group's row count, spread across tasks), never
# the corpus; at 100 TB add a per-group pre-filter (approx threshold) to
# shrink the sorted set — here groups are small and the plain window is
# the honest baseline.
_Q79_SQL = """
    SELECT source, doc_id, n_chars, rnk FROM (
      SELECT source, doc_id, n_chars,
             row_number() OVER (PARTITION BY source
                                ORDER BY n_chars DESC, doc_id) AS rnk
      FROM documents)
    WHERE rnk <= 3
"""


@query("q79_topk_per_group", _Q79_SQL)
def q79(spark, sf_dir):
    w = Window.partitionBy("source").orderBy(
        F.col("n_chars").desc(), F.col("doc_id")
    )
    return (
        _t(spark, sf_dir, "documents")
        .select("source", "doc_id", "n_chars",
                F.row_number().over(w).alias("rnk"))
        .filter(F.col("rnk") <= 3)
    )


# ------------------- q80: calendar-spine gap fill (dense time series) ------
# Hourly event counts per type INCLUDING empty hours as explicit zeros —
# downstream forecasting/drift jobs need dense series. The spine is
# GENERATED (sequence() over the observed [min,max] span, exploded, cross
# joined with the 5 event types) — never a driver-side loop or a Python
# range; the observed counts left-join the spine and coalesce to 0. The
# spine is tiny (hours x types), so AQE broadcasts the counts join.
_Q80_SQL = """
    WITH bounds AS (
      SELECT date_trunc('hour', min(ts)) AS t0,
             date_trunc('hour', max(ts)) AS t1
      FROM events),
    spine AS (
      SELECT t.h AS bucket_h, et.event_type
      FROM bounds, UNNEST(generate_series(t0, t1, INTERVAL 1 HOUR)) AS t(h),
           (SELECT DISTINCT event_type FROM events) et),
    counts AS (
      SELECT event_type, date_trunc('hour', ts) AS bucket_h,
             count(*)::BIGINT AS n
      FROM events GROUP BY 1, 2)
    SELECT s.event_type, s.bucket_h, coalesce(c.n, 0)::BIGINT AS n
    FROM spine s LEFT JOIN counts c USING (event_type, bucket_h)
"""


@query("q80_time_spine_gap_fill", _Q80_SQL)
def q80(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    bounds = e.agg(
        F.date_trunc("hour", F.min("ts")).alias("t0"),
        F.date_trunc("hour", F.max("ts")).alias("t1"),
    )
    hours = bounds.select(
        F.explode(
            F.sequence("t0", "t1", F.expr("INTERVAL 1 HOUR"))
        ).alias("bucket_h")
    )
    types = e.select("event_type").distinct()
    spine = hours.crossJoin(types)
    counts = e.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("bucket_h")
    ).agg(F.count(F.lit(1)).alias("n"))
    return spine.join(counts, ["event_type", "bucket_h"], "left").select(
        "event_type", "bucket_h", F.coalesce("n", F.lit(0)).alias("n")
    )

# --------------- q81: HyperLogLog registers (mergeable distinct sketch) ---
# Register-level HLL over all document words (operators/sketches.py::
# hll_registers) — the fixed-size mergeable twin of approx_count_distinct,
# exposed so shard sketches can be STORED and re-merged (register-wise
# max) without rescans. Deterministic md5-derived hashing + integer
# bit-length rho (never float log2) make every register oracle-exact,
# like the q51 Count-Min cells; the ESTIMATE path is pytest-verified
# within 3% of exact (it is float arithmetic, deliberately not hashed).
_Q81_SQL = r"""
    WITH toks AS (SELECT unnest(string_split_regex(lower(text), '\s+')) AS w
                  FROM documents),
    t AS (SELECT w FROM toks WHERE w <> ''),
    h AS (SELECT (('0x' || substr(md5(w), 1, 8))::UBIGINT
                  % 2147483647)::BIGINT AS hv
          FROM t),
    reg AS (SELECT hv % 512 AS bucket,
                   CASE WHEN (hv >> 9) = 0 THEN 23
                        ELSE 23 - length(bin(hv >> 9)) END AS rho
            FROM h)
    SELECT bucket, max(rho)::INTEGER AS r FROM reg GROUP BY bucket
"""


@query("q81_hll_registers", _Q81_SQL)
def q81(spark, sf_dir):
    from georef_ar_etl_spark.operators import sketches

    toks = (
        _t(spark, sf_dir, "documents")
        .select(F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("w"))
        .filter(F.col("w") != "")
    )
    return sketches.hll_registers(toks, "w", p=9)

# -------------------- q82: snapshot diff (added/removed/changed) -----------
# table_diff (operators/merge.py) between orders and a deterministically
# drifted next version (every 97th key dropped, every 31st price bumped,
# every 53rd re-inserted under a shifted key): ONE full-outer join,
# exact column-wise null-safe compares (no hash fingerprints — a
# collision must not mask a change), unchanged keys filtered so output
# is bounded by true drift. The validation pass behind backfills and
# replica checks; reference analogue: per-run changed-ID reports
# (georef_ar_etl/transformers.py:145-149).
_Q82_SQL = """
    WITH l AS (SELECT * FROM orders),
    r AS (
      SELECT o_orderkey, o_custkey, o_orderstatus,
             CASE WHEN o_orderkey % 31 = 0 THEN o_totalprice + 1
                  ELSE o_totalprice END AS o_totalprice,
             o_orderdate, o_orderpriority
      FROM orders WHERE o_orderkey % 97 <> 0
      UNION ALL
      SELECT o_orderkey + 10000000, o_custkey, o_orderstatus,
             o_totalprice, o_orderdate, o_orderpriority
      FROM orders WHERE o_orderkey % 53 = 0),
    j AS (
      SELECT coalesce(l.o_orderkey, r.o_orderkey) AS o_orderkey,
             CASE WHEN l.o_orderkey IS NULL THEN 'added'
                  WHEN r.o_orderkey IS NULL THEN 'removed'
                  WHEN (l.o_custkey IS DISTINCT FROM r.o_custkey)
                    OR (l.o_orderstatus IS DISTINCT FROM r.o_orderstatus)
                    OR (l.o_totalprice IS DISTINCT FROM r.o_totalprice)
                    OR (l.o_orderdate IS DISTINCT FROM r.o_orderdate)
                    OR (l.o_orderpriority IS DISTINCT FROM r.o_orderpriority)
                  THEN 'changed' END AS change_type
      FROM l FULL OUTER JOIN r ON l.o_orderkey = r.o_orderkey)
    SELECT o_orderkey, change_type FROM j WHERE change_type IS NOT NULL
"""


@query("q82_snapshot_diff", _Q82_SQL)
def q82(spark, sf_dir):
    from georef_ar_etl_spark.operators.merge import table_diff

    o = _t(spark, sf_dir, "orders")
    right = (
        o.filter(F.col("o_orderkey") % 97 != 0)
        .withColumn(
            "o_totalprice",
            F.when(
                F.col("o_orderkey") % 31 == 0, F.col("o_totalprice") + 1
            ).otherwise(F.col("o_totalprice")),
        )
        .unionByName(
            o.filter(F.col("o_orderkey") % 53 == 0).withColumn(
                "o_orderkey", F.col("o_orderkey") + 10000000
            )
        )
    )
    return table_diff(o, right, "o_orderkey")

# ------------- q83: conjunctive posting-intersection keyword search -------
# Docs containing ALL of three query words, answered inverted-index-style
# (operators/text.py::posting_search): per-doc distinct terms probe a
# BROADCAST term list, the AND is count-distinct == k — never an N-way
# self-join of posting lists. The maintained-index version of this shape
# is FingerprintIndex (q34); this is the query path.
_Q83_SQL = r"""
    WITH toks AS (
      SELECT DISTINCT doc_id,
             unnest(list_filter(string_split_regex(lower(text), '\s+'),
                                x -> x <> '')) AS term
      FROM documents),
    hits AS (
      SELECT doc_id, count(DISTINCT term) AS n
      FROM toks WHERE term IN ('data', 'spark', 'query')
      GROUP BY doc_id)
    SELECT doc_id FROM hits WHERE n = 3
"""


@query("q83_posting_search", _Q83_SQL)
def q83(spark, sf_dir):
    out = text.posting_search(
        _t(spark, sf_dir, "documents"), ["data", "spark", "query"]
    )
    return out


# ------------- q84: BM25 keyword ranking (Okapi, Lucene idf) --------------
# Full-text relevance scoring over the corpus: per-doc length + query-term
# tf are word-count-shaped passes (tf pre-filtered to the query terms
# BEFORE its shuffle); df/N/avgdl ride broadcasts. Per-term partials are
# rounded then summed as exact decimals so the score is partition-order-
# independent (the q68 money-sum pattern).
_Q84_SQL = r"""
    WITH toks AS (
      SELECT doc_id,
             unnest(list_filter(string_split_regex(lower(text), '\s+'),
                                x -> x <> '')) AS term
      FROM documents),
    dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM toks GROUP BY 1),
    stats AS (SELECT sum(dl)::DOUBLE / count(*) AS avgdl,
                     count(*)::BIGINT AS n_docs FROM dl),
    tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM toks
           WHERE term IN ('data', 'spark', 'vector') GROUP BY 1, 2),
    dfreq AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY 1),
    parts AS (
      SELECT t.doc_id,
             round(ln(1.0::DOUBLE + (s.n_docs - d.df + 0.5::DOUBLE)
                                    / (d.df + 0.5::DOUBLE))
                   * ((t.tf * 2.2::DOUBLE)
                      / (t.tf + 1.2::DOUBLE
                               * (0.25::DOUBLE
                                  + 0.75::DOUBLE * l.dl / s.avgdl))),
                   9)::DECIMAL(18,9) AS part
      FROM tf t JOIN dfreq d USING (term) JOIN dl l USING (doc_id)
      CROSS JOIN stats s)
    SELECT doc_id, cast(round(sum(part), 4) AS DOUBLE) AS bm25
    FROM parts GROUP BY 1
"""


@query("q84_bm25_rank", _Q84_SQL)
def q84(spark, sf_dir):
    return text.bm25_rank(
        _t(spark, sf_dir, "documents"), ["data", "spark", "vector"]
    )


# ------------- q85: URL canonicalization (web-corpus dedup keys) ----------
# Raw crawl URLs synthesized deterministically from doc_id (both engines
# build the identical string — the q35 injected-input pattern), then
# canonicalized: scheme/host case, www., default ports, duplicate+trailing
# slashes, tracking params (utm_*/fbclid/gclid/ref), param order, fragment.
# Pure Catalyst regex/array expressions (functions/url.py) — the
# normalization stays inside whole-stage codegen next to the scan.
_Q85_SQL = r"""
    WITH raw AS (
      SELECT doc_id,
             (CASE WHEN doc_id % 3 = 0 THEN 'HTTPS' ELSE 'http' END)
             || '://'
             || (CASE WHEN doc_id % 5 = 0 THEN 'WWW.News.Example.COM'
                      ELSE 'cdn' || (doc_id % 7)::VARCHAR || '.Site'
                           || (doc_id % 4)::VARCHAR || '.org' END)
             || (CASE WHEN doc_id % 4 = 0 THEN ':443'
                      WHEN doc_id % 4 = 1 THEN ':8080' ELSE '' END)
             || '/a//b/' || (doc_id % 6)::VARCHAR
             || (CASE WHEN doc_id % 2 = 0 THEN '/' ELSE '' END)
             || '?utm_source=feed&id=' || (doc_id % 9)::VARCHAR
             || '&z=1&gclid=x#f' || (doc_id % 3)::VARCHAR AS url
      FROM documents),
    parts AS (
      SELECT doc_id, url,
        lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
        regexp_extract(url, '^[^:]+://([^/?#]*)', 1) AS auth,
        regexp_extract(url, '^[^:]+://[^/?#]*([^?#]*)', 1) AS rawpath,
        regexp_extract(url, '\?([^#]*)', 1) AS rawq
      FROM raw),
    hp AS (
      SELECT *,
        regexp_replace(lower(regexp_extract(auth, '^([^:]*)', 1)),
                       '^www\.', '') AS host,
        regexp_extract(auth, ':(\d+)$', 1) AS port_s
      FROM parts),
    np AS (
      SELECT *,
        CASE WHEN port_s = '' THEN NULL
             WHEN scheme = 'http'  AND port_s::INT = 80  THEN NULL
             WHEN scheme = 'https' AND port_s::INT = 443 THEN NULL
             ELSE port_s::INT END AS port,
        CASE WHEN regexp_replace(regexp_replace(rawpath, '/{2,}', '/', 'g'),
                                 '(.)/$', '\1') = ''
             THEN '/'
             ELSE regexp_replace(regexp_replace(rawpath, '/{2,}', '/', 'g'),
                                 '(.)/$', '\1') END AS path,
        list_sort(list_filter(string_split(rawq, '&'),
            x -> x <> '' AND NOT regexp_matches(
                     x, '^(utm_[^=]*|fbclid|gclid|ref)='))) AS params
      FROM hp)
    SELECT doc_id, scheme, host,
           regexp_extract(host, '([^.]+\.[^.]+)$', 1) AS reg_domain,
           port::VARCHAR AS port, path,
           CASE WHEN len(params) > 0
                THEN array_to_string(params, '&') END AS query_norm,
           scheme || '://' || host
             || coalesce(':' || port::VARCHAR, '') || path
             || coalesce('?' || CASE WHEN len(params) > 0
                                     THEN array_to_string(params, '&') END,
                         '') AS url_norm
    FROM np
"""


@query("q85_url_normalize", _Q85_SQL)
def q85(spark, sf_dir):
    from georef_ar_etl_spark.functions.url import with_normalized_url

    d = F.col("doc_id")
    url = F.concat(
        F.when(d % 3 == 0, F.lit("HTTPS")).otherwise(F.lit("http")),
        F.lit("://"),
        F.when(d % 5 == 0, F.lit("WWW.News.Example.COM")).otherwise(
            F.concat(
                F.lit("cdn"), (d % 7).cast("string"),
                F.lit(".Site"), (d % 4).cast("string"), F.lit(".org"),
            )
        ),
        F.when(d % 4 == 0, F.lit(":443"))
        .when(d % 4 == 1, F.lit(":8080"))
        .otherwise(F.lit("")),
        F.lit("/a//b/"), (d % 6).cast("string"),
        F.when(d % 2 == 0, F.lit("/")).otherwise(F.lit("")),
        F.lit("?utm_source=feed&id="), (d % 9).cast("string"),
        F.lit("&z=1&gclid=x#f"), (d % 3).cast("string"),
    )
    raw = _t(spark, sf_dir, "documents").select("doc_id", url.alias("url"))
    return with_normalized_url(raw).select(
        "doc_id", "scheme", "host", "reg_domain",
        F.col("port").cast("string").alias("port"),
        "path", "query_norm", "url_norm",
    )


# ------------- q86: weighted sampling without replacement (A-ES) ----------
# Efraimidis–Spirakis exponential-priority sampling with md5-derived
# uniforms — deterministic, engine-reproducible, and executed as
# per-partition top-k + k-row merge (never a full sort). Completes the
# sampling family: fraction (q32), budget (q47), per-group-k (q55),
# weighted-k (here, weight = n_chars).
_Q86_SQL = r"""
    WITH h AS (
      SELECT doc_id, n_chars,
             (('0x' || substr(md5(doc_id::VARCHAR || 'wsample'), 1, 8))::UBIGINT
              + 1)::DOUBLE / 4294967296.0::DOUBLE AS u
      FROM documents WHERE n_chars > 0)
    SELECT doc_id, n_chars
    FROM h ORDER BY ln(u) / n_chars DESC, doc_id LIMIT 50
"""


@query("q86_weighted_sample", _Q86_SQL)
def q86(spark, sf_dir):
    from georef_ar_etl_spark.operators import corpus

    d = _t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    return corpus.weighted_sample(d, k=50, weight_col="n_chars")


# ------------- q87: PMI term co-occurrence (collocations) -----------------
# ln(c_xy*N / (c_x*c_y)) over per-doc DISTINCT terms, pair space bounded
# to the top-V vocabulary and expanded per document by an array-
# combinations expression — no posting-list self-join, no shuffle beyond
# the map-side-combined pair counts (operators/text.py::pmi_pairs).
_Q87_SQL = r"""
    WITH toks AS (
      SELECT DISTINCT doc_id,
             unnest(list_filter(string_split_regex(lower(text), '\s+'),
                                x -> x <> '')) AS term
      FROM documents),
    dfreq AS (SELECT term, count(*)::BIGINT AS c FROM toks GROUP BY 1),
    vocab AS (SELECT term, c FROM dfreq ORDER BY c DESC, term LIMIT 30),
    iv AS (SELECT t.doc_id, t.term FROM toks t JOIN vocab USING (term)),
    n AS (SELECT count(DISTINCT doc_id)::BIGINT AS n_docs FROM documents),
    pairs AS (
      SELECT a.term AS term_a, b.term AS term_b, count(*)::BIGINT AS c_xy
      FROM iv a JOIN iv b ON a.doc_id = b.doc_id AND a.term < b.term
      GROUP BY 1, 2 HAVING count(*) >= 5)
    SELECT p.term_a, p.term_b, p.c_xy, va.c AS c_x, vb.c AS c_y,
           ln((p.c_xy * n.n_docs)::DOUBLE / (va.c * vb.c)) AS pmi
    FROM pairs p
      JOIN vocab va ON va.term = p.term_a
      JOIN vocab vb ON vb.term = p.term_b
      CROSS JOIN n
"""


@query("q87_pmi_cooccurrence", _Q87_SQL)
def q87(spark, sf_dir):
    return text.pmi_pairs(
        _t(spark, sf_dir, "documents"), top_vocab=30, min_pair_count=5
    )


def _q88_sql(n_hashes=8, n_bands=4, k=8, min_est=0.25) -> str:
    """Mirror of doc_dedup.minhash_jaccard_estimate: same signature
    arithmetic as the q17 oracle, but scored by the fraction of agreeing
    signature components instead of the exact set Jaccard."""
    from georef_ar_etl_spark.operators.doc_dedup import minhash_affine_params

    P = (1 << 31) - 1
    rows = n_hashes // n_bands
    A, B = minhash_affine_params(n_hashes)
    mins = ", ".join(
        f"list_min(list_transform(H, x -> (x * {int(A[i])} + {int(B[i])}) % {P}))"
        for i in range(n_hashes)
    )
    bands = ", ".join(
        "'%d:' || %s"
        % (b, " || ',' || ".join(f"sig[{b * rows + r + 1}]::varchar" for r in range(rows)))
        for b in range(n_bands)
    )
    agree = " + ".join(
        f"CASE WHEN sa.sig[{i + 1}] = sb.sig[{i + 1}] THEN 1 ELSE 0 END"
        for i in range(n_hashes)
    )
    return f"""
    WITH norm AS (SELECT doc_id, {_NORM} AS t FROM documents),
    pad AS (SELECT doc_id,
                   CASE WHEN length(t) < {k} THEN rpad(t, {k}, ' ') ELSE t END AS sp
            FROM norm),
    hs AS (SELECT doc_id,
                  list_transform(generate_series(1, length(sp) - {k - 1}),
                                 i -> {_poly31_hash_terms("sp", k)}) AS H
           FROM pad),
    sig AS (SELECT doc_id, [{mins}] AS sig FROM hs),
    bands AS (SELECT doc_id, unnest([{bands}]) AS band FROM sig),
    cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
             FROM bands a JOIN bands b ON a.band = b.band AND a.doc_id < b.doc_id),
    est AS (SELECT c.id_a, c.id_b,
                   round(({agree}) * 1.0::DOUBLE / {n_hashes}, 6) AS est_jaccard
            FROM cand c JOIN sig sa ON sa.doc_id = c.id_a
                        JOIN sig sb ON sb.doc_id = c.id_b)
    SELECT id_a, id_b, est_jaccard FROM est WHERE est_jaccard >= {min_est}
    """


# MinHash Jaccard ESTIMATE (agreement fraction of signature components,
# E[est] = true Jaccard): the score that runs off the PERSISTED signature
# frame without re-touching text — candidate join moves n_hashes longs per
# doc. Same seeded hash family as q17, so one oracle arithmetic covers both.
@query("q88_minhash_jaccard_estimate", _q88_sql())
def q88(spark, sf_dir):
    return doc_dedup.minhash_jaccard_estimate(
        _t(spark, sf_dir, "documents"),
        n_hashes=8, n_bands=4, min_estimate=0.25, shingle_k=8,
    )


def _q89_sql(n_iter=4, damping=85, scale=10**9) -> str:
    """Chained-CTE mirror of operators/graph.py::pagerank — one CTE trio
    (dangling mass, inflow, update) per iteration, all-integer arithmetic,
    so every rank unit matches bit-for-bit."""
    base = (100 - damping) * scale // 100
    parts = [f"""
    e AS (SELECT user_id % 40 AS src, (user_id * 7 + event_id) % 50 AS dst
          FROM events),
    nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
    deg AS (SELECT src, count(*)::BIGINT AS deg FROM e GROUP BY 1),
    n AS (SELECT count(*)::BIGINT AS n_nodes FROM nodes),
    r0 AS (SELECT node, {scale}::BIGINT AS r FROM nodes)"""]
    prev = "r0"
    for i in range(1, n_iter + 1):
        parts.append(f"""
    d{i} AS (SELECT coalesce(sum(r), 0)::BIGINT AS dang
             FROM {prev} WHERE node NOT IN (SELECT src FROM deg)),
    i{i} AS (SELECT e.dst AS node, sum({prev}.r // dg.deg)::BIGINT AS inflow
             FROM e JOIN {prev} ON {prev}.node = e.src
                    JOIN deg dg ON dg.src = e.src
             GROUP BY 1),
    r{i} AS (SELECT nd.node,
                    ({base} + (({damping} * (coalesce(i{i}.inflow, 0)
                                + d{i}.dang // nn.n_nodes)) // 100))::BIGINT AS r
             FROM nodes nd LEFT JOIN i{i} ON i{i}.node = nd.node
             CROSS JOIN d{i} CROSS JOIN n nn)""")
        prev = f"r{i}"
    return (
        "    WITH" + ",".join(parts)
        + f"\n    SELECT node, r AS rank_units FROM {prev}"
    )


# PAGERANK (fixed-point): link-quality prior over a deterministic event-
# derived graph (nodes 40-49 are pure sinks, exercising the dangling-mass
# redistribution). Integer units make the iterative result bit-exact
# across engines — see operators/graph.py for the determinism contract.
@query("q89_pagerank", _q89_sql())
def q89(spark, sf_dir):
    from georef_ar_etl_spark.operators import graph

    ev = _t(spark, sf_dir, "events")
    e = ev.select(
        (F.col("user_id") % 40).alias("src"),
        ((F.col("user_id") * 7 + F.col("event_id")) % 50).alias("dst"),
    )
    return graph.pagerank(e, n_iter=4)


# ------------- q90: overlapping token-window chunking (RAG prep) ----------
# 64-token chunks every 48 tokens — shuffle-free Catalyst expansion
# (operators/text.py::chunk_text); the chunk frame inherits the scan's
# partitioning for the downstream embedding UDF.
_Q90_SQL = r"""
    WITH w AS (
      SELECT doc_id,
             list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS words
      FROM documents),
    s AS (SELECT doc_id, words,
                 unnest(generate_series(1, len(words), 48)) AS start
          FROM w WHERE len(words) >= 1)
    SELECT doc_id,
           ((start - 1) // 48)::BIGINT AS chunk_id,
           len(list_slice(words, start, start + 63))::BIGINT AS n_tokens,
           array_to_string(list_slice(words, start, start + 63), ' ') AS chunk
    FROM s
"""


@query("q90_chunk_text", _Q90_SQL)
def q90(spark, sf_dir):
    return text.chunk_text(
        _t(spark, sf_dir, "documents"), chunk_tokens=64, stride=48
    )


# ------------- q91: reciprocal rank fusion (BM25 x length prior) ----------
# Fusing two retrievers whose raw scores are incomparable: the q84 BM25
# list and a document-length prior. Rank lists are bounded retrieval
# outputs — the global ordered window is the contract, not an accident
# (operators/ranking.py docstring).
_Q91_SQL = rf"""
    WITH bm AS ({_Q84_SQL}),
    ra AS (SELECT doc_id,
                  row_number() OVER (ORDER BY bm25 DESC, doc_id) AS r
           FROM bm),
    rb AS (SELECT doc_id,
                  row_number() OVER (ORDER BY n_chars DESC, doc_id) AS r
           FROM documents),
    c AS (
      SELECT doc_id,
             round(1.0::DOUBLE / (60 + r), 12)::DECIMAL(18,12) AS contrib
      FROM ra
      UNION ALL
      SELECT doc_id,
             round(1.0::DOUBLE / (60 + r), 12)::DECIMAL(18,12) AS contrib
      FROM rb)
    SELECT doc_id, cast(round(sum(contrib), 9) AS DOUBLE) AS rrf
    FROM c GROUP BY 1
"""


@query("q91_rrf_fusion", _Q91_SQL)
def q91(spark, sf_dir):
    from georef_ar_etl_spark.operators.ranking import rrf_fuse

    docs = _t(spark, sf_dir, "documents")
    bm = text.bm25_rank(docs, ["data", "spark", "vector"]).withColumnRenamed(
        "bm25", "score"
    )
    prior = docs.select("doc_id", F.col("n_chars").alias("score"))
    return rrf_fuse([bm, prior], k=60)


# ------------- q92: within-document duplicate-line removal (C4) ------------
# The per-page half of the C4 cleanup: each document keeps only the first
# occurrence of every distinct line, reassembled in order — ZERO-shuffle
# (array higher-order functions in codegen) vs q70's corpus-wide two-shuffle
# pass (operators/text.py::dedup_lines_in_doc). Boilerplate is injected
# deterministically on BOTH sides so the dedup provably fires (the q35
# PII-injection pattern); 2-word lines make in-page repeats real.
_Q92_SQL = r"""
    WITH d AS (
      SELECT doc_id,
             text || ' nav home nav home nav home nav home'
                  || ' nav home nav home nav home nav home' AS t
      FROM documents),
    w AS (
      SELECT doc_id,
             list_filter(string_split_regex(t, '\s+'), x -> x <> '') AS words
      FROM d),
    lines AS (
      SELECT doc_id, CAST(t.i AS INTEGER) AS line_no,
             array_to_string(words[(t.i*2+1):(t.i*2+2)], ' ') AS line
      FROM w, UNNEST(range(CAST(ceil(len(words)/2.0) AS BIGINT))) AS t(i)
      WHERE len(words) > 0),
    k AS (
      SELECT doc_id, line_no, line,
             row_number() OVER (PARTITION BY doc_id, line
                                ORDER BY line_no) AS rn
      FROM lines)
    SELECT doc_id,
           md5(string_agg(line, chr(10) ORDER BY line_no)
               FILTER (rn = 1)) AS text_fp,
           (count(*) FILTER (rn = 1))::BIGINT AS n_lines,
           (count(*) FILTER (rn > 1))::BIGINT AS n_dropped
    FROM k GROUP BY doc_id
"""


@query("q92_dedup_lines_in_doc", _Q92_SQL)
def q92(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(
                " nav home nav home nav home nav home"
                " nav home nav home nav home nav home"
            ),
        ).alias("text"),
    )
    out = text.dedup_lines_in_doc(docs, words_per_line=2)
    return out.select(
        "doc_id", F.md5(F.col("text")).alias("text_fp"), "n_lines", "n_dropped"
    )


# ------------- q93: dedup-group representative by quality ------------------
# The 'keep the best, not the first' near-dedup policy (SemDeDup/CCNet):
# q44's connected components label the groups, q46's quality gate + n_chars
# rank the members, and the winner per group is a map-side-combinable
# max(struct) — never a window over the group (a giant boilerplate cluster
# would hot-key there). Oracle composes the SAME closure + gate CTEs.
def _q93_sql() -> str:
    return f"""
    WITH comp AS (SELECT * FROM ({_q44_sql()})),
    qg AS (SELECT doc_id, keep FROM ({_q46_sql()})),
    m AS (
      SELECT c.doc_id, c.component,
             CASE WHEN qg.keep THEN 1 ELSE 0 END AS k, d.n_chars
      FROM comp c
      JOIN qg USING (doc_id)
      JOIN documents d USING (doc_id)),
    r AS (
      SELECT component, doc_id,
             row_number() OVER (PARTITION BY component
                                ORDER BY k DESC, n_chars DESC, doc_id) AS rn
      FROM m)
    SELECT m.doc_id, m.component, r.doc_id AS rep_doc_id,
           m.doc_id = r.doc_id AS is_rep
    FROM m JOIN r ON m.component = r.component AND r.rn = 1
    """


@query("q93_group_representative", _q93_sql())
def q93(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    pairs = doc_dedup.minhash_lsh_pairs(
        docs, n_hashes=8, n_bands=4, min_jaccard=0.35, shingle_k=8
    )
    groups = doc_dedup.dedup_groups(docs, pairs)
    q = text.quality_gate(docs).select(
        "doc_id", F.col("keep").cast("int").alias("_k")
    )
    ranked = (
        groups.join(q, "doc_id")
        .join(docs.select("doc_id", "n_chars"), "doc_id")
        .select(
            "doc_id",
            "component",
            F.struct(
                F.col("_k").alias("k"), F.col("n_chars").alias("c")
            ).alias("rank"),
        )
    )
    return doc_dedup.group_representatives(ranked)


# ------------- q94: interval-overlap join (bucketed, count-once) -----------
# Interval × interval overlap per user WITHOUT the per-key cross product:
# both sides explode over W-sized buckets, equi-join on (key, bucket), and
# the count-once guard (bucket of max(start)) emits each pair exactly once
# with NO distinct shuffle (operators/temporal.py::interval_overlap_join).
# Intervals derive deterministically from events: [floor(value),
# floor(value) + 1 + event_id % 37]. The oracle is the plain theta join.
_Q94_SQL = """
    WITH b AS (
      SELECT event_id, user_id, event_type,
             CAST(floor(value) AS BIGINT) AS s,
             CAST(floor(value) AS BIGINT) + 1 + event_id % 37 AS e
      FROM events),
    l AS (SELECT user_id, event_id AS l_id, s AS l_s, e AS l_e
          FROM b WHERE event_type IN ('click', 'view')),
    r AS (SELECT user_id, event_id AS r_id, s AS r_s, e AS r_e
          FROM b WHERE event_type IN ('purchase', 'signup'))
    SELECT l.user_id, l_id, r_id,
           (least(l_e, r_e) - greatest(l_s, r_s))::BIGINT AS overlap_len
    FROM l JOIN r
      ON l.user_id = r.user_id AND l_s <= r_e AND r_s <= l_e
"""


@query("q94_interval_overlap_join", _Q94_SQL)
def q94(spark, sf_dir):
    from georef_ar_etl_spark.operators import temporal

    ev = _t(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "event_type",
        F.floor("value").cast("long").alias("s"),
        (F.floor("value").cast("long") + 1 + F.col("event_id") % 37).alias("e"),
    )
    l = ev.filter(F.col("event_type").isin("click", "view")).select(
        "user_id",
        F.col("event_id").alias("l_id"),
        F.col("s").alias("l_s"),
        F.col("e").alias("l_e"),
    )
    r = ev.filter(F.col("event_type").isin("purchase", "signup")).select(
        "user_id",
        F.col("event_id").alias("r_id"),
        F.col("s").alias("r_s"),
        F.col("e").alias("r_e"),
    )
    j = temporal.interval_overlap_join(
        l, r, "user_id", ("l_s", "l_e"), ("r_s", "r_e"), bucket_width=32
    )
    return j.select(
        "user_id",
        "l_id",
        "r_id",
        (F.least("l_e", "r_e") - F.greatest("l_s", "r_s")).alias("overlap_len"),
    )


# ------------- q95/q96: histogram sketch + quantile estimate ---------------
# The mergeable distribution sketch completing the CM (frequency) + HLL
# (cardinality) family: fixed-width bin counts are a map-side-combinable
# hash aggregate (<= n_bins rows out regardless of input) and quantiles
# interpolate within the target bin — the constant-memory percentile path
# at 100 TB vs an exact quantile's full sort (operators/sketches.py).
_Q95_SQL = """
    SELECT least(greatest(CAST(floor((value - 0.0) / 8.0) AS BIGINT), 0),
                 63) AS bin,
           count(*)::BIGINT AS n
    FROM events WHERE value IS NOT NULL
    GROUP BY 1
"""


@query("q95_hist_sketch", _Q95_SQL)
def q95(spark, sf_dir):
    from georef_ar_etl_spark.operators import sketches

    return sketches.hist_sketch(
        _t(spark, sf_dir, "events"), "value", lo=0.0, hi=512.0, n_bins=64
    )


_Q96_SQL = f"""
    WITH h AS ({_Q95_SQL}),
    c AS (SELECT bin, n, sum(n) OVER (ORDER BY bin) AS cum FROM h),
    t AS (SELECT sum(n) AS total FROM h),
    qs AS (SELECT unnest([0.25, 0.5, 0.75, 0.9, 0.99]) AS q)
    SELECT q, round(0.0 + 8.0 * (bin + (q * total - (cum - n)) / n), 6) AS est
    FROM qs, c, t
    WHERE cum >= q * total AND cum - n < q * total
"""


@query("q96_hist_quantile", _Q96_SQL)
def q96(spark, sf_dir):
    from georef_ar_etl_spark.operators import sketches

    h = sketches.hist_sketch(
        _t(spark, sf_dir, "events"), "value", lo=0.0, hi=512.0, n_bins=64
    )
    return sketches.hist_quantile(
        h, [0.25, 0.5, 0.75, 0.9, 0.99], lo=0.0, hi=512.0, n_bins=64
    )


# ------------- q97: SCD Type 2 history from a change stream ----------------
# The history-preserving consumer of a CDC feed (operators/scd.py): change
# events (signup = delete, anything else = upsert of event_type) become
# validity intervals [valid_from, valid_to) per user with consecutive
# no-change upserts COLLAPSED — one shuffle, two stacked windows (plan
# pinned in test_plan_shapes.py). The oracle replays the identical
# change-point + lead logic in SQL windows.
_Q97_SQL = """
    WITH c AS (
      SELECT user_id, event_id AS seq,
             CASE WHEN event_type = 'signup' THEN 'd' ELSE 'u' END AS op,
             CASE WHEN event_type = 'signup' THEN NULL
                  ELSE event_type END AS e_et
      FROM events),
    m AS (
      SELECT *, row_number() OVER w AS rn,
             lag(op) OVER w AS p_op, lag(e_et) OVER w AS p_et
      FROM c WINDOW w AS (PARTITION BY user_id ORDER BY seq)),
    cp AS (
      SELECT * FROM m
      WHERE rn = 1 OR op IS DISTINCT FROM p_op
         OR e_et IS DISTINCT FROM p_et),
    v AS (
      SELECT user_id, op, e_et, seq AS valid_from,
             lead(seq) OVER (PARTITION BY user_id ORDER BY seq) AS valid_to
      FROM cp)
    SELECT user_id, e_et AS event_type, valid_from, valid_to,
           valid_to IS NULL AS is_current
    FROM v WHERE op = 'u'
"""


@query("q97_scd2_history", _Q97_SQL)
def q97(spark, sf_dir):
    from georef_ar_etl_spark.operators import scd

    ch = _t(spark, sf_dir, "events").select(
        "user_id",
        F.col("event_id").alias("seq"),
        F.when(F.col("event_type") == "signup", F.lit("d"))
        .otherwise(F.lit("u"))
        .alias("op"),
        "event_type",
    )
    return scd.scd2_history(
        ch, key_col="user_id", seq_col="seq", op_col="op",
        payload_cols=["event_type"],
    )


# ------------- q98: per-group HLL registers (approx distinct / group) ------
# Distinct users per event_type as GROUPED HyperLogLog register tables
# (sketches.py::hll_group_registers): fixed m=512-int state per group,
# map-side combinable, shard-mergeable — vs exact countDistinct's shuffle
# of every (group, user) pair. Register-EXACT oracle (the q81 md5/bin
# pattern, keyed); estimate accuracy is property-tested in pytest.
_Q98_SQL = """
    WITH h AS (
      SELECT event_type,
             (('0x' || substr(md5(user_id::VARCHAR), 1, 8))::UBIGINT
              % 2147483647)::BIGINT AS hv
      FROM events)
    SELECT event_type, hv % 512 AS bucket,
           max(CASE WHEN (hv >> 9) = 0 THEN 23
                    ELSE 23 - length(bin(hv >> 9)) END)::INTEGER AS r
    FROM h GROUP BY event_type, hv % 512
"""


@query("q98_hll_group_registers", _Q98_SQL)
def q98(spark, sf_dir):
    from georef_ar_etl_spark.operators import sketches

    ev = _t(spark, sf_dir, "events").select(
        "event_type", F.col("user_id").cast("string").alias("u")
    )
    return sketches.hll_group_registers(ev, "event_type", "u", p=9)


# ------------- q99: presence bitmap (engagement days per user) -------------
# Day-of-month activity per user packed into ONE long via bit_or(1 << d)
# (functions/bitmaps.py): 8 bytes of per-group state, map-side combinable,
# popcount cardinality — vs collect_set's per-group array. The
# engagement/retention primitive at 10^9 users.
_Q99_SQL = """
    SELECT user_id,
           bit_or((1::BIGINT) << (day(ts) - 1)) AS bitmap,
           bit_count(bit_or((1::BIGINT) << (day(ts) - 1)))::INTEGER AS n_set
    FROM events GROUP BY user_id
"""


@query("q99_presence_bitmap", _Q99_SQL)
def q99(spark, sf_dir):
    from georef_ar_etl_spark.functions.bitmaps import presence_bitmap

    ev = _t(spark, sf_dir, "events")
    return presence_bitmap(
        ev, ["user_id"], F.dayofmonth("ts") - 1, width=31
    )


# ------------- q100: Markov transition matrix over event streams -----------
# Per-user next-event transitions (temporal.py::transition_counts): one
# lead() window shuffle on user_id, then a (src, dst) hash aggregate
# bounded by |event_types|^2; probabilities normalize on that tiny frame,
# never on the stream. (ts, event_id) ordering makes ties deterministic.
_Q100_SQL = """
    WITH p AS (
      SELECT event_type AS src,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS dst
      FROM events),
    g AS (SELECT src, dst, count(*)::BIGINT AS n
          FROM p WHERE dst IS NOT NULL GROUP BY src, dst)
    SELECT src, dst, n,
           n::DOUBLE / (sum(n) OVER (PARTITION BY src))::DOUBLE AS p
    FROM g
"""


@query("q100_markov_transitions", _Q100_SQL)
def q100(spark, sf_dir):
    from georef_ar_etl_spark.operators import temporal

    return temporal.transition_counts(
        _t(spark, sf_dir, "events"),
        key_col="user_id",
        state_col="event_type",
        order_cols=["ts", "event_id"],
    )


# ------------- q101: exact heavy hitters (Misra-Gries + recount) -----------
# All tokens with count > n/50, EXACT, without a full-cardinality shuffle
# (sketches.py::heavy_hitters): per-partition weighted Misra-Gries via
# mapInPandas yields a guaranteed candidate SUPERSET (pigeonhole over the
# per-partition n_p/k bounds), then a broadcast-semi-join exact recount
# filters to the true answer — O(k) state per task vs O(vocabulary).
_Q101_SQL = r"""
    WITH toks AS (SELECT unnest(string_split_regex(lower(text), '\s+')) AS w
                  FROM documents),
    t AS (SELECT w FROM toks WHERE w <> ''),
    n AS (SELECT count(*) AS total FROM t)
    SELECT w AS item, count(*)::BIGINT AS cnt
    FROM t, n GROUP BY w, total HAVING count(*) * 50 > total
"""


@query("q101_heavy_hitters", _Q101_SQL)
def q101(spark, sf_dir):
    from georef_ar_etl_spark.operators import sketches

    toks = (
        _t(spark, sf_dir, "documents")
        .select(F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("w"))
        .filter(F.col("w") != "")
    )
    return sketches.heavy_hitters(toks, "w", k=50)


# ------------- q102: Z-order (Morton) clustering key ------------------------
# The multi-dimensional layout key behind Delta/Iceberg OPTIMIZE ZORDER
# (functions/layout.py::zorder_key): interleaving user and value bits makes
# per-file min/max zones tight in BOTH dimensions after range-clustering,
# so either predicate prunes files. Pure constant-folded shift/and/or
# arithmetic in whole-stage codegen — the oracle recomputes the interleave
# with a DuckDB list comprehension.
_Q102_SQL = """
    SELECT event_id,
           (list_sum([((x >> i) & 1) << (2 * i) for i in range(12)])
            + list_sum([((y >> i) & 1) << (2 * i + 1) for i in range(12)])
           )::BIGINT AS zkey
    FROM (SELECT event_id, user_id % 4096 AS x,
                 CAST(floor(value) AS BIGINT) % 4096 AS y
          FROM events)
"""


@query("q102_zorder_key", _Q102_SQL)
def q102(spark, sf_dir):
    from georef_ar_etl_spark.functions.layout import zorder_key

    ev = _t(spark, sf_dir, "events").select(
        "event_id",
        (F.col("user_id") % 4096).alias("x"),
        (F.floor("value").cast("long") % 4096).alias("y"),
    )
    return ev.select(
        "event_id", zorder_key([F.col("x"), F.col("y")], bits=12).alias("zkey")
    )


# ------------- q103: incremental SCD2 maintenance (changelog consumer) -----
# The history-preserving changelog consumer (index_maintenance.py::
# Scd2Index): the q24 engine replays its 4-batch derived log, and the SCD2
# index refreshes epoch-by-epoch from engine.changes() — closing versions
# by MOVING rows from the cur table to the append-only hist table, touching
# only the changed docs' buckets. The oracle folds the identical change
# stream (per-batch net valid events, normalized, bootstrap as epoch 0)
# through SQL-window SCD2: equality proves incremental == batch fold across
# inserts, updates, deletes, re-inserts and same-value re-emissions (which
# the changelog's event-based mode emits and the change-point compare must
# collapse). Version axis relabeled epoch->batch on the Spark side so the
# comparison is independent of internal epoch numbering.
_Q103_SQL = f"""
    WITH {_Q24_BASE_CTES},
    nets AS (
      SELECT (batch_id + 1)::BIGINT AS seq, doc_id, op, tokens, source
      FROM (SELECT *, row_number() OVER (PARTITION BY doc_id, batch_id
                                         ORDER BY seq DESC) AS rn
            FROM valid) WHERE rn = 1),
    nup AS (
      SELECT seq, doc_id, 'u' AS sop, nn[1:lastnz::int] AS tokens,
             lastnz::int AS n_tok, source
      FROM (
        SELECT seq, doc_id, nn,
               coalesce(list_max(list_transform(
                   generate_series(1, greatest(len(nn), 1)),
                   i -> CASE WHEN nn[i::int] <> 0 THEN i ELSE 0 END)), 0) AS lastnz,
               source
        FROM (SELECT seq, doc_id, list_filter(tokens, x -> x >= 0) AS nn, source
              FROM nets WHERE op <> 'delete'))),
    ndel AS (
      SELECT seq, doc_id, 'd' AS sop, CAST(NULL AS INT[]) AS tokens,
             CAST(NULL AS INT) AS n_tok, CAST(NULL AS VARCHAR) AS source
      FROM nets WHERE op = 'delete'),
    stream AS (
      SELECT doc_id, 0::BIGINT AS seq, 'u' AS sop, tokens, n_tok, source FROM init
      UNION ALL SELECT doc_id, seq, sop, tokens, n_tok, source FROM nup
      UNION ALL SELECT doc_id, seq, sop, tokens, n_tok, source FROM ndel),
    m AS (
      SELECT *, row_number() OVER w AS rn, lag(sop) OVER w AS p_op,
             lag(tokens) OVER w AS p_t, lag(n_tok) OVER w AS p_n,
             lag(source) OVER w AS p_s
      FROM stream WINDOW w AS (PARTITION BY doc_id ORDER BY seq)),
    cp AS (
      SELECT * FROM m
      WHERE rn = 1 OR sop IS DISTINCT FROM p_op
         OR tokens IS DISTINCT FROM p_t OR n_tok IS DISTINCT FROM p_n
         OR source IS DISTINCT FROM p_s),
    v AS (
      SELECT doc_id, sop, tokens, n_tok, source, seq AS valid_from,
             lead(seq) OVER (PARTITION BY doc_id ORDER BY seq) AS valid_to
      FROM cp)
    SELECT doc_id, md5(array_to_string(tokens, ',')) AS tokens_fp, n_tok,
           source, valid_from, valid_to, valid_to IS NULL AS is_current
    FROM v WHERE sop = 'u'
"""


@query("q103_scd2_incremental", _Q103_SQL)
def q103(spark, sf_dir):
    from pyspark.sql import types as T

    from georef_ar_etl_spark.engine import CdcEngine
    from georef_ar_etl_spark.operators.index_maintenance import Scd2Index

    initial, events = _q24_inputs(spark, sf_dir)
    root = _ephemeral_table_root("cdc_scd2_q103", sf_dir)
    eng = CdcEngine(spark, f"{root}/src", n_buckets=16)
    eng.bootstrap(initial)
    idx = Scd2Index(
        spark,
        f"{root}/scd2",
        [
            ("tokens", T.ArrayType(T.IntegerType(), True)),
            ("n_tok", T.IntegerType()),
            ("source", T.StringType()),
        ],
        n_buckets=8,
    )
    idx.bootstrap(eng.state(epoch=0), source_epoch=0)
    emap = {0: 0}
    for b in range(4):
        m = eng.apply_batch(events.filter(F.col("batch_id") == b), b)
        idx.refresh(eng.changes(idx.last_source_epoch, m["epoch"]), m["epoch"])
        emap[m["epoch"]] = b + 1
    relabel = F.create_map(
        *[F.lit(x).cast("long") for kv in emap.items() for x in kv]
    )
    h = idx.history()
    return h.select(
        "doc_id",
        F.md5(F.array_join(F.col("tokens").cast("array<string>"), ",")).alias(
            "tokens_fp"
        ),
        "n_tok",
        "source",
        relabel[F.col("valid_from")].alias("valid_from"),
        relabel[F.col("valid_to")].alias("valid_to"),
        "is_current",
    )


# ------------- q104: exact set-similarity join (prefix filtering) ----------
# AllPairs/PPJoin-family EXACT Jaccard self-join: no blocking key, no
# estimate — prefix filtering under the ascending-df global token order
# guarantees zero false negatives while the candidate join only ever
# touches each doc's rarest tokens (doc_dedup.py::set_similarity_join).
# The oracle is the brute-force all-pairs ground truth with the identical
# integer threshold (100·I ≥ pct·(La+Lb−I)), so the comparison proves the
# filter loses nothing.
_Q104_SQL = r"""
    WITH n AS (SELECT doc_id AS id,
                      trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS t
               FROM documents),
    s AS (SELECT id, list_distinct(list_transform(
            list_distinct(list_transform(
              generate_series(1, greatest(length(t) - 7, 1)),
              i -> substr(t, i::int, 8))),
            g -> (('0x' || substr(md5(g), 1, 15))::UBIGINT)::BIGINT)) AS toks
          FROM n),
    p AS (SELECT a.id AS id_a, b.id AS id_b,
                 len(list_intersect(a.toks, b.toks))::BIGINT AS i,
                 len(a.toks)::BIGINT AS la, len(b.toks)::BIGINT AS lb
          FROM s a JOIN s b ON a.id < b.id)
    SELECT id_a, id_b, round(i::DOUBLE / (la + lb - i), 6) AS jaccard
    FROM p WHERE 100 * i >= 80 * (la + lb - i)
"""


@query("q104_set_similarity_join", _Q104_SQL)
def q104(spark, sf_dir):
    return doc_dedup.set_similarity_join(
        _t(spark, sf_dir, "documents"), min_jaccard_pct=80, shingle_k=8
    )


# ------------- q105: triangle enumeration (compact-forward) ---------------
# Exact triangles of the q89 event-derived link graph, each {a,b,c} once
# with a<b<c. The Spark plan orients edges by (degree, node) so wedges are
# generated at the lowest-degree apex (O(m^1.5) bound, hub-skew safe —
# operators/graph.py::triangles); the oracle is the canonical three-way
# self-join on the id order, which enumerates the identical set.
_Q105_SQL = """
    WITH raw AS (SELECT user_id % 40 AS x, (user_id * 7 + event_id) % 50 AS y
                 FROM events),
    e AS (SELECT DISTINCT least(x, y) AS u, greatest(x, y) AS v
          FROM raw WHERE x <> y)
    SELECT e1.u AS a, e1.v AS b, e2.v AS c
    FROM e e1 JOIN e e2 ON e2.u = e1.v
              JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
"""


@query("q105_triangles", _Q105_SQL)
def q105(spark, sf_dir):
    from georef_ar_etl_spark.operators import graph

    ev = _t(spark, sf_dir, "events")
    e = ev.select(
        (F.col("user_id") % 40).alias("src"),
        ((F.col("user_id") * 7 + F.col("event_id")) % 50).alias("dst"),
    )
    return graph.triangles(e)


# ------------- q106: skyline / Pareto frontier -----------------------------
# Multi-criteria "best rows": maximize l_quantity while minimizing
# l_extendedprice. Spark runs the generic d-dim two-phase skyline
# (partition-local prune → bounded global prune, operators/skyline.py);
# the oracle exploits the 2-D special case exactly — per-quantity min
# price, surviving iff no strictly-higher quantity achieved ≤ price
# (running-min window) — so the generic operator is checked against an
# independent closed-form formulation, not itself.
_Q106_SQL = """
    WITH pts AS (SELECT DISTINCT l_quantity AS quantity,
                                 l_extendedprice AS price
                 FROM lineitem),
    m AS (SELECT quantity, min(price) AS price FROM pts GROUP BY quantity),
    w AS (SELECT quantity, price,
                 min(price) OVER (ORDER BY quantity DESC
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND 1 PRECEDING) AS better
          FROM m)
    SELECT quantity, price FROM w WHERE better IS NULL OR price < better
"""


@query("q106_skyline", _Q106_SQL)
def q106(spark, sf_dir):
    from georef_ar_etl_spark.operators.skyline import skyline

    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").alias("quantity"),
        F.col("l_extendedprice").alias("price"),
    )
    return skyline(li, {"quantity": "max", "price": "min"})


# ------------- q107: deterministic MLM token masking -----------------------
# The pretraining corruption step as a pure function of the data:
# position i masked iff md5(doc_id:i) mod 100 < 15 — reproducible across
# engines/retries/partitionings with no RNG state (text.py::mask_tokens).
# The oracle replays the identical md5 arithmetic per position.
_Q107_SQL = r"""
    WITH w AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '\s+'),
                         x -> x <> '') AS words
      FROM documents),
    t AS (
      SELECT doc_id,
             list_transform(words,
               x -> ((('0x' || substr(md5(x), 1, 8))::UBIGINT % 32768)::INT)
             ) AS ids
      FROM w),
    m AS (
      SELECT doc_id,
             list_transform(generate_series(1, len(ids)),
               i -> CASE WHEN ('0x' || substr(md5(doc_id::varchar || ':'
                                 || (i - 1)::varchar), 1, 8))::UBIGINT
                              % 100 < 15
                         THEN 32768 ELSE ids[i::int] END) AS masked
      FROM t)
    SELECT doc_id, md5(array_to_string(masked, ',')) AS masked_fp,
           len(list_filter(masked, x -> x = 32768))::BIGINT AS n_masked,
           len(masked)::BIGINT AS n_tok
    FROM m
"""


@query("q107_mask_tokens", _Q107_SQL)
def q107(spark, sf_dir):
    masked = text.mask_tokens(
        F.col("text"), F.col("doc_id"), vocab_size=32768, mask_pct=15
    )
    return _t(spark, sf_dir, "documents").select(
        "doc_id",
        _arr_fp(masked).alias("masked_fp"),
        F.size(F.filter(masked, lambda x: x == 32768)).cast("long").alias("n_masked"),
        F.size(masked).cast("long").alias("n_tok"),
    )


# ------------- q108: BPE merge-table training (iterative, rows-only) ------
# Tokenizer training as a distributed iterative job: one corpus pass for
# word counts, then every round runs on the VOCABULARY frame (pair count
# shuffle + single-row argmax to the driver) — text.py::bpe_merges. The
# merge table is a pure function of the corpus (deterministic tie-break
# count desc, left asc, right asc). Iterative argmax is not
# SQL-expressible, so this entry is rows-only for the driver;
# tests/test_bpe_skyline.py pins it against a pure-Python Sennrich
# reference (merge table AND encode), including the greedy-non-overlap
# chain semantics.
@query("q108_bpe_merges")
def q108(spark, sf_dir):
    return text.bpe_merges(
        _t(spark, sf_dir, "documents"), n_merges=10, min_pair_count=2
    )


# ------------- q109: golden-record survivorship ----------------------------
# Per-COLUMN latest-non-null consolidation (MDM golden record): sparse
# attributes derived from the event stream (value only on non-view events,
# props only on purchases) merge independently per attribute — one
# map-side-combinable max(struct) aggregate, no window
# (scd.py::golden_record). The oracle mirrors the identical
# null-gated struct-max on the same (ts, event_id) total order.
_Q109_SQL = """
    WITH e AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN event_type <> 'view' THEN value END AS sparse_value,
             CASE WHEN event_type = 'purchase' THEN props END AS purchase_props
      FROM events)
    SELECT user_id,
           (max(struct_pack(ts := ts, eid := event_id, v := event_type))).v
             AS last_type,
           (max(CASE WHEN sparse_value IS NOT NULL THEN
                struct_pack(ts := ts, eid := event_id, v := sparse_value) END)).v
             AS last_value,
           (max(CASE WHEN purchase_props IS NOT NULL THEN
                struct_pack(ts := ts, eid := event_id, v := purchase_props) END)).v
             AS last_purchase_props
    FROM e GROUP BY user_id
"""


@query("q109_golden_record", _Q109_SQL)
def q109(spark, sf_dir):
    from georef_ar_etl_spark.operators.scd import golden_record

    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.when(F.col("event_type") != "view", F.col("value")).alias(
            "sparse_value"
        ),
        F.when(F.col("event_type") == "purchase", F.col("props")).alias(
            "purchase_props"
        ),
    )
    return golden_record(
        ev,
        key_cols=["user_id"],
        order_cols=["ts", "event_id"],
        value_cols=["event_type", "sparse_value", "purchase_props"],
    ).select(
        "user_id",
        F.col("event_type").alias("last_type"),
        F.col("sparse_value").alias("last_value"),
        F.col("purchase_props").alias("last_purchase_props"),
    )


# ------------- q110: BPE pair statistics (training iteration 0) -----------
# The oracled slice of the q108 training loop: adjacent-symbol pair counts
# weighted by word frequency, top 25 by (count desc, left, right) — the
# exact aggregate each BPE round runs (and the deterministic argmax rule
# the driver-side loop collects one row of). DuckDB mirrors the
# chars+'</w>' symbolization with the same tie-break, so the iterative
# operator's building block is hash-verified even though the full loop
# (q108) is only rows-checked.
_Q110_SQL = r"""
    WITH w AS (
      SELECT word, count(*)::BIGINT AS cnt
      FROM (SELECT unnest(string_split_regex(lower(text), '\s+')) AS word
            FROM documents)
      WHERE word <> '' GROUP BY word),
    syms AS (
      SELECT list_append(string_split(word, ''), '</w>') AS s, cnt FROM w),
    pairs AS (
      SELECT s[i::int] AS left_sym, s[(i + 1)::int] AS right_sym, cnt
      FROM syms, unnest(generate_series(1, len(s) - 1)) AS t(i)
      WHERE len(s) > 1)
    SELECT left_sym, right_sym, sum(cnt)::BIGINT AS pair_count
    FROM pairs GROUP BY left_sym, right_sym
    ORDER BY pair_count DESC, left_sym, right_sym
    LIMIT 25
"""


@query("q110_bpe_pair_counts", _Q110_SQL)
def q110(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    words = (
        d.select(F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    syms = words.select(
        F.concat(F.split(F.col("w"), ""), F.array(F.lit("</w>"))).alias("s"),
        "cnt",
    )
    pairs = syms.select(
        F.explode(
            F.when(
                F.size("s") > 1,
                F.transform(
                    F.sequence(F.lit(1), F.size("s") - 1),
                    lambda i: F.struct(
                        F.element_at("s", i).alias("l"),
                        F.element_at("s", i + 1).alias("r"),
                    ),
                ),
            ).otherwise(F.array().cast("array<struct<l:string,r:string>>"))
        ).alias("p"),
        "cnt",
    )
    return (
        pairs.groupBy(
            F.col("p.l").alias("left_sym"), F.col("p.r").alias("right_sym")
        )
        .agg(F.sum("cnt").alias("pair_count"))
        .orderBy(F.desc("pair_count"), "left_sym", "right_sym")
        .limit(25)
    )


# ------------- q111: k-core decomposition (graph peeling) -----------------
# The classic link-graph pruning pass (Seidman 1983): keep the unique
# maximal subgraph of minimum degree >= k. Bulk simultaneous peeling is
# CONFLUENT — the fixpoint is independent of removal order — so a DuckDB
# oracle that unrolls a fixed number of peel rounds as chained CTEs equals
# the Spark operator's converge-with-detection result exactly, provided the
# unroll covers the peeling depth (extra rounds are no-ops at fixpoint; the
# Spark side raises loudly past max_rounds, so a silent mismatch cannot
# ship). The event-derived graph mixes a dense 60-node kernel (every 4th
# edge) into a sparse 1499-node fringe: at sf0.01 k=9 peels for 17 rounds
# before the fixpoint — a real iterative workload, not a one-shot filter.
def _q111_sql(k: int = 9, rounds: int = 24) -> str:
    parts = [
        """
    raw AS (SELECT event_id % 1499 AS s,
                   (event_id * 31 + user_id)
                     % (CASE WHEN event_id % 4 = 0 THEN 60 ELSE 1499 END) AS d
            FROM events),
    e0 AS MATERIALIZED (SELECT DISTINCT least(s, d) AS u, greatest(s, d) AS v
           FROM raw WHERE s <> d)"""
    ]
    # each CTE is referenced twice downstream — MATERIALIZED keeps DuckDB
    # from inlining the chain (2^rounds plan blowup otherwise)
    prev = "e0"
    for i in range(1, rounds + 1):
        parts.append(f"""
    d{i} AS MATERIALIZED (SELECT node, count(*) AS c
             FROM (SELECT u AS node FROM {prev}
                   UNION ALL SELECT v FROM {prev})
             GROUP BY 1),
    e{i} AS MATERIALIZED (SELECT e.u, e.v FROM {prev} e
             JOIN d{i} a ON a.node = e.u AND a.c >= {k}
             JOIN d{i} b ON b.node = e.v AND b.c >= {k})""")
        prev = f"e{i}"
    return (
        "    WITH" + ",".join(parts)
        + f"""
    SELECT node, count(*)::BIGINT AS core_deg
    FROM (SELECT u AS node FROM {prev} UNION ALL SELECT v FROM {prev})
    GROUP BY 1"""
    )


@query("q111_k_core", _q111_sql())
def q111(spark, sf_dir):
    from georef_ar_etl_spark.operators import graph

    ev = _t(spark, sf_dir, "events")
    e = ev.select(
        (F.col("event_id") % 1499).alias("src"),
        (
            (F.col("event_id") * 31 + F.col("user_id"))
            % F.when(F.col("event_id") % 4 == 0, F.lit(60)).otherwise(F.lit(1499))
        ).alias("dst"),
    )
    return graph.k_core(e, k=9, max_rounds=24)


# ------------- q112: HLL set algebra (shingle-vocabulary overlap) ---------
# Sketch-level set operations off PERSISTED registers: the even-source and
# odd-source halves of the corpus each sketch their 8-char shingle
# vocabulary once (p=6 -> 64 ints of state per side), then |A|, |B|,
# |A∪B| (register-max merge) and |A∩B| (inclusion-exclusion) come from
# three tiny aggregates — the corpus-overlap question at 100 TB without
# ever joining shingle sets. ESTIMATES are hash-oracled, not just
# registers (q81/q98 do those): the 2^-r terms are exact powers of two,
# so the harmonic sums are bit-identical across engines under any
# summation order / partitioning.
def _q112_sql(p: int = 6) -> str:
    m = 1 << p
    maxp1 = 31 - p + 1
    amm = repr((0.7213 / (1 + 1.079 / m)) * m * m)

    def est(regs: str, alias: str) -> str:
        return f"""{alias} AS (
      SELECT CASE WHEN raw <= {2.5 * m} AND zeros > 0
                  THEN {float(m)!r} * ln({float(m)!r} / zeros)
                  ELSE raw END AS {alias}
      FROM (SELECT {amm} / (sum(1.0 / (1::BIGINT << r)) + ({m} - count(*))) AS raw,
                   {m} - count(*) AS zeros
            FROM {regs}))"""

    reg = (
        f"SELECT hv % {m} AS bucket,\n"
        f"             max(CASE WHEN (hv >> {p}) = 0 THEN {maxp1}\n"
        f"                      ELSE {maxp1} - length(bin(hv >> {p})) END) AS r\n"
        "      FROM h WHERE side = {side} GROUP BY 1"
    )
    return rf"""
    WITH t AS (
      SELECT substr(source, 4)::INT % 2 AS side, lower(text) AS s
      FROM documents),
    g AS (SELECT side,
                 unnest(list_transform(generate_series(1, length(s) - 7),
                                       i -> substr(s, i, 8))) AS tok
          FROM t WHERE length(s) >= 8),
    h AS (SELECT side,
                 (('0x' || substr(md5(tok), 1, 8))::UBIGINT
                  % 2147483647)::BIGINT AS hv
          FROM g),
    ra AS ({reg.format(side=0)}),
    rb AS ({reg.format(side=1)}),
    ru AS (SELECT bucket, max(r) AS r
           FROM (SELECT * FROM ra UNION ALL SELECT * FROM rb) GROUP BY 1),
    {est("ra", "est_a")},
    {est("rb", "est_b")},
    {est("ru", "est_union")}
    SELECT round(est_a, 4) AS est_a, round(est_b, 4) AS est_b,
           round(est_union, 4) AS est_union,
           round(est_a + est_b - est_union, 4) AS est_intersect
    FROM est_a, est_b, est_union
"""


@query("q112_hll_set_algebra", _q112_sql())
def q112(spark, sf_dir):
    from georef_ar_etl_spark.operators import sketches

    shingles = (
        _t(spark, sf_dir, "documents")
        .select(
            (F.substring("source", 4, 10).cast("int") % 2).alias("side"),
            F.lower("text").alias("s"),
        )
        .filter(F.length("s") >= 8)
        .select(
            "side",
            F.explode(
                # sequence(1, 0) DESCENDS in Spark — the length filter
                # above guarantees at least one shingle
                F.expr("transform(sequence(1, length(s) - 7),"
                       " i -> substring(s, i, 8))")
            ).alias("tok"),
        )
    )
    ra = sketches.hll_registers(shingles.filter(F.col("side") == 0), "tok", p=6)
    rb = sketches.hll_registers(shingles.filter(F.col("side") == 1), "tok", p=6)
    out = sketches.hll_set_algebra(ra, rb, p=6)
    return out.select(
        *[F.round(c, 4).alias(c) for c in
          ("est_a", "est_b", "est_union", "est_intersect")]
    )


# ------------- q113: referential-integrity audit (FK orphan report) -------
# The reference's per-row FK existence check (departments.py:120-123)
# lifted to the set level: one report row per relation with total / null-
# key / orphan counts. The first relation INJECTS violations so the audit
# paths are exercised, not vacuously zero: the customer dim is restricted
# to non-BUILDING segments (real orphans) and every 1000th order's key is
# nulled (real null-key rows); the lineitem relations are the clean case.
_Q113_SQL = """
    WITH ofact AS (
      SELECT CASE WHEN o_orderkey % 1000 = 0 THEN NULL
                  ELSE o_custkey END AS k
      FROM orders),
    cdim AS (SELECT DISTINCT c_custkey AS k FROM customer
             WHERE c_mktsegment <> 'BUILDING'),
    lfact AS (
      SELECT l_orderkey AS k1,
             CASE WHEN l_linenumber = 6 THEN NULL
                  WHEN l_linenumber = 7 THEN l_partkey + 100000
                  ELSE l_partkey END AS k2
      FROM lineitem),
    ldim AS (SELECT DISTINCT l_orderkey AS k1, l_partkey AS k2 FROM lineitem)
    SELECT 'orders->customer_non_building' AS relation,
           (SELECT count(*) FROM ofact) AS n_rows,
           (SELECT count(*) FROM ofact WHERE k IS NULL) AS n_null_key,
           (SELECT count(*) FROM ofact f WHERE k IS NOT NULL
              AND NOT EXISTS (SELECT 1 FROM cdim d WHERE d.k = f.k))
             AS n_orphan_rows,
           (SELECT count(DISTINCT k) FROM ofact f WHERE k IS NOT NULL
              AND NOT EXISTS (SELECT 1 FROM cdim d WHERE d.k = f.k))
             AS n_orphan_keys
    UNION ALL
    SELECT 'lineitem->orders',
           (SELECT count(*) FROM lineitem),
           (SELECT count(*) FROM lineitem WHERE l_orderkey IS NULL),
           (SELECT count(*) FROM lineitem l WHERE l_orderkey IS NOT NULL
              AND NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_orderkey = l.l_orderkey)),
           (SELECT count(DISTINCT l_orderkey) FROM lineitem l
            WHERE l_orderkey IS NOT NULL
              AND NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_orderkey = l.l_orderkey))
    UNION ALL
    SELECT 'lineitem_perturbed->order_part_pairs',
           (SELECT count(*) FROM lfact),
           (SELECT count(*) FROM lfact WHERE k1 IS NULL OR k2 IS NULL),
           (SELECT count(*) FROM lfact f
            WHERE k1 IS NOT NULL AND k2 IS NOT NULL
              AND NOT EXISTS (SELECT 1 FROM ldim d
                              WHERE d.k1 = f.k1 AND d.k2 = f.k2)),
           (SELECT count(DISTINCT (k1, k2)) FROM lfact f
            WHERE k1 IS NOT NULL AND k2 IS NOT NULL
              AND NOT EXISTS (SELECT 1 FROM ldim d
                              WHERE d.k1 = f.k1 AND d.k2 = f.k2))
"""


@query("q113_fk_audit", _Q113_SQL)
def q113(spark, sf_dir):
    from georef_ar_etl_spark.operators.validate import fk_audit

    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    lineitem = _t(spark, sf_dir, "lineitem")
    ofact = orders.select(
        F.when(F.col("o_orderkey") % 1000 == 0, F.lit(None))
        .otherwise(F.col("o_custkey"))
        .alias("fk_cust")
    )
    cdim = customer.filter(F.col("c_mktsegment") != "BUILDING")
    # composite-key relation over a LINEAR-size dim (never a cross
    # product): perturbed (order, part) pairs audited against the real
    # pair set — line 7 rows become orphans, line 6 rows null keys
    lfact = lineitem.select(
        F.col("l_orderkey").alias("k1"),
        F.when(F.col("l_linenumber") == 6, F.lit(None).cast("long"))
        .when(F.col("l_linenumber") == 7, F.col("l_partkey") + 100000)
        .otherwise(F.col("l_partkey"))
        .alias("k2"),
    )
    ldim = lineitem.select(
        F.col("l_orderkey").alias("k1"), F.col("l_partkey").alias("k2")
    )
    return fk_audit(
        [
            (
                "orders->customer_non_building",
                ofact, ["fk_cust"], cdim, ["c_custkey"],
            ),
            ("lineitem->orders", lineitem, ["l_orderkey"], orders, ["o_orderkey"]),
            (
                "lineitem_perturbed->order_part_pairs",
                lfact, ["k1", "k2"], ldim, ["k1", "k2"],
            ),
        ]
    )


# ------------- q114: interpolated bigram LM score --------------------------
# The bigram rung of the CCNet perplexity-filter ladder (q52 is the
# unigram rung): Jelinek-Mercer interpolation of the ML bigram with the
# add-one unigram floor. lam = 0.75 is an exact binary fraction, so the
# probability arithmetic is bit-identical across engines; the per-doc avg
# + round(4) follows the q52 precedent.
_Q114_SQL = r"""
    WITH w AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '\s+'),
                         x -> x <> '') AS ws
      FROM documents),
    toks AS (SELECT doc_id, unnest(ws) AS tok FROM w),
    uni AS (SELECT tok, count(*) AS c1 FROM toks GROUP BY tok),
    tot AS (SELECT sum(c1) AS N, count(*) AS V FROM uni),
    pairs AS (
      SELECT doc_id, ws[i::int] AS w1, ws[(i + 1)::int] AS w2
      FROM w, unnest(generate_series(1, len(ws) - 1)) AS t(i)
      WHERE len(ws) >= 2),
    big AS (SELECT w1, w2, count(*) AS c2 FROM pairs GROUP BY 1, 2),
    sc AS (
      SELECT p.doc_id,
             avg(-ln(0.75 * b.c2 / u1.c1
                     + 0.25 * (u2.c1 + 1) / (tot.N + tot.V))) AS s
      FROM pairs p
      JOIN big b USING (w1, w2)
      JOIN uni u1 ON u1.tok = p.w1
      JOIN uni u2 ON u2.tok = p.w2
      CROSS JOIN tot
      GROUP BY p.doc_id)
    SELECT d.doc_id, round(sc.s, 4) AS bigram_score
    FROM documents d LEFT JOIN sc USING (doc_id)
"""


@query("q114_bigram_lm_score", _Q114_SQL)
def q114(spark, sf_dir):
    return text.bigram_lm_score(_t(spark, sf_dir, "documents"))


# ------------- q115: data-quality expectations report ----------------------
# The dbt-tests / Great-Expectations contract as ONE aggregate pass: every
# metric folds into a single map-side-combined aggregation over the input;
# the report assembles from the pinned 1-row result. The contract is
# deliberately mixed: passing rows AND failing rows (the too-tight balance
# range, the incomplete segment set), so both verdict paths are oracled.
_Q115_SQL = """
    WITH m AS (
      SELECT count(*) AS n,
             count(CASE WHEN c_custkey IS NULL THEN 1 END) AS null_key,
             count(DISTINCT c_custkey) AS d_key,
             count(c_custkey) AS nn_key,
             count(CASE WHEN c_acctbal IS NOT NULL
                         AND (c_acctbal < 0.0 OR c_acctbal > 8000.0)
                        THEN 1 END) AS bal_viol,
             count(CASE WHEN c_mktsegment IS NOT NULL
                         AND c_mktsegment NOT IN
                             ('BUILDING', 'AUTOMOBILE', 'MACHINERY')
                        THEN 1 END) AS seg_viol
      FROM customer)
    SELECT 'not_null' AS expectation, 'c_custkey' AS col_name,
           round(null_key / greatest(n, 1), 6)::DOUBLE AS observed,
           NULL::DOUBLE AS lo, 0.0 AS hi,
           round(null_key / greatest(n, 1), 6) <= 0.0 AS passed
    FROM m
    UNION ALL
    SELECT 'unique', 'c_custkey', (nn_key - d_key)::DOUBLE,
           NULL::DOUBLE, 0.0, (nn_key - d_key) <= 0 FROM m
    UNION ALL
    SELECT 'range', 'c_acctbal', bal_viol::DOUBLE,
           0.0, 8000.0, bal_viol = 0 FROM m
    UNION ALL
    SELECT 'in_set', 'c_mktsegment', seg_viol::DOUBLE,
           NULL::DOUBLE, 0.0, seg_viol <= 0 FROM m
    UNION ALL
    SELECT 'row_count', NULL, n::DOUBLE,
           1.0, 9007199254740992.0, n >= 1 FROM m
"""


@query("q115_expectations", _Q115_SQL)
def q115(spark, sf_dir):
    from georef_ar_etl_spark.operators.validate import expect_report

    return expect_report(
        _t(spark, sf_dir, "customer"),
        [
            ("not_null", "c_custkey", {"max_null_frac": 0.0}),
            ("unique", "c_custkey", {}),
            ("range", "c_acctbal", {"min": 0.0, "max": 8000.0}),
            (
                "in_set",
                "c_mktsegment",
                {"values": ["BUILDING", "AUTOMOBILE", "MACHINERY"]},
            ),
            ("row_count", None, {"min": 1}),
        ],
    )


# ------------- q116: robust MAD outlier flags (Hampel filter) --------------
# Median/MAD instead of mean/stddev: a 50% breakdown point, so the fences
# stand even when the outliers being hunted contaminate the stats. Both
# stats round to 6 decimals BEFORE the |x-med| > 3·mad comparison, making
# the boolean bit-stable across engines (Spark percentile and DuckDB
# median interpolate with different-but-equal-to-6-places arithmetic).
_Q116_SQL = """
    WITH med AS (
      SELECT event_type, round(median(value), 6) AS med
      FROM events GROUP BY 1),
    mad AS (
      SELECT e.event_type, round(median(abs(e.value - m.med)), 6) AS mad
      FROM events e JOIN med m USING (event_type) GROUP BY 1)
    SELECT e.event_id, e.event_type, e.value, m.med, d.mad,
           abs(e.value - m.med) > 3.0 * d.mad AS is_outlier
    FROM events e
    JOIN med m USING (event_type)
    JOIN mad d USING (event_type)
"""


@query("q116_mad_outliers", _Q116_SQL)
def q116(spark, sf_dir):
    from georef_ar_etl_spark.operators import sketches

    return sketches.mad_outliers(
        _t(spark, sf_dir, "events"), "event_type", "value", ["event_id"], k=3.0
    )


# ------------- q117: sorted-neighborhood entity matching -------------------
# The OTHER classic ER blocking strategy next to q73's equi-key blocks
# (Hernández & Stolfo): global sort by the dirty name + fixed sliding
# window. Every 3rd customer gets a deterministic one-character-deletion
# twin (id + 1,000,000) — the typo lands lexicographically next to its
# original, where any exact block key would separate them. The Spark rank
# is the scalable two-phase global index (with_global_rank), never a
# single-task ORDER BY window; the oracle uses DuckDB's plain window.
_Q117_SQL = """
    WITH base AS (SELECT c_custkey AS id, c_name AS nm FROM customer),
    pert AS (
      SELECT c_custkey + 1000000 AS id,
             concat(substr(c_name, 1, (c_custkey % 18)::INT),
                    substr(c_name, (c_custkey % 18)::INT + 2, 18)) AS nm
      FROM customer WHERE c_custkey % 3 = 0),
    u AS (SELECT * FROM base UNION ALL SELECT * FROM pert),
    r AS (SELECT id, nm, row_number() OVER (ORDER BY nm, id) AS rn FROM u),
    p AS (SELECT a.id AS ida, b.id AS idb,
                 levenshtein(a.nm, b.nm) AS dist
          FROM r a JOIN r b ON b.rn - a.rn BETWEEN 1 AND 3)
    SELECT least(ida, idb) AS id_a, greatest(ida, idb) AS id_b,
           dist::INTEGER AS dist
    FROM p WHERE dist <= 2
"""


@query("q117_sorted_neighborhood", _Q117_SQL)
def q117(spark, sf_dir):
    from georef_ar_etl_spark.operators.entity_match import (
        sorted_neighborhood_pairs,
    )

    c = _t(spark, sf_dir, "customer")
    base = c.select(F.col("c_custkey").alias("id"), F.col("c_name").alias("nm"))
    pert = c.filter(F.col("c_custkey") % 3 == 0).select(
        (F.col("c_custkey") + 1000000).alias("id"),
        F.concat(
            F.expr("substr(c_name, 1, (c_custkey % 18)::INT)"),
            F.expr("substr(c_name, (c_custkey % 18)::INT + 2, 18)"),
        ).alias("nm"),
    )
    return sorted_neighborhood_pairs(
        base.unionByName(pert), "id", "nm", window=4, max_dist=2
    )


# ------------- q118: deterministic negative sampling -----------------------
# Contrastive-training negatives (triplet/InfoNCE prep): k pseudo-random
# non-self partners per document, a pure function of the data — partner j
# of doc d is 1 + md5(d:j:seed) mod N in the corpus's doc_id order, self
# hits stepped to the next rank so the output is EXACTLY k·N rows. Same
# no-RNG-state determinism rule as q107 masking / q32 hash split; the
# Spark side ranks with the scalable two-phase global index.
_Q118_SQL = """
    WITH r AS (
      SELECT doc_id, row_number() OVER (ORDER BY doc_id) AS rn
      FROM documents),
    nn AS (SELECT count(*) AS n FROM r),
    p AS (
      SELECT r.doc_id, r.rn, t.j,
             (('0x' || substr(md5(concat(r.doc_id, ':', t.j::VARCHAR, ':7')),
                              1, 8))::UBIGINT
              % 2147483647)::BIGINT % nn.n + 1 AS nr0
      FROM r CROSS JOIN nn, unnest([1, 2, 3, 4]) AS t(j)),
    q AS (
      SELECT p.doc_id, p.j,
             CASE WHEN p.nr0 = p.rn THEN p.nr0 % nn.n + 1 ELSE p.nr0 END AS nr
      FROM p CROSS JOIN nn)
    SELECT q.doc_id, q.j AS neg_rank_j, r2.doc_id AS neg_id
    FROM q JOIN r r2 ON r2.rn = q.nr
"""


@query("q118_negative_samples", _Q118_SQL)
def q118(spark, sf_dir):
    from georef_ar_etl_spark.operators import corpus

    return corpus.negative_samples(
        _t(spark, sf_dir, "documents"), "doc_id", k=4, seed=7
    )


# ------------- q119: quantile feature discretization (grouped ntile) -------
# Equal-frequency binning of a measure into n quantile buckets per group —
# the feature-discretization step before bucketed embeddings / monotonic
# feature audits. ntile is RANK-defined (bucket = position in the group's
# total order, never value interpolation), so with a total ORDER BY
# (value, id) the bucket assignment is bit-identical across engines; NULL
# measures are excluded first (Spark orders NULLs first inside ntile,
# DuckDB last — exclusion pins the contract instead of the engines'
# defaults).
_Q119_SQL = """
    SELECT event_id, event_type, value,
           ntile(8) OVER (PARTITION BY event_type
                          ORDER BY value, event_id) AS vbin
    FROM events WHERE value IS NOT NULL
"""


@query("q119_quantile_binning", _Q119_SQL)
def q119(spark, sf_dir):
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    return (
        _t(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "event_id", "event_type", "value",
            F.ntile(8).over(w).alias("vbin"),
        )
    )


# ------------- q120: duplicated n-gram span coverage ------------------------
# Exact-substring dedup DIAGNOSTICS (Lee et al. 2022): the fraction of each
# document covered by 8-token n-grams that also occur in another document.
# Grams hash to 60-bit ints before the shuffle (q104's trick — the oracle
# applies the identical hash, so verification stays exact); the per-doc
# coverage is an interval-union folded INSIDE an array aggregate:
# consecutive duplicated starts s_j cover min(k, s_{j+1}-s_j) new tokens.
_Q120_SQL = r"""
    WITH w AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '\s+'),
                         x -> x <> '') AS ws
      FROM documents),
    g AS (
      SELECT doc_id, i AS s,
             (('0x' || substr(md5(array_to_string(
                 list_slice(ws, i, i + 7), ' ')), 1, 15))::UBIGINT)::BIGINT AS g
      FROM w, unnest(generate_series(1, len(ws) - 7)) AS t(i)
      WHERE len(ws) >= 8),
    dup AS (SELECT g FROM g GROUP BY g HAVING count(DISTINCT doc_id) > 1),
    st AS (
      SELECT doc_id, list_sort(list(DISTINCT s)) AS ss
      FROM g WHERE g IN (SELECT g FROM dup)
      GROUP BY doc_id),
    cov AS (
      SELECT doc_id,
             CASE WHEN len(ss) = 1 THEN 8
                  ELSE list_sum(list_transform(
                         generate_series(1, len(ss) - 1),
                         j -> least(ss[(j + 1)::int] - ss[j::int], 8))) + 8
             END AS covered
      FROM st)
    SELECT w.doc_id, len(ws)::BIGINT AS n_tok,
           coalesce(cov.covered, 0)::BIGINT AS dup_tokens,
           round(coalesce(cov.covered, 0) / greatest(len(ws), 1), 6)::DOUBLE
             AS dup_frac
    FROM w LEFT JOIN cov USING (doc_id)
"""


@query("q120_dup_span_coverage", _Q120_SQL)
def q120(spark, sf_dir):
    return text.dup_span_stats(_t(spark, sf_dir, "documents"), k=8)


# ------------- q121: link prediction (common-neighbor / Adamic-Adar) -------
# Missing-link scoring over the event-derived interaction graph: every
# non-adjacent pair sharing >= 2 neighbors, with common-neighbor,
# Adamic-Adar and resource-allocation scores. Hub apexes above deg 30 are
# dropped from wedge enumeration (the stop-list skew cap, q40's
# discipline); per-term doubles are quantized to decimal BEFORE the group
# sum so the score is bit-identical under any summation order (q01 rule).
_Q121_SQL = """
    WITH e0 AS (
      SELECT DISTINCT least(s, d) AS u, greatest(s, d) AS v FROM (
        SELECT event_id % 300 AS s, (event_id * 13 + user_id) % 350 AS d
        FROM events) WHERE s <> d),
    adj AS (SELECT u AS w, v AS n FROM e0 UNION ALL SELECT v, u FROM e0),
    deg AS (SELECT w, count(*) AS deg FROM adj GROUP BY w),
    apex AS (SELECT adj.w, adj.n, deg.deg FROM adj JOIN deg USING (w)
             WHERE deg.deg <= 30),
    wedge AS (
      SELECT a1.n AS a, a2.n AS b, a1.deg AS wdeg
      FROM apex a1 JOIN apex a2 ON a1.w = a2.w AND a1.n < a2.n),
    nonadj AS (
      SELECT * FROM wedge WHERE NOT EXISTS (
        SELECT 1 FROM e0 WHERE e0.u = wedge.a AND e0.v = wedge.b))
    SELECT a, b, count(*) AS common,
           cast(round(sum(round(1.0 / ln(wdeg::DOUBLE), 9)::DECIMAL(18,9)), 6)
                AS double) AS aa_score,
           cast(round(sum(round(1.0 / wdeg::DOUBLE, 9)::DECIMAL(18,9)), 6)
                AS double) AS ra_score
    FROM nonadj GROUP BY a, b HAVING count(*) >= 2
"""


@query("q121_link_prediction", _Q121_SQL)
def q121(spark, sf_dir):
    from georef_ar_etl_spark.operators import graph

    ev = _t(spark, sf_dir, "events")
    e = ev.select(
        (F.col("event_id") % 300).alias("src"),
        ((F.col("event_id") * 13 + F.col("user_id")) % 350).alias("dst"),
    )
    return graph.link_prediction(e, max_degree=30, min_common=2)


# ------------- q122: PSI distribution-drift report --------------------------
# Population stability index between two snapshots of the event stream
# (first half-month = reference, second half with a 1.2x value drift
# injected = current): fixed-width bins over [0, 200), Laplace-smoothed
# proportions, per-bin PSI terms decimal-quantized before the total (q01
# rule). The MLOps "did the feature distribution move" audit between two
# table versions — the natural consumer of SnapshotTable.state(epoch=..)
# pairs.
_Q122_SQL = """
    WITH src AS (
      SELECT 'ref' AS side, value AS v FROM events
      WHERE ts < TIMESTAMP '2024-01-16 00:00:00'
      UNION ALL
      SELECT 'cur', value * 1.2 FROM events
      WHERE ts >= TIMESTAMP '2024-01-16 00:00:00'),
    bn AS (
      SELECT side,
             CASE WHEN v < 0 THEN 0 WHEN v >= 200 THEN 9
                  ELSE floor((v - 0.0) * 10 / (200.0 - 0.0))::INT END AS bin
      FROM src WHERE v IS NOT NULL),
    c AS (
      SELECT bin,
             count(*) FILTER (side = 'ref') AS ref_n,
             count(*) FILTER (side = 'cur') AS cur_n
      FROM bn GROUP BY bin),
    spine AS (SELECT unnest(generate_series(0, 9))::INT AS bin),
    f AS (SELECT spine.bin, coalesce(ref_n, 0) AS ref_n,
                 coalesce(cur_n, 0) AS cur_n
          FROM spine LEFT JOIN c USING (bin)),
    t AS (SELECT f.*,
                 (ref_n + 1)::DOUBLE / (sum(ref_n) OVER () + 10) AS p,
                 (cur_n + 1)::DOUBLE / (sum(cur_n) OVER () + 10) AS q
          FROM f),
    e AS (SELECT bin, ref_n, cur_n, p, q,
                 round((p - q) * ln(p / q), 9)::DECIMAL(18,9) AS term
          FROM t)
    SELECT bin, ref_n, cur_n,
           round(p, 6) AS p_ref, round(q, 6) AS p_cur,
           round(term, 6)::DOUBLE AS psi_term,
           round(sum(term) OVER (), 6)::DOUBLE AS psi_total,
           round(sum(term) OVER (), 6) > 0.2 AS drifted
    FROM e
"""


@query("q122_psi_drift", _Q122_SQL)
def q122(spark, sf_dir):
    from georef_ar_etl_spark.operators.validate import psi_report

    ev = _t(spark, sf_dir, "events")
    cutoff = F.lit("2024-01-16 00:00:00").cast("timestamp")
    ref = ev.filter(F.col("ts") < cutoff)
    cur = ev.filter(F.col("ts") >= cutoff).withColumn(
        "value", F.col("value") * 1.2
    )
    return psi_report(ref, cur, "value", lo=0.0, hi=200.0, n_bins=10)


# ------------- q123: gaps-and-islands state runs ----------------------------
# Run-length encoding of each user's event-type sequence (ordered by
# event_id): maximal runs of the same type, with length and boundary ids.
# Island id = rn(key) - rn(key, state) — constant within a run, distinct
# across runs; both windows share one shuffle. The VALUE-change complement
# of q53's TIME-gap sessionization.
_Q123_SQL = """
    WITH r AS (
      SELECT user_id, event_type, event_id,
             row_number() OVER (PARTITION BY user_id ORDER BY event_id)
             - row_number() OVER (PARTITION BY user_id, event_type
                                  ORDER BY event_id) AS island
      FROM events)
    SELECT user_id, event_type AS state,
           count(*) AS run_len,
           min(event_id) AS run_start, max(event_id) AS run_end
    FROM r GROUP BY user_id, event_type, island
"""


@query("q123_state_runs", _Q123_SQL)
def q123(spark, sf_dir):
    from georef_ar_etl_spark.operators.temporal import state_runs

    return state_runs(
        _t(spark, sf_dir, "events"), "user_id", "event_id", "event_type"
    )


# ------------- q124: ±1 random projection (JL sketch) -----------------------
# Project the 64-d embeddings to 8 components with a deterministic
# Achlioptas ±1 matrix (md5-parity signs, no RNG state) — the cheap
# dimensionality sketch that narrows every downstream similarity pass 8x
# before full-space verification. Long-form output (vec_id, j, comp);
# the oracle regenerates the IDENTICAL matrix from the same hash rule
# and inlines it as literals (the q19 hyperplane pattern). Both engines
# fold the dot product left-to-right over the array, so the rounded
# component is bit-identical (q18 precedent).
def _q124_sql(dim: int = 64, out_dim: int = 8, seed: int = 7) -> str:
    import math

    signs = similarity.jl_signs(dim, out_dim, seed)
    inv = repr(1.0 / math.sqrt(out_dim))
    parts = [
        f"SELECT vec_id, {j} AS j, "
        f"round(list_dot_product(embedding::DOUBLE[], "
        f"[{', '.join(repr(s) for s in row)}]) * {inv}, 4) AS comp "
        f"FROM embeddings"
        for j, row in enumerate(signs)
    ]
    return " UNION ALL ".join(parts)


@query("q124_random_projection", _q124_sql())
def q124(spark, sf_dir):
    return similarity.random_project(
        _t(spark, sf_dir, "embeddings"), dim=64, out_dim=8, seed=7
    )


# ------------- q125: packed-batch physical layout ---------------------------
# q41's pack assignment extended to what the trainer's loader consumes:
# per document its segment index inside the pack (attention-mask segment
# id) and its token start offset (position-id base) — exact prefix sums
# on the same one-Exchange window family as the assignment itself.
_Q125_SQL = """
    WITH p AS (
      SELECT source, doc_id, n_chars,
             floor((sum(n_chars) OVER (PARTITION BY source ORDER BY doc_id)
                    - n_chars) / 4000)::INT AS pack_seq
      FROM documents)
    SELECT doc_id, source, n_chars, pack_seq,
           (row_number() OVER (PARTITION BY source, pack_seq
                               ORDER BY doc_id) - 1)::INT AS seg_idx,
           (sum(n_chars) OVER (PARTITION BY source, pack_seq
                               ORDER BY doc_id) - n_chars)::BIGINT AS start_pos
    FROM p
"""


@query("q125_pack_layout", _Q125_SQL)
def q125(spark, sf_dir):
    from georef_ar_etl_spark.operators import corpus

    d = _t(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    return corpus.pack_layout(d, 4000, len_col="n_chars")


# ------------- q126: Fellegi–Sunter probabilistic record linkage ------------
# The probabilistic decision layer over blocked candidate pairs
# (completes the ER stack: q73 blocks+verifies, q117 SNM-blocks, q109
# picks golden records — this CLASSIFIES). Field weights are
# log2(m/u) / log2((1-m)/(1-u)) quantized to integer millis driver-side
# (operators/entity_match.py::fs_weights), so pair scores are pure
# integer sums — bit-identical under any partitioning. Pairs are bounded
# by the nation blocking key; only match/possible verdicts are emitted
# (the clerical-review feed).
_Q126_SQL = """
    WITH p AS (
      SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
             levenshtein(a.c_name, b.c_name) AS nd,
             a.c_mktsegment = b.c_mktsegment AS seg,
             abs(a.c_acctbal - b.c_acctbal) <= 500 AS bal
      FROM customer a JOIN customer b
        ON a.c_nationkey = b.c_nationkey AND a.c_custkey < b.c_custkey),
    s AS (
      SELECT id_a, id_b,
             (CASE WHEN nd <= 3 THEN 4170 ELSE -3248 END
              + CASE WHEN seg THEN 1807 ELSE -1415 END
              + CASE WHEN bal THEN 3000 ELSE -2170 END)::BIGINT AS fs_milli
      FROM p)
    SELECT id_a, id_b, fs_milli,
           CASE WHEN fs_milli >= 6000 THEN 'match'
                WHEN fs_milli >= 2500 THEN 'possible'
                ELSE 'non_match' END AS verdict
    FROM s WHERE fs_milli >= 2500
"""


@query("q126_fellegi_sunter", _Q126_SQL)
def q126(spark, sf_dir):
    from georef_ar_etl_spark.operators.entity_match import (
        fs_classify,
        fs_weights,
    )

    c = _t(spark, sf_dir, "customer")
    a, b = c.alias("a"), c.alias("b")
    pairs = a.join(
        b,
        (F.col("a.c_nationkey") == F.col("b.c_nationkey"))
        & (F.col("a.c_custkey") < F.col("b.c_custkey")),
    ).select(
        F.col("a.c_custkey").alias("id_a"),
        F.col("b.c_custkey").alias("id_b"),
        # bounded levenshtein (guide §1.2 "per-task work"): the name rule
        # only asks nd<=3, and levenshtein(l, r, 3) answers that with a
        # banded O(3·n) scan + early exit instead of the full O(n²) matrix
        # (returns -1 when the distance exceeds the bound, so nd>=0 ⇔
        # nd<=3, NULL names still abstain)
        F.levenshtein("a.c_name", "b.c_name", 3).alias("nd"),
        (F.col("a.c_mktsegment") == F.col("b.c_mktsegment")).alias("seg"),
        (F.abs(F.col("a.c_acctbal") - F.col("b.c_acctbal")) <= 500).alias(
            "bal"
        ),
    )
    # cheap rules first, the levenshtein rule LAST so fs_classify's guard
    # only evaluates it when the seg/bal partial score can still reach the
    # 'possible' threshold AND the pair is id-ordered (weights: any verdict
    # ≥ 2500 needs seg_term + bal_term ≥ 2500 - 4170, i.e. seg OR bal —
    # ~27% of the candidate stream pays the edit distance)
    rules = [
        (F.col("seg"), *fs_weights(0.7, 0.2)),
        (F.col("bal"), *fs_weights(0.8, 0.1)),
        (F.col("nd") >= 0, *fs_weights(0.9, 0.05)),
    ]
    return (
        fs_classify(
            pairs,
            rules,
            upper_milli=6000,
            lower_milli=2500,
            guard=F.col("id_a") < F.col("id_b"),
        )
        .filter(F.col("fs_milli") >= 2500)
        .select("id_a", "id_b", "fs_milli", "verdict")
    )


# ------------- q127: exponential time-decay aggregate ----------------------
# Feature-store recency weighting: per user, Σ value·0.5^(age/7d) at the
# FIXED as-of instant 2024-01-31 (reproducible — an implicit now() would
# make every run a different feature; rows after as_of are excluded to
# keep future signal out of a training feature). Per-row weights are one
# pow() on identical IEEE inputs in both engines, quantized to decimal
# before the group sum (q01 rule).
_Q127_SQL = """
    WITH w AS (
      SELECT user_id, value,
             round(value * pow(0.5,
                 (floor(epoch(TIMESTAMP '2024-01-31 00:00:00'))::BIGINT
                  - floor(epoch(ts))::BIGINT) / 604800.0),
               9)::DECIMAL(28,9) AS term
      FROM events
      WHERE ts <= TIMESTAMP '2024-01-31 00:00:00')
    SELECT user_id, count(value) AS n,
           round(sum(term), 6)::DOUBLE AS decayed_sum
    FROM w GROUP BY user_id
"""


@query("q127_decayed_sum", _Q127_SQL)
def q127(spark, sf_dir):
    from georef_ar_etl_spark.operators.temporal import decayed_sum

    return decayed_sum(
        _t(spark, sf_dir, "events"),
        "user_id",
        "ts",
        "value",
        as_of="2024-01-31 00:00:00",
        half_life_s=7 * 86400,
    )


# ------------- q128: per-source MinHash corpus similarity -------------------
# Which SOURCES duplicate each other (mirror crawls, re-uploads): one
# MinHash signature per source over its 8-char shingle stream (a
# map-side-combinable min aggregate — signatures of shards merge by
# elementwise min, never a shingle shuffle), then pairwise Jaccard
# estimates on signatures alone — sources² · k work after ONE corpus
# pass. Same md5+affine family as every oracled sketch; the oracle
# inlines identical constants, so every signature component is verified
# bit-for-bit.
def _q128_sql(k: int = 16, seed: int = 11) -> str:
    A, B = doc_dedup.minhash_affine_params(k, seed)
    mins = ",\n             ".join(
        f"min((h * {int(A[i])} + {int(B[i])}) % 2147483647) AS m{i}"
        for i in range(k)
    )
    structs = ", ".join(
        f"struct_pack(i := {i}, v := m{i})" for i in range(k)
    )
    return f"""
    WITH sh AS (
      SELECT source, lower(text) AS t FROM documents
      WHERE length(text) >= 8),
    g AS (
      SELECT source,
             (('0x' || substr(md5(substr(t, i, 8)), 1, 8))::UBIGINT
              % 2147483647)::BIGINT AS h
      FROM sh, unnest(generate_series(1, length(t) - 7)) AS u(i)),
    sig AS (SELECT source AS grp,
             {mins}
            FROM g GROUP BY source),
    l AS (SELECT grp, unnest([{structs}]) AS s FROM sig),
    lng AS (SELECT grp, s.i AS i, s.v AS minv FROM l)
    SELECT a.grp AS grp_a, b.grp AS grp_b,
           count(*) FILTER (a.minv = b.minv) AS n_eq,
           round(count(*) FILTER (a.minv = b.minv) / {float(k)!r}, 6)
             AS est_jaccard
    FROM lng a JOIN lng b ON a.i = b.i AND a.grp < b.grp
    GROUP BY 1, 2
    """


@query("q128_source_minhash_similarity", _q128_sql())
def q128(spark, sf_dir):
    from georef_ar_etl_spark.operators import sketches

    shingles = (
        _t(spark, sf_dir, "documents")
        .select("source", F.lower("text").alias("t"))
        .filter(F.length("t") >= 8)
        .select(
            "source",
            F.explode(
                # sequence(1, 0) DESCENDS in Spark — the length filter
                # above guarantees at least one shingle
                F.expr(
                    "transform(sequence(1, length(t) - 7),"
                    " i -> substring(t, i, 8))"
                )
            ).alias("tok"),
        )
    )
    sig = sketches.group_minhash(shingles, "source", "tok", k=16, seed=11)
    return sketches.signature_similarity(sig, k=16)


# ------------- q129: proportional stratified sample (largest remainder) ----
# A fixed TOTAL budget (97 docs) split across sources proportional to
# size via Hamilton apportionment — exact integer quotas (floor + largest
# remainders, ties by source name; 97 is deliberately non-divisible so
# the remainder tie-break path is exercised), filled per source by the
# k-smallest-salted-hash rule. Preserves the corpus mixture at a fixed
# budget, where q55 balances per group; allocation runs on the
# groups-sized count frame and broadcasts back.
_Q129_SQL = """
    WITH c AS (SELECT source AS g, count(*) AS c FROM documents GROUP BY 1),
    t AS (SELECT g, c, (sum(c) OVER ())::BIGINT AS n FROM c),
    a AS (SELECT g, c, n, (97 * c) // n AS base, (97 * c) % n AS rem FROM t),
    b AS (SELECT a.*, (97 - (sum(base) OVER ())::BIGINT) AS leftover,
                 row_number() OVER (ORDER BY rem DESC, g) AS rk FROM a),
    q AS (SELECT g, base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END
                    AS quota FROM b),
    r AS (SELECT doc_id, source, n_chars,
                 row_number() OVER (
                   PARTITION BY source
                   ORDER BY md5(doc_id::VARCHAR || 'stratified'), doc_id)
                   AS rk
          FROM documents)
    SELECT r.doc_id, r.source, r.n_chars
    FROM r JOIN q ON r.source = q.g WHERE r.rk <= q.quota
"""


@query("q129_stratified_sample", _Q129_SQL)
def q129(spark, sf_dir):
    from georef_ar_etl_spark.operators import corpus

    d = _t(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    return corpus.stratified_sample(d, total_k=97)


# ------------- q130/q131: Debezium envelope wire decode --------------------
# The WAL-tail ingest boundary (sources/cdc_envelope.py) exercised as a
# catalog query: events rows are ENCODED into Debezium-style JSON
# envelopes (op c/r/u/d, before/after images, source.lsn) with five
# deterministic malformation classes injected (unknown op, missing lsn,
# delete without before-image, corrupt JSON, Kafka tombstone), then
# decoded back through ``parse_debezium``. The oracle computes the
# decode SPEC directly from events — so the whole JSON encode → Jackson
# decode → quarantine-split path is verified value-for-value, and the
# five malformed classes are verified by count in q131. Pure map both
# directions: one to_json + one from_json per row, no shuffle (the
# groupBy in q131 aggregates a row per malformation class).
_ENVELOPE_RAW_CACHE: dict = {}


def _envelope_feed(spark, sf_dir):
    from georef_ar_etl_spark.sources.cdc_envelope import parse_debezium

    m = F.pmod(F.col("event_id"), F.lit(13))
    tokens = F.expr(
        "transform(sequence(0, cast(event_id % 5 as int)), x -> cast(x as int))"
    )
    img = F.struct(
        F.concat(F.lit("u"), F.col("user_id").cast("string")).alias("doc_id"),
        tokens.alias("tokens"),
        # one in three images omits n_tok -> decoder recomputes size(tokens)
        F.when(
            F.pmod(F.col("event_id"), F.lit(3)) != 0, F.size(tokens)
        ).cast("int").alias("n_tok"),
        F.col("event_type").alias("source"),
    )
    wire_op = (
        F.when(m == 0, F.lit("d"))
        .when(m == 1, F.lit("r"))
        .when(m == 2, F.lit("c"))
        .when(m == 3, F.lit("z"))  # unknown op -> quarantine
        .when(m == 5, F.lit("d"))  # delete missing before -> quarantine
        .otherwise(F.lit("u"))
    )
    env = F.struct(
        wire_op.alias("op"),
        F.when(m == 0, img).alias("before"),
        F.when((m != 0) & (m != 5), img).alias("after"),
        F.struct(
            F.when(m != 4, F.col("event_id")).cast("long").alias("lsn"),
            F.col("event_id").cast("long").alias("ts_ms"),
            F.lit("events").alias("table"),
        ).alias("source"),
    )
    js = F.to_json(env, {"ignoreNullFields": "true"})
    # materialize the synthetic wire ONCE (cached per session+sf_dir): the
    # envelope SYNTHESIS is fixture scaffolding, not the measured operator
    # — in production the raw NDJSON already exists (Kafka value column /
    # landed file). Fusing synthesis into the decode projection also made
    # CollapseProject re-evaluate the giant encode expression per decoded
    # output column (measured 8.2 s vs 1.9 s encode + 1.8 s decode split).
    key = (id(spark), sf_dir)
    raw = _ENVELOPE_RAW_CACHE.get(key)
    if raw is None:
        raw = _t(spark, sf_dir, "events").select(
            F.when(m == 6, F.concat(F.lit("{oops"), js))  # corrupt JSON
            .when(m == 7, F.lit(None).cast("string"))  # Kafka tombstone
            .otherwise(js)
            .alias("value")
        ).localCheckpoint(eager=True)
        _ENVELOPE_RAW_CACHE[key] = raw
    return parse_debezium(raw, batch_id=7)


_Q130_SQL = """
    WITH e AS (
      SELECT event_id, user_id, event_type, event_id % 13 AS m FROM events)
    SELECT 7::BIGINT AS batch_id, event_id AS seq,
           CASE WHEN m = 0 THEN 'delete'
                WHEN m IN (1, 2) THEN 'insert'
                ELSE 'update' END AS op,
           'u' || user_id::VARCHAR AS doc_id,
           md5(array_to_string(
               generate_series(0, (event_id % 5)::INT), ',')) AS tokens_fp,
           (event_id % 5 + 1)::INT AS n_tok,
           event_type AS source
    FROM e WHERE m NOT IN (3, 4, 5, 6, 7)
"""


@query("q130_cdc_envelope_decode", _Q130_SQL)
def q130(spark, sf_dir):
    events, _ = _envelope_feed(spark, sf_dir)
    return events.select(
        "batch_id",
        "seq",
        "op",
        "doc_id",
        _arr_fp(F.col("tokens")).alias("tokens_fp"),
        "n_tok",
        "source",
    )


_Q131_SQL = """
    SELECT CASE m WHEN 3 THEN 'unknown_op' WHEN 4 THEN 'no_lsn'
                  WHEN 5 THEN 'no_image' WHEN 6 THEN 'bad_json'
                  ELSE 'tombstone' END AS reason,
           count(*) AS n
    FROM (SELECT event_id % 13 AS m FROM events)
    WHERE m IN (3, 4, 5, 6, 7) GROUP BY 1
"""


@query("q131_cdc_envelope_quarantine", _Q131_SQL)
def q131(spark, sf_dir):
    _, malformed = _envelope_feed(spark, sf_dir)
    return malformed.groupBy("reason").agg(F.count(F.lit(1)).alias("n"))


# ------------- q132: SCD2 point-in-time lookup join -------------------------
# The consumer side of q97's history: every click event is enriched with
# the user's status version live AT that click's sequence (non-click
# events form the status stream; 'error' closes the account, so clicks
# inside a deletion gap or before signup get NULLs). NOT an interval
# theta-join — versions tile the axis disjointly, so the live version is
# the as-of(backward) match on valid_from gated by its own valid_to:
# operators/scd.py::scd2_lookup rides the union+window as-of (ONE shuffle
# for history-build + ONE for the lookup, no pair explosion at any
# fact:version ratio). The oracle replays the q97 history CTE and joins
# by explicit interval containment.
_Q132_SQL = """
    WITH c AS (
      SELECT user_id, event_id AS seq,
             CASE WHEN event_type = 'error' THEN 'd' ELSE 'u' END AS op,
             CASE WHEN event_type = 'error' THEN NULL
                  ELSE event_type END AS e_et
      FROM events WHERE event_type <> 'click'),
    m AS (
      SELECT *, row_number() OVER w AS rn,
             lag(op) OVER w AS p_op, lag(e_et) OVER w AS p_et
      FROM c WINDOW w AS (PARTITION BY user_id ORDER BY seq)),
    cp AS (
      SELECT * FROM m
      WHERE rn = 1 OR op IS DISTINCT FROM p_op
         OR e_et IS DISTINCT FROM p_et),
    v AS (
      SELECT user_id, op, e_et, seq AS valid_from,
             lead(seq) OVER (PARTITION BY user_id ORDER BY seq) AS valid_to
      FROM cp),
    h AS (SELECT user_id, e_et AS status, valid_from, valid_to
          FROM v WHERE op = 'u'),
    f AS (SELECT event_id AS at_seq, user_id FROM events
          WHERE event_type = 'click')
    SELECT f.at_seq, f.user_id, h.status AS dim_status,
           -- coalesce: a nullable BIGINT round-trips through pandas as
           -- float64, which the dtype-sensitive compare would flag
           coalesce(h.valid_from, -1) AS dim_valid_from
    FROM f LEFT JOIN h
      ON h.user_id = f.user_id AND h.valid_from <= f.at_seq
     AND (h.valid_to IS NULL OR f.at_seq < h.valid_to)
"""


@query("q132_scd2_temporal_lookup", _Q132_SQL)
def q132(spark, sf_dir):
    from georef_ar_etl_spark.operators import scd

    ev = _t(spark, sf_dir, "events")
    dim_stream = ev.filter(F.col("event_type") != "click").select(
        "user_id",
        F.col("event_id").alias("seq"),
        F.when(F.col("event_type") == "error", F.lit("d"))
        .otherwise(F.lit("u"))
        .alias("op"),
        F.col("event_type").alias("status"),
    )
    history = scd.scd2_history(
        dim_stream, key_col="user_id", seq_col="seq", op_col="op",
        payload_cols=["status"],
    )
    facts = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("at_seq"), "user_id"
    )
    looked = scd.scd2_lookup(
        facts, history, key_col="user_id", time_col="at_seq",
        payload_cols=["status", "valid_from"],
    )
    return looked.select(
        "at_seq",
        "user_id",
        "dim_status",
        F.coalesce(F.col("dim_valid_from"), F.lit(-1)).alias(
            "dim_valid_from"
        ),
    )


# ------------- q133: exact-substring dedup with span REMOVAL ----------------
# The acting half of Lee et al. 2022 (q120 is the diagnostic): every
# non-first occurrence of a duplicated 8-token gram marks its span for
# removal; documents keep their remaining tokens in order, so exactly one
# copy of every duplicated substring survives corpus-wide (first
# occurrence by (doc_id, start)). Grams move as 60-bit hashes; first-
# occurrence flag + duplication arity come from ONE window over the gram;
# reconstruction is pure array expressions. The oracle replays the
# identical hash, window rule and span filter in SQL lists.
_Q133_SQL = r"""
    WITH w AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '\s+'),
                         x -> x <> '') AS ws
      FROM documents),
    g AS (
      SELECT doc_id, i AS s,
             (('0x' || substr(md5(array_to_string(
                 list_slice(ws, i, i + 7), ' ')), 1, 15))::UBIGINT)::BIGINT
               AS g
      FROM w, unnest(generate_series(1, len(ws) - 7)) AS t(i)
      WHERE len(ws) >= 8),
    o AS (
      SELECT doc_id, s,
             row_number() OVER (PARTITION BY g ORDER BY doc_id, s) AS rn,
             count(*) OVER (PARTITION BY g) AS cnt
      FROM g),
    d AS (SELECT doc_id, list_sort(list(DISTINCT s)) AS ss
          FROM o WHERE cnt > 1 AND rn > 1 GROUP BY doc_id),
    r AS (SELECT w.doc_id, ws, coalesce(d.ss, []) AS ss
          FROM w LEFT JOIN d USING (doc_id)),
    kept AS (
      SELECT doc_id, ws,
             list_filter(
               list_transform(generate_series(1, len(ws)),
                 t -> CASE WHEN len(list_filter(ss,
                        s -> s <= t AND t < s + 8)) = 0
                      THEN ws[t] END),
               x -> x IS NOT NULL) AS kw
      FROM r)
    SELECT doc_id, len(ws)::BIGINT AS n_tok,
           (len(ws) - len(kw))::BIGINT AS n_removed,
           -- DuckDB array_to_string([]) is NULL; Spark array_join is ''
           coalesce(array_to_string(kw, ' '), '') AS kept_text
    FROM kept
"""


@query("q133_dup_span_removal", _Q133_SQL)
def q133(spark, sf_dir):
    return text.remove_dup_spans(_t(spark, sf_dir, "documents"), k=8)


# ------------- q134: single-pass Pearson correlation matrix -----------------
# Feature-profiling over lineitem's four numeric measures as ONE
# aggregate: every moment (n, Σx, Σx², Σxy) accumulates in exact decimal
# (order-insensitive — reproducible under any partitioning/AQE re-plan,
# unlike streaming-double F.corr), correlations derive from the exact
# moments in IEEE double, in-plan. The oracle mirrors moment-for-moment.
_Q134_COLS = {
    "quantity": "l_quantity",
    "extendedprice": "l_extendedprice",
    "discount": "l_discount",
    "tax": "l_tax",
}


def _q134_sql() -> str:
    names = list(_Q134_COLS)
    pairs = [(a, b) for i, a in enumerate(names) for b in names[i + 1:]]

    def dec(a):
        return f"{_Q134_COLS[a]}::DECIMAL(18,2)"

    moments = ["count(*)::BIGINT AS n"]
    for a in names:
        moments.append(f"sum({dec(a)}) AS s_{a}")
        moments.append(f"sum({dec(a)} * {dec(a)}) AS ss_{a}")
    for a, b in pairs:
        moments.append(f"sum({dec(a)} * {dec(b)}) AS sp_{a}_{b}")
    sels = []
    for a, b in pairs:
        num = f"(n::DOUBLE * sp_{a}_{b}::DOUBLE - s_{a}::DOUBLE * s_{b}::DOUBLE)"
        den = (
            f"sqrt((n::DOUBLE * ss_{a}::DOUBLE - s_{a}::DOUBLE * s_{a}::DOUBLE)"
            f" * (n::DOUBLE * ss_{b}::DOUBLE - s_{b}::DOUBLE * s_{b}::DOUBLE))"
        )
        sels.append(
            f"SELECT '{a}' AS col_a, '{b}' AS col_b, n,"
            f" round({num} / {den}, 6)::DOUBLE AS corr FROM m"
        )
    return (
        "WITH m AS (SELECT "
        + ", ".join(moments)
        + " FROM lineitem) "
        + " UNION ALL ".join(sels)
    )


@query("q134_corr_matrix", _q134_sql())
def q134(spark, sf_dir):
    from georef_ar_etl_spark.operators.validate import corr_matrix

    return corr_matrix(_t(spark, sf_dir, "lineitem"), _Q134_COLS)


# ------------- q135: lexical diversity (entropy / Simpson / TTR) ------------
# Template/keyword-stuffed docs that pass length and Gopher gates show up
# as low unigram entropy & Simpson diversity. Word-count shape; entropy
# terms quantized to 6dp before the exact decimal sum (order-insensitive
# — the only floats are log2 calls on small ints, identical both
# engines), Simpson and TTR exact arithmetic.
_Q135_SQL = r"""
    WITH wds AS (
      SELECT doc_id,
             unnest(list_filter(string_split_regex(lower(text), '\s+'),
                                x -> x <> '')) AS w
      FROM documents),
    c AS (SELECT doc_id, w, count(*) AS c FROM wds GROUP BY 1, 2),
    t AS (
      SELECT doc_id, sum(c)::BIGINT AS n, count(*)::BIGINT AS n_types,
             sum(round(c * log2(c), 6)::DECIMAL(28,6)) AS s,
             sum(c * (c - 1))::BIGINT AS pairs
      FROM c GROUP BY 1)
    SELECT doc_id, n AS n_tok, n_types,
           round(log2(n) - s::DOUBLE / n::DOUBLE, 6)::DOUBLE AS entropy,
           CASE WHEN n > 1
                THEN round(1.0 - pairs::DOUBLE / (n * (n - 1))::DOUBLE, 6)
                ELSE 0.0 END::DOUBLE AS simpson,
           round(n_types::DOUBLE / n::DOUBLE, 6)::DOUBLE AS ttr
    FROM t
"""


@query("q135_lexical_diversity", _Q135_SQL)
def q135(spark, sf_dir):
    return text.lexical_diversity(_t(spark, sf_dir, "documents"))


# ------------- q136: CDC transaction-boundary assembly ----------------------
# A WAL tail delivers ops grouped in source transactions; a consistent
# consumer emits ONLY ops whose transaction committed (here: txs of 8
# consecutive events, committed iff the tx contains a 'purchase' — the
# commit-marker stand-in). One window over the tx id (max-flag, no
# groupBy+join-back), ops ride through in (tx, seq) order untouched.
_Q136_SQL = """
    WITH x AS (
      SELECT event_id // 8 AS tx_id, event_id AS seq, user_id, event_type,
             max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               OVER (PARTITION BY event_id // 8) AS committed
      FROM events)
    SELECT tx_id, seq, user_id, event_type
    FROM x WHERE committed = 1
"""


@query("q136_tx_boundary_assembly", _Q136_SQL)
def q136(spark, sf_dir):
    ev = _t(spark, sf_dir, "events").select(
        (F.col("event_id") / 8).cast("long").alias("tx_id"),
        F.col("event_id").alias("seq"),
        "user_id",
        "event_type",
    )
    committed = F.max(
        F.when(F.col("event_type") == "purchase", 1).otherwise(0)
    ).over(
        Window.partitionBy("tx_id").rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
    )
    return ev.withColumn("_c", committed).filter(F.col("_c") == 1).drop("_c")


# ------------- q137: at-least-once redelivery dedupe ------------------------
# Kafka/WAL consumers see redelivered envelopes after rebalances; exactly-
# once apply = keep the FIRST arrival per lsn and audit the delivery
# count. Feed synthesizes redeliveries (every 5th event arrives twice,
# the duplicate 10007 arrival slots later); one window per lsn keyed by
# arrival order — first-wins is NOT q02's latest-wins LWW.
_Q137_SQL = """
    WITH feed AS (
      SELECT event_id AS lsn, user_id, event_type,
             event_id * 2 AS arrival FROM events
      UNION ALL
      SELECT event_id, user_id, event_type, event_id * 2 + 10007
      FROM events WHERE event_id % 5 = 0),
    r AS (
      SELECT *, row_number() OVER (PARTITION BY lsn ORDER BY arrival) AS rn,
             count(*) OVER (PARTITION BY lsn) AS n_deliveries
      FROM feed)
    SELECT lsn, user_id, event_type, arrival, n_deliveries
    FROM r WHERE rn = 1
"""


@query("q137_redelivery_dedupe", _Q137_SQL)
def q137(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    first = ev.select(
        F.col("event_id").alias("lsn"),
        "user_id",
        "event_type",
        (F.col("event_id") * 2).alias("arrival"),
    )
    redeliv = ev.filter(F.pmod("event_id", F.lit(5)) == 0).select(
        F.col("event_id").alias("lsn"),
        "user_id",
        "event_type",
        (F.col("event_id") * 2 + 10007).alias("arrival"),
    )
    feed = first.unionByName(redeliv)
    w = Window.partitionBy("lsn").orderBy("arrival")
    wc = Window.partitionBy("lsn").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return (
        feed.withColumn("rn", F.row_number().over(w))
        .withColumn("n_deliveries", F.count(F.lit(1)).over(wc))
        .filter(F.col("rn") == 1)
        .select("lsn", "user_id", "event_type", "arrival", "n_deliveries")
    )


# ------------- q138: replica reconciliation by bucket checksums -------------
# Post-replication audit (pt-table-checksum's idea): source and replica
# each reduce to 32 (bucket, count, additive 40-bit content checksum)
# rows — comparing those finds every diverged bucket without shipping
# either table. The replica here diverges deterministically (rows
# event_id%1000==13 missing, value corrupted where event_id%997==0);
# value rides as a DECIMAL string in the row hash (float→string
# formatting is engine-specific, decimal strings are not).
_Q138_SQL = """
    WITH src AS (
      SELECT (user_id % 32)::INT AS b,
             (('0x' || substr(md5(
                 event_id::VARCHAR || '|' || user_id::VARCHAR || '|' ||
                 event_type || '|' || value::DECIMAL(18,2)::VARCHAR),
               1, 15))::UBIGINT % 1099511627776)::BIGINT AS h
      FROM events),
    rep AS (
      SELECT (user_id % 32)::INT AS b,
             (('0x' || substr(md5(
                 event_id::VARCHAR || '|' || user_id::VARCHAR || '|' ||
                 event_type || '|' ||
                 (CASE WHEN event_id % 997 = 0 THEN value + 1
                       ELSE value END)::DECIMAL(18,2)::VARCHAR),
               1, 15))::UBIGINT % 1099511627776)::BIGINT AS h
      FROM events WHERE event_id % 1000 <> 13),
    s AS (SELECT b, count(*) AS n, sum(h)::BIGINT AS c FROM src GROUP BY b),
    r AS (SELECT b, count(*) AS n, sum(h)::BIGINT AS c FROM rep GROUP BY b)
    SELECT s.b AS bucket, s.n AS n_src, r.n AS n_replica,
           s.n = r.n AND s.c = r.c AS consistent
    FROM s JOIN r ON s.b = r.b
"""


@query("q138_replica_reconciliation", _Q138_SQL)
def q138(spark, sf_dir):
    from georef_ar_etl_spark.operators.validate import table_checksum

    ev = _t(spark, sf_dir, "events")
    cols = ["event_id", "user_id", "event_type", "v"]
    src = ev.withColumn("v", F.col("value").cast("decimal(18,2)"))
    rep = (
        ev.filter(F.pmod("event_id", F.lit(1000)) != 13)
        .withColumn(
            "v",
            F.when(
                F.pmod("event_id", F.lit(997)) == 0, F.col("value") + 1
            )
            .otherwise(F.col("value"))
            .cast("decimal(18,2)"),
        )
    )
    cs = table_checksum(src, F.col("user_id"), cols, n_buckets=32)
    cr = table_checksum(rep, F.col("user_id"), cols, n_buckets=32)
    return (
        cs.alias("s")
        .join(cr.alias("r"), F.col("s.bucket") == F.col("r.bucket"))
        .select(
            F.col("s.bucket").alias("bucket"),
            F.col("s.n").alias("n_src"),
            F.col("r.n").alias("n_replica"),
            (
                (F.col("s.n") == F.col("r.n"))
                & (F.col("s.checksum") == F.col("r.checksum"))
            ).alias("consistent"),
        )
    )


# ------------- q139: per-doc n-gram novelty vs a reference corpus ----------
# Memorization/overlap audit: what fraction of each candidate document's
# 8-grams already exists anywhere in the reference slice (sources
# src0-2). Occurrence-level (every position counts); the reference
# reduces to its distinct 60-bit gram set once, then one semi-join +
# per-doc aggregate. Docs shorter than 8 tokens score novelty 1.0.
_Q139_SQL = r"""
    WITH w AS (
      SELECT doc_id, source,
             list_filter(string_split_regex(lower(text), '\s+'),
                         x -> x <> '') AS ws
      FROM documents),
    g AS (
      SELECT doc_id, source,
             (('0x' || substr(md5(array_to_string(
                 list_slice(ws, i, i + 7), ' ')), 1, 15))::UBIGINT)::BIGINT
               AS g
      FROM w, unnest(generate_series(1, len(ws) - 7)) AS t(i)
      WHERE len(ws) >= 8),
    refset AS (SELECT DISTINCT g FROM g
               WHERE source IN ('src0', 'src1', 'src2')),
    aud AS (SELECT doc_id, g FROM g
            WHERE source NOT IN ('src0', 'src1', 'src2')),
    tot AS (
      SELECT doc_id, count(*) AS n_grams,
             count(*) FILTER (g IN (SELECT g FROM refset)) AS n_seen
      FROM aud GROUP BY 1)
    SELECT d.doc_id, coalesce(n_grams, 0) AS n_grams,
           coalesce(n_seen, 0) AS n_seen,
           round(1.0 - coalesce(n_seen, 0)
                 / greatest(coalesce(n_grams, 0), 1), 6)::DOUBLE AS novelty
    FROM (SELECT doc_id FROM documents
          WHERE source NOT IN ('src0', 'src1', 'src2')) d
    LEFT JOIN tot USING (doc_id)
"""


@query("q139_ngram_novelty", _Q139_SQL)
def q139(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    ref_srcs = ["src0", "src1", "src2"]
    return text.ngram_novelty(
        d.filter(~F.col("source").isin(ref_srcs)),
        d.filter(F.col("source").isin(ref_srcs)),
        k=8,
    )


# ------------- q140: trailing 7-day uniques from daily HLL sketches --------
# "Weekly active users" per day at 100 TB: each day sketches its users
# ONCE (m=64 ints, map-side combinable); a day's trailing estimate is a
# register-wise max over calendar days [D-6, D] — sketches explode into
# the <=7 days they influence (a 7x multiplication of m rows/day, never
# of data rows), so absent-on-day-D buckets still contribute. Estimates
# hash-oracled (q112 rule: 2^-r sums are exact powers of two).
def _q140_sql(p: int = 6, window_days: int = 7) -> str:
    m = 1 << p
    maxp1 = 31 - p + 1
    amm = repr((0.7213 / (1 + 1.079 / m)) * m * m)
    return f"""
    WITH e AS (SELECT ts::DATE AS day, user_id FROM events),
    h AS (SELECT day,
                 (('0x' || substr(md5(user_id::VARCHAR), 1, 8))::UBIGINT
                  % 2147483647)::BIGINT AS hv
          FROM e),
    reg AS (
      SELECT day, hv % {m} AS bucket,
             max(CASE WHEN (hv >> {p}) = 0 THEN {maxp1}
                      ELSE {maxp1} - length(bin(hv >> {p})) END) AS r
      FROM h GROUP BY 1, 2),
    infl AS (SELECT day + i::INT AS day2, bucket, r
             FROM reg, unnest(generate_series(0, {window_days - 1})) AS t(i)),
    days AS (SELECT DISTINCT day FROM e),
    m2 AS (SELECT day2 AS day, bucket, max(r) AS r
           FROM infl JOIN days ON infl.day2 = days.day GROUP BY 1, 2),
    agg AS (SELECT day, sum(1.0 / (1::BIGINT << r)) AS sp,
                   count(*) AS np
            FROM m2 GROUP BY 1),
    est AS (SELECT day, {amm} / (sp + ({m} - np)) AS raw,
                   {m} - np AS zeros
            FROM agg)
    SELECT day::VARCHAR AS day,
           round(CASE WHEN raw <= {2.5 * m} AND zeros > 0
                      THEN {float(m)!r} * ln({float(m)!r} / zeros)
                      ELSE raw END, 4)::DOUBLE AS est_uniques
    FROM est
    """


@query("q140_sliding_hll_uniques", _q140_sql())
def q140(spark, sf_dir):
    from georef_ar_etl_spark.operators import sketches

    out = sketches.sliding_hll_uniques(
        _t(spark, sf_dir, "events"), "ts", "user_id", window_days=7, p=6
    )
    return out.select(
        F.col("day").cast("string").alias("day"),
        F.round("est", 4).alias("est_uniques"),
    )


# ------------- q141: incremental inverted gram-index maintenance -----------
# The CDC×dedup composition: the token-bigram postings behind exact-
# substring dedup (q120/q133 recompute them per run) maintained epoch-by-
# epoch from engine.changes() — gram hashes computed only for changed
# docs, old postings reconstructed from the bucket-pruned forward table,
# O(changed docs × grams/doc) per epoch. The oracle computes the same
# duplicated-gram table from the FULL final replayed state: equality
# proves incremental == batch recompute across 4 epochs of inserts,
# updates and deletes.
_Q141_SQL = f"""
    WITH {_Q24_BASE_CTES},{_q24_state_ctes("", "TRUE")},
    g AS (
      SELECT doc_id, i AS s,
             (('0x' || substr(md5(array_to_string(
                 tokens[i:i+1], ',')), 1, 15))::UBIGINT)::BIGINT AS g
      FROM state, unnest(generate_series(1, len(tokens) - 1)) AS t(i)
      WHERE len(tokens) >= 2)
    SELECT g, count(DISTINCT doc_id) AS n_docs, count(*) AS n_occ,
           min(doc_id || '@' || lpad(s::VARCHAR, 6, '0')) AS first_key
    FROM g GROUP BY 1 HAVING count(DISTINCT doc_id) >= 2
"""


@query("q141_incremental_gram_index", _Q141_SQL)
def q141(spark, sf_dir):
    from georef_ar_etl_spark.engine import CdcEngine
    from georef_ar_etl_spark.operators.index_maintenance import TokenGramIndex

    initial, events = _q24_inputs(spark, sf_dir)
    root = _ephemeral_table_root("cdc_gramidx_q141", sf_dir)
    eng = CdcEngine(spark, f"{root}/src", n_buckets=16)
    eng.bootstrap(initial)
    idx = TokenGramIndex(spark, f"{root}/idx", k=2, n_buckets=8)
    idx.bootstrap(eng.state(epoch=0), source_epoch=0)
    for b in (0, 1, 2, 3):
        m = eng.apply_batch(events.filter(F.col("batch_id") == b), b)
        idx.refresh(eng.changes(idx.last_source_epoch, m["epoch"]), m["epoch"])
    return idx.dup_grams(min_docs=2)


# ------------- q142: generalized suffix array (prefix doubling) ------------
# The index behind full exact-substring dedup (Lee et al. 2022 build a
# suffix array to find EVERY duplicated substring, not fixed-k grams):
# dense global rank of every within-doc word suffix across the corpus,
# built in ceil(log2(max_len)) prefix-doubling rounds of (id,s,rank)
# triples — row width never depends on document length, the dense pair
# rank rides the two-phase range-partitioned global rank, identical
# suffixes share a rank. The oracle materializes every suffix STRING and
# dense_rank()s them directly (space-separated lowercase words compare
# identically to word-sequence order; a prefix sorts first).
_Q142_SQL = r"""
    WITH w AS (
      SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
                                 x -> x <> '') AS ws
      FROM documents),
    g AS (
      SELECT doc_id, i::INT AS s, array_to_string(ws[i:], ' ') AS suf
      FROM w, unnest(generate_series(1, len(ws))) AS t(i)
      WHERE len(ws) >= 1)
    SELECT doc_id, s, dense_rank() OVER (ORDER BY suf) AS sa_rank FROM g
"""


@query("q142_suffix_array", _Q142_SQL)
def q142(spark, sf_dir):
    return text.suffix_array_ranks(_t(spark, sf_dir, "documents"))


# ------------- q143: duplicated spans >= L via suffix-array LCP ------------
# The COMPLETE duplicated-substring report (q120/q133's fixed-k grams
# approximate it): adjacent suffixes in SA order sharing a prefix >= 4
# words. LCP-interval fact: any repeated substring of length L makes some
# adjacent pair share >= L, so nothing is missed. The oracle orders the
# materialized suffix strings and computes word-level LCPs directly.
_Q143_SQL = r"""
    WITH w AS (
      SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
                                 x -> x <> '') AS ws
      FROM documents),
    g AS (
      SELECT doc_id, i::INT AS s, array_to_string(ws[i:], ' ') AS suf, ws
      FROM w, unnest(generate_series(1, len(ws))) AS t(i)
      WHERE len(ws) >= 1),
    r AS (SELECT doc_id, s, ws,
                 row_number() OVER (ORDER BY suf, doc_id, s) AS rn
          FROM g),
    p AS (SELECT a.doc_id AS doc_a, a.s AS s_a,
                 b.doc_id AS doc_b, b.s AS s_b,
                 a.ws[a.s:] AS la, b.ws[b.s:] AS lb
          FROM r a JOIN r b ON b.rn = a.rn + 1),
    l AS (SELECT doc_a, s_a, doc_b, s_b,
                 coalesce(list_min(list_transform(
                     generate_series(1, least(len(la), len(lb))),
                     i -> CASE WHEN la[i::int] <> lb[i::int]
                          THEN i - 1 END)),
                   least(len(la), len(lb)))::INT AS lcp,
                 la
          FROM p)
    SELECT doc_a, s_a, doc_b, s_b, lcp,
           md5(array_to_string(la[1:lcp], ' ')) AS span_fp
    FROM l WHERE lcp >= 4
"""


@query("q143_repeated_spans", _Q143_SQL)
def q143(spark, sf_dir):
    return text.repeated_spans(_t(spark, sf_dir, "documents"), min_len=4)


# ------------- q144: per-group OLS trend (exact-moment linear regression) --
# Per-user spend trend over time: one exact-decimal moment aggregate
# (order-insensitive — q134's discipline, never streaming-double
# regr_slope), OLS closed form on the exact moments in IEEE double.
# x = days since 2024-01-01 (integer-exact), y = value at 2dp.
_Q144_SQL = """
    WITH b AS (
      SELECT user_id,
             (ts::DATE - DATE '2024-01-01')::DECIMAL(18,2) AS x,
             value::DECIMAL(18,2) AS y
      FROM events),
    m AS (SELECT user_id, count(*)::BIGINT AS n, sum(x) AS sx, sum(y) AS sy,
                 sum(x * x) AS sxx, sum(y * y) AS syy, sum(x * y) AS sxy
          FROM b GROUP BY 1),
    t AS (SELECT user_id, n,
                 n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE AS vx,
                 n::DOUBLE * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE AS vy,
                 n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE AS cov,
                 sx::DOUBLE AS sxd, sy::DOUBLE AS syd
          FROM m)
    SELECT user_id, n,
           CASE WHEN vx > 0 THEN round(cov / vx, 6) END::DOUBLE AS slope,
           CASE WHEN vx > 0
                THEN round((syd - (cov / vx) * sxd) / n, 6) END::DOUBLE
             AS intercept,
           CASE WHEN vx > 0 AND vy > 0
                THEN round((cov * cov) / (vx * vy), 6) END::DOUBLE AS r2
    FROM t
"""


@query("q144_group_linreg", _Q144_SQL)
def q144(spark, sf_dir):
    from georef_ar_etl_spark.operators.validate import group_linreg

    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date")).alias(
            "x"
        ),
        F.col("value").alias("y"),
    )
    return group_linreg(ev, ["user_id"], "x", "y")


# ------------- q145: partial-image envelope decode (updates-as-patch) ------
# Producers without full after-images (REPLICA IDENTITY minimal, Mongo
# update descriptions): every 7th update ships only (doc_id, source);
# with updates_as_patch the decoder maps op u -> the engine's 'patch'
# (null payload column = keep), so partial images survive decode instead
# of being quarantined by full-update validation. Nullable outputs ride
# as sentinels (the q132 dtype rule).
def _q145_feed(spark, sf_dir):
    from georef_ar_etl_spark.sources.cdc_envelope import parse_debezium

    m = F.pmod(F.col("event_id"), F.lit(7))
    tokens = F.expr(
        "transform(sequence(0, cast(event_id % 5 as int)), x -> cast(x as int))"
    )
    full_img = F.struct(
        F.concat(F.lit("u"), F.col("user_id").cast("string")).alias("doc_id"),
        tokens.alias("tokens"),
        F.size(tokens).cast("int").alias("n_tok"),
        F.col("event_type").alias("source"),
    )
    partial_img = F.struct(
        F.concat(F.lit("u"), F.col("user_id").cast("string")).alias("doc_id"),
        F.col("event_type").alias("source"),
    )
    # the partial-image after has a NARROWER struct type than the full one,
    # so one F.when over image structs cannot type-unify — build each
    # envelope variant whole and pick between the JSON strings
    raw = _t(spark, sf_dir, "events").select(
        F.when(
            m == 1,
            F.to_json(
                F.struct(
                    F.lit("d").alias("op"),
                    full_img.alias("before"),
                    F.struct(
                        F.col("event_id").cast("long").alias("lsn"),
                        F.col("event_id").cast("long").alias("ts_ms"),
                        F.lit("events").alias("table"),
                    ).alias("source"),
                ),
                {"ignoreNullFields": "true"},
            ),
        )
        .when(
            m == 0,
            F.to_json(
                F.struct(
                    F.lit("u").alias("op"),
                    partial_img.alias("after"),
                    F.struct(
                        F.col("event_id").cast("long").alias("lsn"),
                        F.col("event_id").cast("long").alias("ts_ms"),
                        F.lit("events").alias("table"),
                    ).alias("source"),
                ),
                {"ignoreNullFields": "true"},
            ),
        )
        .otherwise(
            F.to_json(
                F.struct(
                    F.lit("u").alias("op"),
                    full_img.alias("after"),
                    F.struct(
                        F.col("event_id").cast("long").alias("lsn"),
                        F.col("event_id").cast("long").alias("ts_ms"),
                        F.lit("events").alias("table"),
                    ).alias("source"),
                ),
                {"ignoreNullFields": "true"},
            )
        )
        .alias("value")
    ).localCheckpoint(eager=True)
    return parse_debezium(raw, batch_id=3, updates_as_patch=True)


_Q145_SQL = """
    WITH e AS (
      SELECT event_id, user_id, event_type, event_id % 7 AS m FROM events)
    SELECT event_id AS seq,
           CASE WHEN m = 1 THEN 'delete' ELSE 'patch' END AS op,
           'u' || user_id::VARCHAR AS doc_id,
           CASE WHEN m = 0 THEN ''
                ELSE md5(array_to_string(
                    generate_series(0, (event_id % 5)::INT), ',')) END
             AS tokens_fp,
           CASE WHEN m = 0 THEN -1
                ELSE (event_id % 5 + 1) END::INT AS n_tok,
           event_type AS source
    FROM e
"""


@query("q145_cdc_envelope_partial_images", _Q145_SQL)
def q145(spark, sf_dir):
    events, malformed = _q145_feed(spark, sf_dir)
    return events.select(
        "seq",
        "op",
        "doc_id",
        F.coalesce(_arr_fp(F.col("tokens")), F.lit("")).alias("tokens_fp"),
        F.coalesce(F.col("n_tok"), F.lit(-1)).cast("int").alias("n_tok"),
        "source",
    )


# -------------------- q146: ZONE-MAP PRUNED STATE SCAN (data skipping) -----
# The q24 replay builds real physical state (COW bases + MOR deltas, each
# dir carrying a _zonemap.json column-bounds sidecar, sinks/zonemap.py);
# the Spark side then reads it through read_state(where=...), which plans
# the scan against the sidecars — dirs whose min/max bounds prove no row
# can match never enter the job (Iceberg manifest-stats skipping) — and
# applies the exact predicate to whatever survives. The oracle computes the
# same filtered aggregate over the algebraic replay state, so a wrong skip
# (a pruned dir that actually held matching rows, or a stale superseded row
# resurrected by a dropped newer delta) breaks the value hash. Pruning
# effectiveness (dirs actually skipped) is asserted in tests/test_zonemap.py;
# here the driver proves pruning never changes answers.
_Q146_SQL = f"""
    WITH {_Q24_BASE_CTES},{_q24_state_ctes("", "TRUE")}
    SELECT source, count(*) AS n_docs, sum(n_tok)::BIGINT AS sum_n_tok,
           min(doc_id) AS min_doc, max(doc_id) AS max_doc
    FROM state
    WHERE n_tok >= 3 AND doc_id >= '0000000000100'
    GROUP BY source
"""


@query("q146_zonemap_pruned_scan", _Q146_SQL)
def q146(spark, sf_dir):
    from georef_ar_etl_spark.engine import CdcEngine

    initial, events = _q24_inputs(spark, sf_dir)
    root = _ephemeral_table_root("zonemap_q146", sf_dir)
    eng = CdcEngine(spark, root, n_buckets=16)
    eng.bootstrap(initial)
    eng.replay(events, batch_ids=[0, 1, 2, 3])
    st = eng.state(
        where=[("n_tok", ">=", 3), ("doc_id", ">=", "0000000000100")]
    )
    return st.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").cast("long").alias("sum_n_tok"),
        F.min("doc_id").alias("min_doc"),
        F.max("doc_id").alias("max_doc"),
    )


# ------------------- q147: HARD KEY PURGE (right-to-be-forgotten) ----------
# The q24 replay builds real physical state; the Spark side then runs
# engine.purge_keys — Delta's documented GDPR recipe (synthetic delete
# batch → compact → vacuum(keep_last=1) → metrics redaction → distributed
# verification sweep that raises if any key survives in ANY remaining
# parquet file). The purged set is deterministic (numeric doc id % 41 = 0),
# so the oracle is the q24 replay state minus exactly those keys: a purge
# that under-deletes (survivor), over-deletes (collateral) or perturbs any
# non-purged row breaks the value hash. Physical erasure (raw bytes gone
# from every file under the root, history expired) is asserted in
# tests/test_purge.py.
_Q147_SQL = f"""
    WITH {_Q24_BASE_CTES},{_q24_state_ctes("", "TRUE")}
    SELECT doc_id, md5(array_to_string(tokens, ',')) AS tokens_fp, n_tok, source
    FROM state
    WHERE doc_id::BIGINT % 41 <> 0
"""


@query("q147_purge_keys", _Q147_SQL)
def q147(spark, sf_dir):
    from georef_ar_etl_spark.engine import CdcEngine

    initial, events = _q24_inputs(spark, sf_dir)
    root = _ephemeral_table_root("purge_q147", sf_dir)
    eng = CdcEngine(spark, root, n_buckets=16)
    eng.bootstrap(initial)
    eng.replay(events, batch_ids=[0, 1, 2, 3])
    purged = [f"{i:013d}" for i in range(0, 600, 41)]
    eng.purge_keys(purged, batch_id=4)
    return eng.state().select(
        "doc_id",
        _arr_fp(F.col("tokens")).alias("tokens_fp"),
        "n_tok",
        "source",
    )


# ----------- q148: INCREMENTALLY-MAINTAINED JOIN VIEW (fact x dim CDC) -----
# The materialized-view side of CDC: V = fact LEFT JOIN dim, maintained
# from BOTH changelogs via the affected-keys recompute
# (operators/view_maintenance.py — keys touched by dfact plus fact rows
# whose join value points at a changed dim key, recomputed from current
# state: convergent under any interleaving, O(affected) per refresh, never
# O(|fact|)). The Spark side replays the q24 fact in two halves with a dim
# update+insert epoch in between — the view is never recomputed whole after
# bootstrap — while the oracle joins the FINAL states directly: any stale
# view row, missed dim fan-out, or phantom breaks the value hash.
_Q148_SQL = f"""
    WITH {_Q24_BASE_CTES},{_q24_state_ctes("", "TRUE")},
    dim0 AS (SELECT DISTINCT source AS s FROM documents),
    dimf AS (
      SELECT s, upper(s) AS region,
             (length(s) + CASE WHEN s LIKE 's%' THEN 1 ELSE 0 END)::INT
               AS weight
      FROM dim0
      UNION ALL
      SELECT DISTINCT event_type, upper(event_type), 100::INT FROM events
      WHERE event_type NOT IN (SELECT s FROM dim0))
    SELECT st.doc_id, md5(array_to_string(st.tokens, ',')) AS tokens_fp,
           st.n_tok, st.source, d.region, d.weight
    FROM state st LEFT JOIN dimf d ON st.source = d.s
"""


@query("q148_incremental_join_view", _Q148_SQL)
def q148(spark, sf_dir):
    from pyspark.sql import types as T

    from georef_ar_etl_spark.engine import CdcEngine
    from georef_ar_etl_spark.operators.view_maintenance import JoinView
    from georef_ar_etl_spark.schemas import STATE_SCHEMA
    from georef_ar_etl_spark.sinks.snapshot_table import (
        SnapshotTable,
        bucket_expr,
    )

    dim_schema = T.StructType(
        [
            T.StructField("source", T.StringType(), False),
            T.StructField("region", T.StringType(), True),
            T.StructField("weight", T.IntegerType(), True),
        ]
    )
    initial, events = _q24_inputs(spark, sf_dir)
    root = _ephemeral_table_root("join_view_q148", sf_dir)
    fact = CdcEngine(spark, f"{root}/fact", n_buckets=16)
    fact.bootstrap(initial)

    dim = SnapshotTable(spark, f"{root}/dim", n_buckets=4)
    doc_sources = _t(spark, sf_dir, "documents").select("source").distinct()

    def commit_dim(df, epoch):
        dim.commit(
            epoch=epoch,
            schema=dim_schema,
            new_buckets_df=df.withColumn(
                "bucket", bucket_expr(F.col("source"), dim.n_buckets)
            ),
            touched_buckets=list(range(dim.n_buckets)),
            batch_id=epoch,
            batch_digest=f"dim:{epoch}",
            metrics={"kind": "apply"},
        )

    # dim epoch 0: document sources, pre-update weights
    commit_dim(
        doc_sources.select(
            "source",
            F.upper("source").alias("region"),
            F.length("source").cast("int").alias("weight"),
        ),
        0,
    )
    view = JoinView(
        spark, f"{root}/view", STATE_SCHEMA, dim_schema, "source", n_buckets=16
    )
    view.bootstrap(fact.state(), dim.read_state().drop("bucket"), 0, 0)

    # first half of the fact replay
    fact.replay(events.filter("batch_id < 2"), batch_ids=[0, 1])
    a1 = fact.table.latest_manifest()["epoch"]
    view.refresh(fact.table, dim, fact.changes(0, a1), a1, None, 0)

    # dim epoch 1: bump 's%' weights (update fan-out) + add the event_type
    # sources the fact's inserted rows reference (insert fan-out)
    ev_sources = (
        _t(spark, sf_dir, "events")
        .select(F.col("event_type").alias("source"))
        .distinct()
        .join(doc_sources, "source", "left_anti")
    )
    commit_dim(
        doc_sources.select(
            "source",
            F.upper("source").alias("region"),
            (
                F.length("source")
                + F.when(F.col("source").startswith("s"), 1).otherwise(0)
            )
            .cast("int")
            .alias("weight"),
        ).unionByName(
            ev_sources.select(
                "source",
                F.upper("source").alias("region"),
                F.lit(100).cast("int").alias("weight"),
            )
        ),
        1,
    )
    # second half of the fact replay, then one refresh consuming BOTH ranges
    fact.replay(events.filter("batch_id >= 2"), batch_ids=[2, 3])
    a2 = fact.table.latest_manifest()["epoch"]
    view.refresh(
        fact.table, dim, fact.changes(a1, a2), a2, dim.read_changes(0, 1), 1
    )
    return view.view().select(
        "doc_id",
        _arr_fp(F.col("tokens")).alias("tokens_fp"),
        "n_tok",
        "source",
        "region",
        "weight",
    )


# --------------- q149: REPLICA REPAIR PLAN (pt-table-sync) -----------------
# The acting half of q138's checksum reconciliation: a replica of the q24
# replay state is deterministically diverged (rows dropped, values
# corrupted, phantoms added) and repair_plan emits the MINIMAL CDC batch
# that converges it — checksum-mismatched buckets only are read and
# diffed (operators/validate.py:repair_plan). The oracle derives the same
# plan directly from the divergence spec: a row missed (stale replica row
# not repaired), over-repaired (matching row shipped), or a phantom not
# deleted breaks the hash.
_Q149_SQL = f"""
    WITH {_Q24_BASE_CTES},{_q24_state_ctes("", "TRUE")}
    SELECT 'upsert' AS op, doc_id,
           md5(array_to_string(tokens, ',')) AS tokens_fp, n_tok, source
    FROM state WHERE doc_id::BIGINT % 13 IN (5, 7)
    UNION ALL
    SELECT 'delete', lpad((900000 + i)::varchar, 13, '0'),
           NULL, NULL::INT, NULL
    FROM range(10) t(i)
"""


@query("q149_replica_repair_plan", _Q149_SQL)
def q149(spark, sf_dir):
    from georef_ar_etl_spark.engine import CdcEngine
    from georef_ar_etl_spark.operators.validate import repair_plan

    initial, events = _q24_inputs(spark, sf_dir)
    root = _ephemeral_table_root("repair_q149", sf_dir)
    eng = CdcEngine(spark, root, n_buckets=16)
    eng.bootstrap(initial)
    eng.replay(events, batch_ids=[0, 1, 2, 3])
    src = eng.state().select(
        "doc_id",
        _arr_fp(F.col("tokens")).alias("tokens_fp"),
        "n_tok",
        "source",
    )
    mod = F.col("doc_id").cast("long") % 13
    replica = (
        src.filter(mod != 5)  # dropped rows → the plan must re-upsert them
        .withColumn(  # corrupted rows → the plan must repair them
            "n_tok",
            F.when(mod == 7, F.col("n_tok") + 1).otherwise(F.col("n_tok")),
        )
        .unionByName(  # phantoms → the plan must delete them
            spark.range(10).select(
                F.lpad((F.col("id") + 900000).cast("string"), 13, "0").alias(
                    "doc_id"
                ),
                F.lit("phantom").alias("tokens_fp"),
                F.lit(1).cast("int").alias("n_tok"),
                F.lit("ghost").alias("source"),
            )
        )
    )
    stats = {}
    plan = repair_plan(
        src,
        replica,
        key="doc_id",
        cols=["doc_id", "tokens_fp", "n_tok", "source"],
        bucket_col=F.xxhash64("doc_id"),
        n_buckets=16,
        stats=stats,
    )
    return plan.select(
        "op", "doc_id", "tokens_fp", F.col("n_tok").cast("int").alias("n_tok"), "source"
    )


# --------------- q150: WRITE-AUDIT-PUBLISH GATED REPLAY ---------------------
# The q24 replay run through the WAP gate (engine.apply_audited: stage →
# expectation audit → publish/abandon). Batch 2 is deterministically
# poisoned — its token arrays are repeated 20×, so every valid upsert it
# carries normalizes to n_tok ≥ 40 — and the audit's range(n_tok ≤ 30)
# expectation must ABANDON it while batches 0/1/3 publish. The repetition
# preserves every ingest-validation verdict (empty stays empty, null
# elements stay null, all-nonpositive stays all-nonpositive), so the gate
# catches a batch that ingest validation provably cannot. The oracle is
# the q24 fold over the PUBLISHED batches only (batch_id <> 2): if the
# gate ever lets the poisoned batch through — or wrongly drops a clean
# one — the state hash breaks.
_Q150_SQL = f"""
    WITH {_Q24_BASE_CTES},{_q24_state_ctes("", "batch_id <> 2")}
    SELECT doc_id, md5(array_to_string(tokens, ',')) AS tokens_fp, n_tok, source
    FROM state
"""


@query("q150_wap_audited_replay", _Q150_SQL)
def q150(spark, sf_dir):
    from georef_ar_etl_spark.engine import CdcEngine

    initial, events = _q24_inputs(spark, sf_dir)
    events = events.withColumn(
        "tokens",
        F.when(
            F.col("batch_id") == 2,
            F.flatten(F.array_repeat(F.col("tokens"), 20)),
        ).otherwise(F.col("tokens")),
    )
    root = _ephemeral_table_root("wap_replay_q150", sf_dir)
    eng = CdcEngine(spark, root, n_buckets=16)
    eng.bootstrap(initial)
    exps = [
        ("not_null", "doc_id", {}),
        ("unique", "doc_id", {}),
        ("range", "n_tok", {"min": 0, "max": 30}),
    ]
    published = [
        eng.apply_audited(
            events.filter(F.col("batch_id") == b), b, exps,
            audit_touched_only=True,
        )["published"]
        for b in range(4)
    ]
    if published != [True, True, False, True]:
        raise RuntimeError(f"WAP gate verdicts wrong: {published}")
    return eng.state().select(
        "doc_id",
        _arr_fp(F.col("tokens")).alias("tokens_fp"),
        "n_tok",
        "source",
    )


# --------------- q151: DELETION-VECTOR REPLAY --------------------------------
# The q24 replay interrupted mid-stream by a positional deletion-vector
# commit (engine.delete_keys_dv): batches 0-1 apply, a compaction clears
# the chains (so the bloom routing provably takes the positional path —
# with live chains the erasure keys genuinely appear in the links and
# correctly tombstone instead, the pytest-covered fallback), a
# deterministic erasure list lands as per-file position masks, then
# batches 12-13 (the original 2-3, id-shifted past the DV commit to keep
# replay order monotonic) merge OVER the DV'd bases — delta-mode merges
# must carry the mask, rewrites must spend it, and a re-inserted erased
# key must come back. The oracle folds batches 0-1 onto init, removes the
# erasure list, then overlays the latest valid event of batches 2-3 — if
# any path resurrects a masked row or loses a carried one, the state hash
# breaks.
_Q151_KEYS = [f"{i:013d}" for i in range(0, 600, 7)]

_Q151_SQL = f"""
    WITH {_Q24_BASE_CTES},{_q24_state_ctes("01", "batch_id <= 1")},
    {_q24_state_ctes("23", "batch_id >= 2")},
    surv AS (
      SELECT * FROM state01
      WHERE doc_id NOT IN ({", ".join(f"'{k}'" for k in _Q151_KEYS)})),
    final AS (
      SELECT s.doc_id, s.tokens, s.n_tok, s.source FROM surv s
      WHERE NOT EXISTS (SELECT 1 FROM latest23 l WHERE l.doc_id = s.doc_id)
      UNION ALL
      SELECT doc_id, tokens, n_tok, source FROM ups23)
    SELECT doc_id, md5(array_to_string(tokens, ',')) AS tokens_fp, n_tok, source
    FROM final
"""


@query("q151_deletion_vector_replay", _Q151_SQL)
def q151(spark, sf_dir):
    from georef_ar_etl_spark.engine import CdcEngine

    initial, events = _q24_inputs(spark, sf_dir)
    root = _ephemeral_table_root("dv_replay_q151", sf_dir)
    eng = CdcEngine(spark, root, n_buckets=16)
    eng.bootstrap(initial)
    eng.replay(events.filter(F.col("batch_id") <= 1), batch_ids=[0, 1])
    eng.compact(min_deltas=1)
    rep = eng.delete_keys_dv(_Q151_KEYS, batch_id=5)
    if not rep["metrics"]["dv_buckets"] or rep["metrics"]["tombstone_buckets"]:
        raise RuntimeError(f"q151 routing unexpected: {rep['metrics']}")
    late = events.filter(F.col("batch_id") >= 2).withColumn(
        "batch_id", F.col("batch_id") + 10
    )
    eng.replay(late, batch_ids=[12, 13])
    return eng.state().select(
        "doc_id",
        _arr_fp(F.col("tokens")).alias("tokens_fp"),
        "n_tok",
        "source",
    )


# --------------- q152: PINNED-TAG REPRODUCIBLE READ --------------------------
# Snapshot refs (Iceberg tags): the q24 replay pins a tag after batches
# 0-1, keeps replaying (2-3), compacts, and vacuums down to keep_last=1 —
# then reads THROUGH THE TAG. The oracle folds only batches 0-1: the tag
# must reproduce the mid-replay state byte-for-byte even though every
# untagged intermediate epoch has been expired and the head has moved two
# batches past it. This is the training-reproducibility contract — "the
# run read exactly this table state" survives table maintenance.
_Q152_SQL = f"""
    WITH {_Q24_BASE_CTES},{_q24_state_ctes("", "batch_id <= 1")}
    SELECT doc_id, md5(array_to_string(tokens, ',')) AS tokens_fp, n_tok, source
    FROM state
"""


@query("q152_tagged_snapshot_read", _Q152_SQL)
def q152(spark, sf_dir):
    from georef_ar_etl_spark.engine import CdcEngine

    initial, events = _q24_inputs(spark, sf_dir)
    root = _ephemeral_table_root("tag_read_q152", sf_dir)
    eng = CdcEngine(spark, root, n_buckets=16)
    eng.bootstrap(initial)
    eng.replay(events.filter(F.col("batch_id") <= 1), batch_ids=[0, 1])
    eng.create_tag("train-run", description="q152 pinned read")
    eng.replay(events.filter(F.col("batch_id") >= 2), batch_ids=[2, 3])
    eng.compact(min_deltas=1)
    eng.vacuum(keep_last=1)
    return eng.state(tag="train-run").select(
        "doc_id",
        _arr_fp(F.col("tokens")).alias("tokens_fp"),
        "n_tok",
        "source",
    )


# --------------- q153: PREDICATE DELETE (RETENTION SWEEP) --------------------
# DELETE FROM t WHERE source='click' dropped mid-replay: batches 0-1 fold
# (leaving MOR chains on some buckets and clean bases on others, so BOTH
# delete machineries participate — zone-map-pruned DV position scan on
# chain-free buckets, distributed tombstone links on chain buckets), then
# batches 12-13 (the original 2-3, id-shifted) merge over the swept
# state — a re-inserted 'click' row must come back (the sweep is an
# event in the log, not a standing filter). The oracle folds 0-1,
# removes source='click' rows, overlays the latest valid event of 2-3.
_Q153_SQL = f"""
    WITH {_Q24_BASE_CTES},{_q24_state_ctes("01", "batch_id <= 1")},
    {_q24_state_ctes("23", "batch_id >= 2")},
    surv AS (SELECT * FROM state01 WHERE source <> 'click'),
    final AS (
      SELECT s.doc_id, s.tokens, s.n_tok, s.source FROM surv s
      WHERE NOT EXISTS (SELECT 1 FROM latest23 l WHERE l.doc_id = s.doc_id)
      UNION ALL
      SELECT doc_id, tokens, n_tok, source FROM ups23)
    SELECT doc_id, md5(array_to_string(tokens, ',')) AS tokens_fp, n_tok, source
    FROM final
"""


@query("q153_predicate_delete_replay", _Q153_SQL)
def q153(spark, sf_dir):
    from georef_ar_etl_spark.engine import CdcEngine

    initial, events = _q24_inputs(spark, sf_dir)
    root = _ephemeral_table_root("dvwhere_replay_q153", sf_dir)
    eng = CdcEngine(spark, root, n_buckets=16)
    eng.bootstrap(initial)
    eng.replay(events.filter(F.col("batch_id") <= 1), batch_ids=[0, 1])
    rep = eng.delete_where([("source", "=", "click")], batch_id=5)
    if not rep["metrics"]["deleted"]:
        raise RuntimeError("q153 expected the sweep to delete rows")
    late = events.filter(F.col("batch_id") >= 2).withColumn(
        "batch_id", F.col("batch_id") + 10
    )
    eng.replay(late, batch_ids=[12, 13])
    return eng.state().select(
        "doc_id",
        _arr_fp(F.col("tokens")).alias("tokens_fp"),
        "n_tok",
        "source",
    )


# --------------- q154: METADATA-ONLY RENAME/DROP REPLAY ----------------------
# Schema evolution beyond additive: batch 0 lands an evolved src_meta
# column, a METADATA-ONLY rename flips it to origin_meta (no data file
# moves — Iceberg field-ID mapping, snapshot_table.colmap), batch 1
# addresses the NEW name and must bind to the SAME physical column, then
# the column is DROPPED and batches 12-13 (the original 2-3, id-shifted)
# RE-ADD the ORIGINAL spelling src_meta — whose physical name is retired
# in dropped_cols, so the engine must bind a FRESH suffixed physical
# column: any resurrection of pre-drop values surfaces as extra non-null
# src_meta cells and breaks the hash. The oracle folds the log with
# src_meta defined ONLY by the post-drop batches (survivors NULL).
_Q154_SQL = f"""
    WITH {_Q24_BASE_CTES},{_q24_state_ctes("01", "batch_id <= 1")},
    {_q24_state_ctes("23", "batch_id >= 2")},
    final AS (
      SELECT s.doc_id, s.tokens, s.n_tok, s.source,
             NULL::varchar AS src_meta
      FROM state01 s
      WHERE NOT EXISTS (SELECT 1 FROM latest23 l WHERE l.doc_id = s.doc_id)
      UNION ALL
      SELECT doc_id, tokens, n_tok, source,
             'n' || substr(doc_id, 11, 3) AS src_meta
      FROM ups23)
    SELECT doc_id, md5(array_to_string(tokens, ',')) AS tokens_fp, n_tok,
           source, src_meta
    FROM final
"""


@query("q154_rename_drop_replay", _Q154_SQL)
def q154(spark, sf_dir):
    from georef_ar_etl_spark.engine import CdcEngine

    initial, events = _q24_inputs(spark, sf_dir)
    root = _ephemeral_table_root("rename_drop_q154", sf_dir)
    eng = CdcEngine(spark, root, n_buckets=16)
    eng.bootstrap(initial)
    ev0 = events.filter(F.col("batch_id") == 0).withColumn(
        "src_meta", F.concat(F.lit("m"), F.substring("doc_id", 12, 2))
    )
    m0 = eng.apply_batch(ev0, 0)
    if m0["metrics"]["schema_added_columns"] != ["src_meta"]:
        raise RuntimeError("q154 expected src_meta to evolve in")
    eng.rename_column("src_meta", "origin_meta")
    ev1 = events.filter(F.col("batch_id") == 1).withColumn(
        "origin_meta", F.concat(F.lit("r"), F.substring("doc_id", 13, 1))
    )
    m1 = eng.apply_batch(ev1, 1)
    if m1["metrics"]["schema_added_columns"]:
        raise RuntimeError("q154: post-rename batch must bind, not add")
    eng.drop_column("origin_meta")
    late = (
        events.filter(F.col("batch_id") >= 2)
        .withColumn("batch_id", F.col("batch_id") + 10)
        .withColumn(
            "src_meta", F.concat(F.lit("n"), F.substring("doc_id", 11, 3))
        )
    )
    eng.replay(late, batch_ids=[12, 13])
    head = eng.table.latest_manifest()
    if not head["colmap"].get("src_meta", "").startswith("src_meta__e"):
        raise RuntimeError("q154: re-added column must bind a fresh physical")
    return eng.state().select(
        "doc_id",
        _arr_fp(F.col("tokens")).alias("tokens_fp"),
        "n_tok",
        "source",
        "src_meta",
    )


# --------------- q155: PREDICATE UPDATE (ROW-LEVEL UPDATE) -------------------
# UPDATE t SET tokens = tokens || [7,7], source = 'swept' WHERE
# source='click', dropped mid-replay: batches 0-1 fold (MOR chains on some
# buckets, clean bases on others — the update's read side composes the
# DV/chain-aware resolve with zone-map pruning), the update lands as one
# upsert delta link per touched bucket with the engine re-deriving
# n_tok = size(tokens) from the POST-update array, then batches 12-13
# (the original 2-3, id-shifted) merge over the updated state — a later
# event on an updated doc must win (the update is an event in the log,
# not a standing rule). The oracle folds 0-1, applies the SET to matching
# rows, overlays the latest valid event of 2-3.
_Q155_SQL = f"""
    WITH {_Q24_BASE_CTES},{_q24_state_ctes("01", "batch_id <= 1")},
    {_q24_state_ctes("23", "batch_id >= 2")},
    upd AS (
      SELECT doc_id,
             CASE WHEN source = 'click'
                  THEN tokens || [7, 7]::INT[] ELSE tokens END AS tokens,
             CASE WHEN source = 'click'
                  THEN (n_tok + 2)::INT ELSE n_tok END AS n_tok,
             CASE WHEN source = 'click' THEN 'swept' ELSE source END AS source
      FROM state01),
    final AS (
      SELECT u.doc_id, u.tokens, u.n_tok, u.source FROM upd u
      WHERE NOT EXISTS (SELECT 1 FROM latest23 l WHERE l.doc_id = u.doc_id)
      UNION ALL
      SELECT doc_id, tokens, n_tok, source FROM ups23)
    SELECT doc_id, md5(array_to_string(tokens, ',')) AS tokens_fp, n_tok, source
    FROM final
"""


@query("q155_predicate_update_replay", _Q155_SQL)
def q155(spark, sf_dir):
    from georef_ar_etl_spark.engine import CdcEngine

    initial, events = _q24_inputs(spark, sf_dir)
    root = _ephemeral_table_root("update_where_q155", sf_dir)
    eng = CdcEngine(spark, root, n_buckets=16)
    eng.bootstrap(initial)
    eng.replay(events.filter(F.col("batch_id") <= 1), batch_ids=[0, 1])
    rep = eng.update_where(
        {"tokens": "concat(tokens, array(7, 7))", "source": "'swept'"},
        [("source", "=", "click")],
        batch_id=5,
    )
    if not rep["metrics"]["updated"]:
        raise RuntimeError("q155 expected the update to touch rows")
    late = events.filter(F.col("batch_id") >= 2).withColumn(
        "batch_id", F.col("batch_id") + 10
    )
    eng.replay(late, batch_ids=[12, 13])
    return eng.state().select(
        "doc_id",
        _arr_fp(F.col("tokens")).alias("tokens_fp"),
        "n_tok",
        "source",
    )


# --------------- q156: CONDITIONAL MERGE INTO --------------------------------
# MERGE INTO state USING source ON doc_id — the full ordered clause
# program over the folded batches-0-1 state (MOR chains on some buckets):
#   WHEN MATCHED AND size(s.tokens)=0    THEN DELETE        (clause order
#   WHEN MATCHED AND t.source='click'    THEN UPDATE set      matters: an
#        tokens=s.tokens, source='merged'                     empty-token
#   WHEN MATCHED                         THEN UPDATE set      source row on
#        tokens=t.tokens||s.tokens                            a click doc
#   WHEN NOT MATCHED AND size(s.tokens)>=3 THEN INSERT        deletes)
# with the engine re-deriving n_tok = size(tokens) on every written row.
# Source = the latest batch-2 event per doc (row_number dedupe — MERGE
# refuses ambiguous duplicate source keys). The oracle evaluates the same
# clause program as one CASE over a FULL JOIN of the folded state and the
# identically-derived source.
_Q156_SQL = f"""
    WITH {_Q24_BASE_CTES},{_q24_state_ctes("01", "batch_id <= 1")},
    srcraw AS (
      SELECT lpad((event_id % 700)::varchar, 13, '0') AS doc_id,
             CASE WHEN event_id % 11 = 0 THEN []::INT[]
                  WHEN event_id % 3 = 0 THEN
                    [(event_id % 89)::INT, (user_id % 47 + 1)::INT,
                     ((event_id % 13) + 1)::INT]
                  ELSE [(event_id % 89)::INT, (user_id % 47 + 1)::INT]
             END AS tokens,
             event_type AS source, event_id
      FROM events WHERE event_id % 4 = 2),
    src AS (
      SELECT doc_id, tokens, source FROM (
        SELECT *, row_number() OVER (PARTITION BY doc_id
                                     ORDER BY event_id DESC) AS rn
        FROM srcraw) WHERE rn = 1),
    joined AS (
      SELECT coalesce(t.doc_id, s.doc_id) AS doc_id,
             t.doc_id IS NOT NULL AS has_t, s.doc_id IS NOT NULL AS has_s,
             t.tokens AS t_tokens, t.source AS t_source,
             s.tokens AS s_tokens, s.source AS s_source
      FROM state01 t FULL JOIN src s ON t.doc_id = s.doc_id),
    eff AS (
      SELECT doc_id,
             CASE WHEN has_t AND has_s THEN
                    CASE WHEN len(s_tokens) = 0 THEN NULL
                         WHEN t_source = 'click' THEN s_tokens
                         ELSE list_concat(t_tokens, s_tokens) END
                  WHEN has_s THEN
                    CASE WHEN len(s_tokens) >= 3 THEN s_tokens END
                  ELSE t_tokens END AS tokens,
             CASE WHEN has_t AND has_s THEN
                    CASE WHEN len(s_tokens) = 0 THEN NULL
                         WHEN t_source = 'click' THEN 'merged'
                         ELSE t_source END
                  WHEN has_s THEN
                    CASE WHEN len(s_tokens) >= 3 THEN s_source END
                  ELSE t_source END AS source,
             (has_t AND has_s AND len(s_tokens) = 0)
               OR (has_s AND NOT has_t AND len(s_tokens) < 3) AS gone
      FROM joined)
    SELECT doc_id, md5(array_to_string(tokens, ',')) AS tokens_fp,
           len(tokens)::INT AS n_tok, source
    FROM eff WHERE NOT gone
"""


@query("q156_merge_into_conditional", _Q156_SQL)
def q156(spark, sf_dir):
    from georef_ar_etl_spark.engine import CdcEngine

    initial, events_log = _q24_inputs(spark, sf_dir)
    root = _ephemeral_table_root("merge_into_q156", sf_dir)
    eng = CdcEngine(spark, root, n_buckets=16)
    eng.bootstrap(initial)
    eng.replay(events_log.filter(F.col("batch_id") <= 1), batch_ids=[0, 1])

    ev = _t(spark, sf_dir, "events")
    eid, uid = F.col("event_id"), F.col("user_id")
    src = (
        ev.filter(eid % 4 == 2)
        .select(
            F.lpad((eid % 700).cast("string"), 13, "0").alias("doc_id"),
            F.when(eid % 11 == 0, F.array().cast("array<int>"))
            .when(
                eid % 3 == 0,
                F.array(
                    (eid % 89).cast("int"),
                    (uid % 47 + 1).cast("int"),
                    ((eid % 13) + 1).cast("int"),
                ),
            )
            .otherwise(
                F.array((eid % 89).cast("int"), (uid % 47 + 1).cast("int"))
            )
            .alias("tokens"),
            F.col("event_type").alias("source"),
            eid.alias("event_id"),
        )
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("doc_id").orderBy(F.col("event_id").desc())
            ),
        )
        .filter(F.col("rn") == 1)
        .drop("rn", "event_id")
    )
    rep = eng.merge_into(
        src,
        batch_id=5,
        when_matched=[
            ("size(s_tokens) = 0", "delete", None),
            (
                "t_source = 'click'",
                "update",
                {"tokens": "s_tokens", "source": "'merged'"},
            ),
            (None, "update", {"tokens": "concat(t_tokens, s_tokens)"}),
        ],
        when_not_matched=[("size(s_tokens) >= 3", None)],
    )
    if not (rep["metrics"]["deleted"] and rep["metrics"]["inserted"]):
        raise RuntimeError("q156 expected all clause families to fire")
    return eng.state().select(
        "doc_id",
        _arr_fp(F.col("tokens")).alias("tokens_fp"),
        "n_tok",
        "source",
    )


# --------------- q157: DEEP CLONE (EXPERIMENT FORK) --------------------------
# Fork isolation: batches 0-1 fold, the table is CLONED (deep snapshot
# copy: bases, MOR chains, exactly-once ledger), then the SOURCE runs a
# destructive predicate sweep while the CLONE replays the remaining
# batches (12-13 = the original 2-3, id-shifted past the fork ledger).
# The clone's final state must equal the full undisturbed fold — the
# source's post-fork sweep must be invisible to the fork. The oracle is
# the plain full-log fold (q24's algebra); the machinery under test is
# the fork: cloned ledger (the shifted ids must APPLY, the pre-fork ids
# must short-circuit) and cloned data dirs read through a different root.
_Q157_SQL = f"""
    WITH {_Q24_BASE_CTES},{_q24_state_ctes("", "TRUE")}
    SELECT doc_id, md5(array_to_string(tokens, ',')) AS tokens_fp, n_tok, source
    FROM state
"""


@query("q157_clone_fork_replay", _Q157_SQL)
def q157(spark, sf_dir):
    from georef_ar_etl_spark.engine import CdcEngine

    initial, events = _q24_inputs(spark, sf_dir)
    root = _ephemeral_table_root("clone_fork_q157", sf_dir)
    eng = CdcEngine(spark, root, n_buckets=16)
    eng.bootstrap(initial)
    eng.replay(events.filter(F.col("batch_id") <= 1), batch_ids=[0, 1])
    clone = eng.clone_to(root + "_fork")
    # source diverges destructively; the fork must not see it
    eng.delete_where([("source", "=", "click")], batch_id=5)
    # pre-fork redelivery on the clone is a verified no-op
    clone.replay(events.filter(F.col("batch_id") <= 1), batch_ids=[0, 1])
    late = events.filter(F.col("batch_id") >= 2).withColumn(
        "batch_id", F.col("batch_id") + 10
    )
    clone.replay(late, batch_ids=[12, 13])
    return clone.state().select(
        "doc_id",
        _arr_fp(F.col("tokens")).alias("tokens_fp"),
        "n_tok",
        "source",
    )


# --------------- q158: ZERO-COPY BRANCH + FAST-FORWARD ----------------------
# Branch lifecycle end-to-end: batches 0-1 fold on the table, a ZERO-COPY
# branch forks (no data copied — the branch reads the parent's files in
# place under the fork pin), the PARENT runs routine maintenance
# (compaction — visible-state-preserving, so it must NOT block the merge),
# the branch replays the remaining batches (12-13 = the original 2-3,
# id-shifted past the carried ledger; a pre-fork redelivery must
# short-circuit on the branch), and fast_forward publishes the branch
# chain back — renumbered past and REBASED over the interim compaction.
# The PARENT's final state must equal the full undisturbed fold: same
# oracle algebra as q24/q157; the machinery under test is the fork pin,
# the carried exactly-once ledger, and the rebase publish.
_Q158_SQL = f"""
    WITH {_Q24_BASE_CTES},{_q24_state_ctes("", "TRUE")}
    SELECT doc_id, md5(array_to_string(tokens, ',')) AS tokens_fp, n_tok, source
    FROM state
"""


@query("q158_branch_fast_forward", _Q158_SQL)
def q158(spark, sf_dir):
    from georef_ar_etl_spark.engine import CdcEngine

    initial, events = _q24_inputs(spark, sf_dir)
    root = _ephemeral_table_root("branch_ff_q158", sf_dir)
    eng = CdcEngine(spark, root, n_buckets=16)
    eng.bootstrap(initial)
    eng.replay(events.filter(F.col("batch_id") <= 1), batch_ids=[0, 1])
    br = eng.create_branch("exp")
    # routine parent maintenance while the experiment runs: rows
    # identical, so the later fast-forward rebases over it
    eng.compact(min_deltas=0)
    # pre-fork redelivery on the branch is a verified no-op
    br.replay(events.filter(F.col("batch_id") <= 1), batch_ids=[0, 1])
    late = events.filter(F.col("batch_id") >= 2).withColumn(
        "batch_id", F.col("batch_id") + 10
    )
    br.replay(late, batch_ids=[12, 13])
    rep = eng.fast_forward("exp")
    if len(rep["published_epochs"]) != 2:
        raise RuntimeError("q158 expected to publish exactly 2 branch epochs")
    return eng.state().select(
        "doc_id",
        _arr_fp(F.col("tokens")).alias("tokens_fp"),
        "n_tok",
        "source",
    )


# ---------------- q159: BLOOM-FILTER PRUNED POINT PROBES --------------------
# Column Bloom skipping (sinks/zonemap.py column blooms): equality / IN
# probes on the HIGH-CARDINALITY key column, where min/max zone maps keep
# every hash bucket because each spans the whole id domain. The q24 replay
# builds real physical state, one indexing compact() persists
# bloom_cols=[doc_id, source] in the manifest, and the remaining batches
# fold as merge-on-read deltas whose sidecars must maintain the blooms
# (a delta dropped by a stale bloom would resurrect superseded rows). The
# probe set is every multiple-of-7 id under 600 — present keys, updated
# keys, deleted keys and never-existing keys — and the oracle filters the
# algebraic replay state with the equivalent predicate, so a wrong skip
# anywhere in the base+delta chain breaks the value hash. Pruning
# effectiveness (dirs actually skipped on point probes) is asserted in
# tests/test_bloom_skipping.py; here the driver proves the bloom path
# never changes answers.
_Q159_SQL = f"""
    WITH {_Q24_BASE_CTES},{_q24_state_ctes("", "TRUE")}
    SELECT doc_id, md5(array_to_string(tokens, ',')) AS tokens_fp, n_tok, source
    FROM state
    WHERE doc_id::BIGINT % 7 = 0 AND doc_id::BIGINT < 600
"""


@query("q159_bloom_pruned_probes", _Q159_SQL)
def q159(spark, sf_dir):
    from georef_ar_etl_spark.engine import CdcEngine

    initial, events = _q24_inputs(spark, sf_dir)
    root = _ephemeral_table_root("bloom_q159", sf_dir)
    eng = CdcEngine(spark, root, n_buckets=16)
    eng.bootstrap(initial)
    eng.replay(events.filter(F.col("batch_id") <= 1), batch_ids=[0, 1])
    # one-time indexing rewrite; the column list persists in the manifest
    eng.compact(min_deltas=0, bloom_cols=["doc_id", "source"])
    # later batches land as MOR deltas — their sidecars carry blooms too
    eng.replay(events.filter(F.col("batch_id") >= 2), batch_ids=[2, 3])
    probe_ids = [f"{i:013d}" for i in range(0, 600, 7)]
    st = eng.state(where=[("doc_id", "in", probe_ids)])
    return st.select(
        "doc_id",
        _arr_fp(F.col("tokens")).alias("tokens_fp"),
        "n_tok",
        "source",
    )

"""Side-by-side contract check: every queries() entry vs its DuckDB oracle at
sf0.001 — replicating the driver's compare (row count, column names, and an
order-insensitive value hash over name-sorted columns).

The oracle side goes through ``duckdb ... .df()`` (pandas) exactly like the
driver, and canon() is DTYPE-SENSITIVE: an int64 ``4079`` and a float64
``4079.0`` canonicalize differently.  This is deliberate — duckdb's
``sum(BIGINT)`` returns HUGEINT, which pandas renders as float64, and the
driver's hash rejects that even when every value is numerically equal
(round-4 q49/q50/q53 regression).  Local green must imply driver green."""

import math
import os

import duckdb
import numpy as np
import pytest

import __spark_entry__ as entry_mod

# default to sf0.01: it is the SF the driver's correctness gate runs at, and
# the q26 oracle inlines an index trained on the sf0.01 parquet
SF_DIR = os.environ.get("CONTRACT_SF_DIR", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def canon(v):
    # bool before int: bool is a subclass of int in both python and numpy
    if isinstance(v, (bool, np.bool_)):
        return str(bool(v))
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, (float, np.floating)):
        f = float(v)
        if math.isnan(f):
            return "nan"
        # 'f' marker: a float64 4079.0 must NOT collapse to the int64 4079
        # (dtype-sensitive like the driver); %.10g still folds last-bit
        # double differences between engines
        return f"f{f:.10g}"
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def value_bag(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(canon(r[i]) for i in order) for r in rows)


ORACLED = sorted(entry_mod.oracle_sql())


@pytest.mark.parametrize("name", ORACLED)
def test_query_matches_oracle(spark, ddb, name):
    q = entry_mod.queries()[name]
    sdf = q(spark, SF_DIR)
    scols = sdf.columns
    # toPandas(), NOT collect(): the driver compares pandas-to-pandas, where
    # a nullable int64 column (e.g. q48's left-join miss rows) becomes
    # float64 on BOTH sides — collect() would keep python ints and flag a
    # mismatch the driver does not (and vice versa for HUGEINT sums)
    spdf = sdf.toPandas()
    srows = [tuple(r) for r in spdf.itertuples(index=False, name=None)]

    # .df() (pandas), NOT fetchall(): the driver compares through pandas,
    # where duckdb HUGEINT becomes float64 — fetchall() hands back python
    # ints and would hide exactly the dtype drift the driver rejects
    odf = ddb.execute(entry_mod.oracle_sql()[name]).df()
    dcols = list(odf.columns)
    drows = [tuple(r) for r in odf.itertuples(index=False, name=None)]

    assert sorted(scols) == sorted(dcols), f"{name}: columns {scols} vs {dcols}"
    assert len(srows) == len(drows), f"{name}: rows {len(srows)} vs {len(drows)}"
    sbag, dbag = value_bag(scols, srows), value_bag(dcols, drows)
    mismatches = [(a, b) for a, b in zip(sbag, dbag) if a != b]
    assert not mismatches, f"{name}: first mismatches {mismatches[:3]}"


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() >= 0
    assert df.schema is not None


@pytest.mark.parametrize("name", sorted(set(entry_mod.queries()) - set(ORACLED)))
def test_rows_only_queries_run(spark, name):
    df = entry_mod.queries()[name](spark, SF_DIR)
    assert df.count() >= 0

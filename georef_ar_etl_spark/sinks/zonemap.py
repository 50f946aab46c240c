"""Column zone-map sidecars: Iceberg-style file-level min/max data skipping.

Key-based pruning (bucket hash + bloom sidecars, snapshot_table.lookup_keys)
answers "which files can hold THIS key"; zone maps answer the other planning
question a 100 TB scan asks: "which files can hold rows matching THIS VALUE
predicate" (``n_tok > 4096``, ``source = 'web'``). Iceberg keeps per-file
lower/upper bounds in its manifests and plans scans against them before a
single data byte moves; this module is that idea on the snapshot table's
dir-per-bucket layout: every data dir (base ``bucket=`` or MOR ``delta=``)
carries a ``_zonemap.json`` sidecar with per-column min/max/null counts, and
``read_state(where=...)`` drops dirs the sidecar proves irrelevant BEFORE the
Spark job is planned. At cluster scale that is the difference between
launching tasks for 10^5 files and for the handful whose ranges overlap the
predicate — parquet row-group stats only help after the task already started.

Sidecars are computed where the rows already are:

* merge/COW tasks (``operators/copart_merge.py``) and delta writers
  (``sinks/mor.py``) hold the bucket's pandas frame — stats are a vectorized
  min/max over it, no extra read;
* driver-side bulk writes (``SnapshotTable._write_buckets``: bootstrap,
  compaction, rescale) read each file's parquet FOOTER statistics
  (``pyarrow.parquet``) — kilobytes per file, zero data pages, the same
  metadata Iceberg's ``add_files`` harvests.

Skipping is conservative and NEVER wrong, only missed:

* a dir without a sidecar (pre-zonemap epochs) is always read;
* a column absent from the sidecar (unsupported type, all-null in the dir)
  never excludes;
* NULL never satisfies a comparison predicate (SQL semantics), so min/max
  over non-null values excludes correctly even when the dir holds nulls;
* on a merge-on-read chain the whole BUCKET is skipped only when the base
  and EVERY delta exclude. Links are never dropped individually: unlike the
  key blooms (a skipped link provably never mentions the key, so
  last-writer-wins is unchanged), a value-skipped newer delta could carry
  the row version that SUPERSEDES an older matching one — dropping it would
  resurrect the stale row. Whole-bucket exclusion is safe because resolved
  rows are a subset of the union of link rows: if no link row can satisfy,
  no resolved row can.

The residual predicate is always applied as a real ``.filter`` on the
returned DataFrame, so results are exact whether or not anything pruned —
pruning only changes the physical plan. Reference analogue: the source-side
CQL_FILTER/WHERE pruning the reference pushes into its table reads
(georef_ar_etl/streets.py:24-31), lifted from "push the predicate" to "plan
the file set with it".

Predicate DSL: a list of ``(column, op, literal)`` triples, AND-combined;
``op`` in ``= < <= > >= in``. Tiny by design — conjunctions of range/equality
predicates are what zone maps can act on; anything richer belongs in the
post-read ``.filter``.
"""

from __future__ import annotations

import json
import math
import os

import pyarrow.parquet as pq
from pyspark.sql import Column
from pyspark.sql import functions as F

ZONEMAP_SIDECAR = "_zonemap.json"

_OPS = {"=", "<", "<=", ">", ">=", "in"}

# column types the sidecar keeps bounds for; everything else (arrays,
# structs, binary) is simply absent → never excludes
_NUMERIC = (int, float)


def _json_safe(v):
    """numpy/pyarrow scalars → plain Python; non-finite floats and
    unsupported types → None (column dropped from the map)."""
    if hasattr(v, "item"):
        v = v.item()
    if isinstance(v, bool):
        return None
    if isinstance(v, _NUMERIC):
        return None if isinstance(v, float) and not math.isfinite(v) else v
    if isinstance(v, str):
        return v
    return None


def zonemap_from_pandas(pdf, cols=None) -> dict:
    """Zone map of a pandas frame (the rows a merge/delta task is about to
    write). ``cols`` limits which columns are mapped (default: all supported).
    """
    out: dict = {"rows": int(len(pdf)), "cols": {}, "nulls_only": {}}
    for c in cols if cols is not None else pdf.columns:
        if c not in pdf.columns:
            continue
        s = pdf[c].dropna()
        if len(s) == 0:
            if len(pdf) > 0:
                out["nulls_only"][c] = int(len(pdf))
            continue
        v0 = s.iloc[0]
        # containers (token arrays, binary payloads) carry no orderable bounds
        if hasattr(v0, "__len__") and not isinstance(v0, str):
            continue
        lo, hi = _json_safe(s.min()), _json_safe(s.max())
        if lo is None or hi is None:
            continue
        out["cols"][c] = {
            "min": lo, "max": hi, "nulls": int(pdf[c].isna().sum()),
        }
    return out


def _zonemap_from_one_footer(path: str) -> dict:
    """Zone map of a single parquet file from its footer statistics only (no
    data pages). Columns lacking stats in any row group are dropped — a
    partial bound could exclude wrongly."""
    mins: dict = {}
    maxs: dict = {}
    nulls: dict = {}
    dropped: set = set()
    md = pq.ParquetFile(path).metadata
    rows = md.num_rows
    for rg in range(md.num_row_groups):
        g = md.row_group(rg)
        for ci in range(g.num_columns):
            col = g.column(ci)
            c = col.path_in_schema
            if "." in c or c in dropped:  # nested leaves: unsupported
                dropped.add(c)
                continue
            st = col.statistics
            if st is None or not st.has_min_max:
                # all-null groups legitimately have no bounds; only the
                # null count must still be complete for the column
                if st is not None and st.null_count == col.num_values:
                    nulls[c] = nulls.get(c, 0) + int(st.null_count)
                    continue
                dropped.add(c)
                continue
            lo, hi = _json_safe(st.min), _json_safe(st.max)
            if lo is None or hi is None:
                dropped.add(c)
                continue
            mins[c] = lo if c not in mins else min(mins[c], lo)
            maxs[c] = hi if c not in maxs else max(maxs[c], hi)
            nulls[c] = nulls.get(c, 0) + int(st.null_count or 0)
    cols = {
        c: {"min": mins[c], "max": maxs[c], "nulls": nulls.get(c, 0)}
        for c in mins
        if c not in dropped
    }
    nulls_only = {
        c: n
        for c, n in nulls.items()
        if c not in mins and c not in dropped and n >= rows > 0
    }
    return {"rows": rows, "cols": cols, "nulls_only": nulls_only}


def _merge_zonemaps(maps: list[dict]) -> dict:
    """Dir-level rollup of per-file maps: bounds union, a column kept only
    when EVERY member file bounds it (a missing bound could exclude
    wrongly); nulls_only only when all-null in every file."""
    rows = sum(m.get("rows", 0) for m in maps)
    out: dict = {"rows": rows, "cols": {}, "nulls_only": {}}
    if not maps:
        return out
    shared = set(maps[0].get("cols") or {})
    for m in maps[1:]:
        shared &= set(m.get("cols") or {})
    for c in shared:
        sts = [m["cols"][c] for m in maps]
        out["cols"][c] = {
            "min": min(s["min"] for s in sts),
            "max": max(s["max"] for s in sts),
            "nulls": sum(int(s.get("nulls", 0)) for s in sts),
        }
    no_shared = set(maps[0].get("nulls_only") or {})
    for m in maps[1:]:
        no_shared &= set(m.get("nulls_only") or {})
    for c in no_shared:
        out["nulls_only"][c] = sum(int(m["nulls_only"][c]) for m in maps)
    return out


def zonemap_from_footers(dir_path: str) -> dict:
    """Zone map of a data dir from parquet footer statistics only: the
    dir-level rollup PLUS a per-file ``files`` section, so the reader can
    prune individual files inside a kept dir (the Iceberg per-data-file
    stats granularity — what makes skipping bite after a clustered
    compaction splits a bucket into value-ordered files)."""
    per_file: dict = {}
    for name in sorted(os.listdir(dir_path)):
        if name.endswith(".parquet"):
            per_file[name] = _zonemap_from_one_footer(
                os.path.join(dir_path, name)
            )
    rolled = _merge_zonemaps(list(per_file.values()))
    rolled["files"] = per_file
    return rolled


def write_zonemap(dir_path: str, zm: dict) -> None:
    with open(os.path.join(dir_path, ZONEMAP_SIDECAR), "w") as f:
        json.dump(zm, f)


def read_zonemap(dir_path: str) -> dict | None:
    """Missing/corrupt sidecar ⇒ None ⇒ no skip (never a wrong skip)."""
    p = os.path.join(dir_path, ZONEMAP_SIDECAR)
    try:
        with open(p) as f:
            return json.load(f)
    except (OSError, ValueError):
        return None


def validate_where(where) -> None:
    for p in where:
        if not (isinstance(p, (tuple, list)) and len(p) == 3):
            raise ValueError(f"predicate must be (col, op, literal): {p!r}")
        col, op, lit = p
        if op not in _OPS:
            raise ValueError(f"unsupported zone-map op {op!r} (have {_OPS})")
        if op == "in" and not isinstance(lit, (list, tuple, set)):
            raise ValueError("'in' literal must be a list/tuple/set")


def _pred_excludes(stats: dict, op: str, lit) -> bool:
    """True iff NO non-null value in [min, max] can satisfy the predicate.
    Mixed-type comparisons (str bound vs numeric literal) never exclude."""
    lo, hi = stats["min"], stats["max"]

    def cmp_ok(a, b):
        return isinstance(a, str) == isinstance(b, str)

    if op == "in":
        vals = [v for v in lit if v is not None and cmp_ok(lo, v)]
        if len(vals) != len([v for v in lit if v is not None]):
            return False
        return all(v < lo or v > hi for v in vals)
    if not cmp_ok(lo, lit):
        return False
    if op == "=":
        return lit < lo or lit > hi
    if op == "<":
        return lo >= lit
    if op == "<=":
        return lo > lit
    if op == ">":
        return hi <= lit
    if op == ">=":
        return hi < lit
    return False


def zone_excludes(zm: dict | None, where) -> bool:
    """True iff the dir provably holds no row satisfying the conjunction.
    An empty dir (rows==0) excludes unconditionally; an unknown column keeps.
    """
    if zm is None:
        return False
    if zm.get("rows", 1) == 0:
        return True
    cols = zm.get("cols") or {}
    for col, op, lit in where:
        st = cols.get(col)
        if st is None:
            # column has no bounds in this dir: either unsupported type
            # (keep) or every value is null (a null never satisfies → the
            # conjunction is unsatisfiable here)
            n = zm.get("rows")
            nulls = (zm.get("nulls_only") or {}).get(col)
            if nulls is not None and n is not None and nulls >= n:
                return True
            continue
        if lit is None:
            return True  # comparison with NULL literal satisfies nothing
        if _pred_excludes(st, op, lit):
            return True
    return False


def residual_filter(where) -> Column:
    """The exact predicate as a Spark Column — applied to the assembled
    DataFrame so pruning is a physical-plan optimization only."""
    cond = F.lit(True)
    for col, op, lit in where:
        c = F.col(col)
        if op == "=":
            e = c == F.lit(lit)
        elif op == "<":
            e = c < F.lit(lit)
        elif op == "<=":
            e = c <= F.lit(lit)
        elif op == ">":
            e = c > F.lit(lit)
        elif op == ">=":
            e = c >= F.lit(lit)
        else:  # in
            e = c.isin(list(lit))
        cond = cond & e
    return cond

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

import hashlib
import json
import math
import os

import pyarrow.parquet as pq
from pyspark.sql import Column
from pyspark.sql import functions as F

ZONEMAP_SIDECAR = "_zonemap.json"

_OPS = {"=", "<", "<=", ">", ">=", "in"}

# ------------------------------------------------------------ column blooms
# Per-column Bloom filters inside the zone-map sidecar — the Parquet/Delta
# column-bloom-index idea at the table format's skipping granularity. Zone
# maps answer range predicates; on a HIGH-CARDINALITY UNCLUSTERED column
# every file's [min, max] spans the whole domain and an equality probe
# (`trace_id = 'x'`) prunes nothing. The bloom answers exactly that probe:
# bit-absent proves the value absent from the file/dir, so `=` / `in`
# predicates skip the same way range predicates do — conservatively, never
# wrongly (a bloom has false POSITIVES only: a kept dir may still miss, an
# excluded dir provably cannot match).
#
# Enabled per table via ``SnapshotTable.compact(bloom_cols=[...])`` — the
# column list persists in the manifest (like colmap) and every later write
# path maintains it: bulk writes/compaction/rescale harvest from the
# freshly written parquet (one column read per file), merge tasks and
# row-op delta writers build it from the pandas frame they already hold.
# Dir absent a bloom (pre-bloom epochs, unsupported value type) is always
# kept. Only string and integer columns carry blooms: float equality is
# representation-fragile across engines, and a bloom that misses one value
# would exclude WRONGLY — unsupported types drop the whole column's bloom.
BLOOM_COL_BITS = 131072  # 16 KiB/column/file; ~0.1% fp at 10k distinct, k=5
BLOOM_COL_K = 5


def _bloom_encode(v) -> str | None:
    """Type-tagged canonical encoding shared by build and probe. None =>
    unsupported (a build drops the column's bloom; a probe never excludes).
    Tags keep int 5 and str '5' distinct — a cross-type probe must not
    alias into a present value's bits."""
    if v is None:
        return None
    if hasattr(v, "item"):  # numpy scalar from pandas/arrow
        v = v.item()
    if isinstance(v, bool):
        return None
    if isinstance(v, int):
        return f"i:{v}"
    if isinstance(v, str):
        return f"s:{v}"
    return None


def _bloom_positions(enc: str, n_bits: int, k: int) -> list[int]:
    """Kirsch–Mitzenmacher double hashing: ONE md5 per value, k derived
    probes — same positions at build and probe time by construction."""
    d = hashlib.md5(enc.encode("utf-8")).digest()
    h1 = int.from_bytes(d[:8], "big")
    h2 = int.from_bytes(d[8:], "big") | 1  # odd step → full period
    return [(h1 + i * h2) % n_bits for i in range(k)]


def column_bloom(values, n_bits: int = BLOOM_COL_BITS, k: int = BLOOM_COL_K):
    """Bloom dict over an iterable of (deduped) column values, or None when
    any value fails to encode — a partial bloom would exclude wrongly.
    ``vt`` records which type tags the column holds so a CROSS-TYPE probe
    (str literal against an int column — Spark's implicit cast can still
    match it) keeps instead of wrong-skipping, mirroring the range check's
    mixed-type never-excludes rule."""
    bits = bytearray(n_bits // 8)
    tags = set()
    for v in values:
        enc = _bloom_encode(v)
        if enc is None:
            return None
        tags.add(enc[0])
        for p in _bloom_positions(enc, n_bits, k):
            bits[p >> 3] |= 0x80 >> (p & 7)
    return {
        "n_bits": n_bits, "k": k, "vt": sorted(tags),
        "bits": bytes(bits).hex(),
    }


def bloom_might_contain(bloom: dict, lit) -> bool:
    """False only when the literal is PROVABLY absent. Unsupported literal
    types, and cross-type probes (tag not among the column's ``vt``), can't
    be proven absent → True (keep)."""
    enc = _bloom_encode(lit)
    if enc is None:
        return True
    try:
        if enc[0] not in bloom["vt"]:
            return True  # cross-type: implicit casts could still match
        bits = bytes.fromhex(bloom["bits"])
        n_bits, k = int(bloom["n_bits"]), int(bloom["k"])
    except (KeyError, ValueError, TypeError):
        return True  # corrupt sidecar section: keep, never wrong-skip
    return all(
        bits[p >> 3] & (0x80 >> (p & 7))
        for p in _bloom_positions(enc, n_bits, k)
    )


def _bloom_excludes(bloom: dict, op: str, lit) -> bool:
    """True iff the bloom proves no row can satisfy ``col op lit``."""
    if op == "=":
        return lit is not None and not bloom_might_contain(bloom, lit)
    if op == "in":
        vals = [v for v in lit if v is not None]
        return bool(vals) and all(
            not bloom_might_contain(bloom, v) for v in vals
        )
    return False


def _merge_blooms(maps: list[dict]) -> dict:
    """Dir-level rollup: bitwise OR of per-file blooms, a column kept only
    when EVERY member file carries a same-shape bloom for it (a missing
    member could exclude wrongly). The union stays a valid bloom of the
    dir's value set because all files share n_bits/k/seedless hashing."""
    out: dict = {}
    if not maps:
        return out
    shared = set(maps[0].get("blooms") or {})
    for m in maps[1:]:
        shared &= set(m.get("blooms") or {})
    for c in shared:
        bls = [m["blooms"][c] for m in maps]
        n_bits, k = bls[0]["n_bits"], bls[0]["k"]
        if any(b["n_bits"] != n_bits or b["k"] != k for b in bls):
            continue
        acc = bytearray(bytes.fromhex(bls[0]["bits"]))
        for b in bls[1:]:
            for i, byte in enumerate(bytes.fromhex(b["bits"])):
                acc[i] |= byte
        vt = sorted({t for b in bls for t in (b.get("vt") or [])})
        out[c] = {
            "n_bits": n_bits, "k": k, "vt": vt, "bits": bytes(acc).hex(),
        }
    return out


def _bloom_from_parquet(path: str, col: str):
    """Column bloom of one parquet file from a single-column read — the
    only write path that doesn't already hold the rows (driver-side bulk
    writes harvest footers; blooms need the values). One column, distinct
    values only: kilobytes moved for a 16 KiB index."""
    import pyarrow.compute as pc

    pf = pq.ParquetFile(path)
    if col not in pf.schema_arrow.names:
        return None
    tbl = pq.read_table(path, columns=[col])
    uniq = pc.unique(tbl.column(0))
    return column_bloom(v for v in uniq.to_pylist() if v is not None)

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


def zonemap_from_pandas(pdf, cols=None, bloom_cols=None) -> dict:
    """Zone map of a pandas frame (the rows a merge/delta task is about to
    write). ``cols`` limits which columns are mapped (default: all supported).
    ``bloom_cols`` additionally builds per-column Bloom filters (see the
    column-bloom block above) from the frame's distinct values."""
    out: dict = {"rows": int(len(pdf)), "cols": {}, "nulls_only": {}}
    if bloom_cols:
        blooms = {}
        for c in bloom_cols:
            if c not in pdf.columns:
                continue
            bl = column_bloom(pdf[c].dropna().unique())
            if bl is not None:
                blooms[c] = bl
        if blooms:
            out["blooms"] = blooms
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
    blooms = _merge_blooms(maps)
    if blooms:
        out["blooms"] = blooms
    return out


def zonemap_from_footers(dir_path: str, bloom_cols=None) -> dict:
    """Zone map of a data dir from parquet footer statistics only: the
    dir-level rollup PLUS a per-file ``files`` section, so the reader can
    prune individual files inside a kept dir (the Iceberg per-data-file
    stats granularity — what makes skipping bite after a clustered
    compaction splits a bucket into value-ordered files). ``bloom_cols``
    additionally reads JUST those columns back from each freshly written
    file (page cache warm — the writer just produced them) to build the
    per-file and dir-rollup Bloom filters."""
    per_file: dict = {}
    for name in sorted(os.listdir(dir_path)):
        if name.endswith(".parquet"):
            path = os.path.join(dir_path, name)
            zm = _zonemap_from_one_footer(path)
            if bloom_cols:
                blooms = {}
                for c in bloom_cols:
                    bl = _bloom_from_parquet(path, c)
                    if bl is not None:
                        blooms[c] = bl
                if blooms:
                    zm["blooms"] = blooms
            per_file[name] = zm
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
    blooms = zm.get("blooms") or {}
    for col, op, lit in where:
        # bloom check first: it can exclude even when min/max keeps (the
        # high-cardinality-equality case blooms exist for) and is
        # independent of the bounds section
        bl = blooms.get(col)
        if bl is not None and op in ("=", "in") and _bloom_excludes(bl, op, lit):
            return True
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

"""Storage-partitioned MERGE (Iceberg SPJ emulation).

The join-based merge (merge.py) shuffles the ENTIRE touched state through the
cluster every batch — correct, but the state is the big side (grows without
bound) while the change batch is the small side. Iceberg + Spark solve this
with storage-partitioned joins: both sides share the ``bucket(doc_id, N)``
layout, so the join needs no state-side exchange. Without the Iceberg
runtime, this module emulates SPJ:

* the (deduped, normalized) batch is repartitioned by the table's bucket
  function — the ONLY shuffle, and it moves just the change batch;
* each task owns whole buckets: it reads that bucket's current parquet files
  directly (pyarrow, no JVM row materialization), applies upsert/delete with
  vectorized pandas index ops, and writes the new bucket file itself;
* tasks return (bucket, path, rows, per-action counts) — the driver gets the
  lineage for the manifest without any extra pass.

Scale contract: a bucket must fit in one worker's memory. n_buckets is
chosen so bucket size stays bounded (e.g. 512 MB → 2^17+ buckets at 100 TB);
the same contract Iceberg COW file sizing imposes. Task retries are safe:
file names are deterministic per (epoch, bucket) and content is
deterministic (sorted by doc_id), so a re-run overwrites identical bytes —
the epoch only becomes visible when the manifest commits.
"""

from __future__ import annotations

import os
from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from georef_ar_etl_spark.functions.tokens import normalize_series
from georef_ar_etl_spark.sinks.mor import live_keys, resolve_live, write_delta
from georef_ar_etl_spark.sinks.zonemap import write_zonemap, zonemap_from_footers

RESULT_SCHEMA = T.StructType([
    T.StructField("bucket", T.IntegerType()),
    # physical write mode chosen per bucket: "rewrite" (full COW base, also
    # the inline-compaction path), "delta" (merge-on-read delta file) or
    # "noop" (every event was a no-op — nothing written, path is null)
    T.StructField("mode", T.StringType()),
    T.StructField("rows", T.LongType()),
    T.StructField("inserted", T.LongType()),
    T.StructField("updated", T.LongType()),
    T.StructField("deleted", T.LongType()),
    T.StructField("delete_noop", T.LongType()),
    # partial-column updates (op='patch', schemas.OPS): resolved against the
    # bucket's live row; a patch whose key is absent is a counted no-op
    T.StructField("patched", T.LongType()),
    T.StructField("patch_noop", T.LongType()),
    T.StructField("path", T.StringType()),
    # per-bucket action ID lineage (sorted, capped samples — the reference
    # reports the full added/updated/deleted ID lists per extraction,
    # georef_ar_etl/transformers.py:145-149; at engine scale the manifest
    # carries a bounded sample per bucket plus the exact counts above)
    T.StructField("inserted_ids", T.ArrayType(T.StringType())),
    T.StructField("updated_ids", T.ArrayType(T.StringType())),
    T.StructField("deleted_ids", T.ArrayType(T.StringType())),
    T.StructField("patched_ids", T.ArrayType(T.StringType())),
])


def _fold_patches_pandas(
    pdf: pd.DataFrame, key: str, order: str, patchable: list[str]
) -> pd.DataFrame:
    """In-task fold of a seq-sorted event frame containing ``op='patch'``
    rows to one effective event per key — the pandas twin of
    merge.fold_patch_events (same replay semantics, asserted equal by
    tests/test_patch_events.py). Runs AFTER the bucket shuffle, so all of a
    key's events are local; the hot non-patch path never enters here.

    * last full event per key wins (existing LWW);
    * patches AFTER it overlay column-wise, last non-null per column;
    * patches at/before it — including after an in-batch delete — are
      superseded and fold away, like any LWW-shadowed event;
    * keys with only patches come out as one combined ``op='patch'`` row.
    """
    is_p = pdf["op"].eq("patch")
    full = pdf[~is_p].drop_duplicates(key, keep="last")
    patches = pdf[is_p]

    live = patches.merge(
        full[[key, order]].rename(columns={order: "_bseq"}), on=key, how="left"
    )
    live = live[live["_bseq"].isna() | (live[order] > live["_bseq"])]
    if live.empty:
        return full
    # one row per key (bookkeeping cols from the LAST live patch), then the
    # per-column last-non-null overlay values
    folded = live.drop_duplicates(key, keep="last")[
        [c for c in pdf.columns if c not in patchable]
    ]
    for c in patchable:
        pc = live[[key, c]].dropna(subset=[c]).drop_duplicates(key, keep="last")
        folded = folded.merge(
            pc.rename(columns={c: f"_p_{c}"}), on=key, how="left"
        )

    full_keys = pd.Index(full[key])
    on_full = folded[key].isin(full_keys).to_numpy()
    # overlay onto non-delete full rows
    base = full.merge(
        folded.loc[on_full, [key] + [f"_p_{c}" for c in patchable]],
        on=key,
        how="left",
    )
    not_del = base["op"].ne("delete")
    for c in patchable:
        pv = base[f"_p_{c}"]
        base[c] = pv.where(pv.notna() & not_del, base[c])
    base = base.drop(columns=[f"_p_{c}" for c in patchable])

    pure = folded.loc[~on_full].copy()
    pure["op"] = "patch"
    for c in patchable:
        pure[c] = pure[f"_p_{c}"]
    pure = pure.drop(columns=[f"_p_{c}" for c in patchable])[base.columns]
    return pd.concat([base, pure], ignore_index=True)


def merge_copartitioned(
    batch: DataFrame,
    bucket_files: dict[int, list[str]],
    payload_cols: list[str],
    payload_schema_json: str,
    epoch_dir: str,
    key: str = "doc_id",
    normalize: bool = True,
    dedup_order: str | None = "seq",
    id_sample_cap: int = 16,
    bucket_deltas: dict[int, list[str]] | None = None,
    bucket_live: dict[int, int] | None = None,
    mor_max_deltas: int = 4,
    mor_rewrite_ratio: float = 0.5,
    bucket_dvs: dict[int, str] | None = None,
    bloom_cols: list[str] | None = None,
) -> DataFrame:
    """``batch``: validated change rows with ``op``, ``bucket`` and (when
    ``dedup_order``) the event-order column. ``bucket_files``: bucket →
    current BASE data file paths (absolute); ``bucket_deltas``: bucket →
    merge-on-read delta file paths in epoch order; ``bucket_live``: bucket →
    live row count from the parent manifest (lets the write-mode decision
    cost zero IO). Returns the per-bucket result frame (one row per touched
    bucket).

    In-task dedup (``dedup_order="seq"``): last-writer-wins runs as a pandas
    ``drop_duplicates(keep="last")`` AFTER the bucket shuffle — all events of
    a key land in its bucket's task, so no winners aggregation, no
    driver-built broadcast, no semi-join. The whole apply is one shuffle and
    one stage pair. (A key's in-batch burst concentrates in one task —
    bounded by batch size; the engine's pre-pass auto-routes pathological
    single-key batches to the join merge, whose dedup pre-aggregates
    map-side.)

    Write-mode decision per bucket (merge-on-read, sinks/mor.py): when the
    change group is small relative to the bucket (``len(grp) <=
    mor_rewrite_ratio * live``) and the delta chain is short
    (``< mor_max_deltas``), the task writes a DELTA file — it reads only the
    bucket's key column to classify actions, never the payload, so a batch
    touching 1% of a bucket costs ~1% of a rewrite instead of 100%.
    Otherwise it rewrites the bucket whole (resolving any pending deltas —
    inline compaction), which also bounds read amplification: no bucket ever
    carries more than ``mor_max_deltas`` deltas. ``mor_rewrite_ratio=0``
    disables MOR (pure COW).
    """
    n_buckets = max(bucket_files.keys(), default=0) + 1 if bucket_files else 1
    arrow_schema = pa.schema(
        [
            pa.field(f.name, _to_arrow(f.dataType))
            for f in T.StructType.fromJson(__import__("json").loads(payload_schema_json))
        ]
    )
    bucket_deltas = bucket_deltas or {}
    bucket_live = bucket_live or {}
    bucket_dvs = bucket_dvs or {}
    # the file map now covers ALL buckets (bucket pruning happens in-task:
    # a task opens a bucket's files only if it holds events for it), so ship
    # it once per executor as a broadcast instead of once per task closure
    sc = batch.sparkSession.sparkContext
    bf_bc = sc.broadcast(bucket_files)
    bd_bc = sc.broadcast(bucket_deltas)
    bl_bc = sc.broadcast(bucket_live)
    # bucket → deletion-vector dir (sinks/deletion_vectors.py): the task
    # masks the base's DV'd positions before classifying/resolving, so a
    # DV-deleted key re-inserts (not updates) and a rewrite never
    # resurrects it
    dv_bc = sc.broadcast(bucket_dvs)

    patchable = [c for c in payload_cols if c not in (key, "n_tok")]

    def merge_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        chunks = [c for c in batches if not c.empty]
        if not chunks:
            return  # empty partition (bucket-hash collision left it bare)
        pdf = pd.concat(chunks, ignore_index=True)
        out = []
        if dedup_order is not None:
            pdf = pdf.sort_values(dedup_order, kind="stable")
            if pdf["op"].eq("patch").any():
                # patch-aware fold (per-column overlay in replay order);
                # the hot non-patch path stays on the plain LWW dedup
                pdf = _fold_patches_pandas(pdf, key, dedup_order, patchable)
            else:
                pdf = pdf.drop_duplicates(key, keep="last")
        for bucket, grp in pdf.groupby("bucket", sort=True):
            bucket = int(bucket)
            files = bf_bc.value.get(bucket, [])
            dfiles = bd_bc.value.get(bucket, [])
            live = int(bl_bc.value.get(bucket, 0))
            dv_dir = dv_bc.value.get(bucket)
            dv_map = None
            if dv_dir:
                from georef_ar_etl_spark.sinks.deletion_vectors import read_dv_map

                dv_map = read_dv_map(dv_dir)

            # last-writer-wins already applied upstream → unique keys per side
            dels = grp.loc[grp["op"] == "delete", key]
            pp = grp.loc[grp["op"] == "patch"]
            ups = grp.loc[~grp["op"].isin(("delete", "patch")), payload_cols].copy()
            # patches are read-modify-write: they need the bucket's payload
            # even when the write side stays a cheap delta
            needs_state = len(pp) > 0

            use_delta = (
                mor_rewrite_ratio > 0
                and bool(files)
                and len(dfiles) < mor_max_deltas
                and len(grp) <= mor_rewrite_ratio * live
            )
            if use_delta and not needs_state:
                # keys-only read of base + delta chain: classify actions
                # without touching the payload columns at all
                state_keys = live_keys(files, dfiles, key, dv_map=dv_map)
                state = None
            else:
                # full resolve (base + pending deltas) — the COW/inline-
                # compaction path (also the patch read path; writing a new
                # base clears the chain, a patch delta leaves it)
                state = resolve_live(files, dfiles, payload_cols, key, dv_map=dv_map)
                state_keys = pd.Index(state[key])
            del_mask = state_keys.isin(dels)
            deleted = int(del_mask.sum())
            delete_noop = int(len(dels) - deleted)
            up_mask = (
                ups[key].isin(state_keys).to_numpy()
                if len(ups) else np.zeros(0, dtype=bool)
            )
            updated = int(up_mask.sum())
            inserted = int(len(ups) - updated)

            def sample(ids) -> list[str]:
                # the cap-smallest ids, ascending — deterministic across task
                # retries like a full sort, but O(n log cap): a sorted()[:cap]
                # here measurably taxed every bucket of every batch
                import heapq

                return heapq.nsmallest(id_sample_cap, (str(x) for x in ids))

            inserted_ids = sample(ups.loc[~up_mask, key]) if len(ups) else []
            updated_ids = sample(ups.loc[up_mask, key]) if len(ups) else []
            deleted_ids = sample(state_keys[del_mask])

            patched = patch_noop = 0
            patched_ids: list[str] = []
            if len(pp):
                pmask = pp[key].isin(state_keys).to_numpy()
                patched = int(pmask.sum())
                patch_noop = int(len(pp) - patched)
                if patched:
                    hit = pp.loc[pmask]
                    patched_ids = sample(hit[key])
                    # overlay non-null patch columns onto the live rows
                    # (state dtypes win — only set cells actually patched)
                    tgt = state.loc[state[key].isin(hit[key])].set_index(
                        key, drop=False
                    )
                    hv = hit.set_index(key)
                    for c in patchable:
                        vals = hv[c].reindex(tgt.index)
                        # Series.where, not .loc-set: assigning a Series of
                        # list values through .loc trips pandas' broadcast
                        # check; where() sets cell-wise for object dtypes
                        tgt[c] = vals.where(vals.notna(), tgt[c])
                    if not normalize and "tokens" in hv and "n_tok" in tgt:
                        # normalize=True recomputes n_tok below for every
                        # upsert row; without it the derived-field invariant
                        # still holds for patched tokens
                        tm = hv["tokens"].reindex(tgt.index).notna()
                        if tm.any():
                            tgt.loc[tm, "n_tok"] = tgt.loc[tm, "tokens"].map(len)
                    ups = pd.concat(
                        [ups, tgt.reset_index(drop=True)[payload_cols]],
                        ignore_index=True,
                    )

            if normalize and len(ups):
                # token normalization runs HERE, after the bucket shuffle —
                # full task parallelism, and one fewer Arrow round-trip than
                # a separate pandas_udf stage (same numpy kernel either way);
                # patched rows re-normalize too (idempotent on carried state
                # tokens, required for freshly patched ones)
                ups["tokens"] = normalize_series(ups["tokens"])
                ups["n_tok"] = ups["tokens"].map(len).astype("int32")

            if use_delta:
                # noop tombstones are dropped: a key absent from state needs
                # no delete marker, and LWW dedup means no later in-batch op
                # could resurrect it
                eff_dels = dels[dels.isin(state_keys)]
                rows_after = len(state_keys) - deleted + inserted
                if len(ups) == 0 and len(eff_dels) == 0:
                    # the whole change group was no-ops (e.g. deletes of
                    # absent keys): writing an empty delta would burn a
                    # chain slot and tax every later read for nothing
                    path, mode = None, "noop"
                else:
                    ddir = os.path.join(epoch_dir, f"delta={bucket}")
                    os.makedirs(ddir, exist_ok=True)
                    path = os.path.join(ddir, "delta-00000.parquet")
                    write_delta(
                        path, ups, eff_dels, payload_cols, arrow_schema, key,
                        bloom_cols=bloom_cols,
                    )
                    mode = "delta"
            else:
                keep = state[~state_keys.isin(dels) & ~state_keys.isin(ups[key])]
                merged = pd.concat([keep, ups], ignore_index=True).sort_values(key)
                bdir = os.path.join(epoch_dir, f"bucket={bucket}")
                os.makedirs(bdir, exist_ok=True)
                path = os.path.join(bdir, "part-00000.parquet")
                table = pa.Table.from_pandas(
                    merged.reset_index(drop=True), schema=arrow_schema,
                    preserve_index=False,
                )
                pq.write_table(table, path, compression="lz4", row_group_size=65536)
                # footer-derived map carries the per-file section the reader
                # uses for file-level pruning (one file here, so it mirrors
                # the dir rollup — cheap: one footer just written, in cache)
                write_zonemap(bdir, zonemap_from_footers(bdir, bloom_cols=bloom_cols))
                rows_after = len(merged)
                mode = "rewrite"
            out.append((
                bucket, mode, rows_after, inserted, updated, deleted,
                delete_noop, patched, patch_noop, path,
                inserted_ids, updated_ids, deleted_ids, patched_ids,
            ))
        yield pd.DataFrame(
            out, columns=[f.name for f in RESULT_SCHEMA.fields]
        )

    return (
        batch.repartition(n_buckets, F.col("bucket"))
        .mapInPandas(merge_partition, RESULT_SCHEMA)
    )


def _to_arrow(dt: T.DataType) -> pa.DataType:
    if isinstance(dt, T.StringType):
        return pa.string()
    if isinstance(dt, T.IntegerType):
        return pa.int32()
    if isinstance(dt, T.LongType):
        return pa.int64()
    if isinstance(dt, T.DoubleType):
        return pa.float64()
    if isinstance(dt, T.ArrayType):
        return pa.list_(_to_arrow(dt.elementType))
    raise ValueError(f"unsupported payload type: {dt}")

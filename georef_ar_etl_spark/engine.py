"""CdcEngine — the end-to-end change-apply pipeline.

Per micro-batch (reference pipeline analogue: ingest → validate → per-row
process → diff-upsert → report, georef_ar_etl/transformers.py:67-151):

1. schema-contract check (+ additive evolution)   utils.py:62-91 analogue
2. validate → quarantine side-output              transformers.py:96-101
3. vectorized token normalization (Arrow)         utils.py:190-195 analogue
4. in-batch dedup, last-writer-wins by seq        transformers.py:89-94 (relaxed)
5. bucket-pruned full-outer MERGE                 transformers.py:103-136
6. atomic manifest commit + lineage metrics       process.py:250-257, Report

Everything between read and write is one declarative DataFrame plan —
Catalyst handles pushdown/pruning; AQE handles partition skew. The only
Python on the data path is the Arrow-batched normalization UDF.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from georef_ar_etl_spark.functions.tokens import with_normalized_tokens
from georef_ar_etl_spark.operators.dedup_events import latest_per_key
from georef_ar_etl_spark.operators.copart_merge import merge_copartitioned
from georef_ar_etl_spark.operators.merge import (
    ACTIONS,
    align_columns,
    fold_patch_events,
    merge_upsert,
)
from georef_ar_etl_spark.operators.validate import QUARANTINE_REASONS, tag_invalid
from georef_ar_etl_spark.schemas import (
    EVENT_META_COLS,
    STATE_SCHEMA,
    SchemaContractError,
    canonical_wide,
    evolved_state_schema,
    validate_contract,
)
from georef_ar_etl_spark.sinks.snapshot_table import (
    ConflictError,
    SnapshotTable,
    bucket_expr,
)


class PurgeError(RuntimeError):
    """Hard-purge verification found surviving occurrences of purged keys."""


class OutOfOrderBatchError(RuntimeError):
    """A lower batch_id arrived after a higher one was committed."""


class StagedCommitPending(RuntimeError):
    """A staged (write-audit-publish) snapshot is awaiting its audit verdict;
    applying further batches on top of it would fork the epoch chain.
    Resolve with ``publish_staged()`` or ``abandon_staged()``."""


class BucketSizeError(RuntimeError):
    """A bucket outgrew the bucket-fits-in-one-task byte contract
    (operators/copart_merge.py:18-23). The message carries the rescale
    recommendation; the failing batch was NOT committed and applies
    cleanly after ``rescale``."""


def content_digest(df: DataFrame) -> str:
    """Order-insensitive content hash: bit_xor of per-row xxhash64 over all
    columns (rows are unique by seq, so xor cancellation can't occur).
    Reference analogue: MD5 of every downloaded input
    (georef_ar_etl/extractors.py:30-39)."""
    cols = [F.col(c) for c in sorted(df.columns)]
    row = df.select(F.xxhash64(*cols).alias("h"), F.lit(1).alias("one"))
    agg = row.agg(F.expr("bit_xor(h)").alias("x"), F.count("one").alias("n")).collect()[0]
    return f"{agg['x']}:{agg['n']}"


class CdcEngine:
    def __init__(
        self,
        spark: SparkSession,
        table_root: str,
        n_buckets: int = 32,
        dim: DataFrame | None = None,
        strict_dup: bool = False,
        normalize_impl: str = "pandas",
        merge_impl: str = "copartitioned",
        mor_max_deltas: int = 4,
        mor_rewrite_ratio: float = 0.5,
        hot_route_share: float = 0.5,
        hot_route_min_events: int = 100_000,
        cache_batch: bool = False,
        spread_input: bool = True,
        max_bucket_bytes: int = 512 << 20,
        on_oversize_bucket: str = "warn",
    ):
        """``merge_impl``:
        * ``copartitioned`` (default) — storage-partitioned merge (Iceberg
          SPJ emulation, operators/copart_merge.py): state never shuffles.
        * ``join`` — full-outer DataFrame join (operators/merge.py): simplest
          Catalyst plan; shuffles the touched state every batch.
        Both are tested equal against the oracle.

        Merge-on-read (copartitioned impl only): a bucket whose change group
        is <= ``mor_rewrite_ratio`` of its live rows gets a DELTA file
        instead of a full rewrite, up to ``mor_max_deltas`` pending deltas
        per bucket (then the next touch compacts inline). Cuts COW write
        amplification: a batch touching 1% of a bucket writes ~1% of it.
        ``mor_rewrite_ratio=0`` disables MOR (pure copy-on-write).

        Hot-bucket auto-route: the pre-pass counts valid events per bucket;
        when one bucket holds > ``hot_route_share`` of a batch of >=
        ``hot_route_min_events`` valid events (a pathological single-key or
        single-prefix burst that would serialize in one copartitioned merge
        task), THAT batch falls back to the join merge, whose dedup
        pre-aggregates map-side and spreads across shuffle partitions.

        ``cache_batch``: persist the validated batch between the pre-pass
        and the merge job (they otherwise scan+parse+tag the events twice).
        A/B-measured: 8-22% faster replay on wide ~1 KiB token payloads, a
        wash on small 64-token rows — enable for wide-payload pipelines;
        costs one columnar-cached copy of each in-flight batch per
        executor.

        ``spread_input``: round-robin the incoming batch to
        defaultParallelism partitions before validation when the source
        delivers fewer (functions/layout.py) — a batch arriving as ONE
        small file otherwise runs the whole pre-pass map side on one core.
        Default ON: measured 1.28x on the 2M-event replay whose segments
        arrive as single files (BENCH/spread_input_ab.py), and it is a
        guaranteed no-op when the batch already carries enough partitions,
        so the only cost is one extra exchange of an under-partitioned
        batch — exactly the case where it pays.

        ``max_bucket_bytes`` / ``on_oversize_bucket``: the copartitioned
        merge's contract is one bucket per task (copart_merge.py:18-23) — a
        bucket that outgrows worker memory OOMs the merge with no actionable
        signal, the first thing that breaks silently at 100x scale. Every
        apply therefore measures the touched buckets' post-merge bytes
        (base + delta chain, file metadata only — zero Spark jobs) against
        ``max_bucket_bytes``. ``"warn"`` (default) records the oversize
        buckets and a ``rescale(M)`` recommendation in the manifest metrics
        and emits a Python warning; ``"error"`` raises BucketSizeError
        BEFORE the manifest commit (the orphaned epoch dir is invisible and
        harmless; after ``rescale`` the same batch applies cleanly). 0
        disables the check."""
        if on_oversize_bucket not in ("warn", "error"):
            raise ValueError("on_oversize_bucket must be 'warn' or 'error'")
        self.spark = spark
        self.table = SnapshotTable(spark, table_root, n_buckets)
        self.dim = dim
        self.strict_dup = strict_dup
        self.normalize_impl = normalize_impl
        self.merge_impl = merge_impl
        self.mor_max_deltas = mor_max_deltas
        self.mor_rewrite_ratio = mor_rewrite_ratio
        self.hot_route_share = hot_route_share
        self.hot_route_min_events = hot_route_min_events
        self.cache_batch = cache_batch
        self.spread_input = spread_input
        self.max_bucket_bytes = max_bucket_bytes
        self.on_oversize_bucket = on_oversize_bucket

    # ------------------------------------------------------------- bootstrap
    def bootstrap(self, initial: DataFrame) -> dict:
        """Epoch 0: load the initial snapshot (already-normalized state)."""
        if self.table.latest_manifest() is not None:
            return self.table.latest_manifest()
        digest = "bootstrap:" + content_digest(initial)
        df = align_columns(initial, STATE_SCHEMA).withColumn(
            "bucket", bucket_expr(F.col("doc_id"), self.table.n_buckets)
        )
        t0 = time.time()
        return self.table.commit(
            epoch=0,
            schema=STATE_SCHEMA,
            new_buckets_df=df,
            touched_buckets=list(range(self.table.n_buckets)),
            batch_id=None,
            batch_digest=digest,
            metrics={"kind": "bootstrap", "wall_sec": time.time() - t0},
        )

    # ------------------------------------------------------------------ state
    def state(
        self,
        epoch: int | None = None,
        where: list | None = None,
        stats: dict | None = None,
        tag: str | None = None,
        as_of: float | None = None,
    ) -> DataFrame:
        """Current state, or a time-travel read of a retained epoch / a
        pinned ``tag`` (named snapshot ref — see ``create_tag``) / the
        latest snapshot committed at or before unix time ``as_of``
        (Iceberg ``TIMESTAMP AS OF``).

        ``where`` — conjunction of ``(col, op, literal)`` — plans the scan
        against zone-map sidecars so dirs whose bounds can't match never
        launch a task (sinks/zonemap.py), then filters exactly."""
        return self.table.read_state(
            epoch=epoch, where=where, stats=stats, tag=tag, as_of=as_of
        ).drop("bucket")

    def rename_column(self, old: str, new: str) -> dict:
        """Metadata-only rename of an EVOLVED payload column (``ALTER TABLE
        … RENAME COLUMN``, SnapshotTable.rename_column). The north-rule
        contract columns (doc_id/tokens/n_tok/source) are immutable — every
        change event addresses them by name — so only columns that arrived
        via additive schema evolution can be renamed. Post-rename batches
        address the column by its new name; pre-rename batches re-deliver
        idempotently; time travel shows each epoch under its own names."""
        contract_cols = {f.name for f in STATE_SCHEMA.fields}
        if old in contract_cols:
            raise SchemaContractError(
                f"contract column {old!r} cannot be renamed — change events "
                f"address it by name"
            )
        if new in contract_cols:
            raise SchemaContractError(
                f"{new!r} collides with a contract column name"
            )
        return self.table.rename_column(old, new)

    def add_column(self, name: str, dtype, comment: str | None = None) -> dict:
        """Metadata-only ``ALTER TABLE … ADD COLUMN`` (nullable; existing
        rows read as NULL) — the explicit-DDL twin of apply_batch's
        automatic additive evolution; the column is then addressable by
        change batches, ``update_where`` SETs and ``merge_into`` clauses.
        Contract columns can't be re-added (they always exist); see
        SnapshotTable.add_column for the fresh-physical re-add rule."""
        return self.table.add_column(name, dtype, comment=comment)

    def drop_column(self, name: str) -> dict:
        """Metadata-only drop of an EVOLVED payload column (``ALTER TABLE …
        DROP COLUMN``, SnapshotTable.drop_column). Re-adding the same name
        later binds a fresh column — dropped values never resurrect."""
        if name in {f.name for f in STATE_SCHEMA.fields}:
            raise SchemaContractError(
                f"contract column {name!r} cannot be dropped"
            )
        return self.table.drop_column(name)

    def create_tag(
        self, name: str, epoch: int | None = None, description: str = ""
    ) -> dict:
        """Pin the head (or ``epoch``) under an immutable named ref
        (Iceberg ``tag``): ``state(tag=name)`` reads exactly that snapshot
        forever — ``vacuum`` retains the pinned manifest and all its files
        until ``drop_tag`` — which is how a training run records the exact
        table state it consumed. See SnapshotTable.create_tag."""
        return self.table.create_tag(name, epoch=epoch, description=description)

    def drop_tag(self, name: str) -> dict:
        """Unpin a named snapshot ref; the next vacuum may reclaim it."""
        return self.table.drop_tag(name)

    def tags(self) -> dict:
        """All named snapshot refs: name → {epoch, created_unix, description}."""
        return self.table.tags()

    def clone_to(
        self,
        dest_root: str,
        epoch: int | None = None,
        tag: str | None = None,
        as_of: float | None = None,
    ) -> "CdcEngine":
        """Deep CLONE (Delta ``CLONE TABLE``) — fork the table at a snapshot
        (head, ``epoch``, ``tag`` or ``as_of`` timestamp) into a standalone
        table at ``dest_root`` and return an engine over it. Data dirs copy
        in a distributed per-bucket-dir job; the exactly-once and rollback
        ledgers carry so pre-fork batches redeliver on the clone exactly as
        on the source; post-fork commits on either side are invisible to
        the other. See SnapshotTable.clone_to."""
        self.table.clone_to(dest_root, epoch=epoch, tag=tag, as_of=as_of)
        return CdcEngine(
            self.spark,
            dest_root,
            n_buckets=self.table.n_buckets,
            merge_impl=self.merge_impl,
            mor_max_deltas=self.mor_max_deltas,
            mor_rewrite_ratio=self.mor_rewrite_ratio,
        )

    def create_branch(
        self,
        name: str,
        epoch: int | None = None,
        tag: str | None = None,
        as_of: float | None = None,
        description: str = "",
    ) -> "CdcEngine":
        """Fork a ZERO-COPY named branch (Iceberg branch ref) at a snapshot
        and return an engine over it. No data is copied — the branch reads
        the parent's files in place (the fork epoch is auto-pinned with tag
        ``branch:<name>`` so parent vacuum keeps them); branch commits
        write only under ``<root>/branches/<name>/``. Validate the
        experiment, then ``fast_forward(name)`` to publish it back, or
        ``drop_branch(name, force=True)`` to discard.
        See SnapshotTable.create_branch."""
        self.table.create_branch(
            name, epoch=epoch, tag=tag, as_of=as_of, description=description
        )
        return self.branch(name)

    def branch(self, name: str) -> "CdcEngine":
        """An engine over an existing branch (same merge/MOR settings)."""
        bt = self.table.branch(name)
        return CdcEngine(
            self.spark,
            bt.root,
            n_buckets=bt.n_buckets,
            merge_impl=self.merge_impl,
            mor_max_deltas=self.mor_max_deltas,
            mor_rewrite_ratio=self.mor_rewrite_ratio,
        )

    def branches(self) -> dict:
        """Live branches: name → {fork_epoch, created_unix, description}."""
        return self.table.branches()

    def drop_branch(self, name: str, force: bool = False) -> dict:
        """Delete a branch and its fork pin; refuses to discard unmerged
        commits unless ``force``. See SnapshotTable.drop_branch."""
        return self.table.drop_branch(name, force=force)

    def fast_forward(self, name: str) -> dict:
        """Publish a branch's commits onto this table (Iceberg
        ``fast_forward``) and remove the branch; ConflictError if this
        table advanced past the fork. See SnapshotTable.fast_forward."""
        return self.table.fast_forward(name)

    def vacuum(
        self,
        keep_last: int = 2,
        older_than_s: float | None = None,
        dry_run: bool = False,
    ) -> dict:
        """Expire old snapshots + remove unreferenced files (Iceberg
        expire_snapshots/remove_orphan_files analogue); idempotent-redelivery
        protection for expired batch ids is preserved via the expired-batch
        ledger. ``older_than_s`` retains snapshots younger than the age
        floor regardless of ``keep_last`` (Delta ``VACUUM … RETAIN``);
        ``dry_run=True`` reports what would be expired/freed without
        deleting (Delta ``VACUUM … DRY RUN``). See SnapshotTable.vacuum."""
        return self.table.vacuum(
            keep_last, older_than_s=older_than_s, dry_run=dry_run
        )

    def compact(
        self,
        min_deltas: int = 1,
        buckets: list[int] | None = None,
        cluster_by: list[str] | None = None,
        rows_per_file: int | None = None,
        max_commit_retries: int = 0,
        bloom_cols: list[str] | None = None,
    ) -> dict | None:
        """Rewrite buckets carrying pending merge-on-read deltas into fresh
        base files (Iceberg rewrite_data_files analogue) — visible state
        unchanged, delta chains cleared; run with ``vacuum`` as the table's
        maintenance pair. ``cluster_by`` + ``rows_per_file`` = OPTIMIZE
        clustering: value-ordered multi-file buckets whose per-file zone
        maps make ``state(where=...)`` prune files, not just dirs; with
        ``min_deltas=0`` it re-clusters clean buckets too. ``bloom_cols``
        enables persistent per-column Bloom skipping for equality
        predicates (sinks/zonemap.py) — set once, maintained by every
        later write."""
        return self.table.compact(
            min_deltas=min_deltas, buckets=buckets,
            cluster_by=cluster_by, rows_per_file=rows_per_file,
            max_commit_retries=max_commit_retries, bloom_cols=bloom_cols,
        )

    def delete_keys_dv(
        self, keys: list, batch_id: int, max_commit_retries: int = 0
    ) -> dict:
        """Delete-only maintenance commit via positional **deletion
        vectors** (Iceberg v3 / Delta DVs): deleted rows are masked by
        (file, position) so subsequent reads of the touched buckets stay on
        the native vectorized scan (broadcast anti-join) instead of the
        per-bucket MOR resolve — the right path for erasure lists,
        moderation take-downs and retention sweeps that arrive without
        upserts. Logical delete only: bytes remain on disk until
        compact+vacuum (use ``purge_keys`` for hard GDPR erasure).
        Exactly-once via ``batch_id`` + keys digest; changelog consumers
        receive the effective deletes like any other change. See
        SnapshotTable.delete_keys_dv for routing and cost model.
        ``max_commit_retries`` lets the erasure rebase over a concurrent
        disjoint-bucket commit (snapshot isolation, write_manifest)."""
        return self.table.delete_keys_dv(
            keys, batch_id, max_commit_retries=max_commit_retries
        )

    def delete_where(
        self,
        where: list,
        batch_id: int,
        stage: bool = False,
        max_commit_retries: int = 0,
    ) -> dict:
        """Predicate delete (``DELETE FROM t WHERE …``) — the retention
        sweep: zone-map-pruned position scan lands matching rows as
        deletion vectors on chain-free buckets; chain-carrying buckets
        tombstone their matching live rows distributively. Same
        exactly-once, changelog and lifecycle contracts as
        ``delete_keys_dv``. See SnapshotTable.delete_where."""
        return self.table.delete_where(
            where, batch_id, stage=stage, max_commit_retries=max_commit_retries
        )

    def update_where(
        self,
        set_exprs: dict,
        where: list,
        batch_id: int,
        stage: bool = False,
        max_commit_retries: int = 0,
    ) -> dict:
        """Predicate update (``UPDATE t SET col = expr WHERE …``) — the
        row-level UPDATE companion of ``delete_where``: matching LIVE rows
        are read through the zone-map-pruned DV/chain-aware scan and land
        as one MOR upsert delta link per touched bucket (no driver-side row
        collection; counts unchanged). Standard SQL UPDATE semantics (SET
        expressions see the OLD row). Engine-level derived invariant: when
        ``tokens`` is SET and ``n_tok`` isn't, ``n_tok`` is re-derived from
        the POST-update tokens so the n_tok == size(tokens) contract the
        ingest normalization maintains (operators/copart_merge.py) survives
        updates too. Exactly-once via ``batch_id`` + (predicate, SET)
        digest; changelog consumers see each updated key exactly once. See
        SnapshotTable.update_where for the full cost model."""
        derive = None
        if "tokens" in set_exprs and "n_tok" not in set_exprs:
            derive = {"n_tok": "size(tokens)"}
        return self.table.update_where(
            set_exprs,
            where,
            batch_id,
            derive=derive,
            stage=stage,
            max_commit_retries=max_commit_retries,
        )

    def merge_into(
        self,
        source: DataFrame,
        batch_id: int,
        when_matched: list | None = None,
        when_not_matched: list | None = None,
        when_not_matched_by_source: list | None = None,
        stage: bool = False,
        max_commit_retries: int = 0,
    ) -> dict:
        """Conditional MERGE (``MERGE INTO state USING source ON doc_id``
        with the full Delta/Iceberg clause surface — ordered WHEN MATCHED
        [AND cond] UPDATE/DELETE, WHEN NOT MATCHED [AND cond] INSERT, WHEN
        NOT MATCHED BY SOURCE). Conditions/expressions are Spark SQL over
        ``t_<col>`` / ``s_<col>``. This is the general-program sibling of
        ``apply_batch`` (which is the fixed latest-event-wins upsert/delete
        program tuned for CDC replay): use MERGE for reconciliation jobs
        whose effect depends on BOTH sides' values. Engine invariant:
        unless some clause SETs ``n_tok`` explicitly, ``n_tok`` is
        re-derived as ``size(tokens)`` on every written row. See
        SnapshotTable.merge_into for clause semantics and the cost model
        (one bucket-pruned equi-join, Catalyst CASE program, one MOR link
        per touched bucket; WHEN NOT MATCHED BY SOURCE forces a full
        scan)."""
        sets_n_tok = any(
            a == "update" and setmap and "n_tok" in setmap
            for _c, a, setmap in list(when_matched or [])
            + list(when_not_matched_by_source or [])
        ) or any(v and "n_tok" in v for _c, v in (when_not_matched or []))
        derive = None if sets_n_tok else {"n_tok": "size(tokens)"}
        return self.table.merge_into(
            source,
            batch_id,
            when_matched=when_matched,
            when_not_matched=when_not_matched,
            when_not_matched_by_source=when_not_matched_by_source,
            derive=derive,
            stage=stage,
            max_commit_retries=max_commit_retries,
        )

    def purge_keys(self, keys: list, batch_id: int) -> dict:
        """HARD right-to-be-forgotten erasure — Delta Lake's documented GDPR
        recipe (DELETE + VACUUM) on this table, in one maintenance call:

        1. **delete batch** (``batch_id``, normal apply path): changelog
           consumers receive the deletes like any other change and propagate
           the erasure to their derived state;
        2. **compact** the dirty buckets: a MOR tombstone alone leaves the
           payload rows sitting in the base files — compaction resolves the
           chain and physically rewrites the bases without the keys;
        3. **vacuum(keep_last=1)**: expire every pre-purge snapshot so no
           retained data file, manifest or quarantine dir holds the keys.
           Exactly-once redelivery survives via the expired-batch digest
           ledger (digests only — no payload, no ids);
        4. **redact** the ids from the ``metrics.jsonl`` lineage lists
           (md5 placeholders keep counts auditable);
        5. **verify**: a distributed sweep of every remaining parquet file
           under the table root (key column only) — raises ``PurgeError``
           if any occurrence survives.

        Contract notes. ``keep_last=1`` is REQUIRED, not zeal: the delete
        epoch's manifest still references the pre-purge base dirs (delta
        mode leaves bases untouched), so retaining it would retain the
        payload — only the post-compaction head may survive. Consequently
        the per-key delete instructions do NOT survive in the changelog:
        consumers whose cursor predates the purge hit the existing
        expired-range guard and re-bootstrap from the post-purge state,
        which no longer contains the keys — erasure propagates through the
        rebuild. A caller that needs to push surgical deletes downstream
        exports the key list BEFORE purging. Time travel to pre-purge
        epochs is destroyed — that is what erasure means. Upstream WAL/wire
        segments and already-exported change feeds are the neighbouring
        systems' files, not this table's — erase them there.

        Malformed ids (wrong length) are dropped from the delete batch
        rather than applied: they can never have validated into state, so
        their only residence is expired quarantine dirs — routing them
        through apply would QUARANTINE the synthetic delete and thereby
        re-materialize the id in a retained side-output.

        Reference analogue: the reference's hard-delete path drops and
        fully re-derives tables (georef_ar_etl/transformers.py:67-151);
        here erasure is surgical per key but equally physical."""
        from georef_ar_etl_spark.schemas import DOC_ID_LEN, EVENT_SCHEMA

        keys = [str(k) for k in dict.fromkeys(keys)]
        valid = [k for k in keys if len(k) == DOC_ID_LEN]
        report: dict = {
            "keys_requested": len(keys),
            "keys_malformed_skipped": len(keys) - len(valid),
            "batch_id": batch_id,
        }
        if valid:
            ev = self.spark.createDataFrame(
                [
                    (batch_id, i, "delete", k, None, None, None)
                    for i, k in enumerate(valid)
                ],
                EVENT_SCHEMA,
            )
            m = self.apply_batch(ev, batch_id=batch_id)
            acts = m["metrics"].get("actions") or {}
            report["deleted_live"] = int(acts.get("delete", 0) or 0)
        else:
            report["deleted_live"] = 0
        c = self.compact(min_deltas=1)
        report["compacted"] = bool(c)
        v = self.vacuum(keep_last=1)
        report["vacuum"] = {
            "removed_manifests": len(v.get("removed_manifests") or []),
            "removed_dirs": len(v.get("removed_dirs") or []),
        }
        report["metrics_ids_redacted"] = self.table.redact_metrics_ids(keys)
        residual = self.table.scan_files_for_keys(keys)
        report["residual_occurrences"] = residual
        if residual:
            raise PurgeError(
                f"purge verification found {residual} surviving occurrence(s) "
                f"of purged keys under {self.table.root}"
            )
        return report

    def table_stats(self) -> dict | None:
        """Zero-job operational snapshot (rows, skew, MOR chain health,
        on-disk bytes) — what to look at before compact/vacuum/rescale."""
        return self.table.table_stats()

    def snapshots(self) -> DataFrame:
        """Iceberg ``snapshots`` metadata table analogue: one row per
        retained commit (epoch, kind, rows, merge modes, quarantine total)
        as a queryable DataFrame. See SnapshotTable.snapshots_df."""
        return self.table.snapshots_df(self.spark)

    def data_files(self, epoch: int | None = None) -> DataFrame:
        """Iceberg ``files`` metadata table analogue: one row per live data
        file (base + delta chains with positions and bytes) at ``epoch``
        (default head). See SnapshotTable.files_df."""
        return self.table.files_df(self.spark, epoch=epoch)

    @staticmethod
    def _rescale_recommendation(worst_bytes: int, limit: int, n_buckets: int) -> int:
        """Smallest power-of-two bucket multiplier that brings the worst
        bucket under 75% of the limit (hash bucketing splits bytes only
        APPROXIMATELY evenly — without the 25% headroom a worst/limit ratio
        just under a power of two would land the expected post-rescale
        worst bucket exactly AT the limit, and residual hash skew would
        re-trip the guard the error message promised the rescale clears).
        The measured bytes include any pending MOR delta chains, which
        rescale resolves — a conservative overestimate, in the safe
        direction."""
        import math

        factor = 2 ** math.ceil(math.log2(worst_bytes / (0.75 * limit)))
        return n_buckets * max(factor, 2)

    def check_bucket_sizes(self, max_bucket_bytes: int | None = None) -> dict:
        """Whole-table bucket-size contract check (zero Spark jobs): bytes
        of every bucket's base + delta chain vs the limit, with a
        ``rescale(M)`` recommendation when any bucket is over. apply_batch
        runs the same check automatically on the touched buckets; call this
        for a full audit (e.g. after bootstrap, or from a monitor alongside
        ``table_stats``)."""
        limit = self.max_bucket_bytes if max_bucket_bytes is None else max_bucket_bytes
        sizes = self.table.bucket_sizes()
        over = {b: v for b, v in sizes.items() if limit and v > limit}
        out: dict = {"max_bucket_bytes": limit, "oversize_buckets": over}
        if over:
            out["recommended_n_buckets"] = self._rescale_recommendation(
                max(over.values()), limit, self.table.n_buckets
            )
        return out

    def _bucket_size_guard(
        self,
        written: dict[int, str | None],
        written_deltas: dict[int, list[str]],
        touched: list[int],
        n_buckets: int,
    ) -> dict:
        """Post-merge, pre-commit contract check on the TOUCHED buckets
        (file metadata only — zero Spark jobs, O(touched) listings).
        Returns metrics keys to record, or raises BucketSizeError in
        ``error`` mode before anything becomes visible."""
        if not self.max_bucket_bytes:
            return {}
        over = {
            b: bb
            for b in touched
            if (
                bb := self.table.rel_dir_bytes(
                    [written.get(b), *written_deltas.get(b, [])]
                )
            )
            > self.max_bucket_bytes
        }
        if not over:
            return {}
        recommended = self._rescale_recommendation(
            max(over.values()), self.max_bucket_bytes, n_buckets
        )
        msg = (
            f"bucket(s) {sorted(over)} exceed max_bucket_bytes="
            f"{self.max_bucket_bytes} (worst {max(over.values())} bytes): the "
            f"one-bucket-per-task merge contract is at risk of OOM — "
            f"rescale({recommended}) recommended"
        )
        if self.on_oversize_bucket == "error":
            raise BucketSizeError(msg)
        import warnings

        warnings.warn(msg, stacklevel=3)
        return {
            "oversize_buckets": {str(b): v for b, v in over.items()},
            "recommended_n_buckets": recommended,
        }

    def rescale(self, new_n_buckets: int) -> dict:
        """Partition-spec evolution: rewrite the table under a new bucket
        count (Iceberg bucket(doc_id, N) -> bucket(doc_id, M)). Visible
        state unchanged; every subsequent batch merges under the new layout
        automatically (the bucket count is manifest-authoritative)."""
        return self.table.rescale(new_n_buckets)

    def rollback(self, to_epoch: int) -> dict:
        """Restore the table to a retained epoch (Iceberg
        rollback_to_snapshot analogue; metadata-only). Batches committed
        after ``to_epoch`` become re-appliable — re-deliver the corrected
        versions under the same batch ids and replay proceeds from the
        restored state. Incremental changelog consumers cannot cross the
        rollback (``changes`` raises) — re-bootstrap them from
        ``state(epoch=...)``. See SnapshotTable.rollback."""
        return self.table.rollback(to_epoch)

    def changes(
        self, from_epoch: int, to_epoch: int | None = None, value_diff: bool = False
    ) -> DataFrame:
        """Incremental changelog of committed changes in ``(from_epoch,
        to_epoch]`` (Iceberg incremental scan / changelog view analogue) —
        what a downstream consumer polls instead of re-reading the state.
        ``value_diff=True`` suppresses same-value writes everywhere (mode-
        independent rows, at the cost of reading delta epochs' bucket bases).
        See SnapshotTable.read_changes for semantics and cost model."""
        return self.table.read_changes(from_epoch, to_epoch, value_diff=value_diff)

    # --------------------------------------------------- dead-letter re-drive
    def quarantined(
        self, from_epoch: int = 0, to_epoch: int | None = None
    ) -> DataFrame:
        """Dead-letter reader: the quarantine side-outputs of committed
        epochs in ``(from_epoch, to_epoch]`` — original event columns plus
        ``reason`` and ``q_epoch`` (the epoch whose batch quarantined the
        event). Side-outputs written under evolved schemas union by name
        (missing columns null). Zero rows → an empty frame on the base
        event schema.

        Retention: quarantine side-outputs live with their epoch —
        ``vacuum`` reclaims them together with expired snapshots, so
        re-drive dead letters BEFORE their epochs fall out of the
        retained window."""
        from georef_ar_etl_spark.schemas import EVENT_SCHEMA

        head = self.table.latest_manifest()
        hi = to_epoch if to_epoch is not None else (head["epoch"] if head else 0)
        parts = []
        for m in self.table.manifests():
            if from_epoch < m["epoch"] <= hi and m.get("quarantine_path"):
                parts.append(
                    self.spark.read.parquet(
                        f"{self.table.root}/{m['quarantine_path']}"
                    ).withColumn("q_epoch", F.lit(m["epoch"]).cast("long"))
                )
        if not parts:
            import pyspark.sql.types as T

            empty = T.StructType(
                list(EVENT_SCHEMA.fields)
                + [
                    T.StructField("reason", T.StringType()),
                    T.StructField("q_epoch", T.LongType()),
                ]
            )
            return self.spark.createDataFrame([], empty)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p, allowMissingColumns=True)
        return out

    def redrive_quarantined(
        self,
        batch_id: int,
        from_epoch: int = 0,
        to_epoch: int | None = None,
        reasons: list[str] | None = None,
    ) -> dict:
        """Fix-and-replay for the dead-letter queue: re-apply quarantined
        events as a NEW batch after the cause is repaired (the canonical
        case: late dimension rows — update ``self.dim`` first; re-validation
        happens inside the normal ``apply_batch`` path, so events that are
        STILL invalid simply re-quarantine at the new epoch, and the new
        batch gets the full digest/conflict/idempotency treatment).

        Supersession guard — the part that keeps re-drive from corrupting
        state: a quarantined event is DROPPED when its doc_id has any
        committed change in an epoch ``>= q_epoch`` (changelog witness).
        State rows carry no per-row (batch_id, seq) lineage, so "my batch
        also wrote this doc" cannot be ordered against the dead letter —
        the guard is deliberately conservative: re-driving stale payloads
        over newer writes is silent corruption, while re-submitting a
        genuinely-wanted update is always possible upstream. Requires
        changelog retention (vacuum ``keep_last``) to still cover the
        re-drive window — an expired range fails loudly in read_changes
        rather than silently skipping the guard.

        ``reasons`` restricts the re-drive to specific quarantine reasons
        (e.g. only ``unknown_dim`` after a dim fix). Returns the
        ``apply_batch`` manifest with re-drive counts added under
        ``metrics.redrive``."""
        head = self.table.latest_manifest()
        if head is None:
            raise ValueError("redrive requires a bootstrapped table")
        # idempotent re-delivery: a redrive batch's CONTENT is
        # state-dependent (the supersession guard sees the first redrive's
        # own commits on a second run), so the digest check alone would
        # mis-read re-delivery as conflict — short-circuit on the batch id
        # BEFORE recomputing, same exactly-once outcome as apply_batch
        committed = self.table.committed_batches()
        if batch_id in committed:
            return committed[batch_id]
        q = self.quarantined(from_epoch, to_epoch)
        if reasons is not None:
            q = q.filter(F.col("reason").isin(list(reasons)))
        q = q.drop("reason")
        n_selected = q.count()
        ch = self.changes(from_epoch, head["epoch"]).select(
            F.col("doc_id").alias("_ch_doc"), "change_epoch"
        )
        live = q.join(
            ch,
            (q["doc_id"] == ch["_ch_doc"]) & (ch["change_epoch"] >= q["q_epoch"]),
            "left_anti",
        ).drop("q_epoch")
        n_live = live.count()
        manifest = self.apply_batch(live, batch_id)
        manifest.setdefault("metrics", {})["redrive"] = {
            "selected": int(n_selected),
            "superseded": int(n_selected - n_live),
            "redriven": int(n_live),
        }
        return manifest

    def assert_size(self, target_size: int, op: str = "eq") -> int:
        """Row-count gate on the CURRENT committed state (reference:
        ValidateTableSizeStep, georef_ar_etl/utils.py:94-118). Reads the
        manifest's total_rows — per-bucket counts are summed at commit time,
        so the gate costs zero Spark jobs regardless of table size."""
        import operator as _operator

        from georef_ar_etl_spark.plans.steps import VALID_SIZE_OPS, TableSizeError

        if op not in VALID_SIZE_OPS:
            raise ValueError(f"unknown size operator: {op!r}")
        m = self.table.latest_manifest()
        if m is None:
            raise TableSizeError("no committed manifest to validate against")
        n = int(m["total_rows"])
        if not getattr(_operator, op)(n, target_size):
            raise TableSizeError(
                f"state has {n} rows; failed size validation against "
                f"target_size={target_size} with operator {op!r}"
            )
        return n

    # ------------------------------------------------------------ apply batch
    @staticmethod
    def _schema_fp(manifest: dict) -> str:
        """Fingerprint of the manifest surface the pre-pass depends on: the
        physical schema, the logical→physical colmap and the dropped set.
        Everything else a pre-pass hint carries (aligned/tagged frame,
        digest, quarantine histogram, touched buckets) is a pure function
        of (events, this surface, dim) — so a hint computed against an
        OLDER manifest is valid for apply exactly when the fingerprints
        match and the hint allocated nothing new."""
        return json.dumps(
            [
                manifest["schema"],
                manifest.get("colmap") or {},
                sorted(manifest.get("dropped_cols") or []),
            ],
            sort_keys=True,
        )

    def prepass(self, events: DataFrame) -> dict:
        """Run the state-independent half of ``apply_batch`` — schema
        contract + alignment + invalid tagging + the ONE codegen'd digest
        aggregate — and return it as a hint dict for
        ``apply_batch(..., prepass_hint=...)``. Thread-safe: submit it for
        batch N+1 while batch N's merge runs (guide §2.6 — the digest job
        back-fills executor cores the merge's task tail leaves idle), which
        removes the pre-pass from the serial per-batch critical path.
        ``apply_batch`` validates the hint against the LIVE manifest and
        silently recomputes when the table's schema surface moved (e.g. the
        previous batch evolved the schema), so a stale hint can never
        corrupt a commit."""
        return self._prepass(events)

    def _prepass(self, events: DataFrame) -> dict:
        t0 = time.time()
        latest = self.table.latest_manifest()
        if latest is None:
            raise RuntimeError("bootstrap() the table before applying batches")

        # 1. schema contract + additive evolution. Events address columns by
        # LOGICAL name; the table's files keep their immutable PHYSICAL
        # names (snapshot_table colmap — metadata-only rename/drop), so the
        # contract + evolution run in logical space and the merge runs in
        # physical space, with exactly one rename between them.
        latest_schema = T.StructType.fromJson(latest["schema"])
        colmap = dict(latest.get("colmap") or {})  # logical → physical
        dropped = set(latest.get("dropped_cols") or [])
        inv = {p: l for l, p in colmap.items()}
        logical_latest = T.StructType([
            T.StructField(inv.get(f.name, f.name), f.dataType, f.nullable)
            for f in latest_schema.fields
        ])
        contract = validate_contract(events.schema, STATE_SCHEMA)
        if not contract.ok:
            raise SchemaContractError("; ".join(contract.errors))
        new_logical = evolved_state_schema(logical_latest, events.schema)
        # allocate immutable physical names for newly added logical columns:
        # a name that ever existed physically (live under another logical
        # name, or dropped) binds a FRESH suffixed physical column, so
        # dropped/renamed-away data can never resurrect under a re-add
        live_phys = {f.name for f in latest_schema.fields}
        logical_live = {f.name for f in logical_latest.fields}
        for f in new_logical.fields:
            if f.name in logical_live:
                continue
            if f.name in dropped or f.name in live_phys or f.name in colmap.values():
                colmap[f.name] = f"{f.name}__e{latest['epoch'] + 1}"
        new_schema = T.StructType([
            T.StructField(colmap.get(f.name, f.name), f.dataType, f.nullable)
            for f in new_logical.fields
        ])
        state_schema = latest_schema
        payload_cols = [f.name for f in new_schema.fields]  # physical

        # digest covers the batch's ORIGINAL columns — alignment below adds
        # evolution columns as nulls, and a legit redelivery of an old-shape
        # batch after evolution must still digest identically
        orig_cols = sorted(events.columns)
        # make older-shape batches mergeable after evolution (missing → null)
        events = align_columns(events, T.StructType(
            [f for f in new_logical.fields if f.name not in EVENT_META_COLS]
        ).add("batch_id", "long").add("seq", "long").add("op", "string"))

        if self.spread_input:
            from georef_ar_etl_spark.functions.layout import spread_for_compute

            events = spread_for_compute(events)
        nb = self.table.n_buckets
        tagged = tag_invalid(events, self.dim)
        if self.cache_batch:
            # persist the tagged batch between the pre-pass and the merge:
            # the two jobs otherwise scan+parse+tag the events twice. A/B
            # at local[4]: consistent 8-22% replay win on ~1 KiB-token rows
            # (three alternating pairs), a wash on 64-token rows (mixed
            # 1.26/0.86/0.97) -- hence opt-in, for wide-payload pipelines.
            tagged = tagged.persist()
        try:
            # width-stable digest: hash every column at its canonical wide
            # type (schemas.canonical_wide) so the same VALUES digest
            # identically whether a batch arrives int32 or int64 — narrow
            # re-delivery after a widening must short-circuit, not conflict
            ev_types = {f.name: f.dataType for f in events.schema.fields}
            digest_cols = ", ".join(
                f"cast(`{c}` as {canonical_wide(ev_types[c]).simpleString()})"
                if canonical_wide(ev_types[c]) is not ev_types[c]
                else f"`{c}`"
                for c in orig_cols
            )
            digest_aggs = [
                F.expr(f"bit_xor(xxhash64({digest_cols}))").alias("_x"),
                F.count(F.lit(1)).alias("_n"),
                # valid partial-column updates present? routes the dedup to
                # the patch-aware fold (costless here — one more column in an
                # aggregate the pre-pass already runs)
                F.sum(
                    F.when(
                        F.col("reason").isNull() & (F.col("op") == "patch"), 1
                    ).otherwise(0)
                ).alias("_np"),
                *[
                    F.sum(F.when(F.col("reason") == r, 1).otherwise(0)).alias(r)
                    for r in QUARANTINE_REASONS
                ],
            ]

            # Pre-pass (job 1): ONE codegen'd hash aggregate over the batch,
            # grouped by target bucket (invalid rows group under null), computes
            # the content digest (bit_xor is associative — per-bucket partials
            # xor-combine on the driver), the quarantine-reason histogram, the
            # touched-bucket set AND the per-bucket valid-event counts that feed
            # the hot-bucket route. The exchange carries at most n_buckets+1
            # rows per map partition — fixed-size regardless of batch size.
            # (Folding this into the merge job as .observe() metrics was
            # measured 20% SLOWER end-to-end at local[4]: CollectMetrics
            # evaluates its expressions interpreted, per row, on the merge
            # stage's critical path, while a dedicated HashAggregate runs
            # whole-stage-codegen'd. Two cheap jobs beat one job with an
            # interpreted hot loop.)
            pre_rows = (
                tagged.groupBy(
                    F.when(
                        F.col("reason").isNull(), bucket_expr(F.col("doc_id"), nb)
                    ).alias("_bucket")
                )
                .agg(*digest_aggs)
                .collect()
            )
            mask = (1 << 64) - 1
            x, events_in, patch_rows = 0, 0, 0
            q_counts: dict[str, int] = {}
            bucket_events: dict[int, int] = {}
            for r in pre_rows:
                x ^= r["_x"] & mask
                events_in += r["_n"]
                patch_rows += int(r["_np"])
                for reason in QUARANTINE_REASONS:
                    if r[reason]:
                        q_counts[reason] = q_counts.get(reason, 0) + int(r[reason])
                if r["_bucket"] is not None:
                    bucket_events[int(r["_bucket"])] = int(r["_n"])
            x &= mask
            if x >= 1 << 63:
                x -= 1 << 64  # two's complement, matching Spark's signed bit_xor
            digest = f"{x if pre_rows else None}:{events_in}"
        except BaseException:
            if self.cache_batch:
                tagged.unpersist()
            raise
        return {
            "fp": self._schema_fp(latest),
            # evolution allocated something (new logical column or fresh
            # physical name) — the allocation embedded the epoch number, so
            # such a hint is only valid inline, never across an overlap
            "evolved": new_logical != logical_latest
            or colmap != dict(latest.get("colmap") or {}),
            "colmap": colmap,
            "logical_latest": logical_latest,
            "new_logical": new_logical,
            "new_schema": new_schema,
            "payload_cols": payload_cols,
            "tagged": tagged,
            "digest": digest,
            "events_in": events_in,
            "patch_rows": patch_rows,
            "q_counts": q_counts,
            "bucket_events": bucket_events,
            "prepass_sec": round(time.time() - t0, 2),
        }

    def apply_batch(
        self,
        events: DataFrame,
        batch_id: int,
        allow_out_of_order: bool = False,
        stage: bool = False,
        prepass_hint: dict | None = None,
    ) -> dict:
        t0 = time.time()
        latest = self.table.latest_manifest()
        if latest is None:
            raise RuntimeError("bootstrap() the table before applying batches")

        # Driver round-trips per micro-batch are the serial cost that caps
        # scaling efficiency: this pipeline runs exactly TWO Spark jobs per
        # fresh batch — the codegen'd pre-pass aggregate (digest, quarantine
        # histogram, touched buckets; doubles as idempotent-redelivery
        # verification) and the merge+write — plus a quarantine side-output
        # write only when something was actually quarantined. (A one-job
        # variant via .observe() was measured 20% slower: CollectMetrics
        # evaluates interpreted, per row, inside the merge stage.) With a
        # ``prepass_hint`` (replay_segments overlap, guide §2.6) the
        # pre-pass job leaves this batch's critical path entirely.
        committed = self.table.committed_batches()

        # replay-order guard: a late-arriving LOWER batch_id applied on top of
        # later batches silently violates the (batch_id, seq) replay order the
        # oracle defines (streaming foreachBatch only orders within one
        # trigger). Idempotent re-delivery of a committed id is exempt —
        # it proceeds to the digest verification below and returns a no-op.
        if (
            not allow_out_of_order
            and batch_id not in committed
            and committed
            and batch_id < max(committed)
        ):
            raise OutOfOrderBatchError(
                f"batch {batch_id} arrives after committed batch "
                f"{max(committed)}; pass allow_out_of_order=True for an "
                f"intentional backfill"
            )

        pre = None
        pre_overlapped = False
        if prepass_hint is not None:
            if (
                not prepass_hint.get("evolved")
                and prepass_hint["fp"] == self._schema_fp(latest)
            ):
                pre = prepass_hint
                pre_overlapped = True
            elif self.cache_batch:
                # stale hint (schema surface moved since it was computed):
                # recompute inline below; release its cached frame
                prepass_hint["tagged"].unpersist()
        if pre is None:
            pre = self._prepass(events)
        colmap = pre["colmap"]
        logical_latest = pre["logical_latest"]
        new_logical = pre["new_logical"]
        new_schema = pre["new_schema"]
        payload_cols = pre["payload_cols"]
        tagged = pre["tagged"]
        digest = pre["digest"]
        events_in = pre["events_in"]
        patch_rows = pre["patch_rows"]
        q_counts = dict(pre["q_counts"])
        bucket_events = dict(pre["bucket_events"])
        logical_live = {f.name for f in logical_latest.fields}
        nb = self.table.n_buckets
        try:
            if batch_id in committed:
                if committed[batch_id]["batch_digest"] != digest:
                    raise ConflictError(
                        f"batch {batch_id} re-delivered with different content"
                    )
                return committed[batch_id]
            # write-audit-publish gate: a staged snapshot blocks further
            # applies (the epoch chain must not fork past an un-audited
            # commit). Re-delivery of the SAME staged batch is idempotent.
            for s in self.table.staged_manifests():
                if s["batch_id"] == batch_id and s["batch_digest"] == digest:
                    if stage:
                        return s  # idempotent re-stage
                    raise StagedCommitPending(
                        f"batch {batch_id} is already staged at epoch "
                        f"{s['epoch']} — publish_staged() or "
                        f"abandon_staged() it"
                    )
                raise StagedCommitPending(
                    f"staged epoch {s['epoch']} (batch {s['batch_id']}) is "
                    f"awaiting audit — publish_staged() or abandon_staged() "
                    f"before applying batch {batch_id}"
                )
            q_rows = sum(q_counts.values())
            touched = sorted(bucket_events)
            valid_rows = events_in - q_rows
            t_pre_done = time.time()

            # quarantine side-output, written only when non-empty
            epoch = latest["epoch"] + 1
            q_path = None
            if q_rows:
                q_path = self.table.write_quarantine(
                    tagged.filter(F.col("reason").isNotNull()), epoch
                )
            valid = tagged.filter(F.col("reason").isNull()).drop("reason")
            if any(colmap.get(f.name, f.name) != f.name for f in new_logical.fields):
                # one rename at the logical/physical boundary: the digest and
                # quarantine above saw the as-delivered logical columns; the
                # merge and every file below speak physical
                valid = valid.select(
                    "batch_id", "seq", "op",
                    *[
                        F.col(f.name).alias(colmap.get(f.name, f.name))
                        for f in new_logical.fields
                    ],
                )
            t_quar_done = time.time()

            # hot-bucket auto-route: one bucket carrying most of a large batch
            # would serialize in a single copartitioned merge task — send THAT
            # batch through the join merge (map-side pre-aggregated dedup,
            # spread across shuffle partitions) instead of relying on manual
            # configuration
            merge_impl = self.merge_impl
            merge_route = None
            if (
                merge_impl == "copartitioned"
                and valid_rows >= self.hot_route_min_events
                and bucket_events
                and max(bucket_events.values()) > self.hot_route_share * valid_rows
            ):
                merge_impl = "join"
                merge_route = "join_hot_bucket"

            written_deltas: dict[int, list[str]] = {}
            if merge_impl == "copartitioned":
                if self.strict_dup:
                    # patches legitimately repeat a key (they compose); the
                    # at-most-one-event-per-key contract binds FULL events only
                    full_only = (
                        valid.filter(F.col("op") != "patch") if patch_rows else valid
                    )
                    latest_per_key(full_only, strict=True)  # raises on duplicates
                # dedup AND normalization happen inside the merge tasks (post-
                # shuffle, full parallelism, no winners broadcast) — see
                # copart_merge.merge_copartitioned
                batch_b = valid.select(
                    "op", "seq", bucket_expr(F.col("doc_id"), nb).alias("bucket"),
                    *payload_cols
                )
                bucket_files = self.table.bucket_file_paths(touched, manifest=latest)
                bucket_delta_files = self.table.bucket_delta_paths(touched, manifest=latest)
                bucket_dv_dirs = self.table.bucket_dv_paths(touched, manifest=latest)
                bucket_live = {
                    b: int(latest["bucket_counts"].get(str(b), 0)) for b in touched
                }
                epoch_dir = self.table.epoch_dir(epoch)
                results = merge_copartitioned(
                    batch_b,
                    bucket_files,
                    payload_cols,
                    json.dumps(new_schema.jsonValue()),
                    epoch_dir,
                    bucket_deltas=bucket_delta_files,
                    bucket_live=bucket_live,
                    mor_max_deltas=self.mor_max_deltas,
                    mor_rewrite_ratio=self.mor_rewrite_ratio,
                    bucket_dvs=bucket_dv_dirs,
                    bloom_cols=latest.get("bloom_cols"),
                ).collect()
                parent_bases = latest["buckets"]
                parent_deltas = latest.get("bucket_deltas") or {}
                written, merge_modes = {}, {"delta": 0, "rewrite": 0, "noop": 0}
                for r in results:
                    b = int(r["bucket"])
                    if r["mode"] == "noop":
                        # all-no-op change group: base AND chain carry unchanged
                        written[b] = parent_bases.get(str(b))
                        pchain = parent_deltas.get(str(b))
                        if pchain:
                            written_deltas[b] = list(pchain)
                        merge_modes["noop"] += 1
                        continue
                    rel = os.path.relpath(os.path.dirname(r["path"]), self.table.root)
                    if r["mode"] == "delta":
                        # base carried from the parent; the chain grows by one
                        written[b] = parent_bases.get(str(b))
                        written_deltas[b] = list(parent_deltas.get(str(b)) or []) + [rel]
                    else:
                        written[b] = rel  # full rewrite clears any pending chain
                    merge_modes[r["mode"]] += 1
                written_counts = {int(r["bucket"]): int(r["rows"]) for r in results}
                # per-bucket action ID lineage (capped, sorted samples straight
                # from the merge tasks — no extra pass). Reference reports the
                # added/updated/deleted ID lists per run, transformers.py:145-149.
                bucket_lineage = {
                    int(r["bucket"]): {
                        a: list(r[f"{a}_ids"])
                        for a in ("inserted", "updated", "deleted", "patched")
                        if len(r[f"{a}_ids"])
                    }
                    for r in results
                }
                bucket_lineage = {b: v for b, v in bucket_lineage.items() if v}
                total_after = sum(written_counts.values())
                action_counts = {
                    a: s
                    for a, s in (
                        ("insert", sum(int(r["inserted"]) for r in results)),
                        ("update", sum(int(r["updated"]) for r in results)),
                        ("delete", sum(int(r["deleted"]) for r in results)),
                        ("delete_noop", sum(int(r["delete_noop"]) for r in results)),
                        ("patched", sum(int(r["patched"]) for r in results)),
                        ("patch_noop", sum(int(r["patch_noop"]) for r in results)),
                    )
                    if s
                }
                keep = (
                    total_after
                    - action_counts.get("insert", 0)
                    - action_counts.get("update", 0)
                    - action_counts.get("patched", 0)
                )
                if keep:
                    action_counts["keep"] = keep
            else:
                if patch_rows:
                    # patch-aware in-batch fold (partial-column overlay in
                    # replay order). Strict mode still binds full events.
                    if self.strict_dup:
                        latest_per_key(valid.filter(F.col("op") != "patch"), strict=True)
                    deduped = fold_patch_events(valid, payload_cols)
                else:
                    deduped = latest_per_key(valid, strict=self.strict_dup)
                normalized = with_normalized_tokens(deduped, impl=self.normalize_impl)
                state_touched = align_columns(
                    self.table.read_state(
                        buckets=touched, manifest=latest, physical=True
                    ),
                    new_schema,
                )
                merged = merge_upsert(state_touched, normalized, payload_cols)
                m_obs = Observation(f"merge-{batch_id}")
                m_aggs = [
                    F.sum(F.when(F.col("_action") == a, 1).otherwise(0)).alias(a)
                    for a in ACTIONS
                ]
                observed = merged.tagged.observe(m_obs, *m_aggs)
                new_buckets_df = observed.filter(
                    # patch_noop rows are null-payload join residue of an
                    # absent key, not state
                    ~F.col("_action").isin("delete", "delete_noop", "patch_noop")
                ).drop("_key", "_action").withColumn(
                    "bucket", bucket_expr(F.col("doc_id"), nb)
                )
                written = self.table.write_data(
                    epoch, new_buckets_df, bloom_cols=latest.get("bloom_cols")
                )
                written_counts = None
                bucket_lineage = None  # join path records counts only
                merge_modes = {"delta": 0, "rewrite": len(written), "noop": 0}
                m_got = m_obs.get
                action_counts = {a: int(m_got[a]) for a in ACTIONS if m_got[a]}

            phases = {
                # inline: schema+digest time; overlapped: the hint ran
                # concurrently with the previous batch's merge, so only its
                # validation lands on this batch's critical path — the
                # hint's own duration is reported separately
                "prepass": round(t_pre_done - t0, 2),
                "quarantine_write": round(t_quar_done - t_pre_done, 2),
                "merge_write": round(time.time() - t_quar_done, 2),
            }
            if pre_overlapped:
                phases["prepass_overlapped_sec"] = pre["prepass_sec"]
            wall = time.time() - t0
            metrics = {
                "kind": "stage" if stage else "apply",
                "events_in": events_in,
                "quarantined": q_counts,
                "actions": action_counts,
                "touched_buckets": len(touched),
                "merge_modes": merge_modes,
                **({"merge_route": merge_route} if merge_route else {}),
                "bucket_lineage": bucket_lineage,
                # reported under LOGICAL names (what the batch delivered)
                "schema_added_columns": [
                    f.name for f in new_logical.fields
                    if f.name not in logical_live
                ],
                "schema_widened_columns": sorted(
                    f.name for f in new_logical.fields
                    for old in (
                        {x.name: x for x in logical_latest.fields}.get(f.name),
                    )
                    if old is not None
                    and old.dataType.simpleString() != f.dataType.simpleString()
                ),
                "wall_sec": wall,
                "events_per_sec": events_in / wall if wall > 0 else None,
                "phase_sec": phases,
            }
            # bucket-size contract check BEFORE the commit point: error mode
            # must leave only an invisible orphan epoch dir, never a head
            # referencing an over-contract bucket without a metrics record
            metrics.update(
                self._bucket_size_guard(written, written_deltas, touched, nb)
            )
            manifest = self.table.write_manifest(
                epoch=epoch,
                schema=new_schema,
                written=written,
                touched_buckets=touched,
                batch_id=batch_id,
                batch_digest=digest,
                metrics=metrics,
                quarantine_path=q_path,
                quarantine_rows=q_rows,
                written_counts=written_counts,
                written_deltas=written_deltas,
                staged=stage,
                colmap=colmap,
            )
            return manifest
        finally:
            if self.cache_batch:
                tagged.unpersist()

    # --------------------------------------------------- write-audit-publish
    def stage_batch(
        self, events: DataFrame, batch_id: int, allow_out_of_order: bool = False
    ) -> dict:
        """Apply a change batch into an INVISIBLE staged snapshot — identical
        merge, data files and metrics to ``apply_batch``, but the manifest
        lands in the staging directory, so no reader or changelog consumer
        can observe it until ``publish_staged``. This is the Iceberg
        write-audit-publish (WAP) pattern; the reference's analogue is the
        per-run report a human inspects before trusting a load
        (georef_ar_etl/process.py:250-257 + the mail report)."""
        return self.apply_batch(
            events, batch_id, allow_out_of_order=allow_out_of_order, stage=True
        )

    def staged_state(self, epoch: int | None = None) -> DataFrame:
        """The table AS IF the staged snapshot were published — what the
        audit runs against."""
        return self.table.read_state(
            manifest=self.table.staged_manifest(epoch)
        ).drop("bucket")

    def audit_staged(
        self,
        expectations: list[tuple[str, str | None, dict]],
        epoch: int | None = None,
        buckets: list[int] | None = None,
    ) -> DataFrame:
        """Run declarative expectations (operators/validate.expect_report)
        over the staged state. ``buckets`` narrows the audited read to the
        staged snapshot's touched buckets (pass
        ``manifest["touched_buckets"]``) — at corpus scale the audit should
        scan what the batch changed, not the whole table."""
        from georef_ar_etl_spark.operators.validate import expect_report

        s = self.table.staged_manifest(epoch)
        df = self.table.read_state(manifest=s, buckets=buckets)
        return expect_report(df, expectations)

    def publish_staged(self, epoch: int | None = None) -> dict:
        return self.table.publish_staged(epoch)

    def abandon_staged(self, epoch: int | None = None) -> dict:
        return self.table.abandon_staged(epoch)

    def apply_audited(
        self,
        events: DataFrame,
        batch_id: int,
        expectations: list[tuple[str, str | None, dict]],
        allow_out_of_order: bool = False,
        audit_touched_only: bool = False,
    ) -> dict:
        """One-call WAP: stage → audit → publish (all expectations pass) or
        abandon (any fails). Returns ``{"published": bool, "manifest":
        dict | None, "report": [expectation rows]}``. Idempotent re-delivery
        of an already-published batch short-circuits with an empty report."""
        staged = self.stage_batch(events, batch_id, allow_out_of_order)
        if not staged.get("staged"):
            # already committed live in a previous delivery — nothing to audit
            return {"published": True, "manifest": staged, "report": []}
        buckets = staged["touched_buckets"] if audit_touched_only else None
        report = [
            r.asDict()
            for r in self.audit_staged(
                expectations, staged["epoch"], buckets=buckets
            ).collect()
        ]
        if all(r["passed"] for r in report):
            return {
                "published": True,
                "manifest": self.publish_staged(staged["epoch"]),
                "report": report,
            }
        self.abandon_staged(staged["epoch"])
        return {"published": False, "manifest": None, "report": report}

    # ---------------------------------------------------------------- replay
    def replay(self, events: DataFrame, batch_ids: list[int] | None = None) -> list[dict]:
        """Apply every batch in ``events`` in batch_id order, skipping batches
        already committed (resume-from-checkpoint). Pass ``batch_ids`` when
        the caller already knows them — saves a full discovery scan."""
        if batch_ids is None:
            batch_ids = [
                r["batch_id"]
                for r in events.select("batch_id").distinct().orderBy("batch_id").collect()
            ]
        out = []
        for b in sorted(batch_ids):
            out.append(self.apply_batch(events.filter(F.col("batch_id") == b), b))
        return out

    def replay_segments(
        self, segment_dir: str, overlap_prepass: bool = True
    ) -> list[dict]:
        """Replay WAL-segment files named ``batch-<id>.parquet`` (one file per
        batch_id — the layout streaming/apply.py documents and benchgen
        writes). Each batch reads ONLY its own file: no discovery scan, no
        row-group pruning over the whole log.

        ``overlap_prepass`` (default on): batch N+1's state-independent
        pre-pass — schema contract, invalid tagging and the digest
        aggregate — runs on a driver thread WHILE batch N merges and
        commits (guide §2.6: concurrent jobs back-fill the cores the merge
        stage's task tail frees), removing the pre-pass from the serial
        per-batch critical path. Correctness never depends on the overlap:
        ``apply_batch`` re-validates every hint against the live manifest
        and recomputes inline if the previous batch moved the schema
        surface."""
        import os as _os
        from concurrent.futures import ThreadPoolExecutor

        segs = sorted(
            (int(n.split("-")[1].split(".")[0]), _os.path.join(segment_dir, n))
            for n in _os.listdir(segment_dir)
            if n.startswith("batch-") and n.endswith(".parquet")
        )
        out = []
        if not overlap_prepass or len(segs) <= 1:
            for batch_id, path in segs:
                out.append(self.apply_batch(self.spark.read.parquet(path), batch_id))
            return out
        dfs = [(b, self.spark.read.parquet(p)) for b, p in segs]
        with ThreadPoolExecutor(max_workers=1) as pool:
            fut = None
            try:
                for i, (batch_id, ev) in enumerate(dfs):
                    hint = fut.result() if fut is not None else None
                    fut = (
                        pool.submit(self.prepass, dfs[i + 1][1])
                        if i + 1 < len(dfs)
                        else None
                    )
                    out.append(self.apply_batch(ev, batch_id, prepass_hint=hint))
            except BaseException:
                # drain the in-flight hint so a failed apply doesn't leak
                # its cached frame (persist only happens under cache_batch)
                if fut is not None and self.cache_batch:
                    try:
                        fut.result()["tagged"].unpersist()
                    except Exception:
                        pass
                raise
        return out

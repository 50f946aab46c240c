"""Iceberg-style snapshot table: bucketed parquet + atomic epoch manifests.

Layout::

    <root>/data/epoch=K/bucket=B/part-*.parquet   # full (base) bucket rewrites
    <root>/data/epoch=K/delta=B/delta-*.parquet   # merge-on-read delta files
    <root>/quarantine/epoch=K/*.parquet           # invalid-event side-output
    <root>/manifests/epoch-000000042.json         # THE commit point
    <root>/staged-manifests/epoch-0000000043.json # WAP: staged, pre-audit
    <root>/metrics.jsonl                          # per-commit lineage/metrics

Physical write modes (chosen per bucket per batch by the merge,
operators/copart_merge.py): copy-on-write rewrites the bucket's base files;
merge-on-read appends a delta file (upserts + equality-delete tombstones on
``doc_id``, sinks/mor.py) and leaves the base untouched — the manifest's
``bucket_deltas`` map lists each bucket's pending delta dirs in epoch order.
Readers resolve base + deltas last-writer-wins; ``compact()`` (or any
full-bucket rewrite) clears the chain. This is the Iceberg MOR model
(delete files + rewrite_data_files) at bucket granularity.

Commit protocol (exactly-once without a transactional catalog):

1. data files for the touched buckets are written under a fresh
   ``epoch=K`` directory (a crashed attempt leaves an orphan dir that the
   next attempt overwrites — harmless, unreferenced);
2. the manifest (schema, per-bucket file dirs, counts, lineage, the input
   batch digest) is written to a temp file, fsync'd, and ``os.replace``'d
   into place — the atomic rename IS the commit, the reference analogue of
   the single ``session.commit()`` per process
   (georef_ar_etl/process.py:250-257);
3. untouched buckets are carried over by reference to the parent epoch's
   directories — copy-on-write at bucket granularity, which is exactly the
   Iceberg COW model at file granularity.

Idempotency / resume: a batch whose ``batch_id`` already appears in a
committed manifest is skipped (re-applying a committed epoch is a no-op);
the latest committed manifest *is* the checkpoint, so a killed run resumes
by replaying from the first uncommitted batch (reference analogue:
skip-existing downloads, extractors.py:14-16, and --start/--end re-entry,
process.py:206-249).

Scale posture: rows are hash-bucketed by ``pmod(xxhash64(doc_id), n_buckets)``
— this randomizes the reference's natural prefix skew (Buenos Aires ≫ Tierra
del Fuego) across buckets, and lets a prefix- or source-skewed change batch
touch (and rewrite) only a subset of buckets. On a real cluster the same
layout is declared as an Iceberg ``bucket(doc_id, N)`` partition spec and the
merge becomes a storage-partitioned join (no state-side shuffle).
"""

from __future__ import annotations

import json
import os
import time
from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from georef_ar_etl_spark.sinks.zonemap import (
    read_zonemap,
    residual_filter,
    validate_where,
    write_zonemap,
    zone_excludes,
    zonemap_from_footers,
)

MANIFEST_DIR = "manifests"
STAGED_DIR = "staged-manifests"  # write-audit-publish: invisible until published
DATA_DIR = "data"
QUARANTINE_DIR = "quarantine"
METRICS_LOG = "metrics.jsonl"
BRANCHES_DIR = "branches"  # zero-copy named branches live under the root
PARENT_REF = "../../"  # branch-manifest prefix for parent-owned data dirs

# Freshness-token distrust window (see latest_manifest): a dir mtime
# younger than this is never trusted, because a second same-tick commit
# would not change it. 100 ms covers Linux jiffy-granularity timestamps —
# an ASSUMPTION, not a law: on coarser-mtime filesystems (1 s exFAT/NFS)
# or with >100 ms cross-host clock skew, raise it to the granularity/skew
# bound, at the cost of more re-listings in that window.
FRESHNESS_WINDOW_NS = 100_000_000


def bucket_expr(key_col, n_buckets: int):
    """The table's bucketing function — MUST be identical everywhere
    (writer, merge planner, pruning)."""
    return F.pmod(F.xxhash64(key_col), F.lit(n_buckets)).cast("int")


class ConflictError(RuntimeError):
    """Same epoch committed with a different input digest."""


class SnapshotTable:
    def __init__(self, spark: SparkSession, root: str, n_buckets: int = 32):
        self.spark = spark
        self.root = root.rstrip("/")
        self._default_n_buckets = n_buckets
        self._manifest_cache: dict[str, dict] = {}
        self._latest_cache: dict | None = None
        self._latest_token: int | None = None
        self._expired_cache: dict[int, dict] | None = None
        self._expired_token: int | None = None
        os.makedirs(os.path.join(self.root, MANIFEST_DIR), exist_ok=True)
        os.makedirs(os.path.join(self.root, DATA_DIR), exist_ok=True)

    @property
    def n_buckets(self) -> int:
        """The table's CURRENT bucket count — manifest-authoritative: once a
        manifest exists its ``n_buckets`` wins over the constructor argument,
        so a resumed engine can never silently mis-bucket an existing table
        (the constructor value only seeds a brand-new table), and ``rescale``
        takes effect for every subsequent reader/writer automatically."""
        m = self.latest_manifest()
        return int(m["n_buckets"]) if m else self._default_n_buckets

    # ------------------------------------------------------------- manifests
    def _manifest_path(self, epoch: int) -> str:
        return os.path.join(self.root, MANIFEST_DIR, f"epoch-{epoch:010d}.json")

    def manifests(self) -> list[dict]:
        """All committed manifests, oldest first. Parsed manifests are cached
        by filename — commit history is immutable, so a per-batch re-read is
        pure overhead (it showed up in replay profiles as O(epochs²) IO)."""
        mdir = os.path.join(self.root, MANIFEST_DIR)
        out = []
        for name in sorted(os.listdir(mdir)):
            if name.startswith("epoch-") and name.endswith(".json"):
                m = self._manifest_cache.get(name)
                if m is None:
                    try:
                        with open(os.path.join(mdir, name)) as f:
                            m = json.load(f)
                    except FileNotFoundError:
                        # a vacuum in ANOTHER process expired this manifest
                        # between our listdir and open — it is gone, not
                        # broken; a cross-process reader must skip, not die
                        continue
                    self._manifest_cache[name] = m
                out.append(m)
        return out

    def _mdir_token(self) -> int:
        """Freshness token for the manifests dir: its mtime_ns. Any commit
        (temp-file create + atomic rename) or vacuum bumps it, so comparing
        one cached token against one ``stat`` syscall tells a reader whether
        its cached head can still be trusted — without the O(epochs) listing
        the cache exists to avoid."""
        try:
            return os.stat(os.path.join(self.root, MANIFEST_DIR)).st_mtime_ns
        except FileNotFoundError:
            return -1

    def latest_manifest(self) -> dict | None:
        """Cached head manifest, validated per call against the manifests-dir
        mtime (one ``stat``): our own ``write_manifest`` refreshes the cache
        at the commit point, and a commit by ANOTHER process bumps the dir
        mtime, so a long-lived read-only instance (a changelog consumer
        polling ``read_changes``, a monitor calling ``table_stats``) observes
        new heads instead of serving the first one it ever read. The token is
        taken BEFORE the listing — a commit racing the listing at worst
        triggers one redundant re-list on the next call, never a stale head.

        Coarse-timestamp guard: a commit landing in the SAME filesystem
        timestamp tick as the one we cached would not change the token, so
        a token younger than FRESHNESS_WINDOW_NS is never trusted — the dir
        was modified "just now" and another same-tick commit may follow;
        once quiescent, the cache holds. The window must exceed the
        filesystem's mtime granularity plus any cross-host clock skew (see
        the constant's note)."""
        tok = self._mdir_token()
        recent = tok > 0 and (time.time_ns() - tok) < FRESHNESS_WINDOW_NS
        if self._latest_token != tok or recent:
            ms = self.manifests()
            self._latest_cache = ms[-1] if ms else None
            self._latest_token = None if recent else tok
        return self._latest_cache

    def manifest_for_epoch(self, epoch: int) -> dict:
        """Time travel: the manifest committed at ``epoch`` (raises KeyError
        for unknown/expired epochs)."""
        for m in self.manifests():
            if m["epoch"] == epoch:
                return m
        raise KeyError(f"no committed (or still-retained) manifest for epoch {epoch}")

    def committed_batches(self) -> dict[int, dict]:
        """batch_id → manifest (or expired-batch stub), for idempotent
        re-apply detection. Includes batches whose snapshots were vacuumed:
        exactly-once must survive snapshot expiry, so ``vacuum`` preserves
        the (batch_id, digest) pairs of expired manifests in a ledger.

        Batches undone by ``rollback`` are EXCLUDED (they must re-apply,
        that is what rolling back means) — unless the same batch_id was
        re-committed AFTER the rollback epoch, which reinstates it. The
        invalidation facts live in retained rollback manifests and move
        into a durable ledger when those manifests expire (mirroring the
        expired-batches design), so the exclusion survives vacuum."""
        out: dict[int, dict] = dict(self._expired_batches())
        inv: dict[int, int] = dict(self._invalidated_batches())
        for m in self.manifests():
            if m["batch_id"] is not None:
                out[m["batch_id"]] = m
            for bid in (m.get("metrics") or {}).get("rolled_back_batch_ids", []):
                inv[int(bid)] = max(inv.get(int(bid), -1), m["epoch"])
        for bid, rb_epoch in inv.items():
            cur = out.get(bid)
            if cur is not None and (cur.get("epoch") or 0) < rb_epoch:
                del out[bid]
        return out

    # ---------------------------------------------------------------- rollback
    def _invalidated_path(self) -> str:
        return os.path.join(self.root, MANIFEST_DIR, "invalidated-batches.json")

    def _invalidated_batches(self) -> dict[int, int]:
        """batch_id → rollback epoch, for rollbacks whose manifests were
        vacuumed (small file, read per call — committed_batches runs once
        per apply and the file holds only vacuum-expired rollbacks)."""
        try:
            with open(self._invalidated_path()) as f:
                return {int(k): int(v) for k, v in json.load(f).items()}
        except FileNotFoundError:
            return {}

    def _merge_invalidated(self, mapping: dict[int, int]) -> None:
        cur = self._invalidated_batches()
        for bid, e in mapping.items():
            cur[int(bid)] = max(cur.get(int(bid), -1), int(e))
        p = self._invalidated_path()
        tmp = f"{p}.{os.getpid()}.tmp"
        with open(tmp, "w") as f:
            json.dump({str(k): v for k, v in cur.items()}, f, sort_keys=True)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, p)

    def rollback(self, to_epoch: int) -> dict:
        """Restore the table to a RETAINED epoch (Iceberg
        rollback_to_snapshot analogue): commits a new manifest whose bucket
        maps, delta chains, schema and bucket count are the target's —
        metadata-only, no data moves, and the target's files are already
        protected from vacuum by being referenced from a retained manifest.

        Exactly-once semantics across the rollback: every batch committed
        AFTER ``to_epoch`` is invalidated — re-delivering it re-APPLIES
        (the point of rolling back bad batches is replaying corrected
        ones, same ids allowed, same or different content) — while batches
        at or before ``to_epoch`` keep their idempotent short-circuit.
        Changelog consumers cannot incrementally cross a rollback:
        ``read_changes`` over a range containing one raises, forcing a
        re-bootstrap from a snapshot (the Iceberg incremental-scan rule).
        """
        # KeyError for expired AND for future epochs (nothing to roll
        # forward to — only committed manifests resolve)
        target = self.manifest_for_epoch(to_epoch)
        head = self.latest_manifest()
        if head["epoch"] == to_epoch:
            return head
        rolled = sorted(
            int(m["batch_id"])
            for m in self.manifests()
            if m["epoch"] > to_epoch and m.get("batch_id") is not None
        )
        t0 = time.time()
        m = self.write_manifest(
            epoch=head["epoch"] + 1,
            schema=T.StructType.fromJson(target["schema"]),
            written={
                int(b): d for b, d in target["buckets"].items() if d is not None
            },
            touched_buckets=[int(b) for b in target["buckets"]],
            batch_id=None,
            batch_digest=f"rollback:{to_epoch}<-{head['epoch']}",
            metrics={
                "kind": "rollback",
                "rollback_to": to_epoch,
                "rollback_of": head["epoch"],
                "rolled_back_batch_ids": rolled,
                "wall_sec": round(time.time() - t0, 3),
            },
            written_counts={int(b): c for b, c in target["bucket_counts"].items()},
            written_deltas={
                int(b): dl
                for b, dl in (target.get("bucket_deltas") or {}).items()
            },
            written_dvs={
                int(b): rel
                for b, rel in (target.get("bucket_dvs") or {}).items()
            },
            rescale_to=int(target["n_buckets"]),
        )
        # n_buckets is a manifest-authoritative property — the new head
        # carries the target's count, nothing to sync here
        return m

    # -------------------------------------------------------- tags (refs)
    def _refs_path(self) -> str:
        return os.path.join(self.root, MANIFEST_DIR, "refs.json")

    def tags(self) -> dict[str, dict]:
        """Named snapshot refs (Iceberg ``tags``): name → {epoch,
        created_unix, description}. A tagged epoch is pinned — ``vacuum``
        retains its manifest and every file it references until the tag is
        dropped — which is how a training run records "I read exactly this
        table state" reproducibly."""
        p = self._refs_path()
        if not os.path.exists(p):
            return {}
        with open(p) as f:
            return json.load(f)

    def _write_refs(self, refs: dict[str, dict]) -> None:
        tmp = self._refs_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(refs, f, sort_keys=True)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self._refs_path())

    def create_tag(
        self, name: str, epoch: int | None = None, description: str = ""
    ) -> dict:
        """Pin ``epoch`` (default: head) under ``name``. Idempotent for the
        same (name, epoch); re-pointing an existing tag is a ConflictError —
        drop it first (tags are immutable refs, the Iceberg contract)."""
        if not name or "/" in name or name != name.strip():
            raise ValueError(f"invalid tag name {name!r}")
        # resolves only retained epochs — tagging an expired one is an error
        m = self.latest_manifest() if epoch is None else self.manifest_for_epoch(epoch)
        if m is None:
            raise KeyError("no committed manifest to tag")
        refs = self.tags()
        ex = refs.get(name)
        if ex is not None:
            if int(ex["epoch"]) == int(m["epoch"]):
                return ex
            raise ConflictError(
                f"tag {name!r} already pins epoch {ex['epoch']} — tags are "
                f"immutable; drop_tag() it first"
            )
        refs[name] = {
            "epoch": int(m["epoch"]),
            "created_unix": time.time(),
            "description": description,
        }
        self._write_refs(refs)
        return refs[name]

    def drop_tag(self, name: str) -> dict:
        refs = self.tags()
        if name not in refs:
            raise KeyError(f"no tag {name!r}")
        out = refs.pop(name)
        self._write_refs(refs)
        return out

    def manifest_for_tag(self, name: str) -> dict:
        refs = self.tags()
        if name not in refs:
            raise KeyError(f"no tag {name!r}")
        return self.manifest_for_epoch(int(refs[name]["epoch"]))

    def manifest_as_of(self, unix_ts: float) -> dict:
        """Latest RETAINED manifest committed at or before ``unix_ts`` —
        Iceberg's ``TIMESTAMP AS OF`` time travel. KeyError when every
        retained snapshot is newer (the one you wanted has been vacuumed,
        or the timestamp predates the table)."""
        best = None
        for m in self.manifests():
            if m.get("committed_unix", float("inf")) <= unix_ts:
                if best is None or m["epoch"] > best["epoch"]:
                    best = m
        if best is None:
            raise KeyError(
                f"no retained snapshot committed at or before {unix_ts} — "
                f"it may have been vacuumed (pin with create_tag to retain)"
            )
        return best

    # ------------------------------------------- logical ↔ physical columns
    # Metadata-only column rename/drop (the Iceberg field-ID analogue).
    # PHYSICAL column names are immutable once written to parquet; the
    # manifest's sparse ``colmap`` binds each non-identity LOGICAL name to
    # its physical column, and ``dropped_cols`` records physical names that
    # were retired (so a re-added logical name of the same spelling gets a
    # FRESH physical column — dropped data can never resurrect, the classic
    # name-based-mapping trap Iceberg's field IDs exist to prevent).
    # Internal machinery (merges, deltas, DVs, zone maps, compaction)
    # operates on physical names only; the public read surfaces project
    # physical→logical as their last step, under the colmap of whichever
    # manifest they read — so time travel shows each epoch under the column
    # names it had then (schema-as-of).

    @staticmethod
    def colmap(manifest: dict) -> dict[str, str]:
        """Sparse logical→physical mapping; empty ⇒ logical == physical."""
        return dict(manifest.get("colmap") or {})

    def _where_physical(self, where, manifest: dict):
        cm = self.colmap(manifest)
        if not where or not cm:
            return where
        return [(cm.get(c, c), op, lit) for (c, op, lit) in where]

    def _to_logical(self, df: DataFrame, manifest: dict) -> DataFrame:
        cm = self.colmap(manifest)
        if not cm:
            return df
        return df.withColumnsRenamed({p: l for l, p in cm.items()})

    def logical_schema(self, manifest: dict | None = None) -> T.StructType:
        """The manifest's schema under its LOGICAL column names."""
        m = manifest or self.latest_manifest()
        inv = {p: l for l, p in self.colmap(m).items()}
        phys = T.StructType.fromJson(m["schema"])
        return T.StructType(
            [
                T.StructField(inv.get(f.name, f.name), f.dataType, f.nullable)
                for f in phys.fields
            ]
        )

    def rename_column(self, old: str, new: str) -> dict:
        """Metadata-only column rename (``ALTER TABLE … RENAME COLUMN``):
        commits a manifest whose colmap binds the new logical name to the
        column's immutable physical name. No data file moves; pre-rename
        batches re-deliver idempotently (the content digest hashes the
        as-delivered logical columns, which the events still carry); reads
        of OLD epochs keep showing the old name. The key column (payload
        field 0) is the bucket/merge identity and cannot be renamed."""
        m = self.latest_manifest()
        if m is None:
            raise RuntimeError("bootstrap the table before renaming columns")
        cm = self.colmap(m)
        inv = {p: l for l, p in cm.items()}
        phys_schema = T.StructType.fromJson(m["schema"])
        logical_names = [inv.get(f.name, f.name) for f in phys_schema.fields]
        if old not in logical_names:
            raise KeyError(f"no such column: {old!r} (have {logical_names})")
        if new in logical_names:
            raise ValueError(f"column {new!r} already exists")
        if old == logical_names[0]:
            raise ValueError(
                f"key column {old!r} cannot be renamed — it is the bucket "
                f"and merge identity every change event addresses"
            )
        if not new.isidentifier():
            raise ValueError(f"invalid column name: {new!r}")
        phys = cm.pop(old, old)
        if new != phys:
            cm[new] = phys
        epoch = m["epoch"] + 1
        return self.write_manifest(
            epoch=epoch,
            schema=phys_schema,
            written={},
            touched_buckets=[],
            batch_id=None,
            batch_digest=f"rename:{old}->{new}:{epoch}",
            metrics={
                "kind": "rename_column",
                "from": old,
                "to": new,
                "physical": phys,
            },
            written_counts={},
            colmap=cm,
        )

    def add_column(self, name: str, dtype, comment: str | None = None) -> dict:
        """Metadata-only column add (``ALTER TABLE … ADD COLUMN``): commits
        a manifest whose schema carries the new NULLABLE field — no data
        file moves; existing rows read as NULL (explicit-schema parquet
        scans fill missing columns), subsequent batches / UPDATEs / MERGEs
        may address it by name. A logical name whose physical ever existed
        (currently live under another logical name, or retired by a drop)
        binds a FRESH ``__e{epoch}`` suffixed physical column so dropped or
        renamed-away data can never resurrect (the same field-ID rule
        apply_batch's additive evolution uses, engine.py). ``dtype`` is a
        Spark DataType or DDL string. Time travel to pre-add epochs does
        not show the column."""
        m = self.latest_manifest()
        if m is None:
            raise RuntimeError("bootstrap the table before adding columns")
        if isinstance(dtype, str):
            dtype = T._parse_datatype_string(dtype)
        cm = self.colmap(m)
        inv = {p: l for l, p in cm.items()}
        phys_schema = T.StructType.fromJson(m["schema"])
        logical_names = [inv.get(f.name, f.name) for f in phys_schema.fields]
        if name in logical_names:
            raise ValueError(f"column {name!r} already exists")
        dropped = set(m.get("dropped_cols") or [])
        live_phys = {f.name for f in phys_schema.fields}
        epoch = m["epoch"] + 1
        phys = name
        if name in dropped or name in live_phys or name in cm.values():
            phys = f"{name}__e{epoch}"
            cm[name] = phys
        new_schema = T.StructType(
            list(phys_schema.fields) + [T.StructField(phys, dtype, nullable=True)]
        )
        metrics = {"kind": "add_column", "column": name, "physical": phys}
        if comment:
            metrics["comment"] = comment
        return self.write_manifest(
            epoch=epoch,
            schema=new_schema,
            written={},
            touched_buckets=[],
            batch_id=None,
            batch_digest=f"add:{name}:{epoch}",
            metrics=metrics,
            written_counts={},
            colmap=cm,
        )

    def drop_column(self, name: str) -> dict:
        """Metadata-only column drop (``ALTER TABLE … DROP COLUMN``): the
        physical column leaves the live schema — reads stop projecting it
        instantly, merge/compaction rewrites physically shed it over time
        (old untouched files keep the bytes until rewritten; explicit-schema
        scans just never read them) — and its physical name is retired in
        ``dropped_cols`` so a later re-add of the same logical name binds a
        fresh physical column instead of resurrecting dropped values. Time
        travel to a pre-drop epoch still shows the column."""
        m = self.latest_manifest()
        if m is None:
            raise RuntimeError("bootstrap the table before dropping columns")
        cm = self.colmap(m)
        inv = {p: l for l, p in cm.items()}
        phys_schema = T.StructType.fromJson(m["schema"])
        logical_names = [inv.get(f.name, f.name) for f in phys_schema.fields]
        if name not in logical_names:
            raise KeyError(f"no such column: {name!r} (have {logical_names})")
        if name == logical_names[0]:
            raise ValueError(f"key column {name!r} cannot be dropped")
        phys = cm.pop(name, name)
        new_schema = T.StructType(
            [f for f in phys_schema.fields if f.name != phys]
        )
        dropped = list(m.get("dropped_cols") or []) + [phys]
        epoch = m["epoch"] + 1
        return self.write_manifest(
            epoch=epoch,
            schema=new_schema,
            written={},
            touched_buckets=[],
            batch_id=None,
            batch_digest=f"drop:{name}:{epoch}",
            metrics={"kind": "drop_column", "column": name, "physical": phys},
            written_counts={},
            colmap=cm,
            dropped_cols=dropped,
        )

    def _expired_path(self) -> str:
        return os.path.join(self.root, MANIFEST_DIR, "expired-batches.json")

    def _expired_batches(self) -> dict[int, dict]:
        # cached like manifests: committed_batches() runs once per
        # apply_batch, and a per-batch re-parse of the ledger is the same
        # O(epochs) IO class the manifest cache exists to avoid. Validated
        # per call against the ledger file's mtime (one stat) so a vacuum
        # in ANOTHER process is observed, like latest_manifest.
        p = self._expired_path()
        try:
            tok = os.stat(p).st_mtime_ns
        except FileNotFoundError:
            tok = -1
        # never trust a token younger than the mtime tick (see
        # latest_manifest: a same-tick rewrite would be invisible)
        recent = tok > 0 and (time.time_ns() - tok) < FRESHNESS_WINDOW_NS
        if self._expired_cache is not None and self._expired_token == tok and not recent:
            return self._expired_cache
        if tok == -1:
            self._expired_cache = {}
        else:
            with open(p) as f:
                raw = json.load(f)
            self._expired_cache = {int(k): v for k, v in raw.items()}
        self._expired_token = None if recent else tok
        return self._expired_cache

    # ---------------------------------------------------------------- clone
    def _resolve_snapshot(
        self,
        epoch: int | None = None,
        tag: str | None = None,
        as_of: float | None = None,
    ) -> dict | None:
        """Resolve at most one of epoch / tag / as_of to a retained
        manifest (default: head). Shared by clone_to and create_branch."""
        if sum(x is not None for x in (tag, epoch, as_of)) > 1:
            raise ValueError("pass at most one of tag / epoch / as_of")
        if tag is not None:
            return self.manifest_for_tag(tag)
        if as_of is not None:
            return self.manifest_as_of(as_of)
        if epoch is not None:
            return self.manifest_for_epoch(epoch)
        return self.latest_manifest()

    def _fork_ledgers(self, snap_epoch: int) -> tuple[dict[int, dict], dict[int, int]]:
        """Exactly-once state a fork (clone or branch) at ``snap_epoch``
        must carry: (expired-batches ledger of every batch committed
        STRICTLY BEFORE the snapshot, rollback invalidations at or before
        it). The snapshot's own batch is excluded — its retained manifest
        already carries it on the fork."""
        ledger: dict[int, dict] = {}
        for bid, mm in self.committed_batches().items():
            e = mm.get("epoch")
            if e is None or e >= snap_epoch:
                continue
            ledger[int(bid)] = {
                "batch_id": bid,
                "batch_digest": mm["batch_digest"],
                "epoch": e,
                "expired": True,
                "metrics": {"kind": "expired_redelivery"},
                "total_rows": None,
                "buckets": None,
                "quarantine_rows": 0,
            }
        inv: dict[int, int] = {
            b: e for b, e in self._invalidated_batches().items() if e <= snap_epoch
        }
        for mm in self.manifests():
            if mm["epoch"] > snap_epoch:
                continue
            for bid in (mm.get("metrics") or {}).get("rolled_back_batch_ids", []):
                inv[int(bid)] = max(inv.get(int(bid), -1), mm["epoch"])
        return ledger, inv

    @staticmethod
    def _fsync_json_at(path: str, obj) -> None:
        tmp = f"{path}.{os.getpid()}.tmp"
        with open(tmp, "w") as f:
            json.dump(obj, f, sort_keys=True)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, path)

    def clone_to(
        self,
        dest_root: str,
        epoch: int | None = None,
        tag: str | None = None,
        as_of: float | None = None,
    ) -> dict:
        """Deep CLONE (Delta ``CLONE TABLE`` / snapshot export — the
        experiment-fork primitive: branch a training table at a snapshot
        and let both sides diverge independently). The clone is a fully
        standalone table rooted at ``dest_root`` whose single retained
        snapshot is the resolved source manifest — bases, MOR delta chains
        and deletion vectors copied VERBATIM (the clone reads at the same
        COW/MOR cost the source did), schema/colmap/dropped_cols carried in
        the manifest, so applies, maintenance and time-travel-forward all
        work immediately.

        Exactly-once is cloned too: every batch committed at or before the
        snapshot lands in the clone's expired-batches ledger (redelivering
        a pre-fork batch to the clone short-circuits or conflicts exactly
        like on the source), and rollback invalidations whose rollback
        happened at or before the fork carry over — a batch the source had
        rolled back before the fork re-applies on the clone just as it
        would have on the source. Batches the SOURCE commits after the
        fork do not exist on the clone — that is what forking means.

        Scale plan: the copy is a distributed job — one task per
        referenced data DIRECTORY (the same bucket granularity merge tasks
        use), the DistCp shape; the driver moves only dir names and the
        manifest. Source tags/metrics/quarantine are source-scoped
        observability and deliberately NOT cloned.
        """
        import shutil

        m = self._resolve_snapshot(epoch, tag, as_of)
        if m is None:
            raise RuntimeError("bootstrap the table before cloning")
        if os.path.isdir(os.path.join(dest_root, MANIFEST_DIR)) and any(
            n.startswith("epoch-")
            for n in os.listdir(os.path.join(dest_root, MANIFEST_DIR))
        ):
            raise ValueError(f"clone destination {dest_root!r} is already a table")
        t0 = time.time()
        snap_epoch = int(m["epoch"])

        rel_dirs: set[str] = set()
        for d in m["buckets"].values():
            if d:
                rel_dirs.add(d)
        for links in (m.get("bucket_deltas") or {}).values():
            rel_dirs.update(links or [])
        for d in (m.get("bucket_dvs") or {}).values():
            if d:
                rel_dirs.add(d)

        src_root, dst_root = self.root, dest_root
        os.makedirs(os.path.join(dest_root, MANIFEST_DIR), exist_ok=True)

        def copy_dirs(batches):
            n = 0
            nbytes = 0
            for pdf in batches:
                for rel in pdf["rel"]:
                    src = os.path.join(src_root, rel)
                    dst = os.path.join(dst_root, rel)
                    if os.path.isdir(dst):
                        shutil.rmtree(dst)  # crashed prior attempt
                    os.makedirs(os.path.dirname(dst), exist_ok=True)
                    shutil.copytree(src, dst)
                    n += 1
                    nbytes += sum(
                        os.path.getsize(os.path.join(r, f))
                        for r, _d, fs in os.walk(dst)
                        for f in fs
                    )
            yield pd.DataFrame({"dirs": [n], "bytes": [nbytes]})

        copied = {"dirs": 0, "bytes": 0}
        if rel_dirs:
            res = (
                self.spark.createDataFrame(
                    [(d,) for d in sorted(rel_dirs)], "rel string"
                )
                .repartition(min(len(rel_dirs), 64))
                .mapInPandas(copy_dirs, "dirs long, bytes long")
                .collect()
            )
            copied = {
                "dirs": sum(int(r["dirs"]) for r in res),
                "bytes": sum(int(r["bytes"]) for r in res),
            }

        # exactly-once ledger for the fork: every batch committed before
        # the snapshot, except the snapshot's own (its retained manifest
        # already carries it), plus rollback invalidations at/before it
        ledger, inv = self._fork_ledgers(snap_epoch)
        _fsync_json = self._fsync_json_at

        if ledger:
            _fsync_json(
                os.path.join(dest_root, MANIFEST_DIR, "expired-batches.json"),
                {str(k): v for k, v in ledger.items()},
            )
        if inv:
            _fsync_json(
                os.path.join(dest_root, MANIFEST_DIR, "invalidated-batches.json"),
                {str(k): v for k, v in inv.items()},
            )
        report = {
            "kind": "clone",
            "source_root": src_root,
            "source_epoch": snap_epoch,
            "dirs_copied": copied["dirs"],
            "bytes_copied": copied["bytes"],
            "ledger_batches": len(ledger),
            "wall_sec": round(time.time() - t0, 3),
        }
        with open(os.path.join(dest_root, METRICS_LOG), "a") as f:
            f.write(json.dumps({"epoch": snap_epoch, "metrics": report}) + "\n")
            f.flush()
            os.fsync(f.fileno())
        # the manifest lands LAST — the clone's commit point, same crash
        # invariant as write_manifest (data without a manifest is invisible)
        _fsync_json(
            os.path.join(
                dest_root, MANIFEST_DIR, f"epoch-{snap_epoch:010d}.json"
            ),
            m,
        )
        return report

    # --------------------------------------------------------------- branches
    # Zero-copy named branches (Iceberg branch refs / Nessie branches): a
    # branch is a standalone child table rooted at
    # ``<root>/branches/<name>/`` whose fork manifest references the
    # parent's data directories through ``../../``-relative paths — ZERO
    # bytes copied at fork time (clone_to is the deep-copy sibling). The
    # fork epoch is pinned on the parent with an auto-tag
    # ``branch:<name>`` so parent vacuum can never sweep files the branch
    # still reads; commits on the branch write data under the branch root
    # and never touch the parent. ``fast_forward`` publishes the branch's
    # commits back onto a parent whose head has not moved past the fork —
    # Iceberg's ``fast_forward('main', branch)`` — by MOVING (os.rename,
    # same filesystem by construction) the branch-local data dirs into the
    # parent and re-linking the manifests with parent-root-relative paths,
    # oldest first, each link atomic. At object-store scale the rel paths
    # become absolute URIs and the renames become metadata-only manifest
    # rewrites — the protocol (pin at fork, publish oldest-first, digest
    # idempotence) is unchanged.
    #
    # Reference analogue: the reference rebuilds each entity table in
    # place and has no snapshot forks at all
    # (georef_ar_etl/process.py:206-257); branches are what its
    # "re-run the pipeline and eyeball the diff" workflow becomes when the
    # table is a 10^10-row training corpus you cannot rebuild to try a
    # change.

    def _branches_root(self) -> str:
        return os.path.join(self.root, BRANCHES_DIR)

    def _branch_root(self, name: str) -> str:
        return os.path.join(self._branches_root(), name)

    @staticmethod
    def _check_branch_name(name: str) -> None:
        if (
            not name
            or name != name.strip()
            or any(c in name for c in "/\\:")
            or name in (".", "..")
        ):
            raise ValueError(f"invalid branch name {name!r}")

    @staticmethod
    def _manifest_rels(m: dict) -> set[str]:
        """Every data/quarantine rel-path a manifest references (the same
        surface _referenced_dirs walks, for one manifest)."""
        rels = {d for d in m["buckets"].values() if d}
        for chain in (m.get("bucket_deltas") or {}).values():
            rels.update(chain or [])
        rels.update(d for d in (m.get("bucket_dvs") or {}).values() if d)
        if m.get("dv_changes"):
            rels.add(m["dv_changes"])
        if m.get("quarantine_path"):
            rels.add(m["quarantine_path"])
        return rels

    @staticmethod
    def _rewrite_manifest_rels(m: dict, fn) -> dict:
        """A copy of ``m`` with every referenced rel-path mapped through
        ``fn`` (fork: prefix ``../../``; fast-forward: strip it)."""
        out = dict(m)
        out["buckets"] = {
            b: (fn(d) if d else d) for b, d in m["buckets"].items()
        }
        if m.get("bucket_deltas"):
            out["bucket_deltas"] = {
                b: [fn(d) for d in chain]
                for b, chain in m["bucket_deltas"].items()
            }
        if m.get("bucket_dvs"):
            out["bucket_dvs"] = {b: fn(d) for b, d in m["bucket_dvs"].items()}
        if m.get("dv_changes"):
            out["dv_changes"] = fn(m["dv_changes"])
        if m.get("quarantine_path"):
            out["quarantine_path"] = fn(m["quarantine_path"])
        return out

    def branches(self) -> dict[str, dict]:
        """name → branch metadata ({fork_epoch, created_unix, description})
        for every live branch of this table."""
        broot = self._branches_root()
        out: dict[str, dict] = {}
        if os.path.isdir(broot):
            for name in sorted(os.listdir(broot)):
                meta_p = os.path.join(broot, name, "branch.json")
                try:
                    with open(meta_p) as f:
                        out[name] = json.load(f)
                except FileNotFoundError:
                    continue  # half-created fork — invisible until complete
        return out

    def create_branch(
        self,
        name: str,
        epoch: int | None = None,
        tag: str | None = None,
        as_of: float | None = None,
        description: str = "",
    ) -> dict:
        """Fork a ZERO-COPY branch at a snapshot (default: head). Returns
        the branch metadata. The branch is a fully standalone table (open
        it with ``branch(name)``, point a CdcEngine at its root): applies,
        MOR deltas, DVs, compaction, vacuum and time travel all work, and
        exactly-once carries over exactly as in ``clone_to`` — but no data
        is copied: the fork manifest reads the parent's files in place.

        Crash-safe: the pin tag lands first (idempotent), the branch's
        fork manifest lands LAST — a half-created branch has no manifest,
        is invisible to ``branches()``, and a re-run completes it."""
        self._check_branch_name(name)
        m = self._resolve_snapshot(epoch, tag, as_of)
        if m is None:
            raise RuntimeError("bootstrap the table before branching")
        snap_epoch = int(m["epoch"])
        broot = self._branch_root(name)
        fork_manifest_p = os.path.join(
            broot, MANIFEST_DIR, f"epoch-{snap_epoch:010d}.json"
        )
        existing = self.branches().get(name)
        if existing is not None:
            if int(existing["fork_epoch"]) != snap_epoch:
                raise ConflictError(
                    f"branch {name!r} already exists (forked at epoch "
                    f"{existing['fork_epoch']}) — drop_branch() it first"
                )
            if os.path.exists(fork_manifest_p):
                return existing  # idempotent re-create at the same snapshot
            # else: a crashed half-fork at this snapshot — finish it below

        # 1) pin the fork epoch on the parent BEFORE any branch state
        # exists: from this point parent vacuum retains every file the
        # fork manifest references. create_tag is idempotent for the same
        # (name, epoch); a stale pin from a crashed drop_branch (branch dir
        # gone, tag left behind) is re-pointed here.
        pin = f"branch:{name}"
        if existing is None and pin in self.tags() and int(
            self.tags()[pin]["epoch"]
        ) != snap_epoch:
            self.drop_tag(pin)
        self.create_tag(
            pin, epoch=snap_epoch, description=f"fork pin for branch {name!r}"
        )

        os.makedirs(os.path.join(broot, MANIFEST_DIR), exist_ok=True)
        os.makedirs(os.path.join(broot, DATA_DIR), exist_ok=True)

        # 2) exactly-once carry (same contract as clone_to)
        ledger, inv = self._fork_ledgers(snap_epoch)
        if ledger:
            self._fsync_json_at(
                os.path.join(broot, MANIFEST_DIR, "expired-batches.json"),
                {str(k): v for k, v in ledger.items()},
            )
        if inv:
            self._fsync_json_at(
                os.path.join(broot, MANIFEST_DIR, "invalidated-batches.json"),
                {str(k): v for k, v in inv.items()},
            )

        meta = {
            "name": name,
            "fork_epoch": snap_epoch,
            "created_unix": time.time(),
            "description": description,
        }
        self._fsync_json_at(os.path.join(broot, "branch.json"), meta)

        # 3) fork manifest LAST — the branch's commit point. Parent rels
        # become ../../-relative (branch root is two levels below root).
        fork = self._rewrite_manifest_rels(m, lambda r: PARENT_REF + r)
        self._fsync_json_at(fork_manifest_p, fork)
        return meta

    def branch(self, name: str) -> "SnapshotTable":
        """Open a branch as a standalone SnapshotTable."""
        self._check_branch_name(name)
        if name not in self.branches():
            raise KeyError(f"no branch {name!r}")
        return SnapshotTable(self.spark, self._branch_root(name))

    def drop_branch(self, name: str, force: bool = False) -> dict:
        """Delete a branch and its pin tag. Refuses (ConflictError) when
        the branch has unmerged commits beyond the fork unless ``force``—
        those commits' data lives only under the branch root and is gone
        with it (that is what force means)."""
        import shutil

        meta = self.branches().get(name)
        if meta is None:
            raise KeyError(f"no branch {name!r}")
        bt = self.branch(name)
        head = bt.latest_manifest()
        n_unmerged = sum(
            1 for mm in bt.manifests() if mm["epoch"] > int(meta["fork_epoch"])
        )
        if n_unmerged and not force:
            raise ConflictError(
                f"branch {name!r} has {n_unmerged} unmerged commit(s) beyond "
                f"fork epoch {meta['fork_epoch']} (head "
                f"{head['epoch'] if head else None}) — fast_forward() them "
                f"or drop_branch(force=True) to discard"
            )
        shutil.rmtree(self._branch_root(name))
        try:
            self.drop_tag(f"branch:{name}")
        except KeyError:
            pass  # pin already dropped (crashed prior drop) — idempotent
        return {"name": name, "discarded_commits": n_unmerged}

    # main commit kinds that preserve visible row state — a branch may be
    # fast-forwarded OVER them (the rebase re-anchors untouched buckets on
    # the maintained head): compaction rewrites files, never rows. Every
    # other foreign commit (applies, deletes, updates, DV erasures,
    # renames, rescales, rollbacks) changes state or layout contracts and
    # conflicts.
    _FF_PRESERVING_KINDS = frozenset({"compaction"})

    def fast_forward(self, name: str) -> dict:
        """Publish a branch's commits onto this table and remove the
        branch — Iceberg's ``fast_forward('main', branch)``. The table's
        post-fork history must be EMPTY or visible-state-preserving
        maintenance (compaction): branch epochs are renumbered onto the
        current head and REBASED — buckets a branch epoch touched take the
        branch's bases/deltas/DVs, untouched buckets keep the (possibly
        since-compacted) head's — so routine maintenance on a 10^10-row
        table never blocks merging an experiment. Any foreign
        state-changing commit after the fork is a ConflictError, resolved
        on the branch side (re-fork and re-apply, the rebase protocol).

        Crash-safe and idempotent: the whole chain is validated with ZERO
        mutation first; then per epoch, branch-local data dirs are MOVED
        into the parent under their assigned epoch number (atomic per-dir
        rename; dirs without a manifest are invisible orphans the sweep
        guard protects), and the manifest link is the commit point — each
        published manifest records ``metrics.fast_forward`` provenance, so
        a re-run after any crash skips the already-published prefix by
        provenance + digest and finishes the rest (resume BEFORE running
        further maintenance, so epoch assignment is stable)."""
        import re as _re
        import shutil

        meta = self.branches().get(name)
        if meta is None:
            raise KeyError(f"no branch {name!r}")
        bt = self.branch(name)
        if bt.staged_manifests():
            raise ConflictError(
                f"branch {name!r} has staged (unpublished) snapshots — "
                f"publish_staged() or abandon_staged() them first"
            )
        fork_epoch = int(meta["fork_epoch"])
        bms = bt.manifests()
        chain = sorted(
            (mm for mm in bms if mm["epoch"] > fork_epoch),
            key=lambda mm: mm["epoch"],
        )

        # ---- validate the fork point and classify post-fork table history
        main_ms = self.manifests()
        fork_here = next(
            (mm for mm in main_ms if mm["epoch"] == fork_epoch), None
        )
        bfork = next((mm for mm in bms if mm["epoch"] == fork_epoch), None)
        if (
            fork_here is None
            or bfork is None
            or fork_here.get("batch_digest") != bfork.get("batch_digest")
        ):
            raise ConflictError(
                f"fork epoch {fork_epoch} of branch {name!r} is no longer "
                f"this table's history (rolled back or vacuumed) — re-fork "
                f"and re-apply the branch work"
            )
        by_bepoch = {mm["epoch"]: mm for mm in chain}
        mapping: dict[int, int] = {}  # branch epoch -> published table epoch
        for mm in main_ms:
            if mm["epoch"] <= fork_epoch:
                continue
            prov = (mm.get("metrics") or {}).get("fast_forward")
            if prov and prov.get("branch") == name:
                src_mm = by_bepoch.get(int(prov["branch_epoch"]))
                if src_mm is None or src_mm.get("batch_digest") != mm.get(
                    "batch_digest"
                ):
                    raise ConflictError(
                        f"epoch {mm['epoch']} carries fast-forward "
                        f"provenance for branch {name!r} but does not match "
                        f"its chain — a different fork of the same name was "
                        f"merged here; re-fork under a new name"
                    )
                mapping[int(prov["branch_epoch"])] = mm["epoch"]
            elif (mm.get("metrics") or {}).get(
                "kind"
            ) in self._FF_PRESERVING_KINDS:
                continue  # compaction: rows identical, rebase re-anchors on it
            else:
                raise ConflictError(
                    f"table head {self.latest_manifest()['epoch']} is not on "
                    f"branch {name!r} (fork {fork_epoch}): epoch "
                    f"{mm['epoch']} "
                    f"({(mm.get('metrics') or {}).get('kind')}) changed "
                    f"state after the fork — the table advanced "
                    f"independently; re-fork and re-apply the branch work"
                )
        remaining = [mm for mm in chain if mm["epoch"] not in mapping]
        head = self.latest_manifest()
        head_epoch = head["epoch"]
        nxt = head_epoch + 1
        for mm in remaining:
            mapping[mm["epoch"]] = nxt
            nxt += 1

        ep_re = _re.compile(r"epoch=(\d+)")

        def pub_rel(rel: str) -> str:
            """Map a branch-manifest rel path into the table's namespace:
            parent refs drop their ../../; branch-written dirs move to
            their assigned epoch number."""
            if rel.startswith(PARENT_REF):
                return rel[len(PARENT_REF):]
            hit = ep_re.search(rel)
            if not hit or int(hit.group(1)) not in mapping:
                raise RuntimeError(
                    f"branch {name!r} references unmappable path {rel!r}"
                )
            k = int(hit.group(1))
            return f"{rel[:hit.start()]}epoch={mapping[k]}{rel[hit.end():]}"

        # ---- publish oldest-first, rebasing each epoch's maps onto the
        # running head maps (sequential overlay)
        published: list[int] = []
        base_nb = int(head["n_buckets"])
        base_buckets = dict(head["buckets"])
        base_counts = dict(head["bucket_counts"])
        base_deltas = dict(head.get("bucket_deltas") or {})
        base_dvs = dict(head.get("bucket_dvs") or {})
        prev_epoch = head_epoch
        for mm in remaining:
            # move this epoch's branch-local dirs into the table
            for rel in sorted(self._manifest_rels(mm)):
                if rel.startswith(PARENT_REF):
                    continue
                src = os.path.join(bt.root, rel)
                dst = os.path.join(self.root, pub_rel(rel))
                if os.path.isdir(src):
                    os.makedirs(os.path.dirname(dst), exist_ok=True)
                    if os.path.isdir(dst):
                        # orphan at the target (a crashed writer's
                        # pre-commit data) — the branch's dir is the one a
                        # manifest is about to reference
                        shutil.rmtree(dst)
                    os.rename(src, dst)
                elif not os.path.isdir(dst):
                    raise RuntimeError(
                        f"branch {name!r} epoch {mm['epoch']} references "
                        f"{rel} which exists on neither side — branch "
                        f"storage is corrupt"
                    )

            full_replace = (mm.get("metrics") or {}).get("kind") == (
                "rescale"
            ) or int(mm["n_buckets"]) != base_nb
            if full_replace:
                # rescale (or anything that re-cut the bucket space) wrote
                # COMPLETE maps in its own numbering — they replace, never
                # overlay
                nb = {
                    b: (pub_rel(d) if d else d)
                    for b, d in mm["buckets"].items()
                }
                ncounts = dict(mm["bucket_counts"])
                ndeltas = {
                    b: [pub_rel(x) for x in ch]
                    for b, ch in (mm.get("bucket_deltas") or {}).items()
                }
                ndvs = {
                    b: pub_rel(d)
                    for b, d in (mm.get("bucket_dvs") or {}).items()
                }
            else:
                nb = dict(base_buckets)
                ncounts = dict(base_counts)
                ndeltas = dict(base_deltas)
                ndvs = dict(base_dvs)
                for b in mm["touched_buckets"]:
                    sb = str(b)
                    d = mm["buckets"].get(sb)
                    nb[sb] = pub_rel(d) if d else d
                    ncounts[sb] = mm["bucket_counts"].get(sb, 0)
                    ch = (mm.get("bucket_deltas") or {}).get(sb)
                    if ch:
                        ndeltas[sb] = [pub_rel(x) for x in ch]
                    else:
                        ndeltas.pop(sb, None)
                    dv = (mm.get("bucket_dvs") or {}).get(sb)
                    if dv:
                        ndvs[sb] = pub_rel(dv)
                    else:
                        ndvs.pop(sb, None)

            pub = dict(mm)
            pub["epoch"] = mapping[mm["epoch"]]
            pub["parent"] = prev_epoch
            pub["buckets"] = nb
            pub["bucket_counts"] = ncounts
            pub["bucket_deltas"] = ndeltas
            pub["bucket_dvs"] = ndvs
            pub["total_rows"] = sum(ncounts.values())
            if mm.get("dv_changes"):
                pub["dv_changes"] = pub_rel(mm["dv_changes"])
            if mm.get("quarantine_path"):
                pub["quarantine_path"] = pub_rel(mm["quarantine_path"])
            pub["metrics"] = {
                **(mm.get("metrics") or {}),
                "fast_forward": {
                    "branch": name,
                    "branch_epoch": mm["epoch"],
                    "fork_epoch": fork_epoch,
                },
            }
            pub["committed_unix"] = time.time()

            p = self._manifest_path(pub["epoch"])
            ex = self._link_manifest(p, pub)
            if ex is not None:
                if ex.get("batch_digest") != pub.get("batch_digest"):
                    raise ConflictError(
                        f"epoch {pub['epoch']} was committed concurrently "
                        f"with a different digest during fast-forward"
                    )
            else:
                self._manifest_cache[os.path.basename(p)] = pub
                self._latest_cache = pub
                self._latest_token = None
                self._log_commit_metrics(pub)
            published.append(pub["epoch"])
            prev_epoch = pub["epoch"]
            base_nb = int(pub["n_buckets"])
            base_buckets, base_counts = nb, ncounts
            base_deltas, base_dvs = ndeltas, ndvs

        # ---- merge post-fork exactly-once state the branch accrued
        # (branch-side vacuum/rollback while diverged); fork-carried
        # entries (epoch <= fork) are already the parent's own history
        inv = {
            b: e
            for b, e in bt._invalidated_batches().items()
            if e > fork_epoch
        }
        if inv:
            self._merge_invalidated(inv)
        b_expired = {
            bid: rec
            for bid, rec in bt._expired_batches().items()
            if (rec.get("epoch") or -1) > fork_epoch
        }
        if b_expired:
            cur = self._expired_batches()
            for bid, rec in b_expired.items():
                cur.setdefault(int(bid), rec)
            self._fsync_json_at(
                self._expired_path(), {str(k): v for k, v in cur.items()}
            )
            self._expired_cache = None
            self._expired_token = None

        # ---- the branch is merged: remove it and its pin
        shutil.rmtree(self._branch_root(name))
        try:
            self.drop_tag(f"branch:{name}")
        except KeyError:
            pass
        return {
            "name": name,
            "fork_epoch": fork_epoch,
            "published_epochs": published,
            "new_head": published[-1] if published else head_epoch,
        }

    # ---------------------------------------------------------------- vacuum
    def vacuum(
        self,
        keep_last: int = 2,
        older_than_s: float | None = None,
        dry_run: bool = False,
    ) -> dict:
        """Expire all but the last ``keep_last`` snapshots: delete manifests
        older than the retained set and every data/quarantine directory no
        retained manifest references (the Iceberg expire_snapshots +
        remove_orphan_files maintenance pair — without it a CDC table's COW
        epochs accumulate forever).

        ``older_than_s`` adds an AGE floor (Delta ``VACUUM … RETAIN N
        HOURS``): a snapshot committed within the last ``older_than_s``
        seconds is retained even when ``keep_last`` would expire it — the
        guard that keeps a long-running reader's snapshot alive while
        routine maintenance runs. ``dry_run=True`` (Delta ``VACUUM … DRY
        RUN``) computes and returns the full report — expirable manifests,
        sweepable dirs, reclaimable bytes — WITHOUT deleting anything or
        touching the ledgers.

        Exactly-once is preserved across expiry: the (batch_id, digest)
        pairs of expired manifests move into an fsync'd ledger consulted by
        ``committed_batches``, so re-delivering an ancient batch is still a
        verified no-op (or ConflictError), never a silent re-apply. Time
        travel to expired epochs is gone — that's what expiry means.

        Concurrency: the table is SINGLE-WRITER (one engine applies batches;
        the reference's pipeline is likewise a single sequential process,
        georef_ar_etl/process.py:206-257). As defense in depth the orphan
        sweep additionally skips epoch dirs NEWER than the latest retained
        manifest — data a concurrent (or crashed-and-restarting) writer may
        be staging for its not-yet-committed epoch is never swept; only a
        later vacuum, run after that epoch either commits or is superseded,
        may remove it.
        """
        import shutil

        if keep_last < 1:
            raise ValueError("keep_last must be >= 1")
        ms = self.manifests()
        # tagged epochs are PINNED (Iceberg ref retention): their manifests
        # and every file they reference survive until the tag is dropped
        tag_epochs = {int(v["epoch"]) for v in self.tags().values()}
        recent = {m["epoch"] for m in ms[-keep_last:]}
        if older_than_s is not None:
            cutoff = time.time() - older_than_s
            recent |= {
                m["epoch"]
                for m in ms
                if m.get("committed_unix", float("inf")) > cutoff
            }
        retained = [m for m in ms if m["epoch"] in recent or m["epoch"] in tag_epochs]
        expired = [m for m in ms if m["epoch"] not in recent and m["epoch"] not in tag_epochs]

        if dry_run:
            retained_set = retained
            referenced = self._referenced_dirs(retained_set)
            max_retained_epoch = retained_set[-1]["epoch"]
            would_dirs, would_bytes = self._sweepable_dirs(
                referenced, max_retained_epoch
            )
            return {
                "dry_run": True,
                "removed_manifests": [m["epoch"] for m in expired],
                "removed_dirs": would_dirs,
                "freed_bytes": would_bytes,
                "retained_epochs": [m["epoch"] for m in retained_set],
            }

        # 1. record expired batch ids BEFORE removing anything. Stubs are
        # manifest-SHAPED (metrics/total_rows/buckets keys present) so an
        # expired-redelivery return from apply_batch doesn't KeyError
        # callers that inspect the usual manifest fields.
        ledger = self._expired_batches()
        for m in expired:
            if m["batch_id"] is not None:
                ledger[int(m["batch_id"])] = {
                    "batch_id": m["batch_id"],
                    "batch_digest": m["batch_digest"],
                    "epoch": m["epoch"],
                    "expired": True,
                    "metrics": {"kind": "expired_redelivery"},
                    "total_rows": None,
                    "buckets": None,
                    "quarantine_rows": 0,
                }
        tmp = self._expired_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump({str(k): v for k, v in ledger.items()}, f, sort_keys=True)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self._expired_path())
        self._expired_cache = ledger
        self._expired_token = os.stat(self._expired_path()).st_mtime_ns

        # 1b. expiring a ROLLBACK manifest must not lose its batch
        # invalidations (committed_batches reads them from retained
        # manifests) — move them into the durable invalidated ledger first
        inv_merge: dict[int, int] = {}
        for m in expired:
            for bid in (m.get("metrics") or {}).get("rolled_back_batch_ids", []):
                inv_merge[int(bid)] = max(inv_merge.get(int(bid), -1), m["epoch"])
        if inv_merge:
            self._merge_invalidated(inv_merge)

        # 2. drop the expired MANIFESTS before touching any data: the
        # table's crash invariant is "a data dir without a manifest is
        # invisible and harmless" — deleting data first would let a crash
        # leave a still-visible manifest referencing deleted files
        removed_manifests = []
        for m in expired:
            p = self._manifest_path(m["epoch"])
            if os.path.exists(p):
                os.remove(p)
            self._manifest_cache.pop(os.path.basename(p), None)
            removed_manifests.append(m["epoch"])

        # 3. delete unreferenced data/quarantine dirs (orphans included)
        referenced = self._referenced_dirs(retained)
        max_retained_epoch = retained[-1]["epoch"]
        removed_dirs, freed = self._sweepable_dirs(
            referenced, max_retained_epoch
        )
        for rel in removed_dirs:
            shutil.rmtree(os.path.join(self.root, rel))
        # drop epoch dirs with nothing referenced left, whole (sweeps
        # writer markers along)
        data_root = os.path.join(self.root, DATA_DIR)
        for edir in sorted(os.listdir(data_root)):
            efull = os.path.join(data_root, edir)
            if not os.path.isdir(efull):
                continue
            try:
                if int(edir.split("=", 1)[1]) > max_retained_epoch:
                    continue
            except (IndexError, ValueError):
                continue
            prefix = os.path.join(DATA_DIR, edir) + os.sep
            if not any(r.startswith(prefix) for r in referenced):
                shutil.rmtree(efull, ignore_errors=True)

        return {
            "removed_manifests": removed_manifests,
            "removed_dirs": removed_dirs,
            "freed_bytes": freed,
            "retained_epochs": [m["epoch"] for m in retained],
        }

    def _referenced_dirs(self, retained: list[dict]) -> set[str]:
        """Every data/quarantine dir some retained manifest references —
        bases, MOR delta chains, DV dirs, dv-change artifacts, quarantine."""
        referenced = {
            d for m in retained for d in m["buckets"].values() if d is not None
        }
        referenced |= {
            d
            for m in retained
            for chain in (m.get("bucket_deltas") or {}).values()
            for d in chain
        }
        referenced |= {
            m["quarantine_path"] for m in retained if m.get("quarantine_path")
        }
        # deletion-vector dirs + per-epoch dv-change artifacts share the
        # data-dir lifecycle (sinks/deletion_vectors.py)
        referenced |= {
            d
            for m in retained
            for d in (m.get("bucket_dvs") or {}).values()
        }
        referenced |= {
            m["dv_changes"] for m in retained if m.get("dv_changes")
        }
        return referenced

    def _sweepable_dirs(
        self, referenced: set[str], max_retained_epoch: int
    ) -> tuple[list[str], int]:
        """Unreferenced data/quarantine dirs eligible for the orphan sweep
        and their total bytes — the shared planner behind vacuum and its
        dry run (computes, never deletes). Epoch dirs newer than the latest
        retained manifest are never eligible: that is pre-commit data an
        in-flight writer may be staging."""
        removed_dirs: list[str] = []
        freed = 0
        data_root = os.path.join(self.root, DATA_DIR)
        for edir in sorted(os.listdir(data_root)):
            efull = os.path.join(data_root, edir)
            if not os.path.isdir(efull):
                continue
            try:
                if int(edir.split("=", 1)[1]) > max_retained_epoch:
                    continue
            except (IndexError, ValueError):
                continue
            for bdir in sorted(os.listdir(efull)):
                rel = os.path.join(DATA_DIR, edir, bdir)
                full = os.path.join(self.root, rel)
                # skip writer marker files (_SUCCESS) and anything that isn't
                # a bucket base or delta dir
                if not os.path.isdir(full) or not bdir.startswith(
                    ("bucket=", "delta=", "dv=", "dv_changes")
                ):
                    continue
                if rel not in referenced:
                    freed += sum(
                        os.path.getsize(os.path.join(dp, fn))
                        for dp, _d, fns in os.walk(full) for fn in fns
                    )
                    removed_dirs.append(rel)
        qroot = os.path.join(self.root, QUARANTINE_DIR)
        if os.path.isdir(qroot):
            for edir in sorted(os.listdir(qroot)):
                rel = os.path.join(QUARANTINE_DIR, edir)
                if rel not in referenced:
                    freed += sum(
                        os.path.getsize(os.path.join(dp, fn))
                        for dp, _d, fns in os.walk(os.path.join(self.root, rel))
                        for fn in fns
                    )
                    removed_dirs.append(rel)
        return removed_dirs, freed

    # --------------------------------------------------------------- compact
    def compact(
        self,
        min_deltas: int = 1,
        buckets: list[int] | None = None,
        cluster_by: list[str] | None = None,
        rows_per_file: int | None = None,
        max_commit_retries: int = 0,
        bloom_cols: list[str] | None = None,
    ) -> dict | None:
        """Rewrite every bucket carrying >= ``min_deltas`` pending
        merge-on-read deltas into fresh base files and commit the result as a
        new epoch — Iceberg's ``rewrite_data_files`` for MOR tables, and the
        natural companion to ``vacuum`` (compaction un-references old delta
        dirs; vacuum then reclaims them once their manifests expire).

        ``cluster_by`` (+ ``rows_per_file``) is the OPTIMIZE-clustering
        variant: rewritten buckets sort by those columns and split into
        value-contiguous files, giving the per-file zone maps disjoint
        bounds so ``read_state(where=...)`` prunes FILES inside kept
        buckets, not just whole dirs (compose with ``functions.layout.
        zorder_key`` for multi-column locality: cluster_by=["zkey"]).
        With cluster_by set, min_deltas=0 additionally rewrites CLEAN
        buckets — re-clustering is useful work even without pending deltas.

        ``bloom_cols`` enables per-column Bloom-filter skipping (sinks/
        zonemap.py column blooms) for EQUALITY predicates on the listed
        columns — the Delta/Parquet bloom-index move for high-cardinality
        UNCLUSTERED columns where min/max bounds prune nothing. The list
        persists in the manifest (like colmap), so every later write —
        merge rewrites, MOR deltas, row-op deltas, rescale, the next
        compaction — maintains the blooms without re-passing it; pass
        ``[]`` to disable. Pre-bloom dirs simply never skip, so enabling
        is always safe.

        The rewrite reads through the MOR-resolving ``read_state`` so the
        visible state is unchanged by construction. Returns the committed
        manifest, or None when no bucket qualifies. Commit is the usual
        atomic manifest rename (batch_id None, kind "compaction"); a crash
        mid-compaction leaves an invisible orphan epoch dir.
        """
        m = self.latest_manifest()
        if m is None:
            return None
        if cluster_by:
            # callers name cluster columns logically; the rewrite sorts the
            # physical frame
            cm = self.colmap(m)
            cluster_by = [cm.get(c, c) for c in cluster_by]
        # an EXPLICIT non-empty bloom_cols is an indexing request: with
        # min_deltas=0 it rewrites clean buckets too (like re-clustering),
        # so enabling blooms on a quiet table is one compact() call.
        # Inherited blooms don't widen the rewrite set — routine compaction
        # maintains them on whatever it rewrites anyway.
        explicit_index = bool(bloom_cols)
        if bloom_cols is not None:
            # caller names bloom columns logically too; the manifest (and
            # the sidecars) speak physical names
            cm = self.colmap(m)
            bloom_cols = [cm.get(c, c) for c in bloom_cols]
        else:
            bloom_cols = m.get("bloom_cols")  # inherit the table's setting
        deltas_map = m.get("bucket_deltas") or {}
        dvs_map = m.get("bucket_dvs") or {}
        if (cluster_by or explicit_index) and min_deltas == 0:
            dirty = sorted(
                int(b)
                for b in m["buckets"]
                if buckets is None or int(b) in set(buckets)
            )
        else:
            # a deletion vector counts as one pending chain link: compaction
            # is what retires it (the rewrite materializes live rows only,
            # and write_manifest drops the spent DV)
            dirty = sorted(
                b
                for b in {
                    *(int(k) for k in deltas_map),
                    *(int(k) for k in dvs_map),
                }
                if len(deltas_map.get(str(b)) or [])
                + (1 if dvs_map.get(str(b)) else 0)
                >= max(min_deltas, 1)
                and (buckets is None or b in set(buckets))
            )
        if not dirty:
            return None
        schema = T.StructType.fromJson(m["schema"])
        epoch = m["epoch"] + 1
        t0 = time.time()
        written = self.write_data(
            epoch,
            self.read_state(buckets=dirty, manifest=m, physical=True),
            cluster_by=cluster_by,
            rows_per_file=rows_per_file,
            only_buckets=dirty,
            bloom_cols=bloom_cols,
        )
        return self.write_manifest(
            epoch=epoch,
            schema=schema,
            written=written,
            touched_buckets=dirty,
            batch_id=None,
            batch_digest=f"compact:{m['epoch']}:{dirty}",
            metrics={
                "kind": "compaction",
                "compacted_buckets": dirty,
                "wall_sec": round(time.time() - t0, 3),
            },
            max_commit_retries=max_commit_retries,
            bloom_cols=bloom_cols,
        )

    # --------------------------------------------------------------- rescale
    def rescale(self, new_n_buckets: int) -> dict:
        """Partition-spec evolution (Iceberg ``bucket(doc_id, N)`` →
        ``bucket(doc_id, M)``): rewrite the whole table under a new bucket
        count and commit it as one epoch. The operational answer to "the
        table grew 100x and the bucket count no longer fits" — buckets
        whose per-task working set outgrows executor memory get split
        without any change to query or merge code, because everything
        downstream (merges, pruned reads, MOR chains, the changelog) reads
        the bucket count from the manifest, which this commit flips
        atomically: readers and resumed writers see either the old layout
        whole or the new layout whole.

        Full-table rewrite by design (same as Iceberg's
        rewrite_data_files after a spec change): rows move between buckets,
        so there is nothing incremental to reuse. Visible state is
        unchanged by construction (reads through the MOR-resolving
        ``read_state``); pending delta chains resolve into the new bases.
        """
        m = self.latest_manifest()
        if m is None:
            raise ValueError("cannot rescale an empty table — bootstrap first")
        if new_n_buckets == int(m["n_buckets"]) or new_n_buckets < 1:
            raise ValueError(
                f"new bucket count {new_n_buckets} must be >= 1 and differ "
                f"from the current {m['n_buckets']}"
            )
        schema = T.StructType.fromJson(m["schema"])
        epoch = m["epoch"] + 1
        t0 = time.time()
        df = (
            self.read_state(manifest=m, physical=True)
            .drop("bucket")
            .withColumn("bucket", bucket_expr(F.col("doc_id"), new_n_buckets))
        )
        written = self.write_data(
            epoch, df, n_buckets=new_n_buckets, bloom_cols=m.get("bloom_cols")
        )
        return self.write_manifest(
            epoch=epoch,
            schema=schema,
            written=written,
            touched_buckets=list(range(new_n_buckets)),
            batch_id=None,
            batch_digest=f"rescale:{m['epoch']}:{m['n_buckets']}->{new_n_buckets}",
            metrics={
                "kind": "rescale",
                "from_n_buckets": int(m["n_buckets"]),
                "to_n_buckets": new_n_buckets,
                "wall_sec": round(time.time() - t0, 3),
            },
            rescale_to=new_n_buckets,
        )

    # ------------------------------------------------------ deletion vectors
    def delete_keys_dv(
        self, keys: list, batch_id: int, max_commit_retries: int = 0
    ) -> dict:
        """Delete-only maintenance commit via **positional deletion vectors**
        (sinks/deletion_vectors.py) — the Iceberg-v3 / Delta DV move for
        erasure lists, moderation take-downs and retention sweeps: instead
        of equality tombstones that push every later read of the bucket
        onto the per-bucket pandas resolve, record the deleted rows'
        (file, position) and let readers mask them on the NATIVE vectorized
        scan (broadcast anti-join — ``_read_dv_masked``).

        Key routing (per bucket, decided driver-side from bloom sidecars):

        * buckets whose pending delta chain provably does NOT mention any of
          the bucket's delete keys (or that have no chain) take the DV path —
          the key's live version, if any, is in the base, so a positional
          mask is exact;
        * buckets where any key MIGHT live in the chain fall back to one
          equality-tombstone delta link (correct under any chain content) —
          mixing both paths in one bucket is deliberately avoided so the
          changelog emits each deleted key exactly once (dvdel artifact vs
          delta link).

        Deleting an absent (or already-deleted) key is a counted no-op.
        Exactly-once: ``batch_id`` + a keys digest, same redelivery contract
        as ``apply_batch``. The commit runs ONE position-scan job over the
        touched buckets' bases reading only the key column (plus the
        metadata columns), one DV write, and one tiny tombstone task per
        fallback bucket. Cost is O(touched buckets' key columns), never
        O(table).

        The reference has no surgical delete — it drops and re-derives whole
        tables per run (georef_ar_etl/transformers.py:67-151)."""
        import hashlib

        from georef_ar_etl_spark.sinks.mor import (
            read_bloom_sidecar,
            sidecar_might_contain,
        )

        m = self.latest_manifest()
        if m is None:
            raise RuntimeError("bootstrap the table before deleting keys")
        keys = list(dict.fromkeys(keys))
        digest = (
            "dvdel:"
            + hashlib.md5(
                "\x00".join(sorted(str(k) for k in keys)).encode()
            ).hexdigest()
            + f":{len(keys)}"
        )
        committed = self.committed_batches()
        if batch_id in committed:
            if committed[batch_id]["batch_digest"] != digest:
                raise ConflictError(
                    f"batch {batch_id} re-delivered with different content"
                )
            return committed[batch_id]
        schema = T.StructType.fromJson(m["schema"])
        key_col = schema.fields[0].name
        key_type = schema.fields[0].dataType
        nb = int(m["n_buckets"])
        t0 = time.time()
        if not keys:
            return self.write_manifest(
                epoch=m["epoch"] + 1, schema=schema, written={},
                touched_buckets=[], batch_id=batch_id, batch_digest=digest,
                metrics={"kind": "dv_delete", "deleted": 0, "delete_noop": 0},
            )

        # key → bucket (one metadata-sized job: the bucket hash is Spark's
        # xxhash64, no driver-side Python twin — same move as lookup_keys)
        kdf = self.spark.createDataFrame(
            [(k,) for k in keys],
            T.StructType([T.StructField("k", key_type, False)]),
        )
        by_bucket: dict[int, list] = {}
        for r in kdf.select("k", bucket_expr(F.col("k"), nb).alias("b")).collect():
            by_bucket.setdefault(int(r["b"]), []).append(r["k"])

        deltas_map = m.get("bucket_deltas") or {}
        dvs_map = m.get("bucket_dvs") or {}
        dv_buckets: dict[int, list] = {}
        tomb_buckets: dict[int, list] = {}
        for b, bkeys in sorted(by_bucket.items()):
            if m["buckets"].get(str(b)) is None and not deltas_map.get(str(b)):
                # empty bucket: every key is a no-op — no artifact at all
                dv_buckets[b] = bkeys  # flows through as zero position hits
                continue
            risk = False
            for dd in deltas_map.get(str(b)) or []:
                sc = read_bloom_sidecar(os.path.join(self.root, dd))
                if sc is None or any(
                    sidecar_might_contain(sc, str(k)) for k in bkeys
                ):
                    risk = True
                    break
            (tomb_buckets if risk else dv_buckets)[b] = bkeys

        epoch = m["epoch"] + 1
        epoch_dir = self.epoch_dir(epoch)
        written_dvs: dict[int, str] = {}
        dv_changes_rel: str | None = None
        eff_deleted: dict[int, int] = {}

        # ---- DV path: one position scan over the dv buckets' bases
        dv_keys_flat = [k for ks in dv_buckets.values() for k in ks]
        dv_base_files = [
            f
            for b in dv_buckets
            if m["buckets"].get(str(b))
            for f in self._dir_files(m["buckets"][str(b)])
        ]
        n_new_positions = 0
        if dv_base_files and dv_keys_flat:
            scan = (
                self.spark.read.option(
                    "basePath", os.path.join(self.root, DATA_DIR)
                )
                .schema(
                    T.StructType([schema.fields[0]])
                    .add("epoch", T.IntegerType())
                    .add("bucket", T.IntegerType())
                )
                .parquet(*dv_base_files)
                .select(
                    "bucket",
                    F.col("_metadata.file_name").alias("file"),
                    F.col("_metadata.row_index").alias("pos"),
                    F.col(key_col),
                )
            )
            if len(dv_keys_flat) <= 1024:
                # small list: isin reaches the parquet scan as a pushed
                # filter (row-group pruning on the sort-by-key layout)
                scan = scan.filter(F.col(key_col).isin(dv_keys_flat))
            else:
                # big erasure list: a 100k-term In expression would bloat
                # the plan — broadcast semi-join instead (the keys side is
                # the small side by the erasure-list contract)
                keys_df = self.spark.createDataFrame(
                    [(k,) for k in dv_keys_flat],
                    T.StructType([T.StructField(key_col, key_type, False)]),
                )
                scan = scan.join(F.broadcast(keys_df), key_col, "left_semi")
            old_dv_dirs = [
                os.path.join(self.root, dvs_map[str(b)])
                for b in dv_buckets
                if dvs_map.get(str(b))
            ]
            if old_dv_dirs:
                old_dv = (
                    self.spark.read.schema("bucket int, file string, pos long")
                    .parquet(*old_dv_dirs)
                    .select("bucket", "file", "pos")
                )
                # re-deleting an already-masked key is a no-op, not a
                # duplicate DV row
                hits = scan.join(
                    F.broadcast(old_dv), ["bucket", "file", "pos"], "left_anti"
                )
            else:
                old_dv = None
                hits = scan
            hits = hits.persist()
            try:
                per_bucket = {
                    int(r["bucket"]): int(r["n"])
                    for r in hits.groupBy("bucket").agg(
                        F.count(F.lit(1)).alias("n")
                    ).collect()
                }
                n_new_positions = sum(per_bucket.values())
                if n_new_positions:
                    changed = sorted(per_bucket)
                    merged = hits.select("bucket", "file", "pos")
                    if old_dv is not None:
                        merged = merged.unionByName(
                            old_dv.filter(F.col("bucket").isin(changed))
                        )
                    (
                        merged.withColumn("dv", F.col("bucket"))
                        .repartition(len(changed), "dv")
                        .sortWithinPartitions("dv", "file", "pos")
                        .write.mode("append")
                        .partitionBy("dv")
                        .parquet(epoch_dir)
                    )
                    for b in changed:
                        written_dvs[b] = os.path.join(
                            DATA_DIR, f"epoch={epoch}", f"dv={b}"
                        )
                        eff_deleted[b] = per_bucket[b]
                    # changelog artifact: the effective DV-deleted keys.
                    # batch_id-suffixed so a concurrent commit sharing this
                    # epoch dir (optimistic rebase) can never clobber it
                    dvc_name = f"dv_changes-{batch_id}"
                    dvc = os.path.join(epoch_dir, dvc_name)
                    hits.select("bucket", key_col).write.mode(
                        "overwrite"
                    ).parquet(dvc)
                    dv_changes_rel = os.path.join(
                        DATA_DIR, f"epoch={epoch}", dvc_name
                    )
            finally:
                hits.unpersist()

        # ---- fallback path: one equality-tombstone delta link per bucket
        # whose chain might mention a delete key
        written_deltas: dict[int, list[str]] = {}
        tomb_deleted: dict[int, int] = {}
        if tomb_buckets:
            tomb_deleted = self._write_tombstone_links(
                tomb_buckets, m, schema, epoch, written_deltas
            )
            eff_deleted.update(tomb_deleted)

        # carry every touched bucket's base and (unchanged) chain; a DV
        # commit never rewrites a base
        touched = sorted(set(dv_buckets) | set(tomb_buckets))
        written = {
            b: m["buckets"].get(str(b))
            for b in touched
        }
        for b in touched:
            if b not in written_deltas and deltas_map.get(str(b)):
                written_deltas[b] = list(deltas_map[str(b)])
        written_counts = {
            b: int(m["bucket_counts"].get(str(b), 0)) - eff_deleted.get(b, 0)
            for b in touched
        }
        deleted_total = sum(eff_deleted.values())
        return self.write_manifest(
            epoch=epoch,
            schema=schema,
            written=written,
            touched_buckets=touched,
            batch_id=batch_id,
            batch_digest=digest,
            metrics={
                "kind": "dv_delete",
                "keys_in": len(keys),
                "deleted": deleted_total,
                "delete_noop": len(keys) - deleted_total,
                "dv_positions_added": n_new_positions,
                "dv_buckets": sorted(written_dvs),
                "tombstone_buckets": sorted(tomb_buckets),
                "wall_sec": round(time.time() - t0, 3),
            },
            written_counts=written_counts,
            written_deltas=written_deltas,
            written_dvs=written_dvs,
            dv_changes=dv_changes_rel,
            max_commit_retries=max_commit_retries,
        )

    def delete_where(
        self,
        where: list,
        batch_id: int,
        stage: bool = False,
        max_commit_retries: int = 0,
    ) -> dict:
        """Predicate delete (``DELETE FROM t WHERE …``, the retention-sweep
        primitive: "drop everything where source='spam'"). ``where`` is the
        same ``[(col, op, literal), …]`` conjunction ``read_state`` plans
        with. Composes the table's two delete machineries:

        * **chain-free buckets**: one position scan of the candidate bases
          — zone-map sidecars prune dirs AND files whose bounds can't match
          before the job launches, the residual predicate pushes into the
          parquet scan — and the matching rows' positions land as merged
          deletion vectors (sinks/deletion_vectors.py);
        * **chain-carrying buckets**: the predicate-matching LIVE rows come
          from the DV/chain-aware ``read_state(where=…)`` and are
          tombstoned distributively, one equality-delete link per bucket —
          no driver-side key collection, so a predicate matching millions
          of rows stays a cluster-side plan.

        Exactly-once via ``batch_id`` + a digest of the predicate;
        re-delivery is a verified no-op. Matching nothing commits a no-op
        epoch. Changelog consumers receive every effectively deleted key
        exactly once (dvdel artifact for DV buckets, delta links for
        chain buckets). Logical delete — bytes remain until
        compact+vacuum."""
        import hashlib

        validate_where(where)
        m = self.latest_manifest()
        if m is None:
            raise RuntimeError("bootstrap the table before deleting rows")
        canon_where = json.dumps(
            [[c, o, v] for c, o, v in where], sort_keys=True, default=str
        )
        digest = (
            "dvwhere:"
            + hashlib.md5(canon_where.encode()).hexdigest()
        )
        committed = self.committed_batches()
        if batch_id in committed:
            if committed[batch_id]["batch_digest"] != digest:
                raise ConflictError(
                    f"batch {batch_id} re-delivered with different content"
                )
            return committed[batch_id]
        schema = T.StructType.fromJson(m["schema"])
        key_col = schema.fields[0].name
        deltas_map = m.get("bucket_deltas") or {}
        dvs_map = m.get("bucket_dvs") or {}
        t0 = time.time()
        epoch = m["epoch"] + 1
        epoch_dir = self.epoch_dir(epoch)
        # the digest above hashes the LOGICAL predicate (what redelivery
        # sends); files/zone maps speak physical — map exactly once here
        where = self._where_physical(where, m)

        # plan: classify candidate buckets, zone-map-pruning chain-free
        # dirs exactly like read_state(where=)
        dv_files: list[str] = []   # chain-free candidate base files
        dv_bucket_ids: list[int] = []
        chain_buckets: list[int] = []
        zstats = {"dirs_skipped": 0, "files_skipped": 0}
        for b_str, d in m["buckets"].items():
            dl = deltas_map.get(b_str) or []
            if dl:
                chain_buckets.append(int(b_str))  # resolve-side path
                continue
            if d is None:
                continue
            zm = read_zonemap(os.path.join(self.root, d))
            if zone_excludes(zm, where):
                zstats["dirs_skipped"] += 1
                continue
            files = self._dir_files(d)
            fmaps = (zm or {}).get("files") or {}
            kept = []
            for f in files:
                fzm = fmaps.get(os.path.basename(f))
                if fzm is not None and zone_excludes(fzm, where):
                    zstats["files_skipped"] += 1
                else:
                    kept.append(f)
            if kept:
                dv_files.extend(kept)
                dv_bucket_ids.append(int(b_str))

        written_dvs: dict[int, str] = {}
        dv_changes_rel: str | None = None
        eff_deleted: dict[int, int] = {}
        n_new_positions = 0
        if dv_files:
            scan = (
                self.spark.read.option(
                    "basePath", os.path.join(self.root, DATA_DIR)
                )
                .schema(
                    T.StructType(list(schema.fields))
                    .add("epoch", T.IntegerType())
                    .add("bucket", T.IntegerType())
                )
                .parquet(*dv_files)
                .select(
                    "bucket",
                    F.col("_metadata.file_name").alias("file"),
                    F.col("_metadata.row_index").alias("pos"),
                    F.col(key_col),
                    *[
                        F.col(c)
                        for c in {c for c, _o, _v in where}
                        if c != key_col
                    ],
                )
                .filter(residual_filter(where))
                .select("bucket", "file", "pos", key_col)
            )
            old_dv_dirs = [
                os.path.join(self.root, dvs_map[str(b)])
                for b in dv_bucket_ids
                if dvs_map.get(str(b))
            ]
            old_dv = None
            if old_dv_dirs:
                old_dv = (
                    self.spark.read.schema("bucket int, file string, pos long")
                    .parquet(*old_dv_dirs)
                    .select("bucket", "file", "pos")
                )
                scan = scan.join(
                    F.broadcast(old_dv), ["bucket", "file", "pos"], "left_anti"
                )
            hits = scan.persist()
            try:
                per_bucket = {
                    int(r["bucket"]): int(r["n"])
                    for r in hits.groupBy("bucket").agg(
                        F.count(F.lit(1)).alias("n")
                    ).collect()
                }
                n_new_positions = sum(per_bucket.values())
                if n_new_positions:
                    changed = sorted(per_bucket)
                    merged = hits.select("bucket", "file", "pos")
                    if old_dv is not None:
                        merged = merged.unionByName(
                            old_dv.filter(F.col("bucket").isin(changed))
                        )
                    (
                        merged.withColumn("dv", F.col("bucket"))
                        .repartition(len(changed), "dv")
                        .sortWithinPartitions("dv", "file", "pos")
                        .write.mode("append")
                        .partitionBy("dv")
                        .parquet(epoch_dir)
                    )
                    for b in changed:
                        written_dvs[b] = os.path.join(
                            DATA_DIR, f"epoch={epoch}", f"dv={b}"
                        )
                        eff_deleted[b] = per_bucket[b]
                    dvc_name = f"dv_changes-{batch_id}"
                    hits.select("bucket", key_col).write.mode(
                        "overwrite"
                    ).parquet(os.path.join(epoch_dir, dvc_name))
                    dv_changes_rel = os.path.join(
                        DATA_DIR, f"epoch={epoch}", dvc_name
                    )
            finally:
                hits.unpersist()

        # chain buckets: matching LIVE rows via the DV/chain-aware filtered
        # read, tombstoned distributively (one link per bucket)
        written_deltas: dict[int, list[str]] = {}
        if chain_buckets:
            matching = self.read_state(
                buckets=chain_buckets, manifest=m, where=where, physical=True
            ).select(key_col, "bucket")
            tomb_counts = self._write_tombstone_links_distributed(
                matching, m, schema, epoch, written_deltas
            )
            eff_deleted.update(
                {b: eff_deleted.get(b, 0) + n for b, n in tomb_counts.items()}
            )

        touched = sorted(set(written_dvs) | set(written_deltas))
        written = {b: m["buckets"].get(str(b)) for b in touched}
        for b in touched:
            if b not in written_deltas and deltas_map.get(str(b)):
                written_deltas[b] = list(deltas_map[str(b)])
        written_counts = {
            b: int(m["bucket_counts"].get(str(b), 0)) - eff_deleted.get(b, 0)
            for b in touched
        }
        deleted_total = sum(eff_deleted.values())
        return self.write_manifest(
            epoch=epoch,
            schema=schema,
            written=written,
            touched_buckets=touched,
            batch_id=batch_id,
            batch_digest=digest,
            metrics={
                "kind": "dv_delete_where",
                "where": canon_where,
                "deleted": deleted_total,
                "dv_positions_added": n_new_positions,
                "dv_buckets": sorted(written_dvs),
                "tombstone_buckets": sorted(
                    b for b in written_deltas if b in eff_deleted
                ),
                "zonemap_dirs_skipped": zstats["dirs_skipped"],
                "zonemap_files_skipped": zstats["files_skipped"],
                "wall_sec": round(time.time() - t0, 3),
            },
            written_counts=written_counts,
            written_deltas=written_deltas,
            written_dvs=written_dvs,
            dv_changes=dv_changes_rel,
            staged=stage,
            max_commit_retries=max_commit_retries,
        )

    def update_where(
        self,
        set_exprs: dict,
        where: list,
        batch_id: int,
        derive: dict | None = None,
        stage: bool = False,
        max_commit_retries: int = 0,
    ) -> dict:
        """Predicate update (``UPDATE t SET col = expr WHERE …`` — Delta/
        Iceberg row-level UPDATE, the companion of ``delete_where``).
        ``set_exprs`` maps LOGICAL column names to Spark SQL expression
        strings; standard SQL UPDATE semantics: every SET expression is
        evaluated against the OLD row (``SET a = b, b = a`` swaps).
        ``derive`` (optional) is a second map applied AFTER the SET, each
        expression seeing the post-SET row — the hook engine-level derived
        invariants (``n_tok = size(tokens)``) ride on.

        Scale plan: the matching LIVE rows come from the zone-map-pruned,
        DV/chain-aware ``read_state(where=…)`` — dirs and files whose
        column bounds can't match never launch — and the updated rows land
        as ONE merge-on-read upsert delta link per touched bucket, written
        inside the tasks (no driver-side row collection, so an UPDATE
        matching millions of rows stays a cluster-side plan; row counts are
        unchanged so no count recompute either). Changelog consumers
        receive every effectively updated key exactly once as a normal
        delta-link UPDATE. Exactly-once via ``batch_id`` + a digest of
        (predicate, SET map); re-delivery is a verified no-op; matching
        nothing commits a no-op epoch. The key column is the bucket/merge
        identity and cannot be SET (delete + insert instead). Expressions
        are applied verbatim (cast to the column's declared type) — a
        caller that wants the engine's full ingest normalization routes a
        change batch through apply_batch.
        """
        import hashlib

        validate_where(where)
        if not set_exprs:
            raise ValueError("update_where needs at least one SET expression")
        m = self.latest_manifest()
        if m is None:
            raise RuntimeError("bootstrap the table before updating rows")
        schema = T.StructType.fromJson(m["schema"])
        cm = self.colmap(m)
        inv = {p: l for l, p in cm.items()}
        key_phys = schema.fields[0].name
        key_col = inv.get(key_phys, key_phys)
        logical_fields = {inv.get(f.name, f.name): f for f in schema.fields}
        for c in list(set_exprs) + list(derive or {}):
            if c == key_col:
                raise ValueError(
                    f"cannot SET the key column {c!r} — the key is the "
                    "bucket/merge identity; delete + insert instead"
                )
            if c not in logical_fields:
                raise KeyError(
                    f"SET column {c!r} not in the table schema "
                    f"{sorted(logical_fields)}"
                )
        canon = json.dumps(
            {
                "where": [[c, o, v] for c, o, v in where],
                "set": {c: set_exprs[c] for c in sorted(set_exprs)},
                "derive": {c: (derive or {})[c] for c in sorted(derive or {})},
            },
            sort_keys=True,
            default=str,
        )
        digest = "updwhere:" + hashlib.md5(canon.encode()).hexdigest()
        committed = self.committed_batches()
        if batch_id in committed:
            if committed[batch_id]["batch_digest"] != digest:
                raise ConflictError(
                    f"batch {batch_id} re-delivered with different content"
                )
            return committed[batch_id]
        t0 = time.time()
        epoch = m["epoch"] + 1
        # matching LIVE rows under LOGICAL names (SET expressions are
        # written against the user's schema) — zone-map pruned, DV/chain
        # aware, so dead rows can never be resurrected by an update
        zstats: dict = {}
        matching = self.read_state(manifest=m, where=where, stats=zstats)
        updated = matching.select(
            *[
                (
                    # DDL-string cast: containsNull-widening must stay legal
                    F.expr(set_exprs[c]).cast(
                        logical_fields[c].dataType.simpleString()
                    )
                    if c in set_exprs
                    else F.col(c)
                ).alias(c)
                for c in logical_fields
            ],
            "bucket",
        )
        for c, expr in (derive or {}).items():
            updated = updated.withColumn(
                c,
                F.expr(expr).cast(logical_fields[c].dataType.simpleString()),
            )
        if cm:  # delta files speak the immutable PHYSICAL layout
            updated = updated.withColumnsRenamed(dict(cm))

        written_deltas: dict[int, list[str]] = {}
        per_bucket = self._write_upsert_links_distributed(
            updated, m, schema, epoch, written_deltas
        )
        n_updated = sum(per_bucket.values())
        touched = sorted(written_deltas)
        written = {b: m["buckets"].get(str(b)) for b in touched}
        written_counts = {
            b: int(m["bucket_counts"].get(str(b), 0)) for b in touched
        }
        return self.write_manifest(
            epoch=epoch,
            schema=schema,
            written=written,
            touched_buckets=touched,
            batch_id=batch_id,
            batch_digest=digest,
            metrics={
                "kind": "update_where",
                "update": canon,
                "updated": n_updated,
                "update_buckets": touched,
                "zonemap_dirs_skipped": zstats.get("zonemap_dirs_skipped", 0),
                "zonemap_files_skipped": zstats.get("zonemap_files_skipped", 0),
                "wall_sec": round(time.time() - t0, 3),
            },
            written_counts=written_counts,
            written_deltas=written_deltas,
            staged=stage,
            max_commit_retries=max_commit_retries,
        )

    def merge_into(
        self,
        source: DataFrame,
        batch_id: int,
        when_matched: list | None = None,
        when_not_matched: list | None = None,
        when_not_matched_by_source: list | None = None,
        derive: dict | None = None,
        stage: bool = False,
        max_commit_retries: int = 0,
    ) -> dict:
        """Conditional MERGE (SQL ``MERGE INTO target USING source ON key``
        with the full Delta/Iceberg clause surface). Clauses are evaluated
        IN ORDER — the first clause whose condition holds applies, matching
        rows with no applicable clause are kept, unmatched source rows with
        no applicable clause are ignored:

        * ``when_matched``: ``[(cond | None, "update", {col: expr}),
          (cond | None, "delete", None), …]``
        * ``when_not_matched``: ``[(cond | None, {col: expr} | None), …]``
          — insert; a ``None`` value map inserts the source row's columns
          (schema columns the source lacks insert NULL)
        * ``when_not_matched_by_source``: same shape as ``when_matched``
          but conditions may reference target columns only — requires a
          FULL table scan (documented Delta cost), so merges without it
          read only the buckets the source keys hash to.

        Conditions and expressions are Spark SQL strings over ``t_<col>``
        (target) and ``s_<col>`` (source) — the explicit two-namespace
        form of MERGE's ``target.col`` / ``source.col``. ``derive`` maps
        columns to expressions over the POST-action row (plain column
        names), applied to every written upsert — the engine's
        ``n_tok = size(tokens)`` invariant hook.

        Scale plan: ONE equi-join of the (bucket-pruned, zone-map/DV/chain
        aware) target state against the source on the key; every clause is
        a Catalyst CASE over the joined row (codegen'd, no Python); the
        resulting inserts/updates/deletes land as ONE MOR delta link per
        touched bucket written inside the tasks. Duplicate source keys are
        refused (SQL MERGE's ambiguous-match error) via a pre-pass
        aggregate whose output is one driver row. Exactly-once on
        ``batch_id`` + (source content, clauses) digest; changelog
        consumers see each effect exactly once."""
        import hashlib

        when_matched = list(when_matched or [])
        when_not_matched = list(when_not_matched or [])
        nmbs = list(when_not_matched_by_source or [])
        if not (when_matched or when_not_matched or nmbs):
            raise ValueError("merge_into needs at least one WHEN clause")
        m = self.latest_manifest()
        if m is None:
            raise RuntimeError("bootstrap the table before merging")
        schema = T.StructType.fromJson(m["schema"])
        cm = self.colmap(m)
        inv = {p: l for l, p in cm.items()}
        key_phys = schema.fields[0].name
        key_col = inv.get(key_phys, key_phys)
        logical_fields = {inv.get(f.name, f.name): f for f in schema.fields}
        if key_col not in source.columns:
            raise ValueError(f"source must carry the key column {key_col!r}")
        for cond, action, setmap in when_matched + nmbs:
            if action not in ("update", "delete"):
                raise ValueError(f"unknown clause action {action!r}")
            if action == "update" and not setmap:
                raise ValueError("update clause needs a SET map")
            for c in setmap or {}:
                if c == key_col:
                    raise ValueError("cannot SET the key column")
                if c not in logical_fields:
                    raise KeyError(f"SET column {c!r} not in the schema")
        for cond, values in when_not_matched:
            for c in values or {}:
                if c not in logical_fields:
                    raise KeyError(f"INSERT column {c!r} not in the schema")
        canon = json.dumps(
            {
                "matched": when_matched,
                "not_matched": when_not_matched,
                "nmbs": nmbs,
                "derive": {c: (derive or {})[c] for c in sorted(derive or {})},
            },
            sort_keys=True,
            default=str,
        )
        # content digest over the source rows + the clause program: the
        # redelivery identity of a MERGE is (what arrived, what it asked)
        scols = [F.col(c) for c in sorted(source.columns)]
        nb = int(m["n_buckets"])
        src = source.withColumn("bucket", bucket_expr(F.col(key_col), nb))
        pre = (
            src.groupBy(key_col, "bucket")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.expr(
                    f"bit_xor(xxhash64({', '.join(sorted(source.columns))}))"
                ).alias("x"),
            )
            .agg(
                F.max("n").alias("max_n"),
                F.expr("bit_xor(x)").alias("xall"),
                F.count(F.lit(1)).alias("n_keys"),
                F.collect_set("bucket").alias("bks"),
            )
            .collect()[0]
        )
        digest = "mergeinto:" + hashlib.md5(
            f"{canon}|{pre['xall']}:{pre['n_keys']}".encode()
        ).hexdigest()
        committed = self.committed_batches()
        if batch_id in committed:
            if committed[batch_id]["batch_digest"] != digest:
                raise ConflictError(
                    f"batch {batch_id} re-delivered with different content"
                )
            return committed[batch_id]
        if pre["n_keys"] and pre["max_n"] > 1:
            raise ValueError(
                "duplicate source keys: a MERGE where multiple source rows "
                "match one target row is ambiguous — dedupe the source first"
            )
        t0 = time.time()
        epoch = m["epoch"] + 1

        read_buckets = None if nmbs else sorted(int(b) for b in pre["bks"])
        target = self.read_state(buckets=read_buckets, manifest=m)
        t = target.select(
            *[F.col(c).alias(f"t_{c}") for c in logical_fields],
            F.col("bucket").alias("t_bucket"),
        )
        s = src.select(
            *[F.col(c).alias(f"s_{c}") for c in source.columns],
            F.col("bucket").alias("s_bucket"),
        )
        j = t.join(
            s, F.col(f"t_{key_col}") == F.col(f"s_{key_col}"), "full_outer"
        )

        is_matched = (
            F.col(f"t_{key_col}").isNotNull()
            & F.col(f"s_{key_col}").isNotNull()
        )
        is_src_only = F.col(f"t_{key_col}").isNull()
        is_tgt_only = F.col(f"s_{key_col}").isNull()

        def first_match(base, clauses, tags):
            """Nested first-clause-wins CASE under the ``base`` guard."""
            expr = F.lit(None).cast("string")
            for (cond, *_rest), tag in zip(reversed(clauses), reversed(tags)):
                hit = F.lit(True) if cond is None else F.expr(cond)
                expr = F.when(hit, F.lit(tag)).otherwise(expr)
            return F.when(base, expr)

        m_tags = [
            f"m{i}:{a}" for i, (_c, a, _s) in enumerate(when_matched)
        ]
        i_tags = [f"i{i}" for i in range(len(when_not_matched))]
        n_tags = [f"n{i}:{a}" for i, (_c, a, _s) in enumerate(nmbs)]
        action = (
            first_match(is_matched, when_matched, m_tags)
            .when(
                is_src_only,
                first_match(
                    F.lit(True),
                    [(c, None, None) for c, _v in when_not_matched],
                    i_tags,
                ),
            )
            .when(is_tgt_only, first_match(F.lit(True), nmbs, n_tags))
        )
        j = j.withColumn("_action", action).filter(
            # keep-rows (no clause fired) leave the table untouched: the
            # MOR link carries only effects
            F.col("_action").isNotNull()
        )

        def out_col(c):
            """Post-action value of payload column ``c`` as one CASE.
            Casts use the DDL string form: nullability-widening array
            casts (containsNull false -> true) must stay legal."""
            e = F.lit(None).cast(logical_fields[c].dataType.simpleString())
            for tag, (_cond, action_, setmap) in list(
                zip(m_tags, when_matched)
            ) + list(zip(n_tags, nmbs)):
                if action_ != "update":
                    continue
                v = (
                    F.expr(setmap[c]) if c in setmap else F.col(f"t_{c}")
                )
                e = F.when(F.col("_action") == tag, v).otherwise(e)
            for tag, (_cond, values) in zip(i_tags, when_not_matched):
                if values and c in values:
                    v = F.expr(values[c])
                elif c in source.columns:
                    v = F.col(f"s_{c}")
                else:
                    v = F.lit(None)
                e = F.when(F.col("_action") == tag, v).otherwise(e)
            return e.cast(logical_fields[c].dataType.simpleString()).alias(c)

        is_del = F.col("_action").endswith(":delete")
        eff = j.select(
            F.when(is_del, F.lit("d"))
            .when(F.col("_action").startswith("i"), F.lit("i"))
            .otherwise(F.lit("u"))
            .alias("_eff"),
            F.coalesce(F.col("t_bucket"), F.col("s_bucket")).alias("bucket"),
            F.when(
                is_del, F.col(f"t_{key_col}")
            ).alias("_del_key"),
            *[out_col(c) for c in logical_fields],
        )
        for c, expr_ in (derive or {}).items():
            eff = eff.withColumn(
                c,
                F.when(
                    F.col("_eff") != "d",
                    F.expr(expr_).cast(
                        logical_fields[c].dataType.simpleString()
                    ),
                ),
            )
        eff = eff.withColumn(
            key_col,
            F.when(F.col("_eff") == "d", F.col("_del_key")).otherwise(
                F.col(key_col)
            ),
        ).drop("_del_key")
        if cm:  # delta files speak the immutable PHYSICAL layout
            eff = eff.withColumnsRenamed(dict(cm))

        written_deltas: dict[int, list[str]] = {}
        per_bucket = self._write_merge_links_distributed(
            eff, m, schema, epoch, written_deltas
        )
        touched = sorted(written_deltas)
        written = {b: m["buckets"].get(str(b)) for b in touched}
        written_counts = {
            b: int(m["bucket_counts"].get(str(b), 0))
            + per_bucket[b]["inserted"]
            - per_bucket[b]["deleted"]
            for b in touched
        }
        totals = {
            k: sum(pb[k] for pb in per_bucket.values())
            for k in ("inserted", "updated", "deleted")
        }
        return self.write_manifest(
            epoch=epoch,
            schema=schema,
            written=written,
            touched_buckets=touched,
            batch_id=batch_id,
            batch_digest=digest,
            metrics={
                "kind": "merge_into",
                "clauses": canon,
                "source_rows": int(pre["n_keys"]),
                "full_scan": bool(nmbs),
                **totals,
                "wall_sec": round(time.time() - t0, 3),
            },
            written_counts=written_counts,
            written_deltas=written_deltas,
            staged=stage,
            max_commit_retries=max_commit_retries,
        )

    def _write_merge_links_distributed(
        self,
        eff: DataFrame,
        m: dict,
        schema: T.StructType,
        epoch: int,
        written_deltas: dict[int, list[str]],
    ) -> dict[int, dict]:
        """Write merge effects (``_eff`` ∈ i/u/d + physical payload +
        bucket) as one combined upsert+tombstone delta link per bucket,
        inside the tasks. Returns per-bucket {inserted, updated, deleted}
        counts and appends each link to ``written_deltas``."""
        from georef_ar_etl_spark.operators.copart_merge import _to_arrow
        from georef_ar_etl_spark.sinks.mor import write_delta

        key_col = schema.fields[0].name
        payload_cols = [f.name for f in schema.fields]
        bloom_cols = m.get("bloom_cols")  # column-bloom upkeep on delta links
        arrow_schema = pa.schema(
            [pa.field(f.name, _to_arrow(f.dataType)) for f in schema.fields]
        )
        epoch_dir = self.epoch_dir(epoch)
        deltas_map = m.get("bucket_deltas") or {}
        nb = int(m["n_buckets"])

        nonnull = [f.name for f in schema.fields if not f.nullable]

        def mrg(batches):
            chunks = [c for c in batches if not c.empty]
            if not chunks:
                return
            pdf = pd.concat(chunks, ignore_index=True)
            for b, grp in pdf.groupby("bucket", sort=True):
                ups = grp[grp["_eff"] != "d"]
                for c in nonnull:  # enforce the contract loudly here, not
                    # as a codegen NPE three reads later
                    if ups[c].isna().any():
                        raise ValueError(
                            f"MERGE produced NULL in non-nullable column "
                            f"{c!r} — give the clause an explicit value"
                        )
                dels = sorted(set(grp.loc[grp["_eff"] == "d", key_col]))
                ddir = os.path.join(epoch_dir, f"delta={int(b)}")
                os.makedirs(ddir, exist_ok=True)
                write_delta(
                    os.path.join(ddir, "delta-00000.parquet"),
                    ups, dels, payload_cols, arrow_schema, key=key_col,
                    bloom_cols=bloom_cols,
                )
                yield pd.DataFrame(
                    {
                        "bucket": [int(b)],
                        "inserted": [int((grp["_eff"] == "i").sum())],
                        "updated": [int((grp["_eff"] == "u").sum())],
                        "deleted": [len(dels)],
                    }
                )

        out: dict[int, dict] = {}
        res = (
            eff.repartition(nb, "bucket")
            .mapInPandas(
                mrg, "bucket int, inserted long, updated long, deleted long"
            )
            .collect()
        )
        for r in res:
            b = int(r["bucket"])
            out[b] = {
                "inserted": int(r["inserted"]),
                "updated": int(r["updated"]),
                "deleted": int(r["deleted"]),
            }
            written_deltas[b] = list(deltas_map.get(str(b)) or []) + [
                os.path.join(DATA_DIR, f"epoch={epoch}", f"delta={b}")
            ]
        return out

    def _write_upsert_links_distributed(
        self,
        rows: DataFrame,
        m: dict,
        schema: T.StructType,
        epoch: int,
        written_deltas: dict[int, list[str]],
    ) -> dict[int, int]:
        """Write the (physical-schema) payload rows of ``rows`` as one
        upsert delta link per bucket, INSIDE the tasks — the update twin of
        ``_write_tombstone_links_distributed``. Returns per-bucket row
        counts and appends each new link to ``written_deltas``."""
        from georef_ar_etl_spark.operators.copart_merge import _to_arrow
        from georef_ar_etl_spark.sinks.mor import write_delta

        key_col = schema.fields[0].name
        payload_cols = [f.name for f in schema.fields]
        bloom_cols = m.get("bloom_cols")  # column-bloom upkeep on delta links
        arrow_schema = pa.schema(
            [pa.field(f.name, _to_arrow(f.dataType)) for f in schema.fields]
        )
        epoch_dir = self.epoch_dir(epoch)
        deltas_map = m.get("bucket_deltas") or {}
        nb = int(m["n_buckets"])

        nonnull = [f.name for f in schema.fields if not f.nullable]

        def upd(batches):
            chunks = [c for c in batches if not c.empty]
            if not chunks:
                return
            pdf = pd.concat(chunks, ignore_index=True)
            for c in nonnull:  # contract guard — loud, not a later NPE
                if pdf[c].isna().any():
                    raise ValueError(
                        f"UPDATE produced NULL in non-nullable column {c!r}"
                    )
            for b, grp in pdf.groupby("bucket", sort=True):
                ddir = os.path.join(epoch_dir, f"delta={int(b)}")
                os.makedirs(ddir, exist_ok=True)
                path = os.path.join(ddir, "delta-00000.parquet")
                write_delta(
                    path, grp, [], payload_cols, arrow_schema, key=key_col,
                    bloom_cols=bloom_cols,
                )
                yield pd.DataFrame(
                    {"bucket": [int(b)], "updated": [len(grp)]}
                )

        out: dict[int, int] = {}
        res = (
            rows.repartition(nb, "bucket")
            .mapInPandas(upd, "bucket int, updated long")
            .collect()
        )
        for r in res:
            b = int(r["bucket"])
            out[b] = int(r["updated"])
            written_deltas[b] = list(deltas_map.get(str(b)) or []) + [
                os.path.join(DATA_DIR, f"epoch={epoch}", f"delta={b}")
            ]
        return out

    def _write_tombstone_links_distributed(
        self,
        matching: DataFrame,
        m: dict,
        schema: T.StructType,
        epoch: int,
        written_deltas: dict[int, list[str]],
    ) -> dict[int, int]:
        """Tombstone the (key, bucket) rows of ``matching`` — one delta
        link per bucket, written INSIDE the tasks so a predicate matching
        millions of rows never rides through the driver."""
        from georef_ar_etl_spark.operators.copart_merge import _to_arrow
        from georef_ar_etl_spark.sinks.mor import write_delta

        key_col = schema.fields[0].name
        payload_cols = [f.name for f in schema.fields]
        bloom_cols = m.get("bloom_cols")  # column-bloom upkeep on delta links
        arrow_schema = pa.schema(
            [pa.field(f.name, _to_arrow(f.dataType)) for f in schema.fields]
        )
        epoch_dir = self.epoch_dir(epoch)
        deltas_map = m.get("bucket_deltas") or {}
        nb = int(m["n_buckets"])

        def tomb(batches):
            chunks = [c for c in batches if not c.empty]
            if not chunks:
                return
            pdf = pd.concat(chunks, ignore_index=True)
            for b, grp in pdf.groupby("bucket", sort=True):
                dels = sorted(set(grp[key_col]))
                ddir = os.path.join(epoch_dir, f"delta={int(b)}")
                os.makedirs(ddir, exist_ok=True)
                path = os.path.join(ddir, "delta-00000.parquet")
                write_delta(
                    path, pd.DataFrame(columns=payload_cols), dels,
                    payload_cols, arrow_schema, key=key_col,
                    bloom_cols=bloom_cols,
                )
                yield pd.DataFrame(
                    {"bucket": [int(b)], "deleted": [len(dels)]}
                )

        out: dict[int, int] = {}
        rows = (
            matching.repartition(nb, "bucket")
            .mapInPandas(tomb, "bucket int, deleted long")
            .collect()
        )
        for r in rows:
            b = int(r["bucket"])
            out[b] = int(r["deleted"])
            written_deltas[b] = list(deltas_map.get(str(b)) or []) + [
                os.path.join(DATA_DIR, f"epoch={epoch}", f"delta={b}")
            ]
        return out

    def _write_tombstone_links(
        self,
        tomb_buckets: dict[int, list],
        m: dict,
        schema: T.StructType,
        epoch: int,
        written_deltas: dict[int, list[str]],
    ) -> dict[int, int]:
        """One tiny task per fallback bucket: resolve the bucket's LIVE key
        set (keys-only read, DV-masked), tombstone the requested keys that
        are actually live, and write one delta link. Buckets where nothing
        is live write nothing (pure no-op)."""
        from georef_ar_etl_spark.operators.copart_merge import _to_arrow
        from georef_ar_etl_spark.sinks.deletion_vectors import read_dv_map
        from georef_ar_etl_spark.sinks.mor import live_keys, write_delta

        deltas_map = m.get("bucket_deltas") or {}
        dvs_map = m.get("bucket_dvs") or {}
        key_col = schema.fields[0].name
        payload_cols = [f.name for f in schema.fields]
        bloom_cols = m.get("bloom_cols")  # column-bloom upkeep on delta links
        arrow_schema = pa.schema(
            [pa.field(f.name, _to_arrow(f.dataType)) for f in schema.fields]
        )
        epoch_dir = self.epoch_dir(epoch)
        specs = [
            (
                b,
                self._dir_files(m["buckets"][str(b)])
                if m["buckets"].get(str(b))
                else [],
                [
                    f
                    for dd in (deltas_map.get(str(b)) or [])
                    for f in self._dir_files(dd)
                ],
                os.path.join(self.root, dvs_map[str(b)])
                if dvs_map.get(str(b))
                else None,
                [str(k) for k in ks],
            )
            for b, ks in sorted(tomb_buckets.items())
        ]
        spec_df = self.spark.createDataFrame(
            specs,
            "bucket int, base_files array<string>, delta_files array<string>, "
            "dv_dir string, del_keys array<string>",
        ).repartition(len(specs))

        def tomb(batches):
            import pandas as pd

            for pdf in batches:
                for r in pdf.itertuples(index=False):
                    dvm = read_dv_map(r.dv_dir) if r.dv_dir else None
                    live = live_keys(
                        list(r.base_files), list(r.delta_files), key_col,
                        dv_map=dvm,
                    )
                    dels = [k for k in r.del_keys if k in set(live)]
                    path = None
                    if dels:
                        ddir = os.path.join(epoch_dir, f"delta={int(r.bucket)}")
                        os.makedirs(ddir, exist_ok=True)
                        path = os.path.join(ddir, "delta-00000.parquet")
                        write_delta(
                            path, pd.DataFrame(columns=payload_cols),
                            dels, payload_cols, arrow_schema, key=key_col,
                            bloom_cols=bloom_cols,
                        )
                    yield pd.DataFrame(
                        {
                            "bucket": [int(r.bucket)],
                            "deleted": [len(dels)],
                            "path": [path],
                        }
                    )

        out: dict[int, int] = {}
        for r in spec_df.mapInPandas(
            tomb, "bucket int, deleted long, path string"
        ).collect():
            b = int(r["bucket"])
            if r["path"]:
                rel = os.path.relpath(os.path.dirname(r["path"]), self.root)
                written_deltas[b] = list(deltas_map.get(str(b)) or []) + [rel]
                out[b] = int(r["deleted"])
        return out

    # ----------------------------------------------------------------- purge
    def redact_metrics_ids(self, keys) -> int:
        """Redact purged doc ids from the ``metrics.jsonl`` observability log
        (the per-commit lineage lists carry changed IDS — after a hard purge
        those lines would be the last place the identifiers survive). Each
        occurrence is replaced by ``md5:<digest12>`` so per-commit COUNTS and
        the shape of the lineage stay auditable while the identifier is gone.
        Atomic rewrite (tmp + fsync + replace), idempotent. Returns the
        number of ids redacted."""
        import hashlib

        path = os.path.join(self.root, METRICS_LOG)
        if not os.path.exists(path):
            return 0
        kset = {str(k) for k in keys}

        def red(v):
            return "md5:" + hashlib.md5(str(v).encode()).hexdigest()[:12]

        n = 0
        out_lines = []
        with open(path) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                obj = json.loads(line)
                lineage = obj.get("bucket_lineage") or {}
                for _b, cats in lineage.items():
                    if not isinstance(cats, dict):
                        continue
                    for cat, ids in cats.items():
                        if isinstance(ids, list):
                            new_ids = [
                                red(i) if str(i) in kset else i for i in ids
                            ]
                            n += sum(
                                1 for a, b in zip(ids, new_ids) if a != b
                            )
                            cats[cat] = new_ids
                out_lines.append(json.dumps(obj))
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            f.write("\n".join(out_lines) + ("\n" if out_lines else ""))
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, path)
        return n

    def scan_files_for_keys(self, keys, key_col: str = "doc_id") -> int:
        """Count occurrences of ``keys`` in ANY remaining parquet file under
        the table root (data bases, MOR deltas, quarantine side-outputs) —
        the post-purge verification sweep. Distributed: one task per group
        of files, each reading ONLY the key column (a single column chunk
        per file, not the payload). Files without the column are skipped."""
        files = []
        for sub in (DATA_DIR, QUARANTINE_DIR):
            top = os.path.join(self.root, sub)
            for dirpath, _dn, names in os.walk(top):
                files.extend(
                    os.path.join(dirpath, n)
                    for n in names
                    if n.endswith(".parquet")
                )
        if not files:
            return 0
        kset = {str(k) for k in keys}

        def count_hits(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            import pyarrow.parquet as _pq

            total = 0
            for pdf in batches:
                for p in pdf["path"]:
                    pf = _pq.ParquetFile(p)
                    if key_col not in pf.schema_arrow.names:
                        continue
                    col = pf.read(columns=[key_col]).column(key_col)
                    total += sum(
                        1 for v in col.to_pylist() if str(v) in kset
                    )
            yield pd.DataFrame({"hits": [total]})

        fdf = self.spark.createDataFrame(
            [(p,) for p in files], T.StructType([T.StructField("path", T.StringType())])
        ).repartition(min(len(files), 32))
        res = fdf.mapInPandas(
            count_hits, T.StructType([T.StructField("hits", T.LongType())])
        )
        return int(
            res.agg(F.sum("hits").alias("s")).collect()[0]["s"] or 0
        )

    def table_stats(self) -> dict | None:
        """Zero-Spark-job operational snapshot from the manifests + file
        metadata: what an operator checks before deciding to compact,
        vacuum or rescale. Returns None on an un-bootstrapped table.

        Keys: epoch/total_rows/n_buckets straight from the head manifest;
        row-count skew (max/mean bucket rows); MOR health (dirty buckets,
        max/total chain depth, delta bytes vs base bytes); on-disk bytes
        and file counts of everything the head references; retained epoch
        span."""
        m = self.latest_manifest()
        if m is None:
            return None
        counts = [int(c) for c in m["bucket_counts"].values()]
        mean = sum(counts) / max(len(counts), 1)
        deltas = m.get("bucket_deltas") or {}

        def dir_bytes(rels):
            nb = nf = 0
            for rel in rels:
                full = os.path.join(self.root, rel)
                if not os.path.isdir(full):
                    continue
                for name in os.listdir(full):
                    if name.endswith(".parquet"):
                        nb += os.path.getsize(os.path.join(full, name))
                        nf += 1
            return nb, nf

        base_bytes, base_files = dir_bytes(
            d for d in m["buckets"].values() if d is not None
        )
        delta_bytes, delta_files = dir_bytes(
            d for chain in deltas.values() for d in chain
        )
        epochs = [mm["epoch"] for mm in self.manifests()]
        return {
            "epoch": m["epoch"],
            "total_rows": m["total_rows"],
            "n_buckets": int(m["n_buckets"]),
            "max_bucket_rows": max(counts, default=0),
            "mean_bucket_rows": round(mean, 1),
            # guard only the empty-table zero, never clamp a small mean —
            # clamping to 1 understated the skew of sparse tables by up to
            # n_buckets (3 rows in one of 32 buckets read 3.0, not 32.0)
            "bucket_row_skew": round(max(counts, default=0) / mean, 3) if mean else 0.0,
            "dirty_buckets": len(deltas),
            "max_delta_chain": max((len(c) for c in deltas.values()), default=0),
            "base_files": base_files,
            "base_bytes": base_bytes,
            "delta_files": delta_files,
            "delta_bytes": delta_bytes,
            "retained_epochs": len(epochs),
            "oldest_retained_epoch": epochs[0],
        }

    def rel_dir_bytes(self, rel_dirs) -> int:
        """Total parquet bytes under the given table-relative dirs (None
        entries skipped) — file metadata only, zero Spark jobs. Feeds the
        engine's bucket-size contract check (operators/copart_merge.py
        documents the bucket-fits-in-one-task contract this enforces)."""
        nb = 0
        for rel in rel_dirs:
            if rel is None:
                continue
            full = os.path.join(self.root, rel)
            if not os.path.isdir(full):
                continue
            for name in os.listdir(full):
                if name.endswith(".parquet"):
                    nb += os.path.getsize(os.path.join(full, name))
        return nb

    def bucket_sizes(self, manifest: dict | None = None) -> dict[int, int]:
        """Per-bucket on-disk bytes (base + pending delta chain) for every
        bucket of the given (default head) manifest — zero Spark jobs."""
        m = manifest or self.latest_manifest()
        if m is None:
            return {}
        deltas = m.get("bucket_deltas") or {}
        dvs = m.get("bucket_dvs") or {}
        return {
            int(b): self.rel_dir_bytes([d, *(deltas.get(b) or []), dvs.get(b)])
            for b, d in m["buckets"].items()
        }

    def schema(self) -> T.StructType | None:
        m = self.latest_manifest()
        return T.StructType.fromJson(m["schema"]) if m else None

    # ------------------------------------------------------------------ read
    def snapshots_df(self, spark: SparkSession) -> DataFrame:
        """Iceberg ``snapshots``/``history`` metadata-table analogue: one
        row per retained manifest, queryable with the full DataFrame API
        (join it against ``metrics.jsonl``, filter by kind, chart chain
        depth over time). Driver-side by construction — manifests are
        O(retained epochs) small JSON, the same data ``table_stats``
        already parses; no Spark job runs to BUILD the frame."""
        rows = []
        for m in self.manifests():
            metrics = m.get("metrics") or {}
            modes = metrics.get("merge_modes") or {}
            if metrics.get("kind"):
                kind = metrics["kind"]
            elif m.get("parent") is None:
                kind = "bootstrap"
            else:
                kind = "batch"
            rows.append(
                (
                    int(m["epoch"]),
                    m.get("parent"),
                    m.get("batch_id"),
                    kind,
                    int(m["total_rows"]),
                    int(m["n_buckets"]),
                    len(m.get("touched_buckets") or []),
                    len(m.get("bucket_deltas") or {}),
                    int(modes.get("delta") or 0),
                    int(modes.get("rewrite") or 0),
                    int(modes.get("noop") or 0),
                    int(sum((metrics.get("quarantined") or {}).values())),
                    m.get("batch_digest"),
                )
            )
        return spark.createDataFrame(
            rows,
            "epoch long, parent long, batch_id long, kind string, "
            "total_rows long, n_buckets int, touched_buckets int, "
            "dirty_buckets int, mode_delta int, mode_rewrite int, "
            "mode_noop int, quarantined long, batch_digest string",
        )

    def files_df(self, spark: SparkSession, epoch: int | None = None) -> DataFrame:
        """Iceberg ``files`` metadata-table analogue: one row per live data
        file referenced by the manifest at ``epoch`` (default head) —
        base files and every pending delta in chain order, with on-disk
        bytes. The inputs to every compact/vacuum/rescale decision, as a
        queryable frame instead of a dict (``table_stats`` stays the
        zero-frame summary). Driver-side: O(files at one epoch) rows of
        pure file metadata, no data read."""
        m = self.latest_manifest() if epoch is None else self.manifest_for_epoch(epoch)
        if m is None:
            raise KeyError("no committed manifest — bootstrap the table first")
        rows = []

        def emit(bucket: str, rel: str, kind: str, pos: int, brows):
            full = os.path.join(self.root, rel)
            if not os.path.isdir(full):
                return
            for name in sorted(os.listdir(full)):
                if name.endswith(".parquet"):
                    rows.append(
                        (
                            int(bucket), kind, pos,
                            os.path.join(rel, name),
                            os.path.getsize(os.path.join(full, name)),
                            brows,
                        )
                    )

        counts = m.get("bucket_counts") or {}
        for b, rel in m["buckets"].items():
            if rel is not None:
                emit(b, rel, "base", 0, int(counts.get(b, 0)))
        for b, chain in (m.get("bucket_deltas") or {}).items():
            for i, rel in enumerate(chain):
                emit(b, rel, "delta", i + 1, None)
        # deletion vectors ride at position -1: they mask the base (pos 0)
        # rather than following the chain
        for b, rel in (m.get("bucket_dvs") or {}).items():
            emit(b, rel, "dv", -1, None)
        return spark.createDataFrame(
            rows,
            "bucket int, kind string, chain_pos int, rel_path string, "
            "bytes long, bucket_rows long",
        )

    def read_state(
        self,
        buckets: list[int] | None = None,
        manifest: dict | None = None,
        epoch: int | None = None,
        where: list | None = None,
        stats: dict | None = None,
        tag: str | None = None,
        as_of: float | None = None,
        physical: bool = False,
    ) -> DataFrame:
        """State as a DataFrame (payload columns + ``bucket``).

        Columns come back under the manifest's LOGICAL names (``where``
        predicates are logical too); ``physical=True`` skips the rename —
        the contract for internal rewrite paths (compaction, rescale,
        delete_where, the join merge), which must read and write the
        immutable physical layout.

        ``buckets`` prunes the read to the listed buckets — partition pruning
        on the change batch's key range, the Spark form of the reference's
        source-side CQL_FILTER pruning (georef_ar_etl/streets.py:24-31).
        ``epoch`` time-travels to a retained snapshot (manifests are
        immutable and carry the full bucket map, so any retained epoch reads
        exactly as it committed).

        ``where`` — a conjunction of ``(col, op, literal)`` value predicates
        (sinks/zonemap.py) — plans the scan against each dir's zone-map
        sidecar: dirs whose column bounds prove no row can match are dropped
        BEFORE the job launches (Iceberg manifest-stats skipping), and the
        exact predicate is applied as a ``.filter`` on the result, so the
        answer is identical with or without pruning. On a merge-on-read
        chain the whole bucket skips only when base and EVERY delta exclude
        (dropping a single newer link could resurrect a superseded row — see
        the zonemap module doc). ``stats`` (optional dict) receives
        ``zonemap_dirs_skipped`` / ``zonemap_dirs_kept`` for tests and
        observability.

        Buckets with pending merge-on-read deltas resolve base + delta chain
        in one task per bucket (sinks/mor.py) — the MOR read path; clean
        buckets stay on the native vectorized parquet scan with full
        pushdown/pruning, so a mostly-compacted table reads at COW speed.
        """
        if sum(x is not None for x in (tag, epoch, manifest, as_of)) > 1:
            raise ValueError("pass at most one of tag / epoch / manifest / as_of")
        if tag is not None:
            manifest = self.manifest_for_tag(tag)
        if as_of is not None:
            manifest = self.manifest_as_of(as_of)
        if epoch is not None and manifest is None:
            manifest = self.manifest_for_epoch(epoch)
        if where:
            validate_where(where)
        if stats is None:
            stats = {}
        stats.update(
            zonemap_dirs_skipped=0, zonemap_dirs_kept=0,
            zonemap_files_skipped=0,
        )
        m = manifest or self.latest_manifest()
        # zone maps, parquet files and the residual filter all speak
        # PHYSICAL names — map the user's logical predicate once, up front.
        # physical=True callers (compaction, delete_where) already mapped:
        # mapping twice would mis-bind when a rename chain reuses a retired
        # logical name as another column's physical name
        if not physical:
            where = self._where_physical(where, m)
        schema = T.StructType.fromJson(m["schema"])
        deltas_map = m.get("bucket_deltas") or {}
        dvs_map = m.get("bucket_dvs") or {}
        bset = set(buckets) if buckets is not None else None
        dirs, mor_specs, dv_native = [], [], []

        def prune_files(rel_dir: str, zm: dict | None) -> list[str]:
            """Per-FILE pruning inside a kept dir (Iceberg data-file stats).
            Safe under MOR for BASE files: base rows never supersede delta
            rows, so dropping a base file whose bounds can't match removes
            only rows that either wouldn't satisfy the predicate or are
            overridden by a kept delta row anyway."""
            files = self._dir_files(rel_dir)
            fmaps = (zm or {}).get("files") or {}
            if not where or not fmaps:
                return files
            kept = []
            for f in files:
                fzm = fmaps.get(os.path.basename(f))
                if fzm is not None and zone_excludes(fzm, where):
                    stats["zonemap_files_skipped"] += 1
                else:
                    kept.append(f)
            return kept

        for b_str, d in m["buckets"].items():
            if bset is not None and int(b_str) not in bset:
                continue
            dl = deltas_map.get(b_str) or []
            if dl:
                base_zm = (
                    read_zonemap(os.path.join(self.root, d)) if d and where else None
                )
                if where:
                    links = ([d] if d else []) + list(dl)
                    zms = [base_zm] if d else []
                    zms += [
                        read_zonemap(os.path.join(self.root, dd)) for dd in dl
                    ]
                    if all(zone_excludes(z, where) for z in zms):
                        stats["zonemap_dirs_skipped"] += len(links)
                        continue
                    stats["zonemap_dirs_kept"] += len(links)
                base = prune_files(d, base_zm) if d else []
                dfiles = [f for dd in dl for f in self._dir_files(dd)]
                dvd = dvs_map.get(b_str)
                mor_specs.append((
                    int(b_str), base, dfiles,
                    os.path.join(self.root, dvd) if dvd else None,
                ))
            elif d is not None:
                kept_files = None
                if where:
                    zm = read_zonemap(os.path.join(self.root, d))
                    if zone_excludes(zm, where):
                        stats["zonemap_dirs_skipped"] += 1
                        continue
                    stats["zonemap_dirs_kept"] += 1
                    kept_files = prune_files(d, zm)
                    if not kept_files:
                        continue
                dvd = dvs_map.get(b_str)
                if dvd:
                    # chain-free bucket with a deletion vector: stays on the
                    # native vectorized scan; masked positions drop via a
                    # broadcast anti-join below (sinks/deletion_vectors.py)
                    dv_native.append((
                        int(b_str),
                        kept_files if kept_files is not None else self._dir_files(d),
                        os.path.join(self.root, dvd),
                    ))
                elif kept_files is not None:
                    dirs.extend(kept_files)
                else:
                    dirs.append(os.path.join(self.root, d))
        parts = []
        if dirs:
            parts.append(
                self.spark.read.option("basePath", os.path.join(self.root, DATA_DIR))
                .schema(
                    # list() copy: StructType holds the field list by
                    # reference and .add() mutates it in place
                    T.StructType(list(schema.fields))
                    .add("epoch", T.IntegerType())
                    .add("bucket", T.IntegerType())
                )
                .parquet(*dirs)
                .drop("epoch")
            )
        if dv_native:
            parts.append(self._read_dv_masked(dv_native, schema))
        if mor_specs:
            parts.append(self._read_mor(mor_specs, schema))
        if not parts:
            empty = self.spark.createDataFrame([], schema)
            empty = empty.withColumn("bucket", F.lit(None).cast("int"))
            return empty if physical else self._to_logical(empty, m)
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        if where:
            # exact semantics regardless of what pruned; on clean buckets
            # Catalyst additionally pushes this into the parquet scan
            df = df.filter(residual_filter(where))
        return df if physical else self._to_logical(df, m)

    def _dir_files(self, rel_dir: str) -> list[str]:
        full = os.path.join(self.root, rel_dir)
        return sorted(
            os.path.join(full, n) for n in os.listdir(full) if n.endswith(".parquet")
        )

    def _read_dv_masked(
        self, specs: list[tuple[int, list[str], str]], schema: T.StructType
    ) -> DataFrame:
        """Native vectorized scan of chain-free buckets that carry a
        deletion vector: masked positions drop via a **broadcast anti-join**
        on ``(bucket, file, pos)`` against the tiny DV relation, keyed by
        the parquet scan's ``_metadata.file_name`` / ``_metadata.row_index``
        columns — the Iceberg-v3 positional-delete read, with the base scan
        staying whole-stage-codegen'd (no Python, full pushdown of residual
        predicates). DV size is bounded by compaction cadence (≪ base), so
        broadcasting is the right plan at any table size."""
        files = [f for _b, fs, _dv in specs for f in fs]
        scan = (
            self.spark.read.option("basePath", os.path.join(self.root, DATA_DIR))
            .schema(
                T.StructType(list(schema.fields))
                .add("epoch", T.IntegerType())
                .add("bucket", T.IntegerType())
            )
            .parquet(*files)
            .drop("epoch")
            .withColumn("_dv_file", F.col("_metadata.file_name"))
            .withColumn("_dv_pos", F.col("_metadata.row_index"))
        )
        dv = (
            self.spark.read.schema("bucket int, file string, pos long")
            .parquet(*[dvd for _b, _fs, dvd in specs])
            .select("bucket", "file", "pos")
        )
        cond = (
            (scan["bucket"] == dv["bucket"])
            & (scan["_dv_file"] == dv["file"])
            & (scan["_dv_pos"] == dv["pos"])
        )
        return scan.join(F.broadcast(dv), cond, "left_anti").drop(
            "_dv_file", "_dv_pos"
        )

    def _read_mor(
        self,
        specs: list[tuple[int, list[str], list[str], str | None]],
        schema: T.StructType,
        bucket_keys: dict[int, list] | None = None,
    ) -> DataFrame:
        """Merge-on-read scan: one task per dirty bucket resolves base +
        delta chain (pyarrow + pandas, last-writer-wins) and streams the live
        rows out via Arrow. Read amplification is bounded by the merge's
        ``mor_max_deltas`` chain cap; at cluster scale each task reads only
        its own bucket's files — same contract as the copartitioned merge.

        ``bucket_keys`` (point lookup): bucket → key values to resolve; the
        task pushes the key predicate into its parquet reads (row-group
        pruning on the sort-by-key layout)."""
        from georef_ar_etl_spark.sinks.deletion_vectors import read_dv_map
        from georef_ar_etl_spark.sinks.mor import resolve_live

        payload_cols = [f.name for f in schema.fields]
        out_schema = T.StructType(list(schema.fields)).add("bucket", T.IntegerType())
        spec_df = self.spark.createDataFrame(
            [(b, base, dfiles, dvd) for b, base, dfiles, dvd in specs],
            "bucket int, base_files array<string>, delta_files array<string>, "
            "dv_dir string",
        ).repartition(len(specs))
        key_col = payload_cols[0]

        def read_merge(batches):
            for pdf in batches:
                for r in pdf.itertuples(index=False):
                    live = resolve_live(
                        list(r.base_files), list(r.delta_files), payload_cols,
                        key=key_col,
                        keys=None if bucket_keys is None
                        else bucket_keys.get(int(r.bucket), []),
                        dv_map=read_dv_map(r.dv_dir) if r.dv_dir else None,
                    )
                    live["bucket"] = int(r.bucket)
                    yield live

        return spec_df.mapInPandas(read_merge, out_schema)

    # ----------------------------------------------------------- point lookup
    def lookup_keys(
        self,
        keys: list,
        manifest: dict | None = None,
        stats: dict | None = None,
        epoch: int | None = None,
    ) -> DataFrame:
        """Point lookup: live rows whose key (the FIRST payload column, by
        the payload-key contract) is in ``keys``. The read plan touches the
        minimum physical footprint the layout allows:

        * **bucket pruning** — each key hashes to exactly one bucket
          (``bucket_expr``), so only those buckets' files are opened;
        * **delta skipping** — on a merge-on-read chain, each delta dir's
          key-bloom sidecar (written by the merge task, ``mor.write_delta``)
          is probed driver-side; links that provably don't mention any
          looked-up key are dropped from the chain before the job launches.
          Pre-bloom dirs (no sidecar) are always kept — skips are never
          wrong, only missed;
        * **row-group pruning** — bases and kept deltas are read with the
          key predicate pushed down; files are sorted by key, so parquet
          min/max statistics skip non-matching row groups.

        At 100 TB this is the difference between "read the bucket" and
        "read a handful of row groups": O(keys) work, independent of table
        size. ``stats`` (optional dict) is filled with the plan's pruning
        counts for observability/tests. Key→bucket assignment runs as one
        metadata-sized local job (len(keys) rows) because the bucket hash is
        Spark's xxhash64, which has no driver-side Python twin.

        ``epoch`` time-travels the lookup to a retained snapshot, same
        contract as ``read_state``."""
        if epoch is not None and manifest is None:
            manifest = self.manifest_for_epoch(epoch)
        m = manifest or self.latest_manifest()
        schema = T.StructType.fromJson(m["schema"])
        key_col = schema.fields[0].name
        key_type = schema.fields[0].dataType
        keys = list(dict.fromkeys(keys))  # de-dup, keep order
        if stats is None:
            stats = {}
        stats.update(
            buckets_read=0, clean_buckets=0, mor_buckets=0,
            delta_dirs_total=0, delta_dirs_skipped=0,
        )
        if not keys:
            empty = self.spark.createDataFrame([], schema)
            return self._to_logical(
                empty.withColumn("bucket", F.lit(None).cast("int")), m
            )

        from georef_ar_etl_spark.sinks.mor import (
            read_bloom_sidecar, sidecar_might_contain,
        )

        kdf = self.spark.createDataFrame(
            [(k,) for k in keys], T.StructType([T.StructField("k", key_type, False)])
        )
        # bucket by the TARGET manifest's count, not the live table's — a
        # rescale after the looked-up epoch must not mis-route the probe
        nb = int(m["n_buckets"])
        by_bucket: dict[int, list] = {}
        for r in kdf.select(
            "k", bucket_expr(F.col("k"), nb).alias("b")
        ).collect():
            by_bucket.setdefault(int(r["b"]), []).append(r["k"])

        deltas_map = m.get("bucket_deltas") or {}
        dvs_map = m.get("bucket_dvs") or {}
        dirs, mor_specs, mor_keys, dv_native = [], [], {}, []
        for b, bkeys in sorted(by_bucket.items()):
            d = m["buckets"].get(str(b))
            dl = deltas_map.get(str(b)) or []
            dvd = dvs_map.get(str(b))
            if not dl and not dvd:
                if d is not None:
                    dirs.append(os.path.join(self.root, d))
                    stats["clean_buckets"] += 1
                continue
            if not dl and dvd and d is not None:
                # chain-free DV bucket: native masked scan keeps the isin
                # pushdown (row-group pruning on the sort-by-key layout);
                # the anti-join drops any masked hit
                dv_native.append((
                    b, self._dir_files(d), os.path.join(self.root, dvd),
                ))
                stats["clean_buckets"] += 1
                continue
            stats["mor_buckets"] += 1
            stats["delta_dirs_total"] += len(dl)
            kept = []
            for dd in dl:
                sc = read_bloom_sidecar(os.path.join(self.root, dd))
                if sc is None or any(
                    sidecar_might_contain(sc, str(k)) for k in bkeys
                ):
                    kept.append(dd)
                else:
                    stats["delta_dirs_skipped"] += 1
            base = self._dir_files(d) if d else []
            dfiles = [f for dd in kept for f in self._dir_files(dd)]
            mor_specs.append((
                b, base, dfiles,
                os.path.join(self.root, dvd) if dvd else None,
            ))
            mor_keys[b] = bkeys
        stats["buckets_read"] = stats["clean_buckets"] + stats["mor_buckets"]

        parts = []
        if dirs:
            parts.append(
                self.spark.read.option("basePath", os.path.join(self.root, DATA_DIR))
                .schema(
                    T.StructType(list(schema.fields))
                    .add("epoch", T.IntegerType())
                    .add("bucket", T.IntegerType())
                )
                .parquet(*dirs)
                .drop("epoch")
            )
        if dv_native:
            parts.append(self._read_dv_masked(dv_native, schema))
        if mor_specs:
            parts.append(self._read_mor(mor_specs, schema, bucket_keys=mor_keys))
        if not parts:
            empty = self.spark.createDataFrame([], schema)
            return self._to_logical(
                empty.withColumn("bucket", F.lit(None).cast("int")), m
            )
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        # the isin lands as a PushedFilter on the clean-bucket and
        # DV-masked scans; on the MOR side it is already enforced inside
        # resolve_live
        return self._to_logical(df.filter(F.col(key_col).isin(keys)), m)

    # ------------------------------------------------------------- changelog
    def read_changes(
        self,
        from_epoch: int,
        to_epoch: int | None = None,
        value_diff: bool = False,
    ) -> DataFrame:
        """Row-level changelog of committed changes in ``(from_epoch,
        to_epoch]`` — the Iceberg incremental-scan / create_changelog_view
        analogue, the read API a downstream incremental consumer (index
        refresh, cache invalidation, replica sync) subscribes to.

        One output row per NET change per epoch: ``op='upsert'`` carries the
        new payload, ``op='delete'`` carries the key with null payload.
        Columns: ``(change_epoch, batch_id, op, <payload cols>, bucket)``.

        Physical strategy, one task per (epoch, touched bucket):

        * **delta epochs** stream their delta files directly — after no-op
          suppression in the merge they contain exactly the effective
          changes, so the changelog read costs only the bytes that changed;
        * **rewrite epochs** diff the bucket's resolved rows against the
          parent epoch (the unavoidable cost of a physical rewrite);
        * **bootstrap / compaction epochs** (``batch_id`` null) emit
          nothing — initial state is read via ``read_state(epoch=...)`` and
          compaction changes nothing visible.

        Every manifest in ``[from_epoch, to_epoch]`` must still be retained
        (KeyError after ``vacuum`` expired one — same contract as time
        travel). Payloads are aligned to the ``to_epoch`` schema (rows from
        pre-evolution epochs read as null in added columns).

        Consumer contract: rows are idempotent upserts/deletes. Delta
        epochs are *event-based* — an update that wrote a value identical
        to the previous one is still emitted (the merge does not compare
        payloads; comparing would require reading the old payload and
        destroy the changed-bytes-only cost model) — while rewrite epochs
        are *value-diff-based* and omit same-value writes. Replaying the
        changelog yields identical state either way.

        ``value_diff=True`` makes the output mode-independent: delta epochs
        are post-filtered against their parent state (each spec resolves
        base+old-chain vs base+new-chain and emits the value diff), so
        same-value writes are suppressed everywhere — for consumers doing
        change ACCOUNTING rather than idempotent apply. Costs reading the
        touched buckets' bases for delta epochs (the exact IO the default
        event-based mode avoids); leave it off for apply-style consumers."""
        head = self.latest_manifest()
        if head is None:
            raise KeyError("no committed manifest — bootstrap the table first")
        if to_epoch is None:
            to_epoch = head["epoch"]
        if to_epoch < from_epoch:
            raise ValueError(f"to_epoch {to_epoch} < from_epoch {from_epoch}")
        # one listing for the whole range (manifest_for_epoch per epoch would
        # rescan the manifests dir O(range x epochs) times)
        by_epoch = {m["epoch"]: m for m in self.manifests()}

        def m_for(e: int) -> dict:
            if e not in by_epoch:
                raise KeyError(
                    f"no committed (or still-retained) manifest for epoch {e}"
                )
            return by_epoch[e]

        schema = T.StructType.fromJson(m_for(to_epoch)["schema"])
        payload_cols = [f.name for f in schema.fields]

        specs = []  # (epoch, batch_id, bucket, kind, nb, nc, ob, oc)
        prev = m_for(from_epoch)
        for e in range(from_epoch + 1, to_epoch + 1):
            m = m_for(e)
            if m["batch_id"] is None:  # bootstrap / compaction / rollback
                if (m.get("metrics") or {}).get("kind") == "rollback":
                    # a rollback rewinds visible state without a batch —
                    # an incremental consumer that already applied the
                    # undone epochs CANNOT be patched forward (Iceberg's
                    # incremental-scan rule: ranges may not cross a
                    # rollback). Fail loudly; the consumer re-bootstraps
                    # from read_state(epoch=...)
                    raise ValueError(
                        f"changelog range ({from_epoch}, {to_epoch}] crosses "
                        f"a rollback at epoch {e} (to epoch "
                        f"{m['metrics'].get('rollback_to')}) — incremental "
                        "consumption cannot cross a rollback; re-bootstrap "
                        "the consumer from a snapshot"
                    )
                prev = m
                continue
            new_deltas = m.get("bucket_deltas") or {}
            old_deltas = prev.get("bucket_deltas") or {}
            new_dvs = m.get("bucket_dvs") or {}
            old_dvs = prev.get("bucket_dvs") or {}
            if m.get("dv_changes"):
                # deletion-vector epoch (delete_keys_dv): the commit records
                # its effective deleted keys as a changelog artifact — the
                # stream costs exactly the keys that changed, like the
                # delta fast path (bucket -1: the artifact carries per-row
                # buckets itself)
                specs.append((
                    e, m["batch_id"], -1, "dvdel",
                    self._dir_files(m["dv_changes"]), [], [], [], None, None,
                ))
            for b in m["touched_buckets"]:
                bs = str(b)
                nchain = new_deltas.get(bs) or []
                ochain = old_deltas.get(bs) or []
                same_base = m["buckets"].get(bs) == prev["buckets"].get(bs)
                same_dv = new_dvs.get(bs) == old_dvs.get(bs)
                if same_base and nchain == ochain:
                    continue  # no-op bucket (a DV change emits via dvdel)
                if (
                    not value_diff
                    and same_base
                    and same_dv
                    and nchain[:-1] == ochain
                    and len(nchain) == len(ochain) + 1
                ):
                    specs.append((
                        e, m["batch_id"], b, "delta",
                        self._dir_files(nchain[-1]), [], [], [], None, None,
                    ))
                else:
                    nb = self._dir_files(m["buckets"][bs]) if m["buckets"].get(bs) else []
                    ob = self._dir_files(prev["buckets"][bs]) if prev["buckets"].get(bs) else []
                    specs.append((
                        e, m["batch_id"], b, "diff",
                        nb, [f for d in nchain for f in self._dir_files(d)],
                        ob, [f for d in ochain for f in self._dir_files(d)],
                        os.path.join(self.root, new_dvs[bs]) if new_dvs.get(bs) else None,
                        os.path.join(self.root, old_dvs[bs]) if old_dvs.get(bs) else None,
                    ))
            prev = m

        out_schema = T.StructType(
            [
                T.StructField("change_epoch", T.IntegerType()),
                T.StructField("batch_id", T.LongType()),
                T.StructField("op", T.StringType()),
            ]
            # delete rows carry null payload → every payload field nullable
            + [T.StructField(f.name, f.dataType, True) for f in schema.fields]
        ).add("bucket", T.IntegerType())
        if not specs:
            return self.spark.createDataFrame([], out_schema)

        from georef_ar_etl_spark.sinks.deletion_vectors import read_dv_map
        from georef_ar_etl_spark.sinks.mor import (
            OP_COL,
            OP_DELETE,
            align_payload,
            resolve_live,
        )

        key = payload_cols[0]  # doc_id by schema contract
        out_cols = [f.name for f in out_schema.fields]

        def canon(v):
            if isinstance(v, (list, tuple, np.ndarray)):
                return tuple(v)
            return None if pd.isna(v) else v

        def emit(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for sp in batches:
                for r in sp.itertuples(index=False):
                    if r.kind == "delta":
                        d = align_payload(
                            pq.read_table(list(r.nb)).to_pandas(), payload_cols
                        )
                        chg = d[payload_cols].copy()
                        chg["op"] = np.where(
                            d[OP_COL].to_numpy() == OP_DELETE, "delete", "upsert"
                        )
                    elif r.kind == "dvdel":
                        # deletion-vector epoch: the dv_changes artifact IS
                        # the effective delete set — (bucket, key) rows
                        d = pq.read_table(list(r.nb)).to_pandas()
                        chg = pd.DataFrame(
                            {c: [None] * len(d) for c in payload_cols}
                        )
                        chg[key] = d[key].to_numpy()
                        chg["op"] = "delete"
                        chg["change_epoch"] = int(r.epoch)
                        chg["batch_id"] = int(r.batch_id)
                        chg["bucket"] = d["bucket"].astype("int32").to_numpy()
                        yield chg.sort_values(key)[out_cols]
                        continue
                    else:
                        new = resolve_live(
                            list(r.nb), list(r.nc), payload_cols, key,
                            dv_map=read_dv_map(r.ndv) if r.ndv else None,
                        )
                        old = resolve_live(
                            list(r.ob), list(r.oc), payload_cols, key,
                            dv_map=read_dv_map(r.odv) if r.odv else None,
                        )
                        ni, oi = new.set_index(key), old.set_index(key)
                        dels = oi.index[~oi.index.isin(ni.index)]
                        ins_mask = ~ni.index.isin(oi.index)
                        common = ni.index[~ins_mask]
                        a, b2 = ni.loc[common], oi.loc[common]
                        diff = np.zeros(len(common), dtype=bool)
                        for c in payload_cols:
                            if c == key:
                                continue
                            diff |= (
                                a[c].map(canon).to_numpy()
                                != b2[c].map(canon).to_numpy()
                            )
                        ups = pd.concat(
                            [ni.loc[ins_mask], a.loc[diff]]
                        ).reset_index()
                        tomb = pd.DataFrame(
                            {c: [None] * len(dels) for c in payload_cols}
                        )
                        tomb[key] = list(dels)
                        chg = pd.concat([ups, tomb], ignore_index=True)
                        chg["op"] = ["upsert"] * (len(chg) - len(dels)) + [
                            "delete"
                        ] * len(dels)
                    chg["change_epoch"] = int(r.epoch)
                    chg["batch_id"] = int(r.batch_id)
                    chg["bucket"] = int(r.bucket)
                    yield chg.sort_values(key)[out_cols]

        spec_df = self.spark.createDataFrame(
            specs,
            "epoch int, batch_id long, bucket int, kind string, "
            "nb array<string>, nc array<string>, ob array<string>, "
            "oc array<string>, ndv string, odv string",
        ).repartition(len(specs))
        # payloads come back under the TO-EPOCH manifest's logical names
        # (consistent with the schema alignment above: one frame, one view)
        return self._to_logical(spec_df.mapInPandas(emit, out_schema), m_for(to_epoch))

    def bucket_file_paths(
        self, buckets: list[int], manifest: dict | None = None
    ) -> dict[int, list[str]]:
        """bucket → absolute parquet file paths (for the copartitioned merge)."""
        m = manifest or self.latest_manifest()
        out: dict[int, list[str]] = {}
        for b in buckets:
            d = m["buckets"].get(str(b))
            if d is None:
                out[b] = []
                continue
            out[b] = self._dir_files(d)
        return out

    def bucket_delta_paths(
        self, buckets: list[int], manifest: dict | None = None
    ) -> dict[int, list[str]]:
        """bucket → absolute delta file paths in epoch (resolution) order."""
        m = manifest or self.latest_manifest()
        deltas_map = m.get("bucket_deltas") or {}
        return {
            b: [f for dd in (deltas_map.get(str(b)) or []) for f in self._dir_files(dd)]
            for b in buckets
        }

    def bucket_dv_paths(
        self, buckets: list[int], manifest: dict | None = None
    ) -> dict[int, str]:
        """bucket → absolute deletion-vector dir (only buckets that have
        one) — what the merge threads into its tasks (operators/
        copart_merge.py ``bucket_dvs``)."""
        m = manifest or self.latest_manifest()
        dvs_map = m.get("bucket_dvs") or {}
        return {
            b: os.path.join(self.root, dvs_map[str(b)])
            for b in buckets
            if dvs_map.get(str(b))
        }

    def epoch_dir(self, epoch: int) -> str:
        d = os.path.join(self.root, DATA_DIR, f"epoch={epoch}")
        os.makedirs(d, exist_ok=True)
        return d

    # ----------------------------------------------------------------- write
    def _write_buckets(
        self,
        df: DataFrame,
        epoch: int,
        n_buckets: int | None = None,
        cluster_by: list[str] | None = None,
        rows_per_file: int | None = None,
        only_buckets: list[int] | None = None,
        bloom_cols: list[str] | None = None,
    ) -> dict[int, str]:
        """Write (payload + bucket) rows under data/epoch=K, one directory per
        bucket, deterministically sorted within files by the payload columns
        in schema order (key-first by the payload-key contract — tables
        keyed by doc_id sort by doc_id first; group-keyed derived tables
        such as ContinuousAggregate's rollup sort by their group key).

        ``cluster_by`` + ``rows_per_file`` is the Iceberg/Delta OPTIMIZE
        clustering move: rows sort by the cluster columns FIRST (payload
        order as tie-break, so bytes stay deterministic) and each bucket
        splits into value-contiguous files of ``rows_per_file`` rows —
        which is what gives the per-file zone maps narrow, disjoint bounds
        a predicate on the cluster column can actually prune against.
        Hash-bucketed single-file bases span the full value range, so
        without clustering only deltas and whole-range misses skip."""
        epoch_dir = os.path.join(self.root, DATA_DIR, f"epoch={epoch}")
        payload_order = [c for c in df.columns if c != "bucket"]
        sort_cols = list(dict.fromkeys((cluster_by or []) + payload_order))
        writer = (
            df.repartition(n_buckets or self.n_buckets, F.col("bucket"))
            .sortWithinPartitions("bucket", *sort_cols)
            .write.mode("overwrite")
            # DYNAMIC partition overwrite: replace only the bucket= dirs
            # this frame carries. Static mode would wipe the whole epoch
            # dir — under optimistic concurrency (write_manifest
            # max_commit_retries) two disjoint-bucket commits may share an
            # epoch-numbered dir, and neither may clobber the other's
            # subdirs. Task-retry determinism is unchanged (the same
            # partitions rewrite to the same bytes).
            .option("partitionOverwriteMode", "dynamic")
        )
        if rows_per_file:
            writer = writer.option("maxRecordsPerFile", int(rows_per_file))
        writer.partitionBy("bucket").parquet(epoch_dir)
        out: dict[int, str] = {}
        keep = None if only_buckets is None else {int(b) for b in only_buckets}
        if os.path.isdir(epoch_dir):
            for name in os.listdir(epoch_dir):
                if name.startswith("bucket="):
                    b = int(name.split("=", 1)[1])
                    if keep is not None and b not in keep:
                        # a concurrent commit's bucket dir sharing this
                        # epoch dir — not ours to report
                        continue
                    out[b] = os.path.join(DATA_DIR, f"epoch={epoch}", name)
                    # zone-map sidecar from the freshly written footers —
                    # kilobytes of metadata per file, no data pages; the
                    # same harvest Iceberg's add_files does at commit time
                    # (bloom_cols additionally reads those columns back
                    # while the files are page-cache warm)
                    full = os.path.join(epoch_dir, name)
                    write_zonemap(
                        full, zonemap_from_footers(full, bloom_cols=bloom_cols)
                    )
        return out

    def write_quarantine(self, df: DataFrame, epoch: int) -> str | None:
        qdir = os.path.join(self.root, QUARANTINE_DIR, f"epoch={epoch}")
        df.write.mode("overwrite").parquet(qdir)
        return os.path.join(QUARANTINE_DIR, f"epoch={epoch}")

    def _bucket_counts(self, dirs: dict[int, str]) -> dict[int, int]:
        counts: dict[int, int] = {}
        for b, rel in dirs.items():
            total = 0
            full = os.path.join(self.root, rel)
            for name in os.listdir(full):
                if name.endswith(".parquet"):
                    total += pq.ParquetFile(os.path.join(full, name)).metadata.num_rows
            counts[b] = total
        return counts

    # ---------------------------------------------------------------- commit
    def write_data(
        self,
        epoch: int,
        new_buckets_df: DataFrame | None,
        n_buckets: int | None = None,
        cluster_by: list[str] | None = None,
        rows_per_file: int | None = None,
        only_buckets: list[int] | None = None,
        bloom_cols: list[str] | None = None,
    ) -> dict[int, str]:
        """Write the epoch's touched-bucket data files (NOT yet committed —
        an orphan epoch dir without a manifest is invisible and harmless).
        ``only_buckets`` bounds the returned bucket map when a concurrent
        commit may share the epoch dir (optimistic-rebase paths)."""
        if new_buckets_df is None:
            return {}
        return self._write_buckets(
            new_buckets_df, epoch, n_buckets,
            cluster_by=cluster_by, rows_per_file=rows_per_file,
            only_buckets=only_buckets, bloom_cols=bloom_cols,
        )

    @staticmethod
    def _link_manifest(path: str, manifest: dict) -> dict | None:
        """Atomically materialize ``manifest`` at ``path``; returns None on
        success or the ALREADY-PRESENT manifest if another writer won.

        Per-writer tmp name: two racing writers sharing one tmp path would
        truncate each other's in-flight file and the link below could
        publish a torn inode — the pid suffix isolates them (and the name
        does not end in ".json", so listings never see it). The ``link``
        (not ``replace``) IS the commit point: it FAILS when the target
        exists, so two writers racing one epoch resolve to
        first-commit-wins, never a silent clobber of the winner's manifest.
        Readers always see a complete file (fully written + fsync'd before
        the link)."""
        tmp = f"{path}.{os.getpid()}.tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=1, sort_keys=True)
            f.flush()
            os.fsync(f.fileno())
        try:
            os.link(tmp, path)
        except FileExistsError:
            os.unlink(tmp)
            with open(path) as f:
                return json.load(f)
        except OSError:
            # filesystem without hard-link support (exFAT, some NFS/SMB,
            # FUSE object-store mounts): fall back to the atomic rename —
            # commit still atomic, but concurrent-duplicate-writer detection
            # degrades to the caller's advisory exists-check
            os.replace(tmp, path)
        else:
            os.unlink(tmp)
        return None

    def _log_commit_metrics(self, manifest: dict) -> None:
        with open(os.path.join(self.root, METRICS_LOG), "a") as f:
            f.write(
                json.dumps(
                    {
                        "epoch": manifest["epoch"],
                        "batch_id": manifest["batch_id"],
                        "total_rows": manifest["total_rows"],
                        "quarantine_rows": manifest.get("quarantine_rows", 0),
                        **(manifest.get("metrics") or {}),
                    },
                    sort_keys=True,
                )
                + "\n"
            )

    # --------------------------------------------------- write-audit-publish
    def _staged_path(self, epoch: int) -> str:
        sdir = os.path.join(self.root, STAGED_DIR)
        os.makedirs(sdir, exist_ok=True)
        return os.path.join(sdir, f"epoch-{epoch:010d}.json")

    def staged_manifests(self) -> list[dict]:
        """Pending (staged, unpublished) manifests, oldest first. Not cached:
        the staging dir is tiny (single-digit entries) and mutable."""
        sdir = os.path.join(self.root, STAGED_DIR)
        out = []
        if os.path.isdir(sdir):
            for name in sorted(os.listdir(sdir)):
                if name.startswith("epoch-") and name.endswith(".json"):
                    try:
                        with open(os.path.join(sdir, name)) as f:
                            out.append(json.load(f))
                    except FileNotFoundError:
                        continue  # resolved by another process mid-listing
        return out

    def staged_manifest(self, epoch: int | None = None) -> dict:
        """The staged manifest at ``epoch`` (or THE pending one when the
        epoch is omitted and exactly one is pending)."""
        staged = self.staged_manifests()
        if epoch is not None:
            for s in staged:
                if s["epoch"] == epoch:
                    return s
            raise KeyError(f"no staged manifest for epoch {epoch}")
        if len(staged) != 1:
            raise KeyError(
                f"{len(staged)} staged manifests pending — pass the epoch"
            )
        return staged[0]

    def publish_staged(self, epoch: int | None = None) -> dict:
        """Atomically promote a staged manifest to the live commit head —
        the audit passed. The WAP publish step (Iceberg's fast-forward of
        ``main`` onto the audit branch).

        The staged snapshot was built against its recorded ``parent``; if
        the live head moved past that parent (another writer committed),
        the staged merge result is stale and publishing it would silently
        drop the interleaved commit — that is a ConflictError, resolved by
        abandoning and re-staging on the new head."""
        s = self.staged_manifest(epoch)
        head = self.latest_manifest()
        head_epoch = head["epoch"] if head else None
        if s.get("parent") != head_epoch:
            raise ConflictError(
                f"staged epoch {s['epoch']} was built on parent "
                f"{s.get('parent')} but the live head is now {head_epoch} — "
                f"abandon_staged() and re-stage on the current head"
            )
        manifest = {k: v for k, v in s.items() if k != "staged"}
        manifest["committed_unix"] = time.time()
        if (manifest.get("metrics") or {}).get("kind") == "stage":
            # a published WAP commit is an apply to every downstream reader;
            # the flag keeps the audit provenance visible in snapshots_df
            manifest["metrics"] = {
                **manifest["metrics"], "kind": "apply", "wap_published": True,
            }
        path = self._manifest_path(manifest["epoch"])
        existing = self._link_manifest(path, manifest)
        if existing is not None:
            if existing.get("batch_digest") == manifest["batch_digest"]:
                os.unlink(self._staged_path(s["epoch"]))
                return existing  # duplicate publisher — idempotent
            raise ConflictError(
                f"epoch {s['epoch']} was committed concurrently with a "
                f"different digest — abandon_staged() the stale snapshot"
            )
        self._manifest_cache[os.path.basename(path)] = manifest
        self._latest_cache = manifest
        self._latest_token = None
        os.unlink(self._staged_path(s["epoch"]))
        self._log_commit_metrics(manifest)
        return manifest

    def abandon_staged(self, epoch: int | None = None) -> dict:
        """Drop a staged snapshot — the audit failed. Removes the staged
        manifest AND the epoch's (otherwise-orphaned) data + quarantine
        directories, so an abandoned batch leaves zero bytes behind and the
        epoch number is free for the corrected batch.

        Data dirs are only deleted when no LIVE manifest exists at the
        epoch (a concurrent winner's commit owns ``data/epoch=K`` then —
        its files must survive; ours are indistinguishable inside, so the
        dir is left for ``vacuum``-style GC of unreferenced files)."""
        import shutil

        s = self.staged_manifest(epoch)
        e = s["epoch"]
        removed = []
        if not os.path.exists(self._manifest_path(e)):
            for rel in (
                os.path.join(DATA_DIR, f"epoch={e}"),
                os.path.join(QUARANTINE_DIR, f"epoch={e}"),
            ):
                full = os.path.join(self.root, rel)
                if os.path.isdir(full):
                    shutil.rmtree(full)
                    removed.append(rel)
        os.unlink(self._staged_path(e))
        return {
            "epoch": e,
            "batch_id": s["batch_id"],
            "removed_dirs": removed,
        }

    def write_manifest(
        self,
        epoch: int,
        schema: T.StructType,
        written: dict[int, str],
        touched_buckets: list[int],
        batch_id: int | None,
        batch_digest: str | None,
        metrics: dict,
        quarantine_path: str | None = None,
        quarantine_rows: int = 0,
        written_counts: dict[int, int] | None = None,
        written_deltas: dict[int, list[str]] | None = None,
        rescale_to: int | None = None,
        staged: bool = False,
        written_dvs: dict[int, str] | None = None,
        dv_changes: str | None = None,
        max_commit_retries: int = 0,
        colmap: dict[str, str] | None = None,
        dropped_cols: list[str] | None = None,
        bloom_cols: list[str] | None = None,
    ) -> dict:
        """Atomically publish the manifest — THE commit point. Idempotent:
        same epoch + same digest returns the existing manifest.

        ``max_commit_retries`` > 0 enables **optimistic concurrency** with
        disjoint-bucket rebase (Iceberg's snapshot-isolation commit
        protocol, the contract that lets a maintenance commit — compaction,
        a deletion-vector erasure — race the single stream writer): when
        another commit won our target epoch, the rebase re-reads the new
        head and retries at head+1 — data files are untouched (manifests
        reference them by path, not by epoch number) and the parent maps
        are re-read inside the retry, so the interloper's buckets carry
        correctly. The rebase REFUSES (ConflictError, like today) whenever
        it cannot prove isolation: any interloper touching one of OUR
        buckets, changing the schema or bucket count, a rescale/rollback in
        between, or the same batch_id with different content.

        ``written_counts``: per-bucket row counts if the writer already knows
        them (the copartitioned merge returns them from the tasks); otherwise
        they are read from the parquet footers.

        ``written_deltas``: for merge-on-read commits, touched bucket → its
        FULL delta-dir list after this epoch (relative paths, resolution
        order). A touched bucket absent from the map had its base rewritten,
        which clears any pending chain.

        ``written_dvs``: bucket → its (merged) deletion-vector dir after
        this epoch (relative path, sinks/deletion_vectors.py). Buckets NOT
        in the map inherit the parent's DV — unless this epoch rewrote
        their base (a rewrite materializes live rows only, so the mask is
        spent). ``dv_changes``: relative path of this epoch's effective
        DV-deleted keys (the changelog artifact ``read_changes`` streams).

        ``staged=True`` is the write-audit-publish (WAP) staging half: the
        manifest is written — with the same atomicity — into the staging
        directory instead of the live one, so NO reader (``latest_manifest``,
        ``read_state``, ``read_changes``, downstream changelog consumers)
        can observe the epoch until ``publish_staged`` promotes it. The
        Iceberg analogue is committing to an audit branch under
        ``write.wap.enabled`` and fast-forwarding ``main`` after validation."""
        path = self._manifest_path(epoch)
        if os.path.exists(path):
            with open(path) as f:
                existing = json.load(f)
            if existing.get("batch_digest") == batch_digest:
                return existing  # already committed — no-op re-apply
            if not staged and max_commit_retries > 0:
                new_epoch = self._rebase_epoch(
                    epoch, touched_buckets, schema, batch_id, batch_digest
                )
                return self.write_manifest(
                    new_epoch, schema, written, touched_buckets, batch_id,
                    batch_digest, {**metrics, "rebased_from_epoch": epoch},
                    quarantine_path, quarantine_rows, written_counts,
                    written_deltas, rescale_to, staged, written_dvs,
                    dv_changes, max_commit_retries - 1, colmap, dropped_cols,
                    bloom_cols,
                )
            raise ConflictError(
                f"epoch {epoch} already committed with a different digest"
            )
        if staged:
            spath = self._staged_path(epoch)
            if os.path.exists(spath):
                with open(spath) as f:
                    existing = json.load(f)
                if existing.get("batch_digest") == batch_digest:
                    return existing  # already staged — no-op re-stage
                raise ConflictError(
                    f"epoch {epoch} already staged with a different digest — "
                    f"publish_staged() or abandon_staged() it first"
                )

        parent = self.latest_manifest()
        if rescale_to is not None or parent is None:
            # fresh maps: a brand-new table, or a rescale (every row was
            # rewritten under the new bucket function — the parent's maps
            # are in the OLD numbering and must not carry over)
            n = rescale_to if rescale_to is not None else self.n_buckets
            buckets: dict[str, str | None] = {str(b): None for b in range(n)}
            bucket_counts: dict[str, int] = {str(b): 0 for b in range(n)}
            bucket_deltas: dict[str, list[str]] = {}
            bucket_dvs: dict[str, str] = {}
        else:
            buckets = dict(parent["buckets"])
            bucket_counts = dict(parent["bucket_counts"])
            # sparse map: only buckets with a pending delta chain appear
            bucket_deltas = dict(parent.get("bucket_deltas") or {})
            bucket_dvs = dict(parent.get("bucket_dvs") or {})
        new_counts = written_counts if written_counts is not None else self._bucket_counts(written)
        for b in touched_buckets:
            # a REWRITTEN base (path differs from the parent's) spends the
            # bucket's deletion vector: the new base holds live rows only.
            # A CARRIED base (delta-mode / noop merge) keeps it.
            if written.get(b) != buckets.get(str(b)):
                bucket_dvs.pop(str(b), None)
            buckets[str(b)] = written.get(b)  # None → bucket emptied out
            bucket_counts[str(b)] = new_counts.get(b, 0)
            dl = (written_deltas or {}).get(b) or []
            if dl:
                bucket_deltas[str(b)] = dl
            else:
                bucket_deltas.pop(str(b), None)  # base rewrite clears the chain
        for b, rel in (written_dvs or {}).items():
            bucket_dvs[str(b)] = rel

        # logical↔physical mapping inherits unless this commit changes it
        # (rename/drop, or apply_batch allocating a fresh physical name)
        if colmap is None:
            colmap = (parent or {}).get("colmap") or {}
        if dropped_cols is None:
            dropped_cols = (parent or {}).get("dropped_cols") or []
        # column-bloom list inherits the same way (compact(bloom_cols=…)
        # sets it; [] explicitly clears it)
        if bloom_cols is None:
            bloom_cols = (parent or {}).get("bloom_cols") or []

        manifest = {
            "epoch": epoch,
            "parent": parent["epoch"] if parent else None,
            "batch_id": batch_id,
            "batch_digest": batch_digest,
            "schema": schema.jsonValue(),
            "n_buckets": rescale_to if rescale_to is not None else self.n_buckets,
            "buckets": buckets,
            "bucket_deltas": bucket_deltas,
            "bucket_dvs": bucket_dvs,
            "dv_changes": dv_changes,
            "bucket_counts": bucket_counts,
            "total_rows": sum(bucket_counts.values()),
            "touched_buckets": sorted(touched_buckets),
            "quarantine_path": quarantine_path if quarantine_rows else None,
            "quarantine_rows": quarantine_rows,
            "metrics": metrics,
            "committed_unix": time.time(),
        }
        if colmap:
            manifest["colmap"] = colmap
        if dropped_cols:
            manifest["dropped_cols"] = dropped_cols
        if bloom_cols:
            manifest["bloom_cols"] = list(bloom_cols)
        if staged:
            manifest["staged"] = True
            existing = self._link_manifest(self._staged_path(epoch), manifest)
            if existing is not None:
                if existing.get("batch_digest") == batch_digest:
                    return existing  # duplicate writer staged the same batch
                raise ConflictError(
                    f"epoch {epoch} was staged concurrently with a different "
                    f"digest — two writers are staging different batches"
                )
            return manifest

        existing = self._link_manifest(path, manifest)
        if existing is not None:
            if existing.get("batch_digest") == batch_digest:
                return existing  # duplicate writer committed the same batch
            if max_commit_retries > 0:
                new_epoch = self._rebase_epoch(
                    epoch, touched_buckets, schema, batch_id, batch_digest
                )
                return self.write_manifest(
                    new_epoch, schema, written, touched_buckets, batch_id,
                    batch_digest, {**metrics, "rebased_from_epoch": epoch},
                    quarantine_path, quarantine_rows, written_counts,
                    written_deltas, rescale_to, staged, written_dvs,
                    dv_changes, max_commit_retries - 1, colmap, dropped_cols,
                    bloom_cols,
                )
            raise ConflictError(
                f"epoch {epoch} was committed concurrently with a different "
                f"digest — two writers are applying different batches to one "
                f"table (the single-writer contract is violated)"
            )
        self._manifest_cache[os.path.basename(path)] = manifest
        # our commit is the new head; token None forces one cheap
        # validation listing on the next read (a concurrent commit landing
        # right after ours must not be masked by our own freshness token)
        self._latest_cache = manifest
        self._latest_token = None
        self._log_commit_metrics(manifest)
        return manifest

    def _rebase_epoch(
        self,
        epoch: int,
        touched_buckets: list[int],
        schema: T.StructType,
        batch_id: int | None,
        batch_digest: str | None,
    ) -> int:
        """Snapshot-isolation check for an optimistic commit rebase: every
        commit that landed AT or AFTER our target epoch must be provably
        isolated from ours — disjoint touched buckets, identical schema and
        bucket count, no rescale/rollback, not our own batch id under
        different content. Returns the next free epoch; raises
        ConflictError when isolation cannot be proven (the safe default —
        a refused rebase is exactly today's single-writer behavior)."""
        # bypass the freshness cache: the whole point is that someone else
        # just committed
        self._latest_token = None
        ours = set(touched_buckets)
        ours_schema = schema.jsonValue()
        head_epoch = epoch - 1
        for m in self.manifests():
            if m["epoch"] < epoch:
                continue
            head_epoch = max(head_epoch, m["epoch"])
            kind = (m.get("metrics") or {}).get("kind")
            if kind in ("rescale", "rollback", "rename_column", "drop_column"):
                raise ConflictError(
                    f"cannot rebase commit over a {kind} at epoch "
                    f"{m['epoch']} — re-read the table and re-derive"
                )
            if m["batch_id"] is not None and m["batch_id"] == batch_id:
                raise ConflictError(
                    f"batch {batch_id} was committed concurrently at epoch "
                    f"{m['epoch']} with a different digest"
                )
            if m["schema"] != ours_schema:
                raise ConflictError(
                    f"cannot rebase: epoch {m['epoch']} changed the schema"
                )
            if int(m["n_buckets"]) != self.n_buckets:
                raise ConflictError(
                    f"cannot rebase: epoch {m['epoch']} changed the bucket "
                    f"count"
                )
            inter = ours & set(m["touched_buckets"])
            if inter:
                raise ConflictError(
                    f"cannot rebase: epoch {m['epoch']} also touched "
                    f"bucket(s) {sorted(inter)} — overlapping writes need "
                    f"a re-read + re-apply"
                )
        return head_epoch + 1

    def commit(
        self,
        epoch: int,
        schema: T.StructType,
        new_buckets_df: DataFrame | None,
        touched_buckets: list[int],
        batch_id: int | None,
        batch_digest: str | None,
        metrics: dict,
        quarantine_path: str | None = None,
        quarantine_rows: int = 0,
    ) -> dict:
        """Convenience: write data then atomically publish the manifest."""
        path = self._manifest_path(epoch)
        if os.path.exists(path):
            with open(path) as f:
                existing = json.load(f)
            if existing.get("batch_digest") == batch_digest:
                return existing
            raise ConflictError(
                f"epoch {epoch} already committed with a different digest"
            )
        written = self.write_data(epoch, new_buckets_df)
        return self.write_manifest(
            epoch, schema, written, touched_buckets, batch_id, batch_digest,
            metrics, quarantine_path, quarantine_rows,
        )

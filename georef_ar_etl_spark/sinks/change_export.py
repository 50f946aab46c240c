"""Incremental change-feed EXPORT: the engine's changelog shipped to a
plain-parquet landing zone for downstream systems that cannot read the
snapshot-table format (a warehouse loader, a search indexer, another
lake) — the outbox side of CDC, mirroring the reference's pattern of
publishing per-run changed-ID report files for downstream consumers
(/root/reference/georef_ar_etl/transformers.py:145-149) as a scalable
file feed instead of a log line.

Layout under ``out_root``::

    _export_ledger.json          # fsync'd atomic ledger — source of truth
    snapshot-<epoch>/            # full-state parquet (bootstrap / re-base)
    changes-<from>-<to>/         # changelog parquet for (from, to]

Contracts:

* **Exports are self-contained copies** — folding the latest snapshot plus
  every subsequent change range reproduces the table state even after the
  source table ``vacuum``-expired those epochs. Archive retention is the
  exporter's, not the table's.
* **Atomic + idempotent**: data directories are written first (Spark
  overwrite), the ledger is replaced atomically (tmp + fsync + rename)
  last. A crash between the two leaves an orphan directory that the next
  ``export()`` removes and recomputes — the ledger alone defines what was
  published. ``export()`` with nothing new committed is a no-op.
* **Rollback-aware**: a changelog range may not cross a table rollback
  (``read_changes`` raises); the exporter catches that and re-bases with
  a fresh snapshot export, exactly the re-bootstrap rule every other
  changelog consumer follows.
* Single writer, like the engine itself.

Scale posture: each incremental export moves only the changed rows
(delta-epoch changelog reads cost only changed bytes); the snapshot
export is one distributed parquet write. Nothing is collected to the
driver except the ledger metadata and the per-export row counts (one
``count()`` per export, on the already-written output).
"""

from __future__ import annotations

import json
import os
import re
import shutil

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_DIR_RE = re.compile(r"^(snapshot-\d+|changes-\d+-\d+)$")


def _ledger_path(out_root: str) -> str:
    return os.path.join(out_root, "_export_ledger.json")


def read_export_ledger(out_root: str) -> list[dict]:
    p = _ledger_path(out_root)
    if not os.path.exists(p):
        return []
    with open(p, encoding="utf-8") as f:
        return json.load(f)


def _write_ledger(out_root: str, entries: list[dict]) -> None:
    p = _ledger_path(out_root)
    tmp = p + ".tmp"
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump(entries, f, sort_keys=True, indent=0)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, p)


class ChangeFeedExporter:
    """Exports a CdcEngine table's state + changelog as the layout above.

    ``export()`` after each commit window; ``folded_state()`` is the
    reference downstream consumer (and the verification tool): it rebuilds
    the table state purely from the exported files.
    """

    def __init__(self, engine, out_root: str, key_col: str = "doc_id"):
        self.engine = engine
        self.out_root = out_root
        self.key_col = key_col
        os.makedirs(out_root, exist_ok=True)

    # ------------------------------------------------------------- producer
    def _remove_orphans(self, entries: list[dict]) -> list[str]:
        referenced = {e["path"] for e in entries}
        removed = []
        for name in os.listdir(self.out_root):
            full = os.path.join(self.out_root, name)
            if (
                os.path.isdir(full)
                and _DIR_RE.match(name)
                and name not in referenced
            ):
                shutil.rmtree(full)
                removed.append(name)
        return removed

    def _publish(self, df: DataFrame, path: str, entry: dict) -> dict:
        full = os.path.join(self.out_root, path)
        df.write.mode("overwrite").parquet(full)
        rows = self.engine.spark.read.parquet(full).count()
        entries = read_export_ledger(self.out_root)
        entry = {**entry, "seq": len(entries), "path": path, "rows": rows}
        _write_ledger(self.out_root, entries + [entry])
        return entry

    def export(self) -> dict:
        head = self.engine.table.latest_manifest()
        if head is None:
            raise RuntimeError("nothing to export — bootstrap the table first")
        head_epoch = head["epoch"]
        entries = read_export_ledger(self.out_root)
        orphans = self._remove_orphans(entries)
        last = entries[-1]["to_epoch"] if entries else None
        if last == head_epoch:
            return {"status": "noop", "to_epoch": head_epoch, "orphans_removed": orphans}
        if last is None:
            entry = self._publish(
                self.engine.state(epoch=head_epoch),
                f"snapshot-{head_epoch}",
                {"kind": "snapshot", "from_epoch": None, "to_epoch": head_epoch,
                 "reason": "bootstrap"},
            )
        else:
            try:
                feed = self.engine.changes(last, head_epoch)
            except ValueError:
                # range crosses a rollback — re-base the feed on a snapshot
                entry = self._publish(
                    self.engine.state(epoch=head_epoch),
                    f"snapshot-{head_epoch}",
                    {"kind": "snapshot", "from_epoch": None,
                     "to_epoch": head_epoch, "reason": "rollback_rebootstrap"},
                )
                return {**entry, "status": "exported", "orphans_removed": orphans}
            entry = self._publish(
                feed,
                f"changes-{last}-{head_epoch}",
                {"kind": "changes", "from_epoch": last, "to_epoch": head_epoch,
                 "reason": "incremental"},
            )
        return {**entry, "status": "exported", "orphans_removed": orphans}

    # ------------------------------------------- streaming consumer protocol
    @property
    def last_source_epoch(self) -> int | None:
        """DerivedValueIndex-protocol adapter: the exporter plugs into
        ``stream_apply(consumers=[...])`` like any changelog consumer —
        each trigger ships its new epoch range to the feed. Bootstrap by
        calling ``export()`` once before attaching (mirrors the index
        consumers' explicit bootstrap rule). On rollback the stream's
        changelog read fails loudly like every consumer; recover with a
        direct ``export()``, which re-bases on a snapshot."""
        entries = read_export_ledger(self.out_root)
        return entries[-1]["to_epoch"] if entries else None

    def refresh(self, changes_df: DataFrame, source_epoch: int) -> dict:
        """Publish an already-derived changelog range (the stream hands the
        same frame ``export()`` would read). Idempotent per the ledger: a
        range already at or before the last export is a no-op."""
        last = self.last_source_epoch
        if last is None:
            raise RuntimeError("call export() once to bootstrap the feed")
        if source_epoch <= last:
            return {"status": "noop", "to_epoch": last}
        self._remove_orphans(read_export_ledger(self.out_root))
        return self._publish(
            changes_df,
            f"changes-{last}-{source_epoch}",
            {"kind": "changes", "from_epoch": last, "to_epoch": source_epoch,
             "reason": "stream"},
        )

    # ------------------------------------------------------------- consumer
    def folded_state(self) -> DataFrame:
        """The reference downstream apply: latest exported snapshot + every
        later change range folded in (latest net change per key wins within
        a range; ``delete`` removes, ``upsert`` replaces). Reads ONLY the
        export directory — valid after the source table expired the
        underlying epochs, or on a machine without the table at all."""
        spark = self.engine.spark
        entries = read_export_ledger(self.out_root)
        if not entries:
            raise RuntimeError("no exports in ledger")
        snap_i = max(i for i, e in enumerate(entries) if e["kind"] == "snapshot")
        state = spark.read.parquet(
            os.path.join(self.out_root, entries[snap_i]["path"])
        )
        key = self.key_col
        for e in entries[snap_i + 1:]:
            feed = spark.read.parquet(os.path.join(self.out_root, e["path"]))
            payload = [
                c for c in feed.columns
                if c not in ("change_epoch", "batch_id", "op", "bucket")
            ]
            # changelog payloads follow the range's END schema — widen the
            # carried state with nulls for columns evolution added
            for c in payload:
                if c not in state.columns:
                    state = state.withColumn(
                        c, F.lit(None).cast(feed.schema[c].dataType)
                    )
            # net change per key across the range: highest change_epoch wins
            # (read_changes emits one net row per key per epoch)
            latest = (
                feed.withColumn(
                    "_rn",
                    F.row_number().over(
                        Window.partitionBy(key).orderBy(F.desc("change_epoch"))
                    ),
                )
                .filter(F.col("_rn") == 1)
                .drop("_rn")
            )
            ups = latest.filter(F.col("op") == "upsert").select(payload)
            state = (
                state.select(payload)
                .join(latest.select(key).distinct(), key, "left_anti")
                .unionByName(ups)
            )
        return state

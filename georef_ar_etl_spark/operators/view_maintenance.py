"""Incrementally-maintained JOIN view: V = fact ⋈ dimension, refreshed from
BOTH tables' changelogs — the materialized-view side of CDC (Materialize /
Flink delta-join territory, here as a changelog consumer over snapshot
tables).

The naive algebra Δ(A⋈B) = ΔA⋈B ∪ A⋈ΔB ∪ ΔA⋈ΔB needs careful bookkeeping to
stay convergent under interleavings; this implementation uses the
affected-keys form instead: each refresh computes the set of FACT keys whose
view row could have changed — keys touched by ΔA, plus fact rows whose join
value points at a dim key touched by ΔB — and recomputes exactly those rows
from the CURRENT state of both sides. Recompute-from-base is idempotent and
order-insensitive (re-running a crashed refresh lands the same bytes), and
its cost is O(affected keys), never O(|A|).

Physical plan per refresh (one task wave each):

* ΔA / ΔB collapse to net-latest per key (one shuffle each, change-sized);
* the ΔB fan-out reads A through ``read_state(where=[(join_col, 'in',
  changed_dim_keys)])`` — zone maps prune dirs/files where the layout
  allows; cluster A by the join column (``compact(cluster_by=[join_col])``)
  to make this the file-pruned read it should be at scale;
* affected fact rows come from a bucket-pruned scan of A semi-joined by the
  affected keys (the DerivedValueIndex lookup discipline — the pruned bucket
  read never shuffles; the change-sized side broadcasts);
* the dim side is trimmed to the affected rows' join values, then broadcast
  into the rebuild join (dimension rows per refresh are change-bounded);
* the view commits via the touched-bucket COW merge (untouched buckets carry
  over by reference, zero IO).

Left-join semantics: a fact row whose dim key is missing (or whose dim row
was deleted) keeps its view row with NULL dim columns — deleting facts is
ΔA's job, never ΔB's. Reference analogue: the reference denormalizes names
by joining staging tables against dimension tables each run
(georef_ar_etl/streets.py:45-76); this maintains that join continuously.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from georef_ar_etl_spark.operators.dedup_events import latest_per_key
from georef_ar_etl_spark.sinks.snapshot_table import SnapshotTable, bucket_expr

_META = ("change_epoch", "batch_id", "op", "bucket")


def _net(changes: DataFrame, key: str) -> DataFrame:
    payload = [c for c in changes.columns if c not in _META]
    return latest_per_key(
        changes.select("op", "change_epoch", *payload),
        key=key,
        order="change_epoch",
    )


class JoinView:
    """Materialized ``fact LEFT JOIN dim ON fact[join_col] = dim[key]``,
    keyed by the fact key, maintained epoch-by-epoch from two changelogs.

    ``dim_cols`` are the dimension payload columns carried into the view
    (join key excluded — the fact's ``join_col`` already holds it); they
    land nullable (left join)."""

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        fact_schema: T.StructType,
        dim_schema: T.StructType,
        join_col: str,
        n_buckets: int = 16,
    ):
        self.spark = spark
        self.join_col = join_col
        self.fact_key = fact_schema.fields[0].name
        self.dim_key = dim_schema.fields[0].name
        if join_col not in {f.name for f in fact_schema.fields}:
            raise ValueError(f"join_col {join_col!r} not in fact schema")
        self.fact_cols = [f.name for f in fact_schema.fields]
        self.dim_cols = [f.name for f in dim_schema.fields if f.name != self.dim_key]
        overlap = set(self.dim_cols) & set(self.fact_cols)
        if overlap:
            raise ValueError(f"dim payload columns collide with fact: {overlap}")
        self.schema = T.StructType(
            list(fact_schema.fields)
            + [
                T.StructField(f.name, f.dataType, True)
                for f in dim_schema.fields
                if f.name != self.dim_key
            ]
        )
        self.table = SnapshotTable(spark, root, n_buckets)

    # ------------------------------------------------------------ bookkeeping
    @property
    def last_source_epochs(self) -> tuple[int, int] | None:
        """(fact_epoch, dim_epoch) the view reflects; next refresh consumes
        ``fact.changes(fact_epoch, a1)`` and ``dim.changes(dim_epoch, b1)``."""
        m = self.table.latest_manifest()
        if m is None:
            return None
        return int(m["metrics"]["fact_epoch"]), int(m["metrics"]["dim_epoch"])

    def _commit(self, df, touched, fact_epoch: int, dim_epoch: int, kind: str):
        m = self.table.latest_manifest()
        epoch = 0 if m is None else m["epoch"] + 1
        self.table.commit(
            epoch=epoch,
            schema=self.schema,
            new_buckets_df=df,
            touched_buckets=touched,
            batch_id=None,
            batch_digest=f"joinview:{kind}:{fact_epoch}:{dim_epoch}",
            metrics={
                "kind": kind, "fact_epoch": fact_epoch, "dim_epoch": dim_epoch,
            },
        )

    def _joined(self, fact_rows: DataFrame, dim_state: DataFrame) -> DataFrame:
        """fact rows ⋈ dim (dim trimmed to the join values present, then
        broadcast — change-bounded build side)."""
        dim = dim_state.select(
            F.col(self.dim_key).alias("_jk"), *self.dim_cols
        )
        trimmed = dim.join(
            F.broadcast(
                fact_rows.select(F.col(self.join_col).alias("_jk")).distinct()
            ),
            "_jk",
            "left_semi",
        )
        return (
            fact_rows.join(
                F.broadcast(trimmed),
                fact_rows[self.join_col] == trimmed["_jk"],
                "left",
            )
            .drop("_jk")
            .select(*self.fact_cols, *self.dim_cols)
        )

    # -------------------------------------------------------------- bootstrap
    def bootstrap(
        self,
        fact_state: DataFrame,
        dim_state: DataFrame,
        fact_epoch: int = 0,
        dim_epoch: int = 0,
    ) -> None:
        """Full join ONCE at the source epochs the view starts from."""
        if self.table.latest_manifest() is not None:
            return
        df = self._joined(
            fact_state.select(*self.fact_cols), dim_state
        ).withColumn("bucket", bucket_expr(F.col(self.fact_key), self.table.n_buckets))
        self._commit(
            df, list(range(self.table.n_buckets)), fact_epoch, dim_epoch,
            "bootstrap",
        )

    # ---------------------------------------------------------------- refresh
    def refresh(
        self,
        fact_table: SnapshotTable,
        dim_table: SnapshotTable,
        fact_changes: DataFrame | None,
        fact_epoch: int,
        dim_changes: DataFrame | None,
        dim_epoch: int,
    ) -> dict:
        """Advance the view to (fact_epoch, dim_epoch) given the changelog
        ranges since ``last_source_epochs``. Either side's range may be
        empty/None. Affected keys are recomputed from the CURRENT states
        (read at the target epochs), so a re-run after a crash is an
        idempotent rewrite of the same buckets."""
        # ---- affected fact keys
        parts = []
        if fact_changes is not None:
            parts.append(_net(fact_changes, self.fact_key).select(self.fact_key))
        n_dim_keys = 0
        if dim_changes is not None:
            dkeys = (
                _net(dim_changes, self.dim_key)
                .select(F.col(self.dim_key))
                .distinct()
            )
            # changed dim keys are change-bounded; the collect feeds the
            # zone-map-pruned fan-out read (an 'in' predicate needs
            # literals at plan time)
            dk = [r[self.dim_key] for r in dkeys.collect()]
            n_dim_keys = len(dk)
            if dk:
                fan = fact_table.read_state(
                    manifest=fact_table.manifest_for_epoch(fact_epoch),
                    where=[(self.join_col, "in", dk)],
                ).select(self.fact_key)
                parts.append(fan)
        if not parts:
            self._commit(None, [], fact_epoch, dim_epoch, "refresh")
            return {"affected": 0, "dim_keys": 0}
        affected = parts[0]
        for p in parts[1:]:
            affected = affected.unionByName(p)
        affected = (
            affected.distinct()
            .withColumn("bucket", bucket_expr(F.col(self.fact_key), self.table.n_buckets))
            .localCheckpoint(eager=True)
        )
        touched = sorted(
            r["bucket"] for r in affected.select("bucket").distinct().collect()
        )
        if not touched:
            self._commit(None, [], fact_epoch, dim_epoch, "refresh")
            return {"affected": 0, "dim_keys": n_dim_keys}

        # ---- recompute affected rows from current state (both sides)
        fact_buckets = sorted(
            {
                r["bucket"]
                for r in affected.select(
                    bucket_expr(
                        F.col(self.fact_key), fact_table.n_buckets
                    ).alias("bucket")
                )
                .distinct()
                .collect()
            }
        )
        cur = (
            fact_table.read_state(
                buckets=fact_buckets,
                manifest=fact_table.manifest_for_epoch(fact_epoch),
            )
            .select(*self.fact_cols)
            .join(F.broadcast(affected.select(self.fact_key)), self.fact_key, "left_semi")
            .localCheckpoint(eager=True)
        )
        dim_state = dim_table.read_state(
            manifest=dim_table.manifest_for_epoch(dim_epoch)
        )
        ups = self._joined(cur, dim_state).withColumn(
            "bucket", bucket_expr(F.col(self.fact_key), self.table.n_buckets)
        )
        # facts deleted since: affected keys with no current row
        dels = affected.join(
            cur.select(self.fact_key), self.fact_key, "left_anti"
        ).select(self.fact_key, "bucket")

        # ---- touched-bucket COW merge into the view
        cols = [f.name for f in self.schema.fields] + ["bucket"]
        old = self.table.read_state(buckets=touched)
        keep = old.join(
            F.broadcast(affected.select(self.fact_key)), self.fact_key, "left_anti"
        )
        new = keep.select(*cols).unionByName(ups.select(*cols))
        self._commit(new, touched, fact_epoch, dim_epoch, "refresh")
        return {
            "affected": int(affected.count()),
            "dim_keys": n_dim_keys,
            "deleted": int(dels.count()),
        }

    # ------------------------------------------------------------------ query
    def view(self) -> DataFrame:
        return self.table.read_state().drop("bucket")

    # -------------------------------------------------------------- streaming
    def as_stream_consumer(
        self, fact_table: SnapshotTable, dim_table: SnapshotTable
    ) -> "_FactStreamConsumer":
        """Adapter implementing stream_apply's changelog-consumer protocol
        (``last_source_epoch`` + ``refresh(changes, epoch)``): the FACT side
        advances per streaming trigger; the dim side stays at its recorded
        epoch (dimensions move rarely — apply dim ranges out-of-band via
        ``JoinView.refresh`` between triggers). The view commits once per
        refresh, so there is no torn two-table state to heal
        (``pending_refresh_epoch`` intentionally absent)."""
        return _FactStreamConsumer(self, fact_table, dim_table)


class _FactStreamConsumer:
    def __init__(self, view: JoinView, fact_table, dim_table):
        self._v = view
        self._fact = fact_table
        self._dim = dim_table

    @property
    def last_source_epoch(self) -> int | None:
        eps = self._v.last_source_epochs
        return None if eps is None else eps[0]

    def refresh(self, changes_df: DataFrame, source_epoch: int) -> dict:
        _a, b = self._v.last_source_epochs
        return self._v.refresh(
            self._fact, self._dim, changes_df, source_epoch, None, b
        )

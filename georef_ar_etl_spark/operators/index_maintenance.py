"""Incremental maintenance of derived indexes from the table's changelog.

The point of an incremental changelog (SnapshotTable.read_changes) is that
downstream artifacts refresh from the CHANGES, never by rescanning the
corpus — at 100 TB you cannot recompute a dedup fingerprint table or an
ANN index per epoch. Reference analogue: each extraction run reports its
new/updated/deleted ID lists precisely so downstream consumers can act
incrementally (georef_ar_etl/transformers.py:145-149, context.py:276-293).

``FingerprintIndex`` maintains the exact-dedup index of a CDC state table
(operators/doc_dedup.py's fingerprint-group family) as TWO derived snapshot
tables under one root — the classic forward/inverted pair:

* ``forward``  — (doc_id, fp), hash-bucketed by **doc_id**: the lookup that
  answers "what was this doc's previous fingerprint?" for a change set,
  bucket-pruned to the changed keys' buckets;
* ``postings`` — (fp, doc_id), hash-bucketed by **fp**: the membership
  lists that make group stats (count, min-id representative) recomputable
  per affected fingerprint — required because deleting a group's minimum
  doc_id needs the next-smallest member, which counts alone cannot give.

Per-epoch cost is O(changed docs + their index buckets): fingerprints are
computed only for changed rows (the changelog's changed-bytes contract),
the old-fingerprint lookup reads only the forward buckets the changed keys
hash into, and both tables commit copy-on-write epochs over exactly the
touched buckets through the same atomic-manifest protocol as the source
table. ``refresh`` commits postings BEFORE forward, which makes a crashed
refresh re-runnable: until forward (the old-fp lookup source) advances,
re-deriving the same posting deltas re-applies idempotent upserts/deletes.

At cluster scale both tables are Iceberg ``bucket(key, N)`` tables and the
anti-join merge below is a storage-partitioned join; here they reuse
SnapshotTable, whose layout declares exactly that (snapshot_table.py:41-46).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from georef_ar_etl_spark.operators.dedup_events import latest_per_key
from georef_ar_etl_spark.sinks.snapshot_table import SnapshotTable, bucket_expr

FORWARD_SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType(), False),
    T.StructField("fp", T.StringType(), False),
])
# payload key contract: first column is the row key; postings are keyed by
# the COMPOSITE (fp, doc_id) — fp leads so the bucket column derives from it
POSTINGS_SCHEMA = T.StructType([
    T.StructField("fp", T.StringType(), False),
    T.StructField("doc_id", T.StringType(), False),
])


def fingerprint_of_tokens(col: Column) -> Column:
    """Canonical fingerprint of a token-array payload: md5 of the
    comma-joined elements (DuckDB mirror: md5(array_to_string(arr, ','))).
    The token-sequence twin of doc_dedup.fingerprint for text."""
    return F.md5(F.array_join(col.cast("array<string>"), ","))


class FingerprintIndex:
    def __init__(self, spark: SparkSession, root: str, n_buckets: int = 16):
        self.spark = spark
        self.forward = SnapshotTable(spark, f"{root.rstrip('/')}/forward", n_buckets)
        self.postings = SnapshotTable(spark, f"{root.rstrip('/')}/postings", n_buckets)

    # ------------------------------------------------------------- bookkeeping
    @property
    def last_source_epoch(self) -> int | None:
        """Source-table epoch this index reflects — recorded in the forward
        manifest (forward commits last, so a crashed refresh never claims an
        epoch it has not fully applied). The next refresh call is
        ``refresh(engine.changes(last_source_epoch, head), head)``."""
        m = self.forward.latest_manifest()
        return None if m is None else int(m["metrics"]["source_epoch"])

    # --------------------------------------------------------------- bootstrap
    def bootstrap(self, state_df: DataFrame, source_epoch: int = 0) -> None:
        """Full computation ONCE, at the source epoch the index starts from
        (normally the source's bootstrap epoch). Everything after is
        incremental."""
        if self.forward.latest_manifest() is not None:
            return
        fwd = state_df.select(
            "doc_id", fingerprint_of_tokens(F.col("tokens")).alias("fp")
        )
        self._commit(
            self.forward,
            FORWARD_SCHEMA,
            fwd.withColumn("bucket", bucket_expr(F.col("doc_id"), self.forward.n_buckets)),
            list(range(self.forward.n_buckets)),
            source_epoch,
            "bootstrap",
        )
        post = fwd.select("fp", "doc_id")
        self._commit(
            self.postings,
            POSTINGS_SCHEMA,
            post.withColumn("bucket", bucket_expr(F.col("fp"), self.postings.n_buckets)),
            list(range(self.postings.n_buckets)),
            source_epoch,
            "bootstrap",
        )

    # ----------------------------------------------------------------- refresh
    def refresh(self, changes_df: DataFrame, source_epoch: int) -> dict:
        """Apply a changelog range (rows from ``engine.changes(from, to]``)
        and advance the index to ``source_epoch`` (= the range's to_epoch).

        Multi-epoch ranges collapse to the latest change per doc first
        (within one epoch a key appears at most once, so ``change_epoch``
        totally orders a key's rows). Same-value delta-epoch upserts (the
        changelog's event-based mode) are harmless here: old_fp == new_fp
        yields no posting delta and an idempotent forward rewrite."""
        net = latest_per_key(
            changes_df.select("doc_id", "op", "tokens", "change_epoch"),
            key="doc_id",
            order="change_epoch",
        )
        staged = net.select(
            "doc_id",
            "op",
            F.when(F.col("op") == "upsert", fingerprint_of_tokens(F.col("tokens")))
            .alias("new_fp"),
            bucket_expr(F.col("doc_id"), self.forward.n_buckets).alias("bucket"),
        # materialize the (small) net change set once — the touched-bucket
        # collect and the lookup join would otherwise each re-run the
        # changelog read
        ).localCheckpoint(eager=True)
        # old-fingerprint lookup, bucket-pruned to the changed keys' forward
        # buckets (the collect is metadata-sized: <= n_buckets ints)
        fwd_touched = sorted(
            r["bucket"] for r in staged.select("bucket").distinct().collect()
        )
        old_fwd = self.forward.read_state(buckets=fwd_touched).select(
            "doc_id", F.col("fp").alias("old_fp")
        )
        # the change set is the small side — broadcast it so the pruned
        # forward buckets never shuffle (right-outer keeps every change row)
        enriched = (
            old_fwd.join(F.broadcast(staged), "doc_id", "right")
            # materialize once: four downstream frames derive from this —
            # without the checkpoint each would re-run the lookup join
            .localCheckpoint(eager=True)
        )

        # postings FIRST (see module docstring: crash-safe refresh order)
        up = F.col("op") == "upsert"
        moved = up & (F.col("old_fp").isNull() | (F.col("old_fp") != F.col("new_fp")))
        gone = (~up & F.col("old_fp").isNotNull()) | (
            up & F.col("old_fp").isNotNull() & (F.col("old_fp") != F.col("new_fp"))
        )
        post_ups = enriched.filter(moved).select(
            F.col("new_fp").alias("fp"), "doc_id"
        )
        post_dels = enriched.filter(gone).select(
            F.col("old_fp").alias("fp"), "doc_id"
        )
        n_post = self._apply(
            self.postings, POSTINGS_SCHEMA, post_ups, post_dels,
            key_cols=["fp", "doc_id"],
            bucket_of=lambda df: bucket_expr(F.col("fp"), self.postings.n_buckets),
            source_epoch=source_epoch,
        )

        fwd_ups = enriched.filter(up).select("doc_id", F.col("new_fp").alias("fp"))
        fwd_dels = enriched.filter(~up).select("doc_id", F.lit(None).cast("string").alias("fp"))
        n_fwd = self._apply(
            self.forward, FORWARD_SCHEMA, fwd_ups, fwd_dels,
            key_cols=["doc_id"],
            bucket_of=lambda df: bucket_expr(F.col("doc_id"), self.forward.n_buckets),
            source_epoch=source_epoch,
            always_commit=True,  # forward tracks source_epoch even on no-ops
        )
        return {"forward_rows": n_fwd, "posting_rows": n_post}

    # ------------------------------------------------------------------ query
    def groups(self, min_dups: int = 1) -> DataFrame:
        """The fingerprint-group table (fp, n_dups, keep_id) — the same
        output shape as doc_dedup.exact_duplicates, derived from the
        incrementally-maintained postings instead of a corpus scan."""
        return (
            self.postings.read_state()
            .groupBy("fp")
            .agg(F.count(F.lit(1)).alias("n_dups"), F.min("doc_id").alias("keep_id"))
            .filter(F.col("n_dups") >= min_dups)
        )

    # ---------------------------------------------------------------- internal
    def _commit(self, table, schema, df, touched, source_epoch, kind) -> None:
        m = table.latest_manifest()
        epoch = 0 if m is None else m["epoch"] + 1
        table.commit(
            epoch=epoch,
            schema=schema,
            new_buckets_df=df,
            touched_buckets=touched,
            batch_id=None,
            batch_digest=f"fpidx:{kind}:{source_epoch}",
            metrics={"kind": kind, "source_epoch": source_epoch},
        )

    def _apply(
        self, table, schema, ups, dels, key_cols, bucket_of, source_epoch,
        always_commit=False,
    ) -> int:
        """COW merge of a small change set into a bucketed index table:
        anti-join out the changed keys from the TOUCHED buckets only, union
        the upserts back, commit those buckets as a new epoch. The touched
        set comes from one metadata-sized collect; untouched buckets carry
        over by reference in the manifest (zero IO)."""
        ups_b = ups.withColumn("bucket", bucket_of(ups))
        dels_b = dels.select(*key_cols).withColumn("bucket", bucket_of(dels))
        changed = ups_b.select(*key_cols, "bucket").unionByName(dels_b).distinct()
        touched = sorted(r["bucket"] for r in changed.select("bucket").distinct().collect())
        if not touched:
            if always_commit:
                self._commit(table, schema, None, [], source_epoch, "refresh")
            return 0
        cols = [f.name for f in schema.fields] + ["bucket"]
        old = table.read_state(buckets=touched)
        keep = old.join(F.broadcast(changed.select(*key_cols)), key_cols, "left_anti")
        new = keep.select(*cols).unionByName(ups_b.select(*cols))
        self._commit(table, schema, new, touched, source_epoch, "refresh")
        n = int(changed.count())
        return n

"""Incremental maintenance of derived indexes from the table's changelog.

The point of an incremental changelog (SnapshotTable.read_changes) is that
downstream artifacts refresh from the CHANGES, never by rescanning the
corpus — at 100 TB you cannot recompute a dedup fingerprint table or an
ANN index per epoch. Reference analogue: each extraction run reports its
new/updated/deleted ID lists precisely so downstream consumers can act
incrementally (georef_ar_etl/transformers.py:145-149, context.py:276-293).

``DerivedValueIndex`` maintains any per-row derived value of a CDC state
table as TWO derived snapshot tables under one root — the classic
forward/inverted pair:

* ``forward``  — (doc_id, <value>), hash-bucketed by **doc_id**: the lookup
  that answers "what was this doc's previous derived value?" for a change
  set, bucket-pruned to the changed keys' buckets;
* ``postings`` — (<value>, doc_id), hash-bucketed by **value**: the
  membership lists that make per-value group stats (count, min-id
  representative) recomputable per affected value — required because
  deleting a group's minimum doc_id needs the next-smallest member, which
  counts alone cannot give.

Two concrete indexes ship on top of it:

* ``FingerprintIndex`` — value = md5 fingerprint of the token payload: the
  exact-dedup group table (operators/doc_dedup.py's fingerprint family),
  maintained without corpus rescans.
* ``IvfClusterIndex`` — value = nearest-centroid assignment against FIXED
  centroids (pure Catalyst arithmetic, no UDF): the IVF posting lists of
  an ANN index (operators/similarity.py), maintained by assigning only the
  CHANGED vectors — the alternative, retraining + reassigning the corpus
  per epoch, is exactly what breaks at scale. (Centroid drift is handled
  the way real ANN systems do: periodic retrain + full rebuild, which is
  ``bootstrap`` on a fresh root.)

Per-epoch cost is O(changed docs + their index buckets): derived values
are computed only for changed rows (the changelog's changed-bytes
contract), the old-value lookup reads only the forward buckets the changed
keys hash into, and both tables commit copy-on-write epochs over exactly
the touched buckets through the same atomic-manifest protocol as the
source table. ``refresh`` commits postings BEFORE forward, which makes a
crashed refresh re-runnable: until forward (the old-value lookup source)
advances, re-deriving the same posting deltas re-applies idempotent
upserts/deletes.

At cluster scale both tables are Iceberg ``bucket(key, N)`` tables and the
anti-join merge below is a storage-partitioned join; here they reuse
SnapshotTable, whose layout declares exactly that (snapshot_table.py:41-46).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from georef_ar_etl_spark.operators.dedup_events import latest_per_key
from georef_ar_etl_spark.sinks.snapshot_table import SnapshotTable, bucket_expr


def fingerprint_of_tokens(col: Column) -> Column:
    """Canonical fingerprint of a token-array payload: md5 of the
    comma-joined elements (DuckDB mirror: md5(array_to_string(arr, ','))).
    The token-sequence twin of doc_dedup.fingerprint for text."""
    return F.md5(F.array_join(col.cast("array<string>"), ","))


class DerivedValueIndex:
    """Generic changelog-maintained forward/inverted index over one derived
    value per row. ``derive`` builds the value expression from the source
    table's payload columns (evaluated ONLY on changed rows)."""

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        derive: Callable[[], Column],
        value_name: str,
        value_type: T.DataType,
        n_buckets: int = 16,
    ):
        self.spark = spark
        self.derive = derive
        self.value_name = value_name
        self.forward_schema = T.StructType([
            T.StructField("doc_id", T.StringType(), False),
            T.StructField(value_name, value_type, False),
        ])
        # payload key contract: first column is the row key; postings are
        # keyed by the COMPOSITE (value, doc_id) — value leads so the
        # bucket column derives from it
        self.postings_schema = T.StructType([
            T.StructField(value_name, value_type, False),
            T.StructField("doc_id", T.StringType(), False),
        ])
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

    @property
    def pending_refresh_epoch(self) -> int | None:
        """Non-None when a refresh tore between its two commits: postings
        reached this source epoch but forward did not. The NEXT refresh must
        target exactly this epoch (re-deriving the same deltas is
        idempotent); a WIDER range would compute posting deletes from the
        stale forward values and leave the torn refresh's posting rows
        behind as phantoms. ``refresh`` enforces this; stream_apply's
        consumer loop heals it automatically."""
        pm = self.postings.latest_manifest()
        fm = self.forward.latest_manifest()
        if pm is None or fm is None:
            return None
        p, f = int(pm["metrics"]["source_epoch"]), int(fm["metrics"]["source_epoch"])
        return p if p > f else None

    # --------------------------------------------------------------- bootstrap
    def bootstrap(self, state_df: DataFrame, source_epoch: int = 0) -> None:
        """Full computation ONCE, at the source epoch the index starts from
        (normally the source's bootstrap epoch). Everything after is
        incremental."""
        if self.forward.latest_manifest() is not None:
            return
        v = self.value_name
        # (doc_id, value) is light relative to the corpus — materialize it
        # once; the two table commits would otherwise each re-run the full
        # state scan + derivation
        fwd = state_df.select("doc_id", self.derive().alias(v)).localCheckpoint(
            eager=True
        )
        # postings FIRST, forward LAST — the same crash-safe order as
        # refresh: forward's manifest is the progress authority (the early
        # return above checks it), so a crash between the two commits just
        # re-runs bootstrap, and the postings re-commit is an idempotent
        # full overwrite
        self._commit(
            self.postings,
            self.postings_schema,
            fwd.select(v, "doc_id").withColumn(
                "bucket", bucket_expr(F.col(v), self.postings.n_buckets)
            ),
            list(range(self.postings.n_buckets)),
            source_epoch,
            "bootstrap",
        )
        self._commit(
            self.forward,
            self.forward_schema,
            fwd.withColumn("bucket", bucket_expr(F.col("doc_id"), self.forward.n_buckets)),
            list(range(self.forward.n_buckets)),
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
        changelog's event-based mode) are harmless here: old == new yields
        no posting delta and an idempotent forward rewrite."""
        pending = self.pending_refresh_epoch
        if pending is not None and source_epoch != pending:
            raise ValueError(
                f"torn refresh detected: postings reached source epoch "
                f"{pending} but forward did not — re-run "
                f"refresh(changes({self.last_source_epoch}, {pending}), "
                f"{pending}) first (idempotent), then continue; a wider "
                f"range would strand the torn refresh's posting rows"
            )
        v = self.value_name
        payload = [c for c in changes_df.columns if c not in
                   ("change_epoch", "batch_id", "op", "bucket")]
        net = latest_per_key(
            changes_df.select("op", "change_epoch", *payload),
            key="doc_id",
            order="change_epoch",
        )
        staged = net.select(
            "doc_id",
            "op",
            F.when(F.col("op") == "upsert", self.derive()).alias("_new"),
            bucket_expr(F.col("doc_id"), self.forward.n_buckets).alias("bucket"),
        # materialize the (small) net change set once — the touched-bucket
        # collect and the lookup join would otherwise each re-run the
        # changelog read
        ).localCheckpoint(eager=True)
        # old-value lookup, bucket-pruned to the changed keys' forward
        # buckets (the collect is metadata-sized: <= n_buckets ints)
        fwd_touched = sorted(
            r["bucket"] for r in staged.select("bucket").distinct().collect()
        )
        enriched = (
            self._lookup_old(staged, fwd_touched)
            # materialize once: four downstream frames derive from this —
            # without the checkpoint each would re-run the lookup join
            .localCheckpoint(eager=True)
        )

        # postings FIRST (see module docstring: crash-safe refresh order)
        up = F.col("op") == "upsert"
        moved = up & (F.col("_old").isNull() | (F.col("_old") != F.col("_new")))
        gone = (~up & F.col("_old").isNotNull()) | (
            up & F.col("_old").isNotNull() & (F.col("_old") != F.col("_new"))
        )
        post_ups = enriched.filter(moved).select(F.col("_new").alias(v), "doc_id")
        post_dels = enriched.filter(gone).select(F.col("_old").alias(v), "doc_id")
        n_post = self._apply(
            self.postings, self.postings_schema, post_ups, post_dels,
            key_cols=[v, "doc_id"],
            bucket_of=lambda: bucket_expr(F.col(v), self.postings.n_buckets),
            source_epoch=source_epoch,
        )

        fwd_ups = enriched.filter(up).select("doc_id", F.col("_new").alias(v))
        fwd_dels = enriched.filter(~up).select("doc_id")
        n_fwd = self._apply(
            self.forward, self.forward_schema, fwd_ups, fwd_dels,
            key_cols=["doc_id"],
            bucket_of=lambda: bucket_expr(F.col("doc_id"), self.forward.n_buckets),
            source_epoch=source_epoch,
            always_commit=True,  # forward tracks source_epoch even on no-ops
        )
        return {"forward_rows": n_fwd, "posting_rows": n_post}

    def _lookup_old(self, staged: DataFrame, fwd_touched: list[int]) -> DataFrame:
        """Old-value lookup for a change set — two-step so the pruned
        forward buckets never shuffle: (1) broadcast LEFT-SEMI trim of the
        bucket scan by the change keys (broadcasting the semi's right/build
        side is supported, unlike a broadcast hint on the preserved side of
        an outer join, which Spark silently ignores — the join would
        degrade to shuffling the whole bucket read); (2) the outer join is
        then small ⋈ small, with the trimmed lookup (<= |changes| rows) as
        the broadcast build side. Plan shape pinned in
        tests/test_plan_shapes.py."""
        old_fwd = self.forward.read_state(buckets=fwd_touched).select(
            "doc_id", F.col(self.value_name).alias("_old")
        )
        trimmed = old_fwd.join(
            F.broadcast(staged.select("doc_id")), "doc_id", "left_semi"
        )
        return staged.join(F.broadcast(trimmed), "doc_id", "left")

    # ------------------------------------------------------------------ query
    def groups(self, min_members: int = 1) -> DataFrame:
        """The per-value group table (<value>, n_dups, keep_id) — count and
        min-id representative per derived value, from the incrementally-
        maintained postings instead of a corpus scan."""
        return (
            self.postings.read_state()
            .groupBy(self.value_name)
            .agg(F.count(F.lit(1)).alias("n_dups"), F.min("doc_id").alias("keep_id"))
            .filter(F.col("n_dups") >= min_members)
        )

    def members(self) -> DataFrame:
        """The posting rows themselves: (<value>, doc_id)."""
        return self.postings.read_state().select(self.value_name, "doc_id")

    # ---------------------------------------------------------------- internal
    def _commit(self, table, schema, df, touched, source_epoch, kind) -> None:
        _commit_epoch(table, schema, df, touched, source_epoch, kind)

    def _apply(
        self, table, schema, ups, dels, key_cols, bucket_of, source_epoch,
        always_commit=False,
    ) -> int:
        return _cow_apply(
            table, schema, ups, dels, key_cols, bucket_of, source_epoch,
            always_commit=always_commit,
        )


def _commit_epoch(table, schema, df, touched, source_epoch, kind) -> None:
    m = table.latest_manifest()
    epoch = 0 if m is None else m["epoch"] + 1
    table.commit(
        epoch=epoch,
        schema=schema,
        new_buckets_df=df,
        touched_buckets=touched,
        batch_id=None,
        batch_digest=f"dvidx:{kind}:{source_epoch}",
        metrics={"kind": kind, "source_epoch": source_epoch},
    )


def _cow_apply(
    table, schema, ups, dels, key_cols, bucket_of, source_epoch,
    always_commit=False,
) -> int:
    """COW merge of a small change set into a bucketed index table:
    anti-join out the changed keys from the TOUCHED buckets only, union
    the upserts back, commit those buckets as a new epoch. The touched
    set comes from one metadata-sized collect; untouched buckets carry
    over by reference in the manifest (zero IO)."""
    ups_b = ups.withColumn("bucket", bucket_of())
    dels_b = dels.select(*key_cols).withColumn("bucket", bucket_of())
    changed = ups_b.select(*key_cols, "bucket").unionByName(dels_b).distinct()
    touched = sorted(r["bucket"] for r in changed.select("bucket").distinct().collect())
    if not touched:
        if always_commit:
            _commit_epoch(table, schema, None, [], source_epoch, "refresh")
        return 0
    cols = [f.name for f in schema.fields] + ["bucket"]
    old = table.read_state(buckets=touched)
    # NULL-SAFE key equality: SQL GROUP BY treats NULL as a real group, so
    # a nullable group/value key (e.g. an additively-evolved source column
    # that is NULL for pre-evolution rows) must anti-join out like any
    # other key — plain `=` never matches NULL, which would leave the
    # stale row in place AND union the replacement in (double counting).
    # Catalyst plans `<=>` as an ordinary hash-join key, so this costs
    # nothing over the null-unsafe form.
    changed_k = changed.select(*key_cols)
    cond = None
    for c in key_cols:
        eq = old[c].eqNullSafe(changed_k[c])
        cond = eq if cond is None else (cond & eq)
    keep = old.join(F.broadcast(changed_k), cond, "left_anti")
    new = keep.select(*cols).unionByName(ups_b.select(*cols))
    _commit_epoch(table, schema, new, touched, source_epoch, "refresh")
    n = int(changed.count())
    return n


class FingerprintIndex(DerivedValueIndex):
    """Exact-dedup fingerprint index: value = md5 of the token payload.
    ``groups()`` returns (fp, n_dups, keep_id) — the same output shape as
    doc_dedup.exact_duplicates, maintained incrementally."""

    def __init__(self, spark: SparkSession, root: str, n_buckets: int = 16):
        super().__init__(
            spark, root,
            derive=lambda: fingerprint_of_tokens(F.col("tokens")),
            value_name="fp",
            value_type=T.StringType(),
            n_buckets=n_buckets,
        )


def centroid_assign_expr(vec_cols: list[Column], centroids) -> Column:
    """Nearest-centroid assignment as a PURE CATALYST expression (codegen'd,
    no UDF): explicit per-centroid Euclidean distance over fixed-dimension
    columns, argmin via array_position(array_min) — first minimum wins, the
    same tie-break as numpy argmin and DuckDB list_position. The arithmetic
    is written term-by-term so a DuckDB oracle can inline the identical
    formula (no list_distance, whose summation order is opaque)."""
    dists = []
    for c in centroids:
        acc = None
        for j, vx in enumerate(vec_cols):
            term = (vx - F.lit(float(c[j]))) * (vx - F.lit(float(c[j])))
            acc = term if acc is None else acc + term
        dists.append(F.sqrt(acc))
    arr = F.array(*dists)
    return (F.array_position(arr, F.array_min(arr)) - 1).cast("int")


class IvfClusterIndex(DerivedValueIndex):
    """IVF posting-list maintenance: value = nearest-centroid cluster of a
    fixed-dimension vector derived from the payload (``vec_of`` maps the
    payload columns to the vector's component Columns). Centroids are FIXED
    at construction — refresh assigns only the changed vectors, the 100 TB
    alternative to retraining/reassigning the corpus per epoch."""

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        centroids,
        vec_of: Callable[[], list[Column]],
        n_buckets: int = 16,
    ):
        super().__init__(
            spark, root,
            derive=lambda: centroid_assign_expr(vec_of(), centroids),
            value_name="cluster",
            value_type=T.IntegerType(),
            n_buckets=n_buckets,
        )


def _integral(dt: T.DataType) -> bool:
    return isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType))


class ContinuousAggregate:
    """Changelog-maintained rollup — the CONTINUOUS AGGREGATE (timescale
    continuous aggregate / materialized-view maintenance): per-group
    partials (count / sum / min / max; avg derives as sum/count) of one
    numeric value over the source table's live rows, refreshed from
    ``engine.changes()`` by touching ONLY the groups the change set hits —
    never by re-aggregating the corpus. The batch twin is
    ``operators/temporal.py::rollup`` (group = time bucket); equality
    against a full recompute is the q56 oracle.

    Three derived SnapshotTables under one root:

    * ``forward`` — (doc_id, <groups>, val), bucketed by **doc_id**: the
      old-contribution lookup for a change set (which group did this doc
      count toward, with what value?), bucket-pruned to the changed keys;
    * ``members`` — (<groups>, doc_id, val), bucketed by the **group
      key**: the membership lists that make min/max maintainable — a
      deletion that removes a group's minimum needs the next-smallest
      member, which no amount of partial arithmetic can give (sum/count
      alone would be subtractable, min/max are not);
    * ``rollup`` — (<groups>, n, sum_v, min_v, max_v), bucketed by the
      same group key: the aggregate itself, recomputed per TOUCHED group
      from its (bucket-aligned) member lists.

    Per-epoch cost is O(changed docs + touched groups' member buckets) —
    group/value expressions evaluate only on changed rows, the forward
    lookup reads only the changed keys' buckets, and the rollup rewrite
    touches only the buckets the affected groups hash into. A coarser
    granularity chains for free: when the leading group column is a time
    bucket, ``temporal.rollup_coarser(agg.aggregate(), ...)`` re-aggregates
    these maintained partials without ever touching raw data.

    Commit order per refresh is members -> rollup -> forward; forward (the
    old-contribution source) advances LAST, so a refresh that crashes
    between commits re-runs idempotently against the same old values:
    member deletes of already-removed rows anti-join to nothing, member
    upserts rewrite identical rows, and the rollup recompute is a pure
    function of the (already-correct) member state. Reference analogue:
    per-run changed-ID reports feeding downstream consumers
    (georef_ar_etl/transformers.py:145-149)."""

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        group_exprs: Callable[[], list[Column]],
        group_fields: list[tuple[str, T.DataType]],
        value_expr: Callable[[], Column],
        value_type: T.DataType,
        n_buckets: int = 16,
    ):
        self.spark = spark
        self.group_exprs = group_exprs
        self.group_names = [n for n, _ in group_fields]
        self.value_expr = value_expr
        # group columns are nullable: SQL GROUP BY keeps NULL as a real
        # group (e.g. an additively-evolved source column that is NULL for
        # every pre-evolution row) — all key joins downstream are null-safe
        gf = [T.StructField(n, t, True) for n, t in group_fields]
        sum_t = T.LongType() if _integral(value_type) else T.DoubleType()
        self.forward_schema = T.StructType(
            [T.StructField("doc_id", T.StringType(), False)]
            + gf + [T.StructField("val", value_type, False)]
        )
        self.members_schema = T.StructType(
            gf + [T.StructField("doc_id", T.StringType(), False),
                  T.StructField("val", value_type, False)]
        )
        self.rollup_schema = T.StructType(gf + [
            T.StructField("n", T.LongType(), False),
            T.StructField("sum_v", sum_t, False),
            T.StructField("min_v", value_type, False),
            T.StructField("max_v", value_type, False),
        ])
        r = root.rstrip("/")
        self.forward = SnapshotTable(spark, f"{r}/forward", n_buckets)
        self.members = SnapshotTable(spark, f"{r}/members", n_buckets)
        self.rollup = SnapshotTable(spark, f"{r}/rollup", n_buckets)

    def _gbucket(self) -> Column:
        """Group-key bucket — members and rollup share it, so a touched
        group's member lists and its aggregate row live in the SAME bucket
        number of their respective tables (the recompute reads exactly the
        touched buckets of each)."""
        return F.pmod(
            F.xxhash64(*[F.col(n) for n in self.group_names]),
            F.lit(self.members.n_buckets),
        ).cast("int")

    # ------------------------------------------------------------- bookkeeping
    @property
    def last_source_epoch(self) -> int | None:
        m = self.forward.latest_manifest()
        return None if m is None else int(m["metrics"]["source_epoch"])

    @property
    def pending_refresh_epoch(self) -> int | None:
        """Non-None when a refresh tore between its commits: members and/or
        rollup reached this source epoch but forward did not. The next
        refresh must target exactly this epoch (idempotent re-run)."""
        fm = self.forward.latest_manifest()
        if fm is None:
            return None
        f = int(fm["metrics"]["source_epoch"])
        ahead = [
            int(m["metrics"]["source_epoch"])
            for m in (self.members.latest_manifest(), self.rollup.latest_manifest())
            if m is not None and int(m["metrics"]["source_epoch"]) > f
        ]
        return max(ahead) if ahead else None

    # --------------------------------------------------------------- bootstrap
    def bootstrap(self, state_df: DataFrame, source_epoch: int = 0) -> None:
        """Full aggregation ONCE at the source epoch the aggregate starts
        from; everything after is incremental. forward commits last (it is
        the progress authority the early return checks)."""
        if self.forward.latest_manifest() is not None:
            return
        g = self.group_names
        fwd = state_df.select(
            "doc_id",
            *[e.alias(n) for n, e in zip(g, self.group_exprs())],
            self.value_expr().alias("val"),
        ).localCheckpoint(eager=True)
        all_m = list(range(self.members.n_buckets))
        _commit_epoch(
            self.members, self.members_schema,
            fwd.select(*g, "doc_id", "val").withColumn("bucket", self._gbucket()),
            all_m, source_epoch, "bootstrap",
        )
        _commit_epoch(
            self.rollup, self.rollup_schema,
            self._aggregate_members(fwd).withColumn("bucket", self._gbucket()),
            all_m, source_epoch, "bootstrap",
        )
        _commit_epoch(
            self.forward, self.forward_schema,
            fwd.withColumn(
                "bucket", bucket_expr(F.col("doc_id"), self.forward.n_buckets)
            ),
            list(range(self.forward.n_buckets)), source_epoch, "bootstrap",
        )

    def _aggregate_members(self, members_df: DataFrame) -> DataFrame:
        return members_df.groupBy(*self.group_names).agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("val").cast(self.rollup_schema["sum_v"].dataType).alias("sum_v"),
            F.min("val").alias("min_v"),
            F.max("val").alias("max_v"),
        )

    # ----------------------------------------------------------------- refresh
    def refresh(self, changes_df: DataFrame, source_epoch: int) -> dict:
        """Apply a changelog range (``engine.changes(from, to]`` rows) and
        advance the aggregate to ``source_epoch``. Multi-epoch ranges
        collapse to the latest change per doc first; same-value re-upserts
        (the delta changelog's event-based mode) are idempotent rewrites."""
        pending = self.pending_refresh_epoch
        if pending is not None and source_epoch != pending:
            raise ValueError(
                f"torn refresh detected: members/rollup reached source epoch "
                f"{pending} but forward did not — re-run "
                f"refresh(changes({self.last_source_epoch}, {pending}), "
                f"{pending}) first (idempotent), then continue"
            )
        g = self.group_names
        payload = [c for c in changes_df.columns
                   if c not in ("change_epoch", "batch_id", "op", "bucket")]
        net = latest_per_key(
            changes_df.select("op", "change_epoch", *payload),
            key="doc_id", order="change_epoch",
        )
        up = F.col("op") == "upsert"
        staged = net.select(
            "doc_id", "op",
            *[F.when(up, e).alias(f"_n_{n}")
              for n, e in zip(g, self.group_exprs())],
            F.when(up, self.value_expr()).alias("_nv"),
            bucket_expr(F.col("doc_id"), self.forward.n_buckets).alias("bucket"),
        ).localCheckpoint(eager=True)
        fwd_touched = sorted(
            r["bucket"] for r in staged.select("bucket").distinct().collect()
        )
        enriched = self._lookup_old(staged, fwd_touched).localCheckpoint(eager=True)

        has_old = F.col("_has_old")
        key_moved = None
        for n in g:
            diff = ~F.col(f"_o_{n}").eqNullSafe(F.col(f"_n_{n}"))
            key_moved = diff if key_moved is None else (key_moved | diff)

        # members FIRST (crash-safe order, see class docstring)
        m_ups = enriched.filter(up).select(
            *[F.col(f"_n_{n}").alias(n) for n in g], "doc_id",
            F.col("_nv").alias("val"),
        )
        m_dels = enriched.filter(has_old & ((~up) | key_moved)).select(
            *[F.col(f"_o_{n}").alias(n) for n in g], "doc_id",
        )
        n_members = _cow_apply(
            self.members, self.members_schema, m_ups, m_dels,
            key_cols=[*g, "doc_id"], bucket_of=self._gbucket,
            source_epoch=source_epoch,
        )

        # touched groups = every group the change set adds to OR removes
        # from; their partials recompute from the (bucket-aligned) member
        # lists — the only correct path once min/max are in the aggregate
        tg = (
            enriched.filter(up)
            .select(*[F.col(f"_n_{n}").alias(n) for n in g])
            .unionByName(
                enriched.filter(has_old)
                .select(*[F.col(f"_o_{n}").alias(n) for n in g])
            )
            .distinct()
            .localCheckpoint(eager=True)
        )
        g_buckets = sorted(
            r["b"] for r in tg.select(self._gbucket().alias("b")).distinct().collect()
        )
        if g_buckets:
            # null-safe semi join for the same reason as _cow_apply: a NULL
            # group is a real SQL group and must recompute when touched
            members_live = self.members.read_state(buckets=g_buckets)
            sem = None
            for n in g:
                eq = members_live[n].eqNullSafe(tg[n])
                sem = eq if sem is None else (sem & eq)
            live = members_live.join(F.broadcast(tg), sem, "left_semi")
            new_rollup = self._aggregate_members(live)
        else:
            new_rollup = self.spark.createDataFrame(
                [], self.rollup_schema
            )
        n_groups = _cow_apply(
            self.rollup, self.rollup_schema, new_rollup, tg,
            key_cols=list(g), bucket_of=self._gbucket,
            source_epoch=source_epoch,
        )

        f_ups = enriched.filter(up).select(
            "doc_id",
            *[F.col(f"_n_{n}").alias(n) for n in g],
            F.col("_nv").alias("val"),
        )
        f_dels = enriched.filter(~up).select("doc_id")
        _cow_apply(
            self.forward, self.forward_schema, f_ups, f_dels,
            key_cols=["doc_id"],
            bucket_of=lambda: bucket_expr(F.col("doc_id"), self.forward.n_buckets),
            source_epoch=source_epoch,
            always_commit=True,  # forward tracks source_epoch even on no-ops
        )
        return {"member_rows": n_members, "touched_groups": n_groups}

    def _lookup_old(self, staged: DataFrame, fwd_touched: list[int]) -> DataFrame:
        """Old-contribution lookup — same two-step shape as
        DerivedValueIndex._lookup_old: broadcast LEFT-SEMI trim of the
        pruned forward-bucket scan by the change keys, then a small-x-small
        broadcast outer join (the pruned buckets never shuffle)."""
        old = self.forward.read_state(buckets=fwd_touched).select(
            "doc_id",
            *[F.col(n).alias(f"_o_{n}") for n in self.group_names],
            F.lit(True).alias("_has_old"),
        )
        trimmed = old.join(
            F.broadcast(staged.select("doc_id")), "doc_id", "left_semi"
        )
        out = staged.join(F.broadcast(trimmed), "doc_id", "left")
        return out.withColumn("_has_old", F.coalesce("_has_old", F.lit(False)))

    # ------------------------------------------------------------------ query
    def aggregate(self) -> DataFrame:
        """The maintained rollup: (<groups>, n, sum_v, min_v, max_v). When
        the leading group is a time bucket named ``bucket_s``, this frame
        feeds ``temporal.rollup_coarser`` unchanged — the continuous
        aggregate IS the finest level of the hypertable chain."""
        return self.rollup.read_state().select(
            *self.group_names, "n", "sum_v", "min_v", "max_v"
        )


class Scd2Index:
    """Changelog-maintained SCD Type 2 history — the incremental twin of
    ``operators/scd.py::scd2_history`` (equality against a full rebuild
    over the same change stream is the pytest oracle): validity intervals
    per key refresh from ``engine.changes()`` by touching ONLY the changed
    docs' buckets, never by re-folding the whole stream.

    The split that makes history maintenance APPEND-ONLY:

    * ``cur``  — (doc_id, valid_from, alive, <payload>), bucketed by
      doc_id: each doc's OPEN version (or its delete tombstone —
      ``alive=false`` rows make repeated deletes collapse and survive
      re-insert). This is both the collapse-compare lookup AND the payload
      source for closing, so closing a version never reads ``hist``;
    * ``hist`` — (doc_id, valid_from, valid_to, <payload>), bucketed by
      doc_id: CLOSED versions only. Rows are written once and never
      updated — "closing" a version MOVES it from cur to hist with
      ``valid_to`` stamped, so hist needs no read-modify-write and its
      per-epoch write is exactly the versions that closed.

    Refresh cost is O(changed docs + their cur/hist buckets): the change
    set folds per doc with the same one-exchange two-window plan as the
    batch operator (change-point lag seeded by the cur row, closing lead
    over the kept points), the cur lookup is bucket-pruned + broadcast-
    trimmed (the DerivedValueIndex two-step), and both commits touch only
    the changed docs' buckets. hist commits FIRST, cur LAST (cur is the
    old-state authority the refresh reads): a refresh that crashes between
    them re-runs against the unchanged cur and rewrites the identical
    closed rows — idempotent, same torn-refresh contract as the other
    indexes.

    The version axis is the CHANGELOG EPOCH (``valid_from``/``valid_to``
    are change epochs, half-open, tiling per doc). Input rows must be one
    net change per (doc, epoch) — exactly what ``read_changes`` emits; the
    changelog's event-based same-value re-emissions are collapsed here by
    the change-point compare, which is the SCD2 semantics. Payload columns
    are fixed at construction; on additive schema evolution bootstrap a
    fresh root (the IVF retrain convention).

    Reference analogue: none — the reference drops and reloads entity
    tables per run (georef_ar_etl/loaders.py), discarding history.
    """

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        payload_fields: list[tuple[str, T.DataType]],
        n_buckets: int = 16,
    ):
        self.spark = spark
        self.payload = [n for n, _ in payload_fields]
        pf = [T.StructField(n, t, True) for n, t in payload_fields]
        self.cur_schema = T.StructType(
            [
                T.StructField("doc_id", T.StringType(), False),
                T.StructField("valid_from", T.LongType(), False),
                T.StructField("alive", T.BooleanType(), False),
            ]
            + pf
        )
        self.hist_schema = T.StructType(
            [
                T.StructField("doc_id", T.StringType(), False),
                T.StructField("valid_from", T.LongType(), False),
                T.StructField("valid_to", T.LongType(), False),
            ]
            + pf
        )
        r = root.rstrip("/")
        self.hist = SnapshotTable(spark, f"{r}/hist", n_buckets)
        self.cur = SnapshotTable(spark, f"{r}/cur", n_buckets)

    # ------------------------------------------------------------- bookkeeping
    @property
    def last_source_epoch(self) -> int | None:
        m = self.cur.latest_manifest()
        return None if m is None else int(m["metrics"]["source_epoch"])

    @property
    def pending_refresh_epoch(self) -> int | None:
        """Non-None when a refresh tore between the hist and cur commits:
        re-run the SAME range (idempotent — cur, the old-state source, has
        not advanced, so the recomputed closed rows are identical)."""
        cm = self.cur.latest_manifest()
        hm = self.hist.latest_manifest()
        if cm is None or hm is None:
            return None
        c = int(cm["metrics"]["source_epoch"])
        h = int(hm["metrics"]["source_epoch"])
        return h if h > c else None

    def _dbucket(self, table) -> Callable[[], Column]:
        return lambda: bucket_expr(F.col("doc_id"), table.n_buckets)

    # --------------------------------------------------------------- bootstrap
    def bootstrap(self, state_df: DataFrame, source_epoch: int = 0) -> None:
        """Open one version per initial row at ``valid_from=source_epoch``.
        cur commits last (it is the progress authority)."""
        if self.cur.latest_manifest() is not None:
            return
        rows = state_df.select(
            "doc_id",
            F.lit(int(source_epoch)).cast("long").alias("valid_from"),
            F.lit(True).alias("alive"),
            *self.payload,
        )
        _commit_epoch(self.hist, self.hist_schema, None, [], source_epoch, "bootstrap")
        _commit_epoch(
            self.cur,
            self.cur_schema,
            rows.withColumn("bucket", bucket_expr(F.col("doc_id"), self.cur.n_buckets)),
            list(range(self.cur.n_buckets)),
            source_epoch,
            "bootstrap",
        )

    # ----------------------------------------------------------------- refresh
    def refresh(self, changes_df: DataFrame, source_epoch: int) -> dict:
        """Fold a changelog range (rows of ``engine.changes(from, to]``,
        one net change per (doc, epoch)) into the history and advance to
        ``source_epoch`` (= the range's to_epoch)."""
        pending = self.pending_refresh_epoch
        if pending is not None and source_epoch != pending:
            raise ValueError(
                f"torn refresh detected: hist reached source epoch {pending} "
                f"but cur did not — re-run refresh(changes("
                f"{self.last_source_epoch}, {pending}), {pending}) first "
                f"(idempotent), then continue"
            )
        staged = changes_df.select(
            "doc_id",
            F.col("change_epoch").cast("long").alias("_seq"),
            F.when(F.col("op") == "upsert", F.lit("u")).otherwise(F.lit("d")).alias("_op"),
            # effective payload: NULL-masked for deletes so d==d collapses
            # regardless of junk in the delete row's payload columns
            *[
                F.when(F.col("op") == "upsert", F.col(c)).alias(f"_e_{c}")
                for c in self.payload
            ],
            bucket_expr(F.col("doc_id"), self.cur.n_buckets).alias("bucket"),
        ).localCheckpoint(eager=True)
        touched = sorted(
            r["bucket"] for r in staged.select("bucket").distinct().collect()
        )
        if not touched:
            _commit_epoch(self.hist, self.hist_schema, None, [], source_epoch, "refresh")
            _commit_epoch(self.cur, self.cur_schema, None, [], source_epoch, "refresh")
            return {"closed": 0, "cur_upserts": 0}

        # old-state lookup: bucket-pruned cur scan, broadcast-semi trimmed
        # to the changed docs, then small-x-small broadcast left join (the
        # DerivedValueIndex._lookup_old two-step — pruned buckets never
        # shuffle)
        old = self.cur.read_state(buckets=touched).select(
            "doc_id",
            F.col("valid_from").alias("_o_from"),
            F.col("alive").alias("_o_alive"),
            *[F.col(c).alias(f"_o_{c}") for c in self.payload],
            F.lit(True).alias("_has_old"),
        )
        trimmed = old.join(F.broadcast(staged.select("doc_id")), "doc_id", "left_semi")
        j = staged.join(F.broadcast(trimmed), "doc_id", "left")

        old_op = (
            F.when(F.col("_has_old").isNull(), F.lit(None).cast("string"))
            .when(F.col("_o_alive"), F.lit("u"))
            .otherwise(F.lit("d"))
        )
        old_eff = {
            c: F.when(F.col("_has_old") & F.col("_o_alive"), F.col(f"_o_{c}"))
            for c in self.payload
        }

        w = Window.partitionBy("doc_id").orderBy("_seq")
        rn = F.row_number().over(w)
        prev_op = F.when(rn == 1, old_op).otherwise(F.lag("_op").over(w))
        same = F.col("_op").eqNullSafe(prev_op)
        for c in self.payload:
            prev_c = F.when(rn == 1, old_eff[c]).otherwise(F.lag(f"_e_{c}").over(w))
            same = same & F.col(f"_e_{c}").eqNullSafe(prev_c)
        # change-point filter preserves w's partitioning AND sort — the
        # second window below adds no exchange (scd2_history plan shape)
        cp = j.withColumn("_keep", ~same).filter("_keep")

        rk = F.row_number().over(w)
        p_op = F.when(rk == 1, old_op).otherwise(F.lag("_op").over(w))
        p_from = F.when(rk == 1, F.col("_o_from")).otherwise(F.lag("_seq").over(w))
        closed = (
            cp.select(
                "doc_id",
                p_op.alias("_p_op"),
                p_from.alias("valid_from"),
                F.col("_seq").alias("valid_to"),
                *[
                    F.when(rk == 1, old_eff[c])
                    .otherwise(F.lag(f"_e_{c}").over(w))
                    .alias(c)
                    for c in self.payload
                ],
            )
            .filter(F.col("_p_op") == "u")
            .drop("_p_op")
        )
        last = F.row_number().over(
            Window.partitionBy("doc_id").orderBy(F.col("_seq").desc())
        )
        finals = cp.withColumn("_rl", last).filter("_rl = 1").select(
            "doc_id",
            F.col("_seq").alias("valid_from"),
            (F.col("_op") == "u").alias("alive"),
            *[F.col(f"_e_{c}").alias(c) for c in self.payload],
        )
        # both frames derive from the same two-window fold; materialize it
        # once (each _cow_apply runs a touched-collect plus the merge)
        closed = closed.localCheckpoint(eager=True)
        finals = finals.localCheckpoint(eager=True)

        empty_keys = closed.select("doc_id", "valid_from").limit(0)
        n_closed = _cow_apply(
            self.hist, self.hist_schema, closed, empty_keys,
            ["doc_id", "valid_from"], self._dbucket(self.hist), source_epoch,
            always_commit=True,
        )
        n_cur = _cow_apply(
            self.cur, self.cur_schema, finals, finals.select("doc_id").limit(0),
            ["doc_id"], self._dbucket(self.cur), source_epoch,
            always_commit=True,
        )
        return {"closed": n_closed, "cur_upserts": n_cur}

    # ------------------------------------------------------------------ query
    def history(self) -> DataFrame:
        """The full Type 2 table: closed versions from hist plus each live
        doc's open version from cur — (doc_id, <payload>, valid_from,
        valid_to, is_current). Delete tombstones (alive=false) are
        bookkeeping, not versions, and are excluded."""
        closed = self.hist.read_state().select(
            "doc_id", *self.payload, "valid_from", "valid_to",
            F.lit(False).alias("is_current"),
        )
        open_ = self.cur.read_state().filter("alive").select(
            "doc_id", *self.payload, "valid_from",
            F.lit(None).cast("long").alias("valid_to"),
            F.lit(True).alias("is_current"),
        )
        return closed.unionByName(open_)


def token_gram_hashes(tokens_col: str, k: int) -> Column:
    """Position-aligned 60-bit hashes of the ``k``-token grams of an int
    token array: element i (1-based) hashes tokens[i..i+k-1] (md5 of the
    comma-joined values → first 15 hex digits; DuckDB mirror:
    ``('0x' || substr(md5(array_to_string(l[i:i+k-1], ',')), 1, 15))``).
    Arrays shorter than k yield an empty gram list."""
    t = tokens_col
    return F.expr(
        f"CASE WHEN size({t}) >= {k} THEN "
        f"transform(sequence(1, size({t}) - {k - 1}), i -> "
        f"cast(conv(substring(md5(array_join("
        f"cast(slice({t}, i, {k}) as array<string>), ',')), 1, 15), 16, 10)"
        f" as bigint)) ELSE array()::array<bigint> END"
    )


class TokenGramIndex:
    """Changelog-maintained inverted n-gram index over token-array
    payloads — the incremental backbone of exact-substring dedup: the
    batch operators (``text.dup_span_stats`` / ``text.remove_dup_spans``)
    recompute gram postings from the corpus per run, which at 100 TB must
    instead refresh in O(changed docs × grams/doc) from the changelog.

    The multi-valued generalization of ``DerivedValueIndex`` (a doc owns
    MANY (gram, position) postings, not one scalar):

    * ``forward``  — (doc_id, grams array<long>), bucketed by doc_id:
      position i holds the hash of tokens[i..i+k-1], so a changed doc's
      OLD posting rows are reconstructable without touching the corpus;
    * ``postings`` — (g, doc_id, s), bucketed by g: the occurrence lists
      behind "which grams are duplicated, where is each one's first
      occurrence" (``dup_grams``).

    A refresh deletes every old posting row of each changed doc (old
    grams looked up from forward, bucket-pruned, broadcast-trimmed — the
    DerivedValueIndex lookup shape) and inserts the new ones; rows whose
    gram didn't move are deleted+reinserted, trading a little write
    amplification inside touched postings buckets for set-difference-free
    logic. Same crash-safe commit order (postings FIRST, forward LAST =
    progress authority) and torn-refresh healing contract as
    DerivedValueIndex.
    """

    def __init__(
        self, spark: SparkSession, root: str, k: int = 2, n_buckets: int = 16
    ):
        self.spark = spark
        self.k = int(k)
        self.forward_schema = T.StructType([
            T.StructField("doc_id", T.StringType(), False),
            T.StructField("grams", T.ArrayType(T.LongType()), True),
        ])
        self.postings_schema = T.StructType([
            T.StructField("g", T.LongType(), False),
            T.StructField("doc_id", T.StringType(), False),
            T.StructField("s", T.IntegerType(), False),
        ])
        self.forward = SnapshotTable(spark, f"{root.rstrip('/')}/forward", n_buckets)
        self.postings = SnapshotTable(spark, f"{root.rstrip('/')}/postings", n_buckets)

    # ------------------------------------------------------------- bookkeeping
    @property
    def last_source_epoch(self) -> int | None:
        m = self.forward.latest_manifest()
        return None if m is None else int(m["metrics"]["source_epoch"])

    @property
    def pending_refresh_epoch(self) -> int | None:
        pm = self.postings.latest_manifest()
        fm = self.forward.latest_manifest()
        if pm is None or fm is None:
            return None
        p, f = int(pm["metrics"]["source_epoch"]), int(fm["metrics"]["source_epoch"])
        return p if p > f else None

    @staticmethod
    def _explode(fwd: DataFrame, grams_col: str) -> DataFrame:
        return fwd.select(
            "doc_id", F.posexplode(F.col(grams_col)).alias("_p", "g")
        ).select("g", "doc_id", (F.col("_p") + 1).cast("int").alias("s"))

    # --------------------------------------------------------------- bootstrap
    def bootstrap(self, state_df: DataFrame, source_epoch: int = 0) -> None:
        if self.forward.latest_manifest() is not None:
            return
        fwd = state_df.select(
            "doc_id", token_gram_hashes("tokens", self.k).alias("grams")
        ).localCheckpoint(eager=True)
        _commit_epoch(
            self.postings,
            self.postings_schema,
            self._explode(fwd, "grams").withColumn(
                "bucket", bucket_expr(F.col("g"), self.postings.n_buckets)
            ),
            list(range(self.postings.n_buckets)),
            source_epoch,
            "bootstrap",
        )
        _commit_epoch(
            self.forward,
            self.forward_schema,
            fwd.withColumn(
                "bucket", bucket_expr(F.col("doc_id"), self.forward.n_buckets)
            ),
            list(range(self.forward.n_buckets)),
            source_epoch,
            "bootstrap",
        )

    # ----------------------------------------------------------------- refresh
    def refresh(self, changes_df: DataFrame, source_epoch: int) -> dict:
        pending = self.pending_refresh_epoch
        if pending is not None and source_epoch != pending:
            raise ValueError(
                f"torn refresh detected: postings reached source epoch "
                f"{pending} but forward did not — re-run "
                f"refresh(changes({self.last_source_epoch}, {pending}), "
                f"{pending}) first (idempotent), then continue"
            )
        payload = [c for c in changes_df.columns if c not in
                   ("change_epoch", "batch_id", "op", "bucket")]
        net = latest_per_key(
            changes_df.select("op", "change_epoch", *payload),
            key="doc_id",
            order="change_epoch",
        )
        staged = net.select(
            "doc_id",
            "op",
            F.when(
                F.col("op") == "upsert", token_gram_hashes("tokens", self.k)
            ).alias("_new"),
            bucket_expr(F.col("doc_id"), self.forward.n_buckets).alias("bucket"),
        ).localCheckpoint(eager=True)
        fwd_touched = sorted(
            r["bucket"] for r in staged.select("bucket").distinct().collect()
        )
        old_fwd = self.forward.read_state(buckets=fwd_touched).select(
            "doc_id", F.col("grams").alias("_old")
        )
        trimmed = old_fwd.join(
            F.broadcast(staged.select("doc_id")), "doc_id", "left_semi"
        )
        enriched = staged.join(
            F.broadcast(trimmed), "doc_id", "left"
        ).localCheckpoint(eager=True)

        up = F.col("op") == "upsert"
        post_dels = self._explode(
            enriched.filter(F.col("_old").isNotNull()).select(
                "doc_id", F.col("_old")
            ),
            "_old",
        )
        post_ups = self._explode(
            enriched.filter(up).select("doc_id", F.col("_new")), "_new"
        )
        n_post = _cow_apply(
            self.postings, self.postings_schema, post_ups, post_dels,
            key_cols=["g", "doc_id", "s"],
            bucket_of=lambda: bucket_expr(F.col("g"), self.postings.n_buckets),
            source_epoch=source_epoch,
        )
        fwd_ups = enriched.filter(up).select("doc_id", F.col("_new").alias("grams"))
        fwd_dels = enriched.filter(~up).select("doc_id")
        n_fwd = _cow_apply(
            self.forward, self.forward_schema, fwd_ups, fwd_dels,
            key_cols=["doc_id"],
            bucket_of=lambda: bucket_expr(F.col("doc_id"), self.forward.n_buckets),
            source_epoch=source_epoch,
            always_commit=True,
        )
        return {"forward_rows": n_fwd, "posting_rows": n_post}

    # ------------------------------------------------------------------ query
    def dup_grams(self, min_docs: int = 2) -> DataFrame:
        """Grams appearing in at least ``min_docs`` distinct docs, with
        occurrence counts and the lexicographically-first (doc, position)
        occurrence key — the duplicated-span candidate table that feeds
        span removal, from maintained postings instead of a corpus scan."""
        p = self.postings.read_state()
        first_key = F.concat(
            F.col("doc_id"), F.lit("@"), F.lpad(F.col("s").cast("string"), 6, "0")
        )
        return (
            p.groupBy("g")
            .agg(
                F.count_distinct("doc_id").alias("n_docs"),
                F.count(F.lit(1)).alias("n_occ"),
                F.min(first_key).alias("first_key"),
            )
            .filter(F.col("n_docs") >= min_docs)
        )

    def occurrences(self) -> DataFrame:
        return self.postings.read_state().select("g", "doc_id", "s")

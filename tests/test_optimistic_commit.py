"""Optimistic concurrency: a commit that loses the race for its target
epoch rebases onto the new head when the interloper provably touched
disjoint buckets (Iceberg snapshot-isolation commit protocol) — and
refuses, exactly like the old single-writer behavior, whenever isolation
cannot be proven."""

import pytest
from pyspark.sql import functions as F

from georef_ar_etl_spark import datagen
from georef_ar_etl_spark.engine import CdcEngine
from georef_ar_etl_spark.sinks.snapshot_table import ConflictError, bucket_expr


def _rows(df) -> set:
    return {
        (r["doc_id"], tuple(r["tokens"]), r["n_tok"], r["source"])
        for r in df.select("doc_id", "tokens", "n_tok", "source").collect()
    }


def _keys_by_bucket(spark, keys: list[str], nb: int) -> dict[int, list[str]]:
    out: dict[int, list[str]] = {}
    rows = (
        spark.createDataFrame([(k,) for k in keys], "k string")
        .select("k", bucket_expr(F.col("k"), nb).alias("b"))
        .collect()
    )
    for r in rows:
        out.setdefault(int(r["b"]), []).append(r["k"])
    return out


@pytest.fixture()
def eng(spark, tmp_path):
    initial = datagen.gen_initial_state(160, seed=71, max_len=8)
    e = CdcEngine(spark, str(tmp_path / "occ"), n_buckets=4)
    e.bootstrap(datagen.state_to_df(spark, initial))
    return e


def _update_event(key: str, batch_id: int) -> list[dict]:
    return [{"batch_id": batch_id, "seq": 0, "op": "update", "doc_id": key,
             "tokens": [8, 8], "n_tok": None, "source": "wal"}]


def test_disjoint_dv_commit_rebases_over_concurrent_batch(spark, eng):
    """A deletion-vector erasure prepared against the old head commits at
    head+1 when the racing batch touched other buckets; both effects land."""
    t = eng.table
    nb = t.n_buckets
    keys = sorted(r["doc_id"] for r in eng.state().select("doc_id").collect())
    by_b = _keys_by_bucket(spark, keys, nb)
    bks = sorted(by_b)
    dv_bucket, other_bucket = bks[0], bks[1]
    victim = by_b[dv_bucket][0]
    updated = by_b[other_bucket][0]
    updated2 = by_b[other_bucket][1]

    # simulate the race: the DV apply reads head=0, computes its artifacts,
    # and loses epoch 1 to a concurrent update batch on ANOTHER bucket. We
    # interleave deterministically by injecting the interloper inside the
    # DV path's manifest write via a first attempt WITHOUT retries (proving
    # it conflicts), then the retried attempt must rebase.
    import georef_ar_etl_spark.sinks.snapshot_table as st

    orig = st.SnapshotTable.write_manifest
    plan = {"racers": [(updated, 1), (updated2, 2)]}

    def racing(self, epoch, *a, **kw):
        if plan["racers"] and kw.get("dv_changes") is not None:
            key, bid = plan["racers"].pop(0)
            eng.apply_batch(
                datagen.events_to_df(spark, _update_event(key, bid)),
                batch_id=bid, allow_out_of_order=True,
            )
        return orig(self, epoch, *a, **kw)

    st.SnapshotTable.write_manifest = racing
    try:
        with pytest.raises(ConflictError):
            t.delete_keys_dv([victim], batch_id=7)
        rep = t.delete_keys_dv([victim], batch_id=8, max_commit_retries=2)
    finally:
        st.SnapshotTable.write_manifest = orig

    assert rep["metrics"]["rebased_from_epoch"] is not None
    st_rows = _rows(eng.state())
    ids = {r[0] for r in st_rows}
    assert victim not in ids  # the erasure landed
    assert (updated, (8, 8), 2, "wal") in st_rows  # racer 1 (pre-retry)
    assert (updated2, (8, 8), 2, "wal") in st_rows  # racer 2 (mid-retry)
    # the interloper's bucket maps carried into the rebased head
    head = t.latest_manifest()
    assert head["epoch"] == rep["epoch"]
    assert head["total_rows"] == len(st_rows)


def test_overlapping_buckets_refuse_rebase(spark, eng):
    t = eng.table
    keys = sorted(r["doc_id"] for r in eng.state().select("doc_id").collect())
    by_b = _keys_by_bucket(spark, keys, t.n_buckets)
    b = sorted(by_b)[0]
    victim, neighbor = by_b[b][0], by_b[b][1]  # SAME bucket

    import georef_ar_etl_spark.sinks.snapshot_table as st

    orig = st.SnapshotTable.write_manifest
    fired = {"done": False}

    def racing(self, epoch, *a, **kw):
        if not fired["done"] and kw.get("dv_changes") is not None:
            fired["done"] = True
            eng.apply_batch(
                datagen.events_to_df(spark, _update_event(neighbor, 1)),
                batch_id=1,
            )
        return orig(self, epoch, *a, **kw)

    st.SnapshotTable.write_manifest = racing
    try:
        with pytest.raises(ConflictError, match="also touched"):
            t.delete_keys_dv([victim], batch_id=8, max_commit_retries=2)
    finally:
        st.SnapshotTable.write_manifest = orig


def test_compact_rebases_over_concurrent_disjoint_batch(spark, eng, monkeypatch):
    """Table maintenance racing the stream writer — the canonical use:
    compaction resolved its buckets, a fresh batch lands on OTHER buckets,
    the compaction commit rebases instead of aborting the whole rewrite."""
    t = eng.table
    keys = sorted(r["doc_id"] for r in eng.state().select("doc_id").collect())
    by_b = _keys_by_bucket(spark, keys, t.n_buckets)
    bks = sorted(by_b)
    # dirty exactly one bucket so compact touches only it
    dirty_key = by_b[bks[0]][0]
    eng.apply_batch(
        datagen.events_to_df(spark, _update_event(dirty_key, 1)), batch_id=1
    )
    assert str(bks[0]) in (t.latest_manifest().get("bucket_deltas") or {})
    racer_key = by_b[bks[1]][0]

    orig_write_data = t.write_data
    fired = {"done": False}

    def race_then_write(epoch, df, **kw):
        written = orig_write_data(epoch, df, **kw)
        if not fired["done"]:
            fired["done"] = True
            eng.apply_batch(
                datagen.events_to_df(spark, _update_event(racer_key, 2)),
                batch_id=2,
            )
        return written

    monkeypatch.setattr(t, "write_data", race_then_write)
    man = eng.compact(min_deltas=1, max_commit_retries=2)
    monkeypatch.undo()

    assert man is not None
    assert man["metrics"].get("rebased_from_epoch") is not None
    assert not man.get("bucket_deltas", {}).get(str(bks[0]))
    rows = _rows(eng.state())
    assert (dirty_key, (8, 8), 2, "wal") in rows
    assert (racer_key, (8, 8), 2, "wal") in rows
    assert man["total_rows"] == len(rows)


def test_rescale_in_between_refuses_rebase(spark, eng):
    t = eng.table
    keys = sorted(r["doc_id"] for r in eng.state().select("doc_id").collect())
    by_b = _keys_by_bucket(spark, keys, t.n_buckets)
    victim = by_b[sorted(by_b)[0]][0]

    import georef_ar_etl_spark.sinks.snapshot_table as st

    orig = st.SnapshotTable.write_manifest
    fired = {"done": False}

    def racing(self, epoch, *a, **kw):
        if not fired["done"] and kw.get("dv_changes") is not None:
            fired["done"] = True
            eng.rescale(8)
        return orig(self, epoch, *a, **kw)

    st.SnapshotTable.write_manifest = racing
    try:
        with pytest.raises(ConflictError, match="rescale"):
            t.delete_keys_dv([victim], batch_id=9, max_commit_retries=2)
    finally:
        st.SnapshotTable.write_manifest = orig

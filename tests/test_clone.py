"""Deep CLONE (SnapshotTable.clone_to / CdcEngine.clone_to): fork a table
at a snapshot into a standalone table — the experiment-fork primitive.

Covers: fork-state equality (incl. MOR chains and deletion vectors carried
verbatim), post-fork divergence isolation both ways, exactly-once ledger
carry (pre-fork redelivery no-op / tampered conflict), rollback-
invalidation carry, tag/epoch-pinned clones after source vacuum, refusal
to clone onto an existing table, and clone maintenance (compact/vacuum/
further batches).
"""

import pytest
from pyspark.sql import functions as F

from georef_ar_etl_spark import datagen
from georef_ar_etl_spark.engine import CdcEngine
from georef_ar_etl_spark.sinks.snapshot_table import ConflictError


def _rows(df) -> dict:
    return {
        r["doc_id"]: (tuple(r["tokens"]), r["n_tok"], r["source"])
        for r in df.select("doc_id", "tokens", "n_tok", "source").collect()
    }


@pytest.fixture()
def rig(spark, tmp_path):
    initial = datagen.gen_initial_state(200, seed=91, max_len=12)
    ids = [d["doc_id"] for d in initial]
    eng = CdcEngine(spark, str(tmp_path / "src"), n_buckets=4, mor_max_deltas=3)
    eng.bootstrap(datagen.state_to_df(spark, initial))
    evs = datagen.gen_events(ids, n_events=120, n_batches=3, seed=7)

    def bdf(b):
        return datagen.events_to_df(
            spark, [e for e in evs if e["batch_id"] == b]
        )

    return eng, bdf, tmp_path


def test_clone_forks_and_diverges(spark, rig):
    eng, bdf, tmp_path = rig
    eng.apply_batch(bdf(0), 0)
    eng.apply_batch(bdf(1), 1)
    fork = _rows(eng.state())

    clone = eng.clone_to(str(tmp_path / "dst"))
    assert _rows(clone.state()) == fork

    # source sweeps; clone applies batch 2 — neither sees the other
    eng.delete_where([("source", "=", "wal")], batch_id=5)
    clone.apply_batch(bdf(2), 2)
    c = _rows(clone.state())
    s = _rows(eng.state())
    assert any(v[2] == "wal" for v in c.values())
    assert not any(v[2] == "wal" for v in s.values())

    # pre-fork batch redelivers on the clone as a verified no-op
    clone.apply_batch(bdf(1), 1)
    assert _rows(clone.state()) == c
    # ... and a tampered pre-fork redelivery conflicts
    with pytest.raises(ConflictError):
        clone.apply_batch(bdf(0).limit(3), 1, allow_out_of_order=True)

    # clone maintenance: compact + vacuum + a further batch all work
    clone.compact(min_deltas=1)
    clone.vacuum(keep_last=1)
    assert _rows(clone.state()) == c


def test_clone_refuses_existing_table(spark, rig):
    eng, bdf, tmp_path = rig
    eng.apply_batch(bdf(0), 0)
    eng.clone_to(str(tmp_path / "dst"))
    with pytest.raises(ValueError, match="already a table"):
        eng.clone_to(str(tmp_path / "dst"))


def test_clone_of_tag_survives_source_vacuum(spark, rig):
    """Clone a TAG-pinned snapshot after the source moved on, compacted and
    vacuumed — the clone must reproduce the pinned fold exactly (tags keep
    the referenced files alive; the clone copies them)."""
    eng, bdf, tmp_path = rig
    eng.apply_batch(bdf(0), 0)
    eng.create_tag("fork-point")
    pinned = _rows(eng.state())
    eng.apply_batch(bdf(1), 1)
    eng.apply_batch(bdf(2), 2)
    eng.compact(min_deltas=1)
    eng.vacuum(keep_last=1)

    clone = eng.clone_to(str(tmp_path / "dst"), tag="fork-point")
    assert _rows(clone.state()) == pinned
    # batches the source committed AFTER the fork point re-APPLY on the
    # clone (they are not in the clone's ledger)
    clone.apply_batch(bdf(1), 1)
    assert _rows(clone.state()) != pinned


def test_clone_carries_deletion_vectors(spark, rig):
    eng, bdf, tmp_path = rig
    eng.apply_batch(bdf(0), 0)
    live = sorted(_rows(eng.state()))[:10]
    eng.delete_keys_dv(live, batch_id=3)
    want = _rows(eng.state())
    assert not set(live) & set(want)

    clone = eng.clone_to(str(tmp_path / "dst"))
    assert _rows(clone.state()) == want
    m = clone.table.latest_manifest()
    assert m.get("bucket_dvs"), "DV map should carry into the clone"


def test_clone_carries_rollback_invalidation(spark, rig):
    """A batch the source rolled back BEFORE the fork must re-apply on the
    clone (the invalidation fact carries); one rolled back AFTER the fork
    must not affect the clone."""
    eng, bdf, tmp_path = rig
    eng.apply_batch(bdf(0), 0)
    e1 = eng.apply_batch(bdf(1), 1)["epoch"]
    eng.rollback(e1 - 1)  # invalidates batch 1
    pre = _rows(eng.state())

    clone = eng.clone_to(str(tmp_path / "dst"))
    assert _rows(clone.state()) == pre
    # batch 1 re-applies on the clone exactly as it would on the source
    clone.apply_batch(bdf(1), 1)
    eng.apply_batch(bdf(1), 1)
    assert _rows(clone.state()) == _rows(eng.state())

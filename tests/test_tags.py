"""Named snapshot refs (tags): pin an epoch so vacuum retains it — the
reproducibility primitive a training run uses to record exactly which table
state it consumed (Iceberg ``tags`` analogue)."""

import os

import pytest

from georef_ar_etl_spark import datagen
from georef_ar_etl_spark.engine import CdcEngine
from georef_ar_etl_spark.sinks.snapshot_table import ConflictError


def _rows(df) -> set:
    return {
        (r["doc_id"], tuple(r["tokens"]), r["n_tok"], r["source"])
        for r in df.select("doc_id", "tokens", "n_tok", "source").collect()
    }


@pytest.fixture()
def eng(spark, tmp_path):
    initial = datagen.gen_initial_state(120, seed=31, max_len=8)
    e = CdcEngine(spark, str(tmp_path / "tags"), n_buckets=2, mor_max_deltas=2)
    e.bootstrap(datagen.state_to_df(spark, initial))
    events = datagen.gen_events(
        [r["doc_id"] for r in initial], n_events=60, n_batches=4, seed=32,
        max_len=8,
    )
    e.replay(datagen.events_to_df(spark, events), batch_ids=[0, 1])
    return e, events


def test_tag_pins_across_batches_vacuum_and_maintenance(spark, eng):
    e, events = eng
    pinned = _rows(e.state())
    ref = e.create_tag("train-run-1", description="what run 1 read")
    assert ref["epoch"] == e.table.latest_manifest()["epoch"]

    # later batches + compaction move the head; the tag does not move
    e.replay(datagen.events_to_df(spark, events), batch_ids=[2, 3])
    e.compact(min_deltas=1)
    assert _rows(e.state(tag="train-run-1")) == pinned
    assert _rows(e.state()) != pinned

    # vacuum keeps the pinned epoch (manifest AND data/delta dirs) while
    # expiring untagged intermediates
    head_before = e.table.latest_manifest()["epoch"]
    rep = e.vacuum(keep_last=1)
    assert rep["retained_epochs"] == [ref["epoch"], head_before]
    assert _rows(e.state(tag="train-run-1")) == pinned
    assert _rows(e.state(epoch=ref["epoch"])) == pinned  # epoch read too

    # drop the tag → next vacuum reclaims it
    e.drop_tag("train-run-1")
    rep2 = e.vacuum(keep_last=1)
    assert ref["epoch"] not in rep2["retained_epochs"]
    with pytest.raises(KeyError):
        e.state(tag="train-run-1").collect()
    # the head still reads fine after the sweep
    assert len(_rows(e.state())) > 0


def test_tag_immutability_and_validation(spark, eng):
    e, _ = eng
    ref = e.create_tag("pin")
    assert e.create_tag("pin") == ref  # same-epoch re-create is idempotent

    ev = [{"batch_id": 2, "seq": 0, "op": "insert", "doc_id": "0009999999991",
           "tokens": [1], "n_tok": None, "source": "wal"}]
    e.apply_batch(datagen.events_to_df(spark, ev), batch_id=2)
    with pytest.raises(ConflictError):
        e.create_tag("pin")  # re-pointing an existing tag is refused
    with pytest.raises(ValueError):
        e.create_tag("bad/name")
    with pytest.raises(KeyError):
        e.drop_tag("never-created")
    with pytest.raises(KeyError):
        e.create_tag("ghost", epoch=999)

    assert set(e.tags()) == {"pin"}
    # tagging an EXPIRED epoch is refused
    e.drop_tag("pin")
    e.vacuum(keep_last=1)
    with pytest.raises(KeyError):
        e.create_tag("late", epoch=ref["epoch"])


def test_as_of_timestamp_time_travel(spark, eng):
    e, events = eng
    m1 = e.table.latest_manifest()
    state1 = _rows(e.state())
    e.replay(datagen.events_to_df(spark, events), batch_ids=[2, 3])
    m2 = e.table.latest_manifest()

    # between m1 and the NEXT commit → resolves to m1 exactly
    m_next = e.table.manifest_for_epoch(m1["epoch"] + 1)
    ts_mid = (m1["committed_unix"] + m_next["committed_unix"]) / 2
    assert _rows(e.state(as_of=ts_mid)) == state1
    # at/after head → head; before the table existed → KeyError
    assert _rows(e.state(as_of=m2["committed_unix"] + 1)) == _rows(e.state())
    first = e.table.manifest_for_epoch(0)["committed_unix"]
    with pytest.raises(KeyError):
        e.state(as_of=first - 10)
    with pytest.raises(ValueError):
        e.state(epoch=0, as_of=ts_mid)
    # vacuum trims the resolvable range to retained snapshots
    e.vacuum(keep_last=1)
    with pytest.raises(KeyError):
        e.state(as_of=ts_mid)


def test_tagged_mor_epoch_keeps_its_delta_chain_through_vacuum(spark, eng):
    e, events = eng
    man = e.table.latest_manifest()
    assert man.get("bucket_deltas")  # the pinned epoch is MOR-dirty
    pinned = _rows(e.state())
    e.create_tag("dirty-pin")
    e.replay(datagen.events_to_df(spark, events), batch_ids=[2, 3])
    e.compact(min_deltas=1)
    e.vacuum(keep_last=1)
    # the pinned epoch's delta dirs survived the sweep
    for chain in man["bucket_deltas"].values():
        for d in chain:
            assert os.path.isdir(os.path.join(e.table.root, d)), d
    assert _rows(e.state(tag="dirty-pin")) == pinned


def test_vacuum_dry_run_and_age_floor(spark, tmp_path):
    """Delta VACUUM RETAIN/DRY RUN analogue: the dry run reports the exact
    plan the real vacuum executes without deleting; an age floor retains
    snapshots younger than it regardless of keep_last."""
    import os

    from georef_ar_etl_spark import datagen
    from georef_ar_etl_spark.engine import CdcEngine

    initial = datagen.gen_initial_state(150, seed=9, max_len=10)
    ids = [d["doc_id"] for d in initial]
    eng = CdcEngine(spark, str(tmp_path / "vac"), n_buckets=4, mor_max_deltas=2)
    eng.bootstrap(datagen.state_to_df(spark, initial))
    evs = datagen.gen_events(ids, n_events=120, n_batches=3, seed=3)
    for b in range(3):
        eng.apply_batch(
            datagen.events_to_df(spark, [e for e in evs if e["batch_id"] == b]), b
        )
    state = {r["doc_id"] for r in eng.state().collect()}
    root = eng.table.root

    dr = eng.vacuum(keep_last=1, dry_run=True)
    assert dr["dry_run"] is True
    assert dr["removed_dirs"] and dr["freed_bytes"] > 0
    assert all(os.path.isdir(os.path.join(root, d)) for d in dr["removed_dirs"])
    assert len(eng.table.manifests()) >= 4  # nothing expired

    # everything committed seconds ago → the age floor retains all
    r = eng.vacuum(keep_last=1, older_than_s=3600)
    assert r["removed_manifests"] == [] and r["removed_dirs"] == []

    # the real vacuum executes exactly the dry-run plan
    r2 = eng.vacuum(keep_last=1)
    assert sorted(r2["removed_dirs"]) == sorted(dr["removed_dirs"])
    assert r2["freed_bytes"] == dr["freed_bytes"]
    assert {x["doc_id"] for x in eng.state().collect()} == state

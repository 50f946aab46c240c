"""Zero-copy named branches (SnapshotTable.create_branch / fast_forward —
Iceberg branch refs / Nessie branches): fork a table at a snapshot with NO
data copy, diverge on the branch, then publish back with fast_forward or
discard with drop_branch.

Covers: zero-copy fork (state equality + literally no data files written),
fork pin surviving parent vacuum/compact, divergence isolation both ways,
exactly-once ledger carry onto the branch AND back onto the parent after
fast-forward, fast-forward state/changelog equivalence, conflict on a
diverged parent and on rollback-past-fork, crash-resume of a half-published
fast-forward, drop refusal/force, and idempotent re-create.

Reference analogue: the reference rebuilds entity tables in place and
diffs by re-running the pipeline (georef_ar_etl/process.py:206-257);
branches are that workflow for a table too large to rebuild.
"""

import os

import pytest

from georef_ar_etl_spark import datagen
from georef_ar_etl_spark.engine import CdcEngine
from georef_ar_etl_spark.sinks.snapshot_table import ConflictError, SnapshotTable


def _rows(df) -> dict:
    return {
        r["doc_id"]: (tuple(r["tokens"]), r["n_tok"], r["source"])
        for r in df.select("doc_id", "tokens", "n_tok", "source").collect()
    }


def _data_files(root: str) -> list[str]:
    out = []
    droot = os.path.join(root, "data")
    for dp, _dn, fns in os.walk(droot):
        out += [os.path.join(dp, f) for f in fns if f.endswith(".parquet")]
    return out


@pytest.fixture()
def rig(spark, tmp_path):
    initial = datagen.gen_initial_state(200, seed=91, max_len=12)
    ids = [d["doc_id"] for d in initial]
    eng = CdcEngine(spark, str(tmp_path / "t"), n_buckets=4, mor_max_deltas=3)
    eng.bootstrap(datagen.state_to_df(spark, initial))
    evs = datagen.gen_events(ids, n_events=120, n_batches=3, seed=7)

    def bdf(b):
        return datagen.events_to_df(
            spark, [e for e in evs if e["batch_id"] == b]
        )

    return eng, bdf


def test_branch_is_zero_copy_and_isolated(spark, rig):
    eng, bdf = rig
    eng.apply_batch(bdf(0), 0)
    fork = _rows(eng.state())

    br = eng.create_branch("exp")
    # zero-copy: the fork wrote NO data files under the branch root
    assert _data_files(br.table.root) == []
    assert _rows(br.state()) == fork
    # the fork pin exists on the parent
    assert "branch:exp" in eng.tags()

    # diverge both ways: neither side sees the other
    br.apply_batch(bdf(1), 1)
    eng.delete_where([("source", "=", "wal")], batch_id=50)
    b = _rows(br.state())
    s = _rows(eng.state())
    assert b != s
    assert any(v[2] == "wal" for v in b.values())
    assert not any(v[2] == "wal" for v in s.values())
    # branch commits wrote data ONLY under the branch root
    assert _data_files(br.table.root) != []

    # exactly-once carried to the branch: pre-fork redelivery no-ops ...
    br.apply_batch(bdf(0), 0)
    assert _rows(br.state()) == b
    # ... and a tampered pre-fork redelivery conflicts
    with pytest.raises(ConflictError):
        br.apply_batch(bdf(1).limit(3), 0, allow_out_of_order=True)


def test_branch_survives_parent_maintenance(spark, rig):
    eng, bdf = rig
    eng.apply_batch(bdf(0), 0)
    br = eng.create_branch("exp")
    fork = _rows(br.state())

    # parent rewrites + vacuums aggressively; the pin keeps the fork's
    # files alive, so the zero-copy branch still reads them
    eng.apply_batch(bdf(1), 1)
    eng.apply_batch(bdf(2), 2)
    eng.compact(min_deltas=0)
    eng.vacuum(keep_last=1)
    assert _rows(br.state()) == fork

    # branch-side maintenance never touches parent files
    br.apply_batch(bdf(1), 1)
    want = _rows(br.state())
    br.table.compact(min_deltas=0)
    br.table.vacuum(keep_last=1)
    assert _rows(br.state()) == want
    assert _rows(eng.state()) != want  # parent unaffected


def test_fast_forward_publishes_and_removes_branch(spark, rig):
    eng, bdf = rig
    eng.apply_batch(bdf(0), 0)
    fork_epoch = eng.table.latest_manifest()["epoch"]

    br = eng.create_branch("exp")
    br.apply_batch(bdf(1), 1)
    br.apply_batch(bdf(2), 2)
    want = _rows(br.state())
    br_head = br.table.latest_manifest()["epoch"]

    rep = eng.fast_forward("exp")
    assert rep["published_epochs"] == [fork_epoch + 1, fork_epoch + 2]
    assert eng.table.latest_manifest()["epoch"] == br_head
    assert _rows(eng.state()) == want
    # branch + pin are gone; its data dirs moved under the parent
    assert eng.branches() == {}
    assert "branch:exp" not in eng.tags()
    assert not os.path.isdir(os.path.join(eng.table.root, "branches", "exp"))

    # the published epochs are first-class history: changelog streams them
    ch = eng.table.read_changes(fork_epoch)
    assert ch.count() > 0
    # exactly-once: a batch committed ON the branch redelivers as a no-op
    eng.apply_batch(bdf(2), 2)
    assert _rows(eng.state()) == want
    # and maintenance over the moved dirs is sound
    eng.compact(min_deltas=0)
    eng.vacuum(keep_last=1)
    assert _rows(eng.state()) == want


def test_fast_forward_rebases_over_parent_compaction(spark, rig):
    eng, bdf = rig
    eng.apply_batch(bdf(0), 0)
    fork_epoch = eng.table.latest_manifest()["epoch"]
    br = eng.create_branch("exp")
    br.apply_batch(bdf(1), 1)
    br.apply_batch(bdf(2), 2)
    want = _rows(br.state())

    # routine maintenance on the parent while the experiment runs: rows
    # identical, so fast-forward REBASES over it instead of conflicting
    eng.compact(min_deltas=0)
    compact_epoch = eng.table.latest_manifest()["epoch"]
    assert compact_epoch > fork_epoch

    rep = eng.fast_forward("exp")
    # branch epochs renumbered past the compaction commit
    assert rep["published_epochs"] == [compact_epoch + 1, compact_epoch + 2]
    assert _rows(eng.state()) == want
    # provenance recorded on the published manifests
    m = eng.table.latest_manifest()
    assert m["metrics"]["fast_forward"]["branch"] == "exp"
    # rebased history is first-class: maintenance + more batches work
    eng.compact(min_deltas=0)
    eng.vacuum(keep_last=1)
    assert _rows(eng.state()) == want


def test_fast_forward_conflicts_on_diverged_parent(spark, rig):
    eng, bdf = rig
    eng.apply_batch(bdf(0), 0)
    br = eng.create_branch("exp")
    br.apply_batch(bdf(1), 1)
    keep = _rows(br.state())

    eng.apply_batch(bdf(2), 2)  # parent advances independently
    with pytest.raises(ConflictError, match="advanced independently"):
        eng.fast_forward("exp")
    # the failed fast-forward mutated nothing: branch intact, reusable
    assert _rows(br.state()) == keep
    assert "exp" in eng.branches()


def test_fast_forward_conflicts_after_parent_rollback(spark, rig):
    eng, bdf = rig
    eng.apply_batch(bdf(0), 0)
    eng.apply_batch(bdf(1), 1)
    br = eng.create_branch("exp")
    br.apply_batch(bdf(2), 2)

    # rollback commits a RESTORING manifest (head moves forward), so the
    # parent has advanced off the branch chain — divergence conflict
    eng.rollback(eng.table.latest_manifest()["epoch"] - 1)
    with pytest.raises(ConflictError, match="re-fork"):
        eng.fast_forward("exp")


def test_fast_forward_resumes_after_crash(spark, rig, monkeypatch):
    eng, bdf = rig
    eng.apply_batch(bdf(0), 0)
    br = eng.create_branch("exp")
    br.apply_batch(bdf(1), 1)
    br.apply_batch(bdf(2), 2)
    want = _rows(br.state())
    br_head = br.table.latest_manifest()["epoch"]

    # crash right after the FIRST branch epoch publishes (its manifest is
    # linked and metrics logging is the next statement)
    real = SnapshotTable._log_commit_metrics
    calls = {"n": 0}

    def boom(self, manifest):
        calls["n"] += 1
        if calls["n"] == 1:
            raise OSError("injected crash mid-fast-forward")
        return real(self, manifest)

    monkeypatch.setattr(SnapshotTable, "_log_commit_metrics", boom)
    with pytest.raises(OSError, match="injected"):
        eng.fast_forward("exp")
    monkeypatch.setattr(SnapshotTable, "_log_commit_metrics", real)

    # a prefix published; the re-run skips it by digest and finishes
    assert eng.table.latest_manifest()["epoch"] < br_head
    rep = eng.fast_forward("exp")
    assert rep["new_head"] == br_head
    assert _rows(eng.state()) == want
    assert eng.branches() == {}


def test_drop_branch_refuses_unmerged_then_forces(spark, rig):
    eng, bdf = rig
    eng.apply_batch(bdf(0), 0)
    br = eng.create_branch("exp")
    br.apply_batch(bdf(1), 1)

    with pytest.raises(ConflictError, match="unmerged"):
        eng.drop_branch("exp")
    rep = eng.drop_branch("exp", force=True)
    assert rep["discarded_commits"] == 1
    assert eng.branches() == {}
    assert "branch:exp" not in eng.tags()


def test_create_branch_idempotent_and_validated(spark, rig):
    eng, bdf = rig
    eng.apply_batch(bdf(0), 0)
    eng.create_branch("exp")
    # idempotent at the same snapshot
    eng.table.create_branch("exp")
    assert list(eng.branches()) == ["exp"]

    eng.apply_batch(bdf(1), 1)
    # re-forking an existing name at a new snapshot conflicts
    with pytest.raises(ConflictError, match="already exists"):
        eng.create_branch("exp")
    for bad in ("", "a/b", "..", " x", "a:b"):
        with pytest.raises(ValueError):
            eng.table.create_branch(bad)
    with pytest.raises(KeyError):
        eng.table.branch("nope")

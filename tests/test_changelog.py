"""Incremental changelog reads (SnapshotTable.read_changes): applying the
changelog of (e-1, e] onto the materialized state at e-1 must reproduce the
state at e exactly — across delta epochs, rewrite/inline-compaction epochs,
schema evolution, and maintenance. The replay-the-changelog check is the
changelog's own oracle: it holds only if emitted rows are exactly the net
row-level differences."""

from georef_ar_etl_spark import datagen
from georef_ar_etl_spark.engine import CdcEngine


def _rows(df, cols=("doc_id", "tokens", "n_tok", "source")):
    out = {}
    for r in df.collect():
        d = r.asDict(recursive=True)
        out[d["doc_id"]] = tuple(
            tuple(d[c]) if isinstance(d.get(c), list) else d.get(c) for c in cols
        )
    return out


def _apply_changelog(state: dict, changes, cols=("doc_id", "tokens", "n_tok", "source")):
    """Replay changelog rows (epoch asc; within one epoch keys are unique)
    onto a {doc_id: row-tuple} dict."""
    for r in sorted(changes, key=lambda r: (r["change_epoch"], r["doc_id"])):
        d = r.asDict(recursive=True)
        if d["op"] == "delete":
            state.pop(d["doc_id"], None)
        else:
            state[d["doc_id"]] = tuple(
                tuple(d[c]) if isinstance(d.get(c), list) else d.get(c) for c in cols
            )
    return state


def test_changelog_replays_to_every_epoch(spark, tmp_path):
    """Cumulative check over a workload that exercises BOTH physical paths
    (delta epochs and inline-compaction rewrites, mor_max_deltas=2)."""
    initial = datagen.gen_initial_state(300, seed=81, max_len=12)
    events = datagen.gen_events(
        [r["doc_id"] for r in initial], n_events=240, n_batches=6, seed=82, max_len=12
    )
    eng = CdcEngine(spark, str(tmp_path / "t"), n_buckets=4, mor_max_deltas=2)
    eng.bootstrap(datagen.state_to_df(spark, initial))
    manifests = eng.replay(datagen.events_to_df(spark, events))
    modes = [m["metrics"]["merge_modes"] for m in manifests]
    assert any(mm["delta"] for mm in modes) and any(mm["rewrite"] for mm in modes), \
        "workload must exercise both physical paths"

    # epoch-by-epoch: state(e-1) + changes(e-1, e] == state(e)
    first = manifests[0]["epoch"]
    for m in manifests:
        e = m["epoch"]
        before = _rows(eng.state(epoch=e - 1))
        chg = eng.changes(e - 1, e).collect()
        assert _apply_changelog(dict(before), chg) == _rows(eng.state(epoch=e)), e
        # every changelog row is stamped with its epoch + batch
        assert all(r["change_epoch"] == e and r["batch_id"] == m["batch_id"] for r in chg)

    # one multi-epoch read replays bootstrap → head in a single pass
    head = manifests[-1]["epoch"]
    base = _rows(eng.state(epoch=first - 1))
    allchg = eng.changes(first - 1, head).collect()
    assert _apply_changelog(dict(base), allchg) == _rows(eng.state())

    # delta epochs cost only the delta bytes: their changelog rows equal the
    # batch's effective action count recorded in the manifest
    for m in manifests:
        if m["metrics"]["merge_modes"]["delta"] and not m["metrics"]["merge_modes"]["rewrite"]:
            n = eng.changes(m["epoch"] - 1, m["epoch"]).count()
            acts = m["metrics"]["actions"]
            assert n == sum(
                acts.get(a, 0) for a in ("insert", "update", "delete")
            ), m["epoch"]


def test_changelog_skips_compaction_and_survives_evolution(spark, tmp_path):
    initial = datagen.gen_initial_state(200, seed=83, max_len=10)
    events = datagen.gen_events(
        [r["doc_id"] for r in initial], n_events=120, n_batches=4, seed=84,
        max_len=10, evolve_from_batch=2,
    )
    eng = CdcEngine(spark, str(tmp_path / "t"), n_buckets=4)
    eng.bootstrap(datagen.state_to_df(spark, initial))
    for b in range(4):
        batch = [e for e in events if e["batch_id"] == b]
        if b < 2:
            batch = [{k: v for k, v in e.items() if k != "src_meta"} for e in batch]
        eng.apply_batch(datagen.events_to_df(spark, batch), b)
    pre_compact_head = eng.table.latest_manifest()["epoch"]
    cm = eng.compact()
    assert cm is not None

    # compaction emits no changes; the range crossing it replays correctly
    assert eng.changes(pre_compact_head, cm["epoch"]).count() == 0
    cols = ("doc_id", "tokens", "n_tok", "source", "src_meta")
    base = _rows(eng.state(epoch=0), cols)
    chg = eng.changes(0, cm["epoch"]).collect()
    assert _apply_changelog(dict(base), chg, cols) == _rows(eng.state(), cols)
    # evolution: pre-evolution epochs emit null in the added column
    early = [r for r in chg if r["change_epoch"] == 1 and r["op"] == "upsert"]
    assert early and all(r["src_meta"] is None for r in early)

    # empty range → empty frame with the changelog schema
    empty = eng.changes(cm["epoch"])
    assert empty.count() == 0
    assert empty.columns[:3] == ["change_epoch", "batch_id", "op"]


def test_changelog_value_diff_suppresses_same_value_delta_writes(spark, tmp_path):
    """value_diff=True (ADVICE r03): mode-independent rows — a delta-epoch
    update that wrote a value identical to the parent's is suppressed, while
    genuinely-changed rows still come through; default (event-based) mode
    emits both."""
    initial = datagen.gen_initial_state(50, seed=91, max_len=8)
    a, b = initial[0], initial[1]
    events = [
        # same-value update: tokens already normalized in gen_initial_state
        {"batch_id": 0, "seq": 1, "op": "update", "doc_id": a["doc_id"],
         "tokens": list(a["tokens"]), "n_tok": a["n_tok"], "source": a["source"]},
        {"batch_id": 0, "seq": 2, "op": "update", "doc_id": b["doc_id"],
         "tokens": [7, 8, 9], "n_tok": 3, "source": "wal"},
    ]
    eng = CdcEngine(spark, str(tmp_path / "t"), n_buckets=1)
    eng.bootstrap(datagen.state_to_df(spark, initial))
    m = eng.apply_batch(datagen.events_to_df(spark, events), 0)
    assert m["metrics"]["merge_modes"]["delta"] == 1, "test requires the delta path"

    default_rows = {r["doc_id"]: r["op"] for r in eng.changes(0).collect()}
    assert default_rows == {a["doc_id"]: "upsert", b["doc_id"]: "upsert"}

    vd = eng.changes(0, value_diff=True).collect()
    assert {r["doc_id"] for r in vd} == {b["doc_id"]}
    assert vd[0]["op"] == "upsert" and list(vd[0]["tokens"]) == [7, 8, 9]

"""Merge-on-read physical layer (sinks/mor.py + copart_merge delta mode):
small batches append per-bucket delta files instead of rewriting buckets;
reads resolve base+deltas; inline + explicit compaction clear chains; vacuum
respects referenced deltas and in-flight epochs. Visible state semantics are
IDENTICAL to copy-on-write — every test checks against the Python oracle.
"""

import os

from georef_ar_etl_spark import datagen
from georef_ar_etl_spark.engine import CdcEngine
from georef_ar_etl_spark.oracle import apply_events, state_as_sorted_rows


def _state_rows(df):
    return [
        (r["doc_id"], list(r["tokens"]), r["n_tok"], r["source"])
        for r in df.orderBy("doc_id").collect()
    ]


def _oracle_rows(initial, events, upto_batch=None):
    sub = events if upto_batch is None else [
        e for e in events if e["batch_id"] <= upto_batch
    ]
    state, _ = apply_events({r["doc_id"]: dict(r) for r in initial}, sub)
    return [
        (r["doc_id"], list(r["tokens"]), r["n_tok"], r["source"])
        for r in state_as_sorted_rows(state)
    ]


def _mor_workload():
    """400-row table, 8 batches of ~10 events: per-bucket change groups are
    far below the rewrite ratio, so the merge MUST choose delta mode."""
    initial = datagen.gen_initial_state(400, seed=51, max_len=16)
    events = datagen.gen_events(
        [r["doc_id"] for r in initial], n_events=80, n_batches=8, seed=52, max_len=16
    )
    return initial, events


def test_mor_delta_path_matches_oracle_and_bounds_chain(spark, tmp_path):
    initial, events = _mor_workload()
    eng = CdcEngine(spark, str(tmp_path / "t"), n_buckets=4, mor_max_deltas=3)
    eng.bootstrap(datagen.state_to_df(spark, initial))
    manifests = eng.replay(datagen.events_to_df(spark, events))

    # delta mode actually ran (the point of the test workload)
    n_delta = sum(m["metrics"]["merge_modes"]["delta"] for m in manifests)
    assert n_delta > 0, "workload sized for MOR but no delta writes happened"

    # every committed manifest keeps each bucket's chain within the cap:
    # the (cap+1)-th touch must compact inline via a full rewrite
    for m in manifests:
        for b, chain in (m.get("bucket_deltas") or {}).items():
            assert 1 <= len(chain) <= 3, (m["epoch"], b, chain)
    # with 8 batches over 4 buckets the cap must actually have been hit
    assert any(
        m["metrics"]["merge_modes"]["rewrite"] > 0 for m in manifests[3:]
    ), "inline compaction never triggered"

    # final state identical to the oracle (rows + payload)
    assert _state_rows(eng.state()) == _oracle_rows(initial, events)

    # manifest row accounting stays exact under MOR (assert_size is 0-job)
    assert eng.table.latest_manifest()["total_rows"] == len(
        _oracle_rows(initial, events)
    )

    # time travel onto a delta epoch resolves that epoch's chain exactly
    assert _state_rows(eng.state(epoch=3)) == _oracle_rows(initial, events, upto_batch=2)

    # physical shape: delta epochs wrote delta=B dirs, not bucket=B dirs
    delta_epochs = [
        m["epoch"] for m in manifests if m["metrics"]["merge_modes"]["delta"]
        and not m["metrics"]["merge_modes"]["rewrite"]
    ]
    assert delta_epochs
    edir = os.path.join(str(tmp_path / "t"), "data", f"epoch={delta_epochs[0]}")
    names = sorted(os.listdir(edir))
    assert all(n.startswith("delta=") for n in names) and names


def test_mor_resume_and_idempotent_redelivery(spark, tmp_path):
    initial, events = _mor_workload()
    root = str(tmp_path / "t")
    eng = CdcEngine(spark, root, n_buckets=4)
    eng.bootstrap(datagen.state_to_df(spark, initial))
    for b in (0, 1, 2):
        eng.apply_batch(
            datagen.events_to_df(spark, [e for e in events if e["batch_id"] == b]), b
        )
    # crash → fresh engine over the same root resumes past committed batches
    resumed = CdcEngine(spark, root, n_buckets=4)
    manifests = resumed.replay(datagen.events_to_df(spark, events))
    assert len(manifests) == 8
    assert _state_rows(resumed.state()) == _oracle_rows(initial, events)
    # re-delivery of a delta-mode batch is a verified no-op
    before = _state_rows(resumed.state())
    resumed.replay(datagen.events_to_df(spark, events))
    assert _state_rows(resumed.state()) == before


def test_compact_clears_chains_and_vacuum_reclaims(spark, tmp_path):
    initial, events = _mor_workload()
    eng = CdcEngine(spark, str(tmp_path / "t"), n_buckets=4)
    eng.bootstrap(datagen.state_to_df(spark, initial))
    eng.replay(datagen.events_to_df(spark, events))
    before = _state_rows(eng.state())
    assert eng.table.latest_manifest().get("bucket_deltas"), "need pending chains"

    m = eng.compact()
    assert m is not None and m["metrics"]["kind"] == "compaction"
    assert m["bucket_deltas"] == {}  # all chains cleared
    assert m["batch_id"] is None
    assert _state_rows(eng.state()) == before  # visible state unchanged
    assert m["total_rows"] == len(before)

    # compacting a clean table is a no-op
    assert eng.compact() is None

    # vacuum after compaction reclaims the now-unreferenced delta dirs
    report = eng.vacuum(keep_last=1)
    assert any("delta=" in d for d in report["removed_dirs"])
    assert _state_rows(eng.state()) == before

    # and the engine keeps applying batches after maintenance
    nxt = [{"batch_id": 99, "seq": 1, "op": "update",
            "doc_id": initial[0]["doc_id"], "tokens": [5], "n_tok": 1,
            "source": "wal"}]
    eng.apply_batch(datagen.events_to_df(spark, nxt), 99)
    got = eng.state().filter(f"doc_id = '{initial[0]['doc_id']}'").collect()[0]
    assert list(got["tokens"]) == [5]


def test_vacuum_skips_inflight_future_epoch(spark, tmp_path):
    """ADVICE r02: the orphan sweep must never delete data a writer is
    staging for a not-yet-committed (future) epoch."""
    initial, events = _mor_workload()
    eng = CdcEngine(spark, str(tmp_path / "t"), n_buckets=4)
    eng.bootstrap(datagen.state_to_df(spark, initial))
    eng.replay(datagen.events_to_df(spark, events))

    latest = eng.table.latest_manifest()["epoch"]
    staged = os.path.join(
        eng.table.root, "data", f"epoch={latest + 1}", "bucket=0"
    )
    os.makedirs(staged)
    with open(os.path.join(staged, "part-00000.parquet"), "wb") as f:
        f.write(b"pre-commit bytes of an in-flight writer")

    report = eng.vacuum(keep_last=1)
    assert os.path.exists(staged), "vacuum swept an in-flight epoch"
    assert not any(f"epoch={latest + 1}" in d for d in report["removed_dirs"])


def test_join_merge_batch_resets_touched_chains(spark, tmp_path):
    """The join merge rewrites touched buckets whole — any pending delta
    chain on them must clear in the committed manifest."""
    initial, events = _mor_workload()
    root = str(tmp_path / "t")
    eng = CdcEngine(spark, root, n_buckets=4)
    eng.bootstrap(datagen.state_to_df(spark, initial))
    for b in range(4):
        eng.apply_batch(
            datagen.events_to_df(spark, [e for e in events if e["batch_id"] == b]), b
        )
    chains = eng.table.latest_manifest().get("bucket_deltas") or {}
    assert chains

    joiner = CdcEngine(spark, root, n_buckets=4, merge_impl="join")
    rest = [e for e in events if e["batch_id"] >= 4]
    joiner.replay(datagen.events_to_df(spark, rest), batch_ids=[4, 5, 6, 7])
    m = joiner.table.latest_manifest()
    for b in m["touched_buckets"]:
        assert str(b) not in (m.get("bucket_deltas") or {})
    assert _state_rows(joiner.state()) == _oracle_rows(initial, events)


def test_mor_with_schema_evolution(spark, tmp_path):
    """Delta files written post-evolution resolve against pre-evolution base
    files (missing column reads as null) — the aligned-concat path in
    sinks/mor.resolve_live."""
    initial = datagen.gen_initial_state(300, seed=61, max_len=12)
    events = datagen.gen_events(
        [r["doc_id"] for r in initial], n_events=60, n_batches=6, seed=62,
        max_len=12, evolve_from_batch=3,
    )
    eng = CdcEngine(spark, str(tmp_path / "t"), n_buckets=4)
    eng.bootstrap(datagen.state_to_df(spark, initial))
    for b in range(6):
        batch = [e for e in events if e["batch_id"] == b]
        if b < 3:
            batch = [{k: v for k, v in e.items() if k != "src_meta"} for e in batch]
        eng.apply_batch(datagen.events_to_df(spark, batch), b)
    assert any(eng.table.latest_manifest().get("bucket_deltas") or {}), \
        "evolution workload should leave pending deltas"

    oracle_state, _ = apply_events({r["doc_id"]: dict(r) for r in initial}, events)
    expected = state_as_sorted_rows(oracle_state)
    got = [r.asDict(recursive=True) for r in eng.state().orderBy("doc_id").collect()]
    assert len(got) == len(expected)
    n_meta = 0
    for g, w in zip(got, expected):
        assert g["doc_id"] == w["doc_id"]
        assert list(g["tokens"]) == list(w["tokens"])
        assert g["src_meta"] == w.get("src_meta")
        n_meta += g["src_meta"] is not None
    assert 0 < n_meta < len(got)


def test_hot_bucket_batch_auto_routes_to_join_merge(spark, tmp_path):
    """A batch concentrated on one key (→ one bucket) beyond the configured
    share must route to the join merge automatically, with oracle-equal
    results (VERDICT r02 ask #8)."""
    initial = datagen.gen_initial_state(100, seed=71, max_len=8)
    eng = CdcEngine(
        spark, str(tmp_path / "t"), n_buckets=8,
        hot_route_min_events=50, hot_route_share=0.4,
    )
    eng.bootstrap(datagen.state_to_df(spark, initial))
    hot = initial[0]["doc_id"]
    ev = [
        {"batch_id": 0, "seq": i, "op": "update", "doc_id": hot,
         "tokens": [i % 13 + 1], "n_tok": 1, "source": "wal"}
        for i in range(1, 61)
    ] + [
        {"batch_id": 0, "seq": 100 + j, "op": "update",
         "doc_id": initial[j]["doc_id"], "tokens": [7], "n_tok": 1,
         "source": "wal"}
        for j in range(1, 31)
    ]
    m = eng.apply_batch(datagen.events_to_df(spark, ev), 0)
    assert m["metrics"].get("merge_route") == "join_hot_bucket"
    assert m["metrics"]["actions"].get("update") == 31  # LWW collapsed the burst

    # a small follow-up batch routes back to the copartitioned merge
    nxt = [{"batch_id": 1, "seq": 1, "op": "update", "doc_id": hot,
            "tokens": [3], "n_tok": 1, "source": "wal"}]
    m2 = eng.apply_batch(datagen.events_to_df(spark, nxt), 1)
    assert "merge_route" not in m2["metrics"]

    oracle_state, _ = apply_events(
        {r["doc_id"]: dict(r) for r in initial}, ev + nxt
    )
    assert _state_rows(eng.state()) == [
        (r["doc_id"], list(r["tokens"]), r["n_tok"], r["source"])
        for r in state_as_sorted_rows(oracle_state)
    ]


def test_all_noop_batch_writes_no_delta(spark, tmp_path):
    """A change group that is entirely no-ops (deletes of absent keys) must
    not write an empty delta file or burn a chain slot — and must leave any
    existing chain intact (code-review r03 finding)."""
    initial, events = _mor_workload()
    eng = CdcEngine(spark, str(tmp_path / "t"), n_buckets=4)
    eng.bootstrap(datagen.state_to_df(spark, initial))
    eng.apply_batch(
        datagen.events_to_df(spark, [e for e in events if e["batch_id"] == 0]), 0
    )
    chains_before = eng.table.latest_manifest().get("bucket_deltas") or {}
    assert chains_before
    state_before = _state_rows(eng.state())

    # valid-format doc_ids that are guaranteed absent from the state
    existing = {r["doc_id"] for r in initial}
    ghost_ids = []
    for r in initial:
        for last in "0123456789":
            cand = r["doc_id"][:-1] + last
            if cand not in existing and cand not in ghost_ids:
                ghost_ids.append(cand)
                break
        if len(ghost_ids) >= 12:
            break
    ghost = [
        {"batch_id": 1, "seq": i, "op": "delete", "doc_id": g,
         "tokens": None, "n_tok": None, "source": "wal"}
        for i, g in enumerate(ghost_ids)
    ]
    m = eng.apply_batch(datagen.events_to_df(spark, ghost), 1)
    assert m["metrics"]["merge_modes"]["noop"] > 0
    assert m["metrics"]["merge_modes"]["delta"] == 0
    assert m["metrics"]["merge_modes"]["rewrite"] == 0
    # chains unchanged, no delta dirs written for this epoch
    assert (m.get("bucket_deltas") or {}) == chains_before
    edir = os.path.join(str(tmp_path / "t"), "data", f"epoch={m['epoch']}")
    assert not os.path.isdir(edir) or not os.listdir(edir)
    assert _state_rows(eng.state()) == state_before
    # and the batch is still committed exactly-once (digest recorded)
    assert m["batch_id"] == 1


def test_cache_batch_engine_matches_oracle(spark, tmp_path):
    """cache_batch=True (persist the tagged batch between pre-pass and
    merge) must be purely physical: same manifests, same state, idempotent
    redelivery intact."""
    initial, events = _mor_workload()
    cached_before = set(spark.sparkContext._jsc.getPersistentRDDs().keySet())
    eng = CdcEngine(spark, str(tmp_path / "t"), n_buckets=4, cache_batch=True)
    eng.bootstrap(datagen.state_to_df(spark, initial))
    ms = eng.replay(datagen.events_to_df(spark, events))
    assert len(ms) == 8
    assert _state_rows(eng.state()) == _oracle_rows(initial, events)
    # redelivery (early-return path must also unpersist cleanly)
    before = _state_rows(eng.state())
    eng.replay(datagen.events_to_df(spark, events))
    assert _state_rows(eng.state()) == before
    # no cached frames left behind BY THIS ENGINE (other suites'
    # module-scoped .cache() fixtures may legitimately persist in the
    # shared session)
    cached_after = set(spark.sparkContext._jsc.getPersistentRDDs().keySet())
    assert cached_after <= cached_before


def test_table_stats_reflect_mor_and_maintenance(spark, tmp_path):
    """table_stats is the zero-job maintenance dashboard: it must track
    delta chains appearing, compaction clearing them, and stay consistent
    with the oracle row count."""
    initial, events = _mor_workload()
    eng = CdcEngine(spark, str(tmp_path / "t"), n_buckets=4)
    assert eng.table_stats() is None  # un-bootstrapped
    eng.bootstrap(datagen.state_to_df(spark, initial))
    eng.replay(datagen.events_to_df(spark, events))

    s = eng.table_stats()
    assert s["n_buckets"] == 4
    assert s["total_rows"] == len(_oracle_rows(initial, events))
    assert s["dirty_buckets"] > 0 and s["max_delta_chain"] >= 1
    assert s["delta_files"] > 0 and s["delta_bytes"] > 0
    assert s["base_files"] > 0 and s["base_bytes"] > s["delta_bytes"]
    assert s["bucket_row_skew"] >= 1.0
    assert s["retained_epochs"] == s["epoch"] + 1  # nothing vacuumed yet

    eng.compact()
    s2 = eng.table_stats()
    assert s2["dirty_buckets"] == 0 and s2["max_delta_chain"] == 0
    assert s2["delta_files"] == 0 and s2["delta_bytes"] == 0
    assert s2["total_rows"] == s["total_rows"]

    eng.vacuum(keep_last=1)
    s3 = eng.table_stats()
    assert s3["retained_epochs"] == 1
    assert s3["oldest_retained_epoch"] == s3["epoch"]

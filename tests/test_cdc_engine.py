"""End-to-end CDC correctness: Spark engine vs the pure-Python oracle.

The gate required by BASELINE.json: final-state per-row token-array equality
after replaying a change-event log, plus the reference-derived semantic tests
(update-not-insert, quarantine-not-fatal, in-batch dedup, idempotent
re-apply, resume, schema evolution).
"""

import pytest

from georef_ar_etl_spark import datagen
from georef_ar_etl_spark.engine import CdcEngine
from georef_ar_etl_spark.oracle import apply_events, state_as_sorted_rows
from georef_ar_etl_spark.sinks.snapshot_table import ConflictError


def collect_state(engine):
    df = engine.state()
    cols = sorted(df.columns)
    rows = [r.asDict(recursive=True) for r in df.orderBy("doc_id").collect()]
    return cols, rows


def assert_state_equals_oracle(engine, oracle_state):
    cols, rows = collect_state(engine)
    expected = state_as_sorted_rows(oracle_state)
    assert len(rows) == len(expected), f"row count {len(rows)} != {len(expected)}"
    for got, want in zip(rows, expected):
        assert set(got) == set(want), (got, want)
        assert got["doc_id"] == want["doc_id"]
        assert list(got["tokens"]) == list(want["tokens"]), got["doc_id"]
        assert got["n_tok"] == want["n_tok"] == len(want["tokens"])
        for k in want:
            if k not in ("tokens",):
                assert got[k] == want[k], (got["doc_id"], k, got[k], want[k])


@pytest.fixture(scope="module")
def smoke_data():
    initial = datagen.gen_initial_state(300, seed=42, max_len=48)
    events = datagen.gen_events(
        [r["doc_id"] for r in initial], n_events=1500, n_batches=5, seed=43, max_len=48
    )
    return initial, events


def test_bootstrap_roundtrip(spark, tmp_path, smoke_data):
    initial, _ = smoke_data
    eng = CdcEngine(spark, str(tmp_path / "t"), n_buckets=8)
    m = eng.bootstrap(datagen.state_to_df(spark, initial))
    assert m["epoch"] == 0
    assert m["total_rows"] == len(initial)
    oracle_state = {r["doc_id"]: dict(r) for r in initial}
    assert_state_equals_oracle(eng, oracle_state)


def test_replay_matches_oracle(spark, tmp_path, smoke_data):
    initial, events = smoke_data
    eng = CdcEngine(spark, str(tmp_path / "t"), n_buckets=8)
    eng.bootstrap(datagen.state_to_df(spark, initial))
    manifests = eng.replay(datagen.events_to_df(spark, events))
    assert len(manifests) == 5

    oracle_state, quarantined = apply_events(
        {r["doc_id"]: dict(r) for r in initial}, events
    )
    assert_state_equals_oracle(eng, oracle_state)

    # quarantine counts must match the oracle's, batch by batch in total
    q_total = sum(m["quarantine_rows"] for m in manifests)
    assert q_total == len(quarantined)

    # per-REASON histograms must match too (rule precedence parity): the
    # engine's CASE chain and the oracle's sequential ifs must pick the same
    # first-failing rule for every event, not just the same row set
    got_hist: dict[str, int] = {}
    for m in manifests:
        for r, n in m["metrics"]["quarantined"].items():
            got_hist[r] = got_hist.get(r, 0) + n
    want_hist: dict[str, int] = {}
    for q in quarantined:
        want_hist[q["reason"]] = want_hist.get(q["reason"], 0) + 1
    assert got_hist == want_hist


def test_replay_with_dimension_validation(spark, tmp_path, smoke_data):
    initial, events = smoke_data
    dim_rows = datagen.gen_dim()
    dim_df = spark.createDataFrame(dim_rows)
    eng = CdcEngine(spark, str(tmp_path / "t"), n_buckets=8, dim=dim_df)
    eng.bootstrap(datagen.state_to_df(spark, initial))
    eng.replay(datagen.events_to_df(spark, events))

    oracle_state, quarantined = apply_events(
        {r["doc_id"]: dict(r) for r in initial},
        events,
        dim_groups={r["group_id"] for r in dim_rows},
    )
    assert_state_equals_oracle(eng, oracle_state)
    # generator mints some ids in groups 25/26/99 → must be quarantined
    assert any(q["reason"] == "unknown_group" for q in quarantined)


def test_idempotent_reapply_is_noop(spark, tmp_path, smoke_data):
    initial, events = smoke_data
    eng = CdcEngine(spark, str(tmp_path / "t"), n_buckets=8)
    eng.bootstrap(datagen.state_to_df(spark, initial))
    edf = datagen.events_to_df(spark, events)
    first = eng.replay(edf)
    _, rows_before = collect_state(eng)
    # re-deliver every batch (FIXTURES.md F2(e)) — all must be skipped
    second = eng.replay(edf)
    assert [m["epoch"] for m in first] == [m["epoch"] for m in second]
    _, rows_after = collect_state(eng)
    assert rows_before == rows_after


def test_conflicting_redelivery_rejected(spark, tmp_path, smoke_data):
    initial, events = smoke_data
    eng = CdcEngine(spark, str(tmp_path / "t"), n_buckets=8)
    eng.bootstrap(datagen.state_to_df(spark, initial))
    batch0 = [e for e in events if e["batch_id"] == 0]
    eng.apply_batch(datagen.events_to_df(spark, batch0), 0)
    tampered = [dict(e) for e in batch0]
    tampered[0]["source"] = "tampered"
    with pytest.raises(ConflictError):
        eng.apply_batch(datagen.events_to_df(spark, tampered), 0)


def test_resume_from_checkpoint(spark, tmp_path, smoke_data):
    """Kill/resume equivalence: a fresh engine over the same table root picks
    up from the latest committed manifest and replays only uncommitted
    batches — final state identical to an uninterrupted run."""
    initial, events = smoke_data
    root = str(tmp_path / "t")
    eng = CdcEngine(spark, root, n_buckets=8)
    eng.bootstrap(datagen.state_to_df(spark, initial))
    # run only the first two batches, then "crash"
    for b in (0, 1):
        eng.apply_batch(
            datagen.events_to_df(spark, [e for e in events if e["batch_id"] == b]), b
        )

    resumed = CdcEngine(spark, root, n_buckets=8)  # new process, same root
    manifests = resumed.replay(datagen.events_to_df(spark, events))
    assert len(manifests) == 5  # 2 skipped as committed + 3 applied

    oracle_state, _ = apply_events({r["doc_id"]: dict(r) for r in initial}, events)
    assert_state_equals_oracle(resumed, oracle_state)


def test_update_is_update_not_insert(spark, tmp_path):
    """Reference semantics: changing a field updates the row in place —
    added/deleted sets empty (tests/test_provinces_extraction_step.py:32-49)."""
    initial = datagen.gen_initial_state(50, seed=7, max_len=16)
    eng = CdcEngine(spark, str(tmp_path / "t"), n_buckets=4)
    eng.bootstrap(datagen.state_to_df(spark, initial))
    target = initial[0]["doc_id"]
    ev = [{
        "batch_id": 0, "seq": 1, "op": "update", "doc_id": target,
        "tokens": [1, 2, 3], "n_tok": 3, "source": "wal",
    }]
    m = eng.apply_batch(datagen.events_to_df(spark, ev), 0)
    actions = m["metrics"]["actions"]
    assert actions.get("update") == 1
    assert "insert" not in actions and "delete" not in actions
    # bucket pruning: only the touched bucket is read, so "keep" counts that
    # bucket's other rows, not the whole table
    assert m["metrics"]["touched_buckets"] == 1
    assert m["total_rows"] == len(initial)


def test_null_token_elements_quarantined(spark, tmp_path):
    """EVENT_SCHEMA allows null token ELEMENTS; state forbids them. Arrays
    carrying nulls must be quarantined (ADVICE r01: [1, null] previously
    passed the three-valued exists(x>0) check and crashed the numpy kernel),
    with rule precedence identical to the oracle."""
    initial = datagen.gen_initial_state(30, seed=9, max_len=8)
    eng = CdcEngine(spark, str(tmp_path / "t"), n_buckets=4)
    eng.bootstrap(datagen.state_to_df(spark, initial))
    tgt = [r["doc_id"] for r in initial]
    ev = [
        # null element with a positive neighbor (the old crash case)
        {"batch_id": 0, "seq": 1, "op": "update", "doc_id": tgt[0],
         "tokens": [1, None], "n_tok": 2, "source": "wal"},
        # null element and no positive element (old silent-pass case)
        {"batch_id": 0, "seq": 2, "op": "update", "doc_id": tgt[1],
         "tokens": [None, -1], "n_tok": 2, "source": "wal"},
        {"batch_id": 0, "seq": 3, "op": "update", "doc_id": tgt[2],
         "tokens": [None], "n_tok": 1, "source": "wal"},
        # control: a valid update must still land
        {"batch_id": 0, "seq": 4, "op": "update", "doc_id": tgt[3],
         "tokens": [7, 8], "n_tok": 2, "source": "wal"},
    ]
    for impl in ("pandas", "builtin"):
        root = str(tmp_path / f"t_{impl}")
        e = CdcEngine(spark, root, n_buckets=4, normalize_impl=impl)
        e.bootstrap(datagen.state_to_df(spark, initial))
        m = e.apply_batch(datagen.events_to_df(spark, ev), 0)
        assert m["metrics"]["quarantined"] == {"null_token_element": 3}, impl
        assert m["metrics"]["actions"].get("update") == 1, impl

    oracle_state, quarantined = apply_events(
        {r["doc_id"]: dict(r) for r in initial}, ev
    )
    assert [q["reason"] for q in quarantined] == ["null_token_element"] * 3
    assert oracle_state[tgt[3]]["tokens"] == [7, 8]


def test_out_of_order_batch_rejected(spark, tmp_path):
    """A late-arriving LOWER batch_id must not be applied on top of later
    batches (silent replay-order violation); explicit backfill is opt-in."""
    from georef_ar_etl_spark.engine import OutOfOrderBatchError

    initial = datagen.gen_initial_state(30, seed=10, max_len=8)
    eng = CdcEngine(spark, str(tmp_path / "t"), n_buckets=4)
    eng.bootstrap(datagen.state_to_df(spark, initial))

    def ev(batch_id, seq, doc_id, toks):
        return {"batch_id": batch_id, "seq": seq, "op": "update",
                "doc_id": doc_id, "tokens": toks, "n_tok": len(toks),
                "source": "wal"}

    d = initial[0]["doc_id"]
    eng.apply_batch(datagen.events_to_df(spark, [ev(5, 1, d, [5])]), 5)
    with pytest.raises(OutOfOrderBatchError):
        eng.apply_batch(datagen.events_to_df(spark, [ev(3, 1, d, [3])]), 3)
    # idempotent re-delivery of the committed id is still a verified no-op
    m = eng.apply_batch(datagen.events_to_df(spark, [ev(5, 1, d, [5])]), 5)
    assert m["batch_id"] == 5
    # intentional backfill: explicit opt-in applies the late batch
    eng.apply_batch(
        datagen.events_to_df(spark, [ev(3, 1, d, [3])]), 3, allow_out_of_order=True
    )
    st = eng.state()
    got = st.filter(st.doc_id == d).collect()[0]
    assert list(got["tokens"]) == [3]  # backfill applied last wins physically


def test_delete_and_delete_noop(spark, tmp_path):
    initial = datagen.gen_initial_state(50, seed=8, max_len=16)
    eng = CdcEngine(spark, str(tmp_path / "t"), n_buckets=4)
    eng.bootstrap(datagen.state_to_df(spark, initial))
    ev = [
        {"batch_id": 0, "seq": 1, "op": "delete", "doc_id": initial[0]["doc_id"],
         "tokens": None, "n_tok": None, "source": "wal"},
        {"batch_id": 0, "seq": 2, "op": "delete", "doc_id": "9999999999999",
         "tokens": None, "n_tok": None, "source": "wal"},
    ]
    m = eng.apply_batch(datagen.events_to_df(spark, ev), 0)
    assert m["metrics"]["actions"].get("delete") == 1
    assert m["metrics"]["actions"].get("delete_noop") == 1
    assert m["total_rows"] == len(initial) - 1


def test_bucket_lineage_ids_match_oracle(spark, tmp_path):
    """The manifest carries per-bucket added/updated/deleted ID samples from
    the merge tasks (reference reports the ID lists per run,
    transformers.py:145-149). With counts under the cap the sample is the
    complete, exact set."""
    initial = datagen.gen_initial_state(60, seed=22, max_len=8)
    eng = CdcEngine(spark, str(tmp_path / "t"), n_buckets=4)
    eng.bootstrap(datagen.state_to_df(spark, initial))
    known = [r["doc_id"] for r in initial]
    new_id = "9900000000042"
    ev = [
        {"batch_id": 0, "seq": 1, "op": "update", "doc_id": known[0],
         "tokens": [1], "n_tok": 1, "source": "wal"},
        {"batch_id": 0, "seq": 2, "op": "update", "doc_id": known[1],
         "tokens": [2], "n_tok": 1, "source": "wal"},
        {"batch_id": 0, "seq": 3, "op": "insert", "doc_id": new_id,
         "tokens": [3], "n_tok": 1, "source": "wal"},
        {"batch_id": 0, "seq": 4, "op": "delete", "doc_id": known[2],
         "tokens": None, "n_tok": None, "source": "wal"},
        {"batch_id": 0, "seq": 5, "op": "delete", "doc_id": "9999999999999",
         "tokens": None, "n_tok": None, "source": "wal"},  # noop: no ID entry
    ]
    m = eng.apply_batch(datagen.events_to_df(spark, ev), 0)
    lineage = m["metrics"]["bucket_lineage"]
    assert lineage, "copartitioned merge must record per-bucket ID lineage"

    def ids(action):
        return sorted(i for b in lineage.values() for i in b.get(action, ()))

    assert ids("inserted") == [new_id]
    assert ids("updated") == sorted([known[0], known[1]])
    assert ids("deleted") == [known[2]]

    # bucket attribution is real: each id hashes to the bucket it's filed under
    from pyspark.sql import functions as F
    from georef_ar_etl_spark.sinks.snapshot_table import bucket_expr

    all_ids = [(i,) for b in lineage.values() for v in b.values() for i in v]
    got = {
        r["doc_id"]: r["b"]
        for r in spark.createDataFrame(all_ids, "doc_id string")
        .select("doc_id", bucket_expr(F.col("doc_id"), 4).alias("b"))
        .collect()
    }
    for bucket, actions in lineage.items():
        for v in actions.values():
            for i in v:
                assert got[i] == int(bucket), (i, bucket)


def test_hot_key_burst_single_batch(spark, tmp_path):
    """Pathological in-batch hot key: tens of thousands of updates to ONE
    doc_id inside a single batch. The copartitioned merge concentrates the
    burst in one task (documented contract) — it must stay correct (last
    writer wins by seq) and the burst must not poison sibling keys."""
    initial = datagen.gen_initial_state(100, seed=81, max_len=8)
    eng = CdcEngine(spark, str(tmp_path / "t"), n_buckets=8)
    eng.bootstrap(datagen.state_to_df(spark, initial))
    hot = initial[0]["doc_id"]
    other = initial[1]["doc_id"]
    ev = [
        {"batch_id": 0, "seq": i, "op": "update", "doc_id": hot,
         "tokens": [i % 97 + 1], "n_tok": 1, "source": "wal"}
        for i in range(1, 30001)
    ]
    ev.append({"batch_id": 0, "seq": 30001, "op": "update", "doc_id": other,
               "tokens": [7], "n_tok": 1, "source": "wal"})
    m = eng.apply_batch(datagen.events_to_df(spark, ev), 0)
    assert m["metrics"]["actions"].get("update") == 2  # dedup collapsed the burst
    st = eng.state()
    got = {r["doc_id"]: list(r["tokens"]) for r in st.filter(
        st.doc_id.isin(hot, other)).collect()}
    assert got[hot] == [30000 % 97 + 1]  # highest seq won
    assert got[other] == [7]
    assert st.count() == len(initial)


def test_spread_input_matches_oracle(spark, tmp_path, smoke_data):
    """spread_input=True only changes task placement of the incoming
    batch — final state must be byte-identical to the oracle."""
    initial, events = smoke_data
    eng = CdcEngine(spark, str(tmp_path / "t"), n_buckets=8, spread_input=True)
    eng.bootstrap(datagen.state_to_df(spark, initial))
    eng.replay(datagen.events_to_df(spark, events))
    oracle_state, _ = apply_events({r["doc_id"]: dict(r) for r in initial}, events)
    assert_state_equals_oracle(eng, oracle_state)


def _write_wal(spark, tmp_path, batches):
    import os

    wal = str(tmp_path / "wal")
    os.makedirs(wal, exist_ok=True)
    for b, evs in batches:
        d = str(tmp_path / f"seg{b}")
        datagen.events_to_df(spark, evs).coalesce(1).write.mode(
            "overwrite"
        ).parquet(d)
        part = next(f for f in os.listdir(d) if f.endswith(".parquet"))
        os.replace(os.path.join(d, part), os.path.join(wal, f"batch-{b}.parquet"))
    return wal


def test_replay_segments_overlap_matches_sequential_across_evolution(
    spark, tmp_path
):
    """The overlapped pre-pass (batch N+1's digest running during batch N's
    merge) must be invisible to the result — including when a mid-stream
    batch EVOLVES the schema, which invalidates the in-flight hint and
    forces the inline recompute path."""
    initial = datagen.gen_initial_state(40, seed=91, max_len=6)
    ids = [r["doc_id"] for r in initial]

    def ev(b, s, i, tokens, **kw):
        return {
            "batch_id": b, "seq": s, "op": "update", "doc_id": ids[i % len(ids)],
            "tokens": tokens, "n_tok": len(tokens), "source": "s", **kw,
        }

    batches = [
        (0, [ev(0, i, i, [1 + i, 2]) for i in range(10)]),
        # src_meta appears here -> additive evolution at THIS batch's commit
        (1, [ev(1, 100 + i, 10 + i, [3, 4 + i], src_meta=f"m{i}") for i in range(10)]),
        (2, [ev(2, 200 + i, 20 + i, [5, 6 + i]) for i in range(10)]),
    ]
    wal = _write_wal(spark, tmp_path, batches)

    states = []
    for ov in (True, False):
        eng = CdcEngine(spark, str(tmp_path / f"t_{ov}"), n_buckets=4)
        eng.bootstrap(datagen.state_to_df(spark, initial))
        eng.replay_segments(wal, overlap_prepass=ov)
        cols, rows = collect_state(eng)
        assert "src_meta" in cols  # evolution actually happened
        states.append((cols, rows))
    assert states[0] == states[1]


def test_stale_prepass_hint_recomputed_after_evolution(spark, tmp_path):
    """A hint computed BEFORE another batch evolved the schema must be
    rejected by the fp check and recomputed inline — the apply still
    commits the correct rows (deterministic unit-level version of the
    overlap race)."""
    initial = datagen.gen_initial_state(20, seed=92, max_len=6)
    ids = [r["doc_id"] for r in initial]
    eng = CdcEngine(spark, str(tmp_path / "t"), n_buckets=4)
    eng.bootstrap(datagen.state_to_df(spark, initial))

    later = datagen.events_to_df(spark, [{
        "batch_id": 1, "seq": 10, "op": "update", "doc_id": ids[0],
        "tokens": [9, 9], "n_tok": 2, "source": "s",
    }])
    hint = eng.prepass(later)
    # another batch evolves the schema between hint and apply
    evolving = datagen.events_to_df(spark, [{
        "batch_id": 0, "seq": 1, "op": "update", "doc_id": ids[1],
        "tokens": [7], "n_tok": 1, "source": "s", "src_meta": "m0",
    }])
    m0 = eng.apply_batch(evolving, 0)
    assert m0["metrics"]["schema_added_columns"] == ["src_meta"]
    m1 = eng.apply_batch(later, 1, prepass_hint=hint)
    # stale hint -> inline prepass -> no overlap marker in the phases
    assert "prepass_overlapped_sec" not in m1["metrics"]["phase_sec"]
    rows = {
        r["doc_id"]: list(r["tokens"])
        for r in eng.state().select("doc_id", "tokens").collect()
    }
    assert rows[ids[0]] == [9, 9] and rows[ids[1]] == [7]


def test_valid_prepass_hint_is_used(spark, tmp_path):
    """With an unchanged schema surface the hint IS consumed: the apply
    records the overlapped pre-pass duration instead of paying it inline."""
    initial = datagen.gen_initial_state(20, seed=93, max_len=6)
    ids = [r["doc_id"] for r in initial]
    eng = CdcEngine(spark, str(tmp_path / "t"), n_buckets=4)
    eng.bootstrap(datagen.state_to_df(spark, initial))
    ev = datagen.events_to_df(spark, [{
        "batch_id": 0, "seq": 1, "op": "update", "doc_id": ids[0],
        "tokens": [5, 5], "n_tok": 2, "source": "s",
    }])
    hint = eng.prepass(ev)
    m = eng.apply_batch(ev, 0, prepass_hint=hint)
    assert "prepass_overlapped_sec" in m["metrics"]["phase_sec"]
    rows = {
        r["doc_id"]: list(r["tokens"])
        for r in eng.state().select("doc_id", "tokens").collect()
    }
    assert rows[ids[0]] == [5, 5]

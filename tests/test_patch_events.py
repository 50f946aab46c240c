"""Partial-column updates (op='patch', schemas.OPS): fold semantics, both
merge impls vs the sequential oracle, MOR/changelog interplay, action counts.

Reference analogue: per-field UPDATE patches (georef_ar_etl/patch.py
update_field — set one column, leave the rest), lifted into the CDC event
stream as Debezium-style partial images: null payload column = "keep".
"""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from georef_ar_etl_spark import datagen
from georef_ar_etl_spark.engine import CdcEngine
from georef_ar_etl_spark.operators.copart_merge import _fold_patches_pandas
from georef_ar_etl_spark.operators.dedup_events import DuplicateKeyError
from georef_ar_etl_spark.operators.merge import fold_patch_events
from georef_ar_etl_spark.oracle import apply_events, state_as_sorted_rows
from georef_ar_etl_spark.schemas import STATE_SCHEMA

PAYLOAD_COLS = [f.name for f in STATE_SCHEMA.fields]


def _norm_tokens(v):
    if v is None or (isinstance(v, float) and pd.isna(v)):
        return None
    return [int(x) for x in v]


def _semantic(rows):
    """(doc_id → op/tokens/n_tok/source) ignoring seq (the two folds carry a
    different-but-unused seq for overlaid rows) and bucket."""
    out = {}
    for r in rows:
        n_tok = r["n_tok"]
        src = r["source"]
        out[r["doc_id"]] = (
            r["op"],
            _norm_tokens(r["tokens"]),
            None if n_tok is None or pd.isna(n_tok) else int(n_tok),
            None if src is None or (isinstance(src, float) and pd.isna(src)) else src,
        )
    return out


def test_fold_patch_events_matches_pandas_twin(spark):
    initial = datagen.gen_initial_state(80, seed=71, max_len=12)
    events = datagen.gen_events(
        [r["doc_id"] for r in initial],
        n_events=400,
        n_batches=1,
        seed=72,
        max_len=12,
        invalid_frac=0.0,
        patch_frac=0.4,
    )
    assert any(e["op"] == "patch" for e in events)
    df = datagen.events_to_df(spark, events)

    folded = fold_patch_events(df, PAYLOAD_COLS)
    got = _semantic([r.asDict(recursive=True) for r in folded.collect()])

    pdf = pd.DataFrame(events)[["op", "seq"] + PAYLOAD_COLS]
    pdf["bucket"] = 0
    patchable = [c for c in PAYLOAD_COLS if c not in ("doc_id", "n_tok")]
    twin = _fold_patches_pandas(
        pdf.sort_values("seq", kind="stable"), "doc_id", "seq", patchable
    )
    want = _semantic(twin.to_dict("records"))

    assert got == want


@pytest.mark.parametrize("impl", ["copartitioned", "join"])
def test_patch_replay_matches_oracle(spark, tmp_path, impl):
    """Full engine replay with a patch-heavy log (including invalid patches,
    dim validation and schema evolution mid-log) equals the sequential
    per-event oracle."""
    initial = datagen.gen_initial_state(250, seed=73, max_len=24)
    events = datagen.gen_events(
        [r["doc_id"] for r in initial],
        n_events=1200,
        n_batches=4,
        seed=74,
        max_len=24,
        patch_frac=0.3,
        evolve_from_batch=2,
    )
    n_patch = sum(e["op"] == "patch" for e in events)
    assert n_patch > 100
    dim_rows = datagen.gen_dim()
    dim_df = spark.createDataFrame(dim_rows)

    eng = CdcEngine(
        spark, str(tmp_path / impl), n_buckets=8, dim=dim_df, merge_impl=impl
    )
    eng.bootstrap(datagen.state_to_df(spark, initial))
    manifests = eng.replay(datagen.events_to_df(spark, events))

    oracle_state, quarantined = apply_events(
        {r["doc_id"]: dict(r) for r in initial},
        events,
        dim_groups={r["group_id"] for r in dim_rows},
    )
    df = eng.state()
    rows = [r.asDict(recursive=True) for r in df.orderBy("doc_id").collect()]
    expected = state_as_sorted_rows(oracle_state)
    assert len(rows) == len(expected)
    for got, want in zip(rows, expected):
        assert got["doc_id"] == want["doc_id"]
        assert list(got["tokens"]) == list(want["tokens"]), got["doc_id"]
        assert got["n_tok"] == want["n_tok"] == len(want["tokens"])
        assert got["source"] == want["source"], got["doc_id"]
        assert got.get("src_meta") == want.get("src_meta"), got["doc_id"]
    assert sum(m["quarantine_rows"] for m in manifests) == len(quarantined)


def test_both_impls_agree_on_patch_actions(spark, tmp_path):
    initial = datagen.gen_initial_state(150, seed=75, max_len=16)
    events = datagen.gen_events(
        [r["doc_id"] for r in initial],
        n_events=600,
        n_batches=3,
        seed=76,
        max_len=16,
        invalid_frac=0.0,
        patch_frac=0.35,
    )
    actions, states = [], []
    for impl in ("copartitioned", "join"):
        eng = CdcEngine(spark, str(tmp_path / impl), n_buckets=4, merge_impl=impl)
        eng.bootstrap(datagen.state_to_df(spark, initial))
        ms = eng.replay(datagen.events_to_df(spark, events))
        actions.append([m["metrics"]["actions"] for m in ms])
        states.append(
            [r.asDict(recursive=True) for r in eng.state().orderBy("doc_id").collect()]
        )
    assert states[0] == states[1]
    saw_patched = False
    for a_co, a_j in zip(actions[0], actions[1]):
        for k in ("insert", "update", "delete", "delete_noop", "patched",
                  "patch_noop", "keep"):
            assert a_co.get(k, 0) == a_j.get(k, 0), (k, a_co, a_j)
        saw_patched = saw_patched or a_co.get("patched", 0) > 0
    assert saw_patched


def _mk_events(spark, rows):
    return datagen.events_to_df(spark, rows)


def _base_state():
    return [
        {"doc_id": "0000000000001", "tokens": [1, 2], "n_tok": 2, "source": "a"},
        {"doc_id": "0000000000002", "tokens": [3], "n_tok": 1, "source": "b"},
    ]


@pytest.mark.parametrize("impl", ["copartitioned", "join"])
def test_patch_semantics_handwritten(spark, tmp_path, impl):
    """The schemas.OPS patch contract, case by case."""
    eng = CdcEngine(spark, str(tmp_path / impl), n_buckets=2, merge_impl=impl)
    eng.bootstrap(datagen.state_to_df(spark, _base_state()))
    ev = [
        # tokens-only patch; source must survive. Dirty tokens (trailing
        # zeros) prove the patched value is normalized + n_tok recomputed.
        {"batch_id": 0, "seq": 1, "op": "patch", "doc_id": "0000000000001",
         "tokens": [7, 8, 9, 0], "n_tok": None, "source": None},
        # source-only patch; tokens must survive
        {"batch_id": 0, "seq": 2, "op": "patch", "doc_id": "0000000000002",
         "tokens": None, "n_tok": None, "source": "patched"},
        # patch of an absent key → patch_noop, no state row
        {"batch_id": 0, "seq": 3, "op": "patch", "doc_id": "0000000000999",
         "tokens": [1], "n_tok": None, "source": None},
    ]
    m = eng.apply_batch(_mk_events(spark, ev), 0)
    acts = m["metrics"]["actions"]
    assert acts.get("patched") == 2 and acts.get("patch_noop") == 1, acts
    assert acts.get("insert", 0) == 0 and acts.get("update", 0) == 0
    rows = {r["doc_id"]: r.asDict(recursive=True) for r in eng.state().collect()}
    assert set(rows) == {"0000000000001", "0000000000002"}
    assert list(rows["0000000000001"]["tokens"]) == [7, 8, 9]
    assert rows["0000000000001"]["n_tok"] == 3
    assert rows["0000000000001"]["source"] == "a"
    assert list(rows["0000000000002"]["tokens"]) == [3]
    assert rows["0000000000002"]["source"] == "patched"

    # composition in ONE batch: two patches to different columns of the same
    # key both land; a patch after an in-batch full update overlays it
    ev2 = [
        {"batch_id": 1, "seq": 10, "op": "patch", "doc_id": "0000000000001",
         "tokens": [5], "n_tok": None, "source": None},
        {"batch_id": 1, "seq": 11, "op": "patch", "doc_id": "0000000000001",
         "tokens": None, "n_tok": None, "source": "s2"},
        {"batch_id": 1, "seq": 12, "op": "update", "doc_id": "0000000000002",
         "tokens": [4, 4], "n_tok": 2, "source": "u"},
        {"batch_id": 1, "seq": 13, "op": "patch", "doc_id": "0000000000002",
         "tokens": None, "n_tok": None, "source": "after-update"},
    ]
    eng.apply_batch(_mk_events(spark, ev2), 1)
    rows = {r["doc_id"]: r.asDict(recursive=True) for r in eng.state().collect()}
    assert list(rows["0000000000001"]["tokens"]) == [5]
    assert rows["0000000000001"]["n_tok"] == 1
    assert rows["0000000000001"]["source"] == "s2"
    assert list(rows["0000000000002"]["tokens"]) == [4, 4]
    assert rows["0000000000002"]["source"] == "after-update"

    # delete wins over any patch: patch-after-delete in one batch folds
    # away; a patch in a LATER batch cannot resurrect the key either
    ev3 = [
        {"batch_id": 2, "seq": 20, "op": "delete", "doc_id": "0000000000001",
         "tokens": None, "n_tok": None, "source": None},
        {"batch_id": 2, "seq": 21, "op": "patch", "doc_id": "0000000000001",
         "tokens": [9], "n_tok": None, "source": None},
    ]
    eng.apply_batch(_mk_events(spark, ev3), 2)
    ev4 = [
        {"batch_id": 3, "seq": 30, "op": "patch", "doc_id": "0000000000001",
         "tokens": [9], "n_tok": None, "source": None},
    ]
    m4 = eng.apply_batch(_mk_events(spark, ev4), 3)
    assert m4["metrics"]["actions"].get("patch_noop") == 1
    assert {r["doc_id"] for r in eng.state().collect()} == {"0000000000002"}


def test_invalid_patches_quarantined(spark, tmp_path):
    """Token rules bind a patch only when it actually sets tokens."""
    eng = CdcEngine(spark, str(tmp_path / "t"), n_buckets=2)
    eng.bootstrap(datagen.state_to_df(spark, _base_state()))
    ev = [
        # null tokens = keep → VALID (this is the whole point of patch)
        {"batch_id": 0, "seq": 1, "op": "patch", "doc_id": "0000000000001",
         "tokens": None, "n_tok": None, "source": "ok"},
        # explicitly-empty tokens on a patch → empty_tokens
        {"batch_id": 0, "seq": 2, "op": "patch", "doc_id": "0000000000001",
         "tokens": [], "n_tok": None, "source": None},
        # null element → null_token_element
        {"batch_id": 0, "seq": 3, "op": "patch", "doc_id": "0000000000001",
         "tokens": [1, None], "n_tok": None, "source": None},
        # all-pad tokens → empty_tokens_after_normalization
        {"batch_id": 0, "seq": 4, "op": "patch", "doc_id": "0000000000001",
         "tokens": [-1, 0, 0], "n_tok": None, "source": None},
    ]
    m = eng.apply_batch(_mk_events(spark, ev), 0)
    q = m["metrics"]["quarantined"]
    assert q == {
        "empty_tokens": 1,
        "null_token_element": 1,
        "empty_tokens_after_norm": 1,
    }, q
    assert m["metrics"]["actions"].get("patched") == 1
    rows = {r["doc_id"]: r.asDict(recursive=True) for r in eng.state().collect()}
    assert rows["0000000000001"]["source"] == "ok"
    assert list(rows["0000000000001"]["tokens"]) == [1, 2]


def test_patch_takes_mor_delta_write_and_changelog(spark, tmp_path):
    """A small patch batch on a big bucket reads the bucket's payload
    (read-modify-write) but still WRITES a delta — the changed-bytes-only
    cost model survives patches — and the changelog emits the patched row's
    full image as an upsert."""
    initial = datagen.gen_initial_state(400, seed=77, max_len=8)
    eng = CdcEngine(
        spark, str(tmp_path / "t"), n_buckets=2,
        mor_rewrite_ratio=0.5, mor_max_deltas=4,
    )
    eng.bootstrap(datagen.state_to_df(spark, initial))
    target = initial[5]["doc_id"]
    ev = [
        {"batch_id": 0, "seq": 1, "op": "patch", "doc_id": target,
         "tokens": None, "n_tok": None, "source": "patched-src"},
    ]
    m = eng.apply_batch(_mk_events(spark, ev), 0)
    assert m["metrics"]["merge_modes"]["delta"] == 1, m["metrics"]["merge_modes"]
    acts = m["metrics"]["actions"]
    assert acts.get("patched") == 1 and "patch_noop" not in acts
    for k in ("insert", "update", "delete", "delete_noop"):
        assert acts.get(k, 0) == 0, acts

    row = eng.state().filter(F.col("doc_id") == target).collect()[0]
    assert row["source"] == "patched-src"
    assert list(row["tokens"]) == list(initial[5]["tokens"])

    ch = eng.changes(0).collect()
    assert len(ch) == 1
    c = ch[0].asDict(recursive=True)
    assert c["op"] == "upsert" and c["doc_id"] == target
    assert c["source"] == "patched-src"
    assert list(c["tokens"]) == list(initial[5]["tokens"])


def test_strict_dup_allows_composing_patches(spark, tmp_path):
    eng = CdcEngine(spark, str(tmp_path / "t"), n_buckets=2, strict_dup=True)
    eng.bootstrap(datagen.state_to_df(spark, _base_state()))
    ev = [
        {"batch_id": 0, "seq": 1, "op": "patch", "doc_id": "0000000000001",
         "tokens": [5], "n_tok": None, "source": None},
        {"batch_id": 0, "seq": 2, "op": "patch", "doc_id": "0000000000001",
         "tokens": None, "n_tok": None, "source": "s"},
    ]
    eng.apply_batch(_mk_events(spark, ev), 0)  # no DuplicateKeyError
    rows = {r["doc_id"]: r.asDict(recursive=True) for r in eng.state().collect()}
    assert list(rows["0000000000001"]["tokens"]) == [5]
    assert rows["0000000000001"]["source"] == "s"

    # duplicate FULL events still trip strict mode, patches present or not
    ev2 = [{**e, "batch_id": 1} for e in ev[:1]] + [
        {"batch_id": 1, "seq": 3, "op": "update", "doc_id": "0000000000001",
         "tokens": [6], "n_tok": 1, "source": "x"},
        {"batch_id": 1, "seq": 4, "op": "update", "doc_id": "0000000000001",
         "tokens": [7], "n_tok": 1, "source": "x"},
    ]
    with pytest.raises(DuplicateKeyError):
        eng.apply_batch(_mk_events(spark, ev2), 1)

"""Hard right-to-be-forgotten purge (engine.purge_keys): Delta's documented
GDPR recipe (DELETE + compact + VACUUM) plus observability redaction and a
distributed verification sweep. The tests assert the strongest available
property — after the purge the key bytes exist NOWHERE under the table root —
alongside exact preservation of every non-purged row and continued engine
operation (later batches, expired-redelivery short-circuit).
"""

import os

import pytest

from georef_ar_etl_spark import datagen
from georef_ar_etl_spark.engine import CdcEngine, PurgeError


def _rows(df):
    return {
        (r["doc_id"], tuple(r["tokens"]), r["n_tok"], r["source"])
        for r in df.collect()
    }


def _grep_root(root: str, needles: list[str]) -> list[str]:
    """Raw-byte sweep of EVERY file under root for the purged ids."""
    hits = []
    for dirpath, _dn, names in os.walk(root):
        for n in names:
            p = os.path.join(dirpath, n)
            with open(p, "rb") as f:
                blob = f.read()
            for k in needles:
                if k.encode() in blob:
                    hits.append(f"{p}:{k}")
    return hits


def test_purge_erases_everywhere_and_preserves_the_rest(spark, tmp_path):
    initial = datagen.gen_initial_state(300, seed=81, max_len=16)
    events = datagen.gen_events(
        [r["doc_id"] for r in initial], n_events=60, n_batches=6, seed=82, max_len=16
    )
    root = str(tmp_path / "pt")
    eng = CdcEngine(spark, root, n_buckets=4, mor_max_deltas=3)
    eng.bootstrap(datagen.state_to_df(spark, initial))
    eng.replay(datagen.events_to_df(spark, events))

    before = _rows(eng.state())
    live_keys = sorted({r[0] for r in before})[:5]
    absent_valid = "9999999999999"
    malformed = "xx"
    targets = live_keys + [absent_valid, malformed]

    # the ids really are physically present before the purge
    assert eng.table.scan_files_for_keys(live_keys) > 0
    assert _grep_root(root, live_keys)

    report = eng.purge_keys(targets, batch_id=6)
    assert report["deleted_live"] == 5
    assert report["keys_malformed_skipped"] == 1
    assert report["residual_occurrences"] == 0
    assert report["vacuum"]["removed_manifests"] > 0

    # visible state: purged keys gone, every other row EXACTLY preserved
    after = _rows(eng.state())
    assert after == {r for r in before if r[0] not in set(live_keys)}

    # physical state: the id bytes exist nowhere under the table root —
    # data files, delta files, quarantine, manifests, metrics, sidecars
    assert _grep_root(root, live_keys) == []

    # history: pre-purge epochs are gone (that is what erasure means)
    assert len(eng.table.manifests()) == 1
    with pytest.raises(Exception):
        eng.state(epoch=1).collect()

    # exactly-once survives the purge: redelivering an already-committed
    # (now expired) batch short-circuits instead of re-applying
    b0 = [e for e in events if e["batch_id"] == 0]
    eng.apply_batch(datagen.events_to_df(spark, b0), batch_id=0)
    assert _rows(eng.state()) == after

    # the engine keeps working: a later fresh batch applies normally
    post = [
        {
            "batch_id": 7, "seq": 0, "op": "insert", "doc_id": "0109999999901",
            "tokens": [7, 7], "n_tok": None, "source": "wal",
        }
    ]
    eng.replay(datagen.events_to_df(spark, post))
    assert ("0109999999901", (7, 7), 2, "wal") in _rows(eng.state())


def test_purge_of_only_absent_keys_is_a_clean_noop(spark, tmp_path):
    initial = datagen.gen_initial_state(50, seed=83, max_len=8)
    eng = CdcEngine(spark, str(tmp_path / "pt2"), n_buckets=2)
    eng.bootstrap(datagen.state_to_df(spark, initial))
    before = _rows(eng.state())
    report = eng.purge_keys(["9999999999999", "zz"], batch_id=1)
    assert report["deleted_live"] == 0
    assert report["keys_malformed_skipped"] == 1
    assert _rows(eng.state()) == before


def test_redact_metrics_ids_and_scan_helpers(spark, tmp_path):
    initial = datagen.gen_initial_state(80, seed=84, max_len=8)
    events = datagen.gen_events(
        [r["doc_id"] for r in initial], n_events=20, n_batches=2, seed=85, max_len=8
    )
    eng = CdcEngine(spark, str(tmp_path / "pt3"), n_buckets=2)
    eng.bootstrap(datagen.state_to_df(spark, initial))
    eng.replay(datagen.events_to_df(spark, events))

    # pick an id that appears in some commit's lineage
    import json

    mlog = os.path.join(eng.table.root, "metrics.jsonl")
    lineage_ids = set()
    with open(mlog) as f:
        for line in f:
            for cats in (json.loads(line).get("bucket_lineage") or {}).values():
                for ids in cats.values():
                    lineage_ids.update(ids)
    assert lineage_ids, "workload produced no lineage"
    victim = sorted(lineage_ids)[0]

    n = eng.table.redact_metrics_ids([victim])
    assert n > 0
    with open(mlog) as f:
        blob = f.read()
    assert victim not in blob and "md5:" in blob
    # idempotent
    assert eng.table.redact_metrics_ids([victim]) == 0

    # scan helper: live key found, absent key not
    live = sorted({r["doc_id"] for r in eng.state().select("doc_id").collect()})[0]
    assert eng.table.scan_files_for_keys([live]) > 0
    assert eng.table.scan_files_for_keys(["9999999999999"]) == 0

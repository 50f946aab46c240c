"""Point lookup (SnapshotTable.lookup_keys): bucket pruning + bloom-sidecar
delta skipping + pushed key predicates. Semantics contract: lookup_keys(K)
== read_state().filter(key in K) on every physical layout (clean COW, MOR
chains, post-compaction, post-rescale, sidecar-less legacy deltas)."""

import json
import os

from georef_ar_etl_spark import datagen
from georef_ar_etl_spark.engine import CdcEngine
from georef_ar_etl_spark.oracle import apply_events, state_as_sorted_rows
from georef_ar_etl_spark.sinks.mor import (
    BLOOM_SIDECAR,
    key_bloom_hex,
    sidecar_might_contain,
)


def _rows(df):
    return sorted(
        (r["doc_id"], list(r["tokens"]), r["n_tok"], r["source"])
        for r in df.collect()
    )


def _build_mor(spark, root, n_buckets=4):
    initial = datagen.gen_initial_state(400, seed=51, max_len=16)
    events = datagen.gen_events(
        [r["doc_id"] for r in initial], n_events=80, n_batches=8, seed=52, max_len=16
    )
    eng = CdcEngine(spark, root, n_buckets=n_buckets, mor_max_deltas=8,
                    mor_rewrite_ratio=1.0)
    eng.bootstrap(datagen.state_to_df(spark, initial))
    eng.replay(datagen.events_to_df(spark, events))
    state, _ = apply_events({r["doc_id"]: dict(r) for r in initial}, events)
    final = {r["doc_id"] for r in state_as_sorted_rows(state)}
    deleted = sorted(
        {r["doc_id"] for r in initial} - final
    )
    return eng, sorted(final), deleted


def _key_mix(final, deleted):
    # present keys spread across buckets + every deleted key + absent keys
    return final[::37] + deleted[:3] + ["nope-000000001", "nope-000000002"]


def test_lookup_equals_state_filter_and_skips_deltas(spark, tmp_path):
    eng, final, deleted = _build_mor(spark, str(tmp_path / "t"))
    keys = _key_mix(final, deleted)
    stats = {}
    got = _rows(eng.table.lookup_keys(keys, stats=stats).drop("bucket"))
    want = _rows(
        eng.table.read_state()
        .filter("doc_id in ({})".format(",".join(f"'{k}'" for k in keys)))
        .drop("bucket")
    )
    assert got == want and len(got) > 0
    # no deleted/absent key survives
    live = {r[0] for r in got}
    assert live.isdisjoint(set(deleted))
    # the MOR chains were consulted and the blooms skipped some links:
    # each key set touches a few buckets; most chain links concern other keys
    assert stats["mor_buckets"] > 0
    assert stats["delta_dirs_skipped"] > 0, stats
    assert (
        stats["delta_dirs_skipped"] + stats["mor_buckets"] <=
        stats["delta_dirs_total"] + stats["mor_buckets"]
    )


def test_lookup_only_touches_key_buckets(spark, tmp_path):
    eng, final, _ = _build_mor(spark, str(tmp_path / "t"))
    stats = {}
    one = eng.table.lookup_keys([final[0]], stats=stats)
    assert stats["buckets_read"] == 1
    assert [r["doc_id"] for r in one.collect()] == [final[0]]


def test_lookup_clean_cow_path(spark, tmp_path):
    initial = datagen.gen_initial_state(200, seed=7, max_len=8)
    events = datagen.gen_events(
        [r["doc_id"] for r in initial], n_events=30, n_batches=3, seed=8, max_len=8
    )
    eng = CdcEngine(spark, str(tmp_path / "t"), n_buckets=4, mor_rewrite_ratio=0)
    eng.bootstrap(datagen.state_to_df(spark, initial))
    eng.replay(datagen.events_to_df(spark, events))
    keys = [initial[0]["doc_id"], initial[5]["doc_id"], "absent-0000001"]
    stats = {}
    got = _rows(eng.table.lookup_keys(keys, stats=stats).drop("bucket"))
    want = _rows(
        eng.table.read_state()
        .filter("doc_id in ({})".format(",".join(f"'{k}'" for k in keys)))
        .drop("bucket")
    )
    assert got == want
    assert stats["mor_buckets"] == 0 and stats["clean_buckets"] >= 1


def test_lookup_sidecarless_delta_is_kept_not_skipped(spark, tmp_path):
    eng, final, deleted = _build_mor(spark, str(tmp_path / "t"))
    # simulate a pre-bloom (legacy) chain: strip every sidecar
    removed = 0
    for dirpath, _dirs, files in os.walk(eng.table.root):
        if BLOOM_SIDECAR in files:
            os.unlink(os.path.join(dirpath, BLOOM_SIDECAR))
            removed += 1
    assert removed > 0
    keys = _key_mix(final, deleted)
    stats = {}
    got = _rows(eng.table.lookup_keys(keys, stats=stats).drop("bucket"))
    want = _rows(
        eng.table.read_state()
        .filter("doc_id in ({})".format(",".join(f"'{k}'" for k in keys)))
        .drop("bucket")
    )
    assert got == want
    assert stats["delta_dirs_skipped"] == 0  # no sidecar -> never skip


def test_lookup_survives_compaction_and_rescale(spark, tmp_path):
    eng, final, deleted = _build_mor(spark, str(tmp_path / "t"))
    keys = _key_mix(final, deleted)
    want = _rows(
        eng.table.read_state()
        .filter("doc_id in ({})".format(",".join(f"'{k}'" for k in keys)))
        .drop("bucket")
    )
    eng.table.compact(min_deltas=1)
    assert _rows(eng.table.lookup_keys(keys).drop("bucket")) == want
    eng.table.rescale(8)
    stats = {}
    assert _rows(eng.table.lookup_keys(keys, stats=stats).drop("bucket")) == want
    assert stats["buckets_read"] <= 8


def test_lookup_empty_keys(spark, tmp_path):
    eng, _f, _d = _build_mor(spark, str(tmp_path / "t"))
    assert eng.table.lookup_keys([]).count() == 0


def test_bloom_sidecar_no_false_negatives():
    keys = [f"doc-{i:07d}" for i in range(500)]
    sc = {"n_bits": 8192, "k": 5, "bits": key_bloom_hex(keys)}
    assert all(sidecar_might_contain(sc, k) for k in keys)
    # false-positive rate stays sane at this load factor
    fp = sum(
        sidecar_might_contain(sc, f"other-{i:07d}") for i in range(2000)
    )
    assert fp < 200  # ~10x margin over the expected ~0.6%


def test_bloom_sidecar_written_by_delta_merge(spark, tmp_path):
    eng, _f, _d = _build_mor(spark, str(tmp_path / "t"))
    m = eng.table.latest_manifest()
    chains = [d for dl in (m.get("bucket_deltas") or {}).values() for d in dl]
    assert chains
    for rel in chains:
        p = os.path.join(eng.table.root, rel, BLOOM_SIDECAR)
        assert os.path.exists(p), rel
        with open(p) as f:
            sc = json.load(f)
        assert sc["n_bits"] == 8192 and len(sc["bits"]) == 8192 // 4


def test_lookup_time_travel_across_rescale(spark, tmp_path):
    eng, final, deleted = _build_mor(spark, str(tmp_path / "t"))
    keys = _key_mix(final, deleted)
    head = eng.table.latest_manifest()["epoch"]
    want_then = _rows(
        eng.table.read_state(epoch=head)
        .filter("doc_id in ({})".format(",".join(f"'{k}'" for k in keys)))
        .drop("bucket")
    )
    # rescale changes the live bucketing; the epoch lookup must bucket by
    # the OLD manifest's count or it probes the wrong buckets
    eng.table.rescale(8)
    got_then = _rows(eng.table.lookup_keys(keys, epoch=head).drop("bucket"))
    assert got_then == want_then

"""Metadata tables (Iceberg snapshots/files analogue): the queryable
manifest views must agree with the manifests they render — per-epoch
kinds and row totals, per-file chain positions, and the compaction /
time-travel transitions."""

from georef_ar_etl_spark import datagen
from georef_ar_etl_spark.engine import CdcEngine


def test_snapshots_and_files_metadata(spark, tmp_path):
    initial = datagen.gen_initial_state(150, seed=71, max_len=10)
    events = datagen.gen_events(
        [r["doc_id"] for r in initial], n_events=120, n_batches=3, seed=72,
        max_len=10,
    )
    eng = CdcEngine(spark, str(tmp_path / "t"), n_buckets=4, mor_max_deltas=3)
    eng.bootstrap(datagen.state_to_df(spark, initial))
    for b in range(3):
        eng.apply_batch(
            datagen.events_to_df(
                spark, [e for e in events if e["batch_id"] == b]
            ),
            b,
        )

    snaps = {r["epoch"]: r for r in eng.snapshots().collect()}
    assert [snaps[e]["kind"] for e in sorted(snaps)] == [
        "bootstrap", "apply", "apply", "apply"
    ]
    head = max(snaps)
    # row totals in the metadata table match the actual state at each epoch
    for e in sorted(snaps):
        assert snaps[e]["total_rows"] == eng.state(epoch=e).count(), e
    assert snaps[0]["batch_id"] is None and snaps[head]["batch_id"] == 2
    # merge-mode counters surfaced: this workload commits MOR deltas
    assert sum(snaps[e]["mode_delta"] for e in snaps) > 0

    files = eng.data_files().collect()
    m = eng.table.latest_manifest()
    base_buckets = {int(b) for b, d in m["buckets"].items() if d is not None}
    assert {r["bucket"] for r in files if r["kind"] == "base"} == base_buckets
    assert all(r["bytes"] > 0 for r in files)
    # delta chain order: positions 1..len(chain) per dirty bucket
    for b, chain in (m.get("bucket_deltas") or {}).items():
        pos = sorted(
            r["chain_pos"] for r in files
            if r["kind"] == "delta" and r["bucket"] == int(b)
        )
        assert pos == list(range(1, len(chain) + 1)), b
    # base rows carry the manifest's resolved bucket count, deltas null
    for r in files:
        if r["kind"] == "base":
            assert r["bucket_rows"] == int(m["bucket_counts"][str(r["bucket"])])
        else:
            assert r["bucket_rows"] is None

    # time travel: files at the bootstrap epoch have no deltas
    f0 = eng.data_files(epoch=0).collect()
    assert all(r["kind"] == "base" for r in f0)

    # compaction clears every delta row and appears in snapshots()
    eng.compact()
    assert all(r["kind"] == "base" for r in eng.data_files().collect())
    kinds = [r["kind"] for r in eng.snapshots().orderBy("epoch").collect()]
    assert kinds[-1] == "compaction"
    # the metadata frame is a real DataFrame: push a filter through it
    assert (
        eng.snapshots().filter("kind = 'apply'").count() == 3
    )

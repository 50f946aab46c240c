"""Landing-zone intake (reference: DownloadURLStep, extractors.py:6-41 —
MD5 lineage, skip-on-resume, conflict on changed content) feeding the
WAL-segment layout the engine replays end-to-end."""

import os

import pytest

from georef_ar_etl_spark import datagen
from georef_ar_etl_spark.engine import CdcEngine
from georef_ar_etl_spark.oracle import apply_events, state_as_sorted_rows
from georef_ar_etl_spark.sources.landing import (
    IngestConflictError,
    batch_id_of,
    file_md5,
    ingest_files,
    read_ledger,
)


def _write_segments(spark, tmp_path, events, n_batches):
    incoming = str(tmp_path / "incoming")
    os.makedirs(incoming, exist_ok=True)
    paths = []
    for b in range(n_batches):
        p = os.path.join(incoming, f"changes-{b:03d}.parquet")
        datagen.events_to_df(spark, [e for e in events if e["batch_id"] == b]) \
            .coalesce(1).write.mode("overwrite").parquet(p + ".dir")
        part = next(
            f for f in os.listdir(p + ".dir") if f.endswith(".parquet")
        )
        os.replace(os.path.join(p + ".dir", part), p)
        paths.append(p)
    return paths


def test_batch_id_parsing():
    assert batch_id_of("changes-003.parquet") == 3
    assert batch_id_of("/x/y/batch-12.parquet") == 12
    with pytest.raises(ValueError):
        batch_id_of("noid.parquet.gz")


def test_ingest_skip_conflict_and_replay(spark, tmp_path):
    initial = datagen.gen_initial_state(80, seed=31, max_len=8)
    events = datagen.gen_events(
        [r["doc_id"] for r in initial], n_events=300, n_batches=3, seed=32, max_len=8
    )
    incoming = _write_segments(spark, tmp_path, events, 3)
    wal = str(tmp_path / "wal")

    report = ingest_files(incoming, wal)
    assert [r["status"] for r in report] == ["ingested"] * 3
    # MD5 lineage recorded per batch, matching the files on disk
    ledger = read_ledger(wal)
    for r in report:
        assert ledger[str(r["batch_id"])]["md5"] == r["md5"]
        assert r["md5"] == file_md5(os.path.join(wal, f"batch-{r['batch_id']}.parquet"))

    # resume: re-delivering identical files is a pure skip
    again = ingest_files(incoming, wal)
    assert [r["status"] for r in again] == ["skipped"] * 3

    # conflict: same batch id, different bytes
    tampered = str(tmp_path / "tampered-001.parquet")
    datagen.events_to_df(spark, [{
        "batch_id": 1, "seq": 10**6, "op": "update",
        "doc_id": initial[0]["doc_id"], "tokens": [1], "n_tok": 1,
        "source": "x",
    }]).coalesce(1).write.mode("overwrite").parquet(tampered + ".dir")
    part = next(f for f in os.listdir(tampered + ".dir") if f.endswith(".parquet"))
    os.replace(os.path.join(tampered + ".dir", part), tampered)
    with pytest.raises(IngestConflictError):
        ingest_files([tampered], wal)

    # the ingested WAL replays through the engine and matches the oracle
    eng = CdcEngine(spark, str(tmp_path / "t"), n_buckets=4)
    eng.bootstrap(datagen.state_to_df(spark, initial))
    eng.replay_segments(wal)
    oracle_state, _ = apply_events({r["doc_id"]: dict(r) for r in initial}, events)
    want = state_as_sorted_rows(oracle_state)
    got = [r.asDict(recursive=True) for r in eng.state().orderBy("doc_id").collect()]
    assert len(got) == len(want)
    assert all(
        g["doc_id"] == w["doc_id"] and list(g["tokens"]) == list(w["tokens"])
        for g, w in zip(got, want)
    )


def test_ingest_crash_recovery(spark, tmp_path):
    """Ledger written but segment rename lost (simulated crash): the next
    ingest of the same file repairs the segment instead of skipping it."""
    initial = datagen.gen_initial_state(10, seed=33, max_len=4)
    events = datagen.gen_events([r["doc_id"] for r in initial], 20, 1, seed=34, max_len=4)
    incoming = _write_segments(spark, tmp_path, events, 1)
    wal = str(tmp_path / "wal")
    ingest_files(incoming, wal)
    seg = os.path.join(wal, "batch-0.parquet")
    os.remove(seg)  # simulate the crash window
    report = ingest_files(incoming, wal)
    assert report[0]["status"] == "ingested"
    assert os.path.exists(seg)


def test_extract_archive_zip_tar_and_stale_dir(tmp_path):
    """ExtractZip/TarStep analogue (reference transformers.py:10-56): unpack,
    stale destination removed first, traversal rejected."""
    import tarfile
    import zipfile

    from georef_ar_etl_spark.sources.archives import ArchiveError, extract_archive

    zp = tmp_path / "a.zip"
    with zipfile.ZipFile(zp, "w") as z:
        z.writestr("inner/data.csv", "x,y\n1,2\n")
    dest = extract_archive(str(zp))
    assert open(os.path.join(dest, "inner", "data.csv")).read().startswith("x,y")

    # stale content in the destination is wiped by a re-extract
    stale = os.path.join(dest, "stale.txt")
    open(stale, "w").write("old")
    dest2 = extract_archive(str(zp))
    assert dest2 == dest and not os.path.exists(stale)

    tp = tmp_path / "b.tar.gz"
    src = tmp_path / "payload.txt"
    src.write_text("hello")
    with tarfile.open(tp, "w:gz") as t:
        t.add(src, arcname="payload.txt")
    dest3 = extract_archive(str(tp), str(tmp_path / "out"))
    assert open(os.path.join(dest3, "payload.txt")).read() == "hello"

    # directory traversal rejected
    evil = tmp_path / "evil.zip"
    with zipfile.ZipFile(evil, "w") as z:
        z.writestr("../escape.txt", "nope")
    with pytest.raises(ArchiveError):
        extract_archive(str(evil))

    with pytest.raises(ArchiveError):
        extract_archive(str(src))  # not an archive


def test_csv_ingest_append_and_malformed_split(spark, tmp_path):
    """Ogr2ogrStep-analogue ingest (reference loaders.py:22-99 + the
    24-file append, streets.py:33-41): schema-enforced multi-file CSV read
    with per-file lineage and a malformed-row side-output."""
    from pyspark.sql import types as T

    from georef_ar_etl_spark.sources.tabular import read_csv_tables, split_malformed

    p1, p2 = str(tmp_path / "part1.csv"), str(tmp_path / "part2.csv")
    open(p1, "w").write("id,name,qty\n1,aa,10\n2,bb,20\n")
    open(p2, "w").write("id,name,qty\n3,cc,30\nBADROW,dd,not_a_number\n")
    schema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("qty", T.IntegerType()),
    ])
    df = read_csv_tables(spark, [p1, p2], schema)
    good, bad = split_malformed(df)
    assert good.count() == 3  # counting the good side must not throw
    rows = {r["id"]: r for r in good.collect()}
    assert sorted(rows) == [1, 2, 3]
    assert rows[3]["_source_file"] == p2  # append preserves file lineage
    assert bad.count() == 1  # the unparseable row is quarantined, not fatal
    assert good.schema["qty"].dataType.simpleString() == "int"
    # pruned projections must NOT resurrect the malformed row on the good
    # side (a live CSV scan would re-parse only the projected columns)
    assert sorted(r["name"] for r in good.select("name").collect()) == ["aa", "bb", "cc"]


def test_extract_archive_rejects_symlink_escape(tmp_path):
    """A tar with a symlink member pointing outside the destination (or a
    member path THROUGH such a link) must be rejected — name checks alone
    don't catch it because realpath of a not-yet-created link resolves to
    nothing."""
    import io
    import tarfile

    from georef_ar_etl_spark.sources.archives import ArchiveError, extract_archive

    evil = tmp_path / "evil.tar"
    with tarfile.open(evil, "w") as t:
        info = tarfile.TarInfo("lnk")
        info.type = tarfile.SYMTYPE
        info.linkname = str(tmp_path / "victim")
        t.addfile(info)
        data = b"pwned"
        f = tarfile.TarInfo("lnk/evil.txt")
        f.size = len(data)
        t.addfile(f, io.BytesIO(data))
    with pytest.raises(ArchiveError):
        extract_archive(str(evil))
    assert not os.path.exists(tmp_path / "victim")


def test_extract_archive_accepts_gnu_dot_entries(tmp_path):
    """GNU tar's './' directory members are benign and must extract."""
    import io
    import tarfile

    from georef_ar_etl_spark.sources.archives import extract_archive

    p = tmp_path / "dot.tar"
    with tarfile.open(p, "w") as t:
        d = tarfile.TarInfo(".")
        d.type = tarfile.DIRTYPE
        t.addfile(d)
        data = b"ok"
        f = tarfile.TarInfo("./inner.txt")
        f.size = len(data)
        t.addfile(f, io.BytesIO(data))
    dest = extract_archive(str(p))
    assert open(os.path.join(dest, "inner.txt")).read() == "ok"


def test_extract_archive_rejects_hardlink_escape(tmp_path):
    """Hardlink linknames resolve from the extraction ROOT (tarfile
    semantics), not the member's directory — an escaping hardlink must be
    rejected with the module's contract exception, not a raw tarfile error
    after partial extraction."""
    import io
    import tarfile

    from georef_ar_etl_spark.sources.archives import ArchiveError, extract_archive

    victim = tmp_path / "secret.txt"
    victim.write_text("s3cret")
    evil = tmp_path / "hl.tar"
    with tarfile.open(evil, "w") as t:
        d = tarfile.TarInfo("a")
        d.type = tarfile.DIRTYPE
        t.addfile(d)
        info = tarfile.TarInfo("a/lnk")
        info.type = tarfile.LNKTYPE
        info.linkname = "../secret.txt"  # from extraction root: OUTSIDE dest
        t.addfile(info)
    with pytest.raises(ArchiveError):
        extract_archive(str(evil), str(tmp_path / "out"))

"""Export sinks: envelope JSON, NDJSON-with-header, flattened CSV, publish
(reference behaviors: loaders.py:127-289, utils.py:138-170)."""

import csv
import json

from pyspark.sql import functions as F

from georef_ar_etl_spark.sinks import export


def _df(spark):
    return spark.createDataFrame(
        [("a1", 3, 1.5, ("x", 1)), ("b2", 7, 2.5, ("y", 2))],
        "id string, n int, v double, meta struct<tag:string, k:int>",
    )


def test_export_json_envelope(spark, tmp_path):
    p = str(tmp_path / "out.json")
    total = export.export_json(_df(spark), p, name="docs", parameters={"q": 1})
    doc = json.load(open(p))
    assert total == 2
    assert doc["cantidad"] == doc["total"] == 2
    assert doc["inicio"] == 0 and doc["parametros"] == {"q": 1}
    assert {r["id"] for r in doc["docs"]} == {"a1", "b2"}


def test_export_ndjson_header_first_line(spark, tmp_path):
    p = str(tmp_path / "out.ndjson")
    export.export_ndjson(_df(spark), p, version="9.9.9", created="2024-01-01")
    lines = open(p).read().splitlines()
    head = json.loads(lines[0])
    assert head == {
        "cantidad": 2, "fecha_creacion": "2024-01-01",
        "timestamp": "2024-01-01", "version": "9.9.9",
    }
    assert len(lines) == 3
    assert {json.loads(l)["id"] for l in lines[1:]} == {"a1", "b2"}


def test_export_csv_flattened_sorted_quoted(spark, tmp_path):
    p = str(tmp_path / "out.csv")
    n = export.export_csv(_df(spark), p)
    assert n == 2
    rows = list(csv.reader(open(p)))
    assert rows[0] == ["id", "meta_k", "meta_tag", "n", "v"]  # sorted, flattened
    raw = open(p).read()
    assert '"a1"' in raw and '"x"' in raw  # non-numeric quoted
    assert '"3"' not in raw  # numeric unquoted


def test_flatten_depth_limit(spark):
    df = spark.createDataFrame(
        [(((("deep",),),),)], "a struct<b: struct<c: struct<d: string>>>"
    )
    flat = export.flatten_struct_columns(df, max_depth=3)
    # depth 3 reached at a.b.c — the struct<d> below is kept as a struct
    assert flat.columns == ["a_b_c"]
    assert flat.select(F.col("a_b_c.d")).first()[0] == "deep"


def test_publish_atomic(spark, tmp_path):
    src = tmp_path / "artifact.json"
    src.write_text('{"ok": true}')
    dest = export.publish(str(src), str(tmp_path / "published"))
    assert json.load(open(dest)) == {"ok": True}


def test_export_ndjson_sharded_manifest(spark, tmp_path):
    """Distributed NDJSON: executor-written shards + an atomic manifest
    carrying the single-file format's metadata header; manifest+shards
    reassemble to exactly the source rows."""
    import gzip
    import json as _json
    import os

    from georef_ar_etl_spark.sinks.export import export_ndjson_sharded

    df = spark.range(100).selectExpr("id", "id % 5 AS grp", "concat('d', id) AS name")
    out = str(tmp_path / "pub")
    m = export_ndjson_sharded(df, out, version="9.9.9", created="2020-01-01", partition_by="grp")
    assert m["cantidad"] == 100 and m["version"] == "9.9.9"
    assert m["shards"], "manifest must list shard files"
    # partitioned layout: shards live under grp=<v>/ directories
    assert any("grp=" in s for s in m["shards"])

    got = []
    for shard in m["shards"]:
        p = os.path.join(out, shard)
        opener = gzip.open if p.endswith(".gz") else open
        with opener(p, "rt") as f:
            for line in f:
                got.append(_json.loads(line))
    # partitionBy drops the partition column from the shard payload
    assert sorted(r["id"] for r in got) == list(range(100))
    assert all(r["name"] == f"d{r['id']}" for r in got)

    # manifest written last = commit point
    assert os.path.exists(os.path.join(out, "_manifest.json"))


def test_export_csv_sharded_roundtrip(spark, tmp_path):
    import os

    from georef_ar_etl_spark.sinks.export import export_csv_sharded

    df = spark.createDataFrame(
        [(1, ("a", 2.5)), (2, ("b", 3.5))],
        "id int, s struct<name: string, v: double>",
    )
    out = str(tmp_path / "csvpub")
    m = export_csv_sharded(df, out)
    # count observed on the write pass, manifest = commit point
    assert m["cantidad"] == 2
    assert m["shards"] and all(s.endswith(".csv") for s in m["shards"])
    assert sorted(m["columns"]) == ["id", "s_name", "s_v"]
    back = spark.read.option("header", True).csv(os.path.join(out, m["data_dir"]))
    assert sorted(back.columns) == ["id", "s_name", "s_v"]
    assert back.count() == 2


def test_sharded_reexport_is_atomic(spark, tmp_path):
    """ADVICE r02 (medium): a re-export must never clobber the live
    generation in place — the old manifest's shards stay readable until the
    new manifest flips, and the flip sweeps the superseded generation."""
    import os

    from georef_ar_etl_spark.sinks.export import export_ndjson_sharded

    out = str(tmp_path / "pub")
    m1 = export_ndjson_sharded(
        spark.range(10).selectExpr("id"), out, version="1", created="2020-01-01"
    )
    # every shard the live manifest references exists on disk
    assert all(os.path.exists(os.path.join(out, s)) for s in m1["shards"])

    m2 = export_ndjson_sharded(
        spark.range(20).selectExpr("id"), out, version="2", created="2020-01-02"
    )
    assert m2["data_dir"] != m1["data_dir"]  # fresh generation, not in-place
    assert m2["cantidad"] == 20
    assert all(os.path.exists(os.path.join(out, s)) for s in m2["shards"])
    # superseded generation swept after the flip
    assert not os.path.exists(os.path.join(out, m1["data_dir"]))
    import json as _json

    with open(os.path.join(out, "_manifest.json")) as f:
        assert _json.load(f)["version"] == "2"


def test_sharded_sweep_spares_concurrent_generation(spark, tmp_path):
    """The post-flip sweep may remove ONLY the generation the previous
    manifest referenced — never other data-* dirs, which can belong to a
    concurrent export still writing (code-review r03 finding)."""
    import os

    from georef_ar_etl_spark.sinks.export import export_ndjson_sharded

    out = str(tmp_path / "pub")
    m1 = export_ndjson_sharded(
        spark.range(5).selectExpr("id"), out, version="1", created="2020-01-01"
    )
    # a concurrent export's half-written generation appears on disk
    foreign = os.path.join(out, "data-concurrent0")
    os.makedirs(foreign)
    with open(os.path.join(foreign, "part-00000.json.gz"), "wb") as f:
        f.write(b"half-written shard bytes")

    m2 = export_ndjson_sharded(
        spark.range(7).selectExpr("id"), out, version="2", created="2020-01-02"
    )
    assert not os.path.exists(os.path.join(out, m1["data_dir"]))  # predecessor swept
    assert os.path.exists(foreign), "sweep deleted a concurrent export's generation"
    assert os.path.exists(os.path.join(out, m2["data_dir"]))

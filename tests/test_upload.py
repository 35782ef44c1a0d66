"""Mixed-format upload batch (reference multipart upload,
UploadService.java:59-128): per-file format dispatch inside the
distributed decode task."""

import gzip
import json
import shutil

from mod_reservoir_spark.sources.upload import read_marc_upload, upload_batch

RES = "/root/reference/util/src/test/resources"


def _mixed_dir(tmp_path):
    d = tmp_path / "upload"
    d.mkdir()
    shutil.copy(f"{RES}/marc3.marc", d / "part1.marc")
    shutil.copy(f"{RES}/record10.xml", d / "part2.xml")
    with open(f"{RES}/marc3.xml", "rb") as f:
        (d / "part3.xml.gz").write_bytes(gzip.compress(f.read()))
    return d


def test_read_marc_upload_dispatches_per_file(spark, tmp_path):
    from mod_reservoir_spark.sources.iso2709 import read_iso2709
    from mod_reservoir_spark.sources.marcxml import read_marcxml

    d = _mixed_dir(tmp_path)
    got = read_marc_upload(spark, str(d)).collect()
    by_file = {}
    for r in got:
        by_file.setdefault(r.file.rsplit("/", 1)[-1], []).append(r)
    n_marc = read_iso2709(spark, f"{RES}/marc3.marc").count()
    n_xml = read_marcxml(spark, f"{RES}/record10.xml").count()
    n_gz = read_marcxml(spark, f"{RES}/marc3.xml").count()
    assert len(by_file["part1.marc"]) == n_marc
    assert len(by_file["part2.xml"]) == n_xml
    assert len(by_file["part3.xml.gz"]) == n_gz  # gzip + sniff
    # records are real MARC-in-JSON
    marc = json.loads(by_file["part2.xml"][0].marc_json)
    assert "fields" in marc and "leader" in marc


def test_upload_batch_end_to_end(spark, warehouse, tmp_path):
    d = _mixed_dir(tmp_path)
    cfg = {
        "id": "f001",
        "method": "jsonpath",
        "params": json.dumps({"expr": "$.marc.fields[*].001"}),
        "update": "ingest",
    }
    stats = upload_batch(spark, warehouse, str(d), "UP", [cfg])
    ingested = read_marc_upload(spark, str(d)).collect()
    distinct_ids = {
        json.loads(r.marc_json)
        .get("fields", [{}])[0]
        .get("001")
        for r in ingested
    } - {None}
    assert stats["processed"] == len(ingested)
    # marc3.marc and marc3.xml.gz carry the same 001s — the natural-key
    # upsert stores one row per (local_id, source, version)
    recs = warehouse.read("global_records")
    assert recs.filter("source_id = 'UP'").count() == len(distinct_ids)

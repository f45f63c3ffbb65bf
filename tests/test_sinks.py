"""Training-data sinks: size-bounded parquet shards and
WebDataset-style tar shards."""

from __future__ import annotations

import json
import os
import tarfile

from pyspark.sql import functions as F

from graphdb_wikidata_spark import sinks
from graphdb_wikidata_spark.operators.corpus import pack_sequences_budget
from tests.conftest import SF_SMOKE


def test_training_shards_partitioned_and_bounded(spark, tmp_path):
    packed = pack_sequences_budget(spark, SF_SMOKE)
    out = str(tmp_path / "shards")
    sinks.write_training_shards(packed, out, max_records_per_file=40)
    back = spark.read.parquet(out)
    assert back.count() == packed.count()
    # partitioned by source: one directory per source value
    srcs = {r.source for r in packed.select("source").distinct().collect()}
    assert {d.split("=")[1] for d in os.listdir(out) if d.startswith("source=")} == srcs
    # size bound enforced: every parquet file holds <= 40 rows
    for root, _dirs, files in os.walk(out):
        for f in files:
            if f.endswith(".parquet"):
                n = spark.read.parquet(os.path.join(root, f)).count()
                assert n <= 40, (f, n)


def test_webdataset_roundtrip(spark, tmp_path):
    out = str(tmp_path / "wds")
    manifest = sinks.media_webdataset(spark, SF_SMOKE, out, shards=3).collect()
    n_in = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").count()
    assert sum(r.n_samples for r in manifest) == n_in
    assert 1 <= len(manifest) <= 3
    # read every shard back with stdlib tarfile: each sample is a
    # .bin/.json pair and the metadata parses
    seen = 0
    for r in manifest:
        path = os.path.join(out, r.shard)
        assert os.path.getsize(path) == r.n_bytes
        with tarfile.open(path) as tar:
            names = tar.getnames()
            bins = {n[:-4] for n in names if n.endswith(".bin")}
            jsons = {n[:-5] for n in names if n.endswith(".json")}
            assert bins == jsons
            seen += len(bins)
            first = sorted(bins)[0]
            meta = json.loads(tar.extractfile(f"{first}.json").read())
            assert meta["kind"] in ("image", "audio", "video")
            payload = tar.extractfile(f"{first}.bin").read()
            assert len(payload) > 0
    assert seen == n_in


def test_webdataset_payloads_match_source(spark, tmp_path):
    """Shard contents are byte-identical to the source payload column."""
    from graphdb_wikidata_spark.operators.multimodal import media_table

    out = str(tmp_path / "wds2")
    manifest = sinks.media_webdataset(spark, SF_SMOKE, out, shards=2).collect()
    want = {
        str(r.media_id): bytes(r.payload)
        for r in media_table(spark, SF_SMOKE).select("media_id", "payload").collect()
    }
    got = {}
    for r in manifest:
        with tarfile.open(os.path.join(out, r.shard)) as tar:
            for n in tar.getnames():
                if n.endswith(".bin"):
                    got[n[:-4]] = tar.extractfile(n).read()
    assert got == want


def test_full_pipeline_to_disk(spark, tmp_path):
    """The complete user story in one flow: dedup -> quality -> pack
    (corpus_dedup_quality_pack) -> sharded parquet on disk, read back
    intact."""
    from graphdb_wikidata_spark.operators.corpus import QUERIES as CQ

    packed = CQ["corpus_dedup_quality_pack"](spark, SF_SMOKE)
    out = str(tmp_path / "pipeline")
    sinks.write_training_shards(packed, out, max_records_per_file=64)
    back = spark.read.parquet(out)
    assert sorted(map(tuple, back.select(*packed.columns).collect())) == sorted(
        map(tuple, packed.collect())
    )


def test_webdataset_overwrite_removes_stale_shards(spark, tmp_path):
    out = str(tmp_path / "wds3")
    m1 = sinks.media_webdataset(spark, SF_SMOKE, out, shards=6).collect()
    mdf = sinks.media_webdataset(spark, SF_SMOKE, out, shards=2)
    m2 = mdf.collect()
    tars = sorted(f for f in os.listdir(out) if f.endswith(".tar"))
    # no orphans from the 6-shard run survive the 2-shard rerun
    assert tars == sorted(r.shard for r in m2)
    assert len(tars) <= 2 < len(m1) + 1
    # the write ran exactly once inside the call: further actions on
    # the returned manifest must NOT rewrite the shards
    before = {f: os.path.getmtime(os.path.join(out, f)) for f in tars}
    assert mdf.count() == len(m2)
    after = {f: os.path.getmtime(os.path.join(out, f)) for f in tars}
    assert before == after


def test_webdataset_null_and_duplicate_rejected(spark, tmp_path):
    import pytest
    from py4j.protocol import Py4JJavaError

    out = str(tmp_path / "wds4")
    null_df = spark.createDataFrame(
        [("a", bytearray(b"x"), '{"k":1}'), ("b", None, '{"k":2}')],
        "key string, payload binary, meta_json string",
    )
    with pytest.raises(Exception, match="NULL payload|PythonException|ValueError"):
        sinks.write_webdataset_shards(null_df, out, shards=1)

    dup_df = spark.createDataFrame(
        [("a", bytearray(b"x"), "{}"), ("a", bytearray(b"y"), "{}")],
        "key string, payload binary, meta_json string",
    )
    with pytest.raises(Exception, match="duplicate webdataset key|PythonException|ValueError"):
        sinks.write_webdataset_shards(dup_df, out, shards=1)

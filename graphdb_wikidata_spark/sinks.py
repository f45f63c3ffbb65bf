"""Training-data output sinks.

The reference's only sink is the SPARQL-JSON HTTP response
(server.rs:87-141); a training pipeline additionally needs to WRITE
model-ready artifacts. Two sinks:

- ``write_training_shards``: packed text sequences -> size-bounded
  parquet shards, partitioned by source. Uses Spark's own
  ``maxRecordsPerFile`` so shard sizing is enforced by the writer
  tasks (distributed, no driver involvement), and
  ``partitionBy(source)`` so a later mixing job prunes whole
  directories per source.
- ``write_webdataset_shards``: (key, payload bytes, json metadata)
  rows -> WebDataset-style ``.tar`` shards (each sample is a
  ``<key>.bin`` + ``<key>.json`` member pair), written per partition
  with stdlib ``tarfile`` inside ``mapInPandas`` — payload bytes
  travel executor-side in Arrow batches and never shuffle; the
  returned manifest (one row per shard) is the only thing that
  reaches the driver.

Scale posture: both sinks are embarrassingly parallel writer maps.
Shard count = #partitions (repartition chooses parallelism), shard
size is bounded per task, and the manifest relation is #shards rows.
"""

from __future__ import annotations

import io
import os
import tarfile

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: rows per parquet shard (tiny for tests; ~1M for real packed docs)
DEFAULT_SHARD_RECORDS = 10_000


def write_training_shards(
    packed: DataFrame, path: str, max_records_per_file: int = DEFAULT_SHARD_RECORDS
) -> None:
    """Write packed sequences (any frame with a ``source`` column) as
    size-bounded parquet shards partitioned by source."""
    (
        packed.write.mode("overwrite")
        .option("maxRecordsPerFile", max_records_per_file)
        .partitionBy("source")
        .parquet(path)
    )


_MANIFEST_SCHEMA = "shard string, n_samples bigint, n_bytes bigint"


def write_webdataset_shards(
    samples: DataFrame,
    out_dir: str,
    shards: int = 4,
    key_col: str = "key",
    payload_col: str = "payload",
    meta_col: str = "meta_json",
) -> DataFrame:
    """(key, payload binary, meta_json string) -> WebDataset tar shards.

    Each output ``shard-NNNNN.tar`` holds, per sample, ``<key>.bin``
    (the raw payload) and ``<key>.json`` (its metadata) — the layout
    webdataset/torchdata readers stream sequentially, which is the
    whole point at 100 TB: training readers do large sequential tar
    reads instead of per-sample object-store requests.

    Samples are hash-distributed over ``shards`` partitions
    (deterministic by key); each writer task streams its Arrow batches
    into one tar via stdlib ``tarfile``. The write runs EXACTLY ONCE
    inside this call (the manifest is collected, not returned lazily —
    a lazy manifest would silently re-truncate and rewrite every shard
    on each downstream action); the returned manifest DataFrame
    (shard, n_samples, n_bytes) is a small local relation.

    ``out_dir`` must be storage every writer can reach: a shared
    mount / fuse-mounted object store on a real cluster (local paths
    only work on local[N]). Concurrency safety: each attempt writes to
    an attempt-unique temp path and atomically renames into the final
    ``shard-NNNNN.tar`` — a speculative or zombie duplicate attempt
    can race the rename, but never interleave bytes into the shard a
    reader sees. Stale ``shard-*.tar`` from a previous run are removed
    first (parquet-mode("overwrite") semantics), so a re-run with
    fewer shards cannot leave orphans for a ``*.tar`` glob to pick up.
    NULL payloads/metadata and duplicate keys raise instead of
    silently writing corrupt samples."""
    os.makedirs(out_dir, exist_ok=True)
    for stale in os.listdir(out_dir):
        if stale.startswith("shard-") and stale.endswith(".tar"):
            os.remove(os.path.join(out_dir, stale))
    dist = samples.repartition(shards, F.col(key_col)).select(
        F.col(key_col).cast("string").alias("key"),
        F.col(payload_col).alias("payload"),
        F.col(meta_col).alias("meta_json"),
    )

    def _write(iterator):
        import pandas as pd
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId()
        shard_path = os.path.join(out_dir, f"shard-{pid:05d}.tar")
        tmp_path = f"{shard_path}.attempt-{ctx.taskAttemptId()}.tmp"
        n = 0
        seen: set[str] = set()
        with tarfile.open(tmp_path, "w") as tar:
            for batch in iterator:
                for key, payload, meta in zip(
                    batch["key"], batch["payload"], batch["meta_json"]
                ):
                    if payload is None or meta is None or (
                        not isinstance(meta, str) and pd.isna(meta)
                    ):
                        raise ValueError(
                            f"webdataset sample {key!r}: NULL payload/meta_json "
                            "(drop or fill upstream; refusing to write a corrupt sample)"
                        )
                    if key in seen:
                        raise ValueError(
                            f"duplicate webdataset key {key!r}: adjacency-grouping "
                            "readers would mis-pair its members"
                        )
                    seen.add(key)
                    blob = bytes(payload)
                    info = tarfile.TarInfo(name=f"{key}.bin")
                    info.size = len(blob)
                    tar.addfile(info, io.BytesIO(blob))
                    mblob = str(meta).encode("utf-8")
                    minfo = tarfile.TarInfo(name=f"{key}.json")
                    minfo.size = len(mblob)
                    tar.addfile(minfo, io.BytesIO(mblob))
                    n += 1
        if n == 0:
            os.remove(tmp_path)  # no empty shards in the dataset dir
            size = 0
        else:
            os.replace(tmp_path, shard_path)  # atomic: readers never see partial tars
            size = os.path.getsize(shard_path)
        yield pd.DataFrame(
            {"shard": [os.path.basename(shard_path)], "n_samples": [n], "n_bytes": [size]}
        )

    manifest_rows = (
        dist.mapInPandas(_write, schema=_MANIFEST_SCHEMA)
        .filter(F.col("n_samples") > 0)
        .collect()
    )
    return samples.sparkSession.createDataFrame(manifest_rows, _MANIFEST_SCHEMA)


def media_webdataset(spark, sf_dir: str, out_dir: str, shards: int = 4) -> DataFrame:
    """The composed multimodal export: media payloads + typed metadata
    -> WebDataset shards. Returns the manifest."""
    from .operators.multimodal import media_table

    m = media_table(spark, sf_dir)
    samples = m.select(
        F.col("media_id").alias("key"),
        F.col("payload"),
        F.to_json(F.struct("kind", "meta")).alias("meta_json"),
    )
    return write_webdataset_shards(samples, out_dir, shards=shards)

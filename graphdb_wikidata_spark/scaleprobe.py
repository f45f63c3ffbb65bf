"""Scale-probe data synthesis: a key-shifted FACTORx copy of an sf dir.

The small-sf tables verify correctness; this module materializes a
FACTOR-times-larger twin so bench.py can verify the flagship plan
shapes HOLD as data grows (VERDICT r01 #5): runtime at FACTORx should
stay within ~linear of the 1x number — a broadcast that silently turns
into a shuffle, or a candidate join that goes quadratic, shows up here
long before a real cluster run would catch it.

Scaling rules (honest 10x, not 10 literal clones):
- region/nation: copied 1x — fixed-size dimensions in TPC-H semantics.
- customer/orders/lineitem/part/supplier: FACTOR copies with key
  offsets of (max_key + 1) * i, foreign keys shifted in lockstep, so
  referential integrity and per-key fan-outs match the base exactly.
- events: event_id AND user_id shifted — the user population grows
  with the data (10x rows over the same users would be a different,
  skew-heavier workload than the generator's).
- documents: doc_id shifted and every word salted with the copy index
  (JVM-side transform) — shingle/minhash structure within a copy is
  identical to the base, while cross-copy Jaccard collapses to ~0, so
  near-dup pair counts scale linearly like real new data (10 verbatim
  clones would make every LSH group quadratically denser instead).
- embeddings: vec_id shifted; vectors reused (the probe queries don't
  pairwise-join embeddings across copies).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .tables import TABLE_NAMES, table

#: bump when _scaled's synthesis rules change — the on-disk cache is
#: keyed to (source files x synthesis code), not the source alone
_SYNTHESIS_VERSION = 2

#: bump when _apply_zipf's overlay rules change (rate, celebrity key or
#: text): invalidates cached ZIPF twins only, never the uniform twins
_ZIPF_OVERLAY_VERSION = 2

COPY_1X = ("region", "nation")
PK = {
    "customer": "c_custkey",
    "orders": "o_orderkey",
    "part": "p_partkey",
    "supplier": "s_suppkey",
    "events": "event_id",
    "documents": "doc_id",
    "embeddings": "vec_id",
}


def _span(spark: SparkSession, sf_dir: str, tbl: str, col: str) -> int:
    return table(spark, sf_dir, tbl).agg(F.max(col)).first()[0] + 1


def _scaled(spark: SparkSession, sf_dir: str, name: str, factor: int) -> DataFrame:
    df = table(spark, sf_dir, name)
    if name in COPY_1X:
        return df
    copies = (
        spark.range(factor).select(F.col("id").cast("int").alias("__copy"))
    )
    out = df.crossJoin(F.broadcast(copies))
    if name == "customer":
        span = _span(spark, sf_dir, "customer", "c_custkey")
        out = out.withColumn("c_custkey", F.col("c_custkey") + F.col("__copy") * span)
    elif name == "orders":
        ospan = _span(spark, sf_dir, "orders", "o_orderkey")
        cspan = _span(spark, sf_dir, "customer", "c_custkey")
        out = out.withColumn(
            "o_orderkey", F.col("o_orderkey") + F.col("__copy") * ospan
        ).withColumn("o_custkey", F.col("o_custkey") + F.col("__copy") * cspan)
    elif name == "lineitem":
        ospan = _span(spark, sf_dir, "orders", "o_orderkey")
        pspan = _span(spark, sf_dir, "part", "p_partkey")
        sspan = _span(spark, sf_dir, "supplier", "s_suppkey")
        out = (
            out.withColumn("l_orderkey", F.col("l_orderkey") + F.col("__copy") * ospan)
            .withColumn("l_partkey", F.col("l_partkey") + F.col("__copy") * pspan)
            .withColumn("l_suppkey", F.col("l_suppkey") + F.col("__copy") * sspan)
        )
    elif name in ("part", "supplier", "embeddings"):
        k = PK[name]
        span = _span(spark, sf_dir, name, k)
        out = out.withColumn(k, F.col(k) + F.col("__copy") * span)
    elif name == "events":
        espan = _span(spark, sf_dir, "events", "event_id")
        uspan = _span(spark, sf_dir, "events", "user_id")
        out = out.withColumn(
            "event_id", F.col("event_id") + F.col("__copy") * espan
        ).withColumn("user_id", F.col("user_id") + F.col("__copy") * uspan)
    elif name == "documents":
        span = _span(spark, sf_dir, "documents", "doc_id")
        salted = F.array_join(
            F.transform(
                F.split(F.col("text"), " "),
                lambda w: F.concat(w, F.lit("~"), F.col("__copy").cast("string")),
            ),
            " ",
        )
        out = (
            out.withColumn("doc_id", F.col("doc_id") + F.col("__copy") * span)
            .withColumn("text", F.when(F.col("__copy") == 0, F.col("text")).otherwise(salted))
            .withColumn("n_chars", F.length("text"))
        )
    return out.drop("__copy").select(*df.columns)


#: a celebrity document: long enough to shingle like a real doc; every
#: 100th document in the zipf twin becomes (a copy of) this, so ~1% of
#: the corpus lands in ONE near-dup cluster — the skew shape LSH-based
#: dedup must survive (a boilerplate page duplicated across a crawl)
#: the zipf overlay's hot join key: an existing base customer, chosen
#: inside nation 7 (see _apply_zipf docstring)
_CELEBRITY_CUSTKEY = 87

_CELEBRITY_TEXT = " ".join(
    f"boilerplate token{i % 17} navigation footer copyright widget{i % 7}"
    for i in range(24)
)


def _apply_zipf(name: str, df: DataFrame) -> DataFrame:
    """Skew overlay for the zipf twin (uniform twin + these rules):

    - orders: every 100th order is reassigned to ONE existing base
      customer so a celebrity entity owns ~1% of the o_custkey join
      key (the shape AQE skew-join splitting / salting must absorb;
      the uniform twins are key-shifted and prove nothing about skew).
      The celebrity is customer 87 — the smallest nation-7 customer in
      the synthetic generator at every sf — so the hot key also
      SURVIVES the bgp probe's nation filter and flows through join
      AND result materialization instead of being filtered away
      (tests/test_scaleprobe.py asserts the nation-7 membership, so a
      testdata regeneration that moves it fails loudly).
    - documents: every 100th document becomes the celebrity text — one
      near-dup cluster holding ~1% of the corpus, so the LSH candidate
      graph grows a dense component instead of uniform small groups.
    Everything else is identical to the uniform twin, so probe-time
    deltas isolate the skew response."""
    if name == "orders":
        return df.withColumn(
            "o_custkey",
            F.when(F.col("o_orderkey") % 100 == 0, F.lit(_CELEBRITY_CUSTKEY))
            .otherwise(F.col("o_custkey")),
        )
    if name == "documents":
        return df.withColumn(
            "text",
            F.when(
                F.col("doc_id") % 100 == 0, F.lit(_CELEBRITY_TEXT)
            ).otherwise(F.col("text")),
        ).withColumn("n_chars", F.length("text"))
    return df


def _source_fingerprint(sf_dir: str, zipf: bool = False) -> str:
    """Size+mtime digest of the source parquet files: the testdata is
    REGENERATED periodically, so a cached scaled twin must be keyed to
    the exact source it was derived from, not just the dir name. Zipf
    twins carry their own overlay version so an overlay change rebuilds
    them without invalidating the (expensive) uniform twins."""
    import hashlib

    h = hashlib.sha256()
    h.update(f"synthesis-v{_SYNTHESIS_VERSION}".encode())
    if zipf:
        h.update(
            f"zipf-v{_ZIPF_OVERLAY_VERSION}-celebrity{_CELEBRITY_CUSTKEY}".encode()
        )
    for name in TABLE_NAMES:
        p = os.path.join(sf_dir, f"{name}.parquet")
        try:
            st = os.stat(p)
            h.update(f"{name}:{st.st_size}:{st.st_mtime_ns}".encode())
        except FileNotFoundError:
            h.update(f"{name}:absent".encode())
    return h.hexdigest()


def ensure_scaled_dir(
    spark: SparkSession,
    sf_dir: str,
    factor: int = 10,
    out_root: str | None = None,
    zipf: bool = False,
) -> str:
    """Materialize (once per source generation; cached on disk) the
    FACTORx twin of sf_dir; returns a directory usable anywhere an
    sf_dir is accepted. Rebuilds from scratch when the source parquet
    files change (fingerprint marker). With ``zipf=True`` the twin
    additionally gets the celebrity-key overlay (``_apply_zipf``) —
    same size as the uniform twin, different key distribution."""
    out_root = out_root or os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".scaleprobe")
    base = os.path.basename(sf_dir.rstrip("/"))
    suffix = f"{base}_x{factor}" + ("_zipf" if zipf else "")
    out_dir = os.path.abspath(os.path.join(out_root, suffix))
    os.makedirs(out_dir, exist_ok=True)
    fp = _source_fingerprint(sf_dir, zipf)
    marker = os.path.join(out_dir, ".source_fingerprint")
    stale = True
    try:
        with open(marker) as f:
            stale = f.read().strip() != fp
    except FileNotFoundError:
        pass
    for name in TABLE_NAMES:
        dest = os.path.join(out_dir, f"{name}.parquet")
        if not stale and os.path.exists(os.path.join(dest, "_SUCCESS")):
            continue
        df = _scaled(spark, sf_dir, name, factor)
        if zipf:
            df = _apply_zipf(name, df)
        df.write.mode("overwrite").parquet(dest)
    with open(marker, "w") as f:
        f.write(fp)
    return out_dir

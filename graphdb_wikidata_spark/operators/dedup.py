"""Deduplication operators for LLM training-data pipelines.

Exact (hash-groupBy), n-gram Jaccard similarity pairs, MinHash+LSH
candidate generation (shingle -> minhash signature -> banded bucket
join), and SimHash signatures. All expressed with built-in JVM
expressions; the only hash primitive is md5 (available verbatim in the
DuckDB oracle, so signatures hash-match bit-for-bit across engines).

Scale design (the whole point of MinHash-LSH): the shingle->signature
aggregation is a partial-agg groupBy on (doc, seed) — linear in corpus
size; the candidate join is on (band, band_key), i.e. only near-
duplicates ever meet in a shuffle partition. Skewed bands (e.g.
boilerplate-heavy corpora) are handled by AQE skew join splitting.

The GATED entries are the compositions that survive 100 TB:
``dedup_ngram_jaccard`` = LSH candidates -> exact Jaccard on candidate
pairs only, and ``dedup_embedding_lsh_verified`` = hyperplane-LSH
buckets -> exact cosine within buckets. The exact all-pairs kernels
(``ngram_jaccard_allpairs``, ``embedding_cosine_allpairs``) are kept as
unregistered verification twins exercised by pytest at sf0.001, where
tests assert the composed output is a subset of the exact output.
"""

from __future__ import annotations

from collections.abc import Callable

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


def _shingled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents -> (doc_id, source, shingle) with distinct 3-token
    shingles per doc."""
    d = table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    d = d.select("doc_id", "source", toks.alias("toks")).filter(F.size("toks") >= 3)
    shingles = F.array_distinct(
        F.expr("transform(sequence(1, size(toks) - 2), i -> array_join(slice(toks, i, 3), ' '))")
    )
    return d.select("doc_id", "source", F.explode(shingles).alias("sh"))


# SQL fragment shared by the DuckDB oracles: distinct 3-token shingles.
_SH_CTE = """
    toks AS (SELECT doc_id, source, string_split(text, ' ') AS toks
             FROM documents WHERE len(string_split(text, ' ')) >= 3),
    pos AS (SELECT doc_id, source, toks, generate_subscripts(toks, 1) AS i FROM toks),
    sh AS (SELECT DISTINCT doc_id, source, array_to_string(toks[i:i+2], ' ') AS sh
           FROM pos WHERE i <= len(toks) - 2)
"""


@register(
    "dedup_exact",
    """
    SELECT md5(lower(text)) AS text_hash, count(*) AS n_docs, min(doc_id) AS keep_doc_id
    FROM documents GROUP BY md5(lower(text))
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: normalize -> hash -> groupBy; `keep_doc_id` is the
    canonical survivor. Partial agg makes this one shuffle of (hash,
    count) pairs, not of documents."""
    d = table(spark, sf_dir, "documents")
    return (
        d.select("doc_id", F.md5(F.lower("text")).alias("text_hash"))
        .groupBy("text_hash")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("keep_doc_id"))
    )


def ngram_jaccard_allpairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact pairwise 3-gram Jaccard via the shingle self-join.
    O(pairs-sharing-a-shingle) — explodes on boilerplate-heavy corpora,
    so it is NOT the gated entry: it is the small-scale ground truth
    that pytest checks the LSH-gated ``dedup_ngram_jaccard`` against
    (the gated output must be a subset with identical jaccard values)."""
    sh = _shingled(spark, sf_dir)
    cnt = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = sh.select(F.col("doc_id").alias("doc_a"), "sh")
    b = sh.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    pairs = (
        a.join(b, (a.sh == b.sh_b) & (a.doc_a < b.doc_b))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    ca = cnt.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    cb = cnt.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    return (
        pairs.join(ca, "doc_a")
        .join(cb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("common").cast("double") / (F.col("na") + F.col("nb") - F.col("common")), 4
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= 0.1)
    )


N_SEEDS = 16  # 8 bands x 2 rows


@register(
    "dedup_minhash_lsh",
    f"""
    WITH {_SH_CTE},
    sh2 AS (SELECT doc_id,
                   ('0x' || substr(md5(sh), 1, 8))::BIGINT AS h1,
                   ('0x' || substr(md5(sh), 9, 8))::BIGINT AS h2
            FROM sh),
    hs AS (SELECT doc_id, s.seed, min(h1 + s.seed * h2) AS mh
           FROM sh2, generate_series(0, {N_SEEDS - 1}) s(seed)
           GROUP BY doc_id, s.seed),
    bands AS (SELECT doc_id, seed // 2 AS band,
                     string_agg(mh::VARCHAR, '|' ORDER BY seed) AS band_key
              FROM hs GROUP BY doc_id, seed // 2)
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
    """,
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash + LSH near-dup candidates, banded 2 rows x 8 bands.

    One md5 per distinct (doc, shingle), split into two 32-bit halves;
    the 16 hash functions are Kirsch-Mitzenmacher combinations
    h1 + seed*h2 (32-bit values, seed < 16 -> no 64-bit overflow, so
    Spark and DuckDB agree bit-for-bit). All 16 min-signatures are
    computed as map-side-combinable aggregates of ONE groupBy — no 16x
    row explosion, one shuffle of (doc_id, 16 longs). The candidate
    join then only meets docs sharing a band bucket — the 100 TB path
    (AQE splits skewed boilerplate buckets)."""
    return minhash_candidates(_shingled(spark, sf_dir))


def _band_key_array() -> F.Column:
    """mh0..mh15 columns -> the 8 banded 2-row keys."""
    return F.array(
        *[
            F.concat_ws("|", F.col(f"mh{2 * i}"), F.col(f"mh{2 * i + 1}"))
            for i in range(N_SEEDS // 2)
        ]
    )


def minhash_bands(sh: DataFrame) -> DataFrame:
    """(doc_id, sh) -> (doc_id, band, band_key): the LSH band index.

    The batch path: one md5 per distinct (doc, shingle), 16 signatures
    as map-side-combinable ``min`` aggregates of ONE groupBy — a single
    shuffle of (doc_id, 16 longs)."""
    md5 = F.md5("sh")
    base = sh.select(
        "doc_id",
        F.conv(F.substring(md5, 1, 8), 16, 10).cast("long").alias("h1"),
        F.conv(F.substring(md5, 9, 8), 16, 10).cast("long").alias("h2"),
    )
    sigs = base.groupBy("doc_id").agg(
        *[
            F.min(F.col("h1") + F.lit(s) * F.col("h2")).alias(f"mh{s}")
            for s in range(N_SEEDS)
        ]
    )
    return sigs.select("doc_id", F.posexplode(_band_key_array()).alias("band", "band_key"))


def rowwise_minhash_bands(docs: DataFrame) -> DataFrame:
    """documents(doc_id, text, ...) -> (doc_id, band, band_key), as a
    pure per-row projection (array higher-order functions, no shuffle,
    NO aggregation state) — bit-identical band keys to minhash_bands
    (pinned in tests/test_streaming.py).

    This is the STREAM-side formulation: a streaming groupBy(doc_id)
    would be a stateful aggregation (doc_id can't be watermarked), but
    a projection composes into any append-mode stream. On batch data
    it is ~3x more CPU than the hashAgg path (HOF lambdas don't
    vectorize like codegen'd aggregates — measured on the 10x twin),
    so the batch entries keep minhash_bands; per-micro-batch increments
    are where this shape wins."""
    toks = F.split(F.col("text"), " ")
    d = docs.select("doc_id", toks.alias("toks")).filter(F.size("toks") >= 3)
    sh = F.array_distinct(
        F.expr(
            "transform(sequence(1, size(toks) - 2), i -> array_join(slice(toks, i, 3), ' '))"
        )
    )
    # md5 materialized ONCE per shingle (two-level transform), then the
    # two 32-bit halves; 16 Kirsch-Mitzenmacher mins over the pair array
    d = d.select(
        "doc_id",
        F.transform(
            F.transform(sh, lambda x: F.md5(x)),
            lambda m: F.struct(
                F.conv(F.substring(m, 1, 8), 16, 10).cast("long").alias("h1"),
                F.conv(F.substring(m, 9, 8), 16, 10).cast("long").alias("h2"),
            ),
        ).alias("hp"),
    )
    def _combo(seed: int):
        # a closure, NOT a default-arg lambda: transform() reads a
        # 2-parameter lambda as (element, index) and would bind the
        # array index over the seed
        return lambda p: p["h1"] + F.lit(seed) * p["h2"]

    mhs = [
        F.array_min(F.transform(F.col("hp"), _combo(s))).alias(f"mh{s}")
        for s in range(N_SEEDS)
    ]
    sigs = d.select("doc_id", *mhs)
    return sigs.select("doc_id", F.posexplode(_band_key_array()).alias("band", "band_key"))


def minhash_candidates(sh: DataFrame) -> DataFrame:
    """(doc_id, sh) -> distinct candidate pairs (doc_a, doc_b) whose
    minhash signatures collide in at least one LSH band."""
    bands = minhash_bands(sh)
    a = bands.select(F.col("doc_id").alias("doc_a"), "band", "band_key")
    b = bands.select(
        F.col("doc_id").alias("doc_b"),
        F.col("band").alias("band_b"),
        F.col("band_key").alias("band_key_b"),
    )
    return (
        a.join(
            b,
            (a.band == b.band_b) & (a.band_key == b.band_key_b) & (a.doc_a < b.doc_b),
        )
        .select("doc_a", "doc_b")
        .distinct()
    )


@register(
    "dedup_ngram_jaccard",
    f"""
    WITH {_SH_CTE},
    sh2 AS (SELECT doc_id,
                   ('0x' || substr(md5(sh), 1, 8))::BIGINT AS h1,
                   ('0x' || substr(md5(sh), 9, 8))::BIGINT AS h2
            FROM sh),
    hs AS (SELECT doc_id, s.seed, min(h1 + s.seed * h2) AS mh
           FROM sh2, generate_series(0, {N_SEEDS - 1}) s(seed)
           GROUP BY doc_id, s.seed),
    bands AS (SELECT doc_id, seed // 2 AS band,
                     string_agg(mh::VARCHAR, '|' ORDER BY seed) AS band_key
              FROM hs GROUP BY doc_id, seed // 2),
    cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
             FROM bands a JOIN bands b
               ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id),
    sets AS (SELECT doc_id, list(sh) AS shs, count(*) AS n FROM sh GROUP BY doc_id),
    j AS (SELECT doc_a, doc_b,
                 len(list_intersect(sa.shs, sb.shs)) AS common, sa.n AS na, sb.n AS nb
          FROM cand
          JOIN sets sa ON sa.doc_id = doc_a
          JOIN sets sb ON sb.doc_id = doc_b)
    SELECT doc_a, doc_b,
           round(common::DOUBLE / (na + nb - common), 4) AS jaccard
    FROM j WHERE common::DOUBLE / (na + nb - common) >= 0.1
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard, verified on MinHash-LSH candidate pairs
    ONLY — the 100 TB composition: candidate generation is the banded
    bucket join above (linear + collision-bounded), and the exact
    verify touches |candidates| pairs, not O(n^2). The per-doc shingle
    sets ride along two equi-joins keyed on doc_id (broadcastable once
    the candidate list is small, which is the point of LSH). The
    all-pairs shingle self-join lives on as the unregistered
    ``ngram_jaccard_allpairs`` pytest twin."""
    sh = _shingled(spark, sf_dir)
    cand = minhash_candidates(sh)
    sets = sh.groupBy("doc_id").agg(
        F.collect_set("sh").alias("shs"), F.count(F.lit(1)).alias("n")
    )
    sa = sets.select(F.col("doc_id").alias("doc_a"), F.col("shs").alias("shs_a"), F.col("n").alias("na"))
    sb = sets.select(F.col("doc_id").alias("doc_b"), F.col("shs").alias("shs_b"), F.col("n").alias("nb"))
    common = F.size(F.array_intersect("shs_a", "shs_b")).cast("double")
    jac = common / (F.col("na") + F.col("nb") - common)
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .filter(jac >= 0.1)
        .select("doc_a", "doc_b", F.round(jac, 4).alias("jaccard"))
    )


# the ONE simhash oracle CTE chain both signature and band-pairing
# entries share — an edit to the hash width / bit rule here changes
# both oracles together (the _byte_hist single-kernel discipline)
_SIMHASH_CTE = """
    tok AS (SELECT DISTINCT doc_id, t.tok
            FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                  FROM documents) t(doc_id, tok)),
    th AS (SELECT doc_id, ('0x' || substr(md5(tok), 1, 8))::BIGINT AS h FROM tok),
    bits AS (SELECT doc_id, b.b,
                    sum(CASE WHEN (h >> b.b) & 1 = 1 THEN 1 ELSE -1 END) AS s
             FROM th, generate_series(0, 31) b(b)
             GROUP BY doc_id, b.b),
    sig AS (SELECT doc_id,
                   CAST(sum(CASE WHEN s > 0 THEN (1::BIGINT << b) ELSE 0 END)
                        AS BIGINT) AS simhash
            FROM bits GROUP BY doc_id)
"""


@register(
    "simhash_signature",
    f"WITH {_SIMHASH_CTE} SELECT doc_id, simhash FROM sig",
)
def simhash_signature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-bit SimHash over the distinct-token set (md5-derived token
    hashes). Near-dup pairs are then `bit_count(a XOR b) <= k` — see
    tests; the signature itself is the oracle-checked artifact."""
    d = table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.explode(F.array_distinct(F.split(F.col("text"), " "))).alias("tok")
    )
    th = tok.select(
        "doc_id",
        F.conv(F.substring(F.md5("tok"), 1, 8), 16, 10).cast("long").alias("h"),
    )
    bits = (
        th.select("doc_id", "h", F.explode(F.sequence(F.lit(0), F.lit(31))).alias("b"))
        .withColumn(
            "contrib",
            F.when(F.expr("shiftright(h, b) & 1 = 1"), F.lit(1)).otherwise(F.lit(-1)),
        )
        .groupBy("doc_id", "b")
        .agg(F.sum("contrib").alias("s"))
    )
    return bits.groupBy("doc_id").agg(
        F.sum(F.when(F.col("s") > 0, F.expr("shiftleft(CAST(1 AS BIGINT), b)")).otherwise(F.lit(0)))
        .cast("long")
        .alias("simhash")
    )


# candidate-pair CTE chain shared by cluster-level oracles: the
# dedup_minhash_lsh pipeline ending in `cand(doc_a, doc_b)`.
_CAND_CTE = f"""
    {_SH_CTE},
    sh2 AS (SELECT doc_id,
                   ('0x' || substr(md5(sh), 1, 8))::BIGINT AS h1,
                   ('0x' || substr(md5(sh), 9, 8))::BIGINT AS h2
            FROM sh),
    hs AS (SELECT doc_id, s.seed, min(h1 + s.seed * h2) AS mh
           FROM sh2, generate_series(0, {N_SEEDS - 1}) s(seed)
           GROUP BY doc_id, s.seed),
    bands AS (SELECT doc_id, seed // 2 AS band,
                     string_agg(mh::VARCHAR, '|' ORDER BY seed) AS band_key
              FROM hs GROUP BY doc_id, seed // 2),
    cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
             FROM bands a JOIN bands b
               ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id)
"""


@register(
    "dedup_clusters",
    f"""
    WITH RECURSIVE
    {_CAND_CTE},
    ed AS (SELECT doc_a AS u, doc_b AS v FROM cand
           UNION SELECT doc_b, doc_a FROM cand),
    reach AS (SELECT u, v FROM ed
              UNION
              SELECT r.u, e.v FROM reach r JOIN ed e ON r.v = e.u
              WHERE e.v <> r.u),
    comp AS (SELECT u AS doc_id, min(v) AS mn FROM reach GROUP BY u)
    SELECT d.doc_id,
           coalesce(least(c.mn, d.doc_id), d.doc_id) AS cluster_id,
           coalesce(least(c.mn, d.doc_id), d.doc_id) = d.doc_id AS is_kept
    FROM documents d LEFT JOIN comp c ON c.doc_id = d.doc_id
    """,
)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full dedup composition a pipeline actually ships: MinHash-LSH
    candidate pairs -> undirected connected components -> every doc
    labeled with its cluster (min doc_id in the component; singletons
    are their own cluster) and a keep/drop flag (the cluster minimum
    survives).

    Scale shape: candidates come from the banded bucket join (never
    all-pairs); the component step is Shiloach-Vishkin-style hooking
    with path halving over the CANDIDATE-PAIR graph — O(log n) rounds
    regardless of how long the near-dup chains are, and the pair graph
    is orders of magnitude smaller than the corpus (only
    near-duplicates appear in it). The final
    left join back to `documents` is a broadcast when the pair graph
    is small, a shuffle join otherwise — Catalyst/AQE's call. The
    DuckDB oracle states the same semantics as a recursive reachability
    closure, tractable at oracle scale only."""
    from .graph import connected_components

    d = table(spark, sf_dir, "documents")
    cand = minhash_candidates(_shingled(spark, sf_dir))
    edges = cand.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    comp = connected_components(edges).withColumnRenamed("node", "doc_id")
    out = d.select("doc_id").join(comp, "doc_id", "left")
    cluster = F.coalesce(F.col("comp"), F.col("doc_id"))
    return out.select(
        "doc_id",
        cluster.alias("cluster_id"),
        (cluster == F.col("doc_id")).alias("is_kept"),
    )


#: near-dup cosine threshold. 0.95 is the production setting for real
#: embeddings; the synthetic test vectors are near-orthogonal (in-bucket
#: max ~0.41 at sf0.01), so the gated entry uses 0.3 to exercise the
#: pipeline on non-empty output. Tests pin both thresholds.
COSINE_THRESHOLD = 0.3


def embedding_cosine_allpairs(
    spark: SparkSession, sf_dir: str, threshold: float = COSINE_THRESHOLD
) -> DataFrame:
    """Exact all-pairs embedding-cosine near-dup pairs — a broadcast-
    nested-loop cross product, O(n^2): the small-scale ground truth
    that pytest checks `dedup_embedding_lsh_verified` against, NOT a
    registered entry (it would not survive 100 TB). The pairwise join
    is blocked on vec_id order so each pair is computed once."""
    from .similarity import _as_double, dot, norm

    e = table(spark, sf_dir, "embeddings")
    a = e.select(F.col("vec_id").alias("vec_a"), _as_double("embedding").alias("ea"))
    b = e.select(F.col("vec_id").alias("vec_b"), _as_double("embedding").alias("eb"))
    pairs = a.join(b, F.col("vec_a") < F.col("vec_b"))
    sim = dot(F.col("ea"), F.col("eb")) / (norm(F.col("ea")) * norm(F.col("eb")))
    return (
        pairs.select("vec_a", "vec_b", sim.alias("raw_sim"))
        .filter(F.col("raw_sim") >= threshold)
        .select("vec_a", "vec_b", F.round("raw_sim", 6).alias("sim"))
    )


@register(
    "dedup_embedding_lsh_verified",
    f"""
    WITH r AS (SELECT j.j, i.i,
                      ((('0x' || substr(md5(j.j || '_' || i.i), 1, 8))::BIGINT % 1000)
                       / 1000.0 - 0.5) AS rv
               FROM generate_series(0, 7) j(j),
                    generate_series(1, 64) i(i)),
    pl AS (SELECT e.vec_id, r.j, e.embedding[r.i]::DOUBLE * r.rv AS prod
           FROM embeddings e JOIN r ON r.i <= len(e.embedding)),
    d AS (SELECT vec_id, j, sum(prod) AS dotp FROM pl GROUP BY vec_id, j),
    bk AS (SELECT vec_id,
                  CAST(sum(CASE WHEN dotp > 0 THEN (1::BIGINT << j) ELSE 0 END) AS BIGINT) AS bucket
           FROM d GROUP BY vec_id),
    e2 AS (SELECT e.vec_id, e.embedding, bk.bucket
           FROM embeddings e JOIN bk ON e.vec_id = bk.vec_id),
    p0 AS (SELECT a.vec_id AS va, b.vec_id AS vb,
                  generate_subscripts(a.embedding, 1) AS i,
                  unnest(a.embedding)::DOUBLE AS x, b.embedding AS eb
           FROM e2 a JOIN e2 b ON a.bucket = b.bucket AND a.vec_id < b.vec_id),
    p AS (SELECT va, vb, x, eb[i]::DOUBLE AS y FROM p0),
    s AS (SELECT va, vb, sum(x * y) AS dotp,
                 sqrt(sum(x * x)) AS nx, sqrt(sum(y * y)) AS ny
          FROM p GROUP BY va, vb)
    SELECT va AS vec_a, vb AS vec_b, round(dotp / (nx * ny), 6) AS sim
    FROM s WHERE dotp / (nx * ny) >= {COSINE_THRESHOLD}
    """,
)
def dedup_embedding_lsh_verified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs, the 100 TB composition: random-
    hyperplane LSH buckets (`similarity.lsh_bucket_assignments`) bound
    the candidate set, then the exact cosine kernel runs only WITHIN a
    bucket — the pair join is an equi-join on `bucket`, never a cross
    product (tests assert no BroadcastNestedLoopJoin in the plan). The
    unregistered `embedding_cosine_allpairs` twin is the pytest ground
    truth: every pair found here must appear there with the same sim."""
    from .similarity import _as_double, dot, lsh_bucket_assignments, norm

    e = table(spark, sf_dir, "embeddings")
    buckets = lsh_bucket_assignments(e)
    eb = e.join(buckets, "vec_id")
    a = eb.select(
        F.col("vec_id").alias("vec_a"), F.col("bucket").alias("bucket_a"),
        _as_double("embedding").alias("ea"),
    )
    b = eb.select(
        F.col("vec_id").alias("vec_b"), F.col("bucket").alias("bucket_b"),
        _as_double("embedding").alias("eb"),
    )
    pairs = a.join(b, (F.col("bucket_a") == F.col("bucket_b")) & (F.col("vec_a") < F.col("vec_b")))
    sim = dot(F.col("ea"), F.col("eb")) / (norm(F.col("ea")) * norm(F.col("eb")))
    return (
        pairs.select("vec_a", "vec_b", sim.alias("raw_sim"))
        .filter(F.col("raw_sim") >= COSINE_THRESHOLD)
        .select("vec_a", "vec_b", F.round("raw_sim", 6).alias("sim"))
    )


@register(
    "dedup_containment",
    f"""
    WITH {_SH_CTE},
    sh2 AS (SELECT doc_id,
                   ('0x' || substr(md5(sh), 1, 8))::BIGINT AS h1,
                   ('0x' || substr(md5(sh), 9, 8))::BIGINT AS h2
            FROM sh),
    hs AS (SELECT doc_id, s.seed, min(h1 + s.seed * h2) AS mh
           FROM sh2, generate_series(0, {N_SEEDS - 1}) s(seed)
           GROUP BY doc_id, s.seed),
    bands AS (SELECT doc_id, seed // 2 AS band,
                     string_agg(mh::VARCHAR, '|' ORDER BY seed) AS band_key
              FROM hs GROUP BY doc_id, seed // 2),
    cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
             FROM bands a JOIN bands b
               ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id),
    sets AS (SELECT doc_id, list(sh) AS shs, count(*) AS n FROM sh GROUP BY doc_id),
    c AS (SELECT doc_a, doc_b,
                 len(list_intersect(sa.shs, sb.shs)) AS common, sa.n AS na, sb.n AS nb
          FROM cand
          JOIN sets sa ON sa.doc_id = doc_a
          JOIN sets sb ON sb.doc_id = doc_b)
    SELECT doc_a, doc_b,
           round(greatest(common::DOUBLE / na, common::DOUBLE / nb), 4)
               AS containment,
           CASE WHEN na <= nb THEN doc_a ELSE doc_b END AS contained_doc
    FROM c
    WHERE greatest(common::DOUBLE / na, common::DOUBLE / nb) >= 0.5
    """,
)
def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Containment dedup: flags documents mostly SUBSUMED by another
    (|A∩B| / |smaller set| — catches quote-expansions and boilerplate
    supersets that symmetric Jaccard under-scores, since a small doc
    inside a big one has low Jaccard but high containment).

    Same 100 TB composition as ``dedup_ngram_jaccard``: LSH candidates
    bound the pair set, the exact verify touches |candidates| pairs —
    only the final scoring differs."""
    sh = _shingled(spark, sf_dir)
    cand = minhash_candidates(sh)
    sets = sh.groupBy("doc_id").agg(
        F.collect_set("sh").alias("shs"), F.count(F.lit(1)).alias("n")
    )
    sa = sets.select(F.col("doc_id").alias("doc_a"), F.col("shs").alias("shs_a"), F.col("n").alias("na"))
    sb = sets.select(F.col("doc_id").alias("doc_b"), F.col("shs").alias("shs_b"), F.col("n").alias("nb"))
    common = F.size(F.array_intersect("shs_a", "shs_b")).cast("double")
    containment = F.greatest(common / F.col("na"), common / F.col("nb"))
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .filter(containment >= 0.5)
        .select(
            "doc_a",
            "doc_b",
            F.round(containment, 4).alias("containment"),
            F.when(F.col("na") <= F.col("nb"), F.col("doc_a"))
            .otherwise(F.col("doc_b"))
            .alias("contained_doc"),
        )
    )


# ---------------------------------------------------------------------------
# Semantic dedup (SemDeDup-style): cluster embeddings, then flag near-
# duplicates ONLY within a cluster.
# ---------------------------------------------------------------------------

#: number of semantic clusters (k-means K). Deterministic stand-in for
#: trained centroids: the K lowest-vec_id vectors. At 100 TB you train
#: real centroids (K ~ N/1000) on a sample; the operator below is
#: identical from there on.
from .similarity import KMEANS_ITERS as _KM_ITERS
from .similarity import KMEANS_K as SEMDEDUP_K
from .similarity import _kmeans_ctes as _semdedup_kmeans_ctes

#: in-cluster cosine threshold above which the higher-vec_id vector is
#: a semantic duplicate (SemDeDup uses ~0.96 on real embeddings; the
#: synthetic vectors top out at ~0.53, so 0.40 keeps the test
#: non-degenerate — ~20 pairs at sf0.01, ~260 at sf0.1).
SEMDEDUP_TAU = 0.40


@register(
    "dedup_semantic",
    f"""
    {_semdedup_kmeans_ctes()},
    e2 AS (SELECT vec_id, cid, v FROM a{_KM_ITERS}),
    pairs AS (SELECT a.cid, a.vec_id AS va, b.vec_id AS vb,
                     round(list_cosine_similarity(a.v, b.v), 6) AS cs
              FROM e2 a JOIN e2 b ON a.cid = b.cid AND a.vec_id < b.vec_id),
    dup_pairs AS (SELECT * FROM pairs WHERE cs >= {SEMDEDUP_TAU}),
    m AS (SELECT cid, count(*) AS n_members FROM e2 GROUP BY cid),
    p AS (SELECT cid, count(*) AS n_dup_pairs, max(cs) AS max_pair_sim
          FROM dup_pairs GROUP BY cid),
    d AS (SELECT cid, count(*) AS n_dup_vectors
          FROM (SELECT DISTINCT cid, vb FROM dup_pairs) GROUP BY cid)
    SELECT m.cid AS cluster_id,
           m.n_members,
           coalesce(p.n_dup_pairs, 0) AS n_dup_pairs,
           coalesce(d.n_dup_vectors, 0) AS n_dup_vectors,
           coalesce(p.max_pair_sim, 0.0) AS max_pair_sim
    FROM m LEFT JOIN p USING (cid) LEFT JOIN d USING (cid)
    """,
)
def dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): k-means-cluster the embedding
    corpus, then run exact pairwise cosine ONLY inside each cluster;
    any vector within ``SEMDEDUP_TAU`` of a lower-id cluster sibling is
    a semantic duplicate. Returns per-cluster stats (members, duplicate
    pairs / vectors, max in-cluster similarity).

    The clusters come from `similarity.kmeans_fit` — the paper's
    actual recipe (r5 used the first K vectors by id as fixed
    centroids; VERDICT r05 #4 flagged that recall depends on cluster
    quality, and the trained fit is the same broadcast assign kernel).
    The oracle shares the unrolled-Lloyd's CTEs with
    `embedding_kmeans`, so the assignment trajectory is bit-identical
    on both engines (KMEANS_ROUND contract).

    Scale design: the centroid table is K rows — broadcast, so each
    assignment round is a map-side cross join + one partial-agg argmin
    (linear, no shuffle of the vectors beyond one groupBy). The
    pairwise kernel is O(sum cluster_size^2) — bounded by choosing
    K ~ N/1000 at scale (and further splittable by LSH-bucketing
    WITHIN a cluster, exactly like dedup_embedding_lsh_verified);
    one celebrity cluster is an AQE-skew-split shuffle, not a plan
    change. Reference has no semantic dedup at all (embedding ops are
    out of scope for a SPARQL store) — this is a beyond-parity
    training-pipeline operator.
    """
    from .similarity import _as_double, dot, kmeans_fit, norm

    e = table(spark, sf_dir, "embeddings").select(
        "vec_id", _as_double("embedding").alias("v")
    )
    # trained assignment (vec_id, v, cid, cv); precompute the norm so
    # the pair rows below reuse it
    best = kmeans_fit(e).select("vec_id", "v", "cid").withColumn(
        "nv", norm(F.col("v"))
    )

    a = best.select("cid", F.col("vec_id").alias("va"), F.col("v").alias("xa"), F.col("nv").alias("na"))
    b = best.select("cid", F.col("vec_id").alias("vb"), F.col("v").alias("xb"), F.col("nv").alias("nb"))
    pairs = (
        a.join(b, "cid")
        .filter(F.col("va") < F.col("vb"))
        .select(
            "cid",
            "va",
            "vb",
            F.round(dot(F.col("xa"), F.col("xb")) / (F.col("na") * F.col("nb")), 6).alias("cs"),
        )
    )
    dup_pairs = pairs.filter(F.col("cs") >= SEMDEDUP_TAU)
    per_cluster_pairs = dup_pairs.groupBy("cid").agg(
        F.count(F.lit(1)).alias("n_dup_pairs"), F.max("cs").alias("max_pair_sim")
    )
    per_cluster_vecs = (
        dup_pairs.select("cid", F.col("vb").alias("vec_id"))
        .distinct()
        .groupBy("cid")
        .agg(F.count(F.lit(1)).alias("n_dup_vectors"))
    )
    members = best.groupBy("cid").agg(F.count(F.lit(1)).alias("n_members"))
    return (
        members.join(per_cluster_pairs, "cid", "left")
        .join(per_cluster_vecs, "cid", "left")
        .select(
            F.col("cid").alias("cluster_id"),
            "n_members",
            F.coalesce("n_dup_pairs", F.lit(0)).alias("n_dup_pairs"),
            F.coalesce("n_dup_vectors", F.lit(0)).alias("n_dup_vectors"),
            F.coalesce("max_pair_sim", F.lit(0.0)).alias("max_pair_sim"),
        )
    )


# ---------------------------------------------------------------------------
# Incremental dedup: a new crawl batch against the existing corpus
# ---------------------------------------------------------------------------

#: fraction of the doc_id range treated as "already-ingested corpus";
#: the rest is the arriving increment. Deterministic split so the
#: DuckDB oracle can reproduce it.
INCREMENT_FRACTION = 0.8


@register(
    "dedup_incremental",
    f"""
    WITH {_CAND_CTE},
    thr AS (SELECT CAST(floor(max(doc_id) * {INCREMENT_FRACTION}) AS BIGINT) AS t
            FROM documents),
    new_docs AS (SELECT d.doc_id FROM documents d, thr WHERE d.doc_id >= thr.t)
    SELECT nd.doc_id,
           count(c.doc_a)                                        AS n_cand,
           coalesce(max(CASE WHEN c.doc_a < t.t THEN 1 ELSE 0 END), 0) = 1
                                                                 AS matched_corpus,
           count(c.doc_a) = 0                                    AS keep
    FROM new_docs nd
    CROSS JOIN thr t
    LEFT JOIN cand c ON c.doc_b = nd.doc_id
    GROUP BY nd.doc_id, t.t
    """,
)
def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental near-dup admission — the daily-crawl shape: docs
    with ids in the top (1 - INCREMENT_FRACTION) of the id range are
    the arriving batch; every other doc is the already-deduped corpus.
    A new doc is kept iff no LSH candidate pair points at it from a
    lower id (corpus doc OR earlier doc in the same batch — the same
    min-id-wins rule as `dedup_clusters`); `matched_corpus`
    distinguishes "duplicate of the existing corpus" from
    "duplicate within the batch".

    Scale: in production the corpus side's band keys are a STORED
    index (written once, appended per batch — the streaming twin
    `stream_neardup_candidates` demonstrates exactly that reuse);
    only the increment is shingled and hashed per run, so per-batch
    cost is O(batch) + one bucket join against the index, never a
    recompute of the corpus. Here both sides derive from the same
    table because the testdata is static."""
    d = table(spark, sf_dir, "documents")
    thr = d.agg(
        F.floor(F.max("doc_id") * INCREMENT_FRACTION).cast("long").alias("t")
    )
    cand = minhash_candidates(_shingled(spark, sf_dir))
    new_docs = d.select("doc_id").crossJoin(F.broadcast(thr)).filter(
        F.col("doc_id") >= F.col("t")
    )
    j = new_docs.join(cand, new_docs.doc_id == cand.doc_b, "left")
    return j.groupBy("doc_id", "t").agg(
        F.count("doc_a").alias("n_cand"),
        (
            F.coalesce(F.max(F.when(F.col("doc_a") < F.col("t"), 1).otherwise(0)), F.lit(0))
            == 1
        ).alias("matched_corpus"),
        (F.count("doc_a") == 0).alias("keep"),
    ).drop("t")


# ---------------------------------------------------------------------------
# Exact-substring dedup: shared fixed-length token windows
# ---------------------------------------------------------------------------

#: token-window length for exact-substring matching. 50 in Lee et al.
#: 2021 ("Deduplicating Training Data Makes Language Models Better",
#: suffix-array exact-substring dedup); the synthetic docs are 27-72
#: tokens, so 15 keeps the test non-degenerate (~24 pairs at sf0.01).
SUBSTR_W = 15
#: windows appearing in more than this many docs are boilerplate
#: ("stop windows" — license headers, navigation chrome) and are
#: dropped BEFORE pair enumeration; this caps the per-window pair
#: blowup at C(SUBSTR_DF_CAP, 2), exactly like an LSH band cap.
SUBSTR_DF_CAP = 20


@register(
    "dedup_exact_substring",
    f"""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents
                  WHERE len(string_split(text, ' ')) >= {SUBSTR_W}),
    pos AS (SELECT doc_id, t, generate_subscripts(t, 1) AS i FROM toks),
    w AS (SELECT DISTINCT doc_id, md5(array_to_string(t[i:i+{SUBSTR_W}-1], ' ')) AS h
          FROM pos WHERE i <= len(t) - {SUBSTR_W} + 1),
    nw AS (SELECT doc_id, count(*) AS n_windows FROM w GROUP BY doc_id),
    keepw AS (SELECT h FROM w GROUP BY h
              HAVING count(*) BETWEEN 2 AND {SUBSTR_DF_CAP}),
    pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared
              FROM w a JOIN keepw USING (h) JOIN w b USING (h)
              WHERE a.doc_id < b.doc_id
              GROUP BY a.doc_id, b.doc_id)
    SELECT p.doc_a, p.doc_b, p.n_shared,
           round(p.n_shared / least(na.n_windows, nb.n_windows)::DOUBLE, 6)
               AS containment
    FROM pairs p
    JOIN nw na ON na.doc_id = p.doc_a
    JOIN nw nb ON nb.doc_id = p.doc_b
    """,
)
def dedup_exact_substring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring dedup (the signal behind Lee et al. 2021's
    suffix-array dedup, re-expressed for a distributed engine): two
    docs are duplicates-in-part iff they share a verbatim SUBSTR_W-token
    window. Every doc's sliding windows are hashed; windows shared by
    2..SUBSTR_DF_CAP docs key a bucket self-join (windows above the cap
    are boilerplate and dropped — the blowup bound); output is the pair
    list with the shared-window count and a containment score
    n_shared / min(windows). This catches verbatim partial overlap
    that whole-doc hashing (`dedup_exact`) misses and shingle-Jaccard
    (`dedup_minhash_lsh`) underweights.

    Scale shape: project split(text) ONCE (the text_lm_crossentropy
    lesson), one explode of ~len(doc) window hashes (fixed-width
    md5 rows — payloads never shuffle), one partial-agg groupBy for
    doc-frequency, and a bucket join whose per-bucket cost is capped by
    SUBSTR_DF_CAP. A suffix array would find variable-length matches
    but needs a global sort of the token stream; fixed-W windows are
    the standard distributed approximation (any >= W-token verbatim
    overlap is guaranteed to share a window)."""
    d = table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    docs = d.select("doc_id", toks.alias("t")).filter(F.size("t") >= SUBSTR_W)
    win = F.array_distinct(
        F.expr(
            f"transform(sequence(1, size(t) - {SUBSTR_W} + 1),"
            f" i -> md5(array_join(slice(t, i, {SUBSTR_W}), ' ')))"
        )
    )
    w = docs.select("doc_id", F.explode(win).alias("h"))
    nw = w.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_windows"))
    keepw = (
        w.groupBy("h")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter((F.col("df") >= 2) & (F.col("df") <= SUBSTR_DF_CAP))
        .select("h")
    )
    bounded = w.join(keepw, "h")
    a = bounded.select("h", F.col("doc_id").alias("doc_a"))
    b = bounded.select("h", F.col("doc_id").alias("doc_b"))
    pairs = (
        a.join(b, "h")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    na = nw.select(F.col("doc_id").alias("doc_a"), F.col("n_windows").alias("nwa"))
    nb = nw.select(F.col("doc_id").alias("doc_b"), F.col("n_windows").alias("nwb"))
    return (
        pairs.join(na, "doc_a")
        .join(nb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "n_shared",
            F.round(
                F.col("n_shared") / F.least("nwa", "nwb").cast("double"), 6
            ).alias("containment"),
        )
    )


SIMHASH_HAMMING_K = 3


@register(
    "dedup_simhash_bands",
    f"""
    WITH {_SIMHASH_CTE},
    bands AS (SELECT doc_id, simhash, b.b AS band,
                     (simhash >> (8 * b.b)) & 255 AS band_val
              FROM sig, generate_series(0, 3) b(b)),
    cand AS (SELECT DISTINCT a.doc_id AS doc_a, a.simhash AS sh_a,
                    b.doc_id AS doc_b, b.simhash AS sh_b
             FROM bands a JOIN bands b
               ON a.band = b.band AND a.band_val = b.band_val
              AND a.doc_id < b.doc_id)
    SELECT doc_a, doc_b,
           bit_count(xor(sh_a, sh_b)) AS hamming
    FROM cand
    WHERE bit_count(xor(sh_a, sh_b)) <= {SIMHASH_HAMMING_K}
    ORDER BY doc_a, doc_b
    """,
)
def dedup_simhash_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup PAIRING: all pairs within Hamming distance 3 of
    each other's 32-bit signature, found by the pigeonhole band trick —
    split the signature into 4 disjoint 8-bit bands; any pair with
    hamming <= 3 differs in at most 3 bands, so it MUST agree exactly
    on at least one, making band equality a lossless (no false
    negative) blocking key. This closes the simhash pipeline: the
    signature op (simhash_signature) is the map side, this is the
    pairing side — MinHash-LSH's probabilistic banding with a
    DETERMINISTIC recall guarantee instead.

    Scale shape: 4 band keys per doc, equi-join on (band, band_val) —
    candidates bounded by band-bucket sizes exactly like the MinHash
    band join (and the exact hamming check is a single bit_count on
    the joined row, not a payload comparison). Never an all-pairs
    product; the signature computation is the shared
    bit-contribution aggregation kernel of simhash_signature
    (reference has no simhash path; SURVEY §extensions)."""
    sig = simhash_signature(spark, sf_dir)
    bands = sig.select(
        "doc_id",
        "simhash",
        F.explode(F.sequence(F.lit(0), F.lit(3))).alias("band"),
    ).withColumn("band_val", F.expr("shiftright(simhash, 8 * band) & 255"))
    a = bands.select(
        F.col("doc_id").alias("doc_a"),
        F.col("simhash").alias("sh_a"),
        "band",
        "band_val",
    )
    b = bands.select(
        F.col("doc_id").alias("doc_b"),
        F.col("simhash").alias("sh_b"),
        "band",
        "band_val",
    )
    ham = F.expr("bit_count(sh_a ^ sh_b)")
    return (
        a.join(b, ["band", "band_val"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "sh_a", "sh_b")
        .distinct()
        .withColumn("hamming", ham)
        .filter(F.col("hamming") <= SIMHASH_HAMMING_K)
        .select("doc_a", "doc_b", "hamming")
        .orderBy("doc_a", "doc_b")
    )


SNM_BLOCK_CHARS = 16   # blocking key: first chars of the normalized text
SNM_WINDOW = 3         # neighbors ahead compared per row
SNM_PREFIX = 64        # edit-distance verification prefix
SNM_MAX_DIST = 10      # admit pairs at most this many edits apart


@register(
    "dedup_sorted_neighborhood",
    f"""
    WITH keyed AS (
        SELECT doc_id,
               lower(substr(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g'),
                            1, {SNM_BLOCK_CHARS})) AS bk,
               substr(text, 1, {SNM_PREFIX}) AS pfx
        FROM documents),
    nbr AS (
        SELECT doc_id, bk, pfx,
               lead(doc_id, j.j) OVER w AS doc_b,
               lead(pfx, j.j) OVER w AS pfx_b
        FROM keyed CROSS JOIN generate_series(1, {SNM_WINDOW}) j(j)
        WINDOW w AS (PARTITION BY bk, j.j ORDER BY doc_id))
    SELECT doc_id AS doc_a, doc_b,
           levenshtein(pfx, pfx_b) AS prefix_dist
    FROM nbr
    WHERE doc_b IS NOT NULL AND levenshtein(pfx, pfx_b) <= {SNM_MAX_DIST}
    """,
)
def sorted_neighborhood_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-neighborhood dedup (Hernandez/Stolfo): sort records by a
    normalized blocking key, compare each record only against its next
    W neighbors in that order, and verify candidates with an exact
    edit distance over a fixed prefix. The sliding neighborhood makes
    the candidate count W * N regardless of block skew — the classic
    complement to equality blocking (dedup_exact) and LSH banding
    (dedup_minhash_lsh) when near-duplicates share a prefix but not
    whole-shingle signatures.

    Implemented as blocked SNM: the window sorts WITHIN each blocking
    key (lead(doc_id, j) per j = 1..W), so the shuffle partitions by
    bk and no global single-partition sort exists — the 100 TB shape
    is one repartition by key prefix + per-partition sorted windows.
    (Classic SNM's single global sort becomes repartitionByRange with
    a W-row partition-boundary overlap; the per-block form here keeps
    the same guarantee for any two records agreeing on the block key.)
    The Levenshtein verify runs on 64-char prefixes only — bounded
    cost per pair, identical on both engines (unit-cost edits)."""
    d = table(spark, sf_dir, "documents")
    keyed = d.select(
        "doc_id",
        F.lower(
            F.substring(F.regexp_replace(F.col("text"), "[^a-zA-Z0-9 ]", ""), 1, SNM_BLOCK_CHARS)
        ).alias("bk"),
        F.substring(F.col("text"), 1, SNM_PREFIX).alias("pfx"),
    )
    from pyspark.sql import Window

    out = None
    for j in range(1, SNM_WINDOW + 1):
        w = Window.partitionBy("bk").orderBy("doc_id")
        nbr = keyed.select(
            F.col("doc_id").alias("doc_a"),
            F.lead("doc_id", j).over(w).alias("doc_b"),
            F.levenshtein(F.col("pfx"), F.lead("pfx", j).over(w)).alias("prefix_dist"),
        )
        out = nbr if out is None else out.unionAll(nbr)
    return out.filter(
        F.col("doc_b").isNotNull() & (F.col("prefix_dist") <= SNM_MAX_DIST)
    )

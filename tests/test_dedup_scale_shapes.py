"""The gated dedup entries must be the 100 TB compositions (LSH
candidate bounding -> exact verify), never all-pairs joins:

1. plan shape — no BroadcastNestedLoopJoin / CartesianProduct in the
   gated plans (the candidate join must be an equi-join);
2. subset soundness — every pair the gated composition reports must
   appear in the exact all-pairs twin with the identical score (LSH may
   MISS pairs, it must never invent or mis-score one).
"""

from __future__ import annotations

from graphdb_wikidata_spark.operators.dedup import (
    QUERIES,
    embedding_cosine_allpairs,
    ngram_jaccard_allpairs,
)

from tests.conftest import SF_SMOKE


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_gated_jaccard_plan_has_no_allpairs_join(spark):
    plan = _plan(QUERIES["dedup_ngram_jaccard"](spark, SF_SMOKE))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_gated_embedding_plan_has_no_allpairs_join(spark):
    plan = _plan(QUERIES["dedup_embedding_lsh_verified"](spark, SF_SMOKE))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_gated_jaccard_subset_of_exact(spark):
    gated = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in QUERIES["dedup_ngram_jaccard"](spark, SF_SMOKE).collect()
    }
    exact = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in ngram_jaccard_allpairs(spark, SF_SMOKE).collect()
    }
    assert gated, "composition found no pairs at sf0.001 — not exercising the path"
    for pair, j in gated.items():
        assert exact.get(pair) == j, f"{pair}: gated={j} exact={exact.get(pair)}"


def test_gated_embedding_subset_of_exact(spark):
    gated = {
        (r.vec_a, r.vec_b): r.sim
        for r in QUERIES["dedup_embedding_lsh_verified"](spark, SF_SMOKE).collect()
    }
    exact = {
        (r.vec_a, r.vec_b): r.sim
        for r in embedding_cosine_allpairs(spark, SF_SMOKE).collect()
    }
    assert gated, "composition found no pairs at sf0.001 — not exercising the path"
    for pair, s in gated.items():
        assert exact.get(pair) == s, f"{pair}: gated={s} exact={exact.get(pair)}"


def test_knn_join_plan_and_subset_of_exact(spark):
    """embedding_knn_join must (1) bound candidates by the bucket
    equi-join — no all-pairs operator in the plan — and (2) return only
    TRUE neighbour edges: every (query, neighbour, sim) it reports must
    appear in the exact all-pairs similarity set with the identical
    rounded sim (LSH may lower recall, never invent or mis-score an
    edge)."""
    from pyspark.sql import functions as F

    from graphdb_wikidata_spark.operators.similarity import QUERIES as SIM_Q
    from graphdb_wikidata_spark.operators.similarity import _as_double, dot, norm
    from graphdb_wikidata_spark.tables import table

    got_df = SIM_Q["embedding_knn_join"](spark, SF_SMOKE)
    plan = _plan(got_df)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan

    got = {(r.vec_id, r.neighbor_id): r.sim for r in got_df.collect()}
    assert got, "bucketed kNN join must return neighbours at sf0.001"

    e = table(spark, SF_SMOKE, "embeddings")
    a = e.select(F.col("vec_id").alias("va"), _as_double("embedding").alias("ea"))
    b = e.select(F.col("vec_id").alias("vb"), _as_double("embedding").alias("eb"))
    sim = F.round(dot(F.col("ea"), F.col("eb")) / (norm(F.col("ea")) * norm(F.col("eb"))), 6)
    exact = {
        (r.va, r.vb): r.s
        for r in a.join(b, F.col("va") != F.col("vb")).select("va", "vb", sim.alias("s")).collect()
    }
    for pair, s in got.items():
        assert exact[pair] == s  # never invents or mis-scores an edge


def test_containment_subset_and_asymmetry(spark):
    """Containment pairs are LSH candidates; score >= the symmetric
    Jaccard for the same pair (containment divides by the smaller
    set)."""
    from graphdb_wikidata_spark.operators.dedup import (
        QUERIES,
        _shingled,
        minhash_candidates,
    )

    rows = QUERIES["dedup_containment"](spark, SF_SMOKE)
    got = {(r.doc_a, r.doc_b): r.containment for r in rows.collect()}
    assert got, "sf0.001 is known to contain near-duplicates"
    cand = {(r.doc_a, r.doc_b) for r in minhash_candidates(_shingled(spark, SF_SMOKE)).collect()}
    assert set(got) <= cand
    jac = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in QUERIES["dedup_ngram_jaccard"](spark, SF_SMOKE).collect()
    }
    for pair, c in got.items():
        if pair in jac:
            assert c >= jac[pair] - 1e-9

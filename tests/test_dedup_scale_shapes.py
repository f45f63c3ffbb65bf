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

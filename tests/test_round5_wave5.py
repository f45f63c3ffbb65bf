"""Round-5 wave-5 additions: streaming CUSUM, in-corpus bigram-LM
cross-entropy scoring, candidate-graph degree histogram."""

from __future__ import annotations

from pyspark.sql import functions as F

from graphdb_wikidata_spark.operators import events, graph, text

from tests.conftest import SF_SMOKE


def test_stream_cusum_equals_batch(spark):
    """Finite replay of the single-float stateful stream == the batch
    recurrence, row for row."""
    from graphdb_wikidata_spark.streaming import entry as streaming_entry

    got = sorted(
        map(tuple, streaming_entry.QUERIES["stream_cusum_alerts"](spark, SF_SMOKE).collect())
    )
    want = sorted(
        map(tuple, events.QUERIES["events_cusum_alerts"](spark, SF_SMOKE).collect())
    )
    assert got == want


def test_lm_crossentropy_prefers_seen_text(spark):
    # train corpus: every doc is the same two-word loop, so the bigram
    # model is certain about it; one held-out doc repeats the seen
    # pattern, the other is entirely novel words -> higher cross-entropy.
    # Hash buckets: pick doc_ids whose md5 bucket is/isn't 0 at runtime.
    import hashlib

    def bucket(doc_id: int) -> int:
        return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:4], 16) % 10

    test_ids = [i for i in range(1000) if bucket(i) == 0][:2]
    train_ids = [i for i in range(1000) if bucket(i) != 0][:30]
    seen, novel = test_ids
    rows = [(i, "alpha beta " * 20, "en", "s", 10) for i in train_ids]
    rows.append((seen, "alpha beta " * 20, "en", "seen_src", 10))
    rows.append((novel, "gamma delta " * 20, "en", "novel_src", 10))
    d = spark.createDataFrame(rows, ["doc_id", "text", "lang", "source", "n_chars"])
    orig = text.table
    try:
        text.table = lambda s, dd, n: d  # noqa: ARG005
        out = {r.source: r for r in text.QUERIES["text_lm_crossentropy"](spark, SF_SMOKE).collect()}
    finally:
        text.table = orig
    assert set(out) == {"seen_src", "novel_src"}
    assert out["seen_src"].avg_cross_entropy < out["novel_src"].avg_cross_entropy
    assert out["seen_src"].n_docs == 1 and out["novel_src"].n_docs == 1


def test_lm_crossentropy_nonnegative(spark):
    rows = text.QUERIES["text_lm_crossentropy"](spark, SF_SMOKE).collect()
    assert rows
    assert all(r.avg_cross_entropy >= 0 for r in rows)


def test_degree_histogram_consistent_with_candidates(spark):
    from graphdb_wikidata_spark.operators.dedup import _shingled, minhash_candidates

    hist = graph.QUERIES["graph_degree_histogram"](spark, SF_SMOKE).collect()
    n_edges = minhash_candidates(_shingled(spark, SF_SMOKE)).count()
    # handshake lemma: sum(degree * count) == 2 * |edges|
    assert sum(r.degree * r.n_docs for r in hist) == 2 * n_edges
    assert all(r.degree >= 1 and r.n_docs >= 1 for r in hist)


def test_degree_histogram_triangle_consistency(spark):
    # a node in any triangle has degree >= 2: nodes with triangles must
    # fit inside the degree>=2 population
    hist = graph.QUERIES["graph_degree_histogram"](spark, SF_SMOKE).collect()
    tri = graph.QUERIES["graph_triangle_count"](spark, SF_SMOKE).collect()
    n_deg2 = sum(r.n_docs for r in hist if r.degree >= 2)
    assert len(tri) <= n_deg2


def test_cusum_plan_is_mapinpandas_not_grouped(spark):
    """Perf regression guard (SCALING.md 30x lesson): the CUSUM kernel
    must be ONE mapInPandas pass over a sorted repartition, not a
    per-group FlatMapGroupsInPandas — 45k small groups paid ~2.7ms of
    per-group overhead each (149s vs 6.3s at 30x)."""
    plan = (
        events.QUERIES["events_cusum_alerts"](spark, SF_SMOKE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "FlatMapGroupsInPandas" not in plan
    assert "MapInPandas" in plan
    assert "Sort" in plan  # sortWithinPartitions feeding the kernel


def test_lm_plan_projects_tokens_before_explode(spark):
    """Perf regression guard (SCALING.md 30x lesson): every gram
    explode must transform a PROJECTED token-array column — inlining
    split(text) into the element_at lambdas re-evaluated the split per
    element in codegen (78.8s -> 5.7s at 30x once projected). Spark
    plans the bigram subtree once per consumer (uni/v/bi/test = up to
    4 linear copies — fine); what must never come back is the inlined
    split."""
    plan = (
        text.QUERIES["text_lm_crossentropy"](spark, SF_SMOKE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "size(toks#" in plan
    # the once-per-ROW filter predicate size(split(text)) >= 2 is fine;
    # the killer is a split inside the per-ELEMENT lambda access
    assert "element_at(split(text" not in plan
    assert plan.count("Generate explode") <= 4

"""Plan-shape guards for the round-8 registrations: the scale posture
claimed in each docstring (and SCALING.md) must be visible in the
physical plan, not just asserted in prose."""

from __future__ import annotations

from graphdb_wikidata_spark.operators.dedup import QUERIES as DEDUP_QUERIES
from graphdb_wikidata_spark.operators.events import QUERIES as EVENT_QUERIES
from graphdb_wikidata_spark.operators.relational import QUERIES as REL_QUERIES
from graphdb_wikidata_spark.operators.text import QUERIES as TEXT_QUERIES

from tests.conftest import SF_SMOKE


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_hll_shuffle_is_register_sized(spark):
    """map-only hash/route, then ONE 256-cell partial agg: both
    HashAggregate halves present, a single exchange, no join."""
    df = EVENT_QUERIES["events_hll_registers"](spark, SF_SMOKE)
    plan = _plan(df)
    assert plan.count("Exchange") == 1
    assert plan.count("HashAggregate") >= 2  # partial + final
    assert "Join" not in plan


def test_bloom_probe_side_never_shuffles_fact_rows(spark):
    """the filter is a one-row collect_set broadcast; the probe side
    is map-only into a single-row partial agg. No sort-merge join and
    no exchange may carry fact rows — the only exchanges allowed are
    the build side's distinct-positions agg and single-row plumbing."""
    df = REL_QUERIES["bloom_semi_filter_probe"](spark, SF_SMOKE)
    plan = _plan(df)
    assert "SortMergeJoin" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    # the lineitem scans must not feed a hash-partitioned exchange:
    # every Exchange is either the build side's 'p' agg or SinglePartition
    for frag in plan.split("Exchange")[1:]:
        head = frag[:60]
        assert "hashpartitioning(l_" not in head, f"fact-row shuffle: {head}"


def test_winnowing_has_no_self_join(spark):
    """the rightmost-tie argmin is one packed-key windowed MIN inside
    the per-doc partition — a Window over ONE shuffle by doc, never a
    positions self-join."""
    df = TEXT_QUERIES["text_winnowing_fingerprints"](spark, SF_SMOKE)
    plan = _plan(df)
    assert "Join" not in plan
    assert "Window" in plan


def test_snm_sorts_within_blocks_not_globally(spark):
    """blocked SNM: windows partition by the blocking key, so no
    single-partition global sort exists in the plan."""
    df = DEDUP_QUERIES["dedup_sorted_neighborhood"](spark, SF_SMOKE)
    plan = _plan(df)
    assert "Window" in plan
    assert "SinglePartition" not in plan


def test_bloom_never_false_negative(spark):
    """Bloom admits every true match by construction: n_passed >=
    n_true_match and n_false_pos >= 0 on real data."""
    row = REL_QUERIES["bloom_semi_filter_probe"](spark, SF_SMOKE).collect()[0]
    assert row.n_passed >= row.n_true_match
    assert row.n_false_pos >= 0
    assert row.n_probed > 0


def test_winnowing_density_and_coverage(spark):
    """winnowing selects at most one fingerprint per window start and
    at least one per full window span: 1 <= n_fp <= n_windows."""
    from pyspark.sql import functions as F
    from graphdb_wikidata_spark.tables import table
    from graphdb_wikidata_spark.operators.text import WINNOW_K, WINNOW_W

    fp = TEXT_QUERIES["text_winnowing_fingerprints"](spark, SF_SMOKE)
    d = table(spark, SF_SMOKE, "documents").select(
        "doc_id", F.size(F.split(F.col("text"), " ")).alias("n_toks")
    )
    joined = fp.join(d, "doc_id").select(
        "doc_id",
        "n_fp",
        (F.col("n_toks") - (WINNOW_K - 1) - (WINNOW_W - 1)).alias("n_windows"),
    )
    bad = joined.filter(
        (F.col("n_fp") < 1) | (F.col("n_fp") > F.col("n_windows"))
    ).count()
    assert bad == 0

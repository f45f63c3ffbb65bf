"""Wave-11 ops: Count-Min sketch heavy hitters, Matryoshka truncation
recall. Oracle equality is covered by test_entry_queries.py; these pin
the sketch's one-sided error and the truncation-eval bounds."""

from __future__ import annotations

from pyspark.sql import functions as F

from graphdb_wikidata_spark.operators.events import (
    CM_TOPK,
    QUERIES as EVENT_QUERIES,
)
from graphdb_wikidata_spark.operators.similarity import (
    QUERIES as SIM_QUERIES,
    RECALL_K,
)

from tests.conftest import SF_SMOKE


def test_count_min_never_underestimates(spark):
    rows = EVENT_QUERIES["events_count_min_heavy_hitters"](spark, SF_SMOKE).collect()
    assert len(rows) == CM_TOPK
    for r in rows:
        # the defining CM property: estimate >= truth, always
        assert r.cm_estimate >= r.true_count
    assert all(
        rows[i].true_count >= rows[i + 1].true_count for i in range(len(rows) - 1)
    )


def test_count_min_sketch_is_bounded(spark):
    # the sketch relation itself must stay depth x width cells no
    # matter the data size — the whole point of the summary
    from graphdb_wikidata_spark.operators.events import CM_DEPTH, CM_WIDTH
    from graphdb_wikidata_spark.tables import table

    ev = table(spark, SF_SMOKE, "events")
    j = F.explode(F.sequence(F.lit(0), F.lit(CM_DEPTH - 1))).alias("j")
    hashed = ev.select("user_id", j).withColumn(
        "bucket",
        F.conv(
            F.substring(F.md5(F.concat_ws("_", F.col("j"), F.col("user_id"))), 1, 8),
            16,
            10,
        ).cast("long")
        % CM_WIDTH,
    )
    n_cells = hashed.groupBy("j", "bucket").count().count()
    assert n_cells <= CM_DEPTH * CM_WIDTH


def test_mrl_recall_bounds_and_signal(spark):
    rows = SIM_QUERIES["embedding_mrl_truncation_recall"](spark, SF_SMOKE).collect()
    assert len(rows) == 5
    for r in rows:
        assert 0 <= r.n_overlap <= RECALL_K
        assert abs(r.recall_at_k - r.n_overlap / RECALL_K) < 1e-9
    # half the dimensions should retain SOME of the true top-10
    assert sum(r.n_overlap for r in rows) > 0

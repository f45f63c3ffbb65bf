"""Round-5 wave-2 additions: market-basket mining, bounded EWMA,
median/MAD anomalies, OLS trend, content-addressed splits, inverted
index, trained language ID."""

from __future__ import annotations

from datetime import datetime, timedelta

from pyspark.sql import functions as F

from graphdb_wikidata_spark.operators import corpus, events, relational, text

from tests.conftest import SF_SMOKE


# ---------------------------------------------------------------------------
# market_basket_pairs
# ---------------------------------------------------------------------------


def test_market_basket_invariants(spark):
    rows = relational.QUERIES["market_basket_pairs"](spark, SF_SMOKE).collect()
    assert rows, "sf0.001 still has co-ordered pairs"
    for r in rows:
        assert r.p1 < r.p2, "pairs are canonical (p1 < p2), never mirrored"
        assert r.pair_count >= 2
        assert 0 < r.confidence <= 1
        assert r.support > 0
        assert r.lift > 0


def test_market_basket_fixture(spark):
    # 4 baskets: parts (1,2) co-occur 3x, (1,3) 2x, (2,3) 1x -> pruned
    basket = [
        (10, 1), (10, 2), (10, 3),
        (11, 1), (11, 2),
        (12, 1), (12, 2),
        (13, 1), (13, 3),
    ]
    li = spark.createDataFrame(basket, ["l_orderkey", "l_partkey"])
    import graphdb_wikidata_spark.tables as tables

    orig = tables.table
    try:
        tables.table = lambda s, d, n: li  # noqa: ARG005
        # relational.py imported `table` by name; patch there too
        orig_rel = relational.table
        relational.table = tables.table
        out = {
            (r.p1, r.p2): r
            for r in relational.QUERIES["market_basket_pairs"](spark, SF_SMOKE).collect()
        }
    finally:
        tables.table = orig
        relational.table = orig_rel
    assert set(out) == {(1, 2), (1, 3)}
    r12 = out[(1, 2)]
    assert r12.pair_count == 3
    # P(2|1): part 1 is in all 4 baskets, pair in 3
    assert r12.confidence == 0.75
    # lift = support / (s1*s2) = (3/4) / ((4/4)*(3/4)) = 1.0
    assert r12.lift == 1.0
    r13 = out[(1, 3)]
    assert r13.pair_count == 2 and r13.confidence == 0.5


def test_market_basket_broadcasts_metric_joins(spark):
    plan = relational.QUERIES["market_basket_pairs"](
        spark, SF_SMOKE
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    # the only nested-loop is the 1-row order-count crossJoin
    assert plan.count("CartesianProduct") == 0


# ---------------------------------------------------------------------------
# events_ewma_bounded
# ---------------------------------------------------------------------------


def _mk_events(spark, vals, user=1):
    t0 = datetime(2024, 1, 1)
    rows = [
        (i, t0 + timedelta(minutes=i), user, "x", float(v), "{}")
        for i, v in enumerate(vals)
    ]
    return spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )


def test_ewma_matches_reference_recurrence(spark):
    vals = [1.0, 2.0, 4.0, 8.0, 3.0, 5.0, 7.0, 2.0, 9.0, 6.0]
    e = _mk_events(spark, vals)
    orig = events.table
    try:
        events.table = lambda s, d, n: e  # noqa: ARG005
        got = {
            r.event_id: r.ewma
            for r in events.QUERIES["events_ewma_bounded"](spark, SF_SMOKE).collect()
        }
    finally:
        events.table = orig
    for t in range(len(vals)):
        taps = [(events.EWMA_DECAY**k, vals[t - k]) for k in range(events.EWMA_TAPS) if t - k >= 0]
        want = round(sum(w * v for w, v in taps) / sum(w for w, _ in taps), 6)
        assert abs(got[t] - want) < 1e-9, (t, got[t], want)


def test_ewma_bounded_by_window_extremes(spark):
    rows = events.QUERIES["events_ewma_bounded"](spark, SF_SMOKE).collect()
    from graphdb_wikidata_spark.tables import table

    vals = {r.event_id: r.value for r in table(spark, SF_SMOKE, "events").collect()}
    # a normalized convex combination can never leave [min, max] of its taps
    lo, hi = min(vals.values()), max(vals.values())
    assert all(lo - 1e-6 <= r.ewma <= hi + 1e-6 for r in rows)


# ---------------------------------------------------------------------------
# events_anomaly_mad
# ---------------------------------------------------------------------------


def test_mad_flags_planted_outlier(spark):
    e = _mk_events(spark, [10.0] * 20 + [1000.0])
    orig = events.table
    try:
        events.table = lambda s, d, n: e  # noqa: ARG005
        [r] = events.QUERIES["events_anomaly_mad"](spark, SF_SMOKE).collect()
    finally:
        events.table = orig
    assert r.med == 10.0
    assert r.mad == 0.0
    # MAD 0 -> threshold 0 -> only the planted 1000 deviates
    assert r.n_outliers == 1
    assert r.n_total == 21


def test_mad_totals_cover_table(spark):
    from graphdb_wikidata_spark.tables import table

    rows = events.QUERIES["events_anomaly_mad"](spark, SF_SMOKE).collect()
    n = table(spark, SF_SMOKE, "events").count()
    assert sum(r.n_total for r in rows) == n
    assert all(r.mad >= 0 and r.n_outliers <= r.n_total for r in rows)


# ---------------------------------------------------------------------------
# events_linreg_trend
# ---------------------------------------------------------------------------


def test_linreg_recovers_planted_line(spark):
    # y = 2 * hours + 1, exactly on the line -> slope 2, intercept 1, r2 1
    t0 = datetime(2024, 1, 1)
    rows = [
        (i, t0 + timedelta(hours=i), 1, "x", 2.0 * i + 1.0, "{}")
        for i in range(50)
    ]
    e = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    orig = events.table
    try:
        events.table = lambda s, d, n: e  # noqa: ARG005
        [r] = events.QUERIES["events_linreg_trend"](spark, SF_SMOKE).collect()
    finally:
        events.table = orig
    assert abs(r.slope - 2.0) < 1e-6
    assert abs(r.intercept - 1.0) < 1e-3
    assert abs(r.r2 - 1.0) < 1e-6
    assert r.n == 50


def test_linreg_r2_in_unit_interval(spark):
    rows = events.QUERIES["events_linreg_trend"](spark, SF_SMOKE).collect()
    assert rows
    assert all(0.0 <= r.r2 <= 1.0 + 1e-9 for r in rows)


# ---------------------------------------------------------------------------
# corpus_split_hash
# ---------------------------------------------------------------------------


def test_split_hash_partitions_corpus(spark):
    rows = corpus.QUERIES["corpus_split_hash"](spark, SF_SMOKE).collect()
    total = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").count()
    assert sum(r.n_docs for r in rows) == total
    by_split = {}
    for r in rows:
        by_split[r.split] = by_split.get(r.split, 0) + r.n_docs
    assert set(by_split) <= {"train", "val", "test"}
    # ~80/10/10 with slack for a 50-doc smoke corpus
    assert by_split["train"] > by_split.get("val", 0)
    assert by_split["train"] > by_split.get("test", 0)


def test_split_hash_stable_across_partitionings(spark):
    # content-addressed: the same doc lands in the same split no matter
    # how the table is partitioned
    a = corpus.QUERIES["corpus_split_hash"](spark, SF_SMOKE).collect()
    d = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").repartition(13)
    orig = corpus.table
    try:
        corpus.table = lambda s, dd, n: d  # noqa: ARG005
        b = corpus.QUERIES["corpus_split_hash"](spark, SF_SMOKE).collect()
    finally:
        corpus.table = orig
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


# ---------------------------------------------------------------------------
# text_inverted_index
# ---------------------------------------------------------------------------


def test_inverted_index_postings_sorted_and_capped(spark):
    rows = text.QUERIES["text_inverted_index"](spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        ids = [int(x) for x in r.postings.split(",")]
        assert ids == sorted(ids)
        assert len(ids) == min(r.df, text.POSTINGS_CAP)
        assert len(set(ids)) == len(ids)
        assert r.df >= 2


def test_inverted_index_df_matches_scan(spark):
    d = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    # recompute one term's df naively
    rows = text.QUERIES["text_inverted_index"](spark, SF_SMOKE).collect()
    term = rows[0].term
    df_naive = d.filter(
        F.array_contains(
            F.regexp_extract_all(F.lower("text"), F.lit("[a-z]{3,}"), F.lit(0)),
            term,
        )
    ).count()
    assert rows[0].df == df_naive


# ---------------------------------------------------------------------------
# langid_ngram_vote
# ---------------------------------------------------------------------------


def test_langid_confusion_covers_test_split(spark):
    rows = text.QUERIES["langid_ngram_vote"](spark, SF_SMOKE).collect()
    d = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10).cast(
            "long"
        )
        % 10
    )
    n_test = d.filter((F.length("text") >= 2) & (bucket == 0)).count()
    assert sum(r.n_docs for r in rows) == n_test
    langs = {r[0] for r in d.select("lang").distinct().collect()}
    assert all(r.pred_lang in langs for r in rows)


def test_langid_learns_separable_fixture(spark):
    # a corpus where the label IS recoverable: distinct alphabets per
    # lang (the synthetic sf tables share one word pool, so accuracy is
    # majority-class there; this fixture proves the classifier itself)
    rows = []
    for i in range(40):
        rows.append((i * 3 + 0, "aaab aaba abaa " * 8, "aa", "s", 10))
        rows.append((i * 3 + 1, "zzzy zzyz zyzz " * 8, "zz", "s", 10))
        rows.append((i * 3 + 2, "mmmn mmnm mnmm " * 8, "mm", "s", 10))
    d = spark.createDataFrame(rows, ["doc_id", "text", "lang", "source", "n_chars"])
    orig = text.table
    try:
        text.table = lambda s, dd, n: d  # noqa: ARG005
        out = text.QUERIES["langid_ngram_vote"](spark, SF_SMOKE).collect()
    finally:
        text.table = orig
    assert out
    # perfectly separable alphabets -> a perfectly diagonal confusion matrix
    assert all(r.lang == r.pred_lang for r in out)

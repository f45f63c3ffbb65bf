"""Round-6 operators: exact-substring dedup, retention cohorts,
n-gram novelty."""

from __future__ import annotations

from datetime import datetime, timedelta

from pyspark.sql import functions as F

from graphdb_wikidata_spark.operators import dedup, events, text

from tests.conftest import SF_SMOKE


def _doc_df(spark, texts):
    return spark.createDataFrame(
        [(i, t, "en", f"src{i % 3}", len(t)) for i, t in enumerate(texts)],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )


# ---------------------------------------------------------------------------
# dedup_exact_substring
# ---------------------------------------------------------------------------


def _with_docs(mod, spark, df, name):
    orig = mod.table
    mod.table = lambda s, d, n: df  # noqa: ARG005
    try:
        return mod.QUERIES[name](spark, SF_SMOKE).collect()
    finally:
        mod.table = orig


def test_exact_substring_finds_verbatim_overlap(spark):
    run = " ".join(f"w{i}" for i in range(dedup.SUBSTR_W))  # exactly W tokens
    texts = [
        "prefix alpha " + run + " suffix beta",
        "completely different lead-in " + run + " and another tail here",
        " ".join(f"z{i}" for i in range(30)),  # no overlap with anyone
    ]
    out = _with_docs(dedup, spark, _doc_df(spark, texts), "dedup_exact_substring")
    pairs = {(r.doc_a, r.doc_b): r for r in out}
    assert set(pairs) == {(0, 1)}
    assert pairs[(0, 1)].n_shared == 1  # the single shared W-window
    # containment = 1 shared window / min(#windows): doc0 has 19 tokens
    # -> 5 windows, doc1 has 23 tokens -> 9 windows
    assert pairs[(0, 1)].containment == round(1 / 5, 6)


def test_exact_substring_drops_boilerplate_windows(spark):
    run = " ".join(f"b{i}" for i in range(dedup.SUBSTR_W))
    # the same window in MORE than SUBSTR_DF_CAP docs -> stop window,
    # no pairs at all
    texts = [f"doc{i} marker " + run for i in range(dedup.SUBSTR_DF_CAP + 1)]
    out = _with_docs(dedup, spark, _doc_df(spark, texts), "dedup_exact_substring")
    assert out == []


def test_exact_substring_plan_is_bucket_join(spark):
    plan = (
        dedup.QUERIES["dedup_exact_substring"](spark, SF_SMOKE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # pair enumeration must be the hash bucket join, never a cross
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_exact_substring_subsumed_by_window_guarantee(spark):
    """Any two docs sharing >= W consecutive tokens MUST be flagged
    (the suffix-array guarantee the fixed-W approximation keeps)."""
    base = [f"t{i}" for i in range(40)]
    texts = [
        " ".join(base),
        "unrelated head " + " ".join(base[5 : 5 + dedup.SUBSTR_W + 3]) + " tail",
    ]
    out = _with_docs(dedup, spark, _doc_df(spark, texts), "dedup_exact_substring")
    assert {(r.doc_a, r.doc_b) for r in out} == {(0, 1)}
    # W+3 consecutive shared tokens -> 4 shared windows
    assert out[0].n_shared == 4


# ---------------------------------------------------------------------------
# events_retention_cohorts
# ---------------------------------------------------------------------------


def test_retention_cohorts_fixture(spark):
    mon1 = datetime(2024, 1, 1)  # a Monday
    mon2 = mon1 + timedelta(weeks=1)
    rows = []
    # cohort week1: users 1,2 active wk0; user 1 also active wk1
    rows.append((1, mon1, 1, "x", 1.0, "{}"))
    rows.append((2, mon1 + timedelta(days=2), 2, "x", 1.0, "{}"))
    rows.append((3, mon2 + timedelta(days=1), 1, "x", 1.0, "{}"))
    # cohort week2: user 3 only
    rows.append((4, mon2, 3, "x", 1.0, "{}"))
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    out = _with_docs(events, spark, df, "events_retention_cohorts")
    cells = {(r.cohort_week, r.week_offset): r for r in out}
    assert set(cells) == {("2024-01-01", 0), ("2024-01-01", 1), ("2024-01-08", 0)}
    assert cells[("2024-01-01", 0)].n_active == 2
    assert cells[("2024-01-01", 0)].retention == 1.0
    assert cells[("2024-01-01", 1)].n_active == 1
    assert cells[("2024-01-01", 1)].retention == 0.5
    assert cells[("2024-01-08", 0)].cohort_size == 1


def test_retention_offset_zero_is_full(spark):
    out = events.QUERIES["events_retention_cohorts"](spark, SF_SMOKE).collect()
    assert out
    for r in out:
        if r.week_offset == 0:
            # every user is active in their own first week by definition
            assert r.retention == 1.0
        assert 0.0 < r.retention <= 1.0
        assert r.n_active <= r.cohort_size


# ---------------------------------------------------------------------------
# text_ngram_novelty
# ---------------------------------------------------------------------------


def test_novelty_duplicate_scores_zero(spark):
    texts = [
        "the quick brown fox jumps over the lazy dog today",
        "the quick brown fox jumps over the lazy dog today",  # exact dup
        "completely fresh sentence with entirely new words here",
    ]
    # text_ngram_novelty reads through dedup._shingled -> dedup.table
    orig = dedup.table
    dedup.table = lambda s, d, n: _doc_df(spark, texts)  # noqa: ARG005
    try:
        rows = text.QUERIES["text_ngram_novelty"](spark, SF_SMOKE).collect()
    finally:
        dedup.table = orig
    out = {r.doc_id: r for r in rows}
    assert out[0].novelty == 1.0  # first doc owns all its shingles
    assert out[1].novelty == 0.0  # verbatim dup owns none
    assert out[2].novelty == 1.0


def test_novelty_partition_of_distinct_shingles(spark):
    """sum(n_novel) over docs == number of distinct shingles in the
    corpus (every shingle has exactly one owner)."""
    out = text.QUERIES["text_ngram_novelty"](spark, SF_SMOKE).collect()
    n_owned = sum(r.n_novel for r in out)
    distinct_sh = (
        dedup._shingled(spark, SF_SMOKE).select("sh").distinct().count()
    )
    assert n_owned == distinct_sh
    assert all(0.0 <= r.novelty <= 1.0 for r in out)

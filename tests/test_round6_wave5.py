"""Round-6 wave-5 operators: token entropy, vocabulary builder, BPE
pair counts, rolling DAU/WAU, Gini concentration.

Oracle equivalence is covered by the parametrized test_entry_queries
sweep; these pin the math and boundary semantics on synthetic frames.
"""

from __future__ import annotations

import math
from datetime import datetime, timedelta

from graphdb_wikidata_spark.operators import events, text

from tests.conftest import SF_SMOKE


def _with_docs(spark, rows, name):
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang", "source", "n_chars"])
    orig = text.table
    text.table = lambda s, d, n: df  # noqa: ARG005
    try:
        return text.QUERIES[name](spark, SF_SMOKE).collect()
    finally:
        text.table = orig


def _with_events(spark, rows, name):
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    orig = events.table
    events.table = lambda s, d, n: df  # noqa: ARG005
    try:
        return events.QUERIES[name](spark, SF_SMOKE).collect()
    finally:
        events.table = orig


def _doc(i, txt):
    return (i, txt, "en", "web", len(txt))


# ---------------------------------------------------------------------------
# text_token_entropy
# ---------------------------------------------------------------------------


def test_token_entropy_degenerate_and_uniform(spark):
    rows = [
        _doc(1, "a a a a"),  # one token repeated -> entropy 0
        _doc(2, "a b c d"),  # uniform over 4 -> entropy 2.0
        _doc(3, "a a b b"),  # uniform over 2 -> entropy 1.0
        _doc(4, "x"),  # single token -> 0
    ]
    out = {r.doc_id: (r.n_tokens, r.token_entropy) for r in _with_docs(
        spark, rows, "text_token_entropy"
    )}
    assert out == {1: (4, 0.0), 2: (4, 2.0), 3: (4, 1.0), 4: (1, 0.0)}


def test_token_entropy_skewed_matches_closed_form(spark):
    # 3-of-one, 1-of-other: H = log2(4) - (3*log2(3) + 0)/4
    rows = [_doc(1, "a a a b")]
    (row,) = _with_docs(spark, rows, "text_token_entropy")
    expected = round(2.0 - 3 * math.log2(3) / 4, 6)
    assert row.token_entropy == expected


# ---------------------------------------------------------------------------
# vocab_topk_ids
# ---------------------------------------------------------------------------


def test_vocab_ids_are_dense_frequency_ranks_with_token_tiebreak(spark):
    rows = [_doc(1, "dog cat cat bird dog cat"), _doc(2, "bird ant")]
    out = {r.token: (r.freq, r.vocab_id) for r in _with_docs(
        spark, rows, "vocab_topk_ids"
    )}
    # cat x3 -> id 1; bird/dog tie at 2 -> alphabetical; ant x1 -> id 4
    assert out == {"cat": (3, 1), "bird": (2, 2), "dog": (2, 3), "ant": (1, 4)}


def test_vocab_lowercases_and_strips_nonalpha(spark):
    rows = [_doc(1, "Dog DOG dog42 7up!")]
    out = {r.token: r.freq for r in _with_docs(spark, rows, "vocab_topk_ids")}
    # regexp [a-z]+ over lowered text: dog42 -> dog, 7up -> up
    assert out == {"dog": 3, "up": 1}


# ---------------------------------------------------------------------------
# bpe_pair_counts
# ---------------------------------------------------------------------------


def test_bpe_pairs_enumerate_word_internal_bigrams(spark):
    rows = [_doc(1, "aaa ab a")]  # 'aaa' -> aa,aa ; 'ab' -> ab ; 'a' too short
    out = {r.pair: r.n_occurrences for r in _with_docs(spark, rows, "bpe_pair_counts")}
    assert out == {"aa": 2, "ab": 1}


def test_bpe_pairs_never_cross_word_boundaries(spark):
    rows = [_doc(1, "ab cd")]
    out = {r.pair for r in _with_docs(spark, rows, "bpe_pair_counts")}
    assert out == {"ab", "cd"}  # no 'bc' pair across the space


# ---------------------------------------------------------------------------
# events_dau_wau_rolling
# ---------------------------------------------------------------------------


def _ev(i, day, user, etype="click"):
    return (i, datetime(2024, 1, day, 12, 0), user, etype, 1.0, "{}")


def test_dau_wau_window_covers_trailing_seven_days(spark):
    rows = [
        _ev(1, 1, 100),
        _ev(2, 1, 200),
        _ev(3, 8, 100),  # day 1 is 7 days before -> OUTSIDE day-8 window
        _ev(4, 5, 300),  # day 5 is inside day-8's trailing window
    ]
    out = {r.day: (r.dau, r.wau_7d) for r in _with_events(
        spark, rows, "events_dau_wau_rolling"
    )}
    assert out["2024-01-01"] == (2, 2)
    assert out["2024-01-05"] == (1, 3)  # users 100,200 (day1) + 300
    # day 8 window = days 2..8: users 300 (day5) + 100 (day8)
    assert out["2024-01-08"] == (1, 2)
    # only days present in the data appear
    assert set(out) == {"2024-01-01", "2024-01-05", "2024-01-08"}


def test_dau_counts_users_once_per_day(spark):
    rows = [_ev(1, 1, 100), _ev(2, 1, 100), _ev(3, 1, 100)]
    out = _with_events(spark, rows, "events_dau_wau_rolling")
    assert [(r.dau, r.wau_7d, r.stickiness) for r in out] == [(1, 1, 1.0)]


# ---------------------------------------------------------------------------
# events_gini_concentration
# ---------------------------------------------------------------------------


def test_gini_zero_for_perfect_equality(spark):
    rows = [_ev(i, 1 + i % 3, 100 + i % 4) for i in range(12)]  # 4 users x 3 events
    out = _with_events(spark, rows, "events_gini_concentration")
    by_type = {r.event_type: r for r in out}
    r = by_type["click"]
    assert (r.n_users, r.n_events, r.gini) == (4, 12, 0.0)


def test_gini_matches_hand_computation_for_skew(spark):
    # counts 1, 1, 6 sorted asc: G = 2*(1*1+2*1+3*6)/(3*8) - 4/3 = 42/24 - 4/3
    rows = (
        [_ev(1, 1, 1), _ev(2, 1, 2)]
        + [_ev(10 + i, 1 + i % 5, 3) for i in range(6)]
    )
    out = _with_events(spark, rows, "events_gini_concentration")
    (r,) = out
    assert r.n_users == 3 and r.n_events == 8
    assert r.gini == round(42 / 24 - 4 / 3, 6)

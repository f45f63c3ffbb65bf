"""BPE tokenizer trainer (text.bpe_train_merges) — registry-queued for
round 7 (the replace-to-fixpoint merge semantics are engine-portable by
construction); this round the trainer invariants are the gate."""

from __future__ import annotations

from graphdb_wikidata_spark.operators.text import (
    BPE_TRAIN_ROUNDS,
    bpe_train_merges,
)

from tests.conftest import SF_SMOKE


def test_bpe_learns_monotone_merges(spark):
    rows = bpe_train_merges(spark, SF_SMOKE).collect()
    assert len(rows) == BPE_TRAIN_ROUNDS
    assert [r.round for r in rows] == list(range(1, BPE_TRAIN_ROUNDS + 1))
    for r in rows:
        assert r.merged == r.left + r.right
        assert r.pair_count > 0
    # each merge removes the argmax pair; later argmaxes cannot exceed it
    counts = [r.pair_count for r in rows]
    assert counts == sorted(counts, reverse=True)
    # no pair is learned twice
    assert len({(r.left, r.right) for r in rows}) == BPE_TRAIN_ROUNDS


def test_bpe_round1_is_the_true_argmax_pair(spark):
    # recompute the round-1 statistic independently (python-side, same
    # tokenization: whitespace words, weighted by word frequency) and
    # check the trainer picked its argmax
    from collections import Counter

    from graphdb_wikidata_spark.tables import table

    first = bpe_train_merges(spark, SF_SMOKE).collect()[0]
    words = Counter()
    for r in table(spark, SF_SMOKE, "documents").select("text").collect():
        for w in r.text.split(" "):
            if w:
                words[w] += 1
    pairs = Counter()
    for w, freq in words.items():
        for a, b in zip(w, w[1:]):
            pairs[(a, b)] += freq
    top_count = max(pairs.values())
    assert first.pair_count == top_count
    tied = {p for p, c in pairs.items() if c == top_count}
    assert (first.left, first.right) in tied


def test_bpe_training_is_deterministic(spark):
    a = [tuple(r) for r in bpe_train_merges(spark, SF_SMOKE).collect()]
    b = [tuple(r) for r in bpe_train_merges(spark, SF_SMOKE).collect()]
    assert a == b

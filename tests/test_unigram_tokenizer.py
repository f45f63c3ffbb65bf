"""Unigram-LM tokenizer trainer (text.unigram_lm_tokenizer) —
registry-queued for round 7; this round the EM/segmentation invariants
are the gate."""

from __future__ import annotations

from pyspark.sql import functions as F

from graphdb_wikidata_spark.operators.text import (
    UNI_MAX_PIECE,
    UNI_VOCAB_CAP,
    unigram_lm_tokenizer,
)
from graphdb_wikidata_spark.tables import table

from tests.conftest import SF_SMOKE


def test_vocab_learns_multichar_pieces(spark):
    rows = unigram_lm_tokenizer(spark, SF_SMOKE).collect()
    assert rows
    assert len(rows) <= 50
    for r in rows:
        assert 1 <= len(r.piece) <= UNI_MAX_PIECE
        assert r.used > 0
        assert r.log_prob < 0
    # EM must concentrate usage on real multi-char pieces, not collapse
    # to a char model
    assert any(len(r.piece) > 1 for r in rows)
    # usage-ordered
    assert all(rows[i].used >= rows[i + 1].used for i in range(len(rows) - 1))


def test_piece_usage_conserves_word_mass(spark):
    # every word is segmented exactly: the total character mass of all
    # piece usages equals the corpus character mass of nonempty words
    rows = unigram_lm_tokenizer(spark, SF_SMOKE).collect()
    d = table(spark, SF_SMOKE, "documents")
    corpus_chars = (
        d.select(F.explode(F.split("text", " ")).alias("w"))
        .filter(F.col("w") != "")
        .agg(F.sum(F.length("w")))
        .collect()[0][0]
    )
    # top-50 usage can't exceed the corpus mass
    assert sum(len(r.piece) * r.used for r in rows) <= corpus_chars
    assert UNI_VOCAB_CAP >= len(rows)


def test_training_is_deterministic(spark):
    a = [tuple(r) for r in unigram_lm_tokenizer(spark, SF_SMOKE).collect()]
    b = [tuple(r) for r in unigram_lm_tokenizer(spark, SF_SMOKE).collect()]
    assert a == b

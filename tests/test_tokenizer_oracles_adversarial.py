"""Adversarial generalization tests for the two tokenizer-training
oracles (round 7): the driver gate proves them on the FIXED testdata
corpus (31 distinct words, max length 8); these tests prove the
Spark kernel and the DuckDB oracle stay hash-identical on corpora the
fixed data never exercises — long words (deeper Viterbi recursions and
more replace-to-fixpoint passes), back-to-back merge sites
('abababab'), single-char words, words where multi-char pieces compete
with char fallbacks, and a vocabulary where tie-breaks decide merges.

Also pins the CDC oracle's data assumption: its ord(substr()) rolling
hash equates char offsets with byte offsets, valid only while document
text is pure ASCII — assert that on the shipped testdata so a future
regeneration that breaks the assumption fails here, not in the driver
window.
"""

from __future__ import annotations

import os

import duckdb
import pytest

from tests.conftest import SF_SMOKE
from tests.oracle_harness import compare

ADVERSARIAL_DOCS = [
    # back-to-back merge sites: ' a b a b ' needs the second fixpoint
    # pass on both engines
    "abababab abababab abab ab ab ab",
    # long words: Viterbi recursion depth 16, merge fixpoint over
    # longer symbol strings
    "internationalization internationalization internationalize",
    "zzzzzzzzzzzzzzzz zzzz zz z",
    # single-char words and char-fallback pieces
    "a a a a b b b c q",
    # competing pieces: 'er' vs 'e'+'r' frequency balance
    "tester tester rester rest er er er e r",
    # tie-break material: equal pair counts resolved by (l, r) order
    "xy xy yx yx",
]


@pytest.fixture(scope="module")
def adversarial_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("adv_docs"))
    import pyarrow as pa
    import pyarrow.parquet as pq

    # a single parquet FILE, exactly like the testdata layout (Spark's
    # writer makes a directory, which DuckDB's plain-path read rejects)
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(ADVERSARIAL_DOCS)), pa.int64()),
            "text": pa.array(ADVERSARIAL_DOCS),
            "lang": pa.array(["en"] * len(ADVERSARIAL_DOCS)),
            "source": pa.array(["adv"] * len(ADVERSARIAL_DOCS)),
            "n_chars": pa.array([len(t) for t in ADVERSARIAL_DOCS], pa.int64()),
        }
    )
    pq.write_table(tbl, os.path.join(d, "documents.parquet"))
    # the oracle harness registers EVERY table as a view; link the
    # untouched ones from the smoke dir so only documents is replaced
    from graphdb_wikidata_spark.tables import TABLE_NAMES

    for t in TABLE_NAMES:
        if t != "documents":
            os.symlink(
                os.path.join(SF_SMOKE, f"{t}.parquet"),
                os.path.join(d, f"{t}.parquet"),
            )
    return d


@pytest.mark.parametrize("name", ["bpe_train_merges", "unigram_lm_tokenizer"])
def test_tokenizer_oracle_generalizes(spark, adversarial_dir, name):
    from graphdb_wikidata_spark.operators.text import ORACLES, QUERIES

    ok, msg = compare(QUERIES[name](spark, adversarial_dir), ORACLES[name], adversarial_dir)
    assert ok, msg


def test_cdc_oracle_ascii_assumption_holds_on_testdata():
    con = duckdb.connect()
    for sf in ("0.001", "0.01"):
        n_bad = con.execute(
            f"""select count(*) from read_parquet(
                '/root/testdata/sf{sf}/documents.parquet')
                where text !~ '^[ -~]*$'"""
        ).fetchone()[0]
        assert n_bad == 0, (
            f"sf{sf}: {n_bad} non-ASCII documents — media_cdc_chunk_census's "
            "oracle equates char offsets with byte offsets and must be "
            "rewritten over blobs before this data ships"
        )
    con.close()


def test_cdc_census_matches_oracle_on_adversarial_texts(spark, adversarial_dir):
    # repeated content across docs -> shared chunks; long runs of one
    # char -> boundary-free spans; both must census identically
    from graphdb_wikidata_spark.operators.multimodal import ORACLES, QUERIES

    name = "media_cdc_chunk_census"
    ok, msg = compare(QUERIES[name](spark, adversarial_dir), ORACLES[name], adversarial_dir)
    assert ok, msg


def test_smoke_corpus_still_green(spark):
    # the fixed-corpus gate, kept adjacent so a drift in either corpus
    # shows up in one file
    from graphdb_wikidata_spark.operators.text import ORACLES, QUERIES

    ok, msg = compare(
        QUERIES["bpe_train_merges"](spark, SF_SMOKE),
        ORACLES["bpe_train_merges"],
        SF_SMOKE,
    )
    assert ok, msg

"""Scale-probe synthesis invariants (graphdb_wikidata_spark/scaleprobe.py):
the FACTORx twin must be real scaled data — FACTORx rows, unique keys,
intact foreign keys, and linearly-scaling near-dup structure — or the
bench scale section measures a different workload than it claims."""

from __future__ import annotations

import pytest

from graphdb_wikidata_spark.scaleprobe import ensure_scaled_dir
from graphdb_wikidata_spark.tables import table

from tests.conftest import SF_SMOKE

FACTOR = 3


@pytest.fixture(scope="module")
def big_dir(spark, tmp_path_factory):
    return ensure_scaled_dir(
        spark, SF_SMOKE, FACTOR, out_root=str(tmp_path_factory.mktemp("scale"))
    )


def test_row_counts_scale(spark, big_dir):
    for name in ("customer", "orders", "lineitem", "events", "documents"):
        base = table(spark, SF_SMOKE, name).count()
        assert table(spark, big_dir, name).count() == FACTOR * base
    # fixed-size dimensions stay 1x
    assert table(spark, big_dir, "nation").count() == table(spark, SF_SMOKE, "nation").count()


def test_keys_unique_and_fks_intact(spark, big_dir):
    o = table(spark, big_dir, "orders")
    assert o.select("o_orderkey").distinct().count() == o.count()
    c = table(spark, big_dir, "customer")
    assert o.join(c, o.o_custkey == c.c_custkey, "left_anti").count() == 0
    li = table(spark, big_dir, "lineitem")
    assert li.join(o, li.l_orderkey == o.o_orderkey, "left_anti").count() == 0
    # part/supplier FKs must shift in lockstep with their dimensions:
    # otherwise copies 1..N-1 of part/supplier are orphaned and each
    # base key gets FACTORx fan-out (ADVICE r02)
    p = table(spark, big_dir, "part")
    s = table(spark, big_dir, "supplier")
    assert li.join(p, li.l_partkey == p.p_partkey, "left_anti").count() == 0
    assert li.join(s, li.l_suppkey == s.s_suppkey, "left_anti").count() == 0
    # and every part/supplier copy keeps its base fan-out (no orphans,
    # no concentration): referenced-key counts scale exactly FACTORx
    base_li = table(spark, SF_SMOKE, "lineitem")
    assert (
        li.select("l_partkey").distinct().count()
        == FACTOR * base_li.select("l_partkey").distinct().count()
    )
    assert (
        li.select("l_suppkey").distinct().count()
        == FACTOR * base_li.select("l_suppkey").distinct().count()
    )


def test_documents_copies_are_not_near_dups(spark, big_dir):
    # word-salting must break cross-copy shingle identity: copy texts of
    # the same base doc must all differ
    docs = table(spark, big_dir, "documents")
    n = docs.count()
    assert docs.select("text").distinct().count() == n
    assert docs.select("doc_id").distinct().count() == n


# ---- round 4: zipf (skew) twin -------------------------------------------


@pytest.fixture(scope="module")
def zipf_dir(spark, tmp_path_factory):
    return ensure_scaled_dir(
        spark,
        SF_SMOKE,
        FACTOR,
        out_root=str(tmp_path_factory.mktemp("zipf")),
        zipf=True,
    )


def test_zipf_orders_have_celebrity_customer(spark, zipf_dir):
    from pyspark.sql import functions as F

    from graphdb_wikidata_spark.scaleprobe import _CELEBRITY_CUSTKEY

    o = table(spark, zipf_dir, "orders")
    total = o.count()
    celebrity = o.filter(F.col("o_custkey") == _CELEBRITY_CUSTKEY).count()
    # every 100th order reassigned: ~1% (+ the celebrity's base orders)
    assert celebrity >= total // 100
    assert celebrity <= total // 100 + total // 20
    # same size as the uniform twin
    assert total == FACTOR * table(spark, SF_SMOKE, "orders").count()
    # the celebrity must EXIST and sit in nation 7, so the hot key
    # survives the bgp probe's filter instead of dangling out of the
    # join — a testdata regeneration that moves it must fail loudly
    c = table(spark, SF_SMOKE, "customer")
    row = c.filter(F.col("c_custkey") == _CELEBRITY_CUSTKEY).collect()
    assert len(row) == 1 and row[0]["c_nationkey"] == 7


def test_zipf_documents_have_celebrity_cluster(spark, zipf_dir):
    from pyspark.sql import functions as F

    d = table(spark, zipf_dir, "documents")
    total = d.count()
    top = (
        d.groupBy("text").count().orderBy(F.desc("count")).first()["count"]
    )
    assert top >= total // 100  # one text owns ~1% of the corpus

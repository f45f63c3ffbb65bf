"""As-of join and skew-salted join (extensions; SURVEY §2.3 notes the
reference has no range/as-of machinery)."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from graphdb_wikidata_spark.operators.asof import asof_join
from graphdb_wikidata_spark.operators.relational import salted_join


def _ts(m):
    return datetime(2024, 1, 1, 0, m)


def test_asof_backward_inclusive(spark):
    left = spark.createDataFrame(
        [(1, _ts(10), "a"), (1, _ts(20), "b"), (2, _ts(5), "c")],
        "user_id long, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [(1, _ts(10), 100), (1, _ts(15), 150), (2, _ts(6), 200)],
        "user_id long, ts timestamp, payload long",
    )
    out = {
        r["tag"]: r["payload"]
        for r in asof_join(left, right, ts="ts", by=("user_id",)).collect()
    }
    # a: right at the SAME ts matches (inclusive); b: latest prior is
    # 15->150; c: only right is later -> no match
    assert out == {"a": 100, "b": 150, "c": None}


def test_asof_strict_excludes_same_ts(spark):
    left = spark.createDataFrame(
        [(1, _ts(10), "a")], "user_id long, ts timestamp, tag string"
    )
    right = spark.createDataFrame(
        [(1, _ts(10), 100), (1, _ts(9), 90)],
        "user_id long, ts timestamp, payload long",
    )
    out = asof_join(left, right, ts="ts", by=("user_id",), strict=True).collect()
    assert out[0]["payload"] == 90


def test_asof_collision_rejected(spark):
    df = spark.createDataFrame([(1, _ts(1), 5)], "user_id long, ts timestamp, v long")
    try:
        asof_join(df, df, ts="ts", by=("user_id",))
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_salted_join_equals_plain(spark):
    # skewed: 90% of left rows share key 7
    left = spark.range(200).select(
        F.when(F.col("id") % 10 < 9, F.lit(7)).otherwise(F.col("id") % 5).alias("k"),
        F.col("id").alias("lv"),
    )
    right = spark.range(10).select(F.col("id").alias("k"), (F.col("id") * 2).alias("rv"))
    got = sorted(
        (r["k"], r["lv"], r["rv"]) for r in salted_join(left, right, on=["k"], salts=4).collect()
    )
    want = sorted((r["k"], r["lv"], r["rv"]) for r in left.join(right, "k").collect())
    assert got == want


def test_range_join_equals_naive(spark):
    from graphdb_wikidata_spark.operators.asof import range_join

    left = spark.createDataFrame(
        [(1, _ts(i), i) for i in range(0, 50, 3)],
        "user_id long, ts timestamp, lv long",
    )
    right = spark.createDataFrame(
        [(1, _ts(i), 100 + i) for i in range(0, 50, 2)],
        "user_id long, ts timestamp, rv long",
    )
    got = sorted(
        (r["lv"], r["rv"])
        for r in range_join(
            left, right, ts="ts", by=("user_id",), lower_s=-600.0, upper_s=0.0
        ).collect()
    )
    naive = left.alias("l").join(
        right.alias("r"),
        (F.col("l.user_id") == F.col("r.user_id"))
        & (F.col("r.ts") >= F.col("l.ts") - F.expr("INTERVAL 10 MINUTES"))
        & (F.col("r.ts") <= F.col("l.ts")),
    )
    want = sorted((r["lv"], r["rv"]) for r in naive.collect())
    assert got == want and len(got) > 0

"""Round-8 optimization pins: each changed kernel is checked against a
direct model of the semantics it replaced (guide §1: re-verify after
every structural change).

- assign_nearest fold == the former broadcast-crossJoin struct-extremum
  (including NaN placement and lower-cid tie-breaks, both metrics);
- BPE stacked replace passes == replace-to-fixpoint (including the
  adversarial l == r run where one pass is provably not enough);
- hoisted-degree PageRank == the per-iteration-join formulation.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from graphdb_wikidata_spark.operators.similarity import assign_nearest


def _old_assign(e, cent, metric):
    """The pre-round-8 formulation: broadcast crossJoin + struct
    extremum (verbatim from the r7 code)."""
    from graphdb_wikidata_spark.operators.similarity import dot, norm

    if metric == "cosine":
        score = dot(F.col("v"), F.col("cv")) / (norm(F.col("v")) * norm(F.col("cv")))
        scored = e.crossJoin(F.broadcast(cent)).select(
            "vec_id", "v", "cid", score.alias("s")
        )
        return (
            scored.groupBy("vec_id")
            .agg(
                F.max(
                    F.struct(F.col("s"), (-F.col("cid")).alias("ncid"), F.col("v"))
                ).alias("m")
            )
            .select("vec_id", (-F.col("m.ncid")).alias("cid"), F.col("m.v").alias("v"))
        )
    d2 = F.aggregate(
        F.zip_with(F.col("v"), F.col("cv"), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = e.crossJoin(F.broadcast(cent)).select("vec_id", "v", "cid", d2.alias("d2"))
    return (
        scored.groupBy("vec_id")
        .agg(F.min(F.struct("d2", "cid", "v")).alias("m"))
        .select("vec_id", F.col("m.cid").alias("cid"), F.col("m.v").alias("v"))
    )


VECS = [
    (0, [0.0, 0.0]),
    (1, [1.0, 1.0]),
    (2, [5.0, 5.0]),
    (3, [2.5, 2.5]),  # exactly between centroids 0 and 1 -> tie
    (4, [float("nan"), 1.0]),  # NaN distance to every centroid
    (5, [-3.0, 4.0]),
]
CENTS = [(0, [0.0, 0.0]), (1, [5.0, 5.0]), (2, [0.0, 5.0])]
# cosine: zero-norm vectors divide by zero under ANSI (in the old and
# the new formulation alike), so its fixtures keep every norm positive
CENTS_COS = [(0, [1.0, 0.0]), (1, [1.0, 1.0]), (2, [0.0, 1.0])]


@pytest.mark.parametrize("metric", ["l2", "cosine"])
def test_assign_nearest_fold_matches_struct_extremum(spark, metric):
    vecs = [(i, v) for i, v in VECS if metric == "l2" or any(x != 0 for x in v)]
    e = spark.createDataFrame(vecs, "vec_id long, v array<double>")
    cent = spark.createDataFrame(
        CENTS if metric == "l2" else CENTS_COS, "cid int, cv array<double>"
    )
    new = {
        r.vec_id: r.cid for r in assign_nearest(e, cent, metric=metric).collect()
    }
    old = {r.vec_id: r.cid for r in _old_assign(e, cent, metric).collect()}
    assert new == old


def test_assign_nearest_l2_tie_prefers_lower_cid(spark):
    e = spark.createDataFrame([(7, [2.5, 2.5])], "vec_id long, v array<double>")
    cent = spark.createDataFrame(
        [(3, [5.0, 5.0]), (1, [0.0, 0.0])], "cid int, cv array<double>"
    )
    # equidistant -> lower cid wins regardless of centroid row order
    assert assign_nearest(e, cent).collect()[0].cid == 1


def test_assign_nearest_empty_centroids_yields_empty(spark):
    e = spark.createDataFrame([(0, [1.0])], "vec_id long, v array<double>")
    cent = spark.createDataFrame([], "cid int, cv array<double>")
    assert assign_nearest(e, cent).count() == 0


# ---- BPE stacked passes ---------------------------------------------------


def _replace_fixpoint(syms: str, pat: str, rep: str) -> str:
    while True:
        nxt = (" " + syms + " ").replace(pat, rep).strip()
        if nxt == syms:
            return syms
        syms = nxt


def _stacked(syms: str, pat: str, rep: str, passes: int) -> str:
    for _ in range(passes):
        syms = (" " + syms + " ").replace(pat, rep).strip()
    return syms


@pytest.mark.parametrize(
    "syms,l,r",
    [
        ("a a a a a", "a", "a"),  # l == r run: 1 pass is NOT enough
        ("a a a a a a a", "a", "a"),
        ("l r l r l r l r l r", "l", "r"),  # adjacent-site chain
        ("x l r r y", "l", "r"),
        ("l r", "l", "r"),
        ("q w e", "l", "r"),  # no sites
    ],
)
def test_bpe_stacked_passes_reach_the_fixpoint(syms, l, r):
    from graphdb_wikidata_spark.operators.text import BPE_MERGE_PASSES

    pat, rep = f" {l} {r} ", f" {l}{r} "
    fix = _replace_fixpoint(syms, pat, rep)
    got = _stacked(syms, pat, rep, BPE_MERGE_PASSES)
    assert got == fix
    # and one pass alone genuinely differs on the adjacent-site chain
    # (the second site's leading space is consumed by the first
    # match), i.e. the stacking is load-bearing, not decorative
    if syms.startswith("l r l r"):
        assert _stacked(syms, pat, rep, 1) != fix


def test_bpe_spark_replace_matches_python_semantics(spark):
    # Spark's replace() must share Python str.replace's greedy
    # left-to-right non-overlap semantics, which the fixpoint model
    # above (and the DuckDB oracle) rely on
    rows = [("a a a a a",), ("l r l r l r",), ("x l r r",)]
    df = spark.createDataFrame(rows, "syms string")
    out = df.select(
        F.trim(
            F.replace(
                F.concat(F.lit(" "), F.col("syms"), F.lit(" ")),
                F.lit(" a a "),
                F.lit(" aa "),
            )
        ).alias("s")
    ).collect()
    expect = [(" " + s + " ").replace(" a a ", " aa ").strip() for (s,) in rows]
    assert [r.s for r in out] == expect


def test_bpe_train_merges_unchanged_on_sf0001(spark):
    """End-to-end pin: the round-8 job-count rewrite must leave the
    learned merge table bit-identical on real data."""
    from graphdb_wikidata_spark.operators.text import bpe_train_merges

    rows = [tuple(r) for r in bpe_train_merges(spark, "/root/testdata/sf0.001").collect()]
    # deterministic: re-run agrees, every merge concatenates its pair
    rows2 = [tuple(r) for r in bpe_train_merges(spark, "/root/testdata/sf0.001").collect()]
    assert rows == rows2
    for _, left, right, merged, cnt in rows:
        assert merged == left + right and cnt > 0


# ---- PageRank hoisted-degree loop ----------------------------------------


def test_pagerank_hoisted_matches_per_iteration_join(spark):
    from graphdb_wikidata_spark.operators.graph import pagerank

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (3, 4), (4, 1), (5, 1)], "src long, dst long"
    )

    def reference(iters=10, damping=0.85, dangling="redistribute"):
        # direct per-node model of the same drop/redistribute updates
        nodes = {1, 2, 3, 4, 5}
        out = {1: [2], 2: [3], 3: [1, 4], 4: [1], 5: [1]}
        n = len(nodes)
        ranks = {v: 1.0 / n for v in nodes}
        base = (1.0 - damping) / n
        for _ in range(iters):
            contrib = {v: 0.0 for v in nodes}
            for u, dsts in out.items():
                for d in dsts:
                    contrib[d] += ranks[u] / len(dsts)
            dmass = sum(ranks[v] for v in nodes if v not in out)
            nxt = {}
            for v in nodes:
                x = contrib[v]
                if dangling == "redistribute":
                    x += dmass / n
                nxt[v] = base + damping * x
            ranks = nxt
        return ranks

    for variant in ("redistribute", "drop"):
        got = {
            r.node: r.rank for r in pagerank(edges, 10, 0.85, dangling=variant).collect()
        }
        want = reference(dangling=variant)
        assert set(got) == set(want)
        for v in want:
            assert math.isclose(got[v], want[v], rel_tol=1e-12), (variant, v)
        if variant == "redistribute":
            assert math.isclose(sum(got.values()), 1.0, rel_tol=1e-9)

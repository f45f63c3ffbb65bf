"""Capture .explain('formatted') for the headline + probe queries.

Usage: python plans/r08/capture_plans.py <suffix> [name ...]
Writes plans/r08/<query>_<suffix>.txt for each query (default: the
bench HEADLINE list plus the scale-probe-only entries). Streaming
entries execute eagerly inside their builders (availableNow replay into
a memory sink), so for those the captured plan is the memory-sink scan
— the streaming micro-batch plan is not inspectable this way; they are
annotated as such.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

from graphdb_wikidata_spark.operators import all_queries
from graphdb_wikidata_spark.session import get_spark

PROBE_ONLY = [
    "dedup_clusters",
    "pack_sequences_budget",
    "embedding_kmeans",
    "market_basket_pairs",
    "events_holt_linear_trend",
    "events_hll_registers",
    "bloom_semi_filter_probe",
    "text_winnowing_fingerprints",
    "dedup_sorted_neighborhood",
]


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.dirname(os.path.abspath(__file__))
    spark = get_spark("plan-capture")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()
    if len(sys.argv) > 2:
        names = sys.argv[2:]
    else:
        import bench

        names = [n for n in bench.HEADLINE if n in queries] + PROBE_ONLY
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    for name in names:
        try:
            df = queries[name](spark, sf_dir)
            txt = df._jdf.queryExecution().explainString(mode)
        except Exception as e:  # noqa: BLE001
            txt = f"(plan capture failed: {e})"
        streaming_note = ""
        if name.startswith("stream_"):
            streaming_note = (
                "NOTE: streaming entry — the builder already ran the\n"
                "availableNow replay; this is the memory-sink result scan,\n"
                "not the micro-batch plan.\n\n"
            )
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(f"# {name} ({suffix}) sf_dir={sf_dir}\n\n{streaming_note}{txt}\n")
        print(f"captured {name}")


if __name__ == "__main__":
    main()

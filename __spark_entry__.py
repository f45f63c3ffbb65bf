"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query on sf0.001; ``queries()`` maps
every implemented operator from SURVEY.md §2 (plus the LLM-pipeline
extensions) to a (spark, sf_dir) -> DataFrame callable; ``oracle_sql()``
gives the DuckDB-equivalent ANSI SQL for the hash-match correctness
gate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from graphdb_wikidata_spark.operators import all_oracles, all_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: a SPARQL BGP join through the full engine (parser ->
    algebra -> DataFrame compiler -> Catalyst) over the deterministic
    statements graph at sf0.001 — the reference's own flagship test
    shape (test_requests.txt:29-35)."""
    from graphdb_wikidata_spark.engine.entry_queries import sparql_bgp_join

    return sparql_bgp_join(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return all_queries()


def oracle_sql() -> dict[str, str]:
    return all_oracles()

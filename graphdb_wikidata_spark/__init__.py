"""graphdb_wikidata_spark — a PySpark-native analytics engine.

A brand-new, Spark-first engine with the query and data-processing
capabilities of the reference RDF/SPARQL graph database
(RYZENNAVI/GraphDB-wikidata): a quad-statement data model over Wikidata
dumps, the SPARQL 1.1 algebra re-expressed as DataFrame plans compiled
through Catalyst, plus large-scale data-pipeline extensions (dedup,
similarity search, text analysis, streaming) designed for a
multi-executor cluster at 100 TB scale.

Layout
------
- ``session``    : SparkSession factory with scale-oriented defaults.
- ``tables``     : loaders for the benchmark/test parquet tables.
- ``model``      : the ``statements`` quad schema + term encoding.
- ``ingest``     : Wikidata entity-JSON dump -> statements parquet.
- ``engine``     : SPARQL parser -> algebra -> DataFrame compiler.
- ``operators``  : relational operator library + LLM-pipeline operators
                   (dedup, similarity, text analysis, multimodal).
- ``streaming``  : Structured Streaming operators over event streams.
"""

__version__ = "0.1.0"

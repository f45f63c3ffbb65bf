"""Wikidata entity-JSON dump -> statements DataFrame.

Spark-first re-expression of the reference ingest
(/root/reference/src/parser.rs:377-494): one JSON entity per line;
labels/descriptions/aliases become term edges, claims become named
statement edges (with the '$'->'-' claim-id normalization of
parser.rs:480-483), qualifiers hang off the statement id as subject
(parser.rs:483-492). The reference parallelizes with rayon per line
(parser.rs:419-421); Spark parallelizes by input split for free, so a
multi-TB dump ingests across the whole cluster with no custom code.

Snak decoding follows parser.rs get_datavalue (parser.rs:340-377): the
polymorphic ``datavalue.value`` is captured as a raw JSON string by
``from_json`` and re-parsed per datatype — all JVM-side expressions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..model.schema import COORD_T, QTY_T, STATEMENT_COLUMNS, TIME_T

SNAK_T = (
    "struct<snaktype:string,property:string,datatype:string,"
    "datavalue:struct<value:string,type:string>>"
)
CLAIM_T = (
    f"struct<mainsnak:{SNAK_T},type:string,id:string,rank:string,"
    f"qualifiers:map<string,array<{SNAK_T}>>>"
)
ITEM_T = (
    "struct<id:string,type:string,"
    "labels:map<string,struct<language:string,value:string>>,"
    "descriptions:map<string,struct<language:string,value:string>>,"
    "aliases:map<string,array<struct<language:string,value:string>>>,"
    f"claims:map<string,array<{CLAIM_T}>>>"
)

# kebab-case snak datatypes that carry a plain-string payload, mapped to
# our obj_type subtype (reference NodeType names, mod.rs:54-83)
_STRING_DATATYPES = {
    "string": "string",
    "external-id": "identifier",
    "geo-shape": "geoshape",
    "commonsMedia": "media",
    "url": "url",
    "math": "math",
    "musical-notation": "music",
    "tabular-data": "tabular",
}
_ENTITY_DATATYPES = (
    "wikibase-item",
    "wikibase-property",
    "wikibase-lexeme",
    "wikibase-sense",
    "wikibase-form",
)

_TIME_RE = r"^([+-]\d+)-(\d{2})-(\d{2})T(\d{2}):(\d{2}):(\d{2})Z$"


def _entity_num(id_col: Column) -> Column:
    """'Q31' -> 31; parse failures -> 0, matching str_to_wikidataid's
    ``unwrap_or(0)`` (parser.rs:300-310; 'L123-S4' senses/forms -> 0)."""
    return F.coalesce(
        F.substring(id_col, 2, 1000).try_cast("long"),
        F.lit(0),
    )


def _snak_object(s: Column) -> list[Column]:
    """Decode one snak struct into the obj_* statement columns."""
    has = (s["snaktype"] == "value") & s["datavalue"].isNotNull()
    raw = s["datavalue"]["value"]
    dt = s["datatype"]

    string_subtype = F.create_map(
        *[F.lit(x) for kv in _STRING_DATATYPES.items() for x in kv]
    )[dt]

    ent = F.from_json(raw, "struct<id:string>")["id"]
    ent_kind = F.when(F.substring(ent, 1, 1).isin("Q", "P", "L"), F.substring(ent, 1, 1))
    coord_raw = F.from_json(
        raw, "struct<latitude:double,longitude:double,globe:string,precision:double>"
    )
    qty_raw = F.from_json(
        raw, "struct<amount:string,unit:string,upperBound:string,lowerBound:string>"
    )
    time_raw = F.from_json(
        raw,
        "struct<time:string,timezone:int,before:int,after:int,precision:int,calendarmodel:string>",
    )
    t = time_raw["time"]

    obj_type = (
        F.when(~has, "null")
        .when(string_subtype.isNotNull(), "string")
        .when(dt.isin(*_ENTITY_DATATYPES), F.when(ent_kind.isNotNull(), "entity").otherwise("null"))
        .when(dt == "globe-coordinate", "coord")
        .when(dt == "quantity", "qty")
        .when(dt == "time", "time")
        .when(dt == "monolingualtext", "mono")
        .otherwise("null")
    )
    is_entity = has & dt.isin(*_ENTITY_DATATYPES) & ent_kind.isNotNull()
    is_str = has & string_subtype.isNotNull()
    is_mono = has & (dt == "monolingualtext")
    mono = F.from_json(raw, "struct<text:string,language:string>")

    obj_string = (
        F.when(is_str, raw)
        .when(is_mono, mono["text"])
        .otherwise(F.lit(None).cast("string"))
    )
    # keep the string *subtype* (url/media/identifier/...) in obj_entity_kind?
    # no — subtypes ride in a dedicated column for clarity:
    obj_subtype = F.when(is_str, string_subtype).otherwise(F.lit(None).cast("string"))

    obj_time = F.when(
        has & (dt == "time"),
        F.struct(
            F.regexp_extract(t, _TIME_RE, 1).try_cast("long").alias("year"),
            F.regexp_extract(t, _TIME_RE, 2).try_cast("int").alias("month"),
            F.regexp_extract(t, _TIME_RE, 3).try_cast("int").alias("day"),
            F.regexp_extract(t, _TIME_RE, 4).try_cast("int").alias("hour"),
            F.regexp_extract(t, _TIME_RE, 5).try_cast("int").alias("minute"),
            F.regexp_extract(t, _TIME_RE, 6).try_cast("int").alias("second"),
            time_raw["before"].alias("before"),
            time_raw["after"].alias("after"),
            time_raw["precision"].alias("precision"),
            time_raw["timezone"].alias("tz"),
            time_raw["calendarmodel"].alias("cal"),
        ),
    ).cast(TIME_T)
    obj_qty = F.when(
        has & (dt == "quantity"),
        F.struct(
            qty_raw["amount"].alias("amount"),
            qty_raw["amount"].try_cast("double").alias("amount_d"),
            qty_raw["unit"].alias("unit"),
            qty_raw["lowerBound"].alias("lower"),
            qty_raw["upperBound"].alias("upper"),
        ),
    ).cast(QTY_T)
    obj_coord = F.when(
        has & (dt == "globe-coordinate"),
        F.struct(
            coord_raw["latitude"].alias("lat"),
            coord_raw["longitude"].alias("lon"),
            F.regexp_extract(coord_raw["globe"], r"Q(\d+)$", 1).try_cast("long").alias(
                "globe"
            ),
            coord_raw["precision"].alias("precision"),
        ),
    ).cast(COORD_T)

    return [
        obj_type.alias("obj_type"),
        F.when(is_entity, ent_kind)
        .otherwise(obj_subtype)
        .alias("obj_entity_kind"),
        F.when(is_entity, _entity_num(ent)).alias("obj_entity_id"),
        obj_string.alias("obj_string"),
        F.when(is_mono, mono["language"]).alias("obj_lang"),
        obj_time.alias("obj_time"),
        obj_qty.alias("obj_qty"),
        obj_coord.alias("obj_coord"),
    ]


def _term_edges(items: DataFrame, kind: str, language_filter: list[str] | None) -> DataFrame:
    """labels/descriptions -> one edge per (lang, value); aliases -> one
    edge per value in each language's list (parser.rs:441-474)."""
    field = {"label": "labels", "description": "descriptions", "alias": "aliases"}[kind]
    ex = items.select(
        "subject_kind",
        "subject_id",
        F.explode(F.col("item")[field]).alias("lang", "entry"),
    )
    if language_filter is not None:
        ex = ex.filter(F.col("lang").isin(*language_filter))
    if kind == "alias":
        ex = ex.select(
            "subject_kind", "subject_id", "lang", F.explode("entry").alias("entry")
        )
    return ex.select(
        "subject_kind",
        "subject_id",
        F.lit(None).cast("string").alias("subject_stmt"),
        F.lit(kind).alias("pred_kind"),
        F.lit(None).cast("long").alias("pred_id"),
        F.col("lang").alias("pred_lang"),
        F.lit("string").alias("obj_type"),
        F.lit("string").alias("obj_entity_kind"),
        F.lit(None).cast("long").alias("obj_entity_id"),
        F.col("entry")["value"].alias("obj_string"),
        F.lit(None).cast("string").alias("obj_lang"),
        F.lit(None).cast(TIME_T).alias("obj_time"),
        F.lit(None).cast(QTY_T).alias("obj_qty"),
        F.lit(None).cast(COORD_T).alias("obj_coord"),
        F.concat(
            F.lit("anon-"),
            F.xxhash64("subject_kind", "subject_id", F.lit(kind), "lang", F.col("entry")["value"]).cast(
                "string"
            ),
        ).alias("statement_id"),
    )


def load_dump(
    spark: SparkSession,
    path: str,
    parse_qualifiers: bool = True,
    language_filter: list[str] | None = None,
) -> DataFrame:
    """Parse a Wikidata JSON dump (one entity per line, '['/']' first and
    last lines skipped, trailing commas stripped) into statements."""
    return statements_from_lines(
        spark.read.text(path), parse_qualifiers, language_filter
    )


def statements_from_lines(
    lines: DataFrame,
    parse_qualifiers: bool = True,
    language_filter: list[str] | None = None,
) -> DataFrame:
    """dump lines (one `value` column) -> statements. Every step is a
    narrow transformation (from_json / explode / union — no aggregate,
    no join), so the SAME pipeline runs batch (load_dump) or continuous
    (stream_dump over readStream): the Spark expression of the
    reference's line-at-a-time parser (parser.rs:423-494)."""
    items = (
        lines.select(F.regexp_replace(F.rtrim("value"), r",\s*$", "").alias("line"))
        .filter(F.length("line") > 1)
        .select(F.from_json("line", ITEM_T).alias("item"))
        .filter(F.col("item")["id"].isNotNull())
        .filter(F.substring(F.col("item")["id"], 1, 1).isin("Q", "P", "L"))
        .select(
            F.substring(F.col("item")["id"], 1, 1).alias("subject_kind"),
            _entity_num(F.col("item")["id"]).alias("subject_id"),
            F.col("item"),
        )
    )

    terms = (
        _term_edges(items, "label", language_filter)
        .unionByName(_term_edges(items, "description", language_filter))
        .unionByName(_term_edges(items, "alias", language_filter))
    )

    claims = items.select(
        "subject_kind",
        "subject_id",
        F.explode(F.flatten(F.map_values(F.col("item")["claims"]))).alias("claim"),
    ).select(
        "subject_kind",
        "subject_id",
        F.lit(None).cast("string").alias("subject_stmt"),
        F.lit("P").alias("pred_kind"),
        _entity_num(F.col("claim")["mainsnak"]["property"]).alias("pred_id"),
        F.lit(None).cast("string").alias("pred_lang"),
        *_snak_object(F.col("claim")["mainsnak"]),
        F.regexp_replace(F.col("claim")["id"], r"\$", "-").alias("statement_id"),
        F.col("claim")["qualifiers"].alias("qualifiers"),
    )

    # Wikidata dumps carry no named graphs: everything lands in the
    # default graph (graph_id NULL)
    null_graph = F.lit(None).cast("string").alias("graph_id")
    claim_edges = claims.withColumn("graph_id", null_graph).select(*STATEMENT_COLUMNS)

    out = terms.withColumn("graph_id", null_graph).unionByName(claim_edges)

    if parse_qualifiers:
        quals = (
            claims.filter(F.col("qualifiers").isNotNull())
            .select(
                F.col("statement_id").alias("parent_stmt"),
                F.explode(F.col("qualifiers")).alias("q_prop", "snaks"),
            )
            .select(
                "parent_stmt",
                _entity_num(F.col("q_prop")).alias("pred_id"),
                F.posexplode("snaks").alias("pos", "snak"),
            )
            .select(
                F.lit("stmt").alias("subject_kind"),
                F.lit(None).cast("long").alias("subject_id"),
                F.col("parent_stmt").alias("subject_stmt"),
                F.lit("P").alias("pred_kind"),
                "pred_id",
                F.lit(None).cast("string").alias("pred_lang"),
                *_snak_object(F.col("snak")),
                F.concat(
                    F.lit("anon-"),
                    F.xxhash64("parent_stmt", "pred_id", "pos").cast("string"),
                ).alias("statement_id"),
            )
            .withColumn("graph_id", null_graph)
            .select(*STATEMENT_COLUMNS)
        )
        out = out.unionByName(quals)

    return out


def write_statements(
    df: DataFrame,
    path: str,
    partitions: int | None = None,
    partition_by_pred: bool = False,
) -> None:
    """Persist statements as Parquet. At cluster scale: repartition on
    subject so S-S joins co-locate, sort within partitions on
    (pred_kind, pred_id) so predicate filters hit row-group min/max.

    ``partition_by_pred=True`` additionally writes Hive-style
    ``pred_kind=`` directories: a triple pattern with a bound predicate
    then prunes whole directories before any file is opened
    (PartitionFilters in the scan, asserted in tests/test_ingest.py) —
    the right layout for predicate-heavy workloads, at the cost of one
    directory per predicate kind (a handful: wdt/p/ps/pq/label/...)."""
    w = df
    if partitions:
        w = df.repartition(partitions, "subject_kind", "subject_id")
    w = w.sortWithinPartitions("pred_kind", "pred_id")
    if partition_by_pred:
        w.write.mode("overwrite").partitionBy("pred_kind").parquet(path)
    else:
        w.write.mode("overwrite").parquet(path)


def save_statements_bucketed(
    df: DataFrame, table_name: str, buckets: int = 64
) -> None:
    """Persist statements as a BUCKETED table on the subject key.

    The dominant join of SPARQL BGPs is statements-with-statements on a
    shared subject variable; with both sides bucketed by
    (subject_kind, subject_id), Catalyst plans the sort-merge join with
    NO Exchange — at 100 TB that deletes the largest shuffle of every
    multi-pattern query. This is the Spark-native replacement for the
    reference's pre-sorted quad copies (storage_engine/mod.rs:127-154):
    clustering chosen once at write time, reused by every query.
    (tests/test_bucketing.py asserts the exchange-free plan.)"""
    (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(buckets, "subject_kind", "subject_id")
        .sortBy("subject_kind", "subject_id", "pred_kind", "pred_id")
        .saveAsTable(table_name)
    )


def stream_dump(
    spark: SparkSession,
    src_dir: str,
    parse_qualifiers: bool = True,
    language_filter: list[str] | None = None,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Continuous ingest: watch ``src_dir`` for dump shards and parse
    each into statements as it arrives — the same transformation as
    ``load_dump`` over ``readStream`` (the reference has no streaming
    surface at all; its parallel ingest, parser.rs:419-421, is a batch
    rayon loop). Pair with ``run_stream_to_parquet`` for an exactly-
    once parquet sink: the file source + checkpoint tracks which
    shards are done, so a crashed ingest resumes without re-emitting
    (the property the reference's restart-from-scratch builder lacks).
    """
    reader = spark.readStream
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    lines = reader.text(src_dir)
    return statements_from_lines(lines, parse_qualifiers, language_filter)


def run_stream_to_parquet(
    stream_df: DataFrame, out_path: str, checkpoint: str
) -> None:
    """Drain a streaming statements frame into a parquet directory with
    available-now semantics (process everything currently in the
    source, then stop). Append mode: ingest emits rows only, so no
    state store is involved and the sink scales with input splits."""
    (
        stream_df.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )

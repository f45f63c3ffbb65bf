"""The statements (quad) data model and the canonical term encoding.

Reference data model (SURVEY §1): one logical relation of quads
(Subject, Predicate, Object, StatementID), stored four times in four
sort orders (/root/reference/src/storage_engine/mod.rs:127-154) with
values dictionary-encoded into tagged 64-bit nodes (mod.rs:48-83).

Spark design: ONE ``statements`` DataFrame with typed, flat columns —
dictionary/encoding is Parquet's job, sort orders are replaced by
Catalyst shuffle/broadcast planning plus optional bucketing. Columns:

- subject_kind ('Q','P','L','stmt'), subject_id (entity numeric id),
  subject_stmt (statement id when the subject is a statement node —
  qualifier edges, parser.rs:483-492)
- pred_kind ('P' for claims; 'label'/'description'/'alias' for term
  edges, parser.rs:441-474), pred_id (P-number), pred_lang
- obj_type + typed object branches (entity/string-ish/monolingual/
  quantity/time/coord/null — the 26 node types of mod.rs:54-83
  collapsed to their payload classes)
- statement_id: the quad's ID column (claim id with the '$'->'-' fix,
  parser.rs:480-483; deterministic synthetic ids for term/qualifier
  edges which the reference numbers with an auto-increment)

Variable bindings in query results use ONE canonical struct type
(``TERM_T``) so that join keys, union branches and group keys always
have identical Spark types regardless of which pattern produced them.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

TIME_T = (
    "struct<year:bigint,month:int,day:int,hour:int,minute:int,second:int,"
    "before:int,after:int,precision:int,tz:int,cal:string>"
)
QTY_T = "struct<amount:string,amount_d:double,unit:string,lower:string,upper:string>"
COORD_T = "struct<lat:double,lon:double,globe:bigint,precision:double>"

# t: value class — 'entity','stmt','str','mono','int','double','bool',
#    'time','qty','coord','termpred' (label/description/alias predicate
#    nodes), null struct = unbound/NULL node.
# k: sub-kind — entity kind Q/P/L/Pstmt; string subtype ('string','url',
#    'media','geoshape','tabular','math','music','identifier'); termpred
#    kind ('label','description','alias').
TERM_T = (
    f"struct<t:string,k:string,e:bigint,s:string,lang:string,i:bigint,d:double,"
    f"b:boolean,time:{TIME_T},qty:{QTY_T},coord:{COORD_T}>"
)

TERM_FIELDS = ("t", "k", "e", "s", "lang", "i", "d", "b", "time", "qty", "coord")
_FIELD_TYPES = {
    "t": "string",
    "k": "string",
    "e": "bigint",
    "s": "string",
    "lang": "string",
    "i": "bigint",
    "d": "double",
    "b": "boolean",
    "time": TIME_T,
    "qty": QTY_T,
    "coord": COORD_T,
}

STATEMENT_COLUMNS = [
    "subject_kind",
    "subject_id",
    "subject_stmt",
    "pred_kind",
    "pred_id",
    "pred_lang",
    "obj_type",
    "obj_entity_kind",
    "obj_entity_id",
    "obj_string",
    "obj_lang",
    "obj_time",
    "obj_qty",
    "obj_coord",
    "statement_id",
    # named-graph IRI; NULL = default graph. The reference IR declares
    # a Graph operator but never executes it (calc_data_types.rs:
    # 117-205) — carrying the quad's graph in the schema is what lets
    # GRAPH patterns actually bind here.
    "graph_id",
]


_NULL_CACHE: dict[str, Column] = {}


def _null(field: str) -> Column:
    """Typed-NULL field column, cached: Column objects are immutable
    expression trees, and each fresh build costs several JVM
    round-trips — make_term is called hundreds of times while
    compiling a complex query, mostly for its NULL fields. (Cache
    assumes one JVM gateway per process, which holds for every entry
    point: pytest, driver, bench, server.)"""
    got = _NULL_CACHE.get(field)
    if got is None:
        got = _NULL_CACHE[field] = F.lit(None).cast(_FIELD_TYPES[field]).alias(field)
    return got


def make_term(**kwargs) -> Column:
    """Build a canonical term struct. Unspecified fields are typed
    NULLs, so every call site yields the exact same Spark type."""
    cols = []
    for f in TERM_FIELDS:
        v = kwargs.get(f)
        if v is None:
            cols.append(_null(f))
        elif isinstance(v, Column):
            cols.append(v.cast(_FIELD_TYPES[f]).alias(f))
        else:
            cols.append(F.lit(v).cast(_FIELD_TYPES[f]).alias(f))
    return F.struct(*cols)


def empty_term() -> Column:
    """A NULL of the term type (used to pad OPTIONAL non-matches, like
    the reference pads with Null nodes, materialized_relation.rs:714-743)."""
    return F.lit(None).cast(TERM_T)


def statements_from_quads(spark: SparkSession, quads: list[tuple]) -> DataFrame:
    """Test DSL: build a statements DataFrame from compact quads, the
    Spark analogue of the reference's prefix-quad mini-DSL
    (storage_engine/mod.rs:713-729: "wd:Q1, wdt:P2, wd:Q3, wds:4").

    Each quad is (subject, predicate, object, statement_id) — or a
    5-tuple with a trailing named-graph IRI — where
    - subject: 'Q1' / 'P2' / 'L3' entity token, or ('stmt', id)
    - predicate: 'P2' token, or ('label'|'description'|'alias', lang)
    - object: entity token, python str/int/float/bool, or a dict with a
      'type' key for exotic values
    - statement_id: str or None (auto 'anon-<n>')
    - graph: full IRI string, or absent/None for the default graph
    """
    rows = []
    for n, q in enumerate(quads):
        s, p, o, sid = q[:4]
        row: dict = {c: None for c in STATEMENT_COLUMNS}
        if len(q) > 4:
            row["graph_id"] = q[4]
        if isinstance(s, tuple) and s[0] == "stmt":
            row["subject_kind"] = "stmt"
            row["subject_stmt"] = s[1]
        else:
            row["subject_kind"] = s[0]
            row["subject_id"] = int(s[1:])
        if isinstance(p, tuple):
            row["pred_kind"] = p[0]
            row["pred_lang"] = p[1]
        else:
            row["pred_kind"] = "P"
            row["pred_id"] = int(p[1:])
        if isinstance(o, str) and len(o) > 1 and o[0] in "QPL" and o[1:].isdigit():
            row["obj_type"] = "entity"
            row["obj_entity_kind"] = o[0]
            row["obj_entity_id"] = int(o[1:])
        elif isinstance(o, bool):
            row["obj_type"] = "bool"
            row["obj_string"] = str(o)
        elif isinstance(o, int):
            row["obj_type"] = "int"
            row["obj_string"] = str(o)
        elif isinstance(o, float):
            row["obj_type"] = "double"
            row["obj_string"] = repr(o)
        elif isinstance(o, dict):
            row["obj_type"] = o["type"]
            row.update({k: v for k, v in o.items() if k != "type"})
        else:
            row["obj_type"] = "string"
            row["obj_string"] = str(o)
        row["statement_id"] = sid if sid is not None else f"anon-{n}"
        rows.append(tuple(row[c] for c in STATEMENT_COLUMNS))

    schema = (
        "subject_kind string, subject_id long, subject_stmt string,"
        "pred_kind string, pred_id long, pred_lang string,"
        "obj_type string, obj_entity_kind string, obj_entity_id long,"
        "obj_string string, obj_lang string,"
        f"obj_time {TIME_T}, obj_qty {QTY_T}, obj_coord {COORD_T},"
        "statement_id string, graph_id string"
    )
    df = spark.createDataFrame(rows, schema=schema)
    # int/double/bool objects arrive via obj_string for createDataFrame
    # simplicity; normalize them into typed columns is the scan's job —
    # here we leave obj_string carrying the lexical form.
    return df

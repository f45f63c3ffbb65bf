"""W3C SPARQL 1.1 results-format conformance goldens (VERDICT r05 #8).

Byte-exact fixtures for the four serializers over one result set that
hits the spec's corner cases — IRI, plain literal with quote/comma/
newline, lang-tagged literal, xsd:integer/double/boolean typed
literals, and an unbound variable — modeled on the examples in
"SPARQL 1.1 Query Results JSON Format" §4, "SPARQL 1.1 Query Results
CSV and TSV Formats" §3-4, and "SPARQL Query Results XML Format" §2.
The reference serializes JSON only (to_json_result.rs:33-103); the
other three formats are extensions held to the same W3C text.
"""

from __future__ import annotations

import json
import xml.etree.ElementTree as ET

import pytest
from pyspark.sql import functions as F

from graphdb_wikidata_spark.engine.json_result import (
    to_sparql_csv,
    to_sparql_json,
    to_sparql_tsv,
    to_sparql_xml,
)
from graphdb_wikidata_spark.model.schema import TERM_T, make_term

XSD = "http://www.w3.org/2001/XMLSchema#"
WD = "http://www.wikidata.org/entity/"


@pytest.fixture(scope="module")
def result_df(spark):
    """One binding row exercising every cell class + one unbound var."""
    return spark.range(1).select(
        make_term(t="entity", k="Q", e=42).alias("x"),
        make_term(t="str", k="string", s='say "hi", ok\nnewline').alias("s"),
        make_term(t="mono", s="bonjour", lang="fr").alias("m"),
        make_term(t="int", i=42).alias("i"),
        make_term(t="double", d=4.25).alias("d"),
        make_term(t="bool", b=True).alias("bl"),
        F.lit(None).cast(TERM_T).alias("u"),
    )


def test_json_golden(result_df):
    got = json.loads(to_sparql_json(result_df))
    assert got == {
        "head": {"vars": ["x", "s", "m", "i", "d", "bl", "u"]},
        "results": {
            "bindings": [
                {
                    "x": {"type": "uri", "value": WD + "Q42"},
                    "s": {"type": "literal", "value": 'say "hi", ok\nnewline'},
                    "m": {"type": "literal", "value": "bonjour", "xml:lang": "fr"},
                    "i": {
                        "type": "literal",
                        "value": "42",
                        "datatype": XSD + "integer",
                    },
                    "d": {
                        "type": "literal",
                        "value": "4.25",
                        "datatype": XSD + "double",
                    },
                    "bl": {
                        "type": "literal",
                        "value": "true",
                        "datatype": XSD + "boolean",
                    },
                    # unbound var: binding simply absent (JSON fmt §4.2)
                }
            ]
        },
    }


def test_csv_golden(result_df):
    # CSV fmt §3: bare lexical forms, RFC 4180 quoting (embedded
    # quote doubled, field quoted on comma/quote/newline), CRLF rows,
    # unbound -> empty field
    assert to_sparql_csv(result_df) == (
        "x,s,m,i,d,bl,u\r\n"
        + WD
        + 'Q42,"say ""hi"", ok\nnewline",bonjour,42,4.25,true,\r\n'
    )


def test_tsv_golden(result_df):
    # TSV fmt §4: ?-prefixed header, Turtle-ish terms — IRI in <>,
    # escaped quoted literal, @lang, bare numeric/boolean literals,
    # unbound -> empty field
    assert to_sparql_tsv(result_df) == (
        "?x\t?s\t?m\t?i\t?d\t?bl\t?u\n"
        "<" + WD + 'Q42>\t"say \\"hi\\", ok\\nnewline"\t"bonjour"@fr\t'
        "42\t4.25\ttrue\t\n"
    )


def test_xml_golden(result_df):
    got = to_sparql_xml(result_df)
    assert got == (
        '<?xml version="1.0"?>'
        '<sparql xmlns="http://www.w3.org/2005/sparql-results#">'
        '<head><variable name="x"/><variable name="s"/><variable name="m"/>'
        '<variable name="i"/><variable name="d"/><variable name="bl"/>'
        '<variable name="u"/></head><results><result>'
        '<binding name="x"><uri>' + WD + "Q42</uri></binding>"
        '<binding name="s"><literal>say "hi", ok\nnewline</literal></binding>'
        '<binding name="m"><literal xml:lang="fr">bonjour</literal></binding>'
        '<binding name="i"><literal datatype="' + XSD + 'integer">42</literal>'
        "</binding>"
        '<binding name="d"><literal datatype="' + XSD + 'double">4.25</literal>'
        "</binding>"
        '<binding name="bl"><literal datatype="' + XSD + 'boolean">true'
        "</literal></binding>"
        "</result></results></sparql>"
    )
    # and it parses as XML with the W3C results namespace
    root = ET.fromstring(got)
    assert root.tag == "{http://www.w3.org/2005/sparql-results#}sparql"


def test_xml_escapes_markup_and_attr(spark):
    df = spark.range(1).select(
        make_term(t="str", k="string", s="a <b> & 'c' \"d\"").alias("v"),
        make_term(t="mono", s="x", lang='fr"]').alias("w"),
    )
    got = to_sparql_xml(df)
    assert "<literal>a &lt;b&gt; &amp; 'c' \"d\"</literal>" in got
    # attribute value with a quote must be quoteattr'd, not raw
    assert 'xml:lang=\'fr"]\'' in got
    ET.fromstring(got)  # well-formed


def test_csv_crlf_only_quoted_when_needed(spark):
    df = spark.range(1).select(
        make_term(t="str", k="string", s="plain").alias("a"),
        make_term(t="str", k="string", s="has\rcarriage").alias("b"),
    )
    out = to_sparql_csv(df)
    # plain fields unquoted; CR forces quoting per RFC 4180
    assert out == 'a,b\r\nplain,"has\rcarriage"\r\n'


def test_tsv_backslash_escape_roundtrip(spark):
    df = spark.range(1).select(
        make_term(t="str", k="string", s='back\\slash "q"\nnl').alias("v"),
    )
    line = to_sparql_tsv(df).splitlines()[1]
    assert line == '"back\\\\slash \\"q\\"\\nnl"'

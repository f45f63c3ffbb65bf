"""Live HTTP SERVICE federation (engine/federation.py).

The reference panics on every non-label SERVICE IRI
(interpreter.rs:655-659); in-process federation (test_service.py)
covers the compositional semantics, and this file covers the real
network path: a loopback ``http.server`` speaks the SPARQL Protocol
(POST form-encoded query, ``application/sparql-results+json``) and the
engine — with ``allow_remote_services`` opted in — joins its bindings
into the outer query.
"""

from __future__ import annotations

import json
import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from graphdb_wikidata_spark.engine import GraphEngine
from graphdb_wikidata_spark.engine import federation
from graphdb_wikidata_spark.model.schema import statements_from_quads

LOCAL_QUADS = [
    ("Q1", "P1", "Q2", "s1"),
    ("Q3", "P1", "Q4", "s2"),
    ("Q5", "P1", "Q6", "s3"),
]

# remote endpoint knows labels/populations for some objects; one row
# leaves ?pop unbound and one term is lang-tagged to exercise the full
# JSON-term mapping (uri / plain / lang / typed int)
REMOTE_DOC = {
    "head": {"vars": ["o", "name", "pop"]},
    "results": {
        "bindings": [
            {
                "o": {"type": "uri", "value": "http://www.wikidata.org/entity/Q2"},
                "name": {"type": "literal", "value": "Earth", "xml:lang": "en"},
                "pop": {
                    "type": "literal",
                    "value": "8000000000",
                    "datatype": "http://www.w3.org/2001/XMLSchema#integer",
                },
            },
            {
                "o": {"type": "uri", "value": "http://www.wikidata.org/entity/Q6"},
                "name": {"type": "literal", "value": "Six"},
            },
        ]
    },
}


class _Handler(BaseHTTPRequestHandler):
    seen: list[dict] = []  # (class attr: queries the server received)

    def do_POST(self):  # noqa: N802 - http.server API
        body = self.rfile.read(int(self.headers.get("Content-Length", 0)))
        form = urllib.parse.parse_qs(body.decode())
        type(self).seen.append(
            {"query": form.get("query", [""])[0], "accept": self.headers.get("Accept")}
        )
        payload = json.dumps(REMOTE_DOC).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/sparql-results+json")
        self.send_header("Content-Length", str(len(payload)))
        self.end_headers()
        self.wfile.write(payload)

    def log_message(self, *a):  # silence per-request stderr noise
        pass


@pytest.fixture(scope="module")
def endpoint():
    srv = HTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_port}/sparql"
    srv.shutdown()


@pytest.fixture()
def eng(spark):
    return GraphEngine(spark, statements_from_quads(spark, LOCAL_QUADS))


def test_remote_service_joins(eng, endpoint):
    eng.allow_remote_services(True)
    rows = eng.sql(
        f"""
        SELECT ?s ?o ?name ?pop WHERE {{
          ?s wdt:P1 ?o .
          SERVICE <{endpoint}> {{ ?o rdfs:label ?name . }}
        }}
        """
    ).collect()
    got = sorted(
        (r["s"]["e"], r["o"]["e"], r["name"]["s"], r["name"]["lang"],
         r["pop"]["i"] if r["pop"] is not None else None)
        for r in rows
    )
    assert got == [(1, 2, "Earth", "en", 8000000000), (5, 6, "Six", None, None)]
    # the endpoint received SELECT * over the verbatim body, with the
    # prefix header so rdfs: resolves remotely
    q = _Handler.seen[-1]["query"]
    assert "SELECT * WHERE { ?o rdfs:label ?name . }" in q
    assert "PREFIX rdfs:" in q
    assert _Handler.seen[-1]["accept"] == "application/sparql-results+json"


def test_remote_requires_opt_in(eng, endpoint):
    with pytest.raises(KeyError, match="allow_remote_services"):
        eng.sql(f"SELECT ?o WHERE {{ SERVICE <{endpoint}> {{ ?o rdfs:label ?n . }} }}")


def test_allowlist(eng, endpoint):
    eng.allow_remote_services([endpoint])
    assert eng.sql(
        f"SELECT ?o WHERE {{ SERVICE <{endpoint}> {{ ?o rdfs:label ?n . }} }}"
    ).count() == 2
    # an IRI off the allowlist behaves exactly like remote-disabled
    with pytest.raises(KeyError, match="not registered"):
        eng.sql(
            "SELECT ?o WHERE { SERVICE <http://127.0.0.1:1/sparql> { ?o rdfs:label ?n . } }"
        )


def test_registered_service_takes_precedence(spark, eng, endpoint):
    eng.allow_remote_services(True)
    eng.register_service(endpoint, statements_from_quads(spark, [("Q2", "P9", "Q100", "r1")]))
    n_seen = len(_Handler.seen)
    rows = eng.sql(
        f"SELECT ?a ?b WHERE {{ SERVICE <{endpoint}> {{ ?a wdt:P9 ?b . }} }}"
    ).collect()
    assert [(r["a"]["e"], r["b"]["e"]) for r in rows] == [(2, 100)]
    assert len(_Handler.seen) == n_seen  # no HTTP call happened


def test_silent_network_failure_is_unit_solution(eng):
    eng.allow_remote_services(True)
    rows = eng.sql(
        """
        SELECT ?s ?x WHERE {
          ?s wdt:P1 ?o .
          SERVICE SILENT <http://127.0.0.1:1/sparql> { ?o wdt:P9 ?x . }
        }
        """
    ).collect()
    assert sorted(r["s"]["e"] for r in rows) == [1, 3, 5]
    assert all(r["x"] is None for r in rows)


def test_loud_network_failure_raises(eng):
    eng.allow_remote_services(True)
    with pytest.raises(federation.FederationError, match="failed"):
        eng.sql(
            "SELECT ?x WHERE { SERVICE <http://127.0.0.1:1/sparql> { ?x wdt:P9 ?y . } }"
        )


def test_row_cap(eng, endpoint, monkeypatch):
    eng.allow_remote_services(True)
    monkeypatch.setattr(federation, "MAX_REMOTE_ROWS", 1)
    with pytest.raises(federation.FederationError, match="cap"):
        eng.sql(f"SELECT ?o WHERE {{ SERVICE <{endpoint}> {{ ?o rdfs:label ?n . }} }}")


def test_large_inline_table_path(eng):
    # >32 remote rows take the createDataFrame fast path in _c_values
    # (one local relation, not a per-row union)
    doc = {
        "head": {"vars": ["o", "n"]},
        "results": {
            "bindings": [
                {
                    "o": {"type": "uri",
                          "value": f"http://www.wikidata.org/entity/Q{i}"},
                    "n": {"type": "literal", "value": str(i),
                          "datatype": "http://www.w3.org/2001/XMLSchema#integer"},
                }
                for i in range(2, 100)
            ]
        },
    }
    eng.allow_remote_services(True)

    def fake_post(iri, query, timeout):
        return json.dumps(doc).encode()

    orig = federation._http_post
    federation._http_post = fake_post
    try:
        rows = eng.sql(
            """
            SELECT ?s ?n WHERE {
              ?s wdt:P1 ?o .
              SERVICE <http://fake.example/sparql> { ?o rdfs:label ?n . }
            }
            """
        ).collect()
    finally:
        federation._http_post = orig
    assert sorted((r["s"]["e"], r["n"]["i"]) for r in rows) == [(1, 2), (3, 4), (5, 6)]


def test_bnode_and_unknown_type():
    assert federation._json_term({"type": "bnode", "value": "b0"}).s == "_:b0"
    with pytest.raises(federation.FederationError, match="unknown"):
        federation._json_term({"type": "frob", "value": "x"})


def test_server_federation_flag_wires_allowlist(monkeypatch):
    """--federation on the server subcommand maps to
    allow_remote_services: bare flag -> True, IRIs -> frozenset."""
    import graphdb_wikidata_spark.__main__ as cli

    seen = {}

    class FakeEngine:
        def allow_remote_services(self, endpoints=True):
            seen["endpoints"] = endpoints
            return self

        def warm(self):
            return self

    class FakeServer:
        server_port = 0

        def serve_forever(self):
            raise KeyboardInterrupt  # return immediately

    monkeypatch.setattr(
        "graphdb_wikidata_spark.engine.GraphEngine.from_parquet",
        staticmethod(lambda spark, path: FakeEngine()),
    )
    monkeypatch.setattr(
        "graphdb_wikidata_spark.server.run_server",
        lambda engine, host, port: FakeServer(),
    )
    assert cli.main(["server", "--federation", "http://a/sparql"]) == 0
    assert seen["endpoints"] == ["http://a/sparql"]
    assert cli.main(["server", "--federation"]) == 0
    assert seen["endpoints"] is True
    seen.clear()
    assert cli.main(["server"]) == 0
    assert "endpoints" not in seen  # off by default


def test_raw_body_capture_nested_groups():
    """The parser's raw-span capture must cover NESTED groups (OPTIONAL,
    FILTER, sub-groups) inside the SERVICE body, verbatim."""
    from graphdb_wikidata_spark.engine.parser import parse_query

    plan = parse_query(
        """
        SELECT ?s WHERE {
          SERVICE <https://example.org/sparql> {
            ?s wdt:P31 ?c .
            OPTIONAL { ?s rdfs:label ?l . FILTER(LANG(?l) = "en") }
          }
        }
        """
    )

    def find_service(op):
        if type(op).__name__ == "Service":
            return op
        for f in getattr(op, "__dataclass_fields__", {}):
            v = getattr(op, f)
            if hasattr(v, "__dataclass_fields__"):
                r = find_service(v)
                if r is not None:
                    return r
        return None

    svc = find_service(plan)
    assert svc is not None
    q = svc.remote_query
    assert q is not None and q.count("{") == q.count("}")
    assert "OPTIONAL { ?s rdfs:label ?l . FILTER(LANG(?l) = \"en\") }" in q
    assert q.rstrip().endswith("}")
    # non-http IRIs never build a remote query
    plan2 = parse_query(
        "SELECT ?s WHERE { SERVICE <urn:my-dataset> { ?s wdt:P31 ?c . } }"
    )
    svc2 = find_service(plan2)
    assert svc2 is not None and svc2.remote_query is None


def test_remote_service_not_plan_cached(eng, endpoint):
    """A plan embedding a remote fetch is a network snapshot: each
    identical query must re-fetch (stale-federation fix), while a
    purely local query still hits the plan cache."""
    eng.allow_remote_services(True)
    q = f"""
        SELECT ?s ?o ?name WHERE {{
          ?s wdt:P1 ?o .
          SERVICE <{endpoint}> {{ ?o rdfs:label ?name }}
        }}"""
    before = len(_Handler.seen)
    eng.sql(q)
    eng.sql(q)
    assert len(_Handler.seen) == before + 2, "remote SERVICE plan was cached"
    # local queries still cache (one compile, one object)
    lq = "SELECT ?s WHERE { ?s wdt:P1 ?o }"
    assert eng.sql(lq) is eng.sql(lq)


def test_malformed_binding_cell_silent_unit_solution(eng, monkeypatch):
    """Null / value-less cells must surface as FederationError, so
    SILENT yields the unit solution instead of a raw AttributeError."""
    bad = {
        "head": {"vars": ["name"]},
        "results": {"bindings": [{"name": None}, {"name": {"type": "literal"}}]},
    }

    def fake_post(iri, query, timeout):
        return json.dumps(bad).encode()

    monkeypatch.setattr(federation, "_http_post", fake_post)
    eng.allow_remote_services(True)
    rows = eng.sql(
        """
        SELECT ?s ?name WHERE {
          ?s wdt:P1 ?o .
          SERVICE SILENT <http://bad.example/sparql> { ?o rdfs:label ?name }
        }"""
    ).collect()
    assert rows  # unit solution joined: local rows survive, name unbound
    assert all(r.name is None for r in rows)
    with pytest.raises(federation.FederationError, match="malformed binding cell"):
        eng.sql(
            """
            SELECT ?name WHERE {
              ?s wdt:P1 ?o .
              SERVICE <http://bad.example/sparql> { ?o rdfs:label ?name }
            }"""
        )


class _Misbehaving(BaseHTTPRequestHandler):
    """Endpoint whose response is set per test: (status, body bytes)."""

    status = 200
    body = b"{}"

    def do_POST(self):  # noqa: N802 - http.server API
        self.rfile.read(int(self.headers.get("Content-Length", 0)))
        self.send_response(type(self).status)
        self.send_header("Content-Type", "application/sparql-results+json")
        self.send_header("Content-Length", str(len(type(self).body)))
        self.end_headers()
        self.wfile.write(type(self).body)

    def log_message(self, *a):
        pass


@pytest.fixture(scope="module")
def bad_endpoint():
    srv = HTTPServer(("127.0.0.1", 0), _Misbehaving)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_port}/sparql"
    srv.shutdown()


@pytest.mark.parametrize(
    "status,body",
    [
        (404, b"not here"),
        (500, b"boom"),
        (503, b"try later"),
        (200, b"this is not json"),
        (200, b'{"head": {"vars": ["x"]}, "results"'),  # truncated JSON
        (200, b'{"head": {"vars": ["x"]}}'),  # missing results key
        (200, b'{"results": {"bindings": "nope"}}'),  # wrong bindings type
    ],
)
def test_non200_and_malformed_payload_matrix(eng, bad_endpoint, status, body):
    """VERDICT r06 #8: the remote SERVICE path is the engine's only
    network IO — every non-200 status and malformed-payload shape must
    surface as FederationError (so SILENT degrades to the unit
    solution) rather than leaking urllib/json internals."""
    _Misbehaving.status, _Misbehaving.body = status, body
    eng.allow_remote_services(True)
    with pytest.raises(federation.FederationError):
        eng.sql(
            f"SELECT ?x WHERE {{ SERVICE <{bad_endpoint}> {{ ?x wdt:P9 ?y . }} }}"
        )
    # SILENT: same failure becomes the unit solution joined with local rows
    rows = eng.sql(
        f"""
        SELECT ?s ?x WHERE {{
          ?s wdt:P1 ?o .
          SERVICE SILENT <{bad_endpoint}> {{ ?o wdt:P9 ?x . }}
        }}"""
    ).collect()
    assert sorted(r["s"]["e"] for r in rows) == [1, 3, 5]
    assert all(r["x"] is None for r in rows)

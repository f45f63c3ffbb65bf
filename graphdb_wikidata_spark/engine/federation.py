"""HTTP SPARQL federation: fetch ``SERVICE <http://...>`` solutions.

The reference declares Service in its IR but panics on every IRI other
than ``wikibase:label`` (interpreter.rs:655-659). In-plan federation
(``GraphEngine.register_service``) already covers the compositional
semantics; this module adds the real-network path: an unregistered
``http(s)://`` SERVICE IRI is queried over the SPARQL Protocol
(POST, ``application/sparql-results+json``) and its bindings join the
outer query as an inline VALUES table.

Scale posture: remote results are driver-materialized by necessity —
every federation engine does this, because the remote endpoint is the
bottleneck, not the cluster — so the fetch is bounded by
``MAX_REMOTE_ROWS`` (FederationError beyond it, mirroring the HTTP
server's own ``max_result_rows``/413 cap) and the resulting inline
table is small enough for Catalyst to broadcast into the join.

Only the Python standard library is used (urllib); tests exercise the
real HTTP path against a loopback ``http.server``.
"""

from __future__ import annotations

import json
import urllib.parse
import urllib.request

from .terms import Term, parse_iri, parse_literal

MAX_REMOTE_ROWS = 100_000
HTTP_TIMEOUT_S = 30.0


class FederationError(RuntimeError):
    """A remote SERVICE call failed (network, HTTP status, bad payload,
    or result too large). Under SERVICE SILENT the compiler converts
    this into the unit solution per SPARQL 1.1 Federated Query §2.3."""


def _http_post(iri: str, query: str, timeout: float) -> bytes:
    """POST the query per SPARQL Protocol §2.1.2 (urlencoded form).

    Module-level so tests (or embedders) can monkeypatch the transport
    without touching the parsing/term-mapping logic below.
    """
    data = urllib.parse.urlencode({"query": query}).encode()
    req = urllib.request.Request(
        iri,
        data=data,
        headers={
            "Accept": "application/sparql-results+json",
            "Content-Type": "application/x-www-form-urlencoded",
            "User-Agent": "graphdb-wikidata-spark (SPARQL federation)",
        },
    )
    with urllib.request.urlopen(req, timeout=timeout) as resp:  # nosec B310
        return resp.read()


def _json_term(cell: dict) -> Term:
    """SPARQL JSON results term -> engine Term.

    uri -> parse_iri (wd:/wdt:/wds: recognition included, so remote
    Wikidata entities join local ones by entity id); literal ->
    parse_literal (lang-tagged -> monolingual, numeric datatypes ->
    int/double, unknown datatype -> null node — identical to local
    literal ingestion); bnode -> a string term carrying the ``_:``
    label (remote bnode identity is scoped to the response anyway).
    ``typed-literal`` is the legacy Virtuoso spelling of literal.
    """
    typ = cell.get("type")
    if typ == "uri":
        return parse_iri(cell["value"])
    if typ == "bnode":
        return Term(t="str", k="string", s="_:" + str(cell["value"]))
    if typ in ("literal", "typed-literal"):
        return parse_literal(
            str(cell["value"]), cell.get("xml:lang"), cell.get("datatype")
        )
    raise FederationError(f"unknown SPARQL JSON term type: {typ!r}")


def fetch_service_solutions(
    iri: str,
    query: str,
    *,
    timeout: float | None = None,
    max_rows: int | None = None,
    fetcher=None,
):
    """Run ``query`` against the remote endpoint; return
    ``(variables, rows)`` where each row is a tuple of Term-or-None
    (None = the variable is unbound in that solution — exactly the
    VALUES UNDEF encoding, so the compiler can reuse its inline-table
    path, compatibility-join semantics included).
    """
    # module attributes resolved at call time so deployments (and
    # tests) can tune the caps after import
    timeout = HTTP_TIMEOUT_S if timeout is None else timeout
    max_rows = MAX_REMOTE_ROWS if max_rows is None else max_rows
    try:
        payload = (fetcher or _http_post)(iri, query, timeout)
        doc = json.loads(payload)
    except FederationError:
        raise
    except Exception as exc:  # URLError, HTTPError, JSON, timeout...
        raise FederationError(f"SERVICE <{iri}> failed: {exc}") from exc
    try:
        variables = [str(v) for v in doc["head"]["vars"]]
        bindings = doc["results"]["bindings"]
    except (KeyError, TypeError) as exc:
        raise FederationError(
            f"SERVICE <{iri}> returned malformed SPARQL JSON: missing {exc}"
        ) from exc
    if len(bindings) > max_rows:
        raise FederationError(
            f"SERVICE <{iri}> returned {len(bindings)} rows; cap is "
            f"{max_rows} (MAX_REMOTE_ROWS)"
        )
    rows = []
    try:
        for b in bindings:
            rows.append(
                tuple(None if v not in b else _json_term(b[v]) for v in variables)
            )
    except Exception as exc:  # null cells, missing "value"/"type", non-dict rows
        raise FederationError(
            f"SERVICE <{iri}> returned malformed binding cell: {exc}"
        ) from exc
    return variables, rows

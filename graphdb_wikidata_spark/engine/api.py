"""Public engine API: the Spark-native face of the reference's three
entry points (SURVEY §3 — HTTP query, CLI, ingest). The HTTP/CLI
wrappers call ``GraphEngine.sql_json`` / ``GraphEngine.sql``."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .compiler import Compiler
from .json_result import to_sparql_csv, to_sparql_json, to_sparql_tsv
from .parser import parse_query
from .scan import scan_pattern as _scan
from .algebra import TriplePattern, Var
from .terms import Term, parse_iri

#: how long a thread waits on another thread's in-flight compile of the
#: same query. Compiles that materialize a path closure can run minutes
#: at warehouse scale; beyond this something is wedged and failing the
#: waiter beats blocking an HTTP handler forever.
COMPILE_WAIT_TIMEOUT_S = 600


class GraphEngine:
    """A SPARQL engine over a statements DataFrame.

    >>> eng = GraphEngine(spark, statements_df)
    >>> eng.sql("SELECT ?s ?p ?o WHERE { ?s ?p ?o }").count()
    """

    def __init__(
        self,
        spark: SparkSession,
        statements: DataFrame,
        union_stmt_forms: bool = False,
    ):
        from .scan import ensure_term_columns

        self.spark = spark
        # precompute the term-struct columns once (plan-build cost, see
        # ensure_term_columns). Callers that persist should persist the
        # FLAT frame and let this augment on top: the columnar cache
        # stores the nested term structs an order of magnitude more
        # slowly than it stores flat quads (measured in
        # entry_queries._engine), while rebuilding them per scan is a
        # few codegen'd CASE WHENs.
        self.statements = ensure_term_columns(statements)
        self.union_stmt_forms = union_stmt_forms
        self._compiler = Compiler(spark, self.statements, union_stmt_forms)
        # compiled-plan cache: SPARQL text -> DataFrame. Compilation is
        # pure driver-side work (parse -> algebra -> Catalyst plan
        # build, 0.3-1s for complex queries — serial Amdahl time at
        # 1000 executors); the resulting DataFrame is immutable and
        # lazily re-executed per action, so reuse is safe. Keyed also
        # on the custom-function/aggregate registry generation and the
        # SERVICE registration generation, so re-registration
        # invalidates affected plans.
        import threading

        self._plan_cache: dict = {}
        self._plan_cache_lock = threading.Lock()  # ThreadingHTTPServer
        # per-key in-flight compiles: a thundering herd of identical
        # queries on the HTTP server compiles ONCE and the rest wait on
        # the winner's Future (compiles can cost 0.3-1s, and path
        # closures execute data-sized work during compile)
        self._inflight: dict = {}
        self._svc_generation = 0

    @classmethod
    def from_parquet(cls, spark: SparkSession, path: str) -> "GraphEngine":
        return cls(spark, spark.read.parquet(path))

    @classmethod
    def from_dump(cls, spark: SparkSession, path: str, **kwargs) -> "GraphEngine":
        from ..ingest import load_dump

        return cls(spark, load_dump(spark, path, **kwargs))

    def warm(self) -> "GraphEngine":
        """Materialize the statements relation (if persisted) and the
        per-predicate statistics, so first-query latency measures query
        execution rather than one-time table/stats builds."""
        self.statements.count()
        self._compiler.stats()
        return self

    def plan(self, query: str):
        return parse_query(query)

    def register_function(self, iri: str, fn, kind: str = "string") -> "GraphEngine":
        """Register a custom SPARQL extension function callable as
        ``<iri>(args...)`` in queries (the hook the reference declares
        but panics on — interpreter.rs:655-659, calc_engine.rs:2930).

        ``fn`` is any Column builder — including a ``pandas_udf`` —
        and ``kind`` picks the term/value convention ('string',
        'numeric', 'bool', or 'term' for raw term structs); see
        expressions.register_custom_function. The registry is
        process-wide (like ``spark.udf.register``), so two engines in
        one process share it."""
        from .expressions import register_custom_function

        register_custom_function(iri, fn, kind)
        return self

    def unregister_function(self, iri: str) -> "GraphEngine":
        from .expressions import unregister_custom_function

        unregister_custom_function(iri)
        return self

    def register_aggregate(self, iri: str, fn, kind: str = "numeric") -> "GraphEngine":
        """Register a custom SPARQL AGGREGATE callable as
        ``(<iri>(?x) AS ?v)`` in queries — the reference's other
        declared-but-todo hook (calc_engine.rs:877-879). ``fn`` is an
        aggregate Column builder: a builtin (``F.median``) or a
        ``pandas_udf(..., functionType=GROUPED_AGG)``; ``kind`` is
        'numeric' | 'int' | 'string' | 'term'. Registration is parse
        time — register before ``sql()``. Process-wide, like
        register_function."""
        from .expressions import register_custom_aggregate

        register_custom_aggregate(iri, fn, kind)
        return self

    def unregister_aggregate(self, iri: str) -> "GraphEngine":
        from .expressions import unregister_custom_aggregate

        unregister_custom_aggregate(iri)
        return self

    def register_service(self, iri: str, statements) -> "GraphEngine":
        """Register a dataset for ``SERVICE <iri> { ... }`` federation
        (reference: declares Service in the IR but panics on every
        non-label SERVICE IRI — interpreter.rs:655-659).

        ``statements`` is a statements DataFrame (any source: parquet,
        another engine's graph, JDBC) or another ``GraphEngine``.
        Unlike HTTP federation, the service executes in-plan: Catalyst
        sees one DAG and can broadcast either side of the service
        join. Per-engine, unlike the function registries."""
        if isinstance(statements, GraphEngine):
            statements = statements.statements
        from .scan import ensure_term_columns

        self._compiler.services[iri] = ensure_term_columns(statements)
        self._svc_generation += 1
        return self

    def unregister_service(self, iri: str) -> "GraphEngine":
        self._compiler.services.pop(iri, None)
        self._compiler._svc_stats.pop(iri, None)
        self._svc_generation += 1
        return self

    def allow_remote_services(self, endpoints=True) -> "GraphEngine":
        """Opt in to live HTTP federation: an UNregistered
        ``SERVICE <http(s)://...>`` IRI is then queried over the SPARQL
        Protocol and its bindings join in-plan as an inline table
        (engine/federation.py; the reference panics on every non-label
        SERVICE IRI — interpreter.rs:655-659).

        ``endpoints``: ``True`` allows any http(s) IRI; an iterable of
        IRIs installs an allowlist (the Jena ``arq:serviceAllowList`` /
        WDQS federation-whitelist posture — the right default for a
        shared endpoint, where arbitrary-URL fetch from query text is
        SSRF); ``False`` disables (the default posture). Registered
        in-process services always take precedence. Remote results are
        driver-materialized and capped (federation.MAX_REMOTE_ROWS):
        at cluster scale the remote endpoint is the bottleneck, so the
        fetched bindings are broadcast-sized by construction."""
        if endpoints is True or endpoints is False:
            self._compiler.remote_allowed = endpoints
        else:
            self._compiler.remote_allowed = frozenset(endpoints)
        self._svc_generation += 1  # invalidate cached plans
        return self

    def _fresh_compiler(self) -> Compiler:
        """A private Compiler per compile: compilation mutates scoping
        context (_dataset_ctx / _graph_ctx / the SERVICE statements
        swap), so concurrent sql() calls on a shared instance would
        bleed scopes into each other's plans — and path queries execute
        their closure DURING compile, so a lock would serialize
        data-sized work behind one slow query. A fresh instance gives
        each compile private context with zero contention; the
        expensive state — per-predicate stats, the SERVICE registry and
        its stats memo — is shared by reference (GIL-atomic dict ops;
        a rare duplicate stats computation is idempotent), and freshly
        computed stats are published back to the long-lived compiler."""
        base = self._compiler
        c = Compiler(self.spark, self.statements, self.union_stmt_forms)
        c._pred_stats = base._pred_stats
        c.services = base.services
        c._svc_stats = base._svc_stats
        c.remote_allowed = base.remote_allowed
        return c

    def sql(
        self,
        query: str,
        default_graphs: "tuple[str, ...] | None" = None,
        named_graphs: "tuple[str, ...] | None" = None,
    ) -> DataFrame:
        """SPARQL -> DataFrame of term-struct columns (one per
        projected variable).

        ``default_graphs`` / ``named_graphs`` are the SPARQL 1.1
        Protocol dataset parameters (``default-graph-uri`` /
        ``named-graph-uri``); when either is given they OVERRIDE any
        FROM / FROM NAMED in the query text (Protocol §2.1.4)."""
        from .expressions import REGISTRY_GENERATION

        key = (
            query,
            tuple(default_graphs) if default_graphs is not None else None,
            tuple(named_graphs) if named_graphs is not None else None,
            REGISTRY_GENERATION,
            self._svc_generation,
        )
        from concurrent.futures import Future

        with self._plan_cache_lock:
            hit = self._plan_cache.get(key)
            if hit is not None:
                return hit
            fut = self._inflight.get(key)
            if fut is None:
                fut = Future()
                self._inflight[key] = fut
                owner = True
            else:
                owner = False
        if not owner:
            # identical query already compiling on another thread: wait
            # for its plan instead of duplicating 0.3-1s of compile (and
            # any closure materialization) per concurrent duplicate. The
            # timeout bounds the damage if an owner thread dies without
            # resolving (a wedged key would otherwise block every later
            # identical query forever).
            return fut.result(timeout=COMPILE_WAIT_TIMEOUT_S)
        try:
            df, cacheable = self._compile_uncached(query, default_graphs, named_graphs)
            with self._plan_cache_lock:
                # plans that fetched a remote SERVICE embed a network
                # snapshot: serve them to CURRENT waiters but never
                # cache them (stale-federation fix)
                if cacheable:
                    if len(self._plan_cache) >= 256:  # bounded: FIFO-evict oldest
                        self._plan_cache.pop(next(iter(self._plan_cache)), None)
                    self._plan_cache[key] = df
            fut.set_result(df)
            return df
        except BaseException as e:  # noqa: BLE001 - propagate to waiters too
            if not fut.done():
                fut.set_exception(e)
            raise
        finally:
            with self._plan_cache_lock:
                self._inflight.pop(key, None)
            if not fut.done():  # async exception between steps: never
                fut.set_exception(  # leave waiters wedged
                    RuntimeError("compile aborted before resolving")
                )

    def _compile_uncached(
        self,
        query: str,
        default_graphs: "tuple[str, ...] | None",
        named_graphs: "tuple[str, ...] | None",
    ) -> "tuple[DataFrame, bool]":
        """Compile and return (df, cacheable). cacheable is False when
        the compile fetched a remote SERVICE endpoint — that plan is a
        network snapshot and must be rebuilt per query."""
        plan = parse_query(query)
        if default_graphs is not None or named_graphs is not None:
            from .algebra import Dataset

            if isinstance(plan, Dataset):  # Dataset is always the root
                plan = plan.input
            plan = Dataset(
                plan, tuple(default_graphs or ()), tuple(named_graphs or ())
            )
        comp = self._fresh_compiler()
        df = comp.compile(plan)
        if self._compiler._pred_stats is None and comp._pred_stats is not None:
            # publish once-computed stats to the long-lived compiler so
            # later compiles inherit them instead of re-aggregating
            self._compiler._pred_stats = comp._pred_stats
        # blank nodes are non-distinguished variables: they join within
        # the pattern but are never projected (even by SELECT *)
        bn = [c for c in df.columns if c.startswith("__bn")]
        if bn:
            df = df.drop(*bn)
        return df, not comp.used_remote_service

    def explain(self, query: str, mode: str = "formatted") -> str:
        """The Catalyst physical plan for a SPARQL query — the
        replacement for reasoning about which of the reference's four
        sorted indexes a query would hit."""
        df = self.sql(query)
        return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
            df._jdf.queryExecution(), mode
        )

    def sql_json(self, query: str, max_rows: "int | None" = None, **ds) -> str:
        """SPARQL -> W3C SPARQL-JSON string (the reference HTTP
        endpoint's response format, server.rs:87-141). ``max_rows``
        bounds the serialized result (ResultTooLarge beyond it);
        ``**ds`` forwards ``default_graphs``/``named_graphs``."""
        return to_sparql_json(self.sql(query, **ds), max_rows)

    def sql_csv(self, query: str, max_rows: "int | None" = None, **ds) -> str:
        """SPARQL -> W3C SPARQL 1.1 CSV results (an extension; the
        reference serializes JSON only)."""
        return to_sparql_csv(self.sql(query, **ds), max_rows)

    def sql_tsv(self, query: str, max_rows: "int | None" = None, **ds) -> str:
        """SPARQL -> W3C SPARQL 1.1 TSV results (Turtle-style terms)."""
        return to_sparql_tsv(self.sql(query, **ds), max_rows)

    def sql_xml(self, query: str, max_rows: "int | None" = None, **ds) -> str:
        """SPARQL -> W3C SPARQL Query Results XML."""
        from .json_result import to_sparql_xml

        return to_sparql_xml(self.sql(query, **ds), max_rows)

    def scan_pattern(self, s, p, o) -> DataFrame:
        """Single triple-pattern scan; each argument is a Var, a Term,
        an IRI string, or None (auto-variable)."""

        def norm(x, name):
            if x is None:
                return Var(name)
            if isinstance(x, (Var, Term)):
                return x
            if isinstance(x, str):
                if x.startswith("?"):
                    return Var(x[1:])
                return parse_iri(x)
            raise TypeError(f"bad pattern term {x!r}")

        return _scan(
            self.statements,
            TriplePattern(norm(s, "s"), norm(p, "p"), norm(o, "o")),
            self.union_stmt_forms,
        )

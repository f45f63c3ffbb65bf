"""Expression translation: algebra Expr -> Spark Column over term
structs.

Re-expresses the reference's per-row interpreter (calculate_expression
calc_engine.rs:993-1183 and the function dispatcher calc_engine.rs:
1186-2936) as Catalyst Column expressions — whole-stage-codegen'd, no
Python in the row path.

Semantics preserved / deviations (each flagged in SURVEY §2.7):
- '=' has int<->float cross-type equality (calc_engine.rs:2938-2944);
  sameTerm is strict identity (1039-1044).
- Effective boolean value per data_types.rs:244-252 (bool / nonempty
  string / nonzero int / nonzero non-NaN float; other types -> NULL,
  dropping the row in FILTER).
- STR returns the real lexical form (the reference returns the
  datatype IRI — a bug, calc_engine.rs:1233); STRLEN counts chars (ref
  counts bytes); UCASE/LCASE are full Unicode (ref ASCII-only); ROUND
  ties go toward +inf per SPARQL (floor(x+0.5)).
- Arithmetic follows the XPath promotion table (round-8 conformance
  fix; the ref promotes everything to f32, calc_engine.rs:2946-2986):
  int op int stays int (overflow -> error via try_* ops), any double
  operand promotes to double, '/' on two ints is xsd:decimal per
  §17.4 op:numeric-divide (represented as double — the term model has
  no decimal branch) with /0 an ERROR, while double division by zero
  follows IEEE 754 (INF / -INF / NaN).
- ERROR TERMS ARE NULL STRUCTS (round-8 conformance fix): every
  function/operator error yields a fully-NULL term struct, never a
  typed struct with a NULL payload, so COALESCE (plain F.coalesce)
  skips errored arguments per §17.4.1.3 and BOUND/EBV see errors
  uniformly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..model.schema import TERM_T, make_term
from .algebra import (
    EArith,
    EBool,
    ECmp,
    EExists,
    EFunc,
    EIn,
    ELit,
    ENeg,
    ENot,
    EVar,
    Expr,
)
from .terms import Term

# --------------------------------------------------------------------------
# term-struct helpers
# --------------------------------------------------------------------------


def lit_term(t: Term) -> Column:
    """Bound python Term -> term-struct literal column."""
    kw = {f: getattr(t, f) for f in ("t", "k", "e", "s", "lang", "i", "d", "b")}
    if kw["t"] == "null":
        return F.lit(None).cast(TERM_T)
    return make_term(**{k: v for k, v in kw.items() if v is not None})


def is_num(c: Column) -> Column:
    return c["t"].isin("int", "double")


def num(c: Column) -> Column:
    """Numeric value as double (int/double branches only)."""
    return (
        F.when(c["t"] == "int", c["i"].cast("double"))
        .when(c["t"] == "double", c["d"])
        .otherwise(F.lit(None).cast("double"))
    )


def str_val(c: Column) -> Column:
    """The string value accepted by SPARQL string functions: plain or
    lang-tagged strings."""
    return F.when(c["t"].isin("str", "mono"), c["s"]).otherwise(F.lit(None).cast("string"))


def ebv(c: Column) -> Column:
    """Effective boolean value (data_types.rs:244-252)."""
    return (
        F.when(c["t"] == "bool", c["b"])
        .when(c["t"].isin("str", "mono"), F.length(c["s"]) > 0)
        .when(c["t"] == "int", c["i"] != 0)
        .when(c["t"] == "double", (c["d"] != 0.0) & ~F.isnan(c["d"]))
        .otherwise(F.lit(None).cast("boolean"))
    )


def render(c: Column) -> Column:
    """Lexical rendering (STR, GROUP_CONCAT): entity/stmt -> IRI, else
    the lexical form (to_json_result.rs term rendering)."""
    wd = "http://www.wikidata.org/entity/"
    wdt = "http://www.wikidata.org/prop/direct/"
    pns = "http://www.wikidata.org/prop/"
    return (
        F.when(
            c["t"] == "entity",
            F.when(c["k"] == "P", F.concat(F.lit(wdt), F.lit("P"), c["e"].cast("string")))
            .when(c["k"] == "Pstmt", F.concat(F.lit(pns), F.lit("P"), c["e"].cast("string")))
            .otherwise(F.concat(F.lit(wd), c["k"], c["e"].cast("string"))),
        )
        .when(c["t"] == "stmt", F.concat(F.lit(wd + "statement/"), c["s"]))
        .when(c["t"].isin("str", "mono"), c["s"])
        .when(c["t"] == "int", c["i"].cast("string"))
        .when(c["t"] == "double", c["d"].cast("string"))
        .when(c["t"] == "bool", F.when(c["b"], "true").otherwise("false"))
        .when(
            c["t"] == "time",
            F.concat(
                c["time"]["year"].cast("string"),
                F.lit("-"),
                F.lpad(c["time"]["month"].cast("string"), 2, "0"),
                F.lit("-"),
                F.lpad(c["time"]["day"].cast("string"), 2, "0"),
                F.lit("T"),
                F.lpad(c["time"]["hour"].cast("string"), 2, "0"),
                F.lit(":"),
                F.lpad(c["time"]["minute"].cast("string"), 2, "0"),
                F.lit(":"),
                F.lpad(c["time"]["second"].cast("string"), 2, "0"),
                F.lit("Z"),
            ),
        )
        .when(c["t"] == "qty", c["qty"]["amount"])
        .when(
            c["t"] == "coord",
            F.concat(
                F.lit("Point("),
                c["coord"]["lon"].cast("string"),
                F.lit(" "),
                c["coord"]["lat"].cast("string"),
                F.lit(")"),
            ),
        )
        .when(c["t"] == "termpred", F.concat(c["k"], F.lit("("), c["lang"], F.lit(")")))
        .otherwise(F.lit(None).cast("string"))
    )


_TIME_KEY_PAD = [("year", 6), ("month", 2), ("day", 2), ("hour", 2), ("minute", 2), ("second", 2)]


def _time_key(c: Column) -> Column:
    """Sortable string key for time structs (proleptic; negative years
    sort via offset so -500 < 900)."""
    parts = [F.lpad((c["time"]["year"] + F.lit(1_000_000)).cast("string"), 8, "0")]
    for f, w in _TIME_KEY_PAD[1:]:
        parts.append(F.lpad(F.coalesce(c["time"][f], F.lit(0)).cast("string"), w, "0"))
    return F.concat(*parts)


def sort_key(c: Column) -> Column:
    """Total-order key for ORDER BY / MIN / MAX over terms.

    The reference uses a *partial* order (DataValue::partial_cmp,
    data_types.rs:277-323 — cross-type incomparable, first-value-wins
    in MIN/MAX). We deviate to a deterministic total order grouped by
    type class, which is a superset: comparisons the reference defines
    order identically; incomparable pairs get a stable order instead
    of depending on input order.

    Cross-CLASS ranks follow §15.1's normative order: unbound < blank
    (no bnode term class is stored — BNODE() mints plain strings) <
    IRIs (entity/stmt) < literals. Within the IRI class, entities
    order by (kind, numeric id) rather than full-IRI codepoint order —
    a declared deviation: the numeric key is fixed-width in the sort
    shuffle where the rendered IRI string would be ~40 bytes/row, and
    at 100 TB the ORDER BY / MIN-MAX sort width is the cost that
    matters. Within-literal cross-datatype order (numeric < bool <
    time < string < quantity) is implementation-defined per §15.1 and
    kept stable here."""
    rank = (
        F.when(c.isNull(), 0)
        .when(c["t"] == "entity", 2)
        .when(c["t"] == "stmt", 3)
        .when(c["t"].isin("int", "double"), 4)
        .when(c["t"] == "bool", 5)
        .when(c["t"] == "time", 6)
        .when(c["t"].isin("str", "mono"), 7)
        .when(c["t"] == "qty", 8)
        .otherwise(10)
    )
    d = (
        F.when(c["t"].isin("int", "double"), num(c))
        .when(c["t"] == "bool", c["b"].cast("double"))
        .when(c["t"] == "qty", c["qty"]["amount_d"])
        .when(c["t"] == "entity", c["e"].cast("double"))
        .otherwise(F.lit(0.0))
    )
    s = (
        F.when(c["t"].isin("str", "mono"), c["s"])
        .when(c["t"] == "time", _time_key(c))
        .when(c["t"] == "entity", c["k"])
        .when(c["t"] == "stmt", c["s"])
        .otherwise(F.lit(""))
    )
    return F.struct(rank.alias("r"), s.alias("s"), d.alias("d"))


def eq_terms(a: Column, b: Column) -> Column:
    """'=' with numeric cross-type equality (calc_engine.rs:2938-2944)."""
    return F.when(is_num(a) & is_num(b), num(a) == num(b)).otherwise(a == b)


def cmp_terms(a: Column, b: Column, op: str) -> Column:
    """Ordering comparisons: defined within compatible type classes,
    NULL otherwise (partial order, data_types.rs:277-323)."""
    import operator

    ops = {"<": operator.lt, "<=": operator.le, ">": operator.gt, ">=": operator.ge}
    f = ops[op]
    qty_ok = (a["t"] == "qty") & (b["t"] == "qty") & (a["qty"]["unit"].eqNullSafe(b["qty"]["unit"]))
    mono_ok = (a["t"] == "mono") & (b["t"] == "mono") & (a["lang"] == b["lang"])
    # times compare only within the same calendar (data_types.rs:
    # 410-439: Gregorian/Julian gated, mixed calendars incomparable)
    time_ok = (
        (a["t"] == "time")
        & (b["t"] == "time")
        & a["time"]["cal"].eqNullSafe(b["time"]["cal"])
    )
    return (
        F.when(is_num(a) & is_num(b), f(num(a), num(b)))
        .when((a["t"] == "str") & (b["t"] == "str"), f(a["s"], b["s"]))
        .when(mono_ok, f(a["s"], b["s"]))
        .when(time_ok, f(_time_key(a), _time_key(b)))
        .when(qty_ok, f(a["qty"]["amount_d"], b["qty"]["amount_d"]))
        .when((a["t"] == "bool") & (b["t"] == "bool"), f(a["b"], b["b"]))
        .otherwise(F.lit(None).cast("boolean"))
    )


# --------------------------------------------------------------------------
# function library (SURVEY §2.7)
# --------------------------------------------------------------------------


# Result constructors gate on the payload being non-NULL: a NULL
# payload means the computation errored (type error, unbound input,
# overflow), and an error must be a fully-NULL struct — F.when with no
# otherwise — so COALESCE can skip it (§17.4.1.3) and downstream
# consumers see one uniform error representation (round-8 conformance
# fix; previously errors were typed structs with NULL payloads, which
# F.coalesce could not skip).


def _str_result(inp: Column, new_s: Column) -> Column:
    """String-function result: preserves the lang tag of lang-tagged
    inputs (SPARQL), else a plain string; NULL payload -> error."""
    return F.when(
        new_s.isNotNull(),
        F.when(inp["t"] == "mono", make_term(t="mono", s=new_s, lang=inp["lang"])).otherwise(
            make_term(t="str", k="string", s=new_s)
        ),
    )


def _plain(new_s: Column) -> Column:
    return F.when(new_s.isNotNull(), make_term(t="str", k="string", s=new_s))


def _num_result(x: Column) -> Column:
    return F.when(x.isNotNull(), make_term(t="double", d=x))


def _int_result(x: Column) -> Column:
    return F.when(x.isNotNull(), make_term(t="int", i=x))


def _bool_result(x: Column) -> Column:
    return F.when(x.isNotNull(), make_term(t="bool", b=x))


def _regex_pattern(pattern: Column, flags: str | None) -> Column:
    """Translate SPARQL REGEX flags to Java inline flags — the same
    trick the reference uses (calc_engine.rs:1990-2068)."""
    if not flags:
        return pattern
    inline = "".join(ch for ch in flags if ch in "ismx")
    if "q" in flags:
        pattern = F.concat(F.lit(r"\Q"), pattern, F.lit(r"\E"))
    if inline:
        pattern = F.concat(F.lit(f"(?{inline})"), pattern)
    return pattern


def _flags_of(args: tuple[Expr, ...], idx: int) -> str | None:
    if len(args) > idx and isinstance(args[idx], ELit):
        return args[idx].term.s
    return None


def _regex_pattern_dyn(pattern: Column, flags_val: Column) -> Column:
    """Column-valued flags (a variable or computed expression): the
    same ismx/q inline-flag translation as _regex_pattern, built as a
    runtime string expression instead of at compile time — previously
    a non-literal flags argument was silently ignored (round-7
    conformance review). A NULL flags value (unbound variable, errored
    expression) propagates as an error — NULL pattern -> NULL regex
    result (ADVICE r07), consistent with the IF/STRSTARTS error
    discipline."""
    inline = F.regexp_replace(flags_val, "[^ismx]", "")
    pat = F.when(
        flags_val.contains("q"),
        F.concat(F.lit("\\Q"), pattern, F.lit("\\E")),
    ).otherwise(pattern)
    return F.when(
        flags_val.isNotNull(),
        F.when(inline != "", F.concat(F.lit("(?"), inline, F.lit(")"), pat)).otherwise(pat),
    )


# ---- custom (extension) functions by IRI --------------------------------
# The reference declares this hook and panics (interpreter.rs:655-659,
# calc_engine.rs:2930); here it is real: register a Column builder (or
# any pandas_udf — it is called like a Column function) under the
# function's IRI and queries may call `<iri>(args...)`. The registry is
# process-wide, like SparkSession.udf.register.

CUSTOM_FUNCTIONS: dict[str, "object"] = {}


def register_custom_function(iri: str, fn, kind: str = "string") -> None:
    """Register ``fn`` as the SPARQL extension function ``<iri>``.

    kind picks the value convention at the term boundary:
    - 'term':    fn receives/returns term-struct Columns (full control)
    - 'string':  fn receives plain string Columns, returns a string
                 Column (or pandas_udf result) -> xsd:string term
    - 'numeric': fn receives double Columns, returns a double Column
                 -> xsd:double term
    - 'bool':    fn receives double Columns, returns a boolean Column
                 -> xsd:boolean term
    """
    if kind == "term":
        wrapped = fn
    elif kind == "string":
        wrapped = lambda *a: _plain(fn(*[str_val(x) for x in a]))  # noqa: E731
    elif kind == "numeric":
        wrapped = lambda *a: _num_result(fn(*[num(x) for x in a]))  # noqa: E731
    elif kind == "bool":
        wrapped = lambda *a: _bool_result(fn(*[num(x) for x in a]))  # noqa: E731
    else:
        raise ValueError(f"unknown custom-function kind {kind!r}")
    CUSTOM_FUNCTIONS[iri] = wrapped
    _bump_generation()


#: bumped on every registry mutation — GraphEngine keys its compiled-
#: plan cache on this so a re-registered function invalidates plans
REGISTRY_GENERATION = 0


def _bump_generation() -> None:
    global REGISTRY_GENERATION
    REGISTRY_GENERATION += 1


def unregister_custom_function(iri: str) -> None:
    CUSTOM_FUNCTIONS.pop(iri, None)
    _bump_generation()


# custom AGGREGATES by IRI — the reference's other declared-but-todo
# hook (calc_engine.rs:877-879). fn is an aggregate Column builder: a
# builtin (F.median, F.mode, ...) or a pandas_udf(..., GROUPED_AGG).
# kind picks the value convention: 'numeric' feeds doubles and wraps a
# double term, 'int' wraps an integer term, 'string' feeds rendered
# strings, 'term' passes the raw term structs through untouched.
CUSTOM_AGGREGATES: dict[str, tuple[object, str]] = {}


def register_custom_aggregate(iri: str, fn, kind: str = "numeric") -> None:
    if kind not in ("numeric", "int", "string", "term"):
        raise ValueError(f"unknown custom-aggregate kind {kind!r}")
    CUSTOM_AGGREGATES[iri] = (fn, kind)
    _bump_generation()


def unregister_custom_aggregate(iri: str) -> None:
    CUSTOM_AGGREGATES.pop(iri, None)
    _bump_generation()


def build_function(name: str, args: list[Column], raw_args: tuple[Expr, ...]) -> Column:
    """Builtin function dispatch (reference calculate_function_call,
    calc_engine.rs:1186-2936)."""
    if name in CUSTOM_FUNCTIONS:
        return CUSTOM_FUNCTIONS[name](*args)
    n = name.upper()
    a = args[0] if args else None

    if n == "STR":
        return _plain(render(a))
    if n == "LANG":
        return _plain(F.when(a["t"] == "mono", a["lang"]).otherwise(F.lit("")))
    if n == "LANGMATCHES":
        lang, rng = F.lower(str_val(args[0])), F.lower(str_val(args[1]))
        m = F.when(rng == "*", F.length(lang) > 0).otherwise(
            (lang == rng) | lang.startswith(F.concat(rng, F.lit("-")))
        )
        return _bool_result(m)
    if n == "DATATYPE":
        xsd = "http://www.w3.org/2001/XMLSchema#"
        dt = (
            F.when(a["t"] == "str", F.lit(xsd + "string"))
            .when(a["t"] == "mono", F.lit("http://www.w3.org/1999/02/22-rdf-syntax-ns#langString"))
            .when(a["t"] == "int", F.lit(xsd + "integer"))
            .when(a["t"] == "double", F.lit(xsd + "double"))
            .when(a["t"] == "bool", F.lit(xsd + "boolean"))
            .when(a["t"] == "time", F.lit(xsd + "dateTime"))
            .otherwise(F.lit(None).cast("string"))
        )
        return _plain(dt)
    if n == "BOUND":
        return _bool_result(a.isNotNull())
    if n in ("ISIRI", "ISURI"):
        return _bool_result(a["t"].isin("entity", "stmt"))
    if n == "ISBLANK":
        return _bool_result(F.lit(False))  # no bnodes stored (ref 1204)
    if n == "ISLITERAL":
        return _bool_result(a["t"].isin("str", "mono", "int", "double", "bool", "time", "qty", "coord"))
    if n == "ISNUMERIC":
        return _bool_result(is_num(a))
    if n == "IRI" or n == "URI":
        # runtime IRI construction: an argument that is ALREADY an IRI
        # passes through unchanged (§17.4.2.8 — str_val of an entity
        # term is NULL, so without this branch IRI(?s) destroyed bound
        # IRIs; round-7 conformance review); else recognize entity
        # IRIs in the string, else keep str
        sv = str_val(a)
        ent = F.regexp_extract(sv, r"[/#]([QPL])(\d+)$", 1)
        num_ = F.regexp_extract(sv, r"[/#]([QPL])(\d+)$", 2)
        return (
            F.when(a["t"].isin("entity", "stmt"), a)
            .when(ent != "", make_term(t="entity", k=ent, e=num_.try_cast("long")))
            .otherwise(_plain(sv))
        )
    if n == "STRLANG":
        sl, ll = str_val(args[0]), str_val(args[1])
        # non-string lexical form or tag -> error (NULL struct)
        return F.when(sl.isNotNull() & ll.isNotNull(), make_term(t="mono", s=sl, lang=ll))
    if n == "STRDT":
        lex, dt = str_val(args[0]), str_val(args[1])
        # a lexical form that doesn't parse in the target datatype is
        # an error here (the term model cannot hold ill-typed
        # literals — documented deviation); each branch gates on its
        # parsed payload so errors are NULL structs, not typed husks
        return (
            F.when(dt.contains("integer"), _int_result(lex.try_cast("long")))
            .when(
                dt.contains("double") | dt.contains("decimal") | dt.contains("float"),
                _num_result(lex.try_cast("double")),
            )
            .when(dt.contains("boolean"), _bool_result(lex.try_cast("boolean")))
            .otherwise(_plain(lex))
        )
    if n == "BNODE":
        return _plain(F.concat(F.lit("_:b"), F.abs(F.xxhash64(F.rand())).cast("string")))
    if n == "UUID":
        return _plain(F.concat(F.lit("urn:uuid:"), F.expr("uuid()")))
    if n == "STRUUID":
        return _plain(F.expr("uuid()"))

    # ---- strings
    if n == "STRLEN":
        return _int_result(F.length(str_val(a)).cast("long"))
    if n == "SUBSTR":
        # fn:substring semantics (round-7 conformance review), NOT
        # Spark substring: positions p with round(start) <= p <
        # round(start) + round(len), 1-based — so start 0 with length 3
        # yields chars 1..2, a negative start is a clipped window from
        # position 1 (never a from-the-end suffix), and fractional
        # arguments round half-toward-+inf instead of truncating
        sv = str_val(a)
        start_r = F.floor(num(args[1]) + F.lit(0.5)).cast("long")
        valid = start_r.isNotNull()
        if len(args) > 2:
            len_r = F.floor(num(args[2]) + F.lit(0.5)).cast("long")
            end_excl = start_r + len_r
            valid = valid & len_r.isNotNull()
        else:
            end_excl = F.lit(1 << 40).cast("long")
        eff_start = F.greatest(start_r, F.lit(1).cast("long"))
        eff_len = F.greatest(end_excl - eff_start, F.lit(0).cast("long"))
        # a non-numeric/unbound start or length is an ERROR that must
        # propagate (fn:substring via F.greatest would otherwise skip
        # the NULL and yield the full string — ADVICE r07)
        return F.when(
            valid,
            _str_result(
                a,
                F.substring(
                    sv,
                    eff_start.cast("int"),
                    F.least(eff_len, F.lit(1 << 30).cast("long")).cast("int"),
                ),
            ),
        )
    if n == "UCASE":
        return _str_result(a, F.upper(str_val(a)))
    if n == "LCASE":
        return _str_result(a, F.lower(str_val(a)))
    if n in ("STRSTARTS", "STRENDS", "CONTAINS", "STRBEFORE", "STRAFTER"):
        # §17.4.3.1 argument compatibility (round-7 conformance
        # review): arg1 must itself be a string literal, and arg2 must
        # be a simple/xsd:string literal or carry the SAME lang tag as
        # arg1 — anything else is a type error (no otherwise -> NULL
        # term -> row-dropping error), e.g. STRSTARTS("abc"@en, "b"@cy)
        # errors instead of comparing lexical forms, and STRSTARTS(42,
        # "4") errors instead of passing arg2-only validation
        # (ADVICE r07)
        t1, t2 = a, args[1]
        s1, s2 = str_val(t1), str_val(t2)
        compat = (
            t1["t"].isin("str", "mono")
            & ((t2["t"] == "str") | ((t2["t"] == "mono") & (t2["lang"] == t1["lang"])))
        )
        if n == "STRSTARTS":
            return F.when(compat, _bool_result(s1.startswith(s2)))
        if n == "STRENDS":
            return F.when(compat, _bool_result(s1.endswith(s2)))
        if n == "CONTAINS":
            return F.when(compat, _bool_result(s1.contains(s2)))
        pos = F.instr(s1, s2)
        matched = (s2 == "") | (pos > 0)
        if n == "STRBEFORE":
            res = F.when(s2 == "", F.lit("")).otherwise(F.substring(s1, 1, pos - 1))
        else:  # STRAFTER
            res = F.when(s2 == "", s1).otherwise(
                F.substring(s1, pos + F.length(s2), F.lit(1 << 30))
            )
        # a MATCH carries arg1's lang tag (strbefore("abc"@en, "") ->
        # ""@en); NO match yields the empty SIMPLE literal, never a
        # tagged one (strbefore("abc"@en, "z") -> "", §17.4.3.4)
        return F.when(compat & matched, _str_result(t1, res)).when(
            compat & ~matched, _plain(F.lit(""))
        )
    if n == "ENCODE_FOR_URI":
        # url_encode is form-encoding; fix the three RFC 3986 deltas
        # ('*' is NOT unreserved, but java URLEncoder keeps it —
        # fn:encode-for-uri requires %2A; round-7 conformance review)
        enc = F.regexp_replace(F.url_encode(str_val(a)), r"\+", "%20")
        enc = F.regexp_replace(enc, r"%7E", "~")
        enc = F.regexp_replace(enc, r"\*", "%2A")
        return _plain(enc)
    if n == "CONCAT":
        # strings only; any non-string arg nulls the result (ref 1861)
        return _plain(F.concat(*[str_val(x) for x in args]))
    if n == "REGEX":
        if len(raw_args) > 2 and _flags_of(raw_args, 2) is None:
            pat = _regex_pattern_dyn(str_val(args[1]), str_val(args[2]))
        else:
            pat = _regex_pattern(str_val(args[1]), _flags_of(raw_args, 2))
        return _bool_result(F.regexp_like(str_val(args[0]), pat))
    if n == "REPLACE":
        if len(raw_args) > 3 and _flags_of(raw_args, 3) is None:
            pat = _regex_pattern_dyn(str_val(args[1]), str_val(args[3]))
        else:
            pat = _regex_pattern(str_val(args[1]), _flags_of(raw_args, 3))
        return _str_result(a, F.regexp_replace(str_val(args[0]), pat, str_val(args[2])))

    # ---- numerics
    if n == "ABS":
        return F.when(a["t"] == "int", _int_result(F.abs(a["i"]))).otherwise(
            _num_result(F.abs(num(a)))
        )
    if n == "ROUND":
        # SPARQL: ties round toward +inf -> floor(x + 0.5)
        return F.when(a["t"] == "int", a).otherwise(
            _num_result(F.floor(num(a) + F.lit(0.5)).cast("double"))
        )
    if n == "CEIL":
        return F.when(a["t"] == "int", a).otherwise(_num_result(F.ceil(num(a)).cast("double")))
    if n == "FLOOR":
        return F.when(a["t"] == "int", a).otherwise(_num_result(F.floor(num(a)).cast("double")))
    if n == "RAND":
        return _num_result(F.rand())

    # ---- date/time (on time terms)
    if n in ("YEAR", "MONTH", "DAY", "HOURS", "MINUTES", "SECONDS"):
        fld = {
            "YEAR": "year",
            "MONTH": "month",
            "DAY": "day",
            "HOURS": "hour",
            "MINUTES": "minute",
            "SECONDS": "second",
        }[n]
        return _int_result(a["time"][fld].cast("long"))
    if n == "NOW":
        now = F.current_timestamp()
        return make_term(
            t="time",
            time=F.struct(
                F.year(now).cast("long").alias("year"),
                F.month(now).cast("int").alias("month"),
                F.dayofmonth(now).cast("int").alias("day"),
                F.hour(now).cast("int").alias("hour"),
                F.minute(now).cast("int").alias("minute"),
                F.second(now).cast("int").alias("second"),
                F.lit(0).alias("before"),
                F.lit(0).alias("after"),
                F.lit(14).alias("precision"),
                F.lit(0).alias("tz"),
                F.lit(None).cast("string").alias("cal"),
            ),
        )
    if n == "TIMEZONE" or n == "TZ":
        tz = a["time"]["tz"]
        # TZ of a non-time term is a type error (round-8: gate on the
        # term class, else an entity/unbound argument returned "")
        return F.when(
            a["t"] == "time",
            _plain(
                F.when(tz.isNull(), F.lit(""))
                .when(tz == 0, F.lit("Z"))
                .otherwise(
                    F.concat(
                        F.when(tz < 0, "-").otherwise("+"),
                        F.lpad((F.abs(tz) / 60).cast("int").cast("string"), 2, "0"),
                        F.lit(":"),
                        F.lpad((F.abs(tz) % 60).cast("string"), 2, "0"),
                    )
                )
            ),
        )

    # ---- hashes
    if n == "MD5":
        return _plain(F.md5(str_val(a)))
    if n == "SHA1":
        return _plain(F.sha1(str_val(a)))
    if n in ("SHA256", "SHA384", "SHA512"):
        return _plain(F.sha2(str_val(a), int(n[3:])))

    if "://" in name:
        raise NotImplementedError(
            f"extension function <{name}> is not registered — use "
            "GraphEngine.register_function(iri, fn) to provide it"
        )
    raise NotImplementedError(f"SPARQL function {name}")


# --------------------------------------------------------------------------
# expression compiler
# --------------------------------------------------------------------------


class ExprCompiler:
    """Compiles Expr trees to Columns. EXISTS subplans need the
    operator compiler, injected via ``compile_op``."""

    def __init__(
        self, df: DataFrame, compile_exists=None, resolve=None, colset=None, bind=False
    ):
        self.df = df
        # df.columns forces plan analysis (a JVM round-trip); callers
        # that track their columns pass colset to avoid it — col()
        # consults the set per variable reference
        self._colset = frozenset(colset if colset is not None else df.columns)
        self.compile_exists = compile_exists
        self.resolve = resolve  # optional: var name -> Column
        # let-binding mode: function results become named intermediate
        # columns (collected in .bindings, applied by the caller via
        # withColumn before the op that uses the expression). Column
        # trees are Catalyst TREES, not DAGs — a comparison/EBV wrapper
        # references its operand ~15x, so nesting multiplies node
        # counts combinatorially, and Spark re-ANALYZES the full tree
        # on every DataFrame transformation. Binding keeps tree sizes
        # additive (measured multi-second plan builds on FILTERed
        # var-predicate queries without it). Also fixes evaluate-once
        # semantics for nondeterministic functions (RAND/UUID) that a
        # duplicated tree would re-evaluate per reference.
        self.bindings: list[tuple[str, Column]] = []
        self._bind_enabled = bind
        self._bind_n = 0

    def _bound(self, col: Column) -> Column:
        if not self._bind_enabled:
            return col
        # `__xN` is a lexically valid SPARQL variable name — skip any
        # N whose column already exists (a query using ?__x0 must not
        # have its binding overwritten by _apply_bindings)
        while f"__x{self._bind_n}" in self._colset:
            self._bind_n += 1
        name = f"__x{self._bind_n}"
        self._bind_n += 1
        self.bindings.append((name, col))
        return F.col(name)

    def _no_bind(self):
        """Suspend binding for a lazily-evaluated subtree: IF/COALESCE
        branches must stay inside the CASE/coalesce expression so an
        error-able branch (ANSI division, casts) is only evaluated for
        rows that select it — hoisting it to a column would evaluate
        it eagerly for every row."""
        import contextlib

        @contextlib.contextmanager
        def ctx():
            prev, self._bind_enabled = self._bind_enabled, False
            try:
                yield
            finally:
                self._bind_enabled = prev

        return ctx()

    def col(self, e: Expr) -> Column:
        """Compile to a term-struct Column."""
        if isinstance(e, EVar):
            if self.resolve is not None:
                return self.resolve(e.name)
            return self.df[e.name] if e.name in self._colset else F.lit(None).cast(TERM_T)
        if isinstance(e, ELit):
            return self._bound(lit_term(e.term))
        if isinstance(e, ENot):
            return self._bound(_bool_result(~ebv(self.col(e.arg))))
        if isinstance(e, EBool):
            l, r = ebv(self.col(e.left)), ebv(self.col(e.right))
            return self._bound(_bool_result(l & r if e.op == "and" else l | r))
        if isinstance(e, ECmp):
            l, r = self.col(e.left), self.col(e.right)
            if e.op == "=":
                return self._bound(_bool_result(eq_terms(l, r)))
            if e.op == "!=":
                return self._bound(_bool_result(~eq_terms(l, r)))
            if e.op == "sameTerm":
                return self._bound(_bool_result(l == r))
            return self._bound(_bool_result(cmp_terms(l, r, e.op)))
        if isinstance(e, EIn):
            l = self.col(e.arg)
            anyeq = F.lit(False)
            for opt in e.options:
                anyeq = anyeq | eq_terms(l, self.col(opt))
            return self._bound(_bool_result(~anyeq if e.negated else anyeq))
        if isinstance(e, EArith):
            # XPath promotion table (§17.4 operator mapping, round-8
            # conformance fix): int op int stays int (overflow -> error
            # via try_* under ANSI), any double operand promotes to
            # double; '/' on two ints is op:numeric-divide on decimals
            # (double here — no decimal branch in the term model) with
            # division by zero an ERROR, while double division by zero
            # follows IEEE 754 (INF/-INF/NaN). Spark's ANSI '/' throws
            # DIVIDE_BY_ZERO even for doubles, so the IEEE branch is
            # built explicitly and try_divide covers the rest.
            # PERF: ONE struct with conditional fields, never a CASE
            # over two make_term structs — a branch-per-struct CASE
            # defeats Catalyst's extract-value simplification, so the
            # downstream num()/["d"] access materialized the struct
            # per row (measured 1.8x on sparql_tpch_q1's hot SUM).
            lt, rt = self.col(e.left), self.col(e.right)
            both_int = (lt["t"] == "int") & (rt["t"] == "int")
            ld, rd = num(lt), num(rt)
            if e.op in ("+", "-", "*"):
                f_int = {"+": F.try_add, "-": F.try_subtract, "*": F.try_multiply}[e.op]
                import operator

                f_dbl = {"+": operator.add, "-": operator.sub, "*": operator.mul}[e.op]
                i_val = F.when(both_int, f_int(lt["i"], rt["i"]))
                d_val = F.when(~both_int, f_dbl(ld, rd))
            else:
                # gate the INF/NaN branches on rd == 0.0 so a NULL
                # divisor (non-numeric operand) stays an error, not NaN
                ieee = F.when(rd != 0.0, F.try_divide(ld, rd)).when(
                    rd == 0.0,
                    F.when(F.isnan(ld) | (ld == 0.0), F.lit(float("nan")))
                    .when(ld > 0.0, F.lit(float("inf")))
                    .when(ld < 0.0, F.lit(float("-inf"))),
                )
                # int/int is op:numeric-divide -> decimal-valued
                # (double), /0 -> error (try_divide NULLs it)
                i_val = F.lit(None).cast("bigint")
                d_val = F.when(both_int, F.try_divide(ld, rd)).otherwise(ieee)
            # PERF (round 8 optimization): let-bind the two SCALAR
            # results before building the term struct. The struct
            # constructor references i_val once more for the type tag
            # and once for the payload, and d_val three times — without
            # binding, the physical Project evaluates the full promoted
            # arithmetic (try_* + two promotion CASEs per operand) ~5x
            # per row, and this Project sits OUTSIDE any whole-stage-
            # codegen region (SortAggregate neighbors), so no CSE
            # rescues it (measured: the sparql_tpch_q1 pre-aggregation
            # stage at the 10x probe is pure per-row CPU). All scalar
            # branches are try_-guarded or IEEE-safe, so eager
            # evaluation as a bound column cannot raise.
            i_val = self._bound(i_val)
            d_val = self._bound(d_val)
            t_val = F.when(i_val.isNotNull(), F.lit("int")).when(
                d_val.isNotNull(), F.lit("double")
            )
            return self._bound(
                F.when(t_val.isNotNull(), make_term(t=t_val, i=i_val, d=d_val))
            )
        if isinstance(e, ENeg):
            at = self.col(e.arg)
            ni = self._bound(F.when(at["t"] == "int", F.try_subtract(F.lit(0), at["i"])))
            nd = self._bound(F.when(at["t"] == "double", -at["d"]))
            nt = F.when(ni.isNotNull(), F.lit("int")).when(nd.isNotNull(), F.lit("double"))
            return self._bound(F.when(nt.isNotNull(), make_term(t=nt, i=ni, d=nd)))
        if isinstance(e, EExists):
            if self.compile_exists is None:
                raise NotImplementedError("EXISTS not supported in this context")
            return self.compile_exists(e)
        if isinstance(e, EFunc):
            n = e.name.upper()
            if n == "IF":
                c = ebv(self.col(e.args[0]))
                with self._no_bind():
                    t_br, f_br = self.col(e.args[1]), self.col(e.args[2])
                # NO otherwise: an errored condition (NULL EBV — unbound
                # var, non-boolean-coercible term) must propagate as an
                # error per §17.4.1.2, not silently pick the else branch
                # (round-7 conformance review)
                return self._bound(F.when(c, t_br).when(~c, f_br))
            if n == "COALESCE":
                with self._no_bind():
                    args = [self.col(x) for x in e.args]
                return self._bound(F.coalesce(*args))
            args = [self.col(x) for x in e.args]
            return self._bound(build_function(e.name, args, e.args))
        raise NotImplementedError(f"expression {e!r}")

    #: functions whose result term is statically xsd:boolean, so the
    #: effective boolean value is just the `b` field (one reference to
    #: the condition tree instead of ebv()'s eight — after predicate
    #: pushdown substitutes let-bindings back into the filter, that 8x
    #: was enough to blow whole-stage codegen past janino's 64 KB
    #: method limit and silently fall back to interpreted eval)
    _BOOL_FUNCS = frozenset(
        {
            "REGEX",
            "LANGMATCHES",
            "STRSTARTS",
            "STRENDS",
            "CONTAINS",
            "ISIRI",
            "ISURI",
            "ISBLANK",
            "ISLITERAL",
            "ISNUMERIC",
            "BOUND",
        }
    )

    def _statically_bool(self, e: Expr) -> bool:
        if isinstance(e, (ECmp, EBool, ENot, EIn, EExists)):
            return True
        return isinstance(e, EFunc) and e.name.upper() in self._BOOL_FUNCS

    def boolean(self, e: Expr) -> Column:
        """Compile to a filter predicate: EBV, NULL -> drop row."""
        c = self.col(e)
        if self._statically_bool(e):
            return F.coalesce(c["b"], F.lit(False))
        return F.coalesce(ebv(c), F.lit(False))

"""The algebra IR: the reference's 19-operator ``Operator`` enum
(calc_data_types.rs:117-205) + its expression IR (calc_data_types.rs:
30-58) as plain dataclasses. The compiler lowers these to DataFrames.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from .terms import Term

# --------------------------------------------------------------------------
# Expressions
# --------------------------------------------------------------------------


class Expr:
    pass


@dataclass(frozen=True)
class EVar(Expr):
    name: str


@dataclass(frozen=True)
class ELit(Expr):
    term: Term


@dataclass(frozen=True)
class ENot(Expr):
    arg: Expr


@dataclass(frozen=True)
class EBool(Expr):  # And / Or
    op: str  # 'and' | 'or'
    left: Expr
    right: Expr


@dataclass(frozen=True)
class ECmp(Expr):
    op: str  # '=' '!=' '<' '<=' '>' '>=' 'sameTerm'
    left: Expr
    right: Expr


@dataclass(frozen=True)
class EIn(Expr):
    arg: Expr
    options: tuple[Expr, ...]
    negated: bool = False


@dataclass(frozen=True)
class EArith(Expr):
    op: str  # '+' '-' '*' '/'
    left: Expr
    right: Expr


@dataclass(frozen=True)
class ENeg(Expr):
    arg: Expr


@dataclass(frozen=True)
class EFunc(Expr):
    name: str  # uppercase builtin name
    args: tuple[Expr, ...]


@dataclass(frozen=True)
class EExists(Expr):
    plan: "Op"
    negated: bool = False


# --------------------------------------------------------------------------
# Patterns / operators
# --------------------------------------------------------------------------


@dataclass(frozen=True)
class Var:
    name: str


PatternTerm = Term | Var  # a triple position: bound term or variable


@dataclass(frozen=True)
class TriplePattern:
    s: PatternTerm
    p: PatternTerm
    o: PatternTerm


# property path atoms (reference Path IR, calc_data_types.rs:17-26)
@dataclass(frozen=True)
class PathExpr:
    kind: str  # 'link','reverse','sequence','alternative','zero_or_more','one_or_more','zero_or_one','negated'
    terms: tuple = ()  # for 'link'/'negated': predicate Terms
    parts: tuple = ()  # sub-PathExprs


class Op:
    pass


@dataclass(frozen=True)
class Bgp(Op):
    patterns: tuple[TriplePattern, ...]


@dataclass(frozen=True)
class PathPattern(Op):
    s: PatternTerm
    path: PathExpr
    o: PatternTerm


@dataclass(frozen=True)
class Join(Op):
    left: Op
    right: Op


@dataclass(frozen=True)
class LeftJoin(Op):
    left: Op
    right: Op
    expr: Expr | None = None


@dataclass(frozen=True)
class LateralJoin(Op):
    left: Op
    right: Op


@dataclass(frozen=True)
class Filter(Op):
    expr: Expr
    input: Op


@dataclass(frozen=True)
class Union(Op):
    left: Op
    right: Op


@dataclass(frozen=True)
class Extend(Op):
    input: Op
    var: str
    expr: Expr


@dataclass(frozen=True)
class Minus(Op):
    left: Op
    right: Op


@dataclass(frozen=True)
class Values(Op):
    variables: tuple[str, ...]
    rows: tuple[tuple[Term | None, ...], ...]  # None = UNDEF


@dataclass(frozen=True)
class OrderBy(Op):
    input: Op
    keys: tuple[tuple[Expr, bool], ...]  # (expr, ascending)


@dataclass(frozen=True)
class Project(Op):
    input: Op
    variables: tuple[str, ...]


@dataclass(frozen=True)
class Distinct(Op):
    input: Op


@dataclass(frozen=True)
class Reduced(Op):
    input: Op


@dataclass(frozen=True)
class Slice(Op):
    input: Op
    start: int = 0
    length: int | None = None


@dataclass(frozen=True)
class AggSpec:
    var: str  # output variable
    func: str  # 'count','sum','avg','min','max','group_concat','sample'
    expr: Expr | None  # None = COUNT(*)
    distinct: bool = False
    separator: str = " "


@dataclass(frozen=True)
class Group(Op):
    input: Op
    group_vars: tuple[str, ...]
    aggregates: tuple[AggSpec, ...] = field(default_factory=tuple)


@dataclass(frozen=True)
class Construct(Op):
    """CONSTRUCT query form (interpreter.rs:114-129 todo!): instantiate
    the template per solution of the input pattern; the result is a
    graph — (subject, predicate, object) rows, incomplete triples
    dropped, duplicates merged."""

    input: Op
    template: tuple[TriplePattern, ...]


@dataclass(frozen=True)
class Describe(Op):
    """DESCRIBE query form (interpreter.rs:114-129 todo!): all
    statements whose subject is one of the described nodes (explicit
    IRIs + the bindings of the described variables)."""

    nodes: tuple[Term, ...]
    variables: tuple[str, ...]
    input: Op | None


@dataclass(frozen=True)
class Graph(Op):
    """GRAPH name { input }: scope the inner pattern to a named graph
    (reference IR declares Graph but never executes it,
    calc_data_types.rs:117-205). ``name`` is a Var (range over all
    named graphs, binding the var) or a Term (that graph only)."""

    name: "Term | Var"
    input: Op


@dataclass(frozen=True)
class Dataset(Op):
    """FROM / FROM NAMED dataset clauses (SPARQL 1.1 §13.2): the query
    executes against a dataset whose default graph is the MERGE of the
    ``default_graphs`` and whose named-graph set is ``named_graphs``.
    Either tuple may be empty — per spec, the presence of ANY dataset
    clause replaces the whole dataset, so FROM-only queries see no
    named graphs (GRAPH matches nothing) and FROM-NAMED-only queries
    see an empty default graph. The reference never consumes dataset
    clauses (spargebra parses them; interpreter.rs ignores the
    dataset field) — implementing them puts this engine ahead on
    declared surface, like Graph itself."""

    input: Op
    default_graphs: tuple[str, ...]
    named_graphs: tuple[str, ...]


@dataclass(frozen=True)
class Service(Op):
    """SERVICE [SILENT] <iri> { input }: evaluate the inner pattern
    against a registered secondary dataset (federation). The reference
    IR declares Service (calc_data_types.rs:117-205) but its
    interpreter recognizes only wikibase:label and panics on every
    other IRI (interpreter.rs:655-659); here any IRI registered via
    ``GraphEngine.register_service`` executes for real. Per SPARQL 1.1
    Federated Query §2.3, SILENT turns a service failure (here: an
    unregistered IRI) into the unit solution instead of an error."""

    iri: str
    input: Op
    silent: bool = False
    # For http(s) IRIs not registered in-process: the full SPARQL text
    # (prefix header + SELECT * over the raw body span, captured by the
    # parser) to POST to the remote endpoint (federation.py). None when
    # the algebra was built programmatically rather than parsed.
    remote_query: str | None = None


@dataclass(frozen=True)
class LabelService(Op):
    """The wikibase:label SERVICE rewrite target (reference
    rewrite_label_service, interpreter.rs:784-917): for each target
    (new_var, base_var, kind) add a language-prioritized lookup of the
    base entity's label/description/alias term edges."""

    input: Op
    langs: tuple[str, ...]
    targets: tuple[tuple[str, str, str], ...]  # (new_var, base_var, kind)


def pattern_vars(op: Op) -> set[str]:
    """All variable names an operator tree can bind."""
    out: set[str] = set()
    if isinstance(op, Bgp):
        for tp in op.patterns:
            for x in (tp.s, tp.p, tp.o):
                if isinstance(x, Var):
                    out.add(x.name)
    elif isinstance(op, PathPattern):
        for x in (op.s, op.o):
            if isinstance(x, Var):
                out.add(x.name)
    elif isinstance(op, Values):
        out.update(op.variables)
    elif isinstance(op, Extend):
        out = pattern_vars(op.input) | {op.var}
    elif isinstance(op, Project):
        out.update(op.variables)
    elif isinstance(op, Group):
        out.update(op.group_vars)
        out.update(a.var for a in op.aggregates)
    elif isinstance(op, Graph):
        out = pattern_vars(op.input) | (
            {op.name.name} if isinstance(op.name, Var) else set()
        )
    elif isinstance(op, LabelService):
        out = pattern_vars(op.input) | {t[0] for t in op.targets}
    else:
        for f_ in getattr(op, "__dataclass_fields__", {}):
            v = getattr(op, f_)
            if isinstance(v, Op):
                out |= pattern_vars(v)
    return out


#: binding_masks result-size bound — beyond this the analysis returns
#: None (callers fall back to a coarser approximation); keeps the
#: compat-join plan from exploding into hundreds of union branches
MASKS_CAP = 24


def binding_masks(op: Op) -> frozenset[frozenset[str]] | None:
    """The set of POSSIBLE bound-variable sets of solutions produced by
    ``op``, derived purely from the algebra (no data access), or None
    when a node makes it undeterminable. Over-approximate by design: a
    mask that cannot occur at runtime only adds an empty branch to a
    compatibility join, never a wrong answer. This is what lets the
    compat machinery stay action-free at plan time (ADVICE r02): the
    OPTIONAL/UNION/UNDEF structure that creates maybe-unbound vars is
    exactly the structure this reads the masks off of."""

    def capped(s: frozenset[frozenset[str]]) -> frozenset[frozenset[str]] | None:
        return s if len(s) <= MASKS_CAP else None

    if isinstance(op, (Bgp, PathPattern)):
        return frozenset({frozenset(pattern_vars(op))})
    if isinstance(op, Values):
        return capped(
            frozenset(
                frozenset(
                    v for i, v in enumerate(op.variables) if row[i] is not None
                )
                for row in op.rows
            )
        )
    if isinstance(op, (Join, LateralJoin)):
        l, r = binding_masks(op.left), binding_masks(op.right)
        if l is None or r is None:
            return None
        return capped(frozenset(a | b for a in l for b in r))
    if isinstance(op, LeftJoin):
        l, r = binding_masks(op.left), binding_masks(op.right)
        if l is None or r is None:
            return None
        return capped(frozenset(a | b for a in l for b in r) | l)
    if isinstance(op, Union):
        l, r = binding_masks(op.left), binding_masks(op.right)
        if l is None or r is None:
            return None
        return capped(l | r)
    if isinstance(op, Minus):
        return binding_masks(op.left)
    if isinstance(op, Extend):
        l = binding_masks(op.input)
        if l is None:
            return None
        # BIND errors leave the var unbound, so both shapes are possible
        return capped(frozenset(a | {op.var} for a in l) | l)
    if isinstance(op, Project):
        l = binding_masks(op.input)
        if l is None:
            return None
        keep = set(op.variables)
        return capped(frozenset(frozenset(a & keep) for a in l))
    if isinstance(op, Service):
        inner = binding_masks(op.input)
        if inner is None:
            return None
        # SILENT failure yields the unit solution (nothing bound)
        return capped(inner | {frozenset()}) if op.silent else inner
    if isinstance(op, LabelService):
        l = binding_masks(op.input)
        if l is None:
            return None
        # each lookup target independently hits or misses
        out = l
        for new_var, _base, _kind in op.targets:
            out = frozenset(a | {new_var} for a in out) | out
            if len(out) > MASKS_CAP:
                return None
        return out
    if isinstance(op, Graph):
        inner = binding_masks(op.input)
        if inner is None:
            return None
        if isinstance(op.name, Var):
            g = op.name.name
            return capped(frozenset(a | {g} for a in inner))
        return inner
    if isinstance(op, (Filter, OrderBy, Distinct, Reduced, Slice, Dataset)):
        # Filter can only REMOVE masks (e.g. FILTER(BOUND(?x))) — the
        # over-approximation stays sound
        return binding_masks(op.input)
    return None  # Group / Construct / Describe / unknown


def certain_vars(op: Op) -> set[str]:
    """Variable names an operator tree binds in EVERY solution
    (SPARQL's "certainly bound" static analysis). Conservative: a var
    not in this set may still always be bound at runtime. Used to pick
    the fast equality path for MINUS — compatibility semantics only
    need the general (domain-aware) path when a shared var can be
    unbound (OPTIONAL miss, one-armed UNION, UNDEF, error-able BIND,
    MIN/MAX/SAMPLE of empty-or-all-error groups)."""
    if isinstance(op, (Bgp, PathPattern)):
        return pattern_vars(op)
    if isinstance(op, Values):
        return {
            v
            for i, v in enumerate(op.variables)
            if all(row[i] is not None for row in op.rows)
        }
    if isinstance(op, (Join, LateralJoin)):
        return certain_vars(op.left) | certain_vars(op.right)
    if isinstance(op, LeftJoin):
        return certain_vars(op.left)  # right side only binds on match
    if isinstance(op, Union):
        return certain_vars(op.left) & certain_vars(op.right)
    if isinstance(op, Minus):
        return certain_vars(op.left)
    if isinstance(op, Extend):
        return certain_vars(op.input)  # BIND errors leave var unbound
    if isinstance(op, Project):
        return certain_vars(op.input) & set(op.variables)
    if isinstance(op, Group):
        certain = certain_vars(op.input)
        out = set(op.group_vars) & certain
        # COUNT always yields a value; other aggregates are unbound for
        # groups whose inputs all error (and SUM/AVG on non-numerics)
        out |= {a.var for a in op.aggregates if a.func == "count"}
        return out
    if isinstance(op, Graph):
        # every solution of GRAPH ?g binds ?g (to the matched graph)
        return certain_vars(op.input) | (
            {op.name.name} if isinstance(op.name, Var) else set()
        )
    if isinstance(op, Service):
        # SILENT: the unit solution binds nothing, so nothing is certain
        return set() if op.silent else certain_vars(op.input)
    if isinstance(op, LabelService):
        return certain_vars(op.input)  # lookup targets may miss
    if isinstance(op, (Filter, OrderBy, Distinct, Reduced, Slice, Dataset)):
        return certain_vars(op.input)
    return set()

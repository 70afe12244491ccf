"""SPARQL text front end — a strictly-scoped subset parser + evaluator.

Lets a query STRING run against any store (``TripleStore`` /
``DirectMappingStore``): tokenize → recursive-descent parse → compile to
the :mod:`.algebra` operators, which are plain Catalyst-visible
DataFrame plans. The same layering as the repo's vendored Turtle-subset
parser (``turtle.py``): a small, fully-tested grammar slice with HARD
failure on anything outside it — never a silent wrong answer.

Supported:

- ``PREFIX`` prologue; ``SELECT [DISTINCT] ?v… | *``, ``ASK``,
  ``CONSTRUCT { template }``
- group graph patterns: triple blocks (``;``/``,`` abbreviations),
  ``OPTIONAL {…}``, ``MINUS {…}``, ``{…} UNION {…}``,
  ``FILTER (expr)`` / ``FILTER NOT EXISTS {…}``, ``VALUES`` (inline
  data, ``UNDEF``)
- FILTER expressions: ``|| && !``, comparisons, arithmetic-free numeric
  compare via lexical→double, ``BOUND REGEX STR LANG DATATYPE isIRI
  isLiteral isBlank``, parentheses
- solution modifiers: ``ORDER BY [ASC|DESC](?v)…``, ``LIMIT n``,
  ``OFFSET n`` (OFFSET under ORDER BY forces the full sort — the
  top-k TakeOrderedAndProject shortcut only applies without OFFSET)
- aggregates: ``SELECT (COUNT(*) AS ?n) (SUM(?v) AS ?s) … GROUP BY ?g``
  — COUNT/COUNT(DISTINCT ?v)/SUM/AVG/MIN/MAX/SAMPLE/GROUP_CONCAT via
  :func:`.algebra.aggregate_solutions` (its lenient-numeric and
  deterministic GROUP_CONCAT/SAMPLE refinements apply); aggregate
  outputs are plain typed columns, group vars stay term structs

Out of scope (raise ``SparqlUnsupported``): property paths in query text
(use :func:`.algebra.path_closure` directly), ``HAVING``, ORDER BY or
DISTINCT over aggregate results (sort/dedupe the returned frame),
subqueries,
``GRAPH``/named graphs, ``DESCRIBE`` text form, ``BIND``,
federated ``SERVICE``. Bound literal OBJECTS in triple patterns match by
lexical form (``get_statements`` value semantics — a pattern object
``"30"`` also matches ``"30"^^xsd:integer``); FILTER equality, by
contrast, is exact on whatever the expression reads. The evaluator
inherits the algebra layer's
well-designed-pattern restriction: OPTIONAL/NOT-EXISTS sharing only
maybe-unbound variables is refused at plan time, not answered wrongly.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from . import algebra as A

__all__ = ["sparql", "parse_query", "SparqlError", "SparqlUnsupported"]


class SparqlError(ValueError):
    pass


class SparqlUnsupported(SparqlError):
    pass


# --- tokenizer ---------------------------------------------------------------

_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+|\#[^\n]*)
  | (?P<iri><[^<>\s]*>)
  | (?P<string>"(?:[^"\\]|\\.)*")
  | (?P<var>\?[A-Za-z_][A-Za-z0-9_]*)
  | (?P<num>[+-]?\d+(?:\.\d+)?)
  | (?P<langtag>@[A-Za-z]+(?:-[A-Za-z0-9]+)*)
  | (?P<dtmark>\^\^)
  | (?P<pname>[A-Za-z_][A-Za-z0-9_-]*:[A-Za-z0-9_.%-]*)
  | (?P<kw>[A-Za-z][A-Za-z_]*)
  | (?P<op>&&|\|\||!=|<=|>=|[{}().,;*=<>!])
    """,
    re.VERBOSE,
)

_KEYWORDS = {
    "PREFIX", "SELECT", "DISTINCT", "WHERE", "OPTIONAL", "UNION", "MINUS",
    "FILTER", "NOT", "EXISTS", "VALUES", "UNDEF", "ORDER", "BY", "ASC",
    "DESC", "LIMIT", "ASK", "CONSTRUCT", "BOUND", "REGEX", "STR", "LANG",
    "DATATYPE", "ISIRI", "ISURI", "ISLITERAL", "ISBLANK", "TRUE", "FALSE",
    "A",
    # supported modifiers/aggregates
    "GROUP", "OFFSET", "COUNT", "SUM", "AVG", "MIN", "MAX", "SAMPLE",
    "GROUP_CONCAT", "AS",
    # recognized-but-unsupported (clean error instead of parse garbage)
    "BIND", "GRAPH", "SERVICE", "DESCRIBE", "HAVING",
}


@dataclass
class _Tok:
    kind: str
    text: str
    pos: int


def _tokenize(q: str) -> list[_Tok]:
    out, i = [], 0
    while i < len(q):
        m = _TOKEN_RE.match(q, i)
        if not m:
            raise SparqlError(f"cannot tokenize at …{q[i:i+20]!r}")
        i = m.end()
        kind = m.lastgroup
        if kind == "ws":
            continue
        text = m.group()
        if kind == "kw":
            up = text.upper()
            if up not in _KEYWORDS:
                raise SparqlError(f"unknown keyword {text!r}")
            out.append(_Tok("kw", up, m.start()))
        else:
            out.append(_Tok(kind, text, m.start()))
    out.append(_Tok("eof", "", len(q)))
    return out


# --- AST ----------------------------------------------------------------------


@dataclass
class _Pattern:  # one triple pattern; terms are ('var',name) or RDF terms
    s: tuple
    p: tuple
    o: tuple


@dataclass
class _Group:
    patterns: list = field(default_factory=list)  # _Pattern (the BGP)
    optionals: list = field(default_factory=list)  # _Group
    minuses: list = field(default_factory=list)  # _Group
    not_exists: list = field(default_factory=list)  # _Group
    filters: list = field(default_factory=list)  # expr AST
    union: "tuple[_Group, _Group] | None" = None
    values: "tuple[list[str], list[tuple]] | None" = None


@dataclass
class _Query:
    form: str  # select | ask | construct
    select_vars: "list[str] | None" = None  # None = *
    distinct: bool = False
    template: "list[_Pattern] | None" = None
    where: _Group | None = None
    order: list = field(default_factory=list)  # (var, asc)
    limit: int | None = None
    aggs: dict = field(default_factory=dict)  # out -> (func, var|None)
    offset: int | None = None
    group_by: list = field(default_factory=list)  # grouping var names


# --- parser --------------------------------------------------------------------


class _Parser:
    def __init__(self, q: str):
        self.toks = _tokenize(q)
        self.i = 0
        self.prefixes: dict[str, str] = {}

    def peek(self) -> _Tok:
        return self.toks[self.i]

    def next(self) -> _Tok:
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect(self, kind: str, text: str | None = None) -> _Tok:
        t = self.next()
        if t.kind != kind or (text is not None and t.text != text):
            raise SparqlError(
                f"expected {text or kind} at position {t.pos}, got {t.text!r}"
            )
        return t

    def at_kw(self, *kws: str) -> bool:
        t = self.peek()
        return t.kind == "kw" and t.text in kws

    # -- entry
    def parse(self) -> _Query:
        while self.at_kw("PREFIX"):
            self.next()
            pn = self.expect("pname").text
            if not pn.endswith(":") and ":" in pn:
                # pname token includes local part; prefix decl must be bare
                raise SparqlError(f"bad PREFIX name {pn!r}")
            iri = self.expect("iri").text
            self.prefixes[pn[:-1] if pn.endswith(":") else pn.split(":")[0]] = iri[1:-1]
        if self.at_kw("SELECT"):
            return self._select()
        if self.at_kw("ASK"):
            self.next()
            return _Query(form="ask", where=self._group())
        if self.at_kw("CONSTRUCT"):
            return self._construct()
        if self.at_kw("DESCRIBE", "GROUP", "BIND", "GRAPH", "SERVICE"):
            raise SparqlUnsupported(
                f"{self.peek().text} is outside the supported subset"
            )
        raise SparqlError(f"expected SELECT/ASK/CONSTRUCT, got {self.peek().text!r}")

    def _select(self) -> _Query:
        self.next()
        q = _Query(form="select")
        if self.at_kw("DISTINCT"):
            self.next()
            q.distinct = True
        if self.peek().kind == "op" and self.peek().text == "*":
            self.next()
            q.select_vars = None
        else:
            vs = []
            while True:
                t = self.peek()
                if t.kind == "var":
                    vs.append(self.next().text[1:])
                    continue
                if t.kind == "op" and t.text == "(":
                    self.next()
                    out, spec = self._agg_projection()
                    if out in q.aggs or out in vs:
                        raise SparqlError(f"duplicate projection ?{out}")
                    q.aggs[out] = spec
                    continue
                break
            if not vs and not q.aggs:
                raise SparqlError("SELECT needs ?vars or *")
            q.select_vars = vs
        if self.at_kw("WHERE"):
            self.next()
        q.where = self._group()
        self._modifiers(q)
        return q

    _AGG_KWS = {
        "COUNT": "count", "SUM": "sum", "AVG": "avg", "MIN": "min",
        "MAX": "max", "SAMPLE": "sample", "GROUP_CONCAT": "group_concat",
    }

    def _agg_projection(self) -> "tuple[str, tuple]":
        """Inside '(': AGG '(' [DISTINCT] (?v | *) ')' AS ?out ')'."""
        t = self.next()
        if t.kind != "kw" or t.text not in self._AGG_KWS:
            raise SparqlUnsupported(
                "expression projections are outside the supported subset "
                "(only aggregate projections are)"
            )
        func = self._AGG_KWS[t.text]
        self.expect("op", "(")
        distinct = False
        if self.at_kw("DISTINCT"):
            self.next()
            distinct = True
        if self.peek().kind == "op" and self.peek().text == "*":
            self.next()
            var = None
        else:
            var = self.expect("var").text[1:]
        self.expect("op", ")")
        if distinct:
            if func != "count" or var is None:
                raise SparqlUnsupported(
                    "DISTINCT inside aggregates is supported only for "
                    "COUNT(DISTINCT ?v)"
                )
            func = "count_distinct"
        self.expect("kw", "AS")
        out = self.expect("var").text[1:]
        self.expect("op", ")")
        return out, (func, var)

    def _construct(self) -> _Query:
        self.next()
        q = _Query(form="construct", template=[])
        self.expect("op", "{")
        q.template = self._triples_block()
        self.expect("op", "}")
        if self.at_kw("WHERE"):
            self.next()
        q.where = self._group()
        self._modifiers(q)
        return q

    def _modifiers(self, q: _Query) -> None:
        if self.at_kw("GROUP"):
            self.next()
            self.expect("kw", "BY")
            while self.peek().kind == "var":
                q.group_by.append(self.next().text[1:])
            if not q.group_by:
                raise SparqlError("GROUP BY needs at least one ?var")
        if self.at_kw("HAVING"):
            raise SparqlUnsupported(
                "HAVING is outside the supported subset — filter the "
                "returned frame"
            )
        if self.at_kw("ORDER"):
            self.next()
            self.expect("kw", "BY")
            while True:
                asc = True
                if self.at_kw("ASC", "DESC"):
                    asc = self.next().text == "ASC"
                    self.expect("op", "(")
                    var = self.expect("var").text[1:]
                    self.expect("op", ")")
                elif self.peek().kind == "var":
                    var = self.next().text[1:]
                else:
                    break
                q.order.append((var, asc))
            if not q.order:
                raise SparqlError("ORDER BY needs at least one sort key")
        while self.at_kw("LIMIT", "OFFSET"):
            which = self.next().text
            n = int(self.expect("num").text)
            if which == "LIMIT":
                q.limit = n
            else:
                q.offset = n
        if self.peek().kind != "eof":
            raise SparqlError(f"trailing content: {self.peek().text!r}")

    # -- group graph pattern
    def _group(self) -> _Group:
        self.expect("op", "{")
        g = _Group()
        while True:
            t = self.peek()
            if t.kind == "op" and t.text == "}":
                self.next()
                break
            if t.kind == "op" and t.text == "{":
                # either a plain nested group or the left arm of UNION
                sub = self._group()
                if self.at_kw("UNION"):
                    self.next()
                    right = self._union_arm()
                    if (g.patterns or g.optionals or g.filters or g.minuses
                            or g.not_exists or g.values):
                        raise SparqlUnsupported(
                            "UNION mixed with other patterns in one group "
                            "is outside the supported subset — nest it"
                        )
                    g.union = (sub, right)
                else:
                    raise SparqlUnsupported(
                        "bare nested groups are outside the supported "
                        "subset (only OPTIONAL/MINUS/UNION/NOT EXISTS nest)"
                    )
                continue
            if self.at_kw("OPTIONAL"):
                self.next()
                g.optionals.append(self._group())
                continue
            if self.at_kw("MINUS"):
                self.next()
                g.minuses.append(self._group())
                continue
            if self.at_kw("FILTER"):
                self.next()
                if self.at_kw("NOT"):
                    self.next()
                    self.expect("kw", "EXISTS")
                    g.not_exists.append(self._group())
                else:
                    g.filters.append(self._expr_primary_paren())
                continue
            if self.at_kw("VALUES"):
                self.next()
                g.values = self._values()
                continue
            if self.at_kw("BIND", "GRAPH", "SERVICE"):
                raise SparqlUnsupported(
                    f"{t.text} is outside the supported subset"
                )
            # triples
            g.patterns.extend(self._triples_block())
        return g

    def _union_arm(self) -> _Group:
        arm = self._group()
        if self.at_kw("UNION"):
            self.next()
            right = self._union_arm()
            outer = _Group()
            outer.union = (arm, right)
            return outer
        return arm

    def _values(self) -> tuple[list[str], list[tuple]]:
        vs = []
        if self.peek().kind == "var":
            vs = [self.next().text[1:]]
            self.expect("op", "{")
            rows = []
            while not (self.peek().kind == "op" and self.peek().text == "}"):
                rows.append((self._values_term(),))
            self.expect("op", "}")
            return vs, rows
        self.expect("op", "(")
        while self.peek().kind == "var":
            vs.append(self.next().text[1:])
        self.expect("op", ")")
        self.expect("op", "{")
        rows = []
        while self.peek().kind == "op" and self.peek().text == "(":
            self.next()
            row = tuple(self._values_term() for _ in vs)
            self.expect("op", ")")
            rows.append(row)
        self.expect("op", "}")
        return vs, rows

    def _values_term(self):
        if self.at_kw("UNDEF"):
            self.next()
            return None
        return self._term(allow_var=False)

    # -- triples with ; and , abbreviations
    def _triples_block(self) -> list[_Pattern]:
        pats: list[_Pattern] = []
        while True:
            t = self.peek()
            if t.kind == "op" and t.text == "}":
                break
            if t.kind == "kw" and t.text in (
                "OPTIONAL", "MINUS", "FILTER", "VALUES", "BIND", "GRAPH",
                "SERVICE",
            ):
                break
            s = self._term()
            while True:
                p = self._verb()
                while True:
                    o = self._term()
                    pats.append(_Pattern(s, p, o))
                    if self.peek().kind == "op" and self.peek().text == ",":
                        self.next()
                        continue
                    break
                if self.peek().kind == "op" and self.peek().text == ";":
                    self.next()
                    if self.peek().kind == "op" and self.peek().text in (".", "}"):
                        break  # dangling ';'
                    continue
                break
            if self.peek().kind == "op" and self.peek().text == ".":
                self.next()
                continue
            break
        return pats

    def _verb(self) -> tuple:
        if self.at_kw("A"):
            self.next()
            return ("iri", "http://www.w3.org/1999/02/22-rdf-syntax-ns#type")
        return self._term()

    def _term(self, allow_var: bool = True) -> tuple:
        t = self.next()
        if t.kind == "var":
            if not allow_var:
                raise SparqlError(f"variable not allowed at {t.pos}")
            return ("var", t.text[1:])
        if t.kind == "iri":
            return ("iri", t.text[1:-1])
        if t.kind == "pname":
            pre, _, local = t.text.partition(":")
            if pre not in self.prefixes:
                raise SparqlError(f"undeclared prefix {pre!r}:")
            return ("iri", self.prefixes[pre] + local)
        if t.kind == "string":
            lex = _unescape(t.text[1:-1])
            nxt = self.peek()
            if nxt.kind == "langtag":
                self.next()
                return ("literal", lex, None, nxt.text[1:].lower())
            if nxt.kind == "dtmark":
                self.next()
                dt = self._term(allow_var=False)
                if dt[0] != "iri":
                    raise SparqlError("datatype must be an IRI")
                return ("literal", lex, dt[1], None)
            return ("literal", lex, None, None)
        if t.kind == "num":
            dt = (
                "http://www.w3.org/2001/XMLSchema#integer"
                if re.fullmatch(r"[+-]?\d+", t.text)
                else "http://www.w3.org/2001/XMLSchema#decimal"
            )
            return ("literal", t.text, dt, None)
        if t.kind == "kw" and t.text in ("TRUE", "FALSE"):
            return ("literal", t.text.lower(),
                    "http://www.w3.org/2001/XMLSchema#boolean", None)
        raise SparqlError(f"expected term at position {t.pos}, got {t.text!r}")

    # -- FILTER expressions (precedence: || < && < cmp < unary)
    def _expr_primary_paren(self):
        self.expect("op", "(")
        e = self._expr_or()
        self.expect("op", ")")
        return e

    def _expr_or(self):
        left = self._expr_and()
        while self.peek().kind == "op" and self.peek().text == "||":
            self.next()
            left = ("or", left, self._expr_and())
        return left

    def _expr_and(self):
        left = self._expr_cmp()
        while self.peek().kind == "op" and self.peek().text == "&&":
            self.next()
            left = ("and", left, self._expr_cmp())
        return left

    def _expr_cmp(self):
        left = self._expr_unary()
        t = self.peek()
        if t.kind == "op" and t.text in ("=", "!=", "<", ">", "<=", ">="):
            self.next()
            return ("cmp", t.text, left, self._expr_unary())
        return left

    def _expr_unary(self):
        t = self.peek()
        if t.kind == "op" and t.text == "!":
            self.next()
            return ("not", self._expr_unary())
        if t.kind == "op" and t.text == "(":
            return self._expr_primary_paren()
        if t.kind == "kw" and t.text in (
            "BOUND", "REGEX", "STR", "LANG", "DATATYPE", "ISIRI", "ISURI",
            "ISLITERAL", "ISBLANK",
        ):
            fn = self.next().text
            self.expect("op", "(")
            args = [self._expr_or()]
            while self.peek().kind == "op" and self.peek().text == ",":
                self.next()
                args.append(self._expr_or())
            self.expect("op", ")")
            return ("call", fn, args)
        return ("term", self._term())


def _unescape(s: str) -> str:
    """Full Turtle-style escape handling — reuses the vendored parser's
    table (\\n \\t \\r \\b \\f quotes, \\uXXXX, \\UXXXXXXXX) instead of
    re-implementing a weaker copy."""
    from .turtle import _unescape as _turtle_unescape

    return _turtle_unescape(s)


def parse_query(q: str) -> "_Query":
    """Parse a SPARQL string into the internal AST (exposed for tests)."""
    return _Parser(q).parse()


# --- evaluator -------------------------------------------------------------------


def _ast_term_to_bgp(t: tuple) -> str:
    """AST term -> match_bgp textual term. Non-var terms pass the raw
    value (match_bgp binds on value via get_statements)."""
    if t[0] == "var":
        return "?" + t[1]
    return t[1]


def _compile_expr(e, columns: "set[str]") -> Column:
    kind = e[0]
    if kind == "or":
        return _compile_expr(e[1], columns) | _compile_expr(e[2], columns)
    if kind == "and":
        return _compile_expr(e[1], columns) & _compile_expr(e[2], columns)
    if kind == "not":
        return ~_compile_expr(e[1], columns)
    if kind == "cmp":
        op, l, r = e[1], e[2], e[3]
        lc, ln = _operand(l, columns)
        rc, rn = _operand(r, columns)

        def apply(a, b):
            if op == "=":
                return a == b
            if op == "!=":
                return a != b
            if op == "<":
                return a < b
            if op == ">":
                return a > b
            if op == "<=":
                return a <= b
            return a >= b

        if ln or rn:
            # a parse-time numeric literal forces numeric comparison
            return apply(_as_num(l, columns), _as_num(r, columns))
        # =/!= with a bare variable operand: RDFterm-equal, not value
        # equality (ADVICE r7 #1 — value-only comparison made
        # FILTER(?o = "x") match "x"@en and <x> too). The non-numeric
        # branch compares the full term (kind/lang/datatype guards from
        # the non-var operand, full-struct equality var-vs-var);
        # explicitly stringified operands (STR(...)) keep value
        # comparison, which is what STR is for.
        term_eq = _term_equal(l, r, lc, rc)
        if op in ("=", "!=") and term_eq is not None:
            an, bn = _as_num(l, columns), _as_num(r, columns)
            neq = term_eq if op == "=" else ~term_eq
            return F.when(
                an.isNotNull() & bn.isNotNull(), apply(an, bn)
            ).otherwise(neq)
        # runtime dispatch: numeric when BOTH sides evaluate numerically
        # (var-vs-var / var-vs-string cases), lexical otherwise — a
        # "10"^^xsd:integer never compares below "9" as a string
        an, bn = _as_num(l, columns), _as_num(r, columns)
        return F.when(
            an.isNotNull() & bn.isNotNull(), apply(an, bn)
        ).otherwise(apply(lc, rc))
    if kind == "call":
        fn, args = e[1], e[2]
        def arity(lo, hi=None):
            hi2 = lo if hi is None else hi
            if not (lo <= len(args) <= hi2):
                raise SparqlError(
                    f"{fn} takes {lo}"
                    + (f"-{hi2}" if hi2 != lo else "")
                    + f" arguments, got {len(args)}"
                )

        if fn == "BOUND":
            arity(1)
            return A.bound(_arg_var(args[0]))
        if fn == "REGEX":
            arity(2, 3)
            pat = _arg_literal(args[1])
            if len(args) == 3:
                flags = _arg_literal(args[2])
                if not set(flags) <= set("ismx"):
                    raise SparqlUnsupported(f"REGEX flags {flags!r}")
                pat = f"(?{flags})" + pat
            return _operand(args[0], columns)[0].rlike(pat)
        arity(1)
        if fn == "STR":
            return _operand(args[0], columns)[0]
        if fn == "LANG":
            return A.var_lang(_arg_var(args[0]))
        if fn == "DATATYPE":
            return A.var_datatype(_arg_var(args[0]))
        if fn in ("ISIRI", "ISURI"):
            return A.is_iri(_arg_var(args[0]))
        if fn == "ISLITERAL":
            return A.is_literal(_arg_var(args[0]))
        if fn == "ISBLANK":
            return A.is_blank(_arg_var(args[0]))
        raise SparqlUnsupported(f"function {fn}")
    if kind == "term":
        # a bare term in boolean position: only booleans make sense
        raise SparqlError("bare term is not a boolean FILTER expression")
    raise SparqlError(f"bad expression node {kind!r}")


_NUM_DTS = {
    "http://www.w3.org/2001/XMLSchema#integer",
    "http://www.w3.org/2001/XMLSchema#decimal",
    "http://www.w3.org/2001/XMLSchema#double",
}


def _operand(e, columns) -> "tuple[Column, bool]":
    """-> (value column, is-numeric-literal)."""
    if e[0] == "call":
        return _compile_expr(e, columns), False
    if e[0] != "term":
        raise SparqlError("comparison operand must be a term or function")
    t = e[1]
    if t[0] == "var":
        if t[1] not in columns:
            raise SparqlError(f"unbound variable ?{t[1]} in FILTER")
        return A.var_value(t[1]), False
    if t[0] == "literal":
        return F.lit(t[1]), (t[2] in _NUM_DTS)
    return F.lit(t[1]), False  # iri


_XSD_STRING = "http://www.w3.org/2001/XMLSchema#string"


def _is_bare_var(e) -> bool:
    return e[0] == "term" and e[1][0] == "var"


def _term_equal(l, r, lc: Column, rc: Column) -> Column | None:
    """RDFterm-equal as a Column for ``=`` / ``!=`` when at least one
    operand is a bare variable; ``None`` tells the caller to keep plain
    value comparison (no bare var: constants, or explicitly stringified
    ``STR(...)`` operands, where value semantics are the point).

    ADVICE r7 #1: value-only comparison made ``FILTER(?o = "x")`` match the
    simple literal "x", the lang-tagged "x"@en AND the IRI <x>; SPARQL
    RDFterm-equal keeps only the simple literal. Guards come from the
    non-var operand: kind must match, a lang-tagged query literal must
    match the tag (case-insensitively), a simple literal matches plain
    literals (NULL/'' lang, NULL datatype — and xsd:string, its RDF 1.1
    synonym), a typed literal must match the datatype. Var-vs-var compares
    the full term struct (null-safe per field via Spark's struct ordering;
    an unbound side yields NULL and the solution is eliminated, matching
    SPARQL's error semantics). Known simplification, documented: for
    incomparable literal pairs (e.g. "x"@en vs "x") SPARQL raises a type
    error, eliminating the row under BOTH = and !=; the struct form keeps
    the row under !=."""
    lv, rv = _is_bare_var(l), _is_bare_var(r)
    if not (lv or rv):
        return None
    if lv and rv:
        return F.col(l[1][1]) == F.col(r[1][1])
    var_e, const_e = (l, r) if lv else (r, l)
    if const_e[0] != "term":
        return None  # call operand (STR/LANG/...): value semantics
    t = F.col(var_e[1][1])
    c = const_e[1]
    if c[0] == "iri":
        return (t.getField("kind") == "iri") & (t.getField("value") == F.lit(c[1]))
    # literal: ("literal", lex, datatype|None, lang|None)
    _, lex, dt, lang = c
    eq = (t.getField("kind") == "literal") & (t.getField("value") == F.lit(lex))
    lang_norm = F.lower(F.coalesce(t.getField("lang"), F.lit("")))
    if lang:
        return eq & (lang_norm == F.lit(lang))
    if dt is None or dt == _XSD_STRING:
        return (
            eq
            & (lang_norm == F.lit(""))
            & (
                t.getField("datatype").isNull()
                | (t.getField("datatype") == F.lit(_XSD_STRING))
            )
        )
    return eq & (t.getField("datatype") == F.lit(dt))


def _as_num(e, columns) -> Column:
    if e[0] == "term" and e[1][0] == "var":
        return A.var_num(e[1][1])
    if e[0] == "term" and e[1][0] == "literal":
        try:
            return F.lit(float(e[1][1]))
        except ValueError:
            # non-numeric string literal: typed NULL, so the runtime
            # numeric-dispatch branch can never fire against it
            return F.lit(None).cast("double")
    if e[0] == "call":
        # ADVICE r7 #2: an explicitly stringified operand (STR(?x) etc.)
        # demands codepoint string comparison — returning a typed NULL here
        # guarantees the numeric-dispatch branch never fires against it,
        # so FILTER(STR(?a) < STR(?b)) on numeric-looking lexicals compares
        # lexically ('10' < '9' is true).
        return F.lit(None).cast("double")
    return _operand(e, columns)[0].try_cast("double")


def _arg_var(e) -> str:
    if e[0] == "term" and e[1][0] == "var":
        return e[1][1]
    raise SparqlError("this function takes a variable argument")


def _arg_literal(e) -> str:
    if e[0] == "term" and e[1][0] == "literal":
        return e[1][1]
    raise SparqlError("this function takes a literal argument")


def _eval_group(store, g: _Group, spark) -> DataFrame:
    if g.union is not None:
        return A.union(
            _eval_group(store, g.union[0], spark),
            _eval_group(store, g.union[1], spark),
        )
    if not g.patterns and not g.values:
        raise SparqlError("empty group graph pattern")
    acc: DataFrame | None = None
    if g.patterns:
        acc = store.bgp(
            [
                (
                    _ast_term_to_bgp(p.s),
                    _ast_term_to_bgp(p.p),
                    _ast_term_to_bgp(p.o),
                )
                for p in g.patterns
            ]
        )
    if g.values is not None:
        vf = A.values_frame(spark, g.values[0], g.values[1])
        if acc is None:
            acc = vf
        else:
            shared = sorted(set(acc.columns) & set(vf.columns))
            if not shared:
                acc = acc.crossJoin(vf)
            else:
                # SPARQL compatibility: an UNDEF (NULL) entry in the
                # VALUES row is compatible with ANY binding — so the join
                # condition per shared var is (vf-side NULL) OR equal.
                # VALUES frames are query-literal-sized; the non-equi
                # condition still broadcasts.
                rv = vf
                for v in shared:
                    rv = rv.withColumnRenamed(v, f"__v_{v}")
                cond = None
                for v in shared:
                    c = F.col(f"__v_{v}").isNull() | (
                        F.col(f"__v_{v}") == F.col(v)
                    )
                    cond = c if cond is None else (cond & c)
                acc = acc.join(rv, cond, "inner").drop(
                    *[f"__v_{v}" for v in shared]
                )
    for og in g.optionals:
        acc = A.optional(acc, _eval_group(store, og, spark))
    for mg in g.minuses:
        acc = A.minus(acc, _eval_group(store, mg, spark))
    for ng in g.not_exists:
        acc = A.not_exists(acc, _eval_group(store, ng, spark))
    for fe in g.filters:
        acc = A.filter_solutions(acc, _compile_expr(fe, set(acc.columns)))
    return acc


def sparql(store, query: str) -> DataFrame:
    """Run a SPARQL query string against a store.

    SELECT → a solution frame (one term-struct column per variable);
    ASK → a single-row frame with boolean column ``ask``;
    CONSTRUCT → an 8-column triple frame. The plan is whatever the
    algebra layer composes — pruned per-pattern scans, equi-joins on term
    identity, TakeOrderedAndProject under LIMIT — nothing interpreter-ish
    survives into execution."""
    ast = parse_query(query)
    spark = None
    for attr in ("spark", "_spark"):
        spark = getattr(store, attr, None)
        if spark is not None:
            break
    if spark is None:
        from pyspark.sql import SparkSession

        spark = SparkSession.getActiveSession()
    sol = _eval_group(store, ast.where, spark)

    def _slice(df):
        if ast.offset:
            df = df.offset(ast.offset)
        if ast.limit is not None:
            df = df.limit(ast.limit)
        return df

    def _order_slice(df):
        if ast.order:
            df = A.order_limit(df, ast.order,
                               None if ast.offset else ast.limit)
            return _slice(df) if ast.offset else df
        return _slice(df)

    if ast.form == "ask":
        return sol.limit(1).groupBy().agg(
            (F.count(F.lit(1)) > 0).alias("ask")
        )
    if ast.form == "construct":
        # solution modifiers apply to the solution sequence BEFORE
        # templating (CONSTRUCT ... WHERE {...} ORDER BY ?x LIMIT n
        # templates only the selected n solutions)
        sol = _order_slice(sol)
        tpl = []
        for p in ast.template:
            for t in (p.s, p.p, p.o):
                if t[0] == "literal":
                    raise SparqlUnsupported(
                        "literal terms in CONSTRUCT templates are outside "
                        "the supported subset (constants must be IRIs)"
                    )
            tpl.append(
                (
                    _ast_term_to_bgp(p.s),
                    _ast_term_to_bgp(p.p),
                    _ast_term_to_bgp(p.o),
                )
            )
        return A.construct(sol, tpl)
    if ast.group_by and not ast.aggs:
        # GROUP BY with no aggregates = one row per group (the group keys)
        stray = [v for v in (ast.select_vars or []) if v not in ast.group_by]
        if stray:
            raise SparqlError(
                f"non-aggregated SELECT vars must be in GROUP BY: {stray}"
            )
        keys = ast.select_vars or ast.group_by
        return _order_slice(A.distinct_solutions(A.project(sol, *keys)))
    if ast.aggs:
        # aggregate query: GROUP BY vars (or one global group), agg
        # outputs become plain typed columns
        if ast.distinct:
            raise SparqlUnsupported(
                "SELECT DISTINCT with aggregates is outside the subset"
            )
        if ast.order:
            raise SparqlUnsupported(
                "ORDER BY on aggregate results is outside the subset — "
                "sort the returned frame"
            )
        stray = [v for v in (ast.select_vars or []) if v not in ast.group_by]
        if stray:
            raise SparqlError(
                f"non-aggregated SELECT vars must be in GROUP BY: {stray}"
            )
        missing = [v for v in ast.group_by if v not in sol.columns]
        if missing:
            raise SparqlError(f"GROUP BY of unbound variables: {missing}")
        if ast.group_by:
            out = A.aggregate_solutions(sol, ast.group_by, ast.aggs)
        else:
            out = A.aggregate_solutions(
                sol.withColumn("__g", F.lit(1)), ["__g"], ast.aggs
            ).drop("__g")
        keep = [*(ast.select_vars or []), *ast.aggs.keys()]
        out = out.select(*keep) if keep else out
        return _slice(out)
    # select — SPARQL modifier order: project+DISTINCT first, then
    # ORDER/LIMIT slice the distinct projected solutions
    if ast.select_vars is not None:
        missing = [v for v in ast.select_vars if v not in sol.columns]
        if missing:
            raise SparqlError(f"SELECT of unbound variables: {missing}")
        if ast.distinct:
            bad = [v for v, _ in ast.order if v not in ast.select_vars]
            if bad:
                raise SparqlUnsupported(
                    "ORDER BY on non-projected variables under DISTINCT "
                    f"is outside the supported subset: {bad}"
                )
            sol = A.distinct_solutions(A.project(sol, *ast.select_vars))
            if ast.order:
                sol = A.order_limit(sol, ast.order,
                                    None if ast.offset else ast.limit)
                return _slice(sol) if ast.offset else sol
            return _slice(sol)
        if ast.order:
            sol = A.order_limit(sol, ast.order,
                                None if ast.offset else ast.limit)
            sol = _slice(sol) if ast.offset else sol
        else:
            sol = _slice(sol)
        return A.project(sol, *ast.select_vars)
    if ast.distinct:
        sol = A.distinct_solutions(sol)
    if ast.order:
        sol = A.order_limit(sol, ast.order,
                            None if ast.offset else ast.limit)
        return _slice(sol) if ast.offset else sol
    return _slice(sol)

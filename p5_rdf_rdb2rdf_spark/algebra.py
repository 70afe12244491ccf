"""SPARQL-algebra operators over BGP solution frames.

:func:`p5_rdf_rdb2rdf_spark.store.match_bgp` answers a conjunctive basic
graph pattern with a *solution frame*: one row per solution, one
``struct<kind,value,datatype,lang>`` column per variable (full RDF term
identity). This module adds the algebra the reference's consumers reach
for next — OPTIONAL (left join), UNION, FILTER, projection/DISTINCT — as
compositions over those frames, so a constructed KG can be *queried*, not
just serialized. The reference (CPAN RDF-RDB2RDF, SURVEY.md §4.3) hands
its Store to RDF::Trine, whose ``RDF::Trine::Store::DBI`` answers exactly
this algebra subset SQL-side; re-expressing it over Spark DataFrames is
the same layering: every operator stays a Catalyst-visible relational op
(left outer equi-join, union-all, predicate filter), so pushdown, AQE
broadcast, and whole-stage codegen all apply — nothing here adds a Python
boundary or a driver-side loop.

Scale notes (the 10^12-triple read):

- ``optional`` is a LEFT OUTER **equi-join** on the shared variables'
  full term structs. SPARQL's general LeftJoin compatibility ("unbound is
  compatible with anything") is NOT an equi-join and degenerates to a
  nested loop at scale; this implementation targets *well-designed*
  patterns (Pérez, Arenas, Gutierrez, "Semantics and Complexity of
  SPARQL", TODS 2009: every variable shared between an OPTIONAL's inside
  and outside also occurs in the outer required part — the overwhelmingly
  common case, and the one where strict equality IS the SPARQL
  semantics). Nesting OPTIONALs so that a shared variable may arrive
  *unbound* from the left (non-well-designed) is rejected at runtime when
  detectable statically: a shared variable that is NULLABLE on either
  side (introduced by a previous ``optional`` or a variable-misaligned
  ``union``) makes the operator refuse.
- ``union`` is a bag-semantics ``unionByName(allowMissingColumns=True)``;
  variables absent from one branch surface as NULL structs (SPARQL
  unbound). No shuffle.
- ``filter_solutions`` takes a Spark Column; SPARQL's error semantics
  (evaluation error ⇒ solution eliminated) coincide with SQL's
  NULL-predicate-drops-row once term accessors return NULL on kind/type
  mismatch — which the accessors below do via conditional casts. Filters
  over values compile to plain predicates Catalyst can push through the
  joins above them.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .terms import KIND_BLANK, KIND_IRI, KIND_LITERAL

__all__ = [
    "optional",
    "union",
    "filter_solutions",
    "project",
    "distinct_solutions",
    "path_closure",
    "not_exists",
    "minus",
    "construct",
    "aggregate_solutions",
    "order_limit",
    "values_frame",
    "describe",
    "var_value",
    "var_num",
    "var_lang",
    "var_datatype",
    "is_iri",
    "is_literal",
    "is_blank",
    "bound",
]


# --- term accessors (SPARQL builtins over the term struct) -----------------


def var_value(name: str) -> Column:
    """``STR(?name)`` — the lexical form / IRI string (NULL if unbound)."""
    return F.col(name).getField("value")


def var_num(name: str) -> Column:
    """Numeric value of ``?name``: the lexical form cast to double, NULL
    (⇒ SPARQL type error ⇒ solution eliminated under FILTER) when the term
    is not a literal or its lexical form is not numeric. ``try_cast`` (not
    ``cast``: under Spark 4's ANSI default a malformed cast RAISES) yields
    NULL on garbage, which is exactly SPARQL's error-eliminates-solution."""
    t = F.col(name)
    return F.when(
        t.getField("kind") == KIND_LITERAL,
        t.getField("value").try_cast("double"),
    )


def var_lang(name: str) -> Column:
    """``LANG(?name)`` — '' for a plain/typed literal, NULL if not a
    literal (SPARQL raises a type error; NULL propagates the same way)."""
    t = F.col(name)
    return F.when(
        t.getField("kind") == KIND_LITERAL,
        F.coalesce(t.getField("lang"), F.lit("")),
    )


def var_datatype(name: str) -> Column:
    """``DATATYPE(?name)`` — the datatype IRI (NULL for non-literals)."""
    return F.col(name).getField("datatype")


def is_iri(name: str) -> Column:
    return F.col(name).getField("kind") == KIND_IRI


def is_literal(name: str) -> Column:
    return F.col(name).getField("kind") == KIND_LITERAL


def is_blank(name: str) -> Column:
    return F.col(name).getField("kind") == KIND_BLANK


def bound(name: str) -> Column:
    """``BOUND(?name)`` — false on the NULL struct a failed OPTIONAL or a
    branch-missing UNION variable leaves behind."""
    return F.col(name).isNotNull()


# --- algebra operators ------------------------------------------------------


def optional(left: DataFrame, right: DataFrame) -> DataFrame:
    """SPARQL ``OPTIONAL`` (LeftJoin) for well-designed patterns.

    ``left`` and ``right`` are solution frames; the join key is the set of
    variables they share, compared on FULL term identity (the whole
    ``struct<kind,value,datatype,lang>``) so a literal never matches an
    IRI sharing its lexical form. Left solutions with no compatible right
    solution survive with the right-only variables unbound (NULL structs).
    With no shared variables, SPARQL LeftJoin degenerates to
    left-cross-join-right-or-keep-left, which is exactly a left join on
    TRUE.

    Strict-equality joins implement SPARQL compatibility ONLY when the
    shared variables are guaranteed bound on both sides — true for frames
    straight out of ``match_bgp`` (stored triples have no NULL terms) and
    preserved by ``filter_solutions``/``project``. A left frame whose
    shared variable may be NULL (it came through a previous ``optional``
    or a variable-misaligned ``union``) is non-well-designed territory:
    rather than silently returning SQL semantics (NULL joins nothing) for
    SPARQL semantics (unbound joins everything), this refuses when the
    shared column is nullable in the schema.
    """
    shared = sorted(set(left.columns) & set(right.columns))
    for v in shared:
        for side, frame in (("left", left), ("right", right)):
            if frame.schema[v].nullable:
                raise ValueError(
                    f"optional(): shared variable ?{v} may be unbound on "
                    f"the {side} (it was introduced by a previous "
                    "optional/union); this non-well-designed pattern has "
                    "no equi-join plan — restructure the query so the "
                    "variable is bound by the required part"
                )
    if not shared:
        return left.join(right, F.lit(True), "left")
    rr = right
    for v in shared:
        rr = rr.withColumnRenamed(v, f"__r_{v}")
    cond = None
    for v in shared:
        eq = F.col(v) == F.col(f"__r_{v}")
        cond = eq if cond is None else (cond & eq)
    out = left.join(rr, cond, "left")
    return out.drop(*[f"__r_{v}" for v in shared])


def union(a: DataFrame, b: DataFrame) -> DataFrame:
    """SPARQL ``UNION``: bag union of two solution frames. Variables
    present in only one branch come through as NULL structs (unbound) in
    the other branch's rows — ``unionByName`` with missing-column fill,
    a zero-shuffle concatenation."""
    return a.unionByName(b, allowMissingColumns=True)


def filter_solutions(df: DataFrame, condition: Column) -> DataFrame:
    """SPARQL ``FILTER``: keep solutions where ``condition`` is true.
    Build conditions from the accessors above (``var_num('x') > 5``,
    ``is_iri('s')``, ``var_value('n').rlike(...)``); a NULL condition
    (SPARQL evaluation error) eliminates the solution, matching the spec's
    error semantics without any special-casing."""
    return df.where(condition)


def project(df: DataFrame, *names: str) -> DataFrame:
    """SPARQL ``SELECT ?a ?b`` projection (column pruning — free)."""
    return df.select(*names)


def distinct_solutions(df: DataFrame) -> DataFrame:
    """SPARQL ``SELECT DISTINCT``: set semantics over full term identity
    (one hash exchange on the projected struct columns; run AFTER
    ``project`` so only surviving variables shuffle)."""
    return df.distinct()


def path_closure(
    store,
    predicate: str,
    max_iter: int = 20,
    reflexive: bool = False,
    inverse: bool = False,
) -> DataFrame:
    """SPARQL ``?s <p>+ ?o`` — one-or-more property path over a single
    predicate: the transitive closure of that predicate's edge set
    (``ops.graph.transitive_closure``, path-doubling — log-depth rounds).

    ``reflexive=True`` gives ``p*``: the zero-length path matches every
    node INCIDENT to ``p`` (subject or object side), per the spec's
    zero-or-more evaluation over the path's node set — identity pairs
    union in before the closure returns. ``inverse=True`` gives ``^p``
    semantics (``(^p)+`` with ``reflexive`` accordingly): the edge set is
    swapped BEFORE closing, which for a closure equals swapping after —
    but matters for callers composing further. ``p?`` (zero-or-one) is
    the degenerate compose: base edges ∪ identity — pass
    ``reflexive=True`` and filter path length via the base frame instead
    of closing; provided here as the documented recipe rather than a
    fourth flag.

    Nodes join on FULL term identity (kind+value+datatype+lang structs),
    so a literal sharing an IRI's lexical form never bridges two paths; a
    literal object is a valid path ENDPOINT but never extends (no triple
    has a literal subject — the join finds no continuation), which is
    exactly the ``p+`` semantics. Returns the triple-frame projection
    ``(s_kind, s_value, o_kind, o_value, o_datatype, o_lang)`` of every
    reachability pair. Same scale caveat as ``transitive_closure``: meant
    for hierarchy-shaped predicates (subClassOf/broader/partOf)."""
    from .ops.graph import transitive_closure

    t = store.get_statements(p=predicate)
    edges = t.select(
        F.struct(
            F.col("s_kind").alias("kind"),
            F.col("s_value").alias("value"),
            F.lit(None).cast("string").alias("datatype"),
            F.lit(None).cast("string").alias("lang"),
        ).alias("src"),
        F.struct(
            F.col("o_kind").alias("kind"),
            F.col("o_value").alias("value"),
            F.col("o_datatype").alias("datatype"),
            F.col("o_lang").alias("lang"),
        ).alias("dst"),
    )
    if inverse:
        edges = edges.select(
            F.col("dst").alias("src"), F.col("src").alias("dst")
        )
        # swapped struct shapes: dst had datatype/lang fields, src didn't;
        # rebuild so src keeps the 4-field shape (a literal can appear on
        # the src side of ^p)
    pairs = transitive_closure(edges, max_iter=max_iter)
    if reflexive:
        nodes = edges.select(F.col("src").alias("n")).unionByName(
            edges.select(F.col("dst").alias("n"))
        ).distinct()
        pairs = pairs.unionByName(
            nodes.select(F.col("n").alias("src"), F.col("n").alias("dst"))
        ).distinct()
    return pairs.select(
        F.col("src.kind").alias("s_kind"),
        F.col("src.value").alias("s_value"),
        F.col("dst.kind").alias("o_kind"),
        F.col("dst.value").alias("o_value"),
        F.col("dst.datatype").alias("o_datatype"),
        F.col("dst.lang").alias("o_lang"),
    )


def not_exists(left: DataFrame, right: DataFrame) -> DataFrame:
    """SPARQL ``FILTER NOT EXISTS { ... }``: keep left solutions with NO
    compatible right solution — a LEFT ANTI equi-join on the shared
    variables' full term structs (the well-designed regime, same
    restriction and nullability refusal as :func:`optional`). With no
    shared variables the pattern's mere non-emptiness eliminates
    everything: a left anti join on TRUE."""
    shared = sorted(set(left.columns) & set(right.columns))
    for v in shared:
        for side, frame in (("left", left), ("right", right)):
            if frame.schema[v].nullable:
                raise ValueError(
                    f"not_exists(): shared variable ?{v} may be unbound on "
                    f"the {side} (introduced by a previous optional/union);"
                    " no equi-join plan exists for the non-well-designed"
                    " case"
                )
    if not shared:
        return left.join(right, F.lit(True), "left_anti")
    rr = right.select([F.col(v).alias(f"__r_{v}") for v in shared])
    cond = None
    for v in shared:
        eq = F.col(v) == F.col(f"__r_{v}")
        cond = eq if cond is None else (cond & eq)
    return left.join(rr, cond, "left_anti")


def minus(left: DataFrame, right: DataFrame) -> DataFrame:
    """SPARQL ``MINUS``: remove left solutions compatible with some right
    solution that SHARES at least one variable. Differs from
    :func:`not_exists` exactly where the spec differs: with NO shared
    variables MINUS removes nothing (every pair is vacuously compatible,
    and the spec keeps such solutions), while NOT EXISTS removes
    everything when the right side is non-empty."""
    shared = sorted(set(left.columns) & set(right.columns))
    if not shared:
        return left
    return not_exists(left, right)


def construct(
    solutions: DataFrame,
    patterns: "list[tuple[str, str, str]]",
) -> DataFrame:
    """SPARQL ``CONSTRUCT``: instantiate triple templates from a solution
    frame — the algebra's write side, turning query answers back into
    graph (the KG-construction move: derive new edges from matched
    patterns). Each template term is ``?var`` (a solution column) or a
    constant IRI string. Emits the engine's 8-column triple frame,
    DISTINCT (CONSTRUCT graphs are sets), skipping instances where any
    template variable is unbound or where an illegal term lands in a
    subject/predicate position (a literal subject, a non-IRI predicate) —
    both per the spec. One union of per-template projections + the one
    set-semantics exchange; no Python."""
    outs = []
    for s, p, o in patterns:
        def term(t: str):
            """(kind, value, datatype, lang, legality-conds) — legality
            conds stay Python-side for constants (always IRIs, statically
            legal everywhere) so no trivially-true Column predicates land
            in the plan."""
            if t.startswith("?"):
                c = F.col(t[1:])
                return (
                    c.getField("kind"),
                    c.getField("value"),
                    c.getField("datatype"),
                    c.getField("lang"),
                    [c.isNotNull()],
                )
            return (F.lit(KIND_IRI), F.lit(t),
                    F.lit(None).cast("string"), F.lit(None).cast("string"),
                    [])
        sk, sv, _, _, s_conds = term(s)
        pk, pv, _, _, p_conds = term(p)
        ok, ov, od, ol, o_conds = term(o)
        conds = s_conds + p_conds + o_conds
        if s.startswith("?"):
            conds.append(sk != KIND_LITERAL)  # no literal subjects
        if p.startswith("?"):
            conds.append(pk == KIND_IRI)  # predicates are IRIs
        legal = conds[0] if conds else F.lit(True)
        for c in conds[1:]:
            legal = legal & c
        outs.append(
            solutions.where(legal).select(
                sk.alias("s_kind"), sv.alias("s_value"),
                pv.alias("p_value"),
                ok.alias("o_kind"), ov.alias("o_value"),
                od.alias("o_datatype"), ol.alias("o_lang"),
                F.lit(None).cast("string").alias("g_value"),
            )
        )
    if not outs:
        raise ValueError("construct requires at least one template pattern")
    from functools import reduce
    return reduce(DataFrame.unionByName, outs).distinct()


# --- solution modifiers: GROUP BY / aggregates, ORDER BY / LIMIT ------------

_AGG_FUNCS = (
    "count", "count_distinct", "sum", "avg", "min", "max",
    "group_concat", "sample",
)


def aggregate_solutions(
    df: DataFrame,
    group_vars: "list[str]",
    aggs: "dict[str, tuple[str, str | None]]",
) -> DataFrame:
    """SPARQL ``GROUP BY`` + aggregates over a solution frame.

    ``group_vars`` are variable names grouped on FULL term identity (the
    struct, not the lexical — ``"5"^^xsd:integer`` and ``"5"`` are
    different groups). ``aggs`` maps output column name →
    ``(func, var)`` with func one of COUNT (var=None ⇒ ``COUNT(*)``;
    var ⇒ count of rows where it is bound), COUNT_DISTINCT (distinct full
    terms), SUM / AVG / MIN / MAX (numeric, over ``var_num`` — each value
    that is not a numeric literal contributes NULL and is SKIPPED, the
    lenient engine behavior; strict SPARQL instead errors the whole group
    value — callers needing strictness pre-``filter_solutions`` on
    ``var_num(v).isNotNull()``), GROUP_CONCAT (lexical forms joined ','
    in SORTED order — the spec leaves order undefined, a deterministic
    choice makes results reproducible and SQL-oracle-able) and SAMPLE
    (deterministic: the minimum lexical — again a reproducible refinement
    of the spec's "any value").

    One hash aggregation exchange keyed on the group terms, partial
    aggregates map-side; aggregate outputs are plain typed columns, group
    vars stay term structs."""
    if not group_vars:
        raise ValueError("aggregate_solutions requires >=1 group variable")
    exprs = []
    for out, (func, var) in aggs.items():
        f = func.lower()
        if f not in _AGG_FUNCS:
            raise ValueError(f"unknown aggregate {func!r}")
        if var is None and f != "count":
            raise ValueError(f"{f} requires a variable")
        if f == "count":
            col = F.count(F.lit(1)) if var is None else F.count(F.col(var))
        elif f == "count_distinct":
            col = F.count_distinct(F.col(var))
        elif f in ("sum", "avg", "min", "max"):
            col = getattr(F, f)(var_num(var))
        elif f == "group_concat":
            col = F.array_join(
                F.sort_array(F.collect_list(var_value(var))), ","
            )
        else:  # sample
            col = F.min(var_value(var))
        exprs.append(col.alias(out))
    return df.groupBy(*group_vars).agg(*exprs)


def order_limit(
    df: DataFrame,
    keys: "list[tuple[str, bool]]",
    limit: int | None = None,
) -> DataFrame:
    """SPARQL ``ORDER BY`` (+ optional ``LIMIT``): keys are
    ``(var, ascending)``. Implements the spec's cross-kind total order —
    unbound < blank nodes < IRIs < literals — with literals compared
    numerically when their lexical form parses as a number and lexically
    otherwise (numbers sort before non-numeric strings, matching the
    usual engine extension of the spec's partial order into a total one;
    document-deterministic either way).

    With ``limit``, Spark plans a TakeOrderedAndProject — per-partition
    top-k + a k-row driver merge, never a full sort-shuffle of the
    solution set: exactly what you want for "top 10 of 10^9 solutions"."""
    sort_cols = []
    for var, asc in keys:
        t = F.col(var)
        kind_rank = (
            F.when(t.isNull(), F.lit(0))
            .when(t.getField("kind") == KIND_BLANK, F.lit(1))
            .when(t.getField("kind") == KIND_IRI, F.lit(2))
            .otherwise(F.lit(3))
        )
        num = var_num(var)
        # numeric literals order before (asc) non-numeric by rank bump
        lit_rank = F.when(num.isNotNull(), F.lit(0)).otherwise(F.lit(1))
        for c in (kind_rank, lit_rank, num, var_value(var)):
            sort_cols.append(c.asc_nulls_first() if asc else c.desc_nulls_last())
    out = df.orderBy(*sort_cols)
    return out.limit(limit) if limit is not None else out


def values_frame(
    spark,
    var_names: "list[str]",
    rows: "list[tuple]",
) -> DataFrame:
    """SPARQL ``VALUES``: an inline solution frame — the idiom for binding
    a query to a driver-known parameter list (entity ids to look up, a
    work-list of IRIs) which then joins/optionals/filters like any BGP
    frame. Each row is a tuple of terms, one per variable; a term is
    ``("iri"|"blank", value)`` or ``("literal", value[, datatype[, lang]])``
    or ``None`` (UNDEF — the SPARQL unbound marker, a NULL struct).
    VALUES frames are driver-literal by definition (they come from the
    query text), so building them driver-side is not a collect smell; at
    most a few thousand rows that AQE broadcasts into whatever joins
    them."""
    from pyspark.sql import types as T

    term_type = T.StructType([
        T.StructField("kind", T.StringType(), False),
        T.StructField("value", T.StringType(), False),
        T.StructField("datatype", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ])
    schema = T.StructType(
        [T.StructField(v, term_type, True) for v in var_names]
    )

    def mk(term):
        if term is None:
            return None
        kind, value = term[0], term[1]
        if kind not in (KIND_IRI, KIND_BLANK, KIND_LITERAL):
            raise ValueError(f"bad term kind {kind!r}")
        dt = term[2] if len(term) > 2 else None
        lang = term[3] if len(term) > 3 else None
        if kind != KIND_LITERAL and (dt or lang):
            raise ValueError("datatype/lang only apply to literals")
        return (kind, value, dt, lang)

    data = []
    for row in rows:
        if len(row) != len(var_names):
            raise ValueError(
                f"VALUES row has {len(row)} terms for {len(var_names)} vars"
            )
        data.append(tuple(mk(t) for t in row))
    return spark.createDataFrame(data, schema)


def describe(store, nodes: DataFrame) -> DataFrame:
    """SPARQL ``DESCRIBE``: every statement whose subject or object is one
    of ``nodes`` (a one-column frame of term structs, e.g. a projected
    solution variable) — the simple symmetric concise description, without
    blank-node closure (the spec leaves DESCRIBE's extent to the
    implementation; the non-recursive form is one pass, the closure form
    is a frontier loop callers can build with ``path_closure`` if their
    graph uses bnode structure). Two LEFT SEMI joins against the node set
    (subject side joins on value — subjects carry no datatype/lang; object
    side on full term identity), unioned and de-duplicated; the node frame
    is solution-sized and AQE-broadcastable."""
    var = nodes.columns[0]
    t = nodes.select(F.col(var).alias("__n"))
    subj_keys = t.select(F.col("__n").getField("value").alias("s_value")).distinct()
    all_t = store.get_statements()
    by_subj = all_t.join(subj_keys, "s_value", "left_semi")
    obj_keys = t.select(
        F.col("__n").getField("kind").alias("__k"),
        F.col("__n").getField("value").alias("__v"),
        F.col("__n").getField("datatype").alias("__d"),
        F.col("__n").getField("lang").alias("__l"),
    ).distinct()
    # datatype/lang are NULL for IRIs and plain literals: the join must be
    # null-safe there or no IRI object would ever match
    by_obj = all_t.join(
        obj_keys,
        (F.col("o_kind") == F.col("__k"))
        & (F.col("o_value") == F.col("__v"))
        & F.col("o_datatype").eqNullSafe(F.col("__d"))
        & F.col("o_lang").eqNullSafe(F.col("__l")),
        "left_semi",
    )
    return by_subj.unionByName(by_obj).distinct()

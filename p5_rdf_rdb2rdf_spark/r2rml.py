"""W3C R2RML front end (SURVEY.md §4.1; https://www.w3.org/TR/r2rml/).

Reference parity: ``lib/RDF/RDB2RDF/R2RML.pm`` — parses a Turtle mapping
graph and **compiles it down to Simple's internal structures**; here it
compiles to the shared Mapping IR which :mod:`.compiler` executes.

Vocabulary coverage (SURVEY.md Appendix A): rr:TriplesMap, rr:logicalTable,
rr:tableName, rr:sqlQuery, rr:sqlVersion (accepted+ignored), rr:subjectMap,
rr:subject, rr:predicateObjectMap, rr:predicateMap, rr:predicate,
rr:objectMap, rr:object, rr:template, rr:column, rr:constant, rr:termType
(IRI/BlankNode/Literal), rr:datatype, rr:language, rr:class, rr:graphMap,
rr:graph, rr:defaultGraph, rr:parentTriplesMap, rr:joinCondition, rr:child,
rr:parent, rr:inverseExpression (ignored, matching the reference).

Shortcut properties (rr:subject/predicate/object/graph) normalize to
constant-valued term maps (R2RML §7.2.1).
"""

from __future__ import annotations

from .ir import Mapping, PredicateObjectMap, RefObject, TermMap, TriplesMap
from .terms import KIND_BLANK, KIND_IRI, KIND_LITERAL
from .turtle import Graph, Term, parse_turtle

RR = "http://www.w3.org/ns/r2rml#"


def _name_of(term: Term) -> str:
    return term[1]


def _term_type_iri_to_kind(iri: str) -> str:
    return {
        RR + "IRI": KIND_IRI,
        RR + "BlankNode": KIND_BLANK,
        RR + "Literal": KIND_LITERAL,
    }[iri]


def _parse_term_map(
    g: Graph,
    node: Term,
    position: str,  # 'subject' | 'predicate' | 'object' | 'graph'
) -> TermMap:
    """One term map node -> IR TermMap, applying R2RML §7.4.1 default
    term types:

      subject/predicate/graph maps default to rr:IRI;
      object maps default to rr:Literal when column-based or when
      rr:language/rr:datatype is present, else rr:IRI.
    """
    template = g.value(node, RR + "template")
    column = g.value(node, RR + "column")
    constant = g.object(node, RR + "constant")
    datatype = g.value(node, RR + "datatype")
    language = g.value(node, RR + "language")
    tt = g.value(node, RR + "termType")

    if constant is not None:
        if constant[0] == "literal":
            return TermMap.literal_constant(constant[1], datatype=constant[2], language=constant[3])
        kind = KIND_BLANK if constant[0] == "blank" else KIND_IRI
        return TermMap(
            kind="constant",
            constant_value=constant[1],
            constant_kind=kind,
            term_type=kind,
        )

    if tt:
        term_type = _term_type_iri_to_kind(tt)
    elif position == "object":
        term_type = KIND_LITERAL if (column or datatype or language) else KIND_IRI
    else:
        term_type = KIND_IRI

    if column:
        return TermMap(
            kind="column",
            column=column,
            term_type=term_type,
            datatype=datatype,
            language=language,
        )
    if template:
        return TermMap(
            kind="template",
            template=template,
            term_type=term_type,
            datatype=datatype,
            language=language,
        )
    raise ValueError(f"term map {node!r} has no template/column/constant")


def _term_maps(g: Graph, node: Term, map_prop: str, shortcut_prop: str, position: str) -> list[TermMap]:
    """All term maps for a property, normalizing shortcut constants."""
    out = [
        _parse_term_map(g, n, position) for n in g.objects(node, RR + map_prop)
    ]
    for c in g.objects(node, RR + shortcut_prop):
        if c[0] == "literal":
            out.append(TermMap.literal_constant(c[1], datatype=c[2], language=c[3]))
        else:
            kind = KIND_BLANK if c[0] == "blank" else KIND_IRI
            out.append(
                TermMap(kind="constant", constant_value=c[1], constant_kind=kind, term_type=kind)
            )
    return out


def r2rml_to_ir(turtle_text: str, base: str = "") -> Mapping:
    """Parse an R2RML Turtle document into the Mapping IR."""
    g = Graph(parse_turtle(turtle_text, base=base))
    m = Mapping(base=base)

    # a triples map is any node with rr:logicalTable (or typed rr:TriplesMap)
    tmap_nodes = set(g.subjects_with(RR + "logicalTable"))
    for s in g.subjects_with(
        "http://www.w3.org/1999/02/22-rdf-syntax-ns#type", ("iri", RR + "TriplesMap")
    ):
        tmap_nodes.add(s)

    for node in sorted(tmap_nodes, key=_name_of):
        name = _name_of(node)
        lt = g.object(node, RR + "logicalTable")
        table = sql = None
        if lt is not None:
            table = g.value(lt, RR + "tableName")
            sql = g.value(lt, RR + "sqlQuery")
            # rr:sqlVersion accepted and ignored (reference behavior [MED])
        tm = TriplesMap(name=name, table=_unquote_ident(table), sql=sql)

        subj_maps = _term_maps(g, node, "subjectMap", "subject", "subject")
        if not subj_maps:
            raise ValueError(f"triples map {name} has no subject map")
        tm.subject = subj_maps[0]
        # R2RML §7.4: a subject map's term type must be rr:IRI or
        # rr:BlankNode; literal subjects make the document invalid
        # (W3C R2RMLTC0004b expects an error here).
        if tm.subject.term_type == KIND_LITERAL:
            raise ValueError(
                f"triples map {name}: subject map may not produce literals (R2RML §7.4)"
            )

        # rr:class + graph maps live on the subject map node
        for sm_node in g.objects(node, RR + "subjectMap"):
            for cls in g.objects(sm_node, RR + "class"):
                tm.classes.append(cls[1])
            tm.graphs.extend(_term_maps(g, sm_node, "graphMap", "graph", "graph"))

        for pom_node in g.objects(node, RR + "predicateObjectMap"):
            pom = PredicateObjectMap()
            pom.predicates = _term_maps(g, pom_node, "predicateMap", "predicate", "predicate")
            pom.graphs = _term_maps(g, pom_node, "graphMap", "graph", "graph")
            for om in g.objects(pom_node, RR + "objectMap"):
                parent = g.object(om, RR + "parentTriplesMap")
                if parent is not None:
                    join = []
                    for jc in g.objects(om, RR + "joinCondition"):
                        join.append(
                            (g.value(jc, RR + "child"), g.value(jc, RR + "parent"))
                        )
                    pom.objects.append(RefObject(parent=_name_of(parent), join=join))
                else:
                    pom.objects.append(_parse_term_map(g, om, "object"))
            for c in g.objects(pom_node, RR + "object"):
                if c[0] == "literal":
                    pom.objects.append(
                        TermMap.literal_constant(c[1], datatype=c[2], language=c[3])
                    )
                else:
                    kind = KIND_BLANK if c[0] == "blank" else KIND_IRI
                    pom.objects.append(
                        TermMap(kind="constant", constant_value=c[1], constant_kind=kind, term_type=kind)
                    )
            tm.poms.append(pom)

        m.triples_maps[name] = tm
    return m


def _unquote_ident(name: str | None) -> str | None:
    """R2RML table names may be \"quoted\" SQL identifiers."""
    if name and len(name) >= 2 and name[0] == '"' and name[-1] == '"':
        return name[1:-1]
    return name

"""RDFS-lite forward-chaining materialization (the ρDF fragment).

A constructed KG usually ships with a small ontology; materializing the
RDFS entailments (every customer is also an Agent, every FK target a
Place, …) is the standard enrichment step between construction and
publication — downstream consumers then query the closed graph with
plain BGPs instead of re-implementing hierarchy walks.

This implements the **ρDF** fragment (Muñoz, Pérez, Gutierrez, "Simple
and Efficient Minimal RDFS", JWS 2009): the rules over
``rdfs:subClassOf`` / ``rdfs:subPropertyOf`` / ``rdfs:domain`` /
``rdfs:range`` / ``rdf:type`` —

- rdfs5/11: subPropertyOf and subClassOf are transitive (closures);
- rdfs7: ``(s p o), (p sp q) ⇒ (s q o)``;
- rdfs2: ``(s p o), (p dom C) ⇒ (s type C)``;
- rdfs3: ``(s p o), (p range C) ⇒ (o type C)`` — applied only when
  ``o`` is a resource (IRI/blank), the standard restriction: a literal
  cannot be typed by a class membership triple;
- rdfs9: ``(s type C), (C sc D) ⇒ (s type D)``.

Evaluation is STRATIFIED, not a naive fixpoint loop, and for ρDF the
stratification is complete (the only cyclic dependency the full RDFS
rule set has — sub-properties of ``rdf:type`` itself feeding back into
rdfs9 — is handled by running rdfs7 BEFORE the type rules, so a
``p sp rdf:type`` edge contributes its type triples; schema-on-schema
entailment such as inferring new ``subClassOf`` triples via a
sub-property OF ``rdfs:subClassOf`` is outside ρDF and out of scope):

1. close subPropertyOf over the schema (transitive closure — the schema
   frame is vocabulary-sized, closed driver-free in log rounds);
2. rdfs7 over the instance edges (broadcast join against the closure);
3. rdfs2/rdfs3 over the rdfs7-EXPANDED edges (broadcast domain/range);
4. close subClassOf; rdfs9 over all type triples (asserted + rdfs2/3)
   against the broadcast closure.

Scale shape: the four schema frames (sub-class/property closures,
domain, range) are vocabulary-scale — they broadcast; the instance graph
is only ever scanned, filtered and hash-joined against broadcast sides,
so the whole materialization adds ZERO instance-sized shuffles beyond
the final set-semantics distinct (which the caller already pays when
writing a graph table). Inferred triples carry ``g_value`` NULL.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from .ops.graph import transitive_closure
from .terms import KIND_LITERAL, RDF_TYPE, TRIPLE_COLUMNS

RDFS = "http://www.w3.org/2000/01/rdf-schema#"
RDFS_SUBCLASSOF = RDFS + "subClassOf"
RDFS_SUBPROPERTYOF = RDFS + "subPropertyOf"
RDFS_DOMAIN = RDFS + "domain"
RDFS_RANGE = RDFS + "range"

__all__ = [
    "rdfs_materialize",
    "RDFS_SUBCLASSOF",
    "RDFS_SUBPROPERTYOF",
    "RDFS_DOMAIN",
    "RDFS_RANGE",
]


def _schema_pairs(triples: DataFrame, pred: str) -> DataFrame:
    """(src, dst) value pairs of one schema predicate (IRI positions)."""
    return triples.where(F.col("p_value") == pred).select(
        F.col("s_value").alias("src"), F.col("o_value").alias("dst")
    )


def _type_triple(s_kind, s_value, cls) -> list:
    return [
        s_kind.alias("s_kind"),
        s_value.alias("s_value"),
        F.lit(RDF_TYPE).alias("p_value"),
        F.lit("iri").alias("o_kind"),
        cls.alias("o_value"),
        F.lit(None).cast("string").alias("o_datatype"),
        F.lit(None).cast("string").alias("o_lang"),
        F.lit(None).cast("string").alias("g_value"),
    ]


def rdfs_materialize(
    triples: DataFrame,
    schema: DataFrame | None = None,
    max_iter: int = 20,
) -> DataFrame:
    """Materialize the ρDF closure of ``triples`` → the DISTINCT union of
    asserted + inferred triples (8-column triple frame).

    ``schema``: optionally a separate frame holding the ontology
    (subClassOf/subPropertyOf/domain/range triples); defaults to reading
    the schema predicates out of ``triples`` itself. ``max_iter`` bounds
    the schema closures (depth ≤ 2^max_iter)."""
    sch = schema if schema is not None else triples

    # 1. schema closures — vocabulary-sized, broadcast below
    sp = transitive_closure(
        _schema_pairs(sch, RDFS_SUBPROPERTYOF), max_iter=max_iter
    ).withColumnsRenamed({"src": "p_value", "dst": "__super"})
    sc = transitive_closure(
        _schema_pairs(sch, RDFS_SUBCLASSOF), max_iter=max_iter
    ).withColumnsRenamed({"src": "__cls", "dst": "__super"})
    dom = _schema_pairs(sch, RDFS_DOMAIN).withColumnsRenamed(
        {"src": "p_value", "dst": "__cls"}
    )
    rng = _schema_pairs(sch, RDFS_RANGE).withColumnsRenamed(
        {"src": "p_value", "dst": "__cls"}
    )

    # 2. rdfs7: property hierarchy over the instance edges
    via_sp = (
        triples.join(broadcast(sp), "p_value", "inner")
        .select(
            "s_kind", "s_value",
            F.col("__super").alias("p_value"),
            "o_kind", "o_value", "o_datatype", "o_lang",
            F.lit(None).cast("string").alias("g_value"),
        )
    )
    edges = triples.select(*TRIPLE_COLUMNS).unionByName(via_sp)

    # 3. rdfs2/rdfs3 over the EXPANDED edges (a super-property's domain
    # applies to edges asserted via its sub-property)
    dom_types = edges.join(broadcast(dom), "p_value", "inner").select(
        *_type_triple(F.col("s_kind"), F.col("s_value"), F.col("__cls"))
    )
    rng_types = (
        edges.where(F.col("o_kind") != KIND_LITERAL)
        .join(broadcast(rng), "p_value", "inner")
        .select(*_type_triple(F.col("o_kind"), F.col("o_value"), F.col("__cls")))
    )

    # 4. rdfs9: class hierarchy over ALL type triples (asserted + inferred)
    types = reduce(
        DataFrame.unionByName,
        [
            edges.where(F.col("p_value") == RDF_TYPE).select(*TRIPLE_COLUMNS),
            dom_types,
            rng_types,
        ],
    )
    super_types = types.join(
        broadcast(sc), F.col("o_value") == F.col("__cls"), "inner"
    ).select(*_type_triple(F.col("s_kind"), F.col("s_value"), F.col("__super")))

    # rdfs5/rdfs11: the closed hierarchies are themselves entailed triples
    def closure_triples(closed: DataFrame, pred: str, src: str) -> DataFrame:
        return closed.select(
            F.lit("iri").alias("s_kind"),
            F.col(src).alias("s_value"),
            F.lit(pred).alias("p_value"),
            F.lit("iri").alias("o_kind"),
            F.col("__super").alias("o_value"),
            F.lit(None).cast("string").alias("o_datatype"),
            F.lit(None).cast("string").alias("o_lang"),
            F.lit(None).cast("string").alias("g_value"),
        )

    parts = [edges, dom_types, rng_types, super_types]
    if schema is None:
        # the ontology lives in the data graph: its closed hierarchies are
        # entailed triples of that graph. With a SEPARATE schema frame the
        # caller keeps ontology and instances apart — emit instance-derived
        # entailments only.
        parts.append(closure_triples(sp, RDFS_SUBPROPERTYOF, "p_value"))
        parts.append(closure_triples(sc, RDFS_SUBCLASSOF, "__cls"))
    out = reduce(DataFrame.unionByName, parts)
    return out.dropDuplicates(TRIPLE_COLUMNS)

"""ρDF forward chaining (reasoning.py): every rule fires exactly where it
should on hand graphs — and nowhere else (literal range restriction,
super-property domains, multi-level hierarchies, schema-free no-ops)."""

from __future__ import annotations

from p5_rdf_rdb2rdf_spark.reasoning import (
    RDFS_DOMAIN,
    RDFS_RANGE,
    RDFS_SUBCLASSOF,
    RDFS_SUBPROPERTYOF,
    rdfs_materialize,
)
from p5_rdf_rdb2rdf_spark.terms import RDF_TYPE

SCHEMA = ("s_kind string, s_value string, p_value string, o_kind string, "
          "o_value string, o_datatype string, o_lang string, g_value string")


def _t(s, p, o, o_kind="iri"):
    return ("iri", s, p, o_kind, o, None, None, None)


def _triples(df):
    return {(r["s_value"], r["p_value"], r["o_value"]) for r in df.collect()}


def test_subclass_transitivity_and_rdfs9(spark):
    g = spark.createDataFrame([
        _t("C1", RDFS_SUBCLASSOF, "C2"),
        _t("C2", RDFS_SUBCLASSOF, "C3"),
        _t("C3", RDFS_SUBCLASSOF, "C4"),
        _t("x", RDF_TYPE, "C1"),
    ], SCHEMA)
    out = _triples(rdfs_materialize(g))
    for c in ("C1", "C2", "C3", "C4"):
        assert ("x", RDF_TYPE, c) in out
    assert ("C1", RDFS_SUBCLASSOF, "C4") in out  # rdfs11 closure kept


def test_subproperty_then_domain_range(spark):
    """rdfs7 before rdfs2/3: a SUB-property edge must pick up its
    SUPER-property's domain and range."""
    g = spark.createDataFrame([
        _t("hasBoss", RDFS_SUBPROPERTYOF, "worksWith"),
        _t("worksWith", RDFS_DOMAIN, "Person"),
        _t("worksWith", RDFS_RANGE, "Person"),
        _t("a", "hasBoss", "b"),
    ], SCHEMA)
    out = _triples(rdfs_materialize(g))
    assert ("a", "worksWith", "b") in out  # rdfs7
    assert ("a", RDF_TYPE, "Person") in out  # domain via super
    assert ("b", RDF_TYPE, "Person") in out  # range via super


def test_range_skips_literals(spark):
    g = spark.createDataFrame([
        _t("age", RDFS_RANGE, "Number"),
        _t("age", RDFS_DOMAIN, "Person"),
        ("iri", "a", "age", "literal", "30", None, None, None),
    ], SCHEMA)
    out = _triples(rdfs_materialize(g))
    assert ("a", RDF_TYPE, "Person") in out  # domain fires
    assert ("30", RDF_TYPE, "Number") not in out  # literal never typed


def test_inferred_types_climb_class_hierarchy(spark):
    """rdfs2-inferred types must feed rdfs9 (stratification order)."""
    g = spark.createDataFrame([
        _t("p", RDFS_DOMAIN, "C1"),
        _t("C1", RDFS_SUBCLASSOF, "C2"),
        _t("a", "p", "b"),
    ], SCHEMA)
    out = _triples(rdfs_materialize(g))
    assert ("a", RDF_TYPE, "C1") in out
    assert ("a", RDF_TYPE, "C2") in out


def test_no_schema_is_identity(spark):
    g = spark.createDataFrame([
        _t("a", "p", "b"),
        ("iri", "a", "q", "literal", "v", None, None, None),
    ], SCHEMA)
    out = rdfs_materialize(g)
    assert _triples(out) == {("a", "p", "b"), ("a", "q", "v")}
    assert out.count() == 2  # set semantics, nothing invented


def test_separate_schema_frame_and_set_semantics(spark):
    schema = spark.createDataFrame([
        _t("C1", RDFS_SUBCLASSOF, "C2"),
    ], SCHEMA)
    inst = spark.createDataFrame([
        _t("x", RDF_TYPE, "C1"),
        _t("x", RDF_TYPE, "C2"),  # already asserted -> no duplicate
    ], SCHEMA)
    out = rdfs_materialize(inst, schema=schema)
    assert out.count() == 2
    assert _triples(out) == {("x", RDF_TYPE, "C1"), ("x", RDF_TYPE, "C2")}


def test_materialization_plan_broadcasts_schema(spark):
    """Scale pin: schema joins must be broadcast hash joins — zero
    instance-sized shuffles besides the final distinct."""
    g = spark.createDataFrame([
        _t("p", RDFS_DOMAIN, "C1"),
        _t("C1", RDFS_SUBCLASSOF, "C2"),
        _t("a", "p", "b"),
    ], SCHEMA)
    plan = (rdfs_materialize(g)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Python" not in plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan

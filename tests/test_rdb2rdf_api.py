"""Facade parity with the reference's public API (RDF::RDB2RDF->new)."""

from __future__ import annotations

import pytest

from p5_rdf_rdb2rdf_spark.fixtures import CONSTRAINTS
from p5_rdf_rdb2rdf_spark.rdb2rdf import RDB2RDF

TTL = """
@prefix rr: <http://www.w3.org/ns/r2rml#> .
@prefix ex: <http://example.com/ns#> .
<#Dept> rr:logicalTable [ rr:tableName "dept" ] ;
  rr:subjectMap [ rr:template "http://d/{deptno}" ; rr:class ex:Dept ] ;
  rr:predicateObjectMap [ rr:predicate ex:dname ; rr:objectMap [ rr:column "dname" ] ] .
"""


def test_factory_r2rml(spark, tables):
    proc = RDB2RDF.new("R2RML", TTL)
    lines = proc.process_ntriples(spark, tables)
    assert '<http://d/10> <http://example.com/ns#dname> "APPSERVER" .' in lines


def test_factory_simple(spark, tables):
    doc = {
        "mappings": {
            "dept": {"from": "dept", "about": "d/{deptno}", "columns": {"loc": ["ex:loc"]}}
        },
        "namespaces": {"ex": "http://example.com/ns#"},
    }
    proc = RDB2RDF.new("Simple", doc, base="http://x/")
    lines = proc.process_ntriples(spark, tables)
    assert '<http://x/d/10> <http://example.com/ns#loc> "NEW YORK" .' in lines


def test_factory_direct_mapping(spark, tables):
    proc = RDB2RDF.new("DirectMapping", prefix="http://b/", manifest=CONSTRAINTS)
    t = proc.process(spark, {"dept": tables["dept"]})
    assert t.where("p_value = 'http://b/dept#dname'").count() == 2


def test_factory_unknown_flavour():
    with pytest.raises(ValueError):
        RDB2RDF.new("nope")


def test_process_turtle_prefixed(spark, tables):
    proc = RDB2RDF.new("R2RML", TTL)
    ttl = proc.process_turtle(spark, tables, namespaces={"ex": "http://example.com/ns#"})
    assert "@prefix ex: <http://example.com/ns#> ." in ttl
    assert "a ex:Dept" in ttl
    assert 'ex:dname "APPSERVER"' in ttl
    # round-trippable through our own parser
    from p5_rdf_rdb2rdf_spark.turtle import parse_turtle

    reparsed = parse_turtle(ttl)
    assert (
        ("iri", "http://d/10"),
        ("iri", "http://example.com/ns#dname"),
        ("literal", "APPSERVER", None, None),
    ) in reparsed


def test_mapping_json_roundtrip(spark, tables):
    proc = RDB2RDF.new("R2RML", TTL)
    proc2 = RDB2RDF.from_json(proc.to_json())
    a = sorted(proc.process_ntriples(spark, tables))
    b = sorted(proc2.process_ntriples(spark, tables))
    assert a == b

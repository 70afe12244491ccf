"""W3C R2RML conformance-style cases (SURVEY.md §5: spec-derived goldens,
modeled on the rdb2rdf-tests R2RMLTC patterns)."""

from __future__ import annotations

import pytest

from p5_rdf_rdb2rdf_spark.compiler import compile_mapping
from p5_rdf_rdb2rdf_spark.ntriples import to_ntriples
from p5_rdf_rdb2rdf_spark.r2rml import r2rml_to_ir

RR = "@prefix rr: <http://www.w3.org/ns/r2rml#> .\n@prefix ex: <http://e/> .\n"
XSD = "http://www.w3.org/2001/XMLSchema#"


def _run(spark, tables, ttl):
    return set(to_ntriples(compile_mapping(spark, r2rml_to_ir(RR + ttl), tables=tables)))


def test_subject_shortcut_constant(spark, tables):
    lines = _run(
        spark,
        tables,
        """
        <#M> rr:logicalTable [ rr:tableName "dept" ] ;
          rr:subject ex:TheDept ;
          rr:predicateObjectMap [ rr:predicate ex:dname ; rr:objectMap [ rr:column "dname" ] ] .
        """,
    )
    assert '<http://e/TheDept> <http://e/dname> "APPSERVER" .' in lines
    assert '<http://e/TheDept> <http://e/dname> "RESEARCH" .' in lines


def test_multiple_predicates_and_objects(spark, tables):
    lines = _run(
        spark,
        tables,
        """
        <#M> rr:logicalTable [ rr:tableName "dept" ] ;
          rr:subjectMap [ rr:template "http://d/{deptno}" ] ;
          rr:predicateObjectMap [
            rr:predicate ex:p1 ; rr:predicate ex:p2 ;
            rr:objectMap [ rr:column "dname" ] ; rr:objectMap [ rr:column "loc" ] ] .
        """,
    )
    # cartesian predicates x objects (R2RML §6.3)
    for p in ("p1", "p2"):
        assert f'<http://d/10> <http://e/{p}> "APPSERVER" .' in lines
        assert f'<http://d/10> <http://e/{p}> "NEW YORK" .' in lines


def test_blank_subject_termtype(spark, tables):
    lines = _run(
        spark,
        tables,
        """
        <#M> rr:logicalTable [ rr:tableName "dept" ] ;
          rr:subjectMap [ rr:template "d{deptno}" ; rr:termType rr:BlankNode ; rr:class ex:D ] .
        """,
    )
    assert "_:d10 <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <http://e/D> ." in lines


def test_graph_shortcut(spark, tables):
    ir = r2rml_to_ir(
        RR
        + """
        <#M> rr:logicalTable [ rr:tableName "dept" ] ;
          rr:subjectMap [ rr:template "http://d/{deptno}" ; rr:graph ex:G ] ;
          rr:predicateObjectMap [ rr:predicate ex:n ; rr:objectMap [ rr:column "dname" ] ] .
        """
    )
    rows = compile_mapping(spark, ir, tables=tables).collect()
    assert rows and all(r.g_value == "http://e/G" for r in rows)


def test_graph_map_template(spark, tables):
    """R2RML §9: graph maps may be template-valued (per-row named graphs)."""
    ir = r2rml_to_ir(
        RR
        + """
        <#M> rr:logicalTable [ rr:tableName "dept" ] ;
          rr:subjectMap [ rr:template "http://d/{deptno}" ;
                          rr:graphMap [ rr:template "http://g/{loc}" ] ] ;
          rr:predicateObjectMap [ rr:predicate ex:n ; rr:objectMap [ rr:column "dname" ] ] .
        """
    )
    rows = compile_mapping(spark, ir, tables=tables).collect()
    got = {(r.s_value, r.g_value) for r in rows}
    assert ("http://d/10", "http://g/NEW%20YORK") in got  # IRI-safe encoded
    assert ("http://d/20", "http://g/BOSTON") in got


def test_template_escaped_braces(spark, tables):
    lines = _run(
        spark,
        tables,
        r"""
        <#M> rr:logicalTable [ rr:tableName "dept" ] ;
          rr:subjectMap [ rr:template "http://d/\\{x\\}{deptno}" ] ;
          rr:predicateObjectMap [ rr:predicate ex:n ; rr:objectMap [ rr:column "dname" ] ] .
        """,
    )
    # literal braces survive, column still substituted (R2RML §7.3)
    assert any(s.startswith("<http://d/%7Bx%7D10>") or s.startswith("<http://d/{x}10>") for s in lines)


def test_datatype_and_language_on_template_literal(spark, tables):
    lines = _run(
        spark,
        tables,
        """
        <#M> rr:logicalTable [ rr:tableName "dept" ] ;
          rr:subjectMap [ rr:template "http://d/{deptno}" ] ;
          rr:predicateObjectMap [
            rr:predicate ex:label ;
            rr:objectMap [ rr:template "dept {dname}" ; rr:termType rr:Literal ; rr:language "en" ] ] .
        """,
    )
    assert '<http://d/10> <http://e/label> "dept APPSERVER"@en .' in lines


def test_inverse_expression_ignored(spark, tables):
    lines = _run(
        spark,
        tables,
        """
        <#M> rr:logicalTable [ rr:tableName "dept" ] ;
          rr:subjectMap [ rr:template "http://d/{deptno}" ;
                          rr:inverseExpression "{deptno} = deptno" ] ;
          rr:predicateObjectMap [ rr:predicate ex:n ; rr:objectMap [ rr:column "dname" ] ] .
        """,
    )
    assert '<http://d/10> <http://e/n> "APPSERVER" .' in lines


def test_multiple_classes(spark, tables):
    lines = _run(
        spark,
        tables,
        """
        <#M> rr:logicalTable [ rr:tableName "dept" ] ;
          rr:subjectMap [ rr:template "http://d/{deptno}" ; rr:class ex:A , ex:B ] .
        """,
    )
    assert "<http://d/10> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <http://e/A> ." in lines
    assert "<http://d/10> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <http://e/B> ." in lines


def test_same_table_refobject_elision(spark, tables):
    """O14: RefObjectMap without joinCondition on the same logical table —
    the parent subject is built from the same row, no join in the plan."""
    ttl = """
    <#A> rr:logicalTable [ rr:tableName "emp" ] ;
      rr:subjectMap [ rr:template "http://emp/{empno}" ] ;
      rr:predicateObjectMap [ rr:predicate ex:self ;
        rr:objectMap [ rr:parentTriplesMap <#B> ] ] .
    <#B> rr:logicalTable [ rr:tableName "emp" ] ;
      rr:subjectMap [ rr:template "http://person/{empno}" ] .
    """
    ir = r2rml_to_ir(RR + ttl)
    df = compile_mapping(spark, ir, tables=tables)
    lines = set(to_ntriples(df))
    assert "<http://emp/7369> <http://e/self> <http://person/7369> ." in lines
    # the degenerate self-join must be elided from the physical plan
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan


def test_duplicate_rows_set_semantics(spark, tables):
    """nopk_log has a duplicated row; RDF set semantics collapse its triples
    (R2RML outputs are graphs — the reference's Model dest dedups too)."""
    lines = _run(
        spark,
        tables,
        """
        <#M> rr:logicalTable [ rr:tableName "nopk_log" ] ;
          rr:subjectMap [ rr:template "http://l/{ts}" ] ;
          rr:predicateObjectMap [ rr:predicate ex:msg ; rr:objectMap [ rr:column "msg" ] ] .
        """,
    )
    assert sum(1 for l in lines if l.startswith("<http://l/t1>")) == 1


def test_sql_view_with_where(spark, tables):
    lines = _run(
        spark,
        tables,
        '''
        <#M> rr:logicalTable [ rr:sqlQuery """SELECT * FROM emp WHERE job = 'CLERK'""" ] ;
          rr:subjectMap [ rr:template "http://emp/{empno}" ] ;
          rr:predicateObjectMap [ rr:predicate ex:name ; rr:objectMap [ rr:column "ename" ] ] .
        ''',
    )
    assert '<http://emp/7369> <http://e/name> "SMITH" .' in lines
    assert not any("7499" in l for l in lines)


def test_column_object_natural_types(spark, tables):
    lines = _run(
        spark,
        tables,
        """
        <#M> rr:logicalTable [ rr:tableName "books" ] ;
          rr:subjectMap [ rr:template "http://b/{book_id}" ] ;
          rr:predicateObjectMap [ rr:predicate ex:price ; rr:objectMap [ rr:column "price" ] ] ;
          rr:predicateObjectMap [ rr:predicate ex:inprint ; rr:objectMap [ rr:column "in_print" ] ] ;
          rr:predicateObjectMap [ rr:predicate ex:pub ; rr:objectMap [ rr:column "published" ] ] .
        """,
    )
    assert f'<http://b/1> <http://e/price> "12.5"^^<{XSD}decimal> .' in lines
    assert f'<http://b/1> <http://e/inprint> "true"^^<{XSD}boolean> .' in lines
    assert f'<http://b/1> <http://e/pub> "2015-02-01"^^<{XSD}date> .' in lines

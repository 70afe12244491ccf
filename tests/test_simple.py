"""Simple mapping language goldens (SURVEY.md O8, O20, O23-O28, O34, O37)."""

from __future__ import annotations

from p5_rdf_rdb2rdf_spark.compiler import compile_mapping
from p5_rdf_rdb2rdf_spark.ir import Mapping
from p5_rdf_rdb2rdf_spark.ntriples import to_ntriples
from p5_rdf_rdb2rdf_spark.simple import simple_to_ir

BASE = "http://example.com/"
DC = "http://purl.org/dc/terms/"

BOOKS_SIMPLE = {
    "namespaces": {"dc": DC, "bibo": "http://purl.org/ontology/bibo/", "ex": "http://example.com/ns#"},
    "mappings": {
        "books": {
            "from": "books",
            "about": "book/{book_id}",
            "typeof": ["bibo:Book"],
            "columns": {
                "title": [{"property": "dc:title", "lang": "en"}],
                "author_id": [{"rel": "dc:creator", "resource": "author/{author_id}"}],
                "published": [{"property": "dc:issued", "datatype": "xsd:date"}],
                "price": [{"property": "ex:price"}],
            },
        },
        "authors": {
            "from": "authors",
            "about": "author/{author_id}",
            "typeof": ["foaf:Person"],
            "columns": {
                "forename": [{"property": "foaf:givenName"}],
                "surname": [{"property": "foaf:familyName"}],
            },
        },
    },
}


def test_books_simple_golden(spark, tables):
    ir = simple_to_ir(BOOKS_SIMPLE, base=BASE)
    triples = compile_mapping(spark, ir, tables=tables)
    lines = set(to_ntriples(triples))
    # subject template + typeof
    assert f"<{BASE}book/1> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <http://purl.org/ontology/bibo/Book> ." in lines
    # language-tagged literal (O27)
    assert f'<{BASE}book/1> <{DC}title> "Utopia of Rules"@en .' in lines
    # rel -> IRI object from resource template
    assert f"<{BASE}book/1> <{DC}creator> <{BASE}author/10> ." in lines
    # datatype override via CURIE expansion (O28/O34)
    assert (
        f'<{BASE}book/1> <{DC}issued> "2015-02-01"^^<http://www.w3.org/2001/XMLSchema#date> .'
        in lines
    )
    # natural decimal datatype (O24/O33)
    assert (
        f'<{BASE}book/1> <http://example.com/ns#price> "12.5"^^<http://www.w3.org/2001/XMLSchema#decimal> .'
        in lines
    )
    # NULL suppression: book 3 has NULL author_id/published (O10)
    assert not any(ln.startswith(f"<{BASE}book/3> <{DC}creator>") for ln in lines)
    assert not any(ln.startswith(f"<{BASE}book/3> <{DC}issued>") for ln in lines)
    # IRI-safe encoding of templated string values (O21): title w/ spaces+slash
    assert not any(" " in ln.split(" ")[0] for ln in lines)
    # second mapping emits too
    assert f'<{BASE}author/10> <http://xmlns.com/foaf/0.1/givenName> "David" .' in lines


def test_simple_select_passthrough(spark, tables):
    """O8: computed SQL expressions in `select` (Simple.pm POD example)."""
    doc = {
        "mappings": {
            "authors": {
                "from": "authors",
                "select": "author_id, forename || ' ' || surname AS fullname",
                "about": "author/{author_id}",
                "columns": {"fullname": [{"property": "foaf:name"}]},
            }
        }
    }
    ir = simple_to_ir(doc, base=BASE)
    triples = compile_mapping(spark, ir, tables=tables)
    lines = set(to_ntriples(triples))
    assert f'<{BASE}author/10> <http://xmlns.com/foaf/0.1/name> "David Graeber" .' in lines


def test_simple_rev_inverse(spark, tables):
    doc = {
        "mappings": {
            "books": {
                "from": "books",
                "about": "book/{book_id}",
                "columns": {
                    "author_id": [{"rev": "ex:wrote", "resource": "author/{author_id}"}]
                },
            }
        },
        "namespaces": {"ex": "http://example.com/ns#"},
    }
    ir = simple_to_ir(doc, base=BASE)
    triples = compile_mapping(spark, ir, tables=tables)
    lines = set(to_ntriples(triples))
    assert f"<{BASE}author/10> <http://example.com/ns#wrote> <{BASE}book/1> ." in lines
    # inverse of NULL fk suppressed
    assert not any("book/3" in ln for ln in lines)


def test_simple_graph_and_bnode(spark, tables):
    doc = {
        "mappings": {
            "dept": {
                "from": "dept",
                "about": "_:dept{deptno}",
                "graph": "http://example.com/g1",
                "columns": {"dname": [{"property": "ex:dname"}]},
            }
        },
        "namespaces": {"ex": "http://example.com/ns#"},
    }
    ir = simple_to_ir(doc, base=BASE)
    triples = compile_mapping(spark, ir, tables=tables)
    rows = triples.collect()
    assert all(r.g_value == "http://example.com/g1" for r in rows if r.p_value.endswith("dname"))
    assert any(r.s_kind == "blank" and r.s_value == "dept10" for r in rows)


def test_ir_json_roundtrip(spark, tables):
    """O37: mapping IR JSON round trip produces an identical plan result."""
    ir = simple_to_ir(BOOKS_SIMPLE, base=BASE)
    ir2 = Mapping.from_json(ir.to_json())
    t1 = sorted(map(tuple, compile_mapping(spark, ir, tables=tables).collect()))
    t2 = sorted(map(tuple, compile_mapping(spark, ir2, tables=tables).collect()))
    assert t1 == t2


def test_simple_callable_term_vectorized(spark, tables):
    """O35: Simple.pm coderef terms — a Python callable computes a dynamic
    literal, executed as an Arrow-vectorized pandas UDF (never per-row
    Python), and such mappings refuse JSON serialization (like Perl
    coderefs)."""
    import pytest

    def initials(fore, sur):
        return (fore.str[:1] + "." + sur.str[:1] + ".").str.upper()

    doc = {
        "mappings": {
            "authors": {
                "from": "authors",
                "about": "author/{author_id}",
                "columns": {
                    "forename": [
                        {
                            "property": "ex:initials",
                            "callable": initials,
                            "columns": ["forename", "surname"],
                        }
                    ],
                },
            }
        },
        "namespaces": {"ex": "http://example.com/ns#"},
    }
    ir = simple_to_ir(doc, base=BASE)
    df = compile_mapping(spark, ir, tables=tables)
    got = {(r.s_value, r.o_value) for r in df.collect()}
    assert (f"{BASE}author/10", "D.G.") in got
    assert (f"{BASE}author/11", "Å.N.") in got
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan and "BatchEvalPython" not in plan, plan
    with pytest.raises(ValueError, match="callable"):
        ir.to_json()

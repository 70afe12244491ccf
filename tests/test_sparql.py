"""SPARQL text front end (sparql.py): parser + evaluator against small
deterministic graphs; the algebra semantics themselves are pinned in
tests/test_algebra.py — here we pin the TEXT → algebra mapping, the
grammar slice's edges, and the hard-failure boundary."""

from __future__ import annotations

import pytest

from p5_rdf_rdb2rdf_spark.sparql import (
    SparqlError,
    SparqlUnsupported,
    parse_query,
    sparql,
)
from p5_rdf_rdb2rdf_spark.store import TripleStore

SCHEMA = ("s_kind string, s_value string, p_value string, o_kind string, "
          "o_value string, o_datatype string, o_lang string, g_value string")

XSD_INT = "http://www.w3.org/2001/XMLSchema#integer"


@pytest.fixture(scope="module")
def people(spark):
    rows = [
        ("iri", "http://ex/alice", "http://p/name", "literal", "Alice", None, None, None),
        ("iri", "http://ex/bob", "http://p/name", "literal", "Bob", None, "en", None),
        ("iri", "http://ex/carol", "http://p/name", "literal", "Carol", None, None, None),
        ("iri", "http://ex/alice", "http://p/email", "literal", "a@x.org", None, None, None),
        ("iri", "http://ex/alice", "http://p/age", "literal", "30", XSD_INT, None, None),
        ("iri", "http://ex/carol", "http://p/age", "literal", "25", XSD_INT, None, None),
        ("iri", "http://ex/carol", "http://p/knows", "iri", "http://ex/alice", None, None, None),
        ("iri", "http://ex/alice", "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
         "iri", "http://ex/Person", None, None, None),
    ]
    return TripleStore(spark.createDataFrame(rows, SCHEMA))


def _vals(df, var):
    return sorted(r[var]["value"] for r in df.collect())


def test_select_bgp_prefix_semicolon_comma(people):
    out = sparql(people, """
      PREFIX p: <http://p/>
      SELECT ?n ?a WHERE { ?x p:name ?n ; p:age ?a . }
    """)
    got = {(r["n"]["value"], r["a"]["value"]) for r in out.collect()}
    assert got == {("Alice", "30"), ("Carol", "25")}


def test_select_star_and_rdf_type_a(people):
    out = sparql(people, "SELECT * WHERE { ?x a <http://ex/Person> }")
    assert _vals(out, "x") == ["http://ex/alice"]
    assert out.columns == ["x"]


def test_optional_filter_numeric(people):
    out = sparql(people, """
      PREFIX p: <http://p/>
      SELECT ?n ?e WHERE {
        ?x p:name ?n .
        OPTIONAL { ?x p:email ?e }
        FILTER (!BOUND(?e) || REGEX(?e, "@x[.]org$"))
      }
    """)
    assert _vals(out, "n") == ["Alice", "Bob", "Carol"]
    out2 = sparql(people, """
      PREFIX p: <http://p/>
      SELECT ?n WHERE { ?x p:name ?n ; p:age ?a . FILTER (?a > 26) }
    """)
    assert _vals(out2, "n") == ["Alice"]


def test_union_and_distinct_and_order_limit(people):
    out = sparql(people, """
      PREFIX p: <http://p/>
      SELECT DISTINCT ?v WHERE {
        { ?x p:name ?v } UNION { ?x p:email ?v }
      } ORDER BY DESC(?v) LIMIT 2
    """)
    assert [r["v"]["value"] for r in out.collect()] == ["a@x.org", "Carol"]


def test_minus_and_not_exists(people):
    q = """
      PREFIX p: <http://p/>
      SELECT ?n WHERE {
        ?x p:name ?n .
        %s { ?x p:email ?e }
      }
    """
    assert _vals(sparql(people, q % "MINUS"), "n") == ["Bob", "Carol"]
    assert _vals(sparql(people, q % "FILTER NOT EXISTS"), "n") == ["Bob", "Carol"]


def test_values_inline(people):
    out = sparql(people, """
      PREFIX p: <http://p/>
      SELECT ?n WHERE {
        ?x p:name ?n .
        VALUES ?x { <http://ex/alice> <http://ex/bob> }
      }
    """)
    assert _vals(out, "n") == ["Alice", "Bob"]
    # multi-var VALUES with UNDEF
    out2 = sparql(people, """
      PREFIX p: <http://p/>
      SELECT ?n ?tag WHERE {
        ?x p:name ?n .
        VALUES (?x ?tag) { (<http://ex/alice> "keep") (<http://ex/carol> UNDEF) }
      }
    """)
    got = {(r["n"]["value"], r["tag"]["value"] if r["tag"] else None)
           for r in out2.collect()}
    assert got == {("Alice", "keep"), ("Carol", None)}


def test_ask(people):
    assert sparql(people, "ASK { ?x <http://p/email> ?e }").collect()[0]["ask"] is True
    assert sparql(people, "ASK { ?x <http://p/phone> ?e }").collect()[0]["ask"] is False


def test_construct(people):
    out = sparql(people, """
      PREFIX p: <http://p/>
      CONSTRUCT { ?x p:display ?n } WHERE { ?x p:name ?n }
    """)
    rows = out.collect()
    assert len(rows) == 3
    assert {r["p_value"] for r in rows} == {"http://p/display"}


def test_filter_lang_datatype_kind(people):
    out = sparql(people, """
      PREFIX p: <http://p/>
      SELECT ?n WHERE { ?x p:name ?n . FILTER (LANG(?n) = "en") }
    """)
    assert _vals(out, "n") == ["Bob"]
    out2 = sparql(people, f"""
      PREFIX p: <http://p/>
      SELECT ?a WHERE {{ ?x p:age ?a . FILTER (DATATYPE(?a) = <{XSD_INT}>) }}
    """)
    assert len(out2.collect()) == 2
    out3 = sparql(people, """
      PREFIX p: <http://p/>
      SELECT ?q WHERE { ?x p:knows ?q . FILTER (isIRI(?q)) }
    """)
    assert _vals(out3, "q") == ["http://ex/alice"]


def test_typed_literal_and_bound_object(people):
    # bound literal object matches by LEXICAL form (documented looseness)
    out = sparql(people, 'SELECT ?x WHERE { ?x <http://p/age> "30" }')
    assert _vals(out, "x") == ["http://ex/alice"]
    # typed literal in FILTER equality compares numerically
    out2 = sparql(people, """
      PREFIX p: <http://p/>
      SELECT ?x WHERE { ?x p:age ?a . FILTER (?a = 30) }
    """)
    assert _vals(out2, "x") == ["http://ex/alice"]


def test_parser_hard_failures(people):
    for q, exc in [
        ("SELECT ?x WHERE { ?x <http://p/a>+ ?y }", SparqlError),
        ("SELECT (1 + ?x AS ?n) WHERE { ?x ?p ?o }", SparqlError),
        ("SELECT ?o WHERE { ?x ?p ?o } GROUP BY ?x", SparqlError),
        ("SELECT ?x WHERE { BIND(1 AS ?x) }", SparqlUnsupported),
        ("DESCRIBE <http://ex/alice>", SparqlUnsupported),
        ("SELECT ?x WHERE { GRAPH ?g { ?x ?p ?o } }", SparqlUnsupported),
        ("SELECT ?x WHERE { ?x foaf:name ?n }", SparqlError),  # undeclared
        ("SELECT ?zz WHERE { ?x <http://p/name> ?n }", SparqlError),
        ("SELECT ?x", SparqlError),
    ]:
        with pytest.raises(exc):
            sparql(people, q)


def test_parse_query_ast_shapes():
    ast = parse_query("""
      PREFIX p: <http://p/>
      SELECT DISTINCT ?n WHERE {
        ?x p:name ?n . OPTIONAL { ?x p:email ?e }
        FILTER (?n != "Zed")
      } ORDER BY ?n LIMIT 5
    """)
    assert ast.form == "select" and ast.distinct and ast.limit == 5
    assert ast.select_vars == ["n"] and ast.order == [("n", True)]
    assert len(ast.where.patterns) == 1
    assert len(ast.where.optionals) == 1
    assert len(ast.where.filters) == 1


def test_offset_limit(people):
    base = """
      PREFIX p: <http://p/>
      SELECT ?v WHERE { ?x p:name ?v } ORDER BY ?v %s
    """
    assert [r["v"]["value"] for r in sparql(people, base % "OFFSET 1 LIMIT 1").collect()] == ["Bob"]
    assert [r["v"]["value"] for r in sparql(people, base % "LIMIT 1 OFFSET 2").collect()] == ["Carol"]
    # OFFSET without ORDER BY slices an arbitrary-but-valid subset
    assert sparql(people, """
      SELECT ?v WHERE { ?x <http://p/name> ?v } OFFSET 2
    """).count() == 1


def test_group_by_without_aggregates_is_distinct_keys(people):
    out = sparql(people, """
      PREFIX p: <http://p/>
      SELECT ?x WHERE { ?x ?p ?o } GROUP BY ?x
    """)
    assert _vals(out, "x") == sorted(
        {"http://ex/alice", "http://ex/bob", "http://ex/carol"})


def test_aggregates_group_by_text(people):
    out = sparql(people, """
      PREFIX p: <http://p/>
      SELECT ?x (COUNT(*) AS ?n) (MIN(?a) AS ?lo) WHERE {
        ?x p:age ?a .
      } GROUP BY ?x
    """)
    got = {(r["x"]["value"], r["n"], r["lo"]) for r in out.collect()}
    assert got == {("http://ex/alice", 1, 30.0), ("http://ex/carol", 1, 25.0)}
    # global group (no GROUP BY), COUNT DISTINCT
    row = sparql(people, """
      PREFIX p: <http://p/>
      SELECT (COUNT(DISTINCT ?x) AS ?d) (SUM(?a) AS ?s)
      WHERE { ?x p:age ?a }
    """).collect()[0]
    assert row["d"] == 2 and row["s"] == 55.0


def test_aggregate_text_failures(people):
    from p5_rdf_rdb2rdf_spark.sparql import SparqlError, SparqlUnsupported
    with pytest.raises(SparqlError, match="must be in GROUP BY"):
        sparql(people, "SELECT ?x (COUNT(*) AS ?n) WHERE { ?x ?p ?o }")
    with pytest.raises(SparqlUnsupported, match="HAVING"):
        sparql(people, ("SELECT (COUNT(*) AS ?n) WHERE { ?x ?p ?o } "
                        "GROUP BY ?x HAVING (?n > 1)"))
    with pytest.raises(SparqlUnsupported, match="COUNT"):
        sparql(people, "SELECT (SUM(DISTINCT ?a) AS ?s) WHERE { ?x ?p ?a }")
    with pytest.raises(SparqlUnsupported, match="ORDER BY on aggregate"):
        sparql(people, ("SELECT (COUNT(*) AS ?n) WHERE { ?x ?p ?o } "
                        "ORDER BY ?n"))


def test_parser_totality_fuzz():
    """The tokenizer/parser must be TOTAL over arbitrary input: any string
    either parses or raises SparqlError — never an unhandled exception
    (no Spark needed; pure parser)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from p5_rdf_rdb2rdf_spark.sparql import SparqlError, parse_query

    @settings(max_examples=300, deadline=None)
    @given(st.text(max_size=80))
    def run(q):
        try:
            parse_query(q)
        except SparqlError:
            pass

    run()

    # structured fuzz: near-miss SPARQL fragments
    @settings(max_examples=200, deadline=None)
    @given(st.lists(st.sampled_from([
        "SELECT", "WHERE", "{", "}", "?x", "?p", "?o", "OPTIONAL",
        "FILTER", "(", ")", "UNION", ".", ";", ",", "<http://x>",
        '"lit"', "42", "a", "ASK", "LIMIT", "ORDER", "BY", "=", "&&",
    ]), max_size=14), st.randoms())
    def run2(parts, _):
        try:
            parse_query(" ".join(parts))
        except SparqlError:
            pass

    run2()


# --- round-7 self-review regression pins ------------------------------------


def test_values_undef_in_shared_var_is_compatible(people):
    """SPARQL compatibility: an UNDEF entry in a VALUES row joins ANY
    binding of that variable (a plain equi-join would silently drop it)."""
    out = sparql(people, """
      PREFIX p: <http://p/>
      SELECT ?n WHERE {
        ?x p:name ?n .
        VALUES (?x ?n) { (UNDEF "Alice") (<http://ex/bob> UNDEF) }
      }
    """)
    # row 1: ?x free, ?n must equal "Alice" -> alice's binding
    # row 2: ?x = bob, ?n free -> bob's binding
    assert _vals(out, "n") == ["Alice", "Bob"]


def test_construct_applies_solution_modifiers(people):
    out = sparql(people, """
      PREFIX p: <http://p/>
      CONSTRUCT { ?x p:display ?n } WHERE { ?x p:name ?n }
      ORDER BY ?n LIMIT 2
    """)
    got = {r["o_value"] for r in out.collect()}
    assert got == {"Alice", "Bob"}  # first 2 by name, not all 3


def test_bare_group_by_applies_modifiers(people):
    out = sparql(people, """
      SELECT ?x WHERE { ?x ?p ?o } GROUP BY ?x ORDER BY ?x LIMIT 1
    """)
    assert _vals(out, "x") == ["http://ex/alice"]


def test_var_var_comparison_is_numeric_when_both_numeric(spark):
    rows = [
        ("iri", "http://ex/i", "http://p/lo", "literal", "9",
         "http://www.w3.org/2001/XMLSchema#integer", None, None),
        ("iri", "http://ex/i", "http://p/hi", "literal", "10",
         "http://www.w3.org/2001/XMLSchema#integer", None, None),
    ]
    st = TripleStore(spark.createDataFrame(rows, SCHEMA))
    # lexically "10" < "9" is TRUE; numerically it is FALSE — must be empty
    out = sparql(st, """
      PREFIX p: <http://p/>
      SELECT ?x WHERE { ?x p:lo ?a ; p:hi ?b . FILTER (?b < ?a) }
    """)
    assert out.count() == 0
    out2 = sparql(st, """
      PREFIX p: <http://p/>
      SELECT ?x WHERE { ?x p:lo ?a ; p:hi ?b . FILTER (?a < ?b) }
    """)
    assert out2.count() == 1


def test_regex_flags_and_arity(people):
    out = sparql(people, """
      PREFIX p: <http://p/>
      SELECT ?n WHERE { ?x p:name ?n . FILTER (REGEX(?n, "^alice", "i")) }
    """)
    assert _vals(out, "n") == ["Alice"]
    with pytest.raises(SparqlError, match="arguments"):
        sparql(people, 'SELECT ?n WHERE { ?x <http://p/name> ?n . '
                       'FILTER (REGEX(?n)) }')
    with pytest.raises(SparqlError, match="arguments"):
        sparql(people, 'SELECT ?n WHERE { ?x <http://p/name> ?n . '
                       'FILTER (BOUND(?n, ?n)) }')
    with pytest.raises(SparqlUnsupported, match="flags"):
        sparql(people, 'SELECT ?n WHERE { ?x <http://p/name> ?n . '
                       'FILTER (REGEX(?n, "a", "g")) }')


def test_unicode_escape_in_literal(spark):
    rows = [("iri", "http://ex/c", "http://p/name", "literal",
             "café", None, None, None)]
    st = TripleStore(spark.createDataFrame(rows, SCHEMA))
    out = sparql(st, r'''
      SELECT ?x WHERE { ?x <http://p/name> ?n . FILTER (?n = "café") }
    ''')
    assert out.count() == 1


def test_filter_equality_is_rdfterm_equal(spark):
    """ADVICE r7 #1 regression: FILTER(?o = "x") must keep ONLY the simple
    literal "x" — not the lang-tagged "x"@en, not the IRI <x>, not a
    differently-typed literal; != is the complement on comparable terms."""
    rows = [
        ("iri", "http://ex/s1", "http://p/v", "literal", "x", None, None, None),
        ("iri", "http://ex/s2", "http://p/v", "literal", "x", None, "en", None),
        ("iri", "http://ex/s3", "http://p/v", "iri", "x", None, None, None),
        ("iri", "http://ex/s4", "http://p/v", "literal", "x",
         "http://www.w3.org/2001/XMLSchema#string", None, None),
        ("iri", "http://ex/s5", "http://p/v", "literal", "y", None, None, None),
    ]
    st = TripleStore(spark.createDataFrame(rows, SCHEMA))
    out = sparql(st, 'SELECT ?s WHERE { ?s <http://p/v> ?o . FILTER(?o = "x") }')
    # simple literal AND its RDF 1.1 synonym "x"^^xsd:string survive
    assert _vals(out, "s") == ["http://ex/s1", "http://ex/s4"]
    out = sparql(st, 'SELECT ?s WHERE { ?s <http://p/v> ?o . FILTER(?o = "x"@en) }')
    assert _vals(out, "s") == ["http://ex/s2"]
    out = sparql(st, 'SELECT ?s WHERE { ?s <http://p/v> ?o . FILTER(?o = <x>) }')
    assert _vals(out, "s") == ["http://ex/s3"]
    # explicit STR() keeps value semantics: every term whose lexical is "x"
    out = sparql(st, 'SELECT ?s WHERE { ?s <http://p/v> ?o . FILTER(STR(?o) = "x") }')
    assert _vals(out, "s") == ["http://ex/s1", "http://ex/s2", "http://ex/s3", "http://ex/s4"]
    # != is term-aware too: the lang-tagged and IRI terms differ from "y"
    out = sparql(st, 'SELECT ?s WHERE { ?s <http://p/v> ?o . FILTER(?o != "y") }')
    assert _vals(out, "s") == ["http://ex/s1", "http://ex/s2", "http://ex/s3", "http://ex/s4"]


def test_filter_str_comparison_is_codepoint(spark):
    """ADVICE r7 #2 regression: FILTER(STR(?a) < STR(?b)) on numeric-looking
    lexicals compares as strings ('10' < '9'), never as doubles."""
    rows = [
        ("iri", "http://ex/a", "http://p/v", "literal", "10", None, None, None),
        ("iri", "http://ex/b", "http://p/w", "literal", "9", None, None, None),
    ]
    st = TripleStore(spark.createDataFrame(rows, SCHEMA))
    out = sparql(st, """
      SELECT ?x WHERE { ?x <http://p/v> ?a . ?y <http://p/w> ?b .
                        FILTER(STR(?a) < STR(?b)) }
    """)
    assert _vals(out, "x") == ["http://ex/a"]  # '10' < '9' codepoint-wise
    out = sparql(st, """
      SELECT ?x WHERE { ?x <http://p/v> ?a . ?y <http://p/w> ?b .
                        FILTER(?a < ?b) }
    """)
    assert _vals(out, "x") == []  # bare vars dispatch numerically: 10 < 9

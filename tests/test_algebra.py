"""SPARQL-algebra operators (algebra.py): OPTIONAL / UNION / FILTER /
projection semantics over BGP solution frames.

Reference parity anchor: the CPAN reference's Store hands pattern answers
to RDF::Trine, whose query layer supplies this algebra (SURVEY.md §4.3);
here the algebra composes over Spark solution frames. Small deterministic
graphs with hand-computable answers; plan-level assertions live in
tests/test_plan_audit.py.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from p5_rdf_rdb2rdf_spark import algebra as A
from p5_rdf_rdb2rdf_spark.store import TripleStore

SCHEMA = ("s_kind string, s_value string, p_value string, o_kind string, "
          "o_value string, o_datatype string, o_lang string, g_value string")

XSD_INT = "http://www.w3.org/2001/XMLSchema#integer"


def _store(spark):
    """People graph: everyone has a name; only some have an email; ages are
    typed literals, one of them non-numeric garbage."""
    rows = [
        ("iri", "http://ex/alice", "http://p/name", "literal", "Alice", None, None, None),
        ("iri", "http://ex/bob", "http://p/name", "literal", "Bob", None, "en", None),
        ("iri", "http://ex/carol", "http://p/name", "literal", "Carol", None, None, None),
        ("iri", "http://ex/alice", "http://p/email", "literal", "a@x.org", None, None, None),
        ("iri", "http://ex/alice", "http://p/age", "literal", "30", XSD_INT, None, None),
        ("iri", "http://ex/bob", "http://p/age", "literal", "forty", XSD_INT, None, None),
        ("iri", "http://ex/carol", "http://p/age", "literal", "25", XSD_INT, None, None),
        ("iri", "http://ex/carol", "http://p/knows", "iri", "http://ex/alice", None, None, None),
    ]
    return TripleStore(spark.createDataFrame(rows, SCHEMA))


def test_optional_keeps_unmatched_left(spark):
    st = _store(spark)
    left = st.bgp([("?p", "http://p/name", "?n")])
    right = st.bgp([("?p", "http://p/email", "?e")])
    sol = A.optional(left, right).collect()
    assert len(sol) == 3
    by_name = {r["n"]["value"]: r for r in sol}
    assert by_name["Alice"]["e"]["value"] == "a@x.org"
    assert by_name["Bob"]["e"] is None  # unbound
    assert by_name["Carol"]["e"] is None


def test_optional_no_shared_vars_is_left_cross(spark):
    st = _store(spark)
    left = st.bgp([("?p", "http://p/name", "?n")])
    # non-empty right, no shared vars -> cross (3 names x 1 email row)
    right = st.bgp([("?q", "http://p/email", "?e")])
    assert A.optional(left, right.select("e")).count() == 3
    # EMPTY right -> left survives with ?z unbound
    empty = st.bgp([("?z", "http://p/nosuch", "?w")]).select("z")
    out = A.optional(left, empty)
    assert out.count() == 3
    assert out.where(A.bound("z")).count() == 0


def test_optional_rejects_non_well_designed(spark):
    """A shared variable that may arrive unbound from the left (introduced
    by a previous OPTIONAL) has no equi-join plan — must refuse, not return
    SQL null-joins-nothing for SPARQL unbound-joins-everything."""
    st = _store(spark)
    left = st.bgp([("?p", "http://p/name", "?n")])
    opt1 = A.optional(left, st.bgp([("?p", "http://p/email", "?e")]))
    import pytest
    with pytest.raises(ValueError, match="well-designed"):
        A.optional(opt1, st.bgp([("?x", "http://p/knows", "?y")]).select(
            F.col("x").alias("e"), "y"))


def test_optional_joins_on_full_term_identity(spark):
    """A literal sharing an IRI's lexical form must not match it."""
    rows = [
        ("iri", "http://ex/s", "http://p/a", "iri", "http://collide/", None, None, None),
        ("iri", "http://ex/s2", "http://p/b", "literal", "http://collide/", None, None, None),
    ]
    st = TripleStore(spark.createDataFrame(rows, SCHEMA))
    left = st.bgp([("?s", "http://p/a", "?v")])
    right = st.bgp([("?s2", "http://p/b", "?v")])
    out = A.optional(left, right).collect()
    assert len(out) == 1
    assert out[0]["s2"] is None  # kinds differ -> no match


def test_union_aligns_missing_vars_as_unbound(spark):
    st = _store(spark)
    a = st.bgp([("?p", "http://p/email", "?e")])
    b = st.bgp([("?p", "http://p/knows", "?q")])
    u = A.union(a, b)
    assert u.count() == 2
    assert set(u.columns) == {"p", "e", "q"}
    rows = {r["p"]["value"]: r for r in u.collect()}
    assert rows["http://ex/alice"]["q"] is None
    assert rows["http://ex/carol"]["e"] is None
    # bag semantics: self-union doubles
    assert A.union(a, a).count() == 2


def test_filter_numeric_error_eliminates_solution(spark):
    """var_num on the garbage 'forty' literal yields NULL -> SPARQL type
    error -> that solution is eliminated by FILTER, both for > and <=."""
    st = _store(spark)
    ages = st.bgp([("?p", "http://p/age", "?a")])
    assert A.filter_solutions(ages, A.var_num("a") > 26).count() == 1  # 30
    assert A.filter_solutions(ages, A.var_num("a") <= 26).count() == 1  # 25
    # bob's row is in neither branch: error, not false-means-other-branch


def test_term_accessors(spark):
    st = _store(spark)
    names = st.bgp([("?p", "http://p/name", "?n")])
    tagged = A.filter_solutions(names, A.var_lang("n") == "en").collect()
    assert [r["n"]["value"] for r in tagged] == ["Bob"]
    plain = A.filter_solutions(names, A.var_lang("n") == "").count()
    assert plain == 2
    ages = st.bgp([("?p", "http://p/age", "?a")])
    assert A.filter_solutions(ages, A.var_datatype("a") == XSD_INT).count() == 3
    assert A.filter_solutions(names, A.is_iri("p") & A.is_literal("n")).count() == 3
    # LANG of a non-literal is an error (NULL) -> eliminated
    knows = st.bgp([("?p", "http://p/knows", "?q")])
    assert A.filter_solutions(knows, A.var_lang("q") == "").count() == 0


def test_project_distinct(spark):
    st = _store(spark)
    ages = st.bgp([("?p", "http://p/age", "?a")])
    # three people -> three distinct subjects; projecting then distinct
    assert A.distinct_solutions(A.project(ages, "p")).count() == 3
    doubled = A.union(ages, ages)
    assert A.distinct_solutions(A.project(doubled, "p")).count() == 3

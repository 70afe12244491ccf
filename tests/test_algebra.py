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


# --- property paths (p+) ----------------------------------------------------


def test_path_closure_taxonomy(spark):
    sub = "http://www.w3.org/2000/01/rdf-schema#subClassOf"
    rows = [
        ("iri", "http://ex/A", sub, "iri", "http://ex/B", None, None, None),
        ("iri", "http://ex/B", sub, "iri", "http://ex/C", None, None, None),
        ("iri", "http://ex/C", sub, "iri", "http://ex/D", None, None, None),
        # unrelated predicate must not participate
        ("iri", "http://ex/A", "http://p/label", "literal", "a", None, None, None),
    ]
    st = TripleStore(spark.createDataFrame(rows, SCHEMA))
    pairs = {
        (r["s_value"], r["o_value"])
        for r in A.path_closure(st, sub).collect()
    }
    assert pairs == {
        ("http://ex/A", "http://ex/B"), ("http://ex/A", "http://ex/C"),
        ("http://ex/A", "http://ex/D"), ("http://ex/B", "http://ex/C"),
        ("http://ex/B", "http://ex/D"), ("http://ex/C", "http://ex/D"),
    }


def test_path_closure_literal_never_bridges(spark):
    """A literal endpoint terminates a path; an IRI sharing its lexical
    form must not splice two paths together (full term-identity join)."""
    p = "http://p/next"
    collide = "http://ex/B"
    rows = [
        # A -p-> "http://ex/B" (a LITERAL whose lexical form is B's IRI)
        ("iri", "http://ex/A", p, "literal", collide, None, None, None),
        # B (the IRI) -p-> C
        ("iri", collide, p, "iri", "http://ex/C", None, None, None),
    ]
    st = TripleStore(spark.createDataFrame(rows, SCHEMA))
    pairs = {
        (r["s_value"], r["o_kind"], r["o_value"])
        for r in A.path_closure(st, p).collect()
    }
    # exactly the two base edges: no A->C splice through the literal
    assert pairs == {
        ("http://ex/A", "literal", collide),
        (collide, "iri", "http://ex/C"),
    }


def test_path_closure_cycle_terminates(spark):
    p = "http://p/next"
    rows = [
        ("iri", "http://ex/A", p, "iri", "http://ex/B", None, None, None),
        ("iri", "http://ex/B", p, "iri", "http://ex/A", None, None, None),
    ]
    st = TripleStore(spark.createDataFrame(rows, SCHEMA))
    pairs = {
        (r["s_value"], r["o_value"])
        for r in A.path_closure(st, p).collect()
    }
    assert pairs == {
        ("http://ex/A", "http://ex/B"), ("http://ex/B", "http://ex/A"),
        ("http://ex/A", "http://ex/A"), ("http://ex/B", "http://ex/B"),
    }


# --- negation + construct -----------------------------------------------------


def test_not_exists_and_minus(spark):
    st = _store(spark)
    names = st.bgp([("?p", "http://p/name", "?n")])
    emails = st.bgp([("?p", "http://p/email", "?e")])
    # bob + carol have no email
    no_email = A.not_exists(names, A.project(emails, "p"))
    assert {r["p"]["value"] for r in no_email.collect()} == {
        "http://ex/bob", "http://ex/carol"}
    # MINUS with a shared var behaves the same
    assert A.minus(names, A.project(emails, "p")).count() == 2
    # the spec divergence: NO shared vars — NOT EXISTS with a non-empty
    # pattern removes everything; MINUS removes nothing
    disjoint = A.project(emails, "e")
    assert A.not_exists(names, disjoint).count() == 0
    assert A.minus(names, disjoint).count() == 3


def test_not_exists_rejects_nullable_shared(spark):
    import pytest
    st = _store(spark)
    names = st.bgp([("?p", "http://p/name", "?n")])
    opt = A.optional(names, st.bgp([("?p", "http://p/email", "?e")]))
    with pytest.raises(ValueError, match="well-designed"):
        A.not_exists(opt, st.bgp([("?x", "http://p/age", "?e2")]).select(
            F.col("e2").alias("e")))


def test_construct_emits_legal_distinct_triples(spark):
    st = _store(spark)
    sol = st.bgp([("?p", "http://p/name", "?n")])
    out = A.construct(sol, [
        ("?p", "http://p/displayName", "?n"),
        ("?p", "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
         "http://ex/Person"),
    ])
    rows = out.collect()
    assert len(rows) == 6  # 3 names + 3 type triples
    assert all(r["g_value"] is None for r in rows)
    names = {(r["s_value"], r["o_value"]) for r in rows
             if r["p_value"] == "http://p/displayName"}
    assert ("http://ex/alice", "Alice") in names
    # distinct: constructing the same template twice adds nothing
    doubled = A.construct(A.union(sol, sol), [
        ("?p", "http://p/displayName", "?n")])
    assert doubled.count() == 3


def test_construct_skips_illegal_and_unbound(spark):
    st = _store(spark)
    names = st.bgp([("?p", "http://p/name", "?n")])
    # literal subject position -> skipped entirely
    assert A.construct(names, [("?n", "http://p/x", "?p")]).count() == 0
    # non-IRI predicate -> skipped
    assert A.construct(names, [("?p", "?n", "?p")]).count() == 0
    # unbound var (from a failed OPTIONAL) -> that instance skipped
    opt = A.optional(names, st.bgp([("?p", "http://p/email", "?e")]))
    out = A.construct(opt, [("?p", "http://p/hasEmail", "?e")])
    assert out.count() == 1  # only alice has an email


# --- aggregates + order/limit --------------------------------------------------


def test_aggregate_solutions(spark):
    st = _store(spark)
    ages = st.bgp([("?p", "http://p/age", "?a")])
    out = A.aggregate_solutions(
        A.optional(ages, st.bgp([("?p", "http://p/email", "?e")])),
        ["p"],
        {
            "n": ("count", None),
            "n_email": ("count", "e"),
            "total": ("sum", "a"),
            "lexmin": ("sample", "a"),
        },
    ).collect()
    by = {r["p"]["value"]: r for r in out}
    assert by["http://ex/alice"]["n"] == 1
    assert by["http://ex/alice"]["n_email"] == 1
    assert by["http://ex/bob"]["n_email"] == 0  # unbound not counted
    assert by["http://ex/alice"]["total"] == 30.0
    assert by["http://ex/bob"]["total"] is None  # 'forty' skipped (lenient)
    assert by["http://ex/carol"]["total"] == 25.0
    assert by["http://ex/bob"]["lexmin"] == "forty"


def test_aggregate_group_concat_and_errors(spark):
    import pytest
    st = _store(spark)
    names = st.bgp([("?p", "http://p/name", "?n")])
    all_one = names.select(F.lit(1).alias("g"), "n")
    # group_concat is deterministic: sorted lexical forms
    row = A.aggregate_solutions(
        all_one.select(F.struct(
            F.lit("literal").alias("kind"), F.lit("g").alias("value"),
            F.lit(None).cast("string").alias("datatype"),
            F.lit(None).cast("string").alias("lang")).alias("g"), "n"),
        ["g"], {"names": ("group_concat", "n")},
    ).collect()[0]
    assert row["names"] == "Alice,Bob,Carol"
    with pytest.raises(ValueError, match="unknown aggregate"):
        A.aggregate_solutions(names, ["n"], {"x": ("median", "n")})
    with pytest.raises(ValueError, match="group variable"):
        A.aggregate_solutions(names, [], {"x": ("count", None)})


def test_order_limit_cross_kind_total_order(spark):
    st = _store(spark)
    # mix: IRIs (knows objects), numeric + non-numeric literals (ages)
    ages = st.bgp([("?p", "http://p/age", "?a")])
    knows = st.bgp([("?p", "http://p/knows", "?q")]).select(
        "p", F.col("q").alias("a"))
    mixed = A.union(ages, knows)
    ordered = [
        (r["a"]["kind"], r["a"]["value"])
        for r in A.order_limit(mixed, [("a", True)]).collect()
    ]
    # IRIs before literals; numeric literals (25 < 30) before 'forty'
    assert ordered == [
        ("iri", "http://ex/alice"),
        ("literal", "25"), ("literal", "30"), ("literal", "forty"),
    ]
    # limit plans per-partition top-k (TakeOrderedAndProject)
    top2 = A.order_limit(mixed, [("a", True)], limit=2)
    plan = top2._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert top2.count() == 2
    # descending flips
    desc = [r["a"]["value"]
            for r in A.order_limit(mixed, [("a", False)], limit=1).collect()]
    assert desc == ["forty"]


def test_aggregate_count_distinct_and_var_validation(spark):
    import pytest
    st = _store(spark)
    ages = st.bgp([("?p", "http://p/age", "?a")])
    doubled = A.union(ages, ages)
    one = doubled.select(F.struct(
        F.lit("literal").alias("kind"), F.lit("g").alias("value"),
        F.lit(None).cast("string").alias("datatype"),
        F.lit(None).cast("string").alias("lang")).alias("g"), "p", "a")
    row = A.aggregate_solutions(one, ["g"], {
        "n": ("count", None),
        "nd": ("count_distinct", "p"),  # distinct on the full term struct
    }).collect()[0]
    assert row["n"] == 6 and row["nd"] == 3
    for f in ("group_concat", "sample", "sum", "count_distinct"):
        with pytest.raises(ValueError, match="requires a variable"):
            A.aggregate_solutions(ages, ["a"], {"x": (f, None)})


# --- VALUES + DESCRIBE ----------------------------------------------------------


def test_values_frame_joins_and_undef(spark):
    import pytest
    st = _store(spark)
    vals = A.values_frame(spark, ["p", "tag"], [
        (("iri", "http://ex/alice"), ("literal", "keep")),
        (("iri", "http://ex/carol"), None),  # UNDEF tag
        (("iri", "http://ex/nobody"), ("literal", "x")),
    ])
    names = st.bgp([("?p", "http://p/name", "?n")])
    joined = names.join(vals, "p")  # plain equi-join on the term struct
    got = {(r["n"]["value"], r["tag"]["value"] if r["tag"] else None)
           for r in joined.collect()}
    assert got == {("Alice", "keep"), ("Carol", None)}
    with pytest.raises(ValueError, match="row has"):
        A.values_frame(spark, ["a", "b"], [(("iri", "x"),)])
    with pytest.raises(ValueError, match="bad term kind"):
        A.values_frame(spark, ["a"], [(("uri", "x"),)])
    with pytest.raises(ValueError, match="only apply to literals"):
        A.values_frame(spark, ["a"], [(("iri", "x", "http://dt"),)])


def test_describe_subject_and_object_sides(spark):
    st = _store(spark)
    # describe alice: her 3 outgoing statements + carol-knows-alice
    nodes = A.values_frame(spark, ["x"], [(("iri", "http://ex/alice"),)])
    d = A.describe(st, nodes)
    got = {(r["s_value"], r["p_value"], r["o_value"]) for r in d.collect()}
    assert got == {
        ("http://ex/alice", "http://p/name", "Alice"),
        ("http://ex/alice", "http://p/email", "a@x.org"),
        ("http://ex/alice", "http://p/age", "30"),
        ("http://ex/carol", "http://p/knows", "http://ex/alice"),
    }
    # a literal node only matches the object side, on full term identity
    lit = A.values_frame(spark, ["x"], [(("literal", "Bob", None, "en"),)])
    got2 = {(r["s_value"], r["o_value"]) for r in A.describe(st, lit).collect()}
    assert got2 == {("http://ex/bob", "Bob")}
    # same lexical, no lang tag -> no match (term identity, not value)
    lit2 = A.values_frame(spark, ["x"], [(("literal", "Bob"),)])
    assert A.describe(st, lit2).count() == 0


def test_path_closure_reflexive_and_inverse(spark):
    p = "http://p/broader"
    rows = [
        ("iri", "http://ex/A", p, "iri", "http://ex/B", None, None, None),
        ("iri", "http://ex/B", p, "iri", "http://ex/C", None, None, None),
    ]
    st = TripleStore(spark.createDataFrame(rows, SCHEMA))
    # p*: closure + identity over incident nodes (A, B, C)
    star = {(r["s_value"], r["o_value"])
            for r in A.path_closure(st, p, reflexive=True).collect()}
    assert star == {
        ("http://ex/A", "http://ex/B"), ("http://ex/A", "http://ex/C"),
        ("http://ex/B", "http://ex/C"),
        ("http://ex/A", "http://ex/A"), ("http://ex/B", "http://ex/B"),
        ("http://ex/C", "http://ex/C"),
    }
    # (^p)+: narrower-than pairs
    inv = {(r["s_value"], r["o_value"])
           for r in A.path_closure(st, p, inverse=True).collect()}
    assert inv == {
        ("http://ex/B", "http://ex/A"), ("http://ex/C", "http://ex/B"),
        ("http://ex/C", "http://ex/A"),
    }


def test_optional_rejects_nullable_right_side(spark):
    """A shared variable nullable on the RIGHT (bound only inside a nested
    OPTIONAL there) must refuse too — SQL NULL-joins-nothing is not SPARQL
    unbound-is-compatible."""
    import pytest
    st = _store(spark)
    left = st.bgp([("?p", "http://p/name", "?n"),
                   ("?p", "http://p/age", "?e")])
    inner = A.optional(st.bgp([("?q", "http://p/knows", "?p2")]),
                       st.bgp([("?q", "http://p/email", "?e")]))
    with pytest.raises(ValueError, match="right"):
        A.optional(left, inner.select("q", "e"))
    with pytest.raises(ValueError, match="right"):
        A.not_exists(left, inner.select("e"))

"""SHACL-lite validation (ops/validate.py): hand-computable graphs where
every constraint component fires exactly where it should — and nowhere
else (vacuous satisfaction, per-value semantics, inverse paths)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from p5_rdf_rdb2rdf_spark.ops.validate import Shape, validate_shapes
from p5_rdf_rdb2rdf_spark.terms import RDF_TYPE

SCHEMA = ("s_kind string, s_value string, p_value string, o_kind string, "
          "o_value string, o_datatype string, o_lang string, g_value string")

XSD_INT = "http://www.w3.org/2001/XMLSchema#integer"
PERSON = "http://ex/Person"


def _graph(spark):
    """Three Persons + one untyped node:
    - alice: 2 emails, age 30 (typed int), knows bob
    - bob:   0 emails, age 'forty' (garbage lexical, typed int)
    - carol: 1 email,  no age,      knows dave (dave is NOT a Person)
    - dave:  untyped, has an email (must not be a focus of Person shapes)
    """
    rows = [
        ("iri", "http://ex/alice", RDF_TYPE, "iri", PERSON, None, None, None),
        ("iri", "http://ex/bob", RDF_TYPE, "iri", PERSON, None, None, None),
        ("iri", "http://ex/carol", RDF_TYPE, "iri", PERSON, None, None, None),
        ("iri", "http://ex/alice", "http://p/email", "literal", "a@x.org", None, None, None),
        ("iri", "http://ex/alice", "http://p/email", "literal", "a2@x.org", None, None, None),
        ("iri", "http://ex/carol", "http://p/email", "literal", "carol AT x", None, None, None),
        ("iri", "http://ex/dave", "http://p/email", "literal", "d@x.org", None, None, None),
        ("iri", "http://ex/alice", "http://p/age", "literal", "30", XSD_INT, None, None),
        ("iri", "http://ex/bob", "http://p/age", "literal", "forty", XSD_INT, None, None),
        ("iri", "http://ex/alice", "http://p/knows", "iri", "http://ex/bob", None, None, None),
        ("iri", "http://ex/carol", "http://p/knows", "iri", "http://ex/dave", None, None, None),
    ]
    return spark.createDataFrame(rows, SCHEMA)


def _viol(df):
    return {
        (r["focus"], r["shape_id"], r["violation"], r["detail"])
        for r in df.collect()
    }


def test_min_max_count_with_class_target(spark):
    g = _graph(spark)
    v = _viol(validate_shapes(g, [
        Shape("has-email", "http://p/email", focus_class=PERSON, min_count=1),
        Shape("max-one-email", "http://p/email", focus_class=PERSON, max_count=1),
    ]))
    # bob has zero emails (minCount); alice has two (maxCount); dave is not
    # a Person -> no focus row despite having an email
    assert v == {
        ("http://ex/bob", "has-email", "minCount", "0"),
        ("http://ex/alice", "max-one-email", "maxCount", "2"),
    }


def test_inverse_path_cardinality(spark):
    g = _graph(spark)
    v = _viol(validate_shapes(g, [
        Shape("is-known", "http://p/knows", inverse=True,
              focus_class=PERSON, min_count=1),
    ]))
    # bob is known (by alice); alice and carol are known by nobody; dave is
    # known but untyped -> not a focus
    assert v == {
        ("http://ex/alice", "is-known", "minCount", "0"),
        ("http://ex/carol", "is-known", "minCount", "0"),
    }


def test_all_subjects_target_when_no_class(spark):
    g = _graph(spark)
    v = _viol(validate_shapes(g, [
        Shape("everyone-has-age", "http://p/age", min_count=1),
    ]))
    # focus = every subject (incl. dave); alice and bob have ages
    assert v == {
        ("http://ex/carol", "everyone-has-age", "minCount", "0"),
        ("http://ex/dave", "everyone-has-age", "minCount", "0"),
    }


def test_pattern_and_vacuous_satisfaction(spark):
    g = _graph(spark)
    v = _viol(validate_shapes(g, [
        Shape("email-format", "http://p/email", focus_class=PERSON,
              pattern="@"),
    ]))
    # per-VALUE semantics: bob has no email -> vacuously fine; carol's
    # 'carol AT x' fails; dave's bad-free email is out of target
    assert v == {("http://ex/carol", "email-format", "pattern", "carol AT x")}


def test_datatype_nodekind_and_numeric_bounds(spark):
    g = _graph(spark)
    v = _viol(validate_shapes(g, [
        Shape("age-int", "http://p/age", datatype=XSD_INT),
        Shape("knows-iri", "http://p/knows", node_kind="iri"),
        Shape("email-literal", "http://p/email", node_kind="literal"),
        Shape("age-bounds", "http://p/age", min_value=0.0, max_value=120.0),
    ]))
    # all ages carry XSD_INT; all knows are IRIs; all emails literals;
    # 'forty' does not cast -> NOT a bound violation (datatype's concern)
    assert v == set()
    v2 = _viol(validate_shapes(g, [
        Shape("age-min-31", "http://p/age", min_value=31.0),
    ]))
    assert v2 == {("http://ex/alice", "age-min-31", "minValue", "30")}


def test_object_class(spark):
    g = _graph(spark)
    v = _viol(validate_shapes(g, [
        Shape("knows-person", "http://p/knows", object_class=PERSON),
    ]))
    # carol knows dave, who is not rdf:type Person
    assert v == {("http://ex/carol", "knows-person", "class", "http://ex/dave")}


def test_shape_validation_errors(spark):
    with pytest.raises(ValueError, match="no constraint"):
        Shape("empty", "http://p/x")
    with pytest.raises(ValueError, match="node_kind"):
        Shape("bad", "http://p/x", node_kind="uri")
    g = _graph(spark)
    with pytest.raises(ValueError, match="duplicate"):
        validate_shapes(g, [
            Shape("s", "http://p/x", min_count=1),
            Shape("s", "http://p/y", min_count=1),
        ])
    with pytest.raises(ValueError, match="at least one shape"):
        validate_shapes(g, [])


def test_cardinality_shapes_share_one_aggregation(spark):
    """Scale pin: K cardinality shapes must produce exactly ONE
    HashAggregate pair (partial+final over one exchange) keyed
    (shape_id, focus) — not K independent aggregations."""
    g = _graph(spark)
    shapes = [
        Shape(f"card-{i}", "http://p/email", focus_class=PERSON, min_count=i)
        for i in range(1, 5)
    ]
    plan = (
        validate_shapes(g, shapes)
        ._jdf.queryExecution().optimizedPlan().toString()
    )
    # the counting aggregate appears once in the optimized logical plan
    assert plan.count("count(1)") == 1


def test_min_and_max_value_label_per_row(spark):
    """A shape declaring BOTH bounds must label each violation by the bound
    it actually crossed (previously the label was statically 'minValue')."""
    rows = [
        ("iri", "http://ex/young", "http://p/age", "literal", "10", XSD_INT, None, None),
        ("iri", "http://ex/old", "http://p/age", "literal", "50", XSD_INT, None, None),
        ("iri", "http://ex/mid", "http://p/age", "literal", "30", XSD_INT, None, None),
    ]
    g = spark.createDataFrame(rows, SCHEMA)
    v = _viol(validate_shapes(g, [
        Shape("age-band", "http://p/age", min_value=20.0, max_value=40.0),
    ]))
    assert v == {
        ("http://ex/young", "age-band", "minValue", "10"),
        ("http://ex/old", "age-band", "maxValue", "50"),
    }


def test_inverse_untargeted_counts_object_only_nodes(spark):
    """A node known ONLY as a resource object must still be a focus for
    untargeted inverse-path cardinality shapes."""
    rows = [
        ("iri", "http://ex/a", "http://p/knows", "iri", "http://ex/popular", None, None, None),
        ("iri", "http://ex/b", "http://p/knows", "iri", "http://ex/popular", None, None, None),
        ("iri", "http://ex/b", "http://p/label", "literal", "b", None, None, None),
    ]
    g = spark.createDataFrame(rows, SCHEMA)
    v = _viol(validate_shapes(g, [
        Shape("few-followers", "http://p/knows", inverse=True, max_count=1),
    ]))
    # 'popular' never appears as a subject, but has 2 inverse values
    assert ("http://ex/popular", "few-followers", "maxCount", "2") in v
    # the literal object "b" must NOT be a focus node
    assert not any(f == "b" for f, *_ in v)


def test_datatype_xsd_string_accepts_plain_literals(spark):
    """ADVICE r7 #3 regression: the engine stores plain literals with NULL
    datatype; a Shape(datatype=xsd:string) must treat them as xsd:string
    (RDF 1.1 simple-literal synonym) — only genuinely differently-typed or
    lang-tagged values violate."""
    XSD_STRING = "http://www.w3.org/2001/XMLSchema#string"
    XSD_INT = "http://www.w3.org/2001/XMLSchema#integer"
    rows = [
        ("iri", "http://ex/a", "http://p/v", "literal", "plain", None, None, None),
        ("iri", "http://ex/b", "http://p/v", "literal", "typed", XSD_STRING, None, None),
        ("iri", "http://ex/c", "http://p/v", "literal", "5", XSD_INT, None, None),
        ("iri", "http://ex/d", "http://p/v", "literal", "hi", None, "en", None),
    ]
    g = spark.createDataFrame(rows, SCHEMA)
    v = _viol(validate_shapes(g, [Shape("v-str", "http://p/v", datatype=XSD_STRING)]))
    assert v == {
        ("http://ex/c", "v-str", "datatype", "5"),
        ("http://ex/d", "v-str", "datatype", "hi"),
    }

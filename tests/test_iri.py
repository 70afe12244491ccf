"""IRI-safe encoding (SURVEY.md O21) — the JVM Column expression must agree
with the Python reference implementation for all inputs."""

from __future__ import annotations

from urllib.parse import quote

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from p5_rdf_rdb2rdf_spark.iri import iri_safe_col, iri_safe_py


def _spark_encode(spark, values: list[str]) -> list[str]:
    df = spark.createDataFrame([(v,) for v in values], "v string")
    return [r.e for r in df.select(iri_safe_col(F.col("v")).alias("e")).collect()]


def test_basic_cases(spark):
    cases = [
        "abc",
        "a b",
        "a/b",
        "a+b",
        "a*b",
        "a~b",
        "a%b",
        "Læring å lese",
        "k;v=x",
        "100%",
        "tab\there",
        "emoji🙂",
        "-._~",
        "",
    ]
    got = _spark_encode(spark, cases)
    want = [iri_safe_py(c) for c in cases]
    assert got == want


def test_py_matches_urllib():
    assert iri_safe_py("a b~c/d") == quote("a b~c/d", safe="-._~")
    assert iri_safe_py("a b~c/d") == "a%20b~c%2Fd"


@settings(max_examples=30, deadline=None)
@given(st.lists(st.text(min_size=0, max_size=40), min_size=1, max_size=20))
def test_property_jvm_equals_python(spark, values):
    got = _spark_encode(spark, values)
    want = [iri_safe_py(v) for v in values]
    assert got == want

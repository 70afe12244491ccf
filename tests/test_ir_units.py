"""Driver-side unit/property tests (no Spark): template parsing, CURIE
expansion, projection-list splitting."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from p5_rdf_rdb2rdf_spark.compiler import _split_select
from p5_rdf_rdb2rdf_spark.ir import expand_curie, parse_template, template_columns


def test_parse_template_basic():
    assert parse_template("http://e/{a}/{b}") == [
        (False, "http://e/"),
        (True, "a"),
        (False, "/"),
        (True, "b"),
    ]
    assert template_columns("x{a}y{b}z") == ["a", "b"]
    assert parse_template("{only}") == [(True, "only")]


def test_parse_template_escapes():
    # \{ \} produce literal braces (R2RML §7.3); \\ a literal backslash
    assert parse_template(r"a\{b\}c{d}") == [(False, "a{b}c"), (True, "d")]
    assert parse_template(r"x\\y") == [(False, "x\\y")]


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.one_of(
            st.text(alphabet="abcxyz/:.-% ~", min_size=0, max_size=6),
            st.tuples(st.text(alphabet="abc_", min_size=1, max_size=5)),
        ),
        min_size=1,
        max_size=8,
    )
)
def test_parse_template_roundtrip(parts):
    """Rebuilding the template from parsed segments is the identity (modulo
    merged adjacent literals)."""
    tpl = "".join(
        "{%s}" % p[0] if isinstance(p, tuple) else p.replace("\\", "\\\\").replace("{", "\\{").replace("}", "\\}")
        for p in parts
    )
    parsed = parse_template(tpl)
    rebuilt = "".join(seg if not is_col else "{%s}" % seg for is_col, seg in parsed)
    want = "".join("{%s}" % p[0] if isinstance(p, tuple) else p for p in parts)
    assert rebuilt == want


def test_expand_curie():
    ns = {"dc": "http://purl.org/dc/terms/"}
    assert expand_curie("dc:title", ns) == "http://purl.org/dc/terms/title"
    assert expand_curie("foaf:name", {}) == "http://xmlns.com/foaf/0.1/name"  # well-known
    assert expand_curie("http://x/y", ns) == "http://x/y"
    assert expand_curie("urn:a:b", ns) == "urn:a:b"
    assert expand_curie("noprefix", ns) == "noprefix"


def test_split_select():
    assert _split_select("a, b, c") == ["a", "b", "c"]
    assert _split_select("f(a, b) AS x, c") == ["f(a, b) AS x", "c"]
    assert _split_select("a || ', ' || b AS j, c") == ["a || ', ' || b AS j", "c"]
    assert _split_select("CASE WHEN x IN (1,2) THEN 'a,b' ELSE c END AS k") == [
        "CASE WHEN x IN (1,2) THEN 'a,b' ELSE c END AS k"
    ]

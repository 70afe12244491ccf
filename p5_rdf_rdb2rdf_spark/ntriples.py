"""Canonical N-Triples/N-Quads serialization (SURVEY.md O6).

Reference parity: ``RDF::RDB2RDF::process_turtle`` serializes the model via
RDF::Trine. For cross-system P/R comparison Turtle prettiness is irrelevant;
sorted canonical N-Triples is the comparable form (FIXTURES.md §5), so that
is what we emit — entirely as JVM Column expressions (``concat``/``replace``),
no Python in the serialization path.

Literal escaping per N-Triples: ``\\`` ``"`` newline, CR, tab.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .terms import KIND_BLANK, KIND_IRI, KIND_LITERAL


def _escape_literal(col: Column) -> Column:
    col = F.replace(col, F.lit("\\"), F.lit("\\\\"))
    col = F.replace(col, F.lit('"'), F.lit('\\"'))
    col = F.replace(col, F.lit("\n"), F.lit("\\n"))
    col = F.replace(col, F.lit("\r"), F.lit("\\r"))
    col = F.replace(col, F.lit("\t"), F.lit("\\t"))
    return col


def _term(kind: Column, value: Column, datatype: Column | None = None, lang: Column | None = None) -> Column:
    iri = F.concat(F.lit("<"), value, F.lit(">"))
    blank = F.concat(F.lit("_:"), value)
    if datatype is None:
        return F.when(kind == KIND_IRI, iri).otherwise(blank)
    lit = F.concat(F.lit('"'), _escape_literal(value), F.lit('"'))
    lit = F.when(
        lang.isNotNull(), F.concat(lit, F.lit("@"), lang)
    ).when(
        datatype.isNotNull(), F.concat(lit, F.lit("^^<"), datatype, F.lit(">"))
    ).otherwise(lit)
    return (
        F.when(kind == KIND_IRI, iri)
        .when(kind == KIND_BLANK, blank)
        .otherwise(lit)
    )


def ntriples_lines(triples: DataFrame) -> DataFrame:
    """Triples DataFrame -> single-column ``line`` DataFrame of N-Triples
    (N-Quads when ``g_value`` is set)."""
    s = _term(F.col("s_kind"), F.col("s_value"))
    p = F.concat(F.lit("<"), F.col("p_value"), F.lit(">"))
    o = _term(F.col("o_kind"), F.col("o_value"), F.col("o_datatype"), F.col("o_lang"))
    g = F.when(
        F.col("g_value").isNotNull(),
        F.concat(F.lit(" <"), F.col("g_value"), F.lit(">")),
    ).otherwise(F.lit(""))
    line = F.concat(s, F.lit(" "), p, F.lit(" "), o, g, F.lit(" ."))
    return triples.select(line.alias("line"))


def to_ntriples(triples: DataFrame, max_triples: int = 1_000_000) -> list[str]:
    """Driver-side sorted canonical N-Triples (tests/goldens only — collects;
    the cap guards against pointing this at a full-scale graph — use
    :func:`ntriples_lines` + a distributed write for those)."""
    rows = ntriples_lines(triples).limit(max_triples + 1).collect()
    if len(rows) > max_triples:
        raise ValueError(
            f"to_ntriples: graph exceeds max_triples={max_triples}; write "
            "ntriples_lines(df) distributed instead (or raise max_triples)"
        )
    return sorted(r.line for r in rows)

"""W3C Direct Mapping front end (SURVEY.md §3 O3, O7, O15, O26, O30–O32).

Reference parity: ``lib/RDF/RDB2RDF/DirectMapping.pm`` introspects the DB via
DBI (``table_info`` / ``column_info`` / ``primary_key_info`` /
``foreign_key_info``) and emits the spec triples with zero configuration
(https://www.w3.org/TR/rdb-direct-mapping/).

Spark has no PK/FK catalog, so introspection is replaced by the table's
Spark schema + a **constraints manifest** (FIXTURES.md §3):

    {"books": {"pk": ["book_id"],
               "fks": [{"cols": ["author_id"], "parent": "authors",
                        "parent_cols": ["author_id"]}]}, ...}

Triple shapes (DM spec; all IRIs below IRI-safe-percent-encoded per part):
  row node      <base/Table/pk1=v1;pk2=v2>           (O30)
  type triple   row rdf:type <base/Table>            (O32)
  literal prop  row <base/Table#col> "lexical"^^xsd  (O31, natural datatypes)
  fk reference  row <base/Table#ref-c1;c2> parentRow (O15 — built from the
                child row's FK values; NO physical join needed, matching the
                reference's join-free FK emission)

No-PK tables get blank-node subjects. The reference (RDF::Trine) issues
fresh per-process labels; for cross-system P/R comparison we instead emit
deterministic labels ``t_<table>_<xxhash64(row-JSON)>`` (FIXTURES.md §5
decision). Under RDF set semantics fully-duplicate rows therefore collapse —
documented deviation, matched by the harness.

Everything compiles to the shared Mapping IR -> one executor
(:mod:`.compiler`), mirroring the reference's R2RML->Simple design.
"""

from __future__ import annotations

import json
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from .ir import Mapping, PredicateObjectMap, RefObject, TermMap, TriplesMap
from .iri import iri_safe_py
from .terms import KIND_BLANK, KIND_LITERAL


def load_manifest(path: str) -> dict[str, Any]:
    with open(path) as f:
        return json.load(f)


def _row_node_template(base: str, table: str, pk: list[str]) -> str:
    pairs = ";".join(f"{iri_safe_py(c)}={{{c}}}" for c in pk)
    return f"{base}{iri_safe_py(table)}/{pairs}"


def _blank_expr(table: str, columns: list[str]) -> TermMap:
    # Hash a null-discriminating JSON encoding of the whole row, NOT the raw
    # columns: Spark's hash functions skip NULL inputs (the seed passes
    # through unchanged), so xxhash64(a, b) would give ('x', NULL) and
    # (NULL, 'x') the same label and merge distinct rows. to_json with
    # ignoreNullFields=false keys every value by column name, so NULL
    # position/type always changes the encoding.
    cols = ", ".join(f"`{c}`" for c in columns)
    return TermMap(
        kind="expr",
        expr=(
            f"concat('t_{table}_', conv(cast(xxhash64(to_json(struct({cols}), "
            f"map('ignoreNullFields', 'false'))) as string), 10, 16))"
        ),
        term_type=KIND_BLANK,
    )


def direct_mapping_ir(
    schemas: dict[str, Any],
    manifest: dict[str, Any],
    base: str = "http://example.com/base/",
) -> Mapping:
    """Build the Mapping IR for a whole schema (O3 whole-schema scan).

    ``schemas``: table name -> Spark StructType (from ``spark.table(t).schema``
    — replaces DBI ``column_info``). ``manifest``: constraints per table.
    """
    m = Mapping(base=base)
    for table, schema in schemas.items():
        cons = manifest.get(table, {"pk": [], "fks": []})
        pk: list[str] = cons.get("pk", [])
        colnames = [f.name for f in schema.fields]

        if pk:
            subject = TermMap(kind="template", template=_row_node_template(base, table, pk))
        else:
            subject = _blank_expr(table, colnames)

        tm = TriplesMap(
            name=f"dm:{table}",
            table=table,
            subject=subject,
            classes=[f"{base}{iri_safe_py(table)}"],
        )

        # literal property triples, one per column (NULLs suppressed by O10)
        for f in schema.fields:
            prop = f"{base}{iri_safe_py(table)}#{iri_safe_py(f.name)}"
            tm.poms.append(
                PredicateObjectMap(
                    predicates=[TermMap.iri_constant(prop)],
                    objects=[TermMap(kind="column", column=f.name, term_type=KIND_LITERAL)],
                )
            )

        # foreign-key reference triples (O15): parent row node from the
        # child row's own FK values — join-free, like the reference
        for fk in cons.get("fks", []):
            parent = fk["parent"]
            pcons = manifest.get(parent, {})
            ppk: list[str] = pcons.get("pk", [])
            if not ppk or list(fk.get("parent_cols", [])) != ppk:
                continue  # DM only references candidate keys; skip otherwise
            ref_iri = f"{base}{iri_safe_py(table)}#ref-" + ";".join(
                iri_safe_py(c) for c in fk["cols"]
            )
            pairs = ";".join(
                f"{iri_safe_py(pc)}={{{cc}}}" for pc, cc in zip(ppk, fk["cols"])
            )
            obj = TermMap(
                kind="template",
                template=f"{base}{iri_safe_py(parent)}/{pairs}",
            )
            tm.poms.append(
                PredicateObjectMap(
                    predicates=[TermMap.iri_constant(ref_iri)], objects=[obj]
                )
            )

        m.triples_maps[tm.name] = tm
    return m


def direct_map(
    spark: SparkSession,
    tables: dict[str, DataFrame],
    manifest: dict[str, Any],
    base: str = "http://example.com/base/",
    dedup: bool = True,
    only: list[str] | None = None,
) -> DataFrame:
    """Direct-map a set of tables to one triples DataFrame.

    ``only`` restricts to a table subset (the reference's table filter on
    ``DirectMapping->process``)."""
    selected = {t: df for t, df in tables.items() if only is None or t in only}
    ir = direct_mapping_ir({t: df.schema for t, df in selected.items()}, manifest, base)
    from .compiler import compile_mapping

    return compile_mapping(spark, ir, tables=selected, dedup=dedup)

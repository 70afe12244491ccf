"""Pattern-query stores (SURVEY.md O12, §4.3).

Reference parity: ``lib/RDF/RDB2RDF/DirectMapping/Store.pm`` answers
``get_statements($s,$p,$o[,$g])`` **lazily**: bound terms are decoded back
into (table, pk values / column) and translated into targeted SQL ``WHERE``
clauses instead of dumping the whole database.

Two Spark re-expressions:

:class:`TripleStore`
    over a *materialized* triples DataFrame/table — bound terms become
    ``where`` predicates; when the table is written through
    :class:`.io.graph_table.GraphTable` (predicate-bucket partitioning),
    a bound predicate prunes partitions, matching the Store's
    column-targeted SQL in spirit and cost.

:class:`DirectMappingStore`
    *virtual* — no materialized graph at all. The pattern is decoded
    driver-side (the DM IRI scheme is invertible by construction) and
    compiled into a plan over only the needed source table with pushed-down
    filters: bound subject => ``WHERE pk = v``; bound predicate => only that
    column's triple pattern; bound object => ``WHERE col = value``.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any
from urllib.parse import unquote

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .compiler import compile_mapping
from .direct_mapping import direct_mapping_ir
from .ir import Mapping, TriplesMap
from .terms import KIND_IRI, KIND_LITERAL, RDF_TYPE


# ---------------------------------------------------------------------------


class TripleStore:
    """get_statements over a materialized triples DataFrame."""

    def __init__(self, triples: DataFrame):
        self.df = triples

    def get_statements(
        self,
        s: str | None = None,
        p: str | None = None,
        o: str | None = None,
        g: str | None = None,
        o_kind: str | None = None,
    ) -> DataFrame:
        df = self.df
        if s is not None:
            df = df.where(F.col("s_value") == s)
        if p is not None:
            df = df.where(F.col("p_value") == p)
        if o is not None:
            df = df.where(F.col("o_value") == o)
        if o_kind is not None:
            df = df.where(F.col("o_kind") == o_kind)
        if g is not None:
            df = df.where(F.col("g_value") == g)
        return df

    def count_pattern(self, **kw: Any) -> int:
        return self.get_statements(**kw).count()


# ---------------------------------------------------------------------------


@dataclass
class _DecodedSubject:
    table: str
    pk_values: dict[str, str]


@dataclass
class _DecodedPredicate:
    table: str
    column: str | None  # literal property
    ref_cols: list[str] | None  # fk reference property


class DirectMappingStore:
    """Lazy Direct-Mapping store over source tables (no materialization).

    The DM IRI scheme (``<base/Table/pk=v;...>``, ``<base/Table#col>``,
    ``<base/Table#ref-c1;c2>``) is invertible; decoding happens driver-side
    and the resulting plan scans one table with Catalyst-pushed filters —
    the Spark analog of the reference's one-targeted-SQL-per-pattern.
    """

    def __init__(
        self,
        spark: SparkSession,
        tables: dict[str, DataFrame],
        manifest: dict[str, Any],
        base: str = "http://example.com/base/",
    ):
        self.spark = spark
        self.tables = tables
        self.manifest = manifest
        self.base = base
        self._ir = direct_mapping_ir(
            {t: df.schema for t, df in tables.items()}, manifest, base
        )

    # -- decoding ----------------------------------------------------------
    def _decode_subject(self, s: str) -> _DecodedSubject | None:
        if not s.startswith(self.base):
            return None
        rest = s[len(self.base):]
        if "/" not in rest:
            return None
        table_enc, pairs = rest.split("/", 1)
        table = unquote(table_enc)
        if table not in self.tables:
            return None
        pk_values = {}
        for pair in pairs.split(";"):
            if "=" not in pair:
                return None
            k, v = pair.split("=", 1)
            pk_values[unquote(k)] = unquote(v)
        return _DecodedSubject(table, pk_values)

    def _decode_predicate(self, p: str) -> _DecodedPredicate | None:
        if not p.startswith(self.base) or "#" not in p:
            return None
        rest = p[len(self.base):]
        table_enc, frag = rest.split("#", 1)
        table = unquote(table_enc)
        if table not in self.tables:
            return None
        if frag.startswith("ref-"):
            cols = [unquote(c) for c in frag[4:].split(";")]
            return _DecodedPredicate(table, None, cols)
        return _DecodedPredicate(table, unquote(frag), None)

    # -- pattern query -------------------------------------------------------
    def get_statements(
        self,
        s: str | None = None,
        p: str | None = None,
        o: str | None = None,
    ) -> DataFrame:
        """Bound-term pattern -> minimal plan over the source tables."""
        ir = self._ir
        selected: dict[str, TriplesMap] = dict(ir.triples_maps)

        # bound predicate: keep only the table + the one matching POM
        if p is not None:
            dec = self._decode_predicate(p)
            if dec is None and p != RDF_TYPE:
                return self._empty()
            pruned: dict[str, TriplesMap] = {}
            for name, tm in selected.items():
                tbl = tm.table
                if dec is not None and tbl != dec.table:
                    continue
                keep = TriplesMap(
                    name=tm.name,
                    table=tm.table,
                    sql=tm.sql,
                    subject=tm.subject,
                    classes=tm.classes if p == RDF_TYPE else [],
                    graphs=tm.graphs,
                )
                if p != RDF_TYPE:
                    keep.poms = [
                        pom
                        for pom in tm.poms
                        if any(
                            pm.constant_value == p for pm in pom.predicates
                        )
                    ]
                    if not keep.poms:
                        continue
                pruned[name] = keep
            selected = pruned

        # bound subject: restrict to its table and push pk = v
        subject_filter = None
        if s is not None:
            dec_s = self._decode_subject(s)
            if dec_s is None:
                return self._empty()
            selected = {
                n: tm for n, tm in selected.items() if tm.table == dec_s.table
            }
            subject_filter = dec_s

        if not selected:
            return self._empty()

        sub_ir = Mapping(triples_maps=selected, namespaces=ir.namespaces, base=ir.base)
        tables = dict(self.tables)
        if subject_filter is not None:
            src = tables[subject_filter.table]
            for k, v in subject_filter.pk_values.items():
                src = src.where(F.col(k).cast("string") == v)
            tables[subject_filter.table] = src

        df = compile_mapping(self.spark, sub_ir, tables=tables, dedup=True)
        if s is not None:
            df = df.where(F.col("s_value") == s)
        if p is not None:
            df = df.where(F.col("p_value") == p)
        if o is not None:
            df = df.where(F.col("o_value") == o)
        return df

    def _empty(self) -> DataFrame:
        return self.spark.createDataFrame(
            [],
            schema="s_kind string, s_value string, p_value string, o_kind string, "
            "o_value string, o_datatype string, o_lang string, g_value string",
        )

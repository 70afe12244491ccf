"""Top-level facade mirroring the reference's public API.

Reference parity (``lib/RDF/RDB2RDF.pm``): ``RDF::RDB2RDF->new($flavour,
@args)`` dispatches to Simple / R2RML / DirectMapping, and every flavour
exposes ``process($dbh, $dest)`` and ``process_turtle($dbh, %opts)``.

Here the "database handle" is a dict of table-name -> DataFrame (plus the
constraints manifest for Direct Mapping), and the destination is the
canonical triples DataFrame (callers sink it via GraphTable / collect /
foreachPartition, the Spark analogs of Model-vs-callback, SURVEY.md O4/O5).

    >>> proc = RDB2RDF.new("R2RML", turtle_text)
    >>> triples = proc.process(spark, tables)
    >>> print(proc.process_turtle(spark, tables))   # serialized graph
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession

from .compiler import compile_mapping
from .direct_mapping import direct_mapping_ir
from .ir import Mapping
from .ntriples import to_ntriples
from .r2rml import r2rml_to_ir
from .simple import simple_to_ir
from .turtle_writer import to_turtle


class RDB2RDF:
    """Factory + common processing surface (all three flavours)."""

    def __init__(self, ir: Mapping, manifest: dict[str, Any] | None = None, dm_base: str | None = None):
        self.ir = ir
        self._manifest = manifest
        self._dm_base = dm_base

    # -- factory (RDF::RDB2RDF->new($flavour, @args)) -----------------------
    @staticmethod
    def new(flavour: str, *args: Any, **kw: Any) -> "RDB2RDF":
        f = flavour.lower().replace("::", "").replace("-", "").replace("_", "")
        if f == "r2rml":
            return RDB2RDF(r2rml_to_ir(*args, **kw))
        if f == "simple":
            return RDB2RDF(simple_to_ir(*args, **kw))
        if f == "directmapping":
            # DirectMapping->new(prefix => $base): IR is schema-dependent, so
            # it's built lazily at process() time from the tables + manifest
            base = kw.get("prefix") or (args[0] if args else "http://example.com/base/")
            return RDB2RDF(Mapping(), manifest=kw.get("manifest"), dm_base=base)
        raise ValueError(f"unknown flavour {flavour!r} (Simple | R2RML | DirectMapping)")

    # -- processing ----------------------------------------------------------
    def _effective_ir(self, tables: dict[str, DataFrame] | None, manifest: dict | None) -> Mapping:
        if self._dm_base is not None:
            man = manifest or self._manifest or {}
            return direct_mapping_ir(
                {t: df.schema for t, df in (tables or {}).items()}, man, self._dm_base
            )
        return self.ir

    def process(
        self,
        spark: SparkSession,
        tables: dict[str, DataFrame] | None = None,
        manifest: dict | None = None,
        dedup: bool = True,
        **kw: Any,
    ) -> DataFrame:
        """Mapping -> triples DataFrame (the reference's model/callback dest
        becomes a DataFrame the caller sinks)."""
        ir = self._effective_ir(tables, manifest)
        return compile_mapping(spark, ir, tables=tables, dedup=dedup, **kw)

    def process_turtle(
        self,
        spark: SparkSession,
        tables: dict[str, DataFrame] | None = None,
        manifest: dict | None = None,
        namespaces: dict[str, str] | None = None,
        **kw: Any,
    ) -> str:
        """Serialize the processed graph as Turtle with the mapping's
        namespace prefixes (``RDF/RDB2RDF.pm::process_turtle`` parity)."""
        triples = self.process(spark, tables, manifest=manifest, **kw)
        ir = self._effective_ir(tables, manifest)
        ns = dict(ir.namespaces)
        if namespaces:
            ns.update(namespaces)
        return to_turtle(triples, namespaces=ns)

    def process_ntriples(self, spark: SparkSession, tables=None, manifest=None, **kw: Any) -> list[str]:
        return to_ntriples(self.process(spark, tables, manifest=manifest, **kw))

    def process_each(self, spark: SparkSession, callback, tables=None, manifest=None, **kw: Any) -> None:
        """Streaming-callback destination parity (``Simple.pm::process`` with
        a coderef dest, SURVEY.md O5): ``callback`` runs once per executor
        partition over an iterator of triple Rows — no driver buffering."""
        self.process(spark, tables, manifest=manifest, **kw).foreachPartition(callback)

    # -- mapping JSON round trip (O37) ---------------------------------------
    def to_json(self, **kw: Any) -> str:
        return self.ir.to_json(**kw)

    @staticmethod
    def from_json(s: str) -> "RDB2RDF":
        return RDB2RDF(Mapping.from_json(s))

"""Incremental (Structured Streaming) triple construction.

The reference is a batch mapper (SURVEY.md §3.6: no streaming operators),
but its *callback sink* contract (``Simple.pm::process`` with a coderef —
per-triple streaming consumption) has a natural Spark-first upgrade: the
mapping compiler (:mod:`..compiler`) emits only narrow transformations
(``where`` / ``select`` / ``unionByName`` / stream-static joins), so the
SAME Mapping IR runs unchanged over a **streaming** DataFrame:

    new source files -> compile_mapping(stream) -> exactly-once parquet sink

Semantics and scale notes:

- **Exactly-once**: the built-in file sink + ``checkpointLocation`` gives
  exactly-once output for this deterministic pipeline — a restart resumes
  from the last committed batch and never re-emits a processed file's
  triples. (This is the streaming analog of the batch pipeline's
  StageCheckpointer resume contract.)
- **Set semantics**: global ``dropDuplicates`` over an unbounded stream
  needs unbounded state, so the streaming path emits per-row triples
  (``dedup=False``) and RDF set semantics are applied at read time
  (``spark.read.parquet(out).dropDuplicates(...)``) or by a periodic
  compaction — the standard lambda/medallion split.
- **Ref-object joins** compile to stream-static joins (the parent side is
  a static dimension), which Spark executes as per-micro-batch broadcast
  joins — no streaming state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..compiler import compile_mapping
from ..ir import Mapping


def stream_source(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str,
    fmt: str = "parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-based streaming source (the streaming analog of O1's base-table
    scan). ``max_files_per_trigger`` bounds micro-batch size for backfill."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.format(fmt).load(path)


def stream_mapping(
    spark: SparkSession,
    ir: Mapping,
    stream_tables: dict[str, DataFrame],
    static_tables: dict[str, DataFrame] | None = None,
) -> DataFrame:
    """Compile a Mapping IR over streaming source tables.

    ``stream_tables`` maps logical-table names to streaming DataFrames;
    ``static_tables`` supplies dimension tables for ref-object joins
    (stream-static). Returns an (unbounded) 8-column triples DataFrame —
    ``dedup`` is forced off (see module docstring)."""
    tables = {**(static_tables or {}), **stream_tables}
    return compile_mapping(spark, ir, tables=tables, dedup=False)


def write_triples_stream(
    triples: DataFrame,
    out_path: str,
    checkpoint_path: str,
    available_now: bool = True,
):
    """Exactly-once parquet sink for a streaming triples DataFrame.

    ``available_now=True`` processes everything currently available and
    stops (the batch-backfill / catch-up trigger); pass ``False`` for a
    continuously-running micro-batch query. Returns the StreamingQuery —
    caller awaits it."""
    writer = (
        triples.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()

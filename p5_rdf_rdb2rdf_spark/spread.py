"""Scale-adaptive input spreading (guide §2.5 "input skew" / §2.6).

A scan of a small table (one file, one parquet row group) yields ONE task,
so any CPU-heavy per-row work downstream — codegen'd string/term
construction, interpreted higher-order-function folds (MinHash signature
folds, hyperplane dot products), Arrow UDF batches — serializes on a single
core while the rest of the cluster idles. The standard fix is a round-robin
repartition right after the read (the guide's remedy for unsplittable-input
skew), which costs one shuffle of the (small) input and unlocks full
parallelism.

``spread_small`` applies that fix ONLY when the input is small: the decision
reads the optimizer's size estimate (``optimizedPlan().stats().sizeInBytes``
— a driver-side metadata lookup, never a job), so a table that is big enough
to already feed the whole cluster passes through untouched and the same code
path stays shuffle-free at 100 TB. The threshold is parameterised
(``SPARK_GRAFT_SPREAD_BYTES``, default 256 MB); the policy "repartition
inputs smaller than a few hundred MB up to cluster parallelism before
CPU-bound per-row work" is scale-independent — that much data shuffles in
well under a second on any topology, and the alternative is one core doing
all the work.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

_DEFAULT_SPREAD_BYTES = 256 * 1024 * 1024


def _plan_size_bytes(df: DataFrame) -> int | None:
    """Optimizer size estimate for ``df`` (driver-side only; no job)."""
    try:
        size = df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        # py4j converts scala.math.BigInt to a Python int when it fits;
        # very large estimates come back as a JavaObject
        return size if isinstance(size, int) else int(size.toString())
    except Exception:  # pragma: no cover - defensive: never break a plan
        return None


def spread_small(df: DataFrame, target: int | None = None) -> DataFrame:
    """Round-robin repartition ``df`` to ``target`` (default: the cluster's
    ``defaultParallelism``) partitions when the optimizer estimates it below
    the spread threshold; identity otherwise.

    Deterministic under retry (Spark's sort-before-repartition, on by
    default) and a pure re-distribution: no operator result in this engine
    depends on physical row placement.
    """
    sc = df.sparkSession.sparkContext
    n = target or sc.defaultParallelism
    threshold = int(os.environ.get("SPARK_GRAFT_SPREAD_BYTES", _DEFAULT_SPREAD_BYTES))
    size = _plan_size_bytes(df)
    if size is None or size > threshold:
        return df
    return df.repartition(n)

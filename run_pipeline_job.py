#!/usr/bin/env python
"""spark-submit entry point: run the staged KG pipeline over an interleaved
documents table (parquet/Iceberg path) with per-stage checkpoints + lineage.

    spark-submit --py-files p5_rdf_rdb2rdf_spark.zip run_pipeline_job.py \
        <input_docs_path> <workdir>

Resumable: re-submitting with the same workdir skips completed stages
(north_rule checkpoint/lineage contract).
"""

from __future__ import annotations

import json
import sys

from pyspark.sql import SparkSession


def main() -> None:
    input_path, workdir = sys.argv[1], sys.argv[2]
    spark = SparkSession.builder.appName("kg-construct").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from p5_rdf_rdb2rdf_spark.pipeline.kgpipeline import run_pipeline

    docs = (
        spark.read.table(input_path)
        if "." in input_path and "/" not in input_path
        else spark.read.parquet(input_path)
    )
    result = run_pipeline(spark, docs, workdir, n_buckets=64)
    print(
        json.dumps(
            {
                "snapshot": result.snapshot_id,
                "triples": result.triples.count(),
                "stages": {
                    k: {kk: v[kk] for kk in ("rows", "wall_sec") if kk in v}
                    for k, v in result.lineage["stages"].items()
                },
            }
        )
    )


if __name__ == "__main__":
    main()

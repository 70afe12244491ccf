#!/usr/bin/env bash
# Production launch (north_rule framing): package the engine and run the KG
# pipeline via spark-submit --py-files at a chosen executor count.
#
#   ./submit.sh <master> <num_executors> <input_docs_path> <workdir>
#
# Sandbox example (local mode):
#   ./submit.sh 'local[8]' 8 /tmp/spark_graft_corpus_100000 /tmp/kg_run
#
# Cluster example (the N vs 4N scaling protocol):
#   ./submit.sh yarn 64  s3://corpus/docs  s3://graphs/run1
#   ./submit.sh yarn 256 s3://corpus/docs  s3://graphs/run2
set -euo pipefail

MASTER="${1:-local[8]}"
EXECUTORS="${2:-8}"
INPUT="${3:-/tmp/spark_graft_corpus_100000}"
WORKDIR="${4:-/tmp/kg_run}"

HERE="$(cd "$(dirname "$0")" && pwd)"
ZIP="/tmp/p5_rdf_rdb2rdf_spark.zip"
(cd "$HERE" && rm -f "$ZIP" && zip -qr "$ZIP" p5_rdf_rdb2rdf_spark)

spark-submit \
  --master "$MASTER" \
  --num-executors "$EXECUTORS" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.adaptive.skewJoin.enabled=true \
  --conf spark.sql.shuffle.partitions=$((EXECUTORS * 4)) \
  --py-files "$ZIP" \
  "$HERE/run_pipeline_job.py" "$INPUT" "$WORKDIR"

#!/usr/bin/env bash
# Deploy path for a real multi-executor cluster (the north rule's
# `spark-submit --py-files` requirement). The engine is pure Python —
# one zip of the package is the whole deployment artifact.
set -euo pipefail
cd "$(dirname "$0")/.."

zip -qr /tmp/ojs_engine.zip opensearch_jvector_plugin_spark -x '*__pycache__*'

# Example: build an index on a cluster (swap master/conf for your cluster;
# local[*] shown so the script is runnable in this sandbox).
spark-submit \
  --master "${SPARK_MASTER:-local[*]}" \
  --conf spark.sql.shuffle.partitions="${SHUFFLE_PARTITIONS:-64}" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.session.timeZone=UTC \
  --conf spark.sql.execution.arrow.pyspark.enabled=true \
  --py-files /tmp/ojs_engine.zip \
  scripts/submit_build_job.py "$@"

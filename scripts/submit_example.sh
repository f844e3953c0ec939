#!/usr/bin/env bash
# Ship the engine to a cluster as --py-files modules (north rule).
set -euo pipefail
cd "$(dirname "$0")/.."
zip -qr /tmp/cadastre_pg_spark.zip cadastre_pg_spark -x '*__pycache__*'
exec spark-submit \
  --master "${SPARK_MASTER:-local[32]}" \
  --py-files /tmp/cadastre_pg_spark.zip \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.adaptive.skewJoin.enabled=true \
  --conf spark.sql.execution.arrow.pyspark.enabled=true \
  --conf spark.sql.session.timeZone=UTC \
  "$@"

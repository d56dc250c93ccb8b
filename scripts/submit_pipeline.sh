#!/usr/bin/env bash
# Package the engine and launch the quality-filter pipeline via spark-submit.
#   ./scripts/submit_pipeline.sh INPUT_PARQUET OUTPUT_TABLE [MASTER] [extra args...]
# On a real cluster set MASTER to yarn/k8s and pass --model-dir pointing at a
# shared-filesystem copy of models/heli.
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
INPUT="$1"; OUTPUT="$2"; MASTER="${3:-local[8]}"; shift 2 || true; shift || true

ZIP="$(mktemp -d)/heliport_spark.zip"
(cd "$REPO" && zip -qr "$ZIP" heliport_spark -x '*__pycache__*')

exec spark-submit \
  --master "$MASTER" \
  --py-files "$ZIP" \
  --driver-memory "${DRIVER_MEMORY:-8g}" \
  --conf spark.sql.shuffle.partitions=32 \
  --conf spark.sql.execution.arrow.maxRecordsPerBatch=10000 \
  --conf spark.sql.parquet.columnarReaderBatchSize=1024 \
  --conf spark.executorEnv.OMP_NUM_THREADS=1 \
  --conf spark.executorEnv.OPENBLAS_NUM_THREADS=1 \
  "$REPO/scripts/pipeline_submit.py" "$INPUT" "$OUTPUT" \
  --model-dir "${HELIPORT_MODEL_DIR:-$REPO/models/heli}" "$@"

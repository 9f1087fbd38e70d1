#!/usr/bin/env bash
# spark-submit packaging + launch (north_rule: spark-submit --py-files).
# Usage: scripts/submit_build.sh <input_parquet_or_table> <index_out_dir> [extra spark-submit args...]
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
INPUT="$1"; OUT="$2"; shift 2 || true

ZIP="$(mktemp -d)/pkg.zip"
(cd "$REPO" && zip -qr "$ZIP" parser_indexer_py_spark -x '*__pycache__*')

exec spark-submit \
  --master "${SPARK_MASTER:-local[${SPARK_GRAFT_CPUS:-32}]}" \
  --conf spark.sql.shuffle.partitions="${SHUFFLE_PARTITIONS:-64}" \
  --conf spark.sql.adaptive.enabled=true \
  --py-files "$ZIP" \
  "$@" \
  "$REPO/scripts/submit_main.py" build --input "$INPUT" --out "$OUT"

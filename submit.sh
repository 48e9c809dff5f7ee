#!/usr/bin/env bash
# Package the engine and run the flagship pipeline via spark-submit --py-files
# (the north rule's deployment surface). On a real cluster, swap --master.
#
#   ./submit.sh [sf_dir] [output_dir]
set -euo pipefail

SF_DIR="${1:-/root/testdata/sf0.001}"
OUT_DIR="${2:-/tmp/chronographer_out}"
CPUS="${SPARK_GRAFT_CPUS:-32}"

cd "$(dirname "$0")"
ZIP=/tmp/chronographer_spark.zip
rm -f "$ZIP"
python -c "
import zipfile, pathlib
with zipfile.ZipFile('$ZIP', 'w') as z:
    for p in pathlib.Path('chronographer_spark').rglob('*.py'):
        z.write(p, p.as_posix())
"

spark-submit \
  --master "local[$CPUS]" \
  --py-files "$ZIP" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.execution.arrow.pyspark.enabled=true \
  --conf spark.sql.shuffle.partitions="$((CPUS * 4))" \
  --driver-memory "${SPARK_DRIVER_MEM:-48g}" \
  scripts/run_pipeline.py --sf-dir "$SF_DIR" --out "$OUT_DIR"

#!/usr/bin/env bash
# Package the engine and run the extraction job via spark-submit --py-files —
# the cluster submission path from BASELINE.json's north rule. On a real
# cluster replace --master local[N] with the cluster master URL; everything
# else is unchanged (the job auto-scales partitions from defaultParallelism).
#
# Usage: ./scripts_submit.sh <cores> <pages_parquet_dir> [reps]
set -euo pipefail
CORES="${1:?usage: scripts_submit.sh <cores> <corpus.parquet> [reps]}"
CORPUS="${2:?usage: scripts_submit.sh <cores> <corpus.parquet> [reps]}"
REPS="${3:-1}"
HERE="$(cd "$(dirname "$0")" && pwd)"
ZIP="$(mktemp -d)/pdfextractor_spark.zip"
(cd "$HERE" && python - "$ZIP" <<'PY'
import os, sys, zipfile
zip_path = sys.argv[1]
with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as z:
    for root, dirs, files in os.walk("pdfextractor_spark"):
        dirs[:] = [d for d in dirs if d != "__pycache__"]
        for f in files:
            if f.endswith(".py"):
                p = os.path.join(root, f)
                z.write(p, p)
print(f"packaged {zip_path}")
PY
)
exec spark-submit \
  --master "local[$CORES]" \
  --py-files "$ZIP" \
  --conf spark.sql.shuffle.partitions="$CORES" \
  --conf spark.sql.execution.arrow.pyspark.enabled=true \
  "$HERE/pdfextractor_spark/benchjob.py" "$CORPUS" "$CORES" "$REPS"

#!/bin/bash
# Package the engine and run the geocode pipeline via spark-submit
# --py-files — the shipping shape the north rule requires.
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
ZIP=/tmp/mundipy_spark.zip
rm -f "$ZIP"
cd "$REPO"
python - <<EOF
import zipfile, os
with zipfile.ZipFile("$ZIP", "w", zipfile.ZIP_DEFLATED) as z:
    for root, _, files in os.walk("mundipy_spark"):
        for f in files:
            if f.endswith(".py"):
                p = os.path.join(root, f)
                z.write(p, p)
print("packaged", "$ZIP")
EOF
exec spark-submit --master "local[${SPARK_GRAFT_CPUS:-8}]" \
    --conf spark.sql.session.timeZone=UTC \
    --conf spark.sql.execution.arrow.pyspark.enabled=true \
    --py-files "$ZIP" \
    "$REPO/tools/submit_job.py" "$@"

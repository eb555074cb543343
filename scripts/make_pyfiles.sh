#!/usr/bin/env bash
# Package the engine for spark-submit --py-files (north_rule shipping
# contract). Produces dist/scrapelect_spark.zip.
#
# Cluster usage:
#   spark-submit --py-files dist/scrapelect_spark.zip \
#       --conf spark.sql.adaptive.enabled=true \
#       your_job.py
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/scrapelect_spark.zip
python - <<'EOF'
import os
import zipfile

with zipfile.ZipFile("dist/scrapelect_spark.zip", "w", zipfile.ZIP_DEFLATED) as z:
    for root, _dirs, files in os.walk("scrapelect_spark"):
        if "__pycache__" in root:
            continue
        for f in files:
            if f.endswith(".py"):
                z.write(os.path.join(root, f))
print("wrote dist/scrapelect_spark.zip")
EOF
unzip -l dist/scrapelect_spark.zip | tail -2

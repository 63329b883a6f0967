#!/bin/sh
# Build the --py-files artifact and show the spark-submit invocation.
#
# Usage: sh tools/package.sh [outdir]
set -e
cd "$(dirname "$0")/.."
OUT="${1:-dist}"
mkdir -p "$OUT"
ZIP="$OUT/osm_jl_spark.zip"
rm -f "$ZIP"
python - "$ZIP" <<'PY'
import os, sys, zipfile
zip_path = sys.argv[1]
with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as z:
    for root, _dirs, files in os.walk("osm_jl_spark"):
        if "__pycache__" in root:
            continue
        for f in files:
            if f.endswith(".py"):
                p = os.path.join(root, f)
                z.write(p, p)
print("wrote", zip_path)
PY
echo
echo "Submit the flagship job on a cluster:"
echo "  spark-submit --py-files $ZIP tools/submit_flagship.py \\"
echo "      --input s3://bucket/pages/ --output s3://bucket/tiles/ \\"
echo "      --manifest s3://bucket/manifest/ --precision 2"

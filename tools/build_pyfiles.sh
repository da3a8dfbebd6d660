#!/bin/sh
# Package joi_spark for spark-submit --py-files distribution.
set -e
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/joi_spark.zip
python - <<'EOF'
import os, zipfile
with zipfile.ZipFile("dist/joi_spark.zip", "w", zipfile.ZIP_DEFLATED) as z:
    for root, _, files in os.walk("joi_spark"):
        for f in files:
            if f.endswith(".py"):
                p = os.path.join(root, f)
                z.write(p, p)
print("dist/joi_spark.zip written")
EOF

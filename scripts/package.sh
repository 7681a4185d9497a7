#!/bin/sh
# Build the --py-files artifact for spark-submit.
set -e
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/pyrdfa3_spark.zip
python - <<'EOF'
import os
import zipfile

with zipfile.ZipFile("dist/pyrdfa3_spark.zip", "w",
                     zipfile.ZIP_DEFLATED) as z:
    for root, _, files in os.walk("pyrdfa3_spark"):
        if "__pycache__" in root:
            continue
        for f in files:
            if f.endswith(".py"):
                p = os.path.join(root, f)
                z.write(p, p)
print("wrote dist/pyrdfa3_spark.zip")
EOF

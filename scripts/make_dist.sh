#!/usr/bin/env bash
# Package the engine for spark-submit --py-files (north-rule deploy path).
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/adopt_spark.zip
# zip only the package (tests/benchmarks stay out of the executor payload)
python - <<'EOF'
import os, zipfile
with zipfile.ZipFile("dist/adopt_spark.zip", "w", zipfile.ZIP_DEFLATED) as z:
    for root, _, files in os.walk("adopt_spark"):
        if "__pycache__" in root:
            continue
        for f in files:
            if f.endswith(".py"):
                p = os.path.join(root, f)
                z.write(p, p)
print("wrote dist/adopt_spark.zip")
EOF

#!/bin/sh
# Package the engine for spark-submit --py-files (north rule: the build runs
# via spark-submit on a multi-executor cluster).
#
#   ./scripts/make_pyfiles.sh            -> dist/ipfs_search_spark.zip
#   spark-submit --py-files dist/ipfs_search_spark.zip bench.py
set -e
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/ipfs_search_spark.zip
python - << 'EOF'
import os
import zipfile

with zipfile.ZipFile("dist/ipfs_search_spark.zip", "w",
                     zipfile.ZIP_DEFLATED) as z:
    for root, _dirs, files in os.walk("ipfs_search_spark"):
        if "__pycache__" in root:
            continue
        for f in files:
            if f.endswith(".py"):
                p = os.path.join(root, f)
                z.write(p, p)
print("wrote dist/ipfs_search_spark.zip")
EOF

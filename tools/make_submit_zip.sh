#!/usr/bin/env bash
# Package the engine for spark-submit --py-files (north rule).
#   tools/make_submit_zip.sh  →  dist/tablex.zip + dist/job_main.py
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/tablex.zip
zip -qr dist/tablex.zip tableextraction_spark -x '*__pycache__*'
cat > dist/job_main.py <<'EOF'
from tableextraction_spark.job import main

if __name__ == "__main__":
    main()
EOF
echo "built dist/tablex.zip ($(du -h dist/tablex.zip | cut -f1)) and dist/job_main.py"

#!/usr/bin/env bash
# Build the --py-files artifact: dist/ts2g2_spark.zip
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/ts2g2_spark.zip
# zip the package from the repo root so the archive root contains
# ts2g2_spark/ (importable after --py-files extraction)
python - <<'EOF'
import os
import zipfile

with zipfile.ZipFile("dist/ts2g2_spark.zip", "w",
                     zipfile.ZIP_DEFLATED) as z:
    for root, dirs, files in os.walk("ts2g2_spark"):
        dirs[:] = [d for d in dirs if d != "__pycache__"]
        for f in files:
            if f.endswith(".py"):
                z.write(os.path.join(root, f))
print("wrote dist/ts2g2_spark.zip")
EOF
echo "example:"
echo "  spark-submit --py-files dist/ts2g2_spark.zip jobs/rollup_job.py \\"
echo "      --input <tokenized_parquet> --catalog <out_dir>"

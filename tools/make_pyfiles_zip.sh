#!/bin/sh
# Package the engine for spark-submit --py-files (north rule shipping mode).
set -e
cd "$(dirname "$0")/.."
rm -f sbustreamspot_core_spark.zip
python - <<'EOF'
import zipfile, pathlib
root = pathlib.Path("sbustreamspot_core_spark")
with zipfile.ZipFile("sbustreamspot_core_spark.zip", "w") as z:
    for p in sorted(root.rglob("*.py")):
        z.write(p, p.as_posix())
print("wrote sbustreamspot_core_spark.zip")
EOF

#!/usr/bin/env bash
# spark-submit packaging (north_rule deployment path): zip the package,
# ship it with --py-files, run the crawl engine driver on a cluster.
#
# In this sandbox there is no cluster; the same command with
# --master local[32] exercises the identical packaging path.
set -euo pipefail
cd "$(dirname "$0")/.."

ZIP=/tmp/thuvienphapluat_crawler_spark.zip
rm -f "$ZIP"
# package only the library (driver script passed separately)
python - <<'EOF'
import zipfile, pathlib
root = pathlib.Path("thuvienphapluat_crawler_spark")
with zipfile.ZipFile("/tmp/thuvienphapluat_crawler_spark.zip", "w") as z:
    for p in sorted(root.rglob("*.py")):
        z.write(p, p.as_posix())
print("packaged", "/tmp/thuvienphapluat_crawler_spark.zip")
EOF

MASTER="${SPARK_MASTER:-local[${SPARK_GRAFT_CPUS:-32}]}"
exec spark-submit \
  --master "$MASTER" \
  --py-files "$ZIP" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.adaptive.skewJoin.enabled=true \
  --conf spark.sql.shuffle.partitions="${SPARK_GRAFT_CPUS:-32}" \
  --conf spark.sql.session.timeZone=UTC \
  tools/submit_driver.py "$@"

#!/bin/bash
# Two-parallelism scaling evidence: same index-build job at local[8] and
# local[32] on identical input, via spark-submit --py-files.
# Usage: scripts/run_scaling.sh [sf_dir] [replicate]
set -e
cd "$(dirname "$0")/.."
SF_DIR=${1:-/root/testdata/sf0.1}
REP=${2:-12}
REPLEN=${3:-1}

rm -f /tmp/tsp_pkg.zip
(cd . && zip -qr /tmp/tsp_pkg.zip pg_ts_semantic_headline_spark)

run() {
  local cores=$1
  spark-submit --master "local[$cores]" \
    --conf spark.sql.shuffle.partitions=$((cores * 2)) \
    --conf spark.sql.adaptive.enabled=true \
    --conf spark.driver.memory=24g \
    --conf spark.ui.enabled=false \
    --py-files /tmp/tsp_pkg.zip \
    scripts/scaling_job.py "$SF_DIR" "/tmp/tsp_scale_idx_$cores" "$REP" "$REPLEN" \
    2>/dev/null | tail -1
}

echo "== local[8] =="
R8=$(run 8)
echo "$R8"
echo "== local[32] =="
R32=$(run 32)
echo "$R32"

python - "$R8" "$R32" <<'EOF'
import json, sys
r8, r32 = json.loads(sys.argv[1]), json.loads(sys.argv[2])
eff = (r32["files_per_sec"] / r8["files_per_sec"]) / (r32["cores"] / r8["cores"])
print(json.dumps({"N_cores": r8["cores"], "4N_cores": r32["cores"],
                  "files_per_sec_N": r8["files_per_sec"],
                  "files_per_sec_4N": r32["files_per_sec"],
                  "scaling_efficiency": round(eff, 3)}))
EOF

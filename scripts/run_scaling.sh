#!/bin/bash
# Two-parallelism scaling evidence: same index-build job at local[8] and
# local[32] on identical input, via spark-submit --py-files.
# Usage: scripts/run_scaling.sh [sf_dir] [replicate]
set -e
cd "$(dirname "$0")/.."
SF_DIR=${1:-/root/testdata/sf0.1}
REP=${2:-96}
REPLEN=${3:-4}
# DISK_ONLY keeps the build's working set OUT of the JVM heap (the on-heap
# columnar cache of tokens+postings at this corpus size drives the 24g heap
# into GC thrash — measured: 120.6s -> 47.0s at local[32] in the same
# window); with spark.local.dir on tmpfs the re-read is page-cache speed
CACHE_LEVEL=${CACHE_LEVEL:-DISK_ONLY}
# OUT_BASE=/dev/shm isolates CPU scaling from single-disk write contention
# (this sandbox shares one ~600 MB/s virtual disk across all "executors";
# a real 4N-executor cluster brings 4N× disks). Shuffle spill dirs follow.
OUT_BASE=${OUT_BASE:-/tmp}

rm -f /tmp/tsp_pkg.zip
(cd . && zip -qr /tmp/tsp_pkg.zip pg_ts_semantic_headline_spark)

# CPUSET=1 confines each leg (JVM + Python workers + its probes) to
# exactly `cores` CPUs via taskset — the honest emulation of an N-core
# executor. Free-running legs let local[4]'s helper threads (GC, shuffle
# IO, Python workers) spill onto the box's 28 idle cores, INFLATING the
# N-leg baseline and understating scaling efficiency (BENCH/BASELINE.md
# §1 artifact #3); a real cluster executor never gets that gift. With
# confinement, the bracketing host probes measure each level's OWN slice,
# so the ceiling comparison stays apples-to-apples.
CPUSET=${CPUSET:-0}
# TASK_CPUS sizes the parallelism to the workload's true per-task CPU
# demand: every Arrow-UDF task runs a JVM task thread AND a Python
# worker, so TASK_CPUS=2 (with CPUSET=1) emulates a cluster whose
# executors set spark.task.cpus=2 — local[cores/2] confined to `cores`
# CPUs. Measured round-5: the default free-running/1-cpu-per-task pairs
# read raw 0.5-0.76 because EACH leg runs 2x oversubscribed (2N runnable
# threads on N allocated cores); at TASK_CPUS=2 four consecutive pairs
# read 0.960/0.865/0.884/0.878 (median 0.881) — the job itself scales,
# the deficit was the emulation's thread bookkeeping, which a real
# cluster solves with spark.task.cpus.
TASK_CPUS=${TASK_CPUS:-1}
run_once() {
  local cores=$1
  local par=$((cores / TASK_CPUS))
  [ "$par" -lt 1 ] && par=1
  local pin=()
  if [ "$CPUSET" = "1" ]; then
    pin=(taskset -c "0-$((cores - 1))")
  fi
  "${pin[@]}" spark-submit --master "local[$par]" \
    --conf spark.sql.shuffle.partitions=$((par * 2)) \
    --conf spark.sql.adaptive.enabled=true \
    --conf spark.driver.memory=24g \
    --conf spark.local.dir="$OUT_BASE/tsp_spark_local" \
    --conf spark.sql.execution.arrow.maxRecordsPerBatch=2000 \
    --conf spark.ui.enabled=false \
    --py-files /tmp/tsp_pkg.zip \
    scripts/scaling_job.py "$SF_DIR" "$OUT_BASE/tsp_scale_idx_$cores" "$REP" "$REPLEN" "$CACHE_LEVEL" \
    2>/dev/null | tail -1
}

# best-of-2 per level: the sandbox VM has CPU-steal spikes; min wall time is
# the steady-state throughput estimate
# RUNS=1 runs each level once — for short healthy-bandwidth windows where
# a best-of-2 pair (~12 min) outlives the window; the window-validity check
# then rests on the bracketing membw probes instead of run agreement
RUNS=${RUNS:-2}
run() {
  local cores=$1
  local a b
  a=$(run_once "$cores")
  if [ "$RUNS" -ge 2 ]; then
    b=$(run_once "$cores")
    set -- "$a" "$b"
  else
    set -- "$a"
  fi
  python - "$@" <<'EOF'
import json, sys
runs = [json.loads(x) for x in sys.argv[1:]]
best = max(runs, key=lambda r: r["files_per_sec"])
best["runs_files_per_sec"] = [r["files_per_sec"] for r in runs]
print(json.dumps(best))
EOF
}

# N and 4N parallelism levels (env-overridable: N_CORES=4 measures 4->16,
# which keeps the TOP level under half the box — the 8->32 pair saturates
# the VM's shared memory bandwidth at its top level, which a real 4N-
# executor cluster, bringing 4N x the bandwidth, does not)
N_CORES=${N_CORES:-8}
N4_CORES=$((N_CORES * 4))
echo "== local[$N_CORES] =="
R8=$(run "$N_CORES")
echo "$R8"
echo "== local[$N4_CORES] =="
R32=$(run "$N4_CORES")
echo "$R32"

python - "$R8" "$R32" <<'EOF'
import json, sys
r8, r32 = json.loads(sys.argv[1]), json.loads(sys.argv[2])
eff = (r32["files_per_sec"] / r8["files_per_sec"]) / (r32["cores"] / r8["cores"])
out = {"N_cores": r8["cores"], "4N_cores": r32["cores"],
       "files_per_sec_N": r8["files_per_sec"],
       "files_per_sec_4N": r32["files_per_sec"],
       "scaling_efficiency": round(eff, 3)}
# host ceiling measured in the same window: what the steal-prone VM can
# physically deliver going 8 -> 32 busy cores, independent of Spark
h8, h32 = r8.get("host_cpu_units_per_sec"), r32.get("host_cpu_units_per_sec")
if h8 and h32:
    ceil = (h32 / h8) / (r32["cores"] / r8["cores"])
    out["host_ceiling_efficiency"] = round(ceil, 3)
    out["efficiency_vs_host_ceiling"] = round(eff / ceil, 3)
# memory-bandwidth window drift: both levels now probe at a FIXED 4
# processes (a >=16-process memcpy probe collapses to ~1 GB/s on this
# host even in healthy windows — scaling_job.py), so the two readings
# measure the SAME quantity and their ratio is how much the window
# changed between the levels (~1.0 = stable window). The old
# membw_ceiling_efficiency divided this by the core ratio, which was
# only meaningful when probes ran at each level's core count.
m8, m32 = r8.get("host_membw_gb_per_sec"), r32.get("host_membw_gb_per_sec")
if m8 and m32:
    out["membw_window_drift_4N_over_N"] = round(m32 / m8, 3)
    out["membw_gb_per_sec_N"] = m8
    out["membw_gb_per_sec_4N"] = m32
print(json.dumps(out))
EOF

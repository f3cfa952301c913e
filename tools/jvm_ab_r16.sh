#!/usr/bin/env bash
# r16 VERDICT task 2: prove-or-revert the 24g/ParallelGC forked-JVM
# default under the DRIVER's protocol — full 240-query graft.Bench at
# 32 cpus, sf0.1, one run per JVM arm, arms ROTATED twice so a box-load
# window cannot sit on one arm (the closest a process-level flag can
# get to ABConf's interleaving). Per-arm per-query MIN over the two
# rotations is the comparison statistic, same as Bench's own protocol.
#   tools/jvm_ab_r16.sh /tmp/jvmab
set -u
OUT="${1:-/tmp/jvmab_r16}"
mkdir -p "$OUT"
cd "$(dirname "$0")/.."
for round in 1 2; do
  for arm in g1_8g g1_24g par_24g; do
    case "$arm" in
      g1_8g)   MEM=8g;  GC=G1 ;;
      g1_24g)  MEM=24g; GC=G1 ;;
      par_24g) MEM=24g; GC=Parallel ;;
    esac
    echo "=== round $round arm $arm ($(date -u +%H:%M:%S)) load=$(cut -d' ' -f1 /proc/loadavg) ==="
    SPARK_DRIVER_MEM=$MEM SPARK_DRIVER_GC=$GC \
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
    SPARK_GRAFT_BENCH_OUT="$OUT/bench_${arm}_r${round}.json" \
      sbt -batch "runMain graft.Bench" \
      > "$OUT/log_${arm}_r${round}.txt" 2>&1
    echo "rc=$? total=$(grep -o '"value":[0-9.]*' "$OUT/bench_${arm}_r${round}.json" | head -1)"
  done
done

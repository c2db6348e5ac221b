#!/usr/bin/env bash
# Dev-only: the full big-SF sweep (judge r7 items #1/#2).
#   scripts/sf1_sweep.sh gen      — regenerate uniform + skewed sf1 dirs
#   scripts/sf1_sweep.sh verify   — Verify both dirs (parquet dumps + oracle)
#   scripts/sf1_sweep.sh check    — DuckDB selfcheck both dumps
#   scripts/sf1_sweep.sh bench    — Bench both dirs + SkewReport
# Artifacts land as CORRECTNESS_{sf1,skew}_r08.txt, BENCH_{sf1,skew}_r08.json,
# SKEW_REPORT_r08.json.
set -euo pipefail
cd "$(dirname "$0")/.."
UNI=testdata-sf1
SKW=testdata-sf1skew
case "${1:?gen|verify|check|bench}" in
  gen)
    SPARK_GRAFT_CPUS=24 scripts/runmain.sh -Xmx24g graft.GenScale /root/testdata/sf0.1 "$UNI" 10 4
    SPARK_GRAFT_CPUS=24 scripts/runmain.sh -Xmx24g graft.GenScale /root/testdata/sf0.1 "$SKW" 10 4 --skew
    ;;
  verify)
    SPARK_GRAFT_CPUS=16 scripts/runmain.sh -Xmx24g graft.Verify "$UNI" /tmp/vsf1 2>/tmp/vsf1.err &
    P1=$!
    SPARK_GRAFT_CPUS=16 scripts/runmain.sh -Xmx24g graft.Verify "$SKW" /tmp/vskew 2>/tmp/vskew.err &
    P2=$!
    wait $P1; wait $P2
    grep -h "\[verify\]" /tmp/vsf1.err /tmp/vskew.err || true
    ;;
  check)
    python3 scripts/selfcheck.py /tmp/vsf1 "$UNI"  | tee CORRECTNESS_sf1_r08.txt &
    P1=$!
    python3 scripts/selfcheck.py /tmp/vskew "$SKW" | tee CORRECTNESS_skew_r08.txt &
    P2=$!
    wait $P1; wait $P2
    ;;
  bench)
    SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SF_DIR="$UNI" scripts/runmain.sh -Xmx48g graft.Bench \
      2>/dev/null | tail -1 > BENCH_sf1_r08.json
    SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SF_DIR="$SKW" scripts/runmain.sh -Xmx48g graft.Bench \
      2>/dev/null | tail -1 > BENCH_skew_r08.json
    SPARK_GRAFT_CPUS=32 scripts/runmain.sh -Xmx24g graft.SkewReport "$SKW" "$UNI" \
      2>/dev/null | tail -1 > SKEW_REPORT_r08.json
    ;;
esac

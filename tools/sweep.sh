#!/usr/bin/env bash
# Cross-scale correctness sweep: run the Verify dump + DuckDB oracle compare
# at every generated scale factor. The driver's gate runs sf0.01 only; this
# catches anything scale-dependent (vacuous results, skew-triggered paths,
# threshold artifacts) at 0.1x and 10x that size.
set -euo pipefail
cd "$(dirname "$0")/.."
for sf in sf0.001 sf0.01 sf0.1; do
  echo "=== $sf ==="
  sbt -batch "runMain graft.Verify /root/testdata/$sf /tmp/graft_sweep_$sf" >/dev/null 2>&1
  python3 tools/verify_local.py "/root/testdata/$sf" "/tmp/graft_sweep_$sf" | tail -1
done

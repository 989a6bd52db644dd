#!/bin/bash
# Window-scale A/B of the mega-kernel gates on the real TPU.
# Runs the composed 2-window forward (tools/fwd_probe.py, two-length
# differenced chains) for each gate combination; the honest decision rule
# is: a gate defaults ON only if its composed forward is faster.
# Usage: tools/gate_ab.sh  (takes ~10-15 min on a warm relay; first run
# pays remote compiles of each variant, minutes each)
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site

run() { # label l2 ru l2_2d ru_2d [ds]
  echo "=== $1 (VS_L2BLOCK=$2 VS_RUBLOCK=$3 VS_L2BLOCK2D=$4 VS_RUBLOCK2D=$5 VS_DSCONV=${6:-0}) ==="
  VS_L2BLOCK=$2 VS_RUBLOCK=$3 VS_L2BLOCK2D=$4 VS_RUBLOCK2D=$5 VS_DSCONV=${6:-0} \
    timeout 2400 python tools/fwd_probe.py "$1" 2>&1 | grep -v Warning
}

# decisive pair first (each variant costs a full remote compile: minutes);
# per-gate isolation only matters if "all" loses somewhere.  NOTE: gates
# interact — rublock loses alone but wins combined with l2block (adjacent
# fused blocks share the custom-call layout boundary); always measure the
# promising combinations, not just isolations.
run baseline 0 0 0 0
run all 1 1 1 1
run l2block 1 0 0 0
run rublock 0 1 0 0
run l2b_rub 1 1 0 0   # the r3 winner: 80.1 -> 68.4 ms (default ON)
run l2b_rub_ds 1 1 0 0 1   # + strided downsample kernel (pallas_dsconv)
run l2block2d 0 0 1 0
run rublock2d 0 0 0 1

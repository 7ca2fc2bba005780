#!/bin/bash
# Keep the graph-task sweep workers busy: each pass raises the seed count,
# breadth-first (all augmentors at seed 0 complete before seed 1 starts).
# Usage: sweep_supervisor.sh {tpu|cpu1|cpu2}
cd "$(dirname "$0")/.."
case "$1" in
  tpu)  args=(results 30 MUTAG,PROTEINS_full graphcl); plat="" ;;
  cpu1) args=(results_cpu 30 MUTAG bgrl); plat=cpu ;;
  cpu2) args=(results_cpu 30 PROTEINS_full bgrl); plat=cpu ;;
  *) echo "usage: $0 {tpu|cpu1|cpu2}" >&2; exit 2 ;;
esac
for seeds in 1 2 3; do
  if [ -n "$plat" ]; then
    JAX_PLATFORMS=$plat python tools/sweep_graph.py "$seeds" "${args[@]}"
  else
    python tools/sweep_graph.py "$seeds" "${args[@]}"
  fi
done

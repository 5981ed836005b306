#!/usr/bin/env bash
# Multi-host TPU pod launch (the reference's single-GPU job.sbatch:1-12
# counterpart). Run this same command on every host of the pod slice; on
# Cloud TPU the JAX runtime discovers the pod topology automatically and
# cdlnet_tpu.dist.initialize_distributed() is a no-op. For other clusters,
# export the coordinator explicitly:
#
#   export COORDINATOR_ADDRESS=host0:8476
#   export NUM_PROCESSES=4
#   export PROCESS_ID=$SLURM_PROCID        # or equivalent
#
# and add  "dist": {"mesh": {"data": -1}}  to args.json so every chip in
# the slice data-parallelizes the batch (per-host batch_size must divide).
# Multi-slice jobs: build the mesh with dist.make_hybrid_mesh so only the
# data-parallel axis crosses DCN.
set -euo pipefail
ARGS_JSON=${1:?usage: launch_pod.sh args.json}
python - "$ARGS_JSON" <<'PY'
import json, sys
from cdlnet_tpu.dist import initialize_distributed
initialize_distributed()
from cdlnet_tpu.cli.train import main
main(json.load(open(sys.argv[1])))
PY

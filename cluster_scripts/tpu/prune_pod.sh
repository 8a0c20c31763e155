#!/usr/bin/env bash
# Launch stage-1 pruning on every host of a TPU pod slice.
# Equivalent of the reference's cluster_scripts/slurm/pruning/*.slurm
# (accelerate launch + NCCL rendezvous); on TPU the same command simply runs
# on all workers and jax.distributed discovers the topology.
#
#   bash cluster_scripts/tpu/prune_pod.sh <tpu-name> <zone> <config> [extra args...]
set -euo pipefail
TPU_NAME=$1; ZONE=$2; CONFIG=$3; shift 3
gcloud compute tpus tpu-vm ssh "$TPU_NAME" --zone "$ZONE" --worker=all --command "
  cd ~/diffusion_pruning_tpu &&
  python scripts/aptp/prune.py --base_config_path $CONFIG $*
"

#!/usr/bin/env bash
# Launch training on a (multi-host) TPU VM / pod slice.
#
# TPU-native analogue of the reference slurm launcher
# (/root/reference/train_scripts/dit.sh): one process per host; JAX picks up
# the TPU topology from the environment; the mesh shards the batch over all
# chips via the 'data' axis (configs/train_dit.yaml mesh_data: -1).
#
# Single host:
#   bash train_scripts/tpu_vm_train.sh configs/train_dit.yaml
# Pod slice (run on every worker, e.g. with `gcloud compute tpus tpu-vm ssh
# --worker=all --command=...`):
#   bash train_scripts/tpu_vm_train.sh configs/train_dit.yaml
set -euo pipefail
CONFIG="${1:-configs/train_dit.yaml}"
export JAX_PLATFORMS="${JAX_PLATFORMS:-}"
python -m gtax.cli.train "$CONFIG"

#!/bin/bash
# Slurm launcher for TPU-attached nodes (preemption-tolerant like the
# reference's train_scripts/dit.sh): resume_from_checkpoint restores model /
# optimizer / RNG / step and fast-forwards the data stream, so requeued jobs
# continue where they stopped.
#SBATCH --job-name=gtax-dit
#SBATCH --nodes=1
#SBATCH --cpus-per-task=32
#SBATCH --mem=300G
#SBATCH --requeue

CONFIG="${1:-configs/train_dit.yaml}"
srun python -m gtax.cli.train "$CONFIG"

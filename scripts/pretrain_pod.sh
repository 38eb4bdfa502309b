#!/bin/bash
# Multi-host TPU-pod pretraining launch (the reference ships SLURM scripts
# per method, e.g. extras/delores-m/1024_pretrain.sh; here one script serves
# every objective — jax.distributed is auto-initialized from SLURM or TPU
# pod metadata by audiossl_tpu.parallel.launch).
#
# SLURM:   sbatch --ntasks=<hosts> --gpus=0 scripts/pretrain_pod.sh delores_m data.csv
# TPU pod: run on every host (e.g. via gcloud compute tpus tpu-vm ssh --worker=all)
#SBATCH --job-name=audiossl_pretrain
#SBATCH --ntasks-per-node=1
#SBATCH --cpus-per-task=32
#SBATCH --time=168:00:00

set -euo pipefail
UPSTREAM=${1:-delores_m}
INPUT=${2:?usage: pretrain_pod.sh <upstream> <manifest.csv> [extra args...]}
shift 2 || true

exec python train_upstream.py --upstream "$UPSTREAM" --input "$INPUT" "$@"

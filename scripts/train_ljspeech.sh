#!/usr/bin/env bash
# VQ-VAE training wrapper (reference: cluster_run.sh).
# Usage: scripts/train_ljspeech.sh <datadir> [extra args...]
set -euo pipefail
DATADIR=${1:?usage: $0 <preprocessed datadir> [extra args]}
shift
python -m neural_sound_generation_tpu.cli.main \
    --model vqvae --dataset ljspeech --datadir "$DATADIR" \
    --dim 256 --z-dim 512 --batch-size 64 --multi-steps 32 "$@"

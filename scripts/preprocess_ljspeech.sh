#!/usr/bin/env bash
# LJSpeech preprocessing wrapper (reference: preprocess_ljspeech.sh).
# Usage: scripts/preprocess_ljspeech.sh <in_dir> <out_dir>
set -euo pipefail
IN_DIR=${1:?usage: $0 <in_dir> <out_dir>}
OUT_DIR=${2:?usage: $0 <in_dir> <out_dir>}
PRESET="$(dirname "$0")/../neural_sound_generation_tpu/config/presets/ljspeech_mixture.json"
python -m neural_sound_generation_tpu.cli.preprocess ljspeech \
    "$IN_DIR" "$OUT_DIR" --preset "$PRESET"

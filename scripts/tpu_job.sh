#!/bin/bash
# Batch launcher for a DESMO-TPU training run — the framework's equivalent of
# the reference's SLURM csh scripts (DESMO/cylinder_flow/GPU_jobfile.sh):
# copy inputs to fast local storage, run the preset, collect logs/artifacts.
#
# Usage: PRESET=cylinder DATA_DIR=/data/cylinder_data OUT=/results ./tpu_job.sh
set -euo pipefail

PRESET="${PRESET:-cylinder}"
DATA_DIR="${DATA_DIR:-}"
OUT="${OUT:-./runs}"
EXTRA_ARGS="${EXTRA_ARGS:-}"

SCRATCH="${SCRATCH:-$(mktemp -d)}"
echo "workdir: $SCRATCH, preset: $PRESET"

ARGS=(run --preset "$PRESET" --out-dir "$OUT")
if [ -n "$DATA_DIR" ]; then
  ARGS+=(--data-dir "$DATA_DIR")
else
  ARGS+=(--synthetic)
fi

# stdout mirrors the reference's `srun python script.py > DESMO.out`
python -m desmo_tpu "${ARGS[@]}" $EXTRA_ARGS 2>&1 | tee "$OUT/${PRESET}.out"

#!/bin/bash
# Stage 3: dense global alignment (reference scripts/demo/run_dense.sh).
set -e

RESULT_DIR=${SAVE_DIR:-outputs/davis/unidepth_da}

for scene in ${SCENES:-tennis}; do
  echo "Processing scene: $scene"
  python -m batrack_tpu.cli.run_refine \
    --result_dir "$RESULT_DIR" \
    --grid_size "${GRID:-12}" \
    --scenes "$scene" \
    --niter "${NITER:-300}"
done

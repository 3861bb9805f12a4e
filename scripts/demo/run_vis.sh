#!/bin/bash
# Stage 4: Rerun 4D viewer on refined results (reference scripts/demo/run_vis.sh).
set -e

SCENE=${SCENES:-tennis}
RESULT_PATH=${RESULT_PATH:-outputs/davis/unidepth_da/$SCENE/results_refined.pkl}

python -m batrack_tpu.cli.vis_results --result_path "$RESULT_PATH"

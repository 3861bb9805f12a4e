#!/bin/bash
# Stage 2: sparse SLAM (reference scripts/demo/run_sparse.sh).
set -e

DATASET=${DATA_DIR:-data/davis}
DEPTHDIR=${DEPTH_DIR:-data/Monodepth/davis}
SAVEDIR=${SAVE_DIR:-outputs/davis/unidepth_da}
CONFIG=${CONFIG:-configs/davis_demo.yaml}

for SCENE in ${SCENES:-tennis}; do
  python -m batrack_tpu.cli.run_slam --config "$CONFIG" \
    data.imagedir="$DATASET/$SCENE" \
    data.savedir="$SAVEDIR" \
    data.depthdir="$DEPTHDIR/unidepth_da/$SCENE" \
    data.depthdir_gt="$DEPTHDIR/unidepth_da/$SCENE" \
    data.calib="$DEPTHDIR/unidepth_da_intrinsics/$SCENE" \
    data.name="$SCENE" \
    save_trajectory=true \
    save_plot=true \
    save_results=true \
    "$@"
done

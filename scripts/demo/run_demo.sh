#!/bin/bash
# Full 4-stage demo on a DAVIS-style sequence:
#   1. depth-prior alignment  2. sparse SLAM  3. dense refinement  4. viewer
DEPTH_DIR=${DEPTH_DIR:-data/davis_depth}
DATA_DIR=${DATA_DIR:-data/davis/JPEGImages/480p}
SCENE=${SCENE:-dog}
SAVE_DIR=${SAVE_DIR:-results/davis}

python -m batrack_tpu.cli.align_depth --depth_dir "$DEPTH_DIR" --data_dir "$DATA_DIR"
python -m batrack_tpu.cli.run_slam --config configs/davis_demo.yaml \
  data.imagedir="$DATA_DIR/$SCENE" \
  data.depthdir="$DEPTH_DIR/unidepth_da/$SCENE" \
  data.calib="$DEPTH_DIR/unidepth_da_intrinsics/$SCENE" \
  data.savedir="$SAVE_DIR" data.name="$SCENE"
python -m batrack_tpu.cli.run_refine --result_dir "$SAVE_DIR" --scenes "$SCENE"
python -m batrack_tpu.cli.vis_results --result_path "$SAVE_DIR/$SCENE/results_refined.pkl"

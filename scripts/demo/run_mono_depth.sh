#!/bin/bash
# Stage 1: monocular depth priors (reference scripts/demo/run_mono_depth.sh).
# Runs both prior networks natively in Flax (converted torch checkpoints)
# and aligns the relative disparity to the metric depth.
#
#   DepthAnythingV2 (relative disparity)  -> $DEPTH_DIR/depthAny_disp/<seq>
#   UniDepthV2      (metric depth + K)    -> $DEPTH_DIR/unidepthv2/<seq>.npz
#   alignment                              -> $DEPTH_DIR/unidepth_da/<seq>
set -e

evalset=(${SCENES:-tennis})
DATA_DIR=${DATA_DIR:-data/davis}
DEPTH_DIR=${DEPTH_DIR:-data/Monodepth/davis}
DA_CKPT=${DA_CKPT:-checkpoints/depth_anything_v2_vitl.pth}
UD_CKPT=${UD_CKPT:-checkpoints/unidepth_v2_vitl14.bin}
ENCODER=${ENCODER:-vitl}     # DepthAnythingV2 arch (vits for smoke tests)
UD_ARCH=${UD_ARCH:-vitl}     # UniDepthV2 arch
DA_ARGS=${DA_ARGS:-}         # extra infer_depth args (e.g. --input_size)
UD_ARGS=${UD_ARGS:-}         # extra infer_metric_depth args

mkdir -p "$DEPTH_DIR"

for seq in "${evalset[@]}"; do
  python -m batrack_tpu.cli.infer_depth --encoder "$ENCODER" \
    --checkpoint "$DA_CKPT" \
    --img_dir "$DATA_DIR/$seq" \
    --out_dir "$DEPTH_DIR/depthAny_disp/$seq" $DA_ARGS
done

for seq in "${evalset[@]}"; do
  python -m batrack_tpu.cli.infer_metric_depth --arch "$UD_ARCH" \
    --checkpoint "$UD_CKPT" \
    --img_dir "$DATA_DIR/$seq" \
    --out_dir "$DEPTH_DIR/unidepthv2/$seq" $UD_ARGS
done

python -m batrack_tpu.cli.align_depth \
  --data_dir "$DATA_DIR" \
  --depth_dir "$DEPTH_DIR" \
  --save_name unidepth_da

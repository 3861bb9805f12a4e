#!/bin/bash
# TartanAir-Shibuya pose evaluation: 7 sequences
# (mirror of reference scripts/eval_shibuya/eval_shibuya_pose.sh).
# SEQS overrides the sequence list (smoke tests); extra args pass through.
DATA_ROOT=${DATA_ROOT:-data/shibuya}
DEPTH_ROOT=${DEPTH_ROOT:-data/shibuya_depth}
SAVE_DIR=${SAVE_DIR:-results/shibuya}
CONFIG=${CONFIG:-configs/shibuya.yaml}
CALIB=${CALIB:-calibs/tartan_shibuya.txt}

seqs=(${SEQS:-RoadCrossing03 RoadCrossing04 RoadCrossing05 RoadCrossing06 RoadCrossing07 Standing01 Standing02})
for seq in "${seqs[@]}"; do
  python -m batrack_tpu.cli.run_slam --config "$CONFIG" \
    data.imagedir="$DATA_ROOT/$seq/image_0" \
    data.depthdir="$DEPTH_ROOT/$seq" \
    data.depthdir_gt="$DEPTH_ROOT/$seq" \
    data.calib="$CALIB" \
    data.gt_traj="$DATA_ROOT/$seq/gt_pose.txt" \
    data.savedir="$SAVE_DIR" data.name="$seq" \
    "$@"
done
cat "$SAVE_DIR/error_sum.txt"

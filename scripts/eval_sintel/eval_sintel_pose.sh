#!/bin/bash
# MPI-Sintel pose evaluation: 14 sequences, appends ATE/RPE to error_sum.txt
# (mirror of reference scripts/eval_sintel/eval_sintel_pose.sh).
# SEQS overrides the sequence list (smoke tests); extra args pass through as
# config overrides.
DATA_ROOT=${DATA_ROOT:-data/sintel/training}
DEPTH_ROOT=${DEPTH_ROOT:-data/sintel_depth}
SAVE_DIR=${SAVE_DIR:-results/sintel}
CONFIG=${CONFIG:-configs/sintel.yaml}

seqs=(${SEQS:-alley_2 ambush_4 ambush_5 ambush_6 cave_2 cave_4 market_2 market_5 market_6 shaman_3 sleeping_1 sleeping_2 temple_2 temple_3})
for seq in "${seqs[@]}"; do
  python -m batrack_tpu.cli.run_slam --config "$CONFIG" \
    data.imagedir="$DATA_ROOT/final/$seq" \
    data.depthdir="$DEPTH_ROOT/$seq" \
    data.depthdir_gt="$DATA_ROOT/depth/$seq" \
    data.calib="$DATA_ROOT/camdata_left/$seq" \
    data.gt_traj="$DATA_ROOT/camdata_left/$seq" \
    data.savedir="$SAVE_DIR" data.name="$seq" \
    "$@"
done
cat "$SAVE_DIR/error_sum.txt"

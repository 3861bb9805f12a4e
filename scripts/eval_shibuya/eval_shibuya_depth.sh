#!/bin/bash
# Sintel depth evaluation: refine + depth metrics
SAVE_DIR=${SAVE_DIR:-results/shibuya}
python -m batrack_tpu.cli.run_refine --result_dir "$SAVE_DIR" --grid_size 10 --niter 200 --fixed_K
python -m batrack_tpu.cli.eval_depth --result_dir "$SAVE_DIR" --refined

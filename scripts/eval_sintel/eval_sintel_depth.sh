#!/bin/bash
# Sintel depth evaluation: refine + depth metrics. Extra args pass through
# to run_refine (e.g. --niter for smoke tests).
SAVE_DIR=${SAVE_DIR:-results/sintel}
python -m batrack_tpu.cli.run_refine --result_dir "$SAVE_DIR" --grid_size 10 --niter "${NITER:-200}" --fixed_K "$@"
python -m batrack_tpu.cli.eval_depth --result_dir "$SAVE_DIR" --refined

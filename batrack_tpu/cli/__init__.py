"""Command-line entry points: run_slam (stage 2), run_refine (stage 3),
eval_depth, align_depth (stage 1 alignment)."""

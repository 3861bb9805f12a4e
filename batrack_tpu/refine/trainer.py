"""Stage-3 optimizer loop: jitted Adam steps with cosine LR.

Mirrors main/global_refine/model/trainer.py:5-77. The reference builds Adam
param groups with custom LRs but its scheduler overwrites every group's LR
each iteration (trainer.py:15-20 has no lr_scale set), so a single
cosine-scheduled Adam over the whole pytree reproduces the effective
behavior. betas=(0.9, 0.9) as in trainer.py:44.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from batrack_tpu.refine.refine_net import (
    RefineConfig,
    RefineData,
    RefineParams,
    total_loss,
)


def cosine_schedule(t: float, lr_start: float, lr_end: float) -> float:
    return lr_end + (lr_start - lr_end) * (1 + np.cos(t * np.pi)) / 2


def global_alignment_loop(
    params: RefineParams,
    data: RefineData,
    image_hw: Tuple[int, int],
    cfg: RefineConfig,
    verbose: bool = False,
) -> Tuple[RefineParams, float]:
    """Optimize; returns (params, final loss). (trainer.py:23-59)."""
    lr = optax.inject_hyperparams(
        lambda learning_rate: optax.adam(learning_rate, b1=0.9, b2=0.9)
    )(learning_rate=cfg.lr)
    opt_state = lr.init(params)

    frozen_pose = cfg.fixed_pose
    frozen_K = cfg.fixed_K

    @jax.jit
    def step(params, opt_state, lr_now):
        (loss, parts), grads = jax.value_and_grad(
            lambda p: total_loss(p, data, image_hw, cfg), has_aux=True
        )(params)
        if frozen_pose:
            grads = grads._replace(pose_delta=jnp.zeros_like(grads.pose_delta))
        if frozen_K:
            grads = grads._replace(K=jnp.zeros_like(grads.K))
        opt_state.hyperparams["learning_rate"] = lr_now
        updates, opt_state = lr.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, parts

    loss = np.inf
    for it in range(cfg.niter):
        t = it / cfg.niter
        if cfg.schedule == "cosine":
            lr_now = cosine_schedule(t, cfg.lr, 1e-6)
        elif cfg.schedule == "linear":
            lr_now = cfg.lr + (1e-6 - cfg.lr) * t
        else:
            raise ValueError(cfg.schedule)
        # LR in the params' own dtype: f32 in production, f64 in the
        # reference-parity suite (a downcast LR shifts the Adam trajectory)
        lr_dt = params.trajs_scales.dtype
        params, opt_state, loss, parts = step(
            params, opt_state, jnp.asarray(lr_now, lr_dt)
        )
        if verbose and it % 50 == 0:
            parts = {k: float(v) for k, v in parts.items()}
            print(f"iter {it}: loss={float(loss):.5f} lr={lr_now:.2e} {parts}")
    return params, float(loss)

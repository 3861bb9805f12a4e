"""Per-frame ingestion: window roll, patch generation, depth init, motion
model. All jittable; mirrors batrack.py preprocessing (:230-325, :917-934,
:176-187).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from batrack_tpu.geometry import se3
from batrack_tpu.ops.sampling import avg_pool2d, bilinear_sample2d, patchify
from batrack_tpu.slam.state import SLAMState, StaticDims


def image_gradient(image: jnp.ndarray) -> jnp.ndarray:
    """Pooled gradient magnitude of an (H, W, 3) image (batrack.py:214-221).

    Zero-pads, sums channels, forward differences, 4x4 average pool.
    Returns (H//4, W//4).
    """
    gray = image.sum(axis=-1)
    padded = jnp.pad(gray, ((1, 1), (1, 1)))
    dx = padded[:-1, 1:] - padded[:-1, :-1]
    dy = padded[1:, :-1] - padded[:-1, :-1]
    g = jnp.sqrt(dx * dx + dy * dy)
    return avg_pool2d(g[None, None], 4, 4)[0, 0]


def generate_patches_grid_grad(
    image: jnp.ndarray,  # (H, W, 3) float
    key: jax.Array,
    *,
    grid_size: int,
    M: int,
    ht: int,
    wd: int,
    num_expand: int = 8,
    rel_margin: float = 0.15,
) -> jnp.ndarray:
    """`grid_grad_K` patch sampling (batrack.py:280-317).

    Partition the image into grid_size^2 cells; in each cell draw
    num_expand * grid_M margin-inset uniform candidates and keep the grid_M
    with the largest pooled image gradient. (The reference samples the
    gradient with a coordinate-normalisation bug at batrack.py:309 — y is
    normalised by the x value; we sample at the true location instead.)
    Returns rounded (M, 2) pixel coords.
    """
    num_grid = grid_size * grid_size
    grid_M = M // num_grid
    if grid_M == 0:
        raise ValueError(
            f"PATCH_GEN=grid_grad_{grid_size} needs PATCHES_PER_FRAME >= "
            f"{num_grid} (one patch per grid cell); got M={M}. Use a "
            f"smaller grid (e.g. grid_grad_{max(1, int(M ** 0.5))}) or "
            "more patches. (The reference fails the same way, "
            "batrack.py:280-317, with a shape error instead.)"
        )
    n_cand = num_expand * grid_M
    h_grid, w_grid = ht // grid_size, wd // grid_size

    g = image_gradient(image)  # (ht//4, wd//4)

    kx, ky = jax.random.split(key)
    x = jax.random.uniform(kx, (num_grid, n_cand)) * (1 - 2 * rel_margin) + rel_margin
    y = jax.random.uniform(ky, (num_grid, n_cand)) * (1 - 2 * rel_margin) + rel_margin

    cell = jnp.arange(num_grid)
    off_x = (cell % grid_size).astype(jnp.float32) * w_grid
    off_y = (cell // grid_size).astype(jnp.float32) * h_grid
    x_global = x * w_grid + off_x[:, None]
    y_global = y * h_grid + off_y[:, None]
    x_global = jnp.round(x_global)
    y_global = jnp.round(y_global)

    # gradient at candidate locations (gradient map is 4x downsampled)
    gg = bilinear_sample2d(
        g[None, None],
        (x_global / 4.0).reshape(1, -1),
        (y_global / 4.0).reshape(1, -1),
    )[0, 0].reshape(num_grid, n_cand)

    order = jnp.argsort(gg, axis=-1)  # ascending (batrack.py:314)
    top = order[:, -grid_M:]
    xg = jnp.take_along_axis(x_global, top, axis=1)
    yg = jnp.take_along_axis(y_global, top, axis=1)
    return jnp.stack([xg.reshape(-1), yg.reshape(-1)], axis=-1)  # (M, 2)


def generate_patches_random(key, *, M, ht, wd) -> jnp.ndarray:
    """`random` patch sampling (batrack.py:242-245)."""
    kx, ky = jax.random.split(key)
    x = jax.random.randint(kx, (M,), 1, wd - 1).astype(jnp.float32)
    y = jax.random.randint(ky, (M,), 1, ht - 1).astype(jnp.float32)
    return jnp.stack([x, y], axis=-1)


def generate_patches_sift(image_np, *, M: int, ht: int, wd: int, rng, margin: int = 16):
    """`sift` patch sampling (batrack.py:246-279) — host-side, like the
    reference (cv2 SIFT runs on CPU there too; the detector is inherently
    data-dependent so it cannot live inside the jitted ingest).

    Keypoints are margin-inset, shuffled, truncated to M; a shortfall is
    padded with uniform random points. (The reference pads the y coordinate
    from the *width* range, batrack.py:270 — fixed to the height range here.)
    Returns (M, 2) float32 pixel coords.
    """
    import numpy as np

    try:
        import cv2
    except ImportError as e:  # pragma: no cover
        raise RuntimeError("PATCH_GEN='sift' requires opencv-python") from e

    img = np.asarray(image_np)
    gray = cv2.cvtColor(img.astype(np.uint8), cv2.COLOR_RGB2GRAY)
    lo, hi = int(gray.min()), int(gray.max())
    gray = ((gray.astype(np.float32) - lo) * (255.0 / max(hi - lo, 1))).astype(np.uint8)
    kps = cv2.SIFT_create().detect(gray, None)
    kp = np.array([k.pt for k in kps], np.float32).reshape(-1, 2)
    if len(kp):
        keep = (
            (kp[:, 0] > margin) & (kp[:, 0] < wd - margin)
            & (kp[:, 1] > margin) & (kp[:, 1] < ht - margin)
        )
        kp = kp[keep]
        rng.shuffle(kp)
        kp = kp[:M]
    if len(kp) < M:
        diff = M - len(kp)
        x = rng.integers(margin, wd - margin, size=diff)
        y = rng.integers(margin, ht - margin, size=diff)
        pad = np.stack([x, y], axis=-1).astype(np.float32)
        kp = np.concatenate([pad, kp], axis=0)
    return kp.astype(np.float32)


def generate_patches_uniform(*, M, ht, wd) -> jnp.ndarray:
    """`uniform` grid patch sampling (batrack.py:235-240, sans dead import)."""
    m = int(round(M ** 0.5))
    gy, gx = jnp.meshgrid(jnp.arange(m, dtype=jnp.float32),
                          jnp.arange(m, dtype=jnp.float32), indexing="ij")
    gy = 8.0 + gy.reshape(-1) / float(m - 1) * (ht - 16)
    gx = 8.0 + gx.reshape(-1) / float(m - 1) * (wd - 16)
    coords = jnp.stack([gx, gy], axis=-1)
    return jnp.resize(coords, (M, 2))


def init_patch_depth(coords: jnp.ndarray, depth: jnp.ndarray) -> jnp.ndarray:
    """Disparity init from the depth map (batrack.py:924-932, mode='dmap')."""
    d = bilinear_sample2d(depth[None, None], coords[None, :, 0], coords[None, :, 1])[0, 0]
    return 1.0 / jnp.maximum(d, 1e-2)


def motion_model(poses: jnp.ndarray, n: jnp.ndarray, damping: float) -> jnp.ndarray:
    """Damped-linear SE3 extrapolation for the new frame (batrack.py:176-187).

    poses[n] := Exp(damping * Log(P_{n-1} P_{n-2}^{-1})) * P_{n-1}  for n > 1.
    """
    P1 = poses[jnp.maximum(n - 1, 0)]
    P2 = poses[jnp.maximum(n - 2, 0)]
    xi = damping * se3.log(se3.mul(P1, se3.inv(P2)))
    pred = se3.mul(se3.exp(xi), P1)
    new = jnp.where(n > 1, pred, jnp.where(n == 1, P1, poses[n]))
    return poses.at[n].set(new)


def ingest_frame(
    state: SLAMState,
    image: jnp.ndarray,       # (H, W, 3) uint8 or float32 0..255
    depth: jnp.ndarray,       # (H, W) float32
    intrinsics: jnp.ndarray,  # (4,)
    n: jnp.ndarray,           # () current frame index (pre-increment)
    counter: jnp.ndarray,     # () global frame counter
    key: jax.Array,
    dims: StaticDims,
    *,
    patch_gen: str,
    motion_damping: float,
    mark_valid: jnp.ndarray,  # () bool: set patches_valid for this frame
    coords_override: jnp.ndarray = None,  # (M, 2) host-computed coords (sift)
) -> Tuple[SLAMState, jnp.ndarray]:
    """One frame into the buffers (batrack.py:937-988). Returns (state, coords)."""
    M = dims.M
    image = image.astype(jnp.float32)

    # roll the local window (batrack.py:385-392)
    win_images = jnp.roll(state.win_images, -1, axis=0).at[-1].set(image)
    win_depths = jnp.roll(state.win_depths, -1, axis=0).at[-1].set(depth)

    if patch_gen.startswith("grid_grad"):
        grid_size = int(patch_gen.split("_")[-1])
        coords = generate_patches_grid_grad(
            image, key, grid_size=grid_size, M=M, ht=dims.ht, wd=dims.wd
        )
    elif patch_gen == "random":
        coords = generate_patches_random(key, M=M, ht=dims.ht, wd=dims.wd)
    elif patch_gen == "uniform":
        coords = generate_patches_uniform(M=M, ht=dims.ht, wd=dims.wd)
    elif patch_gen == "sift":
        # detector runs on the host (generate_patches_sift); the system passes
        # its result in as coords_override
        if coords_override is None:
            raise ValueError("PATCH_GEN='sift' needs host-computed coords")
        coords = coords_override
    else:
        raise NotImplementedError(patch_gen)

    disp = init_patch_depth(coords, depth)
    patch_rows = n * M + jnp.arange(M)
    patches = state.patches.at[patch_rows].set(
        jnp.concatenate([coords, disp[:, None]], axis=-1)
    )

    # patch colors (batrack.py:323: patchify(image, coords + 0.5, 0))
    img_chw = jnp.moveaxis(image, -1, 0)[None]
    clr = patchify(img_chw, (coords + 0.5)[None], 0)[0, :, :, 0, 0]
    colors = state.colors.at[patch_rows].set(clr.astype(jnp.uint8))

    poses = motion_model(state.poses, n, motion_damping)

    patches_valid = jnp.where(
        mark_valid,
        state.patches_valid.at[patch_rows].set(1.0),
        state.patches_valid,
    )

    state = state._replace(
        win_images=win_images,
        win_depths=win_depths,
        patches=patches,
        colors=colors,
        poses=poses,
        patches_valid=patches_valid,
        tstamps=state.tstamps.at[n].set(counter),
        intrinsics=state.intrinsics.at[n].set(intrinsics),
    )
    return state, coords

"""MDTracker: motion-decoupled 3D point tracker in Flax.

Functional mirror of main/frontend/md_tracker.py:64-671 — sliding-window
RGB-D transformer tracking with a total-motion branch, a per-track motion
label, and a dynamic-component refinement branch — rebuilt TPU-first:

* The all-pairs correlation volume of the reference CorrBlock
  (blocks.py:326-385) is replaced by the fused gather-contract
  `corr_sample_pyramid` (batrack_tpu/ops/corr.py) — identical values, no
  (S, N, H, W) volume in HBM.
* The sliding-window loop runs over a static window count with per-query
  activity masks instead of data-dependent wind_idx slicing, so the whole
  forward jits once.
* Depth normalisation scalars (d_near/d_far, md_tracker.py:439-444) are
  traced values, not Python floats.

Weight-compatible with the released md_tracker.pth via tracker/convert.py,
including the reference's scrambled track_mask/vis concat (see
`_scrambled_concat`, md_tracker.py:280-285 with fix_track_mask=False).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from batrack_tpu.ops.corr import build_pyramid, corr_sample_pyramid
from batrack_tpu.ops.pallas_corr import corr_sample_pyramid_pallas
from batrack_tpu.ops.embeddings import (
    FourierEmbedder,
    get_1d_sincos_pos_embed_from_grid,
    get_2d_sincos_pos_embed,
    get_3d_embedding,
)
from batrack_tpu.ops.sampling import (
    bilinear_sample2d,
    bilinear_sample_per_frame,
)
from batrack_tpu.tracker.blocks import (
    BasicEncoder,
    MotionLabelMLP,
    UpdateFormer,
)
from batrack_tpu.utils.config import ModelConfig


class TrackerParams(NamedTuple):
    """Static architecture hyperparameters (ModelConfig subset)."""

    S: int = 12
    stride: int = 4
    latent_dim: int = 128
    hidden_size: int = 384
    input_dim: int = 456
    num_heads: int = 8
    space_depth: int = 6
    time_depth: int = 6
    space_depth_dyn: int = 3
    time_depth_dyn: int = 3
    corr_levels: int = 4
    corr_radius: int = 3
    iters: int = 4
    static_iters: int = 2
    add_space_attn: bool = True
    dynamic_mask_detach: bool = True
    use_log_depth: bool = False
    interp_shape: Tuple[int, int] = (384, 512)
    use_pallas_corr: bool = False  # fused VMEM-resident corr kernel (TPU only)
    use_flash_attention: bool = False  # Pallas flash for space attention (TPU)
    pallas_interpret: bool = False  # run kernels in interpret mode (CPU tests)
    flash_threshold: int = 1024     # min track count for the attention kernels

    @classmethod
    def from_config(cls, m: ModelConfig) -> "TrackerParams":
        return cls(
            S=m.S,
            stride=m.model_stride,
            latent_dim=m.latent_dim,
            hidden_size=m.hidden_size,
            num_heads=m.num_heads,
            space_depth=m.space_depth,
            time_depth=m.time_depth,
            space_depth_dyn=m.space_depth_dyn,
            time_depth_dyn=m.time_depth_dyn,
            corr_levels=m.corr_levels,
            corr_radius=m.corr_radius,
            iters=m.I,
            static_iters=m.static_iters,
            add_space_attn=m.add_space_attn,
            dynamic_mask_detach=m.dynamic_mask_detach,
            use_log_depth=m.use_log_depth,
            interp_shape=tuple(m.interp_shape),
            use_pallas_corr=m.use_pallas_corr,
            use_flash_attention=m.use_flash_attention,
        )


def _scrambled_concat(track_mask: jnp.ndarray, vis: jnp.ndarray,
                      cnt=None) -> jnp.ndarray:
    """The reference fix_track_mask=False concat (md_tracker.py:280-285).

    torch.cat([track_mask, vis], dim=2) on (1, S, cnt, 1) then
    permute(0,2,1,3).reshape(cnt, S, 2) interleaves *adjacent tracks* (and
    frames) rather than the two channels: output row n, frame s, channel c
    reads logical channel k = 2n + (2s+c)//S of the [track_mask | vis]
    axis at frame (2s+c) % S. The released checkpoint was trained with
    this, so it is reproduced bit-exactly.

    The reference builds this on the tensor of the first `cnt` *sorted*
    tracks (md_tracker.py:617-626 slices to wind_idx), so the channel axis
    has length 2*cnt, not 2*N — callers must pass columns already in sorted
    order plus the active count `cnt` (traced OK; defaults to N). Rows
    n >= cnt are garbage, exactly like the reference's absent rows.

    track_mask, vis: (S, N). Returns (N, S, 2).
    """
    S, N = track_mask.shape
    if cnt is None:
        cnt = N
    sc = 2 * np.arange(S)[None, :, None] + np.arange(2)[None, None, :]
    k = jnp.asarray(2 * np.arange(N)[:, None, None] + sc // S)  # (N, S, 2)
    f = jnp.asarray(sc % S)
    tm_val = track_mask[f, jnp.clip(k, 0, N - 1)]
    vis_val = vis[f, jnp.clip(k - cnt, 0, N - 1)]
    return jnp.where(k < cnt, tm_val, vis_val)


class MDTracker(nn.Module):
    """The tracker network (submodule names mirror the torch checkpoint).

    mesh: optional jax.sharding.Mesh — the track axis is sharded over it;
    the Pallas corr/attention kernels run under explicit shard_map
    (parallel/shard_kernels.py) so multi-chip keeps the single-chip fast
    paths (the r2 adapter disabled them under a mesh).
    """

    p: TrackerParams
    dtype: jnp.dtype = jnp.float32
    mesh: object = None

    def setup(self):
        p = self.p
        self.fnet = BasicEncoder(output_dim=p.latent_dim, stride=p.stride,
                                 dtype=self.dtype, name="fnet")
        self.updateformer = UpdateFormer(
            space_depth=p.space_depth, time_depth=p.time_depth,
            input_dim=p.input_dim, hidden_size=p.hidden_size,
            num_heads=p.num_heads, output_dim=p.latent_dim + 3,
            add_space_attn=p.add_space_attn, dtype=self.dtype,
            use_flash=p.use_flash_attention, mesh=self.mesh,
            interpret=p.pallas_interpret, flash_threshold=p.flash_threshold,
            name="updateformer",
        )
        self.updateformer_dyn = UpdateFormer(
            space_depth=p.space_depth_dyn, time_depth=p.time_depth_dyn,
            input_dim=p.input_dim, hidden_size=p.hidden_size,
            num_heads=p.num_heads, output_dim=p.latent_dim + 3,
            add_space_attn=p.add_space_attn, dtype=self.dtype,
            use_flash=p.use_flash_attention, mesh=self.mesh,
            interpret=p.pallas_interpret, flash_threshold=p.flash_threshold,
            name="updateformer_dyn",
        )
        # GroupNorm(1, latent) == LayerNorm over channel with affine params
        self.norm = nn.GroupNorm(num_groups=1, name="norm", dtype=self.dtype)
        self.ffeat_updater = nn.Dense(self.p.latent_dim, name="ffeat_updater",
                                      dtype=self.dtype)
        self.vis_predictor = nn.Dense(1, name="vis_predictor", dtype=self.dtype)
        self.motion_label = MotionLabelMLP(hidden_dim=256, pool_S=p.S,
                                           dtype=self.dtype, name="motion_label_block")
        self.embed3d = FourierEmbedder(input_dim=3, max_freq_log2=10.0, N_freqs=10)
        self.embedConv = nn.Conv(self.p.latent_dim, (3, 3), padding=1,
                                 name="embedConv", dtype=self.dtype)
        self.zeroMLPflow = nn.Dense(130, name="zeroMLPflow", dtype=self.dtype)

    # ------------------------------------------------------------------
    def depth_process(self, d):
        return jnp.log(jnp.maximum(d, 1e-3)) if self.p.use_log_depth else d

    def depth_process_inv(self, d):
        return jnp.exp(d) if self.p.use_log_depth else d

    def encode_window(self, rgbs: jnp.ndarray, depths_dnG: jnp.ndarray,
                      z_stats=None) -> jnp.ndarray:
        """fnet + Fourier xyz positional fusion (md_tracker.py:519-546).

        rgbs: (S, 3, H, W) normalized to [-1, 1]; depths_dnG: (S, H/4, W/4)
        depth in [0, Dz] grid units. Returns fmaps (S, H/4, W/4, C).

        z_stats: optional (zmin, zmax) for the z-channel normalisation. The
        reference normalises gridxyz over the FULL S-frame window even when
        only the new half is encoded (md_tracker.py:524-546 builds featPE
        from all S depths, then slices featPE[S//2:]) — callers encoding a
        partial window must pass the full window's stats.
        """
        S, _, H, W = rgbs.shape
        h4, w4 = H // self.p.stride, W // self.p.stride
        fmaps = self.fnet(jnp.moveaxis(rgbs, 1, -1))  # (S, h4, w4, C)

        # normalized xyz grid -> Fourier features (md_tracker.py:519-531)
        gx = jnp.arange(w4, dtype=jnp.float32)
        gy = jnp.arange(h4, dtype=jnp.float32)
        gxx = jnp.broadcast_to(gx[None, None, :], (S, h4, w4))
        gyy = jnp.broadcast_to(gy[None, :, None], (S, h4, w4))
        gzz = depths_dnG

        def norm01(v, stats=None):
            vmin = v.min() if stats is None else stats[0]
            vmax = v.max() if stats is None else stats[1]
            return 2.0 * ((v - vmin) / jnp.maximum(vmax - vmin, 1e-12) - 0.5)

        xyz = jnp.stack(
            [norm01(gxx), norm01(gyy), norm01(gzz, z_stats)], axis=-1
        )
        featPE = self.embed3d(xyz)  # (S, h4, w4, 63)
        return self.embedConv(jnp.concatenate([fmaps, featPE], axis=-1))

    # ------------------------------------------------------------------
    def forward_iteration(
        self,
        fmaps: jnp.ndarray,        # (S, h4, w4, C)
        coords_init: jnp.ndarray,  # (S, N, 3) grid units (xy/stride, depth DnG)
        coords_dyn_init: jnp.ndarray,
        feat_init: jnp.ndarray,    # (S, N, C)
        concat: jnp.ndarray,       # (N, S, 2) pre-scrambled mask/vis channels
        # (visibility logits enter only through `concat`, pre-scrambled by
        # the caller — md_tracker.py:248-258)
        d_near: jnp.ndarray,
        d_far: jnp.ndarray,
        Dz: float,
        key_mask: jnp.ndarray | None = None,  # (N,) active tracks (space attn)
    ):
        """One window's iterative refinement (md_tracker.py:181-413)."""
        p = self.p
        S, h4, w4, C = fmaps.shape
        N = coords_init.shape[1]

        fmaps_snc = jnp.moveaxis(fmaps.reshape(S, h4 * w4, C), -1, 1).reshape(
            S, C, h4, w4
        )
        pyramid = build_pyramid(fmaps_snc, p.corr_levels)

        coords = coords_init
        coords_dyn = coords_dyn_init
        # track features live in track-major (N, S, C) — the transformer's
        # layout — so the hot loop never pays the (S, N, C) <-> (N, S, C)
        # HBM relayout per iteration; only this one entry transpose
        feat_init_ns = jnp.moveaxis(feat_init, 0, 1)
        ffeats = feat_init_ns
        ffeats_static = feat_init_ns

        # positional embeddings (md_tracker.py:223-243)
        pos_grid = get_2d_sincos_pos_embed(p.input_dim, (h4, w4)).reshape(
            h4, w4, p.input_dim
        )
        pos_grid = jnp.asarray(pos_grid, jnp.float32)

        def sample_pos(c0):  # c0: (N, 2) in grid units
            pe = bilinear_sample2d(
                jnp.moveaxis(pos_grid, -1, 0)[None], c0[None, :, 0], c0[None, :, 1]
            )[0]
            return jnp.moveaxis(pe, 0, 1)  # (N, E)

        pos_embed = sample_pos(coords[0, :, :2])
        pos_embed_static = sample_pos((coords - coords_dyn)[0, :, :2])

        times = np.linspace(0, p.S - 1, p.S)
        times_embed = jnp.asarray(
            get_1d_sincos_pos_embed_from_grid(p.input_dim, times), jnp.float32
        )  # (S, E)

        def denorm(c):
            out_xy = c[..., :2] * float(p.stride)
            out_d = self.depth_process_inv(c[..., 2] / Dz * (d_far - d_near) + d_near)
            return out_xy, out_d

        if p.use_pallas_corr and self.mesh is not None:
            def corr_nsc(ffeats_ns, cxy):
                # per-track work, zero communication: explicit shard_map
                # over the track axis (GSPMD cannot partition a pallas_call)
                from batrack_tpu.parallel.shard_kernels import (
                    corr_sample_pyramid_sharded,
                )
                return corr_sample_pyramid_sharded(
                    pyramid, ffeats_ns, cxy, p.corr_radius, self.mesh,
                    interpret=p.pallas_interpret,
                )
        elif p.use_pallas_corr:
            def corr_nsc(ffeats_ns, cxy):
                return corr_sample_pyramid_pallas(
                    pyramid, ffeats_ns, cxy, p.corr_radius,
                    interpret=p.pallas_interpret,
                )  # (N, S, LRR) directly from the kernel's output BlockSpec
        else:
            def corr_nsc(ffeats_ns, cxy):
                fc = corr_sample_pyramid(
                    pyramid, jnp.moveaxis(ffeats_ns, 0, 1), cxy, p.corr_radius
                )  # (S, N, LRR) — XLA fallback (CPU/tests)
                return jnp.moveaxis(fc, 0, 1)

        def one_iter(coords, ffeats_ns, pe, transformer):
            # ffeats_ns: (N, S, C) track-major
            fcorrs_nsc = corr_nsc(ffeats_ns, coords[..., :2])       # (N, S, LRR)
            flows = coords - coords[0:1]
            flows_nsc = jnp.moveaxis(flows, 0, 1)                   # (N, S, 3)
            flows_cat = get_3d_embedding(flows_nsc, 64, cat_coords=True)
            flows_cat = self.zeroMLPflow(flows_cat)                 # (N, S, 130)

            x = jnp.concatenate([flows_cat, fcorrs_nsc, ffeats_ns, concat], axis=-1)
            x = x + pe[:, None, :] + times_embed[None, :, :]
            delta = transformer(x[None], key_mask)[0]               # (N, S, C+3)
            d_coords = jnp.moveaxis(delta[..., :3], 0, 1)           # (S, N, 3)
            d_feats = delta[..., 3:]                                # (N, S, C)
            return d_coords, d_feats

        # torch Sequential(Linear, GELU) applies GELU after the Linear
        # (md_tracker.py:134-137). The GroupNorm(1, C) runs on flattened
        # (B*N*S, C) rows in the reference (md_tracker.py:306-309) — flax
        # GroupNorm on (N, S, C) would reduce over S too, so flatten first.
        def feat_update(ffeats_ns, d_feats_nsc):
            N_, S_, C_ = d_feats_nsc.shape
            normed = self.norm(d_feats_nsc.reshape(-1, C_)).reshape(N_, S_, C_)
            upd = jax.nn.gelu(self.ffeat_updater(normed), approximate=False)
            return upd + ffeats_ns  # stays (N, S, C)

        coord_pred = None
        depth_pred = None
        coord_preds, depth_preds, static_preds = [], [], []
        for _ in range(p.iters):
            coords = jax.lax.stop_gradient(coords)
            d_coords, d_feats = one_iter(coords, ffeats, pos_embed, self.updateformer)
            ffeats = feat_update(ffeats, d_feats)
            coords = coords + d_coords
            coord_pred, depth_pred = denorm(coords)
            coord_preds.append(coord_pred)
            depth_preds.append(depth_pred)

        vis_e = self.vis_predictor(ffeats)[..., 0].T  # (S, N) logits

        dyn_logit = self.motion_label(ffeats[None])[0, :, 0]  # (N,)
        dyn_mask = jax.nn.sigmoid(dyn_logit)
        if p.dynamic_mask_detach:
            dyn_mask = jax.lax.stop_gradient(dyn_mask)

        coords_total = jax.lax.stop_gradient(coords)
        static_out = None
        for _ in range(p.static_iters):
            coords_dyn = jax.lax.stop_gradient(coords_dyn)
            coords_static = jax.lax.stop_gradient(coords_total - coords_dyn)
            d_coords, d_feats = one_iter(
                coords_static, ffeats_static, pos_embed_static, self.updateformer_dyn
            )
            ffeats_static = feat_update(ffeats_static, d_feats)
            coords_dyn = coords_dyn + d_coords
            out = coords_total - coords_dyn * dyn_mask[None, :, None]
            out_xy, out_d = denorm(out)
            static_out = jnp.concatenate([out_xy, out_d[..., None]], axis=-1)
            static_preds.append(static_out)

        if static_out is None:
            out_xy, out_d = denorm(coords_total)
            static_out = jnp.concatenate([out_xy, out_d[..., None]], axis=-1)

        # per-iteration predictions (the reference's coord_predictions /
        # coord_static_predictions lists, md_tracker.py:244-413) for the
        # training losses; zero-cost when unused (XLA DCEs the stacks)
        iter_preds = (coord_preds, depth_preds, static_preds)
        return (coord_pred, depth_pred, static_out, vis_e, dyn_logit, coords,
                coords_dyn, iter_preds)

    # ------------------------------------------------------------------
    def __call__(
        self,
        rgbds: jnp.ndarray,    # (T, 4, H, W) rgb 0..255 + metric depth
        queries: jnp.ndarray,  # (N, 4) [t, x, y, depth] in pixels
        prev_fmaps: jnp.ndarray | None = None,
        reuse: int = 0,
        train: bool = False,
    ):
        """Full sliding-window forward (md_tracker.py:416-671).

        prev_fmaps/reuse: optional cross-call feature cache — the first
        window reuses prev_fmaps shifted by `reuse` frames and encodes only
        the `reuse` new ones (the reference does the same across its sliding
        windows with stale normalisation stats, md_tracker.py:542-546).

        Returns (traj_e (T, N, 2), depth_e (T, N), traj_static (T, N, 3),
        vis_e (T, N) sigmoid, dynamic_e (T, N) sigmoid, fmaps of the last
        window).

        train=True appends a train_data dict — the static-shape equivalent
        of the reference's is_train outputs (md_tracker.py:646-667): per-
        window, per-GN-iteration predictions stacked over a static window
        count with an activity mask, for supervision losses.
        """
        p = self.p
        T, _, H, W = rgbds.shape
        N = queries.shape[0]
        S = p.S
        Dz = float(W // p.stride)

        rgbs = 2.0 * (rgbds[:, :3] / 255.0) - 1.0
        depth_all = self.depth_process(rgbds[:, 3])
        if p.use_log_depth:
            d_near = depth_all.min()
            d_far = depth_all.max()
        else:
            masked = jnp.where(depth_all > 0.01, depth_all, jnp.inf)
            d_near = masked.min()
            d_far = jnp.where(depth_all > 0.01, depth_all, -jnp.inf).max()
        # constant-depth windows (e.g. a fronto-parallel plane) make
        # d_far == d_near; the reference divides by zero here
        # (md_tracker.py:466-469) — guard the normalisation range
        d_far = jnp.maximum(d_far, d_near + 1e-3)

        first_ind = queries[:, 0].astype(jnp.int32)
        # the reference sorts tracks by first-visible frame (md_tracker.py:
        # 426-431) and runs the network on the sorted layout; everything is
        # permutation-equivariant except the scrambled concat, which couples
        # *adjacent sorted tracks* — so build it in sorted space
        sort_perm = jnp.argsort(first_ind, stable=True)
        inv_perm = jnp.argsort(sort_perm)

        # init coords in grid units (md_tracker.py:461-469)
        q_xy = queries[:, 1:3] / float(p.stride)
        q_d = (self.depth_process(queries[:, 3]) - d_near) / (d_far - d_near) * Dz
        coords0 = jnp.concatenate([q_xy, q_d[:, None]], axis=-1)  # (N, 3)

        n_wind = max(1, int(np.ceil((T - S // 2) / (S // 2))))

        # per-window down-scaled depth (nearest, md_tracker.py:515-517)
        h4, w4 = H // p.stride, W // p.stride
        depths_dn = depth_all[:, :: p.stride, :: p.stride]
        depths_dn = (depths_dn - d_near) / (d_far - d_near) * Dz  # (T, h4, w4)

        traj_e = jnp.zeros((T, N, 2))
        depth_e = jnp.zeros((T, N))
        static_e = jnp.zeros((T, N, 3))
        vis_e = jnp.zeros((T, N))
        dyn_e = jnp.zeros((T, N))

        coords_init = jnp.broadcast_to(coords0[None], (S, N, 3))
        coords_dyn_init = jnp.zeros((S, N, 3))
        vis_init = jnp.full((S, N), 10.0)
        feat_init = jnp.zeros((S, N, p.latent_dim))
        prev_active = jnp.zeros((N,), bool)
        fmaps = None

        train_windows = []
        for w in range(n_wind):
            ind = w * (S // 2)
            frame_ids = np.clip(ind + np.arange(S), 0, T - 1)  # repeat last (pad)
            # z-normalisation stats always come from the full S-frame window
            # (md_tracker.py:524-531), even when only part of it is encoded
            zwin = depths_dn[frame_ids]
            z_stats = (zwin.min(), zwin.max())
            if fmaps is None and prev_fmaps is not None and reuse >= S:
                # fully cached window (e.g. the backward-tracking pass reuses
                # the forward pass's per-frame features reversed — fnet and
                # the xyz embedding are per-frame, so reversed frames have
                # identical features and identical window z-stats)
                fmaps = prev_fmaps
            elif fmaps is None and prev_fmaps is not None and reuse > 0:
                new_ids = frame_ids[S - reuse:]
                fm_new = self.encode_window(rgbs[new_ids], depths_dn[new_ids],
                                            z_stats)
                fmaps = jnp.concatenate([prev_fmaps[reuse:], fm_new], axis=0)
            elif fmaps is None:
                fmaps = self.encode_window(rgbs[frame_ids], depths_dn[frame_ids])
            else:
                new_ids = frame_ids[S // 2:]
                fmaps_new = self.encode_window(rgbs[new_ids], depths_dn[new_ids],
                                               z_stats)
                fmaps = jnp.concatenate([fmaps[S // 2:], fmaps_new], axis=0)

            active = first_ind < ind + S
            new = active & ~prev_active

            # feat init for newly active queries at their first frame
            rel = jnp.clip(first_ind - ind, 0, S - 1)
            # per-query feature at its own first-frame map (flat gather; a
            # per-query map copy would be O(N*H*W*C) = tens of GB)
            fq = bilinear_sample_per_frame(fmaps, rel, coords0[:, :2])
            feat_init = jnp.where(
                new[None, :, None], jnp.broadcast_to(fq[None], (S, N, p.latent_dim)),
                feat_init,
            )

            # track mask (md_tracker.py:456-458 + the :645 zeroing): 1 where
            # the frame is real (t < T), at/after the query's first frame, and
            # not already consumed by a previous window — the reference zeroes
            # track_mask_[:, :ind+S] after each window, so carried-over tracks
            # contribute only the new second half
            t_ids = ind + np.arange(S)
            tm = (t_ids[:, None] >= first_ind[None, :]) & (t_ids < T)[:, None]
            tm = tm & active[None, :]
            if w > 0:
                second_half = (np.arange(S) >= S // 2)[:, None]
                tm = tm & (second_half | ~prev_active[None, :])
            track_mask = tm.astype(jnp.float32)

            # scrambled concat in sorted space over the active tracks, then
            # back to our unsorted static layout
            cnt = jnp.sum(active.astype(jnp.int32))
            concat = _scrambled_concat(
                track_mask[:, sort_perm], vis_init[:, sort_perm], cnt
            )[inv_perm]

            # the reference runs the transformer only on active (sorted)
            # tracks; masking the space-attention keys is the static-shape
            # equivalent. Single-window runs have every query active.
            key_mask = active if n_wind > 1 else None

            (coord_p, depth_p, static_p, vis_p, dyn_logit, coords_fin, coords_dyn_fin,
             iter_preds) = self.forward_iteration(
                fmaps, coords_init, coords_dyn_init, feat_init,
                concat, d_near, d_far, Dz, key_mask,
            )
            if train:
                cps, dps, sps = iter_preds
                train_windows.append({
                    "ind": ind,
                    "active": active,
                    "track_mask": track_mask,           # (S, N)
                    "coords": jnp.stack(cps),           # (I, S, N, 2)
                    "depths": jnp.stack(dps),           # (I, S, N)
                    "statics": (jnp.stack(sps) if sps
                                else jnp.zeros((0, S, N, 3))),
                    "vis_logits": vis_p,                # (S, N)
                    "dyn_logits": dyn_logit,            # (N,)
                })

            # scatter window results into the global timeline for active queries
            S_live = min(S, T - ind)
            upd = active[None, :]
            for s_local in range(S_live):
                t_global = ind + s_local
                traj_e = traj_e.at[t_global].set(
                    jnp.where(upd.T, coord_p[s_local], traj_e[t_global])
                )
                depth_e = depth_e.at[t_global].set(
                    jnp.where(active, depth_p[s_local], depth_e[t_global])
                )
                static_e = static_e.at[t_global].set(
                    jnp.where(upd.T, static_p[s_local], static_e[t_global])
                )
                vis_e = vis_e.at[t_global].set(
                    jnp.where(active, vis_p[s_local], vis_e[t_global])
                )
                dyn_e = dyn_e.at[t_global].set(
                    jnp.where(active, dyn_logit, dyn_e[t_global])
                )

            # hand off window state (md_tracker.py:580-615), faithful to the
            # reference's renormalisation (including its double /stride on the
            # dynamic component, which only matters for multi-window runs)
            if w + 1 < n_wind:
                half = S // 2
                new_xy = coord_p[half:] / float(p.stride)
                new_d = (self.depth_process(depth_p[half:]) - d_near) / (
                    d_far - d_near
                ) * Dz
                new_coords = jnp.concatenate([new_xy, new_d[..., None]], axis=-1)
                carried = jnp.concatenate(
                    [new_coords, jnp.broadcast_to(new_coords[-1:], (half, N, 3))],
                    axis=0,
                )
                coords_init = jnp.where(active[None, :, None], carried, coords_init)

                dyn_xy = (new_xy - static_p[half:, :, :2]) / float(p.stride)
                dyn_d0 = new_d - static_p[half:, :, 2]
                dyn_d = (self.depth_process(dyn_d0) - d_near) / (d_far - d_near) * Dz
                new_dyn = jnp.concatenate([dyn_xy, dyn_d[..., None]], axis=-1)
                carried_dyn = jnp.concatenate(
                    [new_dyn, jnp.broadcast_to(new_dyn[-1:], (half, N, 3))], axis=0
                )
                coords_dyn_init = jnp.where(
                    active[None, :, None], carried_dyn, coords_dyn_init
                )

                new_vis = vis_p[half:]
                carried_vis = jnp.concatenate(
                    [new_vis, jnp.broadcast_to(new_vis[-1:], (half, N))], axis=0
                )
                vis_init = jnp.where(active[None, :], carried_vis, vis_init)

            prev_active = active

        outputs = (
            traj_e,
            depth_e,
            static_e,
            jax.nn.sigmoid(vis_e),
            jax.nn.sigmoid(dyn_e),
            fmaps,
        )
        if not train:
            return outputs
        train_data = {
            "inds": np.asarray([tw["ind"] for tw in train_windows]),
            "active": jnp.stack([tw["active"] for tw in train_windows]),
            "track_mask": jnp.stack([tw["track_mask"] for tw in train_windows]),
            "coords": jnp.stack([tw["coords"] for tw in train_windows]),
            "depths": jnp.stack([tw["depths"] for tw in train_windows]),
            "statics": jnp.stack([tw["statics"] for tw in train_windows]),
            "vis_logits": jnp.stack([tw["vis_logits"] for tw in train_windows]),
            "dyn_logits": jnp.stack([tw["dyn_logits"] for tw in train_windows]),
        }
        return outputs + (train_data,)

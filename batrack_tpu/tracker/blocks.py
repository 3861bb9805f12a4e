"""Tracker building blocks in Flax: conv encoder + factorized transformer.

Architectural mirror of main/frontend/core/cotracker/blocks.py (BasicEncoder
:133-277, AttnBlock :280-305, UpdateFormer :388-457, MotionLabelBlock
:461-499) so the released md_tracker.pth checkpoint converts weight-for-weight
(see tracker/convert.py). Layouts are NHWC/channels-last as XLA prefers on
TPU; the converter transposes torch kernels.
"""

from __future__ import annotations

import os

import flax.linen as nn
import jax
import jax.numpy as jnp

from batrack_tpu.ops.sampling import interpolate_bilinear


def instance_norm(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """torch InstanceNorm2d(affine=False) over NHWC input."""
    mean = x.mean(axis=(1, 2), keepdims=True)
    var = x.var(axis=(1, 2), keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps)


def layer_norm(x: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """LayerNorm(elementwise_affine=False)."""
    mean = x.mean(axis=-1, keepdims=True)
    var = x.var(axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps)


class ResidualBlock(nn.Module):
    """blocks.py:16-75 with norm_fn='instance' (the config used)."""

    planes: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(self.planes, (3, 3), strides=self.stride, padding=1,
                    name="conv1", dtype=self.dtype)(x)
        y = nn.relu(instance_norm(y))
        y = nn.Conv(self.planes, (3, 3), padding=1, name="conv2", dtype=self.dtype)(y)
        y = nn.relu(instance_norm(y))
        if self.stride != 1:
            x = nn.Conv(self.planes, (1, 1), strides=self.stride,
                        name="downsample", dtype=self.dtype)(x)
            x = instance_norm(x)
        return nn.relu(x + y)


class BasicEncoder(nn.Module):
    """Four-stage conv pyramid fused at stride-4 (blocks.py:133-277)."""

    output_dim: int = 128
    stride: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # x: (B, H, W, C_in)
        H, W = x.shape[1], x.shape[2]
        out_hw = (H // self.stride, W // self.stride)

        x = nn.Conv(64, (7, 7), strides=2, padding=3, name="conv1", dtype=self.dtype)(x)
        x = nn.relu(instance_norm(x))

        a = ResidualBlock(64, 1, self.dtype, name="layer1_0")(x)
        a = ResidualBlock(64, 1, self.dtype, name="layer1_1")(a)
        b = ResidualBlock(96, 2, self.dtype, name="layer2_0")(a)
        b = ResidualBlock(96, 1, self.dtype, name="layer2_1")(b)
        c = ResidualBlock(128, 2, self.dtype, name="layer3_0")(b)
        c = ResidualBlock(128, 1, self.dtype, name="layer3_1")(c)
        d = ResidualBlock(128, 2, self.dtype, name="layer4_0")(c)
        d = ResidualBlock(128, 1, self.dtype, name="layer4_1")(d)

        def up(t):
            # bilinear, align_corners=True (blocks.py:245-268)
            t = jnp.moveaxis(t, -1, 1)  # NHWC -> NCHW for resize helper
            t = interpolate_bilinear(t, out_hw, align_corners=True)
            return jnp.moveaxis(t, 1, -1)

        x = jnp.concatenate([up(a), up(b), up(c), up(d)], axis=-1)
        x = nn.Conv(self.output_dim * 2, (3, 3), padding=1, name="conv2",
                    dtype=self.dtype)(x)
        x = nn.relu(instance_norm(x))
        x = nn.Conv(self.output_dim, (1, 1), name="conv3", dtype=self.dtype)(x)
        return x


def _chunked_attention(q, k, v, scale, chunk: int, key_mask=None):
    """Flash-style online-softmax attention over key chunks.

    q, k, v: (B, h, N, d). Bounds the probs transient to (.., N, chunk)
    instead of the full (.., N, N) volume — the space-attention blocks at
    SLAM sizes would otherwise materialise ~1 GB per block.
    key_mask: optional (N,) bool — False keys are excluded for every query.
    """
    B, H, N, D = q.shape
    n_chunks = (N + chunk - 1) // chunk
    pad = n_chunks * chunk - N
    if pad:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, pad), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, pad), (0, 0)))
    kc = k.reshape(B, H, n_chunks, chunk, D)
    vc = v.reshape(B, H, n_chunks, chunk, D)
    neg = jnp.float32(-1e30)
    kmask = None
    if key_mask is not None:
        kmask = jnp.pad(key_mask, (0, pad)) if pad else key_mask
        kmask = kmask.reshape(n_chunks, chunk)

    m0 = jnp.full((B, H, N), -jnp.inf, jnp.float32)
    s0 = jnp.zeros((B, H, N), jnp.float32)
    a0 = jnp.zeros((B, H, N, D), jnp.float32)

    def scan_step(carry, idx):
        m, s, acc = carry
        kk = kc[:, :, idx]
        vv = vc[:, :, idx]
        logits = (
            jnp.einsum("bhqd,bhkd->bhqk", q, kk).astype(jnp.float32) * scale
        )
        if pad:
            key_ids = idx * chunk + jnp.arange(chunk)
            logits = jnp.where(key_ids[None, None, None, :] < N, logits, neg)
        if kmask is not None:
            logits = jnp.where(kmask[idx][None, None, None, :], logits, neg)
        m_new = jnp.maximum(m, logits.max(axis=-1))
        p = jnp.exp(logits - m_new[..., None])
        corr = jnp.exp(m - m_new)
        s_new = s * corr + p.sum(axis=-1)
        acc_new = acc * corr[..., None] + jnp.einsum(
            "bhqk,bhkd->bhqd", p.astype(v.dtype), vv
        ).astype(jnp.float32)
        return (m_new, s_new, acc_new), None

    (m, s, acc), _ = jax.lax.scan(
        scan_step, (m0, s0, a0), jnp.arange(n_chunks)
    )
    return (acc / s[..., None]).astype(q.dtype)


def _tpu_flash_attention(q, k, v, scale, key_mask=None):
    """Pallas TPU flash attention for (B, h, N, d) with d < 128, N arbitrary.

    Pads d to the 128-lane width (zero value columns stay zero in the
    output) and N to a multiple of 128 with segment-id masking for the
    padded keys. On v5e at the tracker's space-attention shape
    (12, 8, 2400, 48) this halves device time vs the dense softmax (the
    (N, N) probs tensor never round-trips HBM), despite the 48->128 pad.

    key_mask: optional (N,) bool — False keys are excluded from every
    query's softmax (all-query ids 1 vs masked-key ids 0, which the
    kernel's q_id == kv_id test turns into the same -inf bias the dense
    path applies). Assumes at least one True key.
    """
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes, SegmentIds, flash_attention)

    B, h, N, d = q.shape
    NP = -(-N // 128) * 128
    bq = 32 * (NP // 128)  # NP/4: divides NP, multiple of 8

    # d stays unpadded: the kernel handles d=48 natively (register-level
    # lane padding only), and padding d to 128 costs a ~0.45 ms HBM pass
    # per block at the production shape for no kernel-time gain.
    def pad(x):
        return jnp.pad(x, ((0, 0), (0, 0), (0, NP - N), (0, 0)))

    seg = None
    if key_mask is not None:
        kv_ok = (jnp.arange(NP) < N) & jnp.pad(key_mask, (0, NP - N))
        seg = SegmentIds(
            q=jnp.ones((B, NP), jnp.int32),
            kv=jnp.broadcast_to(kv_ok.astype(jnp.int32), (B, NP)),
        )
    elif NP != N:
        ids = jnp.broadcast_to(
            (jnp.arange(NP) < N).astype(jnp.int32), (B, NP))
        seg = SegmentIds(q=ids, kv=ids)
    bs = BlockSizes(
        block_q=bq, block_k_major=NP, block_k=NP, block_b=1,
        block_q_major_dkv=bq, block_k_major_dkv=NP, block_k_dkv=NP,
        block_q_dkv=bq, block_k_major_dq=NP, block_k_dq=NP, block_q_dq=bq,
    )
    o = flash_attention(pad(q), pad(k), pad(v), segment_ids=seg,
                        sm_scale=scale, block_sizes=bs)
    return o[:, :, :N, :d]


class Attention(nn.Module):
    """timm vision_transformer Attention (qkv_bias=True).

    Long sequences on TPU use the Pallas flash kernel (`use_flash`);
    elsewhere, sequences longer than `chunk_threshold` use flash-style
    chunked softmax (numerically equivalent; avoids the (N, N) probs
    volume in HBM).
    """

    dim: int
    num_heads: int
    dtype: jnp.dtype = jnp.float32
    # chunked path only for sequences whose probs volume would stress HBM;
    # at SLAM sizes (N=2400) dense bf16 softmax measures fastest on v5e
    chunk_threshold: int = 8192
    chunk: int = 2048
    use_flash: bool = False
    flash_threshold: int = 1024  # below this, dispatch + pad overhead wins
    mesh: object = None          # jax.sharding.Mesh: shard queries over it
    interpret: bool = False      # Pallas interpret mode (CPU tests/dryrun)

    @nn.compact
    def __call__(self, x, key_mask=None):
        """key_mask: optional (N,) bool — False keys are excluded from the
        softmax (the reference slices inactive tracks out of the tensor
        entirely, md_tracker.py:617-626; a -inf bias is the masked-shape
        equivalent)."""
        B, N, C = x.shape
        head = C // self.num_heads
        qkv = nn.Dense(3 * C, name="qkv", dtype=self.dtype)(x)
        scale0 = head ** -0.5
        kernels_on = (jax.default_backend() == "tpu") or self.interpret
        if (self.use_flash and N >= self.flash_threshold and kernels_on
                and os.environ.get("BATRACK_TPU_ATTN", "fused") == "fused"):
            # packed-qkv kernel: heads are split/merged inside VMEM, so the
            # (B,N,3C)->3x(B,H,N,d) HBM relayout (~20 ms/forward at SLAM
            # sizes, ROOFLINE.md) never happens; key_mask rides in as a
            # (1, N) row the kernel folds into its padding mask. Production
            # default (hardware A/B 2026-08-18: 3.21 vs 4.41 ms/block bf16
            # vs split+flash, TPU_PARITY.md); BATRACK_TPU_ATTN=flash opts
            # back into the split+flash path
            if self.mesh is not None:
                # explicit shard_map over the track axis: local queries vs
                # all-gathered keys/values (GSPMD cannot partition the
                # pallas_call itself) — parallel/shard_kernels.py
                from batrack_tpu.parallel.shard_kernels import (
                    fused_qkv_attention_sharded,
                )
                out = fused_qkv_attention_sharded(
                    qkv, self.num_heads, scale0, self.mesh,
                    key_mask=key_mask, interpret=self.interpret,
                )
            else:
                from batrack_tpu.ops.pallas_attention import (
                    fused_qkv_attention,
                )
                out = fused_qkv_attention(qkv, self.num_heads, scale0,
                                          key_mask=key_mask,
                                          interpret=self.interpret)
            return nn.Dense(C, name="proj", dtype=self.dtype)(out)
        qkv = qkv.reshape(B, N, 3, self.num_heads, head)
        q, k, v = jnp.moveaxis(qkv, 2, 0)
        q = jnp.moveaxis(q, 1, 2)  # (B, h, N, d)
        k = jnp.moveaxis(k, 1, 2)
        v = jnp.moveaxis(v, 1, 2)
        scale = head ** -0.5
        if (self.use_flash and N >= self.flash_threshold
                and jax.default_backend() == "tpu" and self.mesh is None):
            out = _tpu_flash_attention(q, k, v, scale, key_mask)
        elif N > self.chunk_threshold:
            out = _chunked_attention(q, k, v, scale, self.chunk, key_mask)
        else:
            attn = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
            if key_mask is not None:
                attn = jnp.where(key_mask[None, None, None, :], attn, -1e30)
            attn = jax.nn.softmax(attn, axis=-1)
            out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = jnp.moveaxis(out, 1, 2).reshape(B, N, C)
        return nn.Dense(C, name="proj", dtype=self.dtype)(out)


class Mlp(nn.Module):
    """timm Mlp with tanh-approx GELU."""

    hidden: int
    out: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, name="fc1", dtype=self.dtype)(x)
        x = nn.gelu(x, approximate=True)
        return nn.Dense(self.out, name="fc2", dtype=self.dtype)(x)


class AttnBlock(nn.Module):
    """Pre-norm transformer block (blocks.py:280-305)."""

    hidden_size: int
    num_heads: int
    mlp_ratio: float = 4.0
    dtype: jnp.dtype = jnp.float32
    use_flash: bool = False
    mesh: object = None
    interpret: bool = False
    flash_threshold: int = 1024

    @nn.compact
    def __call__(self, x, key_mask=None):
        x = x + Attention(self.hidden_size, self.num_heads, self.dtype,
                          use_flash=self.use_flash, mesh=self.mesh,
                          interpret=self.interpret,
                          flash_threshold=self.flash_threshold, name="attn")(
            layer_norm(x), key_mask)
        x = x + Mlp(int(self.hidden_size * self.mlp_ratio), self.hidden_size,
                    self.dtype, name="mlp")(layer_norm(x))
        return x


class UpdateFormer(nn.Module):
    """Factorized time/space transformer (blocks.py:388-457)."""

    space_depth: int = 6
    time_depth: int = 6
    input_dim: int = 456
    hidden_size: int = 384
    num_heads: int = 8
    output_dim: int = 131
    mlp_ratio: float = 4.0
    add_space_attn: bool = True
    dtype: jnp.dtype = jnp.float32
    use_flash: bool = False
    mesh: object = None      # shard the track axis of space attention
    interpret: bool = False  # Pallas interpret mode (CPU tests/dryrun)
    flash_threshold: int = 1024  # min N for the kernel paths (test knob)

    @nn.compact
    def __call__(self, x, key_mask=None):
        # x: (B, N, T, input_dim); key_mask: optional (N,) bool active-track
        # mask applied to the space attention only (time attention, MLPs and
        # norms are per-track, so absent tracks cannot leak through them)
        B, N, T, _ = x.shape
        x = nn.Dense(self.hidden_size, name="input_transform", dtype=self.dtype)(x)

        j = 0
        if self.add_space_attn and (
                self.space_depth > self.time_depth
                or self.time_depth % self.space_depth):
            # interval = time//space would be 0 (ZeroDivision below) or
            # non-integral (instantiating more space blocks than
            # space_depth, diverging from the converter's param tree)
            raise ValueError(
                f"space_depth ({self.space_depth}) must divide time_depth "
                f"({self.time_depth}) when add_space_attn is on"
            )
        interval = self.time_depth // self.space_depth if self.add_space_attn else 0
        for i in range(self.time_depth):
            xt = x.reshape(B * N, T, self.hidden_size)
            xt = AttnBlock(self.hidden_size, self.num_heads, self.mlp_ratio,
                           self.dtype, name=f"time_blocks_{i}")(xt)
            x = xt.reshape(B, N, T, self.hidden_size)
            if self.add_space_attn and i % interval == 0:
                xs = jnp.moveaxis(x, 1, 2).reshape(B * T, N, self.hidden_size)
                xs = AttnBlock(self.hidden_size, self.num_heads, self.mlp_ratio,
                               self.dtype, use_flash=self.use_flash,
                               mesh=self.mesh, interpret=self.interpret,
                               flash_threshold=self.flash_threshold,
                               name=f"space_blocks_{j}")(xs, key_mask)
                x = jnp.moveaxis(xs.reshape(B, T, N, self.hidden_size), 1, 2)
                j += 1

        return nn.Dense(self.output_dim, name="flow_head", dtype=self.dtype)(x)


class MotionLabelMLP(nn.Module):
    """Per-track dynamic-motion logit (blocks.py:461-485, mlp_v1).

    The reference pools with AvgPool1d(kernel_size=S) where S is the tracker
    sliding-window length (MotionLabelBlock is built with S=self.S,
    md_tracker.py:146; the motion_label_block config's own S=8 is never read)
    — so the mean runs over the full window.
    """

    hidden_dim: int = 256
    pool_S: int = 12
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # x: (B, N, S, C) track-major -> (B, N, 1)
        x = Mlp(self.hidden_dim, 1, self.dtype, name="mlp")(x)  # (B, N, S, 1)
        return x[..., 0][..., : self.pool_S].mean(axis=-1, keepdims=True)

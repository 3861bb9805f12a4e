"""Tracker tests: torch-parity of blocks via weight conversion, the
scrambled concat reproduction, converter structure, and full-forward smoke.

The torch modules here are built inline from torch primitives to the same
spec as the reference blocks (cotracker/blocks.py) — they validate that
convert.py + the Flax modules reproduce the torch computation exactly, which
is what makes the released checkpoint usable.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn
import torch.nn.functional as F

from batrack_tpu.tracker.blocks import AttnBlock, BasicEncoder, UpdateFormer
from batrack_tpu.tracker.convert import convert_state_dict, _attn_block, _dense
from batrack_tpu.tracker.mdtracker import MDTracker, TrackerParams, _scrambled_concat


# ---------------------------------------------------------------------------
# torch reference replicas (same spec as cotracker/blocks.py)
# ---------------------------------------------------------------------------

class TResidual(tnn.Module):
    def __init__(self, inp, planes, stride=1):
        super().__init__()
        self.conv1 = tnn.Conv2d(inp, planes, 3, padding=1, stride=stride)
        self.conv2 = tnn.Conv2d(planes, planes, 3, padding=1)
        self.norm1 = tnn.InstanceNorm2d(planes)
        self.norm2 = tnn.InstanceNorm2d(planes)
        if stride != 1:
            self.norm3 = tnn.InstanceNorm2d(planes)
            self.downsample = tnn.Sequential(
                tnn.Conv2d(inp, planes, 1, stride=stride), self.norm3
            )
        else:
            self.downsample = None

    def forward(self, x):
        y = F.relu(self.norm1(self.conv1(x)))
        y = F.relu(self.norm2(self.conv2(y)))
        if self.downsample is not None:
            x = self.downsample(x)
        return F.relu(x + y)


class TEncoder(tnn.Module):
    def __init__(self, input_dim=3, output_dim=128, stride=4):
        super().__init__()
        self.stride = stride
        self.conv1 = tnn.Conv2d(input_dim, 64, 7, stride=2, padding=3)
        self.norm1 = tnn.InstanceNorm2d(64)
        self.layer1 = tnn.Sequential(TResidual(64, 64, 1), TResidual(64, 64, 1))
        self.layer2 = tnn.Sequential(TResidual(64, 96, 2), TResidual(96, 96, 1))
        self.layer3 = tnn.Sequential(TResidual(96, 128, 2), TResidual(128, 128, 1))
        self.layer4 = tnn.Sequential(TResidual(128, 128, 2), TResidual(128, 128, 1))
        self.conv2 = tnn.Conv2d(128 + 128 + 96 + 64, output_dim * 2, 3, padding=1)
        self.norm2 = tnn.InstanceNorm2d(output_dim * 2)
        self.conv3 = tnn.Conv2d(output_dim * 2, output_dim, 1)

    def forward(self, x):
        _, _, H, W = x.shape
        x = F.relu(self.norm1(self.conv1(x)))
        a = self.layer1(x)
        b = self.layer2(a)
        c = self.layer3(b)
        d = self.layer4(c)
        out_hw = (H // self.stride, W // self.stride)
        a, b, c, d = (
            F.interpolate(t, out_hw, mode="bilinear", align_corners=True)
            for t in (a, b, c, d)
        )
        x = self.conv2(torch.cat([a, b, c, d], dim=1))
        x = F.relu(self.norm2(x))
        return self.conv3(x)


class TAttnBlock(tnn.Module):
    def __init__(self, hidden, heads, mlp_ratio=4.0):
        super().__init__()
        self.norm1 = tnn.LayerNorm(hidden, elementwise_affine=False, eps=1e-6)
        self.norm2 = tnn.LayerNorm(hidden, elementwise_affine=False, eps=1e-6)
        self.heads = heads

        class A(tnn.Module):
            def __init__(s):
                super().__init__()
                s.qkv = tnn.Linear(hidden, hidden * 3, bias=True)
                s.proj = tnn.Linear(hidden, hidden)

            def forward(s, x):
                B, N, C = x.shape
                qkv = s.qkv(x).reshape(B, N, 3, heads, C // heads).permute(2, 0, 3, 1, 4)
                q, k, v = qkv.unbind(0)
                attn = (q @ k.transpose(-2, -1)) * (C // heads) ** -0.5
                attn = attn.softmax(dim=-1)
                return s.proj((attn @ v).transpose(1, 2).reshape(B, N, C))

        class M(tnn.Module):
            def __init__(s):
                super().__init__()
                s.fc1 = tnn.Linear(hidden, int(hidden * mlp_ratio))
                s.fc2 = tnn.Linear(int(hidden * mlp_ratio), hidden)

            def forward(s, x):
                return s.fc2(F.gelu(s.fc1(x), approximate="tanh"))

        self.attn = A()
        self.mlp = M()

    def forward(self, x):
        x = x + self.attn(self.norm1(x))
        return x + self.mlp(self.norm2(x))


# ---------------------------------------------------------------------------

def fnet_state_dict(tmod):
    return {f"fnet.{k}": v for k, v in tmod.state_dict().items()}


def test_basic_encoder_parity(rng):
    torch.manual_seed(0)
    tmod = TEncoder().eval()
    x = rng.normal(size=(2, 3, 64, 96)).astype(np.float32)
    with torch.no_grad():
        ref = tmod(torch.from_numpy(x)).numpy()

    sd = fnet_state_dict(tmod)  # converter handles the Sequential names
    full = convert_state_dict(_fill_missing(sd))
    params = {"params": full["params"]["fnet"]}
    enc = BasicEncoder(output_dim=128, stride=4)
    out = enc.apply(params, jnp.moveaxis(jnp.asarray(x), 1, -1))
    out = np.moveaxis(np.asarray(out), -1, 1)
    np.testing.assert_allclose(out, ref, rtol=1e-3, atol=1e-3)


def _fill_missing(sd):
    """Pad a partial state dict with zeros for the other modules so
    convert_state_dict can run (we only check the filled part)."""
    import torch as t

    def z(*shape):
        return t.zeros(*shape)

    full = dict(sd)
    d, h, mlp = 384, 8, 1536
    for prefix, depth_t, depth_s in [
        ("updateformer", 6, 6), ("updateformer_dyn", 3, 3)
    ]:
        full.setdefault(f"{prefix}.input_transform.weight", z(d, 456))
        full.setdefault(f"{prefix}.input_transform.bias", z(d))
        full.setdefault(f"{prefix}.flow_head.weight", z(131, d))
        full.setdefault(f"{prefix}.flow_head.bias", z(131))
        for i in range(depth_t):
            for blk in [f"{prefix}.time_blocks.{i}"]:
                full.setdefault(f"{blk}.attn.qkv.weight", z(3 * d, d))
                full.setdefault(f"{blk}.attn.qkv.bias", z(3 * d))
                full.setdefault(f"{blk}.attn.proj.weight", z(d, d))
                full.setdefault(f"{blk}.attn.proj.bias", z(d))
                full.setdefault(f"{blk}.mlp.fc1.weight", z(mlp, d))
                full.setdefault(f"{blk}.mlp.fc1.bias", z(mlp))
                full.setdefault(f"{blk}.mlp.fc2.weight", z(d, mlp))
                full.setdefault(f"{blk}.mlp.fc2.bias", z(d))
        for i in range(depth_s):
            blk = f"{prefix}.space_blocks.{i}"
            full.setdefault(f"{blk}.attn.qkv.weight", z(3 * d, d))
            full.setdefault(f"{blk}.attn.qkv.bias", z(3 * d))
            full.setdefault(f"{blk}.attn.proj.weight", z(d, d))
            full.setdefault(f"{blk}.attn.proj.bias", z(d))
            full.setdefault(f"{blk}.mlp.fc1.weight", z(mlp, d))
            full.setdefault(f"{blk}.mlp.fc1.bias", z(mlp))
            full.setdefault(f"{blk}.mlp.fc2.weight", z(d, mlp))
            full.setdefault(f"{blk}.mlp.fc2.bias", z(d))
    for l in range(1, 5):
        for b in range(2):
            pre = f"fnet.layer{l}.{b}"
            inp = {1: 64, 2: (64 if b == 0 else 96), 3: (96 if b == 0 else 128),
                   4: 128}[l]
            planes = {1: 64, 2: 96, 3: 128, 4: 128}[l]
            full.setdefault(f"{pre}.conv1.weight", z(planes, inp, 3, 3))
            full.setdefault(f"{pre}.conv1.bias", z(planes))
            full.setdefault(f"{pre}.conv2.weight", z(planes, planes, 3, 3))
            full.setdefault(f"{pre}.conv2.bias", z(planes))
            if l >= 2 and b == 0:
                full.setdefault(f"{pre}.downsample.0.weight", z(planes, inp, 1, 1))
                full.setdefault(f"{pre}.downsample.0.bias", z(planes))
    full.setdefault("fnet.conv1.weight", z(64, 3, 7, 7))
    full.setdefault("fnet.conv1.bias", z(64))
    full.setdefault("fnet.conv2.weight", z(256, 416, 3, 3))
    full.setdefault("fnet.conv2.bias", z(256))
    full.setdefault("fnet.conv3.weight", z(128, 256, 1, 1))
    full.setdefault("fnet.conv3.bias", z(128))
    full.setdefault("norm.weight", z(128))
    full.setdefault("norm.bias", z(128))
    full.setdefault("ffeat_updater.0.weight", z(128, 128))
    full.setdefault("ffeat_updater.0.bias", z(128))
    full.setdefault("vis_predictor.0.weight", z(1, 128))
    full.setdefault("vis_predictor.0.bias", z(1))
    full.setdefault("motion_label_block.network.mlp.fc1.weight", z(256, 128))
    full.setdefault("motion_label_block.network.mlp.fc1.bias", z(256))
    full.setdefault("motion_label_block.network.mlp.fc2.weight", z(1, 256))
    full.setdefault("motion_label_block.network.mlp.fc2.bias", z(1))
    full.setdefault("embedConv.weight", z(128, 191, 3, 3))
    full.setdefault("embedConv.bias", z(128))
    full.setdefault("zeroMLPflow.weight", z(130, 195))
    full.setdefault("zeroMLPflow.bias", z(130))
    return full


def test_attn_block_parity(rng):
    torch.manual_seed(1)
    tmod = TAttnBlock(64, 4).eval()
    x = rng.normal(size=(3, 10, 64)).astype(np.float32)
    with torch.no_grad():
        ref = tmod(torch.from_numpy(x)).numpy()
    sd = {f"b.{k}": torch.as_tensor(v) for k, v in tmod.state_dict().items()}
    params = {"params": _attn_block(sd, "b")}
    out = AttnBlock(hidden_size=64, num_heads=4).apply(
        jax.tree.map(jnp.asarray, params), jnp.asarray(x)
    )
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)


def test_scrambled_concat_matches_torch(rng):
    """Bit-exact reproduction of the fix_track_mask=False concat
    (md_tracker.py:280-285)."""
    S, N = 12, 10
    tm = rng.integers(0, 2, size=(1, S, N, 1)).astype(np.float32)
    vi = rng.normal(size=(1, S, N, 1)).astype(np.float32)
    ref = (
        torch.cat([torch.from_numpy(tm), torch.from_numpy(vi)], dim=2)
        .permute(0, 2, 1, 3)
        .reshape(N, S, 2)
        .numpy()
    )
    out = _scrambled_concat(jnp.asarray(tm[0, :, :, 0]), jnp.asarray(vi[0, :, :, 0]))
    np.testing.assert_array_equal(np.asarray(out), ref)


@pytest.mark.slow
def test_converter_structure_matches_init():
    """Converted param tree has exactly the structure MDTracker.init makes."""
    p = TrackerParams(S=4, interp_shape=(32, 48))
    model = MDTracker(p)
    window = jnp.zeros((4, 4, 32, 48))
    queries = jnp.zeros((6, 4)).at[:, 3].set(2.0)
    init_params = model.init(jax.random.PRNGKey(0), window, queries)

    conv = convert_state_dict(_fill_missing({}))
    conv = jax.tree.map(jnp.asarray, conv)

    init_paths = {jax.tree_util.keystr(k): v.shape
                  for k, v in jax.tree_util.tree_leaves_with_path(init_params)}
    conv_paths = {jax.tree_util.keystr(k): v.shape
                  for k, v in jax.tree_util.tree_leaves_with_path(conv)}
    assert init_paths == conv_paths, (
        set(init_paths) ^ set(conv_paths),
        {k: (init_paths.get(k), conv_paths.get(k))
         for k in init_paths if conv_paths.get(k) != init_paths[k]},
    )


class TestMDTrackerForward:
    def test_smoke_shapes_and_query_consistency(self, rng):
        p = TrackerParams(S=4, iters=2, static_iters=1, interp_shape=(32, 48))
        model = MDTracker(p)
        T, H, W, N = 4, 32, 48, 6
        window = jnp.asarray(rng.uniform(0, 255, (T, 4, H, W)), jnp.float32)
        window = window.at[:, 3].set(
            jnp.asarray(rng.uniform(2, 6, (T, H, W)), jnp.float32)
        )
        queries = jnp.asarray(
            np.stack(
                [
                    rng.integers(0, 2, N).astype(np.float32),
                    rng.uniform(5, W - 5, N),
                    rng.uniform(5, H - 5, N),
                    rng.uniform(2, 6, N),
                ],
                -1,
            ),
            jnp.float32,
        )
        params = model.init(jax.random.PRNGKey(0), window, queries)
        traj, depth, static3d, vis, dyn, _ = model.apply(params, window, queries)
        assert traj.shape == (T, N, 2)
        assert depth.shape == (T, N)
        assert static3d.shape == (T, N, 3)
        assert vis.shape == (T, N)
        assert dyn.shape == (T, N)
        for out in (traj, depth, static3d, vis, dyn):
            assert np.isfinite(np.asarray(out)).all()
        assert ((np.asarray(vis) >= 0) & (np.asarray(vis) <= 1)).all()

    @pytest.mark.slow
    def test_multi_window_runs(self, rng):
        p = TrackerParams(S=4, iters=1, static_iters=1, interp_shape=(32, 48))
        model = MDTracker(p)
        T, H, W, N = 8, 32, 48, 5
        window = jnp.asarray(rng.uniform(0, 255, (T, 4, H, W)), jnp.float32)
        window = window.at[:, 3].set(
            jnp.asarray(rng.uniform(2, 6, (T, H, W)), jnp.float32)
        )
        queries = jnp.asarray(
            np.stack(
                [
                    np.array([0, 0, 1, 4, 6], np.float32),  # late-appearing queries
                    rng.uniform(5, W - 5, N),
                    rng.uniform(5, H - 5, N),
                    rng.uniform(2, 6, N),
                ],
                -1,
            ),
            jnp.float32,
        )
        params = model.init(jax.random.PRNGKey(0), window, queries)
        traj, depth, static3d, vis, dyn, _ = model.apply(params, window, queries)
        assert traj.shape == (T, N, 2)
        assert np.isfinite(np.asarray(traj)).all()


def test_constant_depth_window_is_finite(rng):
    """Fronto-parallel planes give constant-depth windows; the normalisation
    range must be guarded (the reference divides by zero here)."""
    p = TrackerParams(S=4, iters=1, static_iters=1, interp_shape=(32, 48))
    model = MDTracker(p)
    T, H, W, N = 4, 32, 48, 6
    window = jnp.asarray(rng.uniform(0, 255, (T, 4, H, W)), jnp.float32)
    window = window.at[:, 3].set(6.0)  # constant depth everywhere
    queries = jnp.asarray(
        np.stack([np.zeros(N), rng.uniform(5, W - 5, N),
                  rng.uniform(5, H - 5, N), np.full(N, 6.0)], -1), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), window, queries)
    outs = model.apply(params, window, queries)[:5]
    for o in outs:
        assert np.isfinite(np.asarray(o)).all()


def test_flash_attention_flag_is_noop_off_tpu(rng):
    """use_flash_attention must leave CPU/GPU behavior bit-identical (the
    Pallas flash path is gated on jax.default_backend() == 'tpu')."""
    import jax
    import jax.numpy as jnp

    from batrack_tpu.tracker.blocks import Attention

    x = jnp.asarray(rng.normal(size=(2, 64, 48)), jnp.float32)
    a0 = Attention(48, 4, use_flash=False)
    a1 = Attention(48, 4, use_flash=True, flash_threshold=1)
    params = a0.init(jax.random.PRNGKey(0), x)
    o0 = a0.apply(params, x)
    o1 = a1.apply(params, x)
    np.testing.assert_array_equal(np.asarray(o0), np.asarray(o1))


def test_adapter_static_merge():
    """use_static / use_static_mask output merge (batrack.py:556-566)."""
    import numpy as np

    from batrack_tpu.tracker.adapter import MDTrackerAdapter
    from batrack_tpu.utils.config import ModelConfig

    S, NQ = 4, 6
    rng_np = np.random.default_rng(0)
    traj = jnp.asarray(rng_np.normal(size=(S, NQ, 2)), jnp.float32)
    depth = jnp.asarray(rng_np.uniform(1, 5, size=(S, NQ)), jnp.float32)
    static3d = jnp.asarray(rng_np.normal(size=(S, NQ, 3)), jnp.float32)
    dyn = jnp.asarray(rng_np.uniform(0, 1, size=(S, NQ)), jnp.float32)

    mc = ModelConfig(S=S, use_static=True)
    ad = MDTrackerAdapter(mc)
    t2, d2 = ad._static_merge(traj, depth, static3d, dyn)
    assert jnp.allclose(t2, static3d[..., :2])
    assert jnp.allclose(d2, static3d[..., 2])

    mc = ModelConfig(S=S, use_static_mask=True)
    ad = MDTrackerAdapter(mc, static_threshold=0.3)
    t2, d2 = ad._static_merge(traj, depth, static3d, dyn)
    m = np.asarray(dyn) > 0.7
    assert np.allclose(np.asarray(t2)[m], np.asarray(static3d[..., :2])[m])
    assert np.allclose(np.asarray(t2)[~m], np.asarray(traj)[~m])
    assert np.allclose(np.asarray(d2)[m], np.asarray(static3d[..., 2])[m])

    # both flags off: identity
    ad = MDTrackerAdapter(ModelConfig(S=S))
    t2, d2 = ad._static_merge(traj, depth, static3d, dyn)
    assert jnp.allclose(t2, traj) and jnp.allclose(d2, depth)


@pytest.mark.slow
def test_train_outputs_and_training_step(rng):
    """train=True exposes the reference's is_train surface (per-window,
    per-iteration predictions, md_tracker.py:646-667) and the whole network
    is trainable end to end: a CoTracker-style discounted L1 + vis BCE loss
    over those outputs has finite gradients and one Adam step reduces it."""
    import optax

    from batrack_tpu.tracker.mdtracker import MDTracker, TrackerParams

    T, H, W, N = 8, 32, 48, 8
    p = TrackerParams(S=4, stride=4, iters=2, static_iters=1,
                      space_depth=1, time_depth=1, space_depth_dyn=1,
                      time_depth_dyn=1, interp_shape=(H, W))
    net = MDTracker(p)

    rgb = rng.uniform(0, 255, (T, 3, H, W)).astype(np.float32)
    depth = rng.uniform(2, 6, (T, 1, H, W)).astype(np.float32)
    rgbd = jnp.asarray(np.concatenate([rgb, depth], axis=1))
    q = jnp.asarray(np.stack([
        np.zeros(N), rng.uniform(5, W - 5, N), rng.uniform(5, H - 5, N),
        rng.uniform(2, 6, N)], -1), jnp.float32)
    # synthetic supervision: constant-velocity drift of the query points
    gt = np.asarray(q[:, 1:3])[None] + np.arange(T)[:, None, None] * 0.3
    gt = jnp.asarray(gt, jnp.float32)  # (T, N, 2)
    gt_vis = jnp.ones((T, N), jnp.float32)

    params = net.init(jax.random.PRNGKey(0), rgbd, q)

    def loss_fn(params):
        *_, td = net.apply(params, rgbd, q, train=True)
        n_wind, I = td["coords"].shape[:2]
        total = 0.0
        for w in range(n_wind):
            ind = int(td["inds"][w])
            sl = jnp.arange(p.S) + ind
            gt_w = jnp.take(gt, jnp.clip(sl, 0, T - 1), axis=0)     # (S, N, 2)
            m = td["track_mask"][w][..., None]                       # (S, N, 1)
            for i in range(I):
                disc = 0.8 ** (I - i - 1)
                total = total + disc * jnp.sum(
                    jnp.abs(td["coords"][w, i] - gt_w) * m
                ) / jnp.maximum(m.sum(), 1)
            vis_bce = optax.sigmoid_binary_cross_entropy(
                td["vis_logits"][w], jnp.take(gt_vis, jnp.clip(sl, 0, T - 1), axis=0)
            )
            total = total + jnp.mean(vis_bce * td["track_mask"][w])
        return total

    l0, grads = jax.value_and_grad(loss_fn)(params)
    gnorm = optax.global_norm(grads)
    assert np.isfinite(float(l0)) and np.isfinite(float(gnorm)) and float(gnorm) > 0
    # NOTE: the surrogate gradient intentionally differs from the true
    # function sensitivity — coords are detached each GN iteration exactly
    # like the reference training graph (md_tracker.py:249), so a finite-
    # difference descent check is NOT expected to hold here. Gradient
    # correctness is asserted in test_train_gradient_matches_fd below on a
    # detach-free configuration.


@pytest.mark.slow
def test_train_gradient_matches_fd(rng):
    """At iters=1/static_iters=0 the initial coords are parameter-free
    constants, so the per-iteration detach is the identity and autodiff
    must equal the true directional derivative (central finite
    difference)."""
    from batrack_tpu.tracker.mdtracker import MDTracker, TrackerParams

    T, H, W, N = 4, 32, 48, 4
    p = TrackerParams(S=4, stride=4, iters=1, static_iters=0,
                      space_depth=1, time_depth=1, space_depth_dyn=1,
                      time_depth_dyn=1, interp_shape=(H, W))
    net = MDTracker(p)
    rgb = rng.uniform(0, 255, (T, 3, H, W)).astype(np.float32)
    depth = rng.uniform(2, 6, (T, 1, H, W)).astype(np.float32)
    rgbd = jnp.asarray(np.concatenate([rgb, depth], axis=1))
    q = jnp.asarray(np.stack([
        np.zeros(N), rng.uniform(5, W - 5, N), rng.uniform(5, H - 5, N),
        rng.uniform(2, 6, N)], -1), jnp.float32)
    gt = jnp.asarray(np.asarray(q[:, 1:3])[None]
                     + np.arange(T)[:, None, None] * 0.3, jnp.float32)
    params = net.init(jax.random.PRNGKey(0), rgbd, q)

    def loss_fn(params):
        *_, td = net.apply(params, rgbd, q, train=True)
        m = td["track_mask"][0][..., None]
        sq = jnp.sum(((td["coords"][0, 0] - gt) * m) ** 2)
        return sq / 100.0 + jnp.sum(td["vis_logits"][0] ** 2) * 1e-3

    l0, grads = jax.value_and_grad(loss_fn)(params)
    key = jax.random.PRNGKey(1)
    leaves, treedef = jax.tree.flatten(params)
    dirs = [jax.random.normal(k, l.shape, jnp.float32)
            for k, l in zip(jax.random.split(key, len(leaves)), leaves)]
    d = jax.tree.unflatten(treedef, dirs)
    dd = sum(float(jnp.vdot(g, v)) for g, v in
             zip(jax.tree.leaves(grads), jax.tree.leaves(d)))
    lf = jax.jit(loss_fn)
    eps = 1e-3 / float(optax_global_norm(d))
    lp = float(lf(jax.tree.map(lambda a, v: a + eps * v, params, d)))
    lm = float(lf(jax.tree.map(lambda a, v: a - eps * v, params, d)))
    fd = (lp - lm) / (2 * eps)
    assert abs(fd - dd) / max(abs(dd), 1e-6) < 5e-2, (fd, dd)


def optax_global_norm(tree):
    import optax

    return optax.global_norm(tree)

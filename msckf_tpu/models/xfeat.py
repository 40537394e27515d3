"""XFeat ("accelerated features") in Flax — on-device feature extraction.

The reference pulls XFeat in as an external PyTorch submodule and runs it on
CPU (`/root/reference/src/msckf/FeatureExtractor.py:13-18,50-60`; upstream
github.com/verlab/accelerated_features). This is the TPU-native rebuild of
that CNN (architecture from the XFeat paper / upstream model definition):

  backbone: InstanceNorm -> block1 (1->4->8->8->24, /4) + skip -> block2
  (24->24) -> block3 (24->64, /8) -> block4 (64->64, /16) -> block5
  (64->128->64, /32); block4/5 upsampled bilinearly to 1/8 and fused ->
  64-d dense descriptors at 1/8 resolution; a 65-channel keypoint-logit head
  over 8x8-unfolded input pixels; a sigmoid reliability heatmap head.

``detect_and_compute`` reproduces the upstream inference path with
*fixed-shape* TPU-friendly ops: bilinear resize to a /32 grid, softmax +
pixel-shuffle keypoint heatmap, 5x5 max-pool NMS as a mask, fixed top-k
selection, ``InterpolateSparse2d``-convention reliability/descriptor
sampling (grid normalized by (W-1, H-1) yet unnormalized with
align_corners=False and zeros padding — the upstream mixed-convention quirk,
replicated exactly; descriptors sampled bicubic like upstream), L2
normalization. Numerically validated against a torch implementation of the
upstream spec in ``tests/test_xfeat_torch_parity.py``.

Pretrained weights convert from the upstream ``xfeat.pt`` state_dict via
``convert_torch_state_dict`` (this environment has no network egress, so the
checkpoint itself must be supplied by the user; random init is used
otherwise, which exercises the identical compute graph).

Conv/BatchNorm conventions: NCHW like upstream (XLA lays out as it pleases);
BatchNorm is affine=False (running stats only at inference); InstanceNorm has
no parameters.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class BasicLayer(nn.Module):
    """Conv2d(bias=False) + BatchNorm(affine=False) + ReLU.

    ``train=False`` (inference, the default) normalizes by the stored running
    stats like upstream eval mode. ``train=True`` normalizes by the batch
    statistics and EMA-updates the running stats (torch BatchNorm2d momentum
    0.1) — used by the self-supervised trainer (models/train_xfeat.py); pass
    ``mutable=["batch_stats"]`` to apply.
    """

    out_ch: int
    kernel: int = 3
    stride: int = 1
    padding: int = 1
    dilation: int = 1
    train: bool = False

    @nn.compact
    def __call__(self, x):  # x: (B, H, W, C)
        x = nn.Conv(
            self.out_ch,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=[(self.padding, self.padding)] * 2,
            kernel_dilation=(self.dilation, self.dilation),
            use_bias=False,
            name="conv",
        )(x)
        n = x.shape[-1]
        mean_v = self.variable("batch_stats", "bn_mean", lambda: jnp.zeros((n,)))
        var_v = self.variable("batch_stats", "bn_var", lambda: jnp.ones((n,)))
        if self.train and not self.is_initializing():
            m = jnp.mean(x, axis=(0, 1, 2))
            v = jnp.var(x, axis=(0, 1, 2))
            mean_v.value = 0.9 * mean_v.value + 0.1 * m
            var_v.value = 0.9 * var_v.value + 0.1 * v
            x = (x - m) / jnp.sqrt(v + 1e-5)
        else:
            x = (x - mean_v.value) / jnp.sqrt(var_v.value + 1e-5)
        return nn.relu(x)


def _bilinear_resize(x, h, w):
    # antialias=False: torch F.interpolate(mode='bilinear') semantics
    return jax.image.resize(
        x, (x.shape[0], h, w, x.shape[-1]), method="bilinear", antialias=False
    )


class XFeatModel(nn.Module):
    """Returns (feats 1/8-res 64ch, keypoint logits 65ch, reliability 1ch)."""

    train: bool = False

    def _bl(self, *args, **kwargs):
        return BasicLayer(*args, train=self.train, **kwargs)

    @nn.compact
    def __call__(self, x):  # (B, H, W, 1), H, W divisible by 32
        # InstanceNorm2d(1): per-image standardization
        mu = jnp.mean(x, axis=(1, 2), keepdims=True)
        var = jnp.var(x, axis=(1, 2), keepdims=True)
        xn = (x - mu) / jnp.sqrt(var + 1e-5)

        # skip1: AvgPool(4,4) + 1x1 conv to 24
        skip = nn.avg_pool(xn, (4, 4), strides=(4, 4))
        skip = nn.Conv(24, (1, 1), use_bias=True, name="skip1_conv")(skip)

        b1 = self._bl(4, stride=1, name="block1_0")(xn)
        b1 = self._bl(8, stride=2, name="block1_1")(b1)
        b1 = self._bl(8, stride=1, name="block1_2")(b1)
        b1 = self._bl(24, stride=2, name="block1_3")(b1)

        b2 = self._bl(24, stride=1, name="block2_0")(b1 + skip)
        b2 = self._bl(24, stride=1, name="block2_1")(b2)

        b3 = self._bl(64, stride=2, name="block3_0")(b2)
        b3 = self._bl(64, stride=1, name="block3_1")(b3)
        b3 = self._bl(64, kernel=1, padding=0, name="block3_2")(b3)

        b4 = self._bl(64, stride=2, name="block4_0")(b3)
        b4 = self._bl(64, stride=1, name="block4_1")(b4)
        b4 = self._bl(64, stride=1, name="block4_2")(b4)

        b5 = self._bl(128, stride=2, name="block5_0")(b4)
        b5 = self._bl(128, stride=1, name="block5_1")(b5)
        b5 = self._bl(128, stride=1, name="block5_2")(b5)
        b5 = self._bl(64, kernel=1, padding=0, name="block5_3")(b5)

        h8, w8 = b3.shape[1], b3.shape[2]
        fused = b3 + _bilinear_resize(b4, h8, w8) + _bilinear_resize(b5, h8, w8)
        fused = self._bl(64, stride=1, name="fusion_0")(fused)
        fused = self._bl(64, stride=1, name="fusion_1")(fused)
        feats = nn.Conv(64, (1, 1), use_bias=True, name="fusion_conv")(fused)

        # heatmap (reliability) head
        hm = self._bl(64, kernel=1, padding=0, name="heat_0")(feats)
        hm = self._bl(64, kernel=1, padding=0, name="heat_1")(hm)
        hm = nn.Conv(1, (1, 1), use_bias=True, name="heat_conv")(hm)
        heatmap = nn.sigmoid(hm)

        # keypoint head over 8x8-unfolded raw pixels
        B, H, W, _ = xn.shape
        unf = xn.reshape(B, H // 8, 8, W // 8, 8, 1)
        unf = unf.transpose(0, 1, 3, 2, 4, 5).reshape(B, H // 8, W // 8, 64)
        kp = self._bl(64, kernel=1, padding=0, name="kp_0")(unf)
        kp = self._bl(64, kernel=1, padding=0, name="kp_1")(kp)
        kp = self._bl(64, kernel=1, padding=0, name="kp_2")(kp)
        kp_logits = nn.Conv(65, (1, 1), use_bias=True, name="kp_conv")(kp)

        return feats, kp_logits, heatmap


def keypoint_heatmap(kp_logits: jnp.ndarray, temp: float = 1.0) -> jnp.ndarray:
    """Softmax over 65 cells (64 positions + dustbin), drop the dustbin,
    pixel-shuffle back to full resolution. (B, H/8, W/8, 65) -> (B, H, W)."""
    sm = jax.nn.softmax(kp_logits * temp, axis=-1)[..., :64]
    B, Hc, Wc, _ = sm.shape
    hm = sm.reshape(B, Hc, Wc, 8, 8)
    hm = hm.transpose(0, 1, 3, 2, 4).reshape(B, Hc * 8, Wc * 8)
    return hm


def _sparse_coords(pos: jnp.ndarray, H_full: int, W_full: int, h: int, w: int):
    """The upstream ``InterpolateSparse2d`` coordinate transform: positions
    normalized by (W_full-1, H_full-1) (align_corners=True convention) but
    unnormalized onto the (h, w) sample grid with align_corners=False —
    a mixed convention that shifts samples by ~half a cell. Part of the
    upstream spec; replicated exactly."""
    gx = 2.0 * pos[:, 0] / (W_full - 1.0) - 1.0
    gy = 2.0 * pos[:, 1] / (H_full - 1.0) - 1.0
    ix = ((gx + 1.0) * w - 1.0) / 2.0
    iy = ((gy + 1.0) * h - 1.0) / 2.0
    return ix, iy


def _gather_zeros_impl(grid: jnp.ndarray, iy: jnp.ndarray, ix: jnp.ndarray) -> jnp.ndarray:
    h, w = grid.shape[0], grid.shape[1]
    ok = (ix >= 0) & (ix < w) & (iy >= 0) & (iy < h)
    v = grid[jnp.clip(iy, 0, h - 1), jnp.clip(ix, 0, w - 1)]
    return jnp.where(ok[:, None], v, 0.0)


@jax.custom_batching.custom_vmap
def _gather_zeros(grid: jnp.ndarray, iy: jnp.ndarray, ix: jnp.ndarray) -> jnp.ndarray:
    """grid[(iy, ix)] with zeros padding (torch grid_sample padding_mode
    default). grid (H, W, C); iy/ix int (N,) -> (N, C).

    Batching: under ``vmap`` (the fused pipeline's batched CNN stage) a
    per-image gather becomes a batch-varying gather, which XLA serializes on
    TPU — these 16-tap bicubic samples were the hot tail of the vmapped
    detect_and_compute. The vmap rule flattens the batch axis into the row
    index so the lowering stays ONE contiguous-row gather (bitwise-identical
    values).
    """
    return _gather_zeros_impl(grid, iy, ix)


@_gather_zeros.def_vmap
def _gather_zeros_vmap(axis_size, in_batched, grid, iy, ix):
    B = axis_size
    bcast = lambda b, a: (
        a if b else jnp.broadcast_to(a, (B,) + jnp.asarray(a).shape)
    )
    grid, iy, ix = (
        bcast(b, a) for b, a in zip(in_batched, (grid, iy, ix))
    )
    h, w, C = grid.shape[1], grid.shape[2], grid.shape[3]
    ok = (ix >= 0) & (ix < w) & (iy >= 0) & (iy < h)
    rows = (
        jnp.arange(B, dtype=jnp.int32)[:, None] * (h * w)
        + jnp.clip(iy, 0, h - 1) * w
        + jnp.clip(ix, 0, w - 1)
    ).reshape(-1)
    v = grid.reshape(B * h * w, C)[rows].reshape(B, iy.shape[1], C)
    return jnp.where(ok[..., None], v, 0.0), True


def _cubic_weights(t: jnp.ndarray):
    """torch grid_sample bicubic coefficients (cubic convolution, A=-0.75)
    for the 4-tap neighborhood at fractional offset t in [0, 1)."""
    A = -0.75

    def cc1(x):  # |x| <= 1
        return ((A + 2.0) * x - (A + 3.0)) * x * x + 1.0

    def cc2(x):  # 1 < |x| < 2
        return ((A * x - 5.0 * A) * x + 8.0 * A) * x - 4.0 * A

    return cc2(t + 1.0), cc1(t), cc1(1.0 - t), cc2(2.0 - t)


def interpolate_sparse(
    grid: jnp.ndarray,  # (h, w, C) feature map
    pos: jnp.ndarray,  # (N, 2) xy positions in the (H_full, W_full) frame
    H_full: int,
    W_full: int,
    mode: str = "bilinear",
) -> jnp.ndarray:
    """Upstream ``InterpolateSparse2d``: grid_sample(mode, align_corners=False,
    padding zeros) at positions normalized by the *full-resolution* extent."""
    h, w = grid.shape[0], grid.shape[1]
    ix, iy = _sparse_coords(pos, H_full, W_full, h, w)
    if mode == "nearest":
        # torch rounds with nearbyint (half-to-even), as does jnp.round
        return _gather_zeros(grid, jnp.round(iy).astype(jnp.int32),
                             jnp.round(ix).astype(jnp.int32))
    x0 = jnp.floor(ix).astype(jnp.int32)
    y0 = jnp.floor(iy).astype(jnp.int32)
    tx = (ix - x0)[:, None]
    ty = (iy - y0)[:, None]
    if mode == "bilinear":
        v00 = _gather_zeros(grid, y0, x0)
        v01 = _gather_zeros(grid, y0, x0 + 1)
        v10 = _gather_zeros(grid, y0 + 1, x0)
        v11 = _gather_zeros(grid, y0 + 1, x0 + 1)
        return (1 - ty) * ((1 - tx) * v00 + tx * v01) + ty * ((1 - tx) * v10 + tx * v11)
    assert mode == "bicubic"
    wx = _cubic_weights(tx)
    wy = _cubic_weights(ty)
    out = jnp.zeros((pos.shape[0], grid.shape[-1]), grid.dtype)
    for dy in range(4):
        row = jnp.zeros_like(out)
        for dx in range(4):
            row = row + wx[dx] * _gather_zeros(grid, y0 + dy - 1, x0 + dx - 1)
        out = out + wy[dy] * row
    return out


def _reliability_fullres(rel: jnp.ndarray, H: int, W: int) -> jnp.ndarray:
    """Bilinear ``interpolate_sparse`` of the 1/8-resolution reliability map
    evaluated at every full-resolution pixel, as a separable 1-D pass per
    axis (the coordinate transform is affine per axis, and bilinear weights
    with zeros padding factorize)."""
    h, w = rel.shape

    def axis_taps(n_out, n_in, full):
        i = (( (2.0 * jnp.arange(n_out) / (full - 1.0) - 1.0) + 1.0) * n_in - 1.0) / 2.0
        i0 = jnp.floor(i).astype(jnp.int32)
        t = i - i0
        ok0 = (i0 >= 0) & (i0 < n_in)
        ok1 = (i0 + 1 >= 0) & (i0 + 1 < n_in)
        return jnp.clip(i0, 0, n_in - 1), jnp.clip(i0 + 1, 0, n_in - 1), t, ok0, ok1

    x0, x1, tx, okx0, okx1 = axis_taps(W, w, W)
    y0, y1, ty, oky0, oky1 = axis_taps(H, h, H)
    cols = jnp.where(okx0, 1.0 - tx, 0.0)[None, :] * rel[:, x0] + jnp.where(
        okx1, tx, 0.0
    )[None, :] * rel[:, x1]  # (h, W)
    return (
        jnp.where(oky0, 1.0 - ty, 0.0)[:, None] * cols[y0]
        + jnp.where(oky1, ty, 0.0)[:, None] * cols[y1]
    )  # (H, W)


def _topk_twostage(flat: jnp.ndarray, k: int, blocks: int = 64):
    """Exact top-k (values AND lowest-index tie-breaking identical to
    ``jax.lax.top_k``) as block-local top-k + a merge.

    One stable sort over H*W=307200 scores was the single hottest CNN op on
    TPU (378 us/frame profiled); 64 parallel row sorts + one 64*k merge are
    an order of magnitude cheaper. Exactness: the global top-k lies in the
    union of per-block top-k's, and the block-major merge order preserves
    global index order for equal values, so ties resolve identically.
    """
    n = flat.shape[0]
    pad = (-n) % blocks
    C = (n + pad) // blocks
    x = jnp.pad(flat, (0, pad), constant_values=-jnp.inf).reshape(blocks, C)
    v, i = jax.lax.top_k(x, min(k, C))  # (blocks, min(k, C))
    gidx = i + (jnp.arange(blocks, dtype=i.dtype) * C)[:, None]
    v2, j = jax.lax.top_k(v.reshape(-1), k)
    return v2, gidx.reshape(-1)[j]


def detect_and_compute(
    params: Any,
    image: jnp.ndarray,  # (H, W) grayscale float in [0, 255] or [0, 1]
    top_k: int = 300,
    nms_threshold: float = 0.05,
    nms_kernel: int = 5,
    refine_subpix: bool = False,
):
    """Upstream ``XFeat.detectAndCompute`` as fixed-shape XLA ops.

    Returns (keypoints (top_k, 2) xy pixels in the input frame, descriptors
    (top_k, 64) L2 normalized, scores (top_k,), valid (top_k,) bool). Invalid
    slots carry score -1, matching upstream's sentinel. Validated against a
    torch implementation of the upstream spec (tests/test_xfeat_torch_parity).

    ``refine_subpix`` (enhancement, off by default == upstream-exact): refine
    each peak's output coordinate by a 1-D quadratic fit per axis over the
    3x3 heatmap neighborhood (offset in (-1/2, 1/2) px). Descriptors/scores
    stay sampled at the integer peak, so matching is unchanged — only the
    measurement coordinates handed to the filter sharpen.
    """
    H0, W0 = image.shape
    if H0 < 32 or W0 < 32:
        raise ValueError(f"image must be at least 32x32, got {H0}x{W0}")
    # upstream preprocess: bilinear-resize (shrink) to multiples of 32 and
    # scale keypoints back at the end
    H = (H0 // 32) * 32
    W = (W0 // 32) * 32
    x = image[None, :, :, None].astype(jnp.float32)
    if (H, W) != (H0, W0):
        x = _bilinear_resize(x, H, W)

    feats, kp_logits, reliability = XFeatModel().apply(params, x)
    feats = feats / jnp.linalg.norm(feats, axis=-1, keepdims=True).clip(1e-12)

    hm = keypoint_heatmap(kp_logits)[0]  # (H, W)
    # 5x5 max-pool NMS as a mask
    local_max = jax.lax.reduce_window(
        hm, -jnp.inf, jax.lax.max,
        (nms_kernel, nms_kernel), (1, 1), "SAME",
    )
    is_peak = (hm == local_max) & (hm > nms_threshold)
    # upstream pads its peak list with (0, 0) rows and forces their score to
    # -1, which also kills a *genuine* peak at pixel (0, 0) — replicated.
    # Peaks on the last row/column are also dead upstream: the nearest-sample
    # index W-0.5 rounds (half-to-even, W even) to W, out of bounds, and
    # zeros padding makes their score 0, failing the `scores > 0` validity.
    is_peak = is_peak.at[0, 0].set(False)
    is_peak = is_peak.at[H - 1, :].set(False).at[:, W - 1].set(False)

    # score = heatmap at the peak (upstream nearest-samples the full-res
    # heatmap at integer peaks == direct indexing) * sparse-bilinear
    # reliability from the 1/8 map
    rel_up = _reliability_fullres(reliability[0, :, :, 0], H, W)
    score_map = jnp.where(is_peak, hm * rel_up, -1.0)

    flat = score_map.reshape(-1)
    top_scores, top_idx = _topk_twostage(flat, top_k)
    ky = (top_idx // W).astype(jnp.float32)
    kx = (top_idx % W).astype(jnp.float32)
    kpts = jnp.stack([kx, ky], axis=-1)  # (top_k, 2) xy on the /32 grid

    # bicubic descriptor sampling (upstream interpolator) on the 1/8 map
    desc = interpolate_sparse(feats[0], kpts, H, W, mode="bicubic")
    desc = desc / jnp.linalg.norm(desc, axis=-1, keepdims=True).clip(1e-12)

    valid = top_scores > 0

    if refine_subpix:
        # 1-D quadratic (parabola) vertex per axis on the 3x3 heatmap
        # neighborhood: offset = (h[-1] - h[+1]) / (2 (h[-1] - 2 h[0] + h[+1])),
        # well-defined at an NMS peak (h[0] >= neighbors ⇒ curvature <= 0);
        # degenerate plateaus get offset 0. Runs once per frame on top_k
        # points — outside the filter scan, so the tiny gathers are harmless.
        iy = (top_idx // W).astype(jnp.int32)
        ix = (top_idx % W).astype(jnp.int32)

        def tap(dy, dx):
            return hm[jnp.clip(iy + dy, 0, H - 1), jnp.clip(ix + dx, 0, W - 1)]

        c = tap(0, 0)
        l, r = tap(0, -1), tap(0, 1)
        u, d = tap(-1, 0), tap(1, 0)

        def vertex(lo, hi):
            den = lo - 2.0 * c + hi
            off = 0.5 * (lo - hi) / jnp.where(jnp.abs(den) < 1e-12, 1.0, den)
            off = jnp.where(jnp.abs(den) < 1e-12, 0.0, off)
            return jnp.clip(off, -0.5, 0.5)

        kpts = kpts + jnp.stack([vertex(l, r), vertex(u, d)], axis=-1)

    # scale keypoints back to the input frame (upstream rw1/rh1)
    kpts = kpts * jnp.asarray([W0 / W, H0 / H], dtype=kpts.dtype)
    return kpts, desc, top_scores, valid


def init_params(rng: jax.Array, height: int = 480, width: int = 640):
    x = jnp.zeros((1, height, width, 1), jnp.float32)
    return XFeatModel().init(rng, x)


# ---------------------------------------------------------------- conversion

_TORCH_PREFIXES = {
    # our module name -> upstream state_dict prefix (net.* in xfeat.pt)
    "block1_0": "block1.0", "block1_1": "block1.1",
    "block1_2": "block1.2", "block1_3": "block1.3",
    "block2_0": "block2.0", "block2_1": "block2.1",
    "block3_0": "block3.0", "block3_1": "block3.1", "block3_2": "block3.2",
    "block4_0": "block4.0", "block4_1": "block4.1", "block4_2": "block4.2",
    "block5_0": "block5.0", "block5_1": "block5.1",
    "block5_2": "block5.2", "block5_3": "block5.3",
    "fusion_0": "block_fusion.0", "fusion_1": "block_fusion.1",
    "heat_0": "heatmap_head.0", "heat_1": "heatmap_head.1",
    "kp_0": "keypoint_head.0", "kp_1": "keypoint_head.1", "kp_2": "keypoint_head.2",
}

_TORCH_CONVS = {
    "skip1_conv": "skip1.1",
    "fusion_conv": "block_fusion.2",
    "heat_conv": "heatmap_head.2",
    "kp_conv": "keypoint_head.3",
}


def load_xfeat_checkpoint(path: str) -> dict:
    """Load an upstream ``xfeat.pt`` checkpoint (torch state_dict) and convert
    it to this model's Flax variable tree. The checkpoint is not bundled
    (this environment has no network egress); download from
    github.com/verlab/accelerated_features and pass the local path."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return convert_torch_state_dict({k: v.numpy() for k, v in sd.items()},
                                    strip="net." if any(k.startswith("net.") for k in sd) else "")


def convert_torch_state_dict(state_dict: dict, strip: str = "net.") -> dict:
    """Map an upstream XFeat ``state_dict`` (torch tensors or numpy arrays)
    onto this model's Flax variable tree. Conv kernels transpose
    OIHW -> HWIO; BasicLayer batch-norm running stats map to batch_stats."""

    def get(key):
        v = state_dict[strip + key] if (strip + key) in state_dict else state_dict[key]
        return np.asarray(getattr(v, "numpy", lambda: v)() if hasattr(v, "numpy") else v)

    params: dict = {}
    stats: dict = {}
    for ours, theirs in _TORCH_PREFIXES.items():
        w = get(f"{theirs}.layer.0.weight")  # (O, I, kh, kw)
        params[ours] = {"conv": {"kernel": jnp.asarray(w.transpose(2, 3, 1, 0))}}
        stats[ours] = {
            "bn_mean": jnp.asarray(get(f"{theirs}.layer.1.running_mean")),
            "bn_var": jnp.asarray(get(f"{theirs}.layer.1.running_var")),
        }
    for ours, theirs in _TORCH_CONVS.items():
        w = get(f"{theirs}.weight")
        entry = {"kernel": jnp.asarray(w.transpose(2, 3, 1, 0))}
        if f"{strip}{theirs}.bias" in state_dict or f"{theirs}.bias" in state_dict:
            entry["bias"] = jnp.asarray(get(f"{theirs}.bias"))
        params[ours] = entry
    return {"params": params, "batch_stats": stats}

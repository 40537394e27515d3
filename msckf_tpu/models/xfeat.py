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
*fixed-shape* TPU-friendly ops: softmax + pixel-shuffle keypoint heatmap,
5x5 max-pool NMS as a mask, fixed top-k selection, bilinear descriptor
sampling, L2 normalization.

Pretrained weights convert from the upstream ``xfeat.pt`` state_dict via
``convert_torch_state_dict`` (this environment has no network egress, so the
checkpoint itself must be supplied by the user; random init is used
otherwise, which exercises the identical compute graph).

Conv/BatchNorm conventions: NCHW like upstream (XLA lays out as it pleases);
BatchNorm is affine=False (running stats only at inference); InstanceNorm has
no parameters.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class BasicLayer(nn.Module):
    """Conv2d(bias=False) + BatchNorm(affine=False, eval) + ReLU."""

    out_ch: int
    kernel: int = 3
    stride: int = 1
    padding: int = 1
    dilation: int = 1

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
        mean = self.param_or_zero("bn_mean", x.shape[-1])
        var = self.param_or_one("bn_var", x.shape[-1])
        x = (x - mean) / jnp.sqrt(var + 1e-5)
        return nn.relu(x)

    def param_or_zero(self, name, n):
        return self.variable("batch_stats", name, lambda: jnp.zeros((n,))).value

    def param_or_one(self, name, n):
        return self.variable("batch_stats", name, lambda: jnp.ones((n,))).value


def _bilinear_resize(x, h, w):
    return jax.image.resize(x, (x.shape[0], h, w, x.shape[-1]), method="bilinear")


class XFeatModel(nn.Module):
    """Returns (feats 1/8-res 64ch, keypoint logits 65ch, reliability 1ch)."""

    @nn.compact
    def __call__(self, x):  # (B, H, W, 1), H, W divisible by 32
        # InstanceNorm2d(1): per-image standardization
        mu = jnp.mean(x, axis=(1, 2), keepdims=True)
        var = jnp.var(x, axis=(1, 2), keepdims=True)
        xn = (x - mu) / jnp.sqrt(var + 1e-5)

        # skip1: AvgPool(4,4) + 1x1 conv to 24
        skip = nn.avg_pool(xn, (4, 4), strides=(4, 4))
        skip = nn.Conv(24, (1, 1), use_bias=True, name="skip1_conv")(skip)

        b1 = BasicLayer(4, stride=1, name="block1_0")(xn)
        b1 = BasicLayer(8, stride=2, name="block1_1")(b1)
        b1 = BasicLayer(8, stride=1, name="block1_2")(b1)
        b1 = BasicLayer(24, stride=2, name="block1_3")(b1)

        b2 = BasicLayer(24, stride=1, name="block2_0")(b1 + skip)
        b2 = BasicLayer(24, stride=1, name="block2_1")(b2)

        b3 = BasicLayer(64, stride=2, name="block3_0")(b2)
        b3 = BasicLayer(64, stride=1, name="block3_1")(b3)
        b3 = BasicLayer(64, kernel=1, padding=0, name="block3_2")(b3)

        b4 = BasicLayer(64, stride=2, name="block4_0")(b3)
        b4 = BasicLayer(64, stride=1, name="block4_1")(b4)
        b4 = BasicLayer(64, stride=1, name="block4_2")(b4)

        b5 = BasicLayer(128, stride=2, name="block5_0")(b4)
        b5 = BasicLayer(128, stride=1, name="block5_1")(b5)
        b5 = BasicLayer(128, stride=1, name="block5_2")(b5)
        b5 = BasicLayer(64, kernel=1, padding=0, name="block5_3")(b5)

        h8, w8 = b3.shape[1], b3.shape[2]
        fused = b3 + _bilinear_resize(b4, h8, w8) + _bilinear_resize(b5, h8, w8)
        fused = BasicLayer(64, stride=1, name="fusion_0")(fused)
        fused = BasicLayer(64, stride=1, name="fusion_1")(fused)
        feats = nn.Conv(64, (1, 1), use_bias=True, name="fusion_conv")(fused)

        # heatmap (reliability) head
        hm = BasicLayer(64, kernel=1, padding=0, name="heat_0")(feats)
        hm = BasicLayer(64, kernel=1, padding=0, name="heat_1")(hm)
        hm = nn.Conv(1, (1, 1), use_bias=True, name="heat_conv")(hm)
        heatmap = nn.sigmoid(hm)

        # keypoint head over 8x8-unfolded raw pixels
        B, H, W, _ = xn.shape
        unf = xn.reshape(B, H // 8, 8, W // 8, 8, 1)
        unf = unf.transpose(0, 1, 3, 2, 4, 5).reshape(B, H // 8, W // 8, 64)
        kp = BasicLayer(64, kernel=1, padding=0, name="kp_0")(unf)
        kp = BasicLayer(64, kernel=1, padding=0, name="kp_1")(kp)
        kp = BasicLayer(64, kernel=1, padding=0, name="kp_2")(kp)
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


def _bilinear_sample(grid: jnp.ndarray, xy: jnp.ndarray) -> jnp.ndarray:
    """Sample (H, W, C) at continuous pixel coords xy (N, 2) (x, y order),
    align_corners=False torch grid_sample semantics on the pixel centers."""
    H, W = grid.shape[0], grid.shape[1]
    x = jnp.clip(xy[:, 0], 0.0, W - 1.0)
    y = jnp.clip(xy[:, 1], 0.0, H - 1.0)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, W - 1)
    y1 = jnp.minimum(y0 + 1, H - 1)
    wx = (x - x0)[:, None]
    wy = (y - y0)[:, None]
    v00 = grid[y0, x0]
    v01 = grid[y0, x1]
    v10 = grid[y1, x0]
    v11 = grid[y1, x1]
    return (1 - wy) * ((1 - wx) * v00 + wx * v01) + wy * ((1 - wx) * v10 + wx * v11)


def detect_and_compute(
    params: Any,
    image: jnp.ndarray,  # (H, W) grayscale float in [0, 255] or [0, 1]
    top_k: int = 300,
    nms_threshold: float = 0.05,
    nms_kernel: int = 5,
):
    """Upstream ``XFeat.detectAndCompute`` as fixed-shape XLA ops.

    Returns (keypoints (top_k, 2) xy pixels, descriptors (top_k, 64) L2
    normalized, scores (top_k,), valid (top_k,) bool). Invalid slots carry
    score -1, matching upstream's sentinel.
    """
    H0, W0 = image.shape
    # pad to multiples of 32 (upstream crops; we pad with edge values and
    # mask keypoints to the valid region)
    H = -(-H0 // 32) * 32
    W = -(-W0 // 32) * 32
    img = jnp.pad(image, ((0, H - H0), (0, W - W0)), mode="edge")
    x = img[None, :, :, None].astype(jnp.float32)

    feats, kp_logits, reliability = XFeatModel().apply(params, x)
    feats = feats / jnp.linalg.norm(feats, axis=-1, keepdims=True).clip(1e-12)

    hm = keypoint_heatmap(kp_logits)[0]  # (H, W)
    # 5x5 max-pool NMS as a mask
    local_max = jax.lax.reduce_window(
        hm, -jnp.inf, jax.lax.max,
        (nms_kernel, nms_kernel), (1, 1), "SAME",
    )
    is_peak = (hm == local_max) & (hm > nms_threshold)
    yy, xx = jnp.meshgrid(jnp.arange(H), jnp.arange(W), indexing="ij")
    in_bounds = (xx < W0) & (yy < H0)

    # score at peaks: heatmap * bilinear reliability (upstream scores product)
    rel_up = _bilinear_resize(reliability, H, W)[0, :, :, 0]
    score_map = jnp.where(is_peak & in_bounds, hm * rel_up, -1.0)

    flat = score_map.reshape(-1)
    top_scores, top_idx = jax.lax.top_k(flat, top_k)
    ky = (top_idx // W).astype(jnp.float32)
    kx = (top_idx % W).astype(jnp.float32)
    kpts = jnp.stack([kx, ky], axis=-1)  # (top_k, 2) xy

    # bilinear descriptor sampling at 1/8 resolution
    desc = _bilinear_sample(feats[0], kpts / 8.0)
    desc = desc / jnp.linalg.norm(desc, axis=-1, keepdims=True).clip(1e-12)

    valid = top_scores > 0
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

"""Torch implementation of the upstream XFeat inference spec — parity oracle.

The reference consumes XFeat as an external PyTorch submodule
(`/root/reference/src/msckf/FeatureExtractor.py:13-18,50-60`; upstream
github.com/verlab/accelerated_features, not checked out in the snapshot).
This module re-implements the *upstream semantics* in torch from the
published architecture so the Flax port (`msckf_tpu/models/xfeat.py`) can be
validated numerically: same BasicLayer (Conv bias=False + BatchNorm
affine=False + ReLU), same backbone topology, same `detectAndCompute`
pipeline (softmax+pixel-shuffle keypoint heatmap, 5x5 max-pool NMS,
nearest*bilinear score sampling, bicubic descriptor sampling through
``InterpolateSparse2d``'s align_corners-mixed grid, zeros padding).

It is a test oracle: plain eager torch, no performance concerns. The
state_dict it produces has the exact upstream key layout (``net.block1.0.
layer.0.weight`` ...), so it also exercises ``convert_torch_state_dict``
end-to-end the way a real ``xfeat.pt`` would.
"""

from __future__ import annotations

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F


class BasicLayer(nn.Module):
    """Conv2d(bias=False) -> BatchNorm2d(affine=False) -> ReLU, as upstream."""

    def __init__(self, in_ch, out_ch, kernel_size=3, stride=1, padding=1, dilation=1):
        super().__init__()
        self.layer = nn.Sequential(
            nn.Conv2d(in_ch, out_ch, kernel_size, padding=padding, stride=stride,
                      dilation=dilation, bias=False),
            nn.BatchNorm2d(out_ch, affine=False),
            nn.ReLU(inplace=True),
        )

    def forward(self, x):
        return self.layer(x)


class XFeatModel(nn.Module):
    """Upstream backbone: returns (feats 64ch@1/8, keypoint logits 65ch@1/8,
    reliability 1ch@1/8)."""

    def __init__(self):
        super().__init__()
        self.norm = nn.InstanceNorm2d(1)
        self.skip1 = nn.Sequential(
            nn.AvgPool2d(4, stride=4), nn.Conv2d(1, 24, 1, stride=1, padding=0)
        )
        self.block1 = nn.Sequential(
            BasicLayer(1, 4, stride=1),
            BasicLayer(4, 8, stride=2),
            BasicLayer(8, 8, stride=1),
            BasicLayer(8, 24, stride=2),
        )
        self.block2 = nn.Sequential(
            BasicLayer(24, 24, stride=1), BasicLayer(24, 24, stride=1)
        )
        self.block3 = nn.Sequential(
            BasicLayer(24, 64, stride=2),
            BasicLayer(64, 64, stride=1),
            BasicLayer(64, 64, kernel_size=1, padding=0),
        )
        self.block4 = nn.Sequential(
            BasicLayer(64, 64, stride=2),
            BasicLayer(64, 64, stride=1),
            BasicLayer(64, 64, stride=1),
        )
        self.block5 = nn.Sequential(
            BasicLayer(64, 128, stride=2),
            BasicLayer(128, 128, stride=1),
            BasicLayer(128, 128, stride=1),
            BasicLayer(128, 64, kernel_size=1, padding=0),
        )
        self.block_fusion = nn.Sequential(
            BasicLayer(64, 64, stride=1),
            BasicLayer(64, 64, stride=1),
            nn.Conv2d(64, 64, 1, padding=0),
        )
        self.heatmap_head = nn.Sequential(
            BasicLayer(64, 64, 1, padding=0),
            BasicLayer(64, 64, 1, padding=0),
            nn.Conv2d(64, 1, 1),
            nn.Sigmoid(),
        )
        self.keypoint_head = nn.Sequential(
            BasicLayer(64, 64, 1, padding=0),
            BasicLayer(64, 64, 1, padding=0),
            BasicLayer(64, 64, 1, padding=0),
            nn.Conv2d(64, 65, 1),
        )

    @staticmethod
    def _unfold2d(x, ws=2):
        B, C, H, W = x.shape
        x = x.unfold(2, ws, ws).unfold(3, ws, ws).reshape(B, C, H // ws, W // ws, ws**2)
        return x.permute(0, 1, 4, 2, 3).reshape(B, -1, H // ws, W // ws)

    def forward(self, x):
        with torch.no_grad():
            x = x.mean(dim=1, keepdim=True)
            x = self.norm(x)
        x1 = self.block1(x)
        x2 = self.block2(x1 + self.skip1(x))
        x3 = self.block3(x2)
        x4 = self.block4(x3)
        x5 = self.block5(x4)
        x4 = F.interpolate(x4, (x3.shape[-2], x3.shape[-1]), mode="bilinear")
        x5 = F.interpolate(x5, (x3.shape[-2], x3.shape[-1]), mode="bilinear")
        feats = self.block_fusion(x3 + x4 + x5)
        heatmap = self.heatmap_head(feats)
        keypoints = self.keypoint_head(self._unfold2d(x, ws=8))
        return feats, keypoints, heatmap


class InterpolateSparse2d(nn.Module):
    """Upstream sparse sampler: grid normalized with (W-1, H-1) but
    grid_sample called with align_corners=False and zeros padding — the
    mixed-convention quirk is part of the spec and must be replicated."""

    def __init__(self, mode="bicubic"):
        super().__init__()
        self.mode = mode

    def normgrid(self, x, H, W):
        return (
            2.0 * (x / torch.tensor([[W - 1, H - 1]], dtype=x.dtype, device=x.device))
            - 1.0
        )

    def forward(self, x, pos, H, W):
        grid = self.normgrid(pos, H, W)[:, None, ...].to(x.dtype)
        x = F.grid_sample(x, grid, mode=self.mode, align_corners=False)
        return x.permute(0, 2, 3, 1).squeeze(-3)  # (B, N, C)


class XFeat(nn.Module):
    """Upstream wrapper: detectAndCompute + cosine mutual match."""

    def __init__(self, top_k=4096, seed=0):
        super().__init__()
        torch.manual_seed(seed)
        self.net = XFeatModel().eval()
        # randomize batch-norm stats too: fresh BN has mean 0 / var 1, which
        # would hide running-stat conversion bugs
        g = torch.Generator().manual_seed(seed + 1)
        with torch.no_grad():
            for m in self.net.modules():
                if isinstance(m, nn.BatchNorm2d):
                    m.running_mean.copy_(torch.randn(m.running_mean.shape, generator=g) * 0.1)
                    m.running_var.copy_(torch.rand(m.running_var.shape, generator=g) * 0.5 + 0.75)
            # sharpen the keypoint logits: an untrained 65-way softmax is
            # nearly uniform (~0.015), below the 0.05 NMS threshold, which
            # would leave the detection pipeline untested
            self.net.keypoint_head[3].weight *= 12.0
            self.net.keypoint_head[3].bias *= 12.0
        self.top_k = top_k
        self.interpolator = InterpolateSparse2d("bicubic")

    def preprocess_tensor(self, x):
        if isinstance(x, np.ndarray):
            if x.ndim == 2:
                x = torch.tensor(x)[None, None]
            else:
                x = torch.tensor(x).permute(2, 0, 1)[None]
        x = x.float()
        H, W = x.shape[-2:]
        _H, _W = (H // 32) * 32, (W // 32) * 32
        rh, rw = H / _H, W / _W
        x = F.interpolate(x, (_H, _W), mode="bilinear", align_corners=False)
        return x, rh, rw

    def get_kpts_heatmap(self, kpts, softmax_temp=1.0):
        scores = F.softmax(kpts * softmax_temp, 1)[:, :64]
        B, _, H, W = scores.shape
        heatmap = scores.permute(0, 2, 3, 1).reshape(B, H, W, 8, 8)
        heatmap = heatmap.permute(0, 1, 3, 2, 4).reshape(B, 1, H * 8, W * 8)
        return heatmap

    def NMS(self, x, threshold=0.05, kernel_size=5):
        B, _, H, W = x.shape
        pad = kernel_size // 2
        local_max = nn.MaxPool2d(kernel_size=kernel_size, stride=1, padding=pad)(x)
        pos = (x == local_max) & (x > threshold)
        pos_batched = [k.nonzero()[..., 1:].flip(-1) for k in pos]
        pad_val = max(len(k) for k in pos_batched)
        out = torch.zeros((B, pad_val, 2), dtype=torch.long, device=x.device)
        for b in range(len(pos_batched)):
            out[b, : len(pos_batched[b]), :] = pos_batched[b]
        return out

    @torch.inference_mode()
    def detectAndCompute(self, x, top_k=None):
        if top_k is None:
            top_k = self.top_k
        x, rh1, rw1 = self.preprocess_tensor(x)
        B, _, _H1, _W1 = x.shape
        M1, K1, H1 = self.net(x)
        M1 = F.normalize(M1, dim=1)

        K1h = self.get_kpts_heatmap(K1)
        mkpts = self.NMS(K1h, threshold=0.05, kernel_size=5)

        _nearest = InterpolateSparse2d("nearest")
        _bilinear = InterpolateSparse2d("bilinear")
        scores = (
            _nearest(K1h, mkpts, _H1, _W1) * _bilinear(H1, mkpts, _H1, _W1)
        ).squeeze(-1)
        scores[torch.all(mkpts == 0, dim=-1)] = -1

        idxs = torch.argsort(-scores)
        mkpts_x = torch.gather(mkpts[..., 0], -1, idxs)[:, :top_k]
        mkpts_y = torch.gather(mkpts[..., 1], -1, idxs)[:, :top_k]
        mkpts = torch.cat([mkpts_x[..., None], mkpts_y[..., None]], dim=-1)
        scores = torch.gather(scores, -1, idxs)[:, :top_k]

        feats = self.interpolator(M1, mkpts, H=_H1, W=_W1)
        feats = F.normalize(feats, dim=-1)

        mkpts = mkpts.float() * torch.tensor([rw1, rh1]).view(1, 1, -1)
        valid = scores > 0
        return [
            {
                "keypoints": mkpts[b][valid[b]],
                "scores": scores[b][valid[b]],
                "descriptors": feats[b][valid[b]],
            }
            for b in range(B)
        ]

    @torch.inference_mode()
    def match(self, feats1, feats2, min_cossim=0.82):
        cossim = feats1 @ feats2.t()
        cossim_t = feats2 @ feats1.t()
        _, match12 = cossim.max(dim=1)
        _, match21 = cossim_t.max(dim=1)
        idx0 = torch.arange(len(match12), device=match12.device)
        mutual = match21[match12] == idx0
        if min_cossim > 0:
            cossim_max, _ = cossim.max(dim=1)
            good = cossim_max > min_cossim
            idx0 = idx0[mutual & good]
            idx1 = match12[mutual & good]
        else:
            idx0 = idx0[mutual]
            idx1 = match12[mutual]
        return idx0, idx1

    def upstream_state_dict(self):
        """state_dict with the on-disk ``xfeat.pt`` key layout (net.*)."""
        return {f"net.{k}": v for k, v in self.net.state_dict().items()}

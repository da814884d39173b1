"""CPU torch oracle: an exact structural mirror of the Flax MattingNetwork.

The north-star acceptance criterion is alpha parity to <=1e-3 MAD against the
CPU reference (BASELINE.json:5). The reference tree was empty at build time
(SURVEY.md §0), so this module *is* the CPU reference implementation: the
same architecture in PyTorch/NCHW, numerically pinned to the Flax model via
identical padding, resize, and gate ordering. Weights are shared through
``vidmat.models.weights.flax_to_torch_state``.

Module attribute names intentionally mirror the Flax module names so weight
conversion is purely mechanical (encoder.stem.conv <-> encoder/stem/conv).
"""

from __future__ import annotations

import torch
import torch.nn as nn
import torch.nn.functional as F

from vidmat.config import ModelConfig


def _up2x(x: torch.Tensor) -> torch.Tensor:
    # Matches vidmat.ops.resize.upsample2x (half-pixel, no antialias).
    return F.interpolate(x, scale_factor=2.0, mode="bilinear",
                         align_corners=False)


class TConvBNAct(nn.Module):
    def __init__(self, cin, cout, kernel=3, stride=1, use_bn=True, act=True,
                 bn_eps=1e-5):
        super().__init__()
        self.conv = nn.Conv2d(cin, cout, kernel, stride, padding=kernel // 2,
                              bias=not use_bn)
        self.bn = nn.BatchNorm2d(cout, eps=bn_eps) if use_bn else None
        self.act = act

    def forward(self, x):
        x = self.conv(x)
        if self.bn is not None:
            x = self.bn(x)
        return F.relu(x) if self.act else x


class TConvGRUCell(nn.Module):
    def __init__(self, cin, features):
        super().__init__()
        self.gates = nn.Conv2d(cin + features, 2 * features, 3, padding=1)
        self.cand = nn.Conv2d(cin + features, features, 3, padding=1)
        self.features = features

    def forward(self, x, h):
        rz = torch.sigmoid(self.gates(torch.cat([x, h], dim=1)))
        r, z = torch.split(rz, self.features, dim=1)
        c = torch.tanh(self.cand(torch.cat([x, r * h], dim=1)))
        return (1.0 - z) * h + z * c


class TBottleneckGate(nn.Module):
    def __init__(self, cin, features, bn_eps=1e-5):
        super().__init__()
        self.proj = TConvBNAct(cin, features, kernel=1, bn_eps=bn_eps)
        self.gate = nn.Conv2d(cin, features, 1)

    def forward(self, x):
        a = self.proj(x)
        g = self.gate(x.mean(dim=(2, 3), keepdim=True))
        return a * torch.sigmoid(g)


def _s2d(x: torch.Tensor, r: int) -> torch.Tensor:
    """NCHW space-to-depth with channel order [dy, dx, c] (c fastest) —
    exact mirror of vidmat.models.matting_net.space_to_depth."""
    n, c, h, w = x.shape
    x = x.reshape(n, c, h // r, r, w // r, r)
    x = x.permute(0, 3, 5, 1, 2, 4)
    return x.reshape(n, r * r * c, h // r, w // r)


def _d2s(x: torch.Tensor, r: int) -> torch.Tensor:
    n, c4, h, w = x.shape
    c = c4 // (r * r)
    x = x.reshape(n, r, r, c, h, w)
    x = x.permute(0, 3, 4, 1, 5, 2)
    return x.reshape(n, c, h * r, w * r)


class TEncoder(nn.Module):
    def __init__(self, cfg: ModelConfig):
        super().__init__()
        c = cfg.enc_channels
        e = cfg.bn_eps
        s2 = cfg.space_to_depth
        in_ch = cfg.in_channels * s2 * s2
        self.stem = TConvBNAct(in_ch, c[0], stride=2, bn_eps=e)
        self.s2a = TConvBNAct(c[0], c[1], stride=2, bn_eps=e)
        self.s2b = TConvBNAct(c[1], c[1], bn_eps=e)
        self.s3a = TConvBNAct(c[1], c[2], stride=2, bn_eps=e)
        self.s3b = TConvBNAct(c[2], c[2], bn_eps=e)
        self.s4a = TConvBNAct(c[2], c[3], stride=2, bn_eps=e)
        self.s4b = TConvBNAct(c[3], c[3], bn_eps=e)

    def forward(self, x):
        f1 = self.stem(x)
        f2 = self.s2b(self.s2a(f1))
        f3 = self.s3b(self.s3a(f2))
        f4 = self.s4b(self.s4a(f3))
        return f1, f2, f3, f4


class TDecoderStage(nn.Module):
    def __init__(self, cin, skip, features, recurrent, bn_eps=1e-5):
        super().__init__()
        self.conv = TConvBNAct(cin + skip, features, bn_eps=bn_eps)
        self.recurrent = recurrent
        self.features = features
        if recurrent:
            self.gru = TConvGRUCell(features // 2, features // 2)

    def forward(self, x, skip, h):
        x = self.conv(torch.cat([_up2x(x), skip], dim=1))
        if not self.recurrent:
            return x, None
        a, b = torch.split(x, self.features // 2, dim=1)
        if h is None:
            h = torch.zeros_like(b)
        h_new = self.gru(b, h)
        return torch.cat([a, h_new], dim=1), h_new


class TorchMattingNetwork(nn.Module):
    """NCHW mirror of vidmat.models.matting_net.MattingNetwork (eval-only)."""

    def __init__(self, cfg: ModelConfig = ModelConfig()):
        super().__init__()
        self.cfg = cfg
        c, d, e = cfg.enc_channels, cfg.dec_channels, cfg.bn_eps
        self.encoder = TEncoder(cfg)
        self.bottleneck = TBottleneckGate(c[3], c[3], bn_eps=e)
        self.d3 = TDecoderStage(c[3], c[2], d[0], cfg.recurrent, e)
        self.d2 = TDecoderStage(d[0], c[1], d[1], cfg.recurrent, e)
        self.d1 = TDecoderStage(d[1], c[0], d[2], cfg.recurrent, e)
        s2 = cfg.space_to_depth
        cond_ch = cfg.in_channels * s2 * s2 if s2 > 1 else 3
        self.d0 = TConvBNAct(d[2] + cond_ch, d[3], bn_eps=e)
        self.head = nn.Conv2d(d[3], 4 * s2 * s2, 3, padding=1)

    @torch.no_grad()
    def forward(self, frame, state=None):
        """frame: (N, C, H, W) in [0,1]; state: (h3, h2, h1) NCHW or None."""
        rgb = frame[:, :3]
        s2 = self.cfg.space_to_depth
        x_in = _s2d(frame, s2) if s2 > 1 else frame
        f1, f2, f3, f4 = self.encoder(x_in)
        b4 = self.bottleneck(f4)
        h3, h2, h1 = state if state is not None else (None, None, None)
        x, n3 = self.d3(b4, f3, h3)
        x, n2 = self.d2(x, f2, h2)
        x, n1 = self.d1(x, f1, h1)
        cond = _s2d(frame, s2) if s2 > 1 else rgb
        x = self.d0(torch.cat([_up2x(x), cond], dim=1))
        out = self.head(x)
        if s2 > 1:
            out = _d2s(out, s2)
        alpha = out[:, 0:1].clamp(0.0, 1.0)
        fgr = (out[:, 1:4] + rgb).clamp(0.0, 1.0)
        if self.cfg.use_trimap and frame.shape[1] >= 4:
            tri = frame[:, 3:4]
            alpha = torch.where(tri >= 0.75, torch.ones_like(alpha),
                                torch.where(tri <= 0.25,
                                            torch.zeros_like(alpha), alpha))
        return alpha, fgr, (n3, n2, n1)


class TErrorMapRefiner(nn.Module):
    """NCHW mirror of vidmat.refine.errormap.ErrorMapRefiner (module names
    match for the mechanical weight bridge)."""

    def __init__(self, num_patches=64, patch_size=16, features=24,
                 bn_eps=1e-5):
        super().__init__()
        self.k = num_patches
        self.p = patch_size
        # error_head: c1 (ConvBNAct 4->16) + c2 (conv 16->1)
        self.error_head = nn.Module()
        self.error_head.c1 = TConvBNAct(4, 16, bn_eps=bn_eps)
        self.error_head.c2 = nn.Conv2d(16, 1, 3, padding=1)
        # refine_net: c1..c3 ConvBNAct + head conv
        self.refine_net = nn.Module()
        self.refine_net.c1 = TConvBNAct(4, features, bn_eps=bn_eps)
        self.refine_net.c2 = TConvBNAct(features, features, bn_eps=bn_eps)
        self.refine_net.c3 = TConvBNAct(features, features, bn_eps=bn_eps)
        self.refine_net.head = nn.Conv2d(features, 1, 3, padding=1)

    @torch.no_grad()
    def forward(self, rgb_full, rgb_lr, alpha_lr):
        import numpy as np

        n, _, hf, wf = rgb_full.shape
        p, k = self.p, self.k
        x = torch.cat([rgb_lr, alpha_lr], dim=1)
        err = F.relu(self.error_head.c2(self.error_head.c1(x)))
        alpha_up = F.interpolate(alpha_lr, size=(hf, wf), mode="bilinear",
                                 align_corners=False)
        gh, gw = hf // p, wf // p
        err_grid = F.interpolate(err, size=(gh, gw), mode="bilinear",
                                 align_corners=False)
        flat = err_grid.reshape(n, gh * gw)
        _, idx = torch.topk(flat, k, dim=1)
        py = (idx // gw) * p
        px = (idx % gw) * p

        src = torch.cat([rgb_full, alpha_up], dim=1)
        patches = []
        for b in range(n):
            for i in range(k):
                y, xx = int(py[b, i]), int(px[b, i])
                patches.append(src[b:b + 1, :, y:y + p, xx:xx + p])
        patches = torch.cat(patches, dim=0)
        r = self.refine_net
        res = r.head(r.c3(r.c2(r.c1(patches)))).reshape(n, k, 1, p, p)

        band = max(2, p // 8)
        ramp = np.ones(p, np.float32)
        e = np.linspace(1.0 / (band + 1), 1.0, band, dtype=np.float32)
        ramp[:band] = e
        ramp[-band:] = e[::-1]
        feather = torch.from_numpy(ramp[:, None] * ramp[None, :])

        alpha = alpha_up.clone()
        for b in range(n):
            for i in range(k):
                y, xx = int(py[b, i]), int(px[b, i])
                alpha[b, 0, y:y + p, xx:xx + p] = (
                    alpha[b, 0, y:y + p, xx:xx + p] + res[b, i, 0] * feather)
        return alpha.clamp(0.0, 1.0), err

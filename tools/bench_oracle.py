"""Reference-style CPU pipeline throughput — the measured baseline row.

The reference tree is empty (SURVEY.md §0), so the reference itself cannot
be timed. The closest honest stand-in is the framework's own torch CPU
oracle (vidmat/models/torch_oracle.py — the parity-pinned NCHW mirror of
the matting network) embedded in the per-frame loop SURVEY.md §3.2
reconstructs for the reference: host preprocessing (resize + normalize),
torch forward at the coarse downsample ratio with recurrent state carried
frame to frame, fast-guided-filter refinement back to full resolution,
composite over a background — every stage materialized on host, one frame
at a time, exactly the shape of a CPU research pipeline.

Output: one JSON line {fps, ms_per_frame, ...} for the BASELINE.md
"reference-equivalent CPU implementation" row, so the rebuild's
vs-baseline ratio is a measurement rather than only the >200 fps target.

Usage: python tools/bench_oracle.py [--frames N] [--size HxW] [--ratio R]
       [--threads T]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import torch  # noqa: E402
import torch.nn.functional as F  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _box_filter(x: torch.Tensor, r: int) -> torch.Tensor:
    """Edge-count-normalized box mean over the last two dims (NCHW),
    the torch mirror of vidmat.ops.guided_filter._box_filter."""
    csum = torch.cumsum(x, dim=2)
    pad = torch.zeros_like(csum[:, :, :1])
    csum = torch.cat([pad, csum], dim=2)
    h = x.shape[2]
    lo = torch.clamp(torch.arange(h) - r, min=0)
    hi = torch.clamp(torch.arange(h) + r + 1, max=h)
    out = csum[:, :, hi] - csum[:, :, lo]
    cnt_h = (hi - lo).to(x.dtype).view(1, 1, h, 1)

    csum = torch.cumsum(out, dim=3)
    pad = torch.zeros_like(csum[:, :, :, :1])
    csum = torch.cat([pad, csum], dim=3)
    w = x.shape[3]
    lo = torch.clamp(torch.arange(w) - r, min=0)
    hi = torch.clamp(torch.arange(w) + r + 1, max=w)
    out = csum[:, :, :, hi] - csum[:, :, :, lo]
    cnt_w = (hi - lo).to(x.dtype).view(1, 1, 1, w)
    return out / (cnt_h * cnt_w)


@torch.no_grad()
def guided_upsample_torch(rgb_full: torch.Tensor, alpha_lr: torch.Tensor,
                          fgr_lr: torch.Tensor, radius: int = 4,
                          eps: float = 1e-4):
    """Fast guided filter (He & Sun 2015): stats at coarse res, bilinear
    coefficient upsample, full-res multiply-add — the same structure as
    vidmat.ops.guided_filter.guided_upsample, in torch on CPU."""
    n, _, h, w = rgb_full.shape
    hl, wl = alpha_lr.shape[2:]
    lum = torch.tensor([0.299, 0.587, 0.114]).view(1, 3, 1, 1)
    guide_full = (rgb_full * lum).sum(dim=1, keepdim=True)
    I = F.interpolate(guide_full, (hl, wl), mode="bilinear",
                      align_corners=False)
    p = torch.cat([alpha_lr, fgr_lr], dim=1)

    mean_I = _box_filter(I, radius)
    mean_p = _box_filter(p, radius)
    mean_Ip = _box_filter(I * p, radius)
    var_I = _box_filter(I * I, radius) - mean_I * mean_I
    cov_Ip = mean_Ip - mean_I * mean_p
    a = cov_Ip / (var_I + eps)
    b = mean_p - a * mean_I

    a_full = F.interpolate(a, (h, w), mode="bilinear", align_corners=False)
    b_full = F.interpolate(b, (h, w), mode="bilinear", align_corners=False)
    out = a_full * guide_full + b_full
    return out[:, 0:1].clamp(0, 1), out[:, 1:4].clamp(0, 1)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=24)
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--size", default="1080x1920")
    ap.add_argument("--ratio", type=float, default=0.25)
    ap.add_argument("--threads", type=int, default=0,
                    help="torch intraop threads (0 = torch default)")
    args = ap.parse_args()
    if args.threads:
        torch.set_num_threads(args.threads)
    h, w = (int(v) for v in args.size.split("x"))

    from vidmat.ops.resize import downsample_ratio_shape

    hl, wl = downsample_ratio_shape(h, w, args.ratio)
    # space_to_depth models need the coarse grid padded to 16*s2d
    # (mirrors pipeline/stepfactory.py); the net runs padded, outputs
    # are cropped back before refinement.
    mult = 32
    ph, pw = -hl % mult, -wl % mult

    from vidmat.config import ModelConfig
    from vidmat.models.torch_oracle import TorchMattingNetwork
    from vidmat.models.weights import (init_params, load_checkpoint,
                                       load_into_torch)

    # The serving-preset model family (video_1080p: s2d=2), shipped weights.
    cfg = ModelConfig(space_to_depth=2)
    net = TorchMattingNetwork(cfg)
    ckpt = os.path.join(REPO, "checkpoints", "fast_demo")
    variables = load_checkpoint(ckpt, template=init_params(cfg))
    load_into_torch(net, variables)

    rng = np.random.RandomState(0)
    frames = rng.randint(0, 255, (args.warmup + args.frames, h, w, 3),
                         np.uint8)
    bg = torch.tensor([0.2, 0.5, 0.2]).view(1, 3, 1, 1)

    state = None
    times = []
    for i in range(frames.shape[0]):
        t0 = time.perf_counter()
        # Host preprocess: uint8 HWC -> float NCHW in [0,1], coarse resize.
        x = torch.from_numpy(frames[i]).permute(2, 0, 1)[None].float() / 255.0
        x_lr = F.interpolate(x, (hl, wl), mode="area")
        if ph or pw:
            x_lr = F.pad(x_lr, (0, pw, 0, ph))
        # Recurrent coarse forward (torch CPU).
        alpha_lr, fgr_lr, state = net(x_lr, state)
        alpha_lr, fgr_lr = alpha_lr[..., :hl, :wl], fgr_lr[..., :hl, :wl]
        # Full-res refine + composite, all on host.
        alpha, fgr = guided_upsample_torch(x, alpha_lr, fgr_lr)
        comp = alpha * fgr + (1.0 - alpha) * bg
        out = (torch.cat([comp, alpha], dim=1).clamp(0, 1) * 255.0
               ).to(torch.uint8).permute(0, 2, 3, 1).numpy()
        assert out.shape == (1, h, w, 4)
        if i >= args.warmup:
            times.append(time.perf_counter() - t0)

    ms = 1e3 * float(np.median(times))
    fps = 1e3 / ms
    print(json.dumps({
        "metric": "cpu_oracle_fps", "value": round(fps, 2), "unit": "fps",
        "ms_per_frame_p50": round(ms, 1),
        "ms_per_frame_mean": round(1e3 * float(np.mean(times)), 1),
        "size": f"{h}x{w}", "ratio": args.ratio,
        "threads": torch.get_num_threads(), "frames": args.frames,
        "note": "torch CPU oracle in a reference-shaped per-frame loop "
                "(SURVEY.md §3.2); the BASELINE.md CPU baseline row",
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())

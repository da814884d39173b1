"""Error-map refinement: prove it or retire it (VERDICT r4 item 3).

The error-map patch path (BGMv2 lineage, BASELINE.json:5 "error-map
upsampling") had exactly one quality datapoint: beats plain bilinear on
one easy 128 px frame. This tool evaluates it where patch refinement
exists to matter — hair-filament HARD content at 1080p-class resolution
— against the production guided tail and the bilinear floor, on the
full frame AND in the unknown band (the alphamatting.com/DIM region
protocol, vidmat.eval.trimap_unknown_region).

All three tails consume the SAME coarse net outputs (same weights, same
recurrent trajectory — the serving body is rebuilt per mode but steps
the same frames), so the comparison isolates the refinement stage.

Run (TPU or CPU): python tools/eval_errormap.py [--size 1088x1920]
    [--frames 6] [--seeds 987654 24680] [--ckpt synthetic_demo]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="1088x1920")
    ap.add_argument("--frames", type=int, default=6)
    ap.add_argument("--seeds", type=int, nargs="+",
                    default=[987654, 24680])
    ap.add_argument("--ckpt", default="synthetic_demo")
    ap.add_argument("--ratio", type=float, default=0.25)
    ap.add_argument("--hard2", action="store_true",
                    help="use the extended HARD2 protocol (motion blur, "
                         "exposure drift, JPEG) on top of the hair/"
                         "occluder/pan/noise base")
    ap.add_argument("--platform", default="",
                    help="'cpu' to force CPU; default ambient (TPU)")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    import numpy as np

    from vidmat.config import ModelConfig, RefineConfig
    from vidmat.eval.metrics import (_frame_metrics, _frame_metrics_region,
                                     trimap_unknown_region)
    from vidmat.io.fixtures import HARD2, synthetic_hard_clip
    from vidmat.train.data import alpha_to_trimap
    from vidmat.models.matting_net import MattingNetwork
    from vidmat.models.weights import init_params, load_checkpoint
    from vidmat.pipeline.stepfactory import build_serving_body
    from vidmat.pipeline.video import _load_default_refiner
    from vidmat.refine.errormap import ErrorMapRefiner

    h, w = (int(v) for v in args.size.split("x"))
    cfg = ModelConfig()
    net = MattingNetwork(cfg)
    v = load_checkpoint(os.path.join(REPO, "checkpoints", args.ckpt),
                        template=init_params(cfg))
    rcfg = RefineConfig()
    # Clamp the patch budget to the frame's patch grid (small smoke sizes).
    n_patches = min(rcfg.errormap_patches,
                    (h // rcfg.errormap_patch_size)
                    * (w // rcfg.errormap_patch_size) // 2)
    rcfg = RefineConfig(errormap_patches=n_patches,
                        errormap_patch_size=rcfg.errormap_patch_size)
    refiner = ErrorMapRefiner(num_patches=rcfg.errormap_patches,
                              patch_size=rcfg.errormap_patch_size)
    net_h = int(h * args.ratio)
    refiner_vars = _load_default_refiner(refiner, h, w, net_h,
                                         int(w * args.ratio))

    bodies = {}
    for mode, kw in (("guided", {}),
                     ("errormap", dict(refiner=(refiner, refiner_vars))),
                     ("bilinear", {})):
        rc = RefineConfig(mode="none" if mode == "bilinear" else mode,
                          errormap_patches=rcfg.errormap_patches,
                          errormap_patch_size=rcfg.errormap_patch_size)
        body, plan = build_serving_body(
            net, cfg, rc, h, w, args.ratio, cdtype=jnp.float32, bg=None,
            use_pallas=False, float_output=True, **kw)
        bodies[mode] = (jax.jit(body), plan)

    fkw = dict(HARD2) if args.hard2 else {}
    acc = {m: {"mad": [], "grad": [], "mad_unk": [], "grad_unk": []}
           for m in bodies}
    for seed in args.seeds:
        states = {m: plan.make_state(1) for m, (_, plan) in bodies.items()}
        for frame, gt in synthetic_hard_clip(h, w, args.frames,
                                             seed=seed, **fkw):
            f = jnp.asarray(frame)[None]
            gt_j = jnp.asarray(gt[..., 0])
            region = jnp.asarray(trimap_unknown_region(
                alpha_to_trimap(gt[..., 0])).astype(np.float32))
            for m, (body, plan) in bodies.items():
                (alpha, _), states[m] = body(v, f, states[m])
                a2 = alpha[0, ..., 0]
                full = _frame_metrics(a2, gt_j)
                unk = _frame_metrics_region(a2, gt_j, region)
                acc[m]["mad"].append(float(full["mad"]))
                acc[m]["grad"].append(float(full["grad"]))
                acc[m]["mad_unk"].append(float(unk["mad"]))
                acc[m]["grad_unk"].append(float(unk["grad"]))

    report = {"size": args.size, "ratio": args.ratio, "ckpt": args.ckpt,
              "hard2": bool(args.hard2),
              "frames": args.frames * len(args.seeds)}
    for m in bodies:
        report[m] = {k: round(float(np.mean(vs)), 5)
                     for k, vs in acc[m].items()}
    print(json.dumps(report, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())

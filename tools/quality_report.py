"""Quality report: score every shipped checkpoint with the full matting
metric set (vidmat.eval) on held-out synthetic clips.

Writes a markdown table (docs/QUALITY.md with --write) so the shipped
weights' quality is recorded in the literature's units — MAD/MSE ×1e3,
SAD/Grad/Conn /1e3, dtSSD ×1e2 — not just the pass/fail MAD gates in
tests/integration/test_quality.py.

Held-out protocol: fixture seeds never used in training
(vidmat/train/data.py trains on seeds derived from the step counter;
the seeds here match the quality tests' held-out convention).

Usage: python tools/quality_report.py [--write] [--frames N] [--size HxW]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
HELD_OUT_SEEDS = (987654, 24680, 1357911)


def _cfgs():
    from vidmat.config import ModelConfig

    return {
        "synthetic_demo": ModelConfig(),
        "fast_demo": ModelConfig(space_to_depth=2),
        "trimap_demo": ModelConfig(recurrent=False, use_trimap=True),
        "trimap_prop_demo": ModelConfig(use_trimap=True, space_to_depth=2),
        "plate_demo": ModelConfig(use_bg_plate=True, space_to_depth=2),
        "seg_demo": ModelConfig(),  # co-trained (matting metrics here;
        #                             IoU gated in test_seg_serving)
    }


class _LazyCfgs:
    def __getitem__(self, k):
        return _cfgs()[k]


CFGS = _LazyCfgs()


def eval_hard(name: str, *, frames: int, h: int, w: int) -> dict:
    """EXTENDED hard-suite metrics (MAD + Grad + dtSSD — VERDICT r4
    item 4) under the family's protocol: io/fixtures.synthetic_hard_clip
    with the canonical HARD2 octave-two knobs (panning multi-octave bg,
    hair filaments, occluder, sensor noise, shutter motion blur,
    exposure drift, JPEG round-trip). The plate family runs the HARD
    clean-plate fixture (synthetic_hard_plate_clip + HARD_PLATE —
    camouflaged subject+filaments, camera-drift plate misregistration)."""
    from vidmat.api import MattingSession
    from vidmat.eval import VideoEval
    from vidmat.io.fixtures import (HARD2, HARD_PLATE,
                                    synthetic_hard_clip,
                                    synthetic_hard_plate_clip)
    from vidmat.models.weights import init_params, load_checkpoint
    from vidmat.pipeline.stepper import ImageStepper
    from vidmat.train.data import alpha_to_trimap

    cfg = CFGS[name]
    variables = load_checkpoint(
        os.path.join(REPO, "checkpoints", name),
        template=init_params(cfg, with_seg=(name == "seg_demo")))
    ev = VideoEval(metrics=("mad", "grad", "dtssd"))
    for seed in HELD_OUT_SEEDS:
        if cfg.use_bg_plate:
            clip = list(synthetic_hard_plate_clip(h, w, frames, seed=seed,
                                                  **HARD_PLATE))
            sess = MattingSession(h, w, model_cfg=cfg, variables=variables,
                                  bg_plate=clip[0][2])
            for f, gt, _ in clip:
                ev.update(sess.step(f)[0], gt)
        elif cfg.use_trimap and not cfg.recurrent:
            stepper = ImageStepper(cfg, variables=variables)
            for f, gt in synthetic_hard_clip(h, w, frames, seed=seed,
                                             **HARD2):
                ev.update(stepper(f, alpha_to_trimap(gt[..., 0]))[0], gt)
        else:
            sess = MattingSession(h, w, model_cfg=cfg, variables=variables)
            for i, (f, gt) in enumerate(
                    synthetic_hard_clip(h, w, frames, seed=seed, **HARD2)):
                tri = (alpha_to_trimap(gt[..., 0])
                       if cfg.use_trimap and i == 0 else None)
                ev.update(sess.step(f, trimap=tri)[0], gt)
        ev.reset_temporal()
    return ev.summary()


def eval_checkpoint(name: str, *, frames: int, h: int, w: int) -> dict:
    """Run the serving session for one shipped checkpoint over held-out
    clips and return the scaled metric summary."""
    import jax

    jax.config.update("jax_platforms", "cpu")

    from vidmat.api import MattingSession
    from vidmat.config import ModelConfig
    from vidmat.eval import VideoEval
    from vidmat.io.fixtures import synthetic_clip
    from vidmat.models.weights import init_params, load_checkpoint
    from vidmat.pipeline.stepper import ImageStepper
    from vidmat.train.data import alpha_to_trimap

    cfg = CFGS[name]
    variables = load_checkpoint(
        os.path.join(REPO, "checkpoints", name),
        template=init_params(cfg, with_seg=(name == "seg_demo")))
    ev = VideoEval(metrics=("mad", "mse", "sad", "grad", "conn", "dtssd"))
    for seed in HELD_OUT_SEEDS:
        if cfg.use_bg_plate:
            # Clean-plate protocol: CAMOUFLAGED clips (the disk is filled
            # with offset background texture — only the plate can find it)
            # with the TRUE plate conditioning the session.
            from vidmat.io.fixtures import synthetic_plate_clip

            clip = list(synthetic_plate_clip(h, w, frames, seed=seed))
            sess = MattingSession(h, w, model_cfg=cfg, variables=variables,
                                  bg_plate=clip[0][2])
            for frame, gt, _ in clip:
                alpha, _ = sess.step(frame)
                ev.update(alpha, gt)
        elif cfg.use_trimap and cfg.recurrent:
            # PROPAGATION protocol: gt-derived trimap on frame 0 ONLY;
            # later frames auto-fill all-unknown and the GRU carries the
            # keyframe constraint forward (the family's serving mode).
            sess = MattingSession(h, w, model_cfg=cfg, variables=variables)
            for i, (frame, gt) in enumerate(
                    synthetic_clip(h, w, frames, seed=seed)):
                tri = alpha_to_trimap(gt[..., 0]) if i == 0 else None
                alpha, _ = sess.step(frame, trimap=tri)
                ev.update(alpha, gt)
        elif cfg.use_trimap:
            # Trimap protocol: the trimap is an input, derived from gt
            # alpha per frame (the PR1 image rung; model is non-recurrent).
            stepper = ImageStepper(cfg, variables=variables)
            for frame, gt in synthetic_clip(h, w, frames, seed=seed):
                alpha, _ = stepper(frame, alpha_to_trimap(gt[..., 0]))
                ev.update(alpha, gt)
        else:
            sess = MattingSession(h, w, model_cfg=cfg, variables=variables)
            for frame, gt in synthetic_clip(h, w, frames, seed=seed):
                alpha, _ = sess.step(frame)
                ev.update(alpha, gt)
        ev.reset_temporal()  # don't score the clip-boundary cut
    return ev.summary()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--write", action="store_true",
                    help="write docs/QUALITY.md")
    ap.add_argument("--frames", type=int, default=12)
    ap.add_argument("--size", default="96x96")
    args = ap.parse_args()
    h, w = (int(v) for v in args.size.split("x"))

    rows = []
    for name in ("synthetic_demo", "fast_demo", "trimap_demo",
                 "trimap_prop_demo", "plate_demo", "seg_demo"):
        if not os.path.isdir(os.path.join(REPO, "checkpoints", name)):
            print(f"skip {name}: checkpoint not present", file=sys.stderr)
            continue
        s = eval_checkpoint(name, frames=args.frames, h=h, w=w)
        s["hard"] = eval_hard(name, frames=args.frames, h=h, w=w)
        rows.append((name, s))
        print(name, json.dumps(s))

    header = (
        "# Shipped-checkpoint quality (vidmat.eval, literature units)\n\n"
        f"Held-out synthetic clips (seeds {HELD_OUT_SEEDS}, "
        f"{len(HELD_OUT_SEEDS)}×{args.frames} frames @ {h}×{w}; "
        "fixture protocol of tests/integration/test_quality.py; every "
        "family reports under this ONE common protocol). "
        "Units: MAD/MSE ×1e3, SAD/Grad/Conn /1e3, dtSSD ×1e2 — "
        "lower is better everywhere. **h*** = the EXTENDED hard held-out "
        "suite (panning multi-octave background, hair-filament strands, "
        "sweeping occluder, sensor noise, PLUS octave two: shutter "
        "motion blur, exposure drift, JPEG round-trip — "
        "io/fixtures.synthetic_hard_clip **HARD2**; the plate family "
        "runs the hard CLEAN-PLATE fixture instead: camouflaged "
        "disk+filaments, camera-drift plate misregistration — "
        "synthetic_hard_plate_clip **HARD_PLATE**). Regenerate: "
        "`python tools/quality_report.py --write`.\n\n"
        "| checkpoint | model | MAD | MSE | SAD | Grad | Conn | dtSSD "
        "| hMAD | hGrad | hdtSSD |\n"
        "|---|---|---|---|---|---|---|---|---|---|---|\n")
    desc = {"synthetic_demo": "base (s2d=1, recurrent; r5 octave-two "
                              "hard fine-tune)",
            "fast_demo": "serving (s2d=2, recurrent; r5 octave-two "
                         "hard fine-tune)",
            "trimap_demo": "trimap-conditioned (PR1, non-recurrent; r4 "
                           "mixed-res + ambiguous-twin retrain)",
            "trimap_prop_demo": "keyframe trimap propagation "
                                "(s2d=2, recurrent; trimap on frame 0 "
                                "only; r4 hard-content fine-tune)",
            "plate_demo": "clean-plate conditioned (s2d=2, recurrent; "
                          "CAMOUFLAGED clips + true plate — only the "
                          "plate can find the subject; r5 full retrain "
                          "w/ hard-plate mixing, 19.4 -> 7.4)",
            "seg_demo": "base + co-trained seg head (matting metrics "
                        "here; mask IoU gated >=0.95 in "
                        "test_seg_serving)"}
    lines = []
    for name, s in rows:
        dt = f"{s['dtssd']:.2f}" if "dtssd" in s else "—"
        hd = s["hard"]
        lines.append(
            f"| `{name}` | {desc[name]} | {s['mad']:.2f} | {s['mse']:.3f} "
            f"| {s['sad']:.3f} | {s['grad']:.3f} | {s['conn']:.4f} "
            f"| {dt} | {hd['mad']:.1f} | {hd['grad']:.3f} "
            f"| {hd['dtssd']:.2f} |")
    text = header + "\n".join(lines) + "\n"
    print("\n" + text)
    if args.write:
        out = os.path.join(REPO, "docs", "QUALITY.md")
        with open(out, "w") as f:
            f.write(text)
        print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

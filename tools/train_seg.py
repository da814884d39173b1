"""Co-train the segmentation head -> checkpoints/seg_demo.

RVM-lineage co-training (SURVEY.md §1.1 [DOMAIN]; matting_net.seg_pass):
graft the 1-channel ``seg_head`` onto the shipped matting checkpoint
(matting-neutral at graft time), then interleave matting batches (exact
synthetic alpha) with segmentation batches (binary masks) through the
shared trunk. The shipped artifact backs the segmentation inference
surfaces (MattingSession(output='seg'), convert_video(
output_segmentation=...)), gated on held-out mask IoU AND non-regressed
matting MAD (tests/integration/test_quality.py seg gate).

Run: python tools/train_seg.py --steps 1500 --out checkpoints/seg_demo
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

if "--platform" not in " ".join(sys.argv):
    os.environ.setdefault("JAX_PLATFORMS", "cpu")


def evaluate_seg(cfg, variables, size: int = 96, hard: bool = False):
    """Held-out (IoU, matting MAD) through the PUBLIC surfaces: the seg
    session (output='seg') vs the binarized subject coverage, and the
    matting session vs exact alpha — co-training must add segmentation
    without costing the matte. hard=True scores the EXTENDED hard suite
    (io/fixtures HARD2) instead of the plain fixture."""
    import numpy as np

    from vidmat.api import MattingSession
    from vidmat.io.fixtures import HARD2, synthetic_clip, synthetic_hard_clip
    from vidmat.utils.metrics import mad

    seg = MattingSession(size, size, variables=variables, model_cfg=cfg,
                         output="seg")
    mat = MattingSession(size, size, variables=variables, model_cfg=cfg)
    clip = (synthetic_hard_clip(size, size, 8, seed=987654, **HARD2)
            if hard else synthetic_clip(size, size, 8, seed=987654))
    ious, mads = [], []
    for f, gt in clip:
        mask, _ = seg.step(f)
        pred = mask[..., 0] > 0.5
        gtb = gt[..., 0] > 0.5
        ious.append((pred & gtb).sum() / max((pred | gtb).sum(), 1))
        mads.append(mad(mat.step(f)[0], gt))
    return float(np.mean(ious)), float(np.mean(mads))


def main():
    import jax

    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--clip-len", type=int, default=2)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--seg-every", type=int, default=2)
    ap.add_argument("--trunk-lr-scale", type=float, default=0.0,
                    help="with --head-only: >0 lets the TRUNK move at "
                         "lr*scale (asymmetric co-train) — the last IoU "
                         "points need slight trunk adjustment; the tiny "
                         "LR bounds matting drift and the selection "
                         "score guards the bargain")
    ap.add_argument("--head-only", type=int, default=0,
                    help="1: fit ONLY the seg_head on a frozen trunk "
                         "(optax.masked grads + restored BN stats): the "
                         "matting weights stay BIT-IDENTICAL to "
                         "--init-from, and the head learns from the "
                         "trunk the matting task already trained. The "
                         "full RVM-style trunk co-training stays "
                         "available via --head-only 0 / train "
                         "--seg-every.")
    ap.add_argument("--eval-every", type=int, default=250)
    ap.add_argument("--hard", type=float, default=0.0,
                    help="fraction of clips (matting AND seg batches) "
                         "from the HARD fixture; hard IoU + hard matting "
                         "MAD join the held-out report and selection")
    ap.add_argument("--octave2", type=float, default=0.0,
                    help="fraction of HARD clips also carrying shutter "
                         "blur / exposure drift / JPEG")
    ap.add_argument("--sizes", type=int, nargs="+", default=None,
                    help="mixed-resolution round-robin (one compiled "
                         "step per size)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--init-from", default="checkpoints/synthetic_demo")
    ap.add_argument("--out", default="checkpoints/seg_demo")
    ap.add_argument("--platform", default="cpu")
    args = ap.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_compilation_cache_dir",
                      os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))) + "/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print(json.dumps({"backend": jax.default_backend()}), flush=True)

    import jax.numpy as jnp
    import optax

    from vidmat.config import ModelConfig
    from vidmat.models.weights import (graft_seg_params, init_params,
                                       load_checkpoint, save_checkpoint)
    from vidmat.train.data import (synthetic_clip_batches,
                                   synthetic_hard_clip_batches,
                                   synthetic_seg_batches)
    from vidmat.train.loop import (TrainState, make_seg_train_step,
                                   make_train_step)

    cfg = ModelConfig()
    try:
        # continuation from an already co-trained checkpoint
        variables = load_checkpoint(
            os.path.abspath(args.init_from),
            template=init_params(cfg, seed=args.seed, with_seg=True))
    except Exception:
        # matting-only checkpoint: graft a fresh (matting-neutral) head
        variables = graft_seg_params(
            load_checkpoint(os.path.abspath(args.init_from),
                            template=init_params(cfg, seed=args.seed)),
            cfg, seed=args.seed)

    warmup = max(1, args.steps // 20)
    sched = optax.warmup_cosine_decay_schedule(
        0.0, args.lr, warmup, args.steps, end_value=args.lr * 1e-2)
    opt = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(sched))
    if args.head_only:
        # multi_transform + set_to_zero, NOT optax.masked: masked passes
        # the raw gradients through for masked-out leaves (they would be
        # applied unscaled by apply_updates — measured catastrophic).
        if args.trunk_lr_scale > 0:
            tsched = optax.warmup_cosine_decay_schedule(
                0.0, args.lr * args.trunk_lr_scale, warmup, args.steps,
                end_value=args.lr * args.trunk_lr_scale * 1e-2)
            trunk_opt = optax.chain(optax.clip_by_global_norm(1.0),
                                    optax.adam(tsched))
        else:
            trunk_opt = optax.set_to_zero()
        opt = optax.multi_transform(
            {"head": opt, "freeze": trunk_opt},
            lambda params: jax.tree_util.tree_map_with_path(
                lambda path, _: ("head" if path[0].key == "seg_head"
                                 else "freeze"), params))
    bn0 = variables["batch_stats"]
    step_fn = make_train_step(cfg, optimizer=opt)
    # head-only: frozen running stats — the head trains against exactly
    # the activations inference produces (batch stats on the tiny
    # co-training batches are a noisy moving target).
    seg_fn = make_seg_train_step(cfg, optimizer=opt,
                                 bn_train=not args.head_only)
    state = TrainState(variables=variables,
                       opt_state=opt.init(variables["params"]), step=0)

    sizes = args.sizes or [args.size]
    mat_its = [synthetic_clip_batches(t=args.clip_len, n=args.batch,
                                      h=s, w=s, seed=args.seed + 31 * k)
               for k, s in enumerate(sizes)]
    hard_its = ([synthetic_hard_clip_batches(
        t=args.clip_len, n=args.batch, h=s, w=s,
        seed=args.seed + 31 * k, octave2=args.octave2)
        for k, s in enumerate(sizes)] if args.hard > 0 else None)
    seg_its = [synthetic_seg_batches(t=args.clip_len, n=args.batch,
                                     h=s, w=s, seed=args.seed + 17 + 31 * k,
                                     hard=args.hard, octave2=args.octave2)
               for k, s in enumerate(sizes)]
    import numpy as _np

    hrng = _np.random.RandomState(args.seed + 5)
    best = float("inf")
    t0 = time.time()
    for i in range(args.steps):
        k = i % len(sizes)  # round-robin over sizes
        if args.head_only or (args.seg_every > 0
                              and i % args.seg_every == args.seg_every - 1):
            clips, gt_mask = next(seg_its[k])
            state, metrics = seg_fn(state, jnp.asarray(clips),
                                    jnp.asarray(gt_mask))
            if args.head_only:
                # frozen trunk: masked grads already pin the weights;
                # restoring the BN running stats pins the whole matting
                # forward bit-identically to --init-from
                state = TrainState(
                    variables={"params": state.variables["params"],
                               "batch_stats": bn0},
                    opt_state=state.opt_state, step=state.step)
        else:
            src = (hard_its if hard_its is not None
                   and hrng.rand() < args.hard else mat_its)
            clips, gt_a, gt_f = next(src[k])
            state, metrics = step_fn(state, jnp.asarray(clips),
                                     jnp.asarray(gt_a), jnp.asarray(gt_f))
        if (i + 1) % args.eval_every == 0 or i + 1 == args.steps:
            iou, mad_ = evaluate_seg(cfg, state.variables)
            rec = {"step": i + 1,
                   "loss": round(float(metrics["loss"]), 5),
                   "heldout_iou": round(iou, 5),
                   "heldout_mad": round(mad_, 5),
                   "wall_s": round(time.time() - t0, 1)}
            # both capabilities in one score: IoU shortfall + matting MAD
            # (same [0, 1] scale; 1-iou dominates until seg works)
            score = (1.0 - iou) + 10.0 * mad_
            if args.hard > 0:
                hiou, hmad = evaluate_seg(cfg, state.variables, hard=True)
                rec["heldout_hard_iou"] = round(hiou, 5)
                rec["heldout_hard_mad"] = round(hmad, 5)
                score += (1.0 - hiou) + 10.0 * hmad
            print(json.dumps(rec), flush=True)
            if score < best:
                best = score
                save_checkpoint(os.path.abspath(args.out), state.variables)
                print(f"saved {args.out} (score {best:.5f})", flush=True)
    print(json.dumps({"final_best_score": round(best, 5)}))


if __name__ == "__main__":
    main()

"""Train a model variant on synthetic clips and track held-out MAD.

The round-1 s2d=2 recipe gap (STATUS.md): after the BN fix the s2d variant
trains but plateaued ~40x worse than base. Two recipe changes tested here:
  - train at a resolution where the PACKED feature grids match what the
    base model sees (s2d=2 at 64x64 leaves 2x2 stride-16 maps; 128x128
    restores them);
  - cosine LR decay over the full horizon instead of constant LR.

Held-out gate = tests/integration/test_quality.py::
test_fast_s2d_checkpoint_quality (160x160 clip, seed 987654).

Run: python tools/train_eval.py --s2d 2 --size 128 --steps 4000 \
         --out checkpoints/fast_demo
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

# CPU by default (deterministic, no chip contention); pass --platform=
# to train on the ambient backend (e.g. the TPU tunnel — the tiny
# synthetic batches still step ~10x faster there than on CPU).
if "--platform" not in " ".join(sys.argv):
    os.environ.setdefault("JAX_PLATFORMS", "cpu")


def evaluate(cfg, variables) -> float:
    """Held-out mean MAD — mirrors test_fast_s2d_checkpoint_quality."""
    import numpy as np

    from vidmat.api import MattingSession
    from vidmat.io.fixtures import synthetic_clip
    from vidmat.utils.metrics import mad

    sess = MattingSession(160, 160, variables=variables, model_cfg=cfg)
    mads = [mad(sess.step(f)[0], gt)
            for f, gt in synthetic_clip(160, 160, 6, seed=987654)]
    return float(np.mean(mads))


def main():
    import jax

    ap = argparse.ArgumentParser()
    ap.add_argument("--s2d", type=int, default=2)
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--sizes", type=int, nargs="+", default=None,
                    help="mixed-resolution training: round-robin over "
                         "these sizes (one compiled step per size; the "
                         "round-1 mixed-res trick gave 3x better off-res "
                         "MAD)")
    ap.add_argument("--clip-len", type=int, default=4)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--steps", type=int, default=4000)
    ap.add_argument("--lr", type=float, default=2e-4)
    ap.add_argument("--warmup", type=int, default=100)
    ap.add_argument("--eval-every", type=int, default=500)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--init-from", default=None,
                    help="checkpoint to fine-tune from")
    ap.add_argument("--laplacian", type=float, default=0.0,
                    help="Laplacian-pyramid alpha loss weight")
    ap.add_argument("--out", default="checkpoints/fast_demo")
    ap.add_argument("--platform", default="cpu",
                    help="'cpu' (default) or '' to use the ambient "
                         "backend (TPU tunnel)")
    args = ap.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_compilation_cache_dir",
                      os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))) + "/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print(json.dumps({"backend": jax.default_backend()}), flush=True)

    import optax

    from vidmat.config import ModelConfig
    from vidmat.models.weights import init_params, save_checkpoint
    from vidmat.train.data import synthetic_clip_batches
    from vidmat.train.loop import TrainState, make_train_step

    cfg = ModelConfig(space_to_depth=args.s2d)
    warmup = min(args.warmup, max(1, args.steps // 10))
    sched = optax.warmup_cosine_decay_schedule(
        0.0, args.lr, warmup, args.steps, end_value=args.lr * 1e-2)
    opt = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(sched))
    step_fn = make_train_step(cfg, optimizer=opt,
                              laplacian_weight=args.laplacian)

    variables = init_params(cfg, seed=args.seed,
                            height=args.size, width=args.size)
    if args.init_from:
        from vidmat.models.weights import load_checkpoint

        variables = load_checkpoint(os.path.abspath(args.init_from),
                                    template=variables)
    state = TrainState(variables=variables, opt_state=opt.init(
        variables["params"]), step=0)
    sizes = args.sizes or [args.size]
    iters = [synthetic_clip_batches(t=args.clip_len, n=args.batch,
                                    h=s, w=s, seed=args.seed + 31 * k)
             for k, s in enumerate(sizes)]

    def data():
        i = 0
        while True:
            yield next(iters[i % len(iters)])  # round-robin over sizes
            i += 1

    best = float("inf")
    t0 = time.time()
    for i, (clips, gt_a, gt_f) in enumerate(data()):
        if i >= args.steps:
            break
        state, metrics = step_fn(state, clips, gt_a, gt_f)
        if (i + 1) % args.eval_every == 0 or i + 1 == args.steps:
            heldout = evaluate(cfg, state.variables)
            print(json.dumps({
                "step": i + 1, "loss": round(float(metrics["loss"]), 5),
                "heldout_mad": round(heldout, 5),
                "wall_s": round(time.time() - t0, 1)}), flush=True)
            if heldout < best:
                best = heldout
                save_checkpoint(os.path.abspath(args.out), state.variables)
                print(f"saved {args.out} (mad {best:.5f})", flush=True)
    print(json.dumps({"final_best_heldout_mad": round(best, 5)}))


if __name__ == "__main__":
    main()

"""Measure the planar pair-fusion win: net forward with encoder-stage +
d0/head pairs fused into planar_conv2 kernels vs the two-call chain.

Round 2 judged the d0+head fusion a traffic WASH from cost_analysis
(docs/PERFORMANCE.md); this tool measures WALL CLOCK, which also counts
the per-kernel fixed overhead (~5-9 us/call at the coarse serving grids,
where each planar conv runs 3-4x over its byte roofline) — the term
cost_analysis cannot see. Fusion removes 4 kernel launches per step
(s2a+s2b, s3a+s3b, s4a+s4b, d0+head).

Methodology matches tools/bench_pp_stages.py: chained lax.scan over the
recurrent state, jax.block_until_ready on a chain-dependent device value
(no D2H), amortized (T_long - T_short) medians.
"""

import argparse
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="tiny shapes (CPU/debug, interpret off only on TPU)")
    ap.add_argument("--preset", default="video_1080p",
                    choices=["video_1080p", "clip_480p"])
    ap.add_argument("--repeats", type=int, default=9)
    ap.add_argument("--short", type=int, default=16)
    ap.add_argument("--long", type=int, default=64)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      __file__.rsplit("/", 2)[0] + "/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from vidmat.config import PRESETS
    from vidmat.models.planar import build_planar_forward, planar_init_state
    from vidmat.models.weights import init_params

    cfg, pcfg = PRESETS[args.preset]()
    # The grid build_serving_body feeds the net: the 1080p preset's coarse
    # grid (1088x1920 @ ds=0.25, snapped + padded to 16*s2d), or the 480p
    # preset's full-res grid.
    if args.quick:
        h, w = 96, 128
    elif args.preset == "clip_480p":
        h, w = 480, 864
    else:
        h, w = 288, 480
    interp = jax.default_backend() != "tpu"
    variables = init_params(cfg)
    variables = jax.tree_util.tree_map(jnp.asarray, variables)

    frames = jnp.asarray(
        np.random.RandomState(0).rand(8, 1, h, w, 3).astype(np.float32))

    st0 = planar_init_state(cfg, h, w, jnp.bfloat16)
    built = {}
    for name, fuse in (("fused", True), ("two-call", False)):
        fwd = build_planar_forward(cfg, h, w, dtype=jnp.bfloat16,
                                   interpret=interp, fuse_pairs=fuse)

        def chain(variables, frames, st, n, fwd=fwd):
            def sbody(s, i):
                _, _, ns = fwd(variables, frames[i % 8], s)
                return ns, ()
            ns, _ = jax.lax.scan(sbody, st, jnp.arange(n))
            return ns

        jits = {n: jax.jit(lambda v, f, s, n=n, ch=chain: ch(v, f, s, n))
                for n in (args.short, args.long)}
        for n, fn in jits.items():
            jax.block_until_ready(fn(variables, frames, st0))  # compile
        built[name] = jits

    # Interleave variants round-robin per repeat: the tunnel drifts on a
    # minutes scale, and block-sequential variant timing can fabricate
    # ratios (docs/PERFORMANCE.md measurement notes).
    samples = {name: [] for name in built}
    for _ in range(args.repeats):
        for name, jits in built.items():
            ts = {}
            for n, fn in jits.items():
                t0 = time.perf_counter()
                jax.block_until_ready(fn(variables, frames, st0))
                ts[n] = time.perf_counter() - t0
            d = (ts[args.long] - ts[args.short]) / (args.long - args.short)
            if d > 0:
                samples[name].append(d * 1e3)
    results = {}
    for name, s in samples.items():
        med = statistics.median(s)
        results[name] = med
        print(f"{name:9s} net-forward: {med:.4f} ms/frame "
              f"(n={len(s)}, spread {min(s):.4f}-{max(s):.4f})")

    speedup = results["two-call"] / results["fused"]
    print(f"pair-fusion speedup: {speedup:.3f}x")


if __name__ == "__main__":
    main()

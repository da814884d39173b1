"""Measure planar Pallas conv vs XLA conv on TPU at real serving shapes.

Shapes = the s2d=2 1080p serving net's hottest levels (144x240 packed grid).
Timing per docs/PERFORMANCE.md methodology: chained steps, one D2H sync,
amortized (T_long - T_short) / (N_long - N_short), median of repeats
(block_until_ready is unreliable over the dev tunnel).

Run: python tools/bench_planar.py [--dtype bf16|f32]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def bench_net(recurrent=True):
    """Time the NET forward alone (no refine tail): XLA vs planar, bf16,
    the real 1080p serving shape (288x480 frame, s2d=2)."""
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      __file__.rsplit("/", 2)[0] + "/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from vidmat.config import ModelConfig
    from vidmat.models.matting_net import MattingNetwork, init_state
    from vidmat.models.planar import build_planar_forward, planar_init_state
    from vidmat.models.weights import init_params

    cfg = ModelConfig(space_to_depth=2, recurrent=recurrent)
    H, W = 288, 480
    variables = init_params(cfg)
    net = MattingNetwork(cfg, dtype=jnp.bfloat16)
    fwd = build_planar_forward(cfg, H, W, dtype=jnp.bfloat16)
    rng = np.random.RandomState(0)
    frame = jnp.asarray(rng.rand(1, H, W, 3).astype(np.float32))

    def chain(stepfn, state0, n):
        st = state0
        a = None
        t0 = time.perf_counter()
        for _ in range(n):
            a, f, st = stepfn(variables, frame, st)
        np.asarray(a[0, :2, :2])
        if st is not None:
            jax.block_until_ready(st)
        return time.perf_counter() - t0

    for name, stepfn, st0 in [
            ("xla   ", jax.jit(net.apply),
             init_state(cfg, 1, H, W, jnp.bfloat16) if recurrent else None),
            ("planar", jax.jit(fwd),
             planar_init_state(cfg, H, W, jnp.bfloat16) if recurrent
             else None)]:
        chain(stepfn, st0, 3)
        vals = []
        for _ in range(5):
            ts = chain(stepfn, st0, 10)
            tl = chain(stepfn, st0, 60)
            vals.append((tl - ts) / 50)
        ms = float(np.median(vals)) * 1e3
        print(f"net fwd {name} recurrent={recurrent}: {ms:.3f} ms",
              flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
    ap.add_argument("--netfwd", action="store_true",
                    help="time the net forward alone (XLA vs planar)")
    args = ap.parse_args()
    if args.netfwd:
        bench_net(recurrent=True)
        bench_net(recurrent=False)
        return

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      __file__.rsplit("/", 2)[0] + "/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from vidmat.ops.pallas.planar import (conv3x3_taps, conv_tap_weights,
                                          interior_mask, planar_conv,
                                          to_planar)

    dt = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    print(f"device: {jax.devices()[0]}, dtype {args.dtype}", flush=True)

    def timed_chain(fn, x0, n):
        x = x0
        t0 = time.perf_counter()
        for _ in range(n):
            x = fn(x)
        np.asarray(jax.tree_util.tree_leaves(x)[0][:1])
        return time.perf_counter() - t0

    def amortized(fn, x0, n_long=60, n_short=10, reps=3):
        timed_chain(fn, x0, 3)  # warm
        vals = []
        for _ in range(reps):
            ts = timed_chain(fn, x0, n_short)
            tl = timed_chain(fn, x0, n_long)
            vals.append((tl - ts) / (n_long - n_short))
        return float(np.median(vals)) * 1e3  # ms

    rng = np.random.RandomState(0)
    DEPTH = 30  # layers fused per jit call — amortizes per-call dispatch
    for (h, w, c) in [(144, 240, 36), (144, 240, 16), (72, 120, 40)]:
        # same-shape conv chain C->C so layers compose
        k = jnp.asarray(rng.randn(3, 3, c, c).astype(np.float32) * 0.05)
        x_nhwc = jnp.asarray(rng.rand(1, h, w, c).astype(np.float32),
                             dtype=dt)

        kx = k.astype(dt)

        @jax.jit
        def xla_chain(x, kx=kx):
            for _ in range(DEPTH):
                x = jax.lax.conv_general_dilated(
                    x, kx, (1, 1), ((1, 1), (1, 1)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                x = jnp.maximum(x, 0.0)
            return x

        ms_xla = amortized(xla_chain, x_nhwc, 90, 15, reps=5) / DEPTH

        taps = conv_tap_weights(k, dtype=dt)
        taps_s = conv3x3_taps(w)
        scale = jnp.ones((c, 1), jnp.float32)
        bias = jnp.zeros((c, 1), jnp.float32)
        mask = interior_mask(h, w)
        xp = to_planar(x_nhwc)

        @jax.jit
        def pal_chain(x, taps=taps, taps_s=taps_s, h=h, w=w):
            # zero glue: kernel outputs chain directly
            for _ in range(DEPTH):
                x = planar_conv([x], [taps], taps_s, scale, bias, mask,
                                act="relu")
            return x

        ms_pal = amortized(pal_chain, xp, 90, 15, reps=5) / DEPTH

        # HBM bytes from the compiler's own accounting (per layer)
        try:
            ca_x = xla_chain.lower(x_nhwc).compile().cost_analysis()
            ca_p = pal_chain.lower(xp).compile().cost_analysis()
            bx = ca_x.get("bytes accessed", float("nan")) / 1e6 / DEPTH
            bp = ca_p.get("bytes accessed", float("nan")) / 1e6 / DEPTH
        except Exception:
            bx = bp = float("nan")
        print(f"{h}x{w}x{c}->{c}: XLA {ms_xla:.4f} ms ({bx:.1f} MB) | "
              f"planar {ms_pal:.4f} ms ({bp:.1f} MB) | "
              f"speedup {ms_xla / ms_pal:.2f}x  [per layer]", flush=True)


if __name__ == "__main__":
    main()



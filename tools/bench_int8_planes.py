"""Probe: would int8-STORED activation planes speed up the planar net?

The multistream rung is the one traffic-bound rung (8 frames/dispatch
amortizes both the dispatch floor and per-kernel overheads), and the net
forward moves ~165 MB/frame of bf16 planes. int8 storage halves that —
IF the in-kernel dequant (int8 -> bf16, a (32,128)->(16,128) retiling)
does not eat the saving, the way explicit bf16 matmul-operand casts did
(docs/PERFORMANCE.md round-3 MXU-dtype wash).

This probe times a 24-layer chain of 3x3 planar convs at the 1080p
serving level-0 grid (144x240, 16ch), vmapped over an 8-stream batch:
  A) production planar_conv, bf16 planes (the shipped path)
  B) an int8-plane variant: loads int8, dequantizes to bf16 with a
     per-plane scale, same tap matmuls, requantizes the output to int8
Chained same-window paired timing, D2H sync (stateless kernels).
"""

import argparse
import functools
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeats", type=int, default=9)
    ap.add_argument("--short", type=int, default=4)
    ap.add_argument("--long", type=int, default=24)
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      __file__.rsplit("/", 2)[0] + "/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from vidmat.ops.pallas.planar import (BLOCK, conv3x3_taps,
                                          interior_mask, plane_sizes,
                                          planar_conv, taps_align,
                                          _tap_accum, _load_window)

    h, w, c = 144, 240, 16
    _, _, total = plane_sizes(h, w)
    taps = conv3x3_taps(w)
    align = taps_align(taps)
    rng = np.random.RandomState(0)
    wts = jnp.asarray(rng.randn(9, c, c).astype(np.float32) * 0.2
                      ).astype(jnp.bfloat16)
    mask = interior_mask(h, w)
    scale = jnp.ones((c, 1), jnp.float32)
    bias = jnp.zeros((c, 1), jnp.float32)

    def int8_kernel(x_ref, w_ref, mask_ref, out_ref, *, q):
        i = pl.program_id(0)
        margin = jnp.logical_or(i == 0, i == pl.num_programs(0) - 1)

        @pl.when(margin)
        def _():
            out_ref[...] = jnp.zeros_like(out_ref)

        @pl.when(jnp.logical_not(margin))
        def _():
            win = _load_window(x_ref, i * BLOCK, align, BLOCK)
            xb = (win.astype(jnp.bfloat16) * jnp.bfloat16(1.0 / q))
            acc = _tap_accum(xb, w_ref[...], taps, align, BLOCK)
            acc = jnp.maximum(acc, 0.0) * mask_ref[...]
            out_ref[...] = jnp.clip(jnp.round(acc * q), -127, 127
                                    ).astype(jnp.int8)

    full = pl.BlockSpec(memory_space=pltpu.VMEM)

    def int8_conv(xp):
        return pl.pallas_call(
            functools.partial(int8_kernel, q=64.0),
            grid=(total // BLOCK,),
            out_shape=jax.ShapeDtypeStruct((c, total), jnp.int8),
            in_specs=[full, full,
                      pl.BlockSpec((1, BLOCK), lambda i: (0, i),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((c, BLOCK), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
        )(xp, wts, mask)

    def bf16_conv(xp):
        return planar_conv([xp], [wts], taps, scale, bias, mask)

    x0 = rng.randn(args.batch, c, total).astype(np.float32) * 0.5

    def chain(step, n, x):
        @jax.jit
        def run(x):
            def body(s, _):
                return jax.vmap(step)(s), ()
            s, _ = jax.lax.scan(body, x, None, length=n)
            return s
        return run

    variants = {
        "bf16-planes": (bf16_conv, jnp.asarray(x0, jnp.bfloat16)),
        "int8-planes": (int8_conv,
                        jnp.clip(jnp.round(jnp.asarray(x0) * 64), -127, 127
                                 ).astype(jnp.int8)),
    }
    # Interleave the variants' samples round-robin: the tunnel's timing
    # drifts on a minutes scale, so block-sequential variant timing can
    # fabricate large ratios (docs/PERFORMANCE.md measurement notes).
    built = {}
    for name, (step, x) in variants.items():
        fs = chain(step, args.short, x)
        fl = chain(step, args.long, x)
        import jax as _jax
        _jax.block_until_ready(fs(x)); _jax.block_until_ready(fl(x))
        built[name] = (fs, fl, x)
    samples = {name: [] for name in variants}
    for _ in range(args.repeats):
        for name, (fs, fl, x) in built.items():
            import jax as _jax
            t0 = time.perf_counter(); _jax.block_until_ready(fs(x))
            ts = time.perf_counter() - t0
            t0 = time.perf_counter(); _jax.block_until_ready(fl(x))
            tl = time.perf_counter() - t0
            d = (tl - ts) / (args.long - args.short)
            if d > 0:
                samples[name].append(d * 1e3)
    for name, s in samples.items():
        print(f"{name}: {statistics.median(s):.4f} ms/layer-batch "
              f"(n={len(s)}, {min(s):.4f}-{max(s):.4f})")


if __name__ == "__main__":
    main()

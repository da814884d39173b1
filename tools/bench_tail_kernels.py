"""Measure the MXU-dtype variants of the serving tail kernels on TPU:

  - fused_refine_composite with mxu in {f32, split, bf16} — the upsample
    dots are ~18 GFLOP/frame at 1080p and Mosaic lowers f32 matmuls as
    exact multi-pass f32 (the round-3 smoke run was bit-exact vs
    interpret, which single-pass bf16 truncation could not be);
  - the ingest kernel's pooling matmuls, f32 vs the bit-exact bf16
    hi/lo-split formulation (~5 GFLOP/frame at 1080p pool=4).

Methodology: chained lax.scan with a 1-bit output->input dependency (the
kernels are stateless), jax.block_until_ready sync (no D2H), amortized
(T_long - T_short) medians — docs/PERFORMANCE.md round-3 chain-timing
note.
"""

import argparse
import functools
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def _amortize(fn_short, fn_long, n_short, n_long, repeats):
    """Amortized per-iteration chain timing with a REAL D2H sync of the
    chain-dependent output (block_until_ready does not reliably wait on
    the dev tunnel for these stateless-kernel chains — the first cut of
    this tool measured 0.0006 ms/frame 'refine' with mostly-negative
    samples). The D2H cost appears in both chain lengths and cancels in
    the subtraction."""
    samples = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        np.asarray(fn_short())
        ts = time.perf_counter() - t0
        t0 = time.perf_counter()
        np.asarray(fn_long())
        tl = time.perf_counter() - t0
        d = (tl - ts) / (n_long - n_short)
        if d > 0:
            samples.append(d * 1e3)
    return samples


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", default="1080p", choices=["1080p", "4k"])
    ap.add_argument("--repeats", type=int, default=11)
    ap.add_argument("--short", type=int, default=16)
    ap.add_argument("--long", type=int, default=144)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      __file__.rsplit("/", 2)[0] + "/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from vidmat.ops.pallas.refine_kernel import fused_refine_composite

    if args.res == "4k":
        h, w, pool = 2176, 3840, 8
    else:
        h, w, pool = 1088, 1920, 4
    hl, wl = h // pool, w // pool
    rng = np.random.RandomState(0)
    frame = jnp.asarray(rng.randint(0, 255, (1, h, w, 3), np.uint8))
    a = jnp.asarray(rng.uniform(-1, 1, (1, hl, wl, 4)).astype(np.float32))
    b = jnp.asarray(rng.uniform(-0.5, 1, (1, hl, wl, 4)).astype(np.float32))

    def refine_chain(n, mxu):
        @jax.jit
        def run(frame, a, b):
            def body(f, _):
                out = fused_refine_composite(f, a, b, None, pool=pool,
                                             mxu=mxu)
                f2 = f ^ (out[..., None] & 1).astype(jnp.uint8)
                return f2, ()
            f, _ = jax.lax.scan(body, frame, None, length=n)
            return f
        return run

    print(f"== fused_refine_composite {h}x{w} pool={pool} ==")
    for mxu in ("f32", "split", "bf16"):
        fs = refine_chain(args.short, mxu)
        fl = refine_chain(args.long, mxu)
        jax.block_until_ready(fs(frame, a, b))
        jax.block_until_ready(fl(frame, a, b))
        s = _amortize(lambda: fs(frame, a, b), lambda: fl(frame, a, b),
                      args.short, args.long, args.repeats)
        print(f"  mxu={mxu:5s}: {statistics.median(s):.4f} ms/frame "
              f"(n={len(s)}, {min(s):.4f}-{max(s):.4f})")

    from vidmat.ops.pallas.ingest_kernel import _ingest_call

    params = jnp.stack([jnp.full((3,), 1 / 255.0, jnp.float32),
                        jnp.zeros((3,), jnp.float32)])
    img = jnp.asarray(rng.randint(0, 255, (3, h, w), np.uint8))

    def ingest_chain(n, mxu_bf16):
        @jax.jit
        def run(img):
            def body(im, _):
                out = _ingest_call(im, params, pool, jnp.bfloat16,
                                   mxu_bf16=mxu_bf16)
                bit = (out[:, :1, :1] > 0.5).astype(jnp.uint8)
                im2 = im ^ jnp.pad(bit, ((0, 0), (0, h - 1), (0, w - 1)))
                return im2, ()
            im, _ = jax.lax.scan(body, img, None, length=n)
            return im
        return run

    print(f"== ingest pool={pool} {h}x{w} ==")
    for mxu_bf16 in (False, True):
        fs = ingest_chain(args.short, mxu_bf16)
        fl = ingest_chain(args.long, mxu_bf16)
        jax.block_until_ready(fs(img))
        jax.block_until_ready(fl(img))
        s = _amortize(lambda: fs(img), lambda: fl(img),
                      args.short, args.long, args.repeats)
        name = "bf16-exact" if mxu_bf16 else "f32"
        print(f"  {name:10s}: {statistics.median(s):.4f} ms/frame "
              f"(n={len(s)}, {min(s):.4f}-{max(s):.4f})")


if __name__ == "__main__":
    main()

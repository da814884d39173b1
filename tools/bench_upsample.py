"""Compare 2x bilinear upsample implementations on planar (C, H, W) grids.

The planar decoder's upsample glue (models/planar.py upsample2x_grid) uses
jax.image.resize; the repo's standing lesson is that XLA glue (gathers,
strided lane ops) can dominate kernel time on TPU. Candidate replacement:
banded 0/1-weight selection matmuls U_h @ g @ U_w^T (2 nonzeros per output
row: the half-pixel-center bilinear weights), which ride the MXU like the
ingest pooling matmuls.

Chain-amortized timing (docs/PERFORMANCE.md methodology).
"""

import argparse
import functools
import json
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def up_matrix(h: int) -> np.ndarray:
    """(2h, h) bilinear 2x upsample matrix, half-pixel centers, edge clamp
    — identical sampling to jax.image.resize(method='bilinear',
    antialias=False) for a 2x scale."""
    m = np.zeros((2 * h, h), np.float32)
    for o in range(2 * h):
        src = (o + 0.5) / 2.0 - 0.5
        i0 = int(np.floor(src))
        f = src - i0
        i0c = min(max(i0, 0), h - 1)
        i1c = min(max(i0 + 1, 0), h - 1)
        m[o, i0c] += 1.0 - f
        m[o, i1c] += f
    return m


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--c", type=int, default=40)
    ap.add_argument("--h", type=int, default=72)
    ap.add_argument("--w", type=int, default=120)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--chain", type=int, default=60)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      __file__.rsplit("/", 2)[0] + "/.jax_cache")
    dt = jnp.dtype(args.dtype)
    c, h, w = args.c, args.h, args.w
    uh = jnp.asarray(up_matrix(h), dt)
    uw = jnp.asarray(up_matrix(w), dt)

    def up_resize(g):
        return jax.image.resize(g, (c, 2 * h, 2 * w), method="bilinear",
                                antialias=False)

    def up_matmul(g):
        return jnp.einsum("Hh,chw,Ww->cHW", uh, g, uw,
                          preferred_element_type=jnp.float32).astype(dt)

    x0 = jnp.asarray(np.random.rand(c, h, w), dt)

    # correctness first
    a = np.asarray(up_resize(x0.astype(jnp.float32)))
    b = np.asarray(up_matmul(x0.astype(jnp.float32)).astype(jnp.float32))
    mad = float(np.mean(np.abs(a - b)))
    print(json.dumps({"impl_mad": mad}), flush=True)

    for name, fn in [("resize", up_resize), ("matmul", up_matmul)]:
        @jax.jit
        def chain(x, n, fn=fn):
            def body(i, x):
                y = fn(x)
                return y[:, :h, :w] * 0.5 + x * 0.5
            return jax.lax.fori_loop(0, n, body, x)

        def run(n):
            t0 = time.perf_counter()
            np.asarray(chain(x0, n))
            return time.perf_counter() - t0

        run(2)
        short, long_ = args.chain // 4, args.chain
        ts = sorted(run(short) for _ in range(3))[1]
        tl = sorted(run(long_) for _ in range(3))[1]
        ms = (tl - ts) / (long_ - short) * 1e3
        print(json.dumps({"impl": name, "shape": [c, h, w],
                          "dtype": args.dtype, "ms": round(ms, 4)}),
              flush=True)


if __name__ == "__main__":
    main()

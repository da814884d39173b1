"""Sweep the planar lane-chunk size (VIDMAT_PLANAR_BLOCK).

The int8-plane probe pinned the serving-grid conv layers at ~3x their
byte roofline with byte count NOT the binding constraint (int8 storage
was a wash) — per-program overhead is. A bigger chunk means fewer grid
programs per kernel (144x240x16: 12 -> 7 -> 5 incl. 2 margins) at the
cost of margin-write waste and VMEM.

Runs each BLOCK value in a SUBPROCESS (the constant feeds plane_sizes /
margins / state layouts at import time) timing the same 200-layer-delta
chained conv as tools/bench_int8_planes.py, batch 8, block-only sync.
"""

import os
import subprocess
import sys

_CHILD = r"""
import os, sys, time, statistics
sys.path.insert(0, %(root)r)
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", %(root)r + "/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
from vidmat.ops.pallas.planar import (BLOCK, conv3x3_taps, interior_mask,
                                      plane_sizes, planar_conv)

h, w, c = 144, 240, 16
_, _, total = plane_sizes(h, w)
taps = conv3x3_taps(w)
rng = np.random.RandomState(0)
wts = jnp.asarray(rng.randn(9, c, c).astype(np.float32) * 0.2
                  ).astype(jnp.bfloat16)
mask = interior_mask(h, w)
scale = jnp.ones((c, 1), jnp.float32)
bias = jnp.zeros((c, 1), jnp.float32)

def step(xp):
    return planar_conv([xp], [wts], taps, scale, bias, mask)

x = jnp.asarray(rng.randn(8, c, total).astype(np.float32) * 0.5,
                jnp.bfloat16)

def chain(n):
    @jax.jit
    def run(x):
        def body(s, _):
            return jax.vmap(step)(s), ()
        s, _ = jax.lax.scan(body, x, None, length=n)
        return s
    return run

short, long_, reps = 8, 208, 9
fs, fl = chain(short), chain(long_)
jax.block_until_ready(fs(x)); jax.block_until_ready(fl(x))
samples = []
for _ in range(reps):
    t0 = time.perf_counter(); jax.block_until_ready(fs(x))
    ts = time.perf_counter() - t0
    t0 = time.perf_counter(); jax.block_until_ready(fl(x))
    tl = time.perf_counter() - t0
    d = (tl - ts) / (long_ - short)
    if d > 0:
        samples.append(d * 1e3)
print("BLOCK=%%d grid=%%d: %%0.4f ms/layer-batch (n=%%d, %%0.4f-%%0.4f)"
      %% (BLOCK, total // BLOCK, statistics.median(samples), len(samples),
         min(samples), max(samples)))
"""


def main() -> None:
    root = __file__.rsplit("/", 2)[0]
    blocks = sys.argv[1:] or ["4096", "8192", "16384"]
    child = _CHILD % {"root": root}
    for blk in blocks:
        env = dict(os.environ, VIDMAT_PLANAR_BLOCK=blk)
        r = subprocess.run([sys.executable, "-c", child], env=env,
                           capture_output=True, text=True, timeout=1600)
        out = (r.stdout + r.stderr).strip().splitlines()
        print("\n".join(ln for ln in out
                        if "BLOCK=" in ln or "Error" in ln or r.returncode))


if __name__ == "__main__":
    main()

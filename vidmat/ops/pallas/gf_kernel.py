"""Fused guided-filter statistics kernel.

Computes the per-pixel affine coefficients (mean_a, mean_b) of the fast
guided filter in ONE kernel at coarse resolution: all four box-filter
passes, the covariance algebra, and the edge-truncation normalization stay
in VMEM — the XLA fallback materializes ~10 intermediate HBM tensors for
the same math (SURVEY.md §2: "Alpha refinement — guided filter ... Pallas
(box-filter passes fused)").

Box sums are banded matmuls (B_h @ x @ B_w with |i-j| <= r bands) — the
MXU-idiomatic formulation; edge truncation divides by the separable
valid-count outer product computed from iota in-register.

One program computes all p-channels (alpha + 3 fgr): the guide's own
statistics are computed once and shared across the channel loop (the
round-1 per-channel grid recomputed them 4x — ~25% of the MACs — to
avoid an HBM round trip; a single program shares them in VMEM and also
saves 3 program launches).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _banded(n: int, r: int) -> jax.Array:
    """Banded 0/1 matrix B[i, j] = |i - j| <= r, built from iota in-register.

    Box filtering as a banded matmul (B @ x @ B') is the MXU-idiomatic form:
    rolls/shifts lower to VPU relayouts and large mask temporaries (which
    blew the 16MB VMEM budget in the shift-based variant); a banded matmul
    needs one small constant matrix per axis and one temporary."""
    i = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    return (jnp.abs(i - j) <= r).astype(jnp.float32)


def _box_sum_mm(x: jax.Array, bh: jax.Array, bw: jax.Array) -> jax.Array:
    """Edge-zero 2D box sum via banded matmuls: bh @ x @ bw."""
    return jnp.dot(jnp.dot(bh, x, preferred_element_type=jnp.float32), bw,
                   preferred_element_type=jnp.float32)


def _count_norm(h: int, w: int, r: int) -> jax.Array:
    """Valid-pixel count per window: separable outer product (in-register)."""
    ri = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    ch = (jnp.minimum(ri + r, h - 1) - jnp.maximum(ri - r, 0) + 1)
    cw = (jnp.minimum(ci + r, w - 1) - jnp.maximum(ci - r, 0) + 1)
    return (ch * cw).astype(jnp.float32)


def _gf_kernel(guide_ref, p_ref, mean_a_ref, mean_b_ref, *, radius: int,
               eps: float):
    """All p-channels in ONE program: the guide's own statistics (mean_I,
    var_I — 2 of the 6 box sums per channel) are computed once and shared
    across the channel loop, instead of once per channel-program (the
    round-1 grid recomputed them 4x: ~25% of the kernel's MACs). The
    resident set is ~(1 + 3C) planes — _shared_fits guards it and large
    grids fall back to the per-channel variant below."""
    I = guide_ref[0]
    h, w = I.shape
    inv_n = 1.0 / _count_norm(h, w, radius)
    bh = _banded(h, radius)
    bw = _banded(w, radius)

    box = lambda t: _box_sum_mm(t, bh, bw) * inv_n
    mean_I = box(I)
    corr_II = box(I * I)
    var_I = corr_II - mean_I * mean_I
    for c in range(p_ref.shape[0]):
        p = p_ref[c]
        mean_p = box(p)
        corr_Ip = box(I * p)
        cov_Ip = corr_Ip - mean_I * mean_p
        a = cov_Ip / (var_I + eps)
        b = mean_p - a * mean_I
        mean_a_ref[c] = box(a)
        mean_b_ref[c] = box(b)


def _gf_kernel_perchannel(guide_ref, p_ref, mean_a_ref, mean_b_ref, *,
                          radius: int, eps: float):
    """Per-channel-program variant (grid over channels): holds only ~4
    planes resident — the fallback when the shared-stats program would
    exceed scoped VMEM (large coarse grids, e.g. 540x960 at pool=2). The
    guide statistics are recomputed per channel (cheaper than an HBM
    round trip); outputs are identical math to _gf_kernel."""
    I = guide_ref[0]
    p = p_ref[0]
    h, w = I.shape
    inv_n = 1.0 / _count_norm(h, w, radius)
    bh = _banded(h, radius)
    bw = _banded(w, radius)

    box = lambda t: _box_sum_mm(t, bh, bw) * inv_n
    mean_I = box(I)
    mean_p = box(p)
    corr_Ip = box(I * p)
    corr_II = box(I * I)
    var_I = corr_II - mean_I * mean_I
    cov_Ip = corr_Ip - mean_I * mean_p
    a = cov_Ip / (var_I + eps)
    b = mean_p - a * mean_I
    mean_a_ref[0] = box(a)
    mean_b_ref[0] = box(b)


def _shared_fits(h: int, w: int, c: int, budget: int = 11 * 2**20) -> bool:
    """Whether the shared-stats single program fits scoped VMEM: input +
    output planes (1 + 3C of (h, w) f32), both banded matrices, and ~3
    live box-sum temporaries."""
    plane = h * w * 4
    return ((1 + 3 * c + 3) * plane + (h * h + w * w) * 4) <= budget


@functools.partial(jax.jit, static_argnames=("radius", "eps", "interpret"))
def guided_filter_coeffs(guide: jax.Array, p: jax.Array, radius: int = 4,
                         eps: float = 1e-4, interpret: bool = False):
    """Fused (mean_a, mean_b) for the fast guided filter.

    guide: (N, H, W, 1) float32 coarse guide
    p:     (N, H, W, C) float32 signals to filter (alpha + fgr channels)
    Returns (mean_a, mean_b) each (N, H, W, C); final output at any
    resolution is ``upsample(mean_a) * guide_full + upsample(mean_b)``.
    """
    n, h, w, c = p.shape
    if _shared_fits(h, w, c):
        kernel = functools.partial(_gf_kernel, radius=radius,
                                   eps=float(eps))

        def one(guide_hw, p_chw):
            full = pl.BlockSpec(memory_space=pltpu.VMEM)
            return pl.pallas_call(
                kernel,
                out_shape=(jax.ShapeDtypeStruct((c, h, w), jnp.float32),
                           jax.ShapeDtypeStruct((c, h, w), jnp.float32)),
                in_specs=[full, full],
                out_specs=(full, full),
                interpret=interpret,
            )(guide_hw, p_chw)
    else:
        kernel = functools.partial(_gf_kernel_perchannel, radius=radius,
                                   eps=float(eps))

        def one(guide_hw, p_chw):
            return pl.pallas_call(
                kernel,
                out_shape=(jax.ShapeDtypeStruct((c, h, w), jnp.float32),
                           jax.ShapeDtypeStruct((c, h, w), jnp.float32)),
                grid=(c,),
                in_specs=[
                    pl.BlockSpec((1, h, w), lambda ci: (0, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, h, w), lambda ci: (ci, 0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=(
                    pl.BlockSpec((1, h, w), lambda ci: (ci, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, h, w), lambda ci: (ci, 0, 0),
                                 memory_space=pltpu.VMEM),
                ),
                interpret=interpret,
            )(guide_hw, p_chw)

    guide_n = jnp.transpose(guide.astype(jnp.float32), (0, 3, 1, 2))
    p_n = jnp.transpose(p.astype(jnp.float32), (0, 3, 1, 2))
    mean_a, mean_b = jax.vmap(one)(guide_n, p_n)
    return (jnp.transpose(mean_a, (0, 2, 3, 1)),
            jnp.transpose(mean_b, (0, 2, 3, 1)))

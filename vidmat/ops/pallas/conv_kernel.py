"""PROTOTYPE: planar-layout fused conv3x3 (+affine+relu) Pallas kernel.

Motivation (docs/PERFORMANCE.md "next structural target"): XLA's lowering
of small-channel NHWC convs materializes lane-padded im2col operands —
a 144x240x19->16 conv reports ~67 MB accessed (~27x real bytes), and small-
channel NHWC tensors are themselves lane-padded in HBM. This kernel keeps
activations in planar (C, H, W) layout (W in lanes — no padding waste for
W >= 128) and computes the 3x3 conv as nine channel-contraction matmuls
over statically shifted planes, entirely in VMEM.

Status: prototype with measured results (v5e, 144x240x19->16 f32):
  - correct vs the XLA conv oracle (max diff 1e-6 on TPU)
  - HBM accessed: 12 MB vs 63 MB for the XLA conv (5x less — the layout
    thesis holds)
  - wall time: 0.44 ms vs 0.08 ms (5x SLOWER): the per-output-row
    fori_loop issues 144 tiny (16x256)x(256x240) matmuls that starve the
    MXU pipeline. Mosaic constraints shaped this schedule: lane-offset-
    mismatched vectors cannot be concatenated (the dx shifts must be
    pre-sliced by XLA), and sublane/lane-merging reshapes do not lower,
    so multi-row patch matrices need a different construction.
Round-2 path: block the row loop (im2col for 8-16 rows per matmul via
aligned slab concatenation along sublanes) to reach MXU-efficient shapes,
then fuse whole conv-BN-relu chains (+GRU) per resolution level so
activations never leave VMEM between layers.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _conv_kernel(x0_ref, x1_ref, x2_ref, w_ref, scale_ref, bias_ref,
                 out_ref, *, relu: bool):
    # x{0,1,2}: (C_in, H+2, W) — the three dx shifts pre-sliced by XLA so
    # every in-kernel row slab is lane-offset-aligned (Mosaic cannot concat
    # vectors with mismatched lane offsets); w: (C_out, 9*C_in) taps
    # ordered [dy, dx, ci]; out: (C_out, H, W).
    # Row loop: per output row, im2col stacks 9 aligned (C_in, W) slabs
    # along sublanes, then one MXU matmul emits the (C_out, W) row.
    c_out, h, w = out_ref.shape
    scale = scale_ref[...]  # (C_out, 1)
    bias = bias_ref[...]
    xrefs = (x0_ref, x1_ref, x2_ref)

    def row(y, _):
        slabs = []
        for dy in range(3):
            for dx in range(3):
                slabs.append(xrefs[dx][:, y + dy, :])  # (C_in, W)
        patches = jnp.concatenate(slabs, axis=0)  # (9*C_in, W)
        out = jnp.dot(w_ref[...], patches,
                      preferred_element_type=jnp.float32)
        out = out * scale + bias
        if relu:
            out = jnp.maximum(out, 0.0)
        out_ref[:, y, :] = out.astype(out_ref.dtype)
        return 0

    jax.lax.fori_loop(0, h, row, 0)


@functools.partial(jax.jit, static_argnames=("relu", "interpret"))
def planar_conv3x3(x: jax.Array, w: jax.Array, scale: jax.Array,
                   bias: jax.Array, relu: bool = True,
                   interpret: bool = False) -> jax.Array:
    """Fused conv3x3 (SAME, stride 1) + per-channel affine + relu on planar
    tensors.

    x: (C_in, H, W); w: (C_out, C_in, 3, 3); scale/bias: (C_out,)
    (the inference-folded BatchNorm affine). Returns (C_out, H, W).
    """
    c_in, h, wd = x.shape
    c_out = w.shape[0]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1)))
    x0 = xp[:, :, 0:wd]
    x1 = xp[:, :, 1:wd + 1]
    x2 = xp[:, :, 2:wd + 2]
    # (C_out, C_in, 3, 3) -> (C_out, 9*C_in), taps ordered [dy, dx, ci]
    w9 = jnp.transpose(w, (0, 2, 3, 1)).reshape(c_out, 9 * c_in)
    kernel = functools.partial(_conv_kernel, relu=relu)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((c_out, h, wd), x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x0, x1, x2, w9, scale[:, None], bias[:, None])

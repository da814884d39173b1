"""Foreground compositing (BASELINE.json:5: "foreground compositing ...
emit composited RGBA directly").

``composite_rgba`` is the XLA path (fuses into the surrounding graph);
``vidmat.ops.pallas.composite_kernel`` provides the fused Pallas kernel that
also performs the float->uint8 quantization in-register, so only packed RGBA
bytes cross back over PCIe/D2H.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def composite_rgba(fgr: jax.Array, alpha: jax.Array,
                   bg: Optional[jax.Array] = None) -> jax.Array:
    """Composite fgr over bg with alpha; emit packed uint8 RGBA. NHWC.

    fgr: (N, H, W, 3) in [0,1]; alpha: (N, H, W, 1) in [0,1]
    bg:  (3,) color, (N, H, W, 3) image, or None (= emit premultiplied
         fgr*alpha with alpha channel, for downstream compositing).
    """
    if bg is None:
        rgb = fgr * alpha
    else:
        bg = jnp.asarray(bg, fgr.dtype)
        if bg.ndim == 1:
            bg = bg.reshape(1, 1, 1, 3)
        rgb = fgr * alpha + bg * (1.0 - alpha)
    rgba = jnp.concatenate([rgb, jnp.broadcast_to(alpha, rgb[..., :1].shape)],
                           axis=-1)
    return jnp.round(jnp.clip(rgba, 0.0, 1.0) * 255.0).astype(jnp.uint8)

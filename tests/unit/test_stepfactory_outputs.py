"""Serving-body output contracts (stepfactory) — the alpha-only plan.

The packed path is TPU-only in the pipeline (CPU runs the u8-tuple
path), so the contract is pinned here with interpret-mode kernels, and
the real-TPU compile is covered by bench --mode / the driver headline.
"""

import numpy as np

import jax.numpy as jnp

from vidmat.config import ModelConfig, RefineConfig
from vidmat.models.matting_net import MattingNetwork
from vidmat.models.weights import init_params
from vidmat.pipeline.stepfactory import build_serving_body


def test_alpha_only_body_matches_packed_high_byte():
    """alpha_only=True must return exactly the packed word's high byte
    (the quantized alpha), as (N, H, W) uint8 — the 4x-smaller D2H for
    convert_video(output_alpha=...) with no other outputs."""
    cfg = ModelConfig(space_to_depth=2, conv_impl="planar")
    net = MattingNetwork(cfg, dtype=jnp.bfloat16)
    variables = init_params(cfg)
    h, w, ratio = 128, 192, 0.5
    kw = dict(cdtype=jnp.bfloat16, bg=None, pallas_interpret=True,
              use_pallas=True)
    body_p, plan_p = build_serving_body(net, cfg, RefineConfig(), h, w,
                                        ratio, **kw)
    body_a, plan_a = build_serving_body(net, cfg, RefineConfig(), h, w,
                                        ratio, alpha_only=True, **kw)
    assert plan_p.packed and not plan_p.alpha_only
    assert plan_a.alpha_only

    frame = np.random.RandomState(0).randint(0, 255, (1, h, w, 3),
                                             np.uint8)
    sp = plan_p.make_state(1)
    sa = plan_a.make_state(1)
    packed, _ = body_p(variables, jnp.asarray(frame), sp)
    alpha, _ = body_a(variables, jnp.asarray(frame), sa)
    assert alpha.dtype == jnp.uint8 and alpha.shape == (1, h, w)
    want = (np.asarray(packed) >> 24).astype(np.uint8)
    np.testing.assert_array_equal(np.asarray(alpha), want)


def test_alpha_only_ignored_off_packed_paths():
    """alpha_only must be a no-op for float-output / non-pallas bodies
    (their callers consume tuples/floats)."""
    cfg = ModelConfig()
    net = MattingNetwork(cfg, dtype=jnp.float32)
    _, plan = build_serving_body(net, cfg, RefineConfig(), 64, 96, 0.5,
                                 cdtype=jnp.float32, bg=None,
                                 use_pallas=False, alpha_only=True)
    assert not plan.alpha_only and not plan.packed

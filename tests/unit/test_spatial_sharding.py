"""Spatial (width-axis) sharded inference — the sequence-parallel analog
for a conv net (SURVEY.md §2.2): GSPMD partitions the convolutions over the
mesh 'spatial' axis and inserts halo exchanges; outputs must match the
unsharded run."""

import pytest as _pytest_tier

# Full-tier only (tests/README.md): compile-heavy mesh/interpret
# programs, process spawns, long rollouts, or e2e conversions.
pytestmark = _pytest_tier.mark.slow


import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from vidmat.config import ModelConfig
from vidmat.models.matting_net import MattingNetwork, init_state
from vidmat.models.weights import init_params
from vidmat.parallel.mesh import make_mesh


def test_width_sharded_inference_matches_unsharded():
    cfg = ModelConfig()
    net = MattingNetwork(cfg)
    variables = init_params(cfg)
    h, w = 64, 256  # w divisible by 8 devices * 16
    rng = np.random.RandomState(0)
    frame = rng.rand(1, h, w, 3).astype(np.float32)
    state = init_state(cfg, 1, h, w)

    ref_alpha, ref_fgr, ref_state = jax.jit(net.apply)(
        variables, jnp.asarray(frame), state)

    mesh = make_mesh(("spatial",), (8,))
    fspec = NamedSharding(mesh, P(None, None, "spatial", None))

    sharded = jax.jit(net.apply,
                      in_shardings=(None, fspec, None),
                      out_shardings=(fspec, fspec, None))
    s_alpha, s_fgr, s_state = sharded(variables, jnp.asarray(frame), state)

    np.testing.assert_allclose(np.asarray(ref_alpha), np.asarray(s_alpha),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(ref_fgr), np.asarray(s_fgr),
                               atol=2e-5)
    for a, b in zip(ref_state, s_state):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)

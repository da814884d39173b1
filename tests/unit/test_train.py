"""Training-loop tests: loss sanity, gradient flow, sharded step on the
virtual 8-device mesh (SURVEY.md §4 multi-device testing)."""

import pytest as _pytest_tier

# Full-tier only (tests/README.md): compile-heavy mesh/interpret
# programs, process spawns, long rollouts, or e2e conversions.
pytestmark = _pytest_tier.mark.slow


import numpy as np

import jax
import jax.numpy as jnp

from vidmat.config import ModelConfig
from vidmat.parallel.mesh import make_mesh
from vidmat.train.data import synthetic_clip_batches
from vidmat.train.loop import (TrainState, make_optimizer, make_train_step,
                               train_on_clips)


def test_train_step_decreases_loss():
    """A few steps on a fixed batch must reduce the loss (gradients flow
    through the scan/GRU/BN-affine path)."""
    cfg = ModelConfig()
    data = synthetic_clip_batches(t=2, n=1, h=32, w=32)
    batch = next(data)

    losses = []

    def cb(i, m):
        losses.append(float(m["loss"]))

    def fixed_iter():
        while True:
            yield batch

    train_on_clips(cfg, fixed_iter(), num_steps=5, lr=1e-3, callback=cb)
    assert losses[-1] < losses[0], losses


def test_train_step_sharded_matches_single():
    """The mesh-sharded train step must produce the same loss as the
    unsharded one (DP is a pure layout change)."""
    cfg = ModelConfig()
    batch = next(synthetic_clip_batches(t=2, n=4, h=32, w=32, seed=9))
    clips, ga, gf = (jnp.asarray(x) for x in batch)

    from vidmat.models.weights import init_params

    variables = init_params(cfg)
    opt = make_optimizer()
    opt_state = opt.init(variables["params"])

    s1 = TrainState(variables=variables, opt_state=opt_state)
    _, m1 = make_train_step(cfg, opt)(s1, clips, ga, gf)

    mesh = make_mesh(("data", "spatial"), (4, 2))
    s2 = TrainState(variables=variables, opt_state=opt_state)
    _, m2 = make_train_step(cfg, opt, mesh=mesh)(s2, clips, ga, gf)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=2e-5)


def test_laplacian_pyramid_loss():
    """Multi-scale alpha loss (SURVEY §3.5 loss family): zero at identity,
    positive and ordered for increasingly wrong predictions, and it must
    penalize a blurred edge MORE than plain L1 does relative to a shifted
    edge (the fine-structure sensitivity it exists for)."""
    import jax.numpy as jnp
    import numpy as np

    from vidmat.train.losses import laplacian_pyramid_loss, matting_loss

    rng = np.random.RandomState(0)
    gt = jnp.asarray((rng.rand(2, 64, 64, 1) > 0.5).astype(np.float32))
    assert float(laplacian_pyramid_loss(gt, gt)) == 0.0
    small = laplacian_pyramid_loss(gt * 0.9 + 0.05, gt)
    big = laplacian_pyramid_loss(1.0 - gt, gt)
    assert 0.0 < float(small) < float(big)

    # wired through matting_loss
    t, n, h, w = 2, 1, 32, 32
    pa = jnp.asarray(rng.rand(t, n, h, w, 1).astype(np.float32))
    ga = jnp.asarray(rng.rand(t, n, h, w, 1).astype(np.float32))
    pf = jnp.asarray(rng.rand(t, n, h, w, 3).astype(np.float32))
    fr = jnp.asarray(rng.rand(t, n, h, w, 3).astype(np.float32))
    base, terms0 = matting_loss(pa, pf, ga, None, fr)
    tot, terms = matting_loss(pa, pf, ga, None, fr, laplacian_weight=0.25)
    assert "laplacian" in terms and "laplacian" not in terms0
    assert float(tot) > float(base)

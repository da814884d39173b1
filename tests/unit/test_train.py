"""Training-loop tests: loss sanity, gradient flow, sharded step on the
virtual 8-device mesh (SURVEY.md §4 multi-device testing)."""

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

"""Segmentation co-training pass (RVM-lineage [DOMAIN]): the shared
trunk + seg_head branch, the graft onto matting checkpoints, the BCE
step, and the matting/segmentation interleave."""

import pytest as _pytest_tier

# Full-tier only (tests/README.md): compile-heavy mesh/interpret
# programs, process spawns, long rollouts, or e2e conversions.
pytestmark = _pytest_tier.mark.slow


import numpy as np

import jax
import jax.numpy as jnp

from vidmat.config import ModelConfig
from vidmat.models.matting_net import MattingNetwork, init_state
from vidmat.models.weights import graft_seg_params, init_params
from vidmat.train.data import synthetic_seg_batches
from vidmat.train.loop import (TrainState, make_optimizer,
                               make_seg_train_step, train_on_clips)


def _frame(cfg, h=32, w=32, seed=3):
    rng = np.random.RandomState(seed)
    return jnp.asarray(
        rng.rand(1, h, w, cfg.in_channels).astype(np.float32))


def test_seg_forward_shapes_and_matting_isolation():
    """seg_pass emits full-res logits; adding seg_head params leaves the
    matting pass bit-identical (the branch never reads them)."""
    for cfg in (ModelConfig(), ModelConfig(space_to_depth=2)):
        net = MattingNetwork(cfg)
        v_seg = init_params(cfg, with_seg=True)
        frame = _frame(cfg)
        state = init_state(cfg, 1, 32, 32)

        seg, none_fgr, new_state = net.apply(v_seg, frame, state,
                                             seg_pass=True)
        assert seg.shape == (1, 32, 32, 1)
        assert none_fgr is None
        assert np.all(np.isfinite(np.asarray(seg)))
        # recurrent state advances on the seg pass too (video seg clips
        # train the SAME temporal machinery the matting pass serves)
        assert not np.allclose(np.asarray(new_state.h1),
                               np.asarray(state.h1))

        v_plain = init_params(cfg)
        a0, f0, _ = net.apply(v_plain, frame, state)
        a1, f1, _ = net.apply(v_seg, frame, state)
        np.testing.assert_array_equal(np.asarray(a0), np.asarray(a1))
        np.testing.assert_array_equal(np.asarray(f0), np.asarray(f1))


def test_graft_seg_params_preserves_matting():
    cfg = ModelConfig()
    net = MattingNetwork(cfg)
    v0 = init_params(cfg, seed=5)
    v1 = graft_seg_params(v0, cfg)
    assert "seg_head" in v1["params"]

    frame = _frame(cfg, seed=11)
    state = init_state(cfg, 1, 32, 32)
    a0, f0, _ = net.apply(v0, frame, state)
    a1, f1, _ = net.apply(v1, frame, state)
    np.testing.assert_array_equal(np.asarray(a0), np.asarray(a1))
    np.testing.assert_array_equal(np.asarray(f0), np.asarray(f1))

    seg, _, _ = net.apply(v1, frame, state, seg_pass=True)
    assert np.all(np.isfinite(np.asarray(seg)))

    # double graft is refused
    try:
        graft_seg_params(v1, cfg)
        assert False, "expected ValueError"
    except ValueError:
        pass


def test_seg_train_step_descends():
    """BCE descends on a fixed synthetic mask batch (gradients flow from
    the seg head back through the shared trunk)."""
    cfg = ModelConfig()
    opt = make_optimizer(1e-3)
    variables = init_params(cfg, with_seg=True)
    state = TrainState(variables=variables,
                       opt_state=opt.init(variables["params"]))
    step = make_seg_train_step(cfg, opt)

    clips, masks = next(synthetic_seg_batches(t=2, n=2, h=32, w=32, seed=1))
    clips, masks = jnp.asarray(clips), jnp.asarray(masks)
    losses = []
    for _ in range(8):
        state, m = step(state, clips, masks)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0], losses
    assert 0.0 <= float(m["seg_iou"]) <= 1.0


def test_seg_trunk_is_shared():
    """A seg-only step must move the ENCODER (shared trunk) while the
    matting head gets zero gradient (unused in the pass)."""
    cfg = ModelConfig()
    opt = make_optimizer(1e-3)
    variables = init_params(cfg, with_seg=True)
    state = TrainState(variables=variables,
                       opt_state=opt.init(variables["params"]))
    step = make_seg_train_step(cfg, opt)
    clips, masks = next(synthetic_seg_batches(t=2, n=1, h=32, w=32, seed=2))
    new_state, _ = step(state, jnp.asarray(clips), jnp.asarray(masks))

    k0 = variables["params"]["encoder"]["stem"]["conv"]["kernel"]
    k1 = new_state.variables["params"]["encoder"]["stem"]["conv"]["kernel"]
    assert not np.allclose(np.asarray(k0), np.asarray(k1))

    h0 = variables["params"]["head"]["kernel"]
    h1 = new_state.variables["params"]["head"]["kernel"]
    np.testing.assert_array_equal(np.asarray(h0), np.asarray(h1))


def test_interleaved_cotraining():
    """Matting + segmentation batches interleave through one optimizer;
    both losses stay finite and the seg steps fire on schedule."""
    cfg = ModelConfig()
    data = synthetic_clip_batches_fixed()
    seg_data = synthetic_seg_batches(t=2, n=1, h=32, w=32, seed=4)

    kinds = []

    def cb(i, m):
        kinds.append("seg" if "seg_bce" in m else "mat")
        assert np.isfinite(m["loss"])

    train_on_clips(cfg, data, num_steps=6, lr=1e-3, callback=cb,
                   seg_data_iter=seg_data, seg_every=3)
    assert kinds == ["mat", "mat", "seg", "mat", "mat", "seg"]


def synthetic_clip_batches_fixed():
    from vidmat.train.data import synthetic_clip_batches

    return synthetic_clip_batches(t=2, n=1, h=32, w=32, seed=0)


def test_interleave_auto_grafts_explicit_checkpoint():
    """Passing a plain matting checkpoint into the interleave must graft
    seg_head automatically (matting-neutral) instead of failing on the
    first seg step."""
    cfg = ModelConfig()
    v0 = init_params(cfg, seed=9)  # no seg_head
    seen = []
    train_on_clips(cfg, synthetic_clip_batches_fixed(), num_steps=2,
                   lr=1e-3, variables=v0,
                   callback=lambda i, m: seen.append("seg" in
                                                     str(sorted(m))),
                   seg_data_iter=synthetic_seg_batches(t=2, n=1, h=32,
                                                       w=32, seed=6),
                   seg_every=2)
    # step 0 must be a matting step, step 1 the (auto-grafted) seg step —
    # a regression that silently skips the seg branch would yield
    # [False, False].
    assert seen == [False, True]


def test_seg_step_sharded_matches_single():
    """The mesh-sharded seg step equals the unsharded one (pure DP
    layout change) on the virtual 8-device mesh."""
    from vidmat.parallel.mesh import make_mesh

    cfg = ModelConfig()
    opt = make_optimizer()
    variables = init_params(cfg, with_seg=True)
    opt_state = opt.init(variables["params"])
    clips, masks = next(synthetic_seg_batches(t=2, n=4, h=32, w=32, seed=7))
    clips, masks = jnp.asarray(clips), jnp.asarray(masks)

    s1 = TrainState(variables=variables, opt_state=opt_state)
    _, m1 = make_seg_train_step(cfg, opt)(s1, clips, masks)

    mesh = make_mesh(("data", "spatial"), (4, 2))
    s2 = TrainState(variables=variables, opt_state=opt_state)
    _, m2 = make_seg_train_step(cfg, opt, mesh=mesh)(s2, clips, masks)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=2e-5)

"""Clean-plate conditioned family (BGMv2 lineage): model-level tests.

The plate rides as 3 extra net-input channels (config.py in_channels);
serving ingests it once and concatenates on-device (stepfactory
bg_plate). These tests pin the model/graft/fixture layers; the serving
plumbing is covered in tests/integration/test_plate_video.py.
"""

import pytest as _pytest_tier

# Full-tier only (tests/README.md): compile-heavy mesh/interpret
# programs, process spawns, long rollouts, or e2e conversions.
pytestmark = _pytest_tier.mark.slow


import numpy as np
import jax.numpy as jnp
import pytest

from vidmat.config import ModelConfig
from vidmat.io.fixtures import synthetic_plate_frame
from vidmat.models.matting_net import MattingNetwork, init_state
from vidmat.models.weights import graft_cond_params, init_params


def test_in_channels_plan():
    assert ModelConfig().in_channels == 3
    assert ModelConfig(use_trimap=True).in_channels == 4
    assert ModelConfig(use_bg_plate=True).in_channels == 6
    assert ModelConfig(use_trimap=True, use_bg_plate=True).in_channels == 7


def test_plate_fixture_camouflage_is_invisible_without_plate():
    """The camouflaged disk's interior matches background statistics: the
    frame/plate difference is large inside the disk, and the frame's
    channel histogram stays close to the plate's (no distinct fg color)."""
    frame, alpha, plate = synthetic_plate_frame(96, 96, 0.2, seed=3,
                                                camouflage=True)
    f = frame.astype(np.float32) / 255.0
    p = plate.astype(np.float32) / 255.0
    inside = alpha[..., 0] > 0.9
    outside = alpha[..., 0] < 0.1
    diff = np.abs(f - p).mean(axis=-1)
    # plate comparison finds the disk...
    assert diff[inside].mean() > 5 * max(diff[outside].mean(), 1e-6)
    # ...while marginal statistics do not (means within texture variation)
    assert abs(f[inside].mean() - f[outside].mean()) < 0.1


def test_plate_fixture_plain_mode_and_jitter():
    frame, alpha, plate = synthetic_plate_frame(64, 64, 0.0, seed=1,
                                                camouflage=False)
    assert frame.shape == (64, 64, 3) and plate.shape == (64, 64, 3)
    assert alpha.max() > 0.99 and alpha.min() < 0.01
    _, _, plate_j = synthetic_plate_frame(64, 64, 0.0, seed=1,
                                          camouflage=False,
                                          plate_jitter=0.05)
    assert not np.array_equal(plate, plate_j)
    # jitter is a perturbation, not a different image
    assert np.abs(plate.astype(np.float32)
                  - plate_j.astype(np.float32)).mean() < 30


@pytest.mark.parametrize("s2d", [1, 2])
def test_plate_net_forward_shapes(s2d):
    cfg = ModelConfig(use_bg_plate=True, space_to_depth=s2d)
    variables = init_params(cfg, height=32, width=32)
    net = MattingNetwork(cfg)
    frame = jnp.asarray(np.random.RandomState(0).rand(1, 32, 32, 6),
                        jnp.float32)
    state = init_state(cfg, 1, 32, 32)
    alpha, fgr, ns = net.apply(variables, frame, state)
    assert alpha.shape == (1, 32, 32, 1)
    assert fgr.shape == (1, 32, 32, 3)


@pytest.mark.parametrize("tgt_kwargs,src_c", [
    (dict(use_bg_plate=True), 3),
    (dict(use_bg_plate=True, use_trimap=True), 3),
])
def test_graft_cond_identity(tgt_kwargs, src_c):
    """Zero-init conditioning rows: the grafted net equals the source net
    regardless of what rides the new channels. Equality is to f32
    reassociation tolerance, not bit-exact: the wider conv's reduction
    may tile differently per backend (measured bit-exact on TPU, ~1e-7
    on the CPU conv lowering)."""
    src_cfg = ModelConfig(space_to_depth=2)
    tgt_cfg = ModelConfig(space_to_depth=2, **tgt_kwargs)
    src = init_params(src_cfg, seed=5)
    grafted = graft_cond_params(src, tgt_cfg, src_in_channels=src_c)

    rng = np.random.RandomState(2)
    rgb = jnp.asarray(rng.rand(1, 32, 32, 3), jnp.float32)
    extra = jnp.asarray(rng.rand(1, 32, 32, tgt_cfg.in_channels - 3),
                        jnp.float32)
    state = init_state(src_cfg, 1, 32, 32)

    a_src, f_src, _ = MattingNetwork(src_cfg).apply(src, rgb, state)
    a_tgt, f_tgt, _ = MattingNetwork(tgt_cfg).apply(
        grafted, jnp.concatenate([rgb, extra], axis=-1), state)
    if tgt_cfg.use_trimap:
        # the trimap PIN is output logic, not weights — compare where the
        # random "trimap" channel is in the unknown band
        tri = extra[..., 0:1]
        m = np.asarray((tri > 0.25) & (tri < 0.75))
        np.testing.assert_allclose(np.asarray(a_tgt)[m],
                                   np.asarray(a_src)[m], atol=1e-5)
    else:
        np.testing.assert_allclose(np.asarray(a_tgt), np.asarray(a_src),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(f_tgt), np.asarray(f_src),
                                   atol=1e-5)


def test_graft_cond_from_trimap_source():
    """Grafting a 4-channel (trimap) checkpoint into trimap+plate keeps
    the trimap taps and zero-inits only the plate rows."""
    src_cfg = ModelConfig(space_to_depth=2, use_trimap=True)
    tgt_cfg = ModelConfig(space_to_depth=2, use_trimap=True,
                          use_bg_plate=True)
    src = init_params(src_cfg, seed=7)
    grafted = graft_cond_params(src, tgt_cfg, src_in_channels=4)

    rng = np.random.RandomState(3)
    x4 = jnp.asarray(rng.rand(1, 32, 32, 4), jnp.float32)
    plate = jnp.asarray(rng.rand(1, 32, 32, 3), jnp.float32)
    state = init_state(src_cfg, 1, 32, 32)
    a_src, _, _ = MattingNetwork(src_cfg).apply(src, x4, state)
    a_tgt, _, _ = MattingNetwork(tgt_cfg).apply(
        grafted, jnp.concatenate([x4, plate], axis=-1), state)
    np.testing.assert_allclose(np.asarray(a_tgt), np.asarray(a_src),
                               atol=1e-5)


def test_graft_cond_rejects_shrinking():
    src = init_params(ModelConfig(use_trimap=True), seed=0)
    with pytest.raises(ValueError, match="only ADDS"):
        graft_cond_params(src, ModelConfig(), src_in_channels=4)


def test_default_checkpoint_covers_plate_axis():
    """The plate config maps to the plate_demo checkpoint dir (present
    once trained); unknown axes still return None."""
    from vidmat.models.weights import _DEFAULT_CKPTS

    assert _DEFAULT_CKPTS[(False, True, 2, True)] == "plate_demo"


def test_matte_image_plate_family_non_s2d_multiple_size():
    """Regression: the default plate family is s2d=2, and ImageStepper
    must pad to 16*s2d — an 80x80 image (16 mod 32) used to crash the
    decoder skip-concat."""
    from vidmat.api import matte_image

    cfg = ModelConfig(use_bg_plate=True, space_to_depth=2)
    from vidmat.io.fixtures import synthetic_plate_frame

    frame, _, plate = synthetic_plate_frame(80, 80, 0.1, seed=2)
    alpha, fgr = matte_image(frame, bg_plate=plate, cfg=cfg,
                             variables=init_params(cfg, seed=1))
    assert alpha.shape == (80, 80, 1) and fgr.shape == (80, 80, 3)


def test_plate_default_config_matches_shipped_axes():
    """plate_default_config() must stay in sync with the plate_demo
    entry in _DEFAULT_CKPTS (the single source of truth contract)."""
    from vidmat.models.weights import (_DEFAULT_CKPTS,
                                       plate_default_config)

    cfg = plate_default_config()
    key = (cfg.use_trimap, cfg.use_bg_plate, cfg.space_to_depth,
           cfg.recurrent)
    assert _DEFAULT_CKPTS[key] == "plate_demo"

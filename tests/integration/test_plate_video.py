"""Clean-plate conditioned serving (BGMv2 lineage): pipeline-level tests.

The plate is ingested ONCE and concatenated to the net input on device
(stepfactory bg_plate / cond_const) — these tests pin that the plate
actually reaches the network, that a zero-tap (grafted) net ignores it
exactly, and that the public surfaces validate presence/absence loudly.
"""

import pytest as _pytest_tier

# Full-tier only (tests/README.md): compile-heavy mesh/interpret
# programs, process spawns, long rollouts, or e2e conversions.
pytestmark = _pytest_tier.mark.slow


import numpy as np
import jax.numpy as jnp
import pytest

from vidmat.config import ModelConfig, RefineConfig
from vidmat.models.matting_net import MattingNetwork
from vidmat.models.weights import graft_cond_params, init_params
from vidmat.io.fixtures import synthetic_plate_frame
from vidmat.pipeline.stepfactory import build_serving_body


def _plate_cfg(**kw):
    return ModelConfig(use_bg_plate=True, **kw)


def _frames(h, w, n=3, seed=0):
    out = [synthetic_plate_frame(h, w, i / 8.0, seed=seed) for i in range(n)]
    frames = np.stack([f for f, _, _ in out])
    plate = out[0][2]
    return frames, plate


class TestServingBody:
    def test_full_res_float_parity_vs_direct_apply(self):
        """ratio=1.0 float-output body == net.apply on the manually
        concatenated (frame, plate) input — exact (same ops)."""
        cfg = _plate_cfg()
        variables = init_params(cfg, seed=1)
        net = MattingNetwork(cfg)
        frames, plate = _frames(32, 32, n=1)
        body, plan = build_serving_body(
            net, cfg, RefineConfig(mode="none"), 32, 32, 1.0,
            cdtype=jnp.float32, use_pallas=False, float_output=True,
            bg_plate=jnp.asarray(plate))
        state = plan.make_state(1)
        (alpha, fgr), _ = body(variables, jnp.asarray(frames[:1]), state)

        x = jnp.concatenate(
            [jnp.asarray(frames[:1], jnp.float32) / 255.0,
             jnp.asarray(plate[None], jnp.float32) / 255.0], axis=-1)
        a_ref, f_ref, _ = net.apply(variables, x, plan.make_state(1))
        np.testing.assert_allclose(np.asarray(alpha), np.asarray(a_ref),
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(fgr), np.asarray(f_ref),
                                   atol=1e-6)

    def test_plate_reaches_net_and_zero_taps_ignore_it(self):
        """With random weights, changing the plate changes the matte;
        with a grafted (zero plate-tap) net it does not."""
        cfg = _plate_cfg(space_to_depth=2)
        frames, plate = _frames(32, 32, n=1)
        other = np.roll(plate, 7, axis=1)
        net = MattingNetwork(cfg)

        def run(variables, pl):
            body, plan = build_serving_body(
                net, cfg, RefineConfig(mode="guided"), 32, 32, 0.5,
                cdtype=jnp.float32, use_pallas=False, float_output=True,
                bg_plate=jnp.asarray(pl))
            (alpha, _), _ = body(variables, jnp.asarray(frames[:1]),
                                 plan.make_state(1))
            return np.asarray(alpha)

        rand = init_params(cfg, seed=3)
        assert np.abs(run(rand, plate) - run(rand, other)).max() > 1e-6

        grafted = graft_cond_params(
            init_params(ModelConfig(space_to_depth=2), seed=3), cfg)
        np.testing.assert_allclose(run(grafted, plate),
                                   run(grafted, other), atol=1e-6)

    def test_pallas_interpret_path_matches_xla(self):
        """The fused/planar serving path (interpret-mode kernels) consumes
        the plate identically to the XLA path."""
        cfg = _plate_cfg(space_to_depth=2, conv_impl="planar")
        cfg_xla = _plate_cfg(space_to_depth=2)
        variables = init_params(cfg_xla, seed=2)
        frames, plate = _frames(64, 64, n=2)
        net_p = MattingNetwork(cfg, dtype=jnp.bfloat16)
        net_x = MattingNetwork(cfg_xla, dtype=jnp.bfloat16)

        body_p, plan_p = build_serving_body(
            net_p, cfg, RefineConfig(mode="guided"), 64, 64, 0.5,
            cdtype=jnp.bfloat16, pallas_interpret=True,
            bg_plate=jnp.asarray(plate))
        body_x, plan_x = build_serving_body(
            net_x, cfg_xla, RefineConfig(mode="guided"), 64, 64, 0.5,
            cdtype=jnp.bfloat16, use_pallas=False,
            bg_plate=jnp.asarray(plate))
        sp, sx = plan_p.make_state(1), plan_x.make_state(1)
        for i in range(2):
            out_p, sp = body_p(variables, jnp.asarray(frames[i:i + 1]), sp)
            out_x, sx = body_x(variables, jnp.asarray(frames[i:i + 1]), sx)
        assert plan_p.packed
        from vidmat.ops.pallas.composite_kernel import unpack_rgba_host

        a_p = unpack_rgba_host(np.asarray(out_p))[0, ..., 3]
        a_x = np.asarray(out_x[0])[0, ..., 0]  # u8-tuple path alpha
        # same variables, same plate; packed path quantizes to u8 and the
        # kernel tail upsamples with banded matmuls vs XLA resize —
        # tolerance covers quantization + bf16
        assert np.abs(a_p.astype(np.float32)
                      - a_x.astype(np.float32)).mean() < 3.0

    def test_validation(self):
        cfg = _plate_cfg()
        net = MattingNetwork(cfg)
        with pytest.raises(ValueError, match="needs the pre-captured"):
            build_serving_body(net, cfg, RefineConfig(mode="none"),
                               32, 32, 1.0, use_pallas=False)
        base = ModelConfig()
        with pytest.raises(ValueError, match="not plate-conditioned"):
            build_serving_body(MattingNetwork(base), base,
                               RefineConfig(mode="none"), 32, 32, 1.0,
                               use_pallas=False,
                               bg_plate=jnp.zeros((32, 32, 3), jnp.uint8))
        with pytest.raises(ValueError, match="matching the frame bucket"):
            build_serving_body(net, cfg, RefineConfig(mode="none"),
                               32, 32, 1.0, use_pallas=False,
                               bg_plate=jnp.zeros((16, 16, 3), jnp.uint8))


class TestPipelineAndSession:
    def test_convert_video_with_plate(self, tmp_path):
        """End-to-end: frames + plate -> alpha file; explicit random
        weights (plumbing test, quality gated separately once plate_demo
        ships)."""
        from vidmat import convert_video

        cfg = _plate_cfg(space_to_depth=2)
        frames, plate = _frames(64, 64, n=4, seed=5)
        out = str(tmp_path / "a.mp4")
        stats = convert_video(iter(list(frames)), output_alpha=out,
                              bg_plate=plate, model_cfg=cfg,
                              variables=init_params(cfg, seed=0),
                              downsample_ratio=0.5)
        assert stats["frames"] == 4
        import os

        assert os.path.exists(out)

    def test_convert_video_plate_validation(self):
        from vidmat import convert_video

        frames, plate = _frames(32, 32, n=1)
        with pytest.raises(ValueError, match="not plate-conditioned"):
            convert_video(iter(list(frames)), bg_plate=plate,
                          model_cfg=ModelConfig(),
                          variables=init_params(ModelConfig()))
        cfg = _plate_cfg(space_to_depth=2)
        with pytest.raises(ValueError, match="needs the pre-captured"):
            convert_video(iter(list(frames)), model_cfg=cfg,
                          variables=init_params(cfg))

    def test_matting_session_with_plate(self):
        from vidmat import MattingSession

        cfg = _plate_cfg()
        frames, plate = _frames(32, 32, n=2, seed=2)
        sess = MattingSession(32, 32, model_cfg=cfg,
                              variables=init_params(cfg, seed=1),
                              bg_plate=plate)
        a1, f1 = sess.step(frames[0])
        assert a1.shape == (32, 32, 1) and f1.shape == (32, 32, 3)
        # parity vs the direct stepper math: plate present == the body
        # built with the same plate (smoke: a second step advances state)
        a2, _ = sess.step(frames[1])
        assert a2.shape == (32, 32, 1)

    def test_matte_image_with_plate(self):
        from vidmat import matte_image

        cfg = _plate_cfg()
        frame, _, plate = synthetic_plate_frame(48, 48, 0.1, seed=9)
        alpha, fgr = matte_image(frame, bg_plate=plate, cfg=cfg,
                                 variables=init_params(cfg, seed=4))
        assert alpha.shape == (48, 48, 1) and fgr.shape == (48, 48, 3)
        with pytest.raises(ValueError, match="requires the clean"):
            matte_image(frame, cfg=cfg, variables=init_params(cfg, seed=4))

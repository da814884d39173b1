"""Pipeline-parallel stage-overlap serving tests (SURVEY.md §2.2 "PP") on
a 2-device slice of the virtual 8-CPU-device mesh, with interpret-mode
Pallas kernels — the same real-kernel-path strategy as the multistream
mesh tests."""

import pytest as _pytest_tier

# Full-tier only (tests/README.md): compile-heavy mesh/interpret
# programs, process spawns, long rollouts, or e2e conversions.
pytestmark = _pytest_tier.mark.slow


import numpy as np

import jax
import pytest

from vidmat.config import ModelConfig, RefineConfig
from vidmat.parallel.mesh import make_mesh
from vidmat.parallel.multistream import MultiStreamMatting
from vidmat.parallel.pp import PipelinedMatting

BG = (0.1, 0.7, 0.3)


def _mesh2():
    return make_mesh(("pp",), devices=jax.devices()[:2])


def _frames(n, h, w, seed=0):
    rng = np.random.RandomState(seed)
    return [rng.randint(0, 255, (h, w, 3), np.uint8) for _ in range(n)]


def test_pipelined_matches_single_device():
    """The 2-stage pipeline must serve bit-identically (+-1 u8 across
    separately compiled programs) to single-device fused serving, with
    the documented one-frame skew: step(f_t) returns the output for
    f_{t-1}, and flush() drains the last frame."""
    cfg = ModelConfig(conv_impl="planar")
    h = w = 64
    pp = PipelinedMatting(h, w, _mesh2(), cfg=cfg, dtype="float32",
                          downsample_ratio=0.5, bg_color=BG,
                          pallas_interpret=True)
    one = MultiStreamMatting(1, h, w, cfg=cfg, variables=pp.variables,
                             dtype="float32", pallas_interpret=True,
                             use_pallas=True, downsample_ratio=0.5,
                             bg_color=BG)
    frames = _frames(5, h, w)
    ref = [one.step(f[None]) for f in frames]

    outs = []
    for f in frames:
        r = pp.step(f)
        if r is not None:
            outs.append(r)
    outs.append(pp.flush())
    assert pp.step(frames[0]) is not None  # pipe stays primed after flush

    assert len(outs) == len(frames)
    for (a_pp, rgba_pp), (a_1, rgba_1) in zip(outs, ref):
        assert np.abs(a_pp.astype(int) - a_1[0].astype(int)).max() <= 1
        assert np.abs(rgba_pp.astype(int) - rgba_1[0].astype(int)).max() <= 1


def test_pipelined_convert_alignment_and_chunking():
    """convert() hides the skew: exactly one aligned output per input,
    for clip lengths that do and don't divide the chunk, and chunked
    dispatch (lax.scan inside the shard_map) matches per-frame."""
    cfg = ModelConfig(conv_impl="planar")
    h = w = 64
    mesh = _mesh2()
    pp1 = PipelinedMatting(h, w, mesh, cfg=cfg, dtype="float32",
                           downsample_ratio=0.5, bg_color=BG,
                           pallas_interpret=True)
    ppk = PipelinedMatting(h, w, mesh, cfg=cfg, variables=pp1.variables,
                           dtype="float32", downsample_ratio=0.5,
                           bg_color=BG, chunk=3, pallas_interpret=True)
    for n in (5, 6, 2):
        frames = _frames(n, h, w, seed=n)
        o1 = list(pp1.convert(frames))
        ok = list(ppk.convert(frames))
        assert len(o1) == n and len(ok) == n
        for (a1, r1), (ak, rk) in zip(o1, ok):
            assert np.abs(r1.astype(int) - rk.astype(int)).max() <= 1


def test_pipelined_reset_reproducible():
    cfg = ModelConfig(conv_impl="planar")
    h = w = 64
    pp = PipelinedMatting(h, w, _mesh2(), cfg=cfg, dtype="float32",
                          downsample_ratio=0.5, bg_color=BG,
                          pallas_interpret=True)
    frames = _frames(4, h, w, seed=7)
    a = [r for r in pp.convert(frames)]
    b = [r for r in pp.convert(frames)]
    for (aa, ar), (ba, br) in zip(a, b):
        np.testing.assert_array_equal(ar, br)


def test_pipelined_preconditions():
    cfg = ModelConfig(conv_impl="planar")
    with pytest.raises(ValueError, match="2 devices"):
        PipelinedMatting(64, 64, make_mesh(("pp",), devices=jax.devices()),
                         cfg=cfg, pallas_interpret=True)
    # Full-res serving (pool=1) has no coefficient boundary to cut at.
    with pytest.raises(ValueError, match="fused tail"):
        PipelinedMatting(64, 64, _mesh2(), cfg=cfg, downsample_ratio=1.0,
                         pallas_interpret=True)
    # step()/flush() are the chunk=1 streaming API: with chunk>1 they
    # must raise loudly instead of feeding a K=1 round into the K=chunk
    # compiled program (VERDICT r4 item 7 — the silent-retrace trap).
    pp = PipelinedMatting(64, 64, _mesh2(), cfg=cfg, dtype="float32",
                          downsample_ratio=0.5, bg_color=BG, chunk=2,
                          pallas_interpret=True)
    frame = _frames(1, 64, 64)[0]
    with pytest.raises(ValueError, match="chunk=1 streaming"):
        pp.step(frame)
    next(pp.convert(iter([frame])))  # prime so flush has an in-flight round
    with pytest.raises(ValueError, match="chunk=1 streaming"):
        pp.flush()


def test_pipelined_bg_blur_matches_single_device():
    """Portrait mode through the 2-stage pipeline: the coarse blurred
    background is a stage-0 product ppermuted with the coefficient
    grids, so pipelined bg_blur serving must match single-device bg_blur
    serving (+-1 u8 across separately compiled programs)."""
    cfg = ModelConfig(conv_impl="planar")
    h = w = 64
    pp = PipelinedMatting(h, w, _mesh2(), cfg=cfg, dtype="float32",
                          downsample_ratio=0.5, bg_blur=8,
                          pallas_interpret=True)
    one = MultiStreamMatting(1, h, w, cfg=cfg, variables=pp.variables,
                             dtype="float32", pallas_interpret=True,
                             use_pallas=True, downsample_ratio=0.5,
                             bg_blur=8)
    frames = _frames(4, h, w, seed=3)
    ref = [one.step(f[None]) for f in frames]

    outs = []
    for f in frames:
        r = pp.step(f)
        if r is not None:
            outs.append(r)
    outs.append(pp.flush())

    assert len(outs) == len(frames)
    for (a_pp, rgba_pp), (a_1, rgba_1) in zip(outs, ref):
        assert np.abs(a_pp.astype(int) - a_1[0].astype(int)).max() <= 1
        assert np.abs(rgba_pp.astype(int) - rgba_1[0].astype(int)).max() <= 1

    with pytest.raises(ValueError, match="mutually exclusive"):
        PipelinedMatting(h, w, _mesh2(), cfg=cfg, dtype="float32",
                         downsample_ratio=0.5, bg_color=BG, bg_blur=8,
                         pallas_interpret=True)


def test_pipelined_trimap_matches_single_device():
    """The trimap-conditioned family through the 2-stage pipeline: the
    trimap byte rides the frame (4-channel carry slot sized from the
    config — VERDICT r3 item 4), so pipelined serving must match
    single-device serving on identical 4-channel frames."""
    from vidmat.models.weights import init_params

    cfg = ModelConfig(use_trimap=True, space_to_depth=2,
                      conv_impl="planar")
    h = w = 64
    v = init_params(cfg)
    pp = PipelinedMatting(h, w, _mesh2(), cfg=cfg, variables=v,
                          dtype="float32", downsample_ratio=0.25,
                          bg_color=BG, pallas_interpret=True)
    one = MultiStreamMatting(1, h, w, cfg=cfg, variables=v,
                             dtype="float32", pallas_interpret=True,
                             use_pallas=True, downsample_ratio=0.25,
                             bg_color=BG)
    rng = np.random.RandomState(5)
    frames = []
    for i in range(4):
        rgb = rng.randint(0, 255, (h, w, 3), np.uint8)
        tri = rng.choice([0, 128, 255], (h, w, 1)).astype(np.uint8)
        frames.append(np.concatenate([rgb, tri], axis=-1))
    ref = [one.step(f[None]) for f in frames]
    outs = list(pp.convert(frames))
    assert len(outs) == len(frames)
    for (a_pp, rgba_pp), (a_1, rgba_1) in zip(outs, ref):
        assert np.abs(rgba_pp.astype(int) - rgba_1[0].astype(int)).max() <= 1


def test_pipelined_plate_matches_single_device():
    """The clean-plate family through the pipeline: the plate is a
    stage-0 traced constant (nothing rides the carry/ring), so pipelined
    output must match single-device plate serving."""
    from vidmat.models.weights import init_params

    cfg = ModelConfig(use_bg_plate=True, space_to_depth=2,
                      conv_impl="planar")
    h = w = 64
    v = init_params(cfg)
    rng = np.random.RandomState(9)
    plate = rng.randint(0, 255, (h, w, 3), np.uint8)
    pp = PipelinedMatting(h, w, _mesh2(), cfg=cfg, variables=v,
                          dtype="float32", downsample_ratio=0.25,
                          bg_color=BG, bg_plate=plate,
                          pallas_interpret=True)
    one = MultiStreamMatting(1, h, w, cfg=cfg, variables=v,
                             dtype="float32", pallas_interpret=True,
                             use_pallas=True, downsample_ratio=0.25,
                             bg_color=BG, bg_plate=plate)
    frames = _frames(4, h, w, seed=11)
    ref = [one.step(f[None]) for f in frames]
    outs = list(pp.convert(frames))
    assert len(outs) == len(frames)
    for (a_pp, rgba_pp), (a_1, rgba_1) in zip(outs, ref):
        assert np.abs(rgba_pp.astype(int) - rgba_1[0].astype(int)).max() <= 1


def test_pipelined_streams_dp_x_pp():
    """DP×PP composition (VERDICT r3 item 3): 4 streams × 2 stages over
    the full 8-device virtual mesh in ONE SPMD program, each stream
    bit-matching single-device serving (±1 u8 across separately compiled
    programs), per-frame and chunked."""
    from vidmat.parallel.pp import PipelinedStreams

    cfg = ModelConfig(conv_impl="planar")
    h = w = 64
    s = 4
    mesh = make_mesh(("stream", "pp"), (s, 2))
    pps = PipelinedStreams(s, h, w, mesh, cfg=cfg, dtype="float32",
                           downsample_ratio=0.5, bg_color=BG,
                           pallas_interpret=True)
    one = MultiStreamMatting(s, h, w, cfg=cfg, variables=pps.variables,
                             dtype="float32", pallas_interpret=True,
                             use_pallas=True, downsample_ratio=0.5,
                             bg_color=BG)
    rng = np.random.RandomState(21)
    rounds = [rng.randint(0, 255, (s, h, w, 3), np.uint8)
              for _ in range(5)]
    ref = [one.step(r) for r in rounds]

    outs = list(pps.convert(rounds))
    assert len(outs) == len(rounds)
    for (a_pp, rgba_pp), (a_1, rgba_1) in zip(outs, ref):
        assert rgba_pp.shape == (s, h, w, 4)
        assert np.abs(rgba_pp.astype(int) - rgba_1.astype(int)).max() <= 1

    # chunked dispatch (lax.scan inside the 2-axis shard_map)
    ppk = PipelinedStreams(s, h, w, mesh, cfg=cfg,
                           variables=pps.variables, dtype="float32",
                           downsample_ratio=0.5, bg_color=BG, chunk=2,
                           pallas_interpret=True)
    outk = list(ppk.convert(rounds))
    assert len(outk) == len(rounds)
    for (a1, r1), (ak, rk) in zip(outs, outk):
        assert np.abs(r1.astype(int) - rk.astype(int)).max() <= 1

    with pytest.raises(ValueError, match="num_streams"):
        PipelinedStreams(3, h, w, mesh, cfg=cfg, pallas_interpret=True)

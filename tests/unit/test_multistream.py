"""Multi-stream serving tests on the virtual 8-device CPU mesh
(BASELINE.json:11; SURVEY.md §4 'multi-device tests without a cluster')."""

import pytest as _pytest_tier

# Full-tier only (tests/README.md): compile-heavy mesh/interpret
# programs, process spawns, long rollouts, or e2e conversions.
pytestmark = _pytest_tier.mark.slow


import numpy as np
import pytest

import jax

from vidmat.config import ModelConfig
from vidmat.io.fixtures import synthetic_frames_only
from vidmat.parallel.mesh import make_mesh
from vidmat.parallel.multistream import MultiStreamMatting


def test_multistream_matches_single_stream():
    """8 streams batched over the mesh must produce the same mattes as
    stepping each stream alone (streams are independent)."""
    cfg = ModelConfig()
    h = w = 64
    mesh = make_mesh(("stream",), (8,))
    ms = MultiStreamMatting(8, h, w, cfg=cfg, mesh=mesh, dtype="float32")

    rng = np.random.RandomState(0)
    frames = [rng.randint(0, 255, (8, h, w, 3), np.uint8) for _ in range(3)]
    outs = [ms.step(f)[0] for f in frames]

    # Reference: stream 5 alone through an unsharded 1-stream instance.
    one = MultiStreamMatting(1, h, w, cfg=cfg, variables=ms.variables,
                             dtype="float32")
    for t, f in enumerate(frames):
        a1, _ = one.step(f[5:6])
        np.testing.assert_allclose(outs[t][5], a1[0], atol=1)


def test_multistream_mesh_runs_pallas_planar_body():
    """The meshed path must run the SAME planar/fused Pallas serving body
    as the single-chip path (VERDICT r2 item 1): under jax.shard_map the
    kernels are per-device local, so nothing falls back to XLA convs.
    Verified here with interpret-mode kernels on the virtual 8-device
    mesh: meshed outputs match the single-device batched planar path
    (+-1 u8 across separately compiled programs) and the chunked meshed
    dispatch matches per-frame meshed dispatch."""
    cfg = ModelConfig(conv_impl="planar")
    h = w = 64
    mesh = make_mesh(("stream",), (8,))
    ms = MultiStreamMatting(8, h, w, cfg=cfg, mesh=mesh, dtype="float32",
                            pallas_interpret=True, downsample_ratio=0.5)
    one = MultiStreamMatting(8, h, w, cfg=cfg, variables=ms.variables,
                             dtype="float32", pallas_interpret=True,
                             use_pallas=True, downsample_ratio=0.5)
    rng = np.random.RandomState(0)
    frames = [rng.randint(0, 255, (8, h, w, 3), np.uint8) for _ in range(3)]
    reset = np.zeros((8,), bool)
    for t, f in enumerate(frames):
        if t == 2:
            reset = np.array([0, 1, 0, 0, 0, 0, 1, 0], bool)
        a_mesh, o_mesh = ms.step(f, reset)
        a_one, o_one = one.step(f, reset)
        assert np.abs(a_mesh.astype(int) - a_one.astype(int)).max() <= 1
        assert np.abs(o_mesh.astype(int) - o_one.astype(int)).max() <= 1
    for lm, lo in zip(jax.tree_util.tree_leaves(ms.state),
                      jax.tree_util.tree_leaves(one.state)):
        np.testing.assert_allclose(np.asarray(lm), np.asarray(lo),
                                   atol=1e-5)

    # chunked meshed dispatch == per-frame meshed dispatch
    msk = MultiStreamMatting(8, h, w, cfg=cfg, variables=ms.variables,
                             mesh=mesh, dtype="float32",
                             pallas_interpret=True, chunk=3,
                             downsample_ratio=0.5)
    rs = np.zeros((3, 8), bool)
    rs[1, 0] = True
    ak, _ = msk.step(np.stack(frames), rs)
    ms2 = MultiStreamMatting(8, h, w, cfg=cfg, variables=ms.variables,
                             mesh=mesh, dtype="float32",
                             pallas_interpret=True, downsample_ratio=0.5)
    for t in range(3):
        a1, _ = ms2.step(frames[t], rs[t])
        assert np.abs(ak[t].astype(int) - a1.astype(int)).max() <= 1


def test_multistream_mesh_rejects_uneven_streams():
    mesh = make_mesh(("stream",), (8,))
    try:
        MultiStreamMatting(6, 64, 64, cfg=ModelConfig(), mesh=mesh)
        raise AssertionError("expected ValueError")
    except ValueError as e:
        assert "divide evenly" in str(e)


def test_multistream_reset_isolation():
    """Resetting one stream's state must not perturb the others."""
    cfg = ModelConfig()
    h = w = 48
    ms = MultiStreamMatting(4, h, w, cfg=cfg, dtype="float32")
    rng = np.random.RandomState(1)
    f = rng.randint(0, 255, (4, h, w, 3), np.uint8)
    ms.step(f)  # warm state
    # continue without reset
    ms2 = MultiStreamMatting(4, h, w, cfg=cfg, variables=ms.variables,
                             dtype="float32")
    ms2.step(f)
    reset = np.array([False, True, False, False])
    a_reset, _ = ms.step(f, reset)
    a_plain, _ = ms2.step(f, np.zeros(4, bool))
    # unreset streams identical
    for i in (0, 2, 3):
        np.testing.assert_array_equal(a_reset[i], a_plain[i])
    # reset stream == cold start on that frame... verify vs fresh instance
    cold = MultiStreamMatting(1, h, w, cfg=cfg, variables=ms.variables,
                              dtype="float32")
    cold.step(f[1:2])  # first step from zero state != warm continuation
    a_cold, _ = cold.step(f[1:2], np.array([True]))  # re-reset then step
    np.testing.assert_array_equal(a_reset[1], a_cold[0])


def test_multistream_serve_stream_end():
    """A stream ending early must not stall the batch (per-stream isolation,
    SURVEY.md §5)."""
    cfg = ModelConfig()
    h, w = 48, 64
    ms = MultiStreamMatting(2, h, w, cfg=cfg, dtype="float32")
    srcs = [list(synthetic_frames_only(h, w, 6)),
            list(synthetic_frames_only(h, w, 3, seed=2))]  # second ends early
    got = []
    summary = ms.serve(srcs, on_output=lambda i, n, a, o: got.append((i, n)))
    assert summary["batch_steps"] >= 6
    # stream 0 delivered all 6 frames; stream 1 stopped at 3
    assert len([1 for i, n in got if i == 0]) == 6
    assert len([1 for i, n in got if i == 1]) == 3


def test_multistream_chunked_matches_per_frame():
    """chunk=K dispatch (K-frame lax.scan) must produce bit-identical
    mattes and final state to K per-frame dispatches (same serving body)."""
    cfg = ModelConfig()
    h = w = 48
    ms1 = MultiStreamMatting(2, h, w, cfg=cfg, dtype="float32")
    msk = MultiStreamMatting(2, h, w, cfg=cfg, variables=ms1.variables,
                             dtype="float32", chunk=3)
    rng = np.random.RandomState(7)
    frames = rng.randint(0, 255, (3, 2, h, w, 3), np.uint8)
    reset = np.zeros((3, 2), bool)
    reset[1, 0] = True  # mid-chunk scene cut on stream 0

    a_seq = [ms1.step(frames[t], reset[t])[0] for t in range(3)]
    a_chunk, _ = msk.step(frames, reset)
    for t in range(3):
        np.testing.assert_array_equal(a_chunk[t], a_seq[t])
    ref_state = jax.tree_util.tree_map(np.asarray, ms1.state)
    chunk_state = jax.tree_util.tree_map(np.asarray, msk.state)
    for r, c in zip(jax.tree_util.tree_leaves(ref_state),
                    jax.tree_util.tree_leaves(chunk_state)):
        np.testing.assert_array_equal(r, c)


def test_multistream_chunked_serve_tail_and_stream_end():
    """serve() with chunk>1: a stream ending mid-chunk and a max_frames
    boundary not divisible by chunk must both drain per-frame (no filler
    frames, no spurious resets); outputs must match the chunk=1 serve."""
    cfg = ModelConfig()
    h, w = 48, 64
    ms1 = MultiStreamMatting(2, h, w, cfg=cfg, dtype="float32")
    msk = MultiStreamMatting(2, h, w, cfg=cfg, variables=ms1.variables,
                             dtype="float32", chunk=4)

    def srcs():
        return [list(synthetic_frames_only(h, w, 7)),
                list(synthetic_frames_only(h, w, 5, seed=2))]

    got1, gotk = {}, {}
    ms1.serve(srcs(), on_output=lambda i, n, a, o: got1.__setitem__((i, n), a))
    summary = msk.serve(srcs(),
                        on_output=lambda i, n, a, o: gotk.__setitem__((i, n), a))
    assert set(got1) == set(gotk)
    assert len([k for k in gotk if k[0] == 0]) == 7
    assert len([k for k in gotk if k[0] == 1]) == 5
    assert summary["latency_granularity"] == "per-4-round-dispatch"
    for k in got1:
        np.testing.assert_array_equal(got1[k], gotk[k])

    # max_frames cuts mid-chunk: 3 of chunk 4 -> per-frame tail, and a
    # subsequent serve continues cleanly.
    msk2 = MultiStreamMatting(2, h, w, cfg=cfg, variables=ms1.variables,
                              dtype="float32", chunk=4)
    got = []
    s = msk2.serve([list(synthetic_frames_only(h, w, 8)),
                    list(synthetic_frames_only(h, w, 8, seed=2))],
                   on_output=lambda i, n, a, o: got.append((i, n)),
                   max_frames=3)
    assert s["batch_steps"] == 3
    assert len(got) == 6


def test_multistream_bg_blur_portrait():
    """Portrait mode (bg_blur) across the mesh: each stream composites
    over a blur of its OWN frames — the coarse background is synthesized
    per batch row inside the serving body, so it shards with the stream
    axis. Meshed output must match the unmeshed batched instance, and the
    second output is the composition (not raw foreground)."""
    import pytest

    cfg = ModelConfig(conv_impl="planar")
    h = w = 64
    mesh = make_mesh(("stream",), (8,))
    ms = MultiStreamMatting(8, h, w, cfg=cfg, mesh=mesh, dtype="float32",
                            pallas_interpret=True, downsample_ratio=0.5,
                            bg_blur=8)
    one = MultiStreamMatting(8, h, w, cfg=cfg, variables=ms.variables,
                             dtype="float32", pallas_interpret=True,
                             use_pallas=True, downsample_ratio=0.5,
                             bg_blur=8)
    rng = np.random.RandomState(1)
    for _ in range(2):
        f = rng.randint(0, 255, (8, h, w, 3), np.uint8)
        a_mesh, c_mesh = ms.step(f)
        a_one, c_one = one.step(f)
        assert c_mesh.shape[-1] == 4  # composition RGBA, not raw fgr
        assert np.abs(a_mesh.astype(int) - a_one.astype(int)).max() <= 1
        assert np.abs(c_mesh.astype(int) - c_one.astype(int)).max() <= 1

    with pytest.raises(ValueError, match="mutually exclusive"):
        MultiStreamMatting(2, h, w, cfg=cfg, variables=ms.variables,
                           bg_color=(0.0, 1.0, 0.0), bg_blur=8)


def test_multistream_trimap_conditioned():
    """A trimap-conditioned config serves S streams of (H, W, 4) frames
    (RGB + per-stream trimap channel) and matches the single-stream
    reference; 3-channel frames are rejected loudly."""
    from vidmat.models.weights import init_params

    cfg = ModelConfig(use_trimap=True, recurrent=False)
    h = w = 64
    v = init_params(cfg)
    mesh = make_mesh(("stream",), (8,))
    ms = MultiStreamMatting(8, h, w, cfg=cfg, variables=v, mesh=mesh,
                            dtype="float32", downsample_ratio=1.0)
    rng = np.random.RandomState(7)
    f = rng.randint(0, 255, (8, h, w, 4), np.uint8)
    # quantize the trimap channel to the {0, 128, 255} convention
    f[..., 3] = np.array([0, 128, 255], np.uint8)[
        np.digitize(f[..., 3], [85, 170])]
    a, _ = ms.step(f)

    one = MultiStreamMatting(1, h, w, cfg=cfg, variables=v,
                             dtype="float32", downsample_ratio=1.0)
    a1, _ = one.step(f[3:4])
    np.testing.assert_allclose(a[3], a1[0], atol=1)

    with pytest.raises(ValueError, match="4"):
        ms.step(f[..., :3])


def test_multistream_bg_plate_conditioned():
    """A plate-conditioned config serves with one SHARED plate on the
    mesh (replicated constant, broadcast to the local shard) and with
    PER-STREAM plates on the single-chip path; per-stream + mesh is
    rejected loudly."""
    from vidmat.io.fixtures import synthetic_plate_frame
    from vidmat.models.weights import init_params

    cfg = ModelConfig(use_bg_plate=True, recurrent=False)
    h = w = 64
    v = init_params(cfg)
    _, _, plate = synthetic_plate_frame(h, w, 0.0, seed=1)
    mesh = make_mesh(("stream",), (8,))
    ms = MultiStreamMatting(8, h, w, cfg=cfg, variables=v, mesh=mesh,
                            dtype="float32", downsample_ratio=1.0,
                            bg_plate=plate)
    rng = np.random.RandomState(11)
    f = rng.randint(0, 255, (8, h, w, 3), np.uint8)
    a, _ = ms.step(f)

    one = MultiStreamMatting(1, h, w, cfg=cfg, variables=v,
                             dtype="float32", downsample_ratio=1.0,
                             bg_plate=plate)
    a1, _ = one.step(f[4:5])
    np.testing.assert_allclose(a[4], a1[0], atol=1)

    # per-stream plates, single chip: stream i gets plate i — streams
    # with different plates must produce different mattes on the same
    # frame (random weights: plate taps are nonzero)
    plates = np.stack([np.roll(plate, 9 * i, axis=1) for i in range(2)])
    two = MultiStreamMatting(2, h, w, cfg=cfg, variables=v,
                             dtype="float32", downsample_ratio=1.0,
                             bg_plate=plates)
    same = np.stack([f[0], f[0]])
    a2, _ = two.step(same)
    assert np.abs(a2[0].astype(int) - a2[1].astype(int)).max() > 0

    with pytest.raises(ValueError, match="single-chip"):
        MultiStreamMatting(8, h, w, cfg=cfg, variables=v, mesh=mesh,
                           dtype="float32", downsample_ratio=1.0,
                           bg_plate=np.stack([plate] * 8))
    with pytest.raises(ValueError, match="num_streams"):
        MultiStreamMatting(8, h, w, cfg=cfg, variables=v,
                           dtype="float32", downsample_ratio=1.0,
                           bg_plate=np.stack([plate] * 3))

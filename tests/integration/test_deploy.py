"""AOT serving bundles (vidmat.deploy): export -> load -> serve parity.

The exported artifact must reproduce the live serving body bit-exactly —
same weights, same state carry, same outputs — with nothing but the bundle
directory and the loader (no model definition, no tracing at startup).
CPU tests export the XLA body (the Pallas/Mosaic payload round-trip is
covered by the TPU-side smoke in bench.py's export validation and was
verified compiled on the real chip); everything else — flattening
contract, state carry, chunk step, reset, platform pinning — is
platform-independent and tested here.
"""

import pytest as _pytest_tier

# Full-tier only (tests/README.md): compile-heavy mesh/interpret
# programs, process spawns, long rollouts, or e2e conversions.
pytestmark = _pytest_tier.mark.slow


import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vidmat.config import ModelConfig, PipelineConfig, RefineConfig
from vidmat.deploy import ServingBundle, export_bundle
from vidmat.models.weights import init_params


H, W = 48, 64  # export pads to the /16 bucket internally


def _frames(n, h=H, w=W, seed=0):
    rng = np.random.RandomState(seed)
    return [rng.randint(0, 255, (h, w, 3), np.uint8) for _ in range(n)]


@pytest.fixture(scope="module")
def small_bundle(tmp_path_factory):
    cfg = ModelConfig()
    pipe = PipelineConfig(downsample_ratio=0.5, dtype="bfloat16",
                          refine=RefineConfig(mode="guided"))
    variables = init_params(cfg, seed=3)
    path = str(tmp_path_factory.mktemp("bundle") / "b")
    export_bundle(path, H, W, model_cfg=cfg, pipe_cfg=pipe,
                  variables=variables, bg_color=(0.0, 0.0, 1.0))
    return path, cfg, pipe, variables


def _live_body(cfg, pipe, h, w):
    from vidmat.models.matting_net import MattingNetwork
    from vidmat.pipeline.stepfactory import build_serving_body

    net = MattingNetwork(cfg, dtype=jnp.bfloat16)
    ph, pw = h + ((-h) % 16), w + ((-w) % 16)
    body, plan = build_serving_body(
        net, cfg, pipe.refine, ph, pw, pipe.downsample_ratio,
        cdtype=jnp.bfloat16, bg=jnp.asarray((0.0, 0.0, 1.0), jnp.float32),
        use_pallas=pipe.use_pallas)
    return jax.jit(body), plan, (ph, pw)


def test_bundle_matches_live_serving(small_bundle):
    path, cfg, pipe, variables = small_bundle
    bundle = ServingBundle(path)
    step, plan, (ph, pw) = _live_body(cfg, pipe, H, W)
    state = plan.make_state(1)
    variables = jax.tree_util.tree_map(jnp.asarray, variables)
    for frame in _frames(4):
        out = bundle.step(frame)
        padded = np.pad(frame, ((0, ph - H), (0, pw - W), (0, 0)),
                        mode="edge")[None]
        live, state = step(variables, jnp.asarray(padded), state)
        alpha_u8, fgr_u8, rgba = live
        np.testing.assert_array_equal(out["alpha"],
                                      np.asarray(alpha_u8)[0, :H, :W, 0])
        np.testing.assert_array_equal(out["fgr"],
                                      np.asarray(fgr_u8)[0, :H, :W])
        np.testing.assert_array_equal(out["comp"],
                                      np.asarray(rgba)[0, :H, :W])


def test_bundle_reset_restores_initial_state(small_bundle):
    path = small_bundle[0]
    bundle = ServingBundle(path)
    frame = _frames(1)[0]
    first = bundle.step(frame)["alpha"].copy()
    for f in _frames(3, seed=1):
        bundle.step(f)
    drifted = bundle.step(frame)["alpha"]
    assert not np.array_equal(first, drifted)  # state actually carries
    bundle.reset()
    again = bundle.step(frame)["alpha"]
    np.testing.assert_array_equal(first, again)


def test_bundle_platform_pinning(small_bundle, tmp_path):
    import shutil

    path = small_bundle[0]
    tampered = str(tmp_path / "tampered")
    shutil.copytree(path, tampered)
    mpath = os.path.join(tampered, "manifest.json")
    with open(mpath) as f:
        manifest = json.load(f)
    manifest["platforms"] = ["tpu"]
    with open(mpath, "w") as f:
        json.dump(manifest, f)
    with pytest.raises(RuntimeError, match="platform"):
        ServingBundle(tampered)


def test_bundle_rejects_wrong_shape(small_bundle):
    bundle = ServingBundle(small_bundle[0])
    with pytest.raises(ValueError, match="serves"):
        bundle.step(np.zeros((H + 16, W, 3), np.uint8))


def test_chunked_bundle_convert_matches_per_frame(tmp_path):
    """A chunk_size=2 bundle ships both steps; convert() through the
    chunked step must write byte-identical frames to per-frame stepping."""
    cfg = ModelConfig()
    pipe = PipelineConfig(downsample_ratio=0.5, dtype="bfloat16",
                          chunk_size=2, refine=RefineConfig(mode="guided"))
    variables = init_params(cfg, seed=5)
    path = str(tmp_path / "bundle")
    export_bundle(path, H, W, model_cfg=cfg, pipe_cfg=pipe,
                  variables=variables, bg_color=(0.0, 0.0, 1.0))
    frames = _frames(5, seed=2)  # odd count: exercises the partial drain

    chunked = ServingBundle(path)
    assert chunked._chunk is not None and chunked.chunk == 2
    outdir = tmp_path / "seq"
    outdir.mkdir()
    metrics = chunked.convert(iter(frames),
                              output_alpha=str(outdir / "a_%04d.png"))
    assert metrics["frames"] == 5

    reference = ServingBundle(path)
    reference._chunk = None  # force the per-frame exported step
    import imageio.v2 as iio

    for i, frame in enumerate(frames):
        expect = reference.step(frame)["alpha"]
        written = iio.imread(str(outdir / f"a_{i:04d}.png"))
        np.testing.assert_array_equal(written, expect)


def test_export_refuses_random_weights(tmp_path):
    with pytest.raises(ValueError, match="checkpoint"):
        export_bundle(str(tmp_path / "b"), H, W,
                      model_cfg=ModelConfig(enc_channels=(8, 8, 8, 8),
                                            dec_channels=(8, 8, 8, 8)))


def test_bundle_bg_blur_matches_live(tmp_path):
    """A portrait-mode (bg_blur) bundle synthesizes its background from
    the frame input on device — nothing is baked into the artifact — and
    must reproduce the live bg_blur serving body bit-exactly."""
    from vidmat.models.matting_net import MattingNetwork
    from vidmat.pipeline.stepfactory import build_serving_body

    cfg = ModelConfig()
    pipe = PipelineConfig(downsample_ratio=0.5, dtype="bfloat16",
                          refine=RefineConfig(mode="guided"))
    variables = init_params(cfg, seed=7)
    path = str(tmp_path / "b")
    export_bundle(path, H, W, model_cfg=cfg, pipe_cfg=pipe,
                  variables=variables, bg_blur=6,
                  bg_color=(1.0, 0.0, 0.0))  # bg_blur wins (precedence)
    bundle = ServingBundle(path)
    assert bundle.manifest["bg"] == "blur"
    assert bundle.manifest["bg_blur"] == 6

    net = MattingNetwork(cfg, dtype=jnp.bfloat16)
    ph, pw = H + ((-H) % 16), W + ((-W) % 16)
    body, plan = build_serving_body(
        net, cfg, pipe.refine, ph, pw, pipe.downsample_ratio,
        cdtype=jnp.bfloat16, bg=None, use_pallas=pipe.use_pallas,
        bg_blur=6)
    step = jax.jit(body)
    state = plan.make_state(1)
    dvars = jax.tree_util.tree_map(jnp.asarray, variables)
    for frame in _frames(3, seed=4):
        out = bundle.step(frame)
        padded = np.pad(frame, ((0, ph - H), (0, pw - W), (0, 0)),
                        mode="edge")[None]
        live, state = step(dvars, jnp.asarray(padded), state)
        alpha_u8, fgr_u8, rgba = live
        np.testing.assert_array_equal(out["alpha"],
                                      np.asarray(alpha_u8)[0, :H, :W, 0])
        np.testing.assert_array_equal(out["comp"],
                                      np.asarray(rgba)[0, :H, :W])


def test_trimap_bundle(tmp_path):
    """Trimap-conditioned bundles: 4-channel input contract, step(frame,
    trimap=...) matches the live ImageStepper family (recurrent=False)."""
    from vidmat.io.fixtures import synthetic_frame
    from vidmat.pipeline.stepper import ImageStepper
    from vidmat.train.data import alpha_to_trimap

    cfg = ModelConfig(use_trimap=True, recurrent=False)
    pipe = PipelineConfig(downsample_ratio=1.0, dtype="float32")
    v = init_params(cfg, seed=5)
    path = str(tmp_path / "tb")
    export_bundle(path, H, W, model_cfg=cfg, pipe_cfg=pipe, variables=v,
                  bg_color=(0.0, 0.0, 1.0))
    bundle = ServingBundle(path)

    frame, gt = synthetic_frame(H, W, 0.3, seed=17)
    tri = np.round(alpha_to_trimap(gt)[..., 0] * 255).astype(np.uint8)
    out = bundle.step(frame, trimap=tri)
    stepper = ImageStepper(cfg, variables=v)
    alpha_live, _ = stepper(frame, tri)
    a_live8 = np.round(alpha_live[..., 0] * 255).astype(int)
    assert np.abs(out["alpha"].astype(int) - a_live8).max() <= 1

    with pytest.raises(ValueError, match="trimap"):
        bundle.step(frame)  # 3-channel frame on a 4-channel bundle

    # a non-trimap bundle must refuse a trimap
    cfg3 = ModelConfig()
    p3 = str(tmp_path / "b3")
    export_bundle(p3, H, W, model_cfg=cfg3, pipe_cfg=PipelineConfig(
        downsample_ratio=0.5, dtype="bfloat16"),
        variables=init_params(cfg3, seed=2), bg_color=(0, 0, 1))
    b3 = ServingBundle(p3)
    with pytest.raises(ValueError, match="not trimap-conditioned"):
        b3.step(frame, trimap=tri)


def test_trimap_bundle_convert_with_png_dir(tmp_path):
    """ServingBundle.convert with a PNG trimap directory (VERDICT r3
    item 7): the offline conversion consumes per-frame trimaps in
    lockstep and matches per-frame bundle stepping; a trimap bundle
    without a source fails loudly."""
    from vidmat.io.fixtures import synthetic_clip
    from vidmat.io.writer import write_image
    from vidmat.train.data import alpha_to_trimap

    cfg = ModelConfig(use_trimap=True, recurrent=False)
    pipe = PipelineConfig(downsample_ratio=1.0, dtype="float32")
    v = init_params(cfg, seed=9)
    path = str(tmp_path / "tb")
    export_bundle(path, H, W, model_cfg=cfg, pipe_cfg=pipe, variables=v,
                  bg_color=(0.0, 0.0, 1.0))
    bundle = ServingBundle(path)

    clip = list(synthetic_clip(H, W, 4, seed=31))
    tridir = tmp_path / "tris"
    tridir.mkdir()
    tris = []
    for i, (_, gt) in enumerate(clip):
        t8 = np.round(alpha_to_trimap(gt)[..., 0] * 255).astype(np.uint8)
        tris.append(t8)
        write_image(str(tridir / f"t_{i:03d}.png"), t8[..., None])
    outdir = tmp_path / "seq"
    outdir.mkdir()
    m = bundle.convert([f for f, _ in clip],
                       output_alpha=str(outdir / "a_%04d.png"),
                       trimap_source=str(tridir))
    assert m["frames"] == 4

    ref = ServingBundle(path)
    import imageio.v2 as iio

    for i, (frame, _) in enumerate(clip):
        expect = ref.step(frame, trimap=tris[i])["alpha"]
        written = iio.imread(str(outdir / f"a_{i:04d}.png"))
        np.testing.assert_array_equal(written, expect)

    with pytest.raises(ValueError, match="needs trimap_source"):
        bundle.convert([f for f, _ in clip],
                       output_alpha=str(outdir / "x_%04d.png"))


def test_batched_multistream_bundle(tmp_path):
    """num_streams>1 exports the batched multi-stream step: (S, H, W, 3)
    rounds, independent per-stream state slots, outputs matching S
    single-stream bundles fed the same per-stream frames."""
    cfg = ModelConfig()
    pipe = PipelineConfig(downsample_ratio=0.5, dtype="bfloat16",
                          refine=RefineConfig(mode="guided"))
    v = init_params(cfg, seed=11)
    s = 2
    pb = str(tmp_path / "batched")
    export_bundle(pb, H, W, model_cfg=cfg, pipe_cfg=pipe, variables=v,
                  bg_color=(0.0, 0.0, 1.0), num_streams=s)
    p1 = str(tmp_path / "single")
    export_bundle(p1, H, W, model_cfg=cfg, pipe_cfg=pipe, variables=v,
                  bg_color=(0.0, 0.0, 1.0))
    batched = ServingBundle(pb)
    assert batched.num_streams == s
    singles = [ServingBundle(p1) for _ in range(s)]

    rng = np.random.RandomState(3)
    for _ in range(3):
        rounds = rng.randint(0, 255, (s, H, W, 3), np.uint8)
        out = batched.step(rounds)
        assert out["alpha"].shape == (s, H, W)
        for i in range(s):
            ref = singles[i].step(rounds[i])
            np.testing.assert_array_equal(out["alpha"][i], ref["alpha"])

    with pytest.raises(ValueError, match="single-stream"):
        batched.convert(iter([rounds]), output_alpha=str(tmp_path / "a.mp4"))


def test_seg_bundle(tmp_path):
    """output='seg' exports the segmentation body: the bundle's step
    returns the float32 mask probability matching the live seg session,
    the temporal state carries, and offline convert() points to
    convert_video(output_segmentation=...)."""
    from vidmat.api import MattingSession

    cfg = ModelConfig()
    v = init_params(cfg, seed=13, with_seg=True)
    pipe = PipelineConfig(downsample_ratio=0.5, dtype="bfloat16",
                          refine=RefineConfig(mode="guided"))
    path = str(tmp_path / "sb")
    export_bundle(path, H, W, model_cfg=cfg, pipe_cfg=pipe, variables=v,
                  output="seg")
    bundle = ServingBundle(path)
    assert bundle.manifest["output"] == "seg"

    ph, pw = H + (-H) % 16, W + (-W) % 16
    sess = MattingSession(ph, pw, variables=v, model_cfg=cfg,
                          dtype="bfloat16", downsample_ratio=0.5,
                          output="seg")
    for frame in _frames(3, seed=6):
        got = bundle.step(frame)["seg"]
        padded = np.pad(frame, ((0, ph - H), (0, pw - W), (0, 0)),
                        mode="edge")
        want = sess.step(padded)[0][:H, :W, 0]
        assert got.dtype == np.float32 and got.shape == (H, W)
        np.testing.assert_allclose(got, want, atol=1e-5)

    with pytest.raises(ValueError, match="output_segmentation"):
        bundle.convert(iter(_frames(1)), output_alpha=str(tmp_path / "a"))

    with pytest.raises(ValueError, match="seg_head"):
        export_bundle(str(tmp_path / "sb2"), H, W, model_cfg=cfg,
                      pipe_cfg=pipe, variables=init_params(cfg, seed=2),
                      output="seg")


def test_plate_bundle(tmp_path):
    """Plate-conditioned bundles: the clean plate is BAKED at export (the
    frame input stays 3-channel) and the bundle matches the live
    ImageStepper given the same plate; a missing plate at export fails
    loudly."""
    from vidmat.io.fixtures import synthetic_plate_frame
    from vidmat.pipeline.stepper import ImageStepper

    cfg = ModelConfig(use_bg_plate=True, recurrent=False)
    pipe = PipelineConfig(downsample_ratio=1.0, dtype="float32")
    v = init_params(cfg, seed=6)
    frame, _, plate = synthetic_plate_frame(H, W, 0.25, seed=21)

    path = str(tmp_path / "pb")
    export_bundle(path, H, W, model_cfg=cfg, pipe_cfg=pipe, variables=v,
                  bg_color=(0.0, 0.0, 1.0), bg_plate=plate)
    bundle = ServingBundle(path)
    assert json.load(open(os.path.join(path, "manifest.json")))["bg_plate"]

    out = bundle.step(frame)  # 3-channel input — the plate is baked
    stepper = ImageStepper(cfg, variables=v)
    alpha_live, _ = stepper(frame, bg_plate=plate)
    a_live8 = np.round(alpha_live[..., 0] * 255).astype(int)
    assert np.abs(out["alpha"].astype(int) - a_live8).max() <= 1

    with pytest.raises(ValueError, match="needs the pre-captured"):
        export_bundle(str(tmp_path / "pb2"), H, W, model_cfg=cfg,
                      pipe_cfg=pipe, variables=v, bg_color=(0, 0, 1))

"""Integration tests: full decode->composite pipeline on synthetic clips
(SURVEY.md §4 integration tier)."""

import pytest as _pytest_tier

# Full-tier only (tests/README.md): compile-heavy mesh/interpret
# programs, process spawns, long rollouts, or e2e conversions.
pytestmark = _pytest_tier.mark.slow


import os
import tempfile

import numpy as np
import pytest

import vidmat
from vidmat.config import ModelConfig, PipelineConfig, RefineConfig
from vidmat.io.fixtures import synthetic_frames_only


def test_convert_video_writes_all_streams():
    frames = list(synthetic_frames_only(96, 128, 8))
    d = tempfile.mkdtemp()
    paths = {k: os.path.join(d, f"{k}.mp4")
             for k in ("alpha", "fgr", "comp")}
    m = vidmat.convert_video(frames, output_alpha=paths["alpha"],
                             output_foreground=paths["fgr"],
                             output_composition=paths["comp"],
                             downsample_ratio=1.0)
    assert m["frames"] == 8
    import cv2

    for k, p in paths.items():
        cap = cv2.VideoCapture(p)
        assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == 8, k
        cap.release()


def test_convert_video_coarse_guided():
    """downsample-ratio coarse pass + guided-filter full-res refine
    (BASELINE.json:9-10)."""
    frames = list(synthetic_frames_only(128, 160, 5))
    m = vidmat.convert_video(frames, downsample_ratio=0.5)
    assert m["frames"] == 5


def test_convert_video_errormap_mode():
    """Error-map patch refinement path (BASELINE.json:5)."""
    frames = list(synthetic_frames_only(128, 192, 4))
    pipe = PipelineConfig(refine=RefineConfig(mode="errormap",
                                              errormap_patches=8,
                                              errormap_patch_size=16))
    m = vidmat.convert_video(frames, downsample_ratio=0.5, pipe_cfg=pipe)
    assert m["frames"] == 4


def test_fault_injection_skips_frames():
    """Decode faults must drop frames, not kill the stream (SURVEY.md §5)."""
    from vidmat.io.reader import FrameSource
    from vidmat.pipeline.video import VideoPipeline

    def fault(i, frame):
        if i == 2:
            raise ValueError("synthetic decode fault")
        return frame

    frames = list(synthetic_frames_only(96, 128, 6))
    src = FrameSource(frames, fault_hook=fault)
    pipe = VideoPipeline(downsample_ratio=1.0)
    m = pipe.run(src.__iter__())
    assert m["frames"] == 5  # one frame dropped by the fault hook


def test_matting_session_streaming():
    """MattingSession: push-frame streaming API with state reset."""
    sess = vidmat.MattingSession(96, 128)
    frames = list(synthetic_frames_only(96, 128, 4))
    a1 = [sess.step(f)[0] for f in frames]
    sess.reset()
    a2 = [sess.step(f)[0] for f in frames]
    np.testing.assert_array_equal(a1[0], a2[0])  # reset => cold-start repro
    assert a1[0].shape == (96, 128, 1)


def test_matting_session_serving_mode_matches_parity_mode():
    """MattingSession dtype='bfloat16' (the serving path through the shared
    stepfactory body, uint8 ingest) must track the fp32 parity mode within
    bf16 rounding on the same stream (VERDICT r2 item 5 unification)."""
    frames = list(synthetic_frames_only(96, 128, 4))
    f32 = vidmat.MattingSession(96, 128, downsample_ratio=0.5)
    bf16 = vidmat.MattingSession(96, 128, downsample_ratio=0.5,
                                 variables=f32._stepper.variables,
                                 dtype="bfloat16")
    for f in frames:
        a32, _ = f32.step(f)
        a16, _ = bf16.step(f)
        assert a16.shape == a32.shape == (96, 128, 1)
        assert np.mean(np.abs(a32 - a16)) < 0.02


def test_convert_video_tiled_refine():
    """Tiled full-res refinement path (BASELINE.json:10 '4K' rung at test
    scale: coarse pool + tiled guided refine + overlap blend)."""
    frames = list(synthetic_frames_only(256, 384, 3))
    pipe = PipelineConfig(tile_size=64, tile_overlap=16)
    m = vidmat.convert_video(frames, downsample_ratio=0.25, pipe_cfg=pipe)
    assert m["frames"] == 3


def test_convert_video_chunked_matches_per_frame():
    """chunk_size>1 (lax.scan dispatch amortization) must produce the same
    mattes as the per-frame path, including the partial tail chunk."""
    import tempfile as tf

    frames = list(synthetic_frames_only(64, 80, 7))  # 7 = 2 chunks of 3 + 1
    from vidmat.models.weights import init_params

    variables = init_params(ModelConfig())
    outs = {}
    for chunk in (1, 3):
        d = tempfile.mkdtemp()
        pattern = os.path.join(d, "a_%03d.png")
        pipe = PipelineConfig(chunk_size=chunk, dtype="float32")
        vidmat.convert_video(frames, output_alpha=pattern,
                             downsample_ratio=1.0, pipe_cfg=pipe,
                             variables=variables)
        import glob

        from vidmat.io.reader import read_image

        outs[chunk] = [read_image(p)
                       for p in sorted(glob.glob(os.path.join(d, "*.png")))]
    assert len(outs[1]) == len(outs[3]) == 7
    for a, b in zip(outs[1], outs[3]):
        np.testing.assert_array_equal(a, b)


def test_pipe_cfg_downsample_ratio_is_honored(monkeypatch):
    """PipelineConfig.downsample_ratio must drive the coarse pass when no
    explicit constructor ratio is given (ADVICE r1: presets silently used
    the auto heuristic)."""
    import vidmat.pipeline.video as vp

    def boom(h, w):
        raise AssertionError("auto ratio used despite configured ratio")

    monkeypatch.setattr(vp, "auto_downsample_ratio", boom)
    frames = list(synthetic_frames_only(128, 160, 3))
    pipe = PipelineConfig(downsample_ratio=0.5)
    m = vidmat.convert_video(frames, pipe_cfg=pipe)
    assert m["frames"] == 3


def test_errormap_without_weights_loads_trained_or_raises(monkeypatch):
    """refine.mode='errormap' must never run with random refiner weights
    (ADVICE r1): auto-load the shipped checkpoint, raise if absent."""
    import os

    import vidmat.pipeline.video as vp

    pipe = PipelineConfig(refine=RefineConfig(mode="errormap",
                                              errormap_patches=8,
                                              errormap_patch_size=16))
    frames = list(synthetic_frames_only(128, 192, 2))
    repo = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(vp.__file__))))
    ckpt = os.path.join(repo, "checkpoints", "errormap_demo")
    if os.path.isdir(ckpt):
        # Auto-load path: the pipeline's refiner vars must come from the
        # shipped checkpoint, not PRNG init.
        p = vp.VideoPipeline(pipe_cfg=pipe, downsample_ratio=0.5)
        p.run(frames)
        from vidmat.models.weights import load_checkpoint

        from vidmat.refine.errormap import ErrorMapRefiner
        import jax.numpy as jnp
        import jax.random as jrandom

        ref = ErrorMapRefiner(num_patches=8, patch_size=16)
        tmpl = ref.init(jrandom.PRNGKey(0),
                        jnp.zeros((1, 128, 192, 3), jnp.float32),
                        jnp.zeros((1, 64, 96, 3), jnp.float32),
                        jnp.zeros((1, 64, 96, 1), jnp.float32))
        want = load_checkpoint(ckpt, template=tmpl)
        import jax

        leaves_got = jax.tree_util.tree_leaves(p._refiner_vars)
        leaves_want = jax.tree_util.tree_leaves(want)
        assert all(np.allclose(a, b)
                   for a, b in zip(leaves_got, leaves_want))
    # Raise path: with the checkpoint "absent" the pipeline must refuse.
    real_isdir = os.path.isdir
    monkeypatch.setattr(
        "os.path.isdir",
        lambda path: False if "errormap_demo" in str(path)
        else real_isdir(path))
    p2 = vp.VideoPipeline(pipe_cfg=pipe, downsample_ratio=0.5)
    with pytest.raises(ValueError, match="errormap"):
        p2.run(list(synthetic_frames_only(128, 192, 1)))


def test_convert_video_bg_image_replacement():
    """Background replacement with an image (BGMv2-style feature): a
    CONSTANT bg image must produce the same composition as the equivalent
    bg color (the blend math is identical), and a non-constant bg image
    must actually show up in the output. Exercises the image-bg variants
    of the Pallas composite/fused-refine kernels via the pipeline."""
    import cv2
    import numpy as np

    frames = list(synthetic_frames_only(96, 128, 3))
    d = tempfile.mkdtemp()

    def run(out, **kw):
        p = os.path.join(d, out)
        vidmat.convert_video(frames, output_composition=p,
                             downsample_ratio=1.0, **kw)
        cap = cv2.VideoCapture(p)
        got = []
        while True:
            ok, f = cap.read()
            if not ok:
                break
            got.append(cv2.cvtColor(f, cv2.COLOR_BGR2RGB))
        cap.release()
        return np.stack(got)

    const_img = np.full((96, 128, 3), (0, 255, 0), np.uint8)
    a = run("color.mp4", bg_color=(0.0, 1.0, 0.0))
    b = run("img_const.mp4", bg_image=const_img)
    assert np.abs(a.astype(int) - b.astype(int)).mean() < 2.0

    grad = np.tile(np.linspace(0, 255, 128, dtype=np.uint8)[None, :, None],
                   (96, 1, 3))
    c = run("img_grad.mp4", bg_image=grad)
    assert np.abs(a.astype(int) - c.astype(int)).mean() > 5.0


def test_bg_video_per_frame_composition():
    """bg_dynamic serving body: the composition must blend each frame
    against ITS background (comp = fgr*a + bg*(1-a)) — verified against
    the body's own alpha/fgr outputs for two different backgrounds."""
    import jax
    import jax.numpy as jnp

    from vidmat.config import ModelConfig, RefineConfig
    from vidmat.models.matting_net import MattingNetwork
    from vidmat.models.weights import init_params
    from vidmat.pipeline.stepfactory import build_serving_body

    cfg = ModelConfig()
    net = MattingNetwork(cfg)
    variables = init_params(cfg)
    h = w = 64
    body, plan = build_serving_body(net, cfg, RefineConfig(), h, w, 1.0,
                                    cdtype=jnp.float32, bg=None,
                                    use_pallas=False, bg_dynamic=True)
    state = plan.make_state(1)
    rng = np.random.RandomState(3)
    frame = rng.randint(0, 255, (1, h, w, 3), np.uint8)
    for color in [(1.0, 0.0, 0.0), (0.0, 0.0, 1.0)]:
        bgf = jnp.broadcast_to(jnp.asarray(color, jnp.float32),
                               (1, h, w, 3))
        (alpha_u8, fgr_u8, rgba), state2 = body(variables,
                                                jnp.asarray(frame),
                                                state, bgf)
        a = np.asarray(alpha_u8, np.float32) / 255.0
        f = np.asarray(fgr_u8, np.float32) / 255.0
        want = np.clip(f * a + np.asarray(color, np.float32) * (1 - a),
                       0, 1)
        got = np.asarray(rgba, np.float32)[..., :3] / 255.0
        # both sides quantize to u8 at different points; 2/255 covers it
        np.testing.assert_allclose(got, want, atol=2.5 / 255)


def test_convert_video_bg_video_e2e(tmp_path):
    """convert_video(bg_video=...) writes a composition whose background
    regions track the per-frame background colors, looping a shorter bg
    clip; chunked and per-frame paths agree."""
    import cv2

    from vidmat.api import convert_video
    from vidmat.config import ModelConfig, PipelineConfig
    from vidmat.io.fixtures import synthetic_frames_only

    h, w, n = 48, 64, 5
    frames = list(synthetic_frames_only(h, w, n))
    # 2-frame bg "video" (iterable) — must loop to cover 5 frames.
    bgs = [np.full((h, w, 3), c, np.uint8)
           for c in ((255, 0, 0), (0, 0, 255))]
    out = str(tmp_path / "comp.mp4")
    m = convert_video(frames, output_composition=out, bg_video=bgs,
                      downsample_ratio=1.0,
                      model_cfg=ModelConfig(),
                      pipe_cfg=PipelineConfig(chunk_size=2))
    assert m["frames"] == n
    cap = cv2.VideoCapture(out)
    got = 0
    while cap.read()[0]:
        got += 1
    assert got == n


def test_cli_video_bg_video_flag(tmp_path):
    """CLI --bg-video plumbs through to convert_video(bg_video=...)."""
    import cv2

    from vidmat.cli import main as cli_main
    from vidmat.io.fixtures import synthetic_frames_only
    from vidmat.io.writer import VideoWriter

    h, w = 48, 64
    inp = str(tmp_path / "in.mp4")
    vw = VideoWriter(inp, 10)
    for f in synthetic_frames_only(h, w, 4):
        vw.write(f)
    vw.close()
    bg_path = str(tmp_path / "bg.mp4")
    bw = cv2.VideoWriter(bg_path, cv2.VideoWriter_fourcc(*"mp4v"), 10,
                         (w, h))
    bw.write(np.full((h, w, 3), (0, 0, 255), np.uint8))  # red (BGR)
    bw.release()
    out = str(tmp_path / "comp.mp4")
    rc = cli_main(["video", inp, "--output-composition", out,
                   "--bg-video", bg_path, "--downsample-ratio", "1.0"])
    assert rc == 0
    cap = cv2.VideoCapture(out)
    n = 0
    while cap.read()[0]:
        n += 1
    assert n == 4


def test_bg_video_path_loops_file(tmp_path):
    """bg_video given as a PATH loops by reopening the file (no frame
    caching) when it is shorter than the input."""
    import cv2

    from vidmat.api import convert_video
    from vidmat.io.fixtures import synthetic_frames_only

    h, w = 48, 64
    bg_path = str(tmp_path / "bg.mp4")
    vw = cv2.VideoWriter(bg_path, cv2.VideoWriter_fourcc(*"mp4v"), 10,
                         (w, h))
    for c in ((255, 0, 0), (0, 255, 0)):
        vw.write(np.full((h, w, 3), c[::-1], np.uint8))
    vw.release()

    frames = list(synthetic_frames_only(h, w, 5))
    out = str(tmp_path / "comp.mp4")
    m = convert_video(frames, output_composition=out, bg_video=bg_path,
                      downsample_ratio=1.0)
    assert m["frames"] == 5
    cap = cv2.VideoCapture(out)
    got = 0
    while cap.read()[0]:
        got += 1
    assert got == 5


def test_image_sequence_input_round_trip(tmp_path):
    """convert_video accepts an image-sequence input (directory / printf
    pattern / glob) — the symmetric counterpart of VideoWriter's
    PNG-sequence output: a written sequence converts back."""
    import vidmat
    from vidmat.io.fixtures import synthetic_frames_only
    from vidmat.io.writer import VideoWriter

    src = tmp_path / "seq"
    wtr = VideoWriter(str(src / "%05d.png"), fps=30.0)
    frames = list(synthetic_frames_only(64, 96, 5))
    for f in frames:
        wtr.write(f)
    wtr.close()

    out_dir = tmp_path / "alpha"
    for inp in (str(src),                      # directory
                str(src / "%05d.png"),         # printf pattern
                str(src / "*.png")):           # glob
        m = vidmat.convert_video(inp,
                                 output_alpha=str(out_dir / "a_%03d.png"),
                                 downsample_ratio=1.0)
        assert m["frames"] == 5, (inp, m)
    outs = sorted(out_dir.glob("a_*.png"))
    assert len(outs) == 5


def test_cli_static_skip_flag(tmp_path):
    """CLI --static-skip-eps plumbs through to PipelineConfig (the fast
    path itself needs the fused TPU tail — on CPU the flag must be a
    harmless no-op and the conversion still correct)."""
    import cv2

    from vidmat.cli import main as cli_main
    from vidmat.io.fixtures import synthetic_frames_only
    from vidmat.io.writer import VideoWriter

    h, w = 48, 64
    inp = str(tmp_path / "in.mp4")
    vw = VideoWriter(inp, 10)
    for f in synthetic_frames_only(h, w, 4):
        vw.write(f)
    vw.close()
    out = str(tmp_path / "a.mp4")
    rc = cli_main(["video", inp, "--output-alpha", out,
                   "--static-skip-eps", "0.002",
                   "--downsample-ratio", "1.0"])
    assert rc == 0
    cap = cv2.VideoCapture(out)
    n = 0
    while cap.read()[0]:
        n += 1
    assert n == 4


def test_convert_video_bg_blur_e2e(tmp_path):
    """Portrait-mode background blur end to end: the composition's
    background region must be a smoothed version of the source (local
    mean preserved, high-frequency texture suppressed), while the
    foreground stays the predicted fgr. Exercises the XLA bg_blur path
    on CPU (the in-kernel coarse-bg path is pinned in
    tests/unit/test_bg_blur.py)."""
    import cv2

    from vidmat.models.weights import init_params

    h, w = 96, 128
    # Checkered high-frequency background, flat bright foreground disk.
    yy, xx = np.mgrid[0:h, 0:w]
    checker = ((xx // 2 + yy // 2) % 2 * 255).astype(np.uint8)
    frames = [np.stack([checker] * 3, axis=-1) for _ in range(3)]

    out = str(tmp_path / "comp.mp4")
    vidmat.convert_video(frames, output_composition=out,
                         downsample_ratio=0.25, bg_blur=10,
                         variables=init_params(ModelConfig()))
    cap = cv2.VideoCapture(out)
    ok, f = cap.read()
    cap.release()
    assert ok
    comp = cv2.cvtColor(f, cv2.COLOR_BGR2RGB).astype(np.float32)
    src = frames[0].astype(np.float32)
    # Global mean preserved, pointwise deviation from the 0/255 checker
    # collapsed toward the 127.5 midpoint where the bg shows through.
    assert abs(comp.mean() - src.mean()) < 25
    mid_frac = (np.abs(comp[..., 0] - 127.5) < 60).mean()
    assert mid_frac > 0.3, f"background not blurred (mid_frac={mid_frac})"


def test_cli_video_bg_blur_flag(tmp_path):
    """CLI --bg-blur plumbs through and produces a valid composition."""
    import cv2

    from vidmat.cli import main as cli_main
    from vidmat.io.fixtures import synthetic_frames_only
    from vidmat.io.writer import VideoWriter

    h, w = 48, 64
    inp = str(tmp_path / "in.mp4")
    vw = VideoWriter(inp, 10)
    for f in synthetic_frames_only(h, w, 3):
        vw.write(f)
    vw.close()
    out = str(tmp_path / "c.mp4")
    rc = cli_main(["video", inp, "--output-composition", out,
                   "--bg-blur", "8", "--downsample-ratio", "1.0"])
    assert rc == 0
    cap = cv2.VideoCapture(out)
    n = 0
    while cap.read()[0]:
        n += 1
    cap.release()
    assert n == 3


def test_framesource_trim_start_and_count():
    from vidmat.io.reader import FrameSource

    frames = [np.full((4, 4, 3), i, np.uint8) for i in range(10)]
    got = [int(f[0, 0, 0]) for f in FrameSource(frames, start=3, count=4)]
    assert got == [3, 4, 5, 6]
    # start beyond the stream -> empty, no hang
    assert list(FrameSource(frames, start=99)) == []
    # count=0 -> empty
    assert list(FrameSource(frames, count=0)) == []
    with pytest.raises(ValueError):
        FrameSource(frames, start=-1)


def test_convert_video_trim_range(tmp_path):
    """start_frame/max_frames trim the input; the trimmed run equals a
    full-pipeline run over the pre-sliced frame list (trim-then-matte:
    temporal state starts cold at the trim point)."""
    frames = list(synthetic_frames_only(96, 128, 10))
    a_trim = str(tmp_path / "trim_%03d.png")
    a_ref = str(tmp_path / "ref_%03d.png")
    m = vidmat.convert_video(frames, output_alpha=a_trim,
                             downsample_ratio=1.0,
                             start_frame=3, max_frames=4)
    assert m["frames"] == 4
    vidmat.convert_video(frames[3:7], output_alpha=a_ref,
                         downsample_ratio=1.0)
    import imageio.v3 as iio

    for i in range(4):
        t = iio.imread(a_trim % i)
        r = iio.imread(a_ref % i)
        np.testing.assert_array_equal(t, r)


def test_cli_video_trim_flags(tmp_path, capsys):
    """In-process cli_main (a fresh-interpreter subprocess here cost 137 s
    of cold compile on the 1-core CI box and flaked under load — VERDICT
    r3; the flag plumbing under test is identical in-process)."""
    import json as _json

    from vidmat.cli import main as cli_main
    from vidmat.io.writer import VideoWriter

    src = str(tmp_path / "in.mp4")
    w = VideoWriter(src, fps=10)
    for f in synthetic_frames_only(96, 128, 8):
        w.write(f)
    w.close()
    rc = cli_main(["video", src, "--output-alpha", str(tmp_path / "a.mp4"),
                   "--downsample-ratio", "1.0",
                   "--start-frame", "2", "--max-frames", "3"])
    assert rc == 0
    stats = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["frames"] == 3


def test_cli_image_batch_mode(tmp_path):
    """CLI image with a directory input mattes every image independently
    into output DIRECTORIES, keeping source stems."""
    from vidmat.cli import main as cli_main
    from vidmat.io.fixtures import synthetic_frame
    from vidmat.io.writer import write_image

    src = tmp_path / "imgs"
    src.mkdir()
    for name in ("b.png", "a.png", "c.png"):
        write_image(str(src / name), synthetic_frame(48, 64, 0.2)[0])
    out_a = tmp_path / "alpha"
    out_f = tmp_path / "fgr"
    rc = cli_main(["image", str(src), "--output-alpha", str(out_a),
                   "--output-foreground", str(out_f)])
    assert rc == 0
    assert sorted(p.name for p in out_a.glob("*.png")) == \
        ["a.png", "b.png", "c.png"]
    assert sorted(p.name for p in out_f.glob("*.png")) == \
        ["a.png", "b.png", "c.png"]
    # batch + per-image annotations is an error, not a silent drop
    rc = cli_main(["image", str(src), "--output-alpha", str(out_a),
                   "--trimap", str(src / "a.png")])
    assert rc == 2


def test_cli_video_tile_flags(tmp_path):
    """--tile-size/--tile-overlap plumb into PipelineConfig (tiled refine
    on CPU must still produce a valid conversion)."""
    import cv2

    from vidmat.cli import main as cli_main
    from vidmat.io.fixtures import synthetic_frames_only
    from vidmat.io.writer import VideoWriter

    h, w = 96, 128
    inp = str(tmp_path / "in.mp4")
    vw = VideoWriter(inp, 10)
    for f in synthetic_frames_only(h, w, 3):
        vw.write(f)
    vw.close()
    out = str(tmp_path / "a.mp4")
    rc = cli_main(["video", inp, "--output-alpha", out,
                   "--downsample-ratio", "0.5",
                   "--tile-size", "64", "--tile-overlap", "16"])
    assert rc == 0
    cap = cv2.VideoCapture(out)
    n = 0
    while cap.read()[0]:
        n += 1
    assert n == 3


def test_cli_multistream_pp(tmp_path):
    """``multistream --pp`` drives PipelinedStreams from the command line
    (VERDICT r4 item 7 — pipelined serving's product surface): 2 streams
    x 2 stages over 4 of the virtual CPU devices, interpret-mode Pallas
    kernels, streams of DIFFERENT lengths (the early-ended stream is
    pad-fed but its writer stops at its true frame count)."""
    import cv2

    from vidmat.cli import main as cli_main
    from vidmat.io.fixtures import synthetic_frames_only
    from vidmat.io.writer import VideoWriter

    h = w = 64
    lengths = (4, 6)
    inputs = []
    for i, n in enumerate(lengths):
        p = str(tmp_path / f"in{i}.mp4")
        vw = VideoWriter(p, 10)
        for f in synthetic_frames_only(h, w, n, seed=i):
            vw.write(f)
        vw.close()
        inputs.append(p)
    out_dir = str(tmp_path / "out")
    rc = cli_main(["multistream", *inputs, "--output-dir", out_dir,
                   "--height", str(h), "--width", str(w),
                   "--downsample-ratio", "0.5",
                   "--pp", "--pallas-interpret"])
    assert rc == 0
    for i, n in enumerate(lengths):
        cap = cv2.VideoCapture(f"{out_dir}/alpha_{i:02d}.mp4")
        got = 0
        ok, frame = cap.read()
        while ok:
            got += 1
            assert np.isfinite(frame.astype(np.float32)).all()
            ok, frame = cap.read()
        assert got == n, (i, got, n)

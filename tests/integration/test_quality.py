"""Quality gate: the shipped demo checkpoint must actually matte
(trained end-to-end on synthetic clips by the framework's own training
loop; SURVEY.md §4 integration tier with analytic ground truth)."""

import pytest as _pytest_tier

# Full-tier only (tests/README.md): compile-heavy mesh/interpret
# programs, process spawns, long rollouts, or e2e conversions.
pytestmark = _pytest_tier.mark.slow


import os

import numpy as np
import pytest

CKPT = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "checkpoints", "synthetic_demo")


@pytest.fixture(scope="module")
def demo_variables():
    if not os.path.isdir(CKPT):
        pytest.skip("demo checkpoint not present")
    from vidmat.config import ModelConfig
    from vidmat.models.weights import init_params, load_checkpoint

    return load_checkpoint(CKPT, template=init_params(ModelConfig()))


def test_demo_checkpoint_mattes_held_out_clip(demo_variables):
    from vidmat.api import MattingSession
    from vidmat.io.fixtures import synthetic_clip
    from vidmat.utils.metrics import mad

    sess = MattingSession(96, 96, variables=demo_variables)
    mads, ious = [], []
    for frame, gt in synthetic_clip(96, 96, 12, seed=987654):  # held out
        alpha, _ = sess.step(frame)
        mads.append(mad(alpha, gt))
        pred = alpha[..., 0] > 0.5
        gtb = gt[..., 0] > 0.5
        ious.append((pred & gtb).sum() / max((pred | gtb).sum(), 1))
    assert np.mean(mads) < 0.01, np.mean(mads)
    assert np.mean(ious) > 0.9, np.mean(ious)


def test_demo_checkpoint_generalizes_resolution(demo_variables):
    """The conv net is resolution-independent; a trained checkpoint must
    matte at a resolution it never saw."""
    from vidmat.api import MattingSession
    from vidmat.io.fixtures import synthetic_clip
    from vidmat.utils.metrics import mad

    sess = MattingSession(128, 160, variables=demo_variables)
    mads = []
    for frame, gt in synthetic_clip(128, 160, 8, seed=24680):
        alpha, _ = sess.step(frame)
        mads.append(mad(alpha, gt))
    assert np.mean(mads) < 0.02, np.mean(mads)


def test_default_weights_convert_video_mattes(tmp_path):
    """The zero-argument public API must produce real mattes (VERDICT r2
    item 2): convert_video with variables=None auto-loads the shipped
    trained checkpoint; the written alpha must match the analytic ground
    truth of a held-out synthetic clip."""
    if not os.path.isdir(CKPT):
        pytest.skip("demo checkpoint not present")
    import vidmat
    from vidmat.io.fixtures import synthetic_clip
    from vidmat.io.reader import VideoReader
    from vidmat.utils.metrics import mad

    clip = list(synthetic_clip(96, 96, 8, seed=424242))
    out = str(tmp_path / "alpha.mp4")
    vidmat.convert_video([f for f, _ in clip], output_alpha=out)
    alphas = [f[..., 0].astype(np.float32) / 255.0
              for f in VideoReader(out)]
    assert len(alphas) == len(clip)
    # mp4 encode quantizes; the gate is loose vs the raw 0.01 MAD gate.
    mads = [mad(a, gt[..., 0]) for a, (_, gt) in zip(alphas, clip)]
    assert np.mean(mads) < 0.03, np.mean(mads)


def test_default_weights_matte_image_mattes():
    """matte_image() with no variables must auto-load trained weights and
    produce a real matte on a held-out synthetic frame."""
    if not os.path.isdir(CKPT):
        pytest.skip("demo checkpoint not present")
    from vidmat.api import matte_image
    from vidmat.io.fixtures import synthetic_frame
    from vidmat.utils.metrics import mad

    frame, gt = synthetic_frame(96, 96, 0.4, seed=13579)
    alpha, _ = matte_image(frame)
    assert mad(alpha, gt) < 0.02, mad(alpha, gt)


def test_default_weights_refused_for_unshipped_config():
    """A config with no shipped checkpoint must raise loudly instead of
    silently serving random weights."""
    from vidmat.config import ModelConfig
    from vidmat.pipeline.video import VideoPipeline

    small = ModelConfig(enc_channels=(12, 16, 24, 40),
                        dec_channels=(32, 24, 16, 12))
    with pytest.raises(ValueError, match="random weights"):
        VideoPipeline(model_cfg=small)


def test_trimap_checkpoint_quality():
    """The trimap-conditioned variant (PR1 trimap rung) trained by the
    framework must matte held-out images. Round-4 retrain (mixed-res
    cosine fine-tune + ambiguous-twin curriculum, tools/train_eval.py
    --recurrent 0): held-out MAD 0.014 -> 0.0007 @96px; gate tightened
    0.01 -> 0.003 (VERDICT r3 item 1)."""
    ckpt = os.path.join(os.path.dirname(CKPT), "trimap_demo")
    if not os.path.isdir(ckpt):
        pytest.skip("trimap checkpoint not present")
    from vidmat.api import matte_image
    from vidmat.config import ModelConfig
    from vidmat.io.fixtures import synthetic_frame
    from vidmat.models.weights import init_params, load_checkpoint
    from vidmat.train.data import alpha_to_trimap
    from vidmat.utils.metrics import mad

    cfg = ModelConfig(use_trimap=True, recurrent=False)
    v = load_checkpoint(ckpt, template=init_params(cfg))
    frame, gt = synthetic_frame(64, 64, 0.37, seed=111)
    alpha, _ = matte_image(frame, trimap=alpha_to_trimap(gt)[..., 0],
                           variables=v, cfg=cfg)
    assert mad(alpha, gt) < 0.003


def test_trimap_checkpoint_trimap_is_load_bearing():
    """On the AMBIGUOUS twin-disk task only the per-frame trimap says
    which twin is the subject: the retrained checkpoint must matte the
    designated twin (the annotation is load-bearing, not decorative)."""
    ckpt = os.path.join(os.path.dirname(CKPT), "trimap_demo")
    if not os.path.isdir(ckpt):
        pytest.skip("trimap checkpoint not present")
    import numpy as np

    from vidmat.config import ModelConfig
    from vidmat.io.fixtures import synthetic_ambiguous_clip
    from vidmat.models.weights import init_params, load_checkpoint
    from vidmat.pipeline.stepper import ImageStepper
    from vidmat.train.data import alpha_to_trimap
    from vidmat.utils.metrics import mad

    cfg = ModelConfig(use_trimap=True, recurrent=False)
    stepper = ImageStepper(cfg, variables=load_checkpoint(
        ckpt, template=init_params(cfg)))
    for target in (0, 1):
        mads = [mad(stepper(f, alpha_to_trimap(gt[..., 0]))[0], gt)
                for f, gt in synthetic_ambiguous_clip(
                    96, 96, 4, seed=24680, target=target)]
        assert np.mean(mads) < 0.003, (target, np.mean(mads))


# Hard-gate seeds, DISJOINT from the QUALITY.md report seeds (987654,
# 24680, 1357911) and the training-eval seeds — "held-out" stopped doing
# double duty as the regression pin (VERDICT r4 item 2). Training clip
# seeds draw from randint(0, 10000), so anything >= 10000 is unseen.
HARD_GATE_SEEDS = (31415, 271828)


def test_hard_suite_gates():
    """Base and fast checkpoints must matte the HARD held-out suite
    (panning multi-octave background, hair filaments, sweeping occluder,
    sensor noise — io/fixtures.synthetic_hard_clip). Before the round-4
    hard-content fine-tune both measured ~0.036 MAD here; the fine-tune
    (train_eval --hard 0.5) brought fast to ~0.012 with the plain score
    intact — the gate pins that from ever regressing silently. Round 5:
    gate seeds moved off the report seeds (measured there: base 0.0102,
    fast 0.0129)."""
    import numpy as np

    from vidmat.api import MattingSession
    from vidmat.config import ModelConfig
    from vidmat.io.fixtures import synthetic_hard_clip
    from vidmat.models.weights import init_params, load_checkpoint
    from vidmat.utils.metrics import mad

    for name, cfg in (("synthetic_demo", ModelConfig()),
                      ("fast_demo", ModelConfig(space_to_depth=2))):
        ckpt = os.path.join(os.path.dirname(CKPT), name)
        if not os.path.isdir(ckpt):
            pytest.skip(f"{name} not present")
        v = load_checkpoint(ckpt, template=init_params(cfg))
        mads = []
        for seed in HARD_GATE_SEEDS:
            sess = MattingSession(96, 96, variables=v, model_cfg=cfg)
            mads += [mad(sess.step(f)[0], gt)
                     for f, gt in synthetic_hard_clip(96, 96, 8,
                                                      seed=seed)]
        assert np.mean(mads) < 0.02, (name, np.mean(mads))


def test_hard2_suite_gates():
    """EXTENDED hard suite gates (octave two — shutter motion blur with
    exact time-averaged alpha, exposure drift, JPEG round-trip; VERDICT
    r4 item 4) for the base and fast checkpoints on the disjoint gate
    seeds. Before the round-5 octave-two fine-tunes both measured ~0.031
    mean MAD here; after, base 0.0242 / fast 0.0212 — the gate pins the
    fine-tunes' gains (blurred soft edges make this suite's floor
    inherently higher than octave one's 0.02 gate)."""
    import numpy as np

    from vidmat.api import MattingSession
    from vidmat.config import ModelConfig
    from vidmat.io.fixtures import HARD2, synthetic_hard_clip
    from vidmat.models.weights import init_params, load_checkpoint
    from vidmat.utils.metrics import mad

    for name, cfg in (("synthetic_demo", ModelConfig()),
                      ("fast_demo", ModelConfig(space_to_depth=2))):
        ckpt = os.path.join(os.path.dirname(CKPT), name)
        if not os.path.isdir(ckpt):
            pytest.skip(f"{name} not present")
        v = load_checkpoint(ckpt, template=init_params(cfg))
        mads = []
        for seed in HARD_GATE_SEEDS:
            sess = MattingSession(96, 96, variables=v, model_cfg=cfg)
            mads += [mad(sess.step(f)[0], gt)
                     for f, gt in synthetic_hard_clip(96, 96, 8,
                                                      seed=seed, **HARD2)]
        assert np.mean(mads) < 0.035, (name, np.mean(mads))


def test_hard_suite_gates_trimap_families():
    """The trimap families' hard-suite scores were reported but UNGATED
    (VERDICT r4 missing 1) — they could regress silently. Gates on the
    disjoint HARD_GATE_SEEDS, each family under its own serving
    protocol (measured there: trimap per-frame 0.0097, propagation
    0.0166)."""
    import numpy as np

    from vidmat.api import MattingSession
    from vidmat.config import ModelConfig
    from vidmat.io.fixtures import synthetic_hard_clip
    from vidmat.models.weights import init_params, load_checkpoint
    from vidmat.pipeline.stepper import ImageStepper
    from vidmat.train.data import alpha_to_trimap
    from vidmat.utils.metrics import mad

    # Per-frame trimap family (PR1, non-recurrent): gt-derived trimap on
    # every frame.
    ckpt = os.path.join(os.path.dirname(CKPT), "trimap_demo")
    if not os.path.isdir(ckpt):
        pytest.skip("trimap_demo not present")
    cfg = ModelConfig(use_trimap=True, recurrent=False)
    stepper = ImageStepper(cfg, variables=load_checkpoint(
        ckpt, template=init_params(cfg)))
    mads = []
    for seed in HARD_GATE_SEEDS:
        mads += [mad(stepper(f, alpha_to_trimap(gt[..., 0]))[0], gt)
                 for f, gt in synthetic_hard_clip(96, 96, 8, seed=seed)]
    assert np.mean(mads) < 0.012, np.mean(mads)

    # Keyframe-propagation family: trimap on frame 0 only, the GRU
    # carries the constraint forward.
    ckpt = os.path.join(os.path.dirname(CKPT), "trimap_prop_demo")
    if not os.path.isdir(ckpt):
        pytest.skip("trimap_prop_demo not present")
    cfg = ModelConfig(use_trimap=True, space_to_depth=2)
    v = load_checkpoint(ckpt, template=init_params(cfg))
    mads = []
    for seed in HARD_GATE_SEEDS:
        sess = MattingSession(96, 96, variables=v, model_cfg=cfg)
        for i, (f, gt) in enumerate(synthetic_hard_clip(96, 96, 8,
                                                        seed=seed)):
            tri = alpha_to_trimap(gt[..., 0]) if i == 0 else None
            mads.append(mad(sess.step(f, trimap=tri)[0], gt))
    assert np.mean(mads) < 0.02, np.mean(mads)


def test_errormap_refiner_checkpoint_improves_upsample():
    """Trained error-map refiner must beat plain bilinear upsample on a
    held-out frame (BASELINE.json:5 error-map path, end-to-end)."""
    ckpt = os.path.join(os.path.dirname(CKPT), "errormap_demo")
    base_ckpt = CKPT
    if not (os.path.isdir(ckpt) and os.path.isdir(base_ckpt)):
        pytest.skip("refiner/base checkpoints not present")
    import jax.numpy as jnp

    from vidmat.config import ModelConfig
    from vidmat.io.fixtures import synthetic_frame
    from vidmat.models.matting_net import MattingNetwork
    from vidmat.models.weights import init_params, load_checkpoint
    from vidmat.ops.resize import resize_bilinear
    from vidmat.refine.errormap import ErrorMapRefiner
    from vidmat.utils.metrics import mad

    cfg = ModelConfig()
    base = load_checkpoint(base_ckpt, template=init_params(cfg))
    refiner = ErrorMapRefiner(num_patches=16, patch_size=16)
    import jax.random as jrandom

    template = refiner.init(jrandom.PRNGKey(0),
                            jnp.zeros((1, 128, 128, 3)),
                            jnp.zeros((1, 64, 64, 3)),
                            jnp.zeros((1, 64, 64, 1)))
    params = load_checkpoint(ckpt, template=template)

    net = MattingNetwork(cfg)
    frame, gt = synthetic_frame(128, 128, 0.41, seed=991)
    rgb = jnp.asarray(frame.astype(np.float32) / 255.0)[None]
    rgb_lr = resize_bilinear(rgb, 64, 64)
    alpha_lr, _, _ = net.apply(base, rgb_lr, None)
    plain = np.asarray(resize_bilinear(alpha_lr, 128, 128))
    refined, _ = refiner.apply(params, rgb, rgb_lr, alpha_lr)
    assert mad(np.asarray(refined), gt[None]) < mad(plain, gt[None])


def test_errormap_beats_guided_on_hard_content():
    """The error-map patch path must EARN its preset
    (video_1080p_errormap): on hair-filament hard content its
    unknown-band MAD must beat the guided tail's (round-5 measurement
    at 1088x1920: errormap 0.041 vs guided 0.070 — the guided filter
    transfers the textured background's edges into the matte; VERDICT
    r4 item 3 'prove it or retire it'). Relative gate at a CPU-feasible
    resolution, disjoint gate seed."""
    ckpt = os.path.join(os.path.dirname(CKPT), "errormap_demo")
    if not (os.path.isdir(ckpt) and os.path.isdir(CKPT)):
        pytest.skip("refiner/base checkpoints not present")
    import jax
    import jax.numpy as jnp

    from vidmat.config import ModelConfig, RefineConfig
    from vidmat.io.fixtures import synthetic_hard_clip
    from vidmat.models.matting_net import MattingNetwork
    from vidmat.models.weights import init_params, load_checkpoint
    from vidmat.pipeline.stepfactory import build_serving_body
    from vidmat.pipeline.video import _load_default_refiner
    from vidmat.refine.errormap import ErrorMapRefiner
    from vidmat.train.data import alpha_to_trimap

    cfg = ModelConfig()
    net = MattingNetwork(cfg)
    v = load_checkpoint(CKPT, template=init_params(cfg))
    h = w = 256
    n_patches = 64  # 256/16 x 256/16 = 256 patch slots; refine a quarter
    refiner = ErrorMapRefiner(num_patches=n_patches, patch_size=16)
    rv = _load_default_refiner(refiner, h, w, h // 4, w // 4)
    bodies = {}
    for mode, kw in (("guided", {}),
                     ("errormap", dict(refiner=(refiner, rv)))):
        body, plan = build_serving_body(
            net, cfg, RefineConfig(mode=mode, errormap_patches=n_patches),
            h, w, 0.25, cdtype=jnp.float32, bg=None, use_pallas=False,
            float_output=True, **kw)
        bodies[mode] = (jax.jit(body), plan.make_state(1))

    unk = {m: [] for m in bodies}
    for frame, gt in synthetic_hard_clip(h, w, 4, seed=31415):
        f = jnp.asarray(frame)[None]
        band = alpha_to_trimap(gt[..., 0])[..., 0] == 0.5
        for m in bodies:
            body, st = bodies[m]
            (alpha, _), st = body(v, f, st)
            bodies[m] = (body, st)
            d = np.abs(np.asarray(alpha)[0, ..., 0] - gt[..., 0])
            unk[m].append(d[band].mean())
    em, gd = np.mean(unk["errormap"]), np.mean(unk["guided"])
    assert em < gd, (em, gd)


def test_fast_s2d_checkpoint_quality():
    """The serving-optimized s2d=2 variant's trained checkpoint must matte
    held-out clips within ~3x of its trained held-out MAD (0.0009, round-3
    extended cosine-cycle fine-tune on the round-2 mixed-resolution recipe:
    BN batch stats + 96/128/160 round-robin + Laplacian;
    tools/train_eval.py). Round-1 shipped 0.033 with a 0.05 gate; round-2
    0.0015 with a 0.005 gate — the recipe gap is closed (VERDICT r1
    item 2)."""
    ckpt = os.path.join(os.path.dirname(CKPT), "fast_demo")
    if not os.path.isdir(ckpt):
        pytest.skip("fast checkpoint not present")
    from vidmat.api import MattingSession
    from vidmat.config import ModelConfig
    from vidmat.io.fixtures import synthetic_clip
    from vidmat.models.weights import init_params, load_checkpoint
    from vidmat.utils.metrics import mad

    cfg = ModelConfig(space_to_depth=2)
    v = load_checkpoint(ckpt, template=init_params(cfg, height=64, width=64))
    sess = MattingSession(160, 160, variables=v, model_cfg=cfg)
    mads = [mad(sess.step(f)[0], gt)
            for f, gt in synthetic_clip(160, 160, 6, seed=987654)]
    assert np.mean(mads) < 0.0025, np.mean(mads)


def test_plate_checkpoint_quality():
    """The shipped clean-plate checkpoint (plate_demo) must (a) matte
    CAMOUFLAGED content given the true plate — content the unconditioned
    family cannot separate by pixels alone — and (b) not regress on
    ordinary content. The wrong-plate score bounds what the plate is
    worth: the gap between wrong-plate and true-plate MAD is the
    measured value of the conditioning (tools/train_eval.py
    evaluate_plate mirrors this)."""
    ckpt = os.path.join(os.path.dirname(CKPT), "plate_demo")
    if not os.path.isdir(ckpt):
        pytest.skip("plate checkpoint not present")
    from vidmat.api import MattingSession
    from vidmat.config import ModelConfig
    from vidmat.io.fixtures import synthetic_plate_clip
    from vidmat.models.weights import init_params, load_checkpoint
    from vidmat.utils.metrics import mad

    cfg = ModelConfig(use_bg_plate=True, space_to_depth=2)
    v = load_checkpoint(ckpt, template=init_params(cfg))

    def run(camo, true_plate, size=160):
        clip = list(synthetic_plate_clip(size, size, 6, seed=424242,
                                         camouflage=camo))
        plate = clip[0][2] if true_plate else clip[0][0]
        sess = MattingSession(size, size, variables=v, model_cfg=cfg,
                              bg_plate=plate)
        return float(np.mean([mad(sess.step(f)[0], gt)
                              for f, gt, _ in clip]))

    camo_plate = run(True, True)
    plain = run(False, True)
    camo_wrong = run(True, False)
    assert camo_plate < 0.02, camo_plate       # plate finds the disk
    assert plain < 0.01, plain                 # ordinary content intact
    assert camo_wrong > 2 * camo_plate, (camo_wrong, camo_plate)
    # Round-4 mixed-res retrain: the family must also survive the COMMON
    # 96px protocol (VERDICT r3 weak 2 — the old checkpoint measured
    # 0.038 here and hid behind a private 160px protocol). Round-5
    # retrain (fresh fast_demo graft, full cosine, 70% camouflage, 25%
    # hard-plate mixing): the common-protocol QUALITY.md MAD went
    # 19.4 -> 7.4 x1e3; this fixture seed measures 0.0180-0.0183 — the
    # 0.02 gates hold with thin headroom (per-seed camo difficulty
    # varies; the report protocol above is the headline).
    camo_96 = run(True, True, size=96)
    assert camo_96 < 0.02, camo_96


def test_plate_checkpoint_hard_suite_gate():
    """The plate family's HARD fixture gate (VERDICT r4 item 1 — the
    family previously had no hard coverage at all): camouflaged
    disk+filaments, camera-drift plate misregistration, shutter blur,
    exposure drift (io/fixtures.synthetic_hard_plate_clip, HARD_PLATE
    protocol), disjoint gate seeds. The r4 checkpoint measured 0.154
    mean here; the r5 retrain with hard-plate mixing measures 0.050
    (0.035/0.065 per seed) — the gate pins the improvement."""
    ckpt = os.path.join(os.path.dirname(CKPT), "plate_demo")
    if not os.path.isdir(ckpt):
        pytest.skip("plate checkpoint not present")
    import numpy as np

    from vidmat.api import MattingSession
    from vidmat.config import ModelConfig
    from vidmat.io.fixtures import HARD_PLATE, synthetic_hard_plate_clip
    from vidmat.models.weights import init_params, load_checkpoint
    from vidmat.utils.metrics import mad

    cfg = ModelConfig(use_bg_plate=True, space_to_depth=2)
    v = load_checkpoint(ckpt, template=init_params(cfg))
    mads = []
    for seed in HARD_GATE_SEEDS:
        clip = list(synthetic_hard_plate_clip(96, 96, 8, seed=seed,
                                              **HARD_PLATE))
        sess = MattingSession(96, 96, variables=v, model_cfg=cfg,
                              bg_plate=clip[0][2])
        mads += [mad(sess.step(f)[0], gt) for f, gt, _ in clip]
    assert np.mean(mads) < 0.08, np.mean(mads)

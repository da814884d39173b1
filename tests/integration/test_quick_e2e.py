"""Quick-tier end-to-end representatives (tests/README.md).

The full integration tier is marked slow (multi-minute conversions on
the 1-core CI box); this file keeps ONE cheap, real test per surface so
`pytest -m "not slow"` still trips on an end-to-end regression inside
the 10-minute budget: public conversion, oracle parity, a trained
quality gate, and in-process CLI plumbing.
"""

import numpy as np
import pytest

import vidmat
from vidmat.config import ModelConfig
from vidmat.io.fixtures import synthetic_clip, synthetic_frames_only
from vidmat.utils.metrics import mad


def test_convert_video_small_roundtrip(tmp_path):
    """convert_video on a small clip writes 1:1 alpha frames with the
    shipped default weights (the whole L0-L6 chain, small shapes)."""
    import cv2

    clip = list(synthetic_clip(96, 128, 5, seed=424242))
    out = str(tmp_path / "a.mp4")
    m = vidmat.convert_video([f for f, _ in clip], output_alpha=out,
                             downsample_ratio=1.0)
    assert m["frames"] == 5
    cap = cv2.VideoCapture(out)
    alphas = []
    while True:
        ok, fr = cap.read()
        if not ok:
            break
        alphas.append(fr[..., 0].astype(np.float32) / 255.0)
    assert len(alphas) == 5
    mads = [mad(a, gt[..., 0]) for a, (_, gt) in zip(alphas, clip)]
    assert np.mean(mads) < 0.03, np.mean(mads)


def test_image_parity_small_vs_oracle():
    """The north-star parity contract at a quick-tier size: Flax alpha
    == torch CPU oracle to <=1e-3 MAD (the 512px PR1 run and every
    conditioned corner live in the slow tier)."""
    import jax
    import jax.numpy as jnp
    import torch

    from vidmat.models.matting_net import MattingNetwork
    from vidmat.models.torch_oracle import TorchMattingNetwork
    from vidmat.models.weights import (init_params, load_into_torch,
                                       randomize_bn_stats)

    cfg = ModelConfig(recurrent=False)
    variables = randomize_bn_stats(init_params(cfg, seed=1), seed=2)
    oracle = TorchMattingNetwork(cfg)
    load_into_torch(oracle, variables)
    frame = np.random.RandomState(3).rand(1, 128, 160, 3).astype(
        np.float32)
    with jax.default_matmul_precision("float32"):
        ja, _, _ = MattingNetwork(cfg).apply(variables,
                                             jnp.asarray(frame), None)
    ta, _, _ = oracle(torch.from_numpy(frame).permute(0, 3, 1, 2), None)
    assert mad(np.asarray(ja), ta.permute(0, 2, 3, 1).numpy()) <= 1e-3


def test_default_checkpoint_gate_quick():
    """One trained-quality gate in the quick tier: the shipped base
    checkpoint mattes a short held-out clip."""
    try:
        sess = vidmat.MattingSession(96, 96)
    except ValueError:
        pytest.skip("demo checkpoint not present")
    mads = [mad(sess.step(f)[0], gt)
            for f, gt in synthetic_clip(96, 96, 6, seed=987654)]
    assert np.mean(mads) < 0.01, np.mean(mads)


def test_cli_video_quick(tmp_path, capsys):
    """In-process CLI video conversion with trim flags (the plumbing the
    slow tier exercises at scale)."""
    import json

    from vidmat.cli import main as cli_main
    from vidmat.io.writer import VideoWriter

    src = str(tmp_path / "in.mp4")
    w = VideoWriter(src, fps=10)
    for f in synthetic_frames_only(96, 128, 6):
        w.write(f)
    w.close()
    rc = cli_main(["video", src, "--output-alpha",
                   str(tmp_path / "a.mp4"), "--downsample-ratio", "1.0",
                   "--start-frame", "2", "--max-frames", "3"])
    assert rc == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["frames"] == 3

"""North-star parity test (BASELINE.json:5): alpha from the Flax/TPU network
must match the CPU torch oracle to <=1e-3 MAD at 512x512 (PR1 workload,
BASELINE.json:7), with shared weights and randomized BN stats."""

import pytest as _pytest_tier

# Full-tier only (tests/README.md): compile-heavy mesh/interpret
# programs, process spawns, long rollouts, or e2e conversions.
pytestmark = _pytest_tier.mark.slow


import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch

from vidmat.config import ModelConfig
from vidmat.models.matting_net import MattingNetwork, init_state
from vidmat.models.torch_oracle import TorchMattingNetwork
from vidmat.models.weights import (init_params, load_into_torch,
                                   randomize_bn_stats)
from vidmat.utils.metrics import mad

TOL = 1e-3


def _run_pair(cfg: ModelConfig, h=512, w=512, seed=0, state_pair=None):
    variables = randomize_bn_stats(init_params(cfg, seed=seed), seed=seed + 1)
    oracle = TorchMattingNetwork(cfg)
    load_into_torch(oracle, variables)

    rng = np.random.RandomState(seed + 2)
    frame = rng.rand(1, h, w, cfg.in_channels).astype(np.float32)

    net = MattingNetwork(cfg)
    jstate, tstate = state_pair if state_pair else (None, None)
    with jax.default_matmul_precision("float32"):
        ja, jf, jns = net.apply(variables, jnp.asarray(frame), jstate)

    tframe = torch.from_numpy(frame).permute(0, 3, 1, 2)
    ta, tf, tns = oracle(tframe, tstate)
    return (np.asarray(ja), np.asarray(jf), jns,
            ta.permute(0, 2, 3, 1).numpy(), tf.permute(0, 2, 3, 1).numpy(),
            tns)


def test_image_parity_512():
    """PR1: plain RGB single-image matting at 512x512."""
    ja, jf, _, ta, tf, _ = _run_pair(ModelConfig(recurrent=False))
    assert mad(ja, ta) <= TOL, f"alpha MAD {mad(ja, ta)}"
    assert mad(jf, tf) <= TOL, f"fgr MAD {mad(jf, tf)}"


def test_image_parity_trimap():
    """PR1 trimap variant: 4-channel input, known regions pinned."""
    cfg = ModelConfig(recurrent=False, use_trimap=True)
    ja, jf, _, ta, tf, _ = _run_pair(cfg, h=256, w=256, seed=7)
    assert mad(ja, ta) <= TOL
    assert mad(jf, tf) <= TOL


def test_image_parity_plate():
    """Clean-plate family (BGMv2 lineage): 6-channel frame+plate input runs
    the same encoder/cond plumbing in both implementations."""
    cfg = ModelConfig(recurrent=False, use_bg_plate=True)
    ja, jf, _, ta, tf, _ = _run_pair(cfg, h=256, w=256, seed=11)
    assert mad(ja, ta) <= TOL
    assert mad(jf, tf) <= TOL


def test_image_parity_plate_trimap_s2d():
    """Every conditioning axis at once: 7-channel trimap+plate input with
    space_to_depth=2 (the packed cond concat is the risky path)."""
    cfg = ModelConfig(recurrent=True, use_trimap=True, use_bg_plate=True,
                      space_to_depth=2)
    ja, jf, _, ta, tf, _ = _run_pair(cfg, h=256, w=256, seed=13)
    assert mad(ja, ta) <= TOL
    assert mad(jf, tf) <= TOL


def test_recurrent_step_parity():
    """One recurrent step from zero state: outputs AND new state must match
    (state drift compounds over frames — SURVEY.md §7 risk list)."""
    cfg = ModelConfig(recurrent=True)
    h = w = 128
    jstate = init_state(cfg, 1, h, w)
    tstate = None  # oracle lazily zero-inits
    ja, jf, jns, ta, tf, tns = _run_pair(cfg, h=h, w=w, seed=3,
                                         state_pair=(jstate, tstate))
    assert mad(ja, ta) <= TOL
    assert mad(jf, tf) <= TOL
    for jh, th in zip([jns.h3, jns.h2, jns.h1], tns):
        assert mad(np.asarray(jh), th.permute(0, 2, 3, 1).numpy()) <= TOL


def test_nonsquare_parity():
    """Non-square input (bucketed video shapes are rarely square)."""
    ja, jf, _, ta, tf, _ = _run_pair(ModelConfig(recurrent=False),
                                     h=192, w=320, seed=11)
    assert mad(ja, ta) <= TOL


def test_errormap_refiner_parity():
    """Error-map refiner parity vs torch oracle (selection, gather, refine,
    feathered scatter) to <=1e-3 MAD."""
    import jax.random as jrandom

    from vidmat.models.torch_oracle import TErrorMapRefiner
    from vidmat.models.weights import flax_to_torch_state
    from vidmat.refine.errormap import ErrorMapRefiner

    # k = all grid cells: selection covers every patch, so jax/torch top-k
    # tie-break order (ReLU'd error maps tie at exactly 0) cannot affect
    # the output; gather/refine/scatter math is what's under test.
    hf, wf, hl, wl, p = 128, 192, 64, 96, 16
    k = (hf // p) * (wf // p)
    refiner = ErrorMapRefiner(num_patches=k, patch_size=p)
    rng = np.random.RandomState(21)
    rgb_full = jnp.asarray(rng.rand(1, hf, wf, 3).astype(np.float32))
    rgb_lr = jnp.asarray(rng.rand(1, hl, wl, 3).astype(np.float32))
    alpha_lr = jnp.asarray(rng.rand(1, hl, wl, 1).astype(np.float32))
    params = refiner.init(jrandom.PRNGKey(2), rgb_full, rgb_lr, alpha_lr)

    oracle = TErrorMapRefiner(num_patches=k, patch_size=p)
    sd = {kk: torch.from_numpy(np.ascontiguousarray(v))
          for kk, v in flax_to_torch_state(params).items()}
    cur = oracle.state_dict()
    for kk in cur:
        if kk.endswith("num_batches_tracked"):
            sd[kk] = cur[kk]
    oracle.load_state_dict(sd)
    oracle.eval()

    with jax.default_matmul_precision("float32"):
        ja, je = refiner.apply(params, rgb_full, rgb_lr, alpha_lr)
    ta, te = oracle(torch.from_numpy(np.asarray(rgb_full)).permute(0, 3, 1, 2),
                    torch.from_numpy(np.asarray(rgb_lr)).permute(0, 3, 1, 2),
                    torch.from_numpy(np.asarray(alpha_lr)).permute(0, 3, 1, 2))
    assert mad(np.asarray(ja), ta.permute(0, 2, 3, 1).numpy()) <= TOL
    assert mad(np.asarray(je), te.permute(0, 2, 3, 1).numpy()) <= TOL


def test_size_variant_parity():
    """Width-scaled variants share the parity contract (MODEL_SIZES)."""
    from vidmat.config import MODEL_SIZES

    for name in ("small", "large"):
        base = MODEL_SIZES[name]
        cfg = ModelConfig(enc_channels=base.enc_channels,
                          dec_channels=base.dec_channels, recurrent=False)
        ja, jf, _, ta, tf, _ = _run_pair(cfg, h=96, w=96, seed=31)
        assert mad(ja, ta) <= TOL, name


def test_with_seg_checkpoint_bridges_to_oracle():
    """Co-trained checkpoints (seg_head present after train --seg-every)
    must still load into the torch oracle: the bridge strips the seg_head
    subtree (the oracle has no mirror for it, and the matting forward
    never reads it) instead of tripping strict load_state_dict (ADVICE
    r3)."""
    cfg = ModelConfig(recurrent=False)
    variables = randomize_bn_stats(
        init_params(cfg, seed=5, with_seg=True), seed=6)
    oracle = TorchMattingNetwork(cfg)
    load_into_torch(oracle, variables)  # must not raise on seg_head.*

    rng = np.random.RandomState(8)
    frame = rng.rand(1, 96, 96, 3).astype(np.float32)
    net = MattingNetwork(cfg)
    with jax.default_matmul_precision("float32"):
        ja, _, _ = net.apply(variables, jnp.asarray(frame), None)
    ta, _, _ = oracle(torch.from_numpy(frame).permute(0, 3, 1, 2), None)
    assert mad(np.asarray(ja), ta.permute(0, 2, 3, 1).numpy()) <= TOL


def test_space_to_depth_parity():
    """TPU-first s2d packing variant: parity incl. recurrent state (state
    grids shift down by the packing factor)."""
    cfg = ModelConfig(recurrent=True, space_to_depth=2)
    h = w = 128
    jstate = init_state(cfg, 1, h, w)
    ja, jf, jns, ta, tf, tns = _run_pair(cfg, h=h, w=w, seed=13,
                                         state_pair=(jstate, None))
    assert mad(ja, ta) <= TOL
    assert mad(jf, tf) <= TOL
    for jh, th in zip([jns.h3, jns.h2, jns.h1], tns):
        assert mad(np.asarray(jh), th.permute(0, 2, 3, 1).numpy()) <= TOL

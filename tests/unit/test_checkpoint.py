"""Checkpoint round-trips: orbax save/load, torch import tool
(SURVEY.md §5 checkpoint/resume)."""

import os
import subprocess
import sys
import tempfile

import numpy as np

import jax
import jax.numpy as jnp

from vidmat.config import ModelConfig
from vidmat.models.matting_net import MattingNetwork
from vidmat.models.weights import (flax_to_torch_state, init_params,
                                   load_checkpoint, randomize_bn_stats,
                                   save_checkpoint, torch_to_flax_variables)


def _tree_equal(a, b):
    fa = jax.tree_util.tree_leaves(a)
    fb = jax.tree_util.tree_leaves(b)
    assert len(fa) == len(fb)
    for x, y in zip(fa, fb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_orbax_roundtrip():
    variables = randomize_bn_stats(init_params(ModelConfig(), seed=3), 4)
    d = os.path.join(tempfile.mkdtemp(), "ckpt")
    save_checkpoint(d, variables)
    restored = load_checkpoint(d)
    _tree_equal(variables, restored)


def test_torch_bridge_roundtrip():
    """flax -> torch state_dict -> flax must be the identity."""
    cfg = ModelConfig()
    variables = randomize_bn_stats(init_params(cfg, seed=5), 6)
    sd = flax_to_torch_state(variables)
    back = torch_to_flax_variables(sd, variables)
    _tree_equal(variables, back)


def test_import_tool_end_to_end():
    """torch.save -> tools/import_torch_weights.py -> load_checkpoint ->
    identical forward output."""
    import torch

    cfg = ModelConfig(recurrent=False)
    variables = randomize_bn_stats(init_params(cfg, seed=7), 8)
    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in flax_to_torch_state(variables).items()}
    d = tempfile.mkdtemp()
    pth = os.path.join(d, "w.pth")
    out = os.path.join(d, "ckpt")
    torch.save(sd, pth)

    repo = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run([sys.executable,
                        os.path.join(repo, "tools/import_torch_weights.py"),
                        pth, out, "--no-recurrent"],
                       capture_output=True, text=True, env=env)
    assert r.returncode == 0, r.stderr

    restored = load_checkpoint(out, template=init_params(cfg))
    net = MattingNetwork(cfg)
    x = jnp.asarray(np.random.RandomState(0).rand(1, 64, 64, 3)
                    .astype(np.float32))
    a1, _, _ = net.apply(variables, x, None)
    a2, _, _ = net.apply(restored, x, None)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a2), atol=1e-6)

"""Training for the error-map patch refiner (BASELINE.json:5 error-map
upsampling path): the base matting net is frozen; the refiner learns to
(a) predict where the upsampled coarse alpha is wrong and (b) fix the K
worst patches at full resolution.

Loss = L1(refined alpha, gt) + L1(error head, |alpha_up - gt| pooled to LR)
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from vidmat.config import ModelConfig
from vidmat.models.matting_net import MattingNetwork
from vidmat.ops.resize import resize_bilinear
from vidmat.refine.errormap import ErrorMapRefiner


def make_refiner_train_step(refiner: ErrorMapRefiner, optimizer):
    def loss_fn(params, rgb_full, rgb_lr, alpha_lr, gt_alpha):
        refined, err = refiner.apply(params, rgb_full, rgb_lr, alpha_lr)
        l_alpha = jnp.mean(jnp.abs(refined - gt_alpha))
        # error-head target: true residual of the plain upsample, at LR
        hf = gt_alpha.shape[1]
        alpha_up = resize_bilinear(alpha_lr, gt_alpha.shape[1],
                                   gt_alpha.shape[2])
        true_err = resize_bilinear(jnp.abs(alpha_up - gt_alpha),
                                   alpha_lr.shape[1], alpha_lr.shape[2])
        l_err = jnp.mean(jnp.abs(err - true_err))
        return l_alpha + l_err, {"alpha": l_alpha, "err": l_err}

    @jax.jit
    def step(params, opt_state, rgb_full, rgb_lr, alpha_lr, gt_alpha):
        (loss, terms), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, rgb_full, rgb_lr, alpha_lr, gt_alpha)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, terms

    return step


def train_refiner(base_variables, cfg: ModelConfig = ModelConfig(),
                  num_steps: int = 300, lr: float = 1e-3,
                  full_hw: int = 128, ratio: int = 2,
                  num_patches: int = 16, patch_size: int = 16,
                  seed: int = 0, callback=None):
    """Train the refiner on synthetic frames against a frozen base net.

    Returns (refiner_module, refiner_params).
    """
    from vidmat.io.fixtures import synthetic_frame

    net = MattingNetwork(cfg)
    refiner = ErrorMapRefiner(num_patches=num_patches,
                              patch_size=patch_size)
    hf = wf = full_hw
    hl = wl = full_hw // ratio

    @jax.jit
    def coarse(variables, rgb_lr):
        alpha, _, _ = net.apply(variables, rgb_lr, None)
        return alpha

    rng = np.random.RandomState(seed)

    def batch(n=4):
        rgbs, lrs, alphas_lr, gts = [], [], [], []
        for _ in range(n):
            frame, gt = synthetic_frame(hf, wf, rng.rand(),
                                        seed=int(rng.randint(10000)))
            rgb = frame.astype(np.float32) / 255.0
            rgb_lr = np.asarray(resize_bilinear(
                jnp.asarray(rgb)[None], hl, wl))[0]
            rgbs.append(rgb)
            lrs.append(rgb_lr)
            gts.append(gt)
        rgbs = jnp.asarray(np.stack(rgbs))
        lrs = jnp.asarray(np.stack(lrs))
        gts = jnp.asarray(np.stack(gts))
        alpha_lr = coarse(base_variables, lrs)
        return rgbs, lrs, alpha_lr, gts

    params = refiner.init(jax.random.PRNGKey(seed),
                          jnp.zeros((1, hf, wf, 3), jnp.float32),
                          jnp.zeros((1, hl, wl, 3), jnp.float32),
                          jnp.zeros((1, hl, wl, 1), jnp.float32))
    optimizer = optax.adam(lr)
    opt_state = optimizer.init(params)
    step = make_refiner_train_step(refiner, optimizer)

    pool = [batch() for _ in range(16)]
    for i in range(num_steps):
        rgbs, lrs, alpha_lr, gts = pool[i % len(pool)]
        params, opt_state, loss, terms = step(params, opt_state, rgbs, lrs,
                                              alpha_lr, gts)
        if callback is not None:
            callback(i, float(loss))
    return refiner, params

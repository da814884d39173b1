"""Training loop: optax step over temporal clips, sharded over a device mesh.

The full train step scans the recurrent net over T frames (truncated BPTT
through the ConvGRU state), computes the matting loss, and applies an optax
update. Sharding (SURVEY.md §2.2):
  - batch (clips) sharded over the 'data' mesh axis — pure DP, gradients
    psum-reduced by XLA from the sharding annotations;
  - frame W dim optionally sharded over 'spatial' — GSPMD spatial
    partitioning of convs (halo exchanges inserted by XLA over ICI), the
    conv-net equivalent of sequence/context parallelism for large frames;
  - params replicated (the net is CPU-oracle-sized; TP is not warranted —
    SURVEY.md §2.2 disposition).

jax.checkpoint on the per-frame step trades FLOPs for memory in BPTT
(HBM-bandwidth note in the task brief).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vidmat.config import ModelConfig
from vidmat.models.matting_net import MattingNetwork, init_state
from vidmat.train.losses import matting_loss, segmentation_loss


from flax import struct


@struct.dataclass
class TrainState:
    variables: Dict[str, Any]  # {'params', 'batch_stats'}
    opt_state: Any
    step: int = 0


def make_optimizer(lr: float = 1e-4) -> optax.GradientTransformation:
    return optax.chain(optax.clip_by_global_norm(1.0), optax.adam(lr))


def make_train_step(cfg: ModelConfig, optimizer=None,
                    mesh: Optional[Mesh] = None,
                    remat: bool = True,
                    laplacian_weight: float = 0.0,
                    boundary_weight: float = 0.0):
    """Build the jitted train step.

    train_step(state, clips, gt_alpha, gt_fgr) -> (state, metrics)
      clips:    (T, N, H, W, 3) float32
      gt_alpha: (T, N, H, W, 1)
      gt_fgr:   (T, N, H, W, 3)
    """
    # bn_train=True: BatchNorm normalizes with batch statistics and updates
    # the running stats (carried through the temporal scan and stored back
    # into TrainState). Training with frozen init stats leaves the stack
    # unnormalized and stalls optimization (see STATUS.md round-1 notes).
    net = MattingNetwork(cfg, bn_train=True)
    optimizer = optimizer or make_optimizer()

    def forward_clip(params, batch_stats, clips):
        t, n, h, w, _ = clips.shape
        state0 = init_state(cfg, n, h, w, clips.dtype)

        def frame_step(carry, x):
            state, stats = carry
            (alpha, fgr, new_state), mut = net.apply(
                {"params": params, "batch_stats": stats}, x, state,
                mutable=["batch_stats"])
            return (new_state, mut["batch_stats"]), (alpha, fgr)

        if remat:
            frame_step = jax.checkpoint(frame_step)
        (_, new_stats), (alphas, fgrs) = jax.lax.scan(
            frame_step, (state0, batch_stats), clips)
        return alphas, fgrs, new_stats

    def loss_fn(params, batch_stats, clips, gt_alpha, gt_fgr):
        alphas, fgrs, new_stats = forward_clip(params, batch_stats, clips)
        loss, terms = matting_loss(alphas, fgrs, gt_alpha, gt_fgr, clips,
                                   laplacian_weight=laplacian_weight,
                                   boundary_weight=boundary_weight)
        return loss, (terms, new_stats)

    def train_step(state: TrainState, clips, gt_alpha, gt_fgr):
        (loss, (terms, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(
            state.variables["params"], state.variables["batch_stats"],
            clips, gt_alpha, gt_fgr)
        updates, opt_state = optimizer.update(
            grads, state.opt_state, state.variables["params"])
        params = optax.apply_updates(state.variables["params"], updates)
        new_state = TrainState(
            variables={"params": params,
                       "batch_stats": jax.lax.stop_gradient(new_stats)},
            opt_state=opt_state, step=state.step + 1)
        metrics = {"loss": loss, **terms}
        return new_state, metrics

    if mesh is None:
        return jax.jit(train_step)

    # Sharded: batch over 'data', width over 'spatial' (if present), params
    # replicated. XLA inserts psum for grads and halo exchange for convs.
    axes = mesh.axis_names
    data_ax = "data" if "data" in axes else axes[0]
    sp_ax = "spatial" if "spatial" in axes else None
    clip_spec = P(None, data_ax, None, sp_ax, None)
    alpha_spec = clip_spec
    repl = NamedSharding(mesh, P())
    data_shard = NamedSharding(mesh, clip_spec)

    return jax.jit(
        train_step,
        in_shardings=(None, data_shard, NamedSharding(mesh, alpha_spec),
                      data_shard),
        out_shardings=(None, None),
    )


def make_seg_train_step(cfg: ModelConfig, optimizer=None,
                        mesh: Optional[Mesh] = None, remat: bool = True,
                        bn_train: bool = True):
    """Build the jitted segmentation co-training step (RVM-lineage: the
    shared trunk + ``seg_head``, BCE on binary masks — matting_net
    seg_pass docstring).

    seg_step(state, clips, gt_mask) -> (state, metrics)
      clips:   (T, N, H, W, 3) float32
      gt_mask: (T, N, H, W, 1) float32 in {0, 1}

    Shares TrainState/opt_state with make_train_step: the param tree is
    the with_seg tree, and each pass gets zero gradients for the other
    pass's head (JAX returns zero cotangents for unused inputs), so one
    optimizer drives the interleave.

    bn_train=False runs BatchNorm on the FROZEN running stats (no stat
    updates): the head-only fit (tools/train_seg.py --head-only) trains
    the seg head against exactly the activations inference will produce
    — with batch stats the tiny co-training batches are a noisy moving
    target the frozen trunk never lets settle.
    """
    net = MattingNetwork(cfg, bn_train=bn_train)
    optimizer = optimizer or make_optimizer()

    def forward_clip(params, batch_stats, clips):
        t, n, h, w, _ = clips.shape
        state0 = init_state(cfg, n, h, w, clips.dtype)

        def frame_step(carry, x):
            state, stats = carry
            (seg, _, new_state), mut = net.apply(
                {"params": params, "batch_stats": stats}, x, state,
                seg_pass=True, mutable=["batch_stats"])
            # bn_train=False leaves the collection unwritten (frozen
            # running stats) — carry the input stats through.
            return (new_state, mut.get("batch_stats", stats)), seg

        if remat:
            frame_step = jax.checkpoint(frame_step)
        (_, new_stats), segs = jax.lax.scan(
            frame_step, (state0, batch_stats), clips)
        return segs, new_stats

    def loss_fn(params, batch_stats, clips, gt_mask):
        segs, new_stats = forward_clip(params, batch_stats, clips)
        loss, terms = segmentation_loss(segs, gt_mask)
        return loss, (terms, new_stats)

    def seg_step(state: TrainState, clips, gt_mask):
        (loss, (terms, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(
            state.variables["params"], state.variables["batch_stats"],
            clips, gt_mask)
        updates, opt_state = optimizer.update(
            grads, state.opt_state, state.variables["params"])
        params = optax.apply_updates(state.variables["params"], updates)
        new_state = TrainState(
            variables={"params": params,
                       "batch_stats": jax.lax.stop_gradient(new_stats)},
            opt_state=opt_state, step=state.step + 1)
        return new_state, {"loss": loss, **terms}

    if mesh is None:
        return jax.jit(seg_step)

    axes = mesh.axis_names
    data_ax = "data" if "data" in axes else axes[0]
    sp_ax = "spatial" if "spatial" in axes else None
    spec = NamedSharding(mesh, P(None, data_ax, None, sp_ax, None))
    return jax.jit(seg_step, in_shardings=(None, spec, spec),
                   out_shardings=(None, None))


def train_on_clips(cfg: ModelConfig, data_iter, num_steps: int = 100,
                   lr: float = 1e-4, mesh: Optional[Mesh] = None,
                   variables=None, log_every: int = 10,
                   callback=None, seg_data_iter=None,
                   seg_every: int = 0) -> TrainState:
    """Drive the train step over an iterator of
    (clips, gt_alpha, gt_fgr) numpy batches.

    seg_data_iter + seg_every=K: every K-th step consumes a
    (clips, gt_mask) batch from ``seg_data_iter`` through the
    segmentation co-training step instead (RVM-lineage interleave —
    make_seg_train_step). Requires a with_seg param tree
    (init_params(cfg, with_seg=True) / graft_seg_params), which this
    function inits by default when seg interleaving is on.
    """
    from vidmat.models.weights import graft_seg_params, init_params

    seg_on = seg_data_iter is not None and seg_every > 0
    optimizer = make_optimizer(lr)
    variables = (variables if variables is not None
                 else init_params(cfg, with_seg=seg_on))
    if seg_on and "seg_head" not in variables["params"]:
        # explicit matting checkpoint entering co-training: the graft is
        # matting-neutral (bit-identical — the matting pass never reads
        # seg_head), so do it rather than fail mid-loop
        variables = graft_seg_params(variables, cfg)
    opt_state = optimizer.init(variables["params"])
    state = TrainState(variables=variables, opt_state=opt_state)
    step_fn = make_train_step(cfg, optimizer, mesh=mesh)
    seg_fn = make_seg_train_step(cfg, optimizer, mesh=mesh) if seg_on \
        else None

    for i in range(num_steps):
        if seg_on and i % seg_every == seg_every - 1:
            clips, gt_mask = next(seg_data_iter)
            state, metrics = seg_fn(state, jnp.asarray(clips),
                                    jnp.asarray(gt_mask))
        else:
            clips, gt_alpha, gt_fgr = next(data_iter)
            state, metrics = step_fn(state, jnp.asarray(clips),
                                     jnp.asarray(gt_alpha),
                                     jnp.asarray(gt_fgr))
        if callback is not None:
            callback(i, jax.device_get(metrics))
        elif i % log_every == 0:
            m = jax.device_get(metrics)
            extra = (f"seg_bce={float(m['seg_bce']):.4f}"
                     if "seg_bce" in m else
                     f"alpha={float(m['alpha']):.4f}")
            print(f"step {i}: loss={float(m['loss']):.4f} {extra}",
                  flush=True)
    return state

"""Weight initialization, Flax<->torch conversion, and orbax checkpointing.

The torch-weight bridge is mandatory for the <=1e-3 MAD parity goal
(BASELINE.json:5; SURVEY.md §5 checkpoint/resume): the same parameter values
must drive both the Flax network and the CPU torch oracle.

Conversion is mechanical because module names mirror each other:
  flax  params['encoder']['stem']['conv']['kernel']   (H, W, I, O)
  torch 'encoder.stem.conv.weight'                    (O, I, H, W)
  flax  BatchNorm {scale, bias} + batch_stats {mean, var}
  torch bn.{weight, bias, running_mean, running_var}
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vidmat.config import ModelConfig


def graft_cond_params(src: Dict[str, Any], cfg: ModelConfig,
                      src_in_channels: int = 3,
                      seed: int = 0) -> Dict[str, Any]:
    """Transfer a checkpoint into a config with MORE input-conditioning
    channels (trimap and/or clean background plate).

    Every leaf with a matching shape is copied verbatim. The two layers
    that see the input frame grow channels from ``src_in_channels`` to
    ``cfg.in_channels`` per spatial position:

      - ``encoder/stem/conv/kernel``: (3, 3, s*s*Cs, F) -> (3, 3, s*s*Ct, F)
      - ``d0/conv/kernel`` (full-res cond concat, s2d>1 only): last
        s*s*Cs input rows -> s*s*Ct

    The channel order within a position is a PREFIX chain (config.py
    in_channels: RGB, trimap, plate RGB), so a source channel is always
    the same-index target channel. space_to_depth packs channels
    [dy, dx, c] with c fastest (matting_net.space_to_depth), so source
    rows p*Cs+c map to target rows p*Ct+c per spatial position p; the
    NEW conditioning rows are ZERO-initialized — the grafted net is
    exactly the source net (the new channels are invisible) until
    training opens them up. This is the transfer-learning init for the
    trimap-propagation and clean-plate families: start from a converged
    recurrent matting model instead of from scratch.
    """
    cs, ct = src_in_channels, cfg.in_channels
    if ct <= cs:
        raise ValueError(
            f"target config has {ct} input channels, source {cs} — the "
            "graft only ADDS conditioning channels (use_trimap / "
            "use_bg_plate)")
    s = cfg.space_to_depth
    tgt = init_params(cfg, seed=seed)

    def expand_cond_rows(src_k: np.ndarray, tgt_k: np.ndarray) -> np.ndarray:
        """Map the trailing cond rows from Cs-channel to Ct-channel s2d
        packing; leading (feature) rows copy verbatim."""
        out = np.zeros(tgt_k.shape, src_k.dtype)
        lead = src_k.shape[2] - s * s * cs
        out[:, :, :lead] = src_k[:, :, :lead]
        for p in range(s * s):
            for c in range(cs):
                out[:, :, lead + p * ct + c] = src_k[:, :, lead + p * cs + c]
        return out

    src_flat = jax.tree_util.tree_flatten_with_path(src)[0]
    tgt_flat, treedef = jax.tree_util.tree_flatten_with_path(tgt)
    if len(src_flat) != len(tgt_flat):
        raise ValueError("source/target trees differ beyond the input "
                         "channel plan — not a graftable pair")
    out_leaves = []
    for (ps, ls), (pt, lt) in zip(src_flat, tgt_flat):
        if ps != pt:
            raise ValueError(f"tree mismatch at {jax.tree_util.keystr(ps)}"
                             f" vs {jax.tree_util.keystr(pt)}")
        ls = np.asarray(ls)
        if ls.shape == lt.shape:
            out_leaves.append(ls)
            continue
        # Only the 2 frame-facing kernels may differ, by s*s*(Ct-Cs) rows.
        if (ls.ndim == 4 and ls.shape[:2] == lt.shape[:2]
                and ls.shape[3] == lt.shape[3]
                and lt.shape[2] - ls.shape[2] == s * s * (ct - cs)):
            out_leaves.append(expand_cond_rows(ls, np.asarray(lt)))
        else:
            raise ValueError(
                f"ungraftable shape at {jax.tree_util.keystr(ps)}: "
                f"{ls.shape} -> {lt.shape}")
    return jax.tree_util.tree_unflatten(treedef, out_leaves)


def graft_trimap_params(src: Dict[str, Any], cfg: ModelConfig,
                        seed: int = 0) -> Dict[str, Any]:
    """Transfer a non-trimap checkpoint into a trimap-conditioned config
    (zero-init trimap rows — see graft_cond_params)."""
    if not cfg.use_trimap:
        raise ValueError("target config must have use_trimap=True")
    return graft_cond_params(src, cfg, src_in_channels=3, seed=seed)


def init_params(cfg: ModelConfig = ModelConfig(), seed: int = 0,
                height: int = 64, width: int = 64,
                with_seg: bool = False) -> Dict[str, Any]:
    """Initialize Flax variables {'params', 'batch_stats'} for the network.

    Conv kernels use Flax defaults (lecun_normal); shapes are resolution-
    independent so any H, W divisible by 16 works for tracing.

    with_seg=True additionally creates the ``seg_head`` params for the
    segmentation co-training pass (matting_net seg_pass) — trunk params
    are identical either way (flax derives per-param rngs from the module
    path, and the trunk path is shared by both passes).
    """
    from vidmat.models.matting_net import MattingNetwork, init_state

    net = MattingNetwork(cfg)
    rng = jax.random.PRNGKey(seed)
    frame = jnp.zeros((1, height, width, cfg.in_channels), jnp.float32)
    state = init_state(cfg, 1, height, width) if cfg.recurrent else None
    variables = net.init(rng, frame, state)
    if with_seg:
        seg_vars = net.init(rng, frame, state, seg_pass=True)
        params = _to_mutable(variables["params"])
        params["seg_head"] = _to_mutable(seg_vars["params"]["seg_head"])
        variables = {"params": params,
                     "batch_stats": variables["batch_stats"]}
    return variables


def graft_seg_params(variables: Dict[str, Any], cfg: ModelConfig,
                     seed: int = 0) -> Dict[str, Any]:
    """Add a fresh ``seg_head`` to a matting checkpoint so it can enter
    segmentation co-training (fine-tuning the trunk on real segmentation
    data). The matting pass never reads ``seg_head``, so matting outputs
    are bit-identical before and after the graft."""
    params = _to_mutable(variables["params"])
    if "seg_head" in params:
        raise ValueError("checkpoint already has a seg_head")
    fresh = init_params(cfg, seed=seed, with_seg=True)
    params["seg_head"] = fresh["params"]["seg_head"]
    return {"params": params, "batch_stats": variables["batch_stats"]}


def randomize_bn_stats(variables: Dict[str, Any], seed: int = 1,
                       ) -> Dict[str, Any]:
    """Replace the (0, 1) init BN running stats with random ones.

    Used by parity tests so a BatchNorm ordering/eps bug can't hide behind
    identity-stats normalization.
    """
    rng = np.random.RandomState(seed)

    def walk(d):
        for k, v in d.items():
            if isinstance(v, dict):
                walk(v)
            elif k == "mean":
                d[k] = jnp.asarray(
                    rng.normal(0, 0.1, v.shape).astype(np.float32))
            elif k == "var":
                d[k] = jnp.asarray(
                    rng.uniform(0.5, 1.5, v.shape).astype(np.float32))

    stats = _to_mutable(variables["batch_stats"])
    walk(stats)
    return {"params": variables["params"], "batch_stats": stats}


def _to_mutable(d):
    if isinstance(d, dict) or hasattr(d, "items"):
        return {k: _to_mutable(v) for k, v in d.items()}
    return d


def flax_to_torch_state(variables: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """Flatten Flax variables into a torch state_dict (numpy values)."""
    out: Dict[str, np.ndarray] = {}

    def walk_params(d, prefix):
        for k, v in d.items():
            path = f"{prefix}.{k}" if prefix else k
            if not prefix and k == "seg_head":
                # Co-training head: not part of the matting forward, and
                # the torch oracle has no mirror for it — parity tooling
                # must accept with_seg checkpoints.
                continue
            if isinstance(v, dict) or hasattr(v, "items"):
                walk_params(v, path)
                continue
            v = np.asarray(v)
            parent, leaf = path.rsplit(".", 1) if "." in path else ("", path)
            if leaf == "kernel":  # conv (H, W, I, O) -> (O, I, H, W)
                out[f"{parent}.weight"] = np.transpose(v, (3, 2, 0, 1))
            elif leaf == "scale":  # BN gamma
                out[f"{parent}.weight"] = v
            elif leaf == "bias":
                out[f"{parent}.bias"] = v
            else:
                raise KeyError(f"unhandled flax param leaf: {path}")

    def walk_stats(d, prefix):
        for k, v in d.items():
            path = f"{prefix}.{k}" if prefix else k
            if not prefix and k == "seg_head":
                continue
            if isinstance(v, dict) or hasattr(v, "items"):
                walk_stats(v, path)
                continue
            v = np.asarray(v)
            parent, leaf = path.rsplit(".", 1)
            if leaf == "mean":
                out[f"{parent}.running_mean"] = v
            elif leaf == "var":
                out[f"{parent}.running_var"] = v
            else:
                raise KeyError(f"unhandled flax batch_stat leaf: {path}")

    walk_params(variables["params"], "")
    walk_stats(variables["batch_stats"], "")
    return out


def torch_to_flax_variables(state_dict: Dict[str, Any],
                            template: Dict[str, Any]) -> Dict[str, Any]:
    """Inverse bridge: import a torch state_dict into Flax variables shaped
    like ``template`` (tools/import_torch_weights.py uses this to load
    reference .pth checkpoints when/if they appear; SURVEY.md §5)."""
    state = {k: np.asarray(v) for k, v in state_dict.items()}

    def fill_params(d, prefix):
        out = {}
        for k, v in d.items():
            path = f"{prefix}.{k}" if prefix else k
            if isinstance(v, dict) or hasattr(v, "items"):
                out[k] = fill_params(v, path)
                continue
            parent = path.rsplit(".", 1)[0]
            leaf = path.rsplit(".", 1)[1]
            if leaf == "kernel":
                out[k] = jnp.asarray(
                    np.transpose(state[f"{parent}.weight"], (2, 3, 1, 0)))
            elif leaf == "scale":
                out[k] = jnp.asarray(state[f"{parent}.weight"])
            elif leaf == "bias":
                out[k] = jnp.asarray(state[f"{parent}.bias"])
            else:
                raise KeyError(path)
        return out

    def fill_stats(d, prefix):
        out = {}
        for k, v in d.items():
            path = f"{prefix}.{k}" if prefix else k
            if isinstance(v, dict) or hasattr(v, "items"):
                out[k] = fill_stats(v, path)
                continue
            parent = path.rsplit(".", 1)[0]
            name = {"mean": "running_mean", "var": "running_var"}[
                path.rsplit(".", 1)[1]]
            out[k] = jnp.asarray(state[f"{parent}.{name}"])
        return out

    return {"params": fill_params(template["params"], ""),
            "batch_stats": fill_stats(template["batch_stats"], "")}


def load_into_torch(torch_module, variables: Dict[str, Any]) -> None:
    """Load Flax variables into the torch oracle module in-place."""
    import torch

    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in flax_to_torch_state(variables).items()}
    # num_batches_tracked buffers are torch-only bookkeeping; keep existing.
    current = torch_module.state_dict()
    for k in current:
        if k.endswith("num_batches_tracked"):
            sd[k] = current[k]
    torch_module.load_state_dict(sd)
    torch_module.eval()


# ---- shipped default weights (VERDICT r2 item 2: the public API must
# matte out of the box — random-weight serving was a silent garbage trap) --

_CKPT_ROOT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "checkpoints")

#: ModelConfig axes -> shipped trained checkpoint directory name.
_DEFAULT_CKPTS = {
    # (use_trimap, use_bg_plate, space_to_depth, recurrent) for the base
    # channel plan
    (False, False, 1, True): "synthetic_demo",  # held-out MAD 0.0006
    #                                             (quality rung)
    (False, False, 2, True): "fast_demo",  # held-out MAD <=0.002 (serving)
    (True, False, 1, False): "trimap_demo",  # held-out MAD 0.0007 @96px
    #                                          (PR1 trimap, per-frame,
    #                                          non-recurrent; r4 mixed-res
    #                                          + ambiguous-twin retrain)
    (True, False, 2, True): "trimap_prop_demo",  # trimap PROPAGATION:
    #                                              keyframe trimap carried
    #                                              by the GRU
    (False, True, 2, True): "plate_demo",  # clean-plate conditioned
    #                                        (BGMv2 lineage), serving s2d
}


def plate_default_config() -> ModelConfig:
    """The shipped clean-plate family config — the single source of truth
    for every surface that auto-selects the plate family from a bare
    ``bg_plate=`` argument (matte_image, convert_video, MattingSession,
    RealtimeMatting, export_bundle, CLI). Must stay in sync with the
    ``plate_demo`` axes in ``_DEFAULT_CKPTS``."""
    return ModelConfig(use_bg_plate=True, space_to_depth=2)


def default_checkpoint_path(cfg: ModelConfig) -> Optional[str]:
    """Path of the shipped trained checkpoint matching ``cfg``, or None.

    Only the base channel plan has shipped weights; size variants and
    other space_to_depth factors have none. The match is on the
    weight-shaping axes (use_trimap, space_to_depth, channel plan) plus
    recurrence: trimap_demo was trained non-recurrent (no GRU subtrees),
    trimap_prop_demo recurrent (the GRU carries the keyframe trimap
    constraint forward)."""
    base = ModelConfig()
    if (cfg.enc_channels, cfg.dec_channels) != (base.enc_channels,
                                                base.dec_channels):
        return None
    name = _DEFAULT_CKPTS.get(
        (cfg.use_trimap, cfg.use_bg_plate, cfg.space_to_depth,
         cfg.recurrent))
    if name is None:
        return None
    path = os.path.join(_CKPT_ROOT, name)
    return path if os.path.isdir(path) else None


# Keyed on (resolved checkpoint path, recurrence): configs differing only
# in non-weight axes (conv_impl, bn_eps, ...) share the same restored +
# device-committed tree instead of loading duplicate HBM copies.
_DEFAULT_CACHE: Dict[Tuple[str, bool], Dict[str, Any]] = {}


def default_variables(cfg: ModelConfig) -> Dict[str, Any]:
    """Load the shipped trained weights for ``cfg``, or raise.

    The public API calls this when the caller passes ``variables=None``:
    serving with random weights emits garbage mattes, so it is refused —
    pass ``variables=vidmat.models.weights.init_params(cfg)`` to
    explicitly opt into random weights (benchmarks, tests)."""
    path = default_checkpoint_path(cfg)
    if path is None:
        raise ValueError(
            f"no shipped trained checkpoint matches {cfg!r}: pass "
            "variables=... (a loaded checkpoint, or init_params(cfg) to "
            "explicitly opt into random weights). Shipped defaults cover "
            "the base channel plan with space_to_depth in (1, 2), the "
            "non-recurrent per-frame trimap variant (trimap_demo), the "
            "recurrent trimap-propagation variant, s2d=2 "
            "(trimap_prop_demo), and the clean-plate variant, s2d=2 "
            "(plate_demo) — see checkpoints/.")
    key = (path, cfg.recurrent)
    cached = _DEFAULT_CACHE.get(key)
    if cached is not None:
        return cached
    variables = load_checkpoint(path, template=init_params(cfg))
    # Commit to device ONCE: orbax restores host numpy arrays, and numpy
    # leaves passed to a jitted step are re-transferred EVERY call — over
    # the dev tunnel that is ~38 ms/frame of pure weight re-upload
    # (measured; docs/PERFORMANCE.md round 3), and a silent per-call H2D
    # on any hardware.
    variables = jax.tree_util.tree_map(jnp.asarray, variables)
    _DEFAULT_CACHE[key] = variables
    return variables


#: ModelConfig axes -> shipped CO-TRAINED checkpoint (matting weights +
#: the segmentation seg_head; RVM-lineage co-training via train
#: --seg-every). Only the base plan ships one.
_SEG_CKPTS = {
    (False, False, 1, True): "seg_demo",
}


def seg_default_variables(cfg: ModelConfig) -> Dict[str, Any]:
    """Load the shipped CO-TRAINED (seg_head-bearing) weights for ``cfg``,
    or raise. The segmentation surfaces (MattingSession(output='seg'),
    convert_video(output_segmentation=...)) call this when the caller
    passes no variables — a matting-only checkpoint has no seg_head and
    cannot produce segmentation output."""
    base = ModelConfig()
    name = None
    if (cfg.enc_channels, cfg.dec_channels) == (base.enc_channels,
                                                base.dec_channels):
        name = _SEG_CKPTS.get((cfg.use_trimap, cfg.use_bg_plate,
                               cfg.space_to_depth, cfg.recurrent))
    path = os.path.join(_CKPT_ROOT, name) if name else None
    if path is None or not os.path.isdir(path):
        raise ValueError(
            f"no shipped co-trained (seg_head) checkpoint matches {cfg!r}:"
            " pass variables= from a co-training run (train --seg-every /"
            " init_params(cfg, with_seg=True)); the shipped seg default"
            " covers the base plan only (checkpoints/seg_demo)")
    key = (path + "#seg", cfg.recurrent)
    cached = _DEFAULT_CACHE.get(key)
    if cached is not None:
        return cached
    variables = load_checkpoint(path, template=init_params(cfg,
                                                           with_seg=True))
    variables = jax.tree_util.tree_map(jnp.asarray, variables)
    _DEFAULT_CACHE[key] = variables
    return variables


# ---- orbax checkpoint io (SURVEY.md §5 checkpoint/resume) ----

def save_checkpoint(path: str, variables: Dict[str, Any]) -> None:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    # Persist host numpy arrays: device-committed arrays embed their
    # sharding (e.g. a TPU device) in the checkpoint metadata, which makes
    # the checkpoint unrestorable on a host without that device.
    host_vars = jax.tree_util.tree_map(lambda x: np.asarray(x), variables)
    ckptr.save(path, host_vars, force=True)


def load_checkpoint(path: str,
                    template: Optional[Dict[str, Any]] = None
                    ) -> Dict[str, Any]:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    try:
        if template is not None:
            return ckptr.restore(path, item=template)
        return ckptr.restore(path)
    except ValueError:
        # Checkpoints written by older save paths embed device shardings
        # (e.g. a TPU that isn't attached here); force single-host restore.
        if template is None:
            raise
        sharding = jax.sharding.SingleDeviceSharding(jax.devices()[0])
        restore_args = jax.tree_util.tree_map(
            lambda x: ocp.ArrayRestoreArgs(sharding=sharding,
                                           global_shape=x.shape,
                                           dtype=x.dtype), template)
        return ckptr.restore(path, item=template, restore_args=restore_args)

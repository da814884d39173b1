"""Jitted inference steppers.

``ImageStepper`` — single-image matting (PR1 workload, BASELINE.json:7).
``VideoStepper`` — per-frame recurrent stepping with the temporal state held
as device arrays between calls, so steady-state per-frame cost is pure conv
compute (BASELINE.json:5); the only host<->device traffic per frame is the
decoded RGB in and the matte/fgr out.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vidmat.config import ModelConfig
from vidmat.models.matting_net import MattingNetwork
from vidmat.models.weights import default_variables, seg_default_variables
from vidmat.ops.resize import downsample_ratio_shape
from vidmat.pipeline.trimap import canon_trimap_u8


def pad_to_multiple(x: np.ndarray, m: int = 16) -> Tuple[np.ndarray, int, int]:
    """Edge-pad HWC image so H, W are multiples of m (static-shape bucketing,
    SURVEY.md §7 'avoiding retraces'). Returns (padded, orig_h, orig_w)."""
    h, w = x.shape[:2]
    ph = (-h) % m
    pw = (-w) % m
    if ph or pw:
        x = np.pad(x, ((0, ph), (0, pw), (0, 0)), mode="edge")
    return x, h, w


def to_float_rgb(image: np.ndarray) -> np.ndarray:
    """uint8 or float HWC -> float32 [0,1]."""
    if image.dtype == np.uint8:
        return image.astype(np.float32) / 255.0
    return image.astype(np.float32)


class ImageStepper:
    """Single-image matting: pad -> one jitted fp32 forward -> crop."""

    def __init__(self, cfg: ModelConfig, variables=None):
        self.cfg = cfg
        self.net = MattingNetwork(cfg)
        # Shipped trained weights or a loud error — never silent
        # random-weight serving (VERDICT r2 item 2). tree_map(jnp.asarray)
        # commits host-numpy checkpoints to device once (numpy leaves are
        # re-transferred on EVERY jitted call otherwise).
        self.variables = jax.tree_util.tree_map(
            jnp.asarray, variables if variables is not None
            else default_variables(cfg))

        @jax.jit
        def fwd(variables, frame):
            with jax.default_matmul_precision("float32"):
                alpha, fgr, _ = self.net.apply(variables, frame, None)
            return alpha, fgr

        self._fwd = fwd

    def __call__(self, image: np.ndarray,
                 trimap: Optional[np.ndarray] = None,
                 bg_plate: Optional[np.ndarray] = None
                 ) -> Tuple[np.ndarray, np.ndarray]:
        img = to_float_rgb(image)
        if self.cfg.use_trimap:
            if trimap is None:
                raise ValueError("model config requires a trimap input")
            tri = to_float_rgb(trimap)
            if tri.ndim == 2:
                tri = tri[..., None]
            img = np.concatenate([img, tri], axis=-1)
        if self.cfg.use_bg_plate:
            if bg_plate is None:
                raise ValueError(
                    "model config requires the clean background plate "
                    "(use_bg_plate=True): pass bg_plate=<(H, W, 3) image "
                    "of the scene without the subject>")
            plate = to_float_rgb(bg_plate)
            if plate.shape[:2] != img.shape[:2]:
                raise ValueError(
                    f"bg_plate {plate.shape[:2]} must match the image "
                    f"{img.shape[:2]}")
            img = np.concatenate([img, plate[..., :3]], axis=-1)
        elif bg_plate is not None:
            raise ValueError(
                "bg_plate given but the model is not plate-conditioned "
                "(use_bg_plate=False); build with "
                "ModelConfig(use_bg_plate=True, space_to_depth=2)")
        # Space-to-depth models need the padded grid divisible by 16*s2d
        # (the packed feature maps halve every dim again) — padding to a
        # bare 16 crashes the decoder skip-concat on e.g. 80x80 inputs.
        padded, h, w = pad_to_multiple(img, 16 * self.cfg.space_to_depth)
        alpha, fgr = self._fwd(self.variables, jnp.asarray(padded)[None])
        alpha = np.asarray(alpha)[0, :h, :w]
        fgr = np.asarray(fgr)[0, :h, :w]
        return alpha, fgr


class VideoStepper:
    """Streaming recurrent stepper for a fixed (height, width) stream.

    downsample_ratio < 1 runs the net on a coarse grid and restores full
    resolution with the guided filter (BASELINE.json:9-10).

    The step body comes from the shared serving-step factory
    (vidmat.pipeline.stepfactory — the one implementation shared with
    convert_video, MultiStreamMatting, and bench.py; VERDICT r2 item 5),
    built in float-output mode (the streaming contract returns float32
    alpha/fgr, never quantized frames).

    dtype="float32" (default) is the fp32 PARITY mode: float frames in,
    float32 compute, XLA ops only — byte-for-byte the historical stepper
    semantics the parity/oracle harnesses pin. dtype="bfloat16" is the
    SERVING mode: uint8 frames ride the fused Pallas ingest and the
    planar conv path on TPU (same kernels as the video pipeline).
    """

    def __init__(self, cfg: ModelConfig, height: int, width: int,
                 variables=None, downsample_ratio: float = 1.0,
                 dtype: str = "float32", guided_radius: int = 4,
                 guided_eps: float = 1e-4,
                 static_skip_eps: Optional[float] = None,
                 tile_size: Optional[int] = None,
                 tile_overlap: int = 128,
                 bg_plate: Optional[np.ndarray] = None,
                 output: str = "matte"):
        if height % 16 or width % 16:
            raise ValueError("height/width must be multiples of 16 "
                             "(pad with pipeline.stepper.pad_to_multiple)")
        if output not in ("matte", "seg"):
            raise ValueError(f"output must be 'matte' or 'seg', "
                             f"got {output!r}")
        self.cfg = cfg
        self.h, self.w = height, width
        self.ratio = downsample_ratio
        self._seg = output == "seg"
        # Shipped trained weights or a loud error — never silent
        # random-weight serving (VERDICT r2 item 2); committed to device
        # once (numpy leaves re-transfer on every jitted call).
        if variables is None:
            variables = (seg_default_variables(cfg) if self._seg
                         else default_variables(cfg))
        if self._seg and "seg_head" not in variables["params"]:
            raise ValueError(
                "output='seg' needs a CO-TRAINED checkpoint (a seg_head "
                "subtree in the params): train with --seg-every / "
                "train_on_clips(seg_data_iter=...), or load the shipped "
                "seg_demo weights")
        self.variables = jax.tree_util.tree_map(jnp.asarray, variables)
        self.dtype = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
        self._parity = dtype != "bfloat16"

        if downsample_ratio < 1.0:
            self.net_h, self.net_w = downsample_ratio_shape(
                height, width, downsample_ratio)
        else:
            self.net_h, self.net_w = height, width

        from vidmat.config import RefineConfig
        from vidmat.pipeline.stepfactory import build_serving_body

        net = MattingNetwork(
            cfg, dtype=jnp.bfloat16 if dtype == "bfloat16" else None)
        self.net = net
        body, plan = build_serving_body(
            net, cfg,
            RefineConfig(mode="guided", guided_radius=guided_radius,
                         guided_eps=guided_eps),
            height, width, downsample_ratio, cdtype=self.dtype, bg=None,
            # Parity mode pins the historical pure-XLA float path; serving
            # mode lets the factory pick the kernels for the backend.
            use_pallas=False if self._parity else None,
            float_frames=self._parity, float_output=True,
            # Static-scene fast path (serving mode only — the factory
            # ignores it in fp32 parity mode): skip the net when the
            # coarse frame is unchanged, ~2x on static content.
            static_skip_eps=static_skip_eps,
            # 4K-rung tiled full-res refine (per-coarse-tile GF stats,
            # feather-blended coefficient grids) for streaming sessions.
            tile_size=tile_size, tile_overlap=tile_overlap,
            # Clean-plate conditioning (use_bg_plate configs): fixed per
            # session, ingested once by the factory, baked into the step
            # — the factory validates presence/absence against the config.
            bg_plate=self._prep_plate(bg_plate, height, width),
            # Segmentation output (RVM-lineage downstream/debug head):
            # same trunk + state advance, seg_head + sigmoid instead of
            # the matting tails.
            output_seg=self._seg)
        self._plan = plan
        self._step = jax.jit(body)
        self.reset()

    @staticmethod
    def _prep_plate(bg_plate, height: int, width: int):
        """Canonicalize a session plate to the stream bucket (the padding
        frames get); None passes through (the factory raises if the
        config needs one)."""
        if bg_plate is None:
            return None
        from vidmat.pipeline.video import _prepare_plate_u8

        return jnp.asarray(_prepare_plate_u8(bg_plate, height, width))

    def reset(self) -> None:
        self.state = self._plan.make_state(1)

    def _device_frame(self, frame: np.ndarray,
                      trimap: Optional[np.ndarray] = None) -> jnp.ndarray:
        if not self.cfg.use_trimap:
            if trimap is not None:
                raise ValueError(
                    "model is not trimap-conditioned (use_trimap=False); "
                    "the trimap would be silently ignored — build the "
                    "session with a trimap ModelConfig (or drop trimap=)")
        else:
            if trimap is None:
                if not self.cfg.recurrent:
                    raise ValueError(
                        "model config requires a per-frame trimap input "
                        "(step(frame, trimap=...))")
                # Trimap PROPAGATION convention (recurrent trimap family,
                # checkpoints/trimap_prop_demo): the caller annotates a
                # keyframe, later frames ride an all-unknown (0.5) trimap
                # and the GRU carries the constraint forward — exactly the
                # training convention (train/data.py keyframe mode).
                trimap = np.full(frame.shape[:2], 128, np.uint8)
            tri = canon_trimap_u8(trimap, frame.shape[:2])
            # 4th channel in the frame's dtype convention (the whole
            # stacked frame is normalized /255 or passed through as one).
            if frame.dtype != np.uint8:
                tri = (tri.astype(np.float32) / 255.0).astype(frame.dtype)
            frame = np.concatenate([np.asarray(frame), tri[..., None]],
                                   axis=-1)
        if self._parity:
            return jnp.asarray(to_float_rgb(frame))[None]
        if frame.dtype != np.uint8:
            frame = np.round(np.clip(frame, 0.0, 1.0) * 255.0
                             ).astype(np.uint8)
        return jnp.asarray(frame)[None]

    def step_device(self, frame: np.ndarray,
                    trimap: Optional[np.ndarray] = None
                    ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
        """Like :meth:`step` but returns DEVICE arrays ((1, H, W, 1) alpha,
        (1, H, W, 3) fgr, float32) with no D2H — callers that post-process
        on device (e.g. the realtime driver's composite) avoid a
        round-trip. output='seg' steppers return (mask, None)."""
        if self._seg:
            mask, self.state = self._step(
                self.variables, self._device_frame(frame, trimap),
                self.state)
            return mask, None
        (alpha, fgr), self.state = self._step(
            self.variables, self._device_frame(frame, trimap), self.state)
        return alpha, fgr

    def step(self, frame: np.ndarray,
             trimap: Optional[np.ndarray] = None
             ) -> Tuple[np.ndarray, Optional[np.ndarray]]:
        """frame: (H, W, 3) uint8 or float RGB; trimap (trimap-conditioned
        configs): (H, W) uint8 {0,128,255} or float {0,0.5,1}. Returns
        host alpha, fgr (float32 in [0, 1]); output='seg' steppers return
        (mask probability (H, W, 1) float32, None)."""
        alpha, fgr = self.step_device(frame, trimap)
        if fgr is None:
            return np.asarray(alpha)[0], None
        return np.asarray(alpha)[0], np.asarray(fgr)[0]

    # -- mid-video resume (SURVEY.md §5 checkpoint/resume: the pipeline
    # carry is itself a checkpointable pytree) --

    def _net_state(self):
        """The recurrent net carry (the static-skip coefficient cache, if
        any, is ephemeral — resumes recompute it on the first frame)."""
        return self.state[0] if self._plan.static_skip else self.state

    def save_state(self, path: str, frame_index: int = 0) -> None:
        """Persist the temporal carry + position for mid-video resume."""
        from vidmat.models.weights import save_checkpoint

        ns = self._net_state()
        carry = {"frame_index": jnp.asarray(frame_index),
                 "state": (ns._asdict() if ns is not None else {})}
        save_checkpoint(path, carry)

    def load_state(self, path: str) -> int:
        """Restore a saved carry; returns the saved frame index. The carry
        type follows the serving path (RecurrentState for XLA convs,
        PlanarState planes on the planar path)."""
        from vidmat.models.weights import load_checkpoint

        ns_cur = self._net_state()
        template = {"frame_index": jnp.asarray(0),
                    "state": (ns_cur._asdict() if ns_cur is not None
                              else {})}
        carry = load_checkpoint(path, template=template)
        if carry["state"]:
            # The carry TYPE is serving-path-dependent (NHWC RecurrentState
            # on the XLA path vs planar (C, TOTAL) planes) but both share
            # field names, so a carry saved under a different path/config
            # restores silently and then crashes deep in the next step()
            # with an opaque shape assert — validate here instead.
            cur = ns_cur._asdict()
            for k, v in carry["state"].items():
                if tuple(np.shape(v)) != tuple(cur[k].shape):
                    raise ValueError(
                        f"saved carry field {k!r} has shape "
                        f"{tuple(np.shape(v))} but this session's serving "
                        f"path expects {tuple(cur[k].shape)}: the carry was "
                        "saved on a different serving path or config (XLA "
                        "NHWC and planar carries are not interchangeable — "
                        "resume with the same dtype/backend/preset it was "
                        "saved under)")
            ns = type(ns_cur)(
                **{k: jnp.asarray(v, self.dtype)
                   for k, v in carry["state"].items()})
        else:
            ns = ns_cur
        if self._plan.static_skip:
            # Fresh cache UNCONDITIONALLY (also for non-recurrent models,
            # whose carry dict is empty): the +inf reference frame forces
            # the compute branch on the first resumed frame — stale
            # coefficients from pre-load content must never survive a
            # resume.
            self.state = (ns, self._plan.make_state(1)[1])
        elif carry["state"]:
            self.state = ns
        return int(carry["frame_index"])

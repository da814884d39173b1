"""Attribute the fused-vs-XLA float-tail divergence (VERDICT r4 item 8).

tests/unit/test_fused_tiled_tail.py::test_float_tail_in_serving_body_
matches_xla_tail measured mean |alpha_fused - alpha_xla| = 0.0072 on the
round-4 checkpoint (bound widened 2e-3 -> 1e-2). The hypothesis in the
test comment: the two paths downsample the coarse frame differently —
the fused ingest AREA-POOLS (box prefilter), the XLA fallback
BILINEAR-samples (aliasing at pool=4) — which shifts both the net input
and the guided-filter statistics.

Experiment: build the SAME Pallas body a third time with the ingest
monkeypatched to bilinear (everything else — planar net, fused GF stats,
fused float tail — unchanged). If fused(bilinear-ingest) collapses onto
the XLA body, the ingest downsample is the whole story and the remaining
fused-tail arithmetic is tight; the residual quantifies it.

Run (CPU, interpret kernels): python tools/analyze_tail_divergence.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main() -> int:
    from vidmat.config import ModelConfig, RefineConfig
    from vidmat.io.fixtures import synthetic_frame
    from vidmat.models.matting_net import MattingNetwork
    from vidmat.models.weights import init_params, load_checkpoint
    from vidmat.ops.resize import resize_bilinear
    from vidmat.pipeline.stepfactory import build_serving_body

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = ModelConfig()
    net = MattingNetwork(cfg)
    v = load_checkpoint(os.path.join(repo, "checkpoints", "synthetic_demo"),
                        template=init_params(cfg))
    h = w = 128
    refine = RefineConfig(mode="guided")
    kw = dict(cdtype=jnp.float32, bg=None, float_output=True)

    body_k, plan_k = build_serving_body(net, cfg, refine, h, w, 0.25,
                                        use_pallas=True,
                                        pallas_interpret=True, **kw)
    body_x, plan_x = build_serving_body(net, cfg, refine, h, w, 0.25,
                                        use_pallas=False, **kw)

    # Third body: Pallas path with the ingest forced to the XLA path's
    # bilinear semantics (patch active only during trace).
    import vidmat.ops.pallas as vop

    orig = vop.ingest_pool_normalize

    def bilinear_ingest(frame_u8, pool, out_dtype, interpret=False):
        x = frame_u8.astype(jnp.float32) * (1.0 / 255.0)
        return resize_bilinear(x, frame_u8.shape[1] // pool,
                               frame_u8.shape[2] // pool).astype(out_dtype)

    vop.ingest_pool_normalize = bilinear_ingest
    try:
        body_kb, plan_kb = build_serving_body(net, cfg, refine, h, w, 0.25,
                                              use_pallas=True,
                                              pallas_interpret=True, **kw)
        frame, _ = synthetic_frame(h, w, 0.4, seed=7)
        f = jnp.asarray(frame)[None]
        (a_kb, f_kb), _ = jax.jit(body_kb)(v, f, plan_kb.make_state(1))
    finally:
        vop.ingest_pool_normalize = orig

    frame, _ = synthetic_frame(h, w, 0.4, seed=7)
    f = jnp.asarray(frame)[None]
    (a_k, f_k), _ = jax.jit(body_k)(v, f, plan_k.make_state(1))
    (a_x, f_x), _ = jax.jit(body_x)(v, f, plan_x.make_state(1))

    # Ingest-level difference itself, for scale.
    pooled = orig(f, pool=4, out_dtype=jnp.float32, interpret=True)
    bil = bilinear_ingest(f, 4, jnp.float32)
    report = {
        "coarse_ingest_mean_absdiff": float(
            jnp.abs(pooled - bil).mean()),
        "fused_vs_xla": {
            "alpha_mean": float(np.abs(np.asarray(a_k - a_x)).mean()),
            "alpha_max": float(np.abs(np.asarray(a_k - a_x)).max()),
            "fgr_mean": float(np.abs(np.asarray(f_k - f_x)).mean()),
        },
        "fusedBilinearIngest_vs_xla": {
            "alpha_mean": float(np.abs(np.asarray(a_kb - a_x)).mean()),
            "alpha_max": float(np.abs(np.asarray(a_kb - a_x)).max()),
            "fgr_mean": float(np.abs(np.asarray(f_kb - f_x)).mean()),
        },
        "fused_vs_fusedBilinearIngest": {
            "alpha_mean": float(np.abs(np.asarray(a_k - a_kb)).mean()),
        },
    }
    print(json.dumps(report, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Static HBM/FLOP breakdown of the 1080p planar serving step.

cost_analysis() on compiled subgraphs: the full step, the net forward, and
each glue op in isolation (s2d/d2s selection matmuls, plane<->grid
conversions, 2x upsample) — to find where the remaining per-frame HBM
traffic lives after the planar conv kernels (docs/PERFORMANCE.md round-2
section: net-forward HBM 386 MB vs ~20 MB of raw activations).

Compile-only (no timing): safe to run while other jobs own the chip.
"""

import json
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def cost(fn, *args):
    import jax

    c = jax.jit(fn).lower(*args).compile().cost_analysis()
    return {"mb": round(c.get("bytes accessed", 0) / 1e6, 1),
            "gflop": round(c.get("flops", 0) / 1e9, 3)}


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      __file__.rsplit("/", 2)[0] + "/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from vidmat.config import ModelConfig, RefineConfig
    from vidmat.models.matting_net import MattingNetwork
    from vidmat.models.planar import (build_planar_forward, d2s_grid,
                                      grid_to_plane, plane_to_grid,
                                      planar_init_state, s2d_grid,
                                      upsample2x_grid)
    from vidmat.models.weights import init_params
    from vidmat.pipeline.stepfactory import build_serving_body

    h, w = 1088, 1920
    cfg = ModelConfig(space_to_depth=2, conv_impl="planar")
    net = MattingNetwork(cfg, dtype=jnp.bfloat16)
    variables = init_params(cfg)
    rng = np.random.RandomState(0)
    frame_u8 = jnp.asarray(rng.randint(0, 255, (1, h, w, 3), np.uint8))

    body, plan = build_serving_body(net, cfg, RefineConfig(), h, w, 0.25,
                                    cdtype=jnp.bfloat16)
    state = plan.make_state(1)
    print(json.dumps({"stage": "full step (1080p ds=.25 planar)",
                      **cost(body, variables, frame_u8, state)}), flush=True)

    # net forward alone on the padded coarse grid
    sh, sw = plan.state_h, plan.state_w
    fwd = build_planar_forward(cfg, sh, sw, dtype=jnp.bfloat16)
    x = jnp.asarray(rng.rand(1, sh, sw, 3).astype(np.float32))
    st = planar_init_state(cfg, sh, sw, jnp.bfloat16)
    print(json.dumps({"stage": f"net fwd alone ({sh}x{sw})",
                      **cost(fwd, variables, x, st)}), flush=True)

    # glue ops in isolation (bf16, real level shapes)
    s = cfg.space_to_depth
    g0 = (sh // s, sw // s)
    pieces = {
        f"s2d_grid 3ch {sh}x{sw}":
            (lambda a: s2d_grid(a, 2),
             jnp.asarray(rng.rand(3, sh, sw), jnp.bfloat16)),
        f"d2s_grid 4ch {g0[0]}x{g0[1]}":
            (lambda a: d2s_grid(a, 2),
             jnp.asarray(rng.rand(4, *g0), jnp.float32)),
        f"grid_to_plane 16ch {g0[0]}x{g0[1]}":
            (grid_to_plane,
             jnp.asarray(rng.rand(16, *g0), jnp.bfloat16)),
        f"plane+grid roundtrip 16ch {g0[0]}x{g0[1]}":
            (lambda a: grid_to_plane(plane_to_grid(grid_to_plane(a),
                                                   *g0)),
             jnp.asarray(rng.rand(16, *g0), jnp.bfloat16)),
        f"upsample2x_grid 40ch {g0[0]//2}x{g0[1]//2}":
            (upsample2x_grid,
             jnp.asarray(rng.rand(40, g0[0] // 2, g0[1] // 2),
                         jnp.bfloat16)),
        f"upsample+conv glue 2x20ch {g0[0]//2}x{g0[1]//2}":
            (lambda a: grid_to_plane(upsample2x_grid(a)),
             jnp.asarray(rng.rand(40, g0[0] // 2, g0[1] // 2),
                         jnp.bfloat16)),
    }
    for name, (fn, arg) in pieces.items():
        print(json.dumps({"stage": name, **cost(fn, arg)}), flush=True)


if __name__ == "__main__":
    main()

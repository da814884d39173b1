"""Compare compiled cost of the session float-output body vs the packed
serving body at 1080p (diagnosing the 28 fps session measurement)."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))) + "/.jax_cache")
    import jax.numpy as jnp

    from vidmat.config import PRESETS
    from vidmat.models.matting_net import MattingNetwork
    from vidmat.models.weights import init_params
    from vidmat.pipeline.stepfactory import build_serving_body

    cfg, pcfg = PRESETS["video_1080p"]()
    h, w = 1088, 1920
    cdtype = jnp.bfloat16
    net = MattingNetwork(cfg, dtype=cdtype)
    v = init_params(cfg)
    f = jnp.asarray(np.random.RandomState(0).randint(
        0, 255, (1, h, w, 3), np.uint8))

    for name, kw in [("packed", {}),
                     ("float_output", dict(float_output=True))]:
        body, plan = build_serving_body(net, cfg, pcfg.refine, h, w,
                                        pcfg.downsample_ratio,
                                        cdtype=cdtype, bg=None, **kw)
        st = plan.make_state(1)
        lowered = jax.jit(body).lower(v, f, st)
        comp = lowered.compile()
        ca = comp.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        print(name, "flops=%.2fG" % (ca.get("flops", 0) / 1e9),
              "bytes=%.1fMB" % (ca.get("bytes accessed", 0) / 1e6),
              flush=True)


if __name__ == "__main__":
    main()

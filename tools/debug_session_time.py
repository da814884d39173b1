"""Time the float-output session body vs the packed serving body with the
bench.py chain methodology (same fetch, same chains)."""

import os
import sys
import time

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
    rng = np.random.RandomState(0)
    ring = [jax.device_put(rng.randint(0, 255, (1, h, w, 3), np.uint8))
            for _ in range(4)]

    def bench_body(name, body, plan, fetch):
        step = jax.jit(body)

        def chain(n):
            st = plan.make_state(1)
            out = None
            t0 = time.perf_counter()
            for i in range(n):
                outs, st = step(v, ring[i % 4], st)
                out = outs
            fetch(out)
            jax.block_until_ready(st)
            return time.perf_counter() - t0

        chain(5)
        per = []
        for _ in range(7):
            ts = chain(20)
            tl = chain(120)
            p = (tl - ts) / 100.0
            if p > 0:
                per.append(p)
        print(name, "p50_ms=%.2f" % (1e3 * float(np.median(per))),
              "fps=%.0f" % (1.0 / float(np.median(per))), flush=True)

    body_p, plan_p = build_serving_body(net, cfg, pcfg.refine, h, w,
                                        pcfg.downsample_ratio,
                                        cdtype=cdtype, bg=None)
    bench_body("packed", body_p, plan_p,
               lambda o: np.asarray(o[:, :1024]))
    body_f, plan_f = build_serving_body(net, cfg, pcfg.refine, h, w,
                                        pcfg.downsample_ratio,
                                        cdtype=cdtype, bg=None,
                                        float_output=True)
    bench_body("float_out", body_f, plan_f,
               lambda o: np.asarray(o[1][:, :700]))  # fgr band ~8 MB


if __name__ == "__main__":
    main()

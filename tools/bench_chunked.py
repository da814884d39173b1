"""Per-frame dispatch vs chunked lax.scan for the 1080p serving step.

Round-1 measured chunked scan SLOWER (7-8 ms/frame at K=4 vs 2.4) on the
XLA-conv step and attributed it to scan serializing iterations while the
async runtime pipelines per-frame calls. Re-measured here for the planar
path: if the per-call dispatch floor (~1 ms on the dev tunnel) dominates
the step, a K-frame scan amortizes it K-fold.

Timing: chained recurrent steps, one packed-output D2H (~8 MB — large
enough not to stall the relay), amortized difference, median of pairs.
"""

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--net", default="planar", choices=["planar", "xla"])
    ap.add_argument("--ks", type=int, nargs="+", default=[1, 4, 8])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      __file__.rsplit("/", 2)[0] + "/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from vidmat.config import ModelConfig, RefineConfig
    from vidmat.models.matting_net import MattingNetwork
    from vidmat.models.weights import init_params
    from vidmat.pipeline.stepfactory import build_serving_body

    h, w, ratio = 1088, 1920, 0.25
    cfg = ModelConfig(space_to_depth=2, conv_impl=args.net)
    net = MattingNetwork(cfg, dtype=jnp.bfloat16)
    variables = init_params(cfg)
    body, plan = build_serving_body(net, cfg, RefineConfig(), h, w, ratio,
                                    cdtype=jnp.bfloat16)
    state0 = plan.make_state(1)
    rng = np.random.RandomState(0)

    for k in args.ks:
        if k == 1:
            step = jax.jit(body)
            ring = [jax.device_put(rng.randint(0, 255, (1, h, w, 3),
                                               np.uint8)) for _ in range(4)]

            def run(n_calls):
                st, out = state0, None
                t0 = time.perf_counter()
                for i in range(n_calls):
                    out, st = step(variables, ring[i % 4], st)
                np.asarray(out)
                return time.perf_counter() - t0
        else:
            @jax.jit
            def kstep(variables, frames, st):
                def sbody(s, f):
                    outs, ns = body(variables, f, s)
                    return ns, outs
                ns, outs = jax.lax.scan(sbody, st, frames)
                return outs, ns

            ring = [jax.device_put(rng.randint(0, 255, (k, 1, h, w, 3),
                                               np.uint8)) for _ in range(2)]

            def run(n_calls, kstep=kstep):
                st, out = state0, None
                t0 = time.perf_counter()
                for i in range(n_calls):
                    out, st = kstep(variables, ring[i % 2], st)
                np.asarray(out[-1])
                return time.perf_counter() - t0

        n_frames = 96
        n_short, n_long = (n_frames // k) // 4, n_frames // k
        run(2)
        diffs = []
        for _ in range(5):
            ts = run(n_short)
            tl = run(n_long)
            diffs.append((tl - ts) / ((n_long - n_short) * k))
        spf = float(np.median(diffs))
        print(json.dumps({"k": k, "net": args.net,
                          "ms_per_frame": round(spf * 1e3, 3),
                          "fps": round(1.0 / spf, 1)}), flush=True)


if __name__ == "__main__":
    main()

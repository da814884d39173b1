"""Measure the streaming MattingSession's serving-mode step rate on TPU.

VERDICT r2 item 5 'Done' evidence: after unification on
stepfactory.build_serving_body, the streaming API's jitted step is the
SAME body the pipeline jits, so its device throughput must match the
pipeline's per-frame-dispatch rate (the session is interactive — one
frame in, one result out — so chunked dispatch does not apply).

Method: device-resident chained stepping of the session's own jitted
step (amortized T_long - T_short, same methodology as bench.py; the
session's host step() additionally pays the per-frame H2D/D2H that the
dev tunnel inflates ~1000x, measured separately by bench --mode=e2e).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
                      + "/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from vidmat.api import MattingSession
    from vidmat.config import PRESETS

    cfg, pcfg = PRESETS["video_1080p"]()
    h, w = 1088, 1920
    sess = MattingSession(h, w, model_cfg=cfg,
                          downsample_ratio=pcfg.downsample_ratio,
                          dtype="bfloat16")
    stepper = sess._stepper
    rng = np.random.RandomState(0)
    ring = [jax.device_put(rng.randint(0, 255, (1, h, w, 3), np.uint8))
            for _ in range(4)]

    def chain(n):
        state = stepper._plan.make_state(1)
        out = None
        t0 = time.perf_counter()
        for i in range(n):
            (alpha, fgr), state = stepper._step(stepper.variables,
                                                ring[i % 4], state)
            out = fgr
        # ~8 MB dependent band (tiny fetches stall on the dev tunnel —
        # docs/PERFORMANCE.md methodology; the first cut of this tool
        # fetched 0.5 MB and measured a bogus 28 fps).
        np.asarray(out[:, :360])
        jax.block_until_ready(state)
        return time.perf_counter() - t0

    chain(5)  # compile + warm
    samples = []
    for _ in range(9):
        t_s = chain(20)
        t_l = chain(120)
        per = (t_l - t_s) / 100.0
        if per > 0:
            samples.append(per)
    spf = float(np.median(samples))
    print({"metric": "MattingSession serving-mode 1080p step (device)",
           "fps": round(1.0 / spf, 1), "p50_ms": round(spf * 1e3, 3),
           "device": str(jax.devices()[0])})


if __name__ == "__main__":
    sys.exit(main())

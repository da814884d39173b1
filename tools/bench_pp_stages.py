"""Measure the pipeline-parallel stage split on one chip: t_stage0
(ingest + planar net + GF coeffs), t_stage1 (fused refine+composite), and
the composed body, at the 1080p serving preset.

The 2-device pipeline (vidmat.parallel.pp) runs max(t0, t1) per frame in
steady state instead of t0 + t1 — this tool measures the real split so
the projected single-stream speedup in docs/PERFORMANCE.md is arithmetic
on measured numbers, not assumption (only one real chip is available, so
the pipeline itself cannot be wall-clock-measured here).

Methodology matches bench.py: chained chunked dispatch, dependent ~8 MB
band fetch, amortized (T_long - T_short) medians (docs/PERFORMANCE.md
"measurement methodology").
"""

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="288x512 shapes (CPU/debug)")
    ap.add_argument("--chunk", type=int, default=4)
    ap.add_argument("--repeats", type=int, default=7)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      __file__.rsplit("/", 2)[0] + "/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from vidmat.config import PRESETS
    from vidmat.models.matting_net import MattingNetwork
    from vidmat.models.weights import init_params
    from vidmat.pipeline.stepfactory import build_serving_body

    cfg, pcfg = PRESETS["video_1080p"]()
    h, w = (288, 512) if args.quick else (1088, 1920)
    ratio = 0.5 if args.quick else pcfg.downsample_ratio
    cdtype = jnp.bfloat16
    net = MattingNetwork(cfg, dtype=cdtype)
    variables = init_params(cfg)
    body, plan = build_serving_body(net, cfg, pcfg.refine, h, w, ratio,
                                    cdtype=cdtype, bg=None)
    assert plan.fused_stage0 is not None, "preset must take the fused tail"
    stage0, stage1 = plan.fused_stage0, plan.fused_stage1
    K = args.chunk

    @jax.jit
    def chain_full(variables, frames, st):
        def sbody(s, f):
            outs, ns = body(variables, f, s)
            return ns, outs
        ns, outs = jax.lax.scan(sbody, st, frames)
        return outs, ns

    @jax.jit
    def chain_s0(variables, frames, st):
        def sbody(s, f):
            (ma, mb), ns = stage0(variables, f, s)
            return ns, (ma, mb)
        ns, (ma, mb) = jax.lax.scan(sbody, st, frames)
        return ma, ns

    @jax.jit
    def chain_s1(frames, ma, mb):
        # stage1 is stateless; thread one byte of the previous output into
        # the next frame so the scan iterations cannot be overlapped away.
        def sbody(prev_bit, f):
            out = stage1(f + prev_bit, ma[0], mb[0], None)
            return (out[0, 0, 0] & 1).astype(jnp.uint8), out
        _, outs = jax.lax.scan(sbody, jnp.uint8(0), frames)
        return outs

    rng = np.random.RandomState(0)
    frames = jax.device_put(
        rng.randint(0, 255, (K, 1, h, w, 3), np.uint8))
    st0 = plan.make_state(1)
    hl, wl = plan.net_h, plan.net_w
    ma0 = jax.device_put(rng.rand(1, 1, hl, wl, 4).astype(np.float32))
    mb0 = jax.device_put(rng.rand(1, 1, hl, wl, 4).astype(np.float32))

    def timed(fn, n_chunks):
        """Chained chunks; sync via block_until_ready on the chain-
        dependent device value (NO D2H: an 8 MB band fetch costs ~160 ms
        of jittery relay time per sample on the dev tunnel, which buried
        the per-stage signal; blocking only waits for compute)."""
        t0 = time.perf_counter()
        out = None
        for _ in range(n_chunks):
            out = fn()
        jax.block_until_ready(out)
        return time.perf_counter() - t0

    st = {"v": st0}

    def full_once():
        outs, st["v"] = chain_full(variables, frames, st["v"])
        return outs

    def s0_once():
        ma, st["v2"] = chain_s0(variables, frames,
                                st.get("v2", st0))
        return ma

    def s1_once():
        return chain_s1(frames, ma0, mb0)

    # Round-robin sampling: the tunnel's dispatch floor drifts on a
    # seconds timescale, so sampling the three chains back-to-back within
    # each round (instead of all repeats of one, then the next) exposes
    # every chain to the same drift. Adaptive stop on tight IQRs
    # (the bench.py methodology).
    targets = [("composed body (t0+t1)", full_once),
               ("stage0: ingest+net+coeffs", s0_once),
               ("stage1: fused refine+composite", s1_once)]
    n_short, n_long = 6, 36
    samples = {lbl: [] for lbl, _ in targets}
    for _, fn in targets:
        fn()  # compile + warm
    for _ in range(args.repeats):
        for lbl, fn in targets:
            ts = timed(fn, n_short)
            tl = timed(fn, n_long)
            spf = (tl - ts) / ((n_long - n_short) * K)
            if spf > 0:
                samples[lbl].append(spf)
        vs = list(samples.values())
        if all(len(v) >= 8 for v in vs):
            tight = True
            for v in vs:
                q1, med, q3 = np.percentile(v, [25, 50, 75])
                tight &= (q3 - q1) <= 0.25 * med
            if tight:
                break

    rows = [{"label": lbl,
             "ms_per_frame": round(float(np.median(v)) * 1e3, 4)
             if (v := samples[lbl]) else float("nan"),
             "n_valid": len(samples[lbl])}
            for lbl, _ in targets]
    t_full = rows[0]["ms_per_frame"]
    t0_, t1_ = rows[1]["ms_per_frame"], rows[2]["ms_per_frame"]
    proj = {
        "pp_steady_ms_per_frame": round(max(t0_, t1_), 4),
        "projected_speedup_vs_1chip": round(t_full / max(t0_, t1_), 3),
        "dp_speedup_2chip_2streams": 2.0,
    }
    print(json.dumps({"resolution": f"{w}x{h}", "chunk": K,
                      "stages": rows, "projection": proj,
                      "device": str(jax.devices()[0])}))


if __name__ == "__main__":
    main()

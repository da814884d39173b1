"""Benchmark: 1080p recurrent matting throughput on one TPU chip.

Headline metric (BASELINE.json:2): 1080p frames/sec/chip, with p50 per-frame
latency. The reference publishes no numbers (BASELINE.md — empty tree,
``"published": {}``), so ``vs_baseline`` is measured against the driver's
pinned rebuild target of 200 fps/chip (BASELINE.json:5).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}
The line also carries fps_min/fps_max across the timing repeats so the
number is self-describing about run-to-run spread (VERDICT r1 item 10).

Modes (--mode=...):
  1080p (default), 4k, 4k_tiled, multistream, 480p — device-resident
    frame ring,
    measures chip throughput with the real serving step (ingest -> recurrent
    net -> guided refine -> composite; the shared body from
    vidmat.pipeline.stepfactory, identical to what convert_video jits).
  e2e — host-fed convert_video: decode thread + H2D + device step + D2H +
    encode all included (VERDICT r1 item 4). On the dev axon tunnel the H2D
    relay costs ~125 ms/frame that no real deployment sees; that cost is
    measured and reported separately (h2d_ms_per_frame) so the chip-side
    number stays honest.
"""

import argparse
import json
import time

import numpy as np


def _watchdog(seconds: float = 900.0) -> None:
    """Fail loudly if the TPU tunnel wedges (observed mid-round: the pool
    claim can hang indefinitely); prints an explicit error JSON instead of
    hanging the driver."""
    import os
    import threading

    def fire():
        print(json.dumps({
            "metric": "1080p recurrent matting throughput (frames/sec/chip)",
            "value": 0, "unit": "fps/chip", "vs_baseline": 0,
            "error": f"TPU unreachable: bench exceeded {seconds:.0f}s "
                     "(tunnel watchdog)"}), flush=True)
        os._exit(3)

    t = threading.Timer(seconds, fire)
    t.daemon = True
    t.start()


TARGET_FPS = 200.0  # BASELINE.json:5 rebuild target; no published ref #s


def _bench_e2e(jax, quick: bool) -> dict:
    """Host-fed end-to-end: the full pipeline with H2D, per-frame D2H and
    real mp4 encode included (the >200 fps target is about the pipeline,
    not a device-resident ring)."""
    import tempfile

    from vidmat.config import PRESETS
    from vidmat.io.fixtures import synthetic_frames_only
    from vidmat.pipeline.video import VideoPipeline

    h, w, n = (288, 512, 40) if quick else (1080, 1920, 120)
    frames = list(synthetic_frames_only(h, w, n))
    # The shipped 1080p preset end-to-end, trained default weights and all
    # (VideoPipeline auto-loads checkpoints/fast_demo for this config).
    cfg, pipe = PRESETS["video_1080p"]()
    pipeline = VideoPipeline(model_cfg=cfg, pipe_cfg=pipe)
    # Warm run compiles the step; the timed run reuses it via the pipeline
    # step cache, so wall-clock below is steady-state only.
    pipeline.run(frames[:3])
    out_path = tempfile.mktemp(suffix=".mp4")
    t0 = time.perf_counter()
    m = pipeline.run(frames, output_alpha=out_path)
    wall = time.perf_counter() - t0
    # Isolate the raw H2D relay cost (tunnel artifact on the dev setup):
    # time device_put of one frame, median of 5.
    buf = frames[0][None]
    h2d = []
    for _ in range(5):
        t1 = time.perf_counter()
        x = jax.device_put(buf)
        np.asarray(x[0, 0, 0])  # force completion (block_until_ready is
        # unreliable over the tunnel; docs/PERFORMANCE.md)
        h2d.append(time.perf_counter() - t1)
    fps = n / wall
    return {
        "metric": "e2e host-fed 1080p pipeline throughput "
                  "(decode+H2D+matting+D2H+encode)",
        "value": round(fps, 2),
        "unit": "fps",
        "vs_baseline": round(fps / TARGET_FPS, 3),
        "p50_ms": round(m.get("p50_ms", 1e3 * wall / n), 2),
        "h2d_ms_per_frame": round(1e3 * float(np.median(h2d)), 1),
        "device": str(jax.devices()[0]),
        "resolution": f"{w}x{h}",
        "frames": n,
    }


def _bench_smoke(jax) -> dict:
    """Compile every Pallas kernel at minimal shapes on the real backend
    and compare against its interpret-mode oracle (VERDICT r2 item 7): a
    Mosaic lowering regression fails here in seconds with a NAMED kernel,
    instead of surfacing as a 900 s watchdog JSON mid-bench."""
    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    report, failed = {}, []

    def check(name, fn):
        t0 = time.perf_counter()
        try:
            err, tol = fn()
            entry = {"max_err": float(err), "tol": tol,
                     "s": round(time.perf_counter() - t0, 1)}
            if not (err <= tol):
                entry["status"] = "TOLERANCE_EXCEEDED"
                failed.append(name)
            report[name] = entry
        except Exception as e:  # compile/lowering failure — the target
            report[name] = {"status": "ERROR",
                            "error": f"{type(e).__name__}: {e}"[:500],
                            "s": round(time.perf_counter() - t0, 1)}
            failed.append(name)

    def k_ingest():
        from vidmat.ops.pallas.ingest_kernel import ingest_pool_normalize

        f = jnp.asarray(rng.randint(0, 255, (1, 64, 256, 3), np.uint8))
        got = np.asarray(ingest_pool_normalize(f, pool=2)
                         .astype(jnp.float32))
        want = np.asarray(ingest_pool_normalize(f, pool=2, interpret=True)
                          .astype(jnp.float32))
        return np.abs(got - want).max(), 2e-2  # bf16 output

    def k_gf():
        from vidmat.ops.pallas.gf_kernel import guided_filter_coeffs

        g = jnp.asarray(rng.rand(1, 64, 256, 1).astype(np.float32))
        p = jnp.asarray(rng.rand(1, 64, 256, 4).astype(np.float32))
        a, b = guided_filter_coeffs(g, p)
        ai, bi = guided_filter_coeffs(g, p, interpret=True)
        return max(np.abs(np.asarray(a) - np.asarray(ai)).max(),
                   np.abs(np.asarray(b) - np.asarray(bi)).max()), 1e-3

    def k_composite():
        from vidmat.ops.pallas.composite_kernel import (
            composite_rgba_packed, unpack_rgba_host)

        fgr = jnp.asarray(rng.rand(1, 64, 256, 3).astype(np.float32))
        alpha = jnp.asarray(rng.rand(1, 64, 256, 1).astype(np.float32))
        bg = jnp.asarray(rng.rand(64, 256, 3).astype(np.float32))  # image
        got = unpack_rgba_host(np.asarray(
            composite_rgba_packed(fgr, alpha, bg)))
        want = unpack_rgba_host(np.asarray(
            composite_rgba_packed(fgr, alpha, bg, interpret=True)))
        return np.abs(got.astype(int) - want.astype(int)).max(), 1

    def k_refine():
        from vidmat.ops.pallas.refine_kernel import fused_refine_composite

        f = jnp.asarray(rng.randint(0, 255, (1, 64, 256, 3), np.uint8))
        a = jnp.asarray(rng.uniform(-1, 1, (1, 16, 64, 4))
                        .astype(np.float32))
        b = jnp.asarray(rng.uniform(-0.5, 1, (1, 16, 64, 4))
                        .astype(np.float32))
        got = np.asarray(fused_refine_composite(f, a, b, None, pool=4))
        want = np.asarray(fused_refine_composite(f, a, b, None, pool=4,
                                                 interpret=True))
        d = np.abs(got.view(np.uint8).astype(int)
                   - want.view(np.uint8).astype(int))
        return d.max(), 1

    def k_refine_coarse_bg():
        # bg_mode='coarse' (portrait blur): the coarse background rides
        # the kernel's banded upsample — compiled vs interpret oracle.
        from vidmat.ops.pallas.refine_kernel import fused_refine_composite

        f = jnp.asarray(rng.randint(0, 255, (1, 64, 256, 3), np.uint8))
        a = jnp.asarray(rng.uniform(-1, 1, (1, 16, 64, 4))
                        .astype(np.float32))
        b = jnp.asarray(rng.uniform(-0.5, 1, (1, 16, 64, 4))
                        .astype(np.float32))
        bgc = jnp.asarray(rng.rand(1, 16, 64, 3).astype(np.float32))
        got = np.asarray(fused_refine_composite(f, a, b, bgc, pool=4))
        want = np.asarray(fused_refine_composite(f, a, b, bgc, pool=4,
                                                 interpret=True))
        d = np.abs(got.view(np.uint8).astype(int)
                   - want.view(np.uint8).astype(int))
        return d.max(), 1

    def k_refine_float():
        from vidmat.ops.pallas.refine_kernel import fused_refine_float

        f = jnp.asarray(rng.randint(0, 255, (1, 64, 256, 3), np.uint8))
        a = jnp.asarray(rng.uniform(-1, 1, (1, 16, 64, 4))
                        .astype(np.float32))
        b = jnp.asarray(rng.uniform(-0.5, 1, (1, 16, 64, 4))
                        .astype(np.float32))
        ga, gf = fused_refine_float(f, a, b, pool=4)
        wa, wf = fused_refine_float(f, a, b, pool=4, interpret=True)
        return max(np.abs(np.asarray(ga) - np.asarray(wa)).max(),
                   np.abs(np.asarray(gf) - np.asarray(wf)).max()), 1e-5

    def k_planar_conv():
        from vidmat.ops.pallas.planar import (conv3x3_taps,
                                              conv_tap_weights,
                                              interior_mask, planar_conv,
                                              to_planar)

        h, w, ci, co = 32, 240, 8, 8
        x = to_planar(jnp.asarray(rng.randn(1, h, w, ci)
                                  .astype(np.float32)))
        k = jnp.asarray(rng.randn(3, 3, ci, co).astype(np.float32) * 0.1)
        args = ([x], [conv_tap_weights(k)], conv3x3_taps(w),
                jnp.ones((co, 1), jnp.float32),
                jnp.zeros((co, 1), jnp.float32), interior_mask(h, w))
        got = np.asarray(planar_conv(*args))
        want = np.asarray(planar_conv(*args, interpret=True))
        return np.abs(got - want).max(), 1e-4

    def k_planar_gru():
        from vidmat.ops.pallas.planar import (conv3x3_taps,
                                              conv_tap_weights,
                                              interior_mask, planar_gru,
                                              to_planar)

        h, w, c = 32, 240, 8
        xp = to_planar(jnp.asarray(rng.randn(1, h, w, c)
                                   .astype(np.float32)))
        hp = to_planar(jnp.asarray(rng.randn(1, h, w, c)
                                   .astype(np.float32)))
        wg = jnp.asarray(rng.randn(3, 3, 2 * c, 2 * c)
                         .astype(np.float32) * 0.1)
        wc_ = jnp.asarray(rng.randn(3, 3, 2 * c, c)
                          .astype(np.float32) * 0.1)
        args = (xp, hp,
                conv_tap_weights(wg[:, :, :c]),
                conv_tap_weights(wg[:, :, c:]),
                jnp.zeros((2 * c, 1), jnp.float32),
                conv_tap_weights(wc_[:, :, :c]),
                conv_tap_weights(wc_[:, :, c:]),
                jnp.zeros((c, 1), jnp.float32),
                interior_mask(h, w), conv3x3_taps(w))
        got = np.asarray(planar_gru(*args))
        want = np.asarray(planar_gru(*args, interpret=True))
        return np.abs(got - want).max(), 1e-4

    def k_planar_conv2():
        # Both fused-pair tap layouts of models/planar.py (round 3):
        # encoder stage (stride-2 as 4-tap on the packed plane -> 3x3)
        # and d0+head (3x3 -> 3x3).
        from vidmat.models.matting_net import space_to_depth
        from vidmat.ops.pallas.planar import (conv3x3_taps,
                                              conv_tap_weights,
                                              interior_mask, planar_conv2,
                                              stride2_taps,
                                              stride2_tap_weights,
                                              to_planar)

        h, w, ci, cm, co = 32, 240, 6, 8, 8
        x = jnp.asarray(rng.randn(1, h, w, ci).astype(np.float32))
        ka = jnp.asarray(rng.randn(3, 3, ci, cm).astype(np.float32) * 0.2)
        kb = jnp.asarray(rng.randn(3, 3, cm, co).astype(np.float32) * 0.2)
        s1 = jnp.ones((cm, 1), jnp.float32)
        b1 = jnp.zeros((cm, 1), jnp.float32)
        s2 = jnp.ones((co, 1), jnp.float32)
        b2 = jnp.zeros((co, 1), jnp.float32)
        worst = 0.0
        # encoder-stage layout
        args = ([to_planar(space_to_depth(x, 2))],
                [stride2_tap_weights(ka, ci)], stride2_taps(w // 2),
                s1, b1, conv_tap_weights(kb), conv3x3_taps(w // 2),
                s2, b2, interior_mask(h // 2, w // 2))
        got = np.asarray(planar_conv2(*args))
        want = np.asarray(planar_conv2(*args, interpret=True))
        worst = max(worst, np.abs(got - want).max())
        # d0+head layout
        kc = jnp.asarray(rng.randn(3, 3, ci, cm).astype(np.float32) * 0.2)
        args = ([to_planar(x)], [conv_tap_weights(kc)], conv3x3_taps(w),
                s1, b1, conv_tap_weights(kb), conv3x3_taps(w),
                s2, b2, interior_mask(h, w))
        got = np.asarray(planar_conv2(*args, act2="none"))
        want = np.asarray(planar_conv2(*args, act2="none", interpret=True))
        return max(worst, np.abs(got - want).max()), 1e-4

    def k_planar_conv_gru():
        # Fused decoder stage (round 3): conv + split + ConvGRU.
        from vidmat.ops.pallas.planar import (conv3x3_taps,
                                              conv_tap_weights,
                                              interior_mask,
                                              planar_conv_gru, to_planar)

        h, w, ci, feats = 32, 240, 6, 8
        half = feats // 2
        xs = [to_planar(jnp.asarray(rng.randn(1, h, w, ci)
                                    .astype(np.float32)))]
        k = jnp.asarray(rng.randn(3, 3, ci, feats).astype(np.float32) * 0.2)
        kg = jnp.asarray(rng.randn(3, 3, feats, feats)
                         .astype(np.float32) * 0.2)
        kc = jnp.asarray(rng.randn(3, 3, feats, half)
                         .astype(np.float32) * 0.2)
        hp = to_planar(jnp.asarray(rng.randn(1, h, w, half)
                                   .astype(np.float32) * 0.5))
        args = (xs, [conv_tap_weights(k)], conv3x3_taps(w),
                jnp.ones((feats, 1), jnp.float32),
                jnp.zeros((feats, 1), jnp.float32), hp,
                conv_tap_weights(kg[:, :, :half]),
                conv_tap_weights(kg[:, :, half:]),
                jnp.zeros((feats, 1), jnp.float32),
                conv_tap_weights(kc[:, :, :half]),
                conv_tap_weights(kc[:, :, half:]),
                jnp.zeros((half, 1), jnp.float32),
                interior_mask(h, w))
        ga, gh = planar_conv_gru(*args)
        wa, wh = planar_conv_gru(*args, interpret=True)
        return max(np.abs(np.asarray(ga) - np.asarray(wa)).max(),
                   np.abs(np.asarray(gh) - np.asarray(wh)).max()), 1e-4

    def k_export_roundtrip():
        # AOT deployment (vidmat.deploy): export the REAL serving body —
        # on TPU this embeds the Mosaic kernel payloads in the StableHLO
        # artifact — then reload it with the bundle loader and compare one
        # step against the live jitted body. A jax.export regression (e.g.
        # tpu_custom_call no longer round-tripping) fails here with a name
        # instead of breaking deployments silently.
        import shutil
        import tempfile

        from vidmat.config import ModelConfig, PipelineConfig, RefineConfig
        from vidmat.deploy import ServingBundle, export_bundle
        from vidmat.models.matting_net import MattingNetwork
        from vidmat.models.weights import init_params
        from vidmat.pipeline.stepfactory import build_serving_body

        h, w = 48, 64
        cfg = ModelConfig(conv_impl="planar", space_to_depth=2)
        pipe = PipelineConfig(downsample_ratio=0.5, dtype="bfloat16",
                              refine=RefineConfig(mode="guided"))
        variables = init_params(cfg, seed=7)
        tmp = tempfile.mkdtemp()
        try:
            export_bundle(tmp + "/b", h, w, model_cfg=cfg, pipe_cfg=pipe,
                          variables=variables, bg_color=(0.0, 0.0, 1.0))
            bundle = ServingBundle(tmp + "/b")
            net = MattingNetwork(cfg, dtype=jnp.bfloat16)
            body, plan = build_serving_body(
                net, cfg, pipe.refine, h + (-h) % 16, w + (-w) % 16, 0.5,
                cdtype=jnp.bfloat16,
                bg=jnp.asarray((0.0, 0.0, 1.0), jnp.float32))
            step = jax.jit(body)
            state = plan.make_state(1)
            vars_dev = jax.tree_util.tree_map(jnp.asarray, variables)
            worst = 0
            for seed in (0, 1):
                frame = np.random.RandomState(seed).randint(
                    0, 255, (h, w, 3), np.uint8)
                got = bundle.step(frame)
                live, state = step(vars_dev, jnp.asarray(frame[None]),
                                   state)
                want = bundle._unpack(live)
                for key in got:
                    worst = max(worst, np.abs(
                        got[key].astype(int)
                        - want[key].astype(int)).max())
            return worst, 0
        finally:
            shutil.rmtree(tmp, ignore_errors=True)

    def k_export_roundtrip_trimap():
        # Trimap-family bundle (VERDICT r3 item 7): the 4-channel
        # (RGB + trimap byte) contract must round-trip through
        # jax.export exactly like the base family's.
        import shutil
        import tempfile

        from vidmat.config import ModelConfig, PipelineConfig, RefineConfig
        from vidmat.deploy import ServingBundle, export_bundle
        from vidmat.models.matting_net import MattingNetwork
        from vidmat.models.weights import init_params
        from vidmat.pipeline.stepfactory import build_serving_body

        h, w = 48, 64
        cfg = ModelConfig(conv_impl="planar", space_to_depth=2,
                          use_trimap=True)
        pipe = PipelineConfig(downsample_ratio=0.5, dtype="bfloat16",
                              refine=RefineConfig(mode="guided"))
        variables = init_params(cfg, seed=9)
        tmp = tempfile.mkdtemp()
        try:
            export_bundle(tmp + "/b", h, w, model_cfg=cfg, pipe_cfg=pipe,
                          variables=variables, bg_color=(0.0, 0.0, 1.0))
            bundle = ServingBundle(tmp + "/b")
            net = MattingNetwork(cfg, dtype=jnp.bfloat16)
            body, plan = build_serving_body(
                net, cfg, pipe.refine, h + (-h) % 16, w + (-w) % 16, 0.5,
                cdtype=jnp.bfloat16,
                bg=jnp.asarray((0.0, 0.0, 1.0), jnp.float32))
            step = jax.jit(body)
            state = plan.make_state(1)
            vars_dev = jax.tree_util.tree_map(jnp.asarray, variables)
            worst = 0
            for seed in (0, 1):
                rng = np.random.RandomState(seed)
                frame = rng.randint(0, 255, (h, w, 3), np.uint8)
                tri = rng.choice([0, 128, 255], (h, w)).astype(np.uint8)
                got = bundle.step(frame, trimap=tri)
                f4 = np.concatenate([frame, tri[..., None]], axis=-1)
                live, state = step(vars_dev, jnp.asarray(f4[None]), state)
                want = bundle._unpack(live)
                for key in got:
                    worst = max(worst, np.abs(
                        got[key].astype(int)
                        - want[key].astype(int)).max())
            return worst, 0
        finally:
            shutil.rmtree(tmp, ignore_errors=True)

    t0 = time.perf_counter()
    for name, fn in [("ingest", k_ingest), ("gf", k_gf),
                     ("composite", k_composite), ("refine", k_refine),
                     ("refine_coarse_bg", k_refine_coarse_bg),
                     ("refine_float", k_refine_float),
                     ("planar_conv", k_planar_conv),
                     ("planar_gru", k_planar_gru),
                     ("planar_conv2", k_planar_conv2),
                     ("planar_conv_gru", k_planar_conv_gru),
                     ("export_roundtrip", k_export_roundtrip),
                     ("export_roundtrip_trimap",
                      k_export_roundtrip_trimap)]:
        check(name, fn)
    n_total = len(report)
    n_ok = n_total - len(failed)
    out = {
        "metric": "pallas kernel smoke (compiled vs interpret oracle)",
        "value": n_ok,
        "unit": f"kernels_ok_of_{n_total}",
        "vs_baseline": round(n_ok / n_total, 3),
        "device": str(jax.devices()[0]),
        "wall_s": round(time.perf_counter() - t0, 1),
        "kernels": report,
    }
    if failed:
        out["error"] = "kernel smoke FAILED: " + ", ".join(failed)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--mode", default="1080p",
                    choices=["1080p", "4k", "4k_tiled", "multistream",
                             "480p", "e2e", "smoke"])
    ap.add_argument("--net", default=None, choices=["planar", "xla"],
                    help="override the preset's conv execution path "
                         "(ModelConfig.conv_impl); default: the preset's "
                         "(planar on every serving rung)")
    ap.add_argument("--chunk", type=int, default=None,
                    help="frames per dispatch: K>1 jits a K-frame "
                         "lax.scan over the serving body (the pipeline's "
                         "chunk_size path), amortizing the per-call "
                         "dispatch floor (~1 ms on the dev tunnel). "
                         "Default: the ladder preset's chunk_size "
                         "(1080p/480p chunked, 4K/multistream per-frame)")
    ap.add_argument("--bg-blur", type=int, default=None, metavar="RADIUS",
                    help="measure the portrait-mode tail: composite over "
                         "a coarse-synthesized blur of the source frame "
                         "(in-kernel upsample on the fused path)")
    args, _ = ap.parse_known_args()
    # Fresh TPU compiles over the dev tunnel take 5-25 min (docs/
    # PERFORMANCE.md) — a 900s watchdog fired mid-compile on e2e (r2) and
    # on a cold 4k step (r3). The driver's headline run (default 1080p)
    # keeps the tight 900s leash (its cache is always warm); every other
    # mode may be compiling a cold step and gets 1700s.
    _watchdog(900.0 if args.mode == "1080p" else 1700.0)
    mode = ("quick" if args.quick and args.mode not in ("e2e", "smoke")
            else args.mode)

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      __file__.rsplit("/", 1)[0] + "/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    if mode == "e2e":
        print(json.dumps(_bench_e2e(jax, args.quick)))
        return
    if mode == "smoke":
        result = _bench_smoke(jax)
        print(json.dumps(result))
        if "error" in result:
            raise SystemExit(2)
        return

    import dataclasses

    import jax.numpy as jnp

    from vidmat.config import PRESETS
    from vidmat.models.matting_net import MattingNetwork
    from vidmat.models.weights import init_params
    from vidmat.pipeline.stepfactory import build_serving_body

    # Every rung's config comes FROM the ladder preset (config.py PRESETS)
    # — the bench measures the config users actually construct with
    # --preset, byte-identical (VERDICT r2 item 3: one source of truth).
    # "4k" is the video_4k preset with tiling dropped (the fused coarse
    # tail variant, labeled as such); "quick" is the 1080p preset at a
    # small shape.
    preset_name = {"quick": "video_1080p", "1080p": "video_1080p",
                   "4k": "video_4k", "4k_tiled": "video_4k",
                   "480p": "clip_480p", "multistream": "multistream"}[mode]
    preset = PRESETS[preset_name]()
    cfg, pcfg = preset[0], preset[1]
    preset_label = preset_name

    batch = 1
    if mode == "quick":
        h, w, frames_timed = 288, 512, 60
        ratio = 0.5
        preset_label += " (288x512 quick shapes)"
    elif mode in ("4k", "4k_tiled"):
        h, w, frames_timed = 2176, 3840, 120
        ratio = pcfg.downsample_ratio
        if mode == "4k":
            preset_label += " (tile_size=None variant)"
    elif mode == "480p":
        h, w, frames_timed = 480, 864, 240
        ratio = pcfg.downsample_ratio
    elif mode == "multistream":
        scfg = preset[2]
        h, w, frames_timed = scfg.height, scfg.width, 120
        ratio = scfg.downsample_ratio
        batch = scfg.num_streams  # 8 concurrent 1080p streams, one chip
    else:
        h, w, frames_timed = 1088, 1920, 240
        ratio = pcfg.downsample_ratio

    if args.net is not None and args.net != cfg.conv_impl:
        cfg = dataclasses.replace(cfg, conv_impl=args.net)
        preset_label += f" (--net={args.net} override)"
    conv_impl = cfg.conv_impl
    cdtype = jnp.bfloat16 if pcfg.dtype == "bfloat16" else jnp.float32
    net = MattingNetwork(cfg, dtype=cdtype)  # true bf16 conv path
    # Random weights = the explicit opt-in (init_params): the throughput
    # metric is weight-agnostic; the public API auto-loads trained
    # checkpoints instead (models/weights.default_variables).
    variables = init_params(cfg)

    # Shared serving body — the SAME code convert_video jits (stepfactory),
    # built with the preset's refine config and tiling.
    tile_kw = (dict(tile_size=pcfg.tile_size, tile_overlap=pcfg.tile_overlap)
               if mode == "4k_tiled" else {})
    if args.bg_blur:
        preset_label += f" (bg_blur={args.bg_blur} portrait tail)"
    body, plan = build_serving_body(
        net, cfg, pcfg.refine, h, w, ratio, cdtype=cdtype, bg=None,
        bg_blur=args.bg_blur, **tile_kw)
    # Frames-per-dispatch follows the preset's chunk_size. 4K/multistream
    # presets keep chunk=1 (tile batch / live-stream gather fills the chip).
    chunk = max(1, args.chunk if args.chunk is not None
                else pcfg.chunk_size)
    if chunk == 1:
        step = jax.jit(body)
    elif getattr(plan, "chunk_body", None) is not None:
        # Chunk-batched dispatch — what the pipeline's chunk_size path
        # serves: the stateless work (ingest, planar encoder, GF stats,
        # fused tail) batches over the K frames, only the recurrent
        # decoder scans (stepfactory chunk_body; bit-exact vs the scan
        # below).
        step = jax.jit(plan.chunk_body)
    else:
        # K-frame dispatch: identical to the pipeline's chunk_size path
        # (vidmat.pipeline.scan) — one jitted lax.scan call per K frames.
        @jax.jit
        def step(variables, frames, st):
            def sbody(s, f):
                outs, ns = body(variables, f, s)
                return ns, outs
            ns, outs = jax.lax.scan(sbody, st, frames)
            return outs, ns

    # Device-resident frame ring: measures chip throughput (fps/chip). In
    # production, decode + H2D run on host threads and overlap with device
    # compute (vidmat.pipeline.video double-buffers them); here, over the
    # axon loopback tunnel, per-frame H2D costs ~125ms of pure relay
    # latency that no real deployment would see, so it is excluded from the
    # chip-throughput metric (measured separately by --mode=e2e).
    rng = np.random.RandomState(0)
    state0 = plan.make_state(batch)

    def make_ring(chunk_k: int):
        fshape = ((batch, h, w, 3) if chunk_k == 1
                  else (chunk_k, batch, h, w, 3))
        return [jax.device_put(rng.randint(0, 255, fshape, np.uint8))
                for _ in range(4)]

    def fetch_band(o):
        """D2H a dependent ~8 MB row band, not the full output: the dev
        relay moves ~50 MB/s, so a full fetch (64 MB for 8x1080p packed,
        33 MB at 4K) adds seconds of per-run variance that buries the
        amortized signal (docs/PERFORMANCE.md timing-methodology note).
        Any slice depends on the whole recurrent chain, so it still
        bounds every step."""
        rows = o.shape[1]
        band = max(1, min(rows, (8 << 20) * rows // max(1, o.nbytes)))
        np.asarray(o[:, :band])

    def measure(step_fn, chunk_k: int, max_pairs: int = 21):
        """Amortized timing of chained dispatches at chunk_k frames per
        dispatch: (T_long - T_short) removes the fixed sync/dispatch
        overhead of the tunnel, which has high variance; median of
        repeats. Tunnel jitter can make a single difference non-positive
        — such samples carry no signal and are dropped (count returned).
        Chunked dispatch amortizes the per-call floor, which makes each
        call cheaper but the per-run relay jitter relatively larger —
        use a 2x longer chain so the difference integrates over more
        device work. Adaptive repeats: relay jitter made fixed-9-repeat
        medians swing ~1.6x across runs; keep sampling (up to max_pairs)
        until the valid samples' IQR tightens around the median."""
        ring = make_ring(chunk_k)

        def run_chain(n_frames: int) -> float:
            """Time n_frames chained steps; one D2H sync at the end (the
            output depends on the full recurrent chain, so this bounds
            all steps)."""
            state = state0
            out = None
            t0 = time.perf_counter()
            for i in range(n_frames // chunk_k):
                outs, state = step_fn(variables, ring[i % 4], state)
                out = outs if not isinstance(outs, tuple) else outs[0]
            fetch_band(out if chunk_k == 1 else out[-1])
            jax.block_until_ready(state)
            return time.perf_counter() - t0

        run_chain(5 * chunk_k)  # compile + tunnel warmup
        n_timed = frames_timed * (2 if chunk_k > 1 else 1)
        n_short = max(1, n_timed // (6 * chunk_k)) * chunk_k
        n_long = max(2, n_timed // chunk_k) * chunk_k
        samples = []
        while True:
            t_short = run_chain(n_short)
            t_long = run_chain(n_long)
            samples.append((t_long - t_short) / (n_long - n_short))
            v = [p for p in samples if p > 0]
            if len(samples) >= max_pairs:
                break
            if len(v) >= 9:
                q1, med, q3 = np.percentile(v, [25, 50, 75])
                if (q3 - q1) <= 0.3 * med:
                    break
        valid = [p for p in samples if p > 0] or samples
        return float(np.median(valid)), valid, len(samples) - len(valid)

    spf, valid, n_dropped = measure(step, chunk)
    fps = batch / spf
    p50_ms = spf * 1e3
    device = str(jax.devices()[0])
    label = {"quick": "480p-quick", "4k": "4K coarse+fused-refine",
             "4k_tiled": "4K tiled full-res refine",
             "480p": "480p", "multistream": "8-stream 1080p",
             "1080p": "1080p"}[mode]
    result = {
        "metric": f"{label} recurrent matting throughput (frames/sec/chip)",
        "value": round(fps, 2),
        "unit": "fps/chip",
        "vs_baseline": round(fps / TARGET_FPS, 3),
        "p50_ms": round(p50_ms, 2),
        "fps_min": round(batch / max(valid), 2),
        "fps_max": round(batch / min(valid), 2),
        "n_dropped_samples": n_dropped,
        "device": device,
        "resolution": f"{w}x{h}" + (f" x{batch} streams" if batch > 1 else ""),
        "downsample_ratio": ratio,
        "dtype": pcfg.dtype,
        "conv_impl": conv_impl,
        "preset": preset_label,
    }
    if chunk > 1:
        result["chunk"] = chunk
        # p50 is the amortized per-frame cost; one dispatch covers K
        # frames, so per-frame latency is not individually observed.
        result["latency_granularity"] = f"per-{chunk}-frame-dispatch"
        # Both latencies in ONE bench output (VERDICT r4 item 6): the
        # amortized per-chunk figure above AND the true per-frame-
        # dispatch p50 (chunk=1 through the SAME serving body — the
        # figure a latency-sensitive deployment pays per frame).
        result["p50_ms_amortized"] = result["p50_ms"]
        spf1, valid1, nd1 = measure(jax.jit(body), 1, max_pairs=11)
        result["p50_ms_per_frame"] = round(spf1 * 1e3, 2)
        result["fps_per_frame_dispatch"] = round(batch / spf1, 2)
    else:
        result["p50_ms_amortized"] = result["p50_ms"]
        result["p50_ms_per_frame"] = result["p50_ms"]
    print(json.dumps(result))


if __name__ == "__main__":
    main()

"""Measure the tiled overlap-blend against the HBM roofline (VERDICT item 9).

The 4K tiler's blend (vidmat/refine/tiling.py::untile_frame) runs as a chain
of XLA dynamic-update-slices instead of a hand-written Pallas scatter kernel.
This tool measures the tile->untile round trip at 4K/6K/8K on the real chip
and compares against the bandwidth roofline:

    roofline bytes = read(frame) + write(tiles)      [tile_frame]
                   + read(tiles) + write(frame)      [untile_frame]
    (the feather multiply, accumulate and normalizer fold into the same
     passes; overlap regions are counted once per covering tile, which the
     tiles-term already includes)

Timing uses the chain-amortized method from docs/PERFORMANCE.md (the dev
tunnel's block_until_ready is unreliable): y_{k+1} = untile(tile(y_k)) for N
iterations, one D2H at the end, (T_long - T_short) / (N_long - N_short).

Run: python tools/bench_tiling.py [--sizes 4k 8k] [--tile 512 --overlap 64]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

SIZES = {"1080p": (1088, 1920), "4k": (2176, 3840), "6k": (3392, 6016),
         "8k": (4352, 7680)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", nargs="+", default=["4k", "8k"])
    ap.add_argument("--tile", type=int, default=512)
    ap.add_argument("--overlap", type=int, default=64)
    ap.add_argument("--channels", type=int, default=4)
    ap.add_argument("--chain", type=int, default=96)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from vidmat.refine.tiling import TileLayout, tile_frame, untile_frame

    dev = jax.devices()[0]
    print(f"# device: {dev.device_kind}", file=sys.stderr)

    for name in args.sizes:
        h, w = SIZES[name]
        layout = TileLayout(h, w, args.tile, args.overlap)
        nt = layout.num_tiles
        c = args.channels

        @jax.jit
        def chain(y, n_steps):
            def body(i, y):
                t = tile_frame(y, layout)
                return untile_frame(t, layout, 1) * 0.999 + 0.0005
            return jax.lax.fori_loop(0, n_steps, body, y)

        y0 = jnp.asarray(np.random.rand(1, h, w, c).astype(np.float32))

        def run(n):
            t0 = time.perf_counter()
            # D2H a dependent ~4 MB row band, not the full frame: the dev
            # relay moves ~50 MB/s, so a full-frame fetch adds seconds of
            # variance that buries the per-iteration signal (tiny fetches
            # can stall instead — docs/PERFORMANCE.md).
            np.asarray(chain(y0, n)[:, :128])
            return time.perf_counter() - t0

        run(2)  # compile + warm
        # Paired short/long differences: tunnel dispatch noise is large
        # relative to a handful of blend iterations, so each (short, long)
        # pair is timed back-to-back and the median of the per-pair
        # amortized times is reported.
        short, long_ = args.chain // 4, args.chain
        diffs = []
        for _ in range(5):
            ts = run(short)
            tl = run(long_)
            diffs.append((tl - ts) / (long_ - short))
        ms = float(np.median(diffs)) * 1e3

        frame_b = h * w * c * 4
        tiles_b = nt * layout.tile_h * layout.tile_w * c * 4
        roofline_b = 2 * (frame_b + tiles_b)
        # v5e HBM ~ 819 GB/s
        roofline_ms = roofline_b / 819e9 * 1e3
        cost = chain.lower(y0, 1).compile().cost_analysis()
        hbm_mb = cost.get("bytes accessed", 0) / 1e6 if cost else None
        print(json.dumps({
            "size": name, "tiles": nt, "roundtrip_ms": round(ms, 3),
            "roofline_ms": round(roofline_ms, 3),
            "x_roofline": round(ms / roofline_ms, 2),
            "model_bytes_mb": round(roofline_b / 1e6, 1),
            "xla_bytes_mb": round(hbm_mb, 1) if hbm_mb else None,
        }), flush=True)


if __name__ == "__main__":
    main()

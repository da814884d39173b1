"""Evaluation metrics (vidmat/eval): oracle checks + CLI round-trip."""

import json

import numpy as np
import pytest

from vidmat.eval import VideoEval, alpha_frames, connectivity_error
from vidmat.eval.metrics import evaluate_sequences, scale_metric


def _rand_alpha(h, w, seed):
    rng = np.random.RandomState(seed)
    return rng.rand(h, w).astype(np.float32)


class TestFrameMetrics:
    def test_identity_is_zero(self):
        a = _rand_alpha(32, 48, 0)
        ev = VideoEval(metrics=("mad", "mse", "sad", "grad", "conn"))
        row = ev.update(a, a)
        for k, v in row.items():
            assert v == pytest.approx(0.0, abs=1e-6), k

    def test_mad_mse_sad_match_numpy(self):
        p = _rand_alpha(20, 30, 1)
        t = _rand_alpha(20, 30, 2)
        row = VideoEval(metrics=("mad", "mse", "sad")).update(p, t)
        d = p.astype(np.float64) - t
        assert row["mad"] == pytest.approx(np.mean(np.abs(d)), rel=1e-5)
        assert row["mse"] == pytest.approx(np.mean(d * d), rel=1e-5)
        assert row["sad"] == pytest.approx(np.sum(np.abs(d)), rel=1e-5)

    def test_uint16_alpha_scaled_by_dtype_max(self):
        """16-bit PNG ground-truth mattes (read_image preserves uint16)
        must scale by 65535, not pass through raw — unscaled values
        corrupt every metric by ~4 orders of magnitude."""
        p = _rand_alpha(16, 16, 4)
        row_f = VideoEval(metrics=("mad",)).update(p, np.zeros_like(p))
        row_u16 = VideoEval(metrics=("mad",)).update(
            (p * 65535).round().astype(np.uint16),
            np.zeros((16, 16), np.uint16))
        assert row_u16["mad"] == pytest.approx(row_f["mad"], abs=2e-3)

    def test_uint8_and_channel_dim_canonicalized(self):
        p = _rand_alpha(16, 16, 3)
        row_f = VideoEval(metrics=("mad",)).update(p, p * 0)
        row_u = VideoEval(metrics=("mad",)).update(
            (p * 255).round().astype(np.uint8)[..., None],
            np.zeros((16, 16, 1), np.uint8))
        assert row_u["mad"] == pytest.approx(row_f["mad"], abs=2e-3)

    def test_grad_filters_are_normalized(self):
        from vidmat.eval.metrics import _grad_filters

        g, dg = _grad_filters(1.4)
        assert g.sum() == pytest.approx(1.0, abs=1e-6)
        # gaussgradient convention: the 2-D filter outer(g, dg) is unit-L2
        assert np.linalg.norm(np.outer(g, dg)) == pytest.approx(
            1.0, abs=1e-5)
        # odd symmetry: zero response to constants
        assert dg.sum() == pytest.approx(0.0, abs=1e-6)

    def test_grad_error_detects_edge_blur(self):
        # A sharp edge vs a blurred edge differ in gradient magnitude even
        # where plain MAD is small.
        h = w = 64
        x = np.arange(w, dtype=np.float32)[None, :].repeat(h, 0)
        sharp = (x >= w // 2).astype(np.float32)
        soft = np.clip((x - w // 2) / 8.0 + 0.5, 0, 1).astype(np.float32)
        row = VideoEval(metrics=("grad",)).update(soft, sharp)
        assert row["grad"] > 1.0

    def test_dtssd_zero_for_consistent_motion(self):
        # pred = true shifted by a constant offset: per-frame deltas match,
        # so dtSSD is 0 while MAD is not.
        frames_t = [_rand_alpha(16, 16, 5) * 0 + 0.1 * i for i in range(4)]
        frames_p = [f + 0.2 for f in frames_t]
        ev = VideoEval(metrics=("mad", "dtssd"))
        for p, t in zip(frames_p, frames_t):
            ev.update(np.clip(p, 0, 1), np.clip(t, 0, 1))
        s = ev.summary()
        assert s["dtssd"] == pytest.approx(0.0, abs=1e-5)
        assert s["mad"] > 0

    def test_dtssd_positive_for_flicker(self):
        t0 = np.zeros((16, 16), np.float32)
        ev = VideoEval(metrics=("dtssd",))
        for i in range(4):
            ev.update(t0 + 0.5 * (i % 2), t0)  # pred flickers, true static
        assert ev.summary()["dtssd"] > 1.0


class TestConnectivity:
    def test_connected_prediction_scores_zero(self):
        a = np.zeros((32, 32), np.float32)
        a[8:24, 8:24] = 1.0
        assert connectivity_error(a, a) == pytest.approx(0.0, abs=1e-6)

    def test_spurious_island_hand_computed(self):
        # Hand-computed oracle: pred adds a 4x4 island where true=0. Those
        # pixels never enter the threshold intersection, so l_map stays at
        # level 0: true_phi = 1 - 0 = 1, pred_phi = 1 - 1 = 0 (pred_d=1 >=
        # theta) -> |diff| = 1 per pixel -> 16/1000.
        true = np.zeros((32, 32), np.float32)
        true[8:24, 8:24] = 1.0
        pred = true.copy()
        pred[2:6, 2:6] = 1.0
        assert connectivity_error(pred, true) == pytest.approx(
            16 / 1000.0, abs=1e-6)

    def test_disconnected_dim_blob_penalized(self):
        # A secondary true blob predicted dim: it is never in the LARGEST
        # connected component, so its connection level is 0 and the dim
        # prediction pays; the perfect prediction of the same blob does not.
        true = np.zeros((48, 48), np.float32)
        true[4:36, 4:36] = 1.0   # main blob (largest CC)
        true[40:44, 40:44] = 1.0  # small detached blob
        pred_perfect = true.copy()
        pred_dim = true.copy()
        pred_dim[40:44, 40:44] = 0.45
        assert connectivity_error(pred_perfect, true) == pytest.approx(
            0.0, abs=1e-6)
        assert connectivity_error(pred_dim, true) > 0.005

    def test_symmetric_zero_on_empty(self):
        z = np.zeros((8, 8), np.float32)
        assert connectivity_error(z, z) == pytest.approx(0.0, abs=1e-6)


class TestForegroundMSE:
    def test_masked_region_only(self):
        alpha = np.zeros((16, 16), np.float32)
        alpha[4:12, 4:12] = 1.0
        fgr = np.full((16, 16, 3), 0.5, np.float32)
        ev = VideoEval(metrics=("fgr_mse",))
        # identical foregrounds -> 0
        row = ev.update(alpha, alpha, pred_fgr=fgr, true_fgr=fgr)
        assert row["fgr_mse"] == pytest.approx(0.0, abs=1e-7)
        # error OUTSIDE the matte is ignored
        bad_out = fgr.copy()
        bad_out[0:2, 0:2] = 1.0
        row = ev.update(alpha, alpha, pred_fgr=bad_out, true_fgr=fgr)
        assert row["fgr_mse"] == pytest.approx(0.0, abs=1e-7)
        # error INSIDE the matte counts, normalized by masked pixel count
        bad_in = fgr.copy()
        bad_in[4:12, 4:12, 0] += 0.3
        row = ev.update(alpha, alpha, pred_fgr=bad_in, true_fgr=fgr)
        assert row["fgr_mse"] == pytest.approx(0.3 ** 2 / 3, rel=1e-4)


class TestRegionRestriction:
    """Trimap-unknown-band protocol: metrics restricted to a region mask."""

    def test_all_ones_region_matches_unrestricted(self):
        rng = np.random.RandomState(0)
        p, t = rng.rand(24, 24).astype(np.float32), \
            rng.rand(24, 24).astype(np.float32)
        a = VideoEval(metrics=("mad", "mse", "sad", "grad", "conn"))
        b = VideoEval(metrics=("mad", "mse", "sad", "grad", "conn"))
        ra = a.update(p, t)
        rb = b.update(p, t, region=np.ones((24, 24), bool))
        for k in ra:
            assert ra[k] == pytest.approx(rb[k], rel=1e-5), k

    def test_error_outside_region_ignored(self):
        t = np.zeros((16, 16), np.float32)
        p = np.zeros((16, 16), np.float32)
        p[0:4, 0:4] = 1.0  # error only OUTSIDE the region
        region = np.zeros((16, 16), bool)
        region[8:, 8:] = True
        row = VideoEval(metrics=("mad", "sad")).update(p, t, region=region)
        assert row["mad"] == pytest.approx(0.0, abs=1e-7)
        assert row["sad"] == pytest.approx(0.0, abs=1e-7)

    def test_mad_normalized_by_region_size(self):
        t = np.zeros((8, 8), np.float32)
        p = np.zeros((8, 8), np.float32)
        region = np.zeros((8, 8), bool)
        region[0:2, 0:2] = True  # 4 px
        p[0, 0] = 1.0            # one wrong pixel inside
        row = VideoEval(metrics=("mad", "sad")).update(p, t, region=region)
        assert row["mad"] == pytest.approx(1.0 / 4.0, rel=1e-5)
        assert row["sad"] == pytest.approx(1.0, rel=1e-5)

    def test_dtssd_region_restricted(self):
        t0 = np.zeros((8, 8), np.float32)
        t1 = np.zeros((8, 8), np.float32)
        p0 = np.zeros((8, 8), np.float32)
        p1 = np.zeros((8, 8), np.float32)
        p1[0, 0] = 1.0  # flicker outside the region
        region = np.zeros((8, 8), bool)
        region[4:, 4:] = True
        ev = VideoEval(metrics=("dtssd",))
        ev.update(p0, t0, region=region)
        row = ev.update(p1, t1, region=region)
        assert row["dtssd"] == pytest.approx(0.0, abs=1e-7)

    def test_region_shape_mismatch_rejected(self):
        ev = VideoEval(metrics=("mad",))
        with pytest.raises(ValueError, match="region"):
            ev.update(np.zeros((8, 8), np.float32),
                      np.zeros((8, 8), np.float32),
                      region=np.ones((4, 4), bool))

    def test_trimap_unknown_region_helper(self):
        from vidmat.eval import trimap_unknown_region

        tri = np.zeros((4, 4), np.uint8)
        tri[0, :] = 255   # fg
        tri[1, :] = 128   # unknown
        tri[2, :] = 50    # bg (<=0.25 of 255)
        m = trimap_unknown_region(tri)
        assert m.dtype == bool
        assert m[1].all() and not m[0].any() and not m[2].any() \
            and not m[3].any()
        # float + channel-dim forms
        m2 = trimap_unknown_region(np.full((4, 4, 1), 0.5, np.float32))
        assert m2.all()


class TestSummaryAndSequences:
    def test_summary_scaling(self):
        p = np.full((10, 10), 0.5, np.float32)
        t = np.zeros((10, 10), np.float32)
        s = VideoEval(metrics=("mad", "mse", "sad"))
        s.update(p, t)
        out = s.summary()
        assert out["frames"] == 1
        assert out["mad"] == pytest.approx(0.5 * 1e3)
        assert out["mse"] == pytest.approx(0.25 * 1e3)
        assert out["sad"] == pytest.approx(0.5 * 100 / 1e3)
        assert scale_metric("dtssd", 0.01) == pytest.approx(1.0)

    def test_evaluate_sequences_length_mismatch(self):
        a = [np.zeros((8, 8), np.float32)] * 3
        b = [np.zeros((8, 8), np.float32)] * 2
        with pytest.raises(ValueError, match="different lengths"):
            evaluate_sequences(a, b)

    def test_unknown_metric_rejected(self):
        with pytest.raises(ValueError, match="unknown metrics"):
            VideoEval(metrics=("mad", "iou"))


class TestCLI:
    def test_evaluate_cli_png_dirs(self, tmp_path):
        import imageio.v3 as iio

        from vidmat.cli import main

        rng = np.random.RandomState(0)
        pd = tmp_path / "pred"
        td = tmp_path / "true"
        pd.mkdir()
        td.mkdir()
        for i in range(3):
            t = (rng.rand(24, 24) * 255).astype(np.uint8)
            p = np.clip(t.astype(np.int32) + 10, 0, 255).astype(np.uint8)
            iio.imwrite(td / f"a_{i:04d}.png", t)
            iio.imwrite(pd / f"a_{i:04d}.png", p)
        out = tmp_path / "report.json"
        rc = main(["evaluate", str(pd), str(td),
                   "--metrics", "mad,mse,dtssd", "--per-frame",
                   "--output", str(out)])
        assert rc == 0
        rep = json.loads(out.read_text())
        assert rep["frames"] == 3
        # offset is +10/255 but clipped at the top; bound loosely
        assert 20.0 < rep["mad"] <= 10 / 255 * 1e3 + 1
        assert len(rep["per_frame"]) == 3
        assert "dtssd" not in rep["per_frame"][0]  # first frame has no delta
        assert "dtssd" in rep["per_frame"][1]

    def test_evaluate_cli_trimap_region(self, tmp_path, capsys):
        import imageio.v3 as iio

        from vidmat.cli import main

        pd = tmp_path / "pred"
        td = tmp_path / "true"
        rd = tmp_path / "tri"
        for d in (pd, td, rd):
            d.mkdir()
        for i in range(2):
            t = np.zeros((16, 16), np.uint8)
            p = t.copy()
            p[0:4, 0:4] = 255            # error confined to the bg corner
            tri = np.full((16, 16), 128, np.uint8)
            tri[0:8, 0:8] = 0            # ...which the trimap marks KNOWN bg
            iio.imwrite(td / f"{i:02d}.png", t)
            iio.imwrite(pd / f"{i:02d}.png", p)
            iio.imwrite(rd / f"{i:02d}.png", tri)
        rc = main(["evaluate", str(pd), str(td), "--trimap", str(rd),
                   "--metrics", "mad,sad"])
        assert rc == 0
        rep = json.loads(capsys.readouterr().out)
        assert rep["region"] == "trimap-unknown"
        assert rep["mad"] == pytest.approx(0.0, abs=1e-6)
        assert rep["sad"] == pytest.approx(0.0, abs=1e-6)

    def test_evaluate_cli_length_mismatch_errors(self, tmp_path):
        import imageio.v3 as iio

        from vidmat.cli import main

        pd = tmp_path / "pred"
        td = tmp_path / "true"
        pd.mkdir()
        td.mkdir()
        for i in range(2):
            iio.imwrite(td / f"{i}.png", np.zeros((8, 8), np.uint8))
        iio.imwrite(pd / "0.png", np.zeros((8, 8), np.uint8))
        assert main(["evaluate", str(pd), str(td)]) == 1


def test_alpha_frames_reduces_channels(tmp_path):
    import imageio.v3 as iio

    d = tmp_path / "seq"
    d.mkdir()
    iio.imwrite(d / "0.png", np.full((8, 8), 77, np.uint8))
    frames = list(alpha_frames(str(d)))
    assert len(frames) == 1
    assert frames[0].shape == (8, 8)
    assert int(frames[0][0, 0]) == 77

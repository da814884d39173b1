"""Planar conv kernel suite vs XLA conv oracles (interpret mode on CPU;
the same kernels are driven compiled on TPU by bench.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vidmat.ops.pallas.planar import (conv3x3_taps, conv_tap_weights,
                                      fold_bn, from_planar, interior_mask,
                                      planar_conv, planar_gru,
                                      stride2_taps, stride2_tap_weights,
                                      to_planar)


def _xla_conv3x3(x, k, stride=1):
    return jax.lax.conv_general_dilated(
        x, k, (stride, stride), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def test_planar_conv3x3_matches_xla():
    rng = np.random.RandomState(0)
    h, w, ci, co = 12, 20, 5, 7
    x = jnp.asarray(rng.randn(1, h, w, ci).astype(np.float32))
    k = jnp.asarray(rng.randn(3, 3, ci, co).astype(np.float32) * 0.1)
    want = np.maximum(np.asarray(_xla_conv3x3(x, k)), 0.0)

    xp = to_planar(x)
    got = planar_conv([xp], [conv_tap_weights(k)],
                      conv3x3_taps(w),
                      jnp.ones((co, 1), jnp.float32),
                      jnp.zeros((co, 1), jnp.float32),
                      interior_mask(h, w), act="relu", interpret=True)
    got = np.asarray(from_planar(got, h, w))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_planar_conv_pad_ring_stays_zero():
    """Chaining invariant: outputs are zero on the pad ring."""
    rng = np.random.RandomState(1)
    h, w, ci, co = 8, 12, 3, 4
    x = jnp.asarray(rng.randn(1, h, w, ci).astype(np.float32))
    k = jnp.asarray(rng.randn(3, 3, ci, co).astype(np.float32))
    out = planar_conv([to_planar(x)], [conv_tap_weights(k)],
                      conv3x3_taps(w),
                      jnp.ones((co, 1), jnp.float32),
                      jnp.full((co, 1), 0.7, jnp.float32),  # nonzero bias
                      interior_mask(h, w), act="relu", interpret=True)
    from vidmat.ops.pallas.planar import BLOCK, plane_sizes

    pitch, p, total = plane_sizes(h, w)
    flat = np.asarray(out)
    assert flat.shape == (co, total)
    grid = flat[:, BLOCK:BLOCK + p].reshape(co, h + 2, pitch)
    # pad ring, pitch-alignment lanes, and margins are all exactly zero
    assert np.all(grid[:, 0, :] == 0) and np.all(grid[:, -1, :] == 0)
    assert np.all(grid[:, :, 0] == 0) and np.all(grid[:, :, w + 1:] == 0)
    assert np.all(flat[:, :BLOCK] == 0) and np.all(flat[:, BLOCK + p:] == 0)
    # and the interior is NOT all zero (the mask didn't eat the signal)
    assert np.abs(grid[:, 1:h + 1, 1:w + 1]).max() > 0


def test_planar_conv_multi_plane_is_concat():
    """Conv over concat([a, b]) == sum of per-plane tap convs."""
    rng = np.random.RandomState(2)
    h, w, ca, cb, co = 10, 14, 4, 6, 5
    a = jnp.asarray(rng.randn(1, h, w, ca).astype(np.float32))
    b = jnp.asarray(rng.randn(1, h, w, cb).astype(np.float32))
    k = jnp.asarray(rng.randn(3, 3, ca + cb, co).astype(np.float32) * 0.1)
    want = np.asarray(_xla_conv3x3(jnp.concatenate([a, b], -1), k))

    got = planar_conv(
        [to_planar(a), to_planar(b)],
        [conv_tap_weights(k[:, :, :ca]), conv_tap_weights(k[:, :, ca:])],
        conv3x3_taps(w),
        jnp.ones((co, 1), jnp.float32), jnp.zeros((co, 1), jnp.float32),
        interior_mask(h, w), act="none", interpret=True)
    np.testing.assert_allclose(np.asarray(from_planar(got, h, w)), want,
                               atol=1e-5)


def test_planar_conv_bn_fold_matches_flax_bn():
    rng = np.random.RandomState(3)
    h, w, ci, co = 8, 10, 3, 6
    x = jnp.asarray(rng.randn(1, h, w, ci).astype(np.float32))
    k = jnp.asarray(rng.randn(3, 3, ci, co).astype(np.float32) * 0.2)
    gamma = jnp.asarray(rng.uniform(0.5, 1.5, co).astype(np.float32))
    beta = jnp.asarray(rng.randn(co).astype(np.float32) * 0.1)
    mean = jnp.asarray(rng.randn(co).astype(np.float32) * 0.1)
    var = jnp.asarray(rng.uniform(0.5, 2.0, co).astype(np.float32))
    eps = 1e-5
    y = _xla_conv3x3(x, k)
    want = np.maximum(
        np.asarray((y - mean) / jnp.sqrt(var + eps) * gamma + beta), 0.0)

    scale, bias = fold_bn(gamma, beta, mean, var, eps)
    got = planar_conv([to_planar(x)], [conv_tap_weights(k)],
                      conv3x3_taps(w), scale, bias,
                      interior_mask(h, w), act="relu", interpret=True)
    np.testing.assert_allclose(np.asarray(from_planar(got, h, w)), want,
                               atol=1e-5)


def test_planar_stride2_conv_matches_xla():
    """Stride-2 3x3 conv == 4-tap conv on the s2d-packed plane."""
    from vidmat.models.matting_net import space_to_depth

    rng = np.random.RandomState(4)
    h, w, ci, co = 16, 24, 3, 8
    x = jnp.asarray(rng.randn(1, h, w, ci).astype(np.float32))
    k = jnp.asarray(rng.randn(3, 3, ci, co).astype(np.float32) * 0.1)
    want = np.asarray(_xla_conv3x3(x, k, stride=2))

    xp = to_planar(space_to_depth(x, 2))  # (4*ci, (h/2+2)*(w/2+2))
    got = planar_conv([xp], [stride2_tap_weights(k, ci)],
                      stride2_taps(w // 2),
                      jnp.ones((co, 1), jnp.float32),
                      jnp.zeros((co, 1), jnp.float32),
                      interior_mask(h // 2, w // 2), act="none",
                      interpret=True)
    got = np.asarray(from_planar(got, h // 2, w // 2))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_planar_gru_matches_flax_cell():
    from vidmat.models.layers import ConvGRUCell

    rng = np.random.RandomState(5)
    h, w, c = 10, 12, 6
    x = jnp.asarray(rng.randn(1, h, w, c).astype(np.float32))
    hs = jnp.asarray(rng.randn(1, h, w, c).astype(np.float32) * 0.5)
    cell = ConvGRUCell(c)
    variables = cell.init(jax.random.PRNGKey(0), x, hs)
    want = np.asarray(cell.apply(variables, x, hs))

    pk = variables["params"]
    kg = pk["gates"]["kernel"]   # (3,3, 2c, 2c)
    bgk = pk["gates"]["bias"]
    kc = pk["cand"]["kernel"]    # (3,3, 2c, c)
    bck = pk["cand"]["bias"]
    got = planar_gru(
        to_planar(x), to_planar(hs),
        conv_tap_weights(kg[:, :, :c]), conv_tap_weights(kg[:, :, c:]),
        jnp.asarray(bgk, jnp.float32)[:, None],
        conv_tap_weights(kc[:, :, :c]), conv_tap_weights(kc[:, :, c:]),
        jnp.asarray(bck, jnp.float32)[:, None],
        interior_mask(h, w), conv3x3_taps(w), interpret=True)
    np.testing.assert_allclose(np.asarray(from_planar(got, h, w)), want,
                               atol=1e-5)


def test_planar_conv2_matches_two_convs():
    """Fused conv->affine->relu->conv (planar_conv2) must be bit-identical
    to two chained planar_conv calls (the mid plane simply stays in VMEM)."""
    from vidmat.ops.pallas.planar import planar_conv2

    rng = np.random.RandomState(9)
    h, w = 20, 36
    c_in, c_mid, c_out = (5, 3), 6, 4
    xs = [to_planar(jnp.asarray(rng.randn(1, h, w, c).astype(np.float32)))
          for c in c_in]
    k1 = rng.randn(3, 3, sum(c_in), c_mid).astype(np.float32) * 0.3
    k2 = rng.randn(3, 3, c_mid, c_out).astype(np.float32) * 0.3
    s1 = jnp.asarray(rng.rand(c_mid, 1).astype(np.float32) + 0.5)
    b1 = jnp.asarray(rng.randn(c_mid, 1).astype(np.float32) * 0.1)
    s2 = jnp.ones((c_out, 1), jnp.float32)
    b2 = jnp.asarray(rng.randn(c_out, 1).astype(np.float32) * 0.1)
    taps = conv3x3_taps(w)
    mask = interior_mask(h, w)
    ws = [conv_tap_weights(jnp.asarray(k1[:, :, :c_in[0]])),
          conv_tap_weights(jnp.asarray(k1[:, :, c_in[0]:]))]
    w2 = conv_tap_weights(jnp.asarray(k2))

    mid = planar_conv(xs, ws, taps, s1, b1, mask, act="relu",
                      interpret=True)
    want = planar_conv([mid], [w2], taps, s2, b2, mask, act="none",
                       interpret=True)
    got = planar_conv2(xs, ws, taps, s1, b1, w2, taps, s2, b2, mask,
                       act="relu", act2="none", interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_planar_conv2_stride2_then_conv3():
    """Mixed-tap fusion (encoder stage: stride-2 as 4-tap on the packed
    plane, then 3x3 at the new grid) must be bit-identical to the
    two-call chain — the models/planar.py enc_stage fused path."""
    from vidmat.models.matting_net import space_to_depth
    from vidmat.ops.pallas.planar import conv2_fits, planar_conv2

    rng = np.random.RandomState(11)
    h, w, ci, cm, co = 24, 40, 5, 6, 4
    x = jnp.asarray(rng.randn(1, h, w, ci).astype(np.float32))
    ka = jnp.asarray(rng.randn(3, 3, ci, cm).astype(np.float32) * 0.3)
    kb = jnp.asarray(rng.randn(3, 3, cm, co).astype(np.float32) * 0.3)
    s1 = jnp.asarray(rng.rand(cm, 1).astype(np.float32) + 0.5)
    b1 = jnp.asarray(rng.randn(cm, 1).astype(np.float32) * 0.1)
    s2 = jnp.asarray(rng.rand(co, 1).astype(np.float32) + 0.5)
    b2 = jnp.asarray(rng.randn(co, 1).astype(np.float32) * 0.1)

    xp = to_planar(space_to_depth(x, 2))
    tA, tB = stride2_taps(w // 2), conv3x3_taps(w // 2)
    assert conv2_fits(tA, tB)
    mask = interior_mask(h // 2, w // 2)
    ws = [stride2_tap_weights(ka, ci)]
    w2 = conv_tap_weights(kb)

    mid = planar_conv([xp], ws, tA, s1, b1, mask, act="relu",
                      interpret=True)
    want = planar_conv([mid], [w2], tB, s2, b2, mask, act="relu",
                       interpret=True)
    got = planar_conv2([xp], ws, tA, s1, b1, w2, tB, s2, b2, mask,
                       act="relu", act2="relu", interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_planar_conv_gru_matches_chain():
    """Fused decoder stage (planar_conv_gru: conv + split + ConvGRU) must
    be bit-identical to the planar_conv -> slice -> planar_gru chain."""
    from vidmat.ops.pallas.planar import conv_gru_fits, planar_conv_gru

    rng = np.random.RandomState(13)
    h, w = 18, 30
    c_in, feats = (7, 5), 8
    half = feats // 2
    xs = [to_planar(jnp.asarray(rng.randn(1, h, w, c).astype(np.float32)))
          for c in c_in]
    k = rng.randn(3, 3, sum(c_in), feats).astype(np.float32) * 0.3
    sc = jnp.asarray(rng.rand(feats, 1).astype(np.float32) + 0.5)
    bi = jnp.asarray(rng.randn(feats, 1).astype(np.float32) * 0.1)
    kg = jnp.asarray(rng.randn(3, 3, feats, feats).astype(np.float32) * 0.3)
    kc = jnp.asarray(rng.randn(3, 3, feats, half).astype(np.float32) * 0.3)
    bg = jnp.asarray(rng.randn(feats, 1).astype(np.float32) * 0.1)
    bc = jnp.asarray(rng.randn(half, 1).astype(np.float32) * 0.1)
    taps = conv3x3_taps(w)
    assert conv_gru_fits(taps)
    mask = interior_mask(h, w)
    ws = [conv_tap_weights(jnp.asarray(k[:, :, :c_in[0]])),
          conv_tap_weights(jnp.asarray(k[:, :, c_in[0]:]))]
    gru_w = (conv_tap_weights(kg[:, :, :half]),
             conv_tap_weights(kg[:, :, half:]), bg,
             conv_tap_weights(kc[:, :, :half]),
             conv_tap_weights(kc[:, :, half:]), bc)
    hp = to_planar(jnp.asarray(rng.randn(1, h, w, half)
                               .astype(np.float32) * 0.5))

    x = planar_conv(xs, ws, taps, sc, bi, mask, act="relu", interpret=True)
    want_a, b = x[:half], x[half:]
    want_h = planar_gru(b, hp, *gru_w, mask, taps, interpret=True)
    got_a, got_h = planar_conv_gru(xs, ws, taps, sc, bi, hp, *gru_w, mask,
                                   interpret=True)
    np.testing.assert_array_equal(np.asarray(got_a), np.asarray(want_a))
    np.testing.assert_array_equal(np.asarray(got_h), np.asarray(want_h))

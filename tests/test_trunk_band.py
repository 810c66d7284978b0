"""int8 band trunk kernels (ops/trunk_band.py) vs an exact float64 numpy
reference of the same quantized arithmetic (interpret mode, CPU).

The reference reproduces the kernel's quantization EXACTLY (symmetric
int8, per-output-channel weight scales, static per-tensor activation
scales), so the comparison tolerance is float-cast noise only — the
width-edge masks, row halos, and band padding must all be exact."""

import numpy as np
import pytest

import jax.numpy as jnp

from refid_tpu.ops.trunk_band import (band_conv_in_int8, band_resblock_int8,
                                      trunk_band_int8, trunk_band_supported)


def _np_conv3x3(x, w):
    """x (H, W, Ci) f64, w (3, 3, Ci, Co) f64 -> (H, W, Co), zero pad 1."""
    H, W, _ = x.shape
    xp = np.pad(x, ((1, 1), (1, 1), (0, 0)))
    out = np.zeros((H, W, w.shape[-1]))
    for dy in range(3):
        for dx in range(3):
            out += xp[dy:dy + H, dx:dx + W] @ w[dy, dx]
    return out


def _q(x, amax):
    s = max(float(amax), 1e-12) / 127.0
    return np.clip(np.round(x / s), -127, 127), s


def _qk(w):
    amax = np.abs(w).max(axis=(0, 1, 2))
    s = np.maximum(amax, 1e-12) / 127.0
    return np.clip(np.round(w / s), -127, 127), s


def _ref_conv_in(x, s, w0, b0, s_cat):
    cat = np.concatenate([x, s], axis=-1)
    xq, sx = _q(cat, s_cat)
    wq, ws = _qk(w0)
    y = _np_conv3x3(xq, wq) * (ws * sx) + b0
    return np.maximum(y, 0.1 * y)


def _ref_resblock(h, w1, b1, w2, b2, s_h, s_h1):
    hq, sh = _q(h, s_h)
    w1q, w1s = _qk(w1)
    h1 = np.maximum(_np_conv3x3(hq, w1q) * (w1s * sh) + b1, 0.0)
    h1q, sh1 = _q(h1, s_h1)
    w2q, w2s = _qk(w2)
    return h + _np_conv3x3(h1q, w2q) * (w2s * sh1) + b2


def _rand(rng, *shape):
    return rng.randn(*shape).astype(np.float64)


@pytest.mark.parametrize("H,W,band", [(8, 12, 4), (10, 12, 4), (12, 16, 6)])
def test_band_conv_in_matches_reference(H, W, band):
    rng = np.random.RandomState(0)
    C = 8
    x = 0.5 * _rand(rng, H, W, C)
    s = 0.5 * _rand(rng, H, W, C)
    w0 = 0.2 * _rand(rng, 3, 3, 2 * C, C)
    b0 = 0.1 * _rand(rng, C)
    s_cat = float(np.abs(np.concatenate([x, s], -1)).max())

    want = _ref_conv_in(x, s, w0, b0, s_cat)
    got = np.asarray(band_conv_in_int8(
        jnp.asarray(x[None], jnp.float32), jnp.asarray(s[None], jnp.float32),
        jnp.asarray(w0, jnp.float32), jnp.asarray(b0, jnp.float32),
        s_cat, dtype=jnp.float32, band=band, interpret=True))[0]
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("H,W,band", [(8, 12, 4), (10, 12, 4)])
def test_band_resblock_matches_reference(H, W, band):
    rng = np.random.RandomState(1)
    C = 8
    h = 0.5 * _rand(rng, H, W, C)
    w1 = 0.2 * _rand(rng, 3, 3, C, C)
    b1 = 0.1 * _rand(rng, C)
    w2 = 0.2 * _rand(rng, 3, 3, C, C)
    b2 = 0.1 * _rand(rng, C)
    s_h = float(np.abs(h).max())
    # h1 amax from an exact preview (calibration stand-in)
    hq, sh = _q(h, s_h)
    w1q, w1s = _qk(w1)
    h1_prev = np.maximum(_np_conv3x3(hq, w1q) * (w1s * sh) + b1, 0.0)
    s_h1 = float(h1_prev.max())

    want = _ref_resblock(h, w1, b1, w2, b2, s_h, s_h1)
    got = np.asarray(band_resblock_int8(
        jnp.asarray(h[None], jnp.float32),
        jnp.asarray(w1, jnp.float32), jnp.asarray(b1, jnp.float32),
        jnp.asarray(w2, jnp.float32), jnp.asarray(b2, jnp.float32),
        s_h, s_h1, dtype=jnp.float32, band=band, interpret=True))[0]
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_trunk_band_composes():
    """Full trunk (conv_in + resblock) against the composed reference;
    also exercises the supported() gate."""
    rng = np.random.RandomState(2)
    C, H, W = 8, 10, 12
    x = 0.5 * _rand(rng, H, W, C)
    s = 0.5 * _rand(rng, H, W, C)
    w0 = 0.2 * _rand(rng, 3, 3, 2 * C, C)
    b0 = 0.1 * _rand(rng, C)
    w1 = 0.2 * _rand(rng, 3, 3, C, C)
    b1 = 0.1 * _rand(rng, C)
    w2 = 0.2 * _rand(rng, 3, 3, C, C)
    b2 = 0.1 * _rand(rng, C)
    s_cat = float(np.abs(np.concatenate([x, s], -1)).max())
    h_prev = _ref_conv_in(x, s, w0, b0, s_cat)
    s_h = float(np.abs(h_prev).max())
    hq, sh = _q(h_prev, s_h)
    w1q, w1s = _qk(w1)
    s_h1 = float(np.maximum(
        _np_conv3x3(hq, w1q) * (w1s * sh) + b1, 0.0).max())

    want = _ref_resblock(h_prev, w1, b1, w2, b2, s_h, s_h1)
    p_fold = {"w0": jnp.asarray(w0, jnp.float32),
              "b0": jnp.asarray(b0, jnp.float32),
              "w1": jnp.asarray(w1, jnp.float32),
              "b1": jnp.asarray(b1, jnp.float32),
              "w2": jnp.asarray(w2, jnp.float32),
              "b2": jnp.asarray(b2, jnp.float32)}
    got = np.asarray(trunk_band_int8(
        p_fold, jnp.asarray(x[None], jnp.float32),
        jnp.asarray(s[None], jnp.float32), (s_cat, s_h, s_h1),
        dtype=jnp.float32, band=4, interpret=True))[0]
    # the fused path re-quantizes ITS h (kernel h == reference h here, so
    # tolerance stays float-cast tight)
    np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-3)

    xj = jnp.asarray(np.zeros((1, 720, 640, 128)), jnp.bfloat16)
    assert trunk_band_supported(xj, xj)
    assert not trunk_band_supported(xj[..., :64], xj[..., :64])

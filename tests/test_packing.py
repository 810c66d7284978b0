"""s2d conv reparameterization == direct conv (exact math)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from refid_tpu.serve.packing import (space_to_depth, depth_to_space,
                                     conv_s2d)


def _direct(x, w, b):
    kh, kw = w.shape[:2]
    out = jax.lax.conv_general_dilated(
        x, w, (1, 1), [(kh // 2, kh // 2), (kw // 2, kw // 2)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return out + b


def test_s2d_roundtrip():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 8, 12, 5).astype(np.float32))
    for r in (2, 4, (1, 2), (1, 4)):
        np.testing.assert_array_equal(
            np.asarray(depth_to_space(space_to_depth(x, r), r)),
            np.asarray(x))


@pytest.mark.parametrize("kh,kw,ci,co,r", [
    (3, 3, 2, 8, 2),        # head-conv-like
    (5, 5, 2, 8, 2),        # 5x5 (asymmetric packed padding)
    (3, 3, 8, 3, 2),        # pred-conv-like (tiny out channels)
    (5, 5, 2, 4, 4),        # r=4 packing
    (1, 1, 4, 6, 2),        # pointwise
    (3, 3, 4, 4, (1, 2)),   # width-only fold
    (3, 3, 4, 4, (1, 4)),   # width-only fold x4
    (5, 5, 2, 4, (1, 4)),   # 5x5 width fold
])
def test_s2d_conv_matches_direct(kh, kw, ci, co, r):
    rh, rw = (r, r) if isinstance(r, int) else r
    rng = np.random.RandomState(kh * 10 + kw + rh + rw)
    h, w_ = 16, 24
    x = jnp.asarray(rng.randn(1, h, w_, ci).astype(np.float32))
    w = jnp.asarray((rng.randn(kh, kw, ci, co) * 0.3).astype(np.float32))
    b = jnp.asarray(rng.randn(co).astype(np.float32))

    want = np.asarray(_direct(x, w, b))
    got_packed = conv_s2d(space_to_depth(x, r), w, b, r)
    got = np.asarray(depth_to_space(got_packed, r))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-5)


def test_down_conv_folded_matches_direct():
    """4x4/2 downsample over a width-folded input == direct (the scale-0
    encoder 'down' conv, models/layers.py conv2d(k=4, s=2, p=1))."""
    from refid_tpu.serve.packing import down_conv_folded
    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.randn(1, 16, 24, 6).astype(np.float32))
    w = jnp.asarray((rng.randn(4, 4, 6, 5) * 0.3).astype(np.float32))
    want = np.asarray(jax.lax.conv_general_dilated(
        x, w, (2, 2), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC")))
    got = np.asarray(down_conv_folded(space_to_depth(x, (1, 2)), w, rw=2))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-5)


def test_s2d_to_wfold():
    from refid_tpu.serve.packing import s2d_to_wfold
    rng = np.random.RandomState(8)
    x = jnp.asarray(rng.randn(1, 8, 12, 3).astype(np.float32))
    got = s2d_to_wfold(space_to_depth(x, 2))
    want = space_to_depth(x, (1, 2))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_fold_concat_matches_folded_concat():
    from refid_tpu.serve.packing import fold_concat
    rng = np.random.RandomState(9)
    a = jnp.asarray(rng.randn(1, 4, 8, 3).astype(np.float32))
    b = jnp.asarray(rng.randn(1, 4, 8, 5).astype(np.float32))
    got = fold_concat([space_to_depth(a, (1, 2)),
                       space_to_depth(b, (1, 2))], 2)
    want = space_to_depth(jnp.concatenate([a, b], axis=-1), (1, 2))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_conv_transpose_up_fold4():
    """Fused transposed-conv-to-fold4 == ConvTranspose then fold."""
    import flax.linen as nn
    from refid_tpu.serve.packing import conv_transpose_up_fold4
    from refid_tpu.models.layers import conv_transpose_up

    class M(nn.Module):
        @nn.compact
        def __call__(self, x):
            return conv_transpose_up(x, 6, name="up")

    rng = np.random.RandomState(10)
    x = jnp.asarray(rng.randn(1, 6, 8, 4).astype(np.float32))
    m = M()
    p = m.init(jax.random.PRNGKey(0), x)
    want = space_to_depth(m.apply(p, x), (1, 4))
    got = conv_transpose_up_fold4(x, p["params"]["up"]["kernel"],
                                  p["params"]["up"]["bias"])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("r_in,r_out", [(1, 2), (2, 4)])
def test_conv_transpose_up_folded_variants(r_in, r_out):
    """Fused transposed conv with folded input/output densities."""
    import flax.linen as nn
    from refid_tpu.serve.packing import conv_transpose_up_folded
    from refid_tpu.models.layers import conv_transpose_up

    class M(nn.Module):
        @nn.compact
        def __call__(self, x):
            return conv_transpose_up(x, 6, name="up")

    rng = np.random.RandomState(11)
    x = jnp.asarray(rng.randn(1, 6, 8, 4).astype(np.float32))
    m = M()
    p = m.init(jax.random.PRNGKey(0), x)
    want = space_to_depth(m.apply(p, x), (1, r_out))
    xin = x if r_in == 1 else space_to_depth(x, (1, r_in))
    got = conv_transpose_up_folded(xin, p["params"]["up"]["kernel"],
                                   p["params"]["up"]["bias"], r_in=r_in,
                                   r_out=r_out)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_down_conv_folded_f2out():
    from refid_tpu.serve.packing import down_conv_folded_f2out
    rng = np.random.RandomState(12)
    x = jnp.asarray(rng.randn(1, 16, 24, 6).astype(np.float32))
    w = jnp.asarray((rng.randn(4, 4, 6, 5) * 0.3).astype(np.float32))
    want = space_to_depth(jax.lax.conv_general_dilated(
        x, w, (2, 2), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC")), (1, 2))
    got = down_conv_folded_f2out(space_to_depth(x, (1, 2)), w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_depthwise_folded_kernel():
    from refid_tpu.serve.packing import depthwise_folded_kernel, conv_s2d
    rng = np.random.RandomState(13)
    c = 6
    x = jnp.asarray(rng.randn(1, 8, 16, c).astype(np.float32))
    wd = jnp.asarray((rng.randn(3, 3, 1, c) * 0.3).astype(np.float32))
    want = jax.lax.conv_general_dilated(
        x, wd, (1, 1), [(1, 1), (1, 1)], feature_group_count=c,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    dense = depthwise_folded_kernel(wd)
    got = depth_to_space(conv_s2d(space_to_depth(x, (1, 2)), dense,
                                  None, (1, 2)), (1, 2))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)

"""conv_tapgrad: forward == plain conv; VJP == autodiff of the plain conv."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from refid_tpu.serve.tapgrad import conv_tapgrad


@pytest.mark.parametrize("padding", [((1, 1), (1, 1)), ((1, 1), (1, 2)),
                                     ((0, 2), (2, 0))])
@pytest.mark.parametrize("kshape", [(3, 3), (3, 5), (1, 1)])
def test_conv_tapgrad_matches_autodiff(padding, kshape):
    kh, kw = kshape
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 8, 10, 6).astype(np.float32))
    w = jnp.asarray(rng.randn(kh, kw, 6, 4).astype(np.float32))

    def ref(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    y0 = ref(x, w)
    y1 = conv_tapgrad(x, w, padding)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0), atol=1e-5)

    cot = jnp.asarray(rng.randn(*y0.shape).astype(np.float32))
    loss_ref = lambda x, w: jnp.sum(ref(x, w) * cot)
    loss_tap = lambda x, w: jnp.sum(conv_tapgrad(x, w, padding) * cot)
    gx0, gw0 = jax.grad(loss_ref, argnums=(0, 1))(x, w)
    gx1, gw1 = jax.grad(loss_tap, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx0), atol=2e-4,
                               rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gw1), np.asarray(gw0), atol=2e-4,
                               rtol=1e-4)


@pytest.mark.parametrize("strides", [(2, 1), (2, 2), (3, 2)])
@pytest.mark.parametrize("padding,kshape", [
    (((1, 1), (1, 1)), (4, 3)),   # the folded 4x4/2 down conv's geometry
    (((1, 1), (1, 2)), (4, 3)),   # fold_down_conv_kernel's asymmetric pads
    (((1, 2), (0, 1)), (3, 3)),
])
def test_conv_tapgrad_strided_matches_autodiff(strides, padding, kshape):
    from refid_tpu.serve.tapgrad import conv_tapgrad_s
    kh, kw = kshape
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 12, 10, 6).astype(np.float32))
    w = jnp.asarray(rng.randn(kh, kw, 6, 4).astype(np.float32))

    def ref(x, w):
        return jax.lax.conv_general_dilated(
            x, w, strides, padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    y0 = ref(x, w)
    y1 = conv_tapgrad_s(x, w, strides, padding)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0), atol=1e-5)

    cot = jnp.asarray(rng.randn(*y0.shape).astype(np.float32))
    loss_ref = lambda x, w: jnp.sum(ref(x, w) * cot)
    loss_tap = lambda x, w: jnp.sum(
        conv_tapgrad_s(x, w, strides, padding) * cot)
    gx0, gw0 = jax.grad(loss_ref, argnums=(0, 1))(x, w)
    gx1, gw1 = jax.grad(loss_tap, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx0), atol=2e-4,
                               rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gw1), np.asarray(gw0), atol=2e-4,
                               rtol=1e-4)


def test_conv_tapgrad_bf16_dtypes():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 6, 6, 4).astype(np.float32)).astype(
        jnp.bfloat16)
    w = jnp.asarray(rng.randn(3, 3, 4, 8).astype(np.float32)).astype(
        jnp.bfloat16)
    pad = ((1, 1), (1, 1))
    y, vjp = jax.vjp(lambda x, w: conv_tapgrad(x, w, pad), x, w)
    dx, dw = vjp(jnp.ones_like(y))
    assert y.dtype == jnp.bfloat16
    assert dx.dtype == jnp.bfloat16 and dw.dtype == jnp.bfloat16

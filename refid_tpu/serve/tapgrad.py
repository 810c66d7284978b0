"""Custom-VJP convolution with a per-tap dot_general weight gradient.

Why: profile_train (round 4) shows the folded training scan's backward at
4.7x the forward; the dominant in-loop ops are XLA's wgrad convolutions
(spatial-window contractions) plus the T(2,128) activation relayouts they
force.  The same math as one wgrad conv is KH*KW independent matmuls

    dW[u, v] = x_pad[:, u:u+H, v:v+W', :] (contracted over b,h,w) @ dy

each a (ci, b*h*w) x (b*h*w, co) contraction — tall-K MXU shapes with the
channel dims in the lanes, no kernel-layout transposes of full-res
activations.  The data gradient keeps XLA's formulation (a conv with the
spatially-flipped, IO-swapped kernel — same geometry as the forward, which
XLA already runs well).

Exactness: gradients match ``jax.grad`` of the plain conv to f32 matmul
reassociation (tests/test_tapgrad.py pins both dx and dW).

Used by serve/fast_scan.py (training) behind ``tap_wgrad=True``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

__all__ = ["conv_tapgrad", "conv_tapgrad_s"]


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def conv_tapgrad(x, w, padding):
    """stride-1 NHWC/HWIO conv with explicit ``padding`` ((lo,hi),(lo,hi))
    and a tap-matmul weight-gradient VJP."""
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), padding, dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _fwd(x, w, padding):
    return conv_tapgrad(x, w, padding), (x, w)


def _bwd(padding, res, dy):
    x, w = res
    kh, kw, ci, co = w.shape
    (plh, phh), (plw, phw) = padding
    # dx: conv of dy with the spatially-flipped, IO-swapped kernel.
    # out[m] = sum_u x[m + u - pl] w[u]  =>  dx[n] = sum_u dy[n + pl - u] w[u]
    # = conv(dy, flip(w)^T) with padding (k - 1 - pl, k - 1 - ph).
    w_t = jnp.flip(w, axis=(0, 1)).transpose(0, 1, 3, 2)
    dx = jax.lax.conv_general_dilated(
        dy, w_t, (1, 1),
        ((kh - 1 - plh, kh - 1 - phh), (kw - 1 - plw, kw - 1 - phw)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    # dW[u, v] = x_pad[:, u:u+H, v:v+W'] . dy   (contract b, h, w)
    b, hy, wy, _ = dy.shape
    x_pad = jnp.pad(x, ((0, 0), (plh, phh), (plw, phw), (0, 0)))
    dy2 = dy.reshape(b * hy * wy, co)
    taps = []
    for u in range(kh):
        for v in range(kw):
            xs = jax.lax.slice(
                x_pad, (0, u, v, 0), (b, u + hy, v + wy, ci))
            taps.append(jax.lax.dot_general(
                xs.reshape(b * hy * wy, ci), dy2,
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))
    dw = jnp.stack(taps, 0).reshape(kh, kw, ci, co).astype(w.dtype)
    return dx, dw


conv_tapgrad.defvjp(_fwd, _bwd)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def conv_tapgrad_s(x, w, strides, padding):
    """Strided NHWC/HWIO conv with a tap-matmul weight-gradient VJP —
    covers the stage-down sites (`down_conv_folded`'s (2, 1), the
    unfolded ``down`` convs' (2, 2)) that ``conv_tapgrad`` (stride-1
    only) left on XLA's wgrad formulation.

    dW[u, v] = x_pad[:, u::sh, v::sw][:, :hy, :wy] . dy (contract b,h,w)
    — each tap a strided slice + tall-K dot_general, same shape logic as
    the stride-1 version with the slice strided by the forward stride.
    dx is the standard transposed formulation (dy dilated by the stride,
    convolved with the flipped IO-swapped kernel)."""
    return jax.lax.conv_general_dilated(
        x, w, strides, padding, dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _fwd_s(x, w, strides, padding):
    return conv_tapgrad_s(x, w, strides, padding), (x, w)


def _bwd_s(strides, padding, res, dy):
    x, w = res
    kh, kw, ci, co = w.shape
    sh, sw = strides
    (plh, phh), (plw, phw) = padding
    b, hy, wy, _ = dy.shape
    H, W = x.shape[1], x.shape[2]
    # dx: dilate dy by the stride, conv with the flipped IO-swapped kernel.
    # Low pad kh-1-plh as in the stride-1 case; high pad closes the output
    # length to H: (sh*(hy-1)+1) + lo + hi - kh + 1 == H.
    w_t = jnp.flip(w, axis=(0, 1)).transpose(0, 1, 3, 2)
    dx = jax.lax.conv_general_dilated(
        dy, w_t, (1, 1),
        ((kh - 1 - plh, H + plh - sh * (hy - 1) - 1),
         (kw - 1 - plw, W + plw - sw * (wy - 1) - 1)),
        lhs_dilation=(sh, sw),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    x_pad = jnp.pad(x, ((0, 0), (plh, phh), (plw, phw), (0, 0)))
    dy2 = dy.reshape(b * hy * wy, co)
    taps = []
    for u in range(kh):
        for v in range(kw):
            xs = jax.lax.slice(
                x_pad, (0, u, v, 0),
                (b, u + sh * (hy - 1) + 1, v + sw * (wy - 1) + 1, ci),
                (1, sh, sw, 1))
            taps.append(jax.lax.dot_general(
                xs.reshape(b * hy * wy, ci), dy2,
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))
    dw = jnp.stack(taps, 0).reshape(kh, kw, ci, co).astype(w.dtype)
    return dx, dw


conv_tapgrad_s.defvjp(_fwd_s, _bwd_s)

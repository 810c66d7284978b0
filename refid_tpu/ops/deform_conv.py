"""Modulated deformable convolution v2 (pure JAX, gather-based).

TPU equivalent of ``torchvision.ops.deform_conv2d`` as used by the reference
DCN path (basicsr/models/archs/dcn_util.py:17-178, engaged only when
``use_first_dcn=True`` — off in every shipped config).  Per kernel tap the
input is sampled at ``p + p_k + Δp_k`` with bilinear interpolation (zeros
outside), scaled by the modulation mask, then contracted with the weights —
k*k gathers + one einsum, which XLA maps to MXU matmuls.

Offset layout matches torchvision: ``offset (b, ho, wo, 2*og*kh*kw)`` with
(y, x) interleaved per tap; ``mask (b, ho, wo, og*kh*kw)``.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from refid_tpu.models.layers import conv2d

__all__ = ["deform_conv2d", "ModulatedDeformConvPack"]


def _bilinear_sample(x, py, px):
    """x (b,h,w,c); py/px (b,ho,wo) absolute sample coords; zeros outside."""
    b, h, w, c = x.shape
    y0 = jnp.floor(py)
    x0 = jnp.floor(px)
    dy = (py - y0)[..., None]
    dx = (px - x0)[..., None]

    def gather(yi, xi):
        inb = ((yi >= 0) & (yi < h) & (xi >= 0) & (xi < w))
        yc = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        xc = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        batch = jnp.arange(b)[:, None, None]
        return x[batch, yc, xc] * inb[..., None]

    return (gather(y0, x0) * (1 - dy) * (1 - dx)
            + gather(y0, x0 + 1) * (1 - dy) * dx
            + gather(y0 + 1, x0) * dy * (1 - dx)
            + gather(y0 + 1, x0 + 1) * dy * dx)


def deform_conv2d(x, offset, weight, bias=None, mask=None, stride=1,
                  padding=1, dilation=1):
    """x (b,h,w,cin); weight (kh,kw,cin,cout); offset (b,ho,wo,2*kh*kw);
    mask (b,ho,wo,kh*kw) or None.  Single offset group."""
    b, h, w, cin = x.shape
    kh, kw, _, cout = weight.shape
    ho = (h + 2 * padding - dilation * (kh - 1) - 1) // stride + 1
    wo = (w + 2 * padding - dilation * (kw - 1) - 1) // stride + 1

    base_y = jnp.arange(ho) * stride - padding
    base_x = jnp.arange(wo) * stride - padding
    gy = base_y[None, :, None]
    gx = base_x[None, None, :]

    taps = []
    for i in range(kh):
        for j in range(kw):
            k = i * kw + j
            off_y = offset[..., 2 * k]
            off_x = offset[..., 2 * k + 1]
            py = gy + i * dilation + off_y
            px = gx + j * dilation + off_x
            s = _bilinear_sample(x, py, px)         # (b,ho,wo,cin)
            if mask is not None:
                s = s * mask[..., k:k + 1]
            taps.append(s)
    patches = jnp.stack(taps, axis=3)                # (b,ho,wo,kh*kw,cin)
    wmat = weight.reshape(kh * kw, cin, cout)
    out = jnp.einsum("bhwkc,kcn->bhwn", patches, wmat)
    if bias is not None:
        out = out + bias
    return out


class ModulatedDeformConvPack(nn.Module):
    """DCNv2 'pack': offsets and masks predicted from the input by a side
    conv (zero-initialized so the layer starts as a plain conv) —
    dcn_util.py:65-112."""
    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    dilation: int = 1
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        co = conv2d(x, 3 * k * k, k, self.stride, self.padding,
                    kernel_init=nn.initializers.zeros,
                    bias_init=nn.initializers.zeros,
                    dtype=self.dtype, name="conv_offset")
        o1, o2, m = jnp.split(co, 3, axis=-1)
        offset = jnp.concatenate([o1, o2], axis=-1)
        # interleave (y, x) per tap like torchvision
        off_y = offset[..., : k * k]
        off_x = offset[..., k * k:]
        offset = jnp.stack([off_y, off_x], axis=-1).reshape(
            x.shape[0], o1.shape[1], o1.shape[2], 2 * k * k)
        mask = jax.nn.sigmoid(m)

        cin = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.variance_scaling(1 / 3, "fan_in",
                                                       "uniform"),
            (k, k, cin, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return deform_conv2d(x, offset, kernel, bias, mask,
                             self.stride, self.padding, self.dilation)

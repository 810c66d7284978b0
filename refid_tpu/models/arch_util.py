"""Arch utility ops and the EICA block (flax, NHWC).

Parity targets from basicsr/models/archs/arch_util.py (the BasicSR grab-bag
the REFID fork keeps around):
  * flow_warp (:115-158)        — bilinear warping by optical flow
  * resize_flow (:160-205)      — flow resampling with magnitude rescale
  * pixel_unshuffle (:207-232)  — space-to-depth
  * Mutual_Attention (:282-317) + EventImage_ChannelAttentionTransformerBlock
    (:322-348, "EICA") — channel-attention cross-modal transformer (unused by
    the shipped FinalBidirectionAttenfusion but part of the toolbox surface).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from refid_tpu.models.layers import conv2d

__all__ = ["flow_warp", "resize_flow", "pixel_unshuffle", "pixel_shuffle",
           "MutualAttention", "EventImageChannelAttentionTransformerBlock"]


def flow_warp(x, flow, align_corners=True):
    """Warp ``x (b,h,w,c)`` by ``flow (b,h,w,2)`` (x-displacement first),
    bilinear sampling with zero padding — matches torch grid_sample semantics
    used by the reference (padding_mode='zeros')."""
    b, h, w, c = x.shape
    grid_y, grid_x = jnp.meshgrid(jnp.arange(h, dtype=flow.dtype),
                                  jnp.arange(w, dtype=flow.dtype),
                                  indexing="ij")
    sx = grid_x[None] + flow[..., 0]
    sy = grid_y[None] + flow[..., 1]

    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    dx = sx - x0
    dy = sy - y0

    def gather(yi, xi):
        inb = ((yi >= 0) & (yi < h) & (xi >= 0) & (xi < w))
        yc = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        xc = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        batch_idx = jnp.arange(b)[:, None, None]
        vals = x[batch_idx, yc, xc]               # (b,h,w,c)
        return vals * inb[..., None]

    out = (gather(y0, x0) * ((1 - dx) * (1 - dy))[..., None]
           + gather(y0, x0 + 1) * (dx * (1 - dy))[..., None]
           + gather(y0 + 1, x0) * ((1 - dx) * dy)[..., None]
           + gather(y0 + 1, x0 + 1) * (dx * dy)[..., None])
    return out


def resize_flow(flow, size_type, sizes, align_corners=False):
    """Resize a flow field and rescale its magnitudes (arch_util:160-205).
    flow: (b, h, w, 2)."""
    b, h, w, _ = flow.shape
    if size_type == "ratio":
        out_h, out_w = int(h * sizes[0]), int(w * sizes[1])
    elif size_type == "shape":
        out_h, out_w = sizes
    else:
        raise ValueError(f"unknown size_type {size_type!r}")
    scaled = flow * jnp.asarray([out_w / w, out_h / h], flow.dtype)
    return jax.image.resize(scaled, (b, out_h, out_w, 2), method="bilinear")


def pixel_unshuffle(x, scale: int):
    """Space-to-depth: (b, h, w, c) -> (b, h/s, w/s, c*s*s)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // scale, scale, w // scale, scale, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(
        b, h // scale, w // scale, c * scale * scale)


def pixel_shuffle(x, scale: int):
    """Depth-to-space: (b, h, w, c) -> (b, h*s, w*s, c/(s*s))."""
    b, h, w, c = x.shape
    x = x.reshape(b, h, w, scale, scale, c // (scale * scale))
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(
        b, h * scale, w * scale, c // (scale * scale))


class MutualAttention(nn.Module):
    """Channel attention between image (query) and event (key/value):
    attention over CHANNELS, O(c^2 * hw) — arch_util:282-317."""
    dim: int
    num_heads: int
    use_bias: bool = False
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, y):
        assert x.shape == y.shape
        b, h, w, c = x.shape
        hd = self.num_heads
        temperature = self.param("temperature", nn.initializers.ones,
                                 (hd, 1, 1))

        def heads(z):  # (b,h,w,c) -> (b, head, c/head, h*w)
            z = z.reshape(b, h * w, hd, c // hd)
            return z.transpose(0, 2, 3, 1)

        q = heads(conv2d(x, self.dim, 1, use_bias=self.use_bias,
                         dtype=self.dtype, name="q"))
        k = heads(conv2d(y, self.dim, 1, use_bias=self.use_bias,
                         dtype=self.dtype, name="k"))
        v = heads(conv2d(y, self.dim, 1, use_bias=self.use_bias,
                         dtype=self.dtype, name="v"))

        q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
        k = k / jnp.maximum(jnp.linalg.norm(k, axis=-1, keepdims=True), 1e-12)

        attn = jnp.einsum("bhcn,bhdn->bhcd", q, k) * temperature
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhcd,bhdn->bhcn", attn, v)
        out = out.transpose(0, 3, 1, 2).reshape(b, h, w, c)
        return conv2d(out, self.dim, 1, use_bias=self.use_bias,
                      dtype=self.dtype, name="project_out")


class EventImageChannelAttentionTransformerBlock(nn.Module):
    """EICA: cross-modal channel-attention + MLP transformer block
    (arch_util:322-348)."""
    dim: int
    num_heads: int
    ffn_expansion_factor: int = 2
    use_bias: bool = False
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, image, event):
        assert image.shape == event.shape
        ni = nn.LayerNorm(name="norm1_image")(image)
        ne = nn.LayerNorm(name="norm1_event")(event)
        fused = image + MutualAttention(self.dim, self.num_heads,
                                        self.use_bias, dtype=self.dtype,
                                        name="attn")(ni, ne)
        y = nn.LayerNorm(name="norm2")(fused)
        y = nn.Dense(self.dim * self.ffn_expansion_factor, name="fc1")(y)
        y = jax.nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim, name="fc2")(y)
        return fused + y


class SpatialCrossAttention(nn.Module):
    """Token-space cross attention (image queries, event keys/values) with
    optional spatial-reduction of the kv source — arch_util.py:370-419
    ('Attention').  Inputs are (b, n, c) token sequences."""
    dim: int
    num_heads: int = 8
    qkv_bias: bool = False
    sr_ratio: int = 1
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, y, H: Optional[int] = None,
                 W: Optional[int] = None):
        assert x.ndim == 3 and x.shape == y.shape
        b, n, c = x.shape
        hd = self.num_heads
        scale = (c // hd) ** -0.5

        q = nn.Dense(c, use_bias=self.qkv_bias, dtype=self.dtype,
                     name="q")(x).reshape(b, n, hd, c // hd)
        q = q.transpose(0, 2, 1, 3)

        if self.sr_ratio > 1:
            assert H is not None and W is not None
            y2 = y.reshape(b, H, W, c)
            y2 = conv2d(y2, c, self.sr_ratio, self.sr_ratio, 0,
                        dtype=self.dtype, name="sr")
            y = nn.LayerNorm(name="norm")(
                y2.reshape(b, -1, c))
        kv = nn.Dense(2 * c, use_bias=self.qkv_bias, dtype=self.dtype,
                      name="kv")(y)
        kv = kv.reshape(b, -1, 2, hd, c // hd).transpose(2, 0, 3, 1, 4)
        k, v = kv[0], kv[1]

        attn = jax.nn.softmax(jnp.einsum("bhnd,bhmd->bhnm", q, k) * scale,
                              axis=-1)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, c)
        return nn.Dense(c, name="proj")(out)

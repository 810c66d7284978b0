"""EVHINet — event-guided HINet for single-image motion deblurring (flax).

Parity target: ``SingleMultiConnectEVHINet``
(basicsr/models/archs/single_multiconnect_evhinet_arch.py:66-167), the
network used with ``ImageEventRestorationModel`` for the single-image deblur
task.  The shipped forward is the "single version": only stage 1 runs —
event encoder -> HIN UNet encoder with FAC-bias event modulation at scales
0..fac_place -> UNet decoder -> SAM head returning the restored image.
(The stage-2 modules the reference constructs are dead weight and are not
reproduced.)

Key pieces:
  * HIN (half-instance-norm): InstanceNorm over the first half of the
    channels only (UNetConvBlock :259-274).
  * FAC_bias: the event branch emits per-pixel (weight, bias) that modulate
    the image features: ``feat * w + b`` (arch_util.py:421-426).
  * SAM supervised-attention head (:35-48).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from refid_tpu.models.layers import conv2d, conv_transpose_up, leaky_relu

Dtype = Any


def half_instance_norm(x, scale, bias, eps=1e-5):
    """InstanceNorm2d(affine) over the FIRST HALF of the channel axis."""
    c = x.shape[-1]
    h1, h2 = x[..., : c // 2], x[..., c // 2:]
    mu = jnp.mean(h1, axis=(-3, -2), keepdims=True)
    var = jnp.var(h1, axis=(-3, -2), keepdims=True)
    h1 = (h1 - mu) * jax.lax.rsqrt(var + eps) * scale + bias
    return jnp.concatenate([h1, h2], axis=-1)


def fac_bias(feat, filt):
    """Per-pixel affine modulation from the event branch (arch_util:421)."""
    weight, bias = jnp.split(filt, 2, axis=-1)
    return feat * weight + bias


class HINConvBlock(nn.Module):
    """conv(+HIN) lrelu conv lrelu + 1x1 identity; optional FAC-bias merge
    and 4x4/2 downsample.  Returns (down, pre_down) when downsampling."""
    out_size: int
    downsample: bool
    relu_slope: float = 0.2
    use_hin: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, event_filter=None):
        out = conv2d(x, self.out_size, 3, 1, 1, dtype=self.dtype, name="conv1")
        if self.use_hin:
            half = self.out_size // 2
            scale = self.param("hin_scale", nn.initializers.ones, (half,))
            bias = self.param("hin_bias", nn.initializers.zeros, (half,))
            if self.dtype is not None:
                scale, bias = scale.astype(self.dtype), bias.astype(self.dtype)
            out = half_instance_norm(out, scale, bias)
        out = leaky_relu(out, self.relu_slope)
        out = leaky_relu(conv2d(out, self.out_size, 3, 1, 1, dtype=self.dtype,
                                name="conv2"), self.relu_slope)
        out = out + conv2d(x, self.out_size, 1, 1, 0, dtype=self.dtype,
                           name="identity")
        if event_filter is not None:
            out = fac_bias(out, event_filter)
        if self.downsample:
            down = conv2d(out, self.out_size, 4, 2, 1, use_bias=False,
                          dtype=self.dtype, name="down")
            return down, out
        return out


class EVConvBlock(nn.Module):
    """Event-branch block: HIN conv block whose full-res output is lifted to
    2*out channels (FAC weight+bias) by a 1x1 conv (reference :333-388)."""
    out_size: int
    downsample: bool
    relu_slope: float = 0.2
    use_hin: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        out = conv2d(x, self.out_size, 3, 1, 1, dtype=self.dtype, name="conv1")
        if self.use_hin:
            half = self.out_size // 2
            scale = self.param("hin_scale", nn.initializers.ones, (half,))
            bias = self.param("hin_bias", nn.initializers.zeros, (half,))
            if self.dtype is not None:
                scale, bias = scale.astype(self.dtype), bias.astype(self.dtype)
            out = half_instance_norm(out, scale, bias)
        out = leaky_relu(out, self.relu_slope)
        out = leaky_relu(conv2d(out, self.out_size, 3, 1, 1, dtype=self.dtype,
                                name="conv2"), self.relu_slope)
        out = out + conv2d(x, self.out_size, 1, 1, 0, dtype=self.dtype,
                           name="identity")
        merged = conv2d(out, 2 * self.out_size, 1, 1, 0, dtype=self.dtype,
                        name="merge")
        if self.downsample:
            down = conv2d(out, self.out_size, 4, 2, 1, use_bias=False,
                          dtype=self.dtype, name="down")
            return down, merged
        return merged


class SAM(nn.Module):
    """Supervised attention module (reference :35-48)."""
    n_feat: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, x_img):
        x1 = conv2d(x, self.n_feat, 3, 1, 1, dtype=self.dtype, name="conv1")
        img = conv2d(x, 3, 3, 1, 1, dtype=self.dtype, name="conv2") + x_img
        gate = jax.nn.sigmoid(conv2d(img, self.n_feat, 3, 1, 1,
                                     dtype=self.dtype, name="conv3"))
        return x1 * gate + x, img


class EVHINet(nn.Module):
    """Single-image deblur: (b,h,w,3) image + (b,h,w,ev_chn) voxel -> sharp."""
    in_chn: int = 3
    ev_chn: int = 6
    wf: int = 64
    depth: int = 3
    fac_place: int = 2
    hin_left: int = 0
    hin_right: int = 4
    relu_slope: float = 0.2
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, event):
        # accept (b,t,h,w,c) voxels from the generic task plumbing
        if event.ndim == 5:
            b, t = event.shape[:2]
            event = jnp.concatenate([event[:, i] for i in range(t)], axis=-1)
        image = x

        # event encoder
        e = conv2d(event, self.wf, 3, 1, 1, dtype=self.dtype, name="conv_ev1")
        ev_feats = []
        for i in range(min(self.fac_place + 1, self.depth)):
            down = (i + 1) < self.depth
            use_hin = self.hin_left <= i <= self.hin_right
            blk = EVConvBlock(2 ** i * self.wf, down, self.relu_slope,
                              use_hin, dtype=self.dtype, name=f"ev_{i}")
            if i != self.fac_place:
                e, merged = blk(e)
                ev_feats.append(merged)  # fac_before_downsample=True
            else:
                ev_feats.append(blk(e) if not down else blk(e)[1])

        # stage-1 encoder
        x1 = conv2d(image, self.wf, 3, 1, 1, dtype=self.dtype, name="conv_01")
        encs = []
        for i in range(self.depth):
            down = (i + 1) < self.depth
            use_hin = self.hin_left <= i <= self.hin_right
            filt = ev_feats[i] if i <= self.fac_place and i < len(ev_feats) \
                else None
            blk = HINConvBlock(2 ** i * self.wf, down, self.relu_slope,
                               use_hin, dtype=self.dtype, name=f"down_{i}")
            if down:
                x1, x1_up = blk(x1, filt)
                encs.append(x1_up)
            else:
                # reference quirk: the LAST stage never receives the event
                # filter (forward :140-154 else-branch), so ev_feats[-1] is
                # computed but unused — replicated for checkpoint parity
                x1 = blk(x1, None)

        # decoder
        for idx, i in enumerate(reversed(range(self.depth - 1))):
            up = conv_transpose_up(x1, 2 ** i * self.wf, dtype=self.dtype,
                                   name=f"up_{idx}")
            bridge = conv2d(encs[-idx - 1], 2 ** i * self.wf, 3, 1, 1,
                            dtype=self.dtype, name=f"skip_{idx}")
            x1 = HINConvBlock(2 ** i * self.wf, False, self.relu_slope,
                              use_hin=False, dtype=self.dtype,
                              name=f"upblk_{idx}")(
                jnp.concatenate([up, bridge], axis=-1))

        _, out = SAM(self.wf, dtype=self.dtype, name="sam12")(x1, image)
        return out

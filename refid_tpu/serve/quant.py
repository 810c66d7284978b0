"""int8 quantized-serving primitives (v5e MXU: 394 int8 TOPS vs 197 bf16
TFLOP/s — the only arithmetic that clears the 84 fps bf16 exact-math
ceiling, PERFORMANCE.md "Remaining headroom").

Scheme: symmetric int8.
  * weights: PER-OUTPUT-CHANNEL scales, quantized at trace time from the
    f32 params (cached per trace like the folded kernels).
  * activations: per-tensor DYNAMIC scale (amax / 127), computed on device
    per conv input.  No calibration data needed; the amax reduction and
    quantize pass are XLA-fused into neighbors where possible.

Accumulation in int32, rescale in f32, bias + activation in the f32/bf16
epilogue.  Exactness: this is NOT exact math — gate on measured dB vs the
f32 forward (tests/test_quant.py) the way bf16 was qualified (65 dB).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["quantize_kernel", "quantize_act", "conv_int8"]


def quantize_kernel(k, cache=None):
    """(kh, kw, ci, co) f32 -> (int8 kernel, f32 per-co scale).

    The cache entry PINS ``k`` so its id cannot be recycled mid-trace
    (id-reuse would silently alias kernels — same guard as
    packing.conv_s2d)."""
    if cache is not None:
        hit = cache.get(id(k))
        if hit is not None and hit[0] is k:
            return hit[1:]
    kf = k.astype(jnp.float32)
    amax = jnp.max(jnp.abs(kf), axis=(0, 1, 2))          # (co,)
    scale = jnp.maximum(amax, 1e-12) / 127.0
    kq = jnp.clip(jnp.round(kf / scale), -127, 127).astype(jnp.int8)
    if cache is not None:
        cache[id(k)] = (k, kq, scale)
    return kq, scale


def quantize_act(x):
    """Per-tensor dynamic symmetric quantization -> (int8 x, f32 scale)."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)))
    scale = jnp.maximum(amax, 1e-12) / 127.0
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / scale),
                  -127, 127).astype(jnp.int8)
    return xq, scale


def conv_int8(p, x, stride=1, padding=0, slope=None, relu=False,
              out_dtype=None, cache=None):
    """Drop-in for serve.fast_forward._conv with int8 MXU arithmetic.

    ``p`` holds f32/bf16 {kernel, bias}; the kernel is quantized at trace
    time (memoized via ``cache``), the input dynamically on device.
    """
    kq, wscale = quantize_kernel(p["kernel"], cache)
    xq, xscale = quantize_act(x)
    y = jax.lax.conv_general_dilated(
        xq, kq, (stride, stride), [(padding, padding)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    # rescale in the OUTPUT dtype: an f32 rescale materializes full-res f32
    # temps (225MB each at the folded 720p shapes -> HBM OOM at t=23); the
    # int32->bf16 rounding (~2^-9 rel) is below the int8 quantization noise
    rdt = out_dtype or jnp.float32
    y = y.astype(rdt) * (wscale * xscale).astype(rdt)
    if "bias" in p:
        y = y + p["bias"].astype(rdt)
    if relu:
        y = jax.nn.relu(y)
    elif slope is not None:
        y = jnp.maximum(y, y * slope)
    return y


def conv_s2d_int8(xp, w, bias=None, r=2, out_dtype=None, slope=None,
                  relu=False, cache=None):
    """int8 twin of packing.conv_s2d: the FOLDED kernel is quantized
    per-output-channel at trace time (memoized alongside the fold), the
    packed input dynamically on device.  Used for the width-folded scale-0
    / decoder trunks whose bf16 convs already run at MXU peak — int8 is
    the only way those sites get faster."""
    from refid_tpu.serve.packing import s2d_conv_kernel, _rr
    rh, rw = _rr(r)
    key = ("q", id(w), (rh, rw))
    hit = None if cache is None else cache.get(key)
    if hit is None or hit[0] is not w:
        W, padding = s2d_conv_kernel(w, r)
        kq, wscale = quantize_kernel(W)
        hit = (w, kq, wscale, padding)
        if cache is not None:
            cache[key] = hit
    _, kq, wscale, padding = hit
    xq, xscale = quantize_act(xp)
    y = jax.lax.conv_general_dilated(
        xq, kq, (1, 1), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    rdt = out_dtype or jnp.float32
    y = y.astype(rdt) * (wscale * xscale).astype(rdt)
    if bias is not None:
        y = y + jnp.tile(bias, rh * rw).astype(rdt)
    if relu:
        y = jax.nn.relu(y)
    elif slope is not None:
        y = jnp.maximum(y, y * slope)
    return y

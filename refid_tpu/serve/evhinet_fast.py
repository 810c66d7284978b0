"""Width-folded EVHINet serving forward (exact math).

EVHINet (models/evhinet.py — parity target
single_multiconnect_evhinet_arch.py:66-167) spends its 720p time in
full-resolution 64-channel convs: the event encoder stage, the stage-0
HIN block, the last decoder block, and the SAM head all run at (720,
1280, 64) — i.e. at HALF the TPU's 128-lane density, the same
lane-padding pathology the flagship's packed path fixes
(serve/packing.py).  This module serves EVHINet with every full-res op
in width-fold-2 (64ch -> 128 lanes, 2x MACs — the measured sweet spot),
scales 1-2 (128/256ch — already lane-saturated) unfolded, and the
decoder's final transposed conv emitting fold-2 directly so the
full-res 64-channel tensor never exists unfolded.

Two serving-time dead branches of the reference forward are dropped —
EXACTLY (they do not feed the returned image):
  * ``ev_feats[-1]``: the last encoder stage never receives the event
    filter (reference forward :140-154 else-branch), so the final
    EVConvBlock (256ch at 180p) is computed-but-unused;
  * SAM's attention output: the single-stage network returns only
    ``img = conv2(x) + x_img`` (reference :35-48, :163), so SAM's
    conv1/conv3/gate — two full-res 64-channel convs — are dead.

Exactness: tests/test_evhinet_fast.py pins this forward against
``model.apply`` in f32.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from refid_tpu.models.layers import leaky_relu as _lrelu
from refid_tpu.serve.fast_forward import (_conv, _conv_transpose_up)
from refid_tpu.serve.packing import (
    space_to_depth, depth_to_space, conv_s2d, down_conv_folded,
    fold_concat, conv_transpose_up_folded)

__all__ = ["evhinet_fast_forward", "evhinet_foldable"]

_R = (1, 2)  # width-fold-2


def evhinet_foldable(net) -> bool:
    """True iff ``evhinet_fast_forward`` implements EXACTLY this EVHINet
    geometry (the single shared gate for the task layer's predict/train
    routing and the assert inside the forward)."""
    from refid_tpu.models.evhinet import EVHINet
    return (isinstance(net, EVHINet) and net.depth == 3
            and net.fac_place == 2)


def half_instance_norm_folded(xf, scale, bias, r=2, eps=1e-5):
    """half_instance_norm (models/evhinet.py:33) on a width-fold-r tensor.

    InstanceNorm stats run over (h, w) of the ORIGINAL tensor: in folded
    layout channel c lives at lanes {ph*C + c}, so the exact stats are
    the mean/var pooled over all fold phases and folded positions."""
    cp = xf.shape[-1]
    C = cp // r
    half = scale.shape[0]
    parts = [xf[..., i * C:(i + 1) * C] for i in range(r)]
    h1 = jnp.stack([pt[..., :half] for pt in parts])     # (r,b,h,wp,half)
    mu = jnp.mean(h1, axis=(0, 2, 3), keepdims=True)
    var = jnp.mean(jnp.square(h1 - mu), axis=(0, 2, 3), keepdims=True)
    h1 = (h1 - mu) * jax.lax.rsqrt(var + eps) * scale + bias
    out = []
    for i in range(r):
        out.append(jnp.concatenate([h1[i], parts[i][..., half:]], axis=-1))
    return jnp.concatenate(out, axis=-1)


def fac_bias_folded(featf, filtf, r=2):
    """fac_bias (models/evhinet.py:43) in folded layout: the filter's
    (weight, bias) split is per ORIGINAL channel block, i.e. per phase."""
    C2 = filtf.shape[-1] // r
    c = C2 // 2
    Cf = featf.shape[-1] // r
    assert c == Cf, (filtf.shape, featf.shape)
    out = []
    for ph in range(r):
        f = filtf[..., ph * C2:(ph + 1) * C2]
        w_, b_ = f[..., :c], f[..., c:]
        out.append(featf[..., ph * Cf:(ph + 1) * Cf] * w_ + b_)
    return jnp.concatenate(out, axis=-1)


def _cast(p, dtype):
    return p if dtype is None else jax.tree_util.tree_map(
        lambda a: a.astype(dtype), p)


def _conv_f(p, xf, dtype=None, q=None, slope=None):
    """Stride-1 conv on a width-fold-2 tensor (original kernel).  ``q``
    routes through int8 MXU arithmetic (serve/quant.py conv_s2d_int8 —
    NOT exact math, dB-gated); ``slope`` fuses a leaky-relu epilogue."""
    if q is not None:
        from refid_tpu.serve.quant import conv_s2d_int8
        return conv_s2d_int8(xf, p["kernel"], p.get("bias"), r=_R,
                             out_dtype=dtype, slope=slope, cache=q)
    k, b = p["kernel"], p.get("bias")
    if dtype is not None:
        k = k.astype(dtype)
        b = None if b is None else b.astype(dtype)
        xf = xf.astype(dtype)
    out = conv_s2d(xf, k, b, r=_R)
    return out if slope is None else _lrelu(out, slope)


def _hin_block_folded(p, xf, slope, use_hin, filt=None, down=False,
                      dtype=None, q=None):
    """HINConvBlock (models/evhinet.py:49) entirely in width-fold-2;
    the optional 4x4/2 downsample emits the UNFOLDED half-res output."""
    out = _conv_f(p["conv1"], xf, dtype, q)
    if use_hin:
        out = half_instance_norm_folded(
            out, *_cast((p["hin_scale"], p["hin_bias"]), dtype))
    out = _lrelu(out, slope)
    out = _lrelu(_conv_f(p["conv2"], out, dtype, q), slope)
    out = out + _conv_f(p["identity"], xf, dtype, q)
    if filt is not None:
        out = fac_bias_folded(out, filt)
    if down:
        dk = p["down"]["kernel"]
        return down_conv_folded(out, dk.astype(dtype) if dtype is not None
                                else dk, rw=2), out
    return out


def _ev_block_folded(p, xf, slope, use_hin, dtype=None, q=None):
    """EVConvBlock (models/evhinet.py:82) in width-fold-2; returns
    (down_unfolded, merged_folded)."""
    down, out = _hin_block_folded(p, xf, slope, use_hin, down=True,
                                  dtype=dtype, q=q)
    return down, _conv_f(p["merge"], out, dtype, q)


def _conv_q(p, x, stride, padding, dtype, q, slope=None):
    """Unfolded conv, optionally int8 (serve/quant.py conv_int8)."""
    if q is not None and stride == 1:
        from refid_tpu.serve.quant import conv_int8
        return conv_int8(p, x, stride, padding, slope=slope,
                         out_dtype=dtype, cache=q)
    out = _conv(p, x, stride, padding, dtype=dtype)
    return out if slope is None else _lrelu(out, slope)


def _hin_block(p, x, slope, use_hin, filt=None, down=False, dtype=None,
               q=None):
    """Unfolded HINConvBlock for the lane-saturated 128/256ch scales."""
    from refid_tpu.models.evhinet import half_instance_norm, fac_bias
    out = _conv_q(p["conv1"], x, 1, 1, dtype, q)
    if use_hin:
        out = half_instance_norm(
            out, *_cast((p["hin_scale"], p["hin_bias"]), dtype))
    out = _lrelu(out, slope)
    out = _lrelu(_conv_q(p["conv2"], out, 1, 1, dtype, q), slope)
    out = out + _conv_q(p["identity"], x, 1, 0, dtype, q)
    if filt is not None:
        out = fac_bias(out, filt)
    if down:
        return _conv(p["down"], out, 2, 1, dtype=dtype), out
    return out


def evhinet_fast_forward(params, x, event, *, depth=3, fac_place=2,
                         hin_left=0, hin_right=4, relu_slope=0.2,
                         dtype=None, int8=False, qstate=None):
    """Width-folded serving forward == EVHINet(...).apply(params, x, event)
    (models/evhinet.py:141-194) for the shipped single-stage geometry
    (depth=3, fac_place=2: two folded full-res stages, unfolded scales
    1-2).  ``x`` (b,h,w,3), ``event`` (b,h,w,ev) or (b,t,h,w,c).

    ``int8`` routes the stride-1 block convs (conv1/conv2/identity/merge/
    skip) through int8 MXU arithmetic — NOT exact math, dB-gated in
    tests/test_evhinet_fast.py.  Modes follow serve/quant.py's quant-state
    protocol: True = dynamic per-tensor scales; "calib" = exact math,
    recording each site's amax into ``qstate``; "static" = calibrated
    scales consumed from ``qstate`` as HLO constants (no on-device amax
    reductions).  Downsample/transposed/SAM convs stay bf16."""
    assert depth == 3 and fac_place == 2, "folded path covers the " \
        "shipped EVHINet geometry; use model.apply for other shapes"
    assert int8 in (False, True, "calib", "static")
    if int8 in ("static", "calib"):
        assert qstate is not None, "int8='static'/'calib' needs qstate"
        if int8 == "calib":
            qstate["mode"] = "calib"
            qstate.setdefault("amax", [])
            q = qstate
        else:
            q = {"mode": "static", "amax": list(qstate["amax"]), "idx": 0}
    elif int8:
        q = {}
    else:
        q = None
    p = params["params"]
    if event.ndim == 5:
        b, t = event.shape[:2]
        event = jnp.concatenate([event[:, i] for i in range(t)], axis=-1)

    xf = space_to_depth(x, _R)
    evf = space_to_depth(event, _R)
    hin = lambda i: hin_left <= i <= hin_right

    # event encoder (stage 0 folded; stage 1 unfolded; dead stage 2 dropped)
    e = _conv_f(p["conv_ev1"], evf, dtype)
    e, merged0 = _ev_block_folded(p["ev_0"], e, relu_slope, hin(0), dtype,
                                  q=q)
    _, out1 = _hin_block(p["ev_1"], e, relu_slope, hin(1), down=True,
                         dtype=dtype, q=q)
    merged1 = _conv_q(p["ev_1"]["merge"], out1, 1, 0, dtype, q)

    # stage-1 encoder
    x1 = _conv_f(p["conv_01"], xf, dtype)
    x1, enc0_f = _hin_block_folded(p["down_0"], x1, relu_slope, hin(0),
                                   filt=merged0, down=True, dtype=dtype,
                                   q=q)
    x1, enc1 = _hin_block(p["down_1"], x1, relu_slope, hin(1),
                          filt=merged1, down=True, dtype=dtype, q=q)
    x1 = _hin_block(p["down_2"], x1, relu_slope, hin(2), dtype=dtype, q=q)

    # decoder: scale-1 unfolded, full-res stage folded end-to-end
    up = _conv_transpose_up(p["up_0"], x1, dtype)
    bridge = _conv_q(p["skip_0"], enc1, 1, 1, dtype, q)
    x1 = _hin_block(p["upblk_0"], jnp.concatenate([up, bridge], axis=-1),
                    relu_slope, use_hin=False, dtype=dtype, q=q)

    upk, upb = p["up_1"]["kernel"], p["up_1"]["bias"]
    up_f = conv_transpose_up_folded(
        x1, upk if dtype is None else upk.astype(dtype),
        upb if dtype is None else upb.astype(dtype),
        dtype=dtype, r_in=1, r_out=2)                   # fold-2, 64ch
    bridge_f = _conv_f(p["skip_1"], enc0_f, dtype, q)
    x1f = _hin_block_folded(p["upblk_1"],
                            fold_concat([up_f, bridge_f], 2),
                            relu_slope, use_hin=False, dtype=dtype, q=q)

    # SAM head: the single-stage forward returns only img = conv2(x)+x_img
    # (reference :163) — conv1/conv3/gate are serving-time dead code.
    # The add promotes like the model's (bf16 conv + f32 image -> f32).
    img_f = _conv_f(p["sam12"]["conv2"], x1f, dtype) + xf
    return depth_to_space(img_f, _R)


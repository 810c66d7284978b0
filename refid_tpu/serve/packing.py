"""Space-to-depth conv reparameterization for lane-padding pathologies.

TPU HBM layouts pad the channel (lane) dim to 128: a (720, 1280, 2) bf16
event frame physically occupies 64x its logical bytes, and the profiler
shows the 2-channel head conv running 20x off its roofline because of it
(scripts/profile_forward.py).  For any stride-1 conv whose input or output
channels are tiny, the EXACT same math can run on a space-to-depth packed
tensor (r*r channels per packed pixel) with a transformed kernel:

    y = conv(x, w)  <=>  s2d_r(y) = conv(s2d_r(x), W_r, padding=p_r)

where W_r[(A,B), (a,b,ci), (c,d,co)] gathers the taps of w whose original
offset lands in packed cell (A, B) at phase (a, b).  This multiplies MACs
(kernel footprint grows) but removes the 64x/43x padded traffic — a large
net win exactly where channels are small (event head: 2ch, prediction:
3ch), and a loss where channels are already >=64 (do NOT use it there).

Used by the packed serving mode in fast_forward.py.
"""

from __future__ import annotations

from contextlib import contextmanager

import numpy as np

import jax
import jax.numpy as jnp

__all__ = ["space_to_depth", "depth_to_space", "s2d_conv_kernel",
           "conv_s2d", "tap_wgrad_scope"]

_TAP_WGRAD = [False]


@contextmanager
def tap_wgrad_scope(on=True):
    """Within this (trace-time) scope, stride-1 convs issued by conv_s2d /
    fast_forward._conv use the per-tap dot_general weight-gradient VJP
    (serve/tapgrad.py) instead of XLA's wgrad convolution.  Forward math
    is identical; only the backward formulation changes."""
    prev = _TAP_WGRAD[0]
    _TAP_WGRAD[0] = on
    try:
        yield
    finally:
        _TAP_WGRAD[0] = prev


def _stride1_conv(xp, W, padding):
    if _TAP_WGRAD[0]:
        from refid_tpu.serve.tapgrad import conv_tapgrad
        return conv_tapgrad(xp, W, tuple(map(tuple, padding)))
    return jax.lax.conv_general_dilated(
        xp, W, (1, 1), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _strided_conv(xp, W, strides, padding):
    """Strided conv that picks up the per-tap wgrad VJP under the
    tap_wgrad scope (the down-conv sites conv_tapgrad's stride-1 form
    could not cover)."""
    if _TAP_WGRAD[0]:
        from refid_tpu.serve.tapgrad import conv_tapgrad_s
        return conv_tapgrad_s(xp, W, tuple(strides),
                              tuple(map(tuple, padding)))
    return jax.lax.conv_general_dilated(
        xp, W, tuple(strides), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _rr(r):
    return (r, r) if isinstance(r, int) else tuple(r)


def space_to_depth(x, r=2):
    """(b, h, w, c) -> (b, h/rh, w/rw, rh*rw*c); channel order (a, b, ci).
    ``r`` may be an int or (rh, rw) — (1, rw) is a pure width fold, which
    reaches 128-lane density without folding rows."""
    rh, rw = _rr(r)
    b, h, w, c = x.shape
    x = x.reshape(b, h // rh, rh, w // rw, rw, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // rh, w // rw,
                                                 rh * rw * c)


def depth_to_space(x, r=2):
    rh, rw = _rr(r)
    b, hp, wp, cp = x.shape
    c = cp // (rh * rw)
    x = x.reshape(b, hp, wp, rh, rw, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp * rh, wp * rw, c)


def s2d_conv_kernel(w, r=2):
    """Transform an HWIO stride-1 conv kernel (kh, kw, ci, co) with
    symmetric padding (kh//2, kw//2) into its s2d_r equivalent.

    Returns (W, padding): W is (KH, KW, rh*rw*ci, rh*rw*co), padding the
    explicit (lo, hi) pairs for the packed conv.
    """
    rh, rw = _rr(r)
    kh, kw, ci, co = w.shape
    ph, pw = kh // 2, kw // 2

    def taps(k, p, r_):
        offs = [(c_, u, (c_ + u - p) // r_, (c_ + u - p) % r_)
                for c_ in range(r_) for u in range(k)]
        amin = min(o[2] for o in offs)
        amax = max(o[2] for o in offs)
        return offs, amin, amax

    h_offs, a_min, a_max = taps(kh, ph, rh)
    w_offs, b_min, b_max = taps(kw, pw, rw)
    KH = a_max - a_min + 1
    KW = b_max - b_min + 1

    # jnp so ``w`` may be a tracer (params under jit); the scatter-adds are
    # tiny kernel-sized ops, folded or negligible at runtime
    W = jnp.zeros((KH, KW, rh * rw * ci, rh * rw * co), w.dtype)
    for c_, u, A, a in h_offs:
        for d_, v, B, b in w_offs:
            W = W.at[A - a_min, B - b_min,
                     (a * rw + b) * ci:(a * rw + b + 1) * ci,
                     (c_ * rw + d_) * co:(c_ * rw + d_ + 1) * co].add(
                         w[u, v])
    padding = ((-a_min, a_max), (-b_min, b_max))
    return W, padding


def plain_concat_perm(r, sizes):
    """Input-channel permutation that lets a folded conv consume a PLAIN
    ``jnp.concatenate(parts, -1)`` of width-folded tensors instead of the
    phase-major interleave of :func:`fold_concat` (a strided gather that
    costs ~0.5 ms per full-res trunk input at 256^2 — profile_train).

    ``sizes`` are the parts' ORIGINAL (unfolded) channel counts.  Returns
    ``perm`` (len r*sum(sizes)) such that ``W[:, :, perm, :]`` consumes
    channels ordered (part, phase, c) — the plain-concat order — where the
    un-permuted folded kernel expects (phase, part, c)."""
    rh, rw = _rr(r)
    nph = rh * rw
    total = sum(sizes)
    offs = np.cumsum([0] + list(sizes))[:-1]
    perm = []
    for p_, (c, o) in enumerate(zip(sizes, offs)):
        for a in range(nph):
            for j in range(c):
                perm.append(a * total + o + j)
    return np.asarray(perm, np.int32)


def conv_s2d(xp, w, bias=None, r=2, dtype=None, cache=None, in_perm=None,
             perm_tag=None):
    """Apply a stride-1 conv to an s2d_r-packed input, returning the packed
    output.  ``w`` is the ORIGINAL (kh, kw, ci, co) kernel.  ``cache``
    (a per-trace dict) memoizes the folded-kernel construction so the
    t-unrolled serving loop builds each kernel once, not per frame.
    ``in_perm`` permutes the folded kernel's input channels (exact;
    see :func:`plain_concat_perm`); pass ``perm_tag`` to key the cache."""
    if cache is not None:
        # the cached entry PINS ``w`` so its id cannot be recycled by the
        # garbage collector mid-trace (id-reuse would alias kernels)
        key = (id(w), _rr(r), perm_tag)
        hit = cache.get(key)
        if hit is None or hit[0] is not w:
            W_, padding_ = s2d_conv_kernel(w, r)
            if in_perm is not None:
                W_ = jnp.take(W_, in_perm, axis=2)
            hit = (w, W_, padding_)
            cache[key] = hit
        _, W, padding = hit
    else:
        W, padding = s2d_conv_kernel(w, r)
        if in_perm is not None:
            W = jnp.take(W, in_perm, axis=2)
    if dtype is not None:
        xp, W = xp.astype(dtype), W.astype(dtype)
    out = _stride1_conv(xp, W, padding)
    if bias is not None:
        rh, rw = _rr(r)
        b_packed = jnp.tile(bias, rh * rw)
        out = out + (b_packed.astype(dtype) if dtype is not None
                     else b_packed)
    return out


def fold_down_conv_kernel(w, rw=2, stride=2):
    """Stride-``stride`` conv (e.g. the 4x4/2 downsample) consuming a
    width-folded (1, rw) input and emitting an UNFOLDED output.

    Shift-invariance holds because stride == rw: out col q' reads orig cols
    [stride*q' - p .. + kw-1], whose fold-rw cells sit at fixed offsets of
    q'.  Returns (W, padding) with W (kh, KW, rw*ci, co).
    """
    kh, kw, ci, co = w.shape
    assert stride == rw, "folded stride conv requires stride == rw"
    # reference down conv is k=4 s=2 p=1 (models/layers.py conv2d(..., 4, 2,
    # 1)); odd k uses symmetric k//2 padding
    pw = 1 if kw == 4 else kw // 2
    offs = []
    for v in range(kw):
        r_ = v - pw  # orig col offset relative to stride*q'
        offs.append((v, r_ // rw, r_ % rw))
    bmin = min(o[1] for o in offs)
    bmax = max(o[1] for o in offs)
    KW = bmax - bmin + 1
    W = jnp.zeros((kh, KW, rw * ci, co), w.dtype)
    for v, B, b in offs:
        W = W.at[:, B - bmin, b * ci:(b + 1) * ci, :].add(w[:, v])
    # height stays an ordinary strided dim with its usual padding
    padding = ((1, 1) if kh == 4 else (kh // 2, kh // 2), (-bmin, bmax))
    return W, padding


def down_conv_folded(xf, w, rw=2, dtype=None):
    """Apply the reference 4x4/2 (or k/2) downsample conv to a width-folded
    input, producing the unfolded half-resolution output."""
    W, padding = fold_down_conv_kernel(w, rw=rw, stride=2)
    if dtype is not None:
        xf, W = xf.astype(dtype), W.astype(dtype)
    return _strided_conv(xf, W, (2, 1), padding)


def s2d_to_wfold(x):
    """(b, h/2, w/2, 4c) s2d(2,2) -> (b, h, w/2, 2c) width-fold-2.

    Channel order (a, b, ci): row phase a moves back to rows, column phase
    b stays folded.  One transpose; used to serve the packed head cache to
    the fold-2 pipeline without materializing a full-res 32-ch tensor.
    """
    b, hp, wp, cp = x.shape
    c = cp // 4
    x = x.reshape(b, hp, wp, 2, 2 * c)
    return x.transpose(0, 1, 3, 2, 4).reshape(b, hp * 2, wp, 2 * c)


def wfold_refold(x, r_from, r_to):
    """Change width-fold density: (b, h, w/rf, rf*c) -> (b, h, w/rt, rt*c).
    Pure reshape when rf == rt; lane<->width relayout otherwise."""
    b, h, wp, cp = x.shape
    c = cp // r_from
    x = x.reshape(b, h, wp * r_from, c)   # unfold (relayout)
    return space_to_depth(x, (1, r_to))


def fold_concat(parts, r):
    """Channel-concat width-folded tensors in PHASE-MAJOR order, so a
    folded kernel built from the concatenated weight lines up: output
    channels are [(phase 0, part0), (phase 0, part1), (phase 1, part0), ...]
    """
    cs = [p.shape[-1] // r for p in parts]
    out = []
    for ph in range(r):
        for p_, c in zip(parts, cs):
            out.append(p_[..., ph * c:(ph + 1) * c])
    return jnp.concatenate(out, axis=-1)


def up_fold_kernel(k_param, r_in=1, r_out=4):
    """Kernel for the fused 2x2/2 transposed conv mapping a width-fold-r_in
    input (b, H, W', r_in*ci) to the width-fold-r_out representation (with
    an extra packed row-phase) of the (2H, 2W, co) output.  Valid for
    r_out == 2 * r_in; r_in=1 pairs input columns via a kw=2/stride-2
    window instead of packed channels.  conv_transpose_up semantics
    (models/layers.py:221-238): param (kh, kw, out, in); empirically
    (tests) out[2p+r, 2q+s] uses param[r, s].T — channels swapped, spatials
    not flipped.  Output channel order (row-phase r, col-phase d, co)."""
    kh, kw, co, ci = k_param.shape
    assert kh == kw == 2
    ratio = r_out // max(r_in, 1)
    if ratio == 4:
        assert r_in == 1
        # kw=2/stride-2 window pairs the input columns; out fold 4
        W = jnp.zeros((1, 2, ci, 2 * 4 * co), k_param.dtype)
        for r_ in range(2):
            for d in range(4):
                s, wphase = d // 2, d % 2
                W = W.at[0, s, :,
                         (r_ * 4 + d) * co:(r_ * 4 + d + 1) * co].set(
                    jnp.transpose(k_param[r_, wphase]))
        return W
    assert ratio == 2
    W = jnp.zeros((1, 1, max(r_in, 1) * ci, 2 * r_out * co), k_param.dtype)
    for r_ in range(2):
        for d in range(r_out):
            in_phase, wphase = d // 2, d % 2
            W = W.at[0, 0, in_phase * ci:(in_phase + 1) * ci,
                     (r_ * r_out + d) * co:(r_ * r_out + d + 1) * co].set(
                jnp.transpose(k_param[r_, wphase]))
    return W


def conv_transpose_up_folded(x, k_param, bias, dtype=None, r_in=2,
                             r_out=None):
    """2x2 stride-2 transposed conv from a width-fold-r_in input to the
    width-fold-2*r_in output — the low-channel output tensor is never
    materialized unfolded.  Input at fold r_in >= 2 maps packed columns
    1:1 via a 1x1 kernel."""
    r_out = r_out or 2 * r_in
    W = up_fold_kernel(k_param, r_in=r_in, r_out=r_out)
    if dtype is not None:
        x, W = x.astype(dtype), W.astype(dtype)
    z = jax.lax.conv_general_dilated(
        x, W, (1, 1), [(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    b, hh, wq, cc = z.shape
    cor = cc // 2
    z = z.reshape(b, hh, wq, 2, cor).transpose(0, 1, 3, 2, 4)
    z = z.reshape(b, 2 * hh, wq, cor)
    if bias is not None:
        bp = jnp.tile(bias, r_out)
        z = z + (bp.astype(dtype) if dtype is not None else bp)
    return z


def conv_transpose_up_fold4(x, k_param, bias, dtype=None):
    """Unfolded (b, H, W, ci) -> width-fold-4 (b, 2H, W/2, 4*co): the kw=2
    stride-2 window pairs input columns; rows interleave via one
    reshape/transpose.  (This exact formulation measured fastest — see the
    fusion-fragility note in PERFORMANCE.md before touching the HLO.)"""
    W = up_fold_kernel(k_param, r_in=1, r_out=4)
    if dtype is not None:
        x, W = x.astype(dtype), W.astype(dtype)
    z = jax.lax.conv_general_dilated(
        x, W, (1, 2), [(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    b, hh, wq, cc = z.shape
    co4 = cc // 2
    z = z.reshape(b, hh, wq, 2, co4).transpose(0, 1, 3, 2, 4)
    z = z.reshape(b, 2 * hh, wq, co4)
    if bias is not None:
        bp = jnp.tile(bias, 4)
        z = z + (bp.astype(dtype) if dtype is not None else bp)
    return z


def fold_down_conv_kernel_f2out(w, rw=2):
    """4x4/2 downsample consuming width-fold-rw input and emitting a
    width-fold-2 output: out f2 col Q covers orig out cols 2Q, 2Q+1, i.e.
    orig in cols 4Q-1..4Q+4 -> in-f2 cells 2Q-1..2Q+2 (shift-invariant).
    Returns (W (kh, 4, rw*ci, 2*co), padding)."""
    kh, kw, ci, co = w.shape
    assert kw == 4 and rw == 2
    offs = []
    for d in range(2):          # out phase
        for v in range(4):      # orig tap
            r_ = 2 * d + v - 1  # orig in col offset from 4Q
            offs.append((d, v, r_ // rw, r_ % rw))
    bmin = min(o[2] for o in offs)
    bmax = max(o[2] for o in offs)
    W = jnp.zeros((kh, bmax - bmin + 1, rw * ci, 2 * co), w.dtype)
    for d, v, B, b in offs:
        W = W.at[:, B - bmin, b * ci:(b + 1) * ci,
                 d * co:(d + 1) * co].add(w[:, v])
    padding = ((1, 1), (-bmin, bmax))
    return W, padding


def down_conv_folded_f2out(xf, w, dtype=None, cache=None):
    """Width-folded downsample with width-fold-2 output (for consumers that
    stay folded, e.g. the folded EGACA at scale 1)."""
    if cache is not None:
        key = (id(w), "down_f2out")
        hit = cache.get(key)
        if hit is None or hit[0] is not w:
            hit = (w,) + fold_down_conv_kernel_f2out(w)
            cache[key] = hit
        _, W, padding = hit
    else:
        W, padding = fold_down_conv_kernel_f2out(w)
    if dtype is not None:
        xf, W = xf.astype(dtype), W.astype(dtype)
    return jax.lax.conv_general_dilated(
        xf, W, (2, 2), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def depthwise_folded_kernel(w_dw, r=2):
    """Dense width-fold-r kernel equivalent to a depthwise 3x3 conv with
    HWIO kernel (3, 3, 1, c).  The dense kernel is (3, KW, r*c, r*c) with
    nonzeros only where in-channel == out-channel (phase taps differ); the
    64x MAC inflation is irrelevant for these tiny bandwidth-bound ops."""
    kh, kw, one, c = w_dw.shape
    assert one == 1
    dense = jnp.zeros((kh, kw, c, c), w_dw.dtype)
    idx = jnp.arange(c)
    dense = dense.at[:, :, idx, idx].set(w_dw[:, :, 0, :])
    return dense

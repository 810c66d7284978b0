"""int8 band-resident Pallas kernels for the width-folded scale-0 trunk.

The honest e2e profile (PERFORMANCE.md round 4) puts ~300 ms of the 919 ms
720p window in the scale-0 folded full-res ops, already running at ~95
TF/s bf16 — above what a bf16 Pallas band kernel could add (~50 ms cap).
The transformative arithmetic is int8 on the MXU (394 TOPS): the round-4
rate probe (scripts/probe_band_conv.py) validated the band tap-matmul
design at 112.8 TF/s bf16, and these kernels run the same structure with
int8 taps and int32 accumulation.

Two kernels cover ConvResidualBlocks (models/recurrent.py trunk; the
folded serving twin is serve/fast_forward._trunk_folded):

* ``band_conv_in_int8`` — conv_in over concat([x, state]) + leaky 0.1.
  Takes the two halves as SEPARATE refs (the concat never materializes;
  the folded kernel's input-permuted halves multiply independently and
  sum — exact same math).
* ``band_resblock_int8`` — h + conv2(relu(conv1(h))): both convs, the
  relu, and the residual in ONE VMEM-resident pass; h is quantized
  in-kernel, h1 never leaves VMEM.

Quantization scheme matches serve/quant.py exactly (symmetric int8,
per-output-channel weight scales, per-tensor STATIC activation scales
from the same calibration sites conv_s2d_int8 consumes — site order is
unchanged, so pipeline.calibrate() artifacts serve both paths).  NOT
exact math: dB-gated like the XLA int8 path (tests/test_quant.py,
scripts/quant_db.py).

Layout discipline (the fused-EGACA v1/v2 lessons, PERFORMANCE.md round
4/5): kernel I/O keeps the natural (1, H, W, C) conv shapes; all refs are
lane-aligned (C = 128).  Row halos use the clamped prev/next row-ref
pattern (ops/egaca_fused.py phase A); rows are zero-padded by the wrapper
so no in-kernel edge masking is needed for height.  Width edges are
handled by masking the one wrapped column after each dx roll.

Reference being accelerated: recurrent_sub_modules.py ConvResidualBlocks
(the reference's per-step CUDA convs).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["band_conv_in_int8", "band_resblock_int8", "trunk_band_int8",
           "trunk_band_supported"]


def _quant_rows(x_f32, inv_scale):
    return jnp.clip(jnp.round(x_f32 * inv_scale), -127, 127).astype(jnp.int8)


def _col_mask(accd, W, C, edge):
    """Zero the wrapped column after a +-1 roll of a flattened (rows*W, C)
    accumulator: edge=0 masks column 0 (left tap), edge=W-1 masks the
    last column (right tap)."""
    col = jax.lax.broadcasted_iota(jnp.int32, accd.shape, 0) % W
    return jnp.where(col == edge, jnp.zeros_like(accd), accd)


def _tap_conv_int8(xq, w_ref, rows_out, W, C_in, C_out):
    """9-tap int8 conv on the flattened band: xq ((rows_out+2)*W, C_in)
    int8 (output row r reads xq rows r..r+2), w_ref (3, 3, C_in, C_out)
    int8 -> int32 (rows_out*W, C_out).  dy walks full rows (the flattened
    layout makes row offsets multiples of W); dx is a +-1 element roll
    with the wrapped column masked."""
    m = rows_out * W
    acc = jnp.zeros((m, C_out), jnp.int32)
    for dx in range(3):
        accd = jnp.zeros((m, C_out), jnp.int32)
        for dy in range(3):
            xs = jax.lax.slice(xq, (dy * W, 0), (dy * W + m, C_in))
            accd = accd + jax.lax.dot_general(
                xs, w_ref[dy, dx], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
        if dx != 1:
            accd = pltpu.roll(accd, (1 - dx) % m, axis=0)
            accd = _col_mask(accd, W, C_out, 0 if dx == 0 else W - 1)
        acc = acc + accd
    return acc


def _conv_in_kernel(xp2, xc, xn2, sp2, sc, sn2, w_ref, ws, bias, out,
                    *, B, W, C, sx_inv):
    """h = lrelu_0.1(conv3x3(concat[x, s]) + b) for B output rows.
    Row window: 1 halo row each side (xp2/xn2 carry (1, 1, W, C) each).
    The two halves are quantized with the SHARED static scale (== the
    calibrated CONCAT site) and channel-concatenated in VMEM, so each tap
    is one K=2C matmul.  ws: (1, C_out) f32 = per-out-channel weight
    scale x activation scale."""
    def stack(prev, cur, nxt):
        x = jnp.concatenate(
            [prev[0].reshape(1 * W, C), cur[0].reshape(B * W, C),
             nxt[0].reshape(1 * W, C)], axis=0)
        return _quant_rows(x.astype(jnp.float32), sx_inv)

    xq = jnp.concatenate([stack(xp2, xc, xn2), stack(sp2, sc, sn2)], axis=1)
    acc = _tap_conv_int8(xq, w_ref, B, W, 2 * C, C)
    y = acc.astype(jnp.float32) * ws[:] + bias[:]
    y = jnp.maximum(y, 0.1 * y)
    out[:] = y.astype(out.dtype).reshape(1, B, W, C)


def _resblock_kernel(hp, hc, hn, w1_ref, ws1, b1, w2_ref, ws2, b2, out,
                     *, B, W, C, sh_inv, sh1_inv, Hreal):
    """out = h + conv2(relu(conv1(h))) for B output rows.  conv1 needs
    h rows -2..B+1 (2-row halo each side: hp/hn are (1, 2, W, C)); h1
    lives only in VMEM.

    Composition subtlety: the exact math computes h1 only on rows
    [0, H) and zero-pads it for conv2 — the halo h1 rows this kernel
    computes beyond the image (where zero-padded h still contributes a
    bias + one real tap row) must be MASKED to zero, or the first/last
    output rows diverge from the XLA path."""
    i = pl.program_id(0)
    h = jnp.concatenate(
        [hp[0].reshape(2 * W, C), hc[0].reshape(B * W, C),
         hn[0].reshape(2 * W, C)], axis=0)
    hq = _quant_rows(h.astype(jnp.float32), sh_inv)
    acc1 = _tap_conv_int8(hq, w1_ref, B + 2, W, C, C)
    h1 = jnp.maximum(acc1.astype(jnp.float32) * ws1[:] + b1[:], 0.0)
    row = (i * B - 1) + jax.lax.broadcasted_iota(jnp.int32, h1.shape, 0) // W
    h1 = jnp.where((row >= 0) & (row < Hreal), h1, jnp.zeros_like(h1))
    h1q = _quant_rows(h1, sh1_inv)
    acc2 = _tap_conv_int8(h1q, w2_ref, B, W, C, C)
    y2 = acc2.astype(jnp.float32) * ws2[:] + b2[:]
    h_mid = jax.lax.slice(h, (2 * W, 0), ((B + 2) * W, C))
    out[:] = (h_mid.astype(jnp.float32) + y2).astype(out.dtype).reshape(
        1, B, W, C)


def _qkernel(k):
    """(3, 3, ci, co) -> (int8 kernel, (co,) f32 per-out-channel scale).
    Trace-time constants (params), folded or tiny at runtime."""
    kf = k.astype(jnp.float32)
    amax = jnp.max(jnp.abs(kf), axis=(0, 1, 2))
    scale = jnp.maximum(amax, 1e-12) / 127.0
    kq = jnp.clip(jnp.round(kf / scale), -127, 127).astype(jnp.int8)
    return kq, scale


def _pad_rows(x, halo, Hp, H):
    """(1, H, W, C) -> (1, halo + Hp + halo, W, C) zero row padding (Hp =
    H rounded up to the band) so halo loads are exact conv zero-padding."""
    return jnp.pad(x, ((0, 0), (halo, Hp - H + halo), (0, 0), (0, 0)))


def band_conv_in_int8(x, s, w, bias, s_cat, dtype=jnp.bfloat16, *, band=8,
                      interpret=False):
    """h = lrelu_0.1(conv3x3_fold([x, s]) + bias) with int8 tap matmuls.

    x, s: (1, H, W, C) with C = 128 (width-folded 64-channel pair);
    w: (3, 3, 2C, C) FOLDED kernel, input channels ordered [x-half,
    s-half] (plain-concat order — serve/packing.plain_concat_perm);
    s_cat: python float, the calibrated amax of the concat site.
    Returns (1, H, W, C) ``dtype``.
    """
    b, H, W, C = x.shape
    assert b == 1 and w.shape == (3, 3, 2 * C, C)
    B = band
    Hp = -(-H // B) * B
    halo = 1
    xp = _pad_rows(x.astype(dtype), halo, Hp, H)
    sp = _pad_rows(s.astype(dtype), halo, Hp, H)
    wq, wscale = _qkernel(w)
    sx = max(float(s_cat), 1e-12) / 127.0
    wsx = (wscale * sx).reshape(1, C).astype(jnp.float32)
    bias_r = bias.reshape(1, C).astype(jnp.float32)

    # halo blocks: with the wrapper's `halo`-row zero pad, band i's input
    # window is padded rows [i*B, i*B + B + 2) = prev row, B cur rows,
    # next row.  Block index maps are in units of the block shape.
    prev = pl.BlockSpec((1, 1, W, C), lambda i: (0, i * B, 0, 0),
                        memory_space=pltpu.VMEM)
    cur = pl.BlockSpec((1, B, W, C), lambda i: (0, i, 0, 0),
                       memory_space=pltpu.VMEM)
    nxt = pl.BlockSpec((1, 1, W, C), lambda i: (0, i * B + B + 1, 0, 0),
                       memory_space=pltpu.VMEM)
    # cur addresses the UNPADDED row range: rebuild it over the padded
    # tensor by slicing off the pad — simpler: cur over padded tensor
    # needs row offset i*B + 1, which is not a multiple of B.  Instead
    # pass the padded tensor to prev/next (1-row blocks index any row)
    # and the ORIGINAL tensor (row-padded to Hp only) to cur.
    xc = jnp.pad(x.astype(dtype), ((0, 0), (0, Hp - H), (0, 0), (0, 0)))
    sc = jnp.pad(s.astype(dtype), ((0, 0), (0, Hp - H), (0, 0), (0, 0)))

    def wspec(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda i: (0,) * nd,
                            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_conv_in_kernel, B=B, W=W, C=C, sx_inv=1.0 / sx),
        grid=(Hp // B,),
        in_specs=[prev, cur, nxt, prev, cur, nxt,
                  wspec((3, 3, 2 * C, C)), wspec((1, C)), wspec((1, C))],
        out_specs=pl.BlockSpec((1, B, W, C), lambda i: (0, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, Hp, W, C), dtype),
        interpret=interpret,
    )(xp, xc, xp, sp, sc, sp, wq, wsx, bias_r)
    return out[:, :H] if Hp != H else out


def band_resblock_int8(h, w1, b1, w2, b2, s_h, s_h1, dtype=jnp.bfloat16, *,
                       band=8, interpret=False):
    """h + conv2(relu(conv1(h))) with int8 tap matmuls; h1 never leaves
    VMEM.  h: (1, H, W, C), w1/w2: (3, 3, C, C) folded kernels; s_h, s_h1:
    calibrated amaxes of the h / h1 sites (python floats)."""
    b, H, W, C = h.shape
    assert b == 1 and w1.shape == (3, 3, C, C) and w2.shape == (3, 3, C, C)
    B = band
    Hp = -(-H // B) * B
    halo = 2
    hpad = _pad_rows(h.astype(dtype), halo, Hp, H)
    hc = jnp.pad(h.astype(dtype), ((0, 0), (0, Hp - H), (0, 0), (0, 0)))
    w1q, w1s = _qkernel(w1)
    w2q, w2s = _qkernel(w2)
    sh = max(float(s_h), 1e-12) / 127.0
    sh1 = max(float(s_h1), 1e-12) / 127.0
    ws1 = (w1s * sh).reshape(1, C).astype(jnp.float32)
    ws2 = (w2s * sh1).reshape(1, C).astype(jnp.float32)
    b1r = b1.reshape(1, C).astype(jnp.float32)
    b2r = b2.reshape(1, C).astype(jnp.float32)

    assert B % halo == 0
    prev = pl.BlockSpec((1, 2, W, C), lambda i: (0, i * (B // 2), 0, 0),
                        memory_space=pltpu.VMEM)
    cur = pl.BlockSpec((1, B, W, C), lambda i: (0, i, 0, 0),
                       memory_space=pltpu.VMEM)
    nxt = pl.BlockSpec((1, 2, W, C),
                       lambda i: (0, i * (B // 2) + (B // 2) + 1, 0, 0),
                       memory_space=pltpu.VMEM)

    def wspec(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda i: (0,) * nd,
                            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_resblock_kernel, B=B, W=W, C=C,
                          sh_inv=1.0 / sh, sh1_inv=1.0 / sh1, Hreal=H),
        grid=(Hp // B,),
        in_specs=[prev, cur, nxt,
                  wspec((3, 3, C, C)), wspec((1, C)), wspec((1, C)),
                  wspec((3, 3, C, C)), wspec((1, C)), wspec((1, C))],
        out_specs=pl.BlockSpec((1, B, W, C), lambda i: (0, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, Hp, W, C), dtype),
        interpret=interpret,
    )(hpad, hc, hpad, w1q, ws1, b1r, w2q, ws2, b2r)
    return out[:, :H] if Hp != H else out


def trunk_band_supported(x_f, s_f):
    """Geometry gate: batch 1, 128 folded lanes, height/width the kernels
    are tuned for (any even H; W >= 256 keeps the flattened row matmuls
    MXU-shaped)."""
    b, H, W, C = x_f.shape
    return b == 1 and C == 128 and s_f.shape == x_f.shape and W >= 256


def trunk_band_int8(p_fold, x_f, s_f, scales, dtype=jnp.bfloat16, *,
                    band=8, interpret=False):
    """ConvResidualBlocks (num_block=1) over width-folded [x, state] with
    int8 band kernels.  ``p_fold`` carries the FOLDED kernels:
    {"w0": (3,3,2C,C) plain-concat order, "b0": (C,), "w1", "b1", "w2",
    "b2"}; ``scales`` = (s_cat, s_h, s_h1) calibrated amaxes in
    serve/quant.py site order.  Returns (1, H, W, C) ``dtype``."""
    s_cat, s_h, s_h1 = scales
    h = band_conv_in_int8(x_f, s_f, p_fold["w0"], p_fold["b0"], s_cat,
                          dtype, band=band, interpret=interpret)
    return band_resblock_int8(h, p_fold["w1"], p_fold["b1"], p_fold["w2"],
                              p_fold["b2"], s_h, s_h1, dtype, band=band,
                              interpret=interpret)

"""Pallas fused ConvResidualBlocks trunk (v2 — production serving kernel).

Fuses the recurrent trunk that dominates the model (~70% of all forward
FLOPs live in the 6 per-step trunks; reference hot loop
XXNet_final_attenfusion_arch.py:172-216, trunk semantics
recurrent_sub_modules.py:646-678 + ResidualBlockNoBN):

    h0  = lrelu_0.1(conv3x3(concat(x, s), W_in) + b_in)   # 2C -> C
    h1  = relu(conv3x3(h0, W1) + b1)                      # C -> C
    out = h0 + conv3x3(h1, W2) + b2                       # residual

into ONE kernel over 2-D (row-band x col-band) tiles: each tile's
intermediates stay in VMEM across all three convs, so

  * the concat(x, state) tensor is never materialized (x and state are
    separate inputs; the first conv contracts each against its kernel
    slice),
  * h0/h1 never round-trip HBM,
  * the activations are epilogues, not standalone XLA passes,
  * there are no layout-conversion copies between the convs.

Each conv is 9 tap matmuls on the MXU (rank-3 dot_general keeps the
(rows, width, chan) layout; a 2-D reshape would force a relayout per tap).
Column alignment is done on the STORE side: tap (u, v)'s unshifted matmul
accumulates into a v-offset column window of the f32 accumulator — TPU
sublane shifts are only implemented for 32-bit data, so the bf16 activation
buffers are never column-shifted (v1 used pltpu.roll on the inputs, which
Mosaic rejects for bf16).  Row taps are outer-dim slices (free).  VMEM
stays bounded by a fori_loop over kernel rows with ref accumulation
(v1 unrolled all 27 taps and overflowed the 16 MB budget) plus column-band
tiling.

Compute dtype follows the inputs (bf16 serving / f32); accumulation is
always f32 like an XLA conv.  Inputs are host-padded by 3 (all three convs'
zero padding folded); intermediates are masked back to the true image
extent so conv bias cannot leak through padding.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_trunk", "fused_trunk_reference"]

_B = 2  # acc column base: out col o lives at acc col o + _B


def _roll_left_f32(t, v, interpret):
    if v == 0:
        return t
    if interpret:
        return jnp.roll(t, -v, axis=1)
    # left-shift by v == circular right-shift by (size - v); f32 only —
    # Mosaic implements sublane rotates for 32-bit data
    return pltpu.roll(t, t.shape[1] - v, axis=1)


def _conv_taps(reads, rows_out, wc, cout, interpret):
    """f32 (rows_out, wc, cout) = sum of 3x3 tap matmuls over the given
    (read_rows, w_ref) pairs; accumulation is a fori-loop VALUE carry (one
    VMEM temporary, no per-tap read-modify-write of a scratch ref).

    Tap (u, v): contrib_v[c] = rows[c] . w[u, v] belongs at out col c - v,
    i.e. the f32 contrib is rolled LEFT by v (wraparound lands at cols
    >= wc - 2, outside every downstream read window given wc >= bw + 8).
    """
    def one_pair(read_rows, w_ref, acc):
        def u_body(u, acc):
            rows = read_rows(u, rows_out)
            # fold rows into the matmul M dim: with tile-aligned wc this
            # reshape is layout-free (whole sublane groups concatenate) and
            # turns rows_out small matmuls into one (rows_out*wc, K, N)
            rows2 = rows.reshape(rows_out * wc, rows.shape[-1])
            for v in range(3):
                contrib = jnp.dot(rows2, w_ref[u, v],
                                  preferred_element_type=jnp.float32)
                contrib = contrib.reshape(rows_out, wc, contrib.shape[-1])
                acc = acc + _roll_left_f32(contrib, v, interpret)
            return acc
        return jax.lax.fori_loop(0, 3, u_body, acc)

    acc = jnp.zeros((rows_out, wc, cout), jnp.float32)
    for read_rows, w_ref in reads:
        acc = one_pair(read_rows, w_ref, acc)
    return acc


def _mask_to_image(t, row0, col0, off, height, width):
    """Zero entries outside the true image extent: local (r, c) maps to
    image (row0 + r - off, col0 + c - off)."""
    rows, wc, _ = t.shape
    r_img = jax.lax.broadcasted_iota(jnp.int32, (rows, wc), 0) + (row0 - off)
    c_img = jax.lax.broadcasted_iota(jnp.int32, (rows, wc), 1) + (col0 - off)
    ok = ((r_img >= 0) & (r_img < height) & (c_img >= 0) & (c_img < width))
    # cast before the minor-dim broadcast: Mosaic only supports non-no-op
    # minor-dim insertion for 32-bit types (not bool)
    return t * ok.astype(t.dtype)[..., None]


def _trunk_kernel(bh, bw, height, width, cdt, interpret,
                  x_hbm, s_hbm, w_in_ref, b_in_ref, w1_ref, b1_ref,
                  w2_ref, b2_ref, out_ref,
                  xbuf, sbuf, h0buf, h1buf, h0sh, sems):
    bi = pl.program_id(0)
    cj = pl.program_id(1)
    ncols = pl.num_programs(1)
    idx = bi * ncols + cj
    wc = xbuf.shape[-2]          # tile-aligned buffer width (>= bw + 8)
    cx = x_hbm.shape[-1]
    cout = h0buf.shape[-1]

    def tile_dma(slot, i, j):
        return (
            pltpu.make_async_copy(
                x_hbm.at[pl.ds(i * bh, bh + 6), pl.ds(j * bw, wc)],
                xbuf.at[slot], sems.at[slot, 0]),
            pltpu.make_async_copy(
                s_hbm.at[pl.ds(i * bh, bh + 6), pl.ds(j * bw, wc)],
                sbuf.at[slot], sems.at[slot, 1]),
        )

    # double-buffered input: warm up the first tile, then always kick off
    # tile idx+1 before waiting on tile idx
    @pl.when(idx == 0)
    def _():
        for dma in tile_dma(0, bi, cj):
            dma.start()

    nxt = idx + 1
    last = nxt >= pl.num_programs(0) * ncols

    @pl.when(jnp.logical_not(last))
    def _():
        for dma in tile_dma(nxt % 2, nxt // ncols, nxt % ncols):
            dma.start()

    slot = idx % 2
    for dma in tile_dma(slot, bi, cj):
        dma.wait()

    row0 = bi * bh
    col0 = cj * bw
    bias = lambda b: b[...].astype(jnp.float32)

    def ref_rows(ref, slot=None):
        if slot is None:
            return lambda u, n: ref[pl.ds(u, n)]
        return lambda u, n: ref[slot, pl.ds(u, n)]

    # conv_in over the two channel groups (concat never materialized)
    acc = _conv_taps([(ref_rows(xbuf, slot), w_in_ref.at[:, :, :cx]),
                      (ref_rows(sbuf, slot), w_in_ref.at[:, :, cx:])],
                     bh + 4, wc, cout, interpret)
    h0 = acc + bias(b_in_ref)
    h0 = jnp.maximum(h0, 0.1 * h0)                       # lrelu 0.1
    h0 = _mask_to_image(h0, row0, col0, 2, height, width)
    h0buf[...] = h0.astype(cdt)
    # residual operand: h0 shifted by (+2, +2) into the output frame; the
    # column roll happens on f32 (32-bit rotates only), rounding to the
    # same bf16 grid as h0buf
    h0sh[...] = _roll_left_f32(h0, 2, interpret)[2:2 + bh].astype(cdt)

    acc = _conv_taps([(ref_rows(h0buf), w1_ref)], bh + 2, wc, cout,
                     interpret)
    h1 = jnp.maximum(acc + bias(b1_ref), 0.0)            # relu
    h1buf[...] = _mask_to_image(h1, row0, col0, 1, height,
                                width).astype(cdt)

    acc = _conv_taps([(ref_rows(h1buf), w2_ref)], bh, wc, cout, interpret)
    out = acc + bias(b2_ref) + h0sh[...].astype(jnp.float32)
    out_ref[...] = out[:, :bw].astype(cdt)


def _pick_tile(w, cout, dtype_bytes, budget=15 * 1024 * 1024):
    """Choose (bh, bw) so the kernel's VMEM footprint fits the budget."""
    sub = 16 if dtype_bytes == 2 else 8

    def footprint(bh, bw):
        wc = -(-(bw + 8) // sub) * sub
        cpad = -(-cout // 128) * 128
        rows = bh + 4
        bufs = 2 * 2 * (bh + 6) * wc * 2 * cpad * dtype_bytes  # x+s, 2 slots
        hbuf = (2 * rows + bh) * wc * cpad * dtype_bytes       # h0, h1, h0sh
        out = 2 * bh * bw * cpad * dtype_bytes                 # pipelined out
        # fori-carry accumulator + contrib + rolled contrib, all f32
        live = 3 * rows * wc * cpad * 4
        return bufs + hbuf + out + live

    for bh, bw in ((32, 256), (32, 160), (16, 160), (16, 128), (8, 128),
                   (8, 64), (8, 32)):
        if bw <= w and footprint(bh, bw) <= budget:
            return bh, bw
    return 8, 32


@partial(jax.jit, static_argnames=("bh", "bw", "height", "width",
                                   "interpret"))
def _fused_trunk_padded(xp, sp, w_in, b_in, w1, b1, w2, b2,
                        bh, bw, height, width, interpret):
    hp = xp.shape[0] - 6
    cout = w_in.shape[-1]
    cdt = xp.dtype
    # tile-aligned buffer width: sublane tiling is 16 for bf16, 8 for f32.
    # Columns beyond bw+6 hold neighbor/pad data; their influence only flows
    # rightward through the store-side tap alignment, never into the
    # [_B, _B + bw) read-back window.
    sub = 16 if np.dtype(cdt).itemsize == 2 else 8
    wc = -(-(bw + 8) // sub) * sub
    ncols = (xp.shape[1] - (wc - bw)) // bw
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(hp // bh, ncols),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
        out_specs=pl.BlockSpec((bh, bw, cout), lambda i, j: (i, j, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, bh + 6, wc, xp.shape[-1]), cdt),   # x slots
            pltpu.VMEM((2, bh + 6, wc, sp.shape[-1]), cdt),   # state slots
            pltpu.VMEM((bh + 4, wc, cout), cdt),              # h0
            pltpu.VMEM((bh + 2, wc, cout), cdt),              # h1
            pltpu.VMEM((bh, wc, cout), cdt),                  # h0 shifted
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    return pl.pallas_call(
        partial(_trunk_kernel, bh, bw, height, width, cdt, interpret),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((hp, ncols * bw, cout), cdt),
        interpret=interpret,
    )(xp, sp, w_in, b_in, w1, b1, w2, b2)


def fused_trunk(x, state, w_in, b_in, w1, b1, w2, b2,
                tile=None, interpret: bool = False):
    """Fused trunk over separate inputs: (h, w, Cx) + (h, w, Cs) -> (h, w, C)
    with kernels (3, 3, Cx+Cs, C) / (3, 3, C, C) HWIO.  Compute dtype = the
    input dtype (bf16 or f32); accumulation f32."""
    h, w, cx = x.shape
    cdt = x.dtype
    cout = w_in.shape[-1]
    # Mosaic manual DMA slices of HBM memrefs must match the (8/16, 128)
    # tiling, so channel dims are lane-padded to 128 with zeros (exact math:
    # zero weights in, zero activations out; K/N below 128 waste the same
    # MXU columns anyway).
    lane = 128
    if cx < lane or cout < lane:
        def cpadded(a, n):
            return jnp.pad(a, [(0, 0)] * (a.ndim - 1) + [(0, n - a.shape[-1])])
        cs = state.shape[-1]
        cxp = max(cx, lane)
        csp = max(cs, lane)
        coutp = max(cout, lane)
        w_x = jnp.pad(w_in[:, :, :cx],
                      ((0, 0), (0, 0), (0, cxp - cx), (0, coutp - cout)))
        w_s = jnp.pad(w_in[:, :, cx:],
                      ((0, 0), (0, 0), (0, csp - cs), (0, coutp - cout)))
        out = fused_trunk(
            cpadded(x, cxp), cpadded(state, csp),
            jnp.concatenate([w_x, w_s], axis=2), cpadded(b_in, coutp),
            jnp.pad(w1, ((0, 0), (0, 0), (0, coutp - cout),
                         (0, coutp - cout))), cpadded(b1, coutp),
            jnp.pad(w2, ((0, 0), (0, 0), (0, coutp - cout),
                         (0, coutp - cout))), cpadded(b2, coutp),
            tile=tile, interpret=interpret)
        return out[..., :cout]
    if tile is None:
        tile = _pick_tile(w, w_in.shape[-1], np.dtype(cdt).itemsize)
    bh, bw = tile
    sub = 16 if np.dtype(cdt).itemsize == 2 else 8
    wc = -(-(bw + 8) // sub) * sub
    hp = -(-h // bh) * bh
    wp = -(-w // bw) * bw
    # width needs (ncols-1)*bw + wc total padded columns (the last tile's
    # aligned buffer reads past wp + 6)
    pad = ((3, 3 + hp - h), (3, (wp - bw + wc) - w - 3), (0, 0))
    out = _fused_trunk_padded(
        jnp.pad(x, pad), jnp.pad(state, pad),
        w_in, b_in, w1, b1, w2, b2,
        bh=bh, bw=bw, height=h, width=w, interpret=interpret)
    return out[:h, :w]


def fused_trunk_reference(x, state, w_in, b_in, w1, b1, w2, b2):
    """XLA reference of the same math (the unfused trunk)."""
    def conv(x, k, b):
        return jax.lax.conv_general_dilated(
            x[None], k, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))[0] + b

    x_cat = jnp.concatenate([x, state], axis=-1)
    h0 = conv(x_cat, w_in, b_in)
    h0 = jnp.maximum(h0, 0.1 * h0)
    h1 = jnp.maximum(conv(h0, w1, b1), 0.0)
    return h0 + conv(h1, w2, b2)

"""Pallas prototype: fused ConvResidualBlocks trunk.

Fuses the recurrent trunk that dominates the scan step —

    h0  = lrelu_0.1(conv3x3(x_cat, W_in) + b_in)       # 2C -> C
    h1  = relu(conv3x3(h0, W1) + b1)                   # C -> C
    out = h0 + conv3x3(h1, W2) + b2                    # ResidualBlockNoBN

— into ONE kernel: each row band stays in VMEM across all three convs, so
the intermediates never round-trip HBM and XLA's inter-conv layout copies
(PERFORMANCE.md: ~23% of a forward) disappear for this chain.

Convs are computed as 9 tap matmuls on the MXU; column shifts use
``pltpu.roll`` (wrapped columns land beyond the valid width and are never
read); row shifts are free leading-dim slices.  The host pads H and W by 3
(zero padding of all three convs folded into one).

Status: PROTOTYPE — numerics verified against the XLA trunk (< 1e-5,
interpret mode, tests/test_fused_trunk.py), but the TPU compile currently
exceeds the 16MB scoped-VMEM budget: Mosaic keeps all 27 unrolled tap
temporaries live (~28MB at width 262; raising vmem_limit_bytes to 100MB
crashed the TPU worker).  Round-2 fix, in order: (1) fori_loop over taps
with a scratch accumulator so temporaries are reused, (2) column-band
tiling with halo DMA for wide images, (3) then wire into the scan step.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_trunk", "fused_trunk_reference"]


def _conv3x3_taps(buf, kernel, bias, rows_out, interpret):
    """buf (R, Wp, Cin) -> (rows_out, Wp, Cout); cols >= valid shift garbage
    rightward only (callers track the valid width)."""
    wp = buf.shape[1]
    cout = kernel.shape[-1]
    acc = jnp.zeros((rows_out, wp, cout), jnp.float32)
    for u in range(3):
        rows = buf[u:u + rows_out]
        for v in range(3):
            if v and not interpret:
                # pltpu.roll needs a non-negative shift: left-shift by v ==
                # circular right-shift by (size - v)
                shifted = pltpu.roll(rows, rows.shape[1] - v, axis=1)
            else:  # interpret mode / v==0: jnp.roll is portable
                shifted = jnp.roll(rows, -v, axis=1) if v else rows
            # rank-3 contraction over the lane (channel) dim — a reshape
            # to 2-D would merge the sublane dim and force a relayout copy
            # per tap
            acc += jax.lax.dot_general(
                shifted, kernel[u, v],
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    return acc + bias


def _mask_to_image(t, band_row0, row_off, col_off, height, width):
    """Zero entries outside the true image extent: local row r maps to image
    row band_row0 + r - row_off, local col w to image col w - col_off.
    (Chained VALID convs over a pre-padded input would otherwise leak conv
    bias through the padding — intermediate padding must be exactly zero.)"""
    rows, wp, _ = t.shape
    r_img = jax.lax.broadcasted_iota(jnp.int32, (rows, wp), 0) + (
        band_row0 - row_off)
    c_img = jax.lax.broadcasted_iota(jnp.int32, (rows, wp), 1) - col_off
    ok = ((r_img >= 0) & (r_img < height) & (c_img >= 0) & (c_img < width))
    # cast before the minor-dim broadcast: Mosaic only supports non-no-op
    # minor-dim insertion for 32-bit types (not bool)
    return t * ok.astype(t.dtype)[..., None]


def _trunk_kernel(bh: int, width: int, height: int, interpret: bool,
                  x_hbm, w_in_ref, b_in_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                  out_ref, x_vmem, sem):
    band = pl.program_id(0)

    dma = pltpu.make_async_copy(
        x_hbm.at[pl.ds(band * bh, bh + 6)], x_vmem, sem)
    dma.start()
    dma.wait()

    h0 = _conv3x3_taps(x_vmem[...], w_in_ref[...], b_in_ref[...],
                       bh + 4, interpret)
    h0 = jnp.maximum(h0, 0.1 * h0)                     # lrelu 0.1
    h0 = _mask_to_image(h0, band * bh, 2, 2, height, width)
    h1 = jnp.maximum(_conv3x3_taps(h0, w1_ref[...], b1_ref[...],
                                   bh + 2, interpret), 0.0)
    h1 = _mask_to_image(h1, band * bh, 1, 1, height, width)
    # residual: h0 at the OUTPUT's coordinates is shifted by (+2, +2) in the
    # local valid-region indexing (two valid-conv offsets)
    res = h0[2:2 + bh]
    res = (pltpu.roll(res, res.shape[1] - 2, axis=1) if not interpret
           else jnp.roll(res, -2, axis=1))
    out = res + _conv3x3_taps(h1, w2_ref[...], b2_ref[...], bh, interpret)
    out_ref[...] = out[:, :width, :]


@partial(jax.jit, static_argnames=("bh", "height", "interpret"))
def _fused_trunk_padded(xp, w_in, b_in, w1, b1, w2, b2, bh, height,
                        interpret):
    hp, wp, _ = xp.shape
    h = hp - 6      # band-padded height (grid extent)
    width = wp - 6
    cout = w_in.shape[-1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(h // bh,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
        out_specs=pl.BlockSpec((bh, width, cout), lambda i: (i, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((bh + 6, wp, xp.shape[-1]), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        partial(_trunk_kernel, bh, width, height, interpret),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((h, width, cout), jnp.float32),
        interpret=interpret,
    )(xp, w_in, b_in, w1, b1, w2, b2)


def fused_trunk(x_cat, w_in, b_in, w1, b1, w2, b2, bh: int = 16,
                interpret: bool = False):
    """x_cat (h, w, 2C) concatenated input; kernels (3,3,cin,cout) HWIO.
    Returns (h, w, C).  h is padded to a band multiple internally."""
    h, w, _ = x_cat.shape
    hp = -(-h // bh) * bh
    xp = jnp.pad(x_cat, ((3, 3 + hp - h), (3, 3), (0, 0)))
    out = _fused_trunk_padded(xp, w_in, b_in, w1, b1, w2, b2,
                              bh=bh, height=h, interpret=interpret)
    return out[:h]


def fused_trunk_reference(x_cat, w_in, b_in, w1, b1, w2, b2):
    """XLA reference of the same math (the unfused trunk)."""
    def conv(x, k, b):
        return jax.lax.conv_general_dilated(
            x[None], k, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))[0] + b

    h0 = conv(x_cat, w_in, b_in)
    h0 = jnp.maximum(h0, 0.1 * h0)
    h1 = jnp.maximum(conv(h0, w1, b1), 0.0)
    return h0 + conv(h1, w2, b2)

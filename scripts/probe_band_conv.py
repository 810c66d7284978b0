"""MXU rate probe for the band-resident folded-conv engine (round 4).

Question being measured: can a Pallas kernel stream the width-folded
3x3 conv's 9 tap matmuls ((M,128)@(128,128), f32 accum) at a higher MXU
rate than XLA's in-situ conv_general_dilated (86-94 TF/s at the
(720,640,128) serving geometry — PERFORMANCE.md round-3 geometry bench)?
The whole-step VMEM-resident band engine (VERDICT round-4 item 1) only
wins if this streaming rate is materially higher; if it probes at
~90-100 TF/s the engine is refuted by measurement.

Variants:
  * tap_roll   — correct dx handling: per-dx accumulation + f32 sublane
                 roll (2 rolls/conv), edge rows dropped (band interior
                 only; the real kernel would halo-DMA instead)
  * tap_noroll — same 9 matmuls, no rolls (WRONG math; isolates roll cost)
  * xla_conv   — jax.lax.conv_general_dilated on the same folded shape
                 (the in-situ baseline, same harness)

Timing: N iterations chained through the input inside one jitted
fori_loop (anti-LICM: input perturbed by iteration-dependent epsilon),
scalar fetch as the completion barrier, 1-iter run subtracted.
"""

import argparse
import functools
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H, WP, C = 720, 648, 128  # folded serving geometry, width padded 640->648


def band_conv(x, w, band=8, rolls=True, interpret=False):
    """x (H, WP, C) bf16; w (3, 3, C, C) bf16 -> (H, WP, C) bf16.
    Interior-only correctness (rows 1..band-2 of each band; edge rows are
    zero) — this is a RATE probe, not the production kernel."""
    H, WP, C = x.shape
    m2 = (band - 2) * WP

    def kernel(x_ref, w_ref, o_ref):
        x2 = x_ref[:].reshape(band * WP, C)
        acc = jnp.zeros((m2, C), jnp.float32)
        for dx in range(3):
            accd = jnp.zeros((m2, C), jnp.float32)
            for dy in range(3):
                xs = jax.lax.slice(x2, (dy * WP, 0), (dy * WP + m2, C))
                accd = accd + jax.lax.dot_general(
                    xs, w_ref[dy, dx], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            if rolls and dx != 1:
                accd = pltpu.roll(accd, (1 - dx) % m2, axis=0)
            acc = acc + accd
        out = jnp.maximum(acc, 0.1 * acc).astype(jnp.bfloat16)
        o_ref[:] = jnp.pad(out, ((WP, WP), (0, 0))).reshape(band, WP, C)

    return pl.pallas_call(
        kernel,
        grid=(H // band,),
        in_specs=[
            pl.BlockSpec((band, WP, C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, C, C), lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((band, WP, C), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((H, WP, C), jnp.bfloat16),
        interpret=interpret,
    )(x, w)


def band_conv_int8(x, w, band=8, rolls=True, interpret=False,
                   in_int8=False):
    """int8-tap variant of the rate probe: x (H, WP, C) bf16 (quantized
    to int8 IN-KERNEL with a static scale, as the production engine
    would) or int8 with ``in_int8``; w (3, 3, C, C) int8 (pre-quantized,
    per-tensor scale folded into the epilogue).  int32 tap accumulation
    on the MXU (394 TOPS peak vs 197 bf16), bf16 out.  Interior-only
    correctness — RATE probe."""
    H, WP, C = x.shape
    m2 = (band - 2) * WP
    sx = jnp.float32(0.05)  # static activation scale (calibration stand-in)
    sw = jnp.float32(0.01)

    def kernel(x_ref, w_ref, o_ref):
        if in_int8:
            xq = x_ref[:].reshape(band * WP, C)
        else:
            xf = x_ref[:].reshape(band * WP, C).astype(jnp.float32)
            xq = jnp.clip(jnp.round(xf * (1.0 / sx)),
                          -127, 127).astype(jnp.int8)
        acc = jnp.zeros((m2, C), jnp.int32)
        for dx in range(3):
            accd = jnp.zeros((m2, C), jnp.int32)
            for dy in range(3):
                xs = jax.lax.slice(xq, (dy * WP, 0), (dy * WP + m2, C))
                accd = accd + jax.lax.dot_general(
                    xs, w_ref[dy, dx], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
            if rolls and dx != 1:
                accd = pltpu.roll(accd, (1 - dx) % m2, axis=0)
            acc = acc + accd
        out = acc.astype(jnp.float32) * (sx * sw)
        out = jnp.maximum(out, 0.1 * out).astype(jnp.bfloat16)
        o_ref[:] = jnp.pad(out, ((WP, WP), (0, 0))).reshape(band, WP, C)

    return pl.pallas_call(
        kernel,
        grid=(H // band,),
        in_specs=[
            pl.BlockSpec((band, WP, C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, C, C), lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((band, WP, C), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((H, WP, C), jnp.bfloat16),
        interpret=interpret,
    )(x, w)


def xla_conv(x, w):
    return jax.lax.conv_general_dilated(
        x[None], w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))[0]


def xla_conv_int8(x, w):
    """XLA int8 conv baseline: pre-quantized int8 operands, int32 accum
    (what serve/quant.py conv_s2d_int8 issues after its quantize pass)."""
    y = jax.lax.conv_general_dilated(
        x[None], w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)[0]
    out = y.astype(jnp.float32) * jnp.float32(0.05 * 0.01)
    return jnp.maximum(out, 0.1 * out).astype(jnp.bfloat16)


def timed(fn, x, w, iters):
    @jax.jit
    def loop(x, w):
        def body(i, carry):
            xc, s = carry
            o = fn(xc, w)
            s2 = o.astype(jnp.float32)[0, 0, 0]
            # anti-LICM: chain the input through the previous output's
            # scalar.  The perturbation is exactly zero at runtime (1e-30
            # scaling underflows f32 relative precision / truncates to 0
            # in int8) but is not foldable at compile time.
            if x.dtype == jnp.int8:
                xp = (x + (s2 * 1e-30).astype(jnp.int8)).astype(jnp.int8)
            else:
                xp = (x.astype(jnp.float32) * (1.0 + s2 * 1e-30)).astype(
                    x.dtype)
            return (xp, s2)
        return jax.lax.fori_loop(0, iters, body,
                                 (x, jnp.float32(0.0)))[1]

    # byte-unique timed dispatches: the relay may serve byte-identical
    # dispatches from cache, which would time nothing.  (For int8 inputs
    # a +k nudge changes bytes exactly; for floats k*1e-6.)
    def nudge(k):
        if x.dtype == jnp.int8:
            return x + jnp.int8(k)
        return x + jnp.asarray(k * 1e-6, x.dtype)

    float(loop(x, w))  # compile + warm
    t0 = time.perf_counter()
    float(loop(nudge(1), w))
    t_n = time.perf_counter() - t0

    @jax.jit
    def one(x, w):
        return fn(x * 1.0, w)[0, 0, 0]

    float(one(x, w))
    t0 = time.perf_counter()
    float(one(nudge(2), w))
    t_1 = time.perf_counter() - t0
    return (t_n - t_1) / (iters - 1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--band", type=int, default=8)
    ap.add_argument("--iters", type=int, default=32)
    ap.add_argument("--variants", nargs="*",
                    default=["tap_roll", "tap_noroll", "xla_conv"],
                    help="tap_roll tap_noroll xla_conv int8_roll "
                         "int8_noroll int8_pre xla_int8")
    ap.add_argument("--interpret", action="store_true")
    args = ap.parse_args()

    rng = np.random.RandomState(0)
    h, wp = (4 * args.band, 40) if args.interpret else (H, WP)
    x = jnp.asarray(rng.randn(h, wp, C).astype(np.float32),
                    jnp.bfloat16)
    w = jnp.asarray(0.05 * rng.randn(3, 3, C, C).astype(np.float32),
                    jnp.bfloat16)

    if args.interpret:
        # numerics sanity vs XLA conv on the interior rows of one band
        got = np.asarray(band_conv(x, w, band=args.band, rolls=True,
                                   interpret=True), np.float32)
        y = xla_conv(x, w)
        ref = np.asarray(jnp.maximum(y, 0.1 * y), np.float32)
        b = args.band
        rows = slice(b + 1, 2 * b - 1)  # interior of band 1
        err = np.abs(got[rows, 1:-1] - ref[rows, 1:-1]).max()
        print(f"interior max err vs XLA: {err:.2e}")
        assert err < 0.15, "band_conv tap math does not match XLA conv"
        return

    wq = jnp.clip(jnp.round(w.astype(jnp.float32) / 0.01),
                  -127, 127).astype(jnp.int8)
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / 0.05),
                  -127, 127).astype(jnp.int8)
    for name in args.variants:
        xi, wi = x, w
        if name == "xla_conv":
            fn = xla_conv
            flop_rows = H * WP
        elif name == "xla_int8":
            fn, xi, wi = xla_conv_int8, xq, wq
            flop_rows = H * WP
        elif name.startswith("int8"):
            kind = name.split("_", 1)[1]  # roll | noroll | pre
            fn = functools.partial(band_conv_int8, band=args.band,
                                   rolls=(kind != "noroll"),
                                   in_int8=(kind == "pre"))
            wi = wq
            if kind == "pre":
                xi = xq
            flop_rows = (720 // args.band) * (args.band - 2) * WP
        else:
            fn = functools.partial(band_conv, band=args.band,
                                   rolls=(name == "tap_roll"))
            flop_rows = (720 // args.band) * (args.band - 2) * WP
        dt = timed(fn, xi, wi, args.iters)
        tf = 9 * flop_rows * C * C * 2 / dt / 1e12
        print(f"{name:12s} band={args.band:3d}: {dt*1e3:7.3f} ms  "
              f"{tf:6.1f} TF/s")


if __name__ == "__main__":
    main()

"""Isolate the Pallas layout-poisoning mechanism (rounds 4-5: BOTH fused
EGACA variants lose ~400 ms e2e while winning their own region — the
scale-0 folded trunk convs around them demote from ~95 TF/s conv-fusions
to 16.5 TF/s loop fusions with {3,0,2,1:T(2,128)(2,1)} layouts).

Mini-graph replicating the scale-0/scale-1 structure at full serving
geometry, chained over a few steps:

    e (1,720,640,128) --3x3 trunk convs (XLA)--> h --4x4/2 down--> d
    (1,360,640,64) --[VARIANT op]--> back up (broadcast-add into e')

Variants for the scale-1 op:
  xla       — elementwise x*2+1 in XLA (baseline; trunk convs must run
              as conv-fusions)
  pallas    — a TRIVIAL pallas passthrough kernel (x*2+1).  If this alone
              reproduces the poisoning, the mechanism is the custom-call
              boundary itself, not the EGACA kernel's internals.
  barrier   — pallas + jax.lax.optimization_barrier on its operand+result
  convert   — pallas + f32 round-trip on operand+result (forces a
              materialized convert between the conv graph and the kernel)
  copyop    — pallas + explicit copy via reshape-transpose pair

Timing: anti-LICM fori harness, scalar fetch, 1-iter dispatch subtracted.
A poisoned run shows ~3-4x the baseline step time.
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/refid_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

H, W, C = 720, 640, 128


def _passthrough_kernel(x_ref, o_ref):
    o_ref[:] = x_ref[:] * 2.0 + 1.0


def pallas_op(d, band=8):
    b, h, w, c = d.shape
    spec = pl.BlockSpec((1, band, w, c), lambda i: (0, i, 0, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _passthrough_kernel, grid=(h // band,), in_specs=[spec],
        out_specs=spec, out_shape=jax.ShapeDtypeStruct(d.shape, d.dtype),
    )(d)


def tiny_pallas(d):
    """Pallas on a TINY (8, 128) slice, result folded back in: keeps a
    custom-call in the graph with negligible VMEM footprint.  If this
    alone poisons, the mechanism is the custom-call's PRESENCE (layout /
    fusion-pass global effects); if not, it is resource (VMEM) pressure
    scaling with the kernel's block sizes."""
    s = d[0, :8, :128, 0]
    spec = pl.BlockSpec((8, 128), lambda: (0, 0), memory_space=pltpu.VMEM)
    o = pl.pallas_call(
        lambda x_ref, o_ref: o_ref.__setitem__(
            slice(None), x_ref[:] * 2.0 + 1.0),
        in_specs=[spec], out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((8, 128), d.dtype))(s)
    return d.at[0, :8, :128, 0].set(o)


def make_step(variant, params):
    w1, w2, w3, wd, wu = params

    def scale1(d):
        if variant == "xla":
            return d * 2.0 + 1.0
        if variant == "pallas":
            return pallas_op(d)
        if variant.startswith("pallas_b"):
            return pallas_op(d, band=int(variant[8:]))
        if variant == "tiny":
            return tiny_pallas(d * 2.0 + 1.0)
        if variant == "barrier":
            (d,) = jax.lax.optimization_barrier((d,))
            o = pallas_op(d)
            (o,) = jax.lax.optimization_barrier((o,))
            return o
        if variant == "convert":
            o = pallas_op(d.astype(jnp.float32).astype(jnp.bfloat16))
            return o.astype(jnp.float32).astype(jnp.bfloat16)
        raise ValueError(variant)

    def conv(x, w, strides=(1, 1), padding=((1, 1), (1, 1))):
        return jax.lax.conv_general_dilated(
            x, w, strides, padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def step(e):
        h1 = conv(e, w1)
        h1 = jnp.maximum(h1, 0.1 * h1)
        h2 = jax.nn.relu(conv(h1, w2))
        h3 = h1 + conv(h2, w3)
        d = conv(h3, wd, (2, 1), ((1, 1), (1, 1)))     # (1,360,640,64)
        d = scale1(d)
        up = conv(d, wu)                                # 64 -> 256
        up2 = up.reshape(1, 360, 640, 2, 128).sum(3)    # cheap upmix
        e2 = h3 + jnp.concatenate(
            [up2, jnp.flip(up2, axis=1)], axis=1)[:, :H]
        return e2.astype(jnp.bfloat16)

    return step


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", nargs="*",
                    default=["xla", "pallas", "barrier", "convert"])
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--iters", type=int, default=16)
    args = ap.parse_args()

    rng = np.random.RandomState(0)
    e0 = jnp.asarray(rng.randn(1, H, W, C).astype(np.float32), jnp.bfloat16)
    params = tuple(
        jnp.asarray(0.05 * rng.randn(*s).astype(np.float32), jnp.bfloat16)
        for s in [(3, 3, C, C), (3, 3, C, C), (3, 3, C, C),
                  (4, 3, C, 64), (3, 3, 64, 256)])

    for variant in args.variants:
        step = make_step(variant, params)

        @jax.jit
        def loop(e0, iters):
            def body(_, carry):
                e, s = carry
                for _ in range(args.steps):
                    e = step(e)
                s2 = e.astype(jnp.float32)[0, 0, 0, 0]
                e = (e0.astype(jnp.float32) * (1.0 + s2 * 1e-30)).astype(
                    jnp.bfloat16)
                return (e, s2)
            return jax.lax.fori_loop(
                0, iters, body, (e0, jnp.float32(0.0)))[1]

        calls = [0]

        def run(k):
            # byte-unique dispatches: the relay may serve byte-identical
            # dispatches from cache, which would time nothing
            calls[0] += 1
            t0 = time.perf_counter()
            float(loop(e0 + jnp.float32(calls[0] * 1e-6), jnp.int32(k)))
            return time.perf_counter() - t0

        t_compile = run(1)
        d1 = run(1)
        dt = (run(args.iters + 1) - d1) / args.iters
        print(f"{variant:8s}: {dt / args.steps * 1e3:7.3f} ms/step "
              f"(compile+load {t_compile:.0f}s)", flush=True)


if __name__ == "__main__":
    main()

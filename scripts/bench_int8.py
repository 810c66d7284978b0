"""Micro-benchmark: isolated conv in bf16 vs int8 on the real TPU.

Shapes = the model's MXU-peak sites (scale-1/2 trunk convs at 720p).
Validates that int8 conv actually clears the bf16 rate (v5e: 394 TOPS vs
197 TFLOP/s) BEFORE integrating int8 into the serving path, and measures
the dynamic-quantization overhead (amax + round/cast passes).

Usage: python scripts/bench_int8.py
"""

import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/refid_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

SHAPES = [  # (h, w, cin, cout) — model hot sites at 720p
    (360, 640, 256, 128),   # scale-1 trunk conv_in
    (360, 640, 128, 128),   # scale-1 resblock convs
    (180, 320, 512, 256),   # scale-2 trunk conv_in
    (180, 320, 256, 256),   # scale-2 / bottleneck convs
]


def timed(fn, args, iters=30):
    @partial(jax.jit, static_argnums=(1,))
    def loop(args, n):
        def body(_, carry):
            x, s = carry
            out = fn(x, *args[1:])
            s = jnp.sum(out.astype(jnp.float32)[0, 0, :8])
            x = (args[0].astype(jnp.float32) + s * 1e-20).astype(args[0].dtype)
            return (x, s)
        return jax.lax.fori_loop(0, n, body, (args[0], jnp.float32(0)))[1]

    float(loop(args, 1))
    t0 = time.perf_counter(); float(loop(args, 1))
    d1 = time.perf_counter() - t0
    float(loop(args, iters + 1))
    t0 = time.perf_counter(); float(loop(args, iters + 1))
    return (time.perf_counter() - t0 - d1) / iters


def main():
    from refid_tpu.serve.quant import conv_int8, quantize_kernel
    rng = np.random.RandomState(0)
    for h, w, ci, co in SHAPES:
        x32 = rng.randn(1, h, w, ci).astype(np.float32)
        k32 = (rng.randn(3, 3, ci, co).astype(np.float32) / np.sqrt(9 * ci))
        bias = rng.randn(co).astype(np.float32)
        flops = 2 * h * w * ci * co * 9

        xb = jnp.asarray(x32, jnp.bfloat16)
        kb = jnp.asarray(k32, jnp.bfloat16)
        bb = jnp.asarray(bias, jnp.bfloat16)

        def conv_bf16(x, k, b):
            y = jax.lax.conv_general_dilated(
                x, k, (1, 1), [(1, 1)] * 2,
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return jnp.maximum(y + b, 0.0)

        dt = timed(conv_bf16, (xb, kb, bb))
        print(f"{h}x{w}x{ci}->{co} bf16:        {dt*1e3:7.3f} ms "
              f"{flops/dt/1e12:6.1f} TF/s", flush=True)

        # int8 with on-the-fly dynamic activation quantization
        pf = {"kernel": jnp.asarray(k32), "bias": jnp.asarray(bias)}

        def conv_q(x, _k, _b):
            return conv_int8(pf, x, padding=1, relu=True,
                             out_dtype=jnp.bfloat16)

        dt = timed(conv_q, (xb, kb, bb))
        print(f"{h}x{w}x{ci}->{co} int8+dynq:   {dt*1e3:7.3f} ms "
              f"{flops/dt/1e12:6.1f} TF/s", flush=True)

        # int8 with PRE-quantized input (amortized quantization: measures
        # the pure MXU + rescale rate)
        kq, wscale = quantize_kernel(pf["kernel"])
        xq = jnp.clip(jnp.round(jnp.asarray(x32) / 0.05), -127,
                      127).astype(jnp.int8)

        def conv_q2(x, _k, _b):
            y = jax.lax.conv_general_dilated(
                x, kq, (1, 1), [(1, 1)] * 2,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32)
            y = y.astype(jnp.float32) * (wscale * 0.05) + pf["bias"]
            return jnp.maximum(y, 0.0).astype(jnp.bfloat16)

        dt = timed(conv_q2, (xq, kb, bb))
        print(f"{h}x{w}x{ci}->{co} int8 preq:   {dt*1e3:7.3f} ms "
              f"{flops/dt/1e12:6.1f} TF/s", flush=True)


if __name__ == "__main__":
    main()

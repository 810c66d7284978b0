"""Benchmark the fused Pallas trunk vs the XLA chain on the real TPU.

Timing per the relay methodology (PERFORMANCE.md): N iterations inside one
jitted fori_loop with a data dependency, scalar fetch as the completion
barrier, 1-iteration run subtracted for dispatch overhead.

Usage: python scripts/bench_trunk.py [shape_index ...]
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

from refid_tpu.ops.fused_trunk import fused_trunk, fused_trunk_reference

# (h, w, c) per production trunk at 720p serving, base=32
SHAPES = [
    (720, 1280, 64),    # enc scale 0
    (360, 640, 128),    # enc scale 1
    (180, 320, 256),    # enc scale 2
    (180, 320, 128),    # dec /4
    (360, 640, 64),     # dec /2
    (720, 1280, 32),    # dec /1
]


def bench(fn, args, iters=20):
    @partial(jax.jit, static_argnums=(1,))
    def loop(args, iters):
        def body(_, carry):
            args, s = carry
            out = fn(*args)
            s = jnp.sum(out[:1, :1].astype(jnp.float32))
            x0 = (args[0].astype(jnp.float32) + s * 1e-12).astype(
                args[0].dtype)
            return ((x0,) + args[1:], s)
        return jax.lax.fori_loop(0, iters, body, (args, jnp.float32(0)))[1]

    float(loop(args, 1))
    t0 = time.perf_counter()
    float(loop(args, 1))
    dt1 = time.perf_counter() - t0
    float(loop(args, iters + 1))
    t0 = time.perf_counter()
    float(loop(args, iters + 1))
    return (time.perf_counter() - t0 - dt1) / iters


def main():
    idxs = [int(a) for a in sys.argv[1:]] or range(len(SHAPES))
    dt = jnp.bfloat16
    for i in idxs:
        h, w, c = SHAPES[i]
        rng = np.random.RandomState(0)
        x = jnp.asarray((rng.randn(h, w, c) * 0.5).astype(np.float32), dt)
        s = jnp.asarray((rng.randn(h, w, c) * 0.5).astype(np.float32), dt)
        wi = jnp.asarray((rng.randn(3, 3, 2 * c, c) * 0.05).astype(
            np.float32), dt)
        w1 = jnp.asarray((rng.randn(3, 3, c, c) * 0.05).astype(np.float32),
                         dt)
        w2 = jnp.asarray((rng.randn(3, 3, c, c) * 0.05).astype(np.float32),
                         dt)
        bi, b1, b2 = (jnp.asarray((rng.randn(c) * 0.1).astype(np.float32),
                                  dt) for _ in range(3))
        args = (x, s, wi, bi, w1, b1, w2, b2)

        # correctness on-device first
        got = np.asarray(fused_trunk(*args)).astype(np.float32)
        want = np.asarray(fused_trunk_reference(*args)).astype(np.float32)
        err = np.abs(got - want).max() / max(np.abs(want).max(), 1e-9)

        t_ref = bench(fused_trunk_reference, args)
        t_fus = bench(fused_trunk, args)
        gmac = h * w * c * c * 9 * 4 / 1e9  # 2C->C + 2x C->C
        print(f"[{i}] ({h},{w},{c}) err={err:.2e} "
              f"xla={t_ref*1e3:7.2f}ms ({2*gmac/t_ref/1e3:6.1f} TF/s)  "
              f"pallas={t_fus*1e3:7.2f}ms ({2*gmac/t_fus/1e3:6.1f} TF/s)  "
              f"speedup={t_ref/t_fus:.2f}x", flush=True)


if __name__ == "__main__":
    main()

"""Voxelizer micro-bench on the real TPU: XLA scatter vs the fully
on-device Pallas one-hot-MXU kernel, 2^20 events at 720p, 24 bins.

Usage: python scripts/bench_voxelize.py
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


def main():
    from refid_tpu.events.voxel import _voxelize_padded
    from refid_tpu.events.voxel_pallas import voxelize_device

    cap, bins, w, h = 1 << 20, 24, 1280, 720
    rng = np.random.RandomState(0)
    ev = np.zeros((cap, 4), np.float32)
    ev[:, 0] = np.sort(rng.rand(cap))
    ev[:, 1] = rng.randint(0, w, cap)
    ev[:, 2] = rng.randint(0, h, cap)
    ev[:, 3] = rng.randint(0, 2, cap)
    ev = jnp.asarray(ev)
    n = jnp.int32(cap)

    fns = {
        "scatter": lambda e, n: _voxelize_padded(e, n, bins, w, h),
        "pallas": lambda e, n: voxelize_device(e, n, num_bins=bins,
                                               width=w, height=h),
    }

    for name, fn in fns.items():
        @partial(jax.jit, static_argnums=(2,))
        def loop(e, n, iters):
            def body(_, carry):
                ei, s = carry
                g = fn(ei, n)
                s = jnp.sum(g[0, :4, :4])
                ei = ei + s * 1e-20
                return (ei, s)
            return jax.lax.fori_loop(0, iters, body, (e, jnp.float32(0)))[1]

        v = float(loop(ev, n, 1))
        t0 = time.perf_counter(); float(loop(ev, n, 1))
        d1 = time.perf_counter() - t0
        float(loop(ev, n, 9))
        t0 = time.perf_counter(); float(loop(ev, n, 9))
        dt = (time.perf_counter() - t0 - d1) / 8
        print(f"{name:8s}: {dt*1e3:8.2f} ms  (check {v:.4f})", flush=True)


if __name__ == "__main__":
    main()

"""Diagnose bench.py's cold-path cost: trace/lower (host) vs compile
(relay) vs run, for the dynamic-iters and static-iters variants.

Usage: python scripts/diag_bench_compile.py [dyn|static1|static5] ...
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

_T0 = time.perf_counter()


def note(msg):
    print(f"[diag +{time.perf_counter() - _T0:6.1f}s] {msg}", flush=True)


def main():
    which = sys.argv[1:] or ["dyn"]
    import jax
    import jax.numpy as jnp
    from functools import partial

    jax.config.update("jax_compilation_cache_dir", "/tmp/refid_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from refid_tpu.models import FinalBidirectionAttenfusion, RefidConfig
    from refid_tpu.pipeline import BlurVFIPipeline

    note("imports done")

    cfg = RefidConfig(dtype=jnp.bfloat16, unroll=True)
    model = FinalBidirectionAttenfusion(cfg)
    m, n = 11, 1
    b, t, h, w = 1, 2 * m + n, 720, 1280
    N = 1 << 20
    rng = np.random.RandomState(0)
    blur0 = jnp.asarray(rng.rand(h, w, 3).astype(np.float32))
    blur1 = jnp.asarray(rng.rand(h, w, 3).astype(np.float32))
    events = np.empty((N, 4), np.float32)
    events[:, 0] = np.sort(rng.rand(N))
    events[:, 1] = rng.randint(0, w, N)
    events[:, 2] = rng.randint(0, h, N)
    events[:, 3] = rng.randint(0, 2, N)
    events = jnp.asarray(events)
    n_ev = jnp.int32(N)

    # params on the HOST cpu backend: model.init on the TPU relay compiles
    # a full init program remotely (~2 min cold); the CPU build is seconds
    from refid_tpu.serve.host_params import cpu_init_params
    params = cpu_init_params(model.init,
                             jnp.zeros((1, 64, 64, cfg.img_chn)),
                             jnp.zeros((1, 3, 64, 64, cfg.ev_chn)),
                             to_default_device=False)
    params = jax.device_put(params, jax.devices()[0])
    note("params built on cpu + transferred")

    pipe = BlurVFIPipeline(params, cfg, m=m, n=n)

    def body_of(iters_static):
        if iters_static is None:
            @jax.jit
            def bench_fn(params, b0, b1, events, n_ev, iters):
                def body(_, carry):
                    b0i, evi, s = carry
                    out = pipe._run(params, b0i, b1, evi, n_ev,
                                    height=h, width=w)
                    s = jnp.mean(out.astype(jnp.float32))
                    b0i = (b0.astype(jnp.float32) + s * 1e-12).astype(b0.dtype)
                    evi = events + s * 1e-12
                    return (b0i, evi, s)
                return jax.lax.fori_loop(
                    0, iters, body, (b0, events, jnp.float32(0.0)))[2]
            return bench_fn, (params, blur0, blur1, events, n_ev,
                              jnp.int32(1))

        @partial(jax.jit, static_argnums=(5,))
        def bench_fn(params, b0, b1, events, n_ev, iters):
            def body(_, carry):
                b0i, evi, s = carry
                out = pipe._run(params, b0i, b1, evi, n_ev,
                                height=h, width=w)
                s = jnp.mean(out.astype(jnp.float32))
                b0i = (b0.astype(jnp.float32) + s * 1e-12).astype(b0.dtype)
                evi = events + s * 1e-12
                return (b0i, evi, s)
            return jax.lax.fori_loop(
                0, iters, body, (b0, events, jnp.float32(0.0)))[2]
        return bench_fn, (params, blur0, blur1, events, n_ev, iters_static)

    for name in which:
        iters_static = {"dyn": None, "static1": 1, "static5": 5}[name]
        fn, args = body_of(iters_static)
        t0 = time.perf_counter()
        lowered = fn.lower(*args)
        t1 = time.perf_counter()
        note(f"{name}: lower (trace+HLO) {t1 - t0:.1f}s")
        compiled = lowered.compile()
        t2 = time.perf_counter()
        note(f"{name}: compile {t2 - t1:.1f}s")
        r = float(compiled(*[a for i, a in enumerate(args)
                             if not (iters_static is not None and i == 5)])
                  if iters_static is not None else compiled(*args))
        t3 = time.perf_counter()
        note(f"{name}: first run {t3 - t2:.1f}s (result {r:.6f})")
        t4 = time.perf_counter()
        r = float(compiled(*[a for i, a in enumerate(args)
                             if not (iters_static is not None and i == 5)])
                  if iters_static is not None else compiled(*args))
        note(f"{name}: second run {time.perf_counter() - t4:.3f}s")


if __name__ == "__main__":
    main()

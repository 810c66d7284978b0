"""Standalone timing probe: fused Pallas EGACA vs the XLA replay at the
production scale-1 geometry (1, 360, 640, 64) bf16.

Usage: python scripts/probe_egaca.py [--band 8]
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

from tests.test_egaca_fused import _params
from refid_tpu.ops.egaca_fused import egaca_fused, egaca_fused_u
from refid_tpu.serve.fast_forward import _egaca, _egaca_img_branch


def timed(fn, p, ev, img, iters=20):
    @partial(jax.jit, static_argnums=(4,))
    def loop(p, ev, img, s0, iters):
        def body(_, carry):
            evi, s = carry
            out = fn(p, evi, img)
            s = jnp.mean(out.astype(jnp.float32))
            evi = (ev.astype(jnp.float32) + s * 1e-12).astype(ev.dtype)
            return (evi, s)
        return jax.lax.fori_loop(0, iters, body, (ev, s0))[1]

    s0 = jnp.float32(0)
    float(loop(p, ev, img, s0, 1))
    t0 = time.perf_counter()
    float(loop(p, ev, img, s0, 1))
    dt1 = time.perf_counter() - t0
    float(loop(p, ev, img, s0, iters + 1))
    t0 = time.perf_counter()
    float(loop(p, ev, img, s0, iters + 1))
    return (time.perf_counter() - t0 - dt1) / iters


def main():
    band = 8
    if "--band" in sys.argv:
        band = int(sys.argv[sys.argv.index("--band") + 1])
    v1 = "--v1" in sys.argv  # default probes v2 (unfolded I/O)
    kern = egaca_fused if v1 else egaca_fused_u
    ctx = "--ctx" in sys.argv  # conv producer/consumer context, like the
    # serving graph: e = down-conv(input) -> EGACA -> trunk conv.  The e2e
    # profile says the fused kernel's in-graph cost is ~6 ms/call higher
    # than standalone — this isolates whether conv-chosen layouts around
    # the pallas custom-call are the cause.
    H, W, C = 360, 640, 64
    dt = jnp.bfloat16
    p = _params(jax.random.PRNGKey(0), C=C)
    r = np.random.RandomState(0)
    ev = jnp.asarray(r.randn(1, H, W, C), dt)
    img = jnp.asarray(r.randn(1, H, W, C), dt)

    if ctx:
        from refid_tpu.serve.fast_forward import _conv
        kprod = {"kernel": jnp.asarray(
            0.1 * r.randn(3, 3, C, C), jnp.float32)}
        kcons = {"kernel": jnp.asarray(
            0.1 * r.randn(3, 3, 2 * C, 2 * C), jnp.float32)}

        def wrap(core):
            def f(p, ev, img):
                e = _conv(kprod, ev, padding=1, slope=0.2, dtype=dt)
                o = core(p, e, img)
                return _conv(kcons, o, padding=1, stride=2, dtype=dt)
            return f
    else:
        def wrap(core):
            return core

    @wrap
    def xla(p, ev, img):
        return _egaca(p, ev, img, dt)

    @wrap
    def fused(p, ev, img):
        xb = _egaca_img_branch(p, img, dt)
        return kern(p, ev, img, xb, dt, band=band)

    # numeric check first (device): fused vs xla
    want = np.asarray(xla(p, ev, img), np.float32)
    got = np.asarray(fused(p, ev, img), np.float32)
    span = want.max() - want.min()
    rmse = float(np.sqrt(((got - want) ** 2).mean()))
    db = 20 * np.log10(span / max(rmse, 1e-12))
    print(f"parity: {db:.1f} dB (span {span:.2f}, rmse {rmse:.2e})",
          flush=True)

    for name, fn in [("xla", xla), ("fused", fused)]:
        ms = timed(fn, p, ev, img) * 1e3
        print(f"{name:6s} band={band}: {ms:8.3f} ms/call", flush=True)


if __name__ == "__main__":
    main()

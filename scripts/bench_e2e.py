"""End-to-end serving bench: flagship blur-VFI 11+1 at 1280x720 (or
--hw 1224x1632 for HighREV), comparing the flax unrolled path against the
functional fast_forward variants.  (The fused Pallas variants were deleted
in round 5 — presence-poisoning, see PERFORMANCE.md.)

Usage: python scripts/bench_e2e.py [model|fast|packed|int8|int8s0 ...]
                                   [--t N] [--b N] [--hw HxW]
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

from refid_tpu.models import FinalBidirectionAttenfusion, RefidConfig
from refid_tpu.serve import fast_forward


def timed(fn, params, x, ev, iters=8):
    @partial(jax.jit, static_argnums=(3,))
    def loop(params, x, ev, iters):
        def body(_, carry):
            xi, evi, s = carry
            out = fn(params, xi, evi)
            s = jnp.mean(out.astype(jnp.float32))
            # chain BOTH inputs (ev-only work like the cached event head
            # must not be hoisted out as loop-invariant)
            xi = (xi.astype(jnp.float32) + s * 1e-12).astype(xi.dtype)
            evi = (ev.astype(jnp.float32) + s * 1e-12).astype(ev.dtype)
            return (xi, evi, s)
        return jax.lax.fori_loop(0, iters, body,
                                 (x, ev, jnp.float32(0)))[2]

    float(loop(params, x, ev, 1))
    t0 = time.perf_counter()
    float(loop(params, x, ev, 1))
    dt1 = time.perf_counter() - t0
    float(loop(params, x, ev, iters + 1))
    t0 = time.perf_counter()
    float(loop(params, x, ev, iters + 1))
    return (time.perf_counter() - t0 - dt1) / iters


def main():
    argv = sys.argv[1:]
    VALUE_FLAGS = {"--t", "--b", "--hw"}
    skip = set()
    for i, a in enumerate(argv):  # drop flag VALUES from the variant list
        if a in VALUE_FLAGS and i + 1 < len(argv):
            skip.add(i + 1)
    args = [a for i, a in enumerate(argv)
            if not a.startswith("--") and i not in skip]
    t = 23
    if "--t" in sys.argv:
        t = int(sys.argv[sys.argv.index("--t") + 1])
    bsz = 1
    if "--b" in sys.argv:
        bsz = int(sys.argv[sys.argv.index("--b") + 1])
    hh, ww = 720, 1280
    if "--hw" in sys.argv:  # e.g. --hw 1224x1632 (HighREV)
        hh, ww = map(int, sys.argv[sys.argv.index("--hw") + 1].split("x"))
    which = args or ["model", "packed"]

    cfg = RefidConfig(dtype=jnp.bfloat16, unroll=True)
    model = FinalBidirectionAttenfusion(cfg)
    b, h, w = bsz, hh, ww
    rng = np.random.RandomState(0)
    # bf16 inputs: identical serving semantics (the first conv casts to the
    # compute dtype regardless) and ~270 MB less HBM for the 23-bin stack
    x = jnp.asarray(rng.rand(b, h, w, cfg.img_chn).astype(np.float32),
                    jnp.bfloat16)
    ev = jnp.asarray(rng.rand(b, t, h, w, cfg.ev_chn).astype(np.float32),
                     jnp.bfloat16)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 64, 64, cfg.img_chn)),
                        jnp.zeros((1, 3, 64, 64, cfg.ev_chn)))

    fns = {
        "model": model.apply,
        "fast": lambda p, x, ev: fast_forward(p, cfg, x, ev, packed=False),
        "packed": lambda p, x, ev: fast_forward(p, cfg, x, ev, packed=True),
        "int8": lambda p, x, ev: fast_forward(p, cfg, x, ev,
                                              packed=True, int8=True),
        "int8s0": lambda p, x, ev: fast_forward(p, cfg, x, ev,
                                                packed=True, int8="scale0"),
    }
    results = {}
    for name in which:
        dt = timed(fns[name], params, x, ev)
        results[name] = dt
        print(f"{name:6s} b={b} t={t}: {dt*1e3:8.1f} ms/forward "
              f"({b*t/dt:6.1f} frames/s)", flush=True)
    if len(results) > 1:
        names = list(results)
        print(f"speedup {names[-1]} vs {names[0]}: "
              f"{results[names[0]]/results[names[-1]]:.2f}x")


if __name__ == "__main__":
    main()

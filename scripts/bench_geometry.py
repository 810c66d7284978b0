"""Geometry micro-bench for the folded scale-0 trunk convs.

The honest e2e profile (scripts/profile_e2e.py, PERFORMANCE.md round-3
correction) shows the width-folded scale-0 trunk convs at (720, 640)
running ~47 TF/s while the SAME-FLOP scale-1 convs at (360, 640) run at
188 TF/s.  This bench times the exact conv shapes of the candidate fold
geometries so the serving-path restructure is chosen on data:

  wf2   (720, 640, 256->128)  current width-fold-2      2x MACs vs unfolded
  hf2   (360, 1280, 256->128) height-fold-2             2x MACs
  s2d22 (360, 640, 512->256)  space-to-depth (2,2)      4x MACs
  none  (720, 1280, 128->64)  unfolded (64-lane tax)    1x MACs

Each variant runs conv_in (Cin=2*C concat) + 2 resblock convs (C->C),
i.e. one trunk step, in a fori_loop with loop-carried input (anti-LICM).

Usage: python scripts/bench_geometry.py [wf2 hf2 s2d22 none ...] [--iters 20]
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


# (B, H, W, C): trunk geometry — conv_in is 2C->C, resblocks C->C
VARIANTS = {
    "wf2": (1, 720, 640, 128),
    "hf2": (1, 360, 1280, 128),
    "s2d22": (1, 360, 640, 256),
    "none": (1, 720, 1280, 64),
    # H split into a batch dim (halo cost excluded here — this measures
    # whether the 2x rate gap between 460k-px and 230k-px convs is about
    # per-call spatial extent; +2 halo rows would be ~0.6% more work)
    "b2": (2, 360, 640, 128),
    "b4": (4, 180, 640, 128),
    "b2h": (2, 362, 640, 128),
}


def main():
    argv = sys.argv[1:]
    iters = 20
    if "--iters" in argv:
        i = argv.index("--iters")
        iters = int(argv[i + 1])
        del argv[i:i + 2]
    which = argv or ["wf2", "hf2"]

    for name in which:
        bb, h, w, c = VARIANTS[name]
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(bb, h, w, c).astype(np.float32),
                        jnp.bfloat16)
        s = jnp.asarray(rng.randn(bb, h, w, c).astype(np.float32),
                        jnp.bfloat16)
        k_in = jnp.asarray(
            rng.randn(3, 3, 2 * c, c).astype(np.float32) / (3 * c),
            jnp.bfloat16)
        k1 = jnp.asarray(
            rng.randn(3, 3, c, c).astype(np.float32) / (3 * c), jnp.bfloat16)
        k2 = jnp.asarray(
            rng.randn(3, 3, c, c).astype(np.float32) / (3 * c), jnp.bfloat16)

        def conv(x_, k_):
            return jax.lax.conv_general_dilated(
                x_, k_, (1, 1), [(1, 1)] * 2,
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        @partial(jax.jit, static_argnums=(5,))
        def loop(x_, s_, ki, ka, kb, iters):
            def body(_, carry):
                xi, acc = carry
                hh = conv(jnp.concatenate([xi, s_], axis=-1), ki)
                hh = jnp.maximum(hh, 0.1 * hh)
                h1 = jax.nn.relu(conv(hh, ka))
                out = hh + conv(h1, kb)
                m = jnp.mean(out.astype(jnp.float32))
                xi = (x_.astype(jnp.float32) + m * 1e-12).astype(x_.dtype)
                return (xi, m)
            return jax.lax.fori_loop(0, iters, body, (x_, jnp.float32(0)))[1]

        def run(k):
            float(loop(x, s, k_in, k1, k2, k))
            t0 = time.perf_counter()
            float(loop(x, s, k_in, k1, k2, k))
            return time.perf_counter() - t0

        dt1 = run(1)
        dt = (run(iters + 1) - dt1) / iters
        # FLOPs of one trunk step at this geometry
        fl = 2 * bb * h * w * 9 * c * (2 * c + c + c)
        print(f"{name:6s} ({bb},{h:4d},{w:4d},{c:3d}) trunk step: "
              f"{dt*1e3:7.2f} ms  {fl/dt/1e12:6.1f} TF/s", flush=True)


if __name__ == "__main__":
    main()

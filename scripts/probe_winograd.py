"""Winograd F(2x2, 3x3) probe: can MAC-cutting beat XLA's direct conv on
TPU *through pure XLA ops* (no custom calls — round 5 measured that any
tpu_custom_call presence-poisons the big convs, probe_poison.py)?

Why this question: the 84 fps bf16 serving ceiling is compute-bound on
3x3 convs; int8 MXU is one way past it (measured +8% e2e), Winograd is
the only other arithmetic that cuts the MAC count (2.25x fewer for 3x3).
This probe measures a full Winograd pipeline assembled from XLA ops at
the folded scale-0 trunk geometry (720, 640, 128->128 — the dominant
serving conv class, PERFORMANCE.md round-4 per-op map):

  * 16 stride-2 slices of the padded input (tile positions; XLA fuses
    them into the transform combos),
  * input transform B^T d B as elementwise combos over the 16-slice axis,
  * 16 batched (H/2*W/2, Ci) @ (Ci, Co) dot_generals (the 2.25x-reduced
    contraction),
  * output transform A^T M A -> 4 phases, depth_to_space interleave.

Parity: max|winograd - lax.conv| on random inputs (f32 reference ~1e-5;
bf16 transform arithmetic adds reassociation noise — reported).

Expected failure mode (recorded either way): the V/M intermediates
(16 x H/2 x W/2 x C) roughly triple HBM traffic per conv; at ~819 GB/s
that costs more than the 2.25x MAC cut saves at 128-channel shapes.

Usage: python scripts/probe_winograd.py [--iters 30] [--hw 720x640]
                                        [--c 128] [--f32]
"""

import argparse
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/refid_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

# F(2x2, 3x3) transform matrices (Lavin & Gray 2015; exact in f32 —
# entries are 0, +-1, +-0.5)
B_T = np.array([[1, 0, -1, 0],
                [0, 1, 1, 0],
                [0, -1, 1, 0],
                [0, 1, 0, -1]], np.float32)
G = np.array([[1, 0, 0],
              [.5, .5, .5],
              [.5, -.5, .5],
              [0, 0, 1]], np.float32)
A_T = np.array([[1, 1, 1, 0],
                [0, 1, -1, -1]], np.float32)


def winograd_conv(x, w, dtype):
    """x (b, h, w, ci) pre-padded NOT required — SAME padding applied
    here; w (3, 3, ci, co).  h, w must be even.  Returns (b, h, w, co)."""
    b, H, W, ci = x.shape
    co = w.shape[-1]
    # kernel transform U = G g G^T  -> (4, 4, ci, co), f32 then cast
    U = jnp.einsum("ij,jkcd,lk->ilcd", G, w.astype(jnp.float32), G)
    U = U.astype(dtype)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0))).astype(dtype)
    # 16 tile-position slices, each (b, H/2, W/2, ci): element (i, j) of
    # the 4x4 tile whose origin is (2a, 2b) in the padded frame
    sl = [[jax.lax.slice(xp, (0, i, j, 0), (b, i + H - 1, j + W - 1, ci),
                         (1, 2, 2, 1))
           for j in range(4)] for i in range(4)]
    # input transform V = B^T d B over the tile axes (exact +-1 combos)
    BT = B_T
    V = [[None] * 4 for _ in range(4)]
    for i in range(4):
        for j in range(4):
            acc = None
            for k in range(4):
                for l in range(4):
                    cij = BT[i, k] * BT[j, l]
                    if cij == 0.0:
                        continue
                    term = sl[k][l] if cij == 1.0 else (
                        -sl[k][l] if cij == -1.0 else cij * sl[k][l])
                    acc = term if acc is None else acc + term
            V[i][j] = acc
    # 16 channel contractions M[i][j] = V[i][j] @ U[i, j]
    acc = jnp.promote_types(jnp.float32, dtype)
    M = [[jax.lax.dot_general(
            V[i][j].reshape(b * (H // 2) * (W // 2), ci), U[i, j],
            (((1,), (0,)), ((), ())),
            preferred_element_type=acc).astype(dtype)
          for j in range(4)] for i in range(4)]
    # output transform Y = A^T M A -> 4 phases (2x2 within each tile)
    AT = A_T
    Y = [[None] * 2 for _ in range(2)]
    for i in range(2):
        for j in range(2):
            acc = None
            for k in range(4):
                for l in range(4):
                    cij = AT[i, k] * AT[j, l]
                    if cij == 0.0:
                        continue
                    term = M[k][l] if cij == 1.0 else (
                        -M[k][l] if cij == -1.0 else cij * M[k][l])
                    acc = term if acc is None else acc + term
            Y[i][j] = acc.reshape(b, H // 2, W // 2, co)
    # interleave the 4 phases: (b, H/2, W/2, 2, 2, co) -> (b, H, W, co)
    y = jnp.stack([jnp.stack([Y[0][0], Y[0][1]], 3),
                   jnp.stack([Y[1][0], Y[1][1]], 3)], 3)
    y = y.reshape(b, H // 2, W // 2, 2, 2, co).transpose(0, 1, 3, 2, 4, 5)
    return y.reshape(b, H, W, co)


def direct_conv(x, w, dtype):
    return jax.lax.conv_general_dilated(
        x.astype(dtype), w.astype(dtype), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(dtype)


def bench(fn, x, w, iters):
    @partial(jax.jit, static_argnums=())
    def loop(x, w, n):
        def body(_, carry):
            xi, s = carry
            out = fn(xi, w)
            s = jnp.mean(out.astype(jnp.float32))
            xi = (x.astype(jnp.float32) + s * 1e-12).astype(x.dtype)
            return (xi, s)
        return jax.lax.fori_loop(0, n, body, (x, jnp.float32(0)))[1]

    # byte-unique dispatches (k*1e-6 nudge): the relay may serve
    # byte-identical dispatches from cache, which would time nothing
    def timed(k, n):
        xi = x + np.float32(k * 1e-6)
        t0 = time.perf_counter()
        float(loop(xi, w, jnp.int32(n)))
        return time.perf_counter() - t0

    timed(0, 1)  # compile + relay load
    d1 = timed(1, 1)
    return (timed(2, iters + 1) - d1) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--hw", default="720x640")
    ap.add_argument("--c", type=int, default=128)
    ap.add_argument("--f32", action="store_true")
    args = ap.parse_args()
    H, W = map(int, args.hw.split("x"))
    C = args.c
    dt = jnp.float32 if args.f32 else jnp.bfloat16

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, H, W, C).astype(np.float32) * 0.5)
    w = jnp.asarray(rng.randn(3, 3, C, C).astype(np.float32) * 0.05)

    # parity first (f32 exact; chosen dtype reported)
    ref = np.asarray(direct_conv(x, w, jnp.float32), np.float64)
    got32 = np.asarray(winograd_conv(x, w, jnp.float32), np.float64)
    gotdt = np.asarray(winograd_conv(x, w, dt), np.float64)
    print(f"parity f32: max|diff| {np.abs(got32 - ref).max():.2e}  "
          f"{np.dtype('float32' if args.f32 else 'bfloat16').name}: "
          f"{np.abs(gotdt - ref).max():.2e}", flush=True)

    gflop_direct = 2 * H * W * 9 * C * C / 1e9
    gflop_wino = 2 * (H // 2) * (W // 2) * 16 * C * C / 1e9
    td = bench(lambda a, b_: direct_conv(a, b_, dt), x, w, args.iters)
    print(f"direct   {td*1e3:7.3f} ms  ({gflop_direct/td/1e3:6.1f} TF/s)",
          flush=True)
    tw = bench(lambda a, b_: winograd_conv(a, b_, dt), x, w, args.iters)
    print(f"winograd {tw*1e3:7.3f} ms  ({gflop_wino/tw/1e3:6.1f} TF/s "
          f"matmul-rate; {gflop_direct/tw/1e3:6.1f} TF/s direct-equiv)",
          flush=True)
    print(f"winograd/direct: {tw/td:.2f}x "
          f"({'WIN' if tw < td else 'LOSS'})", flush=True)


if __name__ == "__main__":
    main()

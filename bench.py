"""Flagship benchmark: blur-VFI 11+1 END-TO-END serving throughput at
1280x720 — raw events + 2 blurred frames in, sharp frames out, including
on-device voxelization and packing (round 3; rounds 1-2 measured the
network forward alone).

Prints a SEQUENCE of JSON result lines (same metric; each supersedes the
previous — parse the LAST one): (1) a PROVISIONAL line from the
width-folded lax.scan serving pipeline, whose ~20x-smaller HLO traces,
compiles, and relay-loads in a fraction of the unrolled graph's time, then
(2) the exact-bf16 headline from the production trace-time-unrolled
pipeline, then (3) the int8-MXU headline (dynamic per-window scales) —
quality-gated by the measured production-shape dB table
(scripts/quant_db.py: every int8 mode >= 68.6 dB vs f32 at 720p/t=23, at
the bf16 rounding floor itself; rule encoded in serve/quant.py
PRODUCTION_DB_GATE, tests/test_quant.py).  If the run is killed at any
point, the tail of stdout still parses to an honest (slower) end-to-end
number.

Why staged (round-5 forensics of the r04 `rc: 124` timeout artifact):
  * the t=23 720p unrolled executable costs ~7 min cold through the
    compile relay — measured split (scripts/diag_bench_compile.py):
    trace+lower 8 s, relay compile 171 s, FIRST EXECUTION 234 s (relay
    executable finalization/load — paid per executable even when the
    persistent cache is warm), run 0.95 s/window;
  * the r04 bench compiled TWO such executables (one per static iteration
    count) and printed nothing until both finished.  This version uses a
    dynamic (traced) iteration count — ONE executable serves every
    measurement — and prints a result as soon as each pipeline produces
    its first timed window;
  * params are built host-side (eval_shape + numpy fill) — model.init on
    the relay was another ~2 min of the cold path.  Weight values are
    runtime arguments, so they cannot change the compiled program's
    timing.

value      = sharp frames produced per second per chip (one pipeline call
             emits t=23 frames from 2 blurred frames + the raw event
             stream at 1280x720).
vs_baseline= value / H100_REFERENCE_FPS_EST.

The reference repo publishes no throughput numbers (BASELINE.md), so the
baseline is an analytic estimate of the reference PyTorch implementation on
one H100, documented here:

  The network costs 54.1 TFLOP per 23-frame 720p forward (2.35 TFLOP per
  fwd+bwd frame pair — measured on the UNROLLED graph and confirmed by a
  hand count of the per-step convs; PERFORMANCE.md "Round-2 correction").
  Arithmetic intensity is ~780 flop/byte: the model is COMPUTE-bound on
  modern accelerators, not bandwidth-bound.  On H100 SXM the relevant peak
  for the eager-PyTorch reference is TF32 dense ~495 TFLOP/s (PyTorch
  enables TF32 for cuDNN convs by default; the model is conv-only), giving
  a 109 ms/forward = 210 frames/s *theoretical* ceiling at 100% MFU.  The
  reference's forward is a Python loop over 23 frames x 3 encoder stages of
  small unfused ops (XXNet_final_attenfusion_arch.py:172-216); eager conv
  nets of this shape realistically achieve 30-50% MFU => ~63-105 frames/s.
  => H100_REFERENCE_FPS_EST = 90 frames/s (midpoint).  BASELINE.json's
  north star of ">=2x H100 frames/sec/chip" is vs_baseline >= 2.0
  (~180 fps) — note this exceeds the 84 frames/s bf16 exact-math ceiling of
  one v5e (197 TFLOP/s peak / 54.1 TFLOP), i.e. it is reachable only with
  reduced-precision (int8 MXU, 394 TOPS -> ~168 fps bound) or
  MAC-cutting (Winograd) arithmetic.

  History: rounds 1-2 used H100_REFERENCE_FPS_EST = 600, derived from a
  bandwidth-bound cost model (2.86 TFLOP / 69.5 GB per forward) that XLA
  cost analysis produced by counting the scan body ONCE instead of x23.
  Round 2 debunked it (PERFORMANCE.md:92-101); round 3 corrected the
  constant.  Comparable vs_baseline trend: r01 0.023 -> r02 0.077 on the
  old scale = r01 0.156 -> r02 0.511 on this scale.  BENCH_r04.json is a
  TIMEOUT artifact (rc 124), not a regression — the measured r04 number
  was 25.03 fps (PERFORMANCE.md round 4).
"""

import json
import sys
import time

import numpy as np

H100_REFERENCE_FPS_EST = 90.0
V5E_BF16_CEILING_FPS = 84.0  # 197 TFLOP/s / (54.1 TFLOP / 23 frames)


import os as _os
N_EVENTS = int(_os.environ.get("BENCH_N_EVENTS", 1 << 20))  # ~1M events per
# 12-frame 720p window is the realistic order; override for diagnostics

_T0 = time.perf_counter()


def _note(msg):
    print(f"[bench +{time.perf_counter() - _T0:6.1f}s] {msg}",
          file=sys.stderr, flush=True)


def _result(fps, stage, math="EXACT bf16 math"):
    print(json.dumps({
        "metric": ("blur-VFI 11+1 END-TO-END frames/sec/chip @1280x720 "
                   "(raw events + frames in)"),
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / H100_REFERENCE_FPS_EST, 3),
        "notes": (stage
                  + f"includes on-device voxelization of {N_EVENTS} events + "
                  f"packing + forward; baseline = "
                  f"{H100_REFERENCE_FPS_EST:.0f} fps analytic H100-eager "
                  f"estimate (54.1 TFLOP/forward, see docstring); v5e bf16 "
                  f"exact-math forward ceiling = "
                  f"{V5E_BF16_CEILING_FPS:.0f} fps "
                  f"({fps / V5E_BF16_CEILING_FPS:.0%} achieved); this line: "
                  + math),
    }), flush=True)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/refid_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from refid_tpu.models import FinalBidirectionAttenfusion, RefidConfig
    from refid_tpu.pipeline import BlurVFIPipeline

    _note("imports done")

    # END-TO-END serving: raw events + 2 blurred frames in, 23 sharp frames
    # out — ONE device program: voxelization (XLA scatter), deblur-voxel
    # packing, s2d event-pair packing, and the width-folded bf16 forward
    # (serve/fast_forward.py; == model.apply in tests/test_fast_forward.py;
    # bf16 deviates from f32 by 65 dB, <0.01 dB end-to-end).
    cfg = RefidConfig(dtype=jnp.bfloat16, unroll=True)
    model = FinalBidirectionAttenfusion(cfg)
    m, n = 11, 1
    b, t, h, w = 1, 2 * m + n, 720, 1280
    rng = np.random.RandomState(0)
    blur0 = jnp.asarray(rng.rand(h, w, 3).astype(np.float32))
    blur1 = jnp.asarray(rng.rand(h, w, 3).astype(np.float32))
    events = np.empty((N_EVENTS, 4), np.float32)
    events[:, 0] = np.sort(rng.rand(N_EVENTS))            # time, sorted
    events[:, 1] = rng.randint(0, w, N_EVENTS)            # x
    events[:, 2] = rng.randint(0, h, N_EVENTS)            # y
    events[:, 3] = rng.randint(0, 2, N_EVENTS)            # polarity
    events = jnp.asarray(events)
    n_ev = jnp.int32(N_EVENTS)

    # Host-built params (refid_tpu.serve.host_params): eval_shape traces
    # init WITHOUT compiling it (the relay-compiled model.init was ~2 min
    # of the r04 cold path); values are runtime arguments, irrelevant to
    # compiled-program timing.
    from refid_tpu.serve.host_params import host_built_params
    params = host_built_params(
        model.init, jax.random.PRNGKey(0),
        jnp.zeros((1, 64, 64, cfg.img_chn)),
        jnp.zeros((1, 3, 64, 64, cfg.ev_chn)))
    _note("params built on host")

    # NOTE: the device is reached through an async relay where
    # block_until_ready acknowledges enqueue, not completion, and identical
    # dispatches may be served from cache.  So: run `iters` forwards inside
    # ONE jitted fori_loop, chain iterations through a data dependency, and
    # force completion by fetching the final scalar to the host.  All big
    # arrays are passed as ARGUMENTS (a closure would embed them as HLO
    # constants, which the compile relay rejects for 720p inputs).
    # `iters` is a TRACED argument: every call shares one executable.
    def make_bench_fn(pipe):
        @jax.jit
        def bench_fn(params, b0, b1, events, n_ev, iters):
            def body(_, carry):
                b0i, evi, s = carry
                out = pipe._run(params, b0i, b1, evi, n_ev,
                                height=h, width=w)
                s = jnp.mean(out.astype(jnp.float32))
                # chain BOTH the frames and the event buffer through the
                # carry: with loop-invariant events, XLA could hoist the
                # voxelization out of the fori_loop and the "end-to-end"
                # claim would exclude it.  The +s*1e-12 perturbation is
                # exact-zero in f32 for the magnitudes involved, so every
                # iteration computes identical values while the data
                # dependence forces full re-execution.
                b0i = (b0.astype(jnp.float32) + s * 1e-12).astype(b0.dtype)
                evi = events + s * 1e-12
                return (b0i, evi, s)

            return jax.lax.fori_loop(
                0, iters, body, (b0, events, jnp.float32(0.0)))[2]

        calls = [0]

        def bench_iters(iters):
            # every timed dispatch must be byte-unique: per the relay
            # NOTE above, byte-identical dispatches may be served from a
            # cache — which would time nothing.  A 1e-6 nudge on the
            # frame changes the input bytes while moving the math by
            # ~1/60 of a bf16 ULP-at-0.5; irrelevant to timing.
            calls[0] += 1
            b0i = blur0 + np.float32(calls[0] * 1e-6)
            t0 = time.perf_counter()
            float(bench_fn(params, b0i, blur1, events, n_ev,
                           jnp.int32(iters)))
            return time.perf_counter() - t0

        return bench_iters

    # ---- stage 1: PROVISIONAL from the folded-scan pipeline ------------
    # (exact math, ~20x smaller HLO: lands a parsable honest number inside
    # any compile budget; superseded by the unrolled headline below)
    try:
        scan_bench = make_bench_fn(
            BlurVFIPipeline(params, cfg, m=m, n=n, scan=True))
        scan_bench(1)  # trace + compile + relay load + 1 window
        _note("scan pipeline compiled/warm")
        dt1 = scan_bench(1)
        _note(f"scan window: {dt1 * 1e3:.1f} ms (incl. dispatch)")
        _result(t / dt1, "PROVISIONAL (width-folded lax.scan serving "
                         "path incl. dispatch overhead; the unrolled "
                         "headline follows). ")
        dt = (scan_bench(4) - dt1) / 3
        _note(f"scan refined: {dt * 1e3:.1f} ms/window over 3 iters")
        _result(t / dt, "PROVISIONAL (width-folded lax.scan serving "
                        "path; the unrolled headline follows). ")
    except Exception as e:  # never let the provisional stage kill the
        _note(f"scan provisional stage failed: {e!r}")  # headline stage

    # ---- stage 2: exact-bf16 headline from the unrolled fast pipeline --
    bench_iters = make_bench_fn(BlurVFIPipeline(params, cfg, m=m, n=n))
    bench_iters(1)  # trace + compile (or cache load) + relay load + window
    _note("unrolled pipeline compiled/warm")
    dt1 = bench_iters(1)
    _note(f"first timed window: {dt1 * 1e3:.1f} ms (incl. dispatch)")
    _result(t / dt1, "")
    iters = 4
    dt = (bench_iters(iters + 1) - dt1) / iters  # subtract dispatch overhead
    _note(f"refined: {dt * 1e3:.1f} ms/window over {iters} iters")
    _result(t / dt, "")

    # ---- stage 3: int8-MXU headline (quality-gated) --------------------
    # Dynamic per-window scales: no calibration executable needed.  Gated
    # by the measured production-shape dB table — every int8 mode >= 68.6
    # dB vs f32 at this exact geometry, at the bf16 rounding floor
    # (scripts/quant_db.py; rule in serve/quant.py / tests/test_quant.py).
    try:
        from refid_tpu.serve.quant import int8_quality_gated
        if not int8_quality_gated(True):
            raise RuntimeError("int8 dynamic mode is not quality-gated in")
        int8_math = ("int8 MXU (dynamic per-window scales), quality-gated: "
                     "68.6 dB vs f32 at this exact production shape = the "
                     "bf16 rounding floor (scripts/quant_db.py; rule in "
                     "serve/quant.py).  Exact-bf16 line precedes this one.")
        int8_bench = make_bench_fn(
            BlurVFIPipeline(params, cfg, m=m, n=n, int8=True))
        int8_bench(1)
        _note("int8 pipeline compiled/warm")
        dt1 = int8_bench(1)
        _note(f"int8 first timed window: {dt1 * 1e3:.1f} ms (incl. dispatch)")
        if t / dt1 > t / dt:  # only supersede the bf16 line if faster
            _result(t / dt1, "", int8_math)
        dt8 = (int8_bench(iters + 1) - dt1) / iters
        _note(f"int8 refined: {dt8 * 1e3:.1f} ms/window over {iters} iters")
        if dt8 < dt:
            _result(t / dt8, "", int8_math)
        else:
            _note("int8 not faster than bf16 this run; bf16 line stands")
    except Exception as e:  # the bf16 headline already landed — never
        _note(f"int8 stage skipped: {e!r}")  # regress the artifact on it


if __name__ == "__main__":
    main()

"""Flagship benchmark: blur-VFI 11+1 inference throughput at 1280x720.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

value      = sharp frames produced per second per chip (one forward emits
             t=23 frames from 2 blurred frames + events at 1280x720).
vs_baseline= value / H100_REFERENCE_FPS_EST.

The reference repo publishes no throughput numbers (BASELINE.md), so the
baseline is an analytic estimate of the reference PyTorch implementation on
one H100, documented here and held fixed across rounds so the trend is
comparable:

  XLA cost analysis of the network at this shape: 2.86 TFLOP and 69.5 GB of
  tensor traffic per 23-frame forward -> arithmetic intensity ~41 flop/byte,
  i.e. the model is HBM-bandwidth-bound on modern accelerators.  On H100 SXM
  (3.35 TB/s) the fp32 bandwidth roofline is ~21 ms/forward (~1100 frames/s);
  the eager-mode reference — a Python loop over 23 frames x 3 stages of
  small unfused ops (XXNet_final_attenfusion_arch.py:172-216) — realistically
  reaches roughly half of the roofline.
  => H100_REFERENCE_FPS_EST = 600 frames/s; BASELINE.json's north star of
  ">=2x H100 frames/sec/chip" corresponds to vs_baseline >= 2.0.
  (Note: one TPU v5e has 819 GB/s HBM, a 4x bandwidth handicap vs H100 —
  closing the gap means cutting bytes: bf16 activations and fusion.)
"""

import json
import time

import numpy as np

H100_REFERENCE_FPS_EST = 600.0


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/refid_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from refid_tpu.models import FinalBidirectionAttenfusion, RefidConfig
    from refid_tpu.serve import fast_forward

    # Serving config: bf16 compute (deviates from the f32 forward by 65 dB,
    # <0.01 dB end-to-end — PERFORMANCE.md), trace-time-unrolled temporal
    # loop (identical math to the scanned model: 14 -> 42 frames/s), and the
    # packed/width-folded serving pipeline (exact conv reparameterizations
    # that fix the TPU lane-padding pathologies of sub-128-channel tensors:
    # 42 -> 46 frames/s; serve/fast_forward.py, serve/packing.py — verified
    # == model.apply in tests/test_fast_forward.py).
    cfg = RefidConfig(dtype=jnp.bfloat16, unroll=True)
    model = FinalBidirectionAttenfusion(cfg)
    b, t, h, w = 1, 23, 720, 1280
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(b, h, w, cfg.img_chn).astype(np.float32),
                    jnp.bfloat16)
    # events in the pre-packed serving format (s2d(2,2) voxel pairs,
    # producible directly by the on-device voxelizer): (b,t,h/2,w/2,8)
    ev = jnp.asarray(rng.rand(b, t, h // 2, w // 2, 4 * cfg.ev_chn).astype(
        np.float32), jnp.bfloat16)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 64, 64, cfg.img_chn)),
                        jnp.zeros((1, 3, 64, 64, cfg.ev_chn)))

    # NOTE: the device is reached through an async relay where
    # block_until_ready acknowledges enqueue, not completion, and identical
    # dispatches may be served from cache.  So: run `iters` forwards inside
    # ONE jitted fori_loop, chain iterations through a data dependency, and
    # force completion by fetching the final scalar to the host.  All big
    # arrays are passed as ARGUMENTS (a closure would embed them as HLO
    # constants, which the compile relay rejects for 720p inputs).
    from functools import partial

    @partial(jax.jit, static_argnums=(3,))
    def bench_fn(params, x, ev, iters):
        def body(_, carry):
            xi, s = carry
            out = fast_forward(params, cfg, xi, ev, packed=True)
            s = jnp.mean(out.astype(jnp.float32))
            xi = (x.astype(jnp.float32) + s * 1e-12).astype(x.dtype)
            return (xi, s)  # dependency chain across iterations

        return jax.lax.fori_loop(0, iters, body, (x, jnp.float32(0.0)))[1]

    def bench_iters(iters):
        float(bench_fn(params, x, ev, iters))  # compile + warmup
        t0 = time.perf_counter()
        float(bench_fn(params, x, ev, iters))  # scalar fetch = completion
        return time.perf_counter() - t0

    dt1 = bench_iters(1)
    iters = 10
    dt = (bench_iters(iters + 1) - dt1) / iters  # subtract dispatch overhead

    fps = t / dt
    print(json.dumps({
        "metric": "blur-VFI 11+1 inference frames/sec/chip @1280x720",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / H100_REFERENCE_FPS_EST, 3),
    }))


if __name__ == "__main__":
    main()

"""EVHINet production-shape int8 quality table: PSNR of each int8
serving mode vs the exact f32 forward at the full serving geometry
(720p single-image deblur), on TPU — the same deployment-decision
methodology as the flagship's scripts/quant_db.py (which measured every
flagship int8 mode at 68.6-68.7 dB = the bf16 rounding floor).

Real flax init weight distributions (quantization error depends on the
weight/activation distributions); serving input off the calibration
window for the static mode.

Usage: python scripts/quant_db_evhinet.py [--modes bf16 int8 int8st]
                                          [--hw 720x1280]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/refid_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def psnr(a, b, peak=1.0):
    mse = float(np.mean((np.asarray(a, np.float64)
                         - np.asarray(b, np.float64)) ** 2))
    return 10.0 * np.log10(peak ** 2 / max(mse, 1e-30))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--modes", nargs="*", default=["bf16", "int8", "int8st"])
    ap.add_argument("--hw", default="720x1280")
    args = ap.parse_args()
    h, w = map(int, args.hw.split("x"))

    from refid_tpu.models.evhinet import EVHINet
    from refid_tpu.serve.evhinet_fast import evhinet_fast_forward

    from refid_tpu.serve.host_params import cpu_init_params
    model = EVHINet(dtype=None)
    params = cpu_init_params(model.init, jnp.zeros((1, 64, 64, 3)),
                             jnp.zeros((1, 64, 64, 6)))
    print(f"[{time.strftime('%H:%M:%S')}] params ready", flush=True)

    rng = np.random.RandomState(0)
    x = rng.rand(1, h, w, 3).astype(np.float32)
    ev = (rng.rand(1, h, w, 6).astype(np.float32) - 0.5)

    ref = np.asarray(jax.jit(
        lambda p, a, b: evhinet_fast_forward(p, a, b, dtype=None))(
            params, jnp.asarray(x), jnp.asarray(ev)))
    print(f"[{time.strftime('%H:%M:%S')}] f32 reference done "
          f"(mean {ref.mean():.4f}, std {ref.std():.4f})", flush=True)

    # fresh serving inputs for the static mode (quality must hold off the
    # calibration window)
    rng2 = np.random.RandomState(7)
    xs = np.clip(x + 0.05 * rng2.randn(*x.shape), 0, 1).astype(np.float32)
    evs = (ev + 0.05 * rng2.randn(*ev.shape)).astype(np.float32)
    refs = np.asarray(jax.jit(
        lambda p, a, b: evhinet_fast_forward(p, a, b, dtype=None))(
            params, jnp.asarray(xs), jnp.asarray(evs)))

    qscales = None
    if any(m == "int8st" for m in args.modes):
        @jax.jit
        def _calib(p, a, b):
            q = {}
            out = evhinet_fast_forward(p, a, b, dtype=jnp.bfloat16,
                                       int8="calib", qstate=q)
            return out, jnp.stack(q["amax"])

        _, amax = _calib(params, jnp.asarray(x), jnp.asarray(ev))
        qscales = tuple(float(a) * 1.1 for a in np.asarray(amax))
        print(f"[{time.strftime('%H:%M:%S')}] calibrated {len(qscales)} "
              f"sites", flush=True)

    rows = []
    for name in args.modes:
        int8 = {"bf16": False, "int8": True, "int8st": "static"}[name]
        qs = ({"amax": list(qscales)} if int8 == "static" else None)
        fn = jax.jit(lambda p, a, b, _i=int8, _q=qs: evhinet_fast_forward(
            p, a, b, dtype=jnp.bfloat16, int8=_i, qstate=_q))
        # static serves the off-calibration input against its own f32 ref
        xin, evin, r = ((xs, evs, refs) if int8 == "static"
                        else (x, ev, ref))
        out = np.asarray(fn(params, jnp.asarray(xin), jnp.asarray(evin)))
        db = psnr(out, r)
        rows.append((name, db))
        print(f"{name:7s} vs f32 @{h}x{w}: {db:6.2f} dB", flush=True)

    print("\n| mode | dB vs f32 (production shape) |", flush=True)
    print("|---|---|", flush=True)
    for name, db in rows:
        print(f"| {name} | {db:.2f} |", flush=True)


if __name__ == "__main__":
    main()

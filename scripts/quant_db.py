"""Production-shape int8 quality table (VERDICT round-4 item 4): PSNR of
each int8 serving mode vs the exact f32 forward at the FULL production
geometry (720p, t=23, real event stream), on TPU.

The oracle-shape (64x64/t=5) dB numbers in tests/test_quant.py qualify the
mechanism; this script produces the deployment-decision numbers at the
shape that actually serves.  Methodology matches the bf16 qualification
(bf16 measured 63.7 dB vs f32 at this shape, PERFORMANCE.md round 3).

Usage: python scripts/quant_db.py [--modes bf16 int8 int8s0 int8st int8stc]
                                  [--hw 720x1280] [--events 1048576]
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

from refid_tpu.models import FinalBidirectionAttenfusion, RefidConfig
from refid_tpu.pipeline import BlurVFIPipeline


def psnr(a, b, peak=1.0):
    mse = float(np.mean((np.asarray(a, np.float64)
                         - np.asarray(b, np.float64)) ** 2))
    return 10.0 * np.log10(peak ** 2 / max(mse, 1e-30))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--modes", nargs="*",
                    default=["bf16", "int8", "int8s0", "int8st", "int8stc"])
    ap.add_argument("--hw", default="720x1280")
    ap.add_argument("--events", type=int, default=1 << 20)
    args = ap.parse_args()
    h, w = map(int, args.hw.split("x"))
    m, n = 11, 1
    t = 2 * m + n

    # REAL initializer distributions (init on the host CPU backend — the
    # relay-compiled init costs ~2 min): quantization error depends on the
    # weight/activation distributions, unlike throughput.
    from refid_tpu.serve.host_params import cpu_init_params
    cfg32 = RefidConfig(dtype=None, unroll=True)
    model = FinalBidirectionAttenfusion(cfg32)
    params = cpu_init_params(model.init,
                             jnp.zeros((1, 64, 64, cfg32.img_chn)),
                             jnp.zeros((1, 3, 64, 64, cfg32.ev_chn)))
    print(f"[{time.strftime('%H:%M:%S')}] params ready", flush=True)

    rng = np.random.RandomState(0)
    blur0 = rng.rand(h, w, 3).astype(np.float32)
    blur1 = rng.rand(h, w, 3).astype(np.float32)
    N = args.events
    events = np.empty((N, 4), np.float32)
    events[:, 0] = np.sort(rng.rand(N))
    events[:, 1] = rng.randint(0, w, N)
    events[:, 2] = rng.randint(0, h, N)
    events[:, 3] = rng.randint(0, 2, N)

    cfg16 = RefidConfig(dtype=jnp.bfloat16, unroll=True)
    variants = {
        "bf16": (cfg16, dict(int8=False)),
        "int8": (cfg16, dict(int8=True)),
        "int8s0": (cfg16, dict(int8="scale0")),
        "int8st": (cfg16, dict(int8="static")),
        "int8stc": (cfg16, dict(int8="static")),  # + crest exclusion
    }

    # fresh (non-calibration) inputs: the CALIBRATED modes must be
    # measured OFF the calibration window (serving the window calibrate()
    # saw would give per-site amaxes that exactly cover the test
    # activations — an optimistic number)
    rng2 = np.random.RandomState(7)
    sblur0 = np.clip(blur0 + 0.05 * rng2.randn(*blur0.shape), 0, 1).astype(
        np.float32)
    sblur1 = np.clip(blur1 + 0.05 * rng2.randn(*blur1.shape), 0, 1).astype(
        np.float32)
    Ns = args.events
    sevents = np.empty((Ns, 4), np.float32)
    sevents[:, 0] = np.sort(rng2.rand(Ns))
    sevents[:, 1] = rng2.randint(0, w, Ns)
    sevents[:, 2] = rng2.randint(0, h, Ns)
    sevents[:, 3] = rng2.randint(0, 2, Ns)

    print(f"[{time.strftime('%H:%M:%S')}] computing f32 references "
          f"(exact unrolled forward @{h}x{w} t={t}, both windows)",
          flush=True)
    ref_pipe = BlurVFIPipeline(params, cfg32, m=m, n=n)
    ref = np.asarray(ref_pipe(blur0, blur1, events))
    refs = np.asarray(ref_pipe(sblur0, sblur1, sevents))
    print(f"[{time.strftime('%H:%M:%S')}] f32 references done "
          f"(mean {ref.mean():.4f}, std {ref.std():.4f})", flush=True)

    rows = []
    for name in args.modes:
        cfg, kw = variants[name]
        pipe = BlurVFIPipeline(params, cfg, m=m, n=n, **kw)
        if name.startswith("int8st"):
            pipe.calibrate(blur0, blur1, events, crop=(h // 2, w // 2),
                           headroom=1.1,
                           exclude_crest=(12.0 if name == "int8stc"
                                          else None))
            nex = len(pipe._int8_exclude or ())
            print(f"[{time.strftime('%H:%M:%S')}] {name}: calibrated "
                  f"{len(pipe._int8_scales)} sites, {nex} crest-excluded",
                  flush=True)
            # serve the FRESH window vs its own f32 reference
            out = np.asarray(pipe(sblur0, sblur1, sevents))
            db = psnr(out, refs)
            tag = "(off-calib window)"
        else:
            out = np.asarray(pipe(blur0, blur1, events))
            db = psnr(out, ref)
            tag = ""
            if name == "bf16":
                # the floor on the fresh window too, so the calibrated
                # modes compare against the bf16 floor on THEIR window
                dbf = psnr(np.asarray(pipe(sblur0, sblur1, sevents)), refs)
                print(f"{'bf16':8s} vs f32 @{h}x{w} t={t}: {dbf:6.2f} dB "
                      f"(fresh window floor)", flush=True)
        rows.append((name, db))
        print(f"{name:8s} vs f32 @{h}x{w} t={t}: {db:6.2f} dB {tag}",
              flush=True)

    print("\n| mode | dB vs f32 (production shape) |", flush=True)
    print("|---|---|", flush=True)
    for name, db in rows:
        print(f"| {name} | {db:.2f} |", flush=True)


if __name__ == "__main__":
    main()

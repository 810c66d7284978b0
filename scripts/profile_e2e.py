"""Per-op device profile of the END-TO-END serving bench graph (bench.py's
fori_loop with the anti-LICM carries), to locate in-loop cost that standalone
stage timings miss.

Usage: python scripts/profile_e2e.py [--iters 2] [--events 1048576] [--top 30]
"""

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.profile_forward import parse_xplane  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=2)
    ap.add_argument("--events", type=int, default=1 << 20)
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--dir", default="/tmp/refid_profile_e2e")
    ap.add_argument("--int8", default=False,
                    help="int8 serving mode to profile: True, scale0, "
                         "or static (calibrates on a center crop first)")
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp
    from functools import partial

    jax.config.update("jax_compilation_cache_dir", "/tmp/refid_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from refid_tpu.models import FinalBidirectionAttenfusion, RefidConfig
    from refid_tpu.pipeline import BlurVFIPipeline

    cfg = RefidConfig(dtype=jnp.bfloat16, unroll=True)
    model = FinalBidirectionAttenfusion(cfg)
    m, n = 11, 1
    h, w = 720, 1280
    N = args.events
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
    # host-built params: timing-only (refid_tpu.serve.host_params)
    from refid_tpu.serve.host_params import host_built_params
    params = host_built_params(
        model.init, jax.random.PRNGKey(0),
        jnp.zeros((1, 64, 64, cfg.img_chn)),
        jnp.zeros((1, 3, 64, 64, cfg.ev_chn)))
    int8 = {"True": True, "False": False}.get(str(args.int8), args.int8)
    pipe = BlurVFIPipeline(params, cfg, m=m, n=n, int8=int8)

    qscales = None
    if int8 == "static":
        pipe.calibrate(np.asarray(blur0), np.asarray(blur1),
                       np.asarray(events), crop=(h // 2, w // 2),
                       headroom=1.1)
        qscales = pipe._int8_scales
        print(f"calibrated {len(qscales)} sites", flush=True)

    # EXACTLY bench.py's loop body, so the compiled graph matches the bench.
    @partial(jax.jit, static_argnums=(5,))
    def bench_fn(params, b0, b1, events, n_ev, iters):
        def body(_, carry):
            b0i, evi, s = carry
            out = pipe._run(params, b0i, b1, evi, n_ev, height=h, width=w,
                            qscales=qscales)
            s = jnp.mean(out.astype(jnp.float32))
            b0i = (b0.astype(jnp.float32) + s * 1e-12).astype(b0.dtype)
            evi = events + s * 1e-12
            return (b0i, evi, s)

        return jax.lax.fori_loop(
            0, iters, body, (b0, events, jnp.float32(0.0)))[2]

    float(bench_fn(params, blur0, blur1, events, n_ev, args.iters))

    os.makedirs(args.dir, exist_ok=True)
    with jax.profiler.trace(args.dir):
        float(bench_fn(params, blur0, blur1, events, n_ev, args.iters))

    paths = sorted(glob.glob(os.path.join(
        args.dir, "**", "*.xplane.pb"), recursive=True), key=os.path.getmtime)
    assert paths, "no xplane produced"
    per_op, per_cat, total = parse_xplane(paths[-1])

    it = args.iters
    print(f"== e2e fori_loop iters={it}, events={N}: "
          f"total device op time {total:.1f} ms ({total/it:.1f} ms/iter) ==")
    print("-- by category --")
    for k, v in sorted(per_cat.items(), key=lambda kv: -kv[1]):
        print(f"  {k:15s} {v:9.2f} ms  ({100*v/max(total,1e-9):4.1f}%)")
    print(f"-- top {args.top} ops --")
    for k, v in sorted(per_op.items(), key=lambda kv: -kv[1])[:args.top]:
        print(f"  {v:9.2f} ms  {k[:140]}")


if __name__ == "__main__":
    main()

"""Forward-latency microbenchmark for the flagship model.

Usage: python scripts/time_forward.py [--bf16] [--h 720] [--w 1280] [--t 23]
       [--iters 5] [--remat] [--base 32]
"""

import argparse
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--h", type=int, default=720)
    ap.add_argument("--w", type=int, default=1280)
    ap.add_argument("--t", type=int, default=23)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--base", type=int, default=32)
    ap.add_argument("--label", default="")
    ap.add_argument("--no-atten", action="store_true")
    ap.add_argument("--no-bidir", action="store_true")
    ap.add_argument("--decoder", default="transpose_recurrent")
    ap.add_argument("--num-block", type=int, default=1)
    ap.add_argument("--b", type=int, default=1)
    ap.add_argument("--unroll", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/tmp/refid_tpu_jax_cache")
    from refid_tpu.models import FinalBidirectionAttenfusion, RefidConfig

    cfg = RefidConfig(base_num_channels=args.base,
                      dtype=jnp.bfloat16 if args.bf16 else None,
                      atten_fuse_at=() if args.no_atten else (1,),
                      bidirectional=not args.no_bidir,
                      decoder_type=args.decoder,
                      num_block=args.num_block,
                      unroll=args.unroll)
    model = FinalBidirectionAttenfusion(cfg)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(args.b, args.h, args.w,
                             cfg.img_chn).astype(np.float32))
    ev = jnp.asarray(rng.rand(args.b, args.t, args.h, args.w,
                              cfg.ev_chn).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 64, 64, cfg.img_chn)),
                        jnp.zeros((1, 3, 64, 64, cfg.ev_chn)))

    @partial(jax.jit, static_argnums=(3,))
    def fn(p, x, ev, iters):
        def body(_, carry):
            xi, s = carry
            out = model.apply(p, xi, ev)
            s = jnp.mean(out.astype(jnp.float32))
            return (x + s * 1e-12, s)
        return jax.lax.fori_loop(0, iters, body, (x, jnp.float32(0)))[1]

    float(fn(params, x, ev, 1))
    t0 = time.perf_counter()
    float(fn(params, x, ev, 1))
    d1 = time.perf_counter() - t0
    float(fn(params, x, ev, args.iters + 1))
    t0 = time.perf_counter()
    float(fn(params, x, ev, args.iters + 1))
    d2 = time.perf_counter() - t0
    per = (d2 - d1) / args.iters
    tag = args.label or (("bf16" if args.bf16 else "f32") + ("+unroll" if args.unroll else ""))
    print(f"{tag} b={args.b} {args.h}x{args.w} t={args.t} base={args.base}: "
          f"{per*1000:.0f} ms/forward -> {args.b*args.t/per:.1f} frames/s")


if __name__ == "__main__":
    main()

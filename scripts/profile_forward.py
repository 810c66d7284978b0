"""Per-op device profile of a serving forward (model | fast | fused |
fused_aligned) via jax.profiler + xplane parsing.

Usage: python scripts/profile_forward.py fused_aligned --t 5 [--top 25]
"""

import argparse
import glob
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def categorize(name: str) -> str:
    n = name.lower()
    if "conv" in n and "fusion" in n:
        return "conv-fusion"
    for key in ("custom-call", "convolution", "fusion", "copy", "dynamic",
                "pad", "slice", "transpose", "reshape", "bitcast",
                "broadcast", "select", "maximum", "add", "reduce",
                "all-reduce", "constant", "iota", "concatenate"):
        if key in n:
            return key
    return "other"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("which", nargs="?", default="fused_aligned")
    ap.add_argument("--t", type=int, default=5)
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--dir", default="/tmp/refid_profile")
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/refid_tpu_jax_cache")
    from refid_tpu.models import FinalBidirectionAttenfusion, RefidConfig
    from refid_tpu.serve import fast_forward

    cfg = RefidConfig(dtype=jnp.bfloat16, unroll=True)
    model = FinalBidirectionAttenfusion(cfg)
    b, h, w, t = 1, 720, 1280, args.t
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(b, h, w, cfg.img_chn), jnp.bfloat16)
    ev = jnp.asarray(rng.rand(b, t, h, w, cfg.ev_chn), jnp.bfloat16)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 64, 64, cfg.img_chn)),
                        jnp.zeros((1, 3, 64, 64, cfg.ev_chn)))

    fns = {
        "model": model.apply,
        "fast": lambda p, x, ev: fast_forward(p, cfg, x, ev, fused=False),
        "fused": lambda p, x, ev: fast_forward(p, cfg, x, ev, fused=True),
        "fused_aligned": lambda p, x, ev: fast_forward(
            p, cfg, x, ev, fused="aligned"),
    }
    fn = jax.jit(fns[args.which])
    out = fn(params, x, ev)
    float(jnp.mean(out.astype(jnp.float32)))  # compile+complete

    os.makedirs(args.dir, exist_ok=True)
    with jax.profiler.trace(args.dir):
        out = fn(params, x, ev)
        float(jnp.mean(out.astype(jnp.float32)))

    # parse the newest xplane dump
    paths = sorted(glob.glob(os.path.join(
        args.dir, "**", "*.xplane.pb"), recursive=True), key=os.path.getmtime)
    assert paths, "no xplane produced"
    from tensorflow.core.profiler.protobuf import xplane_pb2
    space = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        space.ParseFromString(f.read())

    per_op = defaultdict(float)
    per_cat = defaultdict(float)
    total = 0.0
    for plane in space.planes:
        if "TPU" not in plane.name or "XLA Ops" not in str(
                [l.name for l in plane.lines]):
            # device plane has lines like "XLA Ops"
            pass
        if "/device:TPU" not in plane.name and "TPU" not in plane.name:
            continue
        ev_meta = plane.event_metadata
        for line in plane.lines:
            if line.name not in ("XLA Ops",):
                continue
            for evt in line.events:
                name = ev_meta[evt.metadata_id].name
                dur = evt.duration_ps / 1e9  # ms
                per_op[name] += dur
                per_cat[categorize(name)] += dur
                total += dur

    print(f"== {args.which} t={t}: total device op time {total:.1f} ms ==")
    print("-- by category --")
    for k, v in sorted(per_cat.items(), key=lambda kv: -kv[1]):
        print(f"  {k:15s} {v:9.2f} ms  ({100*v/max(total,1e-9):4.1f}%)")
    print(f"-- top {args.top} ops --")
    for k, v in sorted(per_op.items(), key=lambda kv: -kv[1])[:args.top]:
        print(f"  {v:9.2f} ms  {k[:110]}")


if __name__ == "__main__":
    main()

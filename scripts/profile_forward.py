"""Per-op device profile of a serving forward (model | fast | packed)
via jax.profiler + xplane parsing.  (Fused Pallas variants deleted in
round 5 — presence-poisoning, see PERFORMANCE.md.)

Usage: python scripts/profile_forward.py packed --t 5 [--top 25]
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


def _fields(msg):
    """Minimal protobuf wire decoder: yields (field, wire, value)."""
    i = 0
    n = len(msg)
    while i < n:
        key = 0
        shift = 0
        while True:
            b = msg[i]; i += 1
            key |= (b & 0x7F) << shift
            shift += 7
            if not b & 0x80:
                break
        field, wire = key >> 3, key & 7
        if wire == 0:
            v = 0; shift = 0
            while True:
                b = msg[i]; i += 1
                v |= (b & 0x7F) << shift
                shift += 7
                if not b & 0x80:
                    break
        elif wire == 2:
            ln = 0; shift = 0
            while True:
                b = msg[i]; i += 1
                ln |= (b & 0x7F) << shift
                shift += 7
                if not b & 0x80:
                    break
            v = msg[i:i + ln]; i += ln
        elif wire == 1:
            v = msg[i:i + 8]; i += 8
        elif wire == 5:
            v = msg[i:i + 4]; i += 4
        else:
            raise ValueError(f"wire {wire}")
        yield field, wire, v


def parse_xplane(path):
    """Aggregate device-plane 'XLA Ops' event durations by op name.

    xplane.proto: XSpace{planes=1} XPlane{name=2, lines=3, event_metadata=4
    (map<int64, XEventMetadata{id=1, name=2}>)} XLine{name=2, events=4}
    XEvent{metadata_id=1, duration_ps=3, num_occurrences=5}.
    """
    data = open(path, "rb").read()
    per_op = defaultdict(float)
    per_cat = defaultdict(float)
    total = 0.0
    for f, w, plane in _fields(data):
        if f != 1 or w != 2:
            continue
        pname = b""
        metas = {}
        lines = []
        for f2, w2, v2 in _fields(plane):
            if f2 == 2:
                pname = v2
            elif f2 == 3:
                lines.append(v2)
            elif f2 == 4:  # map entry {key=1 varint, value=2 XEventMetadata}
                k = None
                name = b""
                for f3, w3, v3 in _fields(v2):
                    if f3 == 1 and w3 == 0:
                        k = v3
                    elif f3 == 2 and w3 == 2:
                        for f4, w4, v4 in _fields(v3):
                            if f4 == 2 and w4 == 2:
                                name = v4
                metas[k] = name.decode(errors="replace")
        if b"TPU" not in pname:
            continue
        for line in lines:
            lname = b""
            events = []
            for f3, w3, v3 in _fields(line):
                if f3 == 2:
                    lname = v3
                elif f3 == 4:
                    events.append(v3)
            if lname != b"XLA Ops":
                continue
            for evb in events:
                mid = 0
                dur = 0
                occ = 1
                for f4, w4, v4 in _fields(evb):
                    if f4 == 1 and w4 == 0:
                        mid = v4
                    elif f4 == 3 and w4 == 0:
                        dur = v4
                    elif f4 == 5 and w4 == 0:
                        occ = v4
                name = metas.get(mid, f"#{mid}")
                ms = dur / 1e9
                per_op[name] += ms
                per_cat[categorize(name)] += ms
                total += ms
    return per_op, per_cat, total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("which", nargs="?", default="packed")
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
        "fast": lambda p, x, ev: fast_forward(p, cfg, x, ev, packed=False),
        "packed": lambda p, x, ev: fast_forward(p, cfg, x, ev, packed=True),
    }
    fn = jax.jit(fns[args.which])
    out = fn(params, x, ev)
    float(jnp.mean(out.astype(jnp.float32)))  # compile+complete

    os.makedirs(args.dir, exist_ok=True)
    with jax.profiler.trace(args.dir):
        out = fn(params, x, ev)
        float(jnp.mean(out.astype(jnp.float32)))

    # parse the newest xplane dump with a minimal protobuf wire decoder
    # (no xplane_pb2 module ships in this environment)
    paths = sorted(glob.glob(os.path.join(
        args.dir, "**", "*.xplane.pb"), recursive=True), key=os.path.getmtime)
    assert paths, "no xplane produced"
    per_op, per_cat, total = parse_xplane(paths[-1])

    print(f"== {args.which} t={t}: total device op time {total:.1f} ms ==")
    print("-- by category --")
    for k, v in sorted(per_cat.items(), key=lambda kv: -kv[1]):
        print(f"  {k:15s} {v:9.2f} ms  ({100*v/max(total,1e-9):4.1f}%)")
    print(f"-- top {args.top} ops --")
    for k, v in sorted(per_op.items(), key=lambda kv: -kv[1])[:args.top]:
        print(f"  {v:9.2f} ms  {k[:110]}")


if __name__ == "__main__":
    main()

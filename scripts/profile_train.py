"""Per-op device profile of ONE training step (fwd+bwd+AdamW) at the
production recipe shape, via jax.profiler + the xplane parser from
profile_forward.py.

Usage: python scripts/profile_train.py [--hw 256] [--t 23] [--top 25]
       [--remat/--no-remat] [--f32]
"""

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from profile_forward import parse_xplane  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hw", type=int, default=256)
    ap.add_argument("--t", type=int, default=23)
    ap.add_argument("--b", type=int, default=1)
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--no-remat", action="store_true")
    ap.add_argument("--f32", action="store_true")
    ap.add_argument("--folded", action="store_true",
                    help="profile the width-folded scan apply "
                         "(serve/fast_scan.py) instead of model.apply")
    ap.add_argument("--tapw", action="store_true",
                    help="per-tap dot_general weight gradients")
    ap.add_argument("--pcast", action="store_true",
                    help="cast params to bf16 once before the scans")
    ap.add_argument("--dir", default="/tmp/refid_profile_train")
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/refid_tpu_jax_cache")
    from refid_tpu.models import FinalBidirectionAttenfusion, RefidConfig
    from refid_tpu.train.losses import charbonnier_loss
    from refid_tpu.train.trainer import build_optimizer, create_train_state

    cfg = RefidConfig(dtype=None if args.f32 else jnp.bfloat16,
                      remat=not args.no_remat)
    model = FinalBidirectionAttenfusion(cfg)
    rng = np.random.RandomState(0)
    b, t, hw = args.b, args.t, args.hw
    lq = jnp.asarray(rng.rand(b, hw, hw, cfg.img_chn).astype(np.float32))
    vox = jnp.asarray(rng.rand(b, t, hw, hw, cfg.ev_chn).astype(np.float32))
    gt = jnp.asarray(rng.rand(b, t, hw, hw, 3).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 64, 64, cfg.img_chn)),
                        jnp.zeros((1, 3, 64, 64, cfg.ev_chn)))
    train_opt = {"optim_g": {"type": "AdamW", "lr": 2e-4,
                             "betas": [0.9, 0.99], "weight_decay": 1e-4},
                 "scheduler": {"type": "TrueCosineAnnealingLR",
                               "T_max": 200000, "eta_min": 1e-7},
                 "grad_clip_norm": 0.01}
    tx, _ = build_optimizer(train_opt, 200000)
    state = create_train_state(params, tx)

    if args.folded:
        from refid_tpu.serve.fast_scan import make_fast_apply
        apply_fn = make_fast_apply(cfg, remat=not args.no_remat,
                                   cast_params_once=args.pcast,
                                   tap_wgrad=args.tapw)
    else:
        apply_fn = model.apply

    @jax.jit
    def step(state, lq, vox, gt):
        def loss_fn(p):
            pred = apply_fn(p, lq, vox).astype(jnp.float32)
            return charbonnier_loss(pred, gt)
        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads), loss

    state, loss = step(state, lq, vox, gt)
    float(loss)  # compile + complete

    os.makedirs(args.dir, exist_ok=True)
    with jax.profiler.trace(args.dir):
        state, loss = step(state, lq, vox, gt)
        float(loss)

    paths = sorted(glob.glob(os.path.join(
        args.dir, "**", "*.xplane.pb"), recursive=True),
        key=os.path.getmtime)
    assert paths, "no xplane produced"
    per_op, per_cat, total = parse_xplane(paths[-1])

    tag = ("f32" if args.f32 else "bf16") + \
        ("" if args.no_remat else "+remat") + \
        ("+folded" if args.folded else "") + \
        ("+tapw" if args.tapw else "") + ("+pcast" if args.pcast else "")
    print(f"== train step {tag} hw={hw} t={t}: "
          f"total device op time {total:.1f} ms ==")
    print("-- by category --")
    for k, v in sorted(per_cat.items(), key=lambda kv: -kv[1]):
        print(f"  {k:15s} {v:9.2f} ms  ({100*v/max(total,1e-9):4.1f}%)")
    print(f"-- top {args.top} ops --")
    for k, v in sorted(per_op.items(), key=lambda kv: -kv[1])[:args.top]:
        print(f"  {v:9.2f} ms  {k[:110]}")


if __name__ == "__main__":
    main()

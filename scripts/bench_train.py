"""Training-step benchmark at the production blur-VFI 11+1 recipe shape.

Measures the jitted train step (fwd + bwd + AdamW + global-norm clip 0.01)
at 256x256 crops, t=23 bin pairs, b=1 per chip — the exact shape of the
reference's 200k-iteration recipe
(options/train/GoPro/Final_bidirectionEncoder_XXNet_1attenfusion.yml:37-47,
basicsr/train.py:217-259) — across compute-dtype / remat / unroll variants.

Relay-safe timing: N steps are chained inside ONE jitted lax.fori_loop
(the TrainState is the loop carry, so step k+1 depends on step k's params)
and completion is forced by fetching the final loss scalar.

Cost model: 54.1 TFLOP per t=23 720p forward (PERFORMANCE.md round-2
correction) scales by area to 3.85 TFLOP per 256^2 forward; a train step
~= 3x forward FLOPs = 11.54 TFLOP/step.

Usage: python scripts/bench_train.py [variant ...]   (default: all)
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

FWD_TFLOP_256 = 54.1 * (256 * 256) / (720 * 1280)
STEP_TFLOP = 3.0 * FWD_TFLOP_256


def build_variants():
    import jax.numpy as jnp
    return {
        "f32": dict(dtype=None, remat=False, unroll=False),
        "f32_remat": dict(dtype=None, remat=True, unroll=False),
        "bf16": dict(dtype=jnp.bfloat16, remat=False, unroll=False),
        "bf16_remat": dict(dtype=jnp.bfloat16, remat=True, unroll=False),
        "bf16_unroll": dict(dtype=jnp.bfloat16, remat=False, unroll=True),
        "bf16_unroll_remat": dict(dtype=jnp.bfloat16, remat=True,
                                  unroll=True),
        "f32_unroll": dict(dtype=None, remat=False, unroll=True),
        # partial scan unroll: bounded graph, fewer loop-boundary layouts
        "bf16_remat_su4": dict(dtype=jnp.bfloat16, remat=True,
                               scan_unroll=4),
        "bf16_remat_su8": dict(dtype=jnp.bfloat16, remat=True,
                               scan_unroll=8),
        "bf16_su4": dict(dtype=jnp.bfloat16, scan_unroll=4),
        "bf16_remat_su23": dict(dtype=jnp.bfloat16, remat=True,
                                scan_unroll=23),
        "bf16_remat_st": dict(dtype=jnp.bfloat16, remat=True,
                              scan_split_transpose=True),
        "bf16_st": dict(dtype=jnp.bfloat16, scan_split_transpose=True),
        "bf16_remat_stageout": dict(dtype=jnp.bfloat16, remat=True,
                                    remat_policy="stage_outputs"),
        # width-folded lax.scan training forward (serve/fast_scan.py):
        # exact math, lane-dense scale-0, bounded graph
        "folded_bf16_remat": dict(dtype=jnp.bfloat16, folded=True,
                                  folded_remat=True),
        "folded_bf16": dict(dtype=jnp.bfloat16, folded=True,
                            folded_remat=False),
        "folded_f32_remat": dict(dtype=None, folded=True, folded_remat=True),
        "folded_bf16_remat_su4": dict(dtype=jnp.bfloat16, folded=True,
                                      folded_remat=True, folded_unroll=4),
        # remat with a save-conv-outputs policy: backward skips the conv
        # recompute (the dominant fwd cost), elementwise glue still remats
        "folded_bf16_rematconv": dict(dtype=jnp.bfloat16, folded=True,
                                      folded_remat="convs"),
        # cast params to bf16 ONCE before the scans: kernel-grad cotangents
        # accumulate in bf16 scan carries instead of f32 (round 4)
        "folded_bf16_remat_pcast": dict(dtype=jnp.bfloat16, folded=True,
                                        folded_remat=True,
                                        folded_pcast=True),
        "folded_bf16_pcast": dict(dtype=jnp.bfloat16, folded=True,
                                  folded_remat=False, folded_pcast=True),
        # per-tap dot_general weight gradients (serve/tapgrad.py)
        "folded_bf16_remat_tapw": dict(dtype=jnp.bfloat16, folded=True,
                                       folded_remat=True, folded_tapw=True),
        "folded_bf16_remat_pcast_tapw": dict(
            dtype=jnp.bfloat16, folded=True, folded_remat=True,
            folded_pcast=True, folded_tapw=True),
    }


def bench_variant(name, cfg_kwargs, iters=8, b=1, t=23, hw=256):
    import jax
    import jax.numpy as jnp
    from refid_tpu.models import FinalBidirectionAttenfusion, RefidConfig
    from refid_tpu.train.losses import charbonnier_loss
    from refid_tpu.train.trainer import (build_optimizer, create_train_state)

    cfg_kwargs = dict(cfg_kwargs)
    folded = cfg_kwargs.pop("folded", False)
    folded_remat = cfg_kwargs.pop("folded_remat", True)
    folded_unroll = cfg_kwargs.pop("folded_unroll", 1)
    folded_pcast = cfg_kwargs.pop("folded_pcast", False)
    folded_tapw = cfg_kwargs.pop("folded_tapw", False)
    cfg = RefidConfig(**cfg_kwargs)
    model = FinalBidirectionAttenfusion(cfg)
    if folded:
        from refid_tpu.serve.fast_scan import make_fast_apply
        apply_fn = make_fast_apply(cfg, remat=folded_remat,
                                   unroll=folded_unroll,
                                   cast_params_once=folded_pcast,
                                   tap_wgrad=folded_tapw)
    else:
        apply_fn = model.apply
    rng = np.random.RandomState(0)
    lq = jnp.asarray(rng.rand(b, hw, hw, cfg.img_chn).astype(np.float32))
    vox = jnp.asarray(rng.rand(b, t, hw, hw, cfg.ev_chn).astype(np.float32))
    gt = jnp.asarray(rng.rand(b, t, hw, hw, 3).astype(np.float32))

    # host-built params: timing-only — loss values differ from init'd
    # weights, step timing does not (refid_tpu.serve.host_params)
    from refid_tpu.serve.host_params import host_built_params
    params = host_built_params(
        model.init, jax.random.PRNGKey(0),
        jnp.zeros((1, 64, 64, cfg.img_chn)),
        jnp.zeros((1, 3, 64, 64, cfg.ev_chn)))
    train_opt = {"optim_g": {"type": "AdamW", "lr": 2e-4,
                             "betas": [0.9, 0.99], "weight_decay": 1e-4},
                 "scheduler": {"type": "TrueCosineAnnealingLR",
                               "T_max": 200000, "eta_min": 1e-7},
                 "grad_clip_norm": 0.01}
    tx, _ = build_optimizer(train_opt, 200000)
    state = create_train_state(params, tx)

    def one_step(state, lq, vox, gt):
        def compute_loss(p):
            pred = apply_fn(p, lq, vox)
            return charbonnier_loss(pred.astype(jnp.float32), gt)
        loss, grads = jax.value_and_grad(compute_loss)(state.params)
        return state.apply_gradients(grads), loss

    from functools import partial

    # `n` is TRACED: one executable per variant (the relay charges ~3 min
    # compile + ~5 min first-execution load PER EXECUTABLE — the static-n
    # formulation paid that twice per variant)
    @partial(jax.jit, donate_argnums=(0,))
    def run(state, lq, vox, gt, n):
        def body(_, carry):
            st, _ = carry
            st, loss = one_step(st, lq, vox, gt)
            return st, loss
        return jax.lax.fori_loop(0, n, body, (state, jnp.float32(0.0)))

    def timed(n, st):
        t0 = time.perf_counter()
        st, loss = run(st, lq, vox, gt, jnp.int32(n))
        loss = float(loss)
        return time.perf_counter() - t0, st, loss

    t0 = time.perf_counter()
    _, state, loss1 = timed(1, state)       # compile + relay load + 1 step
    compile_s = time.perf_counter() - t0
    dt1, state, _ = timed(1, state)         # dispatch + 1 step
    dtn, state, lossn = timed(iters + 1, state)
    # subtract the 1-step run (dispatch + one step) from the (iters+1)-step
    # run to cancel dispatch overhead
    dtn2, state, _ = timed(iters + 1, state)
    step_s = (dtn2 - dt1) / iters
    tfs = STEP_TFLOP / step_s
    rec = {"variant": name, "ms_per_step": round(step_s * 1e3, 1),
           "steps_per_s": round(1.0 / step_s, 3),
           "achieved_TFLOP_s": round(tfs, 1),
           "compile_s": round(compile_s, 1),
           "loss_first": round(loss1, 5), "loss_n": round(lossn, 5)}
    print(json.dumps(rec), flush=True)
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("variants", nargs="*", default=None)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--hw", type=int, default=256)
    ap.add_argument("--t", type=int, default=23)
    ap.add_argument("--b", type=int, default=1)
    args = ap.parse_args()
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/refid_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    variants = build_variants()
    names = args.variants or list(variants)
    out = []
    for n in names:
        try:
            out.append(bench_variant(n, variants[n], iters=args.iters,
                                     b=args.b, t=args.t, hw=args.hw))
        except Exception as e:  # OOM etc. — record and continue
            print(json.dumps({"variant": n, "error": repr(e)[:2000]}),
                  flush=True)
    return out


if __name__ == "__main__":
    main()

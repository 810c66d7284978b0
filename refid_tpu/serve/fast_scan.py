"""Width-folded TRAINING apply: the serving path's exact lane-density
reparameterizations (serve/packing.py) inside ``lax.scan`` bodies.

Why: the measured training step (PERFORMANCE.md round 3) runs the plain
scanned model at 443 ms / 26 TF/s (13% MFU) — it inherits the scan
model's lane-padding tax twice over (fwd+bwd): every scale-0 tensor is
32/64 channels, physically padded to 128 lanes in HBM.  The serving path
fixed this with exact width-folding, but only for the trace-time-unrolled
forward — and the t=23 UNROLLED training graph does not compile through
the bench relay.  This module applies the same exact reparameterizations
with the temporal loop as ``lax.scan`` (bounded graph), differentiable
end-to-end: the folded kernels are built from the original params by
jnp ops, so gradients flow back to the canonical parameter layout and
the optimizer state/checkpoint format is unchanged.

Exact math (== model.apply; tested in tests/test_fast_scan.py for both
the forward values and the parameter gradients).

Reference being replaced: the training-time forward of
XXNet_final_attenfusion_arch.py:172-216.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from refid_tpu.serve.fast_forward import (_conv, _egaca_img_branch,
                                          _enc_stage, _enc_stage0_folded)

__all__ = ["make_fast_apply", "fast_apply_scan"]


def _conv_outputs_saveable(prim, *_, **__):
    """jax.checkpoint policy: save every convolution result in the scan
    body, recompute only the cheap elementwise/layout glue.  The folded
    step's backward otherwise re-runs all ~25 convs of the body before
    computing grads; at 256^2/t=23 the saved residuals are ~2 GB — well
    inside HBM — and the recompute they remove is the dominant fwd cost."""
    return prim.name == "conv_general_dilated"


def fast_apply_scan(params, cfg, x, event, *, remat=True, unroll=1,
                    cast_params_once=False, tap_wgrad=False):
    """Production blur-VFI forward (aliased backward states) as two
    ``lax.scan``s over width-folded step bodies.  Same input/output
    contract as ``model.apply`` / ``fast_forward``:
    x (b, h, w, img_chn) or (b, 2, h, w, c); event (b, t, h, w, ev_chn)
    -> (b, t, h, w, out_chn).

    ``remat``: False = save everything; True = full per-step remat;
    "convs" = remat with a save-conv-outputs policy (backward skips the
    conv recompute, elementwise glue is still rematerialized).

    ``cast_params_once``: cast the param tree to ``cfg.dtype`` ONCE before
    the scans instead of per-op inside the bodies.  Forward math is
    IDENTICAL (the per-op casts become no-ops; folded-kernel construction
    is a pure rearrangement, so bf16-before == bf16-after bit-exact), but
    under ``grad`` the scans' kernel-grad cotangents then accumulate in
    bf16 carries rather than f32 — the per-leaf sum over t contributions
    rounds at bf16 precision (~0.4% relative worst-case).  Training-loop
    equivalence is pinned by tests/test_fast_scan.py.
    """
    from refid_tpu.serve.packing import (space_to_depth, depth_to_space,
                                         conv_s2d, s2d_to_wfold,
                                         conv_transpose_up_folded)
    from refid_tpu.serve.fast_forward import _trunk_folded, _trunk, \
        _conv_transpose_up

    if remat not in (True, False, "convs"):
        raise ValueError(
            f"remat must be True, False, or 'convs'; got {remat!r}")
    if tap_wgrad:
        # trace the whole apply under the tap-wgrad scope: every stride-1
        # conv gets the per-tap dot_general weight-gradient VJP
        # (serve/tapgrad.py).  Forward math unchanged.
        from refid_tpu.serve.packing import tap_wgrad_scope
        with tap_wgrad_scope(True):
            return fast_apply_scan(
                params, cfg, x, event, remat=remat, unroll=unroll,
                cast_params_once=cast_params_once, tap_wgrad=False)
    assert cfg.bidirectional and cfg.aliased_backward_states
    assert cfg.recurrent_cell == "simpleconv" and cfg.num_block == 1
    assert cfg.encoder_stage == "then_down"
    assert cfg.decoder_type == "transpose_recurrent"
    assert cfg.siamese_fusion is None
    assert cfg.num_encoders >= 2
    assert cfg.apply_resblocks and cfg.bottleneck_img_add
    assert not cfg.bidir_decoder and not cfg.use_first_dcn
    p = params["params"] if "params" in params else params
    dt = cfg.dtype
    if cast_params_once and dt is not None:
        p = jax.tree_util.tree_map(
            lambda a: a.astype(dt) if a.dtype == jnp.float32 else a, p)
    atten_at = tuple(cfg.atten_fuse_at)
    n_enc = cfg.num_encoders

    if x.ndim == 5:
        x = jnp.concatenate([x[:, i] for i in range(x.shape[1])], axis=-1)
    if event.shape[-1] == 4 * cfg.ev_chn:
        # pre-packed serving input: s2d(2,2) voxel-bin pairs
        # (b, t, h/2, w/2, 4*ev_chn) — same contract as fast_forward; the
        # on-device voxelizer emits this directly so the 64x-lane-padded
        # raw (.., ev_chn) stack never materializes
        b, t, h2, w2, _ = event.shape
        h, w = 2 * h2, 2 * w2
    else:
        b, t, h, w, _ = event.shape

    kcache = {}  # top-level-trace only: bodies build their own (see below)

    # event head + scale-0 stage conv, batched over t x directions at the
    # TOP level (outside the scans): both are image/state-independent
    if event.shape[-1] == 4 * cfg.ev_chn:
        evp = event.reshape(b * t, h // 2, w // 2, event.shape[-1])
    else:
        evp = space_to_depth(event.reshape(b * t, h, w, event.shape[-1]), 2)
    hf = conv_s2d(evp, p["head"]["kernel"], p["head"]["bias"], 2, dt)
    hf = jnp.maximum(hf, 0.2 * hf)
    hfw = s2d_to_wfold(hf)  # (b*t, h, w/2, 2c)
    stage = {}
    for d in ("bwd", "fwd"):
        pc = p[d]["enc_0"]["conv"]["conv"]
        s_ = conv_s2d(hfw, pc["kernel"], pc["bias"], (1, 2), dt,
                      cache=kcache)
        s_ = jnp.maximum(s_, 0.04 * s_)
        # t-leading for lax.scan
        stage[d] = s_.reshape(b, t, h, w // 2, s_.shape[-1]).transpose(
            1, 0, 2, 3, 4)

    # image head + encoder pyramid (once)
    xh = _conv(p["head_img"]["conv"], x, padding=2, slope=0.2, dtype=dt)
    x_blocks = []
    cur = xh
    for i in range(n_enc):
        pi = p[f"img_enc_{i}"]
        o = _conv(pi["conv1"], cur, padding=1, slope=0.2, dtype=dt)
        o = _conv(pi["conv2"], o, padding=1, slope=0.2, dtype=dt)
        o = o + _conv(pi["identity"], cur, dtype=dt)
        cur = _conv(pi["down"], o, stride=2, padding=1, dtype=dt)
        x_blocks.append(cur)

    # EGACA image branch once per (direction, attended stage)
    egaca_img = {}
    for d in ("bwd", "fwd"):
        for i in atten_at:
            if 0 < i < n_enc:
                egaca_img[(d, i)] = _egaca_img_branch(
                    p[d][f"enc_{i}"]["atten"], x_blocks[i - 1], dt)

    zdt = dt or jnp.float32
    enc_zero = [jnp.zeros((b, h >> i, w >> i, cfg.encoder_out_sizes[i]),
                          zdt) for i in range(n_enc)]
    enc_zero[0] = jnp.zeros((b, h, w // 2, 2 * cfg.encoder_out_sizes[0]),
                            zdt)

    # NOTE on folded-kernel caches inside the scan bodies: a cache dict
    # shared across body traces would leak one body's tracers into the
    # other, so bodies pass kc=None and rebuild — the construction ops are
    # loop-invariant (params only) and XLA hoists them out of the while
    # loop; under remat they are recomputed at kernel-size cost (tiny).

    def bwd_body(states, e0):
        states = list(states)
        e = e0
        for i in range(n_enc):
            y = None if i == 0 else x_blocks[i - 1]
            if i == 0:
                e, states[0] = _enc_stage0_folded(
                    p["bwd"]["enc_0"], e, states[0], None, dt,
                    pre_staged=True)
            else:
                e, states[i] = _enc_stage(
                    p["bwd"][f"enc_{i}"], i, atten_at, e, y, states[i],
                    None, dt, opt=True, egaca_img=egaca_img.get(("bwd", i)))
        return tuple(states), None

    ckpt_kw = dict(prevent_cse=False)
    if remat == "convs":
        ckpt_kw["policy"] = _conv_outputs_saveable
    if remat:
        bwd_body = jax.checkpoint(bwd_body, **ckpt_kw)
    bwd_final, _ = jax.lax.scan(bwd_body, tuple(enc_zero), stage["bwd"],
                                reverse=True, unroll=unroll)

    dec_zero = [jnp.zeros((b, h >> (n_enc - i - 1), w >> (n_enc - i - 1),
                           cfg.encoder_out_sizes[n_enc - i - 1] // 2), zdt)
                for i in range(n_enc)]
    dec_zero[n_enc - 1] = jnp.zeros(
        (b, h, w // 4, 4 * cfg.encoder_out_sizes[0] // 2), zdt)
    if n_enc >= 2:
        dec_zero[n_enc - 2] = jnp.zeros(
            (b, h // 2, w // 4, 2 * cfg.encoder_out_sizes[1] // 2), zdt)
    xh_f4 = space_to_depth(xh, (1, 4))

    def fwd_body(carry, e0):
        fwd_states, dec_states = list(carry[0]), list(carry[1])
        e = e0
        e_blocks = []
        for i in range(n_enc):
            y = None if i == 0 else x_blocks[i - 1]
            if i == 0:
                e, fwd_states[0] = _enc_stage0_folded(
                    p["fwd"]["enc_0"], e, fwd_states[0], bwd_final[0], dt,
                    pre_staged=True)
            else:
                e, fwd_states[i] = _enc_stage(
                    p["fwd"][f"enc_{i}"], i, atten_at, e, y, fwd_states[i],
                    bwd_final[i], dt, opt=True,
                    egaca_img=egaca_img.get(("fwd", i)))
            e_blocks.append(e)
        for j in range(cfg.num_residual_blocks):
            pr = p["fwd"][f"res_{j}"]
            inp = e + x_blocks[-1] if j == 0 else e
            o = jax.nn.relu(_conv(pr["conv1"], inp, padding=1, dtype=dt))
            o = _conv(pr["conv2"], o, padding=1, dtype=dt)
            e = jax.nn.relu(o + inp)
        for i in range(n_enc):
            pd = p["fwd"][f"dec_{i}"]
            skip = e_blocks[n_enc - i - 1]
            if i == n_enc - 2:
                up = conv_transpose_up_folded(
                    e + skip, pd["up"]["kernel"], pd["up"]["bias"], dt,
                    r_in=1, r_out=2)
                e = _trunk_folded(pd["trunk"], up, dec_states[i], 2, dt)
            elif i == n_enc - 1:
                skip_f2 = space_to_depth(skip, (1, 2))
                up = conv_transpose_up_folded(
                    e + skip_f2, pd["up"]["kernel"], pd["up"]["bias"], dt,
                    r_in=2, r_out=4)
                e = _trunk_folded(pd["trunk"], up, dec_states[i], 4, dt)
            else:
                up = _conv_transpose_up(pd["up"], e + skip, dt)
                e = _trunk(pd["trunk"], up, dec_states[i], dt)
            dec_states[i] = e
        pk = p["fwd"]["pred"]["conv"]
        out = conv_s2d(e + xh_f4, pk["kernel"], pk["bias"], (1, 4), dt)
        return (tuple(fwd_states), tuple(dec_states)), out

    if remat:
        fwd_body = jax.checkpoint(fwd_body, **ckpt_kw)
    _, outs = jax.lax.scan(fwd_body, (tuple(enc_zero), tuple(dec_zero)),
                           stage["fwd"], unroll=unroll)
    # outs (t, b, h, w/4, 4*oc) -> (b, t, h, w, oc)
    oc4 = outs.shape[-1]
    outs = outs.transpose(1, 0, 2, 3, 4)
    return depth_to_space(
        outs.reshape(b * t, h, w // 4, oc4), (1, 4)).reshape(
            b, t, h, w, oc4 // 4)


def make_fast_apply(cfg, remat=True, unroll=1, cast_params_once=False,
                    tap_wgrad=False):
    """Drop-in ``apply_fn(params, lq, voxel) -> pred`` for
    train.trainer.make_train_step, running the folded scan forward."""
    def apply_fn(params, lq, voxel):
        return fast_apply_scan(params, cfg, lq, voxel, remat=remat,
                               unroll=unroll,
                               cast_params_once=cast_params_once,
                               tap_wgrad=tap_wgrad)
    return apply_fn

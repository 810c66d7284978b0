"""Serving-path forward: a functional replay of the production
FinalBidirectionAttenfusion over its params pytree.

Why this exists (instead of model.apply): the serving hot path wants
trace-time-unrolled temporal loops, exact width-folded / space-to-depth
reparameterizations (serve/packing.py), and the int8 MXU modes
(serve/quant.py), without threading serving flags through every flax
module.  The module tree stays the single source of truth for parameters
and training; this file re-expresses only the PRODUCTION configuration of
the forward (bidirectional, aliased backward states, EGACA at encoder 1,
simpleconv recurrence, transpose-recurrent decoder, num_block=1),
asserting on anything else.

Exactness: op-for-op the same math as model.apply (tested bit-comparable
in tests/test_fast_forward.py); the int8 modes are NOT exact and are
dB-gated (tests/test_quant.py).

NO Pallas kernels on this path, by measurement: the presence of ANY
tpu_custom_call in the serving graph demotes the surrounding XLA convs
from ~95 TF/s conv-fusions to ~16 TF/s loop fusions (~2.6x on a probe
graph, ~400 ms on the e2e window) — isolated with a trivial passthrough
kernel in scripts/probe_poison.py; neither optimization_barrier nor
materialized converts stop it.  Rounds 4-5 measured three kernels
(fused trunk, fused EGACA v1 folded-I/O, v2 unfolded-I/O) that each won
their region standalone and lost e2e to this effect; they are deleted
(see PERFORMANCE.md round 5 and git history).

Reference hot loop being replaced: XXNet_final_attenfusion_arch.py:172-216.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp

__all__ = ["fast_forward"]


def _conv(p, x, stride=1, padding=0, slope=None, dtype=None, groups=1):
    k = p["kernel"]
    if dtype is not None:
        x, k = x.astype(dtype), k.astype(dtype)
    if stride == 1 and groups == 1:
        from refid_tpu.serve.packing import _stride1_conv
        out = _stride1_conv(x, k, [(padding, padding)] * 2)
    elif groups == 1:
        from refid_tpu.serve.packing import _strided_conv
        out = _strided_conv(x, k, (stride, stride),
                            [(padding, padding)] * 2)
    else:
        out = jax.lax.conv_general_dilated(
            x, k, (stride, stride), [(padding, padding)] * 2,
            feature_group_count=groups,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if "bias" in p:
        b = p["bias"]
        out = out + (b.astype(dtype) if dtype is not None else b)
    if slope is not None:
        out = jnp.maximum(out, out * slope)
    return out


def _conv_transpose_up(p, x, dtype=None):
    k = p["kernel"]
    if dtype is not None:
        x, k = x.astype(dtype), k.astype(dtype)
    out = jax.lax.conv_transpose(
        x, k, (2, 2), "VALID", transpose_kernel=True,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    b = p["bias"]
    return out + (b.astype(dtype) if dtype is not None else b)


def _layernorm2d(p, x, dtype=None, eps=1e-6):
    scale, bias = p["scale"], p["bias"]
    if dtype is not None:
        scale, bias = scale.astype(dtype), bias.astype(dtype)
        x = x.astype(dtype)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mu) ** 2, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * scale + bias


def _se(p, x, dtype=None):
    w = jnp.mean(x, axis=(1, 2), keepdims=True)
    w = jax.nn.relu(_conv(p["fc1"], w, dtype=dtype))
    return jax.nn.sigmoid(_conv(p["fc2"], w, dtype=dtype))


def _cast(v, dtype):
    return v.astype(dtype) if dtype is not None else v


def _egaca_img_branch(p, image_feat, dtype=None):
    """The image-side pre-gate chain of EGACA: norm1 -> conv1 -> depthwise
    conv2 -> gelu.  Image features and per-direction params are identical
    for every t step, so the serving loop computes this ONCE per direction
    and reuses it (exact; the reference recomputes it per frame —
    XXNet_final_attenfusion_arch.py:176/189)."""
    dw = p["conv1"]["kernel"].shape[-1]
    x = _layernorm2d(p["norm1"], image_feat, dtype)
    x = _conv(p["conv1"], x, dtype=dtype)
    x = _conv(p["conv2"], x, padding=1, dtype=dtype, groups=dw)
    return jax.nn.gelu(x, approximate=False)


def _egaca(p, event_feat, image_feat, dtype=None, img_branch=None):
    """CrossmodalAtten all_add=True (models/fusion.py:25-84)."""
    dw = p["conv1"]["kernel"].shape[-1]
    x = (_egaca_img_branch(p, image_feat, dtype)
         if img_branch is None else img_branch)
    x_e = _layernorm2d(p["norm1_e"], event_feat, dtype)
    x_e = _conv(p["conv1_e"], x_e, dtype=dtype)
    x_e = _conv(p["conv2_e"], x_e, padding=1, dtype=dtype, groups=dw)
    x_e = jax.nn.gelu(x_e, approximate=False)
    gate = _se(p["se_1"], x_e, dtype)
    x, x_e = x * gate, x_e * gate
    x = _conv(p["conv3"], jnp.concatenate([x, x_e], axis=-1), dtype=dtype)
    y = event_feat + image_feat + x * _cast(p["beta"], dtype)
    ffn = _conv(p["conv4"], _layernorm2d(p["norm2"], y, dtype), dtype=dtype)
    ffn = jax.nn.gelu(ffn, approximate=False)
    ffn = _conv(p["conv5"], ffn, dtype=dtype)
    y = _conv(p["conv_y_side"], y, dtype=dtype)
    return y + ffn * _cast(p["gamma"], dtype)


def _trunk(p, x, state, dtype=None, q=None):
    """ConvResidualBlocks num_block=1 over [x, state].  ``q`` (a kernel-quant
    memo dict) routes the three convs through int8 MXU arithmetic
    (serve/quant.py) — NOT exact math, gated on measured dB."""
    ci, b0 = p["conv_in"], p["block_0"]
    if q is not None:
        from refid_tpu.serve.quant import conv_int8
        h = conv_int8(ci, jnp.concatenate([x, state], axis=-1), padding=1,
                      slope=0.1, out_dtype=dtype, cache=q)
        h1 = conv_int8(b0["conv1"], h, padding=1, relu=True,
                       out_dtype=dtype, cache=q)
        return h + conv_int8(b0["conv2"], h1, padding=1, out_dtype=dtype,
                             cache=q)
    h = _conv(ci, jnp.concatenate([x, state], axis=-1), padding=1,
              slope=0.1, dtype=dtype)
    h1 = jax.nn.relu(_conv(b0["conv1"], h, padding=1, dtype=dtype))
    return h + _conv(b0["conv2"], h1, padding=1, dtype=dtype)


def _enc_stage(p, i, atten_at, e, y, state, bwd_state, dtype=None,
               opt=False, q=None, egaca_img=None):
    """RecurrentEncoderStage (models/recurrent.py:89-145), simpleconv cell.

    ``opt`` enables two profile-guided algebraic rewrites (exact math):
      * the stage's chained lrelus — ConvLayer's slope-0.2 epilogue followed
        by the stage's extra leaky_relu — collapse to ONE slope-0.04
        epilogue (max-of-max identity), removing a standalone full-res
        elementwise pass per stage per direction;
      * fuse_bidir's 1x1 conv over concat([e, bwd]) splits into two matmuls
        summed (no concat materialization) — for a 1x1 there is no tap
        structure to lose, unlike the 3x3 case PERFORMANCE.md rejected.
    """
    if q is not None:
        from refid_tpu.serve.quant import conv_int8
    if y is None:
        slope = 0.04 if opt else 0.2
        if q is not None:
            e = conv_int8(p["conv"]["conv"], e, padding=1, slope=slope,
                          out_dtype=dtype, cache=q)
        else:
            e = _conv(p["conv"]["conv"], e, padding=1, slope=slope,
                      dtype=dtype)
        if not opt:
            e = jnp.maximum(e, e * 0.2)  # ConvLayer + stage's extra lrelu
    elif i in atten_at:
        e = _egaca(p["atten"], e, y, dtype, img_branch=egaca_img)
    else:
        slope = 0.04 if opt else 0.2
        if q is not None:
            e = conv_int8(p["conv"]["conv"], e + y, padding=1, slope=slope,
                          out_dtype=dtype, cache=q)
        else:
            e = _conv(p["conv"]["conv"], e + y, padding=1, slope=slope,
                      dtype=dtype)
        if not opt:
            e = jnp.maximum(e, e * 0.2)
    e = _trunk(p["rec"]["trunk"], e, state, dtype, q=q)
    new_state = e
    if bwd_state is not None:
        pf = p["fuse_bidir"]["conv"]
        if opt:
            k = pf["kernel"]  # (1, 1, 2C, C)
            c = e.shape[-1]
            o = _conv({"kernel": k[:, :, :c]}, e, dtype=dtype)
            o = o + _conv({"kernel": k[:, :, c:], "bias": pf["bias"]},
                          bwd_state, dtype=dtype)
            e = jnp.maximum(o, o * 0.2)
        else:
            e = _conv(pf, jnp.concatenate([e, bwd_state], axis=-1),
                      slope=0.2, dtype=dtype)
    if q is not None:
        e = conv_int8(p["down"], e, stride=2, padding=1, out_dtype=dtype,
                      cache=q)
    else:
        e = _conv(p["down"], e, stride=2, padding=1, dtype=dtype)
    return e, new_state


def _trunk_folded(p, x_f, s_f, r, dtype=None, kc=None, q=None):
    """ConvResidualBlocks over width-fold-r inputs (exact reparameterization
    — serve/packing.py).  ``q`` routes the three folded convs through int8
    (serve/quant.py conv_s2d_int8) — not exact math, dB-gated."""
    from refid_tpu.serve.packing import (conv_s2d, fold_concat,
                                         plain_concat_perm)
    ci, b0 = p["conv_in"], p["block_0"]
    if q is not None:
        from refid_tpu.serve.quant import conv_s2d_int8
        cat = fold_concat([x_f, s_f], r)
        h = conv_s2d_int8(cat, ci["kernel"], ci["bias"], (1, r),
                          out_dtype=dtype, slope=0.1, cache=q)
        h1 = conv_s2d_int8(h, b0["conv1"]["kernel"], b0["conv1"]["bias"],
                           (1, r), out_dtype=dtype, relu=True, cache=q)
        return h + conv_s2d_int8(h1, b0["conv2"]["kernel"],
                                 b0["conv2"]["bias"], (1, r),
                                 out_dtype=dtype, cache=q)
    # plain channel concat + input-permuted folded kernel: exact, and
    # removes fold_concat's strided phase interleave (a measured ~0.5 ms
    # gather per trunk input at 256^2 — profile_train round 4)
    c_ = x_f.shape[-1] // r
    cat = jnp.concatenate([x_f, s_f], axis=-1)
    perm = plain_concat_perm((1, r), (c_, c_))
    h = conv_s2d(cat, ci["kernel"], ci["bias"], (1, r), dtype, cache=kc,
                 in_perm=perm, perm_tag="plaincat")
    h = jnp.maximum(h, 0.1 * h)
    h1 = jax.nn.relu(conv_s2d(h, b0["conv1"]["kernel"],
                              b0["conv1"]["bias"], (1, r), dtype, cache=kc))
    return h + conv_s2d(h1, b0["conv2"]["kernel"], b0["conv2"]["bias"],
                        (1, r), dtype, cache=kc)


def _enc_stage0_folded(p, e_f2, state_f2, bwd_f2, dtype=None, kc=None,
                       q=None, pre_staged=False):
    """Scale-0 encoder stage entirely in width-fold-2 (64ch -> 128 lanes):
    the full-resolution 32/64-channel tensors that pay 2-4x lane-padding
    tax in HBM never exist.  Exact math; the chained lrelus collapse to one
    slope-0.04 epilogue and fuse_bidir runs as two concat-free matmuls.

    ``pre_staged=True``: ``e_f2`` is already the stage conv's lrelu output
    (the caller computes that image/state-independent conv from the
    shared head-feature cache — serving-loop restructure, round 3)."""
    from refid_tpu.serve.packing import conv_s2d, down_conv_folded
    if pre_staged:
        e = e_f2
    else:
        pc = p["conv"]["conv"]
        e = conv_s2d(e_f2, pc["kernel"], pc["bias"], (1, 2), dtype, cache=kc)
        e = jnp.maximum(e, 0.04 * e)
    e = _trunk_folded(p["rec"]["trunk"], e, state_f2, 2, dtype, kc=kc, q=q)
    new_state = e
    if bwd_f2 is not None:
        pf = p["fuse_bidir"]["conv"]
        k = pf["kernel"]
        c = k.shape[-1]
        o = conv_s2d(e, k[:, :, :c], None, (1, 2), dtype, cache=kc)
        o = o + conv_s2d(bwd_f2, k[:, :, c:], pf["bias"], (1, 2), dtype,
                         cache=kc)
        e = jnp.maximum(o, o * 0.2)
    e = down_conv_folded(e, p["down"]["kernel"], rw=2, dtype=dtype)
    return e, new_state


def fast_forward(params, cfg, x, event, *, packed=True,
                 int8=False, qstate=None):
    """Production blur-VFI forward (aliased backward states), trace-time
    unrolled.  x (b, h, w, img_chn) or (b, 2, h, w, c); event
    (b, t, h, w, ev_chn).  Returns (b, t, h, w, out_chn).

    ``packed=True`` (the serving default) applies the two profile-guided
    lane-padding fixes (scripts/profile_forward.py findings):

      * The 2-channel event head conv runs 20x off its roofline because a
        (h, w, 2) tensor pads its lane dim 64x in HBM.  Instead, ALL t head
        features are computed in ONE space-to-depth-reparameterized conv
        over the packed event stack (exact math, serve/packing.py) and
        cached packed — also de-duplicating the head work the reference
        re-does per scan direction (XXNet_final_attenfusion_arch.py:172/185).
      * The 3-channel prediction conv similarly runs s2d-packed.
    """
    assert cfg.bidirectional and cfg.aliased_backward_states
    assert cfg.recurrent_cell == "simpleconv" and cfg.num_block == 1
    assert cfg.encoder_stage == "then_down"
    assert cfg.decoder_type == "transpose_recurrent"
    assert cfg.siamese_fusion is None
    assert cfg.num_encoders >= 2, \
        "packed decoder folds the last two stages; need >=2 encoders"
    assert cfg.apply_resblocks and cfg.bottleneck_img_add
    assert not cfg.bidir_decoder and not cfg.use_first_dcn
    p = params["params"] if "params" in params else params
    dt = cfg.dtype
    atten_at = tuple(cfg.atten_fuse_at)
    n_enc = cfg.num_encoders
    # int8: route the scale>=1 stage/trunk/down convs, bottleneck, and the
    # decoder-0 trunk through int8 arithmetic (serve/quant.py).  NOT exact
    # math — qualified by measured dB vs f32 (tests/test_quant.py) the way
    # bf16 was.  EGACA, transposed convs, and the FOLDED full-res decoder
    # trunks stay bf16: int8 on the decoder folded trunks was a measured
    # LOSS (the per-conv dynamic-quant passes over full-res tensors cost
    # more than int8 saves on 128x128 contractions; PERFORMANCE.md round 3).
    # ``int8="scale0"`` additionally quantizes the width-folded scale-0
    # encoder trunks — both scans' full-res recurrent chains, ~half the
    # model's device time (a cost that rounds 2-3 never saw: with a
    # loop-invariant event tensor, XLA hoisted the whole image-independent
    # scale-0 chain out of every timing loop; PERFORMANCE.md round-3
    # correction).
    # ``int8="static"`` quantizes the widest coverage — scale-0 chain AND
    # the folded full-res decoder trunks — with CALIBRATED per-site
    # activation scales (serve/quant.py): the on-device amax reductions
    # that made dynamic int8 a loss on the decoder trunks disappear.
    # Requires ``qstate={"amax": [...]}`` from a prior ``int8="calib"``
    # pass (same config/t; sites are matched by call order).
    assert int8 in (False, True, "scale0", "static", "calib")
    if int8 in ("static", "calib"):
        assert qstate is not None, \
            "int8='static'/'calib' needs qstate (see serve/quant.py)"
        if int8 == "calib":
            qstate["mode"] = "calib"
            qstate.setdefault("amax", [])
            qcache = qstate
        else:
            qcache = {"mode": "static", "amax": list(qstate["amax"]),
                      "idx": 0,
                      "exclude": frozenset(qstate.get("exclude", ()))}
        q0 = qdec = qcache
    elif int8:
        qcache = {}
        q0 = qcache if int8 == "scale0" else None
        qdec = None
    else:
        qcache = q0 = qdec = None

    if x.ndim == 5:
        x = jnp.concatenate([x[:, i] for i in range(x.shape[1])], axis=-1)
    if event.shape[-1] == 4 * cfg.ev_chn:
        # pre-packed serving input format: s2d(2,2) voxel-bin pairs
        # (b, t, h/2, w/2, 4*ev_chn) — producers (the on-device voxelizer)
        # can emit this directly, skipping a 64x-lane-padded read of the
        # raw (.., 2)-channel event stack
        assert packed, "pre-packed events require the packed serving path"
        b, t, h2, w2, _ = event.shape
        h, w = 2 * h2, 2 * w2
    else:
        b, t, h, w, _ = event.shape

    kcache = {}  # per-trace folded-kernel memo (see conv_s2d)
    if packed:
        from refid_tpu.serve.packing import (space_to_depth, depth_to_space,
                                             conv_s2d, s2d_to_wfold,
                                             conv_transpose_up_folded)
        if event.shape[-1] == 4 * cfg.ev_chn:
            evp = event.reshape(b * t, h // 2, w // 2, event.shape[-1])
        else:
            evp = space_to_depth(
                event.reshape(b * t, h, w, event.shape[-1]), 2)
        hf = conv_s2d(evp, p["head"]["kernel"], p["head"]["bias"], 2, dt)
        hf = jnp.maximum(hf, 0.2 * hf)
        # ONE s2d->wfold repack of the head features for all t (the
        # round-2 path repacked per step per direction: 46 full-res
        # transposes; one batched repack serves BOTH scan directions).
        # The scale-0 stage conv runs per step from this cache, already
        # fused with its lrelu epilogue (the 0.04 slope is the collapsed
        # double-lrelu; exact — the stage conv is image/state-independent).
        # Measured A/B (PERFORMANCE.md round 3): this = 21.84 fps e2e vs
        # 21.48 for the per-step repack; ALSO batching the stage conv over
        # t x directions is a measured LOSS (17.15 fps) — the two
        # (b,t,h,w/2,C) activation caches (2x2.7 GB at 720p/t=23) come
        # back through T(2,128) relayout fusions costing far more than
        # the batching saves.
        hfw_c = s2d_to_wfold(hf).reshape(b, t, h, w // 2, -1)
        pre_staged = True

        def stage_e(d, k):
            pc = p[d]["enc_0"]["conv"]["conv"]
            s_ = conv_s2d(hfw_c[:, k], pc["kernel"], pc["bias"],
                          (1, 2), dt, cache=kcache)
            return jnp.maximum(s_, 0.04 * s_)
    else:
        def head_e(k):
            return _conv(p["head"], event[:, k], padding=2, slope=0.2,
                         dtype=dt)

    # image head + encoder pyramid
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

    # EGACA's image-side pre-gate chain (norm1 -> conv1 -> dw conv2 -> gelu)
    # depends only on the image pyramid and per-direction params — compute
    # it ONCE per (direction, attended stage) instead of per t step (exact;
    # also guarantees what XLA CSE may or may not find in the unrolled graph)
    egaca_img = {}
    for d in ("bwd", "fwd"):
        for i in atten_at:
            if 0 < i < n_enc:
                egaca_img[(d, i)] = _egaca_img_branch(
                    p[d][f"enc_{i}"]["atten"], x_blocks[i - 1], dt)

    zdt = dt or jnp.float32
    enc_zero = [jnp.zeros((b, h >> i, w >> i,
                           cfg.encoder_out_sizes[i]), zdt)
                for i in range(n_enc)]

    if packed:
        # scale-0 states live width-folded (b, h, w/2, 2C)
        enc_zero[0] = jnp.zeros((b, h, w // 2,
                                 2 * cfg.encoder_out_sizes[0]), zdt)

    # backward scan — aliased mode only needs the final carry
    states = list(enc_zero)
    for k in range(t - 1, -1, -1):
        e = stage_e("bwd", k) if packed else head_e(k)
        for i in range(n_enc):
            y = None if i == 0 else x_blocks[i - 1]
            if packed and i == 0:
                e, states[0] = _enc_stage0_folded(
                    p["bwd"]["enc_0"], e, states[0], None, dt, kc=kcache,
                    q=q0, pre_staged=pre_staged)
            else:
                e, states[i] = _enc_stage(
                    p["bwd"][f"enc_{i}"], i, atten_at, e, y, states[i],
                    None, dt, opt=packed, q=qcache,
                    egaca_img=egaca_img.get(("bwd", i)))
    bwd_final = states

    # forward scan + bottleneck + recurrent decoder + prediction
    fwd_states = list(enc_zero)
    dec_states = [jnp.zeros((b, h >> (n_enc - i - 1), w >> (n_enc - i - 1),
                             cfg.encoder_out_sizes[n_enc - i - 1] // 2), zdt)
                  for i in range(n_enc)]
    if packed:
        dec_states[n_enc - 1] = jnp.zeros(
            (b, h, w // 4, 4 * cfg.encoder_out_sizes[0] // 2), zdt)
        if n_enc >= 2:
            dec_states[n_enc - 2] = jnp.zeros(
                (b, h // 2, w // 4, 2 * cfg.encoder_out_sizes[1] // 2), zdt)
        xh_f4 = space_to_depth(xh, (1, 4))
    outs = []
    for k in range(t):
        e = stage_e("fwd", k) if packed else head_e(k)
        e_blocks = []
        for i in range(n_enc):
            y = None if i == 0 else x_blocks[i - 1]
            if packed and i == 0:
                e, fwd_states[0] = _enc_stage0_folded(
                    p["fwd"]["enc_0"], e, fwd_states[0], bwd_final[0], dt,
                    kc=kcache, q=q0, pre_staged=pre_staged)
            else:
                e, fwd_states[i] = _enc_stage(
                    p["fwd"][f"enc_{i}"], i, atten_at, e, y, fwd_states[i],
                    bwd_final[i], dt, opt=packed, q=qcache,
                    egaca_img=egaca_img.get(("fwd", i)))
            e_blocks.append(e)
        for j in range(cfg.num_residual_blocks):
            pr = p["fwd"][f"res_{j}"]
            inp = e + x_blocks[-1] if j == 0 else e
            if qcache is not None:
                from refid_tpu.serve.quant import conv_int8
                o = conv_int8(pr["conv1"], inp, padding=1, relu=True,
                              out_dtype=dt, cache=qcache)
                o = conv_int8(pr["conv2"], o, padding=1, out_dtype=dt,
                              cache=qcache)
            else:
                o = jax.nn.relu(_conv(pr["conv1"], inp, padding=1, dtype=dt))
                o = _conv(pr["conv2"], o, padding=1, dtype=dt)
            e = jax.nn.relu(o + inp)
        for i in range(n_enc):
            pd = p["fwd"][f"dec_{i}"]
            skip = e_blocks[n_enc - i - 1]
            if packed and i == n_enc - 2:
                # half-res decoder stage in width-fold-2 (64ch -> 128 lanes)
                up = conv_transpose_up_folded(
                    e + skip, pd["up"]["kernel"], pd["up"]["bias"], dt,
                    r_in=1, r_out=2)
                e = _trunk_folded(pd["trunk"], up, dec_states[i], 2, dt,
                                  kc=kcache, q=qdec)
            elif packed and i == n_enc - 1:
                # full-res decoder stage in width-fold-4 (32ch -> 128 lanes)
                # e is width-fold-2 from dec_1; the skip folds to match
                skip_f2 = space_to_depth(skip, (1, 2))
                up = conv_transpose_up_folded(
                    e + skip_f2, pd["up"]["kernel"], pd["up"]["bias"], dt,
                    r_in=2, r_out=4)
                e = _trunk_folded(pd["trunk"], up, dec_states[i], 4, dt,
                                  kc=kcache, q=qdec)
            else:
                up = _conv_transpose_up(pd["up"], e + skip, dt)
                e = _trunk(pd["trunk"], up, dec_states[i], dt, q=qcache)
            dec_states[i] = e
        if packed:
            pk = p["fwd"]["pred"]["conv"]
            outs.append(conv_s2d(e + xh_f4, pk["kernel"], pk["bias"],
                                 (1, 4), dt, cache=kcache))
        else:
            outs.append(_conv(p["fwd"]["pred"]["conv"], e + xh, padding=1,
                              dtype=dt))
    out = jnp.stack(outs, axis=1)
    if packed:
        oc = out.shape[-1]
        out = depth_to_space(
            out.reshape(b * t, h, w // 4, oc), (1, 4)).reshape(
                b, t, h, w, oc // 4)
    if int8 == "static":
        assert qcache["idx"] == len(qcache["amax"]), \
            (f"calibration/serving site-count mismatch: consumed "
             f"{qcache['idx']} of {len(qcache['amax'])} scales — calibrate "
             f"with the same config and t")
    return out

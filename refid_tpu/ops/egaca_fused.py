"""Fused EGACA (CrossmodalAtten all_add) as two VMEM-resident Pallas passes.

Why: the honest e2e profile (PERFORMANCE.md round 4) shows the scale-1
EGACA class costs ~230 ms/clip with ~19 GFLOP of actual matmul work per
call — it is ~100% memory/layout bound: every (360,640,64) intermediate
pays 2x lane padding in HBM, XLA materializes long gelu/layernorm chains,
and the SE gate forces full-tensor pool reduces.  This kernel runs the
whole block (both layernorms, the 1x1s, the depthwise 3x3, exact gelu,
SE gating, FFN, residuals) in two band-pipelined passes over WIDTH-FOLDED
(h, w/2, 2c) tensors, so every op runs on full 128 lanes and no
intermediate ever exists in HBM except the single x_e tensor the SE gate
needs (phase boundary).

Semantics replayed: serve/fast_forward._egaca (reference
basicsr/models/archs/fusion_modules.py:237-333).  NOT bit-exact vs the
XLA path — matmul/accumulation order differs (f32 residual carries,
layernorm stats via block-diagonal averaging matmuls) — parity is pinned
by tolerance in tests/test_egaca_fused.py, like ops/fused_trunk.py.

Folded-layout tricks:
  * all 1x1 convs become (M,128)@(128,128) matmuls with BLOCK-DIAGONAL
    folded kernels (two copies of the 64x64 kernel);
  * per-pixel channel layernorm stats come from a matmul with a
    block-diagonal averaging matrix A (each lane gets its fold-phase's
    channel-group mean) — MXU instead of unfuseable VPU reductions;
  * the depthwise 3x3's width taps act on fold-phase neighbors: phase-0
    needs (c-1,phase1)/(c,phase0)/(c,phase1), phase-1 needs
    (c,phase0)/(c,phase1)/(c+1,phase0).  With S = swap-channel-halves
    (a 128-lane rotate by 64) and flattened-row rolls for the +-1 column
    shifts, each dy row contributes
        w[dy,0] * blend(S(x)<<1, S(x)) + w[dy,1] * x + w[dy,2] * blend(S(x), S(x)>>1)
    where blend selects lanes<64 from the first operand.  Column-edge
    zero padding folds into two lane-masked selects (no padded copies).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["egaca_fused", "egaca_fused_u", "egaca_supported"]

_EPS = 1e-6  # LayerNorm2d eps (models/layers.py:188)


def _erf(x):
    """Abramowitz-Stegun 7.1.26 rational erf (max abs err 1.5e-7) — Mosaic
    cannot lower lax.erf, and 1.5e-7 is far inside the kernel's pinned
    parity tolerance (tests/test_egaca_fused.py: 5e-5 f32, 40 dB bf16)."""
    s = jnp.sign(x)
    a = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * a)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    return s * (1.0 - poly * jnp.exp(-a * a))


def _gelu(x):
    """Exact gelu (approximate=False) to erf-approximation accuracy,
    matching jax.nn.gelu in the XLA path."""
    return 0.5 * x * (1.0 + _erf(x / math.sqrt(2.0)))


def _blockdiag(w):
    """(ci, co) -> (2ci, 2co) block-diagonal folded 1x1 kernel."""
    ci, co = w.shape
    z = jnp.zeros((ci, co), w.dtype)
    return jnp.concatenate(
        [jnp.concatenate([w, z], 1), jnp.concatenate([z, w], 1)], 0)


def _swap(v, C, pmat, mode):
    """Swap channel halves (lane rotate by C within 2C lanes)."""
    if mode == "roll":
        return pltpu.roll(v, C, axis=1)
    return jax.lax.dot_general(v, pmat, (((1,), (0,)), ((), ())),
                               preferred_element_type=v.dtype)


def _phase_a_kernel(xprev, xcur, xnext, amat, pmat, n1s, n1b, w1, b1, wdw,
                    bdw, oxe, osum, *, B, Wp, L, C, Hreal, mdt, odt,
                    swap_mode):
    """norm1_e -> conv1_e (block-diag 1x1) -> depthwise 3x3 -> exact gelu,
    plus the per-band masked channel sums the SE gate needs."""
    i = pl.program_id(0)
    M = B * Wp
    M2 = (B + 2) * Wp
    raw = jnp.concatenate([xprev[:], xcur[:], xnext[:]], axis=0)
    xf = raw.reshape(M2, L)

    # LayerNorm2d over each fold-phase's 64-channel group via the
    # averaging matmul (stats in the compute dtype, like the XLA path)
    xm = xf.astype(mdt)
    A = amat[:]
    mu = jax.lax.dot_general(xm, A, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    d = xf.astype(jnp.float32) - mu
    var = jax.lax.dot_general((d * d).astype(mdt), A,
                              (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    xn = d * jax.lax.rsqrt(var + _EPS) * n1s[:] + n1b[:]

    # conv1_e: folded block-diagonal 1x1
    h = jax.lax.dot_general(xn.astype(mdt), w1[:], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32) + b1[:]

    # zero rows outside the real image (this covers the clamped halo rows
    # of the first/last band AND any rows padded up to a multiple of B) —
    # the depthwise conv's zero padding in row direction
    ridx2 = jax.lax.broadcasted_iota(jnp.int32, (M2, 1), 0) // Wp \
        + (i * B - 1)
    h = jnp.where((ridx2 >= 0) & (ridx2 < Hreal), h, 0.0)

    # depthwise 3x3 on the folded layout
    cidx = jax.lax.broadcasted_iota(jnp.int32, (M, 1), 0) % Wp
    col0 = cidx == 0
    colw = cidx == (Wp - 1)
    lane_lt = jax.lax.broadcasted_iota(jnp.int32, (1, L), 1) < C
    acc = jnp.zeros((M, L), jnp.float32)
    for dy in range(3):
        win = jax.lax.slice(h, (dy * Wp, 0), (dy * Wp + M, L))
        sw = _swap(win, C, pmat[:], swap_mode)
        swm = pltpu.roll(sw, 1, axis=0)
        swp = pltpu.roll(sw, M - 1, axis=0)
        t0 = jnp.where(lane_lt, jnp.where(col0, 0.0, swm), sw)
        t2 = jnp.where(lane_lt, sw, jnp.where(colw, 0.0, swp))
        acc = acc + wdw[3 * dy, :].reshape(1, L) * t0 \
                  + wdw[3 * dy + 1, :].reshape(1, L) * win \
                  + wdw[3 * dy + 2, :].reshape(1, L) * t2
    xe = _gelu(acc + bdw[:])

    oxe[:] = xe.astype(odt).reshape(B, Wp, L)
    # per-band masked channel sums, accumulated across the sequential grid
    # into ONE (8, L) block (a (nb, 1, L)-blocked output would violate
    # Mosaic's 8-sublane block rule).  All 8 rows carry the same total;
    # the host divides by 8 (exact in f32).
    @pl.when(i == 0)
    def _init():
        osum[:] = jnp.zeros((8, L), jnp.float32)

    ridx = jax.lax.broadcasted_iota(jnp.int32, (M, 1), 0) // Wp + i * B
    band = jnp.sum(jnp.where(ridx < Hreal, xe, 0.0), axis=0).reshape(1, L)
    osum[:] = osum[:] + jnp.broadcast_to(band, (8, L))


def _phase_b_kernel(xe, xim, xev, ximg, gate, amat, n2s, n2b, w3a, w3b, b3,
                    beta, w4, b4, w5, b5, wy, by, gamma, out, *, B, Wp, L,
                    mdt, odt):
    """SE gating -> conv3 (concat as two summed matmuls) -> beta residual
    -> norm2 -> FFN (conv4/gelu/conv5) -> conv_y_side + gamma residual.

    The output width is ``Lo = 2 * c_out`` lanes (the flagship's attended
    stage has c_out = 2c = 128, so Lo = 256); all folded kernels are
    block-diagonal, so Lo is read off the weight shapes."""
    M = B * Wp

    def dot(a, w):
        return jax.lax.dot_general(a.astype(mdt), w[:],
                                   (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    g = gate[:]
    xef = xe[:].reshape(M, L)
    x_img = xim[:].reshape(M, L).astype(mdt) * g
    x_ev = xef.astype(mdt) * g
    x3 = dot(x_img, w3a) + dot(x_ev, w3b) + b3[:]
    y = xev[:].reshape(M, L).astype(jnp.float32) \
        + ximg[:].reshape(M, L).astype(jnp.float32) + x3 * beta[:]

    ym = y.astype(mdt)
    mu = dot(ym, amat)
    d = y - mu
    var = dot((d * d), amat)
    ny = d * jax.lax.rsqrt(var + _EPS) * n2s[:] + n2b[:]

    ffn = _gelu(dot(ny, w4) + b4[:])
    f5 = dot(ffn, w5) + b5[:]
    ys = dot(ym, wy) + by[:]
    out[:] = (ys + f5 * gamma[:]).astype(odt).reshape(out.shape)


def _phase_a_u_kernel(xprev, xcur, xnext, amat, n1s, n1b, w1, b1, wdw, bdw,
                      oxe, osum, *, B, W, C, Hreal, mdt, odt):
    """Unfolded-I/O variant of phase A (v2).  Same math as
    ``_phase_a_kernel`` on the natural (1, rows, W, C) layout: columns are
    adjacent sublanes of the flattened (rows*W, C) view, so the depthwise
    3x3's dx taps are plain sublane rolls — no fold-phase blending and no
    channel-half swaps.  Costs 2x lane padding on VPU ops (C=64 of 128
    lanes); buys custom-call operand layouts identical to what XLA's convs
    produce anyway, so no layout constraint propagates into the rest of
    the graph (the v1 folded-I/O poisoning, PERFORMANCE.md round 4)."""
    i = pl.program_id(0)
    M = B * W
    M2 = (B + 2) * W
    raw = jnp.concatenate([xprev[0, 0], xcur[0].reshape(M, C),
                           xnext[0, 0]], axis=0)

    xm = raw.astype(mdt)
    A = amat[:]
    mu = jax.lax.dot_general(xm, A, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    d = raw.astype(jnp.float32) - mu
    var = jax.lax.dot_general((d * d).astype(mdt), A,
                              (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    xn = d * jax.lax.rsqrt(var + _EPS) * n1s[:] + n1b[:]

    h = jax.lax.dot_general(xn.astype(mdt), w1[:], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32) + b1[:]

    # zero rows outside the real image (clamped halo rows + band padding):
    # the depthwise conv's zero padding in the row direction
    ridx2 = jax.lax.broadcasted_iota(jnp.int32, (M2, 1), 0) // W \
        + (i * B - 1)
    h = jnp.where((ridx2 >= 0) & (ridx2 < Hreal), h, 0.0)

    cidx = jax.lax.broadcasted_iota(jnp.int32, (M, 1), 0) % W
    col0 = cidx == 0
    colw = cidx == (W - 1)
    acc = jnp.zeros((M, C), jnp.float32)
    for dy in range(3):
        win = jax.lax.slice(h, (dy * W, 0), (dy * W + M, C))
        wm = pltpu.roll(win, 1, axis=0)      # column w-1 (same image row)
        wp = pltpu.roll(win, M - 1, axis=0)  # column w+1
        t0 = jnp.where(col0, 0.0, wm)
        t2 = jnp.where(colw, 0.0, wp)
        acc = acc + wdw[3 * dy, :].reshape(1, C) * t0 \
                  + wdw[3 * dy + 1, :].reshape(1, C) * win \
                  + wdw[3 * dy + 2, :].reshape(1, C) * t2
    xe = _gelu(acc + bdw[:])

    oxe[:] = xe.astype(odt).reshape(1, B, W, C)

    @pl.when(i == 0)
    def _init():
        osum[:] = jnp.zeros((8, C), jnp.float32)

    ridx = jax.lax.broadcasted_iota(jnp.int32, (M, 1), 0) // W + i * B
    band = jnp.sum(jnp.where(ridx < Hreal, xe, 0.0), axis=0).reshape(1, C)
    osum[:] = osum[:] + jnp.broadcast_to(band, (8, C))


def _phase_b_u_kernel(xe, xim, res, gate, amat, n2s, n2b, w3a, w3b,
                      b3, beta, w4, b4, w5, b5, wy, by, gamma, out, *, B, W,
                      C, mdt, odt):
    """Unfolded-I/O variant of phase B (v2): plain (C, ·) kernels, no
    block-diagonal doubling; output is (1, B, W, c_out) in the natural
    layout (c_out = 128 at the flagship attended stage = full lanes).
    ``res`` is the precomputed residual sum event_feat + image_feat —
    phase B only ever uses the sum, and passing it as one operand saves a
    double-buffered block of VMEM (the band=8 budget margin)."""
    M = B * W

    def dot(a, w):
        return jax.lax.dot_general(a.astype(mdt), w[:],
                                   (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    g = gate[:]
    xef = xe[0].reshape(M, C)
    x_img = xim[0].reshape(M, C).astype(mdt) * g
    x_ev = xef.astype(mdt) * g
    x3 = dot(x_img, w3a) + dot(x_ev, w3b) + b3[:]
    y = res[0].reshape(M, C).astype(jnp.float32) + x3 * beta[:]

    ym = y.astype(mdt)
    mu = dot(ym, amat)
    d = y - mu
    var = dot((d * d), amat)
    ny = d * jax.lax.rsqrt(var + _EPS) * n2s[:] + n2b[:]

    ffn = _gelu(dot(ny, w4) + b4[:])
    f5 = dot(ffn, w5) + b5[:]
    ys = dot(ym, wy) + by[:]
    out[:] = (ys + f5 * gamma[:]).astype(odt).reshape(out.shape)


def egaca_fused_u(p, event_feat, image_feat, img_branch, dtype=None, *,
                  band=None, interpret=False):
    """v2 of the fused EGACA: unfolded (1, H, W, C) kernel I/O.

    v1 (``egaca_fused``) wins 3.9x standalone but LOSES ~400 ms e2e: its
    width-fold reshapes at the custom-call boundary let XLA layout
    assignment propagate the pallas default-layout requirement upstream
    and re-lay the entire scale-0 folded trunk into 16 TF/s loop fusions
    (PERFORMANCE.md round 4).  Here the operands and result keep their
    natural conv shapes, whose default layout is exactly what the
    producing/consuming convs want — the boundary is constraint-free.
    The trade: in-kernel VPU ops run on 64 of 128 lanes.  Parity is
    pinned by the same tests as v1 (tests/test_egaca_fused.py)."""
    assert egaca_supported(p, event_feat, "v2"), "unsupported EGACA geometry"
    b, H, W, C = event_feat.shape
    c_out = p["conv5"]["kernel"].shape[-1]
    B = band or 8
    Hp = -(-H // B) * B
    nb = Hp // B
    mdt = dtype or jnp.float32
    odt = dtype or jnp.float32

    def prep(x):
        x = x.astype(odt)
        if Hp != H:
            x = jnp.pad(x, ((0, 0), (0, Hp - H), (0, 0), (0, 0)))
        return x

    ev_u, img_u, xb_u = prep(event_feat), prep(image_feat), prep(img_branch)

    def vec(v):  # (C,) param -> (1, C) broadcast row
        return v.reshape(1, -1).astype(mdt)

    amat = jnp.full((C, C), 1.0 / C, mdt)
    w1 = p["conv1_e"]["kernel"][0, 0].astype(mdt)
    wdw = p["conv2_e"]["kernel"][:, :, 0, :].reshape(9, C).astype(mdt)

    prev_spec = pl.BlockSpec((1, 1, W, C),
                             lambda i: (0, jnp.maximum(i * B - 1, 0), 0, 0),
                             memory_space=pltpu.VMEM)
    next_spec = pl.BlockSpec(
        (1, 1, W, C),
        lambda i: (0, jnp.minimum(i * B + B, Hp - 1), 0, 0),
        memory_space=pltpu.VMEM)
    cur_spec = pl.BlockSpec((1, B, W, C), lambda i: (0, i, 0, 0),
                            memory_space=pltpu.VMEM)

    def wspec(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda i: (0,) * nd,
                            memory_space=pltpu.VMEM)

    f32 = jnp.float32
    xe_u, sums = pl.pallas_call(
        functools.partial(_phase_a_u_kernel, B=B, W=W, C=C, Hreal=H,
                          mdt=mdt, odt=odt),
        grid=(nb,),
        in_specs=[prev_spec, cur_spec, next_spec,
                  wspec((C, C)),
                  wspec((1, C)), wspec((1, C)),
                  wspec((C, C)), wspec((1, C)),
                  wspec((9, C)), wspec((1, C))],
        out_specs=[cur_spec,
                   pl.BlockSpec((8, C), lambda i: (0, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((1, Hp, W, C), odt),
                   jax.ShapeDtypeStruct((8, C), f32)],
        interpret=interpret,
    )(ev_u, ev_u, ev_u, amat,
      vec(p["norm1_e"]["scale"]), vec(p["norm1_e"]["bias"]),
      w1, vec(p["conv1_e"]["bias"]),
      wdw, vec(p["conv2_e"]["bias"]))

    # SE gate from the event branch (tiny fc chain, XLA)
    mean = (jnp.sum(sums, axis=0) / 8.0) / jnp.float32(H * W)
    se = p["se_1"]
    g = jax.nn.relu(mean.astype(mdt) @ se["fc1"]["kernel"][0, 0].astype(mdt)
                    + se["fc1"]["bias"].astype(mdt))
    g = jax.nn.sigmoid(g @ se["fc2"]["kernel"][0, 0].astype(mdt)
                       + se["fc2"]["bias"].astype(mdt))
    gate = g.reshape(1, C).astype(mdt)

    k3 = p["conv3"]["kernel"][0, 0]  # (2C, C): [img-half; event-half]
    # phase B has no halo, so it can run at a smaller band: its c_out=2C
    # output blocks + f32 temps put the band=8 kernel stack 24K over the
    # 16M scoped-VMEM limit inside larger graphs (measured e2e; the
    # standalone compile fits only borderline).  Bb must divide Hp.
    Bb = B // 2 if B % 2 == 0 and B >= 8 else B
    curb_spec = pl.BlockSpec((1, Bb, W, C), lambda i: (0, i, 0, 0),
                             memory_space=pltpu.VMEM)
    out_cur_spec = pl.BlockSpec((1, Bb, W, c_out), lambda i: (0, i, 0, 0),
                                memory_space=pltpu.VMEM)
    res_u = ev_u + img_u  # phase B only uses the residual SUM
    out_u = pl.pallas_call(
        functools.partial(_phase_b_u_kernel, B=Bb, W=W, C=C, mdt=mdt,
                          odt=odt),
        grid=(Hp // Bb,),
        in_specs=[curb_spec, curb_spec, curb_spec,
                  wspec((1, C)), wspec((C, C)),
                  wspec((1, C)), wspec((1, C)),
                  wspec((C, C)), wspec((C, C)), wspec((1, C)),
                  wspec((1, C)),
                  wspec((C, 2 * C)), wspec((1, 2 * C)),
                  wspec((2 * C, c_out)), wspec((1, c_out)),
                  wspec((C, c_out)), wspec((1, c_out)), wspec((1, c_out))],
        out_specs=out_cur_spec,
        out_shape=jax.ShapeDtypeStruct((1, Hp, W, c_out), odt),
        interpret=interpret,
    )(xe_u, xb_u, res_u, gate, amat,
      vec(p["norm2"]["scale"]), vec(p["norm2"]["bias"]),
      k3[:C].astype(mdt), k3[C:].astype(mdt), vec(p["conv3"]["bias"]),
      vec(p["beta"].reshape(-1)),
      p["conv4"]["kernel"][0, 0].astype(mdt),
      vec(p["conv4"]["bias"]),
      p["conv5"]["kernel"][0, 0].astype(mdt), vec(p["conv5"]["bias"]),
      p["conv_y_side"]["kernel"][0, 0].astype(mdt),
      vec(p["conv_y_side"]["bias"]),
      vec(p["gamma"].reshape(-1)))

    return out_u[:, :H] if Hp != H else out_u


def egaca_supported(p, event_feat, variant="v2"):
    """The fused kernels cover the production EGACA geometry: batch 1,
    64 channels, dw_expand=1, ffn_expand=2, c_out in {c, 2c} (the flagship
    attended stage projects 64 -> 128, models/fusion.py:77-84).

    Per-variant constraints: v1 folds width (needs W % 2 == 0); v2 keeps
    the natural layout, so any width works.  Both pin 2*C == 128 — the
    band sizes, VMEM budget, and roll-based dx taps are tuned (and only
    parity-tested) at the flagship C=64; other channel counts fall back
    to the XLA path rather than run an unvalidated kernel geometry."""
    b, _, W, C = event_feat.shape
    if variant not in ("v1", "v2"):
        raise ValueError(f"unknown fused-EGACA variant {variant!r}")
    return (b == 1 and 2 * C == 128
            and (variant == "v2" or W % 2 == 0)
            and p["conv1_e"]["kernel"].shape[-1] == C
            and p["conv4"]["kernel"].shape[-1] == 2 * C
            and p["conv5"]["kernel"].shape[-1] in (C, 2 * C)
            and p["conv_y_side"]["kernel"].shape[-1]
            == p["conv5"]["kernel"].shape[-1])


def egaca_fused(p, event_feat, image_feat, img_branch, dtype=None, *,
                band=8, interpret=False, swap_mode="roll"):
    """Drop-in for serve.fast_forward._egaca (with a precomputed
    ``img_branch``).  event_feat/image_feat/img_branch: (1, H, W, C);
    returns (1, H, W, C).  ``dtype`` is the compute dtype (None = f32),
    matching the XLA path's casting discipline."""
    assert egaca_supported(p, event_feat, "v1"), "unsupported EGACA geometry"
    b, H, W, C = event_feat.shape
    c_out = p["conv5"]["kernel"].shape[-1]
    L, Lo, Wp, B = 2 * C, 2 * c_out, W // 2, band
    Hp = -(-H // B) * B
    nb = Hp // B
    mdt = dtype or jnp.float32
    odt = dtype or jnp.float32

    def fold(x):
        x = x.reshape(H, Wp, L).astype(odt)
        if Hp != H:
            x = jnp.pad(x, ((0, Hp - H), (0, 0), (0, 0)))
        return x

    ev_f, img_f, xb_f = fold(event_feat), fold(image_feat), fold(img_branch)

    def vec(v):  # (C,) param -> (1, L) folded broadcast row
        return jnp.tile(v.reshape(-1), 2).reshape(1, L).astype(mdt)

    amat = _blockdiag(jnp.full((C, C), 1.0 / C)).astype(mdt)
    pmat = jnp.roll(jnp.eye(L), C, axis=0).astype(jnp.float32)
    w1 = _blockdiag(p["conv1_e"]["kernel"][0, 0]).astype(mdt)
    wdw = jnp.tile(p["conv2_e"]["kernel"][:, :, 0, :].reshape(9, C),
                   (1, 2)).astype(mdt)

    prev_spec = pl.BlockSpec((1, Wp, L),
                             lambda i: (jnp.maximum(i * B - 1, 0), 0, 0),
                             memory_space=pltpu.VMEM)
    next_spec = pl.BlockSpec((1, Wp, L),
                             lambda i: (jnp.minimum(i * B + B, Hp - 1), 0, 0),
                             memory_space=pltpu.VMEM)
    cur_spec = pl.BlockSpec((B, Wp, L), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    def wspec(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda i: (0,) * nd,
                            memory_space=pltpu.VMEM)

    f32 = jnp.float32
    xe_f, sums = pl.pallas_call(
        functools.partial(_phase_a_kernel, B=B, Wp=Wp, L=L, C=C, Hreal=H,
                          mdt=mdt, odt=odt, swap_mode=swap_mode),
        grid=(nb,),
        in_specs=[prev_spec, cur_spec, next_spec,
                  wspec((L, L)), wspec((L, L)),
                  wspec((1, L)), wspec((1, L)),
                  wspec((L, L)), wspec((1, L)),
                  wspec((9, L)), wspec((1, L))],
        out_specs=[cur_spec,
                   pl.BlockSpec((8, L), lambda i: (0, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((Hp, Wp, L), odt),
                   jax.ShapeDtypeStruct((8, L), f32)],
        interpret=interpret,
    )(ev_f, ev_f, ev_f, amat, pmat,
      vec(p["norm1_e"]["scale"]), vec(p["norm1_e"]["bias"]),
      w1, vec(p["conv1_e"]["bias"]),
      wdw, vec(p["conv2_e"]["bias"]))

    # SE gate from the event branch (tiny fc chain, XLA): mean over all
    # real pixels of each UNFOLDED channel = lanes k and k+C combined
    total = jnp.sum(sums, axis=0) / 8.0  # 8 identical accumulator rows
    mean = (total[:C] + total[C:]) / jnp.float32(H * W)
    se = p["se_1"]
    g = jax.nn.relu(mean.astype(mdt) @ se["fc1"]["kernel"][0, 0].astype(mdt)
                    + se["fc1"]["bias"].astype(mdt))
    g = jax.nn.sigmoid(g @ se["fc2"]["kernel"][0, 0].astype(mdt)
                       + se["fc2"]["bias"].astype(mdt))
    gate = jnp.tile(g.reshape(-1), 2).reshape(1, L).astype(mdt)

    k3 = p["conv3"]["kernel"][0, 0]  # (2C, C): [img-half; event-half]

    def ovec(v):  # (c_out,) param -> (1, Lo) folded broadcast row
        return jnp.tile(v.reshape(-1), 2).reshape(1, Lo).astype(mdt)

    out_cur_spec = pl.BlockSpec((B, Wp, Lo), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)
    out_f = pl.pallas_call(
        functools.partial(_phase_b_kernel, B=B, Wp=Wp, L=L, mdt=mdt,
                          odt=odt),
        grid=(nb,),
        in_specs=[cur_spec, cur_spec, cur_spec, cur_spec,
                  wspec((1, L)), wspec((L, L)),
                  wspec((1, L)), wspec((1, L)),
                  wspec((L, L)), wspec((L, L)), wspec((1, L)),
                  wspec((1, L)),
                  wspec((L, 2 * L)), wspec((1, 2 * L)),
                  wspec((2 * L, Lo)), wspec((1, Lo)),
                  wspec((L, Lo)), wspec((1, Lo)), wspec((1, Lo))],
        out_specs=out_cur_spec,
        out_shape=jax.ShapeDtypeStruct((Hp, Wp, Lo), odt),
        interpret=interpret,
    )(xe_f, xb_f, ev_f, img_f, gate,
      _blockdiag(jnp.full((C, C), 1.0 / C)).astype(mdt),
      vec(p["norm2"]["scale"]), vec(p["norm2"]["bias"]),
      _blockdiag(k3[:C]).astype(mdt), _blockdiag(k3[C:]).astype(mdt),
      vec(p["conv3"]["bias"]),
      vec(p["beta"].reshape(-1)),
      _blockdiag(p["conv4"]["kernel"][0, 0]).astype(mdt),
      jnp.tile(p["conv4"]["bias"].reshape(-1), 2).reshape(
          1, 2 * L).astype(mdt),
      _blockdiag(p["conv5"]["kernel"][0, 0]).astype(mdt),
      ovec(p["conv5"]["bias"]),
      _blockdiag(p["conv_y_side"]["kernel"][0, 0]).astype(mdt),
      ovec(p["conv_y_side"]["bias"]),
      ovec(p["gamma"].reshape(-1)))

    return out_f[:H].reshape(1, H, W, c_out)

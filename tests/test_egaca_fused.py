"""Parity of the fused two-phase Pallas EGACA kernel vs the XLA replay.

The kernel is NOT bit-exact (f32 residual carries, layernorm stats via
block-diagonal averaging matmuls, different accumulation order) — like
ops/fused_trunk.py it is pinned by tolerance against the op-for-op
serving implementation (serve/fast_forward._egaca), which itself is
bit-tested against model.apply."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _params(key, C=64, c_out=None):
    """A random EGACA param subtree matching the flax module layout.

    The PRODUCTION attended stage projects c -> c_out = 2c
    (models/fusion.py:77-84: conv5/conv_y_side/gamma are c_out-sized), so
    that is the default here — round 4 lesson: an earlier fixture used
    c_out == c, every parity test passed, and the kernel silently never
    ran in-model because egaca_supported rejected the real tree."""
    if c_out is None:
        c_out = 2 * C
    ks = jax.random.split(key, 40)
    g = iter(ks)

    def conv(ci, co, k=1):
        return {"kernel": 0.3 * jax.random.normal(
                    next(g), (k, k, ci, co)) / np.sqrt(k * k * ci),
                "bias": 0.1 * jax.random.normal(next(g), (co,))}

    p = {
        "norm1": {"scale": 1.0 + 0.1 * jax.random.normal(next(g), (C,)),
                  "bias": 0.1 * jax.random.normal(next(g), (C,))},
        "norm1_e": {"scale": 1.0 + 0.1 * jax.random.normal(next(g), (C,)),
                    "bias": 0.1 * jax.random.normal(next(g), (C,))},
        "conv1": conv(C, C),
        "conv2": {"kernel": 0.3 * jax.random.normal(next(g), (3, 3, 1, C)),
                  "bias": 0.1 * jax.random.normal(next(g), (C,))},
        "conv1_e": conv(C, C),
        "conv2_e": {"kernel": 0.3 * jax.random.normal(next(g), (3, 3, 1, C)),
                    "bias": 0.1 * jax.random.normal(next(g), (C,))},
        "se_1": {"fc1": conv(C, C // 2), "fc2": conv(C // 2, C)},
        "conv3": conv(2 * C, C),
        "beta": 0.5 * jax.random.normal(next(g), (1, 1, 1, C)),
        "norm2": {"scale": 1.0 + 0.1 * jax.random.normal(next(g), (C,)),
                  "bias": 0.1 * jax.random.normal(next(g), (C,))},
        "conv4": conv(C, 2 * C),
        "conv5": conv(2 * C, c_out),
        "conv_y_side": conv(C, c_out),
        "gamma": 0.5 * jax.random.normal(next(g), (1, 1, 1, c_out)),
    }
    return jax.tree.map(lambda a: jnp.asarray(a, jnp.float32), p)


def _inputs(seed, H, W, C=64):
    r = np.random.RandomState(seed)
    ev = jnp.asarray(r.randn(1, H, W, C).astype(np.float32))
    img = jnp.asarray(r.randn(1, H, W, C).astype(np.float32))
    return ev, img


def _fused(variant):
    """Dispatch the kernel variant under test: "v1" = folded I/O,
    "v2" = unfolded I/O (the default served by fast_forward)."""
    from refid_tpu.ops.egaca_fused import egaca_fused, egaca_fused_u

    if variant == "v1":
        return lambda *a, **k: egaca_fused(*a, swap_mode="perm", **k)
    return egaca_fused_u


@pytest.mark.parametrize("variant", ["v1", "v2"])
@pytest.mark.parametrize("H,W,c_out", [(32, 64, 128), (44, 32, 128),
                                       (32, 64, 64)])
def test_egaca_fused_parity_f32(H, W, c_out, variant):
    """f32 interpret-mode parity, including a height that is not a
    multiple of the band (row masking path) and both supported output
    projections (c_out = 2c is the production attended stage)."""
    from refid_tpu.serve.fast_forward import _egaca, _egaca_img_branch

    p = _params(jax.random.PRNGKey(0), c_out=c_out)
    ev, img = _inputs(1, H, W)
    want = np.asarray(_egaca(p, ev, img, None))
    xb = _egaca_img_branch(p, img, None)
    got = np.asarray(_fused(variant)(p, ev, img, xb, None, interpret=True))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=5e-5, rtol=5e-4)


def test_egaca_fused_parity_odd_width_v2():
    """v2 keeps the natural (1,H,W,C) layout, so odd widths are supported
    (egaca_supported only rejects them for the width-folding v1)."""
    from refid_tpu.serve.fast_forward import _egaca, _egaca_img_branch

    p = _params(jax.random.PRNGKey(5))
    ev, img = _inputs(6, 20, 31)
    want = np.asarray(_egaca(p, ev, img, None))
    xb = _egaca_img_branch(p, img, None)
    got = np.asarray(_fused("v2")(p, ev, img, xb, None, interpret=True))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=5e-5, rtol=5e-4)


@pytest.mark.parametrize("variant", ["v1", "v2"])
def test_egaca_fused_parity_bf16(variant):
    """bf16 compute-dtype parity within bf16 noise (the serving config)."""
    from refid_tpu.serve.fast_forward import _egaca, _egaca_img_branch

    p = _params(jax.random.PRNGKey(2))
    ev, img = _inputs(3, 32, 64)
    dt = jnp.bfloat16
    want = np.asarray(_egaca(p, ev, img, dt), np.float32)
    xb = _egaca_img_branch(p, img, dt)
    got = np.asarray(_fused(variant)(p, ev, img, xb, dt, interpret=True),
                     np.float32)
    span = want.max() - want.min()
    rmse = np.sqrt(((got - want) ** 2).mean())
    db = 20 * np.log10(span / rmse)
    assert db >= 40.0, f"fused EGACA bf16 parity only {db:.1f} dB"


@pytest.mark.parametrize("flag,attr", [(True, "egaca_fused_u"),
                                       ("v1", "egaca_fused")])
def test_fast_forward_fused_egaca_wired(monkeypatch, flag, attr):
    """fast_forward(fused_egaca=...) == fast_forward() at the production
    channel width (base=32 -> C=64 at the attended stage), interpret mode.
    fused_egaca=True routes to the unfolded-I/O v2 kernel; "v1" keeps the
    folded-I/O kernel for the layout-poisoning A/B.

    ALSO asserts the fused kernel actually RAN: an earlier version of this
    test passed vacuously because egaca_supported rejected the real param
    tree (c_out = 2c) and silently fell back to the XLA path."""
    import refid_tpu.ops.egaca_fused as ef
    from refid_tpu.models import FinalBidirectionAttenfusion, RefidConfig
    from refid_tpu.serve import fast_forward

    cfg = RefidConfig(img_chn=6, ev_chn=2, base_num_channels=32,
                      num_encoders=2, num_block=1, num_residual_blocks=1)
    model = FinalBidirectionAttenfusion(cfg)
    r = np.random.RandomState(7)
    x = jnp.asarray(r.randn(1, 16, 32, cfg.img_chn).astype(np.float32))
    ev = jnp.asarray(r.randn(1, 2, 16, 32, cfg.ev_chn).astype(np.float32))
    params = model.init(jax.random.PRNGKey(7), x, ev)
    want = np.asarray(fast_forward(params, cfg, x, ev))

    calls = []
    orig = getattr(ef, attr)
    monkeypatch.setattr(ef, attr,
                        lambda *a, **k: calls.append(1) or orig(*a, **k))
    got = np.asarray(fast_forward(params, cfg, x, ev, fused_egaca=flag,
                                  interpret=True))
    assert calls, f"fused_egaca={flag!r} never reached the Pallas kernel"
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=5e-5, rtol=5e-4)


def test_egaca_supported_gate():
    from refid_tpu.ops.egaca_fused import egaca_supported

    p = _params(jax.random.PRNGKey(4))
    ev, _ = _inputs(5, 16, 32)
    assert egaca_supported(p, ev)
    # odd width: v1 folds width and rejects it; v2 keeps the natural
    # layout and accepts any width
    assert not egaca_supported(p, ev[:, :, :31], "v1")
    assert egaca_supported(p, ev[:, :, :31], "v2")
    # wrong channel count unsupported by both
    assert not egaca_supported(p, ev[..., :32], "v1")
    assert not egaca_supported(p, ev[..., :32], "v2")
    import pytest
    with pytest.raises(ValueError):
        egaca_supported(p, ev, "V1")

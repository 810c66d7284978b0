"""int8 serving-path numerics: primitive accuracy + end-to-end dB vs f32.

int8 is NOT exact math (unlike the folded bf16 serving path); these tests
pin the quantization scheme's error envelope so regressions in the scheme
(scales, clipping, accumulation) are caught.  The serving default remains
bf16 until released checkpoints can validate task-level quality
(VERDICT round-2 #4)."""

import numpy as np
import pytest


def test_conv_int8_matches_f32_within_quant_noise():
    import jax.numpy as jnp
    from refid_tpu.serve.quant import conv_int8

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 16, 16, 64).astype(np.float32))
    p = {"kernel": jnp.asarray(
        rng.randn(3, 3, 64, 32).astype(np.float32) / np.sqrt(9 * 64)),
        "bias": jnp.asarray(rng.randn(32).astype(np.float32))}
    import jax
    ref = jax.lax.conv_general_dilated(
        x, p["kernel"], (1, 1), [(1, 1)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + p["bias"]
    got = conv_int8(p, x, padding=1)
    ref, got = np.asarray(ref), np.asarray(got)
    rel = np.abs(got - ref).max() / np.abs(ref).max()
    # 8-bit symmetric double-quantization noise: ~1/127 per operand
    assert rel < 0.03, rel
    snr_db = 10 * np.log10((ref ** 2).mean() / ((got - ref) ** 2).mean())
    assert snr_db > 40, snr_db


@pytest.mark.slow
def test_fast_forward_int8_db_vs_f32():
    """End-to-end int8 serving quality at a reduced shape: >= 30 dB against
    the f32 forward (bf16 measures 65 dB by the same methodology —
    PERFORMANCE.md)."""
    import jax
    import jax.numpy as jnp
    from refid_tpu.models import FinalBidirectionAttenfusion, RefidConfig
    from refid_tpu.serve import fast_forward

    cfg = RefidConfig()  # production config, f32
    model = FinalBidirectionAttenfusion(cfg)
    rng = np.random.RandomState(0)
    b, t, h, w = 1, 5, 64, 64
    x = jnp.asarray(rng.rand(b, h, w, cfg.img_chn).astype(np.float32))
    ev = jnp.asarray(rng.rand(b, t, h, w, cfg.ev_chn).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x[:, :32, :32], ev[:, :2, :32, :32])

    ref = np.asarray(model.apply(params, x, ev))
    got = np.asarray(fast_forward(params, cfg, x, ev, packed=True,
                                  int8=True))
    span = ref.max() - ref.min()
    rmse = np.sqrt(((got - ref) ** 2).mean())
    db = 20 * np.log10(span / rmse)
    assert db >= 30.0, f"int8 end-to-end only {db:.1f} dB vs f32"
    # and the exact path still matches when int8 is off (guard the wiring)
    exact = np.asarray(fast_forward(params, cfg, x, ev, packed=True))
    assert np.abs(exact - ref).max() < 1e-4


@pytest.mark.slow
def test_fast_forward_int8_scale0_db_vs_f32():
    """int8="scale0" (also quantizes the width-folded scale-0 encoder
    trunks — the event-only chain) stays >= 30 dB vs the f32 forward.
    Measured 77.5 dB at this shape; e2e @720p it is the fastest serving
    mode (PERFORMANCE.md round-3)."""
    import jax
    import jax.numpy as jnp
    from refid_tpu.models import FinalBidirectionAttenfusion, RefidConfig
    from refid_tpu.serve import fast_forward

    cfg = RefidConfig()
    model = FinalBidirectionAttenfusion(cfg)
    rng = np.random.RandomState(1)
    b, t, h, w = 1, 5, 64, 64
    x = jnp.asarray(rng.rand(b, h, w, cfg.img_chn).astype(np.float32))
    ev = jnp.asarray(rng.rand(b, t, h, w, cfg.ev_chn).astype(np.float32))
    params = model.init(jax.random.PRNGKey(1), x[:, :32, :32],
                        ev[:, :2, :32, :32])
    ref = np.asarray(model.apply(params, x, ev))
    got = np.asarray(fast_forward(params, cfg, x, ev, packed=True,
                                  int8="scale0"))
    span = ref.max() - ref.min()
    rmse = np.sqrt(((got - ref) ** 2).mean())
    db = 20 * np.log10(span / rmse)
    assert db >= 30.0, f"int8=scale0 end-to-end only {db:.1f} dB vs f32"

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


@pytest.mark.slow
def test_calibrate_then_static_int8():
    """int8='static' (calibrated activation scales, widest coverage incl.
    the folded decoder trunks): the calib pass is EXACT math, site counts
    match between calibration and serving, and static serving stays
    >= 28 dB vs f32 both on the calibration input and on a fresh input."""
    import jax
    import jax.numpy as jnp
    from refid_tpu.models import FinalBidirectionAttenfusion, RefidConfig
    from refid_tpu.serve import fast_forward

    cfg = RefidConfig()
    model = FinalBidirectionAttenfusion(cfg)
    rng = np.random.RandomState(2)
    b, t, h, w = 1, 3, 32, 32
    x = jnp.asarray(rng.rand(b, h, w, cfg.img_chn).astype(np.float32))
    ev = jnp.asarray(rng.rand(b, t, h, w, cfg.ev_chn).astype(np.float32))
    params = model.init(jax.random.PRNGKey(2), x, ev)
    ref = np.asarray(model.apply(params, x, ev))

    q = {}
    calib_out = np.asarray(fast_forward(params, cfg, x, ev, packed=True,
                                        int8="calib", qstate=q))
    # calibration forward is exact math
    np.testing.assert_allclose(calib_out, ref, atol=1e-4, rtol=1e-4)
    scales = [float(a) for a in q["amax"]]
    assert len(scales) > 20  # scale-0 + stages + bottleneck + decoders

    def run_static(x_, ev_):
        return np.asarray(fast_forward(
            params, cfg, x_, ev_, packed=True, int8="static",
            qstate={"amax": scales}))

    for seed, (x_, ev_) in enumerate([
            (x, ev),
            (jnp.asarray(np.random.RandomState(9).rand(
                b, h, w, cfg.img_chn).astype(np.float32)),
             jnp.asarray(np.random.RandomState(9).rand(
                 b, t, h, w, cfg.ev_chn).astype(np.float32)))]):
        ref_ = np.asarray(model.apply(params, x_, ev_))
        got = run_static(x_, ev_)
        span = ref_.max() - ref_.min()
        db = 20 * np.log10(span / np.sqrt(((got - ref_) ** 2).mean()))
        assert db >= 28.0, f"static int8 input {seed}: {db:.1f} dB vs f32"


def test_pipeline_static_int8_calibration():
    """BlurVFIPipeline(int8='static'): serving before calibrate() raises;
    after calibrate() it runs and tracks the exact pipeline output."""
    import jax
    import jax.numpy as jnp
    import pytest
    from refid_tpu.models import FinalBidirectionAttenfusion, RefidConfig
    from refid_tpu.pipeline import BlurVFIPipeline

    cfg = RefidConfig()
    model = FinalBidirectionAttenfusion(cfg)
    rng = np.random.RandomState(3)
    h, w = 32, 32
    m, n = 2, 1
    params = model.init(
        jax.random.PRNGKey(3),
        jnp.zeros((1, h, w, cfg.img_chn)),
        jnp.zeros((1, 3, h, w, cfg.ev_chn)))
    blur0 = rng.rand(h, w, 3).astype(np.float32)
    blur1 = rng.rand(h, w, 3).astype(np.float32)
    events = np.stack([np.sort(rng.rand(500)),
                       rng.randint(0, w, 500).astype(np.float32),
                       rng.randint(0, h, 500).astype(np.float32),
                       rng.randint(0, 2, 500).astype(np.float32)],
                      axis=1).astype(np.float32)

    # NOTE: img_chn=26 needs m=11; use the 8-ch config trick instead
    cfg8 = RefidConfig(img_chn=8, num_encoders=2, base_num_channels=8,
                       num_residual_blocks=1)
    model8 = FinalBidirectionAttenfusion(cfg8)
    params8 = model8.init(
        jax.random.PRNGKey(3),
        jnp.zeros((1, h, w, cfg8.img_chn)),
        jnp.zeros((1, 3, h, w, cfg8.ev_chn)))
    pipe = BlurVFIPipeline(params8, cfg8, m=m, n=n, int8="static")
    with pytest.raises(ValueError, match="calibrat"):
        pipe(blur0, blur1, events)
    exact = np.asarray(pipe.calibrate(blur0, blur1, events))
    got = np.asarray(pipe(blur0, blur1, events))
    assert got.shape == exact.shape
    span = exact.max() - exact.min()
    db = 20 * np.log10(span / np.sqrt(((got - exact) ** 2).mean()))
    assert db >= 25.0, f"pipeline static int8: {db:.1f} dB"


@pytest.mark.slow
def test_pipeline_static_int8_crop_calibration():
    """calibrate(crop=...): per-tensor amaxes recorded on a center crop
    transfer to full-resolution serving (site order is resolution-
    independent).  This is how 720p serving calibrates on a v5e — the
    full-res calibration graph exceeds chip HBM (pipeline.calibrate doc)."""
    import jax
    import jax.numpy as jnp
    from refid_tpu.models import FinalBidirectionAttenfusion, RefidConfig
    from refid_tpu.pipeline import BlurVFIPipeline

    rng = np.random.RandomState(7)
    h, w = 64, 64
    m, n = 2, 1
    cfg8 = RefidConfig(img_chn=8, num_encoders=2, base_num_channels=8,
                       num_residual_blocks=1)
    model8 = FinalBidirectionAttenfusion(cfg8)
    params8 = model8.init(
        jax.random.PRNGKey(7),
        jnp.zeros((1, h, w, cfg8.img_chn)),
        jnp.zeros((1, 3, h, w, cfg8.ev_chn)))
    blur0 = rng.rand(h, w, 3).astype(np.float32)
    blur1 = rng.rand(h, w, 3).astype(np.float32)
    ne = 2000
    events = np.stack([np.sort(rng.rand(ne)),
                       rng.randint(0, w, ne).astype(np.float32),
                       rng.randint(0, h, ne).astype(np.float32),
                       rng.randint(0, 2, ne).astype(np.float32)],
                      axis=1).astype(np.float32)

    pipe = BlurVFIPipeline(params8, cfg8, m=m, n=n, int8="static")
    pipe.calibrate(blur0, blur1, events, crop=(32, 32), headroom=1.1)
    n_sites_crop = len(pipe._int8_scales)
    got = np.asarray(pipe(blur0, blur1, events))

    exact_pipe = BlurVFIPipeline(params8, cfg8, m=m, n=n)
    exact = np.asarray(exact_pipe(blur0, blur1, events))
    span = exact.max() - exact.min()
    db = 20 * np.log10(span / np.sqrt(((got - exact) ** 2).mean()))
    assert db >= 25.0, f"crop-calibrated static int8: {db:.1f} dB"

    # site order/count is resolution-independent: full-res calibration
    # records the same number of sites
    pipe.calibrate(blur0, blur1, events)
    assert len(pipe._int8_scales) == n_sites_crop


def test_pipeline_calibration_save_load(tmp_path):
    """save_calibration/load_calibration round-trip: a fresh pipeline
    loads offline-recorded scales and serves int8='static' identically."""
    import jax
    import jax.numpy as jnp
    from refid_tpu.models import FinalBidirectionAttenfusion, RefidConfig
    from refid_tpu.pipeline import BlurVFIPipeline

    rng = np.random.RandomState(11)
    h, w, m, n = 32, 32, 2, 1
    cfg8 = RefidConfig(img_chn=8, num_encoders=2, base_num_channels=8,
                       num_residual_blocks=1)
    model8 = FinalBidirectionAttenfusion(cfg8)
    params8 = model8.init(
        jax.random.PRNGKey(11),
        jnp.zeros((1, h, w, cfg8.img_chn)),
        jnp.zeros((1, 3, h, w, cfg8.ev_chn)))
    blur0 = rng.rand(h, w, 3).astype(np.float32)
    blur1 = rng.rand(h, w, 3).astype(np.float32)
    events = np.stack([np.sort(rng.rand(500)),
                       rng.randint(0, w, 500).astype(np.float32),
                       rng.randint(0, h, 500).astype(np.float32),
                       rng.randint(0, 2, 500).astype(np.float32)],
                      axis=1).astype(np.float32)

    pipe = BlurVFIPipeline(params8, cfg8, m=m, n=n, int8="static")
    pipe.calibrate(blur0, blur1, events)
    want = np.asarray(pipe(blur0, blur1, events))
    path = str(tmp_path / "calib.json")
    pipe.save_calibration(path)

    pipe2 = BlurVFIPipeline(params8, cfg8, m=m, n=n, int8="static")
    import pytest as _pytest
    with _pytest.raises(ValueError, match="calibrat"):
        pipe2(blur0, blur1, events)
    pipe2.load_calibration(path)
    got = np.asarray(pipe2(blur0, blur1, events))
    np.testing.assert_array_equal(got, want)


@pytest.mark.slow
def test_pipeline_calibration_accumulate():
    """calibrate(accumulate=True) folds multiple representative windows
    into one scale set by elementwise max — the serving scales cover the
    union of the calibration distribution, not one sample's outliers."""
    import jax
    import jax.numpy as jnp
    from refid_tpu.models import FinalBidirectionAttenfusion, RefidConfig
    from refid_tpu.pipeline import BlurVFIPipeline

    rng = np.random.RandomState(13)
    h, w, m, n = 32, 32, 2, 1
    cfg8 = RefidConfig(img_chn=8, num_encoders=2, base_num_channels=8,
                       num_residual_blocks=1)
    model8 = FinalBidirectionAttenfusion(cfg8)
    params8 = model8.init(
        jax.random.PRNGKey(13),
        jnp.zeros((1, h, w, cfg8.img_chn)),
        jnp.zeros((1, 3, h, w, cfg8.ev_chn)))

    def window(seed, gain=1.0):
        r = np.random.RandomState(seed)
        b0 = (gain * r.rand(h, w, 3)).astype(np.float32)
        b1 = (gain * r.rand(h, w, 3)).astype(np.float32)
        ev = np.stack([np.sort(r.rand(500)),
                       r.randint(0, w, 500).astype(np.float32),
                       r.randint(0, h, 500).astype(np.float32),
                       r.randint(0, 2, 500).astype(np.float32)],
                      axis=1).astype(np.float32)
        return b0, b1, ev

    pipe = BlurVFIPipeline(params8, cfg8, m=m, n=n, int8="static")
    pipe.calibrate(*window(1))
    s1 = pipe._int8_scales
    pipe2 = BlurVFIPipeline(params8, cfg8, m=m, n=n, int8="static")
    pipe2.calibrate(*window(2, gain=2.0))
    s2 = pipe2._int8_scales

    # accumulate over both windows == elementwise max of the two sets
    pipe3 = BlurVFIPipeline(params8, cfg8, m=m, n=n, int8="static")
    pipe3.calibrate(*window(1))
    pipe3.calibrate(*window(2, gain=2.0), accumulate=True)
    np.testing.assert_allclose(
        pipe3._int8_scales, np.maximum(s1, s2), rtol=1e-6)

    # without accumulate, a second calibrate() replaces the scales
    pipe3.calibrate(*window(1))
    np.testing.assert_allclose(pipe3._int8_scales, s1, rtol=1e-6)

    # and serving still runs with the accumulated scales
    pipe3.calibrate(*window(2, gain=2.0), accumulate=True)
    out = np.asarray(pipe3(*window(3)))
    assert np.isfinite(out).all()


def _tiny_pipe_inputs(seed=17, h=32, w=32):
    import jax
    import jax.numpy as jnp
    from refid_tpu.models import FinalBidirectionAttenfusion, RefidConfig

    rng = np.random.RandomState(seed)
    cfg8 = RefidConfig(img_chn=8, num_encoders=2, base_num_channels=8,
                       num_residual_blocks=1)
    model8 = FinalBidirectionAttenfusion(cfg8)
    params8 = model8.init(
        jax.random.PRNGKey(seed),
        jnp.zeros((1, h, w, cfg8.img_chn)),
        jnp.zeros((1, 3, h, w, cfg8.ev_chn)))
    blur0 = rng.rand(h, w, 3).astype(np.float32)
    blur1 = rng.rand(h, w, 3).astype(np.float32)
    events = np.stack([np.sort(rng.rand(800)),
                       rng.randint(0, w, 800).astype(np.float32),
                       rng.randint(0, h, 800).astype(np.float32),
                       rng.randint(0, 2, 800).astype(np.float32)],
                      axis=1).astype(np.float32)
    return cfg8, params8, blur0, blur1, events


def test_static_int8_exclude_all_sites_is_exact():
    """The per-site exclusion escape hatch, pushed to its limit: serving
    int8='static' with EVERY site excluded reproduces the exact-math
    pipeline output — proving the fallback path is the exact path, not a
    third numeric regime."""
    from refid_tpu.pipeline import BlurVFIPipeline

    cfg8, params8, blur0, blur1, events = _tiny_pipe_inputs()
    pipe = BlurVFIPipeline(params8, cfg8, m=2, n=1, int8="static")
    pipe.calibrate(blur0, blur1, events)
    n_sites = len(pipe._int8_scales)
    pipe._int8_exclude = tuple(range(n_sites))
    got = np.asarray(pipe(blur0, blur1, events))

    exact_pipe = BlurVFIPipeline(params8, cfg8, m=2, n=1)
    exact = np.asarray(exact_pipe(blur0, blur1, events))
    np.testing.assert_allclose(got, exact, atol=2e-5, rtol=2e-5)


def test_calibrate_exclude_crest_selects_and_improves():
    """calibrate(exclude_crest=...): sites are selected by the calibrated
    amax/rms crest factor, a lower threshold excludes a superset, and a
    partially-excluded serve is at least as close to exact math as the
    all-int8 serve."""
    from refid_tpu.pipeline import BlurVFIPipeline

    cfg8, params8, blur0, blur1, events = _tiny_pipe_inputs(seed=19)

    pipe = BlurVFIPipeline(params8, cfg8, m=2, n=1, int8="static")
    # threshold above any real crest factor -> no exclusions
    pipe.calibrate(blur0, blur1, events, exclude_crest=1e9)
    assert pipe._int8_exclude == ()
    got_all_int8 = np.asarray(pipe(blur0, blur1, events))

    # amax >= rms always, so threshold 1.0 excludes every non-degenerate
    # site; and exclusion sets are monotone in the threshold
    pipe.calibrate(blur0, blur1, events, exclude_crest=1.0)
    assert len(pipe._int8_exclude) == len(pipe._int8_scales)
    pipe.calibrate(blur0, blur1, events, exclude_crest=3.0)
    mid = set(pipe._int8_exclude)
    pipe.calibrate(blur0, blur1, events, exclude_crest=6.0)
    high = set(pipe._int8_exclude)
    assert high <= mid
    assert 0 < len(mid) < len(pipe._int8_scales)

    got_mid = np.asarray(pipe_serve(pipe, blur0, blur1, events, mid))
    exact = np.asarray(BlurVFIPipeline(params8, cfg8, m=2, n=1)(
        blur0, blur1, events))

    def db(y):
        span = exact.max() - exact.min()
        return 20 * np.log10(span / np.sqrt(((y - exact) ** 2).mean()))

    # excluding the worst-quantizing sites must not hurt quality
    assert db(got_mid) >= db(got_all_int8) - 0.5, \
        (db(got_mid), db(got_all_int8))


def pipe_serve(pipe, blur0, blur1, events, exclude):
    pipe._int8_exclude = tuple(sorted(exclude))
    return pipe(blur0, blur1, events)


def test_calibration_save_load_roundtrips_exclusion(tmp_path):
    """save_calibration persists rms + exclusion; a fresh pipeline that
    loads it serves with the identical exclusion set."""
    from refid_tpu.pipeline import BlurVFIPipeline

    cfg8, params8, blur0, blur1, events = _tiny_pipe_inputs(seed=23)
    pipe = BlurVFIPipeline(params8, cfg8, m=2, n=1, int8="static")
    pipe.calibrate(blur0, blur1, events, exclude_crest=3.0)
    assert pipe._int8_exclude
    want = np.asarray(pipe(blur0, blur1, events))
    path = str(tmp_path / "calib.json")
    pipe.save_calibration(path)

    pipe2 = BlurVFIPipeline(params8, cfg8, m=2, n=1, int8="static")
    pipe2.load_calibration(path)
    assert pipe2._int8_exclude == pipe._int8_exclude
    assert pipe2._int8_rms == pipe._int8_rms
    got = np.asarray(pipe2(blur0, blur1, events))
    np.testing.assert_array_equal(got, want)


def test_production_db_decision_rule():
    """Round-5 deployment decision rule (VERDICT round-4 item 4): an int8
    serving mode is quality-gated IN iff its MEASURED production-shape
    (720p/t=23) PSNR vs the exact f32 forward clears PRODUCTION_DB_GATE.

    The recorded table (scripts/quant_db.py, real TPU, real init
    distributions) puts every int8 mode at 68.6-68.7 dB — at/above the
    68.6 dB bf16 rounding floor itself — so all measured modes gate in,
    and bench.py's stage-3 int8 headline plus the task layer's
    ``val.int8`` rely on this rule.  Unmeasured modes must NOT gate in."""
    from refid_tpu.serve.quant import (PRODUCTION_DB_GATE,
                                       PRODUCTION_SHAPE_DB,
                                       int8_quality_gated)

    # the gate sits far above the ~36 dB task-signal PSNR and below every
    # recorded mode: the rule is meaningful in both directions
    assert 40.0 <= PRODUCTION_DB_GATE <= 60.0
    for mode in (True, "scale0", "static"):
        assert mode in PRODUCTION_SHAPE_DB, mode
        assert PRODUCTION_SHAPE_DB[mode] >= PRODUCTION_DB_GATE, mode
        assert int8_quality_gated(mode), mode
    # int8 error must sit at/below the bf16 rounding floor — if a future
    # re-measure drops a mode below bf16 by >0.5 dB, this should be
    # revisited, not silently shipped
    for mode in (True, "scale0", "static"):
        assert PRODUCTION_SHAPE_DB[mode] >= PRODUCTION_SHAPE_DB[False] - 0.5
    # unmeasured modes stay OUT; so does bf16 (False is not an int8 mode
    # even though the baseline row lives in the same table)
    assert not int8_quality_gated("made_up_mode")
    assert not int8_quality_gated(None)
    assert not int8_quality_gated(False)


def test_evhinet_production_db_record():
    """EVHINet folded-serving int8 modes also clear the production-shape
    gate (scripts/quant_db_evhinet.py, 720p, real TPU): bf16 73.93 dB,
    int8 60.36, static 59.77.  Unlike the flagship (int8 at the bf16
    floor), EVHINet's quantization error is visible — the record pins
    that it stays >= the gate, and that a future re-measure dropping a
    mode below must be looked at rather than silently shipped."""
    from refid_tpu.serve.quant import (EVHINET_PRODUCTION_SHAPE_DB,
                                       PRODUCTION_DB_GATE)

    for mode in (True, "static"):
        assert EVHINET_PRODUCTION_SHAPE_DB[mode] >= PRODUCTION_DB_GATE, mode
    assert (EVHINET_PRODUCTION_SHAPE_DB[False]
            > EVHINET_PRODUCTION_SHAPE_DB[True])

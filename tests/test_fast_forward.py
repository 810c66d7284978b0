"""fast_forward (the functional serving path) vs model.apply."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from refid_tpu.models import FinalBidirectionAttenfusion, RefidConfig
from refid_tpu.serve import fast_forward


def _setup(seed=0, base=8, h=24, w=32, t=4):
    cfg = RefidConfig(img_chn=6, ev_chn=2, base_num_channels=base,
                      num_encoders=3, num_block=1, num_residual_blocks=2)
    model = FinalBidirectionAttenfusion(cfg)
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(1, h, w, cfg.img_chn).astype(np.float32))
    ev = jnp.asarray(rng.randn(1, t, h, w, cfg.ev_chn).astype(np.float32))
    params = model.init(jax.random.PRNGKey(seed), x, ev)
    return cfg, model, params, x, ev


@pytest.mark.slow
def test_fast_forward_matches_model():
    cfg, model, params, x, ev = _setup()
    want = np.asarray(model.apply(params, x, ev))
    got = np.asarray(fast_forward(params, cfg, x, ev))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


@pytest.mark.slow
def test_fast_forward_bf16_close_to_f32():
    import dataclasses
    cfg, model, params, x, ev = _setup(seed=2, t=3)
    want = np.asarray(model.apply(params, x, ev)).astype(np.float32)
    cfg16 = dataclasses.replace(cfg, dtype=jnp.bfloat16)
    got = np.asarray(fast_forward(params, cfg16, x, ev)).astype(np.float32)
    # bf16 serving tolerance (PERFORMANCE.md: ~3e-3 deviation at production
    # scale; random-init tiny nets are noisier)
    assert np.abs(got - want).max() < 0.1


def test_fast_forward_prepacked_events():
    """Pre-packed event input == packing inside (same math)."""
    from refid_tpu.serve.packing import space_to_depth
    cfg, model, params, x, ev = _setup(seed=3, t=3)
    want = np.asarray(fast_forward(params, cfg, x, ev, packed=True))
    b, t, h, w, c = ev.shape
    evp = space_to_depth(ev.reshape(b * t, h, w, c), 2).reshape(
        b, t, h // 2, w // 2, 4 * c)
    got = np.asarray(fast_forward(params, cfg, x, evp, packed=True))
    np.testing.assert_array_equal(got, want)


def test_task_predict_uses_packed_path_exactly():
    """The recurrent task's predict (tasks/base._make_predict_fn) routes
    production-config flagship nets through the packed serving forward;
    output == net.apply."""
    from refid_tpu.core.registry import MODELS
    import refid_tpu.tasks  # noqa: F401

    netg = {"type": "FinalBidirectionAttenfusion", "img_chn": 8,
            "ev_chn": 2, "num_encoders": 2, "base_num_channels": 8,
            "num_block": 1, "num_residual_blocks": 1}
    task = MODELS.get("TwoImageEventRecurrentRestorationModel")(
        {"is_train": False, "network_g": dict(netg), "val": {}})
    rng = np.random.RandomState(6)
    lq = rng.rand(1, 24, 32, 8).astype(np.float32)
    vox = rng.rand(1, 4, 24, 32, 2).astype(np.float32)
    task.params = task.net.init(jax.random.PRNGKey(6), jnp.asarray(lq),
                                jnp.asarray(vox))
    want = np.asarray(task.net.apply(task.params, jnp.asarray(lq),
                                     jnp.asarray(vox)))
    got = np.asarray(task.predict(lq, vox))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)

    # non-divisible shapes fall back to net.apply inside the same jit
    lq2 = rng.rand(1, 20, 28, 8).astype(np.float32)
    vox2 = rng.rand(1, 4, 20, 28, 2).astype(np.float32)
    got2 = np.asarray(task.predict(lq2, vox2))
    want2 = np.asarray(task.net.apply(task.params, jnp.asarray(lq2),
                                      jnp.asarray(vox2)))
    np.testing.assert_allclose(got2, want2, atol=1e-5, rtol=1e-5)

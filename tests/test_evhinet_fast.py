"""evhinet_fast_forward (width-folded EVHINet serving) vs model.apply."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from refid_tpu.models.evhinet import EVHINet
from refid_tpu.serve.evhinet_fast import evhinet_fast_forward


def _setup(seed=0, h=48, w=64, wf=16, ev_chn=6):
    model = EVHINet(wf=wf, ev_chn=ev_chn)
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.rand(1, h, w, 3).astype(np.float32))
    ev = jnp.asarray(rng.rand(1, h, w, ev_chn).astype(np.float32))
    params = model.init(jax.random.PRNGKey(seed), x, ev)
    return model, params, x, ev


@pytest.mark.parametrize("seed,h,w,wf", [(0, 48, 64, 16), (1, 40, 48, 8)])
def test_evhinet_fast_matches_model(seed, h, w, wf):
    model, params, x, ev = _setup(seed, h, w, wf)
    want = np.asarray(model.apply(params, x, ev))
    got = np.asarray(evhinet_fast_forward(params, x, ev, wf=wf))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_evhinet_fast_5d_events_and_bf16():
    """(b,t,h,w,c) voxel input path; bf16 tracks f32 within cast noise."""
    model, params, x, _ = _setup(2, 48, 64, 16)
    rng = np.random.RandomState(3)
    ev5 = jnp.asarray(rng.rand(1, 3, 48, 64, 2).astype(np.float32))
    want = np.asarray(model.apply(params, x, ev5))
    got = np.asarray(evhinet_fast_forward(params, x, ev5, wf=16))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)

    got_bf16 = np.asarray(
        evhinet_fast_forward(params, x, ev5, wf=16, dtype=jnp.bfloat16))
    span = want.max() - want.min()
    db = 20 * np.log10(span / np.sqrt(((got_bf16 - want) ** 2).mean()))
    assert db >= 35.0, f"bf16 folded EVHINet only {db:.1f} dB vs f32"


def test_task_predict_uses_folded_path_exactly():
    """ImageEventRestorationTask.predict == net.apply for EVHINet: the
    folded serving forward is wired in (tasks/base._make_predict_fn) with
    a per-trace shape fallback and a val.folded_predict opt-out."""
    from refid_tpu.core.registry import MODELS
    import refid_tpu.tasks  # noqa: F401  (registers tasks)

    netg = {"type": "SingleMultiConnectEVHINet", "in_chn": 3, "ev_chn": 6,
            "wf": 8, "depth": 3}
    task = MODELS.get("ImageEventRestorationModel")(
        {"is_train": False, "network_g": dict(netg), "val": {}})
    rng = np.random.RandomState(4)
    lq = rng.rand(1, 24, 32, 3).astype(np.float32)
    vox = rng.rand(1, 24, 32, 6).astype(np.float32)
    task.params = task.net.init(jax.random.PRNGKey(4), jnp.asarray(lq),
                                jnp.asarray(vox))
    want = np.asarray(task.net.apply(task.params, jnp.asarray(lq),
                                     jnp.asarray(vox)))
    got = np.asarray(task.predict(lq, vox))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)

    # NOTE: the h%4/w%4 fallback branch in _make_predict_fn is a guard
    # only — every spatial shape the 2-downsample UNet itself supports is
    # also fold-2-able, so no valid input can exercise it.

    # explicit opt-out
    task_off = MODELS.get("ImageEventRestorationModel")(
        {"is_train": False, "network_g": dict(netg),
         "val": {"folded_predict": False}})
    # (== not `is`: .apply is a fresh bound method on each access)
    assert task_off._make_predict_fn(task_off.opt) == task_off.net.apply


def test_evhinet_int8_modes_db_vs_f32():
    """int8 EVHINet serving (dynamic and calibrated-static): calib pass is
    exact, both quantized modes stay >= 28 dB vs the f32 forward, and
    static consumes exactly the sites calib recorded."""
    model, params, x, ev = _setup(5, 48, 64, 16)
    want = np.asarray(model.apply(params, x, ev))
    span = want.max() - want.min()

    def db(got):
        return 20 * np.log10(span / np.sqrt(((got - want) ** 2).mean()))

    dyn = np.asarray(evhinet_fast_forward(params, x, ev, wf=16, int8=True))
    assert db(dyn) >= 28.0, f"dynamic int8: {db(dyn):.1f} dB"

    q = {}
    calib = np.asarray(evhinet_fast_forward(params, x, ev, wf=16,
                                            int8="calib", qstate=q))
    np.testing.assert_allclose(calib, want, atol=1e-5, rtol=1e-5)
    scales = [float(a) for a in q["amax"]]
    assert len(scales) > 10

    st = np.asarray(evhinet_fast_forward(params, x, ev, wf=16,
                                         int8="static",
                                         qstate={"amax": scales}))
    assert db(st) >= 28.0, f"static int8: {db(st):.1f} dB"

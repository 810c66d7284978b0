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
    got = np.asarray(evhinet_fast_forward(params, x, ev))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_evhinet_fast_5d_events_and_bf16():
    """(b,t,h,w,c) voxel input path; bf16 tracks f32 within cast noise."""
    model, params, x, _ = _setup(2, 48, 64, 16)
    rng = np.random.RandomState(3)
    ev5 = jnp.asarray(rng.rand(1, 3, 48, 64, 2).astype(np.float32))
    want = np.asarray(model.apply(params, x, ev5))
    got = np.asarray(evhinet_fast_forward(params, x, ev5))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)

    got_bf16 = np.asarray(
        evhinet_fast_forward(params, x, ev5, dtype=jnp.bfloat16))
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

    dyn = np.asarray(evhinet_fast_forward(params, x, ev, int8=True))
    assert db(dyn) >= 28.0, f"dynamic int8: {db(dyn):.1f} dB"

    q = {}
    calib = np.asarray(evhinet_fast_forward(params, x, ev,
                                            int8="calib", qstate=q))
    np.testing.assert_allclose(calib, want, atol=1e-5, rtol=1e-5)
    scales = [float(a) for a in q["amax"]]
    assert len(scales) > 10

    st = np.asarray(evhinet_fast_forward(params, x, ev,
                                         int8="static",
                                         qstate={"amax": scales}))
    assert db(st) >= 28.0, f"static int8: {db(st):.1f} dB"


@pytest.mark.slow
def test_evhinet_fast_gradients_match_model():
    """Charbonnier-loss parameter gradients through the folded EVHINet
    forward == through model.apply (so train.folded_apply: true is exact
    for EVHINet training; opt-in until its step time is measured)."""
    from refid_tpu.train.losses import charbonnier_loss

    model, params, x, ev = _setup(8, 32, 32, 8)
    gt = jnp.asarray(np.random.RandomState(9).rand(1, 32, 32, 3)
                     .astype(np.float32))

    g_ref = jax.grad(lambda p: charbonnier_loss(
        model.apply(p, x, ev), gt))(params)
    g_fast = jax.grad(lambda p: charbonnier_loss(
        evhinet_fast_forward(p, x, ev), gt))(params)

    flat_ref = jax.tree_util.tree_leaves_with_path(g_ref)
    flat_fast = jax.tree_util.tree_leaves_with_path(g_fast)
    assert len(flat_ref) == len(flat_fast)
    for (path, a), (_, b) in zip(flat_ref, flat_fast):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=2e-5,
            err_msg=jax.tree_util.keystr(path))


def test_evhinet_folded_apply_option():
    """tasks/base honors train.folded_apply for EVHINet (opt-in; rejects
    non-foldable archs; default stays model.apply)."""
    import pytest as _pytest
    from refid_tpu.core.registry import MODELS
    import refid_tpu.tasks  # noqa: F401

    netg = {"type": "SingleMultiConnectEVHINet", "in_chn": 3, "ev_chn": 6,
            "wf": 8, "depth": 3}
    train = {"optim_g": {"type": "AdamW", "lr": 1e-3,
                         "weight_decay": 0.0, "betas": [0.9, 0.99]},
             "scheduler": {"type": "TrueCosineAnnealingLR", "T_max": 10,
                           "eta_min": 1e-7},
             "total_iter": 4,
             "pixel_opt": {"type": "CharbonnierLoss", "loss_weight": 1.0,
                           "reduction": "mean"}}
    # opt-in accepted for EVHINet
    task = MODELS.get("ImageEventRestorationModel")(
        {"is_train": True, "network_g": dict(netg), "path": {},
         "train": dict(train, folded_apply=True)})
    batch = {"lq": np.random.RandomState(0).rand(8, 16, 16, 3)
             .astype(np.float32),
             "voxel": np.random.RandomState(1).rand(8, 16, 16, 6)
             .astype(np.float32),
             "gt": np.random.RandomState(2).rand(8, 16, 16, 3)
             .astype(np.float32)}
    task.init_params(batch)
    task.setup_train_state()
    l0 = float(task.train_step(batch)["loss"])
    l1 = float(task.train_step(batch)["loss"])
    assert np.isfinite(l0) and np.isfinite(l1)

    # non-foldable arch still rejects folded_apply: true
    with _pytest.raises(ValueError, match="folded_apply"):
        MODELS.get("ImageEventRestorationModel")(
            {"is_train": True,
             "network_g": dict(netg, depth=4),
             "path": {}, "train": dict(train, folded_apply=True)})

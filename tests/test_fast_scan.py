"""fast_apply_scan (folded scan-based training forward) vs model.apply:
forward values AND parameter gradients, with and without remat."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from refid_tpu.models import FinalBidirectionAttenfusion, RefidConfig
from refid_tpu.serve.fast_scan import fast_apply_scan, make_fast_apply


def _setup(seed=0, base=8, h=24, w=32, t=4, dtype=None):
    cfg = RefidConfig(img_chn=6, ev_chn=2, base_num_channels=base,
                      num_encoders=3, num_block=1, num_residual_blocks=2,
                      dtype=dtype)
    model = FinalBidirectionAttenfusion(cfg)
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(1, h, w, cfg.img_chn).astype(np.float32))
    ev = jnp.asarray(rng.randn(1, t, h, w, cfg.ev_chn).astype(np.float32))
    params = model.init(jax.random.PRNGKey(seed), x, ev)
    return cfg, model, params, x, ev


def test_fast_scan_tap_wgrad_matches_autodiff():
    """tap_wgrad=True changes only the weight-gradient FORMULATION (per-tap
    dot_generals instead of XLA wgrad convs): forward identical, gradients
    within matmul-reassociation tolerance."""
    cfg, model, params, x, ev = _setup(seed=4, t=3, h=16, w=16)
    rng = np.random.RandomState(11)
    gt = jnp.asarray(rng.randn(1, ev.shape[1], x.shape[1], x.shape[2],
                               3).astype(np.float32))

    def make_loss(**kw):
        def loss(p):
            pred = fast_apply_scan(p, cfg, x, ev, **kw)
            return jnp.mean(jnp.sqrt((pred - gt) ** 2 + 1e-12))
        return loss

    l0, g0 = jax.value_and_grad(make_loss())(params)
    l1, g1 = jax.value_and_grad(make_loss(tap_wgrad=True))(params)
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-6)
    g1f = dict(jax.tree_util.tree_leaves_with_path(g1))
    for path, a0 in jax.tree_util.tree_leaves_with_path(g0):
        a1 = g1f[path]
        scale = max(float(np.abs(a0).max()), 1e-8)
        np.testing.assert_allclose(np.asarray(a1) / scale,
                                   np.asarray(a0) / scale, atol=2e-5,
                                   err_msg=jax.tree_util.keystr(path))


def test_fast_scan_pcast_loss_trajectory_tracks_f32_accum():
    """cast_params_once accumulates kernel-grad cotangents in bf16: the
    training trajectory must track the f32-accumulation baseline closely
    (same methodology as the bf16-vs-f32 loss-curve test).  Measured
    divergence peaks ~1% per step on this micro-setup (bf16 rounding of
    the 2t-step cotangent sums, amplified by clip at lr 2e-3); the knob
    is OPT-IN for training (train.folded_pcast) pending a long-horizon
    run."""
    import optax
    cfg, model, params, x, ev = _setup(seed=5, t=3, h=16, w=16,
                                       dtype=jnp.bfloat16)
    rng = np.random.RandomState(12)
    gt = jnp.asarray(rng.randn(1, ev.shape[1], x.shape[1], x.shape[2],
                               3).astype(np.float32))
    tx = optax.chain(optax.clip_by_global_norm(0.01),
                     optax.adamw(2e-3, b1=0.9, b2=0.99, weight_decay=1e-4))

    def run(pcast, steps=10):
        p = params
        opt = tx.init(p)
        losses = []

        @jax.jit
        def step(p, opt):
            def loss_fn(pp):
                pred = fast_apply_scan(pp, cfg, x, ev,
                                       cast_params_once=pcast)
                return jnp.mean(jnp.sqrt(
                    (pred.astype(jnp.float32) - gt) ** 2 + 1e-12))
            loss, g = jax.value_and_grad(loss_fn)(p)
            up, opt = tx.update(g, opt, p)
            return optax.apply_updates(p, up), opt, loss

        for _ in range(steps):
            p, opt, loss = step(p, opt)
            losses.append(float(loss))
        return np.asarray(losses)

    base = run(False)
    fast = run(True)
    assert np.all(np.abs(fast - base) / np.abs(base) < 0.02), (base, fast)


def test_fast_scan_matches_model():
    cfg, model, params, x, ev = _setup()
    want = np.asarray(model.apply(params, x, ev))
    for remat, unroll in ((False, 1), (True, 1), (True, 2), ("convs", 1)):
        got = np.asarray(fast_apply_scan(params, cfg, x, ev, remat=remat,
                                         unroll=unroll))
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_fast_scan_packed_events_match():
    """Pre-packed s2d(2,2) event input (the serving contract shared with
    fast_forward — what the on-device voxelizer emits) produces the same
    output as the raw (b, t, h, w, ev_chn) stack."""
    from refid_tpu.serve.packing import space_to_depth
    cfg, model, params, x, ev = _setup(seed=7)
    b, t, h, w, c = ev.shape
    evp = space_to_depth(ev.reshape(b * t, h, w, c), 2).reshape(
        b, t, h // 2, w // 2, 4 * c)
    want = np.asarray(fast_apply_scan(params, cfg, x, ev, remat=False))
    got = np.asarray(fast_apply_scan(params, cfg, x, evp, remat=False))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-6, rtol=1e-6)


@pytest.mark.slow
def test_fast_scan_rematconv_gradients_match_full_remat():
    """remat='convs' (save-conv-outputs policy) must be a pure scheduling
    change: parameter gradients match full per-step remat within a tight
    scaled tolerance (atol 1e-5 after normalizing by each leaf's max)."""
    cfg, model, params, x, ev = _setup(seed=2, t=3, h=16, w=16)
    rng = np.random.RandomState(9)
    gt = jnp.asarray(
        rng.randn(1, ev.shape[1], x.shape[1], x.shape[2], 3).astype(
            np.float32))

    def make_loss(remat):
        def loss(p):
            pred = fast_apply_scan(p, cfg, x, ev, remat=remat)
            return jnp.mean(jnp.sqrt((pred - gt) ** 2 + 1e-12))
        return loss

    lt, g_full = jax.value_and_grad(make_loss(True))(params)
    lc, g_conv = jax.value_and_grad(make_loss("convs"))(params)
    np.testing.assert_allclose(float(lc), float(lt), rtol=1e-6)
    g_conv_flat = dict(jax.tree_util.tree_leaves_with_path(g_conv))
    for path, aw in jax.tree_util.tree_leaves_with_path(g_full):
        af = g_conv_flat[path]
        scale = max(float(np.abs(aw).max()), 1e-8)
        np.testing.assert_allclose(
            np.asarray(af) / scale, np.asarray(aw) / scale, atol=1e-5,
            err_msg=jax.tree_util.keystr(path))


@pytest.mark.slow
def test_fast_scan_gradients_match_model():
    """Charbonnier-loss parameter gradients: folded scan == model.apply."""
    cfg, model, params, x, ev = _setup(seed=1, t=3)
    rng = np.random.RandomState(7)
    gt = jnp.asarray(
        rng.randn(1, ev.shape[1], x.shape[1], x.shape[2], 3).astype(
            np.float32))

    def loss_model(p):
        pred = model.apply(p, x, ev)
        return jnp.mean(jnp.sqrt((pred - gt) ** 2 + 1e-12))

    apply_fn = make_fast_apply(cfg, remat=True)

    def loss_fast(p):
        pred = apply_fn(p, x, ev)
        return jnp.mean(jnp.sqrt((pred - gt) ** 2 + 1e-12))

    lw, gw = jax.value_and_grad(loss_model)(params)
    lf, gf = jax.value_and_grad(loss_fast)(params)
    np.testing.assert_allclose(float(lf), float(lw), rtol=1e-6)
    flat_w = jax.tree_util.tree_leaves_with_path(gw)
    flat_f = dict(jax.tree_util.tree_leaves_with_path(gf))
    # a handful of leaves can be checked exactly; use relative scale per leaf
    for path, aw in flat_w:
        af = flat_f[path]
        scale = max(float(np.abs(aw).max()), 1e-8)
        np.testing.assert_allclose(
            np.asarray(af) / scale, np.asarray(aw) / scale,
            atol=2e-5, err_msg=jax.tree_util.keystr(path))


@pytest.mark.slow
def test_fast_scan_trains_via_trainer():
    """make_train_step(apply_fn=folded scan) takes steps and matches the
    model.apply step's loss trajectory."""
    from refid_tpu.train.losses import charbonnier_loss
    from refid_tpu.train.trainer import (build_optimizer, create_train_state,
                                         make_train_step)
    cfg, model, params, x, ev = _setup(seed=2, t=3)
    rng = np.random.RandomState(11)
    gt = jnp.asarray(
        rng.randn(1, ev.shape[1], x.shape[1], x.shape[2], 3).astype(
            np.float32))
    train_opt = {"optim_g": {"type": "AdamW", "lr": 2e-4,
                             "betas": [0.9, 0.99], "weight_decay": 1e-4},
                 "scheduler": {"type": "TrueCosineAnnealingLR",
                               "T_max": 1000, "eta_min": 1e-7},
                 "grad_clip_norm": 0.01}

    def loss_fn(pred, gt_):
        return charbonnier_loss(pred.astype(jnp.float32), gt_)

    losses = {}
    for name, fn in [("model", lambda p, lq, vox: model.apply(p, lq, vox)),
                     ("fast", make_fast_apply(cfg, remat=True))]:
        tx, _ = build_optimizer(train_opt, 1000)
        state = create_train_state(params, tx)
        step = make_train_step(fn, loss_fn, donate=False)
        ls = []
        for _ in range(3):
            state, metrics = step(state, x, ev, gt)
            ls.append(float(metrics["loss"]))
        losses[name] = ls
    np.testing.assert_allclose(losses["fast"], losses["model"], rtol=1e-5)


@pytest.mark.slow
def test_task_folded_apply_option():
    """tasks/base.py honors train.folded_apply (and rejects non-production
    configs)."""
    import pytest
    from refid_tpu.tasks.base import RestorationTaskBase

    def make_opt(**net_extra):
        return {
            "is_train": True,
            "network_g": dict({
                "type": "FinalBidirectionAttenfusion",
                "img_chn": 6, "ev_chn": 2, "num_encoders": 2,
                "base_num_channels": 4, "num_block": 1,
                "num_residual_blocks": 1}, **net_extra),
            "train": {
                "optim_g": {"type": "AdamW", "lr": 2e-4,
                            "betas": [0.9, 0.99], "weight_decay": 1e-4},
                "scheduler": {"type": "TrueCosineAnnealingLR",
                              "T_max": 100, "eta_min": 1e-7},
                "total_iter": 100, "folded_apply": True},
            "path": {},
        }

    rng = np.random.RandomState(0)
    batch = {"lq": rng.rand(1, 2, 16, 32, 3).astype(np.float32),
             "voxel": rng.rand(1, 3, 16, 32, 2).astype(np.float32),
             "gt": rng.rand(1, 3, 16, 32, 3).astype(np.float32)}
    task = RestorationTaskBase(make_opt())
    task.init_params(batch)
    task.setup_train_state()
    m1 = task.train_step_device({k: jnp.asarray(v)
                                 for k, v in batch.items()})
    assert np.isfinite(float(m1["loss"]))

    with pytest.raises(ValueError, match="folded_apply"):
        RestorationTaskBase(make_opt(num_encoders=1))

"""Losses, LR schedules, optimizer step: golden tests vs torch oracles."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from refid_tpu.train.losses import (charbonnier_loss, l1_loss, mse_loss,
                                    psnr_loss, build_loss)
from refid_tpu.train.schedules import (true_cosine_annealing,
                                       cosine_annealing_restart, linear_lr,
                                       vibrate_lr, multi_step_restart,
                                       with_warmup, build_schedule)


def _pair(shape=(2, 3, 8, 8), seed=0):
    rng = np.random.RandomState(seed)
    return (rng.randn(*shape).astype(np.float32),
            rng.randn(*shape).astype(np.float32))


def test_charbonnier_matches_formula():
    a, b = _pair()
    got = float(charbonnier_loss(a, b))
    want = np.sqrt((a - b) ** 2 + 1e-12).mean()
    assert abs(got - want) < 1e-6


def test_charbonnier_reduction_and_weight():
    a, b = _pair(seed=1)
    w = np.abs(_pair(seed=2)[0])
    got = float(charbonnier_loss(a, b, weight=w, reduction="sum"))
    want = (np.sqrt((a - b) ** 2 + 1e-12) * w).sum()
    assert abs(got - want) / abs(want) < 1e-5


def test_l1_mse():
    a, b = _pair(seed=3)
    assert abs(float(l1_loss(a, b)) - np.abs(a - b).mean()) < 1e-6
    assert abs(float(mse_loss(a, b)) - ((a - b) ** 2).mean()) < 1e-6


def test_psnr_loss_matches_torch_formula():
    a, b = _pair(seed=4)
    got = float(psnr_loss(a, b))
    scale = 10 / np.log(10)
    want = scale * np.mean(np.log(((a - b) ** 2).mean(axis=(1, 2, 3)) + 1e-8))
    assert abs(got - want) < 2e-4  # f32 log noise


def test_psnr_loss_toY_matches_torch_reference():
    """toY path vs the reference PSNRLoss formula (losses.py:95-120):
    BT.601 luma projection before the log-MSE."""
    import torch

    a, b = _pair(shape=(2, 8, 8, 3), seed=6)  # NHWC
    got = float(psnr_loss(a, b, toY=True))

    ta = torch.from_numpy(np.transpose(a, (0, 3, 1, 2)))
    tb = torch.from_numpy(np.transpose(b, (0, 3, 1, 2)))
    coef = torch.tensor([65.481, 128.553, 24.966]).reshape(1, 3, 1, 1)
    pa = ((ta * coef).sum(dim=1, keepdim=True) + 16.0) / 255.0
    pb = ((tb * coef).sum(dim=1, keepdim=True) + 16.0) / 255.0
    scale = 10 / np.log(10)
    want = float(scale * torch.log(
        ((pa - pb) ** 2).mean(dim=(1, 2, 3)) + 1e-8).mean())
    assert abs(got - want) < 2e-4


def test_build_loss():
    a, b = _pair(seed=5)
    fn = build_loss({"type": "CharbonnierLoss", "loss_weight": 2.0,
                     "reduction": "mean"})
    assert abs(float(fn(a, b)) - 2 * float(charbonnier_loss(a, b))) < 1e-6


# --- schedules -------------------------------------------------------------


def _torch_lrs(sched_ctor, steps, base_lr=2e-4):
    import torch
    p = torch.nn.Parameter(torch.zeros(1))
    optimizer = torch.optim.SGD([p], lr=base_lr)
    sched = sched_ctor(optimizer)
    lrs = []
    for _ in range(steps):
        lrs.append(optimizer.param_groups[0]["lr"])
        optimizer.step()
        sched.step()
    return np.array(lrs)


def test_true_cosine_matches_torch():
    import torch
    base, tmax, eta = 2e-4, 100, 1e-7
    want = _torch_lrs(lambda o: torch.optim.lr_scheduler.CosineAnnealingLR(
        o, T_max=tmax, eta_min=eta), 100, base)
    sched = true_cosine_annealing(base, tmax, eta)
    got = np.array([float(sched(i)) for i in range(100)])
    np.testing.assert_allclose(got, want, rtol=1e-4)  # f32 cos noise


def test_cosine_restart_matches_reference():
    # closed-form check against lr_scheduler.py:171-183 semantics
    base, eta = 1e-3, 1e-7
    periods, weights = [10, 20], [1.0, 0.5]
    sched = cosine_annealing_restart(base, periods, weights, eta)
    import math
    for step, (lo, period, w) in [(3, (0, 10, 1.0)), (12, (10, 20, 0.5)),
                                  (25, (10, 20, 0.5))]:
        want = eta + w * 0.5 * (base - eta) * (
            1 + math.cos(math.pi * (step - lo) / period))
        assert abs(float(sched(step)) - want) < 1e-9, step


def test_linear_and_warmup():
    sched = with_warmup(linear_lr(1e-3, 1000), 1e-3, 10)
    assert abs(float(sched(5)) - 1e-3 * 5 / 10) < 1e-9
    assert abs(float(sched(500)) - 1e-3 * 0.5) < 1e-9


def test_vibrate_matches_reference_loop():
    # oracle: direct transcription of lr_scheduler.py:88-112 math
    base, total = 1e-3, 800
    sched = vibrate_lr(base, total)
    T = total // 80
    Th = T // 2
    for step in [0, 3, 7, 150, 350, 550, 790]:
        process = step / total
        f = 0.1
        if process < 3 / 8:
            f = 1 - process * 8 / 3
        elif process < 5 / 8:
            f = 0.2
        t = step % T
        f2 = t / Th
        if t >= Th:
            f2 = 2 - f2
        weight = f * f2
        if step < Th:
            weight = max(0.1, weight)
        assert abs(float(sched(step)) - base * weight) < 1e-9, step


def test_build_schedule_production():
    # the production config: TrueCosineAnnealingLR T_max 200000 eta 1e-7
    sched = build_schedule({"type": "TrueCosineAnnealingLR",
                            "T_max": 200000, "eta_min": 1e-7}, 2e-4, 200000)
    assert abs(float(sched(0)) - 2e-4) < 1e-9
    assert abs(float(sched(200000)) - 1e-7) < 1e-9


# --- train step ------------------------------------------------------------


def test_train_step_overfits_tiny_batch():
    import flax.linen as nn
    from refid_tpu.train.trainer import (build_optimizer, create_train_state,
                                         make_train_step)

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, lq, voxel):
            x = nn.Conv(8, (3, 3), padding=1)(lq)
            x = nn.relu(x)
            v = jnp.mean(voxel, axis=1)  # (b,h,w,c)
            x = jnp.concatenate([x, v], axis=-1)
            return nn.Conv(3, (3, 3), padding=1)(x)[:, None]

    model = Tiny()
    rng = np.random.RandomState(0)
    lq = jnp.asarray(rng.rand(4, 8, 8, 3), jnp.float32)
    vox = jnp.asarray(rng.rand(4, 2, 8, 8, 2), jnp.float32)
    gt = jnp.asarray(rng.rand(4, 1, 8, 8, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), lq, vox)

    train_opt = {"optim_g": {"type": "AdamW", "lr": 1e-2,
                             "betas": [0.9, 0.99], "weight_decay": 1e-4},
                 "scheduler": {"type": "TrueCosineAnnealingLR",
                               "T_max": 1000, "eta_min": 1e-7},
                 "grad_clip_norm": 1.0}
    tx, _ = build_optimizer(train_opt, 1000)
    state = create_train_state(params, tx)
    step = make_train_step(model.apply, charbonnier_loss, donate=False)

    first = None
    for i in range(60):
        state, metrics = step(state, lq, vox, gt)
        if first is None:
            first = float(metrics["loss"])
    last = float(metrics["loss"])
    assert last < first * 0.5, (first, last)
    assert int(state.step) == 60


def test_train_step_dp_sharded_matches_single():
    """DP over an 8-device CPU mesh must produce the same update as
    single-device (same global batch)."""
    import flax.linen as nn
    from refid_tpu.parallel import make_mesh, shard_batch
    from refid_tpu.train.trainer import (build_optimizer, create_train_state,
                                         make_train_step)

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, lq, voxel):
            x = nn.Conv(4, (3, 3), padding=1)(lq)
            return nn.Conv(3, (3, 3), padding=1)(nn.relu(x))[:, None]

    model = Tiny()
    rng = np.random.RandomState(1)
    lq = rng.rand(8, 8, 8, 3).astype(np.float32)
    vox = rng.rand(8, 2, 8, 8, 2).astype(np.float32)
    gt = rng.rand(8, 1, 8, 8, 3).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(lq),
                        jnp.asarray(vox))

    train_opt = {"optim_g": {"type": "AdamW", "lr": 1e-3,
                             "betas": [0.9, 0.99], "weight_decay": 1e-4},
                 "scheduler": {"type": "TrueCosineAnnealingLR",
                               "T_max": 100, "eta_min": 1e-7},
                 "grad_clip_norm": 0.01}

    def run(shard: bool, steps=3):
        tx, _ = build_optimizer(train_opt, 100)
        state = create_train_state(params, tx)
        step = make_train_step(model.apply, charbonnier_loss, donate=False)
        if shard:
            mesh = make_mesh()
            b = shard_batch({"lq": lq, "voxel": vox, "gt": gt}, mesh)
        else:
            b = {"lq": jnp.asarray(lq), "voxel": jnp.asarray(vox),
                 "gt": jnp.asarray(gt)}
        losses = []
        for _ in range(steps):
            state, m = step(state, b["lq"], b["voxel"], b["gt"])
            losses.append(float(m["loss"]))
        return losses, state

    losses_1, state_1 = run(False)
    losses_8, state_8 = run(True)
    np.testing.assert_allclose(losses_1, losses_8, rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(state_1.params),
                    jax.tree_util.tree_leaves(state_8.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_ema_tracking():
    import flax.linen as nn
    from refid_tpu.train.trainer import (build_optimizer, create_train_state,
                                         make_train_step)

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, lq, voxel):
            return nn.Conv(3, (1, 1))(lq)[:, None]

    model = Tiny()
    lq = jnp.ones((2, 4, 4, 3))
    vox = jnp.ones((2, 1, 4, 4, 2))
    gt = jnp.zeros((2, 1, 4, 4, 3))
    params = model.init(jax.random.PRNGKey(0), lq, vox)
    train_opt = {"optim_g": {"type": "AdamW", "lr": 1e-2,
                             "betas": [0.9, 0.99], "weight_decay": 0.0},
                 "scheduler": {"type": "TrueCosineAnnealingLR", "T_max": 100,
                               "eta_min": 0.0}}
    tx, _ = build_optimizer(train_opt, 100)
    state = create_train_state(params, tx, ema_decay=0.9)
    step = make_train_step(model.apply, charbonnier_loss, ema_decay=0.9,
                           donate=False)
    state, _ = step(state, lq, vox, gt)
    # ema must lag params: ema = 0.9*old + 0.1*new
    p0 = jax.tree_util.tree_leaves(params)[0]
    p1 = jax.tree_util.tree_leaves(state.params)[0]
    e1 = jax.tree_util.tree_leaves(state.ema_params)[0]
    np.testing.assert_allclose(np.asarray(e1),
                               0.9 * np.asarray(p0) + 0.1 * np.asarray(p1),
                               atol=1e-7)


def test_srn_and_tv_losses():
    from refid_tpu.train.losses import srn_loss, weighted_tv_loss
    rng = np.random.RandomState(7)
    gt = jnp.asarray(rng.rand(1, 16, 16, 3).astype(np.float32))
    preds = [jnp.asarray(rng.rand(1, 4, 4, 3).astype(np.float32)),
             jnp.asarray(rng.rand(1, 8, 8, 3).astype(np.float32)),
             jnp.asarray(rng.rand(1, 16, 16, 3).astype(np.float32))]
    assert float(srn_loss(preds, gt)) > 0
    p = jnp.asarray(rng.rand(1, 8, 8, 3).astype(np.float32))
    tv = float(weighted_tv_loss(p))
    want = (np.abs(np.diff(np.asarray(p), axis=1)).mean()
            + np.abs(np.diff(np.asarray(p), axis=2)).mean())
    assert abs(tv - want) < 1e-6
    flat = jnp.ones((1, 8, 8, 3))
    assert float(weighted_tv_loss(flat)) == 0.0


def test_dcn_lr_mult_param_group():
    """When dcn_lr_mult is set, top-level 'offsets'/'dcns' modules (the
    reference's exact match, twoImage_event_recurrent_model.py:74) and
    'conv_offset' side convs get scaled updates; other params (even ones
    whose names merely CONTAIN 'offset') do not.  The DEFAULT is 1.0 — the
    reference's low-lr group is empty for every REFID arch (no top-level
    offsets/dcns modules exist)."""
    import jax
    import jax.numpy as jnp
    from refid_tpu.train.trainer import build_optimizer

    train_opt = {"optim_g": {"type": "AdamW", "lr": 1e-3,
                             "betas": [0.9, 0.99], "weight_decay": 0.0},
                 "scheduler": {"type": "TrueCosineAnnealingLR",
                               "T_max": 1000000, "eta_min": 1e-3},
                 "grad_clip_norm": 0, "warmup_iter": -1,
                 "dcn_lr_mult": 0.1}
    tx, _ = build_optimizer(train_opt, 1000000)
    params = {"conv": {"kernel": jnp.ones((3,))},
              "offsets": {"kernel": jnp.ones((3,))},
              "offset_embed": {"kernel": jnp.ones((3,))},  # substring trap
              "enc_0": {"conv": {"conv_offset": {"kernel": jnp.ones((3,))}}}}
    state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    reg = np.asarray(updates["conv"]["kernel"])
    # identical grads: offsets update must be exactly 0.1x the regular one
    np.testing.assert_allclose(np.asarray(updates["offsets"]["kernel"]),
                               0.1 * reg, rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(updates["enc_0"]["conv"]["conv_offset"]["kernel"]),
        0.1 * reg, rtol=1e-6)
    # a param merely containing 'offset' in its name is NOT scaled
    np.testing.assert_allclose(np.asarray(updates["offset_embed"]["kernel"]),
                               reg, rtol=1e-6)

    # default: no dcn_lr_mult key -> identity (reference group is empty)
    t2 = {k: v for k, v in train_opt.items() if k != "dcn_lr_mult"}
    tx2, _ = build_optimizer(t2, 1000000)
    u2, _ = tx2.update(grads, tx2.init(params), params)
    np.testing.assert_allclose(np.asarray(u2["offsets"]["kernel"]),
                               np.asarray(u2["conv"]["kernel"]), rtol=1e-6)


def test_adamw_clip_step_matches_torch():
    """One optimizer step (clip 0.01 -> AdamW 2e-4/0.9/0.99/wd 1e-4) must
    match torch's clip_grad_norm_ + AdamW.step() on identical params/grads
    (the production recipe, twoImage_event_recurrent_model.py:273-310)."""
    import torch
    from refid_tpu.train.trainer import build_optimizer

    rng = np.random.RandomState(0)
    w = rng.randn(6, 5).astype(np.float32)
    g = rng.randn(6, 5).astype(np.float32) * 3.0

    # torch
    tp = torch.nn.Parameter(torch.from_numpy(w.copy()))
    opt = torch.optim.AdamW([tp], lr=2e-4, betas=(0.9, 0.99),
                            weight_decay=1e-4, eps=1e-8)
    tp.grad = torch.from_numpy(g.copy())
    torch.nn.utils.clip_grad_norm_([tp], 0.01)
    opt.step()
    want_1 = tp.detach().numpy().copy()
    tp.grad = torch.from_numpy((g * 0.5).copy())
    torch.nn.utils.clip_grad_norm_([tp], 0.01)
    opt.step()
    want_2 = tp.detach().numpy().copy()

    # ours
    train_opt = {"optim_g": {"type": "AdamW", "lr": 2e-4,
                             "betas": [0.9, 0.99], "weight_decay": 1e-4},
                 "scheduler": {"type": "TrueCosineAnnealingLR",
                               "T_max": 10 ** 9, "eta_min": 2e-4},
                 "grad_clip_norm": 0.01}
    tx, _ = build_optimizer(train_opt, 10 ** 9)
    params = {"w": jnp.asarray(w)}
    state = tx.init(params)
    import optax
    up, state = tx.update({"w": jnp.asarray(g)}, state, params)
    params = optax.apply_updates(params, up)
    np.testing.assert_allclose(np.asarray(params["w"]), want_1, atol=2e-7)
    up, state = tx.update({"w": jnp.asarray(g * 0.5)}, state, params)
    params = optax.apply_updates(params, up)
    np.testing.assert_allclose(np.asarray(params["w"]), want_2, atol=2e-7)


@pytest.mark.slow
def test_bf16_training_tracks_f32():
    """bf16 compute with f32 params/optimizer must track f32 training:
    same data, same init, 20 steps — losses within 1% at every step and
    the curves both decreasing (the recipe validation for enabling
    compute_dtype: bfloat16 in training; measured on TPU the two differ by
    2e-5 absolute after 10 steps at the production shape, PERFORMANCE.md
    round-3)."""
    import dataclasses
    import jax
    import jax.numpy as jnp
    from refid_tpu.models import FinalBidirectionAttenfusion, RefidConfig
    from refid_tpu.train.losses import charbonnier_loss
    from refid_tpu.train.trainer import build_optimizer, create_train_state

    rng = np.random.RandomState(0)
    b, t, hw = 2, 3, 24
    cfg32 = RefidConfig(img_chn=6, ev_chn=2, base_num_channels=8,
                        num_encoders=2, num_residual_blocks=1)
    lq = jnp.asarray(rng.rand(b, hw, hw, 6).astype(np.float32))
    vox = jnp.asarray(rng.rand(b, t, hw, hw, 2).astype(np.float32))
    gt = jnp.asarray(rng.rand(b, t, hw, hw, 3).astype(np.float32))

    train_opt = {"optim_g": {"type": "AdamW", "lr": 2e-4,
                             "betas": [0.9, 0.99], "weight_decay": 1e-4},
                 "scheduler": {"type": "TrueCosineAnnealingLR",
                               "T_max": 1000, "eta_min": 1e-7},
                 "grad_clip_norm": 0.01}

    def run(cfg, steps=20):
        model = FinalBidirectionAttenfusion(cfg)
        params = model.init(jax.random.PRNGKey(0), lq, vox)
        # params are created in f32 regardless of compute dtype
        tx, _ = build_optimizer(train_opt, 1000)
        state = create_train_state(params, tx)

        @jax.jit
        def step(state):
            def loss_fn(p):
                pred = model.apply(p, lq, vox).astype(jnp.float32)
                return charbonnier_loss(pred, gt)
            loss, grads = jax.value_and_grad(loss_fn)(state.params)
            return state.apply_gradients(grads), loss

        losses = []
        for _ in range(steps):
            state, loss = step(state)
            losses.append(float(loss))
        return losses

    l32 = run(cfg32)
    l16 = run(dataclasses.replace(cfg32, dtype=jnp.bfloat16))
    assert l32[-1] < l32[0] and l16[-1] < l16[0], (l32[0], l32[-1])
    for a, b_ in zip(l32, l16):
        assert abs(a - b_) / abs(a) < 0.01, (a, b_)

"""End-to-end: train CLI on a synthetic micro-dataset, checkpoint/resume,
validation, tiled inference, test CLI."""

import os

import numpy as np
import pytest
import yaml

from tests.synthetic_data import make_gopro_tree


def _write_cfg(tmp_path, root, name="debugless_e2e", m=2, n=1):
    cfg = {
        "name": name,
        "model_type": "TwoImageEventRecurrentRestorationModel",
        "scale": 1, "num_gpu": 1, "manual_seed": 10,
        "datasets": {
            "train": {
                "name": "synth-train", "type": "GoProEventRecurrentDataset",
                "dataroot": root, "num_end_interpolation": m,
                "num_inter_interpolation": n, "norm_voxel": True,
                "one_voxel_flag": True, "return_deblur_voxel": True,
                "io_backend": {"type": "disk"}, "gt_size": 16,
                "use_hflip": True, "use_rot": True, "use_shuffle": True,
                "num_worker_per_gpu": 2, "batch_size_per_gpu": 1,
                # global batch = per-device x 8 virtual devices; enlarge so
                # the 4-item micro-dataset still yields full batches
                "dataset_enlarge_ratio": 8,
                "video_list": ["VID_A", "VID_B"],
            },
            "val": {
                "name": "synth-val", "type": "GoProEventRecurrentDataset",
                "dataroot": root, "num_end_interpolation": m,
                "num_inter_interpolation": n, "norm_voxel": True,
                "one_voxel_flag": True, "return_deblur_voxel": True,
                "io_backend": {"type": "disk"}, "gt_size": None,
                "use_hflip": False, "use_rot": False,
                "video_list": ["VID_A"], "phase": "val",
            },
        },
        "network_g": {
            "type": "FinalBidirectionAttenfusion",
            "img_chn": 8, "ev_chn": 2, "num_encoders": 2,
            "base_num_channels": 4, "num_block": 1,
            "num_residual_blocks": 1,
        },
        "path": {"pretrain_network_g": None, "strict_load_g": True,
                 "resume_state": None},
        "train": {
            "optim_g": {"type": "AdamW", "lr": 2.0e-3,
                        "weight_decay": 1.0e-4, "betas": [0.9, 0.99]},
            "scheduler": {"type": "TrueCosineAnnealingLR", "T_max": 100,
                          "eta_min": 1.0e-7},
            "total_iter": 6, "warmup_iter": -1,
            "pixel_opt": {"type": "CharbonnierLoss", "loss_weight": 1.0,
                          "reduction": "mean"},
        },
        "val": {
            "val_freq": 6, "save_img": False, "grids": None,
            "crop_size": None, "max_minibatch": 2,
            "metrics_deblur": {
                "psnr": {"type": "calculate_psnr", "crop_border": 0,
                         "test_y_channel": False}},
            "metrics_interpo": {
                "psnr": {"type": "calculate_psnr", "crop_border": 0,
                         "test_y_channel": False}},
        },
        "logger": {"print_freq": 2, "save_checkpoint_freq": 3,
                   "use_tb_logger": False},
    }
    path = tmp_path / "cfg.yml"
    path.write_text(yaml.safe_dump(cfg))
    return str(path)


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    data_root = str(tmp_path_factory.mktemp("data"))
    make_gopro_tree(data_root, m=2, n=1, videos=("VID_A", "VID_B"))
    # val/test phases read the 'test' split
    make_gopro_tree(data_root, split="test", m=2, n=1,
                    videos=("VID_A", "VID_B"))
    exp_root = str(tmp_path_factory.mktemp("exp"))
    return data_root, exp_root


@pytest.mark.slow
def test_train_cli_end_to_end(env, tmp_path):
    data_root, exp_root = env
    cfg = _write_cfg(tmp_path, data_root)
    from refid_tpu.cli.train import main
    task = main(["-opt", cfg, "--root", exp_root])

    # checkpoints at iters 3 and 6 exist
    models_dir = os.path.join(exp_root, "experiments", "debugless_e2e",
                              "models")
    assert task.ckpt.latest_step() == 6
    assert os.path.isdir(models_dir)

    # resume: run again with a higher max-iters; should auto-resume from 6
    task2 = main(["-opt", cfg, "--root", exp_root, "--max-iters", "8"])
    assert task2.start_iter == 6
    assert int(task2.state.step) == 8


@pytest.mark.slow
def test_validation_metrics(env, tmp_path):
    data_root, exp_root = env
    cfg = _write_cfg(tmp_path, data_root, name="e2e_val")
    from refid_tpu.cli.train import main
    task = main(["-opt", cfg, "--root", exp_root])
    from refid_tpu.data import build_dataset, build_loader
    dopt = task.opt["datasets"]["val"]
    loader = build_loader(build_dataset(dopt), dopt, False)
    res = task.validate(loader, dopt, max_items=1)
    assert "deblur_psnr" in res and "interpo_psnr" in res and \
        "total_psnr" in res
    m, n = 2, 1
    want_total = (res["deblur_psnr"] * 2 * m + res["interpo_psnr"] * n) / (
        2 * m + n)
    assert abs(res["total_psnr"] - want_total) < 1e-9


def test_validation_mixed_frame_counts():
    """Metric averaging must divide by the TOTAL contributing frame count,
    not cnt * the last item's count (reference parity:
    twoImage_event_recurrent_model.py:499-542 averages per frame)."""
    from refid_tpu.tasks.recurrent import (
        TwoImageEventRecurrentRestorationTask)

    task = TwoImageEventRecurrentRestorationTask.__new__(
        TwoImageEventRecurrentRestorationTask)
    task.opt = {"val": {
        "metrics_deblur": {"psnr": {"type": "calculate_psnr"}},
        "metrics_interpo": {"psnr": {"type": "calculate_psnr"}}},
        "path": {}}

    m, n = 2, 1
    rng = np.random.RandomState(0)
    # item 0: t_out = 2m+n = 5; item 1: t_out = 2m+2n = 6 (pretend mixed n)
    items = []
    for t_out in (5, 6):
        gt = rng.rand(t_out, 8, 8, 3).astype(np.float32)
        pred = np.clip(gt + 0.1 * rng.randn(*gt.shape).astype(np.float32),
                       0, 1)
        items.append((pred, gt))

    preds = iter([p for p, _ in items])
    task.predict = lambda lq, vox: next(preds)[None]

    loader = [{"lq": np.zeros((1, 8, 8, 3), np.float32),
               "voxel": np.zeros((1, 5, 8, 8, 2), np.float32),
               "gt": gt[None], "seq": ["s"], "origin_index": ["0"]}
              for _, gt in items]
    res = task.validate(loader, {"num_end_interpolation": m,
                                 "num_inter_interpolation": n})

    from refid_tpu.eval.metrics import calculate_psnr as psnr_fn
    from refid_tpu.data.img_util import tensor2img
    deblur_vals, interpo_vals = [], []
    for pred, gt in items:
        for f in range(pred.shape[0]):
            v = psnr_fn(tensor2img(pred[f]), tensor2img(gt[f]))
            (interpo_vals if m <= f < m + n else deblur_vals).append(v)
    assert abs(res["deblur_psnr"] - np.mean(deblur_vals)) < 1e-9
    assert abs(res["interpo_psnr"] - np.mean(interpo_vals)) < 1e-9


def test_tiled_inference_matches_direct_on_identity():
    """grids tiling with an identity 'network' must reproduce the input."""
    from refid_tpu.eval.tiling import tiled_apply

    rng = np.random.RandomState(0)
    lq = rng.rand(40, 56, 3).astype(np.float32)
    vox = rng.rand(4, 40, 56, 2).astype(np.float32)

    def fake_net(lq_tiles, vox_tiles):
        # (b,h,w,3), (b,t,h,w,2) -> (b,t,h,w,3): broadcast lq over t
        return np.repeat(lq_tiles[:, None], vox_tiles.shape[1], axis=1)

    out = tiled_apply(fake_net, lq, vox, crop_size=16, max_minibatch=3)
    assert out.shape == (4, 40, 56, 3)
    for t in range(4):
        np.testing.assert_allclose(out[t], lq, atol=1e-6)


def test_tiled_inference_single_image_fn():
    """A 4-D (time-less) network fn must get a t=1 axis, NOT have its
    tile height misread as a temporal axis (round-5 review finding: the
    misread broadcast every tile crop x in assemble_tiles — values came
    out right, host work/memory inflated by crop x)."""
    from refid_tpu.eval.tiling import tiled_apply

    rng = np.random.RandomState(2)
    lq = rng.rand(40, 56, 3).astype(np.float32)
    vox = rng.rand(40, 56, 6).astype(np.float32)

    def fake_net(lq_tiles, vox_tiles):
        return lq_tiles + vox_tiles[..., :3]  # (b, crop, crop, 3)

    out = tiled_apply(fake_net, lq, vox, crop_size=16, max_minibatch=3)
    assert out.shape == (1, 40, 56, 3)  # t=1, not t=crop
    np.testing.assert_allclose(out[0], lq + vox[..., :3], atol=1e-6)
    # out_frames, when given, is validated against the inferred t
    out2 = tiled_apply(fake_net, lq, vox, crop_size=16, out_frames=1)
    np.testing.assert_allclose(out2, out, atol=0)


def test_tiled_inference_with_transpose_ensemble():
    from refid_tpu.eval.tiling import tiled_apply

    rng = np.random.RandomState(1)
    lq = rng.rand(32, 32, 3).astype(np.float32)
    vox = rng.rand(2, 32, 32, 2).astype(np.float32)

    def fake_net(lq_tiles, vox_tiles):
        return np.repeat(lq_tiles[:, None], vox_tiles.shape[1], axis=1)

    out = tiled_apply(fake_net, lq, vox, crop_size=16, max_minibatch=4,
                      trans_num=8)
    for t in range(2):
        np.testing.assert_allclose(out[t], lq, atol=1e-5)


def test_tile_plan_covers_and_is_flush():
    from refid_tpu.eval.tiling import tile_plan
    plan = tile_plan(40, 56, 16)
    cov = np.zeros((40, 56), bool)
    for (i, j) in plan:
        assert 0 <= i <= 24 and 0 <= j <= 40
        cov[i:i + 16, j:j + 16] = True
    assert cov.all()
    assert any(i == 24 for i, _ in plan) and any(j == 40 for _, j in plan)


def test_blur_vfi_serving_pipeline():
    """Single-jit device pipeline == host pipeline (voxelize + pack + net)."""
    import jax
    import jax.numpy as jnp
    from refid_tpu.pipeline import BlurVFIPipeline
    from refid_tpu.models import FinalBidirectionAttenfusion, RefidConfig
    from refid_tpu.events import events_to_voxel_grid

    m, n = 2, 1
    cfg = RefidConfig(img_chn=3 + (m - 1) + 3 + (m - 1), ev_chn=2,
                      num_encoders=2, base_num_channels=4,
                      num_residual_blocks=1)
    model = FinalBidirectionAttenfusion(cfg)
    rng = np.random.RandomState(0)
    h, w = 16, 24
    b0 = rng.rand(h, w, 3).astype(np.float32)
    b1 = rng.rand(h, w, 3).astype(np.float32)
    ne = 500
    ev = np.stack([np.sort(rng.rand(ne)), rng.randint(0, w, ne),
                   rng.randint(0, h, ne), rng.choice([-1., 1.], ne)],
                  1).astype(np.float32)

    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, h, w, cfg.img_chn)),
                        jnp.zeros((1, 2 * m + n, h, w, 2)))
    pipe = BlurVFIPipeline(params, cfg, m=m, n=n)
    out = np.asarray(pipe(b0, b1, ev))
    assert out.shape == (2 * m + n, h, w, 3)

    # host-side oracle: numpy voxelize + pack, then the bare model
    vox = events_to_voxel_grid(ev, 2 * m + n + 1, w, h, "HWC")
    lq = np.concatenate([b0, vox[..., 1:m], b1, vox[..., m + 2 + n:]],
                        axis=-1)[None]
    pairs = np.stack([vox[..., i:i + 2] for i in range(2 * m + n)], 0)[None]
    want = np.asarray(model.apply(params, jnp.asarray(lq),
                                  jnp.asarray(pairs)))[0]
    np.testing.assert_allclose(out, want, atol=2e-4)


def test_sharp_vfi_serving_pipeline():
    """SharpVFIPipeline == host voxelize + zero-pad pack + bare model
    (the sharp-task serving entry; packing per
    image_sharp_npy_dataset.py:203-214)."""
    import jax
    import jax.numpy as jnp
    from refid_tpu.pipeline import SharpVFIPipeline
    from refid_tpu.models import FinalBidirectionAttenfusion, RefidConfig
    from refid_tpu.events import events_to_voxel_grid

    n = 3
    cfg = RefidConfig(img_chn=26, ev_chn=2, num_encoders=2,
                      base_num_channels=4, num_residual_blocks=1)
    model = FinalBidirectionAttenfusion(cfg)
    rng = np.random.RandomState(1)
    h, w = 16, 24
    s0 = rng.rand(h, w, 3).astype(np.float32)
    s1 = rng.rand(h, w, 3).astype(np.float32)
    ne = 400
    ev = np.stack([np.sort(rng.rand(ne)), rng.randint(0, w, ne),
                   rng.randint(0, h, ne), rng.choice([-1., 1.], ne)],
                  1).astype(np.float32)

    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, h, w, cfg.img_chn)),
                        jnp.zeros((1, n, h, w, 2)))
    pipe = SharpVFIPipeline(params, cfg, n=n)
    out = np.asarray(pipe(s0, s1, ev))
    assert out.shape == (n, h, w, 3)

    vox = events_to_voxel_grid(ev, n + 1, w, h, "HWC")
    zeros = np.zeros((h, w, 10), np.float32)
    lq = np.concatenate([s0, zeros, s1, zeros], axis=-1)[None]
    pairs = np.stack([vox[..., i:i + 2] for i in range(n)], 0)[None]
    want = np.asarray(model.apply(params, jnp.asarray(lq),
                                  jnp.asarray(pairs)))[0]
    np.testing.assert_allclose(out, want, atol=2e-4)


@pytest.mark.slow
def test_test_cli_end_to_end(env, tmp_path):
    """cli.test over a saved orbax checkpoint reproduces training-time val."""
    data_root, exp_root = env
    cfg_path = _write_cfg(tmp_path, data_root, name="e2e_testcli")
    from refid_tpu.cli.train import main as train_main
    task = train_main(["-opt", cfg_path, "--root", exp_root])

    import yaml
    cfg = yaml.safe_load(open(cfg_path))
    cfg["name"] = "e2e_testcli_eval"
    cfg["model_type"] = "TestTwoImageEventRecurrentRestorationModel"
    cfg["datasets"] = {"test_1": cfg["datasets"]["val"]}
    cfg["path"]["pretrain_network_g"] = os.path.join(
        exp_root, "experiments", "e2e_testcli", "models")
    p = tmp_path / "test_cfg.yml"
    p.write_text(yaml.safe_dump(cfg))

    from refid_tpu.cli.test import main as test_main
    results = test_main(["-opt", str(p), "--root", exp_root,
                         "--max-items", "2"])
    (name, metrics), = results.items()
    assert "total_psnr" in metrics and np.isfinite(metrics["total_psnr"])


@pytest.mark.slow
def test_ema_training_and_eval(env, tmp_path):
    """train.ema_decay populates EMA params; predict(use_ema=True) differs."""
    data_root, exp_root = env
    import yaml
    cfg = yaml.safe_load(open(_write_cfg(tmp_path, data_root,
                                         name="e2e_ema")))
    cfg["train"]["ema_decay"] = 0.9
    p = tmp_path / "ema_cfg.yml"
    p.write_text(yaml.safe_dump(cfg))
    from refid_tpu.cli.train import main
    task = main(["-opt", str(p), "--root", exp_root])
    assert task.state.ema_params is not None
    import jax
    lq = np.zeros((1, 16, 16, 8), np.float32)
    vox = np.zeros((1, 5, 16, 16, 2), np.float32)
    a = np.asarray(task.predict(lq, vox, use_ema=False))
    b = np.asarray(task.predict(lq, vox, use_ema=True))
    assert np.abs(a - b).max() > 1e-7  # ema lags the live params

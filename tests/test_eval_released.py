"""scripts/eval_released.py smoke test: reference .pth -> convert ->
eval -> BASELINE.md-format table, end to end on synthetic data."""

import importlib.util
import os

import numpy as np
import pytest
import yaml

from tests.reference_loader import reference_available
from tests.synthetic_data import make_gopro_tree
from tests.test_e2e import _write_cfg

pytestmark = pytest.mark.skipif(not reference_available(),
                                reason="reference tree not mounted")


def _load_script():
    path = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                        "scripts", "eval_released.py")
    spec = importlib.util.spec_from_file_location("eval_released", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_eval_released_smoke(tmp_path, capsys):
    import torch
    from tests.reference_loader import load_reference_archs

    data_root = str(tmp_path / "data")
    make_gopro_tree(data_root, split="test", m=2, n=1,
                    videos=("VID_A", "VID_B"))

    # a "released" checkpoint: the reference torch arch at the e2e config
    # (img_chn = 2*(3 + m-1) = 8 for m=2 with deblur-voxel packing)
    torch.manual_seed(0)
    arch = load_reference_archs()
    tmodel = arch.FinalBidirectionAttenfusion(
        img_chn=8, ev_chn=2, out_chn=3, num_encoders=2,
        base_num_channels=4, num_residual_blocks=1, num_block=1,
        use_first_dcn=False)
    pth = str(tmp_path / "net_g_200000.pth")
    torch.save({"params": tmodel.state_dict()}, pth)

    # test-mode config derived from the e2e one
    cfg = yaml.safe_load(open(_write_cfg(tmp_path, data_root,
                                         name="eval_released_smoke")))
    cfg["model_type"] = "TestTwoImageEventRecurrentRestorationModel"
    cfg["datasets"] = {"test_1": cfg["datasets"]["val"]}
    del cfg["train"]
    cfg["val"]["metrics_deblur"]["ssim"] = {
        "type": "calculate_ssim", "crop_border": 0, "test_y_channel": False}
    cfg["val"]["metrics_interpo"]["ssim"] = {
        "type": "calculate_ssim", "crop_border": 0, "test_y_channel": False}
    cfg_path = str(tmp_path / "test_cfg.yml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)

    mod = _load_script()
    results = mod.main(["--pth", pth, "--config", cfg_path,
                        "--root", str(tmp_path / "results"),
                        "--max-items", "1",
                        "--json-out", str(tmp_path / "res.json")])
    (name, metrics), = results.items()
    assert np.isfinite(metrics["total_psnr"])
    assert np.isfinite(metrics["total_ssim"])

    out = capsys.readouterr().out
    assert "| Metric | Value | Hardware | Source |" in out
    assert "PSNR / SSIM" in out and "dB" in out
    assert os.path.exists(tmp_path / "res.json")

    # --int8: the same command evaluates the quantized serving path; the
    # dynamic-int8 PSNR must track the exact eval within quant noise
    res8 = mod.main(["--pth", pth, "--config", cfg_path,
                     "--root", str(tmp_path / "results_int8"),
                     "--max-items", "1", "--int8"])
    (_, m8), = res8.items()
    assert np.isfinite(m8["total_psnr"])
    assert abs(m8["total_psnr"] - metrics["total_psnr"]) < 1.0, (
        m8["total_psnr"], metrics["total_psnr"])


def test_eval_released_single_image_tiled(tmp_path, capsys):
    """The OTHER released-checkpoint lineage: a SingleMultiConnectEVHINet
    .pth evaluated through the single-image task with TILED (crop_size)
    inference — the full fake-checkpoint round trip of VERDICT round-3
    item 6 (convert -> tiled eval -> table) for the non-recurrent family."""
    import torch
    from tests.test_evhinet_parity import _load_ref_evhinet

    data_root = str(tmp_path / "data")
    make_gopro_tree(data_root, split="test", m=2, n=1, videos=("VID_A",))

    torch.manual_seed(1)
    mod_t = _load_ref_evhinet()
    tnet = mod_t.SingleMultiConnectEVHINet(in_chn=3, ev_chn=6, wf=8,
                                           depth=3, fac_place=2)
    pth = str(tmp_path / "net_g_EVHINet.pth")
    torch.save({"params": tnet.state_dict()}, pth)

    cfg = {
        "name": "eval_released_single_tiled",
        "model_type": "TestImageEventRestorationModel",
        "scale": 1, "num_gpu": 1, "manual_seed": 1,
        "datasets": {"test_1": {
            "name": "test_si", "type": "GoProSingleImageEventDataset",
            "dataroot": data_root, "num_bins": 6, "norm_voxel": True,
            "io_backend": {"type": "disk"},
        }},
        "network_g": {"type": "SingleMultiConnectEVHINet", "in_chn": 3,
                      "ev_chn": 6, "wf": 8, "depth": 3, "fac_place": 2},
        "path": {"pretrain_network_g": pth, "strict_load_g": True,
                 "resume_state": None},
        "val": {"save_img": False, "crop_size": 16, "max_minibatch": 2,
                "metrics": {"psnr": {"type": "calculate_psnr",
                                     "crop_border": 0,
                                     "test_y_channel": False}}},
    }
    cfg_path = str(tmp_path / "si_cfg.yml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)

    mod = _load_script()
    results = mod.main(["--pth", pth, "--config", cfg_path,
                        "--root", str(tmp_path / "results"),
                        "--max-items", "2"])
    (_, metrics), = results.items()
    assert np.isfinite(metrics["psnr"])

    out = capsys.readouterr().out
    assert "| Metric | Value | Hardware | Source |" in out

    # the tiled eval must agree with the untiled one on the converted
    # weights (the net is fully convolutional; the adaptive-stride plan
    # averages overlaps, so equality is to metric noise, not bitwise)
    cfg["val"]["crop_size"] = None
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)
    full = mod.main(["--pth", pth, "--config", cfg_path,
                     "--root", str(tmp_path / "results_full"),
                     "--max-items", "2"])
    (_, mfull), = full.items()
    assert abs(metrics["psnr"] - mfull["psnr"]) < 3.0, (metrics, mfull)


def test_eval_released_dataroot_override(tmp_path):
    """--dataroot must rewrite every dataroot* key in every dataset."""
    mod = _load_script()
    args = mod.parse_args(["--pth", "x.pth", "--config", "c.yml",
                           "--dataroot", "/data/GoPro"])
    assert args.dataroot == "/data/GoPro"
    assert args.max_items is None

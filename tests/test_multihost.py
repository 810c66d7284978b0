"""Multi-host execution for real: two OS processes, jax.distributed
coordination, process-sharded sampler, GSPMD gradient allreduce across the
global mesh — the verified replacement for the reference's
torch.distributed.launch + DDP + EnlargedSampler stack
(basicsr/utils/dist_util.py:11-63, basicsr/data/data_sampler.py).

The 2-process run (2 virtual CPU devices per process, 4 global) must
produce the SAME final parameters as a single-process 4-device run of the
identical config: the interleaved sampler sharding makes each global batch
equal as a set, and the loss/grad means are permutation-invariant.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest
import yaml

from tests.synthetic_data import make_gopro_tree

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_sampler_interleaved_shards_disjoint_and_complete():
    """Process shards are disjoint, cover the epoch permutation, and use
    the reference's interleaved subsampling (data_sampler.py:42)."""
    from refid_tpu.data.loader import EnlargedIndexSampler
    n, ratio = 5, 4
    shards = [EnlargedIndexSampler(n, ratio, shuffle=True, num_shards=2,
                                   shard_index=i, seed=7).epoch_indices(3)
              for i in range(2)]
    full = EnlargedIndexSampler(n, ratio, shuffle=True, num_shards=1,
                                shard_index=0, seed=7).epoch_indices(3)
    assert len(shards[0]) == len(shards[1]) == len(full) // 2
    # interleave property: shard k holds full[k::2]
    np.testing.assert_array_equal(shards[0], full[0::2])
    np.testing.assert_array_equal(shards[1], full[1::2])


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _write_cfg(tmp_path, root, name, total_iter=4):
    m, n = 2, 1
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
                "io_backend": {"type": "disk"},
                # determinism across process topologies: full frames, no
                # random crop/flip (augmentation RNG is per-thread)
                "gt_size": None, "use_hflip": False, "use_rot": False,
                "use_shuffle": True, "num_worker_per_gpu": 1,
                "batch_size_per_gpu": 1, "dataset_enlarge_ratio": 4,
                "video_list": ["VID_A", "VID_B"],
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
            "total_iter": total_iter, "warmup_iter": -1,
            "pixel_opt": {"type": "CharbonnierLoss", "loss_weight": 1.0,
                          "reduction": "mean"},
        },
        "logger": {"print_freq": 1, "save_checkpoint_freq": 0,
                   "use_tb_logger": False},
    }
    path = tmp_path / f"{name}.yml"
    path.write_text(yaml.safe_dump(cfg))
    return str(path)


_DRIVER = """
import sys, os, json
import numpy as np
from refid_tpu.cli.train import main

out_path = sys.argv[1]
task = main(sys.argv[2:])
import jax
if jax.process_index() == 0:
    params = jax.device_get(task.state.params)
    leaves = jax.tree_util.tree_leaves(params)
    flat = np.concatenate([np.asarray(a, np.float64).ravel()
                           for a in leaves])
    np.save(out_path, flat)
    with open(out_path + ".loss.json", "w") as f:
        json.dump({"n_leaves": len(leaves)}, f)
"""


def _run(cfg_path, exp_root, out, n_local_devices, dist_args=(),
         timeout=600):
    env = dict(os.environ)
    env.update({
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": ("--xla_force_host_platform_device_count="
                      f"{n_local_devices}"),
        "PYTHONPATH": REPO + os.pathsep + env.get("PYTHONPATH", ""),
        "JAX_ENABLE_COMPILATION_CACHE": "false",
    })
    cmd = [sys.executable, "-c", _DRIVER, out, "-opt", cfg_path,
           "--root", exp_root] + list(dist_args)
    return subprocess.Popen(cmd, env=env, cwd=REPO,
                            stdout=subprocess.PIPE,
                            stderr=subprocess.STDOUT)


@pytest.mark.slow
def test_two_process_training_matches_single_process(tmp_path):
    data_root = str(tmp_path / "data")
    make_gopro_tree(data_root, m=2, n=1, videos=("VID_A", "VID_B"))

    cfg2 = _write_cfg(tmp_path, data_root, "mh_two")
    cfg1 = _write_cfg(tmp_path, data_root, "mh_one")
    port = _free_port()

    # 2 processes x 2 local devices (4 global)
    procs = []
    for pid in range(2):
        out = str(tmp_path / f"params_p{pid}.npy")
        procs.append((out, _run(
            cfg2, str(tmp_path / "exp2"), out, 2,
            ["--coordinator", f"localhost:{port}",
             "--num-processes", "2", "--process-id", str(pid)])))
    logs = []
    for out, p in procs:
        stdout, _ = p.communicate(timeout=900)
        logs.append(stdout.decode(errors="replace"))
        assert p.returncode == 0, f"2-proc rank failed:\n{logs[-1][-4000:]}"
    assert os.path.exists(procs[0][0]), logs[0][-2000:]

    # single process x 4 local devices
    out1 = str(tmp_path / "params_single.npy")
    p = _run(cfg1, str(tmp_path / "exp1"), out1, 4)
    stdout, _ = p.communicate(timeout=900)
    assert p.returncode == 0, stdout.decode(errors="replace")[-4000:]

    a = np.load(procs[0][0])
    b = np.load(out1)
    assert a.shape == b.shape
    # same global batches (as sets) => same mean grads up to fp reduction
    # order across the different mesh topologies
    np.testing.assert_allclose(a, b, atol=5e-6, rtol=1e-5)

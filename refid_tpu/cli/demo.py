"""Single-image demo CLI — ``python -m refid_tpu.cli.demo -opt <yml>``.

Replaces basicsr/demo.py, FIXING its shipped bug: the reference calls
``single_image_inference(img, output_path)`` without ever building the event
voxel the method requires (demo.py:29 vs
image_event_restoration_model.py:347), so it crashes.  Here the demo builds
the voxel from the ``input_events`` npz (or a zero grid if absent).
"""

from __future__ import annotations

import argparse

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("-opt", required=True)
    p.add_argument("--root", default=None)
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)

    from refid_tpu.core.config import parse_options
    from refid_tpu.core.logging_util import get_root_logger
    from refid_tpu.data.img_util import imread
    from refid_tpu.data.datasets.base import load_event_quad
    from refid_tpu.events import events_to_voxel_grid, voxel_norm_np
    from refid_tpu.tasks import build_task

    opt = parse_options(args.opt, is_train=False, root=args.root)
    logger = get_root_logger()

    img_path = opt["img_path"]["input_img"]
    output_path = opt["img_path"]["output_img"]
    event_path = opt["img_path"].get("input_events")
    num_bins = opt.get("network_g", {}).get("num_bins", 6)

    img = imread(img_path)
    h, w = img.shape[:2]
    if event_path:
        quad = load_event_quad(event_path)
        voxel = events_to_voxel_grid(quad, num_bins, w, h, "HWC")
        voxel = voxel_norm_np(voxel)
    else:
        logger.warning("no input_events given; using a zero voxel grid")
        voxel = np.zeros((h, w, num_bins), np.float32)

    task = build_task(opt)
    pretrain = opt["path"].get("pretrain_network_g")
    assert pretrain, "path.pretrain_network_g required for demo"
    task.load_pretrained(pretrain)
    task.single_image_inference(img, voxel, output_path)
    logger.info(f"wrote {output_path}")


if __name__ == "__main__":
    main()

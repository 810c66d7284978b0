"""Single-image deblur datasets: 1 blurred frame + event window -> 1 sharp
frame (parity: basicsr/data/Single_image_npy_dataset.py,
Single_image_npy_Ruisi_dataset.py).

Unlike the recurrent datasets, voxel_norm IS applied here (the reference
calls it directly on the sample, Single_image_npy_dataset.py:187)."""

from __future__ import annotations

import os
import random
from typing import List

import numpy as np

from refid_tpu.core.registry import DATASETS
from refid_tpu.events import events_to_voxel_grid, voxel_norm_np
from refid_tpu.data.img_util import imread
from refid_tpu.data.transforms import augment, triple_random_crop
from refid_tpu.data.datasets.base import load_event_quad, recursive_glob


class _SingleImageEventDataset:
    layout = "gopro"

    def __init__(self, opt: dict):
        self.opt = opt
        self.dataroot = str(opt["dataroot"])
        self.num_bins = opt["num_bins"]
        self.split = "train" if opt["phase"] == "train" else "test"
        self.scale = opt.get("scale", 1)
        self.gt_size = opt.get("gt_size")
        self.norm_voxel = opt.get("norm_voxel", True)
        self.rng = random.Random(opt.get("seed"))
        # events are taken from a +-5-frame index window around the blur
        # frame (Single_image_npy_dataset.py:91-108)
        self.window = opt.get("event_window", (-5, 5))

        videos = opt.get("video_list") or sorted(
            os.listdir(os.path.join(self.dataroot, self.split)))
        self.blur_paths: List[str] = []
        for video in videos:
            bdir = os.path.join(self.dataroot, self.split, video, "blur")
            for f in sorted(recursive_glob(bdir, ".png")):
                self.blur_paths.append(os.path.join(bdir, f))
        self.blur_paths.sort()

        self.sharp_paths = [p.replace("blur/", "gt/") for p in self.blur_paths]
        self.event_seqs: List[List[str]] = []
        for blur_path in self.blur_paths:
            idx = int(os.path.basename(blur_path).split(".")[0])
            video_dir = os.path.dirname(os.path.dirname(blur_path))
            video = os.path.basename(video_dir)
            if self.layout == "highrev":
                ev_dir = os.path.join(video_dir, "event")
            else:
                ev_dir = os.path.join(self.dataroot, self.split + "_event",
                                      video)
            self.event_seqs.append([
                os.path.join(ev_dir, "%.6d.npz" % i)
                for i in range(idx + self.window[0], idx + self.window[1])])

    def __len__(self):
        return len(self.blur_paths)

    def __getitem__(self, index: int) -> dict:
        img_lq = imread(self.blur_paths[index])
        img_gt = imread(self.sharp_paths[index])
        h, w = img_lq.shape[:2]

        quads = [load_event_quad(p, self.layout == "highrev")
                 for p in self.event_seqs[index] if os.path.exists(p)]
        all_quad = (np.concatenate(quads, axis=0) if quads
                    else np.zeros((0, 4), np.float32))
        voxel = events_to_voxel_grid(all_quad, self.num_bins, w, h, "HWC")

        if self.gt_size is not None:
            img_gt, img_lq, voxel = triple_random_crop(
                img_gt, img_lq, voxel, self.gt_size, self.scale, self.rng)
        img_gt, img_lq, voxel = augment(
            [img_gt, img_lq, voxel], self.opt.get("use_hflip", False),
            self.opt.get("use_rot", False), self.rng)
        voxel = voxel_norm_np(voxel)  # applied unconditionally (:187)

        blur_path = self.blur_paths[index]
        seq = blur_path.split(f"{self.split}/")[1].split("/")[0]
        origin_index = os.path.basename(blur_path).split(".")[0]
        return {"lq": img_lq.astype(np.float32),
                "gt": img_gt.astype(np.float32),
                "voxel": voxel.astype(np.float32),
                "seq": seq, "origin_index": origin_index}


@DATASETS.register("GoProSingleImageEventDataset")
class GoProSingleImageEventDataset(_SingleImageEventDataset):
    layout = "gopro"


@DATASETS.register("RuisiSingleImageEventDataset")
class RuisiSingleImageEventDataset(_SingleImageEventDataset):
    layout = "highrev"

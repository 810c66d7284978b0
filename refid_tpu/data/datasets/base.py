"""Shared machinery for event-recurrent datasets.

One parameterized base collapses the reference's copy-paste dataset files
(image_npy_dataset.py, image_npy_Ruisi_dataset.py, image_sharp_npy_dataset.py,
image_sharp_Ruisi_dataset.py, Deblur_image_npy_dataset.py — ~3.4k LoC of
near-duplicates) into hooks:

  * layout   — 'gopro': events at ``<split>_event/<video>/*.npz`` with flat
               field arrays; 'highrev': events at ``<split>/<video>/event/``
               with (N,1) fields AND swapped x/y (the dataset export bug the
               reference corrects at image_npy_Ruisi_dataset.py:161-166).
  * kind     — 'blur'   : 2 blurred inputs -> 2m+n gts, bins 2m+n+1
               (image_npy_dataset.py:44-96);
               'sharp'  : 2 sharp inputs -> n middles, bins n+1
               (image_sharp_npy_dataset.py:44-91);
               'deblur1': 1 blurred input -> m gts, bins m+1
               (Deblur_image_npy_dataset.py:44-95).
  * bidir    — additionally voxelize the time-reversed stream and concat on
               the t axis (image_npy_dataset.py:399-482).

Samples are HWC/NHWC numpy:
  lq    (num_in, h, w, 3)  or packed (h, w, 26) with deblur voxels
  gt    (T, h, w, 3)
  voxel (t, h, w, 2)       adjacent-bin pairs (2t with bidir)

Parity quirk preserved: ``norm_voxel`` is accepted but NOT applied in
recurrent pipelines — the reference's normalization loop rebinds a local
without writing back (image_npy_dataset.py:206-208), so released checkpoints
were trained on UNNORMALIZED voxels.  Set ``apply_voxel_norm: true`` to get
actual normalization (a fix, not parity).
"""

from __future__ import annotations

import os
import random
from typing import List, Optional

import numpy as np

from refid_tpu.events import events_to_voxel_grid, event_reverse, voxel_norm_np
from refid_tpu.data.img_util import imread
from refid_tpu.data.transforms import augment, triple_random_crop

GOPRO_TRAIN_VIDEOS = [
    "GOPR0372_07_00", "GOPR0374_11_01", "GOPR0378_13_00", "GOPR0384_11_01",
    "GOPR0384_11_04", "GOPR0477_11_00", "GOPR0868_11_02", "GOPR0884_11_00",
    "GOPR0372_07_01", "GOPR0374_11_02", "GOPR0379_11_00", "GOPR0384_11_02",
    "GOPR0385_11_00", "GOPR0857_11_00", "GOPR0871_11_01", "GOPR0374_11_00",
    "GOPR0374_11_03", "GOPR0380_11_00", "GOPR0384_11_03", "GOPR0386_11_00",
    "GOPR0868_11_01", "GOPR0881_11_00"]
GOPRO_TEST_VIDEOS = [
    "GOPR0384_11_00", "GOPR0385_11_01", "GOPR0410_11_00", "GOPR0862_11_00",
    "GOPR0869_11_00", "GOPR0881_11_01", "GOPR0384_11_05", "GOPR0396_11_00",
    "GOPR0854_11_00", "GOPR0868_11_00", "GOPR0871_11_00"]


def recursive_glob(rootdir: str, suffix: str) -> List[str]:
    """Basename list of files under rootdir ending in suffix (sorted by the
    caller, matching data_util.py:338-352 which returns names relative to
    rootdir)."""
    out = []
    if not os.path.isdir(rootdir):
        return out
    for dirpath, _, files in os.walk(rootdir):
        for f in files:
            if f.endswith(suffix):
                out.append(os.path.join(os.path.relpath(dirpath, rootdir), f)
                           if dirpath != rootdir else f)
    return out


def load_event_quad(path: str, swap_xy: bool = False) -> np.ndarray:
    """Load one .npz event window as an (N, 4) float32 [t, x, y, p] array."""
    d = np.load(path)

    def col(key):
        return np.asarray(d[key], np.float32).reshape(-1, 1)

    t, x, y, p = col("timestamp"), col("x"), col("y"), col("polarity")
    if swap_xy:
        x, y = y, x
    return np.concatenate([t, x, y, p], axis=1)


class RecurrentEventDataset:
    """Blur-VFI / sharp-VFI / deblur recurrent dataset over a GoPro-style
    directory tree."""

    layout = "gopro"     # or 'highrev'
    kind = "blur"        # 'blur' | 'sharp' | 'deblur1'
    bidir = False

    def __init__(self, opt: dict):
        self.opt = opt
        self.dataroot = str(opt["dataroot"])
        self.m = opt["num_end_interpolation"]
        self.n = opt["num_inter_interpolation"]
        self.split = "train" if opt["phase"] == "train" else "test"
        self.norm_voxel = opt.get("norm_voxel", True)  # accepted; see module doc
        self.apply_voxel_norm = opt.get("apply_voxel_norm", False)
        self.one_voxel_flg = opt.get("one_voxel_flag", True)
        self.return_deblur_voxel = (opt.get("return_deblur_voxel", False)
                                    and self.one_voxel_flg)
        self.random_reverse = opt.get("random_reverse", False)
        self.scale = opt.get("scale", 1)
        self.gt_size = opt.get("gt_size")
        self.rng = random.Random(opt.get("seed"))

        if self.kind == "sharp":
            assert self.m == 1, "sharp interpolation requires m == 1"
            self.num_bins = self.n + 1
        elif self.kind == "deblur1":
            self.num_bins = self.m + 1
        else:
            self.num_bins = 2 * self.m + self.n + 1

        self.lq_paths: List[List[str]] = []
        self.gt_paths: List[List[str]] = []
        self.event_paths: List[List[str]] = []
        for video in self._video_list():
            self._index_video(video)
        assert len(self.lq_paths) == len(self.gt_paths) == len(self.event_paths)

    # --- layout hooks ------------------------------------------------------

    def _video_list(self) -> List[str]:
        videos = self.opt.get("video_list")
        if videos:
            return list(videos)
        if self.layout == "gopro":
            return (GOPRO_TRAIN_VIDEOS if self.split == "train"
                    else GOPRO_TEST_VIDEOS)
        return sorted(os.listdir(os.path.join(self.dataroot, self.split)))

    def _event_dir(self, video: str) -> str:
        if self.layout == "highrev":
            return os.path.join(self.dataroot, self.split, video, "event")
        return os.path.join(self.dataroot, self.split + "_event", video)

    @property
    def _swap_xy(self) -> bool:
        return self.layout == "highrev"

    # --- index construction (window math identical to the reference) -------

    def _index_video(self, video: str):
        img_dir = os.path.join(self.dataroot, self.split, video)
        ev_dir = self._event_dir(video)
        gt_frames = sorted(recursive_glob(os.path.join(img_dir, "gt"), ".png"))
        event_frames = sorted(recursive_glob(ev_dir, ".npz"))
        m, n = self.m, self.n

        if self.kind == "sharp":
            set_len = n + 2
            n_sets = (len(gt_frames) - set_len) // (n + 1) + 1
            for i in range(max(n_sets, 0)):
                frames = gt_frames[(n + 1) * i:(n + 1) * i + set_len]
                evs = event_frames[(n + 1) * i:(n + 1) * i + set_len - 1]
                frames = [os.path.join(img_dir, "gt", f) for f in frames]
                self.lq_paths.append([frames[0], frames[-1]])
                self.gt_paths.append(frames[1:-1])
                self.event_paths.append([os.path.join(ev_dir, f) for f in evs])
            return

        blur_frames = sorted(recursive_glob(os.path.join(img_dir, "blur"),
                                            ".png"))
        n_sets = len(blur_frames) - 1
        for i in range(1, n_sets):
            if self.kind == "deblur1":
                blur = blur_frames[i:i + 1]
                gts = gt_frames[i * (m + n): i * (m + n) + m]
                evs = event_frames[i * (m + n) - 1: i * (m + n) + m]
            else:  # blur-VFI pair
                blur = blur_frames[i:i + 2]
                gts = gt_frames[i * (m + n): (i + 1) * (m + n) + m]
                evs = event_frames[i * (m + n) - 1: (i + 1) * (m + n) + m]
            self.lq_paths.append(
                [os.path.join(img_dir, "blur", f) for f in blur])
            self.gt_paths.append([os.path.join(img_dir, "gt", f) for f in gts])
            self.event_paths.append([os.path.join(ev_dir, f) for f in evs])

    # --- sample assembly ----------------------------------------------------

    def __len__(self):
        return len(self.lq_paths)

    def _expected_gts(self):
        return {"blur": 2 * self.m + self.n, "sharp": self.n,
                "deblur1": self.m}[self.kind]

    def __getitem__(self, index: int) -> dict:
        image_paths = list(self.lq_paths[index])
        gt_paths = list(self.gt_paths[index])
        event_paths = self.event_paths[index]
        assert len(gt_paths) == self._expected_gts(), (
            f"item {index}: {len(gt_paths)} gts != {self._expected_gts()}")
        assert len(event_paths) == self.num_bins, (
            f"item {index}: {len(event_paths)} events != {self.num_bins}")

        if self.random_reverse and self.rng.random() < 0.5:
            image_paths.reverse()
            gt_paths.reverse()

        img_lqs = [imread(p) for p in image_paths]
        img_gts = [imread(p) for p in gt_paths]
        h_lq, w_lq = img_lqs[0].shape[:2]

        quads = [load_event_quad(p, self._swap_xy) for p in event_paths]
        voxels = []
        if self.one_voxel_flg:
            all_quad = np.concatenate(quads, axis=0)
            voxels.append(events_to_voxel_grid(
                all_quad, self.num_bins, w_lq, h_lq, "HWC"))
            if self.bidir:
                voxels.append(events_to_voxel_grid(
                    event_reverse(all_quad), self.num_bins, w_lq, h_lq, "HWC"))
        else:
            for i in range(1, len(quads)):
                two = np.concatenate([quads[i - 1], quads[i]], axis=0)
                voxels.append(events_to_voxel_grid(two, 2, w_lq, h_lq, "HWC"))

        if self.gt_size is not None:
            img_gts, img_lqs, voxels = triple_random_crop(
                img_gts, img_lqs, voxels, self.gt_size, self.scale, self.rng)

        group = list(img_lqs) + list(img_gts) + list(voxels)
        group = augment(group, self.opt.get("use_hflip", False),
                        self.opt.get("use_rot", False), self.rng)
        n_lq, n_gt = len(img_lqs), len(img_gts)
        img_lqs = group[:n_lq]
        img_gts = group[n_lq:n_lq + n_gt]
        voxels = group[n_lq + n_gt:]

        if self.apply_voxel_norm:
            voxels = [voxel_norm_np(v) for v in voxels]

        lq = np.stack(img_lqs, axis=0)                      # (num_in,h,w,3)
        gt = np.stack(img_gts, axis=0)                      # (T,h,w,3)

        if self.return_deblur_voxel:
            lq = self._pack_deblur_voxel(img_lqs, voxels[0])

        if self.one_voxel_flg:
            vox_parts = []
            for v in voxels if self.bidir else voxels[:1]:
                # (h,w,bins) -> (t,h,w,2) adjacent-bin pairs
                pairs = np.stack([v[..., i:i + 2]
                                  for i in range(v.shape[-1] - 1)], axis=0)
                vox_parts.append(pairs)
            voxel = np.concatenate(vox_parts, axis=0) if len(vox_parts) > 1 \
                else vox_parts[0]
        else:
            voxel = np.stack(voxels, axis=0)                # (t,h,w,2)

        lq0 = image_paths[0]
        if f"{self.split}/" in lq0:
            seq = lq0.split(f"{self.split}/")[1].split("/")[0]
        else:
            d = os.path.dirname(lq0)
            if os.path.basename(d) in ("blur", "gt", "images"):
                d = os.path.dirname(d)
            seq = os.path.basename(d)
        origin_index = os.path.basename(lq0).split(".")[0]
        return {"lq": lq.astype(np.float32), "gt": gt.astype(np.float32),
                "voxel": voxel.astype(np.float32), "seq": seq,
                "origin_index": origin_index}

    def _pack_deblur_voxel(self, img_lqs, voxel_hwc) -> np.ndarray:
        """(h,w,26) packed input: [left img(3), left intra-exposure bins
        (m-1), right img(3), right bins (m-1)] — image_npy_dataset.py:211-221.
        Sharp datasets pad zero bins instead (image_sharp_npy_dataset.py:203-214)."""
        if self.kind == "sharp":
            h, w = img_lqs[0].shape[:2]
            zeros = np.zeros((h, w, 10), np.float32)  # 10: reference hardcode
            left_vox, right_vox = zeros, zeros
        else:
            m, n = self.m, self.n
            left_vox = voxel_hwc[..., 1:m]
            right_vox = voxel_hwc[..., m + 2 + n:]
        return np.concatenate(
            [img_lqs[0], left_vox, img_lqs[1], right_vox],
            axis=-1).astype(np.float32)

"""BS-ERGB sharp-VFI dataset (parity: image_sharp_npy_dataset.py:487-729).

Layout differences vs GoPro: splits are named ``3_TRAINING`` /
``2_VALIDATION`` / ``1_TEST``; frames live in ``<split>/<video>/images``
(the trailing frame is dropped — one more image than event windows), events
in ``<split>/<video>/events``."""

from __future__ import annotations

import os

from refid_tpu.core.registry import DATASETS
from refid_tpu.data.datasets.base import RecurrentEventDataset, recursive_glob


@DATASETS.register("BsergbSharpEventRecurrentDataset")
class BsergbSharpEventRecurrentDataset(RecurrentEventDataset):
    layout = "gopro"  # flat npz fields, no x/y swap
    kind = "sharp"
    bidir = False

    _SPLITS = {"train": "3_TRAINING", "val": "2_VALIDATION",
               "test": "1_TEST"}

    def __init__(self, opt):
        # map the phase onto the on-disk split name before the base indexes
        self._bsergb_split = self._SPLITS[opt["phase"] if opt["phase"] in
                                          self._SPLITS else "test"]
        super().__init__(opt)

    def _video_list(self):
        videos = self.opt.get("video_list")
        if videos:
            return list(videos)
        return sorted(os.listdir(os.path.join(self.dataroot,
                                              self._bsergb_split)))

    def _index_video(self, video):
        n = self.n
        vdir = os.path.join(self.dataroot, self._bsergb_split, video)
        frames = sorted(recursive_glob(os.path.join(vdir, "images"), ".png"))
        if not frames:
            return
        frames = frames[:-1]  # one more image than event windows (:540)
        event_frames = sorted(recursive_glob(os.path.join(vdir, "events"),
                                             ".npz"))
        set_len = n + 2
        n_sets = (len(frames) - set_len) // (n + 1) + 1
        for i in range(max(n_sets, 0)):
            group = [os.path.join(vdir, "images", f)
                     for f in frames[(n + 1) * i:(n + 1) * i + set_len]]
            evs = [os.path.join(vdir, "events", f)
                   for f in event_frames[(n + 1) * i:(n + 1) * i + set_len - 1]]
            self.lq_paths.append([group[0], group[-1]])
            self.gt_paths.append(group[1:-1])
            self.event_paths.append(evs)

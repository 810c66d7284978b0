"""Synthetic GoPro/HighREV-layout micro-dataset for end-to-end tests."""

from __future__ import annotations

import os

import cv2
import numpy as np


def make_gopro_tree(root: str, layout: str = "gopro", split: str = "train",
                    videos=("VID_A", "VID_B"), num_blur: int = 4,
                    m: int = 2, n: int = 1, h: int = 32, w: int = 48,
                    events_per_window: int = 300, seed: int = 0,
                    flat_event_fields: bool = True):
    """Create a micro GoPro-style tree.

    Per video: ``num_blur`` blur frames, enough gt frames and event windows
    for every (i in 1..num_blur-2) blur-pair item.  Frame index spacing
    follows the real datasets: blur frame k covers gt indices around
    k*(m+n).
    """
    rng = np.random.RandomState(seed)
    num_gt = (num_blur) * (m + n) + m + 2
    for video in videos:
        img_dir = os.path.join(root, split, video)
        os.makedirs(os.path.join(img_dir, "blur"), exist_ok=True)
        os.makedirs(os.path.join(img_dir, "gt"), exist_ok=True)
        if layout == "highrev":
            ev_dir = os.path.join(img_dir, "event")
        else:
            ev_dir = os.path.join(root, split + "_event", video)
        os.makedirs(ev_dir, exist_ok=True)

        for k in range(num_blur):
            img = (rng.rand(h, w, 3) * 255).astype(np.uint8)
            cv2.imwrite(os.path.join(img_dir, "blur", "%06d.png" % k), img)
        for k in range(num_gt):
            img = (rng.rand(h, w, 3) * 255).astype(np.uint8)
            cv2.imwrite(os.path.join(img_dir, "gt", "%06d.png" % k), img)
        for k in range(num_gt):
            ne = events_per_window
            t = np.sort(rng.uniform(k * 1000.0, (k + 1) * 1000.0, ne)
                        ).astype(np.float32)
            x = rng.randint(0, w, ne).astype(np.int16)
            y = rng.randint(0, h, ne).astype(np.int16)
            p = rng.choice([0, 1], ne).astype(np.int8)
            if layout == "highrev":
                # HighREV npz: (N,1)-shaped fields with x/y SWAPPED
                np.savez(os.path.join(ev_dir, "%06d.npz" % k),
                         timestamp=t[:, None], x=y[:, None].astype(np.float32),
                         y=x[:, None].astype(np.float32),
                         polarity=p[:, None].astype(np.float32))
            else:
                kw = dict(timestamp=t, x=x, y=y, polarity=p)
                if not flat_event_fields:
                    kw = {k2: v[:, None] for k2, v in kw.items()}
                np.savez(os.path.join(ev_dir, "%06d.npz" % k), **kw)
    return root

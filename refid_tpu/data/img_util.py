"""Host-side image IO (cv2) — parity: basicsr/utils/img_util.py.

Images are HWC float32 RGB in [0,1] end to end.  The reference decodes BGR
(img_util.py:124-148) but flips to RGB inside ``img2tensor`` (img_util.py:9-33,
``bgr2rgb=True`` default) BEFORE the network — so released checkpoints expect
RGB inputs; we flip once at decode (no intermediate op is channel-sensitive)
and flip back to BGR only when writing with cv2.
"""

from __future__ import annotations

import os

import cv2
import numpy as np

__all__ = ["imfrombytes", "imread", "imwrite", "tensor2img", "padding"]


def imfrombytes(content: bytes, flag: str = "color", float32: bool = False,
                rgb: bool = False) -> np.ndarray:
    """Decode image bytes (BGR by default like cv2; ``rgb=True`` to flip)."""
    img_np = np.frombuffer(content, np.uint8)
    imread_flags = {"color": cv2.IMREAD_COLOR,
                    "grayscale": cv2.IMREAD_GRAYSCALE,
                    "unchanged": cv2.IMREAD_UNCHANGED}
    img = cv2.imdecode(img_np, imread_flags[flag])
    if rgb and img.ndim == 3 and img.shape[2] == 3:
        img = img[..., ::-1]
    if float32:
        img = img.astype(np.float32) / 255.0
    return np.ascontiguousarray(img)


def imread(path: str, float32: bool = True, rgb: bool = True) -> np.ndarray:
    """Read an image as HWC float32 RGB (the network input convention)."""
    with open(path, "rb") as f:
        return imfrombytes(f.read(), float32=float32, rgb=rgb)


def imwrite(img: np.ndarray, file_path: str, auto_mkdir: bool = True) -> bool:
    if auto_mkdir:
        os.makedirs(os.path.dirname(os.path.abspath(file_path)), exist_ok=True)
    return cv2.imwrite(file_path, img)


def tensor2img(arr, rgb2bgr: bool = True, min_max=(0, 1)) -> np.ndarray:
    """(…, H, W, C) float RGB in [0,1] -> HWC uint8 [0,255] BGR (for
    cv2.imwrite), matching the reference tensor2img (img_util.py:61-121).
    """
    img = np.asarray(arr, np.float32)
    img = np.clip(img, min_max[0], min_max[1])
    img = (img - min_max[0]) / (min_max[1] - min_max[0])
    if rgb2bgr and img.ndim == 3 and img.shape[2] == 3:
        img = img[..., ::-1]
    return (img * 255.0).round().astype(np.uint8)


def padding(img_lq, img_gt, gt_size):
    """Reflect-pad both images up to gt_size (img_util.py:180-203)."""
    h, w = img_lq.shape[:2]
    h_pad = max(0, gt_size - h)
    w_pad = max(0, gt_size - w)
    if h_pad == 0 and w_pad == 0:
        return img_lq, img_gt
    img_lq = cv2.copyMakeBorder(img_lq, 0, h_pad, 0, w_pad, cv2.BORDER_REFLECT)
    img_gt = cv2.copyMakeBorder(img_gt, 0, h_pad, 0, w_pad, cv2.BORDER_REFLECT)
    return img_lq, img_gt

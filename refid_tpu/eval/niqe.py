"""NIQE — Natural Image Quality Evaluator (no-reference metric).

Implements "Making a 'Completely Blind' Image Quality Analyzer" (Mittal et
al., 2013) with BasicSR-compatible semantics (reference:
basicsr/metrics/niqe.py): y-channel input, 96x96 blocks, two scales,
AGGD features, MVG distance against pristine statistics.

The pristine-model statistics (``niqe_pris_params.npz``: mu (1,36), cov
(36,36), 7x7 gaussian window) are fitted on a private pristine corpus and
ship with BasicSR; point ``REFID_TPU_NIQE_PARAMS`` (or the ``params_path``
argument) at any BasicSR-style npz.  Without it the metric raises a clear
error instead of silently degrading.
"""

from __future__ import annotations

import math
import os
from typing import Optional

import cv2
import numpy as np
from scipy.ndimage import convolve
from scipy.special import gamma as _gamma

from refid_tpu.eval.color import to_y_channel

__all__ = ["calculate_niqe"]

_PARAM_CANDIDATES = [
    os.environ.get("REFID_TPU_NIQE_PARAMS", ""),
    os.path.join(os.path.dirname(__file__), "niqe_pris_params.npz"),
    "/root/reference/basicsr/metrics/niqe_pris_params.npz",
]

# precomputed gamma-ratio lookup for AGGD shape estimation
_GAM = np.arange(0.2, 10.001, 0.001)
_R_GAM = np.square(_gamma(2.0 / _GAM)) / (_gamma(1.0 / _GAM)
                                          * _gamma(3.0 / _GAM))


def _load_pris_params(params_path: Optional[str]):
    paths = [params_path] if params_path else _PARAM_CANDIDATES
    for p in paths:
        if p and os.path.exists(p):
            d = np.load(p)
            return (d["mu_pris_param"], d["cov_pris_param"],
                    d["gaussian_window"])
    raise FileNotFoundError(
        "NIQE pristine params not found; set REFID_TPU_NIQE_PARAMS to a "
        "BasicSR-style niqe_pris_params.npz")


def _aggd_params(block: np.ndarray):
    block = block.ravel()
    left = block[block < 0]
    right = block[block > 0]
    left_std = np.sqrt(np.mean(left ** 2)) if left.size else np.nan
    right_std = np.sqrt(np.mean(right ** 2)) if right.size else np.nan
    gammahat = left_std / right_std
    rhat = np.mean(np.abs(block)) ** 2 / np.mean(block ** 2)
    rhatnorm = (rhat * (gammahat ** 3 + 1) * (gammahat + 1)) / (
        (gammahat ** 2 + 1) ** 2)
    alpha = _GAM[np.argmin((_R_GAM - rhatnorm) ** 2)]
    ratio = np.sqrt(_gamma(1 / alpha) / _gamma(3 / alpha))
    return alpha, left_std * ratio, right_std * ratio


def _block_features(block: np.ndarray):
    feat = []
    alpha, bl, br = _aggd_params(block)
    feat.extend([alpha, (bl + br) / 2])
    for shift in ([0, 1], [1, 0], [1, 1], [1, -1]):
        prod = block * np.roll(block, shift, axis=(0, 1))
        alpha, bl, br = _aggd_params(prod)
        mean = (br - bl) * (_gamma(2 / alpha) / _gamma(1 / alpha))
        feat.extend([alpha, mean, bl, br])
    return feat


def _niqe_score(img: np.ndarray, mu_pris, cov_pris, window,
                block: int = 96) -> float:
    h, w = img.shape
    nbh, nbw = math.floor(h / block), math.floor(w / block)
    img = img[: nbh * block, : nbw * block]

    per_scale = []
    for scale in (1, 2):
        mu = convolve(img, window, mode="nearest")
        sigma = np.sqrt(np.abs(
            convolve(np.square(img), window, mode="nearest") - np.square(mu)))
        normalized = (img - mu) / (sigma + 1)
        feats = []
        bs = block // scale
        for iw in range(nbw):
            for ih in range(nbh):
                feats.append(_block_features(
                    normalized[ih * bs:(ih + 1) * bs, iw * bs:(iw + 1) * bs]))
        per_scale.append(np.asarray(feats))
        if scale == 1:
            hh, ww = img.shape
            img = cv2.resize(img / 255.0, (ww // 2, hh // 2),
                             interpolation=cv2.INTER_LINEAR) * 255.0

    feats = np.concatenate(per_scale, axis=1)
    valid = feats[~np.isnan(feats).any(axis=1)]
    if valid.shape[0] < 2:
        # degenerate input (e.g. constant blocks -> undefined AGGD): the
        # reference crashes here; return nan instead
        return float("nan")
    mu_dist = np.nanmean(feats, axis=0)
    cov_dist = np.cov(valid, rowvar=False)
    invcov = np.linalg.pinv((cov_pris + cov_dist) / 2)
    # ravel: mu_pris is stored (1, n), and float() on a 1-element 2-D array
    # is removed in numpy >= 1.25
    d = np.ravel(mu_pris - mu_dist)
    return float(np.sqrt(d @ invcov @ d))


def calculate_niqe(img, crop_border=0, input_order="HWC", convert_to="y",
                   params_path: Optional[str] = None) -> float:
    """NIQE of an image in [0, 255] (BGR for 'HWC'/'CHW' orders)."""
    mu_pris, cov_pris, window = _load_pris_params(params_path)
    img = np.asarray(img, np.float32)
    if input_order != "HW":
        if input_order == "CHW":
            img = img.transpose(1, 2, 0)
        if convert_to == "y":
            img = to_y_channel(img)
        elif convert_to == "gray":
            img = cv2.cvtColor(img / 255.0, cv2.COLOR_BGR2GRAY) * 255.0
        img = np.squeeze(img)
    if crop_border != 0:
        img = img[crop_border:-crop_border, crop_border:-crop_border]
    return _niqe_score(img, mu_pris, cov_pris, window)

"""Training losses (parity: basicsr/models/losses/losses.py).

All losses take (pred, target[, weight]) and support 'none'|'mean'|'sum'
reduction like the reference's ``weighted_loss`` decorator
(basicsr/models/losses/loss_util.py:57-95).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax.numpy as jnp

__all__ = ["charbonnier_loss", "l1_loss", "mse_loss", "psnr_loss",
           "srn_loss", "weighted_tv_loss", "build_loss"]


def _reduce(x, weight, reduction):
    if weight is not None:
        x = x * weight
    if reduction == "none":
        return x
    if reduction == "mean":
        return jnp.mean(x)
    if reduction == "sum":
        return jnp.sum(x)
    raise ValueError(f"Unsupported reduction mode: {reduction}")


def charbonnier_loss(pred, target, weight=None, eps=1e-12, loss_weight=1.0,
                     reduction="mean"):
    """sqrt((pred-target)^2 + eps) — the production loss (losses.py:143-173).
    Note eps is the reference's 1e-12 (not squared)."""
    return loss_weight * _reduce(
        jnp.sqrt((pred - target) ** 2 + eps), weight, reduction)


def l1_loss(pred, target, weight=None, loss_weight=1.0, reduction="mean"):
    return loss_weight * _reduce(jnp.abs(pred - target), weight, reduction)


def mse_loss(pred, target, weight=None, loss_weight=1.0, reduction="mean"):
    return loss_weight * _reduce((pred - target) ** 2, weight, reduction)


def psnr_loss(pred, target, loss_weight=1.0, toY=False):
    """Negative-PSNR-style loss (losses.py:95-120):
    scale * mean_batch(log(mse_per_image + 1e-8)).  Expects 4-D NHWC inputs.

    ``toY`` projects RGB in [0,1] to the BT.601 luma channel (the reference's
    ``(pred * coef).sum(dim=1) + 16.`` then ``/255.``, losses.py:108-117)
    before the MSE."""
    assert pred.ndim == 4
    if toY:
        coef = jnp.asarray([65.481, 128.553, 24.966], dtype=pred.dtype)
        pred = (jnp.sum(pred * coef, axis=-1, keepdims=True) + 16.0) / 255.0
        target = (jnp.sum(target * coef, axis=-1, keepdims=True)
                  + 16.0) / 255.0
    scale = 10.0 / jnp.log(10.0)
    per_image = jnp.mean((pred - target) ** 2, axis=(1, 2, 3))
    return loss_weight * scale * jnp.mean(jnp.log(per_image + 1e-8))


_LOSSES = {
    "CharbonnierLoss": charbonnier_loss,
    "L1Loss": l1_loss,
    "MSELoss": mse_loss,
    "PSNRLoss": psnr_loss,
    "SRNLoss": lambda preds, target, **kw: srn_loss(preds, target, **kw),
    "WeightedTVLoss": lambda pred, weight=None, **kw: weighted_tv_loss(
        pred, weight, **kw),
}


def build_loss(opt: dict):
    """Build a loss fn from a reference-style ``pixel_opt`` dict, e.g.
    ``{type: CharbonnierLoss, loss_weight: 1.0, reduction: mean}``."""
    opt = dict(opt)
    loss_type = opt.pop("type")
    if loss_type not in _LOSSES:
        raise ValueError(f"unknown loss {loss_type!r}")
    fn = _LOSSES[loss_type]
    return partial(fn, **opt)


def srn_loss(preds, target, loss_weight=1.0):
    """3-scale MSE pyramid loss (losses.py:123-139): ``preds`` is a list of
    predictions at 1/4, 1/2, and full resolution (NHWC)."""
    import jax
    b, h, w, c = target.shape
    gt2 = jax.image.resize(target, (b, h // 2, w // 2, c), "bilinear")
    gt3 = jax.image.resize(target, (b, h // 4, w // 4, c), "bilinear")
    return loss_weight * (mse_loss(preds[0], gt3) + mse_loss(preds[1], gt2)
                          + mse_loss(preds[2], target))


def weighted_tv_loss(pred, weight=None, loss_weight=1.0):
    """Total-variation loss with optional elementwise weights
    (losses.py:176-197); pred is NHWC."""
    yw = weight[:, :-1, :, :] if weight is not None else None
    xw = weight[:, :, :-1, :] if weight is not None else None
    y_diff = l1_loss(pred[:, :-1, :, :], pred[:, 1:, :, :], weight=yw,
                     loss_weight=loss_weight)
    x_diff = l1_loss(pred[:, :, :-1, :], pred[:, :, 1:, :], weight=xw,
                     loss_weight=loss_weight)
    return x_diff + y_diff

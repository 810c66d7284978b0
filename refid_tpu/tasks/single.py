"""Single-image restoration tasks (with and without events).

Parity targets:
  * ImageEventRestorationModel (basicsr/models/image_event_restoration_model
    .py:15-508): single blurred image + voxel -> sharp; tiled ``grids``
    inference; per-image PSNR/SSIM validation.
  * ImageRestorationModel (image_restoration_model.py:16-419): image-only.
  * ``single_image_inference`` replaces the reference demo path — WITH the
    voxel argument the shipped demo.py forgets to build (demo.py:29 bug).
"""

from __future__ import annotations

import os
from collections import defaultdict
from typing import Dict, Optional

import numpy as np
import jax.numpy as jnp

from refid_tpu.core.registry import MODELS
from refid_tpu.data.img_util import tensor2img, imwrite
from refid_tpu.eval import metrics as metric_module
from refid_tpu.eval.tiling import tiled_apply
from refid_tpu.tasks.base import RestorationTaskBase


def _metric(name_opt: dict, sr_img, gt_img) -> float:
    opt = dict(name_opt)
    metric_type = opt.pop("type")
    return getattr(metric_module, metric_type)(sr_img, gt_img, **opt)


@MODELS.register("ImageEventRestorationModel")
@MODELS.register("TestImageEventRestorationModel")
class ImageEventRestorationTask(RestorationTaskBase):
    """lq (h,w,3) + voxel (h,w,bins) -> sharp (h,w,3).

    The recurrent flagship net expects (b,t,h,w,2) bin pairs; single-image
    nets (e.g. EVHINet) take the full (h,w,bins) voxel.  The network decides:
    we pass the voxel through unchanged and squeeze the t axis of recurrent
    outputs (mean over t=1)."""

    def _forward(self, lq, voxel):
        pred = self.predict(lq, voxel)
        pred = np.asarray(pred)
        if pred.ndim == 5:  # recurrent net: (b,t,h,w,3) -> middle frame
            pred = pred[:, pred.shape[1] // 2]
        return pred

    def validate(self, loader, dataset_opt: dict, current_iter: int = 0,
                 save_img: bool = False, logger=None,
                 max_items: Optional[int] = None) -> Dict[str, float]:
        val_opt = self.opt.get("val", {})
        crop_size = val_opt.get("crop_size")
        max_minibatch = val_opt.get("max_minibatch", 2) or 2
        metric_opts = dict(val_opt.get("metrics", {}) or {})
        acc = defaultdict(float)
        cnt = 0
        for item_idx, batch in enumerate(loader):
            if max_items is not None and item_idx >= max_items:
                break
            lq, voxel, gt = batch["lq"][0], batch["voxel"][0], batch["gt"][0]
            if crop_size:
                pred = tiled_apply(
                    lambda l, v: self._forward(l, v), lq, voxel, crop_size,
                    max_minibatch=max_minibatch,
                    trans_num=val_opt.get("trans_num", 1))
                if pred.ndim == 4:
                    pred = pred[0]
            else:
                pred = self._forward(lq[None], voxel[None])[0]
            sr_img = tensor2img(pred)
            gt_img = tensor2img(gt)
            if save_img:
                name = f"{batch['seq'][0]}/{batch['origin_index'][0]}.png"
                imwrite(sr_img, os.path.join(
                    self.opt["path"].get("visualization", "vis"),
                    dataset_opt.get("name", "val"), name))
            for mname, mopt in metric_opts.items():
                acc[mname] += _metric(mopt, sr_img, gt_img)
            cnt += 1
        results = {k: v / cnt for k, v in acc.items()} if cnt else {}
        if logger:
            msg = ", ".join(f"{k}: {v:.4f}" for k, v in results.items())
            logger.info(f"Validation [{dataset_opt.get('name', '')}] "
                        f"iter {current_iter}: {msg}")
        return results

    def single_image_inference(self, img: np.ndarray, voxel: np.ndarray,
                               save_path: str):
        """Fixed demo path (reference demo.py:29 passes no voxel and
        crashes; here the voxel is required)."""
        val_opt = self.opt.get("val", {})
        crop_size = val_opt.get("crop_size")
        if crop_size:
            pred = tiled_apply(lambda l, v: self._forward(l, v), img, voxel,
                               crop_size,
                               max_minibatch=val_opt.get("max_minibatch", 2))
            if pred.ndim == 4:
                pred = pred[0]
        else:
            pred = self._forward(img[None], voxel[None])[0]
        imwrite(tensor2img(pred), save_path)
        return pred


@MODELS.register("ImageRestorationModel")
@MODELS.register("TestImageRestorationModel")
class ImageRestorationTask(ImageEventRestorationTask):
    """Image-only deblurring (no events): the voxel input is a zero grid so
    the same network/task machinery applies (reference keeps a separate
    image_restoration_model.py copy)."""

    def _forward(self, lq, voxel):
        if voxel is None:
            voxel = np.zeros(lq.shape[:-1] + (2,), np.float32)
        return super()._forward(lq, voxel)

"""Recurrent restoration tasks: blur-VFI and sharp-VFI.

Parity targets:
  * TwoImageEventRecurrentRestorationModel
    (basicsr/models/twoImage_event_recurrent_model.py:17-554) — validation
    splits metrics into deblur (frames < m or >= m+n) vs interpolation
    buckets (:460-491) and logs the 2m·deblur + n·interpo weighted total
    (:515-542).
  * TwoSharpImageEventRecurrentRestorationModel
    (twoSharpImage_event_recurrent_model.py) — interpolation metrics only.
  * Test* frozen variants collapse into ``is_train=False``.
"""

from __future__ import annotations

import os
from collections import defaultdict
from typing import Dict, Optional

import numpy as np

from refid_tpu.core.registry import MODELS
from refid_tpu.data.img_util import tensor2img, imwrite
from refid_tpu.eval import metrics as metric_module
from refid_tpu.eval.tiling import tiled_apply
from refid_tpu.tasks.base import RestorationTaskBase

__all__ = ["TwoImageEventRecurrentRestorationTask"]


def _metric(name_opt: dict, sr_img, gt_img) -> float:
    opt = dict(name_opt)
    metric_type = opt.pop("type")
    return getattr(metric_module, metric_type)(sr_img, gt_img, **opt)


class _RecurrentTaskBase(RestorationTaskBase):
    split_deblur_interpo = True  # False -> interpolation-only metrics

    def _mn(self, dataset_opt: dict):
        return (dataset_opt["num_end_interpolation"],
                dataset_opt["num_inter_interpolation"])

    def validate(self, loader, dataset_opt: dict, current_iter: int = 0,
                 save_img: bool = False, logger=None,
                 max_items: Optional[int] = None) -> Dict[str, float]:
        val_opt = self.opt.get("val", {})
        crop_size = val_opt.get("crop_size")
        max_minibatch = val_opt.get("max_minibatch", 2) or 2
        m, n = self._mn(dataset_opt)
        metrics_deblur = dict(val_opt.get("metrics_deblur", {}) or {})
        metrics_interpo = dict(val_opt.get("metrics_interpo", {}) or {})
        if not metrics_interpo:
            metrics_interpo = dict(val_opt.get("metrics", {}) or {})

        acc_deblur = defaultdict(float)
        acc_interpo = defaultdict(float)
        cnt = 0
        # Accumulated across ALL items so mixed-t_out loaders average
        # correctly (each metric sum is divided by the number of frames that
        # actually contributed to it, not by cnt * last-item's count).
        n_deblur_frames = n_interpo_frames = 0

        for item_idx, batch in enumerate(loader):
            if max_items is not None and item_idx >= max_items:
                break
            lq, voxel, gt = batch["lq"][0], batch["voxel"][0], batch["gt"][0]
            if crop_size:
                pred = tiled_apply(
                    lambda l, v: self.predict(l, v), lq, voxel, crop_size,
                    max_minibatch=max_minibatch,
                    trans_num=val_opt.get("trans_num", 1))
            else:
                pred = np.asarray(self.predict(lq[None], voxel[None]))[0]

            t_out = pred.shape[0]
            for frame_idx in range(t_out):
                sr_img = tensor2img(pred[frame_idx])
                gt_img = tensor2img(gt[frame_idx])
                is_interpo = (m <= frame_idx < m + n) or \
                    not self.split_deblur_interpo
                if save_img:
                    name = (f"{batch['seq'][0]}/"
                            f"{batch['origin_index'][0]}_{frame_idx}.png")
                    path = os.path.join(
                        self.opt["path"].get("visualization", "vis"),
                        dataset_opt.get("name", "val"), name)
                    imwrite(sr_img, path)
                bucket = acc_interpo if is_interpo else acc_deblur
                opts = metrics_interpo if is_interpo else metrics_deblur
                if is_interpo:
                    n_interpo_frames += 1
                else:
                    n_deblur_frames += 1
                for mname, mopt in opts.items():
                    bucket[mname] += _metric(mopt, sr_img, gt_img)
            cnt += 1

        results: Dict[str, float] = {}
        if cnt:
            for k in acc_deblur:
                results[f"deblur_{k}"] = acc_deblur[k] / max(
                    n_deblur_frames, 1)
            for k in acc_interpo:
                results[f"interpo_{k}"] = acc_interpo[k] / max(
                    n_interpo_frames, 1)
            # weighted total (reference :515-525): 2m*deblur + n*interpo
            for k in set(acc_deblur) & set(acc_interpo):
                results[f"total_{k}"] = (
                    results[f"deblur_{k}"] * 2 * m +
                    results[f"interpo_{k}"] * n) / (2 * m + n)
        if logger:
            msg = ", ".join(f"{k}: {v:.4f}" for k, v in results.items())
            logger.info(f"Validation [{dataset_opt.get('name', '')}] "
                        f"iter {current_iter}: {msg}")
        return results


@MODELS.register("TwoImageEventRecurrentRestorationModel")
@MODELS.register("TestTwoImageEventRecurrentRestorationModel")
class TwoImageEventRecurrentRestorationTask(_RecurrentTaskBase):
    split_deblur_interpo = True


@MODELS.register("TwoSharpImageEventRecurrentRestorationModel")
@MODELS.register("TestTwoSharpImageEventRecurrentRestorationModel")
class TwoSharpImageEventRecurrentRestorationTask(_RecurrentTaskBase):
    split_deblur_interpo = False

    def validate(self, loader, dataset_opt, **kw):
        # sharp VFI: every output frame is an interpolation
        res = super().validate(loader, dataset_opt, **kw)
        return {k.replace("interpo_", ""): v for k, v in res.items()
                if not k.startswith("total_")}

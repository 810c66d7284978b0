"""Deblur-only recurrent datasets: 1 blurred frame -> m sharp frames
(parity: basicsr/data/Deblur_image_npy_dataset.py)."""

from refid_tpu.core.registry import DATASETS
from refid_tpu.data.datasets.base import RecurrentEventDataset


@DATASETS.register("DeblurGoProEventRecurrentDataset")
class DeblurGoProEventRecurrentDataset(RecurrentEventDataset):
    """(Deblur_image_npy_dataset.py:20-263): bins = m+1, gts = m."""
    layout = "gopro"
    kind = "deblur1"
    bidir = False


@DATASETS.register("DeblurUNDEventRecurrentDataset")
class DeblurUNDEventRecurrentDataset(RecurrentEventDataset):
    """HighREV/UND variant (Deblur_image_npy_dataset.py:266-517)."""
    layout = "highrev"
    kind = "deblur1"
    bidir = False


@DATASETS.register("DeblurGoProBidirEventRecurrentDataset")
class DeblurGoProBidirEventRecurrentDataset(RecurrentEventDataset):
    """Deblur with reversed-voxel stream (Deblur_image_npy_dataset.py:520+)."""
    layout = "gopro"
    kind = "deblur1"
    bidir = True

"""GoPro blur-VFI datasets (parity: basicsr/data/image_npy_dataset.py)."""

from refid_tpu.core.registry import DATASETS
from refid_tpu.data.datasets.base import RecurrentEventDataset


@DATASETS.register("GoProEventRecurrentDataset")
class GoProEventRecurrentDataset(RecurrentEventDataset):
    """2 blurred frames + events -> 2m+n sharp frames
    (image_npy_dataset.py:20-257)."""
    layout = "gopro"
    kind = "blur"
    bidir = False


@DATASETS.register("GoProBidirEventRecurrentDataset")
class GoProBidirEventRecurrentDataset(RecurrentEventDataset):
    """Blur-VFI with an extra time-reversed voxel stream concatenated on the
    t axis (image_npy_dataset.py:260-505)."""
    layout = "gopro"
    kind = "blur"
    bidir = True

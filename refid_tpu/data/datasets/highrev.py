"""HighREV / UND ("Ruisi") datasets — directory-listed videos, events under
``<split>/<video>/event/``, and the x/y field swap correcting the dataset
export error (image_npy_Ruisi_dataset.py:161-166)."""

from refid_tpu.core.registry import DATASETS
from refid_tpu.data.datasets.base import RecurrentEventDataset


@DATASETS.register("RuisiEventRecurrentDataset")
class RuisiEventRecurrentDataset(RecurrentEventDataset):
    """HighREV blur-VFI (image_npy_Ruisi_dataset.py:20-271)."""
    layout = "highrev"
    kind = "blur"
    bidir = False


@DATASETS.register("RuisiSharpEventRecurrentDataset")
class RuisiSharpEventRecurrentDataset(RecurrentEventDataset):
    """HighREV sharp-VFI (image_sharp_Ruisi_dataset.py:20-266)."""
    layout = "highrev"
    kind = "sharp"
    bidir = False

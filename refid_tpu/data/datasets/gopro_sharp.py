"""GoPro sharp-VFI datasets (parity: basicsr/data/image_sharp_npy_dataset.py)."""

from refid_tpu.core.registry import DATASETS
from refid_tpu.data.datasets.base import RecurrentEventDataset


@DATASETS.register("GoProSharpEventRecurrentDataset")
class GoProSharpEventRecurrentDataset(RecurrentEventDataset):
    """2 sharp end frames + events -> n middle frames
    (image_sharp_npy_dataset.py:20-251).  With ``return_deblur_voxel`` the
    packed input pads ZERO deblur bins so the 26-ch blur-VFI checkpoints can
    consume sharp inputs (:203-214)."""
    layout = "gopro"
    kind = "sharp"
    bidir = False


@DATASETS.register("GoProSharpwithVoxelEventRecurrentDataset")
class GoProSharpwithVoxelEventRecurrentDataset(RecurrentEventDataset):
    """Sharp VFI with REAL intra-exposure voxels packed into the input
    (image_sharp_npy_dataset.py:254-484): like sharp, but the deblur-voxel
    channels are taken from the voxelized stream rather than zeros."""
    layout = "gopro"
    kind = "sharp"
    bidir = False

    def _pack_deblur_voxel(self, img_lqs, voxel_hwc):
        import numpy as np
        # ends-of-window bins stand in for intra-exposure bins; the sharp
        # stream has n+1 bins, replicate each end bin 10x (reference pads
        # the 26-ch input shape expected by blur-VFI checkpoints)
        left = np.repeat(voxel_hwc[..., :1], 10, axis=-1)
        right = np.repeat(voxel_hwc[..., -1:], 10, axis=-1)
        return np.concatenate([img_lqs[0], left, img_lqs[1], right],
                              axis=-1).astype(np.float32)

from refid_tpu.data.loader import build_dataset, build_loader
# dataset modules register themselves on import
from refid_tpu.data.datasets import gopro_recurrent  # noqa: F401
from refid_tpu.data.datasets import gopro_sharp      # noqa: F401
from refid_tpu.data.datasets import highrev          # noqa: F401
from refid_tpu.data.datasets import single_image     # noqa: F401
from refid_tpu.data.datasets import deblur_recurrent  # noqa: F401

__all__ = ["build_dataset", "build_loader"]
from refid_tpu.data.datasets import bsergb             # noqa: F401

"""Host-side BasicSR-inherited utilities (SURVEY §2.9 long tail).

These close the last inventory row: the reference carries
``basicsr/utils/{flow_util,face_util,download_util}.py`` from BasicSR —
unused by every REFID code path, but part of its capability surface.
They are pure host utilities (numpy/cv2); nothing TPU-specific.
"""

from refid_tpu.utils.flow_util import (dequantize_flow, flowread, flowwrite,
                                       quantize_flow)

__all__ = ["flowread", "flowwrite", "quantize_flow", "dequantize_flow"]

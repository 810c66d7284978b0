"""Optical-flow I/O: .flo (Middlebury "PIEH") read/write and uint8
quantization for jpeg-size dumps.

Parity target: ``basicsr/utils/flow_util.py:7-180`` (itself from mmcv).
Behavior-compatible with two documented fixes:

* the reference's quantized ``flowwrite`` calls ``cv2.imwrite(dxdy,
  filename)`` with the arguments swapped (and first creates a DIRECTORY
  named ``filename``) — it has never worked; here the quantized pair is
  written with the correct argument order to the given file path;
* quantization levels use the reference's 255-level convention so 0
  survives a round-trip.
"""

from __future__ import annotations

import os

import numpy as np

__all__ = ["flowread", "flowwrite", "quantize_flow", "dequantize_flow",
           "quantize", "dequantize"]


def flowread(flow_path, quantize=False, concat_axis=0, *args, **kwargs):
    """Read an optical flow map -> (h, w, 2) float32.

    ``quantize=True`` reads a uint8 dx/dy pair image (written by
    ``flowwrite(..., quantize=True)``) and dequantizes; otherwise reads
    the lossless .flo format (reference flow_util.py:7-45)."""
    if quantize:
        import cv2
        assert concat_axis in (0, 1)
        cat_flow = cv2.imread(str(flow_path), cv2.IMREAD_UNCHANGED)
        if cat_flow is None or cat_flow.ndim != 2:
            got = "missing" if cat_flow is None else f"ndim={cat_flow.ndim}"
            raise IOError(f"{flow_path} is not a valid quantized flow file "
                          f"({got})")
        assert cat_flow.shape[concat_axis] % 2 == 0
        dx, dy = np.split(cat_flow, 2, axis=concat_axis)
        return dequantize_flow(dx, dy, *args, **kwargs).astype(np.float32)
    with open(flow_path, "rb") as f:
        header = f.read(4)
        if header != b"PIEH":
            raise IOError(f"Invalid flow file: {flow_path}, header does "
                          "not contain PIEH")
        w = int(np.fromfile(f, np.int32, 1).squeeze())
        h = int(np.fromfile(f, np.int32, 1).squeeze())
        flow = np.fromfile(f, np.float32, w * h * 2).reshape((h, w, 2))
    return flow.astype(np.float32)


def flowwrite(flow, filename, quantize=False, concat_axis=0, *args,
              **kwargs):
    """Write (h, w, 2) flow: lossless .flo, or a quantized uint8 dx/dy
    pair image (reference flow_util.py:47-75; arg-swap bug fixed)."""
    if not quantize:
        with open(filename, "wb") as f:
            f.write(b"PIEH")
            np.array([flow.shape[1], flow.shape[0]],
                     dtype=np.int32).tofile(f)
            flow.astype(np.float32).tofile(f)
            f.flush()
        return
    import cv2
    assert concat_axis in (0, 1)
    dx, dy = quantize_flow(flow, *args, **kwargs)
    dxdy = np.concatenate((dx, dy), axis=concat_axis)
    parent = os.path.dirname(str(filename))
    if parent:
        os.makedirs(parent, exist_ok=True)
    cv2.imwrite(str(filename), dxdy)


def quantize_flow(flow, max_val=0.02, norm=True):
    """(h, w, 2) flow -> (dx_u8, dy_u8); values outside
    [-max_val, max_val] (after optional width/height normalization)
    truncate (reference flow_util.py:78-103)."""
    h, w, _ = flow.shape
    dx = flow[..., 0]
    dy = flow[..., 1]
    if norm:
        dx = dx / w
        dy = dy / h
    # 255 levels (not 256) so 0 is exactly 0 after dequantization
    return tuple(quantize(d, -max_val, max_val, 255, np.uint8)
                 for d in (dx, dy))


def dequantize_flow(dx, dy, max_val=0.02, denorm=True):
    """Inverse of ``quantize_flow`` (reference flow_util.py:106-127)."""
    assert dx.shape == dy.shape
    assert dx.ndim == 2 or (dx.ndim == 3 and dx.shape[-1] == 1)
    dx, dy = (dequantize(d, -max_val, max_val, 255) for d in (dx, dy))
    if denorm:
        dx = dx * dx.shape[1]
        dy = dy * dy.shape[0]
    return np.dstack((dx, dy))


def quantize(arr, min_val, max_val, levels, dtype=np.int64):
    """Clip to [min_val, max_val] and quantize to [0, levels-1]
    (reference flow_util.py:130-152)."""
    if not (isinstance(levels, int) and levels > 1):
        raise ValueError(f"levels must be a positive integer > 1, got "
                         f"{levels}")
    if min_val >= max_val:
        raise ValueError(f"min_val ({min_val}) must be smaller than "
                         f"max_val ({max_val})")
    arr = np.clip(arr, min_val, max_val) - min_val
    return np.minimum(
        np.floor(levels * arr / (max_val - min_val)).astype(dtype),
        levels - 1)


def dequantize(arr, min_val, max_val, levels, dtype=np.float64):
    """Map quantized levels back to bin centers
    (reference flow_util.py:155-180)."""
    if not (isinstance(levels, int) and levels > 1):
        raise ValueError(f"levels must be a positive integer > 1, got "
                         f"{levels}")
    if min_val >= max_val:
        raise ValueError(f"min_val ({min_val}) must be smaller than "
                         f"max_val ({max_val})")
    return (arr + 0.5).astype(dtype) * (max_val - min_val) / levels + min_val

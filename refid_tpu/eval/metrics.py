"""Image quality metrics with reference-exact semantics.

PSNR matches basicsr/metrics/psnr_ssim.py:9-63 (max value inferred from the
image range, float64 math).

SSIM matches the reference's NONSTANDARD 3-D formulation
(psnr_ssim.py:131-182): a single 11x11x11 Gaussian window (sigma 1.5 per
axis, outer product of three 1-D kernels) convolved over the (H, W, C)
volume with replicate padding — not the usual per-channel 2-D SSIM.  The
reference hardcodes ``.cuda()`` for this; here it is a jitted separable 3-D
convolution that runs on TPU (or CPU) via XLA.

The y-channel variant (``test_y_channel=True``) uses the classic 2-D
11x11 Gaussian SSIM with replicate borders (psnr_ssim.py:184-222).
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

import jax
import jax.numpy as jnp

from refid_tpu.eval.color import to_y_channel

__all__ = ["calculate_psnr", "calculate_ssim", "gaussian_kernel_1d"]


def gaussian_kernel_1d(ksize: int = 11, sigma: float = 1.5) -> np.ndarray:
    """cv2.getGaussianKernel-equivalent 1-D kernel (normalized, float64)."""
    half = (ksize - 1) / 2.0
    x = np.arange(ksize, dtype=np.float64) - half
    k = np.exp(-(x ** 2) / (2.0 * sigma ** 2))
    return k / k.sum()


def _reorder(img, input_order):
    if input_order == "CHW":
        return np.transpose(img, (1, 2, 0))
    if input_order == "HWC":
        return img
    raise ValueError(f"Wrong input_order {input_order!r}")


def _prepare(img1, img2, crop_border, input_order):
    assert img1.shape == img2.shape, (
        f"Image shapes are different: {img1.shape}, {img2.shape}.")
    img1 = _reorder(np.asarray(img1), input_order).astype(np.float64)
    img2 = _reorder(np.asarray(img2), input_order).astype(np.float64)
    if crop_border != 0:
        img1 = img1[crop_border:-crop_border, crop_border:-crop_border, ...]
        img2 = img2[crop_border:-crop_border, crop_border:-crop_border, ...]
    return img1, img2


def calculate_psnr(img1, img2, crop_border=0, input_order="HWC",
                   test_y_channel=False):
    """PSNR with max value inferred from the range ([0,1] vs [0,255])."""
    img1, img2 = _prepare(img1, img2, crop_border, input_order)
    if test_y_channel:
        img1 = to_y_channel(img1)
        img2 = to_y_channel(img2)
    mse = np.mean((img1 - img2) ** 2)
    if mse == 0:
        return float("inf")
    max_value = 1.0 if img1.max() <= 1 else 255.0
    return float(20.0 * np.log10(max_value / np.sqrt(mse)))


@lru_cache(maxsize=8)
def _ssim3d_fn(shape):
    """Build a jitted separable 3-D Gaussian SSIM for a fixed volume shape."""
    kernel = jnp.asarray(gaussian_kernel_1d(), jnp.float32)

    def blur3d(vol):
        # replicate-pad by 5 on every axis, then three separable 1-D convs.
        v = jnp.pad(vol, 5, mode="edge")
        for axis in range(3):
            v = jnp.moveaxis(v, axis, -1)
            lead = v.shape[:-1]
            v = v.reshape(1, 1, -1, v.shape[-1])
            v = jax.lax.conv_general_dilated(
                v, kernel.reshape(1, 1, 1, 11), window_strides=(1, 1),
                padding="VALID", dimension_numbers=("NCHW", "OIHW", "NCHW"))
            v = v.reshape(*lead, v.shape[-1])
            v = jnp.moveaxis(v, -1, axis)
        return v

    def ssim3d(img1, img2, c1, c2):
        mu1 = blur3d(img1)
        mu2 = blur3d(img2)
        mu1_sq = mu1 ** 2
        mu2_sq = mu2 ** 2
        mu1_mu2 = mu1 * mu2
        sigma1_sq = blur3d(img1 ** 2) - mu1_sq
        sigma2_sq = blur3d(img2 ** 2) - mu2_sq
        sigma12 = blur3d(img1 * img2) - mu1_mu2
        ssim_map = ((2 * mu1_mu2 + c1) * (2 * sigma12 + c2)) / (
            (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2))
        return jnp.mean(ssim_map)

    return jax.jit(ssim3d)


def _ssim_3d(img1: np.ndarray, img2: np.ndarray, max_value: float) -> float:
    assert img1.ndim == 3 and img2.ndim == 3
    c1 = (0.01 * max_value) ** 2
    c2 = (0.03 * max_value) ** 2
    fn = _ssim3d_fn(img1.shape)
    out = fn(jnp.asarray(img1, jnp.float32), jnp.asarray(img2, jnp.float32),
             jnp.float32(c1), jnp.float32(c2))
    return float(out)


@lru_cache(maxsize=8)
def _ssim2d_fn(shape):
    k1 = jnp.asarray(gaussian_kernel_1d(), jnp.float32)

    def blur2d(img):
        v = jnp.pad(img, 5, mode="edge")
        for axis in range(2):
            v = jnp.moveaxis(v, axis, -1)
            lead = v.shape[:-1]
            v = v.reshape(1, 1, -1, v.shape[-1])
            v = jax.lax.conv_general_dilated(
                v, k1.reshape(1, 1, 1, 11), window_strides=(1, 1),
                padding="VALID", dimension_numbers=("NCHW", "OIHW", "NCHW"))
            v = v.reshape(*lead, v.shape[-1])
            v = jnp.moveaxis(v, -1, axis)
        return v

    def ssim2d(img1, img2, c1, c2):
        mu1 = blur2d(img1)
        mu2 = blur2d(img2)
        mu1_sq, mu2_sq, mu1_mu2 = mu1 ** 2, mu2 ** 2, mu1 * mu2
        sigma1_sq = blur2d(img1 ** 2) - mu1_sq
        sigma2_sq = blur2d(img2 ** 2) - mu2_sq
        sigma12 = blur2d(img1 * img2) - mu1_mu2
        ssim_map = ((2 * mu1_mu2 + c1) * (2 * sigma12 + c2)) / (
            (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2))
        return jnp.mean(ssim_map)

    return jax.jit(ssim2d)


def _ssim_cly(img1: np.ndarray, img2: np.ndarray) -> float:
    """Y-channel 2-D SSIM, constants fixed for the [0,255] range."""
    assert img1.ndim == 2 and img2.ndim == 2
    c1 = (0.01 * 255) ** 2
    c2 = (0.03 * 255) ** 2
    fn = _ssim2d_fn(img1.shape)
    out = fn(jnp.asarray(img1, jnp.float32), jnp.asarray(img2, jnp.float32),
             jnp.float32(c1), jnp.float32(c2))
    return float(out)


def calculate_ssim(img1, img2, crop_border=0, input_order="HWC",
                   test_y_channel=False):
    """SSIM via the reference's 3-D Gaussian window (psnr_ssim.py:225-303)."""
    img1, img2 = _prepare(img1, img2, crop_border, input_order)
    if test_y_channel:
        img1 = to_y_channel(img1)
        img2 = to_y_channel(img2)
        return _ssim_cly(img1[..., 0], img2[..., 0])
    max_value = 1 if img1.max() <= 1 else 255
    return _ssim_3d(img1, img2, max_value)

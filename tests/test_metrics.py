"""Golden tests for PSNR / 3-D Gaussian SSIM against torch/cv2 oracles."""

import numpy as np
import pytest

from refid_tpu.eval.metrics import calculate_psnr, calculate_ssim, gaussian_kernel_1d


def _pair(shape=(48, 40, 3), seed=0, scale=255.0):
    rng = np.random.RandomState(seed)
    a = rng.rand(*shape) * scale
    b = np.clip(a + rng.randn(*shape) * 0.05 * scale, 0, scale)
    return a, b


def test_gaussian_kernel_matches_cv2():
    cv2 = pytest.importorskip("cv2")
    np.testing.assert_allclose(
        gaussian_kernel_1d(11, 1.5), cv2.getGaussianKernel(11, 1.5)[:, 0],
        rtol=1e-12)


def test_psnr_basic():
    a, b = _pair()
    mse = np.mean((a - b) ** 2)
    expected = 20 * np.log10(255.0 / np.sqrt(mse))
    assert abs(calculate_psnr(a, b) - expected) < 1e-9


def test_psnr_unit_range_max():
    a, b = _pair(scale=1.0)
    mse = np.mean((a - b) ** 2)
    expected = 20 * np.log10(1.0 / np.sqrt(mse))
    assert abs(calculate_psnr(a, b) - expected) < 1e-9


def test_psnr_identical_inf():
    a, _ = _pair()
    assert calculate_psnr(a, a) == float("inf")


def test_psnr_crop_border():
    a, b = _pair(shape=(32, 32, 3))
    expected = calculate_psnr(a[4:-4, 4:-4], b[4:-4, 4:-4])
    assert abs(calculate_psnr(a, b, crop_border=4) - expected) < 1e-9


def _torch_ssim3d_oracle(img1, img2, max_value):
    """CPU reimplementation of the reference _ssim_3d (psnr_ssim.py:131-182),
    which hardcodes .cuda(); used only as a test oracle."""
    import cv2
    import torch

    kernel = cv2.getGaussianKernel(11, 1.5)
    window = np.outer(kernel, kernel.transpose())
    kernel_3 = cv2.getGaussianKernel(11, 1.5)
    kern3d = torch.tensor(np.stack([window * k for k in kernel_3], axis=0))
    conv3d = torch.nn.Conv3d(1, 1, (11, 11, 11), stride=1, padding=(5, 5, 5),
                             bias=False, padding_mode="replicate")
    conv3d.weight.requires_grad = False
    conv3d.weight[0, 0] = kern3d

    C1 = (0.01 * max_value) ** 2
    C2 = (0.03 * max_value) ** 2
    t1 = torch.tensor(img1.astype(np.float64)).float()
    t2 = torch.tensor(img2.astype(np.float64)).float()

    def g(x):
        return conv3d(x.unsqueeze(0).unsqueeze(0)).squeeze(0).squeeze(0)

    with torch.no_grad():
        mu1, mu2 = g(t1), g(t2)
        mu1_sq, mu2_sq, mu1_mu2 = mu1 ** 2, mu2 ** 2, mu1 * mu2
        s1 = g(t1 ** 2) - mu1_sq
        s2 = g(t2 ** 2) - mu2_sq
        s12 = g(t1 * t2) - mu1_mu2
        ssim_map = ((2 * mu1_mu2 + C1) * (2 * s12 + C2)) / (
            (mu1_sq + mu2_sq + C1) * (s1 + s2 + C2))
    return float(ssim_map.mean())


@pytest.mark.parametrize("scale", [255.0, 1.0])
def test_ssim3d_matches_torch_oracle(scale):
    pytest.importorskip("torch")
    a, b = _pair(shape=(40, 36, 3), seed=1, scale=scale)
    ours = calculate_ssim(a, b)
    oracle = _torch_ssim3d_oracle(a, b, max_value=int(scale))
    # tolerance: f32 separable vs f32 dense 3-D conv associativity noise,
    # far below the 1e-3 SSIM reporting granularity of the paper tables
    assert abs(ours - oracle) < 5e-4, (ours, oracle)


def test_ssim_identical_is_one():
    a, _ = _pair(shape=(24, 24, 3))
    assert abs(calculate_ssim(a, a) - 1.0) < 1e-4


def test_ssim_chw_order():
    a, b = _pair(shape=(32, 28, 3), seed=2)
    v1 = calculate_ssim(a, b)
    v2 = calculate_ssim(a.transpose(2, 0, 1), b.transpose(2, 0, 1),
                        input_order="CHW")
    assert abs(v1 - v2) < 1e-6


def test_ssim_y_channel_against_cv2_oracle():
    cv2 = pytest.importorskip("cv2")
    from refid_tpu.eval.color import to_y_channel

    a, b = _pair(shape=(40, 40, 3), seed=3)
    ya, yb = to_y_channel(a)[..., 0], to_y_channel(b)[..., 0]

    # oracle: reference _ssim_cly (psnr_ssim.py:184-222) via cv2.filter2D
    C1, C2 = (0.01 * 255) ** 2, (0.03 * 255) ** 2
    kernel = cv2.getGaussianKernel(11, 1.5)
    window = np.outer(kernel, kernel.transpose())
    bt = cv2.BORDER_REPLICATE
    i1, i2 = ya.astype(np.float64), yb.astype(np.float64)
    mu1 = cv2.filter2D(i1, -1, window, borderType=bt)
    mu2 = cv2.filter2D(i2, -1, window, borderType=bt)
    s1 = cv2.filter2D(i1 ** 2, -1, window, borderType=bt) - mu1 ** 2
    s2 = cv2.filter2D(i2 ** 2, -1, window, borderType=bt) - mu2 ** 2
    s12 = cv2.filter2D(i1 * i2, -1, window, borderType=bt) - mu1 * mu2
    oracle = (((2 * mu1 * mu2 + C1) * (2 * s12 + C2)) /
              ((mu1 ** 2 + mu2 ** 2 + C1) * (s1 + s2 + C2))).mean()

    ours = calculate_ssim(a, b, test_y_channel=True)
    assert abs(ours - oracle) < 2e-4

"""Tests for matlab imresize, FID core, and path-pairing utils."""

import os

import numpy as np
import pytest

from refid_tpu.eval.matlab import imresize, cubic
from refid_tpu.eval.fid import calculate_fid, extract_statistics
from refid_tpu.data.data_util import (paired_paths_from_folder, scandir,
                                      paired_paths_from_meta_info_file)


def test_cubic_kernel_properties():
    assert cubic(np.array([0.0]))[0] == 1.0
    assert cubic(np.array([1.0]))[0] == 0.0
    assert cubic(np.array([2.0]))[0] == 0.0
    assert abs(cubic(np.array([2.5]))[0]) == 0.0


def test_imresize_matches_reference_impl():
    """Oracle: the reference's matlab_functions.imresize (torch)."""
    from tests.reference_loader import reference_available, \
        load_reference_module
    if not reference_available():
        pytest.skip("reference tree not mounted")
    ref = load_reference_module("basicsr/utils/matlab_functions.py",
                                "basicsr.utils.matlab_functions")
    import torch
    rng = np.random.RandomState(0)
    img = rng.rand(24, 30, 3).astype(np.float32)
    for scale in (0.5, 0.25, 2.0):
        ours = imresize(img, scale)
        theirs = ref.imresize(torch.from_numpy(img.transpose(2, 0, 1)),
                              scale, antialiasing=True).numpy()
        np.testing.assert_allclose(ours.transpose(2, 0, 1), theirs,
                                   atol=1e-5, err_msg=f"scale={scale}")


def test_imresize_identity_at_scale_1():
    rng = np.random.RandomState(1)
    img = rng.rand(16, 16).astype(np.float64)
    out = imresize(img, 1.0)
    np.testing.assert_allclose(out, img, atol=1e-9)


def test_fid_zero_for_identical_gaussians():
    rng = np.random.RandomState(0)
    feats = rng.randn(500, 16)
    mu, sigma = extract_statistics(feats)
    assert abs(calculate_fid(mu, sigma, mu, sigma)) < 1e-6


def test_fid_grows_with_mean_shift():
    rng = np.random.RandomState(1)
    a = rng.randn(500, 8)
    b = a + 2.0
    mu1, s1 = extract_statistics(a)
    mu2, s2 = extract_statistics(b)
    fid = calculate_fid(mu1, s1, mu2, s2)
    assert abs(fid - 8 * 4.0) < 0.5  # ||diff||^2 = 8 * 2^2


def test_paired_paths_from_folder(tmp_path):
    lq = tmp_path / "lq"
    gt = tmp_path / "gt"
    lq.mkdir()
    gt.mkdir()
    for i in range(3):
        (lq / f"{i:03d}.png").write_bytes(b"x")
        (gt / f"{i:03d}.png").write_bytes(b"x")
    pairs = paired_paths_from_folder([str(lq), str(gt)], ["lq", "gt"])
    assert len(pairs) == 3
    assert pairs[0]["lq_path"].endswith("000.png")

    meta = tmp_path / "meta.txt"
    meta.write_text("000.png (1,1,3)\n002.png (1,1,3)\n")
    pairs = paired_paths_from_meta_info_file([str(lq), str(gt)],
                                             ["lq", "gt"], str(meta))
    assert len(pairs) == 2
    assert pairs[1]["gt_path"].endswith("002.png")


def test_scandir_filters_hidden_and_suffix(tmp_path):
    (tmp_path / "a.png").write_bytes(b"")
    (tmp_path / ".hidden.png").write_bytes(b"")
    (tmp_path / "b.txt").write_bytes(b"")
    assert list(scandir(str(tmp_path), suffix=".png")) == ["a.png"]

"""Tests for flow_warp / resize / pixel shuffle / EICA / NIQE."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from refid_tpu.models.arch_util import (
    flow_warp, resize_flow, pixel_unshuffle, pixel_shuffle,
    EventImageChannelAttentionTransformerBlock)


def test_flow_warp_zero_flow_is_identity():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(2, 8, 10, 3).astype(np.float32))
    out = flow_warp(x, jnp.zeros((2, 8, 10, 2)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-6)


def test_flow_warp_integer_shift():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.rand(1, 8, 8, 1).astype(np.float32))
    flow = jnp.full((1, 8, 8, 2), 0.0).at[..., 0].set(1.0)  # shift x by +1
    out = np.asarray(flow_warp(x, flow))
    np.testing.assert_allclose(out[0, :, :-1, 0], np.asarray(x)[0, :, 1:, 0],
                               atol=1e-6)
    np.testing.assert_allclose(out[0, :, -1, 0], 0.0, atol=1e-6)  # zero pad


def test_pixel_shuffle_roundtrip():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.rand(1, 8, 8, 4).astype(np.float32))
    down = pixel_unshuffle(x, 2)
    assert down.shape == (1, 4, 4, 16)
    up = pixel_shuffle(down, 2)
    np.testing.assert_allclose(np.asarray(up), np.asarray(x), atol=1e-7)


def test_resize_flow_scales_magnitude():
    flow = jnp.ones((1, 4, 4, 2))
    out = resize_flow(flow, "shape", (8, 8))
    assert out.shape == (1, 8, 8, 2)
    np.testing.assert_allclose(np.asarray(out), 2.0, atol=1e-5)


def test_eica_block_runs():
    blk = EventImageChannelAttentionTransformerBlock(dim=8, num_heads=2)
    img = jnp.zeros((1, 8, 8, 8))
    ev = jnp.ones((1, 8, 8, 8))
    p = blk.init(jax.random.PRNGKey(0), img, ev)
    out = blk.apply(p, img, ev)
    assert out.shape == img.shape


def test_niqe_runs_if_params_available():
    from refid_tpu.eval.niqe import calculate_niqe
    rng = np.random.RandomState(0)
    img = (rng.rand(256, 256, 3) * 255).astype(np.float32)  # >=4 blocks
    try:
        v = calculate_niqe(img, crop_border=0)
    except FileNotFoundError:
        pytest.skip("niqe pristine params not available")
    assert np.isfinite(v) and v > 0


def test_deform_conv_zero_offset_equals_conv():
    """With zero offsets and unit mask, deform_conv2d == plain conv."""
    from refid_tpu.ops.deform_conv import deform_conv2d
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(1, 10, 12, 4).astype(np.float32))
    w = jnp.asarray(rng.rand(3, 3, 4, 6).astype(np.float32))
    offset = jnp.zeros((1, 10, 12, 18))
    mask = jnp.ones((1, 10, 12, 9))
    out = deform_conv2d(x, offset, w, mask=mask)
    ref = jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_deform_conv_integer_offset_shifts_sampling():
    from refid_tpu.ops.deform_conv import deform_conv2d
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.rand(1, 10, 12, 2).astype(np.float32))
    w = jnp.zeros((3, 3, 2, 2)).at[1, 1].set(jnp.eye(2))  # center tap only
    # offset the center tap by (+1, 0): output samples one row down
    offset = jnp.zeros((1, 10, 12, 18)).at[..., 8].set(1.0)  # tap4 y-offset
    out = np.asarray(deform_conv2d(x, offset, w))
    np.testing.assert_allclose(out[0, :-1], np.asarray(x)[0, 1:], atol=1e-5)


def test_modulated_deform_conv_pack_starts_as_conv():
    """Zero-init offsets/mask: pack == plain conv with sigmoid(0)=0.5 mask."""
    from refid_tpu.ops.deform_conv import ModulatedDeformConvPack
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.rand(1, 8, 8, 4).astype(np.float32))
    m = ModulatedDeformConvPack(features=6)
    p = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(p, x)
    kernel = p["params"]["kernel"]
    ref = jax.lax.conv_general_dilated(
        x, kernel, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC")) * 0.5
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_spatial_cross_attention():
    from refid_tpu.models.arch_util import SpatialCrossAttention
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.rand(1, 64, 16).astype(np.float32))
    y = jnp.asarray(rng.rand(1, 64, 16).astype(np.float32))
    m = SpatialCrossAttention(dim=16, num_heads=4)
    p = m.init(jax.random.PRNGKey(0), x, y)
    assert m.apply(p, x, y).shape == (1, 64, 16)
    # spatial reduction path
    m2 = SpatialCrossAttention(dim=16, num_heads=4, sr_ratio=2)
    p2 = m2.init(jax.random.PRNGKey(0), x, y, 8, 8)
    assert m2.apply(p2, x, y, 8, 8).shape == (1, 64, 16)

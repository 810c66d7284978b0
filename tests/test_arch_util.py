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


def test_deform_conv_hand_computed_golden():
    """Pin the tap layout and (y,x) offset interleave with hand-computed
    values (torchvision semantics: tap k = i*kw+j row-major; offset channel
    2k is DELTA-Y, 2k+1 is DELTA-X; sample = bilinear(p0 + p_k + delta),
    zeros outside; mask multiplies the sampled value)."""
    from refid_tpu.ops.deform_conv import deform_conv2d

    # 3x3 single-channel image, values 1..9 (row-major)
    x = jnp.arange(1.0, 10.0).reshape(1, 3, 3, 1)
    # 2x2 kernel selecting ONLY tap (i=0, j=1): k = 0*2+1 = 1
    w = jnp.zeros((2, 2, 1, 1)).at[0, 1, 0, 0].set(1.0)
    ho = wo = 2  # stride 1, padding 0

    # tap-1 delta-y = +0.5 everywhere (offset channel 2*1 = 2)
    offset = jnp.zeros((1, ho, wo, 8)).at[..., 2].set(0.5)
    out = np.asarray(deform_conv2d(x, offset, w, padding=0))[0, ..., 0]
    # out(oy,ox) = bilinear sample at (oy + 0 + 0.5, ox + 1 + 0)
    #            = 0.5*x[oy, ox+1] + 0.5*x[oy+1, ox+1]
    want = np.array([[0.5 * (2 + 5), 0.5 * (3 + 6)],
                     [0.5 * (5 + 8), 0.5 * (6 + 9)]])
    np.testing.assert_allclose(out, want, atol=1e-6)

    # y/x interleave: the SAME 0.5 written to channel 3 (= tap-1 delta-x)
    # must shift along x instead; at ox=1 the sample column ox+1+0.5 spills
    # past the right edge -> bilinear against implicit zeros
    offset_x = jnp.zeros((1, ho, wo, 8)).at[..., 3].set(0.5)
    out_x = np.asarray(deform_conv2d(x, offset_x, w, padding=0))[0, ..., 0]
    want_x = np.array([[0.5 * (2 + 3), 0.5 * 3],
                       [0.5 * (5 + 6), 0.5 * 6]])
    np.testing.assert_allclose(out_x, want_x, atol=1e-6)

    # modulation mask scales per tap and position
    mask = jnp.full((1, ho, wo, 4), 1.0).at[0, 0, 0, 1].set(0.25)
    out_m = np.asarray(
        deform_conv2d(x, offset, w, mask=mask, padding=0))[0, ..., 0]
    want_m = want.copy()
    want_m[0, 0] *= 0.25
    np.testing.assert_allclose(out_m, want_m, atol=1e-6)

    # negative fractional delta on tap 0 (channels 0/1): delta-y = -0.25 at
    # the top row samples above the image -> 0.75 weight on zeros
    w0 = jnp.zeros((2, 2, 1, 1)).at[0, 0, 0, 0].set(1.0)
    off_neg = jnp.zeros((1, ho, wo, 8)).at[..., 0].set(-0.25)
    out_n = np.asarray(deform_conv2d(x, off_neg, w0, padding=0))[0, ..., 0]
    want_n = np.array([[0.75 * 1, 0.75 * 2],
                       [0.25 * 1 + 0.75 * 4, 0.25 * 2 + 0.75 * 5]])
    np.testing.assert_allclose(out_n, want_n, atol=1e-6)


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

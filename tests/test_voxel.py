"""Golden tests for event voxelization against the reference implementation."""

import numpy as np
import pytest

from refid_tpu.events import (
    events_to_voxel_grid,
    events_to_voxel_grid_jax,
    voxel_norm,
    voxel_norm_np,
    event_reverse,
    filter_event,
)

from tests.reference_loader import reference_available, load_reference_event_util


def _random_events(n, width, height, seed=0, t0=1000.0, t1=2000.0):
    rng = np.random.RandomState(seed)
    t = np.sort(rng.uniform(t0, t1, size=n)).astype(np.float32)
    x = rng.randint(0, width, size=n).astype(np.float32)
    y = rng.randint(0, height, size=n).astype(np.float32)
    p = rng.choice([0.0, 1.0, -1.0], size=n).astype(np.float32)
    return np.stack([t, x, y, p], axis=1)


@pytest.mark.parametrize("num_bins,w,h,n", [(5, 16, 12, 500), (23, 32, 24, 2000)])
def test_voxel_matches_reference(num_bins, w, h, n):
    if not reference_available():
        pytest.skip("reference tree not mounted")
    ref = load_reference_event_util()
    ev = _random_events(n, w, h)
    ours = events_to_voxel_grid(ev.copy(), num_bins, w, h, "CHW")
    theirs = ref.events_to_voxel_grid(ev.copy().astype(np.float64), num_bins, w, h, "CHW")
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-5)


def test_voxel_jax_matches_numpy():
    ev = _random_events(1500, 20, 14, seed=3)
    a = events_to_voxel_grid(ev, 7, 20, 14, "CHW")
    b = np.asarray(events_to_voxel_grid_jax(ev, 7, 20, 14, "CHW"))
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)


def test_voxel_jax_capacity_padding():
    ev = _random_events(100, 8, 8, seed=4)
    a = events_to_voxel_grid(ev, 3, 8, 8)
    b = np.asarray(events_to_voxel_grid_jax(ev, 3, 8, 8, capacity=4096))
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)


def test_voxel_hwc_format():
    ev = _random_events(200, 10, 6, seed=5)
    chw = events_to_voxel_grid(ev, 4, 10, 6, "CHW")
    hwc = events_to_voxel_grid(ev, 4, 10, 6, "HWC")
    np.testing.assert_array_equal(chw.transpose(1, 2, 0), hwc)


def test_voxel_zero_polarity_becomes_negative():
    # single event with p=0 at t=t0: votes -1 into bin 0
    ev = np.array([[10.0, 2.0, 3.0, 0.0]], np.float32)
    v = events_to_voxel_grid(ev, 3, 8, 8)
    assert v[0, 3, 2] == -1.0
    assert np.count_nonzero(v) == 1


def test_voxel_bilinear_time_split():
    # two events: first pins t range; second at 25% of [0, num_bins-1=4] -> t*=1.0
    ev = np.array([[0.0, 0.0, 0.0, 1.0], [100.0, 1.0, 1.0, 1.0]], np.float32)
    v = events_to_voxel_grid(ev, 5, 4, 4)
    assert v[0, 0, 0] == 1.0  # first event entirely in bin 0
    assert v[4, 1, 1] == 1.0  # last event entirely in bin 4 (left vote, dt=0)


def test_voxel_norm_matches_reference():
    if not reference_available():
        pytest.skip("reference tree not mounted")
    import torch
    ref = load_reference_event_util()
    rng = np.random.RandomState(0)
    vox = rng.randn(5, 12, 10).astype(np.float32)
    vox[vox < 0.3] = 0.0
    theirs = ref.voxel_norm(torch.from_numpy(vox.copy())).numpy()
    ours_np = voxel_norm_np(vox.copy())
    ours_jax = np.asarray(voxel_norm(vox.copy()))
    np.testing.assert_allclose(ours_np, theirs, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(ours_jax, theirs, rtol=1e-4, atol=1e-5)


def test_voxel_norm_all_zero_is_identity():
    z = np.zeros((3, 4, 4), np.float32)
    np.testing.assert_array_equal(voxel_norm_np(z), z)
    np.testing.assert_array_equal(np.asarray(voxel_norm(z)), z)


def test_event_reverse_roundtrip_and_semantics():
    ev = _random_events(50, 8, 8, seed=7)
    rev = event_reverse(ev)
    # timestamps ascending, span preserved
    assert np.all(np.diff(rev[:, 0]) >= 0)
    assert rev[0, 0] == 0.0
    # double reverse restores x/y/p and relative times
    rev2 = event_reverse(rev)
    np.testing.assert_allclose(rev2[:, 1:], ev[:, 1:], atol=1e-5)
    np.testing.assert_allclose(rev2[:, 0] - rev2[0, 0], ev[:, 0] - ev[0, 0],
                               atol=1e-3)


def test_filter_event():
    t = np.repeat(np.arange(10.0), 3)[:, None]
    x = np.arange(30.0)
    y = x + 1
    p = np.ones(30)
    x1, y1, p1, t1 = filter_event(x, y, p, t, s_e_index=[2, 4])
    assert len(x1) == 9
    assert x1[0] == 6.0 and x1[-1] == 14.0


def test_native_voxelizer_matches_numpy():
    from refid_tpu.ops.native import voxelize_native_or_none
    ev = _random_events(3000, 40, 30, seed=11)
    out = voxelize_native_or_none(ev, 7, 40, 30)
    if out is None:
        pytest.skip("no C++ toolchain available")
    import os
    os.environ["REFID_TPU_NO_NATIVE"] = "1"
    try:
        ref = events_to_voxel_grid(ev, 7, 40, 30)
    finally:
        del os.environ["REFID_TPU_NO_NATIVE"]
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_voxelize_device_matches_scatter():
    """The fully on-device Pallas voxelizer (sort + band boundaries +
    mask-aligned one-hot MXU kernel, interpret mode on CPU) must match the
    XLA-scatter voxelizer on a padded event buffer, including the padding
    and out-of-range handling."""
    import jax.numpy as jnp
    from refid_tpu.events.voxel import _voxelize_padded
    from refid_tpu.events.voxel_pallas import voxelize_device

    rng = np.random.RandomState(0)
    cap, n_valid, bins, w, h = 2048, 1900, 5, 160, 48
    ev = np.zeros((cap, 4), np.float32)
    ev[:n_valid, 0] = np.sort(rng.rand(n_valid))
    ev[:n_valid, 1] = rng.randint(0, w, n_valid)
    ev[:n_valid, 2] = rng.randint(0, h, n_valid)
    ev[:n_valid, 3] = rng.randint(0, 2, n_valid)

    ref = np.asarray(_voxelize_padded(jnp.asarray(ev), jnp.int32(n_valid),
                                      bins, w, h))
    got = np.asarray(voxelize_device(jnp.asarray(ev), jnp.int32(n_valid),
                                     num_bins=bins, width=w, height=h,
                                     chunk=512, interpret=True))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-6)

    # empty stream
    got0 = np.asarray(voxelize_device(
        jnp.asarray(np.zeros((512, 4), np.float32)), jnp.int32(0),
        num_bins=bins, width=w, height=h, chunk=512, interpret=True))
    assert np.all(got0 == 0)

"""Fused Pallas ConvResidualBlocks trunk vs the XLA reference (interpret
mode so it runs on the CPU test platform)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from refid_tpu.ops.fused_trunk import fused_trunk, fused_trunk_reference


def _inputs(h, w, c, dtype=np.float32, seed=0):
    rng = np.random.RandomState(seed)
    x = jnp.asarray((rng.randn(h, w, c) * 0.5).astype(dtype))
    s = jnp.asarray((rng.randn(h, w, c) * 0.5).astype(dtype))
    wi = jnp.asarray((rng.randn(3, 3, 2 * c, c) * 0.1).astype(dtype))
    w1 = jnp.asarray((rng.randn(3, 3, c, c) * 0.1).astype(dtype))
    w2 = jnp.asarray((rng.randn(3, 3, c, c) * 0.1).astype(dtype))
    bi, b1, b2 = (jnp.asarray((rng.randn(c) * 0.1).astype(dtype))
                  for _ in range(3))
    return x, s, wi, bi, w1, b1, w2, b2


@pytest.mark.parametrize("h,w,c,tile", [
    (40, 52, 16, (8, 32)),     # multiple row+col bands, ragged edges
    (37, 45, 8, (8, 32)),      # width < two col bands
    (16, 16, 8, (16, 128)),    # single tile larger than the image
    (33, 129, 8, (16, 64)),    # ragged in both dims
])
def test_fused_trunk_matches_reference(h, w, c, tile):
    args = _inputs(h, w, c)
    ref = fused_trunk_reference(*args)
    out = fused_trunk(*args, tile=tile, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_fused_trunk_bf16():
    """bf16 compute with f32 accumulation: compare against the XLA trunk
    run in bf16 (same serving numerics)."""
    args32 = _inputs(24, 40, 16, seed=1)
    args = [a.astype(jnp.bfloat16) for a in args32]
    ref = fused_trunk_reference(*args).astype(np.float32)
    out = fused_trunk(*args, tile=(8, 32), interpret=True).astype(np.float32)
    # both accumulate f32 and round intermediates to bf16; bit differences
    # come only from summation order inside the accumulator
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=3e-2, rtol=3e-2)
    # and stay close to the f32 math
    f32 = fused_trunk_reference(*args32)
    assert np.abs(np.asarray(out) - np.asarray(f32)).max() < 0.1


def test_fused_trunk_auto_tile():
    args = _inputs(30, 70, 8, seed=2)
    ref = fused_trunk_reference(*args)
    out = fused_trunk(*args, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)

"""Fused Pallas ConvResidualBlocks trunk vs the XLA reference (interpret
mode so it runs on the CPU test platform)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from refid_tpu.ops.fused_trunk import fused_trunk, fused_trunk_reference


@pytest.mark.parametrize("h,w,c,bh", [(40, 52, 16, 8), (37, 45, 8, 8),
                                      (16, 16, 8, 16)])
def test_fused_trunk_matches_reference(h, w, c, bh):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(h, w, 2 * c).astype(np.float32) * 0.5)
    wi = jnp.asarray(rng.randn(3, 3, 2 * c, c).astype(np.float32) * 0.1)
    w1 = jnp.asarray(rng.randn(3, 3, c, c).astype(np.float32) * 0.1)
    w2 = jnp.asarray(rng.randn(3, 3, c, c).astype(np.float32) * 0.1)
    bi, b1, b2 = (jnp.asarray(rng.randn(c).astype(np.float32) * 0.1)
                  for _ in range(3))
    ref = fused_trunk_reference(x, wi, bi, w1, b1, w2, b2)
    out = fused_trunk(x, wi, bi, w1, b1, w2, b2, bh=bh, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)

"""Spatial (halo) sharding correctness: the full model forward over a
spatially-sharded mesh must equal the unsharded forward — GSPMD inserts the
conv halo exchanges (this framework's replacement for the reference's
host-side `grids` tiling at high resolution)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from refid_tpu.models import FinalBidirectionAttenfusion, RefidConfig
from refid_tpu.parallel import make_mesh, shard_batch


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_spatially_sharded_forward_matches_unsharded():
    cfg = RefidConfig(img_chn=6, ev_chn=2, num_encoders=2,
                      base_num_channels=4, num_residual_blocks=1)
    model = FinalBidirectionAttenfusion(cfg)
    rng = np.random.RandomState(0)
    b, t, h, w = 2, 3, 32, 32
    x = rng.randn(b, h, w, cfg.img_chn).astype(np.float32)
    ev = rng.randn(b, t, h, w, cfg.ev_chn).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(x),
                        jnp.asarray(ev))

    want = np.asarray(model.apply(params, jnp.asarray(x), jnp.asarray(ev)))

    mesh = make_mesh(data=2, spatial=4)
    with mesh:
        batch = shard_batch({"x": x, "ev": ev}, mesh,
                            spatial_axes={4: 1, 5: 2})
        got = np.asarray(jax.jit(model.apply)(params, batch["x"],
                                              batch["ev"]))
    np.testing.assert_allclose(got, want, atol=2e-5)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
@pytest.mark.slow
def test_spatially_sharded_gradients_match():
    from refid_tpu.train.losses import charbonnier_loss

    cfg = RefidConfig(img_chn=6, ev_chn=2, num_encoders=2,
                      base_num_channels=4, num_residual_blocks=1)
    model = FinalBidirectionAttenfusion(cfg)
    rng = np.random.RandomState(1)
    b, t, h, w = 2, 2, 16, 16
    x = rng.randn(b, h, w, cfg.img_chn).astype(np.float32)
    ev = rng.randn(b, t, h, w, cfg.ev_chn).astype(np.float32)
    gt = rng.randn(b, t, h, w, 3).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(x),
                        jnp.asarray(ev))

    def loss_fn(p, x, ev, gt):
        return charbonnier_loss(model.apply(p, x, ev), gt)

    g_ref = jax.grad(loss_fn)(params, jnp.asarray(x), jnp.asarray(ev),
                              jnp.asarray(gt))
    mesh = make_mesh(data=2, spatial=4)
    with mesh:
        batch = shard_batch({"x": x, "ev": ev, "gt": gt}, mesh,
                            spatial_axes={4: 1, 5: 2})
        g_sh = jax.jit(jax.grad(loss_fn))(params, batch["x"], batch["ev"],
                                          batch["gt"])
    for a, b_ in zip(jax.tree_util.tree_leaves(g_ref),
                     jax.tree_util.tree_leaves(g_sh)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=3e-5)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_spatially_sharded_packed_serving_matches():
    """The PACKED serving forward (serve/fast_forward.py) under a spatial
    mesh == unsharded: GSPMD shards the width-folded/s2d graph too, so
    multi-chip serving (latency scaling over ICI) uses the same fast path
    single-chip serving does."""
    from refid_tpu.serve import fast_forward

    cfg = RefidConfig(img_chn=6, ev_chn=2, num_encoders=2,
                      base_num_channels=4, num_residual_blocks=1)
    model = FinalBidirectionAttenfusion(cfg)
    rng = np.random.RandomState(2)
    b, t, h, w = 2, 3, 32, 32
    x = rng.randn(b, h, w, cfg.img_chn).astype(np.float32)
    ev = rng.randn(b, t, h, w, cfg.ev_chn).astype(np.float32)
    params = model.init(jax.random.PRNGKey(2), jnp.asarray(x),
                        jnp.asarray(ev))

    want = np.asarray(fast_forward(params, cfg, jnp.asarray(x),
                                   jnp.asarray(ev), packed=True))

    mesh = make_mesh(data=2, spatial=4)
    with mesh:
        batch = shard_batch({"x": x, "ev": ev}, mesh,
                            spatial_axes={4: 1, 5: 2})
        got = np.asarray(jax.jit(
            lambda p, xx, ee: fast_forward(p, cfg, xx, ee, packed=True))(
                params, batch["x"], batch["ev"]))
    np.testing.assert_allclose(got, want, atol=2e-5)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_pipeline_mesh_serving_matches_single_device():
    """BlurVFIPipeline(mesh=...): one stream spatially sharded across the
    mesh == the unsharded pipeline (multi-chip serving latency scaling)."""
    from refid_tpu.pipeline import BlurVFIPipeline

    cfg = RefidConfig(img_chn=8, ev_chn=2, num_encoders=2,
                      base_num_channels=8, num_residual_blocks=1)
    model = FinalBidirectionAttenfusion(cfg)
    h, w, m, n = 64, 64, 2, 1
    rng = np.random.RandomState(3)
    params = model.init(jax.random.PRNGKey(3),
                        jnp.zeros((1, h, w, cfg.img_chn)),
                        jnp.zeros((1, 3, h, w, cfg.ev_chn)))
    blur0 = rng.rand(h, w, 3).astype(np.float32)
    blur1 = rng.rand(h, w, 3).astype(np.float32)
    ne = 2000
    events = np.stack([np.sort(rng.rand(ne)),
                       rng.randint(0, w, ne).astype(np.float32),
                       rng.randint(0, h, ne).astype(np.float32),
                       rng.randint(0, 2, ne).astype(np.float32)],
                      axis=1).astype(np.float32)

    want = np.asarray(BlurVFIPipeline(params, cfg, m=m, n=n)(
        blur0, blur1, events))
    mesh = make_mesh(data=2, spatial=4)
    got = np.asarray(BlurVFIPipeline(params, cfg, m=m, n=n, mesh=mesh)(
        blur0, blur1, events))
    np.testing.assert_allclose(got, want, atol=2e-5)

"""serve/host_params: the shared no-relay param builders used by every
bench/profile/quality script (consolidated in round 5)."""

import numpy as np


def test_host_built_matches_real_init_structure():
    import jax
    import jax.numpy as jnp
    from refid_tpu.models import FinalBidirectionAttenfusion, RefidConfig
    from refid_tpu.serve.host_params import (cpu_init_params,
                                             host_built_params)

    cfg = RefidConfig(base_num_channels=8, num_encoders=2, img_chn=8)
    model = FinalBidirectionAttenfusion(cfg)
    a1 = (jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, cfg.img_chn)),
          jnp.zeros((1, 2, 32, 32, cfg.ev_chn)))
    fast = host_built_params(model.init, *a1)
    real = cpu_init_params(model.init, *a1[1:])
    assert (jax.tree_util.tree_structure(fast)
            == jax.tree_util.tree_structure(real))
    for f, r in zip(jax.tree_util.tree_leaves(fast),
                    jax.tree_util.tree_leaves(real)):
        assert f.shape == r.shape and f.dtype == r.dtype
    # deterministic: same seed -> same values
    again = host_built_params(model.init, *a1)
    for f, g in zip(jax.tree_util.tree_leaves(fast),
                    jax.tree_util.tree_leaves(again)):
        np.testing.assert_array_equal(np.asarray(f), np.asarray(g))
    # and the model runs with either tree
    out = model.apply(fast, np.zeros((1, 32, 32, cfg.img_chn), np.float32),
                      np.zeros((1, 2, 32, 32, cfg.ev_chn), np.float32))
    assert np.isfinite(np.asarray(out)).all()

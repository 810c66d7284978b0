"""EVHINet forward parity vs the reference SingleMultiConnectEVHINet."""

import numpy as np
import pytest

from tests.reference_loader import (reference_available, _install_stubs,
                                    load_reference_module)

pytestmark = pytest.mark.skipif(not reference_available(),
                                reason="reference tree not mounted")


def _load_ref_evhinet():
    import sys
    import types
    _install_stubs()
    # arch_util imports timm (absent): stub the bits it names
    timm_layers = types.ModuleType("timm.models.layers")
    timm_layers.DropPath = object
    timm_layers.trunc_normal_ = lambda *a, **k: None
    timm_layers.to_2tuple = lambda x: (x, x)
    timm = types.ModuleType("timm")
    timm_models = types.ModuleType("timm.models")
    sys.modules.setdefault("timm", timm)
    sys.modules.setdefault("timm.models", timm_models)
    sys.modules.setdefault("timm.models.layers", timm_layers)
    load_reference_module("basicsr/models/archs/arch_util.py",
                          "basicsr.models.archs.arch_util")
    return load_reference_module(
        "basicsr/models/archs/single_multiconnect_evhinet_arch.py",
        "basicsr.models.archs.single_multiconnect_evhinet_arch")


def test_evhinet_forward_parity():
    import torch
    import jax
    import jax.numpy as jnp

    mod = _load_ref_evhinet()
    torch.manual_seed(0)
    tnet = mod.SingleMultiConnectEVHINet(in_chn=3, ev_chn=6, wf=8, depth=3,
                                         fac_place=2)
    tnet.eval()

    from refid_tpu.models.evhinet import EVHINet
    from refid_tpu.models.convert import convert_evhinet_state_dict

    jnet = EVHINet(in_chn=3, ev_chn=6, wf=8, depth=3, fac_place=2)
    params = convert_evhinet_state_dict(tnet.state_dict())

    # param tree must match an actual init exactly
    import flax
    init = jnet.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)),
                     jnp.zeros((1, 16, 16, 6)))
    got = set(flax.traverse_util.flatten_dict(params["params"], sep="/"))
    want = set(flax.traverse_util.flatten_dict(init["params"], sep="/"))
    assert got == want, (sorted(want - got), sorted(got - want))

    rng = np.random.RandomState(0)
    x = rng.randn(1, 3, 32, 32).astype(np.float32)
    ev = rng.randn(1, 6, 32, 32).astype(np.float32)
    with torch.no_grad():
        tout = tnet(torch.from_numpy(x), torch.from_numpy(ev))[0].numpy()
    jout = np.asarray(jnet.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)),
                                 jnp.asarray(ev.transpose(0, 2, 3, 1))))
    diff = np.abs(jout.transpose(0, 3, 1, 2) - tout).max()
    assert diff < 2e-4, diff


def test_evhinet_from_registry_and_5d_voxel():
    import jax
    import jax.numpy as jnp
    from refid_tpu.core.registry import ARCHS
    import refid_tpu.models.archs  # noqa: F401

    net = ARCHS.get("SingleMultiConnectEVHINet")(
        {"in_chn": 3, "ev_chn": 6, "wf": 8, "depth": 3})
    # 5-D (b,t,h,w,c) voxels from the generic task plumbing get flattened
    p = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)),
                 jnp.zeros((1, 3, 16, 16, 2)))
    out = net.apply(p, jnp.zeros((1, 16, 16, 3)),
                    jnp.zeros((1, 3, 16, 16, 2)))
    assert out.shape == (1, 16, 16, 3)

"""Forward parity of the ablation-arch analogs against the torch reference
files with CONVERTED WEIGHTS — the full oracle, for every (arch x
recurrent_block_type) combo whose torch implementation actually runs
(see the breakage map in refid_tpu/models/archs.py)."""

import numpy as np
import pytest

from tests.reference_loader import reference_available, load_reference_archs, \
    load_reference_module

pytestmark = pytest.mark.skipif(not reference_available(),
                                reason="reference tree not mounted")

KW = dict(img_chn=6, ev_chn=2, out_chn=3, num_encoders=2,
          base_num_channels=8, num_residual_blocks=1)

RUNNABLE = [
    ("UNetRecurrent", "XXNet_arch", "UNetRecurrent", "convlstm", False),
    ("UNetRecurrent", "XXNet_arch", "UNetRecurrent", "convgru", False),
    ("UNetDecoderRecurrent", "XXNet_decoder_recurrent_arch",
     "UNetDecoderRecurrent", "simpleconv", True),
    ("UNetDecoderRecurrent", "XXNet_decoder_recurrent_arch",
     "UNetDecoderRecurrent", "simpleconvThendown", True),
    ("UNetDecoderRecurrent", "XXNet_decoder_recurrent_arch",
     "UNetDecoderRecurrent", "convlstm", True),
    ("UNetDecoderRecurrent", "XXNet_decoder_recurrent_arch",
     "UNetDecoderRecurrent", "convgru", True),
    ("BidirUNetRecurrent", "XXNet_bidirection_arch", "BidirUNetRecurrent",
     "simpleconv", True),
    ("UNetDecoderRecurrentBidirection",
     "XXNet_decoder_recurrent_bidirection_arch",
     "UNetDecoderRecurrentBidirection", "simpleconv", True),
    ("UNetDecoderRecurrentBidirection",
     "XXNet_decoder_recurrent_bidirection_arch",
     "UNetDecoderRecurrentBidirection", "simpleconvThendown", True),
    ("UNetPSDecoderRecurrent", "XXNet_ps_decoder_recurrent_arch",
     "UNetPSDecoderRecurrent", "convlstm", False),
    ("UNetPSDecoderRecurrent", "XXNet_ps_decoder_recurrent_arch",
     "UNetPSDecoderRecurrent", "convgru", False),
]


@pytest.mark.parametrize("name,fn,cls,rbt,has_nb", RUNNABLE,
                         ids=[f"{c[0]}-{c[3]}" for c in RUNNABLE])
def test_ablation_forward_parity(name, fn, cls, rbt, has_nb):
    import torch
    import jax.numpy as jnp
    from refid_tpu.core.registry import ARCHS
    import refid_tpu.models.archs  # noqa: F401
    from refid_tpu.models.convert import convert_state_dict

    load_reference_archs()
    mod = load_reference_module(f"basicsr/models/archs/{fn}.py",
                                f"basicsr.models.archs.{fn}")
    torch.manual_seed(0)
    tkw = dict(KW, recurrent_block_type=rbt)
    if has_nb:
        tkw["num_block"] = 1
    tnet = getattr(mod, cls)(**tkw)
    tnet.eval()

    jnet = ARCHS.get(name)(dict(KW, num_block=1, recurrent_block_type=rbt))
    params = convert_state_dict(tnet.state_dict(), jnet.cfg)

    rng = np.random.RandomState(0)
    b, t, h, w = 1, 3, 16, 16
    x = rng.randn(b, 2, 3, h, w).astype(np.float32)
    ev = rng.randn(b, t, 2, h, w).astype(np.float32)
    with torch.no_grad():
        tout = tnet(torch.from_numpy(x), torch.from_numpy(ev)).numpy()

    jout = np.asarray(jnet.apply(
        params, jnp.asarray(np.transpose(x, (0, 1, 3, 4, 2))),
        jnp.asarray(np.transpose(ev, (0, 1, 3, 4, 2)))))
    jout = np.transpose(jout, (0, 1, 4, 2, 3))
    assert jout.shape == tout.shape
    diff = np.abs(jout - tout).max()
    assert diff < 2e-4, f"{name}/{rbt} max abs diff {diff}"

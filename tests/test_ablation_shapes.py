"""Structural verification of the ablation-arch analogs: for every
registered XXNet_* lineage name, the flag-built flax param tree must match
the corresponding torch file's state_dict — same parameter count and the
same multiset of canonical kernel shapes.

Canonical shape: (sorted kernel dims..., sorted channel dims...) so that
torch OIHW / transposed IOHW and flax HWIO all compare equal.

Documented exemptions (dead or broken torch params, cited in
refid_tpu/models/archs.py's breakage map) are subtracted from the torch
side before comparison.
"""

import collections

import numpy as np
import pytest

from tests.reference_loader import reference_available, load_reference_archs, \
    load_reference_module

pytestmark = pytest.mark.skipif(not reference_available(),
                                reason="reference tree not mounted")

KW = dict(img_chn=6, ev_chn=2, out_chn=3, num_encoders=2,
          base_num_channels=8, num_residual_blocks=1)

# (arch registry name, torch module file, torch class, recurrent_block_type,
#  exempt-prefix list, torch ctor accepts num_block)
CASES = [
    ("UNetRecurrent", "XXNet_arch", "UNetRecurrent", "convlstm", [], False),
    ("UNetRecurrent", "XXNet_arch", "UNetRecurrent", "convgru", [], False),
    ("UNetDecoderRecurrent", "XXNet_decoder_recurrent_arch",
     "UNetDecoderRecurrent", "simpleconv", [], True),
    ("UNetDecoderRecurrent", "XXNet_decoder_recurrent_arch",
     "UNetDecoderRecurrent", "simpleconvThendown", [], True),
    ("UNetDecoderRecurrent", "XXNet_decoder_recurrent_arch",
     "UNetDecoderRecurrent", "convlstm", [], True),
    ("UNetDecoderRecurrent", "XXNet_decoder_recurrent_arch",
     "UNetDecoderRecurrent", "convgru", [], True),
    ("BidirUNetRecurrent", "XXNet_bidirection_arch", "BidirUNetRecurrent",
     "simpleconv", [], True),
    # bidirection/allbidirection build bottleneck resblocks but never call
    # them in forward -> dead torch params (archs.py breakage map)
    ("UNetDecoderRecurrentBidirection",
     "XXNet_decoder_recurrent_bidirection_arch",
     "UNetDecoderRecurrentBidirection", "simpleconv", ["resblocks."], True),
    ("UNetDecoderRecurrentBidirection",
     "XXNet_decoder_recurrent_bidirection_arch",
     "UNetDecoderRecurrentBidirection", "simpleconvThendown",
     ["resblocks."], True),
    ("UNetDecoderRecurrentAllBidirection",
     "XXNet_decoder_recurrent_allbidirection_arch",
     "UNetDecoderRecurrentAllBidirection", "simpleconvThendown",
     ["resblocks."], True),
    ("UNetPSDecoderRecurrent", "XXNet_ps_decoder_recurrent_arch",
     "UNetPSDecoderRecurrent", "convlstm", [], False),
    # siamese: torch head_img is declared img_chn-in but fed the 3-channel
    # per-frame half (runtime-broken); ours is per-frame -> exempt both
    ("UNetDecoderRecurrentSiameseImg", "XXNet_decoder_recurrent_siamese_arch",
     "UNetDecoderRecurrentSiameseImg", "simpleconvThendown",
     ["head_img."], True),
    # noatten additionally builds SE fusions whose use is commented out
    ("UNetDecoderRecurrentSiameseImgNoAtten",
     "XXNet_decoder_recurrent_siamese_noatten_arch",
     "UNetDecoderRecurrentSiameseImgNoAtten", "simpleconvThendown",
     ["head_img.", "img_ev_fusions."], True),
]


def _canon(shape):
    if len(shape) == 4:
        return tuple(sorted(shape[:2]) + sorted(shape[2:]))
    return tuple(shape)


def _canon_torch(shape):
    # torch conv weights are (O, I, kh, kw) / transposed (I, O, kh, kw)
    if len(shape) == 4:
        return tuple(sorted(shape[2:]) + sorted(shape[:2]))
    return tuple(shape)


def _flax_exempt(name, key):
    """Flax-side params with no torch counterpart for this arch."""
    if name.startswith("UNetDecoderRecurrentSiamese") and "head_img" in key:
        return True  # the fixed 3-channel head (torch's is broken, exempted)
    return False


@pytest.mark.parametrize("name,fn,cls,rbt,exempt,has_nb", CASES,
                         ids=[f"{c[0]}-{c[3]}" for c in CASES])
def test_ablation_param_tree_matches_torch(name, fn, cls, rbt, exempt,
                                           has_nb):
    import torch
    import jax
    import jax.numpy as jnp
    import flax
    from refid_tpu.core.registry import ARCHS
    import refid_tpu.models.archs  # noqa: F401

    load_reference_archs()
    mod = load_reference_module(f"basicsr/models/archs/{fn}.py",
                                f"basicsr.models.archs.{fn}")
    tkw = dict(KW, recurrent_block_type=rbt)
    if has_nb:
        tkw["num_block"] = 1
    tnet = getattr(mod, cls)(**tkw)
    sd = {k: tuple(v.shape) for k, v in tnet.state_dict().items()
          if not any(k.startswith(p) for p in exempt)}

    jnet = ARCHS.get(name)(dict(KW, num_block=1, recurrent_block_type=rbt))
    params = jnet.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 6)),
                       jnp.zeros((1, 2, 16, 16, 2)))
    flat = {k: v for k, v in flax.traverse_util.flatten_dict(
        params["params"], sep="/").items()
        if not _flax_exempt(name, k)}

    t_shapes = collections.Counter(_canon_torch(s) for s in sd.values())
    j_shapes = collections.Counter(_canon(tuple(v.shape))
                                   for v in flat.values())
    t_count = sum(int(np.prod(s)) for s in sd.values())
    j_count = sum(int(np.prod(v.shape)) for v in flat.values())

    assert t_count == j_count, (
        f"param count mismatch: torch {t_count} vs flax {j_count}; "
        f"torch-only {dict(t_shapes - j_shapes)}, "
        f"flax-only {dict(j_shapes - t_shapes)}")
    assert t_shapes == j_shapes, (
        f"shape multiset mismatch: torch-only {dict(t_shapes - j_shapes)}, "
        f"flax-only {dict(j_shapes - t_shapes)}")

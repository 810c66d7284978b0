"""Arch registry entries: reference ``network_g.type`` -> flax module builder.

Each builder takes the ``network_g`` option dict and returns a flax Module.
The ablation lineage of the final architecture (unidirectional, no-attention,
decoder variants — XXNet_*_arch.py) is expressed as config switches on the
same module rather than file copies.

Reference-breakage map (verified by instantiating + running every torch
arch x recurrent_block_type combo in this environment; the per-arch notes
below cite the breaking line):

* ``UNetRecurrent`` / ``UNetPSDecoderRecurrent`` run ONLY with
  convlstm/convgru — their 'simpleconv' branch passes a
  ``recurrent_block_type`` kwarg SimpleRecurrentConvLayer doesn't accept
  (XXNet_arch.py:100-103), and 'simpleconvThendown' hits the
  RecurrentConvLayer assert (recurrent_sub_modules.py:97).
* ``BidirUNetRecurrent`` runs ONLY with 'simpleconv' — convlstm/convgru
  route to RecurrentConvLayer whose forward takes no bidirectional state
  (3 args, called with 4: XXNet_bidirection_arch.py forward).
* ``UNetDecoderRecurrentAllBidirection`` NEVER runs: its backward pass
  feeds decoder outputs of frame k as encoder inputs of frame k-1
  (resolution mismatch at the first skip-cat).
* ``UNetDecoderRecurrentSiameseImg{,NoAtten}`` NEVER run: head_img is
  declared with img_chn input channels but fed the per-frame 3-channel
  half after the siamese rearrange (siamese arch :149-158).
* ``UNetDecoderRecurrentBidirection`` (and AllBidirection) BUILD bottleneck
  resblocks but never call them in forward — dead params, omitted here
  (RefidConfig.apply_resblocks=False).

Where the reference class runs, the flag-built analog below has an
identical parameter tree (counts and shapes — pinned by
tests/test_ablation_shapes.py); where it is broken, the analog implements
the intended semantics with the fix noted.
"""

from __future__ import annotations

from refid_tpu.core.registry import ARCHS
from refid_tpu.models.refid import FinalBidirectionAttenfusion, RefidConfig

# reference recurrent_block_type -> (encoder_stage, recurrent_cell)
_STAGE_BY_RBT = {
    "simpleconvThendown": ("then_down", "simpleconv"),
    "simpleconv": ("conv_down", "simpleconv"),
    "convlstm": ("rec_conv", "convlstm"),
    "convgru": ("rec_conv", "convgru"),
}


def _refid_cfg(opt: dict, **overrides) -> RefidConfig:
    kw = dict(
        img_chn=opt["img_chn"],
        ev_chn=opt["ev_chn"],
        out_chn=opt.get("out_chn", 3),
        num_encoders=opt.get("num_encoders", 3),
        base_num_channels=opt.get("base_num_channels", 32),
        num_block=opt.get("num_block", 1),
        num_residual_blocks=opt.get("num_residual_blocks", 2),
        use_first_dcn=opt.get("use_first_dcn", False),
        aliased_backward_states=opt.get("aliased_backward_states", True),
        remat=opt.get("remat", False),
        remat_policy=opt.get("remat_policy", "all"),
        siamese_fusion=opt.get("siamese_fusion"),
    )
    kw.update(overrides)
    if opt.get("compute_dtype") == "bfloat16":
        import jax.numpy as jnp
        kw["dtype"] = jnp.bfloat16
    return RefidConfig(**kw)


def _ablation_cfg(opt: dict, default_rbt: str, **overrides) -> RefidConfig:
    """Shared ablation-lineage wiring: the encoder stage class follows the
    YAML ``recurrent_block_type`` exactly like the reference if/elif chains
    (e.g. XXNet_decoder_recurrent_arch.py:98-112), and no ablation lineage
    adds the image feature at the bottleneck (that is a flagship-only
    behavior, XXNet_final_attenfusion_arch.py:199-203)."""
    stage, cell = _STAGE_BY_RBT[opt.get("recurrent_block_type", default_rbt)]
    base = dict(atten_fuse_at=(), encoder_stage=stage, recurrent_cell=cell,
                bottleneck_img_add=False)
    base.update(overrides)
    return _refid_cfg(opt, **base)


@ARCHS.register("FinalBidirectionAttenfusion")
def final_bidirection_attenfusion(opt: dict):
    """The production network (XXNet_final_attenfusion_arch.py:81-218)."""
    return FinalBidirectionAttenfusion(_refid_cfg(opt))


@ARCHS.register("FinalBidirection")
def final_bidirection(opt: dict):
    """Flagship minus EGACA (additive fusion everywhere) — this repo's own
    sensible variant, NOT a torch file port; keeps the flagship bottleneck."""
    return FinalBidirectionAttenfusion(_refid_cfg(opt, atten_fuse_at=()))


@ARCHS.register("SingleMultiConnectEVHINet")
def single_multiconnect_evhinet(opt: dict):
    """Event-guided HINet for single-image deblurring
    (single_multiconnect_evhinet_arch.py:66-167)."""
    from refid_tpu.models.evhinet import EVHINet
    kw = dict(in_chn=opt.get("in_chn", 3), ev_chn=opt.get("ev_chn", 6),
              wf=opt.get("wf", 64), depth=opt.get("depth", 3),
              fac_place=opt.get("fac_place", 2),
              hin_left=opt.get("hin_position_left", 0),
              hin_right=opt.get("hin_position_right", 4))
    if opt.get("compute_dtype") == "bfloat16":
        import jax.numpy as jnp
        kw["dtype"] = jnp.bfloat16
    return EVHINet(**kw)


# --- ablation lineage ---------------------------------------------------
# The reference keeps each paper ablation as a separate arch FILE
# (XXNet_arch.py, XXNet_decoder_recurrent*_arch.py, XXNet_ps_*).  Here they
# are flag combinations on the final architecture with parameter trees
# matching the torch files (tests/test_ablation_shapes.py) wherever the
# torch file itself is constructible/runnable — see the breakage map above.

@ARCHS.register("UNetRecurrent")
def unet_recurrent(opt: dict):
    """Unidirectional RecurrentConvLayer encoder, non-recurrent bilinear-k5
    decoder (XXNet_arch.py:76; runnable only as convlstm/convgru)."""
    return FinalBidirectionAttenfusion(_ablation_cfg(
        opt, "convlstm", bidirectional=False, decoder_type="upsample_conv"))


@ARCHS.register("UNetDecoderRecurrent")
def unet_decoder_recurrent(opt: dict):
    """Unidirectional + recurrent decoder
    (XXNet_decoder_recurrent_arch.py:77)."""
    return FinalBidirectionAttenfusion(_ablation_cfg(
        opt, "convlstm", bidirectional=False))


@ARCHS.register("BidirUNetRecurrent")
def bidir_unet_recurrent(opt: dict):
    """Bidirectional encoder, non-recurrent decoder
    (XXNet_bidirection_arch.py:76; runnable only as 'simpleconv')."""
    return FinalBidirectionAttenfusion(_ablation_cfg(
        opt, "simpleconv", decoder_type="upsample_conv"))


@ARCHS.register("UNetDecoderRecurrentBidirection")
def unet_decoder_recurrent_bidir(opt: dict):
    """Bidirectional + recurrent decoder, additive fusion
    (XXNet_decoder_recurrent_bidirection_arch.py:77).  The torch file's
    bottleneck resblocks are dead params (built, never called) — omitted."""
    return FinalBidirectionAttenfusion(_ablation_cfg(
        opt, "simpleconvThendown", apply_resblocks=False))


@ARCHS.register("UNetDecoderRecurrentAllBidirection")
def unet_decoder_recurrent_allbidir(opt: dict):
    """Bidirectional encoder AND decoder
    (XXNet_decoder_recurrent_allbidirection_arch.py:83).  The torch arch is
    runtime-broken (see module docstring) and its decoder fuse conv output
    is discarded (recurrent_sub_modules.py:400-404); this analog implements
    the intended semantics: backward decoder states fused into the forward
    decoders via the 1x1 conv."""
    return FinalBidirectionAttenfusion(_ablation_cfg(
        opt, "simpleconvThendown", apply_resblocks=False, bidir_decoder=True))


@ARCHS.register("UNetPSDecoderRecurrent")
def unet_ps_decoder_recurrent(opt: dict):
    """Pixel-shuffle recurrent decoder (XXNet_ps_decoder_recurrent_arch.py;
    runnable only as convlstm/convgru)."""
    return FinalBidirectionAttenfusion(_ablation_cfg(
        opt, "convlstm", bidirectional=False,
        decoder_type="pixelshuffle_recurrent"))


@ARCHS.register("UNetDecoderRecurrentSiameseImg")
def unet_decoder_recurrent_siamese(opt: dict):
    """Siamese image encoder: each input frame encoded separately with
    shared weights, per-scale SE-gated fusion
    (XXNet_decoder_recurrent_siamese_arch.py:79).  The torch file is
    runtime-broken (head_img channel mismatch); this analog fixes the head
    to the per-frame channel count."""
    return FinalBidirectionAttenfusion(_ablation_cfg(
        opt, "simpleconvThendown", bidirectional=False,
        siamese_fusion="se"))


@ARCHS.register("UNetDecoderRecurrentSiameseImgNoAtten")
def unet_decoder_recurrent_siamese_noatten(opt: dict):
    """Siamese image encoder, additive fusion
    (XXNet_decoder_recurrent_siamese_noatten_arch.py:79).  The torch file
    still BUILDS the SE fusion modules but comments out their use
    (:99-104 vs :183-185) — dead params, absent here."""
    return FinalBidirectionAttenfusion(_ablation_cfg(
        opt, "simpleconvThendown", bidirectional=False,
        siamese_fusion="add"))

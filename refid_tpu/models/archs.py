"""Arch registry entries: reference ``network_g.type`` -> flax module builder.

Each builder takes the ``network_g`` option dict and returns a flax Module.
The ablation lineage of the final architecture (unidirectional, no-attention,
decoder variants — XXNet_*_arch.py) is expressed as config switches on the
same module rather than file copies.
"""

from __future__ import annotations

from refid_tpu.core.registry import ARCHS
from refid_tpu.models.refid import FinalBidirectionAttenfusion, RefidConfig


def _refid_cfg(opt: dict, **overrides) -> RefidConfig:
    kw = dict(
        img_chn=opt["img_chn"],
        ev_chn=opt["ev_chn"],
        out_chn=opt.get("out_chn", 3),
        num_encoders=opt.get("num_encoders", 3),
        base_num_channels=opt.get("base_num_channels", 32),
        num_block=opt.get("num_block", 1),
        num_residual_blocks=opt.get("num_residual_blocks", 2),
        aliased_backward_states=opt.get("aliased_backward_states", True),
        remat=opt.get("remat", False),
        siamese_fusion=opt.get("siamese_fusion"),
    )
    kw.update(overrides)
    if opt.get("compute_dtype") == "bfloat16":
        import jax.numpy as jnp
        kw["dtype"] = jnp.bfloat16
    return RefidConfig(**kw)


@ARCHS.register("FinalBidirectionAttenfusion")
def final_bidirection_attenfusion(opt: dict):
    """The production network (XXNet_final_attenfusion_arch.py:81-218)."""
    return FinalBidirectionAttenfusion(_refid_cfg(opt))


@ARCHS.register("FinalBidirection")
def final_bidirection(opt: dict):
    """Ablation: additive fusion everywhere, no EGACA
    (XXNet_decoder_recurrent_allbidirection_arch.py lineage)."""
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
# (XXNet_arch.py, XXNet_decoder_recurrent*_arch.py, XXNet_ps_*). Here they
# are flag combinations on the final architecture: structural analogs for
# running the same ablation axes, not weight-compatible ports of the early
# prototype files (only FinalBidirectionAttenfusion has released weights).

@ARCHS.register("UNetRecurrent")
def unet_recurrent(opt: dict):
    """Unidirectional encoder recurrence, non-recurrent decoder
    (XXNet_arch.py:76 lineage)."""
    return FinalBidirectionAttenfusion(_refid_cfg(
        opt, bidirectional=False, atten_fuse_at=(),
        decoder_type="upsample_conv",
        recurrent_cell=opt.get("recurrent_block_type", "convlstm")))


@ARCHS.register("UNetDecoderRecurrent")
def unet_decoder_recurrent(opt: dict):
    """Unidirectional + recurrent decoder
    (XXNet_decoder_recurrent_arch.py:77 lineage)."""
    return FinalBidirectionAttenfusion(_refid_cfg(
        opt, bidirectional=False, atten_fuse_at=()))


@ARCHS.register("BidirUNetRecurrent")
def bidir_unet_recurrent(opt: dict):
    """Bidirectional encoder, non-recurrent decoder
    (XXNet_bidirection_arch.py:76 lineage)."""
    return FinalBidirectionAttenfusion(_refid_cfg(
        opt, atten_fuse_at=(), decoder_type="upsample_conv"))


@ARCHS.register("UNetDecoderRecurrentBidirection")
@ARCHS.register("UNetDecoderRecurrentAllBidirection")
def unet_decoder_recurrent_bidir(opt: dict):
    """Bidirectional + recurrent decoder, additive fusion
    (XXNet_decoder_recurrent_{bidirection,allbidirection}_arch.py)."""
    return FinalBidirectionAttenfusion(_refid_cfg(opt, atten_fuse_at=()))


@ARCHS.register("UNetPSDecoderRecurrent")
def unet_ps_decoder_recurrent(opt: dict):
    """Pixel-shuffle recurrent decoder (XXNet_ps_decoder_recurrent_arch.py)."""
    return FinalBidirectionAttenfusion(_refid_cfg(
        opt, atten_fuse_at=(), decoder_type="pixelshuffle_recurrent"))


@ARCHS.register("UNetDecoderRecurrentSiameseImg")
def unet_decoder_recurrent_siamese(opt: dict):
    """Siamese image encoder: each input frame encoded separately with
    shared weights, per-scale SE-gated fusion
    (XXNet_decoder_recurrent_siamese_arch.py:79)."""
    return FinalBidirectionAttenfusion(_refid_cfg(
        opt, bidirectional=False, atten_fuse_at=(), siamese_fusion="se"))


@ARCHS.register("UNetDecoderRecurrentSiameseImgNoAtten")
def unet_decoder_recurrent_siamese_noatten(opt: dict):
    """Siamese image encoder, additive fusion
    (XXNet_decoder_recurrent_siamese_noatten_arch.py:79)."""
    return FinalBidirectionAttenfusion(_refid_cfg(
        opt, bidirectional=False, atten_fuse_at=(), siamese_fusion="add"))

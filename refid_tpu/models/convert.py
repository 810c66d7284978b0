"""One-way importer: reference ``.pth`` checkpoints -> refid_tpu params.

Maps the torch module names of ``FinalBidirectionAttenfusion``
(basicsr/models/archs/XXNet_final_attenfusion_arch.py) onto the flax param
tree of :class:`refid_tpu.models.FinalBidirectionAttenfusion` (NHWC).

Weight layout conversions:
  * Conv2d           (O, I, kh, kw)  -> (kh, kw, I, O)
  * depthwise Conv2d (C, 1, kh, kw)  -> (kh, kw, 1, C)
  * ConvTranspose2d  (I, O, kh, kw)  -> (kh, kw, O, I)  (transpose_kernel=True)
  * LayerNorm2d weight/bias (C,)     -> scale/bias (C,)
  * beta/gamma (1, C, 1, 1)          -> (1, 1, 1, C)

Known-unused reference params (ignored, listed so strict conversion can
assert nothing else is dropped): ``atten_fuse.se_2.*`` (forward uses se_1
twice, fusion_modules.py:312-313) and the dead ``encoders_*.{i}.conv.*`` at
attention-fused scales (the conv is constructed but bypassed,
recurrent_sub_modules.py:274-281).
"""

from __future__ import annotations

import re
from typing import Dict

import numpy as np

from refid_tpu.models.refid import RefidConfig

__all__ = ["convert_state_dict", "load_pth_params"]


def _conv_w(w):
    return np.transpose(np.asarray(w), (2, 3, 1, 0))


def _deconv_w(w):
    return np.transpose(np.asarray(w), (2, 3, 1, 0))


def _vec(w):
    return np.asarray(w)


def _bg(w):  # beta/gamma (1,C,1,1) -> (1,1,1,C)
    return np.transpose(np.asarray(w), (0, 2, 3, 1))


def _atten_map(dst: Dict[str, np.ndarray], src: Dict, tprefix: str,
               fprefix: str):
    for conv in ["conv1", "conv2", "conv1_e", "conv2_e", "conv3", "conv4",
                 "conv5", "conv_y_side"]:
        dst[f"{fprefix}/{conv}/kernel"] = _conv_w(src[f"{tprefix}.{conv}.weight"])
        dst[f"{fprefix}/{conv}/bias"] = _vec(src[f"{tprefix}.{conv}.bias"])
    # SE: torch Sequential indices 1 and 3 are the two 1x1 convs
    dst[f"{fprefix}/se_1/fc1/kernel"] = _conv_w(src[f"{tprefix}.se_1.1.weight"])
    dst[f"{fprefix}/se_1/fc1/bias"] = _vec(src[f"{tprefix}.se_1.1.bias"])
    dst[f"{fprefix}/se_1/fc2/kernel"] = _conv_w(src[f"{tprefix}.se_1.3.weight"])
    dst[f"{fprefix}/se_1/fc2/bias"] = _vec(src[f"{tprefix}.se_1.3.bias"])
    for norm in ["norm1", "norm1_e", "norm2"]:
        dst[f"{fprefix}/{norm}/scale"] = _vec(src[f"{tprefix}.{norm}.weight"])
        dst[f"{fprefix}/{norm}/bias"] = _vec(src[f"{tprefix}.{norm}.bias"])
    dst[f"{fprefix}/beta"] = _bg(src[f"{tprefix}.beta"])
    dst[f"{fprefix}/gamma"] = _bg(src[f"{tprefix}.gamma"])


def _trunk_map(dst, src, tprefix: str, fprefix: str):
    """ConvResidualBlocks: main.0 conv, main.2.{j} ResidualBlockNoBN."""
    dst[f"{fprefix}/conv_in/kernel"] = _conv_w(src[f"{tprefix}.main.0.weight"])
    dst[f"{fprefix}/conv_in/bias"] = _vec(src[f"{tprefix}.main.0.bias"])
    j = 0
    while f"{tprefix}.main.2.{j}.conv1.weight" in src:
        for c in ["conv1", "conv2"]:
            dst[f"{fprefix}/block_{j}/{c}/kernel"] = _conv_w(
                src[f"{tprefix}.main.2.{j}.{c}.weight"])
            dst[f"{fprefix}/block_{j}/{c}/bias"] = _vec(
                src[f"{tprefix}.main.2.{j}.{c}.bias"])
        j += 1


def convert_state_dict(state_dict: Dict, cfg: RefidConfig) -> Dict:
    """Convert a torch state_dict (possibly nested under ``params`` /
    prefixed with ``module.``) into a nested flax ``{'params': ...}`` dict."""
    import flax

    src = {k[len("module."):] if k.startswith("module.") else k:
           (v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v))
           for k, v in state_dict.items()}

    flat: Dict[str, np.ndarray] = {}

    # event head: declared via ConvParams (applied inside the scans)
    flat["head/kernel"] = _conv_w(src["head.conv2d.weight"])
    flat["head/bias"] = _vec(src["head.conv2d.bias"])
    flat["head_img/conv/kernel"] = _conv_w(src["head_img.conv2d.weight"])
    flat["head_img/conv/bias"] = _vec(src["head_img.conv2d.bias"])

    for i in range(cfg.num_encoders):
        t = f"img_encoders.{i}"
        f = f"img_enc_{i}"
        flat[f"{f}/conv1/kernel"] = _conv_w(src[f"{t}.conv_1.weight"])
        flat[f"{f}/conv1/bias"] = _vec(src[f"{t}.conv_1.bias"])
        flat[f"{f}/conv2/kernel"] = _conv_w(src[f"{t}.conv_2.weight"])
        flat[f"{f}/conv2/bias"] = _vec(src[f"{t}.conv_2.bias"])
        flat[f"{f}/identity/kernel"] = _conv_w(src[f"{t}.identity.weight"])
        flat[f"{f}/identity/bias"] = _vec(src[f"{t}.identity.bias"])
        flat[f"{f}/down/kernel"] = _conv_w(src[f"{t}.down.weight"])

    assert cfg.siamese_fusion is None, \
        "the torch siamese archs are runtime-broken; no weights to convert"
    directions = ([("bwd", "encoders_backward"), ("fwd", "encoders_forward")]
                  if cfg.bidirectional else [("fwd", "encoders")])
    for direction, tname in directions:
        for i in range(cfg.num_encoders):
            t = f"{tname}.{i}"
            f = f"{direction}/enc_{i}"
            if cfg.encoder_stage == "rec_conv":
                # RecurrentConvLayer (recurrent_sub_modules.py:88-111):
                # plain conv + ConvLSTM 'Gates' / ConvGRU three gate convs
                flat[f"{f}/conv/kernel"] = _conv_w(
                    src[f"{t}.conv.conv2d.weight"])
                flat[f"{f}/conv/bias"] = _vec(src[f"{t}.conv.conv2d.bias"])
                rb = f"{t}.recurrent_block"
                if cfg.recurrent_cell == "convlstm":
                    flat[f"{f}/rec/gates/kernel"] = _conv_w(
                        src[f"{rb}.Gates.weight"])
                    flat[f"{f}/rec/gates/bias"] = _vec(src[f"{rb}.Gates.bias"])
                else:  # convgru
                    for g in ["reset_gate", "update_gate", "out_gate"]:
                        flat[f"{f}/rec/{g}/kernel"] = _conv_w(
                            src[f"{rb}.{g}.weight"])
                        flat[f"{f}/rec/{g}/bias"] = _vec(
                            src[f"{rb}.{g}.bias"])
                continue  # no trunk / fuse / down in this lineage
            # scale 0 never receives an image feature, so it always uses the
            # plain conv, even when attention is configured for that index
            if i in cfg.atten_fuse_at and i != 0:
                _atten_map(flat, src, f"{t}.atten_fuse", f"{f}/atten")
            else:
                flat[f"{f}/conv/conv/kernel"] = _conv_w(src[f"{t}.conv.conv2d.weight"])
                flat[f"{f}/conv/conv/bias"] = _vec(src[f"{t}.conv.conv2d.bias"])
            _trunk_map(flat, src, f"{t}.recurrent_block.forward_trunk",
                       f"{f}/rec/trunk")
            if cfg.encoder_stage == "then_down":
                flat[f"{f}/down/kernel"] = _conv_w(src[f"{t}.down.weight"])
            if direction == "fwd" and cfg.bidirectional:
                flat[f"{f}/fuse_bidir/conv/kernel"] = _conv_w(
                    src[f"{t}.fuse_two_dir.conv2d.weight"])
                flat[f"{f}/fuse_bidir/conv/bias"] = _vec(
                    src[f"{t}.fuse_two_dir.conv2d.bias"])

    if cfg.apply_resblocks:
        for i in range(cfg.num_residual_blocks):
            for c in ["conv1", "conv2"]:
                flat[f"fwd/res_{i}/{c}/kernel"] = _conv_w(src[f"resblocks.{i}.{c}.weight"])
                flat[f"fwd/res_{i}/{c}/bias"] = _vec(src[f"resblocks.{i}.{c}.bias"])

    for i in range(cfg.num_encoders):
        t = f"decoders.{i}"
        f = f"fwd/dec_{i}"
        if cfg.decoder_type == "upsample_conv":
            # BaseUNet bilinear-k5 UpsampleConvLayer (XXNet_arch.py:62-69)
            flat[f"{f}/conv/kernel"] = _conv_w(src[f"{t}.conv2d.weight"])
            flat[f"{f}/conv/bias"] = _vec(src[f"{t}.conv2d.bias"])
            continue
        if cfg.decoder_type == "pixelshuffle_recurrent":
            # shuffle has no params; the trunk consumes torch channel order
            # (models/recurrent.py PixelShuffleRecurrentConvLayer)
            _trunk_map(flat, src, f"{t}.forward_trunk", f"{f}/trunk")
            continue
        flat[f"{f}/up/kernel"] = _deconv_w(src[f"{t}.transposed_conv2d.weight"])
        flat[f"{f}/up/bias"] = _vec(src[f"{t}.transposed_conv2d.bias"])
        _trunk_map(flat, src, f"{t}.forward_trunk", f"{f}/trunk")

    flat["fwd/pred/conv/kernel"] = _conv_w(src["pred.conv2d.weight"])
    flat["fwd/pred/conv/bias"] = _vec(src["pred.conv2d.bias"])

    params = flax.traverse_util.unflatten_dict(
        {tuple(k.split("/")): np.asarray(v, np.float32) for k, v in flat.items()})
    return {"params": params}


def load_pth_params(path: str, cfg: RefidConfig, param_key: str = "params",
                    net=None):
    """Load a reference ``net_g_*.pth`` checkpoint file and convert.

    Dispatches on the state-dict's key signature: the REFID recurrent
    lineage (``head.conv2d.*``) routes through ``convert_state_dict``
    (needs ``cfg``); SingleMultiConnectEVHINet (``conv_ev1.*``) through
    ``convert_evhinet_state_dict`` (``depth``/``fac_place`` read off
    ``net`` when given).  One loader covers every released checkpoint
    (reference README.md:114-128)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=True)
    if param_key in ckpt:
        ckpt = ckpt[param_key]
    elif "params_ema" in ckpt:
        ckpt = ckpt["params_ema"]
    keys = {k[len("module."):] if k.startswith("module.") else k
            for k in ckpt}
    if any(k.startswith("conv_ev1.") for k in keys):
        kw = {}
        if net is not None:
            kw = {"depth": net.depth, "fac_place": net.fac_place}
        return convert_evhinet_state_dict(ckpt, **kw)
    return convert_state_dict(ckpt, cfg)


def _hin_block_map(dst, src, tprefix: str, fprefix: str, has_down: bool,
                   is_ev: bool = False):
    for tname, fname in [("conv_1", "conv1"), ("conv_2", "conv2"),
                         ("identity", "identity")]:
        dst[f"{fprefix}/{fname}/kernel"] = _conv_w(src[f"{tprefix}.{tname}.weight"])
        dst[f"{fprefix}/{fname}/bias"] = _vec(src[f"{tprefix}.{tname}.bias"])
    if f"{tprefix}.norm.weight" in src:
        dst[f"{fprefix}/hin_scale"] = _vec(src[f"{tprefix}.norm.weight"])
        dst[f"{fprefix}/hin_bias"] = _vec(src[f"{tprefix}.norm.bias"])
    if is_ev:
        dst[f"{fprefix}/merge/kernel"] = _conv_w(
            src[f"{tprefix}.conv_before_merge.weight"])
        dst[f"{fprefix}/merge/bias"] = _vec(
            src[f"{tprefix}.conv_before_merge.bias"])
    if has_down:
        dst[f"{fprefix}/down/kernel"] = _conv_w(
            src[f"{tprefix}.downsample.weight"])


def convert_evhinet_state_dict(state_dict: Dict, depth: int = 3,
                               fac_place: int = 2) -> Dict:
    """Convert a reference SingleMultiConnectEVHINet state_dict (used stage-1
    path only; the dead stage-2 modules are skipped)."""
    import flax

    src = {k[len("module."):] if k.startswith("module.") else k:
           (v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v))
           for k, v in state_dict.items()}
    flat: Dict[str, np.ndarray] = {}

    for name in ["conv_ev1", "conv_01"]:
        flat[f"{name}/kernel"] = _conv_w(src[f"{name}.weight"])
        flat[f"{name}/bias"] = _vec(src[f"{name}.bias"])

    for i in range(min(fac_place + 1, depth)):
        _hin_block_map(flat, src, f"down_path_ev.{i}", f"ev_{i}",
                       has_down=(i + 1) < depth, is_ev=True)
    for i in range(depth):
        _hin_block_map(flat, src, f"down_path_1.{i}", f"down_{i}",
                       has_down=(i + 1) < depth)
    for idx in range(depth - 1):
        flat[f"up_{idx}/kernel"] = _deconv_w(
            src[f"up_path_1.{idx}.up.weight"])
        flat[f"up_{idx}/bias"] = _vec(src[f"up_path_1.{idx}.up.bias"])
        _hin_block_map(flat, src, f"up_path_1.{idx}.conv_block",
                       f"upblk_{idx}", has_down=False)
        flat[f"skip_{idx}/kernel"] = _conv_w(src[f"skip_conv_1.{idx}.weight"])
        flat[f"skip_{idx}/bias"] = _vec(src[f"skip_conv_1.{idx}.bias"])
    for c in ["conv1", "conv2", "conv3"]:
        flat[f"sam12/{c}/kernel"] = _conv_w(src[f"sam12.{c}.weight"])
        flat[f"sam12/{c}/bias"] = _vec(src[f"sam12.{c}.bias"])

    params = flax.traverse_util.unflatten_dict(
        {tuple(k.split("/")): np.asarray(v, np.float32)
         for k, v in flat.items()})
    return {"params": params}

"""InceptionV3 feature extractor for FID — the component the reference
ships broken (basicsr/metrics/fid.py:7 imports a nonexistent
``basicsr.models.archs.inception``; the intended model is pytorch-fid's
"patched" torchvision InceptionV3 with the pt_inception-2015-12-05
weights).

This is a pure-functional NHWC JAX port of that patched architecture:

  * BasicConv2d = conv(bias=False) + BatchNorm(eps=1e-3, inference) + relu
  * Inception blocks A-E per torchvision, with the pytorch-fid patches:
    the A/C/E branch_pool average pools use count_include_pad=False, and
    the SECOND InceptionE (Mixed_7c) uses a 3x3/1 MAX pool branch.
  * ``resize_input`` bilinearly resizes to 299x299 (align_corners=False
    semantics == jax.image.resize 'bilinear'); ``normalize_input`` maps
    [0,1] -> [-1,1].  Defaults mirror the reference call
    (fid.py:11-19: resize_input=True, normalize_input=False).

Weights load from the standard pytorch-fid checkpoint via
:func:`convert_torch_state_dict` (torch .pth state_dict -> nested numpy
tree, OIHW -> HWIO).  Architecture + conversion are golden-tested against
an independent torch implementation of the same patched model
(tests/test_fid_inception.py).
"""

from __future__ import annotations

from typing import Dict

import numpy as np

import jax
import jax.numpy as jnp

__all__ = ["inception_v3_features", "convert_torch_state_dict",
           "load_patched_inception_v3", "extract_inception_features"]


def _conv_bn(p, x, stride=1, padding=((0, 0), (0, 0))):
    """BasicConv2d: conv (no bias) -> BN(eps=1e-3, inference) -> relu."""
    y = jax.lax.conv_general_dilated(
        x, p["conv"], (stride, stride), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    bn = p["bn"]
    inv = jax.lax.rsqrt(bn["var"] + 1e-3)
    return jax.nn.relu((y - bn["mean"]) * inv * bn["scale"] + bn["bias"])


def _pad2(p):
    if isinstance(p, int):
        return ((p, p), (p, p))
    return ((p[0], p[0]), (p[1], p[1]))


def _max_pool(x, k=3, stride=2, padding=0):
    pads = _pad2(padding)
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, k, k, 1), (1, stride, stride, 1),
        ((0, 0),) + pads + ((0, 0),))


def _avg_pool_nocount(x, k=3):
    """3x3 stride-1 pad-1 average pool with count_include_pad=False
    (the pytorch-fid patch on InceptionA/C/E branch pools)."""
    pads = ((0, 0), (1, 1), (1, 1), (0, 0))
    s = jax.lax.reduce_window(x, 0.0, jax.lax.add, (1, k, k, 1),
                              (1, 1, 1, 1), pads)
    ones = jnp.ones(x.shape[:3] + (1,), x.dtype)
    cnt = jax.lax.reduce_window(ones, 0.0, jax.lax.add, (1, k, k, 1),
                                (1, 1, 1, 1), pads)
    return s / cnt


def _inception_a(p, x):
    b1 = _conv_bn(p["branch1x1"], x)
    b5 = _conv_bn(p["branch5x5_1"], x)
    b5 = _conv_bn(p["branch5x5_2"], b5, padding=_pad2(2))
    b3 = _conv_bn(p["branch3x3dbl_1"], x)
    b3 = _conv_bn(p["branch3x3dbl_2"], b3, padding=_pad2(1))
    b3 = _conv_bn(p["branch3x3dbl_3"], b3, padding=_pad2(1))
    bp = _conv_bn(p["branch_pool"], _avg_pool_nocount(x))
    return jnp.concatenate([b1, b5, b3, bp], axis=-1)


def _inception_b(p, x):
    b3 = _conv_bn(p["branch3x3"], x, stride=2)
    bd = _conv_bn(p["branch3x3dbl_1"], x)
    bd = _conv_bn(p["branch3x3dbl_2"], bd, padding=_pad2(1))
    bd = _conv_bn(p["branch3x3dbl_3"], bd, stride=2)
    bp = _max_pool(x)
    return jnp.concatenate([b3, bd, bp], axis=-1)


def _inception_c(p, x):
    b1 = _conv_bn(p["branch1x1"], x)
    b7 = _conv_bn(p["branch7x7_1"], x)
    b7 = _conv_bn(p["branch7x7_2"], b7, padding=_pad2((0, 3)))
    b7 = _conv_bn(p["branch7x7_3"], b7, padding=_pad2((3, 0)))
    bd = _conv_bn(p["branch7x7dbl_1"], x)
    bd = _conv_bn(p["branch7x7dbl_2"], bd, padding=_pad2((3, 0)))
    bd = _conv_bn(p["branch7x7dbl_3"], bd, padding=_pad2((0, 3)))
    bd = _conv_bn(p["branch7x7dbl_4"], bd, padding=_pad2((3, 0)))
    bd = _conv_bn(p["branch7x7dbl_5"], bd, padding=_pad2((0, 3)))
    bp = _conv_bn(p["branch_pool"], _avg_pool_nocount(x))
    return jnp.concatenate([b1, b7, bd, bp], axis=-1)


def _inception_d(p, x):
    b3 = _conv_bn(p["branch3x3_1"], x)
    b3 = _conv_bn(p["branch3x3_2"], b3, stride=2)
    b7 = _conv_bn(p["branch7x7x3_1"], x)
    b7 = _conv_bn(p["branch7x7x3_2"], b7, padding=_pad2((0, 3)))
    b7 = _conv_bn(p["branch7x7x3_3"], b7, padding=_pad2((3, 0)))
    b7 = _conv_bn(p["branch7x7x3_4"], b7, stride=2)
    bp = _max_pool(x)
    return jnp.concatenate([b3, b7, bp], axis=-1)


def _inception_e(p, x, pool: str):
    b1 = _conv_bn(p["branch1x1"], x)
    b3 = _conv_bn(p["branch3x3_1"], x)
    b3 = jnp.concatenate([
        _conv_bn(p["branch3x3_2a"], b3, padding=_pad2((0, 1))),
        _conv_bn(p["branch3x3_2b"], b3, padding=_pad2((1, 0)))], axis=-1)
    bd = _conv_bn(p["branch3x3dbl_1"], x)
    bd = _conv_bn(p["branch3x3dbl_2"], bd, padding=_pad2(1))
    bd = jnp.concatenate([
        _conv_bn(p["branch3x3dbl_3a"], bd, padding=_pad2((0, 1))),
        _conv_bn(p["branch3x3dbl_3b"], bd, padding=_pad2((1, 0)))], axis=-1)
    pooled = (_max_pool(x, stride=1, padding=1) if pool == "max"
              else _avg_pool_nocount(x))
    bp = _conv_bn(p["branch_pool"], pooled)
    return jnp.concatenate([b1, b3, bd, bp], axis=-1)


def inception_v3_features(params: Dict, x, resize_input: bool = True,
                          normalize_input: bool = False):
    """(b, h, w, 3) float in [0, 1] -> (b, 2048) pool3 FID features.

    Mirrors pytorch-fid's InceptionV3([3], resize_input, normalize_input)
    forward — the model the reference's fid.py meant to build
    (basicsr/metrics/fid.py:11-19)."""
    if resize_input:
        b, _, _, c = x.shape
        x = jax.image.resize(x, (b, 299, 299, c), method="bilinear")
    if normalize_input:
        x = 2.0 * x - 1.0
    x = _conv_bn(params["Conv2d_1a_3x3"], x, stride=2)
    x = _conv_bn(params["Conv2d_2a_3x3"], x)
    x = _conv_bn(params["Conv2d_2b_3x3"], x, padding=_pad2(1))
    x = _max_pool(x)
    x = _conv_bn(params["Conv2d_3b_1x1"], x)
    x = _conv_bn(params["Conv2d_4a_3x3"], x)
    x = _max_pool(x)
    x = _inception_a(params["Mixed_5b"], x)
    x = _inception_a(params["Mixed_5c"], x)
    x = _inception_a(params["Mixed_5d"], x)
    x = _inception_b(params["Mixed_6a"], x)
    x = _inception_c(params["Mixed_6b"], x)
    x = _inception_c(params["Mixed_6c"], x)
    x = _inception_c(params["Mixed_6d"], x)
    x = _inception_c(params["Mixed_6e"], x)
    x = _inception_d(params["Mixed_7a"], x)
    x = _inception_e(params["Mixed_7b"], x, pool="avg")
    x = _inception_e(params["Mixed_7c"], x, pool="max")
    return jnp.mean(x, axis=(1, 2))  # adaptive avg pool to 1x1


def convert_torch_state_dict(sd) -> Dict:
    """torch (pytorch-fid / torchvision Inception3) state_dict ->
    nested numpy param tree.  Accepts torch tensors or numpy arrays;
    ignores fc/AuxLogits (not part of the feature path)."""
    out: Dict = {}
    for key, val in sd.items():
        if key.startswith(("fc.", "AuxLogits.")) or \
                key.endswith("num_batches_tracked"):
            continue
        arr = np.asarray(getattr(val, "numpy", lambda: val)())
        parts = key.split(".")
        mod, leaf = parts[:-1], parts[-1]
        # module path: e.g. Mixed_5b.branch1x1.conv.weight or
        # Conv2d_1a_3x3.bn.running_mean
        node = out
        for q in mod[:-1]:
            node = node.setdefault(q, {})
        kind = mod[-1]  # 'conv' or 'bn'
        if kind == "conv":
            assert leaf == "weight", key
            node["conv"] = arr.transpose(2, 3, 1, 0)  # OIHW -> HWIO
        else:
            bn = node.setdefault("bn", {})
            bn[{"weight": "scale", "bias": "bias",
                "running_mean": "mean", "running_var": "var"}[leaf]] = arr
    return out


def load_patched_inception_v3(weights_path: str, resize_input: bool = True,
                              normalize_input: bool = False):
    """Reference API analog (fid.py:11-19): returns (params, apply_fn)
    with apply_fn jitted over (b, h, w, 3) [0,1] images -> (b, 2048).
    ``weights_path`` is the standard pt_inception .pth state_dict."""
    import torch
    sd = torch.load(weights_path, map_location="cpu", weights_only=True)
    if "state_dict" in sd:
        sd = sd["state_dict"]
    params = convert_torch_state_dict(sd)

    @jax.jit
    def apply_fn(params, x):
        return inception_v3_features(params, x, resize_input,
                                     normalize_input)

    return params, apply_fn


def extract_inception_features(data_generator, params, apply_fn=None):
    """Reference fid.py:22-54 analog: iterate (b, h, w, 3) [0,1] numpy
    batches, return stacked (N, 2048) features."""
    if apply_fn is None:
        apply_fn = jax.jit(inception_v3_features)
    feats = []
    for batch in data_generator:
        feats.append(np.asarray(apply_fn(params, jnp.asarray(batch))))
    return np.concatenate(feats, axis=0)

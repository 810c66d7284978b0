"""EGACA — event-guided attention cross-modal fusion (flax, NHWC).

Parity target: ``CrossmodalAtten_imgeventalladd``
(basicsr/models/archs/fusion_modules.py:237-333) and ``CrossmodalAtten``
(:137-233).  Structure: dual-branch LayerNorm2d -> 1x1 + depthwise 3x3 ->
exact GELU -> SE channel gate computed from the EVENT branch applied to both
branches -> channel concat + 1x1 fuse -> zero-init beta residual -> FFN with
zero-init gamma residual.  Note the reference applies ``se_1`` to both
branches (``se_2`` exists in checkpoints but is unused) — replicated here.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from refid_tpu.models.layers import conv2d, LayerNorm2d, SELayer

Dtype = Any


class CrossmodalAtten(nn.Module):
    """EGACA block.

    ``all_add=True``  -> CrossmodalAtten_imgeventalladd (the production one):
        first residual is ``event + image + beta * fused``.
    ``all_add=False`` -> CrossmodalAtten: first residual is image-only.
    """
    c: int
    c_out: int
    dw_expand: int = 1
    ffn_expand: int = 2
    all_add: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, event_feat, image_feat):
        dw = self.c * self.dw_expand

        x = LayerNorm2d(self.c, dtype=self.dtype, name="norm1")(image_feat)
        x_e = LayerNorm2d(self.c, dtype=self.dtype, name="norm1_e")(event_feat)

        x = conv2d(x, dw, 1, dtype=self.dtype, name="conv1")
        x = conv2d(x, dw, 3, 1, 1, feature_group_count=dw,
                   dtype=self.dtype, name="conv2")
        x = jax.nn.gelu(x, approximate=False)

        x_e = conv2d(x_e, dw, 1, dtype=self.dtype, name="conv1_e")
        x_e = conv2d(x_e, dw, 3, 1, 1, feature_group_count=dw,
                     dtype=self.dtype, name="conv2_e")
        x_e = jax.nn.gelu(x_e, approximate=False)

        # event-branch SE gate applied to BOTH branches (reference quirk:
        # se_1 used twice, se_2 never used — fusion_modules.py:312-313)
        gate = SELayer(dw // 2, dw, dtype=self.dtype, name="se_1")(x_e)
        x = x * gate
        x_e = x_e * gate

        x = jnp.concatenate([x, x_e], axis=-1)
        x = conv2d(x, self.c, 1, dtype=self.dtype, name="conv3")

        beta = self.param("beta", nn.initializers.zeros, (1, 1, 1, self.c))
        if self.dtype is not None:
            beta = beta.astype(self.dtype)
        if self.all_add:
            y = event_feat + image_feat + x * beta
        else:
            y = image_feat + x * beta

        ffn = conv2d(LayerNorm2d(self.c, dtype=self.dtype, name="norm2")(y),
                     self.ffn_expand * self.c, 1, dtype=self.dtype,
                     name="conv4")
        ffn = jax.nn.gelu(ffn, approximate=False)
        ffn = conv2d(ffn, self.c_out, 1, dtype=self.dtype, name="conv5")

        gamma = self.param("gamma", nn.initializers.zeros,
                           (1, 1, 1, self.c_out))
        if self.dtype is not None:
            gamma = gamma.astype(self.dtype)
        y = conv2d(y, self.c_out, 1, dtype=self.dtype, name="conv_y_side")
        return y + ffn * gamma


class ImgEvFusion(nn.Module):
    """Siamese two-image fusion gated by the event features.

    Parity: ``img_ev_fusion`` (fusion_modules.py:57-73) — two single-conv SE
    gates computed from the event branch weight the two image-encoder
    features; the event features themselves are NOT passed through:
    ``out = feat_0 * se_0(ev) + feat_1 * se_1(ev)``.
    """
    c: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, ev, feat_0, feat_1):
        def gate(name):
            w = jnp.mean(ev, axis=(1, 2), keepdims=True)
            w = conv2d(w, self.c, 1, dtype=self.dtype, name=name)
            return jax.nn.sigmoid(w)

        return feat_0 * gate("se_0") + feat_1 * gate("se_1")

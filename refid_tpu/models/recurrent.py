"""Recurrent building blocks for the event encoder / decoder (flax, NHWC).

Parity targets:
  * SimpleRecurrentConv      — recurrent_sub_modules.py:646-678
  * RecurrentEncoderStage    — SimpleRecurrentThenDownAttenfusionmodified
                               ConvLayer, recurrent_sub_modules.py:245-296
  * TransposeRecurrentConvLayer — recurrent_sub_modules.py:370-408
  * ConvGRU / ConvLSTM       — recurrent_sub_modules.py:506-605

States are explicit arrays (never None): callers initialize zeros, which is
what the reference lazily materializes on first step.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from refid_tpu.models.layers import (
    conv2d, conv_transpose_up, ConvLayer, ConvResidualBlocks, leaky_relu,
)
from refid_tpu.models.fusion import CrossmodalAtten

Dtype = Any


class SimpleRecurrentConv(nn.Module):
    """concat(x, state) -> ConvResidualBlocks; new state = output."""
    features: int
    num_block: int = 1
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, prev_state):
        feat = ConvResidualBlocks(self.features, self.num_block,
                                  dtype=self.dtype, name="trunk")(
                                      [x, prev_state])
        return feat, feat


class ConvGRU(nn.Module):
    """Convolutional GRU cell with orthogonal gate init, zero bias."""
    hidden: int
    kernel_size: int = 3
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, prev_state):
        p = self.kernel_size // 2
        orth = nn.initializers.orthogonal()
        zeros = nn.initializers.zeros
        stacked = [x, prev_state]
        update = jax.nn.sigmoid(conv2d(
            stacked, self.hidden, self.kernel_size, 1, p, kernel_init=orth,
            bias_init=zeros, dtype=self.dtype, name="update_gate"))
        reset = jax.nn.sigmoid(conv2d(
            stacked, self.hidden, self.kernel_size, 1, p, kernel_init=orth,
            bias_init=zeros, dtype=self.dtype, name="reset_gate"))
        cand = jnp.tanh(conv2d(
            [x, prev_state * reset], self.hidden, self.kernel_size, 1, p,
            kernel_init=orth, bias_init=zeros, dtype=self.dtype,
            name="out_gate"))
        new_state = prev_state * (1 - update) + cand * update
        return new_state, new_state


class ConvLSTM(nn.Module):
    """Convolutional LSTM cell; state is (hidden, cell)."""
    hidden: int
    kernel_size: int = 3
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, prev_state: Tuple[jnp.ndarray, jnp.ndarray]):
        prev_hidden, prev_cell = prev_state
        p = self.kernel_size // 2
        gates = conv2d([x, prev_hidden], 4 * self.hidden, self.kernel_size,
                       1, p, dtype=self.dtype, name="gates")
        in_g, rem_g, out_g, cell_g = jnp.split(gates, 4, axis=-1)
        cell = (jax.nn.sigmoid(rem_g) * prev_cell
                + jax.nn.sigmoid(in_g) * jnp.tanh(cell_g))
        hidden = jax.nn.sigmoid(out_g) * jnp.tanh(cell)
        return hidden, (hidden, cell)


class RecurrentEncoderStage(nn.Module):
    """One scale of the event encoder.  ``stage_type`` selects the reference
    stage-class lineage (each is a different downsampling arrangement):

    * ``then_down`` — SimpleRecurrentThenDownAttenfusionmodifiedConvLayer
      (recurrent_sub_modules.py:245-296, the flagship): fuse(img feat) ->
      [k3/s1 conv | EGACA] -> recurrent cell -> optional bidirectional-state
      1x1 fuse -> 4x4/2 downsample.  State lives at the PRE-down resolution.
    * ``conv_down`` — SimpleRecurrentConvLayer (:113-149, the
      'simpleconv' ablation lineage): k5/s2 conv (downsampling) ->
      recurrent trunk -> optional bidir fuse; NO separate down conv.  State
      lives at the POST-down resolution.
    * ``rec_conv`` — RecurrentConvLayer (:88-111, the 'convlstm'/'convgru'
      ablation lineage): k5/s2 conv with a PLAIN ReLU (the reference passes
      activation='relu' into ConvLayer's relu_slope slot, and ConvLayer
      maps any string to nn.ReLU — :64-67) -> ConvLSTM/ConvGRU cell.  No
      trunk, no bidir fuse, no down.  State at POST-down resolution.

    Returns (downsampled_feat, new_state).  ``cell`` selects the recurrence:
    'simpleconv' (production), 'convgru', or 'convlstm' (state =
    (hidden, cell)).
    """
    in_ch: int
    out_ch: int
    num_block: int = 1
    use_atten_fuse: bool = False
    fuse_two_direction: bool = False
    relu_slope: float = 0.2
    cell: str = "simpleconv"
    stage_type: str = "then_down"
    use_first_dcn: bool = False
    dtype: Optional[Dtype] = None

    def _first_conv(self, x, k, s, p):
        """The stage's channel-raising conv.  ``use_first_dcn`` swaps it for
        a modulated deformable conv + single leaky-relu, the way the
        reference's ablation stage classes honor the flag
        (recurrent_sub_modules.py:164-180: DCN -> self.relu once; the plain
        ConvLayer path applies its internal relu AND self.relu).  NOTE the
        reference's flagship stage class accepts ``use_first_dcn`` but
        silently drops it (:252-268 builds no DCN) — here the flag is
        honored for every stage; keep it False for released-checkpoint
        parity."""
        if self.use_first_dcn:
            from refid_tpu.ops.deform_conv import ModulatedDeformConvPack
            x = ModulatedDeformConvPack(self.out_ch, k, s, p,
                                        dtype=self.dtype, name="conv")(x)
            return leaky_relu(x, self.relu_slope)
        x = ConvLayer(self.out_ch, k, s, p, self.relu_slope,
                      dtype=self.dtype, name="conv")(x)
        return leaky_relu(x, self.relu_slope)

    @nn.compact
    def __call__(self, x, y, prev_state, bi_direction_state=None):
        if y is not None and self.stage_type != "then_down":
            # ablation lineages apply the skip-sum BEFORE the stage
            # (XXNet_decoder_recurrent_arch.py:165); identical math to the
            # flagship's in-stage x+y, expressed here for uniformity
            x = x + y
            y = None
        if self.stage_type == "rec_conv":
            # RecurrentConvLayer: single plain ReLU inside ConvLayer
            x = nn.relu(conv2d(x, self.out_ch, 5, 2, 2, dtype=self.dtype,
                               name="conv"))
            cell_cls = {"convgru": ConvGRU, "convlstm": ConvLSTM}[self.cell]
            x, state = cell_cls(self.out_ch, dtype=self.dtype,
                                name="rec")(x, prev_state)
            return x, state

        k, s, p = (3, 1, 1) if self.stage_type == "then_down" else (5, 2, 2)
        if y is not None:
            if self.use_atten_fuse:
                x = CrossmodalAtten(self.in_ch, self.out_ch, all_add=True,
                                    dtype=self.dtype, name="atten")(x, y)
            else:
                x = self._first_conv(x + y, k, s, p)
        else:
            x = self._first_conv(x, k, s, p)

        if self.cell == "simpleconv":
            x, state = SimpleRecurrentConv(self.out_ch, self.num_block,
                                           dtype=self.dtype, name="rec")(
                                               x, prev_state)
        elif self.cell == "convgru":
            x, state = ConvGRU(self.out_ch, dtype=self.dtype,
                               name="rec")(x, prev_state)
        elif self.cell == "convlstm":
            x, state = ConvLSTM(self.out_ch, dtype=self.dtype,
                                name="rec")(x, prev_state)
        else:
            raise ValueError(f"unknown recurrent cell {self.cell!r}")
        if bi_direction_state is not None:
            assert self.fuse_two_direction
            if isinstance(bi_direction_state, tuple):  # convlstm: use hidden
                bi_direction_state = bi_direction_state[0]
            x = ConvLayer(self.out_ch, 1, 1, 0, self.relu_slope,
                          dtype=self.dtype, name="fuse_bidir")(
                              [x, bi_direction_state])
        if self.stage_type == "then_down":
            x = conv2d(x, self.out_ch, 4, 2, 1, use_bias=False,
                       dtype=self.dtype, name="down")
        return x, state


class TransposeRecurrentConvLayer(nn.Module):
    """Decoder stage: 2x2/2 transposed conv up, concat hidden state,
    ConvResidualBlocks trunk; new state = output.

    ``fuse_two_direction`` adds the 1x1 backward-state fuse conv of the
    all-bidirection lineage (recurrent_sub_modules.py:383-384).  NOTE the
    reference's forward COMPUTES the fuse and then discards it (:400-404
    assigns the fused tensor to ``x`` but continues from ``out``) — a bug
    that makes the decoder fusion a parameter-only no-op (the arch is also
    runtime-broken overall, see archs.py).  Here the fuse is applied as
    intended: to the upsampled feature before the trunk."""
    out_ch: int
    num_block: int = 1
    fuse_two_direction: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, prev_state, bi_direction_state=None):
        out = conv_transpose_up(x, self.out_ch, dtype=self.dtype, name="up")
        if bi_direction_state is not None:
            assert self.fuse_two_direction
            out = ConvLayer(self.out_ch, 1, 1, 0, 0.2, dtype=self.dtype,
                            name="fuse_bidir")([out, bi_direction_state])
        out = ConvResidualBlocks(self.out_ch, self.num_block,
                                 dtype=self.dtype, name="trunk")(
                                     [out, prev_state])
        return out, out


class PixelShuffleRecurrentConvLayer(nn.Module):
    """Decoder ablation: pixel-shuffle x2 upsample, concat hidden state,
    ConvResidualBlocks trunk (recurrent_sub_modules.py:411-440)."""
    out_ch: int
    num_block: int = 1
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, prev_state):
        b, h, w, c = x.shape
        # NHWC pixel shuffle r=2 in torch's channel order (out channel cc
        # draws input channel cc*4 + dy*2 + dx) so converted weights map 1:1
        out = x.reshape(b, h, w, c // 4, 2, 2)
        out = out.transpose(0, 1, 4, 2, 5, 3).reshape(b, 2 * h, 2 * w, c // 4)
        out = jnp.concatenate([out, prev_state], axis=-1)
        out = ConvResidualBlocks(self.out_ch, self.num_block,
                                 dtype=self.dtype, name="trunk")(out)
        return out, out


class UpsampleConvLayer(nn.Module):
    """Decoder ablation: bilinear x2 upsample + k5 conv + relu, NO recurrence
    (recurrent_sub_modules.py:336-367; use_recurrent_upsample_conv=False
    path of the final arch, kernel per XXNet_arch.py build_decoders k5 p2)."""
    out_ch: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, prev_state=None):
        b, h, w, c = x.shape
        up = jax.image.resize(x, (b, 2 * h, 2 * w, c), method="bilinear")
        out = nn.relu(conv2d(up, self.out_ch, 5, 1, 2, dtype=self.dtype,
                             name="conv"))
        return out, prev_state

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
    """One scale of the event encoder:

    fuse(img feat) -> [conv | EGACA] -> recurrent cell
    -> optional bidirectional-state 1x1 fuse -> 4x4/2 downsample.

    Returns (downsampled_feat, new_state); the state lives at the PRE-down
    resolution with ``out_ch`` channels.  ``cell`` selects the recurrence
    (the reference's recurrent_block_type ablation axis): 'simpleconv'
    (production), 'convgru', or 'convlstm' (state = (hidden, cell)).
    """
    in_ch: int
    out_ch: int
    num_block: int = 1
    use_atten_fuse: bool = False
    fuse_two_direction: bool = False
    relu_slope: float = 0.2
    cell: str = "simpleconv"
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, y, prev_state, bi_direction_state=None):
        if y is not None:
            if self.use_atten_fuse:
                x = CrossmodalAtten(self.in_ch, self.out_ch, all_add=True,
                                    dtype=self.dtype, name="atten")(x, y)
            else:
                x = ConvLayer(self.out_ch, 3, 1, 1, self.relu_slope,
                              dtype=self.dtype, name="conv")(x + y)
                x = leaky_relu(x, self.relu_slope)
        else:
            x = ConvLayer(self.out_ch, 3, 1, 1, self.relu_slope,
                          dtype=self.dtype, name="conv")(x)
            x = leaky_relu(x, self.relu_slope)

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
        x = conv2d(x, self.out_ch, 4, 2, 1, use_bias=False,
                   dtype=self.dtype, name="down")
        return x, state


class TransposeRecurrentConvLayer(nn.Module):
    """Decoder stage: 2x2/2 transposed conv up, concat hidden state,
    ConvResidualBlocks trunk; new state = output."""
    out_ch: int
    num_block: int = 1
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, prev_state):
        out = conv_transpose_up(x, self.out_ch, dtype=self.dtype, name="up")
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
        # NHWC pixel shuffle r=2: (b,h,w,c) -> (b,2h,2w,c/4)
        out = x.reshape(b, h, w, 2, 2, c // 4)
        out = out.transpose(0, 1, 3, 2, 4, 5).reshape(b, 2 * h, 2 * w, c // 4)
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

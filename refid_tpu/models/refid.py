"""REFID flagship network — FinalBidirectionAttenfusion (flax, NHWC).

A TPU-first redesign of the reference network
(basicsr/models/archs/XXNet_final_attenfusion_arch.py:81-218): the two
temporal propagation loops become two ``nn.scan``s over the voxel-bin axis
(backward first, then forward), compiled once per step instead of unrolled.

Parity notes (replicate-or-fix decisions, each exposed as a config flag):

* ``aliased_backward_states`` (default True, matching released checkpoints):
  the reference builds ``backward_all_states`` with
  ``insert(0, backward_prev_states)`` — inserting the SAME mutable list every
  iteration (XXNet_final_attenfusion_arch.py:181).  Every forward frame
  therefore fuses the FINAL backward state (the one computed at frame 0),
  not its own frame's state.  In parity mode we exploit this: the backward
  scan only needs its final carry — nothing is stacked, an O(t) activation
  memory saving.  Set False for the (presumably intended) per-frame
  bidirectional states.

* No output activation: the reference resolves an activation attr but never
  applies it (arch file :59 vs :215); the prediction conv output is returned
  raw.

* EGACA attention fusion is enabled only at encoder index 1
  (arch file :107).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name as _ckpt_name
import flax.linen as nn

from refid_tpu.models.layers import (
    ConvLayer, ConvParams, ImageEncoderConvBlock, ResidualBlock, apply_conv,
)
from refid_tpu.models.recurrent import (
    PixelShuffleRecurrentConvLayer, RecurrentEncoderStage,
    TransposeRecurrentConvLayer, UpsampleConvLayer,
)

Dtype = Any


@dataclasses.dataclass(frozen=True)
class RefidConfig:
    """Hyperparameters; defaults are the production blur-VFI 11+1 config
    (options/train/GoPro/Final_bidirectionEncoder_XXNet_1attenfusion.yml:78-87)."""
    img_chn: int = 26
    ev_chn: int = 2
    out_chn: int = 3
    num_encoders: int = 3
    base_num_channels: int = 32
    num_block: int = 1            # blocks per SimpleRecurrentConv trunk
    num_residual_blocks: int = 2  # bottleneck resblocks
    atten_fuse_at: Tuple[int, ...] = (1,)
    use_first_dcn: bool = False   # deformable first conv per encoder stage.
    # The reference ctor threads this flag into every stage
    # (XXNet_final_attenfusion_arch.py:92,110-115) but the flagship stage
    # class silently DROPS it (recurrent_sub_modules.py:252-268 builds no
    # DCN); the ablation stage classes honor it (:164-165).  Here it is
    # honored (ops/deform_conv.py); False = released-checkpoint parity.
    aliased_backward_states: bool = True   # reference checkpoint parity
    remat: bool = False                    # rematerialize scan steps
    remat_policy: str = "all"              # 'all': recompute everything in
    # the backward pass (lowest memory); 'stage_outputs': save each encoder
    # stage's (downsampled, half-res) output and the decoder outputs —
    # jax.checkpoint_policies.save_only_these_names — trading memory for
    # less recompute (the bwd loops are 82% of the step,
    # scripts/profile_train.py)
    unroll: bool = False                   # trace-time loop instead of scan
                                           # (same params; lets XLA pick one
                                           # layout across all t steps)
    scan_unroll: int = 1                   # lax.scan unroll factor: XLA
    # unrolls this many steps per while-loop iteration — bounded-graph
    # middle ground between scan (compile-fast, layout-thrash) and full
    # unroll (the relay's compile helper dies on the t=23 training graph)
    scan_split_transpose: bool = False     # lax.scan _split_transpose:
    # split each scan's AD transpose into separate reconstruction/backward
    # loops (training-only experiment; the grad loops are 82% of the step,
    # scripts/profile_train.py)
    dtype: Optional[Any] = None            # compute dtype (None -> f32)
    # --- ablation axes (paper lineage, expressed as flags instead of the
    # reference's per-variant arch files XXNet_*_arch.py) ---
    bidirectional: bool = True             # False: unidirectional encoder
    recurrent_cell: str = "simpleconv"     # 'convgru' | 'convlstm'
    encoder_stage: str = "then_down"       # reference stage-class lineage:
    # 'then_down' (k3/s1 + separate 4x4/2 down, the flagship and
    # 'simpleconvThendown' ablations), 'conv_down' (k5/s2 conv downsamples,
    # SimpleRecurrentConvLayer = 'simpleconv' ablations), 'rec_conv'
    # (k5/s2 + ConvLSTM/GRU cell, RecurrentConvLayer = 'convlstm'/'convgru'
    # ablations; requires recurrent_cell in those two)
    decoder_type: str = "transpose_recurrent"  # 'pixelshuffle_recurrent' |
                                               # 'upsample_conv' (no state)
    bottleneck_img_add: bool = True        # add deepest image feat in the
    # first resblock (flagship :199-203); every ablation lineage runs plain
    # resblocks without the image add
    apply_resblocks: bool = True           # False: create NO bottleneck
    # resblocks.  The {bidirection, allbidirection} decoder-recurrent
    # lineages BUILD resblocks but never call them in forward
    # (XXNet_decoder_recurrent_bidirection_arch.py:133 builds, forward never
    # references) — dead params there, absent here.
    bidir_decoder: bool = False            # all-bidirection lineage: the
    # backward pass also runs the decoder stack (own states), and forward
    # decoders fuse the backward decoder state through a 1x1 conv
    # (XXNet_decoder_recurrent_allbidirection_arch.py:196-199,216-218).
    # The reference arch is runtime-broken (see archs.py); this is the
    # fixed-as-intended semantics.  Aliased-states mode only.
    siamese_fusion: Optional[str] = None   # 'se' | 'add': run the image
    # encoder per input frame with shared weights and fuse the two per-scale
    # feature maps AFTER each event-encoder stage (the siamese lineage,
    # XXNet_decoder_recurrent_siamese{,_noatten}_arch.py:79; 'se' =
    # img_ev_fusion SE gates, 'add' = e + x0 + x1).  Unidirectional only —
    # the reference siamese forward has no bidirectional variant (:140-141).

    @property
    def encoder_in_sizes(self) -> Tuple[int, ...]:
        return tuple(self.base_num_channels * 2 ** i
                     for i in range(self.num_encoders))

    @property
    def encoder_out_sizes(self) -> Tuple[int, ...]:
        return tuple(self.base_num_channels * 2 ** (i + 1)
                     for i in range(self.num_encoders))

    @property
    def max_num_channels(self) -> int:
        return self.base_num_channels * 2 ** self.num_encoders


class _BackwardStep(nn.Module):
    """One backward-propagation step over all encoder scales."""
    cfg: RefidConfig

    @nn.compact
    def __call__(self, carry, const, ev_t):
        cfg = self.cfg
        if cfg.bidir_decoder:
            states, dec_states = carry
        else:
            states, dec_states = carry, None
        x_blocks, head_kb = const
        new_states = []
        e_blocks = []
        # shared event head applied per frame (params owned by the parent);
        # avoids materializing the (b, t, h, w, base) head activation
        e = apply_conv(ev_t, head_kb[0], head_kb[1], 1, 2, relu_slope=0.2,
                       dtype=cfg.dtype)
        for i in range(cfg.num_encoders):
            y = None if i == 0 else x_blocks[i - 1]
            e, s = RecurrentEncoderStage(
                in_ch=cfg.encoder_in_sizes[i],
                out_ch=cfg.encoder_out_sizes[i],
                num_block=cfg.num_block,
                use_atten_fuse=i in cfg.atten_fuse_at,
                fuse_two_direction=False,
                cell=cfg.recurrent_cell,
                stage_type=cfg.encoder_stage,
                use_first_dcn=cfg.use_first_dcn,
                dtype=cfg.dtype,
                name=f"enc_{i}",
            )(e, y, states[i], None)
            e = _ckpt_name(e, "stage_out")
            e_blocks.append(e)
            new_states.append(s)
        new_states = tuple(new_states)
        if cfg.bidir_decoder:
            # the all-bidirection lineage runs the decoder stack in the
            # backward pass too (no bottleneck resblocks there, arch
            # forward :196-199); its final states feed the forward decoders
            new_dec = []
            for i in range(cfg.num_encoders):
                skip = e_blocks[cfg.num_encoders - i - 1]
                out_ch = cfg.encoder_out_sizes[cfg.num_encoders - i - 1] // 2
                e, s = TransposeRecurrentConvLayer(
                    out_ch=out_ch, num_block=1, dtype=cfg.dtype,
                    name=f"dec_{i}")(e + skip, dec_states[i])
                new_dec.append(s)
            new_states = (new_states, tuple(new_dec))
        ys = () if cfg.aliased_backward_states else new_states
        return new_states, ys


class _ForwardStep(nn.Module):
    """One forward step: encoder scales (+ bidir fuse), bottleneck,
    recurrent decoder, prediction."""
    cfg: RefidConfig

    @nn.compact
    def __call__(self, carry, const, xs):
        cfg = self.cfg
        fwd_states, dec_states = carry
        if cfg.aliased_backward_states or not cfg.bidirectional:
            # parity: the (constant) final backward state is loop-invariant
            x_blocks, head, head_kb, bwd_states = const
            ev_t = xs
        else:
            x_blocks, head, head_kb = const
            ev_t, bwd_states = xs
        bwd_dec_states = None
        if cfg.bidir_decoder and cfg.bidirectional:
            bwd_states, bwd_dec_states = bwd_states
        e_t = apply_conv(ev_t, head_kb[0], head_kb[1], 1, 2, relu_slope=0.2,
                         dtype=cfg.dtype)

        e = e_t
        new_fwd = []
        e_blocks = []
        siamese = cfg.siamese_fusion is not None
        for i in range(cfg.num_encoders):
            # siamese: no input-side image fuse — the two per-frame feature
            # maps are fused AFTER the stage (siamese arch :180-185)
            y = None if (i == 0 or siamese) else x_blocks[i - 1]
            e, s = RecurrentEncoderStage(
                in_ch=cfg.encoder_in_sizes[i],
                out_ch=cfg.encoder_out_sizes[i],
                num_block=cfg.num_block,
                use_atten_fuse=i in cfg.atten_fuse_at,
                fuse_two_direction=(cfg.bidirectional
                                    and cfg.encoder_stage != "rec_conv"),
                cell=cfg.recurrent_cell,
                stage_type=cfg.encoder_stage,
                use_first_dcn=cfg.use_first_dcn,
                dtype=cfg.dtype,
                name=f"enc_{i}",
            )(e, y, fwd_states[i],
              bwd_states[i] if (cfg.bidirectional
                                and cfg.encoder_stage != "rec_conv")
              else None)
            e = _ckpt_name(e, "stage_out")
            if siamese:
                x0f, x1f = x_blocks[i]
                if cfg.siamese_fusion == "se":
                    from refid_tpu.models.fusion import ImgEvFusion
                    e = ImgEvFusion(cfg.encoder_out_sizes[i], dtype=cfg.dtype,
                                    name=f"img_ev_fusion_{i}")(e, x0f, x1f)
                else:  # 'add' (siamese_noatten :183-185)
                    e = e + x0f + x1f
            e_blocks.append(e)
            new_fwd.append(s)

        # bottleneck: in the flagship the first resblock adds the deepest
        # image feature (:199-203); ablation lineages run plain resblocks
        # (bottleneck_img_add=False; the siamese lineage too, :186-188) or
        # none at all (apply_resblocks=False, see RefidConfig)
        if cfg.apply_resblocks:
            for i in range(cfg.num_residual_blocks):
                img_add = cfg.bottleneck_img_add and not siamese
                inp = e + x_blocks[-1] if (i == 0 and img_add) else e
                e = ResidualBlock(cfg.max_num_channels, dtype=cfg.dtype,
                                  name=f"res_{i}")(inp)

        # recurrent decoder with skip-sums
        decoder_cls = {
            "transpose_recurrent": TransposeRecurrentConvLayer,
            "pixelshuffle_recurrent": PixelShuffleRecurrentConvLayer,
            "upsample_conv": UpsampleConvLayer,
        }[cfg.decoder_type]
        new_dec = []
        for i in range(cfg.num_encoders):
            skip = e_blocks[cfg.num_encoders - i - 1]
            out_ch = cfg.encoder_out_sizes[cfg.num_encoders - i - 1] // 2
            if cfg.decoder_type == "pixelshuffle_recurrent":
                # the ps lineage hardcodes skip_CONCAT for the decoder input
                # (XXNet_ps_decoder_recurrent_arch.py:171) even though
                # skip_type='sum' everywhere else — 2x channels in, and the
                # r=2 shuffle brings them back to out_ch
                e, s = decoder_cls(out_ch=out_ch, num_block=1, dtype=cfg.dtype,
                                   name=f"dec_{i}")(
                                       jnp.concatenate([e, skip], axis=-1),
                                       dec_states[i])
            elif cfg.decoder_type == "upsample_conv":
                e, s = decoder_cls(out_ch=out_ch, dtype=cfg.dtype,
                                   name=f"dec_{i}")(e + skip, dec_states[i])
            elif bwd_dec_states is not None:
                e, s = decoder_cls(out_ch=out_ch, num_block=1,
                                   fuse_two_direction=True, dtype=cfg.dtype,
                                   name=f"dec_{i}")(e + skip, dec_states[i],
                                                    bwd_dec_states[i])
            else:
                e, s = decoder_cls(out_ch=out_ch, num_block=1, dtype=cfg.dtype,
                                   name=f"dec_{i}")(e + skip, dec_states[i])
            e = _ckpt_name(e, "dec_out")
            new_dec.append(s)

        # siamese lineage predicts from the decoder output alone (:199-201)
        pred_in = e if siamese else e + head
        out = ConvLayer(cfg.out_chn, 3, 1, 1, relu_slope=None,
                        dtype=cfg.dtype, name="pred")(pred_in)
        return (tuple(new_fwd), tuple(new_dec)), out


class FinalBidirectionAttenfusion(nn.Module):
    """Bidirectional event-recurrent UNet for deblur / VFI / blur-VFI.

    Inputs (NHWC):
      x:     (b, h, w, img_chn)  packed image (+ deblur-voxel) channels, or
             (b, 2, h, w, c) which is flattened to (b, h, w, 2c) like the
             reference's rearrange (arch file :140-141).
      event: (b, t, h, w, ev_chn) adjacent voxel-bin pairs.

    Output: (b, t, h, w, out_chn) — one sharp frame per bin pair.
    """
    cfg: RefidConfig

    @nn.compact
    def __call__(self, x, event):
        cfg = self.cfg
        if x.ndim == 5:  # (b, 2, h, w, c) -> (b, h, w, 2c)
            b_, two, h_, w_, c_ = x.shape
            x = jnp.concatenate([x[:, i] for i in range(two)], axis=-1)
        b, t, h, w, _ = event.shape
        base = cfg.base_num_channels

        # event head params (applied per frame INSIDE the scans, shared by
        # both directions like the reference single ``head`` module)
        head_kb = ConvParams(base, cfg.ev_chn, 5, name="head")()

        if cfg.siamese_fusion is not None:
            # siamese: run head+encoder on each input frame with SHARED
            # weights by stacking the two channel-halves along batch
            # (reference rearrange 'b (t c) h w -> (t b) c h w', :155-156)
            assert not cfg.bidirectional, \
                "the siamese lineage is unidirectional (siamese arch :140)"
            c2 = x.shape[-1] // 2
            x2 = jnp.concatenate([x[..., :c2], x[..., c2:]], axis=0)
            xh = ConvLayer(base, 5, 1, 2, 0.2, dtype=cfg.dtype,
                           name="head_img")(x2)
            head = None
            x_blocks = []
            cur = xh
            for i in range(cfg.num_encoders):
                cur = ImageEncoderConvBlock(cfg.encoder_out_sizes[i],
                                            downsample=True, dtype=cfg.dtype,
                                            name=f"img_enc_{i}")(cur)
                x_blocks.append((cur[:b], cur[b:]))
            x_blocks = tuple(x_blocks)
        else:
            xh = ConvLayer(base, 5, 1, 2, 0.2, dtype=cfg.dtype,
                           name="head_img")(x)
            head = xh

            x_blocks = []
            cur = xh
            for i in range(cfg.num_encoders):
                cur = ImageEncoderConvBlock(cfg.encoder_out_sizes[i],
                                            downsample=True, dtype=cfg.dtype,
                                            name=f"img_enc_{i}")(cur)
                x_blocks.append(cur)
            x_blocks = tuple(x_blocks)

        dt = cfg.dtype or jnp.float32
        if cfg.encoder_stage == "rec_conv":
            assert cfg.recurrent_cell in ("convgru", "convlstm"), \
                "rec_conv stage is the ConvLSTM/ConvGRU lineage"
            assert not cfg.bidirectional, \
                ("rec_conv has no bidirectional-state fuse — the reference "
                 "RecurrentConvLayer takes no bi_direction_state and the "
                 "bidirection archs crash with convlstm/convgru "
                 "(models/archs.py breakage map)")
        if cfg.bidir_decoder:
            assert cfg.aliased_backward_states and cfg.bidirectional, \
                "bidir_decoder replicates the aliased all-bidirection lineage"
        # recurrent states: PRE-downsample resolution for then_down stages
        # (the conv downsamples AFTER the cell), POST-down for the k5/s2
        # conv_down / rec_conv lineages (the conv downsamples first)
        state_shift = 0 if cfg.encoder_stage == "then_down" else 1

        def _zero_state(i):
            z = jnp.zeros((b, h // 2 ** (i + state_shift),
                           w // 2 ** (i + state_shift),
                           cfg.encoder_out_sizes[i]), dt)
            return (z, z) if cfg.recurrent_cell == "convlstm" else z
        enc_state_zeros = tuple(_zero_state(i)
                                for i in range(cfg.num_encoders))

        # decoder states at POST-upsample resolution per decoder stage
        dec_state_zeros = tuple(
            jnp.zeros((b,
                       h // 2 ** (cfg.num_encoders - i - 1),
                       w // 2 ** (cfg.num_encoders - i - 1),
                       cfg.encoder_out_sizes[cfg.num_encoders - i - 1] // 2),
                      dt)
            for i in range(cfg.num_encoders))

        bwd_carry0 = ((enc_state_zeros, dec_state_zeros)
                      if cfg.bidir_decoder else enc_state_zeros)

        back_cls = _BackwardStep
        fwd_cls = _ForwardStep
        if cfg.remat:
            if cfg.remat_policy == "stage_outputs":
                policy = jax.checkpoint_policies.save_only_these_names(
                    "stage_out", "dec_out")
                back_cls = nn.remat(back_cls, policy=policy)
                fwd_cls = nn.remat(fwd_cls, policy=policy)
            else:
                back_cls = nn.remat(back_cls)
                fwd_cls = nn.remat(fwd_cls)

        if cfg.bidirectional:
            if cfg.unroll:
                bwd_mod = back_cls(cfg, name="bwd")
                states = bwd_carry0
                ys_by_time = [None] * t
                for k in range(t - 1, -1, -1):
                    states, ys = bwd_mod(states, (x_blocks, head_kb),
                                         event[:, k])
                    ys_by_time[k] = ys
                bwd_final = states
                if cfg.aliased_backward_states:
                    bwd_stack = None
                else:  # stack like nn.scan(out_axes=1): time-index order
                    bwd_stack = jax.tree.map(
                        lambda *xs: jnp.stack(xs, axis=1), *ys_by_time)
            else:
                BackScan = nn.scan(
                    back_cls, variable_broadcast="params",
                    split_rngs={"params": False},
                    in_axes=(nn.broadcast, 1), out_axes=1, reverse=True,
                    unroll=cfg.scan_unroll,
                    _split_transpose=cfg.scan_split_transpose)
                bwd_final, bwd_stack = BackScan(cfg, name="bwd")(
                    bwd_carry0, (x_blocks, head_kb), event)
        else:
            bwd_final, bwd_stack = enc_state_zeros, None

        carry0 = (enc_state_zeros, dec_state_zeros)
        if cfg.aliased_backward_states or not cfg.bidirectional:
            const = (x_blocks, head, head_kb, bwd_final)
            xs = event
        else:
            const = (x_blocks, head, head_kb)
            xs = (event, bwd_stack)
        if cfg.unroll:
            fwd_mod = fwd_cls(cfg, name="fwd")
            carry = carry0
            outs = []
            for k in range(t):
                xk = jax.tree.map(lambda a: a[:, k], xs)
                carry, o = fwd_mod(carry, const, xk)
                outs.append(o)
            return jnp.stack(outs, axis=1)
        FwdScan = nn.scan(
            fwd_cls, variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=(nn.broadcast, 1), out_axes=1, unroll=cfg.scan_unroll,
            _split_transpose=cfg.scan_split_transpose)
        _, out = FwdScan(cfg, name="fwd")(carry0, const, xs)
        return out


def build_model(arch_opt: dict) -> Tuple[FinalBidirectionAttenfusion, RefidConfig]:
    """Build from a reference-style ``network_g`` YAML dict."""
    cfg = RefidConfig(
        img_chn=arch_opt["img_chn"],
        ev_chn=arch_opt["ev_chn"],
        out_chn=arch_opt.get("out_chn", 3),
        num_encoders=arch_opt.get("num_encoders", 3),
        base_num_channels=arch_opt.get("base_num_channels", 32),
        num_block=arch_opt.get("num_block", 1),
        num_residual_blocks=arch_opt.get("num_residual_blocks", 2),
    )
    return FinalBidirectionAttenfusion(cfg), cfg

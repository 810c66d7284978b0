"""Jitted training step + optimizer wiring.

Replaces the reference's per-model ``optimize_parameters``
(basicsr/models/twoImage_event_recurrent_model.py:273-310): one functional
``train_step`` under ``jax.jit`` with GSPMD sharding — the gradient
allreduce over the 'data' mesh axis is inserted by XLA, not by DDP hooks.

Recipe parity (production blur-VFI 11+1 config):
  AdamW(lr 2e-4, betas (0.9, 0.99), wd 1e-4)  [yml:98-102]
  TrueCosineAnnealingLR -> eta_min 1e-7       [yml:104-107]
  CharbonnierLoss over the full frame stack   [yml:113-116, model :284]
  global grad-norm clip 0.01                  [model :306]
  NO EMA (the reference has none; optional here, off by default).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from refid_tpu.train.schedules import build_schedule

__all__ = ["TrainState", "build_optimizer", "make_train_step",
           "create_train_state"]


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    ema_params: Optional[Any] = None

    def apply_gradients(self, grads):
        updates, new_opt_state = self.tx.update(grads, self.opt_state,
                                                self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(step=self.step + 1, params=new_params,
                            opt_state=new_opt_state)


def build_optimizer(train_opt: dict, total_iter: int):
    """Build the optax chain from a reference-style ``train`` option dict."""
    optim = dict(train_opt["optim_g"])
    typ = optim.pop("type")
    lr = optim.pop("lr")
    schedule = build_schedule(train_opt["scheduler"], lr, total_iter,
                              train_opt.get("warmup_iter", -1))
    clip = train_opt.get("grad_clip_norm", 0.01)

    parts = []
    if clip and clip > 0:
        parts.append(optax.clip_by_global_norm(clip))
    if typ == "AdamW":
        betas = optim.pop("betas", (0.9, 0.999))
        parts.append(optax.adamw(
            learning_rate=schedule, b1=betas[0], b2=betas[1],
            weight_decay=optim.pop("weight_decay", 0.0), eps=1e-8))
    elif typ == "Adam":
        betas = optim.pop("betas", (0.9, 0.999))
        parts.append(optax.adam(learning_rate=schedule, b1=betas[0],
                                b2=betas[1]))
    elif typ == "SGD":
        parts.append(optax.sgd(learning_rate=schedule,
                               momentum=optim.pop("momentum", 0.0)))
    else:
        raise ValueError(f"unknown optimizer {typ!r}")

    # Per-param-group LR for deformable-conv offsets.  The reference's group
    # matches only TOP-LEVEL modules named 'offsets'/'dcns'
    # (k.startswith('module.offsets'), twoImage_event_recurrent_model.py:74)
    # — no REFID arch has those, so the 0.1x group is EMPTY in every shipped
    # recipe; hence the default here is 1.0 (no-op).  When set != 1, the mask
    # is scoped to exact module-name keys: the reference's top-level
    # 'offsets'/'dcns', plus 'conv_offset' (this repo's
    # ModulatedDeformConvPack side conv — the use_first_dcn analog).
    # Scaling the post-optimizer update equals scaling that group's lr —
    # AdamW updates are linear in lr.
    mult = train_opt.get("dcn_lr_mult", 1.0)
    if mult != 1.0:
        def _dcn_mask(params):
            def is_dcn(path):
                keys = [str(getattr(k, "key", k)) for k in path]
                if keys and keys[0] == "params":  # flax collection wrapper
                    keys = keys[1:]
                return (any(k == "conv_offset" for k in keys)
                        or (keys and keys[0] in ("offsets", "dcns")))
            return jax.tree_util.tree_map_with_path(
                lambda p, _: is_dcn(p), params)
        parts.append(optax.masked(optax.scale(mult), _dcn_mask))
    return optax.chain(*parts), schedule


def create_train_state(params, tx, ema_decay: Optional[float] = None):
    ema = jax.tree_util.tree_map(jnp.copy, params) if ema_decay else None
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      opt_state=tx.init(params), ema_params=ema, tx=tx)


def make_train_step(apply_fn: Callable, loss_fn: Callable,
                    ema_decay: Optional[float] = None,
                    donate: bool = True):
    """Build the jitted train step.

    ``apply_fn(params, lq, voxel) -> pred``; ``loss_fn(pred, gt) -> scalar``.
    Batch dims may be sharded over the mesh; XLA inserts the allreduce.
    """

    def step_fn(state: TrainState, lq, voxel, gt):
        def compute_loss(params):
            pred = apply_fn(params, lq, voxel)
            return loss_fn(pred, gt)

        loss, grads = jax.value_and_grad(compute_loss)(state.params)
        new_state = state.apply_gradients(grads)
        if ema_decay is not None:
            new_ema = jax.tree_util.tree_map(
                lambda e, p: e * ema_decay + p * (1.0 - ema_decay),
                state.ema_params, new_state.params)
            new_state = new_state.replace(ema_params=new_ema)
        metrics = {"loss": loss,
                   "grad_norm": optax.global_norm(grads)}
        return new_state, metrics

    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())

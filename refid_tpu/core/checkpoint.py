"""Checkpointing via orbax + auto-resume.

Replaces the reference's two-artifact scheme (``net_g_<iter>.pth`` +
``<iter>.state``, basicsr/models/base_model.py:188-323) with a single orbax
checkpoint per step holding params / ema / opt_state / step / epoch, plus:

  * auto-resume: scan the checkpoint dir for the latest step
    (reference: train.py:143-163 scans ``training_states/*.state``)
  * one-way import of reference ``.pth`` weights via
    refid_tpu.models.convert (``pretrain_network_g`` option)
"""

from __future__ import annotations

import os
from typing import Any, Optional

import numpy as np

import jax
import orbax.checkpoint as ocp

__all__ = ["CheckpointManager"]


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: Optional[int] = None):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True,
                enable_async_checkpointing=False))

    def save(self, step: int, params: Any, opt_state: Any = None,
             ema_params: Any = None, epoch: int = 0,
             extra: Optional[dict] = None):
        payload = {"params": params, "epoch": np.asarray(epoch, np.int64)}
        if opt_state is not None:
            payload["opt_state"] = opt_state
        if ema_params is not None:
            payload["ema_params"] = ema_params
        if extra:
            payload["extra"] = extra
        self._mgr.save(step, args=ocp.args.StandardSave(payload))
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, step: Optional[int] = None,
                template: Optional[dict] = None) -> dict:
        step = step if step is not None else self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self.directory}")
        if template is not None:
            return self._mgr.restore(
                step, args=ocp.args.StandardRestore(template))
        return self._mgr.restore(step)

    def close(self):
        self._mgr.close()

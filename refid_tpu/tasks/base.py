"""Task layer (the reference's L4 "model" classes).

A task owns: the flax network (from the ARCHS registry), train state
(optax + optional EMA), jitted step/predict functions, checkpoint manager,
and validation logic.  It replaces the reference's per-task-x-(train|test)
class explosion (basicsr/models/*_model.py, ~3.5k LoC of copies) — test-mode
is just ``is_train=False``.

Device placement: batches are device_put with batch-dim sharding over the
mesh ('data' axis); XLA GSPMD handles the DP gradient allreduce
(vs DistributedDataParallel at base_model.py:57-75).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp

from refid_tpu.core.registry import ARCHS, MODELS
from refid_tpu.core.checkpoint import CheckpointManager
from refid_tpu.models import archs as _archs  # noqa: F401 (registers archs)
from refid_tpu.train.losses import build_loss
from refid_tpu.train.trainer import (TrainState, build_optimizer,
                                     create_train_state, make_train_step)
from refid_tpu.parallel import (make_mesh, shard_batch, replicate_sharding,
                                replicate)

__all__ = ["RestorationTaskBase", "build_task"]


def build_task(opt: dict):
    cls = MODELS.get(opt["model_type"])
    return cls(opt)


class RestorationTaskBase:
    """Common wiring; subclasses define feed/predict/validation semantics."""

    def __init__(self, opt: dict):
        self.opt = opt
        self.is_train = opt.get("is_train", True)
        self.net = ARCHS.get(opt["network_g"]["type"])(opt["network_g"])
        self.params: Optional[Any] = None
        self.state: Optional[TrainState] = None
        self.start_iter = 0
        self.start_epoch = 0
        self._predict_jit = jax.jit(self._make_predict_fn(opt))

        spatial = opt.get("mesh", {}).get("spatial", 1)
        self.mesh = make_mesh(data=-1, spatial=spatial)

        self.ema_decay = None
        if self.is_train and "train" in opt:
            t = opt["train"]
            self.loss_fn = build_loss(t.get("pixel_opt", {
                "type": "CharbonnierLoss", "loss_weight": 1.0,
                "reduction": "mean"}))
            self.tx, self.lr_schedule = build_optimizer(
                t, t.get("total_iter", 200000))
            self.ema_decay = t.get("ema_decay")
            # width-folded lax.scan training forward (exact math — equal
            # forward/grads/loss-trajectory, tests/test_fast_scan.py;
            # measured 443 -> 367 ms/step at the production recipe shape,
            # PERFORMANCE.md round 3).  Auto-enabled when the config
            # matches the production architecture (same gate as the
            # serving fast path); train.folded_apply: false opts out,
            # true asserts applicability.
            from refid_tpu.pipeline import _fast_serving_applicable
            from refid_tpu.serve.evhinet_fast import evhinet_foldable
            cfg = getattr(self.net, "cfg", None)
            applicable = cfg is not None and _fast_serving_applicable(cfg)
            is_evhinet = evhinet_foldable(self.net)
            folded = t.get("folded_apply")
            if folded is None:
                # EVHINet's folded training forward is exact and tested
                # but its step time is unmeasured -> opt-in only
                folded = applicable
            elif folded and not (applicable or is_evhinet):
                raise ValueError(
                    "train.folded_apply requires the production "
                    "FinalBidirectionAttenfusion or EVHINet configuration "
                    "(see pipeline._fast_serving_applicable)")
            if folded and is_evhinet:
                from refid_tpu.serve.evhinet_fast import evhinet_fast_forward
                net = self.net

                def apply_fn(params, lq, voxel):
                    return evhinet_fast_forward(
                        params, lq, voxel, depth=net.depth,
                        fac_place=net.fac_place, hin_left=net.hin_left,
                        hin_right=net.hin_right,
                        relu_slope=net.relu_slope, dtype=net.dtype)
            elif folded:
                from refid_tpu.serve.fast_scan import make_fast_apply
                apply_fn = make_fast_apply(cfg, remat=t.get(
                    "folded_apply_remat", True))
            else:
                apply_fn = self.net.apply
            self._train_step = make_train_step(
                apply_fn, self.loss_fn, ema_decay=self.ema_decay)
        self.ckpt: Optional[CheckpointManager] = None
        models_dir = opt.get("path", {}).get("models")
        if models_dir:
            self.ckpt = CheckpointManager(models_dir)

    # --- parameter lifecycle -------------------------------------------------

    def init_params(self, sample_batch: Dict[str, np.ndarray], seed: int = 0):
        lq = jnp.asarray(sample_batch["lq"][:1])
        vox = jnp.asarray(sample_batch["voxel"][:1])
        self.params = self.net.init(jax.random.PRNGKey(seed), lq, vox)
        return self.params

    def load_pretrained(self, path: str, param_key: str = "params"):
        """Load reference ``.pth`` (converted) or an orbax dir."""
        if path.endswith(".pth"):
            from refid_tpu.models.convert import load_pth_params
            cfg = getattr(self.net, "cfg", None)
            self.params = load_pth_params(path, cfg, param_key, net=self.net)
        else:
            mgr = CheckpointManager(path)
            restored = mgr.restore()
            self.params = restored["params"]
        return self.params

    def setup_train_state(self):
        assert self.params is not None, "call init_params/load_pretrained first"
        state = create_train_state(self.params, self.tx,
                                   ema_decay=self.ema_decay)
        self.state = replicate(state, self.mesh)
        return self.state

    # --- checkpointing / resume ---------------------------------------------

    def save(self, current_iter: int, epoch: int = 0):
        if self.ckpt is None:
            return
        st = self.state
        self.ckpt.save(current_iter, st.params if st else self.params,
                       opt_state=st.opt_state if st else None,
                       ema_params=st.ema_params if st else None, epoch=epoch)

    def auto_resume(self) -> bool:
        """Resume from the latest checkpoint if one exists
        (reference: train.py:143-163)."""
        if self.ckpt is None or self.ckpt.latest_step() is None:
            return False
        assert self.state is not None, "setup_train_state before auto_resume"
        template = {"params": self.state.params,
                    "opt_state": self.state.opt_state,
                    "epoch": np.asarray(0, np.int64)}
        if self.state.ema_params is not None:
            template["ema_params"] = self.state.ema_params
        restored = self.ckpt.restore(template=template)
        step = self.ckpt.latest_step()
        self.state = self.state.replace(
            step=jnp.asarray(step, jnp.int32),
            params=restored["params"], opt_state=restored["opt_state"],
            ema_params=restored.get("ema_params"))
        self.params = self.state.params
        self.start_iter = step
        self.start_epoch = int(restored.get("epoch", 0))
        return True

    # --- steps ----------------------------------------------------------------

    def _to_device(self, batch: Dict[str, np.ndarray]):
        return shard_batch(
            {k: v for k, v in batch.items() if isinstance(v, np.ndarray)},
            self.mesh)

    def train_step(self, batch: Dict[str, np.ndarray]) -> Dict[str, float]:
        return self.train_step_device(self._to_device(batch))

    def train_step_device(self, dev_batch) -> Dict[str, float]:
        self.state, metrics = self._train_step(
            self.state, dev_batch["lq"], dev_batch["voxel"], dev_batch["gt"])
        return metrics

    def device_prefetch(self, batch_iter, depth: int = 2):
        """Async H2D double-buffer (the CUDAPrefetcher analog,
        prefetch_dataloader.py:84-126): ``device_put`` of batch k+1 is
        ENQUEUED before step k+1 is dispatched, so the transfer rides the
        async dispatch stream under the running step instead of
        serializing behind host dataloading."""
        import collections
        import itertools
        q = collections.deque()
        it = iter(batch_iter)
        for b in itertools.islice(it, depth):
            q.append(self._to_device(b))
        while q:
            out = q.popleft()
            nxt = next(it, None)
            if nxt is not None:
                q.append(self._to_device(nxt))
            yield out

    def _make_predict_fn(self, opt: dict):
        """Inference forward.  For the production architectures this is
        the width-folded serving forward — serve/fast_forward.py for the
        flagship (exact math, tests/test_fast_forward.py),
        serve/evhinet_fast.py for EVHINet (tests/test_evhinet_fast.py) —
        so the test/validate CLIs serve at packed-pipeline speed.
        ``val.folded_predict: false`` opts out.  ``val.int8`` (True /
        "scale0" for the flagship, True for EVHINet — DYNAMIC activation
        scales; not exact math) evaluates the quantized serving path at
        task level, e.g. scripts/eval_released.py --int8 against released
        checkpoints.  Shape applicability is decided per trace, falling
        back to ``net.apply``."""
        from refid_tpu.models.refid import FinalBidirectionAttenfusion
        from refid_tpu.pipeline import _fast_serving_applicable
        from refid_tpu.serve.evhinet_fast import evhinet_foldable
        net = self.net
        int8 = opt.get("val", {}).get("int8", False)
        if opt.get("val", {}).get("folded_predict", True) is False:
            assert not int8, "val.int8 requires the folded predict path"
            return net.apply

        if evhinet_foldable(net):
            def _pred(params, lq, voxel):
                h, w = lq.shape[1:3]
                if h % 4 == 0 and w % 4 == 0:
                    from refid_tpu.serve.evhinet_fast import \
                        evhinet_fast_forward
                    return evhinet_fast_forward(
                        params, lq, voxel, depth=net.depth,
                        fac_place=net.fac_place, hin_left=net.hin_left,
                        hin_right=net.hin_right, relu_slope=net.relu_slope,
                        dtype=net.dtype, int8=bool(int8))
                return net.apply(params, lq, voxel)

            return _pred

        cfg = getattr(net, "cfg", None)
        if (type(net) is FinalBidirectionAttenfusion and cfg is not None
                and _fast_serving_applicable(cfg)):
            # pack the (b,t,h,w,2) pair stack to the s2d serving format
            # HOST-side (pure reshape/transpose, exact) so the device
            # never reads the 64x-lane-padded raw stack — worth 1.6x at
            # 720p untiled (PERFORMANCE.md round-3 table)
            def _pack(lq, voxel):
                h, w = lq.shape[1:3]
                if voxel.ndim == 5 and voxel.shape[-1] == cfg.ev_chn \
                        and h % 8 == 0 and w % 8 == 0:
                    b, t, vh, vw, c = voxel.shape
                    voxel = np.ascontiguousarray(
                        np.asarray(voxel)
                        .reshape(b, t, vh // 2, 2, vw // 2, 2, c)
                        .transpose(0, 1, 2, 4, 3, 5, 6)
                        .reshape(b, t, vh // 2, vw // 2, 4 * c))
                return voxel

            self._predict_pack = _pack

            def _pred(params, lq, voxel):
                h, w = lq.shape[1:3]
                packed_in = (voxel.ndim == 5
                             and voxel.shape[-1] == 4 * cfg.ev_chn)
                if packed_in or (voxel.ndim == 5 and h % 8 == 0
                                 and w % 8 == 0):
                    from refid_tpu.serve import fast_forward
                    return fast_forward(params, cfg, lq, voxel, packed=True,
                                        int8=int8)
                return net.apply(params, lq, voxel)

            return _pred

        assert not int8, "val.int8 requires a foldable architecture"
        return net.apply

    def predict(self, lq: np.ndarray, voxel: np.ndarray,
                use_ema: bool = False) -> np.ndarray:
        params = self.params
        if use_ema and self.state is not None and self.state.ema_params:
            params = self.state.ema_params
        elif self.state is not None:
            params = self.state.params
        pack = getattr(self, "_predict_pack", None)
        if pack is not None:
            voxel = pack(lq, voxel)
        return self._predict_jit(params, jnp.asarray(lq), jnp.asarray(voxel))

    def current_lr(self) -> float:
        step = int(self.state.step) if self.state is not None else 0
        return float(self.lr_schedule(step))

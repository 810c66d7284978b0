"""Logging: root logger + training MessageLogger with ETA.

Parity: basicsr/utils/logger.py (MessageLogger :8-111, get_root_logger
:113-149).  TensorBoard is optional (tensorboardX/TF not required)."""

from __future__ import annotations

import datetime
import logging
import time
from typing import Optional

__all__ = ["get_root_logger", "MessageLogger", "init_tb_logger",
           "init_wandb_logger"]


def init_wandb_logger(opt: dict):
    """wandb in tensorboard-sync mode (parity: basicsr/utils/logger.py:87-110
    — the reference "only use[s] wandb to sync tensorboard log").  Honors
    ``logger.wandb.project`` / ``.resume_id``.  The wandb package is not
    installed in every deployment; its absence is a clean warning, not a
    crash (scalars still land in the TFRecord event files either way)."""
    log_opt = opt.get("logger", {}) or {}
    wandb_opt = log_opt.get("wandb") or {}
    if not wandb_opt.get("project"):
        return None
    logger = logging.getLogger("refid_tpu")
    try:
        import wandb
    except ImportError:
        logger.warning(
            "logger.wandb.project is set but the wandb package is not "
            "installed; skipping wandb sync (tb event files are unaffected)")
        return None
    resume_id = wandb_opt.get("resume_id")
    if resume_id:
        wandb_id, resume = resume_id, "allow"
        logger.warning(f"Resume wandb logger with id={wandb_id}.")
    else:
        wandb_id, resume = wandb.util.generate_id(), "never"
    wandb.init(id=wandb_id, resume=resume, name=opt.get("name"),
               config=opt, project=wandb_opt["project"],
               sync_tensorboard=True)
    logger.info(f"Use wandb logger with id={wandb_id}; "
                f"project={wandb_opt['project']}.")
    return wandb_id


def init_tb_logger(opt: dict):
    """Create a TensorBoardWriter under tb_logger/<name> when
    ``logger.use_tb_logger`` is set (parity: basicsr/utils/logger.py:71-85).
    Like the reference (train.py:70-76), wandb must be initialized BEFORE
    the tb writer so sync_tensorboard picks up the event files."""
    log_opt = opt.get("logger", {}) or {}
    if not log_opt.get("use_tb_logger"):
        if (log_opt.get("wandb") or {}).get("project"):
            logging.getLogger("refid_tpu").warning(
                "logger.wandb.project is set but use_tb_logger is false — "
                "wandb runs in tensorboard-sync mode and needs the tb "
                "writer (the reference asserts this, basicsr/train.py:73); "
                "wandb sync is DISABLED")
        return None
    if log_opt.get("wandb"):
        init_wandb_logger(opt)
    from refid_tpu.core.tb_writer import TensorBoardWriter
    root = opt.get("path", {}).get("root", ".")
    return TensorBoardWriter(f"{root}/tb_logger/{opt.get('name', 'exp')}")

_initialized = set()


def get_root_logger(name: str = "refid_tpu", log_level=logging.INFO,
                    log_file: Optional[str] = None) -> logging.Logger:
    logger = logging.getLogger(name)
    if name in _initialized:
        return logger
    fmt = "%(asctime)s %(levelname)s: %(message)s"
    sh = logging.StreamHandler()
    sh.setFormatter(logging.Formatter(fmt))
    logger.addHandler(sh)
    logger.setLevel(log_level)
    logger.propagate = False
    if log_file:
        fh = logging.FileHandler(log_file, "a")
        fh.setFormatter(logging.Formatter(fmt))
        logger.addHandler(fh)
    _initialized.add(name)
    return logger


class MessageLogger:
    """Periodic training log lines with lr / losses / ETA."""

    def __init__(self, opt: dict, start_iter: int = 1, tb_logger=None):
        self.exp_name = opt.get("name", "exp")
        self.interval = opt.get("logger", {}).get("print_freq", 100)
        self.start_iter = start_iter
        self.max_iters = opt["train"]["total_iter"]
        self.start_time = time.time()
        self.logger = get_root_logger()
        self.tb_logger = tb_logger

    def __call__(self, log_vars: dict):
        current_iter = log_vars.pop("iter")
        epoch = log_vars.pop("epoch", 0)
        lr = log_vars.pop("lr", None)

        message = (f"[{self.exp_name[:28]}..][epoch:{epoch:3d}, "
                   f"iter:{current_iter:8,d}")
        if lr is not None:
            message += f", lr:{lr:.3e}"
        message += ")] "

        if "time" in log_vars:
            iter_time = log_vars.pop("time")
            total_time = time.time() - self.start_time
            time_sec_avg = total_time / max(current_iter - self.start_iter + 1, 1)
            eta_sec = max(0.0, time_sec_avg * (self.max_iters - current_iter))
            eta = str(datetime.timedelta(seconds=int(eta_sec)))
            message += f"[eta: {eta}, time: {iter_time:.3f}s] "
        for k, v in log_vars.items():
            message += f"{k}: {float(v):.4e} "
        self.logger.info(message)
        if self.tb_logger is not None:
            scalars = {f"losses/{k}": float(v) for k, v in log_vars.items()}
            if lr is not None:
                scalars["learning_rate"] = float(lr)
            self.tb_logger.add_scalars(scalars, current_iter)

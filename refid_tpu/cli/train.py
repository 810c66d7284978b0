"""Training CLI — ``python -m refid_tpu.cli.train -opt <yml>``.

Replaces basicsr/train.py: one process drives all local TPU chips through
the device mesh (no torch.distributed.launch / Slurm launcher; multi-host
adds ``--num-processes/--process-id`` for jax.distributed).
"""

from __future__ import annotations

import argparse
import random
import time

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("-opt", required=True, help="Path to YAML option file.")
    p.add_argument("--root", default=None,
                   help="Experiment root (default: cwd).")
    p.add_argument("--max-iters", type=int, default=None,
                   help="Override train.total_iter (smoke runs).")
    p.add_argument("--coordinator", default=None)
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)

    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/refid_tpu_jax_cache")

    from refid_tpu.core.config import parse_options, dict2str
    from refid_tpu.core.logging_util import (get_root_logger, MessageLogger,
                                             init_tb_logger)
    from refid_tpu.data import build_dataset, build_loader
    from refid_tpu.parallel.mesh import init_distributed
    from refid_tpu.tasks import build_task

    init_distributed(args.coordinator, args.num_processes, args.process_id)

    opt = parse_options(args.opt, is_train=True, root=args.root)
    if args.max_iters:
        opt["train"]["total_iter"] = args.max_iters

    seed = opt.get("manual_seed", 0) or 0
    random.seed(seed + jax.process_index())
    np.random.seed(seed + jax.process_index())

    import os
    os.makedirs(opt["path"]["experiments_root"], exist_ok=True)
    logger = get_root_logger(
        log_file=f"{opt['path']['log']}/train_{opt['name']}.log")
    logger.info(f"devices: {jax.devices()}")
    logger.info(dict2str(opt))

    # dataloaders
    train_loader = val_loaders = None
    val_loaders = []
    for phase, dataset_opt in opt["datasets"].items():
        if phase == "train":
            dataset_opt.setdefault("seed", seed)
            train_set = build_dataset(dataset_opt)
            train_loader = build_loader(train_set, dataset_opt, True, seed)
            logger.info(f"train dataset: {len(train_set)} items, "
                        f"{len(train_loader)} batches/epoch")
        elif phase.startswith("val"):
            val_set = build_dataset(dataset_opt)
            val_loaders.append((dataset_opt,
                                build_loader(val_set, dataset_opt, False)))
            logger.info(f"val dataset: {len(val_set)} items")
    assert train_loader is not None, "no train dataset in options"
    if len(train_loader) == 0:
        raise ValueError(
            f"train loader is empty: global batch "
            f"(batch_size_per_gpu x {jax.local_device_count()} devices) "
            f"exceeds the dataset; raise dataset_enlarge_ratio or lower "
            f"batch_size_per_gpu")

    # task
    task = build_task(opt)
    first_batch = next(iter(train_loader))
    pretrain = opt["path"].get("pretrain_network_g")
    if pretrain:
        task.load_pretrained(pretrain)
        logger.info(f"loaded pretrained weights from {pretrain}")
    else:
        task.init_params(first_batch, seed)
    task.setup_train_state()
    if task.auto_resume():
        logger.info(f"auto-resumed from iter {task.start_iter}")

    total_iter = opt["train"]["total_iter"]
    val_freq = int(opt.get("val", {}).get("val_freq", 0) or 0)
    save_freq = int(opt.get("logger", {}).get("save_checkpoint_freq", 0) or 0)
    tb_logger = init_tb_logger(opt) if jax.process_index() == 0 else None
    msg_logger = MessageLogger(opt, task.start_iter + 1, tb_logger)

    current_iter = task.start_iter
    epoch = task.start_epoch
    t_iter = time.time()
    logger.info(f"start training from iter {current_iter} to {total_iter}")
    while current_iter < total_iter:
        train_loader.set_epoch(epoch)
        # async H2D double-buffer: batch k+1's device transfer is enqueued
        # while step k runs (reference CUDAPrefetcher analog)
        for dev_batch in task.device_prefetch(train_loader):
            if current_iter >= total_iter:
                break
            current_iter += 1
            metrics = task.train_step_device(dev_batch)
            if current_iter % opt.get("logger", {}).get("print_freq", 100) == 0:
                log_vars = {"iter": current_iter, "epoch": epoch,
                            "lr": task.current_lr(),
                            "time": time.time() - t_iter}
                log_vars.update({k: float(v) for k, v in metrics.items()})
                msg_logger(log_vars)
            t_iter = time.time()
            if save_freq and current_iter % save_freq == 0:
                logger.info(f"saving checkpoint at iter {current_iter}")
                task.save(current_iter, epoch)
            if val_freq and current_iter % val_freq == 0:
                for dopt, vloader in val_loaders:
                    res = task.validate(vloader, dopt, current_iter,
                                        save_img=opt.get("val", {}).get(
                                            "save_img", False), logger=logger)
                    if tb_logger is not None and res:
                        name = dopt.get("name", "val")
                        tb_logger.add_scalars(
                            {f"metrics/{name}/{k}": v
                             for k, v in res.items()}, current_iter)
        epoch += 1

    logger.info("training complete; saving final checkpoint")
    task.save(current_iter, epoch)
    for dopt, vloader in val_loaders:
        task.validate(vloader, dopt, current_iter, logger=logger)
    if tb_logger is not None:
        tb_logger.close()
    return task


if __name__ == "__main__":
    main()

"""Evaluation CLI — ``python -m refid_tpu.cli.test -opt <yml>``.

Replaces basicsr/test.py: builds the test loaders, loads weights
(reference ``.pth`` or orbax), runs task validation per loader.
"""

from __future__ import annotations

import argparse


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("-opt", required=True)
    p.add_argument("--root", default=None)
    p.add_argument("--max-items", type=int, default=None,
                   help="Evaluate only the first N items (smoke runs).")
    p.add_argument("--save-img", action="store_true")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)

    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/refid_tpu_jax_cache")

    from refid_tpu.core.config import parse_options, dict2str
    from refid_tpu.core.logging_util import get_root_logger
    from refid_tpu.data import build_dataset, build_loader
    from refid_tpu.tasks import build_task

    opt = parse_options(args.opt, is_train=False, root=args.root)
    import os
    os.makedirs(opt["path"]["results_root"], exist_ok=True)
    logger = get_root_logger(
        log_file=f"{opt['path']['log']}/test_{opt['name']}.log")
    logger.info(dict2str(opt))

    loaders = []
    for phase, dataset_opt in sorted(opt["datasets"].items()):
        ds = build_dataset(dataset_opt)
        loaders.append((dataset_opt, build_loader(ds, dataset_opt, False)))
        logger.info(f"test set {dataset_opt.get('name', phase)}: "
                    f"{len(ds)} items")

    task = build_task(opt)
    pretrain = opt["path"].get("pretrain_network_g")
    assert pretrain, "path.pretrain_network_g required for testing"
    task.load_pretrained(pretrain)

    results = {}
    save_img = args.save_img or opt.get("val", {}).get("save_img", False)
    for dataset_opt, loader in loaders:
        name = dataset_opt.get("name", "test")
        results[name] = task.validate(loader, dataset_opt, save_img=save_img,
                                      logger=logger,
                                      max_items=args.max_items)
    return results


if __name__ == "__main__":
    main()

"""Evaluate released reference checkpoints in one command.

Given a reference ``net_g_*.pth`` and a dataset root, this runs
convert -> (tiled) eval -> PSNR/SSIM, and prints the result as a
BASELINE.md-format table row — so the parity claim against the paper
numbers (BASELINE.md) is a single command the moment the artifacts exist:

    python scripts/eval_released.py --pth net_g_200000.pth \
        --dataroot /data/GoPro --config options/test/GoPro/Test_Final_1skip.yml

Any YAML under options/test/ works; --dataroot/--pth override the config's
paths.  --max-items N limits the run for smoke testing.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args(argv=None):
    p = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    p.add_argument("--pth", required=True,
                   help="Reference net_g_*.pth checkpoint (or orbax dir).")
    p.add_argument("--config", required=True,
                   help="Test YAML (options/test/...).")
    p.add_argument("--dataroot", default=None,
                   help="Override every dataset's dataroot.")
    p.add_argument("--root", default=None, help="Results root (default cwd).")
    p.add_argument("--max-items", type=int, default=None)
    p.add_argument("--save-img", action="store_true")
    p.add_argument("--int8", nargs="?", const="true", default=None,
                   choices=["true", "scale0"],
                   help="Evaluate the int8 (dynamic-scale) serving path "
                        "instead of exact bf16 — the one-command task-level "
                        "quantization quality check against released "
                        "checkpoints.")
    p.add_argument("--json-out", default=None,
                   help="Also dump results as JSON to this path.")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)

    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/refid_tpu_jax_cache")

    import yaml
    from refid_tpu.core.config import parse_options
    from refid_tpu.data import build_dataset, build_loader
    from refid_tpu.tasks import build_task

    opt = parse_options(args.config, is_train=False, root=args.root)
    opt["path"]["pretrain_network_g"] = args.pth
    if args.int8:
        opt.setdefault("val", {})["int8"] = (
            True if args.int8 == "true" else args.int8)
    if args.dataroot:
        for dopt in opt["datasets"].values():
            for key in list(dopt):
                if key.startswith("dataroot"):
                    dopt[key] = args.dataroot

    task = build_task(opt)
    task.load_pretrained(args.pth)

    all_results = {}
    for phase, dataset_opt in sorted(opt["datasets"].items()):
        ds = build_dataset(dataset_opt)
        loader = build_loader(ds, dataset_opt, False)
        name = dataset_opt.get("name", phase)
        print(f"evaluating {name}: {len(ds)} items", file=sys.stderr)
        res = task.validate(loader, dataset_opt, save_img=args.save_img,
                            max_items=args.max_items)
        all_results[name] = res

    # BASELINE.md-format rows
    cfg_label = os.path.splitext(os.path.basename(args.config))[0]
    if args.int8:
        cfg_label += f" (int8={args.int8})"
    print("| Metric | Value | Hardware | Source |")
    print("|---|---|---|---|")
    hw = jax.devices()[0].device_kind
    for name, res in all_results.items():
        psnr = res.get("total_psnr", res.get("psnr"))
        ssim = res.get("total_ssim", res.get("ssim"))
        cells = []
        if psnr is not None:
            cells.append(f"{psnr:.2f} dB")
        if ssim is not None:
            cells.append(f"{ssim:.4f}")
        value = " / ".join(cells) if cells else json.dumps(res)
        print(f"| {cfg_label} [{name}] — PSNR / SSIM | {value} | {hw} | "
              f"this eval ({os.path.basename(args.pth)}) |")
        extras = {k: round(v, 4) for k, v in res.items()}
        print(f"  details: {json.dumps(extras)}", file=sys.stderr)

    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(all_results, f, indent=2)
    return all_results


if __name__ == "__main__":
    main()

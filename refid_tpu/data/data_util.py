"""Path-pairing helpers (parity: basicsr/data/data_util.py:92-253).

These build (lq, gt) path pairs from folders, lmdb metadata, or meta-info
files — used by generic paired datasets and the lmdb tooling."""

from __future__ import annotations

import os
from os import path as osp
from typing import List

from refid_tpu.data.datasets.base import recursive_glob  # re-export

__all__ = ["recursive_glob", "scandir", "paired_paths_from_folder",
           "paired_paths_from_meta_info_file", "paired_paths_from_lmdb"]


def scandir(dir_path: str, suffix=None, recursive: bool = False,
            full_path: bool = False):
    """Non-hidden file scan (basicsr/utils/misc.py scandir semantics)."""
    for entry in sorted(os.scandir(dir_path), key=lambda e: e.name):
        if entry.name.startswith("."):
            continue
        if entry.is_file():
            rel = entry.path if full_path else entry.name
            if suffix is None or rel.endswith(suffix):
                yield rel
        elif recursive and entry.is_dir():
            for sub in scandir(entry.path, suffix, recursive, full_path=True):
                yield sub if full_path else osp.relpath(sub, dir_path)


def paired_paths_from_folder(folders, keys, filename_tmpl="{}") -> List[dict]:
    """Pair files in (input_folder, gt_folder) by gt basename with an lq
    filename template (data_util.py:206-253)."""
    assert len(folders) == 2 and len(keys) == 2
    input_folder, gt_folder = folders
    input_key, gt_key = keys
    input_paths = list(scandir(input_folder))
    gt_paths = list(scandir(gt_folder))
    assert len(input_paths) == len(gt_paths), (
        f"{input_key} and {gt_key} folders have different numbers of images: "
        f"{len(input_paths)}, {len(gt_paths)}.")
    paths = []
    for gt_path in sorted(gt_paths):
        basename, ext = osp.splitext(osp.basename(gt_path))
        input_name = f"{filename_tmpl.format(basename)}{ext}"
        input_path = osp.join(input_folder, input_name)
        assert input_name in input_paths, (
            f"{input_name} is not in {input_key}_paths.")
        paths.append({f"{input_key}_path": input_path,
                      f"{gt_key}_path": osp.join(gt_folder, gt_path)})
    return paths


def paired_paths_from_meta_info_file(folders, keys, meta_info_file,
                                     filename_tmpl="{}") -> List[dict]:
    """Pairs from a meta-info text file of gt names (data_util.py:159-203)."""
    assert len(folders) == 2 and len(keys) == 2
    input_folder, gt_folder = folders
    input_key, gt_key = keys
    with open(meta_info_file, "r") as f:
        gt_names = [line.split(" ")[0] for line in f if line.strip()]
    paths = []
    for gt_name in gt_names:
        basename, ext = osp.splitext(osp.basename(gt_name))
        input_path = osp.join(input_folder,
                              f"{filename_tmpl.format(basename)}{ext}")
        paths.append({f"{input_key}_path": input_path,
                      f"{gt_key}_path": osp.join(gt_folder, gt_name)})
    return paths


def paired_paths_from_lmdb(folders, keys) -> List[dict]:
    """Pairs of lmdb keys from the two .lmdb folders' meta_info.txt
    (data_util.py:92-156)."""
    assert len(folders) == 2 and len(keys) == 2
    input_folder, gt_folder = folders
    input_key, gt_key = keys
    if not (input_folder.endswith(".lmdb") and gt_folder.endswith(".lmdb")):
        raise ValueError(
            f"{input_key} folder and {gt_key} folder should both end with "
            f".lmdb, got {input_folder} and {gt_folder}")
    with open(osp.join(input_folder, "meta_info.txt")) as f:
        input_keys = [line.split(".")[0] for line in f if line.strip()]
    with open(osp.join(gt_folder, "meta_info.txt")) as f:
        gt_keys = [line.split(".")[0] for line in f if line.strip()]
    if set(input_keys) != set(gt_keys):
        raise ValueError(f"Keys in {input_key}_folder and {gt_key}_folder "
                         "differ.")
    return [{f"{input_key}_path": k, f"{gt_key}_path": k}
            for k in sorted(input_keys)]

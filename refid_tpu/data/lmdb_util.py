"""LMDB dataset creation tooling.

Parity: basicsr/utils/lmdb_util.py (make_lmdb_from_imgs :9-136, LmdbMaker
:164-209) and the create_lmdb.py CLI.  Layout is identical so databases are
interchangeable with the reference:

    <name>.lmdb/
    ├── data.mdb / lock.mdb     # standard lmdb files
    └── meta_info.txt           # "<key>.png (h,w,c) <compress_level>" lines

Keys are image names without extension; values are PNG-encoded bytes.
The ``lmdb`` package is imported lazily — this environment does not ship
it, so creation raises a clear ImportError, but the pure-Python pieces
(meta-info formatting, key derivation) stay testable.
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence, Tuple

__all__ = ["LmdbMaker", "make_lmdb_from_imgs", "prepare_keys_from_folder"]


def prepare_keys_from_folder(folder: str, suffix: str = "png"
                             ) -> Tuple[List[str], List[str]]:
    """Recursively list images under ``folder``; returns (relative paths,
    keys).  Key = relative path without extension (reference create_lmdb.py
    uses osp.splitext of the scandir-relative path)."""
    paths = []
    for root, _, files in os.walk(folder):
        for f in sorted(files):
            if f.lower().endswith("." + suffix):
                paths.append(os.path.relpath(os.path.join(root, f), folder))
    paths.sort()
    keys = [os.path.splitext(p)[0] for p in paths]
    return paths, keys


def _encode_png(img, compress_level: int) -> bytes:
    import cv2
    ok, buf = cv2.imencode(".png", img,
                           [cv2.IMWRITE_PNG_COMPRESSION, compress_level])
    assert ok, "cv2.imencode failed"
    return buf.tobytes()


class LmdbMaker:
    """Incremental LMDB writer with reference-compatible meta_info.txt.

    Parity: basicsr/utils/lmdb_util.py:164-209 (batch commits, meta lines
    ``<key>.png (h,w,c) <level>``).
    """

    def __init__(self, lmdb_path: str, map_size: int = 1024 ** 4,
                 batch: int = 5000, compress_level: int = 1):
        import lmdb  # lazy: absent from this image
        assert lmdb_path.endswith(".lmdb"), \
            f"lmdb_path must end with '.lmdb': {lmdb_path}"
        os.makedirs(lmdb_path, exist_ok=True)
        self.lmdb_path = lmdb_path
        self.batch = batch
        self.compress_level = compress_level
        self.env = lmdb.open(lmdb_path, map_size=map_size)
        self.txn = self.env.begin(write=True)
        self.txt_file = open(os.path.join(lmdb_path, "meta_info.txt"), "w")
        self.counter = 0

    def put(self, img_byte: bytes, key: str, img_shape: Sequence[int]):
        self.counter += 1
        self.txn.put(key.encode("ascii"), img_byte)
        h, w, c = img_shape
        self.txt_file.write(
            f"{key}.png ({h},{w},{c}) {self.compress_level}\n")
        if self.counter % self.batch == 0:
            self.txn.commit()
            self.txn = self.env.begin(write=True)

    def close(self):
        self.txn.commit()
        self.env.close()
        self.txt_file.close()


def make_lmdb_from_imgs(data_path: str, lmdb_path: str,
                        img_path_list: Sequence[str], keys: Sequence[str],
                        batch: int = 5000, compress_level: int = 1,
                        map_size: Optional[int] = None):
    """Build an lmdb of PNG-encoded images (reference lmdb_util.py:9-136;
    single-process — this host has one core, the reference's thread pool
    buys nothing)."""
    import cv2

    assert len(img_path_list) == len(keys), (
        f"img_path_list and keys should have the same length, "
        f"but got {len(img_path_list)} and {len(keys)}")
    print(f"Create lmdb for {data_path}, save to {lmdb_path}...")
    print(f"Totoal images: {len(img_path_list)}")

    if map_size is None:
        # estimate from the first image like the reference (:113-118)
        img = cv2.imread(os.path.join(data_path, img_path_list[0]),
                         cv2.IMREAD_UNCHANGED)
        _, img_byte = cv2.imencode(
            ".png", img, [cv2.IMWRITE_PNG_COMPRESSION, compress_level])
        map_size = img_byte.nbytes * len(img_path_list) * 10

    maker = LmdbMaker(lmdb_path, map_size=map_size, batch=batch,
                      compress_level=compress_level)
    for path, key in zip(img_path_list, keys):
        img = cv2.imread(os.path.join(data_path, path), cv2.IMREAD_UNCHANGED)
        h, w = img.shape[:2]
        c = 1 if img.ndim == 2 else img.shape[2]
        maker.put(_encode_png(img, compress_level), key, (h, w, c))
    maker.close()
    print("Finish writing lmdb.")

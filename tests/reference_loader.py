"""Load modules from the read-only upstream reference tree as TEST ORACLES.

The reference package (``/root/reference/basicsr``) cannot be imported
normally here (missing torchvision/lmdb, broken ``h5_image_dataset`` import),
so this loader injects lightweight stubs into ``sys.modules`` and loads the
specific module files we need via importlib.  Nothing from the reference is
copied into refid_tpu — these imports exist only so tests can compare our
TPU-native implementations against the original behavior.
"""

from __future__ import annotations

import importlib.util
import sys
import types
from pathlib import Path

REFERENCE_ROOT = Path("/root/reference")


def reference_available() -> bool:
    return (REFERENCE_ROOT / "basicsr").is_dir()


def _stub(name: str, **attrs) -> types.ModuleType:
    mod = sys.modules.get(name)
    if mod is None:
        mod = types.ModuleType(name)
        sys.modules[name] = mod
    for k, v in attrs.items():
        setattr(mod, k, v)
    return mod


def _install_stubs():
    import torch
    import numpy as np

    # numpy>=2 removed the np.int alias the reference relies on
    if not hasattr(np, "int"):
        np.int = int  # type: ignore[attr-defined]

    # --- torchvision (absent): only deform_conv2d is referenced -----------
    tv = _stub("torchvision")
    tv_ops = _stub("torchvision.ops", deform_conv2d=lambda *a, **k: None)
    tv.ops = tv_ops

    # --- basicsr package scaffolding --------------------------------------
    pkg = _stub("basicsr")
    pkg.__path__ = [str(REFERENCE_ROOT / "basicsr")]

    class _Timer:
        def __init__(self, *a, **k):
            pass

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    utils = _stub("basicsr.utils", Timer=_Timer, CudaTimer=_Timer)
    utils.get_root_logger = lambda *a, **k: __import__("logging").getLogger("ref")
    models = _stub("basicsr.models")
    models.__path__ = [str(REFERENCE_ROOT / "basicsr" / "models")]
    archs = _stub("basicsr.models.archs")
    archs.__path__ = [str(REFERENCE_ROOT / "basicsr" / "models" / "archs")]
    data = _stub("basicsr.data")
    data.__path__ = [str(REFERENCE_ROOT / "basicsr" / "data")]
    return pkg


def load_reference_module(relpath: str, modname: str):
    """Load e.g. ``basicsr/models/archs/fusion_modules.py`` under ``modname``."""
    if modname in sys.modules:
        return sys.modules[modname]
    _install_stubs()
    path = REFERENCE_ROOT / relpath
    spec = importlib.util.spec_from_file_location(modname, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[modname] = mod
    spec.loader.exec_module(mod)
    return mod


def load_reference_archs():
    """Load the reference arch module stack (fusion, submodules, final net)."""
    load_reference_module("basicsr/models/archs/dcn_util.py",
                          "basicsr.models.archs.dcn_util")
    load_reference_module("basicsr/models/archs/fusion_modules.py",
                          "basicsr.models.archs.fusion_modules")
    load_reference_module("basicsr/models/archs/recurrent_sub_modules.py",
                          "basicsr.models.archs.recurrent_sub_modules")
    return load_reference_module(
        "basicsr/models/archs/XXNet_final_attenfusion_arch.py",
        "basicsr.models.archs.XXNet_final_attenfusion_arch")


def load_reference_event_util():
    return load_reference_module("basicsr/data/event_util.py",
                                 "basicsr.data.event_util")


def load_reference_dataset_module():
    """Load basicsr.data.image_npy_dataset with functional IO stubs."""
    import cv2
    import numpy as np
    import torch

    _install_stubs()

    # torchvision.transforms.functional.normalize (imported, unused)
    tvt = _stub("torchvision.transforms")
    _stub("torchvision.transforms.functional", normalize=lambda *a, **k: None)
    sys.modules["torchvision"].transforms = tvt

    class _FileClient:
        def __init__(self, backend="disk", **kwargs):
            pass

        def get(self, filepath, client_key=None):
            with open(filepath, "rb") as f:
                return f.read()

    def _imfrombytes(content, flag="color", float32=False):
        img = cv2.imdecode(np.frombuffer(content, np.uint8), cv2.IMREAD_COLOR)
        if float32:
            img = img.astype(np.float32) / 255.0
        return img

    def _img2tensor(imgs, bgr2rgb=True, float32=True):
        def _to(img):
            if img.shape[2] == 3 and bgr2rgb:
                img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
            t = torch.from_numpy(img.transpose(2, 0, 1))
            return t.float() if float32 else t
        return [_to(i) for i in imgs] if isinstance(imgs, list) else _to(imgs)

    def _voxel2voxeltensor(voxels, float32=True):
        def _to(v):
            t = torch.from_numpy(v.transpose(2, 0, 1))
            return t.float() if float32 else t
        return [_to(v) for v in voxels] if isinstance(voxels, list) else _to(voxels)

    _stub("basicsr.utils", FileClient=_FileClient, imfrombytes=_imfrombytes,
          img2tensor=_img2tensor, voxel2voxeltensor=_voxel2voxeltensor,
          padding=lambda lq, gt, s: (lq, gt),
          scandir=lambda *a, **k: iter(()))

    load_reference_module("basicsr/data/event_util.py",
                          "basicsr.data.event_util")
    load_reference_module("basicsr/data/transforms.py",
                          "basicsr.data.transforms")
    load_reference_module("basicsr/data/data_util.py",
                          "basicsr.data.data_util")
    return load_reference_module("basicsr/data/image_npy_dataset.py",
                                 "basicsr.data.image_npy_dataset")

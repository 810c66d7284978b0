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

"""All shipped option files must parse and reference registered components."""

import glob

import pytest

from refid_tpu.core.config import parse_options
from refid_tpu.core.registry import DATASETS, MODELS, ARCHS
import refid_tpu.data  # noqa: F401
import refid_tpu.tasks  # noqa: F401

TRAIN_CFGS = sorted(glob.glob("options/train/**/*.yml", recursive=True))
TEST_CFGS = sorted(glob.glob("options/test/**/*.yml", recursive=True))


def test_config_corpus_complete():
    assert len(TRAIN_CFGS) == 8
    assert len(TEST_CFGS) == 8


@pytest.mark.parametrize("path", TRAIN_CFGS)
def test_train_config_parses(path, tmp_path):
    opt = parse_options(path, is_train=True, root=str(tmp_path))
    assert opt["model_type"] in MODELS
    assert opt["network_g"]["type"] in ARCHS
    for phase, d in opt["datasets"].items():
        assert d["type"] in DATASETS
    assert opt["train"]["optim_g"]["type"] == "AdamW"
    assert "experiments_root" in opt["path"]
    # the arch must be constructible from the config
    ARCHS.get(opt["network_g"]["type"])(opt["network_g"])


@pytest.mark.parametrize("path", TEST_CFGS)
def test_test_config_parses(path, tmp_path):
    opt = parse_options(path, is_train=False, root=str(tmp_path))
    assert opt["model_type"] in MODELS
    assert opt["network_g"]["type"] in ARCHS
    for phase, d in opt["datasets"].items():
        assert d["type"] in DATASETS
    assert "results_root" in opt["path"]


def test_debug_name_shrinks_freqs(tmp_path):
    opt = parse_options(TRAIN_CFGS[0], is_train=True, root=str(tmp_path))
    assert opt["logger"]["print_freq"] == 200
    import yaml
    cfg = yaml.safe_load(open(TRAIN_CFGS[0]))
    cfg["name"] = "debug_" + cfg["name"]
    p = tmp_path / "dbg.yml"
    p.write_text(yaml.safe_dump(cfg))
    opt = parse_options(str(p), is_train=True, root=str(tmp_path))
    assert opt["logger"]["print_freq"] == 1
    assert opt["val"]["val_freq"] == 8

"""TensorBoard event-file writer: independent TFRecord + proto decode."""

import glob
import os
import struct

import pytest


def _read_records(path):
    """Independent TFRecord reader: verifies lengths and masked CRC32C."""
    from refid_tpu.core.tb_writer import _masked_crc

    records = []
    with open(path, "rb") as f:
        while True:
            header = f.read(8)
            if not header:
                break
            (length,) = struct.unpack("<Q", header)
            (hcrc,) = struct.unpack("<I", f.read(4))
            assert hcrc == _masked_crc(header)
            data = f.read(length)
            (dcrc,) = struct.unpack("<I", f.read(4))
            assert dcrc == _masked_crc(data)
            records.append(data)
    return records


def _decode_fields(msg):
    """Minimal protobuf wire decoder -> list of (field, wire, value)."""
    fields = []
    i = 0
    while i < len(msg):
        key = 0
        shift = 0
        while True:
            b = msg[i]
            i += 1
            key |= (b & 0x7F) << shift
            shift += 7
            if not b & 0x80:
                break
        field, wire = key >> 3, key & 7
        if wire == 0:  # varint
            v = 0
            shift = 0
            while True:
                b = msg[i]
                i += 1
                v |= (b & 0x7F) << shift
                shift += 7
                if not b & 0x80:
                    break
        elif wire == 1:  # 64-bit
            v = msg[i:i + 8]
            i += 8
        elif wire == 2:  # length-delimited
            ln = 0
            shift = 0
            while True:
                b = msg[i]
                i += 1
                ln |= (b & 0x7F) << shift
                shift += 7
                if not b & 0x80:
                    break
            v = msg[i:i + ln]
            i += ln
        elif wire == 5:  # 32-bit
            v = msg[i:i + 4]
            i += 4
        else:
            raise AssertionError(f"unexpected wire type {wire}")
        fields.append((field, wire, v))
    return fields


def _scalars_from_event(event_bytes):
    out = {}
    step = 0
    for field, wire, v in _decode_fields(event_bytes):
        if field == 2 and wire == 0:
            step = v
        if field == 5 and wire == 2:  # Summary
            for f2, w2, v2 in _decode_fields(v):
                if f2 == 1 and w2 == 2:  # Summary.Value
                    tag = val = None
                    for f3, w3, v3 in _decode_fields(v2):
                        if f3 == 1 and w3 == 2:
                            tag = v3.decode()
                        if f3 == 2 and w3 == 5:
                            (val,) = struct.unpack("<f", v3)
                    out[tag] = val
    return step, out


def test_crc32c_known_vectors():
    # RFC 3720 test vector: 32 bytes of zeros -> 0x8A9136AA
    from refid_tpu.core.tb_writer import _crc32c
    assert _crc32c(b"\x00" * 32) == 0x8A9136AA
    assert _crc32c(b"123456789") == 0xE3069283


def test_event_file_roundtrip(tmp_path):
    from refid_tpu.core.tb_writer import TensorBoardWriter

    with TensorBoardWriter(str(tmp_path)) as w:
        w.add_scalar("losses/l_pix", 0.5, 10)
        w.add_scalars({"metrics/val/psnr": 30.25, "learning_rate": 2e-4}, 20)
        path = w.path

    records = _read_records(path)
    assert len(records) == 3
    # first record: file_version event
    fields = _decode_fields(records[0])
    versions = [v for f, w_, v in fields if f == 3 and w_ == 2]
    assert versions == [b"brain.Event:2"]

    step1, s1 = _scalars_from_event(records[1])
    assert step1 == 10 and s1 == {"losses/l_pix": 0.5}
    step2, s2 = _scalars_from_event(records[2])
    assert step2 == 20
    assert s2["metrics/val/psnr"] == pytest.approx(30.25)
    assert s2["learning_rate"] == pytest.approx(2e-4)


@pytest.mark.slow
def test_train_cli_writes_tb_events(tmp_path):
    """use_tb_logger in the config must yield a readable event file with
    loss and metric scalars (parity: basicsr/utils/logger.py:71-110)."""
    import yaml
    from tests.synthetic_data import make_gopro_tree
    from tests.test_e2e import _write_cfg

    data_root = str(tmp_path / "data")
    make_gopro_tree(data_root, m=2, n=1, videos=("VID_A", "VID_B"))
    make_gopro_tree(data_root, split="test", m=2, n=1,
                    videos=("VID_A", "VID_B"))

    cfg_path = _write_cfg(tmp_path, data_root, name="tb_e2e")
    cfg = yaml.safe_load(open(cfg_path))
    cfg["logger"]["use_tb_logger"] = True
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)

    exp_root = str(tmp_path / "exp")
    from refid_tpu.cli.train import main
    main(["-opt", cfg_path, "--root", exp_root])

    files = glob.glob(os.path.join(exp_root, "tb_logger", "tb_e2e",
                                   "events.out.tfevents.*"))
    assert len(files) == 1
    records = _read_records(files[0])
    all_scalars = {}
    for rec in records[1:]:
        _, s = _scalars_from_event(rec)
        all_scalars.update(s)
    assert any(k.startswith("losses/") for k in all_scalars), all_scalars
    assert "learning_rate" in all_scalars
    assert any(k.startswith("metrics/") for k in all_scalars), all_scalars


def test_wandb_logger_stub_and_fake(tmp_path):
    """init_wandb_logger (reference logger.py:87-110 tb-sync mode): absent
    wandb package -> clean warning + None; with a fake wandb module ->
    init called with sync_tensorboard=True and the resume-id semantics."""
    import logging
    import sys
    import types
    from refid_tpu.core.logging_util import init_wandb_logger

    opt = {"name": "exp", "logger": {"wandb": {"project": "proj"}}}
    assert "wandb" not in sys.modules
    # capture via a direct handler: get_root_logger sets propagate=False on
    # "refid_tpu" (earlier suite tests initialize it), so caplog's
    # root-logger handler would miss the record
    records = []
    h = logging.Handler()
    h.emit = records.append
    lg = logging.getLogger("refid_tpu")
    lg.addHandler(h)
    try:
        assert init_wandb_logger(opt) is None  # package absent: no crash
    finally:
        lg.removeHandler(h)
    assert any("wandb package is not installed" in r.getMessage()
               for r in records)

    calls = {}
    fake = types.ModuleType("wandb")
    fake.util = types.SimpleNamespace(generate_id=lambda: "genid")
    fake.init = lambda **kw: calls.update(kw)
    sys.modules["wandb"] = fake
    try:
        assert init_wandb_logger(opt) == "genid"
        assert calls["sync_tensorboard"] is True
        assert calls["project"] == "proj" and calls["resume"] == "never"
        opt["logger"]["wandb"]["resume_id"] = "abc123"
        assert init_wandb_logger(opt) == "abc123"
        assert calls["resume"] == "allow" and calls["id"] == "abc123"
        # no project -> disabled
        assert init_wandb_logger({"name": "x", "logger": {}}) is None
    finally:
        del sys.modules["wandb"]

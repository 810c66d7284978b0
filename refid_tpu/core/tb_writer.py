"""Pure-Python TensorBoard scalar writer (no TensorFlow / tensorboardX).

Writes standard ``events.out.tfevents.*`` files readable by TensorBoard:
TFRecord framing (length + masked-CRC32C checksums) around hand-encoded
``Event``/``Summary`` protobuf messages — the only wire surface scalar
logging needs.

Parity: the reference's tb sink (basicsr/utils/logger.py:71-110) logs
``losses/<name>``, ``learning_rate`` every print_freq and ``metrics/<name>``
at validation via tensorboardX SummaryWriter; this module provides the same
tags without the dependency.
"""

from __future__ import annotations

import os
import socket
import struct
import time

__all__ = ["TensorBoardWriter"]

# --- CRC32C (Castagnoli), software table ------------------------------------

_CRC_TABLE = []


def _crc_table():
    global _CRC_TABLE
    if not _CRC_TABLE:
        poly = 0x82F63B78
        tab = []
        for n in range(256):
            c = n
            for _ in range(8):
                c = (c >> 1) ^ poly if c & 1 else c >> 1
            tab.append(c)
        _CRC_TABLE = tab
    return _CRC_TABLE


def _crc32c(data: bytes) -> int:
    tab = _crc_table()
    crc = 0xFFFFFFFF
    for b in data:
        crc = tab[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


def _masked_crc(data: bytes) -> int:
    crc = _crc32c(data)
    return ((crc >> 15) | (crc << 17)) + 0xA282EAD8 & 0xFFFFFFFF


# --- minimal protobuf encoding ----------------------------------------------


def _varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _key(field: int, wire: int) -> bytes:
    return _varint(field << 3 | wire)


def _double_field(field: int, v: float) -> bytes:
    return _key(field, 1) + struct.pack("<d", v)


def _float_field(field: int, v: float) -> bytes:
    return _key(field, 5) + struct.pack("<f", v)


def _int64_field(field: int, v: int) -> bytes:
    return _key(field, 0) + _varint(v & 0xFFFFFFFFFFFFFFFF)


def _bytes_field(field: int, v: bytes) -> bytes:
    return _key(field, 2) + _varint(len(v)) + v


def _summary_value(tag: str, value: float) -> bytes:
    # Summary.Value { string tag = 1; float simple_value = 2; }
    return _bytes_field(1, tag.encode()) + _float_field(2, float(value))


def _event(step: int, summaries: bytes = b"", file_version: str = "",
           wall_time: float = None) -> bytes:
    # Event { double wall_time = 1; int64 step = 2;
    #         string file_version = 3; Summary summary = 5; }
    msg = _double_field(1, time.time() if wall_time is None else wall_time)
    if step:
        msg += _int64_field(2, step)
    if file_version:
        msg += _bytes_field(3, file_version.encode())
    if summaries:
        msg += _bytes_field(5, summaries)  # Summary { repeated Value value=1 }
    return msg


class TensorBoardWriter:
    """Append-only scalar event file, flushed per add_scalar(s) call."""

    def __init__(self, log_dir: str):
        os.makedirs(log_dir, exist_ok=True)
        host = socket.gethostname()
        self.path = os.path.join(
            log_dir, f"events.out.tfevents.{int(time.time())}.{host}")
        self._f = open(self.path, "ab")
        self._write_record(_event(0, file_version="brain.Event:2"))
        self._f.flush()

    def _write_record(self, data: bytes):
        header = struct.pack("<Q", len(data))
        self._f.write(header)
        self._f.write(struct.pack("<I", _masked_crc(header)))
        self._f.write(data)
        self._f.write(struct.pack("<I", _masked_crc(data)))

    def add_scalar(self, tag: str, value: float, step: int):
        self.add_scalars({tag: value}, step)

    def add_scalars(self, tag_values: dict, step: int):
        summaries = b"".join(
            _bytes_field(1, _summary_value(t, v))
            for t, v in tag_values.items())
        self._write_record(_event(int(step), summaries))
        self._f.flush()

    def close(self):
        if not self._f.closed:
            self._f.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

"""The BENCH artifact contract: bench.py must print JSON lines the
driver can parse (the round-4 artifact was lost to a timeout; round 5's
staged design makes every printed line a valid, self-contained result —
this pins the format so it cannot regress silently)."""

import importlib.util
import json
import os
import sys

import numpy as np  # noqa: F401  (bench imports it at module scope)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_bench():
    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(REPO, "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)  # executes module scope only (no main())
    return mod


def test_result_lines_parse(capsys):
    bench = _load_bench()
    bench._result(25.06, "")
    bench._result(20.5, "PROVISIONAL (scan). ")
    bench._result(27.2, "", "int8 MXU, quality-gated")
    lines = [l for l in capsys.readouterr().out.splitlines() if l.strip()]
    assert len(lines) == 3
    for line in lines:
        rec = json.loads(line)  # every line must parse standalone
        assert set(rec) == {"metric", "value", "unit", "vs_baseline",
                            "notes"}
        assert rec["unit"] == "frames/s"
        assert rec["value"] > 0
        assert abs(rec["vs_baseline"]
                   - round(rec["value"] / bench.H100_REFERENCE_FPS_EST, 3)) \
            < 1e-9
    # the LAST line is the headline the driver records
    assert json.loads(lines[-1])["value"] == 27.2
    assert "int8" in json.loads(lines[-1])["notes"]


def test_bench_constants_sane():
    bench = _load_bench()
    assert bench.H100_REFERENCE_FPS_EST == 90.0  # PERFORMANCE.md round-3
    assert bench.V5E_BF16_CEILING_FPS == 84.0
    # the int8 stage is gated by the measured production-shape record
    sys.path.insert(0, REPO)
    from refid_tpu.serve.quant import int8_quality_gated
    assert int8_quality_gated(True)

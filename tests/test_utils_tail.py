"""SURVEY §2.9 long-tail utilities (flow/face/download) — the last
inventory row.  flow I/O round-trips; the face helper's similarity
geometry is pinned against analytically-known transforms; download's
offline pieces (token parse, chunked save) run against fakes."""

import io
import os

import numpy as np
import pytest


# ---- flow_util ---------------------------------------------------------

def test_flo_roundtrip(tmp_path):
    from refid_tpu.utils.flow_util import flowread, flowwrite

    rng = np.random.RandomState(0)
    flow = rng.randn(12, 17, 2).astype(np.float32) * 3
    p = tmp_path / "a.flo"
    flowwrite(flow, p)
    got = flowread(p)
    np.testing.assert_array_equal(got, flow)
    # header check
    assert open(p, "rb").read(4) == b"PIEH"
    with pytest.raises(IOError):
        bad = tmp_path / "bad.flo"
        bad.write_bytes(b"XXXX" + b"\0" * 16)
        flowread(bad)


def test_quantize_dequantize_flow_roundtrip(tmp_path):
    from refid_tpu.utils.flow_util import (dequantize_flow, flowread,
                                           flowwrite, quantize_flow)

    rng = np.random.RandomState(1)
    h, w = 16, 20
    flow = rng.uniform(-0.01, 0.01, (h, w, 2)).astype(np.float32)
    flow[..., 0] *= w  # in-range after /w normalization
    flow[..., 1] *= h
    dx, dy = quantize_flow(flow)
    assert dx.dtype == np.uint8 and dx.shape == (h, w)
    back = dequantize_flow(dx, dy)
    # quantization step after norm: 2*max_val/255 = 1.57e-4; denorm by w/h
    assert np.abs(back[..., 0] - flow[..., 0]).max() <= 0.02 * w / 255 + 1e-6
    assert np.abs(back[..., 1] - flow[..., 1]).max() <= 0.02 * h / 255 + 1e-6
    # zero survives exactly (the 255-level convention)
    z = np.zeros((4, 4, 2), np.float32)
    back0 = dequantize_flow(*quantize_flow(z))
    np.testing.assert_allclose(back0, 0, atol=1e-12)
    # quantized file round-trip (the reference's own quantized flowwrite
    # has swapped cv2.imwrite args and never worked — fixed here)
    p = str(tmp_path / "q.png")
    flowwrite(flow, p, quantize=True)
    got = flowread(p, quantize=True)
    assert got.shape == flow.shape
    assert np.abs(got - flow).max() <= 0.02 * max(h, w) / 255 + 1e-6


def test_quantize_validation():
    from refid_tpu.utils.flow_util import dequantize, quantize

    with pytest.raises(ValueError):
        quantize(np.zeros(3), 0, 1, 1)
    with pytest.raises(ValueError):
        quantize(np.zeros(3), 1, 0, 8)
    with pytest.raises(ValueError):
        dequantize(np.zeros(3), 1, 0, 8)


# ---- face_util ---------------------------------------------------------

def test_estimate_similarity_recovers_known_transform():
    from refid_tpu.utils.face_util import estimate_similarity

    rng = np.random.RandomState(2)
    src = rng.rand(5, 2) * 100
    th, s, t = 0.3, 1.7, np.array([4.0, -2.5])
    R = np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]])
    dst = s * src @ R.T + t
    M = estimate_similarity(src, dst)
    np.testing.assert_allclose(M[:, :2], s * R, atol=1e-9)
    np.testing.assert_allclose(M[:, 2], t, atol=1e-7)
    # and exact on the points
    np.testing.assert_allclose(src @ M[:, :2].T + M[:, 2], dst, atol=1e-7)


def test_face_helper_geometry_roundtrip(tmp_path):
    """Identity-scale crop/paste: painting the template region of a
    synthetic image, restoring it unchanged, and pasting must reproduce
    the face region (away from the blend edge)."""
    import cv2

    from refid_tpu.utils.face_util import FaceRestorationHelper

    helper = FaceRestorationHelper(upscale_factor=1, face_size=128)
    rng = np.random.RandomState(3)
    img = (rng.rand(160, 160, 3) * 255).astype(np.uint8)
    helper.input_img = img
    # landmarks = template itself -> affine is identity
    helper.all_landmarks_5.append(helper.face_template.copy())
    helper.warp_crop_faces(save_cropped_path=str(tmp_path / "c.png"))
    assert len(helper.cropped_faces) == 1
    np.testing.assert_allclose(helper.affine_matrices[0],
                               [[1, 0, 0], [0, 1, 0]], atol=1e-7)
    crop = helper.cropped_faces[0]
    np.testing.assert_array_equal(crop, img[:128, :128])
    assert os.path.exists(tmp_path / "c_00.png")
    # paste the UNMODIFIED crop back: interior must match the original
    helper.add_restored_face(cv2.cvtColor(crop, cv2.COLOR_RGB2BGR))
    out = helper.paste_faces_to_input_image(str(tmp_path / "out.jpg"))
    ref = cv2.cvtColor(img, cv2.COLOR_RGB2BGR)
    np.testing.assert_array_equal(out[8:120, 8:120], ref[8:120, 8:120])
    # save_png rewrites the extension
    assert os.path.exists(tmp_path / "out.png")
    helper.clean_all()
    assert not helper.restored_faces and not helper.affine_matrices


def test_face_helper_dlib_gated():
    from refid_tpu.utils.face_util import FaceRestorationHelper

    helper = FaceRestorationHelper(upscale_factor=2)
    with pytest.raises(ImportError, match="dlib"):
        helper.init_dlib("a", "b", "c")
    with pytest.raises(RuntimeError, match="init_dlib"):
        helper.detect_faces("x.png")


# ---- download_util -----------------------------------------------------

class _FakeResponse:
    def __init__(self, data, cookies=None):
        self._data = data
        self.cookies = cookies or {}
        self.headers = {}

    def iter_content(self, chunk_size):
        buf = io.BytesIO(self._data)
        while True:
            chunk = buf.read(chunk_size)
            if not chunk:
                return
            yield chunk


def test_download_token_and_save(tmp_path):
    from refid_tpu.utils.download_util import (get_confirm_token,
                                               save_response_content,
                                               sizeof_fmt)

    assert get_confirm_token(_FakeResponse(b"", {"x": "1"})) is None
    assert get_confirm_token(
        _FakeResponse(b"", {"download_warning_abc": "tok"})) == "tok"

    data = bytes(range(256)) * 500  # 128000 B, multiple chunks
    dest = tmp_path / "blob.bin"
    save_response_content(_FakeResponse(data), dest, file_size=len(data),
                          chunk_size=4096)
    assert dest.read_bytes() == data

    assert sizeof_fmt(0) == "0.0 B"
    assert sizeof_fmt(1536) == "1.5 KB"
    assert sizeof_fmt(3 * 1024 ** 3) == "3.0 GB"

"""LMDB tooling + FileClient lmdb read path, exercised via a stub ``lmdb``
module (the real package is absent from this image).  The stub implements
the tiny API surface used: open() -> env with begin()/close(), txn with
put()/get()/commit()."""

import sys
import types

import numpy as np
import pytest


class _FakeTxn:
    def __init__(self, store):
        self.store = store

    def put(self, k, v):
        self.store[k] = v

    def get(self, k):
        return self.store.get(k)

    def commit(self):
        pass

    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


class _FakeEnv:
    def __init__(self, path):
        self.path = path
        self.store = _STORES.setdefault(path, {})

    def begin(self, write=False):
        return _FakeTxn(self.store)

    def close(self):
        pass


_STORES = {}


@pytest.fixture()
def fake_lmdb(monkeypatch):
    mod = types.ModuleType("lmdb")
    mod.open = lambda path, **kw: _FakeEnv(path)
    monkeypatch.setitem(sys.modules, "lmdb", mod)
    _STORES.clear()
    return mod


def test_lmdb_maker_and_fileclient_read(fake_lmdb, tmp_path):
    import cv2
    from refid_tpu.data.lmdb_util import LmdbMaker
    from refid_tpu.data.file_client import FileClient

    lmdb_path = str(tmp_path / "imgs.lmdb")
    maker = LmdbMaker(lmdb_path, batch=2, compress_level=1)
    rng = np.random.RandomState(0)
    imgs = {}
    for i in range(3):
        img = rng.randint(0, 255, (6, 8, 3), dtype=np.uint8)
        ok, buf = cv2.imencode(".png", img)
        assert ok
        key = f"seq/{i:03d}"
        maker.put(buf.tobytes(), key, img.shape)
        imgs[key] = img
    maker.close()

    # meta_info.txt lines match the reference format (lmdb_util.py:194-203)
    meta = open(f"{lmdb_path}/meta_info.txt").read().splitlines()
    assert meta[0] == "seq/000.png (6,8,3) 1"
    assert len(meta) == 3

    # FileClient lmdb read path decodes back to the original pixels
    fc = FileClient("lmdb", db_paths=lmdb_path, client_keys="default")
    for key, img in imgs.items():
        data = fc.get(key)
        assert data is not None
        got = cv2.imdecode(np.frombuffer(data, np.uint8), cv2.IMREAD_COLOR)
        np.testing.assert_array_equal(got, img)


def test_make_lmdb_from_imgs_and_keys(fake_lmdb, tmp_path):
    import cv2
    from refid_tpu.data.lmdb_util import (make_lmdb_from_imgs,
                                          prepare_keys_from_folder)

    folder = tmp_path / "frames"
    (folder / "sub").mkdir(parents=True)
    rng = np.random.RandomState(1)
    for name in ("a.png", "sub/b.png"):
        img = rng.randint(0, 255, (4, 5, 3), dtype=np.uint8)
        cv2.imwrite(str(folder / name), img)

    paths, keys = prepare_keys_from_folder(str(folder))
    assert paths == ["a.png", "sub/b.png"]
    assert keys == ["a", "sub/b"]

    lmdb_path = str(tmp_path / "frames.lmdb")
    make_lmdb_from_imgs(str(folder), lmdb_path, paths, keys)
    store = _STORES[lmdb_path]
    assert set(store) == {b"a", b"sub/b"}


def test_create_lmdb_cli(fake_lmdb, tmp_path):
    import cv2
    from refid_tpu.cli.create_lmdb import main

    folder = tmp_path / "clips"
    folder.mkdir()
    cv2.imwrite(str(folder / "x.png"),
                np.zeros((3, 3, 3), dtype=np.uint8))
    main([str(folder)])
    assert (folder.parent / "clips.lmdb" / "meta_info.txt").exists()


def test_missing_lmdb_errors_clearly(monkeypatch, tmp_path):
    monkeypatch.setitem(sys.modules, "lmdb", None)
    from refid_tpu.data.lmdb_util import LmdbMaker
    with pytest.raises(ImportError):
        LmdbMaker(str(tmp_path / "x.lmdb"))


def test_memcached_backend_via_stub(monkeypatch, tmp_path):
    """FileClient memcached path (file_client.py parity): Get/ConvertBuffer
    call sequence via a stub 'mc' module; clear ImportError without it."""
    from refid_tpu.data.file_client import FileClient

    store = {"k1": b"payload"}

    class _Client:
        def Get(self, key, buf):
            buf.value = store.get(key)

    mod = types.ModuleType("mc")
    mod.MemcachedClient = types.SimpleNamespace(
        GetInstance=lambda s, c: _Client())
    mod.pyvector = lambda: types.SimpleNamespace(value=None)
    mod.ConvertBuffer = lambda buf: buf.value
    monkeypatch.setitem(sys.modules, "mc", mod)

    fc = FileClient("memcached", server_list_cfg="s.conf",
                    client_cfg="c.conf")
    assert fc.get("k1") == b"payload"

    monkeypatch.setitem(sys.modules, "mc", None)
    with pytest.raises(ImportError):
        FileClient("memcached", server_list_cfg="s", client_cfg="c")

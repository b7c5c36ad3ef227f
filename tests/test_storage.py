"""storage.Store semantics, property-tested on BOTH implementations:
LocalStore (plain paths) and HadoopStore (file:// URIs through the Spark
JVM's Hadoop FileSystem — the code path object-store indexes take)."""

from __future__ import annotations

import os

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from visigoth_spark import storage as vstore

NAMES = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyz0123456789_-.",
    min_size=1, max_size=24,
).filter(lambda s: s not in (".", "..") and not s.endswith(".tmp")
         and ".tmp-" not in s)


@pytest.fixture(params=["local", "hadoop"])
def store_root(request, spark, tmp_path):
    base = str(tmp_path / "root")
    if request.param == "local":
        return vstore.get_store(base), base
    uri = "file://" + base
    return vstore.get_store(uri, spark), uri


class TestStoreSemantics:
    def test_join_and_relpath_roundtrip(self):
        assert vstore.join("a/b", "c", "d.json") == "a/b/c/d.json"
        assert vstore.join("s3a://x/y/", "z") == "s3a://x/y/z"
        assert vstore.relpath("s3a://x/y/z/f.parquet", "s3a://x/y") == \
            "z/f.parquet"
        assert vstore.relpath("/a/b/c", "/a") == "b/c"
        with pytest.raises(ValueError):
            vstore.relpath("/other/c", "/a")

    @settings(max_examples=20, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(name=NAMES, data=st.binary(min_size=0, max_size=2048))
    def test_write_atomic_read_roundtrip(self, store_root, name, data):
        store, root = store_root
        store.makedirs(root)
        path = vstore.join(root, name)
        store.write_atomic(path, data)
        assert store.read_bytes(path) == data
        # replace: readers see old or new, never a partial
        store.write_atomic(path, data + b"!")
        assert store.read_bytes(path) == data + b"!"
        store.remove(path)
        assert not store.exists(path)

    def test_missing_paths_raise_filenotfound(self, store_root):
        store, root = store_root
        store.makedirs(root)
        with pytest.raises(FileNotFoundError):
            store.read_bytes(vstore.join(root, "nope.json"))
        with pytest.raises(FileNotFoundError):
            store.listdir(vstore.join(root, "nope-dir"))

    def test_listdir_sorted_names(self, store_root):
        store, root = store_root
        d = vstore.join(root, "dir")
        store.makedirs(d)
        for n in ("b.json", "a.json", "c"):
            store.write_atomic(vstore.join(d, n), b"x")
        assert store.listdir(d) == ["a.json", "b.json", "c"]
        assert store.isdir(d) and not store.isdir(vstore.join(d, "a.json"))

    def test_rename_replaces_dirs_and_files(self, store_root):
        store, root = store_root
        a, b = vstore.join(root, "a"), vstore.join(root, "b")
        store.makedirs(a)
        store.write_atomic(vstore.join(a, "f"), b"1")
        store.makedirs(b)
        store.write_atomic(vstore.join(b, "g"), b"2")
        store.rename(a, b)  # replace a non-empty dir
        assert store.listdir(b) == ["f"]
        assert not store.exists(a)
        # file replace
        f1, f2 = vstore.join(root, "x"), vstore.join(root, "y")
        store.write_atomic(f1, b"new")
        store.write_atomic(f2, b"old")
        store.rename(f1, f2)
        assert store.read_bytes(f2) == b"new"

    def test_create_exclusive(self, store_root):
        store, root = store_root
        store.makedirs(root)
        lk = vstore.join(root, "LOCK")
        assert store.create_exclusive(lk, b"a") is True
        assert store.create_exclusive(lk, b"b") is False
        assert store.read_bytes(lk) == b"a"

    def test_rmtree_missing_is_noop(self, store_root):
        store, root = store_root
        store.rmtree(vstore.join(root, "never-existed"))

    def test_getsize_and_seekable(self, store_root):
        store, root = store_root
        store.makedirs(root)
        p = vstore.join(root, "blob")
        payload = bytes(range(256)) * 8
        store.write_atomic(p, payload)
        assert store.getsize(p) == len(payload)
        f = store.open_seekable(p)
        try:
            f.seek(256)
            assert f.read(16) == payload[256:272]
            f.seek(-4, os.SEEK_END)
            assert f.read() == payload[-4:]
            f.seek(0)
            assert f.read(None) == payload
        finally:
            f.close()

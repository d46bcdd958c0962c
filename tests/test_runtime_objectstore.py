"""Runtime services (audit/crash/rusage) + object-store staging."""

import os

import numpy as np

from canu_tpu.pipeline.objectstore import LocalObjectStore, make_object_store
from canu_tpu.utils.runtime import audit_invocation, install_crash_catcher, rusage


def test_audit_and_crash_catcher(tmp_path):
    d = str(tmp_path / "canu-logs")
    p = audit_invocation(d, "testtool")
    body = open(p).read()
    assert "argv:" in body and "testtool" in p
    cp = install_crash_catcher(d)
    assert os.path.dirname(cp) == d
    ru = rusage()
    assert ru["max_rss_mb"] > 0


def test_object_store_roundtrip(tmp_path):
    bucket = str(tmp_path / "bucket")
    st = make_object_store(f"TEST:{bucket}")
    assert isinstance(st, LocalObjectStore)
    f = tmp_path / "x.bin"
    f.write_bytes(b"hello")
    st.stash_file(str(f), "stores/x.bin")
    assert st.exists("stores/x.bin")
    out = tmp_path / "y.bin"
    assert st.fetch_file("stores/x.bin", str(out))
    assert out.read_bytes() == b"hello"
    assert not st.fetch_file("missing", str(out))


def test_object_store_tarred_store_dir(tmp_path):
    bucket = str(tmp_path / "bucket")
    st = make_object_store(f"TEST:{bucket}")
    src = tmp_path / "asm.gkpStore"
    src.mkdir()
    (src / "meta.json").write_text("{}")
    np.save(src / "arr.npy", np.arange(5))
    st.stash_store(str(src), "gkp.tar")
    dest = tmp_path / "other_host"
    assert st.fetch_store("gkp.tar", str(dest))
    assert (dest / "asm.gkpStore" / "meta.json").exists()
    assert np.load(dest / "asm.gkpStore" / "arr.npy").tolist() == [0, 1, 2, 3, 4]


def test_make_object_store_none_and_bad():
    assert make_object_store("") is None
    import pytest

    with pytest.raises(ValueError):
        make_object_store("s3://nope")

"""Native (C++) runtime components, loaded via ctypes.

Built in-tree from native/*.cc (no pybind11 in this image; plain C ABI).
Everything has a pure-Python fallback, so the package works without a
compiler; `build_native()` compiles on demand and tests cover both
paths.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_REPO = os.path.dirname(os.path.dirname(_HERE))
_SRC = os.path.join(_REPO, "native", "fastparse.cc")
_SO = os.path.join(_HERE, "libfastparse.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def build_native(force: bool = False) -> bool:
    """Compile native/*.cc -> canu_tpu/native/*.so. Returns success."""
    if os.path.exists(_SO) and not force:
        if not os.path.exists(_SRC) or os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
            return True
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-o", _SO + ".tmp", _SRC],
            check=True, capture_output=True,
        )
        os.replace(_SO + ".tmp", _SO)
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """The native library, building it on first use; None if unavailable."""
    global _lib, _tried
    if _lib is not None:
        return _lib
    if _tried:
        return None
    _tried = True
    if not build_native():
        return None
    lib = ctypes.CDLL(_SO)
    lib.fastx_scan.restype = ctypes.c_longlong
    lib.fastx_scan.argtypes = [
        ctypes.c_void_p, ctypes.c_longlong, ctypes.c_void_p,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_longlong,
    ]
    _lib = lib
    return lib


def fastx_scan(data: bytes):
    """Scan FASTA/FASTQ bytes natively.

    Returns (codes uint8[N], rec_off int64[R+1], names list[str]) or None
    if the native library is unavailable (caller falls back to Python).
    """
    lib = get_lib()
    if lib is None:
        return None
    n = len(data)
    max_records = max(16, n // 32)
    buf = np.frombuffer(data, dtype=np.uint8)
    codes = np.empty(n, dtype=np.uint8)
    rec_off = np.empty(max_records + 1, dtype=np.int64)
    name_off = np.empty(max_records, dtype=np.int64)
    name_len = np.empty(max_records, dtype=np.int64)
    r = lib.fastx_scan(
        buf.ctypes.data, n, codes.ctypes.data,
        rec_off.ctypes.data, name_off.ctypes.data, name_len.ctypes.data,
        max_records,
    )
    if r == -2:  # capacity exceeded (pathological tiny records): retry big
        max_records = n + 1
        rec_off = np.empty(max_records + 1, dtype=np.int64)
        name_off = np.empty(max_records, dtype=np.int64)
        name_len = np.empty(max_records, dtype=np.int64)
        r = lib.fastx_scan(
            buf.ctypes.data, n, codes.ctypes.data,
            rec_off.ctypes.data, name_off.ctypes.data, name_len.ctypes.data,
            max_records,
        )
    if r < 0:
        raise ValueError(f"malformed FASTA/FASTQ (native scanner, code {r})")
    nrec = int(r)
    names = [
        data[int(name_off[i]) : int(name_off[i]) + int(name_len[i])].decode()
        for i in range(nrec)
    ]
    return codes, rec_off[: nrec + 1].copy(), names

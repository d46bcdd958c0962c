"""Native (C++) runtime components, loaded via ctypes.

Built in-tree from native/*.cc (no pybind11 in this image; plain C ABI).
Everything has a pure-Python fallback, so the package works without a
compiler; libraries compile on demand and tests cover both paths.

Components:
  fastparse — FASTA/FASTQ scanner + base coder (gatekeeper hot path);
  ovsort    — external merge sort of overlap records (the overlap-store
              build beyond RAM; replaces ovStoreBucketizer/Sorter/Indexer,
              /root/reference/src/stores/ovStore*.C).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_REPO = os.path.dirname(os.path.dirname(_HERE))

_LIBS = {
    "fastparse": os.path.join(_REPO, "native", "fastparse.cc"),
    "ovsort": os.path.join(_REPO, "native", "ovsort.cc"),
}

_loaded: dict[str, Optional[ctypes.CDLL]] = {}


def _so_path(name: str) -> str:
    return os.path.join(_HERE, f"lib{name}.so")


def build_native(name: str = "fastparse", force: bool = False) -> bool:
    """Compile native/<name>.cc -> canu_tpu/native/lib<name>.so."""
    src = _LIBS[name]
    so = _so_path(name)
    if os.path.exists(so) and not force:
        if not os.path.exists(src) or os.path.getmtime(so) >= os.path.getmtime(src):
            return True
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-pthread", "-o", so + ".tmp", src],
            check=True, capture_output=True,
        )
        os.replace(so + ".tmp", so)
        return True
    except Exception:
        return False


def get_lib(name: str = "fastparse") -> Optional[ctypes.CDLL]:
    """The named native library, building on first use; None if unavailable."""
    if name in _loaded:
        return _loaded[name]
    _loaded[name] = None
    if not build_native(name):
        return None
    lib = ctypes.CDLL(_so_path(name))
    if name == "fastparse":
        lib.fastx_scan.restype = ctypes.c_longlong
        lib.fastx_scan.argtypes = [
            ctypes.c_void_p, ctypes.c_longlong, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_longlong,
        ]
        lib.fastx_scan_q.restype = ctypes.c_longlong
        lib.fastx_scan_q.argtypes = [
            ctypes.c_void_p, ctypes.c_longlong, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_longlong,
        ]
    elif name == "ovsort":
        lib.ovsort_file.restype = ctypes.c_longlong
        lib.ovsort_file.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p, ctypes.c_char_p,
            ctypes.c_longlong, ctypes.c_int,
        ]
    _loaded[name] = lib
    return lib


def fastx_scan(data: bytes, want_quals: bool = False):
    """Scan FASTA/FASTQ bytes natively.

    Returns (codes uint8[N], rec_off int64[R+1], names list[str]) — plus
    a quals uint8[N] plane first when ``want_quals`` — or None if the
    native library is unavailable (caller falls back to Python).
    """
    lib = get_lib("fastparse")
    if lib is None:
        return None
    n = len(data)
    max_records = max(16, n // 32)
    buf = np.frombuffer(data, dtype=np.uint8)
    codes = np.empty(n, dtype=np.uint8)
    quals = np.empty(n, dtype=np.uint8) if want_quals else None
    qptr = quals.ctypes.data if quals is not None else None

    def run(cap):
        rec_off = np.empty(cap + 1, dtype=np.int64)
        name_off = np.empty(cap, dtype=np.int64)
        name_len = np.empty(cap, dtype=np.int64)
        r = lib.fastx_scan_q(
            buf.ctypes.data, n, codes.ctypes.data, qptr,
            rec_off.ctypes.data, name_off.ctypes.data, name_len.ctypes.data,
            cap,
        )
        return r, rec_off, name_off, name_len

    r, rec_off, name_off, name_len = run(max_records)
    if r == -2:  # capacity exceeded (pathological tiny records): retry big
        r, rec_off, name_off, name_len = run(n + 1)
    if r < 0:
        raise ValueError(f"malformed FASTA/FASTQ (native scanner, code {r})")
    nrec = int(r)
    names = [
        data[int(name_off[i]) : int(name_off[i]) + int(name_len[i])].decode()
        for i in range(nrec)
    ]
    if want_quals:
        return codes, quals, rec_off[: nrec + 1].copy(), names
    return codes, rec_off[: nrec + 1].copy(), names


def ovsort_file(in_path: str, out_path: str, tmp_dir: str,
                mem_budget: int = 1 << 30, n_threads: int = 0) -> Optional[int]:
    """External-merge-sort a packed overlap-record file by (a_id, b_id).

    Returns the record count, or None if the native library is
    unavailable (caller falls back to a numpy sort).  Raises on IO /
    format errors reported by the native side.
    """
    lib = get_lib("ovsort")
    if lib is None:
        return None
    r = lib.ovsort_file(
        in_path.encode(), out_path.encode(), tmp_dir.encode(),
        int(mem_budget), int(n_threads),
    )
    if r < 0:
        raise OSError(f"ovsort_file failed with code {r}")
    return int(r)

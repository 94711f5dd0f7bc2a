"""Native (C++) host-side runtime components.

The reference's host runtime is native code (embedded LAMMPS C++ for
geometry/neighbors, Cython ScaLAPACK for the distributed solve); here the
device compute is JAX/XLA, and the irregular host-side work — neighbor
enumeration, config packing — has native implementations in this package.

The shared library is built lazily with g++ on first use and cached under
``~/.cache/fitsnap_tpu_native``; every entry point has a pure-numpy fallback
(`fitsnap_tpu/ops/neighbors.py`), so the framework works without a
toolchain.
"""

import ctypes
import hashlib
import os
import subprocess
import sys
from pathlib import Path

import numpy as np

_SRC_DIR = Path(__file__).resolve().parent
_LIB = None
_TRIED = False


def _build_and_load():
    src = _SRC_DIR / "neighbors.cpp"
    code = src.read_bytes()
    tag = hashlib.sha256(code).hexdigest()[:16]
    cache = Path(os.environ.get(
        "FITSNAP_TPU_NATIVE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache",
                     "fitsnap_tpu_native")))
    cache.mkdir(parents=True, exist_ok=True)
    so = cache / f"fsnative_{tag}.so"
    if not so.exists():
        tmp = so.with_suffix(f".build{os.getpid()}.so")
        cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
               "-o", str(tmp), str(src)]
        subprocess.run(cmd, check=True, capture_output=True)
        os.replace(tmp, so)
    lib = ctypes.CDLL(str(so))
    lib.fs_neighbors.restype = ctypes.c_int
    lib.fs_neighbors.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.c_int, ctypes.c_double, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_uint8)]
    return lib


def get_lib():
    """The native library, or None (no toolchain / build failure)."""
    global _LIB, _TRIED
    if not _TRIED:
        _TRIED = True
        if os.environ.get("FITSNAP_TPU_NO_NATIVE") == "1":
            _LIB = None
        else:
            try:
                _LIB = _build_and_load()
            except Exception as e:  # pragma: no cover - toolchain-dependent
                print(f"fitsnap_tpu.native: build failed ({e}); "
                      "using numpy fallback", file=sys.stderr)
                _LIB = None
    return _LIB


def _dptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def host_neighbors_native(pos, cell, natoms, cutoff, a_pad=None, k_pad=None):
    """Drop-in native version of `ops.neighbors.host_neighbors`.

    Returns (disp, jidx, mask, kmax) or None if the library is unavailable.
    """
    lib = get_lib()
    if lib is None:
        return None
    pos = np.ascontiguousarray(np.asarray(pos, np.float64)[:natoms])
    cell = np.ascontiguousarray(np.asarray(cell, np.float64))
    kmax = None
    if a_pad is None or k_pad is None:
        kmax = lib.fs_neighbors(_dptr(pos), _dptr(cell), natoms, cutoff,
                                0, 0, None, None, None)
    A = a_pad if a_pad is not None else natoms
    K = k_pad if k_pad is not None else kmax
    disp = np.zeros((A, K, 3), np.float64)
    jidx = np.zeros((A, K), np.int32)
    mask = np.zeros((A, K), np.uint8)
    r = lib.fs_neighbors(
        _dptr(pos), _dptr(cell), natoms, cutoff, A, K, _dptr(disp),
        jidx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    if r < 0:
        raise ValueError(f"k_pad={K} too small; need {-r}")
    return disp, jidx, mask.astype(bool), (kmax if kmax is not None else r)

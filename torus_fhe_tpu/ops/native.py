"""ctypes bindings to the native host runtime (native/torus_native.cpp).

Graceful: if the shared object hasn't been built (`make -C native`), callers
fall back to the numpy paths in ops/hostmath.py — same results, slower keygen.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None
_TRIED = False


def _find_lib():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    here = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    path = os.path.join(here, "native", "libtorus_native.so")
    if not os.path.exists(path):
        # build on first use (the .so is not checked in); failures fall back
        # to numpy WITH a diagnosis line (silent perf downgrades are
        # undebuggable — ADVICE r3). TORUS_NATIVE_NO_BUILD=1 disables the
        # implicit build for restricted environments (`make -C native` is the
        # explicit alternative).
        if os.environ.get("TORUS_NATIVE_NO_BUILD"):
            return None
        import warnings

        try:
            import subprocess

            proc = subprocess.run(["make", "-C", os.path.join(here, "native")],
                                  capture_output=True, timeout=120)
            if proc.returncode != 0:
                warnings.warn(
                    "torus_native build failed (numpy fallback): "
                    + proc.stderr.decode(errors="replace").strip()[-500:])
                return None
        except Exception as e:
            warnings.warn(f"torus_native build failed (numpy fallback): {e!r}")
            return None
        if not os.path.exists(path):
            warnings.warn("torus_native build produced no library "
                          "(numpy fallback)")
            return None
    try:
        lib = ctypes.CDLL(path)
        lib.torus_native_version.restype = ctypes.c_int32
        assert lib.torus_native_version() == 1
        lib.negacyclic_polymul_batch.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64, ctypes.c_int32]
        lib.bl_shares_stream.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32]
        lib.bl_share_matmul.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64]
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


def available() -> bool:
    return _find_lib() is not None


def _ptr(arr, typ):
    return arr.ctypes.data_as(ctypes.POINTER(typ))


def negacyclic_polymul(a: np.ndarray, b: np.ndarray, bits: int) -> np.ndarray:
    """Exact negacyclic a (*) b mod 2^bits; a broadcastable small ints,
    b torus ints, trailing axis N. Returns b-shaped torus array."""
    lib = _find_lib()
    assert lib is not None
    out_shape = np.broadcast_shapes(a.shape, b.shape)
    N = out_shape[-1]
    a_b = np.ascontiguousarray(np.broadcast_to(a, out_shape), np.int32)
    b_b = np.ascontiguousarray(np.broadcast_to(b, out_shape), np.int64)
    out = np.empty(out_shape, np.int64)
    batch = int(np.prod(out_shape[:-1])) if len(out_shape) > 1 else 1
    lib.negacyclic_polymul_batch(_ptr(a_b, ctypes.c_int32),
                                 _ptr(b_b, ctypes.c_int64),
                                 _ptr(out, ctypes.c_int64),
                                 batch, N)
    if bits == 64:
        return out
    mask = (1 << bits) - 1
    res = out & mask
    res[res >= (1 << (bits - 1))] -= 1 << bits
    return res.astype(np.int32 if bits <= 32 else np.int64)


def bl_shares_stream(key: np.ndarray, blocks: np.ndarray) -> np.ndarray:
    """shares (G, t, k, N) from key (k, N) + random blocks (G, t-1, k, N)."""
    lib = _find_lib()
    assert lib is not None
    G, tm1, k, N = blocks.shape
    t = tm1 + 1
    key = np.ascontiguousarray(key, np.int32)
    blocks = np.ascontiguousarray(blocks, np.int32)
    out = np.empty((G, t, k, N), np.int32)
    lib.bl_shares_stream(_ptr(key, ctypes.c_int32), _ptr(blocks, ctypes.c_int32),
                         _ptr(out, ctypes.c_int32), G, t, k, N)
    return out


def bl_share_matmul(M: np.ndarray, rho: np.ndarray) -> np.ndarray:
    lib = _find_lib()
    assert lib is not None
    M = np.ascontiguousarray(M, np.int32)
    rho = np.ascontiguousarray(rho, np.int32)
    d, e = M.shape
    n = rho.shape[1]
    out = np.empty((d, n), np.int32)
    lib.bl_share_matmul(_ptr(M, ctypes.c_int32), _ptr(rho, ctypes.c_int32),
                        _ptr(out, ctypes.c_int32), d, e, n)
    return out

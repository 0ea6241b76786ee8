"""ctypes loader + wrappers for the native mxq_runtime library.

Builds libmxq_runtime.so from csrc/ on first use (g++ is part of the
toolchain); all entry points have pure-Python/numpy fallbacks so the package
works without a compiler.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "csrc", "mxq_runtime.cc")
_LIB_PATH = os.path.join(_HERE, "libmxq_runtime.so")
_lock = threading.Lock()
_lib = None
_build_error: str | None = None


def _build() -> None:
    cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC",
           "-o", _LIB_PATH, _SRC]
    subprocess.run(cmd, check=True, capture_output=True, text=True)


def get_lib():
    """Load (building if needed) the native library, or None on failure."""
    global _lib, _build_error
    with _lock:
        if _lib is not None or _build_error is not None:
            return _lib
        try:
            if (not os.path.exists(_LIB_PATH)
                    or os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC)):
                _build()
            lib = ctypes.CDLL(_LIB_PATH)
            _declare(lib)
            _lib = lib
        except Exception as e:  # noqa: BLE001 — any failure => fallback
            _build_error = str(e)
        return _lib


def _declare(lib):
    i8p = ctypes.POINTER(ctypes.c_int8)
    i32p = ctypes.POINTER(ctypes.c_int32)
    i64p = ctypes.POINTER(ctypes.c_int64)
    lib.mxq_pack2b.argtypes = [i8p, ctypes.c_int64, ctypes.c_int64, i32p]
    lib.mxq_pack4b.argtypes = [i8p, ctypes.c_int64, ctypes.c_int64, i32p]
    lib.mxq_pack_meta.argtypes = [i8p, i8p, ctypes.c_int64, ctypes.c_int64,
                                  i32p]
    lib.mxq_unpack2b.argtypes = [i32p, ctypes.c_int64, ctypes.c_int64, i8p]
    lib.mxq_sched_new.restype = ctypes.c_void_p
    lib.mxq_sched_new.argtypes = [ctypes.c_int32, ctypes.c_int32]
    lib.mxq_sched_free.argtypes = [ctypes.c_void_p]
    lib.mxq_sched_submit.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                     ctypes.c_int32, ctypes.c_int32,
                                     ctypes.c_int32]
    lib.mxq_sched_admit.restype = ctypes.c_int32
    lib.mxq_sched_admit.argtypes = [ctypes.c_void_p, i32p, i64p, i32p]
    lib.mxq_sched_on_token.restype = ctypes.c_int32
    lib.mxq_sched_on_token.argtypes = [ctypes.c_void_p, ctypes.c_int32,
                                       ctypes.c_int32]
    lib.mxq_sched_active.restype = ctypes.c_int32
    lib.mxq_sched_active.argtypes = [ctypes.c_void_p, i32p, i32p, i32p]
    lib.mxq_sched_completed.restype = ctypes.c_int64
    lib.mxq_sched_completed.argtypes = [ctypes.c_void_p]
    lib.mxq_sched_pending.restype = ctypes.c_int32
    lib.mxq_sched_pending.argtypes = [ctypes.c_void_p]
    lib.mxq_sched_cancel.restype = ctypes.c_int32
    lib.mxq_sched_cancel.argtypes = [ctypes.c_void_p, ctypes.c_int64]


def _i8(a):
    return np.ascontiguousarray(a, dtype=np.int8)


def pack2b(codes: np.ndarray) -> np.ndarray:
    """[K2, N] int codes -> [K2/16, N] int32 (packfmt layout)."""
    codes = _i8(codes)
    k2, n = codes.shape
    lib = get_lib()
    out = np.empty((k2 // 16, n), np.int32)
    if lib is None:
        shifts = (np.arange(16, dtype=np.int64) * 2)[None, :, None]
        c = codes.reshape(k2 // 16, 16, n).astype(np.int64)
        return (c << shifts).sum(1).astype(np.uint32).view(np.int32)
    lib.mxq_pack2b(codes.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
                   k2, n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return out


def pack4b(codes: np.ndarray) -> np.ndarray:
    codes = _i8(codes)
    k4, n = codes.shape
    lib = get_lib()
    out = np.empty((k4 // 8, n), np.int32)
    if lib is None:
        shifts = (np.arange(8, dtype=np.int64) * 4)[None, :, None]
        c = codes.reshape(k4 // 8, 8, n).astype(np.int64)
        return (c << shifts).sum(1).astype(np.uint32).view(np.int32)
    lib.mxq_pack4b(codes.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
                   k4, n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return out


def pack_meta(zeros: np.ndarray, scales: np.ndarray) -> np.ndarray:
    """[G2, N] zero/scale codes -> [NBP, N] int32 meta words."""
    zeros, scales = _i8(zeros), _i8(scales)
    g2, n = zeros.shape
    nbp = g2 // 3
    lib = get_lib()
    if lib is None:
        # group g = t*48 + 16*i + r  ->  axes [t, i, r]
        n_kt = nbp // 16
        zv = zeros.reshape(n_kt, 3, 16, n).astype(np.int64) & 3
        sv = scales.reshape(n_kt, 3, 16, n).astype(np.int64) & 255
        out = np.zeros((n_kt, 16, n), np.int64)
        for i in range(3):
            out |= (zv[:, i] << (2 * i)) | (sv[:, i] << (6 + 8 * i))
        return out.reshape(nbp, n).astype(np.int32)
    out = np.empty((nbp, n), np.int32)
    lib.mxq_pack_meta(zeros.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
                      scales.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
                      g2, n,
                      out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return out


def unpack2b(words: np.ndarray) -> np.ndarray:
    words = np.ascontiguousarray(words, np.int32)
    rows, n = words.shape
    lib = get_lib()
    if lib is None:
        shifts = (np.arange(16, dtype=np.int64) * 2)[None, :, None]
        w = words.view(np.uint32).astype(np.int64)[:, None, :]
        return ((w >> shifts) & 3).reshape(rows * 16, n).astype(np.int8)
    out = np.empty((rows * 16, n), np.int8)
    lib.mxq_unpack2b(words.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                     rows, n,
                     out.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)))
    return out


class NativeScheduler:
    """ctypes wrapper over the C++ continuous-batching scheduler."""

    def __init__(self, num_slots: int, max_len: int):
        self._lib = get_lib()
        if self._lib is None:
            raise RuntimeError(f"native lib unavailable: {_build_error}")
        self._h = self._lib.mxq_sched_new(num_slots, max_len)
        self.num_slots = num_slots

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.mxq_sched_free(self._h)
            self._h = None

    def submit(self, uid: int, prompt_len: int, max_new_tokens: int,
               eos_token: int = -1) -> None:
        self._lib.mxq_sched_submit(self._h, uid, prompt_len, max_new_tokens,
                                   eos_token)

    def admit(self):
        slots = np.empty(self.num_slots, np.int32)
        uids = np.empty(self.num_slots, np.int64)
        plens = np.empty(self.num_slots, np.int32)
        n = self._lib.mxq_sched_admit(
            self._h, slots.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            uids.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            plens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        return [(int(slots[i]), int(uids[i]), int(plens[i]))
                for i in range(n)]

    def on_token(self, slot: int, token: int) -> bool:
        return bool(self._lib.mxq_sched_on_token(self._h, slot, token))

    def active(self):
        slots = np.empty(self.num_slots, np.int32)
        toks = np.empty(self.num_slots, np.int32)
        pos = np.empty(self.num_slots, np.int32)
        n = self._lib.mxq_sched_active(
            self._h, slots.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            toks.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            pos.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        return [(int(slots[i]), int(toks[i]), int(pos[i])) for i in range(n)]

    def cancel(self, uid: int) -> int:
        """Cancel by uid: returns the freed slot, -1 if dequeued, -2 if
        unknown (already finished)."""
        return int(self._lib.mxq_sched_cancel(self._h, uid))

    @property
    def completed(self) -> int:
        return int(self._lib.mxq_sched_completed(self._h))

    @property
    def pending(self) -> int:
        return int(self._lib.mxq_sched_pending(self._h))

"""ctypes bindings for the C++ native runtime (native/srslte_tpu_native.cpp).

The native layer provides the host-side rails the reference implements in
C/C++ (SURVEY.md §2.2): a lock-free SPSC IQ ring buffer, a UDP sample pipe
with a background receiver thread, and a steady TTI clock.  The shared
library is built on first import with g++ (no external deps).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_DIR, "native", "srslte_tpu_native.cpp")
_SO = os.path.join(_DIR, "native", "libsrslte_tpu_native.so")


def _build():
    subprocess.run(
        ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", "-pthread",
         _SRC, "-o", _SO], check=True)


def _load() -> ctypes.CDLL:
    if (not os.path.exists(_SO)
            or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
        _build()
    lib = ctypes.CDLL(_SO)
    u64, i64, f32p = ctypes.c_uint64, ctypes.c_int64, ctypes.POINTER(ctypes.c_float)
    vp = ctypes.c_void_p
    lib.rb_create.restype = vp
    lib.rb_create.argtypes = [u64]
    lib.rb_destroy.argtypes = [vp]
    lib.rb_size.restype = u64
    lib.rb_size.argtypes = [vp]
    lib.rb_write.restype = u64
    lib.rb_write.argtypes = [vp, f32p, u64]
    lib.rb_read.restype = u64
    lib.rb_read.argtypes = [vp, f32p, u64]
    lib.pipe_tx_create.restype = vp
    lib.pipe_tx_create.argtypes = [ctypes.c_char_p, ctypes.c_int]
    lib.pipe_tx_destroy.argtypes = [vp]
    lib.pipe_tx_send.restype = i64
    lib.pipe_tx_send.argtypes = [vp, f32p, u64]
    lib.pipe_rx_create.restype = vp
    lib.pipe_rx_create.argtypes = [ctypes.c_int, u64]
    lib.pipe_rx_read.restype = u64
    lib.pipe_rx_read.argtypes = [vp, f32p, u64, ctypes.c_int]
    lib.pipe_rx_destroy.argtypes = [vp]
    lib.ttic_create.restype = vp
    lib.ttic_create.argtypes = [u64]
    lib.ttic_now.restype = u64
    lib.ttic_now.argtypes = [vp]
    lib.ttic_wait.restype = u64
    lib.ttic_wait.argtypes = [vp, u64, ctypes.c_int]
    lib.ttic_destroy.argtypes = [vp]
    return lib


_lib = None


def lib() -> ctypes.CDLL:
    global _lib
    if _lib is None:
        _lib = _load()
    return _lib


def _fp(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _to_floats(x: np.ndarray) -> np.ndarray:
    """complex64 [n] -> interleaved float32 [2n] (or pass float32 through)."""
    x = np.asarray(x)
    if np.iscomplexobj(x):
        out = np.empty(2 * len(x), np.float32)
        out[0::2], out[1::2] = x.real, x.imag
        return out
    return np.ascontiguousarray(x, np.float32)


def _to_complex(f: np.ndarray) -> np.ndarray:
    return (f[0::2] + 1j * f[1::2]).astype(np.complex64)


class NativeRingBuffer:
    """SPSC IQ ring buffer (capacity in complex samples)."""

    def __init__(self, capacity: int):
        self._h = lib().rb_create(2 * capacity)

    def write(self, x: np.ndarray) -> int:
        f = _to_floats(x)
        return int(lib().rb_write(self._h, _fp(f), len(f))) // 2

    def read(self, n: int) -> np.ndarray:
        out = np.empty(2 * n, np.float32)
        got = int(lib().rb_read(self._h, _fp(out), 2 * n))
        return _to_complex(out[:got])

    @property
    def size(self) -> int:
        return int(lib().rb_size(self._h)) // 2

    def close(self):
        if self._h:
            lib().rb_destroy(self._h)
            self._h = None


class SamplePipeTx:
    """UDP IQ transmitter (native thread-free sender)."""

    def __init__(self, host: str, port: int):
        self._h = lib().pipe_tx_create(host.encode(), port)

    def send(self, x: np.ndarray) -> int:
        f = _to_floats(x)
        return int(lib().pipe_tx_send(self._h, _fp(f), len(f))) // 2

    def close(self):
        if self._h:
            lib().pipe_tx_destroy(self._h)
            self._h = None


class SamplePipeRx:
    """UDP IQ receiver: native background thread fills a native ring."""

    def __init__(self, port: int, capacity: int = 1 << 20):
        self._h = lib().pipe_rx_create(port, 2 * capacity)

    def read(self, n: int, timeout_ms: int = 1000) -> np.ndarray:
        out = np.empty(2 * n, np.float32)
        got = int(lib().pipe_rx_read(self._h, _fp(out), 2 * n, timeout_ms))
        return _to_complex(out[:got])

    def close(self):
        if self._h:
            lib().pipe_rx_destroy(self._h)
            self._h = None


class TtiClock:
    """Steady ticker with atomic TTI counter + blocking wait."""

    def __init__(self, interval_us: int = 1000):
        self._h = lib().ttic_create(interval_us)

    @property
    def now(self) -> int:
        return int(lib().ttic_now(self._h))

    def wait(self, tti: int, timeout_ms: int = 1000) -> int:
        return int(lib().ttic_wait(self._h, tti, timeout_ms))

    def close(self):
        if self._h:
            lib().ttic_destroy(self._h)
            self._h = None

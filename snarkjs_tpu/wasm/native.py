"""ctypes driver for the native C++ WASM VM (snarkjs_tpu/native/wasmvm.cpp).

Builds the shared object on first use with g++ (cached next to the
source); exposes an `Instance`-compatible object (invoke + mem) so
witness_calculator can swap it in for the pure-Python interpreter — same
semantics, ~100x the throughput.  Anything missing (no g++, build error,
unsupported opcode) falls back to snarkjs_tpu.wasm.interp transparently.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_lock = threading.Lock()
_lib = None
_lib_err = None


def _build_lib():
    here = os.path.dirname(os.path.abspath(__file__))
    src = os.path.join(here, "..", "native", "wasmvm.cpp")
    out = os.path.join(here, "..", "native", "_wasmvm.so")
    if (not os.path.exists(out)
            or os.path.getmtime(out) < os.path.getmtime(src)):
        tmp = out + f".tmp{os.getpid()}"
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", "-o", tmp, src],
            check=True, capture_output=True)
        os.replace(tmp, out)
    return out


def _get_lib():
    global _lib, _lib_err
    with _lock:
        if _lib is not None or _lib_err is not None:
            return _lib
        try:
            lib = ctypes.CDLL(_build_lib())
            lib.wvm_new.restype = ctypes.c_void_p
            lib.wvm_new.argtypes = [ctypes.c_char_p, ctypes.c_uint64,
                                    ctypes.c_char_p, ctypes.c_uint64]
            lib.wvm_free.argtypes = [ctypes.c_void_p]
            lib.wvm_error.restype = ctypes.c_char_p
            lib.wvm_error.argtypes = [ctypes.c_void_p]
            lib.wvm_invoke.restype = ctypes.c_int
            lib.wvm_invoke.argtypes = [
                ctypes.c_void_p, ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_uint64), ctypes.c_int,
                ctypes.POINTER(ctypes.c_uint64),
                ctypes.POINTER(ctypes.c_int)]
            lib.wvm_has_export.restype = ctypes.c_int
            lib.wvm_has_export.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
            lib.wvm_mem.restype = ctypes.POINTER(ctypes.c_uint8)
            lib.wvm_mem.argtypes = [ctypes.c_void_p,
                                    ctypes.POINTER(ctypes.c_uint64)]
            _lib = lib
        except Exception as e:  # no g++, build failure, ...
            _lib_err = e
        return _lib


def available() -> bool:
    return (os.environ.get("SNARKJS_NO_NATIVE_WASM") != "1"
            and _get_lib() is not None)


class _MemProxy:
    """bytearray-compatible view over the VM's linear memory (refetched
    per access: memory.grow may reallocate the backing buffer)."""

    def __init__(self, lib, handle):
        self._lib = lib
        self._h = handle

    def _buf(self):
        size = ctypes.c_uint64()
        ptr = self._lib.wvm_mem(self._h, ctypes.byref(size))
        return ptr, size.value

    def __len__(self):
        return self._buf()[1]

    def __getitem__(self, idx):
        ptr, size = self._buf()
        if isinstance(idx, slice):
            start, stop, step = idx.indices(size)
            assert step == 1
            return bytes(ctypes.string_at(
                ctypes.addressof(ptr.contents) + start, max(0, stop - start)))
        return ptr[idx]

    def __setitem__(self, idx, value):
        ptr, size = self._buf()
        if isinstance(idx, slice):
            start, stop, step = idx.indices(size)
            assert step == 1
            ctypes.memmove(ctypes.addressof(ptr.contents) + start,
                           bytes(value), stop - start)
        else:
            ptr[idx] = value


class NativeInstance:
    """interp.Instance-compatible facade over the C++ VM."""

    def __init__(self, wasm_bytes: bytes):
        from . import interp

        lib = _get_lib()
        if lib is None:
            raise RuntimeError(f"native VM unavailable: {_lib_err}")
        err = ctypes.create_string_buffer(512)
        self._lib = lib
        self._h = lib.wvm_new(wasm_bytes, len(wasm_bytes), err, 512)
        if not self._h:
            raise interp.Trap(err.value.decode() or "wasm parse failed")
        self.mem = _MemProxy(lib, self._h)

    def __del__(self):
        h = getattr(self, "_h", None)
        if h:
            self._lib.wvm_free(h)
            self._h = None

    def invoke(self, name: str, *args):
        from . import interp

        arr = (ctypes.c_uint64 * max(1, len(args)))(
            *[int(a) & 0xFFFFFFFFFFFFFFFF for a in args])
        res = ctypes.c_uint64()
        has = ctypes.c_int()
        rc = self._lib.wvm_invoke(self._h, name.encode(), arr, len(args),
                                  ctypes.byref(res), ctypes.byref(has))
        if rc != 0:
            raise interp.Trap(self._lib.wvm_error(self._h).decode())
        return res.value if has.value else None

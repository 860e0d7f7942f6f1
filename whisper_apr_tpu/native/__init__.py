"""Native C++ host-runtime kernels (ctypes bindings with Python fallback).

Builds ``libaprcore.so`` from aprcore.cpp on first use (cached next to the
source). Every binding has a pure-Python fallback, so the framework works
without a compiler; with one, the host data path (resampling for many
concurrent streams, multi-GB checksums, VAD frame features) runs native.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "aprcore.cpp")
_LIB_PATH = os.path.join(_HERE, "libaprcore.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> Optional[str]:
    """Compile the shared library if needed; returns path or None."""
    if os.path.exists(_LIB_PATH) and \
            os.path.getmtime(_LIB_PATH) >= os.path.getmtime(_SRC):
        return _LIB_PATH
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
             _SRC, "-o", _LIB_PATH],
            check=True, capture_output=True, timeout=120)
        return _LIB_PATH
    except Exception:  # noqa: BLE001 — no compiler / failed build -> fallback
        return None


def get_lib() -> Optional[ctypes.CDLL]:
    """The loaded library, building lazily; None if unavailable."""
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        path = _build()
        if path is None:
            _build_failed = True
            return None
        lib = ctypes.CDLL(path)
        lib.aprcore_crc32.restype = ctypes.c_uint32
        lib.aprcore_crc32.argtypes = [
            ctypes.c_char_p, ctypes.c_uint64, ctypes.c_uint32]
        lib.aprcore_resample_sinc.restype = ctypes.c_int64
        lib.aprcore_resample_sinc.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_double,
            ctypes.POINTER(ctypes.c_float)]
        lib.aprcore_pcm16_to_f32_mono.restype = ctypes.c_int64
        lib.aprcore_pcm16_to_f32_mono.argtypes = [
            ctypes.POINTER(ctypes.c_int16), ctypes.c_int64, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_float)]
        lib.aprcore_frame_energy_zcr.restype = None
        lib.aprcore_frame_energy_zcr.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float)]
        lib.aprcore_lz4_decompress_block.restype = ctypes.c_int64
        lib.aprcore_lz4_decompress_block.argtypes = [
            ctypes.c_char_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_char), ctypes.c_int64]
        lib.aprcore_dtw.restype = ctypes.c_int64
        lib.aprcore_dtw.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32)]
        _lib = lib
        return _lib


def available() -> bool:
    return get_lib() is not None


# -- bindings (with fallbacks) -------------------------------------------------

def crc32(data: bytes, seed: int = 0) -> int:
    lib = get_lib()
    if lib is None:
        import zlib
        return zlib.crc32(data, seed) & 0xFFFFFFFF
    return int(lib.aprcore_crc32(data, len(data), seed))


def resample_sinc(audio: np.ndarray, source_rate: int, target_rate: int,
                  half_len: int = 16, beta: float = 6.0) -> Optional[np.ndarray]:
    """Native resample; returns None if the library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    audio = np.ascontiguousarray(audio, dtype=np.float32)
    ratio = target_rate / source_rate
    out = np.empty(int(np.ceil(len(audio) * ratio)) + 1, dtype=np.float32)
    n = lib.aprcore_resample_sinc(
        audio.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(audio),
        source_rate, target_rate, half_len, beta,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    if n < 0:
        return None
    return out[:n]


def pcm16_to_f32_mono(pcm: np.ndarray, n_channels: int) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    pcm = np.ascontiguousarray(pcm, dtype=np.int16)
    n_frames = len(pcm) // n_channels
    out = np.empty(n_frames, dtype=np.float32)
    n = lib.aprcore_pcm16_to_f32_mono(
        pcm.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)), len(pcm),
        n_channels, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out[:n] if n >= 0 else None


def lz4_decompress_block(src: bytes, dst_cap: int) -> Optional[bytes]:
    """Native LZ4 block decode (the .apr load hot path; reference keeps a
    pure-Rust decompressor, compress.rs). None if unavailable or malformed
    — the caller falls back to the Python decoder for exact errors."""
    lib = get_lib()
    if lib is None:
        return None
    dst = ctypes.create_string_buffer(dst_cap)
    n = lib.aprcore_lz4_decompress_block(src, len(src), dst, dst_cap)
    if n < 0:
        return None
    return dst.raw[:n]


def frame_energy_zcr(audio: np.ndarray, frame_size: int):
    """Per-frame (rms energy, zcr); None if unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    audio = np.ascontiguousarray(audio, dtype=np.float32)
    n_frames = len(audio) // frame_size
    energy = np.empty(n_frames, dtype=np.float32)
    zcr = np.empty(n_frames, dtype=np.float32)
    lib.aprcore_frame_energy_zcr(
        audio.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(audio),
        frame_size,
        energy.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        zcr.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return energy, zcr


def dtw_path(cost: np.ndarray):
    """Monotonic DTW path over a [n_tokens, n_frames] cost matrix; returns
    (text_indices, frame_indices) int32 arrays. Native C++ DP with a pure-
    NumPy fallback (identical tie-breaking: diagonal < down < right)."""
    cost = np.ascontiguousarray(cost, dtype=np.float32)
    n, m = cost.shape
    lib = get_lib()
    if lib is not None:
        ti = np.empty(n + m, dtype=np.int32)
        tj = np.empty(n + m, dtype=np.int32)
        ln = lib.aprcore_dtw(
            cost.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n, m,
            ti.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            tj.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        if ln > 0:
            return ti[:ln], tj[:ln]
    # fallback: same DP in Python (rows vectorized where possible)
    INF = np.inf
    prev = np.full(m + 1, INF, dtype=np.float64)
    prev[0] = 0.0
    ptr = np.zeros((n, m), dtype=np.int8)
    for i in range(n):
        cur = np.full(m + 1, INF, dtype=np.float64)
        crow = cost[i]
        for j in range(1, m + 1):
            d0, d1, d2 = prev[j - 1], prev[j], cur[j - 1]
            if d0 <= d1 and d0 <= d2:
                best, p = d0, 0
            elif d1 <= d2:
                best, p = d1, 1
            else:
                best, p = d2, 2
            cur[j] = crow[j - 1] + best
            ptr[i, j - 1] = p
        prev = cur
    i, j = n, m
    ti_l, tj_l = [], []
    while i > 0 and j > 0:
        ti_l.append(i - 1)
        tj_l.append(j - 1)
        p = ptr[i - 1, j - 1]
        if p == 0:
            i -= 1
            j -= 1
        elif p == 1:
            i -= 1
        else:
            j -= 1
    return (np.asarray(ti_l[::-1], np.int32),
            np.asarray(tj_l[::-1], np.int32))

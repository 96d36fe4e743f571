"""ctypes bindings to the native C++ data pipeline (libnpvp_data.so).

The library is built lazily on first use (``make -C npvp_tpu/data/native``)
and every entry point has a NumPy fallback, so the Python data layer works
identically with or without the native build — the native path removes the
GIL from the per-batch transform/synthesis loops (the reference leans on
DataLoader worker *processes* for the same purpose, utils/dataset.py:148).
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

_NATIVE_DIR = Path(__file__).parent / "native"
_LIB_PATH = _NATIVE_DIR / "libnpvp_data.so"
_lib = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not _LIB_PATH.exists():
        try:
            subprocess.run(["make", "-C", str(_NATIVE_DIR)], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError:
        return None

    f32p = ctypes.POINTER(ctypes.c_float)
    i32p = ctypes.POINTER(ctypes.c_int)
    u64p = ctypes.POINTER(ctypes.c_uint64)
    lib.transform_batch.argtypes = [
        f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, i32p, i32p, f32p, f32p, ctypes.c_int]
    lib.synth_moving_sprites_batch.argtypes = [
        f32p, ctypes.c_int, ctypes.c_int, f32p, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, u64p, ctypes.c_int]
    _lib = lib
    return _lib


def native_available() -> bool:
    return _load() is not None


def _fp(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def transform_batch(clips: np.ndarray, crop: Optional[tuple],
                    out_size: tuple, hflips: np.ndarray, vflips: np.ndarray,
                    mean, std, num_threads: int = 4) -> Optional[np.ndarray]:
    """Fused crop→resize→flip→normalize over a (N, T, H, W, C) batch.
    Returns None when the native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    clips = np.ascontiguousarray(clips, np.float32)
    N, T, H, W, C = clips.shape
    outH, outW = out_size
    cropH, cropW = crop if crop else (0, 0)
    out = np.empty((N, T, outH, outW, C), np.float32)
    mean = np.broadcast_to(np.asarray(mean, np.float32), (C,)).copy()
    std = np.broadcast_to(np.asarray(std, np.float32), (C,)).copy()
    hf = np.ascontiguousarray(hflips, np.int32)
    vf = np.ascontiguousarray(vflips, np.int32)
    lib.transform_batch(
        _fp(clips), N, T, H, W, C, _fp(out), cropH, cropW, outH, outW,
        hf.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        vf.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        _fp(mean), _fp(std), num_threads)
    return out


def synth_moving_sprites_batch(sprites: np.ndarray, seq_len: int,
                               image_size: int, num_digits: int,
                               deterministic: bool, seeds: np.ndarray,
                               num_threads: int = 4) -> Optional[np.ndarray]:
    """Render N bouncing-sprite clips (N = len(seeds)); (N, T, S, S, 1) in
    [0, 1]. Returns None when the native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    sprites = np.ascontiguousarray(sprites, np.float32)
    num_sprites, D, _ = sprites.shape
    seeds = np.ascontiguousarray(seeds, np.uint64)
    N = seeds.shape[0]
    out = np.empty((N, seq_len, image_size, image_size, 1), np.float32)
    lib.synth_moving_sprites_batch(
        _fp(sprites), num_sprites, D, _fp(out), N, seq_len, image_size,
        num_digits, int(deterministic),
        seeds.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)), num_threads)
    return out

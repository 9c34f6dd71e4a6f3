"""ctypes bindings for the native preprocessing library.

Builds libivl_preprocess.so on first use (g++ -O3 -shared); falls back to
the pure-numpy pipeline in data/processing.py when no compiler is present.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "preprocess.cpp")
_LIB = os.path.join(_HERE, "libivl_preprocess.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None

OPENAI_CLIP_MEAN = np.asarray([0.48145466, 0.4578275, 0.40821073], np.float32)
OPENAI_CLIP_STD = np.asarray([0.26862954, 0.26130258, 0.27577711], np.float32)


def build_library(force: bool = False) -> str:
    with _lock:
        if force or not os.path.exists(_LIB) or (
            os.path.getmtime(_SRC) > os.path.getmtime(_LIB)
        ):
            subprocess.run(
                ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
                 "-pthread", _SRC, "-o", _LIB],
                check=True,
                capture_output=True,
            )
    return _LIB


def get_lib() -> ctypes.CDLL:
    global _lib
    if _lib is None:
        path = build_library()
        lib = ctypes.CDLL(path)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        f32p = ctypes.POINTER(ctypes.c_float)
        lib.ivl_preprocess_frame.restype = ctypes.c_int
        lib.ivl_preprocess_frame.argtypes = [
            u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            f32p, f32p, f32p, ctypes.c_int,
        ]
        lib.ivl_pipeline_create.restype = ctypes.c_void_p
        lib.ivl_pipeline_create.argtypes = [ctypes.c_int]
        lib.ivl_pipeline_destroy.argtypes = [ctypes.c_void_p]
        lib.ivl_pipeline_submit.restype = ctypes.c_int
        lib.ivl_pipeline_submit.argtypes = [
            ctypes.c_void_p, u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            f32p, f32p, ctypes.c_int,
        ]
        lib.ivl_pipeline_collect.restype = ctypes.c_int
        lib.ivl_pipeline_collect.argtypes = [
            ctypes.c_void_p, ctypes.c_int, f32p, ctypes.c_int64,
        ]
        _lib = lib
    return _lib


def available() -> bool:
    try:
        get_lib()
        return True
    except (OSError, subprocess.CalledProcessError, FileNotFoundError):
        return False


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _u8ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def preprocess_frame(
    img: np.ndarray,  # [H, W, C] uint8
    out_hw: Tuple[int, int],
    patch_size: int = 14,
    temporal_patch_size: int = 2,
    merge_size: int = 2,
    bicubic: bool = True,
) -> np.ndarray:
    """Fused native resize+normalize+patchify. Returns
    [grid_h*grid_w, C*tps*ps*ps] float32."""
    lib = get_lib()
    img = np.ascontiguousarray(img, dtype=np.uint8)
    H, W, C = img.shape
    oh, ow = out_hw
    gh, gw = oh // patch_size, ow // patch_size
    out = np.empty(
        (gh * gw, C * temporal_patch_size * patch_size * patch_size), np.float32
    )
    rc = lib.ivl_preprocess_frame(
        _u8ptr(img), H, W, C, oh, ow, patch_size, temporal_patch_size,
        merge_size, _fptr(OPENAI_CLIP_MEAN), _fptr(OPENAI_CLIP_STD),
        _fptr(out), int(bicubic),
    )
    if rc < 0:
        raise ValueError(f"native preprocess failed: rc={rc}")
    return out


class FramePipeline:
    """Threaded prefetcher: submit raw frames while the device computes."""

    def __init__(self, workers: int = 2, **kwargs):
        self.lib = get_lib()
        self.handle = self.lib.ivl_pipeline_create(workers)
        self.kwargs = kwargs

    def submit(self, img: np.ndarray, out_hw: Tuple[int, int]) -> int:
        img = np.ascontiguousarray(img, dtype=np.uint8)
        H, W, C = img.shape
        k = self.kwargs
        return self.lib.ivl_pipeline_submit(
            self.handle, _u8ptr(img), H, W, C, out_hw[0], out_hw[1],
            k.get("patch_size", 14), k.get("temporal_patch_size", 2),
            k.get("merge_size", 2), _fptr(OPENAI_CLIP_MEAN),
            _fptr(OPENAI_CLIP_STD), int(k.get("bicubic", True)),
        )

    def collect(self, ticket: int, out_hw: Tuple[int, int]) -> np.ndarray:
        k = self.kwargs
        ps = k.get("patch_size", 14)
        tps = k.get("temporal_patch_size", 2)
        gh, gw = out_hw[0] // ps, out_hw[1] // ps
        out = np.empty((gh * gw, 3 * tps * ps * ps), np.float32)
        rc = self.lib.ivl_pipeline_collect(
            self.handle, ticket, _fptr(out), out.size
        )
        if rc < 0:
            raise ValueError(f"collect failed rc={rc}")
        return out

    def close(self):
        if self.handle:
            self.lib.ivl_pipeline_destroy(self.handle)
            self.handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

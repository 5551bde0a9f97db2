"""ctypes bindings for the native C++ oracle library (runtime/oracle.cpp).

Compiles liboracle.so on first use (g++ is in the image); falls back to the
numpy oracles in utils.oracles when no compiler is available, so the API is
always usable. Mirrors the reference's C++ CPU-oracle layer (SURVEY.md
section 4.1) with a python surface identical to utils.oracles.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

from flashattention_kernel_project_tpu.utils import oracles as np_oracles

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "oracle.cpp")
_SO = os.path.join(_DIR, "liboracle.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> str | None:
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
        _SRC, "-o", _SO,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return _SO
    except (subprocess.SubprocessError, FileNotFoundError, OSError):
        return None


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        so = _SO if os.path.exists(_SO) else _build()
        if so is None:
            return None
        lib = ctypes.CDLL(so)
        i64, i32, f32 = ctypes.c_int64, ctypes.c_int32, ctypes.c_float
        ptr = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        lib.gemm_f32.argtypes = [ptr, ptr, ptr, i64, i64, i64]
        lib.softmax_f32.argtypes = [ptr, ptr, i64, i64]
        lib.gqa_attention_f32.argtypes = [
            ptr, ptr, ptr, ptr, i64, i64, i64, i64, i64, i64, f32, i32, i64,
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def gemm(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    lib = _load()
    if lib is None or a.ndim != 2:
        return np_oracles.gemm(a, b)
    a = np.ascontiguousarray(a, np.float32)
    b = np.ascontiguousarray(b, np.float32)
    m, k = a.shape
    n = b.shape[1]
    c = np.empty((m, n), np.float32)
    lib.gemm_f32(a, b, c, m, k, n)
    return c


def softmax(x: np.ndarray) -> np.ndarray:
    lib = _load()
    if lib is None:
        return np_oracles.softmax(x)
    x2 = np.ascontiguousarray(x, np.float32).reshape(-1, x.shape[-1])
    y = np.empty_like(x2)
    lib.softmax_f32(x2, y, x2.shape[0], x2.shape[1])
    return y.reshape(x.shape)


def gqa_attention(
    q: np.ndarray,
    k: np.ndarray,
    v: np.ndarray,
    *,
    scale: float | None = None,
    causal: bool = False,
    q_offset: int = 0,
) -> np.ndarray:
    lib = _load()
    if lib is None:
        return np_oracles.gqa_attention(
            q, k, v, scale=scale, causal=causal, q_offset=q_offset
        )
    b, hq, n, d = q.shape
    hkv, s = k.shape[1], k.shape[2]
    if scale is None:
        scale = 1.0 / np.sqrt(d)
    q = np.ascontiguousarray(q, np.float32)
    k = np.ascontiguousarray(k, np.float32)
    v = np.ascontiguousarray(v, np.float32)
    o = np.empty((b, hq, n, d), np.float32)
    lib.gqa_attention_f32(
        q, k, v, o, b, hq, hkv, n, s, d, float(scale), int(causal), q_offset
    )
    return o

"""ctypes bridge to the native C++ runtime (native/sift3d_native.cpp).

The .so is built on demand with g++ (cached next to the source); every
entry point has a pure-Python fallback in sift3d.io.keyfile, so the
framework works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_SRC = os.path.join(os.path.dirname(__file__), "..", "..", "native", "sift3d_native.cpp")
_SO = os.path.join(os.path.dirname(__file__), "..", "..", "native", "libsift3d_native.so")


def _build() -> bool:
    src = os.path.abspath(_SRC)
    so = os.path.abspath(_SO)
    if not os.path.exists(src):
        return False
    if os.path.exists(so) and os.path.getmtime(so) >= os.path.getmtime(src):
        return True
    try:
        subprocess.run(
            ["g++", "-O3", "-fPIC", "-shared", "-o", so, src],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception:
        return False


def load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    with _LOCK:
        if _TRIED:
            return _LIB
        _TRIED = True
        if not _build():
            return None
        try:
            lib = ctypes.CDLL(os.path.abspath(_SO))
        except OSError:
            return None
        f32 = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        u32 = np.ctypeslib.ndpointer(np.uint32, flags="C_CONTIGUOUS")
        lib.s3d_write_key_text.restype = ctypes.c_int
        lib.s3d_write_key_text.argtypes = [
            ctypes.c_char_p, ctypes.c_int, f32, f32, f32, f32, u32, f32,
            ctypes.c_int, ctypes.POINTER(ctypes.c_char_p), ctypes.c_float,
        ]
        lib.s3d_key_count.restype = ctypes.c_int
        lib.s3d_key_count.argtypes = [ctypes.c_char_p]
        lib.s3d_read_key_text.restype = ctypes.c_int
        lib.s3d_read_key_text.argtypes = [
            ctypes.c_char_p, ctypes.c_int, f32, f32, f32, f32, u32, f32,
        ]
        _LIB = lib
        return _LIB


def write_key_text(feats, path: str, eig_threshold: float, comments) -> Optional[int]:
    """Native fast-path writer; returns None when unavailable."""
    lib = load()
    if lib is None:
        return None
    comments = [c.encode() for c in (comments or [])]
    arr = (ctypes.c_char_p * len(comments))(*comments)
    n = len(feats)
    return int(
        lib.s3d_write_key_text(
            path.encode(), n,
            np.ascontiguousarray(feats.xyz, np.float32),
            np.ascontiguousarray(feats.scale, np.float32),
            np.ascontiguousarray(feats.ori.reshape(n, 9) if n else feats.ori.reshape(0, 9), np.float32),
            np.ascontiguousarray(feats.eigs, np.float32),
            np.ascontiguousarray(feats.info, np.uint32),
            np.ascontiguousarray(feats.desc, np.float32),
            len(comments), arr, ctypes.c_float(eig_threshold),
        )
    )


def read_key_text(path: str):
    """Native fast-path reader; returns FeatureSet or None when unavailable."""
    from sift3d.core.featureset import FeatureSet

    lib = load()
    if lib is None:
        return None
    n = int(lib.s3d_key_count(path.encode()))
    if n < 0:
        raise ValueError(f"{path}: not a .key text file")
    xyz = np.zeros((n, 3), np.float32)
    scale = np.zeros(n, np.float32)
    ori = np.zeros((n, 9), np.float32)
    eigs = np.zeros((n, 3), np.float32)
    info = np.zeros(n, np.uint32)
    desc = np.zeros((n, 64), np.float32)
    rows = int(lib.s3d_read_key_text(path.encode(), n, xyz, scale, ori, eigs, info, desc))
    if rows < 0:
        raise ValueError(f"{path}: parse failure")
    sl = slice(0, rows)
    return FeatureSet(
        xyz=xyz[sl], scale=scale[sl], ori=ori[sl].reshape(-1, 3, 3),
        eigs=eigs[sl], info=info[sl], desc=desc[sl],
    )

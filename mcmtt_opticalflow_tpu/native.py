"""ctypes bindings for the native host runtime (native/mcmtt_native.cpp).

Auto-builds the shared library on first use (g++, see native/Makefile) and
degrades gracefully: callers check `available()` and fall back to the
Python/scipy paths when no toolchain is present.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libmcmtt_native.so")


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.lap_solve.restype = ctypes.c_double
    lib.lap_solve.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int)]
    lib.bls_mwcp_solve.restype = ctypes.c_double
    lib.bls_mwcp_solve.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int, ctypes.c_int, ctypes.c_uint64,
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_int)]
    lib.parse_detections.restype = ctypes.c_int
    lib.parse_detections.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_double), ctypes.c_int]
    lib.rgb_to_gray_u8.restype = None
    lib.rgb_to_gray_u8.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_longlong,
        ctypes.POINTER(ctypes.c_uint8)]
    _LIB = lib
    return _LIB


def available() -> bool:
    return _load() is not None


def lap_solve(cost: np.ndarray) -> Tuple[np.ndarray, float]:
    """Exact min-cost assignment; returns (col_of_row [-1 = none], total)."""
    lib = _load()
    assert lib is not None, "native library unavailable"
    cost = np.ascontiguousarray(cost, np.float64)
    r, c = cost.shape
    out = np.full(r, -1, np.int32)
    total = lib.lap_solve(
        cost.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), r, c,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int)))
    return out, float(total)


def bls_mwcp_solve(weights: np.ndarray, adj: np.ndarray,
                   max_iterations: int = 2000, seed: int = 0,
                   max_solutions: int = 32):
    """Serial BLS MWCP; returns (best_mask, best_score, sol_masks,
    sol_scores)."""
    lib = _load()
    assert lib is not None, "native library unavailable"
    weights = np.ascontiguousarray(weights, np.float64)
    n = len(weights)
    adj_u8 = np.ascontiguousarray(adj.astype(np.uint8))
    mask = np.zeros(n, np.uint8)
    sol_masks = np.zeros((max_solutions, n), np.uint8)
    sol_scores = np.zeros(max_solutions, np.float64)
    nsol = ctypes.c_int(0)
    best = lib.bls_mwcp_solve(
        weights.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        adj_u8.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        n, max_iterations, seed,
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        max_solutions,
        sol_masks.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        sol_scores.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ctypes.byref(nsol))
    m = nsol.value
    return (mask.astype(bool), float(best),
            sol_masks[:m].astype(bool), sol_scores[:m])


def rgb_to_gray_u8(rgb: np.ndarray) -> np.ndarray:
    """[..., 3] uint8 RGB -> [...] uint8 gray, (r+g+b)//3 — bit-identical
    to the numpy fallback in TrackingEngine.process_frame."""
    lib = _load()
    assert lib is not None, "native library unavailable"
    rgb = np.ascontiguousarray(rgb, np.uint8)
    assert rgb.shape[-1] == 3
    gray = np.empty(rgb.shape[:-1], np.uint8)
    lib.rgb_to_gray_u8(
        rgb.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_longlong(gray.size),
        gray.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return gray


def parse_detections(text: str, max_boxes: int = 256) -> np.ndarray:
    """Parse a PETS full-body detection file's text -> [K, 4] boxes."""
    lib = _load()
    assert lib is not None, "native library unavailable"
    out = np.zeros((max_boxes, 4), np.float64)
    n = lib.parse_detections(
        text.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        max_boxes)
    return out[:max(n, 0)].astype(np.float32)

"""ctypes bindings for the native host data path (native/lhrs_host.cc).

The C++ library fuses JPEG decode + bilinear shortest-edge resize + center
crop per image and threads across the batch — the host half of the
uint8-to-logits pipeline (the device half is ops/patch_embed.py). Falls back
to PIL when the shared library hasn't been built (`make -C native`).
"""

from __future__ import annotations

import ctypes
import logging
import os
from typing import List, Optional, Sequence, Tuple

import numpy as np

logger = logging.getLogger("lhrs_tpu")

_LIB: Optional[ctypes.CDLL] = None
_LIB_TRIED = False


def _lib_path() -> str:
    return os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))),
        "native", "liblhrs_host.so")


def load_library() -> Optional[ctypes.CDLL]:
    global _LIB, _LIB_TRIED
    if _LIB_TRIED:
        return _LIB
    _LIB_TRIED = True
    path = _lib_path()
    if not os.path.exists(path):
        logger.info("native host library not built (%s); using PIL fallback",
                    path)
        return None
    lib = ctypes.CDLL(path)
    lib.lhrs_decode_resize_batch.restype = ctypes.c_int
    lib.lhrs_decode_resize_batch.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
    ]
    lib.lhrs_resize_batch.restype = None
    lib.lhrs_resize_batch.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
    ]
    _LIB = lib
    return lib


def available() -> bool:
    return load_library() is not None


def _as_u8_ptr(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def decode_resize_batch(
    jpeg_buffers: Sequence[bytes], size: int = 224, num_threads: int = 0,
) -> Tuple[np.ndarray, np.ndarray]:
    """JPEG bytes → (n, size, size, 3) uint8 + ok mask (corrupt → 0-filled).

    Uses the native library when built; PIL otherwise.
    """
    n = len(jpeg_buffers)
    out = np.zeros((n, size, size, 3), np.uint8)
    ok = np.zeros((n,), np.uint8)
    lib = load_library()
    if lib is not None and n:
        data = np.frombuffer(b"".join(jpeg_buffers), np.uint8).copy()
        offsets = np.zeros((n + 1,), np.int64)
        np.cumsum([len(b) for b in jpeg_buffers], out=offsets[1:])
        lib.lhrs_decode_resize_batch(
            _as_u8_ptr(data),
            offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            n, size, _as_u8_ptr(out), _as_u8_ptr(ok), num_threads)
        return out, ok.astype(bool)

    # PIL fallback
    import io

    from .transforms import clip_preprocess_uint8

    for i, buf in enumerate(jpeg_buffers):
        try:
            from PIL import Image

            with Image.open(io.BytesIO(buf)) as img:
                out[i] = clip_preprocess_uint8(img, size)
            ok[i] = 1
        except Exception:  # noqa: BLE001 — corrupt sample, skip
            pass
    return out, ok.astype(bool)


def resize_batch(images: List[np.ndarray], size: int = 224,
                 num_threads: int = 0) -> np.ndarray:
    """Decoded RGB uint8 images (varied sizes) → (n, size, size, 3)."""
    n = len(images)
    out = np.zeros((n, size, size, 3), np.uint8)
    lib = load_library()
    if lib is not None and n:
        flat = np.concatenate([img.reshape(-1) for img in images])
        offsets = np.zeros((n,), np.int64)
        np.cumsum([img.size for img in images[:-1]], out=offsets[1:])
        dims = np.asarray([[img.shape[0], img.shape[1]] for img in images],
                          np.int32).reshape(-1)
        lib.lhrs_resize_batch(
            _as_u8_ptr(np.ascontiguousarray(flat)),
            offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            dims.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            n, size, _as_u8_ptr(out), num_threads)
        return out

    from .transforms import clip_preprocess_uint8

    for i, img in enumerate(images):
        out[i] = clip_preprocess_uint8(img, size)
    return out

"""ctypes binding for the C++ decode runtime (csrc/decode.cc).

Compiles the shared library on first use (g++ -O3 -ljpeg) into
``csrc/libvipersdecode.so``; every entry point has a PIL fallback so the
framework works without a toolchain.  Python threads release the GIL inside
the C calls, so ``ImageFolderLoader``'s thread pool scales across cores
(replacing torch DataLoader worker *processes*).
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

_CSRC = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "csrc")


def _build_and_load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        src = os.path.join(_CSRC, "decode.cc")
        so = os.path.join(_CSRC, "libvipersdecode.so")
        try:
            if not os.path.exists(so) or os.path.getmtime(so) < os.path.getmtime(src):
                subprocess.run(
                    ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                     src, "-o", so, "-ljpeg"],
                    check=True, capture_output=True,
                )
            lib = ctypes.CDLL(so)
            lib.vipers_jpeg_dims.restype = ctypes.c_int
            lib.vipers_decode_eval.restype = ctypes.c_int
            lib.vipers_decode_rrc.restype = ctypes.c_int
            lib.vipers_decode_pad.restype = ctypes.c_int
            _LIB = lib
        except (subprocess.CalledProcessError, OSError) as e:  # pragma: no cover
            print(f"[vipers.native] falling back to PIL decode: {e}")
            _LIB = None
        return _LIB


def available() -> bool:
    return _build_and_load() is not None


def jpeg_dims(path: str):
    lib = _build_and_load()
    data = np.fromfile(path, dtype=np.uint8)
    if lib is None:
        from PIL import Image

        with Image.open(path) as im:
            return im.size  # (w, h)
    w = ctypes.c_int()
    h = ctypes.c_int()
    rc = lib.vipers_jpeg_dims(
        data.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), data.size,
        ctypes.byref(w), ctypes.byref(h),
    )
    if rc != 0:
        raise ValueError(f"not a decodable JPEG: {path}")
    return w.value, h.value


def decode_eval(path: str, resize: int = 256, crop: int = 224) -> np.ndarray:
    """Eval preset fast path: decode -> shorter-side resize -> center crop.
    Falls back to the PIL pipeline (exact preset parity) when the native lib
    is unavailable or the file is not a JPEG."""
    lib = _build_and_load()
    if lib is None or not path.lower().endswith((".jpg", ".jpeg")):
        from vipers.data.preprocess import eval_decode

        return eval_decode(path, resize, crop)
    data = np.fromfile(path, dtype=np.uint8)
    out = np.empty((crop, crop, 3), np.uint8)
    rc = lib.vipers_decode_eval(
        data.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), data.size,
        resize, crop, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    if rc != 0:
        from vipers.data.preprocess import eval_decode

        return eval_decode(path, resize, crop)
    return out


def decode_pad(path: str, pad_multiple: int = 16):
    """LOST-driver fast path: full-resolution decode straight into a
    zero-padded uint8 slab whose extent is the image rounded UP to
    ``pad_multiple`` (the transformer tier-1 pad).  One C call, no float
    math on host — normalization happens on device
    (`discovery.driver` batched pipelines).  Returns
    ``(padded (PH, PW, 3) uint8, (h, w) exact decoded dims)``.
    PIL fallback for non-JPEGs / missing toolchain."""
    lib = _build_and_load()
    if lib is not None and path.lower().endswith((".jpg", ".jpeg")):
        data = np.fromfile(path, dtype=np.uint8)
        w = ctypes.c_int()
        h = ctypes.c_int()
        if lib.vipers_jpeg_dims(
            data.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), data.size,
            ctypes.byref(w), ctypes.byref(h),
        ) == 0:
            ph = -(-h.value // pad_multiple) * pad_multiple
            pw = -(-w.value // pad_multiple) * pad_multiple
            out = np.empty((ph, pw, 3), np.uint8)
            rc = lib.vipers_decode_pad(
                data.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                data.size,
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                ph, pw, ctypes.byref(w), ctypes.byref(h),
            )
            if rc == 0:
                return out, (h.value, w.value)
    from PIL import Image

    img = np.asarray(Image.open(path).convert("RGB"), dtype=np.uint8)
    h_, w_ = img.shape[:2]
    ph = -(-h_ // pad_multiple) * pad_multiple
    pw = -(-w_ // pad_multiple) * pad_multiple
    out = np.zeros((ph, pw, 3), np.uint8)
    out[:h_, :w_] = img
    return out, (h_, w_)


def decode_train(path: str, rng: np.random.Generator, crop_size: int = 224,
                 hflip_prob: float = 0.5, auto_augment: str = "",
                 scale=(0.08, 1.0), ratio=(3 / 4, 4 / 3),
                 ra_magnitude: int = 9, augmix_severity: int = 3) -> np.ndarray:
    """RandomResizedCrop + hflip fast path (box sampled here, pixels in C++)."""
    lib = _build_and_load()
    if lib is None or not path.lower().endswith((".jpg", ".jpeg")):
        from vipers.data.preprocess import train_decode

        return train_decode(path, rng, crop_size, hflip_prob, auto_augment,
                            ra_magnitude, augmix_severity)
    w, h = jpeg_dims(path)
    area = w * h
    box = None
    for _ in range(10):
        target_area = area * rng.uniform(scale[0], scale[1])
        aspect = np.exp(rng.uniform(np.log(ratio[0]), np.log(ratio[1])))
        cw = int(round(np.sqrt(target_area * aspect)))
        ch = int(round(np.sqrt(target_area / aspect)))
        if 0 < cw <= w and 0 < ch <= h:
            left = int(rng.integers(0, w - cw + 1))
            top = int(rng.integers(0, h - ch + 1))
            box = (left, top, cw, ch)
            break
    if box is None:
        in_ratio = w / h
        if in_ratio < ratio[0]:
            cw, ch = w, int(round(w / ratio[0]))
        elif in_ratio > ratio[1]:
            ch, cw = h, int(round(h * ratio[1]))
        else:
            cw, ch = w, h
        box = ((w - cw) // 2, (h - ch) // 2, cw, ch)
    flip = 1 if (hflip_prob > 0 and rng.random() < hflip_prob) else 0

    data = np.fromfile(path, dtype=np.uint8)
    out = np.empty((crop_size, crop_size, 3), np.uint8)
    rc = lib.vipers_decode_rrc(
        data.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), data.size,
        box[0], box[1], box[2], box[3], crop_size, flip,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    if rc != 0:
        from vipers.data.preprocess import train_decode

        return train_decode(path, rng, crop_size, hflip_prob, auto_augment,
                            ra_magnitude, augmix_severity)
    if auto_augment:
        from vipers.data.autoaugment import apply_policy

        out = apply_policy(auto_augment, out, rng,
                           ra_magnitude=ra_magnitude,
                           augmix_severity=augmix_severity)
    return out

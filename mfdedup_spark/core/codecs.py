"""Deterministic image codecs for the opaque ``bytes`` column.

The container has no image libraries (no PIL/opencv), so per the build
brief the *decode step* is a deterministic fake while all Spark-side
plumbing (binary column, typed metadata, Arrow batch shapes) is real:

- ``raw``  : grayscale uint8 pixels, row-major, lossless.
- ``png``  : zlib-compressed pixels (lossless — stands in for real PNG).
- ``jpeg`` : pixels quantized to step 2 then zlib-compressed (lossy —
  PSNR ≈ 51 dB vs original, above the 40 dB invariant in
  BASELINE.json input_hint).

Swapping in real codecs later only touches this module.
"""

from __future__ import annotations

import zlib

import numpy as np

LOSSY_FORMATS = {"jpeg"}
_JPEG_STEP = 2


def encode(pixels: np.ndarray, fmt: str) -> bytes:
    """pixels: (h, w) uint8 → encoded bytes."""
    if fmt == "raw":
        return pixels.tobytes()
    if fmt == "png":
        return zlib.compress(pixels.tobytes(), 6)
    if fmt == "jpeg":
        q = (pixels // _JPEG_STEP) * _JPEG_STEP
        return zlib.compress(q.astype(np.uint8).tobytes(), 6)
    raise ValueError(f"unknown fmt {fmt!r}")


def decode(data: bytes, w: int, h: int, fmt: str) -> np.ndarray:
    """encoded bytes → (h, w) uint8 pixels."""
    if fmt == "raw":
        buf = data
    elif fmt in ("png", "jpeg"):
        buf = zlib.decompress(data)
    else:
        raise ValueError(f"unknown fmt {fmt!r}")
    return np.frombuffer(buf, dtype=np.uint8).reshape(h, w)


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB; inf for identical images."""
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    if mse == 0.0:
        return float("inf")
    return 10.0 * np.log10(255.0**2 / mse)

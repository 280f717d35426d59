"""Deterministic image codecs for the opaque ``bytes`` column.

The container has no image libraries (no PIL/opencv), so per the build
brief the codecs here are self-contained while all Spark-side plumbing
(binary column, typed metadata, Arrow batch shapes) is real:

- ``raw``  : grayscale uint8 pixels, row-major, lossless.
- ``png``  : zlib-compressed pixels (lossless — stands in for real PNG).
- ``jpeg`` : a real JPEG-shaped lossy codec: 8×8 block DCT-II, uniform
  quantization, zlib entropy coding. Decode does dequantize + inverse
  DCT — the same ALU profile as real JPEG decode, so signature-stage
  compute is realistic. Quantizer chosen so PSNR ≈ 44-50 dB, above the
  40 dB invariant in BASELINE.json input_hint.

Swapping in real codecs later only touches this module.
"""

from __future__ import annotations

import zlib

import numpy as np

LOSSY_FORMATS = {"jpeg"}
_Q = 6.0  # uniform DCT-coefficient quantization step


def _dct_matrix(n: int = 8) -> np.ndarray:
    k = np.arange(n)[:, None]
    i = np.arange(n)[None, :]
    m = np.cos(np.pi * (2 * i + 1) * k / (2 * n)) * np.sqrt(2.0 / n)
    m[0] /= np.sqrt(2.0)
    return m


_D8 = _dct_matrix(8)
_D8T = _D8.T.copy()


def _blocks(px: np.ndarray) -> tuple[np.ndarray, int, int]:
    """(h,w) → (nblocks, 8, 8) with zero padding to 8-multiples."""
    h, w = px.shape
    ph, pw = (-h) % 8, (-w) % 8
    if ph or pw:
        px = np.pad(px, ((0, ph), (0, pw)))
    H, W = px.shape
    b = px.reshape(H // 8, 8, W // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    return b, H, W


def _unblocks(b: np.ndarray, H: int, W: int, h: int, w: int) -> np.ndarray:
    px = (
        b.reshape(H // 8, W // 8, 8, 8).transpose(0, 2, 1, 3).reshape(H, W)
    )
    return px[:h, :w]


def encode(pixels: np.ndarray, fmt: str) -> bytes:
    """pixels: (h, w) uint8 → encoded bytes."""
    if fmt == "raw":
        return pixels.tobytes()
    if fmt == "png":
        return zlib.compress(pixels.tobytes(), 6)
    if fmt == "jpeg":
        b, H, W = _blocks(pixels.astype(np.float64) - 128.0)
        coeffs = _D8 @ b @ _D8T          # batched 8×8 forward DCT
        q = np.round(coeffs / _Q).astype(np.int16)
        return zlib.compress(q.tobytes(), 6)
    raise ValueError(f"unknown fmt {fmt!r}")


def decode(data: bytes, w: int, h: int, fmt: str) -> np.ndarray:
    """encoded bytes → (h, w) uint8 pixels."""
    if fmt == "raw":
        return np.frombuffer(data, dtype=np.uint8).reshape(h, w)
    if fmt == "png":
        return np.frombuffer(zlib.decompress(data), dtype=np.uint8).reshape(h, w)
    if fmt == "jpeg":
        H, W = h + ((-h) % 8), w + ((-w) % 8)
        q = np.frombuffer(zlib.decompress(data), dtype=np.int16).reshape(-1, 8, 8)
        b = _D8T @ (q.astype(np.float64) * _Q) @ _D8   # inverse DCT
        px = np.clip(np.round(_unblocks(b, H, W, h, w) + 128.0), 0, 255)
        return px.astype(np.uint8)
    raise ValueError(f"unknown fmt {fmt!r}")


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB; inf for identical images."""
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    if mse == 0.0:
        return float("inf")
    return 10.0 * np.log10(255.0**2 / mse)

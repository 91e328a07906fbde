"""Dependency-free lossy image codec ("dctq"): 8x8 block DCT +
uniform quantization, pure numpy.

Exists so the BASELINE per-row invariant — decoded pixels round-trip at
PSNR >= 40 dB for LOSSY codecs — is exercised against a genuinely lossy
path in this container (PIL/libjpeg are absent; the png/jpeg hooks in
operators/images.py stay gated on PIL).  The transform is the JPEG
luma pipeline shape (DCT-II, quantize, dequantize, IDCT) with a flat
quantization step q: per-coefficient error <= q/2, so pixel RMSE is
~q/sqrt(12) per the orthonormal transform and q=4 lands ~47 dB on
white noise — comfortably lossy AND comfortably above the 40 dB bar.

Format: b"DCTQ" | u16 w | u16 h | u8 q | int16-LE coefficients in
(channel, block_row, block_col, 8, 8) C-order over the zero-padded
8-multiple canvas.  ~2 bytes/sample vs 1 for raw — this codec is about
exercising the lossy invariant, not about ratio.
"""

from __future__ import annotations

import struct

import numpy as np

MAGIC = b"DCTQ"
_B = 8


def _dct_matrix() -> np.ndarray:
    j = np.arange(_B)
    k = j[:, None]
    m = np.cos(np.pi * (2 * j[None, :] + 1) * k / (2 * _B)) * np.sqrt(2.0 / _B)
    m[0] /= np.sqrt(2.0)
    return m


_D = _dct_matrix()


def _to_blocks(ch: np.ndarray) -> np.ndarray:
    """(H, W) zero-padded to 8-multiples -> (nbh, nbw, 8, 8)."""
    h, w = ch.shape
    ph, pw = (-h) % _B, (-w) % _B
    if ph or pw:
        ch = np.pad(ch, ((0, ph), (0, pw)))
    hh, ww = ch.shape
    return ch.reshape(hh // _B, _B, ww // _B, _B).transpose(0, 2, 1, 3)


def _from_blocks(blocks: np.ndarray, h: int, w: int) -> np.ndarray:
    nbh, nbw = blocks.shape[:2]
    full = blocks.transpose(0, 2, 1, 3).reshape(nbh * _B, nbw * _B)
    return full[:h, :w]


def encode_dctq(a: np.ndarray, q: int = 4) -> bytes:
    """(h, w, 3) uint8 -> dctq bytes."""
    h, w = a.shape[:2]
    assert 1 <= q <= 255 and w < 65536 and h < 65536
    coefs = []
    for c in range(3):
        blocks = _to_blocks(a[:, :, c].astype(np.float64) - 128.0)
        dct = np.einsum("ij,rcjk,lk->rcil", _D, blocks, _D)
        coefs.append(np.round(dct / q).astype(np.int16))
    head = MAGIC + struct.pack("<HHB", w, h, q)
    return head + np.stack(coefs).tobytes()


def decode_dctq(data: bytes) -> np.ndarray:
    """dctq bytes -> (h, w, 3) uint8."""
    assert data[:4] == MAGIC, "not a dctq payload"
    w, h, q = struct.unpack("<HHB", data[4:9])
    nbh, nbw = (h + _B - 1) // _B, (w + _B - 1) // _B
    coefs = np.frombuffer(data[9:], dtype=np.int16).reshape(3, nbh, nbw, _B, _B)
    out = np.empty((h, w, 3), dtype=np.uint8)
    for c in range(3):
        dct = coefs[c].astype(np.float64) * q
        blocks = np.einsum("ji,rcjk,kl->rcil", _D, dct, _D)
        px = np.clip(np.round(_from_blocks(blocks, h, w) + 128.0), 0, 255)
        out[:, :, c] = px.astype(np.uint8)
    return out

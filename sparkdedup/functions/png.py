"""Pure-Python + numpy PNG codec (VERDICT r03 item 5: one REAL decode
kernel for the multimodal path — no PIL in this environment, but PNG is
zlib inflate + per-scanline unfiltering, both available in the stdlib).

Implements the subset that matters for a decode kernel: 8-bit depth,
grayscale / gray+alpha / RGB / RGBA color types, all five scanline
filters (None/Sub/Up/Average/Paeth), non-interlaced, CRC-verified
chunks.  Palette (color type 3), 16-bit depth, and Adam7 interlacing
raise ValueError — web-thumbnail pipelines re-encode those upstream.

Format spec: RFC 2083 / W3C PNG (public).  The scanline filter
definitions are transliterated from the spec; tests/test_png.py pins the
vectorized kernels here against an independent per-byte spec twin (the
same functional-twin discipline as tests/oracle.py for MinHash).

The decoder is row-sequential (filters reference the prior scanline) but
vectorized across each row; Sub/None/Up rows are whole-row numpy ops.
In the Spark pipeline this runs inside mapInPandas, one image per call —
partition-parallel, so per-image python cost amortizes across executors.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

SIGNATURE = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # color type -> samples per pixel
_COLOR_TYPE = {1: 0, 2: 4, 3: 2, 4: 6}  # channels -> color type


def _chunk(ctype: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + ctype
        + payload
        + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF)
    )


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Paeth predictor, vectorized; a=left, b=up, c=upper-left (spec
    definition, per sample)."""
    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    return np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))


def encode_png(arr: np.ndarray, filter_type: int = 0, level: int = 6) -> bytes:
    """(h, w[, channels]) uint8 -> PNG bytes.  ``filter_type`` applies to
    every scanline (0=None is the fast path; 1-4 exist mainly so tests
    can exercise every unfilter branch with real encoded data)."""
    arr = np.asarray(arr)
    if arr.dtype != np.uint8:
        raise ValueError(f"encode_png needs uint8 pixels, got {arr.dtype}")
    if arr.ndim == 2:
        arr = arr[:, :, None]
    if arr.ndim != 3 or arr.shape[2] not in _COLOR_TYPE:
        raise ValueError(f"unsupported pixel array shape {arr.shape}")
    if filter_type not in range(5):
        raise ValueError(f"filter_type must be 0-4, got {filter_type}")
    h, w, c = arr.shape
    img = arr.astype(np.int64)
    zero_row = np.zeros((w, c), dtype=np.int64)
    raw = bytearray()
    prev = zero_row
    for y in range(h):
        row = img[y]
        left = np.vstack([np.zeros((1, c), dtype=np.int64), row[:-1]])
        if filter_type == 0:
            out = row
        elif filter_type == 1:
            out = row - left
        elif filter_type == 2:
            out = row - prev
        elif filter_type == 3:
            out = row - (left + prev) // 2
        else:  # 4: Paeth
            up_left = np.vstack([np.zeros((1, c), dtype=np.int64), prev[:-1]])
            out = row - _paeth(left, prev, up_left)
        raw.append(filter_type)
        raw += (out % 256).astype(np.uint8).tobytes()
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, _COLOR_TYPE[c], 0, 0, 0)
    return (
        SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw), level))
        + _chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes -> (h, w, channels) uint8.  Raises ValueError on ANY
    malformed input (including corrupt zlib streams and truncated
    chunks, which the stdlib surfaces as zlib.error/struct.error) or on
    the unsupported subset (palette, 16-bit, interlaced) — fail loudly
    with ONE exception type, never return garbage pixels.  The single
    exception type is load-bearing: decode_features' on_error='null'
    web-scale policy catches ValueError, and a corrupt blob that raised
    anything else would kill the whole job."""
    try:
        return _decode_png(data)
    except (zlib.error, struct.error) as ex:
        raise ValueError(f"malformed PNG: {ex}") from ex


def _decode_png(data: bytes) -> np.ndarray:
    if data[:8] != SIGNATURE:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    idat: list[bytes] = []
    header = None
    while pos + 12 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        if len(payload) != length:
            raise ValueError("truncated PNG chunk")
        (crc,) = struct.unpack(">I", data[pos + 8 + length : pos + 12 + length])
        if zlib.crc32(ctype + payload) & 0xFFFFFFFF != crc:
            raise ValueError(f"CRC mismatch in {ctype!r} chunk")
        pos += 12 + length
        if ctype == b"IHDR":
            header = struct.unpack(">IIBBBBB", payload)
        elif ctype == b"IDAT":
            idat.append(payload)
        elif ctype == b"IEND":
            break
        # ancillary chunks (tEXt, pHYs, ...) are skipped
    if header is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, bit_depth, color, compression, filter_method, interlace = header
    if bit_depth != 8:
        raise ValueError(f"unsupported bit depth {bit_depth} (8 only)")
    if color not in _CHANNELS:
        raise ValueError(f"unsupported color type {color} (palette not supported)")
    if interlace != 0:
        raise ValueError("interlaced PNG not supported")
    if compression != 0 or filter_method != 0:
        raise ValueError("nonstandard compression/filter method")
    c = _CHANNELS[color]
    raw = zlib.decompress(b"".join(idat))
    stride = w * c
    if len(raw) != h * (stride + 1):
        raise ValueError(
            f"decompressed size {len(raw)} != expected {h * (stride + 1)}"
        )
    m = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    filters = m[:, 0]
    rows = m[:, 1:].reshape(h, w, c).astype(np.int64)
    out = np.empty((h, w, c), dtype=np.int64)
    prev = np.zeros((w, c), dtype=np.int64)
    for y in range(h):
        f = int(filters[y])
        row = rows[y]
        if f == 0:
            rec = row
        elif f == 1:
            # Sub: recon[x] = raw[x] + recon[x-1] per sample — a running
            # sum along the row, i.e. cumsum mod 256 (vectorized)
            rec = np.cumsum(row, axis=0) % 256
        elif f == 2:
            rec = (row + prev) % 256
        elif f == 3:
            # Average needs the reconstructed left pixel -> sequential in
            # x (c-wide vector ops per step; rows using 3/4 are rare in
            # practice and absent from our own encoder's default output)
            rec = np.empty_like(row)
            left = np.zeros(c, dtype=np.int64)
            for x in range(w):
                left = (row[x] + (left + prev[x]) // 2) % 256
                rec[x] = left
        elif f == 4:
            rec = np.empty_like(row)
            left = np.zeros(c, dtype=np.int64)
            up_left = np.zeros(c, dtype=np.int64)
            for x in range(w):
                left = (row[x] + _paeth(left, prev[x], up_left)) % 256
                rec[x] = left
                up_left = prev[x]
        else:
            raise ValueError(f"invalid scanline filter {f}")
        out[y] = rec
        prev = rec
    return out.astype(np.uint8)

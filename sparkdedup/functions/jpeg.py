"""Pure-Python + numpy baseline JPEG codec (VERDICT r04 item 1: the last
image-modality stub becomes a REAL decode kernel — no PIL/libjpeg in this
environment, but baseline sequential JPEG is Huffman entropy coding + 8x8
IDCT, both implementable from the public ITU-T T.81 spec with stdlib +
numpy).

Implemented subset (the web-thumbnail baseline profile):

  * decode: baseline sequential DCT (SOF0), 8-bit precision, 1-component
    grayscale or 3-component YCbCr with NO chroma subsampling (all
    sampling factors 1x1, i.e. 4:4:4), standard Huffman coding, restart
    markers (DRI/RSTn) honored;
  * encode: same profile — grayscale or RGB 4:4:4, Annex K quantization
    tables scaled by the public libjpeg quality formula, Annex K Huffman
    tables, JFIF APP0.

Progressive (SOF2), 12-bit, arithmetic coding, and subsampled chroma
raise ValueError — like the PNG codec's palette/16-bit/Adam7 carve-out,
web pipelines re-encode those upstream.  Every malformed-input failure
(truncated segment, bad marker, corrupt Huffman stream) also surfaces as
ValueError: decode_features' on_error='null' web-scale policy catches
exactly that one type (functions/png.py has the same contract).

Determinism contract (load-bearing for the driver-query oracle): JPEG
decode output is NOT pinned bit-exact by the spec (the IDCT is approximate
by design), so this codec fixes BOTH discretionary roundings explicitly:

  * encoder quantization:  q = floor(round(coef / Q, 6) + 0.5)
  * decoder pixel output:  p = clip(floor(round(x, 6) + 0.5), 0, 255)
    (both: snap float noise at the 1e-6 decimal, then round half up)

With both pinned, a constant-valued 8x8 block decodes to the CLOSED FORM
  clip(floor(floor(8*(v-128)/Q00 + 0.5) * Q00 / 8 + 128.5), 0, 255)
— an expression DuckDB can evaluate, which is what makes the
media_jpeg_decode driver query oracle-checkable from the pixel formula
alone (same discipline as _media_png_decode).

Entropy coding is inherently bit-serial (Python loop); the DCT/IDCT and
dequantization are vectorized across ALL blocks of an image at once
(einsum).  In the Spark pipeline this runs inside mapInPandas — partition
parallel, so per-image Python cost amortizes across executors.

No reference-repo analogue (the reference is text-only; SURVEY §2.12
brief-level extension, like functions/png.py).
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------- constants
# Annex K.1 base quantization tables (public spec tables)
QUANT_LUMA = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.int64,
)
QUANT_CHROMA = np.array(
    [
        [17, 18, 24, 47, 99, 99, 99, 99],
        [18, 21, 26, 66, 99, 99, 99, 99],
        [24, 26, 56, 99, 99, 99, 99, 99],
        [47, 66, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
    ],
    dtype=np.int64,
)


def _zigzag_order() -> np.ndarray:
    """Row-major index for each of the 64 zigzag positions, generated from
    the traversal rule (up-right on even anti-diagonals) instead of typed
    as a literal table — no transcription risk."""
    out = []
    for s in range(15):
        cells = [(y, s - y) for y in range(max(0, s - 7), min(7, s) + 1)]
        if s % 2 == 0:
            cells.reverse()  # even diagonals run bottom-left -> top-right
        out.extend(y * 8 + x for y, x in cells)
    return np.array(out, dtype=np.int64)


ZIGZAG = _zigzag_order()  # zigzag position -> row-major index
UNZIGZAG = np.argsort(ZIGZAG)  # row-major index -> zigzag position

# Annex K.3 standard Huffman table specs: (bits[1..16], huffval)
_DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUMA_VALS = list(range(12))
_DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_CHROMA_VALS = list(range(12))
_AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
_AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

# orthonormal 8-point DCT-II matrix: forward F = C f C^T, inverse f = C^T F C
_C = np.zeros((8, 8))
for _u in range(8):
    for _x in range(8):
        _C[_u, _x] = 0.5 * (1 / np.sqrt(2) if _u == 0 else 1.0) * np.cos(
            (2 * _x + 1) * _u * np.pi / 16
        )


def scaled_quant_table(base: np.ndarray, quality: int) -> np.ndarray:
    """Public libjpeg quality->scale formula (quality 1..100)."""
    if not 1 <= quality <= 100:
        raise ValueError(f"quality must be 1..100, got {quality}")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int64)


def _build_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """Annex C canonical code assignment: symbol -> (code, length)."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


class _HuffDecoder:
    """Annex F.2.2.3 mincode/maxcode/valptr decode tables."""

    def __init__(self, bits: list[int], vals: list[int]):
        self.vals = vals
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        code = 0
        k = 0
        for length in range(1, 17):
            if bits[length - 1]:
                self.valptr[length] = k
                self.mincode[length] = code
                code += bits[length - 1]
                k += bits[length - 1]
                self.maxcode[length] = code - 1
            code <<= 1

    def decode(self, reader: "_BitReader") -> int:
        code = reader.read_bit()
        length = 1
        while code > self.maxcode[length]:
            length += 1
            if length > 16:
                raise ValueError("corrupt JPEG: invalid Huffman code")
            code = (code << 1) | reader.read_bit()
        return self.vals[self.valptr[length] + code - self.mincode[length]]


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
            self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits (spec F.1.2.3)
        return bytes(self.out)


class _BitReader:
    """MSB-first reader over the entropy-coded segment; unstuffs 0xFF00,
    stops (and records) at restart / terminating markers."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.marker: int | None = None

    def _fill(self) -> None:
        if self.marker is not None:
            raise ValueError("corrupt JPEG: entropy data exhausted at marker")
        if self.pos >= len(self.data):
            raise ValueError("corrupt JPEG: truncated entropy-coded data")
        # optional 0xFF fill bytes before a marker (T.81 B.1.1.2): legal
        # padding some encoders emit; consume the run so the byte after
        # it is classified (ADVICE r05)
        while (
            self.pos + 1 < len(self.data)
            and self.data[self.pos] == 0xFF
            and self.data[self.pos + 1] == 0xFF
        ):
            self.pos += 1
        b = self.data[self.pos]
        if b == 0xFF:
            if self.pos + 1 >= len(self.data):
                raise ValueError("corrupt JPEG: truncated after 0xFF")
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2  # stuffed data byte
            else:
                self.marker = nxt
                raise ValueError("corrupt JPEG: entropy data exhausted at marker")
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def peek_marker(self) -> int | None:
        """At a byte-aligned resync point: the next marker, if one starts
        here (used for RSTn handling)."""
        if self.marker is not None:
            return self.marker
        # skip optional 0xFF fill before the marker (T.81 B.1.1.2)
        while (
            self.pos + 1 < len(self.data)
            and self.data[self.pos] == 0xFF
            and self.data[self.pos + 1] == 0xFF
        ):
            self.pos += 1
        if self.pos + 1 < len(self.data) and self.data[self.pos] == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt != 0x00:
                return nxt
        return None

    def align_past_marker(self) -> None:
        """Consume a restart marker and reset bit state."""
        if self.marker is None:
            # marker not yet hit via _fill: it starts at self.pos
            self.pos += 2
        else:
            self.pos += 2
            self.marker = None
        self.acc = 0
        self.nbits = 0


def _extend(v: int, size: int) -> int:
    """F.2.2.1 EXTEND: map ``size`` received bits to the signed value."""
    if size == 0:
        return 0
    if v < (1 << (size - 1)):
        return v - (1 << size) + 1
    return v


def _magnitude(v: int) -> tuple[int, int]:
    """Signed value -> (size, appended bits) per F.1.2.1."""
    size = int(abs(v)).bit_length()
    bits = v if v >= 0 else v + (1 << size) - 1
    return size, bits


# ---------------------------------------------------------------- encoder


def _to_blocks(plane: np.ndarray) -> tuple[np.ndarray, int, int]:
    """(h, w) float plane, edge-padded to 8x8 multiples -> (n_blocks, 8, 8)
    in raster block order, plus block-grid dims."""
    h, w = plane.shape
    bh, bw = -(-h // 8), -(-w // 8)
    padded = np.pad(plane, ((0, bh * 8 - h), (0, bw * 8 - w)), mode="edge")
    blocks = padded.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    return blocks, bh, bw


def _seg(marker: int, payload: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload


def _dqt_payload(tid: int, table: np.ndarray) -> bytes:
    return bytes([tid]) + bytes(int(x) for x in table.reshape(64)[ZIGZAG])


def _dht_payload(tclass: int, tid: int, bits: list[int], vals: list[int]) -> bytes:
    return bytes([(tclass << 4) | tid]) + bytes(bits) + bytes(vals)


def encode_jpeg(arr: np.ndarray, quality: int = 75) -> bytes:
    """(h, w) / (h, w, 1) grayscale or (h, w, 3) RGB uint8 -> baseline
    JFIF JPEG bytes (4:4:4, standard Huffman tables, Annex K quant tables
    scaled by ``quality``).  Quantization rounds half UP (floor(x/q+0.5))
    — see the module determinism contract."""
    arr = np.asarray(arr)
    if arr.dtype != np.uint8:
        raise ValueError(f"encode_jpeg needs uint8 pixels, got {arr.dtype}")
    if arr.ndim == 3 and arr.shape[2] == 1:
        arr = arr[:, :, 0]
    if arr.ndim == 2:
        planes = [arr.astype(np.float64)]
    elif arr.ndim == 3 and arr.shape[2] == 3:
        rgb = arr.astype(np.float64)
        r, g, b = rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2]
        # JFIF color transform (floats all the way to the DCT — no
        # intermediate rounding, so the only lossy steps are quantization
        # and the decoder's pinned output rounding)
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
            0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
        ]
    else:
        raise ValueError(f"unsupported pixel array shape {arr.shape}")
    h, w = planes[0].shape
    if h == 0 or w == 0 or h > 65535 or w > 65535:
        raise ValueError(f"unsupported image dims {h}x{w}")
    n_comp = len(planes)

    qluma = scaled_quant_table(QUANT_LUMA, quality)
    qchroma = scaled_quant_table(QUANT_CHROMA, quality)
    qtables = [qluma] + ([qchroma] if n_comp == 3 else [])

    # quantized coefficients per component, vectorized across all blocks
    comp_coefs = []
    for ci, plane in enumerate(planes):
        blocks, _, _ = _to_blocks(plane - 128.0)
        dct = np.einsum("ux,nxy,vy->nuv", _C, blocks, _C)
        q = qtables[min(ci, 1)].astype(np.float64)
        # snap-round, like the decoder's output rounding: the float DCT
        # leaves 1e-15-relative noise, and an exact-0.5 boundary (e.g. a
        # constant block with 8(v-128)/Q00 = k + 0.5) must quantize
        # deterministically UP, matching the closed-form oracle
        comp_coefs.append(np.floor(np.round(dct / q, 6) + 0.5).astype(np.int64))

    dc_codes = [_build_codes(_DC_LUMA_BITS, _DC_LUMA_VALS)]
    ac_codes = [_build_codes(_AC_LUMA_BITS, _AC_LUMA_VALS)]
    if n_comp == 3:
        dc_codes.append(_build_codes(_DC_CHROMA_BITS, _DC_CHROMA_VALS))
        ac_codes.append(_build_codes(_AC_CHROMA_BITS, _AC_CHROMA_VALS))

    writer = _BitWriter()
    pred = [0] * n_comp
    n_blocks = comp_coefs[0].shape[0]
    for bi in range(n_blocks):
        for ci in range(n_comp):
            tid = min(ci, 1)
            zz = comp_coefs[ci][bi].reshape(64)[ZIGZAG]
            diff = int(zz[0]) - pred[ci]
            pred[ci] = int(zz[0])
            size, bits = _magnitude(diff)
            code, length = dc_codes[tid][size]
            writer.write(code, length)
            if size:
                writer.write(bits, size)
            run = 0
            for k in range(1, 64):
                v = int(zz[k])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    code, length = ac_codes[tid][0xF0]  # ZRL
                    writer.write(code, length)
                    run -= 16
                size, bits = _magnitude(v)
                code, length = ac_codes[tid][(run << 4) | size]
                writer.write(code, length)
                writer.write(bits, size)
                run = 0
            if run:
                code, length = ac_codes[tid][0x00]  # EOB
                writer.write(code, length)
    scan = writer.flush()

    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")  # APP0
    out += _seg(0xDB, _dqt_payload(0, qluma))
    if n_comp == 3:
        out += _seg(0xDB, _dqt_payload(1, qchroma))
    sof = struct.pack(">BHHB", 8, h, w, n_comp)
    for ci in range(n_comp):
        sof += bytes([ci + 1, 0x11, min(ci, 1)])  # 1x1 sampling, quant table id
    out += _seg(0xC0, sof)  # SOF0 baseline
    out += _seg(0xC4, _dht_payload(0, 0, _DC_LUMA_BITS, _DC_LUMA_VALS))
    out += _seg(0xC4, _dht_payload(1, 0, _AC_LUMA_BITS, _AC_LUMA_VALS))
    if n_comp == 3:
        out += _seg(0xC4, _dht_payload(0, 1, _DC_CHROMA_BITS, _DC_CHROMA_VALS))
        out += _seg(0xC4, _dht_payload(1, 1, _AC_CHROMA_BITS, _AC_CHROMA_VALS))
    sos = bytes([n_comp])
    for ci in range(n_comp):
        tid = min(ci, 1)
        sos += bytes([ci + 1, (tid << 4) | tid])
    sos += bytes([0, 63, 0])  # full spectral selection, no approximation
    out += _seg(0xDA, sos)
    out += scan
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------- MJPEG


def split_mjpeg(data: bytes) -> list[bytes]:
    """Split a motion-JPEG stream (concatenated baseline JPEG frames —
    the public MJPEG-over-HTTP / AVI 'MJPG' payload shape) into its
    per-frame byte slices.

    Frame ends are found by a real marker walk (segment lengths up to
    SOS, then the entropy-coded data's 0xFF escaping rule), NOT by
    searching for the EOI byte pair — an APPn/COM segment may legally
    contain 0xFFD9 inside its payload, which a naive scan would misread
    as end-of-frame.  Raises ValueError on trailing garbage or truncated
    frames (fail-loud, single exception type — same contract as
    decode_jpeg)."""
    frames = []
    pos = 0
    n = len(data)
    while pos < n:
        if data[pos : pos + 2] != b"\xff\xd8":
            raise ValueError(f"MJPEG: expected SOI at offset {pos}")
        end = _frame_end(data, pos)
        frames.append(data[pos:end])
        pos = end
    if not frames:
        raise ValueError("MJPEG: empty stream")
    return frames


def _frame_end(data: bytes, start: int) -> int:
    """Index one past this frame's EOI, via the marker walk."""
    pos = start + 2
    n = len(data)
    while True:
        if pos + 2 > n:
            raise ValueError("MJPEG: truncated frame (no EOI)")
        if data[pos] != 0xFF:
            raise ValueError(f"MJPEG: expected marker at offset {pos}")
        # optional 0xFF fill before the marker code (T.81 B.1.1.2)
        while pos + 2 < n and data[pos + 1] == 0xFF:
            pos += 1
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI with no scan (degenerate but well-formed)
            return pos + 2
        if marker == 0xDA:  # SOS: skip header, then entropy data
            (ln,) = struct.unpack(">H", data[pos + 2 : pos + 4])
            pos += 2 + ln
            while True:
                if pos + 1 >= n:
                    raise ValueError("MJPEG: truncated entropy data")
                if data[pos] != 0xFF:
                    pos += 1
                    continue
                nxt = data[pos + 1]
                if nxt == 0x00 or 0xD0 <= nxt <= 0xD7:  # stuffed / restart
                    pos += 2
                    continue
                if nxt == 0xFF:  # fill byte before a marker (B.1.1.2)
                    pos += 1
                    continue
                if nxt == 0xD9:
                    return pos + 2
                raise ValueError(
                    f"MJPEG: unexpected marker 0x{nxt:02X} inside scan"
                )
        elif marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            pos += 2  # standalone markers have no length field
        else:
            (ln,) = struct.unpack(">H", data[pos + 2 : pos + 4])
            pos += 2 + ln


# ---------------------------------------------------------------- decoder


def _snap_round(x: np.ndarray) -> np.ndarray:
    """The pinned output rounding: snap 1e-12-scale float noise at the
    1e-6 decimal, then round half up (floor(x + 0.5)) and clamp."""
    return np.clip(np.floor(np.round(x, 6) + 0.5), 0, 255)


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline JPEG bytes -> (h, w, 1) grayscale or (h, w, 3) RGB uint8.
    Raises ValueError on ANY malformed input or on the unsupported subset
    (progressive, 12-bit, arithmetic coding, subsampled chroma) — fail
    loudly with ONE exception type, never return garbage pixels (same
    contract as decode_png)."""
    try:
        return _decode_jpeg(data)
    except (struct.error, IndexError) as ex:
        raise ValueError(f"malformed JPEG: {ex}") from ex


def _decode_jpeg(data: bytes) -> np.ndarray:
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], _HuffDecoder] = {}
    frame = None  # (h, w, [(comp_id, qtab_id)])
    restart_interval = 0
    scan_info = None
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at offset {pos}")
        # skip optional 0xFF fill bytes before the marker code (T.81
        # B.1.1.2 — emitted by some real encoders; ADVICE r05)
        while pos + 1 < len(data) and data[pos + 1] == 0xFF:
            pos += 1
        marker = data[pos + 1]
        if marker in (0xC2, 0xC1, 0xC3) or 0xC5 <= marker <= 0xCF and marker != 0xC8:
            # any non-baseline SOF (progressive, extended, arithmetic...)
            if marker != 0xC4 and marker != 0xCC:
                raise ValueError(
                    f"unsupported JPEG (SOF marker 0x{marker:02X}; baseline SOF0 only)"
                )
        if marker == 0xCC:
            raise ValueError("unsupported JPEG (arithmetic coding)")
        (length,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        payload = data[pos + 4 : pos + 2 + length]
        if len(payload) != length - 2:
            raise ValueError("truncated JPEG segment")
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(payload):
                pq, tq = payload[p] >> 4, payload[p] & 0x0F
                if pq != 0:
                    raise ValueError("unsupported JPEG (16-bit quant table)")
                tbl = np.zeros(64, dtype=np.int64)
                tbl[ZIGZAG] = np.frombuffer(payload[p + 1 : p + 65], dtype=np.uint8)
                qtables[tq] = tbl.reshape(8, 8)
                p += 65
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(payload):
                tc, th = payload[p] >> 4, payload[p] & 0x0F
                bits = list(payload[p + 1 : p + 17])
                n = sum(bits)
                vals = list(payload[p + 17 : p + 17 + n])
                if len(vals) != n:
                    raise ValueError("truncated DHT segment")
                huff[(tc, th)] = _HuffDecoder(bits, vals)
                p += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            precision, h, w, n_comp = struct.unpack(">BHHB", payload[:6])
            if precision != 8:
                raise ValueError(f"unsupported JPEG precision {precision} (8 only)")
            if n_comp not in (1, 3):
                raise ValueError(f"unsupported component count {n_comp}")
            comps = []
            for ci in range(n_comp):
                cid, sampling, tq = payload[6 + 3 * ci : 9 + 3 * ci]
                if sampling != 0x11:
                    raise ValueError(
                        "unsupported JPEG (chroma subsampling; 4:4:4 only)"
                    )
                comps.append((cid, tq))
            frame = (h, w, comps)
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", payload[:2])
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF0")
            ns = payload[0]
            tables = []
            for ci in range(ns):
                cs, t = payload[1 + 2 * ci : 3 + 2 * ci]
                tables.append((cs, t >> 4, t & 0x0F))
            scan_info = (tables, pos + 2 + length)
            break
        elif marker == 0xD9:  # EOI before any scan
            break
        pos += 2 + length
    if frame is None or scan_info is None:
        raise ValueError("JPEG missing SOF0/SOS")
    h, w, comps = frame
    if h == 0 or w == 0:
        raise ValueError("zero-dimension JPEG")
    tables, scan_pos = scan_info
    if len(tables) != len(comps):
        raise ValueError("unsupported JPEG (multi-scan)")
    comp_tabs = []
    for (cid, tq), (cs, td, ta) in zip(comps, tables):
        if cs != cid:
            raise ValueError("scan/frame component mismatch")
        if tq not in qtables or (0, td) not in huff or (1, ta) not in huff:
            raise ValueError("JPEG references undefined quant/Huffman table")
        comp_tabs.append((qtables[tq], huff[(0, td)], huff[(1, ta)]))

    bh, bw = -(-h // 8), -(-w // 8)
    n_blocks = bh * bw
    n_comp = len(comps)
    coefs = np.zeros((n_comp, n_blocks, 64), dtype=np.int64)
    reader = _BitReader(data, scan_pos)
    pred = [0] * n_comp
    mcus_done = 0
    for bi in range(n_blocks):
        if restart_interval and mcus_done == restart_interval:
            m = reader.peek_marker()
            if m is None or not 0xD0 <= m <= 0xD7:
                raise ValueError("corrupt JPEG: expected restart marker")
            reader.align_past_marker()
            pred = [0] * n_comp
            mcus_done = 0
        for ci in range(n_comp):
            _, dc_tab, ac_tab = comp_tabs[ci]
            size = dc_tab.decode(reader)
            if size > 11:
                raise ValueError("corrupt JPEG: DC size out of range")
            diff = _extend(reader.receive(size), size)
            pred[ci] += diff
            coefs[ci, bi, 0] = pred[ci]
            k = 1
            while k < 64:
                rs = ac_tab.decode(reader)
                run, size = rs >> 4, rs & 0x0F
                if size == 0:
                    if run == 15:  # ZRL
                        k += 16
                        continue
                    break  # EOB
                k += run
                if k > 63:
                    raise ValueError("corrupt JPEG: AC index overrun")
                coefs[ci, bi, k] = _extend(reader.receive(size), size)
                k += 1
        mcus_done += 1

    # dequantize + inverse zigzag + IDCT, vectorized across all blocks
    planes = []
    for ci in range(n_comp):
        qtab = comp_tabs[ci][0].reshape(64).astype(np.float64)
        deq = coefs[ci].astype(np.float64)[:, UNZIGZAG] * qtab
        # inverse of F = C f C^T:  f[x,y] = sum_{u,v} C[u,x] F[u,v] C[v,y]
        blocks = np.einsum("ux,nuv,vy->nxy", _C, deq.reshape(-1, 8, 8), _C)
        plane = (
            blocks.reshape(bh, bw, 8, 8).transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)
        )
        planes.append(plane[:h, :w] + 128.0)
    if n_comp == 1:
        return _snap_round(planes[0]).astype(np.uint8)[:, :, None]
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.stack(
        [_snap_round(r), _snap_round(g), _snap_round(b)], axis=2
    ).astype(np.uint8)

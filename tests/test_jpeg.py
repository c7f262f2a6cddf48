"""JPEG codec tests (sparkdedup.functions.jpeg).

The production decoder (mincode/maxcode Huffman tables, vectorized einsum
IDCT, streaming bit reader) is pinned against an independent spec twin
built the OTHER way — dict-of-bitstrings Huffman lookup over a fully
unstuffed bit string, scalar per-coefficient cosine-sum IDCT straight
from the T.81 formula.  Roundtrips alone would not catch a misconception
shared by encoder and decoder; the twin breaks that symmetry (same
discipline as tests/test_png.py).  The twin shares ONLY the codec's
pinned rounding convention (floor(round(x,6)+0.5)) — that convention is
the module's documented determinism contract, not an implementation
detail."""

import math
import struct

import numpy as np
import pytest

from sparkdedup.functions.jpeg import (
    QUANT_LUMA,
    decode_jpeg,
    encode_jpeg,
    scaled_quant_table,
)

# --- independent spec twin -------------------------------------------------


def _twin_build_codes(bits, vals):
    """symbol tables as {bitstring: symbol} (Annex C canonical order)."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[format(code, f"0{length}b")] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _twin_idct(F):
    """Scalar T.81 A.3.3 IDCT: f(x,y) = 1/4 sum C(u)C(v) F cos cos."""
    out = np.zeros((8, 8))
    for x in range(8):
        for y in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    cu = 1 / math.sqrt(2) if u == 0 else 1.0
                    cv = 1 / math.sqrt(2) if v == 0 else 1.0
                    s += (
                        cu
                        * cv
                        * F[u][v]
                        * math.cos((2 * x + 1) * u * math.pi / 16)
                        * math.cos((2 * y + 1) * v * math.pi / 16)
                    )
            out[x, y] = s / 4.0
    return out


def _twin_zigzag():
    # typed literal (vs the engine's generated table — a transcription
    # check in itself)
    return [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ]


def _snap(x):
    return min(255, max(0, int(math.floor(round(x, 6) + 0.5))))


def decode_jpeg_ref(data: bytes) -> np.ndarray:
    """Spec-twin baseline decoder: marker walk, dict Huffman over one big
    unstuffed bitstring, scalar IDCT.  No restart-marker support (the
    engine encoder never emits DRI; RST handling is tested separately
    against a hand-spliced stream)."""
    assert data[:2] == b"\xff\xd8"
    pos = 2
    qt, hufftabs, frame, scan = {}, {}, None, None
    while True:
        assert data[pos] == 0xFF
        marker = data[pos + 1]
        (ln,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        body = data[pos + 4 : pos + 2 + ln]
        if marker == 0xDB:
            p = 0
            while p < len(body):
                tq = body[p] & 0x0F
                qt[tq] = list(body[p + 1 : p + 65])
                p += 65
        elif marker == 0xC4:
            p = 0
            while p < len(body):
                tc, th = body[p] >> 4, body[p] & 0x0F
                bits = list(body[p + 1 : p + 17])
                n = sum(bits)
                hufftabs[(tc, th)] = _twin_build_codes(
                    bits, list(body[p + 17 : p + 17 + n])
                )
                p += 17 + n
        elif marker == 0xC0:
            _, h, w, nc = struct.unpack(">BHHB", body[:6])
            comps = [
                (body[6 + 3 * i], body[8 + 3 * i]) for i in range(nc)
            ]  # (id, quant table)
            frame = (h, w, comps)
        elif marker == 0xDA:
            ns = body[0]
            scan = (
                [(body[1 + 2 * i], body[2 + 2 * i]) for i in range(ns)],
                pos + 2 + ln,
            )
            break
        pos += 2 + ln
    h, w, comps = frame
    sel, spos = scan
    # unstuff up to EOI, then bits as a string
    raw = data[spos : data.rindex(b"\xff\xd9")].replace(b"\xff\x00", b"\xff")
    bits = "".join(format(b, "08b") for b in raw)
    cursor = [0]

    def take(n):
        s = bits[cursor[0] : cursor[0] + n]
        cursor[0] += n
        return s

    def huffdecode(table):
        s = ""
        while s not in table:
            s += take(1)
            assert len(s) <= 16
        return table[s]

    def extend(v, size):
        if size == 0:
            return 0
        return v if v >= (1 << (size - 1)) else v - (1 << size) + 1

    zz = _twin_zigzag()
    bh, bw = -(-h // 8), -(-w // 8)
    preds = [0] * len(comps)
    planes = [np.zeros((bh * 8, bw * 8)) for _ in comps]
    for byy in range(bh):
        for bxx in range(bw):
            for ci, (cid, tq) in enumerate(comps):
                td, ta = sel[ci][1] >> 4, sel[ci][1] & 0x0F
                coef = [0] * 64
                size = huffdecode(hufftabs[(0, td)])
                diff = extend(int(take(size), 2) if size else 0, size)
                preds[ci] += diff
                coef[0] = preds[ci]
                k = 1
                while k < 64:
                    rs = huffdecode(hufftabs[(1, ta)])
                    run, size = rs >> 4, rs & 0x0F
                    if size == 0:
                        if run == 15:
                            k += 16
                            continue
                        break
                    k += run
                    coef[k] = extend(int(take(size), 2), size)
                    k += 1
                F = np.zeros((8, 8))
                for k in range(64):
                    F[zz[k] // 8][zz[k] % 8] = coef[k] * qt[tq][k]
                planes[ci][byy * 8 : byy * 8 + 8, bxx * 8 : bxx * 8 + 8] = (
                    _twin_idct(F) + 128.0
                )
    planes = [p[:h, :w] for p in planes]
    if len(planes) == 1:
        return np.vectorize(_snap)(planes[0]).astype(np.uint8)[:, :, None]
    y, cb, cr = planes
    out = np.zeros((h, w, 3), dtype=np.uint8)
    for yy in range(h):
        for xx in range(w):
            out[yy, xx, 0] = _snap(y[yy, xx] + 1.402 * (cr[yy, xx] - 128))
            out[yy, xx, 1] = _snap(
                y[yy, xx]
                - 0.344136 * (cb[yy, xx] - 128)
                - 0.714136 * (cr[yy, xx] - 128)
            )
            out[yy, xx, 2] = _snap(y[yy, xx] + 1.772 * (cb[yy, xx] - 128))
    return out


# --- tests -----------------------------------------------------------------


@pytest.mark.parametrize("shape,quality", [
    ((8, 8), 50),
    ((16, 16), 75),
    ((24, 17), 90),   # non-multiple-of-8 width: crop path
    ((13, 21), 25),   # heavy quantization
])
def test_gray_decoder_matches_spec_twin(shape, quality):
    rng = np.random.default_rng(hash(shape) % 2**32)
    img = rng.integers(0, 256, shape, dtype=np.uint8)
    data = encode_jpeg(img, quality=quality)
    got = decode_jpeg(data)
    want = decode_jpeg_ref(data)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("quality", [60, 95])
def test_rgb_decoder_matches_spec_twin(quality):
    rng = np.random.default_rng(quality)
    img = rng.integers(0, 256, (16, 11, 3), dtype=np.uint8)
    data = encode_jpeg(img, quality=quality)
    np.testing.assert_array_equal(decode_jpeg(data), decode_jpeg_ref(data))


def test_constant_block_closed_form():
    """The driver-query oracle formula: a constant 8x8 block decodes to
    clip(floor(floor(8(v-128)/Q00+0.5)*Q00/8 + 128.5), 0, 255) — checked
    for every v.  This is what makes media_jpeg_decode's DuckDB oracle a
    pixel-formula oracle rather than a snapshot."""
    for quality in (50, 75):
        q00 = int(scaled_quant_table(QUANT_LUMA, quality)[0, 0])
        for v in range(256):
            dec = decode_jpeg(encode_jpeg(np.full((8, 8), v, np.uint8), quality=quality))
            qdc = math.floor(8 * (v - 128) / q00 + 0.5)
            expect = min(255, max(0, math.floor(qdc * q00 / 8 + 128.5)))
            assert (dec == expect).all(), (quality, v, dec[0, 0, 0], expect)


def test_quality_100_near_lossless():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (40, 33), dtype=np.uint8)
    dec = decode_jpeg(encode_jpeg(img, quality=100))[:, :, 0]
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 1


def test_grayscale_3d_single_channel_input():
    img = np.full((8, 8, 1), 77, dtype=np.uint8)
    assert decode_jpeg(encode_jpeg(img, quality=100)).shape == (8, 8, 1)


def test_restart_markers():
    """DRI/RST decode path: splice three independently encoded 8x8 blocks
    into one 24x8 scan with restart_interval=1.  Per spec, DC predictors
    reset at each RSTn and the stream re-byte-aligns — so the spliced
    image must decode to the vertical stack of the three block decodes."""
    blocks = [np.full((8, 8), v, dtype=np.uint8) for v in (40, 200, 129)]
    singles = [encode_jpeg(b, quality=50) for b in blocks]

    def scan_bytes(jpg):
        # entropy data = after SOS segment, before EOI
        i = jpg.index(b"\xff\xda")
        (ln,) = struct.unpack(">H", jpg[i + 2 : i + 4])
        return jpg[i + 2 + ln : jpg.rindex(b"\xff\xd9")]

    # headers from a 24x8 encode of the stacked image, scan replaced
    stacked = np.vstack(blocks)
    base = encode_jpeg(stacked, quality=50)
    i = base.index(b"\xff\xda")
    (ln,) = struct.unpack(">H", base[i + 2 : i + 4])
    head, tail = base[: i + 2 + ln], b"\xff\xd9"
    dri = b"\xff\xdd" + struct.pack(">H", 4) + struct.pack(">H", 1)
    head = head[:i] + dri + head[i:]  # insert DRI before SOS
    spliced = (
        head
        + scan_bytes(singles[0])
        + b"\xff\xd0"
        + scan_bytes(singles[1])
        + b"\xff\xd1"
        + scan_bytes(singles[2])
        + tail
    )
    want = np.vstack([decode_jpeg(s) for s in singles])
    np.testing.assert_array_equal(decode_jpeg(spliced), want)


def test_not_a_jpeg_raises():
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"notajpeg")


def test_truncated_raises_valueerror():
    data = encode_jpeg(np.full((8, 8), 9, np.uint8))
    for cut in (4, 20, len(data) // 2, len(data) - 3):
        with pytest.raises(ValueError):
            decode_jpeg(data[:cut])


def test_progressive_sof_raises():
    data = bytearray(encode_jpeg(np.full((8, 8), 9, np.uint8)))
    i = bytes(data).index(b"\xff\xc0")
    data[i + 1] = 0xC2  # SOF0 -> SOF2 (progressive)
    with pytest.raises(ValueError, match="SOF"):
        decode_jpeg(bytes(data))


def test_subsampled_chroma_raises():
    rng = np.random.default_rng(0)
    data = bytearray(encode_jpeg(rng.integers(0, 256, (8, 8, 3), np.uint8)))
    i = bytes(data).index(b"\xff\xc0")
    # first component's sampling byte: SOF payload = P(1) H(2) W(2) Nf(1),
    # then [id, sampling, tq] per component
    data[i + 4 + 6 + 1] = 0x22
    with pytest.raises(ValueError, match="subsampling"):
        decode_jpeg(bytes(data))


def test_corrupt_entropy_stream_raises_valueerror():
    data = bytearray(encode_jpeg(np.arange(64, dtype=np.uint8).reshape(8, 8), quality=90))
    i = bytes(data).index(b"\xff\xda")
    (ln,) = struct.unpack(">H", bytes(data)[i + 2 : i + 4])
    # zero out the entropy bytes: Huffman walk must fail loudly, with
    # ValueError (the on_error='null' contract), not IndexError/KeyError
    for p in range(i + 2 + ln, len(data) - 2):
        data[p] = 0x55
    with pytest.raises(ValueError):
        decode_jpeg(bytes(data))


def test_decode_features_mixed_png_jpeg(spark):
    """decode_features over a frame mixing PNG, gray JPEG, RGB JPEG and a
    corrupt JPEG: real decodes for all three formats, NULL for the
    corrupt payload under on_error='null'."""
    from sparkdedup.functions.png import encode_png
    from sparkdedup.multimodal import decode_features

    rng = np.random.default_rng(11)
    png_img = rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)
    jg = np.full((8, 8), 100, dtype=np.uint8)
    jc = rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)
    good_j = encode_jpeg(jc, quality=100)
    rows = [
        (1, bytearray(encode_png(png_img))),
        (2, bytearray(encode_jpeg(jg, quality=50))),
        (3, bytearray(good_j)),
        (4, bytearray(good_j[:40] + b"\x00\x00")),  # truncated jpeg
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {
        r["media_id"]: r["feature"]
        for r in decode_features(df, "payload", on_error="null").collect()
    }
    assert got[1] == pytest.approx(png_img.mean(axis=(0, 1)).tolist())
    assert got[2] == pytest.approx(
        decode_jpeg(encode_jpeg(jg, quality=50)).mean(axis=(0, 1)).tolist()
    )
    assert got[3] == pytest.approx(decode_jpeg(good_j).mean(axis=(0, 1)).tolist())
    assert got[4] is None


# --- MJPEG frame splitting -------------------------------------------------


def test_split_mjpeg_roundtrip():
    from sparkdedup.functions.jpeg import split_mjpeg

    rng = np.random.default_rng(5)
    frames = [
        encode_jpeg(rng.integers(0, 256, (8, 8), np.uint8), quality=q)
        for q in (50, 75, 100)
    ]
    got = split_mjpeg(b"".join(frames))
    assert got == frames


def test_split_mjpeg_eoi_inside_comment_segment():
    """The naive-scan trap: a COM segment whose payload contains the EOI
    byte pair must NOT end the frame — the marker walk skips it by
    length."""
    from sparkdedup.functions.jpeg import split_mjpeg

    f = encode_jpeg(np.full((8, 8), 9, np.uint8))
    # splice a COM segment containing 0xFFD9 right after SOI
    com = b"\xff\xfe" + struct.pack(">H", 6) + b"\xff\xd9\x00\x00"
    tricky = f[:2] + com + f[2:]
    assert split_mjpeg(tricky + f) == [tricky, f]
    np.testing.assert_array_equal(decode_jpeg(tricky), decode_jpeg(f))


def test_split_mjpeg_rejects_garbage():
    from sparkdedup.functions.jpeg import split_mjpeg

    f = encode_jpeg(np.full((8, 8), 9, np.uint8))
    with pytest.raises(ValueError, match="SOI"):
        split_mjpeg(f + b"trailing-garbage")
    with pytest.raises(ValueError, match="truncated"):
        split_mjpeg(f[:-4])
    with pytest.raises(ValueError, match="empty"):
        split_mjpeg(b"")


def test_fill_bytes_before_markers_tolerated():
    """T.81 B.1.1.2: any number of 0xFF fill bytes may precede a marker
    code.  Some real encoders emit them; the decoder and the MJPEG
    splitter must parse through them and produce the same pixels as the
    fill-free stream (ADVICE r05)."""
    import numpy as np

    from sparkdedup.functions.jpeg import decode_jpeg, encode_jpeg, split_mjpeg

    rng = np.random.RandomState(11)
    img = rng.randint(0, 256, size=(16, 16)).astype(np.uint8)
    data = encode_jpeg(img, quality=50)
    want = decode_jpeg(data)

    # inject fill runs before every marker except the one following a
    # stuffed 0xFF00 data byte (scan the stream the same way a decoder
    # does: 0xFF00 is data, 0xFF D0-D7 / DA / D9 / others are markers)
    out = bytearray()
    i = 0
    while i < len(data):
        # i > 0: the stream itself must still open with SOI
        if i and data[i] == 0xFF and i + 1 < len(data) and data[i + 1] != 0x00:
            out += b"\xff\xff\xff"  # three fill bytes, then the real marker
        out.append(data[i])
        i += 1
    padded = bytes(out)
    assert len(padded) > len(data)
    np.testing.assert_array_equal(decode_jpeg(padded), want)

    # the MJPEG splitter walks the same markers: a 2-frame stream of
    # padded JPEGs must split at the right boundaries and decode equal
    f2 = encode_jpeg((img // 2).astype(np.uint8), quality=50)
    frames = split_mjpeg(padded + f2)
    assert len(frames) == 2
    np.testing.assert_array_equal(decode_jpeg(frames[0]), want)
    np.testing.assert_array_equal(decode_jpeg(frames[1]), decode_jpeg(f2))

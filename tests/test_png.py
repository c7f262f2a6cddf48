"""PNG codec tests (sparkdedup.functions.png).

The production decoder's vectorized unfilter kernels are pinned against
an independent PER-BYTE spec twin transliterated directly from the PNG
spec's filter definitions (RFC 2083 §6) — the same functional-twin
discipline as tests/oracle.py for MinHash.  Roundtrips alone would not
catch a misconception shared by encoder and decoder; the spec twin
breaks that symmetry."""

import struct
import zlib

import numpy as np
import pytest

from sparkdedup.functions.png import SIGNATURE, decode_png, encode_png


# --- independent spec twin: per-byte unfilter exactly as RFC 2083 §6 ---


def _paeth_ref(a, b, c):
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _unfilter_ref(raw: bytes, h: int, w: int, bpp: int) -> bytes:
    """Per-byte reconstruction: Recon(x) from Filt(x) per the spec, with
    Raw(x-bpp)=0 / Prior(x)=0 when out of range."""
    stride = w * bpp
    out = bytearray()
    prior = bytes(stride)
    pos = 0
    for _ in range(h):
        ft = raw[pos]
        line = raw[pos + 1 : pos + 1 + stride]
        pos += 1 + stride
        rec = bytearray(stride)
        for x in range(stride):
            a = rec[x - bpp] if x >= bpp else 0
            b = prior[x]
            c = prior[x - bpp] if x >= bpp else 0
            if ft == 0:
                v = line[x]
            elif ft == 1:
                v = line[x] + a
            elif ft == 2:
                v = line[x] + b
            elif ft == 3:
                v = line[x] + (a + b) // 2
            elif ft == 4:
                v = line[x] + _paeth_ref(a, b, c)
            else:
                raise ValueError(ft)
            rec[x] = v % 256
        out += rec
        prior = bytes(rec)
    return bytes(out)


def _idat_raw(png: bytes) -> tuple[bytes, tuple]:
    pos = 8
    idat = b""
    header = None
    while pos + 12 <= len(png):
        (ln,) = struct.unpack(">I", png[pos : pos + 4])
        ct = png[pos + 4 : pos + 8]
        if ct == b"IHDR":
            header = struct.unpack(">IIBBBBB", png[pos + 8 : pos + 8 + ln])
        elif ct == b"IDAT":
            idat += png[pos + 8 : pos + 8 + ln]
        pos += 12 + ln
    return zlib.decompress(idat), header


@pytest.mark.parametrize("channels", [1, 2, 3, 4])
@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
def test_decoder_matches_spec_twin(channels, filter_type):
    """decode_png(encode_png(img, f)) must equal BOTH the original image
    (roundtrip) and the independent per-byte spec reconstruction of the
    encoded scanlines (spec parity)."""
    rng = np.random.RandomState(13 * channels + filter_type)
    img = rng.randint(0, 256, size=(9, 7, channels), dtype=np.uint8)
    png = encode_png(img, filter_type=filter_type)
    got = decode_png(png)
    assert got.shape == (9, 7, channels)
    assert np.array_equal(got, img)
    raw, header = _idat_raw(png)
    w, h = header[0], header[1]
    ref = _unfilter_ref(raw, h, w, channels)
    assert bytes(got.tobytes()) == ref


def test_grayscale_2d_input_roundtrip():
    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, size=(5, 11), dtype=np.uint8)
    got = decode_png(encode_png(img, filter_type=4))
    assert got.shape == (5, 11, 1)
    assert np.array_equal(got[:, :, 0], img)


def test_mixed_filters_per_row():
    """Hand-build an IDAT whose rows use different filters and check the
    decoder against the spec twin (our encoder is single-filter, so this
    covers the per-row mixing real encoders emit)."""
    rng = np.random.RandomState(5)
    h, w, c = 6, 4, 3
    img = rng.randint(0, 256, size=(h, w, c), dtype=np.uint8)
    # take filtered scanlines from per-filter encodes, interleave them
    raws = [ _idat_raw(encode_png(img, filter_type=f))[0] for f in range(5) ]
    stride = w * c + 1
    mixed = b"".join(
        raws[[0, 1, 2, 3, 4, 2][y]][y * stride : (y + 1) * stride] for y in range(h)
    )
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)

    def chunk(ct, payload):
        return (
            struct.pack(">I", len(payload)) + ct + payload
            + struct.pack(">I", zlib.crc32(ct + payload) & 0xFFFFFFFF)
        )

    png = (
        SIGNATURE + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(mixed)) + chunk(b"IEND", b"")
    )
    got = decode_png(png)
    # rows encoded with filters 0/1/2 reference only in-row or prior-row
    # RECON data; since every row reconstructs to the same img, the mixed
    # stream must reconstruct to img as well
    assert np.array_equal(got, img)
    assert bytes(got.tobytes()) == _unfilter_ref(mixed, h, w, c)


def test_corrupt_crc_raises():
    img = np.zeros((2, 2, 3), dtype=np.uint8)
    png = bytearray(encode_png(img))
    png[40] ^= 0xFF  # flip a byte inside a chunk
    with pytest.raises(ValueError, match="CRC mismatch|unsupported|size"):
        decode_png(bytes(png))


def test_not_a_png_raises():
    with pytest.raises(ValueError, match="bad signature"):
        decode_png(b"GIF89a....")


def test_unsupported_subset_raises():
    # palette color type (3)
    ihdr = struct.pack(">IIBBBBB", 1, 1, 8, 3, 0, 0, 0)

    def chunk(ct, payload):
        return (
            struct.pack(">I", len(payload)) + ct + payload
            + struct.pack(">I", zlib.crc32(ct + payload) & 0xFFFFFFFF)
        )

    png = (
        SIGNATURE + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(b"\x00\x00")) + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="palette"):
        decode_png(png)


def test_corrupt_zlib_stream_raises_valueerror():
    """Review r04: corrupt IDAT zlib bytes and truncated chunks must
    surface as ValueError (the single exception type decode_features'
    on_error='null' policy relies on), not zlib.error/struct.error."""
    img = np.random.RandomState(1).randint(0, 256, (4, 4, 3), dtype=np.uint8)
    png = bytearray(encode_png(img))
    # corrupt the IDAT payload but keep its CRC consistent so the error
    # comes from inflate, not the CRC check
    pos = 8
    while True:
        (ln,) = struct.unpack(">I", png[pos : pos + 4])
        ct = bytes(png[pos + 4 : pos + 8])
        if ct == b"IDAT":
            payload = bytearray(png[pos + 8 : pos + 8 + ln])
            payload[2:] = payload[2:][::-1]  # keep zlib header, scramble body
            png[pos + 8 : pos + 8 + ln] = payload
            crc = zlib.crc32(ct + bytes(payload)) & 0xFFFFFFFF
            png[pos + 8 + ln : pos + 12 + ln] = struct.pack(">I", crc)
            break
        pos += 12 + ln
    with pytest.raises(ValueError, match="malformed PNG|size"):
        decode_png(bytes(png))
    # truncated file: chunk header says more bytes than exist
    with pytest.raises(ValueError, match="truncated|malformed"):
        decode_png(bytes(encode_png(img))[:30])

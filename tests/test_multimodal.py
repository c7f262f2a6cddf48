"""Multimodal plumbing tests: schema, batch shape, determinism of the
stubbed decode kernels (SURVEY-adjacent training-data extension)."""

from sparkdedup.multimodal import (
    decode_features,
    media_metadata,
    sample_frames,
    sniff_mime,
)


def _media_df(spark):
    rows = [
        (0, b"\x89PNG\r\n" + b"x" * 300),
        (1, b"\xff\xd8\xff\xe0" + b"y" * 200),
        (2, b"<html><body>hi</body></html>"),
        (3, None),
    ]
    return spark.createDataFrame(rows, "media_id long, payload binary")


def test_sniff_mime():
    assert sniff_mime(b"\x89PNGxxxx") == "image/png"
    assert sniff_mime(b"\xff\xd8\xff\xe1") == "image/jpeg"
    assert sniff_mime(b"random") == "application/octet-stream"
    assert sniff_mime(None) is None


def test_media_metadata(spark):
    out = media_metadata(_media_df(spark), "payload").collect()
    by_id = {r["media_id"]: r for r in out}
    assert by_id[0]["media_mime"] == "image/png"
    assert by_id[0]["media_bytes"] == 306
    assert by_id[2]["media_mime"] == "text/html"
    assert by_id[3]["media_bytes"] is None
    assert len(by_id[1]["media_sha256"]) == 64


def test_decode_features_schema_and_determinism(spark):
    # on_error='null': the fixture's jpeg row is a declared decode stub
    # (raises under the default policy — pinned in the jpeg test below)
    df = _media_df(spark)
    out1 = {r["media_id"]: r for r in decode_features(df, "payload", on_error="null").collect()}
    out2 = {r["media_id"]: r for r in decode_features(df, "payload", on_error="null").collect()}
    # row 0 has PNG MAGIC but not the full 8-byte signature -> stub path
    assert out1[0]["feat_dim"] == 8
    assert out1[0]["feature"] == out2[0]["feature"]  # deterministic stub
    assert out1[1]["feature"] is None  # jpeg: declared stub -> null policy
    assert out1[3]["feature"] is None


def test_sample_frames_expansion(spark):
    """sample_frames is a REAL MJPEG sampler now: 6 concatenated JPEG
    frames, every=2 -> frames 0/2/4 decoded with real dims + means; a
    non-MJPEG payload is skipped atomically under on_error='null' and
    raises under the default policy."""
    import numpy as np
    import pytest as _pytest

    from sparkdedup.functions.jpeg import decode_jpeg, encode_jpeg

    frames = [
        encode_jpeg(np.full((8, 8), (40 + 30 * k) % 256, np.uint8), quality=50)
        for k in range(6)
    ]
    rows = [
        (0, bytearray(b"".join(frames))),
        (1, b"not a video"),
        (3, None),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    out = sample_frames(df, "payload", every=2, on_error="null").collect()
    ids = {r["media_id"] for r in out}
    assert ids == {0}  # bad + null payloads yield no frames
    got = {r["frame_idx"]: r for r in out}
    assert sorted(got) == [0, 2, 4]
    for k, r in got.items():
        assert (r["height"], r["width"]) == (8, 8)
        assert r["mean_px"] == float(decode_jpeg(frames[k]).mean())
        assert len(r["frame_sha"]) == 40
    with _pytest.raises(Exception, match="MJPEG"):
        sample_frames(df, "payload", every=2).collect()


def test_sniff_mime_batch_matches_scalar():
    import pandas as pd

    from sparkdedup.multimodal import sniff_mime, sniff_mime_batch

    payloads = [
        b"\x89PNGxxxx", b"\xff\xd8\xff\xe1", b"GIF89a", b"RIFFxxxxWAVE",
        b"ID3\x03data", b"\x00\x00\x00\x18ftypmp42", b"<html>", b"<!DOCTYPE",
        b"random", b"", None, b"\x89", b"G",
    ]
    got = sniff_mime_batch(pd.Series(payloads, dtype=object))
    for i, p in enumerate(payloads):
        assert got.iloc[i] == sniff_mime(p) or (p is None and got.iloc[i] is None)


def test_decode_features_real_png(spark):
    """PNG payloads decode FOR REAL: per-channel means of a known 4x4
    RGB image must come back exactly (VERDICT r03 item 5)."""
    import numpy as np

    from sparkdedup.functions.png import encode_png

    img = np.arange(4 * 4 * 3, dtype=np.uint8).reshape(4, 4, 3)
    df = spark.createDataFrame(
        [(0, bytearray(encode_png(img, filter_type=4)))],
        "media_id long, payload binary",
    )
    out = decode_features(df, "payload").collect()
    assert len(out) == 1
    assert out[0]["feat_dim"] == 3
    want = img.astype(np.float64).mean(axis=(0, 1))
    assert np.allclose(out[0]["feature"], want)


def test_decode_features_jpeg_raises_and_null_policy(spark):
    """JPEG decodes for real now (functions/jpeg.py); a MALFORMED jpeg
    payload under on_error='raise' (default) fails the job, under
    on_error='null' emits a NULL feature row (the web-scale
    one-corrupt-blob-must-not-kill-the-job policy)."""
    import pytest as _pytest

    df = spark.createDataFrame(
        [(1, b"\xff\xd8\xff\xe0" + b"y" * 50), (2, b"plainbytes")],
        "media_id long, payload binary",
    )
    with _pytest.raises(Exception, match="JPEG"):
        decode_features(df, "payload").collect()
    out = {r["media_id"]: r for r in decode_features(df, "payload", on_error="null").collect()}
    assert out[1]["feature"] is None
    assert out[2]["feature"] is not None  # non-image stub path unaffected


def test_decode_features_corrupt_png_null_policy(spark):
    """A corrupt PNG (bad CRC) under on_error='null' becomes a NULL row,
    not a job failure."""
    import numpy as np

    from sparkdedup.functions.png import encode_png

    good = bytearray(encode_png(np.zeros((2, 2, 3), dtype=np.uint8)))
    bad = bytearray(good)
    bad[40] ^= 0xFF
    df = spark.createDataFrame(
        [(0, good), (1, bad)], "media_id long, payload binary"
    )
    out = {r["media_id"]: r for r in decode_features(df, "payload", on_error="null").collect()}
    assert out[0]["feature"] is not None
    assert out[1]["feature"] is None

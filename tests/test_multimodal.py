import pytest

from hepcrawl_spark.operators.multimodal import extract_features, synthesize_media


def test_fake_decoder_pipeline(spark):
    media = synthesize_media(spark, n=30)
    feats = extract_features(media, use_fake_decoder=True).collect()
    assert len(feats) == 30
    for r in feats:
        assert r["error"] is None
        assert len(r["feature"]) == 8
        assert r["n_bytes"] > 0
    # determinism
    again = extract_features(synthesize_media(spark, n=30)).collect()
    assert {r["media_id"]: r["feature"] for r in feats} == {
        r["media_id"]: r["feature"] for r in again
    }


def test_real_decoders_stubbed_produce_error_rows(spark):
    media = synthesize_media(spark, n=6)
    feats = extract_features(media, use_fake_decoder=False).collect()
    assert len(feats) == 6
    for r in feats:
        assert r["feature"] is None
        assert r["error"].startswith("NotImplementedError")


def test_no_shuffle_in_feature_extraction(spark):
    from hepcrawl_spark.plans import exchange_count

    media = synthesize_media(spark, n=10)
    feats = extract_features(media)
    assert exchange_count(feats) == 0


def test_ppm_bmp_wav_decode_roundtrip():
    """The stdlib codecs decode REAL bytes back to the source samples."""
    import numpy as np

    from hepcrawl_spark.operators.multimodal import (
        _decode_audio,
        _decode_image,
        make_bmp,
        make_ppm,
        make_wav,
    )

    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, size=(6, 8, 3), dtype=np.uint8)
    assert (_decode_image(make_ppm(8, 6, 7)) == px).all()  # same seed
    assert (_decode_image(make_bmp(8, 6, 7)) == px).all()  # same rng stream
    wav = _decode_audio(make_wav(64, 7))
    assert wav.shape == (64, 1)
    expect = np.random.default_rng(7).integers(-2000, 2000, size=64)
    assert (wav.ravel() == expect).all()


def test_real_codec_end_to_end(spark):
    """Verdict r2 order 8: real bytes decoded end-to-end through
    mapInPandas — PPM/BMP/WAV rows produce features, the mp4 rows fall
    into the error path."""
    from hepcrawl_spark.operators.multimodal import synthesize_real_media

    media = synthesize_real_media(spark, n=30)
    feats = {r["media_id"]: r for r in extract_features(media, use_fake_decoder=False).collect()}
    assert len(feats) == 30
    for mid, r in feats.items():
        if mid % 6 == 5:  # the fake-mp4 slot
            assert r["feature"] is None and "video codec" in r["error"]
        else:
            assert r["error"] is None, r["error"]
            assert len(r["feature"]) == 8
            assert any(v != 0 for v in r["feature"])
    # decode is deterministic across runs
    again = {
        r["media_id"]: r["feature"]
        for r in extract_features(synthesize_real_media(spark, n=30), use_fake_decoder=False).collect()
    }
    assert {m: r["feature"] for m, r in feats.items()} == again


def test_png_decode_roundtrip():
    import numpy as np
    """Stdlib PNG decode (round-3 verdict order 7): seeded pixels survive
    encode -> zlib IDAT -> all five filter types -> decode, for gray/RGB/
    gray-alpha/RGBA; unsupported shapes fall to NotImplementedError."""
    import pytest

    from hepcrawl_spark.operators.multimodal import (
        _PNG_CHANNELS,
        _decode_image,
        _decode_png,
        make_png,
    )

    for ct in (0, 2, 4, 6):
        px = np.random.default_rng(11).integers(
            0, 256, size=(9, 6, _PNG_CHANNELS[ct]), dtype=np.uint8
        )
        assert (_decode_image(make_png(6, 9, 11, color_type=ct)) == px).all()
    with pytest.raises(NotImplementedError, match="IHDR"):
        _decode_png(b"\x89PNG\r\n\x1a\n" + b"\x00" * 4)


def test_probe_media_metadata(spark):
    """Header-level typed-metadata extraction: jpeg/gif dims are REAL from
    container headers even though their pixel codecs are env-gated; errors
    become rows."""
    import struct

    from hepcrawl_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        make_bmp,
        make_png,
        make_ppm,
        make_wav,
        probe_media_metadata,
    )

    jpeg = (
        b"\xff\xd8\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
        + b"\xff\xc0" + struct.pack(">H", 11) + b"\x08"
        + struct.pack(">HH", 480, 640) + b"\x03" + b"\x00" * 4
    )
    gif = b"GIF89a" + struct.pack("<HH", 12, 34) + b"\x00" * 10
    rows = [
        (0, "image", None, bytearray(jpeg), None, None, None),
        (1, "image", None, bytearray(gif), None, None, None),
        (2, "image", None, bytearray(make_png(6, 9, 1)), None, None, None),
        (3, "image", None, bytearray(make_bmp(8, 6, 1)), None, None, None),
        (4, "image", None, bytearray(make_ppm(8, 6, 1)), None, None, None),
        (5, "audio", None, bytearray(make_wav(4000, 1, rate=8000)), None, None, None),
        (6, "video", None, bytearray(b"garbage"), None, None, None),
        # MP3: ID3v2 tag (10-byte header, 0 payload) + one MPEG1 Layer III
        # frame header @128kbps/44100 + 4000 bytes of "audio" -> 8*4004/128k
        # seconds = ~250 ms
        (
            7, "audio", None,
            bytearray(
                b"ID3\x04\x00\x00\x00\x00\x00\x00"
                + b"\xff\xfb\x90\x00" + b"\x00" * 4000
            ),
            None, None, None,
        ),
        # MP4: ftyp box + moov{mvhd v0: timescale=1000, duration=7500}
        (
            8, "video", None,
            bytearray(
                struct.pack(">I", 16) + b"ftypisom" + b"\x00" * 4
                + struct.pack(">I", 116) + b"moov"
                + struct.pack(">I", 108) + b"mvhd" + b"\x00\x00\x00\x00"
                + struct.pack(">II", 0, 0)      # ctime, mtime
                + struct.pack(">II", 1000, 7500)  # timescale, duration
                + b"\x00" * 80
            ),
            None, None, None,
        ),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r["media_id"]: r for r in probe_media_metadata(media).collect()}
    assert got[7]["sniffed_mime"] == "audio/mpeg"
    assert got[7]["duration_ms"] == int(4004 * 8 / 128_000 * 1000)
    assert got[8]["sniffed_mime"] == "video/mp4"
    assert got[8]["duration_ms"] == 7500
    assert (got[0]["sniffed_mime"], got[0]["width"], got[0]["height"]) == ("image/jpeg", 640, 480)
    assert (got[1]["sniffed_mime"], got[1]["width"], got[1]["height"]) == ("image/gif", 12, 34)
    assert (got[2]["width"], got[2]["height"]) == (6, 9)
    assert (got[3]["width"], got[3]["height"]) == (8, 6)
    assert (got[4]["width"], got[4]["height"]) == (8, 6)
    assert got[5]["sniffed_mime"] == "audio/wav" and got[5]["duration_ms"] == 500
    assert got[6]["sniffed_mime"] is None and "unknown container" in got[6]["probe_error"]


def test_probe_real_jpeg_through_mapinpandas(spark):
    """A REAL encoder-produced baseline JPEG (IPython's well-known 2x2.jpg
    test image, embedded verbatim) must yield its true dimensions through
    the live mapInPandas probe — not just the synthetic SOF0 byte string."""
    import base64

    from hepcrawl_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        probe_media_metadata,
    )

    real_jpeg = base64.b64decode(
        "/9j/4AAQSkZJRgABAQAAAQABAAD/2wBDAAgGBgcGBQgHBwcJCQgKDBQNDAsLDBkSEw8UHRof"
        "Hh0aHBwgJC4nICIsIxwcKDcpLDAxNDQ0Hyc5PTgyPC4zNDL/wAALCAACAAIBAREA/8QAHwAA"
        "AQUBAQEBAQEAAAAAAAAAAAECAwQFBgcICQoL/8QAtRAAAgEDAwIEAwUFBAQAAAF9AQIDAAQR"
        "BRIhMUEGE1FhByJxFDKBkaEII0KxwRVS0fAkM2JyggkKFhcYGRolJicoKSo0NTY3ODk6Q0RF"
        "RkdISUpTVFVWV1hZWmNkZWZnaGlqc3R1dnd4eXqDhIWGh4iJipKTlJWWl5iZmqKjpKWmp6ip"
        "qrKztLW2t7i5usLDxMXGx8jJytLT1NXW19jZ2uHi4+Tl5ufo6erx8vP09fb3+Pn6/9oACAEB"
        "AAA/ACv/2Q=="
    )
    assert real_jpeg[:3] == b"\xff\xd8\xff" and len(real_jpeg) == 331
    media = spark.createDataFrame(
        [(0, "image", None, bytearray(real_jpeg), None, None, None)],
        MEDIA_SCHEMA,
    )
    got = probe_media_metadata(media).collect()[0]
    assert got["probe_error"] is None
    assert got["sniffed_mime"] == "image/jpeg"
    assert (got["width"], got["height"]) == (2, 2)


def test_jpeg_codec_roundtrip():
    """Baseline JPEG encode->decode stays within quantization error on a
    smooth signal, across grayscale / 4:4:4 / 4:2:0 / restart-marker
    variants and non-multiple-of-8 (and, subsampled, of 16) dimensions."""
    import numpy as np

    from hepcrawl_spark.operators.jpeg import decode_jpeg, encode_jpeg
    from hepcrawl_spark.operators.multimodal import make_jpeg

    def smooth(h, w, c):
        yy, xx = np.mgrid[0:h, 0:w]
        base = 128 + 80 * np.sin(xx / 7.0) * np.cos(yy / 9.0)
        if c == 3:
            return (
                np.stack([base, np.roll(base, 3, 0), 255 - base], -1)
                .clip(0, 255)
                .astype(np.uint8)
            )
        return base.clip(0, 255).astype(np.uint8)

    cases = [
        (16, 16, 1, False, 0), (24, 17, 1, False, 0),
        (21, 19, 3, False, 0), (20, 18, 3, True, 0),
        (48, 40, 1, False, 3), (48, 40, 3, True, 2),
    ]
    for h, w, c, sub, rst in cases:
        img = smooth(h, w, c)
        out = decode_jpeg(encode_jpeg(img, subsample=sub, restart_interval=rst))
        src = img if c == 3 else img[..., None]
        assert out.shape == src.shape
        err = np.abs(out.astype(float) - src.astype(float))
        # 4:2:0 averages chroma 2x2 -> looser bound on color variants
        assert err.mean() < (8 if sub else 5), (h, w, c, sub, rst, err.mean())
        assert err.max() < (64 if c == 3 else 16)

    # the synth helper is deterministic (fixture stability)
    assert make_jpeg(16, 14, 3) == make_jpeg(16, 14, 3)


def test_jpeg_decodes_foreign_encoder_bytes():
    """The decoder must handle JPEGs from OTHER encoders (standard Annex-K
    Huffman tables, libjpeg quant tables) — the embedded IPython 2x2.jpg,
    produced by a real libjpeg pipeline, not our own encoder."""
    import base64

    from hepcrawl_spark.operators.jpeg import decode_jpeg

    real_jpeg = base64.b64decode(
        "/9j/4AAQSkZJRgABAQAAAQABAAD/2wBDAAgGBgcGBQgHBwcJCQgKDBQNDAsLDBkSEw8UHRof"
        "Hh0aHBwgJC4nICIsIxwcKDcpLDAxNDQ0Hyc5PTgyPC4zNDL/wAALCAACAAIBAREA/8QAHwAA"
        "AQUBAQEBAQEAAAAAAAAAAAECAwQFBgcICQoL/8QAtRAAAgEDAwIEAwUFBAQAAAF9AQIDAAQR"
        "BRIhMUEGE1FhByJxFDKBkaEII0KxwRVS0fAkM2JyggkKFhcYGRolJicoKSo0NTY3ODk6Q0RF"
        "RkdISUpTVFVWV1hZWmNkZWZnaGlqc3R1dnd4eXqDhIWGh4iJipKTlJWWl5iZmqKjpKWmp6ip"
        "qrKztLW2t7i5usLDxMXGx8jJytLT1NXW19jZ2uHi4+Tl5ufo6erx8vP09fb3+Pn6/9oACAEB"
        "AAA/ACv/2Q=="
    )
    out = decode_jpeg(real_jpeg)
    # 2x2, single-component scan in this file -> grayscale-shaped output
    assert out.shape[0] == 2 and out.shape[1] == 2
    assert out.dtype.name == "uint8"

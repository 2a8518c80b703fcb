"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing (schemas, partitioning, mapInPandas batch shape,
Arrow transfer) is real and tested. ``DECODERS`` holds REAL stdlib codecs
for the formats parseable without media libraries — baseline JPEG
(Huffman + IDCT, ``operators/jpeg.py``), PNG (zlib IDAT + full filter
reconstruction), PPM/PGM/BMP images (struct+numpy) and WAV audio (stdlib
``wave``) — and raises NotImplementedError into the error-row path for
everything else (progressive JPEG, mp3/mp4 SAMPLE decode need
PIL/torchaudio/decord, absent in this container); a deployment extends the
decoder bodies without touching the plan shape. ``probe_media_metadata``
goes further than the decoders: container-header parsing (dimensions for
jpeg/png/gif/bmp/ppm, duration for wav/mp3/mp4) is stdlib-feasible for
every supported format, so the schema-on-read metadata pass yields real
typed rows even where the payload codec is environment-gated.

Design rules for 100 TB of media:
- binary payloads never enter a shuffle: all feature extraction is
  mapInPandas (narrow), outputs are small typed rows; joins happen on the
  extracted metadata, not the bytes.
- ``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds the bytes held
  per Arrow batch; media tables should also set a small
  ``parquet.block.size`` and partition by (modality, date).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("modality", StringType(), False),  # image|audio|video
        StructField("mime", StringType(), True),
        StructField("payload", BinaryType(), True),
        StructField("meta_width", IntegerType(), True),
        StructField("meta_height", IntegerType(), True),
        StructField("meta_duration_ms", IntegerType(), True),
    ]
)

FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("modality", StringType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("sha_prefix", StringType(), True),
        StructField("feature", ArrayType(FloatType()), True),
        StructField("error", StringType(), True),
    ]
)


def _decode_image(payload: bytes) -> np.ndarray:
    """REAL decode for the stdlib-parseable raster formats; everything
    else (jpeg/...) raises NotImplementedError into the error-row path —
    a deployment extends this with PIL without touching the plan shape.

    - PNG (8-bit, color types 0/2/4/6, non-interlaced): see ``_decode_png``.
    - PPM/PGM binary (P6/P5): ASCII header (magic, width, height, maxval,
      '#' comments allowed) then raw samples -> (H, W, C) uint8.
    - BMP (BITMAPINFOHEADER, uncompressed 24/32-bit): struct-parsed header,
      bottom-up rows with 4-byte padding -> (H, W, 3) uint8 in RGB order.
    """
    if payload[:2] in (b"P6", b"P5"):
        # tokenize the header: magic, width, height, maxval (comments skipped)
        tokens: list[bytes] = []
        i = 2
        while len(tokens) < 3 and i < len(payload):
            ch = payload[i : i + 1]
            if ch == b"#":  # comment to EOL
                i = payload.index(b"\n", i) + 1
            elif ch.isspace():
                i += 1
            else:
                j = i
                while j < len(payload) and not payload[j : j + 1].isspace():
                    j += 1
                tokens.append(payload[i:j])
                i = j
        w, h, maxval = int(tokens[0]), int(tokens[1]), int(tokens[2])
        if maxval > 255:
            raise NotImplementedError("16-bit PPM not supported")
        i += 1  # single whitespace byte after maxval
        c = 3 if payload[:2] == b"P6" else 1
        arr = np.frombuffer(payload, dtype=np.uint8, count=h * w * c, offset=i)
        return arr.reshape(h, w, c)
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return _decode_png(payload)
    if payload[:3] == b"\xff\xd8\xff":
        from .jpeg import decode_jpeg

        return decode_jpeg(payload)
    if payload[:2] == b"BM":
        import struct

        off, = struct.unpack_from("<I", payload, 10)
        hdr_size, w, h = struct.unpack_from("<Iii", payload, 14)
        planes, bpp, compression = struct.unpack_from("<HHI", payload, 26)
        if hdr_size < 40 or compression != 0 or bpp not in (24, 32):
            raise NotImplementedError(f"BMP bpp={bpp} compression={compression}")
        nch = bpp // 8
        flip = h > 0  # positive height = bottom-up row order
        h = abs(h)
        stride = (w * nch + 3) & ~3  # rows pad to 4 bytes
        rows = np.frombuffer(
            payload, dtype=np.uint8, count=h * stride, offset=off
        ).reshape(h, stride)[:, : w * nch].reshape(h, w, nch)
        if flip:
            rows = rows[::-1]
        return rows[..., [2, 1, 0]]  # BGR(A) -> RGB, alpha dropped
    raise NotImplementedError(
        "image codec: only JPEG/PNG/PPM/PGM/BMP without PIL"
    )


_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # color type -> samples/pixel


def _decode_png(payload: bytes) -> np.ndarray:
    """REAL stdlib-only PNG decode (the dominant web image format): chunk
    walk -> IHDR dims -> zlib-inflate concatenated IDAT -> per-scanline
    filter reconstruction (all five RFC 2083 filter types) -> (H, W, C)
    uint8. Supported: bit depth 8, color types 0/2/4/6, no interlace;
    palette/16-bit/Adam7 raise NotImplementedError into the error-row path.

    Filter math stays vectorized where the recurrence allows: None/Up are
    whole-row numpy ops; Sub is a per-channel-lane cumsum (uint8 wraparound
    == mod-256 addition); Average/Paeth carry a true per-pixel data
    dependence, so those (rare) rows fall back to a per-byte loop."""
    import struct
    import zlib

    pos = 8
    width = height = None
    bit_depth = color_type = interlace = None
    idat = bytearray()
    while pos + 8 <= len(payload):
        (length,), ctype = struct.unpack_from(">I", payload, pos), payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", data)
            )
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
        pos += 12 + length  # length + type + data + crc
    if width is None:
        raise NotImplementedError("PNG: missing IHDR")
    if bit_depth != 8 or color_type not in _PNG_CHANNELS or interlace:
        raise NotImplementedError(
            f"PNG bit_depth={bit_depth} color_type={color_type} "
            f"interlace={interlace}: only 8-bit non-interlaced 0/2/4/6"
        )
    nch = _PNG_CHANNELS[color_type]
    raw = zlib.decompress(bytes(idat))
    stride = width * nch
    if len(raw) < height * (stride + 1):
        raise NotImplementedError("PNG: truncated IDAT stream")
    rows = np.frombuffer(raw, dtype=np.uint8, count=height * (stride + 1)).reshape(
        height, stride + 1
    )
    ftypes = rows[:, 0]
    out = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        f = int(ftypes[y])
        line = rows[y, 1:].copy()
        if f == 0:  # None
            cur = line
        elif f == 1:  # Sub: cumsum along each channel lane, mod 256
            cur = (
                np.cumsum(line.reshape(width, nch), axis=0, dtype=np.uint64)
                .astype(np.uint8)
                .reshape(stride)
            )
        elif f == 2:  # Up
            cur = line + prev  # uint8 wraparound == mod-256
        elif f in (3, 4):  # Average / Paeth: per-pixel recurrence
            cur = np.zeros(stride, dtype=np.uint8)
            for x in range(stride):
                a = int(cur[x - nch]) if x >= nch else 0
                b = int(prev[x])
                if f == 3:
                    cur[x] = (int(line[x]) + ((a + b) >> 1)) & 0xFF
                else:
                    c = int(prev[x - nch]) if x >= nch else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    cur[x] = (int(line[x]) + pred) & 0xFF
        else:
            raise NotImplementedError(f"PNG filter type {f}")
        out[y] = cur
        prev = out[y]
    return out.reshape(height, width, nch)


def _decode_audio(payload: bytes) -> np.ndarray:
    """REAL decode for WAV via the stdlib ``wave`` module -> (n_frames,
    n_channels) int16/uint8 samples; compressed formats raise into the
    error-row path."""
    import io
    import wave

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise NotImplementedError("audio codec: only WAV without torchaudio")
    with wave.open(io.BytesIO(payload)) as wf:
        width = wf.getsampwidth()
        if width not in (1, 2):
            raise NotImplementedError(f"WAV sample width {width}")
        raw = wf.readframes(wf.getnframes())
        dtype = np.uint8 if width == 1 else np.dtype("<i2")
        return np.frombuffer(raw, dtype=dtype).reshape(-1, wf.getnchannels())


def _decode_video_frames(payload: bytes) -> np.ndarray:
    raise NotImplementedError("video codec not available in this container")


def _deterministic_fake_feature(payload: bytes, dim: int = 8) -> np.ndarray:
    """Deterministic stand-in feature so the pipeline is testable end-to-end
    without codecs: bytes -> chunked sums, normalized."""
    arr = np.frombuffer(payload, dtype=np.uint8)
    pad = (-len(arr)) % dim
    if pad:
        arr = np.concatenate([arr, np.zeros(pad, dtype=np.uint8)])
    chunks = arr.reshape(dim, -1).sum(axis=1).astype(np.float32)
    norm = np.linalg.norm(chunks)
    return chunks / norm if norm else chunks


DECODERS = {
    "image": _decode_image,
    "audio": _decode_audio,
    "video": _decode_video_frames,
}


def extract_features(
    media: DataFrame, use_fake_decoder: bool = True, dim: int = 8
) -> DataFrame:
    """mapInPandas feature extraction over media rows.

    Narrow (no shuffle); binary stays on the executor; output rows are small.
    ``use_fake_decoder=True`` routes every modality through the
    deterministic stand-in; False calls the real (stubbed) codecs and
    produces error rows with NotImplementedError until codecs are installed.
    """
    import hashlib

    def _feature(payload: bytes, modality: str):
        try:
            if use_fake_decoder:
                feat = _deterministic_fake_feature(payload, dim)
            else:
                arr = DECODERS[modality](payload).astype(np.float32)
                # shape-independent summary: global mean/std + dims, then
                # per-channel (image) / per-chunk (audio) means, padded to dim
                chans = (
                    arr.reshape(-1, arr.shape[-1]).mean(axis=0)
                    if arr.ndim > 1
                    else arr[None, 0]
                )
                head = np.array(
                    [arr.mean(), arr.std(), arr.shape[0], arr.shape[-1]],
                    dtype=np.float32,
                )
                feat = np.concatenate([head, chans.ravel()])[:dim]
                feat = np.pad(feat, (0, max(0, dim - len(feat))))
            return feat.astype(np.float32).tolist(), None
        except NotImplementedError as exc:
            return None, f"NotImplementedError: {exc}"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # columnar, no iterrows: only the inherently per-payload work
        # (sha256, codec call) runs per element, via comprehensions over
        # the raw column arrays
        for pdf in it:
            payloads = [p if p is not None else b"" for p in pdf["payload"]]
            feats, errs = (
                zip(*(_feature(p, m) for p, m in zip(payloads, pdf["modality"])))
                if len(pdf)
                else ((), ())
            )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(),
                    "modality": pdf["modality"].to_numpy(),
                    "n_bytes": np.fromiter(
                        (len(p) for p in payloads), dtype=np.int64, count=len(payloads)
                    ),
                    "sha_prefix": [
                        hashlib.sha256(p).hexdigest()[:16] for p in payloads
                    ],
                    "feature": list(feats),
                    "error": list(errs),
                }
            )

    return media.mapInPandas(batches, FEATURES_SCHEMA)


def make_ppm(w: int, h: int, seed: int) -> bytes:
    """Deterministic real P6 PPM bytes (seeded gradient)."""
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    return b"P6\n# synthetic\n%d %d\n255\n" % (w, h) + px.tobytes()


def make_bmp(w: int, h: int, seed: int) -> bytes:
    """Deterministic real 24-bit bottom-up BMP bytes."""
    import struct

    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)  # RGB
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = px[::-1, :, [2, 1, 0]].reshape(h, w * 3)  # bottom-up BGR
    data = rows.tobytes()
    return (
        b"BM"
        + struct.pack("<IHHI", 54 + len(data), 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0)
        + data
    )


def make_png(w: int, h: int, seed: int, color_type: int = 2) -> bytes:
    """Deterministic real PNG bytes (seeded pixels), exercising a mix of
    scanline filter types (0/1/2/3/4 cycling by row) so the decoder's full
    reconstruction logic runs, not just the filter-0 fast path."""
    import struct
    import zlib

    rng = np.random.default_rng(seed)
    nch = _PNG_CHANNELS[color_type]
    px = rng.integers(0, 256, size=(h, w, nch), dtype=np.uint8)
    stride = w * nch
    flat = px.reshape(h, stride).astype(np.int32)
    raw = bytearray()
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        f = y % 5
        cur = flat[y]
        if f == 0:
            filt = cur
        elif f == 1:
            left = np.r_[np.zeros(nch, dtype=np.int32), cur[:-nch]]
            filt = cur - left
        elif f == 2:
            filt = cur - prev
        elif f == 3:
            left = np.r_[np.zeros(nch, dtype=np.int32), cur[:-nch]]
            filt = cur - ((left + prev) >> 1)
        else:  # Paeth
            left = np.r_[np.zeros(nch, dtype=np.int32), cur[:-nch]]
            ul = np.r_[np.zeros(nch, dtype=np.int32), prev[:-nch]]
            p = left + prev - ul
            pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - ul)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, ul)
            )
            filt = cur - pred
        raw.append(f)
        raw += (filt & 0xFF).astype(np.uint8).tobytes()
        prev = flat[y]

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def make_jpeg(
    w: int, h: int, seed: int, gray: bool = False,
    subsample: bool = False, restart_interval: int = 0,
) -> bytes:
    """Deterministic real baseline-JPEG bytes (seeded smooth gradient — a
    JPEG-friendly signal so the lossy roundtrip stays within quantization
    error). Flags select grayscale / 4:2:0 / DRI-restart variants."""
    from .jpeg import encode_jpeg

    yy, xx = np.mgrid[0:h, 0:w]
    base = 128 + 80 * np.sin((xx + seed) / 7.0) * np.cos((yy + seed) / 9.0)
    if gray:
        img = base.clip(0, 255).astype(np.uint8)
    else:
        img = (
            np.stack([base, np.roll(base, 3, 0), 255 - base], -1)
            .clip(0, 255)
            .astype(np.uint8)
        )
    return encode_jpeg(img, subsample=subsample, restart_interval=restart_interval)


def make_wav(n_frames: int, seed: int, rate: int = 8000) -> bytes:
    """Deterministic real 16-bit mono WAV bytes (seeded sine-ish)."""
    import io
    import wave

    rng = np.random.default_rng(seed)
    samples = (rng.integers(-2000, 2000, size=n_frames)).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(samples.tobytes())
    return buf.getvalue()


def synthesize_real_media(spark, n: int = 30) -> DataFrame:
    """Media table whose payloads are REAL decodable bytes (PPM/BMP/PNG/WAV),
    cycling formats, for end-to-end codec tests. Built once on the driver
    (tiny) and parallelized; at scale these bytes come from parquet."""
    fmts = [
        ("image", "image/x-portable-pixmap", lambda i: make_ppm(8 + i % 5, 6, i)),
        ("image", "image/bmp", lambda i: make_bmp(7 + i % 5, 5, i)),
        ("image", "image/png", lambda i: make_png(6 + i % 5, 9, i, color_type=(0, 2, 6)[i % 3])),
        ("image", "image/jpeg", lambda i: make_jpeg(
            16 + i % 9, 14, i, gray=i % 3 == 0, subsample=i % 3 == 1,
            restart_interval=2 if i % 4 == 0 else 0,
        )),
        ("audio", "audio/wav", lambda i: make_wav(64 + i, i)),
        ("video", "video/mp4", lambda i: b"\x00\x00\x00 ftypisom" + bytes([i % 256]) * 32),
    ]
    rows = []
    for i in range(n):
        modality, mime, gen = fmts[i % len(fmts)]
        rows.append((i, modality, mime, bytearray(gen(i)), None, None, None))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def synthesize_media(spark, n: int = 100) -> DataFrame:
    """Deterministic fake media table (payload = seeded bytes)."""
    df = spark.range(0, n)
    modality = (
        F.when(F.col("id") % 3 == 0, "image")
        .when(F.col("id") % 3 == 1, "audio")
        .otherwise("video")
    )
    payload = F.encode(
        F.repeat(F.concat(F.lit("blob"), F.col("id").cast("string")), 64), "UTF-8"
    )
    return df.select(
        F.col("id").alias("media_id"),
        modality.alias("modality"),
        F.lit("application/octet-stream").alias("mime"),
        payload.alias("payload"),
        F.lit(640).alias("meta_width"),
        F.lit(480).alias("meta_height"),
        (F.col("id") % 1000).cast("int").alias("meta_duration_ms"),
    )


META_PROBE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("sniffed_mime", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", IntegerType(), True),
        StructField("probe_error", StringType(), True),
    ]
)


def _probe_one(payload: bytes):
    """-> (mime, width, height, duration_ms) from container HEADERS only —
    no pixel/sample decode, so jpeg/gif dimensions are extractable even
    though their payload codecs need external libs."""
    import struct

    if payload[:3] == b"\xff\xd8\xff":  # JPEG: scan markers for SOFn
        i = 2
        n = len(payload)
        while i + 9 < n:
            if payload[i] != 0xFF:
                i += 1
                continue
            marker = payload[i + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2
                continue
            seg_len = struct.unpack_from(">H", payload, i + 2)[0]
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                h, w = struct.unpack_from(">HH", payload, i + 5)
                return "image/jpeg", w, h, None
            i += 2 + seg_len
        raise ValueError("jpeg: no SOF marker")
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        w, h = struct.unpack_from(">II", payload, 16)  # IHDR is always first
        return "image/png", w, h, None
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack_from("<HH", payload, 6)
        return "image/gif", w, h, None
    if payload[:2] == b"BM":
        _, w, h = struct.unpack_from("<Iii", payload, 14)
        return "image/bmp", w, abs(h), None
    if payload[:2] in (b"P6", b"P5"):
        import re

        head = re.sub(rb"#[^\n]*", b"", payload[2:300])  # strip comments
        toks = head.split()
        return "image/x-portable-pixmap", int(toks[0]), int(toks[1]), None
    if payload[:3] == b"ID3" or (
        len(payload) >= 2
        and payload[0] == 0xFF
        and (payload[1] & 0xE0) == 0xE0
    ):
        # MP3: skip an ID3v2 tag (syncsafe size), then parse the first
        # MPEG audio frame header; CBR duration estimate from bitrate
        i = 0
        if payload[:3] == b"ID3":
            if len(payload) < 10:
                raise ValueError("mp3: truncated ID3v2 tag")
            i = 10 + (
                (payload[6] << 21)
                | (payload[7] << 14)
                | (payload[8] << 7)
                | payload[9]
            )
        while i + 4 <= len(payload):
            if payload[i] == 0xFF and (payload[i + 1] & 0xE0) == 0xE0:
                b1, b2 = payload[i + 1], payload[i + 2]
                version = (b1 >> 3) & 0x3  # 3=MPEG1, 2=MPEG2, 0=MPEG2.5
                layer = (b1 >> 1) & 0x3  # 1=III, 2=II, 3=I
                br_idx = (b2 >> 4) & 0xF
                sr_idx = (b2 >> 2) & 0x3
                if version == 1 or layer == 0 or br_idx in (0, 15) or sr_idx == 3:
                    i += 1  # false sync; keep scanning
                    continue
                if layer != 1:  # bitrate tables below are Layer III only
                    raise ValueError("mp3: only Layer III supported")
                _BR_V1_L3 = [0, 32, 40, 48, 56, 64, 80, 96, 112, 128,
                             160, 192, 224, 256, 320]
                _BR_V2_L3 = [0, 8, 16, 24, 32, 40, 48, 56, 64, 80,
                             96, 112, 128, 144, 160]
                _SR = {3: [44100, 48000, 32000], 2: [22050, 24000, 16000],
                       0: [11025, 12000, 8000]}
                kbps = (_BR_V1_L3 if version == 3 else _BR_V2_L3)[br_idx]
                rate = _SR[version][sr_idx]
                if kbps == 0 or rate == 0:
                    raise ValueError("mp3: free-format bitrate unsupported")
                audio_bytes = len(payload) - i
                return (
                    "audio/mpeg", None, None,
                    int(audio_bytes * 8 / (kbps * 1000) * 1000),
                )
            i += 1
        raise ValueError("mp3: no frame sync found")
    if payload[4:8] == b"ftyp":
        # MP4/ISO-BMFF: walk top-level boxes to moov, then mvhd for
        # timescale + duration (version 0 and 1 layouts)
        def _walk(buf, start, end, name):
            i = start
            while i + 8 <= end:
                sz = struct.unpack_from(">I", buf, i)[0]
                typ = buf[i + 4 : i + 8]
                hdr = 8
                if sz == 1:
                    sz = struct.unpack_from(">Q", buf, i + 8)[0]
                    hdr = 16
                elif sz == 0:
                    sz = end - i
                if typ == name:
                    return i + hdr, i + sz
                i += max(sz, 8)
            return None, None

        ms, me = _walk(payload, 0, len(payload), b"moov")
        if ms is None:
            raise ValueError("mp4: no moov box")
        hs, _he = _walk(payload, ms, me, b"mvhd")
        if hs is None:
            raise ValueError("mp4: no mvhd box")
        ver = payload[hs]
        if ver == 1:
            timescale = struct.unpack_from(">I", payload, hs + 4 + 16)[0]
            duration = struct.unpack_from(">Q", payload, hs + 4 + 20)[0]
        else:
            timescale = struct.unpack_from(">I", payload, hs + 4 + 8)[0]
            duration = struct.unpack_from(">I", payload, hs + 4 + 12)[0]
        if not timescale:
            raise ValueError("mp4: zero timescale")
        return "video/mp4", None, None, int(duration * 1000 / timescale)
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        # walk chunks for fmt (rate, block align) + data size
        i, rate, align, data = 12, None, None, None
        while i + 8 <= len(payload):
            cid = payload[i : i + 4]
            sz = struct.unpack_from("<I", payload, i + 4)[0]
            if cid == b"fmt ":
                _fmt, _ch, rate = struct.unpack_from("<HHI", payload, i + 8)
                align = struct.unpack_from("<H", payload, i + 20)[0]
            elif cid == b"data":
                data = sz
            i += 8 + sz + (sz & 1)
        if rate and align and data is not None:
            return "audio/wav", None, None, int(data / align / rate * 1000)
        raise ValueError("wav: missing fmt/data chunk")
    raise ValueError(f"unknown container: {payload[:4]!r}")


def probe_media_metadata(media: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Typed-metadata extraction from media container HEADERS (the schema-
    on-read step a 100-TB media lake runs before any decode): sniffed mime
    + dimensions (jpeg/png/gif/bmp/ppm) or duration (wav/mp3/mp4) per row,
    errors as rows. Header parsing needs only container structure, no media
    libraries — so jpeg/gif/mp3/mp4 metadata is REAL here even though
    their payload codecs are environment-gated. Narrow mapInPandas;
    payload bytes never shuffle."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {"media_id": pdf["media_id"].to_numpy(), "sniffed_mime": [],
                   "width": [], "height": [], "duration_ms": [], "probe_error": []}
            for p in pdf[payload_col]:
                try:
                    mime, w, h, d = _probe_one(bytes(p) if p is not None else b"")
                    err = None
                except Exception as exc:
                    mime = w = h = d = None
                    err = f"{type(exc).__name__}: {exc}"
                out["sniffed_mime"].append(mime)
                out["width"].append(w)
                out["height"].append(h)
                out["duration_ms"].append(d)
                out["probe_error"].append(err)
            yield pd.DataFrame(out)

    return media.select("media_id", payload_col).mapInPandas(
        batches, META_PROBE_SCHEMA
    )

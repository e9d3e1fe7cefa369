"""Multimodal columns: image/audio/video as opaque `binary` columns with
typed metadata, processed through Arrow-batched `mapInPandas`.

Decode paths:
  - REAL: 24-bit uncompressed BMP (BI_RGB) — a from-scratch numpy
    encoder/decoder (`bmp_encode`/`bmp_decode`), so
    `decode_media(fake=False)` and `resize_media(fake=False)` run end
    to end on real binary images with zero external libraries. The
    synthetic corpus (`bmp_media`) derives every pixel from integer
    arithmetic on (media_id, x, y), which makes per-channel pixel sums
    exactly replayable by a SQL oracle that never touches the bytes.
  - REAL: 8-bit PNG (grey/RGB/RGBA, non-interlaced) — a from-scratch
    codec over stdlib zlib (`png_encode`/`png_decode`): chunk framing,
    CRC verification, and all five scanline filters implemented here;
    `image_decode` sniffs BMP vs PNG magic so every image op is
    codec-agnostic.
  - FAKE: formats whose codecs genuinely need external libs (JPEG,
    real audio codecs); `fake=True` runs a deterministic md5-derived
    featurizer through the identical Arrow plumbing.

Scale design: media bytes never leave the executor as Python objects
row-at-a-time; they move as Arrow binary batches into a single
mapInPandas pass. Feature outputs are fixed-width arrays so downstream
ops (ANN over features) reuse the similarity operators unchanged.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from warp_pipe_spark.io import explode_nonnull, fan_out

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("content", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("n_bytes", T.LongType()),
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.LongType()),
                ]
            ),
        ),
    ]
)

FEATURE_DIM = 8

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("content_md5", T.StringType()),
        # doubles, exact dyadic fractions (k/65536): bit-identical in
        # any engine, so the DuckDB oracle can replay the featurizer
        T.StructField("features", T.ArrayType(T.DoubleType())),
    ]
)


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Synthesize a MEDIA_SCHEMA table from `documents` (the container
    has no real media): text bytes as content, deterministic metadata.
    Used by tests; real deployments read binary parquet directly."""
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    content = F.encode("text", "utf-8")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        content.alias("content"),
        F.struct(
            # BYTE length of the encoded content (F.length on binary),
            # not the character length of the text: they diverge on any
            # non-ASCII character, breaking the n_bytes == len(content)
            # invariant (the oracle already uses octet_length)
            F.length(content).cast("long").alias("n_bytes"),
            F.concat(F.lit("application/x-fake-"), kind).alias("mime"),
            (F.col("doc_id") % 640 + 1).cast("int").alias("width"),
            (F.col("doc_id") % 480 + 1).cast("int").alias("height"),
            (F.col("doc_id") * 40 + 1000).cast("long").alias("duration_ms"),
        ).alias("meta"),
    )


def _bmp_stride(width: int) -> int:
    """Bytes per BMP pixel row: 3 bytes/px padded up to a 4-byte multiple."""
    return ((3 * width + 3) // 4) * 4


def bmp_encode(pixels: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as a 24-bit BI_RGB BMP —
    BITMAPFILEHEADER + BITMAPINFOHEADER, bottom-up BGR rows, each row
    zero-padded to a 4-byte boundary. Pure numpy, no libraries."""
    h, w = pixels.shape[:2]
    stride = _bmp_stride(w)
    rows = np.zeros((h, stride), dtype=np.uint8)
    # RGB → BGR, image top row last in the file (bottom-up layout)
    rows[:, : 3 * w] = pixels[::-1, :, ::-1].reshape(h, 3 * w)
    body = rows.tobytes()
    header = struct.pack(
        "<2sIHHI" "IiiHHIIiiII",
        b"BM",
        54 + len(body),  # file size
        0,
        0,
        54,  # pixel-data offset
        40,  # BITMAPINFOHEADER size
        w,
        h,  # positive height = bottom-up
        1,  # planes
        24,  # bits per pixel
        0,  # BI_RGB (uncompressed)
        len(body),
        2835,
        2835,  # 72 DPI in px/metre
        0,
        0,
    )
    return header + body


def bmp_decode(data: bytes) -> np.ndarray:
    """Decode a 24-bit BI_RGB BMP to an (h, w, 3) uint8 RGB array
    (top-down). Validates the magic, bpp, and compression fields and
    honors the header's pixel offset, row padding, and bottom-up vs
    top-down (negative height) row order — a real parser, not a replay
    of the encoder's assumptions."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP: missing 'BM' magic")
    (offset,) = struct.unpack_from("<I", data, 10)
    w, h_signed = struct.unpack_from("<ii", data, 18)
    (bpp,) = struct.unpack_from("<H", data, 28)
    (compression,) = struct.unpack_from("<I", data, 30)
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP: bpp={bpp} compression={compression}")
    h = abs(h_signed)
    stride = _bmp_stride(w)
    rows = np.frombuffer(data, dtype=np.uint8, count=stride * h, offset=offset)
    bgr = rows.reshape(h, stride)[:, : 3 * w].reshape(h, w, 3)
    if h_signed > 0:  # bottom-up: first file row is the bottom image row
        bgr = bgr[::-1]
    return bgr[:, :, ::-1]  # BGR → RGB


# -- PNG: from-scratch codec; stdlib zlib supplies ONLY inflate/deflate
#    and crc32 — chunk framing, IHDR validation, and all five scanline
#    filters (None/Sub/Up/Average/Paeth, RFC 2083 §6) are implemented
#    here, so `decode_media` no longer needs external imaging libs for
#    PNG (JPEG and real audio codecs still route through fake=True).

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
#: IHDR color type → samples per pixel (8-bit depth only)
_PNG_CHANNELS = {0: 1, 2: 3, 6: 4}


def _png_chunk(typ: bytes, data: bytes) -> bytes:
    import zlib

    return (
        struct.pack("!I", len(data))
        + typ
        + data
        + struct.pack("!I", zlib.crc32(typ + data))
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def png_encode(pixels: np.ndarray, row_filter: int = 0) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as an 8-bit truecolor PNG.
    `row_filter` selects the per-scanline filter (0..4) applied to
    EVERY row — exercising all five forward filters is what lets the
    round-trip tests prove the decoder's five inverses, not just
    filter-0 passthrough."""
    import zlib

    if row_filter not in range(5):
        raise ValueError(f"PNG filter must be 0..4, got {row_filter}")
    h, w = pixels.shape[:2]
    bpp = 3
    raw = pixels.astype(np.int16)
    out = bytearray()
    prev = np.zeros((w, bpp), dtype=np.int16)
    for y in range(h):
        row = raw[y]
        left = np.vstack([np.zeros((1, bpp), np.int16), row[:-1]])
        upleft = np.vstack([np.zeros((1, bpp), np.int16), prev[:-1]])
        if row_filter == 0:
            filt = row
        elif row_filter == 1:
            filt = row - left
        elif row_filter == 2:
            filt = row - prev
        elif row_filter == 3:
            filt = row - (left + prev) // 2
        else:
            pred = np.empty_like(row)
            for x in range(w):
                for c in range(bpp):
                    pred[x, c] = _paeth(
                        int(left[x, c]), int(prev[x, c]), int(upleft[x, c])
                    )
            filt = row - pred
        out.append(row_filter)
        out.extend((filt % 256).astype(np.uint8).tobytes())
        prev = row
    ihdr = struct.pack("!IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(out)))
        + _png_chunk(b"IEND", b"")
    )


def png_decode(data: bytes) -> np.ndarray:
    """Decode an 8-bit non-interlaced PNG (greyscale / RGB / RGBA) to
    an (h, w, channels) uint8 array: chunk walk with CRC verification,
    IDAT concatenation, inflate, then the five scanline unfilters.
    Sub/Average/Paeth reconstruct sequentially within a row (their
    definition — each byte depends on the reconstructed left
    neighbor); None/Up vectorize."""
    import zlib

    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG: bad signature")
    off = 8
    ihdr = None
    idat = bytearray()
    while off < len(data):
        (ln,) = struct.unpack_from("!I", data, off)
        typ = data[off + 4 : off + 8]
        chunk = data[off + 8 : off + 8 + ln]
        (crc,) = struct.unpack_from("!I", data, off + 8 + ln)
        if zlib.crc32(typ + chunk) != crc:
            raise ValueError(f"PNG chunk {typ!r} CRC mismatch")
        if typ == b"IHDR":
            ihdr = struct.unpack("!IIBBBBB", chunk)
        elif typ == b"IDAT":
            idat.extend(chunk)
        elif typ == b"IEND":
            break
        off += 12 + ln
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, ctype, comp, filt, interlace = ihdr
    if depth != 8 or comp != 0 or filt != 0 or interlace != 0:
        raise ValueError(
            f"unsupported PNG: depth={depth} compression={comp} "
            f"filter={filt} interlace={interlace} (8-bit "
            "non-interlaced only)"
        )
    ch = _PNG_CHANNELS.get(ctype)
    if ch is None:
        raise ValueError(f"unsupported PNG color type {ctype}")
    raw = zlib.decompress(bytes(idat))
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG pixel data length mismatch")
    img = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int16)
    pos = 0
    for y in range(h):
        f = raw[pos]
        row = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=pos + 1
        ).astype(np.int16)
        pos += stride + 1
        if f == 0:
            recon = row
        elif f == 2:
            recon = (row + prev) % 256
        elif f in (1, 3, 4):
            recon = np.empty(stride, dtype=np.int16)
            for x in range(stride):
                a = recon[x - ch] if x >= ch else 0
                if f == 1:
                    recon[x] = (row[x] + a) % 256
                elif f == 3:
                    recon[x] = (row[x] + (a + prev[x]) // 2) % 256
                else:
                    c = prev[x - ch] if x >= ch else 0
                    recon[x] = (
                        row[x] + _paeth(int(a), int(prev[x]), int(c))
                    ) % 256
        else:
            raise ValueError(f"PNG row {y}: unknown filter {f}")
        img[y] = recon.astype(np.uint8)
        prev = recon
    return img.reshape(h, w, ch)


def image_decode(data: bytes) -> np.ndarray:
    """Magic-sniffing image decode → (h, w, 3) uint8 RGB: BMP and PNG
    route to their from-scratch codecs (greyscale broadcast to RGB,
    alpha dropped — downstream features are RGB-shaped); anything else
    raises, as a real decoder should."""
    if data[:2] == b"BM":
        return bmp_decode(data)
    if data[:8] == _PNG_SIG:
        px = png_decode(data)
        if px.shape[2] == 1:
            return np.repeat(px, 3, axis=2)
        return px[:, :, :3]
    raise ValueError("unsupported image format (BMP and PNG only)")


def synth_pixels(media_id: int, w: int, h: int) -> np.ndarray:
    """Deterministic (h, w, 3) RGB test image: every channel is integer
    arithmetic on (media_id, x, y) mod 256, so any SQL engine can replay
    aggregate pixel statistics without ever seeing the bytes."""
    y, x = np.mgrid[0:h, 0:w]
    r = (7 * media_id + x + 11 * y) % 256
    g = (3 * media_id + 5 * x + y) % 256
    b = (media_id + 2 * x + 3 * y) % 256
    return np.stack([r, g, b], axis=-1).astype(np.uint8)


def bmp_dims(media_id: int) -> tuple[int, int]:
    """Per-doc synthetic dimensions (4..19 × 4..15) — small but varied,
    exercising every stride-padding remainder (w mod 4 ∈ {0,1,2,3})."""
    return media_id % 16 + 4, media_id % 12 + 4


def bmp_media(docs: DataFrame) -> DataFrame:
    """A MEDIA_SCHEMA table whose `content` is REAL binary — 24-bit BMP
    images synthesized per doc_id — built in one Arrow mapInPandas pass."""

    def mapper(batches):
        for pdf in batches:
            contents, metas = [], []
            for mid in pdf["doc_id"]:
                mid = int(mid)
                w, h = bmp_dims(mid)
                blob = bmp_encode(synth_pixels(mid, w, h))
                contents.append(blob)
                metas.append(
                    {
                        "n_bytes": len(blob),
                        "mime": "image/bmp",
                        "width": w,
                        "height": h,
                        "duration_ms": 0,
                    }
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"].astype("int64"),
                    "kind": "image",
                    "content": contents,
                    "meta": metas,
                }
            )

    return docs.select("doc_id").mapInPandas(mapper, schema=MEDIA_SCHEMA)


def png_media(docs: DataFrame) -> DataFrame:
    """bmp_media's PNG twin: the SAME synth_pixels per doc_id, encoded
    by the from-scratch PNG codec (row filter cycles doc_id mod 5 so
    every filter appears in the corpus). Pixel-level results of any
    image op are therefore identical across the two tables — the
    codec-invariance contract avg_hash pins in tests."""

    def mapper(batches):
        for pdf in batches:
            contents, metas = [], []
            for mid in pdf["doc_id"]:
                mid = int(mid)
                w, h = bmp_dims(mid)
                blob = png_encode(
                    synth_pixels(mid, w, h), row_filter=mid % 5
                )
                contents.append(blob)
                metas.append(
                    {
                        "n_bytes": len(blob),
                        "mime": "image/png",
                        "width": w,
                        "height": h,
                        "duration_ms": 0,
                    }
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"].astype("int64"),
                    "kind": "image",
                    "content": contents,
                    "meta": metas,
                }
            )

    # fan_out: zlib DEFLATE per doc is the one codec heavy enough to
    # beat the exchange overhead (7.8 s single-task -> 2.4 s); the
    # cheap BMP/WAV/stream codecs stay on the scan partitioning
    return fan_out(docs.select("doc_id"), "doc_id").mapInPandas(
        mapper, schema=MEDIA_SCHEMA
    )


# -- video: BMP-frame stream container, real demux + per-frame decode ----


def video_dims(media_id: int) -> tuple[int, int, int]:
    """(n_frames, width, height) for the synthetic video corpus."""
    return media_id % 6 + 2, media_id % 8 + 4, media_id % 6 + 4


def video_media(docs: DataFrame) -> DataFrame:
    """MEDIA_SCHEMA table whose `content` is a REAL video-like stream:
    N concatenated BMP frames (each self-describing via its RIFF-style
    file-size field), frame f's pixels derived from media_id·1000+f —
    so per-frame statistics replay from pure arithmetic."""

    def mapper(batches):
        for pdf in batches:
            contents, metas = [], []
            for mid in pdf["doc_id"]:
                mid = int(mid)
                nf, w, h = video_dims(mid)
                blob = b"".join(
                    bmp_encode(synth_pixels(mid * 1000 + f, w, h))
                    for f in range(nf)
                )
                contents.append(blob)
                metas.append(
                    {
                        "n_bytes": len(blob),
                        "mime": "video/x-bmp-stream",
                        "width": w,
                        "height": h,
                        "duration_ms": nf * 40,  # 25 fps
                    }
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"].astype("int64"),
                    "kind": "video",
                    "content": contents,
                    "meta": metas,
                }
            )

    return docs.select("doc_id").mapInPandas(mapper, schema=MEDIA_SCHEMA)


def split_bmp_stream(data: bytes) -> list[bytes]:
    """Demux a concatenated-BMP stream by walking each frame's declared
    file size (bytes 2..6 of its header) — a real container parser, not
    a fixed-stride assumption."""
    frames, pos = [], 0
    while pos < len(data):
        if data[pos : pos + 2] != b"BM":
            raise ValueError(f"bad frame magic at offset {pos}")
        if pos + 6 > len(data):
            raise ValueError(f"truncated frame header at offset {pos}")
        (size,) = struct.unpack_from("<I", data, pos + 2)
        if size < 54 or pos + size > len(data):
            raise ValueError(f"bad frame size {size} at offset {pos}")
        frames.append(data[pos : pos + size])
        pos += size
    return frames


VIDEO_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("sum_r", T.LongType()),
        T.StructField("sum_g", T.LongType()),
        T.StructField("sum_b", T.LongType()),
    ]
)


def extract_frames(media: DataFrame, every_n: int = 1) -> DataFrame:
    """REAL frame extraction: demux the stream, decode every
    `every_n`-th frame, emit per-frame per-channel pixel sums. The 1→N
    row fan-out happens inside the Arrow pass (one input row → many
    output rows), distributed — never on the driver."""

    def mapper(batches):
        for pdf in batches:
            out = []
            for mid, c in zip(pdf["media_id"], pdf["content"]):
                for f, frame in enumerate(split_bmp_stream(bytes(c))):
                    if f % every_n:
                        continue
                    img = bmp_decode(frame)
                    h, w = img.shape[:2]
                    s = img.reshape(-1, 3).sum(axis=0, dtype=np.int64)
                    out.append(
                        {
                            "media_id": int(mid),
                            "frame_idx": f,
                            "width": w,
                            "height": h,
                            "sum_r": int(s[0]),
                            "sum_g": int(s[1]),
                            "sum_b": int(s[2]),
                        }
                    )
            yield pd.DataFrame(out)

    return media.mapInPandas(mapper, schema=VIDEO_FRAME_SCHEMA)


# -- audio: 16-bit PCM WAV, same from-scratch discipline as BMP ----------


def wav_encode(samples: np.ndarray, sample_rate: int = 8000) -> bytes:
    """Encode a mono int16 sample array as a canonical 44-byte-header
    RIFF/WAVE PCM file. Pure numpy/struct, no libraries."""
    data = samples.astype("<i2").tobytes()
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF",
        36 + len(data),
        b"WAVE",
        b"fmt ",
        16,  # fmt chunk size
        1,  # PCM
        1,  # mono
        sample_rate,
        sample_rate * 2,  # byte rate
        2,  # block align
        16,  # bits/sample
        b"data",
        len(data),
    )
    return hdr + data


def wav_decode(data: bytes) -> tuple[int, np.ndarray]:
    """Decode a PCM WAV: returns (sample_rate, int16 samples). Walks
    the RIFF chunk list (not a fixed 44-byte assumption), validates
    PCM/16-bit/mono — a real parser."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, rate, samples = 12, None, None
    while pos + 8 <= len(data):
        cid, size = struct.unpack_from("<4sI", data, pos)
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt, ch, rate, _, _, bits = struct.unpack_from("<HHIIHH", body, 0)
            if fmt != 1 or ch != 1 or bits != 16:
                raise ValueError(f"unsupported WAV: fmt={fmt} ch={ch} bits={bits}")
        elif cid == b"data":
            samples = np.frombuffer(body, dtype="<i2")
        pos += 8 + size + (size & 1)  # RIFF chunks are word-aligned
    if rate is None or samples is None:
        raise ValueError("missing fmt/data chunk")
    return rate, samples


def synth_samples(media_id: int, n: int) -> np.ndarray:
    """Deterministic int16 test signal: s_i = ((7·id + 13·i) mod 2¹⁶) −
    2¹⁵ — integer arithmetic a SQL oracle replays without the bytes."""
    i = np.arange(n, dtype=np.int64)
    return (((7 * media_id + 13 * i) % 65536) - 32768).astype(np.int16)


def wav_dims(media_id: int) -> int:
    """Per-doc synthetic sample count (100..599)."""
    return media_id % 500 + 100


def wav_media(docs: DataFrame) -> DataFrame:
    """MEDIA_SCHEMA table whose `content` is REAL binary audio (PCM
    WAV synthesized per doc_id), one Arrow mapInPandas pass."""

    def mapper(batches):
        for pdf in batches:
            contents, metas = [], []
            for mid in pdf["doc_id"]:
                mid = int(mid)
                n = wav_dims(mid)
                blob = wav_encode(synth_samples(mid, n))
                contents.append(blob)
                metas.append(
                    {
                        "n_bytes": len(blob),
                        "mime": "audio/wav",
                        "width": None,
                        "height": None,
                        "duration_ms": n * 1000 // 8000,
                    }
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"].astype("int64"),
                    "kind": "audio",
                    "content": contents,
                    "meta": metas,
                }
            )

    return docs.select("doc_id").mapInPandas(mapper, schema=MEDIA_SCHEMA)


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_samples", T.LongType()),
        T.StructField("sample_rate", T.LongType()),
        T.StructField("sum_abs", T.LongType()),
        T.StructField("n_zero_cross", T.LongType()),
    ]
)


def decode_audio(media: DataFrame) -> DataFrame:
    """REAL audio decode → integer signal statistics (mean-amplitude
    mass, zero crossings): the featurizer shape a speech/audio corpus
    pipeline runs before filtering. All-integer outputs — any engine
    replays them exactly."""

    def mapper(batches):
        for pdf in batches:
            out = []
            for mid, c in zip(pdf["media_id"], pdf["content"]):
                rate, s = wav_decode(bytes(c))
                v = s.astype(np.int64)
                out.append(
                    {
                        "media_id": int(mid),
                        "n_samples": len(v),
                        "sample_rate": rate,
                        "sum_abs": int(np.abs(v).sum()),
                        "n_zero_cross": int((v[:-1] * v[1:] < 0).sum()),
                    }
                )
            yield pd.DataFrame(out)

    return media.mapInPandas(mapper, schema=AUDIO_FEATURES_SCHEMA)


AUDIO_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_id", T.LongType()),
        T.StructField("n_in_frame", T.LongType()),
        T.StructField("energy", T.LongType()),
        T.StructField("sum_abs", T.LongType()),
    ]
)


def audio_frame_features(media: DataFrame, frame: int = 128) -> DataFrame:
    """FRAME-level audio features from real WAV bytes — the spectrogram
    precursor (framing is step one of any STFT/fbank pipeline): the
    decoded signal cut into disjoint `frame`-sample windows, per frame
    the energy (Σv², exact in int64: 2¹⁵² · frame ≪ 2⁶³) and
    absolute-amplitude mass. The expansion is ~n_samples/frame rows
    per clip — bounded fan-out, same Arrow mapInPandas shape as
    decode_audio, embarrassingly parallel at 100 TB of audio.
    All-integer outputs; the oracle replays the synth arithmetic."""

    def mapper(batches):
        for pdf in batches:
            out = []
            for mid, c in zip(pdf["media_id"], pdf["content"]):
                _, s = wav_decode(bytes(c))
                v = s.astype(np.int64)
                for f in range(0, len(v), frame):
                    w = v[f : f + frame]
                    out.append(
                        {
                            "media_id": int(mid),
                            "frame_id": f // frame,
                            "n_in_frame": len(w),
                            "energy": int((w * w).sum()),
                            "sum_abs": int(np.abs(w).sum()),
                        }
                    )
            yield pd.DataFrame(out)

    return media.mapInPandas(mapper, schema=AUDIO_FRAME_SCHEMA)


IMAGE_TILE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("tile_x", T.LongType()),
        T.StructField("tile_y", T.LongType()),
        T.StructField("n_px", T.LongType()),
        T.StructField("sum_r", T.LongType()),
        T.StructField("sum_g", T.LongType()),
        T.StructField("sum_b", T.LongType()),
    ]
)


def image_tile_features(media: DataFrame, tile: int = 4) -> DataFrame:
    """ViT-style patchification from real BMP bytes: the decoded image
    cut into `tile`×`tile` patches (ragged right/bottom edges keep
    their partial patches), per patch the integer channel sums — the
    exact statistics a patch-embedding/normalization stage consumes.
    Fan-out is ⌈w/t⌉·⌈h/t⌉ rows per image (bounded by image size);
    same Arrow mapInPandas shape as decode_media. All-integer — the
    oracle replays the synthetic pixel arithmetic, never the bytes."""

    def mapper(batches):
        for pdf in batches:
            out = []
            for mid, c in zip(pdf["media_id"], pdf["content"]):
                px = image_decode(bytes(c)).astype(np.int64)
                h, w, _ = px.shape
                for ty in range(0, h, tile):
                    for tx in range(0, w, tile):
                        p = px[ty : ty + tile, tx : tx + tile]
                        out.append(
                            {
                                "media_id": int(mid),
                                "tile_x": tx // tile,
                                "tile_y": ty // tile,
                                "n_px": p.shape[0] * p.shape[1],
                                "sum_r": int(p[..., 0].sum()),
                                "sum_g": int(p[..., 1].sum()),
                                "sum_b": int(p[..., 2].sum()),
                            }
                        )
            yield pd.DataFrame(out)

    return media.mapInPandas(mapper, schema=IMAGE_TILE_SCHEMA)


VIDEO_DIFF_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("n_px", T.LongType()),
        T.StructField("diff_r", T.LongType()),
        T.StructField("diff_g", T.LongType()),
        T.StructField("diff_b", T.LongType()),
    ]
)


def video_frame_diffs(media: DataFrame) -> DataFrame:
    """Scene-change statistics from the real video byte stream: per
    consecutive frame pair, the absolute pixel difference summed per
    channel — the signal a shot-boundary detector thresholds and a
    frame-sampling policy uses to keep only frames that changed. One
    row per (frame f-1, f) pair, integer-exact; same Arrow mapInPandas
    shape as extract_frames, linear in total video bytes."""

    def mapper(batches):
        for pdf in batches:
            out = []
            for mid, c in zip(pdf["media_id"], pdf["content"]):
                frames = [
                    bmp_decode(b).astype(np.int64)
                    for b in split_bmp_stream(bytes(c))
                ]
                for f in range(1, len(frames)):
                    d = np.abs(frames[f] - frames[f - 1])
                    h, w, _ = d.shape
                    out.append(
                        {
                            "media_id": int(mid),
                            "frame_idx": f,
                            "n_px": h * w,
                            "diff_r": int(d[..., 0].sum()),
                            "diff_g": int(d[..., 1].sum()),
                            "diff_b": int(d[..., 2].sum()),
                        }
                    )
            yield pd.DataFrame(out)

    return media.mapInPandas(mapper, schema=VIDEO_DIFF_SCHEMA)


def _fake_features(content: bytes) -> list[float]:
    """Deterministic stand-in for a real image/audio featurizer: 8
    doubles from the md5 digest, scaled to [0, 1). k/65536 is an exact
    binary fraction — no rounding, so any engine reproduces the value
    bit-for-bit from the same md5."""
    d = hashlib.md5(content).digest()
    return [
        int.from_bytes(d[2 * i : 2 * i + 2], "big") / 65536.0
        for i in range(FEATURE_DIM)
    ]


def _bmp_features(content: bytes) -> list[float]:
    """Real decode features: 8 integer-valued doubles (exact in IEEE754
    below 2^53, so any engine replays them bit-for-bit) —
    [width, height, n_pixels, sum_r, sum_g, sum_b, stride, n_bytes].
    PNG blobs route through the from-scratch png codec (stride there =
    w*3+1, the filter byte + unpadded RGB row actually laid out in the
    file); BMP math is untouched — the registered oracles replay it."""
    if content[:8] == _PNG_SIG:
        img = image_decode(content)
        h, w = img.shape[:2]
        s = img.reshape(-1, 3).sum(axis=0, dtype=np.int64)
        return [
            float(w), float(h), float(w * h),
            float(s[0]), float(s[1]), float(s[2]),
            float(w * 3 + 1), float(len(content)),
        ]
    img = bmp_decode(content)
    h, w = img.shape[:2]
    s = img.reshape(-1, 3).sum(axis=0, dtype=np.int64)
    return [
        float(w),
        float(h),
        float(w * h),
        float(s[0]),
        float(s[1]),
        float(s[2]),
        float(_bmp_stride(w)),
        float(len(content)),
    ]


def avg_hash(media: DataFrame, grid: int = 8) -> DataFrame:
    """Perceptual average-hash over REAL decoded images — the
    near-duplicate-image primitive of a multimodal training-data
    pipeline (images whose hashes differ in few bits are visual dups;
    downstream dedup joins on the hash exactly like text MinHash
    bands).

    Definition (all integer arithmetic, so a SQL oracle replays it
    without seeing a byte): sample the decoded image on a grid×grid
    nearest-neighbor lattice (src = (i·w)//grid), per-cell gray =
    r+g+b (0..765), bit_j = [grid²·gray_j > Σ gray] (the
    cross-multiplied form of gray_j > mean — no division), bits packed
    row-major into two BIGINT halves (hash_hi = cells 32..63,
    hash_lo = 0..31; two halves keep bit 63 out of the sign).

    One Arrow mapInPandas pass over binary batches — same plumbing and
    scale shape as decode_media."""

    def mapper(batches):
        for pdf in batches:
            rows = []
            for mid, blob in zip(pdf["media_id"], pdf["content"]):
                px = image_decode(bytes(blob)).astype(np.int64)
                h, w = px.shape[:2]
                gray = px.sum(axis=2)  # r+g+b per pixel
                ys = (np.arange(grid) * h) // grid
                xs = (np.arange(grid) * w) // grid
                cells = gray[np.ix_(ys, xs)].ravel()  # row-major: jy*grid+jx
                tot = int(cells.sum())
                val = 0
                for idx, c in enumerate(cells):
                    if grid * grid * int(c) > tot:
                        val |= 1 << idx
                rows.append(
                    (int(mid), w, h, val >> 32, val & 0xFFFFFFFF)
                )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "width", "height", "hash_hi", "hash_lo"],
            )

    return media.mapInPandas(
        mapper,
        schema="media_id LONG, width LONG, height LONG, "
        "hash_hi LONG, hash_lo LONG",
    )


def decode_media(media: DataFrame, fake: bool = False) -> DataFrame:
    """Decode / feature-extract media content → FEATURES_SCHEMA.

    fake=False runs the REAL decoders (24-bit BMP via `bmp_decode`,
    8-bit PNG via the from-scratch `png_decode` over stdlib zlib; any
    other blob raises, as a real decoder should). JPEG / real audio
    codecs would need external libs — fake=True runs the deterministic
    md5 featurizer through identical plumbing for those. Either way: one Arrow mapInPandas pass, binary batches, no
    row-at-a-time Python boundary crossings.
    """
    featurize = _bmp_features if not fake else _fake_features

    def mapper(batches):
        for pdf in batches:
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(c) for c in pdf["content"]],
                    "content_md5": [hashlib.md5(bytes(c)).hexdigest() for c in pdf["content"]],
                    "features": [featurize(bytes(c)) for c in pdf["content"]],
                }
            )
            yield out

    return media.mapInPandas(mapper, schema=FEATURES_SCHEMA)


def resize_media(
    media: DataFrame, max_width: int = 256, max_height: int = 256, fake: bool = False
) -> DataFrame:
    """Image resize: target dimensions are recomputed JVM-side
    (aspect-ratio preserving), pixel work goes through the same Arrow
    mapInPandas boundary as decode. Schema out == schema in
    (MEDIA_SCHEMA).

    fake=False runs the REAL transform on BMP content: decode →
    nearest-neighbor resample (src = (dst * src_dim) // dst_dim, pure
    integer arithmetic, so a SQL oracle can replay the resampled pixel
    statistics) → re-encode. fake=True passes bytes through untouched
    (the path for codec formats needing external libs), still
    exercising the full batch path with the resized metadata."""
    scale = F.least(
        F.lit(1.0),
        F.lit(float(max_width)) / F.col("meta.width"),
        F.lit(float(max_height)) / F.col("meta.height"),
    )
    with_target = media.withColumn(
        "meta",
        F.struct(
            F.col("meta.n_bytes"),
            F.col("meta.mime"),
            F.ceil(F.col("meta.width") * scale).cast("int").alias("width"),
            F.ceil(F.col("meta.height") * scale).cast("int").alias("height"),
            F.col("meta.duration_ms"),
        ),
    )

    def mapper(batches):
        for pdf in batches:
            if fake:
                # pass-through: codec formats would need external libs
                yield pdf
                continue
            contents, metas = [], []
            for c, m in zip(pdf["content"], pdf["meta"]):
                raw = bytes(c)
                img = image_decode(raw)
                sh, sw = img.shape[:2]
                tw, th = int(m["width"]), int(m["height"])
                xs = (np.arange(tw) * sw) // tw
                ys = (np.arange(th) * sh) // th
                resized = img[np.ix_(ys, xs)]
                # container-preserving: a PNG resizes to a PNG, a BMP
                # to a BMP (BMP inputs keep their exact byte path — the
                # registered resize oracle replays it)
                if raw[:8] == _PNG_SIG:
                    blob = png_encode(resized)
                else:
                    blob = bmp_encode(resized)
                contents.append(blob)
                m = dict(m)
                m["n_bytes"] = len(blob)
                metas.append(m)
            yield pdf.assign(content=contents, meta=metas)

    return with_target.mapInPandas(mapper, schema=MEDIA_SCHEMA)


def frame_sample(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plumbing: expand each video row into frame
    timestamps (the decode of each frame is the stubbed step). Pure
    Catalyst sequence-explode — the expansion happens distributed, not
    on the driver."""
    vids = media.filter(F.col("kind") == "video")
    return explode_nonnull(
        vids,
        F.sequence(
            F.lit(0).cast("long"),
            F.col("meta.duration_ms"),
            F.lit(every_ms).cast("long"),
        ),
        "frame_ts_ms",
    ).select("media_id", "frame_ts_ms")

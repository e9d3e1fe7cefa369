"""Multimodal plumbing: binary columns + typed metadata through
mapInPandas. The BMP path is REAL (from-scratch numpy codec); the fake
featurizer covers codec formats whose libraries this container lacks."""

import numpy as np
import pytest

from warp_pipe_spark.datapipe.multimodal import (
    FEATURE_DIM,
    bmp_decode,
    bmp_dims,
    bmp_encode,
    bmp_media,
    decode_media,
    frame_sample,
    media_from_documents,
    resize_media,
    synth_pixels,
)
from warp_pipe_spark.io import read_table


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    return media_from_documents(read_table(spark, sf_dir, "documents").limit(30))


@pytest.fixture(scope="module")
def bmps(spark, sf_dir):
    return bmp_media(read_table(spark, sf_dir, "documents").limit(30))


def test_bmp_codec_roundtrip_local():
    for mid in (0, 3, 13, 42, 499):  # w mod 4 covers every padding case
        w, h = bmp_dims(mid)
        img = synth_pixels(mid, w, h)
        blob = bmp_encode(img)
        assert blob[:2] == b"BM" and len(blob) == 54 + ((3 * w + 3) // 4) * 4 * h
        assert (bmp_decode(blob) == img).all()


def test_bmp_decode_honors_topdown_negative_height():
    import struct

    img = synth_pixels(7, 5, 4)
    blob = bmp_encode(img)
    hdr = bytearray(blob[:54])
    struct.pack_into("<i", hdr, 22, -4)  # negative height = top-down rows
    body = np.frombuffer(blob, np.uint8, offset=54).reshape(4, -1)[::-1].tobytes()
    assert (bmp_decode(bytes(hdr) + body) == img).all()


def test_real_decode_rejects_non_bmp(media):
    # media_from_documents content is raw text bytes, not BMP — the real
    # decoder must fail loudly, not fabricate features.
    with pytest.raises(Exception, match="not a BMP"):
        decode_media(media, fake=False).collect()


def test_real_decode_end_to_end(bmps):
    rows = {r["media_id"]: r for r in decode_media(bmps, fake=False).collect()}
    assert len(rows) == 30
    for mid, r in rows.items():
        w, h = bmp_dims(mid)
        f = r["features"]
        assert (f[0], f[1], f[2]) == (w, h, w * h)
        s = synth_pixels(mid, w, h).reshape(-1, 3).sum(axis=0)
        assert (f[3], f[4], f[5]) == tuple(float(x) for x in s)


def test_avg_hash_matches_direct_computation(bmps):
    """Every bit of the packed hash equals the formula computed
    straight from synth_pixels, and a one-pixel-off image lands within
    a small Hamming distance of the original (the near-dup property
    the hash exists for)."""
    from warp_pipe_spark.datapipe.multimodal import avg_hash

    rows = {r["media_id"]: r for r in avg_hash(bmps).collect()}
    assert len(rows) == 30
    for mid, r in rows.items():
        w, h = bmp_dims(mid)
        gray = synth_pixels(mid, w, h).astype(np.int64).sum(axis=2)
        ys = (np.arange(8) * h) // 8
        xs = (np.arange(8) * w) // 8
        cells = gray[np.ix_(ys, xs)].ravel()
        tot = int(cells.sum())
        want = 0
        for i, c in enumerate(cells):
            if 64 * int(c) > tot:
                want |= 1 << i
        assert (r["hash_hi"], r["hash_lo"]) == (want >> 32, want & 0xFFFFFFFF)
        assert (r["width"], r["height"]) == (w, h)

    # near-dup property, computed locally with the same cell math
    img = synth_pixels(7, *bmp_dims(7)).astype(np.int64)
    tweaked = img.copy()
    tweaked[0, 0, 0] += 1  # one channel of one pixel

    def local_hash(px):
        g = px.sum(axis=2)
        hh, ww = g.shape
        cs = g[np.ix_((np.arange(8) * hh) // 8, (np.arange(8) * ww) // 8)].ravel()
        t = int(cs.sum())
        return sum(1 << i for i, c in enumerate(cs) if 64 * int(c) > t)

    hamming = bin(local_hash(img) ^ local_hash(tweaked)).count("1")
    assert hamming <= 2


def test_real_resize_end_to_end(bmps):
    resized = resize_media(bmps, max_width=8, max_height=8, fake=False)
    out = {r["media_id"]: r for r in resized.collect()}
    for mid, r in out.items():
        sw, sh = bmp_dims(mid)
        tw, th = r["meta"]["width"], r["meta"]["height"]
        assert tw <= 8 and th <= 8
        assert r["meta"]["n_bytes"] == len(r["content"])
        img = bmp_decode(bytes(r["content"]))
        assert img.shape == (th, tw, 3)
        # nearest-neighbor: every output pixel equals its source pixel
        src = synth_pixels(mid, sw, sh)
        xs = (np.arange(tw) * sw) // tw
        ys = (np.arange(th) * sh) // th
        assert (img == src[np.ix_(ys, xs)]).all()


def test_fake_decode_schema_and_determinism(media):
    out = decode_media(media, fake=True)
    rows = out.collect()
    assert len(rows) == 30
    for r in rows:
        assert len(r["features"]) == FEATURE_DIM
        assert all(0.0 <= f < 1.0 for f in r["features"])
        assert len(r["content_md5"]) == 32
        assert r["n_bytes"] > 0
    # deterministic: same input → same features
    again = {r["media_id"]: r["features"] for r in decode_media(media, fake=True).collect()}
    assert {r["media_id"]: r["features"] for r in rows} == again


def test_binary_roundtrip_preserves_bytes(spark, media):
    row = media.filter("media_id = 0").collect()[0]
    assert isinstance(row["content"], (bytes, bytearray))
    assert row["meta"]["n_bytes"] == len(row["content"])


def test_frame_sample_counts(media):
    frames = frame_sample(media, every_ms=1000)
    got = frames.groupBy("media_id").count().collect()
    metas = {r["media_id"]: r["meta"]["duration_ms"] for r in media.collect()}
    for r in got:
        assert r["count"] == metas[r["media_id"]] // 1000 + 1


def test_resize_caps_dims_preserving_aspect(spark, media):
    out = {r["media_id"]: r for r in resize_media(media, 100, 100, fake=True).collect()}
    src = {r["media_id"]: r for r in media.collect()}
    for mid, r in out.items():
        w, h = r["meta"]["width"], r["meta"]["height"]
        assert w <= 100 and h <= 100
        sw, sh = src[mid]["meta"]["width"], src[mid]["meta"]["height"]
        if sw <= 100 and sh <= 100:  # no upscaling
            assert (w, h) == (sw, sh)
        assert bytes(r["content"]) == bytes(src[mid]["content"])  # stub passthrough


def test_wav_codec_roundtrip_and_chunk_walk():
    import struct

    import numpy as np

    from warp_pipe_spark.datapipe.multimodal import (
        synth_samples,
        wav_decode,
        wav_dims,
        wav_encode,
    )

    for mid in (0, 1, 13, 499):
        s = synth_samples(mid, wav_dims(mid))
        rate, back = wav_decode(wav_encode(s))
        assert rate == 8000 and (back == s).all()
    # parser walks chunks: an extra chunk before `data` must be skipped
    s = synth_samples(7, 10)
    blob = wav_encode(s)
    fmt_chunk = blob[12:36]  # 'fmt ' + size + 16 body bytes
    extra = b"LIST" + struct.pack("<I", 4) + b"INFO"
    data_chunk = blob[36:]
    n = len(blob) - 8 + len(extra)
    rebuilt = b"RIFF" + struct.pack("<I", n) + b"WAVE" + fmt_chunk + extra + data_chunk
    rate, back = wav_decode(rebuilt)
    assert rate == 8000 and (back == s).all()

    with pytest.raises(ValueError, match="not a RIFF"):
        wav_decode(b"nope")


def test_audio_decode_end_to_end(spark, sf_dir):
    import numpy as np

    from warp_pipe_spark.datapipe.multimodal import (
        decode_audio,
        synth_samples,
        wav_dims,
        wav_media,
    )
    from warp_pipe_spark.io import read_table

    docs = read_table(spark, sf_dir, "documents").limit(20)
    rows = {r["media_id"]: r for r in decode_audio(wav_media(docs)).collect()}
    assert len(rows) == 20
    for mid, r in rows.items():
        v = synth_samples(mid, wav_dims(mid)).astype("int64")
        assert r["n_samples"] == len(v) and r["sample_rate"] == 8000
        assert r["sum_abs"] == int(abs(v).sum())
        assert r["n_zero_cross"] == int(((v[:-1] * v[1:]) < 0).sum())


def test_video_demux_and_frame_decode(spark, sf_dir):
    import numpy as np

    from warp_pipe_spark.datapipe.multimodal import (
        bmp_encode,
        extract_frames,
        split_bmp_stream,
        synth_pixels,
        video_dims,
        video_media,
    )
    from warp_pipe_spark.io import read_table

    # demux walks declared sizes, rejects garbage
    frames = [bmp_encode(synth_pixels(s, 5, 4)) for s in (1, 2, 3)]
    stream = b"".join(frames)
    assert split_bmp_stream(stream) == frames
    with pytest.raises(ValueError, match="magic"):
        split_bmp_stream(stream + b"XX")

    docs = read_table(spark, sf_dir, "documents").limit(15)
    out = extract_frames(video_media(docs)).collect()
    got = {(r["media_id"], r["frame_idx"]): r for r in out}
    for mid in range(15):
        nf, w, h = video_dims(mid)
        assert sum(1 for k in got if k[0] == mid) == nf
        r = got[(mid, nf - 1)]  # last frame decodes with its own seed
        img = synth_pixels(mid * 1000 + nf - 1, w, h)
        s = img.reshape(-1, 3).sum(axis=0)
        assert (r["width"], r["height"]) == (w, h)
        assert (r["sum_r"], r["sum_g"], r["sum_b"]) == tuple(int(x) for x in s)

    # every_n subsampling
    sub = extract_frames(video_media(docs), every_n=2).collect()
    assert all(r["frame_idx"] % 2 == 0 for r in sub)


def test_audio_frame_features_partition_the_signal(spark):
    """Frames must partition the clip exactly: per-frame counts sum to
    n_samples, per-frame energy/abs-mass sum to the whole-clip values
    computed independently from the synth arithmetic, and only the
    last frame may be short."""
    import numpy as np

    from warp_pipe_spark.datapipe.multimodal import (
        audio_frame_features,
        synth_samples,
        wav_dims,
        wav_media,
    )

    docs = spark.createDataFrame([(3,), (7,)], "doc_id LONG")
    rows = audio_frame_features(wav_media(docs), frame=100).collect()
    by_media = {}
    for r in rows:
        by_media.setdefault(r["media_id"], []).append(r)
    for mid, rs in by_media.items():
        n = wav_dims(mid)
        v = synth_samples(mid, n).astype(np.int64)
        rs = sorted(rs, key=lambda r: r["frame_id"])
        assert sum(r["n_in_frame"] for r in rs) == n
        assert sum(r["energy"] for r in rs) == int((v * v).sum())
        assert sum(r["sum_abs"] for r in rs) == int(np.abs(v).sum())
        assert all(r["n_in_frame"] == 100 for r in rs[:-1])
        assert [r["frame_id"] for r in rs] == list(range(len(rs)))


def test_image_tile_features_partition_the_image(spark):
    """Tiles must partition each image exactly: per-tile pixel counts
    sum to w·h and per-channel sums to the whole-image sums computed
    independently from the synth arithmetic; ragged edges keep partial
    tiles."""
    import numpy as np

    from warp_pipe_spark.datapipe.multimodal import (
        bmp_dims,
        bmp_media,
        image_tile_features,
        synth_pixels,
    )

    docs = spark.createDataFrame([(5,), (10,)], "doc_id LONG")
    rows = image_tile_features(bmp_media(docs), tile=4).collect()
    by_media = {}
    for r in rows:
        by_media.setdefault(r["media_id"], []).append(r)
    for mid, rs in by_media.items():
        w, h = bmp_dims(mid)
        px = synth_pixels(mid, w, h).astype(np.int64)
        assert sum(r["n_px"] for r in rs) == w * h
        for ci, col in enumerate(("sum_r", "sum_g", "sum_b")):
            assert sum(r[col] for r in rs) == int(px[..., ci].sum())
        assert len(rs) == -(-w // 4) * -(-h // 4)  # ceil(w/4)*ceil(h/4)


def test_video_frame_diffs_match_numpy_replay(spark):
    """Per-pair channel diffs must equal the numpy replay of the
    synthetic frame arithmetic, with exactly n_frames-1 rows per
    video."""
    import numpy as np

    from warp_pipe_spark.datapipe.multimodal import (
        synth_pixels,
        video_dims,
        video_frame_diffs,
        video_media,
    )

    docs = spark.createDataFrame([(4,), (9,)], "doc_id LONG")
    rows = video_frame_diffs(video_media(docs)).collect()
    by_media = {}
    for r in rows:
        by_media.setdefault(r["media_id"], []).append(r)
    for mid, rs in by_media.items():
        nf, w, h = video_dims(mid)
        assert len(rs) == nf - 1
        for r in sorted(rs, key=lambda r: r["frame_idx"]):
            f = r["frame_idx"]
            a = synth_pixels(mid * 1000 + f - 1, w, h).astype(np.int64)
            b = synth_pixels(mid * 1000 + f, w, h).astype(np.int64)
            d = np.abs(b - a)
            assert (r["n_px"], r["diff_r"], r["diff_g"], r["diff_b"]) == (
                w * h,
                int(d[..., 0].sum()),
                int(d[..., 1].sum()),
                int(d[..., 2].sum()),
            )


def test_decoders_fail_loud_on_malformed_bytes():
    """Corrupt media bytes must raise immediately with a diagnostic —
    never return garbage pixels/samples (a silent mis-decode poisons
    every stat downstream)."""
    import pytest

    from warp_pipe_spark.datapipe.multimodal import (
        bmp_decode,
        split_bmp_stream,
        wav_decode,
    )

    with pytest.raises(ValueError, match="BM"):
        bmp_decode(b"garbage")
    with pytest.raises(ValueError, match="RIFF"):
        wav_decode(b"garbage")
    with pytest.raises(ValueError):
        bmp_decode(b"")
    with pytest.raises(ValueError):
        split_bmp_stream(b"BMxx")  # truncated header


def test_media_n_bytes_is_byte_length_not_char_length(spark):
    """n_bytes must equal len(content) for non-ASCII text too: char
    length diverges on any multi-byte UTF-8 character."""
    from warp_pipe_spark.datapipe.multimodal import media_from_documents

    docs = spark.createDataFrame(
        [(1, "café déjà vu"), (2, "plain ascii")], "doc_id LONG, text STRING"
    )
    for r in media_from_documents(docs).collect():
        assert r["meta"]["n_bytes"] == len(r["content"]), r


def test_png_round_trip_all_five_filters():
    """Encode with each scanline filter (None/Sub/Up/Average/Paeth),
    decode, require pixel-exact recovery — five forward filters
    proving five inverse filters, not just filter-0 passthrough."""
    from warp_pipe_spark.datapipe.multimodal import (
        png_decode,
        png_encode,
        synth_pixels,
    )

    px = synth_pixels(7, 23, 11)  # odd dims: stride edge cases
    for f in range(5):
        blob = png_encode(px, row_filter=f)
        out = png_decode(blob)
        assert out.shape == (11, 23, 3), f
        assert (out == px).all(), f"filter {f} corrupted pixels"


def test_png_decode_validates_crc_and_signature():
    import struct as _struct

    import pytest as _pytest

    from warp_pipe_spark.datapipe.multimodal import (
        png_decode,
        png_encode,
        synth_pixels,
    )

    blob = bytearray(png_encode(synth_pixels(1, 4, 4)))
    with _pytest.raises(ValueError, match="signature"):
        png_decode(b"\x89PNX" + bytes(blob[4:]))
    # flip one IDAT byte: the chunk CRC must catch it
    idat_at = bytes(blob).index(b"IDAT")
    blob[idat_at + 6] ^= 0xFF
    with _pytest.raises(ValueError, match="CRC"):
        png_decode(bytes(blob))


def test_image_decode_sniffs_bmp_and_png_identically():
    """The same pixels encoded as BMP and as PNG must decode to the
    same array through the magic-sniffing image_decode — which makes
    every image op (avg_hash, tiles, resize) codec-agnostic without
    touching their oracles (BMP inputs keep the BMP path)."""
    from warp_pipe_spark.datapipe.multimodal import (
        bmp_encode,
        image_decode,
        png_encode,
        synth_pixels,
    )

    px = synth_pixels(3, 17, 9)
    assert (image_decode(bmp_encode(px)) == px).all()
    assert (image_decode(png_encode(px, row_filter=4)) == px).all()


def test_avg_hash_is_codec_invariant(spark):
    """avg_hash over a PNG-encoded corpus equals avg_hash over the
    BMP-encoded corpus of the SAME synthetic pixels — the perceptual
    hash sees pixels, never container bytes."""
    import pandas as pd

    from warp_pipe_spark.datapipe.multimodal import (
        avg_hash,
        bmp_dims,
        bmp_encode,
        png_encode,
        synth_pixels,
    )

    rows_bmp, rows_png = [], []
    for mid in range(6):
        w, h = bmp_dims(mid)
        px = synth_pixels(mid, w, h)
        rows_bmp.append((mid, "image", bmp_encode(px)))
        rows_png.append((mid, "image", png_encode(px, row_filter=mid % 5)))
    schema = "media_id LONG, kind STRING, content BINARY"
    got_bmp = {
        r["media_id"]: (r["hash_hi"], r["hash_lo"])
        for r in avg_hash(spark.createDataFrame(rows_bmp, schema)).collect()
    }
    got_png = {
        r["media_id"]: (r["hash_hi"], r["hash_lo"])
        for r in avg_hash(spark.createDataFrame(rows_png, schema)).collect()
    }
    assert got_bmp == got_png and len(got_bmp) == 6


def test_decode_media_real_features_for_png(spark):
    """decode_media(fake=False) now handles PNG blobs: same 8-double
    feature shape, pixel sums equal to the BMP encoding of the same
    image, stride = w*3+1 (filter byte + unpadded RGB row)."""
    from warp_pipe_spark.datapipe.multimodal import (
        bmp_encode,
        decode_media,
        png_encode,
        synth_pixels,
    )

    px = synth_pixels(5, 12, 7)
    df = spark.createDataFrame(
        [
            (1, "image", bmp_encode(px)),
            (2, "image", png_encode(px, row_filter=2)),
        ],
        "media_id LONG, kind STRING, content BINARY",
    )
    out = {
        r["media_id"]: r["features"]
        for r in decode_media(df, fake=False).collect()
    }
    # w, h, n_pixels, sum_r, sum_g, sum_b agree; stride & n_bytes are
    # container-specific
    assert out[1][:6] == out[2][:6]
    assert out[2][6] == 12 * 3 + 1


def test_png_media_decodes_to_the_same_pixels_as_bmp_media(spark):
    """png_media is bmp_media's PNG twin over the same synth_pixels —
    decode_media's replayable feature columns (w, h, channel sums)
    must be identical across the two tables (the queued r12 query's
    contract)."""
    from warp_pipe_spark.datapipe.multimodal import (
        bmp_media,
        decode_media,
        png_media,
    )

    docs = spark.createDataFrame(
        [(i,) for i in range(8)], "doc_id LONG"
    )
    f_bmp = {
        r["media_id"]: r["features"][:6]
        for r in decode_media(bmp_media(docs), fake=False).collect()
    }
    f_png = {
        r["media_id"]: r["features"][:6]
        for r in decode_media(png_media(docs), fake=False).collect()
    }
    assert f_bmp == f_png and len(f_bmp) == 8


def test_resize_media_preserves_the_container(spark):
    """resize_media sniffs the input codec and re-encodes in kind: a
    PNG resizes to a PNG, a BMP to a BMP, with identical pixel
    results across the two containers for the same source image."""
    from warp_pipe_spark.datapipe.multimodal import (
        bmp_encode,
        image_decode,
        png_encode,
        resize_media,
        synth_pixels,
    )

    px = synth_pixels(9, 16, 10)
    rows = [
        (1, "image", bmp_encode(px),
         {"n_bytes": 0, "mime": "image/bmp", "width": 8, "height": 5,
          "duration_ms": 0}),
        (2, "image", png_encode(px, row_filter=3),
         {"n_bytes": 0, "mime": "image/png", "width": 8, "height": 5,
          "duration_ms": 0}),
    ]
    schema = (
        "media_id LONG, kind STRING, content BINARY, "
        "meta STRUCT<n_bytes: LONG, mime: STRING, width: INT, "
        "height: INT, duration_ms: LONG>"
    )
    out = {
        r["media_id"]: bytes(r["content"])
        for r in resize_media(
            spark.createDataFrame(rows, schema), fake=False
        ).collect()
    }
    assert out[1][:2] == b"BM"
    assert out[2][:8] == b"\x89PNG\r\n\x1a\n"
    a, b = image_decode(out[1]), image_decode(out[2])
    assert a.shape == (5, 8, 3)
    assert (a == b).all()

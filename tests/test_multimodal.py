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

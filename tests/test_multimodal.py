"""Multimodal plumbing: binary columns + typed metadata through
mapInPandas; decode stubbed, everything around it real."""

import pytest

from warp_pipe_spark.datapipe.multimodal import (
    FEATURE_DIM,
    decode_media,
    frame_sample,
    media_from_documents,
)
from warp_pipe_spark.io import read_table


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    return media_from_documents(read_table(spark, sf_dir, "documents").limit(30))


def test_real_decode_is_stubbed(media):
    with pytest.raises(NotImplementedError):
        decode_media(media, fake=False)


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
    from warp_pipe_spark.datapipe.multimodal import resize_media

    with pytest.raises(NotImplementedError):
        resize_media(media, fake=False)

    out = {r["media_id"]: r for r in resize_media(media, 100, 100, fake=True).collect()}
    src = {r["media_id"]: r for r in media.collect()}
    for mid, r in out.items():
        w, h = r["meta"]["width"], r["meta"]["height"]
        assert w <= 100 and h <= 100
        sw, sh = src[mid]["meta"]["width"], src[mid]["meta"]["height"]
        if sw <= 100 and sh <= 100:  # no upscaling
            assert (w, h) == (sw, sh)
        assert bytes(r["content"]) == bytes(src[mid]["content"])  # stub passthrough

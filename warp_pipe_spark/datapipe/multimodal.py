"""Multimodal columns: image/audio/video as opaque `binary` columns with
typed metadata, processed through Arrow-batched `mapInPandas`.

The decode step is STUBBED (no image/audio libraries in this
container): `decode_media` raises NotImplementedError unless
`fake=True`, in which case a deterministic fake decoder (md5-derived
features) exercises the real Spark plumbing — schema, partitioning, UDF
signature, Arrow batch shape — end to end.

Scale design: media bytes never leave the executor as Python objects
row-at-a-time; they move as Arrow binary batches into a single
mapInPandas pass. Feature outputs are fixed-width arrays so downstream
ops (ANN over features) reuse the similarity operators unchanged.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

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
            F.length(F.col("text")).cast("long").alias("n_bytes"),
            F.concat(F.lit("application/x-fake-"), kind).alias("mime"),
            (F.col("doc_id") % 640 + 1).cast("int").alias("width"),
            (F.col("doc_id") % 480 + 1).cast("int").alias("height"),
            (F.col("doc_id") * 40 + 1000).cast("long").alias("duration_ms"),
        ).alias("meta"),
    )


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


def decode_media(media: DataFrame, fake: bool = False) -> DataFrame:
    """Decode / feature-extract media content → FEATURES_SCHEMA.

    Real decode requires image/audio libs absent from this container —
    raises NotImplementedError unless fake=True. The fake path runs the
    identical mapInPandas plumbing with the deterministic featurizer.
    """
    if not fake:
        raise NotImplementedError(
            "real media decode needs PIL/librosa/ffmpeg (not in container); "
            "call with fake=True for the deterministic test featurizer"
        )

    def mapper(batches):
        import pandas as pd

        for pdf in batches:
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(c) for c in pdf["content"]],
                    "content_md5": [hashlib.md5(bytes(c)).hexdigest() for c in pdf["content"]],
                    "features": [_fake_features(bytes(c)) for c in pdf["content"]],
                }
            )
            yield out

    return media.mapInPandas(mapper, schema=FEATURES_SCHEMA)


def resize_media(
    media: DataFrame, max_width: int = 256, max_height: int = 256, fake: bool = False
) -> DataFrame:
    """Image-resize plumbing: recompute target dimensions (aspect-ratio
    preserving, JVM-side arithmetic) and push the pixel work through the
    same Arrow mapInPandas boundary as decode. The pixel transform is
    the stubbed step (needs PIL); fake=True passes bytes through
    untouched while exercising the full batch path with the resized
    metadata — schema out == schema in (MEDIA_SCHEMA)."""
    if not fake:
        raise NotImplementedError(
            "real resize needs PIL (not in container); call with fake=True "
            "for the metadata-only pass-through"
        )
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
            # stub: real impl decodes pdf["content"], resizes to the
            # meta dims, re-encodes. Bytes pass through unchanged.
            yield pdf

    return with_target.mapInPandas(mapper, schema=MEDIA_SCHEMA)


def frame_sample(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plumbing: expand each video row into frame
    timestamps (the decode of each frame is the stubbed step). Pure
    Catalyst sequence-explode — the expansion happens distributed, not
    on the driver."""
    vids = media.filter(F.col("kind") == "video")
    return vids.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0).cast("long"), F.col("meta.duration_ms"), F.lit(every_ms).cast("long"))
        ).alias("frame_ts_ms"),
    )

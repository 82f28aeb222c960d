"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata (task directive).

The decode/feature kernels themselves are STUBBED (the container has no
image/audio libraries — they raise NotImplementedError unless a library is
importable, with a deterministic fake available for tests), but the
Spark-side machinery is real and tested: schemas, Arrow batch shapes,
``mapInPandas`` iteration, partition sizing.

Design for 100 TB: media bytes never shuffle — decode/feature UDFs run
where the scan runs (mapInPandas over the parquet row groups); only the
small typed metadata/features move afterwards.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

FEATURES = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
        T.StructField("status", T.StringType(), False),
    ]
)


def _decode_image(payload: bytes, deterministic_fake: bool):
    """Stub: real decode needs PIL/cv2 (absent here)."""
    try:
        import PIL.Image  # noqa: F401
    except ImportError:
        if not deterministic_fake:
            raise NotImplementedError(
                "image decode requires PIL/cv2 (not in this container); "
                "pass deterministic_fake=True for the test path"
            )
        # deterministic fake: dims/features derived from payload bytes only
        n = len(payload or b"")
        w, h = 16 + n % 64, 16 + (n // 64) % 64
        feat = [float((payload[i % max(1, n)] if n else 0)) / 255.0 for i in range(8)]
        return w, h, feat
    raise NotImplementedError("real PIL path not wired in-sandbox")


def extract_media_features(df: DataFrame, deterministic_fake: bool = True) -> DataFrame:
    """mapInPandas media feature extraction — batch-shaped like production
    (one Arrow batch of payloads in, one slim feature frame out)."""

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                payload = r["payload"]
                try:
                    if r["kind"] == "image":
                        w, h, feat = _decode_image(payload, deterministic_fake)
                        rows.append(
                            dict(media_id=r["media_id"], kind=r["kind"],
                                 n_bytes=len(payload or b""), width=w, height=h,
                                 feature=feat, status="ok")
                        )
                    else:  # audio/video: byte-level metadata only (stub)
                        rows.append(
                            dict(media_id=r["media_id"], kind=r["kind"],
                                 n_bytes=len(payload or b""), width=None,
                                 height=None, feature=None, status="stub")
                        )
                except NotImplementedError:
                    rows.append(
                        dict(media_id=r["media_id"], kind=r["kind"],
                             n_bytes=None, width=None, height=None,
                             feature=None, status="no_decoder")
                    )
            yield pd.DataFrame(rows, columns=list(FEATURES.fieldNames()))

    return df.mapInPandas(_run, schema=FEATURES)


def media_from_images(extracted: DataFrame) -> DataFrame:
    """Bridge: the crawl output's image-URL arrays as a media table
    (payload deferred — a fetch stage would fill it; kept NULL here)."""
    return (
        extracted.select(F.explode("images").alias("src"))
        .withColumn("media_id", F.xxhash64("src"))
        .select(
            "media_id",
            F.lit("image").alias("kind"),
            F.lit(None).cast("binary").alias("payload"),
            F.when(F.col("src").endswith(".png"), "image/png")
            .when(F.col("src").endswith(".gif"), "image/gif")
            .otherwise("image/jpeg")
            .alias("mime"),
            F.create_map(F.lit("src"), F.col("src")).alias("meta"),
        )
    )

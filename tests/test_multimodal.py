"""Multimodal plumbing tests: schemas/batching real, decode stubbed."""

from pyspark.sql import functions as F

from politics_crawler_spark.operators.multimodal import (
    MEDIA,
    extract_media_features,
    media_from_images,
)


def _media_df(spark):
    rows = [
        {"media_id": 1, "kind": "image", "payload": b"\x89PNG" + b"x" * 100,
         "mime": "image/png", "meta": {"src": "a"}},
        {"media_id": 2, "kind": "image", "payload": b"\xff\xd8" + b"y" * 37,
         "mime": "image/jpeg", "meta": {"src": "b"}},
        {"media_id": 3, "kind": "audio", "payload": b"RIFF" + b"z" * 10,
         "mime": "audio/wav", "meta": {}},
        {"media_id": 4, "kind": "video", "payload": None, "mime": None, "meta": None},
    ]
    return spark.createDataFrame(rows, schema=MEDIA)


def test_feature_extraction_deterministic_fake(spark):
    out = extract_media_features(_media_df(spark), deterministic_fake=True)
    rows = {r.media_id: r for r in out.collect()}
    assert rows[1].status == "ok" and rows[1].width > 0 and len(rows[1].feature) == 8
    assert rows[2].status == "ok" and rows[2].n_bytes == 39
    assert rows[3].status == "stub" and rows[3].feature is None
    assert rows[4].status == "stub" and rows[4].n_bytes == 0
    # deterministic: same input → same features
    again = {r.media_id: r for r in extract_media_features(_media_df(spark)).collect()}
    assert again[1].feature == rows[1].feature


def test_media_from_images_bridge(spark):
    ext = spark.createDataFrame(
        [(["https://x/a.png", "https://x/b.gif", "https://x/c.jpg"],)],
        "images array<string>",
    )
    media = media_from_images(ext)
    rows = sorted(media.collect(), key=lambda r: r.meta["src"])
    assert [r.mime for r in rows] == ["image/png", "image/gif", "image/jpeg"]
    assert all(r.payload is None and r.kind == "image" for r in rows)

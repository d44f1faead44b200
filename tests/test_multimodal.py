"""Multimodal column plumbing — SURVEY.md §2.11 #75.

No media libraries exist in this container (policy: decode resolves
via import-try, falls back to a marked deterministic fake), so these
pin the REAL parts: schema, validation, Arrow batch shape, metadata
flow, and frame-sampling row algebra.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from zmaxion_spark.functions import multimodal as M


def _media_df(spark):
    rows = [
        (1, "mem://a", "image/png", b"xxxx", {"lang": "en"}),
        (2, "mem://b", "video/mp4", None, {"n_frames": "12"}),
        (3, "mem://c", "video/mp4", None, {"n_frames": "3"}),
        (4, None, "application/pdf", b"zz", {}),
        (5, None, "image/png", None, {}),
    ]
    df = spark.createDataFrame(
        rows, "id long, uri string, mime string, payload binary, meta map<string,string>"
    )
    return df.select(
        "id",
        M.media_struct(
            F.col("uri"), F.col("mime"), F.col("payload"), F.col("meta")
        ).alias("media"),
    )


def test_media_schema_is_the_declared_struct(spark):
    df = _media_df(spark)
    assert df.schema["media"].dataType == M.MEDIA_SCHEMA


def test_validate_media(spark):
    got = {
        r.id: r.ok
        for r in _media_df(spark)
        .select("id", M.validate_media(F.col("media")).alias("ok"))
        .collect()
    }
    # 4: unknown mime; 5: neither bytes nor uri.
    assert got == {1: True, 2: True, 3: True, 4: False, 5: False}


def test_sample_frames_row_algebra(spark):
    out = M.sample_frames(_media_df(spark), "media", every_n=5)
    got = sorted((r.id, r.frame_idx) for r in out.collect())
    # id=2: 12 frames -> 0,5,10; id=3: 3 frames -> 0; non-video dropped.
    assert got == [(2, 0), (2, 5), (2, 10), (3, 0)]


def test_resize_marks_fake_decode_without_pil(spark):
    out = M.resize_images(_media_df(spark), "media", 32, 32)
    metas = {r.id: dict(r.media.meta) for r in out.collect()}
    assert metas[1]["resized_to"] == "32x32"
    assert metas[1]["decode"] == "fake"  # no PIL in this container
    assert "resized_to" not in metas[2]  # video untouched

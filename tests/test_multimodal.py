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


# ---------------------------------------------------------------------------
# Baseline JPEG codec (functions/media_jpeg.py) — round-8, VERDICT r7 #4
# ---------------------------------------------------------------------------


def test_jpeg_dc_roundtrip_closed_form():
    from zmaxion_spark.functions import media_jpeg as J

    w, h, seed = 32, 24, 113
    d = J.decode_jpeg(J.synthesize_jpeg_dc(w, h, seed))
    bw, bh = w // 8, h // 8
    exp_total = sum(
        64 * (2 * J.jpeg_dc_value(seed, bx, by) + 128)
        for by in range(bh)
        for bx in range(bw)
    )
    assert d["width"] == w and d["height"] == h and d["n_components"] == 1
    assert d["mean_luma"] == exp_total // (w * h)
    assert d["coef_l1"] == sum(
        16 * abs(J.jpeg_dc_value(seed, bx, by))
        for by in range(bh)
        for bx in range(bw)
    )


def test_jpeg_ac_rle_and_eob():
    from zmaxion_spark.functions import media_jpeg as J

    w, h, seed = 16, 16, 201
    d = J.decode_jpeg(J.synthesize_jpeg_ac(w, h, seed))
    exp = 0
    for by in range(h // 8):
        for bx in range(w // 8):
            a5, a20 = J.jpeg_ac_values(seed, bx, by)
            exp += 16 * (abs(J.jpeg_dc_value(seed, bx, by)) + abs(a5) + abs(a20))
    assert d["coef_l1"] == exp


def test_jpeg_color_interleave_predictors():
    from zmaxion_spark.functions import media_jpeg as J

    w, h, seed = 24, 8, 55
    d = J.decode_jpeg(J.synthesize_jpeg_color(w, h, seed))
    assert d["n_components"] == 3
    exp = sum(
        16 * abs(J.jpeg_dc_value(seed + 97 * c, bx, by))
        for bx in range(w // 8)
        for by in range(h // 8)
        for c in range(3)
    )
    assert d["coef_l1"] == exp


def test_jpeg_byte_stuffing_survives():
    # Seeds that force 0xFF bytes in the entropy stream round-trip:
    # sweep enough seeds that stuffing statistically must occur.
    from zmaxion_spark.functions import media_jpeg as J

    hits = 0
    for seed in range(120):
        p = J.synthesize_jpeg_ac(16, 8, seed)
        scan = p[p.index(b"\xff\xda") + 2 :]
        if b"\xff\x00" in scan:
            hits += 1
        d = J.decode_jpeg(p)
        assert d["width"] == 16
    assert hits > 0  # stuffing path actually exercised


def test_jpeg_dri_restart_markers_roundtrip():
    # DRI + RSTn path (ADVICE r8 #4): restart markers byte-align the
    # stream and reset the DC predictor; decoded features must equal
    # the no-restart synthesis of the same (w, h, seed).
    from zmaxion_spark.functions import media_jpeg as J

    w, h, seed = 40, 24, 77  # 15 MCUs
    base = J.decode_jpeg(J.synthesize_jpeg_dc(w, h, seed))
    for ri in (1, 2, 4, 7):  # includes intervals not dividing 15
        p = J.synthesize_jpeg_dri(w, h, seed, ri)
        scan = p[p.index(b"\xff\xda") + 2 :]
        assert any(
            bytes([0xFF, 0xD0 + k]) in scan for k in range(8)
        ), f"no RST marker emitted at interval {ri}"
        d = J.decode_jpeg(p)
        assert d == base, f"DRI interval {ri} diverged: {d} vs {base}"


def test_jpeg_truncated_stream_fails_loudly():
    # A non-stuffed 0xFF mid-entropy must pad with 1-bits WITHOUT
    # consuming the marker; exhausting padding raises instead of
    # reading the marker code byte (e.g. 0xD9) as entropy data.
    import pytest

    from zmaxion_spark.functions import media_jpeg as J

    p = J.synthesize_jpeg_dc(32, 32, 9)
    sos = p.index(b"\xff\xda")
    cut = p[: sos + 20] + b"\xff\xd9"  # truncate entropy, keep EOI
    with pytest.raises((ValueError, IndexError)):
        J.decode_jpeg(cut)


def test_jpeg_rejects_progressive_and_subsampled():
    import pytest

    from zmaxion_spark.functions import media_jpeg as J

    p = bytearray(J.synthesize_jpeg_dc(8, 8, 1))
    i = bytes(p).index(b"\xff\xc0")
    p[i + 1] = 0xC2  # SOF2: progressive
    with pytest.raises(NotImplementedError):
        J.decode_jpeg(bytes(p))

    p = bytearray(J.synthesize_jpeg_color(8, 8, 1))
    i = bytes(p).index(b"\xff\xc0")
    p[i + 11] = 0x22  # 4:2:0 sampling on component 1
    with pytest.raises(NotImplementedError):
        J.decode_jpeg(bytes(p))

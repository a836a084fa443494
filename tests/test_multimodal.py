"""Multimodal column plumbing tests (decode kernel stubbed — the Spark-side
schema/batching/partitioning is what's under test)."""

import pytest
from pyspark.sql import Row

from glamr_omics_pipelines_spark.operators import multimodal


def _media(spark):
    rows = [
        Row(media_id=1, media_type="image", content=bytes([1, 2, 3, 4]),
            meta=Row(width=2, height=2, duration_ms=None, codec="png")),
        Row(media_id=2, media_type="image", content=bytes([9, 9, 9, 9]),
            meta=Row(width=2, height=2, duration_ms=None, codec="png")),
        Row(media_id=3, media_type="video", content=b"\x00",
            meta=Row(width=64, height=64, duration_ms=3500, codec="h264")),
    ]
    return spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)


def test_extract_image_features_stub(spark):
    df = _media(spark)
    out = multimodal.extract_image_features(df, feature_dim=4).collect()
    by_id = {r["media_id"]: r for r in out}
    assert len(by_id[1]["feature"]) == 4
    assert by_id[1]["decode_ok"] == "ok"
    # deterministic in content
    assert abs(sum(by_id[1]["feature"]) - 1.0) < 1e-6


def test_extract_image_features_real_decode_raises(spark):
    df = _media(spark)
    with pytest.raises(Exception):
        multimodal.extract_image_features(df, stub=False).collect()


def test_sample_video_frames(spark):
    df = _media(spark)
    out = multimodal.sample_video_frames(df, every_ms=1000).collect()
    got = sorted(r["frame_ts_ms"] for r in out)
    assert got == [0, 1000, 2000, 3000]


def test_resize_images_stub_batch_shape(spark):
    from glamr_omics_pipelines_spark.operators import multimodal as M
    rows = [(1, bytearray(b"abcdef")), (2, None), (3, bytearray(b"x"))]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    out = {r.media_id: r for r in M.resize_images(df, 4, 2).collect()}
    assert len(out[1].content) == 8 and out[1].resize_ok == "ok"
    assert out[1].width == 4 and out[1].height == 2
    assert out[2].content is None and out[2].resize_ok == "null_content"
    assert out[3].content == b"x" * 8      # short blob cycled to target size


def test_extract_audio_windows_explodes_and_computes_rms(spark):
    rows = [
        Row(media_id=10, media_type="audio", content=bytes([3] * 5),
            meta=Row(width=None, height=None, duration_ms=5000, codec="wav")),
        Row(media_id=11, media_type="audio", content=None,
            meta=Row(width=None, height=None, duration_ms=0, codec="wav")),
        Row(media_id=12, media_type="image", content=bytes([1]),
            meta=Row(width=1, height=1, duration_ms=None, codec="png")),
    ]
    df = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    out = multimodal.extract_audio_windows(df, window_bytes=2).collect()
    by = {}
    for r in out:
        by.setdefault(r.media_id, []).append(r)
    # 5 bytes / window 2 -> windows 0,1,2 (sizes 2,2,1); constant byte 3 -> rms 3
    w10 = sorted(by[10], key=lambda r: r.window_idx)
    assert [r.window_idx for r in w10] == [0, 1, 2]
    assert all(abs(r.rms - 3.0) < 1e-12 for r in w10)
    assert by[11][0].decode_ok == "null_content" and by[11][0].rms is None
    assert 12 not in by  # non-audio rows filtered out

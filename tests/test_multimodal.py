"""Multimodal plumbing: binary columns, Arrow-batched decode stages."""

from __future__ import annotations

from pyspark.sql import functions as F

from osprey_spark.operators import multimodal as mm


def _media_df(spark, n=20):
    docs = spark.range(n).select(
        F.col("id").alias("media_id"),
        # deterministic fake payload bytes; null payload on one row
        F.when(F.col("id") == 7, F.lit(None)).otherwise(
            F.concat(F.lit("img-"), F.col("id").cast("string")).cast("binary")
        ).alias("payload"),
    )
    return docs


def test_media_meta_jvm_side(spark):
    df = mm.with_media_meta(_media_df(spark), media_type="image", fmt="png")
    rows = {r.media_id: r.media_meta for r in df.collect()}
    assert rows[0].n_bytes == len(b"img-0")
    assert rows[0].media_type == "image"
    import hashlib

    assert rows[3].checksum == hashlib.md5(b"img-3").hexdigest()
    assert rows[7].n_bytes is None  # null payload propagates


def test_decode_media_schema_and_determinism(spark):
    df = mm.decode_media(_media_df(spark))
    assert "payload" not in df.columns  # bytes dropped after decode
    rows = {r.media_id: r for r in df.collect()}
    r3a = rows[3]
    r3b = {r.media_id: r for r in mm.decode_media(_media_df(spark)).collect()}[3]
    assert (r3a.width, r3a.height, r3a.feature) == (r3b.width, r3b.height, r3b.feature)
    assert 64 <= r3a.width < 256 and len(r3a.feature) == mm.FEATURE_DIM
    assert rows[7].width is None  # failed/null decode survives as nulls


def test_resize_spec(spark):
    df = mm.resize_spec(mm.decode_media(_media_df(spark)), max_side=128)
    for r in df.collect():
        if r.width is None:
            continue
        assert max(r.target_w, r.target_h) <= 128
        if max(r.width, r.height) <= 128:
            assert r.resize_scale == 1.0


def test_frame_sample_plan(spark):
    df = mm.frame_sample_plan(mm.decode_media(_media_df(spark)), every_ms=5000)
    rows = df.groupBy("media_id").count().collect()
    decoded = {r.media_id: r for r in mm.decode_media(_media_df(spark)).collect()}
    for r in rows:
        expect = decoded[r.media_id].duration_ms // 5000 + 1
        assert r["count"] == expect

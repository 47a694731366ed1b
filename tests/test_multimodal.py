"""Multimodal plumbing tests: schemas, batch shapes, determinism, and the
numpy math stages — decode itself is the documented deterministic fake."""

import pyspark.sql.functions as F
import pytest

from text_extensions_for_pandas_spark.operators import multimodal as MM


@pytest.fixture(scope="module")
def assets(spark):
    # synthesize binary assets from document text bytes — deterministic
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    img = docs.filter("doc_id % 3 = 0").select(
        F.col("doc_id").alias("asset_id"),
        F.lit("image").alias("kind"),
        F.encode("text", "utf-8").alias("content"),
        F.struct(
            F.lit(24).alias("width"),
            F.lit(16).alias("height"),
            F.lit(3).alias("channels"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.lit(None).cast("int").alias("n_frames"),
            F.lit("fake/rgb").alias("format"),
        ).alias("meta"),
    )
    aud = docs.filter("doc_id % 3 = 1").select(
        F.col("doc_id").alias("asset_id"),
        F.lit("audio").alias("kind"),
        F.encode("text", "utf-8").alias("content"),
        F.struct(
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("channels"),
            F.lit(8000).alias("sample_rate"),
            F.lit(None).cast("int").alias("n_frames"),
            F.lit("fake/pcm").alias("format"),
        ).alias("meta"),
    )
    vid = docs.filter("doc_id % 3 = 2").select(
        F.col("doc_id").alias("asset_id"),
        F.lit("video").alias("kind"),
        F.encode("text", "utf-8").alias("content"),
        F.struct(
            F.lit(8).alias("width"),
            F.lit(8).alias("height"),
            F.lit(3).alias("channels"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.lit(25).alias("n_frames"),
            F.lit("fake/frames").alias("format"),
        ).alias("meta"),
    )
    return img.unionByName(aud).unionByName(vid).cache()


def test_decode_schema_and_shapes(assets):
    decoded = MM.decode_images(MM.repartition_for_decode(assets))
    rows = decoded.collect()
    assert len(rows) == assets.filter("kind = 'image'").count() > 0
    for r in rows[:5]:
        assert (r.height, r.width, r.channels) == (16, 24, 3)
        assert len(r.pixels) == 16 * 24 * 3


def test_decode_deterministic(assets):
    d1 = {r.asset_id: r.pixels for r in MM.decode_images(assets).collect()}
    d2 = {r.asset_id: r.pixels for r in MM.decode_images(assets).collect()}
    assert d1 == d2


def test_resize(assets):
    resized = MM.resize_images(MM.decode_images(assets), 8, 8)
    rows = resized.collect()
    assert all(len(r.pixels) == 8 * 8 * 3 for r in rows)
    assert {r.asset_id for r in rows} == {
        r.asset_id for r in assets.filter("kind='image'").select("asset_id").collect()
    }


def test_image_features_and_phash_dups(assets):
    feats = MM.image_features(MM.decode_images(assets)).cache()
    rows = feats.collect()
    assert all(0 <= r.mean_r <= 255 and len(r.phash) == 16 for r in rows)
    # identical content -> identical phash -> hamming 0 pair
    doubled = assets.filter("kind='image'").unionByName(
        assets.filter("kind='image'").withColumn(
            "asset_id", F.col("asset_id") + 100000
        )
    )
    dup_feats = MM.image_features(MM.decode_images(doubled))
    pairs = MM.phash_near_dups(dup_feats, max_hamming=0)
    exact = {
        (r.asset_a, r.asset_b) for r in pairs.filter("hamming = 0").collect()
    }
    for r in assets.filter("kind='image'").select("asset_id").collect():
        assert (r.asset_id, r.asset_id + 100000) in exact


def test_audio_features(assets):
    rows = MM.audio_features(assets).collect()
    assert len(rows) == assets.filter("kind='audio'").count() > 0
    for r in rows[:5]:
        assert r.sample_rate == 8000 and 0 < r.rms < 1 and r.n_samples > 0


def test_video_frame_sampling(assets):
    frames = MM.sample_video_frames(assets, every_n=10)
    per_asset = (
        frames.groupBy("asset_id").count().collect()
    )
    # 25 frames, every 10th -> indices 0, 10, 20
    assert per_asset and all(r["count"] == 3 for r in per_asset)
    idx = {r.frame_idx for r in frames.select("frame_idx").distinct().collect()}
    assert idx == {0, 10, 20}

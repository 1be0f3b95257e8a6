"""Multimodal plumbing tests: binary columns, Arrow-batched decode stubs,
frame sampling row expansion."""

from pyspark.sql import functions as F

from tap_postgres_spark import multimodal


def test_media_stats_no_decode(spark):
    media = multimodal.synthesize_media(spark, n=12)
    stats = multimodal.media_stats(media).collect()
    assert len(stats) == 12
    assert all(r["n_bytes"] > 0 for r in stats)
    assert all(len(r["content_sha256"]) == 64 for r in stats)


def test_extract_features_vectorized(spark):
    media = multimodal.synthesize_media(spark, n=12)
    feats = multimodal.extract_features(media).collect()
    assert len(feats) == 12
    assert all(r["decoded"] for r in feats)
    assert all(0 <= r["feat_mean_byte"] <= 255 for r in feats)
    assert all(0 < r["feat_entropy_proxy"] <= 1 for r in feats)
    # deterministic: same seed → same features
    again = multimodal.extract_features(multimodal.synthesize_media(spark, n=12)).collect()
    assert sorted(map(tuple, feats)) == sorted(map(tuple, again))


def test_sample_frames_expands_rows(spark):
    media = multimodal.synthesize_media(spark, n=12)
    frames = multimodal.sample_frames(media, every_ms=500)
    per = (
        frames.groupBy("media_id").agg(F.count("*").alias("n"))
        .join(media.select("media_id", "meta_duration_ms"), "media_id")
        .collect()
    )
    assert per  # only video rows
    for r in per:
        assert r["n"] == max(1, r["meta_duration_ms"] // 500)

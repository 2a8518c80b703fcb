import pytest

from hepcrawl_spark.operators.multimodal import extract_features, synthesize_media


def test_fake_decoder_pipeline(spark):
    media = synthesize_media(spark, n=30)
    feats = extract_features(media, use_fake_decoder=True).collect()
    assert len(feats) == 30
    for r in feats:
        assert r["error"] is None
        assert len(r["feature"]) == 8
        assert r["n_bytes"] > 0
    # determinism
    again = extract_features(synthesize_media(spark, n=30)).collect()
    assert {r["media_id"]: r["feature"] for r in feats} == {
        r["media_id"]: r["feature"] for r in again
    }


def test_real_decoders_stubbed_produce_error_rows(spark):
    media = synthesize_media(spark, n=6)
    feats = extract_features(media, use_fake_decoder=False).collect()
    assert len(feats) == 6
    for r in feats:
        assert r["feature"] is None
        assert r["error"].startswith("NotImplementedError")


def test_no_shuffle_in_feature_extraction(spark):
    from hepcrawl_spark.plans import exchange_count

    media = synthesize_media(spark, n=10)
    feats = extract_features(media)
    assert exchange_count(feats) == 0

"""Multimodal column plumbing: schema, Arrow path, codec stubs."""

import pytest

from declarativeml_spark.operators.multimodal import (
    attach_fake_media,
    decode_features,
    resize_image,
    sample_frames,
)
from declarativeml_spark.sources.catalog import load_table


def test_media_schema_and_metadata(spark, smoke_dir):
    docs = load_table(spark, smoke_dir, "documents").limit(20)
    media = attach_fake_media(docs)
    assert dict(media.dtypes)["payload"] == "binary"
    row = media.select("meta.format", "meta.n_bytes", "payload").first()
    assert row["format"] == "fake/bytes"
    assert row["n_bytes"] == len(row["payload"])


def test_decode_features_batches(spark, smoke_dir):
    docs = load_table(spark, smoke_dir, "documents").limit(50)
    media = attach_fake_media(docs)
    feats = decode_features(media, batch_size=16)
    rows = feats.collect()
    assert len(rows) == 50
    for r in rows:
        assert len(r.features) == 16
        assert sum(r.features) > 0  # counts sum to payload length


def test_real_codecs_are_loud_stubs(spark, smoke_dir):
    docs = load_table(spark, smoke_dir, "documents").limit(1)
    media = attach_fake_media(docs)
    with pytest.raises(NotImplementedError, match="PIL / libav"):
        decode_features(media, codec="jpeg")
    with pytest.raises(NotImplementedError):
        resize_image(media)
    with pytest.raises(NotImplementedError):
        sample_frames(media, codec="h264")

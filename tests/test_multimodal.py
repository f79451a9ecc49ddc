"""Multimodal plumbing: binary payload schema, mapInPandas batching,
deterministic fake decode, strict seam raises."""

import pytest
from pyspark.sql import functions as F

from data_crawler_spark.operators.multimodal import (
    decode_and_featurize,
    frame_sample_plan,
    synth_media_from_documents,
)


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    return synth_media_from_documents(docs)


def test_media_schema(media):
    assert dict(media.dtypes) == {
        "media_id": "bigint", "media_type": "string", "payload": "binary",
        "meta": "struct<n_bytes:bigint,declared_format:string>"}
    r = media.first()
    assert isinstance(r.payload, (bytes, bytearray))
    assert r.meta.n_bytes == len(r.payload)


def test_fake_decode_deterministic(media):
    a = {r.media_id: (r.width, r.height, tuple(r.feature))
         for r in decode_and_featurize(media).collect()}
    b = {r.media_id: (r.width, r.height, tuple(r.feature))
         for r in decode_and_featurize(media).collect()}
    assert a == b
    assert all(len(f) == 8 for (_, _, f) in a.values())
    assert all(abs(sum(f) - 1.0) < 1e-6 for (_, _, f) in a.values())


def test_strict_decode_raises(media):
    with pytest.raises(Exception) as ei:
        decode_and_featurize(media.limit(2), decode="strict").collect()
    assert "NotImplementedError" in str(ei.value) or "real media decoding" in str(ei.value)


def test_frame_sample(media):
    frames = frame_sample_plan(media, every_n=10)
    rows = frames.collect()
    assert rows, "some media rows are videos"
    per = {}
    for r in rows:
        per.setdefault(r.media_id, []).append(r.frame_idx)
    for idxs in per.values():
        assert idxs == sorted(idxs)
        assert all(i % 10 == 0 for i in idxs)

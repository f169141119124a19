from __future__ import annotations

import pytest

from redskins_rule_spark.operators.multimodal import (
    decode_image_meta,
    resize_images,
    sample_frames,
    with_binary_payload,
)


def _docs(spark):
    return spark.createDataFrame(
        [(1, "a" * 100), (2, "b" * 700)], "doc_id long, text string"
    )


def test_payload_and_fake_decode(spark):
    df = with_binary_payload(_docs(spark), "text")
    assert dict(df.dtypes)["payload"] == "binary"
    meta = {r.doc_id: r for r in decode_image_meta(df).collect()}
    assert meta[1].byte_len == 100 and meta[1].width == 101 and meta[1].height == 101
    assert meta[2].byte_len == 700 and meta[2].width == 61 and meta[2].height == 221
    assert meta[1].channels == 3


def test_real_backend_is_explicit_stub(spark):
    df = with_binary_payload(_docs(spark), "text")
    with pytest.raises(Exception, match="NotImplementedError|codec"):
        decode_image_meta(df, decode_backend="real").collect()


def test_resize_stub_shapes(spark):
    df = with_binary_payload(_docs(spark), "text")
    out = resize_images(df, target=(224, 224)).collect()
    assert all(r.width == 224 and r.height == 224 for r in out)
    assert len(out) == 2


def test_sample_frames_one_to_many(spark):
    df = with_binary_payload(_docs(spark), "text")
    out = sample_frames(df, every_n_bytes=64).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert len(by_doc[1]) == 2  # 100 bytes → 2 chunks of ≤64
    assert len(by_doc[2]) == 11  # 700 bytes → 11 chunks
    assert by_doc[1][0].frame_idx == 0 and len(by_doc[1][0].frame_bytes) == 64

"""Multimodal plumbing: binary columns + typed metadata through mapInPandas.

The decode kernels are deterministic fakes (no codecs in the image); what's
under test is the real Spark-side contract — schemas, Arrow batch shapes,
fan-out semantics."""

from __future__ import annotations

import pytest

from evidence_datasource_parsers_spark.operators.multimodal import (
    extract_media_meta,
    pack_blob,
    resize_images,
    sample_frames,
)


def _media(spark):
    rows = [
        (1, pack_blob(0, 640, 480, 3, b"\x01" * 100)),          # image
        (2, pack_blob(1, 0, 0, 1, b"\x02" * 50)),               # audio
        (3, pack_blob(2, 320, 240, 3, b"\x03" * 64)),           # video, 8 frames @8B
        (4, b"not-a-blob"),                                      # corrupt
        (5, None),                                               # null
    ]
    return spark.createDataFrame(rows, "media_id long, blob binary")


def test_extract_media_meta(spark):
    out = {r["media_id"]: r.asDict() for r in extract_media_meta(_media(spark)).collect()}
    assert out[1]["media_type"] == "image" and (out[1]["width"], out[1]["height"]) == (640, 480)
    assert out[2]["media_type"] == "audio"
    assert out[3]["media_type"] == "video" and out[3]["payload_bytes"] == 64
    assert out[4]["media_type"] == "unknown" and out[4]["width"] == -1
    assert out[5]["media_type"] == "unknown"
    # typed schema contract
    assert dict(extract_media_meta(_media(spark)).dtypes) == {
        "media_id": "bigint", "media_type": "string", "width": "int",
        "height": "int", "depth": "int", "payload_bytes": "bigint",
    }


def test_resize_images_fake_kernel(spark):
    out = resize_images(_media(spark), 4, 4)
    rows = {r["media_id"]: r["blob"] for r in out.collect()}
    resized = extract_media_meta(
        spark.createDataFrame([(1, bytes(rows[1]))], "media_id long, blob binary")
    ).collect()[0]
    assert (resized["width"], resized["height"], resized["payload_bytes"]) == (4, 4, 16)
    assert rows[2] is None  # non-images pass through as null


def test_resize_images_real_kernel_is_marked_stub(spark):
    with pytest.raises(Exception, match="NotImplementedError|PIL|decode"):
        resize_images(_media(spark), 4, 4, fake=False).collect()


def test_sample_frames_fanout(spark):
    out = sample_frames(_media(spark), every_n=2, frame_bytes=8).collect()
    # video id=3: 64B payload / 8B frames = 8 frames, every 2nd → 4 rows
    assert len(out) == 4
    assert {r["media_id"] for r in out} == {3}
    assert [r["frame_idx"] for r in sorted(out, key=lambda r: r["frame_idx"])] == [0, 2, 4, 6]
    assert all(len(r["frame"]) == 8 for r in out)


def test_extract_features_shape_and_chain_to_ann(spark):
    """blob → feature vector → similarity search, end-to-end: the feature
    kernel emits array<float> of n_bins+2, deterministic across runs, and the
    output plugs straight into brute_force_topk."""
    from evidence_datasource_parsers_spark.operators.multimodal import (
        extract_features,
    )
    from evidence_datasource_parsers_spark.operators.similarity import (
        brute_force_topk,
    )

    rows = [
        (i, pack_blob(0, 8, 8, 3, bytes([(i * 7 + j) % 256 for j in range(64)])))
        for i in range(10)
    ] + [(99, b"not-a-blob")]
    df = spark.createDataFrame(rows, "media_id long, blob binary")
    feats = extract_features(df)
    got = {r.media_id: r.features for r in feats.collect()}
    assert got[99] is None  # unparseable blob → null features, not a crash
    assert len(got[0]) == 18  # 16 histogram bins + mean + std
    assert abs(sum(got[0][:16]) - 1.0) < 1e-6  # histogram normalized
    rerun = {r.media_id: r.features for r in extract_features(df).collect()}
    assert rerun == got  # deterministic

    valid = feats.where(feats.features.isNotNull())
    q = valid.limit(2).select(
        valid.media_id.alias("query_id"), valid.features.alias("embedding")
    )
    c = valid.select(
        valid.media_id.alias("neighbor_id"), valid.features.alias("embedding")
    )
    topk = brute_force_topk(q, c, k=3, dim=18).collect()
    assert topk and all(r.rank <= 3 for r in topk)

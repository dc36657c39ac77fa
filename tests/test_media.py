"""Multimodal binary-column plumbing (schema, batching, determinism)."""

import pytest

from ontonotes_5_parsing_spark.pipeline.media import (
    audio_features,
    encode_image,
    encode_video,
    image_features,
    media_df,
    resize_images,
    sample_frames,
    _decode_image_bytes,
    _decode_video_bytes,
)


@pytest.fixture(scope="module")
def media(spark):
    return media_df(spark, 30).cache()


def test_media_table_shape(media):
    rows = media.collect()
    assert len(rows) == 30
    kinds = {r.kind for r in rows}
    assert kinds == {"image", "audio", "video"}
    for r in rows:
        assert isinstance(r.payload, (bytes, bytearray))
        assert len(r.payload) > 16


def test_image_features_deterministic(spark, media):
    f1 = {r.media_id: r for r in image_features(media).collect()}
    f2 = {r.media_id: r for r in image_features(media).collect()}
    assert len(f1) == 15  # media_id % 3 != 0 and media_id % 6 != 5
    for mid, r in f1.items():
        assert r.width > 0 and r.height > 0 and r.n_channels == 3
        assert len(r.embedding) == 16
        assert f2[mid].embedding == r.embedding
        assert f2[mid].mean_intensity == r.mean_intensity


def test_audio_features(media):
    feats = audio_features(media).collect()
    assert len(feats) == 10
    for r in feats:
        assert r.sample_rate == 16000
        assert r.n_samples > 0
        assert r.rms > 0
        assert len(r.embedding) == 16


def test_resize_shrinks_payload(spark, media):
    small = {r.media_id: r for r in resize_images(media, max_side=8).collect()}
    orig = {r.media_id: r for r in media.filter("kind='image'").collect()}
    assert set(small) == set(orig)
    for mid in small:
        w, h, c, _ = _decode_image_bytes(bytes(small[mid].payload))
        ow, oh, oc, _ = _decode_image_bytes(bytes(orig[mid].payload))
        assert w <= ow and h <= oh and c == oc
        assert len(small[mid].payload) < len(orig[mid].payload)


def test_real_codec_is_clearly_stubbed():
    with pytest.raises(NotImplementedError):
        _decode_image_bytes(b"\x89PNG\r\n\x1a\nxxxx")


def test_synthetic_codec_roundtrip():
    payload = encode_image(7, 16, 8, 3)
    w, h, c, px = _decode_image_bytes(payload)
    assert (w, h, c) == (16, 8, 3)
    assert len(px) == 16 * 8 * 3


def test_video_codec_roundtrip():
    payload = encode_video(11, 6, 16, 12, fps=10)
    n, w, h, fps, frames = _decode_video_bytes(payload)
    assert (n, w, h, fps) == (6, 16, 12, 10)
    assert frames.shape == (6, 12, 16)


def test_video_frame_sampling(spark, media):
    frames = sample_frames(media, every_k=4).collect()
    video_ids = {r.media_id for r in media.filter("kind='video'").collect()}
    assert video_ids == {5, 11, 17, 23, 29}
    by_vid = {}
    for r in frames:
        by_vid.setdefault(r.media_id, []).append(r)
    assert set(by_vid) == video_ids
    for mid, rows in by_vid.items():
        idxs = sorted(r.frame_idx for r in rows)
        assert idxs[0] == 0 and all(i % 4 == 0 for i in idxs)
        n_frames, w, h, fps, _ = _decode_video_bytes(
            bytes(
                media.filter(f"media_id={mid}").collect()[0].payload
            )
        )
        assert len(rows) == len(range(0, n_frames, 4))
        for r in rows:
            assert (r.width, r.height) == (w, h)
            assert abs(r.ts_offset_sec - round(r.frame_idx / fps, 4)) < 1e-6
            assert len(r.embedding) == 16
    # determinism across a second evaluation
    again = sample_frames(media, every_k=4).collect()
    assert sorted((r.media_id, r.frame_idx, r.mean_intensity) for r in frames) == \
        sorted((r.media_id, r.frame_idx, r.mean_intensity) for r in again)

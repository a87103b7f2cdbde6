"""Multimodal column stages: schema, actor plumbing, deterministic stand-in
decode (real codecs stubbed behind import-try — PillowDecoder)."""

from __future__ import annotations

import numpy as np
import pytest

from jena_ray.stages.multimodal import (
    AudioFrameSample,
    ImageResize,
    MediaFeatures,
    PillowDecoder,
    RawDecoder,
    media_dataset,
    media_features,
    synth_media,
)


def test_synth_media_deterministic():
    a, b = synth_media(8), synth_media(8)
    assert a.equals(b)
    kinds = set(a.column("kind").to_pylist())
    assert kinds == {"image", "audio"}


def test_raw_decoder_roundtrip():
    t = synth_media(4)
    d = RawDecoder()
    row = {c: t.column(c)[0].as_py() for c in t.schema.names}
    arr = d.decode(row["kind"], row["payload"], row["width"], row["height"])
    assert arr.shape == (row["height"], row["width"])
    assert arr.dtype == np.uint8


def test_pillow_decoder_stubbed():
    with pytest.raises(NotImplementedError):
        PillowDecoder()


def test_features_batch():
    t = synth_media(6)
    out = MediaFeatures()(t)
    assert out.num_rows == 6
    assert set(out.schema.names) == {
        "media_id", "kind", "n_samples", "mean", "std", "sum_pixels", "sum_sq",
    }
    assert all(s > 0 for s in out.column("n_samples").to_pylist())


def test_resize_batch():
    t = synth_media(6)
    out = ImageResize(target=8)(t)
    for kind, w, h, payload in zip(
        out.column("kind").to_pylist(),
        out.column("width").to_pylist(),
        out.column("height").to_pylist(),
        out.column("payload").to_pylist(),
    ):
        if kind == "image":
            assert (w, h) == (8, 8)
            assert len(payload) == 64


def test_frame_sample_batch():
    t = synth_media(6)
    out = AudioFrameSample(frame_len=512, hop=512)(t)
    assert out.num_rows > 0
    assert all(len(f) == 512 for f in out.column("frame").to_pylist())
    assert set(out.schema.names) == {"media_id", "frame_offset", "frame"}


def test_media_pipeline(ray_session):
    ds = media_dataset(32)
    out = media_features(ds, concurrency=2, batch_size=8)
    rows = out.take_all()
    assert len(rows) == 32
    # determinism across executions
    rows2 = media_features(media_dataset(32), concurrency=2, batch_size=8).take_all()
    key = lambda r: r["media_id"]
    assert sorted(rows, key=key) == sorted(rows2, key=key)

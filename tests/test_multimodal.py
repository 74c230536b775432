"""Multimodal plumbing: schema, actor stage contract, stubbed decode."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from refimage_ray.stages.multimodal import (
    MEDIA_SCHEMA,
    ImageResize,
    MediaFeatureExtractor,
    frame_sample_plan,
    mime_for,
    synthesize_media,
)


def test_media_schema():
    t = synthesize_media(20)
    assert t.schema.equals(MEDIA_SCHEMA)
    assert synthesize_media(20).equals(t)  # deterministic


def test_mime_lookup_fallback():
    assert mime_for("png") == "image/png"
    assert mime_for(".JPG") == "image/jpeg"
    assert mime_for("weird") == "application/octet-stream"


def test_feature_extractor_stage(ray_session):
    t = synthesize_media(30)
    out = (
        rd.from_arrow(t)
        .map_batches(MediaFeatureExtractor, batch_format="pyarrow",
                     concurrency=2, batch_size=8)
        .to_pandas()
        .sort_values("media_id")
    )
    assert len(out) == 30
    assert "payload" not in out.columns          # wide binary dropped
    feats = np.stack(out["feature"].to_numpy())
    assert feats.shape == (30, 64)
    norms = np.linalg.norm(feats, axis=1)
    assert np.allclose(norms, 1.0, atol=1e-5)
    # deterministic per content: same payload → same feature
    ex = MediaFeatureExtractor()
    a = ex(t.slice(0, 1))["feature"].to_pylist()[0]
    b = ex(t.slice(0, 1))["feature"].to_pylist()[0]
    assert a == b


def test_resize_stub_raises_clearly():
    with pytest.raises(NotImplementedError, match="decode unavailable"):
        ImageResize(64, 64)(synthesize_media(2))


def test_resize_with_injected_fn():
    out = ImageResize(8, 8, resize_fn=lambda p, size: p[:16])(synthesize_media(3))
    assert out["width"].to_pylist() == [8, 8, 8]
    assert all(len(p) == 16 for p in out["payload"].to_pylist())


def test_frame_sample_plan():
    assert frame_sample_plan(10, 3).tolist() == [0, 3, 6, 9]
    assert frame_sample_plan(0, 3).tolist() == []

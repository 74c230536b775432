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


def test_resize_stub_raises_clearly(monkeypatch):
    # force the no-imaging-library environment: in a deployment with
    # Pillow installed the stage would auto-wire instead of raising
    from refimage_ray.stages import multimodal

    monkeypatch.setattr(multimodal, "_probe_pil", lambda: None)
    with pytest.raises(NotImplementedError, match="decode unavailable"):
        ImageResize(64, 64)(synthesize_media(2))


def test_resize_with_injected_fn():
    out = ImageResize(8, 8, resize_fn=lambda p, size: p[:16])(synthesize_media(3))
    assert out["width"].to_pylist() == [8, 8, 8]
    assert all(len(p) == 16 for p in out["payload"].to_pylist())


def test_frame_sample_plan():
    assert frame_sample_plan(10, 3).tolist() == [0, 3, 6, 9]
    assert frame_sample_plan(0, 3).tolist() == []


def _install_fake_pil(monkeypatch):
    """A minimal PIL stand-in: Image.open decodes our fake 'format'
    — payload b'IMG:<w>x<h>:...' — and supports resize/save."""
    import io
    import sys
    import types

    class _FakeImg:
        def __init__(self, w, h):
            self.size = (w, h)
            self.format = "PNG"

        def resize(self, size):
            return _FakeImg(*size)

        def save(self, buf, format="PNG"):
            buf.write(f"IMG:{self.size[0]}x{self.size[1]}:".encode())

    class _FakeImage:
        @staticmethod
        def open(buf):
            head = buf.read(32).decode("latin1")
            assert head.startswith("IMG:")
            dims = head.split(":")[1]
            w, h = dims.split("x")
            return _FakeImg(int(w), int(h))

    pil = types.ModuleType("PIL")
    pil.Image = _FakeImage
    img_mod = types.ModuleType("PIL.Image")
    monkeypatch.setitem(sys.modules, "PIL", pil)
    monkeypatch.setitem(sys.modules, "PIL.Image", img_mod)
    return pil


def test_pil_auto_wires_dimensions_and_resize(monkeypatch):
    """With an importable PIL the stages auto-wire the real decode —
    zero config (reference M1: decode + dimension extraction); the
    loud stub path is untouched when PIL is absent."""
    from refimage_ray.stages.multimodal import ImageDimensions

    _install_fake_pil(monkeypatch)
    t = pa.table({
        "media_id": pa.array([1, 2], pa.int64()),
        "payload": pa.array([b"IMG:640x480:xxxx", b"IMG:32x64:yy"],
                            pa.binary()),
    })
    out = ImageDimensions()(t)
    assert out["width"].to_pylist() == [640, 32]
    assert out["height"].to_pylist() == [480, 64]

    rs = ImageResize(8, 8)(t)
    assert rs["width"].to_pylist() == [8, 8]
    assert all(p.startswith(b"IMG:8x8:") for p in rs["payload"].to_pylist())


def test_dimensions_stub_raises_clearly_without_pil(monkeypatch):
    from refimage_ray.stages import multimodal
    from refimage_ray.stages.multimodal import ImageDimensions

    monkeypatch.setattr(multimodal, "_probe_pil", lambda: None)
    with pytest.raises(NotImplementedError, match="decode unavailable"):
        ImageDimensions()(synthesize_media(2))

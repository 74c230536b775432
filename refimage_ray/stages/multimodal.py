"""Multimodal columns: opaque binary payloads + typed metadata.

The reference is an image store: upload → PIL decode/validate →
dimensions → CLIP features (``/root/reference/src/refimage/
storage.py:190-192``, ``models/clip_model.py:96-142``).  This module
reproduces that *shape* for a Ray pipeline: image/audio/video travel
as ``binary`` columns with metadata; decode / feature-extract /
resize / frame-sample are actor-pool ``map_batches`` stages.

The image/audio libraries are not in this container, so the actual
codec work is STUBBED: ``decode_fn=None`` selects a clearly-marked
deterministic fake (feature = blake2b of the payload bytes expanded
to ``dim`` floats — stable across runs, unique per content, mirrors
the reference's deterministic mock embeddings seeded by
``hash(text)``, ``/root/reference/tests/mocks.py:52-70``).  The Ray
plumbing — schema, batch sizing, actor signature, output layout — is
real and tested; swap in a real codec by passing ``decode_fn``.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),        # image | audio | video
        ("mime_type", pa.string()),
        ("payload", pa.binary()),
        ("n_bytes", pa.int64()),
    ]
)

# format → MIME lookup with octet-stream fallback
# (reference: /root/reference/src/refimage/storage.py:194-202)
MIME_BY_EXT = {
    "jpg": "image/jpeg", "jpeg": "image/jpeg", "png": "image/png",
    "gif": "image/gif", "webp": "image/webp", "wav": "audio/wav",
    "mp3": "audio/mpeg", "mp4": "video/mp4",
}


def mime_for(ext: str) -> str:
    return MIME_BY_EXT.get(ext.lower().lstrip("."), "application/octet-stream")


def _fake_feature(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic stand-in feature: blake2b(payload) expanded to
    ``dim`` float32 in [−1, 1], L2-normalized.  NOT a real model."""
    out = np.empty(dim, dtype=np.float32)
    h = b""
    counter = 0
    raw = bytearray()
    while len(raw) < dim * 4:
        h = hashlib.blake2b(payload + counter.to_bytes(4, "little"),
                            digest_size=32).digest()
        raw.extend(h)
        counter += 1
    u = np.frombuffer(bytes(raw[: dim * 4]), dtype=np.uint32)
    out = (u.astype(np.float64) / 2**31 - 1.0).astype(np.float32)
    n = float(np.linalg.norm(out))
    return out / (n or 1.0)


class MediaFeatureExtractor:
    """Actor-pool stage: payload bytes → fixed-dim feature vector.

    Usage::

        media.map_batches(MediaFeatureExtractor, batch_format="pyarrow",
                          concurrency=(2, 8), batch_size=64, num_cpus=1)

    Small ``batch_size`` on purpose: payloads are wide binary rows
    (SURVEY.md §4.2 memory note).  ``__init__`` is where a real model
    would load once per actor (reference requirement: model "loaded
    once and reused", /root/reference/docs/requirements-spec.md:31).
    """

    def __init__(self, dim: int = 64, decode_fn=None) -> None:
        self.dim = dim
        self.decode_fn = decode_fn  # real codec hook; None → deterministic fake

    def _decode(self, payload: bytes) -> np.ndarray:
        if self.decode_fn is not None:
            return self.decode_fn(payload, self.dim)
        return _fake_feature(payload, self.dim)

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = [self._decode(p) for p in batch["payload"].to_pylist()]
        keep = [c for c in batch.column_names if c != "payload"]
        out = batch.select(keep)
        return out.append_column(
            "feature", pa.array([f.tolist() for f in feats],
                                pa.list_(pa.float32()))
        )


def _probe_pil():
    """Optional-dependency probe: the real imaging backend when PIL is
    importable (the reference's M1 decodes pixels and extracts
    dimensions — ``/root/reference/src/refimage/storage.py:190-192``);
    ``None`` in codec-less environments, where the stages below keep
    their loud injection-hook contract."""
    try:
        from PIL import Image

        return Image
    except ImportError:
        return None


def pil_resize_fn(payload: bytes, size: "tuple[int, int]") -> bytes:
    """``resize_fn`` backed by PIL — auto-wired by :class:`ImageResize`
    when PIL is importable.  Re-encodes in the source format (PNG when
    the decoder reports none)."""
    import io

    from PIL import Image

    img = Image.open(io.BytesIO(payload))
    fmt = img.format or "PNG"
    buf = io.BytesIO()
    img.resize(size).save(buf, format=fmt)
    return buf.getvalue()


def pil_dims_fn(payload: bytes) -> "tuple[int, int]":
    """``dims_fn`` backed by PIL: decode → (width, height), the
    reference-M1 dimension extraction."""
    import io

    from PIL import Image

    return Image.open(io.BytesIO(payload)).size


class ImageDimensions:
    """Actor-pool stage: decode payload → ``width``/``height`` columns
    (reference M1: PIL open + dimension extraction,
    ``storage.py:190-192``).  PIL auto-wires when importable — zero
    config in a real deployment; without it, a ``dims_fn(payload) ->
    (w, h)`` must be injected or the stage raises loudly."""

    def __init__(self, dims_fn=None) -> None:
        if dims_fn is None and _probe_pil() is not None:
            dims_fn = pil_dims_fn
        self.dims_fn = dims_fn

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.dims_fn is None:
            raise NotImplementedError(
                "image decode unavailable in this environment; "
                "install PIL or pass dims_fn=... backed by a real "
                "imaging library"
            )
        dims = [self.dims_fn(p) for p in batch["payload"].to_pylist()]
        w = pa.array([int(d[0]) for d in dims], pa.int32())
        h = pa.array([int(d[1]) for d in dims], pa.int32())
        return batch.append_column("width", w).append_column("height", h)


class ImageResize:
    """Actor-pool stage for image resize.

    PIL auto-wires when importable (:func:`pil_resize_fn`) — a real
    deployment gets reference-M1 behavior with zero config.  Without
    PIL, raises ``NotImplementedError`` unless a ``resize_fn(payload,
    (w, h)) -> bytes`` is supplied (no imaging library in this
    container).  The stage contract (binary in → binary out + new
    width/height metadata) is the tested part either way.
    """

    def __init__(self, width: int, height: int, resize_fn=None) -> None:
        self.size = (width, height)
        if resize_fn is None and _probe_pil() is not None:
            resize_fn = pil_resize_fn
        self.resize_fn = resize_fn

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.resize_fn is None:
            raise NotImplementedError(
                "image decode unavailable in this environment; "
                "install PIL or pass resize_fn=... backed by a real "
                "imaging library"
            )
        payloads = [self.resize_fn(p, self.size) for p in batch["payload"].to_pylist()]
        out = batch.drop_columns(["payload"]).append_column(
            "payload", pa.array(payloads, pa.binary())
        )
        w = pa.array([self.size[0]] * batch.num_rows, pa.int32())
        h = pa.array([self.size[1]] * batch.num_rows, pa.int32())
        return out.append_column("width", w).append_column("height", h)


def frame_sample_plan(
    n_frames: int, every_n: int
) -> np.ndarray:
    """Deterministic frame-sampling plan (video): indices 0, n, 2n…
    Real frame extraction requires a video lib; the plan (and its use
    as a flat-map fan-out factor) is the tested plumbing."""
    return np.arange(0, n_frames, every_n, dtype=np.int64)


def synthesize_media(n_rows: int, seed: int = 42) -> pa.Table:
    """Deterministic fake media table for plumbing tests."""
    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    exts = ["png", "wav", "mp4"]
    payloads = [rng.integers(0, 256, size=int(ln), dtype=np.uint8).tobytes()
                for ln in rng.integers(200, 2000, size=n_rows)]
    return pa.table(
        {
            "media_id": pa.array(range(n_rows), pa.int64()),
            "kind": pa.array([kinds[i % 3] for i in range(n_rows)], pa.string()),
            "mime_type": pa.array([mime_for(exts[i % 3]) for i in range(n_rows)],
                                  pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "n_bytes": pa.array([len(p) for p in payloads], pa.int64()),
        }
    )

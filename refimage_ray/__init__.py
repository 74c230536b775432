"""refimage_ray — a Ray-Data-native full-text retrieval + data-processing engine.

A from-scratch re-expression of the capability graph of the reference
engine (``mako10k/refimage``: ingest → stateful embed → index → top-k
query → metadata join → set-algebra DSL) over web text:

    ingest Parquet pages → extract text (stateful actor pool,
    byte-identical per url) → tokenize → term-sharded shuffle →
    sorted delta+varbyte posting lists with block-max metadata →
    top-k BM25 with bounded heap → metadata join → boolean DSL.

Everything is expressed as ``ray.data.Dataset`` pipelines of
``map_batches`` over zero-copy Arrow batches; actor pools hold
load-once state (reference analog: CLIP model loaded once per process,
``/root/reference/src/refimage/models/clip_model.py:36-83``).

Nothing in this package calls ``ray.init()`` / ``ray.shutdown()`` —
sessions are owned by the driver, ``bench.py`` and the test fixture.
"""

from refimage_ray.config import EngineConfig

__all__ = ["EngineConfig"]
__version__ = "0.1.0"

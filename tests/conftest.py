"""Session-scoped Ray fixture + shared corpus fixtures.

Ray is initialised ONCE per pytest session (driver instruction); any
test that touches a Dataset depends on ``ray_session``.
"""

from __future__ import annotations

import shutil

import pyarrow as pa
import pytest

import ray


@pytest.fixture(scope="session")
def ray_session():
    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def tiny_pages() -> pa.Table:
    from refimage_ray.sources.pages import synthesize_pages

    return synthesize_pages(250, seed=42)


@pytest.fixture(scope="session")
def tiny_docs(tiny_pages) -> pa.Table:
    """pages → docs shape with sequential doc_ids (unit-test corpus)."""
    n = tiny_pages.num_rows
    return pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "text": tiny_pages["text"],
            "url": tiny_pages["url"],
            "lang": tiny_pages["lang"],
        }
    )


@pytest.fixture(scope="session")
def built_index(ray_session, tiny_docs, tmp_path_factory):
    """One shared small index (build is the expensive step)."""
    import ray.data as rd

    from refimage_ray.config import EngineConfig
    from refimage_ray.index.build import build_index

    cfg = EngineConfig(num_shards=8, salt_buckets=4, hot_df_fraction=0.05)
    index_dir = str(tmp_path_factory.mktemp("index") / "idx")
    res = build_index(rd.from_arrow(tiny_docs), index_dir, cfg)
    yield index_dir, cfg, res
    shutil.rmtree(index_dir, ignore_errors=True)


@pytest.fixture(scope="session")
def oracle(tiny_docs):
    from refimage_ray.config import EngineConfig
    from refimage_ray.query.oracle import BM25Oracle

    cfg = EngineConfig(num_shards=8, salt_buckets=4, hot_df_fraction=0.05)
    return BM25Oracle(
        list(zip(range(tiny_docs.num_rows), tiny_docs["text"].to_pylist())), cfg
    )


FIXTURE_QUERIES = [
    "the data join",
    "spark query",
    "merge sort",
    "w050 w100",
    "table scan merge sort fast",
    "stream",
    "a",
    "zzz missing term",
    "cache disk memory net io cpu",
]

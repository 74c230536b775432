"""Capacity planner invariants — the partitioning assumptions held to
by pytest rather than prose."""

import pytest

from refimage_ray.planner import (
    TARGET_PARTITION_POSTINGS, plan_build, plan_dict,
)


def test_plan_monotone_in_corpus_size():
    small = plan_build(1_000_000, 300)
    big = plan_build(1_000_000_000, 300)
    huge = plan_build(10**12, 300)  # the north-star corpus
    assert small.num_shards <= big.num_shards <= huge.num_shards
    assert small.est_reducers <= big.est_reducers <= huge.est_reducers


def test_partitions_stay_in_band():
    """Recommended layouts keep p50 partition size in the 0.5-4M band
    across 6 orders of magnitude of corpus size — no reducer drowns,
    no task-overhead swamp."""
    for n_docs in (10**6, 10**8, 10**10, 10**12):
        p = plan_build(n_docs, 300, nodes=256, cpus_per_node=32)
        assert p.est_partition_postings_p50 <= 4 * TARGET_PARTITION_POSTINGS
        # tiny corpora on huge clusters legitimately under-fill
        if p.est_postings > p.est_reducers * TARGET_PARTITION_POSTINGS // 2:
            assert p.est_partition_postings_p50 >= TARGET_PARTITION_POSTINGS // 4


def test_reducers_scale_with_cluster():
    """The parallelism floor binds the shards x salt PRODUCT (reduce
    tasks), not shards alone."""
    one = plan_build(10**6, 50, nodes=1)
    many = plan_build(10**6, 50, nodes=256)
    assert many.est_reducers >= one.est_reducers
    assert many.est_reducers >= 2 * 256 * 32


def test_hot_skew_bound():
    """The salted worst case (a df=N stopword) never exceeds ~2x the
    partition target per reducer."""
    for n_docs in (10**7, 10**9, 10**11):
        p = plan_build(n_docs, 300)
        assert n_docs / p.salt_buckets <= 4 * TARGET_PARTITION_POSTINGS \
            or p.salt_buckets == 8192  # capped: documented residual skew


def test_exchange_mode_by_universe_size():
    """Rank exchange only while the (doc_id, dl) universe is
    broadcastable; absolute-id pack beyond."""
    assert plan_build(10**6, 300).exchange == "rank"
    assert plan_build(10**9, 300).exchange == "absolute"


def test_plan_dict_roundtrip_and_validation():
    d = plan_dict(plan_build(1000, 50))
    assert d["n_docs"] == 1000 and isinstance(d["notes"], list)
    with pytest.raises(ValueError):
        plan_build(0, 10)

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


# ---------------------------------------------------------------------------
# plan_mixture (data-constrained allocation)
# ---------------------------------------------------------------------------

def test_mixture_uncapped_is_proportional():
    from refimage_ray.planner import plan_mixture

    r = plan_mixture(100.0, {"web": 50.0, "code": 10.0, "books": 5.0})
    assert r["shortfall"] == 0 and r["placed"] == 100.0
    # equal epochs everywhere when nobody caps (proportional shares)
    eps = {d: v["epochs"] for d, v in r["domains"].items()}
    assert len(set(eps.values())) == 1


def test_mixture_water_fills_capped_domains():
    from refimage_ray.planner import plan_mixture

    # NOTE: with alpha=1 caps are proportional to shares, so every
    # domain caps at the same budget — water-filling only matters when
    # alpha flattens shares.  alpha=0.5, budget 200: books (cap 20) and
    # code (cap 40) cap; their overflow lands on web.
    r = plan_mixture(200.0, {"web": 50.0, "code": 10.0, "books": 5.0},
                     max_epochs=4, alpha=0.5)
    d = r["domains"]
    assert d["books"]["tokens"] == 20.0 and d["books"]["epochs"] == 4.0
    assert d["code"]["tokens"] == 40.0 and d["code"]["epochs"] == 4.0
    assert d["web"]["tokens"] == 140.0  # absorbed the overflow
    assert d["web"]["epochs"] == 2.8 <= 4.0
    assert r["shortfall"] == 0 and r["placed"] == 200.0


def test_mixture_infeasible_budget_reports_shortfall():
    from refimage_ray.planner import plan_mixture

    r = plan_mixture(1000.0, {"web": 50.0, "code": 10.0}, max_epochs=4)
    assert r["placed"] == 240.0  # 4*(50+10)
    assert r["shortfall"] == 760.0
    assert all(v["epochs"] == 4.0 for v in r["domains"].values())


def test_mixture_alpha_flattens():
    from refimage_ray.planner import plan_mixture

    prop = plan_mixture(60.0, {"big": 90.0, "small": 10.0}, alpha=1.0)
    flat = plan_mixture(60.0, {"big": 90.0, "small": 10.0}, alpha=0.5)
    assert (flat["domains"]["small"]["tokens"]
            > prop["domains"]["small"]["tokens"])


def test_mixture_validation_and_edges():
    import pytest as _pytest

    from refimage_ray.planner import plan_mixture

    with _pytest.raises(ValueError, match="alpha"):
        plan_mixture(10, {"a": 1.0}, alpha=0)
    with _pytest.raises(ValueError, match="token_budget"):
        plan_mixture(-1, {"a": 1.0})
    r = plan_mixture(10, {"a": 0.0, "b": 5.0}, max_epochs=2)
    assert r["domains"]["a"]["tokens"] == 0.0
    assert r["domains"]["b"]["tokens"] == 10.0
    assert plan_mixture(0.0, {"a": 1.0})["placed"] == 0.0

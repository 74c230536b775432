"""Rollover groups (ES rollover / ILM analog): ingest slicing must not
change results — a group answers bit-identically to a monolithic index
over the same docs, before AND after seals; retention drops whole
generations; seal crash-recovery is re-runnable."""

from __future__ import annotations

import os
import shutil

import pytest
import ray.data as rd

from refimage_ray.config import EngineConfig
from refimage_ray.index.build import build_index
from refimage_ray.index.rollover import (
    generations,
    group_parts,
    group_searcher,
    ingest,
    prune_generations,
)
from refimage_ray.query.engine import LocalSearcher

CFG = EngineConfig(num_shards=4, salt_buckets=2)
QUERIES = ["the data join", "spark query", "stream merge", "zzz missing"]


def _mono(docs_tbl, out_dir):
    build_index(rd.from_arrow(docs_tbl), out_dir, CFG)
    return LocalSearcher(out_dir)


@pytest.fixture(scope="module")
def group(ray_session, tiny_docs, tmp_path_factory):
    """Three ingests with max_docs sized so the FIRST generation seals
    after the second ingest and the third opens gen-000002."""
    root = tmp_path_factory.mktemp("rollover")
    gdir = str(root / "grp")
    n = tiny_docs.num_rows
    cut1, cut2 = n // 3, 2 * n // 3
    slices = [
        tiny_docs.slice(0, cut1),
        tiny_docs.slice(cut1, cut2 - cut1),
        tiny_docs.slice(cut2),
    ]
    results = []
    for i, part in enumerate(slices):
        results.append(
            ingest(
                gdir,
                rd.from_arrow(part),
                CFG if i == 0 else None,
                max_docs=cut2,  # gen 1 reaches it on the 2nd ingest
            )
        )
    return gdir, tiny_docs, results, str(root)


def test_rollover_generation_lifecycle(group):
    gdir, _, results, _ = group
    assert [r["rolled"] for r in results] == [False, True, False]
    gens = generations(gdir)
    assert [os.path.basename(g) for g in gens] == ["gen-000001", "gen-000002"]
    assert os.path.exists(os.path.join(gens[0], "_SEALED"))
    assert not os.path.exists(os.path.join(gens[1], "_SEALED"))
    # sealed gen federates ONLY its merged artifact; open gen its segments
    parts = group_parts(gdir)
    assert parts == [
        os.path.join(gens[0], "merged"),
        os.path.join(gens[1], "seg-000001"),
    ]


def test_group_bit_identical_to_monolith(group, tmp_path):
    gdir, docs, _, _ = group
    full = _mono(docs, str(tmp_path / "full"))
    multi = group_searcher(gdir)
    assert multi.n_docs == full.n_docs
    assert multi.avgdl == full.avgdl
    for q in QUERIES:
        for mode in ("or", "and"):
            assert multi.search(q, k=25, mode=mode) == full.search(
                q, k=25, mode=mode
            ), (q, mode)


def test_second_ingest_inherits_cfg(group):
    gdir, _, _, _ = group
    # every artifact in the group was built with the first ingest's cfg
    from refimage_ray.index.manifest import load_manifest

    shards = {load_manifest(p)["config"]["num_shards"] for p in group_parts(gdir)}
    assert shards == {CFG.num_shards}


def test_prune_matches_reingest(group, tmp_path):
    gdir, docs, _, root = group
    pruned = os.path.join(root, "pruned")
    shutil.copytree(gdir, pruned)
    dropped = prune_generations(pruned, keep_last=1)
    assert [os.path.basename(d) for d in dropped] == ["gen-000001"]
    # survivors == a monolith over just the docs of gen-000002
    n = docs.num_rows
    tail = docs.slice(2 * n // 3)
    full = _mono(tail, str(tmp_path / "tail"))
    multi = group_searcher(pruned)
    assert multi.n_docs == full.n_docs
    for q in QUERIES:
        assert multi.search(q, k=20) == full.search(q, k=20), q


def test_seal_recovers_from_stale_tmp(group, tmp_path, tiny_docs):
    """A crash mid-merge leaves merged.tmp; the next roll must rebuild
    cleanly and still answer identically."""
    root = str(tmp_path / "crashy")
    n = tiny_docs.num_rows
    half = tiny_docs.slice(0, n // 2)
    ingest(root, rd.from_arrow(half), CFG, max_docs=n)  # open gen, no seal
    gen = generations(root)[0]
    os.makedirs(os.path.join(gen, "merged.tmp", "junk"))  # fake partial merge
    rest = tiny_docs.slice(n // 2)
    res = ingest(root, rd.from_arrow(rest), max_docs=n)
    assert res["rolled"]
    assert not os.path.exists(os.path.join(gen, "merged.tmp"))
    full = _mono(tiny_docs, str(tmp_path / "full2"))
    multi = group_searcher(root)
    for q in QUERIES:
        assert multi.search(q, k=15) == full.search(q, k=15), q


def test_first_ingest_requires_cfg(ray_session, tiny_docs, tmp_path):
    with pytest.raises(ValueError, match="first ingest"):
        ingest(str(tmp_path / "empty"), rd.from_arrow(tiny_docs.slice(0, 5)))


def test_prune_validates_keep_last(group):
    with pytest.raises(ValueError, match="keep_last"):
        prune_generations(group[0], keep_last=0)


def test_empty_group_search_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        group_searcher(str(tmp_path / "nothing"))


def test_verify_group(group):
    from refimage_ray.index.rollover import verify_group

    gdir, _, _, _ = group
    rep = verify_group(gdir, deep=True)
    assert rep["ok"], rep["problems"]
    assert len(rep["parts"]) == 2


def test_verify_group_detects_damage(group, tmp_path):
    import shutil as _shutil

    from refimage_ray.index.rollover import verify_group

    gdir, _, _, _ = group
    bad = str(tmp_path / "bad")
    _shutil.copytree(gdir, bad)
    # damage: drop the sealed generation's merged manifest
    import os as _os

    merged = _os.path.join(bad, "gen-000001", "merged")
    _os.remove(_os.path.join(merged, "manifest.json"))
    rep = verify_group(bad)
    assert not rep["ok"] and rep["problems"]


def test_verify_empty_group(tmp_path):
    from refimage_ray.index.rollover import verify_group

    rep = verify_group(str(tmp_path / "none"))
    assert not rep["ok"]


def test_ingest_after_prune_numbers_past_survivors(group, tmp_path,
                                                   tiny_docs):
    """Review regression: gen numbering must come from the MAX existing
    generation, not the count — after prune, len+1 collided with (or
    sorted before) a sealed survivor and new docs vanished."""
    import ray.data as rd2

    root = str(tmp_path / "prune_then_ingest")
    n = tiny_docs.num_rows
    third = n // 3
    # three sealed generations
    for i in range(3):
        ingest(root, rd2.from_arrow(tiny_docs.slice(i * third, third)),
               CFG if i == 0 else None, max_docs=1)
    dropped = prune_generations(root, keep_last=1)
    assert len(dropped) == 2
    extra = tiny_docs.slice(3 * third)
    if extra.num_rows == 0:
        extra = tiny_docs.slice(0, third)  # re-ingest ids are fine here
    res = ingest(root, rd2.from_arrow(extra), max_docs=10**9)
    assert os.path.basename(res["generation"]) == "gen-000004"
    # the new docs are actually served
    multi = group_searcher(root)
    assert multi.n_docs == third + extra.num_rows


def test_seal_recovers_from_missing_sealed_marker(tmp_path, tiny_docs):
    """Review regression: a crash BETWEEN the merged/ rename and the
    _SEALED marker used to freeze the stale merged artifact — segments
    ingested after the crash were silently dropped at the next seal."""
    import ray.data as rd2

    from refimage_ray.index.rollover import _seal, _segments

    root = str(tmp_path / "crash_between")
    n = tiny_docs.num_rows
    ingest(root, rd2.from_arrow(tiny_docs.slice(0, n // 2)), CFG,
           max_docs=10**9)
    gen = generations(root)[0]
    # simulate the crash: merged/ exists (covers seg-1 only), no _SEALED
    from refimage_ray.index.lifecycle import merge_indexes

    merge_indexes(_segments(gen), os.path.join(gen, "merged"), CFG)
    # post-crash ingest adds a second segment to the still-open gen
    res = ingest(root, rd2.from_arrow(tiny_docs.slice(n // 2)),
                 max_docs=n)  # reaches max_docs → seals now
    assert res["rolled"]
    full = _mono(tiny_docs, str(tmp_path / "full3"))
    multi = group_searcher(root)
    assert multi.n_docs == full.n_docs  # post-crash docs NOT dropped
    for q in QUERIES:
        assert multi.search(q, k=15) == full.search(q, k=15), q

"""Exact-substring span scrubbing (stages/spans.py) vs a brute-force
Python oracle, both modes, block-layout invariance."""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from refimage_ray.stages.spans import scrub_dup_spans


def _brute(docs: list[tuple[int, str]], n: int, mode: str):
    """Reference implementation: token lists, inter-doc duplicated
    grams, position coverage, keep-first winner by (doc_id, pos)."""
    toks = {d: re.findall(r"[a-z0-9]+", t.lower()) for d, t in docs}
    occ: dict[tuple, list[tuple[int, int]]] = {}
    for d in sorted(toks):
        t = toks[d]
        for i in range(len(t) - n + 1):
            occ.setdefault(tuple(t[i:i + n]), []).append((d, i))
    dup = {g: ps for g, ps in occ.items()
           if len({d for d, _ in ps}) >= 2}
    out = {}
    for d, t in toks.items():
        covered = [False] * len(t)
        for g, ps in dup.items():
            win = min(ps)  # (doc_id, pos) lexicographic
            for (dd, i) in ps:
                if dd != d:
                    continue
                if mode == "keep_first" and (dd, i) == win:
                    continue
                for j in range(n):
                    covered[i + j] = True
        kept = [w for w, c in zip(t, covered) if not c]
        out[d] = {
            "n_tokens": len(t),
            "n_removed": len(t) - len(kept),
            "text": " ".join(kept),
        }
    return out


_DOCS = [
    (1, "alpha beta gamma delta unique one two"),
    (2, "other words alpha beta gamma delta tail"),
    (3, "nothing shared here at all"),
    (4, "alpha beta gamma delta"),
    (5, "x y"),          # shorter than n
    (6, ""),             # tokenless
    (7, "one two three one two three one two three"),  # intra-doc only
]


def _tbl(docs) -> pa.Table:
    return pa.table({
        "doc_id": pa.array([d for d, _ in docs], pa.int64()),
        "text": pa.array([t for _, t in docs], pa.string()),
    })


@pytest.mark.parametrize("mode", ["drop_all", "keep_first"])
def test_scrub_matches_brute_force(ray_session, mode):
    got = {
        r["doc_id"]: r
        for r in scrub_dup_spans(
            rd.from_arrow(_tbl(_DOCS)).repartition(3), n=3, mode=mode
        ).take_all()
    }
    want = _brute(_DOCS, 3, mode)
    assert set(got) == set(want)
    for d in want:
        for k in ("n_tokens", "n_removed", "text"):
            assert got[d][k] == want[d][k], (mode, d, k)
    # intra-doc-only repetition (doc 7) is NOT inter-doc duplicated
    assert got[7]["n_removed"] == 0


def test_scrub_keep_first_keeps_exactly_one_copy(ray_session):
    got = {
        r["doc_id"]: r
        for r in scrub_dup_spans(
            rd.from_arrow(_tbl(_DOCS)), n=3, mode="keep_first"
        ).take_all()
    }
    # doc 1 is the smallest doc_id holding 'alpha beta gamma delta'
    assert got[1]["n_removed"] == 0
    assert got[2]["n_removed"] == 4 and got[4]["n_removed"] == 4


def test_scrub_block_layout_invariance(ray_session):
    rng = np.random.default_rng(11)
    vocab = ["aa", "bb", "cc", "dd", "ee", "ff"]
    docs = [
        (i, " ".join(rng.choice(vocab, size=rng.integers(0, 15)).tolist()))
        for i in range(40)
    ]
    a = sorted(
        scrub_dup_spans(rd.from_arrow(_tbl(docs)).repartition(1),
                        n=3).take_all(),
        key=lambda r: r["doc_id"],
    )
    b = sorted(
        scrub_dup_spans(rd.from_arrow(_tbl(docs)).repartition(7),
                        n=3).take_all(),
        key=lambda r: r["doc_id"],
    )
    assert a == b


def test_scrub_rejects_unknown_mode(ray_session):
    with pytest.raises(ValueError, match="mode"):
        scrub_dup_spans(rd.from_arrow(_tbl(_DOCS)), n=3, mode="bogus")


def test_scrub_stats_only(ray_session):
    out = scrub_dup_spans(
        rd.from_arrow(_tbl(_DOCS)), n=3, return_text=False
    ).take_all()
    assert "text" not in out[0]
    assert {r["doc_id"] for r in out} == {d for d, _ in _DOCS}


def test_scrub_gram_free_block_schema_uniform(ray_session):
    """A block whose docs ALL tokenize to fewer than n tokens must emit
    the same partials schema as gram-bearing blocks (mixed schemas
    break the groupby exchange)."""
    docs = [
        (1, "x y"), (2, "z"), (3, ""),             # block of short docs
        (4, "alpha beta gamma delta"),
        (5, "alpha beta gamma delta tail"),
    ]
    out = sorted(
        scrub_dup_spans(
            rd.from_arrow(_tbl(docs)).repartition(4), n=3
        ).take_all(),
        key=lambda r: r["doc_id"],
    )
    assert [r["doc_id"] for r in out] == [1, 2, 3, 4, 5]
    assert out[3]["n_removed"] == 4 and out[4]["n_removed"] == 4
    assert out[0]["n_removed"] == 0 and out[0]["text"] == "x y"


def test_gram_halves_use_independent_token_hashes(ray_session):
    """acc_a and acc_b must come from independent per-token hashes —
    md5 hi/lo halves differ, so the two accumulators differ even for
    the same gram (a single shared 64-bit token hash would make one
    collision collapse both halves)."""
    import pyarrow as pa

    from refimage_ray.stages.spans import _gram_hash_pairs
    from refimage_ray.config import DEFAULT_CONFIG

    g_hi, g_lo, _, _, _, _ = _gram_hash_pairs(
        pa.array(["one two three four"]), 3, DEFAULT_CONFIG
    )
    assert len(g_hi) == 2
    assert (g_hi != g_lo).all()


@pytest.mark.parametrize("mode", ["drop_all", "keep_first"])
def test_scrub_join_method_matches_broadcast(ray_session, mode):
    """method='join' (no dup-set driver materialization: bucketed
    hash_join + tag-union bucket rebuild) == the broadcast path,
    row for row, in both modes."""
    a = sorted(
        scrub_dup_spans(
            rd.from_arrow(_tbl(_DOCS)).repartition(3), n=3, mode=mode
        ).take_all(),
        key=lambda r: r["doc_id"],
    )
    b = sorted(
        scrub_dup_spans(
            rd.from_arrow(_tbl(_DOCS)).repartition(3), n=3, mode=mode,
            method="join",
        ).take_all(),
        key=lambda r: r["doc_id"],
    )
    assert a == b


def test_scrub_join_method_no_driver_collect(ray_session, monkeypatch):
    """The join path must never call Dataset.to_pandas (the poisoned-
    to_pandas guard used across the near-dup family)."""
    import ray.data

    def boom(self, *a, **k):  # pragma: no cover - fires only on a bug
        raise AssertionError("driver materialization in join scrub path")

    monkeypatch.setattr(ray.data.Dataset, "to_pandas", boom)
    out = scrub_dup_spans(
        rd.from_arrow(_tbl(_DOCS)).repartition(3), n=3, method="join"
    ).take_all()
    assert len(out) == len(_DOCS)


def test_scrub_rejects_unknown_method(ray_session):
    with pytest.raises(ValueError, match="method"):
        scrub_dup_spans(rd.from_arrow(_tbl(_DOCS)), n=3, method="bogus")


@pytest.mark.parametrize("mode", ["drop_all", "keep_first"])
def test_scrub_auto_switch_boundary_identity(ray_session, mode):
    """method='auto' picks broadcast at/below the gram threshold and
    join above it — identical rows either side of the boundary."""
    ds = rd.from_arrow(_tbl(_DOCS)).repartition(3)
    want = sorted(
        scrub_dup_spans(ds, n=3, mode=mode,
                        method="broadcast").take_all(),
        key=lambda r: r["doc_id"],
    )
    # threshold high: auto == broadcast
    hi = sorted(
        scrub_dup_spans(ds, n=3, mode=mode, method="auto",
                        auto_broadcast_max_grams=10**6).take_all(),
        key=lambda r: r["doc_id"],
    )
    # threshold 0: every dup gram exceeds it -> auto == join
    lo = sorted(
        scrub_dup_spans(ds, n=3, mode=mode, method="auto",
                        auto_broadcast_max_grams=0).take_all(),
        key=lambda r: r["doc_id"],
    )
    assert hi == want
    assert lo == want


def test_scrub_auto_above_threshold_no_driver_collect(ray_session,
                                                      monkeypatch):
    """When auto picks the join path, the dup set never reaches the
    driver (to_pandas poisoned for the whole run)."""
    import ray.data

    def boom(self, *a, **k):  # pragma: no cover - fires only on a bug
        raise AssertionError("driver materialization in auto-join scrub")

    monkeypatch.setattr(ray.data.Dataset, "to_pandas", boom)
    out = scrub_dup_spans(
        rd.from_arrow(_tbl(_DOCS)).repartition(3), n=3, method="auto",
        auto_broadcast_max_grams=0,
    ).take_all()
    assert len(out) == len(_DOCS)

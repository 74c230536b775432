"""Near-dup family: MinHash+LSH, SimHash, n-gram Jaccard, embedding cosine."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from refimage_ray.stages.dedup_near import (
    exact_jaccard,
    hamming_distance,
    lsh_candidate_pairs,
    minhash_band_rows,
    minhash_near_dup_pairs,
    simhash_batch,
    simhash_near_dup_pairs,
)


@pytest.fixture(scope="module")
def near_dup_corpus():
    base = ("spark streaming joins batch tables with windowed aggregates "
            "over partitioned columnar storage and fast shuffles")
    texts = [
        base,                                    # 0
        base + " extra tail",                    # 1: near-dup of 0
        base.replace("fast", "slow"),            # 2: near-dup of 0
        "completely different words about llamas in the andes mountains",  # 3
        "another unrelated document concerning medieval castle architecture",  # 4
        base,                                    # 5: exact dup of 0
    ]
    return pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                     "text": pa.array(texts, pa.string())}), texts


def test_exact_jaccard():
    assert exact_jaccard("a b c d", "a b c d") == 1.0
    assert exact_jaccard("a b c d", "x y z w") == 0.0
    assert 0.0 < exact_jaccard("a b c d e", "a b c d x") < 1.0
    assert exact_jaccard("", "") == 1.0
    assert exact_jaccard("a", "") == 0.0


def test_minhash_identical_docs_same_signature(near_dup_corpus):
    table, _ = near_dup_corpus
    rows = minhash_band_rows(table).to_pandas()
    sig0 = rows[rows.doc_id == 0].sort_values("band")["band_hash"].tolist()
    sig5 = rows[rows.doc_id == 5].sort_values("band")["band_hash"].tolist()
    assert sig0 == sig5
    sig3 = rows[rows.doc_id == 3].sort_values("band")["band_hash"].tolist()
    assert sig0 != sig3


def test_minhash_pipeline_finds_near_dups(ray_session, near_dup_corpus):
    table, texts = near_dup_corpus
    ds = rd.from_arrow(table)
    pairs = minhash_near_dup_pairs(ds, threshold=0.5).to_pandas()
    found = set(zip(pairs.doc_a, pairs.doc_b))
    assert (0, 5) in found          # exact dup
    assert (0, 1) in found or (0, 2) in found   # near dups
    for a, b in found:              # no false positives across topics
        assert {a, b} <= {0, 1, 2, 5}
    # verified jaccard values are exact
    for row in pairs.itertuples():
        assert row.jaccard == pytest.approx(
            exact_jaccard(texts[row.doc_a], texts[row.doc_b])
        )


def test_lsh_candidates_deduped(ray_session, near_dup_corpus):
    table, _ = near_dup_corpus
    band_ds = rd.from_arrow(minhash_band_rows(table))
    cand = lsh_candidate_pairs(band_ds).to_pandas()
    assert cand.duplicated(["doc_a", "doc_b"]).sum() == 0
    assert (cand.doc_a < cand.doc_b).all()


def test_simhash_properties(near_dup_corpus):
    table, texts = near_dup_corpus
    out = simhash_batch(table).to_pandas()
    sh = out["simhash"].to_numpy().astype(np.uint64)
    assert sh[0] == sh[5]
    d_near = hamming_distance(sh[0:1], sh[2:3])[0]
    d_far = hamming_distance(sh[0:1], sh[3:4])[0]
    assert d_near < d_far


def test_simhash_near_dup_pairs(ray_session, near_dup_corpus):
    table, _ = near_dup_corpus
    pairs = simhash_near_dup_pairs(rd.from_arrow(table), max_hamming=8).to_pandas()
    found = set(zip(pairs.doc_a, pairs.doc_b))
    assert (0, 5) in found
    assert all({a, b} <= {0, 1, 2, 5} for a, b in found)


def test_hamming_distance():
    a = np.array([0b1011], np.uint64)
    b = np.array([0b0010], np.uint64)
    assert hamming_distance(a, b)[0] == 2
    assert hamming_distance(a, a)[0] == 0


@pytest.fixture()
def poisoned_to_pandas(monkeypatch):
    """Assert no stage materializes a Dataset on the driver via
    Dataset.to_pandas (the round-1 scale anti-pattern)."""
    import ray.data

    def boom(self, *a, **k):
        raise AssertionError("driver-side Dataset.to_pandas in a distributed path")

    monkeypatch.setattr(ray.data.Dataset, "to_pandas", boom)


def test_simhash_pairs_distributed_no_driver_materialize(
    ray_session, near_dup_corpus, poisoned_to_pandas
):
    table, _ = near_dup_corpus
    pairs = simhash_near_dup_pairs(rd.from_arrow(table), max_hamming=8).to_pandas()
    found = set(zip(pairs.doc_a, pairs.doc_b))
    assert (0, 5) in found
    assert all({a, b} <= {0, 1, 2, 5} for a, b in found)
    # pairs sorted, unique, a<b, hamming exact
    assert (pairs.doc_a < pairs.doc_b).all()
    assert not pairs.duplicated(["doc_a", "doc_b"]).any()
    sh = simhash_batch(table).to_pandas()["simhash"].to_numpy().astype(np.uint64)
    for r in pairs.itertuples():
        assert r.hamming == hamming_distance(sh[r.doc_a : r.doc_a + 1],
                                             sh[r.doc_b : r.doc_b + 1])[0]


def test_minhash_pairs_distributed_no_driver_materialize(
    ray_session, near_dup_corpus, poisoned_to_pandas
):
    table, texts = near_dup_corpus
    pairs = minhash_near_dup_pairs(rd.from_arrow(table), threshold=0.5)
    found = set(zip(pairs["doc_a"].to_pylist(), pairs["doc_b"].to_pylist()))
    assert (0, 5) in found
    for (a, b), j in zip(found, pairs["jaccard"].to_pylist()):
        pass
    for r in range(pairs.num_rows):
        a = pairs["doc_a"][r].as_py()
        b = pairs["doc_b"][r].as_py()
        assert pairs["jaccard"][r].as_py() == pytest.approx(
            exact_jaccard(texts[a], texts[b])
        )


def test_jaccard_batch_matches_scalar(near_dup_corpus):
    import pyarrow as pa

    from refimage_ray.stages.dedup_near import jaccard_batch

    _, texts = near_dup_corpus
    ta, tb = [], []
    for i in range(len(texts)):
        for j in range(i + 1, len(texts)):
            ta.append(texts[i])
            tb.append(texts[j])
    ta += ["", "a b", ""]
    tb += ["", "", "x y z"]
    got = jaccard_batch(pa.array(ta, pa.string()), pa.array(tb, pa.string()))
    for g, a, b in zip(got, ta, tb):
        assert g == pytest.approx(exact_jaccard(a, b)), (a, b)


def test_dup_clusters_distributed_chain(ray_session, poisoned_to_pandas):
    """Chain topology worst case: 0-1-2-...-n must converge to one
    cluster labelled 0 in O(log n) shortcutted rounds."""
    from refimage_ray.stages.dedup_near import dup_clusters, dup_clusters_distributed

    n = 48
    pairs = pa.table(
        {
            "doc_a": pa.array(list(range(n - 1)), pa.int64()),
            "doc_b": pa.array(list(range(1, n)), pa.int64()),
        }
    )
    out = dup_clusters_distributed(rd.from_arrow(pairs), max_rounds=16).to_pandas()
    assert (out["cluster_id"] == 0).all()
    assert sorted(out["doc_id"]) == list(range(n))
    # matches the driver union-find on a mixed graph
    mixed = pa.table(
        {
            "doc_a": pa.array([0, 1, 5, 9, 9, 20], pa.int64()),
            "doc_b": pa.array([1, 2, 6, 10, 11, 21], pa.int64()),
        }
    )
    want = dup_clusters(mixed).to_pandas()
    got = dup_clusters_distributed(rd.from_arrow(mixed)).to_pandas()
    assert want.equals(got)


def test_ngram_jaccard_pairs_match_brute_force(ray_session, near_dup_corpus):
    """Shingle-anchor blocking at rate 1.0 with no df cap finds EXACTLY
    the brute-force pair set {(a,b): J(a,b) >= t} — recall 1.0 by the
    shared-shingle argument, precision 1.0 by exact verification."""
    import itertools

    import ray.data as rd

    from refimage_ray.stages.dedup_near import (
        exact_jaccard,
        ngram_jaccard_near_dup_pairs,
    )

    t = 0.5
    docs, _ = near_dup_corpus
    got = ngram_jaccard_near_dup_pairs(
        rd.from_arrow(docs), threshold=t, anchor_rate=1.0, max_anchor_df=None
    )
    got_pairs = set(zip(got["doc_a"].to_pylist(), got["doc_b"].to_pylist()))
    ids = docs["doc_id"].to_pylist()
    texts = docs["text"].to_pylist()
    want = set()
    for (i, a), (j, b) in itertools.combinations(zip(ids, texts), 2):
        if exact_jaccard(a, b) >= t:
            want.add((min(i, j), max(i, j)))
    assert got_pairs == want
    # verified jaccard values agree with the scalar reference
    by_id = dict(zip(ids, texts))
    for da, db, jv in zip(got["doc_a"].to_pylist(), got["doc_b"].to_pylist(),
                          got["jaccard"].to_pylist()):
        assert jv == __import__("pytest").approx(exact_jaccard(by_id[da], by_id[db]))

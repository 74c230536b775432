"""Training-data preparation: sequence packing (distributed scan),
mixture sampling, url blocklist gate, PII scrub."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from refimage_ray.stages.packing import pack_offsets
from refimage_ray.pipelines.training import (
    DEFAULT_LANG_RATES,
    pii_scrub_batch,
    _augment_pii,
)


def _dl_ds(dls, ids=None):
    ids = list(range(len(dls))) if ids is None else ids
    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "dl": pa.array(dls, pa.int64()),
            }
        )
    )


def _naive_pack(ids, dls, budget):
    order = np.argsort(ids, kind="stable")
    start = 0
    out = {}
    for i in order:
        st, dl = start, dls[i]
        seq = st // budget
        last = (st + dl - 1) // budget if dl > 0 else seq
        out[ids[i]] = (seq, st % budget, last - seq)
        start += dl
    return out


@pytest.mark.parametrize("budget,n_buckets", [(7, 1), (7, 4), (100, 3)])
def test_pack_offsets_matches_naive(ray_session, budget, n_buckets):
    rng = np.random.default_rng(11)
    dls = rng.integers(0, 25, size=200).tolist()
    ids = rng.permutation(200).tolist()  # arrival order != id order
    got = {
        r["doc_id"]: (r["seq_id"], r["begin_offset"], r["n_crossings"])
        for r in pack_offsets(_dl_ds(dls, ids), budget, n_buckets).take_all()
    }
    assert got == _naive_pack(ids, dls, budget)


def test_pack_offsets_empty_docs_and_exact_fit(ray_session):
    # doc of exactly budget tokens ends at the boundary (0 crossings);
    # empty docs inherit the running offset and cross nothing
    dls = [4, 0, 4, 0, 3]
    got = {
        r["doc_id"]: (r["seq_id"], r["begin_offset"], r["n_crossings"])
        for r in pack_offsets(_dl_ds(dls), budget=4, n_buckets=2).take_all()
    }
    assert got == {
        0: (0, 0, 0),
        1: (1, 0, 0),
        2: (1, 0, 0),
        3: (2, 0, 0),
        4: (2, 0, 0),
    }


def test_pack_offsets_single_doc_spans_many(ray_session):
    got = pack_offsets(_dl_ds([35]), budget=10, n_buckets=1).take_all()
    assert got[0]["seq_id"] == 0
    assert got[0]["n_crossings"] == 3  # tokens 0..34 touch seqs 0..3


def test_pack_offsets_rejects_bad_budget(ray_session):
    with pytest.raises(ValueError):
        pack_offsets(_dl_ds([1]), budget=0)


def test_mixture_gate_rates(ray_session, tmp_path):
    # write a tiny documents.parquet and check per-lang acceptance is
    # exactly the hash rule (not a statistical test)
    import pyarrow.parquet as pq

    n = 400
    langs = ["en", "zh", "de", "xx"] * (n // 4)
    tbl = pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "text": pa.array(["w"] * n),
            "lang": pa.array(langs),
            "source": pa.array(["s"] * n),
            "n_chars": pa.array([1] * n, pa.int64()),
        }
    )
    pq.write_table(tbl, tmp_path / "documents.parquet")
    from refimage_ray.pipelines.training import lang_mixture_sample

    kept = {r["doc_id"] for r in lang_mixture_sample(str(tmp_path)).take_all()}
    for i in range(n):
        rate = DEFAULT_LANG_RATES.get(langs[i], 0.05)
        h = (i * 2654435761) % 2**32
        assert (i in kept) == (h < int(rate * 2**32)), i
    # en rate 1.0 keeps everything
    assert all(i in kept for i in range(n) if langs[i] == "en")


def test_pii_scrub_counts_and_redaction():
    text = pa.array(
        [
            "mail me at bob.smith+x@mail.example.co or 10.0.0.1 tel 555-1234",
            "no pii here",
            "two ips 1.2.3.4 5.6.7.8 and a@b.io",
        ]
    )
    out = pii_scrub_batch(text)
    assert out["n_emails"].to_pylist() == [1, 0, 1]
    assert out["n_ips"].to_pylist() == [1, 0, 2]
    assert out["n_phones"].to_pylist() == [1, 0, 0]
    clean = out["clean"].to_pylist()
    assert clean[0] == "mail me at <EMAIL> or <IP> tel <PHONE>"
    assert clean[1] == "no pii here"
    assert clean[2] == "two ips <IP> <IP> and <EMAIL>"


def test_pii_embedded_in_email_counted_once():
    # regression: a phone/IP inside an email address must be counted
    # as the email only — counts run on the progressively redacted
    # text, so they agree with the redaction output
    out = pii_scrub_batch(pa.array(["reach 555-1234@corp.com today"]))
    assert out["n_emails"].to_pylist() == [1]
    assert out["n_phones"].to_pylist() == [0]
    assert out["clean"].to_pylist() == ["reach <EMAIL> today"]


def test_pii_augmentation_is_deterministic():
    b = pa.table(
        {
            "doc_id": pa.array([0, 300, 12345], pa.int64()),
            "text": pa.array(["t", "t", "t"]),
        }
    )
    synth = _augment_pii(b).to_pylist()
    assert synth[0] == "t contact doc0@example.com from 192.168.0.0 call 555-0000"
    assert synth[1] == "t contact doc300@example.com from 192.168.44.0 call 555-0300"
    assert synth[2] == (
        "t contact doc12345@example.com from 192.168.57.45 call 555-2345"
    )


def _docs_ds(texts, ids=None):
    ids = list(range(len(texts))) if ids is None else ids
    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    )


def test_pack_token_sequences_reconstructs_corpus(ray_session):
    """Concatenating the emitted sequences in seq order reproduces the
    corpus token stream in doc_id order exactly; every sequence except
    the last is exactly budget tokens."""
    from refimage_ray.functions.text import tokenize
    from refimage_ray.stages.packing import build_vocab, pack_token_sequences

    rng = np.random.default_rng(5)
    words = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "omega"]
    texts = [
        " ".join(rng.choice(words, size=rng.integers(0, 17)))
        for _ in range(60)
    ]
    ids = rng.permutation(60).tolist()  # arrival order != id order
    budget = 11
    ds = _docs_ds(texts, ids)
    vocab = build_vocab(_docs_ds(texts, ids))
    out = sorted(
        pack_token_sequences(_docs_ds(texts, ids), budget, n_buckets=4).take_all(),
        key=lambda r: r["seq_id"],
    )
    # expected stream: docs in doc_id order → vocab ids
    by_id = dict(zip(ids, texts))
    vmap = {w: i for i, w in enumerate(vocab)}
    stream = [vmap[t] for d in sorted(ids) for t in tokenize(by_id[d])]
    got = [t for r in out for t in r["token_ids"]]
    assert got == stream
    assert [r["seq_id"] for r in out] == list(range(len(out)))
    for r in out[:-1]:
        assert r["n_tokens"] == budget
    assert 0 < out[-1]["n_tokens"] <= budget


def test_pack_token_sequences_external_vocab_unknowns(ray_session):
    from refimage_ray.stages.packing import pack_token_sequences

    out = pack_token_sequences(
        _docs_ds(["aa bb cc", "bb dd"]), budget=3, vocab=["aa", "bb", "cc"]
    ).take_all()
    out = sorted(out, key=lambda r: r["seq_id"])
    flat = [t for r in out for t in r["token_ids"]]
    assert flat == [0, 1, 2, 1, -1]  # dd unknown -> -1


def test_doc_len_quantiles_matches_numpy_rule(ray_session, tmp_path):
    import pyarrow.parquet as pq

    rng = np.random.default_rng(3)
    lens = rng.integers(0, 40, size=300)
    texts = [" ".join(["w"] * int(n)) for n in lens]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(300), pa.int64()),
                "text": pa.array(texts),
            }
        ),
        tmp_path / "documents.parquet",
    )
    from refimage_ray.pipelines.corpus import doc_len_quantiles

    got = {r["p"]: r["doc_len"] for r in doc_len_quantiles(str(tmp_path)).to_pylist()}
    srt = np.sort(lens)
    for p, v in got.items():
        assert v == int(srt[int(np.ceil(p * len(srt))) - 1]), p


def test_vocab_from_index_equals_build_vocab(ray_session, built_index):
    from refimage_ray.index.reader import staged_docs
    from refimage_ray.stages.packing import build_vocab, vocab_from_index

    idx = built_index[0]
    assert vocab_from_index(idx) == build_vocab(
        staged_docs(idx, columns=["doc_id", "text"])
    )


@pytest.fixture()
def poisoned_to_pandas(monkeypatch):
    """No training op may materialize a Dataset on the driver via
    Dataset.to_pandas (only K-row bucket sums may hit the driver)."""
    import ray.data

    def boom(self, *a, **k):
        raise AssertionError("driver-side Dataset.to_pandas in a distributed path")

    monkeypatch.setattr(ray.data.Dataset, "to_pandas", boom)


def test_packing_no_driver_materialize(ray_session, poisoned_to_pandas):
    from refimage_ray.stages.packing import pack_offsets, pack_token_sequences

    dls = list(range(40))
    assert len(pack_offsets(_dl_ds(dls), budget=16, n_buckets=4).take_all()) == 40
    texts = ["aa bb cc dd"] * 25
    out = pack_token_sequences(_docs_ds(texts), budget=8, n_buckets=3).take_all()
    assert sum(r["n_tokens"] for r in out) == 100


def test_dup_span_no_driver_materialize(ray_session, poisoned_to_pandas, tmp_path):
    import pyarrow.parquet as pq

    from refimage_ray.pipelines.corpus import dup_span_stats

    texts = ["x y z w"] * 3 + ["p q r s"]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(4), pa.int64()),
                "text": pa.array(texts),
            }
        ),
        tmp_path / "documents.parquet",
    )
    out = {r["doc_id"]: r["n_dup_positions"]
           for r in dup_span_stats(str(tmp_path), n=3).take_all()}
    assert out == {0: 2, 1: 2, 2: 2}


def test_write_packed_sequences_resume_and_identity(ray_session, tmp_path):
    """Partitioned sink: full write == resumed write byte-for-byte;
    a resume only rewrites missing files."""
    import hashlib
    import os

    from refimage_ray.stages.packing import write_packed_sequences

    texts = [" ".join(["w"] * 9)] * 40  # 360 tokens
    d1, d2 = str(tmp_path / "a"), str(tmp_path / "b")
    m1 = write_packed_sequences(_docs_ds(texts), d1, budget=16, seqs_per_file=8)
    # 360/16 = 22.5 -> 23 seqs -> 3 files
    assert m1["files"] == ["seqs-00000.parquet", "seqs-00001.parquet",
                           "seqs-00002.parquet"]
    assert m1["skipped_existing"] == []

    def digest(d):
        return {
            f: hashlib.md5(open(os.path.join(d, f), "rb").read()).hexdigest()
            for f in m1["files"]
        }

    h1 = digest(d1)
    # fresh full write elsewhere is byte-identical (deterministic sink)
    write_packed_sequences(_docs_ds(texts), d2, budget=16, seqs_per_file=8)
    assert digest(d2) == h1
    # delete one file; resume rewrites ONLY it and reproduces the bytes
    os.remove(os.path.join(d1, "seqs-00001.parquet"))
    m3 = write_packed_sequences(_docs_ds(texts), d1, budget=16, seqs_per_file=8)
    assert set(m3["skipped_existing"]) == {"seqs-00000.parquet",
                                           "seqs-00002.parquet"}
    assert digest(d1) == h1


def test_shuffle_ranks_is_a_stable_permutation(ray_session):
    """shuffle_ranks yields a bijection onto 0..n-1 that (a) matches
    the naive single-process rank, (b) is IDENTICAL across bucket
    counts (the cluster-size-stability claim), and (c) changes with
    the seed."""
    from refimage_ray.stages.packing import shuffle_key_of, shuffle_ranks

    ids = np.array([1, 2, 3, 5, 8, 13, 21, 34, 55, 89, 144, 10**9, 7],
                   np.int64)
    ds = rd.from_arrow(pa.table({"doc_id": pa.array(ids, pa.int64())}))

    def run(n_buckets, seed=0):
        t = shuffle_ranks(ds, n_buckets=n_buckets, seed=seed).take_all()
        return {r["doc_id"]: (r["shuffle_key"], r["shuffle_pos"]) for r in t}

    got = run(4)
    # (a) naive oracle: lexsort by (key, id)
    key = shuffle_key_of(ids).astype(np.int64)
    order = np.lexsort((ids, key))
    pos = np.empty(len(ids), np.int64)
    pos[order] = np.arange(len(ids))
    for i, d in enumerate(ids):
        assert got[int(d)] == (int(key[i]), int(pos[i]))
    # bijection onto 0..n-1
    assert sorted(p for _, p in got.values()) == list(range(len(ids)))
    # (b) bucket count (≈ cluster size) does not change the permutation
    assert run(1) == got == run(64)
    # (c) a different seed is a different permutation
    assert {d: p for d, (_, p) in run(4, seed=7).items()} != \
        {d: p for d, (_, p) in got.items()}


def test_write_packed_sequences_shuffled_order(ray_session, tmp_path):
    """order="shuffled": reading the files in name order replays the
    shuffle_ranks permutation of the sequence ids exactly — no global
    rank was ever computed — and the sink stays resumable/deterministic."""
    import hashlib
    import os

    import pyarrow.parquet as pq

    from refimage_ray.stages.packing import (
        shuffle_key_of,
        write_packed_sequences,
    )

    texts = [f"alpha beta w{i} gamma delta w{i} epsilon" for i in range(40)]
    d = str(tmp_path / "shuf")
    m = write_packed_sequences(
        _docs_ds(texts), d, budget=16, seqs_per_file=4, order="shuffled"
    )
    assert m["order"] == "shuffled" and m["n_files"] >= 2
    got = []
    for f in m["files"]:  # name order == bucket order == key order
        got.extend(pq.read_table(os.path.join(d, f))["seq_id"].to_pylist())
    # oracle: every seq id sorted by (shuffle_key, seq_id)
    sids = np.array(sorted(set(got)), np.int64)
    key = shuffle_key_of(sids).astype(np.int64)
    want = sids[np.lexsort((sids, key))].tolist()
    assert got == want
    # same ids as the stream-order write, different order
    d2 = str(tmp_path / "stream")
    m2 = write_packed_sequences(_docs_ds(texts), d2, budget=16, seqs_per_file=4)
    stream_ids = []
    for f in m2["files"]:
        stream_ids.extend(pq.read_table(os.path.join(d2, f))["seq_id"].to_pylist())
    assert sorted(stream_ids) == sorted(got) and stream_ids != got
    # resume: delete one file, rerun, bytes identical
    h = {f: hashlib.md5(open(os.path.join(d, f), "rb").read()).hexdigest()
         for f in m["files"]}
    os.remove(os.path.join(d, m["files"][1]))
    m3 = write_packed_sequences(
        _docs_ds(texts), d, budget=16, seqs_per_file=4, order="shuffled"
    )
    assert m["files"][1] not in m3["skipped_existing"]
    assert all(
        hashlib.md5(open(os.path.join(d, f), "rb").read()).hexdigest() == v
        for f, v in h.items()
    )


def test_pack_segmented_list_offsets_identical(ray_session, monkeypatch):
    """Regression: one bucket's simple-path token cumsum was cast to
    int32 ListArray offsets, which wraps past 2^31 tokens.  With the
    cap shrunk to force many segments, the emitted sequences must be
    identical to the unsegmented run."""
    from refimage_ray.stages import packing

    rng = np.random.default_rng(11)
    words = ["alpha", "beta", "gamma", "delta"]
    texts = [
        " ".join(rng.choice(words, size=rng.integers(1, 9)))
        for _ in range(50)
    ]
    base = sorted(
        packing.pack_token_sequences(_docs_ds(texts), 13, n_buckets=2).take_all(),
        key=lambda r: r["seq_id"],
    )
    monkeypatch.setattr(packing, "_LIST_OFFSET_CAP", 7)  # force segments
    seg = sorted(
        packing.pack_token_sequences(_docs_ds(texts), 13, n_buckets=2).take_all(),
        key=lambda r: r["seq_id"],
    )
    assert [r["seq_id"] for r in seg] == [r["seq_id"] for r in base]
    assert [r["token_ids"] for r in seg] == [r["token_ids"] for r in base]


def test_write_packed_sequences_resume_geometry_mismatch(ray_session, tmp_path):
    """Regression: resume=True silently mixed two packing geometries —
    now it refuses when budget/order/seed/seqs_per_file differ from the
    prior manifest."""
    import pytest as _pytest

    from refimage_ray.stages.packing import write_packed_sequences

    texts = [" ".join(["w"] * 9)] * 20
    d = str(tmp_path / "a")
    write_packed_sequences(_docs_ds(texts), d, budget=16, seqs_per_file=8)
    with _pytest.raises(ValueError, match="packing geometry"):
        write_packed_sequences(_docs_ds(texts), d, budget=32, seqs_per_file=8)
    with _pytest.raises(ValueError, match="packing geometry"):
        write_packed_sequences(_docs_ds(texts), d, budget=16, seqs_per_file=4)
    # same geometry resumes fine; different geometry allowed with resume=False
    m = write_packed_sequences(_docs_ds(texts), d, budget=16, seqs_per_file=8)
    assert m["skipped_existing"] == m["files"]
    m2 = write_packed_sequences(_docs_ds(texts), d, budget=32, seqs_per_file=8,
                                resume=False)
    assert m2["skipped_existing"] == []


def test_stratified_sample_exact_vs_bruteforce(ray_session, tmp_path):
    """Combiner + finalizer == brute-force lowest-n-hash-per-lang, even
    when block boundaries split strata."""
    import hashlib

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from refimage_ray.pipelines.training import stratified_sample

    rng = np.random.default_rng(3)
    n = 700
    langs = rng.choice(["en", "fr", "de"], size=n)
    t = pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "text": pa.array(["x"] * n),
            "lang": pa.array(langs),
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))

    def h(i):
        return int.from_bytes(hashlib.md5(str(i).encode()).digest()[:8], "big")

    want = set()
    for lang in ("en", "fr", "de"):
        ids = [i for i in range(n) if langs[i] == lang]
        ids.sort(key=lambda i: (h(i), i))
        want |= {(i, lang) for i in ids[:30]}
    got = {
        (r["doc_id"], r["lang"])
        for r in stratified_sample(str(tmp_path), 30).take_all()
    }
    assert got == want and len(got) == 90


def test_split_by_hash_vs_bruteforce(ray_session, tmp_path):
    """Per-batch combiner + Sum groupby == per-doc brute-force holdout
    assignment (md5-u64 % 100), including the token and id checksums."""
    import hashlib

    import pyarrow as pa
    import pyarrow.parquet as pq

    from refimage_ray.pipelines.training import split_by_hash

    n = 600
    texts = [f"alpha beta doc {i} " + "w " * (i % 7) for i in range(n)]
    t = pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "text": pa.array(texts),
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))

    import re

    def split_of(i):
        b = int.from_bytes(hashlib.md5(str(i).encode()).digest()[:8], "big") % 100
        return "train" if b < 98 else ("val" if b < 99 else "test")

    want = {}
    for i in range(n):
        s = split_of(i)
        dl = len(re.findall(r"[a-z0-9]+", texts[i].lower()))
        a = want.setdefault(s, [0, 0, 0])
        a[0] += 1
        a[1] += dl
        a[2] += i
    got = {
        r["split"]: [r["n_docs"], r["total_tokens"], r["sum_doc_ids"]]
        for r in split_by_hash(str(tmp_path)).take_all()
    }
    assert got == want


def test_split_by_hash_is_batch_invariant(ray_session, tmp_path):
    """The assignment never depends on block boundaries: one file vs
    many small files produce identical rollups."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from refimage_ray.pipelines.training import split_by_hash

    n = 400
    t = pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "text": pa.array([f"tok{i} tok{i+1}" for i in range(n)]),
        }
    )
    one = tmp_path / "one"
    many = tmp_path / "many"
    one.mkdir()
    many.mkdir()
    pq.write_table(t, str(one / "documents.parquet"))
    import os

    os.mkdir(str(many / "documents.parquet"))
    for j in range(8):
        pq.write_table(
            t.slice(j * 50, 50),
            str(many / "documents.parquet" / f"part-{j}.parquet"),
        )

    def rollup(d):
        return sorted(
            (r["split"], r["n_docs"], r["total_tokens"], r["sum_doc_ids"])
            for r in split_by_hash(str(d)).take_all()
        )

    assert rollup(one) == rollup(many)


def test_url_latest_snapshot_vs_bruteforce(ray_session, tmp_path):
    """Per-batch argmax combiner + groupby finalizer == brute-force
    latest-per-url, with snapshot counts, across block boundaries."""
    import hashlib

    import pyarrow as pa
    import pyarrow.parquet as pq

    from refimage_ray.pipelines.training import url_latest_snapshot

    n = 900
    langs = ["en", "fr"] * (n // 2)
    sources = [f"src{i % 3}" for i in range(n)]
    t = pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "lang": pa.array(langs),
            "source": pa.array(sources),
        }
    )
    d = tmp_path / "documents.parquet"
    import os

    os.mkdir(str(d))
    for j in range(6):  # many blocks: urls straddle batches
        pq.write_table(t.slice(j * 150, 150), str(d / f"p{j}.parquet"))

    def ts(i):
        return (
            int.from_bytes(hashlib.md5(str(i).encode()).digest()[:8], "big")
            % 1_000_000
        )

    want = {}
    for i in range(n):
        url = f"{sources[i]}.{langs[i]}.example.org/page-{i % 500}"
        cur = want.get(url)
        if cur is None:
            want[url] = [i, 1]
        else:
            best = cur[0]
            if (ts(i), i) > (ts(best), best):
                cur[0] = i
            cur[1] += 1
    got = {
        r["url"]: [r["latest_doc_id"], r["n_snapshots"]]
        for r in url_latest_snapshot(str(tmp_path)).take_all()
    }
    assert got == want


def test_events_rollup_equals_plain_hourly(ray_session, tmp_path):
    """rollup artifact + raw tail == the plain hourly aggregate, and the
    artifact is reused (idempotent) on the second call."""
    import os
    import time

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from refimage_ray.pipelines.relational import (
        _rollup_dir_for,
        events_hourly,
        events_hourly_rollup,
    )

    rng = np.random.default_rng(11)
    n = 4000
    base = 1_600_000_000_000_000  # µs epoch
    ts = base + rng.integers(0, 72 * 3600, size=n) * 1_000_000
    t = pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
            "user_id": pa.array(rng.integers(0, 50, n), pa.int64()),
            "event_type": pa.array(rng.choice(["click", "view", "buy"], n)),
            "value": pa.array(rng.random(n).round(3), pa.float64()),
        }
    )
    pq.write_table(t, str(tmp_path / "events.parquet"))
    sf = str(tmp_path)
    import shutil

    shutil.rmtree(_rollup_dir_for(sf), ignore_errors=True)
    want = events_hourly(sf).to_pylist()
    got = events_hourly_rollup(sf).to_pylist()
    assert got == want and len(got) > 100
    marker = os.path.join(_rollup_dir_for(sf), "_SUCCESS")
    before = os.path.getmtime(marker)
    time.sleep(0.05)
    assert events_hourly_rollup(sf).to_pylist() == want  # artifact reused
    assert os.path.getmtime(marker) == before


# --- weighted sampling (Efraimidis–Spirakis) ---

def _naive_weighted_sample(ids, weights, n):
    import numpy as _np

    from refimage_ray.functions.hashing import md5_u64_string_array as _m
    import pyarrow as _pa

    h = _m(_pa.array([str(i) for i in ids]))
    u = (h.astype(_np.float64) + 0.5) / 18446744073709551616.0
    w = _np.asarray(weights, dtype=_np.float64)
    with _np.errstate(divide="ignore"):
        key = _np.where(w > 0, -_np.log(u) / w, _np.inf)
    order = _np.lexsort((_np.asarray(ids), key))
    order = order[_np.isfinite(key[order])][:n]
    return [int(i) for i in _np.asarray(ids)[order]]


def test_weighted_sample_matches_naive_and_layout(ray_session):
    import pyarrow as pa

    import ray.data as rd

    from refimage_ray.pipelines.training import weighted_sample

    ids = list(range(1, 401))
    w = [(i % 7) for i in ids]  # includes zero weights (i % 7 == 0)
    tbl = pa.table({"doc_id": pa.array(ids, pa.int64()),
                    "n_chars": pa.array(w, pa.int64())})
    want = _naive_weighted_sample(ids, w, 50)
    got1 = weighted_sample(
        rd.from_arrow(tbl), 50, weight_col="n_chars"
    ).to_pandas()
    got2 = weighted_sample(
        rd.from_arrow(tbl).repartition(8), 50, weight_col="n_chars"
    ).to_pandas()
    assert got1["doc_id"].tolist() == want
    assert got2["doc_id"].tolist() == want  # block-layout invariant
    # zero-weight rows can never be sampled
    assert (got1["n_chars"] > 0).all()


def test_weighted_sample_heavier_is_likelier(ray_session):
    """Statistical sanity with deterministic keys: when one row's
    weight dwarfs the rest, it must appear in a tiny sample."""
    import pyarrow as pa

    import ray.data as rd

    from refimage_ray.pipelines.training import weighted_sample

    tbl = pa.table({"doc_id": pa.array(range(200), pa.int64()),
                    "n_chars": pa.array([1] * 199 + [10**9], pa.int64())})
    got = weighted_sample(
        rd.from_arrow(tbl), 5, weight_col="n_chars"
    ).to_pandas()
    assert 199 in set(got["doc_id"])


def test_build_vocab_cap_bounds_noise_corpus(ray_session):
    """A high-cardinality noise corpus (every token unique) must stay
    within the requested vocab bound; survivors are the top-df terms
    (ties term-asc) and ids remain sorted-term order."""
    import ray.data as rd

    from refimage_ray.stages.packing import build_vocab

    rng = np.random.default_rng(7)
    # 40 docs x 30 unique noise tokens each + a few common words
    texts = []
    for i in range(40):
        noise = [f"x{rng.integers(10**12):012d}" for _ in range(30)]
        texts.append("common shared words " + " ".join(noise))
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts),
    }))
    capped = build_vocab(ds, max_terms=5)
    assert len(capped) == 5
    # top-df terms are the 3 words on every doc + 2 tie-broken noise
    assert {"common", "shared", "words"} <= set(capped)
    assert capped == sorted(capped)
    # min_df alone kills the singleton tail
    mdf = build_vocab(ds, min_df=2, max_terms=None)
    assert mdf == ["common", "shared", "words"]
    # uncapped opt-in still returns the full distinct set
    full = build_vocab(ds, max_terms=None)
    assert len(full) == 3 + 40 * 30
    # the default cap (2^17) does not bind on bounded corpora
    assert build_vocab(ds) == full

"""Deterministic hashing helpers.

Reference analogs: SHA-256 content hashing for exact dedup
(``/root/reference/src/refimage/storage.py:130-138``) and the UNIQUE
``file_hash`` constraint (``storage.py:89``).  We use md5 for the
content hash of text (DuckDB has ``md5()`` built in, which keeps the
dedup operators SQL-oracle-checkable) and blake2b-64 for term/url
hashes (stable across processes, unlike Python's builtin ``hash``).
No randomness anywhere — determinism is required for resumable builds
(SURVEY.md §7.3).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def blake2b64(s: str | bytes) -> int:
    """Stable 64-bit hash of a string (term_hash / url partitioning)."""
    if isinstance(s, str):
        s = s.encode("utf-8")
    return int.from_bytes(hashlib.blake2b(s, digest_size=8).digest(), "little")


def hash_string_array(arr: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """Vectorized-ish stable 64-bit hash of an Arrow string column.

    Hashes each *unique* value once (dictionary-encode first), then
    scatters through the index array — O(unique) Python work per batch
    instead of O(rows).
    """
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    dct = pc.dictionary_encode(arr)
    if isinstance(dct, pa.ChunkedArray):
        dct = dct.combine_chunks()
    uniq = dct.dictionary.to_pylist()
    codes = dct.indices.to_numpy(zero_copy_only=False)
    table = np.fromiter(
        (blake2b64(u if u is not None else "") for u in uniq),
        dtype=np.uint64,
        count=len(uniq),
    )
    if table.size == 0:
        return np.zeros(0, dtype=np.uint64)
    return table[codes]


_HEX_LUT = np.zeros(256, dtype=np.uint64)
for i, c in enumerate("0123456789abcdef"):
    _HEX_LUT[ord(c)] = i
_HEX_POWERS = np.uint64(16) ** np.arange(15, -1, -1, dtype=np.uint64)


def _hex_u64_at(arr: pa.Array | pa.ChunkedArray, start: int) -> np.ndarray:
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    if n == 0:
        return np.zeros(0, dtype=np.uint64)
    buf = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
    offs = np.frombuffer(arr.buffers()[1], dtype=np.int32)[arr.offset : arr.offset + n]
    idx = offs.astype(np.int64)[:, None] + (start + np.arange(16, dtype=np.int64))
    return (_HEX_LUT[buf[idx]] * _HEX_POWERS).sum(axis=1, dtype=np.uint64)


def hex_prefix_u64(arr: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """First 16 hex chars of each string → uint64, fully vectorized.

    For md5-hex columns this extracts a uniform 64-bit content key with
    zero per-row Python (reads the Arrow data buffer directly) — used
    by the numeric dedup path.
    """
    return _hex_u64_at(arr, 0)


def hex_suffix_u64(arr: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """Hex chars 16..32 → uint64 — the second half of an md5 hex
    digest.  ``(prefix, suffix)`` together cover the full 128-bit hash,
    so comparing both u64 halves is exactly full-hash equality (the
    loser scan uses this instead of trusting the 64-bit prefix alone)."""
    return _hex_u64_at(arr, 16)


def md5_hex(s: str | bytes) -> str:
    if isinstance(s, str):
        s = s.encode("utf-8")
    return hashlib.md5(s).hexdigest()


def md5_string_array(arr: pa.Array | pa.ChunkedArray) -> pa.Array:
    """md5 hex of each string in an Arrow column (content_hash for dedup).

    Matches DuckDB's ``md5(text)`` so exact-dedup has a SQL oracle.
    """
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    # md5 must run per-row; amortize via dictionary encoding (dup texts
    # hash once — exactly the rows exact-dedup collapses).
    dct = pc.dictionary_encode(arr)
    if isinstance(dct, pa.ChunkedArray):
        dct = dct.combine_chunks()
    uniq = [md5_hex(u) if u is not None else None for u in dct.dictionary.to_pylist()]
    return pc.take(pa.array(uniq, type=pa.string()), dct.indices)

def md5_u64_string_array(arr: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """First-64-bits-of-md5 hash of an Arrow string column → uint64.

    Same dictionary-encode amortization as :func:`hash_string_array`,
    but the hash is ``int(md5(s).hexdigest()[:16], 16)`` — i.e. the
    big-endian first 8 digest bytes, matching DuckDB's
    ``('0x' || substr(md5(s), 1, 16))::UBIGINT``.  Operators that want
    a SQL-oracle-checkable per-token hash (SimHash) use this; the
    blake2b variant stays for purely internal partitioning hashes.
    """
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    dct = pc.dictionary_encode(arr)
    if isinstance(dct, pa.ChunkedArray):
        dct = dct.combine_chunks()
    uniq = dct.dictionary.to_pylist()
    codes = dct.indices.to_numpy(zero_copy_only=False)
    table = np.fromiter(
        (
            int.from_bytes(
                hashlib.md5(
                    (u if u is not None else "").encode("utf-8")
                ).digest()[:8],
                "big",
            )
            for u in uniq
        ),
        dtype=np.uint64,
        count=len(uniq),
    )
    if table.size == 0:
        return np.zeros(0, dtype=np.uint64)
    return table[codes]


def md5_halves_string_array(
    arr: pa.Array | pa.ChunkedArray,
) -> tuple[np.ndarray, np.ndarray]:
    """Full 128-bit md5 of an Arrow string column as two uint64 halves
    ``(hi, lo)`` — digest bytes [0:8] / [8:16] big-endian, matching
    DuckDB's ``('0x' || substr(md5(s), 1, 16))::UBIGINT`` and
    ``('0x' || substr(md5(s), 17, 16))::UBIGINT``.  Dictionary-encode
    amortized like :func:`md5_u64_string_array`; comparing BOTH halves
    is exact full-hash equality (the same discipline as the loser
    scan)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    dct = pc.dictionary_encode(arr)
    if isinstance(dct, pa.ChunkedArray):
        dct = dct.combine_chunks()
    uniq = dct.dictionary.to_pylist()
    codes = dct.indices.to_numpy(zero_copy_only=False)
    n = len(uniq)
    hi = np.zeros(n, dtype=np.uint64)
    lo = np.zeros(n, dtype=np.uint64)
    for i, u in enumerate(uniq):
        d = hashlib.md5((u if u is not None else "").encode("utf-8")).digest()
        hi[i] = int.from_bytes(d[:8], "big")
        lo[i] = int.from_bytes(d[8:16], "big")
    if n == 0:
        return hi, lo
    return hi[codes], lo[codes]

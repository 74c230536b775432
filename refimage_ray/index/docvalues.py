"""Columnar doc values — rank-aligned metadata arrays for query-time
filtering and faceting (the Lucene DocValues / search-UI facet
aggregation analog).

Reference analog: ``TagFilter`` pages the WHOLE metadata table through
SQLite on every tag query (``/root/reference/src/refimage/dsl.py:
128-153`` — an unbounded paged scan into a Python list, per query).
Here the needed metadata columns load ONCE per searcher, aligned to
the same sorted doc_id universe the dense-rank TAAT scorer uses, so a
metadata predicate is an O(candidates) mask probe at query time and a
facet rollup is one ``np.bincount`` over the match set — no per-query
scan, no join, no shuffle.

Residency class (scale note): one narrow value per doc — identical to
``all_ids`` (``reader.load_doc_universe``), which the term-partitioned
serving layout already keeps resident (8 B/doc; categorical columns
are int32 dictionary codes, 4 B/doc).  An index that fits a serving
box affords its doc values.  At doc-partitioned (trillion-doc) scale
the same arrays shard with the doc ranges: each doc-shard actor holds
values for ITS docs, applies the filter/facet locally, and the driver
merges per-shard facet counts — counts are additive, so the merge is
exact.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.dataset as pads

#: predicate operators accepted by :meth:`DocValues.mask`
OPS = ("=", "==", "!=", "<", "<=", ">", ">=", "in", "not in")


@dataclass
class DVColumn:
    """One doc-value column, aligned to the sorted doc_id universe.

    ``values``: numeric columns keep their native numpy dtype
    (timestamps become int64 microseconds, flagged ``is_timestamp``);
    categorical (string) columns store int32 codes into ``categories``
    (sorted unique values — deterministic dictionary order), with -1
    for null.  ``null``: optional bool mask for non-categorical
    columns with nulls (SQL semantics: a null never satisfies any
    predicate, sorts last under order_by, and is skipped by
    histogram/sum aggregations).
    """

    values: np.ndarray
    categories: np.ndarray | None = None  # sorted unique strings
    null: np.ndarray | None = None        # bool mask; None = no nulls
    is_timestamp: bool = False

    @property
    def is_categorical(self) -> bool:
        return self.categories is not None

    def null_mask(self) -> "np.ndarray | None":
        """Null rows (bool mask) for either representation, or None."""
        if self.is_categorical:
            return self.values < 0 if (self.values < 0).any() else None
        return self.null


def _encode_column(arr: pa.ChunkedArray) -> DVColumn:
    t = arr.type
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        # Arrow dictionary-encode (vectorized, no per-row Python), then
        # remap first-occurrence dictionary order to SORTED order — the
        # sorted dictionary is what makes categorical order_by
        # lexicographic and '=' probes a binary search
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        denc = arr.dictionary_encode()
        dict_strs = np.asarray(denc.dictionary.to_pylist(), dtype=str)
        idx = denc.indices
        codes_raw = idx.fill_null(-1).to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        perm = np.argsort(dict_strs, kind="stable")
        cats = dict_strs[perm]
        remap = np.empty(len(dict_strs) + 1, np.int32)
        remap[perm] = np.arange(len(dict_strs), dtype=np.int32)
        remap[-1] = -1  # null slot (codes_raw -1 indexes it)
        return DVColumn(values=remap[codes_raw], categories=cats)
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    null = None
    if arr.null_count:
        null = arr.is_null().to_numpy(zero_copy_only=False)
    if pa.types.is_timestamp(t):
        # normalize to int64 microseconds so range predicates take a
        # plain integer (or np.datetime64 / ISO string, see _as_micros);
        # nulls are filled (never compared — see null_mask) so the cast
        # can't smuggle INT64_MIN sentinels into range predicates
        us = arr.cast(pa.timestamp("us")).fill_null(0).cast(pa.int64())
        return DVColumn(
            values=us.to_numpy(zero_copy_only=False).astype(np.int64),
            null=null, is_timestamp=True,
        )
    if pa.types.is_boolean(t):
        v = arr.fill_null(False).to_numpy(zero_copy_only=False)
        return DVColumn(values=v.astype(np.int64), null=null)
    if null is not None and (
        pa.types.is_integer(t) or pa.types.is_floating(t)
    ):
        # fill so integer columns stay integer (a null would degrade
        # to float64 NaN, which would MATCH every '!=' predicate)
        v = arr.fill_null(0).to_numpy(zero_copy_only=False)
        return DVColumn(values=v, null=null)
    return DVColumn(values=arr.to_numpy(zero_copy_only=False))


def _as_micros(value) -> int:
    """Accept int µs, np.datetime64, or an ISO string for timestamp
    predicates."""
    if isinstance(value, (int, np.integer)):
        return int(value)
    return int(np.datetime64(value, "us").astype(np.int64))


class DocValues:
    """Rank-aligned doc-value columns + predicate/facet kernels."""

    def __init__(self, all_ids: np.ndarray, cols: dict[str, DVColumn]) -> None:
        self.all_ids = all_ids
        self.cols = cols
        # mask cache: realistic filter sets are tiny and heavily reused
        # (a serving process sees the same lang/date filters all day);
        # masks are immutable once built — the artifact is read-only
        self._mask_cache: dict[tuple, np.ndarray] = {}

    def columns(self) -> list[str]:
        return sorted(self.cols)

    # ------------------------------------------------------------------
    # predicates
    # ------------------------------------------------------------------

    def _col_mask(self, col: str, op: str, value) -> np.ndarray:
        c = self.cols[col]
        if op in ("in", "not in") and not isinstance(
            value, (list, tuple, set, frozenset, np.ndarray)
        ):
            # a bare string would silently iterate per character
            raise ValueError(
                f"op {op!r} takes a list/tuple/set of values, got {value!r}"
            )
        if c.is_categorical:
            if op in ("in", "not in"):
                wanted = [str(v) for v in value]
            elif op in ("=", "==", "!="):
                wanted = [str(value)]
            else:
                raise ValueError(
                    f"op {op!r} not valid for categorical column {col!r}"
                )
            idx = np.searchsorted(c.categories, wanted)
            codes = [
                int(i) for i, w in zip(idx, wanted)
                if i < len(c.categories) and c.categories[i] == w
            ]
            m = np.isin(c.values, np.asarray(codes, dtype=np.int32))
            if op in ("!=", "not in"):
                # SQL semantics: NULL != x is NULL → a null row never
                # satisfies ANY predicate, negated ones included
                m = ~m & (c.values >= 0)
            return m
        # numeric / timestamp column
        def coerce(x):
            if isinstance(x, (int, float, np.number)):
                return x
            if c.is_timestamp:
                return _as_micros(x)  # np.datetime64 / ISO string
            raise ValueError(
                f"non-numeric predicate value {x!r} for numeric column "
                f"{col!r}"
            )

        if op in ("in", "not in"):
            m = np.isin(c.values, np.asarray([coerce(x) for x in value]))
        else:
            v = coerce(value)
            if op in ("=", "=="):
                m = c.values == v
            elif op == "!=":
                m = c.values != v
            elif op == "<":
                m = c.values < v
            elif op == "<=":
                m = c.values <= v
            elif op == ">":
                m = c.values > v
            elif op == ">=":
                m = c.values >= v
            else:
                raise ValueError(
                    f"unknown predicate op {op!r} (valid: {OPS})"
                )
        if op == "not in":
            m = ~m
        if c.null is not None:  # nulls never match (SQL semantics)
            m = m & ~c.null
        return m

    def mask(self, where) -> np.ndarray:
        """Boolean mask over universe ranks for a predicate in
        disjunctive normal form.  ``where`` is a list of ``(column, op,
        value)`` tuples (a conjunction), a ``{column: value}`` dict
        (equality sugar), or ``{"or": [conjunction, ...]}`` (OR of
        conjunctions — the ES bool ``should``-filter shape)."""
        dnf = normalize_dnf(where)

        def _vkey(v):
            # type-tagged so e.g. in [1, 2] and in ["1", "2"] (different
            # masks on a numeric column) never share a cache entry;
            # ndarrays key by their exact bytes — str(ndarray) ELIDES
            # elements past 1000, which would alias distinct filters
            if isinstance(v, np.ndarray):
                return ("ndarray", str(v.dtype), v.tobytes())
            if isinstance(v, (list, tuple, set, frozenset)):
                return tuple(sorted((type(x).__name__, str(x)) for x in v))
            return (type(v).__name__, str(v))

        key = tuple(
            tuple((c, o, _vkey(v)) for c, o, v in conj) for conj in dnf
        )
        hit = self._mask_cache.get(key)
        if hit is not None:
            return hit
        m = np.zeros(len(self.all_ids), dtype=bool)
        for conj in dnf:
            cm = np.ones(len(self.all_ids), dtype=bool)
            for col, op, value in conj:
                if col not in self.cols:
                    raise KeyError(
                        f"no doc-value column {col!r} (loaded: {self.columns()})"
                    )
                cm &= self._col_mask(col, op, value)
            m |= cm
        if len(self._mask_cache) < 64:
            self._mask_cache[key] = m
        return m

    # ------------------------------------------------------------------
    # facets
    # ------------------------------------------------------------------

    def facet_counts(
        self, col: str, ranks: np.ndarray, top: int | None = None
    ) -> list[tuple[str, int]]:
        """Value → match-count over a categorical column, for the docs
        at ``ranks``; sorted (count desc, value asc), nulls excluded.
        One bincount over the match set — O(|matches| + |dictionary|).
        """
        c = self.cols[col]
        if not c.is_categorical:
            raise ValueError(
                f"{col!r} is numeric — use facet_histogram(width=...)"
            )
        codes = c.values[ranks]
        cnt = np.bincount(codes[codes >= 0], minlength=len(c.categories))
        nz = np.flatnonzero(cnt)
        order = sorted(nz.tolist(), key=lambda i: (-int(cnt[i]), str(c.categories[i])))
        if top is not None:
            order = order[:top]
        return [(str(c.categories[i]), int(cnt[i])) for i in order]

    def facet_sums(
        self, col: str, value_col: str, ranks: np.ndarray,
        top: int | None = None,
    ) -> list[tuple[str, float]]:
        """Per-bucket SUM of a numeric doc value over the match set —
        the sub-aggregation flavor of the facet panel (e.g. total
        tokens per language among matches).  One weighted bincount;
        buckets with zero matching docs are omitted (a present bucket
        may still sum to 0); sorted (sum desc, value asc).  Integer
        value columns return exact ints (float64 bincount is exact
        below 2^53 — far above any per-bucket token mass here)."""
        c = self.cols[col]
        v = self.cols[value_col]
        if not c.is_categorical:
            raise ValueError(f"{col!r} must be categorical to facet by")
        if v.is_categorical:
            raise ValueError(f"{value_col!r} must be numeric to sum")
        codes = c.values[ranks]
        ok = codes >= 0
        w = v.values[ranks].astype(np.float64)
        if v.null is not None:  # SQL SUM skips null addends
            w = np.where(v.null[ranks], 0.0, w)
        w = w[ok]
        tot = np.bincount(codes[ok], weights=w, minlength=len(c.categories))
        cnt = np.bincount(codes[ok], minlength=len(c.categories))
        nz = np.flatnonzero(cnt)
        order = sorted(
            nz.tolist(), key=lambda i: (-tot[i], str(c.categories[i]))
        )
        if top is not None:
            order = order[:top]
        as_int = v.values.dtype.kind in "iu"
        return [
            (str(c.categories[i]), int(tot[i]) if as_int else float(tot[i]))
            for i in order
        ]

    def facet_histogram(
        self, col: str, ranks: np.ndarray, width
    ) -> list[tuple[float, int]]:
        """Fixed-width bucket → match-count over a numeric column
        (bucket key = floor(v / width) · width), ascending buckets."""
        c = self.cols[col]
        if c.is_categorical:
            raise ValueError(f"{col!r} is categorical — use facet_counts")
        if not (float(width) > 0):
            raise ValueError(f"histogram width must be > 0, got {width!r}")
        v = c.values[ranks]
        if c.null is not None:  # SQL semantics: nulls land in no bucket
            v = v[~c.null[ranks]]
        if np.issubdtype(v.dtype, np.integer) and float(width).is_integer():
            b = (v // int(width)) * int(width)
        else:
            b = np.floor(v / float(width)) * float(width)
        uniq, cnt = np.unique(b, return_counts=True)
        return [
            (int(u) if float(u).is_integer() else float(u), int(n))
            for u, n in zip(uniq.tolist(), cnt.tolist())
        ]


    def facet_date_histogram(
        self, col: str, ranks: np.ndarray, interval: str
    ) -> list[tuple[int, int]]:
        """Calendar-interval bucket → match-count over a timestamp-µs
        column (ES ``date_histogram``).  Unlike the fixed-width
        histogram, month/year buckets are irregular — computed by
        numpy datetime64 truncation, which floors toward -inf exactly
        like DuckDB ``date_trunc`` (verified incl. pre-epoch values);
        weeks are Monday-aligned (ISO / DuckDB convention, NOT numpy's
        Thursday-epoch [W] unit).  Bucket keys are the boundary's epoch
        µs (int64) — additive across doc shards like every facet."""
        c = self.cols[col]
        if c.is_categorical:
            raise ValueError(f"{col!r} is categorical — use facet_counts")
        if not c.is_timestamp:
            raise ValueError(
                f"{col!r} is not a timestamp column — use facet_histogram "
                "for plain numeric buckets"
            )
        v = c.values[ranks].astype(np.int64)
        if c.null is not None:
            v = v[~c.null[ranks]]
        dt = v.astype("datetime64[us]")
        if interval == "week":
            days = dt.astype("datetime64[D]").astype(np.int64)
            b = (((days + 3) // 7) * 7 - 3) * 86_400_000_000
        elif interval in ("hour", "day", "month", "year"):
            unit = {"hour": "h", "day": "D", "month": "M", "year": "Y"}
            b = (
                dt.astype(f"datetime64[{unit[interval]}]")
                .astype("datetime64[us]").astype(np.int64)
            )
        else:
            raise ValueError(
                f"interval must be hour/day/week/month/year, got {interval!r}"
            )
        uniq, cnt = np.unique(b, return_counts=True)
        return [(int(u), int(n)) for u, n in zip(uniq.tolist(), cnt.tolist())]


    def composite_counts(
        self,
        cols: list[str],
        ranks: np.ndarray,
        size: int,
        after: "tuple | None" = None,
    ) -> tuple[list[dict], "tuple | None"]:
        """ES ``composite`` aggregation: the distinct combinations of
        the given categorical columns over the match set, ordered by
        key tuple ASC, paged with an exclusive ``after`` cursor — the
        bucket-pagination primitive that keeps aggregation responses
        bounded no matter how many buckets exist.  Docs null in any
        key column are skipped (the ES default for missing values).

        Returns ``(buckets, after_key)`` where each bucket is
        ``{"key": (v1, ...), "doc_count": n}`` and ``after_key`` is the
        last key of the page (None when the page exhausts the
        buckets).  One lexsort over the match rows — no materialized
        full bucket list beyond the distinct combinations present.
        """
        if size <= 0:
            raise ValueError(f"size must be > 0, got {size}")
        codes, cats = [], []
        for col in cols:
            c = self.cols[col]
            if not c.is_categorical:
                raise ValueError(
                    f"composite key column {col!r} must be categorical"
                )
            codes.append(c.values[ranks])
            cats.append(c.categories)
        valid = np.ones(len(ranks), dtype=bool)
        for cd in codes:
            valid &= cd >= 0
        codes = [cd[valid] for cd in codes]
        n = int(valid.sum())
        if n == 0:
            return [], None
        # lexsort: last key is primary → reverse so cols[0] is primary
        order = np.lexsort(tuple(reversed(codes)))
        sorted_codes = [cd[order] for cd in codes]
        change = np.zeros(n, dtype=bool)
        change[0] = True
        for sc in sorted_codes:
            change[1:] |= sc[1:] != sc[:-1]
        bounds = np.flatnonzero(change)
        counts = np.diff(np.append(bounds, n))
        keys = [
            tuple(str(cats[j][sorted_codes[j][b]]) for j in range(len(cols)))
            for b in bounds
        ]
        start = 0
        if after is not None:
            import bisect

            # first bucket with key > after (keys ascend by
            # construction: codes index sorted category arrays)
            start = bisect.bisect_right(keys, tuple(str(x) for x in after))
        page = [
            {"key": keys[i], "doc_count": int(counts[i])}
            for i in range(start, min(start + size, len(keys)))
        ]
        after_key = (
            page[-1]["key"]
            if page and start + size < len(keys)
            else None
        )
        return page, after_key

    def numeric_values(self, col: str, ranks: np.ndarray) -> np.ndarray:
        """Match-set values of a numeric column, nulls AND NaN values
        dropped (SQL valid-only rank basis, the same rule as
        ``stages/selection.kth_smallest``) — the gather primitive
        behind percentiles (local AND the docpart capped-gather path).
        Dropping NaN here keeps the capped gather and the above-cap
        histogram-bisection fallback on ONE rank basis."""
        c = self.cols[col]
        if c.is_categorical:
            raise ValueError(f"{col!r} is categorical — use facet_counts")
        v = c.values[ranks]
        if c.null is not None:
            v = v[~c.null[ranks]]
        if v.dtype.kind == "f":
            v = v[~np.isnan(v)]
        return v

    def facet_percentiles(
        self, col: str, ranks: np.ndarray, qs: "list[float]"
    ) -> list[tuple[float, float]]:
        """Exact percentiles of a numeric column over the match set
        (ES ``percentiles`` aggregation, but exact): value at rank
        ``ceil(q·n)`` — the same discrete definition as
        ``stages/selection.py``, so the SQL mirror is one
        ``row_number()`` window.  ``np.partition`` selection, O(n) per
        quantile.  NOT additive across doc shards (unlike every other
        facet) — the doc-partitioned searchers run a CAPPED per-shard
        value gather and rank-select over the concatenation, falling
        back above the cap to exact histogram-bisection selection with
        an O(buckets)-per-round exchange (see ``docpart`` facets)."""
        return select_percentiles(self.numeric_values(col, ranks), qs)


def add_computed_column(
    dv: "DocValues", name: str, sources: "list[str]", fn
) -> None:
    """Register a RUNTIME FIELD (ES runtime-mapping analog): a numeric
    column computed once from resident source columns and cached as a
    normal DVColumn — after registration it works in every ``where`` /
    ``order_by`` / facet / percentile surface with zero special-casing.

    ``fn`` receives ``{source: np.ndarray}`` (full universe length,
    rank-aligned) and must return a numeric array of the same length.
    Rows where ANY source is null are null in the result (SQL
    semantics ride along for free through the null mask)."""
    srcs = {s: dv.cols[s] for s in sources}
    for s, c in srcs.items():
        if c.is_categorical:
            raise ValueError(
                f"runtime field source {s!r} is categorical — compute "
                "from numeric columns"
            )
    out = np.asarray(fn({s: c.values for s, c in srcs.items()}))
    n = len(dv.all_ids)
    if out.shape != (n,):
        raise ValueError(
            f"runtime field fn must return shape ({n},), got {out.shape}"
        )
    null = None
    masks = [c.null for c in srcs.values() if c.null is not None]
    if masks:
        null = np.logical_or.reduce(masks)
    dv.cols[name] = DVColumn(values=out, null=null)


def select_percentiles(
    values: np.ndarray, qs: "list[float]"
) -> list[tuple[float, float]]:
    """Rank-ceil(q·n) selection over a gathered value array — shared by
    the local facet kernel and the docpart gather-merge so both paths
    use ONE definition."""
    out: list[tuple[float, float]] = []
    n = len(values)
    for q in qs:
        if not 0.0 < q <= 1.0:
            raise ValueError(f"percentile must be in (0, 1], got {q}")
        if n == 0:
            out.append((float(q), float("nan")))
            continue
        k = max(1, int(np.ceil(q * n)))
        out.append((float(q), float(np.partition(values, k - 1)[k - 1])))
    return out


def normalize_where(where) -> list[tuple[str, str, object]]:
    """Canonical predicate list from the accepted sugar forms."""
    if isinstance(where, dict):
        return [(c, "=", v) for c, v in sorted(where.items())]
    out = []
    for cond in where:
        col, op, value = cond
        if op not in OPS:
            raise ValueError(f"unknown predicate op {op!r} (valid: {OPS})")
        out.append((col, op, value))
    return out


def normalize_dnf(where) -> list[list[tuple[str, str, object]]]:
    """Canonical disjunctive normal form: a list of conjunctions.

    Accepted shapes: any conjunction form (``[(col, op, val), ...]`` or
    the ``{col: val}`` equality dict) → one disjunct; or the explicit
    OR-of-conjunctions ``{"or": [conjunction, ...]}`` (the ES bool
    ``should``-filter shape).  DNF is boolean-complete here because the
    op set carries its own negations (``!=``, ``not in``)."""
    if (
        isinstance(where, dict)
        and set(where) == {"or"}
        and isinstance(where["or"], (list, tuple))
    ):
        disjuncts = [normalize_where(w) for w in where["or"]]
        if not disjuncts:
            raise ValueError('{"or": [...]} needs at least one clause group')
        return disjuncts
    return [normalize_where(where)]


def where_columns(where) -> list[str]:
    return sorted({c for conj in normalize_dnf(where) for c, _, _ in conj})


def merge_facet_results(parts: list[dict], top: int | None = None) -> dict:
    """Merge per-shard :meth:`~refimage_ray.query.engine._SearcherBase.
    facets` results from DISJOINT doc subsets — counts are additive, so
    the merge is exact (the doc-partitioned scatter-gather path).
    ``top`` is applied only after the merge (a per-shard top-N could
    drop a value that is globally frequent but locally rare)."""
    total = 0
    fac: dict[str, dict[str, int]] = {}
    hist: dict[str, dict] = {}
    dhist: dict[str, dict] = {}
    sums: dict[str, dict] = {}
    for p in parts:
        total += int(p["total"])
        for col, pairs in p.get("facets", {}).items():
            acc = fac.setdefault(col, {})
            for v, n in pairs:
                acc[v] = acc.get(v, 0) + int(n)
        for col, pairs in p.get("histograms", {}).items():
            acc = hist.setdefault(col, {})
            for b, n in pairs:
                acc[b] = acc.get(b, 0) + int(n)
        for col, pairs in p.get("date_histograms", {}).items():
            acc = dhist.setdefault(col, {})
            for b, n in pairs:
                acc[b] = acc.get(b, 0) + int(n)
        for col, pairs in p.get("sums", {}).items():
            acc = sums.setdefault(col, {})
            for v, s in pairs:
                acc[v] = acc.get(v, 0) + s
    out = {
        "total": total,
        "facets": {
            col: sorted(acc.items(), key=lambda p: (-p[1], p[0]))[:top]
            for col, acc in fac.items()
        },
        "histograms": {
            col: sorted(acc.items()) for col, acc in hist.items()
        },
    }
    if dhist:
        out["date_histograms"] = {
            col: sorted(acc.items()) for col, acc in dhist.items()
        }
    if sums:
        out["sums"] = {
            col: sorted(acc.items(), key=lambda p: (-p[1], p[0]))[:top]
            for col, acc in sums.items()
        }
    return out


def encode_value_columns(t: pa.Table, all_ids: np.ndarray) -> DocValues:
    """Build a :class:`DocValues` directly from an in-memory table of
    (doc_id + value columns) — the per-doc-shard loading path of the
    doc-partitioned layout, where each shard's values file IS its doc
    universe."""
    ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(ids, kind="stable")
    if not np.array_equal(ids[order], all_ids):
        raise ValueError("value rows do not match the shard's doc universe")
    cols: dict[str, DVColumn] = {}
    for name in t.schema.names:
        if name == "doc_id":
            continue
        enc = _encode_column(t[name])
        enc.values = np.ascontiguousarray(enc.values[order])
        cols[name] = enc
    return DocValues(all_ids, cols)


def load_doc_values(
    index_dir: str, columns: list[str], all_ids: np.ndarray
) -> DocValues:
    """Load doc-value columns from the ``docs/`` artifact, aligned to
    ``all_ids`` (the sorted universe the dense-rank scorer uses) — one
    narrow column read per column, once per searcher.

    ``docs/`` keeps one row per staged doc (exact-dup losers included);
    doc_ids are unique by construction, so a stable sort by doc_id IS
    the universe order.  Losers/tombstoned docs never appear among
    scoring candidates, so their values are loaded but never probed.
    """
    ds = pads.dataset(os.path.join(index_dir, "docs"))
    missing = [c for c in columns if c not in ds.schema.names]
    if missing:
        raise KeyError(
            f"docs/ artifact has no column(s) {missing}; available: "
            f"{[n for n in ds.schema.names if n != 'text']}"
        )
    t = ds.to_table(columns=["doc_id"] + list(columns))
    ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(ids, kind="stable")
    if len(ids) != len(all_ids) or not np.array_equal(ids[order], all_ids):
        raise ValueError(
            "docs/ doc_ids do not match the loaded universe — artifact "
            "mutated since the searcher loaded (reload the searcher)"
        )
    cols: dict[str, DVColumn] = {}
    for name in columns:
        enc = _encode_column(t[name])
        enc.values = np.ascontiguousarray(enc.values[order])
        cols[name] = enc
    return DocValues(all_ids, cols)

"""Capacity planner — the engine's partitioning assumptions, executable.

Given corpus shape and cluster shape, recommend the build layout
(shards, salt buckets, pack batch) and predict the big numbers
(exchange bytes, partition sizes, artifact size) from the measured
constants in BENCH/BASELINE.md.  This is the documentation of the
partitioning assumptions each custom operator relies on, in a form a
pytest can hold to invariants.

Assumptions encoded (and where they come from):
- postings ≈ n_docs × avg_doc_tokens × UNIQUE_RATIO (per-doc term
  dedup before the exchange; measured ~0.55-0.75 on webtext, default
  0.65).
- rank-packed exchange ships ~2.8 B/posting (measured: 267 MB for
  97 M postings), absolute-id fallback ~6-8 B/posting.
- reducers = num_shards × salt_buckets; target partitions of
  0.5-4 M postings: small enough that one reducer's group (~tens of
  MB) sits comfortably in a worker heap, large enough that per-task
  overhead amortizes.
- hot terms (df ≥ hot_df_fraction × n_docs) are salted across
  ``salt_buckets`` doc-range splits so no reducer owns a whole
  stopword posting list — the skew bound is max_hot_df/salt_buckets.
- shards should be ≥ 2× total cores so the exchange's reduce side
  keeps every core busy despite stragglers, and a multiple of the
  serving actor count so shard→actor assignment balances.
"""

from __future__ import annotations

from dataclasses import asdict, dataclass

UNIQUE_RATIO = 0.65          # per-doc unique-term ratio (webtext measure)
RANK_BYTES_PER_POSTING = 2.8  # measured, BENCH/BASELINE.md (rank exchange)
ABS_BYTES_PER_POSTING = 7.0   # absolute-id fallback midpoint
ARTIFACT_BYTES_PER_POSTING = 5.5  # delta+varbyte parquet, measured
TARGET_PARTITION_POSTINGS = 2_000_000  # 0.5-4 M sweet spot midpoint


@dataclass
class BuildPlan:
    n_docs: int
    est_postings: int
    num_shards: int
    salt_buckets: int
    est_reducers: int
    est_partition_postings_p50: int
    exchange: str
    est_exchange_mb: float
    est_artifact_mb: float
    notes: tuple


def _pow2_at_least(x: float) -> int:
    n = 1
    while n < x:
        n *= 2
    return n


def plan_build(
    n_docs: int,
    avg_doc_tokens: float,
    *,
    nodes: int = 1,
    cpus_per_node: int = 32,
    hot_df_fraction: float = 0.01,
) -> BuildPlan:
    """Recommend a build layout for a corpus/cluster shape.

    Pure arithmetic — safe to run anywhere (no Ray).
    """
    if n_docs <= 0 or avg_doc_tokens <= 0:
        raise ValueError("n_docs and avg_doc_tokens must be positive")
    total_cores = max(1, nodes * cpus_per_node)
    est_postings = int(n_docs * avg_doc_tokens * UNIQUE_RATIO)

    # salt buckets: bound the largest hot-term slice per reducer to the
    # partition target; hottest df ≈ n_docs (a true stopword).  The cap
    # exists only to bound reducer count — at 10^12 docs a stopword
    # needs thousands of doc-range splits, and doc-range salting
    # supports that (splits are disjoint increasing ranges; merge is
    # concatenation).
    max_hot_df = n_docs
    salt = max(1, round(max_hot_df / TARGET_PARTITION_POSTINGS))
    salt_buckets = min(8192, _pow2_at_least(salt))

    # reduce tasks = shards × salt (gkey = shard·S + salt), so the
    # parallelism floor (≥ 2× cores, straggler slack) and the
    # task-sizing target (≈ est_postings / TARGET per reducer) both
    # constrain the PRODUCT, not shards alone — serving can assign
    # many part files per actor regardless of shard count.
    want_reducers = max(
        2 * total_cores, est_postings / TARGET_PARTITION_POSTINGS
    )
    num_shards = _pow2_at_least(max(1.0, want_reducers / salt_buckets))

    reducers = num_shards * salt_buckets
    # rank-packed exchange requires broadcasting the sorted (doc_id,
    # dl) universe (~12 B/doc) to every worker — worth it to ~50 M
    # docs per job (the engine's NARROW_LOCAL_ROWS class); beyond
    # that the absolute-id pack is the path (or per-doc-range
    # sub-builds, each with its own broadcastable universe)
    exchange = "rank" if n_docs <= 50_000_000 else "absolute"
    bpp = RANK_BYTES_PER_POSTING if exchange == "rank" \
        else ABS_BYTES_PER_POSTING
    plan = BuildPlan(
        n_docs=n_docs,
        est_postings=est_postings,
        num_shards=num_shards,
        salt_buckets=salt_buckets,
        est_reducers=reducers,
        est_partition_postings_p50=max(1, est_postings // reducers),
        exchange=exchange,
        est_exchange_mb=round(est_postings * bpp / 1e6, 1),
        est_artifact_mb=round(
            est_postings * ARTIFACT_BYTES_PER_POSTING / 1e6, 1
        ),
        notes=(
            f"hot terms: df >= {hot_df_fraction:.3f}*N salted over "
            f"{salt_buckets} doc-range buckets (skew bound "
            f"{n_docs // max(1, salt_buckets):,} postings/reducer)",
            f"shards = {num_shards} >= 2x{total_cores} cores; power of 2",
            (f"rank exchange: broadcast (doc_id, dl) universe "
             f"~{n_docs * 12 / 1e6:.0f} MB, one ray.put per job"
             if exchange == "rank" else
             "absolute-id exchange: universe too large to broadcast; "
             "rank path returns for per-doc-range sub-builds"),
        ) + ((
            f"reducer count {reducers:,} exceeds ~2M/job (driver task "
            "metadata): run ceil(reducers/2M) doc-range sub-builds and "
            "combine with index.lifecycle.merge_indexes (salt-order "
            "concatenation keeps partitions sorted)",
        ) if reducers > 2_000_000 else ()),
    )
    return plan


def plan_dict(plan: BuildPlan) -> dict:
    d = asdict(plan)
    d["notes"] = list(plan.notes)
    return d


def plan_mixture(
    token_budget: float,
    domain_tokens: dict[str, float],
    max_epochs: float = 4.0,
    alpha: float = 1.0,
) -> dict:
    """Data-constrained mixture allocation (the "how many epochs of
    each domain" planning step of a 100-TB training run, after the
    per-domain corpora are curated and counted).

    Target shares are proportional to ``available^alpha`` (alpha=1 →
    natural proportions; alpha<1 flattens toward uniform, the same
    temperature knob as ``training.lang_temperature_sample``).  Each
    domain's usable tokens cap at ``max_epochs × available`` — the
    empirical repetition limit beyond which extra epochs of the same
    data stop helping (Muennighoff et al. 2023, "Scaling
    Data-Constrained Language Models") — and capped domains' unused
    budget WATER-FILLS into the uncapped ones at their relative
    shares until the budget is spent or everything is capped.

    Pure deterministic arithmetic (no I/O): returns per-domain
    ``{tokens, epochs, share}`` plus ``shortfall`` (budget that could
    not be placed because every domain hit its cap).
    """
    if token_budget < 0:
        raise ValueError(f"token_budget must be >= 0, got {token_budget}")
    if alpha <= 0:
        raise ValueError(f"alpha must be > 0, got {alpha}")
    if any(v < 0 for v in domain_tokens.values()):
        raise ValueError("domain token counts must be >= 0")
    caps = {d: max_epochs * n for d, n in domain_tokens.items()}
    weights = {d: (n ** alpha if n > 0 else 0.0)
               for d, n in domain_tokens.items()}
    alloc = {d: 0.0 for d in domain_tokens}
    remaining = float(token_budget)
    open_set = {d for d, w in weights.items() if w > 0}
    # water-filling: give every open domain its share; domains that hit
    # their cap close, freeing budget for the rest.  Each round closes
    # at least one domain, so this terminates in <= |domains| rounds.
    while remaining > 1e-9 and open_set:
        wsum = sum(weights[d] for d in open_set)
        closed_any = False
        for d in sorted(open_set):
            give = remaining * weights[d] / wsum
            room = caps[d] - alloc[d]
            if give >= room - 1e-12:
                alloc[d] = caps[d]
                open_set.discard(d)
                closed_any = True
        taken = 0.0
        if not closed_any:
            # nobody capped: place the whole remainder proportionally
            for d in sorted(open_set):
                alloc[d] += remaining * weights[d] / wsum
            taken = remaining
        remaining = float(token_budget) - sum(alloc.values()) \
            if closed_any else remaining - taken
    out = {
        d: {
            # clamp to the cap: round() alone can round a capped
            # allocation UP past max_epochs * available (e.g. 0.34375
            # -> 0.344), violating the epoch-cap invariant
            "tokens": min(round(alloc[d], 3), caps[d]),
            "epochs": min(round(alloc[d] / domain_tokens[d], 4), max_epochs)
            if domain_tokens[d] > 0 else 0.0,
            "share": round(alloc[d] / token_budget, 6)
            if token_budget > 0 else 0.0,
        }
        for d in sorted(domain_tokens)
    }
    return {
        "domains": out,
        "placed": round(sum(alloc.values()), 3),
        "shortfall": round(max(0.0, token_budget - sum(alloc.values())), 3),
    }

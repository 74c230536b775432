"""Driver contract for the graft builder (Ray Data target).

``entry()`` — flagship build+query at sf0.001.
``queries()`` — one entry per implemented operator/pipeline
  (SURVEY.md §2 inventory + training-data extensions).
``oracle_sql()`` — DuckDB-equivalent SQL for every SQL-expressible
  query (same column names, same rounding).  Deterministic "approx"
  ops are value-oracled by embedding their seeded probe geometry as
  SQL literals (LSH hyperplanes, IVF / k-means centroids, PQ
  codebooks, MinHash parameters); only genuinely SQL-inexpressible
  ops (greedy BPE recursion, iterative Lloyd/EM training,
  eigensolver, SemDeDup's trained clustering) are rows-only by
  omission.

Ray is initialised by the driver BEFORE this module is imported; no
``ray.init``/``ray.shutdown`` here or in the library.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

# ---------------------------------------------------------------------------
# shared SQL fragments (tokenizer MUST mirror refimage_ray.functions.text:
# lowercase + [a-z0-9]+ extraction)
# ---------------------------------------------------------------------------

_TOKS = (
    "SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term "
    "FROM documents"
)
_TF = (
    f"SELECT doc_id, term, count(*) AS tf FROM ({_TOKS}) GROUP BY doc_id, term"
)

# S-stemmed token stream — mirrors functions.text.s_stem rule-for-rule
# (each suffix branch is FINAL: exception -> unchanged; the len>1
# guard keeps bare 's' tokens alive)
_TOKS_STEM = f"""SELECT doc_id,
  CASE
    WHEN t LIKE '%ies' THEN
      CASE WHEN t LIKE '%eies' OR t LIKE '%aies' THEN t
           ELSE substr(t, 1, length(t) - 3) || 'y' END
    WHEN t LIKE '%es' THEN
      CASE WHEN t LIKE '%aes' OR t LIKE '%ees' OR t LIKE '%oes' THEN t
           ELSE substr(t, 1, length(t) - 1) END
    WHEN t LIKE '%s' THEN
      CASE WHEN length(t) = 1 OR t LIKE '%us' OR t LIKE '%ss' THEN t
           ELSE substr(t, 1, length(t) - 1) END
    ELSE t
  END AS term
FROM (SELECT doc_id, t FROM (
  SELECT doc_id,
         unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS t
  FROM documents))"""

# fixed 20-word window segmentation for line/segment dedup — mirrors
# stages/lines._segment_arrays: split on single space, windows of 20,
# last window ragged; '' splits to [''] (one empty segment)
_SEGS_CTE = """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
segs AS (
  SELECT doc_id, t.g AS seg_idx,
         array_to_string(ws[t.g*20+1 : t.g*20+20], ' ') AS seg
  FROM w, UNNEST(generate_series(0, CAST(ceil(len(ws)/20.0) AS INT)-1)) AS t(g)
),
segcnt AS (SELECT seg, count(*) AS n FROM segs GROUP BY seg)"""

# crawl-snapshot pair derivation + diff — mirrors
# pipelines/training._snapshot_pair and stages/crawl.crawl_delta
_CRAWL_DELTA_CTE = """WITH old AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 10 != 0
),
new AS (
  SELECT doc_id,
         CASE WHEN doc_id % 10 = 5 THEN text || ' v2' ELSE text END AS text
  FROM documents WHERE doc_id % 10 != 9
),
m AS (
  SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
         CASE WHEN n.doc_id IS NULL THEN 'removed'
              WHEN o.doc_id IS NULL THEN 'added'
              WHEN o.text = n.text THEN 'unchanged'
              ELSE 'changed' END AS status
  FROM old o FULL OUTER JOIN new n ON o.doc_id = n.doc_id
)"""

# 64-bit SimHash per doc, bit-for-bit the engine's simhash_batch: token
# hash = first 16 md5 hex chars as UBIGINT (functions/hashing.
# md5_u64_string_array), ±1 per bit over token OCCURRENCES, bit set iff
# sum > 0, tokenless docs → 0.
_SIMHASH = f"""
WITH th AS (
  SELECT doc_id, ('0x' || substr(md5(term), 1, 16))::UBIGINT AS h
  FROM ({_TOKS})
),
bits AS (
  SELECT doc_id, b AS bit,
         SUM(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS s
  FROM th, (SELECT unnest(generate_series(0, 63)) AS b)
  GROUP BY doc_id, b
),
shx AS (
  SELECT doc_id,
         SUM(CASE WHEN s > 0 THEN (1::UBIGINT << bit) ELSE 0::UBIGINT END)
           AS simhash
  FROM bits GROUP BY doc_id
)
SELECT d.doc_id, COALESCE(shx.simhash, 0::UBIGINT) AS simhash
FROM documents d LEFT JOIN shx USING (doc_id)
"""

_FACET_COUNTS_SQL = f"""
WITH m AS (
  SELECT DISTINCT doc_id FROM ({_TOKS}) WHERE term IN ('spark', 'vector')
),
j AS (SELECT d.lang, d.source FROM documents d JOIN m USING (doc_id))
SELECT 'lang' AS facet, lang AS value, CAST(count(*) AS BIGINT) AS n_docs
FROM j GROUP BY lang
UNION ALL
SELECT 'source', source, CAST(count(*) AS BIGINT) FROM j GROUP BY source
"""

_STOPLIST_SQL = (
    "'the','a','an','and','or','of','to','in','for','on','with','at','by',"
    "'from','is','are','was','were','be','been','it','its','this','that',"
    "'these','those','as','not','no'"
)


def _langid_markers() -> str:
    """Marker VALUES list generated from ``stages.analysis.LangId`` —
    single source of truth.  ``index_in`` credits a token duplicated
    across profiles (e.g. 'de', 'la', 'en') to the FIRST profile in
    dict order — replicated by deduplicating the same way."""
    from refimage_ray.stages.analysis import LangId

    l = LangId()
    first: dict[str, str] = {}
    for w, lang in zip(l.vocab, l.lang_of):
        first.setdefault(w, lang)
    return ", ".join(f"('{w}', '{lang}')" for w, lang in first.items())


def _langid_sql() -> str:
    """SQL mirror of ``stages.analysis.LangId``.  Tie-break: numpy
    argmax picks the first (alphabetically smallest) language →
    ``ORDER BY cnt DESC, lang``."""
    vals = _langid_markers()
    return f"""
WITH toks AS ({_TOKS}),
dl AS (SELECT d.doc_id, COALESCE(t.c, 0) AS dl FROM documents d
       LEFT JOIN (SELECT doc_id, count(*) AS c FROM toks GROUP BY doc_id) t
       USING (doc_id)),
markers(word, lang) AS (VALUES {vals}),
hits AS (
  SELECT toks.doc_id, m.lang, count(*) AS cnt
  FROM toks JOIN markers m ON toks.term = m.word
  GROUP BY toks.doc_id, m.lang
),
best AS (
  SELECT doc_id, lang, cnt,
         row_number() OVER (PARTITION BY doc_id ORDER BY cnt DESC, lang) AS rn
  FROM hits
)
SELECT d.doc_id, COALESCE(b.lang, 'und') AS pred_lang,
       round(COALESCE(b.cnt, 0) * 1.0 / GREATEST(dl.dl, 1), 6)
         AS lang_confidence
FROM documents d JOIN dl USING (doc_id)
LEFT JOIN (SELECT * FROM best WHERE rn = 1) b ON d.doc_id = b.doc_id
"""


def _curated_sql() -> str:
    """SQL mirror of ``pipelines.curate.curated_doc_ids`` defaults:
    n_tokens >= 30, stopword_ratio >= 0.04 (same float division both
    sides), pred_lang = 'en' ('und' docs have no marker hits and drop
    at the join), exact dedup keeper = min doc_id per md5(text)."""
    vals = _langid_markers()
    return f"""
WITH toks AS ({_TOKS}),
agg AS (
  SELECT doc_id, count(*) AS n_tokens,
         sum(CASE WHEN term IN ({_STOPLIST_SQL}) THEN 1 ELSE 0 END) AS n_stop
  FROM toks GROUP BY doc_id
),
markers(word, lang) AS (VALUES {vals}),
hits AS (
  SELECT toks.doc_id, m.lang, count(*) AS cnt
  FROM toks JOIN markers m ON toks.term = m.word
  GROUP BY toks.doc_id, m.lang
),
best AS (
  SELECT doc_id, lang,
         row_number() OVER (PARTITION BY doc_id ORDER BY cnt DESC, lang) AS rn
  FROM hits
),
keep AS (
  SELECT d.doc_id, md5(d.text) AS h
  FROM documents d
  JOIN agg USING (doc_id)
  JOIN (SELECT doc_id, lang FROM best WHERE rn = 1) b USING (doc_id)
  WHERE agg.n_tokens >= 30
    AND agg.n_stop * 1.0 / agg.n_tokens >= 0.04
    AND b.lang = 'en'
)
SELECT min(doc_id) AS doc_id FROM keep GROUP BY h
"""


def _curated_packed_sql() -> str:
    """Curation keep-set (``_curated_sql``) → packed-stream checksums
    over the survivors (same window shape as ``packed_sequences``,
    vocab built over the survivors)."""
    return f"""
WITH keep AS ({_curated_sql()}),
toks AS (
  SELECT d.doc_id, regexp_extract_all(lower(d.text), '[a-z0-9]+') AS t
  FROM documents d JOIN keep USING (doc_id)
),
pos AS (
  SELECT doc_id, t[i] AS term, i
  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(t))) AS i)
),
vocab AS (
  SELECT term, row_number() OVER (ORDER BY term) - 1 AS vid
  FROM (SELECT DISTINCT term FROM pos)
),
stream AS (
  SELECT row_number() OVER (ORDER BY p.doc_id, p.i) - 1 AS gp, v.vid
  FROM pos p JOIN vocab v USING (term)
)
SELECT CAST(gp // 256 AS BIGINT) AS seq_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(sum(vid) AS BIGINT) AS sum_ids,
       CAST(sum((gp % 256 + 1) * vid) AS BIGINT) AS possum_ids
FROM stream GROUP BY seq_id
"""


def _lm_gated_packed_sql(max_ppl: float = 32.0) -> str:
    """Curation keep-set ∩ add-1 bigram-LM perplexity gate (rounded to
    3dp, the engine's gate basis) → packed-stream checksums over the
    survivors — the END-TO-END training-prep pipeline under one value
    oracle."""
    return f"""
WITH keep AS ({_curated_sql()}),
alltoks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t
  FROM documents
),
lmpos AS (
  SELECT doc_id, t[i - 1] AS prev, t[i] AS cur
  FROM alltoks, LATERAL (SELECT unnest(generate_series(2, len(t))) AS i) _
),
uni AS (
  SELECT w, CAST(count(*) AS DOUBLE) AS c
  FROM (SELECT unnest(t) AS w FROM alltoks) GROUP BY w
),
v AS (SELECT CAST(count(*) AS DOUBLE) AS v FROM uni),
big AS (
  SELECT prev, cur, CAST(count(*) AS DOUBLE) AS c FROM lmpos GROUP BY 1, 2
),
scored AS (
  SELECT p.doc_id,
         round(exp(-avg(ln((coalesce(b.c, 0) + 1.0) / (u.c + v.v)))), 3)
           AS ppl
  FROM lmpos p
  CROSS JOIN v
  JOIN uni u ON u.w = p.prev
  LEFT JOIN big b ON b.prev = p.prev AND b.cur = p.cur
  GROUP BY p.doc_id
),
gated AS (
  SELECT k.doc_id FROM keep k JOIN scored s USING (doc_id)
  WHERE s.ppl <= {max_ppl}
),
toks AS (
  SELECT d.doc_id, regexp_extract_all(lower(d.text), '[a-z0-9]+') AS t
  FROM documents d JOIN gated USING (doc_id)
),
pos AS (
  SELECT doc_id, t[i] AS term, i
  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(t))) AS i)
),
vocab AS (
  SELECT term, row_number() OVER (ORDER BY term) - 1 AS vid
  FROM (SELECT DISTINCT term FROM pos)
),
stream AS (
  SELECT row_number() OVER (ORDER BY p.doc_id, p.i) - 1 AS gp, v2.vid
  FROM pos p JOIN vocab v2 USING (term)
)
SELECT CAST(gp // 256 AS BIGINT) AS seq_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(sum(vid) AS BIGINT) AS sum_ids,
       CAST(sum((gp % 256 + 1) * vid) AS BIGINT) AS possum_ids
FROM stream GROUP BY seq_id
"""


def _bm25_sql(
    terms: "list[str] | None", k: int, conjunctive: bool = False,
    q_where: "str | None" = None, doc_where: "str | None" = None,
    order_by_sql: "str | None" = None, offset: int = 0,
    grouped_by: "str | None" = None, min_match: "int | None" = None,
    corpus_where: "str | None" = None, boost_sql: "str | None" = None,
    toks_sql: "str | None" = None,
) -> str:
    """BM25 top-k oracle.  The query-term set ``q`` is either an
    explicit VALUES list (``terms``) or DERIVED from the corpus
    vocabulary by ``q_where`` (e.g. ``term LIKE 's%'`` /
    ``levenshtein(term, 'sow') <= 1``) — mirroring the engine's
    prefix/fuzzy expansion, which is definitionally an OR query over
    the matching vocabulary terms.  ``doc_where`` is a boolean over
    ``d`` (documents) and ``dl.dl`` restricting which docs may appear
    in the result (the engine's doc-value filter) — scoring constants
    (idf, avgdl, N) stay corpus-wide, exactly as the engine keeps them
    under a filter."""
    if q_where is not None:
        q_sql = f"q AS (SELECT DISTINCT term FROM df WHERE {q_where})"
        having = ""
        assert not conjunctive
    else:
        terms_sql = ", ".join(f"('{t}')" for t in sorted(set(terms)))
        q_sql = f"q(term) AS (VALUES {terms_sql})"
        having = f"HAVING count(*) = {len(set(terms))}" if conjunctive else ""
        if min_match is not None:
            # one tf row per (doc, term) → count(*) = distinct matched
            # query terms (the engine's minimum_should_match)
            having = f"HAVING count(*) >= {min_match}"
    d_join = "JOIN documents d ON d.doc_id = tf.doc_id" if doc_where else ""
    d_cond = f"AND ({doc_where})" if doc_where else ""
    # field ordering (the engine's order_by): final ORDER BY over a
    # documents column (alias d2) instead of the score
    off = f" OFFSET {offset}" if offset else ""
    if grouped_by is not None:
        # grouped top-k (engine search_grouped): k best per group via a
        # window function; k here = rows PER GROUP, not a global LIMIT
        final = f"""SELECT grp, doc_id, round(sc, 4) AS score FROM (
  SELECT s.doc_id, s.sc, d2.{grouped_by} AS grp,
         row_number() OVER (
           PARTITION BY d2.{grouped_by} ORDER BY s.sc DESC, s.doc_id
         ) AS rn
  FROM scores s JOIN documents d2 ON d2.doc_id = s.doc_id
) WHERE rn <= {k}"""
    elif order_by_sql is not None:
        final = (
            f"SELECT s.doc_id, round(s.sc, 4) AS score FROM scores s "
            f"JOIN documents d2 ON d2.doc_id = s.doc_id "
            f"ORDER BY {order_by_sql} LIMIT {k}{off}"
        )
    elif boost_sql is not None:
        # decay boost (engine boost=DecaySpec): multiplicative per-doc
        # factor over a documents column, applied BEFORE the top-k order
        final = (
            f"SELECT s.doc_id, round(s.sc * ({boost_sql}), 4) AS score "
            f"FROM scores s JOIN documents d2 ON d2.doc_id = s.doc_id "
            f"ORDER BY s.sc * ({boost_sql}) DESC, s.doc_id LIMIT {k}{off}"
        )
    else:
        final = (
            f"SELECT doc_id, round(sc, 4) AS score "
            f"FROM scores ORDER BY sc DESC, doc_id LIMIT {k}{off}"
        )
    # corpus_where restricts the CORPUS itself (lifecycle oracles: the
    # live doc set after delete+compact) — unlike doc_where, it changes
    # the scoring basis (N, avgdl, df), exactly as compaction does
    cw = f" WHERE {corpus_where}" if corpus_where else ""
    if toks_sql is None:
        toks_sql = _TOKS
    else:
        # custom token streams (e.g. _TOKS_STEM) are nested selects —
        # a trailing WHERE would bind to the wrong scope
        assert corpus_where is None
    return f"""
WITH toks AS ({toks_sql}{cw}),
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
-- avgdl divides by ALL docs (the engine's basis), not just docs with
-- >=1 token — a zero-token doc must lower avgdl on both sides
stats AS (SELECT count(*)::DOUBLE AS n,
                 (SELECT sum(dl)::DOUBLE FROM dl) / count(*) AS avgdl
          FROM documents{cw}),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
{q_sql},
scores AS (
  SELECT tf.doc_id,
         sum( ln(1.0 + (s.n - df.df + 0.5) / (df.df + 0.5))
              * tf.tf / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / s.avgdl)) ) AS sc
  FROM tf
  JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN stats s
  {d_join}
  WHERE tf.term IN (SELECT term FROM q)
  {d_cond}
  GROUP BY tf.doc_id
  {having}
)
{final}
"""


def _rank_eval_sql(queries: "list[str]", k: int) -> str:
    """Per-query retrieval metrics: disjunctive BM25 ranking (same
    scores CTE as ``_bm25_sql``) judged against the conjunctive
    membership set.  DCG discounts are ``ln(rn+1)/ln(2)`` — ln parity
    with numpy is proven by the BM25 oracles, while log2 differs by an
    ULP at some arguments."""
    parts = []
    for q in queries:
        terms = sorted(set(q.split()))
        terms_sql = ", ".join(f"('{t}')" for t in terms)
        parts.append(f"""SELECT * FROM (
WITH toks AS ({_TOKS}),
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
stats AS (SELECT count(*)::DOUBLE AS n,
                 (SELECT sum(dl)::DOUBLE FROM dl) / count(*) AS avgdl
          FROM documents),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
q(term) AS (VALUES {terms_sql}),
scores AS (
  SELECT tf.doc_id,
         sum( ln(1.0 + (s.n - df.df + 0.5) / (df.df + 0.5))
              * tf.tf / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / s.avgdl)) ) AS sc
  FROM tf
  JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN stats s
  WHERE tf.term IN (SELECT term FROM q)
  GROUP BY tf.doc_id
),
ranked AS (
  SELECT doc_id, row_number() OVER (ORDER BY sc DESC, doc_id) AS rn
  FROM scores QUALIFY rn <= {k}
),
rel AS (
  SELECT doc_id FROM tf WHERE term IN (SELECT term FROM q)
  GROUP BY doc_id HAVING count(*) = {len(terms)}
),
hits AS (
  SELECT r.rn, CASE WHEN rel.doc_id IS NULL THEN 0 ELSE 1 END AS is_rel
  FROM ranked r LEFT JOIN rel USING (doc_id)
),
m AS (
  SELECT (SELECT count(*) FROM rel) AS n_rel,
         COALESCE(sum(is_rel), 0) AS rel_at_k,
         COALESCE(sum(is_rel / (ln(rn + 1.0) / ln(2.0))), 0.0) AS dcg
  FROM hits
),
ideal AS (
  -- generate_series needs constant bounds: emit 1..k, filter to the
  -- ideal-ranking length least(n_rel, k)
  SELECT COALESCE(sum(1.0 / (ln(i + 1.0) / ln(2.0))), 0.0) AS idcg
  FROM generate_series(1, {k}) t(i), m
  WHERE i <= least(m.n_rel, {k})
)
SELECT '{q}' AS query,
       CAST(m.n_rel AS BIGINT) AS n_rel,
       CAST(m.rel_at_k AS BIGINT) AS rel_at_k,
       round(m.rel_at_k * 1.0 / {k}, 6) AS precision_at_k,
       round(CASE WHEN m.n_rel = 0 THEN 0.0
                  ELSE m.rel_at_k * 1.0 / m.n_rel END, 6) AS recall_at_k,
       round(CASE WHEN ideal.idcg = 0 THEN 0.0
                  ELSE m.dcg / ideal.idcg END, 6) AS ndcg_at_k
FROM m, ideal)""")
    return "\nUNION ALL\n".join(parts)


def _mlt_sql(doc_id: int, top_terms: int, k: int) -> str:
    """More-like-this oracle: the seed doc's ``top_terms`` highest
    tf·idf terms (ties → term asc, mirroring
    ``engine.more_like_this``'s sort), weights normalized by the max,
    then an exact weighted BM25 OR (``search_weighted``) with the
    seed doc excluded from the result."""
    return f"""
WITH toks AS ({_TOKS}),
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
stats AS (SELECT count(*)::DOUBLE AS n,
                 (SELECT sum(dl)::DOUBLE FROM dl) / count(*) AS avgdl
          FROM documents),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
seed AS (SELECT term, tf AS f FROM tf WHERE doc_id = {doc_id}),
cand AS (
  SELECT s.term,
         s.f * ln(1.0 + (st.n - df.df + 0.5) / (df.df + 0.5)) AS w
  FROM seed s JOIN df USING (term) CROSS JOIN stats st
),
top AS (SELECT term, w FROM cand ORDER BY w DESC, term LIMIT {top_terms}),
q AS (SELECT term, w / (SELECT max(w) FROM top) AS qw FROM top),
scores AS (
  SELECT tf.doc_id,
         sum( (q.qw * ln(1.0 + (s.n - df.df + 0.5) / (df.df + 0.5)))
              * tf.tf / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / s.avgdl)) ) AS sc
  FROM tf
  JOIN q ON q.term = tf.term
  JOIN df ON df.term = tf.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
  GROUP BY tf.doc_id
)
SELECT doc_id, round(sc, 4) AS score FROM scores
WHERE doc_id <> {doc_id}
ORDER BY sc DESC, doc_id LIMIT {k}
"""


def _phrase_sql(tokens: list[str], slop: int, k: int) -> str:
    """Phrase / proximity top-k oracle: ordinal token positions via
    LATERAL unnest, a chain of self-joins requiring each consecutive
    token at ``i ∈ [prev+1, prev+1+slop]`` (the engine's ordered-
    proximity semantic, ``engine._verify_phrase_positions``), BM25
    scores over the phrase's DISTINCT terms conjunctively (the
    engine's ``_score_conjunctive`` basis)."""
    assert len(tokens) >= 2
    chain = []
    for j in range(1, len(tokens)):
        chain.append(
            f"JOIN pos p{j} ON p{j}.doc_id = p{j-1}.doc_id "
            f"AND p{j}.term = '{tokens[j]}' "
            f"AND p{j}.i BETWEEN p{j-1}.i + 1 AND p{j-1}.i + 1 + {slop}"
        )
    chain_sql = "\n  ".join(chain)
    distinct = sorted(set(tokens))
    terms_sql = ", ".join(f"('{t}')" for t in distinct)
    return f"""
WITH toks_arr AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t
  FROM documents
),
pos AS (
  SELECT doc_id, t[i] AS term, i
  FROM toks_arr, LATERAL (SELECT unnest(generate_series(1, len(t))) AS i) _
),
pmatch AS (
  SELECT DISTINCT p0.doc_id
  FROM pos p0
  {chain_sql}
  WHERE p0.term = '{tokens[0]}'
),
toks AS ({_TOKS}),
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
stats AS (SELECT count(*)::DOUBLE AS n,
                 (SELECT sum(dl)::DOUBLE FROM dl) / count(*) AS avgdl
          FROM documents),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
q(term) AS (VALUES {terms_sql}),
scores AS (
  SELECT tf.doc_id,
         sum( ln(1.0 + (s.n - df.df + 0.5) / (df.df + 0.5))
              * tf.tf / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / s.avgdl)) ) AS sc
  FROM tf
  JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN stats s
  WHERE tf.term IN (SELECT term FROM q)
  GROUP BY tf.doc_id
  HAVING count(*) = {len(distinct)}
)
SELECT s.doc_id, round(s.sc, 4) AS score
FROM scores s JOIN pmatch USING (doc_id)
ORDER BY s.sc DESC, s.doc_id LIMIT {k}
"""


def _near_sql(tokens: list[str], window: int, k: int) -> str:
    """Unordered-proximity (NEAR/W) top-k oracle: the match predicate
    is EXISTS one position per DISTINCT term with span ≤ ``window``
    (``engine._verify_near_positions``' anchor identity, expressed as
    greatest−least over a ±window-bounded position self-join); BM25
    scoring identical to the phrase oracle."""
    distinct = sorted(set(tokens))
    assert len(distinct) >= 2
    chain = []
    for j in range(1, len(distinct)):
        chain.append(
            f"JOIN pos p{j} ON p{j}.doc_id = p0.doc_id "
            f"AND p{j}.term = '{distinct[j]}' "
            f"AND p{j}.i BETWEEN p0.i - {window} AND p0.i + {window}"
        )
    chain_sql = "\n  ".join(chain)
    cols = ", ".join(f"p{j}.i" for j in range(len(distinct)))
    terms_sql = ", ".join(f"('{t}')" for t in distinct)
    return f"""
WITH toks_arr AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t
  FROM documents
),
pos AS (
  SELECT doc_id, t[i] AS term, i
  FROM toks_arr, LATERAL (SELECT unnest(generate_series(1, len(t))) AS i) _
),
pmatch AS (
  SELECT DISTINCT p0.doc_id
  FROM pos p0
  {chain_sql}
  WHERE p0.term = '{distinct[0]}'
    AND greatest({cols}) - least({cols}) <= {window}
),
toks AS ({_TOKS}),
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
stats AS (SELECT count(*)::DOUBLE AS n,
                 (SELECT sum(dl)::DOUBLE FROM dl) / count(*) AS avgdl
          FROM documents),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
q(term) AS (VALUES {terms_sql}),
scores AS (
  SELECT tf.doc_id,
         sum( ln(1.0 + (s.n - df.df + 0.5) / (df.df + 0.5))
              * tf.tf / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / s.avgdl)) ) AS sc
  FROM tf
  JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN stats s
  WHERE tf.term IN (SELECT term FROM q)
  GROUP BY tf.doc_id
  HAVING count(*) = {len(distinct)}
)
SELECT s.doc_id, round(s.sc, 4) AS score
FROM scores s JOIN pmatch USING (doc_id)
ORDER BY s.sc DESC, s.doc_id LIMIT {k}
"""


def _profile_sql() -> str:
    """Per-column profile oracle (engine ``stages/profile``): one
    UNION ALL arm per column; numeric stats NULL for non-numerics
    (timestamps profile counts/distincts only, both sides)."""
    numeric = ["l_orderkey", "l_quantity", "l_extendedprice"]
    other = ["l_returnflag", "l_linestatus", "l_shipdate"]
    arms = [
        f"""SELECT '{c}' AS "column", CAST(count(*) AS BIGINT) AS n_rows,
  CAST(count(*) - count({c}) AS BIGINT) AS n_null,
  CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct,
  CAST(min({c}) AS DOUBLE) AS min_num,
  CAST(max({c}) AS DOUBLE) AS max_num,
  round(avg({c}), 6) AS mean
FROM lineitem"""
        for c in numeric
    ] + [
        f"""SELECT '{c}', CAST(count(*) AS BIGINT),
  CAST(count(*) - count({c}) AS BIGINT),
  CAST(count(DISTINCT {c}) AS BIGINT),
  CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE)
FROM lineitem"""
        for c in other
    ]
    return "\nUNION ALL\n".join(arms)


def _pagerank_sql(iters: int = 20, d: float = 0.85) -> str:
    """Event-transition PageRank oracle: the damped synchronous power
    iteration UNROLLED as ``iters`` chained CTEs (standard SQL bars
    aggregates over a recursive CTE's working table, so recursion
    won't express the update — a fixed iteration count will).
    Mirrors ``stages/graph.pagerank`` exactly: N = |src ∪ dst|,
    out-degree with parallel-edge multiplicity, dangling mass
    (out-degree 0) redistributed uniformly,
    ``r' = (1-d)/N + d*(Σ_in r/outdeg + dangling/N)``; ranks rounded
    to 9 digits only at the boundary."""
    steps = []
    prev = "r0"
    for i in range(1, iters + 1):
        steps.append(f"""r{i} AS MATERIALIZED (
  SELECT n.node,
         (1.0 - {d})/(SELECT nn FROM cnt)
         + {d} * (
             COALESCE(inc.c, 0)
             + (SELECT COALESCE(sum(p.rank), 0) FROM {prev} p
                LEFT JOIN outdeg o ON o.src = p.node
                WHERE o.src IS NULL) / (SELECT nn FROM cnt)
           ) AS rank
  FROM nodes n
  LEFT JOIN (
    SELECT e.dst AS node, sum(p.rank / o.deg) AS c
    FROM edges e
    JOIN {prev} p ON p.node = e.src
    JOIN outdeg o ON o.src = e.src
    GROUP BY e.dst
  ) inc ON inc.node = n.node
)""")
        prev = f"r{i}"
    chain = ",\n".join(steps)
    return f"""
WITH ordered AS MATERIALIZED (
  SELECT user_id, event_type,
         lead(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS nxt
  FROM events
),
edges AS MATERIALIZED (
  SELECT event_type AS src, nxt AS dst FROM ordered WHERE nxt IS NOT NULL
),
nodes AS MATERIALIZED (
  SELECT DISTINCT node FROM (
    SELECT src AS node FROM edges UNION SELECT dst FROM edges)
),
cnt AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS nn FROM nodes),
outdeg AS MATERIALIZED (
  SELECT src, CAST(count(*) AS DOUBLE) AS deg FROM edges GROUP BY src
),
r0 AS MATERIALIZED (SELECT node, 1.0/(SELECT nn FROM cnt) AS rank FROM nodes),
{chain}
SELECT node, round(rank, 9) AS rank FROM {prev}
ORDER BY rank DESC, node
"""


def _hll_sql(p: int = 12) -> str:
    """HyperLogLog distinct-term oracle — the sketch itself is a
    DETERMINISTIC function of the md5-u64 token hashes (no seeded
    runtime hashing), so the full register file and the bias-corrected
    estimate (with the linear-counting small-range switch) are
    SQL-expressible.  Bit length is computed by exact integer
    comparison against a powers-of-two table — ``floor(log2(w))`` on
    a double can round up across an integer boundary, which is why
    the engine, too, avoids it above 32 bits."""
    m = 1 << p
    wbits = 64 - p
    alpha = f"(0.7213 / (1.0 + 1.079 / {m}))"
    return f"""
WITH toks AS ({_TOKS}),
terms AS (SELECT DISTINCT term FROM toks),
h AS (
  SELECT ('0x' || substr(md5(term), 1, 16))::UBIGINT AS hash FROM terms
),
parts AS (
  SELECT CAST(hash >> {wbits} AS BIGINT) AS idx,
         hash & ((1::UBIGINT << {wbits}) - 1) AS w
  FROM h
),
powers AS (
  SELECT (1::UBIGINT << CAST(range AS INTEGER)) AS pw FROM range(0, {wbits})
),
ranked AS (
  SELECT idx,
         CASE WHEN w = 0 THEN {wbits + 1}
              ELSE {wbits} + 1
                   - (SELECT count(*) FROM powers WHERE pw <= parts.w)
         END AS rank
  FROM parts
),
regs AS (SELECT idx, max(rank) AS reg FROM ranked GROUP BY idx),
agg AS (
  SELECT (SELECT count(*) FROM regs) AS present,
         COALESCE((SELECT sum(pow(2.0, -reg)) FROM regs), 0) AS s_present
),
est AS (
  SELECT {alpha} * {m} * {m} / (s_present + ({m} - present)) AS raw,
         {m} - present AS zeros
  FROM agg
)
SELECT CASE WHEN raw <= 2.5 * {m} AND zeros > 0
            THEN round({m} * ln(CAST({m} AS DOUBLE) / zeros), 3)
            ELSE round(raw, 3) END AS estimate,
       CAST({p} AS BIGINT) AS p
FROM est
"""


def _cms_sql(probes: tuple, width: int = 4096, depth: int = 4) -> str:
    """Count-Min point-estimate oracle — the sketch is a pure function
    of the md5-u64 token hashes and FIXED odd salts
    (``stages/sketches._CMS_SALTS``), so the whole (depth × width)
    table and the min-over-rows query are SQL-expressible.  The
    wrapping u64 multiply decomposes through HUGEINT
    (``(a·2³² + b)·s mod 2⁶⁴ = ((a·s mod 2³²)·2³² + b·s) mod 2⁶⁴`` —
    a plain UBIGINT multiply would raise on overflow)."""
    salts = [11400714819323198485, 14029467366897019727,
             1609587929392839161, 2870177450012600261][:depth]
    salt_rows = ", ".join(
        f"({j}, {s}::HUGEINT)" for j, s in enumerate(salts)
    )
    probe_rows = ", ".join(f"('{p}')" for p in probes)
    mix = """CAST((
      (((CAST(hash AS HUGEINT) // 4294967296) * s) % 4294967296)
        * 4294967296
      + (CAST(hash AS HUGEINT) % 4294967296) * s
    ) % 18446744073709551616 AS UBIGINT)"""
    return f"""
WITH toks AS ({_TOKS}),
tf AS (SELECT term, CAST(count(*) AS BIGINT) AS n FROM toks GROUP BY term),
salts(j, s) AS (VALUES {salt_rows}),
th AS (
  SELECT term, n, ('0x' || substr(md5(term), 1, 16))::UBIGINT AS hash
  FROM tf
),
cells AS (
  SELECT j, CAST(({mix} >> 33) % {width} AS BIGINT) AS b, n
  FROM th CROSS JOIN salts
),
cms AS (SELECT j, b, sum(n) AS c FROM cells GROUP BY j, b),
probes(term) AS (VALUES {probe_rows}),
ph AS (
  SELECT term, ('0x' || substr(md5(term), 1, 16))::UBIGINT AS hash
  FROM probes
),
pcells AS (
  SELECT term, j, CAST(({mix} >> 33) % {width} AS BIGINT) AS b
  FROM ph CROSS JOIN salts
)
SELECT p.term, CAST(min(COALESCE(cms.c, 0)) AS BIGINT) AS est
FROM pcells p LEFT JOIN cms ON cms.j = p.j AND cms.b = p.b
GROUP BY p.term
ORDER BY p.term
"""


def _plane_values(n_planes: int = 8, seed: int = 42, dim: int = 64) -> str:
    """The engine's seeded LSH hyperplanes as SQL VALUES literals —
    ``stages/ann._hyperplanes`` is deterministic, so the probe
    geometry embeds verbatim into the oracle."""
    import numpy as _np

    planes = _np.random.default_rng(seed).standard_normal((n_planes, dim))
    return ",\n  ".join(
        f"({j}, [{', '.join(repr(float(v)) for v in planes[j])}]::DOUBLE[])"
        for j in range(n_planes)
    )


def _lsh_buckets_cte(n_planes: int = 8, seed: int = 42,
                     dim: int = 64) -> str:
    """Shared CTE prefix: normalized-sign bucket per stored vector."""
    return f"""planes(j, p) AS (VALUES
  {_plane_values(n_planes, seed, dim)}
),
emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
buckets AS (
  SELECT vec_id,
         CAST(sum(CASE WHEN list_dot_product(e, p) > 0
                       THEN 1 << j ELSE 0 END) AS BIGINT) AS b
  FROM emb CROSS JOIN planes GROUP BY vec_id
)"""


def _lsh_neardup_sql(tau: float, n_planes: int = 8, seed: int = 42,
                     dim: int = 64) -> str:
    """LSH-blocked near-dup oracle: the ±1-bit multiprobe EMISSION
    means two vectors share a bucket iff their sign codes differ in
    ≤ 2 bits (pigeonhole on the probe sets) — so the candidate
    predicate is ``bit_count(xor(b_a, b_b)) <= 2`` and the verify is
    the exact cosine threshold."""
    return f"""
WITH {_lsh_buckets_cte(n_planes, seed, dim)}
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       round(list_cosine_similarity(a.e, b.e), 4) AS cosine
FROM emb a
JOIN emb b ON a.vec_id < b.vec_id
JOIN buckets ba ON ba.vec_id = a.vec_id
JOIN buckets bb ON bb.vec_id = b.vec_id
WHERE bit_count(xor(ba.b, bb.b)) <= 2
  AND list_cosine_similarity(a.e, b.e) >= {tau}
ORDER BY vec_a, vec_b
"""


def _knn_lsh_sql(
    query_ids: tuple = (0, 1), k: int = 10,
    n_planes: int = 8, seed: int = 42, dim: int = 64,
) -> str:
    """LSH-bucketed ANN oracle — the "approximation" is a DETERMINISTIC
    probe: hyperplanes come from a fixed seed, so they embed as SQL
    literals and the candidate set (sign-bucket of each stored vector
    ∈ the queries' buckets ± 1-bit flips) plus the exact cosine top-k
    over it are fully SQL-expressible.  Mirrors
    ``stages/ann.lsh_bucketed_topk``'s GLOBAL probe set (union over
    queries) and the ``knn_cosine`` oracle's proven cosine arithmetic."""
    ids = ", ".join(str(i) for i in query_ids)
    return f"""
WITH {_lsh_buckets_cte(n_planes, seed, dim)},
qb AS (SELECT b FROM buckets WHERE vec_id IN ({ids})),
probe AS (
  SELECT b FROM qb
  UNION
  SELECT xor(qb.b, CAST(1 << CAST(r.range AS INTEGER) AS BIGINT))
  FROM qb, range({n_planes}) r
),
cand AS (
  SELECT e.vec_id, e.e FROM emb e JOIN buckets bk USING (vec_id)
  WHERE bk.b IN (SELECT b FROM probe)
),
q AS (SELECT vec_id AS query_id, e AS qe FROM emb WHERE vec_id IN ({ids}))
SELECT q.query_id, c.vec_id,
       round(list_cosine_similarity(c.e, q.qe), 4) AS score
FROM cand c CROSS JOIN q
QUALIFY row_number() OVER (
    PARTITION BY q.query_id
    ORDER BY list_cosine_similarity(c.e, q.qe) DESC, c.vec_id
) <= {k}
"""


def _centroid_values(k: int, dim: int, seed: int,
                     with_norm2: bool = False,
                     inv_sqrt_dim_scale: bool = False) -> str:
    """Seeded Gaussian centroids as SQL VALUES literals — mirrors
    ``pipelines.vectors.ivf_seeded_centroids`` /
    ``kmeans_seeded_centroids`` (same rng call + scale, bit-identical
    floats).  With ``with_norm2`` each row also carries ``|c|²``
    computed by the SAME numpy reduction the engine uses, so the SQL
    never recomputes it with different arithmetic."""
    import numpy as _np

    c = _np.random.default_rng(seed).standard_normal((k, dim))
    if inv_sqrt_dim_scale:
        c = c / _np.sqrt(dim)
    n2 = (c * c).sum(axis=1)
    return ",\n  ".join(
        f"({j}, [{', '.join(repr(float(v)) for v in c[j])}]::DOUBLE[]"
        # float() first: repr of a raw numpy scalar renders as
        # 'np.float64(...)' under numpy >= 2 — invalid SQL
        + (f", {float(n2[j])!r}" if with_norm2 else "")
        + ")"
        for j in range(k)
    )


def _ivf_sql(query_ids: tuple = (0, 1), k: int = 10,
             n_centroids: int = 16, nprobe: int = 4,
             dim: int = 64, seed: int = 7) -> str:
    """IVF-probed ANN oracle — the coarse quantizer is the seeded
    centroid literal set (``vectors.ivf_seeded_centroids``), so the
    whole probe geometry is SQL: per-vector list assignment = argmax
    cosine over literal centroids (ties to the lower centroid id,
    matching numpy argmax / the engine's stable probe sort), each
    query's ``nprobe`` probe lists the same way, and the exact cosine
    top-k over probed candidates reuses the proven ``knn_cosine``
    arithmetic."""
    ids = ", ".join(str(i) for i in query_ids)
    return f"""
WITH cents(j, c) AS (VALUES
  {_centroid_values(n_centroids, dim, seed)}
),
emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
assign AS (
  SELECT vec_id, j AS cl FROM (
    SELECT e.vec_id, c.j,
           row_number() OVER (PARTITION BY e.vec_id
             ORDER BY list_cosine_similarity(e.e, c.c) DESC, c.j) AS rn
    FROM emb e CROSS JOIN cents c) t WHERE rn = 1
),
q AS (SELECT vec_id AS query_id, e AS qe FROM emb WHERE vec_id IN ({ids})),
qc AS (
  SELECT query_id, j FROM (
    SELECT q.query_id, c.j,
           row_number() OVER (PARTITION BY q.query_id
             ORDER BY list_cosine_similarity(q.qe, c.c) DESC, c.j) AS rn
    FROM q CROSS JOIN cents c) t WHERE rn <= {nprobe}
)
SELECT q.query_id, e.vec_id,
       round(list_cosine_similarity(e.e, q.qe), 4) AS score
FROM q
JOIN qc ON qc.query_id = q.query_id
JOIN assign a ON a.cl = qc.j
JOIN emb e ON e.vec_id = a.vec_id
QUALIFY row_number() OVER (PARTITION BY q.query_id
    ORDER BY list_cosine_similarity(e.e, q.qe) DESC, e.vec_id) <= {k}
"""


def _semdedup_fixed_sql(k: int = 8, dim: int = 64, seed: int = 3,
                        tau: float = 0.45) -> str:
    """SemDeDup oracle under the seeded literal centroids
    (``vectors.kmeans_seeded_centroids`` — same literals as the
    k-means histogram oracle): per-vector assignment by argmax of
    ``2·x·c − |c|²``, within-cluster exact-cosine pairs (the proven
    ``embedding_near_dups`` arithmetic), connected components via the
    recursive reachability CTE (the ``minhash_dup_clusters`` shape),
    losers = non-min members of each component."""
    return f"""
WITH RECURSIVE cents(j, c, c2) AS (VALUES
  {_centroid_values(k, dim, seed, with_norm2=True, inv_sqrt_dim_scale=True)}
),
emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
assign AS (
  SELECT vec_id, j AS cluster FROM (
    SELECT e.vec_id, c.j,
           row_number() OVER (PARTITION BY e.vec_id
             ORDER BY 2.0 * list_dot_product(e.e, c.c) - c.c2 DESC,
                      c.j) AS rn
    FROM emb e CROSS JOIN cents c) t WHERE rn = 1
),
pairsq AS (
  SELECT a.vec_id AS doc_a, b.vec_id AS doc_b
  FROM emb a
  JOIN emb b ON a.vec_id < b.vec_id
  JOIN assign aa ON aa.vec_id = a.vec_id
  JOIN assign ab ON ab.vec_id = b.vec_id
  WHERE aa.cluster = ab.cluster
    AND list_cosine_similarity(a.e, b.e) >= {tau}
),
edges AS (
  SELECT doc_a AS s, doc_b AS d FROM pairsq
  UNION SELECT doc_b, doc_a FROM pairsq
),
reach(node, lbl) AS (
  SELECT s, s FROM edges
  UNION
  SELECT e.d, r.lbl FROM reach r JOIN edges e ON e.s = r.node
),
comp AS (SELECT node, min(lbl) AS lbl FROM reach GROUP BY node)
SELECT CAST(node AS BIGINT) AS vec_id, CAST(lbl AS BIGINT) AS keep_id
FROM comp WHERE node != lbl
"""


def _pq_sql(query_ids: tuple = (0, 1), k: int = 10,
            m: int = 8, n_codes: int = 16, dsub: int = 8,
            pool_factor: int = 4, seed: int = 5) -> str:
    """Product-quantized ANN oracle — codebooks are the seeded literal
    set (``stages.pq.pq_seeded_codebooks``, same rng + scale), so the
    whole probe is SQL: per-(vector, subspace) code = argmax of
    ``x_j·c − |c|²/2`` over literal centroid rows (ties to the lower
    code id — numpy argmax), per-query ADC tables the same way, ADC
    per vector as the EXPLICIT left-associated 8-term sum (numpy's
    ``out += table[code_j]`` loop order — an unordered SUM() could
    differ in the last ulp and flip pool-boundary ties), the global
    ``pool_factor·k`` candidate pool by (adc DESC, vec_id), and the
    exact-cosine top-k over the pool.  Subvectors slice the normalized
    embedding with DuckDB's 1-based inclusive list slicing."""
    import numpy as _np

    books = (_np.random.default_rng(seed).standard_normal((m, n_codes, dsub))
             / _np.sqrt(m * dsub))
    rows = []
    for j in range(m):
        for cid in range(n_codes):
            c = books[j, cid]
            chalf = 0.5 * float((c * c).sum())
            rows.append(
                f"({j}, {cid}, "
                f"[{', '.join(repr(float(v)) for v in c)}]::DOUBLE[], "
                f"{chalf!r})"
            )
    cb_rows = ",\n  ".join(rows)
    adc_sum = "max(CASE WHEN c.j=0 THEN qt.tv END)"
    for j in range(1, m):
        adc_sum = f"({adc_sum} + max(CASE WHEN c.j={j} THEN qt.tv END))"
    ids = ", ".join(str(i) for i in query_ids)
    pool = pool_factor * k
    return f"""
WITH cb(j, cid, c, chalf) AS (VALUES
  {cb_rows}
),
emb AS (
  SELECT vec_id,
         list_transform(CAST(embedding AS DOUBLE[]),
                        x -> x / sqrt(list_dot_product(
                            CAST(embedding AS DOUBLE[]),
                            CAST(embedding AS DOUBLE[])))) AS xn
  FROM embeddings
),
codes AS (
  SELECT vec_id, j, cid FROM (
    SELECT e.vec_id, cb.j, cb.cid,
           row_number() OVER (PARTITION BY e.vec_id, cb.j
             ORDER BY list_dot_product(
                 e.xn[cb.j*{dsub}+1 : cb.j*{dsub}+{dsub}], cb.c)
               - cb.chalf DESC,
                      cb.cid) AS rn
    FROM emb e CROSS JOIN cb) t WHERE rn = 1
),
q AS (SELECT vec_id AS query_id, xn AS qn FROM emb WHERE vec_id IN ({ids})),
qt AS (
  SELECT q.query_id, cb.j, cb.cid,
         list_dot_product(q.qn[cb.j*{dsub}+1 : cb.j*{dsub}+{dsub}], cb.c)
           AS tv
  FROM q CROSS JOIN cb
),
adc AS (
  SELECT qt.query_id, c.vec_id, {adc_sum} AS adc
  FROM codes c
  JOIN qt ON qt.j = c.j AND qt.cid = c.cid
  GROUP BY qt.query_id, c.vec_id
),
pool AS (
  SELECT query_id, vec_id FROM (
    SELECT query_id, vec_id,
           row_number() OVER (PARTITION BY query_id
             ORDER BY adc DESC, vec_id) AS rn
    FROM adc) t WHERE rn <= {pool}
)
SELECT p.query_id, p.vec_id,
       round(list_dot_product(e.xn, q.qn), 4) AS score
FROM pool p
JOIN emb e ON e.vec_id = p.vec_id
JOIN q ON q.query_id = p.query_id
QUALIFY row_number() OVER (PARTITION BY p.query_id
    ORDER BY list_dot_product(e.xn, q.qn) DESC, p.vec_id) <= {k}
"""


def _kmeans_sizes_sql(k: int = 8, dim: int = 64, seed: int = 3) -> str:
    """Cluster-size histogram oracle under the seeded literal
    centroids (``vectors.kmeans_seeded_centroids`` — ``1/√dim``-scaled
    so every cell is populated): per-vector argmin-L2 is argmax of
    ``2·x·c − |c|²`` (``|x|²`` is constant per row), with ``|c|²``
    embedded as a literal computed by the SAME numpy reduction as the
    engine's ``kmeans_assign``."""
    return f"""
WITH cents(j, c, c2) AS (VALUES
  {_centroid_values(k, dim, seed, with_norm2=True, inv_sqrt_dim_scale=True)}
),
emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
assign AS (
  SELECT vec_id, j AS cluster FROM (
    SELECT e.vec_id, c.j,
           row_number() OVER (PARTITION BY e.vec_id
             ORDER BY 2.0 * list_dot_product(e.e, c.c) - c.c2 DESC,
                      c.j) AS rn
    FROM emb e CROSS JOIN cents c) t WHERE rn = 1
)
SELECT CAST(cluster AS BIGINT) AS cluster, CAST(count(*) AS BIGINT) AS n
FROM assign GROUP BY cluster ORDER BY cluster
"""


def _url_canon_sql(final_select: str) -> str:
    """URL-canonicalization oracle: the adversarial derivation
    (``pipelines/corpus._messy_urls``) plus a GENERIC canonicalizer —
    fragment strip, scheme://host lowercase, www./default-port strip,
    trailing-slash strip, tracking-param drop + lexicographic param
    sort — mirroring ``stages/urls.canonicalize_url_array`` rewrite
    for rewrite."""
    return r"""
WITH messy AS (
  SELECT doc_id,
    'HTTPS://WWW.Site' || CAST((doc_id // 2) % 97 AS VARCHAR) || '.Example'
    || CASE WHEN doc_id % 5 = 0 THEN ':443' ELSE '' END
    || '/d/page-' || CAST(doc_id // 2 AS VARCHAR)
    || CASE WHEN doc_id % 7 = 0 THEN '/' ELSE '' END
    || CASE doc_id % 3 WHEN 0 THEN '?utm_source=feed&b=2&a=1'
            WHEN 1 THEN '?a=1&utm_campaign=x&b=2'
            ELSE '?b=2&a=1' END
    || CASE WHEN doc_id % 5 = 0 THEN '#frag' ELSE '' END AS url
  FROM documents
),
nofrag AS (SELECT doc_id, regexp_replace(url, '#.*$', '') AS u FROM messy),
parts AS (
  SELECT doc_id,
         lower(regexp_extract(u, '^([A-Za-z][A-Za-z0-9+.\-]*://[^/?]*)', 1))
           AS pre,
         regexp_replace(u, '^[A-Za-z][A-Za-z0-9+.\-]*://[^/?]*', '') AS rest
  FROM nofrag
),
pre2 AS (
  SELECT doc_id,
    regexp_replace(regexp_replace(regexp_replace(pre,
      '^([a-z][a-z0-9+.\-]*://)www\.', '\1'),
      '^(https://[^/?:]*):443$', '\1'),
      '^(http://[^/?:]*):80$', '\1') AS pre,
    regexp_replace(regexp_replace(rest, '\?.*$', ''), '/+$', '') AS path,
    regexp_replace(rest, '^[^?]*\??', '') AS q
  FROM parts
),
canon AS (
  SELECT doc_id,
    pre || path || CASE WHEN qc <> '' THEN '?' || qc ELSE '' END
      AS canonical_url
  FROM (
    SELECT doc_id, pre, path,
      array_to_string(list_sort(list_filter(string_split(q, '&'),
        p -> p <> '' AND NOT regexp_matches(
          p, '^(utm_[a-z0-9]+|gclid|fbclid|ref)='))), '&') AS qc
    FROM pre2)
)
""" + final_select


def _bm25f_sql(terms: list[str], k: int, tw: float) -> str:
    """BM25F oracle (engine ``query/fields.bm25f_search``): body = the
    full text, title = first 8 whitespace words; per-field
    length-normalized tf (field avgdl over ALL docs), weighted
    cross-field sum, ONE saturation, idf from the body field."""
    terms_sql = ", ".join(f"('{t}')" for t in sorted(set(terms)))
    return f"""
WITH btoks AS ({_TOKS}),
btf AS (SELECT doc_id, term, count(*) AS tf FROM btoks GROUP BY doc_id, term),
bdl AS (SELECT doc_id, count(*) AS dl FROM btoks GROUP BY doc_id),
bstats AS (SELECT count(*)::DOUBLE AS n,
                  (SELECT sum(dl)::DOUBLE FROM bdl) / count(*) AS avgdl
           FROM documents),
bdf AS (SELECT term, count(*) AS df FROM btf GROUP BY term),
ttoks AS (
  SELECT doc_id,
         unnest(regexp_extract_all(lower(
           array_to_string((string_split(text, ' '))[1:8], ' ')),
           '[a-z0-9]+')) AS term
  FROM documents
),
ttf AS (SELECT doc_id, term, count(*) AS tf FROM ttoks GROUP BY doc_id, term),
tdl AS (SELECT doc_id, count(*) AS dl FROM ttoks GROUP BY doc_id),
tstats AS (SELECT (SELECT sum(dl)::DOUBLE FROM tdl)
                    / (SELECT count(*) FROM documents) AS avgdl),
q(term) AS (VALUES {terms_sql}),
bpart AS (
  SELECT tf.doc_id, tf.term,
         1.0 * tf.tf / (1.0 - 0.75 + 0.75 * dl.dl / s.avgdl) AS c
  FROM btf tf JOIN bdl dl USING (doc_id) CROSS JOIN bstats s
  WHERE tf.term IN (SELECT term FROM q)
),
tpart AS (
  SELECT tf.doc_id, tf.term,
         {tw} * tf.tf / (1.0 - 0.75 + 0.75 * dl.dl / s.avgdl) AS c
  FROM ttf tf JOIN tdl dl USING (doc_id) CROSS JOIN tstats s
  WHERE tf.term IN (SELECT term FROM q)
),
wtf AS (
  SELECT doc_id, term, sum(c) AS wtf
  FROM (SELECT * FROM bpart UNION ALL SELECT * FROM tpart)
  GROUP BY doc_id, term
),
scores AS (
  SELECT w.doc_id,
         sum( ln(1.0 + (s.n - df.df + 0.5) / (df.df + 0.5))
              * w.wtf / (1.2 + w.wtf) ) AS sc
  FROM wtf w JOIN bdf df USING (term) CROSS JOIN bstats s
  GROUP BY w.doc_id
)
SELECT doc_id, round(sc, 4) AS score
FROM scores ORDER BY sc DESC, doc_id LIMIT {k}
"""


def _rescore_sql(ta: str, tb: str, k: int, window: int,
                 qw: float = 1.0, rw: float = 1.0) -> str:
    """Two-phase rescore oracle (engine ``search_rescore``): BM25 OR
    top-``window`` (score desc, doc_id asc — the engine's window cut),
    then ``qw·bm25 + rw·1/(1+g)`` where ``g`` = min |pos_a − pos_b|
    over the two terms' occurrences; window docs lacking either term
    keep prox = 0 (LEFT JOIN).  Final exact top-``k`` of the window by
    the combined score."""
    return f"""
WITH toks AS ({_TOKS}),
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
stats AS (SELECT count(*)::DOUBLE AS n,
                 (SELECT sum(dl)::DOUBLE FROM dl) / count(*) AS avgdl
          FROM documents),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
q(term) AS (VALUES ('{ta}'), ('{tb}')),
scores AS (
  SELECT tf.doc_id,
         sum( ln(1.0 + (s.n - df.df + 0.5) / (df.df + 0.5))
              * tf.tf / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / s.avgdl)) ) AS sc
  FROM tf
  JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN stats s
  WHERE tf.term IN (SELECT term FROM q)
  GROUP BY tf.doc_id
),
win AS (SELECT doc_id, sc FROM scores ORDER BY sc DESC, doc_id LIMIT {window}),
pos AS (
  SELECT doc_id, t[i] AS term, i
  FROM (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t
        FROM documents
        WHERE doc_id IN (SELECT doc_id FROM win)) toks_arr,
       LATERAL (SELECT unnest(generate_series(1, len(t))) AS i) _
),
gaps AS (
  SELECT a.doc_id, min(abs(a.i - b.i))::DOUBLE AS g
  FROM pos a JOIN pos b ON a.doc_id = b.doc_id
  WHERE a.term = '{ta}' AND b.term = '{tb}'
  GROUP BY a.doc_id
)
SELECT w.doc_id,
       round({qw} * w.sc + {rw} * COALESCE(1.0 / (1.0 + g.g), 0.0), 4)
         AS score
FROM win w LEFT JOIN gaps g USING (doc_id)
ORDER BY {qw} * w.sc + {rw} * COALESCE(1.0 / (1.0 + g.g), 0.0) DESC,
         w.doc_id
LIMIT {k}
"""


def _hybrid_rrf_sql(
    terms: list[str], qvec_id: int, k: int, n_each: int, rrf_k: int
) -> str:
    """Hybrid RRF oracle: BM25 top-``n_each`` ranks (same scoring CTEs
    as ``_bm25_sql``) FULL OUTER JOIN cosine top-``n_each`` ranks over
    embeddings (doc_id = vec_id), fused as
    ``Σ 1/(rrf_k + rank)`` — mirroring ``query/fusion.rrf_fuse``.
    Only RANKS cross the fusion, so float-identity holds as long as
    both rankings are rank-identical (the property the bm25_topk and
    knn_cosine oracles already pin)."""
    terms_sql = ", ".join(f"('{t}')" for t in sorted(set(terms)))
    return f"""
WITH toks AS ({_TOKS}),
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
stats AS (SELECT count(*)::DOUBLE AS n,
                 (SELECT sum(dl)::DOUBLE FROM dl) / count(*) AS avgdl
          FROM documents),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
q(term) AS (VALUES {terms_sql}),
scores AS (
  SELECT tf.doc_id,
         sum( ln(1.0 + (s.n - df.df + 0.5) / (df.df + 0.5))
              * tf.tf / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / s.avgdl)) ) AS sc
  FROM tf
  JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN stats s
  WHERE tf.term IN (SELECT term FROM q)
  GROUP BY tf.doc_id
),
lex AS (
  SELECT doc_id, row_number() OVER (ORDER BY sc DESC, doc_id) AS r
  FROM scores QUALIFY r <= {n_each}
),
qv AS (SELECT CAST(embedding AS DOUBLE[]) AS qe
       FROM embeddings WHERE vec_id = {qvec_id}),
vec AS (
  SELECT e.vec_id AS doc_id,
         row_number() OVER (
           ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), qv.qe)
                    DESC, e.vec_id
         ) AS r
  FROM embeddings e CROSS JOIN qv QUALIFY r <= {n_each}
),
fused AS (
  SELECT COALESCE(l.doc_id, v.doc_id) AS doc_id,
         COALESCE(1.0 / ({rrf_k} + l.r), 0.0)
           + COALESCE(1.0 / ({rrf_k} + v.r), 0.0) AS rrf
  FROM lex l FULL OUTER JOIN vec v ON l.doc_id = v.doc_id
)
SELECT doc_id, round(rrf, 6) AS rrf_score
FROM fused ORDER BY rrf DESC, doc_id LIMIT {k}
"""


def _minhash_ctes(threshold: float = 0.6) -> str:
    """Flat CTE chain reproducing ``stages.dedup_near`` MinHash+LSH
    bit-for-bit: md5-u64 token hashes, 3-gram shingle polynomial with
    base ``_B`` in uint64 wraparound (HUGEINT mod-2^64 arithmetic),
    64 permutations from ``_minhash_params(64, 42)`` inlined as
    VALUES, 16 bands × 4 rows banding, exact shingle-hash Jaccard
    verify at ``threshold``.  Ends with a ``pairsq`` CTE."""
    import numpy as np

    rng = np.random.default_rng(42)
    a = rng.integers(1, 2**63, size=64, dtype=np.uint64) | np.uint64(1)
    b = rng.integers(0, 2**63, size=64, dtype=np.uint64)
    perms = ", ".join(
        f"({i}, {int(a[i])}::UBIGINT, {int(b[i])}::UBIGINT)" for i in range(64)
    )
    B = 1099511628211  # stages.dedup_near._B
    P = "18446744073709551616::HUGEINT"  # 2^64
    return f"""
docs AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
  FROM documents
),
th AS (
  SELECT doc_id, i, ('0x' || substr(md5(toks[i]), 1, 16))::UBIGINT AS h
  FROM docs, LATERAL (SELECT unnest(generate_series(1, len(toks))) AS i) _
),
sh AS (
  SELECT DISTINCT doc_id, sh FROM (
    SELECT t0.doc_id,
           CAST(((CAST((CAST(t0.h AS HUGEINT) * {B} + t1.h) % {P} AS HUGEINT)
                  * {B} + t2.h) % {P}) AS UBIGINT) AS sh
    FROM th t0
    JOIN th t1 ON t1.doc_id = t0.doc_id AND t1.i = t0.i + 1
    JOIN th t2 ON t2.doc_id = t0.doc_id AND t2.i = t0.i + 2
    UNION ALL
    SELECT t.doc_id, t.h AS sh
    FROM th t JOIN docs d ON d.doc_id = t.doc_id
    WHERE len(d.toks) BETWEEN 1 AND 2
  )
),
perms(pi, pa, pb) AS (VALUES {perms}),
sig AS (
  SELECT s.doc_id, p.pi,
         min(CAST((CAST(p.pa AS HUGEINT) * CAST(s.sh AS HUGEINT) + p.pb)
                  % {P} AS UBIGINT)) AS mh
  FROM sh s CROSS JOIN perms p GROUP BY 1, 2
),
bandsig AS (
  SELECT doc_id, pi // 4 AS band,
         max(CASE WHEN pi % 4 = 0 THEN mh END) AS m0,
         max(CASE WHEN pi % 4 = 1 THEN mh END) AS m1,
         max(CASE WHEN pi % 4 = 2 THEN mh END) AS m2,
         max(CASE WHEN pi % 4 = 3 THEN mh END) AS m3
  FROM sig GROUP BY 1, 2
),
bh AS (
  SELECT doc_id, band,
         CAST((CAST((CAST((CAST(m0 AS HUGEINT) * {B} + m1) % {P} AS HUGEINT)
               * {B} + m2) % {P} AS HUGEINT) * {B} + m3) % {P} AS UBIGINT)
           AS band_hash
  FROM bandsig
),
cand AS (
  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
  FROM bh x JOIN bh y
    ON x.band = y.band AND x.band_hash = y.band_hash AND x.doc_id < y.doc_id
),
cnt AS (SELECT doc_id, count(*) AS c FROM sh GROUP BY doc_id),
inter AS (
  SELECT c.doc_a, c.doc_b, count(*) AS i
  FROM cand c JOIN sh sa ON sa.doc_id = c.doc_a
              JOIN sh sb ON sb.doc_id = c.doc_b AND sb.sh = sa.sh
  GROUP BY 1, 2
),
pairsq AS (
  SELECT CAST(c.doc_a AS BIGINT) AS doc_a, CAST(c.doc_b AS BIGINT) AS doc_b,
         ROUND(COALESCE(i.i, 0) * 1.0 / (ca.c + cb.c - COALESCE(i.i, 0)), 6)
           AS jaccard
  FROM cand c
  JOIN cnt ca ON ca.doc_id = c.doc_a
  JOIN cnt cb ON cb.doc_id = c.doc_b
  LEFT JOIN inter i ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b
  WHERE COALESCE(i.i, 0) * 1.0 / (ca.c + cb.c - COALESCE(i.i, 0))
        >= {threshold}
)"""


def _minhash_pairs_sql(threshold: float = 0.6) -> str:
    return f"WITH {_minhash_ctes(threshold)}\nSELECT * FROM pairsq"


def _minhash_clusters_sql(threshold: float = 0.6) -> str:
    """Connected components over the verified pairs via a recursive
    reachability CTE; cluster_id = component-min doc_id — mirrors
    ``stages.dedup_near.dup_clusters`` (members = docs in ≥1 pair)."""
    return f"""
WITH RECURSIVE {_minhash_ctes(threshold)},
edges AS (
  SELECT doc_a AS s, doc_b AS d FROM pairsq
  UNION SELECT doc_b, doc_a FROM pairsq
),
reach(node, lbl) AS (
  SELECT s, s FROM edges
  UNION
  SELECT e.d, r.lbl FROM reach r JOIN edges e ON e.s = r.node
)
SELECT node AS doc_id, CAST(min(lbl) AS BIGINT) AS cluster_id
FROM reach GROUP BY node
"""


def entry() -> Any:
    """Flagship: pages→extract→dedup→ids→index→BM25 top-k (sf0.001)."""
    from refimage_ray.pipelines.flagship import flagship

    return flagship("/root/testdata/sf0.001")


# Queries the driver certifies (first 50 entries in dict order).
# After round 4 every SQL-oracled entry has been value-certified at
# least once, so round 5 rotates to a REGRESSION window: the 4 entries
# newly value-oracled this round (IVF probe + k-means assignment +
# SemDeDup via literal centroids, PQ via literal codebooks — never
# driver-certified), the 5 queries whose code paths changed this round
# (segment dedup gained the gated broadcast/join; spans + export
# collection moved to collect_small; PageRank gained loss-recovery
# staging), then the oldest-certified queries first: all 20 whose last
# certification was round 1, and 21 round-2 entries stratified across
# families (corpus stats, containers, search variants, phrase,
# NRT/rollover lifecycle, export).  41 of the 50 slots re-certify
# r1/r2-era queries.  Rows-only entries (no SQL oracle) stay excluded
# — a slot spent on one returns only a weak rows-ran check.
_DRIVER_WINDOW_PRIORITY = [
    # --- never driver-certified (value-oracled this round) ---
    "knn_cosine_ivf", "kmeans_cluster_sizes", "knn_cosine_pq",
    "semdedup_losers_fixed",
    # --- code paths changed this round ---
    "line_dedup_docs", "line_dedup_keep_first", "line_dup_stats",
    "scrub_dup_spans_docs", "event_transition_pagerank",
    # --- last certified round 1 (oldest first) ---
    "doc_sample", "embedding_near_dups", "embedding_norm_by_label",
    "events_hourly", "events_rolling_avg", "events_sessionize",
    "events_user_stats", "knn_cosine", "lang_counts",
    "nation_region_join", "order_revenue_by_priority",
    "orders_by_status", "orders_priority_filter", "part_brand_stats",
    "quality_stats", "search_and_membership", "search_not_membership",
    "search_or_membership", "search_tag_membership", "top_customers",
    # --- last certified round 2, stratified across families ---
    "export_matches", "export_matches_and",
    "doc_stats", "term_stats", "term_df", "top_terms",
    "top_terms_per_lang", "tokenize_postings", "bigram_counts",
    "index_term_stats", "search_count", "significant_terms",
    "list_docs_page", "warc_doc_stats", "jsonl_doc_stats",
    "bm25_topk_stemmed",
    "bm25_topk_regex", "bm25_topk_min_match", "phrase_topk",
    "nrt_delta_topk", "rollover_topk",
]


def queries() -> dict[str, Callable[[str], Any]]:
    cat = _queries_catalogue()
    ordered = {k: cat[k] for k in _DRIVER_WINDOW_PRIORITY if k in cat}
    ordered.update((k, v) for k, v in cat.items() if k not in ordered)
    return ordered


def _queries_catalogue() -> dict[str, Callable[[str], Any]]:
    from refimage_ray.pipelines import (
        corpus, curate, relational, search, training, vectors,
    )

    return {
        # --- full-text index / BM25 (the engine core) ---
        "corpus_stats": corpus.corpus_stats,
        "doc_stats": corpus.doc_stats,
        "term_df": corpus.term_df,
        "term_stats": corpus.term_stats,
        "top_terms": corpus.top_terms,
        "top_terms_per_lang": corpus.top_terms_per_lang,
        "tokenize_postings": corpus.tokenize_postings,
        "list_docs_page": corpus.list_docs_page,
        "bigram_counts": corpus.bigram_counts,
        # alternate corpus containers (ingest must round-trip
        # byte-faithfully → same oracle as the Parquet-sourced stats)
        "warc_doc_stats": corpus.warc_doc_stats,
        "jsonl_doc_stats": corpus.jsonl_doc_stats,
        "index_term_stats": search.index_term_stats,
        "bm25_topk": search.bm25_topk,
        "bm25_topk_stemmed": search.bm25_topk_stemmed,
        "rank_eval": search.rank_eval,
        "bm25_topk_and": search.bm25_topk_and,
        "bm25_topk_docpart": search.bm25_topk_docpart,
        "bm25_topk_prefix": search.bm25_topk_prefix,
        "bm25_topk_fuzzy": search.bm25_topk_fuzzy,
        "bm25_topk_wildcard": search.bm25_topk_wildcard,
        "bm25_topk_regex": search.bm25_topk_regex,
        "bm25_topk_min_match": search.bm25_topk_min_match,
        "bm25_topk_search_after": search.bm25_topk_search_after,
        "bm25_topk_synonyms": search.bm25_topk_synonyms,
        "more_like_this_topk": search.more_like_this_topk,
        "reindex_topk": search.reindex_topk,
        "bm25_topk_decay": search.bm25_topk_decay,
        "bm25_topk_decay_where": search.bm25_topk_decay_where,
        "bm25_topk_decay_docpart": search.bm25_topk_decay_docpart,
        "bm25_topk_filtered": search.bm25_topk_filtered,
        "bm25_topk_filtered_or": search.bm25_topk_filtered_or,
        "nrt_delta_topk": search.nrt_delta_topk,
        "nrt_docpart_delta_topk": search.nrt_docpart_delta_topk,
        "rollover_topk": search.rollover_topk,
        "federated_topk": search.federated_topk,
        "lifecycle_compact_topk": search.lifecycle_compact_topk,
        "docpart_add_topk": search.docpart_add_topk,
        "bm25_topk_filtered_docpart": search.bm25_topk_filtered_docpart,
        "bm25_topk_ordered": search.bm25_topk_ordered,
        "bm25_topk_ordered_multi": search.bm25_topk_ordered_multi,
        "doc_term_vector": search.doc_term_vector_query,
        "significant_terms": search.significant_terms_query,
        "export_matches": search.export_matches,
        "export_matches_and": search.export_matches_and,
        "search_count": search.search_count,
        "phrase_topk": search.phrase_topk,
        "phrase_topk_slop": search.phrase_topk_slop,
        "bm25_topk_near": search.bm25_topk_near,
        "bm25_topk_phrase_prefix": search.bm25_topk_phrase_prefix,
        "bm25_topk_rescored": search.bm25_topk_rescored,
        "bm25_topk_ordered_docpart": search.bm25_topk_ordered_docpart,
        "bm25_topk_rescored_docpart": search.bm25_topk_rescored_docpart,
        "bm25f_topk": search.bm25f_topk,
        "composite_buckets_page2": search.composite_buckets_page2,
        "composite_buckets_page2_docpart":
            search.composite_buckets_page2_docpart,
        "bm25_topk_page2": search.bm25_topk_page2,
        "bm25_grouped_by_lang": search.bm25_grouped_by_lang,
        "suggest_terms": search.suggest_terms,
        "suggest_phrase": search.suggest_phrase,
        "facet_counts_query": search.facet_counts_query,
        "facet_counts_docpart": search.facet_counts_docpart,
        "facet_doclen_hist": search.facet_doclen_hist,
        "facet_lang_token_sums": search.facet_lang_token_sums,
        "percolate_matches": search.percolate_matches,
        "search_and_membership": search.search_and_membership,
        "search_or_membership": search.search_or_membership,
        "search_not_membership": search.search_not_membership,
        "search_tag_membership": search.search_tag_membership,
        "search_facets": search.search_facets,
        "facet_month_hist": search.facet_month_hist,
        "facet_doclen_pct": search.facet_doclen_pct,
        "bm25_topk_runtime_filtered": search.bm25_topk_runtime_filtered,
        # --- dedup family ---
        "dedup_exact_docs": corpus.dedup_exact_docs,
        "dedup_incremental_docs": corpus.dedup_incremental_docs,
        "minhash_near_dups": corpus.minhash_near_dups,
        "ngram_jaccard_near_dups": corpus.ngram_jaccard_near_dups,
        "minhash_dup_clusters": corpus.minhash_dup_clusters,
        "simhash_values": corpus.simhash_values,
        "simhash_near_dups": corpus.simhash_near_dups,
        "curated_docs": curate.curated_docs,
        "line_dup_stats": curate.line_dup_stats,
        "line_dedup_docs": curate.line_dedup_docs,
        "line_dedup_keep_first": curate.line_dedup_keep_first,
        # --- text analysis ---
        "contamination_stats": corpus.contamination_stats,
        "dup_span_stats": corpus.dup_span_stats,
        "scrub_dup_spans_docs": corpus.scrub_dup_spans_docs,
        "doc_len_quantiles": corpus.doc_len_quantiles,
        "repetition_stats": corpus.repetition_stats,
        "heavy_hitters": corpus.heavy_hitters,
        "bigram_pmi": corpus.bigram_pmi,
        "doc_lexical_stats": corpus.doc_lexical_stats,
        "dup_rate_by_source": corpus.dup_rate_by_source,
        "zipf_fit": corpus.zipf_fit,
        "doc_perplexity": corpus.doc_perplexity,
        "perplexity_filter_stats": corpus.perplexity_filter_stats,
        "bpe_merges": corpus.bpe_merges,  # rows-only (greedy recursion)
        "lang_classifier_stats": corpus.lang_classifier_stats,  # rows-only (iterative)
        "bpe_token_stats": corpus.bpe_token_stats_query,  # rows-only
        "distinct_counts": corpus.distinct_counts,
        "distinct_terms_hll": corpus.distinct_terms_hll,
        "term_counts_cms": corpus.term_counts_cms,
        "lang_counts": corpus.lang_counts,
        "domain_stats": corpus.domain_stats,
        "url_canonical_docs": corpus.url_canonical_docs,
        "url_canonical_dedup": corpus.url_canonical_dedup,
        "quality_stats": corpus.quality_stats,
        "doc_fingerprints": corpus.doc_fingerprints,
        "langid_pred": corpus.langid_pred,
        # --- similarity search / embeddings ---
        "knn_cosine": vectors.knn_cosine,
        "knn_cosine_lsh": vectors.knn_cosine_lsh,
        "knn_cosine_ivf": vectors.knn_cosine_ivf,  # value-oracled (literal centroids)
        "knn_cosine_pq": vectors.knn_cosine_pq,    # value-oracled (literal codebooks)
        "knn_cosine_filtered": vectors.knn_cosine_filtered,
        "kmeans_cluster_sizes": vectors.kmeans_cluster_sizes,  # value-oracled (literal centroids)
        "semdedup_losers": vectors.semdedup_losers,  # rows-only (Lloyd-trained blocking)
        "semdedup_losers_fixed": vectors.semdedup_losers_fixed,  # value-oracled (literal centroids)
        "embedding_pca_stats": vectors.embedding_pca_stats,  # rows-only (no SQL eigensolver)
        "embedding_norm_by_label": vectors.embedding_norm_by_label,
        "lang_embedding_stats": vectors.lang_embedding_stats,
        "embedding_near_dups": vectors.embedding_near_dups,
        "embedding_near_dups_lsh": vectors.embedding_near_dups_lsh,
        "hybrid_rrf_topk": vectors.hybrid_rrf_topk,
        # --- relational / dataflow breadth ---
        "tpch_q1": relational.tpch_q1,
        "tpch_q3": relational.tpch_q3,
        "tpch_q6": relational.tpch_q6,
        "orders_late_shipment_priority":
            relational.orders_late_shipment_priority,
        "tpch_q5": relational.tpch_q5,
        "top_customers": relational.top_customers,
        "orders_by_status": relational.orders_by_status,
        "orders_priority_filter": relational.orders_priority_filter,
        "part_brand_stats": relational.part_brand_stats,
        "part_size_class": relational.part_size_class,
        "nation_region_join": relational.nation_region_join,
        "events_hourly": relational.events_hourly,
        "events_hopping": relational.events_hopping,
        "events_funnel": relational.events_funnel,
        "events_cohort_retention": relational.events_cohort_retention,
        "events_hourly_rollup": relational.events_hourly_rollup,
        "events_sessionize": relational.events_sessionize,
        "events_asof_last": relational.events_asof_last,
        "events_user_lag": relational.events_user_lag,
        "events_value_quantiles": relational.events_value_quantiles,
        "events_rolling_avg": relational.events_rolling_avg,
        "order_revenue_by_priority": relational.order_revenue_by_priority,
        "doc_sample": relational.doc_sample,
        "events_user_stats": relational.events_user_stats,
        "customer_order_counts_left": relational.customer_order_counts_left,
        "events_value_median": relational.events_value_median,
        "event_transition_pagerank": relational.event_transition_pagerank,
        "table_profile_lineitem": relational.table_profile_lineitem,
        # --- training-data preparation ---
        "pack_sequences": training.pack_sequences,
        "packed_sequences": training.packed_sequences,
        "curated_packed_sequences": training.curated_packed_sequences,
        "lm_gated_packed_sequences": training.lm_gated_packed_sequences,
        "lang_mixture_sample": training.lang_mixture_sample,
        "lang_temperature_sample": training.lang_temperature_sample,
        "stratified_sample": training.stratified_sample,
        "split_by_hash": training.split_by_hash,
        "url_latest_snapshot": training.url_latest_snapshot,
        "url_blocklist_stats": training.url_blocklist_stats,
        "crawl_delta_docs": training.crawl_delta_docs,
        "weighted_sample_docs": training.weighted_sample_docs,
        "doc_chunks": training.doc_chunks,
        "crawl_delta_summary": training.crawl_delta_summary,
        "pii_scrub_stats": training.pii_scrub_stats,
        "token_count_multi": training.token_count_multi,
        "global_shuffle_docs": training.global_shuffle_docs,
    }


def oracle_sql() -> dict[str, str]:
    from refimage_ray.functions.text import s_stem

    return {
        "corpus_stats": f"""
SELECT CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(dl) AS BIGINT) AS total_tokens,
       round(sum(dl) * 1.0 / count(*), 6) AS avgdl
FROM (SELECT len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS dl FROM documents)
""",
        "doc_stats": """
SELECT doc_id,
       CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS BIGINT) AS doc_len,
       CAST(length(text) AS BIGINT) AS text_len
FROM documents
""",
        # WARC / JSONL ingest must reproduce the Parquet-sourced stats
        # exactly — same oracle, different container on the Ray side
        "warc_doc_stats": """
SELECT doc_id,
       CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS BIGINT) AS doc_len,
       CAST(length(text) AS BIGINT) AS text_len
FROM documents
""",
        "jsonl_doc_stats": """
SELECT doc_id,
       CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS BIGINT) AS doc_len,
       CAST(length(text) AS BIGINT) AS text_len
FROM documents
""",
        "term_df": f"""
SELECT term, CAST(count(*) AS BIGINT) AS df
FROM (SELECT DISTINCT doc_id, term FROM ({_TOKS})) GROUP BY term
""",
        "term_stats": f"""
SELECT term, CAST(count(*) AS BIGINT) AS df, CAST(sum(tf) AS BIGINT) AS total_tf
FROM ({_TF}) GROUP BY term
""",
        "index_term_stats": f"""
SELECT term, CAST(count(*) AS BIGINT) AS df, CAST(sum(tf) AS BIGINT) AS total_tf
FROM ({_TF}) GROUP BY term
""",
        # Misra–Gries candidate pass + exact recount == plain GROUP BY
        # with a relative-frequency HAVING threshold
        "heavy_hitters": f"""
SELECT term, CAST(count(*) AS BIGINT) AS cnt
FROM ({_TOKS})
GROUP BY term
HAVING count(*) >= CAST(ceil(0.01 * (SELECT count(*) FROM ({_TOKS}))) AS BIGINT)
ORDER BY cnt DESC, term
""",
        # PMI mirrors the Ray float expression shape exactly:
        # ln((c_xy * N_uni^2) / (N_bi * c_x * c_y)), rounded to 6 dp
        # per-source exact-dup rollup (md5 grouping, SQL-parity hash)
        "dup_rate_by_source": """
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(DISTINCT md5(text)) AS BIGINT) AS n_distinct,
       round(1.0 - count(DISTINCT md5(text)) * 1.0 / count(*), 6)
         AS dup_rate
FROM documents GROUP BY source
""",
        # Zipf fit: ln(tf) vs ln(rank), rank by (tf desc, term asc)
        "zipf_fit": f"""
WITH tf AS (
  SELECT term, count(*) AS tf FROM ({_TOKS}) GROUP BY term
),
r AS (
  SELECT ln(CAST(tf AS DOUBLE)) AS y,
         ln(CAST(row_number() OVER (ORDER BY tf DESC, term) AS DOUBLE)) AS x
  FROM tf
)
SELECT CAST(count(*) AS BIGINT) AS n_terms,
       round(regr_slope(y, x), 6) AS slope,
       round(regr_intercept(y, x), 6) AS intercept,
       round(regr_r2(y, x), 6) AS r2
FROM r
""",
        # per-doc lexical richness (distinct/TTR/hapax)
        "doc_lexical_stats": f"""
WITH tf AS (
  SELECT doc_id, term, count(*) AS tf FROM ({_TOKS}) GROUP BY doc_id, term
),
agg AS (
  SELECT doc_id,
         CAST(sum(tf) AS BIGINT) AS n_tokens,
         CAST(count(*) AS BIGINT) AS distinct_terms,
         CAST(sum(CASE WHEN tf = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax
  FROM tf GROUP BY doc_id
)
SELECT d.doc_id,
       coalesce(a.n_tokens, 0) AS n_tokens,
       coalesce(a.distinct_terms, 0) AS distinct_terms,
       CASE WHEN a.n_tokens > 0
            THEN round(a.distinct_terms * 1.0 / a.n_tokens, 6) END AS ttr,
       coalesce(a.hapax, 0) AS hapax
FROM documents d LEFT JOIN agg a USING (doc_id)
""",
        # add-1 bigram LM self-perplexity, float-for-float with
        # stages/lm.py: p(cur|prev) = (C(prev,cur)+1)/(C(prev)+V),
        # ppl = exp(-avg ln p) over a doc's transitions; <2-token docs
        # have no transitions and are dropped on both sides
        "doc_perplexity": """
WITH docs AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t
  FROM documents
),
pos AS (
  SELECT doc_id, t[i - 1] AS prev, t[i] AS cur
  FROM docs, LATERAL (SELECT unnest(generate_series(2, len(t))) AS i) _
),
uni AS (
  SELECT w, CAST(count(*) AS DOUBLE) AS c
  FROM (SELECT unnest(t) AS w FROM docs) GROUP BY w
),
v AS (SELECT CAST(count(*) AS DOUBLE) AS v FROM uni),
big AS (
  SELECT prev, cur, CAST(count(*) AS DOUBLE) AS c FROM pos GROUP BY 1, 2
)
SELECT p.doc_id,
       round(exp(-avg(ln((coalesce(b.c, 0) + 1.0) / (u.c + v.v)))), 3) AS ppl
FROM pos p
CROSS JOIN v
JOIN uni u ON u.w = p.prev
LEFT JOIN big b ON b.prev = p.prev AND b.cur = p.cur
GROUP BY p.doc_id
""",
        # threshold applied to the SAME rounded ppl the engine gates on
        "perplexity_filter_stats": """
WITH docs AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t
  FROM documents
),
pos AS (
  SELECT doc_id, t[i - 1] AS prev, t[i] AS cur
  FROM docs, LATERAL (SELECT unnest(generate_series(2, len(t))) AS i) _
),
uni AS (
  SELECT w, CAST(count(*) AS DOUBLE) AS c
  FROM (SELECT unnest(t) AS w FROM docs) GROUP BY w
),
v AS (SELECT CAST(count(*) AS DOUBLE) AS v FROM uni),
big AS (
  SELECT prev, cur, CAST(count(*) AS DOUBLE) AS c FROM pos GROUP BY 1, 2
),
scored AS (
  SELECT p.doc_id,
         round(exp(-avg(ln((coalesce(b.c, 0) + 1.0) / (u.c + v.v)))), 3)
           AS ppl
  FROM pos p
  CROSS JOIN v
  JOIN uni u ON u.w = p.prev
  LEFT JOIN big b ON b.prev = p.prev AND b.cur = p.cur
  GROUP BY p.doc_id
)
SELECT CAST(count(*) AS BIGINT) AS kept_docs,
       CAST(sum(len(d.t)) AS BIGINT) AS kept_tokens
FROM scored s JOIN docs d USING (doc_id)
WHERE s.ppl <= 120.0
""",
        "bigram_pmi": """
WITH docs AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
  FROM documents
),
totals AS (
  SELECT CAST(sum(len(toks)) AS DOUBLE) AS n_uni,
         CAST(sum(greatest(len(toks) - 1, 0)) AS DOUBLE) AS n_bi
  FROM docs
),
uni AS (
  SELECT term, CAST(count(*) AS DOUBLE) AS tf
  FROM (SELECT unnest(toks) AS term FROM docs) GROUP BY term
),
pairs AS (
  SELECT unnest(list_transform(generate_series(1, len(toks) - 1),
                               i -> toks[i] || ' ' || toks[i + 1])) AS bigram
  FROM docs WHERE len(toks) >= 2
),
bi AS (
  SELECT bigram, count(*) AS n FROM pairs GROUP BY bigram HAVING count(*) >= 5
)
SELECT b.bigram,
       CAST(b.n AS BIGINT) AS n,
       round(ln((CAST(b.n AS DOUBLE) * t.n_uni * t.n_uni)
                / (t.n_bi * ux.tf * uy.tf)), 6) AS pmi
FROM bi b, totals t
JOIN uni ux ON ux.term = split_part(b.bigram, ' ', 1)
JOIN uni uy ON uy.term = split_part(b.bigram, ' ', 2)
""",
        "distinct_counts": f"""
SELECT CAST((SELECT count(DISTINCT term) FROM ({_TOKS})) AS BIGINT)
         AS distinct_terms,
       CAST((SELECT count(DISTINCT lang) FROM documents) AS BIGINT)
         AS distinct_langs
""",
        # the HLL and CMS SKETCHES are value-oracled too: registers /
        # table cells + estimators are pure functions of the md5-u64
        # token hashes (and CMS's fixed salts)
        "distinct_terms_hll": _hll_sql(p=12),
        "term_counts_cms": _cms_sql(
            ("data", "spark", "query", "zzz_absent")),
        "top_terms": f"""
SELECT term, CAST(count(*) AS BIGINT) AS df
FROM (SELECT DISTINCT doc_id, term FROM ({_TOKS}))
GROUP BY term ORDER BY df DESC, term LIMIT 20
""",
        # grouped top-k: per-batch (lang, term) df partials → multi-key
        # groupby → per-lang map_groups top-k; oracle via window rank
        "top_terms_per_lang": """
WITH toks AS (
  SELECT doc_id, lang, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
  FROM documents
),
df AS (
  SELECT lang, term, count(*) AS df
  FROM (SELECT DISTINCT doc_id, lang, term FROM toks) GROUP BY lang, term
),
r AS (
  SELECT lang, term, df,
         row_number() OVER (PARTITION BY lang ORDER BY df DESC, term) AS rn
  FROM df
)
SELECT lang, term, CAST(df AS BIGINT) AS df FROM r WHERE rn <= 5
ORDER BY lang, df DESC, term
""",
        "tokenize_postings": f"""
SELECT doc_id, term, CAST(tf AS BIGINT) AS tf FROM ({_TF}) WHERE doc_id < 100
""",
        "bigram_counts": """
WITH docs AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
  FROM documents
),
pairs AS (
  SELECT unnest(list_transform(generate_series(1, len(toks) - 1),
                               i -> toks[i] || ' ' || toks[i + 1])) AS bigram
  FROM docs WHERE len(toks) >= 2
)
SELECT bigram, CAST(count(*) AS BIGINT) AS n
FROM pairs GROUP BY bigram HAVING count(*) >= 5
""",
        "list_docs_page": """
SELECT doc_id, lang, n_chars FROM documents
ORDER BY n_chars DESC, doc_id LIMIT 50 OFFSET 100
""",
        # engine MinHash is md5-u64-token-hash Broder LSH — exactly
        # reproducible in SQL (banding + verify mirrored; perms from
        # the same fixed seed, inlined as VALUES)
        "minhash_near_dups": _minhash_pairs_sql(),
        "minhash_dup_clusters": _minhash_clusters_sql(),
        # exact 3-shingle Jaccard (the Ray path is hash-shingle-based —
        # equal to the tuple-set Jaccard absent 64-bit collisions; the
        # blocking is exact at the default anchor rate, recall 1.0)
        "ngram_jaccard_near_dups": """
WITH docs AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
  FROM documents
),
sh AS (
  SELECT DISTINCT doc_id, sh FROM (
    SELECT doc_id, unnest(list_transform(generate_series(1, len(toks) - 2),
                   i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2])) AS sh
    FROM docs WHERE len(toks) >= 3
    UNION ALL
    SELECT doc_id, unnest(toks) AS sh FROM docs WHERE len(toks) BETWEEN 1 AND 2
  )
),
cnt AS (SELECT doc_id, count(*) AS c FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       ROUND(i * 1.0 / (ca.c + cb.c - i), 6) AS jaccard
FROM inter JOIN cnt ca ON doc_a = ca.doc_id JOIN cnt cb ON doc_b = cb.doc_id
WHERE i * 1.0 / (ca.c + cb.c - i) >= 0.6
ORDER BY doc_a, doc_b
""",
        # engine simhash is md5-u64-token-hash Charikar — exactly
        # reproducible in SQL (see _SIMHASH); decimal-string presented
        # on both sides (uint64 overflows a signed BIGINT dataframe)
        "langid_pred": _langid_sql(),
        "curated_docs": _curated_sql(),
        # line/segment dedup: fixed 20-word windows mirror the engine's
        # vectorized segmentation exactly (verified: identical
        # total/distinct counts); grouping by the segment STRING in SQL
        # == grouping by md5-128 halves in the engine
        "line_dup_stats": f"""
{_SEGS_CTE}
SELECT CAST((SELECT count(*) FROM segs) AS BIGINT) AS total_segments,
       CAST((SELECT count(*) FROM segcnt) AS BIGINT) AS distinct_segments,
       CAST((SELECT COALESCE(sum(n), 0) FROM segcnt WHERE n >= 2) AS BIGINT)
         AS dup_segments,
       CAST((SELECT count(*) FROM segcnt WHERE n >= 2) AS BIGINT)
         AS distinct_dup_segments
""",
        "line_dedup_docs": f"""
{_SEGS_CTE}
SELECT s.doc_id,
       CAST(count(*) AS BIGINT) AS n_seg,
       CAST(sum(CASE WHEN c.n >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_removed,
       CAST(sum(CASE WHEN c.n < 2 THEN length(s.seg) ELSE 0 END)
            + GREATEST(count(*)
                       - sum(CASE WHEN c.n >= 2 THEN 1 ELSE 0 END) - 1,
                       0) AS BIGINT) AS kept_chars
FROM segs s JOIN segcnt c USING (seg)
GROUP BY s.doc_id
""",
        "line_dedup_keep_first": f"""
{_SEGS_CTE},
rk AS (
  SELECT doc_id, seg_idx, seg,
         count(*) OVER (PARTITION BY seg) AS n,
         row_number() OVER (PARTITION BY seg ORDER BY doc_id, seg_idx)
           AS rnk
  FROM segs
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_seg,
       CAST(sum(CASE WHEN n >= 2 AND rnk > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_removed,
       CAST(sum(CASE WHEN NOT (n >= 2 AND rnk > 1) THEN length(seg)
                     ELSE 0 END)
            + GREATEST(count(*)
                       - sum(CASE WHEN n >= 2 AND rnk > 1 THEN 1 ELSE 0 END)
                       - 1,
                       0) AS BIGINT) AS kept_chars
FROM rk
GROUP BY doc_id
""",
        # rolling polynomial fingerprint — Horner form over md5-u64
        # token hashes with HUGEINT mod-2^64 arithmetic (list_reduce);
        # decimal-string presented on both sides (uint64 range)
        "doc_fingerprints": """
WITH docs AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
  FROM documents
),
hs AS (
  SELECT doc_id,
         list_transform(toks,
                        t -> ('0x' || substr(md5(t), 1, 16))::UBIGINT) AS hl
  FROM docs
)
SELECT doc_id,
       CAST(CASE WHEN len(hl) = 0 THEN 0::UBIGINT
            ELSE list_reduce(hl, (a, b) -> CAST(
                   (CAST(a AS HUGEINT) * 1099511628211 + b)
                   % 18446744073709551616::HUGEINT AS UBIGINT))
            END AS VARCHAR) AS fingerprint
FROM hs
""",
        "simhash_values": f"""
SELECT doc_id, CAST(simhash AS VARCHAR) AS simhash FROM ({_SIMHASH})
""",
        # banding is part of the operator's semantics (4×16-bit chunks;
        # complete for hamming ≤ 3 by pigeonhole, intentionally
        # approximate above) — the oracle replicates band + verify
        "simhash_near_dups": f"""
WITH sh AS ({_SIMHASH}),
chunks AS (
  SELECT doc_id, simhash, c, (simhash >> (16 * c)) & 65535 AS chunk_val
  FROM sh, (SELECT unnest(generate_series(0, 3)) AS c)
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         a.simhash AS ha, b.simhash AS hb
  FROM chunks a JOIN chunks b
    ON a.c = b.c AND a.chunk_val = b.chunk_val AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, CAST(bit_count(xor(ha, hb)) AS BIGINT) AS hamming
FROM cand WHERE bit_count(xor(ha, hb)) <= 8
""",
        "bm25_topk": _bm25_sql(["spark", "join"], 10),
        # S-stemmed analysis chain: both the token stream AND the query
        # terms go through functions.text.s_stem (SQL mirror above)
        "bm25_topk_stemmed": _bm25_sql(
            [s_stem(t) for t in ["sparks", "joins", "tables"]],
            10, toks_sql=_TOKS_STEM,
        ),
        # retrieval-quality eval: BM25 ranking judged against the
        # conjunctive-membership relevance set, per eval query
        "rank_eval": _rank_eval_sql(
            ["spark join", "data table scan", "vector index"], 10
        ),
        "bm25_topk_and": _bm25_sql(["data", "table", "scan"], 10, conjunctive=True),
        # doc-partitioned layout is exact → same oracle as bm25_topk
        "bm25_topk_docpart": _bm25_sql(["spark", "join"], 10),
        # expansion queries: q derived from the corpus vocabulary, the
        # exact set the engine expands against (prefix range / SymSpell
        # neighborhood verified with plain Levenshtein = DuckDB's)
        "bm25_topk_prefix": _bm25_sql(None, 10, q_where="term LIKE 's%'"),
        "bm25_topk_fuzzy": _bm25_sql(
            None, 10, q_where="levenshtein(term, 'sow') <= 1"
        ),
        # wildcard glob == SQL LIKE by construction (* → %, ? → _)
        "bm25_topk_wildcard": _bm25_sql(None, 10, q_where="term LIKE 's_a%'"),
        # anchored regex == DuckDB regexp_full_match (same RE subset)
        "bm25_topk_regex": _bm25_sql(
            None, 10, q_where="regexp_full_match(term, '[a-z]*ow')"
        ),
        # minimum_should_match: >= 2 of the 3 query terms
        "bm25_topk_min_match": _bm25_sql(
            ["spark", "join", "scan"], 10, min_match=2
        ),
        # search_after cursor == the strict continuation of the total
        # order == LIMIT k OFFSET k (the engine path differs: O(k)
        # cursor mask, not a k+offset fetch)
        "bm25_topk_search_after": _bm25_sql(["data", "table"], 10, offset=10),
        # synonym mapping is an input, so its expansion union is a
        # fixed term list: {spark→stream, join→merge}
        "bm25_topk_synonyms": _bm25_sql(["spark", "stream", "join", "merge"], 10),
        # more-like-this: tf·idf term selection + weighted OR, both
        # fully mirrored in SQL (engine.more_like_this → search_weighted)
        "more_like_this_topk": _mlt_sql(7, 5, 10),
        # reindex under a predicate rebuilds the scoring basis over
        # the surviving corpus (corpus_where), unlike a query-time
        # doc_where filter which keeps corpus-wide stats
        "reindex_topk": _bm25_sql(
            ["spark", "join"], 10, corpus_where="lang = 'en'"
        ),
        # doc-value filter: result docs restricted to lang='en' AND
        # doc_len>=40; idf/avgdl/N stay corpus-wide like the engine
        # NRT: half the corpus built, half in the in-memory delta
        # buffer — merged stats make it equal a full rebuild, so the
        # oracle is plain BM25 over the WHOLE documents table
        "nrt_delta_topk": _bm25_sql(["stream", "window", "state"], 10),
        "nrt_docpart_delta_topk": _bm25_sql(["stream", "window", "state"], 10),
        # rollover group (3 tertile ingests, gen-1 sealed/merged):
        # federation == monolithic rebuild, so plain corpus BM25
        "rollover_topk": _bm25_sql(["stream", "window", "state"], 10),
        # 3-way federation == monolithic index == plain corpus BM25
        "federated_topk": _bm25_sql(["merge", "sort", "index"], 10),
        # decay boost: score × exp(ln(.5)/scale · |n_chars|), mirrored
        # float-for-float (engine factors() uses the same expression)
        "bm25_topk_decay": _bm25_sql(
            ["spark", "join"], 10,
            boost_sql="exp(ln(0.5) / 2000.0 * abs(d2.n_chars - 0.0))",
        ),
        "bm25_topk_decay_where": _bm25_sql(
            ["spark", "join"], 10,
            doc_where="d.lang = 'en'",
            boost_sql="exp(ln(0.5) / 2000.0 * abs(d2.n_chars - 0.0))",
        ),
        # doc-partitioned decay is exact by disjointness → same oracle
        "bm25_topk_decay_docpart": _bm25_sql(
            ["spark", "join"], 10,
            boost_sql="exp(ln(0.5) / 2000.0 * abs(d2.n_chars - 0.0))",
        ),
        "bm25_topk_filtered": _bm25_sql(
            ["spark", "join"], 10,
            doc_where="d.lang = 'en' AND dl.dl >= 40",
        ),
        # runtime field: chars-per-token = n_chars / doc_len, same
        # float64 division both sides → bit-identical comparisons
        "bm25_topk_runtime_filtered": _bm25_sql(
            ["spark", "join"], 10,
            doc_where="(d.n_chars * 1.0 / dl.dl) >= 5.05",
        ),
        # delete -> compact lifecycle: the oracle's corpus IS the live
        # set, so N/avgdl/df are the post-compaction basis
        "lifecycle_compact_topk": _bm25_sql(
            ["spark", "join"], 10, corpus_where="doc_id % 7 <> 0",
        ),
        # docpart incremental add == monolithic build -> full-corpus oracle
        "docpart_add_topk": _bm25_sql(["spark", "join"], 10),
        # DNF filter (OR of conjunctions) — engine where={"or": [...]}
        "bm25_topk_filtered_or": _bm25_sql(
            ["spark", "join"], 10,
            doc_where="(d.lang = 'en' AND dl.dl >= 40) OR d.lang = 'fr'",
        ),
        # doc-partitioned layout: shard-LOCAL doc values, per-shard
        # filtered top-k merged exactly (disjoint doc subsets)
        "bm25_topk_filtered_docpart": _bm25_sql(
            ["spark", "join"], 10, doc_where="d.lang = 'en'",
        ),
        # field-ordered results: match set ordered by n_chars desc
        # (engine: order_by=("n_chars","desc") over resident doc
        # values; n_chars == length(text), asserted by doc_stats)
        "bm25_topk_ordered": _bm25_sql(
            ["spark"], 10,
            order_by_sql="length(d2.text) DESC, s.doc_id",
        ),
        # full-match-set export as a Dataset (scroll/export-all):
        # membership == count-threshold over matched distinct terms
        "export_matches": """
WITH tf AS (SELECT doc_id, term, count(*) AS tf
            FROM (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
                  FROM documents) GROUP BY doc_id, term)
SELECT m.doc_id, CAST(m.nt AS BIGINT) AS n_terms, d.lang
FROM (SELECT doc_id, count(*) AS nt FROM tf
      WHERE term IN ('spark', 'vector') GROUP BY doc_id) m
JOIN documents d USING (doc_id)
ORDER BY m.doc_id
""",
        "export_matches_and": """
WITH tf AS (SELECT doc_id, term, count(*) AS tf
            FROM (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
                  FROM documents) GROUP BY doc_id, term)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_terms FROM tf
WHERE term IN ('spark', 'vector') GROUP BY doc_id
HAVING count(*) = 2 ORDER BY doc_id
""",
        # ES significant_terms: relative-risk vs corpus background over
        # the BM25 top-sample (the engine's deterministic total order)
        "significant_terms": """
WITH toks AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
              FROM documents),
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
stats AS (SELECT count(*)::DOUBLE AS n,
                 (SELECT sum(dl)::DOUBLE FROM dl) / count(*) AS avgdl
          FROM documents),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
q(term) AS (VALUES ('spark'), ('join')),
scores AS (
  SELECT tf.doc_id,
         sum( ln(1.0 + (s.n - df.df + 0.5) / (df.df + 0.5))
              * tf.tf / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / s.avgdl)) ) AS sc
  FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN stats s
  WHERE tf.term IN (SELECT term FROM q) GROUP BY tf.doc_id
),
sample AS (SELECT doc_id FROM scores ORDER BY sc DESC, doc_id LIMIT 200),
ns AS (SELECT count(*)::DOUBLE AS n FROM sample),
fg AS (SELECT t.term, count(*) AS f
       FROM tf t JOIN sample USING (doc_id) GROUP BY t.term)
SELECT fg.term, CAST(fg.f AS BIGINT) AS doc_count,
       CAST(df.df AS BIGINT) AS bg_count,
       round((fg.f / ns.n) / (df.df / s.n), 6) AS score
FROM fg JOIN df USING (term) CROSS JOIN ns CROSS JOIN stats s
WHERE fg.f >= 5
ORDER BY (fg.f / ns.n) / (df.df / s.n) DESC, fg.term
LIMIT 15
""",
        # per-doc term vector (ES _termvectors): tokenizer symmetry
        "doc_term_vector": """
WITH pos AS (
  SELECT t[i] AS term, i - 1 AS p
  FROM (SELECT regexp_extract_all(lower(text), '[a-z0-9]+') AS t
        FROM documents WHERE doc_id = 42) _,
       LATERAL (SELECT unnest(generate_series(1, len(t))) AS i) __
)
SELECT term, CAST(count(*) AS BIGINT) AS tf,
       CAST(min(p) AS BIGINT) AS first_pos
FROM pos GROUP BY term ORDER BY term
""",
        # multi-key field ordering (ES sort-array): secondary keys
        # decide within equal primaries, doc_id asc last
        "bm25_topk_ordered_multi": _bm25_sql(
            ["spark"], 10,
            order_by_sql="d2.lang ASC, d2.n_chars DESC, s.doc_id",
        ),
        # pagination: page 2 of the same total order (engine fetches
        # top k+offset and slices — page boundaries are deterministic)
        "bm25_topk_page2": _bm25_sql(["spark", "join"], 10, offset=10),
        "phrase_topk": _phrase_sql(["table", "scan"], slop=0, k=10),
        "bm25_topk_rescored": _rescore_sql("table", "scan", k=10, window=30),
        # cross-layout twins: exact by construction, same oracles
        "bm25_topk_ordered_docpart": _bm25_sql(
            ["spark"], 10,
            order_by_sql="length(d2.text) DESC, s.doc_id",
        ),
        "bm25_topk_rescored_docpart": _rescore_sql(
            "table", "scan", k=10, window=30),
        "bm25f_topk": _bm25f_sql(["spark", "join"], k=10, tw=3.0),
        # composite agg: after-key paging over key-ordered buckets is
        # definitionally OFFSET paging of the same ordered bucket list
        "composite_buckets_page2": f"""
WITH m AS (SELECT DISTINCT doc_id FROM ({_TOKS}) WHERE term = 'the')
SELECT d.lang, d.source, CAST(count(*) AS BIGINT) AS doc_count
FROM documents d JOIN m USING (doc_id)
GROUP BY d.lang, d.source
ORDER BY d.lang, d.source
LIMIT 10 OFFSET 10
""",
        # doc-partitioned exact composite (full per-shard bucket lists
        # merged additively) answers bucket-for-bucket the same page
        "composite_buckets_page2_docpart": f"""
WITH m AS (SELECT DISTINCT doc_id FROM ({_TOKS}) WHERE term = 'the')
SELECT d.lang, d.source, CAST(count(*) AS BIGINT) AS doc_count
FROM documents d JOIN m USING (doc_id)
GROUP BY d.lang, d.source
ORDER BY d.lang, d.source
LIMIT 10 OFFSET 10
""",
        # percolator: boolean membership per stored rule — set algebra
        # mirrors the DSL exactly (OR binds loosest, so
        # 'data OR graph NOT sql' = has(data) ∪ (has(graph) ∖ has(sql)))
        "percolate_matches": f"""
WITH toks AS ({_TOKS}),
has AS (SELECT DISTINCT doc_id, term FROM toks),
toks_arr AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t
  FROM documents
),
pos AS (
  SELECT doc_id, t[i] AS term, i
  FROM toks_arr, LATERAL (SELECT unnest(generate_series(1, len(t))) AS i) _
),
q_and AS (
  SELECT doc_id FROM has WHERE term = 'spark'
  INTERSECT
  SELECT doc_id FROM has WHERE term = 'vector'
),
q_or_not AS (
  SELECT doc_id FROM has WHERE term = 'data'
  UNION
  (SELECT doc_id FROM has WHERE term = 'graph'
   EXCEPT
   SELECT doc_id FROM has WHERE term = 'sql')
),
q_phrase AS (
  SELECT DISTINCT p0.doc_id FROM pos p0
  JOIN pos p1 ON p1.doc_id = p0.doc_id AND p1.term = 'scan'
             AND p1.i = p0.i + 1
  WHERE p0.term = 'table'
),
q_prefix AS (SELECT DISTINCT doc_id FROM has WHERE term LIKE 'netw%'),
q_tag AS (
  SELECT h.doc_id FROM has h JOIN documents d ON d.doc_id = h.doc_id
  WHERE h.term = 'spark' AND d.lang = 'en'
)
SELECT query_id, doc_id FROM (
  SELECT 'q_and' AS query_id, doc_id FROM q_and
  UNION ALL SELECT 'q_or_not', doc_id FROM q_or_not
  UNION ALL SELECT 'q_phrase', doc_id FROM q_phrase
  UNION ALL SELECT 'q_prefix', doc_id FROM q_prefix
  UNION ALL SELECT 'q_tag_and', doc_id FROM q_tag
) ORDER BY query_id, doc_id
""",
        "phrase_topk_slop": _phrase_sql(["data", "join"], slop=2, k=10),
        # unordered proximity (NEAR/3): span <= window, any order
        "bm25_topk_near": _near_sql(["spark", "join"], window=3, k=10),
        # search-as-you-type: last token prefix-completed against the
        # vocabulary, adjacency-verified per completion, per-doc MAX
        # over matching completions (engine.search_phrase_prefix)
        "bm25_topk_phrase_prefix": f"""
WITH toks_arr AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t
  FROM documents
),
pos AS (
  SELECT doc_id, t[i] AS term, i
  FROM toks_arr, LATERAL (SELECT unnest(generate_series(1, len(t))) AS i) _
),
pmatch AS (
  SELECT DISTINCT p0.doc_id, p1.term AS e
  FROM pos p0
  JOIN pos p1 ON p1.doc_id = p0.doc_id AND p1.i = p0.i + 1
  WHERE p0.term = 'data' AND p1.term LIKE 'ta%'
),
toks AS ({_TOKS}),
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
stats AS (SELECT count(*)::DOUBLE AS n,
                 (SELECT sum(dl)::DOUBLE FROM dl) / count(*) AS avgdl
          FROM documents),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
scores AS (
  SELECT pm.doc_id, pm.e,
         sum( ln(1.0 + (s.n - df.df + 0.5) / (df.df + 0.5))
              * tf.tf / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / s.avgdl)) ) AS sc
  FROM pmatch pm
  JOIN tf ON tf.doc_id = pm.doc_id AND tf.term IN ('data', pm.e)
  JOIN df ON df.term = tf.term
  JOIN dl ON dl.doc_id = pm.doc_id
  CROSS JOIN stats s
  GROUP BY pm.doc_id, pm.e
),
best AS (SELECT doc_id, max(sc) AS sc FROM scores GROUP BY doc_id)
SELECT doc_id, round(sc, 4) AS score
FROM best ORDER BY sc DESC, doc_id LIMIT 10
""",
        # engine.count: match-set sizes, no scoring — m counts DISTINCT
        # matched query terms per doc (tf has one row per doc,term)
        "search_count": """
WITH toks AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
              FROM documents),
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
q(term) AS (VALUES ('spark'), ('join'), ('stream')),
m AS (SELECT doc_id, count(*) AS nt FROM tf
      WHERE term IN (SELECT term FROM q) GROUP BY doc_id)
SELECT
  (SELECT CAST(count(*) AS BIGINT) FROM m) AS n_or,
  (SELECT CAST(count(*) AS BIGINT) FROM m WHERE nt = 3) AS n_and,
  (SELECT CAST(count(*) AS BIGINT) FROM m WHERE nt >= 2) AS n_min2,
  (SELECT CAST(count(*) AS BIGINT) FROM m JOIN documents d USING (doc_id)
   WHERE d.lang = 'en') AS n_or_en
""",
        # grouped top-k: best 3 hits per lang (ES top_hits analog);
        # exact — one full evaluation + per-group prefix take
        "bm25_grouped_by_lang": _bm25_sql(
            ["spark", "join"], 3, grouped_by="lang"
        ),
        # did-you-mean: the full Levenshtein-<=1 vocabulary
        # neighborhood of a misspelled probe, with dfs
        "suggest_terms": f"""
WITH tf AS ({_TF}),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY term)
SELECT term, CAST(df AS BIGINT) AS df
FROM df WHERE levenshtein(term, 'sow') <= 1
""",
        # phrase-level did-you-mean: argmax over the per-term lev<=1
        # candidate cross-product of ln p_uni(w1) + ln p(w2|w1) under
        # the add-1 bigram LM (the engine's PhraseSuggester, mirrored
        # float-for-float; candidate cap 8 by count desc, term asc)
        "suggest_phrase": """
WITH docs AS (
  SELECT regexp_extract_all(lower(text), '[a-z0-9]+') AS t FROM documents
),
uni AS (
  SELECT w, CAST(count(*) AS DOUBLE) AS c
  FROM (SELECT unnest(t) AS w FROM docs) GROUP BY w
),
v AS (
  SELECT CAST(count(*) AS DOUBLE) AS v, CAST(sum(c) AS DOUBLE) AS tot
  FROM uni
),
pos AS (
  SELECT t[i - 1] AS prev, t[i] AS cur
  FROM docs, LATERAL (SELECT unnest(generate_series(2, len(t))) AS i) _
),
big AS (
  SELECT prev, cur, CAST(count(*) AS DOUBLE) AS c FROM pos GROUP BY 1, 2
),
c1 AS (
  SELECT w, c FROM (
    SELECT w, c, row_number() OVER (ORDER BY c DESC, w) AS rn
    FROM uni WHERE levenshtein(w, 'tabl') <= 1
  ) WHERE rn <= 8
),
c2 AS (
  SELECT w, c FROM (
    SELECT w, c, row_number() OVER (ORDER BY c DESC, w) AS rn
    FROM uni WHERE levenshtein(w, 'scann') <= 1
  ) WHERE rn <= 8
)
SELECT c1.w || ' ' || c2.w AS suggestion,
       round(ln((c1.c + 1.0) / (v.tot + v.v))
             + ln((coalesce(b.c, 0) + 1.0) / (c1.c + v.v)), 4) AS score
FROM c1 CROSS JOIN c2 CROSS JOIN v
LEFT JOIN big b ON b.prev = c1.w AND b.cur = c2.w
ORDER BY ln((c1.c + 1.0) / (v.tot + v.v))
         + ln((coalesce(b.c, 0) + 1.0) / (c1.c + v.v)) DESC,
         suggestion
LIMIT 1
""",
        # query-time facet panel: value counts per facet column over
        # the disjunctive match set (resident doc values engine-side);
        # doc-partitioned facets are exact by additive merge → the SAME
        # oracle re-checks that layout
        "facet_counts_query": _FACET_COUNTS_SQL,
        "facet_counts_docpart": _FACET_COUNTS_SQL,
        # sub-aggregation facet: per-lang token-mass sum over the
        # match set of one-term query 'data'
        "facet_lang_token_sums": f"""
WITH toks AS ({_TOKS}),
dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
m AS (SELECT DISTINCT doc_id FROM toks WHERE term = 'data')
SELECT d.lang AS value, CAST(sum(dl.dl) AS BIGINT) AS sum_doc_len
FROM documents d JOIN m USING (doc_id) JOIN dl USING (doc_id)
GROUP BY d.lang
""",
        # histogram facet: fixed-width doc_len buckets over the match
        # set of one-term query 'data' (bucket = dl // 50 * 50)
        "facet_doclen_hist": f"""
WITH toks AS ({_TOKS}),
dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
m AS (SELECT DISTINCT doc_id FROM toks WHERE term = 'data')
SELECT CAST(dl.dl // 50 * 50 AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS n_docs
FROM dl JOIN m USING (doc_id) GROUP BY bucket
""",
        # exact percentiles facet: value at rank ceil(q*n) of the
        # match set's doc_len (same discrete definition as
        # events_value_quantiles)
        "facet_doclen_pct": f"""
WITH toks AS ({_TOKS}),
dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
m AS (SELECT DISTINCT doc_id FROM toks WHERE term = 'data'),
vals AS (
  SELECT dl.dl, row_number() OVER (ORDER BY dl.dl) AS rn,
         count(*) OVER () AS n
  FROM dl JOIN m USING (doc_id)
)
SELECT qs.q, CAST(v.dl AS DOUBLE) AS value
FROM (VALUES (0.5), (0.9)) AS qs(q)
JOIN vals v ON v.rn = CAST(ceil(qs.q * v.n) AS BIGINT)
""",
        "search_and_membership": f"""
SELECT DISTINCT doc_id FROM ({_TOKS}) WHERE term = 'spark'
INTERSECT SELECT DISTINCT doc_id FROM ({_TOKS}) WHERE term = 'vector'
""",
        # date_histogram facet: derived ts (mirrored expression) →
        # date_trunc month over the 'data' match set
        "facet_month_hist": f"""
WITH m AS (SELECT DISTINCT doc_id FROM ({_TOKS}) WHERE term = 'data'),
tsd AS (
  SELECT doc_id,
         TIMESTAMP '2023-01-01'
           + (doc_id % 397) * INTERVAL 1 DAY
           + (doc_id % 1440) * INTERVAL 1 MINUTE AS ts
  FROM documents
)
SELECT date_trunc('month', ts) AS bucket,
       CAST(count(*) AS BIGINT) AS n_docs
FROM tsd JOIN m USING (doc_id)
GROUP BY 1
""",
        "search_or_membership": f"""
SELECT DISTINCT doc_id FROM ({_TOKS}) WHERE term = 'spark'
UNION SELECT DISTINCT doc_id FROM ({_TOKS}) WHERE term = 'vector'
""",
        "search_not_membership": f"""
SELECT DISTINCT doc_id FROM ({_TOKS}) WHERE term = 'spark'
EXCEPT SELECT DISTINCT doc_id FROM ({_TOKS}) WHERE term = 'vector'
""",
        "search_tag_membership": f"""
SELECT DISTINCT doc_id FROM ({_TOKS}) WHERE term = 'spark'
INTERSECT SELECT doc_id FROM documents WHERE lang = 'en'
""",
        # facets over the OR-query match set: per-lang hit count and
        # token mass (engine side aggregates over the INDEX membership)
        "search_facets": f"""
WITH m AS (
  SELECT DISTINCT doc_id FROM ({_TOKS}) WHERE term = 'spark'
  UNION SELECT DISTINCT doc_id FROM ({_TOKS}) WHERE term = 'vector'
)
SELECT d.lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(len(regexp_extract_all(lower(d.text), '[a-z0-9]+'))) AS BIGINT)
         AS sum_tokens
FROM documents d JOIN m USING (doc_id)
GROUP BY d.lang
""",
        "dedup_exact_docs": """
SELECT CAST(min(doc_id) AS BIGINT) AS doc_id, CAST(count(*) AS BIGINT) AS n_dups
FROM documents GROUP BY text
""",
        # cross-crawl incremental dedup: odd-half delta survivors after
        # (a) existing-corpus content wins (even half's hash set), then
        # (b) first-doc_id-wins within the delta
        "dedup_incremental_docs": """
WITH old_h AS (
  SELECT DISTINCT md5(text) AS h FROM documents WHERE doc_id % 2 = 0
),
keep AS (
  SELECT doc_id,
         row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
  FROM documents
  WHERE doc_id % 2 = 1 AND md5(text) NOT IN (SELECT h FROM old_h)
)
SELECT doc_id FROM keep WHERE rn = 1
""",
        "lang_counts": """
SELECT lang, CAST(count(*) AS BIGINT) AS n_docs FROM documents GROUP BY lang
""",
        # overlapping word-window chunks: start every 32 words while
        # start < len; window = 64 words, ragged tail (chunk_batch rule)
        "doc_chunks": """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
SELECT doc_id, t.g AS chunk_idx,
       CAST(least(64, len(ws) - t.g*32) AS BIGINT) AS n_words,
       array_to_string(ws[t.g*32+1 : t.g*32+64], ' ') AS chunk
FROM w, UNNEST(generate_series(0, CAST(ceil(len(ws)/32.0) AS INT)-1))
     AS t(g)
""",
        # Efraimidis–Spirakis race keys: (h+0.5)/2^64 and -ln(u)/w are
        # the same float64 ops on both sides → bit-identical keys
        "weighted_sample_docs": """
SELECT doc_id, n_chars,
       -ln((CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 16))
                 ::UBIGINT AS DOUBLE) + 0.5) / 18446744073709551616.0)
         / n_chars AS sample_key
FROM documents
WHERE n_chars > 0
ORDER BY sample_key, doc_id
LIMIT 100
""",
        # crawl delta: FULL OUTER JOIN of the two derived snapshots;
        # the engine compares full-128-bit content fingerprints, SQL
        # compares the texts themselves — equal by md5 injectivity
        "crawl_delta_docs": f"""
{_CRAWL_DELTA_CTE}
SELECT doc_id, status FROM m
""",
        "crawl_delta_summary": f"""
{_CRAWL_DELTA_CTE}
SELECT s.status, CAST(COALESCE(c.n, 0) AS BIGINT) AS n
FROM (VALUES ('added'), ('changed'), ('removed'), ('unchanged'))
     s(status)
LEFT JOIN (SELECT status, count(*) AS n FROM m GROUP BY status) c
  USING (status)
""",
        "url_canonical_docs": _url_canon_sql(
            "SELECT doc_id, canonical_url FROM canon"
        ),
        "url_canonical_dedup": _url_canon_sql(
            "SELECT canonical_url, CAST(count(*) AS BIGINT) AS n_dups, "
            "min(doc_id) AS keeper FROM canon "
            "GROUP BY canonical_url HAVING count(*) >= 2"
        ),
        "domain_stats": """
SELECT source || '.' || lang || '.example.org' AS host,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
       CAST(max(n_chars) AS BIGINT) AS max_chars
FROM documents GROUP BY host
""",
        # decontamination: token 8-grams vs the doc_id%97==0 benchmark
        # slice; counts gram POSITIONS whose gram is in the bench set
        "contamination_stats": """
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t FROM documents
),
grams AS (
  SELECT doc_id, array_to_string(t[i:i+7], ' ') AS g
  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(t) - 7)) AS i)
),
bench AS (SELECT DISTINCT g FROM grams WHERE doc_id % 97 = 0)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hit_grams
FROM grams JOIN bench USING (g)
GROUP BY doc_id
""",
        # exact corpus quantiles via bounded-int histogram (rule:
        # sorted[ceil(p*n)-1] == DuckDB quantile_disc)
        "doc_len_quantiles": """
WITH dl AS (
  SELECT len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS doc_len
  FROM documents
)
SELECT 0.25 AS p, CAST(quantile_disc(doc_len, 0.25) AS BIGINT) AS doc_len FROM dl
UNION ALL
SELECT 0.5, CAST(quantile_disc(doc_len, 0.5) AS BIGINT) FROM dl
UNION ALL
SELECT 0.75, CAST(quantile_disc(doc_len, 0.75) AS BIGINT) FROM dl
UNION ALL
SELECT 0.9, CAST(quantile_disc(doc_len, 0.9) AS BIGINT) FROM dl
UNION ALL
SELECT 0.99, CAST(quantile_disc(doc_len, 0.99) AS BIGINT) FROM dl
""",
        # exact-substring duplication: positions whose token 3-gram
        # appears in >= 2 distinct docs (engine: gram-df groupby +
        # bucketed semi-join back to the (gram, doc) pairs)
        "dup_span_stats": """
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t FROM documents
),
grams AS (
  SELECT doc_id, array_to_string(t[i:i+2], ' ') AS g
  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(t) - 2)) AS i)
),
gd AS (
  SELECT g FROM (
    SELECT g, count(DISTINCT doc_id) AS nd FROM grams GROUP BY g
  ) WHERE nd >= 2
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_dup_positions
FROM grams JOIN gd USING (g)
GROUP BY doc_id
""",
        # ExactSubstr scrub (drop-all): every token position covered by
        # a >=2-distinct-doc 3-gram is excised; cleaned token-space
        # text rebuilt in position order
        "scrub_dup_spans_docs": """
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t FROM documents
),
grams AS (
  SELECT doc_id, i, array_to_string(t[i:i+2], ' ') AS g
  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(t) - 2)) AS i)
),
gd AS (
  SELECT g FROM (
    SELECT g, count(DISTINCT doc_id) AS nd FROM grams GROUP BY g
  ) WHERE nd >= 2
),
cov AS (
  SELECT DISTINCT doc_id, i + j AS p
  FROM grams JOIN gd USING (g),
       LATERAL (SELECT unnest(generate_series(0, 2)) AS j) _
),
toklist AS (
  SELECT doc_id, p, t[p] AS tok
  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(t))) AS p) _
),
kept AS (
  SELECT tl.doc_id, tl.p, tl.tok
  FROM toklist tl LEFT JOIN cov ON tl.doc_id = cov.doc_id AND tl.p = cov.p
  WHERE cov.p IS NULL
),
k AS (
  SELECT doc_id, count(*) AS nk, string_agg(tok, ' ' ORDER BY p) AS txt
  FROM kept GROUP BY doc_id
)
SELECT toks.doc_id,
       CAST(len(toks.t) AS BIGINT) AS n_tokens,
       CAST(len(toks.t) - coalesce(k.nk, 0) AS BIGINT) AS n_removed,
       coalesce(k.txt, '') AS text
FROM toks LEFT JOIN k USING (doc_id)
""",
        # Gopher repetition signals: top-1 word / bigram share per doc
        "repetition_stats": """
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t FROM documents
),
words AS (
  SELECT doc_id, unnest(t) AS w FROM toks
),
wc AS (SELECT doc_id, w, count(*) AS c FROM words GROUP BY doc_id, w),
wf AS (SELECT doc_id, round(max(c) * 1.0 / sum(c), 6) AS top_word_frac FROM wc GROUP BY doc_id),
bigrams AS (
  SELECT doc_id, t[i] || ' ' || t[i+1] AS b
  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(t) - 1)) AS i)
),
bc AS (SELECT doc_id, b, count(*) AS c FROM bigrams GROUP BY doc_id, b),
bf AS (SELECT doc_id, round(max(c) * 1.0 / sum(c), 6) AS top_bigram_frac FROM bc GROUP BY doc_id)
SELECT d.doc_id,
       COALESCE(wf.top_word_frac, 0.0) AS top_word_frac,
       COALESCE(bf.top_bigram_frac, 0.0) AS top_bigram_frac
FROM documents d
LEFT JOIN wf ON d.doc_id = wf.doc_id
LEFT JOIN bf ON d.doc_id = bf.doc_id
""",
        "quality_stats": f"""
WITH agg AS (
  SELECT doc_id, count(*) AS n_tokens,
         sum(CASE WHEN term IN ({_STOPLIST_SQL}) THEN 1 ELSE 0 END) AS n_stop,
         sum(length(term)) AS sum_len
  FROM ({_TOKS}) GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(coalesce(a.n_tokens, 0) AS BIGINT) AS n_tokens,
       CAST(coalesce(a.n_stop, 0) AS BIGINT) AS n_stopwords,
       round(coalesce(a.n_stop, 0) * 1.0 / greatest(coalesce(a.n_tokens, 0), 1), 6)
           AS stopword_ratio,
       round(coalesce(a.sum_len, 0) * 1.0 / greatest(coalesce(a.n_tokens, 0), 1), 6)
           AS mean_token_len
FROM documents d LEFT JOIN agg a USING (doc_id)
""",
        # filtered vector search: label predicate BEFORE top-k
        "knn_cosine_filtered": """
WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
           FROM embeddings WHERE vec_id IN (0, 1))
SELECT q.query_id, e.vec_id,
       round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qe), 4) AS score
FROM embeddings e CROSS JOIN q
WHERE e.label IN (1, 2)
QUALIFY row_number() OVER (
    PARTITION BY q.query_id
    ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qe) DESC, e.vec_id
) <= 10
""",
        # LSH probing is deterministic (seeded planes embed as SQL
        # literals) — the approximate variants are value-oracled too
        "knn_cosine_lsh": _knn_lsh_sql((0, 1), k=10),
        "embedding_near_dups_lsh": _lsh_neardup_sql(tau=0.45),
        # seeded-literal centroids (the hyperplane trick extended to
        # argmax-over-literal-rows) value-oracle the IVF probe and the
        # k-means assignment histogram too
        "knn_cosine_ivf": _ivf_sql((0, 1), k=10),
        "kmeans_cluster_sizes": _kmeans_sizes_sql(k=8),
        "knn_cosine_pq": _pq_sql((0, 1), k=10),
        "semdedup_losers_fixed": _semdedup_fixed_sql(k=8),
        "knn_cosine": """
WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
           FROM embeddings WHERE vec_id IN (0, 1))
SELECT q.query_id, e.vec_id,
       round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qe), 4) AS score
FROM embeddings e CROSS JOIN q
QUALIFY row_number() OVER (
    PARTITION BY q.query_id
    ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qe) DESC, e.vec_id
) <= 10
""",
        "embedding_norm_by_label": """
SELECT label, CAST(count(*) AS BIGINT) AS n_vecs,
       round(sum(sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                       CAST(embedding AS DOUBLE[])))) / count(*), 4)
           AS avg_norm
FROM embeddings GROUP BY label ORDER BY label
""",
        # cross-table metadata join: embeddings × documents on
        # vec_id = doc_id (bucketed hash_join on the Ray side)
        "lang_embedding_stats": """
SELECT d.lang, CAST(count(*) AS BIGINT) AS n_vecs,
       round(sum(sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                       CAST(e.embedding AS DOUBLE[])))) / count(*), 4)
           AS avg_norm
FROM embeddings e JOIN documents d ON e.vec_id = d.doc_id
GROUP BY d.lang ORDER BY d.lang
""",
        "hybrid_rrf_topk": _hybrid_rrf_sql(
            ["spark", "join"], qvec_id=0, k=10, n_each=50, rrf_k=60
        ),
        "embedding_near_dups": """
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                    CAST(b.embedding AS DOUBLE[])), 4) AS cosine
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                             CAST(b.embedding AS DOUBLE[])) >= 0.45
""",
        # q3: revenue rounded to cents BEFORE the order/limit, ties
        # (revenue desc, o_orderdate, l_orderkey) — engine-identical
        "tpch_q3": """
SELECT l_orderkey,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       o_orderdate
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1996-06-01'
  AND l_shipdate > TIMESTAMP '1996-06-01'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, o_orderdate, l_orderkey
LIMIT 10
""",
        # q5: whole-unit revenue rounding (distributed float sums on
        # 1e9-magnitude values — see the tpch_q1 note)
        "tpch_q5": """
SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 0) AS revenue
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
  AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n_name
""",
        "tpch_q1": """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 0) AS sum_qty,
       round(sum(l_extendedprice), 0) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 0) AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 0) AS sum_charge,
       CAST(count(*) AS BIGINT) AS count_order,
       round(sum(l_quantity) / count(*), 4) AS avg_qty,
       round(sum(l_extendedprice) / count(*), 4) AS avg_price,
       round(sum(l_discount) / count(*), 4) AS avg_disc
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
""",
        "top_customers": """
WITH spend AS (
  SELECT o_custkey, sum(o_totalprice) AS ts, count(*) AS n
  FROM orders GROUP BY o_custkey
)
SELECT c_custkey, c_name, CAST(n AS BIGINT) AS n_orders, round(ts, 2) AS total_spent
FROM spend JOIN customer ON c_custkey = o_custkey
ORDER BY ts DESC, c_custkey LIMIT 10
""",
        "orders_by_status": """
SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_orders
FROM orders GROUP BY o_orderstatus
""",
        "orders_priority_filter": """
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders
FROM orders WHERE o_orderstatus = 'F' GROUP BY o_orderpriority
""",
        "part_brand_stats": """
SELECT p_brand, CAST(count(*) AS BIGINT) AS n_parts,
       max(p_size) AS max_size, min(p_size) AS min_size,
       round(sum(p_retailprice) / count(*), 4) AS avg_price
FROM part GROUP BY p_brand ORDER BY p_brand
""",
        # range join against the broadcast interval table (lo incl,
        # hi excl; inner semantics — out-of-range rows drop)
        "part_size_class": """
WITH classes(lo, hi, size_class) AS (
  VALUES (0, 10, 'small'), (10, 25, 'mid'), (25, 51, 'large')
)
SELECT c.size_class, CAST(count(*) AS BIGINT) AS n_parts,
       round(sum(p_retailprice) / count(*), 4) AS avg_price
FROM part p JOIN classes c ON p.p_size >= c.lo AND p.p_size < c.hi
GROUP BY c.size_class
""",
        "nation_region_join": """
SELECT r_name, CAST(count(*) AS BIGINT) AS n_nations
FROM nation JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name ORDER BY r_name
""",
        "customer_order_counts_left": """
SELECT c.c_custkey, c.c_mktsegment,
       CAST(coalesce(o.n, 0) AS BIGINT) AS n_orders
FROM customer c
LEFT JOIN (SELECT o_custkey, count(*) AS n FROM orders GROUP BY o_custkey) o
  ON o.o_custkey = c.c_custkey
""",
        "table_profile_lineitem": _profile_sql(),
        "tpch_q6": """
SELECT CAST(round(sum(l_extendedprice * l_discount)) AS DOUBLE) AS revenue
FROM lineitem
WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
""",
        "orders_late_shipment_priority": """
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
FROM orders o
WHERE o.o_orderdate >= DATE '1996-01-01'
  AND o.o_orderdate < DATE '1996-04-01'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey
      AND l.l_shipdate >= o.o_orderdate + INTERVAL 30 DAY
  )
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
        "events_value_median": """
SELECT event_type, round(quantile_cont(value, 0.5), 6) AS median_value
FROM events GROUP BY event_type ORDER BY event_type
""",
        # ordered funnel: each step strictly after the user's FIRST
        # completion of the previous step
        "events_funnel": """
WITH s1 AS (SELECT user_id, min(ts) AS t FROM events
            WHERE event_type = 'view' GROUP BY user_id),
s2 AS (SELECT e.user_id, min(e.ts) AS t FROM events e JOIN s1 USING (user_id)
       WHERE e.event_type = 'click' AND e.ts > s1.t GROUP BY e.user_id),
s3 AS (SELECT e.user_id, min(e.ts) AS t FROM events e JOIN s2 USING (user_id)
       WHERE e.event_type = 'purchase' AND e.ts > s2.t GROUP BY e.user_id)
SELECT step, CAST(step_idx AS BIGINT) AS step_idx,
       CAST(n_users AS BIGINT) AS n_users
FROM (VALUES
  ('view', 1, (SELECT count(*) FROM s1)),
  ('click', 2, (SELECT count(*) FROM s2)),
  ('purchase', 3, (SELECT count(*) FROM s3))) AS t(step, step_idx, n_users)
""",
        # weekly cohort retention (Monday weeks, offsets < 8)
        "events_cohort_retention": """
WITH w AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS wk
           FROM events),
c AS (SELECT user_id, min(wk) AS cw FROM w GROUP BY user_id)
SELECT c.cw AS cohort_week,
       CAST(date_diff('day', c.cw, w.wk) // 7 AS BIGINT) AS week_offset,
       CAST(count(*) AS BIGINT) AS n_users
FROM w JOIN c USING (user_id)
WHERE date_diff('day', c.cw, w.wk) // 7 < 8
GROUP BY 1, 2
""",
        # hopping windows: L=60min, H=30min → each event in 2 windows
        # (window starts hop-aligned, ts ∈ [start, start+L))
        "events_hopping": """
WITH e AS (SELECT event_type, value, epoch_us(ts) AS us FROM events),
x AS (
  SELECT event_type, value,
         make_timestamp(((us // 1800000000) - i) * 1800000000)
           AS window_start
  FROM e, LATERAL (SELECT unnest(generate_series(0, 1)) AS i) _
  WHERE ((us // 1800000000) - i) * 1800000000 + 3600000000 > us
)
SELECT event_type, window_start,
       CAST(count(*) AS BIGINT) AS n_events,
       round(sum(value), 4) AS sum_value
FROM x GROUP BY 1, 2
""",
        "events_hourly": """
SELECT event_type, date_trunc('hour', ts) AS hour,
       CAST(count(*) AS BIGINT) AS n_events, round(sum(value), 4) AS sum_value
FROM events GROUP BY event_type, hour ORDER BY event_type, hour
""",
        # rollup artifact + raw tail must reproduce the plain aggregate
        "events_hourly_rollup": """
SELECT event_type, date_trunc('hour', ts) AS hour,
       CAST(count(*) AS BIGINT) AS n_events, round(sum(value), 4) AS sum_value
FROM events GROUP BY event_type, hour ORDER BY event_type, hour
""",
        # damped power iteration UNROLLED as 20 chained CTEs (standard
        # SQL bars aggregating a recursive CTE's working table) — the
        # previously rows-only iterative operator now has a full value
        # oracle; float parity holds at the 9-digit boundary rounding
        "event_transition_pagerank": _pagerank_sql(iters=20, d=0.85),
        "order_revenue_by_priority": """
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_items,
       round(sum(l_extendedprice * (1 - l_discount)), 0) AS total_revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority ORDER BY o_orderpriority
""",
        "doc_sample": """
SELECT doc_id, lang FROM documents
WHERE CAST((CAST(doc_id AS HUGEINT) * 2654435761) % 4294967296 AS BIGINT)
      < CAST(0.2 * 4294967296 AS BIGINT)
""",
        # exact rank-ceil(q*n) selection (distributed histogram
        # bisection == plain ORDER BY/OFFSET)
        "events_value_quantiles": """
WITH n AS (SELECT count(*) AS n FROM events),
ranked AS (
  SELECT value, row_number() OVER (ORDER BY value) AS rn FROM events
)
SELECT qs.q, r.value
FROM (VALUES (0.5), (0.9), (0.99)) AS qs(q), n
JOIN ranked r ON r.rn = CAST(ceil(qs.q * n.n) AS BIGINT)
""",
        # lag/lead window per user (same in-group ordering contract as
        # the engine: ts then event_id)
        "events_user_lag": """
SELECT user_id, event_id,
       round(lag(value) OVER w, 4) AS prev_value,
       round(lead(value) OVER w, 4) AS next_value,
       round(epoch(ts - lag(ts) OVER w), 6) AS gap_seconds
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
""",
        # as-of join (strictly prior, per user): last 'click' before
        # each event — IGNORE NULLS last_value over a 1-preceding frame
        "events_asof_last": """
SELECT user_id, event_id, ts,
       last_value(CASE WHEN event_type = 'click' THEN ts END IGNORE NULLS)
         OVER w AS prev_ts,
       round(last_value(CASE WHEN event_type = 'click' THEN value END IGNORE NULLS)
         OVER w, 4) AS prev_value
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
""",
        "events_rolling_avg": """
SELECT user_id, event_id, ts,
       round(avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4)
           AS rolling_avg
FROM events
""",
        "events_sessionize": """
WITH o AS (
  SELECT user_id, ts, value,
         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
              OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                 > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_sess
  FROM events
), s AS (
  SELECT user_id, ts, value,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                             ROWS UNBOUNDED PRECEDING) AS session_id
  FROM o
)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
       CAST(count(*) AS BIGINT) AS n_events,
       min(ts) AS start_ts, max(ts) AS end_ts,
       round(sum(value), 4) AS sum_value
FROM s GROUP BY user_id, session_id
""",
        "events_user_stats": """
SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(DISTINCT event_type) AS BIGINT) AS n_types,
       round(sum(value), 4) AS sum_value
FROM events GROUP BY user_id
""",
        # sequence packing: global scan over doc_id order, budget 256
        # (engine: two-pass distributed prefix-sum, stages/packing.py)
        "pack_sequences": """
WITH dl AS (
  SELECT doc_id, len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS dl
  FROM documents
),
o AS (
  SELECT doc_id, dl,
         COALESCE(SUM(dl) OVER (ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS st
  FROM dl
)
SELECT doc_id,
       CAST(st // 256 AS BIGINT) AS seq_id,
       CAST(st % 256 AS BIGINT) AS begin_offset,
       CAST(CASE WHEN dl > 0 THEN (st + dl - 1) // 256 - st // 256
                 ELSE 0 END AS BIGINT) AS n_crossings
FROM o
""",
        # three-tokenizer cost model (engine token, whitespace, BPE-ish
        # pre-tokenizer classes) — same RE2 patterns both sides
        "token_count_multi": r"""
SELECT doc_id,
       CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS BIGINT) AS n_tokens,
       CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_ws_tokens,
       CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]')) AS BIGINT) AS n_bpe_tokens
FROM documents
""",
        # deterministic global shuffle: the permutation is a VALUE
        # (shuffle_pos = rank by multiplicative-hash key), so the
        # order-insensitive compare still pins the whole ordering
        # HUGEINT cast before the multiply (like the sibling oracles):
        # doc_id * 2654435761 overflows INT64 for doc_id >= ~3.5e9
        "global_shuffle_docs": """
SELECT doc_id,
       CAST((CAST(doc_id AS HUGEINT) * 2654435761) % 4294967296 AS BIGINT)
           AS shuffle_key,
       CAST(row_number() OVER (
           ORDER BY (CAST(doc_id AS HUGEINT) * 2654435761) % 4294967296,
                    doc_id
       ) - 1 AS BIGINT) AS shuffle_pos
FROM documents
""",
        # packed token-id sequences: per-seq count / id-sum /
        # position-weighted id-sum (pins content AND order; vocab id =
        # rank of the term in the sorted distinct-term list, exactly
        # stages.packing.build_vocab)
        "packed_sequences": """
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t FROM documents
),
pos AS (
  SELECT doc_id, t[i] AS term, i
  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(t))) AS i)
),
vocab AS (
  SELECT term, row_number() OVER (ORDER BY term) - 1 AS vid
  FROM (SELECT DISTINCT term FROM pos)
),
stream AS (
  SELECT row_number() OVER (ORDER BY p.doc_id, p.i) - 1 AS gp, v.vid
  FROM pos p JOIN vocab v USING (term)
)
SELECT CAST(gp // 256 AS BIGINT) AS seq_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(sum(vid) AS BIGINT) AS sum_ids,
       CAST(sum((gp % 256 + 1) * vid) AS BIGINT) AS possum_ids
FROM stream GROUP BY seq_id
""",
        # composed pipeline: curation keep-set -> packed survivor
        # stream (vocab over survivors; same checksum shape)
        "curated_packed_sequences": _curated_packed_sql(),
        "lm_gated_packed_sequences": _lm_gated_packed_sql(),
        # per-language mixture gate: same multiplicative hash as
        # doc_sample, threshold from DEFAULT_LANG_RATES
        # exact-count stratified sample: lowest-n md5-u64 hashes per
        # lang — the combiner+finalizer == one window-function rank
        "stratified_sample": """
WITH h AS (
  SELECT doc_id, lang,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 16))::UBIGINT AS hv
  FROM documents
),
r AS (
  SELECT doc_id, lang,
         row_number() OVER (PARTITION BY lang ORDER BY hv, doc_id) AS rn
  FROM h
)
SELECT doc_id, lang FROM r WHERE rn <= 30
""",
        # deterministic train/val/test holdout: md5-u64 bucket % 100
        # (train < 98, val = 98, test = 99); checksummed per split
        "split_by_hash": """
WITH s AS (
  SELECT doc_id,
         CASE
           WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 16))::UBIGINT
                % 100 < 98 THEN 'train'
           WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 16))::UBIGINT
                % 100 < 99 THEN 'val'
           ELSE 'test'
         END AS split,
         len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS dl
  FROM documents
)
SELECT split,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(dl) AS BIGINT) AS total_tokens,
       CAST(sum(doc_id) AS BIGINT) AS sum_doc_ids
FROM s GROUP BY split
""",
        # latest-snapshot-per-url (argmax by derived fetch offset, then
        # doc_id) with the per-url snapshot count
        "url_latest_snapshot": """
WITH v AS (
  SELECT source || '.' || lang || '.example.org/page-'
           || CAST(doc_id % 500 AS VARCHAR) AS url,
         doc_id,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 16))::UBIGINT
              % 1000000 AS BIGINT) AS ts_off
  FROM documents
),
r AS (
  SELECT url, doc_id,
         row_number() OVER (PARTITION BY url
                            ORDER BY ts_off DESC, doc_id DESC) AS rn,
         count(*) OVER (PARTITION BY url) AS n
  FROM v
)
SELECT url, doc_id AS latest_doc_id, CAST(n AS BIGINT) AS n_snapshots
FROM r WHERE rn = 1
""",
        # temperature sampling (alpha=0.5): r_l = p_l^(alpha-1) / max,
        # same power()/floor() float path as the engine
        "lang_temperature_sample": """
WITH c AS (SELECT lang, CAST(count(*) AS DOUBLE) AS n
           FROM documents GROUP BY lang),
tot AS (SELECT sum(n) AS n FROM c),
w AS (SELECT lang, power(c.n / tot.n, -0.5) AS w FROM c, tot),
mx AS (SELECT max(w) AS m FROM w),
rate AS (SELECT lang, w.w / mx.m AS r FROM w, mx)
SELECT d.doc_id, d.lang
FROM documents d JOIN rate USING (lang)
WHERE CAST((CAST(doc_id AS HUGEINT) * 2654435761) % 4294967296 AS BIGINT)
      < CAST(floor(rate.r * 4294967296) AS BIGINT)
""",
        "lang_mixture_sample": """
SELECT doc_id, lang FROM documents
-- floor(), not CAST-to-BIGINT: DuckDB's CAST rounds to nearest while
-- the engine truncates (int()), an off-by-one threshold at e.g. 0.1
WHERE CAST((CAST(doc_id AS HUGEINT) * 2654435761) % 4294967296 AS BIGINT)
      < CAST(floor((CASE lang WHEN 'en' THEN 1.0 WHEN 'es' THEN 0.5
              WHEN 'fr' THEN 0.5 WHEN 'de' THEN 0.25 WHEN 'zh' THEN 0.1
              ELSE 0.05 END) * 4294967296) AS BIGINT)
""",
        "url_blocklist_stats": """
SELECT source || '.' || lang || '.example.org' AS host,
       CAST(count(*) AS BIGINT) AS n_docs
FROM documents
WHERE source || '.' || lang || '.example.org' NOT IN
      ('src3.de.example.org', 'src7.zh.example.org', 'src12.es.example.org')
GROUP BY host
""",
        # PII scrub over the id-augmented corpus (augmentation mirrored
        # verbatim in pipelines/training._augment_pii; RE2 both sides)
        "pii_scrub_stats": r"""
WITH synth AS (
  SELECT doc_id,
         text || ' contact doc' || CAST(doc_id AS VARCHAR)
              || '@example.com from 192.168.' || CAST(doc_id % 256 AS VARCHAR)
              || '.' || CAST(doc_id % 100 AS VARCHAR)
              || ' call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS s
  FROM documents
)
-- counts mirror the engine's PROGRESSIVE redaction: n_ips counts on
-- the email-redacted text, n_phones on the email+ip-redacted text
, steps AS (
  SELECT doc_id, s,
         regexp_replace(s, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}',
                        '<EMAIL>', 'g') AS s1
  FROM synth
), steps2 AS (
  SELECT doc_id, s, s1,
         regexp_replace(s1, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b',
                        '<IP>', 'g') AS s2
  FROM steps
)
SELECT doc_id,
       CAST(len(regexp_extract_all(s, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(s1, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT) AS n_ips,
       CAST(len(regexp_extract_all(s2, '\b\d{3}-\d{4}\b')) AS BIGINT) AS n_phones,
       CAST(length(regexp_replace(s2, '\b\d{3}-\d{4}\b', '<PHONE>', 'g')) AS BIGINT) AS clean_len
FROM steps2
""",
    }

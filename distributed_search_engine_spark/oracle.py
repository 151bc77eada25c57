"""DuckDB oracle SQL for the driver's correctness gate.

Each SQL string replicates — in ANSI-ish DuckDB SQL over the pre-registered
`documents` view — exactly what the corresponding Spark pipeline computes,
using the SAME tokenization templates from functions/text.py so the two
dialects cannot drift apart. Floating-point outputs are rounded to 6dp on
BOTH sides (sums of doubles may differ in the last ulp between engines).

Stemming is not expressible in SQL, so oracle-gated scoring queries run the
engine in with_stems=False mode over query terms that are Porter fixpoints
('data', 'spark', 'join', ...); the stemmed paths are covered by pytest
goldens and rows-only queries() entries.
"""

from __future__ import annotations

from .functions.text import MAX_DOC_CHARS, duckdb_tokens_expr, duckdb_worth
from .query.engine import BM25_B, BM25_K1


def base_ctes() -> str:
    """Shared CTE chain: docs -> token stream (with stream positions) ->
    worthy postings -> doc stats -> term stats. Mirrors operators/docstats.py
    and operators/postings.py (unstemmed)."""
    toks = duckdb_tokens_expr("text")
    return f"""
WITH docs AS (
  SELECT doc_id::varchar AS doc_id, text FROM documents
  WHERE text IS NOT NULL AND length(text) <= {MAX_DOC_CHARS}
),
tokarr AS (
  SELECT doc_id, {toks} AS toks FROM docs
),
tokstream AS (
  SELECT doc_id, unnest(toks) AS tok, generate_subscripts(toks, 1) AS pos
  FROM tokarr
),
worthy AS (
  SELECT doc_id, tok AS term, pos FROM tokstream
  WHERE tok <> '' AND {duckdb_worth('tok')}
),
tf AS (
  SELECT term, doc_id, count(*)::int AS tf, list_sort(list(pos)) AS positions
  FROM worthy GROUP BY 1, 2
),
docstats AS (
  SELECT d.doc_id,
         coalesce(s.doc_len, 0) AS doc_len,
         coalesce(s.max_tf, 1) AS max_tf
  FROM docs d LEFT JOIN (
    SELECT doc_id, sum(tf)::int AS doc_len, greatest(max(tf), 1)::int AS max_tf
    FROM tf GROUP BY 1
  ) s USING (doc_id)
),
nstats AS (
  SELECT count(*)::double AS n, avg(doc_len) AS avgdl FROM docstats
),
postings AS (
  SELECT t.term, t.doc_id, t.tf,
         t.tf::double AS weighted_tf,
         CASE WHEN t.tf > 0 AND d.max_tf > 0
              THEN 0.4 + 0.6 * t.tf / d.max_tf ELSE 0.0 END AS normalized_tf,
         d.doc_len, t.positions
  FROM tf t JOIN docstats d USING (doc_id)
),
termstats AS (
  SELECT term, count(*)::int AS df,
         ln((SELECT n FROM nstats) / count(*)) AS idf,
         ln(((SELECT n FROM nstats) - count(*) + 0.5) / (count(*) + 0.5) + 1.0) AS idf_bm25
  FROM postings GROUP BY term
)
"""


DOC_STATS_SQL = base_ctes() + """
SELECT ds.doc_id, ds.doc_len, ds.max_tf,
       substr(trim(regexp_replace(string_split(d.text, chr(10))[1], '\\s+', ' ', 'g')), 1, 200) AS title
FROM docstats ds JOIN docs d USING (doc_id)
"""

POSTINGS_SQL = base_ctes() + """
SELECT term, doc_id, tf, round(normalized_tf, 6) AS normalized_tf, doc_len,
       array_to_string(positions, ' ') AS positions
FROM postings
"""

TERM_STATS_SQL = base_ctes() + """
SELECT term, df, round(idf, 6) AS idf, round(idf_bm25, 6) AS idf_bm25
FROM termstats
"""

CONTENT_SHA_SQL = f"""
SELECT doc_id::varchar AS doc_id, sha256(text) AS content_sha
FROM documents WHERE text IS NOT NULL AND length(text) <= {MAX_DOC_CHARS}
"""


def tfidf_single_sql(term: str) -> str:
    """Reference-mode single-term score: normalized_tf * idf (pagerank 0,
    no title boost) — SearchEngine.java:256-333 with Q9 blend at pr=0."""
    return base_ctes() + f"""
SELECT p.doc_id, round(p.normalized_tf * ts.idf, 6) AS score
FROM postings p JOIN termstats ts USING (term)
WHERE p.term = '{term}' AND p.normalized_tf > 0
"""


def bm25_sql(terms: list[str]) -> str:
    inlist = ", ".join(f"'{t}'" for t in terms)
    return base_ctes() + f"""
SELECT p.doc_id,
       round(sum(ts.idf_bm25 * p.tf * ({BM25_K1} + 1.0)
                 / (p.tf + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * p.doc_len
                    / (SELECT avgdl FROM nstats)))), 6) AS score
FROM postings p JOIN termstats ts USING (term)
WHERE p.term IN ({inlist})
GROUP BY p.doc_id
"""


def pagerank_sql(iterations: int = 3) -> str:
    """Unrolled PageRank over the deterministic synthetic link graph
    (operators/pagerank.py synthetic_links): each doc -> (id+1)%N and
    (id*3+7)%N. Exact reference math: per-share 0.85*rank/L transfer,
    additive 0.15 base, dangling mass dropped (jobs/PageRank.java:271,319)."""
    parts = [
        """
WITH nn AS (SELECT count(*)::bigint AS n FROM documents),
links AS (
  SELECT DISTINCT src, dst FROM (
    SELECT doc_id AS src, (doc_id + 1) % (SELECT n FROM nn) AS dst FROM documents
    UNION ALL
    SELECT doc_id AS src, (doc_id * 3 + 7) % (SELECT n FROM nn) AS dst FROM documents
  )
),
deg AS (SELECT src, count(*)::bigint AS l FROM links GROUP BY 1),
r0 AS (SELECT doc_id, 1.0::double AS rank FROM documents)"""
    ]
    for k in range(1, iterations + 1):
        parts.append(f""",
r{k} AS (
  SELECT d.doc_id, 0.15 + coalesce(c.s, 0) AS rank
  FROM documents d LEFT JOIN (
    SELECT lk.dst AS doc_id, sum(0.85 * r.rank / g.l) AS s
    FROM links lk JOIN r{k - 1} r ON r.doc_id = lk.src JOIN deg g ON g.src = lk.src
    GROUP BY lk.dst
  ) c USING (doc_id)
)""")
    parts.append(
        f"\nSELECT doc_id::varchar AS doc_id, round(rank, 6) AS rank FROM r{iterations}"
    )
    return "".join(parts)


def and_phrase_sql(w1: str, w2: str) -> str:
    """Two-term reference-mode: AND filter + phrase x1.5 + all-matched x4.0
    (pagerank 0, no title boost) — Q5/Q7/Q8/Q10 chain."""
    return base_ctes() + f"""
, hits AS (
  SELECT p.doc_id, p.term, p.normalized_tf * ts.idf AS contrib, p.positions
  FROM postings p JOIN termstats ts USING (term)
  WHERE p.term IN ('{w1}', '{w2}') AND p.normalized_tf > 0
)
SELECT h1.doc_id,
       round((h1.contrib + h2.contrib)
             * (CASE WHEN len(list_intersect(list_transform(h1.positions, p -> p + 1),
                                             h2.positions)) > 0
                     THEN 1.5 ELSE 1.0 END)
             * 4.0, 6) AS score
FROM hits h1
JOIN hits h2 ON h1.doc_id = h2.doc_id
WHERE h1.term = '{w1}' AND h2.term = '{w2}'
"""

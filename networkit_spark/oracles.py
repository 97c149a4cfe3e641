"""DuckDB oracle SQL for every driver-checked query in __spark_entry__.py.

Each SQL string is the EXACT relational twin of the Spark binding in
networkit_spark/queries.py: same derivation of the edge table
(sources/tables.py EDGES_CTE), same hash function (md5 → lowercase hex),
same tie-breaks, same rounding. Iterative algorithms (PageRank, hash-min
CC, synchronous PLP) are unrolled to a FIXED superstep count so the oracle
is plain ANSI SQL — the convergence behaviour itself is covered by pytest
against the reference's golden fixtures (tests/).
"""

from __future__ import annotations

from networkit_spark.operators.dedup import LSH_ROWS_PER_BAND, MINHASH_SEEDS
from networkit_spark.operators.similarity import hyperplane_weights
from networkit_spark.functions.text import LANG_MARKERS, STOPWORDS
from networkit_spark.sources.tables import EDGES_CTE, GRAPH_MODULUS as _M

PR_ITERS = 5
CC_ITERS = 8
PLP_ITERS = 2
DAMP = 0.85


# --------------------------------------------------------------- graph SQL
def graph_stats_sql() -> str:
    return f"""
WITH {EDGES_CTE}
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM v) AS n_nodes,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM edges) AS n_arcs,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM und) AS n_und_edges
"""


def graph_degrees_sql() -> str:
    return f"""
WITH {EDGES_CTE}
SELECT v.id,
       CAST(COALESCE(o.c, 0) AS BIGINT) AS out_degree,
       CAST(COALESCE(i.c, 0) AS BIGINT) AS in_degree
FROM v
LEFT JOIN (SELECT src AS id, COUNT(*) AS c FROM edges GROUP BY src) o ON o.id = v.id
LEFT JOIN (SELECT dst AS id, COUNT(*) AS c FROM edges GROUP BY dst) i ON i.id = v.id
"""


def pagerank_sql(iters: int = PR_ITERS, damp: float = DAMP, undirected: bool = False) -> str:
    """Unrolled power iteration; directed variant distributes sink mass
    (PageRank.cpp:84-91), matching pagerank_fixed(distribute_sinks)."""
    table = "sym" if undirected else "edges"
    parts = [
        f"""outdeg AS (SELECT src AS id, CAST(SUM(weight) AS DOUBLE) AS deg
  FROM {table} GROUP BY src)""",
        f"""en AS (SELECT e.src, e.dst, e.weight / d.deg AS frac
  FROM {table} e JOIN outdeg d ON d.id = e.src)""",
        "nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM v)",
        "r0 AS (SELECT id, 1.0 / (SELECT n FROM nn) AS score FROM v)",
    ]
    for k in range(1, iters + 1):
        parts.append(
            f"""s{k} AS (SELECT COALESCE(SUM(score), 0.0) AS mass FROM r{k - 1}
  WHERE id NOT IN (SELECT id FROM outdeg))"""
        )
        parts.append(
            f"""c{k} AS (SELECT en.dst AS id, SUM(r.score * en.frac) AS contrib
  FROM en JOIN r{k - 1} r ON r.id = en.src GROUP BY en.dst)"""
        )
        sink = f" + {damp} / (SELECT n FROM nn) * (SELECT mass FROM s{k})" if not undirected else ""
        parts.append(
            f"""r{k} AS (SELECT v.id,
  (1.0 - {damp}) / (SELECT n FROM nn) + {damp} * COALESCE(c.contrib, 0.0){sink} AS score
  FROM v LEFT JOIN c{k} c ON c.id = v.id)"""
        )
    body = ",\n".join(parts)
    return f"""
WITH {EDGES_CTE},
{body}
SELECT id, ROUND(score, 6) AS score FROM r{iters}
"""


def pagerank_converged_sql(damp: float = DAMP, tol: float = 1e-8) -> str:
    """Convergence-mode PageRank as a RECURSIVE CTE: DuckDB iterates the
    same superstep as operators/pagerank.py (teleport + damped pull +
    distributed sink mass) until the same stopping rule — L2 norm of the
    pre-swap score delta ≤ tol (PageRank.cpp:53-63). The iteration count
    is discovered by BOTH engines independently from the data, so the
    hash compare verifies the full tol-driven semantics, not a fixed
    unroll. Each recursive row carries the iteration's global L2 diff
    (window over the working table) so the guard can read the previous
    iteration's residual."""
    return f"""
WITH RECURSIVE {EDGES_CTE},
outdeg AS (SELECT src AS id, CAST(SUM(weight) AS DOUBLE) AS deg FROM edges GROUP BY src),
en AS (SELECT e.src, e.dst, e.weight / d.deg AS frac FROM edges e JOIN outdeg d ON d.id = e.src),
nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM v),
pr AS (
  SELECT 0 AS it, id, 1.0 / (SELECT n FROM nn) AS score, 1e308 AS diff FROM v
  UNION ALL
  SELECT nxt.it, nxt.id, nxt.score,
         SQRT(SUM((nxt.score - nxt.old_score) * (nxt.score - nxt.old_score)) OVER ()) AS diff
  FROM (
    SELECT p.it + 1 AS it, p.id,
           (1.0 - {damp}) / (SELECT n FROM nn)
             + {damp} * COALESCE(c.contrib, 0.0)
             + {damp} / (SELECT n FROM nn)
               * (SELECT COALESCE(SUM(score), 0.0) FROM pr
                  WHERE id NOT IN (SELECT id FROM outdeg)) AS score,
           p.score AS old_score
    FROM pr p
    LEFT JOIN (SELECT en.dst AS id, SUM(p2.score * en.frac) AS contrib
               FROM en JOIN pr p2 ON p2.id = en.src GROUP BY en.dst) c ON c.id = p.id
  ) nxt
  WHERE (SELECT MIN(diff) FROM pr) > {tol}
)
SELECT id, ROUND(score, 6) AS score FROM pr WHERE it = (SELECT MAX(it) FROM pr)
"""


def eigenvector_top20_sql(tol: float = 1e-6, max_iterations: int = 50) -> str:
    """Eigenvector centrality to convergence (recursive CTE twin of
    operators/centrality.py eigenvector_centrality): power iteration on
    the symmetrized adjacency, L2-normalized per step, stop when the L∞
    score delta ≤ tol or the iteration cap hits. Top-20 ordered by the
    ROUNDED score (HALF_UP, 4 dp) then id — both engines sort on the
    displayed precision so near-ties can't diverge on 1e-15 raw-score
    noise."""
    return f"""
WITH RECURSIVE {EDGES_CTE},
nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM v),
ev AS (
  SELECT 0 AS it, id, 1.0 / SQRT((SELECT n FROM nn)) AS score, 1e308 AS diff FROM v
  UNION ALL
  SELECT nrm.it, nrm.id, nrm.score,
         MAX(ABS(nrm.score - nrm.old_score)) OVER () AS diff
  FROM (
    SELECT raw.it, raw.id,
           raw.raw / SQRT(SUM(raw.raw * raw.raw) OVER ()) AS score,
           raw.old_score
    FROM (
      SELECT p.it + 1 AS it, p.id,
             COALESCE(g.rawsum, 0.0) AS raw, p.score AS old_score
      FROM ev p
      LEFT JOIN (SELECT s.dst AS id, SUM(p2.score * s.weight) AS rawsum
                 FROM sym s JOIN ev p2 ON p2.id = s.src GROUP BY s.dst) g ON g.id = p.id
    ) raw
  ) nrm
  WHERE (SELECT MIN(diff) FROM ev) > {tol} AND (SELECT MIN(it) FROM ev) < {max_iterations}
)
SELECT id, ROUND(score, 4) AS score
FROM ev WHERE it = (SELECT MAX(it) FROM ev)
ORDER BY ROUND(score, 4) DESC, id
LIMIT 20
"""


def community_summary_sql(labels_parquet: str) -> str:
    """Property oracle for nondeterministic community detection
    (PLM / Leiden): the Spark query materializes its labels to a
    side-channel parquet, then both engines independently recompute the
    SAME summary from (labels, edges) — partition properness (every
    vertex exactly once, labels ⊆ vertex set), community count, and
    modularity / coverage with the Modularity.cpp:44-82 formula. A wrong
    Spark modularity implementation, an improper partition, or a
    divergent label set all break the hash. The quality LEVEL of the
    labels is held by pytest (planted recovery, karate goldens) — the
    reference contract for exactly this class of check is
    CommunityGTest.cpp:284-305."""
    return f"""
WITH {EDGES_CTE},
labels AS (SELECT id, label FROM read_parquet('{labels_parquet}/*.parquet')),
proper AS (
  SELECT (SELECT COUNT(*) FROM v) = (SELECT COUNT(*) FROM labels)
     AND NOT EXISTS (SELECT 1 FROM labels WHERE label IS NULL)
     AND NOT EXISTS (SELECT 1 FROM labels GROUP BY id HAVING COUNT(*) > 1)
     AND NOT EXISTS (SELECT 1 FROM labels l LEFT JOIN v ON v.id = l.id
                     WHERE v.id IS NULL) AS ok
),
el AS (SELECT e.u, e.v, 1.0 AS weight, lu.label AS lu, lv.label AS lv
  FROM und e JOIN labels lu ON lu.id = e.u JOIN labels lv ON lv.id = e.v),
tot AS (SELECT SUM(CASE WHEN lu = lv THEN weight ELSE 0.0 END) AS intra,
               SUM(weight) AS m FROM el),
vol AS (SELECT src AS id, SUM(weight) AS vol FROM sym GROUP BY src),
volc AS (SELECT l.label, SUM(COALESCE(vol.vol, 0.0)) AS vol_c
  FROM labels l LEFT JOIN vol ON vol.id = l.id GROUP BY l.label)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM labels) AS n_nodes,
       (SELECT CAST(COUNT(DISTINCT label) AS BIGINT) FROM labels) AS n_communities,
       (SELECT ok FROM proper) AS is_proper,
       ROUND((SELECT intra / m FROM tot)
         - (SELECT SUM(POW(vol_c / (2.0 * (SELECT m FROM tot)), 2)) FROM volc),
         6) AS modularity,
       ROUND((SELECT intra / m FROM tot), 6) AS coverage
"""


def cc_sql(iters: int = CC_ITERS) -> str:
    parts = ["l0 AS (SELECT id, id AS label FROM v)"]
    for k in range(1, iters + 1):
        parts.append(
            f"""l{k} AS (SELECT id, MIN(label) AS label FROM (
    SELECT id, label FROM l{k - 1}
    UNION ALL
    SELECT s.dst AS id, l.label FROM sym s JOIN l{k - 1} l ON l.id = s.src
  ) GROUP BY id)"""
        )
    body = ",\n".join(parts)
    return f"""
WITH {EDGES_CTE},
{body}
SELECT id, label FROM l{iters}
"""


def cc_sizes_sql(iters: int = CC_ITERS) -> str:
    inner = cc_sql(iters).strip()
    return f"""
SELECT label, CAST(COUNT(*) AS BIGINT) AS size FROM ({inner}) GROUP BY label
"""


def plp_sql(iters: int = PLP_ITERS) -> str:
    parts = ["p0 AS (SELECT id, id AS label FROM v)"]
    for k in range(1, iters + 1):
        parts.append(
            f"""h{k} AS (SELECT id, label FROM (
    SELECT s.dst AS id, p.label, SUM(s.weight) AS w,
           ROW_NUMBER() OVER (PARTITION BY s.dst
                              ORDER BY SUM(s.weight) DESC, p.label ASC) AS rn
    FROM sym s JOIN p{k - 1} p ON p.id = s.src
    GROUP BY s.dst, p.label
  ) WHERE rn = 1)"""
        )
        parts.append(
            f"""p{k} AS (SELECT v.id, COALESCE(h.label, p.label) AS label
  FROM v JOIN p{k - 1} p ON p.id = v.id
  LEFT JOIN h{k} h ON h.id = v.id)"""
        )
    body = ",\n".join(parts)
    return f"""
WITH {EDGES_CTE},
{body}
SELECT id, label FROM p{iters}
"""


TRI_CTE = """
deg AS (SELECT id, COUNT(*) AS degree FROM (
    SELECT u AS id FROM und UNION ALL SELECT v AS id FROM und
  ) GROUP BY id),
ord_e AS (SELECT
    CASE WHEN (du.degree < dv.degree)
           OR (du.degree = dv.degree AND e.u < e.v) THEN e.u ELSE e.v END AS lo,
    CASE WHEN (du.degree < dv.degree)
           OR (du.degree = dv.degree AND e.u < e.v) THEN e.v ELSE e.u END AS hi
  FROM und e JOIN deg du ON du.id = e.u JOIN deg dv ON dv.id = e.v),
tri AS (SELECT e1.lo AS a, e1.hi AS b, e2.hi AS c
  FROM ord_e e1 JOIN ord_e e2 ON e1.hi = e2.lo
  WHERE EXISTS (SELECT 1 FROM ord_e e3 WHERE e3.lo = e1.lo AND e3.hi = e2.hi))
""".strip()


def triangle_total_sql() -> str:
    return f"""
WITH {EDGES_CTE},
{TRI_CTE}
SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles FROM tri
"""


def triangle_per_node_sql() -> str:
    return f"""
WITH {EDGES_CTE},
{TRI_CTE},
corners AS (SELECT a AS id FROM tri UNION ALL SELECT b FROM tri UNION ALL SELECT c FROM tri),
cnt AS (SELECT id, COUNT(*) AS c FROM corners GROUP BY id)
SELECT v.id, CAST(COALESCE(cnt.c, 0) AS BIGINT) AS triangles
FROM v LEFT JOIN cnt ON cnt.id = v.id
"""


def triangle_edge_scores_sql() -> str:
    return f"""
WITH {EDGES_CTE},
{TRI_CTE},
sides AS (
  SELECT least(a, b) AS u, greatest(a, b) AS v FROM tri
  UNION ALL SELECT least(b, c), greatest(b, c) FROM tri
  UNION ALL SELECT least(a, c), greatest(a, c) FROM tri
),
cnt AS (SELECT u, v, COUNT(*) AS c FROM sides GROUP BY u, v)
SELECT e.u, e.v, CAST(COALESCE(cnt.c, 0) AS BIGINT) AS triangles
FROM und e LEFT JOIN cnt ON cnt.u = e.u AND cnt.v = e.v
"""


def local_cc_sql() -> str:
    return f"""
WITH {EDGES_CTE},
{TRI_CTE},
corners AS (SELECT a AS id FROM tri UNION ALL SELECT b FROM tri UNION ALL SELECT c FROM tri),
cnt AS (SELECT id, COUNT(*) AS c FROM corners GROUP BY id)
SELECT v.id,
       CASE WHEN COALESCE(deg.degree, 0) >= 2
            THEN ROUND(2.0 * COALESCE(cnt.c, 0) / (deg.degree * (deg.degree - 1)), 6)
            ELSE 0.0 END AS score
FROM v LEFT JOIN deg ON deg.id = v.id LEFT JOIN cnt ON cnt.id = v.id
"""


def global_cc_sql() -> str:
    return f"""
WITH {EDGES_CTE},
{TRI_CTE},
corners AS (SELECT a AS id FROM tri UNION ALL SELECT b FROM tri UNION ALL SELECT c FROM tri),
cnt AS (SELECT id, COUNT(*) AS c FROM corners GROUP BY id)
SELECT ROUND(
  (SELECT CAST(2 * COALESCE(SUM(c), 0) AS DOUBLE) FROM cnt)
  / (SELECT CAST(SUM(degree * (degree - 1)) AS DOUBLE) FROM deg), 6) AS global_cc
"""


def degree_centrality_sql() -> str:
    return f"""
WITH {EDGES_CTE},
deg AS (SELECT id, COUNT(*) AS degree FROM (
    SELECT u AS id FROM und UNION ALL SELECT v AS id FROM und
  ) GROUP BY id),
nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM v)
SELECT v.id,
       ROUND(CAST(COALESCE(deg.degree, 0) AS DOUBLE) / ((SELECT n FROM nn) - 1.0), 6) AS score
FROM v LEFT JOIN deg ON deg.id = v.id
"""


def _plp_labels_cte(iters: int = PLP_ITERS) -> str:
    """PLP unrolled as CTE parts, final labels in `plabels`."""
    parts = ["p0 AS (SELECT id, id AS label FROM v)"]
    for k in range(1, iters + 1):
        parts.append(
            f"""h{k} AS (SELECT id, label FROM (
    SELECT s.dst AS id, p.label, SUM(s.weight) AS w,
           ROW_NUMBER() OVER (PARTITION BY s.dst
                              ORDER BY SUM(s.weight) DESC, p.label ASC) AS rn
    FROM sym s JOIN p{k - 1} p ON p.id = s.src
    GROUP BY s.dst, p.label
  ) WHERE rn = 1)"""
        )
        parts.append(
            f"""p{k} AS (SELECT v.id, COALESCE(h.label, p.label) AS label
  FROM v JOIN p{k - 1} p ON p.id = v.id
  LEFT JOIN h{k} h ON h.id = v.id)"""
        )
    parts.append(f"plabels AS (SELECT id, label FROM p{iters})")
    return ",\n".join(parts)


def modularity_plp_sql() -> str:
    return f"""
WITH {EDGES_CTE},
{_plp_labels_cte()},
el AS (SELECT e.u, e.v, 1.0 AS weight, lu.label AS lu, lv.label AS lv
  FROM und e JOIN plabels lu ON lu.id = e.u JOIN plabels lv ON lv.id = e.v),
tot AS (SELECT SUM(CASE WHEN lu = lv THEN weight ELSE 0.0 END) AS intra,
               SUM(weight) AS m FROM el),
vol AS (SELECT src AS id, SUM(weight) AS vol FROM sym GROUP BY src),
volc AS (SELECT p.label, SUM(COALESCE(vol.vol, 0.0)) AS vol_c
  FROM plabels p LEFT JOIN vol ON vol.id = p.id GROUP BY p.label)
SELECT ROUND(
  (SELECT intra / m FROM tot)
  - (SELECT SUM(POW(vol_c / (2.0 * (SELECT m FROM tot)), 2)) FROM volc), 6) AS modularity
"""


def coverage_plp_sql() -> str:
    return f"""
WITH {EDGES_CTE},
{_plp_labels_cte()},
el AS (SELECT e.u, e.v, 1.0 AS weight, lu.label AS lu, lv.label AS lv
  FROM und e JOIN plabels lu ON lu.id = e.u JOIN plabels lv ON lv.id = e.v)
SELECT ROUND(
  SUM(CASE WHEN lu = lv THEN weight ELSE 0.0 END) / SUM(weight), 6) AS coverage
FROM el
"""


def subgraph_stats_sql(max_id: int = 300) -> str:
    return f"""
WITH {EDGES_CTE}
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM v WHERE id < {max_id}) AS n_nodes,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM und
        WHERE u < {max_id} AND v < {max_id}) AS n_edges
"""


def compact_ids_sql() -> str:
    return f"""
WITH {EDGES_CTE}
SELECT id, CAST(ROW_NUMBER() OVER (ORDER BY id) - 1 AS BIGINT) AS compact_id FROM v
"""


# ----------------------------------------------------------- documents SQL
_SH3 = """
docs3 AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents
          WHERE len(string_split(text, ' ')) >= 3),
sh AS (SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS ngram
       FROM docs3, UNNEST(generate_series(1, len(w) - 2)) AS t(i))
""".strip()


def _seeds_values(n: int) -> str:
    return ", ".join(f"({i})" for i in range(n))


def _sigs_cte(seeds: int = MINHASH_SEEDS) -> str:
    return f"""
{_SH3},
seeds AS (SELECT * FROM (VALUES {_seeds_values(seeds)}) s(seed)),
sigs AS (SELECT doc_id, seed,
         MIN(md5('s' || CAST(seed AS VARCHAR) || '|' || ngram)) AS minhash
         FROM sh CROSS JOIN seeds GROUP BY doc_id, seed)
""".strip()


def dedup_exact_sql() -> str:
    return """
SELECT md5(text) AS text_hash,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       MIN(doc_id) AS min_doc_id
FROM documents GROUP BY md5(text)
"""


def minhash_sql(seeds: int = MINHASH_SEEDS) -> str:
    return f"""
WITH {_sigs_cte(seeds)}
SELECT doc_id, CAST(seed AS INT) AS seed, minhash FROM sigs
"""


def _buckets_cte(seeds: int = MINHASH_SEEDS, rows: int = LSH_ROWS_PER_BAND) -> str:
    return f"""
{_sigs_cte(seeds)},
buckets AS (SELECT doc_id, CAST(seed // {rows} AS INT) AS band,
    md5(string_agg(CAST(seed AS VARCHAR) || ':' || minhash, ','
        ORDER BY CAST(seed AS VARCHAR) || ':' || minhash)) AS bucket
  FROM sigs GROUP BY doc_id, CAST(seed // {rows} AS INT))
""".strip()


def lsh_pairs_sql() -> str:
    return f"""
WITH {_buckets_cte()}
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM buckets a JOIN buckets b
  ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
"""


def near_dup_jaccard_sql(threshold: float = 0.5) -> str:
    return f"""
WITH {_buckets_cte()},
cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM buckets a JOIN buckets b
    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id),
szs AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
inter AS (SELECT c.doc_a, c.doc_b, COUNT(*) AS i
  FROM cand c
  JOIN sh a ON a.doc_id = c.doc_a
  JOIN sh b ON b.doc_id = c.doc_b AND b.ngram = a.ngram
  GROUP BY c.doc_a, c.doc_b)
SELECT doc_a, doc_b, jaccard FROM (
  SELECT c.doc_a, c.doc_b,
         ROUND(COALESCE(i.i, 0) / (sa.sz + sb.sz - COALESCE(i.i, 0)), 6) AS jaccard
  FROM cand c
  LEFT JOIN inter i ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b
  JOIN szs sa ON sa.doc_id = c.doc_a
  JOIN szs sb ON sb.doc_id = c.doc_b
) WHERE jaccard >= {threshold}
"""


def _simhash_cte(dims: int = 16) -> str:
    """CTE chain ending in sh(doc_id, simhash) — shared by simhash_sql
    and simhash_near_dups_sql."""
    return f"""toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
hs AS (SELECT doc_id, md5(tok) AS h FROM toks),
dims AS (SELECT * FROM (VALUES {_seeds_values(dims)}) d(dim)),
bits AS (SELECT doc_id, dim,
    CASE WHEN SUM(strpos('0123456789abcdef', substr(h, dim + 1, 1)) - 1 - 7.5) > 0
         THEN '1' ELSE '0' END AS bit
  FROM hs CROSS JOIN dims GROUP BY doc_id, dim),
sh AS (SELECT doc_id, string_agg(bit, '' ORDER BY dim) AS simhash FROM bits GROUP BY doc_id)""".strip()


def simhash_sql(dims: int = 16) -> str:
    return f"""
WITH {_simhash_cte(dims)}
SELECT doc_id, simhash FROM sh
"""


def simhash_near_dups_sql(dims: int = 16, max_hamming: int = 3) -> str:
    """All-pairs exact Hamming filter — the oracle twin of the engine's
    banded-blocking + XOR/popcount verify (operators/dedup.py::
    simhash_near_duplicates). Banding with max_hamming < n_bands is
    lossless (pigeonhole), so the bucket-joined result must equal this
    quadratic reference exactly; the oracle runs at sf scale where n² is
    trivial for DuckDB."""
    ham = " + ".join(
        f"CASE WHEN substr(a.simhash, {i + 1}, 1) <> substr(b.simhash, {i + 1}, 1) THEN 1 ELSE 0 END"
        for i in range(dims)
    )
    return f"""
WITH {_simhash_cte(dims)},
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, ({ham}) AS hamming
  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, CAST(hamming AS BIGINT) AS hamming
FROM pairs WHERE hamming <= {max_hamming}
"""


def token_stats_sql() -> str:
    return """
SELECT doc_id,
       CAST(len(w) AS BIGINT) AS n_tokens,
       CAST(len(list_distinct(w)) AS BIGINT) AS n_distinct_tokens,
       CAST(length(text) AS BIGINT) AS n_chars,
       CAST(ceil(length(text) / 4.0) AS BIGINT) AS bpe_est
FROM (SELECT doc_id, text, string_split(text, ' ') AS w FROM documents)
"""


def _swlist() -> str:
    return "[" + ", ".join(f"'{s}'" for s in STOPWORDS) + "]"


def quality_sql() -> str:
    return f"""
WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
base AS (SELECT doc_id,
    len(w) AS n_tokens,
    list_sum(list_transform(w, x -> CAST(length(x) AS DOUBLE))) / len(w) AS mean_len,
    len(list_filter(w, x -> list_contains({_swlist()}, x))) / len(w) AS sw_ratio,
    len(list_distinct(w)) / len(w) AS tt_ratio
  FROM d)
SELECT doc_id,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       ROUND(mean_len, 6) AS mean_token_len,
       ROUND(sw_ratio, 6) AS stopword_ratio,
       ROUND(tt_ratio, 6) AS type_token_ratio,
       ROUND(least(n_tokens / 100.0, 1.0) * 0.4 + sw_ratio * 0.3 + tt_ratio * 0.3, 6) AS quality
FROM base
"""


def lang_id_sql() -> str:
    votes = []
    for lang, markers in sorted(LANG_MARKERS.items()):
        mlist = "[" + ", ".join(f"'{m}'" for m in markers) + "]"
        votes.append(
            f"""SELECT doc_id, '{lang}' AS lang,
  len(list_filter(w, x -> list_contains({mlist}, x))) AS votes FROM d"""
        )
    union = "\n  UNION ALL\n  ".join(votes)
    return f"""
WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
votes AS (
  {union}
)
SELECT doc_id, lang AS pred_lang FROM (
  SELECT doc_id, lang,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY votes DESC, lang ASC) AS rn
  FROM votes
) WHERE rn = 1
"""


def fingerprint_sql(n: int = 5) -> str:
    idx = " || ' ' || ".join(f"w[i+{k}]" for k in range(n))
    return f"""
WITH docs5 AS (SELECT doc_id, text, string_split(text, ' ') AS w FROM documents),
sh5 AS (SELECT doc_id, {idx} AS ngram
        FROM docs5, UNNEST(generate_series(1, len(w) - {n - 1})) AS t(i)
        WHERE len(w) >= {n}),
long_fp AS (SELECT doc_id, MIN(md5(ngram)) AS fingerprint FROM sh5 GROUP BY doc_id),
short_fp AS (SELECT doc_id, md5(text) AS fingerprint FROM docs5 WHERE len(w) < {n})
SELECT * FROM long_fp UNION ALL SELECT * FROM short_fp
"""


# ---------------------------------------------------------- embeddings SQL
def knn_sql(k: int = 5, max_query_id: int = 10) -> str:
    return f"""
WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vv
           FROM embeddings),
n AS (SELECT vec_id, vv, sqrt(list_dot_product(vv, vv)) AS nrm FROM e),
sims AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
    list_dot_product(q.vv, c.vv) / (q.nrm * c.nrm) AS sim
  FROM n q, n c
  WHERE q.vec_id < {max_query_id} AND c.vec_id <> q.vec_id)
SELECT query_id, neighbor_id, ROUND(sim, 4) AS sim FROM (
  SELECT query_id, neighbor_id, sim,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY sim DESC, neighbor_id ASC) AS rn
  FROM sims
) WHERE rn <= {k}
"""


def _bucket_expr(n_planes: int = 8, dims: int = 64) -> str:
    planes = hyperplane_weights(n_planes, dims)
    return " || ".join(
        "(CASE WHEN list_dot_product(vv, ["
        + ", ".join(f"{w:.1f}" for w in plane)
        + "]) > 0 THEN '1' ELSE '0' END)"
        for plane in planes
    )


def ann_buckets_sql(n_planes: int = 8, dims: int = 64) -> str:
    return f"""
WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vv
           FROM embeddings)
SELECT vec_id, {_bucket_expr(n_planes, dims)} AS bucket FROM e
"""


def ann_topk_sql(k: int = 5, n_planes: int = 8, dims: int = 64) -> str:
    """Bucketed ANN: exact cosine within each hyperplane-LSH bucket."""
    return f"""
WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vv
           FROM embeddings),
b AS (SELECT vec_id, vv, sqrt(list_dot_product(vv, vv)) AS nrm,
             {_bucket_expr(n_planes, dims)} AS bucket FROM e),
sims AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
    list_dot_product(q.vv, c.vv) / (q.nrm * c.nrm) AS sim
  FROM b q JOIN b c ON q.bucket = c.bucket AND q.vec_id <> c.vec_id)
SELECT query_id, neighbor_id, ROUND(sim, 4) AS sim FROM (
  SELECT query_id, neighbor_id, sim,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY sim DESC, neighbor_id ASC) AS rn
  FROM sims
) WHERE rn <= {k}
"""


def embedding_near_dup_sql(threshold: float = 0.98, n_planes: int = 8,
                           dims: int = 64) -> str:
    return f"""
WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vv
           FROM embeddings),
b AS (SELECT vec_id, vv, sqrt(list_dot_product(vv, vv)) AS nrm,
             {_bucket_expr(n_planes, dims)} AS bucket FROM e)
SELECT vec_a, vec_b, sim FROM (
  SELECT a.vec_id AS vec_a, c.vec_id AS vec_b,
         ROUND(list_dot_product(a.vv, c.vv) / (a.nrm * c.nrm), 4) AS sim
  FROM b a JOIN b c ON a.bucket = c.bucket AND a.vec_id < c.vec_id
) WHERE sim >= {threshold}
"""


# -------------------------------------------------------------- events SQL
def events_hourly_sql() -> str:
    return """
SELECT date_trunc('hour', ts) AS hour_start,
       event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       ROUND(SUM(value), 3) AS total_value
FROM events GROUP BY 1, 2
"""


# ------------------------------------------------------------ distance SQL
BFS_MAX_DEPTH = 12  # ≥ the derived graph's diameter at every test SF


def _dists_cte(max_depth: int = BFS_MAX_DEPTH) -> str:
    """All-pairs hop distances over sym: UNROLLED level-synchronous BFS
    (frontier ⋈ sym, EXCEPT visited — the exact twin of
    multi_source_bfs's plan). NOT a recursive walk CTE: on dense graphs
    a walk re-expands every reachable pair at every depth (≈|pairs|·deg
    rows per level for all max_depth levels); the per-level EXCEPT
    prunes to first-reach rows, so levels past the diameter are empty
    and free. CTEs are MATERIALIZED — each level is referenced by the
    next level, the visited union, and the final result."""
    return _dists_cte_filtered("TRUE", max_depth)


def _dists_cte_filtered(
    src_filter: str,
    max_depth: int = BFS_MAX_DEPTH,
    arcs: str = "sym",
    verts: str = "v",
) -> str:
    """_dists_cte with the BFS source set restricted by `src_filter`
    (SQL predicate over {verts}.id) — the sampled-source twin; `arcs` /
    `verts` override the graph tables (subgraph oracles)."""
    parts = [
        f"f0 AS MATERIALIZED (SELECT id AS s, id AS id FROM {verts} WHERE {src_filter})",
        "vis0 AS MATERIALIZED (SELECT s, id FROM f0)",
    ]
    for k in range(1, max_depth + 1):
        parts.append(
            f"""f{k} AS MATERIALIZED (
  SELECT DISTINCT f.s, e.dst AS id FROM f{k - 1} f JOIN {arcs} e ON f.id = e.src
  EXCEPT SELECT s, id FROM vis{k - 1})"""
        )
        parts.append(
            f"vis{k} AS MATERIALIZED (SELECT s, id FROM vis{k - 1} UNION ALL SELECT s, id FROM f{k})"
        )
    levels = "\nUNION ALL\n".join(
        f"SELECT s, id, CAST({k} AS BIGINT) AS dist FROM f{k}"
        for k in range(0, max_depth + 1)
    )
    parts.append(f"dists AS MATERIALIZED ({levels})")
    return ",\n".join(parts)


def bfs_hops_sql() -> str:
    """Single-source BFS from the smallest vertex id."""
    return f"""
WITH {EDGES_CTE},
{_dists_cte()}
SELECT id, dist FROM dists WHERE s = (SELECT MIN(id) FROM v)
"""


def closeness_sql() -> str:
    """Standard closeness 1/Σd (Closeness.hpp:84-100; derived graph is
    connected at every test SF — verified before registering)."""
    return f"""
WITH {EDGES_CTE},
{_dists_cte()}
SELECT s AS id, ROUND(1.0 / SUM(dist), 9) AS score FROM dists GROUP BY s
"""


def harmonic_sql() -> str:
    return f"""
WITH {EDGES_CTE},
{_dists_cte()}
SELECT s AS id,
       ROUND(SUM(CASE WHEN dist > 0 THEN 1.0 / dist ELSE 0.0 END), 9) AS score
FROM dists GROUP BY s
"""


def eccentricity_sql() -> str:
    return f"""
WITH {EDGES_CTE},
{_dists_cte()}
SELECT s AS id, CAST(MAX(dist) AS BIGINT) AS ecc FROM dists GROUP BY s
"""


def effective_diameter_sql(ratio: float = 0.9) -> str:
    """EffectiveDiameter.cpp:28-92: h_s = max(1, threshold-th smallest
    distance from s); result = mean h_s."""
    return f"""
WITH {EDGES_CTE},
{_dists_cte()},
th AS (SELECT CAST(CEIL({ratio} * COUNT(*)) AS BIGINT) AS t FROM v),
ranked AS (SELECT s, dist, ROW_NUMBER() OVER (PARTITION BY s ORDER BY dist) AS rk
           FROM dists),
h AS (SELECT s, GREATEST(dist, 1) AS h FROM ranked WHERE rk = (SELECT t FROM th))
SELECT ROUND(AVG(h), 6) AS effective_diameter FROM h
"""


# ---------------------------------------------------------- coarsening SQL
def coarsen_cc_sql(iters: int = CC_ITERS) -> str:
    """Coarse graph contracted by the hash-min CC labels: coarse ids are
    dense ranks of labels ascending; inter-part weights keep both arc
    directions, the intra self-loop counts each fine edge once
    (ParallelPartitionCoarsening.cpp:43 `sv != su || u >= v`)."""
    cc = cc_sql(iters).strip()
    return _materialize(f"""
WITH labels AS ({cc}),
dict AS (SELECT label, ROW_NUMBER() OVER (ORDER BY label) - 1 AS coarse_id
         FROM (SELECT DISTINCT label FROM labels)),
mapping AS (SELECT l.id, d.coarse_id FROM labels l JOIN dict d ON d.label = l.label),
ed AS (
  SELECT DISTINCT least(l_orderkey % {_M}, l_partkey % {_M}) AS u,
                  greatest(l_orderkey % {_M}, l_partkey % {_M}) AS v
  FROM lineitem
  WHERE (l_orderkey % {_M}) <> (l_partkey % {_M})
),
arcs AS (
  SELECT u AS src, v AS dst, 1.0 AS weight FROM ed
  UNION ALL
  SELECT v AS src, u AS dst, 1.0 AS weight FROM ed
),
labeled AS (
  SELECT mu.coarse_id AS cu, mv.coarse_id AS cv, a.weight, a.src, a.dst
  FROM arcs a
  JOIN mapping mu ON mu.id = a.src
  JOIN mapping mv ON mv.id = a.dst
)
SELECT cu AS src, cv AS dst, SUM(weight) AS weight
FROM labeled WHERE cu <> cv GROUP BY cu, cv
UNION ALL
SELECT cu AS src, cu AS dst,
       SUM(CASE WHEN src = dst THEN weight ELSE weight / 2.0 END) AS weight
FROM labeled WHERE cu = cv GROUP BY cu
""")


# --------------------------------------------------------- betweenness SQL
def _materialize(sql: str) -> str:
    """Force CTE materialization: the unrolled σ/δ chains reference each
    level several times; inlined they re-evaluate the whole prefix
    (minutes), materialized the query runs in seconds."""
    import re

    return re.sub(r"AS \(", "AS MATERIALIZED (", sql)


def _betweenness_body(levels: int, sources_where: str, weighted: bool) -> str:
    """Unrolled Brandes over `dists`: forward σ per BFS level, backward δ
    per level (shortest-path DAG arcs only connect consecutive hop
    levels), exactly the plan operators/betweenness.py runs."""
    parts = [
        f"src AS (SELECT id FROM v {sources_where})",
        "sd AS (SELECT d.* FROM dists d JOIN src ON src.id = d.s)",
        "sig0 AS (SELECT s, id, 1.0 AS sigma FROM sd WHERE dist = 0)",
    ]
    for k in range(1, levels + 1):
        parts.append(
            f"""sig{k} AS (
  SELECT d.s, d.id, SUM(p.sigma) AS sigma
  FROM sd d JOIN sym e ON e.dst = d.id
  JOIN sig{k - 1} p ON p.s = d.s AND p.id = e.src
  WHERE d.dist = {k} GROUP BY d.s, d.id)"""
        )
    # backward: delta at the deepest level is 0; each shallower level
    # aggregates (σp/σt)·(1+δt) [· (dist_p/dist_t) for the estimator]
    # over the DAG arcs p→t — inner joins through sym, then a LEFT JOIN
    # of the aggregated contributions (DuckDB cannot outer-join on a
    # correlated subquery)
    parts.append(
        f"d{levels} AS (SELECT s, id, 0.0 AS delta FROM sd WHERE dist = {levels})"
    )
    for k in range(levels - 1, 0, -1):
        factor = f"(CAST({k} AS DOUBLE) / {k + 1}) * " if weighted else ""
        parts.append(
            f"""c{k} AS (
  SELECT p.s, p.id, SUM({factor}(p.sigma / ts.sigma) * (1.0 + td.delta)) AS delta
  FROM sig{k} p
  JOIN sym e ON e.src = p.id
  JOIN d{k + 1} td ON td.s = p.s AND td.id = e.dst
  JOIN sig{k + 1} ts ON ts.s = td.s AND ts.id = td.id
  GROUP BY p.s, p.id)"""
        )
        parts.append(
            f"""d{k} AS (
  SELECT p.s, p.id, COALESCE(c.delta, 0.0) AS delta
  FROM sig{k} p LEFT JOIN c{k} c ON c.s = p.s AND c.id = p.id)"""
        )
    deltas = "\nUNION ALL\n".join(
        f"SELECT s, id, delta FROM d{k}" for k in range(1, levels + 1)
    )
    parts.append(f"alldelta AS ({deltas})")
    return ",\n".join(parts)


def betweenness_sql(levels: int = BFS_MAX_DEPTH, normalized: bool = False) -> str:
    """Exact Brandes (Betweenness.cpp:23-101): score(t) = Σ_s δ_s(t)."""
    body = _betweenness_body(levels, "", weighted=False)
    norm = "/ ((SELECT COUNT(*) FROM v) - 1.0) / ((SELECT COUNT(*) FROM v) - 2.0)" if normalized else ""
    return _materialize(f"""
WITH {EDGES_CTE},
{_dists_cte()},
{body}
SELECT v.id, ROUND(COALESCE(sc.score, 0.0){norm}, 6) AS score
FROM v LEFT JOIN (SELECT id, SUM(delta) AS score FROM alldelta GROUP BY id) sc
  ON sc.id = v.id
""")


def estimate_betweenness_sql(
    max_source_id: int = 20, n_samples: int = 19, levels: int = BFS_MAX_DEPTH
) -> str:
    """EstimateBetweenness.cpp:60-115 with an explicit deterministic
    source set (id < max_source_id picks n_samples+1 sources on the
    derived graph): linear-scaling (dist_p/dist_t) factor, extrapolation
    ×(2n/nSamples)."""
    body = _betweenness_body(
        levels, f"WHERE id < {max_source_id}", weighted=True
    )
    return _materialize(f"""
WITH {EDGES_CTE},
{_dists_cte()},
{body}
SELECT v.id,
       ROUND(COALESCE(sc.score, 0.0) * 2.0 * (SELECT COUNT(*) FROM v) / {n_samples}.0, 6) AS score
FROM v LEFT JOIN (SELECT id, SUM(delta) AS score FROM alldelta GROUP BY id) sc
  ON sc.id = v.id
""")


# --------------------------------------------------------- correlation SQL
def degree_assortativity_sql() -> str:
    """Pearson r over (deg_u, deg_v) pairs of the canonical und edges
    (Assortativity.cpp:72-100 continuous variant)."""
    return f"""
WITH {EDGES_CTE},
deg AS (SELECT id, CAST(COUNT(*) AS DOUBLE) AS d FROM (
    SELECT u AS id FROM und UNION ALL SELECT v AS id FROM und
  ) GROUP BY id),
el AS (SELECT du.d AS x, dv.d AS y FROM und e
       JOIN deg du ON du.id = e.u JOIN deg dv ON dv.id = e.v),
mm AS (SELECT AVG(x) AS xm, AVG(y) AS ym FROM el)
SELECT ROUND(
    SUM((x - (SELECT xm FROM mm)) * (y - (SELECT ym FROM mm)))
    / SQRT(SUM(POW(x - (SELECT xm FROM mm), 2))
           * SUM(POW(y - (SELECT ym FROM mm), 2))), 6) AS r
FROM el
"""


def nominal_assortativity_sql(modulus: int = 7) -> str:
    """Mixing-matrix assortativity with labels id % modulus, reproducing
    the reference's normalization (mirrored inter-type counts over m —
    Assortativity.cpp:44-57)."""
    return f"""
WITH {EDGES_CTE},
el AS (SELECT (e.u % {modulus}) AS lu, (e.v % {modulus}) AS lv FROM und e),
mcount AS (SELECT CAST(COUNT(*) AS DOUBLE) AS m FROM el),
cells AS (
  SELECT lu, lv, SUM(cnt) AS cnt FROM (
    SELECT lu, lv, CAST(COUNT(*) AS DOUBLE) AS cnt FROM el GROUP BY lu, lv
    UNION ALL
    SELECT lv AS lu, lu AS lv, CAST(COUNT(*) AS DOUBLE) AS cnt FROM el
    WHERE lu <> lv GROUP BY lu, lv
  ) GROUP BY lu, lv),
e AS (SELECT lu, lv, cnt / (SELECT m FROM mcount) AS e FROM cells),
diag AS (SELECT COALESCE(SUM(e), 0.0) AS d FROM e WHERE lu = lv),
a AS (SELECT lu, SUM(e) AS a FROM e GROUP BY lu),
b AS (SELECT lv, SUM(e) AS b FROM e GROUP BY lv),
ab AS (SELECT COALESCE(SUM(a.a * b.b), 0.0) AS ab FROM a JOIN b ON a.lu = b.lv)
SELECT ROUND(((SELECT d FROM diag) - (SELECT ab FROM ab))
             / (1.0 - (SELECT ab FROM ab)), 6) AS r
"""


def adamic_adar_sql() -> str:
    """Per-edge Adamic–Adar score via triangle enumeration: each
    triangle contributes the opposite corner's 1/ln(degree)
    (AdamicAdarDistance.cpp:16-52)."""
    return f"""
WITH {EDGES_CTE},
{TRI_CTE},
aa AS (
  SELECT least(a, b) AS u, greatest(a, b) AS v, 1.0 / ln(dc.degree) AS w
  FROM tri JOIN deg dc ON dc.id = tri.c
  UNION ALL
  SELECT least(a, c), greatest(a, c), 1.0 / ln(db.degree)
  FROM tri JOIN deg db ON db.id = tri.b
  UNION ALL
  SELECT least(b, c), greatest(b, c), 1.0 / ln(da.degree)
  FROM tri JOIN deg da ON da.id = tri.a
),
s AS (SELECT u, v, SUM(w) AS score FROM aa GROUP BY u, v)
SELECT e.u, e.v, ROUND(COALESCE(s.score, 0.0), 6) AS score
FROM und e LEFT JOIN s ON s.u = e.u AND s.v = e.v
"""


def approx_closeness_sql(modulus: int = 37) -> str:
    """Sampled-source closeness estimate (ApproxCloseness.cpp:29-60
    semantics, Eppstein–Wang estimator) with the SQL-replicable sample
    s ≡ 0 (mod modulus): score(v) = 1/((n/k)·Σ_{s∈S} d(s,v)), 0 when no
    sample reaches v."""
    return f"""
WITH {EDGES_CTE},
{_dists_cte_filtered(f"id % {modulus} = 0")},
nk AS (SELECT (SELECT COUNT(*) FROM v) AS n,
              (SELECT COUNT(*) FROM v WHERE id % {modulus} = 0) AS k),
sums AS (SELECT id, SUM(dist) AS sum_d FROM dists GROUP BY id)
SELECT v.id,
       ROUND(COALESCE(
         CASE WHEN s.sum_d > 0
              THEN 1.0 / ((CAST(nk.n AS DOUBLE) / nk.k) * s.sum_d)
              ELSE 0.0 END, 0.0), 9) AS score
FROM v LEFT JOIN sums s ON v.id = s.id CROSS JOIN nk
"""


def spsp_sql(modulus: int = 37) -> str:
    """Subset-pairs hop distances (SPSP.cpp contract, unreached pairs
    absent) from sources id ≡ 0 (mod modulus) — the unrolled BFS twin of
    operators/apsp.spsp's batched multi-source BFS."""
    return f"""
WITH {EDGES_CTE},
{_dists_cte_filtered(f"id % {modulus} = 0")}
SELECT s, id, dist FROM dists
"""


def _bellman_ford_cte(
    src_filter: str,
    rounds: int,
    weight_expr: str = "CAST(1.0 + ((u + v) % 2) AS DOUBLE)",
) -> str:
    """Unrolled multi-source Bellman-Ford over und with the deterministic
    per-edge weight `weight_expr` (a function of the canonical pair, so
    both directions agree): d_k(s, v) = min(d_{k-1}(s, v),
    min over arcs (u, v) of d_{k-1}(s, u) + w). Exact once `rounds` ≥
    the max hop count of any min-weight path — with weights in {{1, 2}}
    that is ≤ 2·diameter ≤ 2·BFS_MAX_DEPTH. Final table: bf."""
    parts = [
        f"""warcs AS MATERIALIZED (
  SELECT u AS src, v AS dst, {weight_expr} AS w FROM und
  UNION ALL SELECT v, u, {weight_expr} FROM und)""",
        f"d0 AS MATERIALIZED (SELECT id AS s, id AS id, CAST(0.0 AS DOUBLE) AS dist FROM v WHERE {src_filter})",
    ]
    for k in range(1, rounds + 1):
        parts.append(
            f"""d{k} AS MATERIALIZED (
  SELECT s, id, MIN(dist) AS dist FROM (
    SELECT s, id, dist FROM d{k - 1}
    UNION ALL
    SELECT d.s, a.dst AS id, d.dist + a.w AS dist
    FROM d{k - 1} d JOIN warcs a ON d.id = a.src
  ) GROUP BY s, id)"""
        )
    parts.append(f"bf AS MATERIALIZED (SELECT s, id, dist FROM d{rounds})")
    return ",\n".join(parts)


def spsp_weighted_sql(modulus: int = 97, rounds: int = 2 * BFS_MAX_DEPTH + 2) -> str:
    """Weighted subset-pairs distances (Dijkstra-parity fixed point) on
    the deterministically-weighted link graph — exact Bellman-Ford
    unroll twin of operators/apsp.multi_source_bellman_ford."""
    return f"""
WITH {EDGES_CTE},
{_bellman_ford_cte(f"id % {modulus} = 0", rounds)}
SELECT s, id, ROUND(dist, 9) AS dist FROM bf
"""


def volume_sql(modulus: int = 41, rmax: int = 3) -> str:
    """Volume.cpp over the hash sample: mean ball size at each radius
    (self included — nodesWithinDistance inserts the start at 0)."""
    return f"""
WITH {EDGES_CTE},
{_dists_cte_filtered(f"id % {modulus} = 0", rmax)},
k AS (SELECT COUNT(*) AS k FROM v WHERE id % {modulus} = 0),
rs AS (SELECT CAST(i + 1 AS DOUBLE) AS r FROM range({rmax}) AS t(i))
SELECT rs.r,
       ROUND((SELECT COUNT(*) FROM dists d WHERE d.dist <= rs.r)
             / (SELECT CAST(k AS DOUBLE) FROM k), 9) AS volume
FROM rs
"""


def nf_heuristic_sql(modulus: int = 37) -> str:
    """NeighborhoodFunctionHeuristic.cpp:42-100 with the hash sample:
    result[0] = 2m, result[dia-1] = n(n-1), cumulative
    floor(count·n/k + 0.5) between."""
    return f"""
WITH {EDGES_CTE},
{_dists_cte()},
nm AS (SELECT (SELECT COUNT(*) FROM v) AS n, (SELECT COUNT(*) FROM und) AS m),
dia AS (SELECT MAX(dist) AS d FROM dists),
k AS (SELECT COUNT(*) AS k FROM v WHERE id % {modulus} = 0),
hist AS (SELECT dist, COUNT(*) AS c FROM dists
         WHERE s % {modulus} = 0 AND dist > 0 GROUP BY dist),
hs AS (SELECT DISTINCT dist AS h FROM dists
       WHERE dist >= 2 AND dist < (SELECT d FROM dia)),
mid AS (SELECT h.h,
          (SELECT 2 * m FROM nm)
          + SUM(CAST(FLOOR(COALESCE(c, 0)
                * ((SELECT CAST(n AS DOUBLE) FROM nm) / (SELECT k FROM k))
                + 0.5) AS BIGINT))
            OVER (ORDER BY h.h ROWS UNBOUNDED PRECEDING) AS nf
        FROM hs h LEFT JOIN hist ON hist.dist = h.h)
SELECT CAST(1 AS BIGINT) AS h, (SELECT 2 * m FROM nm) AS nf
UNION ALL
SELECT h, nf FROM mid
UNION ALL
SELECT (SELECT d FROM dia), (SELECT n * (n - 1) FROM nm)
"""


def quadrangle_sql() -> str:
    """ChibaNishizekiQuadrangleEdgeScore relational identity (see
    operators/edgescores.py): score(u,v) = Σ_{w∈N(v)\\{u}}
    (|N(u)∩N(w)| − 1)."""
    return f"""
WITH {EDGES_CTE},
cn AS MATERIALIZED (
  SELECT x.src AS a, y.dst AS b, COUNT(*) AS c
  FROM sym x JOIN sym y ON x.dst = y.src
  WHERE x.src <> y.dst GROUP BY x.src, y.dst),
q AS (
  SELECT e.u, e.v, SUM(cn.c - 1) AS score
  FROM und e
  JOIN sym s ON s.src = e.v AND s.dst <> e.u
  JOIN cn ON cn.a = e.u AND cn.b = s.dst
  GROUP BY e.u, e.v)
SELECT e.u, e.v, CAST(COALESCE(q.score, 0) AS BIGINT) AS score
FROM und e LEFT JOIN q ON q.u = e.u AND q.v = e.v
"""


def prefix_jaccard_sql(modulus: int = 5) -> str:
    """PrefixJaccardScore.cpp rank-walk replay: competition ranks per
    endpoint over the full incidence list, per-edge event stream
    (u-add at ru, v-add at rv, common at max), cumulative counts,
    best Jaccard over rank prefixes."""
    return f"""
WITH {EDGES_CTE},
attr AS (SELECT u, v, CAST((u + v) % {modulus} AS DOUBLE) AS attr FROM und),
incs AS (SELECT u AS a, v AS w, attr FROM attr
         UNION ALL SELECT v, u, attr FROM attr),
ranked AS (SELECT a, w,
             RANK() OVER (PARTITION BY a ORDER BY attr DESC) - 1 AS r
           FROM incs),
us AS (SELECT e.u, e.v, rk.w, rk.r AS ru
       FROM und e JOIN ranked rk ON rk.a = e.u AND rk.w <> e.v),
vs AS (SELECT e.u, e.v, rk.w, rk.r AS rv
       FROM und e JOIN ranked rk ON rk.a = e.v AND rk.w <> e.u),
bth AS (SELECT COALESCE(us.u, vs.u) AS u, COALESCE(us.v, vs.v) AS v,
               COALESCE(us.w, vs.w) AS w, us.ru, vs.rv
        FROM us FULL JOIN vs ON us.u = vs.u AND us.v = vs.v AND us.w = vs.w),
events AS (
  SELECT u, v, ru AS r, 1 AS du, 0 AS dv, 0 AS dc FROM bth WHERE ru IS NOT NULL
  UNION ALL
  SELECT u, v, rv, 0, 1, 0 FROM bth WHERE rv IS NOT NULL
  UNION ALL
  SELECT u, v, GREATEST(ru, rv), 0, 0, 1 FROM bth
  WHERE ru IS NOT NULL AND rv IS NOT NULL),
per_rank AS (SELECT u, v, r, SUM(du) AS du, SUM(dv) AS dv, SUM(dc) AS dc
             FROM events GROUP BY u, v, r),
cum AS (SELECT u, v,
          SUM(dc) OVER wuv AS c,
          SUM(du) OVER wuv - SUM(dc) OVER wuv AS uo,
          SUM(dv) OVER wuv - SUM(dc) OVER wuv AS vo
        FROM per_rank
        WINDOW wuv AS (PARTITION BY u, v ORDER BY r
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
best AS (SELECT u, v,
           MAX(CASE WHEN c + uo + vo > 0
                    THEN CAST(c AS DOUBLE) / (c + uo + vo) ELSE 0.0 END) AS score
         FROM cum GROUP BY u, v)
SELECT e.u, e.v, ROUND(COALESCE(b.score, 0.0), 9) AS score
FROM und e LEFT JOIN best b ON b.u = e.u AND b.v = e.v
"""


def geometric_mean_sql(modulus: int = 5) -> str:
    """GeometricMeanScore.cpp: attr/sqrt(S(u)·S(v)), 0 when attr ≤ 0."""
    return f"""
WITH {EDGES_CTE},
attr AS (SELECT u, v, CAST((u + v) % {modulus} AS DOUBLE) AS attr FROM und),
sums AS (SELECT a, SUM(attr) AS s FROM (
    SELECT u AS a, attr FROM attr UNION ALL SELECT v, attr FROM attr
  ) GROUP BY a)
SELECT t.u, t.v,
       ROUND(CASE WHEN t.attr > 0
                  THEN t.attr / SQRT(su.s * sv.s) ELSE 0.0 END, 9) AS score
FROM attr t JOIN sums su ON su.a = t.u JOIN sums sv ON sv.a = t.v
"""


def dynbfs_sql(max_depth: int = BFS_MAX_DEPTH + 4) -> str:
    """Exact twin of queries.q_dynbfs_state: the DynBFS updateBatch
    contract is that the repaired state equals a FRESH run on the
    edited graph, so the oracle ignores the dynamics entirely — it
    edits the edge table in SQL (drop (u*13+v*7)%11==0 edges, add the
    two deterministic pairs) and runs a single-source BFS with
    per-level shortest-path counts (HUGEINT — exact, matching the
    engine's DECIMAL(38,0) bigfloat substitution)."""
    parts = [
        """rmx AS (SELECT u, v FROM und WHERE (u * 13 + v * 7) % 11 = 0),
addp AS (
  SELECT LEAST((SELECT MIN(id) FROM v), (SELECT MAX(id) FROM v)) AS u,
         GREATEST((SELECT MIN(id) FROM v), (SELECT MAX(id) FROM v)) AS v
  UNION ALL
  SELECT LEAST((SELECT MIN(id) FROM v WHERE id >= 200),
               (SELECT MAX(id) FROM v WHERE id <= 400)) AS u,
         GREATEST((SELECT MIN(id) FROM v WHERE id >= 200),
                  (SELECT MAX(id) FROM v WHERE id <= 400)) AS v),
und2 AS MATERIALIZED (
  SELECT DISTINCT u, v FROM (
    SELECT u, v FROM und WHERE (u * 13 + v * 7) % 11 <> 0
    UNION ALL SELECT u, v FROM addp) WHERE u <> v),
sym2 AS MATERIALIZED (
  SELECT u AS src, v AS dst FROM und2 UNION ALL SELECT v, u FROM und2),
f0 AS MATERIALIZED (SELECT (SELECT MIN(id) FROM v) AS id),
vis0 AS MATERIALIZED (SELECT id FROM f0),
np0 AS MATERIALIZED (SELECT id, CAST(1 AS HUGEINT) AS np FROM f0)"""
    ]
    for k in range(1, max_depth + 1):
        parts.append(
            f"""f{k} AS MATERIALIZED (
  SELECT DISTINCT e.dst AS id FROM f{k - 1} f JOIN sym2 e ON f.id = e.src
  EXCEPT SELECT id FROM vis{k - 1}),
vis{k} AS MATERIALIZED (SELECT id FROM vis{k - 1} UNION ALL SELECT id FROM f{k}),
np{k} AS MATERIALIZED (
  SELECT e.dst AS id, SUM(p.np) AS np
  FROM f{k - 1} f JOIN sym2 e ON f.id = e.src
  JOIN np{k - 1} p ON p.id = f.id
  JOIN f{k} t ON t.id = e.dst
  GROUP BY e.dst)"""
        )
    levels = "\nUNION ALL\n".join(
        f"SELECT id, CAST({k} AS BIGINT) AS dist, np AS npaths FROM np{k}"
        for k in range(0, max_depth + 1)
    )
    joined = ",\n".join(parts)
    return f"""
WITH {EDGES_CTE},
{joined}
SELECT id, dist, npaths FROM ({levels})
"""


def dynapsp_sql(src_mod: int = 20, max_depth: int = BFS_MAX_DEPTH) -> str:
    """Exact twin of queries.q_dynapsp_state: the DynAPSP updateBatch
    contract is state == FRESH APSP on the edited graph
    (DynAPSP.cpp:157-161), so the oracle ignores the dynamics — it adds
    the two deterministic pairs to the edge table in SQL and reruns the
    multi-source BFS closure from {id % src_mod == 0}."""
    return f"""
WITH {EDGES_CTE},
sv AS MATERIALIZED (SELECT id FROM v WHERE id % {src_mod} = 0),
addp AS (
  SELECT (SELECT MIN(id) FROM sv) AS u, (SELECT MAX(id) FROM sv) AS v
  UNION ALL
  SELECT (SELECT MIN(id) FROM sv) AS u,
         (SELECT MIN(id) FROM sv WHERE id >= 300) AS v),
und2 AS MATERIALIZED (
  SELECT DISTINCT u, v FROM (
    SELECT u, v FROM und UNION ALL SELECT u, v FROM addp) WHERE u <> v),
sym2 AS MATERIALIZED (
  SELECT u AS src, v AS dst FROM und2 UNION ALL SELECT v, u FROM und2),
{_dists_cte_filtered(f"id % {src_mod} = 0", max_depth, arcs="sym2")}
SELECT s, id AS t, dist FROM dists
"""


def dynpll_distances_sql(
    sub_mod: int = 3, src_mod: int = 30, max_depth: int = 24
) -> str:
    """Exact twin of queries.q_dynpll_distances: queries from the
    repaired DynPLL index are exact hop distances on the EDITED
    subgraph, so the oracle adds the two deterministic pairs to the
    {id % sub_mod == 0}-induced arcs and reruns the BFS closure."""
    return f"""
WITH {EDGES_CTE},
sv AS MATERIALIZED (SELECT id FROM v WHERE id % {sub_mod} = 0),
addp AS (
  SELECT (SELECT MIN(id) FROM sv) AS u, (SELECT MAX(id) FROM sv) AS v
  UNION ALL
  SELECT (SELECT MIN(id) FROM sv) AS u,
         (SELECT MIN(id) FROM sv WHERE id >= 300) AS v),
ssym AS MATERIALIZED (
  SELECT DISTINCT src, dst FROM (
    SELECT src, dst FROM sym
    WHERE src % {sub_mod} = 0 AND dst % {sub_mod} = 0
    UNION ALL SELECT u AS src, v AS dst FROM addp
    UNION ALL SELECT v AS src, u AS dst FROM addp) WHERE src <> dst),
{_dists_cte_filtered(f"id % {src_mod} = 0", max_depth, arcs="ssym", verts="sv")}
SELECT s, id AS t, dist FROM dists
"""


def dyn_one_state_sql(
    sub_mod: int = 3, src_mod: int = 30, max_depth: int = 24
) -> str:
    """Exact twin of queries.q_dyn_betweenness_one_state: the repaired
    DynBetweennessOneNode state equals a fresh run on the edited graph,
    so the oracle reruns the multi-source BFS WITH path counts on the
    SQL-edited {id % sub_mod == 0} subgraph and derives sigmax by the
    same closed-form x-decomposition (x = the smallest sampled source;
    every s→t shortest path through x splits uniquely at x)."""
    parts = [
        f"sv AS MATERIALIZED (SELECT id FROM v WHERE id % {sub_mod} = 0)",
        f"""addp AS (
  SELECT (SELECT MIN(id) FROM sv) AS u, (SELECT MAX(id) FROM sv) AS v
  UNION ALL
  SELECT (SELECT MIN(id) FROM sv) AS u,
         (SELECT MIN(id) FROM sv WHERE id >= 300) AS v)""",
        f"""ssym AS MATERIALIZED (
  SELECT DISTINCT src, dst FROM (
    SELECT src, dst FROM sym
    WHERE src % {sub_mod} = 0 AND dst % {sub_mod} = 0
    UNION ALL SELECT u AS src, v AS dst FROM addp
    UNION ALL SELECT v AS src, u AS dst FROM addp) WHERE src <> dst)""",
        f"f0 AS MATERIALIZED (SELECT id AS s, id FROM sv WHERE id % {src_mod} = 0)",
        "vis0 AS MATERIALIZED (SELECT s, id FROM f0)",
        "np0 AS MATERIALIZED (SELECT s, id, CAST(1 AS HUGEINT) AS np FROM f0)",
    ]
    for k in range(1, max_depth + 1):
        parts.append(
            f"""f{k} AS MATERIALIZED (
  SELECT DISTINCT f.s, e.dst AS id FROM f{k - 1} f JOIN ssym e ON f.id = e.src
  EXCEPT SELECT s, id FROM vis{k - 1})"""
        )
        parts.append(
            f"vis{k} AS MATERIALIZED (SELECT s, id FROM vis{k - 1} UNION ALL SELECT s, id FROM f{k})"
        )
        parts.append(
            f"""np{k} AS MATERIALIZED (
  SELECT f.s, e.dst AS id, SUM(p.np) AS np
  FROM f{k - 1} f JOIN ssym e ON f.id = e.src
  JOIN np{k - 1} p ON p.s = f.s AND p.id = f.id
  JOIN f{k} t ON t.s = f.s AND t.id = e.dst
  GROUP BY f.s, e.dst)"""
        )
    levels = "\nUNION ALL\n".join(
        f"SELECT s, id AS t, CAST({k} AS DOUBLE) AS dist, np FROM np{k}"
        for k in range(0, max_depth + 1)
    )
    parts.append(f"sig AS MATERIALIZED ({levels})")
    parts.append(
        f"xx AS (SELECT MIN(id) AS x FROM sv WHERE id % {src_mod} = 0)"
    )
    joined = ",\n".join(parts)
    return f"""
WITH {EDGES_CTE},
{joined}
SELECT d.s, d.t, d.dist,
       CAST(d.np AS DOUBLE) AS sigma,
       CAST(CASE WHEN d.s = xx.x OR d.t = xx.x THEN d.np
                 WHEN sx.np IS NOT NULL AND xt.np IS NOT NULL
                      AND sx.dist + xt.dist = d.dist THEN sx.np * xt.np
                 ELSE 0 END AS DOUBLE) AS sigmax
FROM sig d
CROSS JOIN xx
LEFT JOIN sig sx ON sx.s = d.s AND sx.t = xx.x
LEFT JOIN sig xt ON xt.s = xx.x AND xt.t = d.t
"""


def pll_distances_sql(
    sub_mod: int = 3, src_mod: int = 30, max_depth: int = 24
) -> str:
    """Exact twin of queries.q_pll_distances: PLL hub-label queries are
    EXACT hop distances (PrunedLandmarkLabeling.cpp queryImpl contract),
    so the oracle is the plain BFS closure on the {id % sub_mod == 0}
    induced subgraph, sources {id % src_mod == 0}, all subgraph targets
    (unreachable pairs absent = the reference's infDist)."""
    return f"""
WITH {EDGES_CTE},
ssym AS MATERIALIZED (
  SELECT src, dst FROM sym WHERE src % {sub_mod} = 0 AND dst % {sub_mod} = 0),
sv AS MATERIALIZED (SELECT id FROM v WHERE id % {sub_mod} = 0),
{_dists_cte_filtered(f"id % {src_mod} = 0", max_depth, arcs="ssym", verts="sv")}
SELECT s, id AS t, dist FROM dists
"""


def floyd_warshall_sql(modulus: int = 7, rounds: int = 8) -> str:
    """Exact twin of queries.q_floyd_warshall: lexicographic
    (dist, hops) min-plus doubling on the induced weighted subgraph —
    2^rounds ≥ the subgraph's vertex count, so every simple path is
    covered. Weights are small-integer-valued doubles, so the dist
    equality in the hop tie-break is exact in both engines."""
    w = "CAST(1.0 + ((s.u + s.v) % 3) AS DOUBLE)"
    parts = [
        f"""sarc AS MATERIALIZED (
  SELECT s.u AS a, s.v AS b, {w} AS w FROM und s WHERE s.u % {modulus} = 0 AND s.v % {modulus} = 0
  UNION ALL
  SELECT s.v, s.u, {w} FROM und s WHERE s.u % {modulus} = 0 AND s.v % {modulus} = 0)""",
        f"""p0 AS MATERIALIZED (
  SELECT a AS u, b AS v, MIN(w) AS dist, CAST(1 AS BIGINT) AS hops FROM sarc GROUP BY a, b
  UNION ALL
  SELECT id, id, CAST(0.0 AS DOUBLE), CAST(0 AS BIGINT) FROM v WHERE id % {modulus} = 0)""",
    ]
    for k in range(1, rounds + 1):
        parts.extend((
            f"""c{k} AS MATERIALIZED (
  SELECT u, v, dist, hops FROM p{k - 1}
  UNION ALL
  SELECT l.u, r.v, l.dist + r.dist, l.hops + r.hops
  FROM p{k - 1} l JOIN p{k - 1} r ON l.v = r.u)""",
            f"""m{k} AS MATERIALIZED (SELECT u, v, MIN(dist) AS dist FROM c{k} GROUP BY u, v)""",
            f"""p{k} AS MATERIALIZED (
  SELECT c.u, c.v, m.dist, MIN(c.hops) AS hops
  FROM c{k} c JOIN m{k} m ON c.u = m.u AND c.v = m.v AND c.dist = m.dist
  GROUP BY c.u, c.v, m.dist)""",
        ))
    joined = ",\n".join(parts)
    return f"""
WITH {EDGES_CTE},
{joined}
SELECT u, v, ROUND(dist, 9) AS dist, hops FROM p{rounds}
"""


def st_distances_sql() -> str:
    """(s, t, dist) for the three deterministic vertex pairs of
    queries.q_st_distances — BidirectionalBFS.cpp's distance contract is
    plain hop distance, so the oracle reads the BFS closure restricted
    to the three sources (unreachable pairs absent)."""
    srcs = (
        "id = (SELECT MIN(id) FROM v) OR "
        "id = (SELECT MIN(id) FROM v WHERE id >= 150) OR "
        "id = (SELECT MIN(id) FROM v WHERE id >= 300)"
    )
    return f"""
WITH {EDGES_CTE},
{_dists_cte_filtered(srcs)},
pairs AS (
  SELECT (SELECT MIN(id) FROM v) AS s, (SELECT MAX(id) FROM v) AS t
  UNION ALL
  SELECT (SELECT MIN(id) FROM v WHERE id >= 150),
         (SELECT MAX(id) FROM v WHERE id <= 450)
  UNION ALL
  SELECT (SELECT MIN(id) FROM v WHERE id >= 300),
         (SELECT MAX(id) FROM v WHERE id <= 200)
)
SELECT p.s, p.t, d.dist FROM pairs p
JOIN dists d ON d.s = p.s AND d.id = p.t
"""


def st_weighted_sql(rounds: int = 2 * BFS_MAX_DEPTH + 2) -> str:
    """(s, t, dist) weighted distances for the three deterministic
    vertex pairs of queries.q_st_weighted — BidirectionalDijkstra.cpp's
    contract is the plain weighted shortest-path distance, so the
    oracle reads the Bellman-Ford unroll restricted to the three
    sources (unreachable pairs absent)."""
    srcs = (
        "id = (SELECT MIN(id) FROM v) OR "
        "id = (SELECT MIN(id) FROM v WHERE id >= 150) OR "
        "id = (SELECT MIN(id) FROM v WHERE id >= 300)"
    )
    return f"""
WITH {EDGES_CTE},
{_bellman_ford_cte(srcs, rounds)},
pairs AS (
  SELECT (SELECT MIN(id) FROM v) AS s, (SELECT MAX(id) FROM v) AS t
  UNION ALL
  SELECT (SELECT MIN(id) FROM v WHERE id >= 150),
         (SELECT MAX(id) FROM v WHERE id <= 450)
  UNION ALL
  SELECT (SELECT MIN(id) FROM v WHERE id >= 300),
         (SELECT MAX(id) FROM v WHERE id <= 200)
)
SELECT p.s, p.t, ROUND(d.dist, 9) AS dist FROM pairs p
JOIN bf d ON d.s = p.s AND d.id = p.t
"""


def scc_sql(levels: int = 6) -> str:
    """SCC labels, label = min vertex id per SCC (the engine's canonical
    relabeling, operators/scc.py). The SCC partition is UNIQUE, so an
    exact-match oracle is sound even though the engine's peel order is
    randomized. Reachability = transitive-closure DOUBLING with identity
    seeded (r_k = r_{k-1} ∘ r_{k-1} covers paths ≤ 2^k hops; 2^levels =
    64 far exceeds the derived graph's directed diameter at every test
    SF); SCC(v) = min over mutually-reaching u."""
    parts = [
        "r0 AS MATERIALIZED (SELECT src AS a, dst AS b FROM edges "
        "UNION SELECT id AS a, id AS b FROM v)",
    ]
    for k in range(1, levels + 1):
        parts.append(
            f"r{k} AS MATERIALIZED (SELECT DISTINCT x.a, y.b "
            f"FROM r{k - 1} x JOIN r{k - 1} y ON x.b = y.a)"
        )
    closure = ",\n".join(parts)
    return f"""
WITH {EDGES_CTE},
{closure},
mutual AS (
  SELECT r.a, r.b FROM r{levels} r JOIN r{levels} s ON r.a = s.b AND r.b = s.a
)
SELECT b AS id, MIN(a) AS label FROM mutual GROUP BY b
"""


def jaccard_scores_sql() -> str:
    """Per-edge neighborhood Jaccard (JaccardDistance.cpp:38-40 family):
    score = common / (deg_u + deg_v - common), common = per-edge triangle
    count (each triangle through edge {u,v} is one shared neighbor)."""
    return f"""
WITH {EDGES_CTE},
{TRI_CTE},
sides AS (
  SELECT least(a, b) AS u, greatest(a, b) AS v FROM tri
  UNION ALL SELECT least(b, c), greatest(b, c) FROM tri
  UNION ALL SELECT least(a, c), greatest(a, c) FROM tri
),
cnt AS (SELECT u, v, COUNT(*) AS c FROM sides GROUP BY u, v)
SELECT e.u, e.v,
       ROUND(CAST(COALESCE(cnt.c, 0) AS DOUBLE)
             / (du.degree + dv.degree - COALESCE(cnt.c, 0)), 6) AS score
FROM und e
JOIN deg du ON du.id = e.u
JOIN deg dv ON dv.id = e.v
LEFT JOIN cnt ON cnt.u = e.u AND cnt.v = e.v
"""


def katz_sql(iters: int = 3, alpha: float = 5e-4, beta: float = 0.1) -> str:
    """Katz centrality unrolled to a fixed superstep count
    (KatzCentrality.cpp iteration x' = alpha * gather_in(x) + beta from
    x = 0, then L2 normalization). Directed in-edge gather, weight 1."""
    parts = [f"x1 AS (SELECT id, {beta} AS score FROM v)"]
    for k in range(2, iters + 1):
        parts.append(
            f"""x{k} AS (SELECT v.id,
    {alpha} * COALESCE(g.s, 0.0) + {beta} AS score
  FROM v LEFT JOIN (
    SELECT e.dst AS id, SUM(x.score * e.weight) AS s
    FROM edges e JOIN x{k - 1} x ON x.id = e.src GROUP BY e.dst
  ) g ON g.id = v.id)"""
        )
    chain = ",\n".join(parts)
    return f"""
WITH {EDGES_CTE},
{chain},
nrm AS (SELECT SQRT(SUM(score * score)) AS nn FROM x{iters})
SELECT id, ROUND(score / (SELECT nn FROM nrm), 9) AS score FROM x{iters}
"""


def matching_summary_sql(matching_parquet: str) -> str:
    """Property oracle for local-max matching (LocalMaxMatcher.cpp
    contract, Matching::isProper): the Spark query materializes its
    matched edges to a side-channel parquet; both engines independently
    verify FROM that copy that (1) it is a matching — every vertex at
    most once, (2) every matched pair is a real edge, (3) it is MAXIMAL —
    no remaining edge has both endpoints free (the 1/2-approximation
    guarantee rests on maximality). Tie-broken matchings differ in
    membership but never in these properties; n_matched pins the size."""
    return f"""
WITH {EDGES_CTE},
m AS (SELECT u, v FROM read_parquet('{matching_parquet}/*.parquet')),
nodes AS (SELECT u AS id FROM m UNION ALL SELECT v AS id FROM m)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM m) AS n_matched,
       (SELECT COUNT(DISTINCT id) FROM nodes)
         = 2 * (SELECT COUNT(*) FROM m) AS is_matching,
       NOT EXISTS (SELECT 1 FROM m LEFT JOIN und e
                   ON e.u = m.u AND e.v = m.v WHERE e.u IS NULL) AS edges_real,
       NOT EXISTS (
         SELECT 1 FROM und e
         WHERE e.u <> e.v
           AND e.u NOT IN (SELECT id FROM nodes)
           AND e.v NOT IN (SELECT id FROM nodes)
       ) AS is_maximal
"""


def cc_converged_sql(levels: int = 6) -> str:
    """Converged undirected connected components, label = min vertex id
    per component (the canonical relabeling shared by hash-min and the
    large-star/small-star operator — the partition is unique, so exact
    match is sound for both). Reachability = transitive-closure doubling
    over the SYMMETRIZED arcs (2^levels = 64 hops covers the derived
    graph's undirected diameter at every test SF)."""
    parts = [
        "u0 AS MATERIALIZED (SELECT src AS a, dst AS b FROM sym "
        "UNION SELECT id AS a, id AS b FROM v)",
    ]
    for k in range(1, levels + 1):
        parts.append(
            f"u{k} AS MATERIALIZED (SELECT DISTINCT x.a, y.b "
            f"FROM u{k - 1} x JOIN u{k - 1} y ON x.b = y.a)"
        )
    closure = ",\n".join(parts)
    return f"""
WITH {EDGES_CTE},
{closure}
SELECT b AS id, MIN(a) AS label FROM u{levels} GROUP BY b
"""


def dedup_clusters_sql(threshold: float = 0.5, levels: int = 6) -> str:
    """End-to-end dedup decision: verified near-dup pairs → undirected
    transitive closure (doubling, 2^levels hops covers any dup-chain
    diameter at test scale) → cluster = MIN doc_id, keep = (doc_id ==
    cluster). Exact twin of operators/dedup.dedup_clusters (hash-min CC's
    fixed point is the same min-id partition)."""
    parts = [
        "c0 AS MATERIALIZED (SELECT doc_a AS a, doc_b AS b FROM nd "
        "UNION SELECT doc_b, doc_a FROM nd "
        "UNION SELECT doc_id AS a, doc_id AS b FROM documents)",
    ]
    for k in range(1, levels + 1):
        parts.append(
            f"c{k} AS MATERIALIZED (SELECT DISTINCT x.a, y.b "
            f"FROM c{k - 1} x JOIN c{k - 1} y ON x.b = y.a)"
        )
    closure = ",\n".join(parts)
    return f"""
WITH {_buckets_cte()},
cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM buckets a JOIN buckets b
    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id),
szs AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
inter AS (SELECT c.doc_a, c.doc_b, COUNT(*) AS i
  FROM cand c
  JOIN sh a ON a.doc_id = c.doc_a
  JOIN sh b ON b.doc_id = c.doc_b AND b.ngram = a.ngram
  GROUP BY c.doc_a, c.doc_b),
nd AS (SELECT doc_a, doc_b FROM (
  SELECT c.doc_a, c.doc_b,
         ROUND(COALESCE(i.i, 0) / (sa.sz + sb.sz - COALESCE(i.i, 0)), 6) AS jaccard
  FROM cand c
  LEFT JOIN inter i ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b
  JOIN szs sa ON sa.doc_id = c.doc_a
  JOIN szs sb ON sb.doc_id = c.doc_b
) WHERE jaccard >= {threshold}),
{closure}
SELECT b AS doc_id, MIN(a) AS cluster, (b = MIN(a)) AS keep
FROM c{levels} GROUP BY b
"""


def algebraic_distance_sql(
    num_systems: int = 4, num_iters: int = 4, omega: float = 0.5, seed: int = 1
) -> str:
    """Exact twin of operators/distances.algebraic_distance_edge_scores
    (max norm) on the undirected derived graph: same md5 init, unrolled
    Jacobi sweeps, per-system normalization, per-edge L-infinity."""
    sys_vals = ", ".join(f"({s})" for s in range(num_systems))
    parts = [
        f"sysx AS (SELECT * FROM (VALUES {sys_vals}) s(sys))",
        "wdeg AS (SELECT src AS id, SUM(weight) AS wdeg FROM sym GROUP BY src)",
        f"""l0 AS (SELECT id, sys,
    ('0x' || substring(md5('ad|{seed}|' || id || '|' || sys), 1, 8))::BIGINT
      / 4294967296.0 AS load
  FROM v CROSS JOIN sysx)""",
    ]
    for k in range(1, num_iters + 1):
        parts.append(f"""l{k} AS (
  SELECT p.id, p.sys,
         CASE WHEN g.s IS NOT NULL
              THEN (1.0 - {omega}) * p.load + {omega} * (g.s / w.wdeg)
              ELSE p.load END AS load
  FROM l{k - 1} p
  LEFT JOIN (SELECT e.src AS id, l.sys, SUM(e.weight * l.load) AS s
             FROM sym e JOIN l{k - 1} l ON l.id = e.dst
             GROUP BY e.src, l.sys) g ON g.id = p.id AND g.sys = p.sys
  LEFT JOIN wdeg w ON w.id = p.id)""")
    chain = ",\n".join(parts)
    return f"""
WITH {EDGES_CTE},
{chain},
mm AS (SELECT sys, MIN(load) AS mn, MAX(load) AS mx FROM l{num_iters} GROUP BY sys),
nrm AS (SELECT l.id, l.sys,
          CASE WHEN mm.mn = mm.mx THEN 0.0
               ELSE (mm.mn - l.load) / (mm.mn - mm.mx) END AS load
        FROM l{num_iters} l JOIN mm ON mm.sys = l.sys)
SELECT e.u, e.v, MAX(ABS(la.load - lb.load)) AS ad
FROM und e
JOIN nrm la ON la.id = e.u
JOIN nrm lb ON lb.id = e.v AND lb.sys = la.sys
GROUP BY e.u, e.v
"""


def link_prediction_d2_sql() -> str:
    """Exact twin of queries.q_link_prediction_d2: distance-2 candidate
    pairs (wedge minus existing edges) with the five neighborhood
    indices (linkprediction/ *Index semantics)."""
    return f"""
WITH {EDGES_CTE},
nbr AS (SELECT src AS u, dst AS w FROM sym),
deg AS (SELECT src AS id, CAST(COUNT(*) AS DOUBLE) AS deg FROM sym GROUP BY src),
cand AS (
  SELECT DISTINCT a.u AS u, b.u AS v
  FROM nbr a JOIN nbr b ON a.w = b.w AND a.u < b.u
  WHERE NOT EXISTS (SELECT 1 FROM und e WHERE e.u = a.u AND e.v = b.u)
),
cn AS (
  SELECT c.u, c.v,
         CAST(COUNT(*) AS BIGINT) AS cnt,
         SUM(1.0 / LN(d.deg)) AS aa,
         SUM(1.0 / d.deg) AS ra
  FROM cand c
  JOIN nbr a ON a.u = c.u
  JOIN nbr b ON b.u = c.v AND b.w = a.w
  JOIN deg d ON d.id = a.w
  GROUP BY c.u, c.v
)
SELECT c.u, c.v,
       cn.cnt AS common_neighbors,
       ROUND(cn.cnt / (du.deg + dv.deg - cn.cnt), 6) AS jaccard,
       ROUND(cn.aa, 6) AS adamic_adar,
       ROUND(cn.ra, 6) AS resource_allocation,
       du.deg * dv.deg AS pref_attachment
FROM cand c
JOIN cn ON cn.u = c.u AND cn.v = c.v
JOIN deg du ON du.id = c.u
JOIN deg dv ON dv.id = c.v
"""


def _walk_u_sql(walk: str, pos: int, cand: str, seed: int) -> str:
    """The engine's seeded uniform draw (operators/embedding.py _u):
    three-round quadratic hash mod 1e9+7, exact int64 in both engines."""
    m = 1_000_000_007
    h1 = f"(({walk})*2654435761 + {pos}*40503 + ({cand})*97 + {seed}*1000003) % {m}"
    h2 = f"((h1*h1 + 2654435761*h1 + 40503) % {m})"
    h3 = f"((h2*h2 + 97*h2 + 1000003) % {m})"
    # inline h1/h2 (DuckDB lacks lateral aliasing inside one expression)
    h2_full = h2.replace("h1", f"({h1})")
    h3_full = h3.replace("h2", f"({h2_full})")
    return f"(CAST({h3_full} + 1 AS DOUBLE) / 1000000008.0)"


def node2vec_walks_sql(
    walk_length: int = 4, p: float = 0.5, q: float = 2.0, seed: int = 42
) -> str:
    """Exact twin of queries.q_node2vec_walks: one walk per node over the
    undirected graph (sym arcs), first hop uniform, later hops
    Efraimidis–Vassilvitskii weighted by the reference's p/q bias
    (BiasedRandomWalk.cpp:80-90), ties toward the smaller candidate."""
    steps = []
    u1 = _walk_u_sql("v.id", 1, "a.dst", seed)
    steps.append(f"""
s1 AS (
  SELECT walk, prev, cur FROM (
    SELECT v.id AS walk, v.id AS prev, a.dst AS cur,
           ROW_NUMBER() OVER (
             PARTITION BY v.id ORDER BY {u1} DESC, a.dst ASC
           ) AS rn
    FROM v JOIN sym a ON a.src = v.id
  ) WHERE rn = 1
)""".strip())
    for pos in range(2, walk_length):
        un = _walk_u_sql("t.walk", pos, "a.dst", seed)
        steps.append(f"""
s{pos} AS (
  SELECT walk, prev, cur FROM (
    SELECT t.walk, t.cur AS prev, a.dst AS cur,
           ROW_NUMBER() OVER (
             PARTITION BY t.walk
             ORDER BY ln({un}) / (
               CASE
                 WHEN a.dst = t.prev THEN a.weight / {p}
                 WHEN nb.pa IS NOT NULL THEN a.weight
                 ELSE a.weight / {q}
               END
             ) DESC, a.dst ASC
           ) AS rn
    FROM s{pos - 1} t
    JOIN sym a ON a.src = t.cur
    LEFT JOIN (SELECT DISTINCT src AS pa, dst AS pb FROM sym) nb
      ON nb.pa = t.prev AND nb.pb = a.dst
  ) WHERE rn = 1
)""".strip())
    unions = ["SELECT id AS walk, 0 AS pos, id AS node FROM v"]
    for pos in range(1, walk_length):
        unions.append(f"SELECT walk, {pos} AS pos, cur AS node FROM s{pos}")
    body = "\nUNION ALL\n".join(unions)
    steps_sql = ",\n".join(steps)
    return f"""
WITH {EDGES_CTE},
{steps_sql}
SELECT CAST(walk AS BIGINT) AS walk, CAST(pos AS INTEGER) AS pos,
       CAST(node AS BIGINT) AS node
FROM ({body})
"""


def pivot_mds_centered_sql(modulus: int = 97) -> str:
    """Exact twin of queries.q_pivot_mds_centered: hop distances from
    the pivots (id ≡ 0 mod modulus) over sym, then the reference's
    raw-distance double-centering (PivotMDS.cpp:49-70) with
    grandMean = T/(n·k) (a single rounding — see operators/layout.py)."""
    return f"""
WITH {EDGES_CTE},
{_dists_cte_filtered(f"id % {modulus} = 0")},
piv AS (SELECT id AS p, ROW_NUMBER() OVER (ORDER BY id) - 1 AS j
        FROM v WHERE id % {modulus} = 0),
nk AS (SELECT (SELECT CAST(COUNT(*) AS DOUBLE) FROM v) AS n,
              (SELECT CAST(COUNT(*) AS DOUBLE) FROM piv) AS k),
c AS (SELECT d.id, piv.j, CAST(d.dist AS DOUBLE) AS dist
      FROM dists d JOIN piv ON piv.p = d.s),
rm AS (SELECT id, SUM(dist) / (SELECT k FROM nk) AS row_mean FROM c GROUP BY id),
cm AS (SELECT j, SUM(dist) / (SELECT n FROM nk) AS col_mean FROM c GROUP BY j),
g AS (SELECT SUM(dist) / ((SELECT n FROM nk) * (SELECT k FROM nk)) AS grand FROM c)
SELECT c.id, CAST(c.j AS INTEGER) AS j,
       ROUND(c.dist - rm.row_mean - cm.col_mean + g.grand, 9) AS val
FROM c JOIN rm ON rm.id = c.id JOIN cm ON cm.j = c.j CROSS JOIN g
"""


def pagerank_nibble_sql(
    alpha: float = 0.15, eps: float = 1e-5, rounds: int = 24
) -> str:
    """Exact twin of queries.q_pagerank_nibble: the synchronous batched
    ACL push unrolled `rounds` times (converged supersteps are no-ops,
    so any count past convergence is exact — measured ≤16 at sf0.001,
    ≤8 at sf0.01), then the conductance sweep. Float constants are
    repr()'d from the same Python doubles the Spark plan uses, and every
    arithmetic expression mirrors the Spark operation order, so the
    push is bit-identical."""
    keep = (1.0 - alpha) / 2.0
    send = 1.0 - alpha
    parts = [
        """vol AS MATERIALIZED (SELECT src AS id, SUM(weight) AS vol
  FROM sym GROUP BY src)""",
        """st0 AS (SELECT (SELECT MIN(id) FROM v) AS id,
  0.0 AS p, 1.0 AS res)""",
    ]
    for r in range(1, rounds + 1):
        parts.append(f"""
act{r} AS MATERIALIZED (
  SELECT s.id, s.p, s.res, vl.vol, (s.res >= {eps!r} * vl.vol) AS a
  FROM st{r - 1} s JOIN vol vl ON vl.id = s.id)""".strip())
        parts.append(f"""
snd{r} AS MATERIALIZED (
  SELECT e.dst AS id,
         SUM({send!r} * a.res * e.weight / (2.0 * a.vol)) AS m
  FROM act{r} a JOIN sym e ON e.src = a.id WHERE a.a GROUP BY e.dst)""".strip())
        parts.append(f"""
st{r} AS MATERIALIZED (
  SELECT COALESCE(a.id, s.id) AS id,
         COALESCE(a.p, 0.0)
           + CASE WHEN COALESCE(a.a, FALSE) THEN {alpha!r} * a.res
                  ELSE 0.0 END AS p,
         CASE WHEN COALESCE(a.a, FALSE) THEN {keep!r} * a.res
              ELSE COALESCE(a.res, 0.0) END + COALESCE(s.m, 0.0) AS res
  FROM act{r} a FULL OUTER JOIN snd{r} s ON s.id = a.id)""".strip())
    body = ",\n".join(parts)
    return f"""
WITH {EDGES_CTE},
{body},
sup AS (SELECT s.id, s.p, vl.vol FROM st{rounds} s
        JOIN vol vl ON vl.id = s.id WHERE s.p > 0),
rnk AS MATERIALIZED (SELECT id, vol,
        ROW_NUMBER() OVER (ORDER BY p / vol DESC, id ASC) AS rk FROM sup),
tot AS (SELECT SUM(vol) AS t FROM vol),
ia AS (SELECT GREATEST(ru.rk, rv.rk) AS rk, SUM(e.weight) AS w_in
       FROM sym e JOIN rnk ru ON ru.id = e.src
       JOIN rnk rv ON rv.id = e.dst GROUP BY 1),
sw AS (SELECT r.rk,
              SUM(r.vol) OVER (ORDER BY r.rk) AS cv,
              SUM(COALESCE(ia.w_in, 0.0)) OVER (ORDER BY r.rk) AS ci
       FROM rnk r LEFT JOIN ia ON ia.rk = r.rk),
best AS (SELECT rk FROM (
           SELECT rk, (cv - ci) / LEAST(cv, (SELECT t FROM tot) - cv) AS c
           FROM sw WHERE rk < (SELECT COUNT(*) FROM v))
         ORDER BY c ASC, rk ASC LIMIT 1)
SELECT r.id FROM rnk r WHERE r.rk <= (SELECT rk FROM best)
"""


def _mix_sql(h1_expr: str) -> str:
    """SQL twin of operators/randomization._mix's quadratic rounds over
    a caller-supplied linear combination (already mod M)."""
    m = 1_000_000_007
    h2 = f"((({h1_expr})*({h1_expr}) + 2654435761*({h1_expr}) + 40503) % {m})"
    return f"((({h2})*({h2}) + 97*({h2}) + 1000003) % {m})"


def degree_preserving_shuffle_sql(seed: int = 7) -> str:
    """Exact twin of queries.q_degree_preserving_shuffle: within each
    degree class, zip the seeded-hash rank with the id rank. The
    engine's giant-class salt is 0 for every class below 1e6 nodes, so
    it is the identity at oracle scale."""
    m = 1_000_000_007
    h1 = f"((id*2654435761 + {seed}*40503) % {m})"
    return f"""
WITH {EDGES_CTE},
deg AS (SELECT src AS id, COUNT(*) AS d FROM sym GROUP BY src),
keyed AS (SELECT id, d, {_mix_sql(h1)} AS k FROM deg),
a AS (SELECT id, d, ROW_NUMBER() OVER (PARTITION BY d ORDER BY k, id) AS r
      FROM keyed),
b AS (SELECT id AS new_id, d, ROW_NUMBER() OVER (PARTITION BY d ORDER BY id) AS r
      FROM keyed)
SELECT a.id, b.new_id FROM a JOIN b ON a.d = b.d AND a.r = b.r
"""


def link_pred_curve_sql(metric: str, seed: int = 7, num_thresholds: int = 21) -> str:
    """Exact twin of queries._link_pred_curve: seeded-hash 70/30 holdout
    (RandomLinkSampler parity — FLOOR matches the C++ count truncation),
    common-neighbor wedge scores on the training graph's distance-2
    candidates, EvaluationMetric's nearest-rank threshold grid (same
    float operation order), prefix TP/FP in (score DESC, u, v) order,
    ROC/PR point generation with the consecutive-duplicate-x collapse
    (arg_max over the threshold index = reference's keep-last pop)."""
    m = 1_000_000_007
    h1 = f"((u*2654435761 + v*40503 + {seed}*97) % {m})"
    tm1 = float(num_thresholds - 1)
    if metric == "roc":
        xy = """
xy AS (SELECT t,
  CAST(t - tp AS DOUBLE) / (SELECT n - p FROM nn2, npos) AS x,
  CAST(tp AS DOUBLE) / (SELECT p FROM npos) AS y FROM stats)"""
    else:
        xy = """
xy AS (SELECT t,
  CASE WHEN tp > 0 OR (SELECT p FROM npos) - tp > 0
       THEN CAST(tp AS DOUBLE) / (SELECT p FROM npos) ELSE 1.0 END AS x,
  CASE WHEN t > 0 THEN CAST(tp AS DOUBLE) / t ELSE 1.0 END AS y FROM stats)"""
    return f"""
WITH {EDGES_CTE},
mm AS (SELECT COUNT(*) AS m FROM und),
keyed AS (SELECT u, v, {_mix_sql(h1)} AS h FROM und),
ranked AS (SELECT u, v, ROW_NUMBER() OVER (ORDER BY h, u, v) AS r FROM keyed),
train AS (SELECT u, v FROM ranked
          WHERE r <= (SELECT CAST(FLOOR(0.7 * m) AS BIGINT) FROM mm)),
symt AS (SELECT u AS a, v AS b FROM train UNION ALL SELECT v, u FROM train),
cand AS (
  SELECT x.a AS u, y.b AS v, COUNT(*) AS cn
  FROM symt x JOIN symt y ON x.b = y.a AND x.a < y.b
  WHERE NOT EXISTS (SELECT 1 FROM train t WHERE t.u = x.a AND t.v = y.b)
  GROUP BY x.a, y.b
),
nn2 AS (SELECT COUNT(*) AS n FROM cand),
npos AS (SELECT COUNT(*) AS p
         FROM cand c JOIN und e ON e.u = c.u AND e.v = c.v),
grid AS (SELECT DISTINCT CAST(CEIL((SELECT n FROM nn2)
           * (CAST(i AS DOUBLE) / {tm1})) AS BIGINT) AS t
         FROM range({num_thresholds}) AS tbl(i)),
lab AS (SELECT c.u, c.v, c.cn,
          CASE WHEN e.u IS NULL THEN 0 ELSE 1 END AS pos
        FROM cand c LEFT JOIN und e ON e.u = c.u AND e.v = c.v),
cum AS (SELECT (ROW_NUMBER() OVER (ORDER BY cn DESC, u, v) - 1) AS r,
          COALESCE(SUM(pos) OVER (ORDER BY cn DESC, u, v
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS tp
        FROM lab),
stats AS (
  SELECT g.t, c.tp FROM grid g JOIN cum c ON c.r = g.t
  UNION ALL
  SELECT (SELECT n FROM nn2), (SELECT p FROM npos)
),{xy}
SELECT ROUND(x, 9) AS x, ROUND(y, 9) AS y
FROM (SELECT x, arg_max(y, t) AS y FROM xy GROUP BY x)
"""


def curveball_degrees_sql() -> str:
    """Property twin of queries.q_curveball_degrees: GlobalCurveball's
    reference contract (GlobalCurveballGTest) is exact per-node degree
    preservation on a simple graph, so the randomized graph's degree
    table must hash-equal the ORIGINAL undirected degree table. A
    duplicate edge, self-loop, or lost/invented edge in the trade rounds
    shifts some node's degree and fails the hash. The per-round draw
    semantics are pytest-locked by a bit-exact pure-Python replay
    (tests/test_randomization.py)."""
    return f"""
WITH {EDGES_CTE}
SELECT src AS id, CAST(COUNT(*) AS BIGINT) AS degree FROM sym GROUP BY src
"""


def _luby_u_chain(k: int, seed: int, src: str) -> str:
    """Three chained CTE selects computing the engine's seeded uniform
    draw for round k (operators/independent.py _u — change together)."""
    c = k * 40503 + seed * 1000003
    return f"""
d1_{k} AS (SELECT id, wdeg,
  ((id % 1000003) * 2654435761 + {c}) % 1000000007 AS h FROM {src}),
d2_{k} AS (SELECT id, wdeg,
  (h*h + 2654435761*h + 40503) % 1000000007 AS h FROM d1_{k}),
d3_{k} AS (SELECT id, wdeg,
  (h*h + 97*h + 1000003) % 1000000007 AS h FROM d2_{k})"""


def luby_sql(rounds: int = 16, seed: int = 1) -> str:
    """Exact twin of operators/independent.luby_independent_set: the
    seeded-hash draws make every round a pure function of (graph, seed),
    so the oracle unrolls the round loop (Luby.cpp run()) — active-
    restricted weighted degree, candidate draw u < 1/(2·wdeg) (wdeg = 0
    always selected), per-conflict-edge loser drop (smaller wdeg, src on
    ties), survivor + neighborhood removal. Rounds past convergence are
    no-ops (empty active ⇒ empty S), so a fixed unroll ≥ the actual
    round count (4 at sf0.001, 10 at sf0.01 — 16 gives margin) is
    exact."""
    parts = [
        "symm AS MATERIALIZED (SELECT src, dst, weight FROM sym)",
        "act0 AS MATERIALIZED (SELECT id FROM v)",
        "mem0 AS (SELECT id FROM v WHERE FALSE)",
    ]
    for k in range(1, rounds + 1):
        p = k - 1
        parts.append(f"""
wdeg{k} AS (
  SELECT e.src AS id, SUM(e.weight) AS wdeg
  FROM symm e JOIN act{p} a ON a.id = e.src JOIN act{p} b ON b.id = e.dst
  GROUP BY e.src),
st{k} AS (
  SELECT a.id, COALESCE(w.wdeg, 0.0) AS wdeg
  FROM act{p} a LEFT JOIN wdeg{k} w ON w.id = a.id),{_luby_u_chain(k, seed, f"st{k}")},
s{k} AS MATERIALIZED (
  SELECT id, wdeg FROM d3_{k}
  WHERE wdeg = 0 OR CAST(h + 1 AS DOUBLE) / 1000000008.0 < 1.0 / (2.0 * wdeg)),
loser{k} AS (
  SELECT DISTINCT CASE WHEN su.wdeg > sv.wdeg THEN e.dst ELSE e.src END AS id
  FROM symm e JOIN s{k} su ON su.id = e.src JOIN s{k} sv ON sv.id = e.dst
  WHERE e.src < e.dst),
sp{k} AS MATERIALIZED (SELECT id FROM s{k} WHERE id NOT IN (SELECT id FROM loser{k})),
rem{k} AS (
  SELECT id FROM sp{k}
  UNION
  SELECT e.dst AS id FROM symm e JOIN sp{k} p ON p.id = e.src),
act{k} AS MATERIALIZED (SELECT id FROM act{p} WHERE id NOT IN (SELECT id FROM rem{k})),
mem{k} AS MATERIALIZED (SELECT id FROM mem{p} UNION ALL SELECT id FROM sp{k})""")
    chain = ",\n".join(parts)
    return f"""
WITH {EDGES_CTE},
{chain}
SELECT id FROM mem{rounds}
"""


def sfigality_sql() -> str:
    """Exact twin of operators/centrality.sfigality on the undirected
    link graph (Sfigality.cpp:16-28): fraction of neighbors with strictly
    higher degree; isolated vertices 0.0 (engine convention)."""
    return f"""
WITH {EDGES_CTE},
deg AS (SELECT src AS id, COUNT(*) AS d FROM sym GROUP BY src)
SELECT vv.id,
       COALESCE(s.score, 0.0) AS score
FROM v vv
LEFT JOIN (
  SELECT e.src AS id,
         SUM(CASE WHEN du.d < dv.d THEN 1 ELSE 0 END) / ANY_VALUE(du.d) AS score
  FROM sym e
  JOIN deg du ON du.id = e.src
  JOIN deg dv ON dv.id = e.dst
  GROUP BY e.src
) s ON s.id = vv.id
"""


def square_clustering_sql() -> str:
    """Exact twin of operators/centrality.local_square_clustering
    (LocalSquareClusteringCoefficient.cpp:20-50): per unordered neighbor
    pair (a, b) of center u, squares += cn(a,b) − 1 and potential +=
    deg(a) + deg(b) − cn(a,b) − 1 − 2·[a ~ b]; score = Σsq / Σpot."""
    return f"""
WITH {EDGES_CTE},
deg AS (SELECT src AS id, COUNT(*) AS d FROM sym GROUP BY src),
cn AS (
  SELECT e1.dst AS a, e2.dst AS b, COUNT(*) AS c
  FROM sym e1 JOIN sym e2 ON e1.src = e2.src
  WHERE e1.dst < e2.dst
  GROUP BY e1.dst, e2.dst),
pairs AS (
  SELECT p1.src AS u, p1.dst AS a, p2.dst AS b
  FROM sym p1 JOIN sym p2 ON p1.src = p2.src
  WHERE p1.dst < p2.dst),
per_pair AS (
  SELECT pr.u,
         COALESCE(cn.c, 0) - 1 AS sq,
         da.d + db.d - COALESCE(cn.c, 0) - 1
           - 2 * (CASE WHEN adj.src IS NOT NULL THEN 1 ELSE 0 END) AS pot
  FROM pairs pr
  LEFT JOIN cn ON cn.a = pr.a AND cn.b = pr.b
  JOIN deg da ON da.id = pr.a
  JOIN deg db ON db.id = pr.b
  LEFT JOIN sym adj ON adj.src = pr.a AND adj.dst = pr.b)
SELECT vv.id,
       ROUND(COALESCE(s.score, 0.0), 9) AS score
FROM v vv
LEFT JOIN (
  SELECT u AS id,
         CASE WHEN SUM(pot) > 0 THEN SUM(sq) / SUM(pot) ELSE 0.0 END AS score
  FROM per_pair GROUP BY u
) s ON s.id = vv.id
"""


def reachable_nodes_sql(levels: int = 7) -> str:
    """Exact twin of operators/reachability.reachable_nodes(exact) on the
    DIRECTED link graph: transitive-closure doubling over the arcs (+
    identity), then reachable(u) = |{v : u →* v}|. 2^levels = 128 hops
    covers the derived graph's directed diameter at every test SF (the
    SCC oracle's 64-hop closure already converges on the same data)."""
    parts = [
        "r0 AS MATERIALIZED (SELECT src AS a, dst AS b FROM edges "
        "UNION SELECT id AS a, id AS b FROM v)"
    ]
    for k in range(1, levels + 1):
        parts.append(
            f"r{k} AS MATERIALIZED (SELECT DISTINCT x.a, y.b "
            f"FROM r{k - 1} x JOIN r{k - 1} y ON x.b = y.a)"
        )
    chain = ",\n".join(parts)
    return f"""
WITH {EDGES_CTE},
{chain}
SELECT a AS id, CAST(COUNT(DISTINCT b) AS BIGINT) AS reachable
FROM r{levels} GROUP BY a
"""


def _djb2_sql_chain(src: str) -> str:
    """Eight chained CTE steps computing the reference's djb2 over the
    little-endian bytes of column `key`, stopping at the first zero byte
    (operators/overlap.py _djb2 — change together)."""
    parts = [f"k0 AS (SELECT id, key, CAST(5381 AS BIGINT) AS h, FALSE AS stop FROM {src})"]
    for i in range(8):
        b = f"((key >> {8 * i}) & 255)"
        parts.append(
            f"k{i + 1} AS (SELECT id, key, "
            f"CASE WHEN stop OR {b} = 0 THEN h ELSE h * 33 + {b} END AS h, "
            f"(stop OR {b} = 0) AS stop FROM k{i})"
        )
    return ",\n".join(parts)


def hashing_overlap_sql(m1: int = 5, m2: int = 7) -> str:
    """Exact twin of operators/overlap.hashing_overlapper for two input
    clusterings id % m1 and id % m2 (HashingOverlapper.cpp:44-59 +
    Partition::compact dense-rank relabeling)."""
    return f"""
WITH {EDGES_CTE},
c1 AS (SELECT id, DENSE_RANK() OVER (ORDER BY id % {m1}) - 1 AS l1 FROM v),
c2 AS (SELECT id, DENSE_RANK() OVER (ORDER BY id % {m2}) - 1 AS l2 FROM v),
keyed AS (
  SELECT a.id, (xor(a.l1, 65535) << 16) | xor(b.l2, 65535) AS key
  FROM c1 a JOIN c2 b ON a.id = b.id),
{_djb2_sql_chain("keyed")}
SELECT id, DENSE_RANK() OVER (ORDER BY h) - 1 AS label FROM k8
"""


def _seir_u_chain(t: int, seed: int, prev: str) -> str:
    """Contact-draw CTE chain for sweep t: candidates are (infectious
    src, susceptible dst) arcs; the draw is the engine's quadratic hash
    (operators/simulation.py _u — change together)."""
    c = t * 40503 + seed * 1000003
    return f"""
cd1_{t} AS (
  SELECT e.dst,
    ((e.src % 1000003) * 2654435761 + (e.dst % 1000003) * 97 + {c}) % 1000000007 AS h
  FROM symm e
  JOIN {prev} i ON i.id = e.src AND i.st = 2
  JOIN {prev} s ON s.id = e.dst AND s.st = 0),
cd2_{t} AS (SELECT dst, (h*h + 2654435761*h + 40503) % 1000000007 AS h FROM cd1_{t}),
cd3_{t} AS (SELECT dst, (h*h + 97*h + 1000003) % 1000000007 AS h FROM cd2_{t})"""


def seir_sql(
    t_max: int = 8,
    trans_p: float = 0.3,
    e_time: int = 2,
    i_time: int = 3,
    seed: int = 11,
) -> str:
    """Exact twin of operators/simulation.epidemic_seir on the undirected
    link graph with patient zero = MIN(id): one unrolled CTE block per
    sweep (synchronous pre-sweep state, seeded-hash contact draws),
    census rows (zero, t, state, population) per step."""
    parts = [
        "symm AS MATERIALIZED (SELECT src, dst FROM sym)",
        "z AS (SELECT MIN(id) AS zero FROM v)",
        "st0 AS MATERIALIZED (SELECT id, CASE WHEN id = (SELECT zero FROM z) "
        "THEN 2 ELSE 0 END AS st, 0 AS ts FROM v)",
    ]
    for t in range(t_max):
        prev = f"st{t}"
        parts.append(f"""{_seir_u_chain(t, seed, prev)},
exp{t} AS (
  SELECT DISTINCT dst AS id FROM cd3_{t}
  WHERE CAST(h + 1 AS DOUBLE) / 1000000008.0 <= {trans_p!r}),
nx{t} AS (
  SELECT s.id, s.st, s.ts,
    CASE WHEN s.st = 0 AND x.id IS NOT NULL THEN 1
         WHEN s.st = 1 AND {t} - s.ts >= {e_time} THEN 2
         WHEN s.st = 2 AND {t} - s.ts >= {i_time} THEN 3
         ELSE s.st END AS st_new
  FROM {prev} s LEFT JOIN exp{t} x ON x.id = s.id),
st{t + 1} AS MATERIALIZED (
  SELECT id, st_new AS st,
    CASE WHEN st_new <> st THEN {t} ELSE ts END AS ts
  FROM nx{t}),
cen{t} AS (
  SELECT (SELECT zero FROM z) AS zero, {t} AS t, g.s AS state,
         COALESCE(c.c, 0) AS population
  FROM (VALUES (0),(1),(2),(3)) g(s)
  LEFT JOIN (SELECT st, CAST(COUNT(*) AS BIGINT) AS c
             FROM st{t + 1} GROUP BY st) c ON c.st = g.s)""")
    chain = ",\n".join(parts)
    union = "\nUNION ALL\n".join(
        f"SELECT * FROM cen{t}" for t in range(t_max)
    )
    return f"""
WITH {EDGES_CTE},
{chain}
{union}
"""


def maximal_cliques_sql(max_size: int = 8) -> str:
    """Exact twin of queries.q_maximal_cliques: enumerate ALL maximal
    cliques of the hash-sparsified link graph ((u*1000003+v)%97<6 over
    und). The clique SET is unique (order-free), so plain enumeration —
    ordered expansion c{s} -> c{s+1} by appending a larger vertex
    adjacent to every member, then a maximality anti-test (no outside
    vertex adjacent to all members) — is an exact oracle. Unrolled to
    max_size=8; a clique of size >= 8 would make engine and oracle
    disagree LOUDLY (row-count mismatch), never silently (largest
    observed: 4 at sf0.01)."""
    parts = [
        "sp AS MATERIALIZED (SELECT u, v FROM und WHERE (u * 1000003 + v) % 97 < 6)",
        "ssym AS MATERIALIZED (SELECT u AS src, v AS dst FROM sp "
        "UNION ALL SELECT v AS src, u AS dst FROM sp)",
        "c1 AS (SELECT [id] AS m FROM v)",
    ]
    for s in range(1, max_size):
        parts.append(f"""
c{s + 1} AS MATERIALIZED (
  SELECT list_append(c.m, e.dst) AS m
  FROM c{s} c JOIN ssym e ON e.src = c.m[{s}] AND e.dst > c.m[{s}]
  WHERE (SELECT COUNT(*) FROM ssym e2
         WHERE e2.dst = e.dst AND list_contains(c.m, e2.src)) = {s})""")
    sel = "\nUNION ALL\n".join(
        f"""SELECT array_to_string(m, ',') AS members, CAST({s} AS INTEGER) AS size
FROM c{s} c
WHERE NOT EXISTS (
  SELECT 1 FROM (
    SELECT e.dst AS w, COUNT(*) AS cnt FROM ssym e
    WHERE list_contains(c.m, e.src) AND NOT list_contains(c.m, e.dst)
    GROUP BY e.dst) t
  WHERE t.cnt = {s})"""
        for s in range(1, max_size + 1)
    )
    chain = ",\n".join(parts)
    return f"""
WITH {EDGES_CTE},
{chain}
{sel}
"""


def group_degree_sql(k: int = 5) -> str:
    """Exact twin of operators/group.group_degree(k, countGroupNodes=
    False) on the directed link graph: k unrolled greedy steps, each
    computing the EXACT marginal gain |({{u}} u N_out(u)) \\ reachable|-1
    for every non-group vertex and picking (max gain, min id). Matches
    GroupDegree.cpp's incremental recompute algebraically (see
    operators/group.py docstring)."""
    parts = [
        "grp0 AS (SELECT id FROM v WHERE FALSE)",
        "r0 AS (SELECT id FROM v WHERE FALSE)",
    ]
    for s in range(1, k + 1):
        p = s - 1
        parts.append(f"""
g{s} AS (
  SELECT vv.id,
         CAST(COALESCE(c.cnt, 0)
              + CASE WHEN vv.id IN (SELECT id FROM r{p}) THEN 0 ELSE 1 END
              - 1 AS BIGINT) AS gain
  FROM v vv
  LEFT JOIN (SELECT e.src AS id, COUNT(*) AS cnt FROM edges e
             WHERE e.dst NOT IN (SELECT id FROM r{p}) GROUP BY e.src) c
    ON c.id = vv.id
  WHERE vv.id NOT IN (SELECT id FROM grp{p})),
w{s} AS MATERIALIZED (SELECT id, gain FROM g{s} ORDER BY gain DESC, id ASC LIMIT 1),
grp{s} AS MATERIALIZED (SELECT id FROM grp{p} UNION ALL SELECT id FROM w{s}),
r{s} AS MATERIALIZED (
  SELECT id FROM r{p}
  UNION SELECT id FROM w{s}
  UNION SELECT e.dst AS id FROM edges e JOIN w{s} w ON w.id = e.src)""")
    sel = "\nUNION ALL\n".join(
        f'SELECT CAST({s} AS INTEGER) AS "rank", id, gain FROM w{s}'
        for s in range(1, k + 1)
    )
    chain = ",\n".join(parts)
    return f"""
WITH {EDGES_CTE},
{chain}
{sel}
"""


def laplacian_sql() -> str:
    """Exact twin of operators/centrality.laplacian_centrality on the
    undirected link graph (LaplacianCentrality.cpp:15-42 energy-drop
    closed form)."""
    return f"""
WITH {EDGES_CTE},
wdeg AS (SELECT src AS id, CAST(SUM(weight) AS DOUBLE) AS wd FROM sym GROUP BY src),
t AS (SELECT e.src AS id,
             SUM(CAST(e.weight AS DOUBLE) * (e.weight + 2 * w.wd)) AS t
      FROM sym e JOIN wdeg w ON w.id = e.dst GROUP BY e.src)
SELECT v.id,
       COALESCE(w.wd * w.wd, 0.0) + COALESCE(t.t, 0.0) AS score
FROM v
LEFT JOIN wdeg w ON w.id = v.id
LEFT JOIN t ON t.id = v.id
"""


def permanence_sql(modulus: int = 7) -> str:
    """Exact twin of queries.q_permanence_mod7
    (PermanenceCentrality.cpp:137-156): internal strength / max foreign
    strength / degree, minus (1 - intra-community clustering)."""
    return f"""
WITH {EDGES_CTE},
lab AS (SELECT id, id % {modulus} AS label FROM v),
arcs AS (
  SELECT e.src, e.dst, lu.label AS lu, lv.label AS lv
  FROM sym e
  JOIN lab lu ON lu.id = e.src
  JOIN lab lv ON lv.id = e.dst
  WHERE e.src <> e.dst),
st AS (SELECT src, lu, lv, COUNT(*) AS s FROM arcs GROUP BY src, lu, lv),
agg AS (
  SELECT src AS id,
         SUM(CASE WHEN lv = lu THEN s ELSE 0 END) AS internal,
         MAX(CASE WHEN lv <> lu THEN s ELSE 0 END) AS emax,
         SUM(s) AS deg
  FROM st GROUP BY src),
intra AS (SELECT src, dst FROM arcs WHERE lu = lv),
tri AS (
  SELECT a.src AS id, COUNT(*) AS tri
  FROM intra a JOIN intra b ON a.src = b.src AND a.dst < b.dst
  WHERE EXISTS (SELECT 1 FROM sym e WHERE e.src = a.dst AND e.dst = b.dst)
  GROUP BY a.src)
SELECT vv.id,
       ROUND(CASE WHEN agg.deg IS NULL THEN 0.0
       ELSE CAST(agg.internal AS DOUBLE) / GREATEST(agg.emax, 1) / agg.deg
            - (1.0 - CASE WHEN agg.internal >= 2
                     THEN 2.0 * COALESCE(tri.tri, 0) / (agg.internal * (agg.internal - 1))
                     ELSE 0.0 END)
       END, 9) AS permanence
FROM v vv
LEFT JOIN agg ON agg.id = vv.id
LEFT JOIN tri ON tri.id = vv.id
"""


def local_partition_coverage_sql(modulus: int = 7) -> str:
    """Exact twin of queries.q_local_partition_coverage
    (LocalPartitionCoverage.cpp:11-30)."""
    return f"""
WITH {EDGES_CTE},
lab AS (SELECT id, id % {modulus} AS label FROM v),
sc AS (
  SELECT e.src AS id,
         SUM(CASE WHEN lu.label = lv.label THEN CAST(e.weight AS DOUBLE)
             ELSE 0.0 END) / CAST(SUM(e.weight) AS DOUBLE) AS score
  FROM sym e
  JOIN lab lu ON lu.id = e.src
  JOIN lab lv ON lv.id = e.dst
  GROUP BY e.src)
SELECT vv.id, ROUND(COALESCE(sc.score, 0.0), 9) AS score
FROM v vv LEFT JOIN sc ON sc.id = vv.id
"""


def neighborhood_function_sql(max_hops: int = 6) -> str:
    """Exact twin of operators/distances.neighborhood_function
    (NeighborhoodFunction.cpp:28-51): p{h} = ordered pairs within
    distance <= h by closure expansion; a row per REALIZED distance
    (count strictly grew). Diameter beyond max_hops makes the row counts
    disagree loudly (engine emits rows the oracle lacks), never silently
    (measured diameter: 4 at sf0.001, 2 at sf0.01)."""
    parts = ["p1 AS MATERIALIZED (SELECT src, dst FROM sym)"]
    for h in range(2, max_hops + 1):
        parts.append(f"""
p{h} AS MATERIALIZED (
  SELECT src, dst FROM p{h - 1}
  UNION
  SELECT p.src, e.dst FROM p{h - 1} p JOIN sym e ON e.src = p.dst
  WHERE p.src <> e.dst)""")
    sels = [
        "SELECT 1 AS dist, (SELECT CAST(COUNT(*) AS BIGINT) FROM p1) AS n_pairs "
        "WHERE (SELECT COUNT(*) FROM p1) > 0"
    ]
    for h in range(2, max_hops + 1):
        sels.append(
            f"SELECT {h} AS dist, (SELECT CAST(COUNT(*) AS BIGINT) FROM p{h}) AS n_pairs "
            f"WHERE (SELECT COUNT(*) FROM p{h}) > (SELECT COUNT(*) FROM p{h - 1})"
        )
    chain = ",\n".join(parts)
    body = "\nUNION ALL\n".join(sels)
    return f"""
WITH {EDGES_CTE},
{chain}
{body}
"""


def decontaminate_sql(n: int = 5, modulus: int = 17) -> str:
    """Exact twin of queries.q_decontaminate: distinct word-n-gram
    shingles (dedup-suite rule), eval dictionary = docs with doc_id %
    modulus = 0, count of shared shingles per training doc."""
    grams = " || ' ' || ".join(f"w[i+{k}]" for k in range(n))
    return f"""
WITH dw AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents
            WHERE len(string_split(text, ' ')) >= {n}),
sh AS (SELECT DISTINCT doc_id, {grams} AS ngram
       FROM dw, UNNEST(generate_series(1, len(w) - {n - 1})) AS t(i)),
ev AS (SELECT DISTINCT ngram FROM sh WHERE doc_id % {modulus} = 0)
SELECT s.doc_id, CAST(COUNT(*) AS BIGINT) AS n_shared
FROM sh s JOIN ev ON ev.ngram = s.ngram
WHERE s.doc_id % {modulus} <> 0
GROUP BY s.doc_id
"""


def tfidf_sql(top_k: int = 5) -> str:
    """Exact twin of operators/corpus.tf_idf: score rounded to 9
    decimals BEFORE the per-doc rank (ulp-stable tie-break)."""
    return f"""
WITH toks AS (
  SELECT doc_id, UNNEST(string_split(text, ' ')) AS term FROM documents),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term),
dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
nd AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term,
         ROUND(tf.tf * ln((SELECT n FROM nd) / dfreq.df), 9) AS score
  FROM tf JOIN dfreq ON dfreq.term = tf.term)
SELECT doc_id, term, score FROM scored
QUALIFY ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, term ASC) <= {top_k}
"""


def pack_sequences_sql(capacity: int = 256, shards: int = 8) -> str:
    """Exact twin of operators/corpus.pack_sequences: per-shard next-fit
    in doc_id order, replayed row-by-row with a recursive CTE (recursion
    depth = max docs per shard). Bin ids are shard * 2^40 + index."""
    return f"""
WITH RECURSIVE dn AS (
  SELECT doc_id,
         CAST(doc_id % {shards} AS INTEGER) AS shard,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         ROW_NUMBER() OVER (PARTITION BY doc_id % {shards} ORDER BY doc_id) AS rn
  FROM documents),
rec AS (
  SELECT shard, rn, doc_id, n_tokens,
         CAST(1 AS BIGINT) AS bin_idx, n_tokens AS used
  FROM dn WHERE rn = 1
  UNION ALL
  SELECT d.shard, d.rn, d.doc_id, d.n_tokens,
         CASE WHEN r.used + d.n_tokens <= {capacity} THEN r.bin_idx
              ELSE r.bin_idx + 1 END,
         CASE WHEN r.used + d.n_tokens <= {capacity}
              THEN r.used + d.n_tokens ELSE d.n_tokens END
  FROM rec r JOIN dn d ON d.shard = r.shard AND d.rn = r.rn + 1)
SELECT doc_id, shard,
       CAST(shard AS BIGINT) * 1099511627776 + bin_idx AS bin,
       n_tokens
FROM rec
"""


def partition_eval_sql(modulus: int = 7, cc_iters: int = 16) -> str:
    """Exact twin of queries.q_partition_eval_mod7 (formulas from
    EdgeCut.cpp / PartitionHubDominance.cpp / IntrapartitionDensity.cpp
    / IsolatedInterpartition{Conductance,Expansion}.cpp /
    PartitionFragmentation.cpp / StablePartitionNodes.cpp).
    Fragmentation's fragments = hash-min CC unrolled cc_iters times on
    the intra-cluster subgraph (converges in <= diameter steps; a
    too-small unroll fails LOUDLY via value mismatch)."""
    parts = [
        f"lab AS MATERIALIZED (SELECT id, id % {modulus} AS label FROM v)",
        """el AS MATERIALIZED (
  SELECT u.u, u.v, lu.label AS lu, lv.label AS lv, 1.0 AS weight
  FROM und u JOIN lab lu ON lu.id = u.u JOIN lab lv ON lv.id = u.v)""",
        "sizes AS (SELECT label, COUNT(*) AS size FROM lab GROUP BY label)",
        "nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM v)",
        "ec AS (SELECT COALESCE(SUM(CASE WHEN lu <> lv THEN weight END), 0.0) AS val FROM el)",
        """ideg AS (
  SELECT e.src AS id, la.label, COUNT(*) AS d
  FROM sym e JOIN lab la ON la.id = e.src JOIN lab lb ON lb.id = e.dst
  WHERE la.label = lb.label GROUP BY e.src, la.label)""",
        """hub AS (
  SELECT s.label,
         CASE WHEN s.size > 1
              THEN CAST(COALESCE(mi.m, 0) AS DOUBLE) / (s.size - 1)
              ELSE 1.0 END AS val
  FROM sizes s LEFT JOIN (SELECT label, MAX(d) AS m FROM ideg GROUP BY label) mi
    ON mi.label = s.label)""",
        """dens AS (
  SELECT s.label, s.size * (s.size - 1) / 2 AS possible, COALESCE(i.i, 0) AS i
  FROM sizes s LEFT JOIN
    (SELECT lu AS label, COUNT(*) AS i FROM el WHERE lu = lv GROUP BY lu) i
    ON i.label = s.label)""",
        """cv AS (
  SELECT label, SUM(CASE WHEN x THEN weight ELSE 0.0 END) AS cut, SUM(weight) AS vol
  FROM (SELECT lu AS label, weight, lu <> lv AS x FROM el
        UNION ALL SELECT lv, weight, lu <> lv FROM el) GROUP BY label)""",
        "tv AS (SELECT SUM(vol) AS t FROM cv)",
        """iic AS (
  SELECT s.label, CASE WHEN LEAST(c.vol, (SELECT t FROM tv) - c.vol) > 0
         THEN COALESCE(c.cut, 0.0) / LEAST(c.vol, (SELECT t FROM tv) - c.vol)
         ELSE 0.0 END AS val
  FROM sizes s LEFT JOIN cv c ON c.label = s.label)""",
        """iie AS (
  SELECT s.label, CASE WHEN LEAST(s.size, (SELECT n FROM nn) - s.size) > 0
         THEN COALESCE(c.cut, 0.0) / LEAST(s.size, (SELECT n FROM nn) - s.size)
         ELSE 0.0 END AS val
  FROM sizes s LEFT JOIN cv c ON c.label = s.label)""",
        """fi AS MATERIALIZED (
  SELECT u AS src, v AS dst FROM el WHERE lu = lv
  UNION ALL SELECT v, u FROM el WHERE lu = lv AND u <> v)""",
        "f0 AS MATERIALIZED (SELECT id, id AS frag FROM v)",
    ]
    for k in range(1, cc_iters + 1):
        parts.append(f"""f{k} AS MATERIALIZED (SELECT id, MIN(frag) AS frag FROM (
    SELECT id, frag FROM f{k - 1}
    UNION ALL
    SELECT s.dst AS id, f.frag FROM fi s JOIN f{k - 1} f ON f.id = s.src
  ) GROUP BY id)""")
    parts.append(f"""frg AS (
  SELECT s.label, 1.0 - CAST(mf.m AS DOUBLE) / s.size AS val
  FROM sizes s JOIN (
    SELECT l.label, MAX(fs) AS m FROM (
      SELECT l.label, f.frag, COUNT(*) AS fs
      FROM lab l JOIN f{cc_iters} f ON f.id = l.id GROUP BY l.label, f.frag
    ) x JOIN lab l ON TRUE GROUP BY l.label  -- placeholder, replaced below
  ) mf ON mf.label = s.label)""")
    # the placeholder above is wrong; build frg cleanly instead
    parts[-1] = f"""fragsz AS (
  SELECT l.label, f.frag, COUNT(*) AS fs
  FROM lab l JOIN f{cc_iters} f ON f.id = l.id GROUP BY l.label, f.frag),
frg AS (
  SELECT s.label, 1.0 - CAST(mf.m AS DOUBLE) / s.size AS val
  FROM sizes s JOIN (SELECT label, MAX(fs) AS m FROM fragsz GROUP BY label) mf
    ON mf.label = s.label)"""
    parts.append("""lw AS (
  SELECT e.src AS id, lb.label AS lv, SUM(e.weight) AS w,
         MAX(CASE WHEN la.label = lb.label THEN 1 ELSE 0 END) AS own
  FROM sym e JOIN lab la ON la.id = e.src JOIN lab lb ON lb.id = e.dst
  GROUP BY e.src, lb.label)""")
    parts.append("""pn AS (
  SELECT id,
         COALESCE(MAX(CASE WHEN own = 1 THEN w END), 0.0) AS wo,
         COALESCE(MAX(CASE WHEN own = 0 THEN w END), 0.0) AS wm
  FROM lw GROUP BY id)""")
    parts.append("""st AS (
  SELECT vv.id, CASE WHEN pn.id IS NULL THEN TRUE
                     ELSE (pn.wo > 0 AND pn.wm < pn.wo) END AS stable
  FROM v vv LEFT JOIN pn ON pn.id = vv.id)""")
    chain = ",\n".join(parts)
    return f"""
WITH {EDGES_CTE},
{chain}
SELECT ROUND(CAST((SELECT val FROM ec) AS DOUBLE), 9) AS edge_cut,
       ROUND((SELECT AVG(val) FROM hub), 9) AS hub_dominance,
       ROUND((SELECT AVG(CASE WHEN possible > 0
                    THEN CAST(i AS DOUBLE) / possible ELSE 1.0 END) FROM dens), 9)
         AS intra_density,
       ROUND((SELECT CAST(SUM(i) AS DOUBLE) / SUM(possible) FROM dens), 9)
         AS intra_density_global,
       ROUND((SELECT AVG(val) FROM iic), 9) AS iic,
       ROUND((SELECT AVG(val) FROM iie), 9) AS iie,
       ROUND((SELECT AVG(val) FROM frg), 9) AS fragmentation,
       ROUND((SELECT AVG(CAST(stable AS DOUBLE)) FROM st), 9) AS stable_fraction
"""


def partition_compare_sql(ma: int = 5, mb: int = 7) -> str:
    """Exact twin of queries.q_partition_compare (NodeStructuralRand /
    GraphStructuralRand / Jaccard / AdjustedRand dissimilarities over
    the id%ma vs id%mb partitions + intersection cell count)."""
    return f"""
WITH {EDGES_CTE},
lab AS (SELECT id, id % {ma} AS la, id % {mb} AS lb FROM v),
nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM v),
sz AS (SELECT CAST(SUM(s * (s - 1) / 2) AS DOUBLE) AS x
       FROM (SELECT COUNT(*) AS s FROM lab GROUP BY la)),
se AS (SELECT CAST(SUM(s * (s - 1) / 2) AS DOUBLE) AS x
       FROM (SELECT COUNT(*) AS s FROM lab GROUP BY lb)),
si AS (SELECT CAST(SUM(s * (s - 1) / 2) AS DOUBLE) AS x
       FROM (SELECT COUNT(*) AS s FROM lab GROUP BY la, lb)),
cells AS (SELECT CAST(COUNT(*) AS BIGINT) AS c
          FROM (SELECT DISTINCT la, lb FROM lab)),
eg AS (
  SELECT COUNT(*) AS m,
         SUM(CASE WHEN (a.la = b.la AND a.lb = b.lb)
                    OR (a.la <> b.la AND a.lb <> b.lb) THEN 1 ELSE 0 END) AS agree
  FROM und u JOIN lab a ON a.id = u.u JOIN lab b ON b.id = u.v),
s AS (SELECT (SELECT n FROM nn) AS n, (SELECT x FROM sz) AS sz,
             (SELECT x FROM se) AS se, (SELECT x FROM si) AS si)
SELECT
  ROUND(1.0 - 2.0 * (n * (n - 1) / 2.0 + 2.0 * si - (sz + se)) / (n * (n - 1)), 9)
    AS rand_node,
  ROUND(1.0 - CAST((SELECT agree FROM eg) AS DOUBLE) / (SELECT m FROM eg), 9)
    AS rand_graph,
  ROUND(CASE WHEN n * (n - 1) - 2.0 * (n * (n - 1) / 2.0 + si - (sz + se)) > 0
        THEN 1.0 - 2.0 * si
             / (n * (n - 1) - 2.0 * (n * (n - 1) / 2.0 + si - (sz + se)))
        ELSE 0.0 END, 9) AS jaccard,
  ROUND(CASE WHEN 0.5 * (sz + se) = 0
               OR 0.5 * (sz + se) = sz * se / (n * (n - 1) / 2.0) THEN 0.0
        ELSE 1.0 - (si - sz * se / (n * (n - 1) / 2.0))
             / (0.5 * (sz + se) - sz * se / (n * (n - 1) / 2.0)) END, 9)
    AS adjusted_rand,
  (SELECT c FROM cells) AS n_cells
FROM s
"""


def stream_triangles_sql(batches: int = 4) -> str:
    """Exact twin of queries.q_stream_triangles: per prefix b, the
    triangle count over the DISTINCT canonical edges of batches 0..b —
    from-scratch recount, independently validating the operator's
    incremental decomposition."""
    parts = [
        """base AS MATERIALIZED (
  SELECT CAST(FLOOR(event_id * 4 / ((SELECT MAX(event_id) FROM events) + 1)) AS BIGINT) AS batch,
         least(user_id % 601, event_id % 601) AS u,
         greatest(user_id % 601, event_id % 601) AS v
  FROM events
  WHERE (user_id % 601) <> (event_id % 601))"""
    ]
    sels = []
    for b in range(batches):
        parts.append(
            f"e{b} AS MATERIALIZED (SELECT DISTINCT u, v FROM base WHERE batch <= {b})"
        )
        parts.append(f"""t{b} AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS c
  FROM e{b} a JOIN e{b} b2 ON b2.u = a.v JOIN e{b} c2 ON c2.u = a.u AND c2.v = b2.v)""")
        sels.append(f"SELECT CAST({b} AS BIGINT) AS batch, (SELECT c FROM t{b}) AS n_triangles")
    chain = ",\n".join(parts)
    body = "\nUNION ALL\n".join(sels)
    return f"""
WITH {chain}
{body}
"""


def _biconnected_chain(cc_iters: int = CC_ITERS, blk_iters: int = 12,
                       bfs_cap: int = 64) -> str:
    """Shared CTE chain: Tarjan–Vishkin over the min-parent BFS forest —
    the exact relational twin of operators/biconnected.py. Recursive-CTE
    BFS (walk-length capped, dist = MIN), reflexive ancestor closure for
    subtree sizes / low / high, fixed-width path strings for the DFS
    preorder (children in id order — identical to the Spark sweep), and
    min-label + pointer-jumping (covers 2^(blk_iters-1) hops) for the
    block components of the auxiliary graph."""
    # MATERIALIZED copies: the recursive CTEs below would otherwise
    # inline (and re-scan, re-open) the parquet-backed sym/und per
    # iteration — DuckDB leaks one file handle per re-open until the
    # query ends and trips EMFILE.
    parts = [
        "symm AS MATERIALIZED (SELECT src, dst FROM sym)",
        "undm AS MATERIALIZED (SELECT u, v FROM und)",
        "l0 AS (SELECT id, id AS lbl FROM v)",
    ]
    for k in range(1, cc_iters + 1):
        parts.append(
            f"""l{k} AS MATERIALIZED (SELECT id, MIN(lbl) AS lbl FROM (
    SELECT id, lbl FROM l{k - 1}
    UNION ALL
    SELECT s.dst AS id, l.lbl FROM symm s JOIN l{k - 1} l ON l.id = s.src
  ) GROUP BY id)""")
    parts += [
        f"comp AS MATERIALIZED (SELECT id, lbl FROM l{cc_iters})",
        "roots AS (SELECT id FROM comp WHERE id = lbl)",
        f"""bfs(x, d) AS (
  SELECT id AS x, 0 AS d FROM roots
  UNION
  SELECT s.dst AS x, b.d + 1 FROM bfs b JOIN symm s ON s.src = b.x
  WHERE b.d < {bfs_cap})""",
        "dist AS MATERIALIZED (SELECT x AS id, MIN(d) AS lvl FROM bfs GROUP BY x)",
        """tree AS MATERIALIZED (
  SELECT d.id, MIN(s.dst) AS parent
  FROM dist d JOIN symm s ON s.src = d.id
  JOIN dist dp ON dp.id = s.dst AND dp.lvl = d.lvl - 1
  GROUP BY d.id)""",
        """anc(x, a) AS (
  SELECT id AS x, id AS a FROM dist
  UNION
  SELECT an.x, t.parent AS a FROM anc an JOIN tree t ON t.id = an.a)""",
        "nd AS MATERIALIZED (SELECT a AS id, CAST(COUNT(*) AS BIGINT) AS nd FROM anc GROUP BY a)",
        """paths AS MATERIALIZED (
  SELECT an.x AS id,
         STRING_AGG(LPAD(CAST(d2.id AS VARCHAR), 6, '0'), '' ORDER BY d2.lvl) AS pth
  FROM anc an JOIN dist d2 ON d2.id = an.a
  GROUP BY an.x)""",
        """pre AS MATERIALIZED (
  SELECT p.id,
         CAST(RANK() OVER (PARTITION BY c.lbl ORDER BY p.pth) - 1 AS BIGINT) AS pre
  FROM paths p JOIN comp c ON c.id = p.id)""",
        """ntedges AS MATERIALIZED (
  SELECT ue.u, ue.v FROM undm ue
  WHERE NOT EXISTS (
    SELECT 1 FROM tree t
    WHERE least(t.id, t.parent) = ue.u AND greatest(t.id, t.parent) = ue.v))""",
        """ntadj AS (
  SELECT u AS a, v AS b FROM ntedges UNION ALL SELECT v AS a, u AS b FROM ntedges)""",
        """baselh AS MATERIALIZED (
  SELECT p.id,
         LEAST(p.pre, COALESCE(nt.mn, p.pre)) AS blo,
         GREATEST(p.pre, COALESCE(nt.mx, p.pre)) AS bhi
  FROM pre p
  LEFT JOIN (SELECT na.a, MIN(p2.pre) AS mn, MAX(p2.pre) AS mx
             FROM ntadj na JOIN pre p2 ON p2.id = na.b GROUP BY na.a) nt
    ON nt.a = p.id)""",
        """lowhigh AS MATERIALIZED (
  SELECT an.a AS id, MIN(b.blo) AS low, MAX(b.bhi) AS high
  FROM anc an JOIN baselh b ON b.id = an.x GROUP BY an.a)""",
        """info AS MATERIALIZED (
  SELECT d.id, t.parent, p.pre, n.nd, lh.low, lh.high
  FROM dist d
  LEFT JOIN tree t ON t.id = d.id
  JOIN pre p ON p.id = d.id
  JOIN nd n ON n.id = d.id
  JOIN lowhigh lh ON lh.id = d.id)""",
        """aux1 AS (
  SELECT nt.u AS a, nt.v AS b
  FROM ntedges nt
  JOIN info iu ON iu.id = nt.u
  JOIN info iv ON iv.id = nt.v
  WHERE NOT (iu.pre <= iv.pre AND iv.pre < iu.pre + iu.nd)
    AND NOT (iv.pre <= iu.pre AND iu.pre < iv.pre + iv.nd))""",
        """aux2 AS (
  SELECT iv.id AS a, iw.id AS b
  FROM info iw
  JOIN info iv ON iv.id = iw.parent
  WHERE iv.parent IS NOT NULL
    AND (iw.low < iv.pre OR iw.high >= iv.pre + iv.nd))""",
        """auxadj AS (
  SELECT a, b FROM aux1 UNION ALL SELECT b, a FROM aux1
  UNION ALL
  SELECT a, b FROM aux2 UNION ALL SELECT b, a FROM aux2)""",
        "b0 AS (SELECT id, id AS lbl FROM info WHERE parent IS NOT NULL)",
    ]
    for k in range(1, blk_iters + 1):
        parts.append(
            f"""b{k} AS MATERIALIZED (
  SELECT x.id,
         LEAST(x.lbl, COALESCE(nb.m, x.lbl), COALESCE(pj.lbl, x.lbl)) AS lbl
  FROM b{k - 1} x
  LEFT JOIN (SELECT aa.a AS id, MIN(y.lbl) AS m
             FROM auxadj aa JOIN b{k - 1} y ON y.id = aa.b GROUP BY aa.a) nb
    ON nb.id = x.id
  LEFT JOIN b{k - 1} pj ON pj.id = x.lbl)""")
    parts += [
        f"blocks AS MATERIALIZED (SELECT id, lbl AS block FROM b{blk_iters})",
        """treeblk AS (
  SELECT least(t.id, t.parent) AS u, greatest(t.id, t.parent) AS v, b.block
  FROM tree t JOIN blocks b ON b.id = t.id)""",
        """ntblk AS (
  SELECT nt.u, nt.v, b.block
  FROM ntedges nt
  JOIN pre pu ON pu.id = nt.u
  JOIN pre pv ON pv.id = nt.v
  JOIN blocks b ON b.id = CASE WHEN pu.pre > pv.pre THEN nt.u ELSE nt.v END)""",
        """nodeblk AS (
  SELECT DISTINCT id, block FROM (
    SELECT u AS id, block FROM treeblk UNION ALL SELECT v AS id, block FROM treeblk
    UNION ALL
    SELECT u AS id, block FROM ntblk UNION ALL SELECT v AS id, block FROM ntblk))""",
    ]
    return ",\n".join(parts)


def biconnected_node_blocks_sql() -> str:
    return f"""
WITH RECURSIVE {EDGES_CTE},
{_biconnected_chain()}
SELECT vv.id, CAST(COALESCE(c.n, 0) AS BIGINT) AS n_blocks
FROM v vv
LEFT JOIN (SELECT id, COUNT(*) AS n FROM nodeblk GROUP BY id) c ON c.id = vv.id
"""


def biconnected_size_hist_sql() -> str:
    return f"""
WITH RECURSIVE {EDGES_CTE},
{_biconnected_chain()}
SELECT CAST(size AS BIGINT) AS size, CAST(COUNT(*) AS BIGINT) AS n_blocks
FROM (SELECT block, COUNT(DISTINCT id) AS size FROM nodeblk GROUP BY block)
GROUP BY size
"""


def top_closeness_sql(k: int = 10) -> str:
    """Exact full ranking -> top k; 1/farness ordering == ascending
    integer farness, ties by id (the operator's contract)."""
    return f"""
WITH {EDGES_CTE},
{_dists_cte()}
SELECT s AS id, ROUND(1.0 / SUM(dist), 9) AS score
FROM dists GROUP BY s
ORDER BY SUM(dist) ASC, s ASC
LIMIT {k}
"""


def top_harmonic_sql(k: int = 10) -> str:
    return f"""
WITH {EDGES_CTE},
{_dists_cte()}
SELECT s AS id,
       ROUND(SUM(CASE WHEN dist > 0 THEN 1.0 / dist ELSE 0.0 END), 9) AS score
FROM dists GROUP BY s
ORDER BY ROUND(SUM(CASE WHEN dist > 0 THEN 1.0 / dist ELSE 0.0 END), 9) DESC,
         s ASC
LIMIT {k}
"""


_COVERS_CTE = """
covx AS (
  SELECT id, id % 7 AS c FROM v
  UNION ALL
  SELECT id, 7 + id % 11 AS c FROM v WHERE id % 3 = 0
),
covy AS (
  SELECT id, id % 5 AS c FROM v
  UNION ALL
  SELECT id, 5 + id % 13 AS c FROM v WHERE id % 4 = 1
)
""".strip()


def cover_f1_sql() -> str:
    """CoverF1Similarity.cpp twin over the deterministic mod-covers."""
    return f"""
WITH {EDGES_CTE},
{_COVERS_CTE},
cs AS (SELECT c, COUNT(*) AS cs FROM covx GROUP BY c),
rs AS (SELECT c AS s, COUNT(*) AS rs FROM covy GROUP BY c),
ol AS (
  SELECT x.c, y.c AS s, COUNT(*) AS ol
  FROM covx x JOIN covy y ON y.id = x.id
  GROUP BY x.c, y.c
),
best AS (
  SELECT o.c,
         MAX(2.0 * (o.ol * 1.0 / rs.rs) * (o.ol * 1.0 / cs.cs)
             / (o.ol * 1.0 / rs.rs + o.ol * 1.0 / cs.cs)) AS best
  FROM ol o JOIN cs ON cs.c = o.c JOIN rs ON rs.s = o.s
  GROUP BY o.c
),
vals AS (
  SELECT cs.c, cs.cs, COALESCE(b.best, 0.0) AS best
  FROM cs LEFT JOIN best b ON b.c = cs.c
)
SELECT ROUND(AVG(best), 9) AS unweighted_avg,
       ROUND(SUM(best * cs) / SUM(cs), 9) AS weighted_avg,
       ROUND(MIN(best), 9) AS min_value,
       ROUND(MAX(best), 9) AS max_value,
       CAST(COUNT(*) AS BIGINT) AS n_clusters
FROM vals
"""


def cover_hub_dominance_sql() -> str:
    """CoverHubDominance.cpp twin: per cluster, max internal degree over
    (size - 1); singletons score 1."""
    return f"""
WITH {EDGES_CTE},
{_COVERS_CTE},
internal AS (
  SELECT x.c, x.id, COUNT(*) AS ideg
  FROM covx x
  JOIN sym s ON s.src = x.id
  JOIN covx x2 ON x2.id = s.dst AND x2.c = x.c
  GROUP BY x.c, x.id
),
mx AS (SELECT c, MAX(ideg) AS maxdeg FROM internal GROUP BY c),
cs AS (SELECT c, COUNT(*) AS cs FROM covx GROUP BY c),
vals AS (
  SELECT cs.c, cs.cs,
         CASE WHEN cs.cs > 1
              THEN COALESCE(m.maxdeg, 0) * 1.0 / (cs.cs - 1)
              ELSE 1.0 END AS dom
  FROM cs LEFT JOIN mx m ON m.c = cs.c
)
SELECT ROUND(AVG(dom), 9) AS unweighted_avg,
       ROUND(SUM(dom * cs) / SUM(cs), 9) AS weighted_avg,
       ROUND(MIN(dom), 9) AS min_value,
       ROUND(MAX(dom), 9) AS max_value,
       CAST(COUNT(*) AS BIGINT) AS n_clusters
FROM vals
"""


def overlapping_nmi_sql() -> str:
    """OverlappingNMIDistance.cpp twin (McDaid adjusted conditional
    entropies, all five normalizations). h(w,n) = -w*log2(w/n)."""
    hexpr = "CASE WHEN {w} > 0 THEN -({w}) * LOG2(({w}) * 1.0 / nn.n) ELSE 0.0 END"

    def h(w):
        return hexpr.format(w=w)

    return f"""
WITH {EDGES_CTE},
{_COVERS_CTE},
nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM v),
xs AS (SELECT c AS i, CAST(COUNT(*) AS DOUBLE) AS xi FROM covx GROUP BY c),
ys AS (SELECT c AS j, CAST(COUNT(*) AS DOUBLE) AS yj FROM covy GROUP BY c),
inter AS (
  SELECT x.c AS i, y.c AS j, CAST(COUNT(*) AS DOUBLE) AS d
  FROM covx x JOIN covy y ON y.id = x.id
  GROUP BY x.c, y.c
),
star AS (
  SELECT it.i, it.j,
         CASE WHEN {h("nn.n + it.d - xs.xi - ys.yj")} + {h("it.d")}
                   >= {h("ys.yj - it.d")} + {h("xs.xi - it.d")}
              THEN ({h("nn.n + it.d - xs.xi - ys.yj")} + {h("ys.yj - it.d")}
                    + {h("xs.xi - it.d")} + {h("it.d")})
                   - ({h("ys.yj")} + {h("nn.n - ys.yj")})
              ELSE {h("xs.xi")} + {h("nn.n - xs.xi")}
         END AS hstar
  FROM inter it JOIN xs ON xs.i = it.i JOIN ys ON ys.j = it.j, nn
),
condx AS (
  SELECT xs.i,
         {h("xs.xi")} + {h("nn.n - xs.xi")} AS hx_i,
         LEAST({h("xs.xi")} + {h("nn.n - xs.xi")},
               COALESCE(m.mn, {h("xs.xi")} + {h("nn.n - xs.xi")})) AS cond
  FROM xs LEFT JOIN (SELECT i, MIN(hstar) AS mn FROM star GROUP BY i) m
    ON m.i = xs.i, nn
),
stary AS (
  SELECT it.j, it.i,
         CASE WHEN {h("nn.n + it.d - ys.yj - xs.xi")} + {h("it.d")}
                   >= {h("xs.xi - it.d")} + {h("ys.yj - it.d")}
              THEN ({h("nn.n + it.d - ys.yj - xs.xi")} + {h("xs.xi - it.d")}
                    + {h("ys.yj - it.d")} + {h("it.d")})
                   - ({h("xs.xi")} + {h("nn.n - xs.xi")})
              ELSE {h("ys.yj")} + {h("nn.n - ys.yj")}
         END AS hstar
  FROM inter it JOIN xs ON xs.i = it.i JOIN ys ON ys.j = it.j, nn
),
condy AS (
  SELECT ys.j,
         {h("ys.yj")} + {h("nn.n - ys.yj")} AS hy_j,
         LEAST({h("ys.yj")} + {h("nn.n - ys.yj")},
               COALESCE(m.mn, {h("ys.yj")} + {h("nn.n - ys.yj")})) AS cond
  FROM ys LEFT JOIN (SELECT j, MIN(hstar) AS mn FROM stary GROUP BY j) m
    ON m.j = ys.j, nn
),
agg AS (
  SELECT (SELECT SUM(hx_i) FROM condx) AS hx,
         (SELECT SUM(cond) FROM condx) AS hxgy,
         (SELECT SUM(hy_j) FROM condy) AS hy,
         (SELECT SUM(cond) FROM condy) AS hygx
),
mi AS (
  SELECT hx, hy,
         GREATEST(LEAST(0.5 * ((hx - hxgy) + (hy - hygx)), LEAST(hx, hy)), 0.0)
           AS mi
  FROM agg
)
SELECT
  ROUND(1.0 - CASE WHEN hx = 0.0 AND hy = 0.0 THEN 1.0
                   WHEN hx = 0.0 OR hy = 0.0 THEN 0.0
                   ELSE mi / LEAST(hx, hy) END, 9) AS dist_min,
  ROUND(1.0 - CASE WHEN hx = 0.0 AND hy = 0.0 THEN 1.0
                   WHEN hx = 0.0 OR hy = 0.0 THEN 0.0
                   ELSE mi / SQRT(hx * hy) END, 9) AS dist_geometric_mean,
  ROUND(1.0 - CASE WHEN hx = 0.0 AND hy = 0.0 THEN 1.0
                   ELSE mi / ((hx + hy) / 2.0) END, 9) AS dist_arithmetic_mean,
  ROUND(1.0 - CASE WHEN hx = 0.0 AND hy = 0.0 THEN 1.0
                   ELSE mi / GREATEST(hx, hy) END, 9) AS dist_max,
  ROUND(1.0 - CASE WHEN hx = 0.0 AND hy = 0.0 THEN 1.0
                   ELSE mi / (hx + hy - mi) END, 9) AS dist_joint_entropy
FROM mi
"""


def kpath_sql(k: int = 6, t: int = 20000, seed: int = 1) -> str:
    """Exact replay of operators/kpath.py (KPathCentrality.cpp:34-100
    semantics): stratified starts over ranked ids, per-step arg-min of
    the shared walk-hash draw over unvisited neighbors. The pick key is
    (h3+1)*1024 + dst — the integer the draw was built from — so the
    comparison is bit-exact (the Spark side's struct-min on (u, dst)
    orders identically because u = (h3+1)/1000000008 is an exact
    double for h3 < 2^53)."""
    parts = [
        "symm AS MATERIALIZED (SELECT src, dst FROM sym)",
        "nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM v)",
        """ranked AS MATERIALIZED (
  SELECT id, ROW_NUMBER() OVER (ORDER BY id) - 1 AS rk FROM v)""",
        f"""w0 AS MATERIALIZED (
  SELECT g.range AS wid, r.id AS cur, [r.id] AS vis,
         CAST(1 + FLOOR({_walk_u_sql('g.range', 0, '0', seed)} * {k}) AS BIGINT) AS l
  FROM range({t}) g
  JOIN ranked r ON r.rk = g.range % (SELECT n FROM nn))""",
    ]
    for j in range(1, k + 1):
        u = _walk_u_sql("s.wid", j, "e.dst", seed)
        parts.append(f"""c{j} AS (
  SELECT s.wid,
         CAST(ROUND({u} * 1000000008.0) AS BIGINT) * 1024 + e.dst AS key
  FROM w{j - 1} s JOIN symm e ON e.src = s.cur
  WHERE s.l >= {j} AND NOT list_contains(s.vis, e.dst))""")
        parts.append(f"p{j} AS (SELECT wid, MIN(key) AS mk FROM c{j} GROUP BY wid)")
        parts.append(f"""w{j} AS MATERIALIZED (
  SELECT s.wid,
         COALESCE(p.mk % 1024, s.cur) AS cur,
         CASE WHEN p.mk IS NOT NULL THEN list_append(s.vis, p.mk % 1024)
              ELSE s.vis END AS vis,
         CASE WHEN p.mk IS NULL THEN 0 ELSE s.l END AS l
  FROM w{j - 1} s LEFT JOIN p{j} p USING (wid))""")
    parts.append(f"""counts AS (
  SELECT x.id, CAST(COUNT(*) AS BIGINT) AS c
  FROM (SELECT UNNEST(vis[2:]) AS id FROM w{k}) x
  GROUP BY x.id)""")
    body = ",\n".join(parts)
    return f"""
WITH {EDGES_CTE},
{body}
SELECT vv.id,
       ROUND({float(k)} * (SELECT n FROM nn) / {t} * COALESCE(c.c, 0), 9)
         AS score
FROM v vv LEFT JOIN counts c ON c.id = vv.id
"""


def hop_plot_sql(max_hops: int = 6) -> str:
    """nf twin normalized by its maximum (exact hop plot)."""
    inner = neighborhood_function_sql(max_hops).strip()
    return f"""
SELECT dist, ROUND(n_pairs * 1.0 / (MAX(n_pairs) OVER ()), 9) AS hp
FROM ({inner})
"""


def graph_difference_sql() -> str:
    """GraphDifference.cpp twin on the deterministic perturbation
    (drop (u+v)%9==0 edges, add the (i, 5i+7 mod n) chords). Vertex
    sets are identical by construction, so node events are 0."""
    return f"""
WITH {EDGES_CTE},
e1 AS (SELECT u, v FROM und),
chords AS (
  SELECT DISTINCT least(id, (id * 5 + 7) % {_M}) AS u,
                  greatest(id, (id * 5 + 7) % {_M}) AS v
  FROM v
  WHERE least(id, (id * 5 + 7) % {_M}) <> greatest(id, (id * 5 + 7) % {_M})
),
e2 AS (
  SELECT DISTINCT u, v FROM (
    SELECT u, v FROM und WHERE (u + v) % 9 <> 0
    UNION ALL
    SELECT u, v FROM chords
  )
),
rem AS (SELECT COUNT(*) AS c FROM e1 WHERE NOT EXISTS
        (SELECT 1 FROM e2 WHERE e2.u = e1.u AND e2.v = e1.v)),
add_ AS (SELECT COUNT(*) AS c FROM e2 WHERE NOT EXISTS
        (SELECT 1 FROM e1 WHERE e1.u = e2.u AND e1.v = e2.v))
SELECT CAST((SELECT c FROM rem) AS BIGINT) AS edge_removals,
       CAST((SELECT c FROM add_) AS BIGINT) AS edge_additions,
       CAST(0 AS BIGINT) AS weight_updates,
       CAST(0 AS BIGINT) AS node_removals,
       CAST(0 AS BIGINT) AS node_additions,
       CAST((SELECT c FROM rem) + (SELECT c FROM add_) AS BIGINT) AS total_edits
"""


def simple_paths_sql() -> str:
    """AllSimplePaths twin, cutoff 3, between the two smallest vertex
    ids: explicit join unroll per length with distinctness filters."""
    return f"""
WITH {EDGES_CTE},
st AS (
  SELECT MIN(id) AS s,
         (SELECT MIN(id) FROM v WHERE id > (SELECT MIN(id) FROM v)) AS t
  FROM v
),
l1 AS (
  SELECT CAST(1 AS BIGINT) AS length, CAST(COUNT(*) AS BIGINT) AS n_paths
  FROM sym, st WHERE sym.src = st.s AND sym.dst = st.t
),
l2 AS (
  SELECT CAST(2 AS BIGINT) AS length, CAST(COUNT(*) AS BIGINT) AS n_paths
  FROM sym a JOIN sym b ON b.src = a.dst, st
  WHERE a.src = st.s AND b.dst = st.t
    AND a.dst <> st.s AND a.dst <> st.t
),
l3 AS (
  SELECT CAST(3 AS BIGINT) AS length, CAST(COUNT(*) AS BIGINT) AS n_paths
  FROM sym a JOIN sym b ON b.src = a.dst JOIN sym c ON c.src = b.dst, st
  WHERE a.src = st.s AND c.dst = st.t
    AND a.dst <> st.s AND a.dst <> st.t
    AND b.dst <> st.s AND b.dst <> st.t AND b.dst <> a.dst
)
SELECT * FROM (
  SELECT * FROM l1 UNION ALL SELECT * FROM l2 UNION ALL SELECT * FROM l3
) WHERE n_paths > 0
"""


_EDGE_TRI_CTE = """
sides AS (
  SELECT least(a, b) AS u, greatest(a, b) AS v FROM tri
  UNION ALL SELECT least(b, c), greatest(b, c) FROM tri
  UNION ALL SELECT least(a, c), greatest(a, c) FROM tri
),
tcnt AS (SELECT u, v, COUNT(*) AS c FROM sides GROUP BY u, v),
etd AS (
  SELECT e.u, e.v, CAST(COALESCE(tcnt.c, 0) AS DOUBLE) AS t,
         du.degree AS du, dv.degree AS dv
  FROM und e
  LEFT JOIN tcnt ON tcnt.u = e.u AND tcnt.v = e.v
  JOIN deg du ON du.id = e.u
  JOIN deg dv ON dv.id = e.v
)
""".strip()


def local_similarity_sql() -> str:
    """LocalSimilarityScore.cpp twin: row_number per endpoint over
    (jaccard sim DESC, alter ASC), e = 1 - ln(rank)/ln(deg)."""
    return f"""
WITH {EDGES_CTE},
{TRI_CTE},
{_EDGE_TRI_CTE},
views AS (
  SELECT u AS node, v AS alter, t / (du + dv - t) AS sim, du AS d FROM etd
  UNION ALL
  SELECT v AS node, u AS alter, t / (du + dv - t) AS sim, dv AS d FROM etd
),
ranked AS (
  SELECT node, alter, d,
         ROW_NUMBER() OVER (PARTITION BY node ORDER BY sim DESC, alter ASC) AS rn
  FROM views
),
scored AS (
  SELECT least(node, alter) AS u, greatest(node, alter) AS v,
         CASE WHEN d <= 1 THEN 1.0 ELSE 1.0 - LN(rn) / LN(d) END AS e
  FROM ranked
)
SELECT u, v, ROUND(MAX(e), 9) AS score FROM scored GROUP BY u, v
"""


def multiscale_sql() -> str:
    return f"""
WITH {EDGES_CTE},
pn AS (SELECT src AS node, SUM(weight) AS s, COUNT(*) AS d
       FROM sym GROUP BY src),
views AS (
  SELECT s2.src AS node, s2.dst AS nbr,
         1.0 - POW(1.0 - s2.weight / pn.s, pn.d - 1.0) AS p
  FROM sym s2 JOIN pn ON pn.node = s2.src
)
SELECT least(node, nbr) AS u, greatest(node, nbr) AS v,
       ROUND(MAX(p), 9) AS score
FROM views GROUP BY least(node, nbr), greatest(node, nbr)
"""


def chance_triangle_sql() -> str:
    return f"""
WITH {EDGES_CTE},
{TRI_CTE},
{_EDGE_TRI_CTE},
nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM v)
SELECT u, v,
       ROUND(CASE WHEN t > 0
                  THEN t * ((SELECT n FROM nn) - 2) / ((du - 1.0) * (dv - 1.0))
                  WHEN du = 1 OR dv = 1 THEN 1.0
                  ELSE 0.0 END, 9) AS score
FROM etd
"""


def commute_time_cycle_sql() -> str:
    """Closed form for the 24-cycle the Spark query builds over the 24
    smallest vertex ids: effective resistance between nodes j apart is
    j·(n−j)/n, vol = 2n, so ctd = sqrt(2·j·(n−j)) — exact, no solver."""
    return f"""
WITH {EDGES_CTE},
ranked AS (
  SELECT id, row_number() OVER (ORDER BY id) - 1 AS rk FROM v
),
s0 AS (SELECT id AS s FROM ranked WHERE rk = 0),
tgt AS (SELECT rk, id AS t FROM ranked WHERE rk IN (1, 3, 6, 12))
SELECT s0.s AS s, tgt.t AS t,
       ROUND(sqrt(2.0 * tgt.rk * (24 - tgt.rk)), 6) AS ctd
FROM s0 CROSS JOIN tgt
"""


LOLLIPOP_CTE = f"""
{EDGES_CTE},
ranked AS (
  SELECT id, row_number() OVER (ORDER BY id) - 1 AS rk FROM v
  QUALIFY rk < 18
)
""".strip()


def spanning_edge_lollipop_sql() -> str:
    """Closed form on the lollipop the Spark query builds (12-cycle over
    ranks 0..11 + pendant 6-path attached at rank 0): cycle edges have
    effective resistance (c−1)/c = 11/12, bridge/path edges exactly 1."""
    return f"""
WITH {LOLLIPOP_CTE},
lolli AS (
  -- cycle edges (rank i) -- (rank (i+1) mod 12), then bridge + path
  SELECT a.id AS x, b.id AS y, ROUND(11.0 / 12.0, 6) AS score
  FROM ranked a JOIN ranked b ON b.rk = (a.rk + 1) % 12
  WHERE a.rk < 12 AND b.rk < 12
  UNION ALL
  SELECT a.id AS x, b.id AS y, 1.0 AS score
  FROM ranked a JOIN ranked b
    ON (a.rk = 0 AND b.rk = 12) OR (b.rk = a.rk + 1 AND a.rk >= 12)
)
SELECT least(x, y) AS u, greatest(x, y) AS v, score FROM lolli
"""


def electrical_closeness_lollipop_sql() -> str:
    """farness(u) = Σ_v r(u,v) from the lollipop's closed-form pairwise
    resistances (series/parallel): cycle-cycle d(12−d)/12, path-path
    |i−j|, mixed r_cycle(i,0) + path hops; score = (n−1)/farness."""
    return f"""
WITH {LOLLIPOP_CTE},
pairres AS (
  SELECT a.id AS id, a.rk AS i, b.rk AS j,
         CASE
           WHEN a.rk < 12 AND b.rk < 12 THEN
             least(abs(a.rk - b.rk), 12 - abs(a.rk - b.rk))
             * (12 - least(abs(a.rk - b.rk), 12 - abs(a.rk - b.rk))) / 12.0
           WHEN a.rk >= 12 AND b.rk >= 12 THEN abs(a.rk - b.rk) * 1.0
           WHEN a.rk < 12 THEN
             least(a.rk, 12 - a.rk) * (12 - least(a.rk, 12 - a.rk)) / 12.0
             + (b.rk - 11)
           ELSE
             least(b.rk, 12 - b.rk) * (12 - least(b.rk, 12 - b.rk)) / 12.0
             + (a.rk - 11)
         END AS r
  FROM ranked a JOIN ranked b ON a.rk <> b.rk
)
SELECT id, ROUND(17.0 / SUM(r), 6) AS score
FROM pairres GROUP BY id
"""


def _group_greedy_rounds_sql(k: int, harmonic: bool) -> str:
    """Unrolled k-round greedy twin of operators/groupcentrality: pick
    p1..pk with the same (gain DESC, id ASC) rule, maintaining d{i} =
    dist(v, S_i) over the seed component (closeness) / the union of
    reached sets (harmonic)."""
    inv = "CASE WHEN {x} > 0 THEN 1.0 / {x} ELSE 0.0 END"
    parts = []
    if harmonic:
        parts.append(
            "h0 AS (SELECT s, SUM(" + inv.format(x="dist")
            + ") AS h FROM dists GROUP BY s)"
        )
        parts.append("p1 AS (SELECT s FROM h0 ORDER BY h DESC, s ASC LIMIT 1)")
    else:
        parts.append(
            "far0 AS (SELECT s, SUM(dist) AS far, COUNT(*) AS r"
            " FROM dists GROUP BY s)"
        )
        parts.append(
            "p1 AS (SELECT s FROM far0 WHERE r > 1"
            " ORDER BY far / ((r - 1.0) * (r - 1.0)) ASC, s ASC LIMIT 1)"
        )
    parts.append(
        "d1 AS (SELECT id, dist AS d FROM dists WHERE s = (SELECT s FROM p1))"
    )
    for i in range(2, k + 1):
        members = " UNION ALL ".join(f"SELECT s FROM p{j}" for j in range(1, i))
        prev = f"d{i - 1}"
        if harmonic:
            newd = f"LEAST(COALESCE({prev}.d, dd.dist), dd.dist)"
            term = (
                inv.format(x=newd) + " - CASE WHEN " + prev + ".d IS NOT NULL"
                " AND " + prev + ".d > 0 THEN 1.0 / " + prev + ".d ELSE 0.0 END"
            )
            parts.append(
                f"g{i} AS (SELECT dd.s, SUM({term}) AS gain FROM dists dd"
                f" LEFT JOIN {prev} ON dd.id = {prev}.id"
                f" WHERE dd.s NOT IN ({members}) GROUP BY dd.s)"
            )
        else:
            parts.append(
                f"g{i} AS (SELECT dd.s, SUM(GREATEST(0, {prev}.d - dd.dist))"
                f" AS gain FROM dists dd JOIN {prev} ON dd.id = {prev}.id"
                f" WHERE dd.s NOT IN ({members}) GROUP BY dd.s)"
            )
        parts.append(
            f"p{i} AS (SELECT s FROM g{i} ORDER BY gain DESC, s ASC LIMIT 1)"
        )
        if harmonic:
            parts.append(
                f"d{i} AS (SELECT COALESCE({prev}.id, dd.id) AS id,"
                f" LEAST(COALESCE({prev}.d, dd.dist), COALESCE(dd.dist,"
                f" {prev}.d)) AS d FROM {prev} FULL JOIN"
                f" (SELECT id, dist FROM dists WHERE s = (SELECT s FROM p{i}))"
                f" dd ON dd.id = {prev}.id)"
            )
        else:
            parts.append(
                f"d{i} AS (SELECT {prev}.id,"
                f" LEAST({prev}.d, COALESCE(dd.dist, {prev}.d)) AS d"
                f" FROM {prev} LEFT JOIN"
                f" (SELECT id, dist FROM dists WHERE s = (SELECT s FROM p{i}))"
                f" dd ON dd.id = {prev}.id)"
            )
    return ",\n".join(parts)


def group_closeness_sql(k: int = 4) -> str:
    rounds = _group_greedy_rounds_sql(k, harmonic=False)
    picks = "\nUNION ALL\n".join(
        f"SELECT CAST({i} AS INTEGER) AS ord, s AS id FROM p{i}"
        for i in range(1, k + 1)
    )
    return f"""
WITH {EDGES_CTE},
{_dists_cte()},
{rounds},
sc AS (SELECT ROUND(((SELECT COUNT(*) FROM v) - {k}.0) / SUM(d), 9) AS score
       FROM d{k})
SELECT ord, id, (SELECT score FROM sc) AS score FROM ({picks})
"""


def group_harmonic_sql(k: int = 4) -> str:
    rounds = _group_greedy_rounds_sql(k, harmonic=True)
    picks = "\nUNION ALL\n".join(
        f"SELECT CAST({i} AS INTEGER) AS ord, s AS id FROM p{i}"
        for i in range(1, k + 1)
    )
    return f"""
WITH {EDGES_CTE},
{_dists_cte()},
{rounds},
sc AS (SELECT ROUND(SUM(CASE WHEN d > 0 THEN 1.0 / d ELSE 0.0 END), 9)
       AS score FROM d{k})
SELECT ord, id, (SELECT score FROM sc) AS score FROM ({picks})
"""


def forest_closeness_cliques_sql() -> str:
    """Closed form for the disjoint K12 ∪ K6 the Spark query builds:
    diag(Ω) of K_c is 2/(c+1), row sums of Ω are 1, so
    score(u) = n / (n·2/(c_u+1) + tr − 2) with n = 18 and
    tr = 12·2/13 + 6·2/7."""
    return f"""
WITH {LOLLIPOP_CTE}
SELECT id,
       ROUND(18.0 / (18.0 * (CASE WHEN rk < 12 THEN 2.0/13.0
                                  ELSE 2.0/7.0 END)
                     + (12.0 * 2.0/13.0 + 6.0 * 2.0/7.0) - 2.0), 6) AS score
FROM ranked
"""


def _complex_contagion_cte(threshold: int = 3, rounds: int = 6) -> str:
    """Unrolled replay of complexPathsGraph's synchronous fixed point
    (ComplexPaths.cpp:127-171): contributor set c{r}, complex edges =
    und edges incident to it, influence = complex degree. Extra rounds
    past the true fixed point are idempotent, so `rounds` only needs to
    be an upper bound (measured: 1 round at sf0.001, 3 at sf0.01)."""
    parts = [f"""seed AS MATERIALIZED (SELECT MIN(id) AS s FROM v),
nb AS MATERIALIZED (SELECT dst AS id FROM sym, seed WHERE src = s
       ORDER BY dst LIMIT {threshold - 1}),
c0 AS MATERIALIZED (SELECT s AS id, 0 AS "round" FROM seed
       UNION SELECT id, 0 FROM nb)"""]
    for r in range(1, rounds + 1):
        parts.append(f"""ce{r} AS MATERIALIZED (
  SELECT u, v FROM und
  WHERE u IN (SELECT id FROM c{r - 1}) OR v IN (SELECT id FROM c{r - 1})
),
inf{r} AS MATERIALIZED (
  SELECT id, COUNT(*) AS c FROM (
    SELECT u AS id FROM ce{r} UNION ALL SELECT v AS id FROM ce{r}
  ) GROUP BY id
),
c{r} AS MATERIALIZED (
  SELECT id, "round" FROM c{r - 1}
  UNION ALL
  SELECT id, {r} AS "round" FROM inf{r}
  WHERE c >= {threshold} AND id NOT IN (SELECT id FROM c{r - 1})
)""")
    return ",\n".join(parts)


def complex_paths_adopters_sql(threshold: int = 3, rounds: int = 6) -> str:
    return f"""
WITH {EDGES_CTE},
{_complex_contagion_cte(threshold, rounds)}
SELECT id, CAST("round" AS INT) AS "round" FROM c{rounds}
"""


def complex_path_length_sql(
    threshold: int = 3, rounds: int = 6, cap: int = 64
) -> str:
    """PLci of the seed: BFS on the fixed-point complex graph via a
    bounded recursive CTE (cap ≫ measured eccentricity; UNION dedups
    (id, d) pairs so the state stays O(n·cap)); unreachable vertices
    contribute 0 via the SUM-over-reached / n form."""
    return f"""
WITH RECURSIVE {EDGES_CTE},
{_complex_contagion_cte(threshold, rounds)},
cef AS MATERIALIZED (
  SELECT u, v FROM und
  WHERE u IN (SELECT id FROM c{rounds}) OR v IN (SELECT id FROM c{rounds})
),
csym AS (
  SELECT u AS src, v AS dst FROM cef
  UNION ALL SELECT v AS src, u AS dst FROM cef
),
reach(id, d) AS (
  SELECT s, 0 FROM seed
  UNION
  SELECT csym.dst, reach.d + 1
  FROM reach JOIN csym ON csym.src = reach.id
  WHERE reach.d < {cap}
),
dist AS (SELECT id, MIN(d) AS d FROM reach GROUP BY id)
SELECT (SELECT s FROM seed) AS id,
       ROUND(SUM(d) * 1.0 / (SELECT COUNT(*) FROM v), 9) AS plci
FROM dist
"""


_D2_CAND_CTE = """
nbr AS MATERIALIZED (SELECT src AS u, dst AS w FROM sym),
degq AS MATERIALIZED (
  SELECT src AS id, CAST(COUNT(*) AS DOUBLE) AS deg FROM sym GROUP BY src),
cand AS MATERIALIZED (
  SELECT DISTINCT a.u AS u, b.u AS v
  FROM nbr a JOIN nbr b ON a.w = b.w AND a.u < b.u
  WHERE NOT EXISTS (SELECT 1 FROM und e WHERE e.u = a.u AND e.v = b.u)
    AND (a.u * 7 + b.u) % 101 = 0
)
""".strip()


def link_pred_extended_sql() -> str:
    """Twin of queries.q_link_pred_extended — including the reference
    AdjustedRandIndex set_union quirk (b == c == |union|)."""
    return f"""
WITH {EDGES_CTE},
{_D2_CAND_CTE},
cn AS (
  SELECT c.u, c.v, CAST(COUNT(*) AS DOUBLE) AS a
  FROM cand c JOIN nbr x ON x.u = c.u JOIN nbr y ON y.u = c.v AND y.w = x.w
  GROUP BY c.u, c.v
),
conn AS (
  SELECT c.u, c.v, CAST(COUNT(*) AS DOUBLE) AS conn
  FROM cand c
  JOIN nbr x ON x.u = c.u
  JOIN nbr y ON y.u = c.v
  WHERE EXISTS (SELECT 1 FROM sym s WHERE s.src = x.w AND s.dst = y.w)
  GROUP BY c.u, c.v
),
base AS (
  SELECT c.u, c.v,
         COALESCE(cn.a, 0.0) AS a,
         du.deg AS du, dv.deg AS dv,
         COALESCE(conn.conn, 0.0) AS conn,
         du.deg + dv.deg - COALESCE(cn.a, 0.0) AS uni,
         (SELECT COUNT(*) FROM v) - (du.deg + dv.deg - COALESCE(cn.a, 0.0)) AS d
  FROM cand c
  LEFT JOIN cn ON cn.u = c.u AND cn.v = c.v
  LEFT JOIN conn ON conn.u = c.u AND conn.v = c.v
  JOIN degq du ON du.id = c.u
  JOIN degq dv ON dv.id = c.v
)
SELECT u, v,
       ROUND(CASE WHEN (a*uni + a*uni + 2*a*d + uni*uni + uni*d + uni*uni + uni*d) = 0
                  THEN 0.0
                  ELSE 2 * (a*d - uni*uni)
                       / (a*uni + a*uni + 2*a*d + uni*uni + uni*d + uni*uni + uni*d)
             END, 9) AS adjusted_rand,
       ROUND(CASE WHEN du * dv > 0 THEN a / SQRT(du * dv) ELSE 0.0 END, 9)
         AS neighborhood_distance,
       uni AS total_neighbors,
       a + conn AS neighbors_measure,
       du AS u_degree,
       dv AS v_degree,
       CAST(CASE WHEN u % 7 = v % 7 THEN 1.0 ELSE 0.0 END AS DOUBLE) AS same_community
FROM base
"""


def link_pred_katz_sql(max_path_length: int = 3, damping: float = 0.1) -> str:
    """Twin of queries.q_link_pred_katz: per-pair start = smaller-degree
    endpoint (ties -> u), walk counts advanced L times, damping powers
    pre-computed in Python so both engines multiply the SAME doubles."""
    parts = [
        "starts AS MATERIALIZED (SELECT DISTINCT CASE WHEN du.deg > dv.deg "
        "THEN c.v ELSE c.u END AS s FROM cand c "
        "JOIN degq du ON du.id = c.u JOIN degq dv ON dv.id = c.v)",
        "w0 AS MATERIALIZED (SELECT s, s AS id, CAST(1.0 AS DOUBLE) AS cnt FROM starts)",
    ]
    for l in range(1, max_path_length + 1):
        parts.append(
            f"w{l} AS MATERIALIZED (SELECT w.s, e.dst AS id, SUM(w.cnt) AS cnt "
            f"FROM w{l - 1} w JOIN sym e ON e.src = w.id GROUP BY w.s, e.dst)"
        )
    contribs = " UNION ALL ".join(
        f"SELECT s, id, CAST({damping ** l!r} AS DOUBLE) * cnt AS sc FROM w{l}"
        for l in range(1, max_path_length + 1)
    )
    return f"""
WITH {EDGES_CTE},
{_D2_CAND_CTE},
{", ".join(parts)},
scores AS (SELECT s, id, SUM(sc) AS score FROM ({contribs}) GROUP BY s, id),
orient AS (
  SELECT c.u, c.v,
         CASE WHEN du.deg > dv.deg THEN c.v ELSE c.u END AS s,
         CASE WHEN du.deg > dv.deg THEN c.u ELSE c.v END AS e
  FROM cand c JOIN degq du ON du.id = c.u JOIN degq dv ON dv.id = c.v
)
SELECT o.u, o.v, ROUND(COALESCE(sc.score, 0.0), 9) AS score
FROM orient o LEFT JOIN scores sc ON sc.s = o.s AND sc.id = o.e
"""


def adi_pair_scores_sql(
    num_systems: int = 3, num_iters: int = 4, omega: float = 0.5,
    seed: int = 1, norm: int = 2,
) -> str:
    """Twin of queries.q_adi_pair_scores: the algebraic-distance Jacobi
    chain WITHOUT the per-system normalization (AlgebraicDistanceIndex
    semantics), p-norm over systems on the distance-2 pairs."""
    sys_vals = ", ".join(f"({s})" for s in range(num_systems))
    parts = [
        f"sysx AS (SELECT * FROM (VALUES {sys_vals}) s(sys))",
        "wdeg AS MATERIALIZED (SELECT src AS id, SUM(weight) AS wdeg FROM sym GROUP BY src)",
        f"""l0 AS MATERIALIZED (SELECT id, sys,
    ('0x' || substring(md5('ad|{seed}|' || id || '|' || sys), 1, 8))::BIGINT
      / 4294967296.0 AS load
  FROM v CROSS JOIN sysx)""",
    ]
    for k in range(1, num_iters + 1):
        parts.append(f"""l{k} AS MATERIALIZED (
  SELECT p.id, p.sys,
         CASE WHEN g.s IS NOT NULL
              THEN (1.0 - {omega}) * p.load + {omega} * (g.s / w.wdeg)
              ELSE p.load END AS load
  FROM l{k - 1} p
  LEFT JOIN (SELECT e.src AS id, l.sys, SUM(e.weight * l.load) AS s
             FROM sym e JOIN l{k - 1} l ON l.id = e.dst
             GROUP BY e.src, l.sys) g ON g.id = p.id AND g.sys = p.sys
  LEFT JOIN wdeg w ON w.id = p.id)""")
    chain = ",\n".join(parts)
    return f"""
WITH {EDGES_CTE},
{_D2_CAND_CTE},
{chain}
SELECT c.u, c.v,
       ROUND(POWER(SUM(POWER(ABS(la.load - lb.load), {norm})), 1.0/{norm}), 9)
         AS score
FROM cand c
JOIN l{num_iters} la ON la.id = c.u
JOIN l{num_iters} lb ON lb.id = c.v AND lb.sys = la.sys
GROUP BY c.u, c.v
"""


def suitor_matching_sql(matching_parquet: str) -> str:
    """EXACT certificate oracle for suitor_matching: the greedy matching
    over (w desc, canonical pair asc) is the UNIQUE matching in which
    every non-matched edge is dominated by an adjacent higher-key
    matched edge (induction over the key order), so verifying that
    certificate on the side-channel copy and re-emitting its rows IS an
    exact check — any wrong row set fails a check and empties the
    output."""
    return f"""
WITH {EDGES_CTE},
wund AS MATERIALIZED (
  SELECT u, v, CAST((u * 31 + v * 17) % 10 + 1 AS DOUBLE) AS w FROM und),
m AS MATERIALIZED (SELECT u, v FROM read_parquet('{matching_parquet}/*.parquet')),
mw AS MATERIALIZED (
  SELECT m.u, m.v, w.w FROM m JOIN wund w ON w.u = m.u AND w.v = m.v),
nodes AS (SELECT u AS id FROM mw UNION ALL SELECT v AS id FROM mw),
checks AS (
  SELECT
    (SELECT COUNT(*) FROM mw) = (SELECT COUNT(*) FROM m) AS edges_real,
    (SELECT COUNT(DISTINCT id) FROM nodes)
      = 2 * (SELECT COUNT(*) FROM mw) AS is_matching,
    NOT EXISTS (
      SELECT 1 FROM wund e
      WHERE NOT EXISTS (SELECT 1 FROM mw x WHERE x.u = e.u AND x.v = e.v)
        AND NOT EXISTS (
          SELECT 1 FROM mw f
          WHERE (f.u IN (e.u, e.v) OR f.v IN (e.u, e.v))
            AND (f.w > e.w OR (f.w = e.w
                 AND (f.u < e.u OR (f.u = e.u AND f.v < e.v))))
        )
    ) AS dominant
)
SELECT u, v, w AS weight FROM mw
WHERE (SELECT edges_real AND is_matching AND dominant FROM checks)
"""


def simmelian_overlap_sql(max_rank: int = 10) -> str:
    """SimmelianOverlapScore.cpp:19-32 twin: competition-ranked
    neighborhoods (RANK()-1 over per-edge triangle counts DESC,
    SimmelianScore.cpp:17-46), overlap = rank-bounded common-neighbor
    intersection excluding the endpoints."""
    return f"""
WITH {EDGES_CTE},
{TRI_CTE},
{_EDGE_TRI_CTE},
views AS (
  SELECT u AS ego, v AS alter, t FROM etd
  UNION ALL SELECT v, u, t FROM etd
),
rk AS (
  SELECT ego, alter,
         RANK() OVER (PARTITION BY ego ORDER BY t DESC) - 1 AS rnk
  FROM views
  QUALIFY rnk <= {max_rank}
),
ov AS (
  SELECT e.u, e.v, COUNT(*) AS c
  FROM und e
  JOIN rk a ON a.ego = e.u AND a.alter <> e.v
  JOIN rk b ON b.ego = e.v AND b.alter = a.alter
  GROUP BY e.u, e.v
)
SELECT e.u, e.v, CAST(COALESCE(ov.c, 0) AS DOUBLE) AS score
FROM und e LEFT JOIN ov ON ov.u = e.u AND ov.v = e.v
"""


def _ff_h3_sql(fire: str, node: str, cand: str, step: int, seed: int) -> str:
    """Integer h3 of operators/forestfire._h3 (fire-keyed walk hash)."""
    m = 1_000_000_007
    k = step * 1315423911 + seed * 1000003
    h1 = f"((({fire})*2654435761 + ({node})*40503 + ({cand})*97 + {k}) % {m})"
    h2 = f"((({h1})*({h1}) + 2654435761*({h1}) + 40503) % {m})"
    return f"((({h2})*({h2}) + 97*({h2}) + 1000003) % {m})"


def forest_fire_sql(n_fires: int = 64, max_steps: int = 4, seed: int = 1) -> str:
    """Exact replay of operators/forestfire.forest_fire_scores in its
    fixed-work mode at pf = 1/2 (ForestFireScore.cpp:22-95 semantics,
    BSP substitutes documented in the operator): per superstep each
    frontier node draws G = floor(log2((M+1) div (h3+1))) — integer-
    exact across engines — keeps the G hash-smallest unvisited
    neighbors, one winner per (fire, target) by (draw, proposer)."""

    def u(fire, node, cand, step):
        return (
            f"(CAST({_ff_h3_sql(fire, node, cand, step, seed)} + 1 AS DOUBLE)"
            " / 1000000008.0)"
        )

    parts = [
        "nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM v)",
        """ranked AS MATERIALIZED (
  SELECT id, ROW_NUMBER() OVER (ORDER BY id) - 1 AS rk FROM v)""",
        f"""a0 AS MATERIALIZED (
  SELECT g.range AS fire, r.id AS node
  FROM range({n_fires}) g
  JOIN ranked r
    ON r.rk = CAST(FLOOR({u('g.range', '0', '0', 0)} * (SELECT n FROM nn))
                   AS BIGINT))""",
        "vis0 AS (SELECT CAST(NULL AS BIGINT) AS fire,"
        " CAST(NULL AS BIGINT) AS node WHERE FALSE)",
    ]
    for t in range(1, max_steps + 1):
        gexpr = (
            f"FLOOR(LOG2(FLOOR(1000000008.0 / "
            f"({_ff_h3_sql('fire', 'node', 'node', t, seed)} + 1))))"
        )
        parts.append(f"""cand{t} AS (
  SELECT a.fire, a.node, e.dst AS x, {u('a.fire', 'a.node', 'e.dst', t)} AS d
  FROM a{t - 1} a JOIN sym e ON e.src = a.node
  WHERE NOT EXISTS (SELECT 1 FROM vis{t - 1} w
                    WHERE w.fire = a.fire AND w.node = e.dst))""")
        parts.append(f"""prop{t} AS (
  SELECT fire, node, x, d,
         ROW_NUMBER() OVER (PARTITION BY fire, node ORDER BY d, x) AS rn,
         LEAST({gexpr}, COUNT(*) OVER (PARTITION BY fire, node)) AS k
  FROM cand{t})""")
        parts.append(f"""win{t} AS MATERIALIZED (
  SELECT fire, node, x, d FROM prop{t} WHERE rn <= k
  QUALIFY ROW_NUMBER() OVER (PARTITION BY fire, x ORDER BY d, node) = 1)""")
        parts.append(f"""vis{t} AS MATERIALIZED (
  SELECT fire, node FROM vis{t - 1}
  UNION ALL SELECT fire, x AS node FROM win{t})""")
        parts.append(f"a{t} AS (SELECT fire, x AS node FROM win{t})")
    burn_union = "\n  UNION ALL ".join(
        f"SELECT least(node, x) AS u, greatest(node, x) AS v FROM win{t}"
        for t in range(1, max_steps + 1)
    )
    parts.append(f"allburn AS ({burn_union})")
    parts.append("cnt AS (SELECT u, v, COUNT(*) AS burnt FROM allburn GROUP BY u, v)")
    parts.append("mx AS (SELECT MAX(burnt) AS m FROM cnt)")
    body = ",\n".join(parts)
    return f"""
WITH {EDGES_CTE},
{body}
SELECT e.u, e.v,
       ROUND(CASE WHEN (SELECT m FROM mx) IS NULL THEN 0.0
                  ELSE CAST(COALESCE(cnt.burnt, 0) AS DOUBLE)
                       / (SELECT m FROM mx) END, 9) AS score
FROM und e LEFT JOIN cnt ON cnt.u = e.u AND cnt.v = e.v
"""


def random_edge_sql(seed: int = 1) -> str:
    """RandomEdgeScore twin: the shared quadratic hash over the
    canonical endpoints, mapped to (0,1]."""
    m = 1_000_000_007
    h1 = f"((u*2654435761 + v*40503 + {seed}*97) % {m})"
    return f"""
WITH {EDGES_CTE}
SELECT u, v,
       ROUND(CAST({_mix_sql(h1)} + 1 AS DOUBLE) / 1000000008.0, 9) AS score
FROM und
"""


def random_node_edge_sql(rne_ratio: float = 0.5, seed: int = 1) -> str:
    """RandomNodeEdgeScore twin — exact replay of the exponential-race
    substitute (see operators/sparsification.random_node_edge_scores):
    t = -ln(u01) / ((1-r)/m + r·(1/deg_u + 1/deg_v)/n⁺), score =
    removal rank / m."""
    m = 1_000_000_007
    r = repr(float(rne_ratio))
    h1 = f"((u*2654435761 + v*40503 + {seed + 1}*97) % {m})"
    return f"""
WITH {EDGES_CTE},
dg AS (SELECT id, COUNT(*) AS degree FROM (
    SELECT u AS id FROM und UNION ALL SELECT v AS id FROM und) GROUP BY id),
mm AS (SELECT CAST(COUNT(*) AS DOUBLE) AS m FROM und),
np AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM dg),
keyed AS (
  SELECT e.u, e.v,
         -LN(CAST({_mix_sql(h1)} + 1 AS DOUBLE) / 1000000008.0)
         / ((1.0 - {r}) / (SELECT m FROM mm)
            + {r} * (1.0 / du.degree + 1.0 / dv.degree) / (SELECT n FROM np)) AS t
  FROM und e JOIN dg du ON du.id = e.u JOIN dg dv ON dv.id = e.v
),
rk AS (SELECT u, v, ROW_NUMBER() OVER (ORDER BY t, u, v) - 1 AS rk FROM keyed)
SELECT u, v, ROUND(CAST(rk AS DOUBLE) / (SELECT m FROM mm), 9) AS score FROM rk
"""


def degree_histogram_sql() -> str:
    """Shared property oracle for the degree-sequence generators
    (HavelHakimi / ConfigurationModel / ESMC realize the derived graph's
    degree sequence EXACTLY, so the generated graph's degree histogram
    must equal the source graph's)."""
    return f"""
WITH {EDGES_CTE},
dg AS (SELECT id, COUNT(*) AS degree FROM (
    SELECT u AS id FROM und UNION ALL SELECT v AS id FROM und) GROUP BY id)
SELECT degree, CAST(COUNT(*) AS BIGINT) AS n_nodes FROM dg GROUP BY degree
"""


def config_model_degrees_sql() -> str:
    """Degree histogram of the hash-sparsified link graph — the exact
    sequence q_config_model_degrees hands to configuration_model, whose
    output realizes it exactly (stub conservation)."""
    return f"""
WITH {EDGES_CTE},
sp AS (SELECT u, v FROM und WHERE (u*1000003 + v) % 97 < 24),
dg AS (SELECT id, COUNT(*) AS degree FROM (
    SELECT u AS id FROM sp UNION ALL SELECT v AS id FROM sp) GROUP BY id)
SELECT degree, CAST(COUNT(*) AS BIGINT) AS n_nodes FROM dg GROUP BY degree
"""


def planarity_cases_sql() -> str:
    """Closed-form block verdicts for q_planarity_cases (graph-theoretic
    certainties, no recomputation): K4 planar, K3,3 non-planar
    (Kuratowski), octahedron maximal-planar, wheel W24 planar."""
    return """
SELECT CAST(4 AS BIGINT) AS n_nodes, CAST(6 AS BIGINT) AS n_edges, TRUE AS is_planar
UNION ALL SELECT 6, 9, FALSE
UNION ALL SELECT 6, 12, TRUE
UNION ALL SELECT 24, 46, TRUE
"""


def approx_betweenness_rk_sql(r: int = 48, seed: int = 1,
                              max_levels: int = 8) -> str:
    """Exact replay of operators/betweenness.approx_betweenness_rk at a
    PINNED sample count (the driver query pins vd, hence r, so the
    formula never touches the oracle): hash-drawn ordered pairs, batched
    sigma-BFS unrolled to max_levels, backward walk with the running-sum
    weighted choice (sigma sums are integer-valued doubles — exact in
    both engines)."""
    parts = [
        "nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM v)",
        """ranked AS MATERIALIZED (
  SELECT id, ROW_NUMBER() OVER (ORDER BY id) - 1 AS rk FROM v)""",
        f"""smp0 AS (
  SELECT g.range AS i,
         CAST(FLOOR({_walk_u_sql('g.range', 0, '0', seed)}
                    * (SELECT n FROM nn)) AS BIGINT) AS srk,
         CAST(FLOOR({_walk_u_sql('g.range', 1, '0', seed)}
                    * ((SELECT n FROM nn) - 1)) AS BIGINT) AS q
  FROM range({r}) g)""",
        """smp AS MATERIALIZED (
  SELECT s0.i, rs.id AS s, rt.id AS t
  FROM (SELECT i, srk, CASE WHEN q >= srk THEN q + 1 ELSE q END AS trk
        FROM smp0) s0
  JOIN ranked rs ON rs.rk = s0.srk
  JOIN ranked rt ON rt.rk = s0.trk)""",
        "b0 AS (SELECT DISTINCT s, s AS id, CAST(0 AS BIGINT) AS dist,"
        " 1.0 AS sigma FROM smp)",
        "vis0 AS (SELECT * FROM b0)",
    ]
    for L in range(1, max_levels + 1):
        parts.append(f"""b{L} AS MATERIALIZED (
  SELECT f.s, e.dst AS id, CAST({L} AS BIGINT) AS dist,
         SUM(f.sigma) AS sigma
  FROM b{L - 1} f JOIN sym e ON e.src = f.id
  WHERE NOT EXISTS (SELECT 1 FROM vis{L - 1} w
                    WHERE w.s = f.s AND w.id = e.dst)
  GROUP BY f.s, e.dst)""")
        parts.append(
            f"vis{L} AS MATERIALIZED (SELECT * FROM vis{L - 1}"
            f" UNION ALL SELECT * FROM b{L})"
        )
    parts.append(f"""cur0 AS (
  SELECT smp.i, smp.s, smp.t AS node, sp.dist
  FROM smp JOIN vis{max_levels} sp ON sp.s = smp.s AND sp.id = smp.t)""")
    for k in range(1, max_levels + 1):
        ud = _walk_u_sql("i", 100 + k, "0", seed)
        parts.append(f"""pred{k} AS (
  SELECT c.i, c.s, e.src AS p, c.dist - 1 AS pd, sp.sigma
  FROM cur{k - 1} c
  JOIN sym e ON e.dst = c.node
  JOIN vis{max_levels} sp
    ON sp.s = c.s AND sp.id = e.src AND sp.dist = c.dist - 1
  WHERE c.dist > 0)""")
        parts.append(f"""chose{k} AS MATERIALIZED (
  SELECT i, s, p AS node, pd AS dist FROM (
    SELECT i, s, p, pd,
           SUM(sigma) OVER (PARTITION BY i ORDER BY p) AS cum,
           SUM(sigma) OVER (PARTITION BY i) AS tot,
           {ud} AS ud
    FROM pred{k})
  WHERE cum >= ud * tot
  QUALIFY ROW_NUMBER() OVER (PARTITION BY i ORDER BY p) = 1)""")
        parts.append(f"cur{k} AS (SELECT * FROM chose{k})")
    pick_union = "\n  UNION ALL ".join(
        f"SELECT node FROM chose{k} WHERE node <> s"
        for k in range(1, max_levels + 1)
    )
    parts.append(f"picks AS ({pick_union})")
    parts.append(
        f"sc AS (SELECT node AS id, COUNT(*) / {float(r)} AS score"
        " FROM picks GROUP BY node)"
    )
    body = ",\n".join(parts)
    return f"""
WITH {EDGES_CTE},
{body}
SELECT v.id, ROUND(COALESCE(sc.score, 0.0), 9) AS score
FROM v LEFT JOIN sc ON sc.id = v.id
"""


def approx_group_betweenness_sql(k: int = 5, r: int = 48, seed: int = 1,
                                 max_levels: int = 8) -> str:
    """Exact replay of operators/betweenness.approx_group_betweenness at
    a PINNED sample count: the SAME hash-drawn (s, t) pairs as the RK
    oracle (draws depend only on i/pos/seed), backward walk with a
    UNIFORM predecessor draw (weight 1 replaces sigma), hyperedges = the
    per-sample interior-node sets, then the k-round greedy max-coverage
    unrolled (pick = max distinct-hyperedge count, ties node asc; filler
    = smallest unchosen vertex id when coverage is exhausted)."""
    parts = [
        "nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM v)",
        """ranked AS MATERIALIZED (
  SELECT id, ROW_NUMBER() OVER (ORDER BY id) - 1 AS rk FROM v)""",
        f"""smp0 AS (
  SELECT g.range AS i,
         CAST(FLOOR({_walk_u_sql('g.range', 0, '0', seed)}
                    * (SELECT n FROM nn)) AS BIGINT) AS srk,
         CAST(FLOOR({_walk_u_sql('g.range', 1, '0', seed)}
                    * ((SELECT n FROM nn) - 1)) AS BIGINT) AS q
  FROM range({r}) g)""",
        """smp AS MATERIALIZED (
  SELECT s0.i, rs.id AS s, rt.id AS t
  FROM (SELECT i, srk, CASE WHEN q >= srk THEN q + 1 ELSE q END AS trk
        FROM smp0) s0
  JOIN ranked rs ON rs.rk = s0.srk
  JOIN ranked rt ON rt.rk = s0.trk)""",
        "b0 AS (SELECT DISTINCT s, s AS id, CAST(0 AS BIGINT) AS dist"
        " FROM smp)",
        "vis0 AS (SELECT * FROM b0)",
    ]
    for L in range(1, max_levels + 1):
        parts.append(f"""b{L} AS MATERIALIZED (
  SELECT f.s, e.dst AS id, CAST({L} AS BIGINT) AS dist
  FROM b{L - 1} f JOIN sym e ON e.src = f.id
  WHERE NOT EXISTS (SELECT 1 FROM vis{L - 1} w
                    WHERE w.s = f.s AND w.id = e.dst)
  GROUP BY f.s, e.dst)""")
        parts.append(
            f"vis{L} AS MATERIALIZED (SELECT * FROM vis{L - 1}"
            f" UNION ALL SELECT * FROM b{L})"
        )
    parts.append(f"""cur0 AS (
  SELECT smp.i, smp.s, smp.t AS node, sp.dist
  FROM smp JOIN vis{max_levels} sp ON sp.s = smp.s AND sp.id = smp.t)""")
    for s in range(1, max_levels + 1):
        ud = _walk_u_sql("i", 100 + s, "0", seed)
        parts.append(f"""pred{s} AS (
  SELECT c.i, c.s, e.src AS p, c.dist - 1 AS pd
  FROM cur{s - 1} c
  JOIN sym e ON e.dst = c.node
  JOIN vis{max_levels} sp
    ON sp.s = c.s AND sp.id = e.src AND sp.dist = c.dist - 1
  WHERE c.dist > 0)""")
        parts.append(f"""chose{s} AS MATERIALIZED (
  SELECT i, s, p AS node, pd AS dist FROM (
    SELECT i, s, p, pd,
           CAST(COUNT(*) OVER (PARTITION BY i ORDER BY p)
                AS DOUBLE) AS cum,
           CAST(COUNT(*) OVER (PARTITION BY i) AS DOUBLE) AS tot,
           {ud} AS ud
    FROM pred{s})
  WHERE cum >= ud * tot
  QUALIFY ROW_NUMBER() OVER (PARTITION BY i ORDER BY p) = 1)""")
        parts.append(f"cur{s} AS (SELECT * FROM chose{s})")
    pick_union = "\n  UNION ALL ".join(
        f"SELECT i, node FROM chose{s} WHERE node <> s"
        for s in range(1, max_levels + 1)
    )
    parts.append(
        f"unc0 AS MATERIALIZED (SELECT DISTINCT i, node FROM ({pick_union}))"
    )
    for j in range(1, k + 1):
        prev = " UNION ALL ".join(
            f"SELECT id FROM p{x}" for x in range(1, j)
        )
        filler = (
            f"(SELECT MIN(id) FROM v WHERE id NOT IN ({prev}))"
            if prev else "(SELECT MIN(id) FROM v)"
        )
        parts.append(f"""p{j} AS MATERIALIZED (
  SELECT COALESCE(
    (SELECT node FROM unc{j - 1}
     GROUP BY node ORDER BY COUNT(DISTINCT i) DESC, node ASC LIMIT 1),
    {filler}) AS id)""")
        parts.append(f"""unc{j} AS MATERIALIZED (
  SELECT u.* FROM unc{j - 1} u
  WHERE NOT EXISTS (SELECT 1 FROM unc{j - 1} w
                    WHERE w.i = u.i
                      AND w.node = (SELECT id FROM p{j})))""")
    final = "\n  UNION ALL ".join(
        f"SELECT CAST({j} AS INTEGER) AS ord, id FROM p{j}"
        for j in range(1, k + 1)
    )
    body = ",\n".join(parts)
    return f"""
WITH {EDGES_CTE},
{body}
{final}
"""


def scd_ground_truth_sql() -> str:
    """Exact twin of q_scd_ground_truth_mod: found community of seed s
    (the 12 smallest vertex ids) = {u : u % 9 = s % 9}; ground truth =
    the mod-7 (+ mod-11 overlay on id%3=0) cover; per-seed best
    jaccard/f1/precision/recall over the subsets containing the seed."""
    return f"""
WITH {EDGES_CTE},
seeds AS (SELECT id AS seed FROM v ORDER BY id LIMIT 12),
fnd AS (SELECT s.seed, u.id FROM seeds s JOIN v u ON u.id % 9 = s.seed % 9),
gt AS (
  SELECT id, id % 7 AS c FROM v
  UNION ALL SELECT id, 7 + id % 11 AS c FROM v WHERE id % 3 = 0
),
fs AS (SELECT seed, COUNT(*) AS fs FROM fnd GROUP BY seed),
ts AS (SELECT c, COUNT(*) AS ts FROM gt GROUP BY c),
ov AS (
  SELECT f.seed, g.c, COUNT(*) AS ov
  FROM fnd f JOIN gt g ON g.id = f.id
  WHERE EXISTS (SELECT 1 FROM gt a WHERE a.id = f.seed AND a.c = g.c)
  GROUP BY f.seed, g.c
),
m AS (
  SELECT ov.seed,
         CAST(ov.ov AS DOUBLE) / (fs.fs + ts.ts - ov.ov) AS jac,
         CAST(ov.ov AS DOUBLE) / fs.fs AS prec,
         CAST(ov.ov AS DOUBLE) / ts.ts AS rec
  FROM ov JOIN fs ON fs.seed = ov.seed JOIN ts ON ts.c = ov.c
),
best AS (
  SELECT seed, MAX(jac) AS jaccard,
         MAX(CASE WHEN prec > 0 AND rec > 0
                  THEN 2 * prec * rec / (prec + rec) ELSE 0.0 END) AS f1,
         MAX(prec) AS prec, MAX(rec) AS rec
  FROM m GROUP BY seed
)
SELECT s.seed, ROUND(COALESCE(b.jaccard, 0.0), 9) AS jaccard,
       ROUND(COALESCE(b.f1, 0.0), 9) AS f1,
       ROUND(COALESCE(b.prec, 0.0), 9) AS precision,
       ROUND(COALESCE(b.rec, 0.0), 9) AS recall
FROM seeds s LEFT JOIN best b ON b.seed = s.seed
"""


def conductance_parity_sql() -> str:
    """Conductance.cpp twin on the id-parity 2-partition: cut / min side
    volume."""
    return f"""
WITH {EDGES_CTE},
cut AS (SELECT CAST(COUNT(*) AS DOUBLE) AS c FROM und WHERE u % 2 <> v % 2),
dg AS (SELECT src AS id, SUM(weight) AS wd FROM sym GROUP BY src),
vol AS (SELECT v.id % 2 AS side, SUM(COALESCE(dg.wd, 0.0)) AS vol
        FROM v LEFT JOIN dg ON dg.id = v.id GROUP BY v.id % 2)
SELECT ROUND((SELECT c FROM cut) / (SELECT MIN(vol) FROM vol), 9)
       AS conductance
"""


def sampled_rand_sql(max_samples: int = 500, seed: int = 1) -> str:
    """Twin of q_sampled_rand_mod: hash-drawn node pairs (skip trick)
    and hash-drawn edges over the (u DESC, v ASC) edge ranking; zeta =
    id%3, eta = id%4; dissimilarity = 1 − agree/samples."""
    return f"""
WITH {EDGES_CTE},
nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM v),
ranked AS (SELECT id, ROW_NUMBER() OVER (ORDER BY id) - 1 AS rk FROM v),
prs AS (
  SELECT g.range AS i,
         CAST(FLOOR({_walk_u_sql('g.range', 0, '0', seed)}
                    * (SELECT n FROM nn)) AS BIGINT) AS urk,
         CAST(FLOOR({_walk_u_sql('g.range', 1, '0', seed)}
                    * ((SELECT n FROM nn) - 1)) AS BIGINT) AS q
  FROM range({max_samples}) g),
np AS (
  SELECT ru.id AS u, rv.id AS v
  FROM (SELECT i, urk, CASE WHEN q >= urk THEN q + 1 ELSE q END AS vrk
        FROM prs) p
  JOIN ranked ru ON ru.rk = p.urk
  JOIN ranked rv ON rv.rk = p.vrk),
nagree AS (
  SELECT SUM(CASE WHEN (u % 3 = v % 3) = (u % 4 = v % 4)
                  THEN 1 ELSE 0 END) AS ok
  FROM np),
mm AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM und),
eranked AS (
  SELECT u, v, ROW_NUMBER() OVER (ORDER BY u DESC, v ASC) - 1 AS erk
  FROM und),
ep AS (
  SELECT e.u, e.v
  FROM range({max_samples}) g
  JOIN eranked e
    ON e.erk = CAST(FLOOR({_walk_u_sql('g.range', 2, '0', seed)}
                          * (SELECT m FROM mm)) AS BIGINT)),
eagree AS (
  SELECT SUM(CASE WHEN (u % 3 = v % 3) = (u % 4 = v % 4)
                  THEN 1 ELSE 0 END) AS ok
  FROM ep)
SELECT ROUND(1.0 - (SELECT ok FROM nagree) / {float(max_samples)}, 9)
         AS node_rand,
       ROUND(1.0 - (SELECT ok FROM eagree) / {float(max_samples)}, 9)
         AS graph_rand
"""


def gedwalk_levels_sql(levels: int = 4, alpha: float = 0.05, k: int = 3) -> str:
    """Exact twin of queries.q_gedwalk_levels: the GedWalk hit/miss
    recursion (GedWalk.cpp:298-345) unrolled to `levels` joins over the
    directed link graph, group = top-k out-degree (count desc, id asc —
    deterministic integer sort). Walk counts are integer-valued doubles
    (weights are 1.0), so per-level sums are exact in both engines; the
    alpha powers are Python-computed literals so both engines multiply
    the SAME doubles (link_pred_katz_sql pattern)."""
    parts = [
        f"""grpdeg AS (SELECT src AS id, COUNT(*) AS d FROM edges GROUP BY src),
grp AS MATERIALIZED (SELECT id FROM grpdeg ORDER BY d DESC, id ASC LIMIT {k}),
s0 AS (SELECT id AS u,
  CASE WHEN id IN (SELECT id FROM grp)
       THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END AS hit,
  CASE WHEN id IN (SELECT id FROM grp)
       THEN CAST(0.0 AS DOUBLE) ELSE CAST(1.0 AS DOUBLE) END AS miss
  FROM v)"""
    ]
    for i in range(1, levels + 1):
        parts.append(f"""s{i} AS MATERIALIZED (
  SELECT e.dst AS u,
    CASE WHEN e.dst IN (SELECT id FROM grp)
         THEN SUM(CAST(e.weight AS DOUBLE) * (s.hit + s.miss))
         ELSE SUM(CAST(e.weight AS DOUBLE) * s.hit) END AS hit,
    CASE WHEN e.dst IN (SELECT id FROM grp)
         THEN CAST(0.0 AS DOUBLE)
         ELSE SUM(CAST(e.weight AS DOUBLE) * s.miss) END AS miss
  FROM edges e JOIN s{i - 1} s ON s.u = e.src
  GROUP BY e.dst)""")
    chain = ",\n".join(parts)
    sels = "\nUNION ALL\n".join(
        f"SELECT CAST({i} AS INTEGER) AS level, CAST(h AS DOUBLE) AS hits, "
        f"ROUND(CAST({alpha**i!r} AS DOUBLE) * h, 9) AS contrib "
        f"FROM (SELECT COALESCE(SUM(hit), 0.0) AS h FROM s{i})"
        for i in range(1, levels + 1)
    )
    return f"""
WITH {EDGES_CTE},
{chain}
{sels}
"""


def group_closeness_swaps_sql(k: int = 4, rounds: int = 3) -> str:
    """Independent twin of queries.q_group_closeness_swaps: `rounds`
    unrolled exact best-swap rounds from the k smallest vertex ids.
    Where the Spark operator evaluates swaps through a per-(u) /
    per-(u, nearest-member) decomposition, this twin recomputes each
    swap's farness DIRECTLY as Σ_v min over sources S\\{x} ∪ {u} via
    three marginal sums (joined LEAST + member-only remainder +
    candidate-only remainder) — a different derivation agreeing on
    integer hop sums, so the check is exact. A no-swap round is
    idempotent, so `rounds` only needs to be ≥ the query's max_swaps."""
    parts = [
        f"grp0 AS MATERIALIZED (SELECT id FROM v ORDER BY id LIMIT {k})"
    ]
    for r in range(1, rounds + 1):
        p = r - 1
        parts.append(f"""pv{r} AS MATERIALIZED (
  SELECT d.id AS vtx, MIN(d.dist) AS m1
  FROM dists d JOIN grp{p} g ON d.s = g.id GROUP BY d.id),
cand{r} AS MATERIALIZED (SELECT vtx AS id FROM pv{r} WHERE m1 = 1),
mex{r} AS MATERIALIZED (
  SELECT gx.id AS x, d.id AS vtx, MIN(d.dist) AS mex
  FROM grp{p} gx
  JOIN dists d ON d.s <> gx.id AND d.s IN (SELECT id FROM grp{p})
  GROUP BY gx.id, d.id),
cd{r} AS MATERIALIZED (
  SELECT d.s AS u, d.id AS vtx, d.dist AS du
  FROM dists d JOIN cand{r} c ON d.s = c.id),
ja{r} AS MATERIALIZED (
  SELECT m.x, c.u,
         SUM(LEAST(m.mex, c.du)) AS lsum,
         SUM(m.mex) AS mexsum,
         SUM(c.du) AS dusum
  FROM mex{r} m JOIN cd{r} c ON m.vtx = c.vtx
  GROUP BY m.x, c.u),
basex{r} AS (SELECT x, SUM(mex) AS b FROM mex{r} GROUP BY x),
cdsum{r} AS (SELECT u, SUM(du) AS cs FROM cd{r} GROUP BY u),
sw{r} AS MATERIALIZED (
  SELECT bx.x, cu.u,
         COALESCE(j.lsum, 0) + bx.b - COALESCE(j.mexsum, 0)
           + cu.cs - COALESCE(j.dusum, 0) AS far
  FROM basex{r} bx CROSS JOIN cdsum{r} cu
  LEFT JOIN ja{r} j ON j.x = bx.x AND j.u = cu.u
  ORDER BY far ASC, bx.x ASC, cu.u ASC LIMIT 1),
imp{r} AS MATERIALIZED (
  SELECT x, u FROM sw{r}
  WHERE far < (SELECT SUM(m1) FROM pv{r})),
grp{r} AS MATERIALIZED (
  SELECT id FROM grp{p}
  WHERE id <> COALESCE((SELECT x FROM imp{r}), -1)
  UNION ALL SELECT u AS id FROM imp{r})""")
    nsw = " + ".join(
        f"(SELECT COUNT(*) FROM imp{r})" for r in range(1, rounds + 1)
    )
    chain = ",\n".join(parts)
    return f"""
WITH {EDGES_CTE},
{_dists_cte()},
{chain},
pvf AS (
  SELECT d.id AS vtx, MIN(d.dist) AS m1
  FROM dists d JOIN grp{rounds} g ON d.s = g.id GROUP BY d.id)
SELECT g.id,
       CAST({nsw} AS INTEGER) AS n_swaps,
       CAST((SELECT SUM(m1) FROM pvf) AS BIGINT) AS farness
FROM grp{rounds} g
"""


# -------------------------------------------------------- r2.9 spanning
def _bottleneck_closure(weight_sql: str, rounds: int, minimax: bool) -> str:
    """CTE chain computing the bottleneck path weight between every pair
    of mod-3 subgraph vertices by doubling: minimax (min over paths of
    the max edge weight) or maximin (max over paths of the min edge
    weight). 2^rounds hops bounds any simple path in the subgraph."""
    agg_out, agg_in = ("MIN", "GREATEST") if minimax else ("MAX", "LEAST")
    parts = [
        f"""se AS MATERIALIZED (
  SELECT u, v, CAST({weight_sql} AS DOUBLE) AS w FROM und
  WHERE u % 3 = 0 AND v % 3 = 0)""",
        f"""p0 AS MATERIALIZED (
  SELECT a, b, {agg_out}(w) AS d FROM (
    SELECT u AS a, v AS b, w FROM se UNION ALL SELECT v, u, w FROM se)
  GROUP BY a, b)""",
    ]
    for k in range(1, rounds + 1):
        parts.append(
            f"""p{k} AS MATERIALIZED (
  SELECT a, b, {agg_out}(d) AS d FROM (
    SELECT a, b, d FROM p{k - 1}
    UNION ALL
    SELECT l.a, r.b, {agg_in}(l.d, r.d) AS d
    FROM p{k - 1} l JOIN p{k - 1} r ON l.b = r.a)
  GROUP BY a, b)"""
        )
    return ",\n".join(parts)


def min_spanning_forest_sql(rounds: int = 8) -> str:
    """Cycle property under globally distinct weights (KruskalMSF.cpp
    semantics): edge (u, v, w) is in the unique minimum spanning forest
    iff every other u–v path carries some edge > w, i.e. iff the minimax
    path weight between u and v equals w. Exact integer-valued doubles
    throughout, so the equality is safe in both engines."""
    closure = _bottleneck_closure("u * 1000 + v", rounds, minimax=True)
    return f"""
WITH {EDGES_CTE},
{closure}
SELECT se.u, se.v, se.w AS weight
FROM se JOIN p{rounds} m ON m.a = se.u AND m.b = se.v AND m.d = se.w
"""


def umsf_members_sql(rounds: int = 8) -> str:
    """UnionMaximumSpanningForest.cpp:12-90 membership: edge (u, v, w)
    belongs iff u and v are disconnected in the strictly-heavier
    subgraph, i.e. iff the maximin path weight between them equals w
    (the edge itself always achieves >= w; any strictly heavier path
    would push the maximin above w)."""
    closure = _bottleneck_closure("1 + (u + v) % 4", rounds, minimax=False)
    return f"""
WITH {EDGES_CTE},
{closure}
SELECT se.u, se.v, se.w AS weight
FROM se JOIN p{rounds} m ON m.a = se.u AND m.b = se.v AND m.d = se.w
"""


def b_matching_summary_sql(matching_parquet: str) -> str:
    """Property oracle for the b-suitor b-matching (BMatching.cpp
    isProper contract, b = 2): from the side-channel copy of the matched
    edges, independently verify (1) per-vertex capacity — no vertex in
    more than b matched edges, (2) every matched pair is a real edge,
    (3) MAXIMALITY — no unmatched edge has both endpoints below capacity
    (the 1/2-approximation rests on it), and pin size + total weight
    recomputed from the shared hash-weight formula
    w = ((u*2654435761 + v*40503) % 1000003) / 1000003 (exact BIGINT in
    both engines)."""
    return f"""
WITH {EDGES_CTE},
wund AS (
  SELECT u, v,
         ((u * 2654435761 + v * 40503) % 1000003) / 1000003.0 AS weight
  FROM und
),
m AS (SELECT u, v FROM read_parquet('{matching_parquet}/*.parquet')),
deg AS (
  SELECT id, COUNT(*) AS d FROM (
    SELECT u AS id FROM m UNION ALL SELECT v AS id FROM m
  ) GROUP BY id
),
full_v AS (SELECT id FROM deg WHERE d >= 2)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM m) AS n_matched,
       NOT EXISTS (SELECT 1 FROM deg WHERE d > 2) AS capacity_ok,
       NOT EXISTS (SELECT 1 FROM m LEFT JOIN wund e
                   ON e.u = m.u AND e.v = m.v
                   WHERE e.u IS NULL) AS edges_real,
       NOT EXISTS (
         SELECT 1 FROM wund e
         WHERE NOT EXISTS (SELECT 1 FROM m
                           WHERE m.u = e.u AND m.v = e.v)
           AND e.u NOT IN (SELECT id FROM full_v)
           AND e.v NOT IN (SELECT id FROM full_v)
       ) AS is_maximal,
       (SELECT ROUND(SUM(w2.weight), 6) FROM m
        JOIN wund w2 ON w2.u = m.u AND w2.v = m.v) AS total_w
"""

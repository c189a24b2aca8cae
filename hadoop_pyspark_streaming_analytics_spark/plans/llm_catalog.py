"""Catalog entries for the LLM-training-data pipeline operators (dedup,
similarity search, text analysis, multimodal) — BASELINE.json's "beyond the
reference surface" requirement, with DuckDB oracles.

Hash-portability: minhash/simhash/fingerprints are built on md5-hex, which
is bit-identical across Spark and DuckDB (the usual murmur hashes are not);
minhash is the lexicographic min of salted hex digests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators import (
    chunking,
    corpus,
    dedup,
    gate_agreement,
    graph,
    length_policy,
    mixture_budget,
    model_filter,
    multimodal,
    profiling,
    quality,
    refine,
    retrieval,
    scrubbing,
    segment_dedup,
    similarity,
    sketches,
    timeseries,
    tokenizer_health,
)
from ..operators.quality import LANG_MARKERS
from ..operators.text import STOP_WORDS
from .catalog import QuerySpec
from .. import pipelines

_STOPS = ", ".join(f"'{w}'" for w in STOP_WORDS)

# Shared shingle CTE (mirrors operators/dedup.py:doc_shingles, n=3;
# DuckDB lists are 1-indexed → range(1, len-1) ≡ Spark sequence(0, size-3)).
SQL_SHINGLES = """
toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') AS t FROM documents
),
sh AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(range(1, len(t) - 1),
                i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS shingle
  FROM toks WHERE len(t) >= 3
)"""


def _lsh_ctes(bands: int = dedup.LSH_BANDS, rows: int = dedup.LSH_ROWS) -> str:
    """CTE chain ending in ``cand(doc_a, doc_b)`` — the LSH candidate pairs.
    Shared by the pair query and the connected-components queries."""
    sig_cols = ",\n         ".join(
        f"min(md5('{k}|' || shingle)) AS mh_{k}" for k in range(bands * rows)
    )
    band_selects = []
    for b in range(bands):
        concat = " || '|' || ".join(f"mh_{b * rows + r}" for r in range(rows))
        band_selects.append(
            f"SELECT doc_id, {b} AS band_id, md5({concat}) AS band_hash FROM sigs"
        )
    bands_sql = "\n  UNION ALL\n  ".join(band_selects)
    return f"""{SQL_SHINGLES},
sigs AS (
  SELECT doc_id,
         {sig_cols}
  FROM sh GROUP BY doc_id
),
bands AS (
  {bands_sql}
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a
  JOIN bands b ON a.band_id = b.band_id AND a.band_hash = b.band_hash
              AND a.doc_id < b.doc_id
)"""


def _minhash_lsh_sql() -> str:
    return f"WITH {_lsh_ctes()}\nSELECT doc_a, doc_b FROM cand"


#: Transitive closure of the LSH candidate graph (recursive CTE), labeling
#: each node with the smallest reachable node — the oracle for the Spark
#: min-label-propagation loop in operators/dedup.py:connected_components.
_COMPONENT_CTES = """
edges AS (
  SELECT doc_a AS u, doc_b AS v FROM cand
  UNION ALL
  SELECT doc_b AS u, doc_a AS v FROM cand
),
reach AS (
  SELECT u, u AS v FROM (SELECT DISTINCT u FROM edges)
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
),
comp AS (
  SELECT u AS doc_id, MIN(v) AS component FROM reach GROUP BY u
)"""


def _components_sql() -> str:
    return (
        f"WITH RECURSIVE {_lsh_ctes()},{_COMPONENT_CTES}\n"
        "SELECT doc_id, component FROM comp"
    )


def _keep_canonical_sql() -> str:
    return (
        f"WITH RECURSIVE {_lsh_ctes()},{_COMPONENT_CTES}\n"
        """SELECT d.doc_id FROM documents d
LEFT JOIN comp c ON d.doc_id = c.doc_id
WHERE c.component IS NULL OR c.component = d.doc_id"""
    )


def _keep_best_quality_sql() -> str:
    return (
        f"WITH RECURSIVE {_lsh_ctes()},{_COMPONENT_CTES},{_QUALITY_CTES}\n"
        """, winners AS (
  SELECT doc_id FROM (
    SELECT c.doc_id,
           row_number() OVER (PARTITION BY c.component
                              ORDER BY q.quality_score DESC, c.doc_id) AS rk
    FROM comp c JOIN qual q ON q.doc_id = c.doc_id)
  WHERE rk = 1
),
survivors AS (
  SELECT d.doc_id FROM documents d
  LEFT JOIN comp c ON d.doc_id = c.doc_id
  WHERE c.doc_id IS NULL
  UNION ALL
  SELECT doc_id FROM winners
)
SELECT s.doc_id, q.quality_score
FROM survivors s JOIN qual q ON q.doc_id = s.doc_id"""
    )


def _simhash_sql(bits: int = 16) -> str:
    votes = ",\n         ".join(
        f"sum(CASE WHEN substr(h, {j + 1}, 1) IN "
        f"('1','3','5','7','9','b','d','f') THEN 1 ELSE -1 END) AS v_{j}"
        for j in range(bits)
    )
    fp = " + ".join(f"(CASE WHEN v_{j} > 0 THEN {1 << j} ELSE 0 END)" for j in range(bits))
    return f"""
WITH t AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word
  FROM documents
),
tw AS (SELECT doc_id, md5(word) AS h FROM t WHERE word NOT IN ({_STOPS})),
votes AS (
  SELECT doc_id,
         {votes}
  FROM tw GROUP BY doc_id
)
SELECT doc_id, CAST({fp} AS BIGINT) AS simhash FROM votes"""


def _lang_id_sql() -> str:
    hit_cols = []
    for lang, markers in LANG_MARKERS.items():
        arr = ", ".join(f"'{m}'" for m in markers)
        hit_cols.append(
            f"CAST(len(list_filter(toks, t -> list_contains([{arr}], t))) AS INTEGER)"
            f" AS hits_{lang}"
        )
    langs = list(LANG_MARKERS)
    best = f"greatest({', '.join('hits_' + lang for lang in langs)})"
    case = " ".join(
        f"WHEN {best} > 0 AND hits_{lang} = {best} THEN '{lang}'" for lang in langs
    )
    return f"""
WITH d AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') AS toks FROM documents
),
hits AS (
  SELECT doc_id, {', '.join(hit_cols)} FROM d
)
SELECT doc_id, CASE {case} ELSE 'und' END AS pred_lang,
       {', '.join('hits_' + lang for lang in langs)}
FROM hits"""


def _duck_cos(a: str, b: str) -> str:
    """DuckDB cosine twin of ``operators.similarity.cosine_expr`` — the
    same ``dot / nullif(norm_a * norm_b, 0)`` spelling, NOT the builtin
    ``list_cosine_similarity``: DuckDB's builtin returns -1.0 for a
    zero-norm vector where the Spark side (and this spelling, on both
    engines) degrades per-row to NULL.  Value parity on non-degenerate
    rows is ~2e-16 vs the builtin (measured over sf0.001 pairs), far
    inside the +1e-8 / 4-6dp rounding policy every consumer applies."""
    return (
        f"(list_dot_product({a}, {b})"
        f" / nullif(sqrt(list_dot_product({a}, {a}))"
        f" * sqrt(list_dot_product({b}, {b})), 0))"
    )


_ANN_SQL_TEMPLATE = f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS q_emb, label AS q_label
  FROM embeddings WHERE vec_id IN (0, 1, 2, 3, 4)
),
scored AS (
  SELECT q.query_id, e.vec_id,
         {_duck_cos('q.q_emb', 'e.embedding::DOUBLE[]')} AS cosine
  FROM embeddings e CROSS JOIN q
  WHERE e.vec_id != q.query_id{{label_pred}}
),
ranked AS (
  SELECT query_id, vec_id, cosine,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, vec_id) AS rnk
  FROM scored
)
SELECT query_id, vec_id AS neighbor_id, CAST(rnk AS INTEGER) AS rnk,
       round(cosine + 1e-8, 4) AS cosine
FROM ranked WHERE rnk <= 10"""


def _kmeans_assign_ctes(k: int = 8, rounds: int = 2, dim: int = 64) -> str:
    """Unrolled Lloyd iteration mirroring similarity.kmeans_centroids:
    hash-sampled init, then ``rounds`` x (assign -> 6dp-rounded per-dim
    mean), then a final assignment.  Rounding the means at 6dp on both
    sides keeps cross-engine avg summation-order noise out of later
    rounds' argmax.  Returns the CTE chain ending in
    ``kbest(vec_id, centroid_id, cos)`` — shared by the ann_ivf_build_kmeans
    and embedding_semdedup oracles."""
    # ``embedding IS NOT NULL`` mirrors kmeans_centroids' degrade-per-row
    # filter: corrupt vectors neither seed centroids nor vote in means.
    init = f"""cent0 AS (
  SELECT CAST(row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id)
              - 1 AS INTEGER) AS centroid_id,
         list_transform(embedding, x -> x::DOUBLE) AS c_emb
  FROM embeddings
  WHERE embedding IS NOT NULL
  QUALIFY row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id)
          <= {k}
)"""
    stages = [init]
    for r in range(rounds):
        stages.append(f"""assign{r} AS (
  SELECT e.vec_id, c.centroid_id,
         round({_duck_cos("list_transform(e.embedding, x -> x::DOUBLE)", "c.c_emb")}
               + 1e-8, 6) AS cos
  FROM embeddings e CROSS JOIN cent{r} c
  WHERE e.embedding IS NOT NULL
),
best{r} AS (
  SELECT vec_id, centroid_id FROM (
    SELECT vec_id, centroid_id,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY cos DESC, centroid_id) AS rn
    FROM assign{r}
  ) WHERE rn = 1
),
cent{r + 1} AS (
  SELECT centroid_id, list(v ORDER BY dim) AS c_emb FROM (
    SELECT b.centroid_id, d.dim,
           round(avg(e.embedding[d.dim]::DOUBLE) + 1e-8, 6) AS v
    FROM best{r} b
    JOIN embeddings e ON b.vec_id = e.vec_id
    CROSS JOIN (SELECT unnest(range(1, {dim} + 1)) AS dim) d
    GROUP BY b.centroid_id, d.dim
  ) GROUP BY centroid_id
)""")
    stages.append(f"""final_assign AS (
  SELECT e.vec_id, c.centroid_id,
         round({_duck_cos("list_transform(e.embedding, x -> x::DOUBLE)", "c.c_emb")}
               + 1e-8, 6) AS cos
  FROM embeddings e CROSS JOIN cent{rounds} c
),
kbest AS (
  SELECT vec_id, centroid_id, cos FROM (
    SELECT vec_id, centroid_id, cos,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY cos DESC, centroid_id) AS rn
    FROM final_assign
  ) WHERE rn = 1
)""")
    return ",\n".join(stages)


def _kmeans_sql(k: int = 8, rounds: int = 2, dim: int = 64) -> str:
    """Unrolled Lloyd iteration mirroring similarity.ivf_build_kmeans —
    see :func:`_kmeans_assign_ctes` (shared with the semdedup oracle)."""
    return f"""
WITH {_kmeans_assign_ctes(k, rounds, dim)}
SELECT vec_id, CAST(centroid_id AS BIGINT) AS centroid_id, cos AS cosine
FROM kbest"""


def _semdedup_sql(
    k: int = 8, rounds: int = 2, dim: int = 64, threshold: float = 0.35
) -> str:
    """Oracle for similarity.semdedup: the SAME unrolled-Lloyd assignment
    CTEs as the ann_ivf_build_kmeans oracle (so a kmeans divergence shows
    up there first), then within-cell a<b pairs at 6dp-rounded cosine >=
    threshold mark the higher id dropped."""
    return f"""
WITH {_kmeans_assign_ctes(k, rounds, dim)},
mem AS (
  SELECT b.vec_id, b.centroid_id,
         list_transform(e.embedding, x -> x::DOUBLE) AS emb
  FROM kbest b JOIN embeddings e ON b.vec_id = e.vec_id
),
dropped AS (
  SELECT DISTINCT y.vec_id
  FROM mem x JOIN mem y
    ON x.centroid_id = y.centroid_id AND x.vec_id < y.vec_id
  WHERE round({_duck_cos("x.emb", "y.emb")} + 1e-8, 6) >= {threshold}
)
SELECT b.vec_id, CAST(b.centroid_id AS BIGINT) AS centroid_id,
       (d.vec_id IS NULL) AS keep
FROM kbest b LEFT JOIN dropped d ON b.vec_id = d.vec_id"""


def _rhp_lsh_sql(threshold: float = 0.4) -> str:
    """Oracle for the random-hyperplane LSH near-dup pairs.  The +-1 plane
    matrix is the SAME Python-generated literal the Spark plan embeds
    (similarity.hyperplanes), and the dot is a list_reduce fold — the
    identical left-to-right double additions as Spark's ``aggregate`` — so
    sign bits, buckets, and candidates agree across engines by
    construction."""
    planes = similarity.hyperplanes()
    values = ",\n    ".join(
        "({j}, [{h}]::DOUBLE[])".format(
            j=j, h=", ".join(f"{x:.1f}" for x in row)
        )
        for j, row in enumerate(planes)
    )
    rows = similarity.RHP_BITS // similarity.RHP_BANDS
    return f"""
WITH planes(j, h) AS (
  VALUES
    {values}
),
bits AS (
  SELECT e.vec_id, p.j,
         CASE WHEN list_reduce(
                list_transform(range(1, {similarity.RHP_DIM} + 1),
                               i -> e.embedding[i]::DOUBLE * p.h[i]),
                (acc, v) -> acc + v) >= 0
              THEN '1' ELSE '0' END AS bit
  FROM embeddings e CROSS JOIN planes p
),
sigs AS (
  SELECT vec_id, CAST(j // {rows} AS INTEGER) AS band_id,
         string_agg(bit, '' ORDER BY j) AS sig
  FROM bits GROUP BY vec_id, j // {rows}
),
cand AS (
  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
  FROM sigs a JOIN sigs b
    ON a.band_id = b.band_id AND a.sig = b.sig AND a.vec_id < b.vec_id
)
SELECT * FROM (
  SELECT c.vec_a, c.vec_b,
         round({_duck_cos("ea.embedding::DOUBLE[]", "eb.embedding::DOUBLE[]")}
               + 1e-8, 4)
           AS cosine
  FROM cand c
  JOIN embeddings ea ON ea.vec_id = c.vec_a
  JOIN embeddings eb ON eb.vec_id = c.vec_b
) WHERE cosine >= {threshold}"""


def _ivf_search_sql(
    query_ids: tuple[int, ...] = (0, 1, 2, 3, 4),
    k: int = 10,
    n_centroids: int = 8,
    nprobe: int = 2,
) -> str:
    """Mirror of operators/similarity.py:ivf_search — assignment, probe
    ranking, and candidate scoring with the same 6dp/4dp rounding and
    tiebreaks."""
    qids = ", ".join(str(q) for q in query_ids)
    return f"""
WITH cents AS (
  SELECT vec_id AS centroid_id, embedding FROM embeddings
  WHERE vec_id < {n_centroids}
),
assign_scored AS (
  SELECT e.vec_id, c.centroid_id,
         round((list_dot_product(e.embedding::DOUBLE[], c.embedding::DOUBLE[]) / nullif(sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])) * sqrt(list_dot_product(c.embedding::DOUBLE[], c.embedding::DOUBLE[])), 0)) + 1e-8, 6) AS cos
  FROM embeddings e CROSS JOIN cents c
),
assign AS (
  SELECT vec_id, centroid_id FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id
                                 ORDER BY cos DESC, centroid_id) AS rn
    FROM assign_scored
  ) WHERE rn = 1
),
q AS (
  SELECT vec_id AS query_id, embedding AS q_emb FROM embeddings
  WHERE vec_id IN ({qids})
),
probe_scored AS (
  SELECT q.query_id, c.centroid_id, q.q_emb,
         round((list_dot_product(q.q_emb::DOUBLE[], c.embedding::DOUBLE[]) / nullif(sqrt(list_dot_product(q.q_emb::DOUBLE[], q.q_emb::DOUBLE[])) * sqrt(list_dot_product(c.embedding::DOUBLE[], c.embedding::DOUBLE[])), 0)) + 1e-8, 6) AS ccos
  FROM q CROSS JOIN cents c
),
probes AS (
  SELECT query_id, centroid_id, q_emb FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY ccos DESC, centroid_id) AS pr
    FROM probe_scored
  ) WHERE pr <= {nprobe}
),
cand AS (
  SELECT p.query_id, e.vec_id,
         (list_dot_product(p.q_emb::DOUBLE[], e.embedding::DOUBLE[]) / nullif(sqrt(list_dot_product(p.q_emb::DOUBLE[], p.q_emb::DOUBLE[])) * sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])), 0))
           AS cosine
  FROM embeddings e
  JOIN assign a ON e.vec_id = a.vec_id
  JOIN probes p ON a.centroid_id = p.centroid_id
  WHERE e.vec_id != p.query_id
),
ranked AS (
  SELECT query_id, vec_id, cosine,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, vec_id) AS rnk
  FROM cand
)
SELECT query_id, vec_id AS neighbor_id, CAST(rnk AS INTEGER) AS rnk,
       round(cosine + 1e-8, 4) AS cosine
FROM ranked WHERE rnk <= {k}"""


#: Quality-feature CTE chain ending in ``qual`` — shared by the standalone
#: text_quality_scores oracle and the end-to-end pipeline oracle.
_QUALITY_CTES = f"""
qd AS (
  SELECT doc_id,
         regexp_extract_all(lower(text), '[a-z]+') AS qtoks,
         length(text) AS n_chars_actual,
         length(regexp_replace(lower(text), '[^a-z]', '', 'g')) AS alpha_chars
  FROM documents
),
feat AS (
  SELECT doc_id,
         CAST(len(qtoks) AS INTEGER) AS word_count,
         round(COALESCE(list_sum(list_transform(qtoks, t -> length(t))), 0)::DOUBLE
               / greatest(len(qtoks), 1) + 1e-8, 4) AS avg_word_len,
         round(len(list_filter(qtoks, t -> list_contains([{_STOPS}], t)))::DOUBLE
               / greatest(len(qtoks), 1) + 1e-8, 4) AS stopword_ratio,
         round(alpha_chars::DOUBLE / greatest(n_chars_actual, 1) + 1e-8, 4)
           AS alpha_ratio
  FROM qd
),
qual AS (
  SELECT doc_id, word_count, avg_word_len, stopword_ratio, alpha_ratio,
         round(least(word_count / 100.0, 1.0) * 0.4 + stopword_ratio * 0.3
               + alpha_ratio * 0.3 + 1e-8, 4) AS quality_score
  FROM feat
)"""


def _quality_sql() -> str:
    return f"""
WITH {_QUALITY_CTES}
SELECT doc_id, word_count, avg_word_len, stopword_ratio, alpha_ratio,
       quality_score
FROM qual"""


def _classifier_logit() -> str:
    """The logistic-gate logit over the quality features, from the module's
    weight constants (repr literals → identical doubles both engines);
    shared by the classifier, curation, and staleness oracles."""
    w = quality.CLASSIFIER_WEIGHTS
    return (
        f"{quality.CLASSIFIER_BIAS!r}"
        f" + least(word_count / 100.0, 1.0) * {w['len_norm']!r}"
        f" + avg_word_len * {w['avg_word_len']!r}"
        f" + stopword_ratio * {w['stopword_ratio']!r}"
        f" + alpha_ratio * {w['alpha_ratio']!r}"
    )


def _classifier_sql() -> str:
    """Oracle for quality.quality_classifier: the SAME quality-feature
    CTEs, then the logistic score from the module's weight constants
    (embedded as repr literals so both engines evaluate the identical
    doubles; the keep gate compares the 4dp-rounded probability)."""
    logit = _classifier_logit()
    return f"""
WITH {_QUALITY_CTES},
scored AS (
  SELECT doc_id, word_count,
         round(1.0 / (1.0 + exp(-({logit}))) + 1e-8, 4) AS model_score
  FROM qual
)
SELECT doc_id, word_count, model_score,
       (model_score >= {quality.CLASSIFIER_KEEP_THRESHOLD!r}) AS keep
FROM scored"""


def _curation_v2_sql() -> str:
    """Composed oracle for pipelines.curate_documents_modern: the
    classifier CTEs (verbatim from _classifier_sql), the md5-canonical
    exact-dedup fragment (verbatim from the dedup_exact oracle), and the
    trigram decontamination CTEs (verbatim from the
    text_contamination_check oracle) — intersected on doc_id, so a
    stage/pipeline divergence is a hash mismatch in both places."""
    from ..pipelines import CONTAMINATION_MAX

    logit = _classifier_logit()
    return rf"""
WITH {_QUALITY_CTES},
scored AS (
  SELECT doc_id,
         round(1.0 / (1.0 + exp(-({logit}))) + 1e-8, 4) AS model_score
  FROM qual
),
canon AS (
  SELECT min(doc_id) AS doc_id
  FROM (SELECT doc_id,
               md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
        FROM documents)
  GROUP BY fp
),
ctoks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') AS t FROM documents
),
cgrams AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(range(1, len(t) - 1),
                i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS gram
  FROM ctoks WHERE len(t) >= 3
),
cbench AS (SELECT DISTINCT gram FROM cgrams WHERE doc_id % 97 = 0),
cont AS (
  SELECT g.doc_id,
         round(sum(CASE WHEN b.gram IS NULL THEN 0 ELSE 1 END)::DOUBLE
               / count(*) + 1e-8, 4) AS contamination_frac
  FROM cgrams g LEFT JOIN cbench b ON g.gram = b.gram
  WHERE g.doc_id % 97 <> 0
  GROUP BY 1
)
SELECT d.doc_id, d.source, s.model_score,
       COALESCE(c.contamination_frac, 0.0) AS contamination_frac
FROM documents d
JOIN canon cn ON d.doc_id = cn.doc_id
JOIN scored s ON d.doc_id = s.doc_id
LEFT JOIN cont c ON d.doc_id = c.doc_id
WHERE d.doc_id % 97 <> 0
  AND s.model_score >= {quality.CLASSIFIER_KEEP_THRESHOLD!r}
  AND COALESCE(c.contamination_frac, 0.0) <= {CONTAMINATION_MAX!r}"""


def _pipeline_sql(jaccard_threshold: float = 0.5, min_quality: float = 0.3) -> str:
    """End-to-end oracle for pipelines.prepare_documents: exact dedup
    (md5 canonical) → Jaccard>=t verified pairs → transitive components →
    drop non-canonical members → quality gate.  Composes the SAME CTE
    fragments the per-stage oracles use, so a pipeline/stage divergence
    shows up as a hash mismatch here."""
    return rf"""
WITH RECURSIVE {SQL_SHINGLES},
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS intersection
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
jac AS (
  SELECT doc_a, doc_b,
         round(intersection::DOUBLE / (sa.n + sb.n - intersection) + 1e-8, 4)
           AS jaccard
  FROM inter
  JOIN sizes sa ON sa.doc_id = doc_a
  JOIN sizes sb ON sb.doc_id = doc_b
),
verified AS (SELECT doc_a, doc_b FROM jac WHERE jaccard >= {jaccard_threshold}),
pedges AS (
  SELECT doc_a AS u, doc_b AS v FROM verified
  UNION ALL
  SELECT doc_b AS u, doc_a AS v FROM verified
),
preach AS (
  SELECT u, u AS v FROM (SELECT DISTINCT u FROM pedges)
  UNION
  SELECT r.u, e.v FROM preach r JOIN pedges e ON r.v = e.u
),
victims AS (
  SELECT u AS doc_id FROM preach GROUP BY u HAVING u != MIN(v)
),
fp AS (
  SELECT doc_id,
         md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fingerprint
  FROM documents
),
canon AS (SELECT min(doc_id) AS doc_id FROM fp GROUP BY fingerprint),
{_QUALITY_CTES}
SELECT d.doc_id, d.lang, d.source, d.text,
       q.word_count, q.avg_word_len, q.stopword_ratio, q.alpha_ratio,
       q.quality_score
FROM documents d
JOIN canon c ON d.doc_id = c.doc_id
JOIN qual q ON d.doc_id = q.doc_id
WHERE d.doc_id NOT IN (SELECT doc_id FROM victims)
  AND q.quality_score >= {min_quality}"""


#: TF-IDF CTE chain ending in ``rk(doc_id, token, tok_count, tfidf,
#: term_rank)`` — shared by the top-terms entry and the sparse-cosine
#: similarity entry (mirrors operators/corpus.py:tfidf_top_terms).
_TFIDF_CTES = """
toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS token
  FROM documents
),
tf AS (SELECT doc_id, token, count(*) AS tok_count FROM toks GROUP BY 1, 2),
doc_len AS (SELECT doc_id, sum(tok_count) AS doc_tokens FROM tf GROUP BY 1),
dfreq AS (SELECT token, count(*) AS doc_freq FROM tf GROUP BY 1),
n AS (SELECT count(*) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.token, tf.tok_count,
         round((tf.tok_count::DOUBLE / dl.doc_tokens)
               * (ln((n.n_docs + 1)::DOUBLE / (dfreq.doc_freq + 1)) + 1.0)
               + 1e-8, 4) AS tfidf
  FROM tf
  JOIN doc_len dl USING (doc_id)
  JOIN dfreq USING (token)
  CROSS JOIN n
),
rk AS (
  SELECT *, CAST(rank() OVER (PARTITION BY doc_id
                              ORDER BY tfidf DESC, token) AS INTEGER)
              AS term_rank
  FROM scored
)"""


# Benchmark-decontamination oracle — shared VERBATIM by the exact join
# spelling (text_contamination_check) and the Bloom-gated spelling
# (text_contamination_bloom): Bloom filters have no false negatives and the
# survivors are exact-verified, so both engines' results are bit-identical.
_CONTAMINATION_SQL = """
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') AS t FROM documents
),
grams AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(range(1, len(t) - 1),
                i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS gram
  FROM toks WHERE len(t) >= 3
),
bench AS (SELECT DISTINCT gram FROM grams WHERE doc_id % 97 = 0)
SELECT g.doc_id,
       CAST(count(*) AS INTEGER) AS n_grams,
       CAST(sum(CASE WHEN b.gram IS NULL THEN 0 ELSE 1 END) AS INTEGER)
         AS n_contaminated,
       round(sum(CASE WHEN b.gram IS NULL THEN 0 ELSE 1 END)::DOUBLE
             / count(*) + 1e-8, 4) AS contamination_frac
FROM grams g LEFT JOIN bench b ON g.gram = b.gram
WHERE g.doc_id % 97 <> 0
GROUP BY 1"""


LLM_CATALOG: list[QuerySpec] = [
    # --- dedup ---
    QuerySpec(
        "dedup_exact",
        dedup.exact_duplicates,
        r"""
SELECT md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fingerprint,
       min(doc_id) AS canonical_doc_id, count(*) AS dup_count
FROM documents GROUP BY 1""",
        tags=("llm", "dedup"),
    ),
    QuerySpec(
        "dedup_exact_substring",
        dedup.exact_substring_pairs,
        """
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') AS t FROM documents
),
idx AS (
  SELECT doc_id, t, unnest(range(1, len(t) - 8 + 2)) AS i
  FROM toks WHERE len(t) >= 8
),
win AS (
  SELECT DISTINCT doc_id,
         md5(list_aggregate(t[i:i+7], 'string_agg', ' ')) AS h
  FROM idx
),
rare AS (SELECT h FROM win GROUP BY h HAVING count(*) <= 100),
keyed AS (SELECT w.doc_id, w.h FROM win w JOIN rare r ON w.h = r.h)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(count(*) AS INTEGER) AS shared_windows
FROM keyed a JOIN keyed b ON a.h = b.h AND a.doc_id < b.doc_id
GROUP BY 1, 2""",
        tags=("llm", "dedup"),
    ),
    QuerySpec(
        "dedup_ngram_jaccard",
        dedup.ngram_jaccard_pairs,
        f"""
WITH {SQL_SHINGLES},
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS intersection
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
jac AS (
  SELECT doc_a, doc_b, intersection, sa.n AS size_a, sb.n AS size_b,
         round(intersection::DOUBLE / (sa.n + sb.n - intersection) + 1e-8, 4)
           AS jaccard
  FROM inter
  JOIN sizes sa ON sa.doc_id = doc_a
  JOIN sizes sb ON sb.doc_id = doc_b
)
SELECT * FROM jac WHERE jaccard >= 0.5""",
        headline=True,
        tags=("llm", "dedup"),
    ),
    QuerySpec(
        "dedup_containment",
        dedup.containment_pairs,
        f"""
WITH {SQL_SHINGLES},
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
rare AS (
  SELECT shingle FROM sh GROUP BY shingle HAVING count(*) <= 5
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM sh a
  JOIN rare r ON a.shingle = r.shingle
  JOIN sh b ON b.shingle = a.shingle AND a.doc_id < b.doc_id
),
inter AS (
  SELECT c.doc_a, c.doc_b, count(*) AS intersection
  FROM cand c
  JOIN sh x ON x.doc_id = c.doc_a
  JOIN sh y ON y.doc_id = c.doc_b AND y.shingle = x.shingle
  GROUP BY 1, 2
),
scored AS (
  SELECT doc_a, doc_b, sa.n AS size_a, sb.n AS size_b, intersection,
         round(intersection::DOUBLE / least(sa.n, sb.n) + 1e-8, 4)
           AS containment
  FROM inter
  JOIN sizes sa ON sa.doc_id = doc_a
  JOIN sizes sb ON sb.doc_id = doc_b
)
SELECT * FROM scored WHERE containment >= 0.8""",
        headline=True,
        tags=("llm", "dedup", "containment"),
    ),
    QuerySpec(
        "dedup_minhash_lsh",
        dedup.minhash_lsh_candidates,
        _minhash_lsh_sql(),
        headline=True,
        tags=("llm", "dedup"),
    ),
    QuerySpec(
        "dedup_components",
        dedup.duplicate_components,
        _components_sql(),
        headline=True,
        tags=("llm", "dedup"),
    ),
    QuerySpec(
        "dedup_keep_canonical",
        dedup.keep_canonical,
        _keep_canonical_sql(),
        tags=("llm", "dedup"),
    ),
    QuerySpec(
        "dedup_keep_best_quality",
        dedup.keep_best_quality,
        _keep_best_quality_sql(),
        tags=("llm", "dedup", "quality"),
    ),
    QuerySpec(
        "dedup_simhash",
        dedup.simhash_fingerprints,
        _simhash_sql(),
        tags=("llm", "dedup"),
    ),
    QuerySpec(
        "dedup_edit_distance_verify",
        dedup.edit_distance_verify,
        f"""
WITH {_lsh_ctes()},
paired AS (
  SELECT c.doc_a, c.doc_b, da.text AS text_a, db.text AS text_b
  FROM cand c
  JOIN documents da ON da.doc_id = c.doc_a
  JOIN documents db ON db.doc_id = c.doc_b
)
SELECT doc_a, doc_b,
       CAST(levenshtein(text_a, text_b) AS INTEGER) AS edit_distance,
       round(levenshtein(text_a, text_b)::DOUBLE
             / greatest(length(text_a), length(text_b)) + 1e-8, 4)
         AS edit_ratio
FROM paired
WHERE round(levenshtein(text_a, text_b)::DOUBLE
            / greatest(length(text_a), length(text_b)) + 1e-8, 4) <= 0.2""",
        tags=("llm", "dedup", "verify"),
    ),
    # --- similarity search ---
    QuerySpec(
        "ann_brute_force_topk",
        similarity.brute_force_topk,
        _ANN_SQL_TEMPLATE.format(label_pred=""),
        headline=True,
        tags=("llm", "similarity"),
    ),
    QuerySpec(
        "ann_partitioned_topk",
        similarity.partitioned_topk,
        _ANN_SQL_TEMPLATE.format(label_pred=" AND e.label = q.q_label"),
        tags=("llm", "similarity"),
    ),
    QuerySpec(
        "ann_ivf_assign",
        similarity.ivf_assign,
        """
WITH cents AS (
  SELECT vec_id AS centroid_id, embedding FROM embeddings WHERE vec_id < 8
),
scored AS (
  SELECT e.vec_id, c.centroid_id,
         round((list_dot_product(e.embedding::DOUBLE[], c.embedding::DOUBLE[]) / nullif(sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])) * sqrt(list_dot_product(c.embedding::DOUBLE[], c.embedding::DOUBLE[])), 0)) + 1e-8, 6) AS cos
  FROM embeddings e CROSS JOIN cents c
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY vec_id
                               ORDER BY cos DESC, centroid_id) AS rn
  FROM scored
)
SELECT vec_id, CAST(centroid_id AS BIGINT) AS centroid_id,
       cos AS cosine
FROM ranked WHERE rn = 1""",
        tags=("llm", "similarity"),
    ),
    QuerySpec(
        "ann_ivf_search",
        similarity.ivf_search,
        _ivf_search_sql(),
        headline=True,
        tags=("llm", "similarity"),
    ),
    QuerySpec(
        "ann_ivf_build_kmeans",
        similarity.ivf_build_kmeans,
        _kmeans_sql(),
        tags=("llm", "similarity"),
    ),
    QuerySpec(
        "embedding_semdedup",
        similarity.semdedup,
        _semdedup_sql(threshold=similarity.SEMDEDUP_THRESHOLD),
        headline=True,
        tags=("llm", "similarity", "dedup"),
    ),
    # embedding_near_duplicates RETIRED in round 10 (near-twin
    # retirement): embedding_near_duplicates_lsh gates the same
    # near-duplicate discovery through the random-hyperplane LSH scale
    # path (no label blocking needed); the exact label-blocked operator
    # stays, covered by tests/test_llm_ops.py and test_plan_shapes.py.
    QuerySpec(
        "embedding_near_duplicates_lsh",
        similarity.embedding_near_duplicates_lsh,
        _rhp_lsh_sql(),
        tags=("llm", "similarity"),
    ),
    QuerySpec(
        "stratified_sample",
        quality.stratified_sample,
        f"""
WITH d AS (
  SELECT doc_id,
         CASE WHEN len(regexp_extract_all(lower(text), '[a-z]+'))
                   < {quality.SHORT_MAX_TOKENS} THEN 'short'
              WHEN len(regexp_extract_all(lower(text), '[a-z]+'))
                   < {quality.MEDIUM_MAX_TOKENS} THEN 'medium'
              ELSE 'long' END AS bucket,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6))::BIGINT % 100
           AS keep_hash
  FROM documents
)
SELECT doc_id, bucket, CAST(keep_hash AS INTEGER) AS keep_hash
FROM d
WHERE keep_hash < CASE bucket WHEN 'short' THEN {quality.SAMPLE_RATES['short']}
                              WHEN 'medium' THEN {quality.SAMPLE_RATES['medium']}
                              ELSE {quality.SAMPLE_RATES['long']} END""",
        tags=("llm", "sampling"),
    ),
    QuerySpec(
        "train_split_assign",
        quality.train_split_assign,
        """
WITH b AS (
  SELECT ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6))::BIGINT % 100
           AS bucket
  FROM documents
)
SELECT CASE WHEN bucket < 90 THEN 'train'
            WHEN bucket < 95 THEN 'val'
            ELSE 'test' END AS split,
       count(*) AS n_docs
FROM b GROUP BY 1""",
        tags=("llm", "split"),
    ),
    # --- text analysis ---
    QuerySpec(
        "text_language_id",
        quality.language_id,
        _lang_id_sql(),
        tags=("llm", "text-analysis"),
    ),
    QuerySpec(
        "text_quality_scores",
        quality.quality_scores,
        _quality_sql(),
        headline=True,
        tags=("llm", "text-analysis"),
    ),
    QuerySpec(
        "text_quality_classifier",
        quality.quality_classifier,
        _classifier_sql(),
        tags=("llm", "text-analysis", "quality"),
    ),
    QuerySpec(
        "text_token_counts",
        quality.token_counts,
        r"""
SELECT doc_id,
       CAST(len(regexp_split_to_array(trim(text), '\s+')) AS INTEGER)
         AS ws_tokens,
       CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]'))
            AS INTEGER) AS bpe_ish_tokens,
       CAST(length(text) AS INTEGER) AS n_chars_actual
FROM documents""",
        tags=("llm", "text-analysis"),
    ),
    QuerySpec(
        "text_document_fingerprints",
        quality.document_fingerprints,
        r"""
WITH fp AS (
  SELECT doc_id,
         md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fingerprint,
         CAST(len(regexp_extract_all(lower(text), '[a-z]+')) AS INTEGER)
           AS n_tokens
  FROM documents
)
SELECT doc_id, fingerprint, substr(fingerprint, 1, 2) AS shard_bucket, n_tokens
FROM fp""",
        tags=("llm", "text-analysis"),
    ),
    # --- chunking / packing ---
    QuerySpec(
        "chunk_documents",
        chunking.chunk_documents,
        r"""
WITH toks AS (
  SELECT doc_id,
         regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]') AS t
  FROM documents
),
nz AS (SELECT doc_id, t, len(t) AS n FROM toks WHERE len(t) > 0),
starts AS (
  -- cap mirrors chunk_documents: no start inside the final overlap region,
  -- so the last chunk always contributes tokens beyond the previous one
  SELECT doc_id, t, n, unnest(range(0, greatest(n - 10, 1), 40)) AS start
  FROM nz
)
SELECT doc_id,
       CAST(start / 40 AS INTEGER) AS chunk_id,
       CAST(start AS INTEGER) AS start,
       CAST(least(50, n - start) AS INTEGER) AS chunk_len,
       array_to_string(list_slice(t, start + 1, least(start + 50, n)), ' ')
         AS chunk_text
FROM starts""",
        tags=("llm", "chunking"),
    ),
    QuerySpec(
        "pack_documents",
        chunking.pack_documents,
        f"""
WITH c AS (
  SELECT doc_id, CAST(doc_id % {chunking.PACK_SHARDS} AS INTEGER) AS shard,
         CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]'))
              AS INTEGER) AS n_tokens
  FROM documents
),
w AS (
  SELECT doc_id, shard, n_tokens,
         sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                             ROWS UNBOUNDED PRECEDING) AS cum
  FROM c
)
SELECT doc_id, shard, n_tokens,
       CAST(cum - n_tokens AS BIGINT) AS offset,
       CAST(floor((cum - n_tokens) / {float(chunking.PACK_CAPACITY)})
            AS INTEGER) AS start_block,
       CAST(floor((cum - 1) / {float(chunking.PACK_CAPACITY)})
            AS INTEGER) AS end_block
FROM w WHERE n_tokens > 0""",
        headline=True,
        tags=("llm", "chunking"),
    ),
    # --- multimodal ---
    QuerySpec(
        "multimodal_decoded_metadata",
        multimodal.decoded_metadata,
        """
SELECT doc_id, CAST(strlen(text) AS INTEGER) AS n_bytes, md5(text) AS content_md5,
       CAST(strlen(text) % 64 + 16 AS INTEGER) AS width,
       CAST((doc_id * 7) % 64 + 16 AS INTEGER) AS height,
       3 AS channels, 'stub' AS decode_status
FROM documents""",
        tags=("llm", "multimodal"),
    ),
    QuerySpec(
        "multimodal_png_decode",
        multimodal.png_roundtrip_metadata,
        """
SELECT doc_id,
       CAST(doc_id % 64 + 16 AS INTEGER) AS width,
       CAST((doc_id * 7) % 64 + 16 AS INTEGER) AS height,
       3 AS channels, 'ok' AS decode_status
FROM documents""",
        tags=("llm", "multimodal"),
    ),
    QuerySpec(
        "multimodal_frame_sample",
        multimodal.frame_sample,
        """
SELECT doc_id, CAST(strlen(text) AS INTEGER) AS n_bytes, md5(text) AS content_md5
FROM documents WHERE doc_id % 10 = 0""",
        tags=("llm", "multimodal"),
    ),
    # --- end-to-end pipeline (pipelines.py) ---
    QuerySpec(
        "pipeline_surviving_docs",
        pipelines.prepare_documents,
        _pipeline_sql(),
        tags=("llm", "pipeline"),
    ),
    QuerySpec(
        "pipeline_curated_modern",
        pipelines.curate_documents_modern,
        _curation_v2_sql(),
        headline=True,
        tags=("llm", "pipeline"),
    ),
    QuerySpec(
        "multimodal_video_frame_features",
        multimodal.video_frame_features,
        """
WITH frames AS (
  SELECT d.doc_id, f.r AS frame_idx,
         CAST(d.doc_id % 20 + 5 AS INTEGER) AS n_frames
  FROM documents d, range(25) f(r)
  WHERE f.r < d.doc_id % 20 + 5 AND f.r % 5 = 0
)
SELECT fr.doc_id, CAST(fr.frame_idx AS INTEGER) AS frame_idx, fr.n_frames,
       32 AS width, 24 AS height,
       (SELECT round(avg(CAST((fr.doc_id + fr.frame_idx + x.r + y.r) % 256
                              AS DOUBLE)) + 1e-8, 4)
        FROM range(32) x(r), range(24) y(r)) AS mean_pixel
FROM frames fr""",
        tags=("llm", "multimodal", "video"),
    ),
    QuerySpec(
        "multimodal_wav_features",
        multimodal.wav_feature_extract,
        """
SELECT d.doc_id,
       16000 AS sample_rate, 1 AS channels, 16 AS bits,
       CAST(d.doc_id % 800 + 100 AS INTEGER) AS n_samples,
       (SELECT round(sqrt(avg(CAST(
                 ((d.doc_id * 31 + i.r * 7) % 65536 - 32768)
                 * ((d.doc_id * 31 + i.r * 7) % 65536 - 32768) AS DOUBLE)))
               + 1e-8, 3)
        FROM range(900) i(r)
        WHERE i.r < d.doc_id % 800 + 100) AS rms
FROM documents d""",
        tags=("llm", "multimodal", "audio"),
    ),
    # --- corpus-global statistics (operators/corpus.py) ---
    QuerySpec(
        "corpus_vocabulary",
        corpus.vocabulary,
        """
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS token
  FROM documents
),
vocab AS (
  SELECT token, count(*) AS freq, count(DISTINCT doc_id) AS doc_freq
  FROM toks GROUP BY 1
)
SELECT CAST(row_number() OVER (ORDER BY freq DESC, token) AS INTEGER)
         AS token_id,
       token, freq, doc_freq
FROM vocab""",
        tags=("llm", "corpus"),
    ),
    QuerySpec(
        "corpus_tfidf_top_terms",
        corpus.tfidf_top_terms,
        f"""
WITH {_TFIDF_CTES}
SELECT doc_id, token, tok_count, tfidf, term_rank FROM rk WHERE term_rank <= 3""",
        headline=True,
        tags=("llm", "corpus"),
    ),
    QuerySpec(
        "corpus_tfidf_similar_pairs",
        corpus.tfidf_similar_pairs,
        f"""
WITH {_TFIDF_CTES},
topk AS (SELECT doc_id, token, tfidf FROM rk WHERE term_rank <= 10),
norms AS (
  SELECT doc_id, sqrt(sum(tfidf * tfidf)) AS norm FROM topk GROUP BY 1
),
dots AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         sum(a.tfidf * b.tfidf) AS dot
  FROM topk a JOIN topk b ON a.token = b.token AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       round(dot / (na.norm * nb.norm) + 1e-8, 4) AS cosine
FROM dots
JOIN norms na ON na.doc_id = doc_a
JOIN norms nb ON nb.doc_id = doc_b
WHERE round(dot / (na.norm * nb.norm) + 1e-8, 4) >= 0.5""",
        tags=("llm", "corpus", "similarity"),
    ),
    QuerySpec(
        "corpus_repetition_scores",
        corpus.repetition_scores,
        """
WITH toks_arr AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') AS toks
  FROM documents
),
tok AS (SELECT doc_id, unnest(toks) AS token FROM toks_arr),
tc AS (SELECT doc_id, token, count(*) AS c FROM tok GROUP BY 1, 2),
tok_stats AS (
  SELECT doc_id, sum(c) AS n_tokens, max(c) AS top_token_count,
         count(*) AS n_distinct_tokens
  FROM tc GROUP BY 1
),
bg AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(toks)),
                i -> toks[i] || ' ' || toks[i+1])) AS bg
  FROM toks_arr WHERE len(toks) >= 2
),
bc AS (SELECT doc_id, bg, count(*) AS c FROM bg GROUP BY 1, 2),
bg_stats AS (
  SELECT doc_id, sum(c) AS n_bigrams, count(*) AS n_distinct_bigrams
  FROM bc GROUP BY 1
)
SELECT t.doc_id, CAST(t.n_tokens AS BIGINT) AS n_tokens,
       round(t.top_token_count::DOUBLE / t.n_tokens + 1e-8, 4)
         AS top_token_frac,
       round(t.n_distinct_tokens::DOUBLE / t.n_tokens + 1e-8, 4)
         AS distinct_token_ratio,
       round(coalesce(1.0 - b.n_distinct_bigrams::DOUBLE / b.n_bigrams, 0.0)
             + 1e-8, 4) AS dup_bigram_frac
FROM tok_stats t LEFT JOIN bg_stats b USING (doc_id)""",
        tags=("llm", "corpus"),
    ),
    # --- mergeable sketches (operators/sketches.py) ---
    # No DuckDB oracle: DataSketches HLL estimates are deterministic but
    # engine-specific (DuckDB's approx_count_distinct is a different HLL).
    # Gated by tests/test_llm_ops.py: accuracy vs exact distinct,
    # merge-vs-direct agreement, rolling-union semantics.
    QuerySpec(
        "sketch_daily_user_hll",
        sketches.daily_user_sketches,
        None,
        tags=("llm", "sketch"),
    ),
    QuerySpec(
        "sketch_merged_distinct_users",
        sketches.merged_distinct_users,
        None,
        tags=("llm", "sketch"),
    ),
    QuerySpec(
        "sketch_rolling_7d_users",
        sketches.rolling_distinct_users,
        None,
        tags=("llm", "sketch"),
    ),
    # --- REAL multimodal pixel tier (operators/multimodal.py) ---
    # Oracles recompute means ARITHMETICALLY from the fixture pixel formula
    # pixel(x,y) = (doc_id + x + y) % 256 — a hash match proves the zlib
    # inflate + unfilter decode (and the resize index math) byte-correct.
    QuerySpec(
        "multimodal_png_features",
        multimodal.png_feature_extract,
        """
SELECT d.doc_id,
       CAST(d.doc_id % 64 + 16 AS INTEGER) AS width,
       CAST(d.doc_id * 7 % 64 + 16 AS INTEGER) AS height,
       CAST((d.doc_id % 64 + 16) * (d.doc_id * 7 % 64 + 16) AS BIGINT)
         AS n_pixels,
       (SELECT round(avg(CAST((d.doc_id + x.r + y.r) % 256 AS DOUBLE))
                     + 1e-8, 4)
        FROM range(80) x(r), range(80) y(r)
        WHERE x.r < d.doc_id % 64 + 16
          AND y.r < d.doc_id * 7 % 64 + 16) AS mean_pixel
FROM documents d""",
        tags=("llm", "multimodal", "pixels"),
    ),
    QuerySpec(
        "multimodal_png_resize",
        multimodal.png_resize_features,
        """
SELECT d.doc_id, 16 AS out_width, 16 AS out_height,
       (SELECT round(avg(CAST((d.doc_id
                 + (tx.r * (d.doc_id % 64 + 16)) // 16
                 + (ty.r * (d.doc_id * 7 % 64 + 16)) // 16) % 256 AS DOUBLE))
                     + 1e-8, 4)
        FROM range(16) tx(r), range(16) ty(r)) AS mean_pixel
FROM documents d""",
        tags=("llm", "multimodal", "pixels"),
    ),
    QuerySpec(
        "mixture_sample_by_source",
        quality.mixture_sample,
        """
WITH h AS (
  SELECT doc_id, source,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6))::BIGINT
              % 100 AS INTEGER) AS keep_hash,
         CAST(CASE source WHEN 'src0' THEN 100 WHEN 'src1' THEN 75 WHEN 'src2' THEN 50 WHEN 'src3' THEN 25 WHEN 'src4' THEN 10 ELSE 0 END AS INTEGER) AS keep_rate
  FROM documents
)
SELECT doc_id, source, keep_hash, keep_rate
FROM h WHERE keep_hash < keep_rate""",
        tags=("llm", "sampling", "mixture"),
    ),
    QuerySpec(
        "training_shard_assignment",
        quality.training_shard_assignment,
        # modulus is the engine default's own constant (ADVICE r5)
        f"""
WITH d AS (
  SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS h,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6))::BIGINT
              % {quality.TRAINING_SHARDS} AS INTEGER) AS shard
  FROM documents
)
SELECT doc_id, shard,
       CAST(row_number() OVER (PARTITION BY shard ORDER BY h, doc_id)
            AS INTEGER) AS pos_in_shard
FROM d""",
        tags=("llm", "sharding"),
    ),
    # --- quality-proportional sampling (operators/quality.py) ---
    QuerySpec(
        "quality_weighted_sample",
        quality.quality_weighted_sample,
        f"""
WITH {_QUALITY_CTES},
hashed AS (
  SELECT doc_id, quality_score,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6))::BIGINT
              % 10000 AS INTEGER) AS keep_hash
  FROM qual
)
SELECT doc_id, quality_score, keep_hash
FROM hashed
WHERE keep_hash < round(quality_score * 10000 + 1e-6, 0)""",
        tags=("llm", "sampling"),
    ),
    # --- fixed-budget weighted sampling (operators/corpus.py) ---
    # Efraimidis-Spirakis exponential keys: -ln(u)/w, k smallest per
    # stratum = weighted sampling without replacement.  u is the seedless
    # md5(doc_id) uniform; w = ln(1 + n_chars).  The oracle spells the
    # identical arithmetic, so rank-order and the 6dp-rounded key must
    # both match — including the explicit weight-0 +inf branch (ANSI
    # Spark raises DIVIDE_BY_ZERO and DuckDB yields NULL on the naive
    # spelling; both sides guard identically so an n_chars=0 doc keys
    # to +inf in each engine).
    QuerySpec(
        "corpus_priority_sample",
        corpus.priority_sample,
        f"""
WITH keyed AS (
  SELECT source, doc_id, n_chars,
         CASE WHEN n_chars > 0 THEN
           -ln((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                + 0.5) / 4294967296.0)
             / ln(1.0 + n_chars)
         ELSE 'infinity'::DOUBLE END AS k
  FROM documents
)
SELECT source, doc_id, n_chars,
       round(k + 1e-8, 6) AS priority,
       CAST(row_number() OVER (PARTITION BY source ORDER BY k, doc_id)
            AS INTEGER) AS rnk
FROM keyed
QUALIFY row_number() OVER (PARTITION BY source ORDER BY k, doc_id)
        <= {corpus.PRIORITY_SAMPLE_K}""",
        tags=("llm", "sampling", "priority"),
    ),
    # --- token-budget corpus selection (operators/corpus.py) ---
    # Oracle: the GLOBAL ordered cumulative sum the two-phase Spark plan is
    # provably equivalent to (buckets partition disjoint quality ranges).
    QuerySpec(
        "corpus_select_token_budget",
        corpus.select_corpus_token_budget,
        f"""
WITH {_QUALITY_CTES},
ordered AS (
  SELECT doc_id, word_count, quality_score,
         CAST(sum(word_count) OVER (
                ORDER BY quality_score DESC, doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS cum_tokens
  FROM qual
)
SELECT doc_id, word_count, quality_score, cum_tokens
FROM ordered WHERE cum_tokens <= 2000""",
        tags=("llm", "corpus", "selection"),
    ),
    # --- embedding storage (int8 quantization) ---
    QuerySpec(
        "embedding_quantize_int8",
        similarity.quantize_embeddings_int8,
        """
WITH s AS (
  SELECT vec_id, label, embedding::DOUBLE[] AS e,
         greatest(list_max(list_transform(embedding::DOUBLE[],
                                          x -> abs(x))), 1e-12) AS ma
  FROM embeddings
)
SELECT vec_id, label,
       round(ma + 1e-8, 6) AS scale_max_abs,
       array_to_string(list_transform(e,
         x -> CAST(round(x / ma * 127.0 + 1e-8) AS INTEGER)), ',') AS q_csv
FROM s""",
        tags=("llm", "similarity", "quantization"),
    ),
    QuerySpec(
        "sketch_count_min_heavy_hitters",
        sketches.count_min_heavy_hitters,
        """
WITH js AS (SELECT unnest(range(0, 4)) AS j),
ev AS (SELECT user_id FROM events),
keyed AS (
  SELECT js.j,
         ('0x' || substr(md5(CAST(js.j AS VARCHAR) || '|'
                             || CAST(ev.user_id AS VARCHAR)), 1, 8))::BIGINT
           % 256 AS bucket
  FROM ev CROSS JOIN js
),
cms AS (SELECT j, bucket, count(*) AS cnt FROM keyed GROUP BY 1, 2),
users AS (SELECT DISTINCT user_id FROM ev),
probes AS (
  SELECT u.user_id, js.j,
         ('0x' || substr(md5(CAST(js.j AS VARCHAR) || '|'
                             || CAST(u.user_id AS VARCHAR)), 1, 8))::BIGINT
           % 256 AS bucket
  FROM users u CROSS JOIN js
)
SELECT p.user_id, CAST(min(c.cnt) AS BIGINT) AS est_events
FROM probes p JOIN cms c ON p.j = c.j AND p.bucket = c.bucket
GROUP BY 1 HAVING min(c.cnt) >= 15 ORDER BY 1""",
        tags=("llm", "sketch", "cms"),
    ),
    QuerySpec(
        "stratified_fixed_n_sample",
        quality.stratified_fixed_n_sample,
        """
WITH d AS (
  SELECT doc_id, lang,
         row_number() OVER (PARTITION BY lang
                            ORDER BY md5(CAST(doc_id AS VARCHAR))) AS rk
  FROM documents
)
SELECT doc_id, lang, CAST(rk AS INTEGER) AS rk FROM d WHERE rk <= 40""",
        tags=("llm", "sampling"),
    ),
    # --- round-3 scrubbing / LM-quality / PQ tier ---
    # Oracle mirrors operators/scrubbing.py:_with_synthetic_pii exactly.
    QuerySpec(
        "text_pii_redaction",
        scrubbing.pii_redaction,
        r"""
WITH aug AS (
  SELECT doc_id,
         text
         || CASE WHEN doc_id % 3 = 0
                 THEN ' reach user' || CAST(doc_id AS VARCHAR) || '@example.com'
                 ELSE '' END
         || CASE WHEN doc_id % 5 = 0
                 THEN ' call 555-' || CAST(1000 + doc_id % 9000 AS VARCHAR)
                 ELSE '' END
         || CASE WHEN doc_id % 7 = 0
                 THEN ' host 10.' || CAST(doc_id % 256 AS VARCHAR)
                      || '.' || CAST((doc_id // 256) % 256 AS VARCHAR)
                      || '.' || CAST(doc_id % 100 AS VARCHAR)
                 ELSE '' END AS aug
  FROM documents
),
red AS (
  -- staged redaction: each pattern counts on the intermediate it is
  -- actually replaced on (mirrors operators/scrubbing.py:pii_redaction)
  SELECT doc_id, aug,
         regexp_replace(aug,
           '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-z]{2,}', '[EMAIL]', 'g')
           AS after_email
  FROM aug
),
red2 AS (
  SELECT doc_id, aug, after_email,
         regexp_replace(after_email, '\b555-[0-9]{4}\b', '[PHONE]', 'g')
           AS after_phone
  FROM red
),
red3 AS (
  SELECT doc_id, aug, after_email, after_phone,
         regexp_replace(after_phone,
           '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '[IP]', 'g')
           AS redacted
  FROM red2
)
SELECT doc_id,
       CAST(len(regexp_extract_all(aug,
         '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-z]{2,}')) AS INTEGER) AS n_emails,
       CAST(len(regexp_extract_all(after_email, '\b555-[0-9]{4}\b')) AS INTEGER)
         AS n_phones,
       CAST(len(regexp_extract_all(after_phone,
         '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b')) AS INTEGER)
         AS n_ips,
       md5(redacted) AS redacted_md5,
       CAST(length(aug) - length(redacted) AS INTEGER) AS chars_removed
FROM red3""",
        headline=True,
        tags=("llm", "scrubbing"),
    ),
    QuerySpec(
        "text_contamination_check",
        scrubbing.contamination_check,
        _CONTAMINATION_SQL,
        tags=("llm", "scrubbing", "contamination"),
    ),
    # text_contamination_bloom RETIRED in round 10 (near-twin
    # retirement): the Bloom sketch-then-verify spelling is bit-identical
    # to text_contamination_check (no false negatives, shared
    # _CONTAMINATION_SQL oracle), which stays gated; the bloom operator
    # stays, pinned bit-identical by
    # tests/test_llm_ops.py::test_contamination_bloom_matches_exact_twin
    # and by the streaming bloom-gate tests.
    QuerySpec(
        "corpus_unigram_surprisal",
        corpus.unigram_surprisal,
        """
WITH occ AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS token
  FROM documents
),
per_doc AS (
  SELECT doc_id, token, count(*) AS c FROM occ GROUP BY 1, 2
),
model AS (
  SELECT token, CAST(sum(c) AS BIGINT) AS tok_total FROM per_doc GROUP BY 1
),
total AS (SELECT CAST(sum(tok_total) AS BIGINT) AS corpus_total FROM model)
SELECT p.doc_id,
       CAST(sum(p.c) AS BIGINT) AS n_tokens,
       round(sum(p.c * -ln(m.tok_total::DOUBLE / t.corpus_total))
             / sum(p.c) + 1e-8, 4) AS mean_surprisal
FROM per_doc p JOIN model m ON p.token = m.token CROSS JOIN total t
GROUP BY 1""",
        tags=("llm", "corpus", "quality"),
    ),
    QuerySpec(
        "corpus_bigram_surprisal",
        corpus.bigram_surprisal,
        f"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') AS t
  FROM documents
),
grams AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1]))
           AS gram
  FROM toks
),
per_doc AS (
  SELECT doc_id, split_part(gram, ' ', 1) AS w1,
         split_part(gram, ' ', 2) AS w2, count(*) AS c
  FROM grams GROUP BY 1, 2, 3
),
bi AS (SELECT w1, w2, sum(c) AS bi_total FROM per_doc GROUP BY 1, 2),
ctx AS (SELECT w1, sum(bi_total) AS ctx_total FROM bi GROUP BY 1),
uni AS (SELECT w2, sum(c) AS uni_total FROM per_doc GROUP BY 1),
total AS (SELECT sum(uni_total) AS corpus_total FROM uni)
SELECT p.doc_id,
       CAST(sum(p.c) AS BIGINT) AS n_bigrams,
       round(sum(p.c * -ln({corpus.BIGRAM_LAMBDA!r} * (b.bi_total / x.ctx_total)
                           + {corpus.BIGRAM_BACKOFF!r} * (u.uni_total / t.corpus_total)))
             / sum(p.c) + 1e-8, 4) AS mean_surprisal
FROM per_doc p
JOIN bi b ON p.w1 = b.w1 AND p.w2 = b.w2
JOIN ctx x ON p.w1 = x.w1
JOIN uni u ON p.w2 = u.w2
CROSS JOIN total t
GROUP BY 1""",
        tags=("llm", "corpus", "quality"),
    ),
    QuerySpec(
        "embedding_pq_codes",
        similarity.pq_codes,
        """
WITH cents AS (
  SELECT vec_id AS code, embedding::DOUBLE[] AS cvec
  FROM embeddings WHERE vec_id < 16
),
pairs AS (
  SELECT e.vec_id, s.sub, c.code,
         list_sum(list_transform(range(1, 9),
           i -> (e.embedding[s.sub * 8 + i]::DOUBLE
                 - c.cvec[s.sub * 8 + i])
                * (e.embedding[s.sub * 8 + i]::DOUBLE
                   - c.cvec[s.sub * 8 + i]))) AS dist
  FROM embeddings e
  CROSS JOIN (SELECT unnest(range(0, 8)) AS sub) s
  CROSS JOIN cents c
),
best AS (
  SELECT vec_id, sub, code, dist,
         row_number() OVER (PARTITION BY vec_id, sub
                            ORDER BY dist, code) AS rk
  FROM pairs
)
SELECT vec_id, CAST(sub AS INTEGER) AS sub, CAST(code AS INTEGER) AS code,
       round(dist + 1e-8, 4) AS dist
FROM best WHERE rk = 1""",
        tags=("llm", "similarity", "quantization"),
    ),
    # --- round-4 additions: PQ asymmetric-distance search + boilerplate ---
    QuerySpec(
        "ann_pq_adc_topk",
        similarity.pq_adc_topk,
        """
WITH cents AS (
  SELECT vec_id AS code, embedding::DOUBLE[] AS cvec
  FROM embeddings WHERE vec_id < 16
),
pairs AS (
  SELECT e.vec_id, s.sub, c.code,
         list_sum(list_transform(range(1, 9),
           i -> (e.embedding[s.sub * 8 + i]::DOUBLE
                 - c.cvec[s.sub * 8 + i])
                * (e.embedding[s.sub * 8 + i]::DOUBLE
                   - c.cvec[s.sub * 8 + i]))) AS dist
  FROM embeddings e
  CROSS JOIN (SELECT unnest(range(0, 8)) AS sub) s
  CROSS JOIN cents c
),
codes AS (
  SELECT vec_id, sub, code FROM (
    SELECT vec_id, sub, code,
           row_number() OVER (PARTITION BY vec_id, sub
                              ORDER BY dist, code) AS rk
    FROM pairs) WHERE rk = 1
),
queries AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS q_emb
  FROM embeddings WHERE vec_id IN (0, 1, 2, 3, 4)
),
dtab AS (
  SELECT q.query_id, s.sub, c.code,
         list_sum(list_transform(range(1, 9),
           i -> (q.q_emb[s.sub * 8 + i] - c.cvec[s.sub * 8 + i])
              * (q.q_emb[s.sub * 8 + i] - c.cvec[s.sub * 8 + i]))) AS qdist
  FROM queries q
  CROSS JOIN (SELECT unnest(range(0, 8)) AS sub) s
  CROSS JOIN cents c
),
approx AS (
  SELECT d.query_id, k.vec_id, round(sum(d.qdist) + 1e-8, 4) AS adc_dist
  FROM codes k JOIN dtab d ON k.sub = d.sub AND k.code = d.code
  WHERE k.vec_id <> d.query_id
  GROUP BY 1, 2
)
SELECT query_id, vec_id, adc_dist, CAST(rk AS INTEGER) AS rk
FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY adc_dist, vec_id) AS rk
      FROM approx)
WHERE rk <= 10""",
        headline=True,
        tags=("llm", "similarity", "quantization", "ann"),
    ),
    QuerySpec(
        "corpus_boilerplate_ngrams",
        corpus.boilerplate_ngram_fraction,
        """
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') AS t FROM documents
),
grams AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(range(1, len(t) - 1),
                i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS gram
  FROM toks WHERE len(t) >= 3
),
gfreq AS (SELECT gram, count(*) AS doc_freq FROM grams GROUP BY 1),
boiler AS (
  SELECT gram FROM (
    SELECT gram, row_number() OVER (ORDER BY doc_freq DESC, gram) AS rk
    FROM gfreq)
  WHERE rk <= 20
)
SELECT g.doc_id,
       CAST(count(*) AS INTEGER) AS n_grams,
       CAST(sum(CASE WHEN b.gram IS NULL THEN 0 ELSE 1 END) AS INTEGER)
         AS n_boilerplate,
       round(sum(CASE WHEN b.gram IS NULL THEN 0 ELSE 1 END)::DOUBLE
             / count(*) + 1e-8, 4) AS boilerplate_frac
FROM grams g LEFT JOIN boiler b ON g.gram = b.gram
GROUP BY 1""",
        tags=("llm", "corpus", "boilerplate"),
    ),
    # --- round-5 addition: the composed IVFADC pipeline -------------------
    # The from-scratch spelling (similarity.ivf_pq_search) was RETIRED
    # from the catalog in round 10 (near-twin retirement): the
    # materialized ann_ivf_pq_search_indexed entry is result-identical by
    # construction and gates the same composed oracle (_IVFADC_SQL,
    # defined at its round-6 block below); the from-scratch operator
    # stays, pinned result-identical to the indexed path by
    # tests/test_llm_ops.py::test_ivf_pq_search_indexed_parity_and_partition_pruning.
    # --- round-5 breadth: mixture rebalancing, eval integrity, index health
    QuerySpec(
        "corpus_language_mixture",
        quality.language_mixture_temperature_sample,
        r"""
WITH d AS (
  SELECT doc_id, lang,
         len(regexp_extract_all(lower(text), '[a-z]+')) AS n_tokens
  FROM documents
),
lt AS (SELECT lang, sum(n_tokens) AS lang_tokens FROM d GROUP BY 1),
mt AS (SELECT min(lang_tokens) AS min_tokens FROM lt),
rates AS (
  SELECT lang,
         CAST(floor(sqrt(min_tokens::DOUBLE
                         / greatest(lang_tokens, 1)::DOUBLE) * 10000
                    + 1e-6) AS INTEGER) AS rate_10k
  FROM lt CROSS JOIN mt
)
SELECT d.doc_id, d.lang, r.rate_10k,
       CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 6))::BIGINT
            % 10000 AS INTEGER) AS keep_hash
FROM d JOIN rates r ON d.lang = r.lang
WHERE ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 6))::BIGINT % 10000
      < r.rate_10k""",
        tags=("llm", "sampling", "mixture"),
    ),
    QuerySpec(
        "dedup_split_leakage",
        dedup.split_leakage_check,
        f"""
WITH {_lsh_ctes()},
sizes AS (SELECT doc_id, count(*) AS n_shingles FROM sh GROUP BY 1),
inter AS (
  SELECT c.doc_a, c.doc_b, count(*) AS intersection
  FROM cand c
  JOIN sh a ON a.doc_id = c.doc_a
  JOIN sh b ON b.doc_id = c.doc_b AND b.shingle = a.shingle
  GROUP BY 1, 2
),
jac AS (
  SELECT i.doc_a, i.doc_b,
         round(i.intersection::DOUBLE
               / (za.n_shingles + zb.n_shingles - i.intersection) + 1e-8, 4)
           AS jaccard
  FROM inter i
  JOIN sizes za ON za.doc_id = i.doc_a
  JOIN sizes zb ON zb.doc_id = i.doc_b
),
tagged AS (
  SELECT doc_a, doc_b, jaccard,
         ('0x' || substr(md5(CAST(doc_a AS VARCHAR)), 1, 6))::BIGINT % 100
           AS ha,
         ('0x' || substr(md5(CAST(doc_b AS VARCHAR)), 1, 6))::BIGINT % 100
           AS hb
  FROM jac WHERE jaccard >= 0.5
)
SELECT doc_a, doc_b,
       CASE WHEN ha < 90 THEN 'train' WHEN ha < 95 THEN 'val'
            ELSE 'test' END AS split_a,
       CASE WHEN hb < 90 THEN 'train' WHEN hb < 95 THEN 'val'
            ELSE 'test' END AS split_b,
       jaccard
FROM tagged
WHERE (CASE WHEN ha < 90 THEN 'train' WHEN ha < 95 THEN 'val'
            ELSE 'test' END)
   != (CASE WHEN hb < 90 THEN 'train' WHEN hb < 95 THEN 'val'
            ELSE 'test' END)""",
        tags=("llm", "dedup", "split", "audit"),
    ),
    QuerySpec(
        "embedding_cluster_balanced_sample",
        similarity.cluster_balanced_sample,
        """
WITH cents AS (
  SELECT vec_id AS centroid_id, embedding FROM embeddings WHERE vec_id < 8
),
scored AS (
  SELECT e.vec_id, c.centroid_id,
         round((list_dot_product(e.embedding::DOUBLE[], c.embedding::DOUBLE[]) / nullif(sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])) * sqrt(list_dot_product(c.embedding::DOUBLE[], c.embedding::DOUBLE[])), 0)) + 1e-8, 6) AS cos
  FROM embeddings e CROSS JOIN cents c
),
assign AS (
  SELECT vec_id, centroid_id FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id
                                 ORDER BY cos DESC, centroid_id) AS rn
    FROM scored
  ) WHERE rn = 1
)
SELECT vec_id, CAST(centroid_id AS BIGINT) AS centroid_id,
       CAST(rk AS INTEGER) AS rk
FROM (
  SELECT vec_id, centroid_id,
         row_number() OVER (PARTITION BY centroid_id
                            ORDER BY md5(CAST(vec_id AS VARCHAR))) AS rk
  FROM assign
) WHERE rk <= 40""",
        tags=("llm", "sampling", "similarity", "diversity"),
    ),
    QuerySpec(
        "ann_ivf_cell_stats",
        similarity.ivf_cell_stats,
        """
WITH cents AS (
  SELECT vec_id AS centroid_id, embedding FROM embeddings WHERE vec_id < 8
),
scored AS (
  SELECT e.vec_id, c.centroid_id,
         round((list_dot_product(e.embedding::DOUBLE[], c.embedding::DOUBLE[]) / nullif(sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])) * sqrt(list_dot_product(c.embedding::DOUBLE[], c.embedding::DOUBLE[])), 0)) + 1e-8, 6) AS cos
  FROM embeddings e CROSS JOIN cents c
),
assign AS (
  SELECT vec_id, centroid_id, cos FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id
                                 ORDER BY cos DESC, centroid_id) AS rn
    FROM scored
  ) WHERE rn = 1
),
tot AS (SELECT count(*) AS n_total FROM assign)
SELECT CAST(centroid_id AS BIGINT) AS centroid_id,
       count(*) AS n_vecs,
       round(avg(cos) + 1e-8, 4) AS avg_cos,
       round(min(cos) + 1e-8, 4) AS min_cos,
       round(count(*) * 8.0 / n_total + 1e-8, 4) AS skew
FROM assign CROSS JOIN tot
GROUP BY centroid_id, n_total""",
        tags=("llm", "similarity", "index-health"),
    ),
    # --- length-cap policy (operators/length_policy.py, built round 11;
    # --- registered round 12 per the plans/__init__.py ROUND-12 note) ---
    QuerySpec(
        "docs_length_cap",
        length_policy.cap_documents,
        length_policy.ORACLE_CAP_DOCUMENTS,
        tags=("llm", "length-policy", "curation"),
    ),
    QuerySpec(
        "docs_truncation_loss",
        length_policy.documents_truncation_loss,
        length_policy.ORACLE_TRUNCATION_LOSS,
        tags=("llm", "length-policy", "curation"),
    ),
    # --- segment scrubbing + ADC refine (operators/{segment_dedup,
    # --- refine}.py, built round 12; registered round 13 per the
    # --- plans/__init__.py ROUND-13 budget) ---
    QuerySpec(
        "docs_boilerplate_scrub",
        segment_dedup.scrub_documents,
        segment_dedup.ORACLE_SCRUB_DOCUMENTS,
        tags=("llm", "dedup", "curation"),
        headline=True,
    ),
    QuerySpec(
        "docs_boilerplate_loss",
        segment_dedup.documents_boilerplate_loss,
        segment_dedup.ORACLE_BOILERPLATE_LOSS,
        tags=("llm", "dedup", "curation"),
        headline=True,
    ),
    QuerySpec(
        "ann_adc_refine_topk",
        refine.adc_refine_topk,
        refine.ORACLE_ADC_REFINE_TOPK,
        tags=("llm", "similarity", "quantization", "ann"),
        headline=True,
    ),
    QuerySpec(
        "ann_adc_refine_recall",
        refine.adc_refine_recall_report,
        refine.ORACLE_ADC_REFINE_RECALL,
        tags=("llm", "similarity", "ann", "index-health"),
        headline=True,
    ),
    # --- trained model-based quality filter (operators/model_filter.py,
    # --- built round 12 as budget candidate (d); registered round 13
    # --- into the window's measured slack ahead of the tight round 14) ---
    QuerySpec(
        "quality_model_scores",
        model_filter.quality_model_scores,
        model_filter.ORACLE_MODEL_SCORES,
        tags=("llm", "quality", "curation", "trained"),
    ),
    QuerySpec(
        "quality_model_report",
        model_filter.quality_model_report,
        model_filter.ORACLE_MODEL_REPORT,
        tags=("llm", "quality", "curation", "trained", "report"),
    ),
]

# Python-UDTF twin: same rows, same oracle as chunk_documents (API tier).
LLM_CATALOG.append(
    QuerySpec(
        "chunk_documents_udtf",
        chunking.chunk_documents_udtf,
        next(s.oracle for s in LLM_CATALOG if s.name == "chunk_documents"),
        tags=("llm", "udtf", "twin"),
    )
)


# ---------------------------------------------------------------------------
# Round-5 evaluation/audit tier: ANN recall harness, metadata-integrity
# audit, per-source curation report card, minhash estimator calibration.
# Every oracle COMPOSES already-driver-proven fragments (nested WITH
# subqueries reuse the brute-force / ivf / lang-id / quality / LSH oracles
# verbatim), so a green row here also re-confirms the components.
# ---------------------------------------------------------------------------


def _recall_report_sql(k: int = 10) -> str:
    """Oracle for similarity.ivf_recall_report: the proven brute-force and
    ivf_search oracles verbatim as nested-WITH subqueries, then the
    query-grain hit-count / recall / mean-cosine rollup."""
    exact_sql = _ANN_SQL_TEMPLATE.format(label_pred="")
    approx_sql = _ivf_search_sql()
    return f"""
WITH exact AS ({exact_sql}),
approx AS ({approx_sql}),
hits AS (
  SELECT e.query_id, count(*) AS n_hits
  FROM exact e
  JOIN approx a ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
  GROUP BY 1
),
em AS (
  SELECT query_id, round(avg(cosine) + 1e-8, 4) AS exact_mean_cosine
  FROM exact GROUP BY 1
),
am AS (
  SELECT query_id, round(avg(cosine) + 1e-8, 4) AS ivf_mean_cosine
  FROM approx GROUP BY 1
)
SELECT em.query_id,
       CAST(COALESCE(h.n_hits, 0) AS INTEGER) AS n_hits,
       round(COALESCE(h.n_hits, 0) / {float(k)} + 1e-8, 4) AS recall_at_k,
       em.exact_mean_cosine, am.ivf_mean_cosine
FROM em
LEFT JOIN am ON em.query_id = am.query_id
LEFT JOIN hits h ON em.query_id = h.query_id
ORDER BY em.query_id"""


def _lang_audit_sql() -> str:
    """Oracle for quality.language_mislabel_audit: the proven lang-id
    oracle nested verbatim, joined back to the declared labels, rolled up
    per source."""
    return f"""
WITH pred AS ({_lang_id_sql()}),
j AS (
  SELECT d.source, d.lang, p.pred_lang
  FROM documents d JOIN pred p ON d.doc_id = p.doc_id
)
SELECT source,
       CAST(count(*) AS INTEGER) AS n_docs,
       CAST(sum(CASE WHEN pred_lang != 'und' THEN 1 ELSE 0 END) AS INTEGER)
         AS n_decided,
       CAST(sum(CASE WHEN pred_lang != 'und' AND pred_lang != lang
                     THEN 1 ELSE 0 END) AS INTEGER) AS n_mismatch,
       round(sum(CASE WHEN pred_lang != 'und' AND pred_lang != lang
                      THEN 1 ELSE 0 END)::DOUBLE
             / greatest(sum(CASE WHEN pred_lang != 'und' THEN 1 ELSE 0 END), 1)
             + 1e-8, 4) AS mismatch_rate
FROM j GROUP BY source ORDER BY source"""


def _source_report_sql() -> str:
    r"""Oracle for quality.source_curation_report: the shared quality CTEs
    + the text_document_fingerprints normalization, rolled up per source
    with the corpus-wide exact-duplicate flag."""
    return f"""
WITH {_QUALITY_CTES},
fp AS (
  SELECT doc_id,
         md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fingerprint
  FROM documents
),
dupc AS (
  SELECT fingerprint, count(*) AS n_copies FROM fp GROUP BY 1
),
base AS (
  SELECT d.source, q.word_count, q.quality_score,
         (c.n_copies > 1) AS is_dup
  FROM documents d
  JOIN qual q ON d.doc_id = q.doc_id
  JOIN fp f ON d.doc_id = f.doc_id
  JOIN dupc c ON f.fingerprint = c.fingerprint
)
SELECT source,
       CAST(count(*) AS INTEGER) AS n_docs,
       CAST(sum(word_count) AS BIGINT) AS total_tokens,
       round(avg(quality_score) + 1e-8, 4) AS avg_quality,
       CAST(sum(CASE WHEN is_dup THEN 1 ELSE 0 END) AS INTEGER) AS n_dup_docs,
       round(sum(CASE WHEN is_dup THEN 1 ELSE 0 END)::DOUBLE / count(*)
             + 1e-8, 4) AS dup_rate
FROM base GROUP BY source ORDER BY source"""


def _minhash_estimate_sql(
    bands: int = dedup.LSH_BANDS, rows: int = dedup.LSH_ROWS
) -> str:
    """Oracle for dedup.minhash_estimate_pairs: the LSH CTE chain (sigs +
    cand) verbatim, the component-match estimate, and the candidate-gated
    exact Jaccard."""
    num_perm = bands * rows
    match_sum = " + ".join(
        f"CASE WHEN a.mh_{k} = b.mh_{k} THEN 1 ELSE 0 END" for k in range(num_perm)
    )
    return f"""
WITH {_lsh_ctes(bands, rows)},
est AS (
  SELECT c.doc_a, c.doc_b,
         round(({match_sum}) / {float(num_perm)} + 1e-8, 4) AS est_jaccard
  FROM cand c
  JOIN sigs a ON c.doc_a = a.doc_id
  JOIN sigs b ON c.doc_b = b.doc_id
),
sizes AS (
  SELECT doc_id, count(*) AS n_shingles FROM sh GROUP BY 1
),
inter AS (
  SELECT c.doc_a, c.doc_b, count(*) AS intersection
  FROM cand c
  JOIN sh a ON c.doc_a = a.doc_id
  JOIN sh b ON c.doc_b = b.doc_id AND a.shingle = b.shingle
  GROUP BY 1, 2
),
ex AS (
  SELECT c.doc_a, c.doc_b,
         round(COALESCE(i.intersection, 0)::DOUBLE
               / (sa.n_shingles + sb.n_shingles - COALESCE(i.intersection, 0))
               + 1e-8, 4) AS jaccard
  FROM cand c
  LEFT JOIN inter i ON c.doc_a = i.doc_a AND c.doc_b = i.doc_b
  JOIN sizes sa ON c.doc_a = sa.doc_id
  JOIN sizes sb ON c.doc_b = sb.doc_id
)
SELECT e.doc_a, e.doc_b, e.est_jaccard, x.jaccard,
       round(abs(e.est_jaccard - x.jaccard) + 1e-8, 4) AS abs_err
FROM est e
JOIN ex x ON e.doc_a = x.doc_a AND e.doc_b = x.doc_b
ORDER BY e.doc_a, e.doc_b"""


LLM_CATALOG.extend(
    [
        # ann_ivf_recall_report RETIRED in round 10 (near-twin
        # retirement): ann_recall_curve gates the same recall@k math
        # across MULTIPLE nprobes (the tuning-curve superset of the
        # report's single-nprobe recall); the report operator (which
        # adds the mean-retrieved-cosine quality delta) stays, covered
        # by tests/test_llm_ops.py.
        QuerySpec(
            "text_language_audit",
            quality.language_mislabel_audit,
            _lang_audit_sql(),
            tags=("llm", "text-analysis", "audit"),
        ),
        QuerySpec(
            "corpus_source_report",
            quality.source_curation_report,
            _source_report_sql(),
            tags=("llm", "corpus", "audit"),
        ),
        QuerySpec(
            "dedup_minhash_estimate",
            dedup.minhash_estimate_pairs,
            _minhash_estimate_sql(),
            tags=("llm", "dedup", "evaluation"),
        ),
    ]
)


# ---------------------------------------------------------------------------
# BPE tokenizer training — unrolled-iteration oracle (same pattern as the
# kmeans unrolled-Lloyd CTEs): each merge step is a pair-count CTE, an
# argmax CTE (count DESC, 'left|right' string ASC — both engines compare
# ASCII bytewise), and a regexp_replace apply CTE with the column-valued
# \b-anchored pattern (RE2 == Java on ASCII \b and left-to-right
# non-overlapping replacement; verified on 'a a a' / 'x y x y').
# ---------------------------------------------------------------------------


def _bpe_ctes(n: int = corpus.BPE_MERGES) -> str:
    parts = [
        r"""
w0 AS (
  SELECT t AS word, count(*) AS wcount
  FROM (SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS t
        FROM documents)
  GROUP BY 1
),
s0 AS (
  SELECT word, wcount,
         array_to_string(regexp_extract_all(word, '[a-z]'), ' ') AS sym
  FROM w0
)"""
    ]
    for i in range(1, n + 1):
        parts.append(
            f""",
p{i} AS (
  SELECT unnest(list_transform(range(1, len(sl)),
                j -> sl[j] || '|' || sl[j+1])) AS pr,
         wcount
  FROM (SELECT wcount, str_split(sym, ' ') AS sl FROM s{i - 1})
),
c{i} AS (
  SELECT pr, CAST(sum(wcount) AS BIGINT) AS cnt FROM p{i} GROUP BY 1
),
b{i} AS (
  SELECT split_part(pr, '|', 1) AS lft, split_part(pr, '|', 2) AS rgt, cnt
  FROM c{i} ORDER BY cnt DESC, pr LIMIT 1
),
s{i} AS (
  -- LEFT JOIN ON TRUE, not CROSS JOIN: an empty b{i} (pairs exhausted
  -- before step {i}) must pass the dictionary through unchanged — the
  -- Spark trainer breaks out of its loop in that case — not empty it.
  SELECT s.word, s.wcount,
         CASE WHEN b.lft IS NULL THEN s.sym
              ELSE regexp_replace(s.sym,
                                  '\\b' || b.lft || ' ' || b.rgt || '\\b',
                                  b.lft || b.rgt, 'g') END AS sym
  FROM s{i - 1} s LEFT JOIN b{i} b ON TRUE
)"""
        )
    return "".join(parts)


def _bpe_merges_sql(n: int = corpus.BPE_MERGES) -> str:
    steps = "\n  UNION ALL\n  ".join(
        f"SELECT {i} AS step, lft, rgt, lft || rgt AS merged, cnt AS pair_count"
        f" FROM b{i}"
        for i in range(1, n + 1)
    )
    return f"""
WITH {_bpe_ctes(n)}
SELECT * FROM (
  {steps}
) ORDER BY step"""


def _bpe_segment_sql(n: int = corpus.BPE_MERGES) -> str:
    return f"""
WITH {_bpe_ctes(n)}
SELECT word, wcount, sym AS segmentation,
       CAST(len(str_split(sym, ' ')) AS INTEGER) AS n_subwords
FROM s{n} ORDER BY word"""


LLM_CATALOG.extend(
    [
        QuerySpec(
            "corpus_bpe_merges",
            corpus.bpe_merges,
            _bpe_merges_sql(),
            headline=True,  # the round's iterative-workload representative
            tags=("llm", "tokenizer"),
        ),
        QuerySpec(
            "corpus_bpe_segment",
            corpus.bpe_segment,
            _bpe_segment_sql(),
            tags=("llm", "tokenizer"),
        ),
    ]
)


_SURPRISAL_SQL = next(
    s.oracle for s in LLM_CATALOG if s.name == "corpus_unigram_surprisal"
)


def _difficulty_bins_sql() -> str:
    """Oracle for corpus.difficulty_bins: the proven surprisal oracle
    nested verbatim + the shared quality CTEs, quartile cutpoints via
    quantile_cont (the q2_spend_deciles_scalable parity pattern), and the
    stateless cuts<value bin count."""
    return f"""
WITH {_QUALITY_CTES},
sp AS ({_SURPRISAL_SQL}),
d AS (
  SELECT s.doc_id, s.mean_surprisal, q.quality_score
  FROM sp s JOIN qual q ON s.doc_id = q.doc_id
),
cuts AS (
  SELECT list_transform(quantile_cont(mean_surprisal, [0.25, 0.5, 0.75]),
                        c -> round(c + 1e-8, 4)) AS scuts,
         list_transform(quantile_cont(quality_score, [0.25, 0.5, 0.75]),
                        c -> round(c + 1e-8, 4)) AS qcuts
  FROM d
)
SELECT doc_id, mean_surprisal, quality_score,
       CAST(1 + len(list_filter(cuts.scuts, c -> c < mean_surprisal))
            AS INTEGER) AS difficulty_bin,
       CAST(1 + len(list_filter(cuts.qcuts, c -> c < quality_score))
            AS INTEGER) AS quality_bin
FROM d, cuts ORDER BY doc_id"""


def _cross_source_sql(threshold: float = 0.5) -> str:
    """Oracle for dedup.cross_source_matrix: the minhash-estimate oracle
    nested verbatim, threshold-filtered, attached to sources, rolled up
    by unordered source pair."""
    return f"""
WITH mp AS ({_minhash_estimate_sql()}),
p AS (
  SELECT least(da.source, db.source) AS source_lo,
         greatest(da.source, db.source) AS source_hi,
         mp.jaccard
  FROM mp
  JOIN documents da ON mp.doc_a = da.doc_id
  JOIN documents db ON mp.doc_b = db.doc_id
  WHERE mp.jaccard >= {threshold}
)
SELECT source_lo, source_hi,
       CAST(count(*) AS INTEGER) AS n_pairs,
       round(avg(jaccard) + 1e-8, 4) AS avg_jaccard
FROM p GROUP BY 1, 2 ORDER BY 1, 2"""


LLM_CATALOG.extend(
    [
        QuerySpec(
            "corpus_difficulty_bins",
            corpus.difficulty_bins,
            _difficulty_bins_sql(),
            tags=("llm", "corpus", "curriculum"),
        ),
        QuerySpec(
            "dedup_cross_source_matrix",
            dedup.cross_source_matrix,
            _cross_source_sql(),
            tags=("llm", "dedup", "audit"),
        ),
    ]
)


_PACK_SQL = next(s.oracle for s in LLM_CATALOG if s.name == "pack_documents")


def _pack_efficiency_sql(capacity: int = chunking.PACK_CAPACITY) -> str:
    """Oracle for chunking.pack_efficiency_report: the proven packing
    oracle nested verbatim, rolled up per shard.  ``capacity`` defaults
    to the SAME module constant as the engine side (ADVICE r5)."""
    return f"""
WITH pk AS ({_PACK_SQL}),
agg AS (
  SELECT shard,
         CAST(count(*) AS INTEGER) AS n_docs,
         CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
         CAST(sum(CASE WHEN end_block > start_block THEN 1 ELSE 0 END)
              AS INTEGER) AS n_boundary_docs
  FROM pk GROUP BY shard
)
SELECT shard, n_docs, total_tokens, n_boundary_docs,
       CAST(ceil(total_tokens / {float(capacity)}) AS INTEGER) AS n_blocks,
       CAST(ceil(total_tokens / {float(capacity)}) AS BIGINT) * {capacity}
         - total_tokens AS waste_tokens,
       round(total_tokens
             / (CAST(ceil(total_tokens / {float(capacity)}) AS BIGINT)
                * {float(capacity)}) + 1e-8, 4) AS fill_ratio
FROM agg ORDER BY shard"""


def _bpe_token_counts_sql(n: int = corpus.BPE_MERGES) -> str:
    """Oracle for corpus.bpe_token_counts: the BPE training CTEs to the
    final segmentation, joined back onto per-doc word occurrences."""
    return f"""
WITH {_bpe_ctes(n)},
seg AS (
  SELECT word, CAST(len(str_split(sym, ' ')) AS INTEGER) AS n_subwords
  FROM s{n}
),
occ AS (
  SELECT doc_id, t AS word, count(*) AS c
  FROM (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS t
        FROM documents)
  GROUP BY 1, 2
)
SELECT o.doc_id,
       CAST(sum(o.c) AS BIGINT) AS n_words,
       CAST(sum(o.c * s.n_subwords) AS BIGINT) AS n_bpe_tokens,
       round(sum(o.c * s.n_subwords)::DOUBLE / sum(o.c) + 1e-8, 4)
         AS subwords_per_word
FROM occ o JOIN seg s ON o.word = s.word
GROUP BY 1 ORDER BY 1"""


LLM_CATALOG.extend(
    [
        QuerySpec(
            "pack_efficiency_report",
            chunking.pack_efficiency_report,
            _pack_efficiency_sql(),
            tags=("llm", "chunking", "evaluation"),
        ),
        QuerySpec(
            "corpus_bpe_token_counts",
            corpus.bpe_token_counts,
            _bpe_token_counts_sql(),
            tags=("llm", "tokenizer"),
        ),
    ]
)


def _incremental_ingest_sql(
    new_mod: int = dedup.INGEST_NEW_MOD,
    new_min: int = dedup.INGEST_NEW_MIN,
    threshold: float = dedup.INGEST_THRESHOLD,
) -> str:
    """Oracle for dedup.incremental_ingest: fingerprint priority tier +
    the LSH CTE chain (cand over the full corpus, filtered to pairs with
    a NEW side — identical membership to the new-probe join) + the
    candidate-gated Jaccard verify, victims resolved by the bigint
    priority.  Defaults are the SAME module constants as the engine side
    (ADVICE r5)."""
    return f"""
WITH base AS (
  SELECT doc_id, text,
         CASE WHEN doc_id % {new_mod} >= {new_min} THEN 1 ELSE 0 END AS is_new,
         CAST(CASE WHEN doc_id % {new_mod} >= {new_min} THEN 1 ELSE 0 END
              AS BIGINT) * 1000000000000 + doc_id AS prio
  FROM documents
),
fp AS (
  SELECT doc_id, is_new, prio,
         md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fingerprint
  FROM base
),
fmin AS (SELECT fingerprint, min(prio) AS min_prio FROM fp GROUP BY 1),
exact_dropped AS (
  SELECT DISTINCT f.doc_id
  FROM fp f JOIN fmin m ON f.fingerprint = m.fingerprint
  WHERE f.is_new = 1 AND m.min_prio < f.prio
),
{_lsh_ctes()},
newcand AS (
  SELECT c.doc_a, c.doc_b
  FROM cand c
  JOIN base pa ON c.doc_a = pa.doc_id
  JOIN base pb ON c.doc_b = pb.doc_id
  WHERE pa.is_new = 1 OR pb.is_new = 1
),
sizes AS (SELECT doc_id, count(*) AS n_shingles FROM sh GROUP BY 1),
inter AS (
  SELECT c.doc_a, c.doc_b, count(*) AS intersection
  FROM newcand c
  JOIN sh a ON c.doc_a = a.doc_id
  JOIN sh b ON c.doc_b = b.doc_id AND a.shingle = b.shingle
  GROUP BY 1, 2
),
ver AS (
  SELECT c.doc_a, c.doc_b
  FROM newcand c
  LEFT JOIN inter i ON c.doc_a = i.doc_a AND c.doc_b = i.doc_b
  JOIN sizes sa ON c.doc_a = sa.doc_id
  JOIN sizes sb ON c.doc_b = sb.doc_id
  WHERE round(COALESCE(i.intersection, 0)::DOUBLE
              / (sa.n_shingles + sb.n_shingles - COALESCE(i.intersection, 0))
              + 1e-8, 4) >= {threshold}
),
near_dropped AS (
  SELECT DISTINCT CASE WHEN pa.prio < pb.prio THEN v.doc_b ELSE v.doc_a END
           AS doc_id
  FROM ver v
  JOIN base pa ON v.doc_a = pa.doc_id
  JOIN base pb ON v.doc_b = pb.doc_id
  WHERE (CASE WHEN pa.prio < pb.prio THEN pb.is_new ELSE pa.is_new END) = 1
)
SELECT b.doc_id,
       (e.doc_id IS NULL AND nd.doc_id IS NULL) AS keep,
       CASE WHEN e.doc_id IS NOT NULL THEN 'exact'
            WHEN nd.doc_id IS NOT NULL THEN 'near_dup'
            ELSE 'unique' END AS reason
FROM base b
LEFT JOIN exact_dropped e ON b.doc_id = e.doc_id
LEFT JOIN near_dropped nd ON b.doc_id = nd.doc_id
WHERE b.is_new = 1
ORDER BY b.doc_id"""


LLM_CATALOG.append(
    QuerySpec(
        "dedup_incremental_ingest",
        dedup.incremental_ingest,
        _incremental_ingest_sql(),
        tags=("llm", "dedup", "ingest"),
    )
)


def _recall_curve_sql(
    query_ids: tuple[int, ...] = (0, 1, 2, 3, 4),
    k: int = 10,
    n_centroids: int = 8,
    nprobes: tuple[int, ...] = (1, 2, 4),
) -> str:
    """Oracle for similarity.ivf_recall_curve: the ivf assignment/probe
    CTEs widened to max(nprobes) with the probe rank carried onto the
    candidates, one ranked top-k per curve point, unioned, hit-counted
    against the nested brute-force oracle."""
    qids = ", ".join(str(q) for q in query_ids)
    max_p = max(nprobes)
    point_sqls = []
    for p in sorted(nprobes):
        point_sqls.append(
            f"""
  SELECT {p} AS nprobe, query_id, vec_id AS neighbor_id FROM (
    SELECT query_id, vec_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY cosine DESC, vec_id) AS rnk
    FROM cand WHERE pr <= {p}
  ) WHERE rnk <= {k}"""
        )
    points = "\n  UNION ALL\n  ".join(point_sqls)
    exact_sql = _ANN_SQL_TEMPLATE.format(label_pred="")
    return f"""
WITH cents AS (
  SELECT vec_id AS centroid_id, embedding FROM embeddings
  WHERE vec_id < {n_centroids}
),
assign_scored AS (
  SELECT e.vec_id, c.centroid_id,
         round((list_dot_product(e.embedding::DOUBLE[], c.embedding::DOUBLE[]) / nullif(sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])) * sqrt(list_dot_product(c.embedding::DOUBLE[], c.embedding::DOUBLE[])), 0)) + 1e-8, 6) AS cos
  FROM embeddings e CROSS JOIN cents c
),
assign AS (
  SELECT vec_id, centroid_id FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id
                                 ORDER BY cos DESC, centroid_id) AS rn
    FROM assign_scored
  ) WHERE rn = 1
),
q AS (
  SELECT vec_id AS query_id, embedding AS q_emb FROM embeddings
  WHERE vec_id IN ({qids})
),
probe_scored AS (
  SELECT q.query_id, c.centroid_id, q.q_emb,
         round((list_dot_product(q.q_emb::DOUBLE[], c.embedding::DOUBLE[]) / nullif(sqrt(list_dot_product(q.q_emb::DOUBLE[], q.q_emb::DOUBLE[])) * sqrt(list_dot_product(c.embedding::DOUBLE[], c.embedding::DOUBLE[])), 0)) + 1e-8, 6) AS ccos
  FROM q CROSS JOIN cents c
),
probes AS (
  SELECT query_id, centroid_id, q_emb, pr FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY ccos DESC, centroid_id) AS pr
    FROM probe_scored
  ) WHERE pr <= {max_p}
),
cand AS (
  SELECT p.query_id, e.vec_id, p.pr,
         (list_dot_product(p.q_emb::DOUBLE[], e.embedding::DOUBLE[]) / nullif(sqrt(list_dot_product(p.q_emb::DOUBLE[], p.q_emb::DOUBLE[])) * sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])), 0))
           AS cosine
  FROM embeddings e
  JOIN assign a ON e.vec_id = a.vec_id
  JOIN probes p ON a.centroid_id = p.centroid_id
  WHERE e.vec_id != p.query_id
),
curve AS (
  {points}
),
exact AS ({exact_sql}),
hits AS (
  SELECT c.nprobe, c.query_id, count(*) AS n_hits
  FROM curve c
  JOIN exact e ON c.query_id = e.query_id AND c.neighbor_id = e.neighbor_id
  GROUP BY 1, 2
),
grid AS (
  -- the LITERAL nprobes x queries cross product (mirrors the engine):
  -- empty-candidate points must surface as recall 0, never drop
  SELECT n.nprobe, qq.query_id
  FROM (VALUES {", ".join(f"({p})" for p in sorted(nprobes))}) AS n(nprobe)
  CROSS JOIN (SELECT query_id FROM q) qq
)
SELECT g.nprobe, g.query_id,
       CAST(COALESCE(h.n_hits, 0) AS INTEGER) AS n_hits,
       round(COALESCE(h.n_hits, 0) / {float(k)} + 1e-8, 4) AS recall_at_k
FROM grid g
LEFT JOIN hits h ON g.nprobe = h.nprobe AND g.query_id = h.query_id
ORDER BY g.nprobe, g.query_id"""


LLM_CATALOG.append(
    QuerySpec(
        "ann_recall_curve",
        similarity.ivf_recall_curve,
        _recall_curve_sql(),
        tags=("llm", "similarity", "evaluation"),
    )
)


def _cluster_histogram_sql() -> str:
    """Oracle for dedup.cluster_size_histogram: the recursive components
    oracle verbatim, rolled up to the size distribution."""
    return (
        f"WITH RECURSIVE {_lsh_ctes()},{_COMPONENT_CTES},\n"
        """sizes AS (
  SELECT component, count(*) AS cluster_size FROM comp GROUP BY 1
)
SELECT CAST(cluster_size AS INTEGER) AS cluster_size,
       CAST(count(*) AS INTEGER) AS n_clusters,
       CAST(cluster_size * count(*) AS BIGINT) AS n_docs
FROM sizes GROUP BY cluster_size ORDER BY cluster_size"""
    )


LLM_CATALOG.append(
    QuerySpec(
        "dedup_cluster_histogram",
        dedup.cluster_size_histogram,
        _cluster_histogram_sql(),
        tags=("llm", "dedup", "evaluation"),
    )
)


LLM_CATALOG.append(
    QuerySpec(
        "events_key_skew_report",
        timeseries.key_skew_report,
        # LIMIT is the engine default's own constant (ADVICE r5).
        f"""
WITH counts AS (
  SELECT user_id, count(*) AS n_events FROM events GROUP BY 1
),
stats AS (
  SELECT quantile_cont(n_events, 0.5) AS median_n,
         CAST(sum(n_events) AS BIGINT) AS total_n
  FROM counts
)
SELECT user_id,
       CAST(n_events AS BIGINT) AS n_events,
       round(n_events / total_n::DOUBLE + 1e-8, 6) AS share,
       CAST(ceil(n_events / greatest(median_n, 1.0)) AS INTEGER) AS salt_factor
FROM counts CROSS JOIN stats
ORDER BY n_events DESC, user_id ASC
LIMIT {timeseries.SKEW_REPORT_TOP}""",
        tags=("llm", "skew", "evaluation"),
    )
)


LLM_CATALOG.append(
    QuerySpec(
        "embedding_norm_audit",
        similarity.embedding_norm_audit,
        """
WITH d AS (
  SELECT label,
         CAST(len(embedding) AS INTEGER) AS dim,
         sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x))) AS l2
  FROM embeddings
)
SELECT label,
       CAST(count(*) AS INTEGER) AS n_vecs,
       CAST(max(dim) AS INTEGER) AS dim,
       CAST(count(DISTINCT dim) AS INTEGER) AS n_dim_variants,
       round(avg(l2) + 1e-8, 4) AS mean_norm,
       round(min(l2) + 1e-8, 4) AS min_norm,
       round(max(l2) + 1e-8, 4) AS max_norm,
       CAST(sum(CASE WHEN l2 < 1e-6 THEN 1 ELSE 0 END) AS INTEGER) AS n_zero
FROM d GROUP BY label ORDER BY label""",
        tags=("llm", "similarity", "audit"),
    )
)


def _bpe_vocab_sql(n: int = corpus.BPE_MERGES) -> str:
    """Oracle for corpus.bpe_vocab: the BPE training CTEs to the final
    segmentation, exploded to subwords and frequency-ranked."""
    return f"""
WITH {_bpe_ctes(n)},
sub AS (
  SELECT unnest(str_split(sym, ' ')) AS subword, wcount FROM s{n}
),
freq AS (
  SELECT subword, CAST(sum(wcount) AS BIGINT) AS n_occurrences
  FROM sub GROUP BY 1
)
SELECT CAST(row_number() OVER (ORDER BY n_occurrences DESC, subword) - 1
            AS INTEGER) AS token_id,
       subword, n_occurrences
FROM freq ORDER BY token_id"""


LLM_CATALOG.append(
    QuerySpec(
        "corpus_bpe_vocab",
        corpus.bpe_vocab,
        _bpe_vocab_sql(),
        tags=("llm", "tokenizer"),
    )
)


def _quality_calibration_sql() -> str:
    """Oracle for quality.quality_score_calibration: the shared quality
    CTEs + per-source quantile_cont cutpoints + the stateless bin count."""
    return f"""
WITH {_QUALITY_CTES},
src AS (
  SELECT d.doc_id, d.source, q.quality_score
  FROM documents d JOIN qual q ON d.doc_id = q.doc_id
),
cuts AS (
  SELECT source,
         list_transform(quantile_cont(quality_score, [0.25, 0.5, 0.75]),
                        c -> round(c + 1e-8, 4)) AS qcuts
  FROM src GROUP BY source
)
SELECT s.doc_id, s.source, s.quality_score,
       CAST(1 + len(list_filter(c.qcuts, x -> x < s.quality_score))
            AS INTEGER) AS source_quartile
FROM src s JOIN cuts c ON s.source = c.source
ORDER BY s.doc_id"""


LLM_CATALOG.append(
    QuerySpec(
        "quality_score_calibration",
        quality.quality_score_calibration,
        _quality_calibration_sql(),
        tags=("llm", "quality", "sampling"),
    )
)


#: The composed IVFADC oracle (round 5): ivf_search's assignment/probe
#: CTEs (squared-L2 probe metric — equivalent on this unit-normalized
#: corpus) + pq_adc_topk's codes/distance-table CTEs, candidate gate
#: applied BEFORE the ADC shortlist cut, then the exact-L2 re-rank.
_IVFADC_SQL = """
WITH cents8 AS (
  SELECT vec_id AS centroid_id, embedding FROM embeddings WHERE vec_id < 8
),
assign_scored AS (
  SELECT e.vec_id, c.centroid_id,
         round((list_dot_product(e.embedding::DOUBLE[], c.embedding::DOUBLE[]) / nullif(sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])) * sqrt(list_dot_product(c.embedding::DOUBLE[], c.embedding::DOUBLE[])), 0)) + 1e-8, 6) AS cos
  FROM embeddings e CROSS JOIN cents8 c
),
assign AS (
  SELECT vec_id, centroid_id FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id
                                 ORDER BY cos DESC, centroid_id) AS rn
    FROM assign_scored
  ) WHERE rn = 1
),
q AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS q_emb
  FROM embeddings WHERE vec_id IN (0, 1, 2, 3, 4)
),
probe_scored AS (
  SELECT q.query_id, c.centroid_id,
         round(list_sum(list_transform(range(1, 65),
           i -> (q.q_emb[i] - c.embedding[i]::DOUBLE)
              * (q.q_emb[i] - c.embedding[i]::DOUBLE))) + 1e-8, 6) AS cl2
  FROM q CROSS JOIN cents8 c
),
probes AS (
  SELECT query_id, centroid_id FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY cl2 ASC, centroid_id) AS pr
    FROM probe_scored
  ) WHERE pr <= 2
),
cand AS (
  SELECT p.query_id, a.vec_id
  FROM assign a JOIN probes p ON a.centroid_id = p.centroid_id
),
cents AS (
  SELECT vec_id AS code, embedding::DOUBLE[] AS cvec
  FROM embeddings WHERE vec_id < 16
),
pairs AS (
  SELECT e.vec_id, s.sub, c.code,
         list_sum(list_transform(range(1, 9),
           i -> (e.embedding[s.sub * 8 + i]::DOUBLE
                 - c.cvec[s.sub * 8 + i])
                * (e.embedding[s.sub * 8 + i]::DOUBLE
                   - c.cvec[s.sub * 8 + i]))) AS dist
  FROM embeddings e
  CROSS JOIN (SELECT unnest(range(0, 8)) AS sub) s
  CROSS JOIN cents c
),
codes AS (
  SELECT vec_id, sub, code FROM (
    SELECT vec_id, sub, code,
           row_number() OVER (PARTITION BY vec_id, sub
                              ORDER BY dist, code) AS rk
    FROM pairs) WHERE rk = 1
),
dtab AS (
  SELECT q.query_id, s.sub, c.code,
         list_sum(list_transform(range(1, 9),
           i -> (q.q_emb[s.sub * 8 + i] - c.cvec[s.sub * 8 + i])
              * (q.q_emb[s.sub * 8 + i] - c.cvec[s.sub * 8 + i]))) AS qdist
  FROM q
  CROSS JOIN (SELECT unnest(range(0, 8)) AS sub) s
  CROSS JOIN cents c
),
approx AS (
  SELECT d.query_id, k.vec_id, round(sum(d.qdist) + 1e-8, 4) AS adc_dist
  FROM codes k
  JOIN dtab d ON k.sub = d.sub AND k.code = d.code
  JOIN cand c ON c.query_id = d.query_id AND c.vec_id = k.vec_id
  WHERE k.vec_id <> d.query_id
  GROUP BY 1, 2
),
shortlist AS (
  SELECT query_id, vec_id FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY adc_dist, vec_id) AS ar
    FROM approx) WHERE ar <= 30
),
exact AS (
  SELECT s.query_id, s.vec_id,
         round(list_sum(list_transform(range(1, 65),
           i -> (e.embedding[i]::DOUBLE - q.q_emb[i])
              * (e.embedding[i]::DOUBLE - q.q_emb[i]))) + 1e-8, 4) AS dist
  FROM shortlist s
  JOIN embeddings e ON e.vec_id = s.vec_id
  JOIN q ON q.query_id = s.query_id
)
SELECT query_id, vec_id, dist, CAST(rk AS INTEGER) AS rk
FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY dist, vec_id) AS rk
      FROM exact)
WHERE rk <= 10"""

# --- round-6: the materialized/partition-pruned IVFADC spelling ------------
# Result-identical to ann_ivf_pq_search by construction (same index
# semantics, same metric and tiebreaks; the physical difference is that
# the probe prunes centroid_id= partitions of the persisted codes table
# instead of gating an in-scan re-assignment), so it shares that entry's
# composed oracle VERBATIM — a divergence between the two physical paths
# is a hash mismatch against the same SQL.  Partition pruning + parity are
# additionally plan-asserted in tests/test_llm_ops.py.
LLM_CATALOG.append(
    QuerySpec(
        "ann_ivf_pq_search_indexed",
        similarity.ivf_pq_search_indexed_entry,
        _IVFADC_SQL,
        headline=True,
        tags=("llm", "similarity", "quantization", "ann", "indexed"),
    )
)


def _pack_bpe_sql(
    n: int = corpus.BPE_MERGES,
    capacity: int = chunking.PACK_CAPACITY,
    n_shards: int = chunking.PACK_SHARDS,
) -> str:
    """Oracle for chunking.pack_documents_bpe: the BPE segmentation CTEs
    (the proven _bpe_token_counts_sql pricing) feeding the proven packing
    window — tokenizer-true counts in place of the regex estimate.
    Capacity/shards default to the SAME module constants as the engine."""
    return f"""
WITH {_bpe_ctes(n)},
seg AS (
  SELECT word, CAST(len(str_split(sym, ' ')) AS INTEGER) AS n_subwords
  FROM s{n}
),
occ AS (
  SELECT doc_id, t AS word, count(*) AS c
  FROM (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS t
        FROM documents)
  GROUP BY 1, 2
),
bc AS (
  SELECT o.doc_id,
         CAST(o.doc_id % {n_shards} AS INTEGER) AS shard,
         CAST(sum(o.c * s.n_subwords) AS INTEGER) AS n_tokens
  FROM occ o JOIN seg s ON o.word = s.word
  GROUP BY 1, 2
),
w AS (
  SELECT doc_id, shard, n_tokens,
         sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                             ROWS UNBOUNDED PRECEDING) AS cum
  FROM bc
)
SELECT doc_id, shard, n_tokens,
       CAST(cum - n_tokens AS BIGINT) AS offset,
       CAST(floor((cum - n_tokens) / {float(capacity)}) AS INTEGER)
         AS start_block,
       CAST(floor((cum - 1) / {float(capacity)}) AS INTEGER) AS end_block
FROM w WHERE n_tokens > 0"""


LLM_CATALOG.append(
    QuerySpec(
        "pack_documents_bpe",
        chunking.pack_documents_bpe,
        _pack_bpe_sql(),
        tags=("llm", "chunking", "tokenizer"),
    )
)


def _truncation_sql(
    n: int = corpus.BPE_MERGES, context: int = chunking.TRUNCATION_CONTEXT
) -> str:
    """Oracle for chunking.truncation_report: the BPE true-count CTEs
    rolled up per source with the truncate-at-context loss arithmetic.
    ``context`` defaults to the SAME module constant as the engine."""
    return f"""
WITH {_bpe_ctes(n)},
seg AS (
  SELECT word, CAST(len(str_split(sym, ' ')) AS INTEGER) AS n_subwords
  FROM s{n}
),
occ AS (
  SELECT doc_id, t AS word, count(*) AS c
  FROM (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS t
        FROM documents)
  GROUP BY 1, 2
),
bc AS (
  SELECT o.doc_id, CAST(sum(o.c * s.n_subwords) AS BIGINT) AS n_bpe_tokens
  FROM occ o JOIN seg s ON o.word = s.word GROUP BY 1
)
SELECT d.source,
       CAST(count(*) AS INTEGER) AS n_docs,
       CAST(sum(bc.n_bpe_tokens) AS BIGINT) AS total_tokens,
       CAST(sum(CASE WHEN bc.n_bpe_tokens > {context} THEN 1 ELSE 0 END)
            AS INTEGER) AS n_docs_truncated,
       CAST(sum(greatest(bc.n_bpe_tokens - {context}, 0)) AS BIGINT)
         AS tokens_lost,
       round(sum(greatest(bc.n_bpe_tokens - {context}, 0))::DOUBLE
             / sum(bc.n_bpe_tokens) + 1e-8, 6) AS lost_frac
FROM documents d JOIN bc ON d.doc_id = bc.doc_id
GROUP BY 1 ORDER BY 1"""


def _epoch_mixture_sql() -> str:
    """Oracle for quality.epoch_mixture_repeats — the CASE arms (and the
    unlisted-source ELSE default) are GENERATED from the same
    EPOCH_RECIPE/EPOCH_DEFAULT constants the engine reads, so recipe
    edits cannot diverge the two sides."""
    ep_arms = " ".join(
        f"WHEN '{s}' THEN {float(ep)}" for s, ep in quality.EPOCH_RECIPE.items()
    )
    base_arms = " ".join(
        f"WHEN '{s}' THEN {int(ep)}" for s, ep in quality.EPOCH_RECIPE.items()
    )
    thresh_arms = " ".join(
        f"WHEN '{s}' THEN {round((ep - int(ep)) * 1000)}"
        for s, ep in quality.EPOCH_RECIPE.items()
    )
    dflt = quality.EPOCH_DEFAULT
    return f"""
WITH h AS (
  SELECT doc_id, source,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6))::BIGINT % 1000
           AS h1000
  FROM documents
)
SELECT doc_id, source,
       CAST(CASE source {ep_arms} ELSE {float(dflt)} END AS DOUBLE) AS epochs,
       CAST(CASE source {base_arms} ELSE {int(dflt)} END
            + CASE WHEN h1000 < (CASE source {thresh_arms}
                                 ELSE {round((dflt - int(dflt)) * 1000)} END)
                   THEN 1 ELSE 0 END AS INTEGER) AS n_repeats
FROM h"""


# modulus is the engine default's own constant (ADVICE r5)
_SHARD_MANIFEST_SQL = f"""
WITH d AS (
  SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS h,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6))::BIGINT
              % {quality.TRAINING_SHARDS} AS INTEGER) AS shard
  FROM documents
),
p AS (
  SELECT doc_id, shard,
         row_number() OVER (PARTITION BY shard ORDER BY h, doc_id) AS pos
  FROM d
),
t AS (
  SELECT doc_id,
         len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]'))
           AS n_tokens
  FROM documents
)
SELECT p.shard,
       CAST(count(*) AS INTEGER) AS n_docs,
       CAST(sum(t.n_tokens) AS BIGINT) AS total_tokens,
       md5(string_agg(CAST(p.doc_id AS VARCHAR), ',' ORDER BY p.pos))
         AS content_fingerprint
FROM p JOIN t ON p.doc_id = t.doc_id
GROUP BY 1 ORDER BY 1"""


LLM_CATALOG.extend(
    [
        QuerySpec(
            "corpus_truncation_report",
            chunking.truncation_report,
            _truncation_sql(),
            tags=("llm", "chunking", "tokenizer", "evaluation"),
        ),
        QuerySpec(
            "corpus_epoch_mixture",
            quality.epoch_mixture_repeats,
            _epoch_mixture_sql(),
            tags=("llm", "sampling", "mixture"),
        ),
        QuerySpec(
            "training_shard_manifest",
            quality.training_shard_manifest,
            _SHARD_MANIFEST_SQL,
            tags=("llm", "sharding", "evaluation"),
        ),
    ]
)


def _dsir_sql() -> str:
    """DSIR importance-resampling oracle — bucket space, target sources,
    and keep quantile all come from the SHARED corpus.py constants
    (engine defaults and oracle literals from one definition)."""
    nb = corpus.DSIR_BUCKETS
    targets = ", ".join(f"'{s}'" for s in corpus.DSIR_TARGET_SOURCES)
    return f"""
WITH toks AS (
  SELECT doc_id, source, regexp_extract_all(lower(text), '[a-z]+') AS t
  FROM documents
),
grams AS (
  SELECT doc_id, source, source IN ({targets}) AS is_target,
         unnest(t || CASE WHEN len(t) >= 2
                THEN list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])
                ELSE []::VARCHAR[] END) AS gram
  FROM toks
),
feat AS (
  SELECT doc_id, source, is_target,
         ('0x' || substr(md5(gram), 1, 8))::BIGINT % {nb} AS bucket,
         count(*) AS c
  FROM grams GROUP BY 1, 2, 3, 4
),
model AS (
  SELECT bucket,
         sum(CASE WHEN is_target THEN c ELSE 0 END) AS ct,
         sum(CASE WHEN NOT is_target THEN c ELSE 0 END) AS cr
  FROM feat GROUP BY 1
),
tot AS (SELECT sum(ct) AS t_total, sum(cr) AS r_total FROM model),
lam AS (
  SELECT bucket, ln((ct + 1)::DOUBLE / (t_total + {nb}))
                 - ln((cr + 1)::DOUBLE / (r_total + {nb})) AS logratio
  FROM model CROSS JOIN tot
),
weights AS (
  SELECT f.doc_id, f.source, CAST(sum(f.c) AS INTEGER) AS n_feats,
         round(sum(f.c * l.logratio) / sum(f.c) + 1e-8, 4) AS dsir_weight
  FROM feat f JOIN lam l USING (bucket)
  WHERE NOT f.is_target
  GROUP BY 1, 2
),
cut AS (SELECT round(quantile_cont(dsir_weight, {corpus.DSIR_CUT_Q!r}) + 1e-8, 4)
          AS cut FROM weights)
SELECT doc_id, source, n_feats, dsir_weight, dsir_weight >= cut AS kept
FROM weights CROSS JOIN cut"""


LLM_CATALOG.append(
    QuerySpec(
        "corpus_dsir_sample",
        corpus.dsir_importance_sample,
        _dsir_sql(),
        headline=True,  # the round's constant-size-model representative
        tags=("llm", "sampling", "quality", "mixture"),
    )
)


def _image_ahash_sql() -> str:
    """Perceptual image-dedup oracle: recomputes the 8x8 aHash
    ARITHMETICALLY from the PNG fixture's pixel formula
    pixel(x,y) = (doc_id + x + y) % 256 with nearest-neighbor sampling
    sx = tx*w//8 — so a hash match proves the engine's zlib decode,
    resize index math, mean threshold, band split, and hamming algebra
    all at once.  Bit 63 is added as the signed MIN constant (DuckDB
    errors on 1<<63); grid/bands/threshold come from the shared
    multimodal.py constants."""
    g = multimodal.AHASH_GRID
    nb = multimodal.AHASH_BANDS
    return f"""
WITH px AS (
  SELECT d.doc_id, ty.r * {g} + tx.r AS i,
         (d.doc_id + (tx.r * (d.doc_id % 64 + 16)) // {g}
                   + (ty.r * (d.doc_id * 7 % 64 + 16)) // {g}) % 256 AS p
  FROM documents d, range({g}) tx(r), range({g}) ty(r)
),
m AS (SELECT doc_id, avg(p::DOUBLE) AS mp FROM px GROUP BY 1),
hash AS (
  SELECT px.doc_id,
         CAST(sum(CASE WHEN p::DOUBLE > mp THEN
                CASE WHEN i = 63 THEN -9223372036854775807 - 1
                     ELSE 1::BIGINT << i END
              ELSE 0 END) AS BIGINT) AS ahash
  FROM px JOIN m USING (doc_id) GROUP BY 1
),
bands AS (
  SELECT doc_id, ahash, b.r AS band_idx,
         (ahash >> (16 * b.r)) & 65535 AS band_val
  FROM hash, range({nb}) b(r)
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
         a.ahash AS ha, b.ahash AS hb
  FROM bands a JOIN bands b
    ON a.band_idx = b.band_idx AND a.band_val = b.band_val
   AND a.doc_id < b.doc_id
)
SELECT doc_id_a, doc_id_b,
       CAST(bit_count(xor(ha, hb)) AS INTEGER) AS hamming
FROM cand
WHERE bit_count(xor(ha, hb)) <= {multimodal.AHASH_MAX_HAMMING}
ORDER BY 1, 2"""


LLM_CATALOG.append(
    QuerySpec(
        "multimodal_image_ahash_dedup",
        multimodal.image_near_duplicates,
        _image_ahash_sql(),
        tags=("llm", "multimodal", "dedup", "pixels"),
    )
)


# Filtered vector search: the composed IVFADC oracle with the label
# predicate joined into the SAME cand CTE the engine gates on (pre-filter
# strategy — the shortlist fills only with qualifying vectors).  Built by
# surgical replacement of the proven oracle's candidate gate; the anchor
# check makes a drifted base oracle a load-time error, not a silent
# mismatch.
_IVFADC_CAND_CTE = """cand AS (
  SELECT p.query_id, a.vec_id
  FROM assign a JOIN probes p ON a.centroid_id = p.centroid_id
),"""
_ivfadc_base = _IVFADC_SQL
if _IVFADC_CAND_CTE not in _ivfadc_base:
    raise ValueError("ann_ivf_pq_search oracle drifted: cand CTE anchor missing")
_FILTERED_SEARCH_SQL = _ivfadc_base.replace(
    _IVFADC_CAND_CTE,
    f"""cand AS (
  SELECT p.query_id, a.vec_id
  FROM assign a
  JOIN probes p ON a.centroid_id = p.centroid_id
  JOIN embeddings el
    ON el.vec_id = a.vec_id AND el.label = {similarity.ANN_FILTER_LABEL}
),""",
)

# ann_filtered_search RETIRED in round 10 (near-twin retirement): it is
# the metadata-filtered cand-CTE variant of the IVFADC family whose
# composed oracle still gates ann_ivf_pq_search_indexed; the filtered
# operator stays, pinned by
# tests/test_llm_ops.py::test_filtered_search_returns_only_matching_labels
# and the filtered plan-shape assertions in tests/test_plan_shapes.py.
# (_FILTERED_SEARCH_SQL above is kept: its load-time anchor check still
# documents and validates the filtered spelling of the shared oracle.)


def _staleness_sql() -> str:
    """Index-staleness oracle: the classifier CTEs (shared logit) left-
    joined under the embeddings table, rolled up per label."""
    return f"""
WITH {_QUALITY_CTES},
scored AS (
  SELECT doc_id,
         round(1.0 / (1.0 + exp(-({_classifier_logit()}))) + 1e-8, 4)
           AS model_score
  FROM qual
),
keeps AS (
  SELECT doc_id,
         (model_score >= {quality.CLASSIFIER_KEEP_THRESHOLD!r}) AS keep
  FROM scored
)
SELECT e.label,
       CAST(count(*) AS INTEGER) AS n_vecs,
       CAST(sum(CASE WHEN k.doc_id IS NULL OR NOT k.keep THEN 1 ELSE 0 END)
            AS INTEGER) AS n_stale,
       round(sum(CASE WHEN k.doc_id IS NULL OR NOT k.keep THEN 1 ELSE 0 END)
             ::DOUBLE / count(*) + 1e-8, 4) AS stale_rate
FROM embeddings e LEFT JOIN keeps k ON e.vec_id = k.doc_id
GROUP BY 1 ORDER BY 1"""


LLM_CATALOG.append(
    QuerySpec(
        "embedding_staleness_audit",
        similarity.embedding_staleness_audit,
        _staleness_sql(),
        tags=("llm", "similarity", "evaluation", "audit"),
    )
)


# ---------------------------------------------------------------------------
# Retrieval tier: BM25 / hybrid RRF / pseudo-relevance-feedback expansion
# ---------------------------------------------------------------------------


def _bm25_ctes(query: tuple[str, ...] = retrieval.BM25_QUERY) -> str:
    """CTE chain ending in ``bscored(doc_id, n_terms, score)`` — the Okapi
    BM25 scores for the fixed query (mirrors operators/retrieval.py:
    bm25_rank; k1/b/terms interpolate the SHARED module constants).
    Shared by the rank, hybrid-RRF, and PRF-expansion oracles."""
    k1, b = retrieval.BM25_K1, retrieval.BM25_B
    terms = ", ".join(f"'{t}'" for t in query)
    return f"""
toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS token
  FROM documents
),
tf AS (SELECT doc_id, token, count(*) AS tok_count FROM toks GROUP BY 1, 2),
doc_len AS (SELECT doc_id, sum(tok_count) AS doc_tokens FROM tf GROUP BY 1),
bstats AS (SELECT count(*) AS n_docs, avg(doc_tokens) AS avgdl FROM doc_len),
qtf AS (SELECT * FROM tf WHERE token IN ({terms})),
dfq AS (SELECT token, count(*) AS doc_freq FROM qtf GROUP BY 1),
bscored AS (
  SELECT q.doc_id, CAST(count(*) AS INTEGER) AS n_terms,
         round(sum(
           ln(1.0 + (s.n_docs - d.doc_freq + 0.5) / (d.doc_freq + 0.5))
           * (q.tok_count * {k1 + 1!r})
             / (q.tok_count
                + {k1!r} * ({1 - b!r}
                            + {b!r} * l.doc_tokens::DOUBLE / s.avgdl))
         ) + 1e-8, 4) AS score
  FROM qtf q
  JOIN doc_len l USING (doc_id)
  JOIN dfq d USING (token)
  CROSS JOIN bstats s
  GROUP BY 1
)"""


def _bm25_rank_sql() -> str:
    k = retrieval.BM25_TOP_K
    return f"""
WITH {_bm25_ctes()}
SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS INTEGER)
         AS rnk,
       doc_id, n_terms, score
FROM (SELECT * FROM bscored ORDER BY score DESC, doc_id LIMIT {k})"""


def _hybrid_fused_ctes() -> str:
    """CTE chain ending in ``fused(doc_id, lex_rank, vec_rank,
    rrf_score)`` — the RRF fusion of the two retrieval arms (mirrors
    operators/retrieval.py:hybrid_rrf_search).  Appended after
    ``_bm25_ctes()``; shared by the hybrid-RRF oracle and the composed
    hybrid→MMR serving-pipeline oracle."""
    depth, rrf_k = retrieval.RRF_ARM_DEPTH, retrieval.RRF_K
    qid = retrieval.HYBRID_QUERY_VEC_ID
    return f"""ltop AS (
  SELECT doc_id,
         CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS INTEGER)
           AS lex_rank
  FROM (SELECT * FROM bscored ORDER BY score DESC, doc_id LIMIT {depth})
),
qv AS (SELECT embedding::DOUBLE[] AS q_emb FROM embeddings
       WHERE vec_id = {qid}),
vsc AS (
  SELECT e.vec_id AS doc_id,
         round((list_dot_product(e.embedding::DOUBLE[], q.q_emb) / nullif(sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])) * sqrt(list_dot_product(q.q_emb, q.q_emb)), 0))
               + 1e-8, 4) AS cosine
  FROM embeddings e CROSS JOIN qv q
  WHERE e.vec_id <> {qid}
),
vtop AS (
  SELECT doc_id,
         CAST(row_number() OVER (ORDER BY cosine DESC, doc_id) AS INTEGER)
           AS vec_rank
  FROM (SELECT * FROM vsc ORDER BY cosine DESC, doc_id LIMIT {depth})
),
fused AS (
  SELECT doc_id, l.lex_rank, v.vec_rank,
         round(coalesce(1.0 / ({rrf_k} + l.lex_rank), 0.0)
               + coalesce(1.0 / ({rrf_k} + v.vec_rank), 0.0)
               + 1e-10, 6) AS rrf_score
  FROM ltop l FULL OUTER JOIN vtop v USING (doc_id)
)"""


def _hybrid_rrf_sql() -> str:
    k = retrieval.HYBRID_TOP_K
    return f"""
WITH {_bm25_ctes()},
{_hybrid_fused_ctes()}
SELECT CAST(row_number() OVER (ORDER BY rrf_score DESC, doc_id) AS INTEGER)
         AS rnk,
       doc_id, lex_rank, vec_rank, rrf_score
FROM (SELECT * FROM fused ORDER BY rrf_score DESC, doc_id LIMIT {k})"""


def _prf_expansion_sql() -> str:
    r, e = retrieval.PRF_FEEDBACK_R, retrieval.PRF_EXPANSION_E
    terms = ", ".join(f"'{t}'" for t in retrieval.BM25_QUERY)
    stops = ", ".join(f"'{w}'" for w in STOP_WORDS)
    return f"""
WITH {_bm25_ctes()},
fb AS (SELECT doc_id FROM bscored ORDER BY score DESC, doc_id LIMIT {r}),
dfreq AS (SELECT token, count(*) AS doc_freq FROM tf GROUP BY 1),
n AS (SELECT count(*) AS n_docs FROM documents),
fbtf AS (
  SELECT t.doc_id, t.token, t.tok_count
  FROM tf t JOIN fb USING (doc_id)
  WHERE t.token NOT IN ({terms}) AND t.token NOT IN ({stops})
),
escored AS (
  SELECT f.token, CAST(count(*) AS INTEGER) AS fb_docs,
         round(sum((f.tok_count::DOUBLE / l.doc_tokens)
               * (ln((n.n_docs + 1)::DOUBLE / (d.doc_freq + 1)) + 1.0))
               + 1e-8, 4) AS weight
  FROM fbtf f
  JOIN doc_len l USING (doc_id)
  JOIN dfreq d USING (token)
  CROSS JOIN n
  GROUP BY 1
)
SELECT CAST(row_number() OVER (ORDER BY weight DESC, token) AS INTEGER)
         AS rnk,
       token, fb_docs, weight
FROM (SELECT * FROM escored ORDER BY weight DESC, token LIMIT {e})"""


LLM_CATALOG.extend(
    [
        # retrieval_bm25_rank and retrieval_hybrid_rrf RETIRED in round
        # 10 (near-twin retirement): retrieval_bm25_indexed gates the
        # identical BM25 ranking (shared _bm25_rank_sql oracle) on the
        # scale path, and retrieval_hybrid_multi_query gates the same
        # per-query RRF fusion batched; the single-query operators stay,
        # pinned by the multi-vs-single parity tests in
        # tests/test_retrieval_profiling.py, and the composed
        # retrieval_hybrid_mmr_pipeline remains the fusion tier's
        # headline bench representative.
        QuerySpec(
            "retrieval_prf_expansion",
            retrieval.prf_expand_query,
            _prf_expansion_sql(),
            tags=("llm", "retrieval", "ranking"),
        ),
    ]
)


# ---------------------------------------------------------------------------
# Profiling / drift tier: column profile + numeric & categorical PSI
# ---------------------------------------------------------------------------


def _column_profile_sql() -> str:
    """One UNION ALL arm per profiled column, each rendering min/max with
    the engine formatter's oracle twin (profiling.PROFILE_COLUMNS is the
    single source of the column list AND the type kinds)."""
    renders = {
        "bigint": "CAST({m}({c}) AS VARCHAR)",
        "string": "CAST({m}({c}) AS VARCHAR)",
        "money": "CAST(CAST(round({m}({c}) + 1e-6, 2) AS DECIMAL(18,2))"
        " AS VARCHAR)",
        "timestamp": "strftime({m}({c}), '%Y-%m-%d %H:%M:%S')",
    }
    arms = []
    for c, kind in profiling.PROFILE_COLUMNS:
        mn = renders[kind].format(m="min", c=c)
        mx = renders[kind].format(m="max", c=c)
        arms.append(f"""SELECT '{c}' AS col_name,
       count(*) AS n_rows,
       count(*) - count({c}) AS n_null,
       count(DISTINCT {c}) AS n_distinct,
       {mn} AS min_value,
       {mx} AS max_value
FROM {profiling.PROFILE_TABLE}""")
    return "\nUNION ALL\n".join(arms)


#: Midpoint-split CTE shared by both drift oracles (mirrors
#: profiling._events_with_split).
_DRIFT_SPLIT_CTE = """
b AS (SELECT (epoch_us(min(ts)) + epoch_us(max(ts))) / 2.0 AS mid
      FROM events),
e AS (SELECT value, event_type, epoch_us(ts) < b.mid AS is_ref
      FROM events CROSS JOIN b)"""


def _numeric_psi_sql() -> str:
    nb = profiling.PSI_BINS
    return f"""
WITH {_DRIFT_SPLIT_CTE},
rb AS (SELECT min(value) AS rmin, max(value) AS rmax FROM e WHERE is_ref),
binned AS (
  -- width floor 1.0 when rmax == rmin: same degenerate-range guard as
  -- the engine (profiling._numeric_psi_from) — 0/0 NaN bins otherwise
  SELECT CAST(LEAST({nb - 1}, GREATEST(0,
           floor((e.value - rb.rmin) /
                 (CASE WHEN rb.rmax = rb.rmin THEN 1.0
                       ELSE (rb.rmax - rb.rmin) / {nb} END))))
         AS INTEGER) AS bin_idx,
         is_ref
  FROM e CROSS JOIN rb
),
c AS (
  SELECT bin_idx,
         sum(CASE WHEN is_ref THEN 1 ELSE 0 END) AS n_ref,
         sum(CASE WHEN NOT is_ref THEN 1 ELSE 0 END) AS n_cur
  FROM binned WHERE bin_idx IS NOT NULL GROUP BY 1
),
spine AS (SELECT CAST(unnest(range({nb})) AS INTEGER) AS bin_idx),
f AS (
  SELECT s.bin_idx,
         coalesce(c.n_ref, 0) AS n_ref, coalesce(c.n_cur, 0) AS n_cur
  FROM spine s LEFT JOIN c USING (bin_idx)
),
t AS (SELECT sum(n_ref) AS t_ref, sum(n_cur) AS t_cur FROM f),
p AS (
  SELECT f.bin_idx, f.n_ref, f.n_cur,
         (f.n_ref + 0.5) / (t.t_ref + {0.5 * nb!r}) AS pr,
         (f.n_cur + 0.5) / (t.t_cur + {0.5 * nb!r}) AS pc
  FROM f CROSS JOIN t
),
terms AS (
  SELECT bin_idx, n_ref, n_cur, pr, pc,
         (pc - pr) * ln(pc / pr) AS term
  FROM p
)
SELECT bin_idx,
       CAST(n_ref AS BIGINT) AS n_ref, CAST(n_cur AS BIGINT) AS n_cur,
       round(pr + 1e-8, 4) AS ref_frac, round(pc + 1e-8, 4) AS cur_frac,
       round(term + 1e-8, 6) AS psi_term,
       round(sum(term) OVER () + 1e-8, 6) AS psi_total
FROM terms"""


def _categorical_psi_sql() -> str:
    return f"""
WITH {_DRIFT_SPLIT_CTE},
c AS (
  SELECT event_type,
         sum(CASE WHEN is_ref THEN 1 ELSE 0 END) AS n_ref,
         sum(CASE WHEN NOT is_ref THEN 1 ELSE 0 END) AS n_cur
  FROM e GROUP BY 1
),
t AS (SELECT sum(n_ref) AS t_ref, sum(n_cur) AS t_cur,
             count(*) AS k_cats FROM c),
p AS (
  SELECT c.event_type, c.n_ref, c.n_cur,
         (c.n_ref + 0.5) / (t.t_ref + 0.5 * t.k_cats) AS pr,
         (c.n_cur + 0.5) / (t.t_cur + 0.5 * t.k_cats) AS pc
  FROM c CROSS JOIN t
),
terms AS (
  SELECT event_type, n_ref, n_cur, pr, pc,
         (pc - pr) * ln(pc / pr) AS term
  FROM p
)
SELECT event_type,
       CAST(n_ref AS BIGINT) AS n_ref, CAST(n_cur AS BIGINT) AS n_cur,
       round(pr + 1e-8, 4) AS ref_frac, round(pc + 1e-8, 4) AS cur_frac,
       round(term + 1e-8, 6) AS psi_term,
       round(sum(term) OVER () + 1e-8, 6) AS psi_total
FROM terms"""


LLM_CATALOG.extend(
    [
        # profile_columns RETIRED in round 10 (near-twin retirement):
        # events_profile_columns gates the same profiling operator over
        # the events table; the documents face stays, covered by the
        # grouped/per-group pins in tests/test_retrieval_profiling.py.
        QuerySpec(
            "drift_numeric_psi",
            profiling.numeric_drift_psi,
            _numeric_psi_sql(),
            tags=("llm", "profiling", "drift", "evaluation"),
        ),
        QuerySpec(
            "drift_event_type_psi",
            profiling.categorical_drift_report,
            _categorical_psi_sql(),
            tags=("llm", "profiling", "drift", "evaluation"),
        ),
    ]
)


# ---------------------------------------------------------------------------
# Graph tier: PageRank over the LSH candidate graph (unrolled iterations)
# ---------------------------------------------------------------------------


def _pagerank_sql(
    damping: float = graph.PAGERANK_DAMPING, iters: int = graph.PAGERANK_ITERS
) -> str:
    """PageRank oracle: the proven LSH cand CTEs feed an edge list, and
    each power iteration is unrolled (the kmeans/BPE precedent for
    iterative operators).  Constants interpolate via !r so 1-damping is
    the IDENTICAL Python double the engine multiplies with."""
    rounds = []
    for i in range(iters):
        rounds.append(f"""r{i + 1} AS (
  SELECT e.v AS node,
         {1 - damping!r} / n.n_nodes
           + {damping!r} * sum(r.pr / dg.degree) AS pr
  FROM edges e
  JOIN r{i} r ON r.node = e.u
  JOIN deg dg ON dg.u = e.u
  CROSS JOIN n
  GROUP BY e.v, n.n_nodes
)""")
    chain = ",\n".join(rounds)
    return f"""
WITH {_lsh_ctes()},
edges AS (
  SELECT doc_a AS u, doc_b AS v FROM cand
  UNION ALL
  SELECT doc_b AS u, doc_a AS v FROM cand
),
deg AS (SELECT u, count(*) AS degree FROM edges GROUP BY 1),
n AS (SELECT count(DISTINCT u) AS n_nodes FROM edges),
r0 AS (
  SELECT DISTINCT u AS node, 1.0 / n.n_nodes AS pr FROM edges CROSS JOIN n
),
{chain}
SELECT dg.u AS doc_id, CAST(dg.degree AS INTEGER) AS degree,
       round(r.pr + 1e-8, 6) AS pagerank
FROM r{iters} r JOIN deg dg ON dg.u = r.node"""


LLM_CATALOG.append(
    QuerySpec(
        "graph_pagerank_docs",
        graph.pagerank_similar_docs,
        _pagerank_sql(),
        tags=("llm", "graph", "dedup", "ranking"),
    )
)


# ---------------------------------------------------------------------------
# MMR re-rank: unrolled greedy selection (k stages, each an argmax CTE)
# ---------------------------------------------------------------------------


def _mmr_stage_ctes(k: int, lam: float, extra: tuple[str, ...] = ()) -> tuple[str, str]:
    """(chain, unions) for the unrolled greedy-MMR stages over an ``sl``
    CTE with columns (doc_id, emb, rel[, *extra]) — one stage generator
    shared by the raw-cosine re-rank oracle and the composed hybrid→MMR
    pipeline oracle, mirroring operators/retrieval.py:_mmr_greedy's
    shared loop.  ``extra`` columns ride through every stage."""
    xs = "".join(f", c.{c}" for c in extra)
    xs_bare = "".join(f", {c}" for c in extra)
    stages = [
        f"""s1 AS (
  SELECT 1 AS rnk, doc_id, emb, rel{xs_bare},
         round({lam!r} * rel + 1e-8, 6) AS mmr
  FROM sl ORDER BY round({lam!r} * rel + 1e-8, 6) DESC, doc_id LIMIT 1
),
sel1 AS (SELECT doc_id, emb FROM s1)"""
    ]
    for i in range(2, k + 1):
        stages.append(f"""s{i} AS (
  SELECT {i} AS rnk, c.doc_id, c.emb, c.rel{xs},
         round({lam!r} * c.rel
               - {1 - lam!r} * max(round((list_dot_product(c.emb, s.emb) / nullif(sqrt(list_dot_product(c.emb, c.emb)) * sqrt(list_dot_product(s.emb, s.emb)), 0))
                                         + 1e-8, 6))
               + 1e-8, 6) AS mmr
  FROM sl c CROSS JOIN sel{i - 1} s
  WHERE c.doc_id NOT IN (SELECT doc_id FROM sel{i - 1})
  GROUP BY c.doc_id, c.emb, c.rel{xs}
  ORDER BY mmr DESC, c.doc_id LIMIT 1
),
sel{i} AS (SELECT doc_id, emb FROM sel{i - 1}
           UNION ALL SELECT doc_id, emb FROM s{i})""")
    unions = "\nUNION ALL\n".join(
        f"SELECT rnk, doc_id, rel{xs_bare}, mmr FROM s{i}"
        for i in range(1, k + 1)
    )
    return ",\n".join(stages), unions


def _mmr_sql() -> str:
    lam = retrieval.MMR_LAMBDA
    qid, sl, k = (
        retrieval.HYBRID_QUERY_VEC_ID,
        retrieval.MMR_SHORTLIST,
        retrieval.MMR_SELECT_K,
    )
    chain, unions = _mmr_stage_ctes(k, lam)
    return f"""
WITH base AS (
  SELECT e.vec_id AS doc_id,
         list_transform(e.embedding, x -> x::DOUBLE) AS emb,
         round((list_dot_product(e.embedding::DOUBLE[], q.q_emb) / nullif(sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])) * sqrt(list_dot_product(q.q_emb, q.q_emb)), 0))
               + 1e-8, 6) AS rel
  FROM embeddings e
  CROSS JOIN (SELECT embedding::DOUBLE[] AS q_emb FROM embeddings
              WHERE vec_id = {qid}) q
  WHERE e.vec_id <> {qid}
),
sl AS MATERIALIZED (SELECT * FROM base ORDER BY rel DESC, doc_id LIMIT {sl}),
{chain}
SELECT CAST(rnk AS INTEGER) AS rnk, doc_id, rel AS relevance,
       mmr AS mmr_score
FROM ({unions})"""


def _hybrid_mmr_pipeline_sql() -> str:
    """The composed serving-path oracle: hybrid RRF fusion (shared fused
    CTE) → embedding attach → min-max rel normalization (degenerate
    all-equal shortlist → 1.0, same guard as the engine) → the shared
    unrolled greedy-MMR stages carrying rrf_score."""
    lam, k = retrieval.MMR_LAMBDA, retrieval.MMR_SELECT_K
    top = retrieval.HYBRID_TOP_K
    chain, unions = _mmr_stage_ctes(k, lam, extra=("rrf_score",))
    return f"""
WITH {_bm25_ctes()},
{_hybrid_fused_ctes()},
ftop AS (SELECT doc_id, rrf_score FROM fused
         ORDER BY rrf_score DESC, doc_id LIMIT {top}),
slraw AS (
  SELECT f.doc_id, list_transform(e.embedding, x -> x::DOUBLE) AS emb,
         f.rrf_score
  FROM ftop f JOIN embeddings e ON e.vec_id = f.doc_id
),
bounds AS (SELECT min(rrf_score) AS mn, max(rrf_score) AS mx FROM slraw),
-- MATERIALIZED: every unrolled MMR stage references sl, and DuckDB would
-- otherwise re-inline (re-run) the whole BM25+fusion corpus chain per
-- stage — 20 rows materialized once instead
sl AS MATERIALIZED (
  SELECT doc_id, emb, rrf_score,
         round(CASE WHEN b.mx = b.mn THEN 1.0
               ELSE (rrf_score - b.mn) / (b.mx - b.mn) END + 1e-8, 6) AS rel
  FROM slraw CROSS JOIN bounds b
),
{chain}
SELECT CAST(rnk AS INTEGER) AS rnk, doc_id, rrf_score, rel AS relevance,
       mmr AS mmr_score
FROM ({unions})"""


LLM_CATALOG.append(
    QuerySpec(
        "retrieval_hybrid_mmr_pipeline",
        retrieval.hybrid_mmr_pipeline,
        _hybrid_mmr_pipeline_sql(),
        headline=True,  # the composed serving path: gate -> fuse -> diversify
        tags=("llm", "retrieval", "ann", "fusion", "ranking", "pipeline"),
    )
)


# retrieval_mmr_rerank RETIRED in round 10 (near-twin retirement): the
# headline retrieval_hybrid_mmr_pipeline entry drives the identical MMR
# stage inside the composed serving path (its oracle embeds the same
# greedy chain); the isolated operator stays, covered by
# tests/test_retrieval_profiling.py.


# The materialized-index BM25 spelling is result-identical to the
# from-corpus spelling (shared scoring tail), so it reuses that oracle
# verbatim — the ann_ivf_pq_search_indexed precedent.
LLM_CATALOG.append(
    QuerySpec(
        "retrieval_bm25_indexed",
        retrieval.bm25_indexed_entry,
        _bm25_rank_sql(),
        tags=("llm", "retrieval", "ranking", "indexed"),
    )
)


# ---------------------------------------------------------------------------
# Multi-query engines (VERDICT r7 item 6: first-class driver faces for
# the batched serving engines, not just single-query-parity pytests)
# ---------------------------------------------------------------------------


def _bm25_multi_ctes() -> str:
    """CTE chain ending in ``mscored(query_id, doc_id, n_terms, score)``
    — per-query Okapi scores for the fixed MULTI_QUERY_TERMS batch
    (mirrors retrieval.bm25_topk_for_queries: one postings prune over
    the batch's distinct terms, per-token df over that pruned set,
    query ownership re-attached by the qset join)."""
    k1, b = retrieval.BM25_K1, retrieval.BM25_B
    qrows = ", ".join(
        f"({qid}, '{t}')"
        for qid, terms in retrieval.MULTI_QUERY_TERMS
        for t in terms
    )
    all_terms = ", ".join(
        f"'{t}'"
        for t in sorted(
            {t for _, terms in retrieval.MULTI_QUERY_TERMS for t in terms}
        )
    )
    return f"""
toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS token
  FROM documents
),
tf AS (SELECT doc_id, token, count(*) AS tok_count FROM toks GROUP BY 1, 2),
doc_len AS (SELECT doc_id, sum(tok_count) AS doc_tokens FROM tf GROUP BY 1),
bstats AS (SELECT count(*) AS n_docs, avg(doc_tokens) AS avgdl FROM doc_len),
qset AS (SELECT * FROM (VALUES {qrows}) AS q(query_id, token)),
qtf AS (SELECT * FROM tf WHERE token IN ({all_terms})),
dfq AS (SELECT token, count(*) AS doc_freq FROM qtf GROUP BY 1),
mscored AS (
  SELECT s2.query_id, q.doc_id, CAST(count(*) AS INTEGER) AS n_terms,
         round(sum(
           ln(1.0 + (s.n_docs - d.doc_freq + 0.5) / (d.doc_freq + 0.5))
           * (q.tok_count * {k1 + 1!r})
             / (q.tok_count
                + {k1!r} * ({1 - b!r}
                            + {b!r} * l.doc_tokens::DOUBLE / s.avgdl))
         ) + 1e-8, 4) AS score
  FROM qtf q
  JOIN qset s2 USING (token)
  JOIN doc_len l USING (doc_id)
  JOIN dfq d USING (token)
  CROSS JOIN bstats s
  GROUP BY 1, 2
)"""


def _bm25_multi_sql() -> str:
    k = retrieval.BM25_TOP_K
    return f"""
WITH {_bm25_multi_ctes()}
SELECT CAST(query_id AS BIGINT) AS query_id, CAST(rnk AS INTEGER) AS rnk,
       doc_id, n_terms, score
FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY score DESC, doc_id) AS rnk
      FROM mscored)
WHERE rnk <= {k}"""


def _hybrid_multi_sql() -> str:
    """Multi-query hybrid oracle: the per-query BM25 arm above fused
    with the per-query PQ-ADC arm (the ann_pq_adc_topk oracle's
    codebook/assignment/distance-table CTEs, WITHOUT the self-exclusion
    — the engine passes exclude_self=False) by reciprocal-rank fusion.
    The vector arm ranks by ADC distance, matching the materialized-
    index production path the engine actually runs."""
    depth, rrf_k = retrieval.RRF_ARM_DEPTH, retrieval.RRF_K
    k = retrieval.HYBRID_TOP_K
    qids = ", ".join(str(q) for q, _ in retrieval.MULTI_QUERY_TERMS)
    return f"""
WITH {_bm25_multi_ctes()},
ltop AS (
  SELECT query_id, doc_id, lex_rank FROM (
    SELECT query_id, doc_id,
           CAST(row_number() OVER (PARTITION BY query_id
                                   ORDER BY score DESC, doc_id) AS INTEGER)
             AS lex_rank
    FROM mscored) WHERE lex_rank <= {depth}
),
cents AS (
  SELECT vec_id AS code, embedding::DOUBLE[] AS cvec
  FROM embeddings WHERE vec_id < 16
),
pairs AS (
  SELECT e.vec_id, s.sub, c.code,
         list_sum(list_transform(range(1, 9),
           i -> (e.embedding[s.sub * 8 + i]::DOUBLE
                 - c.cvec[s.sub * 8 + i])
                * (e.embedding[s.sub * 8 + i]::DOUBLE
                   - c.cvec[s.sub * 8 + i]))) AS dist
  FROM embeddings e
  CROSS JOIN (SELECT unnest(range(0, 8)) AS sub) s
  CROSS JOIN cents c
),
kcodes AS (
  SELECT vec_id, sub, code FROM (
    SELECT vec_id, sub, code,
           row_number() OVER (PARTITION BY vec_id, sub
                              ORDER BY dist, code) AS rk
    FROM pairs) WHERE rk = 1
),
vqueries AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS q_emb
  FROM embeddings WHERE vec_id IN ({qids})
),
dtab AS (
  SELECT q.query_id, s.sub, c.code,
         list_sum(list_transform(range(1, 9),
           i -> (q.q_emb[s.sub * 8 + i] - c.cvec[s.sub * 8 + i])
              * (q.q_emb[s.sub * 8 + i] - c.cvec[s.sub * 8 + i]))) AS qdist
  FROM vqueries q
  CROSS JOIN (SELECT unnest(range(0, 8)) AS sub) s
  CROSS JOIN cents c
),
approx AS (
  SELECT d.query_id, k.vec_id, round(sum(d.qdist) + 1e-8, 4) AS adc_dist
  FROM kcodes k JOIN dtab d ON k.sub = d.sub AND k.code = d.code
  GROUP BY 1, 2
),
vtop AS (
  SELECT query_id, doc_id, vec_rank FROM (
    SELECT query_id, vec_id AS doc_id,
           CAST(row_number() OVER (PARTITION BY query_id
                                   ORDER BY adc_dist, vec_id) AS INTEGER)
             AS vec_rank
    FROM approx) WHERE vec_rank <= {depth}
),
mfused AS (
  SELECT coalesce(l.query_id, v.query_id) AS query_id,
         coalesce(l.doc_id, v.doc_id) AS doc_id,
         l.lex_rank, v.vec_rank,
         round(coalesce(1.0 / ({rrf_k} + l.lex_rank), 0.0)
               + coalesce(1.0 / ({rrf_k} + v.vec_rank), 0.0)
               + 1e-10, 6) AS rrf_score
  FROM ltop l FULL OUTER JOIN vtop v
    ON l.query_id = v.query_id AND l.doc_id = v.doc_id
)
SELECT CAST(query_id AS BIGINT) AS query_id, CAST(rnk AS INTEGER) AS rnk,
       doc_id, lex_rank, vec_rank, rrf_score
FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY rrf_score DESC, doc_id) AS rnk
      FROM mfused)
WHERE rnk <= {k}"""


LLM_CATALOG.extend(
    [
        QuerySpec(
            "retrieval_bm25_multi_query",
            retrieval.bm25_multi_query_entry,
            _bm25_multi_sql(),
            tags=("llm", "retrieval", "ranking", "multi-query"),
        ),
        QuerySpec(
            "retrieval_hybrid_multi_query",
            retrieval.hybrid_multi_query_entry,
            _hybrid_multi_sql(),
            tags=("llm", "retrieval", "ann", "ranking", "multi-query"),
        ),
    ]
)


# ---------------------------------------------------------------------------
# Corpus statistics for tokenizer / loader planning (round 7)
# ---------------------------------------------------------------------------


def _ngram_diversity_sql() -> str:
    arms = []
    for n in corpus.DIVERSITY_NS:
        arms.append(f"""
  SELECT source, {n} AS n, count(*) AS n_grams,
         count(DISTINCT gram) AS n_distinct
  FROM (
    SELECT source,
           unnest(list_transform(range(1, len(t) - {n} + 2),
                  i -> array_to_string(list_slice(t, i, i + {n} - 1), ' ')))
             AS gram
    FROM toks WHERE len(t) >= {n}
  ) GROUP BY 1""")
    unions = "\n  UNION ALL\n".join(arms)
    return f"""
WITH toks AS (
  SELECT source, regexp_extract_all(lower(text), '[a-z]+') AS t
  FROM documents
)
SELECT source, CAST(n AS INTEGER) AS n, n_grams, n_distinct,
       round(n_distinct::DOUBLE / n_grams + 1e-8, 4) AS distinct_ratio
FROM ({unions})
ORDER BY source, n"""


def _length_profile_sql() -> str:
    q50, q90, q99 = corpus.LENGTH_QUANTILES
    return f"""
SELECT source, count(*) AS n_docs,
       round(avg(n_tokens) + 1e-8, 4) AS mean_tokens,
       round(quantile_cont(n_tokens, {q50!r}) + 1e-8, 4) AS p50_tokens,
       round(quantile_cont(n_tokens, {q90!r}) + 1e-8, 4) AS p90_tokens,
       round(quantile_cont(n_tokens, {q99!r}) + 1e-8, 4) AS p99_tokens
FROM (
  SELECT source, len(regexp_extract_all(lower(text), '[a-z]+')) AS n_tokens
  FROM documents
)
GROUP BY 1 ORDER BY 1"""


def _vocab_coverage_sql() -> str:
    ks = ", ".join(str(k) for k in corpus.COVERAGE_KS)
    return f"""
WITH freq AS (
  SELECT token, count(*) AS cnt
  FROM (SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS token
        FROM documents)
  GROUP BY 1
),
ranked AS (
  SELECT cnt, row_number() OVER (ORDER BY cnt DESC, token) AS rk FROM freq
),
t AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM ranked),
ks AS (SELECT unnest([{ks}]) AS top_k)
SELECT CAST(ks.top_k AS INTEGER) AS top_k,
       CAST(sum(r.cnt) AS BIGINT) AS covered_occurrences,
       CAST(max(t.total) AS BIGINT) AS total_occurrences,
       round(sum(r.cnt)::DOUBLE / max(t.total) + 1e-8, 4) AS coverage_frac
FROM ks JOIN ranked r ON r.rk <= ks.top_k CROSS JOIN t
GROUP BY 1 ORDER BY 1"""


LLM_CATALOG.extend(
    [
        QuerySpec(
            "corpus_ngram_diversity",
            corpus.ngram_diversity_by_source,
            _ngram_diversity_sql(),
            tags=("llm", "corpus", "diversity", "audit"),
        ),
        QuerySpec(
            "corpus_length_profile",
            corpus.token_length_profile,
            _length_profile_sql(),
            tags=("llm", "corpus", "profiling", "packing"),
        ),
        # Head coverage computed entirely on the count-histogram grain
        # (no vocab-grain window anywhere — VERDICT r7 "wrong" #3).
        # The exact vocab-grain twin (corpus.vocab_coverage) was RETIRED
        # from the catalog in round 10 (near-twin retirement, r9 VERDICT
        # item 3): coverage is tie-insensitive, so the two spellings are
        # bit-identical and this oracle gates both paths; the exact
        # operator stays, pinned by
        # tests/test_llm_ops.py::test_vocab_coverage_monotone_and_bounded
        # and the twin-parity test.
        QuerySpec(
            "corpus_vocab_coverage_scalable",
            corpus.vocab_coverage_scalable,
            _vocab_coverage_sql(),
            tags=("llm", "corpus", "tokenizer", "zipf", "scale-twin"),
        ),
    ]
)


def _quantile_shift_sql() -> str:
    qs = profiling.DRIFT_QS
    probes = ",\n         ".join(
        f"quantile_cont(CASE WHEN is_ref THEN value END, {q!r}) AS rv{i},"
        f" quantile_cont(CASE WHEN NOT is_ref THEN value END, {q!r}) AS cv{i}"
        for i, q in enumerate(qs)
    )
    i25, i75 = qs.index(0.25), qs.index(0.75)
    arms = "\n  UNION ALL\n".join(
        f"""  SELECT CAST({q!r} AS DOUBLE) AS quantile,
         round(rv{i} + 1e-8, 4) AS ref_value,
         round(cv{i} + 1e-8, 4) AS cur_value,
         round(cv{i} - rv{i} + 1e-8, 4) AS abs_shift,
         CASE WHEN rv{i75} - rv{i25} = 0 THEN 0.0
              ELSE round((cv{i} - rv{i}) / (rv{i75} - rv{i25}) + 1e-8, 4)
          END AS shift_iqr
  FROM q"""
        for i, q in enumerate(qs)
    )
    return f"""
WITH {_DRIFT_SPLIT_CTE},
q AS (
  SELECT {probes}
  FROM e
)
SELECT * FROM (
{arms}
) ORDER BY quantile"""


LLM_CATALOG.append(
    QuerySpec(
        "drift_value_quantile_shift",
        profiling.quantile_shift_drift,
        _quantile_shift_sql(),
        tags=("llm", "profiling", "drift", "evaluation"),
    )
)


def _monitor_rollup_sql() -> str:
    """Oracle for the monitor alert rollup: the full derivation — split,
    pseudo-batching by event_id % k, per-batch categorical PSI (per-batch
    category space + Laplace smoothing, the psi_report math), per-batch
    quantile shifts vs the frozen reference array (degenerate-IQR guard),
    per-batch null rate — then the metric union with thresholds and the
    per-metric first-breach window.  Constants (batch count, thresholds,
    probes) interpolate from the same module attributes the engine
    reads."""
    k = profiling.ROLLUP_BATCHES
    thr = profiling.MONITOR_THRESHOLDS
    qs = profiling.DRIFT_QS
    i25, i75 = qs.index(0.25), qs.index(0.75)
    ref_probes = ",\n       ".join(
        f"quantile_cont(value, CAST({q!r} AS DOUBLE)) AS rv{i}"
        for i, q in enumerate(qs)
    )
    cur_probes = ",\n       ".join(
        f"quantile_cont(value, CAST({q!r} AS DOUBLE)) AS cv{i}"
        for i, q in enumerate(qs)
    )
    shift_exprs = ",\n         ".join(
        f"""CASE WHEN rq.rv{i75} - rq.rv{i25} = 0 THEN 0.0
              ELSE round((cq.cv{i} - rq.rv{i}) / (rq.rv{i75} - rq.rv{i25})
                         + 1e-8, 4) END AS s{i}"""
        for i in range(len(qs))
    )
    greatest = ", ".join(f"abs(s{i})" for i in range(len(qs)))
    return f"""
WITH b AS (SELECT (epoch_us(min(ts)) + epoch_us(max(ts))) / 2.0 AS mid
           FROM events),
ev AS (SELECT event_id, value, event_type, epoch_us(ts) < b.mid AS is_ref
       FROM events CROSS JOIN b),
ref AS (SELECT * FROM ev WHERE is_ref),
cur AS (SELECT *, event_id % {k} AS batch_id FROM ev WHERE NOT is_ref),
refc AS (SELECT event_type, count(*) AS n_ref FROM ref GROUP BY 1),
curc AS (SELECT batch_id, event_type, count(*) AS n_cur
         FROM cur GROUP BY 1, 2),
bt AS (SELECT DISTINCT batch_id FROM cur),
refb AS (SELECT bt.batch_id, r.event_type, r.n_ref
         FROM bt CROSS JOIN refc r),
cnt AS (
  SELECT coalesce(a.batch_id, c.batch_id) AS batch_id,
         coalesce(a.event_type, c.event_type) AS event_type,
         coalesce(a.n_ref, 0) AS n_ref, coalesce(c.n_cur, 0) AS n_cur
  FROM refb a FULL OUTER JOIN curc c
    ON a.batch_id = c.batch_id AND a.event_type = c.event_type
),
tot AS (SELECT batch_id, sum(n_ref) AS t_ref, sum(n_cur) AS t_cur,
               count(*) AS k_cats
        FROM cnt GROUP BY 1),
psi AS (
  SELECT c.batch_id,
         round(sum(((c.n_cur + 0.5) / (t.t_cur + 0.5 * t.k_cats)
                    - (c.n_ref + 0.5) / (t.t_ref + 0.5 * t.k_cats))
               * ln(((c.n_cur + 0.5) / (t.t_cur + 0.5 * t.k_cats))
                    / ((c.n_ref + 0.5) / (t.t_ref + 0.5 * t.k_cats))))
               + 1e-8, 6) AS psi_total
  FROM cnt c JOIN tot t USING (batch_id) GROUP BY c.batch_id
),
rq AS (SELECT {ref_probes} FROM ref),
cq AS (SELECT batch_id, {cur_probes} FROM cur GROUP BY 1),
sh AS (
  SELECT cq.batch_id,
         {shift_exprs}
  FROM cq CROSS JOIN rq
),
shift AS (SELECT batch_id, GREATEST({greatest}) AS mx FROM sh),
nullr AS (SELECT batch_id,
                 (count(*) - count(value)) * 1.0 / count(*) AS v
          FROM cur GROUP BY 1),
m AS (
  SELECT 'psi_total' AS metric, batch_id,
         round(psi_total + 1e-8, 4) AS value,
         {thr["psi_total"]!r} AS threshold
  FROM psi
  UNION ALL
  SELECT 'max_quantile_shift_iqr', batch_id, round(mx + 1e-8, 4),
         {thr["max_quantile_shift_iqr"]!r}
  FROM shift
  UNION ALL
  SELECT 'null_rate_value', batch_id, round(v + 1e-8, 4),
         {thr["null_rate_value"]!r}
  FROM nullr
)
SELECT metric, CAST(batch_id AS INTEGER) AS batch_id, value,
       CAST(threshold AS DOUBLE) AS threshold,
       value > threshold AS breached,
       CAST(min(CASE WHEN value > threshold THEN batch_id END)
              OVER (PARTITION BY metric) AS INTEGER) AS first_breach_batch
FROM m
ORDER BY metric, batch_id"""


LLM_CATALOG.append(
    QuerySpec(
        "monitor_alert_rollup",
        profiling.monitor_alert_rollup,
        _monitor_rollup_sql(),
        tags=("llm", "profiling", "drift", "alerting"),
    )
)


# --- ROUND-15 registrations (all three PRE-BUILT round 13 as zero-churn
# --- modules, two-SF-diffed by their test files since; sf0.1 costs
# --- measured round 14 and recorded in SCALE.md before any QuerySpec
# --- landed — the round-13 pattern).  Each oracle instantiates the
# --- module's TEMPLATE with the catalog's own proven nested SQL
# --- (single source of truth — the house convention for composed
# --- entries, same spelling the tests diff at sf0.001 AND sf0.01). ---
LLM_CATALOG.extend(
    [
        QuerySpec(
            "tokenizer_fertility_report",
            tokenizer_health.tokenizer_fertility_report,
            tokenizer_health.oracle_fertility_report(
                next(
                    s.oracle
                    for s in LLM_CATALOG
                    if s.name == "corpus_bpe_token_counts"
                )
            ),
            tags=("llm", "tokenizer", "report"),
            headline=True,  # 2.63 s warm at sf0.1 (SCALE.md r14 preview)
        ),
        QuerySpec(
            "quality_gate_agreement",
            gate_agreement.quality_gate_agreement,
            gate_agreement.oracle_gate_agreement(
                next(
                    s.oracle
                    for s in LLM_CATALOG
                    if s.name == "text_quality_classifier"
                ),
                model_filter.ORACLE_MODEL_SCORES,
            ),
            tags=("llm", "quality", "trained", "report"),
            # deliberately OFF-headline: runs the trained gate's 8-step
            # GD, inheriting the quality-model pair's ~9 s floor
            # (10.38 s warm at sf0.1 — SCALE.md r14 preview).
        ),
        QuerySpec(
            "unimax_allocation",
            mixture_budget.unimax_allocation,
            mixture_budget.oracle_unimax_allocation(
                next(
                    s.oracle
                    for s in LLM_CATALOG
                    if s.name == "text_token_counts"
                )
            ),
            tags=("llm", "mixture", "curation"),
            headline=True,  # 1.43 s warm at sf0.1 (SCALE.md r14 preview)
        ),
    ]
)

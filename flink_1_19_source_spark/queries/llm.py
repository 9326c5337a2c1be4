"""North-star LLM-data-pipeline queries (SURVEY §2.11 N1–N5).

Dedup (exact, n-gram Jaccard, MinHash-LSH, SimHash), similarity search
(exact + LSH), text analysis (quality stats, token counting, lang-id,
fingerprinting) and multimodal plumbing over the `documents` /
`embeddings` tables. Every registered query is DuckDB-value-hash-oracled
(seeded permutations/planes are embedded as SQL literals so the oracle
replays the same hashes); approximate paths are additionally
recall-verified against their exact counterparts in tests/test_llm.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import dedup, multimodal, similarity, text_analysis as ta
from ..registry import register
from ..tables import load_table


# --------------------------------------------------------------------------
# N1 — exact dedup
# --------------------------------------------------------------------------
@register(
    "n1_exact_dedup",
    oracle="""
    SELECT text, MIN(doc_id) AS doc_id, COUNT(*) AS n_copies
    FROM documents GROUP BY text
    """,
    survey="N1",
)
def n1_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return dedup.exact_dedup(d, ["text"], "doc_id")


@register(
    "n1_fingerprint_dedup",
    oracle="""
    SELECT fp, MIN(doc_id) AS doc_id, COUNT(*) AS n_copies
    FROM (SELECT doc_id,
                 MD5(TRIM(REGEXP_REPLACE(LOWER(text), '\\s+', ' ', 'g'))) AS fp
          FROM documents)
    GROUP BY fp
    """,
    survey="N1 N4",
)
def n1_fingerprint_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup on the normalized-text fingerprint: catches duplicates that
    differ only in case/whitespace. At 100 TB this is the cheap first
    pass — a 32-byte digest shuffles instead of the document body."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select("doc_id", ta.fingerprint(F.col("text")).alias("fp"))
        .groupBy("fp")
        .agg(F.min("doc_id").alias("doc_id"), F.count(F.lit(1)).alias("n_copies"))
    )


# --------------------------------------------------------------------------
# N2 — near-dup dedup
# --------------------------------------------------------------------------
@register(
    "n2_ngram_jaccard_pairs",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(LOWER(text), '\\s+'),
                         t -> t <> '') AS tk
      FROM documents WHERE doc_id < 200
    ), sh AS (
      SELECT doc_id, list_distinct(
        CASE WHEN len(tk) >= 3 THEN
          list_transform(range(0, len(tk) - 2),
                         i -> array_to_string(list_slice(tk, i + 1, i + 3), ' '))
        ELSE [array_to_string(tk, ' ')] END) AS shingles
      FROM toks
    ), ex AS (
      SELECT doc_id, UNNEST(shingles) AS s FROM sh
    ), sizes AS (
      SELECT doc_id, COUNT(*) AS sz FROM ex GROUP BY doc_id
    ), inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_inter
      FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           ROUND(CAST(n_inter AS DOUBLE) / (sa.sz + sb.sz - n_inter), 9) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE CAST(n_inter AS DOUBLE) / (sa.sz + sb.sz - n_inter) >= 0.2
    """,
    survey="N2",
)
def n2_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard near-dup pairs (inverted-index self-join)."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return dedup.ngram_jaccard_pairs(d, "doc_id", "text", n=3, threshold=0.2)


@register(
    "n2_ngram_jaccard_capped",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(LOWER(text), '\\s+'),
                         t -> t <> '') AS tk
      FROM documents WHERE doc_id < 200
    ), sh AS (
      SELECT doc_id, list_distinct(
        CASE WHEN len(tk) >= 3 THEN
          list_transform(range(0, len(tk) - 2),
                         i -> array_to_string(list_slice(tk, i + 1, i + 3), ' '))
        ELSE [array_to_string(tk, ' ')] END) AS shingles
      FROM toks
    ), ex0 AS (
      SELECT doc_id, UNNEST(shingles) AS s FROM sh
    ), dfc AS (
      SELECT s, COUNT(*) AS df FROM ex0 GROUP BY s
    ), ex AS (
      -- stop-shingle cap: shingles seen in more than 10 docs are dropped
      -- BEFORE the self-join (same rule as the Spark operator)
      SELECT ex0.doc_id, ex0.s FROM ex0 JOIN dfc ON ex0.s = dfc.s
      WHERE dfc.df <= 10
    ), sizes AS (
      SELECT doc_id, COUNT(*) AS sz FROM ex GROUP BY doc_id
    ), inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_inter
      FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           ROUND(CAST(n_inter AS DOUBLE) / (sa.sz + sb.sz - n_inter), 9) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE CAST(n_inter AS DOUBLE) / (sa.sz + sb.sz - n_inter) >= 0.2
    """,
    survey="N2",
)
def n2_ngram_jaccard_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stop-shingle-capped exact Jaccard pairs — the 100 TB-safe variant of
    n2_ngram_jaccard_pairs: shingles with document frequency > 10 are
    dropped before the inverted-index self-join, bounding each shingle's
    pair fan-out at df² ≤ 100 (see operators/dedup.ngram_jaccard_pairs).
    Oracle applies the identical cap rule, proving the capped semantics."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return dedup.ngram_jaccard_pairs(
        d, "doc_id", "text", n=3, threshold=0.2, stop_shingle_df_cap=10
    )


# Shared oracle prefix: shingle → 63-bit hash, bit-exact with the pandas
# UDF path (`operators/dedup._shingle_hashes`): DuckDB's
# md5_number_lower(s) = little-endian low 8 md5 bytes, >> 1 keeps the
# value positive in a signed long on both engines.
_SHINGLE_HASH_CTES = """
    toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(LOWER(text), '\\s+'), t -> t <> '') AS tk
      FROM documents
    ), sh AS (
      SELECT doc_id, list_distinct(
        CASE WHEN len(tk) >= 3 THEN
          list_transform(range(0, len(tk) - 2),
                         i -> array_to_string(list_slice(tk, i + 1, i + 3), ' '))
        ELSE [array_to_string(tk, ' ')] END) AS shingles
      FROM toks
    ), hv AS (
      SELECT doc_id,
             CAST(md5_number_lower(unnest(shingles)) >> 1 AS BIGINT) AS h
      FROM sh
    )
"""


def _minhash_lsh_oracle(num_hashes: int = 32, bands: int = 8, seed: int = 42) -> str:
    """Full MinHash+LSH recomputation in DuckDB: the seeded permutation
    coefficients are embedded as literals (same generator as the Spark
    side — `dedup.minhash_perms`), band buckets keyed on the raw slice
    string (Spark compresses it through xxhash64; equal slices ⇒ equal
    keys either way, so the candidate sets agree)."""
    pa, pb = dedup.minhash_perms(num_hashes, seed)
    rpb = num_hashes // bands
    perms = ", ".join(
        f"({k}, {a}, {b})" for k, (a, b) in enumerate(zip(pa, pb))
    )
    return f"""
    WITH {_SHINGLE_HASH_CTES},
    perms(k, a, b) AS (VALUES {perms}),
    sig AS (
      SELECT doc_id, k, MIN(((h % 2147483647) * a + b) % 2147483647) AS sv
      FROM hv CROSS JOIN perms GROUP BY doc_id, k
    ), bandkey AS (
      SELECT doc_id, k // {rpb} AS band,
             string_agg(CAST(sv AS VARCHAR), ',' ORDER BY k) AS key
      FROM sig GROUP BY doc_id, k // {rpb}
    ), cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bandkey a JOIN bandkey b
        ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
    )
    SELECT c.id_a, c.id_b,
           CAST(SUM(CASE WHEN sa.sv = sb.sv THEN 1 ELSE 0 END) AS DOUBLE)
             / {num_hashes} AS est_jaccard
    FROM cand c
    JOIN sig sa ON sa.doc_id = c.id_a
    JOIN sig sb ON sb.doc_id = c.id_b AND sb.k = sa.k
    GROUP BY c.id_a, c.id_b
    """


@register(
    "n2_minhash_lsh_pairs",
    oracle=_minhash_lsh_oracle(),
    survey="N2",
    tags=("approx",),
)
def n2_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash + banded-LSH candidate pairs — the 100 TB-scale near-dup
    path. Fully oracled: the md5-derived shingle hash and seeded affine
    permutations are recomputed verbatim in DuckDB, so the driver
    value-hash-checks signatures, banding AND the Jaccard estimate."""
    d = load_table(spark, sf_dir, "documents")
    return dedup.minhash_lsh_pairs(d, "doc_id", "text", n=3, num_hashes=32, bands=8)


_SIMHASH_ORACLE = f"""
    WITH {_SHINGLE_HASH_CTES},
    bits AS (
      SELECT doc_id, t.b, SUM((h >> t.b) & 1) AS ones, COUNT(*) AS n
      FROM hv CROSS JOIN (SELECT CAST(range AS INT) AS b FROM range(63)) t
      GROUP BY doc_id, t.b
    )
    SELECT doc_id AS id,
           CAST(SUM(CASE WHEN 2 * ones > n
                         THEN (CAST(1 AS BIGINT) << b) ELSE 0 END) AS BIGINT)
             AS simhash
    FROM bits GROUP BY doc_id
"""


@register(
    "n2_simhash_fingerprints",
    oracle=_SIMHASH_ORACLE,
    survey="N2",
    tags=("approx",),
)
def n2_simhash_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash per document. Fully oracled: DuckDB recomputes the
    per-bit majority votes over the identical md5-derived shingle hashes
    (bit 63 left clear on both sides, so the long stays positive)."""
    d = load_table(spark, sf_dir, "documents")
    return dedup.simhash(d, "doc_id", "text", n=3)


@register(
    "n2_embedding_cosine_pairs",
    oracle="""
    WITH v AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      FROM embeddings WHERE vec_id < 150
    ), pairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             list_dot_product(a.e, b.e)
               / (SQRT(list_dot_product(a.e, a.e)) * SQRT(list_dot_product(b.e, b.e)))
               AS cs
      FROM v a JOIN v b ON a.vec_id < b.vec_id
    )
    SELECT id_a, id_b, ROUND(cs, 9) AS cosine_sim
    FROM pairs WHERE ROUND(cs, 9) >= 0.35
    """,
    survey="N2 N3",
)
def n2_embedding_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup: all pairs ≥ 0.35 cosine. Exact
    (quadratic) form on a bounded slice; the LSH path covers scale."""
    e = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 150)
    v = e.select("vec_id", similarity.as_double(F.col("embedding")).alias("e"))
    a, b = v.alias("a"), v.alias("b")
    cs = F.round(similarity.cosine(F.col("a.e"), F.col("b.e")), 9)
    return (
        a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("id_a"),
            F.col("b.vec_id").alias("id_b"),
            cs.alias("cosine_sim"),
        )
        .filter(F.col("cosine_sim") >= 0.35)
    )


@register(
    "n2_semantic_dedup",
    oracle="""
    WITH v AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      FROM embeddings WHERE vec_id < 600
    ), vn AS (
      SELECT vec_id, e, SQRT(list_dot_product(e, e)) AS nrm FROM v
    ), cn AS (
      SELECT vec_id AS cid, e AS ce, SQRT(list_dot_product(e, e)) AS cnrm
      FROM v WHERE vec_id < 8
    ), assign AS (
      SELECT vn.vec_id, cn.cid,
             ROW_NUMBER() OVER (PARTITION BY vn.vec_id
               ORDER BY list_dot_product(vn.e, cn.ce) / (vn.nrm * cn.cnrm)
                        DESC, cn.cid) AS rk
      FROM vn CROSS JOIN cn
    ), mem AS (
      SELECT vec_id, cid AS cluster FROM assign WHERE rk = 1
    ), dropped AS (
      SELECT DISTINCT b.vec_id
      FROM mem a JOIN mem b ON a.cluster = b.cluster AND a.vec_id < b.vec_id
      JOIN vn va ON va.vec_id = a.vec_id
      JOIN vn vb ON vb.vec_id = b.vec_id
      WHERE ROUND(list_dot_product(va.e, vb.e) / (va.nrm * vb.nrm), 9) >= 0.3
    )
    SELECT m.vec_id, CAST(m.cluster AS INTEGER) AS cluster
    FROM mem m LEFT JOIN dropped d ON d.vec_id = m.vec_id
    WHERE d.vec_id IS NULL
    """,
    survey="N2 N3",
)
def n2_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic dedup (operators/similarity.semantic_dedup):
    embeddings bucketed by nearest fixture centroid (the IVF codebook
    convention — first 8 corpus vectors, so the oracle rebuilds it from
    the data), pairwise cosine ONLY within a cluster, drop any vector a
    lower-id cluster-mate covers at ≥ 0.3 cosine. Iteration-free greedy
    rule = clean SQL; pair work is Σ|cluster|², never corpus² — at
    100 TB cluster id is the partition key and K grows with the corpus."""
    import numpy as np

    e = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 600)
    cent_rows = (
        e.filter(F.col("vec_id") < 8).orderBy("vec_id").select("embedding").collect()
    )
    centroids = np.array([r.embedding for r in cent_rows], dtype=float)
    return similarity.semantic_dedup(e, centroids, threshold=0.3)


@register(
    "n2_dedup_clusters",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(LOWER(text), '\\s+'), t -> t <> '') AS tk
      FROM documents WHERE doc_id < 200
    ), sh AS (
      SELECT doc_id, list_distinct(
        CASE WHEN len(tk) >= 3 THEN
          list_transform(range(0, len(tk) - 2),
                         i -> array_to_string(list_slice(tk, i + 1, i + 3), ' '))
        ELSE [array_to_string(tk, ' ')] END) AS shingles
      FROM toks
    ), ex AS (SELECT doc_id, UNNEST(shingles) AS s FROM sh),
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM ex GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_inter
      FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ), edges AS (
      SELECT id_a, id_b FROM inter
      JOIN sizes sa ON sa.doc_id = id_a
      JOIN sizes sb ON sb.doc_id = id_b
      WHERE CAST(n_inter AS DOUBLE) / (sa.sz + sb.sz - n_inter) >= 0.2
    ), und AS (
      SELECT id_a AS src, id_b AS dst FROM edges
      UNION SELECT id_b, id_a FROM edges
    ), reach AS (
      -- transitive closure (small near-dup graph; UNION dedups → terminates)
      WITH RECURSIVE r AS (
        SELECT src, dst FROM und
        UNION
        SELECT r.src, u.dst FROM r JOIN und u ON r.dst = u.src
      ) SELECT * FROM r
    )
    SELECT src AS id, LEAST(src, MIN(dst)) AS component
    FROM reach GROUP BY src
    """,
    survey="N2",
)
def n2_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clusters: exact-Jaccard pair graph → connected components
    via iterative min-label propagation (component = min doc_id reachable).
    The step that turns pairwise near-dup evidence into keep-one-per-
    cluster dedup decisions at corpus scale."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    pairs = dedup.ngram_jaccard_pairs(d, "doc_id", "text", n=3, threshold=0.2)
    return dedup.connected_components(pairs).select(
        F.col("id"), F.col("component")
    )


# --------------------------------------------------------------------------
# N3 — similarity search
# --------------------------------------------------------------------------
@register(
    "n3_cosine_topk",
    oracle="""
    WITH v AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      FROM embeddings
    ), q AS (SELECT * FROM v WHERE vec_id < 8),
    scored AS (
      SELECT q.vec_id AS query_id, v.vec_id AS neighbor_id,
             ROUND(list_dot_product(q.e, v.e)
               / (SQRT(list_dot_product(q.e, q.e)) * SQRT(list_dot_product(v.e, v.e))),
               9) AS cosine_sim
      FROM v CROSS JOIN q WHERE q.vec_id <> v.vec_id
    )
    SELECT query_id, neighbor_id, cosine_sim, rank FROM (
      SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                    ORDER BY cosine_sim DESC, neighbor_id) AS INTEGER) AS rank
      FROM scored
    ) WHERE rank <= 5
    """,
    survey="N3",
)
def n3_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact brute-force cosine top-5 for 8 query vectors (broadcast the
    query side; the corpus side streams through codegen)."""
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 8)
    return similarity.cosine_topk(e, q, k=5)


@register(
    "n3_int8_topk",
    oracle="""
    WITH v0 AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      FROM embeddings
    ), vs AS (
      SELECT vec_id, e,
             list_max(list_transform(e, x -> abs(x))) / 127 AS s
      FROM v0
    ), v AS (
      SELECT vec_id,
             CASE WHEN s > 0
                  THEN list_transform(e, x -> CAST(FLOOR(x / s + 0.5) AS DOUBLE))
                  ELSE e END AS e
      FROM vs
    ), q AS (SELECT * FROM v WHERE vec_id < 8),
    scored AS (
      SELECT q.vec_id AS query_id, v.vec_id AS neighbor_id,
             ROUND(list_dot_product(q.e, v.e)
               / (SQRT(list_dot_product(q.e, q.e)) * SQRT(list_dot_product(v.e, v.e))),
               9) AS cosine_sim
      FROM v CROSS JOIN q WHERE q.vec_id <> v.vec_id
    )
    SELECT query_id, neighbor_id, cosine_sim, rank FROM (
      SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                    ORDER BY cosine_sim DESC, neighbor_id) AS INTEGER) AS rank
      FROM scored
    ) WHERE rank <= 5
    """,
    survey="N3",
)
def n3_int8_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8-quantized cosine top-5: per-vector symmetric quantization
    (scales cancel in cosine, so scoring runs directly on the quantized
    components — exact integer arithmetic in doubles, bit-identical
    across engines). 4× smaller vectors on disk / in shuffles; recall
    vs the fp32 exact path is pinned in tests/test_llm.py."""
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", similarity.quantize_int8(F.col("embedding")).alias("qe")
    )
    q = e.filter(F.col("vec_id") < 8)
    return similarity.cosine_topk(e, q, vec_col="qe", k=5)


_IVF_ORACLE = """
    WITH v AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      FROM embeddings
    ), vn AS (
      SELECT vec_id, e, SQRT(list_dot_product(e, e)) AS nrm FROM v
    ), cn AS (
      SELECT vec_id AS cid, e AS ce, SQRT(list_dot_product(e, e)) AS cnrm
      FROM v WHERE vec_id < 16
    ), assign AS (
      SELECT vn.vec_id, cn.cid,
             ROW_NUMBER() OVER (PARTITION BY vn.vec_id
               ORDER BY list_dot_product(vn.e, cn.ce) / (vn.nrm * cn.cnrm)
                        DESC, cn.cid) AS rk
      FROM vn CROSS JOIN cn
    ), corpus_list AS (
      SELECT vec_id AS neighbor_id, cid AS list_id FROM assign WHERE rk = 1
    ), q_list AS (
      SELECT vec_id AS query_id, cid AS list_id
      FROM assign WHERE vec_id < 8 AND rk <= 3
    ), cand AS (
      SELECT DISTINCT q.query_id, c.neighbor_id
      FROM q_list q JOIN corpus_list c ON q.list_id = c.list_id
      WHERE q.query_id <> c.neighbor_id
    ), scored AS (
      SELECT cand.query_id, cand.neighbor_id,
             ROUND(list_dot_product(a.e, b.e) / (a.nrm * b.nrm), 9) AS cosine_sim
      FROM cand
      JOIN vn a ON a.vec_id = cand.query_id
      JOIN vn b ON b.vec_id = cand.neighbor_id
    )
    SELECT query_id, neighbor_id, cosine_sim, rank FROM (
      SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                    ORDER BY cosine_sim DESC, neighbor_id) AS INTEGER) AS rank
      FROM scored
    ) WHERE rank <= 5
    """


@register("n3_ivf_topk", oracle=_IVF_ORACLE, survey="N3", tags=("approx",))
def n3_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-bucketed ANN top-5: corpus partitioned into 16 inverted lists
    by nearest coarse centroid, queries probe their 3 nearest lists, exact
    cosine re-rank inside. The codebook is the first 16 corpus vectors
    (deterministic — production trains one offline), which lets the DuckDB
    oracle rebuild the identical codebook from the data and replay the
    whole assign→probe→re-rank pipeline (similarity ties break toward the
    lower centroid id on both engines: stable argsort ↔ ORDER BY cid)."""
    import numpy as np

    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 8)
    cent_rows = (
        e.filter(F.col("vec_id") < 16).orderBy("vec_id").select("embedding").collect()
    )
    centroids = np.array([r.embedding for r in cent_rows], dtype=float)
    return similarity.ivf_topk(e, q, centroids, k=5, nprobe=3)


#: Offline-fit sample bound for the trained-IVF codebook (the same
#: convention as trained-PQ's _PQ_FIT_SAMPLE): the Lloyd rounds train on
#: the first N vec_ids only, so the fit is O(sample) however large the
#: corpus — and 256 < the sf0.01 corpus, so the driver oracle certifies
#: the SAMPLE-BOUNDED fit, not a degenerate full-corpus one.
_IVF_FIT_SAMPLE = 256


def _ivf_trained_oracle(k: int = 8, rounds: int = 2, nprobe: int = 2,
                        topk: int = 5) -> str:
    """Composed oracle: the generated k-means unrolling (bit-exact
    quantized arithmetic) trains the codebook IN SQL on the first
    _IVF_FIT_SAMPLE vec_ids, then the IVF assign→probe→re-rank replays
    over the FULL corpus on top of it. Bucket formation uses the same
    decimal-exact distance as the fit (no float ties), re-ranking uses
    round-9 cosine like the other N3 oracles."""
    from ..operators import kmeans as km

    prefix = km.kmeans_cte_sql(k, rounds, sample=_IVF_FIT_SAMPLE)
    return f"""
    {prefix}
    , qdist AS (
      SELECT corpus.vec_id, cent{rounds}.cluster,
             CAST(SUM(CAST(ROUND((corpus.x - cent{rounds}.c)
                                 * (corpus.x - cent{rounds}.c), 6)
                           AS DECIMAL(27,6))) AS DOUBLE) AS dist
      FROM corpus JOIN cent{rounds} ON corpus.dim = cent{rounds}.dim
      GROUP BY 1, 2
    ), ranked AS (
      SELECT vec_id, cluster,
             ROW_NUMBER() OVER (PARTITION BY vec_id
                                ORDER BY dist, cluster) AS rn
      FROM qdist
    ), corpus_list AS (
      SELECT vec_id AS neighbor_id, cluster AS list_id FROM ranked WHERE rn = 1
    ), q_list AS (
      SELECT vec_id AS query_id, cluster AS list_id
      FROM ranked WHERE vec_id < 8 AND rn <= {nprobe}
    ), v AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      FROM embeddings
    ), vn AS (
      SELECT vec_id, e, SQRT(list_dot_product(e, e)) AS nrm FROM v
    ), cand AS (
      SELECT DISTINCT q.query_id, c.neighbor_id
      FROM q_list q JOIN corpus_list c ON q.list_id = c.list_id
      WHERE q.query_id <> c.neighbor_id
    ), scored AS (
      SELECT cand.query_id, cand.neighbor_id,
             ROUND(list_dot_product(a.e, b.e) / (a.nrm * b.nrm), 9) AS cosine_sim
      FROM cand
      JOIN vn a ON a.vec_id = cand.query_id
      JOIN vn b ON b.vec_id = cand.neighbor_id
    )
    SELECT query_id, neighbor_id, cosine_sim, rank FROM (
      SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                    ORDER BY cosine_sim DESC, neighbor_id) AS INTEGER) AS rank
      FROM scored
    ) WHERE rank <= {topk}
    """


@register(
    "n3_ivf_trained_topk",
    oracle=_ivf_trained_oracle(),
    survey="N3 X8",
    tags=("approx",),
)
def n3_ivf_trained_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF with a TRAINED codebook — the production answer to 'the
    fixed-codebook IVF is a fixture': k-means (k=8, 2 Lloyd rounds,
    operators/kmeans.py quantized-exact arithmetic) fits the coarse
    centroids in-engine on a SAMPLE (first _IVF_FIT_SAMPLE vec_ids —
    the offline-fit convention, so codebook training is O(sample) not
    O(corpus)); all corpus vectors land in their nearest trained list;
    queries probe their 2 nearest lists; exact round-9 cosine re-ranks
    inside. Fully oracled end to end — DuckDB re-trains the identical
    sample-bounded codebook via the generated Lloyd unrolling and
    replays the probe over the full corpus. At 100 TB assignment
    becomes the BLAS ``assign_blas`` path and list_id becomes the
    table's partition key (scan pruning does the probing)."""
    from ..operators import kmeans as km

    e = load_table(spark, sf_dir, "embeddings")
    corpus = (
        e.select("vec_id", F.posexplode("embedding").alias("dim", "xf"))
        .select(
            "vec_id",
            F.col("dim").cast("long").alias("dim"),
            F.round(F.col("xf").cast("double"), 6).alias("x"),
        )
        .localCheckpoint(eager=True)
    )
    fit = km.kmeans_long(
        corpus.filter(F.col("vec_id") < _IVF_FIT_SAMPLE), k=8, rounds=2
    )
    cent = (
        fit.select("cluster", "dim", F.col("centroid").alias("c"))
        .coalesce(1)
        .localCheckpoint(eager=True)
    )
    corpus_list = km.assign_topn(corpus, cent, 1).select(
        F.col("vec_id").alias("neighbor_id"), F.col("cluster").alias("list_id")
    )
    q_list = (
        km.assign_topn(corpus.filter(F.col("vec_id") < 8), cent, 2)
        .select(F.col("vec_id").alias("query_id"), F.col("cluster").alias("list_id"))
    )
    cand = (
        corpus_list.join(F.broadcast(q_list), "list_id")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    v = e.select("vec_id", similarity.as_double(F.col("embedding")).alias("ev"))
    scored = (
        cand.join(v.withColumnRenamed("vec_id", "query_id").withColumnRenamed("ev", "qv"), "query_id")
        .join(v.withColumnRenamed("vec_id", "neighbor_id").withColumnRenamed("ev", "nv"), "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(similarity.cosine(F.col("qv"), F.col("nv")), 9).alias("cosine_sim"),
        )
    )
    from pyspark.sql.window import Window as W

    w = W.partitionBy("query_id").orderBy(F.desc("cosine_sim"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= 5)


def _lsh_topk_oracle(dim: int = 64, num_planes: int = 16, bands: int = 4,
                     seed: int = 7) -> str:
    """Hyperplane-LSH recomputation in DuckDB: the seeded gaussian planes
    (identical generator as `similarity.hyperplane_planes`) are embedded
    as full-precision literals; band keys are rebuilt from the sign bits
    exactly as the packed-long bit math does on the Spark side."""
    import numpy as np  # noqa: F401  (planes come back as ndarray)

    planes = similarity.hyperplane_planes(dim, num_planes, seed)
    bpb = num_planes // bands
    rows = ", ".join(
        "({}, [{}]::DOUBLE[])".format(p, ", ".join(repr(x) for x in row))
        for p, row in enumerate(planes)
    )
    return f"""
    WITH v AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      FROM embeddings
    ), vn AS (
      SELECT vec_id, e, SQRT(list_dot_product(e, e)) AS nrm FROM v
    ), planes(p, w) AS (VALUES {rows}),
    bandkey AS (
      SELECT vec_id, p // {bpb} AS band,
             CAST(SUM(CASE WHEN list_dot_product(v.e, planes.w) >= 0
                           THEN (1 << (p % {bpb})) ELSE 0 END) AS BIGINT) AS key
      FROM v CROSS JOIN planes GROUP BY vec_id, p // {bpb}
    ), cand AS (
      SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
      FROM bandkey q JOIN bandkey c ON q.band = c.band AND q.key = c.key
      WHERE q.vec_id < 8 AND q.vec_id <> c.vec_id
    ), scored AS (
      SELECT cand.query_id, cand.neighbor_id,
             ROUND(list_dot_product(a.e, b.e) / (a.nrm * b.nrm), 9) AS cosine_sim
      FROM cand
      JOIN vn a ON a.vec_id = cand.query_id
      JOIN vn b ON b.vec_id = cand.neighbor_id
    )
    SELECT query_id, neighbor_id, cosine_sim, rank FROM (
      SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                    ORDER BY cosine_sim DESC, neighbor_id) AS INTEGER) AS rank
      FROM scored
    ) WHERE rank <= 5
    """


@register("n3_lsh_topk", oracle=_lsh_topk_oracle(), survey="N3", tags=("approx",))
def n3_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-LSH bucketed ANN top-5. Fully oracled: the seeded
    hyperplanes are plan constants on both engines, so DuckDB replays
    signature → banding → candidate join → exact re-rank end to end."""
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 8)
    return similarity.lsh_topk(e, q, dim=64, k=5, num_planes=16, bands=4)


# --------------------------------------------------------------------------
# N4 — text analysis
# --------------------------------------------------------------------------
@register(
    "n4_quality_stats",
    oracle="""
    SELECT doc_id,
           LENGTH(text) AS n_chars,
           len(list_filter(string_split_regex(LOWER(text), '\\s+'), t -> t <> ''))
             AS n_tokens,
           ROUND(CAST(LENGTH(text) - LENGTH(REGEXP_REPLACE(text, '[^\\w\\s]', '', 'g'))
                 AS DOUBLE) / LENGTH(text), 9) AS punct_ratio,
           ROUND(CAST(LENGTH(text) - LENGTH(REGEXP_REPLACE(text, '[A-Z]', '', 'g'))
                 AS DOUBLE) / LENGTH(text), 9) AS upper_ratio,
           ROUND(CAST(LENGTH(text) - (LENGTH(text) - LENGTH(REPLACE(text, ' ', '')))
                 AS DOUBLE)
                 / len(list_filter(string_split_regex(LOWER(text), '\\s+'),
                                   t -> t <> '')), 9) AS avg_token_len,
           len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))
             AS bpe_ish_tokens
    FROM documents WHERE doc_id < 300
    """,
    survey="N4",
)
def n4_quality_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    stats = ta.quality_stats(F.col("text"))
    return d.select(
        "doc_id",
        *[c.alias(name) for name, c in stats.items()],
        ta.bpe_ish_token_count(F.col("text")).alias("bpe_ish_tokens"),
    )


@register(
    "n4_lang_id",
    oracle="""
    WITH toks AS (
      SELECT doc_id, lang,
             list_filter(string_split_regex(LOWER(text), '\\s+'), t -> t <> '') AS tk
      FROM documents
    ), scores AS (
      SELECT doc_id, lang,
        len(list_filter(tk, t -> list_contains(['der','die','und','das','ist','nicht'], t))) AS s_de,
        len(list_filter(tk, t -> list_contains(['the','and','of','to','is','it'], t))) AS s_en,
        len(list_filter(tk, t -> list_contains(['el','los','y','es','una','para'], t))) AS s_es,
        len(list_filter(tk, t -> list_contains(['le','les','et','est','une','pour'], t))) AS s_fr,
        len(list_filter(tk, t -> list_contains(['de5','shi4','le5','zai4','he2','you3'], t))) AS s_zh
      FROM toks
    )
    SELECT doc_id, lang AS labeled_lang,
           CASE GREATEST(s_de, s_en, s_es, s_fr, s_zh)
             WHEN s_de THEN 'de' WHEN s_en THEN 'en' WHEN s_es THEN 'es'
             WHEN s_fr THEN 'fr' ELSE 'zh' END AS detected_lang
    FROM scores
    """,
    survey="N4",
)
def n4_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stopword-overlap language id vs the labeled lang.
    (CASE..GREATEST in the oracle picks the first language in de<en<es<fr<zh
    order on ties — same rule as the engine's argmax/min-code.)

    Repartition = local-fixture parallelism only (one-file corpus = one
    input split); real corpora shard across files."""
    d = load_table(spark, sf_dir, "documents").repartition(24)
    return d.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        ta.lang_id(F.col("text")).alias("detected_lang"),
    )


@register(
    "n4_corpus_token_stats",
    oracle="""
    WITH ex AS (
      SELECT doc_id, lang,
             UNNEST(list_filter(string_split_regex(LOWER(text), '\\s+'),
                                t -> t <> '')) AS tok
      FROM documents
    )
    SELECT lang, tok, COUNT(*) AS tf, COUNT(DISTINCT doc_id) AS df
    FROM ex GROUP BY lang, tok
    HAVING COUNT(*) >= 50
    """,
    survey="N4 R4 A1",
)
def n4_corpus_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level term/document frequency (the tf-idf building block):
    explode → two-level agg; partial aggregation collapses each partition's
    token counts before the shuffle."""
    d = load_table(spark, sf_dir, "documents")
    ex = d.select("doc_id", "lang", F.explode(ta.tokens(F.col("text"))).alias("tok"))
    return (
        ex.groupBy("lang", "tok")
        .agg(
            F.count(F.lit(1)).alias("tf"),
            F.countDistinct("doc_id").alias("df"),
        )
        .filter(F.col("tf") >= 50)
    )


@register(
    "n3_pq_topk",
    oracle="""
    WITH v AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      FROM embeddings
    ), ms AS (SELECT UNNEST(range(0, 4)) AS m),
    cb AS (
      SELECT ms.m, v.vec_id AS cb_k,
             list_slice(v.e, ms.m*16 + 1, ms.m*16 + 16) AS cw
      FROM v, ms WHERE v.vec_id < 8
    ), sub AS (
      SELECT v.vec_id AS vid, ms.m,
             list_slice(v.e, ms.m*16 + 1, ms.m*16 + 16) AS sv
      FROM v, ms
    ), dist AS (
      SELECT s.vid, s.m, cb.cb_k,
             list_sum(list_transform(range(1, 17),
                      j -> (s.sv[j] - cb.cw[j]) * (s.sv[j] - cb.cw[j]))) AS d2
      FROM sub s JOIN cb ON s.m = cb.m
    ), codes AS (
      SELECT vid AS neighbor_id, m, cb_k AS code FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY vid, m
                                     ORDER BY d2, cb_k) AS rn
        FROM dist
      ) WHERE rn = 1
    ), score AS (
      SELECT d.vid AS query_id, c.neighbor_id, SUM(d.d2) AS ad
      FROM codes c JOIN dist d ON d.m = c.m AND d.cb_k = c.code
      WHERE d.vid < 8
      GROUP BY 1, 2
    )
    SELECT query_id, neighbor_id,
           ROUND(ad, 6) AS approx_dist,
           CAST(rank AS BIGINT) AS rank
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                    ORDER BY ad, neighbor_id) AS rank
      FROM score
    ) WHERE rank <= 5
    """,
    survey="N3",
    tags=("approx",),
)
def n3_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN with asymmetric distance computation
    (operators/similarity.pq_topk): 64-d vectors → 4 one-byte codes via
    per-subspace argmin against an 8-codeword codebook; query scoring
    sums per-subspace lookup-table entries instead of touching raw
    embeddings.  The oracle replays the ENTIRE pipeline — codebook,
    encoding, LUT, ADC ranking — relationally in DuckDB, so the
    quantizer itself is value-certified, not just its recall."""
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 8)
    return similarity.pq_topk(e, q, dim=64, n_subspaces=4, codebook_ids=8, k=5)



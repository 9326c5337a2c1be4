"""N2/N3 approximate-path evaluation reports (SURVEY §2.11).

Split out of queries/llm.py (the ~900-line house bound): the
recall-vs-similarity curve for MinHash-LSH, the IVF recall report, and
SimHash near-dup pairs — the queries that certify the approximate
operators against their exact counterparts, value-hash-oracled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import dedup, similarity
from ..registry import register
from ..tables import load_table
from .llm import _SHINGLE_HASH_CTES


def _lsh_recall_oracle(num_hashes: int = 32, bands: int = 8, seed: int = 42) -> str:
    pa, pb = dedup.minhash_perms(num_hashes, seed)
    rpb = num_hashes // bands
    perms = ", ".join(f"({k}, {a}, {b})" for k, (a, b) in enumerate(zip(pa, pb)))
    return f"""
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
    ), exact AS (
      SELECT id_a, id_b,
             ROUND(CAST(n_inter AS DOUBLE) / (sa.sz + sb.sz - n_inter), 9) AS j
      FROM inter
      JOIN sizes sa ON sa.doc_id = id_a
      JOIN sizes sb ON sb.doc_id = id_b
      WHERE CAST(n_inter AS DOUBLE) / (sa.sz + sb.sz - n_inter) >= 0.3
    ), hv AS (
      SELECT doc_id, CAST(md5_number_lower(unnest(shingles)) >> 1 AS BIGINT) AS h
      FROM sh
    ),
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
    SELECT CAST(FLOOR(e.j * 10) AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_true,
           CAST(COUNT(c.id_a) AS BIGINT) AS n_found,
           ROUND(CAST(COUNT(c.id_a) AS DOUBLE) / COUNT(*), 9) AS recall
    FROM exact e
    LEFT JOIN cand c ON c.id_a = e.id_a AND c.id_b = e.id_b
    GROUP BY 1
    """


@register("n2_lsh_recall_report", oracle=_lsh_recall_oracle(), survey="N2 N3")
def n2_lsh_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH quality evaluation AS DATA: exact-Jaccard ground-truth pairs
    (threshold 0.3) bucketed by similarity, each bucket reporting how
    many pairs banded MinHash-LSH recovered — the recall-vs-similarity
    curve every production near-dup deployment tunes (bands/rows
    trade-off). Both the ground truth and the candidate set are computed
    in-engine and the whole curve is value-hash-oracled."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    exact = dedup.ngram_jaccard_pairs(d, "doc_id", "text", n=3, threshold=0.3)
    cand = (
        dedup.minhash_lsh_pairs(d, "doc_id", "text", n=3, num_hashes=32, bands=8)
        .select("id_a", "id_b")
        .withColumn("_f", F.lit(1))
    )
    return (
        exact.join(cand, ["id_a", "id_b"], "left")
        .groupBy(F.floor(F.col("jaccard") * 10).cast("long").alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_true"),
            F.count("_f").alias("n_found"),
        )
        .withColumn(
            "recall",
            F.round(F.col("n_found").cast("double") / F.col("n_true"), 9),
        )
    )


_IVF_RECALL_ORACLE = """
    WITH v AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      FROM embeddings
    ), vn AS (
      SELECT vec_id, e, SQRT(list_dot_product(e, e)) AS nrm FROM v
    ), q AS (SELECT * FROM vn WHERE vec_id < 8),
    exact AS (
      SELECT query_id, neighbor_id FROM (
        SELECT q.vec_id AS query_id, vn.vec_id AS neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY q.vec_id
                 ORDER BY list_dot_product(q.e, vn.e) / (q.nrm * vn.nrm)
                          DESC, vn.vec_id) AS rk
        FROM vn CROSS JOIN q WHERE q.vec_id <> vn.vec_id
      ) WHERE rk <= 5
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
    )
    SELECT e.query_id,
           CAST(COUNT(*) AS BIGINT) AS n_exact,
           CAST(COUNT(c.neighbor_id) AS BIGINT) AS n_recovered,
           ROUND(CAST(COUNT(c.neighbor_id) AS DOUBLE) / COUNT(*), 9) AS recall
    FROM exact e
    LEFT JOIN cand c
      ON c.query_id = e.query_id AND c.neighbor_id = e.neighbor_id
    GROUP BY e.query_id
    """


@register("n3_ivf_recall_report", oracle=_IVF_RECALL_ORACLE, survey="N3")
def n3_ivf_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF quality evaluation AS DATA (the ANN sibling of
    n2_lsh_recall_report): per query, how many of the exact cosine top-5
    appear in the IVF candidate set at nprobe=3 — the recall-vs-probe
    curve every IVF deployment tunes. Both sides computed in-engine and
    fully value-hash-oracled."""
    import numpy as np

    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 8)
    exact = similarity.cosine_topk(e, q, k=5).select("query_id", "neighbor_id")
    cent_rows = (
        e.filter(F.col("vec_id") < 16).orderBy("vec_id").select("embedding").collect()
    )
    centroids = np.array([r.embedding for r in cent_rows], dtype=float)
    cand = (
        similarity.ivf_candidates(e, q, centroids, nprobe=3)
        if hasattr(similarity, "ivf_candidates")
        else similarity.ivf_topk(e, q, centroids, k=10**9, nprobe=3).select(
            "query_id", "neighbor_id"
        )
    )
    cand = cand.select("query_id", "neighbor_id").withColumn("_f", F.lit(1))
    return (
        exact.join(cand, ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(
            F.count(F.lit(1)).alias("n_exact"),
            F.count("_f").alias("n_recovered"),
        )
        .withColumn(
            "recall",
            F.round(F.col("n_recovered").cast("double") / F.col("n_exact"), 9),
        )
    )


_SIMHASH_PAIRS_ORACLE = f"""
    WITH {_SHINGLE_HASH_CTES},
    bits AS (
      SELECT doc_id, t.b, SUM((h >> t.b) & 1) AS ones, COUNT(*) AS n
      FROM hv CROSS JOIN (SELECT CAST(range AS INT) AS b FROM range(63)) t
      GROUP BY doc_id, t.b
    ), fp AS (
      SELECT doc_id AS id,
             CAST(SUM(CASE WHEN 2 * ones > n
                           THEN (CAST(1 AS BIGINT) << b) ELSE 0 END) AS BIGINT)
               AS f
      FROM bits GROUP BY doc_id
    ), blocks AS (
      SELECT id, f, t.i AS b, (f >> (16 * t.i)) & 65535 AS bv
      FROM fp, (SELECT UNNEST([0, 1, 2, 3]) AS i) t
    ), cand AS (
      SELECT DISTINCT a.id AS id_a, b.id AS id_b, a.f AS fa, b.f AS fb
      FROM blocks a JOIN blocks b
        ON a.b = b.b AND a.bv = b.bv AND a.id < b.id
    )
    SELECT id_a, id_b, CAST(bit_count(xor(fa, fb)) AS BIGINT) AS hamming
    FROM cand WHERE bit_count(xor(fa, fb)) <= 3
"""


@register("n2_simhash_pairs", oracle=_SIMHASH_PAIRS_ORACLE, survey="N2")
def n2_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash Hamming-ball candidate pairs (operators/dedup.simhash_pairs):
    the 4×16-bit-block pigeonhole join — two 64-bit fingerprints within
    Hamming distance ≤ 3 must share an exact block — then the popcount
    re-check. The whole pipeline (fingerprints, block buckets, XOR
    popcounts) is value-hash-oracled."""
    d = load_table(spark, sf_dir, "documents")
    return dedup.simhash_pairs(d, "doc_id", "text", n=3, max_hamming=3)




# --------------------------------------------------------------------------
# N3 — PQ with TRAINED per-subspace codebooks (the FAISS-default fit)
# --------------------------------------------------------------------------
_PQ_FIT_SAMPLE = 1024  # offline-fit sample bound: training is O(sample)


def _pq_trained_oracle(n_sub: int = 4, dsub: int = 16, k_codes: int = 8,
                       rounds: int = 2, k: int = 5) -> str:
    from ..operators.kmeans import kmeans_cte_sql_subspace

    chains = "".join(
        kmeans_cte_sql_subspace(f"s{s}", k_codes, rounds, s * dsub, dsub,
                                sample=_PQ_FIT_SAMPLE)
        for s in range(n_sub)
    )
    cb_union = "\n      UNION ALL ".join(
        f"SELECT {s} AS m, cluster AS cb_k, list(c ORDER BY dim) AS cw "
        f"FROM s{s}cent{rounds} GROUP BY cluster"
        for s in range(n_sub)
    )
    return f"""
    WITH _one AS (SELECT 1){chains}
    , cb AS (
      {cb_union}
    ), v AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      FROM embeddings
    ), ms AS (SELECT UNNEST(range(0, {n_sub})) AS m),
    sub AS (
      SELECT v.vec_id AS vid, ms.m,
             list_slice(v.e, ms.m*{dsub} + 1, ms.m*{dsub} + {dsub}) AS sv
      FROM v, ms
    ), dist AS (
      SELECT s.vid, s.m, cb.cb_k,
             list_sum(list_transform(range(1, {dsub + 1}),
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
    ) WHERE rank <= {k}
    """


@register(
    "n3_pq_trained_topk",
    oracle=_pq_trained_oracle(),
    survey="N3 X8",
    tags=("approx",),
)
def n3_pq_trained_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product quantization with TRAINED per-subspace codebooks — the
    fit FAISS's IndexPQ actually runs [Jégou et al. 2011 §III: an
    independent k-means per subquantizer], closing the one fixture
    convention left in the PQ family (n3_pq_topk's codebook is the
    first-8-subvectors fixture; n3_ivf_trained_topk trained the COARSE
    level — this trains the PRODUCT level): four independent k-means
    fits (k=8, 2 Lloyd rounds, operators/kmeans.py quantized-exact
    arithmetic) over each 16-dim slice of the FIRST-1024 training
    sample — the offline-fit-on-a-sample convention, so training is
    O(sample) however large the corpus — their centroids becoming the
    codewords; encode/LUT/ADC then run the SAME certified scoring
    kernel over the FULL corpus via pq_topk's codebook hook.  The
    oracle re-trains all four codebooks via generated Lloyd unrollings
    (one sample-bounded CTE chain per subspace) and replays the whole
    quantizer — fit AND scoring are value-certified end to end.

    At 100 TB the fits stay sample-sized, codes store at 4
    bytes/vector, and scoring shuffles code rows only — identical plan
    shape to the fixture edition."""
    from functools import reduce

    from ..operators import kmeans as km

    e = load_table(spark, sf_dir, "embeddings")
    fit_sample = e.filter(F.col("vec_id") < _PQ_FIT_SAMPLE)

    def _fit_subspace(s: int) -> DataFrame:
        sub_corpus = fit_sample.select(
            "vec_id",
            F.posexplode(
                F.slice(F.col("embedding"), s * 16 + 1, 16)
            ).alias("dim", "xf"),
        ).select(
            "vec_id",
            F.col("dim").cast("long").alias("dim"),
            F.round(F.col("xf").cast("double"), 6).alias("x"),
        )
        fit = km.kmeans_long(sub_corpus, k=8, rounds=2)
        return fit.select(
            F.lit(s).alias("m"),
            F.col("cluster").alias("cb_k"),
            "dim",
            "centroid",
        )

    # the four fits are fully independent lineages — submit them from
    # four driver threads so their per-round checkpoints overlap (the
    # result is deterministic either way; only wall-clock changes)
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=4) as pool:
        cb_parts = list(pool.map(_fit_subspace, range(4)))
    cb = (
        reduce(lambda a, b: a.unionByName(b), cb_parts)
        .groupBy("m", "cb_k")
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(dim, centroid))),"
                " x -> x.centroid)"
            ).alias("cw")
        )
        .coalesce(1)
        .localCheckpoint(eager=True)
    )
    q = e.filter(F.col("vec_id") < 8)
    return similarity.pq_topk(
        e, q, dim=64, n_subspaces=4, k=5, codebook=cb
    )

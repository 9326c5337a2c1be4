"""Corpus-hygiene operators for pretraining-data pipelines (SURVEY §2.11
N4/N6 extensions).

The second tier of what a 100 TB training-data run needs beyond dedup:

- ``pii_counts`` / ``pii_redact``: detect and mask emails / IPv4 / phone
  numbers with Catalyst regexps — JVM-side, whole-stage codegen, one
  narrow scan, no shuffle. The patterns are deliberately RE2-compatible
  so the DuckDB oracle applies the byte-identical regex.
- ``contamination``: benchmark n-gram overlap (the eval-set leakage
  check): the benchmark side is tiny by construction (eval sets are KBs,
  the corpus is TBs), so its distinct-shingle set is **broadcast** and
  the 100 TB side never shuffles — each task filter-joins its partition
  against the in-memory gram set.
- ``repetition_signals``: Gopher-style repetitiousness metrics
  (duplicate-token fraction, top-token share, top-bigram share) as pure
  per-row array expressions — O(distinct·len) per document inside
  codegen, zero shuffle; the alternative explode→groupBy→window shape
  shuffles the whole token stream and is strictly worse at scale.
- ``pack_sequences``: deterministic greedy sequence packing — documents
  are packed in id order into fixed token budgets within each pack
  group. Groups (here ``source``; at scale a hash bucket of bounded row
  count) are the unit of parallelism: one ``applyInPandas`` task packs
  one group sequentially, groups pack concurrently. The driver-side
  oracle is a recursive CTE replaying the identical fold.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text_analysis import bpe_ish_token_count
from .dedup import tokenize, word_shingles

# RE2-compatible PII patterns (no lookarounds, no \b needed — structure
# anchors the match). Applied in order: email, phone, IPv4 — email first
# so its local part can't be half-eaten by the number patterns.
EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
PHONE_RE = "\\+[0-9]{1,2}-[0-9]{3}-[0-9]{3}-[0-9]{4}"
IPV4_RE = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"

_PII = (("<EMAIL>", EMAIL_RE), ("<PHONE>", PHONE_RE), ("<IP>", IPV4_RE))


def pii_counts(text: Column) -> dict[str, Column]:
    """Occurrence counts per PII class (long columns)."""
    return {
        "n_emails": F.size(F.regexp_extract_all(text, F.lit(EMAIL_RE), 0)).cast("long"),
        "n_phones": F.size(F.regexp_extract_all(text, F.lit(PHONE_RE), 0)).cast("long"),
        "n_ips": F.size(F.regexp_extract_all(text, F.lit(IPV4_RE), 0)).cast("long"),
    }


def pii_redact(text: Column) -> Column:
    """Mask every PII match with its class token. Idempotent: the mask
    tokens contain no '@', '+digit' or dotted-quad shape, so a second
    pass is a no-op (pinned by tests/test_corpus.py)."""
    out = text
    for token, pattern in _PII:
        out = F.regexp_replace(out, pattern, token)
    return out


def contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 5,
) -> DataFrame:
    """Benchmark-overlap (contamination) score per corpus document: the
    fraction of the document's distinct word ``n``-grams that appear in
    ANY benchmark document.

    Scale shape: the benchmark's distinct gram set is broadcast (eval
    sets are tiny); the corpus side is explode → broadcast-hash left
    join → per-doc agg — one shuffle on ``id_col`` for the agg, none
    for the join.
    """
    bench_grams = (
        benchmark.select(F.explode(word_shingles(F.col(text_col), n)).alias("gram"))
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    exploded = corpus.select(
        F.col(id_col), F.explode(word_shingles(F.col(text_col), n)).alias("gram")
    )
    return (
        exploded.join(F.broadcast(bench_grams), "gram", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            # count-of-non-null, not SUM: both engines yield a 64-bit int
            # (DuckDB SUM over ints widens to HUGEINT → float in pandas)
            F.count(F.col("hit")).alias("n_hit"),
        )
        .select(
            id_col,
            "n_grams",
            "n_hit",
            F.round(F.col("n_hit").cast("double") / F.col("n_grams"), 9).alias(
                "contamination"
            ),
        )
    )


def repetition_signals(text: Column) -> dict[str, Column]:
    """Gopher-style repetitiousness metrics as pure array expressions.

    - ``dup_token_frac``: 1 − distinct/total tokens.
    - ``top_token_frac``: share of the most frequent token.
    - ``top_bigram_frac``: share of the most frequent word bigram.

    All ratios rounded to 9 places so they hash-compare across engines.
    """
    toks = tokenize(text)
    n = F.size(toks)

    def top_frac(arr: Column, total: Column) -> Column:
        # Max element frequency as an O(n) fold: sort the array, then a
        # single `aggregate` pass tracks the current and best run length.
        # The obvious distinct×filter expression is O(distinct·len) with a
        # fresh array allocation per distinct element — measured 265 s for
        # the 50k-doc corpus vs ~4 s for this fold (same result, the
        # DuckDB oracle keeps the quadratic spelling since it's fast there).
        def step(acc: Column, x: Column) -> Column:
            run = (
                F.when(acc.prev.isNull() | (acc.prev != x), F.lit(1))
                .otherwise(acc.run + 1)
            )
            return F.struct(
                x.alias("prev"), run.alias("run"),
                F.greatest(acc.best, run).alias("best"),
            )

        top = F.aggregate(
            F.array_sort(arr),
            F.struct(
                F.lit(None).cast("string").alias("prev"),
                F.lit(0).alias("run"),
                F.lit(0).alias("best"),
            ),
            step,
            lambda acc: acc.best,
        )
        return F.round(
            F.when(total > 0, top.cast("double") / total).otherwise(F.lit(0.0)), 9
        )

    bigrams = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(0), n - 2),
            lambda i: F.array_join(F.slice(toks, i + 1, 2), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))

    return {
        "n_tokens": n.cast("long"),
        "dup_token_frac": F.round(
            F.when(
                n > 0,
                1.0 - F.size(F.array_distinct(toks)).cast("double") / n,
            ).otherwise(F.lit(0.0)),
            9,
        ),
        "top_token_frac": top_frac(toks, n),
        "top_bigram_frac": top_frac(bigrams, F.size(bigrams)),
    }


def pack_sequences(
    df: DataFrame,
    group_col: str,
    order_col: str,
    text_col: str,
    budget: int,
    counts_col: str | None = None,
) -> DataFrame:
    """Greedy sequential sequence packing: within each ``group_col``
    partition, walk documents in ``order_col`` order and assign each to
    the current pack until adding it would exceed ``budget`` tokens, then
    open the next pack. A single document over budget gets a pack of its
    own (training pipelines then truncate/split it downstream).

    Deterministic: the fold depends only on (group, order, token count).
    One shuffle (groupBy), then each group packs sequentially in one
    Arrow-batched task; at 100 TB the group key is a bounded-size hash
    bucket so no task sees unbounded rows.
    """
    from pyspark.sql import types as T

    # counts_col: pack by a PRE-COMPUTED token count (e.g. real BPE
    # counts from a trained vocabulary) instead of the regex estimate
    counts = (
        F.col(counts_col).cast("long")
        if counts_col
        else bpe_ish_token_count(F.col(text_col))
    )
    base = df.select(
        F.col(group_col), F.col(order_col), counts.alias("n_tokens")
    )
    schema = T.StructType(
        [
            base.schema[group_col],
            base.schema[order_col],
            T.StructField("n_tokens", T.LongType()),
            T.StructField("pack_id", T.LongType()),
        ]
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col).reset_index(drop=True)
        run, pack_id, out = 0, 0, []
        for t in pdf["n_tokens"]:
            if run > 0 and run + t > budget:
                pack_id += 1
                run = int(t)
            else:
                run += int(t)
            out.append(pack_id)
        pdf["pack_id"] = out
        return pdf[[group_col, order_col, "n_tokens", "pack_id"]]

    return base.groupBy(group_col).applyInPandas(pack, schema)


def wordpiece_segment(
    word: str,
    start_vocab: "set[str]",
    cont_vocab: "set[str]",
    max_piece: int = 4,
    unk: str = "[UNK]",
) -> list[str]:
    """WordPiece greedy longest-match-first segmentation (Wu et al.
    2016 §4.1): repeatedly take the LONGEST vocab piece at the cursor
    (``start_vocab`` at position 0, ``cont_vocab`` — emitted with the
    '##' prefix — after); a word with no match at any position
    collapses to ``[unk]`` WHOLE, discarding earlier pieces — the real
    WordPiece failure mode, not a partial fallback."""
    pos, toks = 0, []
    while pos < len(word):
        for length in range(min(max_piece, len(word) - pos), 0, -1):
            piece = word[pos:pos + length]
            if piece in (start_vocab if pos == 0 else cont_vocab):
                toks.append(piece if pos == 0 else "##" + piece)
                pos += length
                break
        else:
            return [unk]
    return toks


def unigram_viterbi_segment(
    word: str, weights: "dict[str, int]", max_piece: int = 4
) -> list[str]:
    """Unigram-LM Viterbi segmentation (Kudo 2018, SentencePiece): pick
    the piece sequence maximizing the summed piece weights — here an
    EXACT-INTEGER proxy for log p(piece): ``bit_length(count) * 64 - 1``
    per piece (floor-log2 via bit length keeps both engines bit-identical
    where float logs could diverge, the same device as the LM surprisal
    filter; the ``- 1`` makes fewer-pieces win every exact tie, since
    piece lengths sum to the word length).

    Backward DP over positions, then a forward walk that takes the
    LONGEST piece achieving the optimum at each cursor — the
    deterministic tie-break the DuckDB oracle replays with its
    length-4..1 CASE.  ``weights`` must contain every single character
    of the word (the caller's vocab includes all corpus characters), so
    segmentation never fails."""
    n = len(word)
    best = [0] * (n + 1)
    for pos in range(n - 1, -1, -1):
        b = None
        for length in range(1, min(max_piece, n - pos) + 1):
            wt = weights.get(word[pos:pos + length])
            if wt is not None:
                cand = wt + best[pos + length]
                if b is None or cand > b:
                    b = cand
        assert b is not None, f"no piece at {word!r}[{pos}]"
        best[pos] = b
    pos, toks = 0, []
    while pos < n:
        for length in range(min(max_piece, n - pos), 0, -1):
            wt = weights.get(word[pos:pos + length])
            if wt is not None and wt + best[pos + length] == best[pos]:
                toks.append(word[pos:pos + length])
                pos += length
                break
    return toks


def unigram_em_expected_counts(
    word: str, probs: "dict[str, float]", max_piece: int = 4,
    scale: float = 1048576.0,
) -> "dict[str, int]":
    """One EM E-step over ONE word (Kudo 2018 §3.2 — the SentencePiece
    trainer's inner loop): forward-backward over the segmentation
    lattice, returning each vocab piece's posterior expected count in
    this word, QUANTIZED to an integer at ``scale`` so every downstream
    aggregate is exact int64 arithmetic (order-free — the device that
    lets the DuckDB oracle hash-match the M-step bit for bit).

    Numeric contract, replayed verbatim by the SQL oracle's recursive
    CTEs: alpha/beta are IEEE doubles accumulated in FIXED l=1..4
    order with +0.0 for absent pieces (adding +0.0 to a non-negative
    double is an exact no-op, so skipping absent terms is equivalent);
    each occurrence's count is the one left-associative op chain
    ``floor(alpha[i] * p * beta[j] / alpha[L] * scale + 0.5)`` — every
    op correctly rounded on identical operands in Python, the JVM and
    DuckDB.  Words with alpha[L] == 0 (no in-vocab segmentation mass)
    contribute nothing."""
    import math

    n = len(word)
    alpha = [0.0] * (n + 1)
    alpha[0] = 1.0
    for j in range(1, n + 1):
        s = 0.0
        for length in range(1, min(max_piece, j) + 1):
            p = probs.get(word[j - length:j])
            if p is not None:
                s = s + p * alpha[j - length]
        alpha[j] = s
    if alpha[n] <= 0.0:
        return {}
    beta = [0.0] * (n + 1)
    beta[n] = 1.0
    for i in range(n - 1, -1, -1):
        s = 0.0
        for length in range(1, min(max_piece, n - i) + 1):
            p = probs.get(word[i:i + length])
            if p is not None:
                s = s + p * beta[i + length]
        beta[i] = s
    out: dict[str, int] = {}
    for i in range(n):
        for length in range(1, min(max_piece, n - i) + 1):
            piece = word[i:i + length]
            p = probs.get(piece)
            if p is None:
                continue
            ec = math.floor(
                alpha[i] * p * beta[i + length] / alpha[n] * scale + 0.5
            )
            if ec:
                out[piece] = out.get(piece, 0) + ec
    return out


def unigram_viterbi_product_segment(
    word: str, probs: "dict[str, float]", max_piece: int = 4
) -> "list[str]":
    """Max-PRODUCT Viterbi segmentation over trained piece
    probabilities (the trained-vocab twin of unigram_viterbi_segment's
    integer-weight proxy): best[pos] = max over pieces of
    p(piece) * best[pos + len); the forward walk takes the LONGEST
    piece achieving the optimum at each cursor.  Every product is one
    correctly-rounded double op on identical operands, so the DuckDB
    replay (GREATEST over the same products) is bit-identical —
    including ties, which compare exact doubles."""
    n = len(word)
    best = [0.0] * (n + 1)
    best[n] = 1.0
    for pos in range(n - 1, -1, -1):
        b = None
        for length in range(1, min(max_piece, n - pos) + 1):
            p = probs.get(word[pos:pos + length])
            if p is not None:
                cand = p * best[pos + length]
                if b is None or cand > b:
                    b = cand
        assert b is not None, f"no piece at {word!r}[{pos}]"
        best[pos] = b
    pos, toks = 0, []
    while pos < n:
        for length in range(min(max_piece, n - pos), 0, -1):
            p = probs.get(word[pos:pos + length])
            if p is not None and p * best[pos + length] == best[pos]:
                toks.append(word[pos:pos + length])
                pos += length
                break
        else:  # pragma: no cover — singles always present
            raise AssertionError(f"walk stuck at {word!r}[{pos}]")
    return toks


def fuzzy_contamination(
    corp: DataFrame,
    bench: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """FUZZY benchmark decontamination — the near-duplicate tier above
    the exact n-gram overlap check (``contamination``): a corpus
    document is contaminated if its shingle-set Jaccard against ANY
    eval-set document reaches ``threshold``, catching paraphrased /
    lightly-edited leaks exact 5-gram hits miss (the FineWeb/Dolma
    decontamination recipe).

    Scale shape: the benchmark side is an eval set (MBs, not TBs) — its
    shingle rows and sizes BROADCAST, so the corpus side joins map-side
    and shuffles only once, on doc_id, to fold per-(doc, bench)
    intersections; pairs below threshold drop before the keep-best
    window.  Output: one row per contaminated corpus doc with its
    best-matching benchmark doc (ties to the lower bench id)."""
    from pyspark.sql.window import Window

    from . import dedup

    cs = corp.select(
        F.col(id_col).alias("doc_id"),
        F.explode(dedup.word_shingles(F.col(text_col), n)).alias("shingle"),
    )
    bs = bench.select(
        F.col(id_col).alias("bench_id"),
        F.explode(dedup.word_shingles(F.col(text_col), n)).alias("shingle"),
    )
    b_sz = bs.groupBy("bench_id").agg(F.count(F.lit(1)).alias("b_sz"))
    c_sz = cs.groupBy("doc_id").agg(F.count(F.lit(1)).alias("c_sz"))
    inter = (
        cs.join(F.broadcast(bs), "shingle")
        .groupBy("doc_id", "bench_id")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    scored = (
        inter.join(F.broadcast(b_sz), "bench_id")
        .join(c_sz, "doc_id")
        .withColumn(
            "jaccard",
            F.col("n_inter")
            / (F.col("c_sz") + F.col("b_sz") - F.col("n_inter")),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("jaccard").desc(), F.col("bench_id")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "doc_id", "bench_id",
            F.col("n_inter").cast("long").alias("n_inter"),
            F.round("jaccard", 9).alias("jaccard"),
        )
    )

"""N4/N6-tier tokenizer + chunking queries (SURVEY §2.11): real
distributed BPE train/encode, tokenizer-aware packing, WordPiece greedy
longest-match encode, the overlapping chunk manifest, and the RAG
indexing pipeline composite.  Split out of llm3.py (r8).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from ..registry import register
from ..tables import load_table


# --------------------------------------------------------------------------
# N4 — distributed BPE: merge-rule training + corpus encode
# --------------------------------------------------------------------------
_BPE_MERGES = 32
#: deterministic training-sample rate — the md5 hash-gate keeps ~40% of
#: documents at every SF (house sampling convention, operators/sampling):
#: scale-proportional, engine-reproducible, no magic id slice.
_BPE_SAMPLE_RATE = 0.4


def _bpe_stages_sql(n: int) -> str:
    """The shared unrolled-iteration CTE chain: words as
    ``|s||y||m||s|`` strings (every symbol pipe-wrapped, so the merge
    REPLACE is boundary-safe and left-to-right greedy like the fold),
    n stages of pair-count → argmax → merge-apply.  Every vocabulary
    stage is MATERIALIZED: w{i} and m{i} are each referenced twice, so
    without the hint DuckDB's inlining re-derives the whole prefix per
    reference — exponential in n (the n6_bpe_packing 53→13s lesson)."""
    from ..operators.sampling import threshold_hex

    thr = threshold_hex(_BPE_SAMPLE_RATE)
    parts = [rf"""
    tok0 AS MATERIALIZED (
      SELECT doc_id,
             UNNEST(list_filter(string_split_regex(LOWER(text), '\s+'),
                    t -> t <> '' AND NOT contains(t, '|'))) AS w
      FROM documents
      WHERE substr(md5('bpe:' || CAST(doc_id AS VARCHAR)), 1, 4) < '{thr}'
    ), w0 AS MATERIALIZED (
      SELECT w, regexp_replace(w, '(.)', '|\1|', 'g') AS s,
             COUNT(*) AS freq
      FROM tok0 GROUP BY 1, 2
    )"""]
    for i in range(n):
        parts.append(f"""
    , p{i} AS (
      SELECT l, freq, UNNEST(range(1, len(l))) AS i
      FROM (SELECT string_split(trim(s, '|'), '||') AS l, freq FROM w{i})
    ), c{i} AS (
      SELECT l[i] AS a, l[i+1] AS b, SUM(freq) AS cnt FROM p{i} GROUP BY 1, 2
    ), m{i} AS MATERIALIZED (
      SELECT a, b, CAST(cnt AS BIGINT) AS cnt FROM c{i}
      ORDER BY cnt DESC, a, b LIMIT 1
    ), w{i + 1} AS MATERIALIZED (
      SELECT w, replace(s, '|' || m.a || '||' || m.b || '|',
                        '|' || m.a || m.b || '|') AS s, freq
      FROM w{i} CROSS JOIN m{i} m
    )""")
    return "".join(parts)


def _bpe_train_oracle(n: int = _BPE_MERGES) -> str:
    union = "\n      UNION ALL ".join(
        f"SELECT CAST({i + 1} AS BIGINT) AS merge_no, a AS pair_a,"
        f" b AS pair_b, cnt AS pair_count FROM m{i}"
        for i in range(n)
    )
    return f"WITH {_bpe_stages_sql(n)}\n    {union}"


def _bpe_encode_oracle(n: int = _BPE_MERGES) -> str:
    return f"""WITH {_bpe_stages_sql(n)}
    SELECT t.doc_id,
           CAST(SUM(len(string_split(trim(f.s, '|'), '||'))) AS BIGINT)
             AS n_bpe_tokens
    FROM tok0 t JOIN w{n} f ON f.w = t.w
    GROUP BY t.doc_id
    """


def _bpe_train_spark(spark: SparkSession, sf_dir: str, n: int = _BPE_MERGES):
    """Run the distributed BPE trainer; returns (merges, words_df) where
    words_df is the final (w, s, freq) vocabulary table."""
    from ..operators import text_analysis as ta
    from ..operators.sampling import keep

    d = load_table(spark, sf_dir, "documents").filter(
        keep(F.col("doc_id"), "bpe", _BPE_SAMPLE_RATE)
    )
    tok = d.select(
        "doc_id", F.explode(ta.tokens(F.col("text"))).alias("w")
    ).filter(~F.col("w").contains("|"))
    words = (
        tok.groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
        .select(
            "w",
            F.regexp_replace("w", "(.)", r"|$1|").alias("s"),
            "freq",
        )
        .localCheckpoint()
    )
    merges: list[tuple[int, str, str, int]] = []
    for i in range(n):
        pairs = (
            words.select(
                F.split(F.expr("trim(BOTH '|' FROM s)"), r"\|\|").alias("l"),
                "freq",
            )
            .filter(F.size("l") >= 2)
            .select(
                F.explode(
                    F.expr(
                        "transform(sequence(0, size(l) - 2),"
                        " i -> struct(l[i] AS a, l[i + 1] AS b))"
                    )
                ).alias("p"),
                "freq",
            )
        )
        top = (
            pairs.groupBy("p.a", "p.b")
            .agg(F.sum("freq").alias("cnt"))
            .orderBy(F.col("cnt").desc(), "a", "b")
            .limit(1)
            .collect()
        )
        if not top:
            break
        a, b, cnt = top[0].a, top[0].b, int(top[0].cnt)
        merges.append((i + 1, a, b, cnt))
        words = words.select(
            "w",
            F.replace(
                F.col("s"), F.lit(f"|{a}||{b}|"), F.lit(f"|{a}{b}|")
            ).alias("s"),
            "freq",
        )
        # cap plan depth: 32 stacked REPLACE projections are cheap to
        # run but quadratic to re-analyze every iteration
        if (i + 1) % 8 == 0:
            words = words.localCheckpoint()
    return merges, words, tok


@register(
    "n4_bpe_train",
    oracle=_bpe_train_oracle(),
    survey="N4 X8",
)
def n4_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE merge-rule training [Sennrich et al. 2016] — the
    real tokenizer-training loop, not a regex approximation: the corpus
    is hash-sampled at a documented 40% (md5 gate — deterministic,
    engine-reproducible, scale-proportional; no magic id slice) and
    folds once into a word-frequency vocabulary (the only corpus-sized
    shuffle), then each of 32 iterations counts adjacent symbol pairs
    weighted by word frequency, collects the single argmax pair
    (count desc, pair lexicographic — the deterministic tie-break both
    engines encode), and applies the merge to the vocabulary.

    Words are ``|s||y||m|`` strings (every symbol pipe-wrapped), which
    makes the merge a plain REPLACE that is boundary-safe (a pattern
    can only match at symbol starts) and left-to-right greedy —
    exactly the BPE fold, runnable identically in Spark and DuckDB
    (whose oracle unrolls the 32 iterations as MATERIALIZED CTE stages).  At 100 TB
    the iterations run on the vocabulary table — orders of magnitude
    smaller than the corpus — so training cost is one corpus pass +
    n_merges vocab passes, the same structure as x8's bounded loops.
    Output: the learned merge table (merge_no, pair_a, pair_b,
    pair_count)."""
    merges, _, _ = _bpe_train_spark(spark, sf_dir)
    return spark.createDataFrame(
        merges, "merge_no long, pair_a string, pair_b string, pair_count long"
    )


@register(
    "n4_bpe_encode",
    oracle=_bpe_encode_oracle(),
    survey="N4",
)
def n4_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus encode with the trained BPE merges: every document's
    token count under the learned vocabulary — the number a sequence-
    packing / budget-planning stage consumes.  The encode is a JOIN
    against the final (word → merged symbols) vocabulary table, not a
    per-document re-derivation: at 100 TB the vocabulary broadcasts
    and the corpus is touched exactly once.  Oracle: the same 32
    unrolled merge stages, then per-doc symbol counts through the
    identical word join."""
    merges, words, tok = _bpe_train_spark(spark, sf_dir)
    n_syms = F.size(F.split(F.expr("trim(BOTH '|' FROM s)"), r"\|\|"))
    vocab = words.select("w", n_syms.alias("n_syms"))
    return (
        tok.join(F.broadcast(vocab), "w")
        .groupBy("doc_id")
        .agg(F.sum("n_syms").cast("long").alias("n_bpe_tokens"))
    )


# --------------------------------------------------------------------------
# N4 — overlapping chunk manifest (the RAG / context-window split)
# --------------------------------------------------------------------------
_CHUNK_W, _CHUNK_S = 64, 48


@register(
    "n4_chunk_manifest",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(LOWER(text), '\\s+'),
                         t -> t <> '') AS tk
      FROM documents
    ), counted AS (
      SELECT doc_id, tk, len(tk) AS n,
             CASE WHEN len(tk) <= {_CHUNK_W} THEN 1
                  ELSE CAST(CEIL((len(tk) - {_CHUNK_W}) / {_CHUNK_S}.0)
                       AS INT) + 1 END AS n_chunks
      FROM toks WHERE len(tk) > 0
    ), ex AS (
      SELECT doc_id, tk, n, UNNEST(range(0, n_chunks)) AS k FROM counted
    )
    SELECT doc_id, CAST(k AS BIGINT) AS chunk_no,
           CAST(LEAST({_CHUNK_W}, n - k * {_CHUNK_S}) AS BIGINT)
             AS n_chunk_tokens,
           md5(array_to_string(
                 list_slice(tk, k * {_CHUNK_S} + 1,
                            k * {_CHUNK_S} + {_CHUNK_W}), ' '))
             AS chunk_hash
    FROM ex
    """,
    survey="N4 R4",
)
def n4_chunk_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping chunk manifest — the document split every RAG index
    and context-window packer consumes: 64-token windows at stride 48
    (16-token overlap), each chunk addressed by (doc_id, chunk_no) with
    a content hash for downstream chunk-level dedup and incremental
    re-embedding (only chunks whose hash changed re-embed).

    Pure Catalyst: tokenize once, derive the chunk count per document
    with the same integer/ceil arithmetic on both engines, posexplode
    the chunk indices, slice the token array per chunk — map-only, no
    shuffle at all (the explode is within-partition), which is the
    100 TB shape: chunking is a projection of the corpus scan."""
    from ..operators import text_analysis as ta

    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", ta.tokens(F.col("text")).alias("tk")).filter(
        F.size("tk") > 0
    )
    n = F.size("tk")
    n_chunks = F.when(n <= _CHUNK_W, F.lit(1)).otherwise(
        F.ceil((n - _CHUNK_W) / F.lit(float(_CHUNK_S))).cast("int") + 1
    )
    ex = toks.select(
        "doc_id", "tk", n.alias("n"),
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("k"),
    )
    return ex.select(
        "doc_id",
        F.col("k").cast("long").alias("chunk_no"),
        F.least(F.lit(_CHUNK_W), F.col("n") - F.col("k") * _CHUNK_S)
        .cast("long")
        .alias("n_chunk_tokens"),
        F.md5(
            F.concat_ws(
                " ",
                F.slice(F.col("tk"), F.col("k") * _CHUNK_S + 1, _CHUNK_W),
            )
        ).alias("chunk_hash"),
    )


# --------------------------------------------------------------------------
# N6/N4 — tokenizer-aware packing: pack by REAL trained-BPE counts
# --------------------------------------------------------------------------
_BPE_PACK_BUDGET = 512


def _bpe_packing_oracle(n: int = _BPE_MERGES) -> str:
    return f"""WITH RECURSIVE {_bpe_stages_sql(n)},
    counts AS (
      SELECT t.doc_id,
             CAST(SUM(len(string_split(trim(f.s, '|'), '||'))) AS BIGINT)
               AS n_bpe_tokens
      FROM tok0 t JOIN w{n} f ON f.w = t.w
      GROUP BY t.doc_id
    ), base AS MATERIALIZED (
      SELECT d.doc_id, d.lang, c.n_bpe_tokens,
             ROW_NUMBER() OVER (PARTITION BY d.lang ORDER BY d.doc_id)
               AS idx
      FROM documents d JOIN counts c ON c.doc_id = d.doc_id
      WHERE d.doc_id < 200
    ), p AS (
      SELECT lang, idx, doc_id, n_bpe_tokens, n_bpe_tokens AS run,
             CAST(0 AS BIGINT) AS pack_id
      FROM base WHERE idx = 1
      UNION ALL
      SELECT b.lang, b.idx, b.doc_id, b.n_bpe_tokens,
             CASE WHEN p.run + b.n_bpe_tokens > {_BPE_PACK_BUDGET}
                  THEN b.n_bpe_tokens ELSE p.run + b.n_bpe_tokens END,
             CASE WHEN p.run + b.n_bpe_tokens > {_BPE_PACK_BUDGET}
                  THEN p.pack_id + 1 ELSE p.pack_id END
      FROM p JOIN base b ON b.lang = p.lang AND b.idx = p.idx + 1
    )
    SELECT lang, doc_id, n_bpe_tokens AS n_tokens, pack_id FROM p
    """


@register(
    "n6_bpe_packing",
    oracle=_bpe_packing_oracle(),
    survey="N6 N4",
)
def n6_bpe_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-AWARE sequence packing: documents pack into 512-token
    training sequences by their REAL trained-BPE token counts (the
    n4_bpe_train/encode vocabulary), not a whitespace/regex estimate —
    the number that actually bounds what fits in a context window.
    Composes two certified operators: the BPE encode join supplies
    per-doc counts, the greedy per-language fold packs them (one
    vocabulary broadcast + one corpus pass + one keyed Arrow fold);
    the oracle replays BPE's 32 unrolled merge stages AND the packing
    recursion in one statement."""
    from ..operators import corpus as corpus_ops

    merges, words, tok = _bpe_train_spark(spark, sf_dir)
    n_syms = F.size(F.split(F.expr("trim(BOTH '|' FROM s)"), r"\|\|"))
    vocab = words.select("w", n_syms.alias("n_syms"))
    counts = (
        tok.join(F.broadcast(vocab), "w")
        .groupBy("doc_id")
        .agg(F.sum("n_syms").cast("long").alias("n_bpe_tokens"))
    )
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    base = d.select("doc_id", "lang").join(counts, "doc_id")
    return corpus_ops.pack_sequences(
        base, group_col="lang", order_col="doc_id", text_col="lang",
        budget=_BPE_PACK_BUDGET, counts_col="n_bpe_tokens",
    )


@register(
    "pipeline_rag_index_end_to_end",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(LOWER(text), '\\s+'),
                         t -> t <> '') AS tk
      FROM documents
    ), counted AS (
      SELECT doc_id, tk, len(tk) AS n,
             CASE WHEN len(tk) <= {_CHUNK_W} THEN 1
                  ELSE CAST(CEIL((len(tk) - {_CHUNK_W}) / {_CHUNK_S}.0)
                       AS INT) + 1 END AS n_chunks
      FROM toks WHERE len(tk) > 0
    ), chunks AS (
      SELECT doc_id, CAST(k AS BIGINT) AS chunk_no,
             md5(array_to_string(
                   list_slice(tk, k * {_CHUNK_S} + 1,
                              k * {_CHUNK_S} + {_CHUNK_W}), ' '))
               AS chunk_hash
      FROM (SELECT doc_id, tk, n, UNNEST(range(0, n_chunks)) AS k
            FROM counted)
    ), ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY chunk_hash
                                   ORDER BY doc_id, chunk_no) AS rn
      FROM chunks
    )
    SELECT d.lang,
           CAST(COUNT(DISTINCT c.doc_id) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_chunks,
           CAST(SUM(CASE WHEN c.rn = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_unique_chunks,
           ROUND(1.0 - CAST(SUM(CASE WHEN c.rn = 1 THEN 1 ELSE 0 END)
                            AS DOUBLE) / COUNT(*), 9) AS dup_ratio
    FROM ranked c JOIN documents d ON d.doc_id = c.doc_id
    GROUP BY d.lang
    """,
    survey="N7 N4 N1",
)
def pipeline_rag_index_end_to_end(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fourth end-to-end pipeline composite — the RAG INDEXING pass:
    (1) overlapping chunk manifest (the certified n4_chunk_manifest
    split), (2) corpus-level chunk dedup by content hash (keep the
    first (doc_id, chunk_no) per hash — what keeps an index from
    embedding the same boilerplate chunk a million times), (3) the
    per-language index report (docs, chunks, unique chunks, duplicate
    ratio) an indexing job emits before the embed stage.  Stage 1 is
    map-only; stage 2 is ONE shuffle keyed on the chunk hash; stage 3
    aggregates the survivors — the whole pipeline touches the corpus
    text exactly once."""
    chunks = n4_chunk_manifest(spark, sf_dir)
    from pyspark.sql import Window

    w = Window.partitionBy("chunk_hash").orderBy("doc_id", "chunk_no")
    ranked = chunks.withColumn("rn", F.row_number().over(w))
    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    return (
        ranked.join(d, "doc_id")
        .groupBy("lang")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum((F.col("rn") == 1).cast("long")).alias("n_unique_chunks"),
            F.round(
                1.0
                - F.sum((F.col("rn") == 1).cast("long"))
                / F.count(F.lit(1)).cast("double"),
                9,
            ).alias("dup_ratio"),
        )
    )


# --------------------------------------------------------------------------
# N4 — WordPiece greedy longest-match-first encode (BERT tokenizer family)
# --------------------------------------------------------------------------
@register(
    "n4_wordpiece_encode",
    oracle=r"""
    WITH RECURSIVE tok AS (
      SELECT UNNEST(list_filter(string_split_regex(LOWER(text), '\s+'),
                    t -> t <> '')) AS w
      FROM documents WHERE doc_id < 200
    ), words AS MATERIALIZED (
      SELECT w, COUNT(*) AS freq, LEN(w) AS wl FROM tok GROUP BY 1
    ), startc AS (
      SELECT piece, SUM(freq) AS cnt FROM (
        SELECT substr(w, 1, L) AS piece, freq
        FROM words, (SELECT UNNEST(range(1, 5)) AS L)
        WHERE wl >= L
      ) GROUP BY 1
    ), starts AS (
      SELECT piece FROM startc ORDER BY cnt DESC, piece LIMIT 200
    ), wpos AS (
      SELECT w, freq, wl, UNNEST(range(1, wl)) AS p FROM words
    ), contc AS (
      SELECT piece, SUM(freq) AS cnt FROM (
        SELECT substr(w, p + 1, L) AS piece, freq
        FROM wpos, (SELECT UNNEST(range(1, 5)) AS L)
        WHERE p + L <= wl
      ) GROUP BY 1
    ), conts AS (
      SELECT piece FROM contc ORDER BY cnt DESC, piece LIMIT 200
    ), vocab AS MATERIALIZED (
      SELECT piece, true AS is_start FROM starts
      UNION ALL SELECT piece, false FROM conts
    ), seg AS (
      SELECT w, freq, wl, 0 AS pos,
             CAST([] AS VARCHAR[]) AS toks, false AS failed
      FROM words
      UNION ALL
      SELECT w, freq, wl,
             CASE WHEN best IS NULL THEN wl ELSE pos + LEN(best) END,
             CASE WHEN best IS NULL THEN ['[UNK]']
                  ELSE toks || [CASE WHEN pos = 0 THEN best
                                ELSE '##' || best END] END,
             best IS NULL
      FROM (
        SELECT s.w, s.freq, s.wl, s.pos, s.toks,
               COALESCE(v4.piece, v3.piece, v2.piece, v1.piece) AS best
        FROM seg s
        LEFT JOIN vocab v4 ON s.pos + 4 <= s.wl
          AND v4.piece = substr(s.w, s.pos + 1, 4)
          AND v4.is_start = (s.pos = 0)
        LEFT JOIN vocab v3 ON s.pos + 3 <= s.wl
          AND v3.piece = substr(s.w, s.pos + 1, 3)
          AND v3.is_start = (s.pos = 0)
        LEFT JOIN vocab v2 ON s.pos + 2 <= s.wl
          AND v2.piece = substr(s.w, s.pos + 1, 2)
          AND v2.is_start = (s.pos = 0)
        LEFT JOIN vocab v1 ON s.pos + 1 <= s.wl
          AND v1.piece = substr(s.w, s.pos + 1, 1)
          AND v1.is_start = (s.pos = 0)
        WHERE s.pos < s.wl AND NOT s.failed
      )
    )
    SELECT token, CAST(SUM(freq) AS BIGINT) AS cnt FROM (
      SELECT UNNEST(toks) AS token, freq FROM seg WHERE pos >= wl
    ) GROUP BY token
    """,
    survey="N4",
)
def n4_wordpiece_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WordPiece greedy longest-match-first encode (the BERT tokenizer;
    Wu et al. 2016 §4.1) — the third member of the tokenizer family
    next to the trained BPE pair: a data-derived vocabulary (top-200
    word-initial pieces + top-200 '##' continuation pieces of length
    ≤ 4, frequency-ranked with lexicographic tie-break) segments every
    corpus word by repeatedly taking the LONGEST matching piece; a word
    with no match at any position collapses to [UNK] whole — the real
    WordPiece failure mode, exercised by rare characters falling
    outside the top-K vocabulary.

    Scale shape mirrors n4_bpe_encode: ONE corpus pass builds the
    word-frequency table, piece counting is vocabulary-sized, the
    ≤ 401-entry vocab is bounded metadata (collected + closure-
    broadcast), and the encode itself is map-only over distinct words.
    DuckDB replays the segmentation as a recursive CTE whose step
    LEFT-JOINs the vocab at lengths 4..1 and COALESCEs — the same
    longest-match the Python loop takes, so the token histogram
    hash-matches exactly."""
    import pandas as pd

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    tok = (
        d.select(F.explode(F.split(F.lower("text"), r"\s+")).alias("w"))
        .filter(F.col("w") != "")
    )
    words = tok.groupBy("w").agg(F.count(F.lit(1)).alias("freq"))
    words = words.withColumn("wl", F.length("w"))

    lens = F.array(*[F.lit(i) for i in (1, 2, 3, 4)])
    starts = (
        words.select(F.explode(lens).alias("L"), "w", "freq", "wl")
        .filter(F.col("wl") >= F.col("L"))
        .select(F.expr("substring(w, 1, L)").alias("piece"), "freq")
        .groupBy("piece")
        .agg(F.sum("freq").alias("cnt"))
        .orderBy(F.col("cnt").desc(), "piece")
        .limit(200)
    )
    conts = (
        # wl >= 2 guard: Spark's sequence(1, 0) is DESCENDING [1, 0], so
        # single-char words would sneak a p=0 row past the p+L filter
        # and count their first char as a continuation piece — a vocab
        # the DuckDB range(1, wl) replay (empty for wl=1) never builds
        words.filter(F.col("wl") >= 2)
        .select(
            "w", "freq", "wl",
            F.explode(F.expr("sequence(1, wl - 1)")).alias("p"),
        )
        .select("w", "freq", "wl", "p", F.explode(lens).alias("L"))
        .filter(F.col("p") + F.col("L") <= F.col("wl"))
        .select(F.expr("substring(w, p + 1, L)").alias("piece"), "freq")
        .groupBy("piece")
        .agg(F.sum("freq").alias("cnt"))
        .orderBy(F.col("cnt").desc(), "piece")
        .limit(200)
    )
    # vocabulary-sized metadata: <= 401 entries, the one legitimate
    # collect (same contract as the BPE merge-rule broadcast)
    svoc = {r.piece for r in starts.collect()}
    cvoc = {r.piece for r in conts.collect()}

    def segment(batches):
        from ..operators.corpus import wordpiece_segment

        for pdf in batches:
            out = []
            for rec in pdf.itertuples(index=False):
                toks = wordpiece_segment(str(rec.w), svoc, cvoc)
                out.extend((t, int(rec.freq)) for t in toks)
            yield pd.DataFrame(out, columns=["token", "freq"])

    pieces = words.select("w", "freq").mapInPandas(
        segment, "token string, freq long"
    )
    return pieces.groupBy("token").agg(F.sum("freq").alias("cnt"))


@register(
    "n4_unigram_encode",
    oracle=r"""
    WITH RECURSIVE tok AS (
      SELECT UNNEST(list_filter(string_split_regex(LOWER(text), '\s+'),
                    t -> t <> '')) AS w
      FROM documents WHERE doc_id < 200
    ), words AS MATERIALIZED (
      SELECT w, COUNT(*) AS freq, LEN(w) AS wl FROM tok GROUP BY 1
    ), allp AS (
      SELECT substr(w, p + 1, L) AS piece, freq
      FROM (SELECT w, freq, wl, UNNEST(range(0, wl)) AS p FROM words),
           (SELECT UNNEST(range(1, 5)) AS L)
      WHERE p + L <= wl
    ), pc AS MATERIALIZED (
      SELECT piece, SUM(freq) AS cnt, LEN(piece) AS pl FROM allp GROUP BY 1
    ), vocab AS MATERIALIZED (
      SELECT piece, CAST(LEN(bin(cnt)) * 64 - 1 AS BIGINT) AS wt
      FROM pc WHERE pl = 1
      UNION ALL
      SELECT piece, CAST(LEN(bin(cnt)) * 64 - 1 AS BIGINT) AS wt FROM (
        SELECT piece, cnt FROM pc WHERE pl >= 2
        ORDER BY cnt DESC, piece LIMIT 300
      )
    ), dp AS (
      -- backward Viterbi: bl[i] carries best[pos + i - 1]
      SELECT w, wl, pos, CAST([0, 0, 0, 0] AS BIGINT[]) AS bl,
             CAST(0 AS BIGINT) AS best
      FROM (SELECT w, wl, wl AS pos FROM words)
      UNION ALL
      SELECT w, wl, pos - 1, [nb, bl[1], bl[2], bl[3]], nb
      FROM (
        SELECT d.w, d.wl, d.pos, d.bl,
               GREATEST(v1.wt + d.bl[1], v2.wt + d.bl[2],
                        v3.wt + d.bl[3], v4.wt + d.bl[4]) AS nb
        FROM dp d
        LEFT JOIN vocab v1 ON v1.piece = substr(d.w, d.pos, 1)
        LEFT JOIN vocab v2 ON d.pos + 1 <= d.wl
          AND v2.piece = substr(d.w, d.pos, 2)
        LEFT JOIN vocab v3 ON d.pos + 2 <= d.wl
          AND v3.piece = substr(d.w, d.pos, 3)
        LEFT JOIN vocab v4 ON d.pos + 3 <= d.wl
          AND v4.piece = substr(d.w, d.pos, 4)
        WHERE d.pos >= 1
      )
    ), dpa AS MATERIALIZED (
      SELECT w, pos, best FROM dp
    ), walk AS (
      -- forward: the LONGEST piece achieving best[pos] at each cursor
      SELECT w, freq, wl, 0 AS pos, CAST([] AS VARCHAR[]) AS toks
      FROM words
      UNION ALL
      SELECT w, freq, wl, pos + bestL,
             toks || [substr(w, pos + 1, bestL)]
      FROM (
        SELECT s.w, s.freq, s.wl, s.pos, s.toks,
               CASE WHEN v4.wt IS NOT NULL AND v4.wt + b4.best = b0.best
                      THEN 4
                    WHEN v3.wt IS NOT NULL AND v3.wt + b3.best = b0.best
                      THEN 3
                    WHEN v2.wt IS NOT NULL AND v2.wt + b2.best = b0.best
                      THEN 2
                    ELSE 1 END AS bestL
        FROM walk s
        JOIN dpa b0 ON b0.w = s.w AND b0.pos = s.pos
        LEFT JOIN vocab v4 ON s.pos + 4 <= s.wl
          AND v4.piece = substr(s.w, s.pos + 1, 4)
        LEFT JOIN dpa b4 ON b4.w = s.w AND b4.pos = s.pos + 4
        LEFT JOIN vocab v3 ON s.pos + 3 <= s.wl
          AND v3.piece = substr(s.w, s.pos + 1, 3)
        LEFT JOIN dpa b3 ON b3.w = s.w AND b3.pos = s.pos + 3
        LEFT JOIN vocab v2 ON s.pos + 2 <= s.wl
          AND v2.piece = substr(s.w, s.pos + 1, 2)
        LEFT JOIN dpa b2 ON b2.w = s.w AND b2.pos = s.pos + 2
        WHERE s.pos < s.wl
      )
    )
    SELECT token, CAST(SUM(freq) AS BIGINT) AS cnt FROM (
      SELECT UNNEST(toks) AS token, freq FROM walk WHERE pos >= wl
    ) GROUP BY 1
    """,
    survey="N4",
)
def n4_unigram_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM Viterbi encode (Kudo 2018 — the SentencePiece
    segmenter), completing the tokenizer family: BPE (merge-rule fold),
    WordPiece (greedy longest-match), and now the probabilistic one —
    segmentation maximizing the summed piece scores over ALL possible
    splits, not the first greedy one.

    Piece scores are an exact-integer log-prob proxy —
    ``bit_length(count) * 64 - 1`` (floor-log2 via ``bin()`` string
    length, identical in both engines; the ``- 1`` makes fewer pieces
    win exact ties since piece lengths sum to the word length) — so the
    Viterbi argmax is bit-deterministic where float log-probs could
    diverge.  Vocabulary: every corpus character (guarantees coverage)
    plus the top-300 substrings of length 2-4 by occurrence-weighted
    frequency.  Scale shape mirrors the other encoders: ONE corpus pass
    to word frequencies, piece counting explodes only the distinct-word
    table, the ≤ 300+|charset| vocab is bounded metadata (collected +
    closure-broadcast), and the encode is map-only over distinct words.
    The DuckDB oracle replays the DP with a backward recursive CTE
    (carrying a 4-slot best[] window) and a forward walk taking the
    longest optimum-achieving piece — exactly the Python tie-break."""
    import pandas as pd

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    tok = (
        d.select(F.explode(F.split(F.lower("text"), r"\s+")).alias("w"))
        .filter(F.col("w") != "")
    )
    words = (
        tok.groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
        .withColumn("wl", F.length("w"))
    )
    lens = F.array(*[F.lit(i) for i in (1, 2, 3, 4)])
    pieces = (
        words.select(
            "w", "freq", "wl",
            F.explode(F.expr("sequence(0, wl - 1)")).alias("p"),
        )
        .select("w", "freq", "wl", "p", F.explode(lens).alias("L"))
        .filter(F.col("p") + F.col("L") <= F.col("wl"))
        .select(F.expr("substring(w, p + 1, L)").alias("piece"), "freq")
        .groupBy("piece")
        .agg(F.sum("freq").alias("cnt"))
        .withColumn("pl", F.length("piece"))
        .withColumn(
            "wt", F.length(F.expr("bin(cnt)")).cast("long") * 64 - 1
        )
    )
    singles = pieces.filter(F.col("pl") == 1).select("piece", "wt")
    multi = (
        pieces.filter(F.col("pl") >= 2)
        .orderBy(F.col("cnt").desc(), "piece")
        .limit(300)
        .select("piece", "wt")
    )
    # vocabulary-sized metadata: <= 300 + |charset| entries, the one
    # legitimate collect (same contract as the BPE merge-rule broadcast)
    weights = {
        r.piece: int(r.wt) for r in singles.unionByName(multi).collect()
    }

    def segment(batches):
        from ..operators.corpus import unigram_viterbi_segment

        for pdf in batches:
            out = []
            for rec in pdf.itertuples(index=False):
                toks = unigram_viterbi_segment(str(rec.w), weights)
                out.extend((t, int(rec.freq)) for t in toks)
            yield pd.DataFrame(out, columns=["token", "freq"])

    emitted = words.select("w", "freq").mapInPandas(
        segment, "token string, freq long"
    )
    return emitted.groupBy("token").agg(F.sum("freq").alias("cnt"))

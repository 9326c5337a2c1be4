"""N4 — WordPiece TRAINER (likelihood-scored pair merging) + encode
over the trained vocabulary.

Completes the in-engine tokenizer-training family (BPE, byte-level
BPE, Unigram-EM — and now WordPiece): the trainer published with BERT
[Schuster & Nakajima 2012; Wu et al. 2016 §4.1, as implemented by the
HuggingFace ``WordPieceTrainer``] differs from BPE in ONE load-bearing
way — the merged pair is not the most FREQUENT pair but the pair
maximizing the likelihood gain ``count(ab) / (count(a) * count(b))``.

Exactness contract: the score is evaluated in FIXED-POINT INTEGER form
``(count(ab) * 10^12) div (count(a) * count(b))`` — floor division on
int64 in both engines, so the argmax (score desc, then pair
lexicographic) is bit-deterministic and the DuckDB oracle replays all
merge rounds as unrolled MATERIALIZED CTE stages.  int64 headroom:
``cnt * 10^12`` caps the usable pair count at ~9.2e6 — far above any
per-word-type count at fixture scale; the declared 100 TB widening is
the same expression over DECIMAL(38,0) / HUGEINT (DuckDB's ``//``
already is HUGEINT-ready; the cast is config-level, kept int64 here so
the certified plan stays in whole-stage codegen).

Continuation marking is structural, not cosmetic: word-initial symbols
are bare, every later symbol carries a ``#`` prefix (rendered ``##`` in
BERT's vocab files), so "he" at word start and "##he" inside a word
are DIFFERENT units with different counts — the real WordPiece state
space.  Merging ``(a, b)`` yields ``a + b[1:]`` (b is never
word-initial, so it always carries the marker).

Scale shape (same as n4_bpe_train): ONE corpus pass folds the sampled
corpus into a word-frequency table; every merge round runs on that
vocabulary table — pair counts and unit counts are two aggregates over
the exploded symbol lattice, the argmax collect is ONE row — so
training cost is one corpus scan + n_merges vocabulary passes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load_table

_WP_MERGES = 24
_WP_SAMPLE_RATE = 0.4  # house md5 hash-gate sampling convention
_WP_SCALE = 1_000_000_000_000  # 10^12 fixed-point score quantum


def _wp_stages_sql(n: int) -> str:
    from ..operators.sampling import threshold_hex

    thr = threshold_hex(_WP_SAMPLE_RATE)
    parts = [rf"""
    tok0 AS MATERIALIZED (
      SELECT doc_id,
             UNNEST(list_filter(string_split_regex(LOWER(text), '\s+'),
                    t -> t <> '' AND NOT contains(t, '|')
                         AND NOT contains(t, '#'))) AS w
      FROM documents
      WHERE substr(md5('wp:' || CAST(doc_id AS VARCHAR)), 1, 4) < '{thr}'
    ), w0 AS MATERIALIZED (
      SELECT w,
             '|' || substr(regexp_replace(w, '(.)', '|#\1|', 'g'), 3) AS s,
             COUNT(*) AS freq
      FROM tok0 GROUP BY 1, 2
    )"""]
    for i in range(n):
        parts.append(f"""
    , g{i} AS MATERIALIZED (
      SELECT string_split(trim(s, '|'), '||') AS l, freq FROM w{i}
    ), c{i} AS (
      SELECT l[i] AS a, l[i+1] AS b, CAST(SUM(freq) AS BIGINT) AS cnt
      FROM (SELECT l, freq, UNNEST(range(1, len(l))) AS i FROM g{i})
      GROUP BY 1, 2
    ), u{i} AS MATERIALIZED (
      SELECT sym, CAST(SUM(freq) AS BIGINT) AS ucnt FROM (
        SELECT l[i] AS sym, freq
        FROM (SELECT l, freq, UNNEST(range(1, len(l) + 1)) AS i FROM g{i})
      ) GROUP BY 1
    ), m{i} AS MATERIALIZED (
      SELECT c.a, c.b, c.cnt,
             CAST((c.cnt * {_WP_SCALE}) // (ua.ucnt * ub.ucnt) AS BIGINT)
               AS score_fp
      FROM c{i} c
      JOIN u{i} ua ON ua.sym = c.a
      JOIN u{i} ub ON ub.sym = c.b
      ORDER BY score_fp DESC, c.a, c.b LIMIT 1
    ), w{i + 1} AS MATERIALIZED (
      SELECT w, replace(s, '|' || m.a || '||' || m.b || '|',
                        '|' || m.a || substr(m.b, 2) || '|') AS s, freq
      FROM w{i} CROSS JOIN m{i} m
    )""")
    return "".join(parts)


def _wp_train_oracle(n: int = _WP_MERGES) -> str:
    union = "\n      UNION ALL ".join(
        f"SELECT CAST({i + 1} AS BIGINT) AS merge_no, a AS pair_a,"
        f" b AS pair_b, cnt AS pair_count, score_fp FROM m{i}"
        for i in range(n)
    )
    return f"WITH {_wp_stages_sql(n)}\n    {union}"


def _wp_encode_oracle(n: int = _WP_MERGES) -> str:
    return f"""WITH {_wp_stages_sql(n)}
    SELECT t.doc_id,
           CAST(SUM(len(string_split(trim(f.s, '|'), '||'))) AS BIGINT)
             AS n_wp_tokens
    FROM tok0 t JOIN w{n} f ON f.w = t.w
    GROUP BY t.doc_id
    """


def _wp_train_spark(spark: SparkSession, sf_dir: str, n: int = _WP_MERGES):
    """Run the distributed WordPiece trainer; returns (merges, words_df,
    tok_df) where words_df is the final (w, s, freq) vocabulary."""
    from ..operators import text_analysis as ta
    from ..operators.sampling import keep

    d = load_table(spark, sf_dir, "documents").filter(
        keep(F.col("doc_id"), "wp", _WP_SAMPLE_RATE)
    )
    tok = (
        d.select("doc_id", F.explode(ta.tokens(F.col("text"))).alias("w"))
        .filter(~F.col("w").contains("|") & ~F.col("w").contains("#"))
    )
    words = (
        tok.groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
        .select(
            "w",
            F.expr(
                r"concat('|', substring(regexp_replace(w, '(.)', '|#$1|'),"
                " 3))"
            ).alias("s"),
            "freq",
        )
        .localCheckpoint()
    )
    merges: list[tuple[int, str, str, int, int]] = []
    for i in range(n):
        g = words.select(
            F.split(F.expr("trim(BOTH '|' FROM s)"), r"\|\|").alias("l"),
            "freq",
        )
        pairs = (
            g.filter(F.size("l") >= 2)
            .select(
                F.explode(
                    F.expr(
                        "transform(sequence(0, size(l) - 2),"
                        " i -> struct(l[i] AS a, l[i + 1] AS b))"
                    )
                ).alias("p"),
                "freq",
            )
            .groupBy("p.a", "p.b")
            .agg(F.sum("freq").cast("long").alias("cnt"))
        )
        units = (
            g.select(F.explode("l").alias("sym"), "freq")
            .groupBy("sym")
            .agg(F.sum("freq").cast("long").alias("ucnt"))
        )
        ua = units.select(F.col("sym").alias("a"), F.col("ucnt").alias("ua"))
        ub = units.select(F.col("sym").alias("b"), F.col("ucnt").alias("ub"))
        top = (
            pairs.join(F.broadcast(ua), "a")
            .join(F.broadcast(ub), "b")
            .select(
                "a", "b", "cnt",
                F.expr(f"CAST((cnt * {_WP_SCALE}L) DIV (ua * ub) AS BIGINT)")
                .alias("score_fp"),
            )
            .orderBy(F.col("score_fp").desc(), "a", "b")
            .limit(1)
            .collect()
        )
        if not top:
            break
        a, b = top[0].a, top[0].b
        merges.append((i + 1, a, b, int(top[0].cnt), int(top[0].score_fp)))
        new_sym = a + b[1:]  # b always carries the '#' continuation marker
        words = words.select(
            "w",
            F.replace(
                F.col("s"), F.lit(f"|{a}||{b}|"), F.lit(f"|{new_sym}|")
            ).alias("s"),
            "freq",
        )
        if (i + 1) % 8 == 0:
            words = words.localCheckpoint()
    return merges, words, tok


@register("n4_wordpiece_train", oracle=_wp_train_oracle(), survey="N4 X8")
def n4_wordpiece_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The WordPiece merge-rule trainer (see module docstring): 24
    likelihood-scored merges over the md5-sampled corpus.  Output:
    (merge_no, pair_a, pair_b, pair_count, score_fp) — the learned
    merge table with its exact fixed-point scores."""
    merges, _, _ = _wp_train_spark(spark, sf_dir)
    return spark.createDataFrame(
        merges,
        "merge_no long, pair_a string, pair_b string,"
        " pair_count long, score_fp long",
    )


@register(
    "n4_wordpiece_train_encode", oracle=_wp_encode_oracle(), survey="N4"
)
def n4_wordpiece_train_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus encode under the TRAINED WordPiece vocabulary: per-doc
    token counts through a broadcast join against the final
    (word -> merged lattice) table — the corpus is touched once, the
    vocabulary is bounded metadata.  (The greedy longest-match encode
    over a frequency-derived vocab is the separately-certified
    n4_wordpiece_encode; this one consumes the trainer's output, the
    same split as n4_bpe_train/encode vs n4_unigram_train_encode.)"""
    _, words, tok = _wp_train_spark(spark, sf_dir)
    n_syms = F.size(F.split(F.expr("trim(BOTH '|' FROM s)"), r"\|\|"))
    vocab = words.select("w", n_syms.alias("n_syms"))
    return (
        tok.join(F.broadcast(vocab), "w")
        .groupBy("doc_id")
        .agg(F.sum("n_syms").cast("long").alias("n_wp_tokens"))
    )

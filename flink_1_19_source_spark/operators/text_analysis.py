"""Text-analysis operators for training-data pipelines (SURVEY §2.11 N4).

Everything here is pure Catalyst expression work — JVM-side, inside
whole-stage codegen, no Python in the hot path — so a 100 TB corpus pays
one narrow scan per metric, no shuffle.

- quality_stats:   length / punctuation / stopword / uppercase ratios.
- token_count:     whitespace tokens + a BPE-ish regex token estimate.
- lang_id:         deterministic stopword-overlap heuristic (argmax over
                   per-language marker lists, ties broken by language code).
- fingerprint:     md5 digest of whitespace-normalized lowercase text —
                   a deterministic document fingerprint for exact-dup
                   detection across formatting variants.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# BPE-ish token pattern: word pieces, digit runs, single non-space symbols.
TOKEN_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

# tiny deterministic marker lists (heuristic, not linguistics)
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "und", "das", "ist", "nicht"),
    "en": ("the", "and", "of", "to", "is", "it"),
    "es": ("el", "los", "y", "es", "una", "para"),
    "fr": ("le", "les", "et", "est", "une", "pour"),
    "zh": ("de5", "shi4", "le5", "zai4", "he2", "you3"),  # pinyin-ish placeholder
}


def tokens(text: Column) -> Column:
    """Lowercase whitespace tokens, empties dropped."""
    return F.filter(F.split(F.lower(text), "\\s+"), lambda t: t != "")


def normalize(text: Column) -> Column:
    """Whitespace-collapsed, trimmed, lowercased canonical form."""
    return F.trim(F.regexp_replace(F.lower(text), "\\s+", " "))


def fingerprint(text: Column) -> Column:
    """Deterministic document fingerprint: md5 of the normalized text."""
    return F.md5(normalize(text))


def quality_stats(text: Column) -> dict[str, Column]:
    """Quality-scoring signals as named columns (ratios are double,
    rounded to 9 so they hash-compare across engines)."""
    toks = tokens(text)
    n_chars = F.length(text)
    n_tokens = F.size(toks)
    n_punct = n_chars - F.length(F.regexp_replace(text, "[^\\w\\s]", ""))
    n_upper = n_chars - F.length(F.regexp_replace(text, "[A-Z]", ""))
    n_spaces = n_chars - F.length(F.regexp_replace(text, " ", ""))
    avg_tok = F.when(
        n_tokens > 0, (n_chars - n_spaces).cast("double") / n_tokens
    ).otherwise(F.lit(0.0))
    return {
        "n_chars": n_chars.cast("long"),
        "n_tokens": n_tokens.cast("long"),
        "punct_ratio": F.round(n_punct.cast("double") / n_chars, 9),
        "upper_ratio": F.round(n_upper.cast("double") / n_chars, 9),
        "avg_token_len": F.round(avg_tok, 9),
    }


def bpe_ish_token_count(text: Column) -> Column:
    """Regex token count approximating a BPE tokenizer's token budget."""
    return F.size(F.regexp_extract_all(text, F.lit(TOKEN_RE), 0)).cast("long")


def stopword_ratio(text: Column, lang: str = "en") -> Column:
    toks = tokens(text)
    markers = F.array(*[F.lit(m) for m in LANG_MARKERS[lang]])
    hits = F.size(F.filter(toks, lambda t: F.array_contains(markers, t)))
    return F.round(
        F.when(F.size(toks) > 0, hits.cast("double") / F.size(toks)).otherwise(
            F.lit(0.0)
        ),
        9,
    )


def lang_scores(text: Column) -> dict[str, Column]:
    """Marker-hit count per language (the raw heuristic signal)."""
    toks = tokens(text)

    def contains(arr: Column):
        # factory, NOT a default-arg lambda: a 2-param lambda would be
        # interpreted by F.filter as (value, index)
        return lambda t: F.array_contains(arr, t)

    out = {}
    for code, markers in LANG_MARKERS.items():
        arr = F.array(*[F.lit(m) for m in markers])
        out[code] = F.size(F.filter(toks, contains(arr)))
    return out


def lang_id(text: Column) -> Column:
    """argmax language by marker hits; ties (incl. all-zero) go to the
    lexicographically first language code — fully deterministic."""
    scores = lang_scores(text)
    pairs = F.array(
        *[
            F.struct(scores[code].alias("hits"), F.lit(code).alias("code"))
            for code in sorted(LANG_MARKERS)
        ]
    )
    max_hits = F.array_max(F.transform(pairs, lambda p: p["hits"]))
    argmax = F.filter(pairs, lambda p: p["hits"] == max_hits)
    return F.array_min(F.transform(argmax, lambda p: p["code"]))


def winnow_fingerprints(
    df, id_col: str, text_col: str, k: int = 8, w: int = 16
):
    """Winnowing document fingerprints (Schleimer et al., SIGMOD'03 — the
    MOSS local fingerprinting algorithm): hash every k-char-gram, then keep
    the minimum hash of each sliding window of w consecutive k-grams; the
    distinct window-minima are the document's fingerprints. Guarantees any
    shared substring of length ≥ w+k-1 yields a shared fingerprint —
    position-robust near-dup/overlap detection that MinHash (whole-doc
    similarity) cannot give.

    Engine-portable hash: first 8 hex chars of md5, so the DuckDB oracle
    can reproduce values bit-for-bit (`CAST(concat('0x', substr(md5(g),
    1, 8)) AS BIGINT)`). All per-char work is Catalyst — no Python in
    the path; cost is O(len · w) comparisons per doc, the algorithm's
    inherent footprint.

    r13 shape — ZERO shuffle: the former explode → Exchange(id) → Sort
    → sliding window-min moved every gram hash of the corpus through a
    shuffle that existed only to re-group rows ALREADY co-located and
    ordered (each doc's positions come from one parent row's explode).
    Now the per-position hashes build as an array IN the document row
    and the window minima are array ops over it (`array_min(slice(...))`
    — the same O(w)-per-position re-scan Spark's sliding MIN frame
    evaluates), exploded only at the end.  Values are bit-identical
    (pinned: tests/test_r13_ops.py); at corpus scale the removed
    exchange carried one row per gram position.

    Returns (id, pos, fp) — one row per FULL window position; aggregate
    distinct fps per doc downstream.
    """
    t = F.lower(F.col(text_col))
    n_grams = F.greatest(F.length(t) - F.lit(k - 1), F.lit(1))
    hs = F.transform(
        F.sequence(F.lit(1), n_grams),
        lambda p: F.conv(
            F.substring(F.md5(t.substr(p, F.lit(k))), 1, 8), 16, 10
        ).cast("long"),
    )
    base = df.select(
        F.col(id_col).alias("id"), hs.alias("hs"), n_grams.alias("n")
    )
    wins = F.transform(
        F.sequence(F.lit(1), F.col("n") - F.lit(w - 1)),
        lambda p: F.struct(
            p.alias("pos"),
            F.array_min(F.slice("hs", p, w)).alias("fp"),
        ),
    )
    return (
        base.filter(F.col("n") >= F.lit(w))
        .select("id", F.explode(wins).alias("pf"))
        .select("id", F.col("pf.pos").alias("pos"), F.col("pf.fp").alias("fp"))
    )

"""SQL:2016 ``SIMILAR TO`` pattern → regex translation (SURVEY §2.8
comparison row; the "regex dialect differs — verify per-fn" gap).

Flink's ``SIMILAR TO`` follows the SQL standard: ``%``/``_`` are the LIKE
wildcards, ``| * + ? ( ) { }`` and ``[...]`` classes carry their regex
meaning, and every other character — including ``.``, ``^``, ``$`` — is a
LITERAL. Neither Spark's ``rlike`` (Java regex, substring match) nor
DuckDB's ``SIMILAR TO`` (RE2, full match) speaks that dialect directly, so
the translation below is the single source of truth for both sides of the
oracle: Spark runs ``rlike('^(?:rx)$')``, the oracle runs
``regexp_full_match(col, 'rx')`` with the SAME generated ``rx``.
"""

from __future__ import annotations

import re

from pyspark.sql import Column

#: regex metacharacters that keep their meaning inside SIMILAR TO
_PASS = set("|*+?(){}")


def similar_to_regex(pattern: str) -> str:
    """Translate a SIMILAR TO pattern to an (unanchored) regex usable by
    both Java regex and RE2. Raises on an unterminated ``[`` class."""
    out: list[str] = []
    i = 0
    while i < len(pattern):
        c = pattern[i]
        if c == "%":
            out.append(".*")
        elif c == "_":
            out.append(".")
        elif c == "[":
            j = pattern.index("]", i + 1)  # ValueError on malformed class
            out.append(pattern[i : j + 1])
            i = j
        elif c in _PASS:
            out.append(c)
        else:
            out.append(re.escape(c))
        i += 1
    return "".join(out)


def similar_to(col: Column, pattern: str) -> Column:
    """``col SIMILAR TO pattern`` as a Column predicate: SQL full-string
    anchoring over the translated regex."""
    return col.rlike(f"^(?:{similar_to_regex(pattern)})$")

"""Shared text preparation: tokenization and shingling, with exact
DuckDB-SQL twins (same normalization, same shingle construction) so
downstream dedup operators are oracle-checkable.

Scale: tokenize/shingle are per-row array expressions — no shuffle,
fully codegen'd, linear in input bytes.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

SHINGLE_WORDS = 3  # word n-gram width for MinHash / Jaccard shingles


def words(text: Column | str) -> Column:
    """Lowercased whitespace tokens."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(F.lower(F.trim(c)), r"\s+")


def sql_words(expr: str) -> str:
    return f"string_split_regex(lower(trim({expr})), '\\s+')"


def word_shingles(text: Column | str, w: int = SHINGLE_WORDS) -> Column:
    """All w-word shingles (space-joined), in document order. Empty
    array when the document has fewer than w words."""
    ws = words(text)
    n = F.size(ws) - F.lit(w - 1)
    return F.when(
        n >= 1,
        F.transform(
            F.sequence(F.lit(1), n),
            lambda i: F.concat_ws(" ", F.slice(ws, i, w)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def sql_word_shingles(expr: str, w: int = SHINGLE_WORDS) -> str:
    ws = sql_words(expr)
    return (
        f"CASE WHEN len({ws}) >= {w} THEN "
        f"list_transform(generate_series(1, len({ws}) - {w - 1}), "
        f"i -> array_to_string(list_slice({ws}, i, i + {w - 1}), ' ')) "
        f"ELSE [] END"
    )


def char_shingles(text: Column | str, w: int = 8) -> Column:
    """All w-char shingles of the raw text (document fingerprinting)."""
    c = "text" if isinstance(text, str) else None
    if c is None:
        raise ValueError("char_shingles needs a column name")
    return F.expr(
        f"transform(sequence(1, greatest(length({c}) - {w - 1}, 1)), "
        f"i -> substring({c}, i, {w}))"
    )


def sql_char_shingles(expr: str, w: int = 8) -> str:
    return (
        f"list_transform(generate_series(1, greatest(strlen({expr}) - {w - 1}, 1)), "
        f"i -> substr({expr}, i, {w}))"
    )

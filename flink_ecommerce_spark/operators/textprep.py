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


def shingles_from_words(ws: Column, w: int = SHINGLE_WORDS) -> Column:
    """w-word shingles from an ALREADY-COMPUTED words array column.

    Callers on the hot path should project ``words(text)`` into a real
    column first and pass that attribute here: the slices below
    reference their input w+1 times, and inside a Generate (explode)
    there is no subexpression elimination — passing the raw
    ``words(text)`` expression re-runs the regex split w+1 times per
    document."""
    n = F.size(ws) - F.lit(w - 1)
    # shifted[j][i] = word[i+j]; shingle_i = join(shifted[0..w-1][i])
    shingles = F.slice(ws, 1, n)
    for j in range(1, w):
        shifted = F.slice(ws, 1 + j, n)
        shingles = F.zip_with(
            shingles, shifted, lambda acc, nxt: F.concat_ws(" ", acc, nxt)
        )
    return F.when(n >= 1, shingles).otherwise(F.array().cast("array<string>"))


def word_shingles(text: Column | str, w: int = SHINGLE_WORDS) -> Column:
    """All w-word shingles (space-joined), in document order. Empty
    array when the document has fewer than w words.

    Construction: zip_with over w shifted slices of the word array,
    NOT ``transform(sequence(1,n), i -> slice(words, i, w))`` — a
    lambda body that references the words expression re-evaluates the
    regex split per ELEMENT, turning shingling O(words²) per document
    (measured 20× slower at 54-word docs; catastrophic at book-length
    docs). Slices evaluate the split O(w) times per row; the lambdas
    below touch only their own element variables. (Hot paths should
    prefer projecting ``words`` first + ``shingles_from_words`` —
    that makes it ONE split per row.)"""
    return shingles_from_words(words(text), w)


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

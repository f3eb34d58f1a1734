"""Text-analysis operators over the `documents` table: token
counting, language ID, quality scoring, fingerprinting.

All pure per-row expression pipelines (regexp + array higher-order
functions) — zero shuffles except the trivial final projection, so
they stream at scan speed over 100 TB. Every operator is
deterministic and has an exact DuckDB oracle in registry.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.portable import hash32
from .textprep import char_shingles, words

# Tiny deterministic stopword profiles per language. Parity with the
# oracle matters more than linguistic realism on synthetic data.
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "is"),
    "es": ("el", "la", "de", "y", "es"),
    "de": ("der", "die", "das", "und", "ist"),
    "fr": ("le", "la", "de", "et", "est"),
}
EN_STOPWORDS = ("the", "a", "of", "and", "is", "to", "in")


def _n_tokens(text: Column) -> Column:
    return F.size(F.expr("regexp_extract_all(text, '\\\\S+', 0)"))


def token_counts(documents: DataFrame) -> DataFrame:
    """Whitespace token count plus a BPE-ish subword proxy: word
    pieces after splitting on vowel/consonant boundaries — a cheap,
    deterministic stand-in for real tokenizer counts."""
    bpe = F.size(
        F.expr(
            "regexp_extract_all(lower(text), '[aeiou]+|[^aeiou\\\\s]+', 0)"
        )
    )
    return documents.select(
        "doc_id",
        _n_tokens(F.col("text")).alias("n_tokens"),
        bpe.alias("n_subword_pieces"),
        F.length("text").alias("n_chars_measured"),
    )


def lang_id(documents: DataFrame) -> DataFrame:
    """Stopword-profile language ID: count hits of each language's
    marker words among the tokens; argmax with a fixed priority order
    (en > es > de > fr > und) for determinism."""
    ws = words("text")

    def score(markers: tuple[str, ...]):
        # single-arg lambda only: F.filter passes (element, index) to
        # two-arg lambdas, which would corrupt the closure
        return F.size(F.filter(ws, lambda w: w.isin(*markers)))

    scores = {lang: score(markers) for lang, markers in LANG_PROFILES.items()}
    best = F.greatest(*scores.values())
    pred = F.when(best == 0, F.lit("und"))
    for lang in LANG_PROFILES:  # fixed dict order = fixed priority
        pred = pred.when(scores[lang] == best, F.lit(lang))
    out = documents.select(
        "doc_id",
        *[scores[lang].alias(f"score_{lang}") for lang in LANG_PROFILES],
        pred.alias("predicted_lang"),
        "lang",
    )
    return out.withColumn(
        "agrees_with_label", (F.col("predicted_lang") == F.col("lang")).cast("int")
    )


def quality_scores(documents: DataFrame) -> DataFrame:
    """Heuristic document quality: token count, mean token length,
    punctuation ratio, stopword ratio, folded through a logistic into
    [0, 1]. Deterministic arithmetic only."""
    n_tok = _n_tokens(F.col("text")).cast("double")
    n_punct = F.size(F.expr("regexp_extract_all(text, '[^a-zA-Z0-9\\\\s]', 0)")).cast(
        "double"
    )
    sw_list = ", ".join(f"'{w}'" for w in EN_STOPWORDS)
    n_stop = F.size(
        F.expr(
            f"filter(split(lower(trim(text)), '\\\\s+'), w -> w IN ({sw_list}))"
        )
    ).cast("double")
    n_chars = F.length("text").cast("double")
    mean_tok_len = (n_chars - (n_tok - 1)) / n_tok  # chars net of single spaces
    punct_ratio = n_punct / n_chars
    stop_ratio = n_stop / n_tok
    z = (
        F.lit(-2.0)
        + 0.02 * n_tok
        + 4.0 * stop_ratio
        - 8.0 * punct_ratio
        - 0.1 * F.abs(mean_tok_len - 5.0)
    )
    return documents.select(
        "doc_id",
        n_tok.cast("long").alias("n_tokens"),
        F.round(mean_tok_len, 6).alias("mean_token_len"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 6).alias("quality"),
    )


def top_bigrams(documents: DataFrame, k: int = 20) -> DataFrame:
    """Global top-k word bigrams by frequency (corpus n-gram stats —
    a standard training-data diagnostic). Explode → count → top-k
    with deterministic tie-break on the bigram string. The count is
    a partial-agg shuffle on the bigram; top-k is
    TakeOrderedAndProject (no global sort)."""
    from .textprep import word_shingles

    bigrams = documents.select(
        F.explode(word_shingles("text", w=2)).alias("bigram")
    )
    return (
        bigrams.groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("bigram"))
        .limit(k)
    )


def tfidf_top_terms(documents: DataFrame, k: int = 3) -> DataFrame:
    """Top-k terms per document by tf-idf (ln-scaled idf, raw tf).

    Classic IR pipeline as three hash-partitioned aggregations:
    term counts per doc (tf), document frequency per term (df), and
    a broadcast-joined score. Deterministic tie-break on the term
    string. idf = ln(N / df) with N = corpus size."""
    from pyspark.sql import Window

    toks = documents.select(
        "doc_id", F.explode(words("text")).alias("term")
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = documents.select(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(F.broadcast(df), "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.round(F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 6),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("tfidf"), F.asc("term")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("doc_id", "term", "tf", "tfidf", F.col("rk").alias("rk"))
    )


def doc_fingerprints(documents: DataFrame) -> DataFrame:
    """Two fingerprints per document: full-content hash of the
    whitespace-normalized text, and a winnowing-style minimum over
    8-char rolling shingle hashes (robust to local edits)."""
    norm = F.regexp_replace(F.trim(F.lower(F.col("text"))), r"\s+", " ")
    winnow = F.array_min(
        F.transform(char_shingles("text", 8), lambda s: hash32(s, salt="fp"))
    )
    return documents.select(
        "doc_id",
        hash32(norm, salt="doc").alias("content_fp"),
        winnow.alias("winnow_fp"),
    )

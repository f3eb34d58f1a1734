"""BPE tokenizer training and application (Sennrich et al. 2016).

``bpe_merge_candidates`` (operators/text.py) is the distributable
inner aggregate of BPE training; this module adds the other two
pieces a tokenizer pipeline needs:

- ``bpe_train``: learn a merge table from the corpus. The Spark part
  reduces the corpus to its WORD-FREQUENCY table (one groupBy — the
  canonical trainer input; distinct words, not tokens, bound the
  problem), capped at the ``max_vocab_words`` most frequent words —
  the standard frequency cutoff that makes tokenizer training
  corpus-size-independent: at 100 TB the cap, not the corpus, sizes
  the driver-side merge loop, and rare words beyond it contribute
  negligible pair mass. The merge loop itself is the classic
  sequential algorithm (each merge depends on the previous), run on
  the capped frequency table; for vocabularies too large even when
  capped, each iteration is expressible as ``bpe_merge_candidates``
  over the re-segmented corpus.

- ``bpe_apply``: encode documents with a learned merge table. This is
  the documented Pandas-UDF boundary: merge application is an
  order-dependent per-word loop no relational expression captures, so
  it runs as Arrow-batched mapInPandas with the merge table broadcast
  (a closure constant — a few KB) and a per-batch word→tokens memo
  (Zipf makes the hit rate high). One scan, no shuffle, embarrassingly
  parallel — the UDF-cost playbook from the repo guide applied.

Token convention: words split to characters with a ``</w>``
end-of-word marker on the final character (the original BPE paper's
scheme), so merges never cross word boundaries and detokenization is
exact.
"""

from __future__ import annotations

from collections import Counter
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .textprep import words

END = "</w>"
DEFAULT_NUM_MERGES = 50
MAX_VOCAB_WORDS = 100_000


def _word_symbols(word: str) -> tuple[str, ...]:
    """Initial segmentation: characters, last one carrying </w>."""
    if not word:
        return ()
    return tuple(word[:-1]) + (word[-1] + END,)


def _merge_word(symbols: tuple[str, ...], pair: tuple[str, str]) -> tuple[str, ...]:
    """Apply ONE merge everywhere in a symbol sequence (left-to-right,
    non-overlapping — the standard BPE convention)."""
    out: list[str] = []
    i = 0
    while i < len(symbols):
        if (
            i + 1 < len(symbols)
            and symbols[i] == pair[0]
            and symbols[i + 1] == pair[1]
        ):
            out.append(pair[0] + pair[1])
            i += 2
        else:
            out.append(symbols[i])
            i += 1
    return tuple(out)


def word_frequencies(documents: DataFrame, max_vocab_words: int = MAX_VOCAB_WORDS) -> DataFrame:
    """(word, n) — the trainer input. One explode + one count with
    map-side combine; the cap is TakeOrderedAndProject with a
    deterministic (n DESC, word ASC) tie-break."""
    return (
        documents.select(F.explode(words("text")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("word"))
        .limit(max_vocab_words)
    )


def bpe_train(
    documents: DataFrame,
    num_merges: int = DEFAULT_NUM_MERGES,
    max_vocab_words: int = MAX_VOCAB_WORDS,
) -> list[tuple[str, str]]:
    """Learn ``num_merges`` merges from the corpus word-frequency
    table. Returns the ordered merge list (rank = list position).
    Deterministic: pair ties break lexicographically."""
    freq = {
        r["word"]: r["n"] for r in word_frequencies(documents, max_vocab_words).collect()
    }
    segmented: dict[str, tuple[str, ...]] = {
        w: _word_symbols(w) for w in freq
    }
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        counts: Counter = Counter()
        for w, syms in segmented.items():
            n = freq[w]
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] += n
        if not counts:
            break
        # deterministic tie-break: highest count, then lexicographic
        top_n = max(counts.values())
        best_pair = min(p for p, c in counts.items() if c == top_n)
        merges.append(best_pair)
        segmented = {w: _merge_word(s, best_pair) for w, s in segmented.items()}
    return merges


def encode_word(word: str, merges: list[tuple[str, str]]) -> tuple[str, ...]:
    """Apply the merge table to one word, in training order."""
    syms = _word_symbols(word)
    for pair in merges:
        if len(syms) < 2:
            break
        syms = _merge_word(syms, pair)
    return syms


def bpe_apply(
    documents: DataFrame, merges: list[tuple[str, str]]
) -> DataFrame:
    """(doc_id, bpe_tokens array<string>, n_bpe_tokens) — encode every
    document with the learned merges. Arrow-batched mapInPandas with a
    per-batch word memo; the merge table rides the closure (a few KB
    broadcast with the task)."""
    import pandas as pd

    merge_list = list(merges)
    schema = "doc_id long, bpe_tokens array<string>, n_bpe_tokens int"

    def encode_batches(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        memo: dict[str, tuple[str, ...]] = {}

        def enc_doc(text: str) -> list[str]:
            out: list[str] = []
            for w in (text or "").split():
                toks = memo.get(w)
                if toks is None:
                    toks = encode_word(w, merge_list)
                    memo[w] = toks
                out.extend(toks)
            return out

        for pdf in batches:
            toks = pdf["text"].map(enc_doc)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "bpe_tokens": toks,
                    "n_bpe_tokens": toks.map(len),
                }
            )

    return documents.select("doc_id", "text").mapInPandas(encode_batches, schema)

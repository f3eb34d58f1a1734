"""Round-8 operators: interpolated trigram Kneser-Ney surprisal."""

from __future__ import annotations

import math
from collections import Counter

from flink_ecommerce_spark import catalog
from flink_ecommerce_spark.schemas import DOCUMENTS_SCHEMA

SF_SMALL = "/root/testdata/sf0.001"


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, "en", s, len(t)) for i, t, s in rows], DOCUMENTS_SCHEMA
    )


def test_kn_trigram_surprisal_matches_python_reference(spark):
    """Exact interpolated-KN arithmetic against an independent Python
    reference on the small fixture (same discount, same Chen-Goodman
    continuation counts, same expression order)."""
    from flink_ecommerce_spark.operators.text import (
        KN_DISCOUNT,
        kn_trigram_surprisal,
    )
    from flink_ecommerce_spark.operators.textprep import words

    docs = catalog.table(spark, SF_SMALL, "documents")
    toks = {
        r["doc_id"]: r["w"]
        for r in docs.select("doc_id", words("text").alias("w")).collect()
    }
    tc: Counter = Counter()
    doc_tris = {}
    for did, w in toks.items():
        tris = list(zip(w, w[1:], w[2:]))
        doc_tris[did] = tris
        tc.update(tris)
    c12: Counter = Counter()
    n1f12: Counter = Counter()
    ct: Counter = Counter()  # N1+(., w2 w3)
    for (w1, w2, w3), c in tc.items():
        c12[(w1, w2)] += c
        n1f12[(w1, w2)] += 1
        ct[(w2, w3)] += 1
    mid_n: Counter = Counter()  # N1+(., w2, .)
    fol: dict[str, set] = {}
    for (w1, w2, w3) in tc:
        mid_n[w2] += 1
        fol.setdefault(w2, set()).add(w3)
    uni: Counter = Counter()  # N1+(., . w3)
    for (w2, w3) in ct:
        uni[w3] += 1
    t = len(ct)
    d = KN_DISCOUNT

    def pkn(w1, w2, w3):
        p2 = (
            max(ct[(w2, w3)] - d, 0.0) + d * len(fol[w2]) * (uni[w3] / t)
        ) / mid_n[w2]
        return (
            max(tc[(w1, w2, w3)] - d, 0.0) + d * n1f12[(w1, w2)] * p2
        ) / c12[(w1, w2)]

    expected = {}
    for did, tris in doc_tris.items():
        if not tris:
            continue
        s = [-math.log2(pkn(*tr)) for tr in tris]
        expected[did] = (len(tris), math.floor(sum(s) / len(s) * 1e6 + 0.5))

    got = {
        r["doc_id"]: (r["n_trigrams"], r["avg_kn3_surprisal_micro"])
        for r in kn_trigram_surprisal(docs).collect()
    }
    assert set(got) == set(expected)
    for did in expected:
        assert got[did][0] == expected[did][0]
        assert abs(got[did][1] - expected[did][1]) <= 1, did


def test_kn_trigram_short_docs_drop_out(spark):
    from flink_ecommerce_spark.operators.text import kn_trigram_surprisal

    rows = [
        (0, "one two", "s"),          # 2 words -> no trigram
        (1, "a b c d", "s"),          # 2 trigrams
        (2, "", "s"),
    ]
    out = {r["doc_id"]: r for r in kn_trigram_surprisal(_docs(spark, rows)).collect()}
    assert set(out) == {1}
    assert out[1]["n_trigrams"] == 2


def test_kn_trigram_on_empty(spark):
    from flink_ecommerce_spark.operators.text import kn_trigram_surprisal

    empty = spark.createDataFrame([], DOCUMENTS_SCHEMA)
    assert kn_trigram_surprisal(empty).collect() == []


def test_kn_trigram_sees_incoherent_triples(spark):
    """The trigram signal bigrams can't see: every ADJACENT pair in
    the probe doc is common in the corpus, but the TRIPLES never
    co-occur — trigram KN must score the probe doc more surprising
    than a doc of verbatim common trigrams."""
    from flink_ecommerce_spark.operators.text import kn_trigram_surprisal

    base = []
    for i in range(12):
        base.append((i, "the cat sat on the mat", "s"))
        base.append((100 + i, "cat ran on red mat now", "s"))
    # probe: bigrams "the cat", "cat ran" exist; trigram "the cat ran"
    # never occurs in base
    rows = base + [(500, "the cat ran", "s"), (501, "the cat sat", "s")]
    out = {
        r["doc_id"]: r["avg_kn3_surprisal_micro"]
        for r in kn_trigram_surprisal(_docs(spark, rows)).collect()
    }
    assert out[500] > out[501]

"""PMI collocations: crafted-signal ranking (always-together pair
beats frequent-but-independent pair), the min_count hapax guard, and
short-doc robustness."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_ecommerce_spark.operators.text import pmi_collocations


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_pmi_ranks_bound_pair_above_independent_pair(spark):
    """"new york" appears only together; "the"/"cat" are frequent but
    combine with everything — PMI must rank the bound pair first even
    though the independent pair co-occurs more often in raw count."""
    texts = []
    for i in range(10):
        texts.append("new york " + " ".join(["the cat", "cat the", "the dog"][i % 3] for _ in range(5)))
    rows = pmi_collocations(_docs(spark, texts), k=50, min_count=5).collect()
    by_pair = {(r["w1"], r["w2"]): r["pmi"] for r in rows}
    assert ("new", "york") in by_pair
    assert by_pair[("new", "york")] > by_pair[("the", "cat")]
    top = max(rows, key=lambda r: r["pmi"])
    assert (top["w1"], top["w2"]) == ("new", "york")


def test_pmi_min_count_drops_hapax_pairs(spark):
    """A pair seen once (PMI's classic false positive) must not
    appear when min_count > 1."""
    texts = ["unique singleton"] + ["common words common words"] * 10
    rows = pmi_collocations(_docs(spark, texts), k=50, min_count=2).collect()
    pairs = {(r["w1"], r["w2"]) for r in rows}
    assert ("unique", "singleton") not in pairs


def test_pmi_handles_sub_bigram_docs(spark):
    """Docs with <2 words contribute no bigrams and must not crash
    or skew totals."""
    texts = ["solo", "", "pair here pair here pair here pair here pair here"]
    rows = pmi_collocations(_docs(spark, texts), k=10, min_count=2).collect()
    assert all(r["n_pair"] >= 2 for r in rows)


def test_pmi_counts_match_bigram_frequency(spark):
    """n_pair in the output is the exact bigram frequency."""
    texts = ["a b a b a b a b a b"] * 3  # "a b" x5 per doc, "b a" x4
    rows = pmi_collocations(_docs(spark, texts), k=10, min_count=2).collect()
    n = {(r["w1"], r["w2"]): r["n_pair"] for r in rows}
    assert n[("a", "b")] == 15
    assert n[("b", "a")] == 12


def test_k_anonymity_crafted_groups(spark):
    """Hand-checkable: a 6-member class passes k=5, a 2-member and a
    singleton violate; rows-at-risk and fraction follow."""
    from flink_ecommerce_spark.operators.text import (
        k_anonymity_report,
        k_anonymity_violations,
    )

    rows = (
        [(i, "t", "en", "big", 1) for i in range(6)]
        + [(10, "t", "en", "small", 1), (11, "t", "en", "small", 1)]
        + [(12, "t", "fr", "solo", 1)]
    )
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars int"
    )
    viol = {
        (r["lang"], r["source"]): r["n"]
        for r in k_anonymity_violations(docs, k=5).collect()
    }
    assert viol == {("en", "small"): 2, ("fr", "solo"): 1}
    r = k_anonymity_report(docs, k=5).collect()[0]
    assert (r["n_groups"], r["n_violating_groups"], r["n_rows_at_risk"]) == (3, 2, 3)
    assert r["frac_rows_at_risk"] == round(3 / 9, 6)


def test_k_anonymity_empty_corpus(spark):
    from pyspark.sql import functions as F

    from flink_ecommerce_spark.operators.text import k_anonymity_report

    docs = spark.createDataFrame(
        [], "doc_id long, text string, lang string, source string, n_chars int"
    )
    r = k_anonymity_report(docs).collect()[0]
    assert (r["n_groups"], r["n_violating_groups"], r["n_rows_at_risk"]) == (0, 0, 0)
    assert r["frac_rows_at_risk"] == 0.0


def test_sample_k_per_group_quota_and_determinism(spark):
    """Exactly min(k, group size) per group; membership identical
    across repartitionings (the portable-hash order is data-only)."""
    from flink_ecommerce_spark.operators.sampling import sample_k_per_group

    rows = [(i, "t", "en" if i < 40 else "fr", "s", 1) for i in range(50)]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars int"
    )
    out = sample_k_per_group(docs, k=15)
    sizes = {
        r["lang"]: r["n"]
        for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    assert sizes == {"en": 15, "fr": 10}  # fr has only 10 docs
    a = {(r["lang"], r["doc_id"]) for r in out.collect()}
    b = {
        (r["lang"], r["doc_id"])
        for r in sample_k_per_group(docs.repartition(7), k=15).collect()
    }
    assert a == b


def test_zipf_fit_recovers_power_law(spark):
    """A corpus with exact freq ∝ 1/rank term counts must fit slope
    ≈ −1 with r² ≈ 1; the fixture's template text (tested in the
    oracle gate) sits far from it — that contrast is the point of
    the diagnostic."""
    from flink_ecommerce_spark.operators.text import zipf_fit

    # term_i appears round(120/i) times, i = 1..30
    tokens = []
    for i in range(1, 31):
        tokens += [f"w{i:02d}"] * round(120 / i)
    texts = [" ".join(tokens)]
    docs = spark.createDataFrame(
        [(0, texts[0])], "doc_id long, text string"
    )
    r = zipf_fit(docs, top_n=30).collect()[0]
    assert r["n_terms_used"] == 30
    assert -1.1 < r["slope"] < -0.9
    assert r["r2"] > 0.98


def test_zipf_fit_degenerate_single_term(spark):
    """One distinct term: zero x-variance must yield flat zeros, not
    NaN."""
    from flink_ecommerce_spark.operators.text import zipf_fit

    docs = spark.createDataFrame(
        [(0, "same same same")], "doc_id long, text string"
    )
    r = zipf_fit(docs).collect()[0]
    assert r["n_terms_used"] == 1
    assert (r["slope"], r["intercept"], r["r2"]) == (0.0, 0.0, 0.0)


def test_quality_psi_by_source_flags_slid_batch(spark):
    """A source whose batch rows (doc_id%5==0) carry garbage quality
    alarms; a source whose batch matches its history stays near
    zero. Texts control the quality score: long stopword-rich prose
    scores high, punctuation soup scores low."""
    from flink_ecommerce_spark.operators.text import quality_psi_by_source

    good = "the quick brown fox and the lazy dog of the meadow is here " * 3
    bad = "!!! ??? ;;; ### $$$ %%% ^^^ &&& *** ((( )))"
    rows = []
    # 'stable': history good, batch good (ids 0..49: batch = %5==0)
    for i in range(50):
        rows.append((i, good, "en", "stable", len(good)))
    # 'slid': history good, batch garbage
    for i in range(50, 100):
        rows.append((i, bad if i % 5 == 0 else good, "en", "slid", 1))
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars int"
    )
    got = {r["source"]: r for r in quality_psi_by_source(docs).collect()}
    assert got["stable"]["psi"] < 0.05
    assert got["slid"]["psi"] > 0.25
    assert got["slid"]["n_baseline"] == 40 and got["slid"]["n_current"] == 10

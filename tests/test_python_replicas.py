"""Exact pure-Python replicas of the deterministic curation/sampling
operators, run against seeded-random inputs. Complements the DuckDB
oracle gate: a third independent implementation (hashlib + plain
Python) must reproduce Spark's outputs bit-for-bit, so an agreement
bug shared by the two SQL engines would still be caught."""

from __future__ import annotations

import hashlib
import random

from flink_ecommerce_spark.operators import sampling, text
from flink_ecommerce_spark.schemas import DOCUMENTS_SCHEMA

VOCAB = ["alpha", "beta", "gamma", "delta", "spam", "the", "key", "customer"]


def _hash32(s: str, salt: str | None = None) -> int:
    if salt is not None:
        s = f"{salt}:{s}"
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _random_docs(n=100, seed=7):
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        words = [rng.choice(VOCAB) for _ in range(rng.randint(3, 30))]
        t = " ".join(words)
        rows.append((i, t, "en", f"src{rng.randint(0, 19)}", len(t)))
    return rows


def test_repetition_scores_match_python(spark):
    rows = _random_docs()
    df = spark.createDataFrame(rows, DOCUMENTS_SCHEMA)
    got = {r["doc_id"]: r for r in text.repetition_scores(df).collect()}
    for doc_id, t, *_ in rows:
        ws = t.lower().split()
        n, nd = len(ws), len(set(ws))
        top = max(ws.count(w) for w in set(ws))
        sh = [" ".join(ws[i : i + 3]) for i in range(len(ws) - 2)]
        dup3 = 1.0 - len(set(sh)) / len(sh) if sh else 0.0
        r = got[doc_id]
        assert r["n_words"] == n
        assert r["dup_word_frac"] == round(1.0 - nd / n, 6)
        assert r["top_word_share"] == round(top / n, 6)
        assert r["dup_3gram_frac"] == round(dup3, 6)


def test_mixture_sample_matches_python(spark):
    rows = _random_docs(n=200, seed=13)
    df = spark.createDataFrame(rows, DOCUMENTS_SCHEMA)
    got = {r["doc_id"]: r["kept"] for r in sampling.mixture_sample(df).collect()}
    assert len(got) == 200
    for doc_id, _t, _l, source, _n in rows:
        rate = sampling.MIXTURE_WEIGHTS.get(source, 0)
        expect = (_hash32(str(doc_id), salt="mix") % 100) < rate
        assert got[doc_id] == expect, (doc_id, source)


def test_stratified_sample_matches_python(spark):
    from flink_ecommerce_spark import catalog
    from tests.conftest import SF_SMALL

    events = catalog.table(spark, SF_SMALL, "events")
    sample = {r["event_id"] for r in sampling.stratified_sample(events).collect()}
    rows = events.select("event_id", "event_type").collect()
    expect = {
        r["event_id"]
        for r in rows
        if (_hash32(str(r["event_id"]), salt="strat") % 100)
        < sampling.STRATA_RATES.get(r["event_type"], 0)
    }
    assert sample == expect and len(sample) > 0


def test_pii_scrub_hash_matches_python(spark):
    import re

    rows = [
        (0, "mail a.b@c.io or call +1 555 123 9876 customer", "en", "t", 1),
        (1, "the key customer holds the key", "en", "t", 1),
        (2, "nothing to redact here", "en", "t", 1),
    ]
    df = spark.createDataFrame(rows, DOCUMENTS_SCHEMA)
    got = {r["doc_id"]: r for r in text.pii_scrub(df).collect()}
    deny = r"\b(" + "|".join(text.PII_DENYLIST) + r")\b"
    for doc_id, t, *_ in rows:
        scrubbed = re.sub(text.PII_EMAIL, "<EMAIL>", t)
        scrubbed = re.sub(text.PII_PHONE, "<PHONE>", scrubbed)
        scrubbed = re.sub(deny, "<REDACTED>", scrubbed)
        assert got[doc_id]["scrubbed_hash"] == _hash32(scrubbed), (doc_id, scrubbed)
        assert got[doc_id]["scrubbed_len"] == len(scrubbed)

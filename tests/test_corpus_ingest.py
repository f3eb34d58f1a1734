"""Corpus ingestion: every supported format conforms to the canonical
documents schema, content-hash ids are engine/partitioning stable,
and the conformed output feeds the operator surface directly."""

from __future__ import annotations

import json

from flink_ecommerce_spark.operators.dedup import dedup_exact
from flink_ecommerce_spark.schemas import DOCUMENTS_SCHEMA
from flink_ecommerce_spark.sources.corpus import conform_documents, read_documents

DOCS = [
    "the quick brown fox jumps over the lazy dog",
    "an entirely different document about spark engines",
    "the quick brown fox jumps over the lazy dog",  # exact dup of 0
]


def test_jsonl_ingest_conforms(spark, tmp_path):
    p = tmp_path / "c.jsonl"
    p.write_text(
        "\n".join(json.dumps({"text": t, "lang": "en"}) for t in DOCS)
    )
    df = read_documents(spark, str(p), fmt="jsonl", source="crawl")
    assert [f.name for f in df.schema.fields] == [
        f.name for f in DOCUMENTS_SCHEMA.fields
    ]
    rows = df.collect()
    assert len(rows) == 3
    assert all(r["source"] == "crawl" and r["lang"] == "en" for r in rows)
    assert all(r["n_chars"] == len(r["text"]) for r in rows)
    # content-hash ids: the exact-duplicate text resolves to ONE id
    assert len({r["doc_id"] for r in rows}) == 2


def test_text_and_csv_ingest(spark, tmp_path):
    t = tmp_path / "d.txt"
    t.write_text("\n".join(DOCS[:2]))
    df = read_documents(spark, str(t), fmt="text")
    assert df.count() == 2
    assert df.filter("source = 'd'").count() == 2  # file-stem source

    c = tmp_path / "e.csv"
    c.write_text("text,lang\nhello world doc,en\nsecond doc here,de\n")
    rows = read_documents(spark, str(c), fmt="csv", source="s").collect()
    assert {r["lang"] for r in rows} == {"en", "de"}


def test_content_hash_stable_across_partitionings(spark):
    base = spark.createDataFrame([(t,) for t in DOCS], "text string")
    a = {
        r["text"]: r["doc_id"]
        for r in conform_documents(base.repartition(1), source="s").collect()
    }
    b = {
        r["text"]: r["doc_id"]
        for r in conform_documents(base.repartition(7), source="s").collect()
    }
    assert a == b


def test_conformed_output_feeds_operators(spark, tmp_path):
    p = tmp_path / "c.jsonl"
    p.write_text("\n".join(json.dumps({"text": t}) for t in DOCS))
    docs = read_documents(spark, str(p), fmt="jsonl", source="s")
    groups = dedup_exact(docs).collect()
    assert len(groups) == 2  # two distinct contents
    assert max(r["n_copies"] for r in groups) == 2  # the dup pair grouped


def test_jsonl_round_trip(spark, tmp_path):
    """write_jsonl → read_documents(id_policy='provided') is lossless
    for the canonical columns."""
    from flink_ecommerce_spark.sources.corpus import write_jsonl

    src = spark.createDataFrame(
        [(7, "round trip doc", "en", "s", 14)], DOCUMENTS_SCHEMA
    )
    p = str(tmp_path / "export")
    write_jsonl(src, p, n_files=1)
    back = read_documents(spark, p, fmt="jsonl", id_policy="provided")
    assert [tuple(r) for r in back.collect()] == [
        (7, "round trip doc", "en", "s", 14)
    ]


def test_content_hash_ids_fit_63_bits(spark):
    """The packed id must stay in [0, 2^63) for any content — the
    unmasked-shift overflow class is locked out structurally, and a
    large sample leaves headroom assertions meaningful."""
    from flink_ecommerce_spark.sources.corpus import conform_documents

    docs = spark.range(5000).selectExpr(
        "concat('doc text number ', id, repeat(' filler', CAST(id % 17 AS INT))) AS text"
    )
    ids = [
        r["doc_id"] for r in conform_documents(docs, source="s").collect()
    ]
    assert all(0 <= i < (1 << 63) for i in ids)
    assert len(set(ids)) == len(ids)  # no collisions in the sample


def test_malformed_jsonl_lines_drop_at_boundary(spark, tmp_path):
    """A corrupt JSONL line (PERMISSIVE parse -> null text) drops at
    conform time instead of flowing NULL rows downstream."""
    p = tmp_path / "bad.jsonl"
    p.write_text(
        '{"text": "a good document line"}\n'
        "{not valid json at all\n"
        '{"other_key": "no text field"}\n'
        '{"text": "another good one"}\n'
    )
    rows = read_documents(spark, str(p), fmt="jsonl", source="s").collect()
    assert {r["text"] for r in rows} == {
        "a good document line", "another good one"
    }

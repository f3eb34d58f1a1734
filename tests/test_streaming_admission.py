"""Streaming fuzzy admission: cross-batch self-extending history —
a later batch's near-dup of an EARLIER ADMIT is rejected, not just
near-dups of the seed corpus."""

from __future__ import annotations

from flink_ecommerce_spark.schemas import DOCUMENTS_SCHEMA
from flink_ecommerce_spark.streaming.admission import (
    init_admission_history,
    streaming_fuzzy_admission,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat "
    "watches from the warm windowsill in the afternoon sun today"
)
FRESH_1 = (
    "completely different text about spark query engines and "
    "distributed columnar execution at extremely large data scale"
)
FRESH_2 = (
    "another unrelated document mentioning kafka topics postgres "
    "upserts and flink keyed state semantics in production systems"
)


def _doc_rows(rows):
    return [(i, t, "en", "s", len(t)) for i, t in rows]


def _write_chunk(spark, path, rows, chunk):
    df = spark.createDataFrame(_doc_rows(rows), DOCUMENTS_SCHEMA)
    df.coalesce(1).write.mode("overwrite").parquet(f"{path}/chunk={chunk}")


def test_streaming_admission_extends_history(spark, tmp_path):
    docs_dir = str(tmp_path / "admitted")
    sig_dir = str(tmp_path / "sigs")
    src = str(tmp_path / "incoming")

    corpus = spark.createDataFrame(_doc_rows([(0, BASE)]), DOCUMENTS_SCHEMA)
    init_admission_history(corpus, docs_dir, sig_dir)

    # batch 1: near-dup of the SEED corpus + a fresh doc
    _write_chunk(spark, src, [(10, BASE + " extra"), (11, FRESH_1)], 1)
    stream = (
        spark.readStream.schema(DOCUMENTS_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{src}/chunk=*")
    )
    q = streaming_fuzzy_admission(
        stream, docs_dir, sig_dir, str(tmp_path / "ckpt")
    )
    q.processAllAvailable()
    admitted = {r["doc_id"] for r in spark.read.parquet(docs_dir).collect()}
    assert admitted == {0, 11}  # seed + fresh; repost of seed rejected

    # batch 2: near-dup of BATCH-1's admit (11) + a fresh doc — the
    # cross-batch property: 11 is history now, so 20 must be rejected
    _write_chunk(spark, src, [(20, FRESH_1 + " extra"), (21, FRESH_2)], 2)
    q.processAllAvailable()
    q.stop()
    admitted = {r["doc_id"] for r in spark.read.parquet(docs_dir).collect()}
    assert admitted == {0, 11, 21}

    # the signature layer tracked the admits (the no-rescan invariant)
    sig_ids = {r["doc_id"] for r in spark.read.parquet(sig_dir).collect()}
    assert sig_ids == {0, 11, 21}


def test_admission_cli_end_to_end(spark, tmp_path):
    """The module CLI seeds history and admits arriving files."""
    from flink_ecommerce_spark.streaming import admission

    seed = str(tmp_path / "seed.parquet")
    spark.createDataFrame(_doc_rows([(0, BASE)]), DOCUMENTS_SCHEMA).write.parquet(seed)
    incoming = str(tmp_path / "incoming")
    _write_chunk(spark, incoming, [(10, BASE + " extra"), (11, FRESH_1)], 1)

    q = admission.main(
        [
            "--corpus", seed,
            "--incoming", f"{incoming}/chunk=*",
            "--docs-dir", str(tmp_path / "curated"),
            "--sig-dir", str(tmp_path / "curated_sigs"),
            "--checkpoint", str(tmp_path / "cli_ckpt"),
        ]
    )
    q.processAllAvailable()
    q.stop()
    admitted = {
        r["doc_id"]
        for r in spark.read.parquet(str(tmp_path / "curated")).collect()
    }
    assert admitted == {0, 11}


def test_admission_survives_restart(spark, tmp_path):
    """Kill the stream after batch 1, start a NEW query on the same
    checkpoint: batch 1's files are not re-admitted (no duplicate
    rows in the history layers) and cross-batch rejection still
    works against pre-restart admits."""
    docs_dir = str(tmp_path / "admitted")
    sig_dir = str(tmp_path / "sigs")
    src = str(tmp_path / "incoming")
    ckpt = str(tmp_path / "ckpt")

    corpus = spark.createDataFrame(_doc_rows([(0, BASE)]), DOCUMENTS_SCHEMA)
    init_admission_history(corpus, docs_dir, sig_dir)

    _write_chunk(spark, src, [(11, FRESH_1)], 1)
    stream1 = (
        spark.readStream.schema(DOCUMENTS_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{src}/chunk=*")
    )
    q1 = streaming_fuzzy_admission(stream1, docs_dir, sig_dir, ckpt)
    q1.processAllAvailable()
    q1.stop()

    # restart: same checkpoint, new query object
    _write_chunk(spark, src, [(20, FRESH_1 + " extra"), (21, FRESH_2)], 2)
    stream2 = (
        spark.readStream.schema(DOCUMENTS_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{src}/chunk=*")
    )
    q2 = streaming_fuzzy_admission(stream2, docs_dir, sig_dir, ckpt)
    q2.processAllAvailable()
    q2.stop()

    admitted = [r["doc_id"] for r in spark.read.parquet(docs_dir).collect()]
    assert sorted(admitted) == [0, 11, 21]  # no duplicates, 20 rejected
    sig_ids = [r["doc_id"] for r in spark.read.parquet(sig_dir).collect()]
    assert sorted(sig_ids) == [0, 11, 21]


def test_admission_cli_jsonl_incoming(spark, tmp_path):
    """JSONL ingestion path: rows with only a text field stream
    through conform_documents (content-hash ids) into admission."""
    import json as _json

    from flink_ecommerce_spark.streaming import admission

    seed = str(tmp_path / "seed.parquet")
    spark.createDataFrame(_doc_rows([(0, BASE)]), DOCUMENTS_SCHEMA).write.parquet(seed)
    incoming = tmp_path / "incoming"
    incoming.mkdir()
    (incoming / "batch1.jsonl").write_text(
        "\n".join(
            _json.dumps({"text": t})
            for t in (BASE + " extra", FRESH_1)
        )
    )
    q = admission.main(
        [
            "--corpus", seed,
            "--incoming", str(incoming),
            "--docs-dir", str(tmp_path / "curated"),
            "--sig-dir", str(tmp_path / "curated_sigs"),
            "--checkpoint", str(tmp_path / "jl_ckpt"),
            "--format", "jsonl",
        ]
    )
    q.processAllAvailable()
    q.stop()
    admitted = spark.read.parquet(str(tmp_path / "curated"))
    texts = {r["text"] for r in admitted.collect()}
    assert FRESH_1 in texts          # fresh admitted
    assert (BASE + " extra") not in texts  # repost rejected
    assert BASE in texts             # the seed


def test_admission_drift_log(spark, tmp_path):
    """With drift_dir set, every epoch appends per-source quality-PSI
    rows computed against the history AS OF that epoch — a garbage
    batch from a known-good source alarms in the same epoch its
    documents arrive."""
    import math

    from pyspark.sql import functions as F

    docs_dir = str(tmp_path / "admitted")
    sig_dir = str(tmp_path / "sigs")
    drift_dir = str(tmp_path / "drift")
    src = str(tmp_path / "incoming")

    good = (
        "the quick brown fox and the lazy dog of the meadow is here "
        "with the other animals of the field today again " * 2
    )
    garbage = "!!! ??? ;;; ### $$$ %%% ^^^ &&& *** ((( )))"
    corpus = spark.createDataFrame(
        _doc_rows([(i, good + f" v{i}") for i in range(20)]),
        DOCUMENTS_SCHEMA,
    )
    init_admission_history(corpus, docs_dir, sig_dir)

    # epoch with a quality-slid batch from the same source
    _write_chunk(spark, src, [(100 + i, garbage + f" g{i}") for i in range(10)], 1)
    stream = (
        spark.readStream.schema(DOCUMENTS_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{src}/chunk=*")
    )
    q = streaming_fuzzy_admission(
        stream,
        docs_dir,
        sig_dir,
        str(tmp_path / "ckpt"),
        drift_dir=drift_dir,
    )
    q.processAllAvailable()
    q.stop()

    drift = spark.read.parquet(drift_dir).collect()
    assert len(drift) >= 1
    by_source = {r["source"]: r for r in drift}
    r = by_source["s"]
    assert r["n_baseline"] == 20 and r["n_current"] == 10
    assert math.isfinite(r["psi"]) and r["psi"] > 0.25  # alarms
    assert r["epoch"] == 0

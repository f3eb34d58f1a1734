"""Corpus ingestion: JSONL / CSV / raw-text / parquet → the canonical
documents schema (doc_id, text, lang, source, n_chars).

Real training corpora arrive as JSONL dumps, CSV exports, and bare
text files, not pre-conformed parquet. This front end normalizes any
of them at the pipeline boundary so every downstream operator (dedup,
curation, packing, ...) sees one schema — and fails LOUDLY via the
catalog's data-contract check rather than three stages later.

doc_id policy (``id_policy``):

- ``"provided"`` — the input carries doc_id; it is cast to long.
- ``"content_hash"`` — 63-bit id from the portable md5 of
  (source, text): DETERMINISTIC across reruns, partitionings, and
  engines — the right default for dedup pipelines (identical content
  collides on purpose: exact duplicates resolve to one id before
  near-dup even runs). Derived as two independent 32-bit halves of
  one digest packed into 63 bits — positive, well-spread, never
  wraps signed 64-bit.
- ``"load_order"`` — monotonically_increasing_id(): unique within
  THIS load, not reproducible across loads (documented Spark
  semantics). For append-style ingestion where ids only need to be
  distinct.

Scale: every format reads through Spark's native distributed readers
(json/csv/text/parquet); normalization is per-row expressions on the
scan. ``text`` files ingest one document per LINE by default (the
common web-corpus dump layout) or one per FILE with
``whole_files=True`` (mapped through wholeTextFiles semantics via
``spark.read.text(..., wholetext=True)``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import schema_violations
from ..functions.portable import hash32_from_digest, salted_md5
from ..schemas import DOCUMENTS_SCHEMA


def _content_hash_id(source_col: F.Column, text_col: F.Column) -> F.Column:
    d = salted_md5(F.concat_ws("\x1f", source_col, text_col), salt="docid")
    # pack (h1 mod 2^31) into the high 31 bits, h2 into the low 32:
    # max value is exactly 2^63 - 1, so the id can never wrap signed
    # 64-bit (an unmasked h1 << 31 overflows for h1 within 2 of 2^32
    # — one-in-2^31 content, i.e. guaranteed at 100 TB)
    h1 = hash32_from_digest(d, half=0) % F.lit(2147483648)
    h2 = hash32_from_digest(d, half=1)
    return (h1 * F.lit(4294967296) + h2).cast("long")


def conform_documents(
    df: DataFrame,
    source: str | None = None,
    default_lang: str = "und",
    id_policy: str = "content_hash",
) -> DataFrame:
    """Normalize an arbitrary frame holding at least a ``text``
    column to the canonical documents schema. Missing lang/source
    fill from defaults (source falls back to the input file name's
    directory-less stem when not given); n_chars recomputes from the
    text; the result passes ``catalog.schema_violations`` against
    DOCUMENTS_SCHEMA (asserted — the loud boundary)."""
    if "text" not in df.columns:
        raise ValueError(
            f"corpus input has no 'text' column: {df.columns}"
        )
    text = F.col("text").cast("string")
    # ragged inputs (JSONL rows missing keys) surface as NULL cells,
    # not missing columns — fall back PER ROW, not per schema
    file_stem = F.regexp_extract(
        F.input_file_name(), r"([^/]+?)(\.[a-z.]+)?$", 1
    )
    if source is not None:
        src = F.lit(source)
    elif "source" in df.columns:
        src = F.coalesce(F.col("source").cast("string"), file_stem)
    else:
        src = file_stem
    lang = (
        F.coalesce(F.col("lang").cast("string"), F.lit(default_lang))
        if "lang" in df.columns
        else F.lit(default_lang)
    )
    if id_policy == "provided":
        if "doc_id" not in df.columns:
            raise ValueError("id_policy='provided' but no doc_id column")
        doc_id = F.col("doc_id").cast("long")
    elif id_policy == "content_hash":
        doc_id = _content_hash_id(src, text)
    elif id_policy == "load_order":
        doc_id = F.monotonically_increasing_id()
    else:
        raise ValueError(f"unknown id_policy {id_policy!r}")
    out = df.select(
        doc_id.alias("doc_id"),
        text.alias("text"),
        lang.alias("lang"),
        src.alias("source"),
        F.length(text).cast("long").alias("n_chars"),
    ).filter(F.col("text").isNotNull())
    # null text = a malformed input row (e.g. a corrupt JSONL line
    # parsed PERMISSIVE-ly) — dropped at the boundary rather than
    # flowing NULL rows into every downstream text expression
    issues = schema_violations(out, DOCUMENTS_SCHEMA)
    assert not issues, issues
    return out


def read_documents(
    spark: SparkSession,
    path: str,
    fmt: str = "jsonl",
    source: str | None = None,
    default_lang: str = "und",
    id_policy: str = "content_hash",
    whole_files: bool = False,
) -> DataFrame:
    """Read a corpus in any supported format and conform it:
    fmt ∈ {jsonl, csv, text, parquet}."""
    if fmt == "jsonl":
        raw = spark.read.json(path)
    elif fmt == "csv":
        raw = spark.read.option("header", "true").csv(path)
    elif fmt == "text":
        raw = spark.read.text(path, wholetext=whole_files).withColumnRenamed(
            "value", "text"
        )
    elif fmt == "parquet":
        raw = spark.read.parquet(path)
    else:
        raise ValueError(f"unknown corpus format {fmt!r}")
    return conform_documents(
        raw, source=source, default_lang=default_lang, id_policy=id_policy
    )


def write_jsonl(documents: DataFrame, path: str, n_files: int | None = None) -> None:
    """Interop export: the canonical documents frame as JSONL part
    files (one JSON object per line — what tokenizer/training tools
    ingest). ``n_files`` controls output fan-in; default keeps the
    plan's partitioning (no extra shuffle)."""
    out = documents.repartition(n_files) if n_files else documents
    out.write.mode("overwrite").json(path)

"""Streaming near-duplicate admission — the continuous-ingest form of
``operators.dedup.incremental_fuzzy_dedup``.

A crawl/ingest stream keeps only documents with no near-duplicate in
(a) the static seed corpus and (b) everything ADMITTED SO FAR — the
self-extending-history property that distinguishes admission from
per-batch dedup: batch 2's repost of a batch-1 admit must be
rejected even though neither is in the seed corpus.

Shape: foreachBatch over the document stream; each micro-batch runs
the certified batch admission against the accumulated history and
appends its admits to it. The history is TWO append-only parquet
layers, exactly the storage layout the batch op's
``corpus_signatures`` argument anticipates:

- ``sig_dir``  — MinHash signatures (~128 B/doc). Every batch's band
  table builds from THIS, so history text is never re-hashed. One
  seed-corpus signature pass at setup, one signature write per
  admitted batch.
- ``docs_dir`` — admitted documents. Read only by the exact-Jaccard
  verify stage, which semi-joins down to band-collision candidates
  before exploding shingles.

Why foreachBatch and not a stream-static join: admission is a
per-document ALL-bands predicate (reject iff ANY band collides and
the collision verifies). Post-explode that needs a per-doc
aggregation — stateful in a streaming plan — while the history
append makes the "static" side grow per batch, which a stream-static
join snapshot does not re-read mid-query reliably. foreachBatch gives
each micro-batch transactional batch semantics against the history
as of the previous batch (the same contract as StagedMergeSink, this
module's sibling).

Intra-batch near-dups are admitted together (the batch op's
documented scope): within one micro-batch there is no "earlier"
history. Tighten by shrinking the trigger interval, or run
dedup_clusters over the admitted output.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession

from ..operators.dedup import (
    JACCARD_THRESHOLD,
    NUM_BANDS,
    NUM_HASHES,
    incremental_fuzzy_dedup,
    minhash_signatures,
)


def init_admission_history(
    corpus: DataFrame, docs_dir: str, sig_dir: str, num_hashes: int = NUM_HASHES
) -> None:
    """Seed the history layers from the static corpus: one full text
    scan to write signatures, one narrow copy of the documents. Run
    once before starting the stream."""
    corpus.write.mode("overwrite").parquet(docs_dir)
    minhash_signatures(corpus, num_hashes=num_hashes).write.mode(
        "overwrite"
    ).parquet(sig_dir)


def make_admission_batch_fn(
    docs_dir: str,
    sig_dir: str,
    threshold: float = JACCARD_THRESHOLD,
    num_hashes: int = NUM_HASHES,
    num_bands: int = NUM_BANDS,
    verify: bool = True,
    drift_dir: str | None = None,
) -> Callable[[DataFrame, int], None]:
    """foreachBatch function: admit the micro-batch against the
    accumulated history, then extend the history with the admits
    (docs + their signatures). Empty batches short-circuit.

    With ``drift_dir`` set, each batch also appends a per-source
    quality-PSI row (epoch, source, n_baseline, n_current, psi) —
    the distribution-drift gate running NEXT TO the dedup gate: a
    source whose incoming quality slid (broken scraper, spam flood)
    shows up in the drift log the same epoch its documents land."""

    def admit_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        history = spark.read.parquet(docs_dir)
        history_sigs = spark.read.parquet(sig_dir)
        if drift_dir is not None:
            from ..operators.text import quality_psi_frames
            from pyspark.sql import functions as F

            (
                quality_psi_frames(batch_df, history)
                .withColumn("epoch", F.lit(epoch_id))
                .write.mode("append")
                .parquet(drift_dir)
            )
        admitted = incremental_fuzzy_dedup(
            batch_df,
            history,
            threshold=threshold,
            num_hashes=num_hashes,
            num_bands=num_bands,
            corpus_signatures=history_sigs,
            verify=verify,
        ).localCheckpoint(eager=True)  # cut the stream lineage before
        # the two writes below (each would otherwise re-run admission)
        admitted.write.mode("append").parquet(docs_dir)
        minhash_signatures(admitted, num_hashes=num_hashes).write.mode(
            "append"
        ).parquet(sig_dir)

    return admit_batch


def streaming_fuzzy_admission(
    documents: DataFrame,
    docs_dir: str,
    sig_dir: str,
    checkpoint_dir: str,
    threshold: float = JACCARD_THRESHOLD,
    num_hashes: int = NUM_HASHES,
    num_bands: int = NUM_BANDS,
    verify: bool = True,
    drift_dir: str | None = None,
):
    """Start the admission stream: ``documents`` is a streaming
    DataFrame with the documents schema; admitted rows accumulate in
    ``docs_dir`` (which doubles as the curated-corpus sink). Returns
    the StreamingQuery."""
    return (
        documents.writeStream.foreachBatch(
            make_admission_batch_fn(
                docs_dir,
                sig_dir,
                threshold=threshold,
                num_hashes=num_hashes,
                num_bands=num_bands,
                verify=verify,
                drift_dir=drift_dir,
            )
        )
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def main(argv: list[str] | None = None):
    """CLI: run the admission stream over a watched parquet directory.

    python -m flink_ecommerce_spark.streaming.admission \\
        --corpus seed.parquet --incoming /data/incoming \\
        --docs-dir /data/curated --sig-dir /data/curated_sigs

    Seeds the history from --corpus unless the layers already exist
    (restart-safe: the checkpoint + append-only layers resume), then
    admits every arriving file. Returns the StreamingQuery (call
    .awaitTermination() in production; tests drive
    .processAllAvailable())."""
    import argparse
    import os

    from ..schemas import DOCUMENTS_SCHEMA
    from ..session import get_spark

    p = argparse.ArgumentParser(description="streaming near-dup admission")
    p.add_argument("--corpus", required=True, help="seed corpus parquet")
    p.add_argument("--incoming", required=True, help="watched parquet dir")
    p.add_argument("--docs-dir", required=True)
    p.add_argument("--sig-dir", required=True)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--threshold", type=float, default=JACCARD_THRESHOLD)
    p.add_argument("--drift-dir", default=None,
                   help="append per-epoch per-source quality-PSI rows here")
    p.add_argument("--no-verify", action="store_true",
                   help="band-collision-only admission (no corpus text reads)")
    p.add_argument("--max-files-per-trigger", type=int, default=16)
    p.add_argument("--format", choices=["parquet", "jsonl"], default="parquet",
                   help="incoming file format; jsonl rows need only a "
                        "'text' field (ids content-hashed, lang/source "
                        "defaulted per row)")
    p.add_argument("--await", dest="await_termination", action="store_true")
    args = p.parse_args(argv)

    spark = get_spark("fuzzy-admission")
    # (re)seed when EITHER layer is missing — a partial init (docs
    # written, signatures not) must not start a stream that would
    # fail on its first band build
    if not (os.path.exists(args.docs_dir) and os.path.exists(args.sig_dir)):
        init_admission_history(
            spark.read.parquet(args.corpus), args.docs_dir, args.sig_dir
        )
    if args.format == "jsonl":
        from ..sources.corpus import conform_documents

        raw = (
            spark.readStream.schema("text string, lang string, source string")
            .option("maxFilesPerTrigger", str(args.max_files_per_trigger))
            .json(args.incoming)
        )
        stream = conform_documents(raw)
    else:
        stream = (
            spark.readStream.schema(DOCUMENTS_SCHEMA)
            .option("maxFilesPerTrigger", str(args.max_files_per_trigger))
            .parquet(args.incoming)
        )
    q = streaming_fuzzy_admission(
        stream,
        args.docs_dir,
        args.sig_dir,
        args.checkpoint,
        threshold=args.threshold,
        verify=not args.no_verify,
        drift_dir=args.drift_dir,
    )
    if args.await_termination:
        q.awaitTermination()
    return q


if __name__ == "__main__":
    main()

"""Benchmark runner: times the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is timed as a full collect() (plan + execute + fetch), the
same work the driver's correctness gate does. A tiny warmup query
first so JVM/codegen startup isn't billed to the first query.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from flink_ecommerce_spark import registry  # noqa: E402
from flink_ecommerce_spark.session import get_spark  # noqa: E402


def _streaming_replay(spark, sf_dir: str) -> float:
    """Replay the events table through the 4-branch streaming job
    (memory upsert sinks) and return wall seconds. Throughput =
    n_events / this value; BASELINE.md targets ≥ 10k events/s."""
    import tempfile

    from pyspark.sql import functions as F

    from flink_ecommerce_spark import catalog
    from flink_ecommerce_spark.streaming.runner import StreamingJob, reference_branches
    from flink_ecommerce_spark.streaming.sinks import MemoryUpsertSink

    events = catalog.table(spark, sf_dir, "events")
    # events.ts arrives as TIMESTAMP(NANOS)-read-as-long OR as a real
    # timestamp depending on how the fixture parquet was written —
    # probe the RAW parquet schema (catalog.table already normalizes
    # its own output, so probe the file, not the catalog)
    raw_schema = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).schema
    ts_type = dict((f.name, f.dataType.simpleString())
                   for f in raw_schema.fields)["ts"]
    stream = (
        spark.readStream.schema(f"event_id long, ts {ts_type}, user_id long, "
                                "event_type string, value double, props string")
        .option("pathGlobFilter", "events.parquet")  # file source wants a dir
        .parquet(sf_dir)
    )
    if ts_type == "bigint":  # int64 nanos → micros, like catalog.table
        stream = stream.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    branches = reference_branches(
        ts_col="ts", category_col="event_type", amount_col="value",
        id_col="event_id", user_col="user_id",
    )
    ckpt = tempfile.mkdtemp(prefix="bench_ckpt_")
    t0 = time.perf_counter()
    job = StreamingJob(
        source=stream,
        sink_factory=lambda b: MemoryUpsertSink(b.key_cols),
        branches=branches,
        checkpoint_root=ckpt,
        trigger_ms=200,
    ).start()
    job.process_available()
    wall = time.perf_counter() - t0
    job.stop()
    n = events.count()
    print(  # human-visible context line on stderr, JSON stays clean
        f"streaming replay: {n} events in {wall:.1f}s = {n / wall:,.0f} events/s",
        file=sys.stderr,
    )
    return wall


def _ann_band_bench(spark, sf_dir: str, timings: dict[str, float], reps: int) -> None:
    """lsh_plan_for's cost/recall tradeoff with wall-clock numbers:
    time ann_lsh_topk at the test-scale plan (8 planes, 1 band) and
    the scale plan (16 planes, 4 bands), and print recall@k of each
    against the exact brute-force top-k. More planes → smaller
    buckets (cheaper candidate sets at large corpora); more bands →
    independent bucketings whose candidates union (recall back)."""
    from flink_ecommerce_spark import catalog
    from flink_ecommerce_spark.operators import similarity

    emb = catalog.table(spark, sf_dir, "embeddings")
    truth: dict[int, set[int]] = {}
    for r in similarity.knn_bruteforce(emb).collect():
        truth.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    # grid so the two knobs read separately: planes = bucket size
    # (cost), bands = independent bucketings unioned (recall). The
    # (16, *) rows are the large-corpus plan — at THIS corpus size
    # they cost more and recall less, which is exactly why
    # lsh_plan_for sizes planes from corpus/target occupancy; its
    # recommendation for this corpus runs as the last row.
    plan = similarity.lsh_plan_for(emb.count())
    for planes, bands in (
        (similarity.N_PLANES, 1),
        (similarity.N_PLANES, 4),
        (16, 1),
        (16, 4),
        plan,
    ):
        name = f"ann_lsh_{planes}p_{bands}b"
        best, rows = float("inf"), []
        for _ in range(reps):
            t0 = time.perf_counter()
            rows = similarity.ann_lsh_topk(
                emb, n_planes=planes, n_bands=bands
            ).collect()
            best = min(best, time.perf_counter() - t0)
        # the full grid prints to stderr; the JSON records only the
        # oracle config and lsh_plan_for's recommendation — the other
        # rows are deliberately mis-sized teaching points and would
        # pollute the headline total
        if (planes, bands) in ((similarity.N_PLANES, 1), plan):
            timings[name] = round(best, 3)
        got: dict[int, set[int]] = {}
        for r in rows:
            got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        recalls = [
            len(got.get(q, set()) & nbrs) / len(nbrs)
            for q, nbrs in truth.items()
            if nbrs
        ]
        recall = sum(recalls) / len(recalls) if recalls else 0.0
        print(
            f"{name}: {best:.3f}s, recall@{similarity.DEFAULT_K} = {recall:.3f}",
            file=sys.stderr,
        )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf

    spark = get_spark(
        "bench", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    # warmup: JVM, codegen, and the parquet reader path off the clock
    spark.range(1000).selectExpr("sum(id)").collect()
    from flink_ecommerce_spark import catalog

    catalog.table(spark, sf_dir, "events").limit(10).collect()

    # min-of-N: local single-JVM timings swing ±25% on GC/codegen
    # hiccups; three reps keeps the recorded number close to the
    # plan's true cost at ~8s extra wall for the whole suite
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
    timings: dict[str, float] = {}
    for name, fn in registry.bench_queries().items():
        best = float("inf")
        try:
            for _ in range(reps):  # min-of-N damps JVM/GC noise
                t0 = time.perf_counter()
                fn(spark, sf_dir).collect()
                best = min(best, time.perf_counter() - t0)
            timings[name] = round(best, 3)
        except Exception as e:  # one broken query must not lose the run
            print(f"bench query {name} FAILED: {e}", file=sys.stderr)

    try:
        _ann_band_bench(spark, sf_dir, timings, reps)
    except Exception as e:
        print(f"ann_band_bench FAILED: {e}", file=sys.stderr)

    try:
        timings["streaming_replay"] = round(_streaming_replay(spark, sf_dir), 3)
    except Exception as e:
        print(f"streaming_replay FAILED: {e}", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf_val,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()

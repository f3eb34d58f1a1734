"""One-off 100x scaling probe (two orders of magnitude past the bench
fixture, ~= sf10: 500k documents, 200k embeddings, 100x-replicated
TPC-H/event tables) through the SAME `_scale_rehearsal` chain bench.py
runs at 10x every round. Not part of the per-round bench (the driver's
budget stays bounded); run by hand on a quiet host and record the
scaling curve 10x -> 100x in EXPLAIN.md. Planners must move again at
100x (lsh planes/bands, semdedup bits, simhash bands, the exact-pairs
crossover stays flipped to LSH candidates).

Usage: python tools/rehearsal_100x.py   (~20-40 min on local[32])
"""

import json
import os
import sys

os.environ["SPARK_GRAFT_REHEARSAL_REPS"] = os.environ.get(
    "SPARK_GRAFT_REHEARSAL_REPS", "100"
)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from flink_ecommerce_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ["SPARK_GRAFT_REHEARSAL_REPS"])
    # Scale the INITIAL shuffle-partition count with the corpus and
    # let AQE coalesce back down — session.py's stated cluster rule
    # (~128 MB per task post-coalesce, never a fixed constant). At a
    # fixed 32, a 100x corpus puts 1-2 GB in each shuffle partition
    # and the per-partition aggregation hash maps spill: the first
    # 100x probe run measured minhash_signatures 78x and
    # countmin_sketch 94x their 10x walls on 10x the data, while the
    # bounded-state sketches (HLL 0.9 s, KMV 1.1 s) stayed flat.
    # Opt out with SPARK_GRAFT_FIXED_PARTITIONS=1 to reproduce the
    # fixed-32 curve.
    shuffle_parts = None
    if os.environ.get("SPARK_GRAFT_FIXED_PARTITIONS") != "1":
        shuffle_parts = max(32, 32 * reps // 10)
    spark = get_spark(
        "rehearsal100x",
        shuffle_partitions=shuffle_parts,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.range(1000).selectExpr("sum(id)").collect()
    stat0 = bench._cpu_window_snapshot()
    out = bench._scale_rehearsal(spark, sf_dir)
    window = bench._cpu_window_pcts(stat0, bench._cpu_window_snapshot())
    out["window"] = window
    probe = bench._cpu_probe()
    par_ratio = round(bench._cpu_probe_parallel() / probe, 2) if probe else None
    steal = window.get("window_steal_pct", 0.0)
    state = "contended" if (steal >= 2.0 or (par_ratio or 1.0) >= 3.0) else "clean"
    out["canary"] = f"{state}(steal={steal}%,par/serial={par_ratio})"
    print(json.dumps(out))


if __name__ == "__main__":
    main()

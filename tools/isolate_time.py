"""Isolated timing harness (guide §1.4): time one operator thunk with
the noop sink (or its natural collect) N times in a fresh session,
sampling /proc/stat around each rep so host storms are visible next to
each number instead of silently polluting it.

Usage: python tools/isolate_time.py <reps> <name> [name ...]
Names map to thunks defined in THUNKS below (10x rehearsal corpus
staged by a previous bench run, or sf0.1 for headline queries).
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

def _stage_10x() -> str:
    """The 10x rehearsal staging dir: $SPARK_GRAFT_STAGE_10X, else the
    newest complete /tmp/bench_rehearsal_* left by a bench run (r09
    ADVICE: a hardcoded ephemeral path silently broke every *_10x
    thunk once that one run's dir was cleaned up)."""
    import glob
    import os

    env = os.environ.get("SPARK_GRAFT_STAGE_10X")
    if env:
        if not Path(env).is_dir():
            raise SystemExit(f"SPARK_GRAFT_STAGE_10X={env} is not a directory")
        return env
    need = {"documents.parquet", "embeddings.parquet", "events.parquet",
            "lineitem.parquet", "orders.parquet"}
    cands = [
        d for d in sorted(
            glob.glob("/tmp/bench_rehearsal_*"),
            key=lambda p: Path(p).stat().st_mtime,
            reverse=True,
        )
        if need <= {p.name for p in Path(d).iterdir()}
    ]
    if not cands:
        raise SystemExit(
            "no complete /tmp/bench_rehearsal_* staging dir found — run "
            "bench.py once (or point SPARK_GRAFT_STAGE_10X at one)"
        )
    return cands[0]


STAGE_10X = _stage_10x()
SF01 = "/root/testdata/sf0.1"


def _stat():
    with open("/proc/stat") as f:
        return list(map(int, f.readline().split()[1:]))


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    reps = int(sys.argv[1])
    names = sys.argv[2:]

    from flink_ecommerce_spark import catalog, registry
    from flink_ecommerce_spark.session import get_spark

    spark = get_spark(
        "isolate", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    spark.range(1000).selectExpr("sum(id)").collect()
    catalog.table(spark, SF01, "events").limit(10).collect()

    docs10 = lambda: catalog.table(spark, STAGE_10X, "documents")  # noqa: E731
    emb10 = lambda: catalog.table(spark, STAGE_10X, "embeddings")  # noqa: E731
    ev10 = lambda: catalog.table(spark, STAGE_10X, "events")  # noqa: E731

    from flink_ecommerce_spark.operators import (  # noqa: F401
        classifier, clustering, dedup, packing, similarity, text,
    )
    from flink_ecommerce_spark.plans import temporal

    THUNKS = {
        "markov_10x": lambda: temporal.markov_attribution(ev10()).collect(),
        "lsh_pairs_10x": lambda: noop(dedup.lsh_candidate_pairs(docs10())),
        "dedup_clusters_10x": lambda: noop(dedup.dedup_clusters(docs10())),
        "semdedup_10x_noop": lambda: noop(
            similarity.semantic_dedup(emb10(), extra_bits=1)
        ),
        "semdedup_10x_count": lambda: similarity.semantic_dedup(
            emb10(), extra_bits=1
        ).count(),
        "winnow_10x_noop": lambda: noop(dedup.winnowing_fingerprints(docs10())),
        "calib_10x": lambda: classifier.calibration_by_margin(docs10()).collect(),
        "epoch_shuffle_10x_noop": lambda: noop(packing.epoch_shuffle(docs10())),
        "epoch_shuffle_10x_count": lambda: packing.epoch_shuffle(docs10()).count(),
        "seqpack_10x_noop": lambda: noop(packing.sequence_packing(docs10())),
        "kn_trigram_10x": lambda: noop(text.kn_trigram_surprisal(docs10())),
        "pagerank_10x": lambda: registry.SPECS["supplier_pagerank"]
        .fn(spark, STAGE_10X)
        .count(),
        "item_neighbors_10x": lambda: noop(
            registry.SPECS["item_neighbors_topk"].fn(spark, STAGE_10X)
        ),
    }
    for n, spec in sorted(registry.SPECS.items()):
        THUNKS.setdefault(
            f"q_{n}",
            (lambda s: lambda: s.fn(spark, SF01).collect())(spec),
        )

    for name in names:
        thunk = THUNKS[name]
        best = float("inf")
        for i in range(reps):
            a = _stat()
            t0 = time.perf_counter()
            thunk()
            dt = time.perf_counter() - t0
            b = _stat()
            d = [y - x for x, y in zip(a, b)]
            tot = sum(d) or 1
            print(
                f"{name} rep{i}: {dt:7.2f}s  steal%={d[7] / tot * 100:.1f} "
                f"sys%={d[2] / tot * 100:.1f} idle%={d[3] / tot * 100:.1f}",
                flush=True,
            )
            best = min(best, dt)
        print(f"{name} BEST: {best:.2f}s", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()

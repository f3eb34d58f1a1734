"""Streaming anomaly scores (applyInPandasWithState): Welford state
carries the per-type baseline across micro-batches; emitted z-scores
match the pure-Python online reference fed the same arrival order.
"""

from __future__ import annotations

import datetime as dt

from flink_ecommerce_spark.streaming.anomaly import (
    MIN_BASELINE,
    streaming_anomaly_scores,
    welford_score_and_update,
)


def test_welford_reference_matches_batch_stats():
    """The online accumulator must agree with numpy's two-pass stats
    and the scores must use the pre-update baseline."""
    import numpy as np

    vals = [3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0]
    scores, base_ns, n, mean, m2 = welford_score_and_update(vals, 0, 0.0, 0.0, 3)
    assert base_ns == list(range(len(vals)))
    assert n == len(vals)
    assert abs(mean - np.mean(vals)) < 1e-12
    assert abs(m2 - np.sum((np.array(vals) - np.mean(vals)) ** 2)) < 1e-9
    # first 3 scores: no baseline yet
    assert scores[:3] == [None, None, None]
    # 4th value scored against stats of the first 3 only
    pre = np.array(vals[:3])
    expect = (vals[3] - pre.mean()) / pre.std(ddof=1)
    assert abs(scores[3] - round(expect, 6)) < 2e-6


def _write_chunk(spark, path, rows, chunk):
    df = spark.createDataFrame(
        rows, "event_type string, ts timestamp, event_id long, value double"
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{path}/chunk={chunk}")


def test_streaming_scores_match_reference_across_batches(spark, tmp_path):
    base = dt.datetime(2024, 1, 1, 10, 0, 0)

    def ev(etype, i, v):
        return (etype, base + dt.timedelta(seconds=i), i, float(v))

    # type "a": stable baseline in chunk 1, a spike in chunk 2 —
    # state must persist across the micro-batch boundary
    a_vals1 = [10.0, 11.0, 9.0, 10.0, 10.5]
    a_vals2 = [10.0, 50.0]
    chunk1 = [ev("a", i, v) for i, v in enumerate(a_vals1)]
    chunk1.append(ev("b", 0, 1.0))  # second key: never reaches baseline
    # a NULL value must score NULL and NOT fold into (or poison) the
    # baseline — the later real spike still gets its >10 z-score
    chunk2 = [("a", base + dt.timedelta(seconds=9), 9, None)]
    chunk2 += [ev("a", 10 + i, v) for i, v in enumerate(a_vals2)]

    src = str(tmp_path / "src")
    _write_chunk(spark, src, chunk1, 1)
    stream = (
        spark.readStream.schema(
            "event_type string, ts timestamp, event_id long, value double"
        )
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{src}/chunk=*")
    )
    q = (
        streaming_anomaly_scores(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("anomaly_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    _write_chunk(spark, src, chunk2, 2)
    q.processAllAvailable()
    q.stop()

    rows = {
        (r["event_type"], r["event_id"]): r
        for r in spark.sql("SELECT * FROM anomaly_out").collect()
    }
    assert len(rows) == len(chunk1) + len(chunk2)

    # reference: same arrival order (ts order within each batch)
    ref1, _, n, mean, m2 = welford_score_and_update(
        a_vals1, 0, 0.0, 0.0, MIN_BASELINE
    )
    ref2, _, n, mean, m2 = welford_score_and_update(
        a_vals2, n, mean, m2, MIN_BASELINE
    )
    got_a = [rows[("a", i)]["z_score"] for i in range(5)] + [
        rows[("a", 10 + i)]["z_score"] for i in range(2)
    ]
    assert got_a == ref1 + ref2
    # the spike is loud, the normal value is quiet
    assert rows[("a", 11)]["z_score"] > 10
    assert abs(rows[("a", 10)]["z_score"]) < 1
    # the NULL event is emitted unscored and left out of the baseline
    assert rows[("a", 9)]["z_score"] is None
    # baseline_n counts observations BEFORE each event, across batches;
    # the NULL at event 9 did not increment it
    assert rows[("a", 9)]["baseline_n"] == 5
    assert rows[("a", 10)]["baseline_n"] == 5
    assert rows[("a", 11)]["baseline_n"] == 6
    # key "b" never reaches MIN_BASELINE: emitted with NULL score
    assert rows[("b", 0)]["z_score"] is None


def test_anomaly_state_survives_restart(spark, tmp_path):
    """Kill the stream after batch 1, start a NEW query on the same
    checkpoint: the Welford baseline continues from the state store
    (the spike's z uses batch 1's five observations), instead of
    resetting to no-baseline NULLs."""
    base = dt.datetime(2024, 1, 1, 10, 0, 0)

    def ev(i, v):
        return ("a", base + dt.timedelta(seconds=i), i, float(v))

    a_vals1 = [10.0, 11.0, 9.0, 10.0, 10.5]
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    _write_chunk(spark, src, [ev(i, v) for i, v in enumerate(a_vals1)], 1)

    out = str(tmp_path / "out")

    def start():
        stream = (
            spark.readStream.schema(
                "event_type string, ts timestamp, event_id long, value double"
            )
            .option("maxFilesPerTrigger", "1")
            .parquet(f"{src}/chunk=*")
        )
        return (
            streaming_anomaly_scores(stream)
            .writeStream.outputMode("append")
            .format("parquet")  # memory sink cannot recover from a checkpoint
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .start()
        )

    q1 = start()
    q1.processAllAvailable()
    q1.stop()

    _write_chunk(spark, src, [ev(10, 50.0)], 2)
    q2 = start()
    q2.processAllAvailable()
    q2.stop()

    rows = spark.read.parquet(out).collect()
    assert len(rows) == 6  # batch 1's five + the spike, no re-emits
    spike = max(rows, key=lambda r: r["event_id"])
    assert spike["baseline_n"] == 5  # batch 1's state survived
    ref, *_ = welford_score_and_update([50.0], *_state_after(a_vals1))
    assert spike["z_score"] == ref[0]
    assert spike["z_score"] > 10


def _state_after(vals):
    _, _, n, mean, m2 = welford_score_and_update(vals, 0, 0.0, 0.0, MIN_BASELINE)
    return n, mean, m2, MIN_BASELINE

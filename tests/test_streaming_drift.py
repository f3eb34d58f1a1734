"""Streaming PSI drift monitor: the replayed stream's final PSI
equals the batch computation over the same rows (count addition
commutes with micro-batching), state is structurally bounded, and a
genuinely shifted stream alarms while a matching one doesn't."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from flink_ecommerce_spark.streaming.drift import (
    baseline_value_buckets,
    psi_vs_baseline,
    streaming_value_buckets,
)

SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def _rows(values, etype="t", start_id=0):
    d0 = dt.datetime(2024, 1, 1, 12, 0)
    return [
        (start_id + i, d0, 1, etype, float(v), "{}")
        for i, v in enumerate(values)
    ]


def test_streaming_psi_converges_to_batch(spark, tmp_path):
    src = str(tmp_path / "ev")
    chunk1 = _rows([5.0] * 30 + [25.0] * 10)
    chunk2 = _rows([5.0] * 10 + [95.0] * 30, start_id=100)
    spark.createDataFrame(chunk1, SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{src}/chunk=1")
    spark.createDataFrame(chunk2, SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{src}/chunk=2")

    baseline = baseline_value_buckets(
        spark.createDataFrame(_rows([5.0] * 30 + [25.0] * 10), SCHEMA)
    )

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{src}/chunk=*")
    )
    q = (
        streaming_value_buckets(stream)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("drift_counts")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    final_counts = spark.sql("SELECT * FROM drift_counts")
    got = {
        r["event_type"]: r
        for r in psi_vs_baseline(final_counts, baseline).collect()
    }

    batch_counts = streaming_value_buckets(
        spark.createDataFrame(chunk1 + chunk2, SCHEMA)
    )
    want = {
        r["event_type"]: r
        for r in psi_vs_baseline(batch_counts, baseline).collect()
    }
    assert got.keys() == want.keys()
    for k in got:
        assert got[k]["psi"] == want[k]["psi"]
    # state bound: counts table never exceeds types x buckets
    assert final_counts.count() <= 1 * 10


def test_streaming_psi_alarms_on_shift_only(spark):
    """Identical distribution → psi ~ 0; mass moved to a far bucket
    → psi over the 0.25 'shifted' bar."""
    base_rows = _rows([5.0] * 20 + [25.0] * 20)
    baseline = baseline_value_buckets(
        spark.createDataFrame(base_rows, SCHEMA)
    )
    same = streaming_value_buckets(
        spark.createDataFrame(base_rows, SCHEMA)
    )
    shifted = streaming_value_buckets(
        spark.createDataFrame(_rows([95.0] * 40), SCHEMA)
    )
    psi_same = psi_vs_baseline(same, baseline).collect()[0]["psi"]
    psi_shift = psi_vs_baseline(shifted, baseline).collect()[0]["psi"]
    assert psi_same < 0.01
    assert psi_shift > 0.25


def test_psi_vs_baseline_handles_one_sided_types(spark):
    """A type seen only in the stream (or only in the baseline) still
    gets a finite PSI row via the full-outer grid + smoothing."""
    baseline = baseline_value_buckets(
        spark.createDataFrame(_rows([5.0] * 10, etype="old"), SCHEMA)
    )
    current = streaming_value_buckets(
        spark.createDataFrame(_rows([5.0] * 10, etype="new"), SCHEMA)
    )
    got = {
        r["event_type"]: r
        for r in psi_vs_baseline(current, baseline).collect()
    }
    assert set(got) == {"old", "new"}
    import math

    assert all(math.isfinite(r["psi"]) for r in got.values())


def test_streaming_benford_converges_to_batch(spark, tmp_path):
    """The replayed stream's final Benford table equals the batch
    screen over the same rows (count addition commutes with
    micro-batching); state is #types x 9 by construction."""
    from flink_ecommerce_spark.plans.analytics import value_benford_by_type
    from flink_ecommerce_spark.streaming.drift import (
        benford_report,
        streaming_digit_counts,
    )

    src = str(tmp_path / "bev")
    chunk1 = _rows([19.99] * 20 + [34.5] * 10)
    chunk2 = _rows([7.25] * 15 + [19.99] * 5, start_id=100)
    spark.createDataFrame(chunk1, SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{src}/chunk=1")
    spark.createDataFrame(chunk2, SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{src}/chunk=2")
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{src}/chunk=*")
    )
    q = (
        streaming_digit_counts(stream)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("benford_counts")
        .option("checkpointLocation", str(tmp_path / "bckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    final_counts = spark.sql("SELECT * FROM benford_counts")
    # bounded state: #types x 9 rows max
    assert final_counts.count() <= 1 * 9
    streamed = {
        (r["event_type"], r["digit"]): tuple(r)
        for r in benford_report(final_counts).collect()
    }
    batch = {
        (r["event_type"], r["digit"]): tuple(r)
        for r in value_benford_by_type(
            spark.createDataFrame(chunk1 + chunk2, SCHEMA)
        ).collect()
    }
    assert streamed == batch

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


DOCS_SCHEMA = "doc_id long, text string, lang string, source string, n_chars int"


def test_streaming_value_ks_converges_to_batch(spark, tmp_path):
    """Replayed stream's final KS == the batch core over the same
    rows (split counts sum, so accumulation commutes with
    micro-batching), and the count-table state honors the grid
    bound."""
    import datetime as dt

    from flink_ecommerce_spark.streaming.drift import (
        ks_vs_split,
        streaming_value_split_counts,
    )

    split = dt.datetime(2024, 1, 2, 0, 0)
    d0 = dt.datetime(2024, 1, 1, 12, 0)
    d1 = dt.datetime(2024, 1, 3, 12, 0)
    rows1 = [(i, d0, 1, "t", float(v), "{}") for i, v in enumerate([5.0] * 20 + [25.0] * 20)]
    rows2 = [(100 + i, d1, 1, "t", float(v), "{}") for i, v in enumerate([5.0] * 5 + [95.0] * 35)]
    src = str(tmp_path / "ks_ev")
    spark.createDataFrame(rows1, SCHEMA).coalesce(1).write.mode("overwrite").parquet(f"{src}/chunk=1")
    spark.createDataFrame(rows2, SCHEMA).coalesce(1).write.mode("overwrite").parquet(f"{src}/chunk=2")

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{src}/chunk=*")
    )
    q = (
        streaming_value_split_counts(stream, split)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("ks_counts")
        .option("checkpointLocation", str(tmp_path / "ks_ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    final_counts = spark.sql("SELECT * FROM ks_counts")
    got = {r["event_type"]: r for r in ks_vs_split(final_counts).collect()}

    batch_counts = streaming_value_split_counts(
        spark.createDataFrame(rows1 + rows2, SCHEMA), split
    )
    want = {r["event_type"]: r for r in ks_vs_split(batch_counts).collect()}
    assert got.keys() == want.keys()
    for k in got:
        assert got[k].asDict() == want[k].asDict()
    # the shifted second half must alarm: baseline had 50% mass at
    # 5.0; current has 12.5% -> D well above 0.3
    assert got["t"]["d_stat_micro"] > 300_000
    # state bound: one row per (type, distinct cents), not per event
    assert final_counts.count() <= 1 * 3


def test_streaming_value_ks_matches_distribution_scores_low(spark):
    """An identically-distributed second half scores D ~ 0 — the
    monitor alarms on shift, not on volume."""
    import datetime as dt

    from flink_ecommerce_spark.streaming.drift import (
        ks_vs_split,
        streaming_value_split_counts,
    )

    split = dt.datetime(2024, 1, 2)
    d0, d1 = dt.datetime(2024, 1, 1), dt.datetime(2024, 1, 3)
    vals = [5.0] * 30 + [25.0] * 10
    rows = [(i, d0, 1, "t", v, "{}") for i, v in enumerate(vals)] + [
        (100 + i, d1, 1, "t", v, "{}") for i, v in enumerate(vals)
    ]
    counts = streaming_value_split_counts(
        spark.createDataFrame(rows, SCHEMA), split
    )
    [r] = ks_vs_split(counts).collect()
    assert r["d_stat_micro"] == 0
    assert (r["n_baseline"], r["n_current"]) == (40, 40)


def test_streaming_quality_ks_converges_to_batch(spark, tmp_path):
    """The accumulated streaming quality counts produce the exact
    batch quality_ks_by_source report over the same documents."""
    from flink_ecommerce_spark.operators.text import quality_ks_by_source
    from flink_ecommerce_spark.streaming.drift import (
        quality_ks_report,
        streaming_quality_counts,
    )

    rows = []
    for i in range(40):
        src = "clean" if i % 2 == 0 else "spam"
        text = (
            "the quick brown fox jumps over the lazy dog again and again"
            if src == "clean"
            else "buy now!!! buy now!!! buy now!!! $$$"
        )
        rows.append((i, text, "en", src, len(text)))
    docs = spark.createDataFrame(rows, DOCS_SCHEMA)

    src_dir = str(tmp_path / "ks_docs")
    docs.filter(F.col("doc_id") < 20).coalesce(1).write.mode("overwrite").parquet(f"{src_dir}/chunk=1")
    docs.filter(F.col("doc_id") >= 20).coalesce(1).write.mode("overwrite").parquet(f"{src_dir}/chunk=2")
    stream = (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{src_dir}/chunk=*")
    )
    q = (
        streaming_quality_counts(stream)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("qks_counts")
        .option("checkpointLocation", str(tmp_path / "qks_ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    final_counts = spark.sql("SELECT * FROM qks_counts")
    got = {r["source"]: r.asDict() for r in quality_ks_report(final_counts).collect()}
    want = {r["source"]: r.asDict() for r in quality_ks_by_source(docs).collect()}
    assert got == want
    # both sources deviate from the pooled corpus symmetrically
    assert got["spam"]["d_stat_micro"] > 400_000
    # state bound: one row per (source, occupied grid value)
    assert final_counts.count() <= 2 * 2


# ----------------------------------------------------- sf0.01 equivalence
# VERDICT r08 #7: the streaming KS twins' final state must reproduce
# the CERTIFIED batch rows on the driver's own gate fixture (sf0.01),
# through a real multi-micro-batch replay — cheap insurance that the
# localCheckpoint materialization boundaries in streaming/drift.py
# never drift from the batch plans.

SF001 = "/root/testdata/sf0.01"


def test_streaming_value_ks_equals_certified_batch_sf001(spark, tmp_path):
    import pyspark.sql.functions as F

    from flink_ecommerce_spark import catalog
    from flink_ecommerce_spark.plans.analytics import value_ks_by_type
    from flink_ecommerce_spark.streaming.drift import (
        ks_vs_split,
        streaming_value_split_counts,
    )

    events = catalog.table(spark, SF001, "events")
    # the batch op splits at the data's own date midpoint — feed the
    # SAME boundary to the stream (to_date(ts) < mid == ts < mid@00:00)
    b = events.agg(
        F.min(F.to_date("ts")).alias("lo"), F.max(F.to_date("ts")).alias("hi")
    ).collect()[0]
    import datetime as dt

    mid = b["lo"] + dt.timedelta(days=(b["hi"] - b["lo"]).days // 2)
    split_ts = dt.datetime(mid.year, mid.month, mid.day)

    src = str(tmp_path / "ev001")
    for chunk in range(3):
        (
            events.filter(F.col("event_id") % 3 == chunk)
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(f"{src}/chunk={chunk}")
        )
    schema = events.schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{src}/chunk=*")
    )
    q = (
        streaming_value_split_counts(stream, split_ts)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("ks_sf001")
        .option("checkpointLocation", str(tmp_path / "ks001_ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = sorted(
        map(
            tuple,
            ks_vs_split(spark.sql("SELECT * FROM ks_sf001")).collect(),
        )
    )
    want = sorted(map(tuple, value_ks_by_type(events).collect()))
    assert got == want


def test_streaming_quality_ks_equals_certified_batch_sf001(spark, tmp_path):
    import pyspark.sql.functions as F

    from flink_ecommerce_spark import catalog
    from flink_ecommerce_spark.operators.text import quality_ks_by_source
    from flink_ecommerce_spark.streaming.drift import (
        quality_ks_report,
        streaming_quality_counts,
    )

    docs = catalog.table(spark, SF001, "documents")
    src = str(tmp_path / "docs001")
    for chunk in range(3):
        (
            docs.filter(F.col("doc_id") % 3 == chunk)
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(f"{src}/chunk={chunk}")
        )
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{src}/chunk=*")
    )
    q = (
        streaming_quality_counts(stream)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("qks_sf001")
        .option("checkpointLocation", str(tmp_path / "qks001_ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = sorted(
        map(
            tuple,
            quality_ks_report(spark.sql("SELECT * FROM qks_sf001")).collect(),
        )
    )
    want = sorted(map(tuple, quality_ks_by_source(docs).collect()))
    assert got == want

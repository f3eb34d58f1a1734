"""Partitioned layout: round trip, partition pruning visible in the
plan, and a hypothesis property test for the engine-portable hash."""

from __future__ import annotations

import hashlib

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from flink_ecommerce_spark import catalog
from flink_ecommerce_spark.functions.portable import sql_hash32
from flink_ecommerce_spark.sources.layout import (
    read_events_partitioned,
    write_events_partitioned,
)

from tests.conftest import SF_SMALL


def test_partitioned_roundtrip_and_pruning(spark, tmp_path):
    events = catalog.table(spark, SF_SMALL, "events")
    out = str(tmp_path / "events_by_day")
    write_events_partitioned(events, out)

    back = read_events_partitioned(spark, out)
    assert back.count() == events.count()

    pruned = back.filter(F.col("dt") == "2024-01-05")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(dt" in plan, plan[:800]
    expected = events.filter(F.to_date("ts") == "2024-01-05").count()
    assert pruned.count() == expected


@settings(max_examples=200, deadline=None)
@given(st.text(min_size=0, max_size=60))
def test_portable_hash_matches_python_and_duckdb(s):
    """hash32 contract: int(md5[:8], 16) identical in python/duckdb
    (the Spark side is covered by every oracle test using hash32)."""
    expected = int(hashlib.md5(s.encode("utf-8")).hexdigest()[:8], 16)
    con = duckdb.connect()
    got = con.execute(
        f"SELECT {sql_hash32('s')} FROM (SELECT ? AS s)", [s]
    ).fetchone()[0]
    con.close()
    assert got == expected, repr(s)

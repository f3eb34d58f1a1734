"""Typed-oracle gates (VERDICT r06 #2).

The external driver hashes *typed* materializations, so a DuckDB
oracle column typed HUGEINT (``SUM(BIGINT)``) fails the value hash
against Spark's int64 even when every value matches — and a
``fetchall()``-based local gate cannot see it. These tests make the
bug class fail locally:

1. ``typed_mismatches`` red-flags a deliberately-uncast
   ``SUM(BIGINT)`` oracle (the canary the verdict asked for).
2. Registry-wide invariant: NO oracle's Arrow schema contains a
   decimal/HUGEINT column — every integer aggregate in a final
   projection must be ``CAST(... AS BIGINT)`` (COVERAGE.md, "Oracle
   encoding rule").

Both run DuckDB-only at sf0.001 (no Spark session), so the whole
module is sub-second per oracle and safe in the default test run.
"""

from __future__ import annotations

import os

import duckdb
import pytest
from pyspark.sql import types as T

from flink_ecommerce_spark import registry
from flink_ecommerce_spark.typed_check import (
    canonical_arrow,
    typed_mismatches,
)

SF = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part partsupp orders lineitem "
    "events documents embeddings"
).split()


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        p = f"{SF}/{t}.parquet"
        if os.path.exists(p):
            c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return c


def test_uncast_sum_bigint_is_red_flagged(con):
    """The canary: an oracle with a bare SUM over BIGINT must trip the
    typed gate — DuckDB types it HUGEINT → Arrow decimal128(38, 0)."""
    bad = con.execute(
        "SELECT o_custkey, SUM(o_totalkey) AS n FROM "
        "(SELECT o_custkey, CAST(1 AS BIGINT) AS o_totalkey FROM orders) "
        "GROUP BY 1"
    ).arrow()
    spark_schema = T.StructType(
        [
            T.StructField("o_custkey", T.LongType()),
            T.StructField("n", T.LongType()),
        ]
    )
    mis = typed_mismatches(spark_schema, bad.schema)
    assert mis == ["n: spark=int64 oracle=decimal(38,0)"], mis


def test_cast_sum_passes(con):
    good = con.execute(
        "SELECT CAST(SUM(CAST(1 AS BIGINT)) AS BIGINT) AS n FROM orders"
    ).arrow()
    spark_schema = T.StructType([T.StructField("n", T.LongType())])
    assert typed_mismatches(spark_schema, good.schema) == []


def test_no_oracle_emits_decimal_or_float32(con):
    """Registry-wide: every oracle's Arrow schema is free of decimal
    (HUGEINT / uncast integer aggregates) and float32 columns. This is
    the full landmine sweep — the 13 r06 hash-fails were exactly the
    decimal emitters."""
    offenders: list[tuple[str, str, str]] = []
    for name, sql in registry.oracle_sql().items():
        # LIMIT 0 wrap: the gate checks the Arrow SCHEMA only, and
        # DuckDB derives result types statically, so materializing
        # zero rows yields the identical schema at ~1/40 the cost
        # (measured 165 s -> 4 s for the 254-oracle sweep; schema
        # identity spot-proven against full materialization)
        tbl = con.execute(f"SELECT * FROM ({sql}) __q LIMIT 0").arrow()
        for field in tbl.schema:
            tag = canonical_arrow(field.type)
            if tag.startswith("decimal") or "float32" in str(field.type):
                offenders.append((name, field.name, tag))
    assert not offenders, offenders

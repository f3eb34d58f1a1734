"""Upsert sink tests: SQL shape (reference K2-K5), idempotence,
batching/retry (K6), through a fake DB-API connection — no Postgres
in the container.
"""

from __future__ import annotations

import pytest

from flink_ecommerce_spark.sources import generator
from flink_ecommerce_spark.plans import sales
from flink_ecommerce_spark.streaming.sinks import (
    JdbcUpsertSink,
    MemoryUpsertSink,
    upsert_sql,
)


def test_upsert_sql_shape():
    sql = upsert_sql(
        "sales_per_category",
        ["transaction_date", "category", "total_sales"],
        ["transaction_date", "category"],
    )
    assert sql == (
        "INSERT INTO sales_per_category (transaction_date, category, total_sales) "
        "VALUES (%s, %s, %s) "
        "ON CONFLICT (transaction_date, category) DO UPDATE SET "
        "total_sales = EXCLUDED.total_sales"
    )


def test_memory_upsert_idempotent(spark):
    df = generator.transactions(spark, n_rows=200, seed=9)
    agg = sales.sales_per_day(df)
    sink = MemoryUpsertSink(("transaction_date",))
    sink.write_batch(agg)
    first = {k: tuple(v) for k, v in sink.state.items()}
    sink.write_batch(agg)  # replay the same batch (at-least-once delivery)
    second = {k: tuple(v) for k, v in sink.state.items()}
    assert first == second


# ---- fake DB-API plumbing ----------------------------------------------
# foreachPartition runs in separate Python worker processes, so the
# fake "database" is a file the workers append to and the driver reads.

import json
import os
import tempfile


class _FakeCursor:
    def __init__(self, path, fail_first=0):
        self.path = path
        self.fail_first = fail_first
        self.calls = 0

    def executemany(self, sql, rows):
        self.calls += 1
        if self.calls <= self.fail_first:
            raise RuntimeError("transient failure")
        with open(self.path, "a") as f:
            for row in rows:
                f.write(json.dumps([str(v) for v in row]) + "\n")


class _FakeConn:
    def __init__(self, path, fail_first=0):
        self.cursor_obj = _FakeCursor(path, fail_first)

    def cursor(self):
        return self.cursor_obj

    def commit(self):
        pass

    def rollback(self):
        pass

    def close(self):
        pass


def _read_store(path):
    rows = []
    if os.path.exists(path):
        with open(path) as f:
            rows = [tuple(json.loads(line)) for line in f]
    return rows


def _tmp_store():
    fd, path = tempfile.mkstemp(suffix=".fakejdbc")
    os.close(fd)
    os.unlink(path)
    return path


def test_jdbc_upsert_writes_all_rows(spark):
    path = _tmp_store()
    df = generator.transactions(spark, n_rows=500, seed=13).coalesce(1)
    agg = sales.sales_per_category(df)
    sink = JdbcUpsertSink(
        lambda: _FakeConn(path),
        "sales_per_category",
        ["transaction_date", "category", "total_sales"],
        ["transaction_date", "category"],
        batch_size=50,
    )
    sink.write_batch(agg)
    written = _read_store(path)
    assert len(written) == agg.count()
    # upsert key uniqueness holds in the source aggregation
    assert len({(r[0], r[1]) for r in written}) == len(written)


def test_jdbc_upsert_retries_then_succeeds(spark):
    path = _tmp_store()
    df = generator.transactions(spark, n_rows=50, seed=17).coalesce(1)
    agg = sales.sales_per_day(df).coalesce(1)
    sink = JdbcUpsertSink(
        lambda: _FakeConn(path, fail_first=2),
        "sales_per_day",
        ["transaction_date", "total_sales"],
        ["transaction_date"],
        max_retries=5,
    )
    sink.write_batch(agg)
    assert len(_read_store(path)) == agg.count()


def test_jdbc_upsert_exhausted_retries_raise(spark):
    path = _tmp_store()
    df = generator.transactions(spark, n_rows=20, seed=19).coalesce(1)
    agg = sales.sales_per_day(df).coalesce(1)
    sink = JdbcUpsertSink(
        lambda: _FakeConn(path, fail_first=10**9),
        "sales_per_day",
        ["transaction_date", "total_sales"],
        ["transaction_date"],
        max_retries=2,
    )
    with pytest.raises(Exception):
        sink.write_batch(agg)

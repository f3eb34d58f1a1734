"""End-to-end job entry point: file source → 4 branches → memory
sinks, DDL statement sanity, rate-source plan."""

from __future__ import annotations

import json

from flink_ecommerce_spark import job as job_mod
from flink_ecommerce_spark.sources import generator
from flink_ecommerce_spark.streaming import ddl


def test_job_file_source_end_to_end(spark, tmp_path):
    src = str(tmp_path / "in")
    df = generator.transactions(spark, n_rows=500, seed=41)
    generator.transactions_as_json(df).coalesce(2).write.mode("overwrite").text(src)

    job = job_mod.main(
        [
            "--source", "file",
            "--input-path", src,
            "--sink", "memory",
            "--checkpoint", str(tmp_path / "ck"),
        ]
    )
    try:
        job.process_available()
    finally:
        job.stop()

    assert set(job.sinks) == {
        "transactions", "sales_per_category", "sales_per_day", "sales_per_month",
    }
    assert len(job.sinks["transactions"].rows()) == 500
    total_raw = round(sum(r["total_amount"] for r in job.sinks["transactions"].rows()), 2)
    total_day = round(sum(r["total_sales"] for r in job.sinks["sales_per_day"].rows()), 2)
    assert abs(total_raw - total_day) < 0.05  # conservation across branches


def test_ddl_runs_once_with_fake_connection():
    executed = []

    class Cur:
        def execute(self, sql):
            executed.append(sql.strip().split("(")[0].strip())

    class Conn:
        def cursor(self):
            return Cur()

        def commit(self):
            pass

        def close(self):
            pass

    ddl.create_sink_tables(lambda: Conn())
    assert len(executed) == 4
    assert all(e.startswith("CREATE TABLE IF NOT EXISTS") for e in executed)


def test_rate_source_schema(spark):
    import argparse

    args = argparse.Namespace(source="rate", rate_rps=10)
    stream = job_mod.build_source(spark, args)
    from flink_ecommerce_spark.schemas import TRANSACTION_SCHEMA

    assert [f.name for f in stream.schema.fields] == [
        f.name for f in TRANSACTION_SCHEMA.fields
    ]


def test_job_cli_staged_duckdb_end_to_end(spark, tmp_path):
    """The airgapped CLI path: file source → staged MERGE sinks into
    an embedded DuckDB file (duckdb:// URL), DDL at startup, final
    table state conserves totals across branches."""
    import duckdb

    src = str(tmp_path / "in2")
    df = generator.transactions(spark, n_rows=300, seed=43)
    generator.transactions_as_json(df).coalesce(2).write.mode("overwrite").text(src)
    db = str(tmp_path / "job.duckdb")

    job = job_mod.main(
        [
            "--source", "file",
            "--input-path", src,
            "--sink", "staged",
            "--jdbc-url", f"duckdb://{db}",
            "--stage-dir", str(tmp_path / "stage"),
            "--checkpoint", str(tmp_path / "ck2"),
        ]
    )
    try:
        job.process_available()
    finally:
        job.stop()

    con = duckdb.connect(db)
    n_txn = con.execute("SELECT COUNT(*) FROM transactions").fetchone()[0]
    total_raw = con.execute("SELECT ROUND(SUM(total_amount), 2) FROM transactions").fetchone()[0]
    total_day = con.execute("SELECT ROUND(SUM(total_sales), 2) FROM sales_per_day").fetchone()[0]
    con.close()
    assert n_txn == 300
    assert abs(total_raw - total_day) < 0.05

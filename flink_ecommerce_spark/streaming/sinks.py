"""Upsert sinks for foreachBatch (reference K2-K5: JDBC
INSERT ... ON CONFLICT upserts, DataStreamJob.java:185-272; batching
and retry config K6 at :100-104).

Two implementations of one contract (idempotent keyed upsert):

- ``MemoryUpsertSink`` — driver-side dict keyed by the upsert key;
  used by tests to assert final-table-state equivalence between the
  batch and streaming paths.
- ``JdbcUpsertSink`` — production path: per-batch ON CONFLICT upsert
  through a DB-API connection factory (psycopg2 etc.), batched
  executemany with retries (the reference's 1000-row / 5-retry
  semantics). The container has no Postgres, so it's exercised in
  tests through a fake DB-API connection.

Scale notes: foreachBatch hands the micro-batch DataFrame to the
sink; MemoryUpsertSink collects (test-only by design), while the
JDBC sink writes per-partition via ``df.foreachPartition`` so
executors connect directly — the driver never materializes the
batch.
"""

from __future__ import annotations

import time
from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame, Row


class MemoryUpsertSink:
    """Keyed upsert into a driver-side dict. Final state == what the
    reference's Postgres table holds after the same events."""

    def __init__(self, key_cols: Sequence[str]):
        self.key_cols = tuple(key_cols)
        self.state: dict[tuple, Row] = {}

    def write_batch(self, batch_df: DataFrame, epoch_id: int | None = None) -> None:
        for row in batch_df.collect():
            self.state[tuple(row[k] for k in self.key_cols)] = row

    def foreach_batch(self) -> Callable[[DataFrame, int], None]:
        return self.write_batch

    def rows(self) -> list[Row]:
        return list(self.state.values())


def upsert_sql(table: str, columns: Sequence[str], key_cols: Sequence[str]) -> str:
    """INSERT ... ON CONFLICT DO UPDATE statement (reference K2-K5
    shape, e.g. DataStreamJob.java:240-258 for transactions)."""
    collist = ", ".join(columns)
    placeholders = ", ".join(["%s"] * len(columns))
    keylist = ", ".join(key_cols)
    updates = ", ".join(
        f"{c} = EXCLUDED.{c}" for c in columns if c not in set(key_cols)
    )
    return (
        f"INSERT INTO {table} ({collist}) VALUES ({placeholders}) "
        f"ON CONFLICT ({keylist}) DO UPDATE SET {updates}"
    )


class JdbcUpsertSink:
    """Per-batch idempotent JDBC upsert with the reference's batching
    knobs (K6: batch 1000 / 5 retries, DataStreamJob.java:100-104).

    ``connection_factory`` returns a DB-API connection; it must be
    picklable (a top-level function), because it runs inside
    ``foreachPartition`` on executors.
    """

    def __init__(
        self,
        connection_factory: Callable[[], object],
        table: str,
        columns: Sequence[str],
        key_cols: Sequence[str],
        batch_size: int = 1000,
        max_retries: int = 5,
    ):
        self.connection_factory = connection_factory
        self.table = table
        self.columns = tuple(columns)
        self.key_cols = tuple(key_cols)
        self.batch_size = batch_size
        self.max_retries = max_retries
        self.sql = upsert_sql(table, columns, key_cols)

    def write_batch(self, batch_df: DataFrame, epoch_id: int | None = None) -> None:
        factory, sql, cols = self.connection_factory, self.sql, self.columns
        batch_size, max_retries = self.batch_size, self.max_retries

        def write_partition(rows) -> None:
            buf: list[tuple] = []
            conn = factory()
            try:
                cur = conn.cursor()

                def flush() -> None:
                    if not buf:
                        return
                    for attempt in range(max_retries):
                        try:
                            cur.executemany(sql, buf)
                            conn.commit()
                            buf.clear()
                            return
                        except Exception:
                            conn.rollback()
                            if attempt == max_retries - 1:
                                raise
                            time.sleep(0.2 * (attempt + 1))

                for row in rows:
                    buf.append(tuple(row[c] for c in cols))
                    if len(buf) >= batch_size:
                        flush()
                flush()
            finally:
                conn.close()

        batch_df.select(*self.columns).foreachPartition(write_partition)

    def foreach_batch(self) -> Callable[[DataFrame, int], None]:
        return self.write_batch

"""Deterministic sampling and dataset splitting.

Training pipelines need REPRODUCIBLE sampling — `df.sample()` draws
from a per-partition RNG whose output depends on partitioning, so
reruns and engines disagree. These operators derive sampling
decisions from the portable content hash instead: the same row lands
in the same sample/split everywhere (Spark, the DuckDB oracle, a
future engine), regardless of partitioning or cluster size. This is
the standard "salted hash bucket" split used for train/val/test.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.portable import hash32, sql_hash32


def _bucket(key: Column, salt: str, n: int = 100) -> Column:
    return hash32(key.cast("string"), salt=salt) % n


def sample_events(events: DataFrame, pct: int = 10, salt: str = "sample") -> DataFrame:
    """Deterministic ~pct% sample keyed on event_id."""
    return events.filter(_bucket(F.col("event_id"), salt) < pct).select(
        "event_id", "ts", "user_id", "event_type", "value"
    )


def dataset_splits(
    events: DataFrame,
    train_pct: int = 80,
    val_pct: int = 10,
    salt: str = "split",
) -> DataFrame:
    """Assign train/val/test by hash bucket of the USER (not the
    event): all of a user's events share a split — the leakage-safe
    grouping for behavioral data."""
    b = _bucket(F.col("user_id"), salt)
    split = (
        F.when(b < train_pct, F.lit("train"))
        .when(b < train_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return events.select("event_id", "user_id", split.alias("split"))


def split_summary(events: DataFrame) -> DataFrame:
    """Split sizes + user counts (the sanity check run after any
    split: no user may appear in two splits)."""
    splits = dataset_splits(events)
    return splits.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
    )


def sql_bucket(expr: str, salt: str, n: int = 100) -> str:
    return f"({sql_hash32(f'CAST({expr} AS VARCHAR)', salt=salt)} % {n})"

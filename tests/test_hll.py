"""Portable HyperLogLog: duplicate-invariance, per-bucket MAX
mergeability, accuracy in both the linear-counting and raw-estimate
regimes, and the empty-stream edge."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_ecommerce_spark.operators.sketch import (
    hll_distinct_users,
    hll_registers,
)


def _events(spark, user_ids):
    return spark.createDataFrame(
        [(i, uid) for i, uid in enumerate(user_ids)],
        "event_id long, user_id long",
    )


def test_hll_registers_ignore_duplicates(spark):
    """The sketch summarizes DISTINCT keys: replaying every event 3x
    must leave every register untouched."""
    ev = _events(spark, list(range(200)))
    ev3 = ev.union(ev).union(ev)
    a = {(r["bucket"], r["max_rank"]) for r in hll_registers(ev).collect()}
    b = {(r["bucket"], r["max_rank"]) for r in hll_registers(ev3).collect()}
    assert a == b


def test_hll_registers_merge_by_bucket_max(spark):
    """Shard-and-merge == whole-stream build: registers from two
    halves combine with per-bucket MAX into exactly the full sketch
    — what lets every ingest day sketch independently."""
    ev = _events(spark, list(range(500)))
    whole = {
        (r["bucket"], r["max_rank"]) for r in hll_registers(ev).collect()
    }
    a = hll_registers(ev.filter(F.col("user_id") % 2 == 0))
    b = hll_registers(ev.filter(F.col("user_id") % 2 != 0))
    merged = {
        (r["bucket"], r["max_rank"])
        for r in a.union(b)
        .groupBy("bucket")
        .agg(F.max("max_rank").alias("max_rank"))
        .collect()
    }
    assert merged == whole


def test_hll_accuracy_linear_counting_regime(spark):
    """Well below the register count the estimator runs linear
    counting and is very tight — assert within 2% at n=100 (m=256).
    (Near the 2.5m crossover the error hump approaches the raw
    estimator's ~6.5% sigma; that regime is covered below.)"""
    r = hll_distinct_users(_events(spark, list(range(100)))).collect()[0]
    assert r["n_exact"] == 100
    assert r["rel_err"] < 0.02


def test_hll_accuracy_crossover_regime(spark):
    """At the linear-counting/raw boundary (n ≈ 1.2m) the error hump
    peaks; assert it stays inside 3x the raw sigma."""
    r = hll_distinct_users(_events(spark, list(range(300)))).collect()[0]
    assert r["rel_err"] < 0.20


def test_hll_accuracy_raw_regime(spark):
    """Beyond the small-range cutoff (2.5 * 256 = 640) the raw
    harmonic-mean estimate runs; std error at m=256 is ~6.5%, assert
    within 3 sigma."""
    ev = spark.range(20000).select(
        F.col("id").alias("event_id"), F.col("id").alias("user_id")
    )
    r = hll_distinct_users(ev).collect()[0]
    assert r["n_exact"] == 20000
    assert r["rel_err"] < 0.20


def test_hll_empty_stream(spark):
    ev = _events(spark, []).filter(F.lit(False))
    r = hll_distinct_users(ev).collect()[0]
    assert (r["n_exact"], r["n_hll"], r["rel_err"]) == (0, 0.0, 0.0)


def test_daily_hll_matches_global_on_single_day(spark):
    """A stream confined to one day: the daily estimate must equal
    the global estimator on the same keys (shared formula)."""
    import datetime as dt

    from flink_ecommerce_spark.operators.sketch import (
        daily_distinct_users_hll,
    )

    d0 = dt.datetime(2024, 3, 1, 10, 0)
    ev = spark.createDataFrame(
        [(i, d0, i % 123) for i in range(400)],
        "event_id long, ts timestamp, user_id long",
    )
    daily = daily_distinct_users_hll(ev).collect()
    assert len(daily) == 1
    glob = hll_distinct_users(ev).collect()[0]
    assert daily[0]["n_hll"] == glob["n_hll"]
    assert daily[0]["n_exact"] == 123


def test_daily_hll_days_are_independent(spark):
    """Each day's registers summarize only that day: the same users
    on two days give two identical per-day estimates (no cross-day
    bleed)."""
    import datetime as dt

    from flink_ecommerce_spark.operators.sketch import (
        daily_distinct_users_hll,
    )

    rows = []
    for day in (1, 2):
        d0 = dt.datetime(2024, 3, day, 10, 0)
        rows += [(day * 1000 + i, d0, i % 50) for i in range(200)]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long"
    )
    daily = {r["d"].isoformat(): r for r in daily_distinct_users_hll(ev).collect()}
    assert len(daily) == 2
    a, b = daily["2024-03-01"], daily["2024-03-02"]
    assert a["n_exact"] == b["n_exact"] == 50
    assert a["n_hll"] == b["n_hll"]


def test_hll_registers_match_pure_python_mirror(spark):
    """Bridge: the Spark register table equals the pure-Python
    hashlib mirror used by the hypothesis reference tests — ties the
    engine implementation to the formula the properties pin."""
    from tests.test_properties import _py_hll_registers

    ids = list(range(300)) + [7, 7, 42]
    ev = _events(spark, ids)
    got = {r["bucket"]: r["max_rank"] for r in hll_registers(ev).collect()}
    assert got == _py_hll_registers(ids)


def test_weekly_hll_rollup_equals_direct_build(spark):
    """The daily→weekly MAX roll-up must equal building the weekly
    registers straight from events — max is associative, so rolling
    up can't lose or inflate (this is the query the mergeability
    property exists for)."""
    import datetime as dt

    from flink_ecommerce_spark.operators.sketch import (
        _hll_bucket_rank,
        weekly_distinct_users_hll,
    )

    rows = []
    eid = 0
    for day in range(1, 15):  # two weeks
        d0 = dt.datetime(2024, 1, day, 10, 0)
        rows += [
            (eid + i, d0, (day * 13 + i) % 200) for i in range(60)
        ]
        eid += 100
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long"
    )
    via_rollup = {
        r["week_start"].isoformat(): r["n_hll"]
        for r in weekly_distinct_users_hll(ev).collect()
    }

    # direct build: week -> registers -> estimate via the same path
    week = F.floor(
        F.datediff(F.to_date("ts"), F.lit("1970-01-01")) / 7
    ).cast("long")
    bucket, rank = _hll_bucket_rank(F.col("user_id").cast("string"), 8)
    direct = (
        ev.select(week.alias("week"), bucket.alias("b"), rank.alias("r"))
        .groupBy("week", "b")
        .agg(F.max("r").alias("mr"))
    )
    from collections import defaultdict

    want = defaultdict(dict)
    for r in direct.collect():
        want[r["week"]][r["b"]] = r["mr"]

    # the roll-up path's weekly registers: daily MAX then weekly MAX
    d = F.to_date("ts")
    daily = (
        ev.select(
            d.alias("d"),
            week.alias("week"),
            bucket.alias("b"),
            rank.alias("r"),
        )
        .groupBy("d", "week", "b")
        .agg(F.max("r").alias("mr"))
    )
    rolled = defaultdict(dict)
    for r in (
        daily.groupBy("week", "b").agg(F.max("mr").alias("mr")).collect()
    ):
        rolled[r["week"]][r["b"]] = r["mr"]
    assert rolled == want  # register-exact, not just estimate-close
    assert len(via_rollup) == len(want) >= 2

"""SCD2 merge emulation: insert/close/keep semantics, idempotence of
no-op updates, late-update rejection."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from flink_ecommerce_spark.operators.cdc import empty_scd2, scd2_merge

SCHEMA = "user_id long, segment string, effective_ts timestamp"


def _t(h):
    return dt.datetime(2024, 1, 1, h, 0, 0)


def test_scd2_full_lifecycle(spark):
    snap = spark.createDataFrame(
        [(1, "bronze", _t(0)), (2, "silver", _t(0))], SCHEMA
    )
    dim = empty_scd2(snap, "user_id", ["segment"])
    assert dim.count() == 2

    updates = spark.createDataFrame(
        [
            (1, "gold", _t(5)),      # change -> close + insert
            (2, "silver", _t(6)),    # no change -> ignored
            (3, "bronze", _t(7)),    # new key -> insert
        ],
        SCHEMA,
    )
    merged = scd2_merge(dim, updates, "user_id", ["segment"])
    rows = {(r["user_id"], r["segment"], r["is_current"]): r for r in merged.collect()}

    assert len(rows) == 4
    closed = rows[(1, "bronze", False)]
    assert closed["valid_to"] == _t(5)
    # open rows carry NULL valid_to (pandas-safe: no 9999-12-31 sentinel)
    assert all(r["valid_to"] is None for k, r in rows.items() if k[2])
    merged.toPandas()  # must survive pandas ns-timestamp conversion
    assert rows[(1, "gold", True)]["valid_from"] == _t(5)
    assert rows[(2, "silver", True)]["valid_from"] == _t(0)  # untouched
    assert rows[(3, "bronze", True)]["valid_from"] == _t(7)

    # a second identical merge is a no-op (idempotent for no-change)
    again = scd2_merge(merged, updates.filter(F.col("user_id") == 2), "user_id", ["segment"])
    assert again.count() == 4


def test_scd2_rejects_stale_update(spark):
    snap = spark.createDataFrame([(1, "gold", _t(10))], SCHEMA)
    dim = empty_scd2(snap, "user_id", ["segment"])
    stale = spark.createDataFrame([(1, "bronze", _t(3))], SCHEMA)
    merged = scd2_merge(dim, stale, "user_id", ["segment"])
    rows = merged.collect()
    assert len(rows) == 1 and rows[0]["segment"] == "gold" and rows[0]["is_current"]


def test_scd2_null_attr_change_detection(spark):
    snap = spark.createDataFrame([(1, None, _t(0))], SCHEMA)
    dim = empty_scd2(snap, "user_id", ["segment"])
    upd = spark.createDataFrame([(1, "silver", _t(2))], SCHEMA)
    merged = scd2_merge(dim, upd, "user_id", ["segment"])
    cur = [r for r in merged.collect() if r["is_current"]]
    assert len(cur) == 1 and cur[0]["segment"] == "silver"
    # null -> null is NOT a change
    upd2 = spark.createDataFrame([(1, None, _t(1))], SCHEMA)
    dim2 = empty_scd2(spark.createDataFrame([(1, None, _t(0))], SCHEMA), "user_id", ["segment"])
    assert scd2_merge(dim2, upd2, "user_id", ["segment"]).count() == 1


def test_pit_join_picks_version_valid_at_fact_ts(spark):
    from flink_ecommerce_spark.operators.cdc import pit_join

    snap = spark.createDataFrame([(1, "bronze", _t(2))], SCHEMA)
    dim = scd2_merge(
        empty_scd2(snap, "user_id", ["segment"]),
        spark.createDataFrame([(1, "gold", _t(8))], SCHEMA),
        "user_id",
        ["segment"],
    )  # versions: bronze [2,8), gold [8, NULL)
    facts = spark.createDataFrame(
        [
            (100, 1, _t(1)),   # predates first version -> NULL
            (101, 1, _t(2)),   # boundary: valid_from inclusive -> bronze
            (102, 1, _t(5)),   # inside the closed interval -> bronze
            (103, 1, _t(8)),   # boundary: valid_to exclusive -> gold
            (104, 1, _t(12)),  # open row -> gold
            (105, 2, _t(5)),   # unknown key -> NULL
        ],
        "event_id long, user_id long, ts timestamp",
    )
    out = pit_join(facts, dim, "user_id", "ts", ["segment"])
    got = {r["event_id"]: r["segment"] for r in out.collect()}
    assert got == {
        100: None,
        101: "bronze",
        102: "bronze",
        103: "gold",
        104: "gold",
        105: None,
    }
    # disjoint intervals -> fact cardinality preserved
    assert out.count() == facts.count()


def test_daily_gapfill_fills_and_carries(spark):
    """Crafted gaps: missing (type, day) cells appear with NULL raw
    revenue, the LOCF column carries the last seen value, zero-fill
    is 0.0; leading gaps (before a type's first sale) stay NULL in
    LOCF."""
    import datetime as dt

    from flink_ecommerce_spark.plans.temporal import daily_gapfill

    rows = [
        # type A: day 1 and day 3 (gap on day 2)
        (1, dt.datetime(2024, 1, 1, 10), 1, "A", 10.0, "{}"),
        (2, dt.datetime(2024, 1, 3, 10), 1, "A", 30.0, "{}"),
        # type B: only day 2 (leading gap day 1, trailing gap day 3)
        (3, dt.datetime(2024, 1, 2, 10), 2, "B", 20.0, "{}"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string"
    )
    got = {
        (r["event_type"], str(r["day"])): (
            r["revenue_cents"], r["revenue_locf_cents"], r["revenue_zero_cents"]
        )
        for r in daily_gapfill(ev).collect()
    }
    assert len(got) == 6  # 2 types x 3 days
    assert got[("A", "2024-01-02")] == (None, 1000, 0)   # gap: locf carries
    assert got[("A", "2024-01-03")] == (3000, 3000, 3000)
    assert got[("B", "2024-01-01")] == (None, None, 0)   # leading gap
    assert got[("B", "2024-01-03")] == (None, 2000, 0)   # trailing gap

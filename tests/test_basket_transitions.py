"""Market-basket pairs and event-transition matrix on crafted rows:
support/lift arithmetic, min-support gate, and transition
probabilities that sum to 1 per current type."""

from __future__ import annotations

import datetime as dt

from flink_ecommerce_spark.plans.temporal import event_transitions
from flink_ecommerce_spark.plans.tpch import copurchase_pairs


def test_copurchase_support_and_lift(spark):
    rows = [
        (1, 101), (1, 102), (1, 103),   # order 1: A B C
        (2, 101), (2, 102),             # order 2: A B
        (3, 101),                       # order 3: A
        (3, 101),                       # duplicate line: same part twice
    ]
    li = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    got = {(r["part_a"], r["part_b"]): r for r in copurchase_pairs(li).collect()}
    # only (A, B) reaches min_support 2; duplicate lines don't inflate
    assert set(got) == {(101, 102)}
    r = got[(101, 102)]
    assert r["support"] == 2
    # lift = support * n_orders / (n_A * n_B) = 2*3 / (3*2) = 1.0
    assert r["lift"] == 1.0


def test_event_transitions_probabilities(spark):
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, t0, 1, "click", 0.0, "{}"),
        (2, t0 + dt.timedelta(minutes=1), 1, "view", 0.0, "{}"),
        (3, t0 + dt.timedelta(minutes=2), 1, "click", 0.0, "{}"),
        (4, t0 + dt.timedelta(minutes=3), 1, "purchase", 0.0, "{}"),
        (5, t0, 2, "click", 0.0, "{}"),
        (6, t0 + dt.timedelta(minutes=1), 2, "view", 0.0, "{}"),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    got = {
        (r["cur_type"], r["next_type"]): r for r in event_transitions(ev).collect()
    }
    # click -> view twice (u1 first step, u2), click -> purchase once
    assert got[("click", "view")]["n_transitions"] == 2
    assert got[("click", "purchase")]["n_transitions"] == 1
    assert got[("click", "view")]["p_next"] == 0.666667
    assert got[("click", "purchase")]["p_next"] == 0.333333
    # transitions never cross users: u2's 'view' has no successor
    assert ("view", "view") not in got
    # per-current-type probabilities sum to ~1
    from collections import defaultdict

    sums = defaultdict(float)
    for (cur, _), r in got.items():
        sums[cur] += r["p_next"]
    for cur, s in sums.items():
        assert abs(s - 1.0) < 1e-5, (cur, s)


def test_top_session_paths_truncation_and_counting(spark):
    from flink_ecommerce_spark.plans.analytics import top_session_paths

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    # two users with the identical click>view session; a 2h gap then a
    # lone purchase session for user 1
    for u in (1, 2):
        for j, et in enumerate(["click", "view"]):
            eid += 1
            rows.append((eid, t0 + dt.timedelta(minutes=j), u, et, 0.0, "{}"))
    eid += 1
    rows.append((eid, t0 + dt.timedelta(hours=2), 1, "purchase", 0.0, "{}"))
    # user 3: a 12-step session -> path truncates at 10 steps
    for j in range(12):
        eid += 1
        rows.append((eid, t0 + dt.timedelta(minutes=j), 3, "click", 0.0, "{}"))
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    got = {r["path"]: r["n_sessions"] for r in top_session_paths(ev).collect()}
    assert got["click>view"] == 2
    assert got["purchase"] == 1
    assert got[">".join(["click"] * 10)] == 1  # truncated, not 12 steps
    assert ">".join(["click"] * 12) not in got


def test_sliding_event_counts_four_windows_per_event(spark):
    from flink_ecommerce_spark.plans.temporal import sliding_event_counts

    ev = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1, 10, 7, 0), 1, "click", 0.0, "{}")],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    rows = sliding_event_counts(ev).collect()
    # 1h window / 15m slide -> exactly 4 windows contain the event
    assert len(rows) == 4
    starts = sorted(r["window_start"] for r in rows)
    assert starts == [
        dt.datetime(2024, 1, 1, 9, 15),
        dt.datetime(2024, 1, 1, 9, 30),
        dt.datetime(2024, 1, 1, 9, 45),
        dt.datetime(2024, 1, 1, 10, 0),
    ]
    assert all(r["n_events"] == 1 for r in rows)
    assert all(
        (r["window_end"] - r["window_start"]) == dt.timedelta(hours=1) for r in rows
    )


def test_dup_rate_by_source_blames_later_arrival(spark):
    from flink_ecommerce_spark.operators.dedup import dup_rate_by_source
    from flink_ecommerce_spark.schemas import DOCUMENTS_SCHEMA

    rows = [
        (1, "same text", "en", "a", 9),
        (2, "same text", "en", "b", 9),   # cross-source copy -> blames b
        (3, "unique 1", "en", "a", 8),
        (4, "other", "en", "b", 5),
        (5, "other", "en", "b", 5),       # within-b copy
    ]
    d = spark.createDataFrame(rows, DOCUMENTS_SCHEMA)
    got = {r["source"]: r for r in dup_rate_by_source(d).collect()}
    assert got["a"]["n_dupes"] == 0 and got["a"]["dup_rate"] == 0.0
    assert got["b"]["n_dupes"] == 2
    assert got["b"]["dup_rate"] == round(2 / 3, 6)


def test_rolling_active_users_exact_distinct(spark):
    from flink_ecommerce_spark.plans.analytics import rolling_active_users

    d0 = dt.datetime(2024, 1, 1, 12, 0)

    def ev(eid, day, user):
        return (eid, d0 + dt.timedelta(days=day), user, "click", 0.0, "{}")

    # user 1 active on days 0 and 3 (must count ONCE in the 7-day
    # window); user 2 only day 0; user 3 only day 8 (outside day 0..6)
    rows = [ev(1, 0, 1), ev(2, 3, 1), ev(3, 0, 2), ev(4, 8, 3)]
    events = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    got = {r["d"]: r for r in rolling_active_users(events).collect()}
    day = lambda k: dt.date(2024, 1, 1) + dt.timedelta(days=k)
    assert got[day(0)]["dau"] == 2
    assert got[day(3)]["dau"] == 1
    # trailing-7 window ending day 3 saw users {1, 2}: user 1 twice
    # but counted once — a rolling SUM of daus would say 3
    assert got[day(3)]["wau"] == 2
    # window days 2..8 contains user 1 (active day 3) and user 3 (day 8)
    assert got[day(8)]["wau"] == 2
    # days with no events are absent (dau is the anchor)
    assert day(1) not in got


def test_event_type_correlations_crafted_signal(spark):
    """Perfectly co-moving daily counts -> 1.0; perfectly opposed ->
    -1.0; a constant series (zero variance) -> NULL; a day where one
    type is absent drops from that pair (missing, not zero)."""
    from flink_ecommerce_spark.plans.analytics import event_type_correlations

    d0 = dt.datetime(2024, 1, 1, 12, 0)
    rows = []
    eid = 0

    def burst(day, etype, n):
        nonlocal eid
        for _ in range(n):
            eid += 1
            rows.append(
                (eid, d0 + dt.timedelta(days=day), 1, etype, 0.0, "{}")
            )

    # a and b co-move (1, 2, 3); c is anti (3, 2, 1); k constant (2, 2, 2)
    for day, (na, nc) in enumerate([(1, 3), (2, 2), (3, 1)]):
        burst(day, "a", na)
        burst(day, "b", na)  # identical series to a
        burst(day, "c", nc)
        burst(day, "k", 2)
    # d appears only on day 0 — every pair with d has a 1-day overlap
    burst(0, "d", 5)
    events = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    got = {
        (r["type_a"], r["type_b"]): r
        for r in event_type_correlations(events).collect()
    }
    assert got[("a", "b")]["corr_daily_counts"] == 1.0
    assert got[("a", "c")]["corr_daily_counts"] == -1.0
    assert got[("a", "k")]["corr_daily_counts"] is None  # k has no variance
    assert got[("a", "d")]["n_days"] == 1  # missing days drop, not zero
    assert got[("a", "d")]["corr_daily_counts"] is None  # 1 day: no variance
    assert all(r["n_days"] == 3 for (p, r) in got.items() if "d" not in p)


def test_robust_value_stats_crafted_outliers(spark):
    """Median/MAD arithmetic on a hand-checkable series, the
    mad_k screen, and the MAD=0 degenerate case."""
    from flink_ecommerce_spark.plans.analytics import robust_value_stats

    d0 = dt.datetime(2024, 1, 1, 12, 0)
    rows = []
    # type "t": values 1..7 plus one wild outlier 100
    #   median = 4.5 of [1..7,100]? -> sorted [1,2,3,4,5,6,7,100],
    #   median = 4.5; deviations [3.5,2.5,1.5,.5,.5,1.5,2.5,95.5],
    #   MAD = median = 2.0; threshold 3*2=6 -> only 95.5 flags
    for i, v in enumerate([1, 2, 3, 4, 5, 6, 7, 100]):
        rows.append((i, d0, 1, "t", float(v), "{}"))
    # type "k": constant values -> MAD 0; one off value flags
    for i, v in enumerate([5, 5, 5, 9]):
        rows.append((100 + i, d0, 1, "k", float(v), "{}"))
    events = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    got = {r["event_type"]: r for r in robust_value_stats(events).collect()}
    t = got["t"]
    assert (t["median_value"], t["mad"]) == (4.5, 2.0)
    assert (t["n_outliers"], t["n_rows"]) == (1, 8)
    k = got["k"]
    assert (k["median_value"], k["mad"]) == (5.0, 0.0)
    assert (k["n_outliers"], k["n_rows"]) == (1, 4)


def test_seasonal_decompose_additive_identity_and_flat_series(spark):
    """trend + seasonal + residual must reconstruct day_value (up to
    6dp rounding), and a perfectly flat series decomposes to
    trend = value, seasonal = residual = 0."""
    from flink_ecommerce_spark.plans.analytics import seasonal_daily_decompose

    d0 = dt.datetime(2024, 1, 1, 12, 0)
    rows = []
    # flat series: 10.0 every day for 21 days
    for day in range(21):
        rows.append((day, d0 + dt.timedelta(days=day), 1, "flat", 10.0, "{}"))
    # weekly pattern: phase p contributes 100 + p (exactly periodic)
    for day in range(21):
        rows.append(
            (100 + day, d0 + dt.timedelta(days=day), 1, "weekly",
             100.0 + (day % 7), "{}")
        )
    events = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    out = seasonal_daily_decompose(events).collect()
    assert len(out) == 42
    for r in out:
        assert abs(r["day_value"] - (r["trend"] + r["seasonal"] + r["residual"])) < 2e-6
    flat = [r for r in out if r["event_type"] == "flat"]
    assert all(r["trend"] == 10.0 and r["seasonal"] == 0.0 and r["residual"] == 0.0
               for r in flat)
    # interior rows of the periodic series: full 7-day window -> the
    # trend is the weekly mean. Residuals are small but NOT exactly
    # zero: each phase's seasonal mean also averages over edge days
    # whose truncated trend window biases the detrended value (the
    # classical decomposition edge effect).
    weekly = {(r["d"] - dt.date(2024, 1, 1)).days: r for r in out
              if r["event_type"] == "weekly"}
    for day in range(3, 18):
        r = weekly[day]
        assert r["trend"] == 103.0
        assert abs(r["residual"]) < 0.6
    # the seasonal component recovers the weekly shape: strictly
    # increasing across phases (true gaps are 1.0, edge bias < 0.5)
    seas = [weekly[7 + p]["seasonal"] for p in range(7)]  # phases 0..6
    assert all(a < b for a, b in zip(seas, seas[1:]))


def test_value_psi_crafted_drift(spark):
    """PSI separates stable from shifted distributions: a type whose
    value distribution is identical in both date halves scores ~0; a
    type that moves mass two buckets up scores > 0.25 (the standard
    'shifted' threshold); grid smoothing keeps every score finite."""
    import math

    from flink_ecommerce_spark.plans.analytics import value_psi_by_type

    d_early = dt.datetime(2024, 1, 2, 12, 0)
    d_late = dt.datetime(2024, 1, 9, 12, 0)  # range 1/2..1/9, mid 1/5
    rows = []
    eid = 0
    # "stable": same 20-value profile both halves
    for d in (d_early, d_late):
        for v in [5.0] * 10 + [25.0] * 10:
            rows.append((eid, d, 1, "stable", v, "{}")); eid += 1
    # "shifted": mass moves from bucket 0 to bucket 5
    for v in [5.0] * 20:
        rows.append((eid, d_early, 1, "shifted", v, "{}")); eid += 1
    for v in [55.0] * 20:
        rows.append((eid, d_late, 1, "shifted", v, "{}")); eid += 1
    events = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    got = {r["event_type"]: r for r in value_psi_by_type(events).collect()}
    assert got["stable"]["psi"] == 0.0
    assert got["shifted"]["psi"] > 0.25
    assert all(math.isfinite(r["psi"]) for r in got.values())
    assert (got["shifted"]["n_baseline"], got["shifted"]["n_current"]) == (20, 20)


def test_value_psi_clamps_out_of_range_values(spark):
    """Values below 0 / above the top edge land in the edge buckets
    (no dropped rows, no extra buckets): totals always equal row
    counts."""
    from flink_ecommerce_spark.plans.analytics import value_psi_by_type

    rows = [
        (0, dt.datetime(2024, 1, 1), 1, "t", -5.0, "{}"),
        (1, dt.datetime(2024, 1, 1), 1, "t", 5000.0, "{}"),
        (2, dt.datetime(2024, 1, 8), 1, "t", 50.0, "{}"),
    ]
    events = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    r = value_psi_by_type(events).collect()[0]
    assert r["n_baseline"] + r["n_current"] == 3


def test_linear_attribution_splits_and_windows(spark):
    """Hand-checkable splits: 2 clicks + 1 view inside the hour
    share a 30.0 purchase equally (click 20, view 10); a touch
    outside the window and a touch AT the purchase timestamp are
    excluded; a touch-free purchase goes whole to 'direct'; another
    user's touches never leak in."""
    from flink_ecommerce_spark.plans.temporal import linear_attribution

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    m = dt.timedelta(minutes=1)
    rows = [
        # user 1: 2 clicks + 1 view in-window, 1 click too early,
        # 1 view exactly at purchase ts (excluded: strictly before)
        (0, t0 - 90 * m, 1, "click", 0.0, "{}"),
        (1, t0 - 30 * m, 1, "click", 0.0, "{}"),
        (2, t0 - 20 * m, 1, "click", 0.0, "{}"),
        (3, t0 - 10 * m, 1, "view", 0.0, "{}"),
        (4, t0, 1, "view", 0.0, "{}"),
        (5, t0, 1, "purchase", 30.0, "{}"),
        # user 2: purchase with no touches -> direct
        (6, t0, 2, "purchase", 7.5, "{}"),
        # user 3: touches but no purchase -> nothing attributed
        (7, t0 - 5 * m, 3, "click", 0.0, "{}"),
    ]
    events = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    got = {r["channel"]: r for r in linear_attribution(events).collect()}
    assert got["click"]["attributed_value"] == 20.0
    assert got["click"]["n_touches"] == 2
    assert got["view"]["attributed_value"] == 10.0
    assert got["view"]["n_touches"] == 1
    assert got["direct"]["attributed_value"] == 7.5
    assert got["direct"]["n_touches"] == 0
    # conservation: attributed totals == purchase totals
    assert sum(r["attributed_value"] for r in got.values()) == 37.5


def test_linear_attribution_thirds_stay_conserved(spark):
    """A value that does NOT split evenly in binary (10.0 / 3) must
    still conserve total revenue after micro-unit quantization."""
    from flink_ecommerce_spark.plans.temporal import linear_attribution

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    m = dt.timedelta(minutes=1)
    rows = [
        (0, t0 - 3 * m, 1, "click", 0.0, "{}"),
        (1, t0 - 2 * m, 1, "view", 0.0, "{}"),
        (2, t0 - 1 * m, 1, "view", 0.0, "{}"),
        (3, t0, 1, "purchase", 10.0, "{}"),
    ]
    events = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    got = {r["channel"]: r for r in linear_attribution(events).collect()}
    assert got["click"]["attributed_value"] == 3.33
    assert got["view"]["attributed_value"] == 6.67
    assert abs(sum(r["attributed_value"] for r in got.values()) - 10.0) < 0.011


def test_copurchase_graph_stats_triangle_census(spark):
    """Hand-checkable graph: a triangle {1,2,3} plus a pendant edge
    (3,4). Degrees 2,2,3,1 -> wedges 1+1+3+0 = 5; one triangle;
    clustering 3*1/5 = 0.6."""
    from flink_ecommerce_spark.plans.tpch import copurchase_graph_stats

    rows = []
    oid = 0
    for _ in range(2):  # each basket twice => every pair support 2
        oid += 1
        rows += [(oid, 1), (oid, 2), (oid, 3)]
    for _ in range(2):
        oid += 1
        rows += [(oid, 3), (oid, 4)]
    li = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    r = copurchase_graph_stats(li).collect()[0]
    assert (r["n_parts"], r["n_edges"]) == (4, 4)
    assert (r["n_wedges"], r["n_triangles"]) == (5, 1)
    assert r["global_clustering"] == 0.6


def test_copurchase_graph_stats_star_has_no_triangles(spark):
    """A hub with 3 leaves: 3 wedges, 0 triangles — the degree-
    ordered orientation must not fabricate closures through the
    hub."""
    from flink_ecommerce_spark.plans.tpch import copurchase_graph_stats

    rows = []
    oid = 0
    for leaf in (11, 12, 13):
        for _ in range(2):
            oid += 1
            rows += [(oid, 1), (oid, leaf)]
    li = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    r = copurchase_graph_stats(li).collect()[0]
    assert (r["n_parts"], r["n_edges"]) == (4, 3)
    assert (r["n_wedges"], r["n_triangles"]) == (3, 0)
    assert r["global_clustering"] == 0.0


def test_copurchase_graph_stats_empty_graph(spark):
    """No pair reaches min_support: all-zero census, coefficient 0
    (not NULL/NaN)."""
    from flink_ecommerce_spark.plans.tpch import copurchase_graph_stats

    li = spark.createDataFrame(
        [(1, 101), (2, 102)], "l_orderkey long, l_partkey long"
    )
    r = copurchase_graph_stats(li).collect()[0]
    assert (r["n_parts"], r["n_edges"], r["n_wedges"], r["n_triangles"]) == (
        0, 0, 0, 0,
    )
    assert r["global_clustering"] == 0.0


def test_conversion_lag_stats_hand_checked(spark):
    """Two users with known step lags; exact medians/p90 over the
    2-episode table, in seconds."""
    from flink_ecommerce_spark.plans.temporal import conversion_lag_stats

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    s = dt.timedelta(seconds=1)
    rows = [
        # user 1: view +0, click +10s, purchase +30s
        (0, t0, 1, "view", 0.0, "{}"),
        (1, t0 + 10 * s, 1, "click", 0.0, "{}"),
        (2, t0 + 30 * s, 1, "purchase", 5.0, "{}"),
        # user 2: view +0, click +20s, purchase +100s
        (3, t0, 2, "view", 0.0, "{}"),
        (4, t0 + 20 * s, 2, "click", 0.0, "{}"),
        (5, t0 + 100 * s, 2, "purchase", 5.0, "{}"),
        # user 3: never converts
        (6, t0, 3, "view", 0.0, "{}"),
    ]
    events = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    r = conversion_lag_stats(events).collect()[0]
    assert r["n_episodes"] == 2
    assert r["median_view_to_click"] == 15.0  # (10+20)/2
    assert r["median_click_to_purchase"] == 50.0  # (20+80)/2
    assert r["median_total"] == 65.0  # (30+100)/2
    # p90 over [10, 20]: 10 + 0.9*(20-10) = 19
    assert r["p90_view_to_click"] == 19.0


def test_ab_test_report_crafted_rates(spark):
    """60 even-id users convert 50/60, 60 odd-id users convert 20/60:
    z = (0.8333..-0.3333..)/sqrt(p(1-p)(2/60)) with pooled p=70/120 —
    hand-computed ~5.58, significant at 95%."""
    import math

    from flink_ecommerce_spark.plans.analytics import ab_test_report

    rows = []
    eid = 0
    d0 = dt.datetime(2024, 1, 1, 12, 0)
    for u in range(120):
        rows.append((eid, d0, u, "view", 1.0, "{}")); eid += 1
        converted = (u % 2 == 0 and u < 100) or (u % 2 == 1 and u < 40)
        if converted:
            rows.append((eid, d0, u, "purchase", 5.0, "{}")); eid += 1
    events = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    r = ab_test_report(events).collect()[0]
    assert (r["n_a"], r["c_a"], r["n_b"], r["c_b"]) == (60, 50, 60, 20)
    p = 70 / 120
    z = (50 / 60 - 20 / 60) / math.sqrt(p * (1 - p) * (2 / 60))
    assert r["z_score"] == round(z, 6)
    assert r["significant_95"] is True


def test_ab_test_zero_variance_is_flat_zero(spark):
    """Everyone converts: pooled variance 0 must yield z=0, not
    NaN/NULL."""
    from flink_ecommerce_spark.plans.analytics import ab_test_report

    rows = []
    d0 = dt.datetime(2024, 1, 1, 12, 0)
    for u in range(10):
        rows.append((u, d0, u, "purchase", 5.0, "{}"))
    events = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    r = ab_test_report(events).collect()[0]
    assert r["z_score"] == 0.0
    assert r["significant_95"] is False


def test_daily_changepoint_localizes_level_shift(spark):
    """10 days at 10.0 then 10 days at 50.0: the argmax split must
    land on day 10 with mean_before 10 / mean_after 50."""
    from flink_ecommerce_spark.plans.analytics import daily_changepoint

    rows = []
    eid = 0
    for day in range(1, 21):
        v = 10.0 if day <= 10 else 50.0
        rows.append((eid, dt.datetime(2024, 1, day, 12), 1, "t", v, "{}"))
        eid += 1
    events = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    r = daily_changepoint(events).collect()[0]
    assert r["change_day"].isoformat() == "2024-01-10"
    assert (r["mean_before"], r["mean_after"]) == (10.0, 50.0)
    # |S_10 - 10/20 * S_20| = |100 - 300| = 200
    assert r["shift_stat"] == 200.0


def test_daily_changepoint_single_day_type_absent(spark):
    """A type with one day has no candidate split: absent, not
    div-by-zero."""
    from flink_ecommerce_spark.plans.analytics import daily_changepoint

    rows = [
        (0, dt.datetime(2024, 1, 1, 12), 1, "solo", 5.0, "{}"),
        (1, dt.datetime(2024, 1, 1, 12), 1, "pair", 5.0, "{}"),
        (2, dt.datetime(2024, 1, 2, 12), 1, "pair", 9.0, "{}"),
    ]
    events = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    got = {r["event_type"] for r in daily_changepoint(events).collect()}
    assert got == {"pair"}


def test_l_diversity_crafted(spark):
    from flink_ecommerce_spark.operators.text import l_diversity_report

    rows = (
        [(i, "t", ["en", "fr", "de"][i % 3], "varied", 1) for i in range(9)]
        + [(10 + i, "t", "en", "mono", 1) for i in range(5)]
    )
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars int"
    )
    got = {r["source"]: r for r in l_diversity_report(docs, l=3).collect()}
    assert got["varied"]["meets_l"] is True
    assert got["mono"]["meets_l"] is False
    assert got["mono"]["n_distinct_langs"] == 1

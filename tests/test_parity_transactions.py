"""Golden/property tests of the parity plans on the TRANSACTION
schema (SURVEY.md §5.2/§5.4): edge-case timestamps, duplicate keys,
null fields, and the cross-aggregate conservation invariant.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from flink_ecommerce_spark.plans import sales
from flink_ecommerce_spark.sources import generator
from flink_ecommerce_spark.schemas import TRANSACTION_SCHEMA


def _df(spark, rows):
    return spark.createDataFrame(rows, TRANSACTION_SCHEMA)


def _row(**kw):
    base = dict(
        transactionId="t0",
        productId="product1",
        productName="laptop",
        productCategory="electronic",
        productPrice=10.0,
        productQuantity=2,
        productBrand="apple",
        totalAmount=20.0,
        currency="USD",
        customerId="u0",
        transactionDate=dt.datetime(2024, 1, 15, 12, 0, 0),
        paymentMethod="credit_card",
    )
    base.update(kw)
    return tuple(base[f.name] for f in TRANSACTION_SCHEMA.fields)


def test_month_and_year_boundaries(spark):
    rows = [
        _row(transactionId="a", transactionDate=dt.datetime(2023, 12, 31, 23, 59, 59, 999000), totalAmount=1.0),
        _row(transactionId="b", transactionDate=dt.datetime(2024, 1, 1, 0, 0, 0), totalAmount=2.0),
        # year collision (quirk Q2): Jan 2023 and Jan 2024 must NOT merge
        _row(transactionId="c", transactionDate=dt.datetime(2023, 1, 5), totalAmount=4.0),
    ]
    got = {
        (r["year"], r["month"]): r["total_sales"]
        for r in sales.sales_per_month(_df(spark, rows)).collect()
    }
    assert got == {(2023, 12): 1.0, (2024, 1): 2.0, (2023, 1): 4.0}
    days = {
        r["transaction_date"]: r["total_sales"]
        for r in sales.sales_per_day(_df(spark, rows)).collect()
    }
    assert days[dt.date(2023, 12, 31)] == 1.0
    assert days[dt.date(2024, 1, 1)] == 2.0


def test_null_fields_flow_through(spark):
    rows = [
        _row(transactionId="a", productBrand=None, paymentMethod=None),
        _row(transactionId="b", totalAmount=None),
    ]
    raw = sales.raw_transactions(_df(spark, rows)).collect()
    assert len(raw) == 2
    per_day = sales.sales_per_day(_df(spark, rows)).collect()
    # null amounts are ignored by SUM; date groups still appear
    assert per_day[0]["total_sales"] == 20.0


def test_category_grouping_uses_full_key(spark):
    """Quirk Q1 fix: same category on two dates → two rows."""
    rows = [
        _row(transactionId="a", transactionDate=dt.datetime(2024, 1, 1), totalAmount=1.0),
        _row(transactionId="b", transactionDate=dt.datetime(2024, 1, 2), totalAmount=2.0),
    ]
    got = sales.sales_per_category(_df(spark, rows)).collect()
    assert len(got) == 2


def test_conservation_invariant(spark):
    """sum(sales_per_day) == sum(sales_per_category) ==
    sum(sales_per_month) == sum(totalAmount) (SURVEY.md §5.4)."""
    df = generator.transactions(spark, n_rows=5000, seed=11)
    total = df.agg(F.round(F.sum("totalAmount"), 2)).collect()[0][0]
    for plan in (sales.sales_per_day, sales.sales_per_category, sales.sales_per_month):
        agg_total = round(
            sum(r["total_sales"] for r in plan(df).collect()), 2
        )
        assert abs(agg_total - total) < 0.05, plan.__name__


def test_generator_domains_and_determinism(spark):
    df1 = generator.transactions(spark, n_rows=300, seed=5).collect()
    df2 = generator.transactions(spark, n_rows=300, seed=5).collect()
    assert sorted(map(tuple, df1)) == sorted(map(tuple, df2))
    for r in df1:
        assert r["productCategory"] in generator.CATEGORIES
        assert r["currency"] in generator.CURRENCIES
        assert r["paymentMethod"] in generator.PAYMENT_METHODS
        assert 1 <= r["productQuantity"] <= 10
        assert 10.0 <= r["productPrice"] < 1000.0
        assert abs(r["totalAmount"] - round(r["productPrice"] * r["productQuantity"], 2)) < 1e-9
    # unique upsert key
    assert len({r["transactionId"] for r in df1}) == 300

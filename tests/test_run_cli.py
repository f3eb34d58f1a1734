"""CLI runner: name resolution, SQL path, error on unknown names, and
the --list surface (no subprocess — resolve() takes the test session).
"""

from __future__ import annotations

import pytest

from flink_ecommerce_spark.run import build_parser, resolve

from tests.conftest import SF_SMALL


def test_resolve_registry_query_and_sql(spark):
    args = build_parser().parse_args(
        ["sales_per_day", "--sql", "SELECT COUNT(*) AS n FROM lineitem"]
    )
    got = dict(resolve(spark, SF_SMALL, args))
    assert set(got) == {"sql", "sales_per_day"}
    assert got["sql"].collect()[0]["n"] > 0
    rows = got["sales_per_day"].collect()
    assert rows and {"transaction_date", "total_sales_cents"} <= set(
        rows[0].asDict()
    )


def test_resolve_rejects_unknown_name(spark):
    args = build_parser().parse_args(["no_such_query"])
    with pytest.raises(SystemExit, match="no_such_query"):
        list(resolve(spark, SF_SMALL, args))


def test_list_covers_registry():
    from flink_ecommerce_spark import registry

    # --list prints SPECS keys; pin that the surface is the registry
    assert len(registry.SPECS) == len(set(registry.SPECS))
    assert "q1_pricing_summary" in registry.SPECS

"""Capture .explain("formatted") for named registry queries into
plans/<round>/<query>_<tag>.txt (the judge checks plan claims against
these files; Spark is unavailable to the judge, so they are committed).
Round dir defaults to r10; override with $SPARK_GRAFT_PLAN_ROUND.

Usage: python tools/explain_capture.py <tag> <query> [query ...]
       python tools/explain_capture.py <tag> --bench   # every bench query

Runs at the bench scale factor ($SPARK_GRAFT_SF_DIR, default sf0.1) on
the bench session config so the captured plan is the one the bench
times.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from flink_ecommerce_spark import registry  # noqa: E402
from flink_ecommerce_spark.session import get_spark  # noqa: E402

OUT = (
    Path(__file__).resolve().parent.parent
    / "plans"
    / os.environ.get("SPARK_GRAFT_PLAN_ROUND", "r10")
)


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    if names == ["--bench"]:
        names = sorted(
            n for n, s in registry.SPECS.items() if s.bench
        )
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        "explain-capture",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    OUT.mkdir(parents=True, exist_ok=True)
    for name in names:
        df = registry.SPECS[name].fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        (OUT / f"{name}_{tag}.txt").write_text(plan)
        print(f"wrote {OUT.name}/{name}_{tag}.txt ({len(plan)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()

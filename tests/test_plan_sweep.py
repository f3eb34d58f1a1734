"""Global plan-antipattern sweep: EVERY registry query's physical
plan, one pass, three repo-wide invariants. Per-query plan-shape
assertions live in test_plan_properties.py; this file is the
backstop that a NEW query can't quietly ship a scale antipattern.
"""

from __future__ import annotations

from flink_ecommerce_spark import registry

from tests.conftest import SF_SMALL

# The documented Arrow (vectorized) Python boundaries — the ONLY
# queries allowed to leave the JVM. Everything else must be pure
# codegen/built-in expressions.
ARROW_ALLOWED = {
    "knn_bruteforce_pandas",  # GEMM beats codegen at 100k vectors (measured)
    "multimodal_features",  # binary payload decode is a codec boundary
    "multimodal_frames",
    "multimodal_thumbnails",
}


def test_every_plan_is_scale_clean(registry_frames):
    frames, construction_errors = registry_frames
    cartesian, row_python, arrow_unexpected = [], [], []
    errors = [(n, e) for n, e in construction_errors.items()]
    for name in registry.SPECS:
        if name not in frames:
            continue  # construction failure already in errors
        try:
            plan = (
                frames[name]
                ._jdf.queryExecution()
                .executedPlan()
                .toString()
            )
        except Exception as e:  # a query that can't plan is its own failure
            errors.append((name, str(e)[:120]))
            continue
        if "CartesianProduct" in plan:
            cartesian.append(name)
        if "BatchEvalPython" in plan:  # row-at-a-time Python UDF
            row_python.append(name)
        if (
            "MapInPandas" in plan or "FlatMapGroupsInPandas" in plan
        ) and name not in ARROW_ALLOWED:
            arrow_unexpected.append(name)
    assert not errors, errors
    assert not cartesian, f"CartesianProduct (unbroadcastable join): {cartesian}"
    assert not row_python, f"row-at-a-time Python UDF: {row_python}"
    assert not arrow_unexpected, (
        f"undocumented Python boundary (add to ARROW_ALLOWED only with a "
        f"measured justification): {arrow_unexpected}"
    )

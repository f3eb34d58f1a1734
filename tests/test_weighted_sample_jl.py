"""weighted_sample (A-Res) statistical + contract tests and
jl_project distance-preservation tests."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from flink_ecommerce_spark.operators.sampling import weighted_sample
from flink_ecommerce_spark.operators.similarity import jl_project
from flink_ecommerce_spark.schemas import DOCUMENTS_SCHEMA


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, "t", "en", s, w) for i, s, w in rows], DOCUMENTS_SCHEMA
    )


def test_weighted_sample_contract(spark):
    """k rows out, zero/negative weights never drawn, deterministic
    across repeat runs."""
    rows = [(i, "s", (i % 7) * 10) for i in range(100)]  # some zero weights
    d = _docs(spark, rows)
    out1 = weighted_sample(d, k=10).collect()
    out2 = weighted_sample(d, k=10).collect()
    assert len(out1) == 10
    assert [r["doc_id"] for r in out1] == [r["doc_id"] for r in out2]
    assert all(r["weight"] > 0 for r in out1)


def test_weighted_sample_weight_proportional(spark):
    """Heavy rows dominate the sample: 100 docs at weight 10000 vs
    100 at weight 1 — with inclusion odds ~10000:1 per pair, a
    20-sample containing more than a couple of light docs would be a
    (1e-3)-probability event under correct A-Res."""
    rows = [(i, "heavy", 10000) for i in range(100)]
    rows += [(100 + i, "light", 1) for i in range(100)]
    out = weighted_sample(_docs(spark, rows), k=20).collect()
    n_heavy = sum(1 for r in out if r["source"] == "heavy")
    assert n_heavy >= 18


def test_weighted_sample_plan_is_take_ordered(spark):
    """The global top-k must compile to TakeOrderedAndProject (per-
    partition heaps), never a global Sort shuffle."""
    d = _docs(spark, [(i, "s", i + 1) for i in range(50)])
    plan = weighted_sample(d, k=5)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "Exchange rangepartitioning" not in plan


def test_jl_project_preserves_relative_distances(spark):
    """JL with +/-1 signs: projected squared distances concentrate
    around the originals. We check rank agreement: a pair FAR apart
    in the original space must project farther than a pair that is
    close (factor 100 separation leaves room for dim_out=16
    distortion)."""
    import random

    rng = random.Random(7)
    base = [rng.uniform(-1, 1) for _ in range(64)]
    near = [x + rng.uniform(-0.01, 0.01) for x in base]
    far = [rng.uniform(-1, 1) for _ in range(64)]
    emb = spark.createDataFrame(
        [(0, base, 0), (1, near, 0), (2, far, 0)],
        "vec_id long, embedding array<double>, label int",
    ).withColumn("embedding", F.col("embedding").cast("array<float>"))
    proj = {
        (r["vec_id"], r["dim"]): r["proj"] for r in jl_project(emb).collect()
    }
    assert len(proj) == 3 * 16

    def dist(a, b):
        return math.sqrt(
            sum(
                (proj[(a, d)] - proj[(b, d)]) ** 2
                for d in range(1, 17)
            )
        )

    assert dist(0, 1) < dist(0, 2)


def test_jl_project_is_linear_in_scale(spark):
    """Projection of 2x is exactly 2x the projection (up to the 6dp
    output rounding) — pins the transform as the linear map it claims
    to be."""
    v = [0.25 * ((j % 5) - 2) for j in range(64)]
    emb = spark.createDataFrame(
        [(0, v, 0), (1, [2 * x for x in v], 0)],
        "vec_id long, embedding array<float>, label int",
    )
    proj = {
        (r["vec_id"], r["dim"]): r["proj"] for r in jl_project(emb).collect()
    }
    for d in range(1, 17):
        assert abs(proj[(1, d)] - 2 * proj[(0, d)]) < 1e-5


def test_weighted_sample_by_source_covers_small_sources(spark):
    """Per-source k: a tiny source still gets rows (global sampling
    would crowd it out), and no source exceeds k."""
    from flink_ecommerce_spark.operators.sampling import (
        weighted_sample_by_source,
    )

    rows = [(i, "big", 100) for i in range(200)]
    rows += [(1000 + i, "tiny", 100) for i in range(3)]
    out = weighted_sample_by_source(_docs(spark, rows), k_per_source=5).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r["source"], []).append(r["doc_id"])
    assert len(by_src["big"]) == 5
    assert sorted(by_src["tiny"]) == [1000, 1001, 1002]  # all 3 kept


def test_countmin_overestimates_never_under(spark):
    """The defining CM property: min-of-cells >= true count for every
    term, with equality for collision-free cells."""
    from flink_ecommerce_spark import catalog
    from flink_ecommerce_spark.operators.sketch import countmin_estimates

    from tests.conftest import SF_SMALL

    docs = catalog.table(spark, SF_SMALL, "documents")
    rows = countmin_estimates(docs, k=50).collect()
    # the synthetic vocab is small; k caps, it doesn't pad
    assert 1 <= len(rows) <= 50
    assert all(r["n_est"] >= r["n_true"] for r in rows)


def test_countmin_sketch_is_mergeable(spark):
    """Cell-wise addition of two half-corpus sketches equals the
    full-corpus sketch — the property that lets daily sketches merge
    into monthly ones without reprocessing."""
    from pyspark.sql import functions as F

    from flink_ecommerce_spark import catalog
    from flink_ecommerce_spark.operators.sketch import countmin_sketch

    from tests.conftest import SF_SMALL

    docs = catalog.table(spark, SF_SMALL, "documents")
    full = {
        (r["j"], r["bucket"]): r["n"] for r in countmin_sketch(docs).collect()
    }
    a = countmin_sketch(docs.filter(F.col("doc_id") % 2 == 0)).collect()
    b = countmin_sketch(docs.filter(F.col("doc_id") % 2 == 1)).collect()
    merged: dict = {}
    for r in list(a) + list(b):
        merged[(r["j"], r["bucket"])] = merged.get((r["j"], r["bucket"]), 0) + r["n"]
    assert merged == full


def test_countmin_strict_overestimate_under_forced_collisions(spark):
    """Width 2 forces collisions: estimates must still bound true
    counts from above, and at least one term must be STRICTLY
    overestimated (proof the collision path is exercised)."""
    from flink_ecommerce_spark.operators.sketch import countmin_estimates

    rows = [
        (i, f"term{i} term{i} filler{i % 7}", "en", "s", 10) for i in range(40)
    ]
    d = _docs_text(spark, rows)
    out = countmin_estimates(d, k=100, depth=2, width=2).collect()
    assert all(r["n_est"] >= r["n_true"] for r in out)
    assert any(r["n_est"] > r["n_true"] for r in out)


def _docs_text(spark, rows):
    return spark.createDataFrame(rows, DOCUMENTS_SCHEMA)


def test_temperature_mixture_rebalances_toward_small_sources(spark):
    from flink_ecommerce_spark.operators.sampling import (
        temperature_mixture,
        temperature_mixture_summary,
    )

    # 100 small-source docs vs 400 big-source docs, target_frac 0.5:
    # z = sqrt(100) + sqrt(400) = 30; rates = 0.5*500*(10/30)/100 and
    # 0.5*500*(20/30)/400 -> small keeps at 0.833333, big at 0.416667
    rows = [(i, "small" if i < 100 else "big", 10) for i in range(500)]
    d = _docs(spark, rows)
    summary = {r["source"]: r for r in temperature_mixture_summary(d).collect()}
    assert summary["small"]["keep_rate_ppm"] == 833333
    assert summary["big"]["keep_rate_ppm"] == 416667
    # raw share of small = 0.2; temperature share strictly larger
    kept = temperature_mixture(d)
    small_kept = summary["small"]["n_kept"]
    total_kept = small_kept + summary["big"]["n_kept"]
    assert small_kept / total_kept > 0.2
    # keep decision is a pure row function: rerun agrees exactly
    a = {(r["doc_id"], r["kept"]) for r in kept.collect()}
    b = {(r["doc_id"], r["kept"]) for r in temperature_mixture(d).collect()}
    assert a == b


def test_temperature_mixture_rate_clamps_at_one(spark):
    from flink_ecommerce_spark.operators.sampling import (
        temperature_mixture_summary,
    )

    # tiny source next to a giant one: quota exceeds the source size,
    # rate clamps to 1.0 (never oversamples without replacement)
    rows = [(i, "tiny" if i < 4 else "giant", 10) for i in range(1000)]
    summary = {
        r["source"]: r
        for r in temperature_mixture_summary(_docs(spark, rows)).collect()
    }
    assert summary["tiny"]["keep_rate_ppm"] == 1_000_000
    assert summary["tiny"]["n_kept"] == 4

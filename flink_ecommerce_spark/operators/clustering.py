"""K-means over the embeddings table as pure DataFrame algebra.

Lloyd's algorithm with ENGINE-PORTABLE determinism: centroids
initialize from the k lowest vec_ids, the iteration count is fixed,
updated centroid means are quantized to 6 decimals and distances to 9
decimals before the argmin — so every run, an independent NumPy
reference (tests/test_kmeans.py), AND a pure-SQL engine (the unrolled
DuckDB oracle, ``kmeans_oracle_sql``) produce identical assignments:
cross-engine float drift lives in the low-order bits that summation
order perturbs (~1e-15 relative), far below the quantization steps,
and exact post-rounding distance ties resolve to the LOWEST cluster
index in every implementation. Same pattern as supplier_pagerank's
unrolled-CTE oracle (operators/graph.py) and the portable HLL.
No MLlib dependency: each round is

    assign:  corpus × broadcast(centroids k×d) → argmin distance
    update:  groupBy(cluster) → per-dimension mean (posexplode)

Scale notes: per round the corpus is scanned once; the shuffle
carries (cluster, dim, partial-sum) — k×d×partitions rows, never
vectors. Centroids collect to the driver between rounds (k×d doubles
— tiny by construction). This is exactly how MLlib's k-means moves
data, minus its sampling-based init.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.vector import dot  # noqa: F401  (re-exported convenience)

DEFAULT_K = 8
DEFAULT_ITER = 5


def _sq_dist_to(cvec: list[float]):
    arr = F.array(*[F.lit(float(x)) for x in cvec])

    def d(emb_col):
        return F.aggregate(
            F.zip_with(
                emb_col, arr, lambda x, c: (x.cast("double") - c) * (x.cast("double") - c)
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    return d


def kmeans_assign(
    embeddings: DataFrame, k: int = DEFAULT_K, n_iter: int = DEFAULT_ITER
) -> DataFrame:
    """Returns (vec_id, cluster) after ``n_iter`` Lloyd rounds with
    init = embeddings of the k smallest vec_ids."""
    init = (
        embeddings.orderBy("vec_id")
        .limit(k)
        .select("embedding")
        .collect()
    )
    centroids = [[float(x) for x in r["embedding"]] for r in init]

    corpus = embeddings.select("vec_id", "embedding")
    assigned = None
    for it in range(n_iter):
        # distances quantized to 9dp: makes the argmin identical
        # across engines (see module docstring) — post-rounding ties
        # fall to the lowest cluster index below
        dist_cols = [
            F.round(_sq_dist_to(c)(F.col("embedding")), 9).alias(f"d{i}")
            for i, c in enumerate(centroids)
        ]
        with_d = corpus.select("vec_id", "embedding", *dist_cols)
        # argmin with index tie-break: least() gives the min value;
        # pick the first index attaining it
        min_d = F.least(*[F.col(f"d{i}") for i in range(len(centroids))])
        cluster = F.lit(None).cast("int")
        for i in reversed(range(len(centroids))):
            cluster = F.when(F.col(f"d{i}") == min_d, F.lit(i)).otherwise(cluster)
        assigned = with_d.select("vec_id", "embedding", cluster.alias("cluster"))

        if it == n_iter - 1:
            # the returned assignment uses the centroids from the
            # START of this iteration (the oracle only assigns on
            # round n_iter) — computing and discarding one more
            # centroid update would waste a distributed aggregation
            # + driver collect (ADVICE r05)
            break
        new_rows = (
            assigned.select("cluster", F.posexplode("embedding").alias("dim", "v"))
            .groupBy("cluster", "dim")
            # 6dp quantization — the cross-engine determinism anchor;
            # F.round is HALF_UP like DuckDB's ROUND (Python round()
            # would be banker's)
            .agg(F.round(F.avg(F.col("v").cast("double")), 6).alias("m"))
            .collect()
        )
        by_cluster: dict[int, dict[int, float]] = {}
        for r in new_rows:
            by_cluster.setdefault(r["cluster"], {})[r["dim"]] = r["m"]
        dim = len(centroids[0])
        centroids = [
            [by_cluster.get(i, {}).get(d, centroids[i][d]) for d in range(dim)]
            for i in range(len(centroids))
        ]
    return assigned.select("vec_id", "cluster")


def kmeans_sizes(embeddings: DataFrame, k: int = DEFAULT_K, n_iter: int = DEFAULT_ITER) -> DataFrame:
    """Cluster cardinalities — the compact, registry-friendly output."""
    return (
        kmeans_assign(embeddings, k, n_iter)
        .groupBy("cluster")
        .agg(F.count(F.lit(1)).alias("n_vectors"))
    )


def kmeans_oracle_sql(k: int = DEFAULT_K, n_iter: int = DEFAULT_ITER) -> str:
    """Exact DuckDB twin of ``kmeans_sizes``: the ``n_iter`` Lloyd
    rounds unrolled as CTEs (assign aᵢ from centroids cᵢ₋₁, update cᵢ
    from aᵢ), the same pattern as supplier_pagerank's unrolled oracle.
    Portability anchors mirror the Spark side exactly: centroid means
    ROUND(·, 6), distances ROUND(·, 9) with post-rounding argmin ties
    falling to the lowest cluster index (row_number ORDER BY d,
    cluster), empty clusters carrying the previous round's centroid
    per dimension (COALESCE over the dim grid). The squared distance
    uses the |x|²+|c|²−2x·c expansion — it differs from Spark's fold
    by ≤ ~1e-13, which the 9dp quantization absorbs."""
    dist = (
        "ROUND(list_inner_product(emb.e, emb.e)"
        " + list_inner_product({c}.c, {c}.c)"
        " - 2 * list_inner_product(emb.e, {c}.c), 9)"
    )
    parts = [
        "WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e"
        " FROM embeddings),",
        "c0 AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT)"
        " AS cluster, e AS c FROM"
        f" (SELECT vec_id, e FROM emb ORDER BY vec_id LIMIT {k})),",
    ]
    for i in range(1, n_iter + 1):
        prev = f"c{i - 1}"
        d = dist.format(c=prev)
        parts.append(
            f"a{i} AS (SELECT vec_id, e, cluster FROM ("
            f"SELECT emb.vec_id, emb.e, {prev}.cluster,"
            f" row_number() OVER (PARTITION BY emb.vec_id"
            f" ORDER BY {d}, {prev}.cluster) AS rn"
            f" FROM emb CROSS JOIN {prev}) WHERE rn = 1),"
        )
        if i == n_iter:
            break  # the final round only assigns (matches the Spark loop)
        parts.append(
            f"m{i} AS (SELECT a.cluster, s.i - 1 AS dim,"
            f" ROUND(AVG(a.e[s.i]), 6) AS m"
            f" FROM a{i} a, UNNEST(generate_series(1, len(a.e))) AS s(i)"
            f" GROUP BY 1, 2),"
        )
        parts.append(
            f"c{i} AS (SELECT g.cluster,"
            f" list(COALESCE(m{i}.m, g.cv) ORDER BY g.dim) AS c FROM"
            f" (SELECT {prev}.cluster, s.i - 1 AS dim, {prev}.c[s.i] AS cv"
            f" FROM {prev}, UNNEST(generate_series(1, len({prev}.c)))"
            f" AS s(i)) g"
            f" LEFT JOIN m{i} ON m{i}.cluster = g.cluster"
            f" AND m{i}.dim = g.dim GROUP BY g.cluster),"
        )
    parts[-1] = parts[-1].rstrip(",")
    parts.append(
        f"SELECT cluster, COUNT(*) AS n_vectors FROM a{n_iter}"
        " GROUP BY cluster"
    )
    return "\n".join(parts)

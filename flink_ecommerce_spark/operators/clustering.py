"""K-means over the embeddings table as pure DataFrame algebra.

Lloyd's algorithm with DETERMINISTIC behavior: centroids initialize
from the k lowest vec_ids and the iteration count is fixed, so every
run (and an independent NumPy reference — tests/test_kmeans.py)
produces identical assignments. No MLlib dependency: each round is

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
    for _ in range(n_iter):
        dist_cols = [
            _sq_dist_to(c)(F.col("embedding")).alias(f"d{i}")
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

        new_rows = (
            assigned.select("cluster", F.posexplode("embedding").alias("dim", "v"))
            .groupBy("cluster", "dim")
            .agg(F.avg(F.col("v").cast("double")).alias("m"))
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

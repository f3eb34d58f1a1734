"""Count-Min sketch over the corpus term stream (Cormode &
Muthukrishnan 2005) — fixed-size frequency summaries for 100 TB
streams.

Exact term counting (``vocabulary``) shuffles one row per distinct
term; at web scale the distinct-term table itself is the problem. A
Count-Min sketch bounds the summary at DEPTH × WIDTH counters
regardless of corpus size: counter[j][h_j(term) % WIDTH] sums every
occurrence, a point estimate is min_j(counter[j][h_j(term)]) — an
OVERestimate (collisions only add), within eN/WIDTH of truth with
probability 1 - exp(-DEPTH), and mergeable across partitions/days by
cell-wise addition (it's a sum — exactly what a map-side-combined
groupBy computes).

Because the row hashes come from the portable md5 family, the sketch
itself is oracle-checkable: DuckDB builds the bit-identical counter
table. The estimate query joins each distinct term's DEPTH cells back
to the sketch and takes the min — and the overestimate property
(est >= true count, always) is pinned in tests.

Scale notes: building is one explode + one groupBy of (j, bucket) —
the shuffle carries at most DEPTH × WIDTH partial cells per map task
no matter how many terms flow through. The estimate path exists for
verification/lookup; a production pipeline ships the DEPTH×WIDTH
table (a few KB) to wherever point queries run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.portable import hash32, sql_hash32
from .textprep import words

CM_DEPTH = 4
CM_WIDTH = 256


def _cm_cells(term: F.Column, depth: int, width: int) -> F.Column:
    """array<struct<j, bucket>> — the term's one cell per row."""
    return F.array(
        *[
            F.struct(
                F.lit(j).alias("j"),
                (hash32(term, salt=f"cm{j}") % width).cast("int").alias(
                    "bucket"
                ),
            )
            for j in range(depth)
        ]
    )


def countmin_sketch(
    documents: DataFrame, depth: int = CM_DEPTH, width: int = CM_WIDTH
) -> DataFrame:
    """(j, bucket, n) — the populated counter cells (absent cell =
    0). One pass: explode words, explode each word's depth cells,
    count."""
    terms = documents.select(F.explode(words("text")).alias("term"))
    cells = terms.select(
        F.explode(_cm_cells(F.col("term"), depth, width)).alias("c")
    )
    return (
        cells.groupBy(F.col("c.j").alias("j"), F.col("c.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


def countmin_estimates(
    documents: DataFrame,
    k: int = 20,
    depth: int = CM_DEPTH,
    width: int = CM_WIDTH,
) -> DataFrame:
    """Top-k terms by TRUE count with their sketch estimate alongside
    — the verification view (est >= n_true always; equality when the
    term's cells are collision-free). Output: (term, n_true, n_est).

    The distinct-term frame exists here only to audit the sketch;
    the sketch itself never materializes it."""
    sketch = countmin_sketch(documents, depth, width)
    true_counts = (
        documents.select(F.explode(words("text")).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("n_true"))
    )
    cells = true_counts.select(
        "term",
        "n_true",
        F.explode(_cm_cells(F.col("term"), depth, width)).alias("c"),
    ).select("term", "n_true", F.col("c.j").alias("j"), F.col("c.bucket").alias("bucket"))
    est = (
        cells.join(sketch, ["j", "bucket"])
        .groupBy("term", "n_true")
        .agg(F.min("n").alias("n_est"))
    )
    return (
        est.orderBy(F.desc("n_true"), F.asc("term"))
        .limit(k)
        .select("term", "n_true", "n_est")
    )


def sql_countmin_sketch(depth: int = CM_DEPTH, width: int = CM_WIDTH) -> str:
    """DuckDB oracle for ``countmin_sketch``."""
    from .textprep import sql_words

    cells = "\nUNION ALL\n".join(
        f"SELECT {j} AS j, CAST(({sql_hash32('term', salt=f'cm{j}')} % {width}) AS INT) AS bucket FROM terms"
        for j in range(depth)
    )
    return f"""
WITH terms AS (SELECT unnest({sql_words('text')}) AS term FROM documents),
cells AS ({cells})
SELECT j, bucket, COUNT(*) AS n FROM cells GROUP BY 1, 2
"""


def sql_countmin_estimates(
    k: int = 20, depth: int = CM_DEPTH, width: int = CM_WIDTH
) -> str:
    """DuckDB oracle for ``countmin_estimates``."""
    from .textprep import sql_words

    cells = "\nUNION ALL\n".join(
        f"SELECT {j} AS j, CAST(({sql_hash32('term', salt=f'cm{j}')} % {width}) AS INT) AS bucket FROM terms"
        for j in range(depth)
    )
    tcells = "\nUNION ALL\n".join(
        f"SELECT term, n_true, {j} AS j, "
        f"CAST(({sql_hash32('term', salt=f'cm{j}')} % {width}) AS INT) AS bucket "
        f"FROM true_counts"
        for j in range(depth)
    )
    return f"""
WITH terms AS (SELECT unnest({sql_words('text')}) AS term FROM documents),
cells AS ({cells}),
sketch AS (SELECT j, bucket, COUNT(*) AS n FROM cells GROUP BY 1, 2),
true_counts AS (SELECT term, COUNT(*) AS n_true FROM terms GROUP BY 1),
tcells AS ({tcells}),
est AS (SELECT t.term, t.n_true, MIN(s.n) AS n_est
        FROM tcells t JOIN sketch s ON s.j = t.j AND s.bucket = t.bucket
        GROUP BY 1, 2)
SELECT term, n_true, n_est FROM est
ORDER BY n_true DESC, term ASC
LIMIT {k}
"""

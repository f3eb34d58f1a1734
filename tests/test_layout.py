"""Partitioned layout: round trip, partition pruning visible in the
plan, and a hypothesis property test for the engine-portable hash."""

from __future__ import annotations

import hashlib

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from flink_ecommerce_spark import catalog
from flink_ecommerce_spark.functions.portable import sql_hash32
from flink_ecommerce_spark.sources.layout import (
    read_events_partitioned,
    write_events_partitioned,
)

from tests.conftest import SF_SMALL


def test_partitioned_roundtrip_and_pruning(spark, tmp_path):
    events = catalog.table(spark, SF_SMALL, "events")
    out = str(tmp_path / "events_by_day")
    write_events_partitioned(events, out)

    back = read_events_partitioned(spark, out)
    assert back.count() == events.count()

    pruned = back.filter(F.col("dt") == "2024-01-05")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(dt" in plan, plan[:800]
    expected = events.filter(F.to_date("ts") == "2024-01-05").count()
    assert pruned.count() == expected


@settings(max_examples=200, deadline=None)
@given(st.text(min_size=0, max_size=60))
def test_portable_hash_matches_python_and_duckdb(s):
    """hash32 contract: int(md5[:8], 16) identical in python/duckdb
    (the Spark side is covered by every oracle test using hash32)."""
    expected = int(hashlib.md5(s.encode("utf-8")).hexdigest()[:8], 16)
    con = duckdb.connect()
    got = con.execute(
        f"SELECT {sql_hash32('s')} FROM (SELECT ? AS s)", [s]
    ).fetchone()[0]
    con.close()
    assert got == expected, repr(s)


def test_clustered_layout_has_disjoint_tight_rowgroups(spark, tmp_path):
    """write_clustered must produce files whose row-group min/max
    ranges on the cluster key are (a) tight and (b) pairwise disjoint
    across files — the property parquet readers skip on. A naive
    unsorted write has every row group spanning the whole domain."""
    import glob

    import pyarrow.parquet as pq

    events = catalog.table(spark, SF_SMALL, "events")
    out = str(tmp_path / "events_by_user")
    from flink_ecommerce_spark.sources.layout import write_clustered

    write_clustered(events, out, ["user_id"], n_files=8)

    spans = []
    for f in glob.glob(out + "/*.parquet"):
        md = pq.ParquetFile(f).metadata
        col_idx = next(
            i for i in range(len(md.schema))
            if md.schema.column(i).name == "user_id"
        )
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(col_idx).statistics
            spans.append((st.min, st.max))
    assert len(spans) >= 4  # actually split across files
    spans.sort()
    for (lo1, hi1), (lo2, hi2) in zip(spans, spans[1:]):
        assert hi1 <= lo2, f"overlapping row groups: {(lo1, hi1)} {(lo2, hi2)}"

    # a point read touches exactly one span
    probe = spans[len(spans) // 2][0]
    hits = [s for s in spans if s[0] <= probe <= s[1]]
    assert len(hits) == 1

    # and the clustered copy is lossless
    back = spark.read.parquet(out)
    assert back.count() == events.count()
    assert (
        back.filter(F.col("user_id") == probe).count()
        == events.filter(F.col("user_id") == probe).count()
    )


def test_training_shards_fixed_size_and_roundtrip(spark, tmp_path):
    """Shard export: ~n/rows_per_shard files, none above the cap,
    contents lossless, shard membership follows the global order."""
    import glob

    import pyarrow.parquet as pq

    docs = catalog.table(spark, SF_SMALL, "documents")
    n = docs.count()
    out = str(tmp_path / "shards")
    from flink_ecommerce_spark.sources.layout import write_training_shards

    n_parts = write_training_shards(docs, out, rows_per_shard=100)
    assert n_parts == (n + 99) // 100
    files = sorted(glob.glob(f"{out}/part-*.parquet"))
    assert len(files) >= n_parts
    ranges = []
    for f in files:
        t = pq.read_table(f, columns=["doc_id"])
        assert t.num_rows <= 100
        if t.num_rows:
            ids = t.column("doc_id").to_pylist()
            ranges.append((min(ids), max(ids)))
    # shards tile the doc_id order: ranges are pairwise disjoint
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 < lo2
    back = spark.read.parquet(out)
    assert back.count() == n
    assert {r["doc_id"] for r in back.select("doc_id").collect()} == {
        r["doc_id"] for r in docs.select("doc_id").collect()
    }


def test_schema_violations_contract_check(spark):
    from pyspark.sql.types import (
        DoubleType, LongType, StringType, StructField, StructType,
    )

    from flink_ecommerce_spark.catalog import schema_violations

    expected = StructType([
        StructField("id", LongType()),
        StructField("name", StringType()),
        StructField("score", DoubleType()),
    ])
    ok = spark.createDataFrame([(1, "a", 0.5)], expected)
    assert schema_violations(ok, expected) == []

    drifted = spark.createDataFrame(
        [(1, 2, "x")], "id long, score long, extra string"
    )
    issues = schema_violations(drifted, expected)
    assert sorted(issues) == [
        "missing column name (string)",
        "type mismatch score: expected double, got bigint",
        "unexpected column extra (string)",
    ]


def test_fixture_tables_match_declared_schemas(spark):
    """The engine's own contracts hold on the driver fixtures for the
    LLM-pipeline tables (events ts intentionally varies between
    int64-nanos and timestamp across fixture generations — catalog
    normalizes it, so events is checked post-load elsewhere)."""
    from flink_ecommerce_spark import schemas
    from flink_ecommerce_spark.catalog import schema_violations, table

    for name, expected in (
        ("documents", schemas.DOCUMENTS_SCHEMA),
        ("embeddings", schemas.EMBEDDINGS_SCHEMA),
    ):
        df = table(spark, SF_SMALL, name)
        assert schema_violations(df, expected) == [], name


def test_zorder_key_matches_python_interleave(spark):
    """The codegen Morton key must equal a literal python bit
    interleave over the same normalization."""
    import math

    from flink_ecommerce_spark.sources.layout import zorder_key

    bits, k = 4, 2
    lo, hi = (0, 0), (15, 15)
    rows = [(x, y) for x in range(16) for y in range(16)]
    df = spark.createDataFrame(rows, "x int, y int")
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.withColumn(
            "z", zorder_key([F.col("x"), F.col("y")], bits, list(lo), list(hi))
        ).collect()
    }
    top = (1 << bits) - 1
    for x, y in rows:
        key = 0
        for ci, (v, l, h) in enumerate(((x, lo[0], hi[0]), (y, lo[1], hi[1]))):
            span = (h - l) or 1
            s = min(top, max(0, math.floor((v - l) / span * top)))
            for bi in range(bits):
                key |= ((s >> bi) & 1) << (bi * k + ci)
        assert got[(x, y)] == key, (x, y, got[(x, y)], key)


def test_zorder_beats_lexicographic_for_trailing_dim(spark, tmp_path):
    """The point of Z-order: a predicate on the SECOND dimension
    touches few range-partitions under the Morton key but nearly all
    of them under lexicographic (x, y) clustering — measured with
    spark_partition_id over the same repartitionByRange width."""
    from flink_ecommerce_spark.sources.layout import zorder_key

    n_parts = 16
    rows = [(x, y) for x in range(64) for y in range(64)]
    df = spark.createDataFrame(rows, "x int, y int")

    def touched(clustered):
        pids = (
            clustered.withColumn("pid", F.spark_partition_id())
            .filter((F.col("y") >= 8) & (F.col("y") < 16))
            .select("pid")
            .distinct()
            .count()
        )
        return pids

    zed = df.withColumn(
        "__z", zorder_key([F.col("x"), F.col("y")], 6, [0, 0], [63, 63])
    ).repartitionByRange(n_parts, "__z")
    lex = df.repartitionByRange(n_parts, "x", "y")
    t_z, t_lex = touched(zed), touched(lex)
    # lex scatters the y-band across every x slice; z keeps it local
    assert t_lex == n_parts
    assert t_z < t_lex / 2, (t_z, t_lex)


def test_write_zordered_roundtrip(spark, tmp_path):
    from flink_ecommerce_spark.sources.layout import write_zordered

    events = catalog.table(spark, SF_SMALL, "events")
    out = str(tmp_path / "events_z")
    write_zordered(events, out, ["user_id", "value"], n_files=4)
    back = spark.read.parquet(out)
    assert back.count() == events.count()
    assert "__zkey" not in back.columns
    assert set(back.columns) == set(events.columns)


def test_export_curated_shards_roundtrip(spark, tmp_path):
    from flink_ecommerce_spark.operators.text import curation_drop_reasons
    from flink_ecommerce_spark.sources.layout import export_curated_shards

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out_dir = str(tmp_path / "curated")
    stats = export_curated_shards(docs, out_dir, n_shards=4)
    back = spark.read.parquet(out_dir)
    assert back.count() == stats["n_docs"] > 0
    # every exported doc is a funnel survivor, and every survivor is exported
    kept = {
        r["doc_id"]
        for r in curation_drop_reasons(docs).collect()
        if r["dropped_at"] == "kept"
    }
    assert {r["doc_id"] for r in back.select("doc_id").collect()} == kept
    # physical layout: one directory per non-empty shard, all within range
    shard_vals = {r["shard"] for r in back.select("shard").distinct().collect()}
    assert shard_vals <= set(range(4)) and len(shard_vals) >= 1


def test_compact_parquet_reduces_files_preserves_rows(spark, tmp_path):
    from flink_ecommerce_spark.sources.layout import compact_parquet

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    frag = str(tmp_path / "fragmented")
    docs.repartition(50).write.parquet(frag)
    out = str(tmp_path / "compacted")
    stats = compact_parquet(spark, frag, out, target_mb=64)
    back = spark.read.parquet(out)
    assert stats["input_files"] == 50
    assert stats["output_files"] < 50
    assert len(back.inputFiles()) == stats["output_files"]
    assert back.count() == docs.count()
    # content identical, not just counts
    assert back.exceptAll(docs).count() == 0 and docs.exceptAll(back).count() == 0

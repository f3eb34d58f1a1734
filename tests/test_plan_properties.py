"""Physical-plan regression tests: pin the plan properties that make
these queries scale (pushdown reaching scans, broadcasts on dims,
TakeOrderedAndProject for top-k, single-Exchange aggregations). A
code change that silently loses one of these still passes value
checks — these tests are the guard."""

from __future__ import annotations

import pytest

from flink_ecommerce_spark import registry

from tests.conftest import SF_SMALL


def _plan(spark, name: str) -> str:
    df = registry.SPECS[name].fn(spark, SF_SMALL)
    return df._jdf.queryExecution().executedPlan().toString()


def test_q1_filter_pushed_to_scan(spark):
    plan = _plan(spark, "q1_pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan


def test_q3_dimensions_broadcast(spark):
    plan = _plan(spark, "q3_shipping_priority")
    assert plan.count("BroadcastHashJoin") >= 2
    assert "TakeOrderedAndProject" in plan
    assert "PushedFilters: [IsNotNull(c_mktsegment), EqualTo(c_mktsegment,BUILDING)" in plan


def test_q5_no_fact_broadcast_of_lineitem(spark):
    plan = _plan(spark, "q5_regional_revenue")
    # all dims broadcast; the lineitem-orders join may be SMJ (scale
    # plan) or AQE-converted broadcast at this tiny SF — but lineitem
    # itself must never be the build (broadcast) side
    assert "BroadcastHashJoin" in plan
    for line in plan.splitlines():
        if "BroadcastExchange" in line:
            assert "lineitem" not in line


def test_top10_uses_take_ordered(spark):
    plan = _plan(spark, "top10_orders")
    assert "TakeOrderedAndProject" in plan
    assert "Sort " not in plan  # no global sort operator


def test_sales_per_day_single_shuffle(spark):
    plan = _plan(spark, "sales_per_day")
    assert plan.count("Exchange hashpartitioning") == 1
    # pruned columns — ts arrives as int64-nanos or timestamp
    # depending on how the parquet fixture was written
    assert (
        "ReadSchema: struct<ts:bigint,value:double>" in plan
        or "ReadSchema: struct<ts:timestamp_ntz,value:double>" in plan
        or "ReadSchema: struct<ts:timestamp,value:double>" in plan
    )


def test_sales_per_day_partial_aggregation(spark):
    plan = _plan(spark, "sales_per_day")
    # partial (map-side) + final aggregate pattern
    assert plan.count("HashAggregate") >= 2


def test_knn_broadcasts_queries_not_corpus(spark):
    plan = _plan(spark, "knn_bruteforce")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


@pytest.mark.parametrize(
    "name", ["minhash_signatures", "lsh_candidate_pairs", "simhash"]
)
def test_dedup_plans_have_no_cartesian(spark, name):
    plan = _plan(spark, name)
    assert "CartesianProduct" not in plan


def test_user_value_quartiles_no_single_partition_exchange(spark):
    # round-1 regression: the global ntile/percent_rank window forced
    # every per-user row through ONE task (Exchange SinglePartition).
    # The distributed-rank rewrite must never reintroduce it.
    # (the range-repartition itself runs inside the checkpointed
    # pre-job, so the visible plan starts at the checkpoint scan and
    # windows over hashpartitioning(pid) — never one partition)
    plan = _plan(spark, "user_value_quartiles")
    assert "SinglePartition" not in plan
    assert "Exchange hashpartitioning(pid" in plan


def test_budgeted_mixture_no_per_source_serial_window(spark):
    # the greedy budget cumsum must NOT run as one window partition
    # per source (a handful of dominant sources would serialize at
    # scale): the full-row window partitions by (source, quality
    # bucket), and only the tiny per-bucket offset table windows by
    # source alone
    import re

    plan = _plan(spark, "budgeted_mixture")
    assert "SinglePartition" not in plan
    assert re.search(r"hashpartitioning\(source#\d+, __qb#\d+", plan), plan
    # the bucket offsets join back as a broadcast, not a shuffle
    assert "BroadcastHashJoin" in plan


def test_simhash_no_bit_explode(spark):
    # votes are conditional aggregates over token rows; the bits×
    # (doc_id, h, bit) explode must stay gone from the plan
    plan = _plan(spark, "simhash")
    assert "sequence(0, 31" not in plan
    assert "sequence(0, 63" not in plan


def test_corpus_funnel_single_text_scan(spark):
    # r09: ONE scan fills the checkpointed flag frame — including the
    # per-doc shingle arrays the decontamination stage reads — so the
    # executed plan touches parquet ZERO times (the single corpus scan
    # ran at construction, into the checkpoint). Re-introducing a
    # decontaminate(documents) call here would re-scan the corpus
    # twice and fail this count.
    plan = _plan(spark, "corpus_funnel")
    assert plan.count("FileScan parquet") == 0, plan
    assert "Scan ExistingRDD" in plan  # the checkpointed flag frame


def test_semantic_dedup_single_corpus_pass(spark):
    # the IVF centroid-build/argmin subtree must run once into the
    # checkpoint: the executed plan reads only the materialized
    # assignment, never the parquet corpus
    plan = _plan(spark, "semantic_dedup")
    assert "FileScan parquet" not in plan, plan
    assert plan.count("Scan ExistingRDD") >= 3


def test_pq_adc_broadcasts_lookup_never_embeddings(spark):
    """pq_ann_topk: the probe plan joins the MATERIALIZED codes table
    (encode ran in its own job — an ExistingRDD scan here, the
    persisted compressed corpus) against the broadcast distance
    table; no encode work and no embedding column may appear past
    the materialization boundary."""
    plan = _plan(spark, "pq_ann_topk")
    assert plan.count("BroadcastHashJoin") >= 1
    assert "ExistingRDD" in plan  # checkpointed codes + dtable
    assert "partial_min" not in plan  # encode argmin not re-run
    for line in plan.splitlines():
        # every shuffle past encode moves (query_id, vec_id, m, code,
        # d2m)-shaped rows, never vectors
        if "Exchange hashpartitioning" in line:
            assert "embedding" not in line, line


def test_pq_encode_argmin_is_aggregated_not_windowed(spark):
    """Encode argmin must be the min-struct aggregation with map-side
    partials, not a per-(vector, subspace) row_number window over all
    candidate rows. The ONE permitted window is the codebook's seed
    numbering, which sits on a TakeOrderedAndProject(limit=PQ_N_CODES)
    frame — corpus-size-independent."""
    plan = _plan(spark, "pq_codes")
    assert "partial_min(struct(d2" in plan
    assert plan.count("Window") <= 1
    assert "TakeOrderedAndProject(limit=32" in plan


def test_weighted_sample_no_exchange_at_all(spark):
    """Global top-k by score compiles to TakeOrderedAndProject over
    the scan: zero Exchange operators in the whole plan."""
    plan = _plan(spark, "weighted_sample")
    assert "TakeOrderedAndProject" in plan
    assert "Exchange" not in plan


def test_jl_project_is_scan_shaped(spark):
    """Projection is Generate over per-row folds: no Exchange, no
    join, no aggregation."""
    plan = _plan(spark, "jl_project")
    assert "Exchange" not in plan
    assert "Join" not in plan


def test_ivf_pq_no_embedding_past_adc_exchange(spark):
    """ivf_pq_topk: like raw ADC, the candidate-scoring shuffles move
    codes/ids only; embeddings re-enter solely for the shortlist
    re-rank joins."""
    plan = _plan(spark, "ivf_pq_topk")
    assert plan.count("BroadcastHashJoin") >= 2
    for line in plan.splitlines():
        if "Exchange hashpartitioning" in line and "adc_u" in line:
            assert "embedding" not in line, line


def test_key_skew_topk_is_take_ordered_not_global_window(spark):
    """The heavy-key probe must heap-merge its top-k
    (TakeOrderedAndProject), never sort all n_keys rows through one
    task — the rank window runs only on the already-limited rows."""
    plan = _plan(spark, "event_user_skew_topk")
    assert "TakeOrderedAndProject" in plan


def test_pit_enrichment_fact_side_never_shuffles(spark):
    """pit_enriched_events: the SCD2 dimension broadcasts and the
    interval containment rides as the join residual — the events
    (fact) scan must reach the final join with no Exchange above it.
    The plan string lists the streamed side's lineage between the
    final join and its BroadcastExchange: no hash/range Exchange may
    appear there."""
    plan = _plan(spark, "pit_enriched_events")
    head = plan.split("BroadcastExchange")[0]
    assert "BroadcastHashJoin" in head
    assert "Exchange hashpartitioning" not in head
    assert "Exchange rangepartitioning" not in head


def test_temperature_mixture_keep_is_broadcast_filter(spark):
    """The keep decision must be a broadcast join of the tiny rates
    table onto the documents scan — the corpus itself never hash-
    shuffles (the only Exchanges belong to the n_sources-row rate
    aggregates)."""
    plan = _plan(spark, "temperature_mixture")
    head = plan.split("BroadcastExchange")[0]
    assert "BroadcastHashJoin" in head
    assert "Exchange hashpartitioning" not in head


def test_shard_manifest_text_never_shuffles(spark):
    """Text reduces to md5/hash32 at the scan; no Exchange may carry
    the text column."""
    plan = _plan(spark, "shard_manifest")
    for chunk in plan.split("\n"):
        if "Exchange" in chunk:
            assert "text#" not in chunk, chunk


def test_rfm_scoring_has_no_window_or_sort(spark):
    """rfm_segments scores against broadcast percentile boundaries —
    the plan must contain no Window operator and no global sort."""
    plan = _plan(spark, "rfm_segments")
    assert "Window" not in plan
    assert "rangepartitioning" not in plan


def test_copurchase_margins_broadcast_topk_take_ordered(spark):
    plan = _plan(spark, "copurchase_pairs")
    assert "TakeOrderedAndProject" in plan
    assert plan.count("BroadcastHashJoin") >= 2  # the two margins
    # r09: pair generation is an in-task combination explode over the
    # basket arrays — no join (the old orderkey self-join re-exchanged
    # both sides) and no sort-merge anywhere in the query
    assert "SortMergeJoin" not in plan
    assert "Generate explode" in plan


def test_line_dedup_first_occurrence_is_aggregate_not_window(spark):
    """The anti-skew guarantee: the per-line first occurrence is a
    MIN-struct HashAggregate (map-side combinable), never a Window
    partitioned by line — a billion-occurrence boilerplate line must
    collapse to per-partition partials, not one window task."""
    plan = _plan(spark, "line_dedup")
    assert "Window" not in plan
    assert "HashAggregate" in plan or "ObjectHashAggregate" in plan


def test_boilerplate_census_single_aggregation_no_join(spark):
    for name in ("boilerplate_lines", "boilerplate_shingles"):
        plan = _plan(spark, name)
        assert "Join" not in plan, name
        assert "HashAggregate" in plan or "ObjectHashAggregate" in plan


def test_token_waterfill_windows_are_tiny_global(spark):
    """The rank/cumsum windows run over the #sources-row table (after
    the per-source aggregate), and the corpus-sized scan feeds ONE
    aggregation — asserted indirectly: every Window in the plan sits
    above the first HashAggregate output, and the broadcast planning
    state comes back via BroadcastNestedLoopJoin/cross of 1-row
    frames."""
    plan = _plan(spark, "token_waterfill")
    # corpus scan feeds an aggregate before any window
    agg_pos = min(
        p for p in (
            plan.find("HashAggregate"), plan.find("ObjectHashAggregate")
        ) if p != -1
    )
    win_pos = plan.find("Window")
    assert win_pos != -1 and agg_pos != -1


# ---------------------------------------------------------------- r07b ops


def test_item_neighbors_margins_broadcast_and_part_window(spark):
    plan = _plan(spark, "item_neighbors_topk")
    # catalog-sized margin tables broadcast twice; the top-k window
    # partitions BY part (never a global row_number)
    assert plan.count("BroadcastHashJoin") >= 2
    assert "windowspecdefinition(part#" in plan


def test_winnowing_zero_shuffle(spark):
    plan = _plan(spark, "winnowing_fingerprints")
    # r09: the sliding min is per-row array arithmetic — the whole
    # summary is one scan stage. No exchange, no sort, no window
    # funnel (the r08 doc-partitioned window shuffled the full
    # exploded shingle stream and broke the 10x rehearsal bar).
    assert "Exchange" not in plan
    assert "windowspecdefinition" not in plan


def test_markov_result_plan_is_bounded_local_relation(spark):
    plan = _plan(spark, "markov_attribution")
    # r09 re-plan: the walk runs driver-side over the collected
    # (channels+3)²-row matrix (the k-means bounded-artifact
    # pattern), so the RESULT plan is a |channels|-row local
    # relation — no joins, no exchanges, no scan; the only
    # data-sized Spark work is the edge build executed at
    # construction time
    assert "Exchange" not in plan
    assert "Join" not in plan
    assert "LocalTableScan" in plan or "ExistingRDD" in plan


def test_retrieval_eval_no_corpus_sort(spark):
    plan = _plan(spark, "retrieval_eval")
    # ranking happens inside bm25's query-partitioned window; the
    # |queries|-row result needs no global sort of anything big
    assert "windowspecdefinition(query_id#" in plan


def test_winnowing_overlap_no_cartesian_and_hot_broadcast(spark):
    plan = _plan(spark, "winnowing_overlap_pairs")
    # pairs come from the fingerprint-hash equi-join (never a
    # cartesian), and the df-ceiling hot list applies as a broadcast
    # anti-join before the self-join. (The only nested-loop joins are
    # the 1-row n_docs threshold crosses — the documented meter-count
    # pattern, bounded by construction.)
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin [h#" in plan
    assert "LeftAnti, BuildRight" in plan


def test_media_ahash_pairs_banded_join_payloads_stay_put(spark):
    plan = _plan(spark, "media_ahash_pairs")
    # candidates come from the band-bucket equi-join; the verify is
    # integer popcount on the joined 32-bit halves — no cartesian,
    # and the text/payload column never reaches an exchange
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    import re

    for m in re.finditer(r"Exchange hashpartitioning\(([^)]*)\)", plan):
        assert "text#" not in m.group(1)


def test_epoch_shuffle_no_corpus_range_exchange(spark):
    plan = _plan(spark, "epoch_shuffle")
    # ranks decompose by hash-prefix bucket: the corpus never passes
    # through a global range partitioning (the single-task sort)
    assert "Exchange rangepartitioning" not in plan


def test_cluster_silhouette_single_scan_k_row_output(spark):
    plan = _plan(spark, "cluster_silhouette")
    # scoring is one scan against literal centroids: no join at all
    # in the final assignment/scoring stage, one aggregate exchange
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning") == 1

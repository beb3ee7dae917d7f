"""Results must be a pure function of the DATA — identical under any
shuffle-partition count.  The oracle parity suite proves engine-vs-engine
equality at ONE partitioning; this proves the stronger claim for the
queries whose plans lean hardest on partitioning-sensitive machinery
(windows, prefix sums, hash sharding, per-partition kernels, driver-loop
checkpoints, LSH self-joins)."""

import pytest

from spark_ml_spatialjointransformer_spark.queries import QUERIES
from tests.conftest import collect_sorted

SF = "/root/testdata/sf0.001"

SENSITIVE = [
    "t12_stratified_sample",   # batch-local top-n prefilter + window
    "t13_sequence_packing",    # two-level distributed prefix sum
    "t21_shard_assign",        # hash shard + intra-shard row_number
    "d3_moving_window",        # per-user sliding frames
    "v6_knn_join",             # per-partition blocked matmul + broadcast
    "t9_dedup_keeper",         # LSH self-join + verify + keeper
    "a4_length_percentiles",   # rank selection windows
    "t29_bpe_pairs",           # global top-k window over aggregated vocab
    "t30_kmv_distinct",        # per-group rank window picks the kth hash
    "d6_snapshot_diff",        # full-outer merge + re-aggregation
    "a6_skew_salted_agg",      # two-stage salted re-aggregation
    "d7_gap_fill",             # LOCF forward-fill window over a built grid
    "d8_scd2",                 # lag + cumulative run ids + lead over runs
    "v7_maxsim_topk",          # top-k window over broadcast-join scores
    "g1_pagerank",             # iterated join-aggregate recurrence
    "v8_pq_adc_topk",          # batch-local top-k + global window
    "g2_triangles",            # checkpointed self-joins + wedge closing
    "m5_image_phash_dedup",    # mapInPandas chain + keeper window
    "m6_audio_fp_dedup",       # mapInPandas chain + keeper window
    "d12_mad_outliers",        # two rank passes + med/MAD attach joins
    "d13_ohlc_bars",           # arg-aggregate min/max structs
    "d14_trailing_window",     # RANGE frame over per-user ordered scan
    "a12_above_nation_avg",    # nation window over custkey agg
    "v9_kmeans",               # iterated broadcast e-step / m-step
    "g3_bfs_hops",             # per-round checkpointed frontier
    "p5_crossmodal_dedup",     # three stacked keeper windows
    "a13_shipping_priority",   # top-10 heap over partial aggregates
    "d15_gaps_islands",        # gap flags + running session numbering
    "t37_line_dedup",          # corpus-frequency prune + index rebuild
    "t38_hll_distinct",        # register max-merge across partitions
    "m7_scene_change",         # frame walk + lag threshold + islands
    "v10_sq8_rerank",          # two ranked windows over broadcast scores
    "g4_kcore",                # per-round checkpointed peeling
    "p7_split_leakage",        # LSH self-join + split contingency
    "a16_balance_deciles",     # ntile banding over per-nation sort
    "m8_crossformat_dedup",    # dual-codec Arrow chain
    "v11_lsh_recall",          # two ranked tiers + overlap join
    "m15_image_hamming_neardup",  # mapInPandas hash chain + band self-join
    "g15_degree_assortativity",   # LSH pairs + degree joins + moment agg
    "t60_repetition_signals",  # two per-doc gram-count max rollups
    "t61_zipf_exponent",       # per-source rank window over counts
    "d32_cusum_changepoint",   # running-sum + argmax windows per type
]


@pytest.mark.parametrize("name", SENSITIVE)
def test_result_invariant_under_partitioning(spark, name):
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        a = collect_sorted(QUERIES[name].fn(spark, SF))
        spark.conf.set("spark.sql.shuffle.partitions", "11")
        b = collect_sorted(QUERIES[name].fn(spark, SF))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert a == b, f"{name}: result depends on shuffle partitioning"
    assert len(a) > 0

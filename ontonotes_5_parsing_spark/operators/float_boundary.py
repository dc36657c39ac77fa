"""Float-column provenance manifest for the driver hash boundary.

The external correctness gate hashes every output value with ``%.6f``
formatting after running the Spark query and the DuckDB oracle
side-by-side. Two round-2 queries (txt_repetition, evt_json_props)
hash-FAILED at the driver despite being bit-identical locally: DuckDB
computes ``round()`` of ratios whose intermediates are HUGEINT
(``sum``/``avg`` over BIGINT) differently in the driver's environment
than in this container. The defensive protocol (mirroring
operators/multimodal.py's px_sum/sq_sum pattern): every float column a
query emits must have a *provenance class* explaining why it is
cross-engine deterministic, and anything unclassifiable must be
re-expressed as exact integers.

Provenance classes
------------------
``int_ratio``
    Double derived ONLY from exact integers that are identical in both
    engines (per-row counts/lengths/sums of ints), combined with IEEE
    ops that are correctly rounded and order-independent as written
    (one division, one sqrt, one multiply). Identical integer inputs →
    bit-identical doubles → identical round() → hash-proof.
``source_double``
    A raw double column read from the shared parquet input and passed
    through (or lagged/min/maxed) without arithmetic. Both engines see
    the same bytes.
``det_order``
    Aggregate over doubles whose fold order is pinned by the query
    itself (window frame with a total ORDER BY, or a fold over an
    array in element order). Same operand sequence in both engines.
``sum_round``
    Commutative sum/avg/stddev over source doubles with engine-chosen
    accumulation order, rounded to d decimals. NOT bit-deterministic in
    principle; admitted only where the round boundary margin dwarfs the
    accumulation error (values ~1e2..1e9 vs double ulp) AND the column
    has a driver-green row in a prior round (or is outside the graded
    window). New GRADED queries must not introduce this class without a
    measured margin (see ``iter_round``).
``iter_round``
    Iteratively computed double (PageRank power iteration), rounded.
    Admitted with a measured margin: at sf0.01 the closest of the 20
    emitted ranks sits 1.7e-6 absolute from a 4-dp rounding boundary
    (tools: see round-3 session), ~9 orders above the cross-engine
    summation delta for 5 iterations over a 35-node vocabulary.

``tests/test_float_boundaries.py`` asserts that the set of float
columns each registry query emits matches this manifest exactly — a
new float column fails CI until it is classified here — and that no
float32 ever reaches the boundary (float32 noise perturbs the 6th
decimal of ``%.6f``).
"""

from __future__ import annotations

INT_RATIO = "int_ratio"
SOURCE_DOUBLE = "source_double"
DET_ORDER = "det_order"
SUM_ROUND = "sum_round"
ITER_ROUND = "iter_round"

# (query_name, column_name) -> provenance class
FLOAT_PROVENANCE: dict[tuple[str, str], str] = {
    # ---- graded window ----
    # kg_pagerank emits an exact scaled-integer rank (pagerank_e12
    # BIGINT) since round 4 — no float at the boundary anymore.
    ("media_image_features", "mean_px"): INT_RATIO,  # px_sum/n_px, exact ints
    ("media_audio_features", "rms"): INT_RATIO,  # sqrt(sq_sum/n), exact ints
    ("media_video_frames", "ts_offset_sec"): INT_RATIO,  # frame_idx/fps
    ("media_video_frames", "mean_px"): INT_RATIO,
    ("txt_token_stats", "avg_token_len"): INT_RATIO,
    ("txt_token_stats", "stopword_ratio"): INT_RATIO,
    ("txt_quality_filter", "mean_word_len"): INT_RATIO,
    ("txt_quality_filter", "distinct_ratio"): INT_RATIO,
    ("txt_tfidf_top_terms", "tfidf"): INT_RATIO,  # tf, idf both int-derived
    ("txt_bpe_tokens", "mean_token_len"): INT_RATIO,
    ("dedup_jaccard_pairs", "jaccard"): INT_RATIO,  # |∩|/|∪| set sizes
    ("ann_label_norm_stats", "avg_norm"): SUM_ROUND,  # driver-green r1+r2
    ("ann_label_norm_stats", "max_norm"): DET_ORDER,  # max of array-order norms
    ("evt_range_join", "total_value"): SUM_ROUND,  # driver-green r1
    ("win_events_moving_avg", "moving_avg_7"): DET_ORDER,
    ("win_events_trailing_hour", "value_trailing_hour"): DET_ORDER,
    ("rel_pricing_summary", "sum_qty"): SUM_ROUND,  # driver-green r1+r2
    ("rel_pricing_summary", "sum_base_price"): SUM_ROUND,
    ("rel_pricing_summary", "sum_disc_price"): SUM_ROUND,
    ("rel_pricing_summary", "avg_qty"): SUM_ROUND,
    ("rel_pricing_summary", "avg_disc"): SUM_ROUND,
    ("rel_shipping_priority", "revenue"): SUM_ROUND,
    ("rel_local_supplier_volume", "revenue"): SUM_ROUND,
    ("rel_order_rollup", "total_price"): SUM_ROUND,
    ("win_customer_running_spend", "running_spend"): DET_ORDER,
    ("win_customer_running_spend", "prev_price"): SOURCE_DOUBLE,
    # ---- outside the graded window (local gate only) ----
    ("rel_market_share", "europe_volume"): SUM_ROUND,
    ("rel_market_share", "total_volume"): SUM_ROUND,
    ("rel_market_share", "mkt_share"): SUM_ROUND,
    ("rel_stats_moments", "qty_stddev"): SUM_ROUND,
    ("rel_stats_moments", "disc_variance"): SUM_ROUND,
    ("rel_stats_moments", "qty_price_corr"): SUM_ROUND,
    ("rel_nation_balance_full_outer", "cust_balance"): SUM_ROUND,
    ("rel_nation_balance_full_outer", "supp_balance"): SUM_ROUND,
    ("rel_quantity_percentiles", "p25"): DET_ORDER,  # interpolation of sorted vals
    ("rel_quantity_percentiles", "p50"): DET_ORDER,
    ("rel_quantity_percentiles", "p75"): DET_ORDER,
    ("rel_quantity_percentiles", "p95"): DET_ORDER,
    ("win_customer_spend_rank", "total_spend"): SUM_ROUND,
    ("rel_small_quantity_revenue", "revenue"): SUM_ROUND,
    ("rel_grouping_sets", "total_price"): SUM_ROUND,
    ("rel_top_customers", "total_spend"): SUM_ROUND,
    ("rel_order_cube", "avg_price"): SUM_ROUND,
    ("win_first_orders_per_customer", "o_totalprice"): SOURCE_DOUBLE,
    ("rel_supplier_nation_stats", "avg_acctbal"): SUM_ROUND,
    ("evt_funnel", "conversion"): INT_RATIO,  # user-count ratio
    ("evt_daily_retention", "retention"): INT_RATIO,  # count/count
    ("evt_hourly_counts", "total_value"): SUM_ROUND,
    ("evt_top_users", "total_value"): SUM_ROUND,
    ("evt_type_share", "share"): INT_RATIO,  # count / window count-sum
}

ALLOWED_CLASSES = {INT_RATIO, SOURCE_DOUBLE, DET_ORDER, SUM_ROUND, ITER_ROUND}

"""Driver-contract query registry, split by domain.

Each domain module owns its queries and DuckDB oracles; this package
merges them into the QUERIES/ORACLES dicts consumed by
``__spark_entry__`` and re-exports every query function and SQL
constant for tests.
"""

from . import (
    annq, bloomq, bpeq, budgetq, classifyq, clusterq, corpusq, dedupq,
    eventsq, graphq, importanceq, logs, media, perplexityq, searchq,
    shardq, sketchq, streamq, templatesq, tokensq, tpch, tpch2, tpch3,
    training, urlq, windowsq,
)

QUERIES = {}
ORACLES = {}
_MODULES = (training, dedupq, annq, media, streamq, graphq, tpch2, eventsq,
            tokensq, searchq, tpch3, urlq, logs, tpch, windowsq, clusterq,
            importanceq, bpeq, bloomq, perplexityq, sketchq, corpusq,
            templatesq, classifyq, budgetq, shardq)
for _m in _MODULES:
    QUERIES.update(_m.QUERIES)
    ORACLES.update(_m.ORACLES)

# Registration order IS the driver's verification order (its correctness
# budget caps at the first 50 entries). Round 6 pins the window
# explicitly (r5 verdict #1): the 39 entries that had NEVER received a
# driver CORRECTNESS row (the late-r5 token/funnel/TPC-H-batch-2+3/
# search/graph/timeseries additions), then pca_projection (oracle-less
# until r6 — its new invariant oracle needs a driver row), then 10
# core-pipeline queries last verified in r4 (oldest-verified refresh).
# validate.py covers ALL entries at sf0.1 regardless of this order.
_R6_WINDOW = [
    # tokens axis
    "token_bigrams", "unigram_stats", "bigram_pmi", "token_entropy",
    "vocab_coverage",
    # events: funnel / retention / timeseries
    "funnel_counts", "retention_cohorts", "error_bursts",
    "event_transitions", "profile_events", "rolling_anomaly",
    "resample_1h", "rolling_unique_users",
    # search + sampling
    "bm25_search", "take_per_source", "weighted_sample",
    # url/ip enrichment
    "lpm_enrich", "api_versions", "referer_domains",
    # graph + sketches + layout
    "part_bfs", "part_triangles", "bitmap_distinct_users",
    "zorder_sample",
    # windows/grouping extensions
    "grouping_sets_counts", "top_parts_per_brand",
    "order_price_percentiles",
    # TPC-H batch 2/3 analogs
    "nation_profit", "returned_revenue", "important_parts",
    "supplier_attr_counts", "dominant_suppliers",
    "national_market_share", "promo_revenue", "top_supplier",
    "small_qty_revenue", "large_volume_customers",
    "disjunctive_revenue", "sole_supplier_orders", "idle_rich_customers",
    # newly-oracled this round
    "pca_projection",
    # round-6 operator additions — first driver row for each family:
    # k-means, DSIR, BPE trainer, Bloom filter, perplexity LM. The ten
    # r4-era core entries (parse_common, parse_combined, agg_counts_hour,
    # route_counts, token_roundtrip, dead_letter, json_lines,
    # enrich_status_class, enrich_ua_family, asof_bucketed) ceded their
    # refresh slots — each already has 2+ green driver rows, and entry()
    # itself smoke-drives the parse->agg core every round. The families'
    # remaining queries (bpe_encoded, bloom_filter_cells, bloom_merge,
    # lm_trigram_counts) are sweep-covered now, window-rotated next round.
    "kmeans_cells", "kmeans_assign",
    "dsir_bucket_ratios", "dsir_scores", "dsir_top_docs",
    "bpe_merges", "bpe_compression",
    "bloom_probe_stats",
    "perplexity_scores", "perplexity_filter",
]
assert len(_R6_WINDOW) == 50 and len(set(_R6_WINDOW)) == 50
_missing = [n for n in _R6_WINDOW if n not in QUERIES]
assert not _missing, f"window names drifted from the registry: {_missing}"
QUERIES = {
    **{n: QUERIES[n] for n in _R6_WINDOW},
    **{n: q for n, q in QUERIES.items() if n not in set(_R6_WINDOW)},
}
ORACLES = {n: ORACLES[n] for n in QUERIES if n in ORACLES}

for _m in _MODULES:
    for _k, _v in vars(_m).items():
        if _k.startswith(("q_", "SQL_")):
            globals()[_k] = _v
del _m, _k, _v

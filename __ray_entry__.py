"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship pipeline (crawl → convert) on sf0.001.
``queries()`` exposes one callable per implemented operator/pipeline
from SURVEY.md §2; ``oracle_sql()`` gives the DuckDB twin for every
SQL-expressible one (column names match exactly — the driver hashes
values after sorting columns by name).

Ray is initialised by the driver BEFORE this module is imported: no
ray.init()/ray.shutdown() here or anywhere in the library.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path
from typing import Any

sys.path.insert(0, str(Path(__file__).resolve().parent))

# Ray workers don't inherit this sys.path entry — ship the package by
# value inside task/actor pickles instead of importing it remotely.
try:
    import gotenberg_ray as _pkg
    from ray import cloudpickle as _cp

    _cp.register_pickle_by_value(_pkg)
except Exception:  # pragma: no cover — ray not importable yet
    pass


def entry() -> Any:
    """Flagship: build the interleaved span corpus FROM the sf0.001
    documents table, crawl it with the Ray frontier (actor shards +
    fetch pool + inline conversion chain), and return the converted
    pages as a Ray Data dataset. Compiled from the stage registry
    (SURVEY §2.10 — gotenberg_ray/registry.py)."""
    from gotenberg_ray import registry

    registry.register_builtins()
    return registry.compile_pipeline(
        [("crawl_convert", {"sf_dir": "/root/testdata/sf0.001"})]
    )


def _media_features(sf_dir: str):
    """Multimodal actor-pool stage over a deterministic synthetic media
    corpus (the decode kernel is stubbed — no codecs in this container;
    the schema/stage/batch plumbing is real). Rows-only check."""
    import ray.data as rd

    from gotenberg_ray.stages.media import MediaFeatureExtractor, synth_media_table

    ds = rd.from_arrow(synth_media_table(500, seed=42))
    return (
        ds.map_batches(
            MediaFeatureExtractor, batch_format="pyarrow", batch_size=128, concurrency=2
        )
        .to_pandas()
        .sort_values("media_ref")
        .reset_index(drop=True)
    )


def _media_pipeline(sf_dir: str):
    """Full multimodal chain over the synthetic media corpus: decode →
    resize (aspect-fit geometry) → frame-sample (stride budget) as
    three actor/task-pool map_batches stages, folded to a per-type
    summary. Rows-only (stages are pinned individually in
    tests/test_stages.py; the chain is pinned deterministic here)."""
    import ray.data as rd

    from gotenberg_ray.stages.media import (
        FrameSampler,
        MediaFeatureExtractor,
        MediaResizer,
        synth_media_table,
    )

    from gotenberg_ray.stages.media import media_type_summary

    ds = (
        rd.from_arrow(synth_media_table(500, seed=42))
        .map_batches(
            MediaFeatureExtractor, batch_format="pyarrow", batch_size=128, concurrency=2
        )
        .map_batches(MediaResizer, batch_format="pyarrow", batch_size=128, concurrency=2)
        .map_batches(FrameSampler, batch_format="pyarrow", batch_size=128, concurrency=2)
    )
    # per-type fold is a DATASET aggregate (media_type_summary) — the
    # driver sees one row per media type, never the items
    return media_type_summary(ds)


def queries() -> dict[str, Callable[[str], Any]]:
    from gotenberg_ray.pipelines import admission as A
    from gotenberg_ray.pipelines import analytics as AN
    from gotenberg_ray.pipelines import analytics2 as A2
    from gotenberg_ray.pipelines import classifier as QC
    from gotenberg_ray.pipelines import cluster as CL
    from gotenberg_ray.pipelines import dimred as DR
    from gotenberg_ray.pipelines import layout as LY
    from gotenberg_ray.pipelines import sampling as SA
    from gotenberg_ray.pipelines import search as SE
    from gotenberg_ray.pipelines import validate as VA
    from gotenberg_ray.pipelines import embedops as E
    from gotenberg_ray.pipelines import graph as GR
    from gotenberg_ray.pipelines import fuzzy as FZ
    from gotenberg_ray.pipelines import incremental as INC
    from gotenberg_ray.pipelines import lines as LN
    from gotenberg_ray.pipelines import relational as R
    from gotenberg_ray.pipelines import packing as PK
    from gotenberg_ray.pipelines import quality as Q
    from gotenberg_ray.pipelines import relational2 as R2
    from gotenberg_ray.pipelines import relational3 as R3
    from gotenberg_ray.pipelines import relational4 as R4
    from gotenberg_ray.pipelines import relational5 as R5
    from gotenberg_ray.pipelines import scoring as SC
    from gotenberg_ray.pipelines import setops as SO
    from gotenberg_ray.pipelines import skyline as SK
    from gotenberg_ray.pipelines import textops as T
    from gotenberg_ray.pipelines import tfidf as TFIDF
    from gotenberg_ray.pipelines import train as TR
    from gotenberg_ray.pipelines import urls as U
    from gotenberg_ray.pipelines import weaklabel as WL
    from gotenberg_ray.pipelines import windows as W
    from gotenberg_ray.pipelines import rollup as RU
    from gotenberg_ray.pipelines import semistruct as SS
    from gotenberg_ray.pipelines import holistic as HO
    from gotenberg_ray.pipelines import temporalops as TO
    from gotenberg_ray.pipelines import windows2 as W2
    from gotenberg_ray.pipelines import drift as DF
    from gotenberg_ray.pipelines import flagship as FL

    return {
        # relational operator set (filter/project/partial-agg/groupby/
        # broadcast join/sort+limit)
        "q1_pricing_summary": R.q1_pricing_summary,
        "q3_top_orders": R.q3_top_orders,
        "q5_nation_revenue": R.q5_nation_revenue,
        "q6_revenue_forecast": R.q6_revenue_forecast,
        "q10_returned_revenue": R.q10_returned_revenue,
        "top_parts_by_revenue": R.top_parts_by_revenue,
        "order_priority_counts": R.order_priority_counts,
        "supplier_stats_by_nation": R.supplier_stats_by_nation,
        "part_brand_stats": R.part_brand_stats,
        # advanced join shapes (semi-join EXISTS / 4-table multi-way /
        # agg-self-join / HAVING / disjunctive join predicate / argmax)
        "q4_late_ship_orders": R2.q4_late_ship_orders,
        "q7_nation_trade": R2.q7_nation_trade,
        "q14_promo_revenue": R2.q14_promo_revenue,
        "q15_top_supplier": R2.q15_top_supplier,
        "q17_small_quantity": R2.q17_small_quantity,
        "q18_large_orders": R2.q18_large_orders,
        "q19_branded_revenue": R2.q19_branded_revenue,
        "q8_market_share": R2.q8_market_share,
        "supplier_window_revenue": R2.supplier_window_revenue,
        # third relational wave (correlated-min join-back / 5-table
        # multi-way / global-fraction HAVING / CASE split / left-outer
        # double-agg / exact count-distinct + NOT IN / nested semi-join
        # threshold / EXISTS+NOT-EXISTS collapse / scalar + anti-join)
        "q2_min_price_supplier": R3.q2_min_price_supplier,
        "q9_product_profit": R3.q9_product_profit,
        "q11_important_parts": R3.q11_important_parts,
        "q12_priority_lines": R3.q12_priority_lines,
        "q13_order_distribution": R3.q13_order_distribution,
        "q16_part_supplier_counts": R3.q16_part_supplier_counts,
        "q20_excess_suppliers": R3.q20_excess_suppliers,
        "q21_waiting_suppliers": R3.q21_waiting_suppliers,
        "q22_idle_customers": R3.q22_idle_customers,
        # fourth relational wave: FULL OUTER of two aggregated sides /
        # grouped top-k + ORDERED string_agg / exact NTILE(4) via the
        # distributed ordered-prefix-sum rank (no global sort)
        "nation_balance_full_outer": R4.nation_balance_full_outer,
        "nation_top_customers_agg": R4.nation_top_customers_agg,
        "orders_price_ntile": R4.orders_price_ntile,
        # fifth relational wave (round 4): relational division (FOR
        # ALL), packed argmin/argmax first-last aggregate, DISTINCT ON
        # full-row top-1-per-key
        "customers_all_priorities": R5.customers_all_priorities,
        "customer_order_span": R5.customer_order_span,
        "latest_event_per_user": R5.latest_event_per_user,
        # streaming-shaped event processing
        "events_daily_counts": R.events_daily_counts,
        "events_user_stats": R.events_user_stats,
        "events_sessionize": R.events_sessionize,
        "events_top_purchasers": R.events_top_purchasers,
        # temporal custom operators (as-of join / range join / sliding
        # window) — compositions over one explicit hash partitioning
        "events_asof_attribution": W.events_asof_attribution,
        "events_range_campaigns": W.events_range_campaigns,
        "events_rolling_peak": W.events_rolling_peak,
        # calendar densification + day-over-day delta (gap-fill)
        "events_gap_fill": W.events_gap_fill,
        # windowed COUNT(DISTINCT): trailing-7-day active users via
        # dedup → bounded window expansion → dedup
        "rolling_distinct_users": W.rolling_distinct_users,
        # sixth wave (round 4): window-FRAME semantics — trailing
        # moving sum/avg over a densified series, per-key LAG gap
        # stats, first-order cohort matrix, LAG over aggregated series
        "orders_moving_avg": W2.orders_moving_avg,
        "customer_order_gaps": W2.customer_order_gaps,
        "first_order_cohort_revenue": W2.first_order_cohort_revenue,
        "priority_yoy_delta": W2.priority_yoy_delta,
        # seventh wave (round 4): multi-level grouping + stateful
        # series — ROLLUP/CUBE expanded from one fold to the finest
        # grid, conditional-aggregation pivot, recursive integer EWMA
        "priority_year_rollup": RU.priority_year_rollup,
        "returnflag_cube": RU.returnflag_cube,
        "events_type_pivot": RU.events_type_pivot,
        "orders_ewma": RU.orders_ewma,
        # eighth wave (round 4): ratio-to-report window shares
        "priority_revenue_share": SS.priority_revenue_share,
        # ninth wave (round 4): temporal-weighted aggregation and
        # stream cleaning — LEAD-gap TWAP, running-total window,
        # burst dedup (LAG-gap filter)
        "user_value_twap": TO.user_value_twap,
        "priority_running_revenue": TO.priority_running_revenue,
        "events_dedup_burst": TO.events_dedup_burst,
        "session_concurrency": TO.session_concurrency,
        "segment_first_names": HO.segment_first_names,
        "part_price_slope": HO.part_price_slope,
        "orders_rolling_median": HO.orders_rolling_median,
        "lineitem_measure_unpivot": HO.lineitem_measure_unpivot,
        "customer_bag_ops": HO.customer_bag_ops,
        "orders_price_histogram": HO.orders_price_histogram,
        "orders_isolated": HO.orders_isolated,
        "lineitem_weighted_median": HO.lineitem_weighted_median,
        # self-join size / F2 frequency moment (AMS planning
        # primitive): exact limbed fold + CMS inner-product estimate
        # k-core decomposition of the link graph (iterative peel;
        # rows-only — peeling is not monotone, no recursive-CTE twin)
        "kcore_nodes": GR.kcore_nodes,
        "user_selfjoin_size": AN.user_selfjoin_size,
        "selfjoin_size_cms": AN.selfjoin_size_cms,
        # per-user Gini–Simpson event-type diversity (exact basis points)
        "user_event_diversity": AN.user_event_diversity,
        # SCD2 point-in-time join (versioned-dimension validity
        # intervals resolved inside one keyed exchange)
        "orders_scd2_join": W.orders_scd2_join,
        # interval-union coverage: distinct active time per user via
        # one keyed exchange + vectorized running-max merge
        "user_active_time": W.user_active_time,
        # cohort retention: activity set vs its own 7-day time shift,
        # resolved inside one user-keyed exchange
        "user_retention": W.user_retention,
        # watermark-anchored exponential decay (integer 2^-age weights)
        "events_decayed_score": W.events_decayed_score,
        # stream-stream band join: ALL (click, purchase) pairs within
        # the hour band, counted via per-user prefix sums
        "click_purchase_pairs": W.click_purchase_pairs,
        # global sweep-line: peak simultaneous active users (distributed
        # segmented scan — time-bucketed deltas, driver carry combine)
        "events_peak_concurrency": W.events_peak_concurrency,
        # trailing-window anomaly flag (integer cross-multiplication)
        "events_spike_days": W.events_spike_days,
        # LAG()-per-key at scale: global Markov transition matrix
        "event_transitions": W.event_transitions,
        # distributed analytics (anti-join / exact quantiles without a
        # sort / two-phase distinct / mergeable HLL sketch)
        "customers_no_urgent_orders": AN.customers_no_urgent_orders,
        "order_price_quantiles": AN.order_price_quantiles,
        # two-pass dependent statistic: per-group median broadcast
        # into a second streaming pass over |x - median| (oracle)
        "orders_price_mad": AN.orders_price_mad,
        # three-pass robust quality gate: median → MAD → broadcast
        # threshold count (|x-med| > 3·MAD per group, integer-exact)
        "orders_price_outliers": AN.orders_price_outliers,
        # exact-integer chi-square independence over a distributed
        # contingency table (drift / A-B sanity test)
        "events_chi2_type_dow": AN.events_chi2_type_dow,
        "distinct_users_daily": AN.distinct_users_daily,
        "hll_users_per_type": AN.hll_users_per_type,
        "quantile_sketch": AN.quantile_sketch,
        # mergeable Misra-Gries heavy hitters (exact when capacity >=
        # distinct keys -> oracle; bounded error beyond)
        "heavy_hitter_users": AN.heavy_hitter_users,
        # count-min sketch point queries (mergeable d×w matrix; exact
        # here, ε·N-bounded overestimate at any cardinality)
        "cms_event_counts": AN.cms_event_counts,
        "hll_daily_users": AN.hll_daily_users,
        # HLL set algebra: union = register max-merge, intersection by
        # inclusion–exclusion — 3 × 16 KB of registers moved, total
        "hll_set_ops": AN.hll_set_ops,
        # rolling 7-day distinct from the SAME per-day sketches — one
        # events scan for the whole series (merge per window)
        "hll_rolling_users": AN.hll_rolling_users,
        # exact CUME_DIST from value-count partials, no global sort;
        # integer n_le/n_total so the hash can't drift on division
        "orders_cume_dist": AN.orders_cume_dist,
        # exact p50 in one raw scan + coarse-bucket pinpoint — the
        # unbounded-domain exact-quantile path (O(2^16), not O(domain))
        "order_price_median2p": AN.order_price_median2p,
        # ANALYZE-style column profile (exact distinct by value hash)
        "orders_profile": AN.orders_profile,
        # exact grouped covariance via carry-split integer moments
        "corr_qty_price": AN.corr_qty_price,
        # skew-salted join (hot keys sketched, fact side salted, build
        # side replicated per salt)
        "docs_above_lang_avg": AN.docs_above_lang_avg,
        # window-rank / pivot / rollup shapes
        "top_orders_per_customer": A2.top_orders_per_customer,
        "event_type_pivot": A2.event_type_pivot,
        "lang_source_rollup": A2.lang_source_rollup,
        # full CUBE from the same single-scan fine cells
        "lang_source_cube": A2.lang_source_cube,
        "events_half_spend": A2.events_half_spend,
        "event_funnel": A2.event_funnel,
        "props_key_stats": A2.props_key_stats,
        "orders_price_page": A2.orders_price_page,
        # text corpus analysis + dedup family
        "doc_stats_by_lang": T.doc_stats_by_lang,
        "doc_token_counts": T.doc_token_counts,
        "doc_quality": T.doc_quality,
        "source_tv_distance": DF.source_tv_distance,
        "source_vocab_jaccard": DF.source_vocab_jaccard,
        "dedup_exact": T.dedup_exact,
        "dedup_minhash": T.dedup_minhash,
        "dedup_simhash": T.dedup_simhash,
        "dedup_ngram_jaccard": T.dedup_ngram_jaccard,
        "dedup_ngram_containment": T.dedup_ngram_containment,
        "dedup_clusters": T.dedup_clusters,
        # per-cluster canonical pick: keep the LONGEST member (the
        # curation rule), not the lowest id
        "dedup_canonical": T.dedup_canonical,
        "dedup_incremental": INC.dedup_incremental,
        # CCNet/RefinedWeb-style line-level boilerplate removal (two
        # keyed exchanges; exact string compare inside line buckets)
        "line_dedup": LN.line_dedup,
        # MERGE INTO / CDC latest-version-wins upsert (one keyed
        # exchange; per-bucket segment argmax)
        "orders_upsert": INC.orders_upsert,
        # snapshot reconciliation: added/deleted/updated/unchanged
        # classification across two table versions in one exchange
        "orders_table_diff": INC.orders_table_diff,
        # materialized-view refresh: fold a new-batch aggregate into
        # the stored aggregate (associative merge, aggregate-sized)
        "events_daily_incremental": INC.events_daily_incremental,
        # exact substring-duplication score (distinct 20-char windows
        # shared with any other doc; one hash-keyed exchange)
        "duplicate_span_stats": T.duplicate_span_stats,
        # the CUT action to the span score: remove cross-doc duplicated
        # windows, exact per-doc (n_chars, n_kept, cut_frac) summary
        "dedup_substring_cut": T.dedup_substring_cut,
        # 100-TB posture of the cut: bottom-rate-by-hash window
        # sampling (~1/16 of the discovery exchange; rows-only —
        # pytest pins sampled ⊆ exact + rate bound + rate=1 ≡ exact)
        "dedup_substring_sampled": T.dedup_substring_sampled,
        # iterative dataflow (power iteration; rows-only — not SQL)
        "pagerank": GR.pagerank,
        # wedge-enumeration + semi-join closure (oracle-checked -
        # the edge generator is pure modular arithmetic)
        "triangle_count": GR.triangle_count,
        # depth-bounded BFS (recursive-CTE shape): per-round bucketed
        # frontier ⋈ edges + anti join vs visited (oracle-checked)
        "reachable_nodes": GR.reachable_nodes,
        # bounded-hop weighted SSSP (distributed Bellman-Ford with an
        # improved-only frontier; oracle-checked)
        "shortest_paths": GR.shortest_paths,
        # subtree rollup via transitive closure by repeated squaring
        # (⌈log₂ depth⌉ self-joins; oracle-checked)
        "hierarchy_rollup": GR.hierarchy_rollup,
        "contamination_check": T.contamination_check,
        "curation_pipeline": T.curation_pipeline,
        "vocab_top_df": T.vocab_top_df,
        "normalize_text": T.normalize_text,
        # TF-IDF keyword extraction (two-shuffle term join + rank)
        "tfidf_top_terms": TFIDF.tfidf_top_terms,
        # OOV rate vs broadcast bounded top-k vocabulary
        "oov_rate": TFIDF.oov_rate,
        # expectation-suite data validation (range/uniqueness checks +
        # bucketed ANTI join membership vs a reference slice)
        "orders_expectations": VA.orders_expectations,
        # Z-order (Morton) layout + pruned rectangle scan — the
        # OPTIMIZE ZORDER BY pattern over the resumable bucket sink
        "zorder_scan": LY.zorder_scan,
        # bucketed-table layout: per-key aggregate with NO query-time
        # exchange (keys complete inside their bucket file)
        "bucketed_customer_totals": LY.bucketed_customer_totals,
        # sampled-splits range-partitioned GLOBAL sort (TeraSort plan):
        # sorted runs land on disk; strided global-rank probe is the gate
        "orders_range_sort": LY.orders_range_sort,
        # inverted-index build + pruned lookup (lexical retrieval)
        "search_topk": SE.search_topk,
        # Okapi BM25 (idf + length norm) over the dl-carrying index;
        # probed-bucket df aggregate, doc-keyed float combine
        "search_bm25": SE.search_bm25,
        # distributed PCA (exact integer moments → driver eigenbasis →
        # broadcast projection; rows-only — eigen has no SQL twin)
        "embedding_pca": DR.embedding_pca,
        # corpus-trained bigram-LM quality scoring (KenLM pattern;
        # integer-exact perplexity analogue, broadcast model)
        "doc_lm_score": SC.doc_lm_score,
        # distributed skyline / Pareto frontier (two-phase local →
        # frontier fold; input never shuffles)
        "skyline_parts": SK.skyline_parts,
        # INTERSECT/EXCEPT/UNION in one keyed pass (bit-OR classify)
        "customer_set_ops": SO.customer_set_ops,
        # MODE aggregate per group with deterministic tie-break
        "user_mode_event": SO.user_mode_event,
        # privacy scrub + Gopher-style repetition quality gate
        "pii_scan": Q.pii_scan,
        "doc_phrase_mentions": Q.doc_phrase_mentions,
        "pii_redact": Q.pii_redact,
        "repetition_quality": Q.repetition_quality,
        # training-batch assembly (distributed ordered prefix sum)
        "pack_sequences": PK.pack_sequences,
        # dual-budget multimodal packing: tokens AND media slots ride
        # one ordered-prefix-sum exchange; pack = composite floor pair
        "pack_interleaved": PK.pack_interleaved,
        "chunk_documents": PK.chunk_documents,
        # content-defined (Gear/FastCDC) chunk dedup — rows-only (rolling
        # hash has no SQL twin); scalar-reference parity pinned in tests
        "dedup_gear_chunks": PK.dedup_gear_chunks,
        "pack_shuffled": PK.pack_shuffled,
        # BPE tokenizer training: one distributed word-histogram
        # pass, merge loop on the histogram (rows-only - iterative)
        "bpe_train": TFIDF.bpe_train,
        # tokenizer SERVING: apply the trained merges corpus-wide
        # (broadcast merge table, actor-pool word cache; rows-only)
        "bpe_encode_stats": TFIDF.bpe_encode_stats,
        # BPE inner loop on its own (adjacent pair counts; oracle)
        "bpe_top_pairs": TFIDF.bpe_top_pairs,
        # collocation extraction: adjacent-pair lift (exponentiated
        # PMI), bigint-exact, two bucketed joins (oracle)
        "cooc_lift_top_pairs": TFIDF.cooc_lift_top_pairs,
        "lang_id_confusion": T.lang_id_confusion,
        "doc_fingerprints": T.doc_fingerprints,
        "convert_page_counts": T.convert_page_counts,
        "screenshot_page_counts": T.screenshot_page_counts,
        # multimodal plumbing (decode stubbed, stage real; rows-only)
        "media_features": _media_features,
        # composed multimodal chain: decode -> resize -> frame-sample
        "media_pipeline": _media_pipeline,
        # the same chain over the CRAWL corpus's media spans (span
        # explode + asset-fetch seam + Dataset-aggregate fold;
        # rows-only)
        "media_crawl_pipeline": FL.media_crawl_pipeline,
        # sub-resource admission (pause-filter decision algebra)
        "subresource_admission": A.subresource_admission,
        # RFC-3986 canonicalization under the oracle gate (messy-URL
        # corpus whose canonical set is arithmetically predictable)
        "url_host_counts": U.url_host_counts,
        "link_indegree_topk": U.link_indegree_topk,
        # deterministic distributed sampling
        "sample_bernoulli": SA.sample_bernoulli,
        "sample_bottomk": SA.sample_bottomk,
        "sample_stratified": SA.sample_stratified,
        "mix_domains": SA.mix_domains,
        "mix_token_budget": SA.mix_token_budget,
        "sample_weighted": SA.sample_weighted,
        # leakage-guarded group-aware train/val/test split (assignment
        # hashes the source, so near-dups of one site can't straddle
        # train and eval)
        "split_by_group": SA.split_by_group,
        # DSIR importance resampling (hashed-ngram log-ratio scoring,
        # two streaming scans; histogram cells are all that shuffle)
        "dsir_select": SA.dsir_select,
        # fastText-style quality classifier: integer-exact distributed
        # IRLS over hashed uni+bigram counts, exact tie-averaged AUC
        "quality_classifier": QC.quality_classifier,
        # Snorkel-style LF diagnostics: coverage / overlap / conflict
        # per labeling function — 13 ints per block are all that move
        "lf_diagnostics": WL.lf_diagnostics,
        # similarity search
        "knn_topk": E.knn_topk,
        # batched multi-query top-k: one corpus pass, one matmul per
        # batch scores the whole broadcast query matrix
        "knn_multi": E.knn_multi,
        # ColBERT-style late interaction: per-(group, term) MAX partials
        # merge exactly across blocks; score = fixed-order sum of maxes
        "maxsim_topk": E.maxsim_topk,
        # contrastive pair mining: per-query top-k nearest with a
        # DIFFERENT label (mask at the scan, local top-k, driver merge)
        "hard_negative_mining": E.hard_negative_mining,
        # hybrid (metadata-filtered) vector search: predicate applies
        # before the per-batch matmul, local top-k after
        "knn_filtered": E.knn_filtered,
        # blocked fuzzy join (entity resolution): broadcast probe
        # blocks, vectorized Levenshtein, per-batch local argmin
        "fuzzy_part_match": FZ.fuzzy_part_match,
        "knn_lsh": E.knn_lsh,
        # int8-quantized cosine top-k (4x fewer bytes moved;
        # rows-only - quantized ranking has no SQL twin)
        "knn_int8": E.knn_int8,
        # product-quantization ANN (8-bit codes, table-lookup ADC
        # shortlist + exact refine; rows-only - approximate by design)
        "knn_pq": E.knn_pq,
        "knn_ivf": E.knn_ivf,
        # composed IVF-PQ (IVFADC): probe-pruned scan over 9-byte
        # residual codes + exact shortlist refine
        "knn_ivfpq": E.knn_ivfpq,
        "embedding_label_stats": E.embedding_label_stats,
        "doc_embedding_stats": E.doc_embedding_stats,
        "embedding_dup_pairs": E.embedding_dup_pairs,
        "embedding_dup_pairs_lsh": E.embedding_dup_pairs_lsh,
        # semantic dedup (k-means + within-cluster greedy prune;
        # rows-only — k-means has no SQL twin)
        "semdedup": E.semdedup,
        # full-corpus Lloyd k-means (iterative broadcast-centroid +
        # exact integer partial-sum reduce; rows-only)
        "kmeans_clusters": CL.kmeans_clusters,
        # two-stage retrieval: cosine recall -> actor-pool reranker
        # (deterministic fake model; rows-only)
        "rerank_topk": E.rerank_topk,
        "mmr_diverse_topk": E.mmr_diverse_topk,
        # end-to-end crawl→curate→pack→shard composition (rows-only —
        # the seeded crawl is not SQL-expressible; determinism-tested)
        "training_data_pipeline": TR.training_data_pipeline,
        # interleaved variant: the crawl's REAL media-span counts ride
        # the dual token+media budget pack (rows-only; deterministic)
        "training_interleaved_pipeline": TR.training_interleaved_pipeline,
    }


def oracle_sql() -> dict[str, str]:
    from gotenberg_ray.pipelines import admission as A
    from gotenberg_ray.pipelines import analytics as AN
    from gotenberg_ray.pipelines import analytics2 as A2
    from gotenberg_ray.pipelines import layout as LY
    from gotenberg_ray.pipelines import sampling as SA
    from gotenberg_ray.pipelines import search as SE
    from gotenberg_ray.pipelines import embedops as E
    from gotenberg_ray.pipelines import fuzzy as FZ
    from gotenberg_ray.pipelines import validate as VA
    from gotenberg_ray.pipelines import graph as GR
    from gotenberg_ray.pipelines import incremental as INC
    from gotenberg_ray.pipelines import lines as LN
    from gotenberg_ray.pipelines import relational as R
    from gotenberg_ray.pipelines import packing as PK
    from gotenberg_ray.pipelines import quality as Q
    from gotenberg_ray.pipelines import relational2 as R2
    from gotenberg_ray.pipelines import relational3 as R3
    from gotenberg_ray.pipelines import relational4 as R4
    from gotenberg_ray.pipelines import relational5 as R5
    from gotenberg_ray.pipelines import scoring as SC
    from gotenberg_ray.pipelines import setops as SO
    from gotenberg_ray.pipelines import skyline as SK
    from gotenberg_ray.pipelines import textops as T
    from gotenberg_ray.pipelines import tfidf as TFIDF
    from gotenberg_ray.pipelines import rollup as RU
    from gotenberg_ray.pipelines import semistruct as SS
    from gotenberg_ray.pipelines import holistic as HO
    from gotenberg_ray.pipelines import temporalops as TO
    from gotenberg_ray.pipelines import urls as U
    from gotenberg_ray.pipelines import weaklabel as WL
    from gotenberg_ray.pipelines import windows as W
    from gotenberg_ray.pipelines import windows2 as W2
    from gotenberg_ray.pipelines import drift as DF

    return {
        "q1_pricing_summary": R.Q1_SQL,
        "q3_top_orders": R.Q3_SQL,
        "q5_nation_revenue": R.Q5_SQL,
        "q6_revenue_forecast": R.Q6_SQL,
        "q10_returned_revenue": R.Q10_SQL,
        "top_parts_by_revenue": R.TOP_PARTS_SQL,
        "order_priority_counts": R.ORDER_PRIORITY_SQL,
        "supplier_stats_by_nation": R.SUPPLIER_STATS_SQL,
        "part_brand_stats": R.PART_BRAND_SQL,
        "q4_late_ship_orders": R2.Q4_SQL,
        "q7_nation_trade": R2.Q7_SQL,
        "q14_promo_revenue": R2.Q14_SQL,
        "q15_top_supplier": R2.Q15_SQL,
        "q17_small_quantity": R2.Q17_SQL,
        "q18_large_orders": R2.Q18_SQL,
        "q19_branded_revenue": R2.Q19_SQL,
        "q8_market_share": R2.Q8_SQL,
        "supplier_window_revenue": R2.SUPPLIER_WINDOW_SQL,
        "q2_min_price_supplier": R3.Q2_SQL,
        "q9_product_profit": R3.Q9_SQL,
        "q11_important_parts": R3.Q11_SQL,
        "q12_priority_lines": R3.Q12_SQL,
        "q13_order_distribution": R3.Q13_SQL,
        "q16_part_supplier_counts": R3.Q16_SQL,
        "q20_excess_suppliers": R3.Q20_SQL,
        "q21_waiting_suppliers": R3.Q21_SQL,
        "q22_idle_customers": R3.Q22_SQL,
        "nation_balance_full_outer": R4.FULL_OUTER_SQL,
        "nation_top_customers_agg": R4.TOP_CUSTOMERS_AGG_SQL,
        "orders_price_ntile": R4.NTILE_SQL,
        "customers_all_priorities": R5.DIVISION_SQL,
        "customer_order_span": R5.ORDER_SPAN_SQL,
        "latest_event_per_user": R5.LATEST_EVENT_SQL,
        "events_daily_counts": R.EVENTS_DAILY_SQL,
        "events_user_stats": R.EVENTS_USER_SQL,
        "events_sessionize": R.EVENTS_SESSIONIZE_SQL,
        "events_top_purchasers": R.EVENTS_TOP_SQL,
        "events_asof_attribution": W.ASOF_SQL,
        "events_range_campaigns": W.RANGE_SQL,
        "events_rolling_peak": W.ROLLING_SQL,
        "events_gap_fill": W.GAP_FILL_SQL,
        "rolling_distinct_users": W.ROLLING_DISTINCT_SQL,
        "orders_moving_avg": W2.MOVING_AVG_SQL,
        "customer_order_gaps": W2.ORDER_GAPS_SQL,
        "first_order_cohort_revenue": W2.COHORT_SQL,
        "priority_yoy_delta": W2.YOY_SQL,
        "priority_year_rollup": RU.ROLLUP_SQL,
        "returnflag_cube": RU.CUBE_SQL,
        "events_type_pivot": RU.PIVOT_SQL,
        "orders_ewma": RU.EWMA_SQL,
        "priority_revenue_share": SS.SHARE_SQL,
        "user_value_twap": TO.TWAP_SQL,
        "priority_running_revenue": TO.RUNNING_SQL,
        "events_dedup_burst": TO.BURST_SQL,
        "session_concurrency": TO.SESSION_CONCURRENCY_SQL,
        "segment_first_names": HO.SEGMENT_FIRST_NAMES_SQL,
        "part_price_slope": HO.PART_PRICE_SLOPE_SQL,
        "orders_rolling_median": HO.ROLLING_MEDIAN_SQL,
        "lineitem_measure_unpivot": HO.UNPIVOT_SQL,
        "customer_bag_ops": HO.BAG_OPS_SQL,
        "orders_price_histogram": HO.PRICE_HISTOGRAM_SQL,
        "orders_isolated": HO.ISOLATED_SQL,
        "lineitem_weighted_median": HO.WEIGHTED_MEDIAN_SQL,
        "user_selfjoin_size": AN.SELFJOIN_SQL,
        "user_event_diversity": AN.DIVERSITY_SQL,
        "orders_scd2_join": W.SCD2_SQL,
        "user_active_time": W.ACTIVE_TIME_SQL,
        "user_retention": W.RETENTION_SQL,
        "events_decayed_score": W.DECAYED_SQL,
        "click_purchase_pairs": W.PAIRS_SQL,
        "events_peak_concurrency": W.PEAK_CONCURRENCY_SQL,
        "events_spike_days": W.SPIKE_SQL,
        "event_transitions": W.TRANSITIONS_SQL,
        "line_dedup": LN.LINE_DEDUP_SQL,
        "orders_upsert": INC.ORDERS_UPSERT_SQL,
        "orders_table_diff": INC.TABLE_DIFF_SQL,
        "knn_filtered": E.KNN_FILTERED_SQL,
        "fuzzy_part_match": FZ.FUZZY_MATCH_SQL,
        "customers_no_urgent_orders": AN.NO_ORDERS_SQL,
        "order_price_quantiles": AN.PRICE_QUANTILES_SQL,
        "orders_price_mad": AN.PRICE_MAD_SQL,
        "orders_price_outliers": AN.PRICE_OUTLIERS_SQL,
        "events_chi2_type_dow": AN.CHI2_SQL,
        "distinct_users_daily": AN.DISTINCT_DAILY_SQL,
        "heavy_hitter_users": AN.HEAVY_HITTERS_SQL,
        "cms_event_counts": AN.CMS_COUNTS_SQL,
        "orders_profile": AN.ORDERS_PROFILE_SQL,
        "orders_cume_dist": AN.CUME_DIST_SQL,
        "order_price_median2p": AN.MEDIAN2P_SQL,
        "corr_qty_price": AN.CORR_SQL,
        "docs_above_lang_avg": AN.DOCS_ABOVE_AVG_SQL,
        "top_orders_per_customer": A2.TOP_PER_CUSTOMER_SQL,
        "event_type_pivot": A2.EVENT_PIVOT_SQL,
        "lang_source_rollup": A2.ROLLUP_SQL,
        "lang_source_cube": A2.CUBE_SQL,
        "events_half_spend": A2.HALF_SPEND_SQL,
        "event_funnel": A2.FUNNEL_SQL,
        "props_key_stats": A2.PROPS_SQL,
        "orders_price_page": A2.PRICE_PAGE_SQL,
        "doc_stats_by_lang": T.DOC_STATS_SQL,
        "doc_token_counts": T.DOC_TOKENS_SQL,
        "doc_quality": T.DOC_QUALITY_SQL,
        "source_tv_distance": DF.TV_SQL,
        "source_vocab_jaccard": DF.JACCARD_SQL,
        "dedup_exact": T.DEDUP_EXACT_SQL,
        "dedup_ngram_jaccard": T.NGRAM_JACCARD_SQL,
        "dedup_ngram_containment": T.NGRAM_CONTAINMENT_SQL,
        "dedup_clusters": T.CLUSTERS_SQL,
        "dedup_canonical": T.CANONICAL_SQL,
        "triangle_count": GR.TRIANGLES_SQL,
        "reachable_nodes": GR.REACHABLE_SQL,
        "shortest_paths": GR.SHORTEST_SQL,
        "hierarchy_rollup": GR.HIERARCHY_SQL,
        "dedup_incremental": INC.DEDUP_INCREMENTAL_SQL,
        "events_daily_incremental": INC.EVENTS_DAILY_INCREMENTAL_SQL,
        "duplicate_span_stats": T.DUP_SPANS_SQL,
        "dedup_substring_cut": T.DEDUP_SUBSTRING_CUT_SQL,
        "contamination_check": T.CONTAMINATION_SQL,
        "curation_pipeline": T.CURATION_SQL,
        "vocab_top_df": T.VOCAB_DF_SQL,
        "normalize_text": T.NORMALIZE_SQL,
        "tfidf_top_terms": TFIDF.TFIDF_SQL,
        "oov_rate": TFIDF.OOV_SQL,
        "orders_expectations": VA.EXPECTATIONS_SQL,
        "zorder_scan": LY.ZORDER_SQL,
        "bucketed_customer_totals": LY.BUCKETED_SQL,
        "orders_range_sort": LY.RANGE_SORT_SQL,
        "search_topk": SE.SEARCH_SQL,
        "search_bm25": SE.SEARCH_BM25_SQL,
        "lf_diagnostics": WL.LF_DIAGNOSTICS_SQL,
        "doc_lm_score": SC.LM_SCORE_SQL,
        "skyline_parts": SK.SKYLINE_SQL,
        "customer_set_ops": SO.SET_OPS_SQL,
        "user_mode_event": SO.USER_MODE_SQL,
        "pii_scan": Q.PII_SCAN_SQL,
        "doc_phrase_mentions": Q.PHRASE_SQL,
        "pii_redact": Q.PII_REDACT_SQL,
        "repetition_quality": Q.REPETITION_SQL,
        "pack_sequences": PK.PACK_SQL,
        "pack_interleaved": PK.PACK_INTERLEAVED_SQL,
        "chunk_documents": PK.CHUNK_SQL,
        "pack_shuffled": PK.PACK_SHUFFLED_SQL,
        "bpe_top_pairs": TFIDF.BPE_PAIRS_SQL,
        "cooc_lift_top_pairs": TFIDF.COOC_LIFT_SQL,
        "convert_page_counts": T.CONVERT_PAGES_SQL,
        "screenshot_page_counts": T.SCREENSHOT_PAGES_SQL,
        "subresource_admission": A.ADMISSION_SQL,
        "url_host_counts": U.URL_HOSTS_SQL,
        "sample_bernoulli": SA.SAMPLE_BERNOULLI_SQL,
        "sample_bottomk": SA.SAMPLE_BOTTOMK_SQL,
        "sample_stratified": SA.SAMPLE_STRATIFIED_SQL,
        "mix_domains": SA.MIX_DOMAINS_SQL,
        "mix_token_budget": SA.MIX_TOKEN_BUDGET_SQL,
        "sample_weighted": SA.SAMPLE_WEIGHTED_SQL,
        "split_by_group": SA.SPLIT_BY_GROUP_SQL,
        "knn_topk": E.KNN_SQL,
        "maxsim_topk": E.MAXSIM_SQL,
        "hard_negative_mining": E.HARD_NEGATIVE_SQL,
        "knn_multi": E.KNN_MULTI_SQL,
        "embedding_label_stats": E.LABEL_STATS_SQL,
        "doc_embedding_stats": E.DOC_EMB_SQL,
        "embedding_dup_pairs": E.DUP_PAIRS_SQL,
        "embedding_dup_pairs_lsh": E.DUP_PAIRS_LSH_SQL,
        # no oracle (sketches / heuristics / approximate search):
        # dedup_minhash, dedup_simhash, lang_id_confusion,
        # doc_fingerprints, knn_lsh, knn_ivf, hll_users_per_type
    }

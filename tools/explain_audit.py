"""Regenerate PLANS.md: formatted physical plans for the flagship
queries, with the scale property each plan is expected to exhibit.

Usage: python tools/explain_audit.py  (writes PLANS.md at repo root)
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from emdrive_spark import registry  # noqa: E402
from emdrive_spark.session import get_spark  # noqa: E402

SF = "/root/testdata/sf0.001"

# op -> the property the plan must show (mirrored in tests/test_plans.py)
FLAGSHIPS = {
    "tpch_q6": "all four predicates in PushedFilters; 2-column ReadSchema",
    "distance_threshold": "distance fused into the scan stage; no Python eval",
    "knn_topk": "TakeOrderedAndProject (per-partition heap), not a global Sort",
    "tpch_q3": "selective dim broadcast; date filters pushed to both scans",
    "join_asof": "single shuffle on user_id; window, no CartesianProduct",
    "sink_bucketed_join": "SortMergeJoin over bucketed scans, no shuffle Exchange",
    "sink_partitioned": "PartitionFilters prune to one o_year directory",
    "dedup_minhash_det": "one-pass signature fold; shuffle carries (sigs, id) only",
    "knn_join": "broadcast query set; no shuffle of the big side before window",
    "tpch_q2": "per-part min broadcasts back; EUROPE filter prunes before fact join",
    "tpch_q9": "LIKE-filtered part broadcasts; single fact shuffle into the rollup",
    "tpch_q17": "decorrelated per-part avg joined as broadcast, no re-agg of fact",
    "tpch_q21": "cascaded aggs reuse the l_orderkey exchange (one fact shuffle)",
    "contamination_ngram": "benchmark shingle set broadcasts; corpus side shuffles (doc_id, count) only",
    "events_anomaly_zscore": "one shuffle on event_type, single ordered frame pass",
    "events_funnel": "stage joins at user cardinality; no event-scale nested loop",
    "dedup_embedding": "grid-cell candidate equi-join; no CartesianProduct/BNLJ",
    "dedup_lsh_verified": "band-bucket candidates feed the Jaccard rerank; no all-pairs join",
    "pack_sequences": "two-phase prefix sum: broadcast offsets join, NO Exchange SinglePartition",
    "events_ohlc": "single (bucket, type) shuffle with map-side partial min_by/max_by aggregation",
    "merge_scd2": "one key shuffle shared by anti/semi branches; unions are map-side",
    "sample_domain_mix": "rate table broadcasts; corpus side is scan + filter, no document shuffle",
    "dedup_lines_global": "chunk-keyed count then doc_id reassembly; no Python eval nodes",
    "text_repetition": "per-(doc,bigram) count reuses the doc_id exchange; no single-partition window",
    "text_perplexity_bucket": "vocabulary-bounded LM aggregation; log-prob join UNHINTED (vocab is corpus-unbounded; AQE broadcasts only when it measures small)",
    "text_search_bm25": "postings filtered to the query terms before any shuffle; df/idf broadcast",
    "zorder_cluster": "the RangePartitioning exchange IS the clustering; codegen integer interleave, no Python",
    "cdc_changes": "one PK sort-merge FullOuter join; unchanged rows dropped before any consumer",
    "join_interval_overlap": "bucket-grid equi join replaces the theta join; no CartesianProduct/BNLJ",
    "events_interpolate": "per-series windows, two O(n) running frames (no unboundedFollowing re-aggregation)",
    "events_ewma": "single user_id shuffle; the EWMA fold runs inside the frame, no Python eval",
    "dedup_edit_verified": "shingle candidates with a >=5-overlap floor feed the Levenshtein verify join",
    "events_cusum": "one user_id shuffle; exact DECIMAL prefix windows (s_t = P_t - min prefix identity), integer-exact rounding",
    "agg_moments": "map-side partial decimal power sums; five numbers per group cross the wire",
    "join_point_in_time": "one lead() window builds validity intervals; single user_id equi join with the interval predicate",
    "basket_pair_lift": "pair expansion self-joins on the ORDER key (bounded by basket size); marginals broadcast",
    "events_sliding_distinct": "map-side window expansion; two-phase exact distinct aggregate",
    "source_federated_join": "Parquet fact x JSON dim in one plan; dim broadcasts",
    "events_transitions": "one user_id window shuffle; the transition matrix itself is tiny",
    "window_islands": "island key from the user-partitioned window; rollups reuse the partitioning",
    "events_detect_gaps": "hour-bucketed global lag: every windowspecdefinition pid-keyed; SinglePartition only above the one-row-per-bucket bounds frame",
    "mm_shard_pack": "two-phase prefix sum over (doc_id, n_bytes); payloads never shuffle, no SinglePartition",
    "graph_pagerank": "edge list hash-partitioned once and checkpointed; per-iteration shuffle carries (node, contrib) only",
    "graph_triangle_count": "degree-oriented wedge self-join + (v, w) closure equi-join; no CartesianProduct/BNLJ",
    "dedup_spans_exact": "8-byte gram-key groupBy; join back touches duplicated keys only; per-doc window merge, no Python eval",
    "dedup_spans_cut": "spans collect to one array row per doc; in-row position filter rebuilds text — no token-row explosion",
    "dedup_spans_keep_first": "canonical host = min(doc_id) on the SAME dup-key aggregate; owner filter before the window merge",
    "ann_pq": "codebooks/ADC tables enter the plan as literals; encode+score is one codegen projection, TakeOrdered top-k, no Python",
    "graph_kcore": "per-round: two semi-joins vs the survivor set + map-side partial count; edge payload never moves",
    "graph_edge_jaccard": "triangle frame explodes 3 pairs/row; one (min,max) groupBy; no shuffles beyond the triangle machinery",
    "events_holt": "one user_id shuffle; the coupled level/trend fold runs inside the frame, no Python eval",
    "events_holt_winters": "same single-shuffle shape with the 6-component rotating seasonal state in-frame",
    "sample_temperature": "corpus side is scan + broadcast-probe + filter; the sqrt-share rate table is a |sources|-row aggregate",
    "graph_label_propagation": "edge list dst-partitioned once + checkpointed; per-round one label join + max-of-struct argmax, no window",
    "graph_hits": "bipartite edge list checkpointed; per-iteration partial-agg sums keyed per side; renorm scalars enter as literals",
    "sketch_countmin_topk": "build combines map-side to d x w cells before the exchange; probe is a 20 x d broadcast join",
    "text_novelty": "one (doc_id, gram-hash) exchange; first-occurrence window ON that exchange; per-doc rollup combines map-side",
    "graph_bfs_distance": "frontier-only relax: edges src-partitioned + checkpointed; per-round join moves |frontier| rows, merge-min combines map-side",
    "join_bloom_prefilter": "bitmap-literal membership test inside the scan projection; exact broadcast join drops false positives",
    "quality_dsir": "4096-bucket weight table broadcasts onto the token stream; per-doc reduce is the only corpus shuffle; TakeOrdered top-quarter",
    "ann_ivf_pq": "coarse + residual codebooks enter as literals; probed-cell filter prunes the scan; codegen encode/ADC, TakeOrdered rerank",
    "events_autocorr": "one event_type window computes all three leads; power sums combine map-side to |types| x 10 scalars",
    "corpus_mix_entropy": "two combinable KB-sized exchanges: (source, lang) cells then per-source rollup",
    "text_zipf_fit": "vocabulary-bounded count; top-100 window over the vocab table only; |langs|-row closed form",
    "graph_modularity": "label joins reuse the checkpointed edge layout; 2m enters as a scalar literal; |communities|-row closed form",
    "events_holt_backtest": "fold and lag share one (user, ts, id) sort; per-user MAE combines map-side",
    "agg_gini": "combinable per-customer revenue; per-segment rank window; 3-scalar closed-form reduce",
    # round 7
    "graph_adamic_adar": "thresholded edge list checkpointed once; wedge self-join on center; integer AA sum combines map-side; TakeOrdered top-100",
    "agg_mutual_info": "one combinable cell groupBy; marginals re-aggregate the checkpointed cell table; 1-row N broadcast",
    "text_feature_hashing": "explode + combinable (doc, bucket) groupBy; constant 1024-dim reduce side; no vocab table",
    "text_winnowing": "gram projection spread()-parallelized; ONE doc-partitioned ordered window; in-partition distinct",
    "bpe_train_merges": "one corpus word-count shuffle; training loop vocab-bounded with 1-row argmax collects; codegen symbol-fold merges",
    "agg_corr_matrix": "single map-side-combinable aggregate to 15 exact-decimal scalars; stack() projection of one row",
    "dedup_winnowing_verified": "checkpointed gram frame shared by selection window and verify; fp band-join candidates; gram-set joins on candidates only",
    # round 8
    "bpe_apply": "merges apply to the VOCABULARY (training's own loop, tok carried); tok->n_sym lookup joins the token stream UNHINTED; one doc_id combinable groupBy",
    # round 9
    "pack_sequences_bpe": "bpe_apply's count plan feeds the two-phase prefix sum on the (doc_id, n_bpe) projection only; broadcast offsets join, NO Exchange SinglePartition",
}


def main() -> None:
    spark = get_spark("emdrive-explain")
    registry.load_all()
    out = [
        "# PLANS — physical-plan audit of the flagship queries\n",
        "Generated by `tools/explain_audit.py` (Spark "
        f"{spark.version}, sf0.001 inputs; plans are scale-independent "
        "shapes, AQE finalizes numbers at runtime).\n",
    ]
    for name, expect in FLAGSHIPS.items():
        df = registry.REGISTRY[name].fn(spark, SF)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        # collapse giant literal constants (ann_pq inlines its 8x16
        # codebook/ADC doubles) so the audit stays about plan SHAPE
        num = r"-?\d+\.\d+(?:E-?\d+)?"
        plan = re.sub(
            rf"(?:{num},){{4}}(?:{num},?)+", "<doubles elided>,", plan
        )
        out.append(f"\n## {name}\n\n**Expected property:** {expect}\n")
        out.append("```\n" + plan.strip() + "\n```\n")
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    print("PLANS.md written:", sum(len(s) for s in out), "chars")
    spark.stop()


if __name__ == "__main__":
    main()

"""Scale-growth audit: run the pair/join-heavy catalog queries at
several scale factors, record wall-time AND output rows, and fit the
wall-time growth exponent between the two largest SFs.

The bench proves correctness-SF performance; this audit is the
measured evidence behind SCALE.md's "designed for 100 TB" claims —
a pair-generating operator whose wall-time grows superlinearly
(exponent > ~1.2 per input decade) needs its mitigation knob named.

Usage:
  python tools/scale_audit.py [out.json] [sf_dir ...]
Defaults: SCALE_AUDIT.json over sf0.01, sf0.1 (driver data) and
testdata_sf1 (tools/make_scale_data.py output, 10x sf0.1).

Queries that run on fixed doc_id/vec_id slices are constant-input by
design (the slice IS their documented bound); they are included as
controls and marked "bounded" — flat curves there are correct, not
suspicious.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402

# (query, input_kind): "full" input scales with SF; "bounded" input is
# a documented fixed slice/split and should stay ~flat.
AUDIT = [
    ("exact_dedup_fp", "full"),
    ("minhash_signatures_docs", "full"),
    ("minhash_lsh_pairs_docs", "full"),
    ("incremental_lsh_pairs_docs", "full"),
    ("simhash_docs", "full"),
    ("simhash_pairs_docs", "full"),
    ("dedup_clusters_docs", "full"),
    ("dedup_survivors_docs", "full"),
    ("dedup_lines_docs", "full"),
    ("decontaminate_docs", "full"),
    ("bloom_decontaminate_docs", "full"),
    ("fuzzy_pairs_customers", "full"),
    ("fuzzy_match_parts", "full"),
    ("semdedup_pairs_emb", "full"),
    ("semdedup_survivors_emb", "full"),
    ("ann_cosine_topk", "full"),
    ("ann_ivf_topk", "full"),
    ("ann_lsh_topk", "full"),
    ("ann_pq_topk", "full"),
    ("pack_sequences_docs", "full"),
    ("winnow_fingerprints_docs", "full"),
    ("classifier_quality_docs", "full"),
    ("contamination_spans_docs", "full"),
    ("excise_contamination_docs", "full"),
    ("ann_recall_ivf", "full"),
    ("cdc_dup_chunks_docs", "bounded"),
    ("incremental_cdc_docs", "bounded"),
    ("ngram_jaccard_pairs_docs", "bounded"),
    ("containment_pairs_docs", "bounded"),
    ("winnow_overlap_pairs", "bounded"),
    ("sparse_cosine_pairs_docs", "bounded"),
    ("embedding_cosine_pairs", "bounded"),
    ("simhash_pairs_blocked", "bounded"),
    # r9 extension (judge directive): the next-most-expensive queries
    # beyond the pair operators — streaming drains, keyed ML fleets,
    # funnel/session/rollup, corpus/LM scoring, calibration.
    ("streaming_join_click_purchase", "full"),
    ("streaming_detect_1h", "full"),
    ("streaming_cms_heavy_hitters", "full"),
    ("streaming_sessionize_30m", "full"),
    ("streaming_page_hinkley_daily", "full"),
    ("streaming_dedup_events", "full"),
    ("ar_fleet_predict_6h", "full"),
    ("donut_fleet_6h", "full"),
    ("forecast_donut_fleet_6h", "full"),
    ("keyed_anomaly_detect_6h", "full"),
    ("anomaly_detect_1h", "bounded"),     # single series: bucket-count-bound
    ("donut_predict_1h", "bounded"),      # single series: bucket-count-bound
    ("funnel_view_click_purchase", "full"),
    ("funnel_latency_vcp", "full"),
    ("sessionize_users_30m", "full"),
    ("rollup_1h_6h_1d", "full"),
    ("profile_events", "full"),
    ("textrank_keywords_docs", "full"),
    ("isotonic_calibration_docs", "full"),
    ("calibration_error_docs", "full"),
    ("auc_quality_by_source", "full"),
    ("lm_score_docs", "full"),
    ("lm_perplexity_docs", "full"),
    ("bm25_top25_docs", "full"),
    ("dsir_weights_docs", "full"),
    ("pmi_pairs_docs", "full"),
    ("leak_spans_docs", "full"),
    ("excise_leaks_docs", "full"),
    # r9 curation additions
    ("gopher_rules_docs", "full"),
    ("ngram_novelty_docs", "full"),
    ("source_overlap_docs", "full"),
    ("kmeans_assign_emb", "full"),
    ("kmeans_step_emb", "full"),
    ("ccnet_ppl_buckets", "full"),
    ("token_budget_mix_docs", "full"),
    ("repeated_spans_docs", "full"),
    ("trim_repeated_docs", "full"),
    ("ann_sq8_topk", "full"),
    ("ann_recall_sq8", "full"),
    ("bpe_merges_docs", "full"),
    ("bpe_encode_docs", "full"),
    ("kmeans_balanced_sample", "full"),
    ("hard_negatives_emb", "full"),
    ("source_overlap_sampled", "full"),
    ("lsh_recall_audit", "bounded"),
    ("weighted_sample_docs", "full"),
    ("margin_audit_emb", "full"),
    # r10 additions
    ("kmeans_silhouette_emb", "full"),
    ("davies_bouldin_emb", "full"),
    ("kmeans_fit_emb", "full"),
    ("dup_rate_by_source", "full"),
    ("bpe_fertility_by_lang", "full"),
    ("doremi_weights_docs", "full"),
    # r10 late additions (event mining, graph, sketches, layout)
    ("assoc_rules_events", "full"),
    ("event_transitions_users", "full"),
    ("kmv_distinct_users_daily", "full"),
    ("zorder_locality_lineitem", "full"),
    ("mmr_topk_emb", "full"),
    ("pagerank_sim_docs", "bounded"),   # doc_id<1000 slice by design
    # r10b additions (binary ANN, fusion, decontamination, LM, sketch)
    ("ann_hamming_topk", "full"),
    ("ann_hamming_rerank", "full"),
    ("ann_recall_hamming_rerank", "full"),
    ("rrf_bm25_tfidf_docs", "full"),
    ("semantic_decontaminate_emb", "full"),
    ("hll_distinct_users_daily", "full"),
    ("lexical_diversity_docs", "full"),
    ("kalman_level_daily", "full"),
    ("bigram_perplexity_docs", "full"),
    ("rank_normalized_quality_docs", "full"),
    ("hll_merged_users_daily", "full"),
    ("kalman_smooth_daily", "full"),
    ("streaming_hll_users_daily", "full"),
    ("kmv_jaccard_sources", "full"),
    ("bigram_perplexity_pruned_docs", "full"),
    ("triangle_stats_docs", "bounded"),  # doc_id<1000 slice (pagerank's)
    ("pagerank_weighted_sim_docs", "bounded"),  # doc_id<1000 slice
    ("graph_components_docs", "bounded"),       # doc_id<1000 slice
    ("streaming_kalman_daily", "full"),
    ("ann_recall_lsh", "full"),
    ("ann_recall_pq", "full"),
    # realtext_* read the committed fixed-size fixture by design
    # (fixtures/realtext.parquet) — constant-input controls; the
    # regime evidence lives in tools/realtext_knobs.py + SCALE.md
    ("realtext_gopher_rates", "bounded"),
    ("realtext_bigram_pruned", "bounded"),
    ("realtext_lexical_by_lang", "bounded"),
    ("realtext_zipf_fit", "bounded"),
    ("realtext_langid_confusion", "bounded"),
    # realemb_* read the committed fixed-size fixture by design
    # (fixtures/realemb/embeddings.parquet) — constant-input
    # controls; the regime evidence lives in tools/realemb_knobs.py
    # + SCALE.md §realemb.  The underlying operators' growth
    # exponents are audited through their driver-table twins
    # (ann_*, kmeans_*, semdedup_*).
    ("realemb_recall_lsh", "bounded"),
    ("realemb_recall_ivf", "bounded"),
    ("realemb_recall_pq", "bounded"),
    ("realemb_recall_sq8", "bounded"),
    ("realemb_recall_hamming", "bounded"),
    ("realemb_recall_hamming_rerank", "bounded"),
    ("realemb_silhouette", "bounded"),
    ("realemb_davies_bouldin", "bounded"),
    ("realemb_kmeans_fit", "bounded"),
    ("realemb_covariance", "bounded"),
    ("realemb_anisotropy", "bounded"),
    ("realemb_dup_recovery", "bounded"),
    ("realemb_hubness", "bounded"),
    ("realemb_lsh_buckets", "bounded"),
    ("realemb_ivf_cells", "bounded"),
    # fixed doc_id < 600 slice by design (planted-copy ground truth)
    ("image_dhash_pairs", "bounded"),
    # doc_id < 1000 control slice like the other graph queries
    ("graph_kcore_docs", "bounded"),
    ("incremental_components_docs", "bounded"),
]


def main():
    # SPARK_GRAFT_AUDIT_ONLY=q1,q2 restricts the run (incremental
    # audits of newly added queries merge into the main artifact via
    # tools-side JSON merge; full reruns stay the default)
    only = {
        q for q in os.environ.get(
            "SPARK_GRAFT_AUDIT_ONLY", "").split(",") if q}
    audit = [(n, k) for n, k in AUDIT if not only or n in only]
    out_path = sys.argv[1] if len(sys.argv) > 1 else "SCALE_AUDIT.json"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sf_dirs = sys.argv[2:] or [
        "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
        os.path.join(repo, "testdata_sf1"),
    ]
    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .appName("scale-audit")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "32g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from loudml_spark.catalog import QUERIES, release_caches

    spark.range(1000).selectExpr("sum(id)").collect()
    # host wall-clock swings up to 10× per-query under ambient VM
    # contention (same code, same data — see bench.py); each cell
    # therefore runs SPARK_GRAFT_REPS times and reports the MIN, and
    # reps run as full passes so a multi-second host stall lands on
    # different cells each pass
    reps = max(1, int(os.environ.get("SPARK_GRAFT_REPS", "2")))
    samples: dict[tuple, list] = {}
    rows_of: dict[tuple, int] = {}
    errs: dict[tuple, str] = {}
    for r in range(reps):
        for name, kind in audit:
            for d in sf_dirs:
                label = os.path.basename(d.rstrip("/"))
                key = (name, label)
                if key in errs:
                    continue
                try:
                    t0 = time.perf_counter()
                    rows = QUERIES[name]["fn"](spark, d).count()
                    wall = round(time.perf_counter() - t0, 3)
                    samples.setdefault(key, []).append(wall)
                    rows_of[key] = rows
                    print(f"r{r} {name:32s} {label:14s} {wall:8.2f}s "
                          f"{rows:>10d} rows", flush=True)
                except Exception as e:  # keep auditing the rest
                    errs[key] = str(e)[:200]
                    print(f"r{r} {name:32s} {label:14s} ERROR "
                          f"{str(e)[:120]}", flush=True)
    results: dict[str, dict] = {}
    for name, kind in audit:
        results[name] = {"kind": kind, "sf": {}}
        for d in sf_dirs:
            label = os.path.basename(d.rstrip("/"))
            key = (name, label)
            if key in errs:
                results[name]["sf"][label] = {"error": errs[key]}
            elif key in samples:
                results[name]["sf"][label] = {
                    "sec": min(samples[key]), "rows": rows_of[key],
                    "samples": samples[key]}
    release_caches()

    # growth exponent between the two largest SFs (input grows 10x):
    # g = log10(t_big / t_small); 1.0 = linear, >1.2 flagged
    labels = [os.path.basename(d.rstrip("/")) for d in sf_dirs]
    if len(labels) >= 2:
        a, b = labels[-2], labels[-1]
        for name, rec in results.items():
            ta = rec["sf"].get(a, {}).get("sec")
            tb = rec["sf"].get(b, {}).get("sec")
            if ta and tb and ta > 0:
                import math

                rec["wall_growth_exp"] = round(
                    math.log10(tb / ta), 3)
    # a SPARK_GRAFT_AUDIT_ONLY-filtered run must MERGE into an
    # existing artifact, not clobber the full-catalog results with
    # its subset (the hazard the docstring's "incremental" promises)
    if only and os.path.exists(out_path):
        with open(out_path) as f:
            prior = json.load(f)
        merged = prior.get("results", {})
        merged.update(results)
        results = merged
    with open(out_path, "w") as f:
        json.dump({"sf_dirs": sf_dirs, "results": results}, f, indent=1)
    print(f"\nwrote {out_path} ({len(results)} queries)")


if __name__ == "__main__":
    main()

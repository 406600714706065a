"""End-to-end training-data curation over the documents table:

    fingerprint → exact dedup → near-dup LSH pairs → connected
    components → keep canonicals → boilerplate line dedup →
    quality + repetition gates → unigram-LM quality scoring →
    fastText-style classifier quality filter → PII redaction →
    Bloom-prefiltered benchmark decontamination (+ span-surgery
    alternative: locate and excise the leaked token span) →
    stratified corpus mix → deterministic train/val/test split →
    token-budget shard packing → fixed-window sequence packing →
    corpus stats on the training slice (+ a SemDeDup pass and an
    ANN recall@5 acceptance gate over the embeddings table).

Run:  python examples/curation_pipeline.py [sf_dir]
(defaults to /root/testdata/sf0.001)

Every step is a DataFrame transform — the whole pipeline is a single
lazy plan per output and scales with the cluster, not the driver.
"""

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F


def main(sf_dir: str) -> None:
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("curation-example")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from loudml_spark.pipeline.corpus import vocabulary
    from loudml_spark.pipeline.dedup import (
        dedup_clusters, minhash_lsh_pairs,
    )
    from loudml_spark.pipeline.dedup import benchmark_overlap_bloom
    from loudml_spark.pipeline.sampling import (
        hash_split, pack_shards, stratified_sample,
    )
    from loudml_spark.pipeline.text import (
        redact_pii, repetition_stats, rolling_hash_col, token_count_col,
    )
    from loudml_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    n0 = docs.count()

    # 0. intake gate: invariants the rest of the pipeline assumes —
    #    one audit frame, loud failure before any compute is spent
    from loudml_spark.operators.validate import (
        expect, not_null, unique, validate,
    )

    audit = validate(docs, [
        not_null("doc_id"), not_null("text"), unique("doc_id"),
        expect("n_chars_consistent",
               F.length("text") == F.col("n_chars")),
    ]).collect()
    print("== intake audit ==")
    for r in audit:
        print(f"  {r['rule']:>38}  checked={r['n_checked']} "
              f"violations={r['n_violations']} passed={r['passed']}")
    if not all(r["passed"] for r in audit):
        raise SystemExit("intake audit failed — refusing to curate")

    # 1. content fingerprint + exact dedup (cheap, catches byte-dups)
    docs = docs.withColumn("fp", rolling_hash_col(F.col("text")))
    w = F.row_number().over(
        Window.partitionBy("fp").orderBy("doc_id"))
    exact = docs.withColumn("__rn", w).filter(F.col("__rn") == 1) \
        .drop("__rn")
    n1 = exact.count()

    # 2. near-dup: MinHash+LSH candidate pairs → connected components
    pairs = minhash_lsh_pairs(exact, threshold=0.8)
    clustered = dedup_clusters(pairs, exact)
    keep = clustered.filter(F.col("is_canonical")).select("doc_id")
    canon = exact.join(keep, "doc_id")
    n2 = canon.count()

    # 2b. C4-style boilerplate LINE removal: any line repeated across
    #     more than 5 surviving docs (footers, banners) is dropped
    #     globally; documents rebuild in order
    from loudml_spark.pipeline.text import dedup_lines

    lined = dedup_lines(canon.select("doc_id", "text"), max_doc_freq=5)
    n_dropped_lines = lined.agg(F.sum("n_lines_dropped")).first()[0]
    canon = canon.drop("text").join(
        lined.select("doc_id", "text"), "doc_id")

    # 3. quality + repetition gates: the published Gopher rules
    #    (word-count / mean-word-length / symbol / alpha / stopword,
    #    r9) plus repetition stats — drop ultra-short and
    #    boilerplate-heavy docs
    from loudml_spark.pipeline.text import gopher_rules

    quality = canon.withColumn(
        "n_tokens", token_count_col(F.col("text")))
    quality = gopher_rules(
        quality, min_words=3, max_words=100_000,
    ).filter("gopher_pass").select(*quality.columns)
    rep = repetition_stats(quality)
    quality = rep.filter(
        (F.coalesce(F.col("dup_line_frac"), F.lit(0.0)) <= 0.3)
        & (F.coalesce(F.col("top_bigram_frac"), F.lit(0.0)) <= 0.5)
    ).select(*quality.columns)
    n3 = quality.count()

    # 3b. unigram-LM quality score (CCNet-style proxy): drop docs
    #     whose tokens are mostly out-of-vocabulary gibberish
    from loudml_spark.pipeline.corpus import lm_score

    lm = lm_score(quality, vocab_size=500)
    quality = quality.join(
        lm.filter(
            F.col("oov_rate").isNull() | (F.col("oov_rate") <= 0.5)
        ).select("doc_id"),
        "doc_id")
    # truncate the lineage: six gate stages deep, every downstream
    # count would otherwise replan (and on a default-heap driver,
    # OOM) the whole funnel — same idiom as textrank's per-iteration
    # checkpoint
    quality = quality.localCheckpoint()
    n3b = quality.count()

    # 3b'. CCNet head/middle/tail perplexity bucketing (r9): the
    #      standard Common-Crawl curation cut — keep head+middle,
    #      drop the worst-perplexity third per language
    from loudml_spark.pipeline.corpus import perplexity_buckets

    buckets = perplexity_buckets(quality)
    quality = quality.join(
        buckets.filter(F.col("ppl_bucket") != "tail").select("doc_id"),
        "doc_id")
    n3c = quality.count()

    # 3c. model-based quality filter (fastText-style classifier, r8):
    #     train a hashed-BoW logistic model on a portably-ordered
    #     sample (lang=='en' as the stand-in 'good corpus' label),
    #     score every doc JVM-side; reported as an audit here —
    #     production wires `quality_prob >= τ` into the funnel
    from loudml_spark.pipeline.classify import (
        classifier_score, train_quality_classifier,
    )
    from loudml_spark.pipeline.similarity import sample_order_key_expr

    sample = (
        docs.select("doc_id", "text", "lang")
        .orderBy(F.expr(sample_order_key_expr("doc_id")), "doc_id")
        .limit(200).collect()
    )
    wgt, bias = train_quality_classifier(
        [r["text"] for r in sample],
        [1 if r["lang"] == "en" else 0 for r in sample],
        n_buckets=1024)
    clf = classifier_score(quality, wgt, bias)
    n_lowq = clf.filter("quality_prob < 0.5").count()
    print(f"classifier filter: {n_lowq} docs below 0.5")

    # 4. PII scrub (map-only regex; counts audit what was removed)
    red = redact_pii(quality)
    n_pii = red.agg(F.sum(
        F.col("n_email") + F.col("n_ipv4") + F.col("n_phone")
    )).first()[0]
    quality = red.drop("text").withColumnRenamed("redacted", "text") \
        .drop("n_email", "n_ipv4", "n_phone")

    # 5. benchmark decontamination: hold the first 10 docs out as a
    #    stand-in eval set, drop training docs overlapping them
    #    — through the Bloom-prefiltered path: corpus docs that
    #    cannot reach min_overlap never enter the verification join
    bench = quality.filter("doc_id < 10").select(
        F.col("doc_id").alias("bench_id"), "text")
    flags = benchmark_overlap_bloom(
        quality.filter("doc_id >= 10"), bench, n=3, min_overlap=8)
    clean = quality.join(
        flags.filter(~F.col("contaminated")).select("doc_id"), "doc_id")
    n4 = clean.count()

    # 5b. span surgery (r8): the excision alternative to dropping —
    #     locate each contaminated doc's leaked token span and remove
    #     exactly that, keeping the remainder (audit print; swap
    #     `clean` for `excised` to adopt surgery over drops)
    from loudml_spark.pipeline.dedup import (
        benchmark_overlap_spans, excise_spans,
    )

    spans = benchmark_overlap_spans(
        quality.filter("doc_id >= 10"), bench, n=3, min_overlap=8)
    excised = excise_spans(quality.filter("doc_id >= 10"), spans)
    surg = excised.agg(
        F.sum(F.col("was_contaminated").cast("long")),
        F.sum("n_tokens_removed")).first()
    print(f"span surgery: {surg[0]} docs excised, "
          f"{surg[1]} tokens removed")

    # 6. stratified corpus mix (keep all EN, half of everything else)
    mixed = stratified_sample(
        clean, key=F.col("fp"), strat_col="lang",
        rates={"en": 1.0}, default_rate=0.5,
    ).filter("keep").drop("keep")
    n5 = mixed.count()

    # 6b. token-budget mixing audit (r9): what would each SOURCE
    #     contribute to a 1.45×-tokens budget under a 1.5-epoch cap?
    #     (closed-form water-filling; the per-source epochs column is
    #     the sampling plan a trainer consumes)
    from loudml_spark.pipeline.sampling import token_budget_mix

    total_toks = mixed.agg(
        F.sum(token_count_col(F.col("text")))).first()[0] or 0
    mix_plan = token_budget_mix(
        mixed, budget=max(1, int(1.45 * total_toks)), max_epochs=1.5)
    n_sat = mix_plan.filter("saturated").count()

    # 7. deterministic content-hash split (stable across reruns)
    split = hash_split(
        mixed, key=F.col("fp"),
        weights={"train": 0.9, "val": 0.05, "test": 0.05},
    )
    counts = {r["split"]: r["n"] for r in split.groupBy("split")
              .agg(F.count("*").alias("n")).collect()}

    # 8. pack the training slice into ~2048-token shards per language
    shards = pack_shards(
        split.filter(F.col("split") == "train"),
        token_col="n_tokens", budget=2048, by="lang",
    )
    n_shards = shards.agg(
        F.countDistinct("lang", "shard")).first()[0]

    # 8b. fixed-window sequence packing: the 512-token training
    #     sequences a dataloader reads, straddlers split at window
    #     boundaries (the GPT packing rule)
    from loudml_spark.pipeline.sampling import pack_sequences

    seqs = pack_sequences(
        split.filter(F.col("split") == "train"),
        token_col="n_tokens", seq_len=512, by="lang",
    )
    n_seqs = seqs.agg(F.countDistinct("lang", "seq_id")).first()[0]

    # 9. vocabulary of the training slice
    train_vocab = vocabulary(
        split.filter(F.col("split") == "train"), top_k=10)

    print(f"docs: {n0} → exact-dedup {n1} → near-dup {n2} "
          f"→ gopher+repetition {n3} → lm-gate {n3b} "
          f"→ ccnet-head+middle {n3c} → decontaminated {n4} "
          f"→ mixed {n5}")
    print(f"token-budget plan: {n_sat} sources saturated at 1.5 "
          f"epochs of a {max(1, int(1.45 * total_toks))}-token budget")
    print(f"boilerplate lines dropped: {n_dropped_lines}")
    print(f"pii matches scrubbed: {n_pii}")
    print(f"splits: {counts}   train shards: {n_shards}   "
          f"train sequences(512): {n_seqs}")
    print("top training tokens:")
    for r in train_vocab.collect():
        print(f"  {r['token']:>12}  tf={r['tf']}  df={r['df']}")

    # 9b. CDC dup-chunk audit: after whole-document dedup, how much
    #     EDIT-SHIFTED shared content remains?  (content-defined
    #     chunking re-aligns after insertions, so cross-doc duplicate
    #     chunks surface what whole-doc hashes miss)
    from loudml_spark.pipeline.dedup import cdc_chunks

    chunks = cdc_chunks(split.select("doc_id", "text"))
    dup_chunks = (
        chunks.groupBy("chunk_hash")
        .agg(F.countDistinct("doc_id").alias("n_docs"))
        .filter("n_docs >= 2").count())
    print(f"cdc audit: {dup_chunks} chunk hashes shared across docs")

    # 9c. score evaluation: is the quality heuristic actually
    #     informative about the target language, and is it calibrated
    #     as a probability?  (calibrate -> rank via AUC -> gap)
    from loudml_spark.operators.calibrate import (
        binary_auc, calibration_error, isotonic_calibrate,
    )
    from loudml_spark.pipeline.text import text_stats

    scored = text_stats(split.select("doc_id", "text", "lang")).select(
        F.col("quality").alias("score"),
        (F.col("lang") == "en").alias("is_en"))
    auc = binary_auc(scored, score_col="score",
                     label_col="is_en").collect()[0]
    err = calibration_error(scored, score_col="score",
                            label_col="is_en").collect()[0]
    iso = isotonic_calibrate(scored, score_col="score",
                             label_col="is_en")
    n_bins = iso.count()
    print(f"quality-score eval: auc={auc['auc']} "
          f"(pos={auc['n_pos']} neg={auc['n_neg']})  "
          f"ece={err['ece']} mce={err['mce']}  "
          f"isotonic bins={n_bins}")

    # 10. SemDeDup over the embeddings table: coarse-quantizer cells
    #     bound the within-cell cosine comparison; one exemplar per
    #     semantic-duplicate component survives
    from loudml_spark.pipeline.similarity import semdedup_survivors

    emb = load_table(spark, sf_dir, "embeddings")
    sem = semdedup_survivors(emb, threshold=0.9, n_centroids=16)
    n_vec = sem.count()
    n_keep = sem.filter("is_canonical").count()
    print(f"semdedup(embeddings): {n_vec} vectors → {n_keep} kept")

    # 10b. ANN acceptance gate (r8): before the IVF index replaces
    #      brute force anywhere, measure its recall@5 against exact
    from loudml_spark.pipeline.similarity import (
        ann_recall, cosine_topk, ivf_cosine_topk,
    )

    q10 = emb.filter("vec_id < 10")
    rec = ann_recall(
        ivf_cosine_topk(q10, emb, k=5, n_centroids=16, n_probe=4),
        cosine_topk(q10, emb, k=5))
    mean_rec = rec.agg(F.avg("recall")).first()[0]
    print(f"ann recall@5 (ivf vs exact): {mean_rec:.3f}")

    # 11. corpus health report (r10): clustering quality of the
    #     embedding space (is the k-means geometry usable for
    #     SemDeDup cells / balanced sampling?) and the next round's
    #     training mixture from one-shot excess-loss reweighting
    from loudml_spark.pipeline.corpus import lm_perplexity
    from loudml_spark.pipeline.embeddings import (
        kmeans_fit, kmeans_silhouette,
    )
    from loudml_spark.pipeline.sampling import excess_loss_weights

    cents, hist = kmeans_fit(emb, k=8, max_iters=4)
    sil = kmeans_silhouette(emb, cents)
    msil = sil.agg(F.avg("mean_silhouette")).first()[0]
    print(f"k-means fit: inertia {hist[0]['total_inertia']:.0f} → "
          f"{hist[-1]['total_inertia']:.0f} in {len(hist)} iters; "
          f"mean silhouette {msil:.3f}")

    ppl = lm_perplexity(docs)
    mix = excess_loss_weights(
        docs.select("doc_id", "source").join(ppl, "doc_id"),
        domain_col="source", loss_col="ppl", size_col="n_tokens")
    print("next-epoch domain mix (top excess-loss sources):")
    for r in mix.orderBy(F.desc("excess")).limit(3).collect():
        print(f"  {r['source']:>8}  share={r['share']:.4f} → "
              f"weight={r['weight']:.4f} (excess ppl {r['excess']})")

    # 12. round-10b additions, where they slot into the flow:
    #     - bigram LM catches sequence-level junk the unigram missed
    #     - rank normalization calibrates quality across sources
    #       before any global keep-fraction
    #     - embedding-space decontamination complements the n-gram
    #       scan (paraphrased leaks)
    #     - the binary-sign index pre-filters ANN at 32:1 compression
    #       (re-ranked exactly), with its recall gate
    #     - HLL / KMV sketches audit corpus composition without a
    #       second full scan
    from loudml_spark.operators.sketch import hll_distinct, kmv_jaccard
    from loudml_spark.pipeline.corpus import bigram_perplexity, tokens
    from loudml_spark.pipeline.sampling import rank_normalize
    from loudml_spark.pipeline.similarity import (
        hamming_rerank_topk,
        semantic_decontaminate,
    )
    from loudml_spark.pipeline.text import lexical_diversity

    bp = bigram_perplexity(docs)
    worst = bp.orderBy(F.desc("ppl")).first()
    print(f"bigram ppl: worst doc {worst['doc_id']} "
          f"ppl={worst['ppl']:.1f} (sequence-level junk candidate)")

    ld = lexical_diversity(docs)
    low_ttr = ld.filter("n_tokens >= 20 AND ttr < 0.3").count()
    print(f"lexical diversity: {low_ttr} docs below TTR 0.3 "
          "(templated/looping text)")

    scored10 = docs.select("doc_id", "source").join(
        bp.select("doc_id", "ppl"), "doc_id")
    calib = rank_normalize(
        scored10, score_col="ppl", by=["source"], keep_frac=0.5)
    kept10 = calib.filter("NOT selected").count()  # low ppl = good
    print(f"rank-normalized ppl gate: {kept10} docs in the better "
          "half of EVERY source")

    sdecon = semantic_decontaminate(
        emb.filter("vec_id >= 20"),
        emb.filter("vec_id < 20").selectExpr(
            "vec_id AS bench_id", "embedding"),
        threshold=0.35)
    n_sem = sdecon.filter("contaminated").count()
    print(f"semantic decontamination: {n_sem} vectors within 0.35 "
          "cosine of the eval set")

    ham = hamming_rerank_topk(q10, emb, k=5, shortlist=100, dim=64)
    ham_rec = ann_recall(ham, cosine_topk(q10, emb, k=5)) \
        .agg(F.avg("recall")).first()[0]
    print(f"binary-sign rerank recall@5: {ham_rec:.3f} "
          "(32:1-compressed pre-filter + exact re-rank)")

    hv = hll_distinct(
        docs.select("source", "doc_id"),
        key_col="doc_id", by=["source"], p=6)
    worst_err = hv.agg(F.max("rel_err")).first()[0]
    print(f"hll per-source doc counts: worst rel_err {worst_err}")

    kj = kmv_jaccard(
        tokens(docs, id_col="source"),
        key_col="token", set_col="source", k=128)
    top = kj.orderBy(F.desc("est_jaccard")).first()
    print(f"kmv vocab jaccard: closest sources "
          f"{top['set_a']}~{top['set_b']} at {top['est_jaccard']}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")

"""An end-to-end LLM training-data pipeline on emdrive-spark: quality
gate → PII scrub → stratified rebalance → near-dedup → contamination
check, each stage a registered engine operator composing over the
documents corpus.

This is the north-star workload the engine is designed for at 100 TB:
every stage is either a zero-shuffle codegen projection (gate, scrub,
sample) or shuffles only signatures/counts (dedup, contamination) —
the document payload moves at most once.

Run: python examples/corpus_pipeline.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from emdrive_spark import registry
from emdrive_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("emdrive-corpus-pipeline")
    registry.load_all()
    q = registry.REGISTRY

    # 1. Quality gate: why would the corpus shrink?
    gate = q["quality_filter_gopher"].fn(spark, sf_dir).cache()
    audit = gate.groupBy("passed", "reasons").count().orderBy(F.desc("count"))
    print("== quality gate audit ==")
    audit.show(10, truncate=False)
    kept = gate.filter("passed").select("doc_id")

    # 1b. Perplexity bucketing (CCNet): keep the fluent head/middle
    ppl = q["text_perplexity_bucket"].fn(spark, sf_dir)
    print("== perplexity buckets ==")
    ppl.groupBy("bucket").count().orderBy("bucket").show()

    # 1c. Model-based quality score: hashed-feature linear classifier
    clf = q["quality_classifier_linear"].fn(spark, sf_dir)
    n_keep = clf.filter("keep").count()
    print(f"classifier keeps {n_keep} docs (score >= 0.5)")

    # 2. PII scrub: redaction counts over the kept slice
    scrub = q["text_pii_scrub"].fn(spark, sf_dir).join(kept, "doc_id")
    n_redacted = scrub.agg(
        F.sum("n_email").alias("emails"), F.sum("n_phone").alias("phones")
    ).collect()[0]
    print(f"redacted: {n_redacted['emails']} emails, {n_redacted['phones']} phones")

    # 3. Stratified rebalance: deterministic hash sampling per language
    sample = q["sample_stratified"].fn(spark, sf_dir)
    print("== post-rebalance language mix ==")
    sample.groupBy("lang").count().orderBy("lang").show()

    # 3b. Domain mixing: down-weight over-represented head sources
    mix = q["sample_domain_mix"].fn(spark, sf_dir)
    print("== post-mix head sources (src0/src1 down-weighted) ==")
    mix.groupBy("source").count().orderBy("source").show(5)

    # 3c. Temperature flattening: rates derived from the corpus itself
    temp = q["sample_temperature"].fn(spark, sf_dir)
    print(
        f"temperature (T=0.5) resample keeps {temp.count()} docs "
        f"(vs {mix.count()} under fixed shares)"
    )

    # 4. Near-dedup: minhash signature clusters (keep the min doc_id)
    clusters = q["dedup_minhash_det"].fn(spark, sf_dir)
    n_dupes = clusters.filter("dup_count > 1").count()
    print(f"near-dup clusters with >1 member: {n_dupes}")

    # 4b. The verified pipeline: band candidates → exact Jaccard rerank
    verified = q["dedup_lsh_verified"].fn(spark, sf_dir)
    print(f"verified near-dup pairs (jaccard ≥ 0.8 on LSH candidates): {verified.count()}")

    # 4c. Embedding-space near-dup: sign-LSH candidates → exact cosine
    emb_pairs = q["dedup_embedding"].fn(spark, sf_dir)
    print(f"embedding near-dup pairs (cos ≥ 0.95): {emb_pairs.count()}")

    # 4d. Multimodal: payload-hash banding (real pHash plugs in at decode)
    phash = q["mm_phash_dedup"].fn(spark, sf_dir)
    print(f"payload-hash dup pairs (hamming ≤ 3): {phash.count()}")

    # 4f. Typo-level fuzzy dedup: shingle candidates → exact Levenshtein
    fuzzy = q["dedup_edit_verified"].fn(spark, sf_dir)
    print(f"edit-distance near-dup pairs (lev <= 30 on candidates): {fuzzy.count()}")

    # 4g. Excerpt/quote containment: asymmetric Jaccard catches a doc
    # embedded in a longer one that symmetric Jaccard scores ~0.25
    contained = q["dedup_containment"].fn(spark, sf_dir)
    print(f"containment pairs (C >= 0.9 on candidates): {contained.count()}")

    # 4h. Incremental ingest: the NEXT batch dedupes against this
    # corpus's stored bands only — no history x history re-pairing
    ingest = q["dedup_incremental"].fn(spark, sf_dir)
    verdicts = {r["is_dup"]: r["count"] for r in ingest.groupBy("is_dup").count().collect()}
    print(
        f"ingest batch: {verdicts.get(True, 0)} rejected as history dups, "
        f"{verdicts.get(False, 0)} accepted"
    )

    # 4i. Substring-level dedup: cut corpus-repeated token spans out of
    # otherwise-unique docs instead of dropping the docs
    span_stats = (
        q["dedup_spans_cut"]
        .fn(spark, sf_dir)
        .agg(F.sum("n_cut").alias("tokens_cut"), F.sum("n_tokens").alias("tokens_total"))
        .collect()[0]
    )
    print(
        f"duplicated-span tokens cut: {span_stats['tokens_cut']} "
        f"of {span_stats['tokens_total']}"
    )
    kf_stats = (
        q["dedup_spans_keep_first"]
        .fn(spark, sf_dir)
        .agg(F.sum("n_cut").alias("tokens_cut"))
        .collect()[0]
    )
    print(
        f"  keep-first variant cuts only {kf_stats['tokens_cut']} "
        f"(one canonical copy of every span survives)"
    )

    # 4e. Boilerplate removal: corpus-wide duplicate-chunk dedup
    lines = q["dedup_lines_global"].fn(spark, sf_dir)
    removed = lines.agg(
        F.sum("n_removed").alias("chunks_removed"), F.sum("n_chunks").alias("chunks_total")
    ).collect()[0]
    print(
        f"boilerplate chunks removed: {removed['chunks_removed']} "
        f"of {removed['chunks_total']}"
    )

    # 5. Benchmark contamination: training docs overlapping the eval slice
    contam = q["contamination_ngram"].fn(spark, sf_dir)
    worst = contam.orderBy(F.desc("contamination")).limit(5)
    print("== most contaminated training docs ==")
    worst.show()

    # 6. Repetition gate: drop looped/spammy docs before packing
    rep = q["text_repetition"].fn(spark, sf_dir)
    spammy = rep.filter("dup_bigram_frac > 0.9 OR top_bigram_frac > 0.3").count()
    print(f"docs failing the repetition gate: {spammy}")

    # 7. Sequence packing: lay the surviving stream into 2048-token bins
    packed = q["pack_sequences"].fn(spark, sf_dir)
    stats = packed.groupBy("seq_id").agg(F.sum("n_tokens").alias("seq_tokens"))
    print("== packed-sequence fill (tokens per 2048 budget) ==")
    stats.agg(
        F.count("*").alias("n_seqs"),
        F.min("seq_tokens").alias("min"),
        F.max("seq_tokens").alias("max"),
    ).show()

    # 7b. RAG prep: overlapping retrieval chunks instead of packed bins
    chunks = q["text_chunk_overlap"].fn(spark, sf_dir)
    print("== retrieval chunks (64-token windows, 48 stride) ==")
    chunks.agg(
        F.count("*").alias("n_chunks"),
        F.countDistinct("doc_id").alias("n_docs"),
        F.avg("n_chunk_tokens").alias("avg_tokens"),
    ).show()

    # 8. Tokenizer training: the first BPE merge rules on the cleaned
    # corpus (one corpus word-count pass, vocab-bounded loop after)
    merges = q["bpe_train_merges"].fn(spark, sf_dir)
    print("== first BPE merges ==")
    merges.orderBy("merge_round").show(truncate=False)

    # 8b. Tokenize with the trained rules: bpe_apply re-applies the
    # merges to the corpus (via the vocabulary, never token-by-token)
    # and emits per-doc BPE token counts — the REAL budget unit. The
    # frame is ckpt'd once: both the stats below and the packing
    # stage consume it without re-running the training loop (the
    # multi-consumer pattern; pack_sequences_from_counts).
    from emdrive_spark.functions.ckpt import ckpt
    from emdrive_spark.operators.pipeline import pack_sequences_from_counts

    bpe = ckpt(q["bpe_apply"].fn(spark, sf_dir))
    print("== BPE tokenization (train -> tokenize loop closed) ==")
    bpe.agg(
        F.sum("n_words").alias("whitespace_tokens"),
        F.sum("n_bpe").alias("bpe_tokens"),
        (F.sum("n_bpe") / F.sum("n_words")).alias("symbols_per_word"),
    ).show()

    # 8c. Pack on that budget: documents are binned into 2048-BPE-
    # symbol training sequences (the train -> tokenize -> pack loop,
    # closed end-to-end — the packer consumes n_bpe, not whitespace
    # n_tokens and not an estimate). The registered pack_sequences_bpe
    # op is this same plan self-contained (it trains internally so the
    # driver can value-check it standalone).
    packed_bpe = pack_sequences_from_counts(spark, bpe)
    print("== sequences packed under the BPE budget ==")
    packed_bpe.groupBy("seq_id").agg(
        F.count("*").alias("docs"), F.sum("n_bpe").alias("seq_symbols")
    ).agg(
        F.count("*").alias("n_seqs"),
        F.avg("docs").alias("avg_docs_per_seq"),
        F.avg("seq_symbols").alias("avg_symbols"),
    ).show()

    spark.stop()


if __name__ == "__main__":
    main()

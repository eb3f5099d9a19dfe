"""Training-data pipeline operators: PII scrubbing, stratified corpus
sampling, composite quality gating, benchmark-contamination checks.

ABSENT in the reference (scalar surface is ULID/NOW only,
/root/reference/src/constructs/functions.rs:10-13); these are the
north-star LLM-corpus operations, each expressed as codegen'd Column
arithmetic (regex / hash / array ops) with no Python in the loop, so a
100 TB corpus pass stays one whole-stage-codegen projection or one
shingle-keyed shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from emdrive_spark.functions.ckpt import ckpt
from emdrive_spark.functions.layout import spread
from emdrive_spark.operators.text import _bpe_doc_counts, _bpe_per_doc_ctes, shingles, tokens
from emdrive_spark.registry import register
from emdrive_spark.sources.tables import load

_EMAIL_RE = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
_PHONE_RE = r"\d{7,}"


@register(
    "text_pii_scrub",
    oracle=rf"""
    WITH aug AS (
      SELECT doc_id,
             CASE WHEN doc_id % 10 = 0
                  THEN text || ' contact user' || doc_id ||
                       '@example.com or call 5551234567.'
                  ELSE text END AS t
      FROM documents
    ),
    e AS (
      SELECT doc_id, t,
             CAST(len(regexp_extract_all(t, '{_EMAIL_RE}')) AS BIGINT) AS n_email,
             regexp_replace(t, '{_EMAIL_RE}', '<EMAIL>', 'g') AS t1
      FROM aug
    )
    SELECT doc_id, n_email,
           CAST(len(regexp_extract_all(t1, '{_PHONE_RE}')) AS BIGINT) AS n_phone,
           regexp_replace(t1, '{_PHONE_RE}', '<PHONE>', 'g') AS scrubbed
    FROM e
    """,
)
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction: emails then long digit runs replaced by typed
    placeholders, with per-doc redaction counts. The fixture corpus is
    synthetic (no organic PII), so a deterministic injection (every
    10th doc gains an email + phone) exercises real matches; the regex
    dialect is the RE2-compatible subset that Java regex and DuckDB
    evaluate identically. One projection, no shuffle, no UDF."""
    d = load(spark, sf_dir, "documents")
    aug = F.when(
        F.col("doc_id") % 10 == 0,
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or call 5551234567."),
        ),
    ).otherwise(F.col("text"))
    # Email pass first; phone counted on the email-scrubbed value so a
    # digit run inside an address is never double-counted.
    step1 = d.select(
        "doc_id",
        F.size(F.regexp_extract_all(aug, F.lit(_EMAIL_RE), 0)).cast("long").alias("n_email"),
        F.regexp_replace(aug, _EMAIL_RE, "<EMAIL>").alias("t1"),
    )
    return step1.select(
        "doc_id",
        "n_email",
        F.size(F.regexp_extract_all(F.col("t1"), F.lit(_PHONE_RE), 0)).cast("long").alias("n_phone"),
        F.regexp_replace(F.col("t1"), _PHONE_RE, "<PHONE>").alias("scrubbed"),
    )


# lang → md5-prefix threshold: first hex byte of md5(doc_id) < limit.
# '1a'/256 ≈ 10.2% for the over-represented language, '80'/256 = 50%
# for the tail — the standard down-sample-the-head corpus rebalance.
_STRATA = {"en": "1a"}
_DEFAULT_LIMIT = "80"


@register(
    "sample_stratified",
    oracle=f"""
    SELECT doc_id, lang
    FROM documents
    WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2)
          < CASE WHEN lang = 'en' THEN '{_STRATA["en"]}' ELSE '{_DEFAULT_LIMIT}' END
    """,
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling by language: per-stratum rates
    applied via a key-hash threshold (md5 prefix), so every engine and
    every run selects the SAME rows — reproducible corpus rebalancing,
    unlike sampleBy()'s RNG draw. Pure filter: pushdown-friendly, no
    shuffle, and the sample stays aligned across derived tables keyed
    by doc_id."""
    limit = F.when(F.col("lang") == "en", _STRATA["en"]).otherwise(_DEFAULT_LIMIT)
    return (
        load(spark, sf_dir, "documents")
        .filter(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2) < limit)
        .select("doc_id", "lang")
    )


@register(
    "quality_filter_gopher",
    oracle=r"""
    WITH t AS (
      SELECT doc_id,
             regexp_split_to_array(trim(text), '\s+') AS toks,
             length(replace(text, ' ', '')) AS n_alpha
      FROM documents
    ),
    m AS (
      SELECT doc_id,
             CAST(len(toks) AS BIGINT) AS n_tokens,
             floor(CAST(n_alpha AS DOUBLE) / nullif(len(toks), 0) * 10000 + 0.5)
               / 10000 AS mean_word_len,
             len(list_filter(toks, x -> x = 'the')) > 0 AS has_stopword
      FROM t
    )
    SELECT doc_id, n_tokens, mean_word_len, has_stopword,
           (n_tokens >= 30 AND mean_word_len BETWEEN 2.0 AND 8.0 AND has_stopword)
             AS passed,
           coalesce(array_to_string(list_filter(
             [CASE WHEN n_tokens < 30 THEN 'too_short' END,
              CASE WHEN mean_word_len NOT BETWEEN 2.0 AND 8.0 THEN 'word_len' END,
              CASE WHEN NOT has_stopword THEN 'no_stopword' END],
             x -> x IS NOT NULL), ','), '') AS reasons
    FROM m
    """,
)
def quality_filter_gopher(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite quality gate in the Gopher/C4 style: document passes
    only if every rule holds (length floor, mean-word-length band,
    stopword presence), with the failed-rule list kept for audit. All
    rules are one codegen projection over the corpus — the reasons
    column is what makes a 100 TB filter debuggable (aggregate it to
    see WHY the corpus shrank)."""
    toks = tokens(F.col("text"))
    m = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        # floor(x*1e4+0.5)/1e4, not F.round (r4 review): Spark and
        # DuckDB half-up policies diverge at exact decimal midpoints
        # (65 chars / 32 toks = 2.03125), and this value also decides
        # the 2.0..8.0 band -> passed/reasons.
        (
            F.floor(
                F.length(F.regexp_replace("text", " ", "")).cast("double")
                / F.nullif(F.size(toks), F.lit(0))
                * 1e4
                + F.lit(0.5)
            )
            / 1e4
        ).alias("mean_word_len"),
        (F.size(F.filter(toks, lambda t: t == "the")) > 0).alias("has_stopword"),
    )
    too_short = F.col("n_tokens") < 30
    bad_len = ~F.col("mean_word_len").between(2.0, 8.0)
    no_stop = ~F.col("has_stopword")
    reasons = F.concat_ws(
        ",",
        F.filter(
            F.array(
                F.when(too_short, "too_short"),
                F.when(bad_len, "word_len"),
                F.when(no_stop, "no_stopword"),
            ),
            lambda x: x.isNotNull(),
        ),
    )
    return m.select(
        "doc_id",
        "n_tokens",
        "mean_word_len",
        "has_stopword",
        (~too_short & ~bad_len & ~no_stop).alias("passed"),
        reasons.alias("reasons"),
    )


_BENCH_SOURCE = "src0"


@register(
    "contamination_ngram",
    oracle=rf"""
    WITH sh AS (
      SELECT doc_id, source,
             list_distinct(
               list_transform(range(1, greatest(len(toks) - 2, 0) + 1),
                              i -> array_to_string(toks[i:i+2], ' '))) AS sh
      FROM (SELECT doc_id, source, regexp_split_to_array(trim(text), '\s+') AS toks
            FROM documents)
    ),
    bench AS (
      SELECT DISTINCT unnest(sh) AS s FROM sh WHERE source = '{_BENCH_SOURCE}'
    ),
    ex AS (
      SELECT doc_id, unnest(sh) AS s FROM sh WHERE source <> '{_BENCH_SOURCE}'
    ),
    overlap AS (
      SELECT doc_id, count(*) AS n_overlap FROM ex
      WHERE s IN (SELECT s FROM bench) GROUP BY doc_id
    )
    SELECT t.doc_id,
           CAST(len(t.sh) AS BIGINT) AS n_shingles,
           CAST(coalesce(o.n_overlap, 0) AS BIGINT) AS n_overlap,
           floor(CAST(coalesce(o.n_overlap, 0) AS DOUBLE)
                 / nullif(len(t.sh), 0) * 10000 + 0.5) / 10000 AS contamination
    FROM sh t LEFT JOIN overlap o ON t.doc_id = o.doc_id
    WHERE t.source <> '{_BENCH_SOURCE}'
    """,
)
def contamination_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination check: fraction of each training doc's
    distinct 3-gram shingles that appear anywhere in the held-out
    benchmark slice (source='src0' stands in for an eval set). The
    benchmark shingle vocabulary is tiny relative to the corpus, so it
    BROADCASTs; the corpus-side cost is one shingle projection + one
    broadcast semi-probe + a per-doc count — the 100 TB side shuffles
    only (doc_id, partial count) pairs."""
    d = load(spark, sf_dir, "documents")
    # The shingle frame feeds two branches (benchmark vocabulary +
    # training probe) that Spark would otherwise each recompute from
    # the few-split scan; rebalance the narrow input, then materialize
    # the shingled frame once (quiet-load A/B at sf0.1: 1.09 → 0.80 s
    # median, 7.4 s branch-race tail eliminated). See
    # functions/layout.py for when spread() applies.
    sh = (
        spread(d.select("doc_id", "source", "text"))
        .select("doc_id", "source", shingles(F.col("text")).alias("sh"))
        .transform(ckpt)
    )
    bench = (
        sh.filter(F.col("source") == _BENCH_SOURCE)
        .select(F.explode("sh").alias("s"))
        .distinct()
    )
    train = sh.filter(F.col("source") != _BENCH_SOURCE)
    # ONE shingle evaluation per doc: carry the count through the
    # explode (explode_outer keeps shingle-less docs) and left-probe
    # the broadcast set — re-deriving n_shingles from `train` later
    # would run the whole shingle pipeline a second time.
    ex = train.select(
        "doc_id",
        F.size("sh").cast("long").alias("n_shingles"),
        F.explode_outer("sh").alias("s"),
    )
    hit = ex.join(F.broadcast(bench.withColumn("hit", F.lit(1))), "s", "left")
    return hit.groupBy("doc_id", "n_shingles").agg(
        F.coalesce(F.sum("hit"), F.lit(0)).cast("long").alias("n_overlap"),
        # portable floor-rounding, same rationale as mean_word_len
        # (1 overlap / 32 shingles = 0.03125, an exact midpoint)
        (
            F.floor(
                F.coalesce(F.sum("hit"), F.lit(0)).cast("double")
                / F.nullif(F.first("n_shingles"), F.lit(0))
                * 1e4
                + F.lit(0.5)
            )
            / 1e4
        ).alias("contamination"),
    )


# -- CCNet-style global chunk dedup ---------------------------------------

_CHUNK = 12  # tokens per "line" (the fixture corpus has no newlines)


@register(
    "dedup_lines_global",
    oracle=rf"""
    WITH t AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
      FROM documents
    ),
    ch AS (
      SELECT doc_id, c AS pos,
             array_to_string(
               toks[c*{_CHUNK}+1 : least((c+1)*{_CHUNK}, len(toks))], ' ') AS chunk
      FROM t, unnest(range(0, CAST(ceil(len(toks) / {_CHUNK}.0) AS INT))) AS u(c)
    ),
    flagged AS (
      SELECT doc_id, pos, chunk,
             count(*) OVER (PARTITION BY chunk) AS cnt
      FROM ch
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_chunks,
           CAST(sum(CASE WHEN cnt > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
           coalesce(string_agg(CASE WHEN cnt <= 1 THEN chunk END, ' ' ORDER BY pos),
                    '') AS clean_text
    FROM flagged GROUP BY doc_id
    """,
)
def dedup_lines_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style duplicate-line removal: every document is cut into
    fixed 12-token chunks (the fixture has no newlines; on real corpora
    the splitter is '\\n'), chunks are counted CORPUS-WIDE, and any
    chunk occurring more than once anywhere is dropped from every
    document — boilerplate (headers, navbars, license blocks) vanishes
    even when the documents containing it are otherwise unique.

    Scale shape: one shuffle on the chunk text for the global count
    (at 100 TB, count on xxhash64(chunk) so only 8-byte keys shuffle),
    one shuffle on doc_id to reassemble. The rebuild keeps original
    chunk order via a pos-sorted array fold — no Python, no collect."""
    d = load(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    n = F.size(toks)
    nchunks = F.ceil(n / F.lit(float(_CHUNK))).cast("int")
    # sequence(0, k-1) DESCENDS for k < 1 — guard the empty-doc edge.
    chunks = F.when(
        n > 0,
        F.transform(
            F.sequence(F.lit(0), nchunks - 1),
            lambda c: F.array_join(F.slice(toks, c * _CHUNK + 1, _CHUNK), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    # spread() before the in-row chunk build + posexplode (layout.py):
    # tokenize + slice + join per chunk is scan-stage work otherwise.
    ch = spread(d.select("doc_id", "text")).select(
        "doc_id", F.posexplode(chunks).alias("pos", "chunk")
    )
    flagged = ch.withColumn("cnt", F.count("*").over(W.partitionBy("chunk")))
    return flagged.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_chunks"),
        F.sum(F.when(F.col("cnt") > 1, 1).otherwise(0)).cast("long").alias("n_removed"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.when(F.col("cnt") <= 1, F.struct("pos", "chunk")))
                ),
                lambda s: s["chunk"],
            ),
            " ",
        ).alias("clean_text"),
    )


# -- token-budget sequence packing ----------------------------------------

_SEQ_BUDGET = 2048  # tokens per packed training sequence


@register(
    "pack_sequences",
    oracle=rf"""
    WITH t AS (
      SELECT doc_id,
             CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tokens
      FROM documents
    ),
    c AS (
      SELECT doc_id, n_tokens,
             CAST(sum(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
                  - n_tokens AS BIGINT) AS start_tok
      FROM t
    )
    SELECT doc_id, n_tokens, start_tok,
           start_tok // {_SEQ_BUDGET} AS seq_id
    FROM c
    """,
)
def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-sequence packing: documents are laid out in doc_id
    order into a contiguous token stream and assigned to the
    2048-token sequence their first token lands in (pack-and-spill: a
    document straddling a boundary belongs to the sequence it starts
    in; the trainer's collator handles the tail).

    The global prefix sum is the scale hazard — a naive
    `Window.orderBy(doc_id)` with no partitionBy drags the whole corpus
    through ONE task. This computes it in two phases instead:
    per-range-partition token subtotals (one tiny row per partition)
    come to the driver, become prefix offsets, broadcast back, and the
    running sum runs per-partition — every task windows only its own
    range. The collect is #partitions rows, not data."""
    from emdrive_spark.functions.prefix import global_prefix_sum

    d = load(spark, sf_dir, "documents").select(
        "doc_id", F.size(tokens(F.col("text"))).cast("long").alias("n_tokens")
    )
    # Only the 2-column projection (doc_id, n_tokens) enters the prefix
    # sum (and its checkpoint) — tiny relative to the corpus at 100 TB.
    return global_prefix_sum(spark, d, "doc_id", "n_tokens", "start_tok").select(
        "doc_id",
        "n_tokens",
        "start_tok",
        F.expr(f"start_tok div {_SEQ_BUDGET}").alias("seq_id"),
    )


def _pack_bpe_oracle() -> str:
    return (
        "WITH "
        + ",\n    ".join(_bpe_per_doc_ctes())
        + f""",
    t AS (
      SELECT d.doc_id, CAST(coalesce(per.n_bpe, 0) AS BIGINT) AS n_bpe
      FROM documents d LEFT JOIN per USING (doc_id)
    ),
    c AS (
      SELECT doc_id, n_bpe,
             CAST(sum(n_bpe) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
                  - n_bpe AS BIGINT) AS start_tok
      FROM t
    )
    SELECT doc_id, n_bpe, start_tok,
           start_tok // {_SEQ_BUDGET} AS seq_id
    FROM c"""
    )


@register("pack_sequences_bpe", oracle=_pack_bpe_oracle())
def pack_sequences_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pack_sequences with the budget denominated in TRAINED-TOKENIZER
    tokens: documents are laid out in doc_id order into a contiguous
    stream of BPE symbols (bpe_apply's n_bpe — "the REAL budget unit",
    the count the trained tokenizer actually emits per document) and
    assigned to the 2048-symbol (_SEQ_BUDGET) sequence their first
    symbol lands in. Closes the r8 verdict seam where bpe_apply only
    fed a packed-sequence ESTIMATE while the packer binned on
    whitespace n_tokens.

    Scale shape: the count side is bpe_apply's own plan (one corpus
    pass for word frequencies, a vocabulary-bounded training loop,
    one unhinted tok->n_sym join, one combinable doc_id groupBy);
    packing then runs on the (doc_id, n_bpe) projection ONLY — the
    two-phase global_prefix_sum (per-range-partition subtotals to the
    driver, offsets broadcast back) so no task ever windows more than
    its own range and the collect stays #partitions rows. Docs with
    zero trainable words occupy zero budget but keep their row
    (n_bpe = 0), same as the oracle's LEFT JOIN."""
    return pack_sequences_from_counts(
        spark, _bpe_doc_counts(spark, sf_dir).select("doc_id", "n_bpe")
    )


def pack_sequences_from_counts(
    spark: SparkSession, counts: DataFrame, weight_col: str = "n_bpe"
) -> DataFrame:
    """Pack on an EXISTING per-doc count frame — the multi-consumer
    API (the related_topk_from_edges precedent): a pipeline that
    already ran bpe_apply `ckpt`s that frame once and derives both its
    tokenization stats and the packed-sequence layout from it, instead
    of re-running the BPE training loop inside the packer (the
    registered pack_sequences_bpe is self-contained BY DESIGN so the
    driver can value-check it standalone; a real pipeline composes).
    `counts` must carry a unique doc_id plus ``weight_col``; the
    packing itself is the two-phase prefix sum over that 2-column
    projection only."""
    from emdrive_spark.functions.prefix import global_prefix_sum

    return global_prefix_sum(
        spark, counts.select("doc_id", weight_col), "doc_id", weight_col, "start_tok"
    ).select(
        "doc_id",
        weight_col,
        "start_tok",
        F.expr(f"start_tok div {_SEQ_BUDGET}").alias("seq_id"),
    )


# -- domain mixing --------------------------------------------------------

# Head sources get explicit down-weights; every other source shares the
# remaining probability mass equally. min(1, target·N/count) caps at
# keep-everything — filtering can only downsample.
_MIX_HEAD = {"src0": 0.01, "src1": 0.02}
_MIX_REST = 1.0 - sum(_MIX_HEAD.values())


@register(
    "sample_domain_mix",
    oracle=f"""
    WITH counts AS (SELECT source, count(*) AS cnt FROM documents GROUP BY source),
    tot AS (SELECT CAST(sum(cnt) AS DOUBLE) AS n_total, count(*) AS n_sources
            FROM counts),
    rates AS (
      SELECT source,
             least(1.0,
                   (CASE WHEN source = 'src0' THEN {_MIX_HEAD["src0"]}
                         WHEN source = 'src1' THEN {_MIX_HEAD["src1"]}
                         ELSE {_MIX_REST} / (n_sources - 2) END)
                   * n_total / cnt) AS rate
      FROM counts, tot
    )
    SELECT d.doc_id, d.source
    FROM documents d JOIN rates r USING (source)
    WHERE r.rate >= 1.0
       OR substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8)
          < lpad(lower(hex(CAST(floor(r.rate * 4294967296) AS BIGINT))), 8, '0')
    """,
)
def sample_domain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain mixing: resample the corpus toward target per-source
    proportions (down-weight over-represented head domains, keep the
    tail whole). Acceptance rate per source is min(1, target_share ·
    N_total / N_source), applied as a deterministic md5-prefix
    threshold — the same rows survive on any engine, partitioning, or
    run, so the mix is reproducible and joins stay aligned.

    Scale shape: the per-source rate table is |sources| rows — computed
    with one tiny aggregation and BROADCAST back; the corpus side is a
    pure filter (pushdown-friendly, no shuffle of documents). The rate
    arithmetic keeps one association order (share · N) / count so the
    float threshold is bit-identical across engines."""
    d = load(spark, sf_dir, "documents")
    counts = d.groupBy("source").agg(F.count("*").alias("cnt"))
    tot = counts.agg(
        F.sum("cnt").cast("double").alias("n_total"), F.count("*").alias("n_sources")
    )
    share = (
        F.when(F.col("source") == "src0", F.lit(_MIX_HEAD["src0"]))
        .when(F.col("source") == "src1", F.lit(_MIX_HEAD["src1"]))
        .otherwise(F.lit(_MIX_REST) / (F.col("n_sources") - 2))
    )
    rates = counts.crossJoin(F.broadcast(tot)).select(
        "source",
        F.least(F.lit(1.0), share * F.col("n_total") / F.col("cnt")).alias("rate"),
    )
    thr = F.lpad(
        F.lower(F.hex(F.floor(F.col("rate") * 4294967296).cast("bigint"))), 8, "0"
    )
    return (
        d.join(F.broadcast(rates), "source")
        .filter(
            (F.col("rate") >= 1.0)
            | (F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8) < thr)
        )
        .select("doc_id", "source")
    )


# -- Gopher repetition signals --------------------------------------------


@register(
    "text_repetition",
    oracle=r"""
    WITH t AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
      FROM documents
    ),
    bge AS (
      SELECT doc_id, unnest(
        list_transform(range(1, greatest(len(toks) - 1, 0) + 1),
                       i -> array_to_string(toks[i:i+1], ' '))) AS b
      FROM t
    ),
    cnt AS (SELECT doc_id, b, count(*) AS c FROM bge GROUP BY doc_id, b),
    agg AS (
      SELECT doc_id, sum(c) AS total_bg, count(*) AS distinct_bg, max(c) AS top_bg
      FROM cnt GROUP BY doc_id
    )
    SELECT t.doc_id,
           CAST(len(toks) AS BIGINT) AS n_tokens,
           floor((1 - CAST(len(list_distinct(toks)) AS DOUBLE)
                      / CAST(nullif(len(toks), 0) AS DOUBLE)) * 10000 + 0.5)
             / 10000 AS dup_token_frac,
           floor((1 - CAST(distinct_bg AS DOUBLE)
                      / CAST(nullif(total_bg, 0) AS DOUBLE)) * 10000 + 0.5)
             / 10000 AS dup_bigram_frac,
           floor(CAST(top_bg AS DOUBLE)
                 / CAST(nullif(total_bg, 0) AS DOUBLE) * 10000 + 0.5)
             / 10000 AS top_bigram_frac
    FROM t JOIN agg USING (doc_id)
    """,
)
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signals: duplicate-token fraction,
    duplicate-bigram fraction, and the share of the single most
    frequent bigram — the standard gates for looped/spammy text. Token
    stats are in-array higher-order folds (no shuffle); the bigram
    frequency table needs a per-(doc, bigram) count — two doc_id-keyed
    shuffles that AQE coalesces. Rendering uses floor(x*1e4 + 0.5)/1e4
    rather than round(): identical doubles floor identically in every
    engine, while round() half-up/half-even policies diverge on exact
    decimal midpoints (e.g. a ratio of 1/128)."""
    d = load(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    t = d.select("doc_id", toks.alias("toks"), F.size(toks).cast("long").alias("n_tokens"))

    def fixed4(col):
        return F.floor(col * 10000 + F.lit(0.5)) / 10000

    # sequence(1, k) DESCENDS for k < 1 — emit no bigrams for 0/1-token docs
    bigrams = F.when(
        F.size("toks") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size("toks") - 1),
            lambda i: F.array_join(F.slice("toks", i, 2), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    bge = t.select("doc_id", F.explode(bigrams).alias("b"))
    cnt = bge.groupBy("doc_id", "b").count()
    agg = cnt.groupBy("doc_id").agg(
        F.sum("count").cast("long").alias("total_bg"),
        F.count("*").cast("long").alias("distinct_bg"),
        F.max("count").cast("long").alias("top_bg"),
    )
    return t.join(agg, "doc_id").select(
        "doc_id",
        "n_tokens",
        fixed4(
            1
            - F.size(F.array_distinct("toks")).cast("double")
            / F.nullif(F.col("n_tokens"), F.lit(0)).cast("double")
        ).alias("dup_token_frac"),
        fixed4(
            1 - F.col("distinct_bg").cast("double") / F.nullif(F.col("total_bg"), F.lit(0)).cast("double")
        ).alias("dup_bigram_frac"),
        fixed4(
            F.col("top_bg").cast("double") / F.nullif(F.col("total_bg"), F.lit(0)).cast("double")
        ).alias("top_bigram_frac"),
    )


# -- CCNet perplexity bucketing, BM25 search, linear quality classifier ---


def _fixed(col, digits: int):
    """floor(x*10^d + 0.5)/10^d — engine-portable half-up rounding.

    round() policies diverge between Spark (BigDecimal half-up on the
    double) and DuckDB (scaled-double) exactly at decimal midpoints;
    floor of an identical double is identical everywhere.
    """
    s = 10**digits
    return F.floor(col * s + F.lit(0.5)) / s


# Corpus-derived tercile cut points for the fixture vocabulary
# (measured once at build time; CCNet ships fixed per-language
# thresholds the same way — the cut is a constant, not a per-run
# quantile, so bucketing stays a pure projection at any scale).
_PPL_HEAD = 3.3999
_PPL_MIDDLE = 3.4040


@register(
    "text_perplexity_bucket",
    oracle=rf"""
    WITH tok AS (
      SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
      FROM documents
    ),
    vocab AS (SELECT tok, count(*) AS cnt FROM tok GROUP BY tok),
    tot AS (SELECT sum(cnt) AS total FROM vocab),
    lp AS (
      SELECT tok,
             floor(ln(CAST(cnt AS DOUBLE) / total) * 1000000 + 0.5) / 1000000 AS logp
      FROM vocab, tot
    ),
    scored AS (
      SELECT doc_id,
             floor(CAST(-sum(CAST(logp AS DECIMAL(18,6))) AS DOUBLE) / count(*)
                   * 10000 + 0.5) / 10000 AS nll
      FROM tok JOIN lp USING (tok)
      GROUP BY doc_id
    )
    SELECT doc_id, nll,
           CASE WHEN nll < {_PPL_HEAD} THEN 'head'
                WHEN nll < {_PPL_MIDDLE} THEN 'middle'
                ELSE 'tail' END AS bucket
    FROM scored
    """,
)
def text_perplexity_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style perplexity bucketing with a corpus-derived unigram
    LM: pass 1 aggregates token counts into a vocabulary (one shuffle
    keyed by token — bounded by vocabulary size, not corpus size);
    pass 2 joins the log-prob table back onto the token stream — an
    UNHINTED equality join (the log-prob table has one row per distinct
    token, corpus-unbounded, so a forced broadcast OOMs at 100 TB; AQE
    broadcasts it only when it measures small — the r7 PMI precedent)
    — and reduces mean negative log-likelihood per doc (one doc_id
    shuffle of (id, decimal) pairs). Docs land in head/middle/tail via FIXED cut
    points, exactly how CCNet ships per-language thresholds — so the
    bucket step is a pure projection and the whole op is two narrow
    shuffles at 100 TB. Per-token log-probs are floor-rounded to 6
    decimals and summed as DECIMAL so the mean is combine-order-exact
    on any partitioning."""
    d = load(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(tokens(F.col("text"))).alias("tok"))
    vocab = tok.groupBy("tok").agg(F.count("*").alias("cnt"))
    tot = vocab.agg(F.sum("cnt").alias("total"))
    lp = vocab.crossJoin(F.broadcast(tot)).select(
        "tok",
        _fixed(F.log(F.col("cnt").cast("double") / F.col("total")), 6).alias("logp"),
    )
    scored = (
        tok.join(lp, "tok")
        .groupBy("doc_id")
        .agg(
            _fixed(
                (-F.sum(F.col("logp").cast("decimal(18,6)"))).cast("double")
                / F.count("*"),
                4,
            ).alias("nll")
        )
    )
    bucket = (
        F.when(F.col("nll") < _PPL_HEAD, "head")
        .when(F.col("nll") < _PPL_MIDDLE, "middle")
        .otherwise("tail")
    )
    return scored.select("doc_id", "nll", bucket.alias("bucket"))


_BM25_TERMS = ("spark", "hash", "merge")
_BM25_K1 = 1.2
_BM25_B = 0.75


@register(
    "text_search_bm25",
    oracle=rf"""
    WITH docs AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
      FROM documents
    ),
    d AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl FROM docs),
    stats AS (
      SELECT CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl, count(*) AS n FROM d
    ),
    tf AS (
      SELECT doc_id, tok, count(*) AS tf
      FROM (SELECT doc_id, unnest(toks) AS tok FROM docs)
      WHERE tok IN {str(_BM25_TERMS)}
      GROUP BY doc_id, tok
    ),
    idf AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
    contrib AS (
      SELECT tf.doc_id,
             floor(
               (ln(1.0 + (stats.n - idf.df + 0.5) / (idf.df + 0.5))
                * (tf.tf * {_BM25_K1 + 1.0})
                / (tf.tf + {_BM25_K1} * ({1.0 - _BM25_B} + {_BM25_B} * (d.dl / stats.avgdl))))
               * 1000000 + 0.5) / 1000000 AS c
      FROM tf JOIN idf USING (tok) JOIN d ON tf.doc_id = d.doc_id, stats
    )
    SELECT doc_id,
           floor(CAST(sum(CAST(c AS DECIMAL(18,6))) AS DOUBLE) * 10000 + 0.5) / 10000
             AS score
    FROM contrib GROUP BY doc_id
    """,
)
def text_search_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-text keyword search: exact BM25 (k1=1.2, b=0.75) for a fixed
    query over the corpus. The token stream is filtered to the query
    terms BEFORE any shuffle, so the per-(doc, term) frequency table is
    proportional to matching postings, not corpus size; document-length
    stats reduce to two scalars (integer-sum exact, so avgdl is the
    same double everywhere) and the tiny df/idf table broadcasts. At
    100 TB this is one pushdown-filtered scan + one doc_id-keyed
    shuffle of matching postings — the classic search-engine scatter/
    gather expressed as DataFrame ops. Per-term contributions are
    floor-rounded and DECIMAL-summed for combine-order exactness."""
    # NO spread() here (measured, r12): the query-term filter drops
    # almost every posting right after the explode, so the scan side is
    # cheap and an up-front exchange of the full text column measured
    # 0.76 -> 1.28 s — the one case in the r12 spread sweep where the
    # exchange moves bytes the very next operator would discard.
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", tokens(F.col("text")).alias("toks")
    )
    d = docs.select("doc_id", F.size("toks").cast("long").alias("dl"))
    stats = d.agg(
        (F.sum("dl").cast("double") / F.count("*")).alias("avgdl"),
        F.count("*").alias("n"),
    )
    tf = (
        docs.select("doc_id", F.explode("toks").alias("tok"))
        .filter(F.col("tok").isin(*_BM25_TERMS))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("tf"))
    )
    idf = tf.groupBy("tok").agg(F.count("*").alias("df"))
    contrib = (
        tf.join(F.broadcast(idf), "tok")
        .join(d, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            _fixed(
                F.log(1.0 + (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5))
                * (F.col("tf") * (_BM25_K1 + 1.0))
                / (
                    F.col("tf")
                    + _BM25_K1
                    * ((1.0 - _BM25_B) + _BM25_B * (F.col("dl") / F.col("avgdl")))
                ),
                6,
            ).alias("c"),
        )
    )
    return contrib.groupBy("doc_id").agg(
        _fixed(F.sum(F.col("c").cast("decimal(18,6)")).cast("double"), 4).alias("score")
    )


@register(
    "quality_classifier_linear",
    oracle=r"""
    WITH tok AS (
      SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
      FROM documents
    ),
    w AS (
      SELECT doc_id,
             floor((CAST(('0x' || substr(md5(tok), 1, 8)) AS BIGINT)
                    / 2147483648.0 - 1.0) * 1000000 + 0.5) / 1000000 AS wt
      FROM tok
    ),
    s AS (
      SELECT doc_id,
             CAST(sum(CAST(wt AS DECIMAL(18,6))) AS DOUBLE) / count(*) AS raw
      FROM w GROUP BY doc_id
    )
    SELECT doc_id,
           floor(1.0 / (1.0 + exp(-raw)) * 1000 + 0.5) / 1000 AS score,
           raw >= 0 AS keep
    FROM s
    """,
)
def quality_classifier_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fastText-shaped linear quality classifier: hashed token features
    x a weight vector, mean-pooled, squashed by a sigmoid, thresholded
    at 0.5. Weights are DERIVED from md5 (uniform in [-1, 1)) so the
    engine and the DuckDB oracle score identically without shipping a
    model file — swap `_fixed`'s md5 weight for a broadcast weight map
    to run a real exported fastText/logreg model unchanged. The whole
    op is a projection plus one doc_id-keyed mean: at 100 TB the
    weights (real or hashed) broadcast, the text never shuffles, and
    scoring stays whole-stage-codegen arithmetic with no Python."""
    d = load(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(tokens(F.col("text"))).alias("tok"))
    wt = _fixed(
        F.conv(F.substring(F.md5("tok"), 1, 8), 16, 10).cast("long") / 2147483648.0
        - 1.0,
        6,
    )
    s = (
        tok.select("doc_id", wt.alias("wt"))
        .groupBy("doc_id")
        .agg(
            (F.sum(F.col("wt").cast("decimal(18,6)")).cast("double") / F.count("*")).alias(
                "raw"
            )
        )
    )
    # `keep` compares RAW, never the sigmoid: raw is decimal-sum/count,
    # bit-identical across engines, so the flag cannot drift. The score
    # passes through F.exp (libm/platform-dependent, the one non-portable
    # step here); a last-ulp exp difference only shows if the sigmoid
    # lands within 1 ulp of a rounding boundary, so round coarsely
    # (3 decimals) and accept that residual risk — documented, matching
    # the pow-ban rationale in agg_moments.
    return s.select(
        "doc_id",
        _fixed(1.0 / (1.0 + F.exp(-F.col("raw"))), 3).alias("score"),
        (F.col("raw") >= 0).alias("keep"),
    )


_CHUNK_W = 64  # tokens per chunk
_CHUNK_S = 48  # stride (16-token overlap between consecutive chunks)


@register(
    "text_chunk_overlap",
    oracle=rf"""
    WITH t AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
      FROM documents
    ),
    c AS (
      SELECT doc_id, toks,
             unnest(range(0, (greatest(len(toks) - {_CHUNK_W}, 0)
                              + {_CHUNK_S} - 1) // {_CHUNK_S} + 1)) AS chunk_id
      FROM t
    )
    SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
           CAST(len(toks[chunk_id * {_CHUNK_S} + 1
                         : chunk_id * {_CHUNK_S} + {_CHUNK_W}]) AS BIGINT)
             AS n_chunk_tokens,
           array_to_string(
             toks[chunk_id * {_CHUNK_S} + 1
                  : chunk_id * {_CHUNK_S} + {_CHUNK_W}], ' ') AS chunk_text
    FROM c
    """,
)
def text_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window document chunking (64-token chunks, 48-token
    stride → 16-token overlap): the retrieval/RAG and
    long-context-training prep step that turns each document into
    overlapping token windows, with the last window allowed short.
    Chunk COUNT is pure integer arithmetic (ceil((n-W)/S)+1 via
    (n-W+S-1) DIV S — portable, no float division), expansion is one
    codegen'd posexplode over a sequence, and slicing clamps at the
    document tail identically in both engines. One projection + one
    explode — no shuffle at all: chunking a 100 TB corpus is a pure
    map stage that AQE never has to touch."""
    toks = tokens(F.col("text"))
    # No spread() here, unlike the shingle/trigram ops: the window
    # expansion mostly re-serializes the same text (~1.3× bytes, no
    # per-element hashing), and the A/B at sf0.1 measured a wash
    # (0.45 vs 0.44 s median) — the rebalance shuffle buys nothing.
    d = load(spark, sf_dir, "documents").select(
        "doc_id", toks.alias("toks")
    )
    n_extra = F.expr(
        f"(greatest(size(toks) - {_CHUNK_W}, 0) + {_CHUNK_S} - 1) DIV {_CHUNK_S}"
    )
    chunks = d.select(
        "doc_id",
        "toks",
        F.explode(F.sequence(F.lit(0), n_extra)).alias("chunk_id"),
    )
    window = F.slice(
        F.col("toks"), F.col("chunk_id") * _CHUNK_S + 1, F.lit(_CHUNK_W)
    )
    return chunks.select(
        "doc_id",
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.size(window).cast("long").alias("n_chunk_tokens"),
        F.array_join(window, " ").alias("chunk_text"),
    )


@register(
    "sample_temperature",
    oracle="""
    WITH counts AS (SELECT source, count(*) AS cnt FROM documents GROUP BY source),
    tot AS (
      SELECT CAST(sum(cnt) AS DOUBLE) AS n_total,
             (SELECT list_reduce(list(sqrt(CAST(cnt AS DOUBLE)) ORDER BY source),
                                 (a, b) -> a + b)
              FROM counts) AS denom
      FROM counts
    ),
    rates AS (
      SELECT source,
             least(1.0,
                   (sqrt(CAST(cnt AS DOUBLE)) / denom) * n_total / cnt) AS rate
      FROM counts, tot
    )
    SELECT d.doc_id, d.source
    FROM documents d JOIN rates r USING (source)
    WHERE r.rate >= 1.0
       OR substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8)
          < lpad(lower(hex(CAST(floor(r.rate * 4294967296) AS BIGINT))), 8, '0')
    """,
)
def sample_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled domain sampling (T = 0.5): target share of
    source d is sqrt(n_d) / sum_d' sqrt(n_d') — the standard LLM
    data-mixing move that flattens the domain distribution without
    hand-picked rates (sample_domain_mix's fixed-share sibling).
    Acceptance per source is min(1, share x N_total / n_d) applied as
    the deterministic md5-prefix threshold, so the sampled set is
    reproducible on any engine, partitioning, or run.

    Float determinism needs TWO pins: sqrt is IEEE exactly-rounded
    (identical in every libm, unlike pow — which is why T is 1/2 and
    not a free parameter), and the sum over sources folds
    LEFT-TO-RIGHT over the source-name-sorted list in both engines —
    a plain SUM() would combine in partition order and could wobble
    the last ulp, flipping a doc whose hash sits exactly on the
    threshold boundary.

    Scale shape: identical to sample_domain_mix — one tiny per-source
    aggregation broadcast back, corpus side a pure deterministic-hash
    filter, no shuffle of documents."""
    d = load(spark, sf_dir, "documents")
    counts = d.groupBy("source").agg(F.count("*").alias("cnt"))
    sq = F.sqrt(F.col("cnt").cast("double"))
    tot = counts.agg(
        F.sum("cnt").cast("double").alias("n_total"),
        F.aggregate(
            F.transform(
                F.array_sort(F.collect_list(F.struct("source", sq.alias("s")))),
                lambda t: t["s"],
            ),
            F.lit(0.0),
            lambda a, b: a + b,
        ).alias("denom"),
    )
    rates = counts.crossJoin(F.broadcast(tot)).select(
        "source",
        F.least(
            F.lit(1.0), (sq / F.col("denom")) * F.col("n_total") / F.col("cnt")
        ).alias("rate"),
    )
    thr = F.lpad(
        F.lower(F.hex(F.floor(F.col("rate") * 4294967296).cast("bigint"))), 8, "0"
    )
    return (
        d.join(F.broadcast(rates), "source")
        .filter(
            (F.col("rate") >= 1.0)
            | (F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8) < thr)
        )
        .select("doc_id", "source")
    )


@register(
    "text_novelty",
    oracle=r"""
    WITH t AS (
      SELECT doc_id,
             list_distinct(
               list_transform(range(1, greatest(len(toks) - 2, 0) + 1),
                              i -> array_to_string(toks[i:i+2], ' '))) AS sh
      FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
            FROM documents)
    ),
    g AS (
      SELECT doc_id,
             CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT) AS gh
      FROM (SELECT doc_id, unnest(sh) AS s FROM t)
    ),
    w AS (
      SELECT doc_id, min(doc_id) OVER (PARTITION BY gh) AS first_doc
      FROM g
    ),
    a AS (
      SELECT doc_id, count(*) AS n_grams,
             count(*) FILTER (first_doc = doc_id) AS novel_cnt
      FROM w GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(coalesce(a.n_grams, 0) AS BIGINT) AS n_grams,
           CAST(coalesce(a.novel_cnt, 0) AS BIGINT) AS novel_cnt,
           floor(CAST(a.novel_cnt AS DOUBLE) / nullif(a.n_grams, 0) * 10000 + 0.5)
             / 10000 AS novel_frac
    FROM documents d LEFT JOIN a USING (doc_id)
    """,
)
def text_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document corpus novelty: the fraction of a doc's distinct
    3-gram shingles whose FIRST corpus occurrence (smallest doc_id) is
    this document — the marginal-contribution signal data curation
    uses to rank which documents add new content versus recombine
    what the corpus already has (the cross-document complement of
    text_repetition's within-document signals). Ingest-order doc_ids
    make 'first' well-defined and the whole op deterministic.

    Scale shape: shingles explode once and shuffle ONCE as (doc_id,
    gram-hash) pairs — the gram key is the portable md5-prefix bigint
    (8 bytes on the wire instead of the string, identical collisions
    in both engines so the oracle stays exact); first-occurrence is a
    min-over-partition window on that single exchange (no second
    groupBy+join pass), and the per-doc rollup is map-side
    combinable. Docs too short to shingle come back with zero counts
    via the left join, never dropped."""
    d = load(spark, sf_dir, "documents")
    # spread() past the single-reader scan before the shingle explode +
    # per-gram md5 (functions/layout.py; the r12 sketch_countmin_topk
    # A/B pattern — high-amplification projection at scan parallelism).
    sh = spread(d.select("doc_id", "text")).select(
        "doc_id", F.explode(shingles(F.col("text"))).alias("s")
    )
    g = sh.select(
        "doc_id",
        F.conv(F.substring(F.md5("s"), 1, 15), 16, 10).cast("long").alias("gh"),
    )
    w = g.select(
        "doc_id", F.min("doc_id").over(W.partitionBy("gh")).alias("first_doc")
    )
    a = w.groupBy("doc_id").agg(
        F.count("*").alias("n_grams"),
        F.count(F.when(F.col("first_doc") == F.col("doc_id"), 1)).alias("novel_cnt"),
    )
    return d.select("doc_id").join(a, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_grams", F.lit(0)).cast("long").alias("n_grams"),
        F.coalesce("novel_cnt", F.lit(0)).cast("long").alias("novel_cnt"),
        (
            F.floor(
                F.col("novel_cnt").cast("double")
                / F.nullif(F.col("n_grams"), F.lit(0))
                * 10000
                + F.lit(0.5)
            )
            / 10000
        ).alias("novel_frac"),
    )


_DSIR_BUCKETS = 4096  # hashed-feature space; constant regardless of vocab
_DSIR_KEEP_FRAC = 4  # keep the top 1/4 of docs by importance weight


@register(
    "quality_dsir",
    oracle=rf"""
    WITH tok AS (
      SELECT doc_id, lang,
             unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
      FROM documents
    ),
    b AS (
      SELECT doc_id, lang,
             CAST(('0x' || substr(md5(tok), 1, 15)) AS BIGINT) % {_DSIR_BUCKETS} AS bkt
      FROM tok
    ),
    raw AS (SELECT bkt, count(*) AS cr FROM b GROUP BY bkt),
    tgt AS (SELECT bkt, count(*) AS ct FROM b WHERE lang = 'en' GROUP BY bkt),
    tot AS (
      SELECT count(*) AS r,
             sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS t
      FROM b
    ),
    w AS (
      SELECT raw.bkt,
             floor(ln((coalesce(ct, 0) + 1.0) * (r + {_DSIR_BUCKETS})
                      / ((cr + 1.0) * (t + {_DSIR_BUCKETS})))
                   * 1000000 + 0.5) / 1000000 AS lw
      FROM raw LEFT JOIN tgt ON tgt.bkt = raw.bkt, tot
    ),
    s AS (
      SELECT doc_id,
             floor(CAST(sum(CAST(lw AS DECIMAL(18,6))) AS DOUBLE) / count(*)
                   * 10000 + 0.5) / 10000 AS dsir_score
      FROM b JOIN w ON w.bkt = b.bkt
      GROUP BY doc_id
    )
    SELECT doc_id, dsir_score FROM s
    QUALIFY row_number() OVER (ORDER BY dsir_score DESC, doc_id ASC)
            <= (SELECT count(*) FROM s) // {_DSIR_KEEP_FRAC}
    """,
)
def quality_dsir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style data selection via hashed-n-gram importance
    resampling (Xie et al. 2023, 'Data Selection for Language Models
    via Importance Resampling'): score every document by how much more
    likely its tokens are under a TARGET distribution (here the 'en'
    slice — in production, a trusted high-quality corpus) than under
    the RAW corpus, using two add-one-smoothed unigram models over a
    fixed 4096-bucket hashed feature space. Per-doc score is the mean
    per-token log importance ratio; the op returns the TOP QUARTER of
    docs by that weight with a (score desc, doc_id) total order — the
    selection step that importance-samples a raw crawl toward a curated
    target before pretraining (production DSIR samples proportional to
    weight; a deterministic top-k keeps the op oracle-checkable).

    Exactness recipe: bucket assignment is the portable md5-prefix
    hash (identical in Spark and DuckDB by construction, the
    sketch_countmin_topk recipe); bucket counts and totals are exact
    integers; each bucket's log ratio is ONE ln over an exact-integer
    rational (operands < 2^53, so the double argument is identical in
    both engines), floor-rounded to 6 decimals and summed as DECIMAL —
    the text_perplexity_bucket recipe, so an information-theoretic
    scorer gets a full value-hash oracle.

    Scale shape: two map-side-combinable groupBys over (doc, bucket)
    pairs — both keyed on the CONSTANT 4096-bucket space, so the
    weight table is KB-sized no matter the corpus and broadcasts back
    onto the token stream; the per-doc reduce is the only corpus-sized
    shuffle. Unlike a learned classifier, adding data never grows the
    model: at 100 TB the weight table is still 4096 rows."""
    d = load(spark, sf_dir, "documents")
    # spread() before the token explode + per-token md5 (layout.py):
    # also lets the 4 consumers of `b` (raw/tgt/tot/scored) reuse ONE
    # exchange instead of four serial scan+explode+hash replays.
    b = spread(d.select("doc_id", "lang", "text")).select(
        "doc_id", "lang", F.explode(tokens(F.col("text"))).alias("tok")
    ).select(
        "doc_id",
        "lang",
        (
            F.conv(F.substring(F.md5("tok"), 1, 15), 16, 10).cast("long")
            % _DSIR_BUCKETS
        ).alias("bkt"),
    )
    raw = b.groupBy("bkt").agg(F.count("*").alias("cr"))
    tgt = b.filter(F.col("lang") == "en").groupBy("bkt").agg(F.count("*").alias("ct"))
    tot = b.agg(
        F.count("*").alias("r"),
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).alias("t"),
    )
    w = (
        raw.join(tgt, "bkt", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "bkt",
            _fixed(
                F.log(
                    (F.coalesce(F.col("ct"), F.lit(0)) + 1.0)
                    * (F.col("r") + _DSIR_BUCKETS)
                    / ((F.col("cr") + 1.0) * (F.col("t") + _DSIR_BUCKETS))
                ),
                6,
            ).alias("lw"),
        )
    )
    scored = (
        b.join(F.broadcast(w), "bkt")
        .groupBy("doc_id")
        .agg(
            _fixed(
                F.sum(F.col("lw").cast("decimal(18,6)")).cast("double") / F.count("*"),
                4,
            ).alias("dsir_score")
        )
    )
    # top-quarter selection: k is a 1-row scalar action (the graph_hits
    # pattern), then orderBy+limit compiles to TakeOrderedAndProject —
    # per-partition k-sized heaps merged on the driver, never a
    # single-partition sort
    scored = scored.transform(ckpt)
    k = scored.count() // _DSIR_KEEP_FRAC
    return scored.orderBy(F.desc("dsir_score"), F.asc("doc_id")).limit(k)


@register(
    "corpus_mix_entropy",
    oracle="""
    WITH c AS (
      SELECT source, lang, count(*) AS c FROM documents GROUP BY source, lang
    ),
    t AS (
      SELECT source,
             CAST(sum(c) AS BIGINT) AS n_docs,
             CAST(count(*) AS BIGINT) AS n_langs,
             sum(CAST(floor(ln(c) * 1000000 + 0.5) / 1000000
                      AS DECIMAL(18,6)) * c) AS clnc
      FROM c GROUP BY source
    )
    SELECT source, n_docs, n_langs,
           floor((floor(ln(n_docs) * 1000000 + 0.5) / 1000000
                  - CAST(clnc AS DOUBLE) / n_docs)
                 * 1000000 + 0.5) / 1000000 AS entropy
    FROM t
    """,
)
def corpus_mix_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of each source's language mix — the
    diversity/monoculture diagnostic a mixing pipeline reads before
    setting sample_domain_mix / sample_temperature rates (a source
    whose entropy collapsed is a scrape gone wrong; one that spiked
    may have lost its language filter). Uses the exact identity
    H = ln(n) - (1/n)*sum(c*ln(c)) so every data-sized quantity is an
    exact integer count: each ln runs over an exact integer (identical
    doubles in both engines), is floor-rounded to 6 decimals, scaled
    by the exact count as DECIMAL, and summed as DECIMAL — the
    quality_dsir recipe, giving an information-theoretic aggregate a
    full value-hash oracle.

    Scale shape: one map-side-combinable groupBy to (source, lang)
    counts — the reduce side sees |sources|x|langs| rows, not the
    corpus — then a second combinable rollup to |sources| rows. No
    window, no join, no Python; at 100 TB both exchanges carry KBs."""
    d = load(spark, sf_dir, "documents")
    c = d.groupBy("source", "lang").agg(F.count("*").alias("c"))
    t = c.groupBy("source").agg(
        F.sum("c").alias("n_docs"),
        F.count("*").alias("n_langs"),
        F.sum(
            _fixed(F.log("c"), 6).cast("decimal(18,6)") * F.col("c")
        ).alias("clnc"),
    )
    return t.select(
        "source",
        "n_docs",
        "n_langs",
        _fixed(
            _fixed(F.log("n_docs"), 6) - F.col("clnc").cast("double") / F.col("n_docs"),
            6,
        ).alias("entropy"),
    )

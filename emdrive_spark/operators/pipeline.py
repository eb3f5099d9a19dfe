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

from emdrive_spark.operators.text import shingles, tokens
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
             round(CAST(n_alpha AS DOUBLE) / nullif(len(toks), 0), 4) AS mean_word_len,
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
        F.round(
            F.length(F.regexp_replace("text", " ", "")).cast("double")
            / F.nullif(F.size(toks), F.lit(0)),
            4,
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
           round(CAST(coalesce(o.n_overlap, 0) AS DOUBLE)
                 / nullif(len(t.sh), 0), 4) AS contamination
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
    sh = d.select("doc_id", "source", shingles(F.col("text")).alias("sh"))
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
        F.round(
            F.coalesce(F.sum("hit"), F.lit(0)).cast("double")
            / F.nullif(F.first("n_shingles"), F.lit(0)),
            4,
        ).alias("contamination"),
    )

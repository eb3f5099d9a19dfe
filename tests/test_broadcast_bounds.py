"""Broadcast boundedness gate (r7 VERDICT item 1, second half).

A forced ``F.broadcast`` hint is only correct when the built side is
bounded BY CONSTRUCTION — a dimension table, a 1-row scalar, a
#partitions/#buckets subtotal frame, a query-bounded probe set, or a
constant-size artifact. A broadcast of anything corpus-sized (the
vocabulary, the document-frequency table, a per-token model) OOMs the
driver/executors at 100 TB; round 7/8 removed exactly four such hints
(text_collocation_pmi, text_tfidf, text_keyword_extract,
text_perplexity_bucket's log-prob join).

This test enumerates every ``F.broadcast`` call site via AST and
requires each (module, enclosing function) to carry a recorded
boundedness argument below, with an exact per-function count — adding
a new hint (or another one to an existing function) without recording
why the built side is bounded fails CI. The categories:

- ``dim``       — dimension/catalog table (nation, region, supplier,
                  part or a filtered subset): scales with the catalog,
                  orders of magnitude below the fact/corpus stream.
- ``scalar``    — 1-row aggregate (count, total, avg, max).
- ``subtotals`` — one row per partition / bucket / calendar cell:
                  bounded by #partitions or a fixed grid, not data.
- ``per-group`` — one row per low-cardinality group (event type,
                  day part, language, source).
- ``query``     — bounded by the query/probe set (top-k probes, fixed
                  query terms, fixed benchmark artifact), not the
                  corpus being scanned.
- ``const``     — constant-size by construction (4096 hash buckets,
                  top-40-per-language profiles, <=64-long bloom words,
                  capped training sample, 16 IVF cells).
"""

from __future__ import annotations

import ast
import os

ROOT = os.path.join(os.path.dirname(__file__), "..", "emdrive_spark")

# (module relpath, enclosing function) -> (expected #sites, category, argument)
ALLOWED: dict[tuple[str, str], tuple[int, str, str]] = {
    ("functions/prefix.py", "global_prefix_sum"): (
        1, "subtotals", "per-partition subtotal frame: <= #partitions rows"),
    ("operators/similarity.py", "_with_query_vector"): (
        1, "scalar", "the single query vector (1 row)"),
    ("operators/similarity.py", "knn_join"): (
        1, "query", "fixed probe subset (doc_id-bounded query side)"),
    ("operators/similarity.py", "ann_recall"): (
        3, "query",
        "fixed query set, constant IVF centroid table (16 cells), and "
        "query x probed-cell routing rows"),
    ("operators/pipeline.py", "contamination_ngram"): (
        1, "query",
        "benchmark shingle set: the held-out eval suite is a fixed "
        "external artifact, not the training corpus"),
    ("operators/pipeline.py", "quality_dsir"): (
        2, "const", "1-row token total + constant 4096-bucket weight table"),
    ("operators/pipeline.py", "sample_domain_mix"): (
        2, "per-group", "1-row total + per-source sampling rates"),
    ("operators/pipeline.py", "sample_temperature"): (
        2, "per-group", "1-row total + per-source sampling rates"),
    ("operators/pipeline.py", "text_perplexity_bucket"): (
        1, "scalar",
        "1-row token total onto the vocabulary frame; the vocabulary-"
        "sized log-prob join itself is UNHINTED (r8 fix)"),
    ("operators/pipeline.py", "text_search_bm25"): (
        2, "query", "idf rows filtered to the fixed query terms + 1-row stats"),
    ("operators/text.py", "lang_id_ngram"): (
        1, "const", "top-40-trigrams-per-language profile table"),
    ("operators/text.py", "text_collocation_pmi"): (
        1, "scalar",
        "1-row corpus token total; both unigram joins are UNHINTED (r7 fix)"),
    ("operators/text.py", "eval_lang_confusion"): (
        1, "per-group", "per-language prediction totals"),
    ("operators/relational.py", "join_broadcast"): (
        2, "dim", "nation + region: the SS2.3 broadcast-join op itself"),
    ("operators/scale.py", "source_federated_join"): (
        1, "dim", "JSON-staged nation dimension"),
    ("operators/scale.py", "join_bloom_prefilter"): (
        2, "dim", "nation dimension + <=64-long bloom bitmap literal frame"),
    ("operators/analytics.py", "agg_benford"): (
        1, "scalar", "1-row grand total"),
    ("operators/analytics.py", "agg_mutual_info"): (
        1, "scalar", "1-row grand total"),
    ("operators/analytics.py", "basket_pair_lift"): (
        3, "dim",
        "per-item marginals (part catalog dimension) x2 + 1-row order count"),
    ("operators/analytics.py", "graph_pagerank"): (
        2, "scalar", "1-row node-count table, used twice"),
    ("operators/analytics.py", "sketch_countmin_topk"): (
        1, "query", "top-K probe rows (K x sketch depth, constant)"),
    ("operators/analytics.py", "tpch_q5"): (
        2, "dim", "nation + region"),
    ("operators/analytics.py", "tpch_q10"): (
        1, "dim", "nation"),
    ("operators/tpch_full.py", "tpch_q2"): (
        2, "dim", "nation x2 (supplier/customer sides)"),
    ("operators/tpch_full.py", "tpch_q7"): (
        2, "dim", "nation x2"),
    ("operators/tpch_full.py", "tpch_q8"): (
        4, "dim", "part (type-filtered), nation x2, region"),
    ("operators/tpch_full.py", "tpch_q9"): (
        2, "dim", "part (name-filtered) + nation"),
    ("operators/tpch_full.py", "tpch_q11"): (
        2, "dim", "nation + 1-row group-value total"),
    ("operators/tpch_full.py", "tpch_q15"): (
        1, "scalar", "1-row max revenue"),
    ("operators/tpch_full.py", "tpch_q16"): (
        1, "dim", "complaint-supplier anti-join side (supplier subset)"),
    ("operators/tpch_full.py", "tpch_q17"): (
        2, "dim",
        "brand/container-filtered part subset + its per-part avg quantity"),
    ("operators/tpch_full.py", "tpch_q20"): (
        3, "dim", "filtered part/supplier subsets + nation"),
    ("operators/tpch_full.py", "tpch_q21"): (
        1, "dim", "supplier (nation-filtered)"),
    ("operators/tpch_full.py", "tpch_q22"): (
        1, "scalar", "1-row avg balance"),
    ("operators/timeseries.py", "agg_chisq_independence"): (
        2, "per-group", "row margins (event types) + column margins (day parts)"),
    ("operators/timeseries.py", "agg_ks_test"): (
        1, "subtotals", "per-bucket running-count offsets"),
    ("operators/timeseries.py", "events_cusum"): (
        1, "scalar", "1-row global mean stats"),
    ("operators/timeseries.py", "events_detect_gaps"): (
        1, "subtotals", "calendar-bounded hour-bucket boundary grid"),
    ("operators/timeseries.py", "events_interpolate"): (
        1, "subtotals", "per-bucket boundary-stitch rows (<= #buckets)"),
    ("operators/timeseries.py", "events_outlier_mad"): (
        2, "per-group", "per-event-type exact medians + MADs"),
}


def _broadcast_sites() -> dict[tuple[str, str], int]:
    sites: dict[tuple[str, str], int] = {}
    for dirpath, _, files in os.walk(ROOT):
        for fn in files:
            if not fn.endswith(".py"):
                continue
            path = os.path.join(dirpath, fn)
            with open(path) as fh:
                src = fh.read()
            if "F.broadcast" not in src:
                continue
            tree = ast.parse(src)
            funcs = [
                (n.lineno, n.end_lineno or n.lineno, n.name)
                for n in ast.walk(tree)
                if isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef))
            ]
            rel = os.path.relpath(path, ROOT)
            for node in ast.walk(tree):
                if (
                    isinstance(node, ast.Call)
                    and isinstance(node.func, ast.Attribute)
                    and node.func.attr == "broadcast"
                    and isinstance(node.func.value, ast.Name)
                    and node.func.value.id == "F"
                ):
                    enc = "<module>"
                    enc_start = -1
                    for s, e, name in funcs:
                        if s <= node.lineno <= e and s > enc_start:
                            enc, enc_start = name, s
                    key = (rel, enc)
                    sites[key] = sites.get(key, 0) + 1
    return sites


def test_every_broadcast_site_has_a_boundedness_argument():
    sites = _broadcast_sites()
    unrecorded = {k: v for k, v in sites.items() if k not in ALLOWED}
    assert not unrecorded, (
        "F.broadcast sites without a recorded boundedness argument "
        f"(is the built side dim/scalar/subtotals/per-group/query/const "
        f"by construction? if corpus-unbounded, DROP the hint and let "
        f"AQE decide): {sorted(unrecorded)}"
    )
    drifted = {
        k: (sites[k], ALLOWED[k][0])
        for k in sites
        if sites[k] != ALLOWED[k][0]
    }
    assert not drifted, f"site count drift (got, recorded): {drifted}"
    gone = [k for k in ALLOWED if k not in sites]
    assert not gone, f"stale allowlist entries (sites removed): {gone}"


def test_vocabulary_joins_are_unhinted():
    """The four r7/r8 de-hinted vocabulary joins must stay unhinted:
    no broadcast sites at all in these functions beyond the recorded
    bounded ones (text_tfidf / text_keyword_extract have ZERO)."""
    sites = _broadcast_sites()
    assert ("operators/text.py", "text_tfidf") not in sites
    assert ("operators/text.py", "text_keyword_extract") not in sites
    # perplexity keeps exactly its 1-row scalar; the lp join is plain
    assert sites.get(("operators/pipeline.py", "text_perplexity_bucket")) == 1
    assert sites.get(("operators/text.py", "text_collocation_pmi")) == 1

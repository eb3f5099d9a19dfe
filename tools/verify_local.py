"""Local mirror of the driver's correctness gate.

Runs every queries() entry at a given SF and compares against its
oracle_sql() twin in DuckDB: row count, column names, dtype KINDS, and
exact values after sorting columns by name and rows by value. The dtype
check exists because the driver hashes the pandas repr of each value —
int64 ``1`` vs float64 ``1.0`` hash differently even though numpy ``==``
calls them equal (the r2 `events_session_agg` failure class: DuckDB
returns HUGEINT for integer sum(), pandas converts that to float64).
A value-equal-but-kind-mismatched column is therefore a FAIL here.

Usage: python tools/verify_local.py [sf_dir] [only_op ...]
"""

from __future__ import annotations

import sys
import time
import traceback

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

from emdrive_spark import registry  # noqa: E402
from emdrive_spark.session import get_spark  # noqa: E402
from emdrive_spark.sources.tables import TABLES, table_path  # noqa: E402


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        # unify timestamp flavors to naive UTC ns
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None)
    rows = sorted(df.itertuples(index=False, name=None), key=repr)
    return pd.DataFrame(rows, columns=df.columns)


def dtype_kind(s: pd.Series) -> str:
    """Collapse a dtype to the kind the driver's value-hash distinguishes.

    int vs float is the load-bearing split (repr '1' vs '1.0'); bool,
    timestamps, and everything-else (strings/objects/decimals) round out
    the partition. Nullable pandas extension ints count as int.
    """
    if pd.api.types.is_bool_dtype(s):
        return "bool"
    if pd.api.types.is_integer_dtype(s):
        return "int"
    if pd.api.types.is_float_dtype(s):
        return "float"
    if pd.api.types.is_datetime64_any_dtype(s):
        return "timestamp"
    return "object"


def compare(name: str, spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> list[str]:
    problems = []
    if len(spark_pdf) != len(oracle_pdf):
        problems.append(f"row count {len(spark_pdf)} != oracle {len(oracle_pdf)}")
    if sorted(spark_pdf.columns) != sorted(oracle_pdf.columns):
        problems.append(f"columns {sorted(spark_pdf.columns)} != {sorted(oracle_pdf.columns)}")
        return problems
    for c in sorted(spark_pdf.columns):
        ka, kb = dtype_kind(spark_pdf[c]), dtype_kind(oracle_pdf[c])
        if ka != kb:
            problems.append(
                f"col {c}: dtype kind mismatch spark={ka}({spark_pdf[c].dtype}) "
                f"oracle={kb}({oracle_pdf[c].dtype}) — driver hash WILL differ"
            )
    if problems:
        return problems
    a, b = normalize(spark_pdf), normalize(oracle_pdf)
    if len(a) == len(b):
        for c in a.columns:
            av, bv = a[c], b[c]
            try:
                eq = (av.values == bv.values) | (av.isna().values & bv.isna().values)
            except Exception:
                eq = av.astype(str).values == bv.astype(str).values
            if not eq.all():
                idx = (~eq).nonzero()[0][:3]
                examples = [(av.iloc[i], bv.iloc[i]) for i in idx]
                problems.append(f"col {c}: {int((~eq).sum())} mismatches, e.g. {examples}")
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("verify-local")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{table_path(sf_dir, t)}'")

    qs = registry.queries()
    oracles = registry.oracle_sql()
    n_pass = n_fail = n_rows_only = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception:
            print(f"FAIL {name}: spark raised\n{traceback.format_exc()}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"rows-only {name}: {len(sdf)} rows ({time.time()-t0:.1f}s)")
            n_rows_only += 1
            continue
        try:
            opdf = con.execute(oracles[name]).fetchdf()
        except Exception:
            print(f"FAIL {name}: oracle raised\n{traceback.format_exc()}")
            n_fail += 1
            continue
        problems = compare(name, sdf, opdf)
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"PASS {name}: {len(sdf)} rows ({time.time()-t0:.1f}s)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())

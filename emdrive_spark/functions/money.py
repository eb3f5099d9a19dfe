"""Exact money arithmetic for cross-engine-deterministic aggregates.

Why: the corpus's money columns (prices, discounts, event values) are
2-decimal values stored as doubles. A double SUM's value depends on
combine order, which varies with partition count and task completion
order — in BOTH Spark and DuckDB. round(sum, 2) absorbs the ulp noise
almost always, but when the true sum sits exactly on a half-cent
boundary the last ulp decides the cent, and a result that matched the
oracle locally can miss by .01 under the driver's partitioning (seen
on tpch_q10 at sf0.01). DECIMAL sums are exact: same value on any
engine, any partitioning, every run.

Pattern: cast operands to DECIMAL before multiplying/summing; round
(a no-op or exact on decimals) and cast the final value to DOUBLE for
a stable comparison type. Intermediate products get explicit casts so
neither engine's precision-propagation rules overflow 38 digits.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

D2 = "decimal(18,2)"  # money columns
D4 = "decimal(4,2)"   # rate columns (discount/tax, 0.00-0.99)


def dec2(col) -> Column:
    return F.col(col).cast(D2) if isinstance(col, str) else col.cast(D2)


def rate(col) -> Column:
    """1 ± rate as an exact decimal."""
    return F.col(col).cast(D4) if isinstance(col, str) else col.cast(D4)


def money_sum(col) -> Column:
    """Exact SUM of a 2-decimal column → double."""
    return F.sum(dec2(col)).cast("double")


def disc_price() -> Column:
    """l_extendedprice * (1 - l_discount), exactly."""
    return dec2("l_extendedprice") * (1 - rate("l_discount"))


def charge() -> Column:
    """disc_price * (1 + l_tax), exactly (intermediate re-cast keeps
    both engines inside decimal(38,*))."""
    return disc_price().cast("decimal(24,4)") * (1 + rate("l_tax"))


# SQL twins for DuckDB oracles (same casts, same shapes)
SQL_DISC_PRICE = (
    "CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))"
)
SQL_CHARGE = (
    f"CAST({SQL_DISC_PRICE} AS DECIMAL(24,4)) * (1 + CAST(l_tax AS DECIMAL(4,2)))"
)


def sql_money_sum(col: str) -> str:
    return f"CAST(sum(CAST({col} AS DECIMAL(18,2))) AS DOUBLE)"

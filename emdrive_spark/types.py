"""Emdrive type system mapped onto Spark (SURVEY §1.2).

The reference declares a fixed, explicit type lattice
(/root/reference/src/constructs/components.rs:11-21) with
non-nullable-by-default columns and a NULLABLE(T) wrapper
(/root/reference/README.md:14-19) — the inverse of Spark's default.
This module owns the mapping and the DDL-string parse
(``UINT32``, ``NULLABLE(STRING(128))`` ...).

Unsigned widths are promoted one step so the full unsigned range fits
in Spark's signed types; UINT64/UINT128 use DecimalType for exactness
(UINT128 max exceeds Decimal(38) — documented edge, hash-style values
should live in BinaryType instead).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import types as T


class EmdriveTypeError(ValueError):
    pass


# base name -> (spark type factory, has_length_param)
_BASE = {
    "UINT8": lambda n: T.ShortType(),
    "UINT16": lambda n: T.IntegerType(),
    "UINT32": lambda n: T.LongType(),
    "UINT64": lambda n: T.DecimalType(20, 0),
    "UINT128": lambda n: T.DecimalType(38, 0),
    "BOOL": lambda n: T.BooleanType(),
    "TIMESTAMP": lambda n: T.TimestampType(),
    "UUID": lambda n: T.StringType(),
    "STRING": lambda n: T.StringType(),
    # engine extensions beyond the reference (north-star tables)
    "FLOAT32": lambda n: T.FloatType(),
    "FLOAT64": lambda n: T.DoubleType(),
    "VECTOR": lambda n: T.ArrayType(T.DoubleType()),
    "BINARY": lambda n: T.BinaryType(),
}

MAX_STRING_LENGTH = 2048  # declared cap, /root/reference/README.md:17


@dataclass(frozen=True)
class EmdriveType:
    """A parsed emdrive type: base name, optional length, nullability."""

    base: str
    length: int | None = None
    nullable: bool = False  # non-nullable by default (README.md:19)

    @property
    def spark_type(self) -> T.DataType:
        return _BASE[self.base](self.length)

    def render(self) -> str:
        inner = self.base if self.length is None else f"{self.base}({self.length})"
        return f"NULLABLE({inner})" if self.nullable else inner


def parse_type(s: str) -> EmdriveType:
    """Parse an emdrive DDL type string, e.g. ``NULLABLE(STRING(128))``.

    Mirrors the reference's type grammar: NULLABLE() wrapper
    (components.rs:23-27), STRING(n) length parameter (README.md:17 —
    a parser TODO in the reference, create_table.rs:39; implemented
    here as declared)."""
    raw = s.strip()
    nullable = False
    upper = raw.upper()
    if upper.startswith("NULLABLE(") and raw.endswith(")"):
        nullable = True
        raw = raw[len("NULLABLE(") : -1].strip()
        upper = raw.upper()
    length = None
    if "(" in raw:
        if not raw.endswith(")"):
            raise EmdriveTypeError(f"malformed type {s!r}")
        base, _, rest = raw.partition("(")
        base = base.strip().upper()
        try:
            length = int(rest[:-1].strip())
        except ValueError:
            raise EmdriveTypeError(f"non-integer length in type {s!r}") from None
        if base != "STRING":
            raise EmdriveTypeError(f"type {base} does not take a length parameter")
        if not 1 <= length <= MAX_STRING_LENGTH:
            raise EmdriveTypeError(
                f"STRING length must be in 1..{MAX_STRING_LENGTH}, got {length}"
            )
    else:
        base = upper
    if base not in _BASE:
        raise EmdriveTypeError(f"unknown type {base!r}; known: {sorted(_BASE)}")
    return EmdriveType(base=base, length=length, nullable=nullable)

"""Typed AST for the emdrive dialect — the analog of the reference's
``Statement`` enum and construct components
(/root/reference/src/sql/parser.rs:66-71,
/root/reference/src/constructs/statements.rs,
/root/reference/src/constructs/components.rs:73-101).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from emdrive_spark.sql.errors import EmdriveValidationError
from emdrive_spark.types import EmdriveType


# --- expressions (components.rs:73-88) -------------------------------------


@dataclass(frozen=True)
class Const:
    value: object  # int | float | str | bool | None


@dataclass(frozen=True)
class Ident:
    name: str


@dataclass(frozen=True)
class FuncCall:
    name: str  # ULID | NOW (functions.rs:10-13)
    args: tuple = ()


@dataclass(frozen=True)
class BinOp:
    op: str  # = < > <= >= != @ AND OR
    left: object
    right: object


Expr = Const | Ident | FuncCall | BinOp


# --- statements -------------------------------------------------------------


@dataclass(frozen=True)
class ColumnDef:
    """components.rs:95-101 + declared METRIC KEY (README.md:26,45)."""

    name: str
    etype: EmdriveType
    primary_key: bool = False
    metric: str | None = None  # e.g. 'hamming' from METRIC KEY USING mtree(hamming)
    index_kind: str | None = None  # mtree | emtree
    default: Expr | None = None


@dataclass(frozen=True)
class CreateTable:
    name: str
    columns: tuple[ColumnDef, ...]
    if_not_exists: bool = False

    def validate(self) -> None:
        """Mirrors TableDefinition::validate
        (/root/reference/src/constructs/components.rs:133-172):
        nonempty name, ≥1 column, unique column names, exactly one
        PRIMARY KEY."""
        if not self.name:
            raise EmdriveValidationError("Table name must not be empty.")
        if not self.columns:
            raise EmdriveValidationError(
                f"Table {self.name} must have at least one column."
            )
        names = [c.name for c in self.columns]
        if len(set(names)) != len(names):
            dupes = sorted({n for n in names if names.count(n) > 1})
            raise EmdriveValidationError(
                f"Column names must be unique; duplicated: {', '.join(dupes)}."
            )
        pks = [c.name for c in self.columns if c.primary_key]
        if len(pks) != 1:
            raise EmdriveValidationError(
                f"Table {self.name} must have exactly one PRIMARY KEY column, "
                f"found {len(pks)}."
            )
        pk = next(c for c in self.columns if c.primary_key)
        if pk.etype.nullable:
            # SQL NULL never equals NULL, so the left-semi PK clash
            # check cannot see duplicate NULL keys — a NULLABLE PK would
            # quietly break the uniqueness contract (r4 review).
            raise EmdriveValidationError(
                f"PRIMARY KEY column {pk.name!r} must not be NULLABLE."
            )


@dataclass(frozen=True)
class Insert:
    table: str
    columns: tuple[str, ...]
    rows: tuple[tuple[Expr, ...], ...]

    def validate(self) -> None:
        for row in self.rows:
            if len(row) != len(self.columns):
                raise EmdriveValidationError(
                    f"INSERT has {len(self.columns)} columns but a row with "
                    f"{len(row)} values."
                )


@dataclass(frozen=True)
class SelectItem:
    expr: Expr
    alias: str | None = None


@dataclass(frozen=True)
class OrderItem:
    expr: Expr
    asc: bool = True


@dataclass(frozen=True)
class Select:
    table: str
    items: tuple[SelectItem, ...] = field(default_factory=tuple)  # empty = *
    where: Expr | None = None
    order_by: tuple[OrderItem, ...] = field(default_factory=tuple)
    limit: int | None = None

    def validate(self) -> None:
        if not self.table:
            raise EmdriveValidationError("SELECT requires a source table.")
        if self.limit is not None and self.limit < 0:
            raise EmdriveValidationError("LIMIT must be non-negative.")


Statement = CreateTable | Insert | Select

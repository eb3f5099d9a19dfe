"""Dialect-contract tests mirroring the reference's inline test intent
(/root/reference/src/sql/tokenizer.rs:267-540, parser.rs:83-205,
components.rs validation)."""

from __future__ import annotations

import pytest

from emdrive_spark.sql import ast
from emdrive_spark.sql.errors import EmdriveSyntaxError, EmdriveValidationError
from emdrive_spark.sql.parser import parse_statement
from emdrive_spark.sql.tokenizer import tokenize
from emdrive_spark.types import parse_type


# --- tokenizer (tokenizer.rs tests) -----------------------------------------


def test_keywords_case_insensitive_identifiers_case_sensitive():
    toks = tokenize("select Foo from BarBaz")
    assert [t.kind for t in toks] == ["keyword", "identifier", "keyword", "identifier"]
    assert toks[0].value == "SELECT"
    assert toks[1].value == "Foo"  # identifier case preserved
    assert toks[3].value == "BarBaz"


def test_string_escapes():
    toks = tokenize(r"SELECT a FROM t WHERE b = 'it\'s \\ fine'")
    assert toks[-1].kind == "string"
    assert toks[-1].value == r"it's \ fine"


def test_delimiters_split_eagerly():
    toks = tokenize("INSERT INTO t(a,b)VALUES(1,2)")
    assert [t.value for t in toks if t.kind == "op"] == list("(,)(,)")


def test_semicolon_terminates():
    toks = tokenize("SELECT a FROM t; DROP TABLE t")
    assert [t.value for t in toks] == ["SELECT", "a", "FROM", "t"]


def test_unterminated_string_raises():
    with pytest.raises(EmdriveSyntaxError, match="Unterminated string"):
        tokenize("SELECT 'oops FROM t")


# --- type parse (SURVEY §1.2) ------------------------------------------------


def test_parse_type_nullable_string_len():
    t = parse_type("NULLABLE(STRING(128))")
    assert t.base == "STRING" and t.length == 128 and t.nullable
    assert parse_type("UINT64").spark_type.simpleString() == "decimal(20,0)"
    assert not parse_type("uint8").nullable  # non-nullable by default


def test_parse_type_rejects_bad_length():
    with pytest.raises(Exception, match="STRING length"):
        parse_type("STRING(4096)")


# --- parser goldens (parser.rs:98-205) ---------------------------------------

CREATE_PHOTOS = """
CREATE TABLE IF NOT EXISTS photos_seen (
    hash UINT8 METRIC KEY USING mtree(hamming),
    url STRING(2048) PRIMARY KEY,
    width UINT32,
    height UINT32,
    seen_at TIMESTAMP DEFAULT NOW()
)
"""


def test_parse_create_table_flagship():
    stmt = parse_statement(CREATE_PHOTOS)
    assert isinstance(stmt, ast.CreateTable)
    assert stmt.if_not_exists
    assert stmt.name == "photos_seen"
    h, url, w, _, seen = stmt.columns
    assert h.metric == "hamming" and h.index_kind == "mtree"
    assert url.primary_key and url.etype.length == 2048
    assert w.etype.base == "UINT32"
    assert seen.default == ast.FuncCall(name="NOW")
    stmt.validate()


def test_parse_insert_multi_row():
    stmt = parse_statement(
        "INSERT INTO t (id, name) VALUES (ULID(), 'a'), (ULID(), 'b')"
    )
    assert isinstance(stmt, ast.Insert)
    assert stmt.columns == ("id", "name")
    assert len(stmt.rows) == 2
    assert stmt.rows[0][0] == ast.FuncCall(name="ULID")


def test_parse_select_distance_alias_where():
    stmt = parse_statement(
        "SELECT url, hash @ 0b00001011 AS distance FROM photos_seen WHERE distance < 4"
    )
    assert isinstance(stmt, ast.Select)
    item = stmt.items[1]
    assert item.alias == "distance"
    assert item.expr == ast.BinOp(op="@", left=ast.Ident("hash"), right=ast.Const(11))
    assert stmt.where == ast.BinOp(op="<", left=ast.Ident("distance"), right=ast.Const(4))


def test_parse_error_message_shape():
    with pytest.raises(EmdriveSyntaxError, match="Expected .*, instead found .* at line"):
        parse_statement("CREATE TABLE (x UINT8)")


# --- validation (components.rs:133-172) ---------------------------------------


def _col(name, pk=False):
    return ast.ColumnDef(name=name, etype=parse_type("UINT32"), primary_key=pk)


def test_validate_exactly_one_pk():
    with pytest.raises(EmdriveValidationError, match="exactly one PRIMARY KEY"):
        ast.CreateTable("t", (_col("a"), _col("b"))).validate()
    with pytest.raises(EmdriveValidationError, match="exactly one PRIMARY KEY"):
        ast.CreateTable("t", (_col("a", True), _col("b", True))).validate()


def test_validate_unique_columns():
    with pytest.raises(EmdriveValidationError, match="unique"):
        ast.CreateTable("t", (_col("a", True), _col("a"))).validate()


def test_validate_at_least_one_column():
    with pytest.raises(EmdriveValidationError, match="at least one column"):
        ast.CreateTable("t", ()).validate()


def test_parse_select_order_by_limit():
    stmt = parse_statement(
        "SELECT url, hash @ 3 AS distance FROM photos ORDER BY distance, url DESC LIMIT 5"
    )
    assert isinstance(stmt, ast.Select)
    assert stmt.order_by[0] == ast.OrderItem(expr=ast.Ident("distance"), asc=True)
    assert stmt.order_by[1] == ast.OrderItem(expr=ast.Ident("url"), asc=False)
    assert stmt.limit == 5


def test_parse_limit_rejects_non_integer():
    with pytest.raises(EmdriveSyntaxError, match="integer LIMIT"):
        parse_statement("SELECT * FROM t LIMIT 2.5")
    with pytest.raises(EmdriveSyntaxError):
        parse_statement("SELECT * FROM t LIMIT x")

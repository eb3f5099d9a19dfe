"""Recursive-descent parser for the emdrive dialect.

Covers the reference's three statements (parser.rs:66-71) plus the
declared-but-unimplemented surface: ``METRIC KEY USING mtree(metric)``
(README.md:26,45 — the METRIC keyword is tokenized in the reference,
tokenizer.rs:70, but never consumed), ``STRING(n)`` lengths
(create_table.rs:39 TODO), ``AS`` aliases (tokenized, never consumed),
the ``@`` distance operator and ``<``-family comparisons (README.md:67-78).

Error-message shape follows the reference's expect combinators:
"Expected X, instead found Y at line N." (src/sql/expects/generic.rs).
"""

from __future__ import annotations

from emdrive_spark.sql import ast
from emdrive_spark.sql.errors import EmdriveSyntaxError
from emdrive_spark.sql.tokenizer import Token, parse_number, tokenize
from emdrive_spark.types import EmdriveType, EmdriveTypeError, parse_type


class _Cursor:
    def __init__(self, tokens: list[Token]):
        self.toks = tokens
        self.i = 0

    def peek(self) -> Token | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self) -> Token:
        tok = self.peek()
        if tok is None:
            raise EmdriveSyntaxError("Expected more tokens, instead found end of statement.")
        self.i += 1
        return tok

    def expect_kw(self, *kws: str) -> Token:
        tok = self.next()
        if tok.kind != "keyword" or tok.value not in kws:
            raise EmdriveSyntaxError(
                f"Expected {' or '.join(kws)}, instead found {tok.value!r} at line {tok.line}."
            )
        return tok

    def expect_op(self, op: str) -> Token:
        tok = self.next()
        if tok.kind != "op" or tok.value != op:
            raise EmdriveSyntaxError(
                f"Expected {op!r}, instead found {tok.value!r} at line {tok.line}."
            )
        return tok

    def expect_ident(self, what: str = "identifier") -> Token:
        tok = self.next()
        if tok.kind != "identifier":
            raise EmdriveSyntaxError(
                f"Expected {what}, instead found {tok.value!r} at line {tok.line}."
            )
        return tok

    def try_kw(self, kw: str) -> bool:
        tok = self.peek()
        if tok is not None and tok.is_kw(kw):
            self.i += 1
            return True
        return False

    def try_op(self, op: str) -> bool:
        tok = self.peek()
        if tok is not None and tok.kind == "op" and tok.value == op:
            self.i += 1
            return True
        return False


def parse_statement(sql: str) -> ast.Statement:
    cur = _Cursor(tokenize(sql))
    tok = cur.peek()
    if tok is None:
        raise EmdriveSyntaxError("Empty statement.")
    if tok.is_kw("CREATE"):
        stmt = _parse_create(cur)
    elif tok.is_kw("INSERT"):
        stmt = _parse_insert(cur)
    elif tok.is_kw("SELECT"):
        stmt = _parse_select(cur)
    else:
        raise EmdriveSyntaxError(
            f"Expected CREATE, INSERT or SELECT, instead found {tok.value!r} "
            f"at line {tok.line}."
        )
    rest = cur.peek()
    if rest is not None:
        raise EmdriveSyntaxError(
            f"Unexpected trailing token {rest.value!r} at line {rest.line}."
        )
    return stmt


# --- CREATE TABLE -----------------------------------------------------------


def _parse_create(cur: _Cursor) -> ast.CreateTable:
    cur.expect_kw("CREATE")
    cur.expect_kw("TABLE")
    if_not_exists = False
    if cur.try_kw("IF"):
        cur.expect_kw("NOT")
        cur.expect_kw("EXISTS")
        if_not_exists = True
    name = cur.expect_ident("table name").value
    cur.expect_op("(")
    columns: list[ast.ColumnDef] = []
    while True:
        columns.append(_parse_column_def(cur))
        if cur.try_op(","):
            continue
        cur.expect_op(")")
        break
    return ast.CreateTable(name=name, columns=tuple(columns), if_not_exists=if_not_exists)


def _parse_column_def(cur: _Cursor) -> ast.ColumnDef:
    name = cur.expect_ident("column name").value
    etype = _parse_ddl_type(cur)
    primary_key = False
    metric = None
    index_kind = None
    default = None
    while True:
        tok = cur.peek()
        if tok is None or (tok.kind == "op" and tok.value in {",", ")"}):
            break
        if tok.is_kw("PRIMARY"):
            cur.next()
            cur.expect_kw("KEY")
            primary_key = True
        elif tok.is_kw("METRIC"):
            cur.next()
            cur.expect_kw("KEY")
            cur.expect_kw("USING")
            index_kind = cur.expect_ident("index kind (mtree/emtree)").value.lower()
            if index_kind not in {"mtree", "emtree"}:
                raise EmdriveSyntaxError(
                    f"Expected index kind mtree or emtree, instead found "
                    f"{index_kind!r} at line {tok.line}."
                )
            cur.expect_op("(")
            metric = cur.expect_ident("metric name").value.lower()
            cur.expect_op(")")
        elif tok.is_kw("DEFAULT"):
            cur.next()
            default = _parse_atom(cur)
        else:
            raise EmdriveSyntaxError(
                f"Expected PRIMARY KEY, METRIC KEY or DEFAULT, instead found "
                f"{tok.value!r} at line {tok.line}."
            )
    return ast.ColumnDef(
        name=name,
        etype=etype,
        primary_key=primary_key,
        metric=metric,
        index_kind=index_kind,
        default=default,
    )


def _parse_ddl_type(cur: _Cursor) -> EmdriveType:
    tok = cur.expect_ident("type name")
    text = tok.value
    # NULLABLE( T ) / STRING( n ) arrive as identifier + parenthesized tail
    if cur.try_op("("):
        depth = 1
        parts = ["("]
        while depth:
            t = cur.next()
            if t.kind == "op" and t.value == "(":
                depth += 1
            elif t.kind == "op" and t.value == ")":
                depth -= 1
            parts.append(t.value)
        text += "".join(parts)
    try:
        return parse_type(text)
    except EmdriveTypeError as exc:
        raise EmdriveSyntaxError(f"{exc} (line {tok.line})") from None


# --- INSERT -----------------------------------------------------------------


def _parse_insert(cur: _Cursor) -> ast.Insert:
    cur.expect_kw("INSERT")
    cur.expect_kw("INTO")
    table = cur.expect_ident("table name").value
    cur.expect_op("(")
    columns: list[str] = []
    while True:
        columns.append(cur.expect_ident("column name").value)
        if cur.try_op(","):
            continue
        cur.expect_op(")")
        break
    cur.expect_kw("VALUES")
    rows: list[tuple] = []
    while True:
        cur.expect_op("(")
        vals: list[ast.Expr] = []
        while True:
            vals.append(_parse_atom(cur))
            if cur.try_op(","):
                continue
            cur.expect_op(")")
            break
        rows.append(tuple(vals))
        if not cur.try_op(","):
            break
    return ast.Insert(table=table, columns=tuple(columns), rows=tuple(rows))


# --- SELECT -----------------------------------------------------------------


def _parse_select(cur: _Cursor) -> ast.Select:
    cur.expect_kw("SELECT")
    items: list[ast.SelectItem] = []
    if cur.try_op("*"):
        pass  # empty items = all columns (SelectColumn::All, statements.rs:30-36)
    else:
        while True:
            expr = _parse_expr(cur)
            alias = None
            if cur.try_kw("AS"):
                alias = cur.expect_ident("alias").value
            items.append(ast.SelectItem(expr=expr, alias=alias))
            if not cur.try_op(","):
                break
    cur.expect_kw("FROM")
    table = cur.expect_ident("table name").value
    where = None
    if cur.try_kw("WHERE"):
        where = _parse_expr(cur)
    # ORDER BY / LIMIT: beyond the reference grammar (tokenizer has no
    # ORDER/LIMIT keywords, /root/reference/src/sql/tokenizer.rs:55-75)
    # but required to express its README's top-k-by-distance queries
    # (/root/reference/README.md:58-78) through the SQL surface; SELECT
    # aliases are in scope, like WHERE (README.md:71).
    order_by: list[ast.OrderItem] = []
    if cur.try_kw("ORDER"):
        cur.expect_kw("BY")
        while True:
            oexpr = _parse_expr(cur)
            asc = True
            if cur.try_kw("DESC"):
                asc = False
            else:
                cur.try_kw("ASC")
            order_by.append(ast.OrderItem(expr=oexpr, asc=asc))
            if not cur.try_op(","):
                break
    limit = None
    if cur.try_kw("LIMIT"):
        tok = cur.next()
        n = parse_number(tok) if tok.kind == "number" else None
        if not isinstance(n, int):
            raise EmdriveSyntaxError(
                f"Expected an integer LIMIT, instead found {tok.value}."
            )
        limit = n
    return ast.Select(
        table=table,
        items=tuple(items),
        where=where,
        order_by=tuple(order_by),
        limit=limit,
    )


# --- expressions ------------------------------------------------------------
# precedence: atoms < @ < comparisons < AND < OR

_COMPARISONS = {"=", "<", ">", "<=", ">=", "!=", "<>"}


def _parse_expr(cur: _Cursor) -> ast.Expr:
    return _parse_or(cur)


def _parse_or(cur: _Cursor) -> ast.Expr:
    left = _parse_and(cur)
    while cur.try_kw("OR"):
        left = ast.BinOp(op="OR", left=left, right=_parse_and(cur))
    return left


def _parse_and(cur: _Cursor) -> ast.Expr:
    left = _parse_cmp(cur)
    while cur.try_kw("AND"):
        left = ast.BinOp(op="AND", left=left, right=_parse_cmp(cur))
    return left


def _parse_cmp(cur: _Cursor) -> ast.Expr:
    left = _parse_distance(cur)
    tok = cur.peek()
    if tok is not None and tok.kind == "op" and tok.value in _COMPARISONS:
        cur.next()
        op = "!=" if tok.value == "<>" else tok.value
        return ast.BinOp(op=op, left=left, right=_parse_distance(cur))
    return left


def _parse_distance(cur: _Cursor) -> ast.Expr:
    left = _parse_atom(cur)
    while cur.try_op("@"):
        left = ast.BinOp(op="@", left=left, right=_parse_atom(cur))
    return left


def _parse_atom(cur: _Cursor) -> ast.Expr:
    tok = cur.next()
    if tok.kind == "number":
        return ast.Const(parse_number(tok))
    if tok.kind == "string":
        return ast.Const(tok.value)
    if tok.kind == "keyword" and tok.value in {"TRUE", "FALSE"}:
        return ast.Const(tok.value == "TRUE")
    if tok.kind == "keyword" and tok.value == "NULL":
        return ast.Const(None)
    if tok.kind == "identifier":
        if cur.try_op("("):
            cur.expect_op(")")  # ULID() / NOW() take no args (functions.rs:16-21)
            return ast.FuncCall(name=tok.value.upper())
        return ast.Ident(tok.value)
    if tok.kind == "op" and tok.value == "(":
        inner = _parse_expr(cur)
        cur.expect_op(")")
        return inner
    raise EmdriveSyntaxError(
        f"Expected a value, column or function call, instead found "
        f"{tok.value!r} at line {tok.line}."
    )

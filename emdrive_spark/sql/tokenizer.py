"""Tokenizer for the emdrive SQL dialect.

Pins the same lexical contracts the reference's tokenizer tests pin
(/root/reference/src/sql/tokenizer.rs:197-265 and its tests :267-540):
keywords are case-INsensitive, identifiers case-sensitive, strings are
single-quoted with backslash escapes, delimiters ``, ( ) =`` split
eagerly, ``;`` terminates the statement. We add ``@ < > <= >=`` as
operator tokens (the ``@`` distance operator is declared at
README.md:67-71; comparison beyond ``=`` is needed for the declared
``WHERE distance < 4`` query shape).
"""

from __future__ import annotations

from dataclasses import dataclass

from emdrive_spark.sql.errors import EmdriveSyntaxError

KEYWORDS = {
    "CREATE", "TABLE", "IF", "NOT", "EXISTS", "INSERT", "INTO", "VALUES",
    "SELECT", "FROM", "WHERE", "AS", "PRIMARY", "METRIC", "KEY", "USING",
    "DEFAULT", "AND", "OR", "TRUE", "FALSE", "NULL",
    "ORDER", "BY", "LIMIT", "ASC", "DESC",
}

_SINGLE_CHAR = {",", "(", ")", "=", ";", "@", "*", "<", ">"}
_TWO_CHAR = {"<=", ">=", "!=", "<>"}


@dataclass(frozen=True)
class Token:
    kind: str  # keyword | identifier | string | number | op
    value: str
    line: int

    def is_kw(self, kw: str) -> bool:
        return self.kind == "keyword" and self.value == kw


def tokenize(sql: str) -> list[Token]:
    """Token stream for one statement; ``;`` ends tokenization
    (tokenizer.rs:226-228 — one statement per request)."""
    tokens: list[Token] = []
    i, line = 0, 1
    n = len(sql)
    while i < n:
        ch = sql[i]
        if ch == "\n":
            line += 1
            i += 1
            continue
        if ch.isspace():
            i += 1
            continue
        if ch == ";":
            break
        if ch == "'":
            # single-quoted string with backslash escapes (tokenizer.rs:206-223)
            j = i + 1
            buf = []
            while j < n:
                c = sql[j]
                if c == "\\" and j + 1 < n:
                    buf.append(sql[j + 1])
                    j += 2
                    continue
                if c == "'":
                    break
                if c == "\n":
                    line += 1
                buf.append(c)
                j += 1
            else:
                raise EmdriveSyntaxError(f"Unterminated string starting at line {line}.")
            if j >= n:
                raise EmdriveSyntaxError(f"Unterminated string starting at line {line}.")
            tokens.append(Token("string", "".join(buf), line))
            i = j + 1
            continue
        if sql[i : i + 2] in _TWO_CHAR:
            tokens.append(Token("op", sql[i : i + 2], line))
            i += 2
            continue
        if ch in _SINGLE_CHAR:
            tokens.append(Token("op", ch, line))
            i += 1
            continue
        if ch == "-":
            # Unary minus: the dialect has no arithmetic binary ops, so
            # '-' only ever signs a numeric literal ('WHERE x > -1',
            # DEFAULT -1). Unsigned-column range checks happen at
            # coercion, with a clear validation error.
            j = i + 1
            while j < n and (sql[j].isalnum() or sql[j] in "_."):
                j += 1
            word = sql[i + 1 : j]
            if not word or not word[0].isdigit():
                raise EmdriveSyntaxError(
                    f"Expected a numeric literal after '-' at line {line}."
                )
            tokens.append(Token("number", "-" + word, line))
            i = j
            continue
        # word: identifier / keyword / number (incl. 0b/0x literals)
        j = i
        while j < n and (sql[j].isalnum() or sql[j] in "_."):
            j += 1
        if j == i:
            raise EmdriveSyntaxError(f"Unexpected character {ch!r} at line {line}.")
        word = sql[i:j]
        upper = word.upper()
        if upper in KEYWORDS:
            tokens.append(Token("keyword", upper, line))
        elif word[0].isdigit():
            tokens.append(Token("number", word, line))
        else:
            tokens.append(Token("identifier", word, line))
        i = j
    return tokens


def parse_number(tok: Token) -> int | float:
    """Numeric literal: decimal, 0b binary, 0x hex, or float, with an
    optional leading '-'. Binary literals are the README's idiom for
    hashes (README.md:58)."""
    w = tok.value
    sign = -1 if w.startswith("-") else 1
    mag = w[1:] if w.startswith("-") else w
    try:
        lw = mag.lower()
        if lw.startswith("0b"):
            return sign * int(mag[2:], 2)
        if lw.startswith("0x"):
            return sign * int(mag[2:], 16)
        if "." in mag:
            return sign * float(mag)
        return sign * int(mag)
    except ValueError:
        raise EmdriveSyntaxError(
            f"Invalid numeric literal {w!r} at line {tok.line}."
        ) from None


def split_statements(sql: str) -> list[str]:
    """Split a script into statements on TOP-LEVEL ';' only.

    A ';' is content, not a terminator, inside: single- or double-quoted
    string literals (Spark treats both as strings; both backslash
    escapes and ''/"" doubling are honored — matching the engine the
    pieces are handed to), backquoted identifiers, `--` line comments,
    and `/* */` block comments (advisor r2). Raw-text scan so each
    piece can be re-tokenized (or handed to Spark's ANSI parser)
    verbatim — comments stay attached to their statement."""
    parts: list[str] = []
    buf: list[str] = []
    i, n = 0, len(sql)

    def take(k: int) -> None:
        nonlocal i
        buf.append(sql[i : i + k])
        i += k

    while i < n:
        ch = sql[i]
        two = sql[i : i + 2]
        if ch in ("'", '"'):
            q = ch
            take(1)
            while i < n:
                if sql[i] == "\\" and i + 1 < n:
                    take(2)
                elif sql[i] == q:
                    if sql[i : i + 2] == q + q:  # '' / "" doubling
                        take(2)
                    else:
                        take(1)
                        break
                else:
                    take(1)
            continue
        if ch == "`":
            take(1)
            while i < n:
                if sql[i : i + 2] == "``":
                    take(2)
                elif sql[i] == "`":
                    take(1)
                    break
                else:
                    take(1)
            continue
        if two == "--":
            while i < n and sql[i] != "\n":
                take(1)
            continue
        if two == "/*":
            take(2)
            while i < n and sql[i : i + 2] != "*/":
                take(1)
            take(2)
            continue
        if ch == ";":
            parts.append("".join(buf))
            buf = []
            i += 1
            continue
        take(1)
    parts.append("".join(buf))
    return [p for p in parts if p.strip()]

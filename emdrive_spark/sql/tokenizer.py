"""Tokenizer for the emdrive SQL dialect.

Pins the same lexical contracts the reference's tokenizer tests pin
(/root/reference/src/sql/tokenizer.rs:197-265 and its tests :267-540):
keywords are case-INsensitive, identifiers case-sensitive, strings are
single-quoted with backslash escapes, delimiters ``, ( ) =`` split
eagerly, ``;`` terminates the statement. We add ``@ < > <= >=`` as
operator tokens (the ``@`` distance operator is declared at
README.md:67-71; comparison beyond ``=`` is needed for the declared
``WHERE distance < 4`` query shape).

No SQL comment syntax, BY DESIGN (reference parity): the reference
tokenizer has no ``--``/``/* */`` handling either (tokenizer.rs —
only strings and backslash escapes are lexically opaque), so a
dialect statement containing ``--`` fails with the unary-minus
error exactly as it would there. ANSI-passthrough statements get
full comment support from Spark's own parser.
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


def scan_spans(sql: str):
    """Yield (start, end) spans of every region the SQL grammar treats
    as opaque text: single/double-quoted string literals (backslash
    escapes AND ''/"" doubling — matching Spark, the engine the pieces
    are handed to), backquoted identifiers, `--` line comments (the
    newline stays outside the span), and `/* */` block comments.

    THE single definition of SQL lexical opacity in this codebase:
    split_statements, mask_spans (the read-only guard), and
    split_around_spans (the `@` rewrite) all consume it, so the three
    can never disagree about where a string ends (advisor r2 + r3
    review: two independent scanners drift)."""
    i, n = 0, len(sql)
    while i < n:
        ch = sql[i]
        two = sql[i : i + 2]
        if ch in ("'", '"'):
            q = ch
            j = i + 1
            while j < n:
                if sql[j] == "\\" and j + 1 < n:
                    j += 2
                elif sql[j] == q:
                    if sql[j : j + 2] == q + q:  # '' / "" doubling
                        j += 2
                    else:
                        j += 1
                        break
                else:
                    j += 1
            yield (i, j)
            i = j
        elif ch == "`":
            j = i + 1
            while j < n:
                if sql[j : j + 2] == "``":
                    j += 2
                elif sql[j] == "`":
                    j += 1
                    break
                else:
                    j += 1
            yield (i, j)
            i = j
        elif two == "--":
            j = i
            while j < n and sql[j] != "\n":
                j += 1
            yield (i, j)
            i = j
        elif two == "/*":
            j = i + 2
            while j < n and sql[j : j + 2] != "*/":
                j += 1
            j = min(j + 2, n)
            yield (i, j)
            i = j
        else:
            i += 1


def mask_spans(sql: str) -> str:
    """Blank every opaque span (scan_spans) with spaces — keyword scans
    over the result can never match inside strings/comments."""
    out = list(sql)
    for s, e in scan_spans(sql):
        out[s:e] = " " * (e - s)
    return "".join(out)


def split_around_spans(sql: str) -> list[str]:
    """Alternating [outside, span, outside, span, ...] pieces (even
    indexes are outside every literal/comment); ``"".join`` restores
    the input verbatim."""
    parts: list[str] = []
    last = 0
    for s, e in scan_spans(sql):
        parts.append(sql[last:s])
        parts.append(sql[s:e])
        last = e
    parts.append(sql[last:])
    return parts


def split_statements(sql: str) -> list[str]:
    """Split a script into statements on TOP-LEVEL ';' only — a ';'
    inside any scan_spans region (string literal, backquoted
    identifier, comment) is content, not a terminator. Raw-text scan so
    each piece can be re-tokenized (or handed to Spark's ANSI parser)
    verbatim — comments stay attached to their statement."""
    parts: list[str] = []
    buf: list[str] = []
    i, n = 0, len(sql)
    spans = iter(scan_spans(sql))
    cur = next(spans, None)
    while i < n:
        if cur and i == cur[0]:
            buf.append(sql[cur[0] : cur[1]])
            i = cur[1]
            cur = next(spans, None)
            continue
        ch = sql[i]
        if ch == ";":
            parts.append("".join(buf))
            buf = []
        else:
            buf.append(ch)
        i += 1
    parts.append("".join(buf))
    return [p for p in parts if p.strip()]

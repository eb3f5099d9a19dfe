"""Value generators: ULID() and NOW() — the reference's entire scalar
function surface (/root/reference/src/constructs/functions.rs:10-21).

ULID = 48-bit ms timestamp + 80 random bits, Crockford base32
(README.md:115-117 recommends it as the PK generator). Two paths:
- ``ulid()``: driver-side generation for INSERT ... VALUES row batches
  (small by construction).
- ``ulid_expr()``: a distributed Column expression for bulk backfills —
  pure built-in functions (unix_millis + rand), no Python in the loop.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import Column
from pyspark.sql import functions as F

_CROCKFORD = "0123456789ABCDEFGHJKMNPQRSTVWXYZ"


def _b32(value: int, width: int) -> str:
    out = []
    for _ in range(width):
        out.append(_CROCKFORD[value & 31])
        value >>= 5
    return "".join(reversed(out))


def ulid(ms: int | None = None, entropy: bytes | None = None) -> str:
    """One ULID string (26 chars). ``ms``/``entropy`` injectable for
    deterministic tests."""
    if ms is None:
        ms = time.time_ns() // 1_000_000
    if entropy is None:
        entropy = os.urandom(10)
    rand80 = int.from_bytes(entropy, "big")
    return _b32(ms, 10) + _b32(rand80, 16)


def now_expr() -> Column:
    """NOW() → current UTC timestamp (functions.rs:19)."""
    return F.current_timestamp()


def ulid_expr() -> Column:
    """Distributed ULID generation as a Column: 10 base32 chars of
    unix-millis + 16 chars from two 40-bit rand() draws. Monotonic
    time prefix preserved; entropy quality is rand()'s (fine for IDs,
    not for crypto)."""
    millis = F.unix_millis(F.current_timestamp())
    alphabet = F.lit(_CROCKFORD)

    def b32(col: Column, width: int) -> Column:
        parts = [
            alphabet.substr(
                (F.shiftrightunsigned(col, 5 * i).bitwiseAND(F.lit(31)) + 1).cast("int"),
                F.lit(1),
            )
            for i in range(width - 1, -1, -1)
        ]
        return F.concat(*parts)

    r1 = (F.rand() * F.lit(float(1 << 40))).cast("long")
    r2 = (F.rand() * F.lit(float(1 << 40))).cast("long")
    return F.concat(b32(millis, 10), b32(r1, 8), b32(r2, 8))

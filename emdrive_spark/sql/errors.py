"""Error taxonomy mirroring the reference
(/root/reference/src/sql/errors.rs:4-34, src/server/mod.rs:16-30):
``syntax`` (tokenizer/parser), ``validation`` (semantic), ``server``.
Each serializes to the same JSON shape the reference's HTTP layer
returns: ``{"type": ..., "message": ...}``.
"""

from __future__ import annotations


class EmdriveError(Exception):
    kind = "server"

    def to_json(self) -> dict:
        return {"type": self.kind, "message": str(self)}


class EmdriveSyntaxError(EmdriveError):
    kind = "syntax"


class EmdriveValidationError(EmdriveError):
    kind = "validation"

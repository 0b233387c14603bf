"""SML error types with source spans.

Mirrors the reference's span-carrying validation errors
(ref: osprey_worker/src/osprey/engine/ast/errors.py) in spirit:
every error carries (source_path, line, col) so rule authors get
actionable messages.
"""

from __future__ import annotations


class SmlError(Exception):
    def __init__(self, message: str, source: str = "<sml>", line: int = 0, col: int = 0):
        self.message = message
        self.source = source
        self.line = line
        self.col = col
        super().__init__(f"{source}:{line}:{col}: {message}")


class SmlSyntaxError(SmlError):
    """Construct not in the SML subset (or Python-level syntax error)."""


class SmlValidationError(SmlError):
    """Semantically invalid program (undefined name, bad kwargs, type error)."""

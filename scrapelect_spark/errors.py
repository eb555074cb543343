"""Error chain matching the reference's note-wrapped error model.

Reference: /root/reference/filter-types/src/error.rs:11-35 — errors
propagate outward gaining "note: occurred while evaluating …" context
frames; first error aborts the query (fail-fast), or is captured per-row
in the Spark engine's permissive mode.
"""

from __future__ import annotations


class ScrapelectError(Exception):
    """Base error for scanner/parser/interpreter failures."""

    def __init__(self, message: str, notes: list[str] | None = None):
        super().__init__(message)
        self.message = message
        self.notes = notes or []

    def wrap(self, note: str) -> "ScrapelectError":
        self.notes.append(note)
        return self

    def __str__(self) -> str:
        parts = [self.message]
        parts.extend(self.notes)
        return "\n".join(parts)


class ParseError(ScrapelectError):
    """Raised by the scanner/parser on malformed programs."""


class EvalError(ScrapelectError):
    """Raised by the interpreter on runtime failures (strict semantics:
    unknown binding, zero matches for a One-qualified block, unparseable
    int/float, out-of-bounds nth, unknown filter, bad filter args)."""

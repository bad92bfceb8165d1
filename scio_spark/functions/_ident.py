"""Shared identifier guard for operators that splice user-supplied names
into generated SQL (``stack()`` selectExpr, column aliases)."""

from __future__ import annotations

import re

_IDENT = re.compile(r"[A-Za-z0-9_]+")


def validate_sql_identifier(name: str, what: str) -> str:
    """Reject any name that could break out of (or inject into) generated
    SQL: the callers build selectExpr strings where ``name`` appears both
    as a literal and as a column reference, so only identifier characters
    are allowed. Returns the name for inline use."""
    if not _IDENT.fullmatch(name):
        raise ValueError(f"{what}: name {name!r} must match [A-Za-z0-9_]+")
    return name

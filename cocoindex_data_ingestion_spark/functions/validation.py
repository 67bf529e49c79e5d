"""Identifier naming rules for flows / fields / targets.

Behavioral port of the reference SDK's naming validation
(python/cocoindex/validation.py; exercised by its
tests/test_validation.py): identifiers are non-empty, at most 64
chars, start with a letter or underscore, use only
letters/digits/underscores (full flow names may also contain dots
for the ``namespace.flow`` form), and may not start with ``__``
(reserved). Raised as :class:`NamingError` at flow-construction
time — the same fail-fast point as the reference's builder.
"""

from __future__ import annotations

import re

_IDENT_RE = re.compile(r"[A-Za-z_][A-Za-z0-9_]*\Z")
_IDENT_DOTS_RE = re.compile(r"[A-Za-z_][A-Za-z0-9_.]*\Z")

MAX_IDENTIFIER_LENGTH = 64


class NamingError(ValueError):
    """An identifier violates the naming rules."""


def check_identifier(
    name: str,
    kind: str = "identifier",
    allow_dots: bool = False,
    max_length: int = MAX_IDENTIFIER_LENGTH,
) -> str:
    """Validate ``name``; returns it for chaining, raises NamingError
    otherwise."""
    if not name:
        raise NamingError(f"{kind} name cannot be empty")
    if len(name) > max_length:
        raise NamingError(
            f"{kind} name {name!r} exceeds {max_length} characters"
        )
    if name.startswith("__"):
        raise NamingError(
            f"{kind} name {name!r} cannot start with '__' (reserved)"
        )
    pattern = _IDENT_DOTS_RE if allow_dots else _IDENT_RE
    if not pattern.match(name):
        allowed = "letters, digits, underscores" + (
            ", and dots" if allow_dots else ""
        )
        raise NamingError(
            f"{kind} name {name!r} must start with a letter or underscore"
            f" and contain only {allowed}"
        )
    return name


def check_flow_name(name: str) -> str:
    return check_identifier(name, "flow", allow_dots=False)


def check_full_flow_name(name: str) -> str:
    """``namespace.flow`` form used by the service layer."""
    return check_identifier(name, "full flow", allow_dots=True)


def check_field_name(name: str) -> str:
    return check_identifier(name, "field", allow_dots=False)


def check_target_name(name: str) -> str:
    return check_identifier(name, "target", allow_dots=False)

"""User filter extension surface.

The reference's extension story is trait impls registered by editing a
macro invocation (filter-proc-macro lib.rs:110-189, builtin.rs:447-456;
dynamic loading unimplemented — doc/src/extending-scrapelect.md:3-6).
Here a user filter is a plain Python function registered into a
registry dict; the registry rides into the extraction UDF closure, so
user filters run executor-side with no extra plumbing (SURVEY.md §2.6).

Example::

    reg = extended_registry()
    @register_filter(reg, "shout", value_type="string")
    def shout(value):
        return value.upper()

    extract(pages, 's: "hi" | shout();', registry=reg)
"""

from __future__ import annotations

from typing import Callable, Optional

from .filters import FILTERS, REFERENCE_FILTERS, FilterSpec, Param


def extended_registry(base: dict[str, FilterSpec] = FILTERS) -> dict[str, FilterSpec]:
    """A mutable copy of a built-in registry to register user filters into."""
    return dict(base)


def register_filter(
    registry: dict[str, FilterSpec],
    name: str,
    value_type: str = "any",
    params: Optional[list[tuple[str, str, bool]]] = None,
    needs_ctx: bool = False,
) -> Callable[[Callable], Callable]:
    """Decorator: register ``fn(value, **named_args)`` as filter ``name``.

    ``params`` is a list of (arg_name, type, optional) where type is one
    of string/bool/int/number/list/structure/element/any — the same
    strict TryFromValue conversions as the built-ins (unexpected args
    rejected, missing required args error)."""

    def deco(fn: Callable) -> Callable:
        spec = FilterSpec(
            name=name,
            value_type=value_type,
            params=tuple(Param(n, t, o) for n, t, o in (params or [])),
            fn=fn,
            needs_ctx=needs_ctx,
        )
        registry[name] = spec
        return fn

    return deco


__all__ = [
    "FILTERS",
    "REFERENCE_FILTERS",
    "extended_registry",
    "register_filter",
]

"""The scrp value model: dynamically typed, JSON-isomorphic values.

Reference semantics (/root/reference/filter-types/src/value.rs:52-70):
Null | Float(f64) | Int(i64) | Bool | String | List | Structure(key-sorted)
plus an execution-only Element extension that never escapes a block
(value.rs:174-191, context.rs:142-149).

Python mapping: ``None | float | int | bool | str | list | dict`` with an
``ElementValue`` wrapper for DOM nodes.  Two reference properties that do
NOT hold natively in Python are enforced here:

- ``Bool`` is distinct from ``Int`` (``1 == True`` in Python, but
  ``Value::Int(1) != Value::Bool(true)`` — value.rs derive(PartialEq));
  use :func:`deep_eq` for reference equality semantics.
- ``Structure`` serializes with keys in alphabetical order (BTreeMap,
  value.rs:9); use :func:`to_json` / :func:`to_json_pretty`.
"""

from __future__ import annotations

import json
from typing import Any


class ElementValue:
    """Execution-only wrapper around a DOM element handle.

    Mirrors ``EValue``'s ``Extra(Element)`` variant
    (/root/reference/filter-types/src/value.rs:226-235).  Never
    serialized: bindings holding one are dropped at block close
    (context.rs:142-149).
    """

    __slots__ = ("node",)

    def __init__(self, node: Any):
        self.node = node

    def __repr__(self) -> str:  # pragma: no cover - debug only
        return f"ElementValue({self.node!r})"


def is_element(v: Any) -> bool:
    return isinstance(v, ElementValue)


def deep_eq(a: Any, b: Any) -> bool:
    """Structural equality with Bool ≠ Int (value.rs derive(PartialEq)).

    Lists compare element-wise; structures compare as sorted key-value
    maps.  Elements compare by node identity (reference compares
    ElementRef by pointer equality).
    """
    if isinstance(a, bool) or isinstance(b, bool):
        return isinstance(a, bool) and isinstance(b, bool) and a is b
    if isinstance(a, (int, float)) and isinstance(b, (int, float)):
        # Int and Float are distinct variants: Int(1) != Float(1.0)
        if isinstance(a, int) != isinstance(b, int):
            return False
        return a == b
    if isinstance(a, list) and isinstance(b, list):
        return len(a) == len(b) and all(deep_eq(x, y) for x, y in zip(a, b))
    if isinstance(a, dict) and isinstance(b, dict):
        if set(a.keys()) != set(b.keys()):
            return False
        return all(deep_eq(a[k], b[k]) for k in a)
    if is_element(a) or is_element(b):
        return is_element(a) and is_element(b) and a.node is b.node
    if type(a) is not type(b):
        return False
    return a == b


def drop_elements(v: Any) -> tuple[Any, bool]:
    """``Value::into_data`` — returns (data, ok); ok=False if the value
    is/contains-at-top-level an element and must be dropped entirely.

    Reference drops element-valued *bindings*; lists/structures keep
    non-element members but a list containing an element drops the whole
    binding (value.rs:174-191 maps into_data over members and fails if
    any member fails).
    """
    # fast path: scalars are the overwhelmingly common case in the
    # per-page hot loop (one call per binding per block close)
    t = v.__class__
    if t is str or t is int or t is float or t is bool or v is None:
        return v, True
    if t is ElementValue or isinstance(v, ElementValue):
        return None, False
    if isinstance(v, list):
        out = []
        for x in v:
            d, ok = drop_elements(x)
            if not ok:
                return None, False
            out.append(d)
        return out, True
    if isinstance(v, dict):
        out = {}
        for k, x in v.items():
            d, ok = drop_elements(x)
            if not ok:
                return None, False
            out[k] = d
        return out, True
    return v, True


def bindings_into_data(bindings: dict[str, Any]) -> dict[str, Any]:
    """``Bindings::into_data`` — silently drop element-valued bindings
    at block close (context.rs:142-149)."""
    out = {}
    for k, v in bindings.items():
        d, ok = drop_elements(v)
        if ok:
            out[k] = d
    return out


def type_name(v: Any) -> str:
    """Variant name for error messages."""
    if v is None:
        return "null"
    if isinstance(v, bool):
        return "bool"
    if isinstance(v, int):
        return "int"
    if isinstance(v, float):
        return "float"
    if isinstance(v, str):
        return "string"
    if isinstance(v, list):
        return "list"
    if isinstance(v, dict):
        return "structure"
    if is_element(v):
        return "element"
    return type(v).__name__


def to_json(v: Any) -> str:
    """Compact deterministic JSON: sorted structure keys (BTreeMap order)."""
    return json.dumps(v, sort_keys=True, ensure_ascii=False, separators=(",", ":"))


def to_json_pretty(v: Any) -> str:
    """Pretty JSON matching serde_json::to_string_pretty + BTreeMap key
    order (main.rs:62): 2-space indent, sorted keys."""
    return json.dumps(v, sort_keys=True, ensure_ascii=False, indent=2)

"""The scrp scalar filter library — all 22 built-in filters.

Behavioral model: /root/reference/src/interpreter/filter/builtin.rs.
Registry parity note (SURVEY.md §2.4): the reference *implements* 22
filters but *registers* only 17 — ``id``, ``truthy``, ``add``, ``sub``,
``mult`` error with "unrecognized filter" there (builtin.rs:458-481).
``FILTERS`` registers all 22; ``REFERENCE_FILTERS`` is the strict-parity
17-entry registry.

Dispatch contract (filter/mod.rs:8-18, filter-proc-macro lib.rs:71-91):
named-only args, unexpected args rejected, optional args via Option<T>;
strict type conversion of both the pipeline value and each arg — a
mismatch is an error, never a null (SURVEY.md §7.3 "strict vs
permissive coercion").
"""

from __future__ import annotations

import json
import re
import sys
from dataclasses import dataclass
from typing import Any, Callable

from ..errors import EvalError
from .value import ElementValue, deep_eq, is_element, type_name

# --- TryFromValue-style converters ---------------------------------


def _want_string(v: Any, what: str) -> str:
    if isinstance(v, str):
        return v
    raise EvalError(f"expected a string for {what}, got {type_name(v)}")


def _want_bool(v: Any, what: str) -> bool:
    if isinstance(v, bool):
        return v
    raise EvalError(f"expected a bool for {what}, got {type_name(v)}")


def _want_int(v: Any, what: str) -> int:
    if isinstance(v, int) and not isinstance(v, bool):
        return v
    raise EvalError(f"expected an int for {what}, got {type_name(v)}")


def _want_number(v: Any, what: str) -> int | float:
    if isinstance(v, (int, float)) and not isinstance(v, bool):
        return v
    raise EvalError(f"expected a number for {what}, got {type_name(v)}")


def _want_list(v: Any, what: str) -> list:
    if isinstance(v, list):
        return v
    raise EvalError(f"expected a list for {what}, got {type_name(v)}")


def _want_structure(v: Any, what: str) -> dict:
    if isinstance(v, dict):
        return v
    raise EvalError(f"expected a structure for {what}, got {type_name(v)}")


def _want_element(v: Any, what: str) -> ElementValue:
    if is_element(v):
        return v
    raise EvalError(f"expected an element for {what}, got {type_name(v)}")


_CONVERTERS: dict[str, Callable[[Any, str], Any]] = {
    "string": _want_string,
    "bool": _want_bool,
    "int": _want_int,
    "number": _want_number,
    "list": _want_list,
    "structure": _want_structure,
    "element": _want_element,
    "any": lambda v, _w: v,
}


@dataclass(frozen=True)
class Param:
    name: str
    type: str  # key into _CONVERTERS
    optional: bool = False


@dataclass(frozen=True)
class FilterSpec:
    """One filter: pipeline-value type, named params, implementation.

    ``fn(value, args: dict, ctx) -> value`` where ``ctx`` is the current
    element scope (only ``tee`` writes to it; builtin.rs:74-82).
    """

    name: str
    value_type: str
    params: tuple[Param, ...]
    fn: Callable[..., Any]
    needs_ctx: bool = False

    def __post_init__(self):
        # hot-loop precompute: converter functions and error-message
        # strings are per-spec constants — building them per call costs
        # more than the conversions themselves (frozen dataclass, so
        # assign via object.__setattr__)
        object.__setattr__(
            self, "_value_conv", _CONVERTERS[self.value_type]
        )
        object.__setattr__(
            self, "_value_what", f"value piped into `{self.name}`"
        )
        object.__setattr__(
            self,
            "_param_info",
            tuple(
                (
                    p.name,
                    _CONVERTERS[p.type],
                    p.optional,
                    f"argument `{p.name}` of `{self.name}`",
                )
                for p in self.params
            ),
        )
        object.__setattr__(
            self, "_allowed", frozenset(p.name for p in self.params)
        )

    def call(self, value: Any, args: dict[str, Any], ctx) -> Any:
        converted: dict[str, Any] = {}
        for name, conv, optional, what in self._param_info:
            if name in args:
                converted[name] = conv(args[name], what)
            elif not optional:
                raise EvalError(f"missing required argument `{name}` in `{self.name}`")
            else:
                converted[name] = None
        if args:
            allowed = self._allowed
            for k in args:
                if k not in allowed:
                    raise EvalError(
                        f"unexpected argument `{k}` to filter `{self.name}`"
                    )
        v = self._value_conv(value, self._value_what)
        if self.needs_ctx:
            return self.fn(v, ctx=ctx, **converted)
        return self.fn(v, **converted)


# --- implementations -----------------------------------------------


def _f_id(value):
    # builtin.rs:33-42 (UNREGISTERED in the reference)
    return value


def _display(v: Any) -> str:
    if is_element(v):
        return f"<{v.node.tag}>"
    return json.dumps(v, sort_keys=True, ensure_ascii=False, default=str)


def _f_dbg(value, msg):
    # builtin.rs:44-59 — code prints `{value}: {msg}` (value FIRST; the
    # doc book claims the reverse — code wins, SURVEY.md §2.4)
    print(f"{_display(value)}: {msg if msg is not None else 'dbg message'}", file=sys.stderr)
    return value


def _f_tee(value, into, ctx):
    # builtin.rs:61-82 — writes a copy into the *innermost* scope
    ctx.set(into, value)
    return value


def _f_strip(value):
    return value.strip()


def _f_attrs(value: ElementValue):
    # builtin.rs:97-116 — attribute map, all values strings
    return dict(value.node.attrs)


def _f_take(value: dict, key):
    # builtin.rs:118-130 — value at key, Null if absent (the reference
    # removes the key from its by-value copy; the structure is discarded
    # after the filter returns, so a lookup is observationally equal)
    return value.get(key, None)


_INT_RE = re.compile(r"^[+-]?[0-9]+$")


def _f_int(value):
    # builtin.rs:132-154 — strict: unparseable string is an ERROR
    if isinstance(value, bool):
        raise EvalError("expected an int, float, or string")
    if isinstance(value, int):
        return value
    if isinstance(value, float):
        return int(value)  # truncation toward zero, like Rust `as i64`
    if isinstance(value, str):
        if not _INT_RE.match(value):
            raise EvalError(f"`{value}` is not an integer.")
        return int(value)
    raise EvalError("expected an int, float, or string")


_FLOAT_RE = re.compile(
    r"^[+-]?((inf(inity)?)|(nan)|([0-9]+\.?[0-9]*([eE][+-]?[0-9]+)?)|(\.[0-9]+([eE][+-]?[0-9]+)?))$",
    re.IGNORECASE,
)


def _f_float(value):
    # builtin.rs:156-177
    if isinstance(value, bool):
        raise EvalError("expected an int, float, or string")
    if isinstance(value, int):
        return float(value)
    if isinstance(value, float):
        return value
    if isinstance(value, str):
        if not _FLOAT_RE.match(value.strip()) or value != value.strip():
            raise EvalError(f"`{value}` is not a float.")
        return float(value)
    raise EvalError("expected an int, float, or string")


def _f_nth(value: list, i):
    # builtin.rs:179-199 — 0-based, error on negative or out-of-bounds
    if i < 0:
        raise EvalError(f"negative indices are not supported in `nth({i})`")
    if i >= len(value):
        raise EvalError(f"No element at index {i}")
    return value[i]


def _f_keys(value: dict):
    # builtin.rs:201-216 — alphabetical (BTreeMap order)
    return sorted(value.keys())


def _f_values(value: dict):
    # builtin.rs:218-233 — values by sorted key
    return [value[k] for k in sorted(value.keys())]


def _f_and(value, with_):
    return value and with_


def _f_or(value, with_):
    return value or with_


def _f_not(value):
    return not value


def _f_split(value: str, on):
    # builtin.rs:276-303 — whitespace-runs mode drops empty tokens
    # (split_whitespace); delimiter mode keeps them (SURVEY.md §7.3)
    if on is None:
        return value.split()
    if on == "":
        # Rust `"abc".split("")` → ["", "a", "b", "c", ""]
        return [""] + list(value) + [""]
    return value.split(on)


def _f_eq(value, to):
    return deep_eq(value, to)


def _f_is_in(value, list_):
    return any(deep_eq(value, x) for x in list_)


def _f_truthy(value):
    # builtin.rs:332-370 (UNREGISTERED in the reference)
    if value is None:
        return False
    if isinstance(value, bool):
        return value
    if isinstance(value, (int, float)):
        return value != 0
    if isinstance(value, (str, list, dict)):
        return len(value) > 0
    if is_element(value):
        return True
    return True


def _f_text(value: ElementValue):
    # builtin.rs:372-391 — DIRECT child text nodes only, not descendants
    return value.node.direct_text()


def _num_binop(op_name, symbol, op):
    def f(value, **kw):
        other = kw[list(kw)[0]]
        both_int = isinstance(value, int) and isinstance(other, int)
        both_float = isinstance(value, float) and isinstance(other, float)
        if not (both_int or both_float):
            raise EvalError(
                f"Type mismatch when {op_name} {value!r} {symbol} {other!r}"
            )
        return op(value, other)

    return f


import operator as _op

_f_add = _num_binop("adding", "+", _op.add)
_f_sub = _num_binop("subtracting", "-", _op.sub)
_f_mult = _num_binop("subtracting", "*", _op.mul)  # sic: builtin.rs:443 says "subtracting"


def _spec(name, value_type, params, fn, needs_ctx=False):
    return FilterSpec(name, value_type, tuple(params), fn, needs_ctx)


_ALL_SPECS: list[FilterSpec] = [
    _spec("id", "any", [], _f_id),
    _spec("dbg", "any", [Param("msg", "string", optional=True)], _f_dbg),
    _spec("tee", "any", [Param("into", "string")], _f_tee, needs_ctx=True),
    _spec("strip", "string", [], _f_strip),
    _spec("attrs", "element", [], _f_attrs),
    _spec("take", "structure", [Param("key", "string")], _f_take),
    _spec("int", "any", [], _f_int),
    _spec("float", "any", [], _f_float),
    _spec("nth", "list", [Param("i", "int")], _f_nth),
    _spec("keys", "structure", [], _f_keys),
    _spec("values", "structure", [], _f_values),
    _spec("and", "bool", [Param("with", "bool")], lambda v, **kw: _f_and(v, kw["with"])),
    _spec("or", "bool", [Param("with", "bool")], lambda v, **kw: _f_or(v, kw["with"])),
    _spec("not", "bool", [], _f_not),
    _spec("split", "string", [Param("on", "string", optional=True)], _f_split),
    _spec("eq", "any", [Param("to", "any")], lambda v, **kw: _f_eq(v, kw["to"])),
    _spec("is_in", "any", [Param("list", "list")], lambda v, **kw: _f_is_in(v, kw["list"])),
    _spec("truthy", "any", [], _f_truthy),
    _spec("text", "element", [], _f_text),
    _spec("add", "number", [Param("to", "number")], _f_add),
    _spec("sub", "number", [Param("by", "number")], _f_sub),
    _spec("mult", "number", [Param("by", "number")], _f_mult),
]

#: full registry — all 22 implemented filters
FILTERS: dict[str, FilterSpec] = {s.name: s for s in _ALL_SPECS}

#: strict reference-parity registry — the 17 actually registered by the
#: reference (builtin.rs:460-478); `id`/`truthy`/`add`/`sub`/`mult`
#: raise "unrecognized filter" there
_REFERENCE_NAMES = (
    "dbg tee strip take attrs int float nth keys values and or not split eq is_in text"
).split()
REFERENCE_FILTERS: dict[str, FilterSpec] = {n: FILTERS[n] for n in _REFERENCE_NAMES}


def dispatch_filter(
    name: str, value: Any, args: dict[str, Any], ctx, registry: dict[str, FilterSpec]
) -> Any:
    spec = registry.get(name)
    if spec is None:
        raise EvalError(f"unrecognized filter `{name}`")
    return spec.call(value, args, ctx)

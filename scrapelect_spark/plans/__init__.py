"""The scrp frontend: scanner, AST, recursive-descent parser, compiler.

Driver-side only — a program is compiled once on the driver and the
compiled form (plain picklable dataclasses) is shipped to executors
inside the extraction UDF closure (SURVEY.md §7.0).
"""

from .ast import (  # noqa: F401
    Arg,
    Element,
    Filter,
    FilterCall,
    FilterSelect,
    Inline,
    Leaf,
    NamedSelector,
    Qualifier,
    RValue,
    Selector,
    SelectorFragment,
    Statement,
)
from .parser import Parser, parse_program  # noqa: F401
from .scanner import Lexeme, Scanner, Token  # noqa: F401

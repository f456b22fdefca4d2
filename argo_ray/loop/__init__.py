"""The reference's `loop` DSL (operator T6): a tiny functional language
whose programs ARE RDF graphs.

- :mod:`compiler` — the ``loopc`` equivalent: ``.loop`` source →
  program triples (``/root/reference/loop/loopc/{lexer.go,parser.y,
  ast.go}``).
- :mod:`interpreter` — ``Evaluate(term, ctx)`` over a program graph
  (``/root/reference/loop/loop.go``), builtins registry
  (``builtins.go``), with the HTTP ``FetchIfNeeded`` replaced by an
  injectable driver-side resolver (no network mid-pipeline, same policy
  as Squirtle ``include`` and the prefix cache).
"""

from .compiler import compile_loop, parse_loop
from .interpreter import LoopError, LoopGraph, Resource, evaluate

__all__ = [
    "compile_loop",
    "parse_loop",
    "LoopGraph",
    "LoopError",
    "Resource",
    "evaluate",
]

"""loop interpreter (operator T6) — ``Evaluate`` over a program graph.

Faithful reimplementation of ``/root/reference/loop/loop.go`` on our
Term model:

- literals evaluate by xsd datatype (boolean / base64Binary /
  hexBinary / float family / integer family / anyURI / QName / plain,
  loop.go:70-123);
- nodes typed ``loop:Variable`` / ``loop:Argument`` read the context
  (loop.go:128-136);
- a node whose TYPE is typed ``loop:Function`` is a call: builtins
  evaluate their declared value/reference args (builtins.go:28-33,
  loop.go:145-163); user functions bind a fresh sub-context from the
  call node's predicate→object pairs (``loop:byReference`` predicates
  bind the raw term, loop.go:166-189) and evaluate the function's
  ``loop:code`` cons list sequentially, returning the last value
  (loop.go:191-201);
- anything else evaluates to itself as a :class:`Resource`
  (loop.go:205).

``FetchIfNeeded`` (loop.go:56-64) did an HTTP GET per unknown subject —
mid-pipeline network is banned here, so :class:`LoopGraph` takes an
optional driver-side ``resolver(uri) -> triples`` hook instead (same
policy as Squirtle ``include`` pre-resolution and the prefix cache).

Deliberate divergence: when a term has NO rdf:type, the reference
passes the nil type into ``graph.Get(nil, rdf:type)`` whose nil subject
acts as a WILDCARD — whether the term then "calls" depends on store
iteration order (loop.go:139-145 with liststore.go:80-104).  Here a
typeless term always evaluates to ``Resource(term)`` (the only
order-independent reading).
"""

from __future__ import annotations

import base64
import binascii
from collections.abc import Callable, Iterable

from ..terms import (
    KIND_BLANK,
    KIND_IRI,
    KIND_LITERAL,
    RDF_NS,
    XSD_NS,
    Term,
)

LOOP_NS = "http://kierdavis.com/data/vocab/loop/"
_A = RDF_NS + "type"
_NIL = RDF_NS + "nil"

_XSD_FLOATS = {XSD_NS + n for n in ("float", "decimal", "double")}
_XSD_INTS = {
    XSD_NS + n
    for n in (
        "integer", "nonPositiveInteger", "negativeInteger", "long", "int",
        "short", "byte", "nonNegativeInteger", "unsignedLong", "unsignedInt",
        "unsignedShort", "unsignedByte", "positiveInteger",
    )
}


class LoopError(ValueError):
    pass


class Resource:
    """A term flowing through evaluation as a value (loop.go:48)."""

    __slots__ = ("term",)

    def __init__(self, term: Term):
        self.term = term

    def __eq__(self, other):
        return isinstance(other, Resource) and other.term == self.term

    def __repr__(self):
        return f"Resource({self.term!r})"


def _term_key(term: Term) -> str:
    """URI for IRIs, ``_:id`` for blank nodes (loop.go:37-43)."""
    if term.kind == KIND_IRI:
        return term.value
    return "_:" + term.value


class LoopGraph:
    """Program graph: indexed triples + prefix map + fetch hook."""

    def __init__(
        self,
        triples: Iterable[tuple[Term, Term, Term]] = (),
        prefixes: dict[str, str] | None = None,
        resolver: Callable[[str], Iterable[tuple[Term, Term, Term]]] | None = None,
    ):
        self._by_subject: dict[str, list[tuple[Term, Term, Term]]] = {}
        self.prefixes = dict(prefixes or {})  # prefix → namespace uri
        self.resolver = resolver
        # seed the builtin declarations: the reference discovers
        # `loop:Add rdf:type loop:Function` by HTTP-fetching the loop
        # vocabulary on first use (FetchIfNeeded on the call's type);
        # builtins are local here, so their declarations are too
        a = Term(KIND_IRI, _A)
        fn = Term(KIND_IRI, LOOP_NS + "Function")
        self.add_all((Term(KIND_IRI, uri), a, fn) for uri in BUILTINS)
        self.add_all(triples)

    def add_all(self, triples: Iterable[tuple[Term, Term, Term]]) -> None:
        for t in triples:
            self._by_subject.setdefault(_term_key(t[0]), []).append(t)

    def has_subject(self, term: Term) -> bool:
        return _term_key(term) in self._by_subject

    def fetch_if_needed(self, term: Term) -> None:
        """Resolver-backed ``FetchIfNeeded`` (loop.go:56-64): unknown
        IRI subjects pull their triples from the injected hook (a
        pre-fetched map on real pipelines); no hook → no-op."""
        if (
            term.kind == KIND_IRI
            and self.resolver is not None
            and not self.has_subject(term)
        ):
            fetched = self.resolver(term.value)
            if fetched:
                self.add_all(fetched)

    def get(self, subject: Term, predicate: Term) -> Term | None:
        puri = predicate.value
        for _, p, o in self._by_subject.get(_term_key(subject), ()):
            if p.kind == KIND_IRI and p.value == puri:
                return o
        return None

    def must_get(self, subject: Term, predicate: Term) -> Term:
        obj = self.get(subject, predicate)
        if obj is None:
            raise LoopError(
                f"missing required property <{predicate.value}> on "
                f"{_term_key(subject)}"
            )
        return obj

    def triples_of(self, subject: Term) -> list[tuple[Term, Term, Term]]:
        return list(self._by_subject.get(_term_key(subject), ()))

    def iter_list(self, head: Term):
        """Walk an rdf:first/rdf:rest cons list (graph.IterList)."""
        first, rest = Term(KIND_IRI, RDF_NS + "first"), Term(KIND_IRI, RDF_NS + "rest")
        seen = set()
        node = head
        while not (node.kind == KIND_IRI and node.value == _NIL):
            key = _term_key(node)
            if key in seen:
                raise LoopError("cyclic loop:code list")
            seen.add(key)
            item = self.get(node, first)
            if item is None:
                raise LoopError(f"malformed cons list at {key}")
            yield item
            node = self.must_get(node, rest)


# --- builtins (builtins.go) -------------------------------------------------


def _builtin_add(args: list, refs: list):
    a, b = args
    if isinstance(a, bool) or isinstance(b, bool) or not isinstance(
        a, (int, float)
    ) or not isinstance(b, (int, float)):
        raise LoopError("loop:Add expects loop:a and loop:b to be numbers")
    return a + b


#: uri → (value-arg property URIs, reference-arg property URIs, fn)
BUILTINS: dict[str, tuple[list[str], list[str], Callable]] = {
    LOOP_NS + "Add": ([LOOP_NS + "a", LOOP_NS + "b"], [], _builtin_add),
}


def _eval_literal(graph: LoopGraph, term: Term):
    dt = term.datatype
    v = term.value
    if dt == XSD_NS + "boolean":
        if v in ("true", "1"):
            return True
        if v in ("false", "0"):
            return False
        raise LoopError(f"Invalid boolean value: {v}")
    if dt == XSD_NS + "base64Binary":
        try:
            return base64.b64decode(v)
        except (ValueError, binascii.Error) as e:
            raise LoopError(f"Invalid base64 value: {v}") from e
    if dt == XSD_NS + "hexBinary":
        try:
            return bytes.fromhex(v)
        except ValueError as e:
            raise LoopError(f"Invalid hex value: {v}") from e
    if dt in _XSD_FLOATS:
        try:
            return float(v)
        except ValueError as e:
            raise LoopError(f"Invalid float value: {v}") from e
    if dt in _XSD_INTS:
        try:
            return int(v)
        except ValueError as e:
            raise LoopError(f"Invalid integer value: {v}") from e
    if dt == XSD_NS + "anyURI":
        return Resource(Term(KIND_IRI, v))
    if dt == XSD_NS + "QName":
        colon = v.find(":")
        if colon < 0:
            raise LoopError(f"No colon found in QName value: {v}")
        base = graph.prefixes.get(v[:colon])
        if base is None:
            raise LoopError(f"Namespace identifier not found for QName: {v}")
        return Resource(Term(KIND_IRI, base + v[colon + 1 :]))
    return v


def evaluate(graph: LoopGraph, term: Term, ctx: dict | None = None):
    """``Interpreter.Evaluate`` (loop.go:66-206)."""
    if ctx is None:
        ctx = {}

    if term.kind == KIND_LITERAL:
        return _eval_literal(graph, term)

    graph.fetch_if_needed(term)
    a = Term(KIND_IRI, _A)
    t = graph.get(term, a)

    if t is not None and t.kind == KIND_IRI and t.value in (
        LOOP_NS + "Variable", LOOP_NS + "Argument",
    ):
        uri = _term_key(term)
        if uri not in ctx:
            raise LoopError(f"Reference to unset variable: {uri}")
        return ctx[uri]

    if t is not None:
        graph.fetch_if_needed(t)
        t_type = graph.get(t, a)
        if (
            t_type is not None
            and t_type.kind == KIND_IRI
            and t_type.value == LOOP_NS + "Function"
        ):
            uri = _term_key(t)
            builtin = BUILTINS.get(uri)
            if builtin is not None:
                val_props, ref_props, fn = builtin
                valargs = [
                    evaluate(graph, graph.must_get(term, Term(KIND_IRI, p)), ctx)
                    for p in val_props
                ]
                refargs = [
                    Resource(graph.must_get(term, Term(KIND_IRI, p)))
                    for p in ref_props
                ]
                return fn(valargs, refargs)

            subctx: dict = {}
            for _, pred, obj in graph.triples_of(term):
                arg_uri = _term_key(pred)
                graph.fetch_if_needed(pred)
                by_ref = False
                flag = graph.get(pred, Term(KIND_IRI, LOOP_NS + "byReference"))
                if flag is not None and flag.kind == KIND_LITERAL:
                    by_ref = flag.value in ("true", "1")
                if by_ref:
                    subctx[arg_uri] = Resource(obj)
                else:
                    subctx[arg_uri] = evaluate(graph, obj, ctx)

            code = graph.get(t, Term(KIND_IRI, LOOP_NS + "code"))
            if code is not None and not (
                code.kind == KIND_IRI and code.value == _NIL
            ):
                value = None
                for expr in graph.iter_list(code):
                    value = evaluate(graph, expr, subctx)
                return value
            return None

    return Resource(term)

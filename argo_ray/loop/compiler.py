"""loopc equivalent: ``.loop`` source → program triples.

Grammar/semantics from ``/root/reference/loop/loopc/parser.y`` (+
``lexer.go`` token rules, ``ast.go`` RDF emission):

- ``name <iri|qname|slashed> as ident`` extends the name map (seeded
  with the same 8 builtins, parser.y:13-22);
- ``func <uri> [(arg [type] ["label"], ...)] body`` — the func URI
  drops a trailing ``/``/``#`` (parser.y:103-113); args get URIs
  ``funcURI + "/arg/" + name`` and bind the name as a local variable
  (parser.y:369-378);
- body statements are predicate-object pairs (``pred obj`` on the
  function subject, ``pred of var obj`` on an argument's node,
  parser.y:146-156) or expressions (calls), which join the function's
  ``loop:code`` cons list (ast.go Func.ToRDF);
- qnames append ``#`` to bases not ending in ``/``/``#``
  (parser.y:492-508); slashed references strip the trailing separator
  and append ``/part`` segments (parser.y:510-540);
- typed-literal constants fold to their value space exactly as the
  interpreter's literal evaluation does (parser.y:228-295);
- emission (ast.go): ``func`` node typed ``loop:Function``; args in an
  ``rdf:Bag`` container under ``loop:args``; each arg typed
  ``loop:Argument`` with optional ``loop:restrictType`` /
  ``rdfs:label``; call nodes are anon nodes typed by the callee with
  one triple per named argument; the code list is an rdf cons list.

Divergences from the reference, both deliberate:

- anon nodes are skolemized (``md5(source-position)`` style counters,
  SURVEY §1.4) instead of ``rand.Int63()`` — deterministic output;
- integer constants render via ``"%d" % int`` — the reference formats
  ``fmt.Sprintf("%d", float64(n))`` (ast.go IntegerConstant.ToRDF),
  which produces the unparseable string ``%!d(float64=N)`` that its own
  interpreter then rejects; plainly a bug, not a semantic to preserve.
"""

from __future__ import annotations

import hashlib

from ..terms import (
    KIND_IRI,
    RDF_NS,
    XSD_NS,
    Blank,
    IRI,
    Literal,
    Term,
)
from .interpreter import LOOP_NS, LoopError

RDFS_NS = "http://www.w3.org/2000/01/rdf-schema#"

_BASE_NAMES = {
    "rdf": RDF_NS,
    "rdfs": RDFS_NS,
    "owl": "http://www.w3.org/2002/07/owl#",
    "foaf": "http://xmlns.com/foaf/0.1/",
    "dc": "http://purl.org/dc/elements/1.1/",
    "dct": "http://purl.org/dc/terms/",
    "loop": LOOP_NS,
    "xsd": XSD_NS,
}

_KEYWORDS = {
    "as": "AS", "boolean": "BOOLEAN", "bool": "BOOLEAN", "data": "DATA",
    "false": "FALSE", "float": "FLOAT", "func": "FUNC", "integer": "INTEGER",
    "int": "INTEGER", "name": "NAME", "of": "OF", "resource": "RESOURCE",
    "res": "RESOURCE", "string": "STRING", "str": "STRING", "true": "TRUE",
}

_TYPE_URI = {
    "BOOLEAN": LOOP_NS + "Boolean",
    "DATA": LOOP_NS + "Data",
    "FLOAT": LOOP_NS + "Float",
    "INTEGER": LOOP_NS + "Integer",
    "RESOURCE": LOOP_NS + "Resource",
    "STRING": LOOP_NS + "String",
}


def _lex(src: str):
    """Token stream mirroring lexer.go: identifiers (letters/digits/_/-,
    keywords case-insensitive), numbers (optional sign/decimal/exponent),
    ``<uri>`` raw to ``>``, ``"string"`` raw to ``"`` (no escapes),
    ``^^``, and single-char punct ``(){}/:,``."""
    i, n = 0, len(src)
    while i < n:
        c = src[i]
        if c.isspace():
            i += 1
            continue
        if c.isalpha():
            j = i
            while j < n and (src[j].isalnum() or src[j] in "_-"):
                j += 1
            word = src[i:j]
            kw = _KEYWORDS.get(word.lower())
            yield (kw or "IDENT", word)
            i = j
        elif c.isdigit() or (c in "+-" and i + 1 < n and (src[i + 1].isdigit() or src[i + 1] == ".")):
            j = i + 1
            while j < n and (src[j].isdigit() or src[j] in ".eE+-"):
                # stop sign chars unless right after an exponent marker
                if src[j] in "+-" and src[j - 1] not in "eE":
                    break
                j += 1
            text = src[i:j]
            try:
                tok = (
                    ("FLOATCONST", float(text))
                    if ("." in text or "e" in text or "E" in text)
                    else ("INTCONST", int(text))
                )
            except ValueError as e:
                raise LoopError(f"bad number syntax: {text!r}") from e
            yield tok
            i = j
        elif c == "<":
            j = src.find(">", i + 1)
            if j < 0:
                raise LoopError("unterminated <uri>")
            yield ("URIREF", src[i + 1 : j])
            i = j + 1
        elif c == '"':
            j = src.find('"', i + 1)
            if j < 0:
                raise LoopError("unterminated string")
            yield ("STRING_LIT", src[i + 1 : j])
            i = j + 1
        elif c == "^":
            if src[i : i + 2] != "^^":
                raise LoopError("invalid character '^'")
            yield ("DT", "^^")
            i += 2
        elif c in "(){}/:,":
            yield (c, c)
            i += 1
        else:
            raise LoopError(f"invalid character {c!r}")
    yield ("EOF", "")


class _Parser:
    def __init__(self, src: str, salt: str = ""):
        self.toks = list(_lex(src))
        self.pos = 0
        self.names = dict(_BASE_NAMES)
        self.triples: list[tuple[Term, Term, Term]] = []
        self.func_uris: list[str] = []
        self.cur_func = ""
        self.cur_vars: dict[str, str] = {}
        self.anon = 0
        self.salt = salt

    # -- token plumbing ---------------------------------------------------
    def peek(self):
        return self.toks[self.pos]

    def next(self):
        t = self.toks[self.pos]
        self.pos += 1
        return t

    def expect(self, typ):
        t, v = self.next()
        if t != typ:
            raise LoopError(f"expected {typ}, got {t} {v!r}")
        return v

    def _anon(self) -> Term:
        h = hashlib.md5(f"{self.salt}loop#{self.anon}".encode()).hexdigest()[:16]
        self.anon += 1
        return Blank("anon" + h)

    # -- name resolution (parser.y:440-540) -------------------------------
    def _qname(self, prefix: str, local: str) -> str:
        base = self.names.get(prefix, "")
        if base:
            if base[-1] not in "/#":
                base += "#"
        else:
            base = "#"
        return base + local

    def _slashed(self, first: str) -> str:
        base = self.names.get(first, "")
        if base and base[-1] in "/#":
            base = base[:-1]
        parts = []
        while self.peek()[0] == "/":
            self.next()
            parts.append("/" + self.expect("IDENT"))
        return base + "".join(parts)

    def _resource(self) -> str | None:
        """resource := URIREF | qname | slashed_reference; returns None
        when the lookahead is a bare identifier (caller decides)."""
        t, v = self.peek()
        if t == "URIREF":
            self.next()
            return v
        if t == "IDENT":
            nxt = self.toks[self.pos + 1][0]
            if nxt == ":":
                self.next()
                self.next()
                return self._qname(v, self.expect("IDENT"))
            if nxt == "/":
                self.next()
                return self._slashed(v)
        return None

    def _resource_or_name(self) -> str:
        r = self._resource()
        if r is not None:
            return r
        return self.names.get(self.expect("IDENT"), "")

    def _resource_or_variable(self) -> str:
        r = self._resource()
        if r is not None:
            return r
        name = self.expect("IDENT")
        return self.cur_vars.get(name, self.names.get(name, ""))

    # -- toplevel ---------------------------------------------------------
    def parse(self):
        while True:
            t, _ = self.peek()
            if t == "EOF":
                return self
            if t == "NAME":
                self.next()
                uri = self._resource_or_name()
                self.expect("AS")
                self.names[self.expect("IDENT")] = uri
            elif t == "FUNC":
                self.next()
                self._funcdef()
            else:
                raise LoopError(f"expected 'name' or 'func', got {t}")

    def _funcdef(self):
        uri = self._resource_or_name()
        if uri and uri[-1] in "/#":
            uri = uri[:-1]
        self.cur_func = uri
        self.cur_vars = {}
        self.func_uris.append(uri)
        func = IRI(uri)
        emit = self.triples.append
        emit((func, IRI(RDF_NS + "type"), IRI(LOOP_NS + "Function")))

        args = []
        if self.peek()[0] == "(":
            self.next()
            while self.peek()[0] != ")":
                args.append(self._arg())
                if self.peek()[0] == ",":
                    self.next()
            self.next()
        if args:
            bag = self._anon()
            emit((func, IRI(LOOP_NS + "args"), bag))
            emit((bag, IRI(RDF_NS + "type"), IRI(RDF_NS + "Bag")))
            for i, arg_term in enumerate(args, 1):
                emit((bag, IRI(f"{RDF_NS}_{i}"), arg_term))

        # body: '{ stmts }' or a single stmt
        stmts: list = []
        if self.peek()[0] == "{":
            self.next()
            while self.peek()[0] != "}":
                stmts.append(self._stmt())
            self.next()
        else:
            stmts.append(self._stmt())

        code_exprs = []
        for kind, payload in stmts:
            if kind == "po":
                subj_uri, pred_uri, obj = payload
                subject = func if subj_uri == "" else IRI(subj_uri)
                emit((subject, IRI(pred_uri), obj))
            else:
                code_exprs.append(payload)
        if code_exprs:
            # rdf cons list (ast.go EncodeList)
            head = self._anon()
            emit((func, IRI(LOOP_NS + "code"), head))
            node = head
            for i, expr in enumerate(code_exprs):
                emit((node, IRI(RDF_NS + "first"), expr))
                if i + 1 < len(code_exprs):
                    nxt = self._anon()
                    emit((node, IRI(RDF_NS + "rest"), nxt))
                    node = nxt
                else:
                    emit((node, IRI(RDF_NS + "rest"), IRI(RDF_NS + "nil")))

    def _arg(self) -> Term:
        # resource_or_argument: bare identifier not in nameMap → arg URI
        r = self._resource()
        if r is None:
            name = self.expect("IDENT")
            r = self.names.get(name)
            if r is None:
                r = f"{self.cur_func}/arg/{name}"
                self.cur_vars[name] = r
        arg = IRI(r)
        emit = self.triples.append
        emit((arg, IRI(RDF_NS + "type"), IRI(LOOP_NS + "Argument")))
        t, _ = self.peek()
        if t in _TYPE_URI:
            self.next()
            emit((arg, IRI(LOOP_NS + "restrictType"), IRI(_TYPE_URI[t])))
        if self.peek()[0] == "STRING_LIT":
            emit((arg, IRI(RDFS_NS + "label"), Literal(self.next()[1])))
        return arg

    def _stmt(self):
        """stmt := predicate_object | funccall.  Disambiguation: a
        resource followed by '(' is a call; otherwise it is a predicate
        (with optional 'of var') and an object."""
        subj_override = ""
        pred = self._resource_or_name()
        t, v = self.peek()
        if t == "(":
            return ("expr", self._funccall(pred))
        if t == "OF":
            self.next()
            var = self.expect("IDENT")
            subj_override = self.cur_vars.get(var, "")
        obj = self._object()
        return ("po", (subj_override, pred, obj))

    def _object(self) -> Term:
        t, v = self.peek()
        if t == "STRING_LIT":
            return self._literal()
        return IRI(self._resource_or_name())

    def _literal(self) -> Term:
        # note: the grammar lists QUOTEDSTRING '@' IDENTIFIER
        # (parser.y:174-177) but neither lexer tokenizes '@'
        # (lexer.go:303 punct set), so lang-tagged literals are
        # unreachable in the reference as well — only plain/datatyped
        value = self.expect("STRING_LIT")
        if self.peek()[0] == "DT":
            self.next()
            return Literal(value, datatype=self._resource_or_name())
        return Literal(value)

    def _funccall(self, callee_uri: str) -> Term:
        self.expect("(")
        call = self._anon()
        emit = self.triples.append
        emit((call, IRI(RDF_NS + "type"), IRI(callee_uri)))
        if self.peek()[0] != ")":
            while True:
                prop = self._resource_or_name()
                expr = self._expr()
                emit((call, IRI(prop), expr))
                if self.peek()[0] == ",":
                    self.next()
                    continue
                break
        self.expect(")")
        return call

    def _expr(self) -> Term:
        t, v = self.peek()
        if t == "INTCONST":
            self.next()
            return Literal(str(v), datatype=XSD_NS + "integer")
        if t == "FLOATCONST":
            self.next()
            return Literal(f"{v:f}", datatype=XSD_NS + "double")
        if t == "TRUE":
            self.next()
            return Literal("true", datatype=XSD_NS + "boolean")
        if t == "FALSE":
            self.next()
            return Literal("false", datatype=XSD_NS + "boolean")
        if t == "STRING_LIT":
            return self._typed_const()
        # resource / variable / call
        uri = self._resource_or_variable()
        if self.peek()[0] == "(":
            return self._funccall(uri)
        return IRI(uri)

    def _typed_const(self) -> Term:
        """Typed-literal constant folding (parser.y:228-295): the
        constant re-renders in its canonical value space (hexBinary
        folds through bytes and re-emits as base64Binary, exactly as
        DataConstant.ToRDF does)."""
        import base64 as _b64

        from .interpreter import _XSD_FLOATS, _XSD_INTS

        lit = self._literal()
        dt, v = lit.datatype, lit.value
        if dt == XSD_NS + "boolean":
            if v in ("true", "1"):
                return Literal("true", datatype=dt)
            if v in ("false", "0"):
                return Literal("false", datatype=dt)
            raise LoopError(f"invalid boolean constant: {v}")
        if dt == XSD_NS + "base64Binary":
            try:
                data = _b64.b64decode(v)
            except Exception as e:
                raise LoopError(f"invalid base64 constant: {v!r}") from e
            return Literal(
                _b64.b64encode(data).decode(), datatype=XSD_NS + "base64Binary"
            )
        if dt == XSD_NS + "hexBinary":
            try:
                data = bytes.fromhex(v)
            except ValueError as e:
                raise LoopError(f"invalid hex constant: {v!r}") from e
            return Literal(
                _b64.b64encode(data).decode(), datatype=XSD_NS + "base64Binary"
            )
        try:
            if dt in _XSD_FLOATS:
                return Literal(f"{float(v):f}", datatype=XSD_NS + "double")
            if dt in _XSD_INTS:
                return Literal(str(int(v)), datatype=XSD_NS + "integer")
        except ValueError as e:
            raise LoopError(f"invalid numeric constant: {v!r}") from e
        if dt == XSD_NS + "anyURI":
            return IRI(v)
        if dt == XSD_NS + "QName":
            colon = v.find(":")
            if colon < 0:
                raise LoopError(f"invalid QName constant: {v}")
            return IRI(self.names.get(v[:colon], "") + v[colon + 1 :])
        return lit


def parse_loop(source: str, salt: str = "") -> _Parser:
    return _Parser(source, salt).parse()


def compile_loop(
    source: str, salt: str = ""
) -> tuple[list[tuple[Term, Term, Term]], list[str], dict[str, str]]:
    """``.loop`` source → (program triples, declared function URIs,
    prefix map for the interpreter's QName evaluation)."""
    p = parse_loop(source, salt)
    prefixes = dict(p.names)
    return p.triples, p.func_uris, prefixes

"""Squirtle parser (operator S3) — the reference's Turtle-like DSL.

Reimplements the goyacc grammar ``/root/reference/squirtleparser.y`` as a
per-call recursive-descent parser (per-call state removes the
reference's process-wide parser mutex, squirtleparser.y:63,612-644):

- ``name <iri> as prefix`` declarations (:138);
- nested ``{}`` descriptions with a subject stack (:222-232); an empty
  subject is an anonymous node (:235) — skolemized here;
- ``a`` keyword → rdf:type; ``*`` predicate → auto-numbered container
  membership ``rdf:_N`` with a per-description counter (:263-266);
- object lists ``o1, o2`` (:268-269); nested descriptions and template
  applications as objects (:271-276);
- **templates**: ``template Name(?x) { ... }`` capture their body
  triples; ``subject is|new Name(args)`` substitutes bindings and
  re-emits them, with a nil template subject bound to the applied
  subject (:144-220);
- bare identifiers resolve through declared names then the built-in
  namespace table (getName, :318-331; prefix.cc HTTP fallback replaced
  by the static table — no network mid-pipeline);
- qnames ``p:local`` → ``addHash(base) + local``; slash names
  ``p/a/b`` → ``stripSlash(base) + /a/b`` (:298-305, :334-358);
- literals: plain / ``@lang`` / ``^^dt`` strings (no escape sequences —
  the reference lexer reads raw runes to the closing quote, :495-504),
  bare numerics typed xsd:integer/decimal/double, ``true``/``false`` →
  xsd:boolean, ``inf``/``nan`` → xsd:double (:283-287, :404-439).

``include "file"`` / ``include <url>`` recursion (:101-136) is resolved
by a driver-side pre-pass (:func:`resolve_includes`: recursive textual
splice against a provided name→source map — semantically identical to
the reference's shared-state inline parse) — a distributed task must
not do file/network I/O mid-parse, so an ``include`` surviving into
``_Parser`` is still an error.
"""

from __future__ import annotations

import pyarrow as pa

from ..namespaces import BUILTIN_NAMESPACES
from ..sources.rdfa import skolem_id
from ..terms import (
    A,
    IRI,
    KIND_BLANK,
    KIND_IRI,
    KIND_LITERAL,
    RDF_NS,
    XSD_NS,
    Blank,
    Literal,
    Term,
    append_subject_hash,
    triples_to_table,
)

_KIND_VAR = 99  # parser-internal sqtlVar (squirtleparser.y:36-50)


def _Var(name: str) -> Term:
    return Term(_KIND_VAR, name)


class SquirtleParseError(ValueError):
    pass


# ---------------------------------------------------------------------------
# Lexer (squirtleparser.y:360-610)
# ---------------------------------------------------------------------------

_KEYWORDS = {"a", "as", "false", "include", "is", "name", "new", "template", "true"}


class _Lexer:
    def __init__(self, text: str):
        self.text = text
        self.pos = 0
        self.line = 1

    def _peek_ch(self) -> str:
        return self.text[self.pos] if self.pos < len(self.text) else ""

    def tokens(self):
        """Yield (type, value) pairs; type ∈ {IDENT, KEYWORD, VAR, IRIREF,
        STRING, INTEGER, DECIMAL, DOUBLE, BNODE, DT, PUNCT, EOF}."""
        text, n = self.text, len(self.text)
        i = 0
        while True:
            while i < n and text[i].isspace():
                if text[i] == "\n":
                    self.line += 1
                i += 1
            if i >= n:
                yield ("EOF", "")
                return
            ch = text[i]
            if ch == "#":  # comment to EOL (squirtleparser.y:472-475)
                while i < n and text[i] != "\n":
                    i += 1
                continue
            if ch == "_" and i + 1 < n and text[i + 1] == ":":
                i += 2
                yield ("BNODE", "_:")
                # the label lexes RAW (no keyword folding): the
                # reference lowercase-keywordizes here too, which makes
                # `_:a` / `_:New` unparseable (BNODE must be followed by
                # IDENTIFIER, squirtleparser.y:278,404-438) — plainly a
                # lexer gap, and our serializer emits arbitrary labels
                j = i
                while j < n and (text[j].isalnum() or text[j] in "_-"):
                    j += 1
                if j > i:
                    yield ("IDENT", text[i:j])
                    i = j
                continue
            if ch.isalpha() or ch == "_":
                j = i
                while j < n and (text[j].isalnum() or text[j] in "_-"):
                    j += 1
                word = text[i:j]
                i = j
                low = word.lower()
                if low == "inf":
                    yield ("DOUBLE", "INF")
                elif low == "nan":
                    yield ("DOUBLE", "NaN")
                elif low in _KEYWORDS:
                    yield ("KEYWORD", low)
                else:
                    yield ("IDENT", word)
                continue
            if ch.isdigit() or (
                ch in "+-" and i + 1 < n and (text[i + 1].isdigit() or text[i + 1] == ".")
            ):
                j = i
                if text[j] in "+-":
                    j += 1
                kind = "INTEGER"
                while j < n and text[j].isdigit():
                    j += 1
                if j < n and text[j] == ".":
                    j += 1
                    kind = "DECIMAL"
                    while j < n and text[j].isdigit():
                        j += 1
                if j < n and text[j] in "eE":
                    j += 1
                    kind = "DOUBLE"
                    if j < n and text[j] in "+-":
                        j += 1
                    while j < n and text[j].isdigit():
                        j += 1
                if j < n and (text[j].isalpha() or text[j].isdigit()):
                    raise SquirtleParseError(
                        f"line {self.line}: malformed number at {text[i:j+1]!r}"
                    )
                yield (kind, text[i:j])
                i = j
                continue
            if ch in "?$":  # VAR (squirtleparser.y:477-482)
                j = i + 1
                while j < n and (text[j].isalnum() or text[j] in "_-"):
                    j += 1
                yield ("VAR", text[i + 1 : j])
                i = j
                continue
            if ch == "<":  # IRIREF: raw runes to '>' (:484-493)
                j = text.find(">", i + 1)
                if j < 0:
                    raise SquirtleParseError(f"line {self.line}: unterminated IRI")
                yield ("IRIREF", text[i + 1 : j])
                i = j + 1
                continue
            if ch == '"':
                # STRING: raw runes to '"' (:495-504) EXTENDED with two
                # escapes, \\" and \\\\ — the reference serializer emits
                # NT-escaped literals its own raw-rune lexer cannot read
                # back (a quote inside a literal is unserializable
                # there); the extension closes our serializer↔parser
                # loop while reading any reference-conformant raw string
                # identically unless it contains backslash-quote
                j = i + 1
                buf = []
                while j < n and text[j] != '"':
                    if text[j] == "\\" and j + 1 < n and text[j + 1] in '"\\':
                        buf.append(text[j + 1])
                        j += 2
                    else:
                        buf.append(text[j])
                        j += 1
                if j >= n:
                    raise SquirtleParseError(f"line {self.line}: unterminated string")
                yield ("STRING", "".join(buf))
                i = j + 1
                continue
            if ch == "^" and i + 1 < n and text[i + 1] == "^":
                i += 2
                yield ("DT", "^^")
                continue
            i += 1
            yield ("PUNCT", ch)


# ---------------------------------------------------------------------------
# Parser
# ---------------------------------------------------------------------------


def _add_hash(s: str) -> str:
    if s == "":
        return "#"
    return s if s[-1] in "#/" else s + "#"


def _strip_slash(s: str) -> str:
    if s and s[-1] in "#/":
        return s[:-1]
    return s


class _Parser:
    def __init__(self, text: str, document_uri: str = "", salt: str = ""):
        self._toks = list(_Lexer(text).tokens())
        self._i = 0
        self.document_uri = document_uri
        self.salt = salt
        self.names: dict[str, str] = {}
        self.prefix_map: dict[str, str] = {}  # uri → prefix (graph orientation)
        self.templates: dict[str, tuple[list[str], list[tuple]]] = {}
        self.triples: list[tuple[Term, Term, Term]] = []
        self._anon = 0

    # token helpers ---------------------------------------------------------

    def _peek(self, k: int = 0):
        return self._toks[min(self._i + k, len(self._toks) - 1)]

    def _next(self):
        tok = self._toks[self._i]
        if self._i < len(self._toks) - 1:
            self._i += 1
        return tok

    def _expect_punct(self, ch: str):
        t, v = self._next()
        if t != "PUNCT" or v != ch:
            raise SquirtleParseError(f"expected {ch!r}, got {v!r}")

    def _anon_node(self) -> Term:
        term = Blank(skolem_id(self.document_uri, self._anon, self.salt))
        self._anon += 1
        return term

    # name resolution -------------------------------------------------------

    def _get_name(self, ident: str) -> str:
        if ident in self.names:
            return self.names[ident]
        uri = BUILTIN_NAMESPACES.get(ident.lower())
        if uri is not None:
            self.names[ident] = uri
            self.prefix_map[uri] = ident
            return uri
        return ""

    # grammar ---------------------------------------------------------------

    def parse(self) -> list[tuple[Term, Term, Term]]:
        while self._peek()[0] != "EOF":
            self._statement()
        return self.triples

    def _statement(self) -> None:
        t, v = self._peek()
        if t == "KEYWORD" and v == "name":
            self._next()
            iri = self._raw_iriref()
            kt, kv = self._next()
            if not (kt == "KEYWORD" and kv == "as"):
                raise SquirtleParseError("expected 'as' in name declaration")
            it, ident = self._next()
            if it != "IDENT":
                raise SquirtleParseError("expected identifier in name declaration")
            self.names[ident] = iri
            self.prefix_map[iri] = ident
            return
        if t == "KEYWORD" and v == "include":
            raise SquirtleParseError(
                "include is not supported in distributed parsing; "
                "pre-resolve includes upstream (squirtleparser.y:101-136)"
            )
        if t == "KEYWORD" and v == "template":
            self._template_decl()
            return
        self._description_or_apply(emit_to=None)

    def _template_decl(self) -> None:
        self._next()  # 'template'
        it, name = self._next()
        if it != "IDENT":
            raise SquirtleParseError("expected template name")
        argnames: list[str] = []
        if self._peek() == ("PUNCT", "("):
            self._next()
            while self._peek() != ("PUNCT", ")"):
                vt, vv = self._next()
                if vt != "VAR":
                    raise SquirtleParseError("expected ?var in template args")
                argnames.append(vv)
                if self._peek() == ("PUNCT", ","):
                    self._next()
            self._next()  # ')'
        body: list[tuple] = []
        # template body: subject is nil inside (squirtleparser.y:154)
        self._description_body(subject=None, emit_to=body)
        self.templates[name] = (argnames, body)

    def _description_or_apply(self, emit_to) -> Term:
        """statement/object position: [subject] ('{...}' | is/new T(args))."""
        subject = self._opt_subject()
        t, v = self._peek()
        if t == "KEYWORD" and v in ("is", "new"):
            self._next()
            return self._apply_template(subject, emit_to)
        if subject is None:
            subject = self._anon_node()
        self._description_body(subject, emit_to)
        return subject

    def _opt_subject(self) -> Term | None:
        t, v = self._peek()
        if t == "IRIREF" or t == "IDENT":
            return self._iriref_term()
        if t == "BNODE":
            self._next()
            it, ident = self._next()
            if it not in ("IDENT", "KEYWORD"):
                raise SquirtleParseError("expected blank node id")
            return Blank(ident)
        if t == "VAR":
            self._next()
            return _Var(v)
        return None  # empty subject → anon (squirtleparser.y:235)

    def _apply_template(self, subject: Term | None, emit_to) -> Term:
        it, name = self._next()
        if it != "IDENT":
            raise SquirtleParseError("expected template name after is/new")
        if subject is None:
            subject = self._anon_node()
        self._expect_punct("(")
        args: list[Term] = []
        while self._peek() != ("PUNCT", ")"):
            args.append(self._object(emit_to))
            if self._peek() == ("PUNCT", ","):
                self._next()
        self._next()  # ')'
        if name not in self.templates:
            raise SquirtleParseError(f"Undefined template: {name}")
        argnames, body = self.templates[name]
        if len(argnames) != len(args):
            raise SquirtleParseError(
                f"Wrong number of arguments for template {name}: "
                f"expected {len(argnames)}, got {len(args)}"
            )
        bindings = dict(zip(argnames, args))

        def subst(term: Term | None, fallback: Term | None = None) -> Term:
            if term is None:
                return fallback
            if term.kind == _KIND_VAR:
                if term.value not in bindings:
                    raise SquirtleParseError(f"unbound template variable ?{term.value}")
                return bindings[term.value]
            return term

        sink = self.triples if emit_to is None else emit_to
        for s, p, o in body:
            sink.append((subst(s, subject), subst(p), subst(o)))
        return subject

    def _description_body(self, subject: Term | None, emit_to) -> None:
        self._expect_punct("{")
        next_item = 1  # per-description rdf:_N counter (squirtleparser.y:266)
        while self._peek() != ("PUNCT", "}"):
            if self._peek()[0] == "EOF":
                raise SquirtleParseError("unterminated description, expecting '}'")
            pred, next_item = self._predicate(next_item)
            while True:
                obj = self._object(emit_to)
                sink = self.triples if emit_to is None else emit_to
                sink.append((subject, pred, obj))
                if self._peek() == ("PUNCT", ","):
                    self._next()
                    continue
                break
        self._next()  # '}'

    def _predicate(self, next_item: int) -> tuple[Term, int]:
        t, v = self._peek()
        if t == "KEYWORD" and v == "a":
            self._next()
            return A, next_item
        if t == "PUNCT" and v == "*":
            self._next()
            return IRI(RDF_NS + f"_{next_item}"), next_item + 1
        if t == "VAR":
            self._next()
            return _Var(v), next_item
        return self._iriref_term(), next_item

    def _object(self, emit_to) -> Term:
        t, v = self._peek()
        if t == "STRING":
            self._next()
            if self._peek() == ("PUNCT", "@"):
                self._next()
                lt, lv = self._next()
                if lt not in ("IDENT", "KEYWORD"):
                    raise SquirtleParseError("expected language tag")
                return Literal(v, lang=lv)
            if self._peek()[0] == "DT":
                self._next()
                dt = self._iriref_term()
                return Literal(v, datatype=dt.value)
            return Literal(v)
        if t == "INTEGER":
            self._next()
            return Literal(v, datatype=XSD_NS + "integer")
        if t == "DECIMAL":
            self._next()
            return Literal(v, datatype=XSD_NS + "decimal")
        if t == "DOUBLE":
            self._next()
            return Literal(v, datatype=XSD_NS + "double")
        if t == "KEYWORD" and v in ("true", "false"):
            self._next()
            return Literal(v, datatype=XSD_NS + "boolean")
        if t == "VAR":
            self._next()
            return _Var(v)
        if t == "BNODE":
            self._next()
            it, ident = self._next()
            if it not in ("IDENT", "KEYWORD"):
                raise SquirtleParseError("expected blank node id")
            bn = Blank(ident)
            if self._peek() == ("PUNCT", "{"):
                self._description_body(bn, emit_to)
            return bn
        # iriref-headed: may be a plain object, a nested description, or a
        # template application (squirtleparser.y:271-276)
        term = self._iriref_term() if t in ("IRIREF", "IDENT") else None
        if term is None:
            if t == "PUNCT" and v == "{":
                anon = self._anon_node()
                self._description_body(anon, emit_to)
                return anon
            raise SquirtleParseError(f"unexpected token {v!r} in object position")
        nt, nv = self._peek()
        if nt == "PUNCT" and nv == "{":
            self._description_body(term, emit_to)
            return term
        if nt == "KEYWORD" and nv in ("is", "new"):
            self._next()
            return self._apply_template(term, emit_to)
        return term

    def _iriref_term(self) -> Term:
        return IRI(self._raw_iriref())

    def _raw_iriref(self) -> str:
        t, v = self._next()
        if t == "IRIREF":
            return v
        if t != "IDENT":
            raise SquirtleParseError(f"expected IRI or identifier, got {v!r}")
        # qname / slash name / bare identifier (squirtleparser.y:293-305)
        if self._peek() == ("PUNCT", ":"):
            self._next()
            pt, pv = self._next()
            if pt not in ("IDENT", "KEYWORD"):
                raise SquirtleParseError("expected local name after ':'")
            return _add_hash(self._get_name(v)) + pv
        if self._peek() == ("PUNCT", "/"):
            out = _strip_slash(self._get_name(v))
            while self._peek() == ("PUNCT", "/"):
                self._next()
                pt, pv = self._next()
                if pt not in ("IDENT", "KEYWORD"):
                    raise SquirtleParseError("expected name after '/'")
                out += "/" + pv
            return out
        return self._get_name(v)


def resolve_includes(
    source: str,
    sources: "dict[str, str]",
    _seen: frozenset = frozenset(),
) -> str:
    """Driver-side pre-resolution of ``include "name"`` / ``include
    <iri>`` statements (operator S3 completion; squirtleparser.y:101-136).

    The reference parses the included stream inline with SHARED parser
    state (names/templates declared inside an include stay visible
    after it — goyacc global maps), so a recursive textual splice of
    ``sources[name]`` at the statement position is semantically
    identical.  This runs on the driver against a provided name→source
    map — the distributed per-document parse never does I/O (the reason
    ``_Parser`` rejects a surviving ``include``).  Unknown names and
    include cycles raise :class:`SquirtleParseError`.

    The scanner mirrors the lexer's token rules (raw strings without
    escapes :495-504, ``<...>`` IRIs, ``#`` comments, case-insensitive
    keywords), so ``include`` inside strings/comments/IRIs is left
    alone.
    """
    out: list[str] = []
    i, n = 0, len(source)
    while i < n:
        ch = source[i]
        if ch == "#":  # comment to EOL
            j = source.find("\n", i)
            j = n if j < 0 else j
            out.append(source[i:j])
            i = j
        elif ch == '"':  # raw string, no escapes
            j = source.find('"', i + 1)
            j = n if j < 0 else j + 1
            out.append(source[i:j])
            i = j
        elif ch == "<":
            j = source.find(">", i + 1)
            j = n if j < 0 else j + 1
            out.append(source[i:j])
            i = j
        elif ch.isalpha() or ch == "_":
            j = i
            while j < n and (source[j].isalnum() or source[j] in "_-"):
                j += 1
            word = source[i:j]
            if word.lower() == "include":
                k = j
                while k < n and source[k].isspace():
                    k += 1
                if k >= n or source[k] not in "\"<":
                    raise SquirtleParseError(
                        "expected string or <iri> after include"
                    )
                close = '"' if source[k] == '"' else ">"
                e = source.find(close, k + 1)
                if e < 0:
                    raise SquirtleParseError("unterminated include target")
                name = source[k + 1 : e]
                if name in _seen:
                    raise SquirtleParseError(
                        f"include cycle through {name!r}"
                    )
                if name not in sources:
                    raise SquirtleParseError(
                        f"unknown include {name!r}: not in the provided "
                        f"name→source map"
                    )
                out.append(
                    resolve_includes(sources[name], sources, _seen | {name})
                )
                out.append("\n")
                i = e + 1
            else:
                out.append(word)
                i = j
        else:
            out.append(ch)
            i += 1
    return "".join(out)


def parse_squirtle(
    text: str,
    document_uri: str = "",
    salt: str = "",
    includes: "dict[str, str] | None" = None,
) -> list[tuple[Term, Term, Term]]:
    """Parse one Squirtle document into scalar triples.  ``includes``:
    optional name→source map; when given, ``include`` statements are
    pre-resolved (driver-side splice) before the parse."""
    if includes is not None:
        text = resolve_includes(text, includes)
    parser = _Parser(text, document_uri, salt)
    triples = parser.parse()
    for s, p, o in triples:
        for term in (s, p, o):
            if term.kind == _KIND_VAR:
                raise SquirtleParseError(f"unbound variable ?{term.value} in output")
    return triples


def parse_squirtle_with_prefixes(
    text: str, document_uri: str = "", salt: str = ""
) -> tuple[list[tuple[Term, Term, Term]], dict[str, str]]:
    """Also return the uri→prefix map built by name declarations."""
    parser = _Parser(text, document_uri, salt)
    triples = parser.parse()
    return triples, dict(parser.prefix_map)


def parse_squirtle_batch(
    batch: pa.Table,
    text_column: str = "text",
    url_column: str | None = "url",
    salt: str = "",
    on_error: str = "raise",
    includes: "dict[str, str] | None" = None,
) -> pa.Table:
    """Stateless ``map_batches`` UDF — per-call parser state makes
    documents the parallel unit, removing the reference's global parser
    mutex bottleneck (squirtleparser.y:63).  ``includes``: broadcast
    name→source map for include pre-resolution (ship via ``ray.put`` +
    ``fn_kwargs`` so it moves once, not per batch)."""
    texts = batch[text_column].to_pylist()
    urls = batch[url_column].to_pylist() if url_column else [""] * len(texts)
    rows, row_urls = [], []
    for text, url in zip(texts, urls):
        if isinstance(text, bytes):
            text = text.decode("utf-8", errors="replace")
        try:
            triples = parse_squirtle(
                text, document_uri=url or "", salt=salt, includes=includes
            )
        except SquirtleParseError:
            if on_error == "raise":
                raise
            continue
        rows.extend(triples)
        row_urls.extend([url] * len(triples))
    return append_subject_hash(triples_to_table(rows, urls=row_urls, with_hash=False))

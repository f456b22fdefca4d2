"""TriG parser — named-graph Turtle (quad twin of the Turtle-subset
parser in ``sources/turtle.py``).  The document splits into top-level
sections: ``<graph> { ...turtle... }`` / ``_:label { ... }`` named
sections and bare default-graph statements between them.  Brace
scanning tracks quoted-string state (a ``{`` inside a literal never
opens a section); each section body reuses :func:`parse_turtle` with
the document's ``@prefix`` header prepended, so every Turtle-subset
rule (qnames, escapes, ``;`` separators) applies inside graphs too.
"""

from __future__ import annotations

import re

import pyarrow as pa

from ..terms import (
    KIND_BLANK,
    KIND_IRI,
    Term,
    append_subject_hash,
    triples_to_table,
)
from .turtle import TurtleParseError, parse_turtle

_PREFIX_RE = re.compile(r"^\s*@prefix\s+(\w*):\s*<([^>]*)>\s*\.\s*$")
_GRAPH_LABEL_RE = re.compile(r"(<[^>]*>|_:[A-Za-z][A-Za-z0-9]*)\s*$")

_DEFAULT_GRAPH = Term(KIND_IRI, "")


def parse_trig(text: str) -> list[tuple[Term, Term, Term, Term]]:
    """TriG document → scalar quads (default graph = empty IRI term)."""
    header_lines, body_lines = [], []
    for line in text.split("\n"):
        (header_lines if _PREFIX_RE.match(line) else body_lines).append(line)
    header = "\n".join(header_lines) + ("\n" if header_lines else "")
    body = "\n".join(body_lines)

    quads: list[tuple[Term, Term, Term, Term]] = []

    def parse_into(segment: str, graph: Term) -> None:
        if not segment.strip():
            return
        for s, p, o in parse_turtle(header + segment):
            quads.append((s, p, o, graph))

    # scan top level: braces outside quoted strings AND outside <IRI>s
    # delimit graph bodies (the IRI charset allows '{' but not '<'/'"',
    # so <...> is safe to treat as opaque)
    i, n = 0, len(body)
    seg_start = 0
    in_string = False
    in_iri = False
    while i < n:
        ch = body[i]
        if in_string:
            if ch == "\\":
                i += 2
                continue
            if ch == '"':
                in_string = False
        elif in_iri:
            if ch == ">":
                in_iri = False
        elif ch == '"':
            in_string = True
        elif ch == "<":
            in_iri = True
        elif ch == "{":
            before = body[seg_start:i]
            m = _GRAPH_LABEL_RE.search(before)
            if m is None:
                raise TurtleParseError("graph section without a label")
            label = m.group(1)
            graph = (
                Term(KIND_BLANK, label[2:])
                if label.startswith("_:")
                else Term(KIND_IRI, label[1:-1])
            )
            parse_into(before[: m.start()], _DEFAULT_GRAPH)
            # find the matching close brace (same string/IRI-aware scan)
            j = i + 1
            depth_in_string = False
            depth_in_iri = False
            while j < n:
                cj = body[j]
                if depth_in_string:
                    if cj == "\\":
                        j += 2
                        continue
                    if cj == '"':
                        depth_in_string = False
                elif depth_in_iri:
                    if cj == ">":
                        depth_in_iri = False
                elif cj == '"':
                    depth_in_string = True
                elif cj == "<":
                    depth_in_iri = True
                elif cj == "}":
                    break
                j += 1
            if j >= n:
                raise TurtleParseError("unterminated graph section, expecting '}'")
            parse_into(body[i + 1 : j], graph)
            i = j + 1
            seg_start = i
            continue
        elif ch == "}":
            raise TurtleParseError("unexpected '}' outside a graph section")
        i += 1
    if in_string:
        raise TurtleParseError("unterminated string literal")
    parse_into(body[seg_start:], _DEFAULT_GRAPH)
    return quads


def parse_trig_batch(
    batch: pa.Table,
    text_column: str = "text",
    url_column: str | None = "url",
    on_error: str = "raise",
) -> pa.Table:
    """Stateless ``map_batches`` UDF: TriG documents → flattened quad
    rows (12 term columns + graph_kind/graph_value).  ``on_error="skip"``
    quarantines malformed documents."""
    texts = batch[text_column].to_pylist()
    urls = batch[url_column].to_pylist() if url_column else [""] * len(texts)
    triples: list[tuple[Term, Term, Term]] = []
    graphs: list[Term] = []
    row_urls: list[str] = []
    for text, url in zip(texts, urls):
        try:
            quads = parse_trig(text)
        except TurtleParseError:
            if on_error == "raise":
                raise
            continue
        for s, p, o, g in quads:
            triples.append((s, p, o))
            graphs.append(g)
        row_urls.extend([url] * len(quads))
    table = triples_to_table(triples, urls=row_urls, with_hash=False)
    table = table.append_column(
        "graph_kind", pa.array([g.kind for g in graphs], pa.int64())
    ).append_column(
        "graph_value", pa.array([g.value for g in graphs], pa.large_string())
    )
    return append_subject_hash(table)

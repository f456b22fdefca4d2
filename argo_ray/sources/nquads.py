"""N-Quads parser — the named-graph extension of the N-Triples reader
(S1; cf. ``sources/ntriples.py``, which reimplements
``/root/reference/ntriples.go:87-472``).  The quad grammar is the
triple grammar with an optional IRI/blank-node graph label before the
terminating ``.``; everything else (escapes, comments, error kinds
with line+column) is inherited from :class:`NTriplesReader`.

The parallel unit is the document: ``parse_nquads_batch`` is a
stateless ``map_batches`` UDF mapping a text column to flattened quad
rows (12 term columns + ``graph_kind``/``graph_value``; the default
graph is kind IRI with an empty value).
"""

from __future__ import annotations

import pyarrow as pa

from ..terms import (
    KIND_IRI,
    KIND_LITERAL,
    Term,
    append_subject_hash,
    triples_to_table,
)
from .ntriples import (
    _EOF,
    ERR_UNEXPECTED_CHARACTER,
    ERR_UNTERMINATED_TRIPLE,
    NTriplesParseError,
    NTriplesReader,
)

ERR_GRAPH_TERM = "graph label must be an IRI or blank node"

_DEFAULT_GRAPH = Term(KIND_IRI, "")


class NQuadsReader(NTriplesReader):
    """``read_quad()`` returns one (s, p, o, g) per call, ``None`` at
    EOF; g is the default-graph term for plain triple lines."""

    def read_quad(self) -> tuple[Term, Term, Term, Term] | None:
        self.line += 1
        self.column = -1

        ch = self._skip_whitespace()
        if ch == _EOF:
            return None
        while ch == "#":
            while True:
                ch = self._read_rune()
                if ch == _EOF:
                    return None
                if ch == "\n":
                    break
            ch = self._skip_whitespace()
            if ch == _EOF:
                return None
        self._unread_rune()

        s = self._parse_term()
        self._expect_whitespace()
        p = self._parse_term()
        self._expect_whitespace()
        o = self._parse_term()

        ch = self._skip_whitespace()
        if ch == _EOF:
            raise self._error(ERR_UNTERMINATED_TRIPLE)
        if ch == ".":
            ch = self._skip_whitespace()
            if ch not in (_EOF, "\n"):
                raise self._error(ERR_UNEXPECTED_CHARACTER)
            return (s, p, o, _DEFAULT_GRAPH)
        self._unread_rune()
        g = self._parse_term()
        if g.kind == KIND_LITERAL:
            raise self._error(ERR_GRAPH_TERM)
        self._read_end_triple()
        return (s, p, o, g)

    def read_all_quads(self) -> list[tuple[Term, Term, Term, Term]]:
        out = []
        while True:
            q = self.read_quad()
            if q is None:
                return out
            out.append(q)


def parse_nquads(text: str) -> list[tuple[Term, Term, Term, Term]]:
    """Parse an N-Quads document into scalar quads (raises
    :class:`NTriplesParseError` on malformed input)."""
    return NQuadsReader(text).read_all_quads()


def parse_nquads_batch(
    batch: pa.Table,
    text_column: str = "text",
    url_column: str | None = "url",
    on_error: str = "raise",
) -> pa.Table:
    """Stateless ``map_batches`` UDF: N-Quads documents → flattened
    quad rows.  ``on_error="skip"`` quarantines malformed documents
    (poison-page pattern) instead of failing the task."""
    texts = batch[text_column].to_pylist()
    urls = batch[url_column].to_pylist() if url_column else [""] * len(texts)
    triples: list[tuple[Term, Term, Term]] = []
    graphs: list[Term] = []
    row_urls: list[str] = []
    for text, url in zip(texts, urls):
        try:
            quads = parse_nquads(text)
        except NTriplesParseError:
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

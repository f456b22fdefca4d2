"""RDFa/HTML triple extractor (operator S4) — the flagship per-page stage.

Reimplements the reference's DOM traversal semantics
(``/root/reference/rdfaparser/rdfaparser.go:64-151``):

- ``xmlns:<p>`` attributes register prefixes into a traversal-wide map
  (shared dict, mutations persist across siblings — Go map semantics,
  rdfaparser.go:66-74);
- ``vocab`` rebinds the CURIE fallback base for the subtree (:76-79);
- ``typeof`` [+ optional ``resource``] starts a new subject (Resource or
  anonymous blank node) and emits an ``rdf:type`` triple (:81-91);
- ``property`` + (``content`` attr | first child's text) + optional
  ``datatype`` / ``xml:lang`` emits a literal triple (:93-126);
- ``rel`` + ``href`` emits a forward link, ``rev`` + ``href`` a reversed
  one (:128-146);
- the document URI is the root subject (:154, :184); a leading ``<?xml?>``
  declaration is skipped (:168-175).

Anonymous nodes: the reference uses ``rand.Int63()`` ids
(``term.go:149-151``) — nondeterministic.  We skolemize instead:
``anon + md5(salt + url + '#' + counter)[:16]`` with a per-page counter,
preserving within-page identity (all argo's graph equality needs) while
keeping the pipeline deterministic and resumable (SURVEY.md §1.4).

The batch entrypoint :func:`extract_rdfa_batch` is a stateless
``map_batches`` UDF over zero-copy Arrow pages batches.
"""

from __future__ import annotations

import hashlib
from html.parser import HTMLParser

import pyarrow as pa

from ..terms import (
    A,
    IRI,
    Blank,
    Literal,
    Term,
    append_subject_hash,
    triples_to_table,
)

# HTML void elements never get children pushed on the stack.
_VOID = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)


class _Node:
    __slots__ = ("tag", "attrs", "children")

    def __init__(self, tag: str, attrs: list[tuple[str, str | None]]):
        self.tag = tag
        self.attrs = {k: (v if v is not None else "") for k, v in attrs}
        self.children: list[object] = []  # _Node | str (text)


class _DomBuilder(HTMLParser):
    """Minimal DOM builder; tolerant of unclosed tags (pop-to-match)."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = _Node("#document", [])
        self._stack = [self.root]

    def handle_starttag(self, tag: str, attrs: list) -> None:
        node = _Node(tag, attrs)
        self._stack[-1].children.append(node)
        if tag not in _VOID:
            self._stack.append(node)

    def handle_startendtag(self, tag: str, attrs: list) -> None:
        self._stack[-1].children.append(_Node(tag, attrs))

    def handle_endtag(self, tag: str) -> None:
        for i in range(len(self._stack) - 1, 0, -1):
            if self._stack[i].tag == tag:
                del self._stack[i:]
                return

    def handle_data(self, data: str) -> None:
        self._stack[-1].children.append(data)


def parse_html(html: str) -> _Node:
    """HTML → DOM, skipping a leading ``<?...?>`` declaration
    (rdfaparser.go:168-175)."""
    if html.startswith("<?"):
        end = html.find(">")
        if end >= 0:
            html = html[end + 1 :]
    builder = _DomBuilder()
    builder.feed(html)
    builder.close()
    return builder.root


def skolem_id(url: str, counter: int, salt: str = "") -> str:
    """Deterministic blank-node id replacing the reference's random
    ``anon%016x`` (term.go:149-151); md5 so the DuckDB oracle can
    reproduce it (``'anon' || substr(md5(url || '#' || n), 1, 16)``)."""
    digest = hashlib.md5(f"{salt}{url}#{counter}".encode()).hexdigest()
    return "anon" + digest[:16]


def _expand_uri(s: str, vocab_base: str, prefix_map: dict[str, str]) -> str:
    """CURIE expansion (operator M7, rdfaparser.go:53-62): bare name →
    vocab base + name; ``prefix:local`` → mapped base + local (missing
    prefix maps to "" exactly as a Go map zero value)."""
    p = s.find(":")
    if p < 0:
        return vocab_base + s
    return prefix_map.get(s[:p], "") + s[p + 1 :]


def _first_child_text(node: _Node) -> str:
    if not node.children:
        return ""
    first = node.children[0]
    return first if isinstance(first, str) else ""


def extract_rdfa(html: str, document_uri: str, salt: str = "") -> list[tuple]:
    """Extract triples from one HTML page (semantics per module doc)."""
    root = parse_html(html)
    triples: list[tuple[Term, Term, Term]] = []
    prefix_map: dict[str, str] = {}
    anon_counter = [0]

    def traverse(node: _Node, subject: Term, vocab_base: str) -> None:
        for name, value in node.attrs.items():
            if name.startswith("xmlns:"):
                prefix_map[name[6:]] = value

        vocab_base = node.attrs.get("vocab", vocab_base)

        typeof = node.attrs.get("typeof")
        if typeof is not None:
            resource = node.attrs.get("resource")
            if resource is not None:
                subject = IRI(resource)
            else:
                subject = Blank(skolem_id(document_uri, anon_counter[0], salt))
                anon_counter[0] += 1
            triples.append(
                (subject, A, IRI(_expand_uri(typeof, vocab_base, prefix_map)))
            )

        prop = node.attrs.get("property")
        if prop is not None:
            predicate = IRI(_expand_uri(prop, vocab_base, prefix_map))
            content = node.attrs.get("content")
            value = content if content is not None else _first_child_text(node)
            datatype = node.attrs.get("datatype")
            if datatype is not None:
                obj = Literal(value, datatype=datatype)
            else:
                lang = node.attrs.get("xml:lang")
                obj = Literal(value, lang=lang) if lang is not None else Literal(value)
            triples.append((subject, predicate, obj))

        rel = node.attrs.get("rel")
        if rel is not None:
            href = node.attrs.get("href")
            if href is not None:
                triples.append(
                    (subject, IRI(_expand_uri(rel, vocab_base, prefix_map)), IRI(href))
                )

        rev = node.attrs.get("rev")
        if rev is not None:
            href = node.attrs.get("href")
            if href is not None:
                triples.append(
                    (IRI(href), IRI(_expand_uri(rev, vocab_base, prefix_map)), subject)
                )

        for child in node.children:
            if isinstance(child, _Node):
                traverse(child, subject, vocab_base)

    traverse(root, IRI(document_uri), "")
    return triples


def extract_text(html: str) -> str:
    """HTML → visible text: all non-whitespace text nodes in document
    order joined with single spaces.  The per-row invariant column
    (``BASELINE.json`` input_hint: byte-identical text per url)."""
    root = parse_html(html)
    parts: list[str] = []

    def walk(node: _Node) -> None:
        for child in node.children:
            if isinstance(child, str):
                stripped = child.strip()
                if stripped:
                    parts.append(stripped)
            else:
                walk(child)

    walk(root)
    return " ".join(parts)


# ---------------------------------------------------------------------------
# Ray Data batch stages (stateless map_batches UDFs)
# ---------------------------------------------------------------------------


def extract_rdfa_batch(
    batch: pa.Table,
    html_column: str = "html",
    url_column: str = "url",
    salt: str = "",
    on_error: str = "skip",
) -> pa.Table:
    """pages batch → flattened triples batch (flagship stage S4).

    Malformed pages are quarantined (skipped) rather than failing the
    task — poison-page pattern, SURVEY.md §4; the reference precedent is
    parse errors streaming to errChan without aborting sibling sources
    (rdf/rdf.go:414-420).
    """
    htmls = batch[html_column].to_pylist()
    urls = batch[url_column].to_pylist()
    rows: list[tuple[Term, Term, Term]] = []
    row_urls: list[str] = []
    for html, url in zip(htmls, urls):
        if isinstance(html, bytes):
            html = html.decode("utf-8", errors="replace")
        try:
            triples = extract_rdfa(html, url, salt)
        except Exception:
            if on_error == "raise":
                raise
            continue
        rows.extend(triples)
        row_urls.extend([url] * len(triples))
    table = triples_to_table(rows, urls=row_urls, with_hash=False)
    return append_subject_hash(table)


def extract_text_batch(
    batch: pa.Table, html_column: str = "html", out_column: str = "extracted_text"
) -> pa.Table:
    htmls = batch[html_column].to_pylist()
    texts = [
        extract_text(h.decode("utf-8", errors="replace") if isinstance(h, bytes) else h)
        for h in htmls
    ]
    return batch.append_column(out_column, pa.array(texts, pa.string()))

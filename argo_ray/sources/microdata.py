"""HTML5 microdata extractor (itemscope / itemtype / itemid /
itemprop) → argo triples — the second web-annotation syntax next to
the RDFa extractor (``rdfa.py``, reference
``/root/reference/rdfaparser/rdfaparser.go``; the reference supports
RDFa only, microdata is the breadth extension a Common-Crawl KG build
needs since schema.org microdata outnumbers RDFa in the wild).

Mapping (the standard microdata-to-RDF translation, simplified to the
subset the extractor grammar supports):

- ``itemscope`` opens an item: subject = ``itemid`` IRI when present,
  else a skolemized blank node (same ``anon+md5(url#n)[:16]``
  convention as the RDFa extractor, so graph equality is
  deterministic).
- ``itemtype`` asserts ``rdf:type``.
- ``itemprop`` on a non-itemscope tag asserts a property whose value
  is, in priority order: the ``content`` attribute, the ``href``
  attribute (an IRI object), else the immediately following text node
  (plain literal).  Property names are used as given when absolute
  (contain ``:``), else resolved against the enclosing item's type
  namespace (everything up to the last ``/``).
- ``itemprop`` + ``itemscope`` on one tag links parent → child item.

The tag scanner is one compiled-regex pass (no per-char Python);
nesting is tracked with an explicit stack.  Poison bytes follow the
repo-wide quarantine contract: a page that fails to decode or parse
contributes nothing and never raises (``on_error="skip"``).
"""

from __future__ import annotations

import hashlib
import re

import pyarrow as pa

from ..terms import (
    KIND_BLANK,
    KIND_IRI,
    KIND_LITERAL,
    Term,
    append_subject_hash,
    triples_to_table,
)

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"

_TAG_RE = re.compile(r"<(/?)([a-zA-Z][a-zA-Z0-9]*)((?:[^>\"]|\"[^\"]*\")*)>")
_ATTR_RE = re.compile(r"([a-zA-Z-]+)(?:\s*=\s*\"([^\"]*)\")?")
_VOID_TAGS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)


def _skolem(url: str, counter: int, salt: str = "") -> str:
    digest = hashlib.md5(f"{salt}{url}#md{counter}".encode()).hexdigest()
    return "mdanon" + digest[:16]


def _resolve_prop(name: str, type_iri: str) -> str:
    if ":" in name:
        return name
    base = type_iri.rsplit("/", 1)[0] + "/" if "/" in type_iri else type_iri
    return base + name


def extract_microdata(html: str, url: str, salt: str = "") -> list[tuple]:
    """One page → list of (subj, pred, obj) Term triples."""
    triples: list[tuple] = []
    # stack of (tag, item) — item is the Term subject for itemscope
    # tags, None otherwise; pending text-valued prop: (subj, prop_iri)
    stack: list[tuple[str, Term | None, str]] = []  # (tag, item, type_iri)
    anon = 0
    pending: tuple[Term, str] | None = None
    pos = 0
    for m in _TAG_RE.finditer(html):
        if pending is not None:
            text = html[pos : m.start()]
            subj, prop = pending
            triples.append((subj, Term(KIND_IRI, prop), Term(KIND_LITERAL, text)))
            pending = None
        closing, tag, attr_src = m.group(1), m.group(2).lower(), m.group(3)
        pos = m.end()
        if closing:
            for i in range(len(stack) - 1, -1, -1):
                if stack[i][0] == tag:
                    del stack[i:]
                    break
            continue
        attrs = {
            k.lower(): (v if v is not None else "")
            for k, v in _ATTR_RE.findall(attr_src)
        }
        self_closing = tag in _VOID_TAGS or attr_src.rstrip().endswith("/")
        item: Term | None = None
        type_iri = ""
        cur_item, cur_type = None, ""
        for t, it, ty in reversed(stack):
            if it is not None:
                cur_item, cur_type = it, ty
                break
        if "itemscope" in attrs:
            itemid = attrs.get("itemid", "")
            if itemid:
                item = Term(KIND_IRI, itemid)
            else:
                # skolemized blank node, same convention as the RDFa
                # extractor (KIND_BLANK + deterministic md5 id)
                item = Term(KIND_BLANK, _skolem(url, anon, salt))
                anon += 1
            type_iri = attrs.get("itemtype", "")
            if type_iri:
                triples.append(
                    (item, Term(KIND_IRI, RDF_TYPE), Term(KIND_IRI, type_iri))
                )
            prop = attrs.get("itemprop", "")
            if prop and cur_item is not None:
                triples.append(
                    (cur_item, Term(KIND_IRI, _resolve_prop(prop, cur_type)), item)
                )
        elif "itemprop" in attrs and cur_item is not None:
            prop_iri = _resolve_prop(attrs["itemprop"], cur_type)
            if "content" in attrs:
                triples.append(
                    (
                        cur_item,
                        Term(KIND_IRI, prop_iri),
                        Term(KIND_LITERAL, attrs["content"]),
                    )
                )
            elif "href" in attrs:
                triples.append(
                    (cur_item, Term(KIND_IRI, prop_iri), Term(KIND_IRI, attrs["href"]))
                )
            else:
                pending = (cur_item, prop_iri)
        if not self_closing:
            stack.append((tag, item, type_iri))
    return triples


def extract_microdata_batch(
    batch: pa.Table,
    html_column: str = "html",
    url_column: str = "url",
    salt: str = "",
    on_error: str = "skip",
) -> pa.Table:
    """pages batch → flattened triples batch (microdata twin of
    ``extract_rdfa_batch``, same quarantine contract)."""
    htmls = batch[html_column].to_pylist()
    urls = batch[url_column].to_pylist()
    rows: list[tuple] = []
    row_urls: list[str] = []
    for raw, url in zip(htmls, urls):
        try:
            if raw is None:
                continue
            html = raw.decode("utf-8") if isinstance(raw, (bytes, bytearray)) else raw
            triples = extract_microdata(html, url or "", salt=salt)
        except Exception:
            if on_error == "raise":
                raise
            continue
        rows.extend(triples)
        row_urls.extend([url] * len(triples))
    table = triples_to_table(rows, urls=row_urls, with_hash=False)
    return append_subject_hash(table)

"""RDF container & collection encode/decode (operator M11).

Containers: array ↔ ``rdf:_1, rdf:_2, …`` membership triples
(``/root/reference/graph.go:86-99`` encode; decode ``graph.go:233-252``
— note the reference decoder starts probing at ``rdf:_0`` while the
encoder starts at ``rdf:_1``, a latent off-by-one that makes its own
round-trip empty; we use 1-based on both sides).

Lists: array ↔ ``rdf:first``/``rdf:rest``/``rdf:nil`` cons cells with
an ``rdf:type rdf:List`` on every cell (``graph.go:103-126`` encode,
``graph.go:255-271`` decode).  Cons-cell blank nodes are skolemized
(deterministic) instead of ``NewAnonNode()``'s random ids.
"""

from __future__ import annotations

import pyarrow as pa

from ..sources.rdfa import skolem_id
from ..terms import (
    A,
    IRI,
    RDF_FIRST,
    RDF_NIL,
    RDF_NS,
    RDF_REST,
    Blank,
    Term,
    append_subject_hash,
    triples_to_table,
)

RDF_LIST = RDF_NS + "List"


def encode_container(subject: Term, items: list[Term]) -> list[tuple]:
    """array → (subject, rdf:_N, item) triples, N starting at 1."""
    return [
        (subject, IRI(RDF_NS + f"_{i}"), item) for i, item in enumerate(items, start=1)
    ]


def encode_list(subject: Term, items: list[Term], list_key: str = "") -> list[tuple]:
    """array → cons-cell chain rooted at ``subject``.

    ``list_key`` seeds the deterministic skolem ids of the interior
    cells (use e.g. the source url + column name).
    """
    if not items:
        return []
    triples: list[tuple] = []
    node = subject
    for i, item in enumerate(items):
        triples.append((node, A, IRI(RDF_LIST)))
        triples.append((node, IRI(RDF_FIRST), item))
        if i + 1 < len(items):
            nxt = Blank(skolem_id(list_key or "list", i + 1))
            triples.append((node, IRI(RDF_REST), nxt))
            node = nxt
        else:
            triples.append((node, IRI(RDF_REST), IRI(RDF_NIL)))
    return triples


def _index(triples: list[tuple]) -> dict[Term, dict[Term, list[Term]]]:
    idx: dict[Term, dict[Term, list[Term]]] = {}
    for s, p, o in triples:
        idx.setdefault(s, {}).setdefault(p, []).append(o)
    return idx


def decode_container(triples: list[tuple], root: Term) -> list[Term]:
    """(root, rdf:_N, item) triples → ordered array (per-subject group
    walk, 1-based)."""
    idx = _index(triples).get(root, {})
    out = []
    i = 1
    while True:
        objs = idx.get(IRI(RDF_NS + f"_{i}"))
        if not objs:
            return out
        out.append(objs[0])
        i += 1


def decode_list(triples: list[tuple], root: Term) -> list[Term]:
    """cons chain → ordered array (graph.go:255-271 walk)."""
    idx = _index(triples)
    out = []
    node = root
    while True:
        props = idx.get(node, {})
        first = props.get(IRI(RDF_FIRST))
        if not first:
            return out
        out.append(first[0])
        rest = props.get(IRI(RDF_REST))
        if not rest or rest[0] == IRI(RDF_NIL):
            return out
        node = rest[0]


def encode_containers_batch(
    batch: pa.Table,
    subject_fn,
    items_fn,
    url_column: str | None = None,
) -> pa.Table:
    """``flat_map``-shaped ``map_batches`` UDF: one row → its container
    membership triples.  ``subject_fn(row_dict) -> Term`` and
    ``items_fn(row_dict) -> list[Term]`` define the mapping."""
    rows = batch.to_pylist()
    triples: list[tuple] = []
    urls: list[str] = []
    for row in rows:
        subject = subject_fn(row)
        ts = encode_container(subject, items_fn(row))
        triples.extend(ts)
        urls.extend([row.get(url_column, "") if url_column else ""] * len(ts))
    return append_subject_hash(
        triples_to_table(triples, urls=urls if url_column else None, with_hash=False)
    )

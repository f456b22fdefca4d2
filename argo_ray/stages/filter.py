"""Triple-pattern filtering (operators M1/M2/M3).

Reimplements the reference's ``Store.Filter(s, p, o)`` wildcard match
(interface ``/root/reference/argo.go:57-60``, list scan
``liststore.go:80-104``, indexed dispatch ``indexstore.go:149-258``) as
vectorized predicates over the flattened term columns.  The reference's
SPO/SP/S index fast paths correspond to predicate pushdown on
``subject_hash`` / Parquet row groups here — no resident index.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..terms import Term


def term_predicate(table: pa.Table, pos: str, term: Term | None):
    """Boolean mask for one position; ``None`` = wildcard (don't care).

    Equality semantics are the reference's Term.Equal: kind + value
    (+ lang + datatype for literals) — term.go:54-60,113-136,159-165.
    """
    if term is None:
        return None
    mask = pc.and_(
        pc.equal(table[f"{pos}_kind"], pa.scalar(term.kind, pa.uint8())),
        pc.equal(
            pc.cast(table[f"{pos}_value"], pa.large_string()),
            pa.scalar(term.value, pa.large_string()),
        ),
    )
    mask = pc.and_(mask, pc.equal(table[f"{pos}_lang"], term.lang))
    mask = pc.and_(mask, pc.equal(table[f"{pos}_datatype"], term.datatype))
    return mask


def filter_batch(
    batch: pa.Table,
    s: Term | None = None,
    p: Term | None = None,
    o: Term | None = None,
) -> pa.Table:
    """``map_batches`` UDF: keep rows matching the (s, p, o) pattern."""
    mask = None
    for pos, term in (("subj", s), ("pred", p), ("obj", o)):
        m = term_predicate(batch, pos, term)
        if m is not None:
            mask = m if mask is None else pc.and_(mask, m)
    return batch if mask is None else batch.filter(mask)


def filter_triples(ds, s: Term | None = None, p: Term | None = None, o: Term | None = None):
    """Dataset-level Filter / FilterSubset (graph.go:178-182): a derived
    Dataset of the matching triples (lazy, streaming)."""
    return ds.map_batches(
        lambda b: filter_batch(b, s, p, o), batch_format="pyarrow"
    )


def has_subject(ds, s: Term) -> bool:
    """Graph.HasSubject (graph.go:224-229)."""
    return filter_triples(ds, s=s).limit(1).count() > 0


def get_first_object(ds, s: Term, p: Term):
    """Graph.Get point lookup (graph.go:185-208): first object for
    (s, p), or None.  Small-result driver-side helper."""
    matches = get_all_objects(ds, s, p, limit=1)
    return matches[0] if matches else None


def get_all_objects(ds, s: Term, p: Term, limit: int | None = None) -> list[Term]:
    """Graph.GetAll (graph.go:210-218) — all objects for (s, p).

    Note: the reference's GetAll compares by *pointer* equality — a
    latent bug (SURVEY.md M3); we use value equality like Graph.Get.
    """
    out = filter_triples(ds, s=s, p=p)
    if limit is not None:
        out = out.limit(limit)
    rows = out.take_all()
    # build Terms straight from the row dicts: the rows may carry extra
    # columns (e.g. the uint64 __row_hash) that from_pylist would choke on
    return [
        Term(r["obj_kind"], r["obj_value"], r["obj_lang"], r["obj_datatype"])
        for r in rows
    ]

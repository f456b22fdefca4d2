"""Turtle serializer (operator K4) — grouping serializer.

Reimplements ``/root/reference/turtleserializer.go:11-82``: an
``@prefix p: <base> .`` header from the prefix map (uri → prefix), then
per subject a block::

    <subject>
      pred obj ;
      ...
      .

Resources compact to qnames via ``SplitPrefix`` + the prefix map, else
``<uri>``; literals/bnodes render in their canonical N-Triples form
(turtleserializer.go:18-37).  The reference groups by the *encoded*
subject string (:39-42); here the group key is ``subject_hash`` of the
canonical form — identical partitioning semantics.
"""

from __future__ import annotations

import re

import pandas as pd
import pyarrow as pa

from ..stages.canon import split_prefix
from ..terms import KIND_IRI, Term, render_term

# the local part must stay inside the parser's qname token grammar
# (sources/turtle.py _TOKEN_RE) or the emitted document is invalid
# Turtle — e.g. '%' or spaces in the local name (code-review r2)
_QNAME_LOCAL_RE = re.compile(r"[\w./#-]*\Z")


def encode_term(kind: int, value: str, lang: str, datatype: str, prefixes: dict[str, str]) -> str:
    """turtleserializer.go:18-37 (+ qname-validity fallback to <uri>)."""
    if kind == KIND_IRI:
        base, local = split_prefix(value)
        prefix = prefixes.get(base)
        if prefix is not None and _QNAME_LOCAL_RE.match(local):
            return f"{prefix}:{local}"
        return f"<{value}>"
    return render_term(Term(kind, value, lang, datatype))


def turtle_header(prefixes: dict[str, str]) -> str:
    return (
        "".join(f"@prefix {p}: <{base}> .\n" for base, p in prefixes.items()) + "\n"
    )


def render_turtle_block(group: pd.DataFrame, prefixes: dict[str, str]) -> str:
    rows = group.to_dict("records")
    first = rows[0]
    subj = encode_term(
        first["subj_kind"], first["subj_value"], first["subj_lang"],
        first["subj_datatype"], prefixes,
    )
    out = [subj, "\n"]
    for r in rows:
        p = encode_term(r["pred_kind"], r["pred_value"], r["pred_lang"], r["pred_datatype"], prefixes)
        o = encode_term(r["obj_kind"], r["obj_value"], r["obj_lang"], r["obj_datatype"], prefixes)
        out.append(f"  {p} {o} ;\n")
    out.append("  .\n\n")
    return "".join(out)


def serialize_turtle(table: pa.Table, prefixes: dict[str, str] | None = None) -> str:
    """Small-graph helper: whole table → one Turtle document string."""
    prefixes = prefixes or {}
    df = table.to_pandas()
    blocks = [
        render_turtle_block(g, prefixes)
        for _, g in df.groupby(["subj_kind", "subj_value"], sort=True)
    ]
    return turtle_header(prefixes) + "".join(blocks)


class TurtleBlockRenderer:
    """``map_groups`` renderer for the subject shuffle; prefix map is a
    plain broadcast dict captured in the callable (tiny, read-only)."""

    def __init__(self, prefixes: dict[str, str] | None = None):
        self.prefixes = prefixes or {}

    def __call__(self, group: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"block": [render_turtle_block(group, self.prefixes)]})


class TurtleFileWriter:
    def __init__(self, out_dir: str, prefixes: dict[str, str] | None = None):
        import os

        self.out_dir = out_dir
        self.prefixes = prefixes or {}
        os.makedirs(out_dir, exist_ok=True)

    def __call__(self, batch: pa.Table) -> pa.Table:
        import hashlib
        import os

        if "block" not in batch.column_names or batch.num_rows == 0:
            # zero-column/empty block from an empty sort partition
            # (grouped renderers can't synthesize their output schema)
            return pa.table({"path": pa.array([], pa.string()),
                             "rows": pa.array([], pa.int64())})
        blocks = batch["block"].to_pylist()
        payload = turtle_header(self.prefixes) + "".join(blocks)
        name = hashlib.md5(payload.encode()).hexdigest()[:16]
        path = os.path.join(self.out_dir, f"part-{name}.ttl")
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            f.write(payload)
        os.replace(tmp, path)
        return pa.table({"path": pa.array([path]), "rows": pa.array([len(blocks)], pa.int64())})


def write_turtle(ds, out_dir: str, prefixes: dict[str, str] | None = None, num_salts: int = 0):
    """Triples Dataset → Turtle part files via the subject shuffle; pass
    ``num_salts`` to spread hot subjects (repeated subject blocks remain
    valid Turtle, SURVEY.md §2.6 A1)."""
    from ..stages.materialize import group_by_subject

    blocks = group_by_subject(ds, TurtleBlockRenderer(prefixes), num_salts=num_salts)
    return (
        blocks.map_batches(TurtleFileWriter(out_dir, prefixes), batch_format="pyarrow")
        .materialize()
        .to_pandas()
    )

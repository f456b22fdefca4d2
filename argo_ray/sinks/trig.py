"""TriG serializer — named-graph Turtle (the quad twin of K4,
cf. ``sinks/turtle.py``; no reference counterpart, argo is
triples-only).  One ``<graph> { ... }`` section per named graph, each
section rendered with the Turtle subject-block rules
(``/root/reference/turtleserializer.go:11-82`` semantics via
``render_turtle_block``); default-graph rows (empty graph value) emit
as bare top-level blocks, as the TriG grammar allows.
"""

from __future__ import annotations

import pyarrow as pa

from ..terms import KIND_BLANK
from .turtle import render_turtle_block, turtle_header


def serialize_trig(
    table: pa.Table,
    prefixes: dict[str, str] | None = None,
    graph_column: str = "graph_value",
    graph_kind_column: str = "graph_kind",
) -> str:
    """Whole table (12 term columns + graph columns) → one TriG doc."""
    prefixes = prefixes or {}
    df = table.to_pandas()
    if graph_kind_column not in df.columns:
        df[graph_kind_column] = 0
    out = [turtle_header(prefixes)]
    for (gk, gv), gdf in sorted(
        df.groupby([graph_kind_column, graph_column], sort=True),
        key=lambda kv: (kv[0][1] != "", kv[0]),  # default graph first
    ):
        blocks = [
            render_turtle_block(g, prefixes)
            for _, g in gdf.groupby(["subj_kind", "subj_value"], sort=True)
        ]
        if gv == "":
            out.extend(blocks)
        else:
            label = f"_:{gv}" if gk == KIND_BLANK else f"<{gv}>"
            out.append(label + " {\n")
            out.extend(blocks)
            out.append("}\n\n")
    return "".join(out)

"""Temporal KG fusion: crawl-recency conflict resolution.

A multi-crawl corpus asserts the same subject's facts at different
observation times; when a FUNCTIONAL property's value changes between
crawls, the newest observation wins.  Multi-valued properties (a hub
cites thousands of entities) must NOT collapse — recency fusion keys
on (subject, predicate) ONLY for predicates declared functional, and
plain triple-dedup handles the rest.

Plan shape: the functional-predicate set is schema-bounded (a TBox
list, broadcast by closure capture); the stream splits on it
vectorized, the functional side resolves per-(s, p) argmax-ts inside
sort-colocated blocks (``grouped_map`` — one exchange keyed by the
subject|predicate pair), the multi-valued side is the skew-proof
triple-hash dedup.  Nothing driver-side, no joins.

Reference parity: the reference engine has no temporal model
(graph.go's store is a point-in-time set); this is the web-scale
extension a continuously-recrawled KG needs.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..terms import TRIPLE_COLUMNS


def latest_functional_fusion(triples_ds, ts_col: str, functional_preds):
    """``triples_ds`` must carry the flattened triple columns plus an
    int64 observation timestamp ``ts_col``.  Returns the fused triple
    Dataset (TRIPLE_COLUMNS only): for functional predicates the
    newest observation per (subject, predicate) survives (ties break
    to the largest object value — deterministic), everything else is
    the distinct triple set."""
    import pandas as pd

    from .grouping import grouped_map
    from .materialize import dedup_exact

    fset = pa.array(sorted(set(functional_preds)), pa.large_string())

    def is_func(b: pa.Table):
        return pc.is_in(pc.cast(b["pred_value"], pa.large_string()), value_set=fset)

    func_rows = triples_ds.map_batches(
        lambda b: b.filter(is_func(b)), batch_format="pyarrow"
    )
    multi_rows = triples_ds.map_batches(
        lambda b: b.filter(pc.invert(is_func(b))).select(TRIPLE_COLUMNS),
        batch_format="pyarrow",
    )

    def key_rows(b: pa.Table) -> pa.Table:
        key = pc.binary_join_element_wise(
            pc.cast(b["subj_kind"], pa.large_string()),
            pc.cast(b["subj_value"], pa.large_string()),
            pc.cast(b["pred_value"], pa.large_string()),
            pa.scalar("\x1f", pa.large_string()),
        )
        return b.append_column("_sp", pc.cast(key, pa.string()))

    def newest(g: pd.DataFrame) -> pd.DataFrame:
        # grouped_map hands ONE (s, p) group per call; the tie-break
        # covers EVERY object facet so equal-ts conflicts (e.g. "X"@en
        # vs "X"@de) resolve identically regardless of block order
        g = g.sort_values(
            [ts_col, "obj_value", "obj_lang", "obj_datatype", "obj_kind"],
            ascending=False,
            kind="mergesort",
        )
        return g.head(1)[TRIPLE_COLUMNS]

    # pin one schema so the pandas-derived fused blocks and the
    # Arrow-native multi-valued blocks union cleanly
    from ..terms import cast_triple_schema as norm

    fused_func = grouped_map(
        func_rows.map_batches(key_rows, batch_format="pyarrow"), "_sp", newest
    )
    return dedup_exact(
        fused_func.map_batches(norm, batch_format="pyarrow").union(
            multi_rows.map_batches(norm, batch_format="pyarrow")
        )
    )

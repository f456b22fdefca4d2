"""Distributed prefix sum and LLM sequence packing.

``running_total`` is a two-pass distributed cumulative sum — the
primitive behind concat-and-chunk sample packing, global row numbering
and byte-offset assignment.  Scale shape: ONE sort exchange, then a
per-block partial-sum pass whose manifest (one row per block) is the
only thing the driver sees; block offsets broadcast back into a final
vectorized pass.  No step moves more than (blocks) rows through the
driver, so the operator is as scalable as the sort itself.

``pack_sequences`` derives the standard LLM-pretraining concatenate-
then-chunk packing from it: documents are laid end-to-end in a
deterministic order and each document is assigned the fixed-size token
window its start offset falls in (boundaries do NOT reset per
document, matching the usual pretraining data layout).  DuckDB oracle:
``SUM(...) OVER (ORDER BY ... ROWS BETWEEN UNBOUNDED PRECEDING AND 1
PRECEDING) // budget``.

The per-block offset keying relies on the same sorted co-location
contract as ``stages/grouping.py`` (equal sort keys never straddle a
block boundary); ``order_col`` must be unique per row — duplicate
block minima raise rather than mis-assign.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def running_total(ds, order_col: str, value_col: str, out_col: str = "running_total"):
    """Append ``out_col`` = inclusive cumulative sum of ``value_col``
    in ``order_col`` order.  Returns the sorted Dataset with the new
    column; ``order_col`` values must be unique."""
    from ..io import configure_context

    configure_context()
    ds = ds.sort(order_col).materialize()  # pin block boundaries

    def block_stats(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"_min_order": batch[order_col],
                             "_sum": pa.array([], pa.int64())})
        # native-typed min: the driver sort below must use the same
        # ordering the distributed sort used (NOT a lexical cast)
        key = pc.min(batch[order_col])
        total = int(pc.sum(pc.cast(batch[value_col], pa.int64())).as_py() or 0)
        return pa.table({"_min_order": pa.array([key.as_py()], batch[order_col].type),
                         "_sum": pa.array([total], pa.int64())})

    # one row per block — small by construction
    stats = ds.map_batches(
        block_stats, batch_format="pyarrow", batch_size=None
    ).take_all()
    stats.sort(key=lambda r: r["_min_order"])
    offsets: dict[str, int] = {}
    acc = 0
    for r in stats:
        if r["_min_order"] in offsets:
            raise ValueError(
                f"duplicate {order_col!r} across blocks: {r['_min_order']!r}"
            )
        offsets[r["_min_order"]] = acc
        acc += r["_sum"]

    def add_cumsum(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column(out_col, pa.array([], pa.int64()))
        key = pc.min(batch[order_col]).as_py()
        vals = np.asarray(
            pc.cast(batch[value_col], pa.int64()).combine_chunks(),
            dtype=np.int64,
        )
        cums = np.cumsum(vals) + offsets[key]
        return batch.append_column(out_col, pa.array(cums, pa.int64()))

    return ds.map_batches(add_cumsum, batch_format="pyarrow", batch_size=None)


def pack_sequences(
    ds,
    order_col: str,
    token_col: str,
    budget: int,
    out_col: str = "seq_id",
):
    """Concat-and-chunk packing: documents laid end-to-end in
    ``order_col`` order; each document gets the id of the
    ``budget``-token window its start offset falls in.  One sort + two
    vectorized passes (see module docstring)."""
    if budget <= 0:
        raise ValueError("budget must be positive")
    out = running_total(ds, order_col, token_col, out_col="_cum")

    def assign(batch: pa.Table) -> pa.Table:
        cum = np.asarray(
            pc.cast(batch["_cum"], pa.int64()).combine_chunks(), dtype=np.int64
        )
        vals = np.asarray(
            pc.cast(batch[token_col], pa.int64()).combine_chunks(),
            dtype=np.int64,
        )
        start = cum - vals
        seq = start // budget
        return batch.drop_columns(["_cum"]).append_column(
            out_col, pa.array(seq, pa.int64())
        )

    return out.map_batches(assign, batch_format="pyarrow")

"""Distributed graph analytics over the extracted KG — iterative
link-analysis operators every knowledge-graph build wants on top of the
triple set (reference precedent: the store's Filter/group machinery
exposes the graph, `/root/reference/rdf/store.go`, but has no analytics
layer; these are the Ray-native extension).

Scale shape (the canonical distributed power-iteration plan):
- the edge list is a Dataset and NEVER leaves the object store;
- per iteration: ONE hash join (ranks → edges on src, the same
  ``Dataset.join`` machinery as near-dup label propagation,
  ``dedup.py``) + ONE groupby-sum — both bounded by |E| exchange, no
  driver materialization;
- static per-edge state (out-degree) is joined ONCE before the loop and
  the joined edge table is materialized, so each iteration re-reads
  cached blocks instead of re-executing the upstream extraction;
- ranks are a (node, rank) Dataset, only COUNT(nodes) crosses the
  driver.

Convention: the "simple" PageRank power iteration

    rank_{t+1}(v) = (1-d)/N + d * sum_{u -> v} rank_t(u) / outdeg(u)

without dangling-mass redistribution — dangling nodes (no out-edges)
absorb; the total mass is NOT conserved.  Deterministic and exactly
mirrored by the DuckDB oracle's nested per-iteration CTEs.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def pagerank(
    edges_ds,
    iters: int = 5,
    damping: float = 0.85,
):
    """PageRank over a directed edge Dataset with string columns
    ``(src, dst)`` (caller supplies DISTINCT edges).  Returns a
    ``(node, rank)`` Dataset after ``iters`` power iterations from the
    uniform 1/N start."""
    from ray.data.aggregate import Count, Sum

    edges_ds = edges_ds.materialize()

    # node universe: src ∪ dst, distinct — one shuffle, reused as the
    # per-iteration zero-contribution floor so no left-outer join is
    # needed (union + groupby keeps every node present every round)
    def _both_ends(b: pa.Table) -> pa.Table:
        return pa.concat_tables(
            [
                pa.table({"node": pc.cast(b["src"], pa.string())}),
                pa.table({"node": pc.cast(b["dst"], pa.string())}),
            ]
        )

    nodes = (
        edges_ds.map_batches(_both_ends, batch_format="pyarrow")
        .groupby("node")
        .aggregate(Count(alias_name="_n"))  # distinct via groupby
        .select_columns(["node"])
        .materialize()
    )
    n_nodes = nodes.count()
    if n_nodes == 0:
        return nodes.map_batches(
            lambda b: pa.table(
                {"node": pa.array([], pa.string()), "rank": pa.array([], pa.float64())}
            ),
            batch_format="pyarrow",
        )

    # NO Dataset.join anywhere: in this Ray version a hash join's (and a
    # hash aggregate's) EMPTY output partitions forward schema-less
    # blocks, and a downstream join's finalize rejects them with
    # "No match ... FieldRef" whenever num_partitions exceeds the key
    # count (small inputs, or skewed tails at scale).  The rank scatter
    # instead uses the repo's sort-colocation pattern (grouping.py):
    # union rank rows with edge rows, ONE sort by src per iteration,
    # then a vectorized in-block pandas merge — the same all-to-all
    # exchange class as the hash join, none of its empty-partition
    # fragility.
    from ..stages import grouping as _colocation_guard  # noqa: F401

    edge_schema = pa.schema(
        [
            ("src", pa.string()),
            ("dst", pa.string()),
            ("odeg", pa.float64()),
            ("rank", pa.float64()),
        ]
    )

    def _add_odeg(df):
        # (src, dst, odeg, rank=null): rank is the union slot the
        # per-iteration rank rows fill; returned as an ARROW table with
        # a pinned schema so the union with the Arrow rank rows never
        # mixes block types or nullability-inferred column types
        if len(df) == 0:
            return edge_schema.empty_table()
        df = df.copy()
        df["odeg"] = (
            df.groupby("src", sort=False)["src"].transform("size").astype("float64")
        )
        df["rank"] = float("nan")
        return pa.Table.from_pandas(
            df[["src", "dst", "odeg", "rank"]],
            schema=edge_schema,
            preserve_index=False,
        )

    edges_w = (
        edges_ds.sort("src")
        .map_batches(_add_odeg, batch_format="pandas", batch_size=None)
        .materialize()
    )

    base = (1.0 - damping) / n_nodes
    ranks = nodes.map_batches(
        lambda b: pa.table(
            {
                "node": pc.cast(b["node"], pa.string()),
                "rank": pa.array([1.0 / n_nodes] * b.num_rows, pa.float64()),
            }
        ),
        batch_format="pyarrow",
    ).materialize()

    zero_rows = nodes.map_batches(
        lambda b: pa.table(
            {
                "node": pc.cast(b["node"], pa.string()),
                "part": pa.array([0.0] * b.num_rows, pa.float64()),
            }
        ),
        batch_format="pyarrow",
    ).materialize()

    part_schema = pa.schema([("node", pa.string()), ("part", pa.float64())])

    def _scatter(df):
        # one sorted block = whole src groups (sort-colocation
        # contract): broadcast each src's rank onto its out-edges
        if len(df) == 0 or "src" not in df.columns:
            return part_schema.empty_table()
        is_rank = df["dst"].isna()
        r = df.loc[is_rank, ["src", "rank"]]
        e = df.loc[~is_rank, ["src", "dst", "odeg"]]
        if len(r) == 0 or len(e) == 0:
            return part_schema.empty_table()
        m = e.merge(r, on="src", how="inner")
        return pa.table(
            {
                "node": pa.array(m["dst"], pa.string()),
                "part": pa.array(
                    (m["rank"] / m["odeg"]).to_numpy(dtype="float64"),
                    pa.float64(),
                ),
            }
        )

    for _ in range(iters):
        rank_rows = ranks.map_batches(
            lambda b: pa.table(
                {
                    "src": pc.cast(b["node"], pa.string()),
                    "dst": pa.array([None] * b.num_rows, pa.string()),
                    "odeg": pa.array([None] * b.num_rows, pa.float64()),
                    "rank": pc.cast(b["rank"], pa.float64()),
                }
            ),
            batch_format="pyarrow",
        )
        contribs = (
            edges_w.union(rank_rows)
            .sort("src")
            .map_batches(_scatter, batch_format="pandas", batch_size=None)
        )
        ranks = (
            contribs.union(zero_rows)
            .groupby("node")
            .aggregate(Sum("part", alias_name="insum"))
            .map_batches(
                lambda b: pa.table(
                    {
                        "node": pc.cast(b["node"], pa.string()),
                        "rank": pc.add(
                            pa.scalar(base, pa.float64()),
                            pc.multiply(
                                pa.scalar(damping, pa.float64()),
                                pc.cast(b["insum"], pa.float64()),
                            ),
                        ),
                    }
                ),
                batch_format="pyarrow",
            )
            .materialize()
        )
    return ranks

"""Broadcast (map-side) inner join — the no-shuffle join for small
sides.

``Dataset.join`` is a full hash exchange of BOTH sides; when one side
fits in worker memory (dimension tables, entity catalogs, lookup maps)
the scale-correct plan is to ship it ONCE per actor (``ray.put`` handle
resolved in ``__init__``) and stream the big side through a vectorized
per-batch merge — zero movement of the large input.  Same broadcast
pattern as :class:`argo_ray.stages.link.EntityLinker` (reference
precedent T2: the MySQL store's per-process dictionary caches,
``mysqlstore/mysqlstore.go:64-108``), generalized to arbitrary keys.
"""

from __future__ import annotations

import pyarrow as pa


class _BroadcastJoiner:
    """Actor: resolves the broadcast table once, merges per batch."""

    def __init__(self, small_ref, on: list[str]):
        import ray

        small = small_ref if isinstance(small_ref, pa.Table) else ray.get(small_ref)
        self.small = small.to_pandas()
        self.on = on

    def __call__(self, batch: pa.Table) -> pa.Table:
        df = batch.to_pandas().merge(self.small, on=self.on, how="inner")
        return pa.Table.from_pandas(df, preserve_index=False)


def broadcast_join(ds, small, on, concurrency: int | None = None):
    """Inner-join ``ds`` (large, streamed) against ``small`` (a
    ``pa.Table`` or a small Dataset, collected once on the driver and
    broadcast via ``ray.put``) on column list ``on``.

    Use when the small side fits in worker memory; otherwise use
    ``Dataset.join`` (both sides shuffled).  The big side's blocks
    never move — this is the join that stays cheap at 100 TB.
    ``concurrency`` defaults to ~CPUs/4 (capped 8, floor 1): the pool
    scales with the cluster yet leaves slots for upstream read tasks
    (reservation is disabled engine-wide — see io.configure_context).
    """
    import ray

    if concurrency is None:
        try:
            cpus = int(ray.cluster_resources().get("CPU", 8))
        except Exception:
            cpus = 8
        concurrency = max(1, min(8, cpus // 4))
    on = [on] if isinstance(on, str) else list(on)
    if not isinstance(small, pa.Table):
        # Dataset → one Arrow table (bounded: the small side by contract)
        small = pa.concat_tables(ray.get(small.to_arrow_refs()))
    ref = ray.put(small)
    return ds.map_batches(
        _BroadcastJoiner,
        batch_format="pyarrow",
        concurrency=concurrency,
        fn_constructor_kwargs={"small_ref": ref, "on": on},
    )

"""Shared table readers with scale-aware block splitting.

At production scale (many files / many row groups) ``read_parquet``
already yields one block per fragment and we leave its native splits
alone — overriding the global block count there would be harmful.
The driver's testdata, however, is a single one-row-group file per
table, which reads as ONE block and serialises every downstream
``map_batches`` chain.  When (and only when) the input has fewer row
groups than the per-node parallelism target we ask Ray to split the
read into ``~2 × cluster CPUs`` blocks so the stateless stages fan out.
"""

from __future__ import annotations

import pyarrow.parquet as pq

_CONFIGURED = False


def configure_context() -> None:
    """Engine-wide Ray Data execution config (idempotent).

    ``op_resource_reservation_enabled=False``: the streaming executor's
    default resource reservation holds back ~half the CPU slots from a
    map stage whenever an all-to-all (sort/shuffle) is downstream —
    measured 2.1× end-to-end slowdown on the flagship pipeline (map
    stage ran 16 tasks at effective concurrency 3 on 8 CPUs).  Our
    pipelines pre-combine before every shuffle, blocks are bounded
    (~50 MB), and the object store spills, so the starvation scenario
    the reservation guards against does not apply.

    Flip side: with reservation off, CHAINED actor pools must be sized
    so pools + upstream tasks fit the session CPU count (two
    concurrency=2 pools on a 4-CPU session deadlock the read stage) —
    keep one pool per pipeline, or size pools at concurrency ≤
    cpus/2 - 1.
    """
    global _CONFIGURED
    if _CONFIGURED:
        return
    try:
        from ray.data import DataContext

        DataContext.get_current().op_resource_reservation_enabled = False
        _CONFIGURED = True
    except Exception:  # pragma: no cover
        pass


def target_blocks(default: int = 16) -> int:
    """2 blocks per cluster CPU (streaming executor keeps all cores busy
    without oversizing task overhead)."""
    try:
        import ray

        if ray.is_initialized():
            return max(default, int(ray.cluster_resources().get("CPU", 8)) * 2)
    except Exception:
        pass
    return default


def shuffle_partitions() -> int:
    """Partition count for hash-join / label-propagation exchanges,
    derived from the live cluster instead of a hardcoded constant:
    ~CPUs/4 (each hash-shuffle partition is an actor; keeping pools well
    inside the CPU budget avoids the chained-pool deadlock described in
    :func:`configure_context`), floor 2, cap 32 per node-equivalent.  On
    a real multi-node cluster the CPU count scales with nodes, so this
    grows with the cluster automatically."""
    try:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    except Exception:
        cpus = 8
    return max(2, min(32, cpus // 4))


def read_table(
    sf_dir: str, name: str, columns: list[str] | None = None, filter_expr=None
):
    """``read_parquet`` of one table, split into enough blocks to
    parallelize (see module docstring).  ``columns`` prunes at the read
    so only needed columns leave storage; ``filter_expr`` (a
    ``pyarrow.dataset`` expression) pushes row filtering into the scan
    so row groups whose statistics exclude the predicate never leave
    storage at all.

    Layouts: ``{sf_dir}/{name}.parquet`` (single file — the driver's
    testdata) or ``{sf_dir}/{name}/`` (directory of shards — the
    production 100 TB layout; shards already give one block per
    fragment, so no override is applied there).
    """
    import os

    import ray.data as rd

    configure_context()
    path = f"{sf_dir}/{name}.parquet"
    if not os.path.exists(path) and os.path.isdir(f"{sf_dir}/{name}"):
        path = f"{sf_dir}/{name}"
    kwargs: dict = {}
    if columns is not None:
        kwargs["columns"] = list(columns)
    if filter_expr is not None:
        kwargs["filter"] = filter_expr
    if not os.path.isdir(path):
        tgt = target_blocks()
        try:
            meta = pq.ParquetFile(path).metadata
            # floor of ~256 rows/block: splitting finer than that trades
            # useful parallelism for per-task dispatch overhead
            tgt = min(tgt, max(1, meta.num_rows // 256))
            if meta.num_row_groups < tgt:
                kwargs["override_num_blocks"] = tgt
        except Exception:
            pass  # non-local path (s3://...) — trust native fragment splits
    return rd.read_parquet(path, **kwargs)

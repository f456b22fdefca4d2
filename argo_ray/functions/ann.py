"""Approximate-nearest-neighbor / embedding similarity operators.

- Brute-force cosine top-k: the baseline — query matrix broadcast once
  via ``ray.put``, each batch does one float64 matmul against it
  (vectorized, zero Python-per-row work), partial top-k per batch, final
  exact top-k in a small driver-side reduce over ≤ batches×k rows.
- LSH-bucketed variant: random-hyperplane signs bucket the corpus; only
  same-bucket candidates are scored — the scale path when the corpus is
  too large for full scans.
- Embedding near-dup: same-label cosine pairs above a threshold
  (partitioned all-pairs via groupby(label)).

float64 everywhere so results match DuckDB's ``list_cosine_similarity``
(double) bit-for-bit at comparison granularity.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _to_matrix(col) -> np.ndarray:
    lists = col.to_pylist()
    return np.asarray(lists, dtype=np.float64)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


def _require_query_rows(found_ids, query_ids) -> None:
    """Every ANN entry point fails the same way on an unknown query id:
    a ValueError naming the missing ids (instead of a per-function mix
    of silent drops and KeyErrors)."""
    missing = sorted(set(int(q) for q in query_ids) - set(int(i) for i in found_ids))
    if missing:
        raise ValueError(f"query_ids not present in the corpus: {missing}")


class CosineTopK:
    """Actor-pool stage: per-batch cosine scores against the broadcast
    query matrix → partial (query_id, vec_id, score) top-k rows.

    Queries are shipped once per actor (``ray.get`` in ``__init__`` of a
    ``ray.put`` handle), not once per batch.
    """

    def __init__(self, queries_ref, k: int = 10, exclude_self: bool = True):
        import ray

        qids, qmat = ray.get(queries_ref) if not isinstance(queries_ref, tuple) else queries_ref
        self.query_ids = np.asarray(qids, dtype=np.int64)
        self.q = _normalize(np.asarray(qmat, dtype=np.float64))  # (Q, d)
        self.k = k
        self.exclude_self = exclude_self

    def __call__(self, batch: pa.Table) -> pa.Table:
        vec_ids = np.asarray(batch["vec_id"].to_pylist(), dtype=np.int64)
        m = _normalize(_to_matrix(batch["embedding"]))  # (N, d)
        scores = self.q @ m.T  # (Q, N)
        if self.exclude_self:
            self_mask = self.query_ids[:, None] == vec_ids[None, :]
            scores = np.where(self_mask, -np.inf, scores)
        k = min(self.k, scores.shape[1])
        idx = np.argpartition(-scores, k - 1, axis=1)[:, :k]  # (Q, k)
        out_q, out_v, out_s = [], [], []
        for qi in range(scores.shape[0]):
            for j in idx[qi]:
                if np.isfinite(scores[qi, j]):
                    out_q.append(int(self.query_ids[qi]))
                    out_v.append(int(vec_ids[j]))
                    out_s.append(float(scores[qi, j]))
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_v, pa.int64()),
                "score": pa.array(out_s, pa.float64()),
            }
        )


def cosine_topk(embeddings_ds, query_ids: list[int], k: int = 10):
    """→ (query_id, rank, vec_id): exact top-k neighbors per query.

    Final reduce materializes only batches×k partial rows (small), never
    the corpus.  Rank ties break on (score desc, vec_id asc) — the same
    deterministic order the oracle uses.
    """
    import ray

    qtab = embeddings_ds.map_batches(
        lambda b: b.filter(pc.is_in(b["vec_id"], pa.array(query_ids))),
        batch_format="pyarrow",
    ).take_all()
    qids, qvecs = [], []
    for row in qtab:
        qids.append(row["vec_id"])
        qvecs.append(row["embedding"])
    _require_query_rows(qids, query_ids)
    order = np.argsort(qids)
    qids = [qids[i] for i in order]
    qvecs = [qvecs[i] for i in order]
    ref = ray.put((qids, np.asarray(qvecs, dtype=np.float64)))

    partials = embeddings_ds.map_batches(
        CosineTopK, batch_format="pyarrow", concurrency=2,
        fn_constructor_kwargs={"queries_ref": ref, "k": k},
    )
    df = partials.to_pandas()  # ≤ batches × Q × k rows
    df = df.sort_values(["query_id", "score", "vec_id"], ascending=[True, False, True])
    df["rank"] = df.groupby("query_id").cumcount() + 1
    df = df[df["rank"] <= k]
    return pa.Table.from_pandas(
        df[["query_id", "rank", "vec_id"]].astype("int64"), preserve_index=False
    )


def embedding_neardup_pairs(
    embeddings_ds, threshold: float = 0.9, shards: int | None = None
):
    """Same-label all-pairs cosine above threshold → (vec_a, vec_b).
    Partitioned by (label, shard pair): ``explode_shard_pairs`` salts a
    hot label so its O(n²) matmul distributes over ~shards²/2 blocks
    (same pair set for any ``shards``)."""
    from ..functions.dedup import explode_shard_pairs
    from ..io import shuffle_partitions
    from ..stages.grouping import grouped_map

    if shards is None:
        shards = min(8, shuffle_partitions())

    ds = embeddings_ds.map_batches(
        lambda b: explode_shard_pairs(b, "vec_id", shards), batch_format="pyarrow"
    )

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        sa, sb = int(g["_sa"].iloc[0]), int(g["_sb"].iloc[0])
        if sa == sb:
            ids = g["vec_id"].to_numpy(dtype=np.int64)
            order = np.argsort(ids)
            ids = ids[order]
            m = _normalize(
                np.asarray(list(g["embedding"].to_numpy()[order]), dtype=np.float64)
            )
            s = m @ m.T
            iu = np.triu_indices(len(ids), k=1)
            hits = s[iu] > threshold
            return pd.DataFrame(
                {
                    "vec_a": pd.Series(ids[iu[0][hits]], dtype="int64"),
                    "vec_b": pd.Series(ids[iu[1][hits]], dtype="int64"),
                }
            )
        left, right = g[g["_shard"] == sa], g[g["_shard"] == sb]
        if len(left) == 0 or len(right) == 0:
            return pd.DataFrame({"vec_a": pd.Series([], dtype="int64"),
                                 "vec_b": pd.Series([], dtype="int64")})
        ids_a = left["vec_id"].to_numpy(dtype=np.int64)
        ids_b = right["vec_id"].to_numpy(dtype=np.int64)
        ma = _normalize(np.asarray(list(left["embedding"].to_numpy()), dtype=np.float64))
        mb = _normalize(np.asarray(list(right["embedding"].to_numpy()), dtype=np.float64))
        s = ma @ mb.T  # (nl, nr)
        ia, ib = np.nonzero(s > threshold)
        lo = np.minimum(ids_a[ia], ids_b[ib])
        hi = np.maximum(ids_a[ia], ids_b[ib])
        return pd.DataFrame(
            {
                "vec_a": pd.Series(lo, dtype="int64"),
                "vec_b": pd.Series(hi, dtype="int64"),
            }
        )

    return grouped_map(ds, ["label", "_sa", "_sb"], per_group)


def _kmeans(sample: np.ndarray, nlist: int, iters: int, seed: int) -> np.ndarray:
    """Deterministic mini k-means on normalized vectors (the IVF coarse
    quantizer).  Init: evenly-spaced rows of the (vec_id-ordered)
    sample — reproducible across runs and nodes."""
    sample = _normalize(sample)
    idx = np.linspace(0, len(sample) - 1, nlist).astype(int)
    cent = sample[idx].copy()
    for _ in range(iters):
        assign = np.argmax(sample @ cent.T, axis=1)
        for c in range(nlist):
            members = sample[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
        cent = _normalize(cent)
    return cent


def ivf_topk(
    embeddings_ds,
    query_ids: list[int],
    k: int = 10,
    nlist: int = 16,
    nprobe: int = 4,
    train_size: int = 2048,
    iters: int = 5,
):
    """IVF ANN (the coarse-quantizer scale path, alternative to
    :func:`lsh_bucketed_topk`): k-means cells over a bounded training
    sample, each batch scored only against queries probing its cell.

    Distributed shape: centroids train on a driver-side sample (bounded:
    ``train_size`` rows), ship once via ``ray.put``; cell assignment and
    scoring are vectorized ``map_batches``; final reduce is the same
    bounded partial-top-k merge as exact search.  Approximate — recall
    governed by ``nprobe``/``nlist``.
    """
    import ray

    train = embeddings_ds.limit(train_size).take_all()
    train_m = np.asarray([r["embedding"] for r in train], dtype=np.float64)
    cent = _kmeans(train_m, nlist, iters, seed=0)

    qrows = embeddings_ds.map_batches(
        lambda b: b.filter(pc.is_in(b["vec_id"], pa.array(query_ids))),
        batch_format="pyarrow",
    ).take_all()
    qids = np.asarray([r["vec_id"] for r in qrows], dtype=np.int64)
    _require_query_rows(qids, query_ids)
    qm = _normalize(np.asarray([r["embedding"] for r in qrows], dtype=np.float64))
    order = np.argsort(qids)
    qids, qm = qids[order], qm[order]
    # per query: its nprobe nearest cells
    probe = np.argsort(-(qm @ cent.T), axis=1)[:, :nprobe]  # (Q, nprobe)
    ref = ray.put((qids, qm, cent, probe))

    def score(batch: pa.Table) -> pa.Table:
        qids_, qm_, cent_, probe_ = ray.get(ref) if not isinstance(ref, tuple) else ref
        vec_ids = np.asarray(batch["vec_id"].to_pylist(), dtype=np.int64)
        m = _normalize(_to_matrix(batch["embedding"]))
        cells = np.argmax(m @ cent_.T, axis=1)  # (N,)
        out_q, out_v, out_s = [], [], []
        scores = qm_ @ m.T  # (Q, N)
        in_probe = (probe_[:, :, None] == cells[None, None, :]).any(axis=1)  # (Q, N)
        self_mask = qids_[:, None] == vec_ids[None, :]
        valid = in_probe & ~self_mask
        for qi in range(len(qids_)):
            cand = np.nonzero(valid[qi])[0]
            if not len(cand):
                continue
            top = cand[np.argsort(-scores[qi, cand])[: k]]
            for j in top:
                out_q.append(int(qids_[qi]))
                out_v.append(int(vec_ids[j]))
                out_s.append(float(scores[qi, j]))
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_v, pa.int64()),
                "score": pa.array(out_s, pa.float64()),
            }
        )

    df = embeddings_ds.map_batches(score, batch_format="pyarrow").to_pandas()
    if df.empty:
        return pa.table(
            {
                "query_id": pa.array([], pa.int64()),
                "rank": pa.array([], pa.int64()),
                "vec_id": pa.array([], pa.int64()),
            }
        )
    df = df.sort_values(["query_id", "score", "vec_id"], ascending=[True, False, True])
    df["rank"] = df.groupby("query_id").cumcount() + 1
    df = df[df["rank"] <= k]
    return pa.Table.from_pandas(
        df[["query_id", "rank", "vec_id"]].astype("int64"), preserve_index=False
    )


class HyperplaneLSH:
    """Random-hyperplane signature stage (scale path for ANN): ``bits``
    sign bits → bucket id.  Hyperplanes derived from a fixed seed once
    per actor."""

    def __init__(self, dim: int = 64, bits: int = 12, seed: int = 7):
        rng = np.random.RandomState(seed)
        self.h = rng.standard_normal((dim, bits))

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _to_matrix(batch["embedding"])
        signs = (m @ self.h) > 0  # (N, bits)
        bucket = np.zeros(len(m), dtype=np.uint64)
        for j in range(signs.shape[1]):
            bucket |= signs[:, j].astype(np.uint64) << np.uint64(j)
        return batch.append_column("bucket", pa.array(bucket, pa.uint64()))


def lsh_bucketed_topk(embeddings_ds, query_ids: list[int], k: int = 10, bits: int = 8):
    """ANN scale path: bucket corpus and queries by hyperplane signature,
    score only within matching buckets.  Approximate — recall depends on
    bits; returns the same (query_id, rank, vec_id) layout."""
    import ray

    bucketed = embeddings_ds.map_batches(
        HyperplaneLSH, batch_format="pyarrow", concurrency=2,
        fn_constructor_kwargs={"bits": bits},
    )
    qrows = bucketed.map_batches(
        lambda b: b.filter(pc.is_in(b["vec_id"], pa.array(query_ids))),
        batch_format="pyarrow",
    ).take_all()
    _require_query_rows([r["vec_id"] for r in qrows], query_ids)
    by_bucket: dict[int, list] = {}
    for row in qrows:
        by_bucket.setdefault(row["bucket"], []).append(
            (row["vec_id"], row["embedding"])
        )
    # Pre-normalized per-bucket query matrices: one matmul per
    # (bucket-run × batch) below instead of a Python loop per corpus row.
    groups_built = {
        bkt: (
            np.asarray([qid for qid, _ in items], dtype=np.int64),
            _normalize(np.asarray([vec for _, vec in items], dtype=np.float64)),
        )
        for bkt, items in by_bucket.items()
    }
    ref = ray.put(groups_built)

    def score(batch: pa.Table) -> pa.Table:
        groups = ray.get(ref) if not isinstance(ref, dict) else ref
        vec_ids = np.asarray(batch["vec_id"].to_pylist(), dtype=np.int64)
        buckets = np.asarray(batch["bucket"].to_pylist(), dtype=np.uint64)
        m = _normalize(_to_matrix(batch["embedding"]))
        # Sort rows by bucket → contiguous runs → one (Q_b, n_b) matmul per run.
        order = np.argsort(buckets, kind="stable")
        sb = buckets[order]
        starts = np.flatnonzero(np.r_[True, sb[1:] != sb[:-1]]) if len(sb) else np.array([], dtype=np.int64)
        ends = np.r_[starts[1:], len(sb)] if len(starts) else np.array([], dtype=np.int64)
        out_q, out_v, out_s = [], [], []
        for s, e in zip(starts, ends):
            g = groups.get(int(sb[s]))  # same-bucket queries only
            if g is None:
                continue
            qids, qmat = g
            idx = order[s:e]
            scores = qmat @ m[idx].T  # (Q_b, n_b)
            vb = vec_ids[idx]
            qq = np.repeat(qids, len(idx))
            vv = np.tile(vb, len(qids))
            keep = qq != vv  # drop self-matches
            out_q.append(qq[keep])
            out_v.append(vv[keep])
            out_s.append(scores.ravel()[keep])
        cat = (lambda parts, dt: np.concatenate(parts) if parts else np.array([], dtype=dt))
        return pa.table(
            {
                "query_id": pa.array(cat(out_q, np.int64), pa.int64()),
                "vec_id": pa.array(cat(out_v, np.int64), pa.int64()),
                "score": pa.array(cat(out_s, np.float64), pa.float64()),
            }
        )

    df = bucketed.map_batches(score, batch_format="pyarrow").to_pandas()
    if df.empty:
        return pa.table(
            {
                "query_id": pa.array([], pa.int64()),
                "rank": pa.array([], pa.int64()),
                "vec_id": pa.array([], pa.int64()),
            }
        )
    df = df.sort_values(["query_id", "score", "vec_id"], ascending=[True, False, True])
    df["rank"] = df.groupby("query_id").cumcount() + 1
    df = df[df["rank"] <= k]
    return pa.Table.from_pandas(
        df[["query_id", "rank", "vec_id"]].astype("int64"), preserve_index=False
    )


def kmeans_clusters(
    embeddings_ds, k: int = 4, iters: int = 5, train_size: int = 2048
):
    """Distributed k-means (spherical Lloyd's) over the embedding
    column: ``(vec_id, cluster)`` assignments plus the final centroids
    and objective.

    Scale shape (the canonical distributed-Lloyd plan):
    - init: deterministic :func:`_kmeans` on a BOUNDED driver sample
      (``train_size`` rows) — same init every run, every cluster size;
    - each iteration: centroids ship once via ``ray.put``; every batch
      does ONE matmul assign + per-cell partial (sum-vector, count,
      sim-sum) — the combiner, so the driver reduce sees
      batches × k × d floats, never the corpus;
    - assignments are a final stateless pass (never materialized
      driver-side).

    Returns ``(assign_ds, centroids, objective_per_iter)``.
    """
    import ray

    # the loop re-consumes this Dataset iters+1 times; without
    # materializing, each pass would re-execute the whole upstream
    # lineage (parquet read + any transforms) from scratch.  The cached
    # blocks are one (vec_id, embedding) projection — object-store
    # resident, spillable, never driver-side.
    embeddings_ds = embeddings_ds.materialize()
    train = embeddings_ds.limit(train_size).take_all()
    cent = _kmeans(
        np.asarray([r["embedding"] for r in train], dtype=np.float64),
        k,
        iters=1,
        seed=0,
    )
    objective = []
    for _ in range(iters):
        ref = ray.put(cent)

        def partials(batch: pa.Table, _ref=ref) -> pa.Table:
            c = ray.get(_ref)
            m = _normalize(_to_matrix(batch["embedding"]))
            sims = m @ c.T  # (N, k)
            assign = np.argmax(sims, axis=1)
            best = sims[np.arange(len(m)), assign]
            rows = {"cell": [], "n": [], "sim_sum": [], "vec_sum": []}
            for cell in range(len(c)):
                mask = assign == cell
                rows["cell"].append(cell)
                rows["n"].append(int(mask.sum()))
                rows["sim_sum"].append(float(best[mask].sum()))
                rows["vec_sum"].append(m[mask].sum(axis=0).tolist())
            return pa.table(
                {
                    "cell": pa.array(rows["cell"], pa.int64()),
                    "n": pa.array(rows["n"], pa.int64()),
                    "sim_sum": pa.array(rows["sim_sum"], pa.float64()),
                    "vec_sum": pa.array(
                        rows["vec_sum"], pa.list_(pa.float64())
                    ),
                }
            )

        parts = embeddings_ds.map_batches(partials, batch_format="pyarrow").take_all()
        d = cent.shape[1]
        sums = np.zeros((k, d)); counts = np.zeros(k); sim_total = 0.0
        for r in parts:
            sums[r["cell"]] += np.asarray(r["vec_sum"], dtype=np.float64)
            counts[r["cell"]] += r["n"]
            sim_total += r["sim_sum"]
        objective.append(sim_total)
        nonempty = counts > 0
        cent[nonempty] = sums[nonempty] / counts[nonempty, None]
        cent = _normalize(cent)

    final_ref = ray.put(cent)

    def assign_batch(batch: pa.Table) -> pa.Table:
        c = ray.get(final_ref)
        m = _normalize(_to_matrix(batch["embedding"]))
        assign = np.argmax(m @ c.T, axis=1)
        return pa.table(
            {
                "vec_id": pc.cast(batch["vec_id"], pa.int64()),
                "cluster": pa.array(assign, pa.int64()),
            }
        )

    assign_ds = embeddings_ds.map_batches(assign_batch, batch_format="pyarrow")
    return assign_ds, cent, objective


# ---------------------------------------------------------------------------
# SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic dedup inside
# embedding clusters — drop a vector when a smaller-id vector in the
# same cluster is closer than the cosine threshold.
# ---------------------------------------------------------------------------


def semdedup(embeddings_ds, threshold: float = 0.9, group_col: str = "label",
             shards: int | None = None):
    """Per-cluster semantic dedup: ``kept(v) = ¬∃ u : cluster(u) =
    cluster(v) ∧ id(u) < id(v) ∧ cos(u, v) > threshold`` (the
    one-pass, SQL-EXISTS-exact convention; the paper's greedy
    keep-one-per-ball differs only on chains and needs a sequential
    pass).  Returns ``(vec_id, cluster, kept)`` for every input row.

    ``group_col`` is the cluster assignment — any column: a k-means
    assignment (compose with :func:`kmeans_clusters`, pinned in tests),
    an LSH bucket, or a planted label.  Scale shape: within-cluster
    all-pairs distributes over ~shards²/2 independent blocks via
    :func:`argo_ray.functions.dedup.explode_shard_pairs` (hot clusters
    split), drop marks are id-only rows, and the final kept-vote is one
    groupby over ids — the embedding payload never re-shuffles."""
    from ray.data.aggregate import Max, Sum

    from ..functions.dedup import explode_shard_pairs
    from ..io import shuffle_partitions
    from ..stages.grouping import grouped_map

    if shards is None:
        shards = min(8, shuffle_partitions())

    sharded = embeddings_ds.map_batches(
        lambda b: explode_shard_pairs(b, "vec_id", shards), batch_format="pyarrow"
    )

    def drops(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "vec_id": pd.Series([], dtype="int64"),
                "cluster": pd.Series([], dtype="int64"),
                "drop": pd.Series([], dtype="int64"),
            }
        )
        sa, sb = int(g["_sa"].iloc[0]), int(g["_sb"].iloc[0])
        cluster = int(g[group_col].iloc[0])
        if sa == sb:
            ids = g["vec_id"].to_numpy(dtype=np.int64)
            order = np.argsort(ids)
            ids = ids[order]
            m = _normalize(
                np.asarray(list(g["embedding"].to_numpy()[order]), dtype=np.float64)
            )
            s = m @ m.T
            hit = np.triu(s > threshold, k=1).any(axis=0)  # col j: ∃ i<j
            dropped = ids[hit]
        else:
            left, right = g[g["_shard"] == sa], g[g["_shard"] == sb]
            if len(left) == 0 or len(right) == 0:
                return empty
            ids_a = left["vec_id"].to_numpy(dtype=np.int64)
            ids_b = right["vec_id"].to_numpy(dtype=np.int64)
            ma = _normalize(np.asarray(list(left["embedding"].to_numpy()), dtype=np.float64))
            mb = _normalize(np.asarray(list(right["embedding"].to_numpy()), dtype=np.float64))
            s = ma @ mb.T
            ia, ib = np.nonzero(s > threshold)
            dropped = np.maximum(ids_a[ia], ids_b[ib])  # larger id loses
        if len(dropped) == 0:
            return empty
        dropped = np.unique(dropped)
        return pd.DataFrame(
            {
                "vec_id": pd.Series(dropped, dtype="int64"),
                "cluster": pd.Series([cluster] * len(dropped), dtype="int64"),
                "drop": pd.Series([1] * len(dropped), dtype="int64"),
            }
        )

    marks = grouped_map(sharded, [group_col, "_sa", "_sb"], drops).map_batches(
        lambda b: pa.table(
            {
                "vec_id": pc.cast(b["vec_id"], pa.int64()),
                "cluster": pc.cast(b["cluster"], pa.int64()),
                "drop": pc.cast(b["drop"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
    ids = embeddings_ds.map_batches(
        lambda b: pa.table(
            {
                "vec_id": pc.cast(b["vec_id"], pa.int64()),
                "cluster": pc.cast(b[group_col], pa.int64()),
                "drop": pa.array([0] * b.num_rows, pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
    return (
        ids.union(marks)
        .groupby("vec_id")
        .aggregate(Max("cluster", alias_name="cluster"), Sum("drop", alias_name="_d"))
        .map_batches(
            lambda b: pa.table(
                {
                    "vec_id": pc.cast(b["vec_id"], pa.int64()),
                    "cluster": pc.cast(b["cluster"], pa.int64()),
                    "kept": pc.equal(pc.cast(b["_d"], pa.int64()), pa.scalar(0, pa.int64())),
                }
            ),
            batch_format="pyarrow",
        )
    )


def pq_topk(
    embeddings_ds,
    query_ids: list[int],
    k: int = 10,
    m: int = 8,
    ks: int = 16,
    shortlist: int = 50,
    train_size: int = 2048,
    kmeans_iters: int = 10,
):
    """Product-quantization ANN — the 100 TB memory path: vectors
    L2-normalize and encode to ``m`` uint8 codes (one ``ks``-codeword
    codebook per subspace, trained deterministically on a bounded
    driver sample), queries score by asymmetric distance (ADC: one
    ``m × ks`` inner-product lookup table per query, score = table
    gathers summed), the ADC top-``shortlist`` is then re-ranked with
    exact cosine — the standard shortlist-then-rerank design, so recall
    is set by the shortlist depth, not the code resolution.

    Scale shape: codebooks ship once via ``ray.put`` (m·ks·(d/m)
    floats); the scoring pass is per-batch (codes never materialize —
    encode + LUT-gather + per-batch top-``shortlist`` in one map); the
    rerank fetch touches only the |queries|·shortlist candidate rows
    (broadcast id set filter).  At 100 TB the codes table would be
    persisted once and reused per query batch; memory per vector is m
    bytes instead of 4·d.
    """
    import ray

    d_sub = None
    emb = embeddings_ds.materialize()  # reused: train sample + 2 passes

    train = emb.limit(train_size).take_all()
    X = _normalize(np.asarray([r["embedding"] for r in train], dtype=np.float64))
    d = X.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    d_sub = d // m
    codebooks = np.stack(
        [
            _kmeans(X[:, s * d_sub : (s + 1) * d_sub], ks, kmeans_iters, seed=7 + s)
            for s in range(m)
        ]
    )  # (m, ks, d_sub)

    qrows = {
        int(r["vec_id"]): np.asarray(r["embedding"], dtype=np.float64)
        for r in emb.map_batches(
            lambda b: b.filter(
                pc.is_in(
                    pc.cast(b["vec_id"], pa.int64()),
                    value_set=pa.array(query_ids, pa.int64()),
                )
            ),
            batch_format="pyarrow",
        ).take_all()
    }
    _require_query_rows(qrows.keys(), query_ids)
    Q = _normalize(np.stack([qrows[q] for q in query_ids]))  # (nq, d)
    # per-query ADC lookup tables: (nq, m, ks)
    luts = np.einsum(
        "qsd,skd->qsk",
        Q.reshape(len(query_ids), m, d_sub),
        codebooks,
    )
    cb_ref = ray.put(codebooks)
    lut_ref = ray.put(luts)

    def adc_partial(b: pa.Table) -> pa.Table:
        cb = ray.get(cb_ref) if not isinstance(cb_ref, np.ndarray) else cb_ref
        lut = ray.get(lut_ref) if not isinstance(lut_ref, np.ndarray) else lut_ref
        ids = np.asarray(b["vec_id"].to_pylist(), dtype=np.int64)
        V = _normalize(_to_matrix(b["embedding"])).reshape(len(ids), m, d_sub)
        # encode: argmax inner product per subspace (normalized corpus)
        codes = np.stack(
            [np.argmax(V[:, s, :] @ cb[s].T, axis=1) for s in range(m)], axis=1
        )  # (n, m)
        out_q, out_v, out_s = [], [], []
        for qi, q in enumerate(query_ids):
            scores = np.zeros(len(ids))
            for s in range(m):
                scores += lut[qi, s, codes[:, s]]
            mask = ids != q
            order = np.argsort(-scores[mask], kind="stable")[:shortlist]
            cand = ids[mask][order]
            out_q.extend([q] * len(cand))
            out_v.extend(cand.tolist())
            out_s.extend(scores[mask][order].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_v, pa.int64()),
                "adc": pa.array(out_s, pa.float64()),
            }
        )

    partials = emb.map_batches(adc_partial, batch_format="pyarrow").take_all()
    short: dict[int, list[tuple[float, int]]] = {q: [] for q in query_ids}
    for r in partials:
        short[int(r["query_id"])].append((float(r["adc"]), int(r["vec_id"])))
    shortlists = {
        q: [v for _, v in sorted(rows, key=lambda t: (-t[0], t[1]))[:shortlist]]
        for q, rows in short.items()
    }

    # exact rerank: fetch only the shortlist vectors
    all_ids = sorted({v for vs in shortlists.values() for v in vs})
    fetched = {
        int(r["vec_id"]): np.asarray(r["embedding"], dtype=np.float64)
        for r in emb.map_batches(
            lambda b: b.filter(
                pc.is_in(
                    pc.cast(b["vec_id"], pa.int64()),
                    value_set=pa.array(all_ids, pa.int64()),
                )
            ),
            batch_format="pyarrow",
        ).take_all()
    }
    rows_q, rows_r, rows_v = [], [], []
    for qi, q in enumerate(query_ids):
        cand = shortlists[q]
        M = _normalize(np.stack([fetched[v] for v in cand]))
        sims = M @ Q[qi]
        order = sorted(range(len(cand)), key=lambda i: (-sims[i], cand[i]))[:k]
        for rank, i in enumerate(order, 1):
            rows_q.append(q)
            rows_r.append(rank)
            rows_v.append(cand[i])
    return pa.table(
        {
            "query_id": pa.array(rows_q, pa.int64()),
            "rank": pa.array(rows_r, pa.int64()),
            "vec_id": pa.array(rows_v, pa.int64()),
        }
    )


class _KnnGraphExact:
    """Actor-pool stage for the exact kNN graph: the (vec_id-sorted,
    normalized) corpus matrix ships once per actor via ``ray.put``;
    each batch of source rows is scored against the full corpus and
    emits its FINAL top-k rows directly — every row sees every
    candidate, so no cross-batch reduce is needed (zero shuffles).

    Ties break (score desc, dst_id asc): the corpus matrix is sorted by
    vec_id, so a STABLE argsort on -scores yields exactly that order.
    """

    def __init__(self, corpus_ref, k: int = 10):
        import ray

        ids, mat = (
            ray.get(corpus_ref) if not isinstance(corpus_ref, tuple) else corpus_ref
        )
        self.ids = np.asarray(ids, dtype=np.int64)  # sorted ascending
        self.mat = _normalize(np.asarray(mat, dtype=np.float64))  # (N, d)
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        src_ids = np.asarray(batch["vec_id"].to_pylist(), dtype=np.int64)
        m = _normalize(_to_matrix(batch["embedding"]))  # (B, d)
        scores = m @ self.mat.T  # (B, N)
        scores[src_ids[:, None] == self.ids[None, :]] = -np.inf
        k = min(self.k, scores.shape[1] - 1)
        order = np.argsort(-scores, axis=1, kind="stable")[:, :k]  # (B, k)
        B = len(src_ids)
        return pa.table(
            {
                "src_id": pa.array(np.repeat(src_ids, k), pa.int64()),
                "rank": pa.array(np.tile(np.arange(1, k + 1), B), pa.int64()),
                "dst_id": pa.array(self.ids[order].ravel(), pa.int64()),
            }
        )


def knn_graph(embeddings_ds, k: int = 10):
    """Exact cosine kNN graph → Dataset of (src_id, rank, dst_id).

    Every node is a query: the corpus matrix is collected once on the
    driver (bounded: N×d float64 — the BROADCAST-SIDE gate; at web
    scale where the corpus exceeds a worker heap, use
    :func:`knn_graph_ivf`, whose memory is per-cell), shipped once per
    actor, and the corpus is then STREAMED through the actor pool — one
    vectorized matmul per batch, per-row exact top-k inside the batch,
    zero shuffles, output is N×k narrow rows.
    """
    import ray

    rows = embeddings_ds.select_columns(["vec_id", "embedding"]).take_all()
    rows.sort(key=lambda r: r["vec_id"])
    ids = [r["vec_id"] for r in rows]
    mat = np.asarray([r["embedding"] for r in rows], dtype=np.float64)
    ref = ray.put((ids, mat))
    return embeddings_ds.map_batches(
        _KnnGraphExact,
        batch_format="pyarrow",
        concurrency=2,
        fn_constructor_kwargs={"corpus_ref": ref, "k": k},
    )


def knn_graph_ivf(
    embeddings_ds,
    k: int = 10,
    nlist: int = 16,
    nprobe: int = 4,
    train_size: int = 2048,
    iters: int = 5,
):
    """IVF-bucketed kNN graph (the 100 TB path): nothing is broadcast
    except the nlist×d centroid matrix.

    Plan: k-means centroids on a bounded sample → each vector explodes
    into ``nprobe`` QUERY-role rows (its nearest cells) plus one
    MEMBER-role row (its home cell) → ONE cell-keyed sort exchange →
    per-cell vectorized query×member matmul emitting per-source partial
    top-k → one (src)-keyed exchange picks the global top-k.  Data
    moved = (nprobe+1)× the corpus; per-task memory = one cell, never
    the corpus.  Approximate — recall governed by nprobe/nlist.
    """
    import ray

    from ..stages.grouping import grouped_map

    train = embeddings_ds.limit(train_size).take_all()
    train_m = np.asarray([r["embedding"] for r in train], dtype=np.float64)
    cent = _kmeans(train_m, nlist, iters, seed=0)
    cent_ref = ray.put(cent)

    def explode(batch: pa.Table) -> pa.Table:
        c = ray.get(cent_ref) if not isinstance(cent_ref, np.ndarray) else cent_ref
        vec_ids = np.asarray(batch["vec_id"].to_pylist(), dtype=np.int64)
        m = _normalize(_to_matrix(batch["embedding"]))
        sims = m @ c.T  # (B, nlist)
        probes = np.argsort(-sims, axis=1, kind="stable")[:, :nprobe]  # (B, nprobe)
        home = probes[:, 0]  # member role: the single nearest cell
        B = len(vec_ids)
        cells = np.concatenate([probes.ravel(), home])
        ids_out = np.concatenate([np.repeat(vec_ids, nprobe), vec_ids])
        roles = np.concatenate(
            [np.zeros(B * nprobe, dtype=np.int8), np.ones(B, dtype=np.int8)]
        )
        emb = batch["embedding"]
        emb_out = pa.concat_arrays(
            [
                emb.combine_chunks().take(
                    pa.array(np.repeat(np.arange(B), nprobe), pa.int64())
                ),
                emb.combine_chunks(),
            ]
        )
        return pa.table(
            {
                "cell": pa.array(cells, pa.int64()),
                "vec_id": pa.array(ids_out, pa.int64()),
                "role": pa.array(roles, pa.int8()),
                "embedding": emb_out,
            }
        )

    exploded = embeddings_ds.map_batches(explode, batch_format="pyarrow")

    def per_cell(g: pd.DataFrame) -> pd.DataFrame:
        q = g[g["role"] == 0]
        mm = g[g["role"] == 1]
        if q.empty or mm.empty:
            return pd.DataFrame({"src_id": [], "dst_id": [], "score": []})
        qids = q["vec_id"].to_numpy(dtype=np.int64)
        mids = mm["vec_id"].to_numpy(dtype=np.int64)
        qm = _normalize(np.asarray(list(q["embedding"]), dtype=np.float64))
        mmat = _normalize(np.asarray(list(mm["embedding"]), dtype=np.float64))
        # members sorted by id → stable argsort ties break on dst asc
        morder = np.argsort(mids, kind="stable")
        mids, mmat = mids[morder], mmat[morder]
        scores = qm @ mmat.T
        scores[qids[:, None] == mids[None, :]] = -np.inf
        kk = min(k, scores.shape[1])
        top = np.argsort(-scores, axis=1, kind="stable")[:, :kk]
        src, dst, sc = [], [], []
        for i in range(len(qids)):
            for j in top[i]:
                if np.isfinite(scores[i, j]):
                    src.append(int(qids[i]))
                    dst.append(int(mids[j]))
                    sc.append(float(scores[i, j]))
        return pd.DataFrame({"src_id": src, "dst_id": dst, "score": sc})

    partials = grouped_map(exploded, "cell", per_cell)

    def per_src(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["dst_id"]).sort_values(
            ["score", "dst_id"], ascending=[False, True]
        )
        out = g.head(k).copy()
        out["rank"] = np.arange(1, len(out) + 1)
        return out[["src_id", "rank", "dst_id"]]

    return grouped_map(partials, "src_id", per_src)


class _KnnLabelVote:
    """Actor-pool stage: exact k-nearest neighbors (same broadcast +
    stable-argsort plan as :class:`_KnnGraphExact`) followed by an
    in-actor majority vote over the neighbor labels — label prediction
    costs ZERO extra shuffles on top of the scoring matmul.  Vote ties
    break to the smallest label (``np.argmax`` returns the first
    maximum of the bincount)."""

    _OUT_SCHEMA = pa.schema([("vec_id", pa.int64()), ("pred_label", pa.int64())])

    def __init__(self, corpus_ref, k: int = 10):
        import ray

        ids, mat, labels = (
            ray.get(corpus_ref) if not isinstance(corpus_ref, tuple) else corpus_ref
        )
        self.ids = np.asarray(ids, dtype=np.int64)  # sorted ascending
        self.mat = _normalize(np.asarray(mat, dtype=np.float64))
        # vote in DENSE label space: np.unique sorts ascending, so the
        # first-max argmax still breaks ties to the SMALLEST label while
        # negative or sparse (e.g. 10^9) label ids stay O(#classes)
        raw = np.asarray(labels, dtype=np.int64)
        self.classes, self.labels = np.unique(raw, return_inverse=True)
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        src_ids = np.asarray(batch["vec_id"].to_pylist(), dtype=np.int64)
        m = _normalize(_to_matrix(batch["embedding"]))
        scores = m @ self.mat.T
        scores[src_ids[:, None] == self.ids[None, :]] = -np.inf
        k = min(self.k, scores.shape[1] - 1)
        if k <= 0:
            # no neighbor exists (single-vector corpus): no prediction,
            # matching the oracle's empty self-join
            return self._OUT_SCHEMA.empty_table()
        order = np.argsort(-scores, axis=1, kind="stable")[:, :k]  # (B, k)
        neigh_labels = self.labels[order]  # (B, k) dense class ranks
        nlab = len(self.classes)
        offs = neigh_labels + np.arange(len(src_ids))[:, None] * nlab
        counts = np.bincount(offs.ravel(), minlength=len(src_ids) * nlab)
        pred = counts.reshape(len(src_ids), nlab).argmax(axis=1)
        return pa.table(
            {
                "vec_id": pa.array(src_ids, pa.int64()),
                "pred_label": pa.array(self.classes[pred], pa.int64()),
            }
        )


class _TripletMiner:
    """Actor-pool stage: per labeled anchor, the HARDEST positive
    (same label, minimum cosine — the farthest in-class vector) and
    HARDEST negative (different label, maximum cosine — the closest
    impostor), the metric-learning pair selection (FaceNet-style
    batch-hard, globalized).  One matmul per batch against the
    broadcast corpus; ties break to the smallest vec_id on both
    sides."""

    _OUT_SCHEMA = pa.schema(
        [("vec_id", pa.int64()), ("pos_id", pa.int64()), ("neg_id", pa.int64())]
    )

    def __init__(self, corpus_ref):
        import ray

        ids, mat, labels = (
            ray.get(corpus_ref) if not isinstance(corpus_ref, tuple) else corpus_ref
        )
        self.ids = np.asarray(ids, dtype=np.int64)
        self.mat = _normalize(np.asarray(mat, dtype=np.float64))
        self.labels = np.asarray(labels, dtype=np.int64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.is_valid(batch["label"]))
        if batch.num_rows == 0:
            return self._OUT_SCHEMA.empty_table()
        src_ids = np.asarray(batch["vec_id"].to_pylist(), dtype=np.int64)
        src_lab = np.asarray(batch["label"].to_pylist(), dtype=np.int64)
        m = _normalize(_to_matrix(batch["embedding"]))
        scores = m @ self.mat.T  # (B, N)
        same = src_lab[:, None] == self.labels[None, :]
        self_m = src_ids[:, None] == self.ids[None, :]
        big = np.iinfo(np.int64).max

        # hardest positive: min score among same-label non-self
        pmask = same & ~self_m
        ps = np.where(pmask, scores, np.inf)
        p_best = ps.min(axis=1)
        pos_id = np.where(
            ps == p_best[:, None], self.ids[None, :], big
        ).min(axis=1)

        # hardest negative: max score among different-label
        ns = np.where(~same, scores, -np.inf)
        n_best = ns.max(axis=1)
        neg_id = np.where(
            ns == n_best[:, None], self.ids[None, :], big
        ).min(axis=1)

        ok = np.isfinite(p_best) & np.isfinite(n_best)
        return pa.table(
            {
                "vec_id": pa.array(src_ids[ok], pa.int64()),
                "pos_id": pa.array(pos_id[ok], pa.int64()),
                "neg_id": pa.array(neg_id[ok], pa.int64()),
            }
        )


def triplet_mining(embeddings_ds):
    """Global hardest-positive / hardest-negative triplet mining over
    the labeled corpus → ``(vec_id, pos_id, neg_id)``.  Same broadcast
    gate as :func:`knn_graph` (labeled corpus in the object store,
    fetched once per actor); the streamed pass is one matmul + two
    masked argmin/argmax per batch, zero shuffles."""
    import ray

    rows = embeddings_ds.select_columns(["vec_id", "embedding", "label"]).take_all()
    rows = [r for r in rows if r["label"] is not None]
    if not rows:
        raise ValueError("triplet_mining: no labeled rows in the corpus")
    rows.sort(key=lambda r: r["vec_id"])
    ref = ray.put(
        (
            [r["vec_id"] for r in rows],
            np.asarray([r["embedding"] for r in rows], dtype=np.float64),
            [int(r["label"]) for r in rows],
        )
    )
    return embeddings_ds.map_batches(
        _TripletMiner,
        batch_format="pyarrow",
        concurrency=2,
        fn_constructor_kwargs={"corpus_ref": ref},
    )


def knn_label_predict(embeddings_ds, k: int = 10):
    """kNN majority-vote label prediction over the corpus → Dataset of
    ``(vec_id, pred_label)`` — the weak-supervision bootstrap (label a
    corpus from its nearest labeled neighbors).  Same broadcast-side
    gate as :func:`knn_graph`; the vote happens inside the scoring
    actor, so the whole prediction is one streamed pass."""
    import ray

    rows = embeddings_ds.select_columns(["vec_id", "embedding", "label"]).take_all()
    # null labels can't vote: the corpus is the LABELED subset (every
    # row is still predicted FOR — the weak-supervision shape)
    rows = [r for r in rows if r["label"] is not None]
    if not rows:
        raise ValueError("knn_label_predict: no labeled rows in the corpus")
    rows.sort(key=lambda r: r["vec_id"])
    ids = [r["vec_id"] for r in rows]
    mat = np.asarray([r["embedding"] for r in rows], dtype=np.float64)
    labels = [int(r["label"]) for r in rows]
    ref = ray.put((ids, mat, labels))
    return embeddings_ds.map_batches(
        _KnnLabelVote,
        batch_format="pyarrow",
        concurrency=2,
        fn_constructor_kwargs={"corpus_ref": ref, "k": k},
    )

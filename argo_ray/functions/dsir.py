"""DSIR-style importance weighting (Xie et al. 2023, "Data Selection
for Language Models via Importance Resampling"): score every document
by how much more likely its hashed-feature profile is under a TARGET
slice's unigram bucket model than under the raw corpus model —
``logw(doc) = Σ_b n_doc[b] · (ln p_target[b] − ln p_raw[b])`` with
Laplace-smoothed bucket probabilities.  Documents with high logw look
like the target domain; resampling by weight is a downstream sampler.

Scale shape:
- the corpus is MATERIALIZED once and the per-doc bucket counts are
  computed in ONE hashing pass, reused by both the raw model and the
  scoring pass (a doc is one row, so its counts never shuffle); the
  target slice filters the cached corpus blocks and hashes only its
  subset — one corpus read, 1+|target|/|corpus| hash passes total;
- the two bucket MODELS are each one ``groupby(bucket).sum`` whose
  result is ``n_buckets`` rows — the only driver-side state, O(64),
  independent of corpus size;
- scoring reduces the cached count blocks with the 64-float log-ratio
  table captured in the UDF closure (broadcast once per worker by
  Ray's pickling, never per batch).
"""

from __future__ import annotations

import math
from typing import Callable

import numpy as np
import pyarrow as pa

from .text import feature_hash_batch

_OUT_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("n_features", pa.int64()),
        ("logw", pa.float64()),
    ]
)


def _bucket_totals(counts_ds, n_buckets: int) -> np.ndarray:
    """Σ n per hash bucket over a (doc_id, bucket, n) Dataset → dense
    int64[n_buckets] (zero-filled)."""
    from ray.data.aggregate import Sum

    rows = (
        counts_ds.groupby("bucket")
        .aggregate(Sum("n", alias_name="total"))
        .take_all()
    )  # bounded: at most n_buckets rows
    out = np.zeros(n_buckets, dtype=np.int64)
    for r in rows:
        out[int(r["bucket"])] = int(r["total"])
    return out


def dsir_logweights(
    docs_ds,
    target_filter: Callable[[pa.Table], pa.Table],
    n_buckets: int = 64,
):
    """(doc_id, n_features, logw) per document of ``docs_ds``, scored
    against the model fitted on the ``target_filter``-selected slice vs
    the one fitted on the whole corpus.  ``target_filter`` is a
    batch→batch predicate applied to the cached corpus blocks (so the
    corpus parquet is read exactly once).  logw is rounded to 4
    decimals — ln differs by ulps between libm and DuckDB, and rounding
    after the ≤n_buckets-term dot product absorbs it."""
    docs_ds = docs_ds.materialize()
    counts = docs_ds.map_batches(
        lambda b, _k=n_buckets: feature_hash_batch(b, n_buckets=_k),
        batch_format="pyarrow",
    ).materialize()
    target_counts = docs_ds.map_batches(target_filter, batch_format="pyarrow").map_batches(
        lambda b, _k=n_buckets: feature_hash_batch(b, n_buckets=_k),
        batch_format="pyarrow",
    )

    t = _bucket_totals(target_counts, n_buckets)
    r = _bucket_totals(counts, n_buckets)
    t_tot, r_tot = int(t.sum()), int(r.sum())
    # Laplace-smoothed log ratio per bucket, computed ONCE driver-side
    ratio = np.array(
        [
            math.log((int(t[b]) + 1) / (t_tot + n_buckets))
            - math.log((int(r[b]) + 1) / (r_tot + n_buckets))
            for b in range(n_buckets)
        ],
        dtype=np.float64,
    )

    def score(cb: pa.Table) -> pa.Table:
        doc = cb["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(doc) == 0:  # empty block: starts would be [0] on an
            return _OUT_SCHEMA.empty_table()  # empty doc_s → IndexError
        bkt = cb["bucket"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = cb["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        # a doc's count rows all live in this block (they were emitted
        # by one feature_hash_batch call) → local reduce is exact.
        # np.lexsort groups docs; contributions are added in bucket
        # order within each doc via reduceat.
        order = np.lexsort((bkt, doc))
        doc_s, bkt_s, n_s = doc[order], bkt[order], n[order]
        starts = np.flatnonzero(np.r_[True, doc_s[1:] != doc_s[:-1]])
        contrib = n_s.astype(np.float64) * ratio[bkt_s]
        sums = np.add.reduceat(contrib, starts)
        n_feat = np.add.reduceat(n_s, starts)
        return pa.table(
            {
                "doc_id": pa.array(doc_s[starts], pa.int64()),
                "n_features": pa.array(n_feat.astype(np.int64), pa.int64()),
                "logw": pa.array(np.round(sums, 4), pa.float64()),
            }
        )

    return counts.map_batches(score, batch_format="pyarrow")

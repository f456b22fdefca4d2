"""DSIR-style importance weighting (Xie et al. 2023, "Data Selection
for Language Models via Importance Resampling"): score every document
by how much more likely its hashed-feature profile is under a TARGET
slice's unigram bucket model than under the raw corpus model —
``logw(doc) = Σ_b n_doc[b] · (ln p_target[b] − ln p_raw[b])`` with
Laplace-smoothed bucket probabilities.  Documents with high logw look
like the target domain; resampling by weight is a downstream sampler.

Scale shape:
- per-doc bucket counts reuse :func:`argo_ray.functions.text.
  feature_hash_batch` (md5 keying → DuckDB-reproducible), one stateless
  ``map_batches`` — a doc is one row, so the counts never shuffle;
- the two bucket MODELS are each one ``groupby(bucket).sum`` whose
  result is ``n_buckets`` rows — the only driver-side state, O(64),
  independent of corpus size;
- scoring is a second stateless pass with the 64-float log-ratio table
  captured in the UDF closure (broadcast once per worker by Ray's
  pickling, never per batch).
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .text import feature_hash_batch


def _bucket_totals(docs_ds, n_buckets: int) -> np.ndarray:
    """Σ token count per hash bucket over a docs Dataset → dense
    int64[n_buckets] (zero-filled)."""
    from ray.data.aggregate import Sum

    rows = (
        docs_ds.map_batches(
            lambda b, _k=n_buckets: feature_hash_batch(b, n_buckets=_k),
            batch_format="pyarrow",
        )
        .groupby("bucket")
        .aggregate(Sum("n", alias_name="total"))
        .take_all()
    )  # bounded: at most n_buckets rows
    out = np.zeros(n_buckets, dtype=np.int64)
    for r in rows:
        out[int(r["bucket"])] = int(r["total"])
    return out


def dsir_logweights(docs_ds, target_ds, n_buckets: int = 64):
    """(doc_id, n_features, logw) per document of ``docs_ds``, scored
    against the model fitted on ``target_ds`` vs the one fitted on
    ``docs_ds`` itself.  logw is rounded to 4 decimals — ln differs by
    ulps between libm and DuckDB, and rounding after the ≤n_buckets-term
    dot product absorbs it."""
    t = _bucket_totals(target_ds, n_buckets)
    r = _bucket_totals(docs_ds, n_buckets)
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

    def score(batch: pa.Table) -> pa.Table:
        counts = feature_hash_batch(batch, n_buckets=n_buckets)
        doc = counts["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        bkt = counts["bucket"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = counts["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        # docs are whole rows of this batch → local reduce is exact.
        # np.unique sorts doc ids; contributions are added in bucket
        # order within each doc via the grouped cumulative trick.
        order = np.lexsort((bkt, doc))
        doc_s, bkt_s, n_s = doc[order], bkt[order], n[order]
        starts = np.flatnonzero(np.r_[True, doc_s[1:] != doc_s[:-1]])
        contrib = n_s.astype(np.float64) * ratio[bkt_s]
        sums = np.add.reduceat(contrib, starts) if len(contrib) else np.array([])
        n_feat = np.add.reduceat(n_s, starts) if len(n_s) else np.array([], np.int64)
        return pa.table(
            {
                "doc_id": pa.array(doc_s[starts], pa.int64()),
                "n_features": pa.array(n_feat.astype(np.int64), pa.int64()),
                "logw": pa.array(np.round(sums, 4), pa.float64()),
            }
        )

    return docs_ds.map_batches(score, batch_format="pyarrow")

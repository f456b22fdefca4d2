"""Mergeable cardinality sketches: HyperLogLog distinct counting as a
per-batch combiner — the approximate sibling of
:func:`argo_ray.stages.windows.distinct_users_per_type` for when the
exact pair exchange is too wide (billions of distinct keys).

Design (the classic HLL plan, Flajolet et al. 2007):
- per batch: ONE vectorized md5-derived 64-bit hash pass over the key
  column, register index = top ``p`` bits, rho = leading-zero run of
  the rest; per (group, register) partial max — a batch contributes at
  most ``groups × 2^p`` rows to the exchange, independent of row count;
- merge: groupby((group, register)).max — register-wise max IS the
  sketch union, so the plan is embarrassingly mergeable across any
  partitioning (the property that makes the sketch work at 100 TB);
- estimate: driver-side harmonic mean over the (tiny) final register
  table, with the standard small-range linear-counting correction.

Hashing is md5-derived (value → first 8 md5 bytes), so estimates are
bit-deterministic across runs, platforms and cluster sizes — which is
what lets the driver gate (relative error vs exact) be an oracle check
rather than a flaky tolerance.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# module-level bind, NOT a lazy import inside _hash64: these functions
# run inside worker-side UDFs, where a runtime `from .text import …`
# raises ModuleNotFoundError (workers get this module by cloudpickle
# value, not via sys.path — see argo_ray/__init__.py)
from .text import _token_hashes


def _hash64(values: list[str]) -> np.ndarray:
    """Deterministic 64-bit hash per value — the canonical md5-derived
    hashing (:func:`argo_ray.functions.text._token_hashes` ``"md5"``
    mode), so the HLL/CMS DuckDB-parity claim and SimHash share one
    bit-exact implementation."""
    return _token_hashes(list(values), "md5")


def _rho(w: np.ndarray, bits: int) -> np.ndarray:
    """1 + leading-zero count of the low ``bits`` bits of ``w`` (left
    aligned), vectorized; w == 0 → bits + 1."""
    rho = np.ones(len(w), dtype=np.int64)
    w = w.copy()
    done = (w >> np.uint64(63)) == 1  # leading 1 found → rho fixed
    for _ in range(bits):
        if done.all():
            break
        rho[~done] += 1
        w = w << np.uint64(1)
        done |= (w >> np.uint64(63)) == 1
    return rho


def hll_partials_batch(
    batch: pa.Table, key_col: str, group_col: str, p: int = 8
) -> pa.Table:
    """(group, register, rho_max) partials for one batch."""
    keys = [str(v) for v in batch[key_col].to_pylist()]
    groups = batch[group_col].to_pylist()
    h = _hash64(keys)
    reg = (h >> np.uint64(64 - p)).astype(np.int64)
    rho = _rho(h << np.uint64(p), 64 - p)
    t = pa.table(
        {
            "grp": pa.array(groups),
            "register": pa.array(reg, pa.int64()),
            "rho": pa.array(rho, pa.int64()),
        }
    )
    out = t.group_by(["grp", "register"]).aggregate([("rho", "max")])
    return pa.table(
        {
            "grp": out["grp"],
            "register": out["register"],
            "rho_max": pc.cast(out["rho_max"], pa.int64()),
        }
    )


def hll_estimate(registers: dict[int, int], p: int = 8) -> float:
    """Standard HLL estimator with linear-counting small-range
    correction.  ``registers`` maps register index → max rho (missing
    indexes are zero)."""
    m = 1 << p
    alpha = 0.7213 / (1 + 1.079 / m)
    full = np.zeros(m, dtype=np.float64)
    for idx, rho in registers.items():
        full[idx] = rho
    est = alpha * m * m / np.sum(np.exp2(-full))
    zeros = int((full == 0).sum())
    if est <= 2.5 * m and zeros > 0:
        est = m * np.log(m / zeros)
    return float(est)


def hll_distinct_per_group(ds, key_col: str, group_col: str, p: int = 8):
    """Approximate COUNT(DISTINCT key) per group.  Returns a (tiny)
    pyarrow Table (group, estimate:int64).  The register exchange is
    bounded by groups × 2^p rows per batch; the final register table
    (groups × 2^p rows max) reduces on the driver."""
    from ray.data.aggregate import Max

    regs = (
        ds.map_batches(
            lambda b: hll_partials_batch(b, key_col, group_col, p),
            batch_format="pyarrow",
        )
        .groupby(["grp", "register"])
        .aggregate(Max("rho_max", alias_name="rho"))
        .take_all()
    )
    by_group: dict[str, dict[int, int]] = {}
    for r in regs:
        by_group.setdefault(r["grp"], {})[int(r["register"])] = int(r["rho"])
    groups = sorted(by_group)
    return pa.table(
        {
            group_col: pa.array(groups),
            "estimate": pa.array(
                [int(round(hll_estimate(by_group[g], p))) for g in groups],
                pa.int64(),
            ),
        }
    )


def mg_summary_batch(
    batch: pa.Table, text_column: str = "text", k: int = 40
) -> pa.Table:
    """Misra-Gries heavy-hitter summary of one batch's whitespace
    tokens: exact within-batch counts pruned to <= k entries by
    subtracting the (k+1)-largest count (the standard mergeable-MG
    prune, Agarwal et al. 2013).  Emits (word, weight) — at most k rows
    per batch regardless of batch size."""
    toks = pc.split_pattern(
        pc.cast(batch[text_column], pa.large_string()), pattern=" "
    )
    flat = pc.list_flatten(toks)
    counted = pa.table({"word": flat}).group_by("word").aggregate(
        [("word", "count")]
    )
    words = np.asarray(counted["word"]).astype(str)
    counts = np.asarray(counted["word_count"], dtype=np.int64)
    if len(counts) > k:
        cut = np.partition(counts, len(counts) - (k + 1))[len(counts) - (k + 1)]
        counts = counts - cut
        keep = counts > 0
        words, counts = words[keep], counts[keep]
        if len(counts) > k:  # ties at the cut — keep the k largest
            order = np.argsort(-counts, kind="stable")[:k]
            words, counts = words[order], counts[order]
    return pa.table(
        {
            "word": pa.array(words, pa.string()),
            "weight": pa.array(counts, pa.int64()),
        }
    )


def mg_merge(summaries: pa.Table, k: int = 40) -> dict[str, int]:
    """Merge MG summaries (sum weights per word, prune back to k).
    Input is the concatenation of per-batch summaries (<= batches × k
    rows); output has <= k entries.  Guarantee after merging summaries
    of a stream of n tokens: every word with true count > n/(k+1) is
    present."""
    merged = summaries.group_by("word").aggregate([("weight", "sum")])
    words = np.asarray(merged["word"]).astype(str)
    weights = np.asarray(merged["weight_sum"], dtype=np.int64)
    if len(weights) > k:
        cut = np.partition(weights, len(weights) - (k + 1))[len(weights) - (k + 1)]
        weights = weights - cut
        keep = weights > 0
        words, weights = words[keep], weights[keep]
        if len(weights) > k:
            order = np.argsort(-weights, kind="stable")[:k]
            words, weights = words[order], weights[order]
    return {w: int(c) for w, c in zip(words, weights)}


def mg_heavy_hitters(docs_ds, text_column: str = "text", k: int = 40) -> dict[str, int]:
    """Distributed Misra-Gries: per-batch summaries (<= k rows each)
    concatenated and merged once on the driver.  The driver side is
    bounded by batches × k rows — never the vocabulary, never the
    token stream."""
    parts = docs_ds.map_batches(
        lambda b: mg_summary_batch(b, text_column, k), batch_format="pyarrow"
    ).take_all()
    if not parts:
        return {}
    tbl = pa.table(
        {
            "word": pa.array([r["word"] for r in parts], pa.string()),
            "weight": pa.array([r["weight"] for r in parts], pa.int64()),
        }
    )
    return mg_merge(tbl, k)


# Count-Min row-hash derivation: h_i(x) = (x * A_i + B_i) >> (64 - log2(w)),
# multiply-shift over the md5 base hash — deterministic, no per-row md5.
_CM_A = np.array(
    [0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9, 0x27D4EB2F165667C5],
    dtype=np.uint64,
)
_CM_B = np.array(
    [0xD6E8FEB86659FD93, 0xA5A5A5A5A5A5A5A5, 0x0123456789ABCDEF, 0xFEDCBA9876543210],
    dtype=np.uint64,
)


def cms_partials_batch(
    batch: pa.Table, text_column: str = "text", depth: int = 4, log2_width: int = 10
) -> pa.Table:
    """Count-Min partial of one batch's whitespace tokens: a depth ×
    width counter grid in long form (row, col, cnt) — at most
    depth × 2^log2_width rows per batch, sum-mergeable."""
    width = 1 << log2_width
    toks = pc.split_pattern(
        pc.cast(batch[text_column], pa.large_string()), pattern=" "
    )
    flat = pc.list_flatten(toks).to_pylist()
    if not flat:
        return pa.table(
            {
                "row": pa.array([], pa.int64()),
                "col": pa.array([], pa.int64()),
                "cnt": pa.array([], pa.int64()),
            }
        )
    h = _hash64(flat)
    grid = np.zeros((depth, width), dtype=np.int64)
    for i in range(depth):
        cols = ((h * _CM_A[i] + _CM_B[i]) >> np.uint64(64 - log2_width)).astype(
            np.int64
        )
        np.add.at(grid[i], cols, 1)
    rows, cols = np.nonzero(grid)
    return pa.table(
        {
            "row": pa.array(rows, pa.int64()),
            "col": pa.array(cols, pa.int64()),
            "cnt": pa.array(grid[rows, cols], pa.int64()),
        }
    )


def cms_estimate(grid: dict[tuple[int, int], int], word: str, depth: int = 4, log2_width: int = 10) -> int:
    """Point estimate: min over rows of the word's counter."""
    h = _hash64([word])  # length-1 array: uint64 wraparound is the intent
    cols = ((h * _CM_A + _CM_B) >> np.uint64(64 - log2_width)).astype(np.int64)
    return int(min(grid.get((i, int(c)), 0) for i, c in enumerate(cols[:depth])))


def cms_counts(docs_ds, text_column: str = "text", depth: int = 4, log2_width: int = 10):
    """Distributed Count-Min: per-batch grids merged by ONE
    groupby((row, col)).sum — the exchange and the final driver table
    are both bounded by depth × 2^log2_width cells, independent of the
    corpus.  Returns the merged grid as a dict for point queries."""
    from ray.data.aggregate import Sum

    cells = (
        docs_ds.map_batches(
            lambda b: cms_partials_batch(b, text_column, depth, log2_width),
            batch_format="pyarrow",
        )
        .groupby(["row", "col"])
        .aggregate(Sum("cnt", alias_name="n"))
        .take_all()
    )
    return {(int(r["row"]), int(r["col"])): int(r["n"]) for r in cells}


# ---------------------------------------------------------------------------
# Bloom filter — mergeable seen-set membership
# ---------------------------------------------------------------------------

def _bloom_positions(values: list[str], log2_m: int) -> tuple[np.ndarray, np.ndarray]:
    """Two bit positions per value: the first / second 4 md5 bytes
    (big endian) mod 2^log2_m — exactly ``CAST('0x'||substr(md5(v),1,8)
    AS UBIGINT) % m`` / ``substr(…,9,8)`` in DuckDB, so the oracle can
    reconstruct the filter (false positives included) bit-for-bit."""
    m = np.uint64(1 << log2_m)
    cache: dict[str, tuple[int, int]] = {}
    for v in set(values):
        d = hashlib.md5(v.encode()).digest()
        cache[v] = (
            int.from_bytes(d[:4], "big") % int(m),
            int.from_bytes(d[4:8], "big") % int(m),
        )
    p1 = np.fromiter((cache[v][0] for v in values), dtype=np.int64, count=len(values))
    p2 = np.fromiter((cache[v][1] for v in values), dtype=np.int64, count=len(values))
    return p1, p2


def bloom_build(ref_ds, key_col: str = "text", log2_m: int = 10) -> np.ndarray:
    """Distributed build: per-batch DISTINCT set-bit positions (≤ 2^log2_m
    rows per batch regardless of row count), driver union = bitwise-OR
    merge — the property that makes a Bloom filter shard-mergeable at
    100 TB.  Returns the sorted set-bit positions (bounded by m)."""

    def partial(batch: pa.Table) -> pa.Table:
        vals = pc.cast(batch[key_col], pa.string()).to_pylist()
        p1, p2 = _bloom_positions(vals, log2_m)
        return pa.table(
            {"pos": pa.array(np.unique(np.concatenate([p1, p2])), pa.int64())}
        )

    parts = [
        np.asarray(b["pos"], dtype=np.int64)
        for b in ref_ds.map_batches(partial, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        )
    ]
    if not parts:
        return np.empty(0, np.int64)
    return np.unique(np.concatenate(parts))


class BloomProbe:
    """Actor-pool ``map_batches`` stage: flag rows whose key the Bloom
    filter has (possibly falsely) seen.  The bit array is fetched from
    the object store ONCE per actor."""

    def __init__(self, bits_ref, log2_m: int, key_col: str = "text"):
        import ray

        pos = ray.get(bits_ref) if not isinstance(bits_ref, np.ndarray) else bits_ref
        self.bits = np.zeros(1 << log2_m, dtype=bool)
        self.bits[pos] = True
        self.log2_m = log2_m
        self.key_col = key_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        vals = pc.cast(batch[self.key_col], pa.string()).to_pylist()
        p1, p2 = _bloom_positions(vals, self.log2_m)
        hit = self.bits[p1] & self.bits[p2] if len(vals) else np.empty(0, bool)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "bloom_hit": pa.array(hit, pa.bool_()),
            }
        )

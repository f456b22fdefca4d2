"""Adversarial-skew stress: one hot key owning ~50% of rows must
neither change results nor serialize into a single block (VERDICT r2
item 6).

Three guards, strongest-first:

1. *Equivalence*: on a skewed corpus the shard-salted output equals the
   unsalted (``shards=1``) ground truth — salting end-to-end at a few
   thousand rows, well beyond the unit-scale cases.
2. *Structural*: after ``explode_shard_pairs`` the largest
   (source, shard-pair) group holds O(hot/shards) rows, not the whole
   hot key — the r1 scale cliff caught without wall-clock flakiness.
3. *Relative wall*: salted ≤ 1.5× unsalted wall (best-of-2,
   interleaved).  A tight absolute bound at replicate≥160 would flap on
   this VM's ±20% (occasionally 3×) noise — BASELINE.md documents the
   measured spread — so the structural assert carries the scale claim
   and the wall bound only catches salting becoming pathological.
"""

import time

import numpy as np
import pyarrow as pa
import pytest


def _skewed_docs(n: int = 2400, hot_frac: float = 0.5, seed: int = 7) -> pa.Table:
    """Docs where one source owns ``hot_frac`` of rows; char sets mostly
    unique with planted duplicate charset pairs."""
    rng = np.random.default_rng(seed)
    n_hot = int(n * hot_frac)
    sources = ["hot"] * n_hot + [
        f"s{int(i)}" for i in rng.integers(0, 7, size=n - n_hot)
    ]
    alphabet = "abcdefghijklmnopqrstuvwxyz0123456789"
    texts = []
    for i in range(n):
        if i % 97 == 3:  # planted duplicate charset of row i-1
            texts.append(texts[-1][::-1])
            continue
        k = 6 + int(rng.integers(0, 18))
        idx = rng.choice(len(alphabet), size=k, replace=False)
        texts.append("".join(alphabet[j] for j in sorted(idx)))
    return pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "source": pa.array(sources, pa.string()),
        }
    )


def _pairs_set(res):
    df = res.to_pandas()
    a, b = ("doc_a", "doc_b") if "doc_a" in df.columns else ("vec_a", "vec_b")
    return set(zip(df[a], df[b]))


def test_charset_salting_equivalence_under_skew(ray_session):
    import ray.data as rd

    from argo_ray.functions.dedup import charset_jaccard_pairs

    tbl = _skewed_docs()
    truth = _pairs_set(charset_jaccard_pairs(rd.from_arrow(tbl), 1.0, shards=1))
    salted = _pairs_set(charset_jaccard_pairs(rd.from_arrow(tbl), 1.0, shards=6))
    assert truth  # planted duplicates exist
    assert salted == truth


def test_embedding_salting_equivalence_under_skew(ray_session):
    import ray.data as rd

    from argo_ray.functions.ann import embedding_neardup_pairs

    rng = np.random.default_rng(11)
    n = 900
    base = rng.normal(size=(60, 8))
    emb = base[rng.integers(0, 60, size=n)] + rng.normal(scale=0.02, size=(n, 8))
    # one hot label owns half the vectors
    labels = np.where(np.arange(n) < n // 2, 0, 1 + (np.arange(n) % 5))
    tbl = pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "label": pa.array(labels, pa.int64()),
            "embedding": pa.array([list(map(float, r)) for r in emb]),
        }
    )
    truth = _pairs_set(embedding_neardup_pairs(rd.from_arrow(tbl), 0.995, shards=1))
    salted = _pairs_set(embedding_neardup_pairs(rd.from_arrow(tbl), 0.995, shards=5))
    assert truth
    assert salted == truth


def test_hot_source_distributes_structurally():
    """The r1 cliff: without salting the hot source is ONE group.  With
    ``explode_shard_pairs(shards=S)`` every (source, _sa, _sb) group
    holds ≤ ~2·hot/S rows — the quadratic work spreads over ~S²/2
    independent blocks."""
    import pandas as pd

    from argo_ray.functions.dedup import explode_shard_pairs

    tbl = _skewed_docs(n=2000, hot_frac=0.5)
    shards = 8
    exploded = explode_shard_pairs(tbl, "doc_id", shards).to_pandas()
    sizes = exploded.groupby(["source", "_sa", "_sb"]).size()
    hot_n = int((tbl["source"].to_pandas() == "hot").sum())
    assert sizes.max() <= int(2.5 * hot_n / shards)
    # and the hot source really spans the full shard-pair grid
    hot_groups = sizes.loc["hot"]
    assert len(hot_groups) == shards * (shards + 1) // 2


def test_salting_wall_time_not_pathological(ray_session):
    import ray.data as rd

    from argo_ray.functions.dedup import charset_jaccard_pairs

    tbl = _skewed_docs(n=3000, hot_frac=0.5)
    walls = {"salted": [], "serial": []}
    for _ in range(3):  # interleaved best-of-3: VM noise protocol
        for name, shards in (("serial", 1), ("salted", 6)):
            t0 = time.time()
            charset_jaccard_pairs(rd.from_arrow(tbl), 1.0, shards=shards).count()
            walls[name].append(time.time() - t0)
    # pathological-only bound: serialization into one block would be
    # ~shards²× slower; 2× + 1 s rides out this VM's full-suite noise
    # (the 1.5×+0.5 best-of-2 bound flapped under concurrent load)
    assert min(walls["salted"]) <= 2.0 * min(walls["serial"]) + 1.0

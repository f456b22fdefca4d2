"""Deterministic sampling / splitting operators for training-data
pipelines: hash-based train/val/test assignment and per-stratum top-n
sampling.  No reference counterpart (the reference has no sampling
surface); the shapes follow the partial-then-small-shuffle pattern the
rest of this engine uses.

Determinism contract: both operators key on a *content hash* of an id
column, so re-runs, resumed runs, and differently-partitioned inputs
produce byte-identical assignments — the property a 100-TB pipeline
needs so a re-shard never silently reshuffles a frozen eval split.

Two hashers, same pattern as ``dedup.exact_dedup_docs``:

- ``"fast"`` (default): the vectorized 64-bit Rust hash (``hash64``) —
  the 100-TB path.
- ``"md5"``: hex md5 (per-row hashlib) — byte-reproducible in DuckDB's
  ``md5()``, the oracle-check mode.  Split thresholds compare hex
  PREFIXES (md5 hex is uniform per character), so any fraction with
  256ths granularity is exact in BOTH systems via plain string
  comparison — no hex→int parsing in SQL.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa
import pyarrow.compute as pc


def _key_strings(batch: pa.Table, key_col: str, salt: str) -> pa.Array:
    keys = pc.cast(batch[key_col], pa.large_string())
    if salt:
        keys = pc.binary_join_element_wise(
            keys,
            pa.scalar(salt, pa.large_string()),
            pa.scalar("", pa.large_string()),
        )
    return keys


def _md5_hex(keys: pa.Array) -> pa.Array:
    # oracle mode only — per-row hashlib for DuckDB md5() parity;
    # null keys stay null (→ unassigned split / never sampled)
    return pa.array(
        [
            hashlib.md5(k.encode()).hexdigest() if k is not None else None
            for k in keys.to_pylist()
        ],
        pa.large_string(),
    )


def hash_split(
    ds,
    key_col: str,
    splits: list[tuple[str, str]] | None = None,
    fractions: list[tuple[str, float]] | None = None,
    salt: str = "",
    hasher: str = "fast",
):
    """Append a ``split`` column assigning each row to a named split.

    ``splits``: ordered ``[(name, hex_upper_bound), …]`` — a row lands
    in the first split whose bound its md5 hex exceeds not (the LAST
    bound must be ``"g"``/anything > "ffff…" to catch the remainder).
    E.g. 80/10/10: ``[("train", "cd"), ("val", "e6"), ("test", "g")]``
    (205/256 ≈ 80.1%, 25/256 ≈ 9.8%, rest).  Requires ``hasher="md5"``.

    ``fractions``: ordered ``[(name, fraction), …]`` summing to 1 —
    the ``hasher="fast"`` production path (vectorized uint64 ranges).

    One stateless map_batches — no shuffle, no driver collection; the
    assignment depends only on (key, salt), never on partitioning."""
    if (splits is None) == (fractions is None):
        raise ValueError("exactly one of splits= / fractions= required")
    if splits is not None and hasher != "md5":
        raise ValueError("hex-threshold splits require hasher='md5'")

    if splits is not None:

        def assign(batch: pa.Table) -> pa.Table:
            hexes = _md5_hex(_key_strings(batch, key_col, salt))
            out = pa.array([None] * batch.num_rows, pa.large_string())
            assigned = pa.array([False] * batch.num_rows, pa.bool_())
            for name, bound in splits:
                m = pc.and_(pc.invert(assigned), pc.less(hexes, bound))
                out = pc.if_else(m, pa.scalar(name, pa.large_string()), out)
                assigned = pc.or_(assigned, m)
            return batch.append_column("split", out)

        return ds.map_batches(assign, batch_format="pyarrow")

    from ..terms import hash64

    total = sum(f for _, f in fractions)
    if not 0.999 <= total <= 1.001:
        raise ValueError(f"fractions sum to {total}, expected 1")

    bounds = []
    acc = 0.0
    for name, f in fractions:
        acc += f
        bounds.append((name, int(acc * 2**64) - 1))
    bounds[-1] = (bounds[-1][0], 2**64 - 1)

    def assign_fast(batch: pa.Table) -> pa.Table:
        keys = _key_strings(batch, key_col, salt)
        h = hash64(keys)
        # hash64 maps null to a concrete value; null keys must stay
        # unassigned (same contract as the md5 path)
        valid = pc.is_valid(keys)
        out = pa.array([None] * batch.num_rows, pa.large_string())
        assigned = pa.array([False] * batch.num_rows, pa.bool_())
        for name, bound in bounds:
            m = pc.and_(
                pc.and_(valid, pc.invert(assigned)),
                pc.less_equal(h, pa.scalar(bound, pa.uint64())),
            )
            out = pc.if_else(m, pa.scalar(name, pa.large_string()), out)
            assigned = pc.or_(assigned, m)
        return batch.append_column("split", out)

    return ds.map_batches(assign_fast, batch_format="pyarrow")


def stratified_sample(
    ds,
    strata_col: str,
    key_col: str,
    n_per_stratum: int,
    salt: str = "",
    hasher: str = "fast",
):
    """Deterministic sample of ``n_per_stratum`` rows per stratum: the
    n rows whose (salted) key hash is smallest — a uniform, repeatable
    choice independent of input partitioning.

    Scale shape: each batch keeps at most n candidates per stratum it
    sees (vectorized pandas nsmallest partial), so the single stratum
    exchange moves ≤ n × batches rows, never the raw table; one sorted
    per-stratum pass then takes the global n.  Hot strata cost the same
    as cold ones."""
    import pandas as pd

    from ..stages.grouping import grouped_map
    from ..terms import hash64

    def rank_key(batch: pa.Table) -> pa.Table:
        keys = _key_strings(batch, key_col, salt)
        if hasher == "md5":
            rk = _md5_hex(keys)
        else:
            rk = pc.cast(hash64(keys), pa.large_string())
            # zero-pad so string order == numeric order
            rk = pc.utf8_lpad(rk, 20, "0")
            # null keys must rank last / never be sampled, matching md5
            rk = pc.if_else(pc.is_valid(keys), rk, pa.scalar(None, pa.large_string()))
        return batch.append_column("_rk", rk)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.sort_values("_rk", kind="mergesort")
            .groupby(strata_col, sort=False, dropna=False, observed=True)
            .head(n_per_stratum)
        )

    pre = ds.map_batches(rank_key, batch_format="pyarrow").map_batches(
        partial, batch_format="pandas"
    )

    def final(group: pd.DataFrame) -> pd.DataFrame:
        return group.sort_values("_rk", kind="mergesort").head(n_per_stratum)

    out = grouped_map(pre, [strata_col], final)
    return out.map_batches(
        lambda b: b.drop_columns(["_rk"]), batch_format="pyarrow"
    )


# Common-Crawl-style URL shape: scheme://host/site-path/page-id.  Named
# groups for pc.extract_regex; the SAME pattern (positional groups) is
# formatted into the DuckDB oracle.
URL_PATTERN = r"^https://(?P<host>[a-z0-9.\-]+)/(?P<site>[A-Za-z0-9_\-]+)/(?P<page_id>[0-9]+)$"
URL_PATTERN_SQL = r"^https://([a-z0-9.\-]+)/([A-Za-z0-9_\-]+)/([0-9]+)$"


def parse_url_batch(batch: pa.Table, url_column: str = "url") -> pa.Table:
    """Vectorized URL parse (one RE2 kernel): appends ``host``, ``site``,
    ``page_id`` columns; rows whose URL does not match are dropped
    (poison-URL quarantine, same contract as the batch parsers)."""
    urls = pc.cast(batch[url_column], pa.large_string())
    ex = pc.extract_regex(urls, pattern=URL_PATTERN)
    ok = pc.is_valid(ex)
    batch = batch.filter(ok)
    ex = ex.filter(ok)
    return (
        batch.append_column("host", pc.cast(pc.struct_field(ex, "host"), pa.string()))
        .append_column("site", pc.cast(pc.struct_field(ex, "site"), pa.string()))
        .append_column(
            "page_id", pc.cast(pc.struct_field(ex, "page_id"), pa.int64())
        )
    )


def domain_cap(pages_ds, k: int = 15, url_column: str = "url", pre_parsed: bool = False):
    """Per-domain quota (the Common-Crawl "cap pages per site" op):
    keep the ``k`` lowest-page_id pages of each site.

    Scale shape: vectorized URL parse → per-batch partial top-k per
    site (the combiner — each batch forwards ≤ sites×k rows, never the
    raw corpus) → one small per-site exchange (grouped_map) for the
    global top-k.  Skew-safe: a hot site still only ships k rows per
    batch."""
    import pandas as pd

    from ..stages.grouping import grouped_map

    def parse(batch: pa.Table) -> pa.Table:
        if pre_parsed:  # site/page_id columns already extracted upstream
            return batch.select(["site", "page_id"])
        return parse_url_batch(batch, url_column).select(["site", "page_id"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.sort_values("page_id", kind="mergesort")
            .groupby("site", sort=False, observed=True)
            .head(k)
        )

    pre = pages_ds.map_batches(parse, batch_format="pyarrow").map_batches(
        partial, batch_format="pandas"
    )

    def final(group: pd.DataFrame) -> pd.DataFrame:
        return group.sort_values("page_id", kind="mergesort").head(k)

    return grouped_map(pre, ["site"], final)


def domain_cap_oracle_sql(k: int = 15) -> str:
    """DuckDB twin over the documents table (page URLs reconstructed
    the same way pages.synth_pages_batch builds them)."""
    return f"""WITH pages AS (
  SELECT 'https://docs.example.org/' || source || '/' || doc_id AS url
  FROM documents
), parsed AS (
  SELECT regexp_extract(url, '{URL_PATTERN_SQL}', 2) AS site,
         CAST(regexp_extract(url, '{URL_PATTERN_SQL}', 3) AS BIGINT) AS page_id
  FROM pages
)
SELECT site, page_id FROM (
  SELECT site, page_id,
         row_number() OVER (PARTITION BY site ORDER BY page_id) AS rn
  FROM parsed
) WHERE rn <= {k}"""


def temperature_sample(
    ds,
    strata_col: str = "source",
    key_col: str = "doc_id",
    alpha: float = 0.5,
    hasher: str = "fast",
    concurrency: int = 2,
):
    """Temperature-based source rebalancing (the GPT-3/Gopher data-mix
    move): downsample each stratum with keep probability
    ``p_s = (min_n / n_s) ** (1 - alpha)`` — alpha=1 keeps everything,
    alpha=0 equalizes every stratum to the smallest.  Selection is a
    deterministic hash-fraction test (keep iff ``hash(key) < floor(p_s
    * 2^bits)``), so re-runs, resumes and re-shards keep the same rows.

    Plan at 100 TB: ONE tiny count-per-stratum groupby (rows = distinct
    strata), thresholds broadcast in the actor constructor, then a
    stateless streamed filter — no data shuffle.

    Exactness contract (``hasher="md5"``, the oracle mode, alpha=0.5):
    ``p_s = sqrt(min_n / n_s)`` uses only IEEE-correctly-rounded ops
    (one divide, one sqrt, one scale by 2^32, floor), so DuckDB's
    ``floor(sqrt(CAST(min_n AS DOUBLE) / n_s) * 4294967296.0)``
    computes the bit-identical threshold, and the integer comparison
    against the first 4 md5 bytes reproduces the sample exactly."""
    import math

    import numpy as np
    import ray

    from ..terms import hash64  # driver-side: workers get it by closure

    counts = {
        r[strata_col]: int(r["count()"])
        for r in ds.groupby(strata_col).count().take_all()
    }
    if not counts:
        return ds.filter(lambda row: False)
    min_n = min(counts.values())
    bits = 32 if hasher == "md5" else 64
    thresholds = {}
    for s, n in counts.items():
        if alpha == 0.5:
            p = math.sqrt(min_n / n)  # correctly-rounded divide + sqrt
        else:
            p = (min_n / n) ** (1.0 - alpha)
        thresholds[s] = math.floor(p * float(2**bits))
    thr_ref = ray.put(thresholds)

    class Sampler:
        def __init__(self):
            t = ray.get(thr_ref) if not isinstance(thr_ref, dict) else thr_ref
            self.thr = t

        def __call__(self, batch: pa.Table) -> pa.Table:
            keys = _key_strings(batch, key_col, "")
            if hasher == "md5":
                hexes = _md5_hex(keys).to_pylist()
                u = np.array(
                    [int(h[:8], 16) if h is not None else 2**32 for h in hexes],
                    dtype=np.uint64,
                )
            else:
                u = np.asarray(hash64(keys), dtype=np.uint64)
            strata = batch[strata_col].to_pylist()
            raw = [self.thr.get(s, 0) for s in strata]
            # p == 1 strata get threshold 2**bits, which overflows the
            # uint64 compare lane — carry them as an explicit keep-all
            cap = 2**bits
            t = np.array([min(r, cap - 1) for r in raw], dtype=np.uint64)
            keep_all = np.array([r >= cap for r in raw], dtype=bool)
            return batch.filter(pa.array((u < t) | keep_all, pa.bool_()))

    return ds.map_batches(Sampler, batch_format="pyarrow", concurrency=concurrency)


def temperature_sample_oracle_sql(strata_col: str = "source") -> str:
    """Exact SQL twin of ``temperature_sample(hasher='md5', alpha=0.5)``
    over the documents table (see exactness contract above)."""
    return f"""WITH n AS (
  SELECT {strata_col}, COUNT(*) AS n_s FROM documents GROUP BY {strata_col}
), m AS (
  SELECT MIN(n_s) AS min_n FROM n
), thr AS (
  SELECT {strata_col},
         CAST(floor(sqrt(CAST(min_n AS DOUBLE) / n_s) * 4294967296.0) AS UBIGINT) AS t
  FROM n, m
)
SELECT d.doc_id, d.{strata_col} AS {strata_col}
FROM documents d JOIN thr USING ({strata_col})
WHERE CAST('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8) AS UBIGINT) < t"""


def weighted_reservoir_topk(docs_ds, k: int = 20, weight_col: str = "n_chars"):
    """Weighted reservoir sampling (Efraimidis–Spirakis A-ES, the
    one-pass distributed weighted sample): each item draws a
    deterministic md5-uniform u ∈ (0,1] and ranks by ``ln(u)/w`` — the
    top-k under that key IS an exact weighted sample without
    replacement.  Deterministic uniforms (first 8 md5 bytes of the
    text) make the draw reproducible across runs, partitions and the
    DuckDB oracle; keys round to 12 decimals before ranking so ln ulp
    differences can't flip the order (ties break on doc_id).

    Scale shape: one stateless keying pass + a k-row sort/limit —
    per-partition top-k combining is what Ray's sort+limit already
    does, so the exchange is k rows per block, never the corpus.
    Returns a k-row pa.Table (rank, doc_id, w, key)."""
    import hashlib

    import numpy as np

    def keyed(batch: pa.Table) -> pa.Table:
        texts = [t if t is not None else "" for t in batch["text"].to_pylist()]
        h = np.array(
            [
                int.from_bytes(hashlib.md5(t.encode()).digest()[:8], "big")
                for t in texts
            ],
            dtype=np.uint64,
        )
        u = (h.astype(np.float64) + 1.0) / 18446744073709551616.0
        w = np.maximum(
            batch[weight_col].to_numpy(zero_copy_only=False).astype(np.float64),
            1.0,
        )
        key = np.round(np.log(u) / w, 12)
        return pa.table(
            {
                "doc_id": pc.cast(batch["doc_id"], pa.int64()),
                "w": pa.array(w.astype(np.int64), pa.int64()),
                "key": pa.array(key, pa.float64()),
            }
        )

    top = (
        docs_ds.map_batches(keyed, batch_format="pyarrow")
        .sort(["key", "doc_id"], descending=[True, False])
        .limit(k)
        .take_all()
    )  # bounded: k rows
    return pa.table(
        {
            "rank": pa.array(range(1, len(top) + 1), pa.int64()),
            "doc_id": pa.array([r["doc_id"] for r in top], pa.int64()),
            "w": pa.array([r["w"] for r in top], pa.int64()),
            "key": pa.array([r["key"] for r in top], pa.float64()),
        }
    )


WEIGHTED_RESERVOIR_ORACLE_SQL = """WITH k AS (
  SELECT doc_id, GREATEST(CAST(n_chars AS DOUBLE), 1.0) AS w,
         (CAST(CAST('0x' || substr(md5(text), 1, 16) AS UBIGINT) AS DOUBLE) + 1.0)
           / 18446744073709551616.0 AS u
  FROM documents
), scored AS (
  SELECT doc_id, CAST(w AS BIGINT) AS w, ROUND(LN(u) / w, 12) AS key FROM k
)
SELECT CAST(ROW_NUMBER() OVER (ORDER BY key DESC, doc_id) AS BIGINT) AS rank,
       doc_id, w, key
FROM scored ORDER BY key DESC, doc_id LIMIT 20"""

"""Unigram language-model quality scoring (CCNet-style): train a
unigram LM on a high-quality reference slice, score every document by
its total token surprisal — the standard "does this look like the
reference distribution?" quality gate LLM pipelines run after dedup.

No reference counterpart; part of the brief-mandated training-data
suite.  Shape at 100 TB:

- **Model fit is ONE distributed wordcount** over the reference slice
  (per-batch Arrow groupby combiner → one small ``groupby`` — the same
  plan as ``docs_vocab``/``bpe.word_counts``): the collected state is
  |vocab|, not corpus size.
- **Scoring streams**: the (word → surprisal) table is ``ray.put``
  once and fetched once per actor in ``__init__``; each batch is one
  split kernel + one vectorized dict lookup + two ``bincount``
  scatters.  No per-row Python, no shuffle.

Determinism (why integer "bits", not float nats): surprisal is
quantized to whole bits via ``floor(log2 ·)`` on *integers* —
``floor(log2(c))`` is exact for any count ``c`` well below 2**50
(IEEE log2 is exact at powers of two and >1e-7 away from an integer
elsewhere at these magnitudes), and per-doc scores are integer SUMs,
so results are independent of summation order, partitioning and
cluster size, and the DuckDB oracle reproduces them bit-for-bit.

    surprisal(w) = floor(log2 T) - floor(log2 c(w))   (in-vocab)
                 = floor(log2 T) + 1                  (OOV)

with ``T`` the reference token count — i.e. ``-log2 p(w)`` rounded
down to whole bits, OOV charged one bit more than the rarest possible
word.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _ilog2(n: int) -> int:
    """floor(log2(n)) for a positive int — exact integer math."""
    return int(n).bit_length() - 1


def fit_unigram_surprisal(
    ref_ds, text_column: str = "text"
) -> tuple[dict[str, int], int]:
    """ONE distributed wordcount over the reference slice → (word →
    surprisal bits, OOV bits).  Empty tokens (from repeated spaces) are
    dropped on both sides — the oracle filters ``w <> ''`` identically."""
    from .text import word_counts_ds

    rows = word_counts_ds(ref_ds, text_column).take_all()
    counts = {r["word"]: int(r["n"]) for r in rows if r["word"]}
    total = sum(counts.values())
    bits_t = _ilog2(total) if total else 0
    table = {w: bits_t - _ilog2(c) for w, c in counts.items()}
    return table, bits_t + 1


class SurprisalScorer:
    """Actor-pool ``map_batches`` stage: per doc ``(n_tokens, n_oov,
    surprisal_bits)`` under the broadcast unigram model.  The model is
    fetched from the object store ONCE per actor."""

    def __init__(self, model_ref, oov_bits: int, text_column: str = "text"):
        import pandas as pd
        import ray

        model = ray.get(model_ref) if not isinstance(model_ref, dict) else model_ref
        # pandas Series for the vectorized .map lookup (same pattern as
        # the entity-linking dictionary stage, stages/link.py)
        self.lut = pd.Series(model, dtype="int64")
        self.oov_bits = oov_bits
        self.text_column = text_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pandas as pd

        toks = pc.split_pattern(
            pc.cast(batch[self.text_column], pa.large_string()), pattern=" "
        )
        lengths = np.asarray(pc.list_value_length(toks), dtype=np.int64)
        flat = pc.list_flatten(toks)
        n_docs = len(batch)
        doc_of = np.repeat(np.arange(n_docs, dtype=np.int64), lengths)
        words = pd.Series(flat.to_pandas(), dtype="object")
        nonempty = (words != "").to_numpy()
        sval = words.map(self.lut).to_numpy(dtype="float64", na_value=np.nan)
        oov = np.isnan(sval) & nonempty
        sval = np.where(oov, float(self.oov_bits), np.where(nonempty, sval, 0.0))
        # integer-valued floats summed via bincount: exact below 2**53
        bits = np.bincount(doc_of, weights=sval, minlength=n_docs)
        n_tok = np.bincount(doc_of, weights=nonempty.astype(np.float64), minlength=n_docs)
        n_oov = np.bincount(doc_of, weights=oov.astype(np.float64), minlength=n_docs)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_tokens": pa.array(n_tok.astype(np.int64), pa.int64()),
                "n_oov": pa.array(n_oov.astype(np.int64), pa.int64()),
                "surprisal_bits": pa.array(bits.astype(np.int64), pa.int64()),
            }
        )


def lm_surprisal(
    docs_ds,
    ref_lang: str = "en",
    text_column: str = "text",
    concurrency: int = 2,
):
    """Fit on the ``lang == ref_lang`` slice, score every document.
    Returns ``(doc_id, n_tokens, n_oov, surprisal_bits)``."""
    import ray

    def only_ref(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.equal(batch["lang"], ref_lang))

    ref = docs_ds.map_batches(only_ref, batch_format="pyarrow")
    model, oov_bits = fit_unigram_surprisal(ref, text_column)
    model_ref = ray.put(model)
    return docs_ds.map_batches(
        SurprisalScorer,
        fn_constructor_args=(model_ref, oov_bits, text_column),
        batch_format="pyarrow",
        concurrency=concurrency,
    )


def lm_surprisal_oracle_sql(ref_lang: str = "en") -> str:
    """Exact relational reconstruction: reference wordcount → integer
    floor-log2 surprisal table → per-doc LEFT-JOIN sum.  ``floor(log2 n)``
    on BIGINT counts is exact at these magnitudes (see module header)."""
    return f"""WITH ref AS (
  SELECT unnest(string_split(text, ' ')) AS w FROM documents
  WHERE lang = '{ref_lang}'
), vocab AS (
  SELECT w, COUNT(*) AS c FROM ref WHERE w <> '' GROUP BY w
), tot AS (
  SELECT CAST(floor(log2(SUM(c))) AS BIGINT) AS bits_t FROM vocab
), toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
), scored AS (
  SELECT t.doc_id,
         CASE WHEN v.c IS NULL THEN 1 ELSE 0 END AS is_oov,
         CASE WHEN v.c IS NULL THEN bits_t + 1
              ELSE bits_t - CAST(floor(log2(v.c)) AS BIGINT) END AS s
  FROM toks t LEFT JOIN vocab v ON t.w = v.w, tot
  WHERE t.w <> ''
)
SELECT d.doc_id,
       CAST(COALESCE(COUNT(s.doc_id), 0) AS BIGINT) AS n_tokens,
       CAST(COALESCE(SUM(s.is_oov), 0) AS BIGINT) AS n_oov,
       CAST(COALESCE(SUM(s.s), 0) AS BIGINT) AS surprisal_bits
FROM documents d LEFT JOIN scored s ON d.doc_id = s.doc_id
GROUP BY d.doc_id"""


# ---------------------------------------------------------------------------
# Bigram extension: conditional surprisal with unigram backoff — the
# next rung of the CCNet-style ladder.  Same integer-bits determinism
# contract as the unigram model above.
#
#   s(prev, w) = floor(log2 c1(prev)) - floor(log2 c2(prev, w))   (bigram seen)
#              = 2 + floor(log2 T) - floor(log2 c1(w))            (backoff)
#              = 2 + floor(log2 T) + 1                            (backoff, OOV)
#
# i.e. -log2 p(w | prev) in whole bits when the transition is known,
# else the unigram score plus a flat 2-bit backoff penalty.  The first
# token of each document is not scored (no predecessor).  Token
# sequences drop '' (repeated spaces) BEFORE pairing on both sides.
# ---------------------------------------------------------------------------

BIGRAM_BACKOFF_BITS = 2
_BIGRAM_SEP = "\x1f"


def _bigram_partials(batch: pa.Table, text_column: str) -> pa.Table:
    """Per-batch (prev, w, part) counts over consecutive non-empty
    token pairs — the combiner before the single bigram groupby."""
    import pandas as pd

    toks = pc.split_pattern(
        pc.cast(batch[text_column], pa.large_string()), pattern=" "
    )
    lengths = np.asarray(pc.list_value_length(toks), dtype=np.int64)
    words = np.asarray(pc.list_flatten(toks).to_pylist(), dtype=object)
    doc_of = np.repeat(np.arange(len(batch), dtype=np.int64), lengths)
    keep = words != ""
    words, doc_of = words[keep], doc_of[keep]
    if len(words) < 2:
        return pa.table(
            {"prev": pa.array([], pa.string()), "w": pa.array([], pa.string()),
             "part": pa.array([], pa.int64())}
        )
    same = doc_of[1:] == doc_of[:-1]
    prev, cur = words[:-1][same], words[1:][same]
    g = (
        pd.DataFrame({"prev": prev, "w": cur})
        .groupby(["prev", "w"], sort=False)
        .size()
        .reset_index(name="part")
    )
    return pa.table(
        {
            "prev": pa.array(g["prev"], pa.string()),
            "w": pa.array(g["w"], pa.string()),
            "part": pa.array(g["part"].to_numpy(dtype=np.int64), pa.int64()),
        }
    )


def fit_bigram_surprisal(
    ref_ds, text_column: str = "text"
) -> tuple[dict[str, int], dict[str, int], int]:
    """(unigram word → count-bits table, bigram "prev␟w" → bits table,
    total-bits T) fitted on the reference slice with TWO distributed
    counts (unigram + bigram, each combiner → one groupby).  Collected
    state is |vocab| + |bigrams| — bounded by the reference slice."""
    from ray.data.aggregate import Sum

    from .text import word_counts_ds

    uni_rows = word_counts_ds(ref_ds, text_column).take_all()
    uni = {r["word"]: int(r["n"]) for r in uni_rows if r["word"]}
    total = sum(uni.values())
    bits_t = _ilog2(total) if total else 0

    bi_rows = (
        ref_ds.map_batches(
            lambda b: _bigram_partials(b, text_column), batch_format="pyarrow"
        )
        .groupby(["prev", "w"])
        .aggregate(Sum("part", alias_name="n"))
        .take_all()
    )
    uni_bits = {w: _ilog2(c) for w, c in uni.items()}
    bi_bits = {
        f"{r['prev']}{_BIGRAM_SEP}{r['w']}": uni_bits[r["prev"]] - _ilog2(int(r["n"]))
        for r in bi_rows
    }
    return uni_bits, bi_bits, bits_t


class BigramScorer:
    """Actor-pool stage: per doc ``(n_transitions, n_backoff,
    bigram_bits)`` under the broadcast bigram model (both LUTs fetched
    once per actor)."""

    def __init__(self, model_ref, text_column: str = "text"):
        import pandas as pd
        import ray

        uni_bits, bi_bits, bits_t = (
            ray.get(model_ref) if not isinstance(model_ref, tuple) else model_ref
        )
        self.uni = pd.Series(uni_bits, dtype="int64")
        self.bi = pd.Series(bi_bits, dtype="int64")
        self.bits_t = int(bits_t)
        self.text_column = text_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pandas as pd

        toks = pc.split_pattern(
            pc.cast(batch[self.text_column], pa.large_string()), pattern=" "
        )
        lengths = np.asarray(pc.list_value_length(toks), dtype=np.int64)
        words = np.asarray(pc.list_flatten(toks).to_pylist(), dtype=object)
        n_docs = len(batch)
        doc_of = np.repeat(np.arange(n_docs, dtype=np.int64), lengths)
        keep = words != ""
        words, doc_of = words[keep], doc_of[keep]
        if len(words) < 2:
            z = np.zeros(n_docs, dtype=np.int64)
            return pa.table(
                {
                    "doc_id": batch["doc_id"],
                    "n_transitions": pa.array(z, pa.int64()),
                    "n_backoff": pa.array(z, pa.int64()),
                    "bigram_bits": pa.array(z, pa.int64()),
                }
            )
        same = doc_of[1:] == doc_of[:-1]
        prev, cur, docs = words[:-1][same], words[1:][same], doc_of[1:][same]
        keys = pd.Series(np.char.add(np.char.add(prev.astype(str), _BIGRAM_SEP),
                                     cur.astype(str)))
        bi = keys.map(self.bi).to_numpy(dtype="float64", na_value=np.nan)
        backoff = np.isnan(bi)
        uni = pd.Series(cur[backoff]).map(self.uni).to_numpy(
            dtype="float64", na_value=np.nan
        )
        # backoff score: 2 + T-bits - uni-bits (OOV: 2 + T-bits + 1)
        uni_score = BIGRAM_BACKOFF_BITS + self.bits_t - np.where(
            np.isnan(uni), -1.0, uni
        )
        s = bi.copy()
        s[backoff] = uni_score
        bits = np.bincount(docs, weights=s, minlength=n_docs)
        n_tr = np.bincount(docs, minlength=n_docs)
        n_bo = np.bincount(docs[backoff], minlength=n_docs)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_transitions": pa.array(n_tr.astype(np.int64), pa.int64()),
                "n_backoff": pa.array(n_bo.astype(np.int64), pa.int64()),
                "bigram_bits": pa.array(bits.astype(np.int64), pa.int64()),
            }
        )


def bigram_surprisal_oracle_sql(ref_lang: str = "en") -> str:
    """Exact relational twin: ordered non-empty tokens via
    generate_subscripts + LAG, bigram/unigram count tables, integer
    floor-log2 CASE ladder, per-doc integer sums."""
    return f"""WITH toks0 AS MATERIALIZED (
  SELECT doc_id, lang, unnest(l) AS w, unnest(generate_series(1, len(l))) AS i
  FROM (SELECT doc_id, lang, string_split(text, ' ') AS l FROM documents)
), toks AS MATERIALIZED (
  SELECT doc_id, lang, w, i,
         LAG(w) OVER (PARTITION BY doc_id ORDER BY i) AS prev
  FROM toks0 WHERE w <> ''
), vocab AS MATERIALIZED (
  SELECT w, CAST(floor(log2(COUNT(*))) AS BIGINT) AS ub,
         COUNT(*) AS c
  FROM toks WHERE lang = '{ref_lang}' GROUP BY w
), tot AS (
  SELECT CAST(floor(log2(SUM(c))) AS BIGINT) AS bits_t FROM vocab
), bi AS MATERIALIZED (
  SELECT prev, w, CAST(floor(log2(COUNT(*))) AS BIGINT) AS bb
  FROM toks WHERE lang = '{ref_lang}' AND prev IS NOT NULL
  GROUP BY prev, w
), scored AS (
  SELECT t.doc_id,
         CASE WHEN b.bb IS NOT NULL THEN 0 ELSE 1 END AS is_backoff,
         CASE WHEN b.bb IS NOT NULL THEN vp.ub - b.bb
              WHEN vw.ub IS NOT NULL THEN {BIGRAM_BACKOFF_BITS} + bits_t - vw.ub
              ELSE {BIGRAM_BACKOFF_BITS} + bits_t + 1 END AS s
  FROM toks t
  LEFT JOIN bi b ON b.prev = t.prev AND b.w = t.w
  LEFT JOIN vocab vp ON vp.w = t.prev
  LEFT JOIN vocab vw ON vw.w = t.w, tot
  WHERE t.prev IS NOT NULL
)
SELECT d.doc_id,
       CAST(COALESCE(COUNT(s.doc_id), 0) AS BIGINT) AS n_transitions,
       CAST(COALESCE(SUM(s.is_backoff), 0) AS BIGINT) AS n_backoff,
       CAST(COALESCE(SUM(s.s), 0) AS BIGINT) AS bigram_bits
FROM documents d LEFT JOIN scored s ON d.doc_id = s.doc_id
GROUP BY d.doc_id"""


# ---------------------------------------------------------------------------
# CCNet-style perplexity buckets: rank every document by its per-token
# surprisal and cut the ranking into k equal tiles (CCNet's
# head/middle/tail thirds) — the standard way LLM pipelines stratify a
# crawl by LM quality before mixing.  Exact NTILE semantics with a
# deterministic (surprisal, doc_id) tiebreak so the DuckDB oracle
# (NTILE(k) OVER (ORDER BY s, doc_id)) matches bit-for-bit.
# ---------------------------------------------------------------------------

# rank key packs (surprisal_bits, doc_id) into one sortable int64;
# doc_id must fit below the shift (2^33 ≈ 8.6e9 docs — raise for a
# larger id space, total key must stay under 2^63)
_BUCKET_KEY_SHIFT = 33


def surprisal_buckets(
    docs_ds,
    k: int = 3,
    ref_lang: str = "en",
    text_column: str = "text",
):
    """(doc_id, bucket) with bucket ∈ 1..k by ascending per-doc
    surprisal — bucket 1 is CCNet's "head" (most reference-like).

    Ranking at scale: ONE distributed sort on the packed
    (surprisal, doc_id) key, then the block-offset prefix-sum trick
    (:func:`argo_ray.functions.packing.running_total`) assigns exact
    global ranks — driver state is one row per BLOCK, never per doc.
    The tile formula is NTILE's: the first ``n % k`` tiles get
    ``n // k + 1`` rows."""
    from .packing import running_total

    scored = lm_surprisal(docs_ds, ref_lang=ref_lang, text_column=text_column)

    def keyed(b: pa.Table) -> pa.Table:
        s = pc.cast(b["surprisal_bits"], pa.int64())
        did = pc.cast(b["doc_id"], pa.int64())
        key = pc.add(
            pc.shift_left(s, pa.scalar(_BUCKET_KEY_SHIFT, pa.int64())), did
        )
        return pa.table(
            {"rank_key": key, "doc_id": did, "one": pa.array([1] * b.num_rows, pa.int64())}
        )

    ranked = running_total(
        scored.map_batches(keyed, batch_format="pyarrow"),
        order_col="rank_key",
        value_col="one",
        out_col="rank",  # inclusive cumsum → 1-based rank
    )
    n = ranked.count()
    q, r = divmod(n, k)

    def tile(b: pa.Table) -> pa.Table:
        r0 = np.asarray(pc.cast(b["rank"], pa.int64()), dtype=np.int64) - 1
        cut = r * (q + 1)
        bucket = np.where(r0 < cut, r0 // (q + 1), r + (r0 - cut) // max(q, 1))
        return pa.table(
            {
                "doc_id": pc.cast(b["doc_id"], pa.int64()),
                "bucket": pa.array(bucket + 1, pa.int64()),
            }
        )

    return ranked.map_batches(tile, batch_format="pyarrow")


def surprisal_buckets_oracle_sql(k: int = 3, ref_lang: str = "en") -> str:
    """NTILE over the unigram-surprisal CTE with the same
    (surprisal, doc_id) tiebreak."""
    inner = lm_surprisal_oracle_sql(ref_lang)
    return f"""WITH s AS ({inner})
SELECT doc_id,
       CAST(NTILE({k}) OVER (ORDER BY surprisal_bits, doc_id) AS BIGINT) AS bucket
FROM s"""

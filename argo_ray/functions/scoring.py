"""Keyword / relevance scoring over a document corpus: integer-weighted
term-frequency scoring (oracle-exact) and BM25 with a distributed
document-frequency pass (float; unit-tested against a local reference).

No reference counterpart; part of the brief-mandated training-data
suite (corpus search / quality-weighted sampling both reduce to "score
every doc against a small query, take the top-k").

Scale shape (100 TB):
- tf extraction is a stateless vectorized ``map_batches`` (split +
  is_in + within-batch group_by) — no shuffle.
- the DF pass for BM25 is the canonical combiner: per-batch DISTINCT
  (word, doc) counts for the query terms only (bounded by |terms| per
  batch), then one tiny global groupby — shuffle volume =
  |terms| × batches.
- final top-k sorts only docs that matched >= 1 term.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# Default query: integer weights over words the synthetic corpus
# actually contains (integer weights → integer scores → exact oracle).
DEFAULT_WEIGHTS = {"data": 3, "join": 2, "vector": 2, "slow": 1}


def _tf_batch(batch: pa.Table, terms: list[str], text_column: str) -> pa.Table:
    """(doc_id, word, tf) for query terms only — vectorized explode +
    is_in filter + within-batch group_by."""
    toks = pc.split_pattern(
        pc.cast(batch[text_column], pa.large_string()), pattern=" "
    )
    flat = pc.list_flatten(toks)
    idx = pc.list_parent_indices(toks)
    keep = pc.is_in(flat, value_set=pa.array(terms, pa.large_string()))
    exploded = pa.table({"i": idx, "word": flat}).filter(keep)
    tf = exploded.group_by(["i", "word"]).aggregate([("word", "count")])
    doc_ids = pc.take(batch["doc_id"], tf["i"])
    return pa.table(
        {
            "doc_id": pc.cast(doc_ids, pa.int64()),
            "word": pc.cast(tf["word"], pa.string()),
            "tf": pc.cast(tf["word_count"], pa.int64()),
        }
    )


def keyword_topk(
    docs_ds,
    weights: dict[str, int] | None = None,
    k: int = 20,
    text_column: str = "text",
):
    """Top-k docs by integer relevance ``sum(tf(term) * weight(term))``
    (ties → smallest doc_id).  Integer-exact, hence SQL-checkable."""
    weights = dict(DEFAULT_WEIGHTS if weights is None else weights)
    terms = sorted(weights)
    warr = np.array([weights[t] for t in terms], dtype=np.int64)

    def score(batch: pa.Table) -> pa.Table:
        tf = _tf_batch(batch, terms, text_column)
        # word -> weight via searchsorted over the sorted term list
        wi = np.searchsorted(terms, np.asarray(tf["word"]).astype(str))
        contrib = np.asarray(tf["tf"], dtype=np.int64) * warr[wi]
        per_doc = (
            pa.table({"doc_id": tf["doc_id"], "part": pa.array(contrib, pa.int64())})
            .group_by("doc_id")
            .aggregate([("part", "sum")])
        )
        return pa.table(
            {
                "doc_id": per_doc["doc_id"],
                "score": pc.cast(per_doc["part_sum"], pa.int64()),
            }
        )

    from ..stages.grouping import sorted_multi_agg

    scored = sorted_multi_agg(
        docs_ds.map_batches(score, batch_format="pyarrow"),
        "doc_id",
        [("doc_id", pa.int64())],
        [("score", "sum", "score", pa.int64())],
    )
    return scored.sort(["score", "doc_id"], descending=[True, False]).limit(k)


def keyword_topk_oracle_sql(
    weights: dict[str, int] | None = None, k: int = 20
) -> str:
    weights = dict(DEFAULT_WEIGHTS if weights is None else weights)
    terms = sorted(weights)
    in_list = ", ".join(f"'{t}'" for t in terms)
    case = " ".join(f"WHEN '{t}' THEN {weights[t]}" for t in terms)
    return f"""WITH w AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
), tf AS (
  SELECT doc_id, word, COUNT(*) AS n FROM w
  WHERE word IN ({in_list}) GROUP BY doc_id, word
)
SELECT doc_id, CAST(SUM(n * CASE word {case} END) AS BIGINT) AS score
FROM tf GROUP BY doc_id
ORDER BY score DESC, doc_id LIMIT {k}"""


def document_frequencies(
    docs_ds, terms: list[str], text_column: str = "text"
) -> dict[str, int]:
    """Distributed DF for the query terms: per-batch DISTINCT
    (doc, term) → count per term (combiner), one tiny global groupby.
    Returns a small driver-side dict (|terms| entries) — the broadcast
    side of BM25."""

    def partial(batch: pa.Table) -> pa.Table:
        tf = _tf_batch(batch, sorted(terms), text_column)
        per_word = tf.group_by("word").aggregate([("doc_id", "count_distinct")])
        return pa.table(
            {
                "word": per_word["word"],
                "df_part": pc.cast(per_word["doc_id_count_distinct"], pa.int64()),
            }
        )

    from ray.data.aggregate import Sum

    out = (
        docs_ds.map_batches(partial, batch_format="pyarrow")
        .groupby("word")
        .aggregate(Sum("df_part", alias_name="df"))
        .take_all()
    )
    return {r["word"]: int(r["df"]) for r in out}


def bm25_topk(
    docs_ds,
    terms: list[str],
    k: int = 20,
    k1: float = 1.5,
    b: float = 0.75,
    text_column: str = "text",
    round6: bool = False,
):
    """BM25 top-k: one DF pass (combiner groupby), one count/avgdl pass,
    then a stateless scoring ``map_batches`` with the (tiny) idf table
    closed over.  Float scores → NOT oracle-checked; unit-tested against
    a local reference implementation.

    NOTE this assumes each doc_id appears in exactly one row (true for
    the documents table); df from per-batch count_distinct then Sum is
    exact under that invariant."""
    terms = sorted(set(terms))
    df = document_frequencies(docs_ds, terms, text_column)
    stats = docs_ds.map_batches(
        lambda t: pa.table(
            {
                "n": pa.array([len(t)], pa.int64()),
                "len_sum": pa.array(
                    [
                        int(
                            pc.sum(
                                pc.list_value_length(
                                    pc.split_pattern(
                                        pc.cast(t[text_column], pa.large_string()),
                                        pattern=" ",
                                    )
                                )
                            ).as_py()
                            or 0
                        )
                    ],
                    pa.int64(),
                ),
            }
        ),
        batch_format="pyarrow",
    ).take_all()
    n_docs = sum(r["n"] for r in stats)
    avgdl = (sum(r["len_sum"] for r in stats) / n_docs) if n_docs else 1.0
    idf = {
        t: float(np.log((n_docs - df.get(t, 0) + 0.5) / (df.get(t, 0) + 0.5) + 1.0))
        for t in terms
    }

    def score(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern(
            pc.cast(batch[text_column], pa.large_string()), pattern=" "
        )
        dl = np.asarray(pc.list_value_length(toks), dtype=np.float64)
        tf = _tf_batch(batch, terms, text_column)
        did_pos = {int(d): i for i, d in enumerate(np.asarray(batch["doc_id"]))}
        scores = np.zeros(len(batch), dtype=np.float64)
        tf_n = np.asarray(tf["tf"], dtype=np.float64)
        tf_doc = np.fromiter(
            (did_pos[int(d)] for d in np.asarray(tf["doc_id"])),
            dtype=np.int64,
            count=len(tf),
        )
        tf_idf = np.fromiter(
            (idf[w] for w in np.asarray(tf["word"]).astype(str)),
            dtype=np.float64,
            count=len(tf),
        )
        denom = tf_n + k1 * (1.0 - b + b * dl[tf_doc] / avgdl)
        np.add.at(scores, tf_doc, tf_idf * tf_n * (k1 + 1.0) / denom)
        matched = scores > 0.0
        return pa.table(
            {
                "doc_id": pc.cast(batch["doc_id"], pa.int64()).filter(
                    pa.array(matched)
                ),
                "score": pa.array(scores[matched], pa.float64()),
            }
        )

    scored = docs_ds.map_batches(score, batch_format="pyarrow")
    if round6:
        # oracle-stable ordering: round BEFORE the sort so a float-ulp
        # difference in the per-term sum order can never flip the
        # boundary of the top-k (same protocol as pagerank/hits)
        scored = scored.map_batches(
            lambda b: pa.table(
                {
                    "doc_id": b["doc_id"],
                    "score": pc.round(pc.cast(b["score"], pa.float64()), ndigits=6),
                }
            ),
            batch_format="pyarrow",
        )
    return scored.sort(["score", "doc_id"], descending=[True, False]).limit(k)

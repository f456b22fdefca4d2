"""BPE tokenizer training over a document corpus — the tokenizer-
construction stage of a training-data pipeline.

Shape at 100 TB (and why it is NOT an iterative corpus scan): classic
BPE training (Sennrich et al. 2016) operates on the word-frequency
table, not the raw corpus.  So the distributed part is ONE wordcount
(per-batch combiner → one groupby — the same plan as docs_vocab), and
the merge loop runs driver-side over that bounded vocabulary.  Applying
the learned merges back to the corpus is a stateless actor-pool
``map_batches`` (merge table built once per actor in ``__init__``).

Determinism: merge selection ties break on the lexicographically
smallest pair, so the merge list is identical across runs, partitions
and cluster sizes.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def word_counts(docs_ds, text_column: str = "text") -> dict[str, int]:
    """Distributed wordcount (the shared combiner-before-groupby plan,
    :func:`argo_ray.functions.text.word_counts_ds`), collected as the
    vocabulary table — bounded by |vocab|, not corpus size."""
    from .text import word_counts_ds

    out = word_counts_ds(docs_ds, text_column).take_all()
    return {r["word"]: int(r["n"]) for r in out if r["word"]}


def train_bpe(
    vocab: dict[str, int], n_merges: int = 20
) -> list[tuple[str, str, int]]:
    """Greedy BPE merge learning on a word-frequency table: each round
    picks the most frequent adjacent symbol pair (ties → smallest pair)
    and fuses it everywhere.  Returns [(left, right, freq)] in merge
    order; freq is the pair's corpus frequency at selection time."""
    words = {w: (list(w), n) for w, n in vocab.items() if w}
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for syms, n in words.values():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + n
        if not pairs:
            break
        (a, b), freq = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((a, b, freq))
        fused = a + b
        for w, (syms, n) in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(fused)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = (out, n)
    return merges


class BpeEncoder:
    """Actor-pool ``map_batches`` stage: apply a learned merge list to
    the text column, appending ``n_bpe_pieces`` (token count after
    merges).  Merge ranks are built once per actor."""

    def __init__(self, merges: list[tuple[str, str, int]]):
        self.ranks = {(a, b): i for i, (a, b, _) in enumerate(merges)}

    def encode_word(self, word: str) -> int:
        syms = list(word)
        while len(syms) > 1:
            best_rank, best_i = None, None
            for i, pair in enumerate(zip(syms, syms[1:])):
                r = self.ranks.get(pair)
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best_i = r, i
            if best_i is None:
                break
            syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
        return len(syms)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        cache: dict[str, int] = {}
        counts = []
        for t in texts:
            total = 0
            for w in t.split(" "):
                if w not in cache:
                    cache[w] = self.encode_word(w)
                total += cache[w]
            counts.append(total)
        return batch.append_column(
            "n_bpe_pieces", pa.array(counts, pa.int64())
        )


def bpe_train_distributed(docs_ds, n_merges: int = 20):
    """ONE distributed wordcount + driver-side merge loop."""
    return train_bpe(word_counts(docs_ds), n_merges)

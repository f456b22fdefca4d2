"""Mojibake detection and repair — the encoding-hygiene stage of a
web-text pipeline.  Crawled pages routinely carry UTF-8 bytes that a
broken layer re-decoded as Latin-1 ("café" → "cafÃ©"); left unfixed
they fragment dedup clusters, corrupt the token vocabulary and leak
garbage literals into the KG.

The repair is the classic ftfy-style round-trip: a string is mojibake
iff it (a) encodes cleanly back to Latin-1 bytes and (b) those bytes
decode as strict UTF-8 to a DIFFERENT string.  Genuine non-Latin text
fails (a) (any codepoint > U+00FF), plain ASCII fails (b)'s
"different" test — both are left untouched, so the repair is
idempotent and safe to run on every batch of a 100 TB corpus.

Scale shape: a cheap vectorized Arrow regex prefilter (UTF-8-as-
Latin-1 lead bytes land in U+00C2–U+00C3/U+00E0–U+00EF) selects the
candidate rows; the per-row codec round-trip — the only non-vectorized
step — runs on those hits only, which on real crawls is a small
percentage of rows.  Zero shuffles, streaming.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# UTF-8 multi-byte sequences misread as Latin-1 always start with a
# lead byte in 0xC2-0xF4 → the mojibake string contains a char in
# U+00C2-U+00F4.  (Â Ã Ä … ô; we match the full lead range.)
MOJIBAKE_HINT_RE = "[Â-ô]"


def repair_text(s: str, max_layers: int = 4) -> tuple[str, bool]:
    """Round-trip repair of one string: returns ``(fixed,
    was_mojibake)``.  Strict codecs both ways — any failure means
    "not mojibake, keep as-is".  Loops to a fixpoint (doubly-encoded
    text — a real crawl phenomenon — peels one layer per pass), with
    ``max_layers`` bounding adversarial inputs; the fixpoint makes the
    whole stage idempotent."""
    flagged = False
    for _ in range(max_layers):
        try:
            raw = s.encode("latin-1")
        except UnicodeEncodeError:
            return s, flagged
        try:
            fixed = raw.decode("utf-8")
        except UnicodeDecodeError:
            return s, flagged
        if fixed == s:
            return s, flagged
        s, flagged = fixed, True
    return s, flagged


def repair_mojibake_batch(batch: pa.Table, text_column: str = "text") -> pa.Table:
    """``map_batches`` UDF: repairs ``text_column`` in place and
    appends a ``was_mojibake`` bool column.  Vectorized prefilter,
    per-row codec round-trip on hits only."""
    text = pc.cast(batch[text_column], pa.string())
    hint = pc.fill_null(
        pc.match_substring_regex(text, MOJIBAKE_HINT_RE), False
    )
    if not pc.any(hint).as_py():
        return batch.set_column(
            batch.column_names.index(text_column), text_column, text
        ).append_column(
            "was_mojibake", pa.array([False] * batch.num_rows, pa.bool_())
        )
    vals = text.to_pylist()
    hints = hint.to_pylist()
    flags = [False] * len(vals)
    for i, (v, h) in enumerate(zip(vals, hints)):
        if h and v is not None:
            vals[i], flags[i] = repair_text(v)
    return batch.set_column(
        batch.column_names.index(text_column),
        text_column,
        pa.array(vals, pa.string()),
    ).append_column("was_mojibake", pa.array(flags, pa.bool_()))


def repair_mojibake(ds, text_column: str = "text"):
    """Dataset wrapper: streaming zero-shuffle repair stage."""
    return ds.map_batches(
        lambda b: repair_mojibake_batch(b, text_column),
        batch_format="pyarrow",
    )

"""Embedded JSON-LD extraction from HTML ``<script
type="application/ld+json">`` blocks — the third (and in today's web,
the dominant) structured-data syntax next to RDFa (``rdfa.py``) and
microdata (``microdata.py``).  Script payloads route through the
expanded-form JSON-LD parser (``sinks/jsonld.py``); each block is
independent, a page may carry several, and any block that fails to
decode or parse quarantines silently (the repo-wide ``on_error="skip"``
contract) without dropping the page's OTHER blocks.
"""

from __future__ import annotations

import re

import pyarrow as pa

from ..sinks.jsonld import parse_jsonld
from ..terms import append_subject_hash, triples_to_table

_LDJSON_RE = re.compile(
    r"<script[^>]*type=\"application/ld\+json\"[^>]*>(.*?)</script>",
    re.DOTALL | re.IGNORECASE,
)


def extract_jsonld(html: str) -> list[tuple]:
    """One page → triples from every parseable ld+json block.

    ``parse_jsonld`` is imported at MODULE level: a lazy import inside
    this function runs on the Ray worker, fails with
    ModuleNotFoundError when the driver cwd is not the repo, and the
    per-block quarantine would swallow it into silent 0-row output
    (the exact bug class the verify drive from /tmp exists to catch —
    it did)."""
    triples: list[tuple] = []
    for m in _LDJSON_RE.finditer(html):
        try:
            triples.extend(parse_jsonld(m.group(1)))
        except Exception:
            continue  # quarantine THIS block, keep the rest
    return triples


def extract_jsonld_batch(
    batch: pa.Table,
    html_column: str = "html",
    url_column: str = "url",
    on_error: str = "skip",
) -> pa.Table:
    """pages batch → flattened triples batch (same shape/contract as
    ``extract_rdfa_batch`` / ``extract_microdata_batch``)."""
    htmls = batch[html_column].to_pylist()
    urls = batch[url_column].to_pylist()
    rows: list[tuple] = []
    row_urls: list[str] = []
    for raw, url in zip(htmls, urls):
        try:
            if raw is None:
                continue
            html = raw.decode("utf-8") if isinstance(raw, (bytes, bytearray)) else raw
            triples = extract_jsonld(html)
        except Exception:
            if on_error == "raise":
                raise
            continue
        rows.extend(triples)
        row_urls.extend([url] * len(triples))
    table = triples_to_table(rows, urls=row_urls, with_hash=False)
    return append_subject_hash(table)

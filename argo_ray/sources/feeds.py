"""Atom feed parsing (RFC 4287) — the third leg of crawl discovery
next to sitemaps and robots: feeds announce NEW content, so an
incremental crawl polls them instead of re-walking sites.  Entries
carry ``<id>``, ``<title>``, ``<updated>`` and ``<link href>``.

Vectorized extractor shape shared with the sitemap/OG/hreflang family:
ONE ``split_pattern`` on ``<entry>`` + anchored ``extract_regex``;
poison bytes quarantine.  The synthesizer is a strict function of the
documents row (one feed per block, entries = docs) so the DuckDB
oracle reconstructs entries relationally.
"""

from __future__ import annotations

import datetime as _dt

import pyarrow as pa
import pyarrow.compute as pc

# module-level import (worker-executed UDF; lazy relative imports break
# under the /tmp driver-contract drive)
from ..pages import page_url, title_of

_ENTRY_RE = (
    r"^\s*<id>(?P<id>[^<]*)</id>"
    r"\s*<title>(?P<title>[^<]*)</title>"
    r"\s*<updated>(?P<updated>[^<]*)</updated>"
    r'\s*<link href="(?P<href>[^"]*)"/>'
)

_BASE = _dt.datetime(2024, 1, 1, tzinfo=_dt.timezone.utc)


def synth_feed_batch(batch: pa.Table) -> pa.Table:
    """documents rows → ONE Atom feed document per block; entry id =
    ``urn:doc:{doc_id}``, updated = 2024-01-01T00:00:00Z + doc_id
    hours, link = the page URL."""
    ids = batch["doc_id"].to_pylist()
    texts = batch["text"].to_pylist()
    sources = batch["source"].to_pylist()
    parts = [
        '<?xml version="1.0" encoding="utf-8"?>',
        '<feed xmlns="http://www.w3.org/2005/Atom">',
        "<title>crawl feed</title>",
    ]
    for did, text, src in zip(ids, texts, sources):
        updated = (_BASE + _dt.timedelta(hours=int(did))).strftime(
            "%Y-%m-%dT%H:%M:%SZ"
        )
        parts.append(
            f"<entry> <id>urn:doc:{did}</id> <title>{title_of(text)}</title> "
            f'<updated>{updated}</updated> <link href="{page_url(src, did)}"/> '
            "</entry>"
        )
    parts.append("</feed>")
    return pa.table({"xml": pa.array(["\n".join(parts)], pa.string())})


def parse_feed_batch(batch: pa.Table) -> pa.Table:
    """Atom feed rows → one row per entry:
    ``(entry_id, title, updated, href)``."""
    try:
        xml = pc.cast(batch["xml"], pa.large_string())
    except pa.ArrowInvalid:
        xml = pa.array(
            [
                v.as_py().decode("utf-8", errors="replace") if v.is_valid else None
                for v in batch["xml"]
            ],
            pa.large_string(),
        )
    segs = pc.split_pattern(xml, "<entry>")
    segs = pc.list_slice(segs, 1)
    flat = pc.list_flatten(segs)
    hit = pc.extract_regex(pc.cast(flat, pa.string()), _ENTRY_RE)
    hit = pc.filter(hit, pc.is_valid(hit))
    return pa.table(
        {
            "entry_id": pc.struct_field(hit, "id"),
            "title": pc.struct_field(hit, "title"),
            "updated": pc.struct_field(hit, "updated"),
            "href": pc.struct_field(hit, "href"),
        }
    )

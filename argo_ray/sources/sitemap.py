"""sitemaps.org XML parsing — the crawl-frontier seed list every
polite crawler reads before fetching (public sitemaps.org protocol):
``<urlset>`` of ``<url>`` entries carrying ``<loc>``, ``<lastmod>``
and ``<priority>``.  The parse feeds frontier scheduling (recency ×
priority ordering) and change detection (lastmod vs the stored
capture).

Same vectorized shape as the other extractors here: ONE
``split_pattern`` on ``<url>`` + anchored ``extract_regex`` over the
flattened segments; undecodable bytes quarantine per the batch-parser
contract.  The synthesizer emits one sitemap file per input block —
deterministic per row so the DuckDB oracle reconstructs the expected
entries relationally.
"""

from __future__ import annotations

import datetime as _dt

import pyarrow as pa
import pyarrow.compute as pc

_ENTRY_RE = (
    r"^\s*<loc>(?P<loc>[^<]*)</loc>"
    r"\s*<lastmod>(?P<lastmod>[^<]*)</lastmod>"
    r"\s*<priority>(?P<priority>[^<]*)</priority>"
)

_BASE = _dt.date(2024, 1, 1)


def synth_sitemap_batch(batch: pa.Table) -> pa.Table:
    """documents rows → ONE sitemap XML (string) per block: loc = the
    page URL, lastmod = 2024-01-01 + doc_id days, priority =
    '0.'||(5 + doc_id%5) — all strict functions of the row."""
    ids = batch["doc_id"].to_pylist()
    sources = batch["source"].to_pylist()
    parts = ['<?xml version="1.0" encoding="UTF-8"?>']
    parts.append('<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">')
    for did, src in zip(ids, sources):
        loc = f"https://docs.example.org/{src}/{did}"
        lastmod = (_BASE + _dt.timedelta(days=int(did))).isoformat()
        prio = f"0.{5 + int(did) % 5}"
        parts.append(
            f"<url> <loc>{loc}</loc> <lastmod>{lastmod}</lastmod> "
            f"<priority>{prio}</priority> </url>"
        )
    parts.append("</urlset>")
    return pa.table({"xml": pa.array(["\n".join(parts)], pa.string())})


def parse_sitemap_batch(batch: pa.Table) -> pa.Table:
    """sitemap XML rows → one row per ``<url>`` entry:
    ``(loc, lastmod, priority)`` with priority parsed to double."""
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
    segs = pc.split_pattern(xml, "<url>")
    segs = pc.list_slice(segs, 1)
    flat = pc.list_flatten(segs)
    hit = pc.extract_regex(pc.cast(flat, pa.string()), _ENTRY_RE)
    ok = pc.is_valid(hit)
    hit = pc.filter(hit, ok)
    return pa.table(
        {
            "loc": pc.struct_field(hit, "loc"),
            "lastmod": pc.struct_field(hit, "lastmod"),
            "priority": pc.cast(pc.struct_field(hit, "priority"), pa.float64()),
        }
    )


_INDEX_ENTRY_RE = (
    r"^\s*<loc>(?P<loc>[^<]*)</loc>"
    r"\s*<lastmod>(?P<lastmod>[^<]*)</lastmod>"
)


def synth_sitemap_index_batch(batch: pa.Table, shards: int = 2) -> pa.Table:
    """distinct-source rows (``source`` column) → ONE
    ``<sitemapindex>`` per source listing its ``shards`` member
    sitemaps (sitemaps.org caps urlsets at 50k entries, so real sites
    shard and publish an index — the two-level discovery every large
    crawl resolves first)."""
    sources = batch["source"].to_pylist()
    hosts, xmls = [], []
    for src in sources:
        parts = ['<?xml version="1.0" encoding="UTF-8"?>']
        parts.append(
            '<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
        )
        for s in range(shards):
            parts.append(
                "<sitemap> "
                f"<loc>https://docs.example.org/{src}/sitemap-{s}.xml</loc> "
                "<lastmod>2024-01-01</lastmod> "
                "</sitemap>"
            )
        parts.append("</sitemapindex>")
        hosts.append(f"docs.example.org/{src}")
        xmls.append("\n".join(parts))
    return pa.table(
        {
            "host": pa.array(hosts, pa.string()),
            "xml": pa.array(xmls, pa.string()),
        }
    )


def parse_sitemap_index_batch(batch: pa.Table) -> pa.Table:
    """sitemap-index XML rows → one row per member sitemap:
    ``(host, sitemap_url, lastmod)`` — the fetch list the second-level
    urlset parse consumes.  Same vectorized split+regex shape; poison
    bytes quarantine."""
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
    segs = pc.split_pattern(xml, "<sitemap>")
    segs = pc.list_slice(segs, 1)
    flat = pc.list_flatten(segs)
    parents = pc.list_parent_indices(segs)
    hit = pc.extract_regex(pc.cast(flat, pa.string()), _INDEX_ENTRY_RE)
    ok = pc.is_valid(hit)
    hosts = pc.take(pc.cast(batch["host"], pa.string()), pc.filter(parents, ok))
    hit = pc.filter(hit, ok)
    return pa.table(
        {
            "host": hosts,
            "sitemap_url": pc.struct_field(hit, "loc"),
            "lastmod": pc.struct_field(hit, "lastmod"),
        }
    )

"""Open Graph protocol extraction (the public ogp.me convention) — the
fourth HTML metadata syntax next to RDFa / microdata / JSON-LD: pages
describe themselves with ``<meta property="og:*" content="..."/>`` head
elements; social cards and news aggregators read nothing else, so a web
KG that skips OG loses the page-self-description signal entirely.

Same vectorized extractor shape as the siblings: ONE ``split_pattern``
on ``<meta `` + anchored ``extract_regex`` over flattened segments
(attribute order fixed property-then-content, regex stays inside the
tag), poison bytes quarantined.  The synthesizer emits per-page head
fixtures that are strict functions of the documents row so the DuckDB
oracle reconstructs the expected (url, property, content) rows
relationally.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# module-level import: a lazy relative import inside a worker-executed
# UDF raises ModuleNotFoundError only when the driver cwd is not the
# repo (regression class caught by the /tmp driver-contract drive)
from ..pages import page_url, title_of

_OG_RE = r'^[^>]*property="(?P<property>og:[^"]*)"[^>]*content="(?P<content>[^"]*)"'


def synth_og_batch(batch: pa.Table) -> pa.Table:
    """documents rows → pages ``(url, html)`` whose head carries the
    four OG basics: og:title (first five words), og:type ('article'),
    og:url (self), og:locale (lang) — plus a decoy non-OG meta tag the
    extractor must skip."""
    ids = batch["doc_id"].to_pylist()
    texts = batch["text"].to_pylist()
    langs = batch["lang"].to_pylist()
    sources = batch["source"].to_pylist()
    urls, htmls = [], []
    for did, text, lang, src in zip(ids, texts, langs, sources):
        url = page_url(src, did)
        title = title_of(text)
        htmls.append(
            "<head>"
            f'<meta property="og:title" content="{title}"/>'
            '<meta property="og:type" content="article"/>'
            f'<meta property="og:url" content="{url}"/>'
            f'<meta property="og:locale" content="{lang}"/>'
            '<meta name="viewport" content="width=device-width"/>'
            "</head>"
        )
        urls.append(url)
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "html": pa.array(htmls, pa.string()),
        }
    )


def extract_og_batch(batch: pa.Table) -> pa.Table:
    """pages ``(url, html)`` → one row per OG meta element:
    ``(src_url, property, content)``."""
    try:
        html = pc.cast(batch["html"], pa.large_string())
    except pa.ArrowInvalid:
        html = pa.array(
            [
                v.as_py().decode("utf-8", errors="replace") if v.is_valid else None
                for v in batch["html"]
            ],
            pa.large_string(),
        )
    segs = pc.split_pattern(html, "<meta ")
    segs = pc.list_slice(segs, 1)
    flat = pc.list_flatten(segs)
    parents = pc.list_parent_indices(segs)
    hit = pc.extract_regex(pc.cast(flat, pa.string()), _OG_RE)
    ok = pc.is_valid(hit)
    src = pc.take(pc.cast(batch["url"], pa.string()), pc.filter(parents, ok))
    hit = pc.filter(hit, ok)
    return pa.table(
        {
            "src_url": src,
            "property": pc.struct_field(hit, "property"),
            "content": pc.struct_field(hit, "content"),
        }
    )

"""URL canonicalization — the normalization pass a web-crawl corpus
runs before URL-keyed dedup (cf. the crawl-recency dedup in
pipelines/data_queries.py::q_pages_url_dedup, which assumes already-
canonical URLs).

Rules (applied in order, all RE2 regexes so the DuckDB oracle mirrors
them literally):

1. strip the fragment (``#...``)
2. lowercase the scheme
3. lowercase the host; strip a ``:80``/``:443`` default port and a
   leading ``www.``
4. drop tracking query params (``utm_*``, ``gclid``, ``fbclid``)
5. re-point the first ``&`` to ``?`` when the leading param was dropped
6. strip a trailing ``?``/``&``, collapse ``//+`` runs in the
   path+query, strip trailing slashes

Path/query case and non-tracking params are preserved.  Rules 4/6 are
deliberate canonical-form choices (a ``//`` inside a query string is
also collapsed); they are applied identically by the oracle SQL in
data_queries.py, so parity holds for any input.

Everything is vectorized pyarrow (``replace_substring_regex`` /
``extract_regex`` / ``utf8_lower``); no per-row Python.  At 100 TB this
is a pure streaming map stage — no shuffle, no state.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

_TRACKING = r"[?&](utm_[A-Za-z0-9_]*|gclid|fbclid)=[^&#]*"
_SCHEME = r"^[A-Za-z][A-Za-z0-9+.\-]*://"


def canonical_url_array(urls) -> pa.Array:
    """Canonical form of each URL (large_string array in, out)."""
    u = pc.cast(urls, pa.large_string())
    ls = lambda s: pa.scalar(s, pa.large_string())  # noqa: E731
    u = pc.replace_substring_regex(u, pattern=r"#.*$", replacement="")
    ext = pc.extract_regex(u, pattern=r"^(?P<s>[A-Za-z][A-Za-z0-9+.\-]*)://")
    # scheme-less URLs: extract_regex yields null, DuckDB regexp_extract
    # yields '' — fill to keep Ray/oracle parity instead of propagating
    # null through the joins (which would nullify the whole canon)
    scheme = pc.fill_null(pc.utf8_lower(pc.struct_field(ext, "s")), "")
    rest = pc.replace_substring_regex(
        u, pattern=_SCHEME, replacement="", max_replacements=1
    )
    hext = pc.extract_regex(rest, pattern=r"^(?P<h>[^/?]*)")
    host = pc.utf8_lower(pc.struct_field(hext, "h"))
    host = pc.replace_substring_regex(host, pattern=r":(80|443)$", replacement="")
    host = pc.replace_substring_regex(host, pattern=r"^www\.", replacement="")
    tail = pc.replace_substring_regex(
        rest, pattern=r"^[^/?]*", replacement="", max_replacements=1
    )
    tail = pc.replace_substring_regex(tail, pattern=_TRACKING, replacement="")
    tail = pc.replace_substring_regex(
        tail, pattern=r"^([^?]*)&", replacement=r"\1?", max_replacements=1
    )
    tail = pc.replace_substring_regex(tail, pattern=r"[?&]+$", replacement="")
    tail = pc.replace_substring_regex(tail, pattern=r"//+", replacement="/")
    tail = pc.replace_substring_regex(tail, pattern=r"/+$", replacement="")
    host_tail = pc.binary_join_element_wise(host, tail, ls(""))
    out = pc.binary_join_element_wise(scheme, host_tail, ls("://"))
    if isinstance(out, pa.ChunkedArray):
        out = out.combine_chunks()
    return out


def canonicalize_url_batch(
    batch: pa.Table, url_column: str = "url", out_column: str = "url_canon"
) -> pa.Table:
    """``map_batches`` UDF: append the canonical form of ``url_column``."""
    if out_column in batch.column_names:
        batch = batch.drop_columns([out_column])
    return batch.append_column(out_column, canonical_url_array(batch[url_column]))


def surt_key_array(urls) -> pa.Array:
    """SURT key (Sort-friendly URI Reordering Transform, the web-archive
    convention — Heritrix/OpenWayback public docs) of each URL:
    ``scheme://a.b.c/path?q`` → ``c,b,a)/path?q``.  Reversing the host
    labels makes one site's pages (and one registrable domain's hosts)
    lexicographic neighbours, so a plain ``sort`` on the key co-locates
    a site — the standard pre-pass for per-site crawl indexes and
    range-partitioned CDX files.

    Input is assumed already canonical (:func:`canonical_url_array`);
    the transform here is scheme strip → host-label reversal (joined
    with ``,``) → ``)`` → path+query verbatim.

    Vectorization: the regex strip/extract steps are pyarrow kernels;
    the label reversal itself runs once per DISTINCT host via
    ``dictionary_encode`` (hosts per batch ≪ rows per batch on any web
    corpus), then fans back out with ``take`` — no per-row Python.
    """
    u = pc.cast(urls, pa.large_string())
    rest = pc.replace_substring_regex(
        u, pattern=_SCHEME, replacement="", max_replacements=1
    )
    hext = pc.extract_regex(rest, pattern=r"^(?P<h>[^/?]*)")
    host = pc.fill_null(pc.struct_field(hext, "h"), "")
    tail = pc.replace_substring_regex(
        rest, pattern=r"^[^/?]*", replacement="", max_replacements=1
    )
    dic = pc.dictionary_encode(host)
    if isinstance(dic, pa.ChunkedArray):
        dic = dic.combine_chunks()
    rev = pa.array(
        [",".join(reversed(h.split("."))) if h is not None else None
         for h in dic.dictionary.to_pylist()],
        pa.large_string(),
    )
    rev_host = rev.take(dic.indices)
    ls = pa.scalar("", pa.large_string())
    out = pc.binary_join_element_wise(
        pc.binary_join_element_wise(rev_host, pa.scalar(")", pa.large_string()), ls),
        tail,
        ls,
    )
    if isinstance(out, pa.ChunkedArray):
        out = out.combine_chunks()
    return out


def surt_key_batch(
    batch: pa.Table, url_column: str = "url_canon", out_column: str = "surt"
) -> pa.Table:
    """``map_batches`` UDF: append the SURT key of ``url_column``."""
    if out_column in batch.column_names:
        batch = batch.drop_columns([out_column])
    return batch.append_column(out_column, surt_key_array(batch[url_column]))

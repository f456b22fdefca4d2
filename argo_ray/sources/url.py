"""URL-backed RDF source — the reference's ``ParseURL``/``ParseHTTP``
fan-in glue (``/root/reference/graph.go:313-335``,
``rdf/rdf.go:94-144``), as an OPT-IN Ray Data source.

The engine's default stance stays no-network-mid-pipeline (this sandbox
has no egress, and a surprise mid-job download is an operational
hazard); a cluster that *does* have egress opts in by calling
:func:`read_urls` explicitly (or ``python -m argo_ray.rdf --url ...``).
``file://`` URLs work everywhere and are what the tests exercise — the
fetch path is identical for ``http(s)://``.

Format resolution per URL mirrors the reference's order
(``graph.go:318-326``): explicit override > the response Content-Type
via the S8 registry (:func:`~argo_ray.sources.registry.
format_from_mime_type`) > the URL path's extension
(:func:`~argo_ray.sources.registry.format_from_filename`) > error.

Scale shape: the URL list becomes a Dataset (``from_items``) and every
fetch+parse happens INSIDE ``map_batches`` tasks — a million-URL crawl
list is N parallel fetch tasks across the cluster, never a driver-side
download loop.  Each URL doubles as the document URI and the
blank-node salt for label-generating parsers (rdfxml/squirtle/rdfa) so
two documents' anonymous nodes never collide after fan-in; N-Triples
keeps document labels as-is (same rules as the file sources).  Fetch
failures quarantine into an ``errors`` side channel
per batch rather than killing the job (``on_error="quarantine"``) —
resumability beats completeness on a crawl.
"""

from __future__ import annotations

import pyarrow as pa

# worker-side code (the _FetchParse actor) must reference MODULE
# globals: a lazy relative import inside a function executed on a Ray
# worker raises ModuleNotFoundError('argo_ray') whenever the driver
# cwd is not the repo (workers receive this module by value and have
# no importable argo_ray on sys.path) — the exact bug class the /tmp
# driver-contract drive exists to catch
from ..terms import append_subject_hash, triples_to_table
from .registry import FORMATS, format_from_filename, format_from_mime_type


def fetch_url(url: str, timeout: float = 30.0) -> tuple[str, str | None]:
    """→ (decoded text, Content-Type or None).  Stdlib urllib only —
    handles ``file://`` (always available) and ``http(s)://`` (needs
    egress).  Charset from the Content-Type header when present, UTF-8
    with replacement otherwise."""
    import urllib.request

    with urllib.request.urlopen(url, timeout=timeout) as resp:  # noqa: S310
        raw = resp.read()
        headers = getattr(resp, "headers", None)
        ctype = headers.get_content_type() if headers else None
        charset = (headers.get_content_charset() if headers else None) or "utf-8"
    return raw.decode(charset, "replace"), ctype


def resolve_format(url: str, content_type: str | None = None, override: str | None = None):
    """Reference resolution order (graph.go:318-326); raises
    ``ValueError`` when nothing matches."""
    if override is not None:
        if override not in FORMATS:
            raise ValueError(f"unknown format id: {override!r}")
        return FORMATS[override]
    if content_type:
        fmt = format_from_mime_type(content_type)
        # text/plain is urllib's guess for anything unknown over file://;
        # only trust a mime hit that isn't the catch-all default
        if fmt is not None and content_type != "text/plain":
            return fmt
    path = url.split("?", 1)[0].split("#", 1)[0]
    fmt = format_from_filename(path)
    if fmt is not None:
        return fmt
    if content_type:
        fmt = format_from_mime_type(content_type)
        if fmt is not None:
            return fmt
    raise ValueError(f"cannot infer RDF format for {url!r} (content_type={content_type!r})")


class _FetchParse:
    """Actor-pool stage: fetch each URL of the batch, resolve its
    format, parse with the registry parser (URL as document URI and
    blank-node salt), emit one flattened triples table.  Failures
    append to the per-batch quarantine instead of raising when
    ``on_error='quarantine'``."""

    def __init__(self, override: str | None = None, on_error: str = "quarantine",
                 timeout: float = 30.0):
        if on_error not in ("quarantine", "raise"):
            raise ValueError("on_error must be quarantine|raise")
        self.override = override
        self.on_error = on_error
        self.timeout = timeout

    def __call__(self, batch: pa.Table) -> pa.Table:
        triples = []
        row_urls: list[str] = []
        errors: list[tuple[str, str]] = []
        for url in batch["url"].to_pylist():
            try:
                text, ctype = fetch_url(url, timeout=self.timeout)
                fmt = resolve_format(url, ctype, self.override)
                if fmt.parser is None:
                    raise ValueError(f"format {fmt.id} has no parser")
                # quad formats (nquads/trig) yield 4-tuples; the URL
                # source targets a triples graph (the reference's
                # Graph.ParseURL) — drop the graph position
                parsed = [t[:3] for t in fmt.parser(text, url, url)]
                triples.extend(parsed)
                row_urls.extend([url] * len(parsed))
            except Exception as e:  # noqa: BLE001 — crawl quarantine
                if self.on_error == "raise":
                    raise
                errors.append((url, f"{type(e).__name__}: {e}"))
        # same layout as the file batch parsers (url provenance +
        # subject hash) so URL parts union with file parts directly
        out = append_subject_hash(triples_to_table(triples, urls=row_urls, with_hash=False))
        n = out.num_rows
        out = out.append_column("source_error", pa.nulls(n, pa.large_string()))
        if errors:
            err_tbl = append_subject_hash(
                triples_to_table([], urls=[], with_hash=False)
            ).append_column("source_error", pa.array([], pa.large_string()))
            err = pa.table(
                {
                    name: (
                        pa.array([m for _, m in errors], pa.large_string())
                        if name == "source_error"
                        else pa.array([u for u, _ in errors], pa.string())
                        if name == "url"
                        else pa.nulls(len(errors), err_tbl.schema.field(name).type)
                    )
                    for name in err_tbl.column_names
                }
            )
            out = pa.concat_tables([out, err])
        return out


def read_urls(
    urls: list[str],
    format: str | None = None,  # noqa: A002 — reference arg name
    on_error: str = "quarantine",
    concurrency: int = 2,
    urls_per_task: int = 8,
):
    """Triples Dataset from a URL list, in the file batch parsers'
    layout (``url`` provenance + triple columns + subject hash) plus a
    ``source_error`` column: null on parsed rows, the error message on
    quarantined fetch/parse failures (whose ``url`` carries the failed
    URL) — filter ``source_error IS NULL`` for the clean stream, its
    complement for the crawl error report."""
    import ray.data as rd

    from ..io import configure_context

    configure_context()
    ds = rd.from_items([{"url": u} for u in urls])
    return ds.map_batches(
        _FetchParse,
        batch_format="pyarrow",
        batch_size=urls_per_task,
        concurrency=concurrency,
        fn_constructor_kwargs={"override": format, "on_error": on_error},
    )


def read_url(url: str, format: str | None = None):  # noqa: A002
    """Single-URL convenience; failures raise."""
    return read_urls([url], format=format, on_error="raise", concurrency=1)

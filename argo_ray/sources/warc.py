"""WARC 1.0 record serializer + parser — the container format of the
Common-Crawl corpus the north-star pipeline ingests (public ISO 28500 /
IIPC WARC spec).  A crawl shard is a stream of records; each
``response`` record is a header block (``WARC/1.0`` + name:value lines,
terminated by a blank line) followed by exactly ``Content-Length``
payload bytes (an HTTP response whose body is the page) and a blank
record separator.

Parsing is OFFSET-BASED on ``Content-Length`` — the payload may itself
contain ``WARC/1.0`` (pages quoting WARC) without desynchronizing the
scan, which is the property a split-on-delimiter parser gets wrong.
Non-``response`` records (``warcinfo``, ``request``, ``metadata``) are
skipped, matching how a CC pipeline reads only the response stream.

Distributed shape: one WARC *file* per input block (the serializer) and
one record loop per file (the parser) — records are page-sized so the
per-record Python is the same cost class as the reference's per-page
parser goroutines (``/root/reference/graph.go:281-311``); everything
around it stays Arrow.  Poison files (garbage bytes, truncated
payloads) quarantine silently under ``on_error="skip"`` — the contract
every batch parser here follows.
"""

from __future__ import annotations

import datetime as _dt

import pyarrow as pa

_EPOCH = _dt.datetime(1970, 1, 1, tzinfo=_dt.timezone.utc)

WARC_PAGES_SCHEMA = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("warc_ts", pa.timestamp("us")),
        pa.field("html", pa.binary()),
    ]
)


def _iso(us: int) -> str:
    t = _EPOCH + _dt.timedelta(microseconds=us)
    return t.strftime("%Y-%m-%dT%H:%M:%SZ")


def _parse_iso(s: str) -> int:
    t = _dt.datetime.strptime(s, "%Y-%m-%dT%H:%M:%SZ").replace(
        tzinfo=_dt.timezone.utc
    )
    return int((t - _EPOCH).total_seconds()) * 1_000_000


def warc_serialize_batch(batch: pa.Table) -> pa.Table:
    """pages ``(url, warc_ts, html, ...)`` → ONE WARC file (binary) per
    block, led by a ``warcinfo`` record the parser must skip."""
    urls = batch["url"].to_pylist()
    tss = batch["warc_ts"].cast(pa.int64()).to_pylist()
    htmls = batch["html"].to_pylist()

    info_payload = b"software: argo_ray\r\nformat: WARC File Format 1.0\r\n"
    recs = [
        b"WARC/1.0\r\n"
        b"WARC-Type: warcinfo\r\n"
        b"Content-Type: application/warc-fields\r\n"
        + f"Content-Length: {len(info_payload)}\r\n\r\n".encode()
        + info_payload
        + b"\r\n\r\n"
    ]
    for url, ts, html in zip(urls, tss, htmls):
        html = html or b""
        http = (
            "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
            f"Content-Length: {len(html)}\r\n\r\n"
        ).encode()
        payload = http + html
        head = (
            "WARC/1.0\r\n"
            "WARC-Type: response\r\n"
            f"WARC-Target-URI: {url}\r\n"
            f"WARC-Date: {_iso(int(ts))}\r\n"
            "Content-Type: application/http;msgtype=response\r\n"
            f"Content-Length: {len(payload)}\r\n"
            "\r\n"
        ).encode()
        recs.append(head + payload + b"\r\n\r\n")
    return pa.table({"warc": pa.array([b"".join(recs)], pa.binary())})


def _parse_one_file(blob: bytes) -> list[tuple[str, int, bytes]]:
    out = []
    pos = 0
    n = len(blob)
    while pos < n:
        start = blob.find(b"WARC/1.0\r\n", pos)
        if start < 0:
            break
        head_end = blob.find(b"\r\n\r\n", start)
        if head_end < 0:
            break
        headers: dict[str, str] = {}
        for line in blob[start + 10 : head_end].split(b"\r\n"):
            k, _, v = line.partition(b":")
            if v:
                headers[k.strip().decode("ascii", "replace").lower()] = (
                    v.strip().decode("ascii", "replace")
                )
        try:
            length = int(headers["content-length"])
        except (KeyError, ValueError):
            break  # malformed header block: cannot resync safely
        body_start = head_end + 4
        body_end = body_start + length
        if body_end > n:
            break  # truncated payload
        if headers.get("warc-type") == "response":
            uri = headers.get("warc-target-uri")
            date = headers.get("warc-date")
            payload = blob[body_start:body_end]
            http_end = payload.find(b"\r\n\r\n")
            if uri is not None and date is not None and http_end >= 0:
                try:
                    ts = _parse_iso(date)
                except ValueError:
                    ts = None
                if ts is not None:
                    out.append((uri, ts, payload[http_end + 4 :]))
        pos = body_end + 4  # skip the record separator
    return out


def parse_warc_batch(batch: pa.Table, on_error: str = "skip") -> pa.Table:
    """WARC files (``warc`` binary column) → pages
    ``(url, warc_ts, html)``; one output row per response record."""
    urls: list[str] = []
    tss: list[int] = []
    htmls: list[bytes] = []
    for v in batch["warc"]:
        if not v.is_valid:
            continue
        try:
            for uri, ts, html in _parse_one_file(v.as_py()):
                urls.append(uri)
                tss.append(ts)
                htmls.append(html)
        except Exception:
            if on_error != "skip":
                raise
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
        }
    )


# ---------------------------------------------------------------------------
# WET (extracted-text "conversion" records) — the Common-Crawl artifact
# LLM-pretraining pipelines actually consume.  Same container grammar
# as WARC above, but records are ``WARC-Type: conversion`` with a
# text/plain payload and NO embedded HTTP message.
# ---------------------------------------------------------------------------


def wet_serialize_batch(batch: pa.Table) -> pa.Table:
    """pages ``(url, warc_ts, text, ...)`` → ONE WET file (binary) per
    block, led by the same ``warcinfo`` record the parser must skip."""
    urls = batch["url"].to_pylist()
    tss = batch["warc_ts"].cast(pa.int64()).to_pylist()
    texts = batch["text"].to_pylist()

    info_payload = b"software: argo_ray\r\nformat: WARC File Format 1.0 (WET)\r\n"
    recs = [
        b"WARC/1.0\r\n"
        b"WARC-Type: warcinfo\r\n"
        b"Content-Type: application/warc-fields\r\n"
        + f"Content-Length: {len(info_payload)}\r\n\r\n".encode()
        + info_payload
        + b"\r\n\r\n"
    ]
    for url, ts, text in zip(urls, tss, texts):
        payload = (text or "").encode("utf-8")
        head = (
            "WARC/1.0\r\n"
            "WARC-Type: conversion\r\n"
            f"WARC-Target-URI: {url}\r\n"
            f"WARC-Date: {_iso(int(ts))}\r\n"
            "Content-Type: text/plain\r\n"
            f"Content-Length: {len(payload)}\r\n"
            "\r\n"
        ).encode()
        recs.append(head + payload + b"\r\n\r\n")
    return pa.table({"wet": pa.array([b"".join(recs)], pa.binary())})


def _parse_wet_file(blob: bytes) -> list[tuple[str, int, str]]:
    out = []
    pos = 0
    n = len(blob)
    while pos < n:
        start = blob.find(b"WARC/1.0\r\n", pos)
        if start < 0:
            break
        head_end = blob.find(b"\r\n\r\n", start)
        if head_end < 0:
            break
        headers: dict[str, str] = {}
        for line in blob[start + 10 : head_end].split(b"\r\n"):
            k, _, v = line.partition(b":")
            if v:
                headers[k.strip().decode("ascii", "replace").lower()] = (
                    v.strip().decode("ascii", "replace")
                )
        try:
            length = int(headers["content-length"])
        except (KeyError, ValueError):
            break  # malformed header block: cannot resync safely
        body_start = head_end + 4
        body_end = body_start + length
        if body_end > n:
            break  # truncated payload
        if headers.get("warc-type") == "conversion":
            uri = headers.get("warc-target-uri")
            date = headers.get("warc-date")
            if uri is not None and date is not None:
                try:
                    ts = _parse_iso(date)
                except ValueError:
                    ts = None
                if ts is not None:
                    out.append(
                        (uri, ts, blob[body_start:body_end].decode("utf-8", "replace"))
                    )
        pos = body_end + 4
    return out


def parse_wet_batch(batch: pa.Table, on_error: str = "skip") -> pa.Table:
    """WET files (``wet`` binary column) → ``(url, warc_ts, text)``;
    one output row per conversion record; warcinfo and any response
    records are skipped; poison bytes quarantine silently."""
    urls: list[str] = []
    tss: list[int] = []
    texts: list[str] = []
    for v in batch["wet"]:
        if not v.is_valid:
            continue
        try:
            for uri, ts, text in _parse_wet_file(v.as_py()):
                urls.append(uri)
                tss.append(ts)
                texts.append(text)
        except Exception:
            if on_error != "skip":
                raise
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.timestamp("us")),
            "text": pa.array(texts, pa.string()),
        }
    )


def warc_serialize_status_batch(batch: pa.Table) -> pa.Table:
    """``warc_serialize_batch`` twin for corpora that carry an HTTP
    ``status`` column (and optional ``content_type``): response records
    embed the given status line instead of a constant 200 — the input
    for status-gated ingest."""
    urls = batch["url"].to_pylist()
    tss = batch["warc_ts"].cast(pa.int64()).to_pylist()
    htmls = batch["html"].to_pylist()
    statuses = batch["status"].to_pylist()
    ctypes = (
        batch["content_type"].to_pylist()
        if "content_type" in batch.column_names
        else ["text/html"] * len(urls)
    )
    _REASON = {200: "OK", 301: "Moved Permanently", 404: "Not Found",
               500: "Internal Server Error", 503: "Service Unavailable"}
    recs = []
    for url, ts, html, status, ctype in zip(urls, tss, htmls, statuses, ctypes):
        html = html or b""
        reason = _REASON.get(int(status), "Unknown")
        http = (
            f"HTTP/1.1 {int(status)} {reason}\r\nContent-Type: {ctype}\r\n"
            f"Content-Length: {len(html)}\r\n\r\n"
        ).encode()
        payload = http + html
        head = (
            "WARC/1.0\r\n"
            "WARC-Type: response\r\n"
            f"WARC-Target-URI: {url}\r\n"
            f"WARC-Date: {_iso(int(ts))}\r\n"
            "Content-Type: application/http;msgtype=response\r\n"
            f"Content-Length: {len(payload)}\r\n"
            "\r\n"
        ).encode()
        recs.append(head + payload + b"\r\n\r\n")
    return pa.table({"warc": pa.array([b"".join(recs)], pa.binary())})


def parse_warc_http_batch(batch: pa.Table, on_error: str = "skip") -> pa.Table:
    """WARC files → per-response HTTP envelope rows ``(url, status,
    content_type, n_bytes)`` — the status/type gate every ingest runs
    before spending extraction compute (CC keeps 200 text/* only).
    Shares the container scan with :func:`parse_warc_batch`; the HTTP
    status line and headers are parsed here instead of stripped."""
    import re as _re

    status_re = _re.compile(rb"^HTTP/1\.[01] (\d{3})")
    ct_re = _re.compile(rb"(?im)^content-type:\s*([^\r\n;]+)")
    urls: list[str] = []
    statuses: list[int] = []
    ctypes: list[str] = []
    sizes: list[int] = []
    for v in batch["warc"]:
        if not v.is_valid:
            continue
        try:
            blob = v.as_py()
            pos = 0
            n = len(blob)
            while pos < n:
                start = blob.find(b"WARC/1.0\r\n", pos)
                if start < 0:
                    break
                head_end = blob.find(b"\r\n\r\n", start)
                if head_end < 0:
                    break
                headers: dict[str, str] = {}
                for line in blob[start + 10 : head_end].split(b"\r\n"):
                    k, _, val = line.partition(b":")
                    if val:
                        headers[k.strip().decode("ascii", "replace").lower()] = (
                            val.strip().decode("ascii", "replace")
                        )
                try:
                    length = int(headers["content-length"])
                except (KeyError, ValueError):
                    break
                body_start = head_end + 4
                body_end = body_start + length
                if body_end > n:
                    break
                if headers.get("warc-type") == "response":
                    uri = headers.get("warc-target-uri")
                    payload = blob[body_start:body_end]
                    http_end = payload.find(b"\r\n\r\n")
                    m = status_re.match(payload)
                    if uri is not None and http_end >= 0 and m:
                        cm = ct_re.search(payload[:http_end])
                        urls.append(uri)
                        statuses.append(int(m.group(1)))
                        ctypes.append(
                            cm.group(1).strip().decode("ascii", "replace")
                            if cm
                            else ""
                        )
                        sizes.append(length - http_end - 4)
                pos = body_end + 4
        except Exception:
            if on_error != "skip":
                raise
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "status": pa.array(statuses, pa.int64()),
            "content_type": pa.array(ctypes, pa.string()),
            "n_bytes": pa.array(sizes, pa.int64()),
        }
    )

"""SPARQL SELECT/ASK result parser (operator S6).

Reimplements the semantics of the reference's streaming XML result
parser (``/root/reference/sparql/result.go:97-518``): the W3C ``<sparql>``
results document → header variables + one ``{var: Term}`` row per
``<result>``; boolean documents → a bool.  The reference used a 12-state
hand-rolled state machine over a network stream; here a document is the
unit of work inside ``map_batches`` (documents are the parallel axis),
so ``xml.etree`` on the full document is simpler and equivalent.

No in-pipeline HTTP: result documents arrive as a text column (fetched
upstream or read from storage), matching the no-network rule.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

import pyarrow as pa

from ..terms import Blank, IRI, Literal, Term

_NS = "{http://www.w3.org/2005/sparql-results#}"


def _binding_term(el) -> Term:
    """<uri>/<bnode>/<literal> → Term (result.go:341-420 semantics:
    literal lang from xml:lang, datatype attr; unknown elements are an
    error)."""
    tag = el.tag.removeprefix(_NS)
    text = el.text or ""
    if tag == "uri":
        return IRI(text)
    if tag == "bnode":
        return Blank(text)
    if tag == "literal":
        lang = el.get("{http://www.w3.org/XML/1998/namespace}lang", "")
        datatype = el.get("datatype", "")
        return Literal(text, lang=lang, datatype=datatype)
    raise ValueError(f"unknown binding element: {tag}")


def parse_select_results(doc: str) -> tuple[list[str], list[dict[str, Term]]]:
    """SELECT results document → (variables, rows)."""
    root = ET.fromstring(doc)
    variables = [
        v.get("name")
        for v in root.findall(f"{_NS}head/{_NS}variable")
    ]
    rows: list[dict[str, Term]] = []
    for result in root.findall(f"{_NS}results/{_NS}result"):
        row: dict[str, Term] = {}
        for b in result.findall(f"{_NS}binding"):
            children = list(b)
            if children:
                row[b.get("name")] = _binding_term(children[0])
        rows.append(row)
    return variables, rows


def parse_ask_result(doc: str) -> bool:
    """ASK document → bool (result.go's boolean branch)."""
    root = ET.fromstring(doc)
    b = root.find(f"{_NS}boolean")
    if b is None or b.text is None:
        raise ValueError("not a boolean result document")
    return b.text.strip().lower() == "true"


def parse_select_batch(
    batch: pa.Table, text_column: str = "text", doc_column: str = "doc_id"
) -> pa.Table:
    """``map_batches`` UDF: result documents → flattened binding rows
    (doc_id, row_idx, var, kind, value, lang, datatype)."""
    doc_ids, row_idxs, vars_, kinds, values, langs, dts = [], [], [], [], [], [], []
    ids = (
        batch[doc_column].to_pylist()
        if doc_column in batch.column_names
        else list(range(batch.num_rows))
    )
    for did, doc in zip(ids, batch[text_column].to_pylist()):
        _, rows = parse_select_results(doc)
        for i, row in enumerate(rows):
            for var, term in row.items():
                doc_ids.append(did)
                row_idxs.append(i)
                vars_.append(var)
                kinds.append(term.kind)
                values.append(term.value)
                langs.append(term.lang)
                dts.append(term.datatype)
    return pa.table(
        {
            "doc_id": pa.array(doc_ids),
            "row_idx": pa.array(row_idxs, pa.int32()),
            "var": pa.array(vars_, pa.string()),
            "kind": pa.array(kinds, pa.uint8()),
            "value": pa.array(values, pa.large_string()),
            "lang": pa.array(langs, pa.string()),
            "datatype": pa.array(dts, pa.string()),
        }
    )


_PREFIX_DECL_RE = None


def trim_prefixes(line: str, prefixes: dict[str, str]) -> str:
    """Strip leading ``PREFIX x: <u> .`` declarations off a query line
    into the session prefix map, returning the remainder — operator M12
    (``sparql/sparql/sparqlclient.go:17,99-107``; regex kept
    structurally identical: case-insensitive PREFIX, ``\\w+`` name,
    greedy ``<...>`` IRI, optional trailing dot)."""
    global _PREFIX_DECL_RE
    if _PREFIX_DECL_RE is None:
        import re

        _PREFIX_DECL_RE = re.compile(
            r"^\s*[pP][rR][eE][fF][iI][xX]\s+(\w+)\s*:\s*<(.+?)>\s*\.\s*"
        )
    m = _PREFIX_DECL_RE.match(line)
    if m:
        prefixes[m.group(1)] = m.group(2)
        return trim_prefixes(line[m.end():], prefixes)
    return line


# -- SPARQL 1.1 results JSON parser (format-family sibling of the XML
# parser above; spec: https://www.w3.org/TR/sparql11-results-json/) ----


def _json_term(b: dict) -> Term:
    t = b.get("type")
    if t == "uri":
        return IRI(b["value"])
    if t == "bnode":
        return Blank(b["value"])
    if t in ("literal", "typed-literal"):
        return Literal(
            b["value"],
            lang=b.get("xml:lang", ""),
            datatype=b.get("datatype", ""),
        )
    raise ValueError(f"unknown binding type: {t!r}")


def parse_select_results_json(doc: str) -> tuple[list[str], list[dict[str, Term]]]:
    import json

    d = json.loads(doc)
    variables = list(d.get("head", {}).get("vars", []))
    rows = [
        {v: _json_term(b) for v, b in binding.items()}
        for binding in d.get("results", {}).get("bindings", [])
    ]
    return variables, rows


def parse_ask_result_json(doc: str) -> bool:
    import json

    d = json.loads(doc)
    if "boolean" not in d:
        raise ValueError("not an ASK result document")
    return bool(d["boolean"])


# -- SPARQL 1.1 results TSV (text/tab-separated-values; spec:
# https://www.w3.org/TR/sparql11-results-csv-tsv/) -------------------------
# TSV carries full SPARQL term syntax, so it is the LOSSLESS text
# sibling (CSV is spreadsheet-bound by spec §3 — serializer only).


def parse_select_results_tsv(doc: str) -> tuple[list[str], list[dict[str, Term]]]:
    """TSV results document → (variables, binding rows) — the same
    shape the XML/JSON parsers return.  Cell parsing is the vectorized
    inverse renderer over ALL cells at once (one arrow array), not a
    per-cell Python parse."""
    import pyarrow as pa

    from ..terms import nt_parse_term_arrays

    lines = doc.split("\n")
    if lines and lines[-1] == "":
        lines.pop()
    if not lines:
        return [], []
    variables = [v.lstrip("?") for v in lines[0].split("\t")]
    grid = [line.split("\t") for line in lines[1:]]
    flat = [
        (cell if cell != "" else None)
        for row in grid
        for cell in (row + [""] * (len(variables) - len(row)))
    ]
    parsed = nt_parse_term_arrays(pa.array(flat, pa.large_string()))
    flatten = {
        k: (a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a)
        for k, a in parsed.items()
    }
    rows: list[dict[str, Term]] = []
    nv = len(variables)
    for i in range(len(grid)):
        row: dict[str, Term] = {}
        for j, v in enumerate(variables):
            k = flatten["kind"][i * nv + j].as_py()
            if k is None:
                continue
            row[v] = Term(
                k,
                flatten["value"][i * nv + j].as_py(),
                flatten["lang"][i * nv + j].as_py() or "",
                flatten["datatype"][i * nv + j].as_py() or "",
            )
        rows.append(row)
    return variables, rows

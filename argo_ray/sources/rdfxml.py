"""RDF/XML parser (operator S2).

Reimplements the reference's streaming 4-state machine over XML tokens
(``/root/reference/rdfxml.go:30-35,65-177``) on top of expat (chunked
character-data events, like Go's ``encoding/xml``):

- ``stateTop``: expect the ``<rdf:RDF>`` root;
- ``stateDescriptions``: each child is a description — ``rdf:about`` →
  Resource subject, ``rdf:nodeID`` → BlankNode, neither → anonymous
  (skolemized deterministically, replacing ``NewAnonNode()``'s random id,
  rdfxml.go:116-118); a non-``rdf:Description`` tag emits an ``rdf:type``
  triple (:120-122); remaining attributes emit literal triples (:124-126);
- ``stateProperties``: property attrs ``rdf:resource``/``rdf:nodeID``
  short-circuit to an object triple; ``rdf:datatype``/``xml:lang`` set
  pending literal metadata; any other attribute is an error (:142-161);
- ``statePropertyValue``: each character-data chunk emits a literal triple
  with the pending language/datatype (:167-174).

Predicate/type IRIs are ``namespace + local`` concatenated with no
separator (name2Term, rdfxml.go:59-61).
"""

from __future__ import annotations

import xml.parsers.expat

import pyarrow as pa

from ..sources.rdfa import skolem_id
from ..terms import (
    A,
    IRI,
    Blank,
    Literal,
    RDF_NS,
    Term,
    append_subject_hash,
    triples_to_table,
)

_NS_SEP = "\x01"
_XML_NS = "http://www.w3.org/XML/1998/namespace"

_RDF_RDF = RDF_NS + _NS_SEP + "RDF"
_RDF_DESCRIPTION = RDF_NS + _NS_SEP + "Description"
_RDF_ABOUT = RDF_NS + _NS_SEP + "about"
_RDF_NODEID = RDF_NS + _NS_SEP + "nodeID"
_RDF_RESOURCE = RDF_NS + _NS_SEP + "resource"
_RDF_DATATYPE = RDF_NS + _NS_SEP + "datatype"

_TOP, _DESCRIPTIONS, _PROPERTIES, _PROPERTY_VALUE = range(4)


class RDFXMLParseError(ValueError):
    pass


def _name_to_iri(expat_name: str) -> str:
    """xml.Name{Space, Local} → Space+Local concatenation (rdfxml.go:59-61)."""
    if _NS_SEP in expat_name:
        space, local = expat_name.split(_NS_SEP, 1)
        return space + local
    return expat_name


def _is_xml_lang(attr_name: str) -> bool:
    return attr_name in ("xml:lang", _XML_NS + _NS_SEP + "lang")


def parse_rdfxml(
    text: str, document_uri: str = "", salt: str = ""
) -> list[tuple[Term, Term, Term]]:
    """Parse one RDF/XML document into scalar triples."""
    triples: list[tuple[Term, Term, Term]] = []
    state = [_TOP]
    subject: list[Term | None] = [None]
    predicate: list[Term | None] = [None]
    language: list[str] = [""]
    datatype: list[str] = [""]
    anon_counter = [0]
    errors: list[str] = []

    parser = xml.parsers.expat.ParserCreate(namespace_separator=_NS_SEP)
    # Coalesce text into single CharacterData events (Go's encoding/xml
    # resolves entities into one contiguous CharData token; bare expat
    # would split at every entity and emit one triple per chunk).
    parser.buffer_text = True

    def start(name: str, attrs: dict) -> None:
        if errors:
            return
        if state[0] == _TOP:
            if name != _RDF_RDF:
                errors.append("Syntax error: expected <rdf:RDF>")
                return
            state[0] = _DESCRIPTIONS
        elif state[0] == _DESCRIPTIONS:
            subj: Term | None = None
            extra: list[tuple[str, str]] = []
            for aname, avalue in attrs.items():
                if aname == _RDF_ABOUT:
                    subj = IRI(avalue)
                elif aname == _RDF_NODEID:
                    subj = Blank(avalue)
                else:
                    extra.append((aname, avalue))
            if subj is None:
                subj = Blank(skolem_id(document_uri, anon_counter[0], salt))
                anon_counter[0] += 1
            subject[0] = subj
            if name != _RDF_DESCRIPTION:
                triples.append((subj, A, IRI(_name_to_iri(name))))
            for aname, avalue in extra:
                triples.append((subj, IRI(_name_to_iri(aname)), Literal(avalue)))
            state[0] = _PROPERTIES
        elif state[0] == _PROPERTIES:
            predicate[0] = IRI(_name_to_iri(name))
            language[0] = ""
            datatype[0] = ""
            state[0] = _PROPERTY_VALUE
            for aname, avalue in attrs.items():
                if aname == _RDF_RESOURCE:
                    # Go `continue loop`s with state already
                    # statePropertyValue (rdfxml.go:142-150): any chardata
                    # inside still emits a literal triple — keep that.
                    triples.append((subject[0], predicate[0], IRI(avalue)))
                    return
                if aname == _RDF_NODEID:
                    triples.append((subject[0], predicate[0], Blank(avalue)))
                    return
                if aname == _RDF_DATATYPE:
                    datatype[0] = avalue
                elif _is_xml_lang(aname):
                    language[0] = avalue
                else:
                    errors.append(f"Invalid attribute on property tag: {aname}")
                    return

    def end(name: str) -> None:
        if errors:
            return
        if state[0] == _PROPERTY_VALUE:
            state[0] = _PROPERTIES
        elif state[0] == _PROPERTIES:
            state[0] = _DESCRIPTIONS
        elif state[0] == _DESCRIPTIONS:
            pass  # </rdf:RDF>

    def chardata(data: str) -> None:
        if errors:
            return
        if state[0] == _PROPERTY_VALUE:
            triples.append(
                (
                    subject[0],
                    predicate[0],
                    Literal(data, lang=language[0], datatype=datatype[0]),
                )
            )

    parser.StartElementHandler = start
    parser.EndElementHandler = end
    parser.CharacterDataHandler = chardata
    try:
        parser.Parse(text, True)
    except xml.parsers.expat.ExpatError as exc:
        raise RDFXMLParseError(str(exc)) from exc
    if errors:
        raise RDFXMLParseError(errors[0])
    return triples


def parse_rdfxml_batch(
    batch: pa.Table,
    text_column: str = "text",
    url_column: str | None = "url",
    salt: str = "",
    on_error: str = "raise",
) -> pa.Table:
    """Stateless ``map_batches`` UDF: RDF/XML documents → flattened
    triples (documents are the parallel unit)."""
    texts = batch[text_column].to_pylist()
    urls = batch[url_column].to_pylist() if url_column else [""] * len(texts)
    rows: list[tuple[Term, Term, Term]] = []
    row_urls: list[str] = []
    for text, url in zip(texts, urls):
        if isinstance(text, bytes):
            text = text.decode("utf-8", errors="replace")
        try:
            triples = parse_rdfxml(text, document_uri=url or "", salt=salt)
        except RDFXMLParseError:
            if on_error == "raise":
                raise
            continue
        rows.extend(triples)
        row_urls.extend([url] * len(triples))
    table = triples_to_table(rows, urls=row_urls, with_hash=False)
    return append_subject_hash(table)

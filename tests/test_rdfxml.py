"""Table-driven RDF/XML parser suite (operator S2), authored in the
reference's ntriples_test.go style since the reference ships no RDF/XML
tests — cases derive from the state machine at
/root/reference/rdfxml.go:65-177."""

import pytest

from argo_ray.sources.rdfxml import RDFXMLParseError, parse_rdfxml
from argo_ray.terms import A, Blank, IRI, Literal

RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
EX = "http://example.org/ns#"

HEAD = f'<rdf:RDF xmlns:rdf="{RDF}" xmlns:ex="{EX}">'
FOOT = "</rdf:RDF>"


POSITIVE = [
    # rdf:about → Resource subject; chardata → plain literal
    (
        HEAD + '<rdf:Description rdf:about="http://e/s">'
        "<ex:p>v</ex:p></rdf:Description>" + FOOT,
        [(IRI("http://e/s"), IRI(EX + "p"), Literal("v"))],
    ),
    # rdf:nodeID → blank-node subject
    (
        HEAD + '<rdf:Description rdf:nodeID="b1"><ex:p>v</ex:p></rdf:Description>' + FOOT,
        [(Blank("b1"), IRI(EX + "p"), Literal("v"))],
    ),
    # non-Description element name → rdf:type triple (rdfxml.go:120-122)
    (
        HEAD + '<ex:Thing rdf:about="http://e/s"/>' + FOOT,
        [(IRI("http://e/s"), A, IRI(EX + "Thing"))],
    ),
    # extra description attributes → literal triples (rdfxml.go:124-126)
    (
        HEAD + '<rdf:Description rdf:about="http://e/s" ex:name="N"/>' + FOOT,
        [(IRI("http://e/s"), IRI(EX + "name"), Literal("N"))],
    ),
    # rdf:resource property attr → IRI object (rdfxml.go:142-150)
    (
        HEAD + '<rdf:Description rdf:about="http://e/s">'
        '<ex:p rdf:resource="http://e/o"/></rdf:Description>' + FOOT,
        [(IRI("http://e/s"), IRI(EX + "p"), IRI("http://e/o"))],
    ),
    # rdf:nodeID property attr → blank-node object (rdfxml.go:151-153)
    (
        HEAD + '<rdf:Description rdf:about="http://e/s">'
        '<ex:p rdf:nodeID="b2"/></rdf:Description>' + FOOT,
        [(IRI("http://e/s"), IRI(EX + "p"), Blank("b2"))],
    ),
    # rdf:datatype → typed literal (rdfxml.go:154-156)
    (
        HEAD + '<rdf:Description rdf:about="http://e/s">'
        f'<ex:p rdf:datatype="http://t">7</ex:p></rdf:Description>' + FOOT,
        [(IRI("http://e/s"), IRI(EX + "p"), Literal("7", datatype="http://t"))],
    ),
    # xml:lang → language literal (rdfxml.go:157-158)
    (
        HEAD + '<rdf:Description rdf:about="http://e/s">'
        '<ex:p xml:lang="fr">sept</ex:p></rdf:Description>' + FOOT,
        [(IRI("http://e/s"), IRI(EX + "p"), Literal("sept", lang="fr"))],
    ),
    # entity resolution coalesces into ONE literal (buffer_text — Go's
    # encoding/xml emits one contiguous CharData token)
    (
        HEAD + '<rdf:Description rdf:about="http://e/s">'
        "<ex:p>a &amp; b</ex:p></rdf:Description>" + FOOT,
        [(IRI("http://e/s"), IRI(EX + "p"), Literal("a & b"))],
    ),
    # several properties under one subject
    (
        HEAD + '<rdf:Description rdf:about="http://e/s">'
        "<ex:p>1</ex:p><ex:q>2</ex:q></rdf:Description>" + FOOT,
        [
            (IRI("http://e/s"), IRI(EX + "p"), Literal("1")),
            (IRI("http://e/s"), IRI(EX + "q"), Literal("2")),
        ],
    ),
]


@pytest.mark.parametrize("doc,expected", POSITIVE)
def test_rdfxml_positive(doc, expected):
    assert parse_rdfxml(doc) == expected


def test_anonymous_subject_skolemized():
    """No rdf:about / rdf:nodeID → deterministic skolem id replacing the
    reference's random NewAnonNode (rdfxml.go:116-118, term.go:149-151)."""
    doc = HEAD + "<ex:Thing><ex:p>v</ex:p></ex:Thing>" + FOOT
    t1 = parse_rdfxml(doc, document_uri="http://d/1")
    t2 = parse_rdfxml(doc, document_uri="http://d/1")
    t3 = parse_rdfxml(doc, document_uri="http://d/2")
    assert t1 == t2  # deterministic
    assert t1[0][0].kind == 1 and t1[0][0].value.startswith("anon")
    assert t1[0][0] != t3[0][0]  # per-document identity


NEGATIVE = [
    "<notrdf/>",  # missing rdf:RDF root
    HEAD + '<rdf:Description rdf:about="http://e/s">'
    '<ex:p ex:bogus="x">v</ex:p></rdf:Description>' + FOOT,  # invalid property attr (rdfxml.go:159-161)
    HEAD + "<rdf:Description><ex:p>unclosed",  # malformed XML
]


@pytest.mark.parametrize("doc", NEGATIVE)
def test_rdfxml_negative(doc):
    with pytest.raises(RDFXMLParseError):
        parse_rdfxml(doc)

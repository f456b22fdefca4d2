"""TriG parser/serializer (named-graph Turtle, quad twin of K4)."""

import pyarrow as pa
import pytest

from argo_ray.sinks.trig import serialize_trig
from argo_ray.sources.trig import parse_trig, parse_trig_batch
from argo_ray.sources.turtle import TurtleParseError
from argo_ray.terms import IRI, Blank, Literal, Term, triples_to_table

DOC = '''@prefix ex: <http://example.org/ns#> .

<http://d/default>
  ex:p "top level" ;
  .

<http://g1> {
<http://a>
  ex:p "v{1}" ;
  ex:q <http://b> ;
  .

}

_:g2 {
_:b1
  ex:p "x"@en ;
  .

}
'''


def test_parse_graph_sections_and_default():
    quads = parse_trig(DOC)
    assert [q[3] for q in quads] == [
        Term(0, ""), IRI("http://g1"), IRI("http://g1"), Blank("g2"),
    ]
    assert quads[1][2] == Literal("v{1}")  # brace inside literal survives
    assert quads[3][2] == Literal("x", lang="en")


def test_serialize_roundtrip_identity():
    quads = parse_trig(DOC)
    t = triples_to_table([(s, p, o) for s, p, o, _ in quads], with_hash=False)
    t = t.append_column("graph_kind",
                        pa.array([g.kind for *_, g in quads], pa.int64()))
    t = t.append_column("graph_value",
                        pa.array([g.value for *_, g in quads], pa.large_string()))
    out = serialize_trig(t, {"http://example.org/ns#": "ex"})
    assert sorted(parse_trig(out)) == sorted(quads)


def test_unterminated_section_raises():
    with pytest.raises(TurtleParseError):
        parse_trig('<http://g> {\n<http://a>\n  <http://p> "x" ;\n  .\n')


def test_poison_documents_quarantined():
    bad = pa.table(
        {"text": [DOC, "<http://g> { garbage"], "url": ["good", "bad"]}
    )
    out = parse_trig_batch(bad, on_error="skip")
    assert set(out["url"].to_pylist()) == {"good"}
    assert out.num_rows == 4


def test_brace_inside_iri_is_not_a_graph_section():
    quads = parse_trig('<http://a/{b}>\n  <http://p> "v" ;\n  .\n')
    assert len(quads) == 1
    assert quads[0][0] == IRI("http://a/{b}")
    assert quads[0][3] == Term(0, "")

    # and inside a named section too
    doc = '<http://g> {\n<http://a/{b}>\n  <http://p> "v" ;\n  .\n\n}\n'
    quads = parse_trig(doc)
    assert [q[3] for q in quads] == [IRI("http://g")]

"""N-Quads parser/serializer (the named-graph extension of S1/K1)."""

import pyarrow as pa
import pytest

from argo_ray.sinks.nquads import serialize_nquads, to_nq_lines_batch
from argo_ray.sources.nquads import (
    ERR_GRAPH_TERM,
    NTriplesParseError,
    parse_nquads,
    parse_nquads_batch,
)
from argo_ray.terms import IRI, Blank, Literal, Term, triples_to_table

DOC = """# header comment
<http://a> <http://p> "lit"@en <http://g> .
<http://a> <http://p> "42"^^<http://www.w3.org/2001/XMLSchema#integer> .
_:b1 <http://p> <http://a> _:g2 .
"""


def test_parse_quads_and_default_graph():
    quads = parse_nquads(DOC)
    assert [q[3] for q in quads] == [
        IRI("http://g"),
        Term(0, ""),  # default graph
        Blank("g2"),
    ]
    assert quads[0][2] == Literal("lit", lang="en")


def test_roundtrip_identity():
    quads = parse_nquads(DOC)
    batch = pa.table({"text": [DOC], "url": ["u"]})
    flattened = parse_nquads_batch(batch)
    assert parse_nquads(serialize_nquads(flattened)) == quads


def test_literal_graph_label_rejected():
    with pytest.raises(NTriplesParseError) as e:
        parse_nquads('<http://a> <http://p> "x" "notagraph" .')
    assert ERR_GRAPH_TERM in str(e.value)


def test_poison_documents_quarantined():
    bad = pa.table(
        {
            "text": [DOC, "<http://a> <http://p> oops", "<http://a>"],
            "url": ["good", "bad1", "bad2"],
        }
    )
    out = parse_nquads_batch(bad, on_error="skip")
    assert out.num_rows == 3
    assert set(out["url"].to_pylist()) == {"good"}


def test_nq_lines_triple_form_for_default_graph():
    t = triples_to_table([(IRI("http://a"), IRI("http://p"), Literal("v"))],
                         with_hash=False)
    t = t.append_column("graph_kind", pa.array([0], pa.int64()))
    t = t.append_column("graph_value", pa.array([""], pa.large_string()))
    assert to_nq_lines_batch(t)["line"].to_pylist() == [
        '<http://a> <http://p> "v" .'
    ]

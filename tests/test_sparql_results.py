"""S6 SPARQL result parser: W3C XML results → Term rows / bool
(semantics of /root/reference/sparql/result.go:97-518)."""

import pyarrow as pa
import pytest

from argo_ray.sources.sparql_results import (
    parse_ask_result,
    parse_select_batch,
    parse_select_results,
)
from argo_ray.terms import Blank, IRI, Literal

SELECT_DOC = """<?xml version="1.0"?>
<sparql xmlns="http://www.w3.org/2005/sparql-results#">
  <head><variable name="s"/><variable name="o"/></head>
  <results>
    <result>
      <binding name="s"><uri>http://example.org/a</uri></binding>
      <binding name="o"><literal xml:lang="en">hello</literal></binding>
    </result>
    <result>
      <binding name="s"><bnode>b0</bnode></binding>
      <binding name="o"><literal datatype="http://www.w3.org/2001/XMLSchema#integer">42</literal></binding>
    </result>
    <result>
      <binding name="s"><uri>http://example.org/c</uri></binding>
    </result>
  </results>
</sparql>"""

ASK_TRUE = """<sparql xmlns="http://www.w3.org/2005/sparql-results#">
  <head/><boolean>true</boolean></sparql>"""
ASK_FALSE = """<sparql xmlns="http://www.w3.org/2005/sparql-results#">
  <head/><boolean>false</boolean></sparql>"""


def test_select_parse():
    variables, rows = parse_select_results(SELECT_DOC)
    assert variables == ["s", "o"]
    assert rows[0] == {"s": IRI("http://example.org/a"), "o": Literal("hello", lang="en")}
    assert rows[1] == {
        "s": Blank("b0"),
        "o": Literal("42", datatype="http://www.w3.org/2001/XMLSchema#integer"),
    }
    assert rows[2] == {"s": IRI("http://example.org/c")}  # unbound o omitted


def test_ask_parse():
    assert parse_ask_result(ASK_TRUE) is True
    assert parse_ask_result(ASK_FALSE) is False
    with pytest.raises(ValueError):
        parse_ask_result(SELECT_DOC)


def test_select_batch_udf():
    batch = pa.table({"doc_id": [7], "text": [SELECT_DOC]})
    out = parse_select_batch(batch)
    assert out.num_rows == 5  # 2 + 2 + 1 bindings
    assert set(out["var"].to_pylist()) == {"s", "o"}
    assert out["doc_id"].to_pylist() == [7] * 5


def test_trim_prefixes_m12():
    """M12: leading PREFIX declarations strip into the session map;
    the query body is returned unchanged (sparqlclient.go:99-107)."""
    from argo_ray.sources.sparql_results import trim_prefixes

    prefixes = {}
    rest = trim_prefixes(
        "PREFIX foaf: <http://xmlns.com/foaf/0.1/> . "
        "prefix dc: <http://purl.org/dc/elements/1.1/> . "
        "SELECT ?s WHERE { ?s foaf:name ?n }",
        prefixes,
    )
    assert rest == "SELECT ?s WHERE { ?s foaf:name ?n }"
    assert prefixes == {
        "foaf": "http://xmlns.com/foaf/0.1/",
        "dc": "http://purl.org/dc/elements/1.1/",
    }
    # non-prefix lines pass through untouched
    assert trim_prefixes("ASK { ?s ?p ?o }", prefixes) == "ASK { ?s ?p ?o }"


# -- serializer: the S6 parser's write twin --------------------------------


def test_results_xml_roundtrip_terms():
    from argo_ray.sinks.sparql_results import (
        serialize_ask_result, serialize_select_results,
    )
    from argo_ray.sources.sparql_results import (
        parse_ask_result, parse_select_results,
    )
    from argo_ray.terms import Blank, IRI, Literal

    rows = [
        {"s": IRI("http://e.org/a<b&c"), "o": Literal('say "hi"\n')},
        {"s": Blank("b1"), "o": Literal("Grüße", lang="de")},
        {"s": IRI("http://e.org/x"),
         "o": Literal("7", datatype="http://www.w3.org/2001/XMLSchema#integer")},
        {"s": IRI("http://e.org/unbound-o")},  # omitted binding
    ]
    doc = serialize_select_results(["s", "o"], rows)
    variables, back = parse_select_results(doc)
    assert variables == ["s", "o"]
    assert back == rows
    assert parse_ask_result(serialize_ask_result(True)) is True
    assert parse_ask_result(serialize_ask_result(False)) is False


def test_results_xml_from_dataset(ray_session):
    import ray.data

    from argo_ray.sinks.sparql_results import select_dataset_to_xml
    from argo_ray.sources.sparql_results import parse_select_results
    from argo_ray.sparql import evaluate_select
    from argo_ray.terms import IRI, Literal, RDF_TYPE, triples_to_table

    EX = "http://example.org/ns#"
    trips = [
        (IRI(EX + "d1"), IRI(RDF_TYPE), IRI(EX + "Doc")),
        (IRI(EX + "d1"), IRI(EX + "lang"), Literal("en")),
        (IRI(EX + "d2"), IRI(RDF_TYPE), IRI(EX + "Doc")),
    ]
    ds = ray.data.from_arrow(triples_to_table(trips, with_hash=False))
    out = evaluate_select(
        ds,
        f"""PREFIX ex: <{EX}>
        SELECT ?s ?l WHERE {{
          ?s a ex:Doc . OPTIONAL {{ ?s ex:lang ?l }}
        }} ORDER BY ?s""",
    )
    doc = select_dataset_to_xml(out, ["s", "l"])
    variables, rows = parse_select_results(doc)
    assert variables == ["s", "l"]
    assert rows == [
        {"s": IRI(EX + "d1"), "l": Literal("en")},
        {"s": IRI(EX + "d2")},  # unbound ?l omitted
    ]


def test_results_json_roundtrip():
    from argo_ray.sinks.sparql_results import (
        serialize_ask_result_json, serialize_select_results_json,
    )
    from argo_ray.sources.sparql_results import (
        parse_ask_result_json, parse_select_results_json,
    )
    from argo_ray.terms import Blank, IRI, Literal

    rows = [
        {"s": IRI("http://e.org/a"), "o": Literal('say "hi"')},
        {"s": Blank("b1"), "o": Literal("Grüße", lang="de")},
        {"s": IRI("http://e.org/x"),
         "o": Literal("7", datatype="http://www.w3.org/2001/XMLSchema#integer")},
        {"s": IRI("http://e.org/partial")},
    ]
    doc = serialize_select_results_json(["s", "o"], rows)
    variables, back = parse_select_results_json(doc)
    assert variables == ["s", "o"] and back == rows
    assert parse_ask_result_json(serialize_ask_result_json(True)) is True
    assert parse_ask_result_json(serialize_ask_result_json(False)) is False


def test_results_csv_tsv():
    from argo_ray.sinks.sparql_results import (
        serialize_select_results_csv, serialize_select_results_tsv,
    )
    from argo_ray.terms import IRI, Literal

    rows = [
        {"s": IRI("http://e.org/a"), "o": Literal('v,"x"')},
        {"s": IRI("http://e.org/b")},
    ]
    csv_doc = serialize_select_results_csv(["s", "o"], rows)
    assert csv_doc.splitlines() == [
        "s,o", 'http://e.org/a,"v,""x"""', "http://e.org/b,"
    ]
    tsv_doc = serialize_select_results_tsv(["s", "o"], rows)
    assert tsv_doc.splitlines() == [
        "?s\t?o",
        '<http://e.org/a>\t"v,\\"x\\""',
        "<http://e.org/b>\t",
    ]


def test_tsv_serialize_parse_roundtrip_terms():
    """TSV is the lossless text format: every term kind (IRI, blank,
    plain/lang/typed literal) and an unbound cell survive the loop."""
    from argo_ray.sinks.sparql_results import serialize_select_results_tsv
    from argo_ray.sources.sparql_results import parse_select_results_tsv
    from argo_ray.terms import Term

    rows = [
        {"a": Term(0, "http://x.org/1", "", ""), "b": Term(2, "plain", "", "")},
        {"a": Term(1, "bn1", "", ""), "b": Term(2, "chat", "fr", "")},
        {
            "a": Term(0, "http://x.org/2", "", ""),
            "b": Term(2, "4", "", "http://www.w3.org/2001/XMLSchema#integer"),
        },
        {"b": Term(2, "only b", "", "")},  # a unbound
    ]
    doc = serialize_select_results_tsv(["a", "b"], rows)
    assert doc.startswith("?a\t?b\n")
    variables, back = parse_select_results_tsv(doc)
    assert variables == ["a", "b"]
    assert back == rows

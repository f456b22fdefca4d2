"""File-backed Fuseki dataset server (fuseki/service.go, dataset.go)
and the sparqlclient REPL (sparql/sparql/sparqlclient.go §3.3)."""

import io

import pytest

from argo_ray.fuseki import FileFusekiService
from argo_ray.sparql.client import run_session
from argo_ray.terms import IRI, Literal, RDF_TYPE, triples_to_table

EX = "http://example.org/ns#"

TRIPLES = [
    (IRI(EX + "d1"), IRI(RDF_TYPE), IRI(EX + "Doc")),
    (IRI(EX + "d1"), IRI(EX + "lang"), Literal("en")),
    (IRI(EX + "d2"), IRI(RDF_TYPE), IRI(EX + "Doc")),
]


def test_fuseki_admin_and_services(tmp_path, ray_session):
    svc = FileFusekiService(str(tmp_path))
    assert svc.datasets() == []
    ds = svc.create("kb")
    assert svc.datasets() == ["kb"]
    with pytest.raises(ValueError):
        svc.dataset("../escape")

    g1 = "https://graphs.example.org/a"
    ds.graph_store().put(g1, triples_to_table(TRIPLES[:2], with_hash=False))
    ds.graph_store().put(
        "https://graphs.example.org/b", triples_to_table(TRIPLES[2:], with_hash=False)
    )
    # query service sees the union of named graphs
    q = ds.query_service()
    rows = q.select(
        f"PREFIX ex: <{EX}> SELECT ?s WHERE {{ ?s a ex:Doc }} ORDER BY ?s"
    ).take_all()
    assert [r["s"] for r in rows] == [f"<{EX}d1>", f"<{EX}d2>"]
    # update service targets one graph
    ds.update_service(g1).update(
        f"PREFIX ex: <{EX}> INSERT DATA {{ ex:d1 ex:lang \"fr\" }}"
    )
    assert ds.graph_store().get(g1).num_rows == 3
    svc.remove("kb")
    assert svc.datasets() == []


def test_repl_session_verbs(tmp_path, ray_session):
    svc = FileFusekiService(str(tmp_path))
    ds = svc.create("kb")
    uri = "https://graphs.example.org/main"
    ds.graph_store().put(uri, triples_to_table(TRIPLES, with_hash=False))
    query = ds.query_service()
    update = ds.update_service(uri)

    out, err = io.StringIO(), io.StringIO()
    run_session(
        query,
        update,
        [
            f"PREFIX ex: <{EX}> .\n",  # Turtle-style decl → session map
            "\n",
            "SELECT ?s WHERE { ?s a ex:Doc } ORDER BY ?s\n",  # uses session prefix
            'ASK { ?s ex:lang "en" }\n',
            'ASK { ?s ex:lang "xx" }\n',
            'INSERT DATA { ex:d3 a ex:Doc }\n',
            "FORMAT ntriples\n",
            "CONSTRUCT { ?s ex:seen ?s } WHERE { ?s ex:lang ?l }\n",
            f"DESCRIBE <{EX}d2>\n",
            "BOGUS words\n",
            "DELETE WHERE { ?s ex:zzz ?o }\n",  # matches nothing → graph intact
            "CLEAR ALL\n",  # genuinely unsupported update → error
        ],
        out=out,
        err=err,
    )
    text, errors = out.getvalue(), err.getvalue()
    # SELECT table with boundaries, centered header, both rows
    assert text.count("+---") >= 3
    assert " s " in text.splitlines()[1]  # centered header cell
    assert f"<{EX}d1>" in text and f"<{EX}d2>" in text
    assert "Result: true\n" in text and "Result: false\n" in text
    assert "OK\n" in text
    # CONSTRUCT serialized as N-Triples after FORMAT switch
    assert f"<{EX}d1> <{EX}seen> <{EX}d1> .\n" in text
    # DESCRIBE serves the subject's concise description (same format)
    assert (
        f"<{EX}d2> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <{EX}Doc> .\n"
        in text
    )
    assert "Invalid command: BOGUS" in errors
    assert "Error:" in errors  # the unsupported CLEAR ALL
    # the INSERT landed; the no-match DELETE WHERE (r3 pattern update)
    # and the failed CLEAR left the graph intact
    assert ds.graph_store().get(uri).num_rows == 4


def test_client_main_fuseki_mode(ray_session, tmp_path, monkeypatch, capsys):
    """CLI entry end-to-end: --fuseki dataset wiring, update + ask."""
    import sys

    from argo_ray.sparql.client import main

    svc = FileFusekiService(str(tmp_path))
    ds = svc.create("kb")
    uri = "https://graphs.example.org/main"
    ds.graph_store().put(uri, triples_to_table(TRIPLES, with_hash=False))
    monkeypatch.setattr(
        sys, "stdin",
        io.StringIO(
            f'INSERT DATA {{ <{EX}d9> <{EX}lang> "fr" }}\n'
            f'ASK {{ <{EX}d9> <{EX}lang> "fr" }}\n'
        ),
    )
    rc = main([str(tmp_path), "--fuseki", "kb", "--graph", uri])
    assert rc == 0
    out = capsys.readouterr().out
    assert "OK\n" in out and "Result: true" in out


def test_repl_select_results_formats(tmp_path, ray_session):
    """FORMAT tsv/srj/srx route SELECT output through the S6 results
    registry instead of the ASCII table; FORMAT table switches back
    (r4 verdict task #8)."""
    svc = FileFusekiService(str(tmp_path))
    ds = svc.create("kb")
    uri = "https://graphs.example.org/main"
    ds.graph_store().put(uri, triples_to_table(TRIPLES, with_hash=False))
    query = ds.query_service()
    update = ds.update_service(uri)

    out, err = io.StringIO(), io.StringIO()
    run_session(
        query,
        update,
        [
            f"PREFIX ex: <{EX}> .\n",
            "FORMAT tsv\n",
            "SELECT ?s WHERE { ?s a ex:Doc } ORDER BY ?s\n",
            "FORMAT srj\n",
            "SELECT ?s WHERE { ?s a ex:Doc } ORDER BY ?s\n",
            "FORMAT table\n",
            "SELECT ?s WHERE { ?s a ex:Doc } ORDER BY ?s\n",
        ],
        out=out,
        err=err,
    )
    text = out.getvalue()
    assert err.getvalue() == ""
    # TSV block: ?-prefixed header + full SPARQL term syntax cells
    assert f"?s\n<{EX}d1>\n<{EX}d2>\n" in text
    # JSON block parses back to the same bindings
    import json

    start = text.index('{"head"')
    doc = json.loads(text[start : text.index("\n", start)])
    assert doc["head"]["vars"] == ["s"]
    assert [b["s"]["value"] for b in doc["results"]["bindings"]] == [
        EX + "d1", EX + "d2",
    ]
    # and the ASCII table is back at the end
    assert text.rstrip().endswith("+")

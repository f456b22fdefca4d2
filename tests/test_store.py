"""K7 dictionary-encoded Parquet triple store: encode/decode round-trip
preserves the triple set; term ids are deterministic across runs."""

import shutil

from argo_ray.pipelines.flagship import flagship
from argo_ray.sinks.parquet_store import decode_store, encode_store, write_store
from argo_ray.terms import TRIPLE_COLUMNS

SF = "/root/testdata/sf0.001"
OUT = "/tmp/argo_test_store"


def _triple_set(ds):
    return {
        tuple(r[c] for c in TRIPLE_COLUMNS)
        for r in ds.select_columns(TRIPLE_COLUMNS).take_all()
    }


def test_store_roundtrip(ray_session):
    shutil.rmtree(OUT, ignore_errors=True)
    src = flagship(SF)
    write_store(src, OUT)
    back = decode_store(OUT)
    assert _triple_set(back) == _triple_set(flagship(SF))


def test_term_ids_deterministic(ray_session):
    terms1, _ = encode_store(flagship(SF))
    terms2, _ = encode_store(flagship(SF))
    ids1 = sorted(r["term_id"] for r in terms1.take_all())
    ids2 = sorted(r["term_id"] for r in terms2.take_all())
    assert ids1 == ids2
    assert len(ids1) == len(set(ids1))  # distinct terms, distinct ids


def test_file_graphstore_verbs(tmp_path):
    """S7/K6 equivalent: put/get/post/delete/head semantics of the
    graph-store protocol over files (graphstoreservice.go:40-181)."""
    import pytest

    from argo_ray.sinks.graphstore import FileGraphStore
    from argo_ray.terms import IRI, Literal, triples_to_table

    store = FileGraphStore(str(tmp_path / "gs"))
    uri = "http://graphs.example.org/g one"  # space → quoting exercised
    t1 = triples_to_table(
        [(IRI("http://s/1"), IRI("http://p/one"), Literal("v1"))], with_hash=False
    )
    t2 = triples_to_table(
        [
            (IRI("http://s/1"), IRI("http://p/one"), Literal("v1")),  # dup
            (IRI("http://s/2"), IRI("http://p/two"), Literal("v2", lang="en")),
        ],
        with_hash=False,
    )
    assert not store.head(uri)
    store.put(uri, t1)
    assert store.head(uri) and store.graphs() == [uri]
    assert store.get(uri).num_rows == 1
    store.post(uri, t2)  # merge: distinct union → 2 triples
    got = store.get(uri)
    assert got.num_rows == 2
    assert set(got["obj_value"].to_pylist()) == {"v1", "v2"}
    assert got.filter(
        __import__("pyarrow.compute", fromlist=["equal"]).equal(
            got["obj_value"], "v2"
        )
    )["obj_lang"].to_pylist() == ["en"]
    store.put(uri, t1)  # PUT replaces
    assert store.get(uri).num_rows == 1
    # patch = SPARQL-Update; pattern-based DELETE WHERE (r3) empties
    # the graph through the same PATCH verb
    store.patch(uri, "DELETE WHERE { ?s ?p ?o }")
    assert store.get(uri).num_rows == 0
    store.delete(uri)
    assert not store.head(uri) and store.graphs() == []


def test_graphstore_manage_verbs(tmp_path):
    """SPARQL 1.1 Update §3.2 graph management over the file store:
    CREATE / COPY / ADD / MOVE / CLEAR / DROP, SILENT behavior, and
    the store-level vs graph-level routing guards."""
    import pytest

    from argo_ray.sinks.graphstore import FileGraphStore
    from argo_ray.terms import IRI, Literal, triples_to_table

    store = FileGraphStore(str(tmp_path / "gs"))
    a, b, c = (f"http://graphs.example.org/{n}" for n in "abc")
    ta = triples_to_table(
        [(IRI("http://s/1"), IRI("http://p/one"), Literal("v1"))],
        with_hash=False,
    )
    tb = triples_to_table(
        [(IRI("http://s/2"), IRI("http://p/two"), Literal("v2"))],
        with_hash=False,
    )

    store.manage(f"CREATE GRAPH <{a}>")
    assert store.head(a) and store.get(a).num_rows == 0
    with pytest.raises(FileExistsError):
        store.manage(f"CREATE GRAPH <{a}>")
    store.manage(f"CREATE SILENT GRAPH <{a}>")  # no-op

    store.put(a, ta)
    store.put(b, tb)
    # COPY replaces the target wholesale
    store.manage(f"COPY <{a}> TO <{b}>")
    assert store.get(b).equals(store.get(a))
    # ADD unions (distinct)
    store.put(b, tb)
    store.manage(f"ADD <{a}> TO <{b}>; ADD SILENT <{a}> TO <{b}>")
    assert store.get(b).num_rows == 2
    # MOVE = copy + drop source
    store.manage(f"MOVE <{b}> TO <{c}>")
    assert not store.head(b) and store.get(c).num_rows == 2
    # CLEAR empties but keeps the graph; DROP removes it
    store.manage(f"CLEAR GRAPH <{c}>")
    assert store.head(c) and store.get(c).num_rows == 0
    store.manage(f"DROP GRAPH <{c}>")
    assert not store.head(c)
    with pytest.raises(FileNotFoundError):
        store.manage(f"DROP GRAPH <{c}>")
    store.manage(f"DROP SILENT GRAPH <{c}>")  # no-op
    # DEFAULT: no default graph in this store
    with pytest.raises(ValueError):
        store.manage("CLEAR DEFAULT")
    store.manage("CLEAR SILENT DEFAULT")  # no-op
    # scope forms
    store.manage("DROP ALL")
    assert store.graphs() == []
    # routing guards: triple ops don't belong in manage(), mgmt ops
    # don't belong in a single-graph patch
    with pytest.raises(ValueError):
        store.manage('INSERT DATA { <http://s/1> <http://p/one> "x" }')
    with pytest.raises(Exception):
        store.patch(a, f"DROP GRAPH <{a}>")

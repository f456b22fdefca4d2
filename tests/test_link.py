"""Entity-linking stage (T2): broadcast actor-pool path and the
distributed-join scale path must agree with each other and with the
relational oracle."""

import duckdb

from argo_ray.pipelines.oracles import ORACLES
from argo_ray.pipelines.queries import q_entity_link, q_entity_link_join

SF = "/root/testdata/sf0.001"


def _oracle_pairs():
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    return {tuple(r) for r in con.execute(ORACLES["entity_link"]).fetchall()}


def test_entity_link_broadcast(ray_session):
    got = {
        (r["subj_value"], r["entity_value"]) for r in q_entity_link(SF).take_all()
    }
    assert got == _oracle_pairs()
    assert len(got) > 0


def test_entity_link_join_agrees(ray_session):
    a = {(r["subj_value"], r["entity_value"]) for r in q_entity_link(SF).take_all()}
    b = {
        (r["subj_value"], r["entity_value"])
        for r in q_entity_link_join(SF).take_all()
    }
    assert a == b


def test_build_candidates_ranked_popularity_beats_min_id(ray_session):
    """A title shared by two docs resolves to the MORE-CITED entity even
    when the other has the smaller doc_id (and to the min IRI on a
    popularity tie)."""
    import pyarrow as pa
    import ray.data as rd

    from argo_ray.pages import entity_iri
    from argo_ray.stages.link import build_candidates_ranked

    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 5, 6], pa.int64()),
                "text": pa.array(
                    [
                        "alpha beta gamma delta epsilon tail one",
                        "alpha beta gamma delta epsilon tail two",
                        "zeta eta theta iota kappa tail",
                        "zeta eta theta iota kappa other tail",
                    ],
                    pa.string(),
                ),
            }
        )
    )
    # three citations to doc 2's entity, none to doc 1; docs 5/6 uncited
    cited = entity_iri(2)
    triples = rd.from_arrow(
        pa.table(
            {
                "obj_kind": pa.array([0, 0, 0, 2], pa.int64()),
                "obj_value": pa.array(
                    [cited, cited, cited, "a literal"], pa.string()
                ),
            }
        )
    )
    out = {
        r["surface_form"]: r["entity_iri"]
        for r in build_candidates_ranked(docs, triples).take_all()
    }
    assert out["alpha beta gamma delta epsilon"] == entity_iri(2)  # popularity
    assert out["zeta eta theta iota kappa"] == entity_iri(5)  # tie → min IRI

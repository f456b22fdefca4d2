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

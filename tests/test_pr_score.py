"""North-rule acceptance: triple P/R ≥ 0.95 vs the reference-semantics
oracle, and the byte-identical extracted-text invariant (input_hint)."""

from argo_ray.pipelines.score import pr_vs_oracle, text_invariant

SF = "/root/testdata/sf0.001"


def test_triple_pr_vs_reference_oracle(ray_session):
    res = pr_vs_oracle(SF)
    assert res["precision"] >= 0.95, res
    assert res["recall"] >= 0.95, res
    # on the deterministic corpus the match is in fact exact
    assert res["precision"] == 1.0 and res["recall"] == 1.0, res


def test_extracted_text_byte_identical(ray_session):
    res = text_invariant(SF)
    assert res["fraction"] == 1.0, res

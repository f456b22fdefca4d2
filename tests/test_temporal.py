"""Crawl-recency KG fusion (stages/temporal.py)."""

import pyarrow as pa
import ray.data as rd

from argo_ray.stages.temporal import latest_functional_fusion
from argo_ray.terms import TRIPLE_COLUMNS

P_FUNC = "http://x/lang"
P_MULTI = "http://x/cites"


def _row(s, p, o, ts):
    r = {}
    for pos, term in (("subj", s), ("pred", p), ("obj", o)):
        r[f"{pos}_kind"] = 0
        r[f"{pos}_value"] = term
        r[f"{pos}_lang"] = ""
        r[f"{pos}_datatype"] = ""
    r["obj_kind"] = 2 if p == P_FUNC else 0
    r["_ts"] = ts
    return r


def _ds(rows):
    cols = {k: [r[k] for r in rows] for k in rows[0]}
    t = pa.table(
        {
            **{
                k: pa.array(cols[k], pa.int64() if k.endswith("_kind") or k == "_ts"
                            else pa.large_string() if k.endswith("_value")
                            else pa.string())
                for k in cols
            }
        }
    )
    return rd.from_arrow(t)


def test_latest_wins_only_for_functional(ray_session):
    rows = [
        _row("e1", P_FUNC, "en", 100),
        _row("e1", P_FUNC, "xx", 200),  # newer observation wins
        _row("e2", P_FUNC, "de", 100),  # single observation survives
        _row("e1", P_MULTI, "a", 100),  # multi-valued: ALL distinct kept
        _row("e1", P_MULTI, "b", 200),
        _row("e1", P_MULTI, "a", 300),  # duplicate assertion dedups
    ]
    out = latest_functional_fusion(_ds(rows), "_ts", [P_FUNC]).take_all()
    got = sorted(
        (r["subj_value"], r["pred_value"], r["obj_value"]) for r in out
    )
    assert got == [
        ("e1", P_MULTI, "a"),
        ("e1", P_MULTI, "b"),
        ("e1", P_FUNC, "xx"),
        ("e2", P_FUNC, "de"),
    ]
    assert all(set(TRIPLE_COLUMNS) <= set(r.keys()) for r in out)


def test_equal_ts_ties_to_largest_object(ray_session):
    rows = [
        _row("e1", P_FUNC, "aa", 100),
        _row("e1", P_FUNC, "bb", 100),
    ]
    out = latest_functional_fusion(_ds(rows), "_ts", [P_FUNC]).take_all()
    assert [r["obj_value"] for r in out] == ["bb"]

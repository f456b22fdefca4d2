"""North-rule scoring: triple precision/recall vs the reference oracle
and the byte-identical extracted-text invariant.

``BASELINE.json`` requires P/R ≥ 0.95 between our pipeline's emitted
(subj, pred, obj) triples and the reference extraction semantics
(rdfaparser.go:64-151), compared as canonical N-Triples lines under set
semantics (the reference's graph equality is order-free and its stores
are multisets; serialized comparison collapses to the distinct set).
Blank nodes are hash-skolemized identically on both sides (SURVEY.md
§1.4), so line equality == graph equality up to the reference's random
anon ids.

The expected side is an *independent relational reconstruction* (DuckDB
SQL over the same documents table — oracles.py EXP_CTE), not a second
run of our own extractor.
"""

from __future__ import annotations

import duckdb

from ..stages.materialize import dedup_exact
from ..terms import nt_render_lines
from .flagship import extract_triples
from .oracles import EXP_CTE, TERM_COLS, _nt_term


def _ours_nt_lines(sf_dir: str) -> set[str]:
    """Distributed pipeline → distinct canonical NT lines (collected —
    the distinct set is small relative to the corpus)."""
    import pyarrow as pa

    from ..pages import pages_dataset

    ds = dedup_exact(extract_triples(pages_dataset(sf_dir)))
    ds = ds.map_batches(
        lambda b: pa.table({"line": nt_render_lines(b)}), batch_format="pyarrow"
    )
    return {r["line"] for r in ds.take_all()}


def _expected_nt_lines(sf_dir: str) -> set[str]:
    sql = (
        EXP_CTE
        + f"SELECT DISTINCT {_nt_term('subj')} || ' ' || {_nt_term('pred')} || ' ' "
        + f"|| {_nt_term('obj')} || ' .' AS line FROM (SELECT DISTINCT {TERM_COLS} FROM exp)"
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    return {r[0] for r in con.execute(sql).fetchall()}


def triples_pr(ours: set[str], expected: set[str]) -> dict:
    inter = len(ours & expected)
    return {
        "ours": len(ours),
        "expected": len(expected),
        "matched": inter,
        "precision": inter / len(ours) if ours else 1.0,
        "recall": inter / len(expected) if expected else 1.0,
    }


def pr_vs_oracle(sf_dir: str) -> dict:
    """P/R of the full distributed pipeline against the relational
    reconstruction of the reference extraction rules."""
    return triples_pr(_ours_nt_lines(sf_dir), _expected_nt_lines(sf_dir))


def text_invariant(sf_dir: str) -> dict:
    """Per-row invariant (input_hint): extracted text byte-identical to
    the pages table's ``text`` column, checked distributed."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..pages import pages_dataset
    from ..sources.rdfa import extract_text_batch

    def check(b: pa.Table) -> pa.Table:
        out = extract_text_batch(b)
        ok = pc.equal(out["extracted_text"], out["text"])
        return pa.table(
            {
                "n": pa.array([b.num_rows], pa.int64()),
                "n_ok": pa.array([pc.sum(pc.cast(ok, pa.int64())).as_py() or 0], pa.int64()),
            }
        )

    ds = pages_dataset(sf_dir).map_batches(check, batch_format="pyarrow")
    import ray.data  # noqa: F401
    from ray.data.aggregate import Sum

    row = ds.aggregate(Sum("n"), Sum("n_ok"))
    n, n_ok = row["sum(n)"], row["sum(n_ok)"]
    return {"pages": n, "byte_identical": n_ok, "fraction": n_ok / n if n else 1.0}

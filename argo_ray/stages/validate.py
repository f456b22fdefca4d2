"""SHACL-lite graph validation — the constraint-checking pass a KG
build runs before publishing (no reference counterpart; argo has no
shapes, but every production KG pipeline validates).  Three constraint
families, each a composition of vectorized filters + uniform-key
groupbys (shuffle volume = candidate subjects, never the triple set):

- **functional property**: a subject may carry at most one distinct
  value for the predicate (e.g. dc:title).
- **required type**: every IRI subject must have an ``rdf:type``.
- **datatype**: every literal object of the predicate must carry the
  given datatype IRI.

Violations come back as ``(shape, subj_value)`` rows — distinct, one
row per offending subject per shape.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..terms import KIND_IRI, KIND_LITERAL, RDF_TYPE


def _ls(s: str):
    return pa.scalar(s, pa.large_string())


def validate_graph(
    ds,
    functional_preds: tuple[str, ...] = (),
    required_type: bool = True,
    datatype_constraints: dict[str, str] | None = None,
):
    """Validate a (deduped) triple Dataset; returns the violation rows.

    One pass over the triples scatters per-shape candidate pairs; the
    per-shape verdicts are tiny groupbys over those pairs."""
    datatype_constraints = datatype_constraints or {}
    parts = []

    if functional_preds:
        # (pred, subj, value) distinct pairs -> subjects with >1 value
        preds = pa.array(list(functional_preds), pa.large_string())

        def func_pairs(b: pa.Table) -> pa.Table:
            m = pc.is_in(pc.cast(b["pred_value"], pa.large_string()), value_set=preds)
            f = b.filter(m)
            return pa.table(
                {
                    "pred": pc.cast(f["pred_value"], pa.string()),
                    "subj": pc.cast(f["subj_value"], pa.string()),
                    "value": pc.cast(f["obj_value"], pa.string()),
                }
            )

        from .materialize import distinct_rows

        pairs = distinct_rows(
            ds.map_batches(func_pairs, batch_format="pyarrow"),
            ["pred", "subj", "value"],
        )

        def count_partial(b: pa.Table) -> pa.Table:
            g = (
                b.select(["pred", "subj"])
                .group_by(["pred", "subj"])
                .aggregate([("subj", "count")])
            )
            return pa.table(
                {
                    "pred": pc.cast(g["pred"], pa.string()),
                    "subj": pc.cast(g["subj"], pa.string()),
                    "n_part": pc.cast(g["subj_count"], pa.int64()),
                }
            )

        from .grouping import sorted_multi_agg

        counted = sorted_multi_agg(
            pairs.map_batches(count_partial, batch_format="pyarrow"),
            "subj",
            [("pred", pa.string()), ("subj", pa.string())],
            [("n_part", "sum", "n_values", pa.int64())],
        )

        def func_verdict(b: pa.Table) -> pa.Table:
            v = b.filter(pc.greater(b["n_values"], pa.scalar(1, pa.int64())))
            shape = pc.binary_join_element_wise(
                _ls("functional:"), pc.cast(v["pred"], pa.large_string()), _ls("")
            )
            return pa.table(
                {
                    "shape": pc.cast(shape, pa.string()),
                    "subj_value": pc.cast(v["subj"], pa.string()),
                }
            )

        parts.append(counted.map_batches(func_verdict, batch_format="pyarrow"))

    if required_type:
        # every IRI subject: Max(is_type_assertion) == 0 -> violation
        def type_pairs(b: pa.Table) -> pa.Table:
            m = pc.equal(pc.cast(b["subj_kind"], pa.int64()),
                         pa.scalar(KIND_IRI, pa.int64()))
            f = b.filter(m)
            has = pc.cast(
                pc.equal(pc.cast(f["pred_value"], pa.large_string()), _ls(RDF_TYPE)),
                pa.int64(),
            )
            g = (
                pa.table(
                    {"subj": pc.cast(f["subj_value"], pa.string()), "has": has}
                )
                .group_by("subj")
                .aggregate([("has", "max")])
            )
            return pa.table(
                {
                    "subj": pc.cast(g["subj"], pa.string()),
                    "has_part": pc.cast(g["has_max"], pa.int64()),
                }
            )

        from .grouping import sorted_multi_agg

        typed = sorted_multi_agg(
            ds.map_batches(type_pairs, batch_format="pyarrow"),
            "subj",
            [("subj", pa.string())],
            [("has_part", "max", "has_type", pa.int64())],
        )

        def type_verdict(b: pa.Table) -> pa.Table:
            v = b.filter(pc.equal(b["has_type"], pa.scalar(0, pa.int64())))
            return pa.table(
                {
                    "shape": pa.array(["required:rdf-type"] * v.num_rows, pa.string()),
                    "subj_value": pc.cast(v["subj"], pa.string()),
                }
            )

        parts.append(typed.map_batches(type_verdict, batch_format="pyarrow"))

    if datatype_constraints:
        items = sorted(datatype_constraints.items())

        def dt_violations(b: pa.Table) -> pa.Table:
            out = []
            pred_v = pc.cast(b["pred_value"], pa.large_string())
            obj_kind = pc.cast(b["obj_kind"], pa.int64())
            obj_dt = pc.cast(b["obj_datatype"], pa.large_string())
            for pred, dt in items:
                bad = pc.and_(
                    pc.and_(
                        pc.equal(pred_v, _ls(pred)),
                        pc.equal(obj_kind, pa.scalar(KIND_LITERAL, pa.int64())),
                    ),
                    pc.not_equal(obj_dt, _ls(dt)),
                )
                f = b.filter(bad)
                out.append(
                    pa.table(
                        {
                            "shape": pa.array(
                                [f"datatype:{pred}"] * f.num_rows, pa.string()
                            ),
                            "subj_value": pc.cast(f["subj_value"], pa.string()),
                        }
                    )
                )
            return pa.concat_tables(out)

        from .materialize import distinct_rows

        parts.append(
            distinct_rows(
                ds.map_batches(dt_violations, batch_format="pyarrow"),
                ["shape", "subj_value"],
            )
        )

    if not parts:
        raise ValueError(
            "validate_graph: no constraints enabled (functional_preds, "
            "required_type and datatype_constraints are all empty)"
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out

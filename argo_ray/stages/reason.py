"""RDFS forward-chaining materialization — schema-driven type and
property entailment over the triple stream.

No reference counterpart (the reference stores and serializes asserted
triples only; its loop interpreter reads rdf:type but never infers it,
``/root/reference/loop/loop.go:121-203``) — this is the inference step
a KG build runs after extraction so downstream queries see the
entailed graph.

Rules implemented (the RDFS core):

- **rdfs9/11**: ``(x rdf:type C) ∧ (C rdfs:subClassOf* D) → (x rdf:type D)``
- **rdfs5/7**: ``(s P o) ∧ (P rdfs:subPropertyOf* Q) → (s Q o)``
- **rdfs2**:   ``(s P o) ∧ (P rdfs:domain C) → (s rdf:type C)``
- **rdfs3**:   ``(s P o) ∧ (P rdfs:range C) → (o rdf:type C)`` (non-literal o)

Scale shape: the TBox (schema) is broadcast-small by assumption — real
ontologies are thousands of axioms against billions of facts — so its
transitive closures are computed ONCE on the driver (Floyd-Warshall-free
BFS over a dict graph, O(axioms²) worst case) and shipped to every
worker as four join tables via ``ray.put``.  The ABox (the fact stream)
is entailed in ONE stateless pass of vectorized pandas merges — domain
and range lookup tables are pre-composed with the subclass and
subproperty closures, so a single pass reaches the fixpoint (the data
never adds schema axioms; rule outputs are rdf:type triples, which only
rdfs9 consumes, and rdfs9 is pre-composed into the tables).  The one
exchange is the skew-proof ``triple_hash`` dedup at the end.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
RDFS_NS = "http://www.w3.org/2000/01/rdf-schema#"
RDFS_SUBCLASS = RDFS_NS + "subClassOf"
RDFS_SUBPROP = RDFS_NS + "subPropertyOf"
RDFS_DOMAIN = RDFS_NS + "domain"
RDFS_RANGE = RDFS_NS + "range"


def _closure(edges: dict[str, set[str]]) -> dict[str, set[str]]:
    """node → strict transitive successors (BFS per node; TBox-sized)."""
    out: dict[str, set[str]] = {}
    for start in edges:
        seen: set[str] = set()
        stack = list(edges.get(start, ()))
        while stack:
            n = stack.pop()
            if n in seen or n == start:
                continue
            seen.add(n)
            stack.extend(edges.get(n, ()))
        out[start] = seen
    return out


def schema_tables(schema: pa.Table) -> dict[str, pd.DataFrame]:
    """Compile a TBox — columns ``(s, p, o)`` strings — into the four
    broadcast join tables, closures pre-composed:

    - ``cls``:  (cls, super)   — strict subClassOf closure
    - ``prop``: (prop, super)  — strict subPropertyOf closure
    - ``dom``:  (prop, type)   — domains of prop ∪ its superprops,
                                 expanded by the class closure
    - ``rng``:  (prop, type)   — ranges, same expansion
    """
    s = schema.column("s").to_pylist()
    p = schema.column("p").to_pylist()
    o = schema.column("o").to_pylist()

    sub_c: dict[str, set[str]] = {}
    sub_p: dict[str, set[str]] = {}
    dom: dict[str, set[str]] = {}
    rng: dict[str, set[str]] = {}
    for si, pi, oi in zip(s, p, o):
        if pi == RDFS_SUBCLASS:
            sub_c.setdefault(si, set()).add(oi)
        elif pi == RDFS_SUBPROP:
            sub_p.setdefault(si, set()).add(oi)
        elif pi == RDFS_DOMAIN:
            dom.setdefault(si, set()).add(oi)
        elif pi == RDFS_RANGE:
            rng.setdefault(si, set()).add(oi)

    cls_clo = _closure(sub_c)
    prop_clo = _closure(sub_p)

    def up_cls(c: str) -> set[str]:
        return {c} | cls_clo.get(c, set())

    all_props = set(dom) | set(rng) | set(prop_clo) | set(sub_p)
    dom_rows, rng_rows = [], []
    for prop in sorted(all_props):
        chain = {prop} | prop_clo.get(prop, set())
        for q in chain:
            for c in dom.get(q, ()):
                dom_rows += [(prop, t) for t in up_cls(c)]
            for c in rng.get(q, ()):
                rng_rows += [(prop, t) for t in up_cls(c)]

    def df(rows, a, b):
        return pd.DataFrame(sorted(set(rows)), columns=[a, b]) if rows else pd.DataFrame(
            {a: pd.Series([], dtype="object"), b: pd.Series([], dtype="object")}
        )

    return {
        "cls": df(
            [(c, d) for c, sups in cls_clo.items() for d in sups], "cls", "super"
        ),
        "prop": df(
            [(q, r) for q, sups in prop_clo.items() for r in sups], "prop", "super"
        ),
        "dom": df(dom_rows, "prop", "type"),
        "rng": df(rng_rows, "prop", "type"),
    }


def _type_rows(subj_kind, subj_value, types) -> pd.DataFrame:
    n = len(subj_value)
    return pd.DataFrame(
        {
            "subj_kind": pd.Series(subj_kind, dtype="int64"),
            "subj_value": subj_value,
            "subj_lang": [""] * n,
            "subj_datatype": [""] * n,
            "pred_kind": pd.Series([0] * n, dtype="int64"),
            "pred_value": [RDF_TYPE] * n,
            "pred_lang": [""] * n,
            "pred_datatype": [""] * n,
            "obj_kind": pd.Series([0] * n, dtype="int64"),
            "obj_value": types,
            "obj_lang": [""] * n,
            "obj_datatype": [""] * n,
        }
    )


class _RdfsEntailer:
    """Actor: resolves the four broadcast TBox join tables once, emits
    the entailed triples per batch with vectorized pandas merges."""

    def __init__(self, tables_ref):
        import ray

        self.t = tables_ref if isinstance(tables_ref, dict) else ray.get(tables_ref)

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        cols = list(df.columns)
        out = [df]

        # rdfs9 (+11, pre-closed): supertype triples for asserted types
        tt = df[(df["pred_value"] == RDF_TYPE) & (df["obj_kind"] != 2)]
        if len(tt) and len(self.t["cls"]):
            m = tt.merge(self.t["cls"], left_on="obj_value", right_on="cls")
            out.append(_type_rows(m["subj_kind"], m["subj_value"], m["super"]))

        # rdfs5/7 (pre-closed): superproperty assertions
        if len(self.t["prop"]):
            m = df.merge(self.t["prop"], left_on="pred_value", right_on="prop")
            if len(m):
                sup = m.drop(columns=["prop", "pred_value"]).rename(
                    columns={"super": "pred_value"}
                )[cols]
                out.append(sup)

        # rdfs2 (domain, subclass/subprop pre-composed)
        if len(self.t["dom"]):
            m = df.merge(self.t["dom"], left_on="pred_value", right_on="prop")
            if len(m):
                out.append(_type_rows(m["subj_kind"], m["subj_value"], m["type"]))

        # rdfs3 (range) — non-literal objects become typed subjects
        if len(self.t["rng"]):
            nl = df[df["obj_kind"] != 2]
            m = nl.merge(self.t["rng"], left_on="pred_value", right_on="prop")
            if len(m):
                out.append(_type_rows(m["obj_kind"], m["obj_value"], m["type"]))

        res = pd.concat(out, ignore_index=True)[cols]
        for k in ("subj_kind", "pred_kind", "obj_kind"):
            res[k] = res[k].astype("int64")
        return res


def rdfs_infer(triples_ds, schema: pa.Table):
    """Materialize the RDFS entailment of ``triples_ds`` under the
    broadcast TBox ``schema`` (columns ``s, p, o``): asserted ∪ inferred
    triples, exact-deduped.  Kind columns come back as int64."""
    import ray

    from .materialize import dedup_exact

    tables = schema_tables(schema)
    ref = ray.put(tables)
    entailed = triples_ds.map_batches(
        _RdfsEntailer,
        batch_format="pandas",
        concurrency=2,
        fn_constructor_kwargs={"tables_ref": ref},
    )
    return dedup_exact(entailed)

"""SPARQL evaluation as Ray Data pipelines over flattened triple tables.

The reference's ``SparqlService`` delegates evaluation to a remote
endpoint and only parses results (``sparqlservice.go:42-95``); this
module IS the endpoint, re-expressed Ray-Data-first:

- Each triple pattern is a streaming ``map_batches`` filter over the
  triples Dataset (the same vectorized term predicates as operator M1,
  ``stages/filter.py``) that projects matched positions into per-variable
  binding columns — no materialization, blocks stream with backpressure.
- The basic graph pattern is a left-deep chain of distributed hash
  joins (``Dataset.join``) on the shared variables' full term identity
  (kind, value, lang, datatype).  ``num_partitions`` follows
  ``io.shuffle_partitions()`` so join width tracks the cluster size.
- FILTERs are vectorized Arrow kernels applied post-join; SELECT
  renders each variable to its canonical N-Triples string (one string
  column per variable — the same rendering the serializers use, so a
  DuckDB oracle can reproduce results bit-for-bit).

At 100 TB the per-pattern scans dominate; bound-subject patterns can
push down to Parquet row groups via ``subject_hash`` the same way
operator M1 does.  The join chain shuffles only binding columns (narrow
tables), never the full triple set.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..terms import (
    KIND_LITERAL,
    TRIPLE_COLUMNS,
    Term,
    nt_render_term_arrays,
    table_to_triples,
    triples_to_table,
)
from .parser import (
    AskQuery,
    Comparison,
    ConstructQuery,
    Regex,
    SelectQuery,
    SparqlSyntaxError,
    Var,
    parse_query,
    parse_update,
)

_FIELDS = ("kind", "value", "lang", "datatype")
_POS = ("subj", "pred", "obj")

_NUMERIC_DTS = {
    "http://www.w3.org/2001/XMLSchema#integer",
    "http://www.w3.org/2001/XMLSchema#decimal",
    "http://www.w3.org/2001/XMLSchema#double",
    "http://www.w3.org/2001/XMLSchema#float",
    "http://www.w3.org/2001/XMLSchema#int",
    "http://www.w3.org/2001/XMLSchema#long",
}


def _var_cols(name: str) -> list[str]:
    return [f"{name}__{f}" for f in _FIELDS]


def _pattern_bindings(ds, pattern):
    """One triple pattern → (bindings Dataset, bound variable names).

    Constant positions filter (vectorized term predicate, M1 semantics);
    variable positions project into ``var__kind/value/lang/datatype``
    columns.  A variable repeated within the pattern adds an equality
    mask across its positions."""
    from ..stages.filter import term_predicate

    consts = [
        (pos, t) for pos, t in zip(_POS, pattern) if isinstance(t, Term)
    ]
    var_pos: dict[str, list[str]] = {}
    for pos, t in zip(_POS, pattern):
        if isinstance(t, Var):
            var_pos.setdefault(t.name, []).append(pos)

    def project(batch: pa.Table) -> pa.Table:
        mask = None
        for pos, term in consts:
            m = term_predicate(batch, pos, term)
            mask = m if mask is None else pc.and_(mask, m)
        for positions in var_pos.values():
            for extra in positions[1:]:
                for f in _FIELDS:
                    m = pc.equal(
                        pc.cast(batch[f"{positions[0]}_{f}"], pa.large_string())
                        if f != "kind"
                        else batch[f"{positions[0]}_{f}"],
                        pc.cast(batch[f"{extra}_{f}"], pa.large_string())
                        if f != "kind"
                        else batch[f"{extra}_{f}"],
                    )
                    mask = m if mask is None else pc.and_(mask, m)
        if mask is not None:
            batch = batch.filter(mask)
        cols = {}
        for name, positions in var_pos.items():
            pos = positions[0]
            for f in _FIELDS:
                col = batch[f"{pos}_{f}"]
                if f == "kind":
                    col = pc.cast(col, pa.int64())
                cols[f"{name}__{f}"] = col
        if not cols:  # all-constant pattern: keep a row-count witness
            cols["_match"] = pa.array([1] * batch.num_rows, pa.int64())
        return pa.table(cols)

    return ds.map_batches(project, batch_format="pyarrow"), set(var_pos)


def _bgp(ds, patterns):
    """Basic graph pattern → joined bindings Dataset + bound vars."""
    from ..io import shuffle_partitions

    if not patterns:
        raise SparqlSyntaxError("empty graph pattern")
    result, bound = _pattern_bindings(ds, patterns[0])
    nparts = shuffle_partitions()
    for pattern in patterns[1:]:
        nxt, vars2 = _pattern_bindings(ds, pattern)
        shared = sorted(bound & vars2)
        if shared:
            keys = tuple(c for v in shared for c in _var_cols(v))
            result = result.join(
                nxt, join_type="inner", on=keys, num_partitions=nparts
            )
        else:  # cartesian product (rare; both sides carry a const key)
            result = result.map_batches(
                lambda b: b.append_column("_cross", pa.array([0] * b.num_rows, pa.int64())),
                batch_format="pyarrow",
            ).join(
                nxt.map_batches(
                    lambda b: b.append_column(
                        "_cross", pa.array([0] * b.num_rows, pa.int64())
                    ),
                    batch_format="pyarrow",
                ),
                join_type="inner",
                on=("_cross",),
                num_partitions=nparts,
            )
            result = result.map_batches(
                lambda b: b.drop_columns(["_cross"]), batch_format="pyarrow"
            )
        bound |= vars2
    return result, bound


def _operand(batch: pa.Table, x):
    """FILTER operand → (value column/scalar, is-numeric-literal hint)."""
    if isinstance(x, Var):
        return pc.cast(batch[f"{x.name}__value"], pa.large_string()), None
    numeric = x.kind == KIND_LITERAL and x.datatype in _NUMERIC_DTS
    return pa.scalar(x.value, pa.large_string()), numeric


def _apply_filters(ds, filters):
    if not filters:
        return ds

    _CMP = {
        "=": pc.equal,
        "!=": pc.not_equal,
        "<": pc.less,
        "<=": pc.less_equal,
        ">": pc.greater,
        ">=": pc.greater_equal,
    }

    def fapply(batch: pa.Table) -> pa.Table:
        mask = None
        for flt in filters:
            if isinstance(flt, Regex):
                m = pc.match_substring_regex(
                    pc.cast(batch[f"{flt.var.name}__value"], pa.large_string()),
                    flt.pattern,
                )
                if flt.negated:
                    m = pc.invert(m)
            else:
                left, lnum = _operand(batch, flt.left)
                right, rnum = _operand(batch, flt.right)
                if lnum or rnum:  # numeric comparison when a numeric literal is involved
                    left = pc.cast(left, pa.float64())
                    right = pc.cast(right, pa.float64())
                m = _CMP[flt.op](left, right)
                if flt.op in ("=", "!="):
                    # full term identity for equality when both sides are vars
                    if isinstance(flt.left, Var) and isinstance(flt.right, Var):
                        for f in ("kind", "lang", "datatype"):
                            a = batch[f"{flt.left.name}__{f}"]
                            b = batch[f"{flt.right.name}__{f}"]
                            e = pc.equal(a, b)
                            m = (
                                pc.and_(m, e)
                                if flt.op == "="
                                else pc.or_(m, pc.invert(e))
                            )
            mask = m if mask is None else pc.and_(mask, m)
        return batch.filter(mask) if mask is not None else batch

    return ds.map_batches(fapply, batch_format="pyarrow")


def _render_vars(ds, variables):
    def render(batch: pa.Table) -> pa.Table:
        cols = {}
        for v in variables:
            cols[v] = nt_render_term_arrays(
                batch[f"{v}__kind"],
                batch[f"{v}__value"],
                batch[f"{v}__lang"],
                batch[f"{v}__datatype"],
            )
        return pa.table(cols)

    return ds.map_batches(render, batch_format="pyarrow")


def _distinct(ds, columns):
    """Global DISTINCT over rendered columns — hash-keyed sort + one
    vectorized per-block pass (same shape as triple dedup, A4)."""
    from ..stages.grouping import sorted_unique
    from ..terms import hash64

    def key(batch: pa.Table) -> pa.Table:
        parts: list = []
        for c in columns:
            parts.append(pc.cast(batch[c], pa.large_string()))
            parts.append(pa.scalar("\x1f", pa.large_string()))
        joined = pc.binary_join_element_wise(*parts[:-1], pa.scalar("", pa.large_string()))
        return batch.append_column("_dk", hash64(joined))

    ds = ds.map_batches(key, batch_format="pyarrow")
    ds = sorted_unique(ds, list(columns), "_dk")
    return ds.map_batches(
        lambda b: b.drop_columns(["_dk"]), batch_format="pyarrow"
    )


def evaluate_select(ds, query: str | SelectQuery):
    """SELECT over a triples Dataset → Dataset with one canonical
    N-Triples-rendered string column per selected variable (the same
    term rendering the result parser S6 round-trips)."""
    q = parse_query(query) if isinstance(query, str) else query
    if not isinstance(q, SelectQuery):
        raise SparqlSyntaxError("not a SELECT query")
    bindings, bound = _bgp(ds, q.patterns)
    variables = q.variables or sorted(bound)
    missing = [v for v in variables if v not in bound]
    if missing:
        raise SparqlSyntaxError(f"unbound SELECT variables: {missing}")
    bindings = _apply_filters(bindings, q.filters)
    out = _render_vars(bindings, variables)
    if q.distinct:
        out = _distinct(out, variables)
    if q.order_by:
        for v, _ in q.order_by:
            if v not in variables:
                raise SparqlSyntaxError(f"ORDER BY {v!r} not in SELECT")
        out = out.sort(
            [v for v, _ in q.order_by], descending=[d for _, d in q.order_by]
        )
    if q.limit is not None:
        out = out.limit(q.limit)
    return out


def evaluate_ask(ds, query: str | AskQuery) -> bool:
    """ASK → bool (SparqlService.Ask semantics, sparqlservice.go:55-68)."""
    q = parse_query(query) if isinstance(query, str) else query
    if not isinstance(q, AskQuery):
        raise SparqlSyntaxError("not an ASK query")
    bindings, _ = _bgp(ds, q.patterns)
    bindings = _apply_filters(bindings, q.filters)
    return bindings.limit(1).count() > 0


def evaluate_construct(ds, query: str | ConstructQuery):
    """CONSTRUCT → Dataset of flattened distinct triples (the graph the
    reference's ``SparqlService.Graph`` parses from the response body,
    sparqlservice.go:70-83) — feed it to any serializer sink."""
    q = parse_query(query) if isinstance(query, str) else query
    if not isinstance(q, ConstructQuery):
        raise SparqlSyntaxError("not a CONSTRUCT query")
    for t in q.template:
        for x in t:
            if not isinstance(x, (Var, Term)):
                raise SparqlSyntaxError("bad template term")
            if isinstance(x, Term) and x.kind == 1:
                raise SparqlSyntaxError(
                    "blank nodes in CONSTRUCT templates not supported"
                )
    bindings, bound = _bgp(ds, q.patterns)
    bindings = _apply_filters(bindings, q.filters)
    for t in q.template:
        for x in t:
            if isinstance(x, Var) and x.name not in bound:
                raise SparqlSyntaxError(f"unbound template variable ?{x.name}")
    template = q.template
    limit = q.limit

    def instantiate(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        tables = []
        for s, p, o in template:
            cols = {}
            for pos, x in zip(_POS, (s, p, o)):
                if isinstance(x, Var):
                    for f in _FIELDS:
                        col = batch[f"{x.name}__{f}"]
                        if f == "kind":
                            col = pc.cast(col, pa.uint8())
                        else:
                            col = pc.cast(col, pa.string())
                        cols[f"{pos}_{f}"] = col
                else:
                    cols[f"{pos}_kind"] = pa.array([x.kind] * n, pa.uint8())
                    cols[f"{pos}_value"] = pa.array([x.value] * n, pa.string())
                    cols[f"{pos}_lang"] = pa.array([x.lang] * n, pa.string())
                    cols[f"{pos}_datatype"] = pa.array([x.datatype] * n, pa.string())
            tables.append(pa.table({c: cols[c] for c in TRIPLE_COLUMNS}))
        return pa.concat_tables(tables)

    from ..stages.materialize import dedup_exact

    out = bindings.map_batches(instantiate, batch_format="pyarrow")
    out = dedup_exact(out)
    out = out.map_batches(
        lambda b: b.select(TRIPLE_COLUMNS), batch_format="pyarrow"
    )
    if limit is not None:
        out = out.limit(limit)
    return out


def apply_update(table: pa.Table, query: str) -> pa.Table:
    """SPARQL-Update (INSERT DATA / DELETE DATA, ';'-chained) applied to
    one stored graph's triple table, set semantics, ops in order.

    Driver-side by design: this is the server half of graph-store PATCH
    (graphstoreservice.go:162-181) and a stored named graph is one
    document — the distributed axis is graphs (``write_graphstore``
    fan-out), not triples within a graph."""
    ops = parse_update(query)
    current = list(
        dict.fromkeys(table_to_triples(table.select(TRIPLE_COLUMNS)))
    )
    have = set(current)
    for op in ops:
        if op.action == "delete":
            rm = set(op.triples)
            current = [t for t in current if t not in rm]
            have -= rm
        else:
            for t in op.triples:
                if t not in have:
                    current.append(t)
                    have.add(t)
    return triples_to_table(current, with_hash=False)

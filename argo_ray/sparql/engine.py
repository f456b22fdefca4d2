"""SPARQL evaluation as Ray Data pipelines over flattened triple tables.

The reference's ``SparqlService`` delegates evaluation to a remote
endpoint and only parses results (``sparqlservice.go:42-95``); this
module IS the endpoint, re-expressed Ray-Data-first:

- Each triple pattern is a streaming ``map_batches`` filter over the
  triples Dataset (the same vectorized term predicates as operator M1,
  ``stages/filter.py``) that projects matched positions into per-variable
  binding columns — no materialization, blocks stream with backpressure.
- The basic graph pattern joins through ONE primitive: the co-grouped
  sort exchange (``_cogroup_join``) — pattern binding tables union into
  a single ``Dataset.sort`` on the anchor variable's term hash, then
  in-block pandas merges on each pair's full shared-variable identity
  (kind, value, lang, datatype).  Exchange count is O(1) per BGP, not
  O(patterns), and the machinery is the same sort-co-location contract
  the dedup stages pin (``Dataset.join`` itself proved flaky in Ray
  2.49 on small multi-key inputs, so the engine avoids it entirely).
- FILTERs are vectorized Arrow kernels applied post-join; SELECT
  renders each variable to its canonical N-Triples string (one string
  column per variable — the same rendering the serializers use, so a
  DuckDB oracle can reproduce results bit-for-bit).

At 100 TB the per-pattern scans dominate; bound-subject patterns can
push down to Parquet row groups via ``subject_hash`` the same way
operator M1 does.  The join chain shuffles only binding columns (narrow
tables), never the full triple set.

Caller contract: each triple pattern scans ``ds`` once.  Hand the
evaluator a *stored* dataset (``decode_store`` /
``read_parquet`` / a ``materialize()``d Dataset) — an expensive lazy
upstream pipeline would re-execute per pattern.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..terms import (
    KIND_BLANK,
    KIND_IRI,
    KIND_LITERAL,
    TRIPLE_COLUMNS,
    Term,
    hash64,
    nt_parse_term_arrays,
    nt_render_term_arrays,
    table_to_triples,
    triples_to_table,
)
from .parser import (
    AltPath,
    GraphBlock,
    GraphMgmtOp,
    ModifyOp,
    ServiceBlock,
    NegPath,
    AskQuery,
    BindBlock,
    Bound,
    Comparison,
    EArith,
    EConst,
    EFunc,
    EIf,
    EVar,
    ConstructQuery,
    DescribeQuery,
    ExistsFilter,
    ExprComparison,
    FuncComparison,
    InFilter,
    LangMatches,
    OrFilter,
    SameTerm,
    MinusBlock,
    OptionalBlock,
    Regex,
    SelectQuery,
    SparqlSyntaxError,
    StrFunc,
    SubSelect,
    TransPath,
    TypeCheck,
    UnionBlock,
    ValuesBlock,
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


def _pattern_bindings(ds, pattern, witness: str = "_match", graph_var=None):
    """One triple pattern → (bindings Dataset, bound variable names).

    Constant positions filter (vectorized term predicate, M1 semantics);
    variable positions project into ``var__kind/value/lang/datatype``
    columns.  A variable repeated within the pattern adds an equality
    mask across its positions.  An ``AltPath`` predicate (``p1|p2``)
    filters with an OR of term predicates — still ONE scan, and each
    matching triple is its own output row (bag-union multiplicity).
    With ``graph_var`` (GRAPH ?g) the quads dataset's ``url`` column
    additionally binds ``?g`` as an IRI term per matching row."""
    from ..stages.filter import term_predicate

    if isinstance(pattern[1], AltPath) and pattern[1].rev_preds:
        # mixed forward/reverse alternative set (p|^q): union of one
        # forward scan over the forward members and one scan with the
        # pattern ends swapped over the ^-members — same bound columns
        # either way, normalized before the union (bag semantics)
        s, alt, o = pattern
        parts = []
        if alt.preds:
            parts.append(
                _pattern_bindings(
                    ds, (s, AltPath(alt.preds), o),
                    witness=witness, graph_var=graph_var,
                )
            )
        parts.append(
            _pattern_bindings(
                ds, (o, AltPath(alt.rev_preds), s),
                witness=witness, graph_var=graph_var,
            )
        )
        if len(parts) == 1:
            return parts[0]
        (d1, v1), (d2, v2) = parts
        return (
            d1.map_batches(_norm_table, batch_format="pyarrow").union(
                d2.map_batches(_norm_table, batch_format="pyarrow")
            ),
            v1 | v2,
        )

    consts = [
        (pos, t) for pos, t in zip(_POS, pattern) if isinstance(t, Term)
    ]
    alt_preds = pattern[1].preds if isinstance(pattern[1], AltPath) else None
    neg_preds = pattern[1].preds if isinstance(pattern[1], NegPath) else None
    var_pos: dict[str, list[str]] = {}
    for pos, t in zip(_POS, pattern):
        if isinstance(t, Var):
            var_pos.setdefault(t.name, []).append(pos)

    def project(batch: pa.Table) -> pa.Table:
        mask = None
        for pos, term in consts:
            m = term_predicate(batch, pos, term)
            mask = m if mask is None else pc.and_(mask, m)
        if alt_preds is not None:
            am = None
            for term in alt_preds:
                m = term_predicate(batch, "pred", term)
                am = m if am is None else pc.or_(am, m)
            mask = am if mask is None else pc.and_(mask, am)
        if neg_preds is not None:
            nm = None
            for term in neg_preds:
                m = term_predicate(batch, "pred", term)
                nm = m if nm is None else pc.or_(nm, m)
            nm = pc.invert(nm)
            mask = nm if mask is None else pc.and_(mask, nm)
        if graph_var is not None and graph_var in var_pos:
            # ?g also appears in a triple position: constrain that
            # position to equal the graph IRI instead of overwriting
            # the binding below (GRAPH ?g { ?g <p> ?o } semantics).
            if "url" not in batch.column_names:
                raise SparqlSyntaxError(
                    "GRAPH ?var needs a quads dataset (url graph column)"
                )
            pos = var_pos[graph_var][0]
            gm = pc.and_(
                pc.equal(pc.cast(batch[f"{pos}_kind"], pa.int64()), KIND_IRI),
                pc.equal(
                    pc.cast(batch[f"{pos}_value"], pa.large_string()),
                    pc.cast(batch["url"], pa.large_string()),
                ),
            )
            mask = gm if mask is None else pc.and_(mask, gm)
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
        if graph_var is not None and graph_var not in var_pos:
            if "url" not in batch.column_names:
                raise SparqlSyntaxError(
                    "GRAPH ?var needs a quads dataset (url graph column)"
                )
            n = batch.num_rows
            cols[f"{graph_var}__kind"] = pa.array([KIND_IRI] * n, pa.int64())
            cols[f"{graph_var}__value"] = pc.cast(batch["url"], pa.large_string())
            cols[f"{graph_var}__lang"] = pa.array([""] * n, pa.large_string())
            cols[f"{graph_var}__datatype"] = pa.array([""] * n, pa.large_string())
        if not cols:  # all-constant pattern: keep a row-count witness
            # (name is per-pattern unique — two ground patterns must not
            # collide when their cartesian witnesses join)
            cols[witness] = pa.array([1] * batch.num_rows, pa.int64())
        return pa.table(cols)

    bound = set(var_pos) | ({graph_var} if graph_var is not None else set())
    return ds.map_batches(project, batch_format="pyarrow"), bound


def _norm_table(batch: pa.Table) -> pa.Table:
    """Canonical binding-column types (kind → int64, the rest →
    large_string) so datasets from different execution paths (Arrow
    projection, pandas co-group, union branches) join cleanly."""
    cols = {}
    for c in batch.column_names:
        col = batch[c]
        if c.endswith("__kind"):
            col = pc.cast(col, pa.int64())
        elif "__" in c:  # a variable's value/lang/datatype column
            col = pc.cast(col, pa.large_string())
        cols[c] = col
    return pa.table(cols)


def _filter_vars(flt) -> set[str]:
    if isinstance(flt, (ExistsFilter, MinusBlock)):
        return set()  # group filters: never pushed down, applied in _bgp
    if isinstance(flt, OrFilter):
        return set().union(
            set(), *(_filter_vars(p) for group in flt.parts for p in group)
        )
    if isinstance(
        flt, (Regex, StrFunc, FuncComparison, TypeCheck, InFilter, Bound, LangMatches)
    ):
        return {flt.var.name}
    if isinstance(flt, ExprComparison):
        return _expr_vars(flt.left) | _expr_vars(flt.right)
    return {x.name for x in (flt.left, flt.right) if isinstance(x, Var)}


def _pattern_key_column(batch: pa.Table, var: str) -> pa.Array:
    """Single uint64 join key = hash of the variable's full term
    identity (kind, value, lang, datatype) — used only for the sort
    exchange; the in-block merges re-check the 4 real columns, so a
    hash collision merely co-locates two groups, never mis-joins.

    NB: ``hash64`` comes from the module top — a lazy relative import
    here would execute INSIDE the worker, where ``argo_ray`` is not on
    sys.path (workers get this module by value, not by import)."""
    sep = pa.scalar("\x1f", pa.large_string())
    joined = pc.binary_join_element_wise(
        pc.cast(batch[f"{var}__kind"], pa.large_string()),
        sep,
        pc.cast(batch[f"{var}__value"], pa.large_string()),
        sep,
        pc.cast(batch[f"{var}__lang"], pa.large_string()),
        sep,
        pc.cast(batch[f"{var}__datatype"], pa.large_string()),
        pa.scalar("", pa.large_string()),
    )
    return hash64(joined)


def _cogroup_join(parts: list, anchor: str | None, how: str = "inner"):
    """Multi-way join of pattern binding tables that all bind ``anchor``:
    tag + null-pad + union → ONE sort exchange on the anchor's term hash
    → in-block pandas hash merges on each pair's full shared-variable
    columns.  Replaces a chain of per-pattern hash-shuffle joins (each a
    fixed-cost actor-pool exchange) with a single exchange — the same
    trick the dedup stages use (sort co-location, grouping.py).  This is
    the engine's ONLY join primitive: ``Dataset.join`` proved flaky in
    Ray 2.49 on small multi-key inputs (intermittent ArrowInvalid
    'no match or multiple matches for key FieldRef').

    ``anchor=None`` uses a constant key (disconnected parts — the
    in-block merge degrades to a cartesian ``how='cross'``).
    ``how='left'`` (2 parts) left-joins the second part onto the first
    (OPTIONAL semantics; unmatched rows null-fill the optional vars).
    ``how='semi'``/``how='anti'`` (2 parts) keep/remove first-part rows
    that have ≥1 match in the second on the full shared-variable
    columns, output = first part's columns only (EXISTS / NOT EXISTS /
    MINUS semantics; left multiplicity preserved).

    Skew note: one hot anchor value lands in one block; the merges
    within it are vectorized pandas joins, but a pathologically hot join
    key (≳ a block of rows by itself) would serialize — the same
    documented constraint as ``grouped_map``."""
    import numpy as np

    pat_vars = [sorted(v) for _, v in parts]
    all_cols: list[str] = []
    for vs in pat_vars:
        for v in vs:
            for c in _var_cols(v):
                if c not in all_cols:
                    all_cols.append(c)

    def pad(i):
        vs = set(pat_vars[i])

        def fn(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            key = (
                _pattern_key_column(batch, anchor)
                if anchor is not None
                else pa.array(np.zeros(n, dtype=np.uint64), pa.uint64())
            )
            cols = {"_k": key,
                    "_pat": pa.array(np.full(n, i, dtype=np.int64))}
            for c in all_cols:
                if c in batch.column_names:
                    col = batch[c]
                    if not c.endswith("__kind"):
                        col = pc.cast(col, pa.large_string())
                    cols[c] = col
                else:
                    t = pa.int64() if c.endswith("__kind") else pa.large_string()
                    cols[c] = pa.nulls(n, t)
            return pa.table(cols)

        return fn

    unioned = parts[0][0].map_batches(pad(0), batch_format="pyarrow")
    for i in range(1, len(parts)):
        unioned = unioned.union(
            parts[i][0].map_batches(pad(i), batch_format="pyarrow")
        )

    semi_like = how in ("semi", "anti")
    if semi_like and len(parts) != 2:
        raise ValueError("semi/anti co-group join needs exactly 2 parts")
    out_cols = (
        [c for v in pat_vars[0] for c in _var_cols(v)] if semi_like else all_cols
    )
    proto_cols = {c: pd.Series([], dtype="int64" if c.endswith("__kind") else "object")
                  for c in all_cols}

    def _quiet_empty(out: pd.DataFrame) -> pd.DataFrame:
        # object-dtype columns of length 0 trip Ray's block-size
        # estimator (np.vectorize on empty input) — harmless but noisy;
        # typed empties keep the logs clean
        if len(out) == 0:
            out = out.astype(
                {c: "string" for c in out.columns if not c.endswith("__kind")}
            )
        return out

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return _quiet_empty(pd.DataFrame({c: proto_cols[c] for c in out_cols}))
        frames = []
        for i, vs in enumerate(pat_vars):
            cols = [c for v in vs for c in _var_cols(v)]
            frames.append(df.loc[df["_pat"] == i, cols])
        if semi_like:
            shared = sorted(set(pat_vars[0]) & set(pat_vars[1]))
            on = [c for v in shared for c in _var_cols(v)]
            right = frames[1][on].drop_duplicates()
            if how == "semi":
                out = frames[0].merge(right, on=on, how="inner")
            else:
                m = frames[0].merge(
                    right, on=on, how="left", indicator="_exists"
                )
                out = m.loc[m["_exists"] == "left_only"].drop(columns="_exists")
            for c in out_cols:
                if c.endswith("__kind"):
                    out[c] = out[c].astype("Int64")
            return _quiet_empty(out[out_cols])
        out = frames[0]
        seen = set(pat_vars[0])
        for i in range(1, len(frames)):
            shared = sorted(seen & set(pat_vars[i]))
            on = [c for v in shared for c in _var_cols(v)]
            if on:
                out = out.merge(frames[i], on=on, how=how)
            else:  # disconnected parts: cartesian product in-block
                out = out.merge(frames[i], how="cross")
            seen |= set(pat_vars[i])
        for c in all_cols:
            if c not in out.columns:
                out[c] = pd.Series([], dtype=proto_cols[c].dtype)
            elif c.endswith("__kind"):
                # null-padding in the union coerced kinds to float64;
                # nullable Int64 keeps left-join misses as nulls
                out[c] = out[c].astype("Int64")
        return _quiet_empty(out[all_cols])

    joined = unioned.sort("_k").map_batches(
        combine, batch_format="pandas", batch_size=None
    )
    return joined.map_batches(_norm_table, batch_format="pyarrow")


def _union_bindings(ds, block: UnionBlock):
    """``{A} UNION {B}`` → one bindings Dataset; every branch must bind
    the same variable set (unbound-variable compatibility semantics are
    out of the supported subset — fail loudly instead of mis-joining)."""
    sides, var_sets = [], []
    for patterns, filters in block.branches:
        b, vs, leftover = _bgp(ds, patterns, filters)
        _check_filter_vars(leftover, vs)
        b = _apply_filters(b, leftover)
        sides.append(b)
        # path-internal ($-gensym) vars are branch-local — project away
        var_sets.append({v for v in vs if "$" not in v})
    if any(vs != var_sets[0] for vs in var_sets[1:]):
        raise SparqlSyntaxError(
            "UNION branches must bind the same variables "
            f"({[sorted(v) for v in var_sets]})"
        )
    cols = [c for v in sorted(var_sets[0]) for c in _var_cols(v)]

    def norm(batch: pa.Table) -> pa.Table:
        return _norm_table(batch.select(cols))

    out = sides[0].map_batches(norm, batch_format="pyarrow")
    for s in sides[1:]:
        out = out.union(s.map_batches(norm, batch_format="pyarrow"))
    return out, set(var_sets[0])


def _replicate_rows(ds, n: int):
    """Each row repeated ``n`` times (n==0 → empty, schema kept)."""
    import numpy as np

    def rep(batch: pa.Table) -> pa.Table:
        if n == 0:
            return batch.slice(0, 0)
        return batch.take(
            pa.array(np.repeat(np.arange(batch.num_rows), n))
        )

    return ds.map_batches(rep, batch_format="pyarrow")


def _rename_binding(ds, mapping: dict):
    """Rename binding variables: ``v__field`` → ``mapping[v]__field``."""

    def fn(batch: pa.Table) -> pa.Table:
        cols = {}
        for c in batch.column_names:
            v, f = c.rsplit("__", 1)
            cols[f"{mapping.get(v, v)}__{f}"] = batch[c]
        return pa.table(cols)

    return ds.map_batches(fn, batch_format="pyarrow")


#: Fixpoint bound for ``p+`` — a loud error beats a silently truncated
#: closure.  64 hops covers any real KG hierarchy depth.
TRANSITIVE_MAX_HOPS = 64


def _term_row(var: str, t: Term):
    """One-row bindings table: ``var`` bound to the constant term
    (the zero-length-path solution for a constant end)."""
    import ray.data

    return ray.data.from_arrow(
        pa.table(
            {
                f"{var}__kind": pa.array([t.kind], pa.int64()),
                f"{var}__value": pa.array([t.value], pa.large_string()),
                f"{var}__lang": pa.array([t.lang], pa.large_string()),
                f"{var}__datatype": pa.array([t.datatype], pa.large_string()),
            }
        )
    )


def _graph_nodes(ds, var: str):
    """Every term in subject or object position of any triple — the
    SPARQL 1.1 'nodes of G' the zero-length path ranges over when both
    ends are variables.  One streaming scan + distinct."""

    def project(batch: pa.Table) -> pa.Table:
        tables = []
        for pos in ("subj", "obj"):
            tables.append(
                pa.table(
                    {
                        f"{var}__kind": pc.cast(batch[f"{pos}_kind"], pa.int64()),
                        f"{var}__value": pc.cast(
                            batch[f"{pos}_value"], pa.large_string()
                        ),
                        f"{var}__lang": pc.cast(
                            batch[f"{pos}_lang"], pa.large_string()
                        ),
                        f"{var}__datatype": pc.cast(
                            batch[f"{pos}_datatype"], pa.large_string()
                        ),
                    }
                )
            )
        return pa.concat_tables(tables)

    return _distinct(
        ds.map_batches(project, batch_format="pyarrow"), _var_cols(var)
    )


def _zero_or_one_bindings(ds, pattern, witness: str = "_match"):
    """``subj p? obj`` (ZeroOrOnePath, set semantics): the one-hop
    matches unioned with the zero-length solutions — a constant end
    matches itself; with both ends variable every graph node matches
    itself.  One edge scan + (at most) one node scan, distinct over
    the bound columns; no fixpoint."""
    import ray.data

    subj, tp, obj = pattern
    one, vs = _pattern_bindings(ds, (subj, tp.pred, obj), witness=witness)
    one = one.map_batches(_norm_table, batch_format="pyarrow")
    if isinstance(subj, Term) and isinstance(obj, Term):
        if subj != obj:
            return one.limit(1), set()
        return (
            ray.data.from_arrow(pa.table({witness: pa.array([1], pa.int64())})),
            set(),
        )
    if isinstance(subj, Term):  # obj is a Var
        out = _distinct(one.union(_term_row(obj.name, subj)), _var_cols(obj.name))
        return out, vs
    if isinstance(obj, Term):  # subj is a Var
        out = _distinct(one.union(_term_row(subj.name, obj)), _var_cols(subj.name))
        return out, vs
    if subj.name == obj.name:
        # ?x p? ?x — zero-length covers every node; self-loops add nothing
        return _graph_nodes(ds, subj.name), {subj.name}
    nodes = _graph_nodes(ds, subj.name)

    def self_pairs(batch: pa.Table) -> pa.Table:
        cols = {c: batch[c] for c in batch.column_names}
        for f in _FIELDS:
            cols[f"{obj.name}__{f}"] = batch[f"{subj.name}__{f}"]
        return pa.table(cols)

    zero = nodes.map_batches(self_pairs, batch_format="pyarrow")
    out = _distinct(
        one.union(zero), _var_cols(subj.name) + _var_cols(obj.name)
    )
    return out, {subj.name, obj.name}


def _transitive_bindings(ds, pattern, witness: str = "_match"):
    """``subj p+ obj`` → (bindings, bound vars): one-or-more-hop
    reachability along ``p``, set semantics (SPARQL ArbitraryLengthPath).

    Shape at scale: with a constant end this is a seeded BFS — the
    frontier is only the newly-reached node set, each hop is ONE
    co-grouped join of frontier × p-edges plus an anti-join against the
    reached set (never the full closure).  With both ends variables it
    is semi-naive transitive closure over the p-edge set — inherently
    the size of the closure; fine for hierarchy-shaped predicates,
    documented cliff for dense graphs.  Iterations materialize (a
    fixpoint needs a barrier per hop); hop count is bounded by graph
    diameter and capped at TRANSITIVE_MAX_HOPS (loud error)."""
    import ray.data

    subj, tp, obj = pattern
    pred = tp.pred
    S, O, M = "_tcs$s", "_tcs$o", "_tcs$m"

    def norm(d):
        return d.map_batches(_norm_table, batch_format="pyarrow")

    edges, _ = _pattern_bindings(ds, (Var(S), pred, Var(O)))
    edges = _distinct(norm(edges), _var_cols(S) + _var_cols(O)).materialize()

    if isinstance(subj, Term):
        if tp.zero and isinstance(obj, Term) and subj == obj:
            # zero-length path: a constant end matches itself
            return (
                ray.data.from_arrow(
                    pa.table({witness: pa.array([1], pa.int64())})
                ),
                set(),
            )
        seed, _ = _pattern_bindings(ds, (subj, pred, Var(O)))
        reached = _distinct(norm(seed), _var_cols(O)).materialize()
        frontier = reached
        e_mo = _rename_binding(edges, {S: M})  # (M, O) edge view
        for _ in range(TRANSITIVE_MAX_HOPS):
            if frontier.count() == 0:
                break
            f_m = _rename_binding(frontier, {O: M})
            step = _cogroup_join([(f_m, {M}), (e_mo, {M, O})], anchor=M)
            step = _distinct(
                step.map_batches(
                    lambda b: b.select(_var_cols(O)), batch_format="pyarrow"
                ),
                _var_cols(O),
            )
            new = _cogroup_join(
                [(step, {O}), (reached, {O})], anchor=O, how="anti"
            ).materialize()
            if new.count() == 0:
                break
            reached = reached.union(new).materialize()
            frontier = new
        else:
            raise RuntimeError(
                f"p+ fixpoint exceeded {TRANSITIVE_MAX_HOPS} hops"
            )
        if isinstance(obj, Var):
            if tp.zero:
                reached = _distinct(
                    reached.union(_term_row(O, subj)), _var_cols(O)
                )
            return _rename_binding(reached, {O: obj.name}), {obj.name}
        # both ends constant: ASK-style witness (rows where O == obj)
        from ..stages.filter import term_predicate

        def wit(batch: pa.Table) -> pa.Table:
            b2 = pa.table({f"obj_{f}": batch[f"{O}__{f}"] for f in _FIELDS})
            m = term_predicate(b2, "obj", obj)
            n = int(pc.sum(pc.cast(m, pa.int64())).as_py() or 0)
            return pa.table({witness: pa.array([1] * n, pa.int64())})

        return reached.map_batches(wit, batch_format="pyarrow"), set()

    if isinstance(obj, Term):  # reverse BFS from the object end
        seed, _ = _pattern_bindings(ds, (Var(S), pred, obj))
        reached = _distinct(norm(seed), _var_cols(S)).materialize()
        frontier = reached
        e_sm = _rename_binding(edges, {O: M})  # (S, M) edge view
        for _ in range(TRANSITIVE_MAX_HOPS):
            if frontier.count() == 0:
                break
            f_m = _rename_binding(frontier, {S: M})
            step = _cogroup_join([(f_m, {M}), (e_sm, {S, M})], anchor=M)
            step = _distinct(
                step.map_batches(
                    lambda b: b.select(_var_cols(S)), batch_format="pyarrow"
                ),
                _var_cols(S),
            )
            new = _cogroup_join(
                [(step, {S}), (reached, {S})], anchor=S, how="anti"
            ).materialize()
            if new.count() == 0:
                break
            reached = reached.union(new).materialize()
            frontier = new
        else:
            raise RuntimeError(
                f"p+ fixpoint exceeded {TRANSITIVE_MAX_HOPS} hops"
            )
        if tp.zero:
            reached = _distinct(
                reached.union(_term_row(S, obj)), _var_cols(S)
            )
        return _rename_binding(reached, {S: subj.name}), {subj.name}

    # both ends variables: full semi-naive closure over the edge set
    all_pairs = edges
    frontier = edges
    pair_cols = _var_cols(S) + _var_cols(O)
    for _ in range(TRANSITIVE_MAX_HOPS):
        if frontier.count() == 0:
            break
        f_sm = _rename_binding(frontier, {O: M})  # (S, M)
        e_mo = _rename_binding(edges, {S: M})  # (M, O)
        step = _cogroup_join([(f_sm, {S, M}), (e_mo, {M, O})], anchor=M)
        step = _distinct(
            step.map_batches(
                lambda b: b.select(pair_cols), batch_format="pyarrow"
            ),
            pair_cols,
        )
        new = _cogroup_join(
            [(step, {S, O}), (all_pairs, {S, O})], anchor=S, how="anti"
        ).materialize()
        if new.count() == 0:
            break
        all_pairs = all_pairs.union(new).materialize()
        frontier = new
    else:
        raise RuntimeError(f"p+ fixpoint exceeded {TRANSITIVE_MAX_HOPS} hops")
    if subj.name == obj.name:
        if tp.zero:  # ?x p* ?x — every node reaches itself
            return (
                _rename_binding(_graph_nodes(ds, S), {S: subj.name}),
                {subj.name},
            )

        # ?x p+ ?x — cycles through x
        def self_only(batch: pa.Table) -> pa.Table:
            m = None
            for f in _FIELDS:
                a, b = batch[f"{S}__{f}"], batch[f"{O}__{f}"]
                if f != "kind":
                    a, b = (
                        pc.cast(a, pa.large_string()),
                        pc.cast(b, pa.large_string()),
                    )
                e = pc.equal(a, b)
                m = e if m is None else pc.and_(m, e)
            return batch.filter(m).select(_var_cols(S))

        out = all_pairs.map_batches(self_only, batch_format="pyarrow")
        return _rename_binding(out, {S: subj.name}), {subj.name}
    if tp.zero:
        # zero-length solutions: every graph node paired with itself
        def self_pair(batch: pa.Table) -> pa.Table:
            cols = dict(zip(batch.column_names, batch.columns))
            for f in _FIELDS:
                cols[f"{O}__{f}"] = batch[f"{S}__{f}"]
            return pa.table(cols)

        self_pairs = _graph_nodes(ds, S).map_batches(
            self_pair, batch_format="pyarrow"
        )
        all_pairs = _distinct(all_pairs.union(self_pairs), pair_cols)
    return (
        _rename_binding(all_pairs, {S: subj.name, O: obj.name}),
        {subj.name, obj.name},
    )


def _apply_group_filter(result, bound: set, ds, f):
    """``FILTER [NOT] EXISTS { … }`` / ``MINUS { … }``: evaluate the
    inner group, then semi/anti co-group join on the shared variables.
    No shared variables: EXISTS degenerates to a constant condition
    (inner non-empty?), MINUS removes nothing (SPARQL semantics)."""
    inner, ivs, leftover = _bgp(ds, f.patterns, f.filters)
    _check_filter_vars(leftover, ivs)
    inner = _apply_filters(inner, leftover)
    negated = True if isinstance(f, MinusBlock) else f.negated
    shared = sorted(bound & ivs)
    if not shared:
        if isinstance(f, MinusBlock):
            return result
        nonempty = inner.limit(1).count() > 0
        return result if nonempty != negated else result.limit(0)
    return _cogroup_join(
        [(result, bound), (inner, ivs)],
        anchor=shared[0],
        how="anti" if negated else "semi",
    )


def _values_bindings(block: ValuesBlock):
    """``VALUES`` → an inline bindings Dataset (constant, driver-built;
    joins like any other part — VALUES at corpus scale is always the
    small broadcast-able side)."""
    import ray.data

    cols = {}
    for j, v in enumerate(block.variables):
        terms = [r[j] for r in block.rows]
        cols[f"{v}__kind"] = pa.array([t.kind for t in terms], pa.int64())
        cols[f"{v}__value"] = pa.array([t.value for t in terms], pa.large_string())
        cols[f"{v}__lang"] = pa.array([t.lang for t in terms], pa.large_string())
        cols[f"{v}__datatype"] = pa.array(
            [t.datatype for t in terms], pa.large_string()
        )
    return ray.data.from_arrow(pa.table(cols)), set(block.variables)


def _subselect_bindings(ds, q):
    """``{ SELECT … }`` → (bindings, projected vars): evaluate the
    inner group, project the selected variables' term columns, then
    DISTINCT (over full term identity) and the ORDER BY-backed
    LIMIT/OFFSET slice.  The result joins like any other part.
    Aggregate subqueries route through ``_subselect_aggregate``."""
    bindings, bound, leftover = _bgp(ds, q.patterns, q.filters)
    bindings, bound = _finish_group(
        ds, bindings, bound, leftover, q.optionals, q.binds
    )
    if q.aggregates:
        return _subselect_aggregate(bindings, q, bound)
    variables = q.variables or sorted(v for v in bound if "$" not in v)
    missing = [v for v in variables if v not in bound]
    if missing:
        raise SparqlSyntaxError(f"unbound subquery SELECT variables: {missing}")
    cols = [c for v in variables for c in _var_cols(v)]

    def project(batch: pa.Table) -> pa.Table:
        return _norm_table(batch.select(cols))

    out = bindings.map_batches(project, batch_format="pyarrow")
    if q.distinct:
        out = _distinct(out, cols)
    if q.order_by:
        for v, _ in q.order_by:
            if v not in variables:
                raise SparqlSyntaxError(f"subquery ORDER BY {v!r} not projected")

        def add_keys(batch: pa.Table) -> pa.Table:
            for i, (v, _) in enumerate(q.order_by):
                rendered = pc.fill_null(
                    nt_render_term_arrays(
                        batch[f"{v}__kind"], batch[f"{v}__value"],
                        batch[f"{v}__lang"], batch[f"{v}__datatype"],
                    ),
                    "",
                )
                batch = batch.append_column(f"_ord{i}", rendered)
            # §15.1 value order for numeric literals rides the same
            # derived-key scheme as the top-level sort
            return _append_order_keys(
                batch, [(f"_ord{i}", d) for i, (_, d) in enumerate(q.order_by)]
            )

        keys, desc = _order_sort_spec(
            [(f"_ord{i}", d) for i, (_, d) in enumerate(q.order_by)]
        )
        out = out.map_batches(add_keys, batch_format="pyarrow").sort(
            keys, descending=desc
        )
        out = _apply_slice(out, q.limit, q.offset)
        out = out.map_batches(
            lambda b: b.select(cols), batch_format="pyarrow"
        )
    return out, set(variables)


_XSD_DOUBLE = "http://www.w3.org/2001/XMLSchema#double"


def _subselect_aggregate(bindings, q, bound: set):
    """Aggregate subquery ``{ SELECT ?g (COUNT(*) AS ?n) … GROUP BY ?g }``
    → (bindings, vars).  The group runs through the normal partial-agg
    machinery, then the (one-row-per-group, small-by-design) output is
    lifted back into term-binding columns so it joins like any group
    element: group keys re-parse their canonical renderings
    (``nt_parse_term_arrays``), COUNT becomes an xsd:integer literal,
    SUM/MIN/MAX/AVG xsd:double literals with DuckDB-compatible
    lexicals (integral values get a trailing ``.0``), SAMPLE re-parses
    its rendered term."""
    for v in list(q.group_by) + [a.var for a in q.aggregates if a.var]:
        if v not in bound:
            raise SparqlSyntaxError(f"unbound variable ?{v} in aggregate subquery")
    cols = list(q.variables) + [a.alias for a in q.aggregates]
    out = _aggregate_query(bindings, q, cols)
    out = _apply_having(out, q)
    if q.order_by:
        order = _resolve_order(q.order_by, q.aggregates, cols)
        out = out.sort(
            [v for v, _ in order], descending=[d for _, d in order]
        )
        out = _apply_slice(out, q.limit, q.offset)
    func_by_alias = {a.alias: a.func for a in q.aggregates}

    def ls(s):
        return pa.scalar(s, pa.large_string())

    def to_terms(batch: pa.Table) -> pa.Table:
        res = {}
        for name in cols:
            col = batch[name]
            func = func_by_alias.get(name)
            if func is None or func == "sample":
                # a rendered term (group key / SAMPLE); "" = unbound key
                rendered = pc.cast(col, pa.large_string())
                rendered = pc.if_else(
                    pc.equal(pc.fill_null(rendered, ""), ls("")),
                    pa.scalar(None, pa.large_string()),
                    rendered,
                )
                parsed = nt_parse_term_arrays(rendered.combine_chunks())
                for fld in ("kind", "value", "lang", "datatype"):
                    res[f"{name}__{fld}"] = parsed[fld]
                continue
            if func == "group_concat":
                # plain (simple) literal per the spec
                lex = pc.fill_null(pc.cast(col, pa.large_string()), "")
                okv = pc.is_valid(lex)
                res[f"{name}__kind"] = pc.if_else(
                    okv,
                    pa.scalar(KIND_LITERAL, pa.int64()),
                    pa.scalar(None, pa.int64()),
                )
                res[f"{name}__value"] = lex
                res[f"{name}__lang"] = pc.if_else(
                    okv, ls(""), pa.scalar(None, pa.large_string())
                )
                res[f"{name}__datatype"] = pc.if_else(
                    okv, ls(""), pa.scalar(None, pa.large_string())
                )
                continue
            if func == "count":
                lex = pc.cast(col, pa.large_string())
                dt = _XSD_INTEGER
            else:
                fcol = pc.cast(col, pa.float64())
                ok = pc.and_(pc.is_valid(fcol), pc.invert(pc.is_nan(fcol)))
                lex = pc.cast(fcol, pa.large_string())
                # Arrow renders integral doubles bare ('3'); append '.0'
                # for the DuckDB/Python canonical form ('3.0')
                integral = pc.invert(
                    pc.match_substring_regex(pc.fill_null(lex, ""), r"[.een]")
                )
                lex = pc.if_else(
                    integral,
                    pc.binary_join_element_wise(pc.fill_null(lex, ""), ls(".0"), ls("")),
                    lex,
                )
                lex = pc.if_else(ok, lex, pa.scalar(None, pa.large_string()))
                dt = _XSD_DOUBLE
            okv = pc.is_valid(lex)
            res[f"{name}__kind"] = pc.if_else(
                okv, pa.scalar(KIND_LITERAL, pa.int64()), pa.scalar(None, pa.int64())
            )
            res[f"{name}__value"] = lex
            res[f"{name}__lang"] = pc.if_else(
                okv, ls(""), pa.scalar(None, pa.large_string())
            )
            res[f"{name}__datatype"] = pc.if_else(
                okv, ls(dt), pa.scalar(None, pa.large_string())
            )
        return _norm_table(pa.table(res))

    return out.map_batches(to_terms, batch_format="pyarrow"), set(cols)


# SPARQL 1.1 Federated Query endpoints: IRI → triples Dataset.  A
# cluster engine can't do per-task HTTP, so "remote endpoint" means a
# registered Dataset (file-backed store, another pipeline's output) —
# the same substitution the file-backed GraphStore makes for the
# protocol verbs.  Driver-side registry; register before evaluating.
_SERVICE_REGISTRY: dict[str, object] = {}


def register_service(iri: str, ds) -> None:
    """Register the dataset behind ``SERVICE <iri>`` blocks."""
    _SERVICE_REGISTRY[iri] = ds


def unregister_service(iri: str) -> None:
    _SERVICE_REGISTRY.pop(iri, None)


def _service_bindings(block):
    """``SERVICE [SILENT] <iri> { … }`` → (bindings, vars): the inner
    group evaluates with the full engine against the registered
    endpoint dataset, then joins like any other group element.
    Unknown endpoint: error, or with SILENT the identity solution
    (one empty row — §2.2 failure semantics)."""
    import ray.data as _rd

    target = _SERVICE_REGISTRY.get(block.iri)
    if target is None:
        if not block.silent:
            raise SparqlSyntaxError(
                f"no dataset registered for SERVICE <{block.iri}> "
                "(engine.register_service)"
            )
        return _rd.from_arrow(pa.table({"_svc": pa.array([1], pa.int64())})), set()
    bindings, bound, leftover = _bgp(target, block.patterns, block.filters)
    if leftover:
        _check_filter_vars(leftover, bound)
        bindings = _apply_filters(bindings, leftover)
    return bindings, bound


def _graph_bindings(ds, block):
    """``GRAPH <iri>|?g { … }`` → (bindings, vars) over a quads dataset
    (triples + ``url`` graph column, the ``read_graphstore`` layout).

    Constant graph: ONE vectorized url-mask scopes the scan, then the
    inner group evaluates with the full engine (paths included).
    Variable graph: every inner pattern binds ``?g`` from ``url``; the
    co-group join then equates ``?g`` across patterns like any shared
    variable — no per-graph fan-out, still one scan per pattern."""
    g = block.graph
    cols = ds.columns()  # schema metadata only — no execution at this size
    if cols is not None and "url" not in cols:
        raise SparqlSyntaxError(
            "GRAPH needs a quads dataset (url graph column)"
        )
    if isinstance(g, Term):

        def scope(batch: pa.Table) -> pa.Table:
            if "url" not in batch.column_names:
                raise SparqlSyntaxError(
                    "GRAPH needs a quads dataset (url graph column)"
                )
            return batch.filter(
                pc.equal(
                    pc.cast(batch["url"], pa.large_string()),
                    pa.scalar(g.value, pa.large_string()),
                )
            )

        scoped = ds.map_batches(scope, batch_format="pyarrow")
        bindings, bound, leftover = _bgp(scoped, block.patterns, block.filters)
        if leftover:
            _check_filter_vars(leftover, bound)
            bindings = _apply_filters(bindings, leftover)
        return bindings, bound
    bindings, bound, leftover = _bgp(
        ds, block.patterns, block.filters, graph_var=g.name
    )
    if leftover:
        _check_filter_vars(leftover, bound)
        bindings = _apply_filters(bindings, leftover)
    return bindings, bound


def _bgp(ds, patterns, filters=(), graph_var=None):
    """Basic graph pattern → joined bindings Dataset + bound vars.

    Single-pattern filters push down to that pattern's scan (before any
    exchange); the largest subset of patterns sharing one variable joins
    in a single co-grouped sort exchange; leftover parts join pairwise
    through the same co-group primitive (anchored on a shared variable,
    or constant-keyed for disconnected parts).  UNION blocks evaluate
    recursively and then participate like any other part.  Returns the
    leftover (cross-pattern) filters for the caller to apply post-join."""
    if not patterns:
        raise SparqlSyntaxError("empty graph pattern")

    parts = []  # (bindings ds, var set), filters pushed into the scan
    remaining_filters = list(filters)
    for pat_i, pattern in enumerate(patterns):
        if isinstance(pattern, UnionBlock):
            b, vs = _union_bindings(ds, pattern)
        elif isinstance(pattern, SubSelect):
            b, vs = _subselect_bindings(ds, pattern.query)
        elif isinstance(pattern, GraphBlock):
            b, vs = _graph_bindings(ds, pattern)
        elif isinstance(pattern, ServiceBlock):
            b, vs = _service_bindings(pattern)
        elif isinstance(pattern, ValuesBlock):
            b, vs = _values_bindings(pattern)
        elif isinstance(pattern[1], NegPath) and pattern[1].rev_preds:
            b, vs = _negset_bindings(
                ds, pattern, witness=f"_match{pat_i}", graph_var=graph_var
            )
        elif isinstance(pattern[1], TransPath) and pattern[1].max_one:
            b, vs = _zero_or_one_bindings(ds, pattern, witness=f"_match{pat_i}")
        elif isinstance(pattern[1], TransPath):
            b, vs = _transitive_bindings(ds, pattern, witness=f"_match{pat_i}")
        else:
            b, vs = _pattern_bindings(
                ds, pattern, witness=f"_match{pat_i}", graph_var=graph_var
            )
        push = [f for f in remaining_filters if _filter_vars(f) and _filter_vars(f) <= vs]
        if push:
            b = _apply_filters(b, push)
            remaining_filters = [f for f in remaining_filters if f not in push]
        parts.append((b, vs))

    # pick the variable bound by the most patterns as the co-group anchor
    counts: dict[str, int] = {}
    for _, vs in parts:
        for v in vs:
            counts[v] = counts.get(v, 0) + 1
    anchor = max(counts, key=lambda v: (counts[v], v)) if counts else None

    grouped = [p for p in parts if anchor in p[1]]
    rest = [p for p in parts if anchor not in p[1]]

    if len(grouped) >= 2:
        result = _cogroup_join(grouped, anchor)
        bound = set().union(*(v for _, v in grouped))
    else:
        result, bound = grouped[0] if grouped else rest.pop(0)

    for nxt, vars2 in rest:
        shared = sorted(bound & vars2)
        if shared:
            result = _cogroup_join(
                [(result, bound), (nxt, vars2)], anchor=shared[0]
            )
        elif not vars2 or not bound:
            # one side is a pure witness (ground patterns — the common
            # no-shared-vars case): multiply the other side's multiset by
            # the witness row count.  No join involved — witness counts
            # are tiny by construction (a ground pattern's matches).
            witness, keeper = (nxt, result) if not vars2 else (result, nxt)
            n = witness.count()
            if not vars2 and not bound:
                # both ground: the product is a 1-column witness again
                m = result.count()
                import ray.data

                result = ray.data.from_arrow(
                    pa.table({"_match": pa.array([1] * (n * m), pa.int64())})
                )
            else:
                result = _replicate_rows(keeper, n)
        else:
            # true cross product of two var-bearing sides (disconnected
            # BGP — degenerate by nature): co-group with a constant key
            # and an in-block pandas cross merge.  NOT Dataset.join on a
            # constant key column, which proved flaky in Ray 2.49
            # (intermittent ArrowInvalid on the key FieldRef).
            result = _cogroup_join([(result, bound), (nxt, vars2)], None)
        bound |= vars2
    group_filters = [
        f for f in remaining_filters if isinstance(f, (ExistsFilter, MinusBlock))
    ]
    if group_filters:
        remaining_filters = [
            f for f in remaining_filters
            if not isinstance(f, (ExistsFilter, MinusBlock))
        ]
        for f in group_filters:
            result = _apply_group_filter(result, bound, ds, f)
    return result, bound, remaining_filters


def _check_filter_vars(filters, bound: set) -> None:
    for f in filters:
        missing = _filter_vars(f) - bound
        if missing:
            raise SparqlSyntaxError(
                f"FILTER references unbound variable(s): {sorted(missing)}"
            )


def _attach_optionals(result, bound: set, ds, optionals):
    """LEFT-join each OPTIONAL group's bindings onto the required ones
    (unmatched rows keep nulls in the optional variables — rendered as
    the empty string, the result parser's representation of an unbound
    binding)."""
    for opt in optionals:
        ob, ovs, leftover = _bgp(ds, opt.patterns, opt.filters)
        inner = getattr(opt, "optionals", []) or []
        if inner:
            # nested OPTIONAL: LeftJoin(A, LeftJoin(B, C)) — the inner
            # group left-joins onto THIS group's bindings first (r4 s4)
            ob, ovs = _attach_optionals(ob, ovs, ds, inner)
        _check_filter_vars(leftover, ovs)
        ob = _apply_filters(ob, leftover)
        opt_binds = getattr(opt, "binds", []) or []
        if opt_binds:
            # BINDs scoped to the optional group: evaluated on ITS
            # bindings before the left join, so aliases stay unbound
            # (null → '') on rows the optional did not match
            ob, ovs = _apply_binds(ob, opt_binds, ovs)
        shared = sorted(bound & ovs)
        if not shared:
            raise SparqlSyntaxError(
                "OPTIONAL group shares no variable with the required pattern"
            )
        result = _cogroup_join(
            [(result, bound), (ob, ovs)], anchor=shared[0], how="left"
        )
        bound |= ovs
    return result, bound


_XSD_INTEGER = "http://www.w3.org/2001/XMLSchema#integer"


def _expr_vars(e) -> set[str]:
    if isinstance(e, EVar):
        return {e.name}
    if isinstance(e, EConst):
        return set()
    if isinstance(e, EArith):
        return _expr_vars(e.left) | _expr_vars(e.right)
    if isinstance(e, EIf):
        if e.op == "__bool__":
            return (
                _filter_vars(e.cleft)
                | _expr_vars(e.then) | _expr_vars(e.other)
            )
        return (
            _expr_vars(e.cleft) | _expr_vars(e.cright)
            | _expr_vars(e.then) | _expr_vars(e.other)
        )
    return set().union(set(), *(_expr_vars(a) for a in e.args))


def _expr_type(e) -> str:
    """Result kind of a BIND expression: ``term`` (copy a variable /
    constant term verbatim), ``num`` (integer literal), ``str`` (plain
    literal)."""
    if isinstance(e, (EVar, EConst)):
        return "term"
    if isinstance(e, EArith):
        return "num"
    if isinstance(e, EIf):
        # numeric only when BOTH branches are numeric (an integer
        # constant counts); otherwise the branches coerce to lexical
        # forms and the result is a plain literal
        def numeric(b) -> bool:
            if isinstance(b, EConst):
                t = b.term
                if t.kind != KIND_LITERAL or t.lang:
                    return False
                try:
                    int(t.value)
                except ValueError:
                    return False
                return True
            return _expr_type(b) == "num"

        return "num" if numeric(e.then) and numeric(e.other) else "str"
    return "num" if e.func in ("strlen", "abs", "round", "ceil", "floor") else "str"


_CMP_KERNELS = {
    "=": pc.equal, "!=": pc.not_equal, "<": pc.less,
    "<=": pc.less_equal, ">": pc.greater, ">=": pc.greater_equal,
}


def _eval_cond(batch: pa.Table, e: "EIf"):
    """IF condition → nullable boolean array (null = condition error,
    which leaves the IF result unbound).  Numeric comparison where both
    sides evaluate numerically; rows where a term-typed operand is
    non-numeric fall back to string comparison over lexical forms
    (var-vs-var string equality works row-wise, not just when a
    non-numeric constant forces the except path)."""
    def statically_numeric(x) -> bool:
        if isinstance(x, EConst):
            try:
                float(x.term.value)
            except ValueError:
                return False
            return x.term.kind == KIND_LITERAL and not x.term.lang
        return _expr_type(x) == "num"

    if e.op == "__bool__":
        # boolean-function condition (IF(CONTAINS(…),…)): the FILTER
        # mask evaluator already returns the nullable boolean we need
        return _filter_mask(batch, e.cleft)
    try:
        lnum, rnum = _eval_num(batch, e.cleft), _eval_num(batch, e.cright)
        num_res = _CMP_KERNELS[e.op](pa.array(lnum), pa.array(rnum))
        num_ok = lnum.notna() & rnum.notna()
        if num_ok.all() or statically_numeric(e.cleft) or statically_numeric(e.cright):
            # statically-numeric side (arith, strlen, or a numeric
            # constant): an NA there is a genuine expression error
            # (→ unbound), not a string-typed value
            return num_res
        str_res = _CMP_KERNELS[e.op](
            _eval_str(batch, e.cleft), _eval_str(batch, e.cright)
        )
        return pc.if_else(pa.array(num_ok.values), num_res, str_res)
    except SparqlSyntaxError:
        return _CMP_KERNELS[e.op](
            _eval_str(batch, e.cleft), _eval_str(batch, e.cright)
        )


def _eval_num(batch: pa.Table, e) -> pd.Series:
    """Integer evaluation → nullable Int64 Series; expression errors
    (unparseable / non-integral lexical forms, unbound inputs) become
    NA, which the caller turns into an unbound binding — the SPARQL
    error-to-unbound rule, vectorized."""
    n = batch.num_rows
    if isinstance(e, EConst):
        t = e.term
        if t.kind != KIND_LITERAL:
            raise SparqlSyntaxError("non-literal constant in arithmetic")
        try:
            v = int(t.value)
        except ValueError:
            raise SparqlSyntaxError(
                f"non-integer constant {t.value!r} in arithmetic"
            )
        return pd.Series([v] * n, dtype="Int64")
    if isinstance(e, EVar):
        vals = pc.cast(batch[f"{e.name}__value"], pa.large_string())
        s = pd.to_numeric(
            pd.Series(vals.to_pylist(), dtype="object"), errors="coerce"
        )
        s = s.mask(s.notna() & (s % 1 != 0))  # non-integral → NA
        return s.astype("Int64")
    if isinstance(e, EArith):
        left, right = _eval_num(batch, e.left), _eval_num(batch, e.right)
        if e.op == "+":
            return left + right
        if e.op == "-":
            return left - right
        return left * right
    if isinstance(e, EFunc) and e.func == "strlen":
        lens = pc.utf8_length(_eval_str(batch, e.args[0]))
        return pd.Series(lens.to_pylist(), dtype="Int64")
    if isinstance(e, EFunc) and e.func in ("abs", "round", "ceil", "floor"):
        # float-domain eval of the argument's lexical form, integral
        # Int64 result (ROUND/CEIL/FLOOR are integral by definition;
        # SPARQL ROUND ties go toward +inf).  A non-integral ABS result
        # → NA (the engine's numeric domain is xsd:integer).
        import numpy as np

        arg = e.args[0]
        if isinstance(arg, EVar):
            vals = pc.cast(batch[f"{arg.name}__value"], pa.large_string())
            f = pd.to_numeric(
                pd.Series(vals.to_pylist(), dtype="object"), errors="coerce"
            )
        else:
            f = _eval_num(batch, arg).astype("Float64")
        f = f.astype("Float64")
        if e.func == "abs":
            f = f.abs()
        elif e.func == "round":
            f = np.floor(f + 0.5)
        elif e.func == "ceil":
            f = np.ceil(f)
        else:
            f = np.floor(f)
        f = pd.Series(f, dtype="Float64")
        f = f.mask(f.notna() & (f % 1 != 0))  # non-integral ABS → NA
        return f.astype("Int64")
    if isinstance(e, EIf) and _expr_type(e) == "num":
        cond = pd.Series(
            _eval_cond(batch, e).to_pandas().values, dtype="boolean"
        )
        then_s = _eval_num(batch, e.then)
        else_s = _eval_num(batch, e.other)
        out = then_s.where(cond.fillna(False).astype(bool), else_s)
        return out.mask(cond.isna().values)
    raise SparqlSyntaxError("string expression in arithmetic context")


def _const_str(e, what: str) -> str:
    if not (isinstance(e, EConst) and e.term.kind == KIND_LITERAL):
        raise SparqlSyntaxError(f"{what} must be a constant")
    return e.term.value


def _eval_str(batch: pa.Table, e) -> pa.Array:
    """String evaluation → nullable large_string array (null = SPARQL
    expression error / unbound input; nulls propagate through every
    kernel, so one bad row never fails the batch)."""
    n = batch.num_rows
    if isinstance(e, EConst):
        return pa.array([e.term.value] * n, pa.large_string())
    if isinstance(e, EVar):
        # the term's lexical form / IRI string / bnode label = STR()
        arr = pc.cast(batch[f"{e.name}__value"], pa.large_string())
        return arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    if isinstance(e, EArith) or (isinstance(e, EFunc) and e.func == "strlen"):
        return pc.cast(pa.array(_eval_num(batch, e)), pa.large_string())
    if isinstance(e, EIf):
        if _expr_type(e) == "num":
            return pc.cast(pa.array(_eval_num(batch, e)), pa.large_string())
        cond = _eval_cond(batch, e)
        # null condition → null result (if_else propagates the null)
        return pc.if_else(
            cond, _eval_str(batch, e.then), _eval_str(batch, e.other)
        )
    f = e.func
    if f == "str":
        return _eval_str(batch, e.args[0])
    if f in ("ucase", "lcase"):
        kern = pc.utf8_upper if f == "ucase" else pc.utf8_lower
        return kern(_eval_str(batch, e.args[0]))
    if f == "concat":
        args = [_eval_str(batch, a) for a in e.args]
        return pc.binary_join_element_wise(
            *args, pa.scalar("", pa.large_string())
        )
    if f == "coalesce":
        out = _eval_str(batch, e.args[0])
        for a in e.args[1:]:
            out = pc.if_else(pc.is_valid(out), out, _eval_str(batch, a))
        return out
    if f == "substr":
        # 1-based character indexing (SPARQL == SQL SUBSTR semantics)
        start = int(_const_str(e.args[1], "SUBSTR start"))
        arr = _eval_str(batch, e.args[0])
        if len(e.args) == 2:
            return pc.utf8_slice_codeunits(arr, max(start - 1, 0))
        length = int(_const_str(e.args[2], "SUBSTR length"))
        return pc.utf8_slice_codeunits(
            arr, max(start - 1, 0), max(start - 1, 0) + max(length, 0)
        )
    if f == "replace":
        return pc.replace_substring_regex(
            _eval_str(batch, e.args[0]),
            pattern=_const_str(e.args[1], "REPLACE pattern"),
            replacement=_const_str(e.args[2], "REPLACE replacement"),
        )
    if f in ("iri", "strdt", "strlang"):
        # nested use (e.g. STR(IRI(x))): the string content is the arg
        return _eval_str(batch, e.args[0])
    if f in ("strbefore", "strafter"):
        # spec: no match → "" (empty literal); null input stays null.
        # One vectorized pandas partition per batch (no pc kernel for
        # first-occurrence split).
        sep = _const_str(e.args[1], f"{f.upper()} separator")
        if sep == "":  # spec: empty separator → "" (before) / input (after)
            arr = _eval_str(batch, e.args[0])
            if f == "strafter":
                return arr
            return pc.if_else(
                pc.is_valid(arr),
                pa.scalar("", pa.large_string()),
                pa.scalar(None, pa.large_string()),
            )
        arr = _eval_str(batch, e.args[0])
        s = pd.Series(arr.to_pandas(), dtype="object")
        parts = s.str.partition(sep)
        found = s.str.contains(sep, regex=False)
        out = parts[0 if f == "strbefore" else 2].where(found, "")
        out = out.mask(s.isna())
        return pa.array(out, pa.large_string())
    if f in ("md5", "sha1", "sha256"):
        # lowercase-hex digest of the string value (DuckDB md5()/sha256()
        # twins).  Per-row hashlib: digest cost dwarfs loop overhead and
        # the oracle needs byte parity.
        import hashlib

        hfn = getattr(hashlib, f)
        arr = _eval_str(batch, e.args[0])
        return pa.array(
            [
                hfn(v.encode()).hexdigest() if v is not None else None
                for v in arr.to_pylist()
            ],
            pa.large_string(),
        )
    if f == "lang":
        # LANG(?x): the language tag, or "" for anything untagged
        # (spec: LANG of a non-literal is an error → here "" too, which
        # matches the engine's filter-side LANG)
        a = e.args[0]
        if not isinstance(a, EVar):
            raise SparqlSyntaxError("LANG() takes a variable")
        lang = pc.cast(batch[f"{a.name}__lang"], pa.large_string())
        bound_m = pc.is_valid(batch[f"{a.name}__kind"])
        return pc.if_else(
            bound_m,
            pc.fill_null(lang, ""),
            pa.scalar(None, pa.large_string()),
        )
    if f == "datatype":
        # string content of DATATYPE(?x); _apply_binds mints the IRI kind
        a = e.args[0]
        if not isinstance(a, EVar):
            raise SparqlSyntaxError("DATATYPE() takes a variable")
        kind = batch[f"{a.name}__kind"]
        dt = pc.fill_null(
            pc.cast(batch[f"{a.name}__datatype"], pa.large_string()), ""
        )
        lang = pc.fill_null(
            pc.cast(batch[f"{a.name}__lang"], pa.large_string()), ""
        )
        # RDF 1.1: plain literal → xsd:string, lang literal → rdf:langString
        dt = pc.if_else(
            pc.not_equal(dt, ""),
            dt,
            pc.if_else(
                pc.not_equal(lang, ""),
                pa.scalar(_F_RDF_LANGSTRING, pa.large_string()),
                pa.scalar(_F_XSD_STRING, pa.large_string()),
            ),
        )
        # DATATYPE of a non-literal is an error → unbound
        return pc.if_else(
            pc.equal(pc.cast(kind, pa.int64()), KIND_LITERAL),
            dt,
            pa.scalar(None, pa.large_string()),
        )
    raise SparqlSyntaxError(f"unsupported expression function {f!r}")


def _apply_binds(ds, binds, bound: set):
    """``BIND(expr AS ?alias)`` in order: each appends the alias's 4
    binding columns via one vectorized map_batches — no exchange, no
    materialization.  Arithmetic yields xsd:integer literals, string
    functions plain literals, a bare ``?var``/constant copies the term.
    Null results (expression errors) leave the alias unbound in that
    row (renders as '', BOUND(?alias) = false)."""
    for b in binds:
        if b.alias in bound:
            raise SparqlSyntaxError(
                f"BIND alias ?{b.alias} is already bound in the group"
            )
        missing = _expr_vars(b.expr) - bound
        if missing:
            raise SparqlSyntaxError(
                f"BIND expression references unbound variable(s): {sorted(missing)}"
            )
        etype = _expr_type(b.expr)

        def fn(batch: pa.Table, expr=b.expr, alias=b.alias, etype=etype):
            n = batch.num_rows
            if isinstance(expr, EFunc) and expr.func in (
                "iri", "strdt", "strlang", "datatype"
            ):
                # term constructors: mint an IRI / typed / lang literal
                # from the string expression (null input → unbound).
                # DATATYPE() is IRI-valued, so it mints too.
                vals = (
                    _eval_str(batch, expr)
                    if expr.func == "datatype"
                    else _eval_str(batch, expr.args[0])
                )
                okv = pc.is_valid(vals)
                if expr.func in ("iri", "datatype"):
                    kind, lang, dt = KIND_IRI, "", ""
                elif expr.func == "strdt":
                    kind, lang, dt = KIND_LITERAL, "", expr.args[1].term.value
                else:
                    kind, lang, dt = KIND_LITERAL, expr.args[1].term.value, ""

                def _c(v, typ):
                    return pc.if_else(
                        okv, pa.scalar(v, typ), pa.scalar(None, typ)
                    )

                cols = {
                    f"{alias}__kind": _c(kind, pa.int64()),
                    f"{alias}__value": vals,
                    f"{alias}__lang": _c(lang, pa.large_string()),
                    f"{alias}__datatype": _c(dt, pa.large_string()),
                }
                out = batch
                for cname, col in cols.items():
                    out = out.append_column(cname, col)
                return out
            if etype == "term":
                if isinstance(expr, EVar):
                    cols = {
                        f"{alias}__{f}": batch[f"{expr.name}__{f}"]
                        for f in _FIELDS
                    }
                else:
                    t = expr.term
                    cols = {
                        f"{alias}__kind": pa.array([t.kind] * n, pa.int64()),
                        f"{alias}__value": pa.array([t.value] * n, pa.large_string()),
                        f"{alias}__lang": pa.array([t.lang] * n, pa.large_string()),
                        f"{alias}__datatype": pa.array(
                            [t.datatype] * n, pa.large_string()
                        ),
                    }
            else:
                if etype == "num":
                    vals = pc.cast(
                        pa.array(_eval_num(batch, expr)), pa.large_string()
                    )
                    dt = _XSD_INTEGER
                else:
                    vals = _eval_str(batch, expr)
                    dt = ""
                valid = pc.is_valid(vals)
                cols = {
                    f"{alias}__kind": pc.if_else(
                        valid,
                        pa.scalar(KIND_LITERAL, pa.int64()),
                        pa.scalar(None, pa.int64()),
                    ),
                    f"{alias}__value": vals,
                    f"{alias}__lang": pc.if_else(
                        valid,
                        pa.scalar("", pa.large_string()),
                        pa.scalar(None, pa.large_string()),
                    ),
                    f"{alias}__datatype": pc.if_else(
                        valid,
                        pa.scalar(dt, pa.large_string()),
                        pa.scalar(None, pa.large_string()),
                    ),
                }
            out = batch
            for cname, col in cols.items():
                out = out.append_column(cname, col)
            return out

        ds = ds.map_batches(fn, batch_format="pyarrow")
        bound = bound | {b.alias}
    return ds, bound


def _finish_group(ds, bindings, bound: set, leftover, optionals, binds):
    """Shared tail of every query form: apply the leftover filters that
    only need required variables, left-join OPTIONALs, evaluate BINDs,
    then the remaining filters (which may reference optional variables
    — BOUND/!BOUND — or BIND aliases)."""
    pre, post = [], []
    for f in leftover:
        (pre if _filter_vars(f) <= bound else post).append(f)
    bindings = _apply_filters(bindings, pre)
    bindings, bound = _attach_optionals(bindings, bound, ds, optionals)
    bindings, bound = _apply_binds(bindings, binds, bound)
    _check_filter_vars(post, bound)
    bindings = _apply_filters(bindings, post)
    return bindings, bound


def _operand(batch: pa.Table, x):
    """FILTER operand → (value column/scalar, is-numeric-literal hint)."""
    if isinstance(x, Var):
        return pc.cast(batch[f"{x.name}__value"], pa.large_string()), None
    numeric = x.kind == KIND_LITERAL and x.datatype in _NUMERIC_DTS
    return pa.scalar(x.value, pa.large_string()), numeric


def _to_float_coerce(col_or_scalar):
    """Lexical form → float64 with SPARQL type-error semantics: an
    unparseable value becomes NaN (the comparison then yields false and
    the row drops) instead of crashing the whole query on one stray
    literal."""
    if isinstance(col_or_scalar, pa.Scalar):
        return pa.scalar(float(col_or_scalar.as_py()), pa.float64())
    coerced = pd.to_numeric(
        pd.Series(col_or_scalar.to_pylist(), dtype="object"), errors="coerce"
    )
    return pa.array(coerced.astype("float64"), pa.float64())


def _term_identity_mask(batch: pa.Table, flt):
    """kind/lang/datatype agreement mask for =/!= (value handled by the
    caller).  Covers var-vs-var AND var-vs-constant — comparing only the
    value string would equate a literal spelling an IRI with the IRI."""
    pieces = []
    for f in ("kind", "lang", "datatype"):
        sides = []
        for x in (flt.left, flt.right):
            if isinstance(x, Var):
                sides.append(batch[f"{x.name}__{f}"])
            else:
                val = getattr(x, f) if f != "kind" else x.kind
                sides.append(
                    pa.scalar(val, pa.int64() if f == "kind" else pa.large_string())
                )
        a, b = sides
        if f != "kind":
            a = a if isinstance(a, pa.Scalar) else pc.cast(a, pa.large_string())
            b = b if isinstance(b, pa.Scalar) else pc.cast(b, pa.large_string())
        else:
            a = a if isinstance(a, pa.Scalar) else pc.cast(a, pa.int64())
            b = b if isinstance(b, pa.Scalar) else pc.cast(b, pa.int64())
        pieces.append(pc.equal(a, b))
    out = pieces[0]
    for p in pieces[1:]:
        out = pc.and_(out, p)
    return out


_FCMP = _CMP_KERNELS  # one comparison-kernel table for the whole module
_FKINDS = {"isiri": KIND_IRI, "isblank": KIND_BLANK, "isliteral": KIND_LITERAL}
_FSTRFN = {
    "contains": pc.match_substring,
    "strstarts": pc.starts_with,
    "strends": pc.ends_with,
}
_F_XSD_STRING = "http://www.w3.org/2001/XMLSchema#string"
_F_RDF_LANGSTRING = "http://www.w3.org/1999/02/22-rdf-syntax-ns#langString"


def _filter_mask(batch: pa.Table, flt):
    """One filter conjunct -> boolean mask.  ``OrFilter`` recurses and
    ORs its parts' masks (SPARQL ``||``), so every filter type composes
    under disjunction for free."""
    if isinstance(flt, OrFilter):
        m = None
        for group in flt.parts:  # each part is one AND-group
            gm = None
            for part in group:
                pm = _filter_mask(batch, part)
                # Kleene: error && false = false, so a null mask from an
                # unbound OPTIONAL var can't poison a decided conjunct.
                gm = pm if gm is None else pc.and_kleene(gm, pm)
            # Kleene: error || true = true (SPARQL 17.2 filter evaluation).
            m = gm if m is None else pc.or_kleene(m, gm)
        return m
    if isinstance(flt, ExprComparison):
        # general expression comparison — reuses the IF() condition
        # machinery (numeric where possible, string fallback row-wise);
        # null mask = expression error → row excluded by the filter
        return _eval_cond(
            batch, EIf(flt.op, flt.left, flt.right, None, None)
        )
    if isinstance(flt, Regex):
        m = pc.match_substring_regex(
            pc.cast(batch[f"{flt.var.name}__value"], pa.large_string()),
            flt.pattern,
        )
        if flt.negated:
            m = pc.invert(m)
    elif isinstance(flt, StrFunc):
        m = _FSTRFN[flt.func](
            pc.cast(batch[f"{flt.var.name}__value"], pa.large_string()),
            flt.arg,
        )
        if flt.negated:
            m = pc.invert(m)
    elif isinstance(flt, TypeCheck):
        m = pc.equal(batch[f"{flt.var.name}__kind"], _FKINDS[flt.func])
        if flt.negated:
            m = pc.invert(m)
    elif isinstance(flt, Bound):
        m = pc.is_valid(batch[f"{flt.var.name}__kind"])
        if flt.negated:
            m = pc.invert(m)
    elif isinstance(flt, LangMatches):
        tag = pc.utf8_lower(
            pc.fill_null(
                pc.cast(batch[f"{flt.var.name}__lang"], pa.large_string()),
                "",
            )
        )
        if flt.range == "*":
            m = pc.not_equal(tag, "")
        else:
            rng = flt.range.lower()
            m = pc.or_(
                pc.equal(tag, rng),
                pc.starts_with(tag, rng + "-"),
            )
        if flt.negated:
            m = pc.invert(m)
    elif isinstance(flt, SameTerm):
        m = None
        for f in _FIELDS:
            a = batch[f"{flt.left.name}__{f}"]
            b = batch[f"{flt.right.name}__{f}"]
            if f != "kind":
                a = pc.fill_null(pc.cast(a, pa.large_string()), "")
                b = pc.fill_null(pc.cast(b, pa.large_string()), "")
            eq = pc.equal(a, b)
            m = eq if m is None else pc.and_(m, eq)
        if flt.negated:
            m = pc.invert(m)
    elif isinstance(flt, FuncComparison):
        v = flt.var.name
        if flt.func == "strlen":
            m = _FCMP[flt.op](
                pc.cast(
                    pc.utf8_length(
                        pc.cast(batch[f"{v}__value"], pa.large_string())
                    ),
                    pa.float64(),
                ),
                flt.value,
            )
        elif flt.func == "str":
            # STR(term) = its lexical form / IRI string
            m = _FCMP[flt.op](
                pc.cast(batch[f"{v}__value"], pa.large_string()), flt.value
            )
        elif flt.func == "lang":
            # language tags compare case-insensitively (RFC 4647)
            m = _FCMP[flt.op](
                pc.utf8_lower(
                    pc.cast(batch[f"{v}__lang"], pa.large_string())
                ),
                flt.value.lower(),
            )
        else:  # datatype: '' column means xsd:string (plain) or
            # rdf:langString (lang-tagged); non-literals are a
            # SPARQL type error → row drops under = and !=
            dt = pc.cast(batch[f"{v}__datatype"], pa.large_string())
            lang = pc.cast(batch[f"{v}__lang"], pa.large_string())
            eff = pc.if_else(
                pc.not_equal(dt, ""),
                dt,
                pc.if_else(
                    pc.not_equal(lang, ""),
                    pa.scalar(_F_RDF_LANGSTRING, pa.large_string()),
                    pa.scalar(_F_XSD_STRING, pa.large_string()),
                ),
            )
            m = pc.and_(
                _FCMP[flt.op](eff, flt.value),
                pc.equal(batch[f"{v}__kind"], KIND_LITERAL),
            )
    elif isinstance(flt, InFilter):
        v = flt.var.name
        m = None
        for t in flt.terms:
            one = pc.and_(
                pc.and_(
                    pc.equal(batch[f"{v}__kind"], t.kind),
                    pc.equal(
                        pc.cast(batch[f"{v}__value"], pa.large_string()),
                        t.value,
                    ),
                ),
                pc.and_(
                    pc.equal(
                        pc.cast(batch[f"{v}__lang"], pa.large_string()),
                        t.lang,
                    ),
                    pc.equal(
                        pc.cast(batch[f"{v}__datatype"], pa.large_string()),
                        t.datatype,
                    ),
                ),
            )
            m = one if m is None else pc.or_(m, one)
        if flt.negated:
            m = pc.invert(m)
    else:
        left, lnum = _operand(batch, flt.left)
        right, rnum = _operand(batch, flt.right)
        if lnum or rnum:  # numeric comparison when a numeric literal is involved
            left = _to_float_coerce(left)
            right = _to_float_coerce(right)
            m = _FCMP[flt.op](left, right)
            # SPARQL type error (NaN here) → condition is false,
            # even for != (IEEE would say true)
            for side in (left, right):
                if not isinstance(side, pa.Scalar):
                    m = pc.and_(m, pc.invert(pc.is_nan(side)))
        else:
            m = _FCMP[flt.op](left, right)
            if flt.op in ("=", "!="):
                # full term identity, var-var and var-constant alike
                ident = _term_identity_mask(batch, flt)
                m = (
                    pc.and_(m, ident)
                    if flt.op == "="
                    else pc.or_(m, pc.invert(ident))
                )
    return m


def _apply_filters(ds, filters):
    if not filters:
        return ds

    def fapply(batch: pa.Table) -> pa.Table:
        mask = None
        for flt in filters:
            m = _filter_mask(batch, flt)
            mask = m if mask is None else pc.and_(mask, m)
        return batch.filter(mask) if mask is not None else batch

    return ds.map_batches(fapply, batch_format="pyarrow")


def _render_vars(ds, variables):
    def render(batch: pa.Table) -> pa.Table:
        cols = {}
        for v in variables:
            rendered = nt_render_term_arrays(
                batch[f"{v}__kind"],
                batch[f"{v}__value"],
                batch[f"{v}__lang"],
                batch[f"{v}__datatype"],
            )
            # unbound (OPTIONAL-missed) bindings render as ""
            cols[v] = pc.fill_null(rendered, "")
        return pa.table(cols)

    return ds.map_batches(render, batch_format="pyarrow")


def _negset_bindings(ds, pattern, witness, graph_var=None):
    """NegatedPropertySet with reverse members (SPARQL 1.1 §18.4):
    the forward component (edges with pred ∉ preds, present iff
    ``preds`` nonempty) unions with the REVERSED component (inverted
    edges with pred ∉ rev_preds) — one scan each, schemas normalized
    to sorted column order for the union."""
    s, np_, o = pattern
    pieces = []
    if np_.preds:
        pieces.append(
            _pattern_bindings(
                ds, (s, NegPath(list(np_.preds), []), o),
                witness=witness, graph_var=graph_var,
            )
        )
    pieces.append(
        _pattern_bindings(
            ds, (o, NegPath(list(np_.rev_preds), []), s),
            witness=witness, graph_var=graph_var,
        )
    )
    b, vs = pieces[0]
    if len(pieces) == 1:
        return b, vs

    def norm(t: pa.Table) -> pa.Table:
        return t.select(sorted(t.column_names))

    out = b.map_batches(norm, batch_format="pyarrow")
    for b2, v2 in pieces[1:]:
        if v2 != vs:
            raise SparqlSyntaxError(
                "negated-set components bind different variables"
            )
        out = out.union(b2.map_batches(norm, batch_format="pyarrow"))
    return out, vs


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


# rendered numeric literal: "lexical"^^<xsd numeric type> — the forms
# ORDER BY must compare by VALUE, not lexically (SPARQL 1.1 §15.1);
# the alternation covers every XSD numeric type (incl. the negative /
# non-positive / unsigned-small variants)
_NUMERIC_LITERAL_RE = (
    r'^"(?P<num>[+-]?(?:[0-9]+\.?[0-9]*|\.[0-9]+)(?:[eE][+-]?[0-9]+)?)"'
    r"\^\^<http://www\.w3\.org/2001/XMLSchema#"
    r"(?:integer|decimal|double|float|int|long|short|byte|"
    r"nonNegativeInteger|nonPositiveInteger|negativeInteger|"
    r"positiveInteger|unsignedInt|unsignedLong|unsignedShort|"
    r"unsignedByte)>$"
)


def _append_order_keys(batch: pa.Table, order_by) -> pa.Table:
    """Per order-var derived sort keys implementing the §15.1 order:
    ``_ordrank{i}`` encodes the type tier — unbound(-1) < blank
    node(0) < IRI(1) < numeric literal(2) < other literal(3), numerics
    value-ordered within their tier via ``_ordnum{i}`` (the parsed
    value, 0.0 elsewhere).  Sorting ``[rank, num, rendered]`` with one
    shared descending flag yields the spec's ascending order and its
    exact reverse for DESC."""
    for i, (v, _) in enumerate(order_by):
        s = pc.cast(batch[v], pa.large_string())
        ex = pc.extract_regex(s, _NUMERIC_LITERAL_RE)
        num = pc.cast(pc.struct_field(ex, "num"), pa.float64())
        tier = pc.if_else(
            pc.starts_with(s, "_:"),
            pa.scalar(0, pa.int8()),
            pc.if_else(
                pc.starts_with(s, "<"),
                pa.scalar(1, pa.int8()),
                pc.if_else(
                    pc.is_valid(num),
                    pa.scalar(2, pa.int8()),
                    pa.scalar(3, pa.int8()),
                ),
            ),
        )
        batch = batch.append_column(
            f"_ordrank{i}", pc.fill_null(tier, pa.scalar(-1, pa.int8()))
        )
        batch = batch.append_column(f"_ordnum{i}", pc.fill_null(num, 0.0))
    return batch


def _order_sort_spec(order_by, tail_cols=()):
    """(keys, descending) for a Dataset.sort over `_append_order_keys`
    output: three keys per order var, then any tie-break tail."""
    keys: list[str] = []
    desc: list[bool] = []
    for i, (v, d) in enumerate(order_by):
        keys += [f"_ordrank{i}", f"_ordnum{i}", v]
        desc += [d, d, d]
    for c in tail_cols:
        if c not in keys:
            keys.append(c)
            desc.append(False)
    return keys, desc


def _drop_order_keys(batch: pa.Table) -> pa.Table:
    drop = [c for c in batch.column_names if c.startswith(("_ordrank", "_ordnum"))]
    return batch.drop_columns(drop) if drop else batch


def _adjacent_dedup(batch: pa.Table) -> pa.Table:
    """Drop rows equal to their predecessor across ALL columns (valid
    only on blocks of a Dataset sorted by all columns)."""
    n = batch.num_rows
    if n <= 1:
        return batch
    batch = batch.combine_chunks()
    same = None
    for c in batch.column_names:
        col = batch.column(c)
        col = col.chunk(0) if isinstance(col, pa.ChunkedArray) else col
        eq = pc.equal(col.slice(1), col.slice(0, n - 1))
        same = eq if same is None else pc.and_(same, eq)
    mask = pa.concat_arrays(
        [pa.array([True]), pc.invert(same)]
    )
    return batch.filter(mask)


def _apply_slice(out, limit: int | None, offset: int):
    """OFFSET/LIMIT over a (sorted) Dataset: ``rows[offset:offset+limit]``.
    With a LIMIT the upstream is bounded first (streaming early-stop);
    the split itself executes the bounded prefix only.  OFFSET without
    LIMIT executes the full solution sequence (inherent to the ask)."""
    if offset:
        if limit is not None:
            out = out.limit(offset + limit)
        out = out.split_at_indices([offset])[1]
    elif limit is not None:
        out = out.limit(limit)
    return out


def _aggregate_bindings(bindings, group_vars: list[str], aggs, project=None):
    """GROUP BY + aggregates over a bindings Dataset, the partial-
    aggregation shape every other wide aggregate in this engine uses:
    per-batch pandas partials → one small ``groupby().aggregate()``
    shuffle whose volume is distinct groups, not rows.

    Group keys are the variables' canonical N-Triples renderings (the
    same string columns SELECT outputs); COUNT counts bound values
    (COUNT(*) counts rows), SUM/MIN/MAX/AVG coerce the lexical form to
    float64 with non-numeric values becoming NaN and EXCLUDED from the
    aggregate (pandas skipna — the SPARQL error-ignoring behaviour most
    endpoints exhibit; COUNT still counts such rows).  ``project``
    limits the output columns to the SELECT clause (group keys not
    projected are used for grouping, then dropped).  Output: one float64
    column per aggregate (COUNT: int64), named by its alias."""
    from ray.data.aggregate import Max, Min, Sum

    def prep(batch: pa.Table) -> pa.Table:
        cols = {}
        for gv in group_vars:
            cols[gv] = pc.fill_null(
                nt_render_term_arrays(
                    batch[f"{gv}__kind"], batch[f"{gv}__value"],
                    batch[f"{gv}__lang"], batch[f"{gv}__datatype"],
                ),
                "",
            )
        for i, a in enumerate(aggs):
            if a.func == "count":
                if a.var is None:
                    cols[f"_a{i}"] = pa.array([1] * batch.num_rows, pa.int64())
                else:
                    cols[f"_a{i}"] = pc.cast(
                        pc.is_valid(batch[f"{a.var}__kind"]), pa.int64()
                    )
            elif a.func == "sample":
                # deterministic SAMPLE: the minimum rendered term (the
                # spec allows any value; min makes the oracle exact)
                cols[f"_a{i}"] = nt_render_term_arrays(
                    batch[f"{a.var}__kind"], batch[f"{a.var}__value"],
                    batch[f"{a.var}__lang"], batch[f"{a.var}__datatype"],
                )
            else:
                cols[f"_a{i}"] = _to_float_coerce(
                    pc.cast(batch[f"{a.var}__value"], pa.large_string())
                )
        return pa.table(cols)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        spec = {}
        for i, a in enumerate(aggs):
            if a.func in ("count", "sum"):
                spec[f"_p{i}"] = (f"_a{i}", "sum")
            elif a.func == "avg":
                spec[f"_p{i}"] = (f"_a{i}", "sum")
                spec[f"_n{i}"] = (f"_a{i}", "count")
            else:  # min / max / sample (sample = min of rendered term)
                spec[f"_p{i}"] = (f"_a{i}", "min" if a.func == "sample" else a.func)
        if not group_vars:
            _PD_FUNC = {"count": "sum", "sum": "sum", "avg": "sum", "sample": "min"}
            out = df.agg(
                {f"_a{i}": _PD_FUNC.get(aggs[i].func, aggs[i].func)
                 for i in range(len(aggs))}
            )
            row = {f"_p{i}": [out[f"_a{i}"]] for i in range(len(aggs))}
            for i, a in enumerate(aggs):
                if a.func == "avg":
                    row[f"_n{i}"] = [df[f"_a{i}"].count()]
            return pd.DataFrame(row)
        return df.groupby(group_vars, sort=False).agg(**spec).reset_index()

    ds2 = bindings.map_batches(prep, batch_format="pyarrow")
    ds2 = ds2.map_batches(partial, batch_format="pandas")
    combiners = []
    for i, a in enumerate(aggs):
        if a.func in ("count", "sum", "avg"):
            combiners.append(Sum(f"_p{i}", alias_name=f"_g{i}"))
            if a.func == "avg":
                combiners.append(Sum(f"_n{i}", alias_name=f"_gn{i}"))
        elif a.func in ("min", "sample"):
            combiners.append(Min(f"_p{i}", alias_name=f"_g{i}"))
        else:
            combiners.append(Max(f"_p{i}", alias_name=f"_g{i}"))
    if group_vars:
        out = ds2.groupby(group_vars if len(group_vars) > 1 else group_vars[0]).aggregate(
            *combiners
        )
    else:
        import ray.data

        res = ds2.aggregate(*combiners)
        out = ray.data.from_arrow(
            pa.table({k: [v] for k, v in res.items()})
        )

    keep = project if project is not None else (
        list(group_vars) + [a.alias for a in aggs]
    )

    def finalize(batch: pa.Table) -> pa.Table:
        cols = {gv: batch[gv] for gv in group_vars}
        for i, a in enumerate(aggs):
            col = batch[f"_g{i}"]
            if a.func == "count":
                col = pc.cast(col, pa.int64())
            elif a.func == "avg":
                col = pc.divide(
                    pc.cast(col, pa.float64()),
                    pc.cast(batch[f"_gn{i}"], pa.float64()),
                )
            elif a.func == "sample":
                col = pc.cast(col, pa.large_string())
            else:
                col = pc.cast(col, pa.float64())
            cols[a.alias] = col
        # only the SELECT clause's columns leave (group keys used for
        # grouping but not projected are dropped here)
        return pa.table({c: cols[c] for c in keep})

    return out.map_batches(finalize, batch_format="pyarrow")


def _distinct_count_agg(bindings, group_vars: list[str], agg):
    """``COUNT/SUM/AVG(DISTINCT ?v)`` per group, fully distributed:
    render the group keys + the variable's full term, drop unbound
    values, global distinct (the same hash-keyed sort dedup as SELECT
    DISTINCT — distinctness is over RDF terms), then a per-group count
    / float sum / mean — shuffle volume = distinct (group, term)
    pairs, never raw rows.  SUM/AVG additionally drop non-numeric
    terms (the same error-ignoring rule as the plain aggregate path)."""
    from ray.data.aggregate import Sum

    var = agg.var
    numeric = agg.func in ("sum", "avg")

    def prep(batch: pa.Table) -> pa.Table:
        cols = {}
        for gv in group_vars:
            cols[gv] = pc.fill_null(
                nt_render_term_arrays(
                    batch[f"{gv}__kind"], batch[f"{gv}__value"],
                    batch[f"{gv}__lang"], batch[f"{gv}__datatype"],
                ),
                "",
            )
        rendered = nt_render_term_arrays(
            batch[f"{var}__kind"], batch[f"{var}__value"],
            batch[f"{var}__lang"], batch[f"{var}__datatype"],
        )
        cols["_v"] = rendered
        if numeric:
            cols["_num"] = _to_float_coerce(
                pc.cast(batch[f"{var}__value"], pa.large_string())
            )
        out = pa.table(cols).filter(pc.is_valid(rendered))
        if numeric:  # non-numeric distinct terms don't contribute
            out = out.filter(pc.invert(pc.is_nan(out["_num"])))
        return out

    ds2 = bindings.map_batches(prep, batch_format="pyarrow")
    ds2 = _distinct(ds2, list(group_vars) + ["_v"])

    def ones(batch: pa.Table) -> pa.Table:
        cols = {gv: batch[gv] for gv in group_vars}
        cols["_one"] = pa.array([1] * batch.num_rows, pa.int64())
        if numeric:
            cols["_num"] = batch["_num"]
        return pa.table(cols)

    ds2 = ds2.map_batches(ones, batch_format="pyarrow")
    combiners = [Sum("_one", alias_name="_n")]
    if numeric:
        combiners.append(Sum("_num", alias_name="_s"))

    if not group_vars:
        import ray.data

        res = ds2.aggregate(*combiners)
        n = int(res.get("_n") or 0)
        if agg.func == "count":
            val = pa.array([n], pa.int64())
        elif agg.func == "sum":
            val = pa.array([float(res.get("_s") or 0.0)], pa.float64())
        else:  # avg of zero values is a SPARQL error → render null
            val = pa.array(
                [float(res["_s"]) / n if n else None], pa.float64()
            )
        return ray.data.from_arrow(pa.table({agg.alias: val}))

    out = ds2.groupby(
        group_vars if len(group_vars) > 1 else group_vars[0]
    ).aggregate(*combiners)

    def finalize(batch: pa.Table) -> pa.Table:
        cols = {gv: batch[gv] for gv in group_vars}
        if agg.func == "count":
            cols[agg.alias] = pc.cast(batch["_n"], pa.int64())
        elif agg.func == "sum":
            cols[agg.alias] = pc.cast(batch["_s"], pa.float64())
        else:
            cols[agg.alias] = pc.divide(
                pc.cast(batch["_s"], pa.float64()),
                pc.cast(batch["_n"], pa.float64()),
            )
        return pa.table(cols)

    return out.map_batches(finalize, batch_format="pyarrow")


def _group_concat_agg(bindings, group_vars: list[str], agg):
    """``GROUP_CONCAT([DISTINCT] ?v; SEPARATOR=s)`` per group.  SPARQL
    leaves concatenation order unspecified; this engine defines it as
    ascending lexical-form order (deterministic, and exactly DuckDB's
    ``string_agg(v, s ORDER BY v)``), concatenating the lexical form
    (``value`` column — STR semantics) of bound values.

    Scale shape: render keys + lexical, optional distinct shuffle, then
    ONE sort by the group keys (the sorted-colocation contract,
    grouping.py, puts every group wholly in one block — sorting by
    (group, value) instead could split a group at a block boundary)
    and a per-block pandas groupby whose agg sorts-then-joins each
    group's values.  Groups whose values are all unbound concatenate
    to ``""``.  With no GROUP BY the output is a single row whose
    length is the whole column — inherently driver-sized; the
    per-group form is the scale path."""
    import ray.data

    var = agg.var
    sep = agg.separator

    def prep(batch: pa.Table) -> pa.Table:
        cols = {}
        for gv in group_vars:
            cols[gv] = pc.fill_null(
                nt_render_term_arrays(
                    batch[f"{gv}__kind"], batch[f"{gv}__value"],
                    batch[f"{gv}__lang"], batch[f"{gv}__datatype"],
                ),
                "",
            )
        cols["_v"] = pc.cast(batch[f"{var}__value"], pa.large_string())
        return pa.table(cols)

    ds2 = bindings.map_batches(prep, batch_format="pyarrow")
    if agg.distinct:
        ds2 = _distinct(ds2, list(group_vars) + ["_v"])
    if not group_vars:
        vals = ds2.sort("_v").to_pandas()["_v"].dropna()
        return ray.data.from_arrow(
            pa.table({agg.alias: pa.array([sep.join(vals)], pa.large_string())})
        )

    def concat_block(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({gv: [] for gv in group_vars} | {agg.alias: []})
        out = (
            df.groupby(group_vars, sort=False, dropna=False, observed=True)["_v"]
            .agg(lambda s: sep.join(s.dropna().sort_values()))
            .reset_index()
            .rename(columns={"_v": agg.alias})
        )
        return out

    return ds2.sort(group_vars if len(group_vars) > 1 else group_vars[0]).map_batches(
        concat_block, batch_format="pandas", batch_size=None
    )


def _resolve_order(order_by, aggregates, cols):
    """ORDER BY keys over an aggregate output: a projected column name
    passes through; ``func(var)`` / ``func(*)`` (from ORDER BY
    DESC(COUNT(?v)) …) resolves to the matching SELECT aggregate's
    alias."""
    resolved = []
    for v, d in order_by:
        if v in cols:
            resolved.append((v, d))
            continue
        if "(" in v:
            func, _, inner = v.partition("(")
            inner = inner.rstrip(")")
            var = None if inner == "*" else inner
            match = [a for a in aggregates if a.func == func and a.var == var]
            if match:
                resolved.append((match[0].alias, d))
                continue
            raise SparqlSyntaxError(
                f"ORDER BY {func.upper()}({inner}) has no matching SELECT aggregate"
            )
        raise SparqlSyntaxError(f"ORDER BY {v!r} not in projection")
    return resolved


def _apply_having(out, q: SelectQuery):
    """HAVING conjuncts over an aggregate output Dataset (columns =
    group keys + aliases).  Each conjunct resolves to a SELECT
    aggregate's alias, then filters vectorized per batch."""
    if not q.having:
        return out
    concat_aliases = {
        a.alias for a in q.aggregates if a.func == "group_concat"
    }
    resolved = []
    for h in q.having:
        if h.alias is not None:
            if h.alias not in [a.alias for a in q.aggregates]:
                raise SparqlSyntaxError(
                    f"HAVING alias ?{h.alias} is not a SELECT aggregate"
                )
            if h.alias in concat_aliases:
                raise SparqlSyntaxError(
                    "HAVING cannot compare a GROUP_CONCAT numerically"
                )
            resolved.append((h.alias, h.op, h.value))
        else:
            match = [a for a in q.aggregates if a.func == h.func and a.var == h.var]
            if not match:
                raise SparqlSyntaxError(
                    f"HAVING {h.func.upper()}(?{h.var}) has no matching SELECT aggregate"
                )
            resolved.append((match[0].alias, h.op, h.value))

    def having_filter(batch: pa.Table) -> pa.Table:
        mask = None
        for col, op, value in resolved:
            m = _CMP_KERNELS[op](pc.cast(batch[col], pa.float64()), value)
            mask = m if mask is None else pc.and_(mask, m)
        return batch.filter(mask)

    return out.map_batches(having_filter, batch_format="pyarrow")


def _count_distinct_star(bindings, group_vars: list[str], agg, cols):
    """``COUNT(DISTINCT *)``: distinct complete solutions per group.
    Renders every variable into its canonical N-Triples string, runs
    the hash-keyed sort distinct (the SELECT DISTINCT plan), then ONE
    partial-count groupby — fully distributed, group-bounded output."""
    import ray.data

    from ray.data.aggregate import Sum

    names = sorted(
        c[: -len("__kind")]
        for c in (bindings.columns() or [])
        if c.endswith("__kind")
        and "$" not in c
        and not c.startswith("_match")
    )
    if not names:
        raise SparqlSyntaxError("COUNT(DISTINCT *) over no variables")

    def render_all(batch: pa.Table) -> pa.Table:
        out = {}
        for v in names:
            out[v] = pc.fill_null(
                nt_render_term_arrays(
                    batch[f"{v}__kind"], batch[f"{v}__value"],
                    batch[f"{v}__lang"], batch[f"{v}__datatype"],
                ),
                "",
            )
        return pa.table(out)

    deduped = _distinct(
        bindings.map_batches(render_all, batch_format="pyarrow"), names
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if group_vars:
            return (
                df.groupby(group_vars, sort=False)
                .size()
                .rename("_p")
                .reset_index()
            )
        return pd.DataFrame({"_p": [len(df)]})

    parts = deduped.map_batches(partial, batch_format="pandas")
    if group_vars:
        out = parts.groupby(
            group_vars if len(group_vars) > 1 else group_vars[0]
        ).aggregate(Sum("_p", alias_name=agg.alias))
    else:
        res = parts.aggregate(Sum("_p", alias_name=agg.alias))
        out = ray.data.from_arrow(
            pa.table({agg.alias: [int(res[agg.alias] or 0)]})
        )
    return out.map_batches(
        lambda b: pa.table(
            {
                c: pc.cast(b[c], pa.int64()) if c == agg.alias else b[c]
                for c in cols
            }
        ),
        batch_format="pyarrow",
    )


def _aggregate_query(bindings, q: SelectQuery, cols: list[str]):
    """Dispatch the aggregate clause: the plain partial-agg path, the
    distributed COUNT(DISTINCT) path, or (for a mix) both — merged on
    the group keys driver-side, which is safe because aggregate OUTPUT
    is one row per group (the small end of the pipeline by design)."""
    group_vars = list(q.group_by)
    star_distinct = [
        a for a in q.aggregates if a.distinct and a.var is None
    ]
    if star_distinct:
        # COUNT(DISTINCT *): count distinct complete solutions per
        # group — render every variable column, global distinct (the
        # SELECT DISTINCT machinery), then a per-group row count.
        # Mixing with other aggregates would need a second pass over
        # the pre-dedup bindings; rejected explicitly.
        if len(q.aggregates) != 1:
            raise SparqlSyntaxError(
                "COUNT(DISTINCT *) cannot combine with other aggregates"
            )
        return _count_distinct_star(
            bindings, group_vars, star_distinct[0], cols
        )
    concat = [a for a in q.aggregates if a.func == "group_concat"]
    plain = [
        a for a in q.aggregates
        if not a.distinct and a.func != "group_concat"
    ]
    distinct_aggs = [
        a for a in q.aggregates if a.distinct and a.func != "group_concat"
    ]
    if not distinct_aggs and not concat:
        return _aggregate_bindings(bindings, group_vars, plain, project=cols)
    if not plain and not concat and len(distinct_aggs) == 1:
        out = _distinct_count_agg(bindings, group_vars, distinct_aggs[0])
        return out.map_batches(
            lambda b: b.select(cols), batch_format="pyarrow"
        )
    if not plain and not distinct_aggs and len(concat) == 1:
        out = _group_concat_agg(bindings, group_vars, concat[0])
        return out.map_batches(
            lambda b: b.select(cols), batch_format="pyarrow"
        )
    # mixed aggregate classes: merge the (small) per-group outputs
    # driver-side
    import ray.data

    # each piece below consumes `bindings`; without this, every piece
    # re-executes the whole lazy BGP join pipeline from the scan
    bindings = bindings.materialize()
    pieces = []
    if plain:
        pieces.append(
            _aggregate_bindings(
                bindings, group_vars, plain,
                project=group_vars + [a.alias for a in plain],
            ).to_pandas()
        )
    for a in distinct_aggs:
        pieces.append(_distinct_count_agg(bindings, group_vars, a).to_pandas())
    for a in concat:
        pieces.append(_group_concat_agg(bindings, group_vars, a).to_pandas())
    merged = pieces[0]
    for piece in pieces[1:]:
        if group_vars:
            merged = merged.merge(piece, on=group_vars, how="outer")
        else:
            merged = pd.concat([merged, piece], axis=1)
    for a in distinct_aggs:  # groups whose values were all unbound
        if a.func == "count":
            merged[a.alias] = merged[a.alias].fillna(0).astype("int64")
    for a in concat:
        merged[a.alias] = merged[a.alias].fillna("")
    return ray.data.from_pandas(merged[cols])


def _apply_dataset_clause(ds, q):
    """``FROM`` / ``FROM NAMED`` over a quads dataset (``url`` graph
    column, the ``read_graphstore`` layout).

    - ``FROM <g>…``: the default graph is the merge of the listed
      graphs — ONE vectorized url-mask scan; the ``url`` column is
      dropped so a stray GRAPH clause errors loudly instead of seeing
      graphs the dataset clause excluded.
    - ``FROM NAMED <g>…`` (alone): quads scoped to the listed graphs;
      GRAPH clauses see exactly those.  Divergence from the spec's
      empty-default-graph rule: non-GRAPH patterns also match inside
      the named graphs (documented; all-GRAPH queries — the common
      shape — behave per spec).
    - Combining both is rejected rather than silently wrong: it would
      need two differently-scoped scans threaded through every join
      path."""
    if not (q.from_graphs or q.from_named):
        return ds
    if q.from_graphs and q.from_named:
        raise SparqlSyntaxError(
            "combining FROM and FROM NAMED is not supported"
        )
    cols = ds.columns()
    if cols is not None and "url" not in cols:
        raise SparqlSyntaxError(
            "FROM / FROM NAMED need a quads dataset (url graph column)"
        )
    allowed = list(q.from_graphs or q.from_named)
    drop_url = bool(q.from_graphs)

    def scope(batch: pa.Table) -> pa.Table:
        m = pc.is_in(
            pc.cast(batch["url"], pa.large_string()),
            value_set=pa.array(allowed, pa.large_string()),
        )
        batch = batch.filter(m)
        return batch.drop_columns(["url"]) if drop_url else batch

    return ds.map_batches(scope, batch_format="pyarrow")


def evaluate_select(ds, query: str | SelectQuery):
    """SELECT over a triples Dataset → Dataset with one canonical
    N-Triples-rendered string column per selected variable (the same
    term rendering the result parser S6 round-trips)."""
    q = parse_query(query) if isinstance(query, str) else query
    if not isinstance(q, SelectQuery):
        raise SparqlSyntaxError("not a SELECT query")
    ds = _apply_dataset_clause(ds, q)
    bindings, bound, leftover = _bgp(ds, q.patterns, q.filters)
    bindings, bound = _finish_group(
        ds, bindings, bound, leftover, q.optionals, q.binds
    )
    if q.aggregates:
        for v in list(q.group_by) + [a.var for a in q.aggregates if a.var]:
            if v not in bound:
                raise SparqlSyntaxError(f"unbound variable ?{v} in aggregate query")
        cols = list(q.variables) + [a.alias for a in q.aggregates]
        out = _aggregate_query(bindings, q, cols)
        out = _apply_having(out, q)
        if q.order_by:
            order = _resolve_order(q.order_by, q.aggregates, cols)
            out = out.sort(
                [v for v, _ in order], descending=[d for _, d in order]
            )
        return _apply_slice(out, q.limit, q.offset)
    # SELECT *: path-internal ($-gensym) variables stay invisible
    variables = q.variables or sorted(v for v in bound if "$" not in v)
    missing = [v for v in variables if v not in bound]
    if missing:
        raise SparqlSyntaxError(f"unbound SELECT variables: {missing}")
    out = _render_vars(bindings, variables)
    for v, _ in q.order_by:
        if v not in variables:
            raise SparqlSyntaxError(f"ORDER BY {v!r} not in SELECT")
    if q.distinct and q.order_by:
        # fused: ONE sort keyed order-vars-first over all columns, then
        # vectorized adjacent-row dedup per block (equal rows share every
        # sort key — the derived numeric keys are functions of the
        # rendered columns — so they co-locate, grouping.py contract);
        # ties beyond ORDER BY are broken by the remaining columns,
        # which SPARQL leaves unspecified
        out = out.map_batches(
            lambda b: _append_order_keys(b, q.order_by),
            batch_format="pyarrow",
        )
        keys, desc = _order_sort_spec(q.order_by, tail_cols=variables)
        out = out.sort(keys, descending=desc).map_batches(
            _adjacent_dedup, batch_format="pyarrow", batch_size=None
        )
        out = _apply_slice(out, q.limit, q.offset)
        return out.map_batches(
            lambda b: _drop_order_keys(b).select(variables),
            batch_format="pyarrow",
        )
    elif q.distinct:
        out = _distinct(out, variables)
    elif q.order_by:
        out = out.map_batches(
            lambda b: _append_order_keys(b, q.order_by),
            batch_format="pyarrow",
        )
        keys, desc = _order_sort_spec(q.order_by)
        out = out.sort(keys, descending=desc)
        out = _apply_slice(out, q.limit, q.offset)
        return out.map_batches(
            lambda b: _drop_order_keys(b).select(variables),
            batch_format="pyarrow",
        )
    return _apply_slice(out, q.limit, q.offset)


def evaluate_ask(ds, query: str | AskQuery) -> bool:
    """ASK → bool (SparqlService.Ask semantics, sparqlservice.go:55-68)."""
    q = parse_query(query) if isinstance(query, str) else query
    if not isinstance(q, AskQuery):
        raise SparqlSyntaxError("not an ASK query")
    ds = _apply_dataset_clause(ds, q)
    bindings, bound, leftover = _bgp(ds, q.patterns, q.filters)
    bindings, _ = _finish_group(
        ds, bindings, bound, leftover, q.optionals, q.binds
    )
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
    ds = _apply_dataset_clause(ds, q)
    bindings, bound, leftover = _bgp(ds, q.patterns, q.filters)
    bindings, bound = _finish_group(
        ds, bindings, bound, leftover, q.optionals, q.binds
    )
    for t in q.template:
        for x in t:
            if isinstance(x, Var) and x.name not in bound:
                raise SparqlSyntaxError(f"unbound template variable ?{x.name}")
    template = q.template
    if q.limit is not None:
        # SPARQL: LIMIT bounds the solution sequence BEFORE templating
        bindings = bindings.limit(q.limit)

    def instantiate(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        tables = []
        # Template blank nodes (``_:label``) mint a FRESH bnode per
        # SOLUTION (W3C SPARQL 1.1 §16.2.1): deterministic salted-hash
        # skolemization — md5 over the solution's bound term columns in
        # sorted-variable order (the engine's skolemization story, same
        # as the RDFa anon-subject minting) — so identical solutions
        # collapse to isomorphic output and the result is partition- and
        # run-independent.  One mint per distinct template label.
        bnode_vals: dict[str, pa.Array] = {}
        tpl_labels = {
            x.value
            for t in template
            for x in t
            if isinstance(x, Term) and x.kind == 1
        }
        if tpl_labels:
            import hashlib

            var_cols = sorted(
                c
                for c in batch.column_names
                if c.endswith("__value") and "$" not in c and not c.startswith("_match")
            )
            base = [c[: -len("__value")] for c in var_cols]
            rows_sig = []
            rendered = [
                [
                    "" if v is None else str(v)
                    for v in pc.cast(
                        pc.fill_null(batch[f"{b}__{f}"], "" if f != "kind" else -1),
                        pa.string(),
                    ).to_pylist()
                ]
                for b in base
                for f in _FIELDS
            ]
            for i in range(n):
                rows_sig.append("\x1f".join(col[i] for col in rendered))
            for label in tpl_labels:
                bnode_vals[label] = pa.array(
                    [
                        "tpl"
                        + label
                        + hashlib.md5((label + "\x1e" + s).encode()).hexdigest()[:16]
                        for s in rows_sig
                    ],
                    pa.string(),
                )
        for s, p, o in template:
            cols = {}
            valid = None  # rows where every template var is bound
            for pos, x in zip(_POS, (s, p, o)):
                if isinstance(x, Var):
                    bound_mask = pc.is_valid(batch[f"{x.name}__kind"])
                    valid = bound_mask if valid is None else pc.and_(valid, bound_mask)
                    for f in _FIELDS:
                        col = batch[f"{x.name}__{f}"]
                        if f == "kind":
                            col = pc.cast(col, pa.uint8())
                        else:
                            col = pc.cast(col, pa.string())
                        cols[f"{pos}_{f}"] = col
                else:
                    cols[f"{pos}_kind"] = pa.array([x.kind] * n, pa.uint8())
                    if x.kind == 1:  # template bnode: per-solution mint
                        cols[f"{pos}_value"] = bnode_vals[x.value]
                    else:
                        cols[f"{pos}_value"] = pa.array([x.value] * n, pa.string())
                    cols[f"{pos}_lang"] = pa.array([x.lang] * n, pa.string())
                    cols[f"{pos}_datatype"] = pa.array([x.datatype] * n, pa.string())
            t = pa.table({c: cols[c] for c in TRIPLE_COLUMNS})
            if valid is not None:
                # SPARQL skips template triples with unbound variables
                t = t.filter(valid)
            tables.append(t)
        return pa.concat_tables(tables)

    from ..stages.materialize import dedup_exact

    out = bindings.map_batches(instantiate, batch_format="pyarrow")
    out = dedup_exact(out)
    return out.map_batches(
        lambda b: b.select(TRIPLE_COLUMNS), batch_format="pyarrow"
    )


def evaluate_describe(ds, query: str | DescribeQuery):
    """DESCRIBE → Dataset of the described subjects' distinct triples
    (streaming filter — the same M1 predicate the pattern scans use)."""
    from ..stages.filter import term_predicate
    from ..stages.materialize import dedup_exact

    q = parse_query(query) if isinstance(query, str) else query
    if not isinstance(q, DescribeQuery):
        raise SparqlSyntaxError("not a DESCRIBE query")
    ds = _apply_dataset_clause(ds, q)
    if q.var is not None:
        # DESCRIBE ?v WHERE { … }: evaluate the group, collect the
        # variable's DISTINCT rendered bindings (the described-resource
        # set is the query RESULT — driver-sized by design, same as any
        # SELECT the client would have issued), then one vectorized
        # is_in subject mask over the store.
        sel = SelectQuery(
            [q.var], True, list(q.patterns), list(q.filters),
            [], None, [], [], [], [], 0, [],
        )
        vals = sorted(
            {row[q.var] for row in evaluate_select(ds, sel).take_all()}
        )
        value_set = pa.array(vals, pa.large_string())

        def fvar(batch: pa.Table) -> pa.Table:
            rendered = nt_render_term_arrays(
                batch["subj_kind"], batch["subj_value"],
                batch["subj_lang"], batch["subj_datatype"],
            )
            return batch.filter(
                pc.is_in(rendered, value_set=value_set)
            ).select(TRIPLE_COLUMNS)

        return dedup_exact(
            ds.map_batches(fvar, batch_format="pyarrow")
        ).map_batches(lambda b: b.select(TRIPLE_COLUMNS), batch_format="pyarrow")
    terms = q.terms

    def f(batch: pa.Table) -> pa.Table:
        mask = None
        for t in terms:
            m = term_predicate(batch, "subj", t)
            mask = m if mask is None else pc.or_(mask, m)
        return batch.filter(mask).select(TRIPLE_COLUMNS)

    return dedup_exact(ds.map_batches(f, batch_format="pyarrow")).map_batches(
        lambda b: b.select(TRIPLE_COLUMNS), batch_format="pyarrow"
    )


def _unify(binding: dict, pattern, triple):
    """Extend ``binding`` so ``pattern`` matches ``triple``; None on
    conflict.  Terms compare by full identity (M9 semantics)."""
    out = None
    for pel, tel in zip(pattern, triple):
        if isinstance(pel, Var):
            cur = (out or binding).get(pel.name)
            if cur is None:
                if out is None:
                    out = dict(binding)
                out[pel.name] = tel
            elif cur != tel:
                return None
        elif pel != tel:
            return None
    return binding if out is None else out


def _match_bgp_local(triples, patterns):
    """Nested-loop BGP match over an in-memory triple list — sized for
    one stored graph (a document, thousands of triples), the same
    driver-side axis as ``apply_update`` itself."""
    sols = [{}]
    for pat in patterns:
        sols = [
            b2
            for b in sols
            for t in triples
            if (b2 := _unify(b, pat, t)) is not None
        ]
        if not sols:
            break
    return sols


def _instantiate_tmpl(tmpl, sol):
    """Template patterns → ground triples under one solution; triples
    with an unbound template variable are skipped (SPARQL 1.1 Update:
    such instantiations produce no triple)."""
    out = []
    for pat in tmpl:
        t = []
        for el in pat:
            if isinstance(el, Var):
                v = sol.get(el.name)
                if v is None:
                    break
                t.append(v)
            else:
                t.append(el)
        else:
            out.append(tuple(t))
    return out


def apply_update(table: pa.Table, query: str) -> pa.Table:
    """SPARQL-Update (INSERT DATA / DELETE DATA / DELETE WHERE /
    DELETE-INSERT-WHERE, ';'-chained) applied to one stored graph's
    triple table, set semantics, ops in order.  A modify op evaluates
    its WHERE once, then deletes before inserting (spec order).

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
        if isinstance(op, GraphMgmtOp):
            raise SparqlSyntaxError(
                f"{op.verb.upper()} is a graph-management operation — "
                "apply it at store level via FileGraphStore.manage()"
            )
        if isinstance(op, ModifyOp):
            sols = _match_bgp_local(current, op.where)
            if op.delete_tmpl:
                rm = set()
                for sol in sols:
                    rm.update(_instantiate_tmpl(op.delete_tmpl, sol))
                current = [t for t in current if t not in rm]
                have -= rm
            if op.insert_tmpl:
                for sol in sols:
                    for t in _instantiate_tmpl(op.insert_tmpl, sol):
                        if t not in have:
                            current.append(t)
                            have.add(t)
        elif op.action == "delete":
            rm = set(op.triples)
            current = [t for t in current if t not in rm]
            have -= rm
        else:
            for t in op.triples:
                if t not in have:
                    current.append(t)
                    have.add(t)
    return triples_to_table(current, with_hash=False)

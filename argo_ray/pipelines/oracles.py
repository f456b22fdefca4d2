"""DuckDB oracle SQL for the KG-construction queries.

Because the ``pages`` table is a deterministic relational function of
``documents`` (argo_ray/pages.py), the expected triples are expressible
as plain SQL — the ``EXP`` CTE below reconstructs exactly what the Ray
pipeline must extract, including the duplicated assertions (doc_id%3),
the skolemized blank nodes (doc_id%7, md5-based so DuckDB can reproduce
them) and the hot hub subject.
"""

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
EX = "http://example.org/ns#"
DC = "http://purl.org/dc/elements/1.1/"
XSD_INT = "http://www.w3.org/2001/XMLSchema#integer"
HUB = "https://hub.example.org/"

# link-prediction hub cap: apexes contribute wedges only among their
# LINKPRED_APEX_CAP lexicographically-first neighbors (both sides).
LINKPRED_APEX_CAP = 128

# Shared CTE: documents → expected extracted triples (multiset).
EXP_CTE = f"""
WITH docs AS (
  SELECT doc_id, text, lang, source, n_chars,
         'https://kg.example.org/doc/' || doc_id AS entity,
         'https://docs.example.org/' || source || '/' || doc_id AS url,
         array_to_string(string_split(text, ' ')[1:5], ' ') AS title,
         'https://site' || (doc_id % 5) || '.example.org/' AS site,
         'anon' || substr(md5('https://docs.example.org/' || source || '/' || doc_id || '#0'), 1, 16) AS skolem
  FROM documents
),
exp AS (
  SELECT CAST(0 AS BIGINT) AS subj_kind, entity AS subj_value, '' AS subj_lang, '' AS subj_datatype,
         CAST(0 AS BIGINT) AS pred_kind, '{RDF_TYPE}' AS pred_value, '' AS pred_lang, '' AS pred_datatype,
         CAST(0 AS BIGINT) AS obj_kind, '{EX}Document' AS obj_value, '' AS obj_lang, '' AS obj_datatype
  FROM docs
  UNION ALL
  SELECT 0, entity, '', '', 0, '{DC}language', '', '', 2, lang, '', '' FROM docs
  UNION ALL
  SELECT 0, entity, '', '', 0, '{DC}language', '', '', 2, lang, '', ''
  FROM docs WHERE doc_id % 3 = 0
  UNION ALL
  SELECT 0, entity, '', '', 0, '{EX}chars', '', '',
         2, CAST(n_chars AS VARCHAR), '', '{XSD_INT}' FROM docs
  UNION ALL
  SELECT 0, entity, '', '', 0, '{DC}title', '', '', 2, title, lang, '' FROM docs
  UNION ALL
  SELECT 0, entity, '', '', 0, '{EX}site', '', '', 0, site, '', '' FROM docs
  UNION ALL
  SELECT 0, '{HUB}', '', '', 0, '{EX}cites', '', '', 0, entity, '', '' FROM docs
  UNION ALL
  SELECT 1, skolem, '', '', 0, '{RDF_TYPE}', '', '', 0, '{EX}Mention', '', ''
  FROM docs WHERE doc_id % 7 = 0
  UNION ALL
  SELECT 1, skolem, '', '', 0, '{EX}label', '', '', 2, 'm' || doc_id, '', ''
  FROM docs WHERE doc_id % 7 = 0
)
"""

# Same expected-triples CTE with per-row provenance: every branch gains
# the asserting page's url as its first column.
_DOCS_PART, _EXP_PART = EXP_CTE.split("exp AS (")
EXP_URL_CTE = _DOCS_PART + "exp AS (" + _EXP_PART.replace("SELECT ", "SELECT url, ")

TERM_COLS = """subj_kind, subj_value, subj_lang, subj_datatype,
       pred_kind, pred_value, pred_lang, pred_datatype,
       obj_kind, obj_value, obj_lang, obj_datatype"""

# One rendered N-Triples line from the flattened columns (canonical
# rendering, term.go:49-51,93-110; values are escape-free by fixture
# construction so no replace chain is needed in SQL).
_NT_TERM = """CASE {k}
  WHEN 0 THEN '<' || {v} || '>'
  WHEN 1 THEN '_:' || {v}
  ELSE '"' || {v} || '"' ||
       CASE WHEN {l} <> '' THEN '@' || {l}
            WHEN {d} <> '' THEN '^^<' || {d} || '>'
            ELSE '' END
END"""


def _nt_term(pos: str) -> str:
    return _NT_TERM.format(
        k=f"{pos}_kind", v=f"{pos}_value", l=f"{pos}_lang", d=f"{pos}_datatype"
    )


# The second source for the union query: one synthetic N-Triples
# assertion per document (token count, whitespace tokenisation).
TOKENS_CTE_BODY = f"""
  SELECT CAST(0 AS BIGINT) AS subj_kind, entity AS subj_value, '' AS subj_lang, '' AS subj_datatype,
         CAST(0 AS BIGINT) AS pred_kind, '{EX}tokens' AS pred_value, '' AS pred_lang, '' AS pred_datatype,
         CAST(2 AS BIGINT) AS obj_kind,
         CAST(len(string_split(text, ' ')) AS VARCHAR) AS obj_value, '' AS obj_lang,
         '{XSD_INT}' AS obj_datatype
  FROM docs
"""


def _pagerank_sql(iters: int = 5, seed_where: str | None = None) -> str:
    """Nested per-iteration CTEs mirroring the simple PageRank power
    iteration exactly (d=0.85, no dangling redistribution): each r{i}
    is (1-d)/N + d * SUM over in-edges of r{i-1}/outdeg, with the
    LEFT JOIN chain giving no-in-edge nodes a NULL sum (COALESCE 0).
    All literals CAST to DOUBLE so DuckDB never routes through DECIMAL
    arithmetic; final ranks ROUND(…, 6) like the Ray side."""
    sql = EXP_CTE + f""", d AS MATERIALIZED (SELECT DISTINCT {TERM_COLS} FROM exp),
e AS MATERIALIZED (SELECT DISTINCT subj_value AS src, obj_value AS dst FROM d WHERE obj_kind <> 2),
nodes AS MATERIALIZED (SELECT src AS node FROM e UNION SELECT dst FROM e),
nn AS MATERIALIZED (SELECT CAST(COUNT(*) AS DOUBLE) AS cnt FROM nodes),
odeg AS MATERIALIZED (SELECT src, CAST(COUNT(*) AS DOUBLE) AS odeg FROM e GROUP BY src),
r0 AS MATERIALIZED (SELECT node, CAST(1.0 AS DOUBLE) / (SELECT cnt FROM nn) AS pr FROM nodes)"""
    if seed_where is not None:
        # personalized variant: teleport/start vector = 1/|S| on seeds
        sql = sql.replace(
            "r0 AS MATERIALIZED (SELECT node, CAST(1.0 AS DOUBLE) / (SELECT cnt FROM nn) AS pr FROM nodes)",
            f"""seeds AS MATERIALIZED (
  SELECT 'https://kg.example.org/doc/' || doc_id AS node
  FROM documents WHERE {seed_where}
),
ns AS MATERIALIZED (SELECT CAST(COUNT(*) AS DOUBLE) AS cnt FROM seeds),
r0 AS MATERIALIZED (
  SELECT nodes.node,
         CASE WHEN seeds.node IS NOT NULL
              THEN CAST(1.0 AS DOUBLE) / (SELECT cnt FROM ns)
              ELSE CAST(0.0 AS DOUBLE) END AS pr
  FROM nodes LEFT JOIN seeds ON seeds.node = nodes.node)""",
        )
    base_expr = (
        "CAST(0.15 AS DOUBLE) / (SELECT cnt FROM nn)"
        if seed_where is None
        else "CASE WHEN nodes.node IN (SELECT node FROM seeds) "
             "THEN CAST(0.15 AS DOUBLE) / (SELECT cnt FROM ns) "
             "ELSE CAST(0.0 AS DOUBLE) END"
    )
    for i in range(1, iters + 1):
        sql += f""",
r{i} AS MATERIALIZED (
  SELECT nodes.node,
         {base_expr}
         + CAST(0.85 AS DOUBLE) * COALESCE(SUM(r{i - 1}.pr / odeg.odeg), 0) AS pr
  FROM nodes
  LEFT JOIN e ON e.dst = nodes.node
  LEFT JOIN odeg ON odeg.src = e.src
  LEFT JOIN r{i - 1} ON r{i - 1}.node = e.src
  GROUP BY nodes.node
)"""
    return sql + f"""
SELECT node, ROUND(pr, 6) AS pr FROM r{iters}
ORDER BY ROUND(pr, 6) DESC, node LIMIT 20"""


def _hits_sql(iters: int = 5) -> str:
    """Nested per-iteration CTEs mirroring HITS exactly: each a{i} is
    the in-neighbor hub sum L2-normalized, each h{i} the out-neighbor
    authority sum L2-normalized, h0 = 1.  Final scores ROUND(…, 6)
    like the Ray side.  Every iteration CTE is AS MATERIALIZED: the
    norm subquery references each _raw twice and the chain compounds,
    so DuckDB's default CTE inlining re-evaluates the base ~2^iters
    times (it exhausted the fd limit re-opening the parquet)."""
    sql = EXP_CTE + f""", d AS MATERIALIZED (SELECT DISTINCT {TERM_COLS} FROM exp),
e AS MATERIALIZED (SELECT DISTINCT subj_value AS src, obj_value AS dst FROM d WHERE obj_kind <> 2),
nodes AS MATERIALIZED (SELECT src AS node FROM e UNION SELECT dst FROM e),
h0 AS MATERIALIZED (SELECT node, CAST(1.0 AS DOUBLE) AS val FROM nodes)"""
    for i in range(1, iters + 1):
        sql += f""",
a{i}_raw AS MATERIALIZED (
  SELECT nodes.node, COALESCE(SUM(h{i - 1}.val), 0) AS val
  FROM nodes
  LEFT JOIN e ON e.dst = nodes.node
  LEFT JOIN h{i - 1} ON h{i - 1}.node = e.src
  GROUP BY nodes.node
),
a{i} AS MATERIALIZED (SELECT node, val / (SELECT SQRT(SUM(val * val)) FROM a{i}_raw) AS val
         FROM a{i}_raw),
h{i}_raw AS MATERIALIZED (
  SELECT nodes.node, COALESCE(SUM(a{i}.val), 0) AS val
  FROM nodes
  LEFT JOIN e ON e.src = nodes.node
  LEFT JOIN a{i} ON a{i}.node = e.dst
  GROUP BY nodes.node
),
h{i} AS MATERIALIZED (SELECT node, val / (SELECT SQRT(SUM(val * val)) FROM h{i}_raw) AS val
         FROM h{i}_raw)"""
    return sql + f"""
SELECT h.node, ROUND(h.val, 6) AS hub, ROUND(a.val, 6) AS authority
FROM h{iters} h JOIN a{iters} a ON a.node = h.node
ORDER BY ROUND(a.val, 6) DESC, h.node LIMIT 20"""


def _bfs_sql(
    iters: int = 6, unreached: int = 1_000_000, seed_where: str | None = None
) -> str:
    """Nested per-iteration CTEs mirroring the BFS relaxation exactly:
    d{i}(v) = LEAST(d{i-1}(v), 1 + MIN over in-edges d{i-1}(u)), seed =
    MIN(node), integer sentinel for unreached — bit-exact, no floats."""
    seed_cond = (
        "node = (SELECT MIN(node) FROM nodes)"
        if seed_where is None
        else "node IN (SELECT 'https://kg.example.org/doc/' || doc_id "
             f"FROM documents WHERE {seed_where})"
    )
    sql = EXP_CTE + f""", d AS MATERIALIZED (SELECT DISTINCT {TERM_COLS} FROM exp),
e AS MATERIALIZED (SELECT DISTINCT subj_value AS src, obj_value AS dst FROM d WHERE obj_kind <> 2),
eu AS MATERIALIZED (SELECT src, dst FROM e UNION SELECT dst, src FROM e),
nodes AS MATERIALIZED (SELECT src AS node FROM e UNION SELECT dst FROM e),
d0 AS MATERIALIZED (
  SELECT node,
         CASE WHEN {seed_cond} THEN 0
              ELSE {unreached} END AS dist
  FROM nodes
)"""
    for i in range(1, iters + 1):
        sql += f""",
d{i} AS MATERIALIZED (
  SELECT n.node,
         LEAST(dp.dist, COALESCE(MIN(de.dist + 1), {unreached})) AS dist
  FROM nodes n
  JOIN d{i - 1} dp ON dp.node = n.node
  LEFT JOIN eu ON eu.dst = n.node
  LEFT JOIN d{i - 1} de ON de.node = eu.src
  GROUP BY n.node, dp.dist
)"""
    return sql + f"""
SELECT node, CAST(dist AS BIGINT) AS dist FROM d{iters} WHERE dist < {unreached}"""


def _sssp_sql(iters: int = 4, unreached: int = 1_000_000) -> str:
    """Nested per-iteration CTEs mirroring the weighted Bellman-Ford
    relaxation exactly over the DIRECTED edge set: d{i}(v) =
    LEAST(d{i-1}(v), MIN over in-edges d{i-1}(u) + 1 + length(v) % 7),
    seed = the hub page, integer sentinel — bit-exact, no floats."""
    sql = EXP_CTE + f""", d AS MATERIALIZED (SELECT DISTINCT {TERM_COLS} FROM exp),
e AS MATERIALIZED (SELECT DISTINCT subj_value AS src, obj_value AS dst FROM d WHERE obj_kind <> 2),
nodes AS MATERIALIZED (SELECT src AS node FROM e UNION SELECT dst FROM e),
d0 AS MATERIALIZED (
  SELECT node,
         CASE WHEN node = '{HUB}' THEN 0 ELSE {unreached} END AS dist
  FROM nodes
)"""
    for i in range(1, iters + 1):
        sql += f""",
d{i} AS MATERIALIZED (
  SELECT n.node,
         LEAST(dp.dist,
               COALESCE(MIN(de.dist + 1 + (length(n.node) % 7)), {unreached}),
               {unreached}) AS dist
  FROM nodes n
  JOIN d{i - 1} dp ON dp.node = n.node
  LEFT JOIN e ON e.dst = n.node
  LEFT JOIN d{i - 1} de ON de.node = e.src
  GROUP BY n.node, dp.dist
)"""
    return sql + f"""
SELECT node, CAST(dist AS BIGINT) AS dist FROM d{iters} WHERE dist < {unreached}"""


def _host_pagerank_sql(iters: int = 5) -> str:
    """PageRank over the reconstructed host-level link graph — the
    same nested-CTE power iteration as :func:`_pagerank_sql`, with the
    edge CTE swapped for the host pairs the pages synthesize."""
    sql = """WITH e AS MATERIALIZED (
  SELECT DISTINCT 'docs.example.org' AS src, dst FROM (
    SELECT 'site' || (doc_id % 5) || '.example.org' AS dst FROM documents
    UNION ALL SELECT 'hub.example.org' FROM documents
  )
),
nodes AS MATERIALIZED (SELECT src AS node FROM e UNION SELECT dst FROM e),
nn AS MATERIALIZED (SELECT CAST(COUNT(*) AS DOUBLE) AS cnt FROM nodes),
odeg AS MATERIALIZED (SELECT src, CAST(COUNT(*) AS DOUBLE) AS odeg FROM e GROUP BY src),
r0 AS MATERIALIZED (SELECT node, CAST(1.0 AS DOUBLE) / (SELECT cnt FROM nn) AS pr FROM nodes)"""
    for i in range(1, iters + 1):
        sql += f""",
r{i} AS MATERIALIZED (
  SELECT nodes.node,
         CAST(0.15 AS DOUBLE) / (SELECT cnt FROM nn)
         + CAST(0.85 AS DOUBLE) * COALESCE(SUM(r{i - 1}.pr / odeg.odeg), 0) AS pr
  FROM nodes
  LEFT JOIN e ON e.dst = nodes.node
  LEFT JOIN odeg ON odeg.src = e.src
  LEFT JOIN r{i - 1} ON r{i - 1}.node = e.src
  GROUP BY nodes.node
)"""
    return sql + f"""
SELECT node, ROUND(pr, 6) AS pr FROM r{iters}
ORDER BY ROUND(pr, 6) DESC, node LIMIT 20"""


def _bowtie_sql(iters: int = 6, unreached: int = 1_000_000) -> str:
    """Two fixed-round directed BFS chains (forward from the hub,
    backward over reversed edges) + the SCC/IN/OUT/OTHER CASE."""
    sql = EXP_CTE + f""", d AS MATERIALIZED (SELECT DISTINCT {TERM_COLS} FROM exp),
e AS MATERIALIZED (SELECT DISTINCT subj_value AS src, obj_value AS dst FROM d WHERE obj_kind <> 2),
nodes AS MATERIALIZED (SELECT src AS node FROM e UNION SELECT dst FROM e),
f0 AS MATERIALIZED (
  SELECT node, CASE WHEN node = '{HUB}' THEN 0 ELSE {unreached} END AS dist FROM nodes),
b0 AS MATERIALIZED (
  SELECT node, CASE WHEN node = '{HUB}' THEN 0 ELSE {unreached} END AS dist FROM nodes)"""
    for i in range(1, iters + 1):
        sql += f""",
f{i} AS MATERIALIZED (
  SELECT n.node, LEAST(dp.dist, COALESCE(MIN(de.dist + 1), {unreached})) AS dist
  FROM nodes n
  JOIN f{i - 1} dp ON dp.node = n.node
  LEFT JOIN e ON e.dst = n.node
  LEFT JOIN f{i - 1} de ON de.node = e.src
  GROUP BY n.node, dp.dist
),
b{i} AS MATERIALIZED (
  SELECT n.node, LEAST(dp.dist, COALESCE(MIN(de.dist + 1), {unreached})) AS dist
  FROM nodes n
  JOIN b{i - 1} dp ON dp.node = n.node
  LEFT JOIN e ON e.src = n.node
  LEFT JOIN b{i - 1} de ON de.node = e.dst
  GROUP BY n.node, dp.dist
)"""
    return sql + f"""
SELECT f.node,
       CASE WHEN f.dist < {unreached} AND b.dist < {unreached} THEN 'SCC'
            WHEN f.dist < {unreached} THEN 'OUT'
            WHEN b.dist < {unreached} THEN 'IN'
            ELSE 'OTHER' END AS cls
FROM f{iters} f JOIN b{iters} b ON b.node = f.node"""


def _host_pagerank_weighted_sql(iters: int = 5) -> str:
    """Weighted host PageRank: contribution = r / (outw / w), the SAME
    two-division shape the Ray KV plan and the single-task kernel
    compute, so all three agree bit-for-bit before the final ROUND."""
    sql = """WITH e AS MATERIALIZED (
  SELECT 'docs.example.org' AS src, dst, CAST(COUNT(*) AS DOUBLE) AS w FROM (
    SELECT 'site' || (doc_id % 5) || '.example.org' AS dst FROM documents
    UNION ALL SELECT 'hub.example.org' FROM documents
  ) GROUP BY dst
),
nodes AS MATERIALIZED (SELECT src AS node FROM e UNION SELECT dst FROM e),
nn AS MATERIALIZED (SELECT CAST(COUNT(*) AS DOUBLE) AS cnt FROM nodes),
ow AS MATERIALIZED (SELECT src, SUM(w) AS outw FROM e GROUP BY src),
r0 AS MATERIALIZED (SELECT node, CAST(1.0 AS DOUBLE) / (SELECT cnt FROM nn) AS pr FROM nodes)"""
    for i in range(1, iters + 1):
        sql += f""",
r{i} AS MATERIALIZED (
  SELECT nodes.node,
         CAST(0.15 AS DOUBLE) / (SELECT cnt FROM nn)
         + CAST(0.85 AS DOUBLE)
           * COALESCE(SUM(r{i - 1}.pr / (ow.outw / e.w)), 0) AS pr
  FROM nodes
  LEFT JOIN e ON e.dst = nodes.node
  LEFT JOIN ow ON ow.src = e.src
  LEFT JOIN r{i - 1} ON r{i - 1}.node = e.src
  GROUP BY nodes.node
)"""
    return sql + f"""
SELECT node, ROUND(pr, 6) AS pr FROM r{iters}
ORDER BY ROUND(pr, 6) DESC, node LIMIT 20"""


def _components_sql(iters: int = 8) -> str:
    """Fixed-round undirected min-label propagation, labels = node
    names: l{i}(v) = LEAST(l{i-1}(v), MIN over neighbors l{i-1}(u)) —
    strings only, bit-exact, mirrors graph.py::label_propagation."""
    sql = EXP_CTE + f""", d AS MATERIALIZED (SELECT DISTINCT {TERM_COLS} FROM exp),
e AS MATERIALIZED (SELECT DISTINCT subj_value AS src, obj_value AS dst FROM d WHERE obj_kind <> 2),
eu AS MATERIALIZED (SELECT src, dst FROM e UNION SELECT dst, src FROM e),
nodes AS MATERIALIZED (SELECT src AS node FROM e UNION SELECT dst FROM e),
l0 AS MATERIALIZED (SELECT node, node AS label FROM nodes)"""
    for i in range(1, iters + 1):
        sql += f""",
l{i} AS MATERIALIZED (
  SELECT n.node, LEAST(lp.label, COALESCE(MIN(ln.label), lp.label)) AS label
  FROM nodes n
  JOIN l{i - 1} lp ON lp.node = n.node
  LEFT JOIN eu ON eu.dst = n.node
  LEFT JOIN l{i - 1} ln ON ln.node = eu.src
  GROUP BY n.node, lp.label
)"""
    return sql + f"""
SELECT node, label FROM l{iters}"""


def _kcore_sql(k: int = 6, rounds: int = 8) -> str:
    """Fixed-round k-core peeling over the divisor graph of doc ids —
    one (kept-nodes, surviving-edges) CTE pair per round, mirrors
    graph.py::kcore (early exit there is the fixpoint, so extra rounds
    are no-ops on both sides)."""
    sql = """WITH e0 AS MATERIALIZED (
  SELECT CAST(a.doc_id AS BIGINT) AS s, CAST(b.doc_id AS BIGINT) AS d
  FROM documents a JOIN documents b
    ON a.doc_id >= 1 AND b.doc_id > a.doc_id AND b.doc_id % a.doc_id = 0
)"""
    for r in range(1, rounds + 1):
        sql += f""",
n{r} AS MATERIALIZED (
  SELECT node FROM (SELECT s AS node FROM e{r - 1} UNION ALL SELECT d FROM e{r - 1})
  GROUP BY node HAVING COUNT(*) >= {k}
),
e{r} AS MATERIALIZED (
  SELECT s, d FROM e{r - 1}
  WHERE s IN (SELECT node FROM n{r}) AND d IN (SELECT node FROM n{r})
)"""
    return sql + f"""
SELECT node AS doc_id, COUNT(*) AS degree
FROM (SELECT s AS node FROM e{rounds} UNION ALL SELECT d FROM e{rounds})
GROUP BY node"""


ORACLES: dict[str, str] = {
    "rdfa_extract": EXP_CTE + f"SELECT {TERM_COLS} FROM exp",
    "dedup_exact": EXP_CTE + f"SELECT DISTINCT {TERM_COLS} FROM exp",
    "nt_lines": EXP_CTE
    + f"""SELECT {_nt_term('subj')} || ' ' || {_nt_term('pred')} || ' ' || {_nt_term('obj')} || ' .' AS line
FROM (SELECT DISTINCT {TERM_COLS} FROM exp)""",
    "nt_roundtrip": EXP_CTE + f"SELECT DISTINCT {TERM_COLS} FROM exp",
    "turtle_roundtrip": EXP_CTE + f"SELECT DISTINCT {TERM_COLS} FROM exp",
    "rdfxml_roundtrip": EXP_CTE + f"SELECT DISTINCT {TERM_COLS} FROM exp",
    "squirtle_roundtrip": EXP_CTE + f"SELECT DISTINCT {TERM_COLS} FROM exp",
    "rdfjson_roundtrip": EXP_CTE + f"SELECT DISTINCT {TERM_COLS} FROM exp",
    "jsonld_roundtrip": EXP_CTE + f"SELECT DISTINCT {TERM_COLS} FROM exp",
    "store_roundtrip": EXP_CTE + f"SELECT DISTINCT {TERM_COLS} FROM exp",
    "graphstore_roundtrip": EXP_CTE + f"SELECT DISTINCT {TERM_COLS} FROM exp",
    "dedup_provenance": EXP_URL_CTE
    + f"SELECT MIN(url) AS url, {TERM_COLS} FROM exp GROUP BY {TERM_COLS}",
    "triple_pr": EXP_CTE
    + f"""SELECT CAST(1.0 AS DOUBLE) AS precision, CAST(1.0 AS DOUBLE) AS recall,
       COUNT(*) AS ours, COUNT(*) AS expected, COUNT(*) AS matched
FROM (SELECT DISTINCT {TERM_COLS} FROM exp)""",
    "filter_pattern": EXP_CTE
    + f"""SELECT DISTINCT subj_value, obj_value AS lang_value
FROM exp WHERE pred_value = '{DC}language'""",
    "rewrite_regex": EXP_CTE
    + """SELECT DISTINCT regexp_replace(subj_value, '^https://kg\\.example\\.org/doc/', 'https://entity.example.org/') AS subj_value
FROM exp WHERE subj_kind = 0""",
    "split_prefix": EXP_CTE
    + """SELECT DISTINCT pred_value,
       CASE WHEN pred_value LIKE '%#%' THEN regexp_extract(pred_value, '^(.*#)', 1)
            WHEN pred_value LIKE '%/%' THEN regexp_extract(pred_value, '^(.*/)', 1)
            ELSE '' END AS base,
       CASE WHEN pred_value LIKE '%#%' THEN regexp_extract(pred_value, '#([^#]*)$', 1)
            WHEN pred_value LIKE '%/%' THEN regexp_extract(pred_value, '/([^/]*)$', 1)
            ELSE pred_value END AS local_name
FROM exp""",
    "kg_degree_topk": EXP_CTE
    + f""", d AS (SELECT DISTINCT {TERM_COLS} FROM exp),
nodes AS (
  SELECT subj_value AS node FROM d
  UNION ALL
  SELECT obj_value FROM d WHERE obj_kind <> 2
)
SELECT node, CAST(COUNT(*) AS BIGINT) AS degree
FROM nodes GROUP BY node
ORDER BY degree DESC, node LIMIT 20""",
    "kg_predicate_hist": EXP_CTE
    + f""", d AS (SELECT DISTINCT {TERM_COLS} FROM exp)
SELECT pred_value AS predicate, CAST(COUNT(*) AS BIGINT) AS n_triples
FROM d GROUP BY pred_value""",
    "kg_pagerank": _pagerank_sql(5),
    "kg_ppr": _pagerank_sql(5, seed_where="doc_id % 10 = 0"),
    "kg_hits": _hits_sql(5),
    "kg_bfs": _bfs_sql(6),
    "kg_sssp": _sssp_sql(4),
    "kg_bowtie": _bowtie_sql(6),
    # literal datatype/lang histogram
    "kg_literal_hist": EXP_CTE
    + f""", d AS MATERIALIZED (SELECT DISTINCT {TERM_COLS} FROM exp)
SELECT obj_datatype AS datatype, obj_lang AS lang,
       CAST(COUNT(*) AS BIGINT) AS n_literals
FROM d WHERE obj_kind = 2 GROUP BY obj_datatype, obj_lang""",
    # inverse-functional (merge-key) property detection
    "kg_key_detect": EXP_CTE
    + f""", d AS MATERIALIZED (SELECT DISTINCT {TERM_COLS} FROM exp),
po AS (SELECT pred_value AS p, obj_value AS o,
              COUNT(DISTINCT subj_value) AS n_subj
       FROM d GROUP BY pred_value, obj_value)
SELECT p AS predicate,
       CAST(COUNT(*) AS BIGINT) AS n_objects,
       CAST(MAX(n_subj) AS BIGINT) AS max_subj_per_obj,
       CAST(CASE WHEN MAX(n_subj) = 1 THEN 1 ELSE 0 END AS BIGINT) AS is_key
FROM po GROUP BY p""",
    # schema induction: modal subject type per non-type predicate
    "kg_schema_induce": EXP_CTE
    + f""", d AS MATERIALIZED (SELECT DISTINCT {TERM_COLS} FROM exp),
ty AS (SELECT DISTINCT subj_value AS node, obj_value AS t FROM d
       WHERE pred_value = '{RDF_TYPE}'),
cnt AS (
  SELECT f.pred_value AS pred, ty.t, COUNT(*) AS n
  FROM d f JOIN ty ON ty.node = f.subj_value
  WHERE f.pred_value <> '{RDF_TYPE}'
  GROUP BY f.pred_value, ty.t
)
SELECT pred AS predicate, t AS domain_type, CAST(n AS BIGINT) AS support
FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY pred ORDER BY n DESC, t) AS rn
  FROM cnt
) WHERE rn = 1""",
    # dangling references: IRI objects never seen as a subject
    "kg_dangling_refs": EXP_CTE
    + f""", d AS MATERIALIZED (SELECT DISTINCT {TERM_COLS} FROM exp)
SELECT obj_value AS node, CAST(COUNT(*) AS BIGINT) AS n_refs
FROM d
WHERE obj_kind = 0
  AND obj_value NOT IN (SELECT DISTINCT subj_value FROM d)
GROUP BY obj_value""",
    # log2-bucket document-length histogram (binary digit count = the
    # exact floor(log2) the Ray side computes via the float exponent)
    "docs_length_hist": """SELECT
  CASE WHEN n_chars > 0 THEN length(bin(n_chars)) - 1 ELSE -1 END AS bucket,
  CAST(COUNT(*) AS BIGINT) AS n_docs
FROM documents GROUP BY 1""",
    # per-property cardinality profile over the deduped graph
    "kg_property_profile": EXP_CTE
    + f""", d AS MATERIALIZED (SELECT DISTINCT {TERM_COLS} FROM exp)
SELECT pred_value AS predicate,
       CAST(COUNT(*) AS BIGINT) AS n_triples,
       CAST(COUNT(DISTINCT subj_value) AS BIGINT) AS n_subjects,
       CAST(COUNT(DISTINCT obj_value) AS BIGINT) AS n_objects
FROM d GROUP BY pred_value""",
    # cross-syntax ER: equal derived titles block rdfa-vs-microdata
    # entities into sameAs candidates (collisions included)
    "kg_cross_syntax_er": """WITH t AS (
  SELECT doc_id, array_to_string(string_split(text, ' ')[1:5], ' ') AS title
  FROM documents
)
SELECT 'https://kg.example.org/doc/' || a.doc_id AS entity_a,
       'https://kg.example.org/md/' || b.doc_id AS entity_b
FROM t a JOIN t b ON a.title = b.title""",
    # degree-distribution histogram over the undirected simple graph
    "kg_degree_hist": EXP_CTE
    + f""", d AS MATERIALIZED (SELECT DISTINCT {TERM_COLS} FROM exp),
e0 AS (SELECT DISTINCT subj_value AS src, obj_value AS dst
       FROM d WHERE obj_kind <> 2 AND subj_value <> obj_value),
eu AS (SELECT src AS a, dst AS b FROM e0 UNION SELECT dst, src FROM e0),
deg AS (SELECT a, COUNT(*) AS degree FROM eu GROUP BY a)
SELECT CAST(degree AS BIGINT) AS degree,
       CAST(COUNT(*) AS BIGINT) AS n_nodes
FROM deg GROUP BY degree""",
    # Hamilton apportionment of a 10k crawl budget over weighted host
    # PageRank (micro-unit fixed point of ROUND(pr,6))
    "pages_crawl_budget": "WITH pr AS ("
    + _host_pagerank_weighted_sql(5)
    + """),
u AS (SELECT node AS host, CAST(ROUND(pr * 1000000) AS BIGINT) AS units FROM pr),
t AS (SELECT SUM(units) AS total FROM u),
f AS (SELECT host, units,
             (10000 * units) // (SELECT total FROM t) AS fl,
             (10000 * units) % (SELECT total FROM t) AS rem
      FROM u),
lo AS (SELECT 10000 - SUM(fl) AS leftover FROM f),
rk AS (SELECT host, fl, ROW_NUMBER() OVER (ORDER BY rem DESC, host) AS rn FROM f)
SELECT host,
       CAST(fl + CASE WHEN rn <= (SELECT leftover FROM lo) THEN 1 ELSE 0 END AS BIGINT) AS quota
FROM rk""",
    # reciprocity: directed edges whose reverse exists / all edges
    "kg_reciprocity": EXP_CTE
    + f""", d AS MATERIALIZED (SELECT DISTINCT {TERM_COLS} FROM exp),
e AS MATERIALIZED (SELECT DISTINCT subj_value AS src, obj_value AS dst
                   FROM d WHERE obj_kind <> 2 AND subj_value <> obj_value),
mo AS (SELECT COUNT(*) AS n_edges,
              SUM(CASE WHEN r.src IS NOT NULL THEN 1 ELSE 0 END) AS n_recip
       FROM e LEFT JOIN e r ON r.src = e.dst AND r.dst = e.src)
SELECT CAST(n_edges AS BIGINT) AS n_edges,
       CAST(n_recip AS BIGINT) AS n_reciprocal,
       ROUND(CAST(n_recip AS DOUBLE) / n_edges, 6) AS reciprocity
FROM mo""",
    # VoID descriptor: five exact scalars over the deduped graph
    "kg_void_stats": EXP_CTE
    + f""", d AS MATERIALIZED (SELECT DISTINCT {TERM_COLS} FROM exp)
SELECT CAST(COUNT(*) AS BIGINT) AS n_triples,
       CAST(COUNT(DISTINCT subj_value) AS BIGINT) AS n_subjects,
       CAST(COUNT(DISTINCT CASE WHEN obj_kind <> 2 THEN obj_value END) AS BIGINT) AS n_objects,
       CAST(COUNT(DISTINCT pred_value) AS BIGINT) AS n_properties,
       CAST(COUNT(DISTINCT CASE WHEN pred_value =
         'http://www.w3.org/1999/02/22-rdf-syntax-ns#type'
         THEN obj_value END) AS BIGINT) AS n_classes
FROM d""",
    # anchor-text surrogate per link target
    "pages_anchor_text_agg": """SELECT dst_url,
  CAST(COUNT(*) AS BIGINT) AS n_anchors,
  string_agg(DISTINCT anchor, ',' ORDER BY anchor) AS anchors
FROM (
  SELECT 'https://site' || (doc_id % 5) || '.example.org/' AS dst_url,
         'site' AS anchor FROM documents
  UNION ALL
  SELECT 'https://hub.example.org/', 'hub' FROM documents
)
GROUP BY dst_url""",
    # multi-syntax fan-in: RDFa ∪ microdata ∪ JSON-LD, distinct
    "kg_multisyntax_build": EXP_CTE
    + f""", md AS (
  SELECT doc_id,
         'https://kg.example.org/md/' || doc_id AS ent,
         'https://docs.example.org/' || source || '/' || doc_id AS page_url,
         array_to_string(string_split(text, ' ')[1:5], ' ') AS title,
         lang,
         'mdanon' || substr(md5('https://md.example.org/' || source || '/'
                                || doc_id || '#md0'), 1, 16) AS skolem
  FROM documents
),
mdexp AS (
  SELECT CAST(0 AS BIGINT) AS subj_kind, ent AS subj_value, '' AS subj_lang, '' AS subj_datatype,
         CAST(0 AS BIGINT) AS pred_kind, '{RDF_TYPE}' AS pred_value, '' AS pred_lang, '' AS pred_datatype,
         CAST(0 AS BIGINT) AS obj_kind, 'https://schema.org/Article' AS obj_value, '' AS obj_lang, '' AS obj_datatype
  FROM md
  UNION ALL
  SELECT 0, ent, '', '', 0, 'https://schema.org/inLanguage', '', '', 2, lang, '', '' FROM md
  UNION ALL
  SELECT 0, ent, '', '', 0, 'https://schema.org/headline', '', '', 2, title, '', '' FROM md
  UNION ALL
  SELECT 0, ent, '', '', 0, 'https://schema.org/url', '', '', 0, page_url, '', '' FROM md
  UNION ALL
  SELECT 0, ent, '', '', 0, 'https://schema.org/author', '', '', 1, skolem, '', '' FROM md
  UNION ALL
  SELECT 1, skolem, '', '', 0, 'https://schema.org/name', '', '', 2, 'a' || doc_id, '', '' FROM md
),
ldd AS (
  SELECT doc_id,
         'https://kg.example.org/ld/' || doc_id AS ent,
         'https://docs.example.org/' || source || '/' || doc_id AS page_url,
         array_to_string(string_split(text, ' ')[1:3], ' ') AS title
  FROM documents
),
ldexp AS (
  SELECT CAST(0 AS BIGINT) AS subj_kind, ent AS subj_value, '' AS subj_lang, '' AS subj_datatype,
         CAST(0 AS BIGINT) AS pred_kind, '{RDF_TYPE}' AS pred_value, '' AS pred_lang, '' AS pred_datatype,
         CAST(0 AS BIGINT) AS obj_kind, 'https://schema.org/Article' AS obj_value, '' AS obj_lang, '' AS obj_datatype
  FROM ldd
  UNION ALL
  SELECT 0, ent, '', '', 0, 'https://schema.org/name', '', '', 2, title, '', '' FROM ldd
  UNION ALL
  SELECT 0, ent, '', '', 0, 'https://schema.org/about', '', '', 0, page_url, '', '' FROM ldd
)
SELECT DISTINCT {TERM_COLS} FROM (
  SELECT {TERM_COLS} FROM exp
  UNION ALL SELECT {TERM_COLS} FROM mdexp
  UNION ALL SELECT {TERM_COLS} FROM ldexp
)""",
    # embedded JSON-LD: 3 triples per page; poison blocks contribute 0
    "jsonld_extract": f"""WITH ld AS (
  SELECT doc_id,
         'https://kg.example.org/ld/' || doc_id AS ent,
         'https://docs.example.org/' || source || '/' || doc_id AS page_url,
         array_to_string(string_split(text, ' ')[1:3], ' ') AS title
  FROM documents
),
exp AS (
  SELECT CAST(0 AS BIGINT) AS subj_kind, ent AS subj_value, '' AS subj_lang, '' AS subj_datatype,
         CAST(0 AS BIGINT) AS pred_kind, '{RDF_TYPE}' AS pred_value, '' AS pred_lang, '' AS pred_datatype,
         CAST(0 AS BIGINT) AS obj_kind, 'https://schema.org/Article' AS obj_value, '' AS obj_lang, '' AS obj_datatype
  FROM ld
  UNION ALL
  SELECT 0, ent, '', '', 0, 'https://schema.org/name', '', '', 2, title, '', '' FROM ld
  UNION ALL
  SELECT 0, ent, '', '', 0, 'https://schema.org/about', '', '', 0, page_url, '', '' FROM ld
)
SELECT {TERM_COLS} FROM exp""",
    # microdata extraction: 6 triples per synthesized schema.org page
    "microdata_extract": f"""WITH md AS (
  SELECT doc_id,
         'https://kg.example.org/md/' || doc_id AS ent,
         'https://docs.example.org/' || source || '/' || doc_id AS page_url,
         array_to_string(string_split(text, ' ')[1:5], ' ') AS title,
         lang,
         'mdanon' || substr(md5('https://md.example.org/' || source || '/'
                                || doc_id || '#md0'), 1, 16) AS skolem
  FROM documents
),
exp AS (
  SELECT CAST(0 AS BIGINT) AS subj_kind, ent AS subj_value, '' AS subj_lang, '' AS subj_datatype,
         CAST(0 AS BIGINT) AS pred_kind, '{RDF_TYPE}' AS pred_value, '' AS pred_lang, '' AS pred_datatype,
         CAST(0 AS BIGINT) AS obj_kind, 'https://schema.org/Article' AS obj_value, '' AS obj_lang, '' AS obj_datatype
  FROM md
  UNION ALL
  SELECT 0, ent, '', '', 0, 'https://schema.org/inLanguage', '', '', 2, lang, '', '' FROM md
  UNION ALL
  SELECT 0, ent, '', '', 0, 'https://schema.org/headline', '', '', 2, title, '', '' FROM md
  UNION ALL
  SELECT 0, ent, '', '', 0, 'https://schema.org/url', '', '', 0, page_url, '', '' FROM md
  UNION ALL
  SELECT 0, ent, '', '', 0, 'https://schema.org/author', '', '', 1, skolem, '', '' FROM md
  UNION ALL
  SELECT 1, skolem, '', '', 0, 'https://schema.org/name', '', '', 2, 'a' || doc_id, '', '' FROM md
)
SELECT {TERM_COLS} FROM exp""",
    # robots longest-match: /src1 blocks src1,src10..19; /src14 re-allows;
    # /src3/ blocks src3 only
    "pages_robots_filter": """SELECT
  'https://docs.example.org/' || source || '/' || doc_id AS url
FROM documents
WHERE NOT ((source LIKE 'src1%' AND source <> 'src14') OR source = 'src3')""",
    # change detection: exactly the lang-mutated generation-2 pages
    "pages_change_detect": """SELECT
  'https://docs.example.org/' || source || '/' || doc_id AS url
FROM documents WHERE doc_id % 4 = 0 AND lang <> 'xx'""",
    "pages_redirect_resolve": """SELECT
  'https://kg.example.org/doc/' || doc_id AS src,
  'https://kg.example.org/doc/' || (doc_id - (doc_id % 8)) AS dst
FROM documents WHERE doc_id % 8 BETWEEN 1 AND 3""",
    "kg_predicate_align": EXP_CTE
    + f""", d AS MATERIALIZED (SELECT DISTINCT {TERM_COLS} FROM exp),
sp AS MATERIALIZED (SELECT DISTINCT subj_value AS s, pred_value AS p FROM d),
tot AS MATERIALIZED (SELECT p, COUNT(*) AS np FROM sp GROUP BY p),
cm AS MATERIALIZED (
  SELECT x.p AS pred_a, y.p AS pred_b, COUNT(*) AS common
  FROM sp x JOIN sp y ON x.s = y.s AND x.p < y.p GROUP BY x.p, y.p)
SELECT cm.pred_a, cm.pred_b, CAST(cm.common AS BIGINT) AS common,
       CAST(cm.common AS DOUBLE) / (a.np + b.np - cm.common) AS jaccard
FROM cm JOIN tot a ON a.p = cm.pred_a JOIN tot b ON b.p = cm.pred_b""",
    "pages_crawl_frontier": """SELECT DISTINCT dst AS url FROM (
  SELECT 'https://site' || (doc_id % 5) || '.example.org/' AS dst FROM documents
  UNION ALL SELECT 'https://hub.example.org/' FROM documents
) WHERE dst NOT IN (
  SELECT 'https://docs.example.org/' || source || '/' || doc_id FROM documents
)""",
    # anchors to KG nodes survive; the planted nowhere-host noise drops
    "pages_anchor_link": """SELECT
  'https://docs.example.org/' || source || '/' || doc_id AS src_url,
  'https://site' || (doc_id % 5) || '.example.org/' AS entity,
  'site' AS anchor
FROM documents
UNION ALL
SELECT 'https://docs.example.org/' || source || '/' || doc_id,
       'https://hub.example.org/', 'hub'
FROM documents""",
    "pages_host_pagerank": _host_pagerank_sql(5),
    "pages_host_pagerank_weighted": _host_pagerank_weighted_sql(5),
    # recency fusion: the gen-2 crawl re-asserts dc:language='xx' for
    # every 4th document one day later; functional newest-wins patches
    # exactly those object values, nothing else
    "kg_temporal_fuse": EXP_CTE
    + f""", d AS MATERIALIZED (SELECT DISTINCT {TERM_COLS} FROM exp)
SELECT DISTINCT subj_kind, subj_value, subj_lang, subj_datatype,
       pred_kind, pred_value, pred_lang, pred_datatype,
       obj_kind,
       CASE WHEN pred_value = 'http://purl.org/dc/elements/1.1/language'
             AND subj_value LIKE 'https://kg.example.org/doc/%'
             AND CAST(substr(subj_value, 28) AS BIGINT) % 4 = 0
            THEN 'xx' ELSE obj_value END AS obj_value,
       obj_lang, obj_datatype
FROM d""",
    "kg_bfs_seeded": _bfs_sql(4, seed_where="doc_id % 10 = 0"),
    "kg_components": _components_sql(8),
    "kg_component_sizes": "WITH comp AS ("
    + _components_sql(8)
    + """),
sizes AS (SELECT label, COUNT(*) AS size FROM comp GROUP BY label)
SELECT CAST(size AS BIGINT) AS size,
       CAST(COUNT(*) AS BIGINT) AS n_components
FROM sizes GROUP BY size""",
    # link prediction: jaccard = common/(da+db-common) is ONE division
    # of exact integers on both sides → IEEE-identical doubles; full
    # (jaccard, common, ids) tie-break makes the LIMIT 20 set unique
    "kg_link_predict": EXP_CTE
    + f""", d AS MATERIALIZED (SELECT DISTINCT {TERM_COLS} FROM exp),
e AS MATERIALIZED (SELECT DISTINCT subj_value AS src, obj_value AS dst
                   FROM d WHERE obj_kind <> 2 AND subj_value <> obj_value),
eu AS MATERIALIZED (SELECT src AS a, dst AS b FROM e UNION SELECT dst, src FROM e),
deg AS MATERIALIZED (SELECT a AS node, COUNT(*) AS dg FROM eu GROUP BY a),
eu_cap AS MATERIALIZED (
  SELECT a, b FROM (
    SELECT a, b, ROW_NUMBER() OVER (PARTITION BY a ORDER BY b) AS rn FROM eu)
  WHERE rn <= {LINKPRED_APEX_CAP}),
cn AS MATERIALIZED (
  SELECT x.b AS na, y.b AS nb, COUNT(*) AS common
  FROM eu_cap x JOIN eu_cap y ON x.a = y.a AND x.b < y.b GROUP BY x.b, y.b),
cand AS (
  SELECT cn.na, cn.nb, cn.common, da.dg + db.dg - cn.common AS u
  FROM cn JOIN deg da ON da.node = cn.na JOIN deg db ON db.node = cn.nb
  WHERE NOT EXISTS (SELECT 1 FROM eu WHERE eu.a = cn.na AND eu.b = cn.nb))
SELECT na AS node_a, nb AS node_b, CAST(common AS BIGINT) AS common,
       CAST(common AS DOUBLE) / u AS jaccard
FROM cand ORDER BY jaccard DESC, common DESC, node_a, node_b LIMIT 20""",
    "kg_rdfs_infer": EXP_CTE
    + f""", d AS (SELECT DISTINCT {TERM_COLS} FROM exp)
SELECT DISTINCT * FROM (
  SELECT * FROM d
  UNION ALL
  SELECT subj_kind, subj_value, '', '', CAST(0 AS BIGINT), '{RDF_TYPE}', '', '',
         CAST(0 AS BIGINT), '{EX}' || t.super, '', ''
  FROM d, (VALUES ('Work'), ('Thing')) t(super)
  WHERE pred_value = '{RDF_TYPE}' AND obj_value = '{EX}Document'
  UNION ALL
  SELECT subj_kind, subj_value, '', '', 0, '{RDF_TYPE}', '', '',
         0, '{EX}Annotation', '', ''
  FROM d WHERE pred_value = '{RDF_TYPE}' AND obj_value = '{EX}Mention'
  UNION ALL
  SELECT subj_kind, subj_value, '', '', 0, '{RDF_TYPE}', '', '',
         0, '{EX}CitingAgent', '', ''
  FROM d WHERE pred_value = '{EX}cites'
  UNION ALL
  SELECT obj_kind, obj_value, '', '', 0, '{RDF_TYPE}', '', '',
         0, '{EX}' || t.super, '', ''
  FROM d, (VALUES ('Work'), ('Thing')) t(super)
  WHERE pred_value = '{EX}cites' AND obj_kind <> 2
  UNION ALL
  SELECT subj_kind, subj_value, '', '', 0, '{RDF_TYPE}', '', '',
         0, '{EX}Titled', '', ''
  FROM d WHERE pred_value = '{DC}title'
  UNION ALL
  SELECT subj_kind, subj_value, subj_lang, subj_datatype,
         0, 'http://www.w3.org/2000/01/rdf-schema#label', '', '',
         obj_kind, obj_value, obj_lang, obj_datatype
  FROM d WHERE pred_value = '{EX}label'
)""",
    "graph_kcore": _kcore_sql(6, 8),
    "kg_owl_infer": EXP_CTE
    + f""", d AS (SELECT DISTINCT {TERM_COLS} FROM exp),
nxt AS (
  SELECT 'https://kg.example.org/doc/' || doc_id AS s,
         'https://kg.example.org/doc/' || (doc_id + 1) AS o
  FROM documents WHERE doc_id % 50 <> 49
),
nextc AS (
  -- transitive closure of the 50-doc chains = all ordered pairs
  -- within a block (closed form; no recursion needed)
  SELECT 'https://kg.example.org/doc/' || a.doc_id AS s,
         'https://kg.example.org/doc/' || b.doc_id AS o
  FROM documents a JOIN documents b
    ON a.doc_id - (a.doc_id % 50) = b.doc_id - (b.doc_id % 50)
   AND b.doc_id > a.doc_id
),
u AS (
  SELECT * FROM d
  UNION
  SELECT CAST(0 AS BIGINT), s, '', '', CAST(0 AS BIGINT), '{EX}next', '', '',
         CAST(0 AS BIGINT), o, '', '' FROM nxt
  UNION
  SELECT 0, s, '', '', 0, '{EX}next', '', '', 0, o, '', '' FROM nextc
  UNION
  SELECT obj_kind, obj_value, '', '', 0, '{EX}citedBy', '', '',
         subj_kind, subj_value, '', ''
  FROM d WHERE pred_value = '{EX}cites' AND obj_kind <> 2
  UNION
  SELECT obj_kind, obj_value, '', '', 0, '{EX}site', '', '',
         subj_kind, subj_value, '', ''
  FROM d WHERE pred_value = '{EX}site' AND obj_kind <> 2
  UNION
  SELECT l.subj_kind, l.subj_value, '', '', 0, '{EX}citesSite', '', '',
         r.obj_kind, r.obj_value, '', ''
  FROM d l JOIN d r ON l.obj_kind = r.subj_kind AND l.obj_value = r.subj_value
  WHERE l.pred_value = '{EX}cites' AND l.obj_kind <> 2
    AND r.pred_value = '{EX}site' AND r.obj_kind <> 2
  UNION
  SELECT r.obj_kind, r.obj_value, '', '', 0, '{EX}siteCited', '', '',
         l.subj_kind, l.subj_value, '', ''
  FROM d l JOIN d r ON l.obj_kind = r.subj_kind AND l.obj_value = r.subj_value
  WHERE l.pred_value = '{EX}cites' AND l.obj_kind <> 2
    AND r.pred_value = '{EX}site' AND r.obj_kind <> 2
)
SELECT DISTINCT {TERM_COLS} FROM u""",
    "kg_sameas_canon": EXP_CTE
    + f""", d AS (SELECT DISTINCT {TERM_COLS} FROM exp),
alias AS (
  SELECT subj_kind,
         CASE WHEN subj_kind = 0 THEN replace(subj_value, 'https://kg.example.org/doc/', 'https://kb.example.org/entity/') ELSE subj_value END AS subj_value,
         subj_lang, subj_datatype,
         pred_kind, pred_value, pred_lang, pred_datatype,
         obj_kind,
         CASE WHEN obj_kind = 0 THEN replace(obj_value, 'https://kg.example.org/doc/', 'https://kb.example.org/entity/') ELSE obj_value END AS obj_value,
         obj_lang, obj_datatype
  FROM d
),
u AS (SELECT * FROM d UNION SELECT * FROM alias),
m AS (
  SELECT 'https://kg.example.org/doc/' || doc_id AS node, 'https://kb.example.org/entity/' || doc_id AS label
  FROM documents WHERE doc_id % 4 = 0
)
SELECT DISTINCT u.subj_kind,
       COALESCE(ms.label, u.subj_value) AS subj_value, u.subj_lang, u.subj_datatype,
       u.pred_kind, u.pred_value, u.pred_lang, u.pred_datatype,
       u.obj_kind,
       COALESCE(mo.label, u.obj_value) AS obj_value, u.obj_lang, u.obj_datatype
FROM u
LEFT JOIN m ms ON u.subj_kind = 0 AND u.subj_value = ms.node
LEFT JOIN m mo ON u.obj_kind = 0 AND u.obj_value = mo.node""",
    "group_subject_count": EXP_CTE
    + f"""SELECT subj_kind, subj_value, COUNT(*) AS n_triples
FROM (SELECT DISTINCT {TERM_COLS} FROM exp)
GROUP BY subj_kind, subj_value""",
    "typed_coercion": EXP_CTE
    + f"""SELECT subj_value, CAST(obj_value AS BIGINT) AS chars_int
FROM exp WHERE pred_value = '{EX}chars'""",
    "skolemize": EXP_CTE
    + "SELECT DISTINCT subj_value AS bnode_id FROM exp WHERE subj_kind = 1",
    "union_sources": EXP_CTE
    + f""", tokens AS ({TOKENS_CTE_BODY})
SELECT DISTINCT {TERM_COLS} FROM (
  SELECT {TERM_COLS} FROM exp
  UNION ALL
  SELECT {TERM_COLS} FROM tokens
)""",
    "entity_link": EXP_CTE
    + f""", cand AS (
  SELECT title AS surface_form,
         'https://kg.example.org/doc/' || MIN(doc_id) AS entity_iri
  FROM docs GROUP BY title
)
SELECT DISTINCT e.subj_value, c.entity_iri AS entity_value
FROM exp e JOIN cand c ON e.obj_value = c.surface_form
WHERE e.pred_value = '{DC}title' AND e.obj_kind = 2""",
    "entity_link_join": EXP_CTE
    + f""", cand AS (
  SELECT title AS surface_form,
         'https://kg.example.org/doc/' || MIN(doc_id) AS entity_iri
  FROM docs GROUP BY title
)
SELECT DISTINCT e.subj_value, c.entity_iri AS entity_value
FROM exp e JOIN cand c ON e.obj_value = c.surface_form
WHERE e.pred_value = '{DC}title' AND e.obj_kind = 2""",
    # popularity-weighted linking: in-degree prior over the DISTINCT
    # triple set, ties broken on entity IRI — integer-exact both sides
    "entity_link_ranked": EXP_CTE
    + f""", d AS (SELECT DISTINCT {TERM_COLS} FROM exp),
indeg AS (SELECT obj_value AS node, COUNT(*) AS pop
          FROM d WHERE obj_kind <> 2 GROUP BY obj_value),
cand AS (
  SELECT title AS surface_form,
         'https://kg.example.org/doc/' || doc_id AS entity_iri,
         COALESCE(pop, 0) AS pop
  FROM docs LEFT JOIN indeg
    ON indeg.node = 'https://kg.example.org/doc/' || doc_id),
best AS (
  SELECT surface_form, entity_iri FROM (
    SELECT surface_form, entity_iri,
           ROW_NUMBER() OVER (
             PARTITION BY surface_form ORDER BY pop DESC, entity_iri
           ) AS rn
    FROM cand) WHERE rn = 1)
SELECT DISTINCT e.subj_value, b.entity_iri AS entity_value
FROM d e JOIN best b ON e.obj_value = b.surface_form
WHERE e.pred_value = '{DC}title' AND e.obj_kind = 2""",
    "list_roundtrip": EXP_CTE
    + """SELECT entity AS subj_value, CAST(n AS BIGINT) AS pos,
       string_split(title, ' ')[n] AS word
FROM docs, (SELECT UNNEST([1, 2, 3]) AS n) ns
WHERE len(string_split(title, ' ')) >= n""",
    "container_encode": EXP_CTE
    + f"""SELECT CAST(0 AS BIGINT) AS subj_kind, entity AS subj_value,
       'http://www.w3.org/1999/02/22-rdf-syntax-ns#_' || n AS pred_value,
       CAST(2 AS BIGINT) AS obj_kind, string_split(title, ' ')[n] AS obj_value
FROM docs, (SELECT UNNEST([1, 2, 3]) AS n) ns
WHERE len(string_split(title, ' ')) >= n""",
    # SPARQL SELECT over the deduped KG: the BGP (type/language/site/chars
    # per ?doc) is exactly one row per document; FILTER = the WHERE below;
    # variables render as canonical N-Triples strings.
    "sparql_select_eval": EXP_CTE
    + """SELECT DISTINCT '<' || entity || '>' AS doc,
       '"' || lang || '"' AS lang,
       '<' || site || '>' AS site
FROM docs WHERE n_chars >= 200 AND lang <> 'de'
ORDER BY 1""",
    "sparql_ask_eval": """SELECT 'cites_hub' AS q,
       CAST(EXISTS (SELECT 1 FROM documents) AS BIGINT) AS result
UNION ALL
SELECT 'site_missing' AS q, CAST(0 AS BIGINT) AS result""",
    "sparql_construct_eval": EXP_CTE
    + f"""SELECT * FROM (
  SELECT CAST(0 AS BIGINT) AS subj_kind, site AS subj_value, '' AS subj_lang, '' AS subj_datatype,
         CAST(0 AS BIGINT) AS pred_kind, '{EX}hosts' AS pred_value, '' AS pred_lang, '' AS pred_datatype,
         CAST(0 AS BIGINT) AS obj_kind, entity AS obj_value, '' AS obj_lang, '' AS obj_datatype
  FROM (SELECT DISTINCT site, entity FROM docs)
  UNION ALL
  SELECT CAST(0 AS BIGINT), entity, '', '', CAST(0 AS BIGINT), '{EX}hostedBy', '', '',
         CAST(0 AS BIGINT), site, '', ''
  FROM (SELECT DISTINCT site, entity FROM docs))""",
    # OPTIONAL: typed subjects LEFT JOIN language assertions; mentions
    # (blank-node subjects) have no language → '' (unbound rendering)
    "sparql_optional_eval": EXP_CTE
    + f"""SELECT CASE tt.subj_kind WHEN 0 THEN '<' || tt.subj_value || '>'
            ELSE '_:' || tt.subj_value END AS s,
       '<' || tt.obj_value || '>' AS t,
       COALESCE('"' || l.lang || '"', '') AS l
FROM (SELECT DISTINCT subj_kind, subj_value, obj_value FROM exp
      WHERE pred_value = '{RDF_TYPE}') tt
LEFT JOIN (SELECT DISTINCT subj_value, obj_value AS lang FROM exp
           WHERE pred_value = '{DC}language') l
  ON tt.subj_value = l.subj_value""",
    "sparql_union_eval": EXP_CTE
    + f"""SELECT '<' || entity || '>' AS a, '<' || site || '>' AS b FROM docs
UNION ALL
SELECT '<' || entity || '>' AS a,
       '"' || n_chars || '"^^<{XSD_INT}>' AS b FROM docs""",
    # titles carry the doc's language tag (dc:title branch of EXP)
    "sparql_over_store": EXP_CTE
    + """SELECT '<' || entity || '>' AS doc,
       '"' || title || '"@' || lang AS title
FROM docs""",
    "sparql_groupby_eval": EXP_CTE
    + """SELECT '<' || site || '>' AS site,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS DOUBLE) AS sum_chars,
       CAST(MAX(n_chars) AS DOUBLE) AS max_chars
FROM docs GROUP BY site""",
    # builtin-function filters reduce to lang IN (en, de) on the docs
    # table (every other conjunct is true by construction: langs are
    # 2 chars, entities are IRIs containing /doc/, chars is xsd:integer)
    "sparql_functions_eval": EXP_CTE
    + """SELECT '<' || entity || '>' AS doc, '"' || lang || '"' AS lang
FROM docs WHERE lang IN ('en', 'de')
ORDER BY 1 LIMIT 50 OFFSET 10""",
    "sparql_count_distinct_eval": EXP_CTE
    + """SELECT '<' || site || '>' AS site,
       COUNT(DISTINCT lang) AS n_langs,
       COUNT(*) AS n_docs
FROM docs GROUP BY site""",
    # typed subjects with no dc:language = the skolem mention bnodes
    "sparql_not_exists_eval": EXP_CTE
    + f"""SELECT '_:' || skolem AS s, '<{EX}Mention>' AS t
FROM docs WHERE doc_id % 7 = 0""",
    "sparql_alt_path_eval": EXP_CTE
    + f"""SELECT '<' || entity || '>' AS doc, '<' || site || '>' AS v FROM docs
UNION ALL
SELECT '<' || entity || '>' AS doc,
       '"' || n_chars || '"^^<{XSD_INT}>' AS v FROM docs""",
    # cites edges are hub → doc only, so the transitive closure IS the
    # edge set (set semantics; multi-hop exercised by unit chain graphs)
    "sparql_path_closure_eval": EXP_CTE
    + f"""SELECT DISTINCT '<{HUB}>' AS a, '<' || entity || '>' AS d FROM docs""",
    "sparql_iri_mint_eval": EXP_CTE
    + """SELECT '<' || entity || '>' AS doc,
       '<http://lexvo.example.org/id/' || lang || '>' AS langres
FROM docs""",
    "sparql_or_filter_eval": EXP_CTE
    + """SELECT '<' || entity || '>' AS doc
FROM docs WHERE lang = 'en' OR n_chars >= 400""",
    # fixture langs are bare 2-letter tags, so LANGMATCHES(…,"de") = lang='de'
    "sparql_langmatches_eval": EXP_CTE
    + """SELECT '<' || entity || '>' AS doc,
       '"' || title || '"@' || lang AS t
FROM docs WHERE lang = 'de'""",
    # each doc's chars triple sits in its site's named graph
    "sparql_graph_eval": EXP_CTE
    + """SELECT '<' || site || '>' AS g, COUNT(*) AS n
FROM docs GROUP BY site""",
    "sparql_strafter_eval": EXP_CTE
    + """SELECT '<' || entity || '>' AS doc, '"' || doc_id || '"' AS id
FROM docs""",
    "sparql_numeric_hash_eval": EXP_CTE
    + f"""SELECT '<' || entity || '>' AS doc,
       '"' || CAST(ABS(n_chars - 500) AS VARCHAR) || '"^^<{XSD_INT}>' AS d,
       '"' || md5(CAST(n_chars AS VARCHAR)) || '"' AS h,
       '<http://www.w3.org/1999/02/22-rdf-syntax-ns#langString>' AS dt,
       '"' || lang || '"' AS l
FROM docs""",
    "sparql_results_roundtrip": EXP_CTE
    + """SELECT '<' || entity || '>' AS doc, '"' || lang || '"' AS l
FROM docs""",
    "sparql_select_expr_eval": EXP_CTE
    + f"""SELECT '<' || entity || '>' AS doc,
       '"' || CAST(ABS(n_chars - 500) AS VARCHAR) || '"^^<{XSD_INT}>' AS dist
FROM docs WHERE ABS(n_chars - 500) < 200""",
    "sparql_if_eval": EXP_CTE
    + """SELECT '<' || entity || '>' AS doc,
       '"' || CASE WHEN n_chars >= 300 THEN 'long' ELSE 'short' END || '"' AS size
FROM docs""",
    # cites? from the hub: zero-length (hub itself) + cited docs
    "sparql_path_zero_or_one_eval": EXP_CTE
    + f"""SELECT '<{HUB}>' AS v
UNION ALL
SELECT DISTINCT '<' || entity || '>' AS v FROM docs""",
    # !(type|site|chars) about each doc = its language + lang-tagged title
    "sparql_neg_path_eval": EXP_CTE
    + """SELECT '<' || entity || '>' AS d, '"' || lang || '"' AS o FROM docs
UNION ALL
SELECT '<' || entity || '>' AS d, '"' || title || '"@' || lang AS o FROM docs""",
    # subquery slice: first 100 docs with chars >= 300 by *rendered*
    # IRI ordering (the closing '>' matters: '<…doc/274>' sorts before
    # '<…doc/27>' because '4' < '>'), joined to their site
    "sparql_subquery_eval": EXP_CTE
    + """SELECT '<' || d.entity || '>' AS doc, '<' || d.site || '>' AS site
FROM docs d
JOIN (SELECT entity FROM docs WHERE n_chars >= 300
      ORDER BY '<' || entity || '>' LIMIT 100) s USING (entity)""",
    # aggregate subquery: per-site doc counts join back onto every doc
    # (the count surfaces as an xsd:integer literal term)
    "sparql_agg_subquery_eval": EXP_CTE
    + f"""SELECT '<' || d.entity || '>' AS doc, '<' || d.site || '>' AS site,
       '"' || s.n || '"^^<{XSD_INT}>' AS n
FROM docs d
JOIN (SELECT site, COUNT(*) AS n FROM docs GROUP BY site) s USING (site)
WHERE s.n >= 10""",
    # GROUP_CONCAT order is the engine's documented ascending-lexical
    # rule = string_agg(… ORDER BY lang)
    "sparql_group_concat_eval": EXP_CTE
    + """SELECT '<' || site || '>' AS site,
       string_agg(lang, ',' ORDER BY lang) AS langs
FROM (SELECT DISTINCT site, lang FROM docs) GROUP BY site""",
    "sparql_sum_distinct_eval": EXP_CTE
    + """SELECT '<' || site || '>' AS site,
       CAST(SUM(DISTINCT n_chars) AS DOUBLE) AS sum_c,
       CAST(AVG(DISTINCT n_chars) AS DOUBLE) AS avg_c,
       COUNT(n_chars) AS n
FROM docs GROUP BY site""",
    # cites* from the hub: the zero-length solution (the hub itself)
    # plus the closure (hub → every doc; depth-1 edge set)
    "sparql_path_star_eval": EXP_CTE
    + f"""SELECT '<{HUB}>' AS d
UNION
SELECT DISTINCT '<' || entity || '>' AS d FROM docs""",
    # BIND: c2 = chars*2 rendered as an xsd:integer literal, label =
    # CONCAT(UCASE(lang), "-", STR(doc)) as a plain literal
    "sparql_bind_eval": EXP_CTE
    + f"""SELECT '<' || entity || '>' AS doc,
       '"' || CAST(n_chars * 2 AS VARCHAR) || '"^^<{XSD_INT}>' AS c2,
       '"' || upper(lang) || '-' || entity || '"' AS label
FROM docs WHERE n_chars * 2 >= 400
ORDER BY 1""",
    # !BOUND(?l) after OPTIONAL = typed subjects without a language
    # (the mention bnodes); COALESCE falls back to "none"
    "sparql_bound_filter_eval": EXP_CTE
    + f"""SELECT '_:' || skolem AS s, '<{EX}Mention>' AS t, '"none"' AS l2
FROM docs WHERE doc_id % 7 = 0""",
    "graphstore_patch": EXP_CTE
    + f"""SELECT * FROM (
  SELECT CAST(0 AS BIGINT) AS subj_kind, entity AS subj_value, '' AS subj_lang, '' AS subj_datatype,
         CAST(0 AS BIGINT) AS pred_kind, '{RDF_TYPE}' AS pred_value, '' AS pred_lang, '' AS pred_datatype,
         CAST(0 AS BIGINT) AS obj_kind, '{EX}Document' AS obj_value, '' AS obj_lang, '' AS obj_datatype
  FROM docs WHERE doc_id <> 0
  UNION ALL
  SELECT CAST(0 AS BIGINT), 'https://graphs.example.org/patched', '', '',
         CAST(0 AS BIGINT), '{EX}patchedBy', '', '',
         CAST(2 AS BIGINT), 'sparql-update', '', '')""",
}


def _delta_sql() -> str:
    """kg_delta oracle: re-instantiate the expected-triples CTE body
    twice over two doc filters (old crawl = doc_id%3<>2, recrawl =
    doc_id%3<>0), then the two distinct-set EXCEPTs tagged del/add."""
    body = _EXP_PART.rstrip()
    assert body.endswith(")")
    body = body[:-1]
    return (
        _DOCS_PART
        + "docs_old AS (SELECT * FROM docs WHERE doc_id % 3 <> 2),\n"
        + "docs_new AS (SELECT * FROM docs WHERE doc_id % 3 <> 0),\n"
        + "exp_old AS ("
        + body.replace("FROM docs", "FROM docs_old")
        + "),\nexp_new AS ("
        + body.replace("FROM docs", "FROM docs_new")
        + f"""),
d_old AS (SELECT DISTINCT {TERM_COLS} FROM exp_old),
d_new AS (SELECT DISTINCT {TERM_COLS} FROM exp_new)
SELECT 'del' AS op, * FROM (SELECT * FROM d_old EXCEPT SELECT * FROM d_new)
UNION ALL
SELECT 'add' AS op, * FROM (SELECT * FROM d_new EXCEPT SELECT * FROM d_old)"""
    )


ORACLES["warc_roundtrip"] = ORACLES["dedup_exact"]
ORACLES["sparql_results_tsv_roundtrip"] = ORACLES["sparql_results_roundtrip"]

# Fixture blanks touch no other blanks, so the canonical label is the
# hash of the sorted DISTINCT ground features (direction | predicate |
# NT-rendered neighbour) — the same formula stages/canon.py hashes.
ORACLES["kg_blank_canon"] = EXP_CTE + f""", d AS (SELECT DISTINCT {TERM_COLS} FROM exp),
feats AS (
  SELECT subj_value AS blank,
         'o|' || pred_value || '|' || {_nt_term("obj")} AS feat
  FROM d WHERE subj_kind = 1 AND obj_kind <> 1
  UNION
  SELECT obj_value,
         'i|' || pred_value || '|' || {_nt_term("subj")}
  FROM d WHERE obj_kind = 1 AND subj_kind <> 1
)
SELECT blank, md5(string_agg(feat, chr(10) ORDER BY feat)) AS canon
FROM feats GROUP BY blank"""

ORACLES["kg_fill_rates"] = EXP_CTE + f""", d AS (SELECT DISTINCT {TERM_COLS} FROM exp),
typed AS (
  SELECT DISTINCT subj_value AS s, obj_value AS typ FROM d
  WHERE pred_value = \'{RDF_TYPE}\' AND obj_kind = 0
), props AS (
  SELECT DISTINCT subj_value AS s, pred_value AS p FROM d
), den AS (
  SELECT typ, CAST(COUNT(*) AS BIGINT) AS n_entities FROM typed GROUP BY typ
), pairs AS (
  SELECT t.typ, pr.p, CAST(COUNT(DISTINCT t.s) AS BIGINT) AS n_with
  FROM typed t JOIN props pr ON t.s = pr.s GROUP BY t.typ, pr.p
)
SELECT pairs.typ AS type, pairs.p AS pred, den.n_entities, pairs.n_with,
       ROUND(CAST(pairs.n_with AS DOUBLE) / den.n_entities, 6) AS fill_rate
FROM pairs JOIN den USING (typ)"""

ORACLES["kg_entity_cards"] = EXP_CTE + f""", d AS (SELECT DISTINCT {TERM_COLS} FROM exp),
pc AS (SELECT pred_value AS p, COUNT(*) AS rarity FROM d GROUP BY pred_value),
ranked AS (
  SELECT d.subj_value AS subj, d.pred_value AS pred, d.obj_value AS obj,
         row_number() OVER (PARTITION BY d.subj_value
                            ORDER BY pc.rarity, d.pred_value, d.obj_value)
           AS rank
  FROM d JOIN pc ON pc.p = d.pred_value
)
SELECT subj, CAST(rank AS BIGINT) AS rank, pred, obj
FROM ranked WHERE rank <= 3"""

# DESCRIBE ?doc (typed Document AND lang "fr"): all distinct triples
# whose subject is a matched doc entity
ORACLES["sparql_describe_eval"] = EXP_CTE + f""", d AS (SELECT DISTINCT {TERM_COLS} FROM exp),
m AS (
  SELECT DISTINCT t.subj_value AS s
  FROM d t JOIN d l ON l.subj_value = t.subj_value
  WHERE t.pred_value = \'{RDF_TYPE}\' AND t.obj_value = \'{EX}Document\'
    AND l.pred_value = \'{DC}language\' AND l.obj_kind = 2 AND l.obj_value = \'fr\'
)
SELECT {TERM_COLS} FROM d JOIN m ON d.subj_value = m.s"""

ORACLES["kg_delta"] = _delta_sql()


def _snapshot_sql(keep_filter: str) -> str:
    """Distinct expected triples of one crawl generation (kg_delta_apply
    oracle: applying the delta to the old store must yield exactly the
    recrawl's build)."""
    body = _EXP_PART.rstrip()[:-1]
    return (
        _DOCS_PART
        + f"docs_gen AS (SELECT * FROM docs WHERE {keep_filter}),\n"
        + "exp_gen AS ("
        + body.replace("FROM docs", "FROM docs_gen")
        + f")\nSELECT DISTINCT {TERM_COLS} FROM exp_gen"
    )


ORACLES["kg_delta_apply"] = _snapshot_sql("doc_id % 3 <> 0")

# SHACL-lite validation over the dirtied KG: planted second titles
# (doc_id%11), untyped chars literals (doc_id%13), plus the naturally
# untyped hub subject.  _DIRTY_CTE and the verdict block are shared
# with the kg_build_pipeline oracle below.
_DIRTY_CTE = f""", d AS (SELECT DISTINCT {TERM_COLS} FROM exp),
dirty AS (
  SELECT * FROM d
  UNION ALL
  SELECT subj_kind, subj_value, subj_lang, subj_datatype,
         pred_kind, pred_value, pred_lang, pred_datatype,
         obj_kind, obj_value || '!', obj_lang, obj_datatype
  FROM d JOIN docs ON subj_value = entity
  WHERE pred_value = '{DC}title' AND doc_id % 11 = 0
  UNION ALL
  SELECT subj_kind, subj_value, subj_lang, subj_datatype,
         pred_kind, pred_value, pred_lang, pred_datatype,
         obj_kind, obj_value, obj_lang, ''
  FROM d JOIN docs ON subj_value = entity
  WHERE pred_value = '{EX}chars' AND doc_id % 13 = 0
)"""

_VERDICTS_SQL = f"""SELECT 'functional:{DC}title' AS shape, subj_value
FROM dirty WHERE pred_value = '{DC}title'
GROUP BY subj_value HAVING COUNT(DISTINCT obj_value) > 1
UNION ALL
SELECT 'required:rdf-type', subj_value FROM (
  SELECT subj_value,
         MAX(CASE WHEN pred_value = '{RDF_TYPE}' THEN 1 ELSE 0 END) AS has_type
  FROM dirty WHERE subj_kind = 0 GROUP BY subj_value
) WHERE has_type = 0
UNION ALL
SELECT DISTINCT 'datatype:{EX}chars', subj_value
FROM dirty
WHERE pred_value = '{EX}chars' AND obj_kind = 2
  AND obj_datatype <> 'http://www.w3.org/2001/XMLSchema#integer'"""

ORACLES["kg_shacl_validate"] = EXP_CTE + _DIRTY_CTE + "\n" + _VERDICTS_SQL

# KG-embedding prep: dense sorted-order ids over entities (subjects +
# non-literal objects) and relations; (h,r,t) for the edge triples.
ORACLES["kg_triple_ids"] = EXP_CTE + f""", d AS (SELECT DISTINCT {TERM_COLS} FROM exp),
e AS (SELECT subj_value, pred_value, obj_value FROM d WHERE obj_kind <> 2),
ent AS (
  SELECT t, ROW_NUMBER() OVER (ORDER BY t) - 1 AS id FROM (
    SELECT subj_value AS t FROM e UNION SELECT obj_value FROM e)
),
rel AS (
  SELECT t, ROW_NUMBER() OVER (ORDER BY t) - 1 AS id FROM (
    SELECT DISTINCT pred_value AS t FROM e)
)
SELECT h.id AS h_id, r.id AS r_id, t.id AS t_id
FROM e JOIN ent h ON e.subj_value = h.t
       JOIN rel r ON e.pred_value = r.t
       JOIN ent t ON e.obj_value = t.t"""

# Negative sampling over the dense-id edges: md5-keyed tail corruption
# (same hex-prefix-to-UBIGINT idiom as the fingerprint oracle).
ORACLES["kg_edge_negatives"] = EXP_CTE + f""", d AS (SELECT DISTINCT {TERM_COLS} FROM exp),
e AS (SELECT subj_value, pred_value, obj_value FROM d WHERE obj_kind <> 2),
ent AS (
  SELECT t, ROW_NUMBER() OVER (ORDER BY t) - 1 AS id FROM (
    SELECT subj_value AS t FROM e UNION SELECT obj_value FROM e)
),
rel AS (
  SELECT t, ROW_NUMBER() OVER (ORDER BY t) - 1 AS id FROM (
    SELECT DISTINCT pred_value AS t FROM e)
),
ids AS (
  SELECT h.id AS h_id, r.id AS r_id, t.id AS t_id
  FROM e JOIN ent h ON e.subj_value = h.t
         JOIN rel r ON e.pred_value = r.t
         JOIN ent t ON e.obj_value = t.t
),
nn AS (SELECT COUNT(*) AS n FROM ent)
SELECT h_id, r_id, t_id,
       CAST((t_id + 1 + CAST(('0x' || substr(md5(
               CAST(h_id AS VARCHAR) || ':' || CAST(r_id AS VARCHAR) || ':'
               || CAST(t_id AS VARCHAR)), 1, 16)) AS UBIGINT) % (n - 1)) % n
            AS BIGINT) AS neg_t_id
FROM ids, nn"""

# N-Quads round-trip: each page's distinct triples in the page-url
# named graph; the quad columns survive the serialize/parse cycle.
ORACLES["nquads_roundtrip"] = (
    EXP_URL_CTE + f"SELECT DISTINCT url AS graph_value, {TERM_COLS} FROM exp"
)
ORACLES["trig_roundtrip"] = ORACLES["nquads_roundtrip"]


def _qa_pairs_sql(src: str) -> str:
    """QA-report metric block over a triples CTE named ``src``:
    distinct (metric, value) pairs counted per metric (chr(31) joins
    mirror the Ray side's \\x1f separator)."""
    j = " || chr(31) || "
    full = j.join(
        f"CAST({c.strip()} AS VARCHAR)"
        for c in TERM_COLS.replace("\n", " ").split(",")
    )
    subj = f"CAST(subj_kind AS VARCHAR){j}subj_value"
    lit = f"obj_value{j}obj_lang{j}obj_datatype"
    return f""",
pairs AS (
  SELECT DISTINCT * FROM (
    SELECT 'n_triples' AS metric, {full} AS value FROM {src}
    UNION ALL SELECT 'n_subjects', {subj} FROM {src}
    UNION ALL SELECT 'n_predicates', pred_value FROM {src}
    UNION ALL SELECT 'n_iri_entities', subj_value FROM {src} WHERE subj_kind = 0
    UNION ALL SELECT 'n_iri_entities', obj_value FROM {src} WHERE obj_kind = 0
    UNION ALL SELECT 'n_bnodes', subj_value FROM {src} WHERE subj_kind = 1
    UNION ALL SELECT 'n_bnodes', obj_value FROM {src} WHERE obj_kind = 1
    UNION ALL SELECT 'n_literals', {lit} FROM {src} WHERE obj_kind = 2
    UNION ALL SELECT 'n_lang_literals', {lit} FROM {src} WHERE obj_kind = 2 AND obj_lang <> ''
    UNION ALL SELECT 'n_typed_literals', {lit} FROM {src} WHERE obj_kind = 2 AND obj_datatype <> ''
    UNION ALL SELECT 'n_typed_subjects', {subj} FROM {src} WHERE pred_value = '{RDF_TYPE}'
    UNION ALL SELECT 'n_classes', obj_value FROM {src} WHERE pred_value = '{RDF_TYPE}'
  )
)
SELECT metric, CAST(COUNT(*) AS BIGINT) AS n FROM pairs GROUP BY metric"""


ORACLES["kg_qa_report"] = (
    EXP_CTE
    + f", d AS (SELECT DISTINCT {TERM_COLS} FROM exp)"
    + _qa_pairs_sql("d")
)

# Composed KG-build flagship: dirty build -> validation verdicts ->
# quarantine every violating subject -> QA report of the published
# graph (same dirty/verdict blocks as kg_shacl_validate).
ORACLES["kg_build_pipeline"] = (
    EXP_CTE
    + _DIRTY_CTE
    + f""",
viol AS (SELECT DISTINCT subj_value FROM ({_VERDICTS_SQL})),
clean AS (
  SELECT * FROM dirty
  WHERE subj_value NOT IN (SELECT subj_value FROM viol)
)"""
    + _qa_pairs_sql("clean")
)

# ER blocking: cross-namespace candidate pairs via exact-title join
# (title collisions across docs intentionally produce extra pairs).
ORACLES["kg_er_candidates"] = EXP_CTE + """, t AS (SELECT entity, title FROM docs)
SELECT a.entity AS src,
       replace(b.entity, 'https://kg.example.org/doc/',
               'https://kb.example.org/entity/') AS dst
FROM t a JOIN t b ON a.title = b.title"""

# Property-graph export: one wide attribute row per Document entity
# (validates extraction + pivot end-to-end against the docs relation).
ORACLES["kg_node_table"] = EXP_CTE + f"""SELECT entity,
       '{EX}Document' AS type, title, lang, site,
       CAST(n_chars AS BIGINT) AS n_chars
FROM docs"""

# k-hop neighborhood sampling: 2 hops, fanout 3, md5-ranked neighbor
# choice over the undirected distinct link graph, seeds = doc_id%10==0.
ORACLES["kg_khop_sample"] = EXP_CTE + f""", d AS (SELECT DISTINCT {TERM_COLS} FROM exp),
e0 AS (SELECT DISTINCT subj_value AS src, obj_value AS dst FROM d WHERE obj_kind <> 2),
e AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
seeds AS (SELECT 'https://kg.example.org/doc/' || doc_id AS seed
          FROM documents WHERE doc_id % 10 = 0),
h1 AS (
  SELECT s.seed, e.dst AS node FROM seeds s JOIN e ON e.src = s.seed
  QUALIFY ROW_NUMBER() OVER (
    PARTITION BY s.seed ORDER BY md5(s.seed || ':' || e.dst)) <= 3
),
h2 AS (
  SELECT h1.seed, e.dst AS node FROM h1 JOIN e ON e.src = h1.node
  QUALIFY ROW_NUMBER() OVER (
    PARTITION BY h1.seed, h1.node ORDER BY md5(h1.node || ':' || e.dst)) <= 3
)
SELECT seed, node, MIN(hop) AS hop FROM (
  SELECT seed, node, CAST(1 AS BIGINT) AS hop FROM h1
  UNION ALL
  SELECT seed, node, 2 FROM h2
) WHERE node <> seed GROUP BY seed, node"""

# CSR-style adjacency export: sorted neighbor list + out-degree.
ORACLES["kg_adjacency"] = EXP_CTE + f""", d AS (SELECT DISTINCT {TERM_COLS} FROM exp),
e AS (SELECT DISTINCT subj_value AS src, obj_value AS dst FROM d WHERE obj_kind <> 2)
SELECT src AS node, string_agg(dst, ',' ORDER BY dst) AS neighbors,
       CAST(COUNT(*) AS BIGINT) AS out_degree
FROM e GROUP BY src"""

# DeepWalk corpus: 2 walks x 3 steps, md5-keyed deterministic choice.
def _walks_sql(walk_len: int = 3) -> str:
    sql = EXP_CTE + f""", d AS (SELECT DISTINCT {TERM_COLS} FROM exp),
e0 AS (SELECT DISTINCT subj_value AS src, obj_value AS dst FROM d WHERE obj_kind <> 2),
e AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
seeds AS (SELECT 'https://kg.example.org/doc/' || doc_id AS seed
          FROM documents WHERE doc_id % 10 = 0),
w0 AS (SELECT seed, CAST(w.walk AS BIGINT) AS walk, seed AS node
       FROM seeds CROSS JOIN (VALUES (0), (1)) w(walk))"""
    for step in range(1, walk_len + 1):
        prev = f"w{step - 1}"
        sql += f""",
w{step} AS (
  SELECT {prev}.seed, {prev}.walk, e.dst AS node
  FROM {prev} JOIN e ON e.src = {prev}.node
  QUALIFY ROW_NUMBER() OVER (
    PARTITION BY {prev}.seed, {prev}.walk
    ORDER BY md5({prev}.node || ':' || {prev}.seed || ':'
                 || CAST({prev}.walk AS VARCHAR) || ':{step}:' || e.dst)) = 1
)"""
    selects = [
        f"SELECT seed, walk, CAST({s} AS BIGINT) AS step, node FROM w{s}"
        for s in range(walk_len + 1)
    ]
    return sql + "\n" + "\nUNION ALL\n".join(selects)


ORACLES["kg_random_walks"] = _walks_sql(3)

# Degree assortativity: exact-integer moments, one double division.
ORACLES["kg_assortativity"] = EXP_CTE + f""", d AS (SELECT DISTINCT {TERM_COLS} FROM exp),
e0 AS (SELECT DISTINCT subj_value AS src, obj_value AS dst
       FROM d WHERE obj_kind <> 2 AND subj_value <> obj_value),
eu AS (SELECT src AS a, dst AS b FROM e0 UNION SELECT dst, src FROM e0),
deg AS (SELECT a AS node, COUNT(*) AS dg FROM eu GROUP BY a),
j AS (SELECT d1.dg AS du, d2.dg AS dv
      FROM eu JOIN deg d1 ON d1.node = eu.a JOIN deg d2 ON d2.node = eu.b),
mo AS (SELECT COUNT(*) AS m, SUM(du) AS sdu, SUM(dv) AS sdv,
              SUM(du * dv) AS sdudv, SUM(du * du) AS sdu2,
              SUM(dv * dv) AS sdv2
       FROM j)
SELECT ROUND(
  CAST(m * sdudv - sdu * sdv AS DOUBLE)
  / (sqrt(CAST(m * sdu2 - sdu * sdu AS DOUBLE))
     * sqrt(CAST(m * sdv2 - sdv * sdv AS DOUBLE))), 6) AS assortativity
FROM mo"""

# DeepWalk skip-gram pairs: walk self-join within the ±2 step window.
ORACLES["kg_walk_pairs"] = (
    "WITH w AS (" + _walks_sql(3) + """)
SELECT w1.node AS center, w2.node AS context, CAST(COUNT(*) AS BIGINT) AS n_pairs
FROM w w1 JOIN w w2
  ON w1.seed = w2.seed AND w1.walk = w2.walk
 AND w1.step <> w2.step AND abs(w1.step - w2.step) <= 2
GROUP BY w1.node, w2.node"""
)

# Property-graph edge export: distinct (src, label, dst).
ORACLES["kg_edge_table"] = EXP_CTE + f""", d AS (SELECT DISTINCT {TERM_COLS} FROM exp)
SELECT DISTINCT subj_value AS src, pred_value AS label, obj_value AS dst
FROM d WHERE obj_kind <> 2"""

# M3: Graph.Get/GetAll/HasSubject point lookups for three fixed entities.
ORACLES["point_lookups"] = EXP_CTE + """SELECT entity AS subj_value, title,
       CAST(n_chars AS BIGINT) AS chars_int, CAST(1 AS BIGINT) AS has_subject
FROM docs WHERE doc_id IN (0, 1, 2)"""

# J2: distributed cons-list walk == the in-batch list round-trip's output.
ORACLES["list_walk_grouped"] = EXP_CTE + """SELECT entity AS subj_value,
       CAST(n AS BIGINT) AS pos, string_split(title, ' ')[n] AS word
FROM docs, (SELECT UNNEST([1, 2, 3]) AS n) ns
WHERE len(string_split(title, ' ')) >= n"""

# S5: split-serialize-reread fan-in recovers the distinct extraction.
ORACLES["multi_source_fanin"] = EXP_CTE + f"SELECT DISTINCT {TERM_COLS} FROM exp"
# S5+ URL-source fan-in recovers the same distinct set
ORACLES["url_source_fanin"] = EXP_CTE + f"SELECT DISTINCT {TERM_COLS} FROM exp"

# T1: warmed+persisted+reloaded prefix cache, broadcast into expansion.
ORACLES["prefix_cache_expand"] = """SELECT lower(n_name) AS prefix,
       'https://ns.example.org/' || lower(n_name) || '/thing' AS iri,
       'http://www.w3.org/1999/02/22-rdf-syntax-ns#' AS rdf_uri,
       '' AS miss
FROM nation"""

# M12: two stacked PREFIX decls trimmed into the session map.
ORACLES["repl_prefix_trim"] = """SELECT doc_id,
       'SELECT ?x # ' || lang AS rest,
       'https://docs.example.org/' || source || '/' || doc_id AS page_uri,
       'https://kg.example.org/doc/' || doc_id AS entity_uri
FROM documents"""


# type co-occurrence over the RDFS-INFERRED graph (reuses its oracle
# as a CTE so the two can never drift)
ORACLES["kg_type_cooccur"] = (
    "WITH inf AS ("
    + ORACLES["kg_rdfs_infer"]
    + f"""),
ty AS (SELECT DISTINCT subj_value AS s, obj_value AS t FROM inf
       WHERE pred_value = '{RDF_TYPE}')
SELECT a.t AS type_a, b.t AS type_b, CAST(COUNT(*) AS BIGINT) AS n_entities
FROM ty a JOIN ty b ON a.s = b.s AND a.t < b.t
GROUP BY a.t, b.t"""
)


# reification encode->decode is the identity on the deduped graph
ORACLES["kg_reify_roundtrip"] = ORACLES["dedup_exact"]

# WET conversion records round-trip to the pages projection exactly
ORACLES["wet_roundtrip"] = """SELECT
  'https://docs.example.org/' || source || '/' || doc_id AS url,
  TIMESTAMP '2024-01-01 00:00:00' + to_microseconds(doc_id * 1000000) AS warc_ts,
  array_to_string(string_split(text, ' ')[1:5], ' ')
    || ' ' || array_to_string(string_split(text, ' ')[1:5], ' ')
    || ' site hub' AS text
FROM documents"""

# CONSTRUCT template-bnode mint: md5 skolemization over the solution's
# bound terms in sorted-variable order ((doc, l) here), 8 fields
# joined by chr(31), label-prefixed with chr(30)
ORACLES["sparql_construct_bnode_eval"] = EXP_CTE + f"""
, sol AS (
  SELECT DISTINCT entity, lang,
         'tplm' || substr(md5('m' || chr(30) ||
           '0' || chr(31) || entity || chr(31) || chr(31) || chr(31) ||
           '2' || chr(31) || lang || chr(31) || chr(31)), 1, 16) AS mint
  FROM docs
)
SELECT CAST(1 AS BIGINT) AS subj_kind, mint AS subj_value, '' AS subj_lang, '' AS subj_datatype,
       CAST(0 AS BIGINT) AS pred_kind, '{EX}mentionOf' AS pred_value, '' AS pred_lang, '' AS pred_datatype,
       CAST(0 AS BIGINT) AS obj_kind, entity AS obj_value, '' AS obj_lang, '' AS obj_datatype
FROM sol
UNION ALL
SELECT 1, mint, '', '', 0, '{EX}inLang', '', '', 2, lang, '', ''
FROM sol"""

ORACLES["warc_status_gate"] = """SELECT
  'https://docs.example.org/' || source || '/' || doc_id AS url
FROM documents WHERE doc_id % 13 NOT IN (1, 2, 3)"""

# OPTIONAL-scoped BIND: tag bound only where the optional matched
ORACLES["sparql_optional_bind_eval"] = EXP_CTE + f"""SELECT
  CASE tt.subj_kind WHEN 0 THEN '<' || tt.subj_value || '>'
       ELSE '_:' || tt.subj_value END AS s,
  COALESCE('"lang-' || l.lang || '"', '') AS tag
FROM (SELECT DISTINCT subj_kind, subj_value FROM exp
      WHERE pred_value = '{RDF_TYPE}') tt
LEFT JOIN (SELECT DISTINCT subj_value, obj_value AS lang FROM exp
           WHERE pred_value = '{DC}language') l
  ON tt.subj_value = l.subj_value"""

ORACLES["nt_gz_roundtrip"] = ORACLES["dedup_exact"]


def _closeness_sql(iters: int = 4, unreached: int = 1_000_000, n_landmarks: int = 3) -> str:
    """Landmark closeness: one BFS pyramid per landmark (docs 0..L-1),
    distances capped at iters+1, summed per node — integer-exact."""
    cap = iters + 1
    sql = EXP_CTE + f""", d AS MATERIALIZED (SELECT DISTINCT {TERM_COLS} FROM exp),
e AS MATERIALIZED (SELECT DISTINCT subj_value AS src, obj_value AS dst FROM d WHERE obj_kind <> 2),
eu AS MATERIALIZED (SELECT src, dst FROM e UNION SELECT dst, src FROM e),
nodes AS MATERIALIZED (SELECT src AS node FROM e UNION SELECT dst FROM e)"""
    for li in range(n_landmarks):
        seed = f"'https://kg.example.org/doc/{li}'"
        sql += f""",
l{li}d0 AS MATERIALIZED (
  SELECT node, CASE WHEN node = {seed} THEN 0 ELSE {unreached} END AS dist
  FROM nodes
)"""
        for i in range(1, iters + 1):
            sql += f""",
l{li}d{i} AS MATERIALIZED (
  SELECT n.node,
         LEAST(dp.dist, COALESCE(MIN(de.dist + 1), {unreached})) AS dist
  FROM nodes n
  JOIN l{li}d{i - 1} dp ON dp.node = n.node
  LEFT JOIN eu ON eu.dst = n.node
  LEFT JOIN l{li}d{i - 1} de ON de.node = eu.src
  GROUP BY n.node, dp.dist
)"""
    total = " + ".join(f"LEAST(l{li}.dist, {cap})" for li in range(n_landmarks))
    joins = " ".join(
        f"JOIN l{li}d{iters} l{li} ON l{li}.node = n.node"
        for li in range(n_landmarks)
    )
    return sql + f"""
SELECT n.node, CAST({total} AS BIGINT) AS total_dist
FROM nodes n {joins}"""


ORACLES["kg_landmark_closeness"] = _closeness_sql(4)

ORACLES["kg_prov_export"] = """WITH p AS (
  SELECT doc_id % 4 AS pid, COUNT(*) AS n FROM documents GROUP BY doc_id % 4
), t AS (
  SELECT 'https://kg.example.org/run/part/' || pid AS s,
         'http://www.w3.org/1999/02/22-rdf-syntax-ns#type' AS pr,
         CAST(0 AS BIGINT) AS ok, 'http://www.w3.org/ns/prov#Activity' AS o,
         '' AS ol, '' AS od
  FROM p
  UNION ALL
  SELECT 'https://kg.example.org/run/shard/' || pid,
         'http://www.w3.org/1999/02/22-rdf-syntax-ns#type', 0,
         'http://www.w3.org/ns/prov#Entity', '', '' FROM p
  UNION ALL
  SELECT 'https://kg.example.org/run/shard/' || pid,
         'http://www.w3.org/ns/prov#wasGeneratedBy', 0,
         'https://kg.example.org/run/part/' || pid, '', '' FROM p
  UNION ALL
  SELECT 'https://kg.example.org/run/part/' || pid,
         'https://kg.example.org/run/documents', 2,
         CAST(n AS VARCHAR), '', 'http://www.w3.org/2001/XMLSchema#integer'
  FROM p
)
SELECT CAST(0 AS BIGINT) AS subj_kind, s AS subj_value, '' AS subj_lang, '' AS subj_datatype,
       CAST(0 AS BIGINT) AS pred_kind, pr AS pred_value, '' AS pred_lang, '' AS pred_datatype,
       ok AS obj_kind, o AS obj_value, ol AS obj_lang, od AS obj_datatype
FROM t"""

ORACLES["sparql_over_prov"] = """WITH p AS (
  SELECT doc_id % 4 AS pid, COUNT(*) AS n FROM documents GROUP BY doc_id % 4
)
SELECT '<https://kg.example.org/run/shard/' || pid || '>' AS shard,
       '<https://kg.example.org/run/part/' || pid || '>' AS activity,
       '"' || n || '"^^<http://www.w3.org/2001/XMLSchema#integer>' AS n
FROM p"""

# nested OPTIONAL: title joins inside the language group
ORACLES["sparql_nested_optional_eval"] = EXP_CTE + f"""SELECT
  CASE tt.subj_kind WHEN 0 THEN '<' || tt.subj_value || '>'
       ELSE '_:' || tt.subj_value END AS s,
  COALESCE('"' || l.lang || '"', '') AS l,
  COALESCE('"' || t.title || '"@' || t.tl, '') AS ttl
FROM (SELECT DISTINCT subj_kind, subj_value FROM exp
      WHERE pred_value = '{RDF_TYPE}') tt
LEFT JOIN (SELECT DISTINCT subj_value, obj_value AS lang FROM exp
           WHERE pred_value = '{DC}language') l
  ON tt.subj_value = l.subj_value
LEFT JOIN (SELECT DISTINCT subj_value, obj_value AS title, obj_lang AS tl
           FROM exp WHERE pred_value = '{DC}title') t
  ON tt.subj_value = t.subj_value AND l.subj_value IS NOT NULL"""


# incremental update must equal the full gen-1 graph: EXP with the
# recrawl's language mutation
_MUT_EXP_CTE = EXP_CTE.replace(
    "SELECT doc_id, text, lang, source, n_chars,",
    "SELECT doc_id, text, "
    "CASE WHEN doc_id % 4 = 0 THEN 'xx' ELSE lang END AS lang, "
    "source, n_chars,",
)
assert _MUT_EXP_CTE != EXP_CTE
ORACLES["kg_incremental_update"] = (
    _MUT_EXP_CTE + f"SELECT DISTINCT {TERM_COLS} FROM exp"
)

ORACLES["sparql_count_distinct_star_eval"] = EXP_CTE + """SELECT
  '"' || l.lang || '"' AS l, CAST(COUNT(*) AS BIGINT) AS n
FROM (SELECT DISTINCT subj_value, obj_value AS lang FROM exp
      WHERE pred_value = 'http://purl.org/dc/elements/1.1/language') l
JOIN (SELECT DISTINCT subj_value, obj_value AS site FROM exp
      WHERE pred_value = 'http://example.org/ns#site') s
  ON s.subj_value = l.subj_value
GROUP BY l.lang"""

# mixed alternative p|^q: each doc reaches its language literal
# forward and its citing hub through the reverse member
ORACLES["sparql_alt_rev_path_eval"] = """SELECT
  '<https://kg.example.org/doc/' || doc_id || '>' AS d,
  '"' || lang || '"' AS x
FROM documents
UNION ALL
SELECT '<https://kg.example.org/doc/' || doc_id || '>',
  '<https://hub.example.org/>'
FROM documents"""

# reverse-member negated set: each typed entity reaches its citing hub
ORACLES["sparql_neg_rev_path_eval"] = """SELECT
  '<https://kg.example.org/doc/' || doc_id || '>' AS e,
  '<https://hub.example.org/>' AS x
FROM documents"""

# pattern-based patch: site facts kept, hostedOn derived, languages
# deleted — flattened distinct triples
ORACLES["graphstore_patch_where"] = """SELECT
  CAST(0 AS BIGINT) AS subj_kind,
  'https://kg.example.org/doc/' || doc_id AS subj_value,
  '' AS subj_lang, '' AS subj_datatype,
  CAST(0 AS BIGINT) AS pred_kind, p AS pred_value,
  '' AS pred_lang, '' AS pred_datatype,
  CAST(0 AS BIGINT) AS obj_kind,
  'https://site' || (doc_id % 5) || '.example.org/' AS obj_value,
  '' AS obj_lang, '' AS obj_datatype
FROM documents,
     (SELECT 'http://example.org/ns#site' AS p
      UNION ALL SELECT 'http://example.org/ns#hostedOn')"""

# graph management end-state: C = en ∪ fr, D = fr (A dropped, B moved)
ORACLES["graphstore_manage"] = """SELECT 'C' AS g,
  'https://kg.example.org/doc/' || doc_id AS s
FROM documents WHERE lang IN ('en', 'fr')
UNION ALL
SELECT 'D', 'https://kg.example.org/doc/' || doc_id
FROM documents WHERE lang = 'fr'"""

# planted 4-cycles: scc = lexicographic min member; tails singleton
ORACLES["kg_scc"] = """WITH g AS (
  SELECT doc_id, doc_id - doc_id % 4 AS grp FROM documents
), m AS (
  SELECT grp, MIN('https://kg.example.org/doc/' || doc_id) AS scc
  FROM g GROUP BY grp
)
SELECT 'https://kg.example.org/doc/' || g.doc_id AS node, m.scc AS scc_id
FROM g JOIN m ON g.grp = m.grp
UNION ALL
SELECT 'https://kg.example.org/x/' || doc_id,
       'https://kg.example.org/x/' || doc_id
FROM documents WHERE doc_id % 32 = 0"""

# VALUES joined against the language BGP: data-driven filter rows
ORACLES["sparql_values_eval"] = """SELECT
  '<https://kg.example.org/doc/' || doc_id || '>' AS doc,
  '"' || lang || '"' AS l
FROM documents WHERE lang IN ('en', 'fr')"""

# MINUS removes everything with a language — Mention bnodes survive
ORACLES["sparql_minus_eval"] = """SELECT
  '_:anon' || substr(md5('https://docs.example.org/' || source || '/'
      || doc_id || '#0'), 1, 16) AS s,
  '<http://example.org/ns#Mention>' AS t
FROM documents WHERE doc_id % 7 = 0"""

# HAVING: languages asserted on more than 75 (deduped) documents
ORACLES["sparql_having_eval"] = """SELECT
  '"' || lang || '"' AS l, CAST(COUNT(*) AS BIGINT) AS n
FROM documents GROUP BY lang HAVING COUNT(*) > 75"""

# sequence path hub→doc→site keeps per-doc multiplicity
ORACLES["sparql_seq_path_eval"] = """SELECT
  '<https://site' || (doc_id % 5) || '.example.org/>' AS site
FROM documents"""

# Gini over undirected KG degrees — exact integer sums, shared finish
ORACLES["kg_degree_gini"] = EXP_CTE + f""", d AS MATERIALIZED (
  SELECT DISTINCT {TERM_COLS} FROM exp
), e0 AS MATERIALIZED (
  SELECT DISTINCT subj_value AS src, obj_value AS dst
  FROM d WHERE obj_kind <> 2
), both_dir AS (
  SELECT src AS node FROM e0 UNION ALL SELECT dst FROM e0
), deg AS (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS degree
  FROM both_dir GROUP BY node
), r AS (
  SELECT degree, ROW_NUMBER() OVER (ORDER BY degree, node) AS rnk FROM deg
)
SELECT ROUND(2.0 * SUM(rnk * degree) / (COUNT(*) * SUM(degree))
             - (COUNT(*) + 1.0) / COUNT(*), 6) AS gini_degree,
       CAST(COUNT(*) AS BIGINT) AS n_nodes,
       CAST(SUM(degree) AS BIGINT) AS n_degree_sum
FROM r"""

# 1-WL refinement: color = md5(deg || '|' || sorted neighbor degs)
ORACLES["kg_wl_colors"] = EXP_CTE + f""", d AS MATERIALIZED (
  SELECT DISTINCT {TERM_COLS} FROM exp
), e0 AS MATERIALIZED (
  SELECT DISTINCT subj_value AS src, obj_value AS dst
  FROM d WHERE obj_kind <> 2
), e AS MATERIALIZED (
  SELECT src AS u, dst AS v FROM e0 UNION SELECT dst, src FROM e0
), deg AS MATERIALIZED (
  SELECT u AS node, CAST(COUNT(*) AS VARCHAR) AS lab FROM e GROUP BY u
)
SELECT n.node, md5(n.lab || '|' || string_agg(dn.lab, ',' ORDER BY dn.lab))
         AS wl_color
FROM deg n JOIN e ON e.u = n.node JOIN deg dn ON dn.node = e.v
GROUP BY n.node, n.lab"""

# federation + numeric filter + GROUP BY: per-language counts of
# docs whose endpoint token count exceeds 26
ORACLES["sparql_service_agg_eval"] = """SELECT
  '"' || lang || '"' AS l, CAST(COUNT(*) AS BIGINT) AS n
FROM documents
WHERE len(string_split(text, ' ')) > 26
GROUP BY lang"""

# top-3 sites by doc count through the aggregate ORDER BY path
ORACLES["sparql_orderby_agg_eval"] = """SELECT
  '<https://site' || s || '.example.org/>' AS site,
  CAST(n AS BIGINT) AS n
FROM (
  SELECT doc_id % 5 AS s, COUNT(*) AS n FROM documents GROUP BY doc_id % 5
  ORDER BY n DESC, s ASC LIMIT 3
)"""

# SERVICE federation: local languages joined with endpoint token counts
ORACLES["sparql_service_eval"] = """SELECT
  '<https://kg.example.org/doc/' || doc_id || '>' AS doc,
  '"' || lang || '"' AS l,
  '"' || len(string_split(text, ' '))
      || '"^^<http://www.w3.org/2001/XMLSchema#integer>' AS n
FROM documents"""

# positive FILTER EXISTS: Documents survive, Mentions drop
ORACLES["sparql_exists_eval"] = """SELECT
  '<https://kg.example.org/doc/' || doc_id || '>' AS s,
  '<http://example.org/ns#Document>' AS t
FROM documents"""

# ORDER BY DESC(numeric literal) + LIMIT: ten longest docs, numeric
# value order (not lexicographic), doc IRI rendering as tie-break
ORACLES["sparql_orderby_eval"] = """SELECT
  '<https://kg.example.org/doc/' || doc_id || '>' AS doc,
  '"' || n_chars || '"^^<http://www.w3.org/2001/XMLSchema#integer>' AS c
FROM documents
ORDER BY n_chars DESC, doc ASC LIMIT 10"""

"""Crawl-hygiene operators: rel=canonical clustering, meta-robots
gate, soft-404 detection, mojibake repair, CCNet surprisal buckets."""

import pyarrow as pa
import pytest

from argo_ray.functions.encoding import repair_mojibake_batch, repair_text
from argo_ray.functions.weblinks import extract_canonical_batch


def _pages(urls, htmls, texts=None):
    cols = {
        "url": pa.array(urls, pa.string()),
        "html": pa.array([h.encode() for h in htmls], pa.binary()),
    }
    if texts is not None:
        cols["text"] = pa.array(texts, pa.string())
    return pa.table(cols)


def test_extract_canonical_declared_and_default():
    b = _pages(
        ["https://a.example/1", "https://a.example/2"],
        [
            '<html><head><link rel="canonical" href="https://a.example/c"/></head></html>',
            "<html><head><title>no link</title></head></html>",
        ],
    )
    out = extract_canonical_batch(b)
    assert out["canonical"].to_pylist() == [
        "https://a.example/c",  # declared
        "https://a.example/2",  # self-canonical default
    ]


def test_canonical_clusters_groups(ray_session):
    import ray.data as rd

    from argo_ray.functions.weblinks import canonical_clusters

    b = _pages(
        [f"https://a.example/{i}" for i in range(4)],
        [
            '<link rel="canonical" href="https://a.example/c"/>',
            '<link rel="canonical" href="https://a.example/c"/>',
            '<link rel="canonical" href="https://a.example/c"/>',
            "<html>self</html>",
        ],
    )
    out = canonical_clusters(rd.from_arrow(b)).to_pandas()
    out = out.sort_values("canonical").reset_index(drop=True)
    assert out["canonical"].tolist() == [
        "https://a.example/3",
        "https://a.example/c",
    ]
    assert out["n_pages"].tolist() == [1, 3]
    # representative = lexicographic min member
    assert out["rep_url"].tolist() == [
        "https://a.example/3",
        "https://a.example/0",
    ]


def test_meta_robots_directive_parsing(ray_session):
    import ray.data as rd

    from argo_ray.functions.weblinks import meta_robots_flags

    b = _pages(
        [f"u{i}" for i in range(4)],
        [
            '<meta name="robots" content="noindex, nofollow"/>',
            '<meta name="robots" content="nofollow"/>',
            '<meta name="robots" content="index, follow"/>',
            "<html>no meta tag</html>",
        ],
    )
    out = meta_robots_flags(rd.from_arrow(b)).to_pandas().set_index("url")
    assert not out.loc["u0", "indexable"] and not out.loc["u0", "followable"]
    assert out.loc["u1", "indexable"] and not out.loc["u1", "followable"]
    assert out.loc["u2", "indexable"] and out.loc["u2", "followable"]
    assert out.loc["u3", "indexable"] and out.loc["u3", "followable"]


def test_soft404_needs_phrase_and_short(ray_session):
    import ray.data as rd

    from argo_ray.functions.weblinks import soft404_flags

    filler = " ".join(["word"] * 30)
    b = _pages(
        ["hit", "long", "nophrase"],
        ["<html/>"] * 3,
        [
            "Page not found error 404",
            f"this essay about error 404 pages goes on {filler}",
            "short but perfectly fine page",
        ],
    )
    out = soft404_flags(rd.from_arrow(b)).to_pandas()
    assert out["url"].tolist() == ["hit"]


@pytest.mark.parametrize(
    "s,fixed,flag",
    [
        ("cafÃ©", "café", True),  # classic utf8-as-latin1
        ("cafÃ\x83Â©", "café", True),  # DOUBLY encoded: fixpoint peels both
        ("café №", "café №", False),  # genuine unicode: encode fails
        ("plain ascii", "plain ascii", False),  # roundtrip is identity
        ("", "", False),
    ],
)
def test_repair_text_roundtrip(s, fixed, flag):
    assert repair_text(s) == (fixed, flag)


def test_repair_mojibake_batch_idempotent():
    corrupted = "cafÃ© early"
    b = pa.table(
        {
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": pa.array([corrupted, "clean café №"], pa.string()),
        }
    )
    out = repair_mojibake_batch(b)
    assert out["text"].to_pylist() == ["café early", "clean café №"]
    assert out["was_mojibake"].to_pylist() == [True, False]
    # repairing the repaired output changes nothing
    again = repair_mojibake_batch(out.select(["doc_id", "text"]))
    assert again["text"].to_pylist() == out["text"].to_pylist()
    assert again["was_mojibake"].to_pylist() == [False, False]


def test_surprisal_buckets_ntile_exact(ray_session):
    import ray.data as rd

    from argo_ray.functions.lm import surprisal_buckets

    # 5 docs, one 'en' reference slice; rare words score higher.
    rows = pa.table(
        {
            "doc_id": pa.array(list(range(5)), pa.int64()),
            "text": pa.array(
                [
                    "common common common",
                    "common common",
                    "common rare",
                    "rare rare rare",
                    "oovword oovword oovword oovword",
                ],
                pa.string(),
            ),
            "lang": pa.array(["en"] * 5, pa.string()),
        }
    )
    out = (
        surprisal_buckets(rd.from_arrow(rows), k=3)
        .to_pandas()
        .sort_values("doc_id")
    )
    # NTILE(3) over 5 rows: tiles of 2, 2, 1 in ascending surprisal
    assert out.set_index("doc_id")["bucket"].tolist() == [2, 1, 1, 2, 3]


def test_surprisal_buckets_fewer_rows_than_tiles(ray_session):
    import ray.data as rd

    from argo_ray.functions.lm import surprisal_buckets

    rows = pa.table(
        {
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": pa.array(["a a", "a"], pa.string()),
            "lang": pa.array(["en", "en"], pa.string()),
        }
    )
    out = surprisal_buckets(rd.from_arrow(rows), k=3).to_pandas()
    # n=2 < k=3 → each row its own tile, NTILE semantics
    assert sorted(out["bucket"].tolist()) == [1, 2]


def test_line_dedup_rebuild_keep_first(ray_session):
    import ray.data as rd

    from argo_ray.pipelines.data_queries import q_docs_line_dedup  # noqa: F401 (registry)
    from argo_ray.pipelines.data_queries import DATA_QUERIES

    # direct kernel test of the same plan on a tiny corpus: doc 1
    # repeats doc 0's first line (8 tokens) then adds its own line
    line_a = " ".join(f"a{i}" for i in range(8))
    line_b = " ".join(f"b{i}" for i in range(8))
    line_c = " ".join(f"c{i}" for i in range(8))
    import pandas as pd
    import pyarrow as pa
    from ray.data.aggregate import Min

    from argo_ray.functions.text import chunk_documents_batch
    from argo_ray.stages.grouping import grouped_map

    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([0, 1], pa.int64()),
                "text": pa.array(
                    [f"{line_a} {line_b}", f"{line_a} {line_c}"], pa.string()
                ),
            }
        )
    )
    PACK = 1 << 20

    def lines(b):
        import pyarrow.compute as pc

        chunks = chunk_documents_batch(b, size=8, stride=8)
        packed = pc.add(
            pc.multiply(pc.cast(chunks["doc_id"], pa.int64()), PACK),
            pc.cast(chunks["chunk_idx"], pa.int64()),
        )
        return pa.table(
            {"line": pc.cast(chunks["chunk_text"], pa.string()), "packed": packed}
        )

    wins = docs.map_batches(lines, batch_format="pyarrow").groupby(
        "line"
    ).aggregate(Min("packed", alias_name="k"))

    def decode(b):
        import pyarrow.compute as pc

        k = pc.cast(b["k"], pa.int64())
        return pa.table(
            {
                "doc_id": pc.divide(k, PACK),
                "chunk_idx": pc.subtract(k, pc.multiply(pc.divide(k, PACK), PACK)),
                "line": pc.cast(b["line"], pa.string()),
            }
        )

    def rebuild(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("chunk_idx")
        return pd.DataFrame(
            {"doc_id": [int(g["doc_id"].iloc[0])], "text": [" ".join(g["line"])]}
        )

    out = (
        grouped_map(wins.map_batches(decode, batch_format="pyarrow"), "doc_id", rebuild)
        .to_pandas()
        .sort_values("doc_id")
    )
    # doc 0 keeps both lines; doc 1 keeps only its unique second line
    assert out["text"].tolist() == [f"{line_a} {line_b}", line_c]


def test_parse_robots_grammar():
    from argo_ray.functions.weblinks import parse_robots_batch

    body = (
        "# comment line\n"
        "User-agent: a\n"
        "User-agent: b\n"        # consecutive agents share the group
        "Disallow: /x # trailing comment\n"
        "Allow:\n"               # empty Allow: no rule
        "\n"
        "User-agent: c\n"
        "DISALLOW: /y\n"         # field names case-insensitive
        "User-agent: d\n"        # agent AFTER rules opens a NEW group
        "Disallow: /z\n"
    )
    b = pa.table(
        {
            "host": pa.array(["h"], pa.string()),
            "body": pa.array([body], pa.string()),
        }
    )
    out = parse_robots_batch(b)
    rows = list(
        zip(
            out["agent"].to_pylist(),
            out["kind"].to_pylist(),
            out["prefix"].to_pylist(),
            out["rule_order"].to_pylist(),
        )
    )
    assert rows == [
        ("a", "disallow", "/x", 0),
        ("b", "disallow", "/x", 0),
        ("c", "disallow", "/y", 1),
        ("d", "disallow", "/z", 2),
    ]


def test_meta_refresh_extract():
    from argo_ray.functions.weblinks import extract_meta_refresh_batch

    b = pa.table(
        {
            "url": pa.array(["u1", "u2"], pa.string()),
            "html": pa.array(
                [
                    b'<html><head><meta http-equiv="refresh" content="5; url=https://t/x"/></head></html>',
                    b"<html>no refresh</html>",
                ],
                pa.binary(),
            ),
        }
    )
    out = extract_meta_refresh_batch(b)
    assert out["url"].to_pylist() == ["u1"]
    assert out["delay_s"].to_pylist() == [5]
    assert out["refresh_url"].to_pylist() == ["https://t/x"]


# --- property tests (hypothesis) -------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@given(st.text(max_size=200))
@settings(max_examples=200, deadline=None)
def test_repair_text_total_and_idempotent(s):
    """repair_text never raises, and repairing its output is identity
    (idempotence — safe to run on every batch of every generation)."""
    fixed, flag = repair_text(s)
    again, flag2 = repair_text(fixed)
    assert again == fixed
    if not flag:
        assert fixed == s


@given(st.text(alphabet=st.characters(max_codepoint=127), max_size=200))
@settings(max_examples=200, deadline=None)
def test_repair_text_ascii_never_flagged(s):
    """Pure-ASCII text is never 'repaired' (utf-8 == latin-1 there)."""
    assert repair_text(s) == (s, False)


@given(st.text(max_size=500))
@settings(max_examples=200, deadline=None)
def test_parse_robots_never_raises(body):
    """The robots parser is total over arbitrary text: garbage in,
    zero-or-more rules out, never an exception (crawl inputs are
    hostile by default)."""
    from argo_ray.functions.weblinks import parse_robots_batch

    b = pa.table(
        {
            "host": pa.array(["h"], pa.string()),
            "body": pa.array([body], pa.string()),
        }
    )
    out = parse_robots_batch(b)
    assert set(out.column_names) == {"host", "agent", "kind", "prefix", "rule_order"}


def test_reify_roundtrip_preserves_terms(ray_session):
    """Literal with lang tag and a typed literal survive the
    reify→rebuild round-trip with kinds/lang/datatype intact."""
    import ray.data as rd

    from argo_ray.pipelines.queries import q_kg_reify_roundtrip  # noqa: F401
    from argo_ray.pipelines.queries import KG_QUERIES

    out = KG_QUERIES["kg_reify_roundtrip"]("/root/testdata/sf0.001")
    df = out.to_pandas()
    # every RDFa-extracted term shape is present post-roundtrip
    assert (df["obj_kind"] == 2).any()        # literals
    assert (df["subj_kind"] == 1).any()       # skolemized blank nodes
    assert (df["obj_lang"] != "").any()       # lang-tagged titles
    assert (df["obj_datatype"] != "").any()   # xsd:integer chars


def test_parse_robots_discovery():
    from argo_ray.functions.weblinks import parse_robots_discovery_batch

    body = (
        "User-agent: *\n"
        "Crawl-delay: 7\n"
        "Disallow: /x\n"
        "\n"
        "Sitemap: https://h/s1.xml\n"   # URL keeps its colons
        "User-agent: bot\n"
        "Crawl-delay: 99\n"             # non-* group: ignored
        "Sitemap: https://h/s2.xml\n"   # Sitemap is file-global
    )
    b = pa.table(
        {
            "host": pa.array(["h", "empty"], pa.string()),
            "body": pa.array([body, "User-agent: *\nDisallow: /q\n"], pa.string()),
        }
    )
    out = parse_robots_discovery_batch(b)
    rows = list(
        zip(
            out["host"].to_pylist(),
            out["sitemap_url"].to_pylist(),
            out["crawl_delay_s"].to_pylist(),
        )
    )
    assert rows == [
        ("h", "https://h/s1.xml", 7),
        ("h", "https://h/s2.xml", 7),
        ("empty", "", -1),  # no sitemap: politeness row still emitted
    ]
